"""Distributed BPE tokenizer training — the vocabulary-induction step
a pretraining pipeline runs over the whole corpus before tokenizing it
(Sennrich et al. 2016; every modern LLM tokenizer is trained this way,
and at 100 TB the pair-counting pass is a distributed job by
necessity).

The algorithm, made EXACTLY reproducible across engines the same way
`clustering.py` pins k-means:

* Tokenize to lowercase `[a-z]+` words, aggregate to a (word, cnt)
  vocabulary table ONCE — all k merge rounds run over this table,
  never over the corpus again (the standard word-frequency compression
  every BPE trainer uses: pair statistics are identical, input is
  ~1000x smaller).
* A word's symbol sequence starts as its characters space-joined plus
  a trailing `_` end-of-word marker ("hello" -> "h e l l o _").
* Each round counts adjacent symbol pairs weighted by word cnt
  (ALL adjacent positions, overlaps included — the classic counting
  rule), picks argmax count with ties to (left_sym, right_sym)
  ascending, and applies the merge as a literal string replace of
  " l r " with " lr " over the space-padded sequence. `replace` is
  non-overlapping left-to-right in both Spark (Java String.replace)
  and DuckDB, so "a a a" + merge (a,a) -> "aa a" in both engines.
  DIVERGENCE FROM STANDARD BPE (intentional, engine-authoritative):
  because the replace consumes its trailing space, a RUN of the same
  symbol under-merges relative to Sennrich/HF greedy application —
  "a a a a" becomes [aa, a, a] here where standard BPE produces
  [aa, aa]. Tokenizations of repeated-symbol runs therefore do NOT
  match HF tokenizers token-for-token (merge LEARNING is affected
  only insofar as later rounds count pairs over these sequences).
  Chosen so the Spark and DuckDB twins are bit-identical with no
  per-row Python; pinned by the oracle pair and tests/test_bpe.py.
* Everything is integer counts and string equality — no floats, the
  DuckDB twin is bit-identical.

Plan shape per merge round: the vocab table (corpus-distinct words;
~10^7 rows at 100 TB) is cached once; pair expansion is a codegen
`transform` over the split sequence (the split is materialized once in
the explode's child projection); the count is ONE hash aggregate with
map-side combine whose key space is the current pair set (tens of
thousands of rows); argmax is a TakeOrdered(1). The only driver
traffic is ONE row per round — the same bounded-metadata loop shape as
`clustering.py`'s centroid exchange. Merge application stacks the
PENDING literal `replace` calls into one codegen projection over the
cached vocab (scalar functions, not higher-order — the HOF
interpretation cliff documented in BASELINE.md does not apply); every
`checkpoint_every` (default 64) merges the vocab is localCheckpoint'ed
with pending merges folded in, so plan depth stays bounded at
production k exactly like iterative graph algorithms bound theirs.

Reference parity note: the reference engine has no tokenizer trainer —
this is one of the LLM-data-pipeline operators the brief adds beyond
crawl parity (SURVEY.md section 6), sharing its tokenize rule with
`textstats.py::pmi_collocations` (which finds mergeable pairs at the
WORD level; BPE is the same statistic at the subword level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from yacy_grid_crawler_spark.operators.textstats import WORD_RE

_MERGE_SCHEMA = StructType(
    [
        StructField("step", IntegerType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, seq): corpus word frequencies with the initial BPE
    symbol sequence ("hello" -> "h e l l o _"). One shuffle (the word
    hash aggregate, map-side combined); the sequence init is a codegen
    regexp projection on the aggregated table."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word")
    )
    v = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # "hello" -> "h e l l o " -> "h e l l o _" (the regexp leaves a
    # trailing space, so appending the marker needs no extra join)
    seq = F.concat(F.regexp_replace("word", "(.)", "$1 "), F.lit("_"))
    return v.withColumn("seq", seq)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, c): adjacent-symbol pair counts weighted
    by word cnt. The split array is materialized once per word in the
    explode's child projection; the aggregate's key space is the pair
    set, so the map-side combine collapses it before the shuffle."""
    s = vocab.select("cnt", F.split("seq", " ").alias("s"))
    pairs = s.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(slice(s, 1, greatest(size(s) - 1, 0)),"
                " (x, i) -> struct(x AS l, element_at(s, i + 2) AS r))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("cnt").alias("c"))


def _merged_seq_col(merges: list[tuple]) -> F.Column:
    """The seq column with every learned merge applied, as ONE stacked
    codegen projection: trim(replace(... replace(' '||seq||' ') ...)).
    Symbols are [a-z_]+ so the space-delimited literals are
    unambiguous."""
    seq = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
    for _step, l, r, merged, _c in merges:
        seq = F.replace(seq, F.lit(f" {l} {r} "), F.lit(f" {merged} "))
    return F.trim(seq)


def bpe_train(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    cache_registry: list | None = None,
    checkpoint_every: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Learn the first k BPE merges over the corpus. Returns
    (merge_table, merged_vocab): the merge table has one row per round
    (step, left_sym, right_sym, merged, pair_count), the vocab is
    (word, cnt, seq) with all k merges applied.

    Driver traffic is one argmax row per round; each round is one
    shuffle over the cached word-frequency table.

    Plan-depth bound (the production-k path): each round's projection
    stacks one `replace` per PENDING merge, so an unbounded run at
    vocabulary-training k (tens of thousands) would hand Catalyst an
    ever-deeper expression tree and re-analyze it every round. Every
    `checkpoint_every` merges the vocab is `localCheckpoint`ed with
    the pending merges folded in — lineage truncates, the next round's
    plan restarts from a materialized scan, and the per-round plan
    never exceeds `checkpoint_every` replaces. Results are identical
    by construction (merge application is associative over rounds);
    pinned by tests/test_bpe.py::test_checkpointed_equals_unchunked."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).cache()
    if cache_registry is not None:
        cache_registry.append(vocab)
    base = vocab  # materialized vocab with `applied` merges folded in
    applied = 0  # merges already baked into base's seq
    merges: list[tuple] = []
    for step in range(1, k + 1):
        pending = merges[applied:]
        cur = (
            base.withColumn("seq", _merged_seq_col(pending))
            if pending
            else base
        )
        best = (
            _pair_counts(cur)
            .orderBy(F.desc("c"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append(
            (
                step,
                row["left_sym"],
                row["right_sym"],
                row["left_sym"] + row["right_sym"],
                int(row["c"]),
            )
        )
        if len(merges) - applied >= checkpoint_every:
            # fold pending merges into a materialized base; old base's
            # checkpoint blocks free when the reference is dropped
            base = base.withColumn(
                "seq", _merged_seq_col(merges[applied:])
            ).localCheckpoint(eager=True)
            applied = len(merges)
    merge_df = spark.createDataFrame(merges, _MERGE_SCHEMA)
    tail = merges[applied:]
    final_vocab = (
        base.withColumn("seq", _merged_seq_col(tail)) if tail else base
    )
    if cache_registry is None:
        # the k training collects are done; drop the cache rather than
        # leak it (the returned vocab recomputes lazily if consumed) —
        # same None-registry sweep as suffix_array
        vocab.unpersist()
    return merge_df, final_vocab


def bpe_doc_tokens(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    cache_registry: list | None = None,
    checkpoint_every: int = 64,
) -> DataFrame:
    """Tokenize the corpus under the induced vocabulary: per doc,
    n_words and n_tokens after the k learned merges — the number the
    pretraining budget is actually costed in (`tokenizer_fertility`
    estimates it with a fixed regex; this is the real count under the
    trained tokenizer).

    Production shape: tokenization is a BROADCAST dictionary lookup —
    the per-word token count is precomputed once on the (bounded)
    vocab table and broadcast-joined to the corpus word explode, so
    the corpus side never shuffles; the only wide op is the final
    doc_id aggregate (map-side combined). Docs with no words keep a
    zero row (left join from the doc spine)."""
    _merge_df, final_vocab = bpe_train(
        docs, k=k, text_col=text_col, cache_registry=cache_registry,
        checkpoint_every=checkpoint_every,
    )
    word_tokens = final_vocab.select(
        "word", F.size(F.split("seq", " ")).cast("long").alias("word_tokens")
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word"),
    )
    agg = (
        words.join(F.broadcast(word_tokens), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_tokens").alias("n_tokens"),
        )
    )
    zero = F.lit(0).cast("long")
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", zero).alias("n_words"),
        F.coalesce("n_tokens", zero).alias("n_tokens"),
    )


def bpe_vocab(
    docs: DataFrame,
    k: int = 8,
    top: int = 30,
    text_col: str = "text",
    cache_registry: list | None = None,
    checkpoint_every: int = 64,
) -> DataFrame:
    """Top tokens of the learned subword vocabulary: apply the k
    merges, explode the symbol sequences weighted by word cnt, and
    rank by (freq desc, token asc). One extra hash aggregate over the
    cached vocab after training — the corpus is never re-read."""
    _merge_df, final_vocab = bpe_train(
        docs, k=k, text_col=text_col, cache_registry=cache_registry,
        checkpoint_every=checkpoint_every,
    )
    toks = final_vocab.select(
        "cnt", F.explode(F.split("seq", " ")).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(top)
    )
