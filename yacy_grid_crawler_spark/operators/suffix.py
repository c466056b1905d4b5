"""Distributed suffix array over the document corpus — the exact-
substring index behind fine-grained training-data dedup (Lee et al.
2022 build one over the whole corpus to cut verbatim repeats;
infini-gram-style lookups ride the same structure). `dedup_text.py::
dup_spans` approximates the same goal with word 5-grams; the suffix
array is the character-exact instrument.

Semantics: suffixes are DOC-LOCAL (doc boundaries are never crossed —
the corpus is a set of documents, not one concatenated string), ranked
jointly across the corpus in lexicographic order with ties (identical
suffixes in different docs) broken by (doc_id, pos). Comparison is
plain string order, which for UTF-8 is byte order == code-point order
in both Spark and DuckDB, so the oracle (`ORDER BY suffix, doc_id,
pos` over materialized doc-local suffixes) is value-exact.

Algorithm: prefix doubling (Manber-Myers), the classic distributed
suffix-array construction — all comparisons after the first round are
on INTEGER rank pairs, never on long strings:

  round 0:  rank = dense rank of the 1-char prefix
  round h:  rank = dense rank of (rank[pos], rank[pos+h]) with -1 when
            pos+h runs off the doc (the shorter suffix sorts first,
            matching lexicographic order); h doubles 1,2,4,... until
            h >= max doc length, i.e. ceil(log2(max_len)) rounds.

Plan shape per round: the shifted-rank lookup is `lead(r, h)` over the
per-DOC window (positions are dense, groups are doc-bounded and fully
parallel — never a global window; measured 1.2x over the equivalent
self equi-join on the 30M-position probe); the dense rank runs on the
DISTINCT (r1, r2) pair set through `batching.py::global_positions`
(range partition + per-partition count + prefix offsets — no
single-partition window anywhere), then joins back by the pair. `localCheckpoint` per round keeps the plan O(1) in the
round count exactly like `graph.py::pagerank_scaled`. The per-row
payload is (doc_id, pos, rank) — 3 scalars; the corpus text is touched
only in round 0 (one char per row) and never shuffled as strings.
At 100 TB the position table is ~10^14 rows — every suffix-array
build is per-character; the byte-per-row discipline and the integer
rank recursion are what make the log-round schedule feasible, and the
range partitioner re-balances every round so rank-space skew (long
shared prefixes) cannot pin a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yacy_grid_crawler_spark.operators.batching import global_positions


def _positions(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, pos, c1): one row per 1-based character position with
    its single-char prefix. `sequence(1, n)` would DESCEND for n=0, so
    empty texts are guarded to an empty array."""
    return docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.length(text_col) > 0,
                F.sequence(F.lit(1), F.length(text_col)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
        F.col(text_col).alias("_t"),
    ).select(
        "doc_id", "pos", F.expr("substr(_t, pos, 1)").alias("c1")
    )


def _dense_rank_join(
    df: DataFrame, cols: tuple[str, ...], out: str, caches: list
) -> tuple[DataFrame, DataFrame]:
    """Dense rank of `cols` tuples: global_positions over the DISTINCT
    tuple set (range shuffle, broadcast offsets), joined back. Rank
    VALUES are engine-internal — only their order matters, so the
    distinct-set row_number is exactly a dense rank. Also returns the
    ranked distinct set so callers can count rank classes cheaply (it
    is persisted inside global_positions)."""
    distinct = df.select(*cols).distinct()
    ranked = global_positions(
        distinct, (), cols, out=out, cache_registry=caches,
        broadcast_offsets=False,
    )
    return df.join(ranked, list(cols)), ranked


def suffix_array(
    docs: DataFrame,
    text_col: str = "text",
    cache_registry: list | None = None,
) -> DataFrame:
    """(sa_rank, doc_id, pos): the corpus suffix array — sa_rank is the
    0-based lexicographic position of the suffix starting at `pos`
    (1-based) in doc `doc_id`, ties by (doc_id, pos)."""
    caches: list = cache_registry if cache_registry is not None else []
    max_len_row = docs.agg(
        F.max(F.length(text_col)).alias("m")
    ).collect()  # bounded metadata: one scalar, like k-means centroids
    max_len = max_len_row[0]["m"] or 0
    if max_len == 0:
        # empty result with the INPUT's doc_id type (hard-coding
        # string would mismatch the non-empty path on bigint ids)
        return docs.select(
            F.lit(0).cast("long").alias("sa_rank"),
            "doc_id",
            F.lit(0).cast("int").alias("pos"),
        ).limit(0)
    joined, ranked0 = _dense_rank_join(
        _positions(docs, text_col), ("c1",), "r", caches
    )
    sa = joined.select(
        "doc_id", "pos", F.col("r").cast("long").alias("r")
    ).localCheckpoint()
    # Early termination: if a doubling round does not refine the rank
    # partition (class count unchanged), no later round can — classes
    # equal on h chars are then equal on 2h, and by induction on any
    # length (the standard prefix-doubling fixed point, which also
    # covers cross-doc identical suffixes that never separate). One
    # tiny count per round on the persisted distinct set.
    prev_classes = ranked0.count()
    h = 1
    while h < max_len:
        # rank[pos+h] via lead() over the per-doc window — positions
        # are dense 1..len, so the row h ahead IS pos+h; docs are
        # bounded (hundreds-to-thousands of positions), so the window
        # groups are tiny and fully parallel across the corpus; this
        # replaces a 2x-corpus self equi-join with ONE doc_id shuffle
        # (measured 1.2x on the 30M-position probe, BASELINE.md)
        w = Window.partitionBy("doc_id").orderBy("pos")
        cur = sa.select(
            "doc_id",
            "pos",
            F.col("r").alias("_r1"),
            F.coalesce(F.lead("r", h).over(w), F.lit(-1)).alias("_r2"),
        )
        joined, ranked = _dense_rank_join(cur, ("_r1", "_r2"), "r", caches)
        sa = joined.select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        ).localCheckpoint()
        n_classes = ranked.count()
        if n_classes == prev_classes:
            break
        prev_classes = n_classes
        h *= 2
    out = global_positions(
        sa, (), ("r", "doc_id", "pos"), out="sa_rank",
        cache_registry=caches, broadcast_offsets=False,
    ).select(F.col("sa_rank").cast("long").alias("sa_rank"), "doc_id", "pos")
    if cache_registry is None:
        for c in caches:
            c.unpersist()
    return out


def longest_repeats(
    docs: DataFrame,
    text_col: str = "text",
    top: int = 30,
    cap: int = 64,
    cache_registry: list | None = None,
) -> DataFrame:
    """(sa_rank, lcp, prefix): top repeated substrings via the LCP of
    lexicographically ADJACENT suffixes — the suffix array's classic
    application (a substring repeats in the corpus iff two adjacent
    suffixes share it as a prefix). lcp is capped at `cap` chars and
    computed as min(#{j <= cap : prefix_j(a) = prefix_j(b)}, len(a),
    len(b)) — the prefix-equality count is monotone so it IS the lcp,
    and the min() keeps equal-short-suffix pairs exact. Output ordered
    (lcp desc, sa_rank asc), truncated to `top`.

    Plan shape: the adjacency is an equi-join on sa_rank+1 (no global
    window); suffixes travel as `cap`-char slices, never whole; the
    LCP is one codegen `filter(sequence(...))` per pair."""
    sa = suffix_array(docs, text_col, cache_registry=cache_registry)
    sliced = sa.join(
        docs.select("doc_id", F.col(text_col).alias("_t")), "doc_id"
    ).select(
        "sa_rank",
        F.expr(f"substr(_t, pos, {cap})").alias("_s"),
        F.least(
            F.length("_t") - F.col("pos") + 1, F.lit(cap)
        ).alias("_len"),
    )
    # standard LCP-array convention: row at sa_rank i compares
    # SA[i] with SA[i-1] (defined for i >= 1)
    b = sliced.select(
        (F.col("sa_rank") + 1).alias("sa_rank"),
        F.col("_s").alias("_sb"),
        F.col("_len").alias("_lenb"),
    )
    pairs = sliced.join(b, "sa_rank")
    lcp = F.least(
        F.size(
            F.expr(
                f"filter(sequence(1, {cap}),"
                " j -> substr(_s, 1, j) = substr(_sb, 1, j))"
            )
        ),
        F.col("_len"),
        F.col("_lenb"),
    ).cast("int")
    return (
        pairs.withColumn("lcp", lcp)
        .select(
            "sa_rank", "lcp", F.expr("substr(_s, 1, lcp)").alias("prefix")
        )
        .orderBy(F.col("lcp").desc(), "sa_rank")
        .limit(top)
    )


def dup_coverage(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 20,
    cap: int = 64,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact-substring duplicate COVERAGE per document (Lee et al.
    2022's dedup measure, character-exact): the fraction of each doc's
    characters lying inside a substring of length >= `min_len` that
    occurs at >= 2 positions in the corpus. `dedup_text.dup_spans`
    approximates this with word 5-grams; this is the suffix-array
    instrument.

    Method: a position is duplicate-covered iff its suffix shares a
    >= min_len prefix with either SA NEIGHBOR (any repeated substring
    makes its occurrences adjacent in suffix order, so neighbor LCP
    detects every one); each such position contributes the interval
    [pos, pos + lcp), and the per-doc union of intervals is summed by
    the classic gaps-and-islands scan. The `cap` on LCP does not
    truncate coverage: inside a long repeat every position contributes
    an overlapping capped interval, so the union still spans the run.

    Output: (doc_id, total_chars, dup_chars, dup_bp) — all integers.

    Scale shape: on top of `suffix_array`'s rounds, two sa_rank±1
    equi-joins for the neighbor LCPs (never a global window), then
    doc-bounded windows for the island merge (docs are small groups —
    same parallelism argument as the per-doc lead() rounds) and one
    doc_id rollup."""
    from pyspark.sql import Window

    sa = suffix_array(docs, text_col, cache_registry=cache_registry)
    d = docs.select(
        "doc_id",
        F.col(text_col).alias("_t"),
        F.length(text_col).alias("total_chars"),
    )
    sliced = sa.join(d.select("doc_id", "_t"), "doc_id").select(
        "sa_rank",
        "doc_id",
        "pos",
        F.expr(f"substr(_t, pos, {cap})").alias("_s"),
        F.least(F.length("_t") - F.col("pos") + 1, F.lit(cap)).alias("_len"),
    )

    def neighbor(delta: int, out: str) -> DataFrame:
        n = sliced.select(
            (F.col("sa_rank") + delta).alias("sa_rank"),
            F.col("_s").alias("_sn"),
            F.col("_len").alias("_lenn"),
        )
        lcp = F.least(
            F.size(
                F.expr(
                    f"filter(sequence(1, {cap}),"
                    " j -> substr(_s, 1, j) = substr(_sn, 1, j))"
                )
            ),
            F.col("_len"),
            F.col("_lenn"),
        )
        return sliced.join(n, "sa_rank").select(
            "sa_rank", lcp.cast("int").alias(out)
        )

    with_lcp = (
        sliced.join(neighbor(1, "_lcp_prev"), "sa_rank", "left")
        .join(neighbor(-1, "_lcp_next"), "sa_rank", "left")
        .select(
            "doc_id",
            "pos",
            F.greatest(
                F.coalesce("_lcp_prev", F.lit(0)),
                F.coalesce("_lcp_next", F.lit(0)),
            ).alias("_lcp"),
        )
        .filter(F.col("_lcp") >= min_len)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = F.max(F.col("pos") + F.col("_lcp")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = with_lcp.withColumn(
        "_new", F.when(F.col("pos") > F.coalesce(run, F.lit(0)), 1).otherwise(0)
    ).withColumn("_grp", F.sum("_new").over(w))
    spans = islands.groupBy("doc_id", "_grp").agg(
        (F.max(F.col("pos") + F.col("_lcp")) - F.min("pos")).alias("_span")
    )
    agg = spans.groupBy("doc_id").agg(
        F.sum("_span").cast("long").alias("dup_chars")
    )
    zero = F.lit(0).cast("long")
    return d.select("doc_id", "total_chars").join(agg, "doc_id", "left").select(
        "doc_id",
        F.col("total_chars").cast("long").alias("total_chars"),
        F.coalesce("dup_chars", zero).alias("dup_chars"),
        F.expr(
            "CAST(CASE WHEN total_chars > 0 THEN"
            " 10000 * coalesce(dup_chars, 0) DIV total_chars"
            " ELSE 0 END AS BIGINT)"
        ).alias("dup_bp"),
    )
