"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting, corpus-level
line dedup and tf-idf keyword extraction.

All pure JVM-side expressions (regexp_extract_all / size / arithmetic)
— no UDFs at all — so each op has an exactly-equivalent DuckDB oracle
and stays inside whole-stage codegen on the hot path. The per-document
ops (lang_id .. repetition_stats) are narrow maps with no shuffle; the
two corpus-level ops at the bottom (`line_dedup`, `tfidf_topk`) each
add exactly one keyed shuffle (line / term) plus a per-doc regroup.
These run over the `documents(doc_id, text, lang, source, n_chars)`
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword heuristic.
# Deterministic; shared with the SQL oracle via sql_lang_score().
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "la", "les", "des"],
    "es": ["el", "y", "los", "las", "una"],
}

WORD_RE = "[a-z]+"


def _words():
    return F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")


def _bigram_structs():
    """Adjacent word-pair structs over a `w` token-array column —
    the shared bigram expansion (explode's child materializes the
    array once; zip-with-tail, no posexplode). Used by PMI, the
    bigram LM, and the hashed classifier."""
    return F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
        " (x, i) -> struct(x as w1, element_at(w, i + 2) as w2))"
    )


def _marker_count(lang: str):
    markers = LANG_MARKERS[lang]
    in_list = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter(regexp_extract_all(lower(text), '{WORD_RE}', 0),"
        f" w -> w in ({in_list})))"
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-count language ID: score per language = marker-word
    hits; predicted = argmax, ties broken by declaration order
    (en > de > fr > es), 'unknown' when all zero. The CASE chain is
    written identically in the DuckDB oracle."""
    df = docs
    for lang in LANG_MARKERS:
        df = df.withColumn(f"_s_{lang}", _marker_count(lang))
    langs = list(LANG_MARKERS)
    mx = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.lit("unknown")
    # build CASE ... WHEN in reverse so the first language wins ties
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"_s_{lang}") > 0) & (F.col(f"_s_{lang}") == mx), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        "doc_id",
        pred.alias("pred_lang"),
        *[F.col(f"_s_{lang}").alias(f"score_{lang}") for lang in langs],
    )


def quality_score(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Deterministic quality features + combined score:
    n_words, mean word length, stopword ratio, punct ratio,
    score = stopword_ratio*2 + clamp(n_words/100) - punct_ratio.
    Rounded to 4dp for oracle hashing. `keep` names extra input
    columns to carry through (e.g. ("source",) for the per-source
    rollup) — still a pure narrow map."""
    n_words = F.size(_words())
    n_alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    n_chars = F.length(F.col("text"))
    stop = F.expr(
        "size(filter(regexp_extract_all(lower(text), '[a-z]+', 0),"
        " w -> w in ('the', 'a', 'of', 'and', 'to', 'in', 'is')))"
    )
    return docs.select(
        "doc_id",
        *keep,
        n_words.alias("n_words"),
        F.round(n_alpha / F.greatest(n_words, F.lit(1)), 4).alias("mean_word_len"),
        F.round(stop / F.greatest(n_words, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(
            (stop / F.greatest(n_words, F.lit(1))) * 2
            + F.least(n_words / F.lit(100.0), F.lit(1.0))
            - n_punct / F.greatest(n_chars, F.lit(1)),
            4,
        ).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish tokens (letter runs, digit runs,
    single non-space symbols) + chars — the cost accounting columns a
    training pipeline budgets by."""
    ws = F.size(F.expr("regexp_extract_all(text, '[^ ]+', 0)"))
    bpe = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    )
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def fingerprints(docs: DataFrame, gram: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: minimum md5 over all `gram`-char
    substrings of the lowercased text (rolling-hash document
    signature), plus full-text md5. Docs sharing min_gram_hash are
    near-dup candidates robust to suffix edits."""
    subs = F.expr(
        f"transform(sequence(1, greatest(length(lower(text)) - {gram - 1}, 1)),"
        f" i -> md5(substring(lower(text), i, {gram})))"
    )
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.array_min(subs).alias("min_gram_hash"),
    )


# PII patterns: RE2-safe syntax (no backrefs/lookarounds) so the SAME
# pattern strings run in Spark (java.util.regex) and DuckDB (RE2) —
# the oracle-equality constraint that governs every kernel here.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PII_SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + masking for training-data hygiene: emails,
    IPv4 addresses, SSN-shaped numbers found and replaced with typed
    placeholders. Pure JVM regexp (codegen, no UDF) — scales as a
    narrow map over the corpus scan. Output: (doc_id, n_emails,
    n_ips, n_ssns, masked_md5) — the masked text itself stays a
    column in `with_masked` form for pipelines that persist it; the
    md5 is the equality surface for the oracle.

    Masking order matters and is pinned: SSN before IPv4 (an IPv4
    match can overlap digit runs), email first (an email's domain
    must not be half-masked by a prior rule)."""
    t = F.col(text_col)
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_SSN_RE,
            "<SSN>",
        ),
        PII_IPV4_RE,
        "<IP>",
    )
    # F.regexp_extract_all with Column patterns — NOT F.expr string
    # literals, whose backslash escapes the SQL parser would eat
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_SSN_RE), F.lit(0)))
        .cast("long")
        .alias("n_ssns"),
        F.md5(masked).alias("masked_md5"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals: a document whose mass
    sits in a few repeated fragments is boilerplate/spam, not prose.
    Per doc: dup_word_frac = 1 - distinct(words)/words;
    top_bigram_frac = occurrences of the most frequent word bigram /
    total bigrams; flagged = the Gopher-shaped thresholds
    (dup_word_frac > 0.85 OR top_bigram_frac > 0.18 — tuned for the
    synthetic corpus' small vocabulary; production corpora use the
    published 0.63/0.08). All computed with codegen array exprs over
    the tokenized text — a narrow map, no shuffle, no UDF."""
    words = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    d = docs.withColumn("_w", words)
    n_words = F.size("_w")
    n_distinct = F.size(F.array_distinct("_w"))
    bigrams = F.expr(
        "CASE WHEN size(_w) >= 2 THEN"
        " transform(sequence(1, size(_w) - 1),"
        " i -> concat_ws(' ', element_at(_w, i), element_at(_w, i + 1)))"
        " ELSE array() END"
    )
    d = d.withColumn("_bg", bigrams)
    # occurrences of the modal bigram: sort the bigram array and take
    # the longest run of equal neighbors — O(n log n) per doc in pure
    # codegen exprs (the naive distinct×filter scan is O(n²) per doc,
    # which a 10k-word web page would feel)
    top_bg = F.expr(
        "CASE WHEN size(_bg) = 0 THEN 0 ELSE"
        " aggregate(array_sort(_bg),"
        " struct(CAST('' AS string) AS prev, 0 AS run, 0 AS best),"
        " (acc, x) -> struct(x,"
        "   IF(x = acc.prev, acc.run + 1, 1),"
        "   greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1))),"
        " acc -> acc.best) END"
    )
    # empty docs: 0/0 would read as "all duplicates" — define as 0
    dup_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - n_distinct / n_words, 4)
    )
    top_frac = F.round(
        top_bg / F.greatest(F.size("_bg"), F.lit(1)), 4
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_bigram_frac"),
        ((dup_frac > 0.85) | (top_frac > 0.18)).alias("flagged"),
    )


def line_dedup(docs: DataFrame, max_freq: int = 10,
               text_col: str = "text") -> DataFrame:
    """CCNet-style line-level boilerplate removal: split each document
    into lines, count each (trimmed, non-empty) line's frequency
    across the WHOLE corpus, and drop lines that appear in more than
    `max_freq` documents' worth of rows — navigation chrome, cookie
    banners, copyright footers repeat verbatim across a site; prose
    does not. Output per doc: (doc_id, n_lines, n_kept, cleaned_md5)
    where cleaned_md5 hashes the kept lines re-joined by '\\n' in
    their ORIGINAL order (the compact equality surface; pipelines
    that persist the cleaned text keep the pre-md5 column).

    Scale shape: posexplode is a narrow map; the frequency count is
    one hash-aggregate shuffle keyed on the line text with map-side
    partial combine (boilerplate lines collapse to one row per
    partition before the exchange, so the shuffle is ~distinct lines,
    not total lines); the freq join is a plain equi-join AQE can
    re-plan; the regroup keys on doc_id. No UDFs, no windows. At
    100 TB you would key the count/join on xxhash64(line) to shuffle
    8-byte fingerprints instead of line strings — kept exact-string
    here so the DuckDB oracle is equivalence, not approximation.

    Docs whose lines are ALL removed still emit a row (cleaned_md5 =
    md5(''), n_kept = 0); docs with no non-empty lines at all emit
    nothing (there is no line evidence to group).
    """
    lines = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.trim(F.col("line")))
        .filter(F.length("line") > 0)
    )
    freq = lines.groupBy("line").agg(F.count("*").alias("_freq"))
    flagged = lines.join(freq, "line")
    keep = F.col("_freq") <= max_freq
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    # collect_list drops null entries: non-kept lines
                    # vanish, survivors sort back to original order on
                    # the unique per-doc `pos`
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            )
        ).alias("cleaned_md5"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k tf-idf terms per document — the classic keyword /
    salience extraction a corpus-curation pipeline uses for topic
    balancing and near-dup triage. Integer-exact scoring so the
    oracle comparison is bit-stable: idf_ppm = (1_000_000 * n_docs)
    DIV df (floor division — ln() would differ in the last ulp
    between the JVM and DuckDB), score = tf * idf_ppm; ranking by
    (score DESC, term ASC) is therefore deterministic in both
    engines. Output: (doc_id, term, tf, df, score, rnk), rnk <= k.

    Scale shape: term-frequency is a (doc_id, term)-keyed hash
    aggregate; document frequency re-aggregates that result by term
    (input already term-clustered); n_docs is a 1-row aggregate
    broadcast-joined (no driver action, no collect); the top-k window
    partitions on doc_id — millions of partitions, no global sort, no
    single-partition window (the repo-wide plan rule).
    """
    from pyspark.sql import Window

    words = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
        ).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("_n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.col("tf") * F.expr("CAST(1000000 AS BIGINT) * _n_docs DIV df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """Unigram language-model quality scoring (the CCNet-style
    perplexity filter, reduced to its SQL-expressible core): train an
    add-one-smoothed unigram LM on the corpus itself, then score each
    document by its average negative log-probability per token. Docs
    whose token distribution diverges from the corpus (gibberish,
    boilerplate, wrong language) score high and get filtered; docs of
    typical prose score low.

        p(tok)  = (count(tok) + 1) / (N + V)      add-one smoothing
        score   = avg over doc tokens of -ln p(tok)

    Output: (doc_id, n_tokens, avg_neg_logprob) — rounded to 4dp for
    oracle hashing (the replica hashes floats at 6dp; summation-order
    drift between engines is ~1e-13 relative, far inside 1e-4).
    Documents with zero alphabetic tokens produce no token rows and
    are omitted — callers treat absence as "unscorable".

    Scale shape: token frequency is one map-side-combining hash
    aggregate keyed on the token; (N, V) is a 1-row re-aggregate of
    that table, broadcast via crossJoin; the freq join back to the
    exploded tokens is skewed on stopwords — exactly the hot-key
    shape AQE skew-join splits, and the downstream per-doc avg
    re-aggregates on doc_id so the skew never reaches the output. No
    UDFs anywhere; ln() runs JVM-side.
    """
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
        ).alias("tok"),
    )
    freqs = words.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = freqs.agg(
        F.sum("cnt").alias("_n"), F.count("*").alias("_v")
    )
    return (
        words.join(freqs, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(
                    -F.log(
                        (F.col("cnt") + F.lit(1.0))
                        / (F.col("_n") + F.col("_v"))
                    )
                ),
                4,
            ).alias("avg_neg_logprob"),
        )
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text normalization — the first map of a curation
    pipeline: lowercase, replace every non-printable / non-ASCII char
    with a space, collapse whitespace runs, trim. Output:
    (doc_id, norm_text, n_chars_norm).

    Pure codegen (lower + two regexp_replace + trim), zero shuffle;
    the regexes are shared verbatim with the DuckDB oracle so both
    engines normalize identically."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^\\x20-\\x7e]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("int").alias("n_chars_norm"),
    )


def source_quality_rollup(
    docs: DataFrame, min_avg_quality: float = 0.5
) -> DataFrame:
    """Domain-level curation rollup — the signal behind "drop spammy
    domains" decisions: per `source`, document count, exact-duplicate
    document count (texts whose md5 occurs more than once ANYWHERE in
    the corpus, so cross-source mirror farms count too), dup fraction,
    mean quality score, total whitespace tokens, and a `low_quality`
    verdict (avg quality below `min_avg_quality`).

    Scale shape: one groupBy on md5(text) (map-side combine) for the
    corpus dup-count dim, one equi-join back on the hash (AQE skew
    handles the empty-text / boilerplate hash), then ONE hash
    aggregate keyed on source. Quality features ride the same rows as
    pure codegen columns (quality_score with source kept), so no
    per-doc join is needed. Source cardinality is tiny next to doc
    count, so the final agg's reduce side is a broadcast-size table.
    """
    feats = quality_score(docs, keep=("source",))
    base = docs.select(
        "doc_id",
        F.md5("text").alias("_h"),
        F.size(F.expr("regexp_extract_all(text, '[^ ]+', 0)")).alias("_ws"),
    )
    hcnt = base.groupBy("_h").agg(F.count(F.lit(1)).alias("_hn"))
    per_doc = (
        base.join(hcnt, "_h")
        .select("doc_id", "_ws", (F.col("_hn") > 1).alias("_dup"))
        .join(feats.select("doc_id", "source", "quality"), "doc_id")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_if(F.col("_dup")).cast("bigint").alias("dup_docs"),
        F.round(
            F.count_if(F.col("_dup")) / F.count(F.lit(1)), 4
        ).alias("dup_fraction"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("_ws").cast("bigint").alias("total_ws_tokens"),
        (F.avg("quality") < F.lit(min_avg_quality)).alias("low_quality"),
    )


def corpus_stats(
    docs: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    approximate: bool = False,
) -> DataFrame:
    """Per-group corpus profile: doc count, distinct sources, total /
    mean / median / p90 of `value_col` — the summary table every
    curation run starts and ends with.

    `approximate=False` (default) uses exact `percentile`, which
    buffers each group's values in the aggregation — fine up to
    millions of rows per group and exactly reproducible (Spark and
    DuckDB interpolate quantiles identically, bit-for-bit; pinned by
    the oracle gate). At 100 TB pass `approximate=True`:
    `percentile_approx` (t-digest, constant memory per group) — same
    plan shape, bounded state, not oracle-hashable by construction.
    """
    pctl = (
        (lambda c, p: F.percentile_approx(c, p, 10_000))
        if approximate
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    v = F.col(value_col)
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(v).alias("total_chars"),
            F.round(F.avg(v), 4).alias("mean_chars"),
            pctl(v, 0.5).alias("p50_chars"),
            pctl(v, 0.9).alias("p90_chars"),
        )
    )


def inverted_index(
    docs: DataFrame, df_cap: int = 1000, postings_cap: int = 64
) -> DataFrame:
    """Distributed inverted-index build: term → document-frequency +
    sorted, capped posting list. This is the reference system's
    DOWNSTREAM purpose — the crawler feeds an indexer that builds the
    "web" search index (conf/config.properties:
    grid.elasticsearch.indexName.web; the crawler emits index assets,
    CrawlerListener.java:569-573) — expressed here as the Spark batch
    job that builds those postings from the crawled corpus.

    Output: (term, df, n_postings, postings) where `postings` is a
    '|'-joined sorted doc_id list (string, so the cross-engine value
    hash is stable), `df` the EXACT document frequency, and
    n_postings = min(df, postings_cap).

    Scale shape — the stopword problem is the whole design: a hot
    term ("the") has postings in the billions at 100 TB, so a naive
    groupBy(term).collect_list() materializes an unbounded single-key
    array (the same unbounded-state shape the streaming variant was
    dinged for). Instead: (1) per-doc term dedup is a (doc_id, term)
    hash aggregate (map-side combined); (2) EXACT df is a narrow
    second agg on term; (3) ONLY terms with df <= df_cap (selective
    terms — the ones an index lookup actually serves; stopwords are
    skip-listed, the classic posting-list policy) flow into the
    collect_list, so every collected group is bounded by df_cap by
    construction, with `postings_cap` as the belt-and-braces slice.
    Three shuffles total, all on (doc_id|term) hash keys; no window,
    no global sort, no driver action.
    """
    pairs = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
            ).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.lit(1))
        .select("term", "doc_id")
    )
    dfreq = pairs.groupBy("term").agg(F.count("*").alias("df"))
    keep = dfreq.filter(F.col("df") <= F.lit(df_cap))
    return (
        pairs.join(keep, "term")
        .groupBy("term")
        .agg(
            F.first("df").alias("df"),
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, postings_cap
                ),
                "|",
            ).alias("postings"),
        )
        .select(
            "term",
            "df",
            F.least(F.col("df"), F.lit(postings_cap))
            .cast("long")
            .alias("n_postings"),
            "postings",
        )
    )


def batch_search(
    docs: DataFrame, queries: DataFrame, k: int = 5, df_cap: int = 1000
) -> DataFrame:
    """Batch retrieval over the corpus: for each probe query, the
    top-k documents by summed tf·idf over shared terms — the serve
    side of `inverted_index`, shaped for training-data mining (probe
    queries → matching corpus docs) and retrieval eval, not online
    point lookup. Integer-exact idf_ppm scoring (same contract as
    `tfidf_topk`) so the cross-engine hash is stable.

    Scale shape: the corpus side is the same (doc_id, term) tf hash
    aggregate as tfidf; the probe side (queries are a SMALL dim by
    construction — eval sets, mined probes) is distinct-term-exploded
    and BROADCAST onto the tf table (no shuffle of the corpus side
    beyond its own aggs); scoring is one (query_id, doc_id) agg and
    the top-k window partitions on query_id. A query term matching
    half the corpus is the skew risk — idf weighting makes such terms
    worthless, so they are dropped by the same df-cap policy as the
    index build (df <= df_cap), which also bounds the join fan-out.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") <= F.lit(df_cap)
    )
    total = docs.agg(F.count("*").alias("_n_docs"))
    qterms = (
        queries.select(
            "query_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower(qtext), '{WORD_RE}', 0)")
            ).alias("term"),
        )
        .distinct()
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")  # inner join: df-capped terms drop here
        .crossJoin(F.broadcast(total))
        .withColumn(
            "w",
            F.col("tf") * F.expr("CAST(1000000 AS BIGINT) * _n_docs DIV df"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("w").alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "n_terms_matched", "rnk")
    )


# Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) quality-filter rule
# set. The required-stopword list is the paper's; thresholds are the
# published defaults, overridable per-corpus (the synthetic test corpus
# uses the defaults — its planted structure is sized to trip them).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021) as one
    narrow codegen map — the classic pre-training corpus gate:

      * word count within [min_words, max_words]
      * mean word length within [min_mean_word_len, max_mean_word_len]
      * '#'/'...' symbol-to-word ratio below max_symbol_ratio
      * < max_bullet_frac of lines start with a bullet ('-' / '*')
      * < max_ellipsis_frac of lines end with '...'
      * > min_alpha_word_frac of whitespace tokens contain a letter
      * >= min_stop_hits distinct required stopwords present

    Output: (doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_word_frac, stop_hits, keep).
    Ratios rounded to 4dp (the cross-engine hash surface). Pure
    JVM expressions over the text column — no UDF, no shuffle; at
    100 TB this is a map over the corpus scan, usually fused with
    the scan of whatever filter ran before it."""
    words = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    d = docs.withColumn("_w", words)
    n_words = F.size("_w")
    safe_w = F.greatest(n_words, F.lit(1))
    mean_wl = F.round(
        F.expr("aggregate(_w, 0L, (a, x) -> a + length(x))") / safe_w, 4
    )
    n_sym = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("#|\\.\\.\\."), F.lit(0))
    )
    sym_ratio = F.round(n_sym / safe_w, 4)
    # line stats: trimmed non-empty lines
    d = d.withColumn(
        "_lines",
        F.expr(
            "filter(transform(split(text, '\\n'), l -> trim(l)),"
            " l -> length(l) > 0)"
        ),
    )
    n_lines = F.greatest(F.size("_lines"), F.lit(1))
    bullet = F.round(
        F.expr(
            "size(filter(_lines, l -> startswith(l, '-')"
            " or startswith(l, '*')))"
        )
        / n_lines,
        4,
    )
    ellipsis = F.round(
        F.expr("size(filter(_lines, l -> endswith(l, '...')))") / n_lines, 4
    )
    # whitespace tokens containing at least one letter
    d = d.withColumn(
        "_t", F.regexp_extract_all(F.col("text"), F.lit("\\S+"), F.lit(0))
    )
    alpha = F.round(
        F.expr("size(filter(_t, t -> t rlike '[a-zA-Z]'))")
        / F.greatest(F.size("_t"), F.lit(1)),
        4,
    )
    stop_arr = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    stops = F.expr(
        f"size(filter(array({stop_arr}), s -> array_contains(_w, s)))"
    )
    out = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet.alias("bullet_frac"),
        ellipsis.alias("ellipsis_frac"),
        alpha.alias("alpha_word_frac"),
        stops.alias("stop_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("bullet_frac") < max_bullet_frac)
        & (F.col("ellipsis_frac") < max_ellipsis_frac)
        & (F.col("alpha_word_frac") > min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("keep", keep)


def c4_clean(docs: DataFrame, min_line_words: int = 3,
             min_sentences: int = 3) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep
    only lines that end in terminal punctuation ('.', '!', '?', '\"')
    AND have at least `min_line_words` whitespace tokens; then drop
    whole documents that retain fewer than `min_sentences` sentences
    (terminal-punctuation marks over the kept text), contain a curly
    brace (code), or contain 'lorem ipsum' (placeholder boilerplate).

    Output: (doc_id, n_lines, n_kept, n_sentences, keep_doc,
    cleaned_md5) where cleaned_md5 hashes kept lines re-joined by
    '\\n' in original order. Unlike `line_dedup` (corpus-frequency
    evidence, one shuffle), every C4 rule is per-document: the whole
    operator is a narrow codegen map — zero shuffles at any scale."""
    d = docs.withColumn(
        "_lines",
        F.expr(
            "filter(transform(split(text, '\\n'), l -> trim(l)),"
            " l -> length(l) > 0)"
        ),
    )
    kept = F.expr(
        "filter(_lines, l -> l rlike '[.!?\"]$'"
        f" and size(split(l, ' +')) >= {min_line_words})"
    )
    d = d.withColumn("_kept", kept).withColumn(
        "_ktext", F.array_join(F.col("_kept"), "\n")
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("_ktext"), F.lit("[.!?]"), F.lit(0))
    )
    lower = F.lower(F.col("text"))
    keep_doc = (
        (n_sent >= min_sentences)
        & ~F.col("text").contains("{")
        & ~lower.contains("lorem ipsum")
    )
    return d.select(
        "doc_id",
        F.size("_lines").alias("n_lines"),
        F.size("_kept").alias("n_kept"),
        n_sent.alias("n_sentences"),
        keep_doc.alias("keep_doc"),
        F.md5(F.col("_ktext")).alias("cleaned_md5"),
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 100) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count — the
    vocabulary/boilerplate census behind stopword lists, boilerplate
    detectors, and contamination probes. Ties broken by the n-gram
    string so the top-k is deterministic.

    Scale shape: per-doc n-gram arrays built with codegen
    sequence+slice (no self-join), ONE count shuffle with map-side
    partial aggregation, then a TakeOrdered top-k (per-partition heap,
    driver merge of k rows per partition — never a global sort of the
    n-gram space)."""
    grams = F.expr(
        "case when size(_w) >= {n} then transform("
        "  sequence(0, size(_w) - {n}),"
        "  i -> array_join(slice(_w, i + 1, {n}), ' '))"
        " else array() end".format(n=int(n))
    )
    return (
        docs.withColumn("_w", _words())
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(int(k))
    )


def length_quantiles(docs: DataFrame) -> DataFrame:
    """Per-language exact length quantiles (p25/p50/p75/p90 of
    n_chars) + doc count — the distribution snapshot every curation
    run starts from (length cutoffs per language differ; picking them
    from a global histogram over-trims CJK and under-trims en).

    Uses Spark's exact `percentile` aggregate (linear interpolation at
    rank p*(n-1), the same definition as DuckDB/Postgres
    quantile_cont), NOT approx_percentile: per-group cardinalities
    here are a corpus-stats reduce where the groups are few (languages)
    and the sort-based exact agg is one shuffle keyed on lang. At
    100 TB swap in approx_percentile(..., accuracy) — same plan shape,
    bounded memory — which is why the quantile columns are rounded to
    4 places: the contract is distribution-shape, not bit-exactness.

    Scale shape: single hash-partition shuffle on lang; the percentile
    buffer holds one language's values per reducer — the documented
    memory ceiling of the exact variant and the reason the approx swap
    exists."""
    pct = F.expr("percentile(n_chars, array(0.25, 0.5, 0.75, 0.9))")
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        pct.alias("_q"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    cols = [F.round(F.col("_q")[i], 4).alias(name)
            for i, name in enumerate(("p25", "p50", "p75", "p90"))]
    return agg.select("lang", "n_docs", *cols, "min_chars", "max_chars")


def dsir_weights(
    docs: DataFrame, target_source: str, hex_chars: int = 3
) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of its hashed n-gram
    features under a bag-of-words model of a TARGET slice vs the RAW
    corpus, so resampling by weight shifts the mixture toward
    target-like text without training a classifier.

        feature  = first `hex_chars` of md5(token or bigram)
                   (16^hex_chars buckets — the hashed-feature trick,
                   and the md5-prefix form is engine-portable)
        p_s(b)   = (ct_s(b) + 1) / (N_s + B)   add-one over the bucket
                                               space, per side s
        weight   = sum over doc features of ln p_t(b) - ln p_r(b)

    Output: (doc_id, n_feats, log_weight) — log_weight rounded to 4dp
    for oracle hashing (summation-order drift is ~1e-13 relative).
    Docs with no alphabetic tokens are omitted, like lm_score.

    Scale shape: ONE map-side-combining aggregate on the bucket key
    builds BOTH side's counts (conditional sums — no second pass over
    the corpus for the raw side); totals are a 1-row re-aggregate
    broadcast back; the per-doc scoring join is skewed on stopword
    buckets exactly like lm_score's freq join (AQE skew-join splits
    it, and the doc_id re-aggregate absorbs the skew). The bucket
    table is B rows — broadcastable outright at any corpus size, which
    is the whole point of feature hashing here."""
    buckets = int(16 ** hex_chars)
    grams = F.expr(
        "case when size(_w) >= 2 then transform("
        "  sequence(0, size(_w) - 2),"
        "  i -> array_join(slice(_w, i + 1, 2), ' '))"
        " else array() end"
    )
    feats = (
        docs.withColumn("_w", _words())
        .select(
            "doc_id",
            "source",
            F.explode(F.concat(F.col("_w"), grams)).alias("_f"),
        )
        .select(
            "doc_id",
            "source",
            F.substring(F.md5(F.col("_f")), 1, int(hex_chars)).alias(
                "bucket"
            ),
        )
    )
    is_t = (F.col("source") == target_source).cast("long")
    ct = feats.groupBy("bucket").agg(
        F.sum(is_t).alias("ct_t"), F.count("*").alias("ct_r")
    )
    totals = ct.agg(
        F.sum("ct_t").alias("_nt"), F.sum("ct_r").alias("_nr")
    )
    lr = ct.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct_t") + F.lit(1.0)) / (F.col("_nt") + buckets))
            - F.log((F.col("ct_r") + F.lit(1.0)) / (F.col("_nr") + buckets))
        ).alias("_lr"),
    )
    return (
        feats.join(lr, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("_lr"), 4).alias("log_weight"),
        )
    )


def ccnet_buckets(
    docs: DataFrame,
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020): split each
    language's documents into head / middle / tail terciles of the
    LM-quality score, so downstream mixing can oversample the head
    (the published CommonCrawl curation recipe). RANK-based terciles,
    not threshold-based: bucket = 3·rank DIV n within (lang, score
    order, doc_id tie-break) — pure integers on top of the 4dp scores,
    so engine and oracle agree exactly even at tercile boundaries
    where an interpolated float threshold could flip a document.

    Output: (doc_id, lang, avg_neg_logprob, bucket) with bucket in
    head|middle|tail (head = lowest perplexity = most fluent).

    Scale shape: lm_score's aggregates, then the shared two-phase
    distributed rank grouped by lang (no per-lang global window), a
    broadcast-scale per-lang size join, and a codegen bucket map."""
    from .batching import global_positions

    scored = lm_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "avg_neg_logprob")
    if distributed:
        ranked = global_positions(
            scored,
            group_cols=("lang",),
            order_cols=("avg_neg_logprob", "doc_id"),
            out="_rk",
            cache_registry=cache_registry,
        )
    else:
        win = Window.partitionBy("lang").orderBy(
            F.col("avg_neg_logprob"), F.col("doc_id")
        )
        ranked = scored.withColumn("_rk", F.row_number().over(win) - 1)
    sizes = scored.groupBy("lang").agg(F.count("*").alias("_n"))
    b = F.expr("(3 * _rk) DIV _n")
    return (
        ranked.join(F.broadcast(sizes), "lang")
        .select(
            "doc_id",
            "lang",
            "avg_neg_logprob",
            F.when(b == 0, "head")
            .when(b == 1, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def lang_confusion(docs: DataFrame) -> DataFrame:
    """Language-metadata audit: confusion matrix of the DECLARED lang
    column vs the detector's verdict — the standard first check on any
    multilingual corpus (mislabeled lang is the top cause of bad
    per-language curation thresholds downstream). Output
    (lang, pred_lang, n).

    Scale shape: lang_id is a zero-shuffle codegen map, so the whole
    audit is ONE matrix aggregate (map-side combining; ≤ langs² rows
    out) riding a doc_id-keyed join that AQE broadcasts at dim scale
    — at corpus scale prefer fusing: run lang_id's expressions inline
    on the scan carrying `lang` and skip the join entirely (the
    composition here keeps the detector single-sourced)."""
    return (
        lang_id(docs)
        .select("doc_id", "pred_lang")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


def quality_percentiles(
    docs: DataFrame,
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Per-source percentile-rank calibration of the quality score —
    the cross-source comparability fix: raw quality scores are not
    comparable between sources (a mid-tier wiki doc outscores a top
    forum doc on raw features), so mixture/filter policies operate on
    the WITHIN-SOURCE percentile instead. Rank-based and integer
    (pct_bp = 10000·rank DIV (n−1), rank ties broken by doc_id), so
    the calibration is engine-exact — the same boundary argument as
    `ccnet_buckets`.

    Output: (doc_id, source, quality, pct_bp) with pct_bp in
    [0, 10000] (single-doc sources get 0 by the n−1 = 0 guard).

    Scale shape: quality_score is a zero-shuffle map; the rank is the
    shared two-phase distributed form grouped by source; sizes join
    back at dim scale."""
    from .batching import global_positions

    scored = quality_score(docs, keep=("source",)).select(
        "doc_id", "source", "quality"
    )
    if distributed:
        ranked = global_positions(
            scored,
            group_cols=("source",),
            order_cols=("quality", "doc_id"),
            out="_rk",
            cache_registry=cache_registry,
        )
    else:
        win = Window.partitionBy("source").orderBy(
            F.col("quality"), F.col("doc_id")
        )
        ranked = scored.withColumn("_rk", F.row_number().over(win) - 1)
    sizes = scored.groupBy("source").agg(F.count("*").alias("_n"))
    return (
        ranked.join(F.broadcast(sizes), "source")
        .select(
            "doc_id",
            "source",
            "quality",
            F.expr(
                "CASE WHEN _n <= 1 THEN CAST(0 AS BIGINT)"
                " ELSE (10000 * _rk) DIV (_n - 1) END"
            ).alias("pct_bp"),
        )
    )


def bm25_search(
    docs: DataFrame, queries: DataFrame, k: int = 5, df_cap: int = 1000
) -> DataFrame:
    """BM25 batch retrieval (Robertson & Zaragoza 2009) — the
    length-normalized upgrade of `batch_search`: long documents stop
    winning on raw term counts. k1 = 1.2, b = 0.75 (the standard
    defaults), made INTEGER-EXACT by clearing denominators:

        avgdl = T / N   (T total tokens, N docs with tokens)
        tfnorm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
               = 22·T·tf / (10·T·tf + 3·T + 9·dl·N)   (×10T, exact)
        score  = Σ_terms idf_ppm(term) · tfnorm   with
        idf_ppm = 1000000·N DIV df   (the repo's tf·idf convention)

    computed as `(idf_ppm · 22·T·tf) DIV (10·T·tf + 3·T + 9·dl·N)`
    per term — bigint-safe to ~10^6-doc gate corpora (the product is
    bounded by 1e6·N·22·T·tf_max; at true corpus scale swap the ppm
    scale down one decade, same contract as tfidf_topk).

    Output: (query_id, doc_id, score, n_terms_matched, rnk ≤ k).

    Scale shape: identical join geometry to `batch_search` (corpus tf
    aggregate + broadcast-scale probe side + df-capped postings), one
    extra doc-length dim joined on doc_id; the df-cap bounds fan-out
    the same way."""
    from pyspark.sql import Window

    words = docs.select(
        "doc_id", F.explode(_words()).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= int(df_cap))
    )
    totals = dl.agg(
        F.sum("dl").alias("_t"), F.count("*").alias("_n")
    )
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(
                F.expr(f"regexp_extract_all(lower(qtext), '{WORD_RE}', 0)")
            )
        ).alias("term"),
    ).distinct()
    term_score = F.expr(
        "((1000000 * _n DIV df) * (22 * _t * tf))"
        " DIV (10 * _t * tf + 3 * _t + 9 * dl * _n)"
    )
    scored = (
        tf.join(qterms, "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(term_score).alias("score"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select(
            "query_id", "doc_id", "score", "n_terms_matched",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# Mojibake signature digraphs: UTF-8 bytes of common Latin-1/cp1252
# characters re-decoded as Latin-1 ('é' → 'Ã©', ''' → 'â€™', …).
MOJIBAKE_RE = "Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã±|â€™|â€œ"
# C0 controls that never belong in text (NUL excluded — parquet/SQL
# string literals handle it inconsistently; tab/newline/CR are legal)
CTRL_RE = "[" + "".join(
    chr(c) for c in list(range(1, 9)) + [11, 12] + list(range(14, 32))
) + "]"


def encoding_audit(docs: DataFrame) -> DataFrame:
    """Encoding-damage audit — the mojibake sweep a web-scale curation
    run does before any text op: UTF-8 re-decoded as Latin-1/cp1252
    leaves signature digraphs (MOJIBAKE_RE), failed decodes leave
    U+FFFD replacement chars, and binary-in-text leaves C0 controls.
    Per doc: counts of each class + an `enc_ok` verdict.

    Scale shape: pure narrow codegen map (three regexp_count
    expressions), no shuffle, no Python; the patterns are literals
    shared verbatim with the DuckDB oracle (plain literal alternation
    + an explicit char class — identical in java.util.regex and
    RE2)."""
    n_rep = F.regexp_count(F.col("text"), F.lit("�"))
    n_moj = F.regexp_count(F.col("text"), F.lit(MOJIBAKE_RE))
    n_ctl = F.regexp_count(F.col("text"), F.lit(CTRL_RE))
    return docs.select(
        "doc_id",
        n_rep.cast("long").alias("n_replacement"),
        n_moj.cast("long").alias("n_mojibake"),
        n_ctl.cast("long").alias("n_ctrl"),
        ((n_rep + n_moj + n_ctl) == 0).alias("enc_ok"),
    )


def phrase_search(
    docs: DataFrame, phrases: list[tuple[str, str]]
) -> DataFrame:
    """Positional phrase retrieval: for each two-word phrase, find the
    documents where the words occur ADJACENTLY (position i, i+1) and
    count occurrences — the operator a positional inverted index
    serves, which bag-of-words retrieval (bm25_search / batch_search /
    tfidf) cannot express. Output: (phrase, doc_id, n_hits), one row
    per matching (phrase, doc) pair.

    Scale shape — selectivity first: the positional postings
    (doc_id, pos, term) are a narrow posexplode map, immediately
    semi-joined against the BROADCAST phrase-term set, so only
    postings of words that appear in some probe phrase ever reach an
    exchange (the classic phrase-query plan: stopword-free probe terms
    make this a tiny fraction of the corpus). The adjacency test is
    one equi-join on (doc_id, pos+1 = pos) between first-word and
    second-word postings — AQE-planned, keys carry two longs — then a
    (phrase, doc_id) hash aggregate with map-side combine. No windows,
    no UDFs, no full-corpus shuffle.
    """
    first_terms = sorted({a for a, _ in phrases})
    spark = docs.sparkSession
    pdf = spark.createDataFrame(
        [(a, b, f"{a} {b}") for a, b in phrases], "w1 string, w2 string, phrase string"
    )
    postings = docs.select(
        "doc_id",
        F.posexplode(_words()).alias("pos", "term"),
    ).filter(
        F.col("term").isin(sorted({w for p in phrases for w in p}))
    )
    a = postings.withColumnRenamed("term", "w1")
    b = postings.select(
        F.col("doc_id").alias("doc_id_b"),
        (F.col("pos") - 1).alias("pos_b"),
        F.col("term").alias("w2_b"),
    )
    hits = (
        a.join(F.broadcast(pdf), "w1")
        .join(
            b,
            (F.col("doc_id") == F.col("doc_id_b"))
            & (F.col("pos") == F.col("pos_b"))
            & (F.col("w2") == F.col("w2_b")),
        )
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over the
    corpus' word bigrams — the vocabulary/tokenizer-construction
    statistic (which adjacent pairs co-occur far above chance and
    deserve a merged token). PMI(w1,w2) = ln(c12 · N / (c1 · c2))
    with N = total bigram count; pairs below `min_count` occurrences
    are dropped (PMI is noise on rare pairs), output ordered by
    (pmi desc, w1, w2) and truncated to k.

    Cross-engine float discipline: the PMI double is computed with an
    IDENTICAL expression shape in the DuckDB oracle
    (ln((c12·N)/(c1·c2)) over doubles) and rounded to 4dp BEFORE the
    ordering rank, so boundary ulps cannot flip the top-k cut.

    Scale shape: the token array is materialized ONCE per doc (the
    explode's child projection — regexp runs once, not per bigram
    reference); bigram expansion is a zip of the array with its tail
    (no unigram posexplode); ONE hash aggregate on the bigram pair
    with map-side combine, one on the unigram. The min_count-filtered
    pair set is the SMALL side, so it is what broadcasts — the
    unigram-count table (unbounded vocabulary at 100 TB) never
    shuffles for the two lookups. Total-N sums the already-aggregated
    bigram counts — no extra corpus pass.
    """
    toks = docs.select(_words().alias("w"))
    pair_rows = toks.select(
        F.explode(
            _bigram_structs()
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    pairs = (
        pair_rows.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    uni = (
        toks.select(F.explode("w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = pair_rows.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    j1 = uni.join(F.broadcast(pairs), uni["w"] == pairs["w1"]).select(
        "w1", "w2", "c12", F.col("c").alias("c1")
    )
    j2 = uni.join(F.broadcast(j1), uni["w"] == j1["w2"]).select(
        "w1", "w2", "c12", "c1", F.col("c").alias("c2")
    )
    scored = (
        j2.crossJoin(F.broadcast(total))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c12").cast("double") * F.col("n_total").cast("double"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                4,
            ),
        )
        .select("w1", "w2", "c12", "pmi")
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )
    return scored


def dup_ngram_fractions(docs: DataFrame) -> DataFrame:
    """Within-document duplicate-n-gram fractions for n = 2, 3, 4 —
    the Gopher/Dolma repetition signals that complement
    `repetition_stats`' max-run and modal-bigram columns: a page can
    dodge both of those while still cycling a handful of phrases, and
    the dup-n-gram fraction catches exactly that.

    Per doc: dup{n}_bp = 10000·(n-grams − distinct n-grams) DIV
    n-grams, 0 when the doc has no n-grams — integer basis points so
    engine-vs-oracle equality is exact (the published float
    thresholds ~0.2/0.18/0.16 translate to 2000/1800/1600 bp).

    Scale shape: ONE narrow codegen projection (regexp tokenize +
    array transforms + array_distinct per row), zero shuffles, zero
    Python — fuses with the scan at any corpus size."""
    d = docs.withColumn(
        "_w", F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    )

    def grams(n: int):
        parts = ", ".join(f"element_at(_w, i + {k})" for k in range(n))
        return F.expr(
            f"CASE WHEN size(_w) >= {n} THEN"
            f" transform(sequence(1, size(_w) - {n - 1}),"
            f" i -> concat_ws(' ', {parts}))"
            " ELSE array() END"
        )

    out = d.select("doc_id", *[grams(n).alias(f"_g{n}") for n in (2, 3, 4)])
    cols = ["doc_id"]
    for n in (2, 3, 4):
        cols.append(
            F.when(F.size(f"_g{n}") > 0, F.expr(
                f"10000 * (size(_g{n}) - size(array_distinct(_g{n})))"
                f" div size(_g{n})"
            )).otherwise(F.lit(0)).cast("int").alias(f"dup{n}_bp")
        )
    return out.select(*cols)


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """Per-language tokenizer-fertility rollup — the budgeting numbers
    a pretraining mix is costed in: how many characters and UTF-8
    bytes one (BPE-ish) token buys per language. Languages with low
    chars-per-token inflate training cost for the same text volume;
    the mixture weighting and per-language length cutoffs both key on
    these ratios.

    Output per lang: n_docs, total tokens/chars/bytes, and
    chars_per_token_milli / bytes_per_token_milli (×1000 integer DIV,
    0 when the language has no tokens) — integer so the DuckDB twin
    is value-exact.

    Scale shape: one map-side-combining aggregate keyed on lang
    (tens of groups) after a narrow codegen tokenize — the classic
    tiny-result corpus pass."""
    bpe = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    )
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(bpe.cast("long")).alias("tokens"),
        F.sum(F.length("text").cast("long")).alias("chars"),
        F.sum(F.octet_length("text").cast("long")).alias("bytes"),
    )
    per = lambda num: F.when(  # noqa: E731
        F.col("tokens") > 0, F.expr(f"1000 * {num} div tokens")
    ).otherwise(F.lit(0)).cast("long")
    return agg.select(
        "lang", "n_docs", "tokens", "chars", "bytes",
        per("chars").alias("chars_per_token_milli"),
        per("bytes").alias("bytes_per_token_milli"),
    )


def known_item_eval(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    df_cap: int = 1000,
) -> DataFrame:
    """Known-item retrieval audit: each probe query is derived FROM a
    source document (query_id = its doc_id), so the document's rank in
    the BM25 result list is ground truth for free — the standard
    self-retrieval eval a corpus pipeline runs to validate its index
    before any human relevance labels exist.

    Output, one row per query (misses kept, not dropped):

      query_id    the source document id
      found_rank  rank of the source doc in BM25 top-k (NULL if the
                  doc did not make top-k — e.g. its probe terms were
                  all above the df-cap, or boilerplate outranked it)
      hit1 / hit5 / hit10   0/1 ints (hit_n = found_rank ≤ n)

    Integer-exact by construction: ranks come from `bm25_search`'s
    integer scoring, the hit flags are comparisons — the DuckDB twin
    is bit-identical.

    Scale shape: inherits `bm25_search`'s join geometry (corpus tf
    aggregate + df-capped postings + broadcast-scale probe side); the
    extra work is one filter (doc_id = query_id) and one left join
    back to the query dim, both on the small probe side."""
    ranked = bm25_search(docs, queries, k=k, df_cap=df_cap)
    self_rank = ranked.filter(
        F.col("doc_id") == F.col("query_id")
    ).select("query_id", F.col("rnk").alias("found_rank"))
    hit = lambda n: (  # noqa: E731
        F.coalesce(F.col("found_rank") <= n, F.lit(False))
    ).cast("int")
    return (
        queries.select("query_id")
        .join(self_rank, "query_id", "left")
        .select(
            "query_id",
            F.col("found_rank").cast("int").alias("found_rank"),
            hit(1).alias("hit1"),
            hit(5).alias("hit5"),
            hit(10).alias("hit10"),
        )
    )


def corpus_cube(docs: DataFrame) -> DataFrame:
    """Multi-dimensional corpus composition in ONE pass: doc counts
    and char volume for every (lang x source) grouping combination —
    the (lang, source) cells, per-lang and per-source marginals, and
    the grand total — via CUBE. `gid` is the standard grouping
    bitmask (Spark grouping_id == ANSI GROUPING(lang, source)), which
    is what lets a consumer tell an aggregate-level NULL from a data
    NULL in the dimension columns.

    Scale shape: CUBE compiles to one Expand (x4 rows, each tagged
    with its grouping set) feeding a single map-side-combining
    aggregate — one shuffle total, vs four separate jobs for the four
    group-bys. The x4 pre-shuffle expansion is the trade; with many
    more dimensions, re-aggregating marginals from the finest-level
    result is the cheaper shape.

    Output: (lang, source, gid, n_docs, n_chars).
    """
    return docs.cube("lang", "source").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )


def corpus_drift(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """Unigram distribution shift between two crawl snapshots — the
    drift monitor a recrawl pipeline runs before retraining on a new
    dump (did the token mix move?). Snapshots here are the
    deterministic doc_id-parity halves of the corpus (crawl A =
    even ids, B = odd); in production the two sides are two crawl
    partitions of the same table.

    Per-word drift is ranked by |cnt_a * tot_b - cnt_b * tot_a| — the
    cross-multiplied form of |p_a - p_b| that stays in exact BIGINT
    arithmetic, so the top-n cut is bit-stable across engines; the
    probabilities themselves are emitted rounded for reporting.

    Scale shape: one word-key shuffle with map-side combine (the
    explode collapses into partial counts before exchange), a 1-row
    totals aggregate broadcast back, and a global top-n that Spark
    executes as per-partition partial TakeOrdered — no full sort of
    the vocabulary. Output: (word, cnt_a, cnt_b, p_a, p_b,
    drift_score).
    """
    words = docs.select(
        (F.col("doc_id") % 2).alias("_crawl"),
        F.explode(_words()).alias("word"),
    )
    counts = words.groupBy("word").agg(
        F.sum(F.when(F.col("_crawl") == 0, 1).otherwise(0))
        .cast("long")
        .alias("cnt_a"),
        F.sum(F.when(F.col("_crawl") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cnt_b"),
    )
    tot = counts.agg(
        F.sum("cnt_a").alias("_ta"), F.sum("cnt_b").alias("_tb")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "word",
            "cnt_a",
            "cnt_b",
            F.round(F.col("cnt_a") / F.col("_ta"), 6).alias("p_a"),
            F.round(F.col("cnt_b") / F.col("_tb"), 6).alias("p_b"),
            F.abs(
                F.col("cnt_a") * F.col("_tb") - F.col("cnt_b") * F.col("_ta")
            ).alias("drift_score"),
        )
        .orderBy(F.desc("drift_score"), F.asc("word"))
        .limit(top_n)
    )


def lm_bigram_score(
    docs: DataFrame, train_mod: int = 2, backoff: float = 0.4
) -> DataFrame:
    """Bigram language-model scoring with stupid backoff (Brants et
    al. 2007) — the next step up from `lm_score`'s unigram filter and
    the SQL-expressible core of the CCNet 5-gram-KenLM gate. The LM
    trains on the md5(doc_id) % train_mod == 0 SPLIT and scores every doc,
    so held-out docs genuinely exercise the backoff path (a same-
    corpus bigram LM would never back off).

        P(w2|w1) = c12/c1                     bigram seen in train
                 = backoff * (c2+1)/(N+V)     otherwise (add-one
                                              unigram, unseen-safe)
        score    = avg over doc bigrams of -ln P(w2|w1)

    Output: (doc_id, n_bigrams, avg_neg_logprob rounded 4dp,
    backoff_bp = 10000 * backed-off bigrams DIV n_bigrams). Docs with
    <2 tokens produce no bigram rows and are omitted (unscorable),
    matching `lm_score`'s convention.

    Scale shape: two map-side-combining training aggregates (bigram-
    and unigram-keyed); scoring is three equi-joins of the exploded
    corpus against them — stopword-skewed exactly like `lm_score`'s
    freq join (AQE skew-join splits it; the per-doc re-aggregate
    absorbs the skew) — then ONE doc_id aggregate. ln() and the
    branch are JVM codegen; no UDFs, no windows.
    """
    toks = docs.select("doc_id", _words().alias("w"))
    bg = toks.select(
        "doc_id",
        F.explode(
            _bigram_structs()
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # md5-parity split, NOT a numeric cast: doc ids are strings in the
    # general case ('doc-7f3a'), and cast('long') would silently NULL
    # every row out of the training set. First-2-hex-chars of
    # md5(doc_id) is engine-exact (Spark conv / DuckDB nibble dialect)
    # and supports train_mod up to 256.
    in_train = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
        ).cast("int")
        % train_mod
        == 0
    )
    train = bg.filter(in_train)
    c12 = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = (
        toks.filter(in_train)
        .select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    totals = uni.agg(F.sum("c").alias("_n"), F.count("*").alias("_v"))
    scored = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1")),
              "w1", "left")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2")),
              "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    seen = F.col("c12").isNotNull() & F.col("c1").isNotNull()
    p = F.when(
        seen, F.col("c12").cast("double") / F.col("c1").cast("double")
    ).otherwise(
        F.lit(backoff)
        * (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
        / (F.col("_n") + F.col("_v"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(-F.log(p)), 4).alias("avg_neg_logprob"),
        F.expr(
            "CAST(10000 * sum(CASE WHEN c12 IS NULL OR c1 IS NULL"
            " THEN 1 ELSE 0 END) DIV count(*) AS BIGINT)"
        ).alias("backoff_bp"),
    )


def linear_classifier_score(
    docs: DataFrame, n_buckets: int = 4096
) -> DataFrame:
    """Hashed-feature linear classifier inference — the fastText-style
    scoring pass behind modern model-based quality filters (FineWeb-Edu
    classifier gating, CC lang-id): word unigram + bigram features are
    hashed into `n_buckets` via the hashing trick, a broadcast weight
    table scores them, and the per-doc sum decides keep/drop.

    The WEIGHTS here are synthesized deterministically from md5 of the
    bucket index (integers in [-8, 8]) — this container has no trained
    model, and the operator's value is the verified PLUMBING (hashing,
    broadcast, aggregation); swap the weight DataFrame for real
    exported weights and nothing else changes. Same convention as the
    multimodal decode stubs.

    Cross-engine exactness: feature hash = first 5 hex chars of
    md5(feature) as an integer (Spark `conv`, DuckDB position-nibble
    dialect) mod n_buckets; weights and scores are all integers.

    Scale shape: feature expansion is a codegen explode (the bigram
    transform rides the same word array); the weight table is
    `n_buckets` rows — broadcast-joined, so the corpus side never
    shuffles for the lookup; ONE doc_id hash aggregate ends the plan.
    Exactly the geometry a real exported linear model would use.
    """
    spark = docs.sparkSession
    weights = spark.range(n_buckets).select(
        F.col("id").alias("b"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("w|"), F.col("id").cast("string"))),
                    1, 4,
                ),
                16, 10,
            ).cast("long") % 17 - 8
        ).alias("wgt"),
    )
    toks = docs.select("doc_id", _words().alias("w"))
    feats = toks.select(
        "doc_id", F.explode("w").alias("f")
    ).unionByName(
        toks.select("doc_id", F.explode(_bigram_structs()).alias("_bg"))
        .select(
            "doc_id",
            F.concat("_bg.w1", F.lit(" "), "_bg.w2").alias("f"),
        )
    )
    bucketed = feats.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("f"), 1, 5), 16, 10).cast("long")
            % n_buckets
        ).alias("b"),
    )
    return (
        bucketed.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum("wgt").alias("score"),
        )
        .select(
            "doc_id",
            "n_features",
            "score",
            F.when(F.col("score") >= 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def quality_fuse(
    docs: DataFrame, cache_registry: list | None = None
) -> DataFrame:
    """Multi-signal quality fusion — the ensemble keep/drop gate a
    production mix runs instead of any single filter (Dolma/FineWeb
    combine heuristic, LM, and classifier signals): each doc's three
    scores (`quality_score`'s heuristic, `lm_score`'s unigram
    perplexity, `linear_classifier_score`'s hashed-linear score) are
    converted to corpus-wide rank percentiles (worst=0 .. best=10000,
    integer basis points, ties by doc_id) and mean-fused; keep =
    fused >= 5000. Rank fusion makes the signals scale-free — no
    per-signal threshold tuning survives a corpus shift, ranks do.

    Docs any signal cannot score (no alphabetic tokens) drop out via
    the inner join — same "unscorable" convention as `lm_score`.

    Scale shape: three corpus passes produce three narrow per-doc
    signal tables joined on doc_id; each percentile is the two-phase
    `global_positions` rank (range partition + pid-local window —
    never a single-partition global window); the doc count rides as a
    1-row broadcast. All outputs integer, oracle value-exact.
    """
    from yacy_grid_crawler_spark.operators.batching import global_positions

    caches: list = cache_registry if cache_registry is not None else []
    q = quality_score(docs).select("doc_id", "quality")
    l = lm_score(docs).select("doc_id", "avg_neg_logprob")
    c = linear_classifier_score(docs).select("doc_id", "score")
    s = (
        q.join(l, "doc_id")
        .join(c, "doc_id")
        .withColumn("_neg_nlp", -F.col("avg_neg_logprob"))
    )
    s = global_positions(
        s, (), ("quality", "doc_id"), out="_rq",
        cache_registry=caches, broadcast_offsets=False,
    )
    s = global_positions(
        s, (), ("_neg_nlp", "doc_id"), out="_rl",
        cache_registry=caches, broadcast_offsets=False,
    )
    s = global_positions(
        s, (), ("score", "doc_id"), out="_rc",
        cache_registry=caches, broadcast_offsets=False,
    )
    n = s.groupBy().agg(F.count("*").alias("_n"))
    denom = F.greatest(F.col("_n") - 1, F.lit(1))
    out = s.crossJoin(F.broadcast(n)).select(
        "doc_id",
        F.expr("CAST(10000 * _rq AS BIGINT)").alias("_xq"),
        F.expr("CAST(10000 * _rl AS BIGINT)").alias("_xl"),
        F.expr("CAST(10000 * _rc AS BIGINT)").alias("_xc"),
        denom.alias("_d"),
    ).select(
        "doc_id",
        F.expr("_xq DIV _d").alias("pq_bp"),
        F.expr("_xl DIV _d").alias("plm_bp"),
        F.expr("_xc DIV _d").alias("pcls_bp"),
        F.expr("(_xq DIV _d + _xl DIV _d + _xc DIV _d) DIV 3").alias(
            "fused_bp"
        ),
    ).withColumn("keep", F.col("fused_bp") >= 5000)
    if cache_registry is None:
        # same None-registry sweep as suffix_array: don't leak the
        # three range-partitioned persists past the call
        for c in caches:
            c.unpersist()
    return out
