"""Document-level deduplication for large-scale training-data
pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

These extend the reference's URL-level dedup stack (SURVEY.md §2 D1-D4)
to document *content* — the ops a 100 TB corpus pipeline needs. All
hashing is built on md5-hex primitives so every operator has an
exactly-equivalent ANSI-SQL oracle (DuckDB shares Spark's md5 output);
minhash uses lexicographic MIN over salted md5 hex strings instead of
integer hashes for the same reason (no integer-conversion dialect
drift).

Scale design:
* exact dedup — one shuffle on md5(text): map-side partial agg free.
* minhash — shingle explode is narrow; signature agg is one shuffle
  keyed by doc_id; band bucket join is a self-equi-join on the band
  key (AQE handles bucket skew; a df-capped shingle set bounds hot
  buckets).
* simhash — narrow explode + one agg by doc_id; candidate pairing is
  an equi-join on the 16-bit key (or banded sub-keys for hamming>0).
* jaccard — inverted-index join on (capped) shingles: the classic
  candidate-pair bound; the df cap is what keeps a Zipf vocabulary
  from going quadratic at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_MINHASHES = 8
LSH_BANDS = 4  # r = N_MINHASHES / LSH_BANDS = 2 rows per band
SHINGLE_N = 3
SIMHASH_BITS = 16
JACCARD_DF_CAP = 50  # ignore shingles in more docs than this (candidate bound)

WORD_RE = "[a-z]+"


def with_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenize: lowercase latin word runs (identical regex in the
    DuckDB oracle)."""
    return df.withColumn(
        "words", F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
    )


def shingles_expr(n: int = SHINGLE_N):
    """array of n-word shingles from `words` (1-based element_at —
    matches DuckDB 1-based list indexing)."""
    parts = ", ".join(f"element_at(words, i + {k})" for k in range(n))
    # guard: Spark sequence(1, 0) is DESCENDING [1, 0] — short docs
    # must yield an empty shingle array, not an index-0 access
    return F.expr(
        f"CASE WHEN size(words) >= {n} THEN"
        f" transform(sequence(1, size(words) - {n - 1}),"
        f" i -> concat_ws(' ', {parts}))"
        f" ELSE array() END"
    )


def doc_shingles(df: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        with_words(df)
        .select("doc_id", F.explode(F.array_distinct(shingles_expr(n))).alias("shingle"))
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with its
    cardinality and canonical representative (min doc_id)."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASHES) -> DataFrame:
    """(doc_id, h0..h{n-1}): minhash_j = MIN over shingles of
    md5('<j>|' || shingle) — salted-md5 minhash, string-min semantics
    (identical in any ANSI engine).

    The explode is deliberate and load-bearing: a generator is a
    projection-collapse barrier, so the tokenize+shingle expression
    runs ONCE per document. A per-row formulation (8 columns of
    `array_min(transform(sh, ...))`) looks shuffle-free but Catalyst's
    CollapseProject inlines the shingling into every hash column —
    8× the regex work per row (measured 8× slower at sf0.1). The
    groupBy shuffles only (doc_id, 8×32B hex) partial-aggregated rows,
    which map-side combine keeps tiny at any scale."""
    sh = doc_shingles(docs)
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle"))).alias(f"h{j}")
            for j in range(n_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{j}").alias(f"h{j}") for j in range(n_hashes)]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = N_MINHASHES,
    bands: int = LSH_BANDS,
    cache_registry: list | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (doc_a < doc_b) that collide in ≥1 LSH
    band; band key = concat of the band's r minhashes. The classic
    shingle→minhash→band→bucket-join pipeline as pure DataFrame ops."""
    r = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes)
    # one posexplode pass instead of a `bands`-way union (a union of
    # selects over `sig` re-executes the signature scan per branch)
    band_keys = [
        F.concat_ws("", *[F.col(f"h{b * r + k}") for k in range(r)])
        for b in range(bands)
    ]
    # cache across the self-join: both sides re-execute the signature
    # pipeline otherwise (at cluster scale this is the standard
    # materialize-the-signature-table step)
    # cache across the self-join; registered with the caller's sweep
    # (same hygiene as plans/wave.py cache_registry) so long-running
    # pipelines don't accumulate one cached table per call
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    ).persist()
    if cache_registry is not None:
        cache_registry.append(banded)
    a = banded.alias("a")
    b_ = banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_docs(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — `bits`-bit simhash over word tokens.

    Per word, bit b comes from hex digit b of md5(word): contribution
    ±1 by (digit >> (b%4... )) — we use one hex digit per bit (16 bits
    = first 16 hex chars), bit = digit & 1. Sum of (2*bit - 1) per
    position; simhash bit = sum >= 0. All integer arithmetic — exactly
    expressible in ANSI SQL.

    One row per (doc, word) — the per-bit dimension is 16 parallel
    aggregate columns, not a 16× posexplode row blowup (which costs a
    16× shuffle and a second aggregation). Map-side combine reduces
    each partition to one 16-int row per doc before the single
    shuffle. Hex-digit parity: digit value % 2 == 1 ⟺ the digit is in
    '13579bdf'.
    """
    words = with_words(docs).select("doc_id", F.explode("words").alias("word"))
    hashed = words.select("doc_id", F.md5(F.col("word")).alias("wh"))
    # contribution of one word to bit i (1-based): ±1 by hex-digit parity
    contrib = [
        F.sum(
            F.when(
                F.instr(F.lit("13579bdf"), F.substring("wh", i, 1)) > 0, 1
            ).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(1, bits + 1)
    ]
    summed = hashed.groupBy("doc_id").agg(*contrib)
    simhash = None
    for i in range(1, bits + 1):
        term = F.when(F.col(f"s{i}") >= 0, F.lit(1 << (i - 1))).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return summed.select(
        "doc_id", simhash.cast("bigint").alias("simhash")
    )


def simhash_duplicate_groups(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Docs sharing an identical simhash (hamming-0 groups)."""
    sh = simhash_docs(docs, bits)
    return (
        sh.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_pairs(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
    band_df_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs at simhash hamming distance <= max_hamming,
    via pigeonhole band blocking. Output: (doc_a, doc_b, hamming) with
    doc_a < doc_b.

    The signature is split into max_hamming+1 contiguous bit bands. A
    pair within hamming <= max_hamming differs in at most max_hamming
    bits, so at least one band is bit-identical (pigeonhole) — the
    banded equi-self-join is EXACT (recall 1.0 vs the all-pairs scan),
    not an approximation; the quadratic work collapses to candidates
    that collide on a band.

    Scale shape: signature agg is one doc_id shuffle (simhash_docs);
    banding is a (max_hamming+1)x narrow explode of 2-column rows; the
    self-join shuffles once on (band_no, band_val); the true-hamming
    filter (bit_count(a^b)) runs JVM-side on candidates only, and the
    final pair collapse (a pair can collide on several bands) is one
    map-side-combining agg. Hot bands (e.g. the all-zeros band over
    short docs) are AQE skew-join territory, same as the minhash LSH
    operator above; `band_df_cap` drops degenerate buckets outright
    (documented recall loss — see banded_hamming_pairs).
    """
    sh = simhash_docs(docs, bits)
    return banded_hamming_pairs(
        sh,
        bits=bits,
        max_hamming=max_hamming,
        id_col="doc_id",
        hash_col="simhash",
        out_a="doc_a",
        out_b="doc_b",
        band_df_cap=band_df_cap,
    )


def banded_hamming_pairs(
    hashes: DataFrame,
    bits: int,
    max_hamming: int,
    id_col: str,
    hash_col: str,
    out_a: str,
    out_b: str,
    n_bands: int | None = None,
    band_df_cap: int | None = None,
) -> DataFrame:
    """The shared pigeonhole banded-Hamming self-join — ONE
    exactness-critical geometry serving both the 16-bit simhash text
    path and the 63-bit perceptual-hash media path
    (multimodal.py::phash_near_pairs).

    The `bits`-bit hash splits into `n_bands` contiguous bands
    (default max_hamming + 1, each ceil(bits / n_bands) wide). A pair
    within hamming <= max_hamming differs in at most max_hamming
    bits, so with n_bands > max_hamming at least one band is
    bit-identical (pigeonhole) — the banded equi-self-join is a
    SUPERSET of every true pair and the bit_count verify makes the
    result exact.

    Scale shape: n_bands narrow (id, hash, band) rows per input, one
    shuffle on (band_no, band_val), the true-hamming filter runs
    JVM-side on candidates only, one map-side-combining pair
    collapse. A degenerate corpus (many identical hashes) makes one
    bucket quadratic — `band_df_cap` drops buckets hotter than the
    cap (documented recall loss on pairs whose ONLY collision is a
    degenerate band); AQE's skew split handles milder cases.

    Output: (out_a, out_b, hamming) with out_a < out_b, exact and
    duplicate-free.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    if not 0 <= max_hamming < n_bands:
        raise ValueError(
            f"banded join is exact only for max_hamming < n_bands "
            f"({n_bands}); got {max_hamming}"
        )
    band_bits = (bits + n_bands - 1) // n_bands
    e = hashes.select(
        F.col(id_col).alias("_pid"),
        F.col(hash_col).alias("_ph"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(hash_col), b * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_no", "band_val"),
    )
    if band_df_cap is not None:
        hot = (
            e.groupBy("band_no", "band_val")
            .count()
            .filter(F.col("count") > band_df_cap)
            .select("band_no", "band_val")
        )
        e = e.join(F.broadcast(hot), ["band_no", "band_val"], "left_anti")
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(
        b,
        on=[
            F.col("a.band_no") == F.col("b.band_no"),
            F.col("a.band_val") == F.col("b.band_val"),
            F.col("a._pid") < F.col("b._pid"),
        ],
    ).select(
        F.col("a._pid").alias(out_a),
        F.col("b._pid").alias(out_b),
        F.bit_count(F.col("a._ph").bitwiseXOR(F.col("b._ph")))
        .cast("int")
        .alias("hamming"),
    )
    return (
        cand.filter(F.col("hamming") <= max_hamming)
        .groupBy(out_a, out_b)
        .agg(F.min("hamming").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = SHINGLE_N,
    threshold: float = 0.5,
    df_cap: int = JACCARD_DF_CAP,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing ≥1 rare
    shingle (document frequency ≤ df_cap — the inverted-index bound
    that keeps hot shingles from exploding the join at scale).

    Output: (doc_a, doc_b, jaccard rounded to 4dp) where
    jaccard = |A∩B| / |A∪B| ≥ threshold.
    """
    sh = doc_shingles(docs, n).persist()
    if cache_registry is not None:
        cache_registry.append(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    sh_rare = sh.join(rare, "shingle")
    a = sh_rare.alias("a")
    b = sh_rare.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------

def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    max_iters: int = 20,
    cache_registry: list | None = None,
) -> DataFrame:
    """Connected components over near-dup candidate pairs — the step a
    production dedup pipeline runs AFTER pair generation: transitive
    closure turns pairwise collisions into groups so exactly one
    representative per group survives. Output: (doc_id, cluster_id)
    for EVERY document, cluster_id = min doc_id of its component
    (singletons are their own cluster); keep-rule = `doc_id ==
    cluster_id`.

    Algorithm: iterative min-label propagation — each round every
    vertex takes the min of its own label and its neighbors' labels
    (one equi-join + one map-side-combining min-agg shuffle per
    round), driver loop ends when a round changes nothing. Rounds
    needed = component diameter; near-dup components are shallow
    (LSH bands connect dups densely), so 2-4 rounds in practice —
    this is the standard large-graph CC shape (hash-to-min), no
    single-partition step anywhere. `localCheckpoint` cuts the plan's
    lineage so round N's plan stays O(1), exactly like the BFS driver
    loop in plans/crawl_job.py.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(docs, cache_registry=cache_registry)
    # symmetric edge list once; persisted across rounds
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(edges)
    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    ).localCheckpoint()
    for _ in range(max_iters):
        neigh_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("n_min"))
        )
        new_labels = (
            labels.join(neigh_min, labels.doc_id == neigh_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("n_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap against a held-out set
# ---------------------------------------------------------------------------

def decontaminate_overlap(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    n: int = 4,
    cache_registry: list | None = None,
) -> DataFrame:
    """Training-data decontamination: flag training documents sharing
    at least one word n-gram with a benchmark/eval set (the standard
    13-gram-overlap rule from LM data pipelines; `n` is a parameter —
    the synthetic corpus' short texts use n=4 so the oracle has
    nonzero hits). Output: (doc_id, n_hits, contaminated) for every
    TRAINING doc, n_hits = number of distinct shared n-grams.

    Scale shape: distinct doc-shingle inverted index on the training
    side; the benchmark side is small by construction (eval sets are
    thousands of docs, not billions) so its shingle set broadcasts —
    no shuffle of the training corpus beyond the shingle projection.
    `benchmark=None` carves the deterministic held-out subset
    doc_id % 97 == 0 out of `docs` (the bench/test fixture split).
    """
    if benchmark is None:
        benchmark = docs.filter(F.col("doc_id") % 97 == 0)
        docs = docs.filter(F.col("doc_id") % 97 != 0)
    train_sh = doc_shingles(docs, n)
    bench_sh = doc_shingles(benchmark, n).select("shingle").distinct()
    hits = (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def canonical_docs(
    docs: DataFrame,
    quality: DataFrame,
    pairs: DataFrame | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Canonical-representative selection — the step AFTER clustering:
    per near-dup cluster keep the single best document (highest
    quality score, ties to the smallest doc_id), which is what a
    dedup pipeline actually emits downstream. Composes
    duplicate_clusters (connected components over candidate pairs)
    with any per-doc quality signal (`quality`: doc_id + a `quality`
    column, e.g. textstats.quality_score).

    Output: (cluster_id, n_members, keep_doc_id, keep_quality) — one
    row per cluster. The keeper is picked with max_by over a
    (quality, -doc_id) struct inside ONE hash aggregate keyed on
    cluster_id: no window, no sort, map-side partial combine; at
    100 TB the aggregate state is one struct per cluster per
    partition. The clusters themselves come from the iterative
    min-label propagation in duplicate_clusters.
    """
    clusters = duplicate_clusters(
        docs, pairs=pairs, cache_registry=cache_registry
    )
    j = clusters.join(quality.select("doc_id", "quality"), "doc_id")
    return j.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max_by(
            "doc_id",
            F.struct(
                F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid")
            ),
        ).alias("keep_doc_id"),
        F.max(
            F.struct(
                F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid")
            )
        )["q"].alias("keep_quality"),
    )


def scrub_duplicate_blocks(
    docs: DataFrame,
    block_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr-style duplicate-SPAN scrub (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"),
    approximated at disjoint token-block granularity: the corpus is cut
    into fixed `block_tokens` whitespace-token blocks, and every block
    whose exact text occurs anywhere earlier in corpus order
    (doc_id, block position) is REMOVED from the document — only the
    first occurrence of each distinct block survives. Unlike the
    doc-level dedup ops above, the document itself is kept with the
    duplicated spans cut out, which is what span-level dedup emits
    downstream.

    Output: (doc_id, scrubbed_text, n_blocks_kept, n_blocks_dropped);
    a doc whose every block is a later duplicate keeps its row with
    scrubbed_text = ''. Tokenless docs emit no rows (same contract as
    chunk_documents, which supplies the blocks).

    Scale shape: three keyed shuffles, all AQE-friendly —
      1. groupBy md5(block) with a min(struct(doc_id, chunk_no))
         aggregate (map-side combine; one row per distinct block);
      2. equi-join the first-occurrence table back on the block hash
         (hot boilerplate blocks are classic AQE skew-join territory);
      3. regroup by doc_id, reassembling kept blocks order-preserving
         via array_sort(collect_list(struct(chunk_no, text))) — no
         window, no global sort.
    The block texts themselves travel through shuffles 1-2 only as
    md5 keys plus one exemplar per distinct block; at 100 TB the
    distinct-block table is the dedup state, exactly as in the
    suffix-array formulation but shuffle-native.
    """
    from .sampling import chunk_documents

    blocks = chunk_documents(
        docs, chunk_tokens=block_tokens, overlap=0,
        id_col=id_col, text_col=text_col,
    ).select(
        F.col(id_col).alias("doc_id"),
        "chunk_no",
        "chunk_text",
        F.md5("chunk_text").alias("_h"),
    )
    first = blocks.groupBy("_h").agg(
        F.min(F.struct("doc_id", "chunk_no")).alias("_first")
    )
    flagged = blocks.join(first, "_h").select(
        "doc_id",
        "chunk_no",
        "chunk_text",
        (
            (F.col("_first.doc_id") == F.col("doc_id"))
            & (F.col("_first.chunk_no") == F.col("chunk_no"))
        ).alias("_keep"),
    )
    kept_structs = F.collect_list(
        F.when(F.col("_keep"), F.struct("chunk_no", "chunk_text"))
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(kept_structs), lambda s: s["chunk_text"]
            ),
            " ",
        ).alias("scrubbed_text"),
        F.count_if(F.col("_keep")).cast("int").alias("n_blocks_kept"),
        F.count_if(~F.col("_keep")).cast("int").alias("n_blocks_dropped"),
    )


def minhash_jaccard_estimates(
    docs: DataFrame,
    n_hashes: int = N_MINHASHES,
    bands: int = LSH_BANDS,
    cache_registry: list | None = None,
) -> DataFrame:
    """Sketch-based Jaccard ESTIMATION on the LSH candidate pairs:
    j_est = (#agreeing minhash components)/K — the number a
    production dedup pipeline thresholds on when exact-Jaccard
    verification (ngram_jaccard_pairs' inverted-index join) is too
    expensive to run on every candidate. E[j_est] = true Jaccard by
    the classic minhash property; K=8 here, so estimates are coarse
    (k/8 steps) but engine-exact and deterministic.

    Scale shape: ONE signature table (persisted, swept via
    cache_registry) feeds both the band join that generates
    candidates and the two signature lookups that score them — the
    per-pair cost is comparing 2xK 32-char strings, never touching
    text again. Output: (doc_a, doc_b, j_est).
    """
    r = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes).persist()
    if cache_registry is not None:
        cache_registry.append(sig)
    band_keys = [
        F.concat_ws("", *[F.col(f"h{b * r + k}") for k in range(r)])
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    )
    a = banded.alias("a")
    b_ = banded.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{j}").alias(f"_a{j}") for j in range(n_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{j}").alias(f"_b{j}") for j in range(n_hashes)],
    )
    matches = sum(
        (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("int") for j in range(n_hashes)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / F.lit(float(n_hashes))).alias("j_est"),
        )
    )


def verified_near_dup_pairs(
    docs: DataFrame,
    min_sim: float = 0.5,
    n_hashes: int = N_MINHASHES,
    bands: int = LSH_BANDS,
    cache_registry: list | None = None,
) -> DataFrame:
    """The full candidate→verify near-dup pipeline: MinHash-LSH
    proposes pairs, exact edit distance confirms them.

    edit_sim = 1 - levenshtein(a, b) / max(len(a), len(b)), rounded to
    4 places BEFORE thresholding so the accept set is identical across
    engines. Returns (doc_a, doc_b, edit_distance, edit_sim) for pairs
    with edit_sim >= min_sim.

    Scale shape: levenshtein is O(len_a x len_b) per pair, so it runs
    ONLY on the LSH candidate set (never all pairs) — the standard
    verify-stage economics. Text is re-joined onto the candidates by
    doc_id (two hash joins on unique keys, AQE-safe); `levenshtein` is
    a JVM builtin, so the verify stays codegen with zero Python.
    """
    pairs = minhash_lsh_pairs(
        docs, n_hashes=n_hashes, bands=bands, cache_registry=cache_registry
    )
    # r06 (guide §2.5, same hazard as edit_verified_pairs): AQE
    # coalesces the skinny candidate-pair aggregate by BYTES, which
    # can funnel the entire O(len_a·len_b) verify below into one
    # task; an explicit hash repartition on the pair key spreads it
    # (explicit numPartitions ⇒ AQE leaves it alone).
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pairs = pairs.repartition(n_part, "doc_a", "doc_b")
    txt = docs.select("doc_id", "text")
    j = pairs.join(
        txt.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta")),
        "doc_a",
    ).join(
        txt.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb")),
        "doc_b",
    )
    denom = F.greatest(F.length("_ta"), F.length("_tb"))
    # r06: threshold-bounded levenshtein. Any kept row has
    # round(1 - d/L, 4) >= min_sim, which implies
    # d <= L·(1 - min_sim + 0.00005); the bound below adds a 20×
    # margin (0.001) so float-boundary reasoning can never clip a row
    # the filter would keep — past-threshold rows return -1, which
    # are exactly rows the sim filter rejects, dropped explicitly.
    # The banded O(t·len) algorithm replaces the full O(len²) DP.
    t_expr = (
        F.ceil(denom * F.lit(1.0 - float(min_sim) + 0.001)) + F.lit(1)
    ).cast("int")
    lev = F.expr("levenshtein(_ta, _tb, _t)")
    j = j.withColumn("_t", t_expr)
    sim = F.round(
        F.when(denom == 0, F.lit(1.0)).otherwise(1.0 - lev / denom), 4
    )
    return (
        j.select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_distance"),
            sim.alias("edit_sim"),
        )
        .filter((F.col("edit_distance") >= 0) & (F.col("edit_sim") >= min_sim))
    )


def _banded(sig: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, band_key): one row per LSH band, key = concat of
    the band's r minhashes (one posexplode pass, see
    minhash_lsh_pairs)."""
    r = n_hashes // bands
    band_keys = [
        F.concat_ws("", *[F.col(f"h{b * r + k}") for k in range(r)])
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.posexplode(F.array(*band_keys)).alias("band", "band_key")
    )


def incremental_novelty(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    n_hashes: int = N_MINHASHES,
    bands: int = LSH_BANDS,
    cache_registry: list | None = None,
) -> DataFrame:
    """Dedup an incoming batch against an EXISTING corpus — the shape
    every continuously-crawled corpus actually runs (daily increment
    vs. the accumulated store), as an A×B LSH join instead of the
    self-join of :func:`minhash_lsh_pairs`.

    Returns one row per new doc: (doc_id, n_dup_candidates,
    first_match — the lowest corpus doc_id sharing ≥1 LSH band, NULL
    if none — and novel = no collision).

    Scale shape: the corpus side is the PERSISTED signature table in
    production (computed once per increment cycle, not per query);
    both sides band-explode and meet in one equi-join on
    (band, band_key), then one groupBy(doc_id) with map-side combine.
    The corpus text is never read — only its 8×32B signatures — so a
    10^10-doc store joins at signature width, and band-key skew (a
    boilerplate band shared by millions) is AQE's skew-join case, not
    a driver problem."""
    new_b = _banded(minhash_signatures(new_docs, n_hashes), n_hashes, bands)
    corp_b = _banded(
        minhash_signatures(corpus_docs, n_hashes), n_hashes, bands
    ).select(
        F.col("doc_id").alias("corpus_doc_id"), "band", "band_key"
    )
    hits = (
        new_b.join(corp_b, ["band", "band_key"], "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("corpus_doc_id").alias("n_dup_candidates"),
            F.min("corpus_doc_id").alias("first_match"),
        )
    )
    return hits.select(
        "doc_id",
        "n_dup_candidates",
        "first_match",
        (F.col("n_dup_candidates") == 0).alias("novel"),
    )


def dup_spans(docs: DataFrame, k: int = 5, min_count: int = 2) -> DataFrame:
    """Exact substring deduplication spans (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the MAXIMAL token spans covered by word `k`-grams that
    occur >= `min_count` times corpus-wide (self-repetition counts,
    as in the paper's suffix-array formulation). These are the spans
    an exact-substring dedup pass would cut out of the training text.

    The reference engine has no analogue (its dedup is whole-URL,
    CrawlerListener.java:300-320); this is the training-data-curation
    extension family, over the `documents` table.

    Returns (doc_id, span_start, span_end, span_len) — token indices,
    0-based inclusive; one row per maximal span.

    Scale shape — the suffix array is replaced by three key-partitioned
    shuffles, never a pairwise join: (1) per-doc k-gram+position arrays
    built with codegen sequence+slice (no self-join, explode factor
    ~1x tokens), (2) ONE count shuffle on the gram string with map-side
    partial agg to find duplicated grams, (3) a left-semi join of
    occurrences to that (much smaller) dup-gram set on the same key —
    AQE reuses the gram partitioning — then (4) one doc_id-partitioned
    window pass to merge overlapping/adjacent windows into maximal
    spans (gaps-and-islands: shingle starts are sorted, so the
    previous running max end is just lag(pos)+k-1; a gap opens a new
    island). Window state is per-document — bounded by doc length,
    never a global sort."""
    k = int(k)
    grams = F.expr(
        "case when size(_w) >= {k} then transform("
        "  sequence(0, size(_w) - {k}),"
        "  i -> struct(i as pos, array_join(slice(_w, i + 1, {k}), ' ')"
        "       as g))"
        " else array() end".format(k=k)
    )
    occ = (
        docs.withColumn("_w", F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .select("doc_id", F.explode(grams).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    )
    dup = (
        occ.groupBy("g")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= int(min_count))
        .select("g")
    )
    hits = occ.join(dup, "g", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    brk = F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0)
    islands = hits.withColumn("_brk", brk).withColumn(
        "_island",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def cut_dup_spans(docs: DataFrame, k: int = 5, min_count: int = 2) -> DataFrame:
    """Completes the Lee et al. 2022 exact-substring pipeline: CUT the
    :func:`dup_spans` spans out of each document, keeping the rest
    (the paper's remedy — remove the duplicated substring, not the
    whole document).

    Returns one row per input doc: (doc_id, n_tokens, tokens_removed,
    clean_md5) — md5 of the space-joined surviving tokens ('' when
    everything was duplicated or the doc had no word tokens), so the
    result stays narrow no matter how large the text.

    Scale shape: dup_spans' shuffles plus ONE doc_id groupBy packing
    each doc's few spans into an array, a left join back onto the doc
    scan, and a per-row codegen `filter(transform(...))` that drops
    covered token positions — the text is never exploded to
    (doc, pos) rows for the cut itself. exists() over the span array
    is O(tokens x spans/doc) with spans/doc small by construction
    (maximal, disjoint)."""
    spans = dup_spans(docs, k=k, min_count=min_count)
    agg = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.sum("span_len").alias("_removed"),
    )
    d = docs.withColumn(
        "_w", F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    ).join(agg, "doc_id", "left")
    kept = F.expr(
        "filter(transform(_w, (t, i) -> struct(t as t, i as i)),"
        " x -> _spans is null or not exists(_spans,"
        "   sp -> x.i >= sp.span_start and x.i <= sp.span_end))"
    )
    clean = F.array_join(F.expr("transform(_kept, x -> x.t)"), " ")
    return (
        d.withColumn("_kept", kept)
        .select(
            "doc_id",
            F.size("_w").cast("long").alias("n_tokens"),
            F.coalesce(F.col("_removed"), F.lit(0)).cast("long").alias(
                "tokens_removed"
            ),
            F.md5(clean).alias("clean_md5"),
        )
    )


def mirror_pairs(
    docs: DataFrame,
    host_col: str = "host",
    gram: int = 8,
    max_gram_hosts: int = 5,
    min_shared: int = 5,
    cache_registry: list | None = None,
) -> DataFrame:
    """Mirror-host detection: host pairs serving substantially the
    same content, via shared LONG word shingles. Mirrors (and scraped
    copies) are the crawl-side dedup problem the per-document
    operators above can't see — the duplication is between SITES, and
    the frontier should stop crawling the copy, not dedup it one page
    at a time afterwards.

    Long grams (default 8 words) are the discriminator: short
    shingles are shared by every host speaking the language, 8-grams
    only by copied text. The df-cap (`max_gram_hosts`) drops grams
    present on more hosts than that — boilerplate/licence blocks —
    which is ALSO the candidate-pair bound: a gram on ≤K hosts
    contributes ≤K² pair rows, so the self-join is linear in the gram
    table, never quadratic in hosts (the same economics as the
    ngram-Jaccard inverted index above).

    Output: (host_a, host_b, shared, n_a, n_b, containment_bp) where
    containment_bp = 10000·shared DIV min(n_a, n_b) — integer basis
    points of the smaller host's (capped) gram set found on the other.

    Scale shape: one distinct-(host, gram) aggregate; the cap is a
    gram-keyed count + semi-join; the pair self-join shuffles on the
    gram key (AQE skew-join covers residual hot grams ≤ cap); sizes
    join back on the host dim (broadcast-scale)."""
    hg = (
        with_words(docs)
        .select(
            F.col(host_col).alias("host"),
            F.explode(F.array_distinct(shingles_expr(gram))).alias(
                "shingle"
            ),
        )
        .distinct()
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(hg)
    rare = (
        hg.groupBy("shingle")
        .agg(F.count("*").alias("_nh"))
        .filter(F.col("_nh") <= int(max_gram_hosts))
        .select("shingle")
    )
    hgr = hg.join(rare, "shingle", "left_semi").persist()
    if cache_registry is not None:
        cache_registry.append(hgr)
    sizes = hgr.groupBy("host").agg(F.count("*").alias("n_grams"))
    a = hgr.alias("a")
    b = hgr.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.host") < F.col("b.host"),
            ],
        )
        .groupBy(
            F.col("a.host").alias("host_a"),
            F.col("b.host").alias("host_b"),
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= int(min_shared))
    )
    sa = sizes.select(
        F.col("host").alias("host_a"), F.col("n_grams").alias("n_a")
    )
    sb = sizes.select(
        F.col("host").alias("host_b"), F.col("n_grams").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            F.expr("(10000 * shared) DIV least(n_a, n_b)").alias(
                "containment_bp"
            ),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = SHINGLE_N,
    threshold: float = 0.8,
    df_cap: int = JACCARD_DF_CAP,
    cache_registry: list | None = None,
) -> DataFrame:
    """Asymmetric near-duplication: shingle CONTAINMENT of the smaller
    document in the larger, over candidate pairs sharing ≥1 rare
    shingle. Jaccard misses the quote/subset case entirely — a page
    fully embedded in a larger page scores |A|/|B| on Jaccard (low
    when B is much bigger) but 1.0 on containment |A∩B|/|A| — and
    subset inclusion (syndicated articles inside portals, quoted
    posts, scraped-with-chrome copies) is its own dedup policy
    decision, distinct from the symmetric near-dup operators
    (minhash/simhash/jaccard) and from mirror_pairs' host-level
    containment.

    Output: (inner_doc, outer_doc, containment) with containment =
    |A∩B| / |inner's shingle set| rounded to 4dp, ≥ threshold; the
    smaller set (ties: smaller doc_id) is `inner`. The intersection
    is counted over the rare-shingle candidate join (same df_cap
    bound as ngram_jaccard_pairs — a lower bound on full containment,
    exact on corpora where shared shingles are rare ones).

    Scale shape: identical candidate geometry to ngram_jaccard_pairs —
    one persisted shingle projection, df-capped inverted-index
    self-join (the bound that keeps hot shingles from exploding),
    (pair) hash aggregate, two broadcast-size joins for set sizes. No
    windows, no UDFs.
    """
    sh = doc_shingles(docs, n).persist()
    if cache_registry is not None:
        cache_registry.append(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    sh_rare = sh.join(rare, "shingle")
    a = sh_rare.alias("a")
    b = sh_rare.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    scored = inter.join(sa, "doc_a").join(sb, "doc_b")
    inner_is_a = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("doc_a") < F.col("doc_b"))
    )
    return (
        scored.select(
            F.when(inner_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "inner_doc"
            ),
            F.when(inner_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "outer_doc"
            ),
            F.round(
                F.col("n_inter")
                / F.when(inner_is_a, F.col("n_a")).otherwise(F.col("n_b")),
                4,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def mirror_families(
    docs: DataFrame,
    host_col: str = "host",
    pairs: DataFrame | None = None,
    min_containment_bp: int = 0,
    max_iters: int = 20,
    cache_registry: list | None = None,
) -> DataFrame:
    """Mirror-SITE families: transitive closure over `mirror_pairs` —
    the host-level analogue of `duplicate_clusters`. A mirror ring
    (origin → mirror-a → mirror-b) rarely shares rare shingles
    pairwise-completely, so pair output alone under-groups; the
    frontier wants ONE family per mirrored site with one elected
    canonical host to keep crawling.

    Output: (host, family_id) for EVERY host in `docs`, family_id =
    lexicographic min host of its component (singletons are their own
    family); keep-rule = `host == family_id` — stop scheduling the
    rest.

    Reuses `duplicate_clusters`' iterative min-label propagation
    verbatim (min/least are string-total-ordered, so the same kernel
    clusters host labels): one equi-join + one min-agg shuffle per
    round over a HOST-cardinality edge list — thousands of rows where
    the URL graph has billions, so every round is broadcast-scale."""
    hosts = docs.select(F.col(host_col).alias("host")).distinct()
    if pairs is None:
        pairs = mirror_pairs(
            docs, host_col=host_col, cache_registry=cache_registry
        )
    if min_containment_bp > 0:
        pairs = pairs.filter(
            F.col("containment_bp") >= int(min_containment_bp)
        )
    out = duplicate_clusters(
        hosts.select(F.col("host").alias("doc_id")),
        pairs=pairs.select(
            F.col("host_a").alias("doc_a"), F.col("host_b").alias("doc_b")
        ),
        max_iters=max_iters,
        cache_registry=cache_registry,
    )
    return out.select(
        F.col("doc_id").alias("host"), F.col("cluster_id").alias("family_id")
    )


def prefix_filter_pairs(
    docs: DataFrame,
    threshold_bp: int = 7000,
    n: int = SHINGLE_N,
    text_col: str = "text",
) -> DataFrame:
    """Set-similarity self-join at Jaccard ≥ threshold via PREFIX
    FILTERING (AllPairs/PPJoin, Bayardo et al. 2007 / Xiao et al.
    2008) — the df-cap-free candidate bound: order each document's
    shingle set by ASCENDING global document frequency (rarest
    first; ties by shingle text) and index only the first

        prefix_len = s − ⌈t·s⌉ + 1

    shingles. Any pair with Jaccard ≥ t must share at least one
    prefix shingle (if the two prefixes were disjoint, the overlap
    is at most min(s_a, s_b) − prefix overlap deficit < t·union —
    the classic pigeonhole), so the banded equi-join on prefix
    shingles is EXACT in recall; candidates are then verified with
    the true intersection. Unlike `ngram_jaccard_pairs`'s df-cap,
    no true pair can be lost to a hot shingle: hot shingles simply
    sort to the END of every document's order and rarely enter a
    prefix.

    Output: (doc_a, doc_b, inter, size_a, size_b, jaccard_bp ≥
    threshold_bp) with doc_a < doc_b; all integers (bp = DIV), so
    the DuckDB twin is bit-exact.

    Scale shape: one df aggregate (map-side combining), one per-doc
    sort_array over its own shingle struct list (bounded by doc
    length — no window, no global rank), a prefix explode whose
    volume is Σ prefix_len ≈ (1−t)·corpus shingles, ONE self-equi-
    join on the prefix shingle (the frequency-ascending order makes
    those join keys the RAREST shingles — small groups by
    construction), PPJoin's POSITIONAL filter pruning candidates whose
    first-shared-token positions already cap the overlap below
    ⌈t·max(s_a,s_b)⌉ (narrow integer agg, before any array moves),
    and a verify on the survivors only via array_intersect of the two
    bounded token arrays. At 10^10 docs the verify join's right side
    re-broadcasts nothing: both sides shuffle once on doc_id."""
    sh = doc_shingles(docs, n)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "shingle"))
            ).alias("_toks")
        )
        .select(
            "doc_id",
            F.col("_toks.shingle").alias("toks"),
            # long arithmetic throughout: 10000·inter and t·s wrap a
            # 32-bit int around ~215k/306k shingles — real web pages
            F.size("_toks").cast("long").alias("s"),
        )
    )
    t = int(threshold_bp)
    prefix_len = (
        F.col("s")
        - F.expr(f"({t}L * s + 9999) DIV 10000")
        + F.lit(1)
    ).cast("int")
    # the prefix explode carries ONLY (doc_id, shingle, pos, s): the
    # candidate equi-join shuffles narrow rows; the full token arrays
    # join back on doc_id AFTER the pair set is pruned (otherwise
    # each of the ~(1−t)·s prefix rows would ship the whole s-element
    # array)
    prefix = per_doc.select(
        "doc_id",
        "s",
        F.posexplode(F.slice("toks", F.lit(1), prefix_len)).alias(
            "pos0", "shingle"
        ),
    ).select(
        "doc_id", "s", "shingle",
        (F.col("pos0") + 1).cast("long").alias("pos"),  # 1-based
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin POSITIONAL filter (Xiao et al. 2008): the global order is
    # consistent across documents, so the globally-FIRST shared token
    # of a pair sits at min(pos) in BOTH lists, and every shared
    # token lies at-or-after it — overlap ≤ 1 + min(s_a−i, s_b−j).
    # A true pair needs overlap ≥ ⌈t·max(s_a,s_b)⌉ (inter ≥ t·union ≥
    # t·max), so pairs whose positional bound falls short are pruned
    # BEFORE the array-verify join — provably no true pair is lost
    # (exact recall pinned by the randomized brute-force test).
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.s").alias("_sa"),
            F.col("b.s").alias("_sb"),
        )
        .agg(F.min("a.pos").alias("_i"), F.min("b.pos").alias("_j"))
        .filter(
            F.lit(1) + F.least(F.col("_sa") - F.col("_i"),
                               F.col("_sb") - F.col("_j"))
            >= F.expr(
                f"({t}L * greatest(_sa, _sb) + 9999) DIV 10000"
            )
        )
        .select("doc_a", "doc_b")
    )
    ta = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("s").alias("size_a"),
    )
    tb = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("s").alias("size_b"),
    )
    cand = pairs.join(ta, "doc_a").join(tb, "doc_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    jac = F.expr(
        "10000 * _inter DIV (size_a + size_b - _inter)"
    )
    return (
        cand.withColumn("_inter", inter)
        .select(
            "doc_a",
            "doc_b",
            F.col("_inter").alias("inter"),
            F.col("size_a").alias("size_a"),
            F.col("size_b").alias("size_b"),
            jac.cast("long").alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= t)
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC): storage-layer dedup below the
# document. Exact dedup needs identical documents; near-dup finds
# *similar* ones but keeps both copies' bytes. CDC splits each text at
# content-derived boundaries (a rolling-hash condition), so two
# payloads sharing a long run — the same article re-crawled with a new
# footer, a page with one edited paragraph — share most chunk hashes
# verbatim and the store keeps each chunk once. The boundary positions
# move WITH the content (unlike fixed-size blocks, an insertion only
# reshuffles the chunks it touches), which is the whole point of CDC
# (Muthitacharoen et al., LBFS SOSP'01).
# ---------------------------------------------------------------------------

CDC_WINDOW = 4  # code points in the boundary hash
CDC_MASK = 64  # boundary when hash % CDC_MASK == 0 -> ~64-char chunks
# polynomial rolling-hash coefficients: base 31, window 4
_CDC_COEF = (29791, 961, 31, 1)  # 31^3, 31^2, 31, 1


def cdc_chunks(docs: DataFrame, mask: int = CDC_MASK) -> DataFrame:
    """Per-document content-defined chunk table.

    Boundary rule (deterministic, closed-form — the DuckDB oracle
    restates it): with v = the text's code points (1-based), a chunk
    ends after position i (i >= 4) whenever
    ``(v[i-3]*31^3 + v[i-2]*31^2 + v[i-1]*31 + v[i]) % mask == 0``;
    the final chunk always ends at the text end. A pointwise 4-gram
    polynomial stands in for a gear hash: same chunking behavior
    (boundaries ride with content, expected chunk length ~mask), but
    every position's test depends only on its own 4-gram, so BOTH
    engines compute it exactly. No min/max chunk clamp — a clamp makes
    the split stateful (each boundary depends on the previous one) and
    breaks the closed form; mask sizing bounds expected length.

    Output: (doc_id, chunk_no, chunk_md5, chunk_len) — one row per
    chunk, chunk_no 0-based in text order, md5 over the chunk's utf-8.
    Zero-length texts emit no rows.

    Scale shape: chunking is a stateless per-row Arrow kernel
    (mapInPandas — numpy does the rolling hash, the only per-chunk
    Python is the md5 of each ~64-char slice); output rows are narrow
    (32-hex + 2 ints), the text itself never shuffles. Downstream
    dedup is a plain chunk_md5 aggregate — uniform key, no salting.
    """
    # propagate the input's doc_id type (long on the driver tables,
    # string in the general corpus case) — hardcoding long would fail
    # Arrow conversion on string-id corpora
    doc_id_type = docs.schema["doc_id"].dataType.simpleString()
    out_schema = (
        f"doc_id {doc_id_type}, chunk_no int, chunk_md5 string, "
        "chunk_len int"
    )

    def batches(it):
        import hashlib

        import numpy as np
        import pandas as pd

        c3, c2, c1, c0 = _CDC_COEF
        for pdf in it:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                text = text or ""
                n = len(text)
                if n == 0:
                    continue
                v = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if n >= CDC_WINDOW:
                    h = c3 * v[:-3] + c2 * v[1:-2] + c1 * v[2:-1] + c0 * v[3:]
                    # h[j] hashes the 4-gram ENDING at 0-based index
                    # j+3; boundary AFTER 1-based position j+4
                    ends = (np.flatnonzero(h % mask == 0) + 4).tolist()
                else:
                    ends = []
                if not ends or ends[-1] != n:
                    ends.append(n)
                start = 0
                for chunk_no, e in enumerate(ends):
                    piece = text[start:e]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "chunk_no": chunk_no,
                            "chunk_md5": hashlib.md5(
                                piece.encode("utf-8")
                            ).hexdigest(),
                            "chunk_len": e - start,
                        }
                    )
                    start = e
            if out:
                yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(batches, out_schema)


def cdc_savings(chunks: DataFrame) -> DataFrame:
    """Storage-dedup estimate over a cdc_chunks table: how many chars
    the chunk store keeps vs what the raw corpus holds. One map-side-
    combining aggregate on chunk_md5 (uniform key), then a one-row
    fold; dup_char_ppm is integer parts-per-million so the number is
    engine-exact.

    Output (single row): total_chunks, unique_chunks, total_chars,
    unique_chars, dup_char_ppm.
    """
    per = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.first("chunk_len").alias("chunk_len"),
    )
    return per.agg(
        F.sum("n_refs").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("unique_chunks"),
        F.sum(F.col("n_refs") * F.col("chunk_len")).cast("long").alias(
            "total_chars"
        ),
        F.sum("chunk_len").cast("long").alias("unique_chars"),
    ).select(
        "total_chunks",
        "unique_chunks",
        "total_chars",
        "unique_chars",
        # integer div end-to-end: a double divide + cast would truncate
        # in Spark but round in DuckDB
        F.expr(
            "((total_chars - unique_chars) * 1000000L) div total_chars"
        ).alias("dup_char_ppm"),
    )


def edit_verified_pairs(
    docs: DataFrame,
    max_ratio_bp: int = 2000,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    band_df_cap: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs verified by EXACT edit distance — the
    highest-precision verify stage in the dedup family. Banded simhash
    proposes candidates (never all-pairs); each candidate is then
    scored with JVM `levenshtein` and kept when the distance is within
    `max_ratio_bp` basis points of the longer text (integer math, so
    the threshold is engine-exact).

    Edit distance is O(len_a * len_b) per pair — it can never run on
    all pairs at corpus scale; this operator IS the production
    geometry: cheap banding bounds the candidate set, the quadratic
    scorer touches only survivors, and text joins back by doc_id AFTER
    pruning (two narrow hash joins; the full text column never fans
    out through the band explode).

    Output: (doc_a, doc_b, hamming, edit_distance, ratio_bp) with
    doc_a < doc_b, ratio_bp = distance * 10000 div max(len) (0 for
    two empty texts).
    """
    cands = simhash_near_pairs(
        docs, bits=bits, max_hamming=max_hamming, band_df_cap=band_df_cap
    )
    # r06 (guide §2.5): AQE coalesces the candidate-pair aggregate by
    # BYTES — a few thousand 24-byte pair rows collapse to ONE
    # post-shuffle partition, and the O(len_a·len_b) levenshtein
    # stage below then runs single-task (measured: 16+ min on one
    # core at sf0.1 while 31 cores idled). AQE cannot see per-row
    # compute cost; an explicit hash repartition on the pair key
    # spreads the quadratic verify across the configured parallelism
    # (explicit numPartitions ⇒ AQE leaves it alone). The exchanged
    # rows are the SKINNY pair ids — the text joins back after.
    n_part = int(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    cands = cands.repartition(n_part, "doc_a", "doc_b")
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    # r06: threshold-bounded levenshtein — any distance ABOVE the
    # keep cut is rejected by the filter below, so the DP only needs
    # to decide "≤ t or not" with t = the largest distance that can
    # still pass: ratio_bp = d*10000 div len ≤ max_ratio_bp
    # ⟺ d*10000 < (max_ratio_bp+1)*len ⟺ d ≤ ((max_ratio_bp+1)*len
    # - 1) div 10000. Spark's 3-arg levenshtein runs the banded
    # O(t·len) algorithm and returns -1 past the threshold — a
    # 1/ratio-fold cheaper verify with bit-identical kept rows (the
    # -1 rows are exactly the rows the ratio filter dropped; they are
    # filtered explicitly on edit_distance >= 0).
    scored = (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            F.expr(
                "CAST(levenshtein(_ta, _tb, CAST(("
                f"({int(max_ratio_bp)} + 1) * CAST(greatest(length(_ta),"
                " length(_tb)) AS BIGINT) - 1) div 10000 AS INT)) AS INT)"
            ).alias("edit_distance"),
            F.greatest(F.length("_ta"), F.length("_tb"))
            .cast("long")
            .alias("_len"),
        )
    )
    # distance * 10000 as BIGINT: a 32-bit product overflows at
    # ~215k-char texts (ANSI mode aborts the job; non-ANSI wraps
    # negative and falsely verifies dissimilar pairs)
    ratio = F.when(
        F.col("_len") > 0,
        F.expr("CAST(CAST(edit_distance AS BIGINT) * 10000 div _len AS INT)"),
    ).otherwise(F.lit(0))
    return (
        scored.select(
            "doc_a", "doc_b", "hamming", "edit_distance",
            ratio.alias("ratio_bp"),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("ratio_bp") <= max_ratio_bp)
        )
    )


def cdc_change_rate(
    old_chunks: DataFrame, new_chunks: DataFrame
) -> DataFrame:
    """Per-document change fraction between two crawls of the same
    corpus, measured on CDC chunks — the content-change signal an
    adaptive recrawl scheduler consumes (a doc whose chunks barely
    moved gets a longer revisit interval; boilerplate-only churn
    scores near 0 because CDC boundaries ride with the content).

    shared_chars = Σ over chunk_md5 of min(old_len, new_len) per doc
    (multiplicity-aware: a chunk repeated 3× old / 2× new shares 2×);
    changed_bp = 10000 − 10000·shared div max(old_chars, new_chars) —
    integer basis points, engine-exact. Docs empty in BOTH versions
    emit nothing (no chunks on either side).

    Scale shape: two per-(doc, md5) map-side-combining aggs, ONE
    full-outer equi-join on (doc_id, chunk_md5) — narrow 32-hex keys,
    text never moves — then one per-doc agg.
    """

    def per(df, side):
        return df.groupBy("doc_id", "chunk_md5").agg(
            F.sum("chunk_len").cast("long").alias(side)
        )

    o = per(old_chunks, "_o")
    n = per(new_chunks, "_n")
    j = o.join(n, ["doc_id", "chunk_md5"], "full_outer").select(
        "doc_id",
        F.coalesce("_o", F.lit(0)).alias("_o"),
        F.coalesce("_n", F.lit(0)).alias("_n"),
    )
    agg = j.groupBy("doc_id").agg(
        F.sum("_o").alias("old_chars"),
        F.sum("_n").alias("new_chars"),
        F.sum(F.least("_o", "_n")).alias("shared_chars"),
    )
    return agg.select(
        "doc_id",
        "old_chars",
        "new_chars",
        "shared_chars",
        F.expr(
            "CAST(10000 - (10000 * shared_chars)"
            " div greatest(old_chars, new_chars) AS INT)"
        ).alias("changed_bp"),
    )
