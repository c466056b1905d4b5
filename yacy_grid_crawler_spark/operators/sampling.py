"""Corpus sampling, split assignment, and shard packing — the
bookkeeping operators of a training-data pipeline.

All determinism comes from md5 over the doc id (dialect-shared with
DuckDB), never from RNG state: the same doc lands in the same split
on every run, on every engine, at every scale factor — the property
a reproducible data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-hex prefix thresholds: first two hex chars uniform over 0..255
TRAIN_LT = "cc"  # 204/256 ≈ 79.7%
VAL_LT = "e6"    # (230-204)/256 ≈ 10.2%; rest ≈ 10.2% test


def dataset_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, bucket, split) — deterministic hash split into
    train/val/test by the first md5-hex byte of the id. Pure codegen,
    no shuffle, no RNG; proportions ~80/10/10."""
    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return docs.select(
        id_col,
        b.alias("bucket"),
        F.when(b < TRAIN_LT, "train")
        .when(b < VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


def sample_hash(
    docs: DataFrame, rate_256: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic `rate_256`/256 sample: keep ids whose first
    md5-hex byte is below the threshold. The hash-threshold form (not
    `DataFrame.sample`) is what pipelines need: stable across runs,
    engines, and partitionings, and composable (a 2x upsample is a
    threshold change, not a reshuffle)."""
    thr = format(rate_256, "02x")
    return docs.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2) < thr
    )


def pack_shards(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Token-budget shard packing: walk documents in `order_col` order
    and assign shard_id = floor(exclusive-prefix-sum(tokens)/budget) —
    each training shard holds ~`budget` tokens, documents never split.

    `distributed=True` computes the global prefix sum with the same
    two-phase machinery as the batching rank (operators/batching.py):
    range-partition on the order key, per-partition token totals (a
    tiny aggregate — one row per partition), running-sum those into
    partition offsets, then offset + local cumulative sum. No
    single-partition window anywhere; `distributed=False` is the
    window formulation for small inputs (identical output, pinned by
    tests)."""
    pref = _token_prefix_sum(
        docs, token_col, order_col, distributed, cache_registry
    )
    return pref.select(
        order_col,
        F.col(token_col),
        F.floor(F.col("_start") / budget).cast("long").alias("shard_id"),
    )


def _token_prefix_sum(
    docs: DataFrame,
    token_col: str,
    order_col: str,
    distributed: bool,
    cache_registry: list | None,
) -> DataFrame:
    """`docs` + `_start`: the exclusive global prefix sum of
    `token_col` in `order_col` order — i.e. each document's first
    token's position in the virtual concatenation of the whole corpus.

    Two-phase distributed form (default): range-partition on the
    order key → per-partition totals (one row per partition, tiny) →
    running-sum into partition offsets → broadcast-join offsets back
    and add the partition-local cumulative sum. The only windows are
    over the P-row offsets table and within partitions — no
    single-partition global window at any scale."""
    if not distributed:
        w = (
            Window.orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return docs.withColumn(
            "_start", F.coalesce(F.sum(token_col).over(w), F.lit(0))
        )
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = docs.repartitionByRange(n_part, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    if cache_registry is not None:
        cache_registry.append(ranged)
    cum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        ranged.groupBy("_pid")
        .agg(F.sum(token_col).alias("_n"))
        .withColumn("_offset", F.coalesce(F.sum("_n").over(cum), F.lit(0)))
        .drop("_n")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_excl = F.coalesce(F.sum(token_col).over(w_local), F.lit(0))
    return (
        ranged.join(F.broadcast(off), "_pid")
        .withColumn("_start", F.col("_offset") + local_excl)
        .drop("_pid", "_offset")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the layout LLM pretraining
    actually trains on: concatenate every document in `order_col`
    order into one virtual token stream and cut it into fixed
    `seq_len` windows. Documents SPLIT across sequence boundaries
    (unlike :func:`pack_shards`, which keeps documents whole), so
    every sequence except the last is exactly full — zero padding.

    Returns one row per (document × sequence it overlaps):
    (seq_id, doc_id-or-order col, doc_tok_start, seq_tok_start,
    n_toks) — enough to materialize each sequence's token slices and
    its document-boundary/attention-mask spans.

    Plan shape: the global offset is the two-phase prefix sum
    (`_token_prefix_sum`, no global window), then one codegen
    `explode(sequence(first_seq, last_seq))` per doc — explode factor
    is ~tokens/seq_len amortized, each output row O(1) ints. At
    100 TB this is one range shuffle + a map-only explode; downstream
    sequence assembly groups on seq_id, whose cardinality
    total_tokens/seq_len is uniform by construction (no skew)."""
    pref = _token_prefix_sum(
        docs.filter(F.col(token_col) > 0),
        token_col,
        order_col,
        distributed,
        cache_registry,
    )
    start = F.col("_start")
    end = start + F.col(token_col)
    first_seq = F.floor(start / seq_len)
    last_seq = F.floor((end - 1) / seq_len)
    exploded = pref.select(
        order_col,
        F.col(token_col),
        start.alias("_s"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seg_start = F.greatest(F.col("_s"), F.col("seq_id") * seq_len)
    seg_end = F.least(
        F.col("_s") + F.col(token_col), (F.col("seq_id") + 1) * seq_len
    )
    return exploded.select(
        "seq_id",
        order_col,
        (seg_start - F.col("_s")).cast("long").alias("doc_tok_start"),
        (seg_start - F.col("seq_id") * seq_len)
        .cast("long")
        .alias("seq_tok_start"),
        (seg_end - seg_start).cast("long").alias("n_toks"),
    )


def stratified_sample(
    docs: DataFrame,
    rates_256: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate_256: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing
    primitive (downsample the over-represented source, keep all of
    the rare one). `rates_256` maps stratum value -> keep-threshold
    out of 256 (md5-hex first-byte, same convention as sample_hash);
    strata not listed keep `default_rate_256`/256; 256 means keep
    everything (encoded as a sentinel above the hex range, since
    format(256) would be the 3-char string '100' that misorders
    against 2-char hex buckets).

    Pure codegen: the per-stratum threshold is a CASE chain folded
    into the filter, so the whole op is a narrow map the parquet scan
    absorbs — no shuffle, no RNG, no sampleBy (whose Bernoulli draw
    is partitioning-dependent and irreproducible across engines).
    Output: input rows + (bucket, keep) for auditability; callers
    filter on `keep`."""
    def _thr(rate: int) -> str:
        return "zz" if rate >= 256 else format(rate, "02x")

    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    thr = F.lit(_thr(default_rate_256))
    for stratum, rate in sorted(rates_256.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(_thr(rate))
        ).otherwise(thr)
    return docs.withColumn("bucket", b).withColumn("keep", b < thr)


def host_cap_sample(
    docs: DataFrame,
    cap: int,
    host_col: str = "host",
    id_col: str = "doc_id",
    distributed: bool = False,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact per-host cap — keep at most `cap` rows per host, chosen
    deterministically by md5-of-id order (a seedless uniform draw both
    engines reproduce bit-for-bit). This is the domain-balancing
    primitive stratified_sample cannot express: rates give an
    EXPECTED count per stratum; a crawl/corpus budget needs a HARD
    one (at most K pages per host in the frontier, at most K docs per
    domain in the training mix).

    Output: the kept rows as (id, host, host_rank), host_rank < cap.

    Scale shape: per-host rank. `distributed=True` routes through the
    same two-phase range-partitioned rank as batching/politeness
    (`operators.batching.global_positions`) so a Zipf head host never
    becomes a one-task window straggler; the default window form is
    for small inputs and oracle comparison (equality of the two is
    pinned by test_textops).
    """
    from pyspark.sql import Window

    from .batching import global_positions

    keyed = docs.select(
        F.col(id_col),
        F.col(host_col),
        F.md5(F.col(id_col).cast("string")).alias("_r"),
    )
    if distributed:
        ranked = global_positions(
            keyed,
            group_cols=(host_col,),
            order_cols=("_r", id_col),
            out="host_rank",
            cache_registry=cache_registry,
            broadcast_offsets=False,  # host-cardinality offsets: AQE decides
        )
    else:
        w = Window.partitionBy(host_col).orderBy(F.col("_r"), F.col(id_col))
        ranked = keyed.withColumn("host_rank", F.row_number().over(w) - 1)
    return (
        ranked.filter(F.col("host_rank") < cap)
        .select(id_col, host_col, F.col("host_rank").cast("int").alias("host_rank"))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking — the standard pretraining
    shaping step: each document becomes ceil(n/step) fixed-size token
    windows with `overlap` tokens of context carried between
    consecutive chunks. Output: (doc_id, chunk_no, chunk_text,
    n_tokens), chunk_no 0-based in document order.

    Whitespace tokens (the same `[^ ]+` extraction dialect as
    token_counts — shared verbatim with the DuckDB oracle); window
    starts are 0, step, 2*step, ... for every start < n_tokens, so the
    final partial window is kept (training pipelines pad or pack it —
    see pack_shards). Documents with no tokens emit no rows.

    Scale shape: pure whole-stage-codegen — split once per doc,
    posexplode only the start-offset array (ceil(n/step) ints per doc,
    NOT per-token rows), then slice+array_join per chunk. No shuffle
    at all: chunking is embarrassingly parallel per document, and the
    explode factor is bounded by n/step (~8 rows per 1k-token doc at
    the defaults), so a 100 TB corpus chunks in one map stage glued to
    whatever scan precedes it.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.expr(f"regexp_extract_all({text_col}, '[^ ]+', 0)")
    with_toks = docs.select(id_col, toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    starts = F.sequence(
        F.lit(0), F.size("_toks") - 1, F.lit(step)
    )
    return (
        with_toks.select(
            id_col,
            "_toks",
            F.posexplode(starts).alias("chunk_no", "_start"),
        )
        .select(
            id_col,
            "chunk_no",
            F.array_join(
                F.slice("_toks", F.col("_start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size("_toks") - F.col("_start")
            ).cast("int").alias("n_tokens"),
        )
    )


def temperature_resample(
    docs: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual /
    multi-source data-mixing primitive (sample source s proportional
    to n_s^alpha, alpha<1 flattening the size distribution): keep
    rate r_s = (n_min / n_s)^(1-alpha), so the smallest source is
    kept whole and larger sources are downsampled toward the
    temperature-flattened mix. Deterministic: a doc is kept iff its
    16-bit md5 prefix is below floor(r_s * 65536) — same doc, same
    verdict, every run and every engine, like every sampler here.

    Scale shape: the per-source keep-rate dim is ONE tiny aggregate
    (one row per source) crossed with its own min — broadcast-joined
    back onto the corpus scan, then a pure codegen hash filter. The
    big side never shuffles.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    mn = counts.agg(F.min("_n").alias("_n_min"))
    dims = counts.crossJoin(F.broadcast(mn)).select(
        stratum_col,
        F.floor(
            F.pow(F.col("_n_min") / F.col("_n"), F.lit(1.0 - alpha))
            * F.lit(65536)
        )
        .cast("long")
        .alias("_thr"),
    )
    u16 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(dims), stratum_col)
        .filter(u16 < F.col("_thr"))
        .select(id_col, stratum_col)
    )


def corpus_shuffle(
    docs: DataFrame,
    seed: str = "epoch0",
    id_col: str = "doc_id",
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: every document
    gets a dense 0-based `shuffle_pos` in the order of
    md5(seed || id) — reshuffling between epochs is just a new seed,
    and the permutation is reproducible on any cluster size (the
    order key is pure data, never partition layout).

    The dense rank rides the same two-phase prefix-sum machinery as
    `pack_shards` with a count of 1 per row: range-partition on the
    md5 key (uniform by construction — no skew, no salt needed),
    per-partition counts (one tiny row each), running-sum offsets,
    offset + local rank. No single-partition window at any scale;
    `distributed=False` is the window formulation for small inputs
    (identical output, pinned by tests)."""
    keyed = docs.withColumn(
        "_shuffle_key", F.md5(F.concat(F.lit(seed), F.col(id_col)))
    ).withColumn("_one", F.lit(1))
    pref = _token_prefix_sum(
        keyed, "_one", "_shuffle_key", distributed, cache_registry
    )
    return pref.select(
        id_col,
        F.col("_shuffle_key").alias("shuffle_key"),
        F.col("_start").cast("bigint").alias("shuffle_pos"),
    )


def apportion_budget(
    dims: DataFrame,
    budget: int,
    weight_col: str = "weight",
    key_col: str = "host",
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer fetch
    budget across hosts in proportion to a weight — the per-cycle
    crawl-budget allocator (and, identically, a per-source sampling
    quota assigner): sum(quota) == budget EXACTLY, every quota is
    floor- or ceil-of-proportional, and the whole computation is
    integer arithmetic, so engine and oracle agree bit-for-bit.

        base(i)  = budget * w_i  DIV  W
        frac(i)  = budget * w_i  MOD  W
        quota(i) = base(i) + 1 for the R = budget - sum(base) largest
                   frac (ties broken by key ascending), else base(i)

    Scale shape: the input is a HOST/SOURCE dim (aggregated upstream),
    orders of magnitude smaller than the corpus. W and R are 1-row
    re-aggregates broadcast back; the remainder ranking rides the
    shared two-phase distributed rank (`global_positions`) so even a
    10^8-row dim never sorts on one task; rows with non-positive
    weight get quota 0 and never join the ranking."""
    from .batching import global_positions

    w = F.col(weight_col).cast("long")
    pos = dims.filter(w > 0).select(
        F.col(key_col), w.alias("_w"), F.lit(0).alias("_g")
    )
    tot = pos.agg(F.sum("_w").alias("_tw"))
    base = pos.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.col("_w").alias(weight_col),
        "_g",
        (F.lit(int(budget)) * F.col("_w")).alias("_bw"),
        F.col("_tw"),
    ).select(
        key_col,
        weight_col,
        "_g",
        # integer DIV, not double '/': budget*w can pass 2^53 where a
        # double round-trip would mis-floor
        F.expr("_bw DIV _tw").alias("base_quota"),
        (-(F.col("_bw") % F.col("_tw"))).alias("_negfrac"),
    )
    if distributed:
        ranked = global_positions(
            base,
            group_cols=("_g",),
            order_cols=("_negfrac", key_col),
            out="_pos",
            cache_registry=cache_registry,
        )
    else:
        win = Window.partitionBy("_g").orderBy(
            F.col("_negfrac"), F.col(key_col)
        )
        ranked = base.withColumn("_pos", F.row_number().over(win) - 1)
    rem = ranked.agg(
        (F.lit(int(budget)) - F.sum("base_quota")).alias("_rem")
    )
    zero = dims.filter(w.isNull() | (w <= 0)).select(
        F.col(key_col),
        F.coalesce(w, F.lit(0)).alias(weight_col),
        F.lit(0).cast("long").alias("quota"),
    )
    return (
        ranked.crossJoin(F.broadcast(rem))
        .select(
            key_col,
            weight_col,
            (
                F.col("base_quota")
                + F.when(F.col("_pos") < F.col("_rem"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
        .unionByName(zero)
    )


GUMBEL_DENOM = 4294967296.0  # 2^32: md5-prefix → uniform (0,1)


def weighted_resample(
    docs: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Gumbel top-k weighted sampling WITHOUT replacement — the
    execution step of importance resampling (pair it with
    `textstats.dsir_weights`: exp(log_weight) as the weight draws the
    DSIR-shifted corpus). The Gumbel-max trick makes one global top-k
    equivalent to sequential weighted draws:

        u(id)  = (int(md5(seed|id)[:8]) + 0.5) / 2^32   deterministic
        score  = ln(w) + (-ln(-ln u))                    Gumbel noise
        sample = top-k by score

    Determinism replaces RNG state, as everywhere in this module: the
    same (seed, id) yields the same draw on any engine/cluster/scale,
    and a new epoch is a new seed string — no reshuffle, no state.
    Scores are rounded to 4dp BEFORE ranking (ids break ties), so the
    selected set is reproducible bit-for-bit cross-engine.

    Scale shape: pure codegen map + one TakeOrdered top-k (per-
    partition heap, driver merges k rows per partition) — no global
    sort, no shuffle of the corpus. Non-positive weights are excluded
    (ln undefined), matching every weighted sampler's domain."""
    w = F.col(weight_col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(str(seed)), F.lit("|"),
                    F.col(id_col).cast("string"),
                )
            ),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(GUMBEL_DENOM)
    score = F.round(F.log(w) - F.log(-F.log(u)), 4)
    return (
        docs.filter(w > 0)
        .select(F.col(id_col), F.col(weight_col), score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(int(k))
    )


def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "_ord",
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Greedy token-budget corpus selection — the data-mixing
    primitive: take documents in `order_col` order (ascending = best
    first; pack quality into the key, e.g. (max_bp − q_bp)·2⁴⁰ +
    doc_id) while the running token total stays within
    `budget_tokens` (prefix cut — the document that would overflow
    the budget, and everything after it, is dropped). Zero-token docs
    are excluded from both the selection and the budget.

    Output: every input column + `cum_tokens` (the running total
    through this doc) for the kept rows.

    Scale shape: reuses the two-phase distributed prefix sum
    (`_token_prefix_sum` — range shuffle on the order key, windows
    only over the P-row partition-offsets table), then one codegen
    filter; no global window, no driver collect. At 100 TB the budget
    is a constant (the training-run token target), so the whole
    operator is one range shuffle."""
    pool = docs.filter(F.col(token_col) > 0)
    pref = _token_prefix_sum(
        pool, token_col, order_col, distributed, cache_registry
    )
    return pref.filter(
        F.col("_start") + F.col(token_col) <= int(budget_tokens)
    ).select(
        *docs.columns,
        (F.col("_start") + F.col(token_col)).cast("long").alias("cum_tokens"),
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    shard_col: str | None = None,
    text_col: str = "text",
    size_col: str = "n_chars",
) -> DataFrame:
    """Publishing manifest for a sharded corpus export: one row per
    shard with row count, byte volume, doc_id span, and an
    ORDER-INDEPENDENT content checksum — the artifact a downstream
    consumer verifies a delivered dataset against (the step after
    pack_shards decides the layout).

    checksum = bit_xor over rows of the first 60 bits of
    md5(text) as a bigint: XOR is commutative/associative, so the
    value is identical no matter how partitions deliver rows —
    byte-identical reshards verify, any single changed/missing doc
    flips it. (60 bits = 15 hex chars keeps the conv() exact under
    bigint; the full 128-bit digest would need two columns for no
    additional practical power here.)

    When `shard_col` is None rows are assigned round-robin by
    doc_id % n_shards (the deterministic default the tests/oracle
    pin); pass the column pack_shards produced to manifest a
    size-budgeted layout instead.

    Scale shape: ONE hash aggregate keyed on the shard id with
    map-side partial combine (count/sum/min/max/xor are all
    fixed-width primitive buffers — pure HashAggregate, no sort); the
    md5+conv is map-side codegen. No joins, windows, or UDFs; output
    cardinality = n_shards.
    """
    shard = (
        F.col(shard_col)
        if shard_col
        else F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    )
    sig = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long")
    return (
        docs.select(
            shard.alias("shard"),
            sig.alias("_sig"),
            F.col(size_col).cast("long").alias("_sz"),
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_sz").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.bit_xor("_sig").alias("checksum"),
        )
    )


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    out: str = "z_key",
) -> DataFrame:
    """Morton/Z-order interleave of two bounded int columns — the
    multi-dimensional sort key for data LAYOUT at 100-TB scale.

    Writing a table ordered (or range-partitioned) by z_key clusters
    rows that are close in BOTH dimensions into the same parquet row
    groups, so min/max column statistics prune scans filtered on
    either dimension — the same trick Delta/Iceberg `OPTIMIZE ZORDER
    BY` applies, expressed as a plain column so any writer can use it.

    Inputs are clamped to [0, 2^bits); the interleave is a fixed fan
    of shift/and/or terms — pure whole-stage codegen, no UDF, no
    shuffle (the caller chooses whether to sort/repartitionByRange by
    the key; the KEY itself is a narrow map).
    """
    lim = (1 << bits) - 1
    a = F.least(F.greatest(F.col(col_a).cast("long"), F.lit(0)), F.lit(lim))
    b = F.least(F.greatest(F.col(col_b).cast("long"), F.lit(0)), F.lit(lim))
    # pure Column arithmetic (no intermediate named columns, so caller
    # columns can never be clobbered); disjoint bits make + act as OR
    z = F.lit(0).cast("long")
    for i in range(bits):
        # bit i of a → output bit 2i+1; bit i of b → output bit 2i
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
    return df.withColumn(out, z)


def mixture_select(
    docs: DataFrame,
    total_budget: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    cache_registry: list | None = None,
) -> DataFrame:
    """Two-level data-mixing selection — the composition a training
    run actually executes: (1) apportion the total token budget
    across sources in proportion to their token mass via the
    largest-remainder quotas (`apportion_budget`: integer-exact,
    sum(quota) == budget), then (2) inside each source take documents
    in `order_col` order (ascending = best first; pack quality into
    the key as in `budget_select`) while the running token total
    stays within the source's quota (prefix cut — the overflowing doc
    and everything after it is dropped). Zero-token docs are excluded
    from weights, budgets, and output.

    Output: (source, order_col, token_col, cum_tokens, quota) for the
    kept rows.

    Scale shape: one source-keyed agg for weights (tiny dim), the
    quota computation on that dim (broadcast-scale), ONE
    source-partitioned running-sum window over the corpus, one
    codegen filter. The window key is the mixture source (dozens of
    groups over 10^10 rows) — the Zipf-head source is the hot
    partition; at that scale swap the window for the same range-
    partitioned two-phase prefix sum `budget_select` uses, per
    source (`global_positions` machinery; quotas unchanged)."""
    from pyspark.sql import Window

    pool = docs.filter(F.col(token_col) > 0)
    dims = pool.groupBy(F.col(source_col)).agg(
        F.sum(F.col(token_col).cast("long")).alias("weight")
    )
    # distributed=False: a MIXTURE source dim is tiny by definition
    # (domains/buckets, not documents), so the two-phase distributed
    # remainder rank would spend ~20 exchanges ranking a handful of
    # rows — the plain window costs one
    quotas = apportion_budget(
        dims,
        int(total_budget),
        weight_col="weight",
        key_col=source_col,
        distributed=False,
        cache_registry=cache_registry,
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = pool.withColumn(
        "_start",
        F.coalesce(F.sum(F.col(token_col).cast("long")).over(w), F.lit(0)),
    )
    cum = (F.col("_start") + F.col(token_col)).cast("long")
    return (
        pref.join(quotas.select(source_col, "quota"), source_col)
        .filter(cum <= F.col("quota"))
        .select(
            source_col,
            order_col,
            token_col,
            cum.alias("cum_tokens"),
            "quota",
        )
    )


def grouped_split(
    docs: DataFrame, group_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id, group, bucket, split) — GROUP-DISJOINT train/val/test
    split: the md5 bucket is computed on the GROUP key (host, source,
    domain), so every document of a group lands in the same split.
    This is the anti-leakage split for web corpora — near-duplicate
    pages live on the same site, and a doc-hash split ([[dataset_split]])
    puts one copy in train and its sibling in test, inflating eval.
    Same ~80/10/10 thresholds as dataset_split.

    Scale shape: identical to dataset_split — pure codegen projection
    (md5 + two comparisons), zero shuffles, no RNG state; the group
    key is read from the row, never joined."""
    b = F.substring(F.md5(F.col(group_col).cast("string")), 1, 2)
    return docs.select(
        id_col,
        F.col(group_col).alias("grp"),
        b.alias("bucket"),
        F.when(b < TRAIN_LT, "train")
        .when(b < VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


def pack_interleaved(
    spans_docs: DataFrame,
    budget: int,
    tokens_per_media: int = 576,
    chars_per_token: int = 4,
    order_col: str = "doc_id",
    distributed: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Token-budget packing for INTERLEAVED text+media documents (the
    input_hint table shape): each document's cost is its text tokens
    (ceil(chars / chars_per_token) — the standard chars-per-token
    estimate) plus a FIXED per-media charge (`tokens_per_media`, e.g.
    a 24x24 ViT patch grid = 576), because media spans enter the
    training sequence as a fixed-size embedding block regardless of
    blob bytes. Documents stay whole (media blocks are atomic — a
    split image is garbage), so this is the pack_shards geometry with
    a span-derived cost: shard_id = floor(exclusive-prefix-sum(cost)
    / budget); an oversized single document overflows its own shard
    rather than splitting.

    Cost extraction is pure array codegen (filter/aggregate over the
    spans column — no explode, no UDF); the global prefix sum is the
    same two-phase no-global-window machinery as pack_shards.

    Output: (order_col, n_text_tokens, n_media_tokens, cost,
    shard_id).
    """
    text_chars = F.aggregate(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
        F.lit(0).cast("long"),
        # coalesce: one NULL-text span must not null the document's
        # whole cost (a NULL cost silently drops the doc from the
        # prefix sum and shifts every later shard boundary)
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )
    n_media = F.size(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
    )
    costed = (
        spans_docs.select(
            F.col(order_col),
            text_chars.alias("_tc"),
            n_media.cast("long").alias("_nm"),
        )
        .select(
            order_col,
            F.expr(
                f"CAST((_tc + {chars_per_token - 1}) div {chars_per_token}"
                " AS BIGINT)"
            ).alias("n_text_tokens"),
            (F.col("_nm") * tokens_per_media).alias("n_media_tokens"),
        )
        .withColumn(
            "cost", F.col("n_text_tokens") + F.col("n_media_tokens")
        )
    )
    pref = _token_prefix_sum(
        costed, "cost", order_col, distributed, cache_registry
    )
    return pref.select(
        order_col,
        "n_text_tokens",
        "n_media_tokens",
        "cost",
        F.floor(F.col("_start") / budget).cast("long").alias("shard_id"),
    )


def span_chunks(
    spans_docs: DataFrame,
    budget: int,
    tokens_per_media: int = 576,
    chars_per_token: int = 4,
) -> DataFrame:
    """Greedy context-window chunking WITHIN an interleaved document:
    split each doc's span sequence (offset order) into consecutive
    chunks whose summed span cost stays <= budget, never splitting a
    span (media blocks are atomic — the same invariant as
    pack_interleaved, applied one level down: that operator packs
    whole DOCUMENTS into shards, this one cuts an over-long document
    into trainable windows at span boundaries). Per-span cost: text =
    ceil(chars / chars_per_token), media = tokens_per_media. A single
    span costlier than the budget gets its own oversize chunk
    (flagged) rather than being dropped or split.

    Scale shape: ZERO shuffle — the greedy fold is one `aggregate`
    expression per document (sequential within a doc, as greedy
    semantics demand; embarrassingly parallel across docs), chunk
    rollups accumulate inside the same fold, and the result explodes
    straight out of the projection. No window, no Python, no join.

    Output: (doc_id, chunk_no, n_spans, chunk_cost, n_text, n_media,
    oversize), one row per (doc, chunk).
    """
    chunk_t = (
        "array<struct<chunk_no:int,n_spans:int,chunk_cost:bigint,"
        "n_text:int,n_media:int>>"
    )
    ordered = F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )

    def span_cost(s):
        return (
            F.when(s["kind"] == "media", F.lit(tokens_per_media))
            .otherwise(
                F.ceil(
                    F.coalesce(F.length(s["text"]), F.lit(0))
                    / F.lit(chars_per_token)
                )
            )
            .cast("long")
        )

    def step(acc, s):
        c = span_cost(s)
        is_media = (s["kind"] == "media").cast("int")
        last = F.element_at(acc, -1)
        fresh = F.struct(
            F.size(acc).cast("int").alias("chunk_no"),
            F.lit(1).alias("n_spans"),
            c.alias("chunk_cost"),
            (1 - is_media).alias("n_text"),
            is_media.alias("n_media"),
        )
        updated = F.struct(
            last["chunk_no"].alias("chunk_no"),
            (last["n_spans"] + 1).alias("n_spans"),
            (last["chunk_cost"] + c).alias("chunk_cost"),
            (last["n_text"] + 1 - is_media).alias("n_text"),
            (last["n_media"] + is_media).alias("n_media"),
        )
        return F.when(
            (F.size(acc) == 0) | (last["chunk_cost"] + c > budget),
            F.concat(acc, F.array(fresh)),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(updated)
            )
        )

    folded = spans_docs.select(
        "doc_id",
        F.aggregate(
            ordered, F.expr(f"cast(array() as {chunk_t})"), step
        ).alias("_chunks"),
    )
    return (
        folded.select("doc_id", F.explode("_chunks").alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_no").alias("chunk_no"),
            F.col("c.n_spans").alias("n_spans"),
            F.col("c.chunk_cost").alias("chunk_cost"),
            F.col("c.n_text").alias("n_text"),
            F.col("c.n_media").alias("n_media"),
            (F.col("c.chunk_cost") > budget).alias("oversize"),
        )
    )
