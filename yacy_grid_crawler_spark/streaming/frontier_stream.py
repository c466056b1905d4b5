"""Structured Streaming variant of the frontier consumer.

The reference is a continuous queue consumer with at-least-once acks
(S4, CrawlerListener.java:149-156, 191-448). The batch BFS driver loop
(plans/crawl_job.py) is the semantics-exact engine; this module is the
unbounded-stream deployment shape noted in SURVEY.md §2 'Streaming
ops': frontier rows arrive as a stream (files here; Kafka in
production), flow through the same filter kernels, and the session
seen-set (D2, 7-day TTL — CrawlerListener.java:84) becomes per-group
TTL state via applyInPandasWithState.

foreachBatch gives exactly-once sink semantics against the same
StateStore (each micro-batch = one snapshot commit), replacing the
reference's FAIL_IRREVERSIBLE redelivery contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.udfs import canonicalize

CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("crawl_id", T.StringType()),
        T.StructField("url_raw", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("event_ms", T.LongType()),
    ]
)

OUT_SCHEMA = "crawl_id string, url string, url_id string, depth int"
STATE_SCHEMA = "ids array<string>"

# bounded-state variant: fixed-size bloom bitmap + a suspect flag
BOUNDED_OUT_SCHEMA = OUT_SCHEMA + ", suspect boolean"
BOUNDED_STATE_SCHEMA = "bits binary"

SEEN_TTL_MS = 7 * 24 * 3600 * 1000  # doublesCleanupTimeout, CrawlerListener.java:84


def read_candidate_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of candidate URLs (stand-in for the broker).
    maxFilesPerTrigger bounds micro-batch size like the reference's
    queue throttling (conf/config.properties:5)."""
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _make_dedup_fn(ttl: bool):
    def _dedup_with_state(key, pdf_iter, state: GroupState):
        """Per-crawl_id TTL'd seen-set state: emit only first-seen
        url_ids (D2 semantics — add-before-filter happens downstream
        like the batch path). State is the md5-id set; with ttl=True a
        processing-time timeout sweeps it after the 7-day TTL like the
        reference's 10-minute cleanup cron."""
        if ttl and state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        cols = ["crawl_id", "url", "url_id", "depth"]
        frames = []
        for pdf in pdf_iter:
            # vectorized first-seen: batch-internal first occurrence
            # (drop_duplicates keeps the first row) then an isin probe
            # against the carried state — no per-row Python
            novel = pdf.loc[~pdf["url_id"].isin(seen)].drop_duplicates("url_id")
            if len(novel):
                frames.append(novel[cols])
                seen.update(novel["url_id"].tolist())
        state.update((list(seen),))
        if ttl:
            state.setTimeoutDuration(SEEN_TTL_MS)
        out = pd.concat(frames) if frames else pd.DataFrame(columns=cols)
        out["depth"] = out["depth"].astype("int32")
        yield out

    return _dedup_with_state


def _canonicalized(candidates: DataFrame) -> DataFrame:
    """canonicalize → md5: the same tiered gate as the batch wave —
    tier-1 identity and tier-2 case/fragment repair stay JVM-side; only
    the residue pays the Arrow round trip (equality pinned by the
    urlnorm test suite)."""
    from ..functions.urlnorm import (
        FAST_CANONICAL_PATTERN,
        TIER2_CANONICAL_PATTERN_JVM,
        tier2_fix_jvm,
    )

    _fast = F.regexp_like(F.col("url_raw"), F.lit(FAST_CANONICAL_PATTERN))
    _t2 = (~F.col("_fast")) & F.regexp_like(
        F.col("url_raw"), F.lit(TIER2_CANONICAL_PATTERN_JVM)
    )
    return (
        candidates.withColumn("_fast", _fast)
        .withColumn("_t2", _t2)
        .withColumn(
            "url",
            F.coalesce(
                canonicalize(
                    F.when(
                        F.col("_fast") | F.col("_t2"),
                        F.lit(None).cast("string"),
                    ).otherwise(F.col("url_raw"))
                ),
                F.when(F.col("_fast"), F.col("url_raw")).when(
                    F.col("_t2"), tier2_fix_jvm(F.col("url_raw"))
                ),
            ),
        )
        .drop("_fast", "_t2")
        .filter(F.col("url").isNotNull())
        .withColumn("url_id", F.md5(F.col("url")))
    )


def frontier_stream(
    candidates: DataFrame,
    ttl: bool = True,
    state: str = "bounded",
    capacity: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """canonicalize → md5 → stateful first-seen dedup. Returns the
    novel-URL stream; downstream filters/batching reuse the batch
    operators inside foreachBatch.

    DEFAULTS are the production shape: `state="bounded"` keeps a
    FIXED-SIZE bloom bitmap per crawl (O(filter bytes) however many
    ids the crawl has seen — survives a 10^8-id frontier), and
    `ttl=True` arms the reference's 7-day seen sweep
    (doublesCleanupTimeout, CrawlerListener.java:84) as a
    processing-time state timeout. The bounded output carries a
    `suspect` column the sink must route through `resolve_suspects`
    (exact anti-join vs the committed url_seen) inside foreachBatch —
    results then equal the batch operator exactly.

    `state="exact"` keeps the plain md5-id set per crawl: no suspect
    lane, but one unbounded state row rewritten per micro-batch —
    fine for modest crawls and raw-emission smoke harnesses only.

    TTL caveat (measured): a processing-time timeout keeps scheduling
    micro-batches to sweep state, so an `availableNow` drain never
    self-terminates with ttl on. Drain harnesses either pass ttl=False
    (fastest — run_stream_to_memory's default) or keep the TTL armed
    and stop via `drain_until_idle` (N consecutive empty micro-batches
    → stop; run_stream_to_memory(ttl=True) wires it). Live triggers
    keep the default."""
    if state == "bounded":
        return frontier_stream_bounded(
            candidates, ttl=ttl, capacity=capacity, fpp=fpp
        )
    if state != "exact":
        raise ValueError(f"state must be 'bounded' or 'exact': {state!r}")
    return _canonicalized(candidates).groupBy("crawl_id").applyInPandasWithState(
        _make_dedup_fn(ttl),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if ttl else GroupStateTimeout.NoTimeout
        ),
    )


def _make_bounded_dedup_fn(ttl: bool, capacity: int, fpp: float):
    from ..functions.bloom import UrlBloom, from_bytes, to_bytes

    def _dedup_bounded(key, pdf_iter, state: GroupState):
        """Fixed-size state dedup (the scale path): state = bloom
        bitmap BYTES, O(capacity·log(1/fpp)) regardless of how many
        ids the crawl has seen — never an unbounded row rewritten per
        micro-batch. Exactness is preserved by a two-lane output, the
        streaming mirror of the batch wave's bloom_prefilter → exact
        anti-join split:

        * bloom-NEGATIVE → definitely first-seen (no false negatives):
          emitted with suspect=false, bits set;
        * bloom-POSITIVE → seen OR false positive: emitted with
          suspect=true for the sink's exact anti-join against the
          committed url_seen table (`resolve_suspects` in
          foreachBatch) — a duplicate is dropped there, a false
          positive survives. Nothing is silently lost to an FP.
        """
        if ttl and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            bloom = from_bytes(bytes(state.get[0]))
        else:
            bloom = UrlBloom(capacity, fpp=fpp)
        cols = ["crawl_id", "url", "url_id", "depth"]
        frames = []
        for pdf in pdf_iter:
            # in-batch D4 collapse first (duplicates inside one Arrow
            # batch would both probe negative before the add)
            pdf = pdf.drop_duplicates("url_id")
            hits = bloom.might_contain(pdf["url_id"])
            out = pdf[cols].copy()
            out["suspect"] = hits
            frames.append(out)
            novel_ids = pdf["url_id"].loc[~hits]
            if len(novel_ids):
                bloom.add_many(novel_ids)
        state.update((bytearray(to_bytes(bloom)),))
        if ttl:
            state.setTimeoutDuration(SEEN_TTL_MS)
        out = (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=cols + ["suspect"])
        )
        out["depth"] = out["depth"].astype("int32")
        out["suspect"] = out["suspect"].astype(bool)
        yield out

    return _dedup_bounded


def frontier_stream_bounded(
    candidates: DataFrame,
    ttl: bool = True,
    capacity: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Bounded-state variant of `frontier_stream` for 10^8-id crawls:
    per-crawl state is a FIXED-SIZE bloom bitmap (~1.2 MB at the
    default capacity/fpp) instead of an ever-growing id list. Output
    gains a `suspect` column; the sink must route suspect=true rows
    through `resolve_suspects` (exact anti-join vs the committed
    url_seen) inside foreachBatch — dedup results then equal the
    batch operator exactly (pinned by tests/test_streaming.py)."""
    return _canonicalized(candidates).groupBy("crawl_id").applyInPandasWithState(
        _make_bounded_dedup_fn(ttl, capacity, fpp),
        outputStructType=BOUNDED_OUT_SCHEMA,
        stateStructType=BOUNDED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if ttl else GroupStateTimeout.NoTimeout
        ),
    )


def resolve_suspects(batch_df: DataFrame, seen_ids: DataFrame) -> DataFrame:
    """foreachBatch companion of `frontier_stream_bounded`: exact
    resolution of the suspect lane against the committed seen set.
    `seen_ids` is (crawl_id, url_id) of the sink's url_seen table as of
    this micro-batch. Within-batch repeats collapse first (first-wins
    on arrival order is not defined across partitions; rows for one
    url_id are identical apart from depth, where the minimum — the
    BFS-first discovery — wins, matching the batch D4 winner)."""
    first = (
        batch_df.groupBy("crawl_id", "url_id")
        .agg(
            F.min_by("url", "depth").alias("url"),
            F.min("depth").alias("depth"),
            # suspect only if EVERY occurrence was suspect: any
            # bloom-negative occurrence proves the id novel
            F.min(F.col("suspect").cast("int")).cast("boolean").alias("suspect"),
        )
    )
    clear = first.filter(~F.col("suspect"))
    resolved = first.filter(F.col("suspect")).join(
        seen_ids.select("crawl_id", "url_id"), ["crawl_id", "url_id"], "left_anti"
    )
    return clear.unionByName(resolved).drop("suspect")


def drain_until_idle(
    query,
    idle_batches: int = 3,
    timeout_s: float = 300.0,
    poll_s: float = 0.25,
) -> bool:
    """Stop a streaming query once it has gone idle: `idle_batches`
    consecutive completed micro-batches with zero input rows.

    This is the drain path for TTL-ARMED queries (round-4 verdict
    task 6): a ProcessingTimeTimeout keeps scheduling micro-batches to
    sweep state, so even an availableNow trigger never self-terminates
    — the measured gotcha that previously forced every drain harness
    to pass ttl=False. Watching `lastProgress` from the driver needs
    no engine cooperation: data batches report numInputRows > 0,
    timeout-sweep batches report 0, so an empty streak means the
    source is drained and only the sweeper is ticking. Returns True
    when stopped on idle, False on the wall-clock timeout (query is
    stopped either way)."""
    import time

    deadline = time.time() + timeout_s
    empty_streak = 0
    last_batch = -1
    try:
        while time.time() < deadline:
            if not query.isActive:
                return True  # self-terminated (e.g. ttl off)
            p = query.lastProgress
            if p and p["batchId"] != last_batch:
                last_batch = p["batchId"]
                if p["numInputRows"] == 0:
                    empty_streak += 1
                    if empty_streak >= idle_batches:
                        query.stop()
                        return True
                else:
                    empty_streak = 0
            time.sleep(poll_s)
        return False
    finally:
        query.stop()


def run_stream_to_memory(
    spark: SparkSession,
    src_path: str,
    query_name: str = "frontier_out",
    max_files_per_trigger: int = 8,
    state: str = "bounded",
    ttl: bool = False,
):
    """Drain the file stream and return the novel-URL DataFrame.

    Default (`state="bounded"`) runs the production shape end-to-end:
    bounded-state dedup with the suspect lane resolved per micro-batch
    against the accumulated committed set inside foreachBatch — the
    returned rows are the exact novel set (same contract as the batch
    operator). `state="exact"` drains the legacy exact-state variant
    straight into a memory sink (raw emission, no suspect column).

    `ttl=True` arms the 7-day state sweep during the drain; the query
    then never self-terminates (frontier_stream's TTL caveat), so the
    drain switches from awaitTermination to `drain_until_idle` —
    stop after N consecutive empty micro-batches. Results are
    identical; ttl=False (default) stays the fastest exact drain."""
    src = read_candidate_stream(spark, src_path, max_files_per_trigger)

    def _drain(q) -> None:
        if ttl:
            drain_until_idle(q)
        else:
            q.awaitTermination(300)
            q.stop()

    if state == "exact":
        q = (
            frontier_stream(src, state="exact", ttl=ttl)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)  # drain everything, then idle-stop
            .start()
        )
        _drain(q)
        return spark.sql(f"SELECT * FROM {query_name}")

    # r06 (guide §5 / VERDICT r5 item 4): the committed set used to be
    # accumulated DRIVER-side (per-batch collect() + createDataFrame
    # union) — O(total novel) driver memory and a serialization stall
    # per micro-batch. Resolution now stays executor-side: each
    # batch's novel rows append to a parquet `novel` store, and the
    # next batch's suspect lane anti-joins against that store's
    # (crawl_id, url_id) projection — exactly the persisted-url_seen
    # join the production sink performs, with zero collect() in the
    # resolution path. The store is a per-drain temp dir; the result
    # is localCheckpointed so the dir can be removed before returning.
    import shutil
    import tempfile

    novel_dir = tempfile.mkdtemp(prefix="stream_novel_")
    novel_path = novel_dir + "/novel"
    wrote = {"any": False}

    def sink(batch_df, _batch_id):
        if wrote["any"]:
            seen_ids = spark.read.parquet(novel_path).select(
                "crawl_id", "url_id"
            )
        else:
            seen_ids = spark.createDataFrame(
                [], "crawl_id string, url_id string"
            )
        resolved = resolve_suspects(batch_df, seen_ids)
        resolved.select("crawl_id", "url", "url_id", "depth").write.mode(
            "append"
        ).parquet(novel_path)
        wrote["any"] = True

    q = (
        frontier_stream(src, ttl=ttl)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    if wrote["any"]:
        # materialize off the temp dir, then drop it
        out = spark.read.parquet(novel_path).localCheckpoint()
    else:
        out = spark.createDataFrame([], OUT_SCHEMA)
    shutil.rmtree(novel_dir, ignore_errors=True)
    out.createOrReplaceTempView(query_name)
    return out


def host_rate_stream(
    candidates: DataFrame,
    window_sec: int = 60,
    watermark_sec: int = 120,
) -> DataFrame:
    """Crawl telemetry: per-host candidate rates over event-time
    tumbling windows with late-data handling — the streaming
    counterpart of the batch `crawl_metrics` table (A2) and the
    per-queue throughput the reference logs from its broker loop
    (CrawlerListener.java status counters).

    Watermark = `watermark_sec` on the candidate's event time: a
    window's aggregate is emitted (append mode) only once the
    watermark passes its end — so each (window, host) row is final,
    exactly what a monitoring sink wants. Late rows are dropped with
    Spark's standard guarantee: guaranteed once the window's state is
    evicted (the watermark update lags one micro-batch), best-effort
    within the finalizing batch itself.
    State is bounded by (hosts x open windows); at 10^10-frontier
    scale the partial aggregates combine map-side per micro-batch and
    shuffle only on the (window, host) key.

    Output: (window_start, window_end, host, n_candidates, n_unique).
    """
    c = _canonicalized(candidates).withColumn(
        "host", F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )
    return (
        c.withColumn("event_ts", F.timestamp_millis(F.col("event_ms")))
        .withWatermark("event_ts", f"{watermark_sec} seconds")
        .groupBy(
            F.window("event_ts", f"{window_sec} seconds").alias("win"),
            "host",
        )
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.approx_count_distinct("url_id").alias("n_unique"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_candidates",
            "n_unique",
        )
    )


def run_host_rate_to_memory(
    spark: SparkSession,
    src_path: str,
    query_name: str = "host_rate_out",
    window_sec: int = 60,
    watermark_sec: int = 120,
    max_files_per_trigger: int = 8,
):
    """Drain the file stream through the windowed host-rate agg into a
    memory sink (append mode: only watermark-finalized windows land)."""
    q = (
        host_rate_stream(
            read_candidate_stream(spark, src_path, max_files_per_trigger),
            window_sec=window_sec,
            watermark_sec=watermark_sec,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
