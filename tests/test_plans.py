"""Physical-plan audits: assert the plans Catalyst produces are the
ones the scale design calls for (SURVEY.md §4; README 'Scale design').

These guard against silent plan regressions — a lost broadcast hint, a
filter that stops reaching the parquet scan, or a window that
introduces a single-partition exchange would all pass row-equality
tests while destroying 100-TB behavior.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_lineitem_filter_pushdown_and_pruning(spark):
    """Filters and column selection must reach the parquet scan."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").groupBy(
        "l_returnflag"
    ).agg(F.sum("l_quantity").alias("sum_qty"))
    plan = _formatted(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only the 3 referenced columns
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_returnflag" in rs and "l_quantity" in rs and "l_shipdate" in rs
    assert "l_comment" not in rs and "l_extendedprice" not in rs


def test_blacklist_host_join_is_broadcast(spark):
    """13k blacklist hosts must join as a broadcast, never a shuffle
    (and never a 13k-literal In-list — measured 10× wave slowdown)."""
    from yacy_grid_crawler_spark.operators.blacklist import (
        BlacklistRule,
        apply_blacklist,
    )

    df = spark.range(1000).select(
        F.concat(F.lit("http://h"), F.col("id").cast("string"), F.lit(".example/p")).alias("url"),
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias("host"),
    )
    rules = [
        BlacklistRule("host", f"evil{i:05d}.example.net", "", "s", "")
        for i in range(13434)
    ]
    out = apply_blacklist(df, rules, out_col="_bl")
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # no giant literal list compiled into the plan
    assert "evil00001.example.net, evil00002" not in plan


def test_seen_anti_join_shape(spark):
    """The persistent seen check must be a (hash) anti join on url_id."""
    from yacy_grid_crawler_spark.operators.dedup import dedup_against_seen

    cand = spark.range(1000).select(F.md5(F.col("id").cast("string")).alias("url_id"))
    seen = spark.range(100).select(F.md5(F.col("id").cast("string")).alias("url_id"))
    out = dedup_against_seen(cand, seen, key="url_id", crawl_col=None, use_bloom=False)
    plan = _plan(out)
    assert "LeftAnti" in plan


def test_distributed_rank_has_no_global_window(spark):
    """The two-phase rank must not fall back to a single-partition
    window: no `Window` over an Exchange SinglePartition."""
    from yacy_grid_crawler_spark.operators.batching import assign_batches

    df = spark.createDataFrame(
        [("c", i % 2 == 0, i, 0) for i in range(100)],
        "crawl_id string, do_index boolean, parent_ord int, span_offset int",
    )
    out = assign_batches(df, order=("parent_ord", "span_offset"), distributed=True)
    plan = _plan(out)
    assert "SinglePartition" not in plan
    # every window in the two-phase plan is keyed by the physical
    # partition id — per-partition parallel, never per-group serial
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_pid" in line, f"window not pid-local: {line[:120]}"


def test_ann_brute_force_broadcasts_queries(spark):
    """Brute-force ANN: the big candidate side never shuffles or
    cross-joins. r06: the default impl is the GEMM kernel — the query
    matrix rides a sparkContext broadcast into a mapInPandas block
    (no join of the candidate side at all); the only exchange is the
    final per-query top-k window over the partial top-k rows. The
    expression spec twin must still broadcast the query side."""
    from yacy_grid_crawler_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(brute_force_topk(emb))
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    plan_expr = _plan(brute_force_topk(emb, impl="expr"))
    assert "BroadcastNestedLoopJoin" in plan_expr
    assert "CartesianProduct" not in plan_expr


def test_sq8_topk_broadcasts_queries_and_stays_codegen(spark):
    """SQ8 ANN: quantization is pure codegen (transform/aggregate, no
    Python), the query side broadcasts, and the big quantized side
    never cross-joins or shuffles."""
    from yacy_grid_crawler_spark.operators.similarity import sq8_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(sq8_topk(emb))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave_stays_whole_stage_codegen(spark):
    """The wave's JVM-side expression stages must compile to
    whole-stage codegen (the Arrow kernels are the only interpreted
    islands)."""
    from yacy_grid_crawler_spark.config import build_crawl_start, make_profile
    from yacy_grid_crawler_spark.plans.wave import run_wave

    candidates = spark.range(200).select(
        F.lit(0).alias("parent_ini"),
        F.col("id").alias("parent_batch_no"),
        F.lit(0).alias("parent_batch_pos"),
        F.lit(0).alias("span_offset"),
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.org/p/"), F.col("id").cast("string")).alias("url_raw"),
    )
    profile = build_crawl_start(make_profile({}), "http://h0.example.org/p/0")
    seen = spark.createDataFrame([], "crawl_id string, url_id string, first_depth int")
    status = spark.createDataFrame([], "url_id string")
    res = run_wave(candidates, profile, seen=seen, status_ids=status, depth=1)
    res.frontier.collect()  # AQE finalizes the plan only after a run
    plan = _formatted(res.frontier)
    assert "isFinalPlan=true" in plan
    # '*' prefixes mark operators inside whole-stage-codegen spans
    starred = [
        ln for ln in plan.splitlines() if "+- * " in ln or ":- * " in ln
    ]
    assert len(starred) >= 5, f"too few codegen spans:\n{plan[:800]}"
    res.unpersist()


def test_in_wave_dedup_is_sort_free_hash_agg(spark):
    """first_occurrence's packed-aggregate fast path must plan as a
    HashAggregate with partial (map-side) aggregation and NO Sort —
    the sort-free in-wave dedup promise (operators/dedup.py)."""
    from yacy_grid_crawler_spark.operators.dedup import first_occurrence

    df = spark.range(1000).select(
        F.lit("c1").alias("crawl_id"),
        F.md5((F.col("id") % 300).cast("string")).alias("url_id"),
        F.concat(F.lit("http://x.org/"), (F.col("id") % 300).cast("string")).alias("url"),
        (F.col("id") % 2).cast("int").alias("parent_ini"),
        F.col("id").alias("parent_batch_no"),
        (F.col("id") % 8).cast("int").alias("parent_batch_pos"),
        (F.col("id") % 40).cast("int").alias("span_offset"),
    )
    out = first_occurrence(
        df,
        key="url_id",
        order=("parent_ini", "parent_batch_no", "parent_batch_pos", "span_offset"),
        carry=("url",),
    )
    assert out.count() == 300
    plan = _formatted(out)
    # the win over the window formulation: a two-phase aggregate whose
    # exchange carries map-side-collapsed rows (one per key per task),
    # not every candidate row — and no Window operator at all
    aggs = plan.count("Aggregate (")
    assert aggs >= 2, f"expected partial+final aggregate:\n{plan[:800]}"
    assert "Window" not in plan, plan[:800]
    assert "hashpartitioning" in plan, plan[:800]
    # winner must be the canonical-order first (min packed order key)
    row = {r["url_id"]: r for r in out.collect()}
    import hashlib

    uid = hashlib.md5(b"5").hexdigest()
    w = row[uid]
    # id%300==5 candidates: ids 5,305,605,905 — all odd → ini=1; the
    # min order tuple is then batch_no=5
    assert w["parent_ini"] == 1 and w["parent_batch_no"] == 5
    assert w["url"].endswith("/5")


def test_wave_anti_joins_are_shuffled_hash(spark):
    """Both wave anti-joins must be ShuffledHashJoin on bare url_id:
    no sort of the probe side (SMJ would sort the 10^10-row wave), no
    driver-serial broadcast build (AQE would happily broadcast a
    multi-MB seen side at test scale — wrong plan at real scale and a
    parallelism-independent wall-clock term), and no constant crawl_id
    fragmenting the shuffle keys. (Full exchange reuse across the two
    joins is defeated by the persist boundary — an AQE-wrapped cached
    plan reports unknown partitioning to the outer query — so the
    wave side exchanges on url_id per join; the keys are half the
    bytes of the round-1 (crawl_id, url)-keyed shuffles.)"""
    from yacy_grid_crawler_spark.config import build_crawl_start, make_profile
    from yacy_grid_crawler_spark.plans.wave import run_wave

    candidates = spark.range(2000).select(
        F.lit(0).alias("parent_ini"),
        F.col("id").alias("parent_batch_no"),
        F.lit(0).alias("parent_batch_pos"),
        F.lit(0).alias("span_offset"),
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.org/p/"), (F.col("id") % 900).cast("string")).alias("url_raw"),
    )
    profile = build_crawl_start(make_profile({}), "http://h0.example.org/p/0")
    seen = spark.range(300).select(
        F.lit(profile["id"]).alias("crawl_id"),
        F.md5(F.col("id").cast("string")).alias("url_id"),
        F.lit(0).alias("first_depth"),
    )
    status = spark.range(200).select(
        F.md5(F.concat(F.lit("s"), F.col("id").cast("string"))).alias("url_id")
    )
    res = run_wave(candidates, profile, seen=seen, status_ids=status, depth=1)
    res.frontier.collect()
    plan = _formatted(res.frontier)
    assert "isFinalPlan=true" in plan
    assert "ShuffledHashJoin LeftAnti" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan, plan[:1200]
    assert "BroadcastHashJoin LeftAnti" not in plan, plan[:1200]
    # dedup/join shuffle keys are bare url_id / url — no constant
    # crawl_id key bytes riding those exchanges (the batching window's
    # (crawl_id, do_index) partitioning is a different, tiny-key
    # exchange and legitimately keeps its group columns)
    assert "hashpartitioning(url_id" in plan, plan[:1200]
    assert "hashpartitioning(crawl_id, url" not in plan, plan[:1200]
    res.unpersist()


def test_line_dedup_is_windowless_hash_agg(spark):
    """line_dedup must stay window-free (both per-line frequency and
    the per-doc regroup are hash aggregates with map-side partial
    combine) and must not broadcast the full lines table — the freq
    side of the join is corpus-sized at 100 TB, so a broadcast there
    would OOM the driver; a single-partition window would serialize
    the corpus."""
    from yacy_grid_crawler_spark.operators.textstats import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(line_dedup(docs))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # partial_count before the exchange = map-side combine on lines
    assert "partial_count" in plan


def test_tfidf_window_partitions_on_doc_id(spark):
    """tfidf_topk's top-k window must partition on doc_id (millions
    of independent partitions), never degrade to a single global
    sort, and the 1-row n_docs total must arrive via broadcast, not
    a shuffle or cartesian product."""
    from yacy_grid_crawler_spark.operators.textstats import tfidf_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(tfidf_topk(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total
    # the window's required distribution is doc_id-hashed, not global
    assert "hashpartitioning(doc_id" in plan
    # no global range sort anywhere in the plan (a degraded window
    # would order the whole corpus through one range exchange)
    assert "rangepartitioning" not in plan


def test_lm_score_stays_jvm_side(spark):
    """The unigram-LM scorer must be pure codegen — no Arrow/Python
    eval nodes, no cartesian product; the hot path is one token
    aggregate + one (skew-prone, AQE-covered) freq join + one per-doc
    aggregate."""
    from yacy_grid_crawler_spark.operators.textstats import lm_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(lm_score(docs))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_host_cap_sample_distributed_has_no_global_window(spark):
    """The scale path must rank via the range-partitioned two-phase
    machinery — no window partitioned on the bare host (the Zipf head
    host would become one straggler task)."""
    from yacy_grid_crawler_spark.operators.sampling import host_cap_sample

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("host"),
    )
    caches: list = []
    out = host_cap_sample(
        docs, cap=10, distributed=True, cache_registry=caches
    )
    plan = _plan(out)
    for c in caches:
        c.unpersist()
    # the only windows run per (physical partition × host) — they are
    # keyed on SPARK_PARTITION_ID, never on host alone
    for frag in plan.split("Window ")[1:]:
        spec = frag.split("\n", 1)[0]
        assert "SPARK_PARTITION_ID" in spec or "_pid" in spec, spec


def test_inverted_index_no_window_no_cartesian(spark):
    """Index build: pure hash aggregates + term-keyed join — no
    window (no single-partition risk), no cartesian, no Python."""
    from yacy_grid_crawler_spark.operators.textstats import inverted_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(inverted_index(docs))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_batch_search_broadcasts_probe_side(spark):
    """Batch retrieval: the probe-query term dim must broadcast so
    the corpus tf table never shuffles for that join; the only window
    partitions on query_id (small, many-partition key)."""
    from yacy_grid_crawler_spark.operators.textstats import batch_search

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    queries = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("qtext")
    )
    plan = _plan(batch_search(docs, queries))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tpch_join_queries_broadcast_dims(spark):
    """Q3/Q5-shape queries: every dim side broadcasts — the lineitem
    fact must never sort-merge or shuffle for a dim join."""
    import __spark_entry__ as e

    for name in ("order_revenue_topk", "supplier_volume"):
        plan = _plan(e.queries()[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_html_extract_and_url_features_are_pure_maps(spark):
    """Both new feature operators claim zero shuffles and zero Python
    surfaces: the physical plan must be scan -> project only."""
    from yacy_grid_crawler_spark.operators.extract import html_extract
    from yacy_grid_crawler_spark.operators.graph import url_features

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    page = docs.select(
        "doc_id", F.concat(F.lit("<html><body>"), "text",
                           F.lit("</body></html>")).alias("html")
    )
    for df in (
        html_extract(page),
        url_features(docs.select(
            F.concat(F.lit("http://h.example.org/p/"),
                     F.col("doc_id").cast("string")).alias("url")
        )),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_asof_join_is_single_key_shuffle_no_pair_join(spark):
    """asof_join must never form a join operator at all — the
    union+window formulation is one hash shuffle on the keys plus a
    per-key sort. A pair join (theta/cartesian/BNLJ) would be the
    quadratic plan this operator exists to avoid at 100 TB."""
    from yacy_grid_crawler_spark.operators.joins import asof_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts_us", F.col("event_id").alias("vid")
    )
    plan = _plan(
        asof_join(left, right, ["user_id"], "ts_us", ["vid"])
    )
    for op in ("Join", "CartesianProduct"):
        assert op not in plan, op
    assert "hashpartitioning(user_id" in plan
    assert "Window" in plan
    # no global range sort — the only sort is the per-key window sort
    assert "rangepartitioning" not in plan


def test_range_join_is_bucketized_equi_join(spark):
    """range_join must compile to an equi-join on (keys, bucket) with
    the range predicate as a join/filter condition — never a
    BroadcastNestedLoopJoin or CartesianProduct, which is what a raw
    inequality join degenerates to when neither side is tiny."""
    from yacy_grid_crawler_spark.operators.joins import range_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    points = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("t"),
        F.col("event_id").alias("click_id"),
    )
    intervals = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        (F.col("ts_us") - F.lit(1800_000_000)).alias("s"),
        F.col("ts_us").alias("e"),
    )
    plan = _plan(
        range_join(points, intervals, ["user_id"], "t", "s", "e",
                   bucket=1800_000_000)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket key participates in the equi-join keys
    assert "_bucket" in plan


def test_hits_and_host_graph_no_cartesian(spark):
    """HITS rounds are equi-join + hash agg; the host rollup is one
    hash aggregate — neither may degrade to a cartesian."""
    from yacy_grid_crawler_spark.operators.graph import (
        hits_scores, host_link_graph,
    )

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    plan = _plan(hits_scores(docs, iters=1))
    assert "CartesianProduct" not in plan
    links = spark.range(200).select(
        F.concat(F.lit("http://h"), (F.col("id") % 10).cast("string"),
                 F.lit(".ex/a")).alias("src_url"),
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".ex/b")).alias("dst_url"),
    )
    plan2 = _plan(host_link_graph(links))
    assert "CartesianProduct" not in plan2
    assert "HashAggregate" in plan2


def test_weighted_resample_is_takeordered_pure_jvm(spark):
    """Gumbel top-k must compile to TakeOrderedAndProject (per-
    partition heap), not a global sort, with zero Python surfaces."""
    from yacy_grid_crawler_spark.operators.sampling import weighted_resample

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("weight")
    )
    plan = _plan(weighted_resample(docs, 10))
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dsir_weights_stays_jvm_side(spark):
    """Feature hashing + conditional-count model build + LLR scoring:
    all codegen, no Python, no cartesian (the 1-row totals broadcast
    is a BroadcastNestedLoopJoin, which is the intended shape)."""
    from yacy_grid_crawler_spark.operators.textstats import dsir_weights

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(dsir_weights(docs, "src7"))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_mirror_pairs_is_equi_join(spark):
    """The host-pair self-join must shuffle on the shingle key — an
    equi-join, never a cartesian/nested-loop over hosts."""
    from yacy_grid_crawler_spark.operators.dedup_text import mirror_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        (F.col("doc_id") % 20).cast("string").alias("host"), "text"
    )
    caches = []
    plan = _plan(mirror_pairs(docs, cache_registry=caches))
    assert "CartesianProduct" not in plan
    for c in caches:
        c.unpersist()


def test_bm25_no_cartesian_jvm_only(spark):
    """BM25 keeps batch_search's join geometry: df-capped equi-joins
    plus the 1-row totals broadcast; no Python, no cartesian."""
    from yacy_grid_crawler_spark.operators.textstats import bm25_search

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    queries = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 30).alias("qtext"),
    )
    plan = _plan(bm25_search(docs, queries, k=5, df_cap=390))
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_budget_select_no_single_partition_window(spark):
    """The distributed prefix sum behind budget_select must keep its
    two-phase shape: the only SinglePartition window is over the
    P-row partition-offsets table (tiny by construction), never over
    the data; and the whole plan stays JVM-side."""
    from yacy_grid_crawler_spark.operators.sampling import budget_select

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).alias("n_tokens"),
        F.col("id").alias("_ord"),
    )
    caches = []
    plan = _plan(budget_select(docs, 10_000, cache_registry=caches))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # a SinglePartition exchange may appear only feeding the
    # partition-offsets aggregate (input = one row per partition);
    # the data path itself must be range-partitioned
    assert "rangepartitioning" in plan.lower()
    for c in caches:
        c.unpersist()


def test_prefix_filter_pairs_no_window_no_python(spark):
    """The prefix-filter join must avoid the single-partition global
    rank entirely (the rarest-first order is a per-doc sort_array,
    not a Window), keep every surface JVM-side, and never fall back
    to a cartesian product for the candidate or verify joins."""
    from yacy_grid_crawler_spark.operators.dedup_text import (
        prefix_filter_pairs,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta "),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    plan = _plan(prefix_filter_pairs(docs, threshold_bp=7000))
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan


def test_bucketed_seen_anti_join_drops_seen_side_exchange(spark, tmp_path):
    """The bucketed url_seen mirror must eliminate the seen-side
    shuffle from the D3 anti-join: with n_buckets == shuffle
    partitions, the plan keeps exactly one Exchange (probe side) and
    the bucketed scan feeds the ShuffledHashJoin directly. A plain
    parquet seen table shuffles BOTH sides — that re-shuffle of the
    static 10^10-row side every wave is what bucketing amortizes
    away."""
    from yacy_grid_crawler_spark.sources.bucketed import (
        anti_join_bucketed, write_bucketed,
    )

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    seen = spark.range(20000).select(
        F.md5(F.col("id").cast("string")).alias("url_id")
    )
    write_bucketed(
        seen, "t_seen_bucketed", str(tmp_path / "seen_b"), n_part
    )
    cand = spark.range(10000, 30000).select(
        F.md5(F.col("id").cast("string")).alias("url_id")
    )
    out = anti_join_bucketed(cand, spark, "t_seen_bucketed")
    plan = _plan(out)
    # exactly ONE Exchange node (the probe side): formatted plans list
    # each node once in the tree and once in the details section, so
    # the substring count must be exactly 1-2 — zero would mean the
    # probe stopped aligning with the bucket layout (wrong results
    # territory), three+ means the bucketed side re-shuffled
    assert 1 <= plan.count("Exchange") <= 2
    # the bucketed scan side must not be re-shuffled: no Exchange
    # between the parquet scan and the join (scan feeds join/filter
    # directly)
    assert "ShuffledHashJoin" in plan
    # semantics unchanged vs the plain anti-join
    plain = cand.join(seen, "url_id", "left_anti")
    assert out.exceptAll(plain).isEmpty()
    assert plain.exceptAll(out).isEmpty()
    spark.sql("DROP TABLE IF EXISTS t_seen_bucketed")


def test_bpe_doc_tokens_broadcasts_vocab_lookup(spark):
    """Tokenization under the induced vocab is a broadcast dictionary
    lookup: the per-word token-count side must broadcast (the corpus
    word explode never shuffles for it) and the whole surface stays
    JVM-side."""
    from yacy_grid_crawler_spark.operators.bpe import bpe_doc_tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    caches = []
    plan = _plan(bpe_doc_tokens(docs, k=4, cache_registry=caches))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    for c in caches:
        c.unpersist()


def test_bpe_pair_count_is_partial_agg_no_python(spark):
    """The per-round pair count must map-side combine (partial then
    final HashAggregate) with zero Python surfaces."""
    from yacy_grid_crawler_spark.operators.bpe import (
        _pair_counts,
        word_vocab,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(_pair_counts(word_vocab(docs)))
    assert "partial_" in plan  # map-side combine before the exchange
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_suffix_array_output_rank_stays_two_phase(spark):
    """The suffix array's final global ordering must ride the
    two-phase rank: range-partitioned data path, windows keyed by the
    physical partition id, no Python anywhere."""
    from yacy_grid_crawler_spark.operators.suffix import suffix_array

    docs = spark.range(50).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("txt"), F.md5(F.col("id").cast("string"))).alias("text"),
    )
    caches = []
    plan = _plan(suffix_array(docs, cache_registry=caches))
    assert "rangepartitioning" in plan.lower()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "Window [" in line and "row_number" in line:
            assert "_pid" in line, f"window not pid-local: {line[:120]}"
    for c in caches:
        c.unpersist()


def test_linear_classifier_broadcasts_weights(spark):
    """The hashed-feature weight lookup must broadcast (corpus side
    never shuffles for it) and the whole plan stays JVM-side."""
    from yacy_grid_crawler_spark.operators.textstats import (
        linear_classifier_score,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(linear_classifier_score(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
