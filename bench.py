#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): frontier throughput — URLs
scheduled+deduped per second through the full wave pipeline
(canonicalize → dedup → filters → anti-join → batch → politeness) on a
deterministic synthetic frontier with Zipf-ish host skew.

Also times the headline `__spark_entry__` queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "frontier_urls_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ...,
   "crawl": {...}, "scaling": {...when SPARK_GRAFT_SCALING=1...}}

Scaling evidence (BASELINE.md sandbox plan): SPARK_GRAFT_SCALING=1
re-runs the identical crawl at local[8] and local[32] (shuffle
partitions matched to cores) and reports efficiency = (T8/T32)/4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))
BENCH_QUERIES = [
    "crawl_bfs_seen",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "token_count",
    "events_sessionize",
]


def crawl_bench(cores: int, n_docs: int) -> dict:
    """Full crawl (depth 2) over the synthetic spans corpus; returns
    urls/sec where urls = candidate links pushed through the pipeline."""
    from pyspark.sql import functions as F

    from yacy_grid_crawler_spark.plans.crawl_job import CrawlJob
    from yacy_grid_crawler_spark.session import get_spark
    from yacy_grid_crawler_spark.sources.synth import synth_docs

    spark = get_spark(app=f"bench-crawl-{cores}", cores=cores, shuffle_partitions=cores)
    t_gen = time.time()
    docs = synth_docs(spark, n_docs).persist()
    docs.count()  # materialize generation outside the timed window
    gen_s = time.time() - t_gen

    store = tempfile.mkdtemp(prefix="bench_store_")
    job = CrawlJob(
        spark,
        store,
        docs,
        n_shards=cores,
        distributed_rank=True,
        hot_host_threshold=max(n_docs // 50, 1000),
    )
    # seed with a real page URL of the synthetic corpus (page 0)
    seed = docs.filter(F.col("doc_id").endswith("/page/0.html")).first()["doc_id"]
    t0 = time.time()
    cids = job.start(seed, {"crawlingDepth": 2})
    job.run(cids)
    elapsed = time.time() - t0
    m = (
        job.store.read("crawl_metrics")
        .agg(
            F.sum("extracted").alias("extracted"),
            F.sum("accepted").alias("accepted"),
            F.sum("deduped_session").alias("deduped"),
        )
        .collect()[0]
    )
    out = {
        "cores": cores,
        "n_docs": n_docs,
        "gen_sec": round(gen_s, 2),
        "crawl_sec": round(elapsed, 2),
        "urls_extracted": m["extracted"],
        "urls_accepted": m["accepted"],
        "urls_deduped": m["deduped"],
        "urls_per_sec": round(m["extracted"] / elapsed, 1),
    }
    docs.unpersist()
    spark.stop()
    shutil.rmtree(store, ignore_errors=True)
    return out


def query_bench(cores: int) -> dict:
    import __spark_entry__ as entry

    from yacy_grid_crawler_spark.session import get_spark

    spark = get_spark(app="bench-queries", cores=cores, shuffle_partitions=cores)
    q = entry.queries()
    times = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        q[name](spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)
    spark.stop()
    return times


def main() -> None:
    queries = query_bench(CPUS)
    crawl = crawl_bench(CPUS, N_DOCS)
    result = {
        "metric": "frontier_urls_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "crawl": crawl,
    }
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        lo = crawl_bench(8, N_DOCS)
        hi = crawl if CPUS == 32 else crawl_bench(32, N_DOCS)
        eff = (lo["crawl_sec"] / hi["crawl_sec"]) / (32 / 8)
        result["scaling"] = {
            "local8": lo,
            "local32": hi,
            "efficiency": round(eff, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
