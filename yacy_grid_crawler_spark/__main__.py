"""spark-submit entry point — the crawlStart parameter surface as a CLI.

The reference exposes crawl starts over REST
(`GET /yacy/grid/crawler/crawlStart.json?crawlingURL=…&crawlingDepth=…`,
CrawlStartService.java:73-94) and profile defaults over
`defaultValues.json` (CrawlerDefaultValuesService.java:81-95). An
analytics engine has no REST layer (SURVEY.md §3.3); this module
reproduces the same parameter surface — typed coercion, the ≤8 depth
clamp, the multi-separator seed splitter — as a thin CLI:

    spark-submit --py-files engine.zip -m yacy_grid_crawler_spark \
        --docs /data/documents.parquet \
        --store /data/crawl_store \
        --crawling-url 'http://a.com|http://b.org' \
        --crawling-depth 3 \
        --profile-json extra.json \
        --blacklist rules.txt \
        --robots /data/robots.parquet

    python -m yacy_grid_crawler_spark --default-values   # profile defaults

Exit: prints one JSON line per action (crawl ids, wave metrics
summary), mirroring the reference's SusiThought JSON responses.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="yacy_grid_crawler_spark",
        description="PySpark-native URL frontier / crawl scheduler",
    )
    ap.add_argument("--docs", help="path of documents(doc_id, spans)")
    ap.add_argument(
        "--docs-format",
        choices=["parquet", "jsonlist"],
        default="parquet",
        help="'jsonlist' reads the reference's NDJSON graph-asset "
        "format (JSONList, directive lines skipped)",
    )
    ap.add_argument("--store", help="state-store root directory")
    ap.add_argument(
        "--crawling-url",
        help="seed URL list (separators: | %%7C %%0D%%0A %%0A %%0D space — "
        "CrawlerListener.java:117)",
    )
    ap.add_argument(
        "--crawling-depth", type=int, default=None, help="BFS depth (clamped to 8)"
    )
    ap.add_argument("--mustmatch", default=None)
    ap.add_argument("--mustnotmatch", default=None)
    ap.add_argument("--indexmustmatch", default=None)
    ap.add_argument("--indexmustnotmatch", default=None)
    ap.add_argument("--priority", type=int, default=None)
    ap.add_argument("--user-id", default=None)
    ap.add_argument(
        "--profile-json", help="JSON file of additional profile overrides"
    )
    ap.add_argument(
        "--blacklist",
        help="crawler blacklist file(s), comma-separated like the "
        "reference's grid.crawler.blacklist (reference file format)",
    )
    ap.add_argument(
        "--indexer-blacklist",
        default="default",
        help="indexer blacklist file(s), comma-separated like "
        "grid.indexer.blacklist — matches go to the noindex lane "
        "but are still crawled (CrawlerListener.java:374-384). "
        "'default' (the default) mirrors the reference's shipped "
        "filetype list (xml/css/js/robots.txt); 'none' disables",
    )
    ap.add_argument(
        "--robots", help="parquet of robots(host, disallow_prefixes, crawl_delay_ms)"
    )
    ap.add_argument(
        "--robots-bodies",
        help="parquet of RAW robots.txt bodies (host, robots_txt) — "
        "parsed into the rules dim by operators.robots.parse_robots; "
        "mutually exclusive with --robots",
    )
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--n-shards", type=int, default=32)
    ap.add_argument("--use-bloom", action="store_true")
    ap.add_argument(
        "--checkpoint-filters", action="store_true",
        help="persist per-crawl seen blooms in the snapshot and probe "
             "them next wave (north-star checkpointed filters)",
    )
    ap.add_argument(
        "--bucketed-seen", choices=["auto", "on", "off"], default="auto",
        help="maintain url_seen/crawl_status as url_id-bucketed "
             "catalog tables so the per-wave dedup anti-joins skip "
             "the seen-side shuffle (measured 5.9x at 50M seen rows; "
             "O(delta) upkeep per wave, auto-rebuild on resume). "
             "Default 'auto' turns the mirror on once url_seen "
             "outgrows 128 MB on disk",
    )
    ap.add_argument(
        "--max-wave-urls", type=int, default=None,
        help="wave-size cap / backpressure: consume at most N candidate "
             "URLs per wave, carry the remainder to the next wave of "
             "the same depth (reference throttle: 100k queued messages, "
             "conf/config.properties)",
    )
    ap.add_argument(
        "--compact-every", type=int, default=16,
        help="run store maintenance (compaction + snapshot expiry) "
             "every N waves; 0 disables",
    )
    ap.add_argument(
        "--resume", action="store_true", help="resume the store's crawls instead of seeding"
    )
    ap.add_argument(
        "--default-values",
        action="store_true",
        help="print the profile defaults (defaultValues.json surface) and exit",
    )
    ap.add_argument(
        "--analyze", metavar="QUERY", default=None,
        help="run one analytics query from the __spark_entry__ registry "
             "against --sf-dir parquet tables and print its rows as one "
             "JSON line (repo-checkout convenience; the registry module "
             "lives at the repo root)",
    )
    ap.add_argument(
        "--sf-dir", default=None,
        help="directory holding the parquet tables --analyze reads "
             "(documents/embeddings/events/...)",
    )
    ap.add_argument(
        "--analyze-limit", type=int, default=20,
        help="max rows printed by --analyze",
    )
    ap.add_argument(
        "--list-queries", action="store_true",
        help="print the registry's query names and exit",
    )
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .config import DEFAULT_PROFILE

    if args.default_values:
        print(json.dumps(DEFAULT_PROFILE, sort_keys=True))
        return 0

    if args.list_queries or args.analyze:
        import importlib

        try:
            entry = importlib.import_module("__spark_entry__")
        except ImportError:
            print(
                json.dumps({
                    "success": False,
                    "error": "__spark_entry__ not importable — run from "
                             "the repo checkout (registry lives at the "
                             "repo root)",
                }),
                file=sys.stderr,
            )
            return 2
        registry = entry.queries()
        if args.list_queries:
            print(json.dumps({"queries": sorted(registry)}))
            return 0
        fn = registry.get(args.analyze)
        if fn is None or not args.sf_dir:
            print(
                json.dumps({
                    "success": False,
                    "error": (
                        f"unknown query {args.analyze!r}"
                        if fn is None else "--analyze needs --sf-dir"
                    ),
                }),
                file=sys.stderr,
            )
            return 2
        from .session import get_spark

        spark = get_spark(cores=args.cores)
        df = fn(spark, args.sf_dir)
        rows = [
            r.asDict(recursive=True)
            for r in df.limit(args.analyze_limit).collect()
        ]
        print(
            json.dumps(
                {"success": True, "query": args.analyze, "rows": rows},
                default=str,
            )
        )
        return 0

    if not (args.docs and args.store) or not (args.crawling_url or args.resume):
        print(
            json.dumps({"success": False, "error": "need --docs, --store and "
                        "(--crawling-url or --resume)"}),
            file=sys.stderr,
        )
        return 2

    from .operators.blacklist import load_files
    from .plans.crawl_job import CrawlJob
    from .session import get_spark

    spark = get_spark(app="crawl-cli", cores=args.cores)
    if args.docs_format == "jsonlist":
        from .sources.jsonlist import read_jsonlist

        docs = read_jsonlist(spark, args.docs)
    else:
        docs = spark.read.parquet(args.docs)
    if args.robots and args.robots_bodies:
        ap_err = "pass either --robots or --robots-bodies, not both"
        raise SystemExit(ap_err)
    if args.robots_bodies:
        from .operators.robots import parse_robots

        robots = parse_robots(spark.read.parquet(args.robots_bodies))
    else:
        robots = spark.read.parquet(args.robots) if args.robots else None
    import os as _os

    def _bl_files(arg: str | None) -> list:
        # a real file wins over comma-splitting, so a path containing
        # a comma still loads (the split mirrors the reference's
        # comma-separated grid.*.blacklist config values)
        if arg and _os.path.exists(arg):
            return load_files([arg])
        paths = [p.strip() for p in (arg or "").split(",") if p.strip()]
        return load_files(paths) if paths else []

    blacklist = _bl_files(args.blacklist)
    # an actual file named 'default'/'none' beats the sentinels
    if args.indexer_blacklist == "default" and not _os.path.exists("default"):
        from .operators.blacklist import default_indexer_rules

        indexer_blacklist = default_indexer_rules()
    elif args.indexer_blacklist == "none" and not _os.path.exists("none"):
        indexer_blacklist = []
    else:
        indexer_blacklist = _bl_files(args.indexer_blacklist)

    import time

    job = CrawlJob(
        spark,
        args.store,
        docs,
        blacklist=blacklist,
        indexer_blacklist=indexer_blacklist,
        robots=robots,
        n_shards=args.n_shards,
        use_bloom=args.use_bloom,
        distributed_rank="auto",
        checkpoint_filters=args.checkpoint_filters,
        max_wave_urls=args.max_wave_urls,
        bucketed_seen={"auto": "auto", "on": True, "off": False}[
            args.bucketed_seen
        ],
        # production clock: real loader timestamps in lineage docnames
        # and politeness not_before_ms (CrawlerListener.java:497-503)
        clock=lambda: int(time.time() * 1000),
    )

    if args.resume:
        job.resume()
        print(json.dumps({"success": True, "resumed": True,
                          "version": job.store.current_version()}))
        return 0

    overrides: dict = {}
    if args.profile_json:
        with open(args.profile_json) as fh:
            overrides.update(json.load(fh))
    for key, val in (
        ("crawlingDepth", args.crawling_depth),
        ("mustmatch", args.mustmatch),
        ("mustnotmatch", args.mustnotmatch),
        ("indexmustmatch", args.indexmustmatch),
        ("indexmustnotmatch", args.indexmustnotmatch),
        ("priority", args.priority),
        ("user_id", args.user_id),
    ):
        if val is not None:
            overrides[key] = val

    cids = job.start(args.crawling_url, overrides)
    job.run(cids, compact_every=args.compact_every)
    metrics = {
        r["crawl_id"]: {"extracted": r["extracted"], "accepted": r["accepted"]}
        for r in job.store.read("crawl_metrics")
        .groupBy("crawl_id")
        .agg(
            {"extracted": "sum", "accepted": "sum"}
        )
        .withColumnRenamed("sum(extracted)", "extracted")
        .withColumnRenamed("sum(accepted)", "accepted")
        .collect()
    }
    print(json.dumps({"success": True, "crawl_ids": cids, "metrics": metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
