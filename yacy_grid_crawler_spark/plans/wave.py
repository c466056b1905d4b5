"""One crawl wave = the Spark re-expression of the reference's
per-message `processAction` pipeline (CrawlerListener.java:191-448;
SURVEY.md §3.2).

Stage order preserves the reference's cost-ordered predicate chain
(cheap→expensive, CrawlerListener.java:302-356 + cost comments :338,
:349-352): parse → content-domain → in-wave dedup → seen anti-join →
mustmatch → blacklist → robots → persistent exist-check. Catalyst
cannot reorder across the UDF kernels, so pipeline construction order
IS the physical order (SURVEY.md §4).

Shuffle budget per wave (the scale analysis):
  1 shuffle: in-wave first-occurrence dedup (hash by url_id)
  1 shuffle: seen anti-join (url_id) — bloom pre-filter shrinks the
             probe side; seen table is bucketed by url_id at commit
  1 shuffle: canonical-order batching (range by order key when
             distributed=True)
Everything else is broadcast (profile regexes are literals; blacklist
hosts, robots rules broadcast) or narrow. Status/metrics derivation
reuses the persisted post-filter DataFrame — no recomputation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BATCH_SIZE
from ..functions.udfs import canonicalize
from ..operators.batching import (
    assign_batches,
    assign_lane,
    assign_shard,
    lineage_column,
    politeness_slots,
)
from ..operators.blacklist import BlacklistRule, apply_blacklist
from ..operators.dedup import dedup_against_seen, first_occurrence
from ..operators.filters import (
    content_domain_col,
    do_index_verdict,
    mustmatch_verdict,
    robots_verdict,
)

# canonical within-wave order of candidate links (SURVEY.md §5):
# parents in frontier canonical order, links in span-offset order
CANON_ORDER = ("parent_ini", "parent_batch_no", "parent_batch_pos", "span_offset")


@dataclass
class WaveResult:
    frontier: DataFrame
    status: DataFrame
    seen: DataFrame
    metrics: DataFrame


def run_wave(
    candidates: DataFrame,  # (parent_ini, parent_batch_no, parent_batch_pos, span_offset, url_raw)
    profile: dict,
    seen: DataFrame,  # url_seen rows for this crawl (crawl_id, url_id, ...)
    status_ids: DataFrame,  # (url_id) of ALL pre-existing crawl_status rows (D3, global)
    depth: int,
    blacklist: list[BlacklistRule] | None = None,
    robots: DataFrame | None = None,  # (host, disallow_prefixes, crawl_delay_ms)
    n_shards: int = 32,
    use_bloom: bool = False,
    distributed_rank: bool = False,
    hot_host_threshold: int | None = None,
    wave_start_ms: int = 0,
) -> WaveResult:
    spark = candidates.sparkSession
    crawl_id = profile["id"]
    user_id = profile.get("user_id", "anonymous")

    extracted = candidates.count()

    # P2 canonicalize + F6 malformed drop (Arrow kernel)
    c = candidates.withColumn("url", canonicalize(F.col("url_raw")))
    parsed = c.filter(F.col("url").isNotNull())
    # F1 content-domain: only TEXT|ALL ever reaches the seen-set
    # (CrawlerListener.java:304-315 order)
    after_f1 = (
        parsed.withColumn("_dom", content_domain_col(F.col("url")))
        .filter(F.col("_dom").isin("text", "all"))
        .drop("_dom")
        .withColumn("url_id", F.md5(F.col("url")))  # P3
        .withColumn("crawl_id", F.lit(crawl_id))
    )
    after_f1 = after_f1.persist()
    parsed_ok = parsed.count()
    n_after_f1 = after_f1.count()

    # D2: in-wave first occurrence (canonical winner) + cross-wave
    # anti-join against the committed seen set; novel rows are ADDED to
    # the seen set before any filter verdict (add-before-filter,
    # CrawlerListener.java:312-315) — i.e. seen_new = ALL novel rows,
    # rejected or not.
    in_wave = first_occurrence(after_f1, key="url_id", order=CANON_ORDER)
    novel = dedup_against_seen(
        in_wave, seen, key="url_id", crawl_col="crawl_id", use_bloom=use_bloom
    ).persist()
    n_novel = novel.count()
    deduped_session = n_after_f1 - n_novel

    # F2 mustmatch / mustnotmatch (anchored, JVM-side regex)
    mm_ok = mustmatch_verdict(
        F.col("url"), profile.get("mustmatch", ".*"), profile.get("mustnotmatch", "")
    )
    flagged = novel.withColumn("_mm_ok", mm_ok)
    passed_mm = flagged.filter(F.col("_mm_ok")).drop("_mm_ok")
    rejected_filter = flagged.filter(~F.col("_mm_ok")).drop("_mm_ok")

    # F3 blacklist (host broadcast + regex kernel) — run only on
    # mustmatch survivors, like the reference's chain order
    passed_mm = passed_mm.withColumn(
        "host", F.regexp_extract(F.col("url"), r"^[a-z]+://(?:[^/@]*@)?([^/:?]+)", 1)
    )
    bl = apply_blacklist(passed_mm, blacklist or [], out_col="_bl")
    rejected_blacklist = bl.filter(F.col("_bl")).drop("_bl")
    passed_bl = bl.filter(~F.col("_bl")).drop("_bl")

    # RB robots gate [north rule]
    if robots is not None:
        rb = robots_verdict(passed_bl, robots)
        rejected_robots = rb.filter(F.col("robots_blocked")).drop("robots_blocked")
        passed_rb = rb.filter(~F.col("robots_blocked")).drop("robots_blocked")
    else:
        rejected_robots = passed_bl.limit(0)
        passed_rb = passed_bl
    passed_rb = passed_rb.persist()

    # D3 persistent exist-check (bulk anti-join, CrawlerListener.java:360-365)
    kept = dedup_against_seen(
        passed_rb, status_ids, key="url_id", crawl_col=None, use_bloom=False
    )

    # F4 index/noindex steering + G1/G2/G3/G4 + politeness + lineage
    kept = kept.withColumn(
        "do_index",
        do_index_verdict(
            F.col("url"),
            profile.get("indexmustmatch", ".*"),
            profile.get("indexmustnotmatch", ""),
        ),
    )
    kept = assign_lane(kept, profile.get("priority", 0))
    kept = assign_batches(kept, order=CANON_ORDER, batch_size=BATCH_SIZE,
                          distributed=distributed_rank)
    kept = assign_shard(kept, n_shards, hot_host_threshold=hot_host_threshold)
    kept = politeness_slots(kept, robots, wave_start_ms=wave_start_ms)
    kept = (
        kept.withColumn("depth", F.lit(depth))
        .withColumn("lineage", lineage_column())
        .persist()
    )

    frontier = kept.select(
        "crawl_id", "url", "url_id", "depth", "lane", "do_index",
        "batch_no", "batch_pos", "host", "shard", "salt", "fetch_slot",
        "not_before_ms", "lineage",
    )

    def status_rows(df: DataFrame, status: str, comment: str) -> DataFrame:
        return df.select(
            F.lit(crawl_id).alias("crawl_id"),
            F.lit(user_id).alias("user_id"),
            "url_id",
            "url",
            F.lit(status).alias("status"),
            F.lit(comment).alias("comment_class"),
            F.lit(depth).alias("depth"),
            F.lit(profile.get("start_url")).alias("start_url"),
            F.lit(profile.get("start_ssld")).alias("start_ssld"),
        )

    status = (
        status_rows(rejected_filter, "rejected", "filter")
        .unionByName(status_rows(rejected_blacklist, "rejected", "blacklist"))
        .unionByName(status_rows(rejected_robots, "rejected", "robots"))
        .unionByName(
            kept.select(
                "crawl_id",
                F.lit(user_id).alias("user_id"),
                "url_id",
                "url",
                F.lit("accepted").alias("status"),
                F.when(F.col("do_index"), "index").otherwise("noindex").alias("comment_class"),
                F.lit(depth).alias("depth"),
                F.lit(profile.get("start_url")).alias("start_url"),
                F.lit(profile.get("start_ssld")).alias("start_ssld"),
            )
        )
    )

    seen_new = novel.select(
        "crawl_id", "url_id", F.lit(depth).alias("first_depth")
    )

    n_rej_filter = rejected_filter.count()
    n_rej_bl = rejected_blacklist.count()
    n_rej_rb = rejected_robots.count()
    n_passed_rb = passed_rb.count()
    n_kept = kept.count()
    n_idx = kept.filter(F.col("do_index")).count()
    metrics = spark.createDataFrame(
        [
            (
                crawl_id,
                depth,
                extracted,
                parsed_ok,
                deduped_session,
                n_passed_rb - n_kept,
                n_rej_filter,
                n_rej_bl,
                n_rej_rb,
                n_kept,
                n_idx,
            )
        ],
        "crawl_id string, depth int, extracted long, parsed_ok long, "
        "deduped_session long, deduped_persistent long, rejected_filter long, "
        "rejected_blacklist long, rejected_robots long, accepted long, do_index long",
    )
    after_f1.unpersist()
    return WaveResult(frontier=frontier, status=status, seen=seen_new, metrics=metrics)
