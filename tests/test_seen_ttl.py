"""Batch-path 7-day seen TTL (the reference's double-cache sweep,
CrawlerListener.java:84-85, 96-108): url_seen rows older than
SEEN_TTL_DAYS are expired during CrawlJob.maintain(); a URL first seen
before the cutoff is re-evaluated (fresh url_seen row) on its next
encounter, one seen within the TTL is not; the persistent status table
still guards the frontier — so the final frontier/status equal a
no-TTL control run, exactly like the reference's exist-check after its
double cache forgets."""

import pytest
from pyspark.sql import functions as F

from yacy_grid_crawler_spark.plans.crawl_job import CrawlJob

DAY_MS = 86_400_000
T0 = 1_600_000_000_000


def _mk_job(spark, root, corpus, docs_df, robots_df, clock, **kw):
    from yacy_grid_crawler_spark.fixtures.gen import blacklist_lines
    from yacy_grid_crawler_spark.operators.blacklist import parse_lines

    return CrawlJob(
        spark, root, docs_df,
        blacklist=parse_lines(blacklist_lines(corpus)),
        robots=robots_df, n_shards=8, clock=clock, **kw,
    )


@pytest.mark.parametrize("ckpt", [False, True])
def test_seen_ttl_expires_old_rows_only(
    spark, corpus, docs_df, robots_df, tmp_path_factory, ckpt
):
    seed = corpus.seeds[0]
    # wave clock: depths 0-2 at T0, depth 3 at T0+6d, depth 4 at T0+8d
    times = [T0, T0, T0, T0 + 6 * DAY_MS, T0 + 8 * DAY_MS, T0 + 8 * DAY_MS]
    it = iter(times)
    root = str(tmp_path_factory.mktemp(f"ttl_{ckpt}"))
    job = _mk_job(
        spark, root, corpus, docs_df, robots_df,
        clock=lambda: next(it), checkpoint_filters=ckpt,
    )
    (cid,) = job.start(seed, {"crawlingDepth": 4})
    assert job.step(cid)  # depth 0 @ T0
    assert job.step(cid)  # depth 1 @ T0
    assert job.step(cid)  # depth 2 @ T0
    assert job.step(cid)  # depth 3 @ T0+6d

    def seen_rows(j):
        return {
            r["url_id"]: (r["first_depth"], r["seen_at_ms"])
            for r in j.store.read("url_seen")
            .filter(F.col("crawl_id") == cid).collect()
        }

    before = seen_rows(job)
    old_ids = {u for u, (_, t) in before.items() if t == T0}
    fresh_ids = {u for u, (_, t) in before.items() if t == T0 + 6 * DAY_MS}
    assert before == {**{u: before[u] for u in old_ids},
                      **{u: before[u] for u in fresh_ids}}
    assert old_ids and fresh_ids

    # sweep at T0+8d with the default 7-day TTL: depth-0..2 rows (8d
    # old) expire, depth-3 rows (2d old) survive
    job.maintain(now_ms=T0 + 8 * DAY_MS)
    after_sweep = seen_rows(job)
    assert set(after_sweep) == fresh_ids
    if ckpt:
        # the crawl's checkpointed filter was invalidated with its rows
        assert cid not in job._seen_filters
        assert cid not in job.store.manifest()["meta"].get("seen_filters", {})

    # depth-4 wave @ T0+8d: expired URLs that are re-linked re-enter D2
    # (fresh seen_at), surviving rows are NOT re-stamped
    job.step(cid)
    final = seen_rows(job)
    re_evaluated = {
        u for u in old_ids
        if u in final and final[u][1] == T0 + 8 * DAY_MS
    }
    assert re_evaluated, "no expired URL was re-encountered at depth 4"
    for u in fresh_ids:
        assert final[u][1] == T0 + 6 * DAY_MS, "within-TTL row was re-stamped"

    # frontier/status equality vs a control run with the same clock but
    # no TTL sweep: the status table still guards the frontier
    it2 = iter(times)
    root2 = str(tmp_path_factory.mktemp(f"ttl_ctl_{ckpt}"))
    ctl = _mk_job(
        spark, root2, corpus, docs_df, robots_df,
        clock=lambda: next(it2), checkpoint_filters=ckpt,
    )
    (cid2,) = ctl.start(seed, {"crawlingDepth": 4})
    ctl.run([cid2], compact_every=0)

    def table(j, c, t, cols):
        return sorted(
            tuple(r[x] for x in cols)
            for r in j.store.read(t).filter(F.col("crawl_id") == c).collect()
        )

    fcols = ("depth", "do_index", "batch_no", "batch_pos", "url_id",
             "fetch_slot", "not_before_ms")
    assert table(job, cid, "frontier", fcols) == table(ctl, cid2, "frontier", fcols)
    # status compared as a SET: a post-TTL re-encounter of a rejected
    # URL appends a second, identical status row — the reference's ES
    # index upserts by url_id, so the doc set is the equality surface
    scols = ("url_id", "status", "comment_class")
    assert set(table(job, cid, "crawl_status", scols)) == set(
        table(ctl, cid2, "crawl_status", scols)
    )


def test_seen_ttl_inert_without_clock(
    spark, corpus, docs_df, robots_df, tmp_path_factory
):
    """Default (no injected clock): seen_at_ms is 0 and the sweep's
    cutoff is negative — maintain() must never expire anything."""
    seed = corpus.seeds[0]
    root = str(tmp_path_factory.mktemp("ttl_noclock"))
    job = _mk_job(spark, root, corpus, docs_df, robots_df, clock=None)
    (cid,) = job.start(seed, {"crawlingDepth": 2})
    job.run([cid], compact_every=0)
    n0 = job.store.read("url_seen").count()
    assert n0 > 0
    job.maintain()
    assert job.store.read("url_seen").count() == n0


def test_adaptive_recrawl_intervals_track_change_rate(spark):
    """A URL that changed on every fetch keeps the base interval; one
    that never changed stretches it by n_fetches; next_due anchors on
    the LAST fetch."""
    from yacy_grid_crawler_spark.sources.statestore import adaptive_recrawl

    hist = spark.createDataFrame(
        [
            # u1: 3 fetches, 3 distinct versions -> base interval
            ("u1", 100, "a"), ("u1", 200, "b"), ("u1", 300, "c"),
            # u2: 4 fetches, 1 version -> 4x base
            ("u2", 10, "x"), ("u2", 20, "x"), ("u2", 30, "x"), ("u2", 40, "x"),
            # u3: 2 fetches, 2 versions but same hash seen twice later
            ("u3", 5, "p"), ("u3", 6, "q"), ("u3", 7, "p"),
        ],
        "url_id string, fetch_ts_ms long, content_md5 string",
    )
    out = {
        r["url_id"]: (r["n_fetches"], r["n_changes"], r["interval_ms"],
                      r["next_due_ms"])
        for r in adaptive_recrawl(hist, base_interval_ms=1000).collect()
    }
    assert out == {
        "u1": (3, 3, 1000, 1300),
        "u2": (4, 1, 4000, 4040),
        "u3": (3, 2, 1500, 1507),
    }
