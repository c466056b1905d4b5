"""Structured Streaming frontier variant: stateful first-seen dedup
over a file-source candidate stream."""

import pytest
from pyspark.sql import functions as F


def test_stream_dedup_first_seen(spark, tmp_path):
    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        CANDIDATE_SCHEMA,
        run_stream_to_memory,
    )

    src = str(tmp_path / "stream_src")
    batch1 = [
        ("c1", "HTTP://A.example/x#f", 0, 0),
        ("c1", "http://a.example/x", 1, 1),  # dup after canonicalization
        ("c1", "http://b.example/y", 1, 2),
        ("c2", "http://a.example/x", 0, 3),  # different crawl → novel
        ("c1", "not a url", 1, 4),  # malformed → dropped
    ]
    # second micro-batch: state must carry — a.example/x already seen
    batch2 = [
        ("c1", "http://a.example/x", 2, 5),  # cross-batch dup
        ("c1", "http://c.example/z", 2, 6),  # novel
    ]
    spark.createDataFrame(batch1, CANDIDATE_SCHEMA).coalesce(1).write.parquet(
        src + "/f1"
    )
    spark.createDataFrame(batch2, CANDIDATE_SCHEMA).coalesce(1).write.parquet(
        src + "/f2"
    )
    out = run_stream_to_memory(
        spark, src + "/*", "t_stream_out", max_files_per_trigger=1
    ).collect()
    got = {(r["crawl_id"], r["url"]) for r in out}
    assert got == {
        ("c1", "http://a.example/x"),
        ("c1", "http://b.example/y"),
        ("c2", "http://a.example/x"),
        ("c1", "http://c.example/z"),
    }
    assert len(out) == len(got)  # no double emission across batches


class _FakeState:
    """Minimal GroupState stand-in for unit-driving the state fn."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def test_bounded_state_size_is_constant():
    """State payload is O(filter bytes): its size depends only on the
    configured capacity, never on how many ids the crawl has seen."""
    import pandas as pd

    from yacy_grid_crawler_spark.functions.bloom import UrlBloom, to_bytes
    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        _make_bounded_dedup_fn,
    )

    import hashlib

    cap = 10_000
    expected = len(to_bytes(UrlBloom(cap, fpp=0.01)))
    fn = _make_bounded_dedup_fn(ttl=False, capacity=cap, fpp=0.01)
    state = _FakeState()
    for n in (10, 1000, 5000):  # growing seen set, constant state size
        pdf = pd.DataFrame(
            {
                "crawl_id": ["c1"] * n,
                "url": [f"http://h/{i}-{n}" for i in range(n)],
                "url_id": [
                    hashlib.md5(f"http://h/{i}-{n}".encode()).hexdigest()
                    for i in range(n)
                ],
                "depth": [1] * n,
            }
        )
        list(fn(("c1",), iter([pdf]), state))
        assert len(bytes(state.get[0])) == expected


def test_bounded_stream_dedup_matches_batch_operator(spark, tmp_path):
    """frontier_stream_bounded + resolve_suspects inside foreachBatch
    must produce the exact novel set the batch dedup operators produce
    on the same input — the bloom bounds the STATE, never the result."""
    import pandas as pd

    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        CANDIDATE_SCHEMA,
        frontier_stream_bounded,
        read_candidate_stream,
        resolve_suspects,
    )

    rows = []
    # 6 files × 40 urls with heavy cross-file duplication
    for f in range(6):
        for i in range(40):
            u = f"http://host{i % 4}.example/p{(i * 7 + f * 13) % 60}"
            rows.append(("c1", u, f, f * 100 + i))
            if i % 5 == 0:  # in-file duplicate
                rows.append(("c1", u, f, f * 100 + i))
    src = str(tmp_path / "bounded_src")
    for f in range(6):
        spark.createDataFrame(
            [r for r in rows if r[2] == f], CANDIDATE_SCHEMA
        ).coalesce(1).write.parquet(f"{src}/f{f}")

    committed = {"df": spark.createDataFrame([], "crawl_id string, url_id string")}
    novel_urls = []

    def sink(batch_df, batch_id):
        resolved = resolve_suspects(batch_df, committed["df"]).cache()
        new = [(r["crawl_id"], r["url"], r["url_id"]) for r in resolved.collect()]
        novel_urls.extend((c, u) for c, u, _ in new)
        committed["df"] = committed["df"].unionByName(
            spark.createDataFrame(
                [(c, i) for c, _, i in new], "crawl_id string, url_id string"
            )
        )

    q = (
        frontier_stream_bounded(
            read_candidate_stream(spark, src + "/*", max_files_per_trigger=1),
            capacity=100_000,
            ttl=False,  # availableNow drain (see frontier_stream TTL caveat)
        )
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    expected = {("c1", u) for _, u, _, _ in rows}
    assert set(novel_urls) == expected
    assert len(novel_urls) == len(expected), "duplicate emission"


def test_host_rate_stream_watermark_windows(spark, tmp_path):
    """Windowed per-host rates with late-data handling: append mode
    emits only watermark-finalized windows; a row later than the
    watermark is dropped, one within it still lands in its window."""
    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        CANDIDATE_SCHEMA,
        run_host_rate_to_memory,
    )

    src = str(tmp_path / "rate_src")
    m = 60_000  # 1-minute windows in ms
    batch1 = [
        ("c1", "http://a.example/1", 0, 0 * m),
        ("c1", "http://a.example/2", 0, 0 * m + 30_000),
        ("c1", "http://a.example/2", 0, 0 * m + 40_000),  # dup url
        ("c1", "http://b.example/1", 0, 1 * m),
    ]
    # batch 2 advances event time far enough that the watermark
    # (max_event - 120 s = 8 m) passes the first windows' ends;
    # batch 3 lets the lagged watermark take effect so [0,1)/[1,2)
    # are evicted+emitted BEFORE the late row arrives (Spark's late
    # drop is guaranteed only once the window state is finalized)
    batch2 = [("c1", "http://a.example/3", 0, 10 * m)]
    batch3 = [("c1", "http://a.example/5", 0, 10 * m + 1000)]
    # batch 4 arrives AFTER windows [0,2) were finalized: a 0-minute
    # event is late -> dropped, never counted in window [0, 1)
    batch4 = [("c1", "http://a.example/4", 0, 0 * m + 50_000)]
    import os

    for idx, (name, batch) in enumerate(
        (("f1", batch1), ("f2", batch2), ("f3", batch3), ("f4", batch4))
    ):
        spark.createDataFrame(
            batch, CANDIDATE_SCHEMA
        ).coalesce(1).write.parquet(f"{src}/{name}")
        # FileStreamSource orders files by mtime; back-to-back writes
        # can tie (or invert) — pin strictly increasing mtimes so the
        # maxFilesPerTrigger=1 drain sees f1 -> f2 -> f3.
        t = 1_000_000_000 + idx * 60
        for root, _dirs, files in os.walk(f"{src}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    out = run_host_rate_to_memory(
        spark, src + "/f1", "t_rate_1", window_sec=60, watermark_sec=120
    ).collect()
    # single availableNow drain of f1 only: watermark ends at
    # 1 m - 120 s < 0, so nothing is finalized yet
    assert out == []
    out2 = run_host_rate_to_memory(
        spark, src + "/*", "t_rate_2", window_sec=60, watermark_sec=120,
        max_files_per_trigger=1,
    ).collect()
    keys = [(r["window_start"].minute, r["host"]) for r in out2]
    assert len(keys) == len(set(keys)), "duplicate (window, host) emission"
    rows = {
        (r["window_start"].minute, r["host"]): (
            r["n_candidates"],
            r["n_unique"],
        )
        for r in out2
    }
    # windows [0,1) and [1,2) are finalized by the 10-minute events;
    # [10,11) is still open (watermark = ~8 m) and must NOT emit; the
    # late 50 s row is dropped, not counted and not re-emitted
    assert rows[(0, "a.example")] == (3, 2)
    assert rows[(1, "b.example")] == (1, 1)
    assert all(start != 10 for (start, _h) in rows)


def test_default_stream_is_bounded_with_ttl():
    """Round-3 verdict ask #4: the DEFAULT streaming dedup variant
    must be the bounded-state one with the 7-day TTL armed. Unit-drive
    the state fn: normal pass arms SEEN_TTL_MS; a timed-out group is
    swept (state removed, nothing emitted)."""
    import hashlib

    import pandas as pd

    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        SEEN_TTL_MS,
        _make_bounded_dedup_fn,
    )

    assert SEEN_TTL_MS == 7 * 24 * 3600 * 1000

    class _TtlState(_FakeState):
        def __init__(self):
            super().__init__()
            self.timeout_ms = None

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    fn = _make_bounded_dedup_fn(ttl=True, capacity=1000, fpp=0.01)
    state = _TtlState()
    pdf = pd.DataFrame(
        {
            "crawl_id": ["c1"],
            "url": ["http://h/x"],
            "url_id": [hashlib.md5(b"http://h/x").hexdigest()],
            "depth": [0],
        }
    )
    out = list(fn(("c1",), iter([pdf]), state))
    assert len(out) == 1 and len(out[0]) == 1
    assert state.exists
    assert state.timeout_ms == SEEN_TTL_MS  # 7-day sweep armed

    # TTL expiry: the group's state is dropped wholesale, no output
    state.hasTimedOut = True
    out = list(fn(("c1",), iter([]), state))
    assert out == []
    assert not state.exists


def test_run_stream_to_memory_default_matches_exact(spark, tmp_path):
    """The default (bounded + resolve) drain returns the same exact
    novel set as the legacy exact-state variant on the same input."""
    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        CANDIDATE_SCHEMA,
        run_stream_to_memory,
    )

    rows = []
    for f in range(3):
        for i in range(30):
            u = f"http://host{i % 3}.example/q{(i * 5 + f * 11) % 40}"
            rows.append(("c1", u, f, f * 100 + i))
    src = str(tmp_path / "default_src")
    for f in range(3):
        spark.createDataFrame(
            [r for r in rows if r[2] == f], CANDIDATE_SCHEMA
        ).coalesce(1).write.parquet(f"{src}/f{f}")

    bounded = run_stream_to_memory(
        spark, src + "/*", "t_def_bounded", max_files_per_trigger=1
    )
    exact = run_stream_to_memory(
        spark, src + "/*", "t_def_exact", max_files_per_trigger=1,
        state="exact",
    )
    key = lambda r: (r["crawl_id"], r["url"], r["url_id"])
    assert sorted(map(key, bounded.collect())) == sorted(
        map(key, exact.collect())
    )
    assert bounded.count() == len({u for _, u, _, _ in rows})


def test_ttl_armed_drain_terminates_via_idle_stop(spark, tmp_path):
    """Round-4 verdict task 6: with the 7-day TTL armed, an
    availableNow drain never self-terminates (ProcessingTimeTimeout
    keeps scheduling sweep batches — the measured gotcha), so the
    ttl=True drain must stop via drain_until_idle AND return the same
    exact novel set as the ttl=False drain."""
    import time

    from yacy_grid_crawler_spark.streaming.frontier_stream import (
        CANDIDATE_SCHEMA,
        run_stream_to_memory,
    )

    rows = []
    for f in range(2):
        for i in range(20):
            u = f"http://h{i % 4}.example/p{(i * 3 + f * 7) % 25}"
            rows.append(("c1", u, f, f * 100 + i))
    src = str(tmp_path / "ttl_src")
    for f in range(2):
        spark.createDataFrame(
            [r for r in rows if r[2] == f], CANDIDATE_SCHEMA
        ).coalesce(1).write.parquet(f"{src}/f{f}")

    t0 = time.time()
    with_ttl = run_stream_to_memory(
        spark, src + "/*", "t_ttl_on", max_files_per_trigger=1, ttl=True
    )
    elapsed = time.time() - t0
    assert elapsed < 240, f"ttl-armed drain did not idle-stop ({elapsed:.0f}s)"
    without = run_stream_to_memory(
        spark, src + "/*", "t_ttl_off", max_files_per_trigger=1
    )
    key = lambda r: (r["crawl_id"], r["url"], r["url_id"])
    assert sorted(map(key, with_ttl.collect())) == sorted(
        map(key, without.collect())
    )
    assert with_ttl.count() == len({u for _, u, _, _ in rows})
