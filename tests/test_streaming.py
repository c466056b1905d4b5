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
