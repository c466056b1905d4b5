"""Bounded seen-filter folds (round-4 verdict task 5).

The old bloom/cuckoo builds collected one FULL-SIZE bitmap per
partition at the driver — ~12 GB × n_partitions at the 10^10-URL
design point. Two fixes under test here:

* tree fold: `build_from_spark`/`fold_into` OR/merge the per-partition
  payloads executor-side (treeReduce), driver receives O(fan-in);
* sharded store: `ShardedBloomStore` splits the id space by digest
  prefix — each shard's bitmap built complete by one task (no fold at
  all), probed by loading only the shards a partition routes to.

Correctness contract in both: False is exact (zero false negatives),
True may be a false positive for the exact anti-join to resolve.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from yacy_grid_crawler_spark.functions.bloom import (
    ShardedBloomStore,
    UrlBloom,
    build_from_spark,
    fold_into,
    shard_col,
    _shard_of_pandas,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(5000).select(
        F.md5(F.col("id").cast("string")).alias("url_id")
    ).persist()


def _md5s(lo, hi):
    import hashlib

    return pd.Series(
        [hashlib.md5(str(i).encode()).hexdigest() for i in range(lo, hi)]
    )


def test_tree_build_no_false_negatives(spark, ids_df):
    bloom = build_from_spark(ids_df, n_items=5000)
    assert bloom.might_contain(_md5s(0, 5000)).all()


def test_tree_build_fp_rate_sane(spark, ids_df):
    bloom = build_from_spark(ids_df, fpp=0.01, n_items=5000)
    fps = bloom.might_contain(_md5s(10_000, 20_000)).mean()
    assert fps < 0.03, fps


def test_tree_fold_into_matches_local_add(spark, ids_df):
    # fold_into over Spark == add_many locally, bit for bit (same m/k,
    # same double-hash positions — the OR is associative/commutative so
    # tree order cannot change the bitmap)
    tree = UrlBloom(5000, fpp=0.01)
    fold_into(tree, ids_df)
    local = UrlBloom(5000, fpp=0.01)
    local.add_many(_md5s(0, 5000))
    assert np.array_equal(tree.bits, local.bits)


def test_shard_routing_spark_matches_pandas(spark, ids_df):
    n_shards = 16
    rows = ids_df.withColumn(
        "shard", shard_col(F.col("url_id"), n_shards)
    ).collect()
    got = {r["url_id"]: r["shard"] for r in rows}
    ids = pd.Series(list(got))
    want = dict(zip(ids, _shard_of_pandas(ids, n_shards)))
    assert got == want


def test_sharded_store_roundtrip(spark, ids_df, tmp_path):
    store = ShardedBloomStore.build(
        ids_df, str(tmp_path / "blooms"), n_shards=16
    )
    probe = spark.range(10_000).select(
        F.md5(F.col("id").cast("string")).alias("url_id")
    )
    flags = {
        r["url_id"]: r["might_seen"]
        for r in store.probe(probe).collect()
    }
    seen = set(_md5s(0, 5000))
    # zero false negatives
    assert all(flags[i] for i in seen)
    # FP rate on the 5000 novel ids stays near the configured fpp
    novel = [i for i in flags if i not in seen]
    fp = sum(flags[i] for i in novel) / len(novel)
    assert fp < 0.03, fp


def test_sharded_store_copartitioned_probe(spark, ids_df, tmp_path):
    # the scale path: probe side repartitioned by the same shard expr —
    # one shard per task — must produce identical flags
    n_shards = 8
    store = ShardedBloomStore.build(
        ids_df, str(tmp_path / "blooms8"), n_shards=n_shards
    )
    probe = spark.range(2000, 7000).select(
        F.md5(F.col("id").cast("string")).alias("url_id")
    )
    plain = {
        r["url_id"]: r["might_seen"] for r in store.probe(probe).collect()
    }
    copart = {
        r["url_id"]: r["might_seen"]
        for r in store.probe(
            probe.repartition(n_shards, shard_col(F.col("url_id"), n_shards)),
            max_cached_shards=1,
        ).collect()
    }
    assert plain == copart


def test_sharded_store_null_and_empty(spark, tmp_path):
    empty = spark.createDataFrame([], "url_id string")
    store = ShardedBloomStore.build(empty, str(tmp_path / "be"), n_shards=4)
    probe = spark.createDataFrame(
        [("d41d8cd98f00b204e9800998ecf8427e",), (None,)], "url_id string"
    )
    rows = store.probe(probe).collect()
    assert all(not r["might_seen"] for r in rows)


def test_shard_bitmaps_are_shard_sized(spark, ids_df, tmp_path):
    # the point of sharding: each shard's bitmap is ~1/S of the single
    # bloom, so probe tasks and filter files stay small at 10^10
    n_shards = 16
    ShardedBloomStore.build(
        ids_df, str(tmp_path / "bsz"), n_shards=n_shards, fpp=0.01
    )
    sizes = {
        int(r["shard"]): int(r["m"])
        for r in spark.read.parquet(str(tmp_path / "bsz"))
        .select("shard", "m")
        .collect()
    }
    single = UrlBloom(5000, fpp=0.01).m
    assert len(sizes) == n_shards  # md5 uniformity: every shard hit
    for m in sizes.values():
        assert m <= single // n_shards * 3  # shard-sized, not global
