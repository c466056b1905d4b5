"""Bucketed (hash-pre-partitioned) storage for the persistent
URL-seen table — the shuffle-elimination path for the wave's
biggest standing exchange.

Every wave runs a `url_id`-keyed anti-join of the candidate set
against the persistent seen set (D3, CrawlerListener.java:360-365).
Stored as plain parquet, BOTH sides shuffle on url_id every wave; at
a 10^10-row seen table that re-shuffle of the (static!) seen side
dominates wave cost. Bucketing fixes it at WRITE time: the table is
hash-partitioned into N buckets by url_id once, the scan reports
`HashPartitioning(url_id, N)`, and EnsureRequirements drops the
seen-side Exchange from every subsequent wave's plan — only the
wave's (small) candidate delta still shuffles. This is the classic
"pay one shuffle at write, amortize over every read" trade, and the
seen table is the textbook candidate: append-mostly, read every
wave, always joined on the same key.

Bucket metadata lives in the session catalog (`saveAsTable`); data
files are external parquet under the caller's path. On a production
cluster the same layout is an Iceberg `bucket(N, url_id)` partition
transform with storage-partitioned joins — the catalog entry here is
the local[] stand-in for that. The statestore keeps its snapshot
parquet as the source of truth; this module maintains a DERIVED
bucketed mirror (rebuild = one shuffle), so resume semantics are
unchanged.

Plan contract (pinned by tests/test_plans.py): the anti-join of a
probe DataFrame against the bucketed table at n_buckets ==
spark.sql.shuffle.partitions contains exactly ONE Exchange — the
probe side — and zero Exchange above the bucketed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    key: str = "url_id",
) -> None:
    """Materialize `df` as an external parquet table bucketed (and
    per-file sorted) by `key`. Overwrites both data and catalog
    entry. One url_id shuffle now, zero on every future read-join."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the ONLY way the bucket metadata (and thus the
    exchange elimination) survives; `spark.read.parquet(path)` on the
    same files would degrade to an unbucketed scan, silently
    re-adding the shuffle."""
    return spark.table(table)


def anti_join_bucketed(
    candidates: DataFrame,
    spark: SparkSession,
    table: str,
    key: str = "url_id",
) -> DataFrame:
    """D3 anti-join against the bucketed seen mirror: seen side scans
    in place (no Exchange), candidates shuffle once to align with the
    bucket layout. shuffle_hash keeps the probe side sort-free, same
    as the statestore path (plans/wave.py)."""
    seen = read_bucketed(spark, table).select(key)
    return candidates.join(
        seen.hint("shuffle_hash"), key, "left_anti"
    )


def append_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    key: str = "url_id",
) -> None:
    """Append a (small) delta to an existing bucketed table with the
    same bucket spec — the per-wave O(delta) maintenance write. Spark
    validates the spec against the catalog entry; a mismatch raises
    rather than silently degrading the layout."""
    (
        df.write.format("parquet")
        .mode("append")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
