"""Iceberg backend seam (round-3 verdict ask #6).

The runtime jar is unobtainable in this sandbox (no jar on the image,
no network — probe evidence in sources/iceberg.py and BASELINE.md),
so these tests cover everything that runs without it: the
availability probe, the loud failure path, and the pure DDL builders
(bucket transform on the seen-side tables — the production form of
the bucketed mirror). The live end-to-end path auto-activates via the
skip guard the moment a jar appears on the classpath.
"""

import pytest

from yacy_grid_crawler_spark.sources.iceberg import (
    ICEBERG_PACKAGE,
    IcebergStateStore,
    catalog_conf,
    create_table_sql,
    iceberg_available,
    manifest_table_sql,
)
from yacy_grid_crawler_spark.sources.statestore import SCHEMAS


def test_ddl_covers_every_state_table():
    for t in SCHEMAS:
        sql = create_table_sql("cat", "db", t, n_buckets=64)
        assert sql.startswith(f"CREATE TABLE IF NOT EXISTS cat.db.{t} ")
        assert "USING iceberg" in sql
        assert "'format-version'='2'" in sql
        for fld in SCHEMAS[t].fields:
            assert fld.name in sql


def test_seen_side_tables_get_bucket_transform():
    # the production form of sources/bucketed.py: bucket(N, url_id)
    # partitioning → storage-partitioned D3 anti-join, seen side never
    # re-shuffles
    for t in ("url_seen", "crawl_status"):
        assert "PARTITIONED BY (bucket(64, url_id))" in create_table_sql(
            "cat", "db", t, n_buckets=64
        )
    for t in set(SCHEMAS) - {"url_seen", "crawl_status"}:
        assert "PARTITIONED BY" not in create_table_sql("cat", "db", t)


def test_manifest_table_ddl():
    sql = manifest_table_sql("cat", "db")
    assert "cat.db.manifest" in sql
    for col in ("version bigint", "snapshots string", "meta string"):
        assert col in sql


def test_catalog_conf_shape():
    conf = catalog_conf("crawlcat", "/tmp/wh")
    assert conf["spark.sql.catalog.crawlcat"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert conf["spark.sql.catalog.crawlcat.type"] == "hadoop"
    assert conf["spark.sql.catalog.crawlcat.warehouse"] == "/tmp/wh"


def test_unavailable_raises_actionable_error(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — live path applies")
    with pytest.raises(RuntimeError) as ei:
        IcebergStateStore(spark)
    msg = str(ei.value)
    assert ICEBERG_PACKAGE in msg  # the exact --packages line
    assert "spark-submit" in msg


def test_live_roundtrip_when_jar_present(spark, tmp_path):
    """End-to-end commit/read/resume — runs only if someone drops the
    Iceberg runtime on the classpath (auto-activating, never xfail)."""
    if not iceberg_available(spark):
        pytest.skip(
            "Iceberg runtime not obtainable in this sandbox "
            "(documented in sources/iceberg.py + BASELINE.md)"
        )
    store = IcebergStateStore(spark)
    seen = spark.createDataFrame(
        [("c1", "a" * 32, 0)], SCHEMAS["url_seen"]
    )
    v1 = store.commit(appends={"url_seen": seen}, meta={"wave": 1})
    assert v1 == 1
    assert store.read("url_seen").count() == 1
    v2 = store.commit(appends={"url_seen": seen}, meta={"wave": 2})
    assert store.read("url_seen", version=v1).count() == 1  # time travel
    assert store.read("url_seen", version=v2).count() == 2
    assert store.table_bytes("url_seen") > 0
    # replace = full-table truncate-then-write (the parquet store's
    # contract): rows in buckets the replacement doesn't touch must NOT
    # survive — the dynamic-overwrite divergence flagged in round-4
    # ADVICE
    other_bucket = spark.createDataFrame(
        [("c1", "b" * 32, 1)], SCHEMAS["url_seen"]
    )
    v3 = store.commit(replaces={"url_seen": other_bucket})
    rows = store.read("url_seen", version=v3).collect()
    assert len(rows) == 1 and rows[0]["url_id"] == "b" * 32
    # explicit nonexistent version fails loud, matching statestore.py
    with pytest.raises(FileNotFoundError):
        store.read("url_seen", version=99)
