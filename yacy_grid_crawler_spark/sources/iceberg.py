"""Opt-in Iceberg backing for the crawl state tables.

The north star names Iceberg as the production table format
("checkpoints frontier + seen-set state to Iceberg snapshots for
exact resume"); the engine runs on `statestore.py`'s parquet-snapshot
implementation of the same contract because the Iceberg runtime jar
is NOT obtainable in this sandbox — probed 2026-08-20 (round 4):

  * no ``*iceberg*`` jar anywhere on the image (pyspark 4.1.2 ships
    none; ``find / -name '*iceberg*'`` is empty),
  * no network to fetch one (repo1.maven.org does not resolve), and
  * installs are disallowed in this environment anyway.

So this module gives the swap a concrete, testable seam instead of a
prose note:

  * :func:`iceberg_available` probes the JVM for the Spark catalog
    class at runtime;
  * :class:`IcebergStateStore` implements the StateStore commit
    contract over Iceberg tables when the jar is present, and raises
    a actionable error (the exact ``spark-submit --packages`` line)
    when it is not — the error path is what this sandbox can test;
  * the DDL/property builders are pure functions, tested without the
    jar: url_seen/crawl_status are bucketed ``bucket(N, url_id)`` (the
    production form of sources/bucketed.py's catalog mirror, enabling
    storage-partitioned joins so the per-wave D3 anti-join reads the
    seen side with no Exchange).

Atomic MULTI-table commits (the parquet store's manifest contract;
Iceberg transactions are per-table): each wave appends/replaces the
data tables first, then appends ONE row to a tiny ``manifest`` table
recording every table's resulting snapshot id. The single-row append
is atomic; readers resolve the latest manifest row and time-travel
each table ``VERSION AS OF`` its pinned snapshot. A crash between the
data writes and the manifest append leaves newer-but-unreferenced
snapshots — ignorable orphans, exactly like the parquet store's inert
commit dirs (expire via Iceberg's ``expire_snapshots`` maintenance).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .statestore import SCHEMAS

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"

# Spark conf for a local filesystem (hadoop) catalog — the minimal
# production-shaped setup; a real deployment points `type` at the REST
# catalog instead.
def catalog_conf(catalog: str, warehouse: str) -> dict[str, str]:
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# DDL builders (pure, tested without the jar)
# ---------------------------------------------------------------------------

# tables whose hot-path join key is url_id get the bucket transform —
# the production form of the bucketed seen mirror (sources/bucketed.py)
_BUCKETED_TABLES = {"url_seen", "crawl_status"}


def _spark_ddl_types(table: str) -> str:
    return ", ".join(
        f"{fld.name} {fld.dataType.simpleString()}"
        for fld in SCHEMAS[table].fields
    )


def create_table_sql(
    catalog: str, db: str, table: str, n_buckets: int = 32
) -> str:
    """CREATE TABLE DDL for one state table. url_seen/crawl_status are
    partitioned ``bucket(n, url_id)`` so every wave's D3 anti-join is a
    storage-partitioned join: the 10^10-row seen side scans in place,
    only the wave delta shuffles."""
    cols = _spark_ddl_types(table)
    part = (
        f" PARTITIONED BY (bucket({n_buckets}, url_id))"
        if table in _BUCKETED_TABLES
        else ""
    )
    props = (
        " TBLPROPERTIES ("
        "'format-version'='2', "
        "'write.distribution-mode'='hash', "
        "'commit.retry.num-retries'='10')"
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {catalog}.{db}.{table} "
        f"({cols}) USING iceberg{part}{props}"
    )


def manifest_table_sql(catalog: str, db: str) -> str:
    """The one-row-per-wave commit manifest (see module docstring)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {catalog}.{db}.manifest "
        "(version bigint, snapshots string, meta string, "
        "committed_at timestamp) USING iceberg"
    )


# ---------------------------------------------------------------------------
# the store
# ---------------------------------------------------------------------------


class IcebergStateStore:
    """StateStore's commit contract over Iceberg tables (opt-in).

    Same read/commit surface as the parquet StateStore for the
    subset CrawlJob's wave loop needs; constructing it without the
    Iceberg runtime raises immediately with the exact dependency
    line, so a misconfigured cluster fails loud at startup rather
    than deep in a wave."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: str = "crawlcat",
        db: str = "crawlstate",
        n_buckets: int = 32,
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — launch with "
                f"spark-submit --packages {ICEBERG_PACKAGE} and set "
                f"spark.sql.catalog.{catalog}=org.apache.iceberg."
                "spark.SparkCatalog (see sources/iceberg.py)"
            )
        self.spark = spark
        self.catalog = catalog
        self.db = db
        self.n_buckets = n_buckets
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{db}")
        for t in SCHEMAS:
            spark.sql(create_table_sql(catalog, db, t, n_buckets))
        spark.sql(manifest_table_sql(catalog, db))

    # -- manifest ----------------------------------------------------
    def _qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.db}.{table}"

    def manifest(self, version: int | None = None) -> dict:
        m = self.spark.table(self._qualified("manifest"))
        if version is not None:
            m = m.filter(m.version == version)
        row = m.orderBy(m.version.desc()).limit(1).collect()
        if not row:
            if version is not None and version != 0:
                # match the parquet store's contract: an explicitly
                # requested version that was never committed fails loud
                # (statestore.py manifest() → FileNotFoundError), not a
                # silent empty read in a resume/time-travel path
                raise FileNotFoundError(
                    f"no manifest row for version {version} in "
                    f"{self._qualified('manifest')}"
                )
            return {"version": 0, "snapshots": {}, "meta": {}}
        r = row[0]
        return {
            "version": int(r["version"]),
            "snapshots": json.loads(r["snapshots"]),
            "meta": json.loads(r["meta"]),
        }

    def current_version(self) -> int:
        return self.manifest()["version"]

    def _snapshot_id(self, table: str) -> int | None:
        row = (
            self.spark.sql(
                f"SELECT snapshot_id FROM {self._qualified(table)}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).collect()
        )
        return int(row[0][0]) if row else None

    # -- read (manifest-pinned time travel) --------------------------
    def read(self, table: str, version: int | None = None) -> DataFrame:
        snap = self.manifest(version)["snapshots"].get(table)
        if snap is None:
            return self.spark.createDataFrame([], SCHEMAS[table])
        return self.spark.read.option("snapshot-id", snap).table(
            self._qualified(table)
        )

    def table_bytes(self, table: str, version: int | None = None) -> int:
        """Iceberg analog of the parquet store's OS-stat size signal
        (statestore.py table_bytes): the manifest-pinned snapshot's
        ``total-files-size`` summary — a metadata read, no data scan.
        CrawlJob's bucketed_seen="auto" calls this every wave
        (crawl_job.py:_bucketed_enabled), so the Iceberg store must
        carry it to be a drop-in swap."""
        snap = self.manifest(version)["snapshots"].get(table)
        if snap is None:
            return 0
        row = self.spark.sql(
            "SELECT summary['total-files-size'] AS sz FROM "
            f"{self._qualified(table)}.snapshots "
            f"WHERE snapshot_id = {int(snap)}"
        ).collect()
        if not row or row[0]["sz"] is None:
            return 0
        return int(row[0]["sz"])

    # -- write -------------------------------------------------------
    def commit(
        self,
        appends: dict[str, DataFrame] | None = None,
        replaces: dict[str, DataFrame] | None = None,
        meta: dict | None = None,
    ) -> int:
        """One wave commit: per-table Iceberg writes, then the atomic
        manifest-row append pinning every table's snapshot id."""
        from pyspark.sql import functions as F

        for t, df in (appends or {}).items():
            df.writeTo(self._qualified(t)).append()
        for t, df in (replaces or {}).items():
            # full-table replace, NOT overwritePartitions(): the parquet
            # store's `replaces` contract is truncate-then-write
            # (CrawlJob's status collapse / S8 rewrite rely on stale
            # rows being gone — crawl_job.py), but a DYNAMIC partition
            # overwrite on a bucket(N, url_id)-partitioned table keeps
            # every bucket the replacement happens not to touch.
            # overwrite(lit(True)) deletes all rows, then writes, in one
            # Iceberg transaction.
            df.writeTo(self._qualified(t)).overwrite(F.lit(True))
        prev = self.manifest()
        version = prev["version"] + 1
        snaps = dict(prev["snapshots"])
        for t in set(appends or {}) | set(replaces or {}):
            snaps[t] = self._snapshot_id(t)
        self.spark.createDataFrame(
            [(version, json.dumps(snaps), json.dumps(meta or {}))],
            "version bigint, snapshots string, meta string",
        ).withColumn("committed_at", F.current_timestamp()).writeTo(
            self._qualified("manifest")
        ).append()
        return version
