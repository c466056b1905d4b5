"""SparkSession factory tuned for the frontier engine.

Local mode here mirrors what spark-submit on a multi-executor cluster
would set: AQE on (skew-join + coalesce), Arrow on, shuffle
partitions ~ cores. At cluster scale, shuffle partitions scale with
total cores and `spark.sql.files.maxPartitionBytes` bounds scan tasks.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "yacy_grid_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """`master` overrides the default local[cores] — e.g.
    "local-cluster[4,8,8192]" runs 4 separate executor JVMs x 8 cores
    (the spark-submit multi-executor shape; executors import the repo
    via spark.executorEnv.PYTHONPATH below)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    if master and master.startswith("local-cluster"):
        os.environ.setdefault(
            "SPARK_HOME",
            os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
        )
    b = (
        SparkSession.builder.master(master or f"local[{cores}]")
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
