"""SparkSession factory with scale-aware defaults.

Local test profile: ``local[N]`` single-JVM. Cluster profile: same configs
minus the master override — partitioning and AQE settings are chosen so the
same code runs unchanged on a 1000-executor cluster against ~100 TB:

- AQE on (runtime coalescing + skew-join splitting) so shuffle partition
  counts adapt to real data sizes instead of a hardcoded number;
- broadcast threshold raised so dimension tables (region/nation/supplier,
  per-area statistics <= 51 rows) never shuffle;
- Arrow enabled for every pandas boundary (applyInPandas in the EM step,
  toPandas on small results).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_integration_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master=None`` respects an externally-provided cluster master
    (spark-submit); tests pass ``local[N]`` or rely on the SPARK_GRAFT_CPUS
    env var.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local mode: match core count. On a real cluster this is overridden
        # by spark-submit conf; AQE coalescing corrects over-partitioning.
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # static config — must be set before session start (bucketed tables)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/root/repo/.scratch/spark-warehouse"
            ),
        )
        # testdata's events.ts is TIMESTAMP(NANOS) which the vectorized parquet
        # reader rejects; read as long and convert in the catalog (µs truncation,
        # matching DuckDB's nanos→micros narrowing).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
