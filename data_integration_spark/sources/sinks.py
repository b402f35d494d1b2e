"""File sinks (reference S2: ``write.csv`` at ``Method_code.Rmd:473,752-753``).

Parquet is the default interchange format (columnar, splittable, statistics
for pushdown — the right choice at 100 TB); CSV offered for parity with the
reference's sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def roundtrip_parquet(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Write + re-read (exercises the sink in a correctness-checkable way)."""
    write_parquet(df, path)
    return spark.read.parquet(path)
