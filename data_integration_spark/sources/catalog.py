"""Multi-table catalog over a directory of Parquet tables.

Reference parity: the reference loads one ``.RDS`` file holding a list of 3
data.frames (``Method_code.Rmd:41-42``) and addresses them positionally.
Spark-first equivalent: a directory of self-describing Parquet tables read
lazily with ``spark.read.parquet`` and addressed by name; ``register_views``
exposes every table to the SQL entry point (the reference's ``sqldf`` bridge,
``Method_code.Rmd:763-772``, minus the data copy).

At 100 TB each "table" is a partitioned Parquet dataset; nothing here assumes
single files. Predicate pushdown / column pruning happen at the scan because
tables are exposed lazily — no eager materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy Parquet scan of one table (reference S1, ``Rmd:41-42``).

    Nanosecond-precision timestamp columns arrive as epoch-nanos longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and are narrowed to
    microsecond timestamps here — integer division, matching DuckDB's
    nanos→micros truncation, so both engines see identical values.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # defensive: the harness may hand us a session built without this conf —
    # it is runtime-settable and required to read TIMESTAMP(NANOS) parquet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Catalog:
    """Named-table catalog over a scale-factor directory.

    ``Catalog(spark, sf_dir)[name]`` returns the lazy DataFrame; tables are
    cached per-name so repeated lookups share one plan subtree.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._tables: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._tables:
            self._tables[name] = load_table(self.spark, self.sf_dir, name)
        return self._tables[name]

    def names(self) -> list[str]:
        return [
            f[: -len(".parquet")]
            for f in sorted(os.listdir(self.sf_dir))
            if f.endswith(".parquet")
        ]


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> Catalog:
    """Register every table as a temp view for ``spark.sql`` (reference S3).

    Unlike the reference's sqldf→SQLite bridge this involves zero data
    movement: the view is a name bound to a lazy plan.
    """
    cat = Catalog(spark, sf_dir)
    for name in tables if tables is not None else cat.names():
        cat[name].createOrReplaceTempView(name)
    return cat
