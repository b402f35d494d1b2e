"""Layout-maintenance operators: compaction and range-sorted writes."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_integration_spark.sources.maintenance import (
    compact_parquet,
    range_sorted_write,
)


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    p = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.mode("overwrite").parquet(p)  # fragmented
    assert len(_parquet_files(p)) == 40
    before = df.agg(F.sum("v"), F.count("*")).collect()[0]

    n_files = compact_parquet(spark, p, target_rows_per_file=4_000)
    assert n_files == 3
    assert len(_parquet_files(p)) == 3
    after = (
        spark.read.parquet(p).agg(F.sum("v"), F.count("*")).collect()[0]
    )
    assert tuple(before) == tuple(after)  # byte-for-byte same content


def test_range_sorted_write_yields_disjoint_file_ranges(spark, tmp_path):
    """The pruning contract: after range_sorted_write, per-file key
    (min, max) intervals are non-overlapping — parquet stats then let a
    key predicate skip whole files (checked via pyarrow footers)."""
    import pyarrow.parquet as pq

    p = str(tmp_path / "sorted")
    df = spark.range(20_000).select(
        (F.col("id") * 37 % 20_000).alias("k"),
        F.col("id").alias("payload"),
    )
    range_sorted_write(df, p, key="k", n_files=5)
    files = _parquet_files(p)
    assert 4 <= len(files) <= 5  # range partitioner may merge tiny ends
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        kcol = names.index("k")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(kcol).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files
    # content preserved
    assert spark.read.parquet(p).count() == 20_000
