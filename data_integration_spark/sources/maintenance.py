"""Table-maintenance operators: compaction and sort-ordered layout.

At 100 TB the dominant silent performance killer is layout decay: streaming
and incremental ingest produce millions of small files (footer/open
overhead, starved scans), and unsorted data defeats parquet row-group
min/max pruning. These operators are the periodic maintenance pass:

- ``compact_parquet``: rewrite a directory into ~``target_rows``-sized
  files (count once, repartition, atomic swap via a temp dir + rename).
- ``range_sorted_write``: ``repartitionByRange`` + ``sortWithinPartitions``
  on a key before writing — each output file then covers a NARROW,
  mostly-disjoint key range, so a key predicate prunes whole files /
  row groups via parquet statistics (the poor man's Z-order for a single
  key; verified against pyarrow footer stats in tests).
"""

from __future__ import annotations

import os  # noqa: F401  (kept: path checks in callers/tests)
import uuid

from pyspark.sql import DataFrame, SparkSession

from data_integration_spark.sources.atomic import atomic_replace_dir, recover_dir


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite ``path`` into ceil(n / target_rows) files; returns the new
    file count. The rewrite goes to a sibling temp dir first and replaces
    the original only after success — a crashed compaction never destroys
    the table."""
    recover_dir(path)  # restore the table if a prior compaction crashed
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    atomic_replace_dir(tmp, path)
    return n_files


def range_sorted_write(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partition on ``key`` then sort within each partition before
    writing: output files cover near-disjoint key ranges and row groups
    are internally sorted — parquet min/max stats then prune file and
    row-group reads for key predicates."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode(mode)
        .parquet(path)
    )
