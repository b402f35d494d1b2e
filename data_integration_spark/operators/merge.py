"""Upsert / merge (SCD-style) — the ETL primitive for maintaining a target
table from a changes feed, composed from DataFrame ops (no table-format
dependency: works on parquet by rewrite, on Delta/Iceberg by their native
MERGE when present).

Semantics (MERGE INTO): rows in ``updates`` replace matching target rows by
key; unmatched update rows are inserted; other target rows pass through.
Implementation: anti-join target→updates (survivors) UNION the updates —
two narrow passes, one shuffle each side on the key at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str] | str
) -> DataFrame:
    keys = [keys] if isinstance(keys, str) else list(keys)
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(updates.select(*target.columns))
