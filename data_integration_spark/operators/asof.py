"""As-of join (time-series point-in-time lookup) — an operator Spark lacks
natively, composed from existing DataFrame ops (SURVEY.md custom-operator
rule (a): composition before Pandas UDFs).

Semantics: for each left row, attach the latest right row with
``right.ts <= left.ts`` within the same key (ties: right row at equal ts
included). Implemented as union + window ``last(ignorenulls)`` over
(key, ts) — one shuffle on the key, linear in rows, no range cross join.

Scale: partitions by key; within-partition window scan is O(n log n) for the
sort. Skewed keys are AQE's problem; no broadcast needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach to each ``left`` row the most recent ``right`` values at or
    before its timestamp, per key. Returns all left columns plus
    ``<value_col><suffix>`` columns (NULL when no prior right row)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    lhs = left.withColumn("_side", F.lit(1))
    # the right row's values ride as ONE struct so last(ignorenulls) attaches
    # the latest right row ATOMICALLY — per-column last() would let a NULL
    # field fall back to an OLDER right row's non-NULL value, mixing fields
    # from different right rows in one output row.
    rhs = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_asof_row"),
    )
    tagged = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows (_side=0) sort before left rows at equal ts → equal-ts rights
    # are visible to the left row, matching ASOF >= semantics.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(
        "_f", F.last(F.col("_asof_row"), ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("_f").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
