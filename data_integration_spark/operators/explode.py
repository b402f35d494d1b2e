"""Monte-Carlo replicate expansion (SURVEY.md §2.8 R3).

The reference materializes R=1000 per-state draw tables as an R list of
data.frames (``lapply(1:1000, vtilde_func)``, ``Method_code.Rmd:292-296``).
Columnar equivalent: ONE long table (group × r) built by
``explode(sequence(1, R))`` — no driver loop, no list-of-frames, and the
draw column rides along as a native expression.

Scale: the skeleton is rows × R; for large R × large fact tables prefer
chunking R (stats/em.py does) — but the skeleton itself never leaves the
executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mc_replicates(
    df: DataFrame, n_reps: int, rep_col: str = "r",
    draw_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Cross each row with replicate ids 1..R; optionally attach draw columns
    (e.g. ``seeded_normal(key, rep_col)``) evaluated per (row, rep)."""
    # sequence over long bounds → array<bigint> → explode emits bigint
    # (a cast around explode is illegal: generators must be top-level)
    out = df.select(
        "*",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.lit(int(n_reps)).cast("long"))
        ).alias(rep_col),
    )
    for name, expr in (draw_exprs or {}).items():
        out = out.withColumn(name, expr)
    return out
