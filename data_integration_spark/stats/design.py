"""Survey design-matrix preparation (reference ``Method_code.Rmd:222-247``).

The reference builds x1..x7 indicator/transform columns row-by-row and keeps
the unit-level table everywhere. Our engine adds the **covariate-pattern
collapse** (SURVEY.md §7.4.1): the design has ≤ 2·2·3·4 discrete cells per
area (x7 is area-constant), so the unit-level table collapses to weighted
cells ``(state, x1..x7, y, m, w_sum)``. Every EM/EBP computation downstream
is exact on cells — a constant-factor win the row-wise reference never
exploits, and the reason the β-step scales: the optimizer touches
|cells| × R rows, not |units| × R.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_spark.functions.math import logit

X_COLS = ["x1", "x2", "x3", "x4", "x5", "x6", "x7"]


def prep_design(df: DataFrame, with_outcome: bool = True) -> DataFrame:
    """Build y, x1..x7 from the raw survey columns (``Rmd:227-234``):
    x1=[age4=45-64], x2=[gender=female], x3=[race3=black],
    x4=[race3=hispanic], x5=[educ4=col grad], x6=[educ4=postgrad],
    x7=qlogis(obama12)."""

    def ind(c: str, v: str) -> Column:
        return F.when(F.col(c) == v, 1).otherwise(0)

    out = df.withColumns(
        {
            "x1": ind("age4", "45-64"),
            "x2": ind("gender", "female"),
            "x3": ind("race3", "black"),
            "x4": ind("race3", "hispanic"),
            "x5": ind("educ4", "col grad"),
            "x6": ind("educ4", "postgrad"),
            "x7": logit("obama12"),
        }
    )
    if with_outcome:
        out = out.withColumn("y", F.col("demvote").cast("int"))
    return out


def x_beta_col(beta: Sequence[float]) -> Column:
    """Linear predictor from 8 coefficients (``Rmd:245-247``) — literals are
    constant-folded by Catalyst."""
    expr: Column = F.lit(float(beta[0]))
    for k, x in enumerate(X_COLS, start=1):
        expr = expr + F.col(x) * F.lit(float(beta[k]))
    return expr


def design_cells(
    prepped: DataFrame, with_outcome: bool = True, weight_col: str | None = "weight"
) -> DataFrame:
    """Collapse a prepped survey to covariate-pattern cells.

    Returns (state, x1..x7[, y], m, w_sum): m = unit count, w_sum = summed
    survey weight. One shuffle; output is ≤ #areas × 96 rows regardless of
    input size — THE scalability lever for the iterative layer.
    """
    keys = ["state", *X_COLS] + (["y"] if with_outcome else [])
    aggs = [F.count("*").alias("m")]
    if weight_col is not None and weight_col in prepped.columns:
        aggs.append(F.sum(weight_col).alias("w_sum"))
    else:
        aggs.append(F.lit(None).cast("double").alias("w_sum"))
    return prepped.groupBy(*keys).agg(*aggs)
