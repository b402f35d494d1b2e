"""EBP scoring, direct estimation, comparison & final report — the
composite pipelines of the reference (SURVEY.md §2.12, C1/C2/C5).

All pure DataFrame ops:
- EBP (``Method_code.Rmd:406-454``): per-unit ŷ = mean_r expit(xβ + v_r,s)
  over R draws, v=0 for areas absent from the small survey; then the A1
  weighted mean per area. On cells, the unit dimension collapses: the draw
  join touches |patterns| × R rows, not |units| × R.
- Direct (``Rmd:456-473``): survey-weighted Hájek mean ± linearized SE ×100.
- Comparison (``Rmd:466-507``): n-way full-outer fold on state + ASD/RASD/AAD.
- Report (``Rmd:763-772``): the literal SQL left-join chain via spark.sql.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_spark.functions.math import expit
from data_integration_spark.functions.stats import survey_mean_se
from data_integration_spark.operators.joins import full_outer_fold
from data_integration_spark.stats.design import (
    X_COLS,
    design_cells,
    prep_design,
    x_beta_col,
)


def ebp_estimates(
    big_survey: DataFrame,
    beta: Sequence[float],
    v_draws: DataFrame,
    est_alias: str = "EM_est",
) -> DataFrame:
    """Per-area EBP: 100 × Σ_u w_u·ŷ_u / Σ_u w_u with
    ŷ_u = mean_r expit(xβ_u + v_r,area) (``Rmd:406-454``).

    ``v_draws`` is the long (r, state, v_tilde) table from the EM fit (the
    reference reuses ``v_case_sim``, first 100 reps, ``Rmd:415``). Areas
    missing from ``v_draws`` score with v=0 (generalized MT/SD,
    ``Rmd:433-435``) via the left join + coalesce — no hard-coded states.

    Plan shape: cells (one narrow shuffle) → broadcast-join draws →
    two-level agg. Unit rows are touched exactly once, at the collapse.
    """
    cells = design_cells(
        prep_design(big_survey, with_outcome=False), with_outcome=False
    ).withColumn("xb", x_beta_col(beta))
    # pattern × draw: mean over r of expit(xb + v); absent areas get one
    # pseudo-draw v=0 via the left join + coalesce
    joined = cells.join(F.broadcast(v_draws), "state", "left")
    per_pattern = joined.groupBy("state", *X_COLS).agg(
        F.min("w_sum").alias("w_sum"),
        F.avg(
            expit(F.col("xb") + F.coalesce(F.col("v_tilde"), F.lit(0.0)))
        ).alias("y_hat"),
    )
    return per_pattern.groupBy("state").agg(
        (
            F.lit(100.0) * F.sum(F.col("y_hat") * F.col("w_sum")) / F.sum("w_sum")
        ).alias(est_alias)
    )


def direct_estimates(
    small_survey: DataFrame,
    outcome: str = "demvote",
    weight: str = "weight",
) -> DataFrame:
    """Per-area survey-weighted direct estimate ± SE, ×100 (``Rmd:456-473``:
    ``svyby`` + the 100× scaling)."""
    out = survey_mean_se(
        small_survey,
        group="state",
        value=F.col(outcome).cast("double"),
        weight=F.col(weight),
        mean_alias="mean_",
        se_alias="se_",
    )
    return out.select(
        "state",
        (F.lit(100.0) * F.col("mean_")).alias("direct"),
        (F.lit(100.0) * F.col("se_")).alias("direct_SE"),
    )


def comparison_table(
    actuals: DataFrame, estimate_tables: Sequence[DataFrame]
) -> DataFrame:
    """J1 full-outer fold of actuals + estimator tables on state
    (``reduce(full_join, by='state')``, ``Rmd:466-469``)."""
    return full_outer_fold([actuals, *estimate_tables], on="state")


def error_summary(
    comp: DataFrame, actual_col: str, est_cols: Sequence[str]
) -> pd.DataFrame:
    """ASD/RASD/AAD per estimator against the actuals (``Rmd:481-507``),
    NULL-skipping like the reference's ``na.rm=TRUE``.

    All estimators' aggregates run in ONE ``agg()`` pass (one Spark job
    regardless of ``len(est_cols)``) — a per-estimator job loop would be the
    per-group-scan shape SURVEY §4.1 criticizes in the reference."""
    import math

    aggs = []
    for i, est in enumerate(est_cols):
        d = F.col(est) - F.col(actual_col)
        aggs.append(F.avg(d * d).alias(f"_asd_{i}"))
        aggs.append(F.avg(F.abs(d)).alias(f"_aad_{i}"))
    r = comp.agg(*aggs).collect()[0]
    rows = []
    for i, est in enumerate(est_cols):
        asd = r[f"_asd_{i}"]
        rows.append(
            {
                "estimator": est,
                "asd": asd,
                "rasd": None if asd is None else math.sqrt(asd),
                "aad": r[f"_aad_{i}"],
            }
        )
    return pd.DataFrame(rows)


REPORT_SQL = """
SELECT a.state AS state, a.name AS name,
       ROUND(a.actual, 2) AS actual_val,
       ROUND(a.direct, 2) AS direct_est,
       ROUND(a.EM_est, 2) AS EBP_est,
       ROUND(a.direct_SE, 2) AS direct_SE,
       ROUND(b.sqrt_MSPE, 2) AS EBP_SE
FROM comp_data a
LEFT JOIN final_MSPE b ON a.state = b.state
"""


def final_report(
    spark: SparkSession,
    comp_data: DataFrame,
    final_mspe: DataFrame,
) -> DataFrame:
    """The reference's closing sqldf query (``Rmd:763-772``) — run verbatim
    as ANSI SQL over temp views (S3: no data copy, unlike sqldf→SQLite)."""
    comp_data.createOrReplaceTempView("comp_data")
    final_mspe.createOrReplaceTempView("final_MSPE")
    return spark.sql(REPORT_SQL)
