"""Survey-statistics aggregates as native groupBy().agg() expressions.

Reference parity (SURVEY.md §2.6):
- A1 grouped weighted mean — the pipeline's signature aggregate, appearing as
  an explicit loop-over-states with per-state filters at
  ``Method_code.Rmd:188-204, 437-452, 667-677`` (O(S·n) scans). Here: ONE
  shuffle on the group key with map-side partial aggregation.
- A5 error measures ASD/RASD/AAD (``Rmd:481-486``).
- A6 MSPE across bootstrap reps (``Rmd:744-757``): the reference builds a wide
  cbind-of-reps matrix and rowMeans; we keep the long (rep, group, est, true)
  form — columnar and shuffle-friendly at any number of reps.
- A8 survey-weighted mean + linearized SE (``svyby``/``svymean``,
  ``Rmd:459-462``): Hájek mean and Taylor-linearized SE for an
  element-sampling design, computed in a SINGLE pass via sum-of-squares
  algebra (no join-back of the group mean, no UDAF).

Scale notes: every helper is one shuffle; with few group keys (51 states)
AQE coalesces partitions, and partial aggregation means the shuffle carries
one row per (mapper, key) — these hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def weighted_mean_by_group(
    df: DataFrame,
    group: str | list[str],
    value: Column | str,
    weight: Column | str,
    alias: str = "wmean",
    scale: float = 1.0,
) -> DataFrame:
    """Per-group ``scale * Σ(v·w) / Σ(w)`` (reference A1, ``Rmd:197-202``)."""
    group = [group] if isinstance(group, str) else list(group)
    v, w = _c(value), _c(weight)
    return df.groupBy(*group).agg(
        (F.lit(float(scale)) * F.sum(v * w) / F.sum(w)).alias(alias)
    )


def survey_mean_se(
    df: DataFrame,
    group: str | list[str],
    value: Column | str,
    weight: Column | str,
    mean_alias: str = "mean",
    se_alias: str = "se",
) -> DataFrame:
    """Hájek weighted mean + Taylor-linearized SE per group (reference A8,
    ``svydesign`` + ``svyby(..., svymean)``, ``Rmd:459-462``).

    SE for an element-sampling design with weights w_i (R's ``svymean`` for
    an ``ids=~1`` design, INCLUDING its n/(n−1) finite-sample factor):
        ŷ_w = Σ w_i y_i / Σ w_i
        SE  = sqrt( n/(n−1) · Σ (w_i (y_i − ŷ_w))² ) / Σ w_i
    Expanded to sufficient statistics so one aggregation pass suffices:
        Σ w²(y−ŷ)² = Σ w²y² − 2 ŷ Σ w²y + ŷ² Σ w²

    NULL semantics = ``svymean(na.rm=TRUE)``: rows with NULL y are dropped
    ENTIRELY (their weights too) — every sum below conditions on y being
    non-null. This differs from the reference's manual weighted mean (A1,
    ``sum(y*w, na.rm)/sum(w)``) which keeps NULL rows' weights in the
    denominator; weighted_mean_by_group implements that convention.
    Single-observation groups report SE = 0 (the n/(n−1) factor is skipped
    to avoid 0/0; svymean would return NaN there).
    """
    group = [group] if isinstance(group, str) else list(group)
    v = _c(value)
    w = F.when(v.isNotNull(), _c(weight))  # drop NA rows' weights entirely
    agg = df.groupBy(*group).agg(
        F.sum(w).alias("_sw"),
        F.sum(w * v).alias("_swy"),
        F.sum(w * w).alias("_sw2"),
        F.sum(w * w * v).alias("_sw2y"),
        F.sum(w * w * v * v).alias("_sw2y2"),
        F.count(w).alias("_n"),
    )
    mean = F.col("_swy") / F.col("_sw")
    ss = F.col("_sw2y2") - 2.0 * mean * F.col("_sw2y") + mean * mean * F.col("_sw2")
    n = F.col("_n")
    fs = F.when(n > 1, n / (n - F.lit(1))).otherwise(F.lit(1.0))
    # numeric guard: ss can be ~ -1e-18 from cancellation
    se = F.sqrt(fs * F.greatest(ss, F.lit(0.0))) / F.col("_sw")
    return agg.select(
        *group, mean.alias(mean_alias), se.alias(se_alias)
    )


def error_measures(
    df: DataFrame, est: Column | str, actual: Column | str
) -> DataFrame:
    """Whole-table ASD / RASD / AAD (reference A5, ``Rmd:481-486``):
    asd = mean((est−act)²), rasd = sqrt(asd), aad = mean(|est−act|),
    NULL pairs skipped (R's ``na.rm=TRUE`` ≡ Spark's NULL-skipping avg)."""
    e, a = _c(est), _c(actual)
    d = e - a
    asd = F.avg(d * d)
    return df.agg(
        asd.alias("asd"),
        F.sqrt(asd).alias("rasd"),
        F.avg(F.abs(d)).alias("aad"),
    )


def mspe_by_group(
    df: DataFrame,
    group: str | list[str],
    est: Column | str,
    truth: Column | str,
    alias: str = "sqrt_mspe",
) -> DataFrame:
    """Per-group sqrt(mean_rep (est−true)²) over a long (rep, group, est, true)
    table (reference A6/C4, ``Rmd:744-757``)."""
    group = [group] if isinstance(group, str) else list(group)
    e, t = _c(est), _c(truth)
    return df.groupBy(*group).agg(F.sqrt(F.avg((e - t) * (e - t))).alias(alias))
