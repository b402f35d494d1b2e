"""NULL-handling parity with the reference's ``na.rm=TRUE`` conventions
(SURVEY.md F5): Spark aggregates skip NULLs like R's na.rm — these tests
pin the exact division-by-which-denominator semantics."""

from __future__ import annotations

import math

from pyspark.sql import Row

from data_integration_spark.functions.stats import (
    survey_mean_se,
    weighted_mean_by_group,
)
from data_integration_spark.operators.joins import full_outer_fold


def test_weighted_mean_null_outcome_keeps_full_weight_denominator(spark):
    """Reference A1: sum(y*w, na.rm)/sum(w) — a NULL outcome drops from the
    numerator but its weight STAYS in the denominator (the reference's
    division uses the full weight sum)."""
    df = spark.createDataFrame(
        [
            Row(g="a", y=1.0, w=2.0),
            Row(g="a", y=None, w=3.0),
            Row(g="a", y=2.0, w=5.0),
        ]
    )
    r = weighted_mean_by_group(df, "g", "y", "w", "wm").collect()[0]
    assert abs(r.wm - (1 * 2 + 2 * 5) / (2 + 3 + 5)) < 1e-12


def test_weighted_mean_null_weight_drops_pair(spark):
    df = spark.createDataFrame(
        [Row(g="a", y=1.0, w=None), Row(g="a", y=3.0, w=1.0)]
    )
    r = weighted_mean_by_group(df, "g", "y", "w", "wm").collect()[0]
    assert abs(r.wm - 3.0) < 1e-12


def test_survey_se_with_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(g="a", y=1.0, w=1.0),
            Row(g="a", y=None, w=1.0),
            Row(g="a", y=2.0, w=1.0),
        ]
    )
    r = survey_mean_se(df, "g", "y", "w").collect()[0]
    # svymean(na.rm=TRUE) semantics: the NULL row is dropped entirely,
    # weight included — mean over the 2 observed rows
    assert abs(r["mean"] - 1.5) < 1e-12
    # n counts only the 2 observed rows → finite-sample factor n/(n-1) = 2
    se_expected = math.sqrt(2.0 * ((1 - 1.5) ** 2 + (2 - 1.5) ** 2)) / 2.0
    assert abs(r["se"] - se_expected) < 1e-12


def test_full_outer_fold_null_columns_survive(spark):
    """Reference J1: areas missing an estimator keep NULL in that column
    (the comparison table relies on it, Rmd:466-472)."""
    a = spark.createDataFrame([Row(state="A", x=1.0), Row(state="B", x=2.0)])
    b = spark.createDataFrame([Row(state="B", y=3.0), Row(state="C", y=4.0)])
    rows = {r.state: (r.x, r.y) for r in full_outer_fold([a, b], "state").collect()}
    assert rows["A"] == (1.0, None)
    assert rows["B"] == (2.0, 3.0)
    assert rows["C"] == (None, 4.0)


def test_empty_group_absent_not_zero(spark):
    """groupBy produces no row for an empty group (R's loop-over-states
    would too); downstream full-outer joins surface it as NULL, never 0."""
    df = spark.createDataFrame([Row(g="a", y=1.0, w=1.0)]).filter("g = 'zz'")
    assert weighted_mean_by_group(df, "g", "y", "w").count() == 0
