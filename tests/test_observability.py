"""df.observe-based quality metrics: zero-extra-scan observability."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_spark.operators.observability import (
    checked_write,
    observe_quality,
    standard_metrics,
)


def test_observe_quality_rides_the_action(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=10.0), Row(k=2, v=None), Row(k=3, v=30.0)]
    )
    observed, obs = observe_quality(
        df, {**standard_metrics("v"), "v_max": F.max("v")}
    )
    assert observed.count() == 3  # the action that computes the metrics
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_v"] == 1
    assert got["v_max"] == 30.0


def test_checked_write_passes_and_returns_metrics(spark, tmp_path):
    df = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(10)])
    got = checked_write(
        df,
        str(tmp_path / "ok"),
        standard_metrics("v"),
        {"n_rows": lambda n: n == 10, "n_null_v": lambda n: n == 0},
    )
    assert got["n_rows"] == 10
    assert spark.read.parquet(str(tmp_path / "ok")).count() == 10


def test_checked_write_raises_on_violation(spark, tmp_path):
    df = spark.createDataFrame([Row(k=1, v=None), Row(k=2, v=2.0)])
    with pytest.raises(ValueError, match="n_null_v"):
        checked_write(
            df,
            str(tmp_path / "bad"),
            standard_metrics("v"),
            {"n_null_v": lambda n: n == 0},
        )
