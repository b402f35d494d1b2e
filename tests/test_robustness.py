"""Edge-input robustness: empty frames, single groups, degenerate data —
the engine must degrade gracefully, not throw (ANSI mode makes this worth
pinning)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_spark.dedup.exact import exact_dedup
from data_integration_spark.dedup.minhash import minhash_lsh_pairs
from data_integration_spark.functions.stats import survey_mean_se, weighted_mean_by_group
from data_integration_spark.operators.asof import asof_join
from data_integration_spark.stats.em import EMEstimator
from data_integration_spark.stats.fixtures import make_fixtures


def test_empty_input_aggregates(spark):
    empty = spark.createDataFrame([], "g string, y double, w double")
    assert weighted_mean_by_group(empty, "g", "y", "w").count() == 0
    assert survey_mean_se(empty, "g", "y", "w").count() == 0


def test_empty_corpus_dedup(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0


def test_em_single_area(spark):
    """One-area survey: the random-intercept model degenerates gracefully
    (v̂ exists, σ̂ bounded, β finite)."""
    fx = make_fixtures(n_states=3, n_absent=0, small_per_state=(60, 80))
    pdf = fx["survey_small"]
    one = pdf[pdf["state"] == sorted(pdf["state"].unique())[0]]
    fit = EMEstimator(n_reps=50, tol=0.05, max_iter=10, seed=1).fit(
        spark.createDataFrame(one)
    )
    assert len(fit.v_hat) == 1
    assert 0.0 < fit.sigma_hat <= 10.0
    assert all(abs(b) < 50 for b in fit.beta_hat)


def test_em_constant_outcome_area(spark):
    """An area where everyone voted the same way (the separation case that
    breaks unpenalized logistic fits) must still produce a bounded v̂."""
    fx = make_fixtures(n_states=4, n_absent=0, small_per_state=(30, 40))
    pdf = fx["survey_small"].copy()
    s0 = sorted(pdf["state"].unique())[0]
    pdf.loc[pdf["state"] == s0, "demvote"] = 1
    fit = EMEstimator(n_reps=50, tol=0.05, max_iter=8, seed=1).fit(
        spark.createDataFrame(pdf)
    )
    v = fit.v_hat.set_index("state").loc[s0, "v_hat"]
    assert -3.0 <= v <= 3.0  # the reference's optimizer bounds hold


def test_asof_empty_right(spark):
    left = spark.createDataFrame([Row(event_id=1, user_id=1, ts=1.0)])
    right = spark.createDataFrame([], "user_id long, ts double, value double")
    out = asof_join(left, right, key="user_id", ts="ts").collect()
    assert len(out) == 1 and out[0].value_asof is None


def test_bigram_lm_empty_train_slice_raises(spark, tmp_path):
    """A train slice with NO tokens must fail loudly (every smoothed
    probability would be 1/0 → ±Inf log-probs), not emit garbage
    scores."""
    import pytest

    from data_integration_spark.queries.text_pipeline import q_bigram_lm_score

    # every doc_id % 4 != 0 (train) doc is EMPTY: zero train tokens
    docs = spark.createDataFrame(
        [(i, "tok a b" if i % 4 == 0 else "") for i in range(12)],
        "doc_id bigint, text string",
    )
    sf = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    with pytest.raises(ValueError, match="no tokens"):
        q_bigram_lm_score(spark, sf).collect()
