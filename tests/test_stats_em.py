"""Statistical-layer tests: parameter recovery (the reference README's
intended validation), mode equivalence, GLM cross-check (SURVEY.md §5.2.4)."""

from __future__ import annotations

import numpy as np
import pytest

from data_integration_spark.stats.em import EMEstimator
from data_integration_spark.stats.fixtures import BETA_TRUE, SIGMA_TRUE, make_fixtures
from data_integration_spark.stats.glmm import FixedEffectsGLM


@pytest.fixture(scope="module")
def fixtures():
    return make_fixtures()


@pytest.fixture(scope="module")
def small_df(spark, fixtures):
    return spark.createDataFrame(fixtures["survey_small"]).cache()


def test_glm_recovers_fixed_effects(small_df):
    glm = FixedEffectsGLM().fit(small_df)
    err = np.abs(glm.beta_ - BETA_TRUE)
    assert err.max() < 0.5, f"GLM beta error too large: {glm.beta_} vs {BETA_TRUE}"
    assert err.mean() < 0.2


def test_em_parameter_recovery(small_df):
    """README.md:12: the EM function 'can be used on simulated datasets' —
    parameter recovery on data generated from known (β, σ)."""
    em = EMEstimator(n_reps=300, tol=0.01, max_iter=100, mode="driver", seed=42)
    fit = em.fit(small_df)
    assert fit.converged
    err = np.abs(fit.beta_hat - BETA_TRUE)
    assert err.max() < 0.4, f"beta error: {fit.beta_hat} vs {BETA_TRUE}"
    assert err.mean() < 0.18
    assert abs(fit.sigma_hat - SIGMA_TRUE) < 0.25
    # every modeled area got a Laplace point in bounds
    assert len(fit.v_hat) == 49
    assert fit.v_hat["v_hat"].abs().max() <= 3.0
    assert (fit.v_hat["tau_hat_sq"] > 0).all()


def test_em_draws_differ_across_areas_and_reps(small_df):
    """SURVEY.md §5.3: the reference's seed bug made all areas/reps draw the
    SAME v; our per-(area, rep) hash seeding must not."""
    em = EMEstimator(n_reps=50, max_iter=1, mode="driver", seed=1)
    em.fit(small_df)
    z = em._z_base
    # distinct across areas within a rep, and across reps within an area
    assert len(np.unique(np.round(z[0, :], 12))) == z.shape[1]
    assert len(np.unique(np.round(z[:, 0], 12))) == z.shape[0]


def test_em_modes_agree(spark, fixtures):
    """driver (NumPy) and distributed (Spark-agg) modes share draws and must
    produce near-identical estimates (fp association order only)."""
    pdf = fixtures["survey_small"]
    sub = pdf[pdf["state"].isin(sorted(pdf["state"].unique())[:8])]
    df = spark.createDataFrame(sub)
    kw = dict(n_reps=100, tol=0.05, max_iter=5, seed=42)
    fit_d = EMEstimator(mode="driver", **kw).fit(df)
    fit_s = EMEstimator(mode="distributed", **kw).fit(df)
    assert fit_d.n_iter == fit_s.n_iter
    np.testing.assert_allclose(fit_d.beta_hat, fit_s.beta_hat, atol=1e-6)
    assert abs(fit_d.sigma_hat - fit_s.sigma_hat) < 1e-8


def test_weighted_glm_equals_duplicated_rows(spark, fixtures):
    """svyglm analog: integer case-weights must equal physically duplicated
    rows (the defining property of a weighted likelihood fit)."""
    import pandas as pd

    pdf = fixtures["survey_small"]
    sub = pdf[pdf["state"].isin(sorted(pdf["state"].unique())[:6])].copy()
    sub["w2"] = (sub["ID"] % 3 + 1).astype("double")
    weighted = FixedEffectsGLM(weight_col="w2").fit(spark.createDataFrame(sub))
    dup = sub.loc[sub.index.repeat(sub["w2"].astype(int))]
    duplicated = FixedEffectsGLM().fit(spark.createDataFrame(dup))
    assert np.abs(weighted.beta_ - duplicated.beta_).max() < 1e-5


def test_em_stationarity_certificate_margins(spark, fixtures):
    """q_em_convergence's premise: at tol=1e-4 the recomputed fixed-point
    residuals sit ORDERS OF MAGNITUDE below the 0.005 rounding threshold
    the literal-0.0 oracle implies — pin the raw (pre-round) margins so a
    slow fitting-path drift is caught here before it reaches the driver
    hash. Also pins the certificate's engine-independent fields."""
    from data_integration_spark.stats.em import em_stationarity_certificate

    pdf = fixtures["survey_small"]
    sub = pdf[pdf["state"].isin(sorted(pdf["state"].unique())[:8])]
    df = spark.createDataFrame(sub)
    est = EMEstimator(n_reps=50, tol=1e-4, max_iter=400, mode="driver", seed=5)
    fit = est.fit(df)
    cert = em_stationarity_certificate(df, fit, est)
    assert cert["converged"] == 1
    assert cert["n_obs"] == len(sub)
    assert cert["n_areas"] == 8
    # 10x safety margin below the 2-decimal rounding threshold
    assert cert["beta_score_inf_norm"] < 5e-4
    assert cert["sigma_fixed_point_resid"] < 5e-4
