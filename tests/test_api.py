"""Engine facade: the reference notebook's step sequence through the
public API."""

from __future__ import annotations

import pytest

from data_integration_spark.api import Engine, em_on_simulated
from data_integration_spark.stats.em import EMEstimator
from data_integration_spark.stats.fixtures import make_fixtures


@pytest.fixture(scope="module")
def engine(spark):
    fx = make_fixtures(n_states=12, big_per_state=(80, 150))
    eng = Engine(spark, seed=7).load(
        spark.createDataFrame(fx["survey_small"]).cache(),
        spark.createDataFrame(fx["survey_big"]).cache(),
        spark.createDataFrame(fx["actual_result"]),
    )
    return eng, fx


def test_reference_workflow_through_api(engine):
    eng, fx = engine
    glm = eng.fit_glm()
    assert len(glm.beta_) == 8
    fit = eng.fit_em(n_reps=150, tol=0.02, max_iter=40)
    assert fit.converged
    err = eng.error_measures().set_index("estimator")
    assert {"direct", "EM_est"} == set(err.index)
    report = eng.final_report(
        bootstrap_reps=1, em=EMEstimator(n_reps=60, tol=0.05, max_iter=8, seed=9)
    )
    rows = report.collect()
    assert len(rows) == 12
    assert {"state", "name", "actual_val", "direct_est", "EBP_est",
            "direct_SE", "EBP_SE"} == set(report.columns)


def test_em_on_simulated_helper(spark, engine):
    _, fx = engine
    fit = em_on_simulated(
        spark,
        spark.createDataFrame(fx["survey_small"]),
        n_reps=100,
        tol=0.05,
        max_iter=10,
        seed=3,
    )
    assert len(fit.beta_hat) == 8 and fit.sigma_hat > 0


def test_save_maps_writes_one_svg_per_estimator(engine, tmp_path):
    """S4 through the facade: one choropleth SVG per estimator column of
    the comparison table (the reference's three plot_usmap outputs)."""
    eng, _ = engine
    paths = eng.save_maps(str(tmp_path), columns=("actual", "EM_est"))
    assert len(paths) == 2
    for p in paths:
        svg = open(p).read()
        assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
        assert svg.count("<rect") >= 12  # every fixture area drawn
