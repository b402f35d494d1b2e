"""Golden end-to-end pipeline test (SURVEY.md §5.2.5): load → EM → EBP →
direct → comparison → bootstrap MSPE → final report, on the FIXTURES.md
synthetic surveys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_spark.stats.em import EMEstimator
from data_integration_spark.stats.fixtures import make_fixtures
from data_integration_spark.stats.pipeline import run_pipeline


@pytest.fixture(scope="module")
def fx():
    return make_fixtures()


@pytest.fixture(scope="module")
def result(spark, fx):
    small = spark.createDataFrame(fx["survey_small"]).cache()
    big = spark.createDataFrame(fx["survey_big"]).cache()
    actuals = spark.createDataFrame(fx["actual_result"])
    return (
        run_pipeline(
            spark,
            small,
            big,
            actuals,
            em=EMEstimator(n_reps=300, tol=0.01, max_iter=60, seed=42),
            ebp_draws=100,
            bootstrap_reps=2,
            bootstrap_em=EMEstimator(n_reps=100, tol=0.05, max_iter=15, seed=43),
        ),
        fx,
    )


def test_report_covers_all_areas(result):
    res, fx = result
    rows = res.report.collect()
    assert len(rows) == 51  # every area, including the 2 absent from small


def test_absent_area_semantics(result):
    """FIXTURES.md acceptance: areas missing from the small survey get a
    non-null EBP (v=0 path) and a NULL direct estimate (full-outer join)."""
    res, fx = result
    absent = fx["truth"]["absent_states"]
    rows = {r.state: r for r in res.report.collect()}
    for s in absent:
        assert rows[s].EBP_est is not None
        assert rows[s].direct_est is None
    # modeled areas have both
    modeled = [s for s in rows if s not in absent]
    assert all(rows[s].direct_est is not None for s in modeled)


def test_ebp_beats_direct(result):
    """The paper's headline claim (Rmd:490-507 shape): model-based EBP has
    lower RASD than the direct estimator on area-effect data."""
    res, _ = result
    err = res.errors.set_index("estimator")
    assert err.loc["EM_est", "rasd"] < err.loc["direct", "rasd"]
    assert err.loc["EM_est", "aad"] < err.loc["direct", "aad"]


def test_estimates_in_percentage_range(result):
    res, _ = result
    rows = res.report.collect()
    for r in rows:
        assert 0.0 <= r.EBP_est <= 100.0
        if r.direct_est is not None:
            assert 0.0 <= r.direct_est <= 100.0


def test_mspe_present_and_positive(result):
    res, _ = result
    rows = res.report.collect()
    n_with_se = sum(1 for r in rows if r.EBP_SE is not None and r.EBP_SE >= 0)
    assert n_with_se == 51


def test_report_reproducible(spark, result):
    """Same inputs + same seeds → identical report (deterministic hash RNG
    end-to-end; SURVEY.md §4.3.4)."""
    res, fx = result
    small = spark.createDataFrame(fx["survey_small"])
    big = spark.createDataFrame(fx["survey_big"])
    actuals = spark.createDataFrame(fx["actual_result"])
    res2 = run_pipeline(
        spark, small, big, actuals,
        em=EMEstimator(n_reps=300, tol=0.01, max_iter=60, seed=42),
        ebp_draws=100, bootstrap_reps=0,
    )
    a = {r.state: (r.actual_val, r.direct_est, r.EBP_est) for r in res.report.collect()}
    b = {r.state: (r.actual_val, r.direct_est, r.EBP_est) for r in res2.report.collect()}
    assert a == b
