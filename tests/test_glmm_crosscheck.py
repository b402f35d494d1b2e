"""Independent GLMM cross-check (VERDICT r12 "What's missing" #1): fit
the random-intercept logistic model by EXACT marginal maximum likelihood
— adaptive-free Gauss-Hermite quadrature over the random intercept, the
same integral ``glmer(nAGQ=k)`` maximizes — in pure NumPy (no R, no
scipy/statsmodels in this env), from a NEUTRAL start, on the exact cell
table the EM consumes. Then compare against the EM's pinned golden
parameters (tests/test_stats_pipeline.py pins the EM output to 1e-4, so
comparing to the goldens IS comparing to the EM fit).

Findings this pins (measured, not assumed):

- **β: the EM matches exact ML** — max |β_EM − β_GHQ| ≈ 0.021 on the
  seed-42 fixture (vs coefficient scales 0.1-1.5). The paper's EM is a
  faithful likelihood maximizer in the fixed effects.
- **σ: the reference's estimator is NOT the ML estimator, by
  construction** — Method_code.Rmd:301-310 maximizes
  Q(σ²) = log σ² − (n_units/2)·log σ² − mean_r(Σ_s ni_s·ṽ²_{r,s})/(2σ²),
  i.e. σ̂² = (ni-weighted posterior second moment of v)/(n_units − 2).
  The Laplace posterior shrinks v̂ toward 0, so the fixed point sits
  BELOW the exact-ML σ̂: measured 0.156 (EM, = the reference's method)
  vs 0.304 (exact GHQ ML) vs 0.4 (fixture truth). stats/em.py
  reproduces the reference's estimator exactly (the parity goal); this
  test pins the measured attenuation RATIO so any silent drift in
  either direction — toward ML (semantics change) or further down
  (shrinkage bug) — fails loudly.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_stats_pipeline import GOLDEN_BETA, GOLDEN_SIGMA


def _softplus(z: np.ndarray) -> np.ndarray:
    return np.where(z > 30, z, np.log1p(np.exp(np.minimum(z, 30))))


def _nelder_mead(f, x0, step=0.05, fatol=1e-10, maxiter=20000):
    """Classic Nelder-Mead (α=1, γ=2, ρ=σ=1/2) — pure NumPy; this env
    has no scipy, and 9 parameters × cheap vectorized evaluations make
    the simplex perfectly adequate (~2k iterations, seconds)."""
    n = len(x0)
    simplex = [np.array(x0, float)]
    for i in range(n):
        p = np.array(x0, float)
        p[i] += step
        simplex.append(p)
    fv = [f(p) for p in simplex]
    for _ in range(maxiter):
        order = np.argsort(fv)
        simplex = [simplex[i] for i in order]
        fv = [fv[i] for i in order]
        if abs(fv[-1] - fv[0]) < fatol:
            break
        c = np.mean(simplex[:-1], axis=0)
        xr = c + (c - simplex[-1])
        fr = f(xr)
        if fr < fv[0]:
            xe = c + 2 * (c - simplex[-1])
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = c + 0.5 * (simplex[-1] - c)
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    fv[i] = f(simplex[i])
    order = np.argsort(fv)
    return simplex[order[0]], fv[order[0]]


@pytest.fixture(scope="module")
def ghq_fit(spark):
    """Exact marginal-ML fit on the seed-42 fixture's cell table."""
    from data_integration_spark.stats.design import (
        X_COLS,
        design_cells,
        prep_design,
    )
    from data_integration_spark.stats.fixtures import make_fixtures

    fx = make_fixtures()
    small = spark.createDataFrame(fx["survey_small"])
    cells = design_cells(prep_design(small), with_outcome=True).toPandas()
    states = sorted(cells["state"].unique())
    sidx = np.array([states.index(s) for s in cells["state"]])
    X = np.column_stack([np.ones(len(cells)), cells[X_COLS].to_numpy(float)])
    y = cells["y"].to_numpy(float)
    m = cells["m"].to_numpy(float)
    n_states = len(states)

    t_q, w_q = np.polynomial.hermite.hermgauss(40)
    logw = np.log(w_q / np.sqrt(np.pi))

    def nll(params):
        beta, logsig = params[:8], params[8]
        sig = np.exp(logsig)
        xb = X @ beta
        z = xb[:, None] + np.sqrt(2.0) * sig * t_q[None, :]
        ll_cell = -(
            y[:, None] * _softplus(-z) + (1 - y[:, None]) * _softplus(z)
        ) * m[:, None]
        per = np.zeros((n_states, len(t_q)))
        np.add.at(per, sidx, ll_cell)
        mx = per.max(axis=1, keepdims=True)
        return -float(
            (
                mx[:, 0]
                + np.log(np.exp(per - mx + logw[None, :]).sum(axis=1))
            ).sum()
        )

    # the EM's own neutral start (beta 0.1's, sigma 0.1) + one refining
    # restart from the first optimum
    x0 = np.concatenate([np.full(8, 0.1), [np.log(0.1)]])
    best, _ = _nelder_mead(nll, x0)
    best, _ = _nelder_mead(nll, best, step=0.01)
    return best[:8], float(np.exp(best[8]))


def test_em_beta_matches_exact_marginal_ml(ghq_fit):
    beta_ghq, _sig = ghq_fit
    gap = np.abs(beta_ghq - np.asarray(GOLDEN_BETA)).max()
    assert gap < 0.05, gap  # measured 0.021 on the seed-42 fixture


def test_ghq_fit_recovers_fixture_truth(ghq_fit):
    """Sanity on the cross-checker itself: the exact-ML fit sits near
    the fixture's generating parameters (finite-sample noise only)."""
    from data_integration_spark.stats.fixtures import BETA_TRUE, SIGMA_TRUE

    beta_ghq, sig_ghq = ghq_fit
    assert np.abs(beta_ghq - np.asarray(BETA_TRUE)).max() < 0.3
    assert abs(sig_ghq - SIGMA_TRUE) < 0.2  # measured 0.304 vs 0.4


def test_reference_sigma_attenuation_is_pinned(ghq_fit):
    """The reference's σ estimator (shrunken-posterior second moment
    over n_units − 2, Rmd:301-310) sits BELOW exact ML by construction;
    pin the measured ratio band so drift in EITHER direction fails:
    toward 1 means someone changed the estimator's semantics (breaking
    reference parity); further down means new shrinkage crept in."""
    _beta, sig_ghq = ghq_fit
    ratio = GOLDEN_SIGMA / sig_ghq
    assert 0.35 < ratio < 0.75, (GOLDEN_SIGMA, sig_ghq)  # measured 0.512
