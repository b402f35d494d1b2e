"""Scalar math helpers — all native Column expressions (JVM-side, codegen'd).

Reference parity (SURVEY.md §2.8):
- X1 ``qlogis`` (logit): covariate transform, ``Method_code.Rmd:69,134,234,600``
- X2 inverse-logit: the reference hand-writes ``exp(x)/(1+exp(x))`` at 7 sites
  (``Rmd:254-255,327-328,414,423,434,573-574,664``); we use the numerically
  stabler ``1/(1+exp(-x))`` (identical values, no overflow for large x).
- P5/M4 linear predictor: ``x_beta_func`` (``Rmd:94-151``) is an O(n) row loop
  with per-row if/else; here it collapses to one vectorized expression.

No Python UDFs anywhere in this module — every helper returns a Column that
stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def logit(p: Column | str) -> Column:
    """log(p/(1-p)) — R's ``qlogis`` (``Rmd:234``). p must lie in (0,1);
    p in {0,1} yields ±Infinity exactly as ``qlogis`` does (documented
    boundary semantics, SURVEY.md §7.4.5)."""
    p = _c(p)
    return F.log(p / (F.lit(1.0) - p))


def expit(x: Column | str) -> Column:
    """Inverse logit 1/(1+exp(-x)) (``Rmd:254-255`` et al.)."""
    x = _c(x)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def linear_predictor(
    intercept: float, terms: Sequence[tuple[Column | str, float]]
) -> Column:
    """b0 + Σ b_k·x_k as one native expression (replaces ``x_beta_func``,
    ``Rmd:94-151``; constant folding by Catalyst)."""
    out: Column = F.lit(float(intercept))
    for col, beta in terms:
        out = out + _c(col) * F.lit(float(beta))
    return out
