"""Property tests for the r12 sketch/linkage algorithms — the driver-side
pure kernels exercised on ADVERSARIAL inputs (Hypothesis), complementing
the fixed-example tests in test_heavy_hitters.py / test_fs_linkage.py.
Pure Python only (no Spark session): the distributed forms are pinned
against these same kernels elsewhere, so hammering the kernels here
hammers the whole operator.

Laws under test:
- Misra-Gries: size ≤ k, two-sided error band, guaranteed presence
  above n/(k+1) — on arbitrary streams AND through arbitrary merge
  splits (the PODS-2012 composition).
- Fellegi-Sunter EM: observed-data log-likelihood is non-decreasing,
  every estimate stays a probability, and the pattern-weight scorer is
  finite — on arbitrary contingency tables, including degenerate ones.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from data_integration_spark.operators.heavy_hitters import (
    _mg_stream,
    mg_merge,
)
from data_integration_spark.stats.fs_linkage import fs_em, fs_weights

_tokens = st.lists(
    st.sampled_from([f"t{i}" for i in range(12)]), min_size=1, max_size=400
)


@settings(max_examples=60, deadline=None)
@given(toks=_tokens, k=st.integers(2, 10))
def test_mg_theorem_on_arbitrary_streams(toks, k):
    summary = _mg_stream(toks, k)
    n = len(toks)
    exact: dict[str, int] = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    assert len(summary) <= k
    for tok, true in exact.items():
        est = summary.get(tok, 0)
        assert 0 <= est <= true
        assert est >= true - n / (k + 1)
        if true > n / (k + 1):
            assert tok in summary


@settings(max_examples=40, deadline=None)
@given(
    toks=_tokens,
    k=st.integers(2, 8),
    cuts=st.lists(st.integers(0, 400), max_size=4),
)
def test_mg_merge_composition_keeps_the_band(toks, k, cuts):
    """Split the stream at arbitrary points, summarize each piece, fold
    with mg_merge in order — the combined summary must satisfy the SAME
    n/(k+1) band as a single-pass summary would (the mergeability
    theorem, adversarial split points)."""
    n = len(toks)
    points = sorted({min(c, n) for c in cuts} | {0, n})
    merged: dict[str, int] = {}
    for lo, hi in zip(points, points[1:]):
        merged = mg_merge(merged, _mg_stream(toks[lo:hi], k), k)
    exact: dict[str, int] = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    assert len(merged) <= k
    for tok, true in exact.items():
        est = merged.get(tok, 0)
        assert 0 <= est <= true
        assert est >= true - n / (k + 1)


_tables = st.lists(
    st.tuples(
        st.tuples(st.integers(0, 1), st.integers(0, 1)),
        st.integers(1, 500),
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda gc: gc[0],
)


@settings(max_examples=60, deadline=None)
@given(table=_tables)
def test_fs_em_laws_on_arbitrary_tables(table):
    pi, m, u, lls = fs_em(table, iters=40)
    assert 0.0 < pi < 1.0
    for probs in (m, u):
        assert all(0.0 < p < 1.0 for p in probs)
    # EM theorem: observed-data LL non-decreasing (tolerance for the
    # clamp, which can nick the guarantee by at most ~eps per field)
    assert all(b >= a - 1e-6 for a, b in zip(lls, lls[1:])), lls
    agree, disagree = fs_weights(m, u)
    assert all(math.isfinite(x) for x in agree + disagree)
