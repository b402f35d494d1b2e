"""Value-level laws for the r12 sketch-family additions.

Misra-Gries (operators/heavy_hitters.py): the certificate query can
only pin what is engine-independent, so the estimate-level theorem
lives here — two-sided bounds and guaranteed presence against exact
counts on a skewed stream, partition invariance of the theorem, exact
equality when k exceeds the vocabulary, and the PODS-2012 merge bound.

Quantile sketch: the GK rank-error bound's actual margin at the
certificate's accuracy, so the staged oracle's within_bound=1 is known
to hold with headroom rather than by luck.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_integration_spark.operators.heavy_hitters import (
    _mg_stream,
    mg_merge,
    misra_gries_summary,
)


def _skewed_tokens(n=20000, seed=11):
    """Zipf-ish stream: a few dominant tokens + a long tail."""
    rng = random.Random(seed)
    heavy = ["alpha", "beta", "gamma"]
    toks = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            toks.append("alpha")
        elif r < 0.45:
            toks.append("beta")
        elif r < 0.55:
            toks.append("gamma")
        else:
            toks.append(f"t{rng.randrange(2000)}")
    return toks, heavy


def _exact(toks):
    out: dict[str, int] = {}
    for t in toks:
        out[t] = out.get(t, 0) + 1
    return out


@pytest.mark.parametrize("parts", [1, 8])
def test_mg_theorem_holds_on_any_partitioning(spark, parts):
    toks, heavy = _skewed_tokens()
    exact = _exact(toks)
    n, k = len(toks), 16
    df = spark.createDataFrame(
        [(t,) for t in toks], "tok string"
    ).repartition(parts)
    summary, n_seen = misra_gries_summary(df, k)
    assert n_seen == n  # the rider stream length is exact
    assert len(summary) <= k
    thr = n / (k + 1)
    for tok, true in exact.items():
        est = summary.get(tok, 0)
        assert est <= true, tok
        assert est >= true - thr, (tok, est, true, thr)
        if true > thr:
            assert tok in summary, tok
    # the dominant tokens are far above threshold — must all be present
    for h in heavy:
        assert h in summary


def test_mg_exact_when_k_exceeds_vocab(spark):
    toks = ["x"] * 7 + ["y"] * 5 + ["z"] * 3
    df = spark.createDataFrame([(t,) for t in toks], "tok string").coalesce(1)
    summary, n_seen = misra_gries_summary(df, 16)
    assert n_seen == 15
    assert summary == {"x": 7, "y": 5, "z": 3}
    # and the sequential textbook reference agrees
    assert _mg_stream(toks, 16) == summary


def test_mg_merge_bound_and_size():
    """Merged summaries keep size ≤ k and the merged estimates stay
    within the summed streams' n/(k+1) band of the true totals."""
    rng = random.Random(5)
    k = 8
    streams = []
    for s in range(4):
        toks = [
            "hot" if rng.random() < 0.4 else f"s{s}_{rng.randrange(50)}"
            for _ in range(3000)
        ]
        streams.append(toks)
    merged: dict[str, int] = {}
    for toks in streams:
        merged = mg_merge(merged, _mg_stream(toks, k), k)
    all_toks = [t for s in streams for t in s]
    exact = _exact(all_toks)
    n = len(all_toks)
    assert len(merged) <= k
    for tok, true in exact.items():
        est = merged.get(tok, 0)
        assert est <= true
        assert est >= true - n / (k + 1), (tok, est, true)
    assert "hot" in merged  # true('hot') ≈ 0.4n >> n/(k+1)


def test_quantile_bound_margin(spark):
    """The staged q_quantile_sketch oracle states within_bound = 1 as a
    theorem constant; measure the ACTUAL rank error at the
    certificate's accuracy and assert it sits inside the n/accuracy
    slack — so the constant holds with real headroom, not by luck."""
    from data_integration_spark.sources.catalog import Catalog

    li = Catalog(spark, "/root/testdata/sf0.001")["lineitem"].select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    n = li.count()
    probes = [0.1, 0.5, 0.9]
    ests = li.agg(
        F.percentile_approx("v", probes, F.lit(1000)).alias("e")
    ).collect()[0]["e"]
    slack = n / 1000
    for p, e in zip(probes, ests):
        rank_le = li.filter(F.col("v") <= e).count()
        rank_lt = li.filter(F.col("v") < e).count()
        assert rank_le >= p * n - slack, (p, rank_le, n)
        assert rank_lt <= p * n + slack, (p, rank_lt, n)
        # the estimate is an observed element, never an interpolation
        assert li.filter(F.col("v") == e).count() > 0
