"""Fellegi-Sunter linkage laws (stats/fs_linkage.py + the staged
q_linkage_* family) at value level — what the certificate states as
booleans, pinned exactly here.

The planted corruption is pure CRT arithmetic, so the classifier's
confusion matrix is EXACTLY derivable: a true pair is missed iff its
name is corrupted (custkey % 5 = 0) AND its balance drifted past the
3.5 band (custkey % 7 ∈ {4,5,6}) — patterns (0,0,0)/(0,1,0), both
negative-weight. This file pins that count, the EM parameter recovery
against the planted field rates, and the EM monotone-likelihood law.
"""

from __future__ import annotations

import math

import pytest

from data_integration_spark.queries.er_retrieval import (
    _FS_GAMMA,
    _fs_pairs,
)
from data_integration_spark.stats.fs_linkage import (
    fs_em,
    fs_weights,
    pattern_table,
    score_pairs,
)

SF = "/root/testdata/sf0.001"
# custkeys in this synthetic testdata are 0-BASED: 0..149 (verified
# MIN/MAX in the parquet) — so range(N_CUST) enumerates them exactly
N_CUST = 150


def test_fs_em_unit_two_point():
    """Hand-made separable table: 100 clear matches (1,1), 900 clear
    non-matches (0,0) → EM must put π ≈ 0.1, m ≈ 1, u ≈ 0."""
    table = [((1, 1), 100), ((0, 0), 900)]
    pi, m, u, lls = fs_em(table)
    assert pi == pytest.approx(0.1, abs=1e-3)
    assert all(mf > 0.99 for mf in m)
    assert all(uf < 0.01 for uf in u)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:]))


@pytest.fixture(scope="module")
def fitted(spark):
    pairs = _fs_pairs(spark, SF).cache()
    pi, m, u, lls = fs_em(pattern_table(pairs, _FS_GAMMA))
    yield pairs, pi, m, u, lls
    pairs.unpersist()


def test_em_recovers_planted_field_rates(fitted):
    """m_f must land on the planted corruption rates (matches agree on
    name 4/5 of the time, segment 2/3, balance 4/7) and u_f on the
    cross-pair base rates (name never, balance ~0.1%)."""
    _pairs, pi, m, u, lls = fitted
    m_name, m_seg, m_bal = m
    u_name, _u_seg, u_bal = u
    assert m_name == pytest.approx(4 / 5, abs=0.05)
    assert m_seg == pytest.approx(2 / 3, abs=0.07)
    assert m_bal == pytest.approx(4 / 7, abs=0.07)
    assert u_name < 0.01
    assert u_bal < 0.01
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:]))
    # π ≈ true-match fraction of the blocked pair space
    n_pairs = sum(c for _g, c in pattern_table(_pairs, _FS_GAMMA))
    assert pi == pytest.approx(N_CUST / n_pairs, rel=0.25)


def test_confusion_matrix_is_crt_exact(spark, fitted):
    pairs, _pi, m, u, _lls = fitted
    from pyspark.sql import functions as F

    scored = score_pairs(pairs, _FS_GAMMA, m, u)
    agg = scored.agg(
        F.sum(
            ((F.col("is_true") == 1) & (F.col("weight") > 0)).cast("long")
        ).alias("tp"),
        F.sum(
            ((F.col("is_true") == 0) & (F.col("weight") > 0)).cast("long")
        ).alias("fp"),
        F.sum(F.col("is_true")).cast("long").alias("n_true"),
    ).collect()[0]
    missed_expected = sum(
        1 for k in range(N_CUST) if k % 5 == 0 and k % 7 in (4, 5, 6)
    )
    assert int(agg["n_true"]) == N_CUST
    assert int(agg["tp"]) == N_CUST - missed_expected  # EXACT, not a bound
    # false positives can only come from the ~0.1% balance-band pairs
    assert int(agg["fp"]) <= 5


def test_score_expression_matches_driver_arithmetic(spark, fitted):
    """score_pairs builds the weight as a native column expression; it
    must equal the driver-side Σ log-ratio fold bit-for-bit on every
    observed pattern."""
    pairs, _pi, m, u, _lls = fitted
    agree, disagree = fs_weights(m, u)
    rows = (
        score_pairs(pairs, _FS_GAMMA, m, u)
        .select(*_FS_GAMMA, "weight")
        .distinct()
        .collect()
    )
    assert len(rows) <= 8
    for r in rows:
        expect = 0.0
        for f, g in enumerate(_FS_GAMMA):
            expect += agree[f] if r[g] == 1 else disagree[f]
        assert r["weight"] == pytest.approx(expect, abs=1e-12), tuple(r)


def test_degenerate_field_clamps_not_infinities():
    """A field that ALWAYS agrees among matches and never among
    non-matches hits the probability clamp, not log(0)."""
    table = [((1,), 50), ((0,), 950)]
    _pi, m, u, _lls = fs_em(table)
    agree, disagree = fs_weights(m, u)
    assert all(math.isfinite(x) for x in agree + disagree)


def test_linkage_plan_contract(spark):
    """The blocked pair join must be a hash/merge EQUI-join on
    (nationkey, bucket) — never a cartesian or nested-loop — and the
    pattern reduction must be a partial (map-side-combined) aggregate,
    so the only full shuffle carries ≤ 2^F pattern keys."""
    from data_integration_spark.queries.er_retrieval import _FS_GAMMA

    plan = (
        _fs_pairs(spark, SF)
        .groupBy(*_FS_GAMMA)
        .count()
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial + final aggregate pair (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_streaming_linkage_matches_batch_and_order_independent(spark):
    """The streamed frozen-weight apply must emit exactly the batch
    pairs restricted to the streamed side — and since each batch joins
    only against the STATIC clean side with frozen weights, the file
    replay order cannot change the set (unlike the registry-appending
    streams, there is nothing order-dependent to guard, but pin it
    anyway: the cheapest way this breaks is someone later adding a
    mutable registry without re-deriving the claim)."""
    from pyspark.sql import functions as F

    from data_integration_spark.queries import QUERIES, load_all

    load_all()
    fn = QUERIES["q_streaming_linkage"]  # live since the r13 flip
    streamed = {
        (r["a_key"], r["b_key"], r["g_name"], r["g_seg"], r["g_bal"])
        for r in fn(spark, SF).collect()
    }
    pairs = _fs_pairs(spark, SF)
    _pi, m, u, _lls = fs_em(pattern_table(pairs, _FS_GAMMA))
    batch = {
        (r["a_key"], r["b_key"], r["g_name"], r["g_seg"], r["g_bal"])
        for r in score_pairs(pairs, _FS_GAMMA, m, u)
        .filter((F.col("b_key") < 60) & (F.col("weight") > 0))
        .collect()
    }
    assert streamed == batch
    assert len(streamed) >= 50  # non-vacuous at sf0.001 (55 observed)
