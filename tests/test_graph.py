"""PageRank operator properties: mass conservation on symmetric graphs and
agreement with a NumPy power iteration on a pinned fixture."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_spark.operators.graph import pagerank


@pytest.fixture(scope="module")
def toy_edges(spark):
    # symmetric weighted triangle + pendant pair, node ids 0..4
    raw = [
        (0, 1, 2.0), (1, 0, 2.0),
        (1, 2, 1.0), (2, 1, 1.0),
        (0, 2, 1.0), (2, 0, 1.0),
        (3, 4, 1.0), (4, 3, 1.0),
        (2, 3, 1.0), (3, 2, 1.0),
    ]
    return spark.createDataFrame(raw, "src int, dst int, weight double")


def _numpy_pagerank(raw, n, n_iter=10, d=0.85):
    W = np.zeros((n, n))
    for s, t, w in raw:
        W[s, t] += w
    P = W / W.sum(axis=1, keepdims=True)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - d) / n + d * P.T @ r
    return r


def test_pagerank_matches_numpy(spark, toy_edges):
    got = {
        r["node"]: r["rank"]
        for r in pagerank(toy_edges, n_iter=10).collect()
    }
    want = _numpy_pagerank(
        [(r.src, r.dst, r.weight) for r in toy_edges.collect()], 5
    )
    assert set(got) == set(range(5))
    for i in range(5):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_mass_conserved_on_symmetric_graph(spark, toy_edges):
    total = (
        pagerank(toy_edges, n_iter=10)
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_on_regular_graph(spark):
    # 4-cycle with equal weights: stationary distribution is uniform
    raw = [(i, (i + 1) % 4, 1.0) for i in range(4)] + [
        ((i + 1) % 4, i, 1.0) for i in range(4)
    ]
    edges = spark.createDataFrame(raw, "src int, dst int, weight double")
    ranks = pagerank(edges, n_iter=15).collect()
    for r in ranks:
        assert r["rank"] == pytest.approx(0.25, abs=1e-9)


def test_funnel_stages_monotone_and_bounded(spark):
    """Funnel invariants: stage user counts are non-increasing and
    conversion fractions sit in (0, 1]; the windowed variant can never
    exceed the unbounded funnel at any stage."""
    from data_integration_spark.queries.analytics import (
        q_funnel_analysis,
        q_funnel_conversion_window,
    )

    sf = "/root/testdata/sf0.01"
    reached = {
        r["reached_stage"]: 1
        for r in q_funnel_analysis(spark, sf).collect()
    }
    by_stage = {}
    for r in q_funnel_analysis(spark, sf).groupBy("reached_stage").count().collect():
        by_stage[r["reached_stage"]] = r["count"]
    # cumulative stage counts: stage k = users with reached_stage >= k
    c1 = sum(by_stage.values())
    c2 = by_stage.get(2, 0) + by_stage.get(3, 0)
    c3 = by_stage.get(3, 0)
    assert c1 >= c2 >= c3 > 0

    win = {r["stage"]: r for r in q_funnel_conversion_window(spark, sf).collect()}
    assert win[1]["n_users"] == c1
    assert win[2]["n_users"] <= c2
    assert win[3]["n_users"] <= c3
    assert 0 < win[3]["conversion"] <= win[2]["conversion"] <= 1.0


def test_kaplan_meier_survival_monotone(spark):
    """KM invariants: survival starts ≤ 1, is strictly within (0, 1], and
    is non-increasing in duration; n_at_risk is non-increasing too."""
    from data_integration_spark.queries.analytics import q_kaplan_meier

    rows = sorted(
        q_kaplan_meier(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    prev_s, prev_n = 1.0, float("inf")
    for r in rows:
        assert 0 < r["survival"] <= prev_s <= 1.0, r
        assert r["n_at_risk"] <= prev_n
        assert r["n_events"] >= 1
        prev_s, prev_n = r["survival"], r["n_at_risk"]
