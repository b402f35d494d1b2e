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
