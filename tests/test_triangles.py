"""Value-level semantics for the triangle/clustering operators and the
batch-2 round-7 queries (graph census, ANN recall certificate, rolling
regression). Oracle parity runs in test_oracle_parity; these pin known
closed-form answers on hand-built graphs and the statistical properties
the hash can't state."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from data_integration_spark.operators.graph import (
    local_clustering,
    triangle_list,
    triangle_stats,
)
from data_integration_spark.queries import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


def _edges_df(spark, edges):
    return spark.createDataFrame(list(edges), "a long, b long")


def test_k4_census(spark):
    k4 = _edges_df(spark, combinations(range(4), 2))
    row = triangle_stats(k4).collect()[0]
    assert row["n_nodes"] == 4 and row["n_edges"] == 6
    assert row["n_wedges"] == 12 and row["n_triangles"] == 4
    assert row["clustering_coeff"] == 1.0


def test_hub_graph_counts_match_bruteforce(spark):
    # star hub 0 -> 1..20 (no triangles through spokes alone) plus a ring
    # of consecutive-spoke edges, which closes 20 triangles at the hub.
    spokes = [(0, i) for i in range(1, 21)]
    ring = [(i, i % 20 + 1) for i in range(1, 21)]
    # duplicate + reversed rows must collapse in canonicalization
    noisy = spokes + ring + [(b, a) for a, b in spokes] + ring
    adj = set(map(frozenset, spokes + ring))
    brute = sum(
        1
        for t in combinations(range(21), 3)
        if all(frozenset(p) in adj for p in combinations(t, 2))
    )
    row = triangle_stats(_edges_df(spark, noisy)).collect()[0]
    assert row["n_triangles"] == brute == 20
    assert row["n_edges"] == len(adj) == 40
    tri_rows = triangle_list(_edges_df(spark, noisy)).collect()
    assert len(tri_rows) == 20
    assert len({tuple(sorted((r["t"], r["x"], r["y"]))) for r in tri_rows}) == 20


def test_local_clustering_triangle_plus_tail(spark):
    # triangle 1-2-3 with a tail 3-4: node 3 has deg 3, 1 triangle,
    # lcc = 2*1/(3*2) = 1/3; node 4 has deg 1 -> excluded (deg >= 2).
    g = _edges_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    rows = {r["node"]: r for r in local_clustering(g).collect()}
    assert 4 not in rows
    assert rows[1]["n_tri"] == 1 and rows[1]["local_cc"] == 1.0
    assert rows[3]["deg"] == 3 and rows[3]["local_cc"] == pytest.approx(1 / 3, abs=1e-6)


def test_ann_recall_certificate_bounds(spark):
    row = QUERIES["q_ann_recall_certificate"](spark, SF_SMALL).collect()[0]
    assert row["n_queries"] == 20 and row["n_truth"] == 100
    assert 0 <= row["n_hit"] <= row["n_truth"]
    assert row["recall_at_5"] == pytest.approx(row["n_hit"] / 100, abs=1e-6)
    # the synthetic corpus has no true near-neighbors: the certificate
    # must REPORT that regime, not hide it (see the query docstring)
    assert row["mean_truth_cosine"] < 0.6


def test_lsh_topk_recall_on_clustered_corpus(spark):
    """On a corpus WITH real near-neighbors (12 clusters × 5 jittered
    members), lsh_topk's top-4 per query recovers ≥ 0.9 of the exact
    top-4 (the other 4 cluster members dominate every truth list and
    collide with the query in some table)."""
    import math
    import random

    from pyspark.sql import Row

    from data_integration_spark.similarity.ann import (
        as_double_array,
        cosine_topk_vectorized,
        lsh_topk,
    )

    rng = random.Random(5)
    rows = []
    for c in range(12):
        center = [rng.gauss(0, 1) for _ in range(8)]
        nc = math.sqrt(sum(x * x for x in center))
        center = [x / nc for x in center]
        for m in range(5):
            v = [x + rng.gauss(0, 0.05) for x in center]
            rows.append(Row(vec_id=c * 5 + m, embedding=v))
    df = spark.createDataFrame(rows).select(
        "vec_id", as_double_array("embedding", "e")
    )
    truth = {
        (r["qid"], r["mid"])
        for r in cosine_topk_vectorized(df.toPandas(), df, k=4).collect()
    }
    approx = {
        (r["qid"], r["mid"])
        for r in lsh_topk(df, df, dim=8, k=4, n_planes=6, n_tables=4).collect()
    }
    assert len(truth & approx) >= 0.9 * len(truth)


def test_rolling_regression_known_slope(spark):
    out = QUERIES["q_rolling_regression"](spark, SF_SMALL)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # hand-recompute one user's slopes in python
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()["user_id"]
    series = [
        r["value"]
        for r in ev.filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    ]
    got = [
        r["slope_10"]
        for r in out.join(
            ev.select("event_id", "ts"), "event_id"
        )
        .filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    ]
    assert got[0] is None  # single point: slope undefined
    for i in range(1, len(series)):
        lo = max(0, i - 9)
        xs = list(range(lo + 1, i + 2))
        ys = series[lo : i + 1]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert got[i] == pytest.approx(want, abs=1e-5)


def test_census_empty_and_triangle_free_graphs(spark):
    empty = _edges_df(spark, []).filter("a IS NOT NULL")
    row = triangle_stats(empty).collect()[0]
    assert (
        row["n_nodes"],
        row["n_edges"],
        row["n_wedges"],
        row["n_triangles"],
        row["clustering_coeff"],
    ) == (0, 0, 0, 0, 0.0)
    # a path graph has wedges but no triangles
    path = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    row = triangle_stats(path).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 2
    assert row["clustering_coeff"] == 0.0
    assert local_clustering(path).filter("n_tri <> 0").count() == 0
