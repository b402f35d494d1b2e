"""Property tests: the degree-oriented triangle census equals a
brute-force enumeration on arbitrary small graphs, and the
gaps-and-islands interval merge equals a python sweep on arbitrary
interval sets. Complements the fixed-example tests in test_triangles.py /
test_timeseries_extra.py with adversarial shapes (multi-edges, reversed
duplicates, isolated edges, heavy overlap)."""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_integration_spark.operators.graph import triangle_stats


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


@settings(max_examples=12, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=24,
    )
)
def test_triangle_census_matches_bruteforce(spark_holder, edges):
    spark = spark_holder
    df = spark.createDataFrame(edges, "a long, b long")
    row = triangle_stats(df).collect()[0]

    adj = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = {n for e in adj for n in e}
    deg = {n: sum(1 for e in adj if n in e) for n in nodes}
    tri = sum(
        1
        for t in combinations(sorted(nodes), 3)
        if all(frozenset(p) in adj for p in combinations(t, 2))
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(adj)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    want_cc = 3.0 * tri / wedges if wedges else 0.0
    assert row["clustering_coeff"] == pytest.approx(want_cc, abs=1e-6)


@settings(max_examples=12, deadline=None)
@given(
    starts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1,
        max_size=20,
    ),
    width=st.integers(1, 25),
)
def test_interval_islands_match_python_sweep(spark_holder, starts, width):
    """Same island algebra as q_interval_merge, on integer 'timestamps'
    (the query's exclusive-prefix-max + running-sum rewrite, applied to a
    generic frame)."""
    from pyspark.sql import Window

    spark = spark_holder
    iv = spark.createDataFrame(
        [(k, s, s + width) for k, s in starts], "k long, s long, e long"
    )
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        iv.withColumn("prev_max", F.max("e").over(w_prev))
        .withColumn(
            "flag",
            F.when(
                F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("flag").over(w_run))
        .groupBy("k", "island")
        .agg(F.min("s").alias("st"), F.max("e").alias("en"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("en") - F.col("st")).alias("covered"),
        )
        .collect()
    )
    got = {r["k"]: (r["n"], r["covered"]) for r in merged}

    by_key: dict[int, list] = {}
    for k, s in starts:
        by_key.setdefault(k, []).append((s, s + width))
    for k, ivs in by_key.items():
        islands: list[list[int]] = []
        for s, e in sorted(ivs):
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        assert got[k] == (
            len(islands),
            sum(e - s for s, e in islands),
        )
