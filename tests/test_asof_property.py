"""Property test: the union+window as-of join composition equals a
brute-force per-row maximum on arbitrary inputs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from data_integration_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 10)),
        min_size=0,
        max_size=12,
    ),
)
def test_asof_join_matches_bruteforce(spark_holder, lefts, rights):
    spark = spark_holder
    left = spark.createDataFrame(
        [Row(event_id=i, user_id=k, ts=float(t)) for i, (k, t) in enumerate(lefts)]
    )
    if rights:
        right = spark.createDataFrame(
            [Row(user_id=k, ts=float(t), value=float(v)) for k, t, v in rights]
        )
    else:
        right = spark.createDataFrame([], "user_id long, ts double, value double")

    got = {
        r.event_id: r.value_asof
        for r in asof_join(left, right, key="user_id", ts="ts").collect()
    }
    # brute force: latest right at ts<=left.ts per key; ties on right ts are
    # broken by LAST value in window order — accept any of the tied values
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, rv) for rk, rt, rv in rights if rk == k and rt <= t]
        if not cands:
            assert got[i] is None
        else:
            best_ts = max(rt for rt, _ in cands)
            tied = {rv for rt, rv in cands if rt == best_ts}
            assert got[i] in tied
    assert len(got) == len(lefts)


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark_holder, edges):
    """Property: distributed min-label propagation equals a driver-side
    union-find on arbitrary random graphs (self-loops included)."""
    from data_integration_spark.dedup.components import connected_components

    spark = spark_holder
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges]
    )
    got = {r.node: r.cluster for r in connected_components(df).collect()}

    # reference union-find
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    # canonical label = min member of the component on both sides
    comp_min: dict[int, int] = {}
    for n, root in want.items():
        comp_min[root] = min(comp_min.get(root, n), n)
    want_labels = {n: comp_min[find(n)] for n in parent}
    assert got == want_labels


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        min_size=0,
        max_size=60,
    ),
    n_parts=st.integers(min_value=1, max_value=7),
)
def test_range_prefix_sum_null_semantics_property(spark, vals, n_parts):
    """Property form of the ADVICE r6 NULL-fold fix: for ANY mix of NULLs
    (including all-NULL partitions, NULL prefixes, empty input) the
    range-partitioned prefix sum equals the sequential SQL definition —
    NULL until the first non-NULL value, NULL-skipping after."""
    from pyspark.sql import functions as F

    from data_integration_spark.operators.prefix import range_prefix_sum

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r["k"]: r["ps"]
        for r in range_prefix_sum(
            df, "k", "v", out_col="ps", num_partitions=n_parts
        ).collect()
    }
    running, want = None, {}
    for k, v in rows:
        if v is not None:
            running = v if running is None else running + v
        want[k] = running
    assert got == want
