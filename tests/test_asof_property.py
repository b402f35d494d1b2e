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
