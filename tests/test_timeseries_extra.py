"""Value-level semantics for queries/timeseries_extra.py — independent
python recomputation of gap-filling, interval merging, and DAU/WAU on
sf0.001, beyond the DuckDB hash parity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_integration_spark.queries import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


def test_gapfill_invariants(spark):
    rows = QUERIES["q_time_gapfill"](spark, SF_SMALL).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        # contiguous day spine from first to last active day
        days = [r["day"] for r in rs]
        assert days == [
            days[0] + dt.timedelta(days=i) for i in range(len(days))
        ]
        # spine endpoints are observed; fill carries the last observation
        assert rs[0]["is_gap"] == 0 and rs[-1]["is_gap"] == 0
        carry = None
        for r in rs:
            assert (r["day_value"] is None) == (r["is_gap"] == 1)
            if r["day_value"] is not None:
                carry = r["day_value"]
            assert r["filled_value"] == carry


def test_interval_merge_against_python_sweep(spark):
    out = {
        r["user_id"]: r
        for r in QUERIES["q_interval_merge"](spark, SF_SMALL).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    import math

    for uid, tss in by_user.items():
        # merge on FULL precision (the query compares microsecond
        # timestamps); truncate to whole seconds only for the reported
        # durations, exactly like unix_timestamp does
        ivs = sorted((t.timestamp(), t.timestamp() + 1800.0) for t in tss)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        durs = [
            int(math.floor(e)) - int(math.floor(s)) for s, e in islands
        ]
        want_total = sum(durs)
        want_longest = max(durs)
        got = out[uid]
        assert got["n_islands"] == len(islands)
        assert got["active_seconds"] == want_total
        assert got["longest_seconds"] == want_longest


def test_dau_wau_bounds_and_one_day(spark):
    rows = QUERIES["q_dau_wau"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dau"] <= r["wau"]
        assert 0 < r["stickiness"] <= 1
    activity = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    target = max(r["day"] for r in rows)
    dau = len({a["user_id"] for a in activity if a["day"] == target})
    wau = len(
        {
            a["user_id"]
            for a in activity
            if target - dt.timedelta(days=6) <= a["day"] <= target
        }
    )
    got = next(r for r in rows if r["day"] == target)
    assert got["dau"] == dau and got["wau"] == wau
    assert got["stickiness"] == pytest.approx(dau / wau, abs=1e-6)
