"""Custom stateful streaming operators via ``applyInPandasWithState``.

The extension surface for semantics the built-in windowed aggregations can't
express (SURVEY.md §2.14): here, per-user running statistics with
inactivity timeout — state lives in the state store keyed by user, one
pandas invocation per (key, trigger) with the user's new rows.

Scale: state volume is O(active keys × state row); the processing-time
timeout evicts idle keys, bounding the store exactly like a watermark bounds
windowed state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, total double"
OUTPUT_SCHEMA = "user_id long, n long, total double, mean double"


def _update_running_stats(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold new rows into (n, total); emit the updated per-user stats."""
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "total": [total],
            "mean": [total / n if n else 0.0],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (n, total, mean) over a stream of events — a custom
    stateful operator the built-in aggs can't express incrementally with
    eviction control."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def _update_running_stats_no_timeout(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Timeout-free fold (replay/backfill flavor): same state math, no
    eviction timer — an availableNow replay terminates as soon as the data
    is drained (ProcessingTimeTimeout needs extra timer batches and keeps
    the query alive; see tests/test_stateful_streaming.py)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "total": [total],
            "mean": [total / n if n else 0.0],
        }
    )


def running_user_stats_replay(events: DataFrame) -> DataFrame:
    """``running_user_stats`` without eviction — the bounded-replay variant
    whose final per-user emission equals the batch groupBy exactly."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats_no_timeout,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
