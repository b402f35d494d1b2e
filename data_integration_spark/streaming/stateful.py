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
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

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


class UserExtremes(StatefulProcessor):
    """transformWithStateInPandas processor (Spark 4 arbitrary-state API):
    per-user running (n, lo, hi) kept in a ValueState; each invocation
    folds the arriving rows and emits the updated extremes.

    Versus applyInPandasWithState: named state variables (Value/List/Map),
    TTL handled by the store, and the same processor binds to both the
    pandas and Row variants — this is the forward-looking API for custom
    stateful operators."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("extremes", "n long, lo double, hi double")

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, lo, hi = self._state.get()
        else:
            n, lo, hi = 0, float("inf"), float("-inf")
        for pdf in rows:
            n += len(pdf)
            lo = min(lo, float(pdf["value"].min()))
            hi = max(hi, float(pdf["value"].max()))
        self._state.update((n, lo, hi))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "lo": [lo], "hi": [hi]}
        )

    def close(self) -> None:
        pass


def user_extremes_stream(events: DataFrame) -> DataFrame:
    """Per-user running value extremes via the Spark 4 transformWithState
    API (update mode, processing-time)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserExtremes(),
        outputStructType="user_id long, n long, lo double, hi double",
        outputMode="Update",
        timeMode="None",
    )
