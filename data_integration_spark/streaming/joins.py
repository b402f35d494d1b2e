"""Stream-stream joins and streaming deduplication.

Both sides of a stream-stream join buffer state bounded by their watermarks
plus the join's time bound; the BETWEEN constraint below lets Spark evict
click state once no future purchase can match it. The same transformation
applies to batch frames (minus watermarks) — tests certify batch/stream
equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchase(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """All (purchase, click) pairs for the same user with the click in
    [purchase.ts − lookback, purchase.ts] — attribution-join shape."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "p_ts",
        "c_ts",
        "click_value",
    )


def dedupe_events(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once event feed: drop duplicate (event_id) arrivals. On a
    stream the watermark bounds the dedup state (late re-deliveries beyond
    it are not caught — the standard trade)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)
