from data_integration_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    streaming_tumbling_agg,
    tumbling_agg,
)

__all__ = [
    "sessionize",
    "sliding_counts",
    "streaming_tumbling_agg",
    "tumbling_agg",
]
