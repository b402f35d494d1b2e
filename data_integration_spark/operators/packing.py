"""Greedy document packing: group variable-length documents into
fixed-token-budget bins (the "sequence packing" step every LLM training
pipeline runs between tokenization and batch assembly).

Packing is inherently sequential, so it cannot be a pure Column
expression; the scalable shape is hash-partition the corpus, then run an
independent greedy first-fit-decreasing pass INSIDE each partition via
``applyInPandas`` — each task packs its own shard, no global state, no
driver involvement.  At 100 TB this is embarrassingly parallel: bins never
span partitions, and the small per-partition waste (a partial final bin
per partition) is amortized by partition size.

Determinism: partition assignment is ``pmod(xxhash64(doc_id), n_shards)``
(content-addressed, independent of input partitioning) and the in-shard
order is (token_count DESC, doc_id) — reruns produce identical bins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


PACKED_SCHEMA = (
    "shard int, bin_id int, n_docs bigint, total_tokens bigint, fill_ratio double"
)


def pack_documents(
    docs: DataFrame,
    doc_id: str = "doc_id",
    token_count: str = "token_count",
    budget: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing packing of ``docs`` into ``budget``-token bins.

    Returns one row per bin: (shard, bin_id, n_docs, total_tokens,
    fill_ratio). A document longer than ``budget`` gets a bin of its own
    (the caller truncates or splits upstream if that is not acceptable).
    """

    sharded = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.col(token_count).cast("long").alias("token_count"),
        F.pmod(F.xxhash64(F.col(doc_id)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["token_count", "doc_id"], ascending=[False, True]
        )
        bins: list[list[int]] = []  # [n_docs, total_tokens]
        # bounded lookback keeps packing O(n·64) instead of O(n·bins):
        # under FFD ordering, bins older than the last few dozen are
        # effectively full, so the recall loss is a sliver of fill ratio
        lookback = 64
        for tc in pdf["token_count"]:
            placed = False
            for b in bins[-lookback:]:
                if b[1] + tc <= budget:
                    b[0] += 1
                    b[1] += tc
                    placed = True
                    break
            if not placed:
                bins.append([1, tc])
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "shard": shard,
                "bin_id": range(len(bins)),
                "n_docs": [b[0] for b in bins],
                "total_tokens": [b[1] for b in bins],
                "fill_ratio": [round(b[1] / budget, 6) for b in bins],
            }
        )

    return sharded.groupBy("shard").applyInPandas(pack, PACKED_SCHEMA)
