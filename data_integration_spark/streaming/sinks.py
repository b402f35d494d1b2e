"""Streaming sinks beyond the built-ins: ``foreachBatch`` table maintenance.

``foreachBatch`` hands each micro-batch to arbitrary BATCH logic with a
batch id — the bridge that lets a stream maintain a keyed parquet table
via merge/upsert (no Delta in this container; the same callback targets
any ACID table format in production). Spark guarantees at-least-once
callback delivery with a stable ``batch_id``; the merge is idempotent per
(key, batch), so redelivery converges instead of duplicating — the
exactly-once-table recipe on plain files.

Scale notes: each micro-batch merge is a batch job (anti-join + union +
atomic directory swap here; a real MERGE INTO on table formats). State is
the TABLE, not the stream — nothing accumulates in the state store.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from data_integration_spark.operators.merge import merge_upsert
from data_integration_spark.sources.atomic import atomic_replace_dir, recover_dir


def streaming_upsert_sink(
    stream: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
    query_name: str = "upsert_sink",
    latest_by: str | None = None,
):
    """Maintain ``table_path`` (parquet) as the keyed upsert of every
    micro-batch: latest batch wins per key. Returns the started query.

    ``latest_by``: when a micro-batch itself carries several rows per key
    (redeliveries, rapid updates), keep only the row with the max value of
    this column per key before merging — the within-batch "latest wins"
    reduction. Without it, all of a key's batch rows replace the target's
    (multi-row-payload semantics).

    The swap is write-to-temp + atomic rename, so a crash mid-merge leaves
    the previous table intact; rerunning the batch (at-least-once) merges
    to the same result.
    """
    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if latest_by is not None:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy(*keys).orderBy(F.col(latest_by).desc())
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        recover_dir(table_path)  # restore the table if a prior merge crashed
        if os.path.exists(table_path):
            target = spark.read.parquet(table_path)
            merged = merge_upsert(target, batch_df, keys)
        else:
            merged = batch_df
        tmp = f"{table_path}__m{batch_id}_{uuid.uuid4().hex[:6]}"
        merged.write.mode("overwrite").parquet(tmp)
        atomic_replace_dir(tmp, table_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
