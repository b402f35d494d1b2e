"""Range-partitioned prefix sums — the scale path for global cumulative
windows.

A global ``Window.orderBy(...)`` cumsum moves every row through ONE task
(Spark warns "No Partition Defined"), which is fine for groups-sized
frames but a wall for fact-sized ones. The classic distributed prefix sum
replaces it:

1. ``repartitionByRange(order_col)`` — rows land in sorted, disjoint
   key ranges;
2. per-partition totals (one tiny job, #partitions rows) → exclusive
   offsets on the driver;
3. a cumsum window WITHIN each partition plus the partition's offset.

The only driver materialization is #partitions scalars, and the only
full-data movement is the range exchange — the same cost the global sort
would pay, minus the single-task bottleneck. As of r6 this family
(row_number / prefix sums / exclusive prefix max / exact ntile) BACKS
every formerly-global window in the package: q_vocab_build,
q_vocab_encode, q_window_gather, q_skyline, q_mann_whitney, q_ks_test,
q_curriculum_buckets, q_ntile_percent_rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_row_number(
    df: DataFrame,
    order_exprs: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number`` in ``order_exprs`` order WITHOUT a
    single-partition window — the ranking sibling of ``range_prefix_sum``.

    ``Window.orderBy(...)`` with no partitionBy funnels every row through
    one task; this instead: (1) ``repartitionByRange`` on the order
    expressions (rows land in disjoint, globally-ordered key ranges — desc
    expressions are honored), (2) per-partition row counts → exclusive
    rank offsets on the driver (#partitions scalars, the only driver
    materialization), (3) a row_number window WITHIN each partition plus
    its offset. Same total data movement as the global sort, no one-task
    bottleneck — the SCALING.md-prescribed swap-in for id assignment over
    unbounded tables (q_vocab_build, VERDICT r5 #1).

    ``order_exprs`` should be a total order (include a unique tiebreak
    column) for a well-defined result, as with any SQL row_number."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    if not counts:  # empty input: no offsets to build, nothing to rank
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets, running = {}, 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    return ranged.withColumn(
        out_col, (F.row_number().over(w) + offset_col).cast("long")
    ).drop("_pid")


def range_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | list[str],
    out_col: str | list[str] = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` in ``order_col`` order,
    computed without a single-partition window.

    ``value_col``/``out_col`` may be LISTS (same length): several prefix
    sums over the same order share ONE range exchange, one offsets job,
    and one in-partition window pass (the two-ECDF shape of q_ks_test).

    ``order_col`` must be a total order (unique values) for the result to
    be well-defined row-by-row; with duplicate keys the intra-tie order —
    like any SQL cumsum over a non-unique ORDER BY — is unspecified.

    The range partitioning is materialized once (`cache`) so the offsets
    job and the output job see the SAME partition boundaries (Spark's
    range partitioner samples; recomputation could legally re-sample).
    Callers should ``unpersist()`` the result's lineage when done, or let
    the context evict it.
    """
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(value_cols) == len(out_cols)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    # tiny: one row per partition, one total per value column
    totals = {
        r["_pid"]: [r[f"t{i}"] for i in range(len(value_cols))]
        for r in ranged.groupBy("_pid")
        .agg(*[F.sum(v).alias(f"t{i}") for i, v in enumerate(value_cols)])
        .collect()
    }
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged
    for i, (v, o) in enumerate(zip(value_cols, out_cols)):
        offsets, running = {}, 0
        for pid in sorted(totals):
            offsets[pid] = running
            running += totals[pid][i]
        offset_col = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
        out = out.withColumn(o, F.sum(v).over(w) + offset_col)
    return out.drop("_pid")


def range_prefix_max(
    df: DataFrame,
    order_exprs: list[Column],
    value_col: str,
    out_col: str = "prefix_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running max of ``value_col`` in ``order_exprs`` order
    (max over strictly-preceding rows; NULL for the first row) without a
    single-partition window — the monotone-frontier primitive (skyline /
    record-breaking scans).

    Same three-step shape as ``range_prefix_sum``: range-partition on the
    order, per-partition maxima → EXCLUSIVE running maxima on the driver
    (#partitions scalars), then an exclusive max window within each
    partition combined with the partition offset via ``greatest`` (which
    skips NULLs, so first-partition/first-row semantics fall out).
    ``order_exprs`` should be a total order for a well-defined result."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    maxima = {
        r["_pid"]: r["m"]
        for r in ranged.groupBy("_pid").agg(F.max(value_col).alias("m")).collect()
    }
    if not maxima:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    offsets, running = {}, None
    for pid in sorted(maxima):
        offsets[pid] = running  # EXCLUSIVE: max of all earlier partitions
        running = (
            maxima[pid]
            if running is None
            else max(running, maxima[pid])
        )
    # a map literal cannot hold None values; encode missing as absent key
    kv = [x for pid, off in offsets.items() if off is not None for x in (pid, off)]
    offset_col = (
        F.try_element_at(F.create_map(*[F.lit(x) for x in kv]), F.col("_pid"))
        if kv
        else F.lit(None)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prev = F.max(value_col).over(w)
    return ranged.withColumn(
        out_col, F.greatest(local_prev, offset_col)
    ).drop("_pid")


def range_ntile(
    df: DataFrame,
    order_exprs: list[Column],
    n_buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
    rn_col: str | None = None,
) -> DataFrame:
    """Exact SQL ``NTILE(n)`` semantics without a single-partition window:
    the first ``N mod n`` buckets get ``ceil(N/n)`` rows, the rest
    ``floor(N/n)`` — derived arithmetically from the range-partitioned
    global row_number (``range_row_number``) and the total count N (one
    cheap count job; a driver scalar, embedded as a literal).

    ``order_exprs`` must be a total order (unique tie-break) — with ties,
    SQL NTILE itself is nondeterministic, so callers wanting stable
    results need the tie-break anyway. ``rn_col`` keeps the underlying
    global row number under that name (rank == row_number under a total
    order, so percent_rank etc. derive from it for free)."""
    ranked = range_row_number(df, order_exprs, out_col="_rn",
                              num_partitions=num_partitions)
    n_total = ranked.count()  # ranked is cached post-range: cheap
    if n_total == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    q, r = divmod(n_total, n_buckets)
    threshold = r * (q + 1)
    rn = F.col("_rn")
    if q == 0:  # fewer rows than buckets: bucket == row number
        bucket = rn
    else:
        bucket = F.when(
            rn <= threshold, F.floor((rn - 1) / (q + 1)) + 1
        ).otherwise(r + F.floor((rn - threshold - 1) / q) + 1)
    out = ranked.withColumn(out_col, bucket.cast("long"))
    return out.drop("_rn") if rn_col is None else out.withColumnRenamed("_rn", rn_col)
