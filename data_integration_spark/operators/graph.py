"""Distributed PageRank by power iteration over a weighted edge list.

The reference's analytics surface stops at relational aggregation; graph
centrality is part of the extension block (SURVEY.md §2 extensions —
iterative algorithms on Spark, same family as
``dedup/components.py::connected_components``).

Design: ranks and edges are plain DataFrames; one shuffle per iteration
(the contribution aggregation on ``dst``); lineage is truncated every few
iterations exactly like the connected-components loop so the plan depth —
and the scheduler's DAG — stays O(1) per iteration instead of O(iters).
A fixed iteration count (not a convergence test) keeps the operator
deterministic and cross-engine comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_spark.dedup.components import _truncate_lineage

#: truncate lineage every this many iterations (each iteration adds a
#: join + agg to the plan; unbounded growth slows the optimizer and, on a
#: cluster, balloons task binaries).
_CHECKPOINT_EVERY = 5


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over ``edges(src, dst, weight)``.

    Out-weights are normalized per ``src`` (rows with non-positive total
    out-weight would be dangling — callers wanting dangling-mass
    redistribution should symmetrize or add sink edges first; the
    contribution join silently drops rank flowing FROM nodes without
    out-edges and INTO nothing, which is only mass-conserving on graphs
    where every node has both, e.g. symmetrized graphs).

    Returns ``(node, rank)``. Scale shape: per iteration ONE shuffle —
    the ``dst`` aggregation; the rank frame is #nodes rows (tiny next to
    the edge list), so AQE broadcasts it into the edge join; the edge
    list itself never re-partitions across iterations.
    """
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_total"))
    norm = (
        edges.join(out_w, "src")
        .select(
            "src",
            "dst",
            (F.col("weight").cast("double") / F.col("out_total")).alias("p"),
        )
    )
    norm = _truncate_lineage(norm)  # reused every iteration: pin it

    nodes = norm.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))

    for i in range(n_iter):
        contribs = (
            ranks.join(norm, F.col("node") == F.col("src"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        ranks = contribs.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("inflow")).alias("rank"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            ranks = _truncate_lineage(ranks)
    return ranks
