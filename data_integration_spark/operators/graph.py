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


def canonical_edges(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Canonicalize an undirected edge list to ``(u, v)`` with u < v, one
    row per edge (self-loops dropped, duplicates collapsed)."""
    return (
        edges.filter(F.col(a) != F.col(b))
        .select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .distinct()
    )


def _degrees(canon: DataFrame) -> DataFrame:
    """Per-node degree of a canonical edge list → ``(node, deg)``."""
    return (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def _oriented(canon: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient canonical edges from the LOWER-ranked endpoint to the
    higher under the ``(degree, id)`` total order → ``(lo, hi)``.

    This is the load-bearing trick of node-iterator triangle counting
    (Schank–Wagner; Cohen's MapReduce formulation): after orientation
    every node's out-degree is O(sqrt(|E|)) on ANY graph, so the wedge
    self-join is bounded by Σ outdeg² = O(|E|^1.5) instead of exploding
    on hub vertices — orienting by raw id would hand a low-id hub its
    full degree back."""
    with_deg = (
        canon.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")),
            "v",
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )


def triangle_list(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Enumerate each triangle of the undirected graph exactly once →
    ``(t, x, y)`` where t is the triangle's lowest-(degree, id)-ranked
    vertex and x < y are the other two. Every triangle has exactly one
    vertex from which both its other endpoints are out-neighbors under
    the orientation's total order, so the oriented wedge-closure join
    yields each triangle once with no post-hoc dedup.

    Scale shape: three shuffles (canonical distinct, the wedge self-join
    on the shared tail, the closure join on the (x, y) pair); fan-out is
    capped by the orientation (see ``_oriented``); nothing driver-side."""
    canon = _truncate_lineage(canonical_edges(edges, a, b))
    return _triangles_from_canon(canon)


def _triangles_from_canon(canon: DataFrame) -> DataFrame:
    """``triangle_list`` body over an ALREADY-canonical ``(u, v)`` edge
    list — lets the census/clustering wrappers reuse one canonical
    distinct instead of paying it twice."""
    oriented = _oriented(canon, _degrees(canon))
    wedge = (
        oriented.select(F.col("lo").alias("t"), F.col("hi").alias("x"))
        .join(
            oriented.select(F.col("lo").alias("t"), F.col("hi").alias("y")),
            "t",
        )
        .filter(F.col("x") < F.col("y"))
    )
    return wedge.join(
        oriented.select(
            F.least("lo", "hi").alias("x"), F.greatest("lo", "hi").alias("y")
        ),
        ["x", "y"],
    ).select("t", "x", "y")


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global triangle census as one row: ``(n_nodes, n_edges, n_wedges,
    n_triangles, clustering_coeff)``. Wedges come straight from the degree
    table (Σ d(d−1)/2, no join); triangles from ``triangle_list``; the
    global clustering coefficient is 3·triangles / wedges."""
    canon = _truncate_lineage(canonical_edges(edges, a, b))
    deg = _degrees(canon)
    counts = deg.agg(
        F.count("*").alias("n_nodes"),
        F.coalesce((F.sum("deg") / 2).cast("long"), F.lit(0)).alias(
            "n_edges"
        ),
        F.coalesce(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long"),
            F.lit(0),
        ).alias("n_wedges"),
    )
    tri = _triangles_from_canon(canon).agg(
        F.count("*").alias("n_triangles")
    )
    return counts.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering_coeff"),
    )


def local_clustering(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation and local clustering coefficient →
    ``(node, deg, n_tri, local_cc)`` for every node with deg ≥ 2
    (the coefficient 2T/d(d−1) is undefined below that).

    Each enumerated triangle is attributed to all three of its vertices
    via an explode (3 rows per triangle — bounded, since the triangle
    list itself is the expensive part), then grouped; nodes in no
    triangle keep a 0 via the left join from the degree table."""
    canon = _truncate_lineage(canonical_edges(edges, a, b))
    deg = _degrees(canon)
    per_node = (
        _triangles_from_canon(canon)
        .select(
            F.explode(F.array(F.col("t"), F.col("x"), F.col("y"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_node, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
            F.round(
                2.0
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("local_cc"),
        )
    )
