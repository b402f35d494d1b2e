"""Graph-structure queries over the part co-purchase graph.

Nodes are parts; an undirected edge connects two parts that appear in the
same order (the classic market-basket projection). Triangle counting and
clustering coefficients are the standard cohesion measures over it — and
the canonical "your naive self-join explodes on hubs" distributed-graph
workload, implemented here with the degree-oriented node-iterator
algorithm (``operators/graph.py::triangle_list``) whose wedge fan-out is
O(|E|^1.5) on any graph.

Both queries are FULL oracle: DuckDB independently rebuilds the edge set
and enumerates triangles with the orientation-free a<b<c triple join —
a different algorithm arriving at the same census, which is exactly what
makes the hash check meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog

# shared DuckDB rebuild of the co-purchase graph: distinct (order, part)
# incidences → canonical a<b edges → degree table
_GRAPH_ORACLE_BODY = """
WITH inc AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM inc l1
  JOIN inc l2 ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
  GROUP BY node
)
"""


def _co_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) incidences self-joined on the order key →
    one row per unordered co-purchased part pair. The per-order fan-out
    is C(parts_per_order, 2) — bounded by basket size, not corpus size."""
    inc = (
        Catalog(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    left = inc.select("l_orderkey", F.col("l_partkey").alias("a"))
    right = inc.select("l_orderkey", F.col("l_partkey").alias("b"))
    return (
        left.join(right, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )


@register(
    "q_triangle_count",
    oracle=_GRAPH_ORACLE_BODY
    + """
    , agg AS (
      SELECT COUNT(*) AS n_nodes,
             CAST(SUM(d) / 2 AS BIGINT) AS n_edges,
             CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           ROUND(CASE WHEN n_wedges > 0
                      THEN 3.0 * n_triangles / n_wedges
                      ELSE 0.0 END, 6) AS clustering_coeff
    FROM agg, tri
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph: (nodes, edges,
    wedges, triangles, global clustering coefficient) as one certificate
    row. Spark enumerates triangles with the degree-oriented
    node-iterator (wedge fan-out capped at O(|E|^1.5), hub-safe); the
    oracle recounts them with the naive a<b<c triple join — algorithmic
    diversity on both sides of the hash."""
    from data_integration_spark.operators.graph import triangle_stats

    return triangle_stats(_co_purchase_edges(spark, sf_dir), "a", "b")


@register(
    "q_local_clustering",
    oracle=_GRAPH_ORACLE_BODY
    + """
    , tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    per_node AS (
      SELECT node, COUNT(*) AS n_tri
      FROM (
        SELECT x AS node FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris
      )
      GROUP BY node
    )
    SELECT d.node, d.d AS deg,
           CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri,
           ROUND(2.0 * COALESCE(p.n_tri, 0) / (d.d * (d.d - 1)), 6)
             AS local_cc
    FROM deg d
    LEFT JOIN per_node p ON p.node = d.node
    WHERE d.d >= 2
    """,
)
def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient over the co-purchase graph:
    (node, degree, triangles through it, 2T/d(d−1)) for every node of
    degree ≥ 2 — the standard "how clique-like is this node's
    neighborhood" feature. Output is |parts|-bounded; the cost lives in
    the same hub-safe triangle enumeration as q_triangle_count, with
    each triangle attributed to its three vertices by a 3-row explode."""
    from data_integration_spark.operators.graph import local_clustering

    return local_clustering(_co_purchase_edges(spark, sf_dir), "a", "b")
