"""Connected components over near-duplicate pair edges — the clustering
step between pair generation (exact / MinHash / SimHash / cosine) and
canonical-document selection in a dedup pipeline.

Algorithm: iterative minimum-label propagation (the Pregel-style
"hash-to-min" style loop): every node starts labeled with itself; each
round a node adopts the minimum label among itself and its neighbors;
fixpoint = components labeled by their minimum member. Each round is ONE
shuffle (join edges→labels + min-aggregate); the driver only sees a
changed-row COUNT per round, never the data. Label lineage is truncated
with ``localCheckpoint`` so the plan doesn't deepen with iterations —
without it round i replays rounds 1..i−1.

Rounds needed = graph diameter (≤ log n for the small dense clusters dedup
produces; near-dup components are overwhelmingly tiny cliques, so 3-5
rounds is typical). ``max_iter`` bounds pathological chains.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the iterative plan's lineage. Prefers a RELIABLE ``checkpoint()``
    when the context has a checkpoint dir configured (cluster setting:
    ``localCheckpoint`` blocks are executor-local, so an executor loss
    mid-loop kills the job); falls back to ``localCheckpoint`` otherwise
    (local mode / tests, where there is no executor to lose)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Label every node of the undirected edge set with its component's
    minimum node id. Returns (node, cluster). Isolated nodes (absent from
    ``edges``) are the caller's concern — a dedup pipeline left-joins the
    result back and coalesces to the node's own id.

    Convergence is verified: if the label fixpoint is not reached within
    ``max_iter`` rounds (graph diameter > max_iter — a pathological chain),
    ``strict=True`` raises rather than silently returning split clusters;
    ``strict=False`` downgrades to a warning (mirrors the EM estimator's
    converged-flag contract)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = _truncate_lineage(nodes.withColumn("label", F.col("node")))
    converged = False
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = _truncate_lineage(new_labels)  # each round is one join
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds the bound); labels would be "
            "split clusters. Raise max_iter."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("node", F.col("label").alias("cluster"))


def dedup_clusters(
    docs: DataFrame,
    pair_df: DataFrame,
    id_col: str = "doc_id",
    d1: str = "d1",
    d2: str = "d2",
) -> DataFrame:
    """Assign every document a duplicate-cluster id: connected components
    over the near-dup pairs; docs in no pair form singleton clusters
    (cluster = own id). The canonical representative of each cluster is its
    minimum doc id — ``filter(doc_id == cluster)`` keeps one doc per
    cluster, the standard keep-first dedup policy."""
    comp = connected_components(pair_df, src=d1, dst=d2)
    return (
        docs.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("cluster"), F.col("node")).alias("cluster"),
        )
    )
