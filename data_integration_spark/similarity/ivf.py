"""IVF (inverted-file) approximate nearest neighbour over embeddings.

The classic two-stage ANN: a k-means coarse quantizer (seeded NumPy
k-means++ + Lloyd on a bounded driver-side sample — ``_lloyd``, r7)
partitions the corpus into nlist cells; queries probe only the nprobe
nearest cells. Recall/latency trades on nprobe exactly
as in FAISS-style IVF-Flat.

Scale shape: the corpus is scanned once to assign cells (narrow map after
broadcast of nlist×dim centroids), then searched per (query, probed-cell)
via a join on cell id — candidate volume is |corpus|·nprobe/nlist instead
of |corpus| per query. Centroids are tiny and always broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_integration_spark.similarity.ann import _dot, _norm


def _sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared distances via the BLAS path (‖x‖²+‖c‖²−2x·c) —
    one GEMM instead of an (n, k, d) broadcast allocation; negatives
    from float cancellation clip to 0."""
    d = (
        (X * X).sum(axis=1)[:, None]
        + (C * C).sum(axis=1)[None, :]
        - 2.0 * (X @ C.T)
    )
    return np.maximum(d, 0.0)


def _lloyd(X: np.ndarray, k: int, seed: int, n_iter: int = 25,
           tol: float = 1e-9) -> np.ndarray:
    """k-means on an in-memory sample: k-means++ seeding + Lloyd, all
    NumPy, deterministic under ``seed``. The coarse quantizer's training
    set is BOUNDED (n_cells × train_per_cell vectors — a few MB at any
    corpus size), so training belongs on the driver: FAISS trains IVF
    exactly this way, and the alternative (distributed Lloyd) costs a
    full cluster job per iteration to move a matrix that fits in L2
    cache. The full corpus is still assigned distributed (``assign``).
    The ++ init keeps a RUNNING min-distance array (O(n·k·d) total, not
    O(n·k²·d)); per-iteration distances ride one GEMM (``_sq_dists``)."""
    rng = np.random.RandomState(seed)
    X = np.ascontiguousarray(X, dtype=np.float64)
    n = len(X)
    k = min(k, n)
    # k-means++ init with incremental min-distance updates
    first = X[rng.randint(n)]
    centroids = [first]
    best_d2 = _sq_dists(X, first[None, :])[:, 0]
    for _ in range(1, k):
        total = best_d2.sum()
        if total <= 0:  # all remaining points coincide with a centroid
            centroids.append(centroids[0])
            continue
        c = X[rng.choice(n, p=best_d2 / total)]
        centroids.append(c)
        best_d2 = np.minimum(best_d2, _sq_dists(X, c[None, :])[:, 0])
    C = np.asarray(centroids, dtype=np.float64)
    for _ in range(n_iter):
        a = _sq_dists(X, C).argmin(axis=1)
        new_c = np.array(
            [X[a == j].mean(axis=0) if (a == j).any() else C[j] for j in range(k)]
        )
        if np.max(np.abs(new_c - C)) < tol:
            C = new_c
            break
        C = new_c
    return C


class IVFIndex:
    """Build once over a corpus (vec col must be array<double>), then
    ``search`` with any query subset."""

    def __init__(self, n_cells: int = 16, seed: int = 11):
        self.n_cells = n_cells
        self.seed = seed
        self.assigned: DataFrame | None = None
        self.centroids: DataFrame | None = None

    def fit(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "e",
        train_per_cell: int | None = 256,
    ):
        """Train the coarse quantizer, then assign the FULL corpus.

        ``train_per_cell``: the quantizer is trained on a bounded,
        DETERMINISTIC content-keyed subsample of ~``n_cells *
        train_per_cell`` vectors (FAISS trains IVF the same way) — k-means
        over the entire corpus would be a full multi-pass job per release
        at 100 TB, while centroid quality saturates at a few hundred
        training points per cell. The sample predicate is
        ``pmod(xxhash64(id), 1e6) < frac`` — a pure function of the id,
        so refits are reproducible on any partitioning. ``None`` keeps
        the whole (small) corpus as the training set.

        The Lloyd iterations run DRIVER-SIDE on the collected sample
        (``_lloyd``, r7): the training matrix is bounded by construction
        (n_cells × train_per_cell × dim doubles — a few MB at ANY corpus
        size), so iterating it distributed paid ~20 cluster jobs to move
        data that fits in cache (the r6 bench's q_ann_ivf cost was
        exactly this distributed-trainer per-iteration overhead; the
        pre-r7 implementation used a cluster-side k-means). The sample is
        collected SORTED by id so centroids are partition-order
        independent; the full corpus is still scanned ONCE, distributed,
        for the inverted-list assignment (``assign``, broadcast
        centroids, narrow map)."""
        spark = corpus.sparkSession
        train = corpus
        target = self.n_cells * (train_per_cell or 4096)
        n = corpus.count()
        if train_per_cell is not None and n > target:
            frac_ppm = int(target * 1_000_000 / n)
            train = corpus.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000))
                < frac_ppm
            )
        # bounded by the sample predicate (or the corpus itself when the
        # caller opted out of sampling on a small corpus) — never collect
        # an unbounded training set
        sample_pd = (
            train.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_e"))
            .orderBy("_id")
            .limit(target * 4)
            .toPandas()
        )
        X = np.stack(sample_pd["_e"].to_numpy()).astype(np.float64)
        centers = _lloyd(X, self.n_cells, self.seed)
        self.centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            "cell int, ce array<double>",
        )
        # assign the corpus with the INDEX's own arithmetic (assign()),
        # never the trainer's internal distance path: a different distance
        # formulation can disagree with plain sum((a-b)^2) within float
        # error near a cell boundary, which would break the
        # append/load/fit cell-for-cell contract (ADVICE r5). One
        # assignment metric everywhere: fit, append, and post-load appends
        # all produce byte-identical cell choices.
        self.assigned = self.assign(corpus, id_col, vec_col)
        return self

    def assign(
        self, vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "e"
    ) -> DataFrame:
        """Nearest-centroid cell assignment using the EXISTING centroids
        (no refit) — plain squared-Euclidean with a (distance, cell)
        tie-break. This is THE index's assignment metric: ``fit`` routes
        its own corpus through it too, so fitted, appended, and
        loaded-then-appended vectors can never disagree on a near-boundary
        cell choice (the trainer's own distance path only ITERATES the
        centroids, never builds inverted lists). Broadcast
        centroids × vectors: a narrow map per vector, the incremental
        index-update path (daily embedding batches join a released index
        without moving its cell boundaries)."""
        assert self.centroids is not None, "fit or load first"
        v = vectors.select(F.col(id_col).alias("mid"), F.col(vec_col).alias("me"))
        # argmin as a struct-min AGGREGATE, not a per-vector window: the
        # broadcast cross join expands each vector ×n_cells IN PLACE, and
        # the map-side partial min collapses it back to one row per vector
        # before any exchange — shuffle volume is |vectors|, never
        # |vectors|·n_cells. Struct ordering compares (cdist, cell) in
        # field order = the documented tie-break.
        vc = v.crossJoin(F.broadcast(self.centroids)).select(
            "mid",
            "me",
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("me"), F.col("ce"), lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("cdist"),
                F.col("cell"),
            ).alias("_dc"),
        )
        return (
            vc.groupBy("mid")
            # all _dc rows for a mid carry the identical "me" payload (the
            # cross join only varied the centroid), so any_value is exact
            .agg(F.min("_dc").alias("_b"), F.any_value("me").alias("me"))
            .select("mid", "me", F.col("_b.cell").alias("cell"))
        )

    def append(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "e",
        extra_cols: dict | None = None,
    ) -> "IVFIndex":
        """Append new vectors to the inverted lists (assign-only, centroids
        frozen) — the index grows without a refit, so search results over
        old vectors are unchanged and reproducibility across jobs holds.
        Re-fit deliberately stays a separate, explicit operation: centroid
        drift is a corpus-release decision, not a side effect.

        ``extra_cols``: optional {name: Column} annotations stamped onto
        the appended inverted-list rows before the union — batch
        provenance (which release/crawl contributed a row) travels ON the
        index rather than being re-derived after the fact. When the
        existing ``assigned`` table carries annotation columns, every
        append must supply the same ones (unionByName resolves by name
        and fails loudly on a mismatch, never silently NULL-fills).
        Annotation names must not collide with the inverted-list schema
        ({'mid', 'me', 'cell'}): withColumn would silently OVERWRITE the
        id/vector/cell columns and corrupt the index (ADVICE r9)."""
        assert self.assigned is not None, "fit or load first"
        reserved = {"mid", "me", "cell"} & set(extra_cols or {})
        if reserved:
            raise ValueError(
                f"extra_cols would overwrite inverted-list columns: "
                f"{sorted(reserved)} (reserved: mid, me, cell)"
            )
        add = self.assign(vectors, id_col, vec_col)
        for name, col in (extra_cols or {}).items():
            add = add.withColumn(name, col)
        self.assigned = self.assigned.unionByName(add)
        return self

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "e",
    ) -> DataFrame:
        """Top-k per query among the nprobe nearest cells (cosine,
        deterministic tie-break on rounded cosine then id)."""
        assert self.assigned is not None, "fit first"
        q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
        # stage 1: rank cells per query by centroid distance (tiny cross join)
        qc = q.crossJoin(F.broadcast(self.centroids)).withColumn(
            "cdist",
            F.aggregate(
                F.zip_with(F.col("qe"), F.col("ce"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        wc = Window.partitionBy("qid").orderBy(F.col("cdist"), F.col("cell"))
        probed = (
            qc.withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= nprobe)
            .select("qid", "qe", "cell")
        )
        # stage 2: exact cosine within probed cells only
        cand = probed.join(self.assigned, "cell").filter(F.col("qid") != F.col("mid"))
        cos = F.round(
            _dot(F.col("qe"), F.col("me"))
            / (_norm(F.col("qe")) * _norm(F.col("me"))),
            6,
        )
        scored = cand.select("qid", "mid", cos.alias("cosine"))
        w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("mid"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "mid", "cosine", "rank")
        )
