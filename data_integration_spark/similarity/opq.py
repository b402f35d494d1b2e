"""Parametric Optimized Product Quantization (OPQ-P): PCA rotation +
eigenvalue-balanced subspace allocation before PQ (Ge, He, Ke, Sun,
"Optimized Product Quantization for Approximate Nearest Neighbor
Search", CVPR 2013 §4 — the closed-form parametric variant; the
iterative Procrustes variant refines it but the parametric one is what
a one-pass 100 TB release job runs).

Why: plain PQ splits dimensions in their NATURAL order, so correlated /
unbalanced-variance dimensions land in the same subspace and waste
codebook capacity. OPQ-P rotates into the PCA basis (decorrelates) and
then PERMUTES the rotated dimensions so every subspace receives a
near-equal product of eigenvalues (the paper's balanced-variance
criterion) — all from statistics already computed by the distributed
``pca_fit`` (one d×d Gramian partial-aggregate; no extra corpus pass).

Scale shape: the rotation is a d×d matrix in task closures (KBs at
d=64); applying it is one GEMM per Arrow batch inside ``mapInPandas``
(the ``pca_project`` pattern); everything downstream is the unchanged
``PQIndex`` machinery. Because R is orthonormal, squared distances —
and therefore ADC search semantics and quantization MSE — are preserved
between the original and rotated spaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from data_integration_spark.similarity.pca import pca_fit


def _log_spread(vals: np.ndarray, perm: list[int], m: int) -> float:
    """max−min of per-subspace log-eigenvalue products under contiguous
    chunking of ``perm`` (the balanced-variance objective's spread)."""
    dsub = len(perm) // m
    logs = [
        float(
            np.log(
                np.maximum(vals[perm[j * dsub : (j + 1) * dsub]], 1e-300)
            ).sum()
        )
        for j in range(m)
    ]
    return max(logs) - min(logs)


def eigen_allocation(vals: np.ndarray, m: int) -> list[int]:
    """Greedy balanced-product allocation (OPQ-P): visit dimensions by
    descending eigenvalue, always assigning to the subspace with the
    smallest current log-product (ties: lowest subspace id) until each
    holds d/m dimensions. Returns the dimension permutation that lays
    subspace j's dimensions contiguously at [j·dsub, (j+1)·dsub).

    The capacity-constrained greedy is a heuristic — it is NOT
    guaranteed to beat the plain descending-contiguous layout on every
    eigenvalue spectrum, so the allocation falls back to that natural
    layout whenever the greedy spread comes out worse. That makes the
    q_ann_opq certificate's ``balance_not_worse`` (greedy spread ≤
    natural spread) true BY CONSTRUCTION, not a measured property of
    one corpus."""
    d = len(vals)
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    vals = np.asarray(vals)
    dsub = d // m
    order = np.argsort(-vals, kind="stable")
    logs = [0.0] * m
    buckets: list[list[int]] = [[] for _ in range(m)]
    for dim in order:
        j = min(
            (j for j in range(m) if len(buckets[j]) < dsub),
            key=lambda j: (logs[j], j),
        )
        buckets[j].append(int(dim))
        logs[j] += float(np.log(max(vals[dim], 1e-300)))
    greedy = [dim for b in buckets for dim in b]
    natural = [int(dim) for dim in order]
    if _log_spread(vals, greedy, m) <= _log_spread(vals, natural, m):
        return greedy
    return natural


def opq_rotation(
    df: DataFrame, m: int, vec_col: str = "e"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Learn the OPQ-P rotation from the corpus: full-rank PCA (one
    distributed Gramian pass) + eigenvalue allocation. Returns
    (mu d-vector, R d×d with rows = permuted components, eigenvalues in
    the PERMUTED row order). ``R @ R.T == I`` (orthonormal rows — a
    permutation of an orthonormal basis)."""
    probe = df.select(vec_col).limit(1).collect()
    if not probe:
        raise ValueError("opq_rotation: empty corpus")
    d = len(probe[0][0])
    mu, comps, vals = pca_fit(df, vec_col, k=d)
    perm = eigen_allocation(vals, m)
    return mu, comps[perm], vals[perm]


def rotate_vectors(
    df: DataFrame,
    mu: np.ndarray,
    R: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """(id, rotated vector): one GEMM per Arrow batch, no shuffle —
    centered then rotated, y = R·(x − μ). Distance-preserving between
    any two vectors (orthonormal R), so PQ/ADC semantics carry over."""
    mu_b, R_b = mu.copy(), R.copy()

    def rot(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mu_b) @ R_b.T
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), vec_col: list(Y)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        rot, f"{id_col} long, {vec_col} array<double>"
    )
