"""Distributed PCA over an embedding column.

The 100 TB shape: the only thing that ever reaches the driver is the
d×d second-moment matrix (d = embedding dim, 64 here — a few KB),
accumulated as per-partition partials via ``mapInPandas`` (one BLAS
``X.T @ X`` per Arrow batch). The eigendecomposition of a d×d matrix is
driver-side numpy by design — O(d³) work on bytes, not data — and the
resulting components broadcast back into a second vectorized pass for
projection. No row of data is ever collected.

This is the same partial-aggregate pattern MLlib's RowMatrix uses
(computeGramianMatrix); re-expressed here over DataFrames + Arrow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def pca_fit(
    df: DataFrame, col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA; returns (mean d-vector, k×d components, k explained vars).

    Components are sign-canonicalized (largest-|coordinate| positive) so
    the fit is deterministic across partitionings up to float summation
    noise.
    """

    def partials(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "xx": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = df.select(col).mapInPandas(
        partials, "n long, s array<double>, xx array<double>"
    ).collect()  # ≤ one row per partition: bounded by cluster size, not data
    n = sum(r.n for r in rows)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.sum([r.s for r in rows], axis=0)
    d = s.shape[0]
    xx = np.sum([np.asarray(r.xx).reshape(d, d) for r in rows], axis=0)
    mu = s / n
    cov = (xx - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k×d
    for i in range(comps.shape[0]):  # sign canonicalization
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, vals[order]


def pca_project(
    df: DataFrame,
    mu: np.ndarray,
    comps: np.ndarray,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project each vector onto the fitted components: (id, pc1..pck)."""
    k = comps.shape[0]
    out_schema = f"{id_col} long, " + ", ".join(
        f"pc{i + 1} double" for i in range(k)
    )
    mu_b, comps_b = mu.copy(), comps.copy()  # closure-captured, broadcast by Spark

    def project(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            P = (X - mu_b) @ comps_b.T  # one GEMM per Arrow batch
            out = {id_col: pdf[id_col].to_numpy()}
            for i in range(k):
                out[f"pc{i + 1}"] = P[:, i]
            yield pd.DataFrame(out)

    return df.select(id_col, col).mapInPandas(project, out_schema)
