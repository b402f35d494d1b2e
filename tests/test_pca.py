"""Semantic contract for distributed PCA (rows-only query)."""

from __future__ import annotations

import numpy as np
import pytest

from data_integration_spark.similarity.pca import pca_fit, pca_project
from data_integration_spark.sources.catalog import Catalog

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return Catalog(spark, SF)["embeddings"]


def test_components_orthonormal_and_variance_ordered(spark, emb):
    mu, comps, vars_ = pca_fit(emb, k=3)
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)
    assert vars_[0] >= vars_[1] >= vars_[2] > 0


def test_projection_variance_matches_eigenvalues(spark, emb):
    mu, comps, vars_ = pca_fit(emb, k=2)
    P = pca_project(emb, mu, comps).toPandas()
    assert np.isclose(P["pc1"].var(ddof=1), vars_[0], rtol=1e-6)
    assert np.isclose(P["pc2"].var(ddof=1), vars_[1], rtol=1e-6)
    # projections of centered data are centered
    assert abs(P["pc1"].mean()) < 1e-8
    # pc1 explains more than pc2 on the actual projection too
    assert P["pc1"].var() > P["pc2"].var()


def test_fit_is_partition_invariant(spark, emb):
    mu1, c1, v1 = pca_fit(emb, k=2)
    mu2, c2, v2 = pca_fit(emb.repartition(17), k=2)
    assert np.allclose(mu1, mu2, atol=1e-10)
    assert np.allclose(v1, v2, rtol=1e-9)
    assert np.allclose(c1, c2, atol=1e-8)  # sign-canonicalized
