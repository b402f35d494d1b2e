"""Index persistence + incremental minhash dedup (round-5 surface).

The contract under test: a search from a LOADED index artifact is
row-for-row identical to a search from the in-session fit — persistence
must never change cell/bucket boundaries — and the stateless streaming
minhash signature equals the batch one, so stream dedup state is a true
incremental registry.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from data_integration_spark.dedup.minhash import with_minhash_signature
from data_integration_spark.similarity.ann import as_double_array, lsh_topk
from data_integration_spark.similarity.ivf import IVFIndex
from data_integration_spark.similarity.persist import (
    build_lsh_spec,
    load_ivf_index,
    load_lsh_spec,
    save_ivf_index,
    save_lsh_spec,
)
from data_integration_spark.sources.catalog import Catalog

SF = "/root/testdata/sf0.001"
SCRATCH = "/root/repo/.scratch/test_index_persist"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        Catalog(spark, SF)["embeddings"]
        .select("vec_id", as_double_array("embedding", "e"))
        .cache()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_loaded_search_equals_fit_search(spark, emb):
    shutil.rmtree(SCRATCH + "/ivf", ignore_errors=True)
    index = IVFIndex(n_cells=6, seed=11).fit(emb)
    queries = emb.filter(F.col("vec_id") < 12)
    direct = _rows(index.search(queries, k=4, nprobe=2))
    save_ivf_index(index, SCRATCH + "/ivf")
    loaded = load_ivf_index(spark, SCRATCH + "/ivf")
    assert _rows(loaded.search(queries, k=4, nprobe=2)) == direct
    assert (loaded.n_cells, loaded.seed) == (6, 11)


def test_ivf_save_requires_fit(spark):
    with pytest.raises(ValueError, match="fit"):
        save_ivf_index(IVFIndex(n_cells=4), SCRATCH + "/ivf_unfit")


def test_lsh_spec_roundtrip_and_search_equivalence(spark, emb):
    shutil.rmtree(SCRATCH + "/lsh", ignore_errors=True)
    spec = build_lsh_spec(dim=64, n_planes=6, n_tables=3, seed=7)
    save_lsh_spec(spec, SCRATCH + "/lsh")
    loaded = load_lsh_spec(SCRATCH + "/lsh")
    assert loaded == spec  # JSON round-trip keeps float coefficients exact
    queries = emb.filter(F.col("vec_id") < 12)
    seed_derived = lsh_topk(
        queries, emb, dim=64, k=4, n_planes=6, n_tables=3, seed=7
    )
    from_spec = lsh_topk(
        queries,
        emb,
        dim=64,
        k=4,
        n_planes=6,
        n_tables=3,
        planes_tables=loaded["tables"],
    )
    assert _rows(from_spec) == _rows(seed_derived)


def test_lsh_spec_shape_validation(spark):
    shutil.rmtree(SCRATCH + "/lsh_bad", ignore_errors=True)
    spec = build_lsh_spec(dim=8, n_planes=4, n_tables=2, seed=1)
    spec["tables"][0] = spec["tables"][0][:-1]  # drop a plane
    save_lsh_spec(spec, SCRATCH + "/lsh_bad")
    with pytest.raises(ValueError, match="shape mismatch"):
        load_lsh_spec(SCRATCH + "/lsh_bad")


def test_stateless_signature_matches_batch_and_dedups_copies(spark):
    docs = Catalog(spark, SF)["documents"].select("doc_id", "text")
    batch_sigs = {
        r.doc_id: r.sig
        for r in with_minhash_signature(docs, "text", "sig", k=16).collect()
    }
    # exact copies must share a signature: duplicate the corpus
    doubled = docs.unionByName(docs)
    deduped = (
        with_minhash_signature(doubled, "text", "sig", k=16)
        .dropDuplicates(["sig"])
        .collect()
    )
    n_distinct_sigs = len(set(batch_sigs.values()))
    assert len(deduped) == n_distinct_sigs
    # every surviving row carries the signature batch computed for its doc
    assert all(batch_sigs[r.doc_id] == r.sig for r in deduped)


def test_signature_is_shuffle_free(spark):
    """The stateless signature must add NO exchange — that is what makes it
    streaming-legal and 100 TB-narrow."""
    docs = Catalog(spark, SF)["documents"].select("doc_id", "text")
    plan = (
        with_minhash_signature(docs, "text", "sig", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_short_docs_collapse_to_one_survivor(spark):
    pdf = [(1, "one"), (2, "two"), (3, "a b c d e")]
    df = spark.createDataFrame(pdf, "doc_id long, text string")
    out = with_minhash_signature(df, "text", "sig", k=8).collect()
    sigs = {r.doc_id: r.sig for r in out}
    # <n_gram tokens → empty shingle set → shared degenerate signature
    assert sigs[1] == sigs[2] != sigs[3]
