"""Semantics of the sequence-packing operator (rows-only query — the
property tests here ARE its correctness contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_spark.operators.packing import pack_documents
from data_integration_spark.sources.catalog import Catalog

SF = "/root/testdata/sf0.001"
BUDGET = 256


@pytest.fixture(scope="module")
def docs(spark):
    return Catalog(spark, SF)["documents"].select(
        "doc_id",
        F.size(F.split(F.col("text"), "\\s+")).alias("token_count"),
    )


def test_no_bin_exceeds_budget_except_oversize_singletons(spark, docs):
    bins = pack_documents(docs, budget=BUDGET, n_shards=8).collect()
    for b in bins:
        if b.total_tokens > BUDGET:
            assert b.n_docs == 1, f"multi-doc bin over budget: {b}"


def test_every_doc_packed_exactly_once(spark, docs):
    bins = pack_documents(docs, budget=BUDGET, n_shards=8)
    totals = bins.agg(
        F.sum("n_docs").alias("docs"), F.sum("total_tokens").alias("toks")
    ).collect()[0]
    src = docs.agg(
        F.count("*").alias("docs"), F.sum("token_count").alias("toks")
    ).collect()[0]
    assert totals.docs == src.docs
    assert totals.toks == src.toks


def test_packing_is_rerun_deterministic(spark, docs):
    a = sorted(map(tuple, pack_documents(docs, n_shards=4).collect()))
    b = sorted(
        map(tuple, pack_documents(docs.repartition(13), n_shards=4).collect())
    )
    assert a == b  # content-hash sharding → partitioning-independent


def test_packing_fill_ratio_is_reasonable(spark, docs):
    """FFD with bounded lookback should still fill bins well: average fill
    of non-oversize bins stays above 70% on real document lengths."""
    bins = pack_documents(docs, budget=BUDGET, n_shards=8)
    avg_fill = (
        bins.filter(F.col("total_tokens") <= BUDGET)
        .agg(F.avg("fill_ratio"))
        .collect()[0][0]
    )
    assert avg_fill > 0.70, avg_fill
