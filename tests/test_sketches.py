"""Accuracy contract for the mergeable-sketch query (rows-only in the
oracle harness — these bounds ARE its correctness check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_spark.queries import QUERIES, load_all
from data_integration_spark.sources.catalog import Catalog

load_all()
SF = "/root/testdata/sf0.01"


def test_hll_union_estimate_close_to_exact(spark):
    row = QUERIES["q_hll_mergeable"](spark, SF).collect()[0]
    # keys are unique across nations, so the union's truth == sum of exacts
    rel_err = abs(row.global_estimate - row.global_exact) / row.global_exact
    assert rel_err < 0.05, (row.global_estimate, row.global_exact)
    assert row.n_nations > 1  # actually exercised the merge


def test_hll_merge_tracks_single_pass_sketch(spark):
    """Union of per-group sketches must estimate within ~1% of one global
    sketch — the property that makes sketches reusable at 100 TB. (Not
    bit-equal: the Datasketches union path keeps its own register state,
    so the two estimators differ at the last digit.)"""
    cust = Catalog(spark, SF)["customer"]
    merged = (
        cust.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    single = cust.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("est")
    ).collect()[0].est
    assert abs(merged - single) / single < 0.01, (merged, single)
