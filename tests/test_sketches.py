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


def test_countmin_linearity_and_upper_bound(spark):
    """Count-min laws on a planted Zipf stream: (1) estimate >= exact for
    EVERY token (the one-sided theorem); (2) the sketch is LINEAR —
    building it over any repartitioning yields identical cells (merge =
    elementwise sum is exact, the property that makes per-shard sketches
    combinable at 100 TB)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from data_integration_spark.queries.scalar_surface import (
        _CMS_D,
        _cms_bucket,
    )

    rows = []
    for i in range(200):
        tok = f"t{i % 17}" if i % 3 else f"rare{i}"
        rows.append((i, tok + " " + tok))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")

    def sketch_cells(df):
        b = df.select(
            "tok",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("depth"),
                            _cms_bucket(F.col("tok"), r).alias("bucket"),
                        )
                        for r in range(_CMS_D)
                    ]
                )
            ).alias("b"),
        ).select(F.col("b.depth").alias("depth"), F.col("b.bucket").alias("bucket"))
        return {
            (r["depth"], r["bucket"]): r["c"]
            for r in b.groupBy("depth", "bucket")
            .agg(F.count("*").alias("c"))
            .collect()
        }

    cells1 = sketch_cells(toks.repartition(1))
    cells8 = sketch_cells(toks.repartition(8))
    assert cells1 == cells8  # linearity: partitioning is invisible

    exact = {
        r["tok"]: r["c"]
        for r in toks.groupBy("tok").agg(F.count("*").alias("c")).collect()
    }
    pdf = pd.DataFrame({"tok": list(exact)})
    for tok, cnt in exact.items():
        import hashlib

        est = min(
            cells1[
                (
                    r,
                    int(
                        hashlib.md5(f"{tok}#{r}".encode()).hexdigest()[:8],
                        16,
                    )
                    % 128,
                )
            ]
            for r in range(_CMS_D)
        )
        assert est >= cnt, (tok, est, cnt)
