"""Scale-shape tests: bucketing, partition pruning, IVF recall, and a
hypothesis property check of the survey statistics."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_spark.plans.explain import count_shuffles, formatted_plan
from data_integration_spark.queries import QUERIES, load_all

load_all()
SF = "/root/testdata/sf0.001"


def test_partitioned_sink_prunes_partitions(spark):
    """The status filter must land in PartitionFilters (directory pruning),
    not PushedFilters (row filtering)."""
    df = QUERIES["q_partitioned_sink"](spark, SF)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "o_orderstatus" in pf, plan


def test_bucketed_join_avoids_shuffle(spark):
    """Pre-bucketed co-located join: bucketing both sides on the join key
    removes BOTH Exchanges (the 100 TB answer to repeated fact-fact joins)."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # in-memory catalog forgets tables across sessions but the warehouse
    # directories persist — DROP alone leaves LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/b_orders", ignore_errors=True)
    shutil.rmtree(f"{wh}/b_lineitem", ignore_errors=True)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")

    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    n_shuffles = count_shuffles(joined)
    assert n_shuffles == 0, formatted_plan(joined)
    # and the unbucketed equivalent shuffles at least once
    plain = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert count_shuffles(plain) >= 1
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=3/8 cells must recover most of the exact top-5."""
    from data_integration_spark.similarity.ann import as_double_array, cosine_topk
    from data_integration_spark.similarity.ivf import IVFIndex

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", as_double_array("embedding", "e"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.qid, r.mid) for r in cosine_topk(queries, emb, k=5).collect()
    }
    ivf = IVFIndex(n_cells=8, seed=11).fit(emb)
    approx = {
        (r.qid, r.mid) for r in ivf.search(queries, k=5, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # full probe == exhaustive search == exact
    full = {
        (r.qid, r.mid) for r in ivf.search(queries, k=5, nprobe=8).collect()
    }
    assert full == exact


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False),
            st.floats(0.1, 10, allow_nan=False),
        ),
        min_size=2,
        max_size=15,
    )
)
def test_survey_mean_se_matches_numpy(spark_session_holder, data):
    """Property: the single-pass sufficient-statistics SE equals the direct
    two-pass NumPy formula for arbitrary (y, w)."""
    spark = spark_session_holder
    from data_integration_spark.functions.stats import survey_mean_se

    df = spark.createDataFrame(
        [Row(g="a", y=float(y), w=float(w)) for y, w in data]
    )
    r = survey_mean_se(df, "g", "y", "w").collect()[0]
    y = np.array([d[0] for d in data])
    w = np.array([d[1] for d in data])
    mean = float((w * y).sum() / w.sum())
    n = len(data)
    se = float(
        math.sqrt((n / (n - 1)) * ((w * (y - mean)) ** 2).sum()) / w.sum()
    )
    assert abs(r["mean"] - mean) < 1e-8 * max(1, abs(mean))
    assert abs(r["se"] - se) < 1e-8 * max(1, abs(se))


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


def test_approx_distinct_within_tolerance(spark):
    """HLL++ approx counts within ±5% of exact (sketch accuracy contract)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r.l_returnflag: (r.p, r.s)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_suppkey").alias("s"),
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.approx_parts, r.approx_supps)
        for r in QUERIES["q_approx_distinct"](spark, SF).collect()
    }
    for k, (p, s) in exact.items():
        ap, asu = approx[k]
        assert abs(ap - p) <= max(2, 0.05 * p)
        assert abs(asu - s) <= max(2, 0.05 * s)
