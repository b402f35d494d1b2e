"""Value-level semantics for the training-run ordering/experiment queries
(queries/training_ops.py). Oracle parity runs separately in
test_oracle_parity; these pin the properties the oracle hash can't state:
permutation-ness, epoch independence, fold coverage, window-final
equivalence, and the ANOVA arithmetic against an independent numpy path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_spark.queries import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


@pytest.fixture(scope="module")
def shuffle_df(spark):
    return QUERIES["q_training_order_shuffle"](spark, SF_SMALL).cache()


def test_epoch_shuffle_is_a_permutation_per_epoch(spark, shuffle_df):
    per_epoch = (
        shuffle_df.groupBy("epoch")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("order_idx").alias("n_idx"),
            F.min("order_idx").alias("lo"),
            F.max("order_idx").alias("hi"),
        )
        .collect()
    )
    assert len(per_epoch) == 2
    for r in per_epoch:
        assert r["n_idx"] == r["n"] and r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_epoch_shuffle_epochs_are_different_orders(spark, shuffle_df):
    e0 = shuffle_df.filter("epoch = 0").selectExpr(
        "doc_id", "order_idx AS idx0"
    )
    e1 = shuffle_df.filter("epoch = 1").selectExpr(
        "doc_id", "order_idx AS idx1"
    )
    moved = e0.join(e1, "doc_id").filter("idx0 <> idx1").count()
    assert moved > e0.count() * 0.9  # salted epochs: almost every doc moves


def test_epoch_shuffle_deterministic_rerun(spark, shuffle_df):
    again = QUERIES["q_training_order_shuffle"](spark, SF_SMALL)
    assert shuffle_df.exceptAll(again).count() == 0
    assert again.exceptAll(shuffle_df).count() == 0
    shuffle_df.unpersist()


def test_kfold_covers_corpus_and_folds_in_range(spark):
    report = QUERIES["q_kfold_assign"](spark, SF_SMALL).collect()
    folds = {r["fold"] for r in report}
    assert folds <= set(range(5)) and len(folds) == 5
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r["n_docs"] for r in report) == n_docs


def test_window_count_distinct_final_equals_count_distinct(spark):
    out = QUERIES["q_window_count_distinct"](spark, SF_SMALL)
    finals = out.groupBy("user_id").agg(F.max("n_types_so_far").alias("got"))
    truth = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("want"))
    )
    bad = finals.join(truth, "user_id").filter("got <> want").count()
    assert bad == 0


def test_anova_matches_numpy(spark):
    row = QUERIES["q_anova"](spark, SF_SMALL).collect()[0]
    pdf = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .toPandas()
    )
    groups = [g["o_totalprice"].to_numpy() for _, g in pdf.groupby("o_orderpriority")]
    k, n = len(groups), len(pdf)
    mu = pdf["o_totalprice"].mean()
    ssb = sum(len(g) * (g.mean() - mu) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k_groups"] == k
    assert row["df_between"] == k - 1 and row["df_within"] == n - k
    assert row["f_stat"] == pytest.approx(f_stat, abs=1e-5)
    assert row["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-5)
    assert np.isfinite(row["f_stat"]) and row["f_stat"] >= 0
