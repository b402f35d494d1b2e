"""Deterministic sampling/split operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_test_split,
)


def _ids(spark, n=4000):
    return spark.range(n).withColumnRenamed("id", "k")


def test_sample_partition_invariant_and_deterministic(spark):
    df = _ids(spark)
    a = sorted(r.k for r in deterministic_sample(df.repartition(3), 0.3, ["k"], salt=5).collect())
    b = sorted(r.k for r in deterministic_sample(df.repartition(17), 0.3, ["k"], salt=5).collect())
    assert a == b  # identical membership under any partitioning
    assert abs(len(a) / 4000 - 0.3) < 0.03  # rate close to the target


def test_stratified_fractions(spark):
    df = _ids(spark).withColumn(
        "s", F.when(F.col("k") % 2 == 0, "a").otherwise("b")
    )
    out = stratified_sample(df, "s", {"a": 0.5, "b": 0.1}, ["k"], salt=9)
    rates = {
        r.s: r.n / 2000
        for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert abs(rates["a"] - 0.5) < 0.05
    assert abs(rates["b"] - 0.1) < 0.03


def test_stratified_default_fraction_drops_unknown(spark):
    df = spark.createDataFrame([Row(k=1, s="zz")])
    assert stratified_sample(df, "s", {"a": 1.0}, ["k"]).count() == 0


def test_split_exhaustive_exclusive_and_group_safe(spark):
    df = _ids(spark).withColumn("grp", (F.col("k") / 10).cast("long"))
    out = train_test_split(df, 0.25, key_cols=["grp"], salt=3).cache()
    assert out.count() == 4000
    assert set(r.split for r in out.select("split").distinct().collect()) == {
        "train", "test"
    }
    # group-keyed hashing keeps every member of a group on one side
    mixed = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("nsplits"))
        .filter(F.col("nsplits") > 1)
        .count()
    )
    assert mixed == 0
    rate = out.filter(F.col("split") == "test").count() / 4000
    assert abs(rate - 0.25) < 0.07  # 400 groups -> coarser rate tolerance
