"""r11 sf10 (100x) rehearsals:

1. Winnowing registry (VERDICT r10 #2): time the once-per-release step
   (fingerprint + save the old corpus) separately from the per-crawl
   incremental step (load registry, fingerprint ONLY the new batch, pair)
   — the claim under test is that the incremental step no longer pays the
   archive's text re-fingerprinting the inline q_winnowing_cross_dedup
   form pays every run (99 s at sf10 in SCALING.md r10).
2. q_ann_ivf (VERDICT r10 #3/#8): re-rehearse the full fit+search op with
   the GEMM stage-1 cell ranking and the cached centroid matrix (r10
   recorded 68 s with the GEMM assign but HOF search stage-1).

Usage: python tools/rehearse_r11.py [registry|ivf ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scratch/sf10"
SCRATCH = "/root/repo/.scratch/rehearse_r11"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def rehearse_registry(spark, sf_dir, tag):
    from pyspark.sql import functions as F

    from data_integration_spark.queries.corpus_ops import winnow_fingerprints
    from data_integration_spark.similarity.persist import (
        load_winnowing_registry,
        save_winnowing_registry,
    )
    from data_integration_spark.sources.catalog import Catalog

    K, W, DF_CAP = 4, 4, 45
    path = f"{SCRATCH}/winnow_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    docs = Catalog(spark, sf_dir)["documents"].select("doc_id", "text")

    t0 = time.time()
    save_winnowing_registry(
        winnow_fingerprints(docs.filter(F.col("doc_id") >= 60), k=K, w=W),
        path, k=K, w=W,
    )
    t_release = time.time() - t0

    t0 = time.time()
    old_fp, old_df = load_winnowing_registry(spark, path, k=K, w=W)
    new_fp = winnow_fingerprints(docs.filter(F.col("doc_id") < 60), k=K, w=W)
    new_df = new_fp.groupBy("h").agg(F.count("*").cast("long").alias("df"))
    hot = (
        old_df.unionByName(new_df)
        .groupBy("h").agg(F.sum("df").alias("_df"))
        .filter(F.col("_df") > DF_CAP).select("h")
    )
    new_kept = new_fp.join(F.broadcast(hot), "h", "left_anti").select(
        F.col("doc_id").alias("new_doc"), "h"
    )
    old_kept = old_fp.join(F.broadcast(hot), "h", "left_anti").select(
        F.col("doc_id").alias("old_doc"), "h"
    )
    pairs = (
        new_kept.join(old_kept, "h")
        .groupBy("new_doc", "old_doc")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    noop(pairs)
    t_incr = time.time() - t0
    print(json.dumps({
        "op": "winnowing_registry", "sf": tag,
        "release_fingerprint_and_save_sec": round(t_release, 2),
        "incremental_load_and_dedup_sec": round(t_incr, 2),
    }), flush=True)


def rehearse_ivf(spark):
    from data_integration_spark.queries import QUERIES, load_all

    load_all()
    fn = QUERIES["q_ann_ivf"]
    noop(fn(spark, SF01))  # warm codegen / parquet footers at the small SF
    t0 = time.time()
    noop(fn(spark, SF10))
    print(json.dumps({
        "op": "q_ann_ivf", "sf10_sec": round(time.time() - t0, 2),
        "note": "GEMM stage-1 + cached centroid matrix (r10: 68s)",
    }), flush=True)


def main():
    from data_integration_spark.session import get_spark

    spark = get_spark(app_name="rehearse_r11")
    which = sys.argv[1:] or ["registry", "ivf"]
    if "registry" in which:
        rehearse_registry(spark, SF01, "sf0.1")
        rehearse_registry(spark, SF10, "sf10")
    if "ivf" in which:
        rehearse_ivf(spark)


if __name__ == "__main__":
    main()
