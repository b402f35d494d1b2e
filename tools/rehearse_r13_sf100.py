"""1000× (sf100) spot-check for the document-table ops with the
flattest claimed scale curves — one order of magnitude past the
standing sf10 rehearsals, documents-only (the other tables aren't
touched by these ops, and a full sf100 TPC-H clone would be disk noise).

Two corpora, generated once into .scratch (single-explode plan, not the
generator's N-way union — at 1000 copies the union plan itself is the
bottleneck):

- ``sf100``: the honest dedup/quality corpus — copy i > 0 suffixes every
  token with ``_c{i}`` (tools/gen_scaled_testdata.py's rule), so
  within-copy near-dup density is preserved and cross-copy pairs are
  impossible; vocabulary grows 1000×.
- ``sf100_shared``: the skew-realistic corpus — copies keep the ORIGINAL
  token space, so hot tokens are 1000× hotter (the right stress for the
  no-shuffle Misra-Gries sketch, whose whole claim is bounded memory
  under Zipf heat).

Ops timed (warm pass then one timed noop pass):
- q_quality_nb_filter (staged)   on sf100        — token contingency +
  fused scoring at a 1000×-wider vocabulary
- q_heavy_hitters_mg  (live)     on sf100_shared — ≤ k counters per
  partition over ~270M token occurrences, no shuffle
- q_dedup_exact, q_token_count (live headline ops) on sf100

Usage: python tools/rehearse_r13_sf100.py [gen|run ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/.scratch/sf100"
OUT_SHARED = "/root/repo/.scratch/sf100_shared"
COPIES = 1000
K = 1_000_000  # doc_id stride, matches gen_scaled_testdata.py


def gen(spark) -> None:
    from data_integration_spark.sources.catalog import Catalog

    base = Catalog(spark, SRC)["documents"]
    copies = base.crossJoin(
        spark.range(COPIES).select(F.col("id").alias("cp"))
    ).select(
        (F.col("doc_id") + F.col("cp") * K).cast("long").alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
        "cp",
    )
    for out, shared in ((OUT, False), (OUT_SHARED, True)):
        path = f"{out}/documents.parquet"
        if os.path.exists(path):
            print(f"{path}: exists, skipping gen")
            continue
        df = copies
        if not shared:
            suffixed = F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda x: F.concat(x, F.lit("_c"), F.col("cp")),
                ),
                " ",
            )
            df = df.withColumn(
                "text", F.when(F.col("cp") == 0, F.col("text")).otherwise(suffixed)
            ).withColumn("n_chars", F.length("text").cast("long"))
        df.drop("cp").repartition(64).write.mode("overwrite").parquet(path)
        print(f"{path}: x{COPIES} written")


def run(spark) -> None:
    from data_integration_spark.queries import QUERIES, load_all

    load_all()
    jobs = [
        # LIVE since the r14 flip (was PENDING_R10 when this tool was
        # written; tools/rehearse_r14_nbq.py holds the current row)
        ("q_quality_nb_filter", QUERIES["q_quality_nb_filter"], OUT),
        ("q_heavy_hitters_mg", QUERIES["q_heavy_hitters_mg"], OUT_SHARED),
        ("q_dedup_exact", QUERIES["q_dedup_exact"], OUT),
        ("q_token_count", QUERIES["q_token_count"], OUT),
    ]
    for name, fn, d in jobs:
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        print(
            json.dumps(
                {
                    "op": name,
                    "tag": "sf100 (1000x)"
                    + (" shared-tokens" if d == OUT_SHARED else ""),
                    "sec": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    from data_integration_spark.session import get_spark

    which = set(sys.argv[1:]) or {"gen", "run"}
    unknown = which - {"gen", "run"}
    if unknown:  # a typo must fail loudly, not no-op a multi-hour rehearsal
        raise SystemExit(f"unknown mode(s) {sorted(unknown)}; use gen|run")
    spark = get_spark(app_name="rehearse-sf100")
    if "gen" in which:
        gen(spark)
    if "run" in which:
        run(spark)
    spark.stop()
