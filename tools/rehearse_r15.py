"""Round-15 scale rehearsals (one idle-box run, r13 timing-trap
discipline: warm pass first, nothing heavy before it, one JVM per leg
family):

1. q_quality_nb_filter at sf0.1 / sf10 / sf100 — the VERDICT r14 #4
   re-measure: the shared (doc, tok) exchange's token key is now a
   dictionary-encoded xxhash64 BIGINT (nb_classifier.py r15), cutting
   the shuffle bytes the r14 row attributed the 12×/decade sf100 tail
   to. Compare against the r14 rows (sf0.1 ~0.9 s, sf10 8.2 s,
   sf100 99.3 s).
2. q_semdedup_trained's exact body at sf10 (.scratch/sf10, 200k
   vectors incl. planted): the now-staged PRODUCTION path — trained
   K ≈ √N centroids via ivf.train_centroids + the same decisions
   kernel. The r14 ad-hoc K=448 leg measured 3.77 s; this leg times
   the driver-attestable form of the same configuration.
3. q_dedup_edit_verify at sf10 (500k documents): the new edit tier on
   top of the banded-LSH + Jaccard-verify pipeline — the marginal cost
   over q_dedup_minhash is two text-fetch equi-joins + the banded
   O(len·cap) Levenshtein map on the verified pair set only.

Usage: python tools/rehearse_r15.py [leg ...]   # legs: nbq semdedup edit
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = "/root/repo/.scratch/sf10"
SF100 = "/root/repo/.scratch/sf100"


def _time(tag: str, op: str, build):
    build().write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    print(
        json.dumps(
            {"op": op, "tag": tag, "sec": round(time.perf_counter() - t0, 2)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    legs = sys.argv[1:] or ["nbq", "semdedup", "edit"]
    from data_integration_spark.queries import PENDING_R10, QUERIES, load_all
    from data_integration_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="rehearse-r15")
    spark.sparkContext.setLogLevel("ERROR")

    if "nbq" in legs:
        fn = QUERIES["q_quality_nb_filter"]
        for tag, d in (
            ("sf0.1 (1x)", "/root/testdata/sf0.1"),
            ("sf10 (100x)", SF10),
            ("sf100 (1000x)", SF100),
        ):
            _time(tag, "q_quality_nb_filter[tok_h]", lambda d=d: fn(spark, d))

    if "semdedup" in legs:
        fn = PENDING_R10.get("q_semdedup_trained", (None,))[0] or QUERIES[
            "q_semdedup_trained"
        ]
        _time("sf10 (100x)", "q_semdedup_trained", lambda: fn(spark, SF10))

    if "edit" in legs:
        fn = PENDING_R10.get("q_dedup_edit_verify", (None,))[0] or QUERIES[
            "q_dedup_edit_verify"
        ]
        _time("sf10 (100x)", "q_dedup_edit_verify", lambda: fn(spark, SF10))

    # extended legs (added after the first idle-box run): the two bonus
    # r15-staged capabilities. Invoke: python tools/rehearse_r15.py extra
    if "extra" in legs:
        for name in ("q_compression_ratio", "q_streaming_crawl_frontier"):
            fn = PENDING_R10[name][0]
            _time("sf10 (100x)", name, lambda fn=fn: fn(spark, SF10))

    # the trained-semdedup leg with the FIT timed separately from the
    # decisions pass (the production split a release pipeline sees:
    # fit once per release, decide per corpus)
    if "semdedup_split" in legs:
        import numpy as _np

        from data_integration_spark.queries.similarity_queries import (
            _scale_n_cells,
        )
        from data_integration_spark.similarity.ann import as_double_array
        from data_integration_spark.similarity.ivf import train_centroids
        from data_integration_spark.similarity.semdedup import (
            semdedup_decisions,
        )
        from data_integration_spark.sources.catalog import Catalog
        from pyspark.sql import functions as F

        emb = Catalog(spark, SF10)["embeddings"].select(
            "vec_id", as_double_array("embedding", "e")
        )
        n = emb.count()
        t0 = time.perf_counter()
        cents = train_centroids(emb, _scale_n_cells(n), seed=11)
        fit_sec = round(time.perf_counter() - t0, 2)
        planted = emb.filter(F.col("vec_id") % 23 == 5).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "e"
        )
        corpus = emb.unionByName(planted)
        dec = lambda: semdedup_decisions(corpus, cents.tolist(), 0.40)  # noqa: E731
        dec().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        dec().write.format("noop").mode("overwrite").save()
        print(
            json.dumps(
                {
                    "op": "q_semdedup_trained[split]",
                    "tag": "sf10 (100x)",
                    "fit_sec": fit_sec,
                    "decide_sec": round(time.perf_counter() - t0, 2),
                    "k": _scale_n_cells(n),
                }
            ),
            flush=True,
        )

    spark.stop()
