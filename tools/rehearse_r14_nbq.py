"""Re-run the q_quality_nb_filter 1000× (sf100) rehearsal on the r14
single-corpus-scan tree (VERDICT r13 #4: the r13 row measured 258 s and
attributed the superlinear single-box tail to THREE corpus scans of
per-doc regex label work saturating one node's memory bandwidth — the
r14 restructure shares one (doc, label, tok) exchange across the
contingency / prior / scoring branches, so the label pass runs once).

Also re-times sf0.1 and sf10 so the scale curve row in SCALING.md is
from one box-state. Clean JVM per the r13 timing-trap discipline (warm
pass first, nothing heavy before it).

Usage: python tools/rehearse_r14_nbq.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = "/root/repo/.scratch/sf100"
SF10 = "/root/repo/.scratch/sf10"

if __name__ == "__main__":
    from data_integration_spark.queries import QUERIES, load_all
    from data_integration_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="rehearse-r14-nbq")
    fn = QUERIES["q_quality_nb_filter"]
    for tag, d in (
        ("sf0.1 (1x)", "/root/testdata/sf0.1"),
        ("sf10 (100x)", SF10),
        ("sf100 (1000x)", SF100),
    ):
        if not os.path.isdir(d) and not os.path.exists(d):
            print(json.dumps({"op": "q_quality_nb_filter", "tag": tag, "skip": d}))
            continue
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        print(
            json.dumps(
                {
                    "op": "q_quality_nb_filter",
                    "tag": tag,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            ),
            flush=True,
        )
    spark.stop()
