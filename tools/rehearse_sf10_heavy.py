"""sf10 (100x) rehearsal for the r7 heavy ops (VERDICT r7 #4):
q_bpe_train, q_ann_pq, q_ann_ivfpq, q_substring_dedup are the four most
expensive registry ops and were absent from the recorded sf10 table
(SCALING.md). Times each at sf0.1 (warm) and at .scratch/sf10 through the
noop sink (bench.py methodology: one warm pass, then min of the timed
passes) and prints a JSON line per op.

Usage: python tools/rehearse_sf10_heavy.py [op ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = ["q_substring_dedup", "q_ann_pq", "q_ann_ivfpq", "q_bpe_train"]
SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scratch/sf10"


def timed(fn, spark, sf_dir, passes=2):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from data_integration_spark.queries import QUERIES, load_all
    from data_integration_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="rehearse_sf10")
    ops = sys.argv[1:] or OPS
    for name in ops:
        fn = QUERIES[name]
        t_small = timed(fn, spark, SF01, passes=2)
        # same warm-then-time methodology at sf10 (a cold pass would fold
        # parquet-footer / codegen start-up into the scaling ratio)
        t_big = timed(fn, spark, SF10, passes=1)
        print(
            json.dumps(
                {
                    "op": name,
                    "sf0.1_sec": round(t_small, 2),
                    "sf10_sec": round(t_big, 2),
                    "ratio_at_100x_data": round(t_big / t_small, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
