"""r12 sf10 (100×) rehearsals — reproduces every SCALING.md r12 row.

Covers the round's staged ops (batch + streaming) and the IVFADC
refresh is NOT here (it is exactly `python tools/rehearse_r11b.py
ivfpq` re-run on the current tree — same script, same knobs, so the
r11/r12 rows stay apples-to-apples).

Usage: python tools/rehearse_r12.py [batch|stream|linkage ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scratch/sf10"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def rehearse_batch(spark, pending):
    """The three non-streaming staged ops: warm + one timed noop pass."""
    for name in ("q_heavy_hitters_mg", "q_quantile_sketch", "q_ann_opq"):
        fn, _o = pending[name]
        for sf, tag in ((SF01, "sf0.1"), (SF10, "sf10")):
            _noop(fn(spark, sf))  # warm
            t0 = time.perf_counter()
            _noop(fn(spark, sf))
            print(
                json.dumps(
                    {"op": name, "tag": tag, "sec": round(time.perf_counter() - t0, 2)}
                ),
                flush=True,
            )


def rehearse_stream(spark, pending):
    """Streaming ops replay real files — no warm pass (each run rebuilds
    its replay dirs), so the recorded number is one full cold loop."""
    for name in ("q_streaming_heavy_hitters", "q_streaming_linkage"):
        fn, _o = pending[name]
        for sf, tag in ((SF01, "sf0.1"), (SF10, "sf10")):
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            print(
                json.dumps(
                    {
                        "op": name,
                        "tag": tag,
                        "sec": round(time.perf_counter() - t0, 2),
                        "rows": n,
                    }
                ),
                flush=True,
            )


def rehearse_linkage(spark, pending):
    """The blocked-pair batch family at 1.04G sf10 pairs (adaptive
    B = ⌈n/15000⌉ buckets; see SCALING.md for the fpr-at-sf10 note —
    the rehearsal corpus's key-shifted copies are genuine quasi-dups)."""
    for name in ("q_linkage_patterns", "q_linkage_certificate"):
        fn, _o = pending[name]
        for sf, tag in ((SF01, "sf0.1"), (SF10, "sf10")):
            t0 = time.perf_counter()
            rows = fn(spark, sf).collect()
            print(
                json.dumps(
                    {
                        "op": name,
                        "tag": tag,
                        "sec": round(time.perf_counter() - t0, 2),
                        "rows": len(rows),
                    }
                ),
                flush=True,
            )


def main() -> None:
    from data_integration_spark.queries import PENDING_R10, load_all
    from data_integration_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="rehearse_r12")
    stages = sys.argv[1:] or ["batch", "stream", "linkage"]
    fns = {
        "batch": rehearse_batch,
        "stream": rehearse_stream,
        "linkage": rehearse_linkage,
    }
    for s in stages:
        fns[s](spark, PENDING_R10)
    spark.stop()


if __name__ == "__main__":
    main()
