"""Round-15 optimization profiler: time registered queries through the
noop sink (bench methodology: warm pass + min-of-N timed passes) and dump
each query's ``explain("formatted")`` to plans/r15/<name>_<tag>.txt.

Usage:
    python tools/profile_r15.py --tag before [--sf /root/testdata/sf0.1]
        [--passes 3] [name ...]

With no names: the bench set (HEADLINE + LLM_OPS). Prints one JSON line
with per-query min seconds (and spread) so before/after comparisons use
the exact bench discipline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from bench import HEADLINE, LLM_OPS
    from data_integration_spark.queries import QUERIES, load_all
    from data_integration_spark.session import get_spark

    load_all()
    names = args.names or (HEADLINE + LLM_OPS)
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark(app_name=f"profile_r15_{args.tag}")
    # same warm-up as bench.py
    QUERIES["q_scan_parquet"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        if not args.no_plans:
            df = QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        QUERIES[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        passes = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            passes.append(time.perf_counter() - t0)
        out[name] = {
            "min": round(min(passes), 3),
            "spread": round(max(passes) - min(passes), 3),
        }
        print(f"[{args.tag}] {name}: {out[name]['min']}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": args.tag, "sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
