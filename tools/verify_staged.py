"""Verify STAGED (register_pending) queries against their oracles at the
given SF dirs — the staged-name-safe sibling of tests/oracle_harness.py's
CLI (which resolves only LIVE names; see NOTES.md r13 §6 collision lesson).

    python tools/verify_staged.py [name ...]          # default: all staged
    SFS=/root/testdata/sf0.01 python tools/verify_staged.py q_overlap_kmv
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_integration_spark import queries as Q
from data_integration_spark.session import get_spark
from tests.oracle_harness import compare, duck_connection

Q.load_all()

names = sys.argv[1:] or sorted(Q.PENDING_R10)
sfs = os.environ.get(
    "SFS",
    "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
).split(",")

# the engine's own session profile (honors SPARK_GRAFT_CPUS + standard
# confs) — staged parity must run under the SAME profile that the tests
# and the driver use (r14 review finding #8)
spark = get_spark(app_name="verify-staged")
spark.sparkContext.setLogLevel("ERROR")

fail = 0
for d in sfs:
    con = duck_connection(d)
    for n in names:
        fn, oracle = Q.PENDING_R10[n]
        if oracle is None:
            df = fn(spark, d)
            print(f"{d} {n}: rows-only, {df.count()} rows")
            continue
        errs = compare(fn(spark, d), con, oracle, n)
        if errs:
            fail += 1
            print(f"{d} {n}: FAIL {errs}")
        else:
            print(f"{d} {n}: PASS")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
