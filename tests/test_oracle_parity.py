"""Driver-mimic t2 gate: every registered query matches its DuckDB oracle
(row count + schema + order-insensitive values) on the small scale factor.

The full sf0.01 sweep runs standalone (python tests/oracle_harness.py); here
we keep CI fast with sf0.001 which exercises identical code paths.
"""

from __future__ import annotations

from tests.oracle_harness import run_all

SF = "/root/testdata/sf0.001"


def test_all_queries_match_oracle():
    results = run_all(SF)
    failures = {k: v for k, v in results.items() if v}
    assert not failures, f"oracle mismatches: {failures}"
