"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``data_integration_spark/queries/`` — one registered
query per operator row of SURVEY.md §2 plus the training-data-pipeline
extensions (dedup / similarity / text / windows). Names without an oracle
entry are rows-only by the contract's escape hatch (stochastic draws or
hash functions DuckDB cannot reproduce).

Environment-gated by contract: ``q_transform_with_state`` (Spark 4
``transformWithStateInPandas``) registers ONLY where ``google.protobuf``
is importable — this sandbox lacks protobuf, so the name never enters a
driver window. The stateful-streaming capability itself is attested by
``q_stateful_stream`` (``applyInPandasWithState``, full oracle +
batch-equivalence pytest); see COVERAGE.md "Environment-gated by
contract".
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust against being loaded by file path from any cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_integration_spark.queries import ORACLES, QUERIES, load_all

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's final report
    (``Method_code.Rmd:763-772``) re-shaped onto the TPC-H-ish schema —
    scan → multi-join → grouped weighted agg → survey SE → sqrt-MSPE →
    left-join assembly → rounded projection."""
    return QUERIES["q_report_final"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return dict(ORACLES)
