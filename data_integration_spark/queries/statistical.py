"""Statistical-layer t2 queries (SURVEY.md §2.10-2.12).

The EM / EBP / bootstrap pipelines run on survey-shaped fixtures (FIXTURES.md
family B) generated deterministically — their correctness is established by
pytest parameter-recovery and golden tests (tests/test_stats_*.py), the
reference's own validation style (SURVEY.md §5).

The entries here expose the deterministic relational skeletons of those
pipelines on the driver's TPC-H-ish tables so the t2 oracle covers the
dataflow shapes (the stochastic model outputs are rows-only by contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_spark.functions.math import expit
from data_integration_spark.functions.rng import seeded_normal
from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog


@register(
    "q_ebp_scoring_skeleton",
    oracle="""
    WITH scored AS (
      SELECT c_custkey, c_nationkey,
             1.0 / (1.0 + EXP(-(-1.0 + 0.0002 * c_acctbal))) AS theta
      FROM customer
    )
    SELECT c_nationkey,
           ROUND(100.0 * SUM(theta) / COUNT(*), 6) AS ebp_est
    FROM scored GROUP BY c_nationkey
    """,
)
def q_ebp_scoring_skeleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 EBP scoring skeleton (``Rmd:406-454``): expit(linear predictor) per
    unit → per-area mean ×100 — the deterministic core of EBP with v=0
    (the MC-draw average rides on top of this exact dataflow)."""
    cust = Catalog(spark, sf_dir)["customer"]
    scored = cust.select(
        "c_custkey",
        "c_nationkey",
        expit(F.lit(-1.0) + 0.0002 * F.col("c_acctbal")).alias("theta"),
    )
    return scored.groupBy("c_nationkey").agg(
        F.round(100.0 * F.sum("theta") / F.count("*"), 6).alias("ebp_est")
    )


@register("q_survey_pipeline")  # rows-only: full model pipeline output
def q_survey_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference pipeline end-to-end (``Rmd`` entire file): synthetic
    PEW/CPS/actuals fixtures → EM (adjusted ML) → EBP → direct estimates →
    comparison → bootstrap MSPE → final report — returned as the report
    table (state, name, actual_val, direct_est, EBP_est, direct_SE, EBP_SE).

    Deterministic end-to-end (hash RNG), but optimizer outputs are not
    SQL-expressible → rows-only. Statistical correctness is pinned by
    tests/test_stats_pipeline.py (parameter recovery, EBP-beats-direct,
    golden report)."""
    import os

    from data_integration_spark.stats.em import EMEstimator
    from data_integration_spark.stats.fixtures import make_fixtures
    from data_integration_spark.stats.pipeline import run_pipeline

    base = "/root/repo/.scratch/survey_fixtures"
    if not os.path.exists(os.path.join(base, "survey_small.parquet")):
        fx = make_fixtures()
        os.makedirs(base, exist_ok=True)
        for name in ("survey_small", "survey_big", "actual_result"):
            spark.createDataFrame(fx[name]).write.mode("overwrite").parquet(
                os.path.join(base, f"{name}.parquet")
            )
    small = spark.read.parquet(os.path.join(base, "survey_small.parquet"))
    big = spark.read.parquet(os.path.join(base, "survey_big.parquet"))
    actuals = spark.read.parquet(os.path.join(base, "actual_result.parquet"))
    res = run_pipeline(
        spark,
        small,
        big,
        actuals,
        em=EMEstimator(n_reps=200, tol=0.02, max_iter=40, seed=42),
        ebp_draws=100,
        bootstrap_reps=2,
        bootstrap_em=EMEstimator(n_reps=80, tol=0.05, max_iter=10, seed=43),
    )
    return res.report


@register("q_bootstrap_skeleton")  # rows-only: contains seeded draws
def q_bootstrap_skeleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 parametric-bootstrap skeleton (``Rmd:557-733``): per (rep, area)
    random effect draw + per-unit Bernoulli outcome simulation, long-form.
    Deterministic via hash-based RNG; stochastic values → rows-only."""
    cust = Catalog(spark, sf_dir)["customer"].select("c_custkey", "c_nationkey")
    reps = cust.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(5))).alias("rep")
    )
    v_b = seeded_normal("c_nationkey", "rep", mean=0.0, sd=0.5, salt=11)
    theta = expit(F.lit(-0.5) + v_b)
    return reps.select(
        "rep",
        "c_nationkey",
        "c_custkey",
        theta.alias("theta"),
    )
