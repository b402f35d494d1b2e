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
from pyspark.sql.window import Window

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


@register(
    "q_chi_square",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY event_type, dow
    ),
    tot AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY dow) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs
    )
    SELECT ROUND(SUM((o - CAST(row_tot * col_tot AS DOUBLE) / n)
                     * (o - CAST(row_tot * col_tot AS DOUBLE) / n)
                     / (CAST(row_tot * col_tot AS DOUBLE) / n)), 6)
             AS chi2_stat,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof
    FROM tot
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    day-of-week — the categorical-association screen of the statistical
    extension block (same family as the Welch A/B test, ``q_ab_test``).
    Expected counts come from the margin products; the statistic and
    degrees of freedom are returned (p-value needs an incomplete-gamma,
    deliberately out of scope without SciPy).

    Scale shape: the contingency table is |types|×7 — the windows and the
    final reduction run over a cells-sized frame; only the initial count
    touches the fact table (one shuffle)."""
    ev = Catalog(spark, sf_dir)["events"]
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count("*").alias("o"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    tot = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(w_row).alias("row_tot"),
        F.sum("o").over(w_col).alias("col_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    return tot.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
            "chi2_stat"
        ),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("dow") - 1)
        ).alias("dof"),
    )


@register(
    "q_mann_whitney",
    oracle="""
    WITH pooled AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
      SELECT event_type,
             RANK() OVER (ORDER BY value)
               + (CAST(COUNT(*) OVER (PARTITION BY value) AS DOUBLE) - 1) / 2
               AS midrank
      FROM pooled
    ),
    stats AS (
      SELECT
        SUM(CASE WHEN event_type = 'click' THEN midrank END) AS r_a,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM ranked
    )
    SELECT n_a, n_b,
           ROUND(r_a - CAST(n_a * (n_a + 1) AS DOUBLE) / 2, 2) AS u_stat,
           ROUND((r_a - CAST(n_a * (n_a + 1) AS DOUBLE) / 2)
                 / (CAST(n_a AS DOUBLE) * n_b), 6) AS auc
    FROM stats
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test comparing the value distribution of
    'click' vs 'view' events, with midranks for ties; also reports
    U/(n_a·n_b) — the nonparametric effect size (= AUC). The
    distribution-free alternative to the Welch test when normality is
    off the table.

    Scale shape (r6): midranks come from per-value tie collapse + a
    RANGE-PARTITIONED prefix count (operators/prefix.py::
    range_prefix_sum) — rank(v) = count-below + 1 and
    midrank(v) = count-below + (ties+1)/2, so the pooled FACT rows never
    funnel through a one-task global RANK window (the pre-r6 form, the
    q_vocab_build wart class on fact-sized frames). Ranks and tie
    counts are integers (+ halves), so the statistic is grid-exact across
    engines."""
    from data_integration_spark.operators.prefix import range_prefix_sum

    ev = Catalog(spark, sf_dir)["events"]
    pooled = ev.filter(F.col("event_type").isin("click", "view")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("in_a"),
    )
    per_val = pooled.groupBy("value").agg(
        F.count("*").alias("n_all"), F.sum("in_a").alias("a_cnt")
    )
    cum = range_prefix_sum(per_val, "value", "n_all", out_col="cum_n")
    below = F.col("cum_n") - F.col("n_all")
    midrank = below + (F.col("n_all") + 1).cast("double") / 2
    stats = cum.agg(
        F.sum(F.col("a_cnt") * midrank).alias("r_a"),
        F.sum("a_cnt").alias("n_a"),
        F.sum(F.col("n_all") - F.col("a_cnt")).alias("n_b"),
    )
    u = F.col("r_a") - (F.col("n_a") * (F.col("n_a") + 1)).cast("double") / 2
    return stats.select(
        "n_a",
        "n_b",
        F.round(u, 2).alias("u_stat"),
        F.round(
            u / (F.col("n_a").cast("double") * F.col("n_b")), 6
        ).alias("auc"),
    )


@register(
    "q_ks_test",
    oracle="""
    WITH pooled AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN event_type <> 'click' THEN 1 ELSE 0 END AS in_b
      FROM events WHERE event_type IN ('click', 'view')
    ),
    cum AS (
      SELECT value,
             SUM(SUM(in_a)) OVER (ORDER BY value) AS ca,
             SUM(SUM(in_b)) OVER (ORDER BY value) AS cb,
             (SELECT SUM(in_a) FROM pooled) AS n_a,
             (SELECT SUM(in_b) FROM pooled) AS n_b
      FROM pooled GROUP BY value
    )
    SELECT ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a
                         - CAST(cb AS DOUBLE) / n_b)), 6) AS ks_stat,
           CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b
    FROM cum
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic ('click' vs 'view' value
    distributions): the max ECDF gap, evaluated at every distinct value —
    the drift detector data-quality monitors run between a reference and
    a live sample. Counts are exact integers and each ECDF is one
    integer-ratio division, so the statistic is bit-stable across
    engines.

    Scale shape (r6): one shuffle groups by value (collapsing duplicates
    FIRST); BOTH ECDF cumulatives then ride ONE range-partitioned prefix
    pass (operators/prefix.py::range_prefix_sum, list form — one range
    exchange, one offsets job, one in-partition window), and the grand
    totals are a 1-row aggregate broadcast back — no single-partition
    window anywhere (the pre-r6 ordered-cum + Window.partitionBy() pair
    funneled the distinct-value frame, worst-case data-proportional,
    through one task)."""
    from data_integration_spark.operators.prefix import range_prefix_sum

    ev = Catalog(spark, sf_dir)["events"]
    pooled = ev.filter(F.col("event_type").isin("click", "view")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("in_a"),
        F.when(F.col("event_type") != "click", 1).otherwise(0).alias("in_b"),
    )
    per_val = pooled.groupBy("value").agg(
        F.sum("in_a").alias("a_cnt"), F.sum("in_b").alias("b_cnt")
    )
    totals = per_val.agg(
        F.sum("a_cnt").alias("n_a"), F.sum("b_cnt").alias("n_b")
    )
    cum = range_prefix_sum(
        per_val, "value", ["a_cnt", "b_cnt"], out_col=["ca", "cb"]
    ).crossJoin(F.broadcast(totals))
    return cum.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("n_a")
                    - F.col("cb").cast("double") / F.col("n_b")
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
