"""Second analytics block: user-journey paths, revenue concentration,
market-basket association rules, and the grouped string/mode reshaping
ops every BI surface ends up needing. All full-oracle; every aggregate
deterministic (explicit tie-breaks, rounded ratios)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog


@register(
    "q_event_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             STRING_AGG(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
    """,
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey paths: each user's first three events (by time,
    event_id tie-break) joined into a '>' path string, counted across
    users — the onboarding-flow Sankey feed. Path cardinality is bounded
    by |event_types|³, so the final aggregation is tiny regardless of
    corpus size; the per-user window is user-keyed (never global).

    Scale shape: one shuffle on user_id (window + the per-user collect
    ride the same exchange), one tiny path aggregation."""
    ev = Catalog(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "q_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev, o_custkey,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rk
      FROM rev
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(rev) AS total, SUM(rk * rev) AS weighted
      FROM ranked
    ),
    top AS (
      SELECT SUM(r.rev) AS top_rev
      FROM ranked r, agg
      WHERE r.rk > agg.n - agg.n // 10
    )
    SELECT agg.n AS n_customers,
           ROUND(2.0 * agg.weighted / (agg.n * agg.total)
                 - (agg.n + 1.0) / agg.n, 6) AS gini,
           ROUND(top.top_rev / agg.total, 6) AS top_decile_share
    FROM agg, top
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration certificate: the Gini coefficient of
    customer revenue (G = 2·Σ rank·y / (n·Σy) − (n+1)/n over the
    ascending-sorted revenues) plus the top-decile revenue share — the
    inequality read-out a marketplace team tracks. The global rank rides
    ``range_row_number`` (range exchange + per-partition windows, no
    single-task sort); everything after is two scalar aggregations.

    Tie-break (rev, custkey) makes the rank — and therefore the hash —
    a total order on both engines."""
    from data_integration_spark.operators.prefix import range_row_number

    rev = (
        Catalog(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    ranked = range_row_number(
        rev, [F.col("rev"), F.col("o_custkey")], out_col="rk"
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("total"),
        F.sum(F.col("rk") * F.col("rev")).alias("weighted"),
    )
    top = (
        ranked.crossJoin(F.broadcast(agg.select("n")))
        .filter(F.col("rk") > F.col("n") - F.floor(F.col("n") / 10))
        .agg(F.sum("rev").alias("top_rev"))
    )
    return agg.crossJoin(top).select(
        F.col("n").alias("n_customers"),
        F.round(
            2.0 * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
        F.round(F.col("top_rev") / F.col("total"), 6).alias(
            "top_decile_share"
        ),
    )


_MIN_BOTH = 5


@register(
    "q_association_rules",
    oracle=f"""
    WITH inc AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM inc
    ),
    part_n AS (
      SELECT l_partkey, COUNT(*) AS n_part FROM inc GROUP BY l_partkey
    ),
    cop AS (
      SELECT l1.l_partkey AS a, l2.l_partkey AS b, COUNT(*) AS n_both
      FROM inc l1
      JOIN inc l2 ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey <> l2.l_partkey
      GROUP BY l1.l_partkey, l2.l_partkey
      HAVING COUNT(*) >= {_MIN_BOTH}
    )
    SELECT cop.a AS antecedent, cop.b AS consequent, cop.n_both,
           ROUND(CAST(cop.n_both AS DOUBLE) / n_orders.n, 6) AS support,
           ROUND(CAST(cop.n_both AS DOUBLE) / pa.n_part, 6) AS confidence,
           ROUND(CAST(cop.n_both AS DOUBLE) * n_orders.n
                 / (pa.n_part * pb.n_part), 6) AS lift
    FROM cop
    JOIN part_n pa ON pa.l_partkey = cop.a
    JOIN part_n pb ON pb.l_partkey = cop.b
    CROSS JOIN n_orders
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts:
    support / confidence / lift for every directed rule a→b whose pair
    appears in ≥ 5 orders — the Apriori first-level output,
    computed set-at-a-time instead of candidate-generation loops.

    Scale shape: the pair self-join fans out C(basket, 2) per order
    (basket-size bounded, never corpus-bounded); the HAVING floor prunes
    the long tail before the two part-count joins (unique right keys →
    skew is partition-size only, AQE-splittable); the global order count
    broadcasts as one scalar row."""
    inc = (
        Catalog(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = inc.select(
        F.countDistinct("l_orderkey").alias("n")
    )
    part_n = inc.groupBy("l_partkey").agg(F.count("*").alias("n_part"))
    both = (
        inc.select("l_orderkey", F.col("l_partkey").alias("a"))
        .join(
            inc.select("l_orderkey", F.col("l_partkey").alias("b")),
            "l_orderkey",
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= _MIN_BOTH)
    )
    return (
        both.join(
            part_n.select(
                F.col("l_partkey").alias("a"), F.col("n_part").alias("na")
            ),
            "a",
        )
        .join(
            part_n.select(
                F.col("l_partkey").alias("b"), F.col("n_part").alias("nb")
            ),
            "b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "n_both",
            F.round(F.col("n_both").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(F.col("n_both").cast("double") / F.col("na"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "q_mode_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n FROM (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY COUNT(*) DESC, o.o_orderpriority
             ) AS rk
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_orderpriority
    ) WHERE rk = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode with a DETERMINISTIC tie-break: the most common
    order priority per market segment (count desc, then priority asc).
    Built-in ``mode()`` is tie-nondeterministic on both engines — a
    hash-checked mode must be count + rank, which is also the form that
    scales (grouped count shuffles once; the rank window runs over
    |segments|×|priorities| rows)."""
    cat = Catalog(spark, sf_dir)
    counts = (
        cat["orders"]
        .join(
            cat["customer"].select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@register(
    "q_group_concat",
    oracle="""
    WITH ranked AS (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY n.n_name
               ORDER BY c.c_acctbal DESC, c.c_custkey
             ) AS rk
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT n_name, STRING_AGG(c_name, ',' ORDER BY rk) AS top_customers
    FROM ranked WHERE rk <= 5 GROUP BY n_name
    """,
)
def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered group concatenation: each nation's top-5 customers by
    account balance as one CSV cell — the LISTAGG/STRING_AGG reshaping
    op. Spark has no ordered string_agg; the deterministic form is
    collect_list of (rank, value) structs, array_sort (struct order =
    field order, rank first), transform to values, array_join — all
    in-row after the grouped collect of ≤5 elements per group."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cat["customer"]
        .join(
            cat["nation"].select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top_customers")
        )
    )


@register(
    "q_rfm_segments",
    oracle="""
    WITH c AS (
      SELECT o_custkey AS custkey,
             DATE_DIFF('day', DATE '1970-01-01', CAST(MAX(o_orderdate) AS DATE))
               AS r_v,
             CAST(COUNT(*) AS DOUBLE) AS f_v,
             ROUND(SUM(o_totalprice), 2) AS m_v
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey,
           CAST(NTILE(5) OVER (ORDER BY r_v, custkey) AS INTEGER) AS r_score,
           CAST(NTILE(5) OVER (ORDER BY f_v, custkey) AS INTEGER) AS f_score,
           CAST(NTILE(5) OVER (ORDER BY m_v, custkey) AS INTEGER) AS m_score
    FROM c
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer quintile scores for Recency (last
    order day), Frequency (order count), and Monetary (total spend, on
    the 2dp money grid) — ascending NTILE(5), so 5 = most recent / most
    frequent / highest spend.

    Three exact global NTILEs would normally cost three global sorts
    (and the prefix family's cache contract forbids merging three
    sequential range_ntile calls into one plan). Instead the three
    metrics go to LONG format — (metric_idx, value, custkey), 3N narrow
    rows — and ONE ``range_row_number`` over (metric_idx, value,
    custkey) ranks all three at once; per-metric rank falls out
    arithmetically (rn − idx·N) and the exact SQL NTILE bucket
    (first N mod k buckets one element larger) is closed-form from the
    rank. One range exchange total; the pivot back to wide is a
    customer-keyed aggregation.

    Tie policy: (value, custkey) is a total order, so quintile
    assignment is deterministic on both engines; M rides the rounded
    money grid like every ranked revenue in this registry."""
    from data_integration_spark.operators.prefix import range_ntile_multi

    o = Catalog(spark, sf_dir)["orders"]
    c = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.max("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("double")
        .alias("r_v"),
        F.count("*").cast("double").alias("f_v"),
        F.round(F.sum("o_totalprice"), 2).alias("m_v"),
    )
    return range_ntile_multi(
        c, "custkey", ["r_v", "f_v", "m_v"], n_buckets=5
    ).select(
        "custkey",
        F.col("r_v_bucket").alias("r_score"),
        F.col("f_v_bucket").alias("f_score"),
        F.col("m_v_bucket").alias("m_score"),
    )
