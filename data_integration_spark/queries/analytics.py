"""Classic analytics t2 queries (TPC-H-shaped) — end-user query coverage
beyond the reference's surface: multi-predicate aggregation reports, top-k
over joins, multi-way join rollups. Grid-stable float handling throughout
(rounded sums + IEEE division; see queries/__init__ conventions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog


@register(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
             AS sum_charge,
           ROUND(SUM(l_quantity), 2) / COUNT(*) AS avg_qty,
           ROUND(SUM(l_discount), 2) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: date filter (pushed to the scan) +
    8-output grouped aggregation with map-side partials."""
    li = Catalog(spark, sf_dir)["lineitem"].filter(
        F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
        (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
        (F.round(F.sum("l_discount"), 2) / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_top_orders",
    oracle="""
    SELECT o_orderkey, revenue, rnk FROM (
      SELECT o_orderkey, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey) AS rnk
      FROM (
        SELECT o.o_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY o.o_orderkey
      )
    ) WHERE rnk <= 10
    """,
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-k: join + grouped revenue + deterministic top-10
    (grid-rounded revenue, key tie-break — stable under any engine)."""
    cat = Catalog(spark, sf_dir)
    rev = (
        cat["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .join(cat["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("o_orderkey", "revenue", "rnk")
    )


@register(
    "q_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join rollup: fact-fact shuffle join + broadcast
    dimension chain, one grouped aggregation."""
    cat = Catalog(spark, sf_dir)
    return (
        cat["lineitem"]
        .join(cat["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # customer grows with the data — no forced broadcast (AQE decides);
            # nation/region below are genuinely bounded dims and keep the hint
            cat["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cat["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q_array_functions",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val
    FROM embeddings
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native array-function surface over the embedding column (size /
    element access / transform-aggregate) — double-promoted like ann.py."""
    emb = Catalog(spark, sf_dir)["embeddings"]
    e = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("sq_norm"),
        F.round(F.element_at(e, 1), 6).alias("first_val"),
    )
