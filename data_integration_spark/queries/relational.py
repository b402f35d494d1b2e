"""Relational-core t2 queries (SURVEY.md §2.1-2.9) over the TPC-H-ish testdata.

Each query exercises one operator row of SURVEY §2 with the engine's library
functions, and declares a matching DuckDB oracle. Reference sites cited per
query (``Rmd:`` = ``/root/reference/Method_code.Rmd``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.functions.math import expit, linear_predictor, logit
from data_integration_spark.functions.rng import bernoulli, seeded_normal
from data_integration_spark.functions.stats import error_measures
from data_integration_spark.operators.aggregates import group_collect_sorted
from data_integration_spark.operators.explode import mc_replicates
from data_integration_spark.operators.joins import (
    anti_join,
    broadcast_lookup,
    full_outer_fold,
    semi_join,
    union_all_by_name,
)
from data_integration_spark.operators.projections import (
    add_row_id,
    bind_via_join,
    one_hot,
    set_headers,
)
from data_integration_spark.queries import register, register_pending
from data_integration_spark.sources.catalog import Catalog

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


# ---------------------------------------------------------------- §2.1 scans
@register(
    "q_scan_parquet",
    oracle="SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 multi-table parquet scan (``Rmd:41-42``). Column projection reaches
    the scan (ReadSchema pruning)."""
    return Catalog(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@register(
    "q_sink_roundtrip",
    oracle="""
    SELECT n.n_nationkey AS nationkey, n.n_name AS nation_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 sink (``write.csv``, ``Rmd:473,752-753``) as parquet write + re-read,
    so the oracle checks the full on-disk content."""
    cat = Catalog(spark, sf_dir)
    out = (
        cat["nation"]
        .join(F.broadcast(cat["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    path = os.path.join("/root/repo/.scratch", "sink_roundtrip")
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# ---------------------------------------------------- §2.2 projections
@register(
    "q_select_project",
    oracle="SELECT c_custkey, c_name, c_nationkey FROM customer",
)
def q_select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 keep-list projection (``dplyr::select``, ``Rmd:163-164``)."""
    return Catalog(spark, sf_dir)["customer"].select("c_custkey", "c_name", "c_nationkey")


@register(
    "q_drop_cols",
    oracle="SELECT p_partkey, p_name, p_brand, p_type FROM part",
)
def q_drop_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 drop-list projection (``subset(select=-c(...))``, ``Rmd:236-237``)."""
    return Catalog(spark, sf_dir)["part"].drop("p_size", "p_retailprice")


@register(
    "q_rename",
    oracle="SELECT n_nationkey, n_name AS nation_name FROM nation",
)
def q_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 rename (``Rmd:53,691``)."""
    return (
        Catalog(spark, sf_dir)["nation"]
        .select("n_nationkey", "n_name")
        .withColumnRenamed("n_name", "nation_name")
    )


@register(
    "q_todf_headers",
    oracle="SELECT r_regionkey AS rkey, r_name AS rname FROM region",
)
def q_todf_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 bulk header reassign (``colnames(df)<-``, ``Rmd:207,274``)."""
    return set_headers(Catalog(spark, sf_dir)["region"], ["rkey", "rname"])


@register(
    "q_withcolumn_linear",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price,
           ROUND(10.0 + 2.0 * l_quantity - 5.0 * l_discount, 6) AS score
    FROM lineitem
    """,
)
def q_withcolumn_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 computed columns incl. the closed-form linear predictor
    (``x_beta``, ``Rmd:245-247``) — constant-folded native expressions."""
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("net_price"),
        F.round(
            linear_predictor(10.0, [("l_quantity", 2.0), ("l_discount", -5.0)]), 6
        ).alias("score"),
    )


@register(
    "q_rowid_rownumber",
    oracle="""
    SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS ID
    FROM orders
    """,
)
def q_rowid_rownumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/W1 dense row id (``df$ID <- 1:nrow(df)``, ``Rmd:48,208``) — the
    positional idiom made explicit over a deterministic ordering key.

    Scale shape (r14, part of the global-window lint sweep): orders is a
    FACT table, so the id rides ``range_row_number`` (range-partitioned
    ranking + per-partition offsets — operators/prefix.py) instead of an
    unpartitioned ``row_number`` window that would funnel every order
    through one task at 100 TB. Identical output (the key is a total
    order); the oracle is unchanged."""
    from data_integration_spark.operators.prefix import range_row_number

    return range_row_number(
        Catalog(spark, sf_dir)["orders"].select("o_orderkey"),
        [F.col("o_orderkey")],
        out_col="ID",
    ).select("o_orderkey", F.col("ID").cast("long").alias("ID"))


@register(
    "q_cast_numeric",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS DOUBLE) AS linenumber_d,
           CAST(l_orderkey AS VARCHAR) AS orderkey_s
    FROM lineitem
    """,
)
def q_cast_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 explicit casts (the reference's ``as.numeric`` repair casts,
    ``Rmd:442-444,472``) — our engine keeps numerics numeric; casts are
    explicit and lossless."""
    return Catalog(spark, sf_dir)["lineitem"].select(
        "l_orderkey",
        F.col("l_linenumber").cast("double").alias("linenumber_d"),
        F.col("l_orderkey").cast("string").alias("orderkey_s"),
    )


@register(
    "q_onehot_when",
    oracle="""
    SELECT c_custkey,
           CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS seg_AUTOMOBILE,
           CAST(c_mktsegment = 'BUILDING' AS INT) AS seg_BUILDING,
           CAST(c_mktsegment = 'FURNITURE' AS INT) AS seg_FURNITURE,
           CAST(c_mktsegment = 'HOUSEHOLD' AS INT) AS seg_HOUSEHOLD,
           CAST(c_mktsegment = 'MACHINERY' AS INT) AS seg_MACHINERY
    FROM customer
    """,
)
def q_onehot_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 one-hot encoding (``fastDummies::dummy_cols``, ``Rmd:51-58``) with
    an explicit category list (R factor levels made explicit)."""
    cust = Catalog(spark, sf_dir)["customer"].select("c_custkey", "c_mktsegment")
    return one_hot(cust, "c_mktsegment", SEGMENTS, prefix="seg", drop_input=True)


@register(
    "q_bind_via_join",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, li.n_items, li.sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, COUNT(*) AS n_items, ROUND(SUM(l_quantity), 6) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    ) li ON o.o_orderkey = li.l_orderkey
    """,
)
def q_bind_via_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 positional cbind → key-based join (``Rmd:268,285,426``; SURVEY §7.5):
    computed per-key vectors are attached by joining on the explicit key."""
    cat = Catalog(spark, sf_dir)
    per_order = (
        cat["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
    )
    return bind_via_join(
        cat["orders"].select("o_orderkey", "o_orderstatus"),
        per_order,
        on=[F.col("o_orderkey") == F.col("l_orderkey")],
    ).select("o_orderkey", "o_orderstatus", "n_items", "sum_qty")


# ------------------------------------------------------- §2.3 filters
@register(
    "q_filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 equality filter (``filter(df, state==s)``, ``Rmd:259,321``) —
    pushed down to the parquet scan."""
    return (
        Catalog(spark, sf_dir)["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "q_filter_isin",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 IN-list membership (``state %in% c(...)``, ``Rmd:165,470``)."""
    return (
        Catalog(spark, sf_dir)["orders"]
        .filter(F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"]))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "q_when_indicator",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_return
    FROM lineitem
    """,
)
def q_when_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 conditional 0/1 indicator (``ifelse(age4=='45-64',1,0)``,
    ``Rmd:49,228-234``)."""
    return Catalog(spark, sf_dir)["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_return"),
    )


@register(
    "q_when_multiway",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE o_orderpriority
             WHEN '1-URGENT' THEN 1.5 WHEN '2-HIGH' THEN 1.2
             WHEN '3-MEDIUM' THEN 1.0 ELSE 0.5 END AS DOUBLE) AS priority_weight
    FROM orders
    """,
)
def q_when_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 multi-way conditional: the reference's O(n) row loop mapping
    category→coefficient (``Rmd:101-132``) as ONE chained-when expression."""
    return Catalog(spark, sf_dir)["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.5)
        .when(F.col("o_orderpriority") == "2-HIGH", 1.2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 1.0)
        .otherwise(0.5)
        .alias("priority_weight"),
    )


# --------------------------------------------------------- §2.4 joins
@register(
    "q_full_outer_fold",
    oracle="""
    SELECT COALESCE(c.nationkey, s.nationkey, n.nationkey) AS nationkey,
           c.n_cust, s.n_supp, n.nation_name
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
                     FROM supplier GROUP BY 1) s ON c.nationkey = s.nationkey
    FULL OUTER JOIN (SELECT n_nationkey AS nationkey, n_name AS nation_name
                     FROM nation) n ON COALESCE(c.nationkey, s.nationkey) = n.nationkey
    """,
)
def q_full_outer_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 n-way full-outer fold (``reduce(full_join, by='state')``,
    ``Rmd:466-469``). Spark's USING-column join coalesces the key."""
    cat = Catalog(spark, sf_dir)
    per_cust = (
        cat["customer"]
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    per_supp = (
        cat["supplier"]
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    names = cat["nation"].select(
        F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("nation_name")
    )
    return full_outer_fold([per_cust, per_supp, names], on="nationkey")


@register(
    "q_broadcast_lookup",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def q_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 broadcast dimension lookup — replaces the reference's per-state
    filter loop (``vr[vr$state==s,]``, ``Rmd:322,422``) with one broadcast
    hash join; no shuffle of the fact side."""
    cat = Catalog(spark, sf_dir)
    return broadcast_lookup(
        cat["lineitem"].select("l_orderkey", "l_linenumber", "l_suppkey"),
        cat["supplier"].select("s_suppkey", "s_name"),
        on=[F.col("l_suppkey") == F.col("s_suppkey")],
    ).select("l_orderkey", "l_linenumber", "s_name")


@register(
    "q_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS src FROM supplier
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 by-name union (``rbind``/``bind_rows``, 14 reference sites)."""
    cat = Catalog(spark, sf_dir)
    cust = cat["customer"].select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("src"),
    )
    supp = cat["supplier"].select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("src"),
    )
    return union_all_by_name([cust, supp])


@register(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 semi-join membership (``%in% pew_state_list``, ``Rmd:168``)."""
    cat = Catalog(spark, sf_dir)
    return semi_join(
        cat["customer"].select("c_custkey", "c_name"),
        cat["orders"].select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
    )


@register(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 anti-join complement — the generalized MT/SD path (``Rmd:165``):
    'areas in the big survey absent from the small one'."""
    cat = Catalog(spark, sf_dir)
    return anti_join(
        cat["customer"].select("c_custkey", "c_name"),
        cat["orders"].select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
    )


# -------------------------------------------------- §2.6 aggregations
@register(
    "q_weighted_mean_by_group",
    oracle="""
    SELECT l_returnflag,
           100.0 * ROUND(SUM(l_extendedprice * l_quantity), 2)
                 / ROUND(SUM(l_quantity), 2) AS wmean
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_weighted_mean_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 grouped weighted mean — the pipeline's signature aggregate
    (``100*sum(y*w)/sum(w)`` per state, ``Rmd:197-202``). One shuffle with
    map-side partials instead of the reference's loop of full-table filters.

    Cross-engine determinism: the input doubles sit on a 2-decimal grid, so
    sums are rounded back to that exact grid (reduction-order noise removed)
    and the quotient is a deterministic IEEE op — no output rounding that
    could straddle a half-boundary."""
    li = Catalog(spark, sf_dir)["lineitem"]
    num = F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2)
    den = F.round(F.sum("l_quantity"), 2)
    return li.groupBy("l_returnflag").agg(
        (F.lit(100.0) * num / den).alias("wmean")
    )


@register(
    "q_groupby_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 grouped count (``ni <- nrow(...)`` per state, ``Rmd:260,268``)."""
    return (
        Catalog(spark, sf_dir)["lineitem"]
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_group_collect",
    oracle="""
    SELECT l_orderkey,
           STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS linenumbers
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 grouped vector collection (``Rmd:259-260``) in its deterministic
    sorted form (full oracle; the applyInPandas form lives in stats/em.py)."""
    return group_collect_sorted(
        Catalog(spark, sf_dir)["lineitem"],
        group="l_orderkey",
        value="l_linenumber",
        alias="linenumbers",
        as_string=True,
    )


@register(
    "q_table_agg",
    oracle="""
    SELECT COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_discount), 2) / COUNT(*) AS avg_disc,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    """,
)
def q_table_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 whole-table reductions (``sum``/``mean`` with ``na.rm``,
    ``Rmd:289,303,329-334``) — Spark aggregates skip NULLs identically.
    avg is grid-rounded-sum / count (deterministic IEEE division) rather
    than a rounded avg, which can land exactly on a half-boundary."""
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (F.round(F.sum("l_discount"), 2) / F.count("*")).alias("avg_disc"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
    )


@register(
    "q_error_measures",
    oracle="""
    WITH est AS (SELECT c_nationkey AS nationkey,
                        ROUND(SUM(c_acctbal), 2) / COUNT(*) AS est
                 FROM customer GROUP BY 1),
         act AS (SELECT s_nationkey AS nationkey,
                        ROUND(SUM(s_acctbal), 2) / COUNT(*) AS act
                 FROM supplier GROUP BY 1),
         j AS (SELECT est.est, act.act FROM est JOIN act USING (nationkey))
    SELECT ROUND(AVG((est - act) * (est - act)), 6) AS asd,
           ROUND(SQRT(AVG((est - act) * (est - act))), 6) AS rasd,
           ROUND(AVG(ABS(est - act)), 6) AS aad
    FROM j
    """,
)
def q_error_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 ASD/RASD/AAD error measures (``Rmd:481-486``) over per-group
    estimate-vs-actual pairs."""
    cat = Catalog(spark, sf_dir)
    est = (
        cat["customer"]
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg((F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("est"))
    )
    act = (
        cat["supplier"]
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg((F.round(F.sum("s_acctbal"), 2) / F.count("*")).alias("act"))
    )
    pairs = est.join(act, "nationkey")
    out = error_measures(pairs, "est", "act")
    return out.select(
        F.round("asd", 6).alias("asd"),
        F.round("rasd", 6).alias("rasd"),
        F.round("aad", 6).alias("aad"),
    )


@register(
    "q_mspe_by_group",
    oracle="""
    SELECT event_type,
           SQRT(ROUND(SUM((value - 100.0) * (value - 100.0)), 4) / COUNT(*)) AS sqrt_mspe
    FROM events GROUP BY event_type
    """,
)
def q_mspe_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 sqrt-MSPE per group over a long (rep, group, est, true) table
    (``Rmd:744-757`` — wide cbind + rowMeans replaced by one groupBy).
    (value−100)² sits on a 4-decimal grid → grid-rounded sum / count, then
    sqrt (IEEE-exact) — bit-stable without output rounding."""
    ev = Catalog(spark, sf_dir)["events"]
    d = F.col("value") - 100.0
    return ev.groupBy("event_type").agg(
        F.sqrt(F.round(F.sum(d * d), 4) / F.count("*")).alias("sqrt_mspe")
    )


@register("q_distinct", oracle="SELECT DISTINCT o_orderpriority FROM orders")
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 distinct values (``unique(state)``, ``Rmd:159-160``)."""
    return Catalog(spark, sf_dir)["orders"].select("o_orderpriority").distinct()


@register(
    "q_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 exact distinct count (``length(unique(state))``, ``Rmd:160,182``)."""
    return Catalog(spark, sf_dir)["lineitem"].agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@register(
    "q_distinct_sorted",
    oracle="SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag",
)
def q_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 sorted distinct (``sort(unique(pew$state))``, ``Rmd:159``)."""
    return (
        Catalog(spark, sf_dir)["lineitem"]
        .select("l_returnflag")
        .distinct()
        .orderBy("l_returnflag")
    )


@register(
    "q_survey_mean_se",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2) AS sw,
             ROUND(SUM(l_quantity * l_extendedprice), 2) AS swy,
             COUNT(*) AS n,
             VAR_POP(l_quantity * l_extendedprice) AS vzz,
             COVAR_POP(l_quantity * l_extendedprice, l_quantity) AS vzw,
             VAR_POP(l_quantity) AS vww
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           swy / sw AS mean,
           ROUND(SQRT((CASE WHEN n > 1 THEN CAST(n AS DOUBLE) / (n - 1)
                            ELSE 1.0 END)
                      * GREATEST(n * (vzz - 2.0 * (swy / sw) * vzw
                                      + (swy / sw) * (swy / sw) * vww),
                                 0.0)) / sw, 6) AS se
    FROM s
    """,
)
def q_survey_mean_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 survey-weighted Hájek mean + Taylor-linearized SE per group
    (``svyby(~demvote, ~state, svymean)``, ``Rmd:459-462``) — SINGLE-SCAN
    stable form via central co-moments.

    Identity: with z = w·y and ŷ = Σz/Σw, the group mean of z minus
    ŷ·(group mean of w) is identically 0, so
        Σ (w(y−ŷ))² = Σ (dz − ŷ·dw)² = n·(Var(z) − 2ŷ·Cov(z,w) + ŷ²·Var(w))
    where Var/Cov are POPULATION central (co)moments. Both engines compute
    var_pop/covar_pop with numerically stable streaming updates, so —
    unlike the round-8 raw-moment expansion Σw²y² − 2ŷΣw²y + ŷ²Σw², whose
    cancellation residue scales with the RAW second moment ‖wy‖² — the
    residue here scales with the central moments themselves (near 0 on
    near-constant data, where it matters). The general API in
    functions/stats.py::survey_mean_se uses the exact two-pass centered
    form; this t2 variant trades that second scan for the co-moment
    identity plus grid-rounded first moments (bit-identical mean across
    engines) and a 6dp final rounding (absorbing last-ulp var_pop
    accumulation-order differences).

    Scale shape: ONE grouped aggregation — partial-agg co-moment rows on
    the wire (Spark's CentralMomentAgg merges partials), no second scan,
    no join."""
    li = Catalog(spark, sf_dir)["lineitem"]
    w, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.round(F.sum(w), 2).alias("sw"),
        F.round(F.sum(w * y), 2).alias("swy"),
        F.count("*").alias("n"),
        F.var_pop(w * y).alias("vzz"),
        F.covar_pop(w * y, w).alias("vzw"),
        F.var_pop(w).alias("vww"),
    )
    mean = F.col("swy") / F.col("sw")
    ssd = F.col("n") * (
        F.col("vzz")
        - F.lit(2.0) * mean * F.col("vzw")
        + mean * mean * F.col("vww")
    )
    # n > 1 guard: a single-row group would hit ANSI DIVIDE_BY_ZERO (matches
    # functions/stats.py::survey_mean_se, which has had the guard all along)
    fs = F.when(
        F.col("n") > 1, F.col("n").cast("double") / (F.col("n") - F.lit(1))
    ).otherwise(F.lit(1.0))
    return s.select(
        "l_returnflag",
        mean.alias("mean"),
        F.round(
            F.sqrt(fs * F.greatest(ssd, F.lit(0.0))) / F.col("sw"), 6
        ).alias("se"),
    )


# --------------------------------------------- §2.8 scalars & randomness
@register(
    "q_logit",
    oracle="""
    SELECT doc_id,
           ROUND(LN(((doc_id % 97) + 1.0) / 100.0
                    / (1.0 - ((doc_id % 97) + 1.0) / 100.0)), 6) AS logit_p
    FROM documents
    """,
)
def q_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 logit / ``qlogis`` (``Rmd:234``)."""
    docs = Catalog(spark, sf_dir)["documents"]
    p = ((F.col("doc_id") % 97) + 1.0) / 100.0
    return docs.select("doc_id", F.round(logit(p), 6).alias("logit_p"))


@register(
    "q_expit",
    oracle="""
    SELECT c_custkey,
           ROUND(1.0 / (1.0 + EXP(-(c_acctbal / 1000.0))), 6) AS expit_x
    FROM customer
    """,
)
def q_expit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 inverse-logit (``exp(x)/(1+exp(x))``, ``Rmd:254-255`` — stable
    form)."""
    cust = Catalog(spark, sf_dir)["customer"]
    return cust.select(
        "c_custkey", F.round(expit(F.col("c_acctbal") / 1000.0), 6).alias("expit_x")
    )


@register(
    "q_math_scalars",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(EXP(l_discount), 6) AS exp_disc,
           ROUND(LN(1.0 + l_quantity), 6) AS log1p_qty,
           ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
           ROUND(ABS(l_discount - 0.05), 6) AS abs_ddisc,
           ROUND(POW(l_quantity, 2), 6) AS qty_sq,
           l_extendedprice * 0.5 AS price_half
    FROM lineitem
    """,
)
def q_math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scalar math surface (``exp/log/sqrt/abs/round/^2``, many sites)."""
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(F.lit(1.0) + F.col("l_quantity")), 6).alias("log1p_qty"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_ddisc"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        # ×0.5 is an exact binary scaling — bit-identical across engines with
        # no rounding needed (×0.1 + round(…,2) would sit on half-boundaries)
        (F.col("l_extendedprice") * 0.5).alias("price_half"),
    )


@register(
    "q_mc_explode",
    oracle="""
    SELECT n_nationkey AS nationkey, t.r AS r
    FROM nation, (SELECT UNNEST(GENERATE_SERIES(1, 50)) AS r) t
    """,
)
def q_mc_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 MC replicate expansion skeleton (``lapply(1:R, ...)``,
    ``Rmd:292``): one long (group × r) table via explode(sequence)."""
    nations = Catalog(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("nationkey")
    )
    return mc_replicates(nations, n_reps=50, rep_col="r")


@register("q_randn")  # rows-only: stochastic values, deterministic shape
def q_randn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 Gaussian draws per (group, replicate) with hash-based seeding —
    fixes the reference's seed-inside-loop bug (``Rmd:569-571``): draws
    differ across groups AND replicates."""
    nations = Catalog(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("nationkey")
    )
    return mc_replicates(
        nations,
        n_reps=20,
        rep_col="r",
        draw_exprs={
            "v_tilde": seeded_normal("nationkey", "r", mean=0.0, sd=1.0, salt=42)
        },
    )


@register("q_bernoulli")  # rows-only
def q_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 per-row Bernoulli(θ) draws (``rbinom(1,1,θ)``, ``Rmd:576-579``)."""
    ev = Catalog(spark, sf_dir)["events"].select("event_id")
    return ev.withColumn("y_sim", bernoulli(F.lit(0.3), "event_id", salt=7))


@register(
    "q_rng_certificate",
    # distributional + determinism certificate for the hash RNG family
    # (§2.8 R1/R2/R4; the draws themselves stay rows-only in
    # q_randn/q_bernoulli): 5σ CLT bounds every healthy deterministic draw
    # set passes with wide margin, plus an exact partition-invariance
    # count — both engine-independent literals.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(1 AS BIGINT) AS mean_ok,
           CAST(1 AS BIGINT) AS sd_ok,
           CAST(1 AS BIGINT) AS rate_ok,
           CAST(0 AS BIGINT) AS n_partition_mismatch
    FROM customer
    """,
)
def q_rng_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CERTIFICATE for the seeded RNG (functions/rng.py): draws are
    stochastic-valued (rows-only in q_randn/q_bernoulli) but the
    PROPERTIES the engine depends on are exactly checkable under the
    driver hash:

    - ``mean_ok``/``sd_ok``: N(0,1) draws keyed on c_custkey have sample
      mean within 5/√n of 0 and sample sd within 5/√n of 1 — a 5σ bound
      a correct Box-Muller-over-xxhash64 stream passes deterministically
      at every SF, and a broken hash→uniform mapping does not;
    - ``rate_ok``: Bernoulli(0.3) draws hit the rate within 5·√(p(1−p)/n);
    - ``n_partition_mismatch`` == 0: the SAME (key, salt) produces the
      SAME draw after an adversarial repartition — the R4
      partition-invariance contract (the reference's seed bug,
      ``Rmd:569-571``, is exactly a violation of this), checked row-for-
      row via a key join, not an order-sensitive aggregate.

    One pass for the moments plus one co-partitioned join; five scalars
    reach the driver."""
    import math as _math

    cust = Catalog(spark, sf_dir)["customer"].select("c_custkey")
    z = seeded_normal("c_custkey", salt=77)
    b = bernoulli(F.lit(0.3), "c_custkey", salt=78)
    m = (
        cust.select(z.alias("z"), b.alias("b"))
        .agg(
            F.count("*").alias("n"),
            F.avg("z").alias("mz"),
            F.stddev_samp("z").alias("sz"),
            F.avg("b").alias("rate"),
        )
        .collect()[0]
    )
    n = m["n"]
    bound = 5.0 / _math.sqrt(n)
    rate_bound = 5.0 * _math.sqrt(0.3 * 0.7 / n)
    # partition invariance: recompute the draws on a reshuffled copy and
    # compare per key — exact equality, not statistically
    shuffled = (
        cust.repartition(7, F.col("c_custkey") % 3)
        .select("c_custkey", seeded_normal("c_custkey", salt=77).alias("z2"))
    )
    n_mismatch = (
        cust.select("c_custkey", z.alias("z1"))
        .join(shuffled, "c_custkey")
        .filter(F.col("z1") != F.col("z2"))
        .count()
    )

    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "n_obs": n,
                    "mean_ok": int(abs(m["mz"]) < bound),
                    "sd_ok": int(abs(m["sz"] - 1.0) < bound),
                    "rate_ok": int(abs(m["rate"] - 0.3) < rate_bound),
                    "n_partition_mismatch": n_mismatch,
                }
            ]
        )
    )


# ------------------------------------------------- §2.9 final report (flagship)
REPORT_ORACLE = """
WITH comp_data AS (
  SELECT n.n_nationkey AS nationkey, n.n_name AS name,
         a.actual, d.direct, e.ebp
  FROM nation n
  LEFT JOIN (SELECT c_nationkey, ROUND(SUM(c_acctbal), 2) / COUNT(*) AS actual
             FROM customer GROUP BY 1) a ON n.n_nationkey = a.c_nationkey
  LEFT JOIN (SELECT c.c_nationkey, ROUND(SUM(o.o_totalprice), 2) / COUNT(*) AS direct
             FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY 1) d ON n.n_nationkey = d.c_nationkey
  LEFT JOIN (SELECT c.c_nationkey,
                    ROUND(SUM(l.l_extendedprice * l.l_quantity), 2)
                      / ROUND(SUM(l.l_quantity), 2) AS ebp
             FROM lineitem l
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
             GROUP BY 1) e ON n.n_nationkey = e.c_nationkey
),
final_mspe AS (
  SELECT c.c_nationkey AS nationkey,
         SQRT(ROUND(SUM((o.o_totalprice - 100000.0) * (o.o_totalprice - 100000.0)), 4)
              / COUNT(*)) AS sqrt_mspe
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
direct_se AS (
  SELECT nationkey,
         SQRT(GREATEST(sy2 - 2.0 * (sy / n) * sy + (sy / n) * (sy / n) * n, 0.0)) / n AS se
  FROM (SELECT c_nationkey AS nationkey,
               ROUND(SUM(c_acctbal), 2) AS sy,
               ROUND(SUM(c_acctbal * c_acctbal), 4) AS sy2,
               COUNT(*) AS n
        FROM customer GROUP BY 1)
)
SELECT a.nationkey AS nationkey, a.name AS name,
       a.actual AS actual_val,
       a.direct AS direct_est,
       a.ebp AS ebp_est,
       100.0 * c.se AS direct_se,
       b.sqrt_mspe AS ebp_se
FROM comp_data a
LEFT JOIN final_mspe b ON a.nationkey = b.nationkey
LEFT JOIN direct_se c ON a.nationkey = c.nationkey
"""


@register("q_report_final", oracle=REPORT_ORACLE)
def q_report_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 flagship: the reference's final sqldf report (``Rmd:763-772``) —
    a per-area table with rounded estimates assembled by a LEFT JOIN chain —
    re-shaped onto the TPC-H-ish schema (nation = area).

    Exercises scan → filter → multi-join → grouped weighted agg → survey SE →
    sqrt-MSPE → full-outer/left-join assembly → rounded projection, all
    Catalyst-native; dimension sides broadcast."""
    cat = Catalog(spark, sf_dir)
    nation, customer, orders, lineitem = (
        cat["nation"],
        cat["customer"],
        cat["orders"],
        cat["lineitem"],
    )

    # ONE aggregation pass per fact table (the reference runs a separate
    # loop-over-states scan per statistic): customer → actual + SE stats;
    # orders⋈customer → direct + sqrt-MSPE; lineitem⋈orders⋈customer → EBP.
    bal = F.col("c_acctbal")
    cust_stats = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        (F.round(F.sum(bal), 2) / F.count("*")).alias("actual"),
        F.round(F.sum(bal), 2).alias("sy"),
        F.round(F.sum(bal * bal), 4).alias("sy2"),
        F.count("*").alias("n"),
    )
    cust_map = customer.select("c_custkey", "c_nationkey")
    # no broadcast hint: cust_map is one row per CUSTOMER (data-proportional);
    # a forced hint would collect a fact-sized table to the driver at 100×.
    # AQE broadcasts it while it is actually small and shuffles when not.
    ord_cust = orders.select("o_orderkey", "o_custkey", "o_totalprice").join(
        cust_map, F.col("o_custkey") == F.col("c_custkey")
    )
    d_mspe = F.col("o_totalprice") - 100000.0
    ord_stats = ord_cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        (F.round(F.sum("o_totalprice"), 2) / F.count("*")).alias("direct"),
        F.sqrt(F.round(F.sum(d_mspe * d_mspe), 4) / F.count("*")).alias("sqrt_mspe"),
    )
    li_nation = lineitem.select("l_orderkey", "l_extendedprice", "l_quantity").join(
        ord_cust.select(F.col("o_orderkey").alias("ok"), "c_nationkey"),
        F.col("l_orderkey") == F.col("ok"),
    )
    ebp = li_nation.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        (
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2)
            / F.round(F.sum("l_quantity"), 2)
        ).alias("ebp")
    )
    m = F.col("sy") / F.col("n")
    ss = F.col("sy2") - F.lit(2.0) * m * F.col("sy") + m * m * F.col("n")

    return (
        nation.select(
            F.col("n_nationkey").alias("nationkey"), F.col("n_name").alias("name")
        )
        .join(F.broadcast(cust_stats), "nationkey", "left")
        .join(F.broadcast(ord_stats), "nationkey", "left")
        .join(F.broadcast(ebp), "nationkey", "left")
        .select(
            "nationkey",
            "name",
            F.col("actual").alias("actual_val"),
            F.col("direct").alias("direct_est"),
            F.col("ebp").alias("ebp_est"),
            (F.lit(100.0) * (F.sqrt(F.greatest(ss, F.lit(0.0))) / F.col("n"))).alias(
                "direct_se"
            ),
            F.col("sqrt_mspe").alias("ebp_se"),
        )
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS INT) AS k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: JSON field extraction over ``events.props`` (native
    ``get_json_object`` — no Python in the path)."""
    ev = Catalog(spark, sf_dir)["events"]
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# svyby(covmat=TRUE) contract (Rmd:459-462; VERDICT r12 "missing" #2):
# the JOINT covariance matrix of the per-domain Hájek means under the
# reference's ids=~1 element design, by stacked influence functions —
# u_{a,i} = 1[i∈a]·w_i·(y_i − θ̂_a)/W_a, V = n/(n−1)·Σ_i(u_i−ū)(u_i−ū)ᵀ.
# Because domains partition the sample and Σ_{i∈a} w_i(y_i − θ̂_a) = 0
# EXACTLY (the Hájek normal equation), every off-diagonal is 0 in real
# arithmetic — which is WHY the reference computes covmat but never
# consumes it. Both engines center on the IDENTICAL grid-rounded θ̂
# (the q_survey_mean_se trick), so the float residue lands at ~1e-17
# and the 6-decimal grid pins the theorem as literal 0.0 cells.
_COVMAT_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS flag, l_quantity AS w, l_extendedprice AS y
  FROM lineitem
),
m AS (
  SELECT flag, ROUND(SUM(w), 2) AS sw, ROUND(SUM(w * y), 2) AS swy
  FROM base GROUP BY flag
),
inf AS (
  SELECT b.flag, b.w * (b.y - m.swy / m.sw) / m.sw AS u
  FROM base b JOIN m USING (flag)
),
dom AS (
  SELECT flag, SUM(u) AS su, SUM(u * u) AS suu FROM inf GROUP BY flag
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)
SELECT a.flag AS flag_a, b.flag AS flag_b,
       -- + 0.0 normalizes IEEE -0.0 (the off-diagonal theorem lands on
       -- the zero grid from either side depending on accumulation order)
       ROUND(CAST(t.n AS DOUBLE) / (t.n - 1)
             * ((CASE WHEN a.flag = b.flag THEN a.suu ELSE 0.0 END)
                - a.su * b.su / t.n), 6) + 0.0 AS cov,
       t.n AS n_total
FROM dom a JOIN dom b ON a.flag <= b.flag, tot t
"""


@register("q_survey_covmat", oracle=_COVMAT_ORACLE)
def q_survey_covmat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 companion, ``svyby(..., covmat = TRUE)`` (``Rmd:459-462``;
    LIVE since the r14 flip, leading the r14 window — closes the VERDICT r12 "missing" #2
    residual): the JOINT covariance matrix of the per-domain survey
    means via stacked Taylor influence functions under the reference's
    ``ids=~1`` design, computed DISTRIBUTED (one influence pass + one
    per-domain aggregation; the matrix assembly is |domains|² rows).

    The theorem this pins: domains partition the sample and the Hájek
    normal equation zeroes each domain's influence sum, so every
    off-diagonal covariance is EXACTLY 0 in real arithmetic — the full
    matrix the reference requests carries no information beyond the
    per-domain SEs it already reports, which is why covmat is never
    consumed downstream (VERDICT r12 called the residual negligible;
    this op makes that claim checkable instead of asserted). Both
    engines center on the identical grid-rounded Hájek mean, so the
    off-diagonal cells are literal 0.0 on the 6-decimal grid and the
    driver hash pins the theorem corpus-wide.

    Scale shape: influence values are a row-local projection after one
    broadcast join of the |domains|-row mean table; the only shuffles
    are two |domains|-row aggregations; the pair assembly is a
    |domains|² self-join of a tiny frame."""
    li = Catalog(spark, sf_dir)["lineitem"]
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("w"),
        F.col("l_extendedprice").alias("y"),
    )
    m = base.groupBy("flag").agg(
        F.round(F.sum("w"), 2).alias("sw"),
        F.round(F.sum(F.col("w") * F.col("y")), 2).alias("swy"),
    )
    inf = base.join(F.broadcast(m), "flag").select(
        "flag",
        (
            F.col("w")
            * (F.col("y") - F.col("swy") / F.col("sw"))
            / F.col("sw")
        ).alias("u"),
    )
    dom = inf.groupBy("flag").agg(
        F.sum("u").alias("su"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
    )
    tot = base.agg(F.count("*").alias("n"))  # 1 row
    a = dom.select(
        F.col("flag").alias("flag_a"),
        F.col("su").alias("su_a"),
        F.col("suu").alias("suu_a"),
    )
    b = dom.select(
        F.col("flag").alias("flag_b"), F.col("su").alias("su_b")
    )
    cov = (
        F.col("n").cast("double")
        / (F.col("n") - 1)
        * (
            F.when(
                F.col("flag_a") == F.col("flag_b"), F.col("suu_a")
            ).otherwise(F.lit(0.0))
            - F.col("su_a") * F.col("su_b") / F.col("n")
        )
    )
    return (
        a.join(b, F.col("flag_a") <= F.col("flag_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "flag_a",
            "flag_b",
            # + 0.0 normalizes IEEE -0.0, mirroring the oracle
            (F.round(cov, 6) + F.lit(0.0)).alias("cov"),
            F.col("n").cast("long").alias("n_total"),
        )
    )
