"""Window / grouping-set / percentile / as-of / event-time t2 queries —
the Catalyst built-ins the reference lacks (SURVEY.md §2.5, §7.4 extension
surface) plus the as-of join composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.operators.asof import asof_join
from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog


@register(
    "q_rank_window",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
)
def q_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 customers per nation by balance (deterministic
    tie-break on key)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        Catalog(spark, sf_dir)["customer"]
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q_lag_window",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta
    FROM events
    """,
)
def q_lag_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-user delta vs previous event (lag)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return Catalog(spark, sf_dir)["events"].select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


@register(
    "q_cube_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: rollup subtotals (reference lacks these; Catalyst
    built-in)."""
    return (
        Catalog(spark, sf_dir)["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS median_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the definition)."""
    return (
        Catalog(spark, sf_dir)["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias(
                "median_price"
            ),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        )
    )


@register(
    "q_window_tumbling",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M') AS bucket,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch form of the streaming
    pipeline in streaming/windows.py — same window(), same semantics)."""
    ev = Catalog(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_ntile_percent_rank",
    oracle="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: quartile assignment (ntile) + percent_rank over
    a deterministic total order (balance, key tie-break). Since r6 both
    derive from the range-partitioned global row number
    (operators/prefix.py::range_ntile with rn_col): under a total order
    rank == row_number, so percent_rank = (rn − 1)/(N − 1) and the exact
    NTILE bucket is arithmetic on (rn, N) — customer never funnels
    through a single-partition window (SQL semantics preserved
    bit-for-bit; the oracle is the stock SQL WINDOW form)."""
    from data_integration_spark.operators.prefix import range_ntile

    cust = Catalog(spark, sf_dir)["customer"].select("c_custkey", "c_acctbal")
    tiled = range_ntile(
        cust,
        [F.col("c_acctbal"), F.col("c_custkey")],
        4,
        out_col="quartile",
        rn_col="_rn",
    )
    n_total = tiled.count()
    # SQL PERCENT_RANK defines a 1-row partition as 0.0; the max(...) guard
    # keeps the denominator positive so the double division never hits 0/0
    # (NaN would silently diverge from the oracle — ADVICE r6)
    return tiled.select(
        "c_custkey",
        F.col("quartile").cast("int").alias("quartile"),
        F.round(
            (F.col("_rn") - 1) / F.lit(float(max(n_total - 1, 1))), 6
        ).alias("pct_rank"),
    )


@register(
    "q_running_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS moving_avg3
    FROM orders
    """,
)
def q_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec analytics: running total (unbounded preceding) + 3-row
    moving average per customer — the window frames the reference never
    needed (SURVEY §2.5), Catalyst-native.

    Float note: each frame aggregates ≤ a few 2-dp values in a DETERMINISTIC
    order (the frame's), so round(…,2)/round(…,6) are exact-grid stable."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return Catalog(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(
            F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 6
        ).alias("moving_avg3"),
    )


@register(
    "q_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderpriority = '5-LOW')
    """,
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL entry point — Catalyst
    decorrelates to semi/anti joins (same IR as the DataFrame API, the
    property the reference's dual dplyr/SQLite stack lacks; SURVEY §3.2)."""
    from data_integration_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '5-LOW')
        """
    )


@register(
    "q_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (stream-stream-shaped) join: clicks within 1 h before each
    purchase per user — the batch form of streaming/joins.py's attribution
    join (stream/batch equivalence is pinned in tests)."""
    from data_integration_spark.streaming.joins import clicks_before_purchase

    ev = Catalog(spark, sf_dir)["events"]
    out = clicks_before_purchase(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        "click_value",
    )


@register(
    "q_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, c.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest prior click's value per
    user — composed from union + window last() (operators/asof.py), checked
    against DuckDB's native ASOF JOIN."""
    ev = Catalog(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, key="user_id", ts="ts", value_cols=["value"])
    return out.select("event_id", "user_id", F.col("value_asof"))


@register(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under cube/rollup): three
    grouping combinations in ONE pass over the fact table — Catalyst
    expands to a single Expand + aggregate, not three scans."""
    Catalog(spark, sf_dir)["orders"].createOrReplaceTempView("t2_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM t2_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@register(
    "q_first_last_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST/NTH_VALUE over an explicit unbounded frame — the frame
    spec matters: LAST_VALUE over the DEFAULT frame (up to current row)
    is a classic silent-wrong-answer; the explicit unbounded frame is the
    semantics users almost always mean."""
    from pyspark.sql import Window

    o = Catalog(spark, sf_dir)["orders"].filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
            "second_price"
        ),
    )


@register(
    "q_cume_dist",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(CUME_DIST() OVER w, 6) AS cd,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST alongside PERCENT_RANK — the two normalized rank
    definitions differ at the edges (cume_dist ∈ (0,1], percent_rank ∈
    [0,1)); both in one window pass."""
    from pyspark.sql import Window

    o = Catalog(spark, sf_dir)["orders"].filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@register(
    "q_funnel",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      COUNT(t_view) AS viewed,
      COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
      COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
        AS full_funnel
    FROM steps
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): per-user first
    timestamps per step via conditional MIN aggregation, then ordered-step
    counts — ONE shuffle on user_id, no self-joins, no window sort; the
    funnel shape that stays one aggregation at any user count."""
    ev = Catalog(spark, sf_dir)["events"]

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    steps = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return steps.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), 1)
        ).alias("clicked_after_view"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("full_funnel"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             DATE_DIFF('week', f.cohort, DATE_TRUNC('week', e.ts)) AS week_n
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT STRFTIME(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(week_n AS INT) AS week_n,
           COUNT(*) AS active_users
    FROM activity GROUP BY cohort, week_n
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, counted
    in each subsequent activity week. First-seen is a MIN window over
    user_id — one shuffle on the events table, no per-user side table to
    join (the r2 version broadcast a users-sized frame, which is
    data-proportional and dies at 100×)."""
    ev = Catalog(spark, sf_dir)["events"].select("user_id", "ts")
    wk = F.date_trunc("week", F.col("ts"))
    w = Window.partitionBy("user_id")
    activity = (
        ev.select("user_id", wk.alias("wk"))
        .withColumn("cohort", F.min("wk").over(w))
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date"))
                / 7
            ).cast("int").alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"), "week_n"
    ).agg(F.count("*").alias("active_users"))



@register(
    "q_range_frame_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER w AS n_in_band,
           CAST(SUM(o_orderkey) OVER w AS BIGINT) AS key_band_sum
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
    """,
)
def q_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based (RANGE) window frame: peers within 1000 order-key units
    behind the current row — distinct semantics from ROWS frames (the
    band is defined by the ORDER BY VALUE, so ties and gaps behave
    differently); the moving-band aggregation shape of sliding value
    windows without a join."""
    from pyspark.sql import Window

    o = Catalog(spark, sf_dir)["orders"].filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("n_in_band"),
        F.sum("o_orderkey").over(w).alias("key_band_sum"),
    )


@register(
    "q_sessionization",
    oracle="""
    WITH seq AS (
      SELECT user_id, EPOCH_US(ts) AS ts_us,
             LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM seq
    ),
    numbered AS (
      SELECT user_id, ts_us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MAX(ts_us) - MIN(ts_us) AS dur_us
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           ROUND((CAST(SUM(dur_us) AS BIGINT) // COUNT(*)) / 1000000.0, 6)
             AS avg_session_sec
    FROM per_session GROUP BY user_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-min inactivity gap): per-user
    session ids via lag + running sum, then per-session and per-user stats.

    Scale shape: ONE shuffle total — the lag window hash-partitions on
    user_id, the running-sum window reuses that sort, and BOTH downstream
    groupBys ((user_id, session_id), then user_id) are satisfied by the
    same user_id partitioning, so Catalyst adds no further Exchange. Gaps
    are integer microseconds (exact); the per-user mean truncates to whole
    microseconds (`div`) BEFORE the /1e6 — the raw double mean can land on
    an exact 6th-decimal half where Spark HALF_UP and DuckDB diverge
    (observed at sf0.1), while a µs-grid value has a zero 7th decimal and
    rounds identically everywhere.

    The streaming analogue is q_session_window (session_window +
    watermark); this is the batch/backfill form of SURVEY.md's event-time
    surface."""
    ev = Catalog(spark, sf_dir)["events"].select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts_us")
    gapped = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w_seq).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_seq) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = gapped.withColumn(
        "session_id",
        F.sum("new_s").over(w_seq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.sum("dur_us").alias("dur_total_us"),
        )
        .select(
            "user_id",
            "n_sessions",
            "n_events",
            "max_session_events",
            F.round(
                F.expr("dur_total_us div n_sessions") / F.lit(1000000.0), 6
            ).alias("avg_session_sec"),
        )
    )


@register(
    "q_rolling_regression",
    oracle="""
    WITH idx AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS x
      FROM events
    ),
    win AS (
      SELECT user_id, event_id,
             COUNT(*) OVER w AS n,
             SUM(CAST(x AS DOUBLE)) OVER w AS sx,
             SUM(value) OVER w AS sy,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) OVER w AS sxx,
             SUM(CAST(x AS DOUBLE) * value) OVER w AS sxy
      FROM idx
      WINDOW w AS (
        PARTITION BY user_id ORDER BY x
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
      )
    )
    SELECT user_id, event_id,
           CASE WHEN n >= 2 THEN
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS slope_10
    FROM win
    """,
)
def q_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS slope of event value over the user's last 10 events —
    the "is this user's spend trending up" feature, computed from the
    five sufficient sums (n, Σx, Σy, Σx², Σxy) over ONE sliding frame
    and the closed-form slope. x is the per-user event index (engine-
    identical integers; wall-clock deltas would drag timestamp-epoch
    representation into the certificate). The first event of each user
    emits NULL (slope of one point is undefined).

    Scale shape: one shuffle on user_id, two user-keyed windows (index +
    sliding sums) in the same exchange; sliding-frame state is 5 doubles
    regardless of frame width. Skew follows per-user event counts."""
    ev = Catalog(spark, sf_dir)["events"]
    w_idx = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-9, Window.currentRow)
    )
    x = F.col("x").cast("double")
    sums = (
        ev.withColumn("x", F.row_number().over(w_idx))
        .select(
            "user_id",
            "event_id",
            "x",
            F.count("*").over(w).alias("n"),
            F.sum(x).over(w).alias("sx"),
            F.sum("value").over(w).alias("sy"),
            F.sum(x * x).over(w).alias("sxx"),
            F.sum(x * F.col("value")).over(w).alias("sxy"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "user_id",
        "event_id",
        F.when(F.col("n") >= 2, F.round(slope, 6)).alias("slope_10"),
    )
