"""Time-series reshaping over the event stream: date-spine gap-filling,
interval merging (gaps-and-islands), and rolling active-user counts —
the hypertable/continuous-aggregate ops (TimescaleDB's
``time_bucket_gapfill``, warehouse DAU/WAU boards) expressed as
declarative plans. All full-oracle; no timestamps in outputs beyond DATE
(per the registry's hash-stability conventions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog


@register(
    "q_time_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 6) AS day_value
      FROM events WHERE user_id < 100
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
      FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, CAST(u.d AS DATE) AS day
      FROM bounds b,
           UNNEST(GENERATE_SERIES(CAST(b.lo AS TIMESTAMP),
                                  CAST(b.hi AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS u(d)
    )
    SELECT s.user_id, s.day, d.day_value,
           LAST_VALUE(d.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           CASE WHEN d.day_value IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s
    LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
    """,
)
def q_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap-filling: each user's daily revenue series is
    regularized onto a per-user day spine spanning their first..last
    active day; missing days appear with NULL raw value, a forward-filled
    carry (last observation carried forward), and an is_gap marker — the
    ``time_bucket_gapfill`` primitive every dashboard resample needs
    (q_forward_fill repairs values on EXISTING rows; this materializes
    the missing rows themselves).

    Scale shape: per-user spine generation is a bounded in-row
    ``sequence`` + explode (span-bounded, not corpus-bounded); the
    spine↔daily join and the fill window are both user-keyed; no
    calendar table ships to the driver. user_id < 100 bounds the signed
    output; the operator itself takes any predicate."""
    daily = (
        Catalog(spark, sf_dir)["events"]
        .filter(F.col("user_id") < 100)
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("day_value"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias(
                "filled_value"
            ),
            F.when(F.col("day_value").isNull(), 1).otherwise(0).alias(
                "is_gap"
            ),
        )
    )


@register(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
    ),
    ord AS (
      SELECT user_id, s, e,
             MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM ord
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(DATE_DIFF('second', st, en)) AS BIGINT)
             AS active_seconds,
           CAST(MAX(DATE_DIFF('second', st, en)) AS BIGINT)
             AS longest_seconds
    FROM merged GROUP BY user_id
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping activity intervals (each event opens a 30-minute
    window) into per-user activity ISLANDS — the gaps-and-islands
    pattern: an exclusive running MAX of interval ends marks island
    starts (a new island begins exactly when a start exceeds every
    previous end), a running SUM of the marks numbers the islands, one
    grouped aggregation merges them. Reports islands, total active
    seconds, and the longest session per user.

    Scale shape: one shuffle on user_id; the two running windows ride
    the same exchange; island merge is a (user, island)-keyed
    aggregation. The sort-and-sweep is per-user — no self-join, no
    interval cross-product."""
    ev = Catalog(spark, sf_dir)["events"].select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("interval 30 minutes")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = (
        ev.withColumn("prev_max", F.max("e").over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    merged = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    dur = F.unix_timestamp("en") - F.unix_timestamp("st")
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum(dur).alias("active_seconds"),
        F.max(dur).alias("longest_seconds"),
    )


@register(
    "q_dau_wau",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM activity
    ),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM activity GROUP BY day
    ),
    contrib AS (
      SELECT a.user_id, CAST(a.day + CAST(u.o AS INTEGER) AS DATE) AS day
      FROM activity a, UNNEST(GENERATE_SERIES(0, 6)) AS u(o)
    ),
    wau AS (
      SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
      FROM contrib c, bounds b
      WHERE c.day <= b.hi
      GROUP BY c.day
    )
    SELECT d.day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users and the DAU/WAU stickiness ratio per
    day. Rolling COUNT(DISTINCT) over a range frame is unsupported (and
    unscalable as frame state); the standard rewrite EXPLODES each
    (user, day) activity row into the 7 report days it contributes to —
    a fixed ×7 fan-out of the deduplicated activity table (tiny next to
    raw events) — then counts distinct users per report day.

    Scale shape: activity dedup is one (user, day) aggregation; the ×7
    explode is in-row; the WAU count-distinct is a two-phase agg on
    day. Report days beyond the observed range are clipped with a 1-row
    bounds cross (scalar)."""
    activity = (
        Catalog(spark, sf_dir)["events"]
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    bounds = activity.agg(F.max("day").alias("hi"))
    dau = activity.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = activity.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("o"),
        "day",
    ).select("user_id", F.date_add("day", F.col("o")).alias("day"))
    wau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("hi"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT day, rev_c,
             DATEDIFF('day', DATE '1995-01-01', day) AS day_idx,
             ISODOW(day) AS dow,
             ROUND(AVG(rev_c) OVER (
               ORDER BY DATEDIFF('day', DATE '1995-01-01', day)
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
             ) / 100.0, 6) AS trend
      FROM daily
    ),
    dt AS (
      SELECT day, rev_c, dow, trend,
             CAST(ROUND((rev_c / 100.0 - trend) * 1000000) AS BIGINT)
               AS d_micro
      FROM tr
    ),
    seas AS (
      SELECT dow, ROUND(AVG(d_micro) / 1000000.0, 6) AS seasonal
      FROM dt GROUP BY dow
    )
    SELECT dt.day, CAST(dt.dow AS INTEGER) AS dow,
           ROUND(dt.rev_c / 100.0, 2) AS revenue,
           dt.trend, seas.seasonal,
           ROUND(dt.rev_c / 100.0 - dt.trend - seas.seasonal, 6)
             AS residual
    FROM dt JOIN seas ON seas.dow = dt.dow
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily revenue series:
    trend = centered 7-day moving average (a RANGE frame over the
    integer day index, so calendar gaps shrink the frame instead of
    smearing it), seasonal = mean detrended value per ISO weekday,
    residual = remainder. The weekly-seasonality read-out behind every
    ops dashboard, as one declarative plan.

    Hash stability is engineered, not hoped for: daily revenue is
    snapped to integer CENTS (the 2dp money grid — a sum of 2dp values
    is an exact integer-cents quantity, so rounding the float SUM to
    that grid is reduction-order-independent), and the per-weekday
    seasonal mean averages integer MICRO-units of the detrended series
    — integer sums are exact under 2^53 in ANY order, so no multi-row
    float reduction survives to the hash.

    Scale shape: one groupBy(day) with map-side partials; the trend
    window's global ORDER BY day is CALENDAR-bounded (≤ a few thousand
    rows regardless of fact size — the q_mom_growth precedent), then a
    7-row broadcast join. Orders-table scale never reaches a window."""
    daily = (
        Catalog(spark, sf_dir)["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("rev_c")
        )
    )
    day_idx = F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
    w = Window.orderBy(day_idx).rangeBetween(-3, 3)
    tr = daily.select(
        "day",
        "rev_c",
        (F.expr("weekday(day)") + 1).alias("dow"),
        F.round(F.avg("rev_c").over(w) / 100.0, 6).alias("trend"),
    )
    dt = tr.withColumn(
        "d_micro",
        F.round((F.col("rev_c") / 100.0 - F.col("trend")) * 1e6)
        .cast("long"),
    )
    seas = dt.groupBy("dow").agg(
        F.round(F.avg("d_micro") / 1e6, 6).alias("seasonal")
    )
    return dt.join(F.broadcast(seas), "dow").select(
        "day",
        F.col("dow").cast("int").alias("dow"),
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        "trend",
        "seasonal",
        F.round(
            F.col("rev_c") / 100.0 - F.col("trend") - F.col("seasonal"), 6
        ).alias("residual"),
    )


@register(
    "q_linear_interpolation",
    oracle="""
    WITH masked AS (
      SELECT event_id, user_id, EPOCH_US(ts) AS t_us,
             CASE WHEN event_id % 7 = 3 THEN NULL ELSE value END AS v
      FROM events WHERE user_id < 50
    ),
    nb AS (
      SELECT event_id, user_id, t_us, v,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_v,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN t_us END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_t,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_v,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t_us END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_t
      FROM masked
    )
    SELECT event_id, user_id, t_us,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_masked,
           CASE
             WHEN v IS NOT NULL THEN ROUND(v, 6)
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                  AND next_t > prev_t THEN
               ROUND(prev_v + (next_v - prev_v)
                     * (CAST(t_us - prev_t AS DOUBLE) / (next_t - prev_t)),
                     6)
             ELSE NULL
           END AS v_interp
    FROM nb
    """,
)
def q_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing sensor values: every 7th event's
    value is masked, then reconstructed as the time-weighted blend of
    its nearest non-null neighbors within the same user's series
    (pandas ``interpolate(method='time')``, as a distributed plan).
    Series-boundary gaps (no anchor on one side) stay NULL — the honest
    semantics; forward-fill is q_forward_fill's job.

    All four anchor lookups (previous/next value and timestamp) are
    IGNORE NULLS window frames over ONE user-keyed sort — two window
    passes (forward + reverse order) on the same partitioning, no extra
    exchange. Time arithmetic runs in exact integer microseconds; the
    blend is one float expression chain on identical inputs in both
    engines, so round(…, 6) is bit-stable.

    Scale shape: partitionBy(user_id) — per-series state never crosses
    users; one shuffle total. user_id < 50 bounds the signed slice; the
    operator itself takes any predicate."""
    ev = (
        Catalog(spark, sf_dir)["events"]
        .filter(F.col("user_id") < 50)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            F.when(F.col("event_id") % 7 == 3, F.lit(None)).otherwise(
                F.col("value")
            ).alias("v"),
        )
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_if_obs = F.when(F.col("v").isNotNull(), F.col("t_us"))
    nb = ev.select(
        "event_id",
        "user_id",
        "t_us",
        "v",
        F.last("v", ignorenulls=True).over(fwd).alias("prev_v"),
        F.last(t_if_obs, ignorenulls=True).over(fwd).alias("prev_t"),
        F.first("v", ignorenulls=True).over(bwd).alias("next_v"),
        F.first(t_if_obs, ignorenulls=True).over(bwd).alias("next_t"),
    )
    blend = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        (F.col("t_us") - F.col("prev_t")).cast("double")
        / (F.col("next_t") - F.col("prev_t"))
    )
    return nb.select(
        "event_id",
        "user_id",
        "t_us",
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_masked"),
        F.when(F.col("v").isNotNull(), F.round(F.col("v"), 6))
        .when(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("next_t") > F.col("prev_t")),
            F.round(blend, 6),
        )
        .alias("v_interp"),
    )


@register(
    "q_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT day, rev_c,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             SUM(rev_c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
             COUNT(*) OVER () AS n,
             SUM(rev_c) OVER () AS tot_c
      FROM daily
    ),
    gains AS (
      SELECT day, i, n,
             CAST(cum_c AS DOUBLE) / i AS m1,
             CAST(tot_c - cum_c AS DOUBLE) / (n - i) AS m2,
             CAST(i AS DOUBLE) * (n - i) / n
               * ((CAST(cum_c AS DOUBLE) / i)
                  - (CAST(tot_c - cum_c AS DOUBLE) / (n - i)))
               * ((CAST(cum_c AS DOUBLE) / i)
                  - (CAST(tot_c - cum_c AS DOUBLE) / (n - i))) AS gain
      FROM pre WHERE i < n
    ),
    best AS (
      SELECT day, i, n, m1, m2, gain,
             ROW_NUMBER() OVER (ORDER BY gain DESC, day) AS rk
      FROM gains
    )
    SELECT day AS split_day,
           CAST(i AS BIGINT) AS n_left,
           CAST(n - i AS BIGINT) AS n_right,
           ROUND(m1 / 100.0, 6) AS mean_left,
           ROUND(m2 / 100.0, 6) AS mean_right,
           ROUND(gain / 10000.0, 4) AS gain
    FROM best WHERE rk = 1
    """,
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on the daily revenue series by binary
    segmentation (the first split of the classic CUSUM/PELT family —
    complements q_cusum_drift, which monitors a KNOWN baseline; this
    FINDS the break): choose the split day maximizing the
    between-segment variance-reduction gain n1*n2/n*(m1-m2)^2, i.e. the
    day whose left/right means differ most strongly, weighted by
    balance. Ties break to the earliest day.

    Numerics: daily revenue snapped to integer CENTS (exact in any
    reduction order), prefix sums over the integers, so every mean and
    the gain are computed from exact integers by identical float
    expressions in both engines; gain reported in dollars^2 (/ 100^2).

    Scale shape: one groupBy(day) over the fact table (map-side
    partials) collapses everything to the CALENDAR-bounded daily frame
    (<= a few thousand rows regardless of fact size — the q_mom_growth /
    q_seasonal_decompose precedent), and only that bounded frame rides
    the global cumulative windows + the argmax window."""
    daily = (
        Catalog(spark, sf_dir)["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_c")
        )
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("rev_c").over(w_cum).alias("cum_c"),
        F.count("*").over(w_all).alias("n"),
        F.sum("rev_c").over(w_all).alias("tot_c"),
    )
    m1 = F.col("cum_c").cast("double") / F.col("i")
    m2 = (F.col("tot_c") - F.col("cum_c")).cast("double") / (
        F.col("n") - F.col("i")
    )
    gain = (
        F.col("i").cast("double")
        * (F.col("n") - F.col("i"))
        / F.col("n")
        * (m1 - m2)
        * (m1 - m2)
    )
    gains = pre.filter(F.col("i") < F.col("n")).select(
        "day", "i", "n", m1.alias("m1"), m2.alias("m2"), gain.alias("gain")
    )
    best = gains.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("gain").desc(), "day")),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("day").alias("split_day"),
        F.col("i").cast("long").alias("n_left"),
        (F.col("n") - F.col("i")).cast("long").alias("n_right"),
        F.round(F.col("m1") / 100.0, 6).alias("mean_left"),
        F.round(F.col("m2") / 100.0, 6).alias("mean_right"),
        F.round(F.col("gain") / 10000.0, 4).alias("gain"),
    )


@register(
    "q_holt_linear",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i,
             CAST(value AS DOUBLE) AS v,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE user_id < 40
    ),
    it(user_id, n, i, l, b) AS (
      SELECT b1.user_id, b1.n, 2, b1.v, b2.v - b1.v
      FROM base b1 JOIN base b2
        ON b2.user_id = b1.user_id AND b1.i = 1 AND b2.i = 2
      UNION ALL
      SELECT it.user_id, it.n, it.i + 1,
             0.5 * base.v + 0.5 * (it.l + it.b),
             0.3 * ((0.5 * base.v + 0.5 * (it.l + it.b)) - it.l)
               + 0.7 * it.b
      FROM it JOIN base
        ON base.user_id = it.user_id AND base.i = it.i + 1
      WHERE it.i < it.n
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
           ROUND(l + b, 6) AS forecast_1
    FROM it WHERE i = n
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing per user — the
    trend-aware sibling of q_ewma_smoothing and the simplest real
    forecaster: level l' = a*x + (1-a)*(l+b), trend
    b' = g*(l'-l) + (1-g)*b with a=0.5, g=0.3, initialized l=x1,
    b=x2-x1; emits the final state and the one-step-ahead forecast
    l+b. A sequential recurrence SQL windows cannot express — Spark
    runs it as an in-row F.aggregate FOLD over the user's time-ordered
    values with a (level, trend) struct accumulator; the DuckDB oracle
    replays the SAME recurrence via a recursive CTE with the SAME
    float expressions in the same order, so the doubles agree
    bit-for-bit before the 6dp round (the q_ewma_smoothing oracle
    pattern, extended to 2-component state — REDUCE can't carry a
    struct, recursion can).

    Bounded to user_id < 40 purely to bound the oracle's recursion
    (the Spark fold is corpus-wide capable: per-user state is that
    user's event count, the sessionization argument).

    Scale shape: one groupBy(user) collect + in-row fold; no global
    ordering, no iteration jobs — the whole recurrence is one
    expression."""
    ev = Catalog(spark, sf_dir)["events"].filter(F.col("user_id") < 40)
    vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
            )
        ),
        lambda s: s["value"].cast("double"),
    )
    per = (
        ev.groupBy("user_id")
        .agg(vals.alias("vals"))
        .filter(F.size("vals") >= 2)
    )
    # init from (x1, x2); fold x3..xn — identical operation order to the
    # oracle's recursion (0.5*x + 0.5*(l+b); 0.3*(l'-l) + 0.7*b)
    state = F.aggregate(
        F.slice(
            F.col("vals"), 3, F.greatest(F.size("vals") - 2, F.lit(0))
        ),
        F.struct(
            F.element_at("vals", 1).alias("l"),
            (F.element_at("vals", 2) - F.element_at("vals", 1)).alias("b"),
        ),
        lambda acc, x: F.struct(
            (F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])).alias(
                "l"
            ),
            (
                F.lit(0.3)
                * (
                    (F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"]))
                    - acc["l"]
                )
                + F.lit(0.7) * acc["b"]
            ).alias("b"),
        ),
    )
    return per.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.round(state["l"], 6).alias("level"),
        F.round(state["b"], 6).alias("trend"),
        F.round(state["l"] + state["b"], 6).alias("forecast_1"),
    )


@register(
    "q_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS x,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
      GROUP BY 1, 2
    ),
    slopes AS (
      SELECT CAST(b.rev_c - a.rev_c AS DOUBLE) / (b.x - a.x) AS slope
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    med AS (
      SELECT ROUND(MEDIAN(slope) / 100.0, 6) AS slope_per_day,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM slopes
    ),
    ic AS (
      SELECT ROUND(MEDIAN(
               rev_c / 100.0 - (SELECT slope_per_day FROM med) * x
             ), 6) AS intercept,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily
    )
    SELECT med.n_pairs, ic.n_days, med.slope_per_day, ic.intercept
    FROM med, ic
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimate of 1995 daily revenue: the median
    of all pairwise slopes (breakdown point 29% — one bad month cannot
    drag the trend the way OLS's squared loss does), plus the companion
    median intercept using the ROUNDED slope (decoupling the two medians'
    float paths keeps both engines identical). The robust-regression
    sibling of q_rolling_regression's windowed OLS.

    Numerics: daily revenue in exact integer cents, day index an exact
    integer, so every pairwise slope is one float division of exact
    integers — identical in both engines; the median's interpolation
    between the two central order statistics is a single expression on
    those identical doubles.

    Scale shape: the fact table collapses to a CALENDAR-bounded daily
    frame first (<= 365 rows here, by construction); the O(n^2) pair
    space exists only over that bounded frame (~66k pairs), never over
    raw data — which is exactly how Theil-Sen is deployed at scale
    (aggregate first, robust-fit the bounded series). The inequality
    self-join is a bounded-frame BNLJ, allowlisted with the other
    bounded crosses."""
    daily = (
        Catalog(spark, sf_dir)["orders"]
        .filter(
            (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate").cast("date") < F.lit("1996-01-01"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_c")
        )
        .select(
            "day",
            F.datediff(F.col("day"), F.lit("1995-01-01").cast("date")).alias(
                "x"
            ),
            "rev_c",
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("b.x") > F.col("a.x")).select(
        (
            (F.col("b.rev_c") - F.col("a.rev_c")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope")
    )
    # the median slope is ONE bounded scalar — collect it (the q_cuped
    # driver-scalar discipline) so the pairwise-slope join runs once,
    # not once per consuming branch
    slope_per_day, n_pairs = slopes.agg(
        F.round(F.expr("percentile(slope, 0.5)") / 100.0, 6),
        F.count("*"),
    ).collect()[0]
    if slope_per_day is None:
        # degenerate series (fewer than two days): mirror the oracle's
        # NULL slope/intercept instead of interpolating "None" into SQL
        return daily.agg(
            F.lit(0).cast("long").alias("n_pairs"),
            F.count("*").alias("n_days"),
            F.lit(None).cast("double").alias("slope_per_day"),
            F.lit(None).cast("double").alias("intercept"),
        )
    return daily.agg(
        F.lit(int(n_pairs)).cast("long").alias("n_pairs"),
        F.count("*").alias("n_days"),
        F.lit(float(slope_per_day)).alias("slope_per_day"),
        F.round(
            F.expr(f"percentile(rev_c / 100.0 - {slope_per_day!r} * x, 0.5)"),
            6,
        ).alias("intercept"),
    )


@register(
    "q_out_of_order_audit",
    oracle="""
    WITH arr AS (
      SELECT user_id, event_id, EPOCH_US(ts) AS t_us,
             MD5('A' || CAST(event_id AS VARCHAR)) AS arrival_key
      FROM events
    ),
    run AS (
      SELECT user_id, t_us,
             MAX(t_us) OVER (PARTITION BY user_id ORDER BY arrival_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM arr
    ),
    late AS (
      SELECT CASE WHEN prev_max > t_us
                  THEN (prev_max - t_us) / 1000000.0 ELSE 0.0 END AS lat
      FROM run
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN lat > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(SUM(CASE WHEN lat > 1800 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_30m,
           ROUND(MAX(lat), 6) AS max_lateness_s,
           ROUND(CAST(SUM(CASE WHEN lat > 1800 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS pct_late_30m
    FROM late
    """,
)
def q_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data audit — the measurement that SIZES a streaming
    watermark before you deploy one: replay the event stream in a
    deterministic adversarial ARRIVAL order (md5-permuted within each
    user — the raw feed arrives time-sorted, which would make the audit
    value-dead; the permutation models a sharded ingest that interleaves
    shards) and measure each event's lateness against the per-user
    running event-time high-water mark. n_late_30m / max_lateness_s are
    exactly the numbers that justify `withWatermark("ts", X)` — pick X
    too small and that fraction of events is silently dropped.

    The permutation is the portable md5 stream, so the oracle replays
    the identical arrival order; lateness values are exact integer
    microsecond differences scaled once.

    Scale shape: one user-keyed window over the arrival order (per-user
    state bounded by that user's history — the sessionization argument);
    the summary is a single 1-row aggregation."""
    ev = Catalog(spark, sf_dir)["events"]
    arr = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.md5(F.concat(F.lit("A"), F.col("event_id").cast("string"))).alias(
            "arrival_key"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = arr.withColumn("prev_max", F.max("t_us").over(w))
    lat = F.when(
        F.col("prev_max") > F.col("t_us"),
        (F.col("prev_max") - F.col("t_us")) / 1e6,
    ).otherwise(0.0)
    late = run.select(lat.alias("lat"))
    return late.agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("lat") > 0).cast("int"))
        .cast("long")
        .alias("n_out_of_order"),
        F.sum((F.col("lat") > 1800).cast("int"))
        .cast("long")
        .alias("n_late_30m"),
        F.round(F.max("lat"), 6).alias("max_lateness_s"),
        F.round(
            F.sum((F.col("lat") > 1800).cast("int")).cast("double")
            / F.count("*"),
            6,
        ).alias("pct_late_30m"),
    )
