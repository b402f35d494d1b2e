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
