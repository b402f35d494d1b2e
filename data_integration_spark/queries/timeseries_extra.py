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
