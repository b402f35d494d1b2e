"""Training-run data-ordering and experiment-analysis queries.

The ops a training pipeline runs between "corpus is curated" and "tokens
hit the trainer", plus the experiment statistics a data team runs on the
event stream:

- deterministic seeded GLOBAL shuffle of the corpus per epoch (the
  data-order every trainer consumes — must be reproducible across reruns,
  partitionings, and engines, so it is hash-ordered, not ``rand()``);
- seeded k-fold cross-validation assignment with a stratification report;
- running count-distinct window (Spark has no DISTINCT aggregate over a
  window frame — the first-occurrence + running-sum rewrite IS the
  standard scale-out formulation);
- one-way ANOVA F certificate (group-mean separation test).

Reference parity note: the reference (Method_code.Rmd) reaches shuffling /
fold assignment only implicitly through R's ``sample()`` (Rmd:569-571,
seeded per-rep); the engine-grade counterparts here are hash-keyed so they
are partition-invariant — the R4 contract (SURVEY §2.8) applied to data
ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.operators.prefix import range_row_number
from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog

# first-16-bits-of-md5 bucket, DuckDB side: ONE definition repo-wide
# (a stale second copy would silently diverge on a future DuckDB edge)
from data_integration_spark.queries.relational_extra import _H4  # noqa: E402

_N_EPOCHS = 2
_N_FOLDS = 5


@register(
    "q_training_order_shuffle",
    oracle=f"""
    SELECT epoch, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY epoch
             ORDER BY MD5('ep' || CAST(epoch AS VARCHAR) || ':'
                          || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS order_idx
    FROM documents
    CROSS JOIN (VALUES (0), (1)) AS e(epoch)
    """,
)
def q_training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle of the corpus, one independent
    permutation per training epoch: ``order_idx`` = rank of
    ``md5('ep<epoch>:<doc_id>')``. Hash-keyed ordering (never ``rand()``)
    is the only defensible trainer data-order at 100 TB — reproducible
    across reruns, engines, and partitionings, and a different permutation
    per epoch falls out of the epoch salt.

    Scale shape: the rank is ONE ``range_row_number`` over
    ``(epoch, key)`` — a range exchange plus per-partition windows, no
    single-task global window — and the per-epoch offset is recovered
    arithmetically from the corpus count (one scalar agg), so e epochs
    cost one ranking pass, not e."""
    docs = Catalog(spark, sf_dir)["documents"].select("doc_id")
    n_docs = docs.count()  # bounded driver scalar: one count aggregate
    epochs = docs.withColumn(
        "epoch", F.explode(F.array(*[F.lit(i) for i in range(_N_EPOCHS)]))
    )
    keyed = epochs.withColumn(
        "key",
        F.md5(
            F.concat_ws(
                "",
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
    )
    ranked = range_row_number(
        keyed, [F.col("epoch"), F.col("key"), F.col("doc_id")], out_col="_rn"
    )
    return ranked.select(
        "epoch",
        "doc_id",
        (F.col("_rn") - 1 - F.col("epoch").cast("long") * F.lit(n_docs)).alias(
            "order_idx"
        ),
    )


@register(
    "q_kfold_assign",
    oracle=f"""
    SELECT fold, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT CAST({_H4} % {_N_FOLDS} AS INTEGER) AS fold, lang, n_chars
      FROM (
        SELECT MD5('cv1:' || CAST(doc_id AS VARCHAR)) AS h, lang, n_chars
        FROM documents
      )
    )
    GROUP BY fold, lang
    """,
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded k-fold cross-validation assignment (k=5, salt
    ``cv1``) with the per-(fold, language) stratification report a team
    inspects before trusting the folds. Fold = 16-bit md5 bucket of the
    salted doc_id mod k — id-keyed (not content-keyed, unlike
    q_shard_assign) so a re-crawled document keeps its fold and never
    leaks across the train/validation boundary between runs.

    Scale shape: narrow per-row expression + one k×|langs|-key
    aggregation with map-side partials; nothing driver-side."""
    docs = Catalog(spark, sf_dir)["documents"]
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("", F.lit("cv1:"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    return (
        docs.select(
            F.pmod(bucket, F.lit(_N_FOLDS)).alias("fold"), "lang", "n_chars"
        )
        .groupBy("fold", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "q_window_count_distinct",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_so_far
    FROM (
      SELECT user_id, event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS occ
      FROM events
    )
    """,
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user in event order — the
    "how much of the product has this user touched so far" trajectory.
    SQL forbids DISTINCT aggregates over a window frame, and the naive
    collect_set-over-frame holds the whole set per row; the standard
    rewrite used here marks each (user, type)'s FIRST occurrence with a
    row_number and running-sums the 0/1 marks — two partitioned windows,
    both keyed by user (never global), constant state per row.

    Scale shape: one shuffle on (user_id, event_type), one on user_id;
    both frames are user-sized, so skew follows the per-user event count
    (AQE-splittable), not the corpus."""
    ev = Catalog(spark, sf_dir)["events"]
    w_occ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("occ", F.row_number().over(w_occ))
        .withColumn(
            "n_types_so_far",
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0)).over(w_run),
        )
        .select("user_id", "event_id", "n_types_so_far")
    )


@register(
    "q_anova",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, COUNT(*) AS n_g, AVG(o_totalprice) AS mean_g
      FROM orders GROUP BY o_orderpriority
    ),
    gm AS (
      SELECT SUM(n_g * mean_g) / SUM(n_g) AS mu,
             CAST(SUM(n_g) AS BIGINT) AS n, COUNT(*) AS k
      FROM g
    ),
    ssb AS (
      SELECT SUM(g.n_g * (g.mean_g - gm.mu) * (g.mean_g - gm.mu)) AS v
      FROM g CROSS JOIN gm
    ),
    ssw AS (
      SELECT SUM((o.o_totalprice - g.mean_g) * (o.o_totalprice - g.mean_g))
               AS v
      FROM orders o JOIN g ON o.o_orderpriority = g.o_orderpriority
    )
    SELECT gm.k AS k_groups, gm.k - 1 AS df_between, gm.n - gm.k AS df_within,
           ROUND((ssb.v / (gm.k - 1)) / (ssw.v / (gm.n - gm.k)), 6) AS f_stat,
           ROUND(ssb.v / (ssb.v + ssw.v), 6) AS eta_sq
    FROM gm, ssb, ssw
    """,
)
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA certificate: does mean order value differ across
    order priorities? Emits (k, df_between, df_within, F, η²) as one row.
    Two-pass formulation (group means first, then squared deviations
    against the joined-back mean) — numerically stable at any scale,
    unlike the textbook Σy²−nμ² identity whose cancellation error grows
    with the magnitude of y.

    Scale shape: one grouped aggregation (k rows), one broadcast join of
    the k-row mean table back onto the fact scan, one global reduction
    to scalars. The fact table is scanned exactly twice and never
    shuffled on a data-sized key."""
    o = Catalog(spark, sf_dir)["orders"].select("o_orderpriority", "o_totalprice")
    g = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_g"), F.avg("o_totalprice").alias("mean_g")
    )
    gm = g.agg(
        (F.sum(F.col("n_g") * F.col("mean_g")) / F.sum("n_g")).alias("mu"),
        F.sum("n_g").alias("n"),
        F.count("*").alias("k"),
    )
    ssb = (
        g.crossJoin(F.broadcast(gm).select("mu"))
        .agg(
            F.sum(
                F.col("n_g")
                * (F.col("mean_g") - F.col("mu"))
                * (F.col("mean_g") - F.col("mu"))
            ).alias("ssb")
        )
    )
    ssw = (
        o.join(F.broadcast(g), "o_orderpriority")
        .agg(
            F.sum(
                (F.col("o_totalprice") - F.col("mean_g"))
                * (F.col("o_totalprice") - F.col("mean_g"))
            ).alias("ssw")
        )
    )
    return (
        gm.crossJoin(ssb)
        .crossJoin(ssw)
        .select(
            F.col("k").alias("k_groups"),
            (F.col("k") - 1).alias("df_between"),
            (F.col("n") - F.col("k")).alias("df_within"),
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / (F.col("ssw") / (F.col("n") - F.col("k"))),
                6,
            ).alias("f_stat"),
            F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias(
                "eta_sq"
            ),
        )
    )


@register(
    "q_negative_sampling",
    oracle="""
    WITH pos AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey < 300
    ),
    pmax AS (SELECT MAX(p_partkey) AS np FROM part),
    cand AS (
      SELECT pos.u, pos.i, j.j,
             1 + (('0x' || SUBSTR(MD5('NS' || CAST(pos.u AS VARCHAR) || ':'
                   || CAST(pos.i AS VARCHAR) || ':'
                   || CAST(j.j AS VARCHAR)), 1, 8))::UBIGINT
                  % (SELECT np FROM pmax)) AS neg
      FROM pos, UNNEST(GENERATE_SERIES(1, 4)) AS j(j)
    ),
    clean AS (
      SELECT c.u, c.i, c.j, CAST(c.neg AS BIGINT) AS neg
      FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM pos p2 WHERE p2.u = c.u AND p2.i = c.neg
      )
    ),
    ranked AS (
      SELECT u, i, neg, j,
             ROW_NUMBER() OVER (PARTITION BY u, i ORDER BY j) AS rk
      FROM clean
    )
    SELECT u AS user_id, i AS pos_item, neg AS neg_item,
           CAST(rk AS BIGINT) AS k
    FROM ranked WHERE rk <= 2
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training
    (BPR / word2vec-style): for every observed (user, item) positive,
    draw 4 hash-uniform candidate items, drop any that are actually
    positives for that user (an anti-join — the correctness step naive
    samplers skip), keep the first 2 survivors. The 'randomness' is the
    R2 primitive (md5 over user:item:j — portable, so the oracle
    redraws the SAME candidates), making a stochastic-looking training
    op fully value-checkable.

    Scale shape: candidate generation is a 4x in-row fan-out over the
    positives; the rejection is one LEFT ANTI join on (user, candidate)
    co-keyed with the positives table; the keep-2 is a per-positive
    window. Item-catalog size enters only as a bounded MAX scalar.
    Bounded to o_custkey < 300 to keep the driver-hashed output small —
    the shapes are corpus-wide capable."""
    orders = Catalog(spark, sf_dir)["orders"].filter(F.col("o_custkey") < 300)
    li = Catalog(spark, sf_dir)["lineitem"]
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .distinct()
    )
    n_parts = (
        Catalog(spark, sf_dir)["part"].agg(F.max("p_partkey")).collect()[0][0]
    )
    cand = pos.select(
        "u",
        "i",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
    ).withColumn(
        "neg",
        1
        + F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("NS"),
                        F.col("u").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n_parts),
    )
    clean = cand.join(
        pos.select("u", F.col("i").alias("neg")),
        ["u", "neg"],
        "left_anti",
    )
    rk = F.row_number().over(Window.partitionBy("u", "i").orderBy("j"))
    return (
        clean.withColumn("rk", rk)
        .filter(F.col("rk") <= 2)
        .select(
            F.col("u").alias("user_id"),
            F.col("i").alias("pos_item"),
            F.col("neg").cast("long").alias("neg_item"),
            F.col("rk").cast("long").alias("k"),
        )
    )


@register(
    "q_churn_labels",
    oracle="""
    WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
    feat AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases,
             ROUND(SUM(value), 4) AS total_value,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS days_active
      FROM events, t0
      WHERE ts < t0.t0 + INTERVAL 18 DAY
      GROUP BY user_id
    ),
    lab AS (
      SELECT DISTINCT user_id FROM events, t0
      WHERE ts >= t0.t0 + INTERVAL 18 DAY
        AND ts < t0.t0 + INTERVAL 25 DAY
        AND event_type = 'purchase' AND value > 140
    )
    SELECT f.user_id, f.n_events, f.n_purchases, f.total_value,
           f.days_active,
           CASE WHEN lab.user_id IS NULL THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS churned
    FROM feat f LEFT JOIN lab ON lab.user_id = f.user_id
    """,
)
def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn-label construction — the temporal supervised
    dataset builder: features aggregate STRICTLY inside the 18-day
    feature window from the corpus start; the label (churned = no
    HIGH-VALUE purchase, value > 140 — the bare any-activity flag is
    saturated on this always-on corpus, the r5 value-dead-path lesson
    applied at design time) comes STRICTLY from the disjoint
    [18, 25)-day label window; the windows share no rows, so no
    feature can leak the label. The single most common thing an ML
    platform builds from an event stream, as one declarative plan.

    total_value rounds at 4dp: a per-user float SUM over that user's
    bounded event set (hundreds of ~50-magnitude values — reduction
    noise ~1e-12, far inside the grid).

    Scale shape: corpus start is ONE bounded MIN scalar; both windows
    are partition-prunable timestamp filters (pushed to the scan when
    the table is date-partitioned); one user-keyed aggregation + one
    user-keyed left-anti-shaped join."""
    ev = Catalog(spark, sf_dir)["events"]
    t0 = ev.agg(F.min("ts")).collect()[0][0]
    f_end = F.lit(t0) + F.expr("INTERVAL 18 DAYS")
    l_end = F.lit(t0) + F.expr("INTERVAL 25 DAYS")
    feat = (
        ev.filter(F.col("ts") < f_end)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct(F.to_date("ts")).alias("days_active"),
        )
    )
    lab = (
        ev.filter(
            (F.col("ts") >= f_end)
            & (F.col("ts") < l_end)
            & (F.col("event_type") == "purchase")
            & (F.col("value") > 140)
        )
        .select("user_id")
        .distinct()
        .withColumn("active", F.lit(1))
    )
    return feat.join(lab, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_purchases",
        "total_value",
        "days_active",
        F.when(F.col("active").isNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("churned"),
    )
