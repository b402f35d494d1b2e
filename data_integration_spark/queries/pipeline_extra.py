"""Round-4 block: large-scale pipeline operators beyond the r3-signed
surface — quota sampling, snapshot diffing, SCD2 builds, inverted
indexing, outlier filtering, and sequence packing.

These register AFTER the 50-query sign window (see queries/__init__.py
_SIGN_PRIORITY); next round rotates them to the front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_spark.operators.packing import pack_documents
from data_integration_spark.queries import register
from data_integration_spark.sources.catalog import Catalog


@register(
    "q_quota_sample",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quota sampling: cap every language at 10 documents,
    chosen by content hash — the domain/language rebalancing step of a
    training-data mix (cap the over-represented stratum, keep the rest).

    Scale shape: one shuffle on the stratum key; the hash order makes the
    pick reproducible across runs, partitionings, and engines (same idiom
    as q_hash_sample), and Spark 4 runs the rn<=10 filter as
    WindowGroupLimit — per-task top-10 heaps, never a full per-group
    sort."""
    docs = Catalog(spark, sf_dir)["documents"]
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "lang", "source")
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P'
                  THEN ROUND(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE
               WHEN v1.o_orderkey IS NULL THEN 'added'
               WHEN v2.o_orderkey IS NULL THEN 'removed'
               WHEN v1.o_totalprice <> v2.o_totalprice THEN 'changed'
               ELSE 'unchanged' END AS change_type
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    ) GROUP BY change_type
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data classification: full-outer join two
    versions of a table on the key and classify each row added / removed /
    changed / unchanged — the audit step between incremental ingest runs.

    The two versions here are deterministic slices of orders (date windows,
    v2 re-prices status-P rows) so the oracle sees identical inputs.

    Scale shape: one co-partitioned shuffle join on the key (at 100 TB both
    snapshots would be bucketed on it, making the diff exchange-free), then
    a 4-row aggregate; the comparison never leaves the executors."""
    orders = Catalog(spark, sf_dir)["orders"]
    v1 = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select(F.col("o_orderkey").alias("k1"), F.col("o_totalprice").alias("p1"))
    v2 = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k2"),
        F.when(
            F.col("o_orderstatus") == "P",
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p2"),
    )
    return (
        v1.join(v2, F.col("k1") == F.col("k2"), "full_outer")
        .select(
            F.when(F.col("k1").isNull(), "added")
            .when(F.col("k2").isNull(), "removed")
            .when(F.col("p1") != F.col("p2"), "changed")
            .otherwise("unchanged")
            .alias("change_type")
        )
        .groupBy("change_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_scd2_build",
    oracle="""
    SELECT user_id,
           event_type AS state,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(STRFTIME(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: turn an event log into
    effective-dated state intervals (valid_from, valid_to, is_current) via
    LEAD over the per-key timeline — how a mutable entity's history is
    materialized for as-of joins.

    Scale shape: one shuffle on the entity key; both the LEAD and the
    is_current flag share the same window sort. The open interval is
    closed with a sentinel high date, so downstream range predicates
    (q_range_join / q_asof_join style) need no NULL branch."""
    ev = Catalog(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@register(
    "q_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, t.tk
      FROM documents,
           UNNEST(STRING_SPLIT_REGEX(LOWER(text), '[^a-z]+')) AS t(tk)
      WHERE t.tk <> ''
    ),
    postings AS (
      SELECT tk AS token,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ARRAY_TO_STRING(LIST(CAST(doc_id AS VARCHAR) ORDER BY doc_id)[:5], ',')
               AS first_docs
      FROM tok GROUP BY tk
    )
    SELECT token, n_docs, first_docs FROM postings
    WHERE n_docs BETWEEN 2 AND 50
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: token → document-frequency + capped posting
    list, with a document-frequency band (2..50) that drops both hapax
    noise and stopword-grade tokens — the retrieval-side sibling of
    q_tfidf and the shape BM25 / dedup-candidate stores are built on.

    Scale shape: explode → DISTINCT (map-side partial) → one shuffle on
    token; the posting list is capped at 5 doc ids BEFORE leaving the
    aggregation (slice of the sorted set), so a hot token ships a bounded
    payload — unbounded collect_list on text data is the classic 100 TB
    OOM."""
    docs = Catalog(spark, sf_dir)["documents"]
    tok = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z]+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("n_docs"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.array_sort(F.collect_set("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
            ).alias("first_docs"),
        )
        .filter(F.col("n_docs").between(2, 50))
    )


@register(
    "q_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sigma, 6) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE ABS((e.value - s.mu) / s.sigma) > 2.0
    """,
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: flag events whose value sits
    more than 2 sigma from its event-type mean — the numeric-column
    cleaning pass of a data-quality pipeline.

    Scale shape: two fact scans (one reduced map-side to a per-type stats
    row, one as the probe side), but the PROBE side never shuffles — the
    tiny stats frame broadcasts back onto it and the sigma filter runs as
    a map-side expression."""
    ev = Catalog(spark, sf_dir)["events"]
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(stats, "event_type")
        .filter(F.abs(z) > 2.0)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("z"),
        )
    )


@register("q_doc_packing")  # rows-only: greedy packing is not SQL-expressible
def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: group documents into 256-token bins per
    content-hash shard via greedy first-fit-decreasing inside
    applyInPandas — the tokenize→pack step before training-batch
    assembly. Rows-only by contract (iterative/greedy, no SQL oracle);
    tests/test_packing.py carries the semantics: bins never exceed the
    budget except single-oversize-doc bins, every doc lands in exactly
    one bin, and the output is rerun-deterministic."""
    docs = Catalog(spark, sf_dir)["documents"].select(
        "doc_id",
        F.size(F.split(F.col("text"), "\\s+")).alias("token_count"),
    )
    return pack_documents(docs, budget=256, n_shards=8)
