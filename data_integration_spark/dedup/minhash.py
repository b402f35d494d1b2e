"""MinHash + banded LSH near-duplicate detection.

Pipeline (all native expressions, no Python in the hot path):
  shingle (word n-grams) → k min-hashes via seeded xxhash64 → band the
  signature → explode bands → groupBy (band, band_hash) buckets → candidate
  pairs within buckets → exact Jaccard verification on candidates only.

Scale: the corpus is touched twice (shingling, verification); the shuffle
volume is k·|docs| signature entries + candidate pairs — never the O(N²)
pair space. Band/row parameters trade recall for candidate volume exactly
as in the standard S-curve; defaults target Jaccard ≳ 0.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, shingle) long table of distinct word n-grams."""
    # try_element_at: docs shorter than n tokens must yield NULL (filtered
    # below), not an ANSI out-of-bounds error that kills the job
    concat_parts = ", ' ', ".join(f"try_element_at(ts, i + {j})" for j in range(n))
    expr = (
        f"array_distinct(transform(sequence(1, greatest(size(ts) - {n - 1}, 1)),"
        f" i -> concat({concat_parts})))"
    )
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("ts"))
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("shingle"))
        # docs with fewer than n tokens produce NULL shingles (element_at
        # past the end) — drop them rather than hashing NULL
        .filter(F.col("shingle").isNotNull())
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 2,
    k: int = 64,
    seed: int = 1,
) -> DataFrame:
    """Per-doc MinHash signature: for each of k hash functions, the min of
    ``xxhash64(shingle, salt_j)`` over the doc's shingles — one groupBy, k
    ``min`` aggregates (map-side partials make this one narrow shuffle)."""
    sh = shingle_df(df, id_col, text_col, n_gram)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed * 1000 + j))).alias(f"h{j}")
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_cross_pairs(
    new_df: DataFrame,
    old_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 2,
    k: int = 64,
    bands: int = 16,
    seed: int = 1,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """CROSS-corpus near-dup: (new_id, old_id, jaccard) pairs where a NEW
    document near-duplicates an OLD one — the batch incremental-dedup path
    (dedup crawl N against releases 1..N−1) that complements the exact
    cross-shard hash anti-join and the streaming signature dedup.

    Same banded-LSH shape as ``minhash_lsh_pairs`` but candidates only form
    ACROSS the corpus boundary (new×old inside a bucket, never new×new or
    old×old), so candidate volume tracks cross-corpus near-dup density. At
    100 TB the old side's buckets are computed once per release and
    persisted; only the new shard is re-shingled.
    """
    assert k % bands == 0
    rows = k // bands
    tagged = new_df.select(
        F.col(id_col), F.col(text_col), F.lit(True).alias("_is_new")
    ).unionByName(
        old_df.select(
            F.col(id_col), F.col(text_col), F.lit(False).alias("_is_new")
        )
    )
    sig = minhash_signatures(tagged, id_col, text_col, n_gram, k, seed)
    side = tagged.select(id_col, "_is_new")
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                    "bh"
                ),
            )
            for b in range(bands)
        ]
    )
    buckets = (
        sig.join(side, id_col)
        .select(F.col(id_col), "_is_new", F.explode(band_cols).alias("bb"))
        .select(
            F.col(id_col),
            "_is_new",
            F.col("bb.band").alias("band"),
            F.col("bb.bh").alias("bh"),
        )
    )
    left = buckets.filter(F.col("_is_new")).select(
        F.col(id_col).alias("new_id"), "band", "bh"
    )
    right = buckets.filter(~F.col("_is_new")).select(
        F.col(id_col).alias("old_id"), "band", "bh"
    )
    cand = (
        left.join(right, ["band", "bh"]).select("new_id", "old_id").distinct()
    )
    # exact verification on candidates only (same as the within-corpus path)
    sh = shingle_df(tagged, id_col, text_col, n_gram)
    sizes = sh.groupBy(id_col).agg(F.countDistinct("shingle").alias("sz"))
    s1 = sh.select(F.col(id_col).alias("new_id"), F.col("shingle"))
    s2 = sh.select(F.col(id_col).alias("old_id"), F.col("shingle"))
    inter = (
        cand.join(s1, "new_id")
        .join(s2, ["old_id", "shingle"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("new_id"), F.col("sz").alias("sz1")),
            "new_id",
        )
        .join(
            sizes.select(F.col(id_col).alias("old_id"), F.col("sz").alias("sz2")),
            "old_id",
        )
        .select("new_id", "old_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sig",
    n_gram: int = 2,
    k: int = 16,
    seed: int = 1,
) -> DataFrame:
    """STATELESS per-row MinHash signature: one 64-bit hash of the k
    per-row min-hashes — no explode, no groupBy, NO SHUFFLE. The shingle
    set stays an array inside the row and each min-hash is an
    ``array_min(transform(...))`` over it.

    This is the streaming-safe form (``q_streaming_minhash_dedup``): a
    file/Kafka stream computes it per micro-batch row and feeds
    ``dropDuplicates`` directly — the only state is the dedup operator's
    signature set, the incremental registry of everything the growing
    corpus has seen. Batch callers get the identical value, so
    stream-vs-batch equivalence is exact (tests/test_index_persist.py).

    Degenerate rows (fewer than ``n_gram`` tokens → empty shingle set)
    all collapse to the same all-NULL signature — empty docs dedup to one
    survivor, the curation semantics you want anyway.
    """
    concat_parts = ", ' ', ".join(
        f"try_element_at(_mh_ts, i + {j})" for j in range(n_gram)
    )
    shingles = (
        f"filter(array_distinct(transform("
        f" sequence(1, greatest(size(_mh_ts) - {n_gram - 1}, 1)),"
        f" i -> concat({concat_parts}))), s -> s IS NOT NULL)"
    )
    out = df.withColumn("_mh_ts", F.split(F.col(text_col), " ")).withColumn(
        "_mh_sh", F.expr(shingles)
    )
    min_cols = [
        F.array_min(
            F.transform(F.col("_mh_sh"), lambda s, j=j: F.xxhash64(s, F.lit(seed * 1000 + j)))
        )
        for j in range(k)
    ]
    return out.withColumn(out_col, F.xxhash64(*min_cols)).drop("_mh_ts", "_mh_sh")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 2,
    k: int = 64,
    bands: int = 16,
    seed: int = 1,
    verify_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact shingle Jaccard.

    Returns (d1, d2, jaccard) with jaccard ≥ verify_threshold — candidates
    that fail exact verification are dropped, so precision is exact and only
    recall depends on (k, bands).

    ``max_bucket_size`` caps the candidate blow-up of degenerate buckets
    (e.g. thousands of near-empty or identical docs landing in one band
    bucket, whose pair space is quadratic in the bucket size): buckets over
    the cap are SPLIT into ceil(size/cap) salted sub-buckets, bounding
    candidates at O(size·cap) instead of O(size²). The salt is a
    deterministic per-doc hash (the same split in every band — a
    band-varying salt would restore near-quadratic volume across bands when
    every band is degenerate). Recall trade: pairs across sub-buckets of a
    degenerate bucket are lost; that regime is overwhelmingly identical /
    near-empty documents, which the exact-dedup stage (run first in the
    curation pipeline) already collapses. ``None`` disables the cap."""
    assert k % bands == 0
    rows = k // bands
    sig = minhash_signatures(df, id_col, text_col, n_gram, k, seed)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(
                    "bh"
                ),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select(F.col(id_col), F.explode(band_cols).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    join_keys = ["band", "bh"]
    if max_bucket_size is not None:
        sizes_b = buckets.groupBy("band", "bh").agg(F.count("*").alias("_bsz"))
        n_sub = F.ceil(F.col("_bsz") / F.lit(max_bucket_size)).cast("long")
        buckets = (
            buckets.join(sizes_b, ["band", "bh"])
            .withColumn(
                "sub", F.pmod(F.xxhash64(F.col(id_col)), n_sub)
            )
            .drop("_bsz")
        )
        join_keys = ["band", "bh", "sub"]
    left = buckets.select(F.col(id_col).alias("d1"), *join_keys)
    right = buckets.select(F.col(id_col).alias("d2"), *join_keys)
    cand = (
        left.join(right, join_keys)
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # exact verification on candidates only
    sh = shingle_df(df, id_col, text_col, n_gram)
    sizes = sh.groupBy(id_col).agg(F.countDistinct("shingle").alias("sz"))
    s1 = sh.select(F.col(id_col).alias("d1"), F.col("shingle"))
    s2 = sh.select(F.col(id_col).alias("d2"), F.col("shingle"))
    inter = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    # sizes is one row per DOCUMENT — no broadcast hint (a forced hint would
    # driver-collect a corpus-sized table at scale; AQE broadcasts only
    # while it genuinely fits)
    return (
        inter.join(sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1")), "d1")
        .join(sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2")), "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )
