"""Exact deduplication: hash-groupBy on a content fingerprint.

100 TB shape: never group on raw text — fingerprint first (md5/xxhash64 of
normalized content), groupBy the 16-byte key, keep min id. The shuffle
carries (hash, id) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    return F.lower(F.regexp_replace(col, r"\s+", " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    normalized: bool = False,
) -> DataFrame:
    """One row per distinct content: (fingerprint, keep_id, n_copies)."""
    content = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(content).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def drop_exact_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Return the deduplicated corpus (keeps the min-id representative) —
    a semi-join of the corpus against the keeper set."""
    keep = exact_dedup(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")
