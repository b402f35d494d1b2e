"""q_fuzzy_match blocking contract: the composite key (source ×
length-band × first-token) must keep per-block cardinality bounded even on
an adversarial corpus where EVERY doc shares one `source` value — the
exact shape that made the r3 source-only blocking all-pairs (VERDICT r3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_integration_spark.queries.pipeline_extra import fuzzy_block_key


def _adversarial_corpus(spark, n=600):
    """One source; ~30 first tokens × ~5 length bands of organic variation."""
    rows = []
    words = [f"w{i}" for i in range(30)]
    for i in range(n):
        tok = words[i % len(words)]
        # (i // 30) % 5 decorrelates band from token (i % 5 would alias
        # with i % 30, collapsing the fan-out to one band per token)
        body = " ".join(
            f"t{(i * 7 + j) % 97}" for j in range(10 + ((i // 30) % 5) * 8)
        )
        rows.append({"doc_id": i, "source": "web", "text": f"{tok} {body}"})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_single_source_blocks_stay_bounded(spark):
    docs = _adversarial_corpus(spark)
    blocks = (
        fuzzy_block_key(docs)
        .groupBy("source", "len_band", "tok0")
        .count()
    )
    stats = blocks.agg(
        F.max("count").alias("max_block"), F.count("*").alias("n_blocks")
    ).collect()[0]
    n = docs.count()
    # source-only blocking would put all 600 docs in ONE block (≈180k
    # pairs); the composite key must fan out into many small blocks.
    assert stats.n_blocks >= 30, stats
    assert stats.max_block <= n // 20, (
        f"hot block of {stats.max_block} rows out of {n} — blocking too coarse"
    )


def test_pair_count_is_subquadratic(spark):
    docs = _adversarial_corpus(spark)
    d = fuzzy_block_key(docs)
    a = d.select(
        F.col("doc_id").alias("doc_a"), "source", "len_band", "tok0"
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), "source", "len_band", "tok0"
    )
    pairs = (
        a.join(b, ["source", "len_band", "tok0"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .count()
    )
    n = docs.count()
    all_pairs = n * (n - 1) // 2
    assert pairs < all_pairs // 50, (
        f"{pairs} candidate pairs vs {all_pairs} all-pairs — blocking buys <50×"
    )
