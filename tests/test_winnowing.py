"""Winnowing fingerprint tests (q_winnowing_fingerprint /
q_winnowing_cross_dedup, corpus_ops.winnow_fingerprints).

Two layers beyond the DuckDB oracles:
- a pure-Python brute-force winnowing reference (independent of both
  engines) that the Spark extraction must reproduce fingerprint-set for
  fingerprint-set, Hypothesis-swept over random small documents;
- the Schleimer-Wilkerson-Aiken detection GUARANTEE pinned end to end:
  any shared word substring of length >= w + k - 1 must produce a shared
  fingerprint, so a planted copy must pair and the cross-corpus query
  must flag it.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_integration_spark.queries.corpus_ops import winnow_fingerprints

K, W = 4, 4


def _h60(gram: str) -> int:
    """The repo's portable 60-bit md5-prefix hash, restated in pure
    Python (the same arithmetic Spark's conv(substring(md5..)) and
    DuckDB's CAST('0x'||SUBSTRING(MD5..)) compute)."""
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int = K, w: int = W) -> set[int]:
    """Brute-force reference: k-gram hashes, every length-w window's
    minimum, distinct. Independent of window frames AND range joins."""
    words = text.split(" ")
    if len(words) < k:
        return set()
    hs = [_h60(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)]
    if len(hs) < w:
        return set()
    return {min(hs[s : s + w]) for s in range(len(hs) - w + 1)}


@settings(max_examples=25, deadline=None)
@given(
    seeds=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=5),
    n_words=st.integers(0, 30),
)
def test_spark_extraction_matches_bruteforce(spark, seeds, n_words):
    """winnow_fingerprints == the pure-Python reference on random small
    documents (including sub-k and sub-window lengths, which must yield
    EMPTY fingerprint sets, and repeated words that force hash ties)."""
    import random

    rows = []
    for i, seed in enumerate(seeds):
        rng = random.Random(seed)
        text = " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "x"])
            for _ in range(n_words)
        )
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {i: set() for i, _ in rows}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got[r.doc_id].add(r.h)
    want = {i: _winnow_py(t) for i, t in rows}
    assert got == want


def test_detection_guarantee_and_cross_pairing(spark):
    """The SWA guarantee, end to end: doc 1 (new) embeds a 12-word span
    copied from doc 100 (old) — far longer than w + k - 1 = 7 — inside
    otherwise-unrelated text, so they MUST share >= 2 fingerprints and
    q_winnowing_cross_dedup's pairing policy must emit exactly the
    (new=1, old=100) pair; the unrelated new doc 2 must pair with
    nothing."""
    span = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, "totally different lead in words " + span + " and some trailing junk"),
        (2, "nothing here resembles anything else in this corpus at all today"),
        (100, "archive header text " + span + " archive footer text"),
        (101, "another old document with completely unrelated content inside"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fpd = winnow_fingerprints(df, k=K, w=W)
    sets = {i: set() for i, _ in rows}
    for r in fpd.collect():
        sets[r.doc_id].add(r.h)
    shared = sets[1] & sets[100]
    assert len(shared) >= 2, "guarantee violated: long copied span lost"
    assert not (sets[2] & sets[100]) and not (sets[2] & sets[101])
    # the cross pairing policy (new < 60 x old >= 60, >= 2 shared)
    new = fpd.filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("new_doc"), "h"
    )
    old = fpd.filter(F.col("doc_id") >= 60).select(
        F.col("doc_id").alias("old_doc"), "h"
    )
    pairs = (
        new.join(old, "h")
        .groupBy("new_doc", "old_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .collect()
    )
    assert [(r.new_doc, r.old_doc) for r in pairs] == [(1, 100)]


def test_df_cap_keeps_true_positives_at_realistic_boilerplate_density(spark):
    """VERDICT r10 #6: the pairing stage's document-frequency cap (drop
    fingerprints present in > 45 docs) must evict BOILERPLATE without
    evicting TRUE positives, at sf0.1-realistic document lengths
    (10-100 words, ~54 avg) and boilerplate density (a shared header on
    every doc — df ~ corpus size, far above the cap).

    Fixture: 300 docs, each = common 10-word header + unique random body
    (vocab large enough that cross-doc 4-gram collisions are effectively
    impossible); doc 10 (new side) embeds a 20-word span copied from doc
    200 (old side). Asserts:
    - the planted pair survives the cap (its span fingerprints have df=2);
    - header-only overlap creates NO pairs (the cap evicted it);
    - the planted pair is the ONLY pair the registered policy emits."""
    import random

    rng = random.Random(411)
    vocab = [f"tok{i}" for i in range(6000)]
    header = "terms of service apply to all content on this site"
    span = " ".join(f"planted{i}" for i in range(20))

    rows = []
    for d in range(300):
        n_body = rng.randint(10, 90)
        body = " ".join(rng.choice(vocab) for _ in range(n_body))
        if d == 10:
            words = body.split(" ")
            mid = len(words) // 2
            body = " ".join(words[:mid]) + " " + span + " " + " ".join(words[mid:])
        if d == 200:
            body = span + " " + body
        rows.append((d, header + " " + body))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    DF_CAP = 45
    fpd = winnow_fingerprints(df, k=K, w=W)
    hot = (
        fpd.groupBy("h")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > DF_CAP)
        .select("h")
    )
    # the cap actually fires: the header's fingerprints are corpus-hot
    assert hot.count() >= 1, "fixture broken: no boilerplate-hot hashes"
    kept = fpd.join(F.broadcast(hot), "h", "left_anti")
    new = kept.filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("new_doc"), "h"
    )
    old = kept.filter(F.col("doc_id") >= 60).select(
        F.col("doc_id").alias("old_doc"), "h"
    )
    pairs = (
        new.join(old, "h")
        .groupBy("new_doc", "old_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .collect()
    )
    assert [(r.new_doc, r.old_doc) for r in pairs] == [(10, 200)], (
        "df-cap recall broken: expected exactly the planted (10, 200) pair"
    )
    got = next(r.n_shared for r in pairs)
    # the 20-word span yields >= 2 surviving shared fingerprints with margin
    assert got >= 2
