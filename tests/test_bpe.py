"""BPE merge-training semantics (q_bpe_train is rows-only — the
engine-independent ground truth here plus the q_bpe_invariants
certificate ARE its correctness contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_spark.operators.bpe import (
    apply_merges,
    chars_column,
    train_bpe,
)


def py_bpe(word_freq: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference BPE (Sennrich et al. 2016 get_stats/merge loop), pure
    Python — same tie-break as the Spark trainer: count desc, then
    (left, right) ascending."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            pend = None
            for x in syms:
                if pend is None:
                    pend = x
                elif pend == left and x == right:
                    out.append(left + right)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges, vocab


def _train(spark, wf: dict[str, int], n: int, **kw):
    words = spark.createDataFrame(
        [(w, f) for w, f in wf.items()], "word string, freq long"
    )
    merges, final = train_bpe(words, n, **kw)
    rows = {r["word"]: (tuple(r["syms"]), r["freq"]) for r in final.collect()}
    final.unpersist()
    return merges, rows


WF = {
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "lowest": 4,
    "new": 7,
    "wide": 2,
}


def test_merge_table_matches_pure_python_ground_truth(spark):
    gm, gv = py_bpe(WF, 10)
    merges, rows = _train(spark, WF, 10)
    assert merges == gm
    # final vocab states agree word-for-word (the python reference keys
    # by symbol tuple; regroup the spark rows the same way)
    spark_vocab: dict[tuple[str, ...], int] = {}
    for _w, (syms, f) in rows.items():
        spark_vocab[syms] = spark_vocab.get(syms, 0) + f
    assert spark_vocab == gv


def test_greedy_left_to_right_overlap_semantics(spark):
    # 'aaa' under merge (a,a): greedy non-overlapping -> [aa, a]
    merges, rows = _train(spark, {"aaa": 3, "aa": 2}, 1)
    assert merges == [(1, "a", "a", 3 * 2 + 2 * 1)]
    assert rows["aaa"][0] == ("aa", "a")
    assert rows["aa"][0] == ("aa",)


def test_early_termination_below_min_count(spark):
    # every adjacent pair occurs exactly once -> min_count=2 learns nothing
    merges, rows = _train(spark, {"ab": 1, "cd": 1}, 5, min_count=2)
    assert merges == []
    assert rows["ab"][0] == ("a", "b")


def test_single_char_words_contribute_no_pairs(spark):
    merges, rows = _train(spark, {"a": 100, "bc": 3}, 2)
    assert merges == [(1, "b", "c", 3)]
    assert rows["a"][0] == ("a",)
    assert rows["bc"][0] == ("bc",)


def test_encode_replay_equals_training_state(spark):
    gm, _ = py_bpe(WF, 10)
    words = spark.createDataFrame(
        [(w, f) for w, f in WF.items()], "word string, freq long"
    )
    merges, final = train_bpe(words, 10)
    enc = apply_merges(
        words.select("word", chars_column("word").alias("syms")), merges
    )
    trained = {r["word"]: r["syms"] for r in final.collect()}
    replayed = {r["word"]: r["syms"] for r in enc.collect()}
    final.unpersist()
    assert merges == gm
    assert trained == replayed


def test_roundtrip_reconstructs_words(spark):
    words = spark.createDataFrame(
        [(w, f) for w, f in WF.items()], "word string, freq long"
    )
    merges, final = train_bpe(words, 6)
    bad = (
        final.select("word", F.concat_ws("", "syms").alias("j"))
        .filter(F.col("j") != F.col("word"))
        .count()
    )
    final.unpersist()
    assert bad == 0


def test_substring_dedup_edge_semantics_on_fixture_corpus(spark, tmp_path):
    """Run the REAL registered substring-dedup queries on an adversarial
    mini corpus: sub-span-length docs (Spark's sequence(1, 0) DESCENDS,
    so the gram builder's size guard is load-bearing), an exact dup pair
    (earliest doc keeps its text, the later one empties), and a clean
    long doc."""
    from data_integration_spark.queries import QUERIES, load_all

    load_all()
    rows = [
        (1, "a b", "en", "src0", 3),                      # too short for a gram
        (2, "p q r s t u v w", "en", "src0", 15),         # earliest dup
        (3, "p q r s t u v w", "en", "src1", 15),         # later dup: empties
        (4, "k l m n o k2 l2 m2", "en", "src1", 18),      # clean long doc
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "mini")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    stats = {
        r["doc_id"]: r
        for r in QUERIES["q_substring_dedup"](spark, sf_dir).collect()
    }
    assert stats[1]["n_dup_tokens"] == 0 and stats[1]["n_tokens"] == 2
    assert stats[2]["n_dup_tokens"] == 8  # fully covered (8 tokens, span 5)
    assert stats[3]["n_dup_tokens"] == 8
    assert stats[4]["n_dup_tokens"] == 0

    cleaned = {
        r["doc_id"]: r
        for r in QUERIES["q_substring_dedup_apply"](spark, sf_dir).collect()
    }
    assert cleaned[2]["cleaned_text"] == "p q r s t u v w"  # earliest kept
    assert cleaned[3]["cleaned_text"] == "" and cleaned[3]["n_removed"] == 8
    assert cleaned[1]["n_removed"] == 0 and cleaned[4]["n_removed"] == 0
