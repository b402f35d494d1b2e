"""Value-level semantics for the ER-blocking / retrieval-fusion block
(er_retrieval.py): prefix-filter exact recall against a pure-Python brute
force on an adversarial fixture corpus, multi-ordering global ranks vs
Spark's own global window, Welch's t vs a NumPy recomputation, and the
sorted-neighborhood recall contract (adjacent dups caught, first-char
edits legitimately missed)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_integration_spark.queries import QUERIES, load_all

load_all()

SF_SMALL = "/root/testdata/sf0.001"


def _trigrams(text: str) -> set[str]:
    ts = text.split(" ")
    return {
        " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
    }


def _brute_setsim(texts: dict[int, str], t_num=1, t_den=2):
    """All pairs with J >= t over trigram sets (df-cap high enough not to
    bind on fixtures), as (a, b) -> (inter, s1, s2)."""
    sets = {d: _trigrams(x) for d, x in texts.items()}
    sets = {d: s for d, s in sets.items() if s}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sets[a] & sets[b])
            s1, s2 = len(sets[a]), len(sets[b])
            # J >= 1/2  <=>  (1+t)*c >= t*(s1+s2)  with t=1/2: 3c >= s1+s2
            if c and 3 * c >= s1 + s2:
                out[(a, b)] = (c, s1, s2)
    return out


def _write_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    rows = [
        (d, x, "en", "fixture", len(x)) for d, x in sorted(texts.items())
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "mini")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_setsim_exact_recall_on_adversarial_corpus(spark, tmp_path):
    """Pairs engineered to straddle the threshold: identical (J=1),
    exactly at J=1/2 (3c == s1+s2 must be INCLUDED — >= not >), just
    below, and a short doc with no trigrams. The operator must equal the
    brute force exactly — prefix filtering is a recall THEOREM, not a
    heuristic."""
    base = "aa bb cc dd ee ff gg hh"          # 6 trigrams
    texts = {
        1: base,
        2: base,                               # J(1,2) = 1
        # shares a 5-trigram prefix run with base after one tail edit
        3: "aa bb cc dd ee ff gg zz",
        # disjoint vocabulary
        4: "pp qq rr ss tt uu vv ww",
        # too short for any trigram — must vanish from the pair space
        5: "xx yy",
        # half-overlap corner: sets sized to land exactly on 3c == s1+s2
        6: "aa bb cc dd m1 m2 m3 m4 m5 m6",
    }
    expected = _brute_setsim(texts)
    assert (1, 2) in expected  # the fixture really exercises J=1
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter_size"],
            r["size_a"],
            r["size_b"],
        )
        for r in QUERIES["q_setsim_prefix_join"](spark, sf_dir).collect()
    }
    assert got == expected


def test_setsim_threshold_uses_integer_arithmetic(spark, tmp_path):
    """A pair at exactly J = 1/2: c=4 shared trigrams, sizes 6 and 6
    (3*4 = 12 >= 6+6) must be emitted with jaccard 0.5 — a float
    comparison 'c/(s1+s2-c) >= 0.5' could go either way on other
    engines; the integer form cannot."""
    # 8 tokens -> 6 trigrams; docs share the first 6 tokens -> 4 shared
    texts = {
        1: "aa bb cc dd ee ff gg hh",
        2: "aa bb cc dd ee ff zz ww",
    }
    sets = {d: _trigrams(t) for d, t in texts.items()}
    c = len(sets[1] & sets[2])
    assert (len(sets[1]), len(sets[2]), c) == (6, 6, 4)
    assert 3 * c == len(sets[1]) + len(sets[2])  # exactly at threshold
    sf_dir = _write_docs(spark, tmp_path, texts)
    rows = QUERIES["q_setsim_prefix_join"](spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == 0.5


def test_prefix_length_formula():
    """p = s - ceil(t*s) + 1 for t = 1/2 equals the integer form
    s DIV 2 + 1 used in the plan, for every plausible set size."""
    import math

    for s in range(1, 200):
        assert s - math.ceil(s / 2) + 1 == s // 2 + 1


def test_range_row_number_multi_matches_global_window(spark):
    """Both rank columns of one multi call equal Spark's own global
    window ranks (tiny frame, single-task window is fine in a test)."""
    from data_integration_spark.operators.prefix import (
        range_row_number_multi,
    )

    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") * 37 % 101).alias("a"),
        (F.col("id") * 53 % 89).alias("b"),
    )
    got = range_row_number_multi(
        df,
        ["id"],
        [
            ([F.col("a").desc(), F.col("id")], "ra"),
            ([F.col("b"), F.col("id").desc()], "rb"),
        ],
        num_partitions=8,
    )
    wa = Window.orderBy(F.col("a").desc(), F.col("id"))
    wb = Window.orderBy(F.col("b"), F.col("id").desc())
    want = df.select(
        "id",
        F.row_number().over(wa).cast("long").alias("ra"),
        F.row_number().over(wb).cast("long").alias("rb"),
    )
    got_m = {r["id"]: (r["ra"], r["rb"]) for r in got.collect()}
    want_m = {r["id"]: (r["ra"], r["rb"]) for r in want.collect()}
    assert got_m == want_m


def test_welch_against_numpy(spark):
    import pandas as pd

    row = QUERIES["q_welch_ttest"](spark, SF_SMALL).collect()[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    x = ev.loc[ev.event_type == "purchase", "value"].to_numpy()
    y = ev.loc[ev.event_type == "click", "value"].to_numpy()
    v1, v2 = x.var(ddof=1), y.var(ddof=1)
    se2 = v1 / len(x) + v2 / len(y)
    t = (x.mean() - y.mean()) / np.sqrt(se2)
    dfw = se2**2 / (
        (v1 / len(x)) ** 2 / (len(x) - 1)
        + (v2 / len(y)) ** 2 / (len(y) - 1)
    )
    assert row["n1"] == len(x) and row["n2"] == len(y)
    assert row["t_stat"] == pytest.approx(t, abs=5e-6)
    assert row["df_welch"] == pytest.approx(dfw, rel=1e-6)
    # the difference is real on this data — the statistic is value-live
    assert abs(row["t_stat"]) > 0.1


def test_sorted_neighborhood_recall_contract(spark, tmp_path):
    """Exact duplicates sort adjacent and MUST be caught (lev 0); a
    first-character edit jumps the sort order and is legitimately missed
    — the documented locality bound of the method."""
    filler = [
        f"{c}{c2} doc number {c}{c2} with some words"
        for c in "abcdefghijklmnoprstuvwxy"
        for c2 in "14"
    ]
    texts = {i: t for i, t in enumerate(filler)}
    texts[100] = "kk identical text here"
    texts[101] = "kk identical text here"           # exact dup of 100
    texts[102] = "qq same tail but far first char"
    texts[103] = "zz same tail but far first char"  # first-char edit
    sf_dir = _write_docs(spark, tmp_path, texts)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["lev"]
        for r in QUERIES["q_sorted_neighborhood"](spark, sf_dir).collect()
    }
    assert pairs.get((100, 101)) == 0
    assert (102, 103) not in pairs


def test_rank_fusion_is_top20_by_fused_score(spark):
    rows = QUERIES["q_rank_fusion"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        want = round(
            1.0 / (60 + r["rank_len"]) + 1.0 / (60 + r["rank_div"]), 6
        )
        assert r["rrf"] == pytest.approx(want, abs=1e-9)
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_multipass_second_key_buys_recall(spark, tmp_path):
    """The pair the single-pass method legitimately misses (first-char
    edit, shared tail) must be found by the REVERSED-key pass and
    flagged found_pass2-only; exact duplicates are found by both."""
    filler = [
        f"{c}{c2} doc number {c}{c2} with some words"
        for c in "abcdefghijklmnoprstuvwxy"
        for c2 in "14"
    ]
    texts = {i: t for i, t in enumerate(filler)}
    texts[100] = "kk identical text here"
    texts[101] = "kk identical text here"
    texts[102] = "qq same tail but far first char"
    texts[103] = "zz same tail but far first char"
    # a pair whose forward and reversed sort orders DISAGREE: forward
    # puts 104 ("ab…") before 105 ("ba…"); reversed text puts 105
    # ("w xiffus ab") before 104 ("x xiffus ba"). Both passes find it,
    # in opposite orientations — it must still collapse to ONE row
    # flagged (1, 1), not two rows with split pass flags.
    texts[104] = "ab suffix x"
    texts[105] = "ba suffix w"
    sf_dir = _write_docs(spark, tmp_path, texts)
    collected = QUERIES["q_sorted_neighborhood_multipass"](
        spark, sf_dir
    ).collect()
    keys = [(r["doc_a"], r["doc_b"]) for r in collected]
    assert len(keys) == len(set(keys)), "duplicate (doc_a, doc_b) rows"
    rows = {
        (r["doc_a"], r["doc_b"]): (
            r["lev"],
            r["found_pass1"],
            r["found_pass2"],
        )
        for r in collected
    }
    assert rows[(100, 101)][0] == 0
    assert rows[(100, 101)][1] == 1  # adjacent under the forward key
    lev, p1, p2 = rows[(102, 103)]
    assert (p1, p2) == (0, 1)  # ONLY the reversed key finds it
    assert lev == 2
    lev, p1, p2 = rows[(104, 105)]
    assert (p1, p2) == (1, 1)  # both passes, opposite orientations
    assert lev == 3


def test_tfidf_knn_matches_numpy(spark):
    import math
    import re
    from collections import Counter

    import pandas as pd

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    tf = {
        int(r.doc_id): Counter(re.findall(r"[a-z0-9]+", r.text))
        for r in docs.itertuples()
    }
    n_docs = len(docs)
    df_counts = Counter()
    for c in tf.values():
        df_counts.update(c.keys())
    w = {
        d: {
            t: cnt * math.log((1.0 + n_docs) / (1.0 + df_counts[t]))
            for t, cnt in c.items()
        }
        for d, c in tf.items()
    }
    nrm = {d: math.sqrt(sum(x * x for x in ws.values())) for d, ws in w.items()}
    want = {}
    for q in [d for d in w if d < 20]:
        scored = []
        for d in w:
            if d == q:
                continue
            dot = sum(w[q][t] * w[d][t] for t in w[q].keys() & w[d].keys())
            if dot > 0:
                scored.append((d, round(dot / (nrm[q] * nrm[d]), 6)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rk, (d, cos) in enumerate(scored[:3], start=1):
            want[(q, d)] = (cos, rk)
    got = {
        (r["query_doc"], r["neighbor_doc"]): (r["cosine"], r["rk"])
        for r in QUERIES["q_tfidf_knn"](spark, SF_SMALL).collect()
    }
    assert got == want
    assert len(got) >= 30  # 20 queries x top-3, minus degenerate queries


def test_salted_join_plan_is_shuffled_on_salted_keys(spark):
    from data_integration_spark.plans.explain import formatted_plan

    df = QUERIES["q_salted_join"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    # the join must key on BOTH columns — salt really spreads the rows
    assert "salt" in plan


def test_range_row_number_multi_three_orderings_heavy_ties(spark):
    """Three orderings in one call, with a constant column (maximal
    ties — the tie-break id must fully determine every rank) and an
    empty input (each rank column must still appear, NULL-typed)."""
    from data_integration_spark.operators.prefix import (
        range_row_number_multi,
    )

    df = spark.range(0, 300).select(
        F.col("id"),
        F.lit(7).alias("c"),                     # all-tied metric
        (F.col("id") % 5).alias("m"),            # 60-way ties
        (F.col("id") * 11 % 97).alias("u"),
    )
    got = range_row_number_multi(
        df,
        ["id"],
        [
            ([F.col("c"), F.col("id")], "rc"),
            ([F.col("m"), F.col("id").desc()], "rm"),
            ([F.col("u").desc(), F.col("id")], "ru"),
        ],
        num_partitions=8,
    )
    rows = {r["id"]: r for r in got.collect()}
    assert len(rows) == 300
    # all-tied metric: rank == id order exactly
    assert all(rows[i]["rc"] == i + 1 for i in range(300))
    # each rank column is a permutation of 1..300
    for col in ("rm", "ru"):
        assert sorted(r[col] for r in rows.values()) == list(
            range(1, 301)
        )
    # spot-check rm semantics: m asc, id desc
    want_rm = {
        rid: rk + 1
        for rk, rid in enumerate(
            sorted(range(300), key=lambda i: (i % 5, -i))
        )
    }
    assert all(rows[i]["rm"] == want_rm[i] for i in range(300))

    empty = df.filter(F.col("id") < 0)
    got_e = range_row_number_multi(
        empty, ["id"], [([F.col("m"), F.col("id")], "r1")],
        num_partitions=4,
    )
    assert got_e.count() == 0
    assert "r1" in got_e.columns
