"""Laws for the bootstrapped NB quality filter
(operators/nb_classifier.py, staged q_quality_nb_filter — distinct from
the live r7-signed q_quality_classifier, a hashed-logistic trainer):

1. the seed label is the heuristic sigmoid's > 1/2 decision, verified
   against the FLOAT formula on texts spanning both classes;
2. exactness: llr_fp / keep reproduce a from-scratch pure-Python
   recomputation EXACTLY (integers, not approximately) — the property
   the fixed-point design exists for;
3. separation: tokens exclusive to seed-positive docs get positive
   weights and lift scores above stopword-heavy docs;
4. OOV: a document of only sub-min_df tokens scores llr_fp = 0 and is
   decided by the prior alone;
5. partition invariance: the classifier is a pure function of the
   corpus multiset, not its physical layout.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_integration_spark.operators.nb_classifier import (
    nb_quality_classifier,
    seed_quality_label,
)

# stopword-heavy texts land label 0; marker-free prose lands label 1
_POS = [
    "solid reproducible engineering notes with careful measurement",
    "careful measurement beats careful guessing in engineering notes",
    "reproducible engineering beats measurement theater every time",
    "solid notes with careful reproducible measurement discipline",
]
_NEG = [
    "it is the a the a the a the a the a the a the end",
    "the a the a the a the a the a the a the a the a junk",
    "a the a the a the a the a the a the a the a the filler",
]


def _docs(spark):
    rows = [(i, t) for i, t in enumerate(_POS + _NEG)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _float_label(text: str) -> int:
    nc = len(text)
    nt = len(text.split(" "))
    n_the = (nc - len(text.replace(" the ", ""))) / 6
    n_a = (nc - len(text.replace(" a ", ""))) / 3
    avg_tok = (nc - nt + 1.0) / nt
    stop = (n_the + n_a) / nt
    z = 0.005 * nt + 0.2 * avg_tok - 2.0 * stop
    return int(1.0 / (1.0 + math.exp(-z)) > 0.5)


def test_seed_label_matches_float_heuristic(spark):
    df = _docs(spark).select(
        "doc_id", "text", seed_quality_label().alias("lab")
    )
    got = {r["doc_id"]: r["lab"] for r in df.collect()}
    texts = dict(enumerate(_POS + _NEG))
    want = {i: _float_label(t) for i, t in texts.items()}
    assert got == want
    assert set(want.values()) == {0, 1}  # both classes are exercised


def _python_reference(texts: dict[int, str], min_df: int = 3):
    """From-scratch recomputation with the SAME double ops the engines
    run (math.log == libm), fixed-point rounded the same way."""
    lab = {i: _float_label(t) for i, t in texts.items()}
    toks = {i: [w for w in t.split(" ") if w] for i, t in texts.items()}
    cnt: dict[str, list[int]] = {}
    for i, ws in toks.items():
        for w in ws:
            c = cnt.setdefault(w, [0, 0])
            c[lab[i]] += 1
    vocab = {w: c for w, c in cnt.items() if sum(c) >= min_df}
    v = len(vocab)
    big1 = sum(c[1] for c in vocab.values())
    big0 = sum(c[0] for c in vocab.values())
    w_fp = {
        w: round(
            (
                math.log((c[1] + 0.5) / (big1 + 0.5 * v))
                - math.log((c[0] + 0.5) / (big0 + 0.5 * v))
            )
            * 1e6
        )
        for w, c in vocab.items()
    }
    n_pos = sum(lab.values())
    n_neg = len(lab) - n_pos
    prior_fp = round(math.log((n_pos + 0.5) / (n_neg + 0.5)) * 1e6)
    out = {}
    for i, ws in toks.items():
        llr = sum(w_fp.get(w, 0) for w in ws)
        out[i] = (
            len(ws),
            llr,
            int(prior_fp * len(ws) + llr > 0),
        )
    return out, w_fp, prior_fp


def test_exact_fixed_point_match_and_separation(spark):
    texts = dict(enumerate(_POS + _NEG))
    want, w_fp, _prior = _python_reference(texts)
    got = {
        r["doc_id"]: (r["n_tok"], r["llr_fp"], r["keep"], r["prob"])
        for r in nb_quality_classifier(_docs(spark)).collect()
    }
    assert set(got) == set(want)
    for i, (n_tok, llr, keep) in want.items():
        gn, gl, gk, _ = got[i]
        assert (gn, gl, gk) == (n_tok, llr, keep), i
    # separation: positive-exclusive content tokens carry positive
    # weight, the stopword pair carries negative weight
    assert w_fp["careful"] > 0 and w_fp["the"] < 0 and w_fp["a"] < 0
    # every seed-positive doc outranks every seed-negative doc
    probs = {i: got[i][3] for i in got}
    assert min(probs[i] for i in range(len(_POS))) > max(
        probs[i] for i in range(len(_POS), len(_POS) + len(_NEG))
    )


def test_oov_only_doc_rides_the_prior(spark):
    texts = dict(enumerate(_POS + _NEG))
    extra_id = 99
    texts[extra_id] = "zzq xxv wwu"  # each token occurs once < min_df
    rows = [(i, t) for i, t in texts.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in nb_quality_classifier(df).collect()
    }
    _, _, prior_fp = _python_reference(texts)
    r = out[extra_id]
    assert r["llr_fp"] == 0
    assert r["keep"] == int(prior_fp * r["n_tok"] > 0)


def test_partition_invariance(spark):
    df = _docs(spark)
    a = sorted(map(tuple, nb_quality_classifier(df).collect()))
    b = sorted(
        map(tuple, nb_quality_classifier(df.repartition(7)).collect())
    )
    assert a == b
