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


def _round_half_up(x: float) -> int:
    """F.round / DuckDB ROUND semantics (half AWAY from zero) — Python's
    built-in round() is banker's (half-to-even), so an exact .5e-6 tie in
    a log-odds value would diverge even when the engines agree (ADVICE
    r13). Sign-symmetric floor(|x| + 0.5)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


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
        w: _round_half_up(
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
    prior_fp = _round_half_up(math.log((n_pos + 0.5) / (n_neg + 0.5)) * 1e6)
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


def test_single_corpus_scan_via_exchange_reuse(spark):
    """VERDICT r13 #4: the classifier's contingency, prior, and scoring
    branches must all read ONE shared (doc, label, tok) aggregation —
    the corpus text scanned (and the label regexes run) exactly once.
    The construction is deliberately reuse-safe (NULL sentinel rows, no
    pushable key filters, coalesced join keys so the left-outer join
    can't infer isnotnull(tok) into the weights branch); this pins the
    resulting plan shape so an optimizer-rule or refactor regression
    that silently forks the scan fails here, not at the sf100
    rehearsal. Uses the registered parquet query so the scan is a real
    FileScan (an in-memory localRelation wouldn't exercise reuse)."""
    from data_integration_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["q_quality_nb_filter"](spark, "/root/testdata/sf0.001")
    df.collect()  # AQE exchange reuse is decided at runtime
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("+- == Initial Plan ==")[0]
    )
    assert final.count("documents.parquet") == 1, final
    assert final.count("ReusedExchange") >= 2, final


def test_token_less_document_counts_in_prior_not_output(spark):
    """The NULL-sentinel construction must keep a document with no real
    tokens visible to the PRIOR (the oracle's `lab` CTE counts every
    document) while excluding it from the scored output (the oracle's
    `dt` CTE only sees real-token rows)."""
    texts = dict(enumerate(_POS + _NEG))
    rows = [(i, t) for i, t in texts.items()] + [(777, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in nb_quality_classifier(df, include_prior=True).collect()
    }
    assert 777 not in out  # no real tokens -> not scored
    # the prior shifts vs the corpus without doc 777: label("") = 0 adds
    # one negative -> prior_fp must match the reference computed WITH it,
    # asserted as the EXACT integer (include_prior emits the fixed-point
    # prior; the pre-r15 prob-tolerance fallback was dead code — ADVICE
    # r14)
    texts_with = dict(texts)
    texts_with[777] = ""
    _, _, prior_with = _python_reference(texts_with)
    some = next(iter(out.values()))
    assert some["prior_fp"] == prior_with


def test_null_label_counts_as_negative(spark):
    """A NULL seed label (NULL text, or caller NULLs in label=) must
    count as NEGATIVE everywhere — the oracle's CASE … ELSE 0 and the
    pre-r14 count-minus-sum arithmetic (r14 review finding: the
    weighted-sum rewrites would otherwise skip NULL rows, shifting the
    prior and every token weight). A NULL-text doc contributes no
    tokens, so the ONLY change vs the base corpus is one extra negative
    in the prior — verified against the reference with that negative
    injected by hand."""
    texts = dict(enumerate(_POS + _NEG))
    rows = [(i, t) for i, t in texts.items()]
    df_with_null = spark.createDataFrame(
        rows + [(555, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in nb_quality_classifier(df_with_null).collect()
    }
    assert 555 not in got  # no real tokens -> not scored
    want, _w_fp, _ = _python_reference(texts)
    lab = {i: _float_label(t) for i, t in texts.items()}
    n_pos = sum(lab.values())
    n_neg = len(lab) - n_pos + 1  # + the NULL doc, counted negative
    prior_fp = _round_half_up(math.log((n_pos + 0.5) / (n_neg + 0.5)) * 1e6)
    for i, (n_tok, llr, _k) in want.items():
        r = got[i]
        assert (r["n_tok"], r["llr_fp"]) == (n_tok, llr), i
        z = (prior_fp + llr / n_tok) / 1e6
        # tolerance, not exact ==: Python round() is banker's vs
        # F.round's HALF_UP, and JVM exp can differ by 1 ulp (the same
        # reason _round_half_up exists — review pass 2)
        assert abs(r["prob"] - 1.0 / (1.0 + math.exp(-z))) <= 1e-6, i
        assert r["keep"] == int(prior_fp * n_tok + llr > 0), i


def test_token_hash_collision_free_on_every_driver_sf():
    """The r15 shuffle-byte cut dictionary-encodes the shared (doc, tok)
    exchange's token key to xxhash64 BIGINTs (VERDICT r14 #4). Identity
    under the hash is what makes the refactor result-preserving, so —
    the pinned-centroid-margin discipline — this pins, on every driver
    SF's ACTUAL vocabulary: (1) zero xxhash64 collisions between
    distinct tokens (a collision would merge two tokens' contingency
    counts and shift their weights), and (2) no real token hashes to
    the -1/-2 join-key sentinels (which would let a NULL sentinel row
    equi-join a real weight). If the testdata ever changes, this
    re-derives the exactness argument or fails loudly BEFORE an oracle
    flake would. DuckDB computes the token sets (no Spark dependency:
    the pin must hold independent of the code under test); xxhash64 is
    recomputed with PySpark's own hash on a literal frame."""
    import duckdb

    from pyspark.sql import functions as F

    from data_integration_spark.session import get_spark

    spark = get_spark(app_name="nb-hash-pin", shuffle_partitions=8)
    for sf in ("0.001", "0.01", "0.1"):
        toks = [
            r[0]
            for r in duckdb.sql(
                "SELECT DISTINCT tok FROM (SELECT unnest(string_split"
                f"(text, ' ')) AS tok FROM '/root/testdata/sf{sf}/"
                "documents.parquet') WHERE tok <> ''"
            ).fetchall()
        ]
        df = spark.createDataFrame(
            [(t,) for t in toks], "tok string"
        ).select("tok", F.xxhash64("tok").alias("h"))
        agg = df.agg(
            F.countDistinct("tok").alias("nt"),
            F.countDistinct("h").alias("nh"),
            F.sum(F.col("h").isin(-1, -2).cast("long")).alias("sentinel"),
        ).first()
        assert agg["nt"] == len(toks) == agg["nh"], (sf, agg)
        assert agg["sentinel"] == 0, sf
