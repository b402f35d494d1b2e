"""Bootstrapped Naive-Bayes document-quality classifier — the
pretraining-data "model-based quality filter" (CCNet, Wenzek et al.
2020; GPT-3 appendix A: score every candidate document with a linear
classifier trained to separate a seed "good" corpus from the raw crawl,
keep by threshold).

This is the repo's CLASSIFIER-based sibling of the heuristic
q_quality_score: the heuristic provides deterministic SEED labels, a
multinomial-NB training pass turns them into per-token log-odds weights
(the linear model fastText reduces to for unigram features), and a
scoring pass applies the broadcast weight table to every document.

Exactness design (the full-oracle contract): every decision is either
integer arithmetic or a scalar libm call on inputs both engines compute
bit-identically —

- the seed label is a SIGN TEST on 64-bit integers (the heuristic's
  sigmoid > 1/2 inequality multiplied through by its positive
  denominators), so no float ever decides a label;
- per-token weights are fixed-point BIGINTs: round(log_odds * 1e6) of a
  log-odds computed from exact integer counts (+0.5 Laplace terms, all
  exactly representable doubles), so the per-document reduction is an
  INTEGER sum — immune to reduction order by construction;
- the keep decision is again an integer sign test
  (prior_fp * n_tok + llr_fp > 0 ⟺ mean log-odds + prior > 0);
- only the reader-facing posterior probability touches libm exp, and it
  is rounded to the 6-decimal grid like every float output in the
  registry.

Scale shape (100 TB): the corpus text is scanned — and the label
regexes run — EXACTLY ONCE: label + tokenize + per-(doc, token) counts
land in one hash aggregation whose exchange the contingency, prior,
and scoring branches all reuse (Catalyst ReusedExchange; VERDICT r13
#4 measured the previous three-scan shape saturating a node's memory
bandwidth at the 1000× rehearsal). Downstream aggregations are
map-side combinable groupBys over the much smaller per-doc-distinct
frame, plus ONE token-keyed equi-join against the weight table — the
q_vocab_encode shape, broadcastable whenever the df-capped vocab is
small and AQE-skew-safe otherwise (hot stopword tokens are
partition-size skew only: the weight side is unique per token). Corpus
totals ride 1-row broadcast cross-joins, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for log-odds weights (6-decimal grid, as BIGINT)
FP_SCALE = 1_000_000


def seed_quality_label(text: Column = None) -> Column:
    """The heuristic quality sigmoid's > 1/2 decision as an integer sign
    test (q_quality_score's z = 0.005·nt + 0.2·avg_tok − 2·stop_ratio;
    z > 0 multiplied by 6000·nt > 0):

        30·nt² + 1200·(nc − nt + 1) − 2000·(nc − r_the) − 4000·(nc − r_a) > 0

    with nc = length(text), nt = size(split(text, ' ')), r_the / r_a =
    lengths after removing ' the ' / ' a ' — all 64-bit integers, so the
    label can never diverge across engines."""
    t = F.col("text") if text is None else text
    nc = F.length(t).cast("long")
    nt = F.size(F.split(t, " ")).cast("long")
    r_the = F.length(F.regexp_replace(t, " the ", "")).cast("long")
    r_a = F.length(F.regexp_replace(t, " a ", "")).cast("long")
    z6000nt = (
        30 * nt * nt
        + 1200 * (nc - nt + 1)
        - 2000 * (nc - r_the)
        - 4000 * (nc - r_a)
    )
    return (z6000nt > 0).cast("int")


def nb_quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 3,
    label: Column | None = None,
    include_prior: bool = False,
    include_label: bool = False,
) -> DataFrame:
    """Train-and-score in one lineage: seed labels → multinomial-NB
    per-token fixed-point log-odds → every document scored against the
    weight table. Returns (id, n_tok, llr_fp, prob, keep):

    - ``n_tok``   — non-empty token occurrences in the document;
    - ``llr_fp``  — Σ weight_fp over the document's in-vocab token
      occurrences (BIGINT; exact, order-free);
    - ``prob``    — σ(prior + mean log-odds), rounded to 6 decimals;
    - ``keep``    — the integer sign test prior_fp·n_tok + llr_fp > 0.

    ``min_df`` drops tokens with fewer total occurrences from the vocab
    (OOV tokens contribute weight 0 — they still count in ``n_tok``):
    the standard rare-feature cut, and at scale the knob that keeps the
    weight table broadcast-sized.  ``label`` overrides the seed-label
    column (any deterministic 0/1 Column) for classifier reuse beyond
    the heuristic bootstrap."""
    lab = seed_quality_label(F.col(text_col)) if label is None else label
    # a NULL label (NULL text, or a caller-supplied label Column with
    # NULLs) counts as NEGATIVE — the oracle's CASE … ELSE 0 semantics
    # and the pre-r14 count(*) − sum(label) arithmetic. The r14
    # weighted-sum rewrites (Σ c·label etc.) would otherwise SKIP the
    # NULL rows, silently shifting the prior and every token weight
    # (r14 review finding #3), so the NULL→0 collapse happens once here.
    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.coalesce(lab.cast("long"), F.lit(0)).alias("label"),
    )
    # ONE corpus pass (VERDICT r13 #4 — the sf100 rehearsal showed three
    # separate label-regex + tokenize scans saturating one node's memory
    # bandwidth): label + tokenize + per-(doc, token) counts land in a
    # single hash aggregation `dtc`, and the contingency, prior, AND
    # scoring branches all read it through Catalyst exchange reuse — the
    # corpus text is scanned (and the label regexes run) exactly once,
    # with no cache to manage (the q_countmin unpersist lesson, r12).
    #
    # Reuse only fires when every branch's copy of the subtree
    # CANONICALIZES IDENTICALLY, so the construction is deliberate:
    # - a NULL sentinel token is appended to EVERY document's token
    #   array, so per-doc facts (the prior's label counts) are readable
    #   from dtc's own rows without a per-doc re-aggregation (the
    #   sentinel group has c = 1 exactly — split() never emits NULL);
    # - no branch puts a FILTER on dtc's group keys (Catalyst pushes
    #   key predicates below the aggregate, forking the subtree): the
    #   NULL-row / real-row split lives inside aggregate CASE
    #   expressions, and the only post-agg filters test aggregate
    #   outputs (n >= min_df, n_tok > 0), which cannot push down;
    # - every branch consumes dtc's lone non-key output `c`, so column
    #   pruning cannot narrow any copy's partial aggregate.
    # tests/test_nb_classifier.py pins the single-scan plan shape.
    arr = F.filter(F.split(text_col, " "), lambda x: x != "")
    with_sentinel = F.concat(arr, F.array(F.lit(None).cast("string")))
    # dictionary-encode the token to a 64-bit hash BEFORE the shared
    # aggregation (VERDICT r14 #4): the shared (doc, tok) exchange is the
    # pipeline's dominant shuffle at 100×, and an UnsafeRow string field
    # costs 8 fixed bytes + the padded token bytes where the xxhash64 key
    # costs a flat 8 — and fixed-width long grouping keys hash/compare
    # inside the aggregate's codegen without touching variable-length
    # offsets. Token IDENTITY is all every consumer needs (contingency
    # counts, the weights equi-join, n_tok) — no output exposes the token
    # string. Exactness: two distinct tokens colliding under xxhash64
    # would merge their counts (p ≈ V²/2⁶⁵ ≈ 3·10⁻⁶ even at a 10M-token
    # 100 TB vocab); tests/test_nb_classifier.py pins ZERO collisions on
    # every driver SF's actual vocab (the pinned-centroid-margin
    # discipline: the signed artifact's exactness is data-verified, not
    # probabilistic). The NULL sentinel stays NULL through an explicit
    # when() guard — xxhash64(NULL) would return the seed (42), a value a
    # real token could in principle hash to.
    tok_h = F.when(
        F.col("tok").isNotNull(), F.xxhash64(F.col("tok"))
    ).alias("tok_h")
    dtc = (
        base.select(id_col, "label", F.explode_outer(with_sentinel).alias("tok"))
        .select(id_col, "label", tok_h)
        .groupBy(id_col, "label", "tok_h")
        .agg(F.count("*").cast("long").alias("c"))
    )
    is_real = F.col("tok_h").isNotNull()

    # token × label contingency (map-side combined), df-capped vocab —
    # integer weighted sums over the per-doc counts ≡ the occurrence-level
    # sums (Σ c·label == Σ_occurrences label), so exactness is unchanged.
    # The NULL sentinel forms its own tokc row; it survives the min_df
    # cut (its n = doc count) but is excluded from the vocab totals by
    # the CASE guards and can never equi-join a real token in scoring.
    tokc = (
        dtc.groupBy("tok_h")
        .agg(
            F.sum(F.col("c") * F.col("label")).alias("n1"),
            F.sum(F.col("c") * (1 - F.col("label"))).alias("n0"),
            F.sum("c").alias("n"),
        )
        .filter(F.col("n") >= min_df)
    )
    totals = tokc.agg(
        F.sum(F.when(is_real, 1).otherwise(0)).alias("v"),
        F.sum(F.when(is_real, F.col("n1")).otherwise(0)).alias("bign1"),
        F.sum(F.when(is_real, F.col("n0")).otherwise(0)).alias("bign0"),
    )  # 1 row
    w_fp = F.round(
        (
            F.log((F.col("n1") + 0.5) / (F.col("bign1") + 0.5 * F.col("v")))
            - F.log((F.col("n0") + 0.5) / (F.col("bign0") + 0.5 * F.col("v")))
        )
        * FP_SCALE
    ).cast("long")
    # the weights join key is COALESCEd to a sentinel: the scoring
    # left-join would otherwise INFER isnotnull(tok_h) on this branch
    # (left-outer join key inference), and that pushed predicate forks
    # the branch's dtc copy below the shared exchange — un-reusing the
    # corpus scan this whole construction exists to share. The two
    # sides' NULL fallbacks differ (-1 vs -2), so sentinel rows still
    # never match each other; a REAL token hashing to exactly -1/-2
    # (p ≈ 2⁻⁶³) would let a sentinel row join it — the collision pin
    # test asserts neither value occurs in any driver SF's vocab.
    weights = tokc.crossJoin(F.broadcast(totals)).select(
        F.coalesce("tok_h", F.lit(-2).cast("long")).alias("wtok_h"),
        w_fp.alias("w_fp"),
    )

    # the prior reads per-doc labels off dtc's sentinel rows (one per
    # document, c = 1) — a 1-row reduction over the SHARED exchange, not
    # a second corpus scan
    prior = dtc.agg(
        F.sum(F.when(~is_real, F.col("label")).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~is_real, F.col("c") - F.col("label")).otherwise(0)).alias(
            "n_neg"
        ),
    ).select(
        F.round(
            F.log(
                (F.col("n_pos") + 0.5) / (F.col("n_neg") + 0.5)
            )
            * FP_SCALE
        )
        .cast("long")
        .alias("prior_fp")
    )  # 1 row

    # ONE scoring pass: left-join the (df-capped, hence broadcast-sized)
    # weight table onto the shared per-(doc, token) counts — OOV tokens
    # carry weight 0 but still count — and aggregate n_tok and the
    # integer llr sum together, so a single per-doc groupBy finishes the
    # pipeline instead of two parallel aggregations joined afterwards
    # (one fewer shuffle; measured 37 s → 11 s warm at the 100× rehearsal).
    # Sentinel rows never equi-join (NULL ≠ NULL) and are excluded from
    # both sums by the CASE guards; documents with no real tokens score
    # n_tok = 0 and are dropped by the post-agg filter, matching the
    # oracle's `dt` CTE (which only sees real-token rows).
    # no broadcast hint on the weight side: AQE picks BHJ while the
    # df-capped vocab is small and falls back to a token-keyed SMJ when
    # a 100 TB vocab outgrows the broadcast budget (hot stopword tokens
    # are partition-size skew only — the weight side is unique per token)
    out = (
        dtc.join(
            weights,
            F.coalesce("tok_h", F.lit(-1).cast("long")) == F.col("wtok_h"),
            "left",
        )
        # include_label adds the per-doc label (a dtc GROUP KEY, constant
        # per doc) to the scoring keys so downstream consumers (the
        # calibration sweep) need NO second corpus scan or label join;
        # the grouping sits ABOVE the shared exchange, so reuse holds
        .groupBy(*([id_col, "label"] if include_label else [id_col]))
        .agg(
            F.sum(F.when(is_real, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_tok"),
            F.sum(
                F.when(
                    is_real, F.col("c") * F.coalesce(F.col("w_fp"), F.lit(0))
                ).otherwise(0)
            )
            .cast("long")
            .alias("llr_fp"),
        )
        .filter(F.col("n_tok") > 0)
        .crossJoin(F.broadcast(prior))
    )
    logit = (
        F.col("prior_fp")
        + F.col("llr_fp").cast("double") / F.col("n_tok")
    ) / FP_SCALE
    cols = [
        F.col(id_col),
        F.col("n_tok"),
        F.col("llr_fp"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("prob"),
        (F.col("prior_fp") * F.col("n_tok") + F.col("llr_fp") > 0)
        .cast("long")
        .alias("keep"),
    ]
    if include_prior:  # operating-point sweeps need the exact integer prior
        cols.append(F.col("prior_fp"))
    if include_label:  # carried through the scoring keys — no extra scan
        cols.append(F.col("label"))
    return out.select(*cols)
