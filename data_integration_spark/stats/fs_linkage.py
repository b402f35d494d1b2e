"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter, "A
Theory for Record Linkage", JASA 1969; EM estimation per Winkler 1988)
— the statistical core of data integration: given candidate record
pairs and a binary comparison vector γ per pair, estimate each field's
match/unmatch agreement probabilities (m_f, u_f) and the match prior π
by EM over the latent match indicator, then score every pair with the
log-likelihood ratio  w(γ) = Σ_f [ γ_f·log(m_f/u_f) +
(1−γ_f)·log((1−m_f)/(1−u_f)) ].

Scale shape — the part that matters at 100 TB: the EM NEVER sees pairs.
Its sufficient statistic is the contingency table of comparison
PATTERNS (≤ 2^F rows for F binary fields), computed with one
distributed groupBy over the blocked candidate pairs; the driver
iterates closed-form updates on that bounded table (O(2^F · iters)
arithmetic on bytes). Scoring is a broadcast join of the ≤ 2^F pattern
weights back onto the pair frame — no Python in the hot path at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6  # probability clamp: keeps log-ratios finite on degenerate fields


def fs_em(
    pattern_counts: list[tuple[tuple[int, ...], int]],
    *,
    iters: int = 100,
    init_pi: float = 0.1,
    init_m: float = 0.8,
    init_u: float = 0.1,
) -> tuple[float, list[float], list[float], list[float]]:
    """EM over the pattern contingency table. Returns
    (pi, m per field, u per field, observed-data log-likelihood trace).
    The trace is non-decreasing (the EM theorem) — certificate law."""
    if not pattern_counts:
        raise ValueError("fs_em: empty pattern table")
    nf = len(pattern_counts[0][0])
    total = float(sum(c for _g, c in pattern_counts))
    pi = init_pi
    m = [init_m] * nf
    u = [init_u] * nf
    lls: list[float] = []
    for _ in range(iters):
        # E-step + observed LL in one pass over the ≤ 2^F patterns
        ll = 0.0
        s_w = 0.0
        s_wg = [0.0] * nf
        s_vg = [0.0] * nf
        s_v = 0.0
        for g, c in pattern_counts:
            pm = pi
            pu = 1.0 - pi
            for f in range(nf):
                pm *= m[f] if g[f] else (1.0 - m[f])
                pu *= u[f] if g[f] else (1.0 - u[f])
            denom = pm + pu
            w = pm / denom
            ll += c * math.log(denom)
            s_w += c * w
            s_v += c * (1.0 - w)
            for f in range(nf):
                if g[f]:
                    s_wg[f] += c * w
                    s_vg[f] += c * (1.0 - w)
        lls.append(ll)
        # M-step (closed form), clamped away from 0/1
        pi = min(max(s_w / total, _EPS), 1.0 - _EPS)
        for f in range(nf):
            m[f] = min(max(s_wg[f] / max(s_w, _EPS), _EPS), 1.0 - _EPS)
            u[f] = min(max(s_vg[f] / max(s_v, _EPS), _EPS), 1.0 - _EPS)
    return pi, m, u, lls


def fs_weights(m: list[float], u: list[float]) -> tuple[list[float], list[float]]:
    """Per-field agreement / disagreement log-likelihood-ratio weights."""
    agree = [math.log(mf / uf) for mf, uf in zip(m, u)]
    disagree = [
        math.log((1.0 - mf) / (1.0 - uf)) for mf, uf in zip(m, u)
    ]
    return agree, disagree


def pattern_table(
    pairs: DataFrame, gamma_cols: list[str]
) -> list[tuple[tuple[int, ...], int]]:
    """The distributed reduction: candidate pairs → ≤ 2^F pattern counts
    (one map-side-combined groupBy; the only collect is the bounded
    table)."""
    rows = (
        pairs.groupBy(*gamma_cols)
        .agg(F.count("*").alias("c"))
        .collect()
    )  # ≤ 2^F rows
    return [
        (tuple(int(r[g]) for g in gamma_cols), int(r["c"])) for r in rows
    ]


def score_pairs(
    pairs: DataFrame,
    gamma_cols: list[str],
    m: list[float],
    u: list[float],
    weight_col: str = "weight",
) -> DataFrame:
    """Attach the F-S log-likelihood-ratio weight as a native column
    expression (sum of per-field terms — whole-stage codegen, no UDF)."""
    agree, disagree = fs_weights(m, u)
    expr = F.lit(0.0)
    for f, g in enumerate(gamma_cols):
        expr = expr + F.when(
            F.col(g) == 1, F.lit(agree[f])
        ).otherwise(F.lit(disagree[f]))
    return pairs.withColumn(weight_col, expr)
