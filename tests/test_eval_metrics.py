"""Ground-truth tests for the model-evaluation / decomposition block:
AUC, calibration, and kappa are recomputed from the parquet bytes with
hashlib + numpy (engine-independent — the same md5 label stream both
engines derive), interpolation against pandas' time interpolation, and
the seasonal decomposition against its defining identities."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from data_integration_spark.queries import QUERIES, load_all

load_all()
SF = "/root/testdata/sf0.001"


def _md5_u(tag: str, key: int) -> float:
    h = hashlib.md5(f"{tag}{key}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")[
        ["doc_id", "n_chars"]
    ]


def _labels(docs: pd.DataFrame) -> np.ndarray:
    p_true = 1.0 / (1.0 + np.exp(-(docs["n_chars"] - 280) / 70.0))
    u = docs["doc_id"].map(lambda d: _md5_u("L", d))
    return (u < p_true).to_numpy().astype(int)


def test_roc_auc_matches_bruteforce_pairs(spark):
    docs = _docs()
    y = _labels(docs)
    s = docs["n_chars"].to_numpy()
    pos, neg = s[y == 1], s[y == 0]
    # O(P·N) literal definition: P(s+ > s-) + 0.5 P(tie)
    gt = (
        (pos[:, None] > neg[None, :]).sum()
        + 0.5 * (pos[:, None] == neg[None, :]).sum()
    ) / (len(pos) * len(neg))
    row = QUERIES["q_roc_auc"](spark, SF).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc"] == round(gt, 6)
    # the label stream must be non-degenerate for AUC to mean anything
    assert 0 < len(pos) < len(s)
    assert 0.5 < row["auc"] < 1.0  # monotone link => better than chance


def test_calibration_bins_match_numpy(spark):
    docs = _docs()
    y = _labels(docs)
    p = 1.0 / (1.0 + np.exp(-(docs["n_chars"] - 300) / 80.0))
    gt = (
        pd.DataFrame({"bin": np.floor(p * 10).astype(int), "p": p, "y": y})
        .groupby("bin")
        .agg(
            n=("y", "size"),
            mean_pred=("p", "mean"),
            obs_rate=("y", "mean"),
            brier=("p", lambda col: np.mean((col - y[col.index]) ** 2)),
        )
    )
    out = {
        r["bin"]: r
        for r in QUERIES["q_calibration_bins"](spark, SF).collect()
    }
    assert set(out) == set(gt.index)
    for b, g in gt.iterrows():
        assert out[b]["n"] == g["n"]
        assert out[b]["mean_pred"] == pytest.approx(g["mean_pred"], abs=2e-6)
        assert out[b]["obs_rate"] == round(float(g["obs_rate"]), 6)
        assert out[b]["brier"] == pytest.approx(g["brier"], abs=2e-6)
    # at least half the deciles are populated at every SF
    assert len(out) >= 5


def test_cohens_kappa_matches_bruteforce(spark):
    docs = _docs()
    a = (docs["n_chars"] >= 300).astype(int)
    u = docs["doc_id"].map(lambda d: _md5_u("K", d))
    b = ((docs["n_chars"] + (u - 0.5) * 120.0) >= 300).astype(int)
    n = len(docs)
    po = float((a == b).mean())
    pa, pb = float(a.mean()), float(b.mean())
    pe = pa * pb + (1 - pa) * (1 - pb)
    row = QUERIES["q_cohens_kappa"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["po"] == round(po, 6)
    assert row["pe"] == round(pe, 6)
    assert row["kappa"] == round((po - pe) / (1 - pe), 6)
    # annotators must genuinely disagree somewhere or kappa is vacuous
    assert 0 < po < 1 and abs(row["kappa"]) < 1


def test_linear_interpolation_matches_pandas(spark):
    out = (
        QUERIES["q_linear_interpolation"](spark, SF)
        .toPandas()
        .sort_values(["user_id", "t_us", "event_id"])
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"] < 50].copy()
    # epoch microseconds, matching both engines' ns->us truncation
    ev["t_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["v"] = ev["value"].where(ev["event_id"] % 7 != 3)
    n_masked = int(ev["v"].isna().sum())
    assert n_masked > 0, "mask must be value-live"
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["t_us", "event_id"]).set_index("t_us")
        interp = g["v"].interpolate(method="index", limit_area="inside")
        got = out[out["user_id"] == uid].set_index("t_us")
        assert len(got) == len(g)
        for t in g.index:
            exp = interp.loc[t]
            val = got.loc[t, "v_interp"]
            if pd.isna(exp):
                assert pd.isna(val)
            else:
                assert val == pytest.approx(round(float(exp), 6), abs=1e-6)
    # boundary gaps (masked first/last observation of a series) stay NULL
    assert (out["is_masked"] == 1).sum() == n_masked


def test_seasonal_decompose_identities(spark):
    out = QUERIES["q_seasonal_decompose"](spark, SF).toPandas()
    # additive identity: revenue == trend + seasonal + residual (6dp)
    recon = out["trend"] + out["seasonal"] + out["residual"]
    assert np.allclose(recon, out["revenue"], atol=2e-6)
    # seasonal is a pure function of weekday (<= 7 distinct values)
    assert out["dow"].between(1, 7).all()
    assert out.groupby("dow")["seasonal"].nunique().max() == 1
    # trend recomputation for an interior day: mean of the +-3 day band
    days = out.sort_values("day").reset_index(drop=True)
    days["day"] = pd.to_datetime(days["day"])
    mid = days.iloc[len(days) // 2]
    band = days[abs((days["day"] - mid["day"]).dt.days) <= 3]
    assert mid["trend"] == pytest.approx(
        round(float(band["revenue"].mean()), 6), abs=2e-6
    )
    # weekly seasonal means are centered around zero-ish (mean detrended)
    assert abs(out["seasonal"].mean()) < out["revenue"].std()


def test_pr_curve_matches_bruteforce(spark):
    docs = _docs()
    y = _labels(docs)
    s = docs["n_chars"].to_numpy()
    out = {
        r["threshold"]: r
        for r in QUERIES["q_pr_curve"](spark, SF).collect()
    }
    assert set(out) == set(np.unique(s).tolist())
    p_total = int(y.sum())
    for t, r in out.items():
        tp = int(((s >= t) & (y == 1)).sum())
        fp = int(((s >= t) & (y == 0)).sum())
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["precision"] == round(tp / (tp + fp), 6)
        assert r["recall"] == round(tp / p_total, 6)
    # the curve must span both regimes: near-perfect precision at the
    # top thresholds, full recall at the bottom one
    assert max(r["precision"] for r in out.values()) > 0.9
    assert any(r["recall"] == 1.0 for r in out.values())
