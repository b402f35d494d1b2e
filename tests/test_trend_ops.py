"""Value-level semantics for the trend / feature-engineering block:
Holt recurrence vs a pure-Python replay, changepoint on an engineered
two-regime series, Theil-Sen on an exactly-linear series, and the
leave-one-out encoding identity recomputed by hand."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from data_integration_spark.queries import QUERIES, load_all

load_all()

SF_SMALL = "/root/testdata/sf0.001"


def _write_orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_totalprice, o_orderdate, o_orderpriority)"""
    df = spark.createDataFrame(
        [
            (k, k % 50, "O", p, d, pr)
            for k, p, d, pr in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf_dir = str(tmp_path / "mini")
    df.coalesce(1).write.parquet(f"{sf_dir}/orders.parquet")
    return sf_dir


def test_holt_matches_python_replay(spark):
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev = ev[ev.user_id < 40].sort_values(["user_id", "ts", "event_id"])
    got = {
        r["user_id"]: (r["n_events"], r["level"], r["trend"], r["forecast_1"])
        for r in QUERIES["q_holt_linear"](spark, SF_SMALL).collect()
    }
    n_checked = 0
    for uid, grp in ev.groupby("user_id"):
        xs = grp["value"].astype(float).tolist()
        if len(xs) < 2:
            assert uid not in got
            continue
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            l_new = 0.5 * x + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
        n, lv, tr, fc = got[uid]
        assert n == len(xs)
        assert lv == pytest.approx(l, abs=1e-6)
        assert tr == pytest.approx(b, abs=1e-6)
        assert fc == pytest.approx(l + b, abs=1e-6)
        n_checked += 1
    assert n_checked >= 5  # the fixture really exercises multi-step folds


def test_changepoint_finds_engineered_break(spark, tmp_path):
    """100 days at $100/day then 60 days at $300/day: the optimal binary
    split is exactly the regime boundary."""
    d0 = datetime.datetime(1995, 1, 1)
    rows = []
    for i in range(160):
        price = 100.0 if i < 100 else 300.0
        rows.append((i, price, d0 + datetime.timedelta(days=i), "1-URGENT"))
    sf_dir = _write_orders(spark, tmp_path, rows)
    r = QUERIES["q_changepoint"](spark, sf_dir).collect()[0]
    assert r["split_day"] == datetime.date(1995, 4, 10)  # day index 99
    assert r["n_left"] == 100 and r["n_right"] == 60
    assert r["mean_left"] == pytest.approx(100.0)
    assert r["mean_right"] == pytest.approx(300.0)
    # gain = n1*n2/n * (m1-m2)^2 = 100*60/160 * 200^2
    assert r["gain"] == pytest.approx(100 * 60 / 160 * 200.0**2, rel=1e-9)


def test_theil_sen_exact_on_linear_series(spark, tmp_path):
    """One order per day with price 50 + 2.5*day_idx: every pairwise
    slope is exactly 2.5, so the median slope and intercept recover the
    line exactly — and an injected outlier day must NOT move them
    (the robustness property OLS lacks)."""
    d0 = datetime.datetime(1995, 3, 1)
    rows = [
        (i, 50.0 + 2.5 * i, d0 + datetime.timedelta(days=i), "1-URGENT")
        for i in range(60)
    ]
    rows.append((999, 10000.0, d0 + datetime.timedelta(days=30), "1-URGENT"))
    sf_dir = _write_orders(spark, tmp_path, rows)
    r = QUERIES["q_theil_sen"](spark, sf_dir).collect()[0]
    assert r["slope_per_day"] == pytest.approx(2.5, abs=1e-6)
    # day 30 has the outlier added; its residual is huge but the MEDIAN
    # intercept sits on the line: price - 2.5*x = 50 - 2.5*59 offset...
    # x here is days since 1995-01-01 (59 + i), so intercept shifts by
    # -2.5*59 from the local 50.
    assert r["intercept"] == pytest.approx(50.0 - 2.5 * 59, abs=1e-6)
    assert r["n_days"] == 60


def test_target_encoding_loo_identity(spark):
    rows = QUERIES["q_target_encoding"](spark, SF_SMALL).collect()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["y_c"] = (o["o_totalprice"] * 100).round().astype("int64")
    sums = o.groupby("o_orderpriority")["y_c"].agg(["sum", "count"])
    mu = o["y_c"].sum() / 100.0 / len(o)
    by_key = o.set_index("o_orderkey")
    for r in rows[:200]:
        y = by_key.loc[r["o_orderkey"], "y_c"]
        s, n = sums.loc[r["o_orderpriority"]]
        want_loo = (s - y) / 100.0 / (n - 1)
        want_sm = ((s - y) / 100.0 + 10.0 * mu) / (n - 1 + 10.0)
        assert r["te_loo"] == pytest.approx(want_loo, abs=1e-6)
        assert r["te_smooth"] == pytest.approx(want_sm, abs=1e-6)
    assert len(rows) == len(o)


def test_item_item_cf_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    n_i = li.groupby("l_partkey").size()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    co = (
        m.groupby(["l_partkey_x", "l_partkey_y"]).size().reset_index(name="c")
    )
    co = co[co.c >= 2]
    import math

    scored = {}
    for _, r in co.iterrows():
        i, j, c = int(r.l_partkey_x), int(r.l_partkey_y), int(r.c)
        cos = c / math.sqrt(n_i[i] * n_i[j])
        scored.setdefault(i, []).append((j, c, cos))
        scored.setdefault(j, []).append((i, c, cos))
    want = {}
    for i, lst in scored.items():
        lst.sort(key=lambda t: (-t[2], t[0]))
        for rk, (j, c, cos) in enumerate(lst[:3], start=1):
            want[(i, j)] = (c, round(cos, 6), rk)
    got = {
        (r["item"], r["neighbor"]): (r["n_co_orders"], r["cosine"], r["rk"])
        for r in QUERIES["q_item_item_cf"](spark, SF_SMALL).collect()
    }
    assert got == want
    assert len(got) > 50  # value-live neighborhood structure


def test_mutual_information_matches_numpy(spark):
    import numpy as np

    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["y"] = (o.o_totalprice > 250000).astype(int)
    o["month"] = pd.to_datetime(o.o_orderdate).dt.month.astype(str)
    got = {
        r["feature"]: (r["n_levels"], r["mi"], r["nmi"])
        for r in QUERIES["q_mutual_information"](spark, SF_SMALL).collect()
    }
    for feat, col in [
        ("priority", "o_orderpriority"),
        ("status", "o_orderstatus"),
        ("month", "month"),
    ]:
        tab = o.groupby([col, "y"]).size()
        n = len(o)
        px = o[col].value_counts() / n
        py = o["y"].value_counts() / n
        mi = 0.0
        for (lv, y), c in tab.items():
            pxy = c / n
            mi += pxy * np.log(pxy / (px[lv] * py[y]))
        h = -(py * np.log(py)).sum()
        n_levels, got_mi, got_nmi = got[feat]
        assert n_levels == o[col].nunique()
        assert got_mi == pytest.approx(mi, abs=2e-6)
        assert got_nmi == pytest.approx(mi / h, abs=2e-6)


def test_zorder_pruning_certificate_claim(spark):
    """The layout claim itself: under the linear layout the box touches
    (nearly) every file; Z-order touches strictly fewer."""
    r = QUERIES["q_zorder_pruning"](spark, SF_SMALL).collect()[0]
    assert r["zorder_prunes_more"] == 1
    assert r["files_zorder"] < r["files_linear"]
    assert r["n_rows_matched"] > 0  # the box predicate is value-live


def test_negative_sampling_contract(spark):
    """No sampled negative may be a true positive for its user; at most
    2 negatives per positive; the draw is the portable md5 stream so a
    re-run is bit-identical."""
    import hashlib

    rows = QUERIES["q_negative_sampling"](spark, SF_SMALL).collect()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    n_parts = int(part.p_partkey.max())
    pos = (
        o[o.o_custkey < 300]
        .merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
    )
    pos_set = set(zip(pos.o_custkey, pos.l_partkey))
    assert len(rows) > 50
    per_pos = {}
    for r in rows:
        assert (r["user_id"], r["neg_item"]) not in pos_set
        per_pos.setdefault((r["user_id"], r["pos_item"]), []).append(
            r["k"]
        )
    for ks in per_pos.values():
        assert sorted(ks) in ([1], [1, 2])
    # replay one draw end-to-end
    u, i = next(iter(per_pos))
    draws = []
    for j in range(1, 5):
        h = hashlib.md5(f"NS{u}:{i}:{j}".encode()).hexdigest()[:8]
        neg = 1 + int(h, 16) % n_parts
        if (u, neg) not in pos_set:
            draws.append(neg)
    want = draws[:2]
    got = [
        r["neg_item"]
        for r in sorted(
            (r for r in rows if r["user_id"] == u and r["pos_item"] == i),
            key=lambda r: r["k"],
        )
    ]
    assert got == want


def test_churn_labels_are_leakage_safe(spark):
    rows = QUERIES["q_churn_labels"](spark, SF_SMALL).collect()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    t0 = ev.ts.min()
    f_end = t0 + pd.Timedelta(days=18)
    l_end = t0 + pd.Timedelta(days=25)
    feat_ev = ev[ev.ts < f_end]
    lab_users = set(
        ev[
            (ev.ts >= f_end)
            & (ev.ts < l_end)
            & (ev.event_type == "purchase")
            & (ev.value > 140)
        ].user_id
    )
    by_user = feat_ev.groupby("user_id")
    want_n = by_user.size()
    churn_seen = 0
    for r in rows:
        u = r["user_id"]
        assert r["n_events"] == want_n[u]
        want_churn = 0 if u in lab_users else 1
        assert r["churned"] == want_churn
        churn_seen += r["churned"]
    assert len(rows) == feat_ev.user_id.nunique()
    # both classes are value-live on the fixture
    assert 0 < churn_seen < len(rows)


def test_ndcg_matches_numpy(spark):
    import hashlib
    import math

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")

    def rel(doc_id):
        h = hashlib.md5(f"L{doc_id}".encode())  # placeholder; tag is R
        u = int(hashlib.md5(f"R{doc_id}".encode()).hexdigest()[:8], 16) / 2**32
        return 0 if u < 0.5 else (1 if u < 0.85 else 2)

    docs["rel"] = docs.doc_id.map(rel)
    top = docs.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(20)
    dcg = sum(
        (2.0**r - 1) / math.log2(p + 1)
        for p, r in enumerate(top.rel, start=1)
    )
    n2 = int((docs.rel == 2).sum())
    n1 = int((docs.rel == 1).sum())
    idcg = sum(
        (3.0 if p <= n2 else (1.0 if p <= n2 + n1 else 0.0))
        / math.log2(p + 1)
        for p in range(1, 21)
    )
    r = QUERIES["q_ndcg"](spark, SF_SMALL).collect()[0]
    assert r["n_rel2"] == n2 and r["n_rel1"] == n1
    assert r["dcg"] == pytest.approx(dcg, abs=2e-6)
    assert r["idcg"] == pytest.approx(idcg, abs=2e-6)
    assert r["ndcg"] == pytest.approx(dcg / idcg, abs=2e-6)
    assert 0 < r["ndcg"] <= 1


def test_k_anonymity_matches_pandas(spark):
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    sz = o.groupby(["o_orderpriority", "o_orderstatus", "d"]).size()
    r = QUERIES["q_k_anonymity"](spark, SF_SMALL).collect()[0]
    assert r["n_rows"] == len(o)
    assert r["n_classes"] == len(sz)
    assert r["n_violating_classes"] == int((sz < 10).sum())
    assert r["rows_at_risk"] == int(sz[sz < 10].sum())
    assert r["min_class_size"] == int(sz.min())
    assert r["max_class_size"] == int(sz.max())
    assert r["pct_at_risk"] == pytest.approx(
        sz[sz < 10].sum() / len(o), abs=1e-6
    )


def test_oov_rate_matches_python(spark):
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    train = docs[docs.doc_id % 4 != 0]
    held = docs[docs.doc_id % 4 == 0]
    freq = Counter(
        t for txt in train.text for t in txt.split(" ") if t
    )
    vocab = {t for t, c in freq.items() if c >= 5}
    want = {}
    for src, grp in held.groupby("source"):
        toks = [t for txt in grp.text for t in txt.split(" ") if t]
        n_oov = sum(1 for t in toks if t not in vocab)
        want[src] = (len(toks), n_oov, round(n_oov / len(toks), 6))
    got = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in QUERIES["q_oov_rate"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_out_of_order_audit_is_value_live(spark):
    """Under the adversarial md5 arrival permutation the event stream
    MUST show real lateness (the raw feed is time-sorted — without the
    permutation this audit reads 0 everywhere and certifies nothing)."""
    r = QUERIES["q_out_of_order_audit"](spark, SF_SMALL).collect()[0]
    assert r["n_out_of_order"] > 0
    assert r["n_late_30m"] > 0
    assert r["max_lateness_s"] > 1800
    assert 0 < r["pct_late_30m"] < 1


def test_deletion_cascade_complete(spark):
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    del_c = set(cust[cust.c_custkey % 97 == 0].c_custkey)
    del_o = set(o[o.o_custkey.isin(del_c)].o_orderkey)
    n_li = int(li.l_orderkey.isin(del_o).sum())
    r = QUERIES["q_deletion_cascade"](spark, SF_SMALL).collect()[0]
    assert r["n_customers"] == len(del_c)
    assert r["n_orders"] == len(del_o)
    assert r["n_lineitems"] == n_li
    assert r["orphan_orders_left"] == 0
    assert r["orphan_lineitems_left"] == 0
    assert len(del_c) > 0  # the cohort is value-live


def test_price_volume_mix_decomposition_sums_to_delta(spark):
    rows = QUERIES["q_price_volume_mix"](spark, SF_SMALL).collect()
    assert len(rows) == 3  # A, N, R
    for r in rows:
        # the two effects reconstruct the delta (within the 4dp rounds)
        assert r["volume_effect"] + r["price_effect"] == pytest.approx(
            r["delta"], abs=0.01
        )
        assert r["rev_1996"] - r["rev_1995"] == pytest.approx(
            r["delta"], abs=0.01
        )


def test_streaming_late_drop_is_value_live_and_conserves(spark):
    """The adversarial batch split must produce REAL engine drops
    (n_rows_dropped_late > 0 — an ordered replay would read 0 and
    certify nothing), and the accounting must conserve: emitted rows +
    dropped rows + rows still in open/unclosed windows == source."""
    r = QUERIES["q_streaming_late_drop"](spark, SF_SMALL).collect()[0]
    assert r["n_rows_dropped_late"] > 0
    assert r["n_windows_emitted"] > 0
    assert (
        0
        < r["n_rows_emitted"] + r["n_rows_dropped_late"]
        <= r["n_source_events"]
    )
    # deterministic: a second full replay reproduces the certificate
    r2 = QUERIES["q_streaming_late_drop"](spark, SF_SMALL).collect()[0]
    assert r.asDict() == r2.asDict()


def test_raking_recovers_population_margins(spark):
    """After the closing status pass, weighted status margins equal the
    population EXACTLY (up to float); priority margins to IPF
    convergence; and the downsampled urgent cells get the largest
    upweight (the bias the raking exists to correct)."""
    import hashlib

    rows = QUERIES["q_raking_weights"](spark, SF_SMALL).collect()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")

    def u(k):
        return int(hashlib.md5(f"S{k}".encode()).hexdigest()[:8], 16) / 2**32

    acc = o.o_orderpriority.map(lambda p: 0.3 if p == "1-URGENT" else 0.7)
    samp = o[[u(k) < a for k, a in zip(o.o_orderkey, acc)]]
    t_st = o.groupby("o_orderstatus").size()
    t_pr = o.groupby("o_orderpriority").size()
    got_st = {}
    got_pr = {}
    urgent_w, other_w = [], []
    n_cells = samp.groupby(["o_orderpriority", "o_orderstatus"]).size()
    for r in rows:
        assert r["n_sample"] == n_cells[
            (r["o_orderpriority"], r["o_orderstatus"])
        ]
        got_st[r["o_orderstatus"]] = got_st.get(r["o_orderstatus"], 0) + (
            r["rake_weight"] * r["n_sample"]
        )
        got_pr[r["o_orderpriority"]] = got_pr.get(
            r["o_orderpriority"], 0
        ) + (r["rake_weight"] * r["n_sample"])
        (urgent_w if r["o_orderpriority"] == "1-URGENT" else other_w).append(
            r["rake_weight"]
        )
    for st, t in t_st.items():
        assert got_st[st] == pytest.approx(t, rel=1e-4)
    for pr, t in t_pr.items():
        assert got_pr[pr] == pytest.approx(t, rel=0.02)  # IPF convergence
    assert min(urgent_w) > max(other_w)  # bias corrected the right way


def test_cuped_matches_numpy_and_reduces_variance(spark):
    import numpy as np

    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    t0 = ev.ts.min()
    split = t0 + pd.Timedelta(days=15)
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "pre": g.loc[g.ts < split, "value"].sum(),
                "post": g.loc[g.ts >= split, "value"].sum(),
            }
        ),
        include_groups=False,
    )
    pre, post = per.pre.to_numpy(), per.post.to_numpy()
    theta = round(
        ((pre - pre.mean()) * (post - post.mean())).sum()
        / ((pre - pre.mean()) ** 2).sum(),
        6,
    )
    adjusted = post - theta * (pre - pre.mean())
    r = QUERIES["q_cuped"](spark, SF_SMALL).collect()[0]
    assert r["n_users"] == len(per)
    assert r["theta"] == pytest.approx(theta, abs=2e-6)
    assert r["var_post"] == pytest.approx(post.var(ddof=1), rel=1e-6)
    assert r["var_adjusted"] == pytest.approx(
        adjusted.var(ddof=0) * len(per) / (len(per) - 1), rel=1e-4
    )
    # this synthetic corpus has MEMORYLESS users (uniform activity, iid
    # values), so the true reduction is small — the certificate measures
    # exactly that; it must be nonzero (the estimator is live) and small
    # (the honest reading), not an artifact in either direction
    assert 0 < r["var_reduction"] < 0.05


def test_mrl_truncation_recall_is_honest(spark):
    """On isotropic gaussian embeddings the first-16-dims prefix carries
    only 1/4 of the signal, so truncation recall MUST be visibly below
    1 — a certificate that read 1.0 here would be measuring nothing
    (on MRL-trained embeddings the same query reads high, which is the
    deployment decision it exists to inform)."""
    r = QUERIES["q_mrl_truncation_recall"](spark, SF_SMALL).collect()[0]
    assert r["n_queries"] == 20
    assert 0 < r["mean_recall_at5"] < 0.9
    assert r["min_recall_at5"] <= r["mean_recall_at5"]
    assert 0 <= r["n_perfect"] < 20


def test_spearman_matches_scipy_free_formula(spark):
    import re

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    docs["n_distinct"] = docs.text.map(lambda t: len(set(t.split(" "))))
    ra = (
        docs.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
        .assign(ra=lambda d: d.index + 1)
        .set_index("doc_id")["ra"]
    )
    rb = (
        docs.sort_values(["n_distinct", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
        .assign(rb=lambda d: d.index + 1)
        .set_index("doc_id")["rb"]
    )
    n = len(docs)
    d2 = float(((ra - rb) ** 2).sum())
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    r = QUERIES["q_spearman_rank_corr"](spark, SF_SMALL).collect()[0]
    assert r["n"] == n
    assert r["spearman_rho"] == pytest.approx(rho, abs=1e-6)
    # the two signals are genuinely positively associated on this corpus
    assert r["spearman_rho"] > 0.3


def test_semantic_threshold_sweep_is_monotone(spark):
    rows = {
        r["threshold"]: r["n_pairs"]
        for r in QUERIES["q_semantic_threshold_sweep"](
            spark, SF_SMALL
        ).collect()
    }
    ts = sorted(rows)
    assert len(ts) == 6
    for a, b in zip(ts, ts[1:]):
        assert rows[a] >= rows[b]  # higher threshold, fewer pairs
    assert rows[ts[0]] > 0  # the sweep is value-live at the low end


def test_skew_report_matches_pandas(spark):
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    counts = li.groupby("l_partkey").size()
    med = float(counts.median())
    r = QUERIES["q_skew_report"](spark, SF_SMALL).collect()[0]
    assert r["n_keys"] == len(counts)
    assert r["n_rows"] == len(li)
    assert r["max_key_rows"] == int(counts.max())
    assert r["skew_factor"] == pytest.approx(counts.max() / med, abs=1e-4)
    assert r["rows_on_hot"] == int(counts[counts > 10 * med].sum())
    assert r["needs_mitigation"] == int(counts.max() / med > 10)


def test_l_diversity_matches_pandas(spark):
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o["sens"] = (o.o_totalprice // 100000).astype(int)
    g = o.groupby(["o_orderpriority", "o_orderstatus", "d"]).agg(
        sz=("sens", "size"), l=("sens", "nunique")
    )
    r = QUERIES["q_l_diversity"](spark, SF_SMALL).collect()[0]
    assert r["n_classes"] == len(g)
    assert r["min_l"] == int(g.l.min())
    assert r["n_homogeneous_classes"] == int((g.l < 2).sum())
    assert r["rows_disclosed"] == int(g.loc[g.l < 2, "sz"].sum())
    assert r["pct_disclosed"] == pytest.approx(
        g.loc[g.l < 2, "sz"].sum() / len(o), abs=1e-6
    )
    # the audit is value-live: homogeneous classes exist on this corpus
    assert r["n_homogeneous_classes"] > 0


def test_theil_sen_degenerate_single_day(spark, tmp_path):
    """A one-day series has no pairwise slopes: the query must return
    the oracle's NULL slope/intercept row, not crash interpolating None
    into SQL."""
    d0 = datetime.datetime(1995, 6, 1)
    rows = [(i, 100.0 + i, d0, "1-URGENT") for i in range(5)]
    sf_dir = _write_orders(spark, tmp_path, rows)
    r = QUERIES["q_theil_sen"](spark, sf_dir).collect()[0]
    assert r["n_pairs"] == 0
    assert r["n_days"] == 1
    assert r["slope_per_day"] is None
    assert r["intercept"] is None


def test_ece_matches_pandas(spark):
    import hashlib

    import numpy as np

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    p_pred = 1 / (1 + np.exp(-(docs.n_chars - 300) / 80.0))
    p_true = 1 / (1 + np.exp(-(docs.n_chars - 280) / 70.0))
    u = docs.doc_id.map(
        lambda d: int(hashlib.md5(f"L{d}".encode()).hexdigest()[:8], 16)
        / 2**32
    )
    y = (u < p_true).astype(int)
    df = pd.DataFrame({"p": p_pred, "y": y})
    df["bin"] = np.floor(df.p * 10).astype(int)
    g = df.groupby("bin").agg(n=("p", "size"), mp=("p", "mean"), o=("y", "mean"))
    ece = (g.n * (g.mp - g.o).abs()).sum() / g.n.sum()
    mce = (g.mp - g.o).abs().max()
    r = QUERIES["q_ece"](spark, SF_SMALL).collect()[0]
    assert r["n_docs"] == len(docs)
    assert r["ece"] == pytest.approx(ece, abs=2e-6)
    assert r["mce"] == pytest.approx(mce, abs=2e-6)
    # miscalibration between the two links is real on this corpus
    assert r["ece"] > 0.01


def test_time_to_convert_matches_pandas(spark):
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    v = ev[ev.event_type == "view"].groupby("user_id").ts.min()
    lat = []
    for u, tv in v.items():
        after = ev[
            (ev.user_id == u) & (ev.event_type == "purchase") & (ev.ts > tv)
        ]
        if len(after):
            lat.append((after.ts.min() - tv).total_seconds())
    r = QUERIES["q_time_to_convert"](spark, SF_SMALL).collect()[0]
    assert r["n_viewers"] == len(v)
    assert r["n_converted"] == len(lat)
    s = pd.Series(lat)
    assert r["p50_seconds"] == pytest.approx(s.quantile(0.5), abs=0.02)
    assert r["p90_seconds"] == pytest.approx(s.quantile(0.9), abs=0.02)
    assert 0 < r["conversion_rate"] <= 1
