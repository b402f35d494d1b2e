"""Value-level semantics for queries/analytics_extra.py (paths, Gini,
association rules, mode, group-concat) — independent recomputation in
pandas/numpy on sf0.001, beyond the DuckDB hash parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_spark.queries import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()


def test_event_paths_partition_users(spark):
    out = QUERIES["q_event_paths"](spark, SF_SMALL)
    n_users = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = out.collect()
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(1 <= len(r["path"].split(">")) <= 3 for r in rows)


def test_gini_matches_numpy(spark):
    import numpy as np

    row = QUERIES["q_gini"](spark, SF_SMALL).collect()[0]
    pdf = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .toPandas()
        .sort_values(["rev", "o_custkey"])
    )
    y = pdf["rev"].to_numpy()
    n = len(y)
    rk = np.arange(1, n + 1)
    gini = 2.0 * (rk * y).sum() / (n * y.sum()) - (n + 1.0) / n
    top = y[n - n // 10 :].sum() / y.sum()
    assert row["n_customers"] == n
    assert row["gini"] == pytest.approx(gini, abs=1e-5)
    assert row["top_decile_share"] == pytest.approx(top, abs=1e-5)
    assert 0.0 <= row["gini"] < 1.0


def test_association_rule_identities(spark):
    rows = QUERIES["q_association_rules"](spark, SF_SMALL).collect()
    assert rows, "min-support floor must leave rules at sf0.001"
    inc = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = inc.select("l_orderkey").distinct().count()
    r = max(rows, key=lambda x: x["n_both"])
    orders_a = {
        x["l_orderkey"]
        for x in inc.filter(F.col("l_partkey") == r["antecedent"]).collect()
    }
    orders_b = {
        x["l_orderkey"]
        for x in inc.filter(F.col("l_partkey") == r["consequent"]).collect()
    }
    n_both = len(orders_a & orders_b)
    assert r["n_both"] == n_both
    assert r["support"] == pytest.approx(n_both / n_orders, abs=1e-6)
    assert r["confidence"] == pytest.approx(n_both / len(orders_a), abs=1e-6)
    assert r["lift"] == pytest.approx(
        n_both * n_orders / (len(orders_a) * len(orders_b)), abs=1e-4
    )


def test_mode_per_group_matches_pandas(spark):
    rows = {
        r["c_mktsegment"]: r
        for r in QUERIES["q_mode_per_group"](spark, SF_SMALL).collect()
    }
    pdf = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_SMALL}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .count()
        .toPandas()
    )
    for seg, grp in pdf.groupby("c_mktsegment"):
        best = grp.sort_values(
            ["count", "o_orderpriority"], ascending=[False, True]
        ).iloc[0]
        assert rows[seg]["mode_priority"] == best["o_orderpriority"]
        assert rows[seg]["n"] == best["count"]


def test_group_concat_ordered_top5(spark):
    rows = QUERIES["q_group_concat"](spark, SF_SMALL).collect()
    cust = (
        spark.read.parquet(f"{SF_SMALL}/customer.parquet")
        .join(
            spark.read.parquet(f"{SF_SMALL}/nation.parquet").select(
                "n_nationkey", "n_name"
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .toPandas()
    )
    for r in rows:
        names = r["top_customers"].split(",")
        assert 1 <= len(names) <= 5
        grp = cust[cust["n_name"] == r["n_name"]].sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        )
        assert names == list(grp["c_name"].head(len(names)))


def test_rfm_exact_ntile_semantics(spark):
    rows = QUERIES["q_rfm_segments"](spark, SF_SMALL).collect()
    n = len(rows)
    q, rem = divmod(n, 5)
    want_sizes = sorted([q + 1] * rem + [q] * (5 - rem))
    for col in ("r_score", "f_score", "m_score"):
        from collections import Counter

        sizes = Counter(r[col] for r in rows)
        assert set(sizes) == set(range(1, 6))
        assert sorted(sizes.values()) == want_sizes
    # score 5 on M holds the highest total spend; score 1 the lowest
    pdf = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("m"))
        .toPandas()
        .set_index("o_custkey")["m"]
    )
    by_score = {}
    for r in rows:
        by_score.setdefault(r["m_score"], []).append(pdf[r["custkey"]])
    assert max(by_score[1]) <= min(by_score[5])
    assert all(
        max(by_score[s]) <= min(by_score[s + 1]) for s in range(1, 5)
    )


def test_ntile_closed_form_matches_sql_semantics():
    """The closed-form bucket used by q_rfm_segments must equal SQL
    NTILE(k) for ANY (n, k): first n mod k buckets get one extra row.
    Pure python sweep — no Spark — over every n ≤ 200 and k ∈ {2,3,5,7}."""
    for k in (2, 3, 5, 7):
        for n in range(1, 201):
            q, rem = divmod(n, k)
            # reference NTILE: bucket boundaries by construction
            want = []
            for b in range(1, k + 1):
                size = q + 1 if b <= rem else q
                want.extend([b] * size)
            got = []
            for r in range(1, n + 1):
                if r <= rem * (q + 1):
                    got.append((r - 1) // (q + 1) + 1)
                else:
                    got.append(rem + (r - 1 - rem * (q + 1)) // q + 1)
            assert got == want[:n], (n, k)
