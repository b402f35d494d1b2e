"""Laws for the r14-staged (flipped live at the r15 window) corpus-cartography + calibration ops:

- q_corpus_map is EXACTLY the per-cell rollup of q_semdedup's decision
  frame (recomputed in pandas), and some cell is duplicate-heavy
  (non-vacuous);
- q_quality_calibration: n_keep is non-increasing in the threshold,
  the τ = 0 row reproduces q_quality_nb_filter's keep count exactly
  (the sweep and the filter share one decision algebra), and
  precision/recall stay in [0, 1] with recall non-increasing in τ.
"""

from __future__ import annotations

from data_integration_spark.queries import QUERIES, load_all

load_all()
SF = "/root/testdata/sf0.01"


def test_corpus_map_is_the_decision_rollup(spark):
    import pandas as pd

    dec = QUERIES["q_semdedup"](spark, SF).toPandas()
    got = {
        r["cell"]: r
        for r in QUERIES["q_corpus_map"](spark, SF).collect()
    }
    grp = dec.groupby("cell")
    assert set(got) == set(grp.groups)
    total_dropped = 0
    for cell, g in grp:
        r = got[cell]
        assert r["n_vecs"] == len(g)
        assert r["n_kept"] == int(g["keep"].sum())
        assert r["n_dropped"] == len(g) - int(g["keep"].sum())
        assert r["min_cent_cos"] == g["cent_cos"].min()
        assert r["max_cent_cos"] == g["cent_cos"].max()
        total_dropped += r["n_dropped"]
    assert total_dropped > 0  # non-vacuous


def test_calibration_laws(spark):
    rows = sorted(
        QUERIES["q_quality_calibration"](spark, SF).collect(),
        key=lambda r: r["thr_fp"],
    )
    keeps = [r["n_keep"] for r in rows]
    assert keeps == sorted(keeps, reverse=True)  # stricter τ keeps fewer
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    for r in rows:
        assert 0 <= r["keep_rate"] <= 1
        if r["precision"] is not None:
            assert 0 <= r["precision"] <= 1
    zero = next(r for r in rows if r["thr_fp"] == 0)
    nb_keep = sum(
        r["keep"] for r in QUERIES["q_quality_nb_filter"](spark, SF).collect()
    )
    assert zero["n_keep"] == nb_keep
