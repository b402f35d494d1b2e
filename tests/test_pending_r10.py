"""r10-staged queries (``PENDING_R10``) run through the SAME DuckDB parity
harness as the live registry BEFORE their registration round.

The r9 driver window is fully consumed by the prescribed r1/r2 re-sign
rotation (VERDICT r8 #2/#3), so these queries — the multimodal library ops
as t2 queries (VERDICT r8 #4) and the pinned-centroid IVF persist/append
full-oracle upgrades (VERDICT r8 #7) — stage here with their oracles and
flip into ``@register`` at the r10 window. This gate makes that flip pure
attestation: every staged query already hash-matches its oracle on the
harness testdata.
"""

from __future__ import annotations

import pytest

from data_integration_spark.queries import (
    ORACLES,
    PENDING_R10,
    QUERIES,
    load_all,
)
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"

load_all()


def test_pending_block_is_populated_and_well_formed():
    """The staged block exists and every entry is the shape the r10 flip
    expects: a callable plus a full oracle (staging a rows-only query
    would defeat the point of the deferral)."""
    assert set(PENDING_R10) == {
        "q_multimodal_audio_features",
        "q_multimodal_resize",
        "q_multimodal_video_frames",
        "q_image_dedup_dhash",
        "q_ann_ivf_persist",
        "q_ann_ivf_append",
    }
    for name, (fn, oracle) in PENDING_R10.items():
        assert callable(fn), name
        assert isinstance(oracle, str) and "SELECT" in oracle.upper(), name


def test_pending_replacements_upgrade_rows_only_queries():
    """A staged name colliding with a live registration must be an
    UPGRADE: the live query is rows-only (no oracle), the staged one
    carries a full oracle. New names must not shadow anything."""
    for name, (_fn, oracle) in PENDING_R10.items():
        if name in QUERIES:
            assert name not in ORACLES, f"{name}: live query already has an oracle"
            assert oracle is not None, f"{name}: replacement drops the oracle"


def test_pinned_centroid_margins_dominate_fp_noise():
    """The staged IVF oracles compare UNROUNDED squared-distance argmins
    across engines whose summation ORDERS differ (Spark: sequential
    zip_with fold; DuckDB: unordered SUM over unnest) — safe only if the
    decision margins dwarf reduction-order noise (~dd·ε·dims ≈ 1e-13 at
    dd≈6.5). This pins the measured margins on every harness SF: the
    smallest best-vs-second-best assignment gap and the smallest
    probe-boundary (3rd-vs-4th cell) gap are ≥ 1e-5 — eight orders above
    the noise floor, so a cross-engine argmin flip cannot occur on this
    data. (The sf10 rehearsal corpus replicates sf0.1's embeddings, so
    its margins are identical.) If the testdata ever changes, this test
    re-derives the safety argument or fails loudly BEFORE an oracle
    flake would."""
    import duckdb
    import numpy as np

    from data_integration_spark.queries.similarity_queries import (
        pinned_centroid_grid,
    )

    C = np.array(pinned_centroid_grid())
    for sf in ("0.001", "0.01", "0.1"):
        pdf = duckdb.sql(
            "SELECT embedding FROM "
            f"'/root/testdata/sf{sf}/embeddings.parquet'"
        ).df()
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        s = np.sort(d, axis=1)
        assert (s[:, 1] - s[:, 0]).min() > 1e-5, sf  # assignment argmin
        assert (s[:, 3] - s[:, 2]).min() > 1e-5, sf  # nprobe=3 boundary


@pytest.mark.parametrize("name", sorted(PENDING_R10))
def test_pending_query_matches_oracle(spark, name):
    """Driver-mimic value gate at sf0.001 (identical code paths to the
    sf0.01 driver run): row count + schema + order-insensitive values."""
    fn, oracle = PENDING_R10[name]
    con = duck_connection(SF)
    errors = compare(fn(spark, SF), con, oracle, name)
    assert not errors, errors
