"""Staging-block contract (``PENDING_R10``) + the pinned-centroid
float-safety pin.

The round-9 staged payload (3 multimodal t2 certificates, the
pinned-centroid IVF persist/append full-oracle upgrades,
q_image_dedup_dhash) flipped into ``@register`` at the r10 window, so the
staged block is EMPTY again — its entries are now live registry names
covered by the full-registry gates (tests/test_oracle_parity.py at
sf0.001, the sf0.01/sf0.1 sweeps, the registry-wide plan lint). This file
keeps two things:

1. the staging-block well-formedness contract, so any FUTURE
   ``register_pending`` use is linted the way the r9 payload was;
2. the pinned-centroid margin pin — it guards the now-LIVE
   q_ann_ivf_persist / q_ann_ivf_append oracles' one unrounded
   cross-engine comparison, so it outlives the staging block.
"""

from __future__ import annotations

from data_integration_spark.queries import (
    ORACLES,
    PENDING_R10,
    QUERIES,
    load_all,
)

load_all()


def test_pending_block_drained_after_r15_flip():
    """Every previously staged name is LIVE — the r10 flip (r9 payload),
    the r12 flip (r11 payload), the r13 flip (the 9-entry r12 payload:
    F-S linkage family, Misra-Gries batch + streaming, GK quantiles, OPQ,
    planted streaming semantic dedup), the r14 flip (the 4-entry r13
    payload: NB quality filter, cross-modal dedup, KMV overlap, survey
    covmat) and the r15 flip (the 5-entry r14 payload: SemDeDup mapping +
    corpus map, URL canonicalize + crawl frontier, NB threshold
    calibration) all happened exactly as staged. q_linkage_fs_score is the
    linkage trio's contract-permitted rows-only member (its full-oracle
    certificate sibling is q_linkage_certificate), so it registers
    WITHOUT an oracle by design."""
    for name in (
        "q_multimodal_audio_features",
        "q_multimodal_resize",
        "q_multimodal_video_frames",
        "q_image_dedup_dhash",
        "q_ann_ivf_persist",
        "q_ann_ivf_append",
        "q_streaming_bloom",
        "q_bpe_apply",
        # r13 flip
        "q_streaming_semantic_dedup_planted",
        "q_heavy_hitters_mg",
        "q_quantile_sketch",
        "q_streaming_heavy_hitters",
        "q_ann_opq",
        "q_linkage_patterns",
        "q_linkage_fs_score",
        "q_linkage_certificate",
        "q_streaming_linkage",
        # r14 flip
        "q_quality_nb_filter",
        "q_crossmodal_dedup",
        "q_overlap_kmv",
        "q_survey_covmat",
        # r15 flip
        "q_semdedup",
        "q_corpus_map",
        "q_url_canonicalize",
        "q_crawl_frontier",
        "q_quality_calibration",
    ):
        assert name in QUERIES, name
        if name != "q_linkage_fs_score":
            assert name in ORACLES, f"{name} lost its full oracle at the flip"
    assert "q_linkage_fs_score" not in ORACLES  # rows-only by design


def test_any_future_staged_entry_is_well_formed():
    """A future staged entry must be the shape a flip expects: a callable
    plus a FULL oracle, OR — the registry's own escape hatch — a
    rows-only entry staged TOGETHER with a full-oracle certificate
    sibling (same ``q_<family>_`` prefix, the q_linkage_fs_score /
    q_linkage_certificate pairing); a name collision must be an upgrade
    of a rows-only live query, never an oracle-dropping shadow."""
    for name, (fn, oracle) in PENDING_R10.items():
        assert callable(fn), name
        if oracle is None:
            fam = "_".join(name.split("_")[:2])  # e.g. 'q_linkage'
            siblings = [
                o
                for n, (_f, o) in PENDING_R10.items()
                if n != name and n.startswith(fam + "_") and o is not None
            ]
            assert siblings, (
                f"{name}: rows-only staged entry without a staged "
                "full-oracle certificate sibling"
            )
        else:
            assert isinstance(oracle, str) and "SELECT" in oracle.upper(), name
        if name in QUERIES:
            assert name not in ORACLES, f"{name}: live query already has an oracle"


def test_pinned_centroid_margins_dominate_fp_noise():
    """The pinned-centroid IVF oracles (q_ann_ivf_persist/_append, LIVE
    since the r10 flip) compare UNROUNDED squared-distance argmins across
    engines whose summation ORDERS differ (Spark: sequential zip_with
    fold; DuckDB: unordered SUM over unnest) — safe only if the decision
    margins dwarf reduction-order noise (~dd·ε·dims ≈ 1e-13 at dd≈6.5).
    This pins the measured margins on every harness SF: the smallest
    best-vs-second-best assignment gap and the smallest probe-boundary
    (3rd-vs-4th cell) gap are ≥ 1e-5 — eight orders above the noise
    floor, so a cross-engine argmin flip cannot occur on this data. (The
    sf10 rehearsal corpus replicates sf0.1's embeddings, so its margins
    are identical.) If the testdata ever changes, this test re-derives
    the safety argument or fails loudly BEFORE an oracle flake would."""
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


def test_staged_entries_match_their_oracles():
    """Every staged entry passes the SAME DuckDB parity gate the live
    registry rides (sf0.001) — the flip at its signing window is
    attestation, not discovery (the r9-payload discipline)."""
    import pytest

    from tests.oracle_harness import compare, duck_connection

    sf = "/root/testdata/sf0.001"
    if not PENDING_R10:
        pytest.skip("staging block empty")
    from data_integration_spark.session import get_spark

    spark = get_spark(app_name="pending-parity", shuffle_partitions=8)
    con = duck_connection(sf)
    for name, (fn, oracle) in PENDING_R10.items():
        if oracle is None:  # rows-only staged entry (certificate-paired)
            assert fn(spark, sf).count() >= 0, name
            continue
        errs = compare(fn(spark, sf), con, oracle, name)
        assert not errs, (name, errs)
