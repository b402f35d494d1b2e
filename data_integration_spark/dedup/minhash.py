"""MinHash + banded LSH near-duplicate detection.

Pipeline (all native expressions, no Python in the hot path):
  shingle (word n-grams) → k min-hashes via seeded xxhash64 → band the
  signature → explode bands → groupBy (band, band_hash) buckets → candidate
  pairs within buckets → exact Jaccard verification on candidates only.

Scale: the corpus is touched twice (shingling, verification); the shuffle
volume is k·|docs| signature entries + candidate pairs — never the O(N²)
pair space. Band/row parameters trade recall for candidate volume exactly
as in the standard S-curve; defaults target Jaccard ≳ 0.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_spark.dedup.components import _truncate_lineage


def shingle_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, shingle) long table of distinct word n-grams."""
    # try_element_at: docs shorter than n tokens must yield NULL (filtered
    # below), not an ANSI out-of-bounds error that kills the job
    concat_parts = ", ' ', ".join(f"try_element_at(ts, i + {j})" for j in range(n))
    expr = (
        f"array_distinct(transform(sequence(1, greatest(size(ts) - {n - 1}, 1)),"
        f" i -> concat({concat_parts})))"
    )
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("ts"))
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("shingle"))
        # docs with fewer than n tokens produce NULL shingles (element_at
        # past the end) — drop them rather than hashing NULL
        .filter(F.col("shingle").isNotNull())
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 2,
    k: int = 64,
    seed: int = 1,
    shingles: DataFrame | None = None,
    with_size: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature: for each of k hash functions, the min of
    ``xxhash64(shingle, salt_j)`` over the doc's shingles — one groupBy, k
    ``min`` aggregates (map-side partials make this one narrow shuffle:
    each mapper emits at most one k-column row per doc it holds, so the
    exchange is ~|docs|·k longs, never |shingle instances|).

    KEEP THIS FORM (r8 measurement): the tempting in-row alternative —
    the shingle set as an array and each hash as
    ``array_min(transform(...))``, zero shuffle — is ~2x SLOWER end to
    end at every SF tried, for two compounding reasons: (a) higher-order
    function lambdas evaluate INTERPRETED, outside whole-stage codegen,
    paying per-element closure overhead on every one of the k·|shingles|
    hash calls, while the explode+groupBy form hashes inside codegen with
    a vectorized min aggregate; (b) k sibling HOF columns referencing one
    shingle-set alias get inlined by CollapseProject (HOFs have no
    codegen CSE), re-shingling each row k times — and even with an
    explode(array(...)) Generate barrier pinning the shingle set to one
    evaluation, (a) alone keeps the in-row form behind. The streaming
    form (with_minhash_signature) accepts that cost because
    dropDuplicates needs a stateless per-row value; the batch path has no
    such constraint."""
    # ``shingles``: an already-derived (id, shingle) table (r15 — callers
    # that also run the exact-verify stage materialize ONE shingle table
    # and feed it to both the signature aggregation and the verifier, so
    # the corpus is shingled exactly once)
    sh = shingles if shingles is not None else shingle_df(df, id_col, text_col, n_gram)
    # r15b: each agg is ONE SQL string (k parser calls) instead of ~4k
    # py4j Column constructions — measured 0.53 s → 0.15 s of driver
    # build time per call at k=64. The int literal types as INT exactly
    # like the previous F.lit(int), so every hash is bit-identical.
    aggs = [
        F.expr(f"min(xxhash64(shingle, {seed * 1000 + j})) as h{j}")
        for j in range(k)
    ]
    if with_size:
        # per-doc shingle-set size in the SAME aggregation pass:
        # shingle_df emits array_distinct'd shingles, so count(*) here
        # equals the verify stage's countDistinct — callers that need
        # sizes skip a whole extra scan+agg of the shingle table.
        # PRECONDITION (ADVICE r15): each doc id must appear in exactly
        # ONE input row (array_distinct dedupes within a row, not across
        # rows) — true for every caller here, whose ids are primary keys
        # of the scanned table. A duplicate-id input would inflate sz
        # (and the verify stage's intersection counts) either way.
        aggs.append(F.expr("count(*) as sz"))
    return sh.groupBy(id_col).agg(*aggs)


def band_buckets(
    sig: DataFrame, id_col: str = "doc_id", k: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band, bh) long table from a signature table (columns h0..h{k-1}):
    each band's ``rows = k // bands`` consecutive min-hashes collapse into one
    64-bit band hash. This IS the persistable LSH index of a corpus release —
    ``similarity/persist.py::save_minhash_index`` writes it once per release
    so later incremental-dedup jobs never re-shingle the old side."""
    assert k % bands == 0
    rows = k // bands
    # r15b: one parsed SQL string instead of ~6·bands py4j Column
    # constructions (same build-chatter fix as minhash_signatures); the
    # int literal and xxhash64 arity match the previous Column form
    # bit-for-bit
    structs = ", ".join(
        "struct({b} as band, xxhash64({cols}) as bh)".format(
            b=b,
            cols=", ".join(f"h{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return sig.select(
        F.col(id_col), F.expr(f"explode(array({structs}))").alias("bb")
    ).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def minhash_lsh_cross_pairs(
    new_df: DataFrame,
    old_df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 2,
    k: int = 64,
    bands: int = 16,
    seed: int = 1,
    verify_threshold: float = 0.5,
    old_buckets: DataFrame | None = None,
    old_shingles: DataFrame | None = None,
) -> DataFrame:
    """CROSS-corpus near-dup: (new_id, old_id, jaccard) pairs where a NEW
    document near-duplicates an OLD one — the batch incremental-dedup path
    (dedup crawl N against releases 1..N−1) that complements the exact
    cross-shard hash anti-join and the streaming signature dedup.

    Same banded-LSH shape as ``minhash_lsh_pairs`` but candidates only form
    ACROSS the corpus boundary (new×old inside a bucket, never new×new or
    old×old), so candidate volume tracks cross-corpus near-dup density.

    Each side is shingled/signed INDEPENDENTLY (never unioned before the
    per-id groupBy), so an id value appearing on both sides — common when
    crawl ids restart per release — stays two distinct documents and simply
    yields a legitimate (new_id == old_id) pair if they really near-match
    (ADVICE r5: the unioned form silently merged such docs' shingle sets).

    ``old_buckets``/``old_shingles`` (columns ``(id, band, bh)`` /
    ``(id, shingle)``) short-circuit the old side's recompute with a
    PERSISTED release index (``similarity/persist.py::load_minhash_index``)
    — at 100 TB the old corpus is banded once per release and every
    subsequent crawl dedups against the artifact; only the new shard is
    shingled. ``old_df`` may then be ``None``; params must match the ones
    the artifact was built with (the loader validates)."""
    assert k % bands == 0
    if old_buckets is None or old_shingles is None:
        if old_df is None:
            raise ValueError(
                "old_df is required unless both old_buckets and old_shingles "
                "are supplied from a persisted index"
            )
    # r15: spread the (usually single-split) scans before the shingle +
    # k-hash kernels — same fix as minhash_lsh_pairs; projection only
    from data_integration_spark.sources.catalog import spread_scan

    new_df = spread_scan(new_df.select(id_col, text_col))
    if old_df is not None:
        old_df = spread_scan(old_df.select(id_col, text_col))
    # each freshly-derived side is shingled exactly ONCE (r15): the
    # materialized table feeds that side's signature aggregation AND its
    # verify stage; shingle tables stay per-side so same-id docs never
    # merge. A side loaded from the persisted index is already a parquet
    # scan and is left lazy.
    sh_new = _truncate_lineage(shingle_df(new_df, id_col, text_col, n_gram))
    # r15b (same shape as minhash_lsh_pairs): materialize the new side's
    # SIGNATURE table with the per-doc size fused into the one 64-hash
    # aggregation — its two consumers (band derivation, verify sizes)
    # would otherwise replicate the aggregation subtree, and the
    # separate countDistinct pass over the shingle table disappears.
    sig_new = _truncate_lineage(minhash_signatures(
        new_df, id_col, text_col, n_gram, k, seed, shingles=sh_new,
        with_size=True,
    ))
    b_new = band_buckets(sig_new, id_col, k, bands).withColumnRenamed(
        id_col, "new_id"
    )
    sz_new = sig_new.select(F.col(id_col), F.col("sz").alias("sz1"))
    sh_old = old_shingles
    if sh_old is None:
        sh_old = _truncate_lineage(shingle_df(old_df, id_col, text_col, n_gram))
    if old_buckets is None:
        # freshly-derived old side: same fused materialization
        sig_old = _truncate_lineage(minhash_signatures(
            old_df, id_col, text_col, n_gram, k, seed, shingles=sh_old,
            with_size=True,
        ))
        old_buckets = band_buckets(sig_old, id_col, k, bands)
        sz_old = sig_old.select(F.col(id_col), F.col("sz").alias("sz2"))
    else:
        # persisted-index old side: the release artifact stores buckets +
        # shingles (no signature table), so sizes come from the shingle
        # scan exactly as before
        sz_old = sh_old.groupBy(id_col).agg(
            F.countDistinct("shingle").alias("sz2")
        )
    b_old = old_buckets.withColumnRenamed(id_col, "old_id")
    cand = (
        b_new.join(b_old, ["band", "bh"]).select("new_id", "old_id").distinct()
    )
    s1 = sh_new.select(F.col(id_col).alias("new_id"), F.col("shingle"))
    s2 = sh_old.select(F.col(id_col).alias("old_id"), F.col("shingle"))
    inter = (
        cand.join(s1, "new_id")
        .join(s2, ["old_id", "shingle"])
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    return (
        inter.join(
            sz_new.withColumnRenamed(id_col, "new_id"), "new_id"
        )
        .join(sz_old.withColumnRenamed(id_col, "old_id"), "old_id")
        .select("new_id", "old_id", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sig",
    n_gram: int = 2,
    k: int = 16,
    seed: int = 1,
    base: str = "xxhash64",
) -> DataFrame:
    """STATELESS per-row MinHash signature: one 64-bit hash of the k
    per-row min-hashes — no explode, no groupBy, NO SHUFFLE. The shingle
    set stays an array inside the row and each min-hash is an
    ``array_min(transform(...))`` over it.

    Collision semantics (be precise — ADVICE r5): two docs share ``out_col``
    only when ALL k min-hashes collide, probability ≈ J^k. This is
    EXACT/ULTRA-NEAR dedup (identical shingle sets collide always; a J=0.9
    pair at k=16 collides with p≈0.18), NOT the banded near-dup recall of
    ``minhash_lsh_pairs`` — use the banded path when the target is a
    near-dup CLASS rather than exact-copy collapse. The single-value form
    is what makes it a legal streaming ``dropDuplicates`` key.

    This is the streaming-safe form (``q_streaming_minhash_dedup``): a
    file/Kafka stream computes it per micro-batch row and feeds
    ``dropDuplicates`` directly — the only state is the dedup operator's
    signature set, the incremental registry of everything the growing
    corpus has seen. Batch callers get the identical value, so
    stream-vs-batch equivalence is exact (tests/test_index_persist.py).

    Degenerate rows (fewer than ``n_gram`` tokens → empty shingle set)
    all collapse to the same all-NULL signature — empty docs dedup to one
    survivor, the curation semantics you want anyway. WHICH doc survives a
    multi-doc class is arrival-order-dependent under ``dropDuplicates``;
    callers needing a deterministic survivor canonicalize to
    ``min(id)`` per signature (as ``q_streaming_minhash_dedup`` does).

    ``base`` picks the per-shingle hash family:
    - ``"xxhash64"`` (default) — cheapest JVM hash, the throughput path;
      not recomputable outside Spark.
    - ``"md5"`` — PORTABLE: hash_j(s) = int64(md5(f"{seed*1000+j}:{s}")
      [:15 hex]) and the signature is md5 of the comma-joined mins, every
      step a builtin any engine shares, so DuckDB/Trino recompute the
      SIGNATURE CLASS PARTITION value-for-value (this is what makes
      ``q_streaming_minhash_dedup`` full-oracle-checkable — the class
      structure itself is verified, not just row counts). ~k md5s per
      shingle instead of k xxhash64s; the class partition is the true
      minhash one either way (distinct sets collide at p ≈ J^k).
    """
    if base not in ("xxhash64", "md5"):
        raise ValueError(f"unknown base hash {base!r}")
    concat_parts = ", ' ', ".join(
        f"try_element_at(_mh_ts, i + {j})" for j in range(n_gram)
    )
    shingles = (
        f"filter(array_distinct(transform("
        f" sequence(1, greatest(size(_mh_ts) - {n_gram - 1}, 1)),"
        f" i -> concat({concat_parts}))), s -> s IS NOT NULL)"
    )
    # per-shingle hash_j as SQL over the k-index lambda var `j` (int32,
    # matching the previous F.lit(seed*1000+j) int literal bit-for-bit)
    if base == "xxhash64":
        hash_sql = f"xxhash64(s, {seed * 1000} + j)"
    else:
        hash_sql = (
            f"cast(conv(substring(md5(concat("
            f"cast({seed * 1000} + j as string), ':', s)), 1, 15),"
            f" 16, 10) as bigint)"
        )
    # all k mins in ONE nested-transform expression behind an
    # explode(array(...)) GENERATE BARRIER (the r8 minhash lesson, see
    # minhash_signatures' docstring): k sibling HOF columns over the
    # _mh_sh alias would be CollapseProject-inlined (HOFs have no codegen
    # CSE), re-shingling every row k times; a Generate node evaluates its
    # generator exactly once per row, and the signature hash above it
    # reads plain array gathers. The per-row statelessness dropDuplicates
    # needs is preserved (one input row → exactly one output row).
    mins = (
        f"transform(sequence(0, {k - 1}),"
        f" j -> array_min(transform(_mh_sh, s -> {hash_sql})))"
    )
    gen = (
        df.withColumn("_mh_ts", F.split(F.col(text_col), " "))
        .withColumn("_mh_sh", F.expr(shingles))
        .withColumn("_mh_mins", F.explode(F.array(F.expr(mins))))
    )
    elems = [F.col("_mh_mins").getItem(j) for j in range(k)]
    if base == "xxhash64":
        sig = F.xxhash64(*elems)
    else:
        # concat_ws skips NULLs: the all-NULL (empty-shingle-set) row maps
        # to md5("") on both engines
        sig = F.md5(F.concat_ws(",", *[e.cast("string") for e in elems]))
    return gen.withColumn(out_col, sig).drop("_mh_ts", "_mh_sh", "_mh_mins")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 2,
    k: int = 64,
    bands: int = 16,
    seed: int = 1,
    verify_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact shingle Jaccard.

    Returns (d1, d2, jaccard) with jaccard ≥ verify_threshold — candidates
    that fail exact verification are dropped, so precision is exact and only
    recall depends on (k, bands).

    ``max_bucket_size`` caps the candidate blow-up of degenerate buckets
    (e.g. thousands of near-empty or identical docs landing in one band
    bucket, whose pair space is quadratic in the bucket size): buckets over
    the cap are SPLIT into ceil(size/cap) salted sub-buckets, bounding
    candidates at O(size·cap) instead of O(size²). The salt is a
    deterministic per-doc hash (the same split in every band — a
    band-varying salt would restore near-quadratic volume across bands when
    every band is degenerate). Recall trade: pairs across sub-buckets of a
    degenerate bucket are lost; that regime is overwhelmingly identical /
    near-empty documents, which the exact-dedup stage (run first in the
    curation pipeline) already collapses. ``None`` disables the cap."""
    assert k % bands == 0
    # r15: spread the (usually single-split) scan before the two
    # CPU-heavy kernels (shingle explode + 64 seeded hashes, and the
    # verify-side shingle explode) — both materialization jobs below
    # otherwise run the whole corpus through one task. Narrow projection
    # only; identical rows, any partitioning.
    from data_integration_spark.sources.catalog import spread_scan

    df = spread_scan(df.select(id_col, text_col))
    # r15 optimization: the corpus is shingled exactly ONCE — the
    # materialized (id, shingle) table feeds the signature aggregation
    # here AND the exact-verify stage below (it is one half of the
    # artifact save_minhash_index persists per release).
    sh = _truncate_lineage(shingle_df(df, id_col, text_col, n_gram))
    # r15b: materialize the SIGNATURE table (one narrow row per doc,
    # k+1 longs) instead of the exploded band table — its three band
    # consumers below re-derive the bands lazily (16 xxhash64 + explode
    # over the checkpointed rows, no shuffle, no scan), and the fused
    # per-doc `sz` column replaces a whole extra scan+agg of the shingle
    # table in the verify stage. The 64-minhash aggregation still runs
    # exactly once.
    sig = _truncate_lineage(minhash_signatures(
        df, id_col, text_col, n_gram, k, seed, shingles=sh, with_size=True
    ))
    buckets = band_buckets(sig, id_col, k, bands)
    join_keys = ["band", "bh"]
    if max_bucket_size is not None:
        sizes_b = buckets.groupBy("band", "bh").agg(F.count("*").alias("_bsz"))
        n_sub = F.ceil(F.col("_bsz") / F.lit(max_bucket_size)).cast("long")
        buckets = (
            buckets.join(sizes_b, ["band", "bh"])
            .withColumn(
                "sub", F.pmod(F.xxhash64(F.col(id_col)), n_sub)
            )
            .drop("_bsz")
        )
        join_keys = ["band", "bh", "sub"]
    left = buckets.select(F.col(id_col).alias("d1"), *join_keys)
    right = buckets.select(F.col(id_col).alias("d2"), *join_keys)
    cand = (
        left.join(right, join_keys)
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # r16 (VERDICT r15 #6, guide §3.2): materialize the candidate-pair
    # table once (it now has three consumers: the id semi-join below and
    # both verify joins — un-materialized, the bucket join + distinct
    # would replicate into each) and semi-join the shingle table down to
    # DOCS THAT APPEAR IN SOME CANDIDATE PAIR before the verify-side
    # shuffles. Docs outside every candidate pair contribute nothing to
    # the intersection counts, so the output is value-identical; at scale
    # the verify exchanges carry |candidate docs| shingle rows instead of
    # the whole corpus's. ``cand`` is near-dup-density-sized — the same
    # magnitude the verify stage already shuffles.
    cand = _truncate_lineage(cand)
    cand_ids = (
        cand.select(F.col("d1").alias(id_col))
        .union(cand.select(F.col("d2").alias(id_col)))
        .distinct()
    )
    sh_v = sh.join(cand_ids, id_col, "left_semi")
    # exact verification on candidates only, over the SAME materialized
    # shingle table the signatures were built from (both verify join
    # sides — pre-r15 each branch re-derived it from the text). Sizes
    # ride the signature aggregation (count(*) over the array_distinct'd
    # shingles == the retired per-branch countDistinct, value for value).
    sizes = sig.select(F.col(id_col), F.col("sz"))
    s1 = sh_v.select(F.col(id_col).alias("d1"), F.col("shingle"))
    s2 = sh_v.select(F.col(id_col).alias("d2"), F.col("shingle"))
    inter = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i").cast("double") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    # sizes is one row per DOCUMENT — no broadcast hint (a forced hint would
    # driver-collect a corpus-sized table at scale; AQE broadcasts only
    # while it genuinely fits)
    return (
        inter.join(sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1")), "d1")
        .join(sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2")), "d2")
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )


def edit_verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lev_cap: int = 128,
    sim_num: int = 4,
    sim_den: int = 5,
) -> DataFrame:
    """Character-level EDIT-DISTANCE verify tier over an already
    shingle-verified near-dup pair set (the second verification stage a
    production dedup pipeline runs: shingle Jaccard is blind to word
    ORDER and repetition, so a doc concatenated with itself — or a
    shuffled copy — scores J ≈ 1 while being a different document at
    the character level; Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better" dedups on exact character spans for
    the same reason). Emits per pair:

    - ``lev``       — Levenshtein distance, computed with Spark's
      BANDED builtin ``levenshtein(t1, t2, lev_cap)`` (-1 past the
      cap): the O(len·cap) band is the production knob — unbounded
      Levenshtein is O(len²) per pair, and past the cap the exact
      distance is irrelevant (the pair is already 'far' at character
      level);
    - ``edit_sim``  — 1 − lev/max(len), on the 6-decimal grid (NULL
      when the band was exceeded);
    - ``tier``      — 'exact' (lev = 0), 'near_exact' (edit_sim ≥
      sim_num/sim_den, decided by the INTEGER sign test
      sim_den·(mx − lev) ≥ sim_num·mx — no float ever decides a
      tier), else 'band_far'.

    ``lev_cap`` must be ≥ ceil((1 − sim_num/sim_den) · max doc length)
    for the tier decision to be exact (a capped pair could otherwise
    have been near_exact); callers size it off the corpus length cap
    the way the registered query does.

    Scale shape: ``pairs`` is near-dup-density-sized (the banded-LSH +
    Jaccard-verify output, never O(N²)); two equi-joins fetch the two
    texts (AQE broadcasts the pair side while it fits), and the edit
    computation is a narrow whole-stage-codegen map over the joined
    rows — no Python, no extra shuffle."""
    t1 = docs.select(F.col(id_col).alias("d1"), F.col(text_col).alias("t1"))
    t2 = docs.select(F.col(id_col).alias("d2"), F.col(text_col).alias("t2"))
    lev = F.levenshtein("t1", "t2", lev_cap)
    mx = F.greatest(F.length("t1"), F.length("t2"))
    extra = [c for c in pairs.columns if c not in ("d1", "d2")]
    return (
        pairs.join(t1, "d1")
        .join(t2, "d2")
        .select(
            "d1",
            "d2",
            *extra,
            lev.cast("long").alias("lev"),
            mx.alias("_mx"),
        )
        .select(
            "d1",
            "d2",
            *extra,
            "lev",
            F.when(F.col("lev") == -1, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.lit(1.0) - F.col("lev") / F.col("_mx"), 6
                )
            )
            .alias("edit_sim"),
            F.when(F.col("lev") == 0, F.lit("exact"))
            .when(
                (F.col("lev") != -1)
                & (
                    sim_den * (F.col("_mx") - F.col("lev"))
                    >= sim_num * F.col("_mx")
                ),
                F.lit("near_exact"),
            )
            .otherwise(F.lit("band_far"))
            .alias("tier"),
        )
    )
