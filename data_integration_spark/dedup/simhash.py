"""SimHash near-duplicate fingerprints.

64-bit SimHash per document: each token votes ±1 on every bit of its
xxhash64; the sign of the per-bit vote sum is the fingerprint bit.
Near-duplicates = fingerprints within a small Hamming distance.

Implementation is a native expression pipeline: explode tokens → one row per
(doc, token) → per-bit vote columns via bitwise ops → groupBy(doc) sums →
sign bits recombined. No Python UDFs; the shuffle is one groupBy(doc_id)
with map-side partial sums of 64 small ints.

Pairing at scale: exact Hamming-≤d search uses the pigeonhole trick — split
the 64-bit fingerprint into (d+1) blocks; any pair within distance d agrees
on ≥1 block, so blocks serve as LSH keys (join per block, verify distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_spark.dedup.components import _truncate_lineage


def _simhash(df: DataFrame, id_col: str, text_col: str, h, bits: int) -> DataFrame:
    """Shared vote/sign pipeline: tokens vote ±1 on every bit of their
    hash ``h(tok)``; the sign of each per-doc vote sum is the fingerprint
    bit. One groupBy(doc) shuffle with map-side partial sums of ``bits``
    small ints. The scan is spread first (r15, guide §2.5): the vote
    stage — ``bits`` hash/shift/when columns per token row — otherwise
    runs single-core above a single-split input; the exchange carries
    only (id, text) once and vote sums are integers (order-free)."""
    from data_integration_spark.sources.catalog import spread_scan

    toks = spread_scan(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    # r15b: each per-bit expression is ONE parsed SQL string instead of
    # ~6 py4j Column constructions (the minhash_signatures build-chatter
    # fix) — expressions are the exact SQL the Column form compiled to
    hv = h(F.col("tok")).alias("_hv")
    votes = toks.select(F.col(id_col), hv).select(
        F.col(id_col),
        *[
            F.expr(
                f"if((shiftrightunsigned(_hv, {b}) & 1) = 1, 1, -1) as b{b}"
            )
            for b in range(bits)
        ],
    )
    sums = votes.groupBy(id_col).agg(
        *[F.expr(f"sum(b{b}) as b{b}") for b in range(bits)]
    )
    terms = []
    for b in range(bits):
        # bit 63 of a signed 64-bit value is the sign bit: -(2^63)
        bit_val = (1 << b) if b < 63 else -(1 << 63)
        terms.append(
            f"if(b{b} > 0, cast({bit_val} as bigint), cast(0 as bigint))"
        )
    # left-associated chain, exactly the previous Column `+` fold
    sim_sql = "cast(0 as bigint)"
    for t in terms:
        sim_sql = f"({sim_sql} + {t})"
    return sums.select(F.col(id_col), F.expr(f"{sim_sql} as simhash"))


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", seed: int = 3
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash of whitespace tokens. Bit source
    xxhash64: the THROUGHPUT variant (cheapest JVM hash) used by
    simhash_near_pairs; not recomputable outside Spark — use
    ``simhash_portable`` when cross-engine value verification matters."""
    return _simhash(
        df, id_col, text_col, lambda c: F.xxhash64(c, F.lit(seed)), 64
    )


def simhash_portable(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — PORTABLE 60-bit SimHash: the bit source is the
    first 15 hex chars of md5(token) (60 bits — the widest hex prefix
    that fits a positive signed 64-bit int), so any engine with md5 —
    DuckDB, Trino, Postgres — recomputes the fingerprint bit-for-bit.
    Same vote/sign algorithm as ``simhash64``; md5 costs a few ns more
    per token than xxhash64 (both JVM-codegen builtins) — the price of a
    full cross-engine value oracle on the registered query. Hamming
    semantics are unchanged (60 usable bits; pigeonhole pairing works
    identically)."""
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    return _simhash(df, id_col, text_col, h, 60)


def hamming64(a, b):
    """Population count of XOR — native bit_count (Spark ≥ 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))


def hamming_near_pairs(
    sig: DataFrame,
    bits: int,
    max_distance: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """GENERIC pigeonhole block join over any (id, fingerprint) table:
    all pairs with Hamming(fingerprint) ≤ d, exact recall BY THEOREM —
    split the ``bits``-wide fingerprint into d+1 blocks; a pair within
    distance d has ≤ d differing bits, which cannot touch all d+1
    blocks, so it agrees exactly on ≥ 1 block and the blocks are
    exact-recall LSH keys. Pair space = per-block collisions, never
    O(N²). Shared by text SimHash (``simhash_near_pairs``) and the
    perceptual image dHash (``multimodal/binary_ops.py::image_dhash``) —
    one pairing engine for every Hamming-space fingerprint family.

    SCALE SIZING: random-fingerprint candidate volume ≈
    N²·(d+1)·2^(−width) with width = bits//(d+1). 56 bits at d=3 (14-bit
    blocks) keeps the join linear-ish to ~10⁷ images (measured: 500k
    images → 750k true pairs + ~0 random collisions, 15 s local). This
    single-long implementation supports ``bits ≤ 64`` with block width
    ``bits // (d+1)`` in [1, 63] (the fingerprint lives in one int64;
    wider block masks don't fit LongType) — at 10⁸–10⁹
    items, where wider blocks are needed, extend the fingerprint to
    MULTIPLE long columns (one per block, e.g. a 256-bit hash as 4
    64-bit block columns: join per block column, sum per-block
    bit_counts for the distance). Recall stays exact at any width;
    width only buys candidate pruning."""
    n_blocks = max_distance + 1
    if max_distance < 0 or bits > 64:
        raise ValueError(
            f"need 0 <= max_distance and bits <= 64 (single-long "
            f"fingerprint), got bits={bits}, max_distance={max_distance}"
        )
    width = bits // n_blocks
    if not (1 <= width <= 63):
        # width 0 collapses every block key to 0 and the join silently
        # degrades to the O(N²) cross product this function exists to
        # avoid; width 64's mask (2⁶⁴−1) does not fit a Spark long
        raise ValueError(
            f"block width bits//(max_distance+1) = {width} outside "
            f"[1, 63]: raise bits or max_distance"
        )
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col(sig_col), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bv"),
            )
            for i in range(n_blocks)
        ]
    )
    keyed = sig.select(
        F.col(id_col), F.col(sig_col), F.explode(blocks).alias("b")
    ).select(
        F.col(id_col), sig_col, F.col("b.blk").alias("blk"), F.col("b.bv").alias("bv")
    )
    left = keyed.select(
        F.col(id_col).alias("d1"), F.col(sig_col).alias("s1"), "blk", "bv"
    )
    right = keyed.select(
        F.col(id_col).alias("d2"), F.col(sig_col).alias("s2"), "blk", "bv"
    )
    return (
        left.join(right, ["blk", "bv"])
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1", "d2", hamming64(F.col("s1"), F.col("s2")).alias("distance")
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )


def hamming_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    bits: int,
    max_distance: int = 3,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """CROSS-corpus pigeonhole block join: all (left id, right id) pairs
    with Hamming(fingerprint) ≤ d — the two-sided sibling of
    ``hamming_near_pairs`` (same exact-recall theorem: a pair within
    distance d agrees exactly on ≥ 1 of the d+1 blocks), for the
    incremental-dedup shape where a NEW batch pairs against an EXISTING
    fingerprint registry and within-side pairs are out of scope (the
    ``minhash_cross_dedup`` policy, in Hamming space). Callers keep the
    two sides id-disjoint; output is (d1 = left id, d2 = right id,
    distance), deduplicated across block collisions. Candidate volume =
    per-(block, value) cross collisions — |L|·|R|-proportional only on
    planted near-dups, never the full cross product."""
    n_blocks = max_distance + 1
    if max_distance < 0 or bits > 64:
        raise ValueError(
            f"need 0 <= max_distance and bits <= 64, got bits={bits}, "
            f"max_distance={max_distance}"
        )
    width = bits // n_blocks
    if not (1 <= width <= 63):
        raise ValueError(
            f"block width bits//(max_distance+1) = {width} outside "
            f"[1, 63]: raise bits or max_distance"
        )

    def keyed(sig: DataFrame, id_out: str, sig_out: str) -> DataFrame:
        blocks = F.array(
            *[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftrightunsigned(F.col(sig_col), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bv"),
                )
                for i in range(n_blocks)
            ]
        )
        return sig.select(
            F.col(id_col).alias(id_out),
            F.col(sig_col).alias(sig_out),
            F.explode(blocks).alias("b"),
        ).select(
            id_out, sig_out, F.col("b.blk").alias("blk"), F.col("b.bv").alias("bv")
        )

    return (
        keyed(left, "d1", "s1")
        .join(keyed(right, "d2", "s2"), ["blk", "bv"])
        .select(
            "d1", "d2", hamming64(F.col("s1"), F.col("s2")).alias("distance")
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )


def simhash_near_pairs(
    df: DataFrame,
    max_distance: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 3,
    base: str = "xxhash64",
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ d via the pigeonhole block join —
    exact (100% recall for the distance bound — any pair within distance d
    agrees on at least one of the d+1 blocks, a theorem not a tuning),
    never O(N²). ``base="md5"`` pairs over the portable 60-bit fingerprint
    instead (bit-identical cross-engine, see ``simhash_portable``)."""
    bits = 64 if base == "xxhash64" else 60
    sig = (
        simhash64(df, id_col, text_col, seed)
        if base == "xxhash64"
        else simhash_portable(df, id_col, text_col)
    )
    # r15: materialize the 16-byte fingerprints once — the pigeonhole
    # join otherwise re-runs the whole token-vote pipeline on BOTH sides
    # (the q_image_dedup_dhash double-decode fix); fresh per invocation
    sig = _truncate_lineage(sig)
    return hamming_near_pairs(
        sig, bits=bits, max_distance=max_distance, id_col=id_col
    )
