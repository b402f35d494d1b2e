"""Property tests for the pure-Python multimodal codecs (no Spark jobs —
the Arrow/mapInPandas plumbing is covered by the deterministic Spark tests
and the oracle certificates; here Hypothesis sweeps the CODEC arithmetic
itself, the same discipline that caught the survey-SE cancellation in r8).

Targets:
- BMP pixel encode/decode round-trip at arbitrary dims (row padding: every
  width % 4 residue class), including the bottom-up flip cancelling;
- the nearest-neighbor resample index map vs a brute-force per-pixel
  reference (down- AND up-sampling, the exact floor-map contract the
  staged resize certificate's oracle arithmetic assumes);
- WAV 16-bit quantize/encode/decode round-trip incl. clipping and stereo
  interleave (the staged audio certificate's fixture path).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_integration_spark.multimodal import binary_ops as B


@settings(max_examples=60, deadline=None)
@given(
    height=st.integers(1, 9),
    width=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_pixel_roundtrip_any_dims(height, width, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
    out = B._decode_bmp_pixels(B._encode_bmp_pixels(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@settings(max_examples=80, deadline=None)
@given(
    src_h=st.integers(1, 10),
    src_w=st.integers(1, 10),
    out_h=st.integers(1, 10),
    out_w=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_index_map_matches_bruteforce(src_h, src_w, out_h, out_w, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(src_h, src_w, 3), dtype=np.uint8)
    got = B._resize_pixels(arr, out_w, out_h)
    assert got.shape == (out_h, out_w, 3)
    for i in range(out_h):
        for j in range(out_w):
            assert np.array_equal(
                got[i, j], arr[(i * src_h) // out_h, (j * src_w) // out_w]
            )


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(
        st.floats(-2.0, 2.0, allow_nan=False), min_size=1, max_size=64
    ),
    rate=st.integers(1, 48000),
)
def test_wav_quantize_roundtrip(samples, rate):
    x = np.asarray(samples)
    nch, r, nframes, decoded = B._wav_samples(B.encode_wav(x, rate=rate))
    assert (nch, r, nframes) == (1, rate, len(samples))
    want = np.round(np.clip(x, -1.0, 1.0) * 32767.0) / 32768.0
    assert np.array_equal(decoded, want)


@settings(max_examples=40, deadline=None)
@given(
    frames=st.lists(
        st.floats(-1.0, 1.0, allow_nan=False), min_size=2, max_size=64
    ).filter(lambda xs: len(xs) % 2 == 0),
)
def test_wav_stereo_interleave_roundtrip(frames):
    x = np.asarray(frames)
    nch, _r, nframes, decoded = B._wav_samples(B.encode_wav(x, n_channels=2))
    assert (nch, nframes) == (2, len(frames) // 2)
    assert np.array_equal(decoded, np.round(x * 32767.0) / 32768.0)


@settings(max_examples=50, deadline=None)
@given(
    factor=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_dhash_invariant_under_integer_nn_upscale(factor, seed):
    """The perceptual property that makes dHash a NEAR-dup fingerprint:
    an integer-factor nearest-neighbor upscale of an image hashes
    IDENTICALLY (the 8×(7+1) resample picks exactly the original pixels
    back: (i*(8f))//8 = i*f, a pixel the upscale copied from source i)."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    up = arr.repeat(factor, axis=0).repeat(factor, axis=1)
    h1 = B._dhash_bits(B._encode_bmp_pixels(arr), 7, 8)
    h2 = B._dhash_bits(B._encode_bmp_pixels(up), 7, 8)
    assert h1 == h2
    assert 0 <= h1 < (1 << 56)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), r=st.integers(0, 7), c=st.integers(0, 6))
def test_dhash_bit_positions_match_definition(seed, r, c):
    """Bit k = r*7 + c of the packed hash equals the (gray[r,c+1] >
    gray[r,c]) comparison computed independently — pins the row-major
    little-endian packing the SQL oracle's bit arithmetic assumes."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    h = B._dhash_bits(B._encode_bmp_pixels(arr), 7, 8)
    gray = arr.astype(np.float64).mean(axis=2)
    want = gray[r, c + 1] > gray[r, c]
    assert ((h >> (r * 7 + c)) & 1 == 1) == want


# every DIB size _parse_bmp_header accepts (BITMAPINFOHEADER + its
# layout-compatible V2/V3/OS2-2.x/V4/V5 extensions) — the r9 ADVICE fix
# located palettes at 14 + dib_size, and VERDICT r9 #5 asks the property
# sweep to cover the MIDDLE sizes (52/56/64), not just 40/108/124
_DIB_SIZES = (40, 52, 56, 64, 108, 124)


def _build_pal_bmp(dib_size, pal_bgr, idx, top_down=False):
    """Hand-assemble a palettized 8-bit BMP with an arbitrary DIB header
    size: [BM header][dib_size-byte info][BGRA palette][padded indices]."""
    import struct

    height, width = idx.shape
    stride = (width + 3) // 4 * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, :width] = idx if top_down else idx[::-1]
    pixels = rows.tobytes()
    pal = b"".join(bytes([b, g, r, 0]) for b, g, r in pal_bgr)
    offset = 14 + dib_size + len(pal)
    header = b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", dib_size, width, -height if top_down else height,
        1, 8, 0, len(pixels), 2835, 2835, len(pal_bgr), len(pal_bgr),
    )
    info += b"\x00" * (dib_size - 40)  # V2/V3/OS2/V4/V5 extension fields
    return header + info + pal + pixels


@settings(max_examples=120, deadline=None)
@given(
    dib_size=st.sampled_from(_DIB_SIZES),
    height=st.integers(1, 6),
    width=st.integers(1, 7),
    n_pal=st.integers(2, 8),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_palettized_bmp_decodes_through_palette_every_dib_size(
    dib_size, height, width, n_pal, top_down, seed
):
    """A palettized 8-bit BMP under EVERY accepted DIB header size must
    decode index-through-palette (BGR), honoring bottom-up vs top-down
    row order and row padding — the color table is located at
    14 + dib_size for all six sizes, so a decode that hardcoded any
    header length would read extension bytes (or palette bytes) as
    pixels for some sampled size."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_pal, 3)).tolist()  # BGR rows
    idx = rng.randint(0, n_pal, size=(height, width)).astype(np.uint8)
    bmp = _build_pal_bmp(dib_size, pal, idx, top_down)
    arr = B._decode_bmp_pixels(bmp)
    want = np.array(pal, dtype=np.uint8)[idx]  # (h, w, 3) BGR, top-down
    assert arr.shape == (height, width, 3)
    assert np.array_equal(arr, want)
    # an index beyond the color table must be a hard failure, not a wrap
    bad = idx.copy()
    bad[0, 0] = n_pal
    try:
        B._decode_bmp_pixels(_build_pal_bmp(dib_size, pal, bad, top_down))
        raise AssertionError("out-of-range palette index decoded")
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    n_bits=st.integers(1, 56),
    frame_len=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_audio_fp_bits_match_definition(n_bits, frame_len, seed):
    """Packed fingerprint bits equal the (E[k+1] > E[k]) comparisons
    recomputed independently from the DECODED samples — pins framing,
    energy formula, comparison direction, and little-endian packing (the
    contract the q_audio_dedup_fingerprint oracle's bit arithmetic
    assumes)."""
    rng = np.random.RandomState(seed)
    amps = rng.uniform(0.1, 0.9, size=n_bits + 1)
    wav = B.encode_wav(np.repeat(amps, frame_len), rate=8000)
    fp = B._audio_fp_bits(wav, frame_len, n_bits)
    _c, _r, _n, x = B._wav_samples(wav)
    e = (x[: (n_bits + 1) * frame_len].reshape(n_bits + 1, frame_len) ** 2).mean(
        axis=1
    )
    want = sum(1 << k for k in range(n_bits) if e[k + 1] > e[k])
    assert fp == want
    assert 0 <= fp < (1 << n_bits)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_audio_fp_invariant_under_volume_change(seed):
    """The perceptual property that makes the energy-difference hash a
    NEAR-dup fingerprint: halving the volume scales every frame energy by
    the same factor, so the fingerprint is unchanged (given energy steps
    comfortably above int16 quantization, as any planted walk uses)."""
    rng = np.random.RandomState(seed)
    amps = 0.5 + np.cumsum(rng.choice([-0.005, 0.005], size=57))
    amps = np.concatenate([[0.5], amps[:-1] + 0.0])
    wav_full = B.encode_wav(np.repeat(amps, 8), rate=8000)
    wav_half = B.encode_wav(np.repeat(amps / 2.0, 8), rate=8000)
    assert B._audio_fp_bits(wav_full, 8, 56) == B._audio_fp_bits(wav_half, 8, 56)


def test_audio_fp_short_payload_raises():
    """A clip shorter than the fingerprint window must fail loudly (the
    mapInPandas wrapper maps that to ok=False), never hash a zero tail."""
    wav = B.encode_wav(np.full(16, 0.5), rate=8000)
    try:
        B._audio_fp_bits(wav, frame_len=8, n_bits=56)
        raise AssertionError("short payload fingerprinted")
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    n_bands=st.integers(2, 8),
    t_steps=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_spectral_fp_bits_match_definition(n_bands, t_steps, seed):
    """Packed multi-band fingerprint bits equal the double-difference
    comparisons recomputed independently from the band-energy matrix —
    pins framing, band split, gradient direction, and packing of the
    full Haitsma–Kalker construction."""
    rng = np.random.RandomState(seed)
    wav = B.encode_wav(rng.uniform(-0.8, 0.8, size=512), rate=8000)
    fp = B._spectral_fp_bits(wav, 64, 32, n_bands, t_steps)
    E = B._wav_band_energies(wav, 64, 32, n_bands)[: t_steps + 1]
    want = 0
    for t in range(t_steps):
        for b in range(n_bands - 1):
            g = (E[t + 1, b] - E[t, b]) - (E[t + 1, b + 1] - E[t, b + 1])
            if g > 0:
                want |= 1 << (t * (n_bands - 1) + b)
    assert fp == want
    assert 0 <= fp < (1 << ((n_bands - 1) * t_steps))


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_spectral_fp_invariant_under_volume_change(seed):
    """Global volume scaling multiplies every band energy by c², so the
    double-difference signs — hence the fingerprint — are unchanged,
    EXCEPT where a gradient sits at the knife edge (|g| within int16
    quantization noise), where the sign is legitimately undefined. The
    check masks those bits using the exact-float recompute of the same
    construction, so a real framing/packing bug still fails while
    quantization-boundary bits cannot flake the run."""
    rng = np.random.RandomState(seed)
    x = rng.uniform(-0.8, 0.8, size=512)
    full = B._spectral_fp_bits(B.encode_wav(x, rate=8000))
    half = B._spectral_fp_bits(B.encode_wav(x / 2.0, rate=8000))
    # exact-float double differences (no WAV quantization) to find
    # knife-edge bits; mask anything within 1e-3 of zero — quantization
    # perturbs band energies by ~1e-4 at this amplitude and n_fft
    win = np.hanning(64)
    frames = np.stack([x[s : s + 64] * win for s in range(0, 512 - 63, 32)])
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    edges = np.linspace(0, power.shape[1], 9).astype(int)
    E = np.stack(
        [power[:, edges[b] : edges[b + 1]].mean(axis=1) for b in range(8)],
        axis=1,
    )[:9]
    d = np.diff(E, axis=0)
    g = d[:, :-1] - d[:, 1:]  # (8, 7)
    solid = 0
    for t in range(8):
        for b in range(7):
            if abs(g[t, b]) > 1e-3:
                solid |= 1 << (t * 7 + b)
    assert (full ^ half) & solid == 0


def test_spectral_fp_validation_and_short_payload():
    import pytest as _pytest

    wav = B.encode_wav(np.full(64, 0.5), rate=8000)  # only 1 frame at hop=32
    with _pytest.raises(ValueError, match="shorter"):
        B._spectral_fp_bits(wav)
    with _pytest.raises(ValueError, match="int64"):
        B._spectral_fp_bits(wav, n_bands=9, t_steps=8)


def test_dct_matrix_is_orthonormal():
    D = B._dct_matrix(32)
    assert np.allclose(D @ D.T, np.eye(32), atol=1e-12)


@settings(max_examples=50, deadline=None)
@given(factor=st.integers(1, 3), seed=st.integers(0, 2**31 - 1))
def test_phash_invariant_under_integer_nn_upscale(factor, seed):
    """Integer-factor NN upscales hash identically (the 32² resample
    picks exactly the original pixels back) — the same perceptual
    contract dHash carries, on the DCT construction."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    up = arr.repeat(factor, axis=0).repeat(factor, axis=1)
    h1 = B._phash_bits(B._encode_bmp_pixels(arr))
    h2 = B._phash_bits(B._encode_bmp_pixels(up))
    assert h1 == h2
    assert 0 <= h1 < (1 << 63)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_phash_ignores_highest_frequency_noise(seed):
    """pHash keys on the low-frequency 8×8 DCT block only: adding a
    Nyquist-frequency checkerboard (±8, the highest 2-D frequency, which
    projects onto coefficient (31, 31) — far outside the block) must not
    change a single bit, while dHash (local gradients) generally would.
    This is the property that makes pHash robust to high-frequency
    noise/compression artifacts."""
    rng = np.random.RandomState(seed)
    base = rng.randint(32, 224, size=(32, 32)).astype(np.float64)
    i = np.arange(32)
    checker = 8.0 * ((-1.0) ** (i[:, None] + i[None, :]))
    a1 = np.repeat(base.astype(np.uint8)[:, :, None], 3, axis=2)
    a2 = np.repeat(
        np.clip(base + checker, 0, 255).astype(np.uint8)[:, :, None], 3, axis=2
    )
    h1 = B._phash_bits(B._encode_bmp_pixels(a1))
    h2 = B._phash_bits(B._encode_bmp_pixels(a2))
    assert bin(h1 ^ h2).count("1") <= 2  # uint8 rounding may graze a bit


def test_phash_fixture_recovery_and_in_group_distances():
    """The q_image_dedup_phash fixture contract end-to-end: the REAL
    decode → gray → resample → DCT → mean-threshold pipeline recovers
    every PLANNED bit (so the SQL oracle's md5 arithmetic states the
    same hashes), and within-group Hamming distances are exactly
    |m1 − m2| — over the full sf0.1 doc_id range plus a sparse sweep
    far beyond it."""
    import pandas as pd

    from data_integration_spark.queries.multimodal_queries import (
        _phash_planned_bits,
    )

    D = B._dct_matrix(32)

    def payload(d):
        bits = _phash_planned_bits(d)
        C = np.zeros((32, 32))
        C[0, 0] = 128.0 * 32.0
        for k in range(63):
            u, v = (k + 1) // 8, (k + 1) % 8
            C[u, v] = 30.0 if bits[k] else -30.0
        pix = D.T @ C @ D
        arr = np.clip(np.rint(pix), 0, 255).astype(np.uint8)
        return B._encode_bmp_pixels(np.repeat(arr[:, :, None], 3, axis=2))

    ids = list(range(0, 5200)) + list(range(5200, 120001, 997))
    for d in ids:
        got = B._phash_bits(payload(d))
        want = sum(1 << k for k, b in enumerate(_phash_planned_bits(d)) if b)
        assert got == want, d
    for g in range(40):
        hs = [B._phash_bits(payload(4 * g + m)) for m in range(4)]
        for a in range(4):
            for b in range(a + 1, 4):
                assert bin(hs[a] ^ hs[b]).count("1") == b - a


def test_hamming_cross_pairs_exact_recall_vs_bruteforce(spark):
    """The two-sided pigeonhole join finds EVERY cross pair at distance
    <= d (the exact-recall theorem, cross form) and nothing else —
    against a brute-force cross product on a planted fixture."""
    import itertools

    from data_integration_spark.dedup.simhash import hamming_cross_pairs

    rng = np.random.RandomState(11)
    base = [int(rng.randint(0, 2**31)) << 20 | int(rng.randint(0, 2**20))
            for _ in range(30)]
    left = [(i, base[i % 30] ^ (1 << (i % 51))) for i in range(60)]
    right = [(1000 + i, base[i % 30] ^ (7 << (i % 40))) for i in range(60)]
    ldf = spark.createDataFrame(left, "doc_id long, simhash long")
    rdf = spark.createDataFrame(right, "doc_id long, simhash long")
    got = {
        (r["d1"], r["d2"], r["distance"])
        for r in hamming_cross_pairs(ldf, rdf, bits=56, max_distance=3).collect()
    }
    want = set()
    for (a, ha), (b, hb) in itertools.product(left, right):
        d = bin((ha ^ hb) & ((1 << 56) - 1)).count("1")
        if d <= 3:
            want.add((a, b, d))
    assert got == want
