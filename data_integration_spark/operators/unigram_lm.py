"""Unigram language-model tokenizer (Kudo 2018, the SentencePiece
unigram model) — the second tokenizer-training family next to BPE
(``operators/bpe.py``): instead of greedy merge learning, a piece
VOCABULARY with probabilities is fit by EM over the segmentation
lattice, and encoding is a Viterbi best-parse.

Reference parity note: the reference notebook (Method_code.Rmd) has no
tokenizer — this is part of the LLM-pipeline extension surface the
brief mandates (tokenizer training is what a pretraining pipeline runs
right after dedup/curation).

Scale design (the ``pq.fit`` bounded-training-set precedent): tokenizer
training at 100 TB ALWAYS runs on a corpus sample — the training set
here is a pure-function-of-id subsample capped to ``cap_chars`` per
doc, so the lattice work is bounded by construction at any corpus
size. Within the sample the E-step is fully distributed: one
``mapInPandas`` pass per iteration emits per-batch pre-aggregated
(piece, expected_count) partials (map-side combine in the kernel
itself), one ``groupBy(piece)`` shuffle of ≤|vocab| distinct keys, and
the driver touches only the ≤|vocab|-row aggregate per iteration (the
``bpe.train_bpe`` one-bounded-collect-per-step shape). The vocabulary
(≤ a few thousand pieces) rides task closures as a plain dict — KBs.

Encoding (``viterbi_encode``) is a narrow distributed map: the frozen
vocab rides the closure; each doc is an independent O(len·max_piece_len)
dynamic program; no shuffle at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG = float("-inf")


def _log_add(a: float, b: float) -> float:
    if a == _NEG:
        return b
    if b == _NEG:
        return a
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _lattice_edges(text: str, vocab: dict[str, float], max_piece_len: int):
    """Yield (start, end, piece, logp) for every vocab piece occurring in
    ``text`` — the segmentation lattice."""
    n = len(text)
    for i in range(n):
        top = min(n, i + max_piece_len)
        for j in range(i + 1, top + 1):
            piece = text[i:j]
            lp = vocab.get(piece)
            if lp is not None:
                yield i, j, piece, lp


def _forward_backward(
    text: str, vocab: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts and log-likelihood of one doc under the
    current unigram model (standard lattice forward-backward in log
    space). Returns ({}, -inf) when the doc cannot be parsed (a char
    outside the vocab) — callers decide whether that is an error."""
    n = len(text)
    edges = list(_lattice_edges(text, vocab, max_piece_len))
    alpha = [_NEG] * (n + 1)
    alpha[0] = 0.0
    by_end: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    by_start: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for i, j, piece, lp in edges:
        by_end[j].append((i, piece, lp))
        by_start[i].append((j, piece, lp))
    for j in range(1, n + 1):
        a = _NEG
        for i, _piece, lp in by_end[j]:
            if alpha[i] != _NEG:
                a = _log_add(a, alpha[i] + lp)
        alpha[j] = a
    z = alpha[n]
    if z == _NEG:
        return {}, _NEG
    beta = [_NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        b = _NEG
        for j, _piece, lp in by_start[i]:
            if beta[j] != _NEG:
                b = _log_add(b, lp + beta[j])
        beta[i] = b
    ec: dict[str, float] = {}
    for i, j, piece, lp in edges:
        if alpha[i] == _NEG or beta[j] == _NEG:
            continue
        post = math.exp(alpha[i] + lp + beta[j] - z)
        ec[piece] = ec.get(piece, 0.0) + post
    return ec, z


#: Finite "unreachable" sentinel for the vectorized lattice kernel: any
#: path through it underflows exp() to exactly 0.0 (e^-1e30 == 0.0 in
#: float64), so it behaves like -inf without NaN-poisoning the numpy
#: max/subtract logsumexp. A doc is unparseable iff its z stays below
#: _UNREACHABLE (mathematically reachable docs have z ≥ -|doc|·|log pmin|,
#: many orders of magnitude above it).
_SENTINEL = -1.0e30
_UNREACHABLE = -1.0e29


def _forward_backward_batch(
    texts: list[str], vocab: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float, int]:
    """Vectorized lattice forward-backward over a BATCH of docs (r15
    optimization, guide §4.2: hand whole batches to NumPy instead of
    per-row Python log-adds — the per-doc results equal
    ``_forward_backward``'s up to float summation order, which the
    trainer's determinism contract absorbs; tests/test_unigram*.py pin
    the values to 1e-9).

    Returns (summed expected counts, summed log-likelihood, count of
    unparseable docs). Empty strings are the caller's problem (skip
    them); None must not appear."""
    import numpy as np

    if not texts:
        return {}, 0.0, 0
    if not vocab:
        return {}, float("-inf"), len(texts)
    pieces = list(vocab)
    pidx = {p: t for t, p in enumerate(pieces)}
    lpv = np.fromiter((vocab[p] for p in pieces), dtype=np.float64)
    n_docs = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64)
    L = int(lens.max())
    W = int(max_piece_len)

    # piece-index lattice: IDX[d, i, l-1] = vocab index of texts[d][i:i+l]
    # (or -1), built with NO per-candidate Python loop: all texts are
    # concatenated and decoded to codepoints (utf-32-le — exact char
    # positions for any unicode), codepoints remap to dense alphabet ids
    # (0 = outside every vocab piece), each length-l window packs its ids
    # into one integer key positionally (injective: ids < base, real
    # pieces never contain id 0), and a searchsorted against the packed
    # vocab keys of that length yields every lattice edge at once.
    LW = L * W
    alph = np.array(sorted({ord(c) for p in pieces for c in p}), dtype=np.int64)
    base = len(alph) + 1
    if base**W >= 2**62:  # pragma: no cover — alphabets are tiny in practice
        raise ValueError("alphabet too large for packed lattice keys")
    codes = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    ins = np.searchsorted(alph, codes)
    np.minimum(ins, len(alph) - 1, out=ins)
    ids = np.where(alph[ins] == codes, ins + 1, 0)
    # per-char doc id / in-doc position / chars remaining in the doc
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    pos_in_doc = np.arange(offs[-1], dtype=np.int64) - offs[doc_of]
    remaining = lens[doc_of] - pos_in_doc
    # packed piece keys per length, sorted, with their vocab indices
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for l in range(1, W + 1):
        keys = [
            (
                sum(
                    (int(np.searchsorted(alph, ord(c))) + 1) * base ** (l - 1 - t)
                    for t, c in enumerate(p)
                ),
                idx,
            )
            for p, idx in pidx.items()
            if len(p) == l
        ]
        if keys:
            keys.sort()
            by_len[l] = (
                np.array([k for k, _ in keys], dtype=np.int64),
                np.array([i for _, i in keys], dtype=np.int32),
            )
    IDX = np.full(n_docs * LW, -1, dtype=np.int32)
    n_chars = int(offs[-1])
    packed = np.zeros(n_chars, dtype=np.int64)
    for l in range(1, W + 1):
        m = n_chars - l + 1  # number of length-l windows in the buffer
        if m <= 0:
            break
        # packed[i] extends the length-(l-1) key at i by the id at i+l-1;
        # windows crossing a doc boundary are masked out via `remaining`
        packed[:m] = packed[:m] * base + ids[l - 1 :]
        vk_vi = by_len.get(l)
        if vk_vi is None:
            continue
        vk, vi = vk_vi
        valid = np.nonzero(remaining >= l)[0]
        pv = packed[valid]
        ins = np.searchsorted(vk, pv)
        np.minimum(ins, len(vk) - 1, out=ins)
        hit = vk[ins] == pv
        hv = valid[hit]
        IDX[doc_of[hv] * LW + pos_in_doc[hv] * W + (l - 1)] = vi[ins[hit]]
    IDX = IDX.reshape(n_docs, L, W)
    edge_mask = IDX >= 0
    LP = np.full((n_docs, L, W), _SENTINEL)
    LP[edge_mask] = lpv[IDX[edge_mask]]

    # forward: alpha[d, j] = logsumexp_l(alpha[d, j-l] + LP[d, j-l, l-1]).
    # Positions nothing reaches sink toward ~k·_SENTINEL (or -inf when
    # the exp-sum underflows to 0 entirely) — both behave as
    # "unreachable" downstream, and the divide warnings log(0) would
    # raise are suppressed here (they are the sentinel design working).
    with np.errstate(divide="ignore"):
        alpha = np.full((n_docs, L + 1), _SENTINEL)
        alpha[:, 0] = 0.0
        for j in range(1, L + 1):
            lmax = min(W, j)
            M = np.empty((n_docs, lmax))
            for l in range(1, lmax + 1):
                M[:, l - 1] = alpha[:, j - l] + LP[:, j - l, l - 1]
            m = M.max(axis=1)
            np.maximum(m, _SENTINEL, out=m)
            alpha[:, j] = m + np.log(np.exp(M - m[:, None]).sum(axis=1))
        z = alpha[np.arange(n_docs), lens]
        n_bad = int((z < _UNREACHABLE).sum())
        if n_bad:
            return {}, float("-inf"), n_bad

        # backward: beta[d, i] = logsumexp_l(LP[d, i, l-1] + beta[d, i+l])
        beta = np.full((n_docs, L + 1), _SENTINEL)
        beta[np.arange(n_docs), lens] = 0.0
        for i in range(L - 1, -1, -1):
            lmax = min(W, L - i)
            M = np.empty((n_docs, lmax))
            for l in range(1, lmax + 1):
                M[:, l - 1] = LP[:, i, l - 1] + beta[:, i + l]
            m = M.max(axis=1)
            np.maximum(m, _SENTINEL, out=m)
            b = m + np.log(np.exp(M - m[:, None]).sum(axis=1))
            # keep the exact 0.0 base at each doc's own end position
            np.maximum(beta[:, i], b, out=beta[:, i])

    # posterior per edge: exp(alpha[i] + lp + beta[i+l] - z); sentinel
    # paths underflow to exactly 0.0, so non-edges and unreachable
    # endpoints contribute nothing (the per-edge skip of the scalar path)
    B3 = np.full((n_docs, L, W), _SENTINEL)
    for l in range(1, min(W, L) + 1):
        B3[:, : L - l + 1, l - 1] = beta[:, l:]
    expo = alpha[:, :L, None] + LP + B3 - z[:, None, None]
    post = np.exp(expo)
    idx_flat = IDX[edge_mask]
    ec_vec = np.bincount(idx_flat, weights=post[edge_mask], minlength=len(pieces))
    present = np.bincount(idx_flat, minlength=len(pieces)) > 0
    ec = {pieces[t]: float(ec_vec[t]) for t in np.nonzero(present)[0]}
    return ec, float(z.sum()), 0


def seed_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_count: int = 2,
    seed_size: int = 512,
) -> list[tuple[str, int]]:
    """Seed candidate pieces: every substring of length 1..max_piece_len
    with corpus frequency ≥ min_count (single chars always kept
    regardless of count — they guarantee full parseability), capped to
    ``seed_size`` by (count desc, piece asc).

    Distributed: one ``mapInPandas`` pass emits per-batch pre-aggregated
    (piece, cnt) partials, one ``groupBy`` shuffle of ≤|distinct pieces|
    keys; the driver collects only the capped head. ``docs`` is the
    BOUNDED training sample by contract (see module docstring)."""
    import pandas as pd

    def count_batch(batches):
        for pdf in batches:
            counts: dict[str, int] = {}
            for text in pdf[text_col]:
                if text is None:
                    continue
                n = len(text)
                for i in range(n):
                    top = min(n, i + max_piece_len)
                    for j in range(i + 1, top + 1):
                        piece = text[i:j]
                        counts[piece] = counts.get(piece, 0) + 1
            if counts:
                yield pd.DataFrame(
                    {"piece": list(counts), "cnt": list(counts.values())}
                )

    agg = (
        docs.select(text_col)
        .mapInPandas(count_batch, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    singles = agg.filter(F.length("piece") == 1)
    multi = (
        agg.filter(
            (F.length("piece") > 1) & (F.col("cnt") >= int(min_count))
        )
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(int(seed_size))
    )
    rows = singles.unionByName(multi).collect()  # ≤ seed_size + |alphabet|
    return sorted(((r["piece"], int(r["cnt"])) for r in rows))


def _estep(
    docs: DataFrame,
    text_col: str,
    vocab: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One distributed E-step: expected counts per piece + corpus
    log-likelihood under the CURRENT params. The kernel pre-aggregates
    per batch, the single shuffle carries ≤|vocab|+1 distinct keys, and
    the driver sees only the bounded aggregate.

    The per-batch log-likelihood travels OUT-OF-BAND in its own ``ll``
    column on a piece-NULL row (never as an in-band sentinel key): a
    corpus whose text genuinely contains any would-be sentinel string
    therefore cannot alias a real piece onto the LL accumulator —
    piece keys and the LL share no key space by construction."""
    import pandas as pd

    def expect_batch(batches):
        # r15 optimization (guide §4.2): the per-doc pure-Python lattice
        # log-adds were the E-step's whole cost — the vectorized batch
        # kernel runs the forward/backward/posterior recurrences as NumPy
        # ops over every doc in the chunk at once. Chunked so the padded
        # (docs × max_len × max_piece_len) lattice arrays stay small.
        chunk_docs = 1024
        for pdf in batches:
            ec: dict[str, float] = {}
            ll = 0.0
            texts = [t for t in pdf[text_col] if t is not None and len(t)]
            for lo in range(0, len(texts), chunk_docs):
                chunk = texts[lo : lo + chunk_docs]
                c_ec, c_ll, n_bad = _forward_backward_batch(
                    chunk, vocab, max_piece_len
                )
                if n_bad:
                    raise ValueError(
                        "unparseable doc under the current vocab (a char "
                        "left the vocabulary) — the trainer keeps all "
                        "single chars precisely to prevent this"
                    )
                ll += c_ll
                for piece, c in c_ec.items():
                    ec[piece] = ec.get(piece, 0.0) + c
            yield pd.DataFrame(
                {
                    "piece": list(ec) + [None],
                    "ec": list(ec.values()) + [0.0],
                    "ll": [0.0] * len(ec) + [ll],
                }
            )

    rows = (
        docs.select(text_col)
        .mapInPandas(expect_batch, "piece string, ec double, ll double")
        .groupBy("piece")
        .agg(F.sum("ec").alias("ec"), F.sum("ll").alias("ll"))
        .collect()
    )  # bounded: ≤ |vocab| + 1 rows (the +1 is the piece-NULL LL row)
    ec = {r["piece"]: float(r["ec"]) for r in rows if r["piece"] is not None}
    ll = sum(float(r["ll"]) for r in rows if r["piece"] is None)
    return ec, ll


def _mstep(ec: dict[str, float]) -> dict[str, float]:
    """Maximum-likelihood re-estimate: logp(piece) = log(ec/Σec). Pieces
    with vanishing expected count keep a tiny floor if single-char (full
    parseability is a trainer invariant) and are dropped otherwise."""
    floored = {
        p: (c if c > 1e-12 else (1e-12 if len(p) == 1 else 0.0))
        for p, c in ec.items()
    }
    kept = {p: c for p, c in floored.items() if c > 0.0}
    total = sum(kept.values())
    return {p: math.log(c) - math.log(total) for p, c in kept.items()}


def _prune(
    vocab: dict[str, float],
    ec: dict[str, float],
    vocab_target: int,
) -> dict[str, float]:
    """Keep every single char + the top multi-char pieces by expected
    count (9-dp rounded, piece-lexicographic tie-break — deterministic
    across partitionings) until ≤ vocab_target pieces survive, then
    renormalize. This is the standard contribution-proxy prune (the
    full Kudo loss-delta prune re-segments without each piece; expected
    count is its first-order surrogate)."""
    singles = {p for p in vocab if len(p) == 1}
    multi = [p for p in vocab if len(p) > 1]
    budget = max(0, vocab_target - len(singles))
    keep = sorted(
        multi, key=lambda p: (-round(ec.get(p, 0.0), 9), p)
    )[:budget]
    kept = {p: math.exp(vocab[p]) for p in singles | set(keep)}
    total = sum(kept.values())
    return {p: math.log(v / total) for p, v in kept.items()}


def em_train(
    docs: DataFrame,
    text_col: str = "text",
    *,
    max_piece_len: int = 4,
    min_count: int = 2,
    seed_size: int = 512,
    vocab_target: int = 96,
    iters_per_phase: int = 3,
) -> tuple[dict[str, float], list[float], list[float]]:
    """Fit the unigram LM: seed → EM phase 1 → prune to vocab_target →
    EM phase 2. Returns (vocab logp dict, phase-1 LL trace, phase-2 LL
    trace); EM guarantees each trace is non-decreasing (the invariants
    certificate's ``ll_monotone`` law — pruning between phases may drop
    LL, which is why the traces are per-phase).

    ``docs`` must be the bounded training sample (cache it — the loop
    re-scans it 2·iters_per_phase+1 times)."""
    from data_integration_spark.session import bounded_loop_conf

    def run_phase(vocab: dict[str, float]) -> tuple[dict[str, float], list[float], dict[str, float]]:
        lls: list[float] = []
        ec: dict[str, float] = {}
        for _ in range(iters_per_phase):
            ec, ll = _estep(docs, text_col, vocab, max_piece_len)
            lls.append(ll)
            vocab = _mstep(ec)
        return vocab, lls, ec

    # every job in the fit is a bounded aggregation (seed: TakeOrdered
    # head; E-step: ≤|vocab|+1 keys per map task) — AQE re-planning is
    # pure per-iteration overhead here, and the reduce side needs ~one
    # task per 64 map tasks' worth of bounded partials (see
    # bounded_loop_conf)
    n_red = max(1, docs.rdd.getNumPartitions() // 64)
    with bounded_loop_conf(docs.sparkSession, shuffle_partitions=n_red):
        seeds = seed_vocab(
            docs, text_col, max_piece_len, min_count, seed_size
        )
        total = sum(c for _p, c in seeds)
        vocab = {p: math.log(c) - math.log(total) for p, c in seeds}
        vocab, lls1, ec = run_phase(vocab)
        vocab = _prune(vocab, ec, vocab_target)
        vocab, lls2, _ec = run_phase(vocab)
    return vocab, lls1, lls2


def viterbi_encode(
    docs: DataFrame,
    vocab: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int | None = None,
    costs: bool = False,
    keep_text: str | None = None,
) -> DataFrame:
    """Best-parse segmentation of each doc under the frozen vocab — the
    tokenizer APPLY step. ``vocab`` maps piece → logp (or piece → cost
    when ``costs=True``); the parse MINIMIZES total cost (= −logp), and
    among equal-cost parses takes the lexicographically smallest
    piece-LENGTH sequence (backward min-cost DP + greedy shortest-first
    forward reconstruction — the tie-break a brute-force oracle can
    restate exactly). Raises loudly on an unparseable doc (the r4
    library contract: silent drops hide upstream vocab bugs).

    Output: (``id_col``, pieces array<string>, n_pieces, cost) — the id
    column keeps the CALLER'S name — plus the input text passed through
    under ``keep_text`` when set (in-batch — no join needed for
    provenance). Narrow distributed map — vocab in the closure, no
    shuffle."""
    import pandas as pd

    cost_map = (
        dict(vocab) if costs else {p: -lp for p, lp in vocab.items()}
    )
    max_len = (
        int(max_piece_len)
        if max_piece_len is not None
        else max((len(p) for p in cost_map), default=1)
    )

    def encode_batch(batches):
        for pdf in batches:
            ids, pieces_col, np_col, cost_col = [], [], [], []
            texts_col = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or not len(text):
                    ids.append(did)
                    pieces_col.append([])
                    np_col.append(0)
                    cost_col.append(0.0)
                    texts_col.append(text)
                    continue
                n = len(text)
                best = [math.inf] * (n + 1)
                best[n] = 0.0
                for i in range(n - 1, -1, -1):
                    top = min(n, i + max_len)
                    b = math.inf
                    for j in range(i + 1, top + 1):
                        c = cost_map.get(text[i:j])
                        if c is not None and c + best[j] < b:
                            b = c + best[j]
                    best[i] = b
                if best[0] == math.inf:
                    raise ValueError(
                        f"doc {did!r} not parseable under the vocab"
                    )
                # greedy shortest-piece-first reconstruction: the
                # lexicographically smallest length sequence among
                # min-cost parses (costs are exact floats by the
                # caller's contract, so equality is exact)
                out: list[str] = []
                i = 0
                while i < n:
                    top = min(n, i + max_len)
                    for j in range(i + 1, top + 1):
                        c = cost_map.get(text[i:j])
                        if c is not None and c + best[j] == best[i]:
                            out.append(text[i:j])
                            i = j
                            break
                    else:  # pragma: no cover — best[0] finite implies a step
                        raise AssertionError("viterbi reconstruction broke")
                ids.append(did)
                pieces_col.append(out)
                np_col.append(len(out))
                cost_col.append(best[0])
                texts_col.append(text)
            cols = {
                id_col: ids,
                "pieces": pieces_col,
                "n_pieces": np_col,
                "cost": cost_col,
            }
            if keep_text is not None:
                cols[keep_text] = texts_col
            yield pd.DataFrame(cols)

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, pieces array<string>, n_pieces long, cost double"
    if keep_text is not None:
        schema += f", {keep_text} string"
    return docs.select(id_col, text_col).mapInPandas(encode_batch, schema)
