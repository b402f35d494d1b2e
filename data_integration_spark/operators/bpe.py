"""Byte-pair-encoding merge training, distributed (SURVEY extension: the
tokenizer-TRAINING half of the vocab surface — ``q_vocab_build`` counts
types, this learns the subword merge table those counts seed).

The reference corpus pipeline stops at word-frequency vocabularies; real
pretraining pipelines train a subword tokenizer (BPE — Sennrich et al.
2016, the GPT-2/sentencepiece family). The classic implementation holds
the word-frequency table in one process; at 100 TB the TYPE table itself
is O(10^8) rows, so both the pair-count statistics and the merge
application must stay distributed. This module keeps the word table as a
DataFrame end-to-end:

- one aggregation builds the (word, freq) type table (tokens never leave
  the corpus scan un-aggregated);
- each merge iteration is ONE distributed pair-count aggregation
  (in-row adjacent-pair extraction -> groupBy (left, right) weighted by
  word freq, map-side combinable) + a driver-side top-1
  (``orderBy().limit(1)`` = TakeOrdered — the driver sees one row per
  iteration, never the table);
- the winning merge is applied IN-ROW with a single left-to-right
  ``F.aggregate`` fold per word (greedy non-overlapping, exactly the
  reference algorithm's replace pass) — no shuffle at all for the apply
  step;
- lineage is cut with checkpoint/localCheckpoint every few iterations so
  the plan does not deepen linearly with the merge count (same
  discipline as dedup/components.py).

HOF-lambda discipline (NOTES r6 lesson): loop variables are bound via
factory closures / literal embedding, never default-arg lambda params —
``F.aggregate`` merge expressions embed the pair as SQL string literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_spark.dedup.components import _truncate_lineage


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def chars_column(word_col: str) -> Column:
    """Split a word into its character symbols (deterministic 1-based
    substring walk — ``split(col, '')`` edge semantics differ across
    engines, so we avoid it)."""
    return F.expr(
        f"transform(sequence(1, length({word_col})),"
        f" i -> substring({word_col}, i, 1))"
    )


def merge_pair_column(syms_col: str, left: str, right: str) -> Column:
    """One BPE merge applied in-row: greedy LEFT-TO-RIGHT non-overlapping
    replacement of adjacent (left, right) symbol pairs by their
    concatenation — a single ``F.aggregate`` fold carrying
    (output-so-far, pending-symbol). NULL is the clean 'no pending'
    sentinel: corpus symbols are never NULL (words come from a
    non-null-token split)."""
    ql, qr = _sql_quote(left), _sql_quote(right)
    qm = _sql_quote(left + right)
    return F.expr(
        f"""
        aggregate(
          {syms_col},
          struct(cast(array() as array<string>) as acc,
                 cast(null as string) as pend),
          (st, x) -> case
              when st.pend is null
                then struct(st.acc as acc, x as pend)
              when st.pend = {ql} and x = {qr}
                then struct(concat(st.acc, array({qm})) as acc,
                            cast(null as string) as pend)
              else struct(concat(st.acc, array(st.pend)) as acc, x as pend)
            end,
          st -> case when st.pend is null then st.acc
                     else concat(st.acc, array(st.pend)) end
        )
        """
    )


def adjacent_pair_counts(words: DataFrame, syms_col: str, freq_col: str) -> DataFrame:
    """Corpus-weighted adjacent-pair statistics: in-row pair extraction
    (guarded — single-symbol words contribute nothing) exploded into ONE
    hash aggregation on (left, right). Map-side partials keep the
    shuffle at |distinct pairs|, not |pair occurrences|."""
    pairs = words.select(
        F.col(freq_col).alias("_f"),
        F.explode(
            F.expr(
                f"if(size({syms_col}) >= 2,"
                f" transform(sequence(1, size({syms_col}) - 1),"
                f" i -> struct({syms_col}[i - 1] as l, {syms_col}[i] as r)),"
                " cast(array() as array<struct<l:string,r:string>>))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("_f").cast("long").alias("pair_count"))


def train_bpe(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    min_count: int = 2,
    checkpoint_every: int = 4,
    materialize_final: bool = True,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, freq) type table.

    Returns (merge table rows [(rank, left, right, pair_count)...], the
    final symbolized words DataFrame (word, freq, syms)). Stops early
    when the best pair's corpus count drops below ``min_count`` (merging
    singletons is noise). Each iteration costs one distributed
    aggregation + one in-row transform; the driver holds one row per
    iteration plus the merge list — never the type table.

    ``materialize_final=False`` (r15): a caller that consumes only the
    MERGE LIST (q_bpe_train's contract output) skips the final-rank
    checkpoint materialization — a full fold pass over the type table
    whose result would be thrown away. Callers that aggregate the
    returned table (q_bpe_invariants) keep the default: the final-rank
    checkpoint then materializes EAGERLY, while its parent's cache is
    still alive — a lazy one would be recomputed from the previous
    checkpoint at first consumer action, AFTER the loop has unpersisted
    that cache (r15 review finding)."""
    from data_integration_spark.session import bounded_loop_conf

    cur = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
        chars_column(word_col).alias("syms"),
    )
    cur = cur.persist()
    merges: list[tuple[int, str, str, int]] = []
    prev = None
    final_materialized = False
    n_red = max(1, words.rdd.getNumPartitions() // 64)
    for rank in range(1, n_merges + 1):
        # each iteration's job is one map-side-combined aggregation ending
        # in a TakeOrdered head (the driver sees ONE row) — AQE
        # re-planning is pure per-iteration overhead for that shape (see
        # bounded_loop_conf); the window covers only this collect
        with bounded_loop_conf(cur.sparkSession, shuffle_partitions=n_red):
            top = (
                adjacent_pair_counts(cur, "syms", "freq")
                .orderBy(
                    F.col("pair_count").desc(), F.col("left_sym"), F.col("right_sym")
                )
                .limit(1)
                .collect()
            )
        if not top or top[0]["pair_count"] < min_count:
            break
        left, right, cnt = (
            top[0]["left_sym"],
            top[0]["right_sym"],
            int(top[0]["pair_count"]),
        )
        merges.append((rank, left, right, cnt))
        nxt = cur.withColumn("syms", merge_pair_column("syms", left, right))
        if rank % checkpoint_every == 0:
            # mid-loop boundaries: lazy — the NEXT iteration's single
            # aggregation job materializes the checkpoint while this
            # rank's parent cache is still alive (one scheduled job
            # saved per boundary). Final-rank boundary: eager when the
            # caller consumes the table (its parent's cache is dropped
            # right after the loop, so a lazy checkpoint would replay
            # checkpoint_every folds at first use); skipped-by-laziness
            # when the caller wants only the merge list.
            final_rank = rank == n_merges
            nxt = _truncate_lineage(
                nxt, eager=final_rank and materialize_final
            )
            final_materialized = final_rank and materialize_final
        nxt = nxt.persist()
        prev_to_drop, prev = prev, cur
        cur = nxt
        if prev_to_drop is not None:
            prev_to_drop.unpersist()
    if materialize_final and prev is not None and not final_materialized:
        # r16 (ADVICE r15): on min_count early-stop, or when n_merges is
        # not a checkpoint_every multiple, the loop never hit the eager
        # final-rank boundary — materialize cur's persist() cache NOW,
        # while prev's cache is still alive, or the caller's first action
        # replays up to checkpoint_every folds from the last checkpoint
        # (perf-only; values were always correct)
        cur.count()
    if prev is not None:
        prev.unpersist()
    return merges, cur


def apply_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    syms_col: str = "syms",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Encode: replay the learned merges in rank order over a symbolized
    column. Applying merge k to a fresh word reproduces exactly the
    training-time state after merges 1..k (each apply is the same greedy
    left-to-right pass training used), so encode(word) equals the
    training segmentation — the invariant ``q_bpe_invariants``
    certifies."""
    out = df
    for i, (_rank, left, right, _cnt) in enumerate(
        sorted(merges, key=lambda m: m[0]), start=1
    ):
        out = out.withColumn(syms_col, merge_pair_column(syms_col, left, right))
        if i % checkpoint_every == 0:
            # lazy: encode output flows into exactly one downstream
            # consumer; its first action materializes the checkpoint
            out = _truncate_lineage(out, eager=False)
    return out
