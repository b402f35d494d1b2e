"""Unit tests for relational operators and the dedup/similarity/asof suite."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_spark.dedup.exact import drop_exact_dups, exact_dedup
from data_integration_spark.dedup.minhash import minhash_lsh_pairs, minhash_signatures
from data_integration_spark.dedup.simhash import simhash64, simhash_near_pairs
from data_integration_spark.operators.asof import asof_join
from data_integration_spark.operators.joins import anti_join, full_outer_fold, semi_join
from data_integration_spark.operators.projections import add_row_id, one_hot, sanitize_name
from data_integration_spark.similarity.ann import (
    as_double_array,
    cosine_pairs,
    cosine_topk,
    lsh_cosine_pairs,
)


def test_add_row_id_dense(spark):
    df = spark.createDataFrame([Row(k="c"), Row(k="a"), Row(k="b")])
    out = {r.k: r.ID for r in add_row_id(df, order_by="k").collect()}
    assert out == {"a": 1, "b": 2, "c": 3}


def test_one_hot_with_name_sanitation(spark):
    # the reference renames 'educ4_col grad' -> 'educ4_col_grad' (Rmd:53)
    df = spark.createDataFrame([Row(educ4="col grad"), Row(educ4="postgrad")])
    out = one_hot(df, "educ4", ["col grad", "postgrad"])
    assert "educ4_col_grad" in out.columns
    rows = {r.educ4: (r.educ4_col_grad, r.educ4_postgrad) for r in out.collect()}
    assert rows["col grad"] == (1, 0)
    assert rows["postgrad"] == (0, 1)
    assert sanitize_name("a b-c") == "a_b_c"


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([Row(k=i) for i in range(10)])
    right = spark.createDataFrame([Row(k=i) for i in range(5, 15)])
    n_semi = semi_join(left, right, "k").count()
    n_anti = anti_join(left, right, "k").count()
    assert n_semi == 5 and n_anti == 5
    assert n_semi + n_anti == left.count()


def test_full_outer_fold_keeps_all_keys(spark):
    a = spark.createDataFrame([Row(k=1, x=1.0)])
    b = spark.createDataFrame([Row(k=2, y=2.0)])
    c = spark.createDataFrame([Row(k=1, z=3.0), Row(k=3, z=4.0)])
    out = full_outer_fold([a, b, c], on="k")
    assert {r.k for r in out.collect()} == {1, 2, 3}


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="aa"), Row(doc_id=2, text="aa"), Row(doc_id=3, text="bb")]
    )
    out = {r.keep_id: r.n_copies for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}
    kept = {r.doc_id for r in drop_exact_dups(df).collect()}
    assert kept == {1, 3}


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words describing an unrelated topic entirely here now"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=near), Row(doc_id=3, text=far)]
    )
    pairs = {
        (r.d1, r.d2): r.jaccard
        for r in minhash_lsh_pairs(df, k=64, bands=32, verify_threshold=0.3).collect()
    }
    assert (1, 2) in pairs
    assert all(p != (1, 3) and p != (2, 3) for p in pairs)
    # verification step reports EXACT jaccard of word-bigram shingles
    assert 0.5 < pairs[(1, 2)] < 1.0


def test_minhash_signature_deterministic(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    s1 = minhash_signatures(df).collect()[0]
    s2 = minhash_signatures(df.repartition(4)).collect()[0]
    assert s1 == s2


def test_hamming_near_pairs_rejects_degenerate_widths(spark):
    """Guard contract: block width bits//(d+1) must land in [1, 63] —
    width 0 silently collapses the join keys to a single value (the
    O(N²) cross product the pigeonhole exists to avoid) and width 64's
    mask does not fit a Spark long, so both must raise up front."""
    import pytest as _pytest

    from data_integration_spark.dedup.simhash import hamming_near_pairs

    sig = spark.createDataFrame([(1, 5)], "doc_id long, simhash long")
    for bits, d in ((3, 3), (0, 1), (64, 0), (65, 3), (8, -1)):
        with _pytest.raises(ValueError):
            hamming_near_pairs(sig, bits=bits, max_distance=d)
    # the boundary cases stay valid: 64-bit/d=3 (simhash64) and 63/d=0
    hamming_near_pairs(sig, bits=64, max_distance=3).collect()
    hamming_near_pairs(sig, bits=63, max_distance=0).collect()


def test_simhash_identical_docs_same_hash(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="alpha beta gamma delta"),
            Row(doc_id=3, text="unrelated totally different content"),
        ]
    )
    sig = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[3]
    pairs = {(r.d1, r.d2): r.distance for r in simhash_near_pairs(df, 3).collect()}
    assert pairs.get((1, 2)) == 0


def test_cosine_topk_and_lsh_precision(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.9, 0.1, 0.0]),
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows).select("vec_id", as_double_array("embedding", "e"))
    topk = cosine_topk(df.filter(F.col("vec_id") == 1), df, k=1)
    best = topk.collect()[0]
    assert best.mid == 2 and best.rank == 1

    # LSH pairs must be a subset of brute-force pairs at the same threshold
    bf = {
        (r.qid, r.mid)
        for r in cosine_pairs(df, df, threshold=0.5).collect()
        if r.qid < r.mid
    }
    lsh = {
        (r.qid, r.mid) for r in lsh_cosine_pairs(df, dim=3, n_planes=4, threshold=0.5).collect()
    }
    assert lsh <= bf


def test_lsh_multiprobe_recall_improves(spark):
    """OR-construction recall: 4 tables must recover ≥ the single-table
    candidate pairs (superset property) and reach high absolute recall vs
    the exact brute-force pairs on a clustered synthetic corpus."""
    import math as _math
    import random

    rng = random.Random(5)
    rows = []
    # 12 cluster centers × 5 jittered members → many true near pairs
    for c in range(12):
        center = [rng.gauss(0, 1) for _ in range(8)]
        nc = _math.sqrt(sum(x * x for x in center))
        center = [x / nc for x in center]
        for m in range(5):
            v = [x + rng.gauss(0, 0.05) for x in center]
            rows.append(Row(vec_id=c * 5 + m, embedding=v))
    df = spark.createDataFrame(rows).select(
        "vec_id", as_double_array("embedding", "e")
    )
    bf = {
        (r.qid, r.mid)
        for r in cosine_pairs(df, df, threshold=0.9).collect()
        if r.qid < r.mid
    }
    single = {
        (r.qid, r.mid)
        for r in lsh_cosine_pairs(
            df, dim=8, n_planes=6, threshold=0.9, n_tables=1
        ).collect()
    }
    multi = {
        (r.qid, r.mid)
        for r in lsh_cosine_pairs(
            df, dim=8, n_planes=6, threshold=0.9, n_tables=4
        ).collect()
    }
    assert single <= multi <= bf  # precision stays exact, recall only grows
    assert len(multi) > len(single)  # strictly better on this corpus
    assert len(multi) >= 0.9 * len(bf)  # high absolute recall with 4 tables


def test_asof_join_semantics(spark):
    purchases = spark.createDataFrame(
        [Row(event_id=10, user_id=1, ts=5.0), Row(event_id=11, user_id=1, ts=1.0)]
    )
    clicks = spark.createDataFrame(
        [
            Row(user_id=1, ts=2.0, value=20.0),
            Row(user_id=1, ts=4.0, value=40.0),
            Row(user_id=2, ts=0.0, value=99.0),
        ]
    )
    out = {
        r.event_id: r.value_asof
        for r in asof_join(purchases, clicks, key="user_id", ts="ts").collect()
    }
    assert out[10] == 40.0  # latest click at ts<=5 is ts=4
    assert out[11] is None  # no click before ts=1


def test_asof_join_equal_ts_included(spark):
    left = spark.createDataFrame([Row(event_id=1, user_id=1, ts=3.0)])
    right = spark.createDataFrame([Row(user_id=1, ts=3.0, value=7.0)])
    out = asof_join(left, right, key="user_id", ts="ts").collect()[0]
    assert out.value_asof == 7.0


def test_lsh_topk_recall_on_clustered_corpus(spark):
    """lsh_topk recall vs the exact brute-force top-k: ≥0.8 with 4 tables
    on clustered vectors (the regime LSH exists for)."""
    import math as _math
    import random

    from data_integration_spark.similarity.ann import cosine_topk, lsh_topk

    rng = random.Random(17)
    rows = []
    for c in range(10):
        center = [rng.gauss(0, 1) for _ in range(8)]
        nc = _math.sqrt(sum(x * x for x in center))
        center = [x / nc for x in center]
        for m in range(8):
            v = [x + rng.gauss(0, 0.08) for x in center]
            rows.append(Row(vec_id=c * 8 + m, embedding=v))
    df = spark.createDataFrame(rows).select(
        "vec_id", as_double_array("embedding", "e")
    )
    q = df.filter(F.col("vec_id") < 8)
    exact = {
        (r.qid, r.mid) for r in cosine_topk(q, df, k=3).collect()
    }
    approx = {
        (r.qid, r.mid)
        for r in lsh_topk(q, df, dim=8, k=3, n_planes=6, n_tables=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8


def test_connected_components_chain_and_singletons(spark):
    from data_integration_spark.dedup.components import (
        connected_components,
        dedup_clusters,
    )

    # chain 1-2-3-4 (diameter 3) + pair 10-11; node 99 isolated
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4),
         Row(src=10, dst=11)]
    )
    comp = {r.node: r.cluster for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [Row(doc_id=i) for i in (1, 2, 3, 4, 10, 11, 99)]
    )
    pairs = edges.select(F.col("src").alias("d1"), F.col("dst").alias("d2"))
    clusters = {r.doc_id: r.cluster for r in dedup_clusters(docs, pairs).collect()}
    assert clusters[99] == 99  # isolated doc keeps its own id
    assert clusters[4] == 1 and clusters[11] == 10
    # canonical representatives: exactly one kept doc per cluster
    kept = [d for d, c in clusters.items() if d == c]
    assert sorted(kept) == [1, 10, 99]


def test_asof_join_attaches_matched_row_atomically(spark):
    """ADVICE r1 regression: a NULL field in the MATCHED (latest) right row
    must stay NULL — per-column last(ignorenulls) used to backfill it from
    an older right row, mixing fields of different rows."""
    left = spark.createDataFrame([Row(event_id=1, user_id=1, ts=10.0)])
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=1.0, price=100.0, qty=5.0),
            Row(user_id=1, ts=9.0, price=200.0, qty=None),  # the match
        ]
    )
    out = asof_join(left, right, key="user_id", ts="ts").collect()[0]
    assert out.price_asof == 200.0
    assert out.qty_asof is None  # NOT 5.0 from the ts=1 row


def test_range_prefix_max_matches_sequential_ground_truth(spark):
    """Exclusive running max via range partitioning == the sequential
    definition, across many partitions and including the NULL first row
    and cross-partition carry."""
    import random

    from pyspark.sql import functions as F

    from data_integration_spark.operators.prefix import range_prefix_max

    rng = random.Random(7)
    vals = [(i, rng.randint(-50, 50)) for i in range(300)]
    df = spark.createDataFrame(vals, "k bigint, v bigint").repartition(7)
    out = {
        r["k"]: r["pm"]
        for r in range_prefix_max(
            df, [F.col("k")], "v", out_col="pm", num_partitions=8
        ).collect()
    }
    best = None
    for k, v in vals:  # already in k order
        assert out[k] == best, (k, out[k], best)
        best = v if best is None else max(best, v)


def test_range_ntile_matches_sql_ntile_all_remainders(spark):
    """range_ntile's arithmetic NTILE == Spark's own window NTILE for
    every N mod n remainder class (N=17..23 over n=5 covers r=0..4 and
    q>0; N=3 over n=5 covers the N<n degenerate)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_integration_spark.operators.prefix import range_ntile

    for n_rows, n_buckets in [(17, 5), (18, 5), (19, 5), (20, 5),
                              (21, 5), (23, 5), (3, 5)]:
        df = spark.range(n_rows).select(F.col("id").alias("k")).repartition(4)
        got = {
            r["k"]: r["b"]
            for r in range_ntile(
                df, [F.col("k")], n_buckets, out_col="b", num_partitions=3
            ).collect()
        }
        want = {
            r["k"]: r["b"]
            for r in df.select(
                "k",
                F.ntile(n_buckets).over(Window.orderBy("k")).alias("b"),
            ).collect()
        }
        assert got == want, (n_rows, n_buckets, got, want)


def test_range_prefix_max_all_null_partitions_and_empty(spark):
    """ADVICE r6: all-NULL partitions must fold as absent (max(x, None)
    raised TypeError on the driver), and the empty-input path must keep
    value_col's NATIVE type instead of a hardcoded double."""
    from pyspark.sql import functions as F

    from data_integration_spark.operators.prefix import range_prefix_max

    # ks 0..9 all-NULL, 10..19 valued: the first range partitions are
    # entirely NULL, later ones must still carry the running max across
    rows = [(i, None) for i in range(10)] + [(i, i) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    out = {
        r["k"]: r["pm"]
        for r in range_prefix_max(
            df, [F.col("k")], "v", out_col="pm", num_partitions=5
        ).collect()
    }
    best = None
    for k, v in rows:
        assert out[k] == best, (k, out[k], best)
        if v is not None:
            best = v if best is None else max(best, v)

    empty = spark.createDataFrame([], "k bigint, v bigint")
    out_schema = range_prefix_max(empty, [F.col("k")], "v", out_col="pm").schema
    assert out_schema["pm"].dataType.simpleString() == "bigint"


def test_range_prefix_sum_all_null_partitions_match_sql_semantics(spark):
    """ADVICE r6: all-NULL partition totals crashed the driver fold; the
    fixed fold must ALSO reproduce SQL SUM() OVER semantics — NULL until
    the first non-NULL value anywhere preceding, NULL-skipping after."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_integration_spark.operators.prefix import range_prefix_sum

    rows = (
        [(i, None) for i in range(8)]
        + [(i, float(i)) for i in range(8, 16)]
        + [(i, None) for i in range(16, 24)]
        + [(i, float(i)) for i in range(24, 30)]
    )
    df = spark.createDataFrame(rows, "k bigint, v double")
    got = {
        r["k"]: r["ps"]
        for r in range_prefix_sum(
            df, "k", "v", out_col="ps", num_partitions=6
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["ps"]
        for r in df.select("k", F.sum("v").over(w).alias("ps")).collect()
    }
    assert got == want


def test_range_ntile_empty_input_keeps_rn_col(spark):
    """ADVICE r6: the empty-input early return dropped rn_col, so selecting
    it downstream raised AnalysisException on an empty table."""
    from pyspark.sql import functions as F

    from data_integration_spark.operators.prefix import range_ntile

    empty = spark.createDataFrame([], "k bigint")
    out = range_ntile(empty, [F.col("k")], 4, out_col="b", rn_col="_rn")
    assert out.select("k", "b", "_rn").count() == 0
    assert out.schema["_rn"].dataType.simpleString() == "bigint"


def test_prefix_family_releases_prior_caches(spark):
    """VERDICT r6 #4: at most one prefix call's cached intermediates are
    live — the next call (or release_prefix_caches) unpersists the rest,
    so bench reruns stop double-caching and sessions stop leaking."""
    from pyspark.sql import functions as F

    from data_integration_spark.operators import prefix

    df = spark.range(100).select(F.col("id").alias("k"))
    a = prefix.range_row_number(df, [F.col("k")], out_col="rn")
    a.collect()
    assert len(prefix._LIVE_CACHES) == 1
    first_cache = prefix._LIVE_CACHES[0]
    # a DIFFERENT input plan: an identical plan would re-register the same
    # CacheManager entry and mask the unpersist
    df2 = spark.range(50).select(F.col("id").alias("k"))
    b = prefix.range_prefix_sum(df2, "k", "k", out_col="ps")
    b.collect()
    assert len(prefix._LIVE_CACHES) == 1
    assert prefix._LIVE_CACHES[0] is not first_cache
    assert not first_cache.storageLevel.useMemory  # actually unpersisted
    prefix.release_prefix_caches()
    assert prefix._LIVE_CACHES == []


def test_zorder_layout_gives_multidim_locality(spark):
    """The point of the Morton key (q_zorder_key): range-partitioning by
    zkey clusters BOTH dimensions, so a 2-D box predicate touches few
    partitions, while single-column layout spreads the box's rows over
    ~all partitions for the other dimension. Checked on a synthetic
    uniform grid via distinct spark_partition_id counts."""
    from pyspark.sql import functions as F

    from data_integration_spark.queries.pipeline_extra import q_zorder_key  # noqa: F401

    n_parts = 16
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def spread(v):
        v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(16711935))
        v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(252645135))
        v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(858993459))
        v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(1431655765))
        return v

    keyed = grid.withColumn(
        "zkey", spread(F.col("x")).bitwiseOR(F.shiftleft(spread(F.col("y")), 1))
    )
    box = (F.col("x").between(8, 15)) & (F.col("y").between(8, 15))

    # pid is tagged BEFORE the filter: spark_partition_id is a barrier, so
    # Catalyst cannot push the predicate below the range exchange (which
    # would re-range only the filtered rows and void the measurement)
    def touched(pred, order_col):
        return (
            keyed.repartitionByRange(n_parts, F.col(order_col))
            .withColumn("pid", F.spark_partition_id())
            .filter(pred)
            .select("pid")
            .distinct()
            .count()
        )

    z_touched = touched(box, "zkey")
    # an aligned 8x8 box inside a 64x64 Morton grid is ONE zkey run;
    # under a 1-D layout the box is fine for the layout column but a
    # predicate on the OTHER dimension scatters over every partition:
    # locality must hold for BOTH dimensions at once under zkey
    y_box_under_x_layout = touched(F.col("y").between(8, 15), "x")
    z_y_only = touched(F.col("y").between(8, 15), "zkey")
    assert z_touched <= 2, z_touched          # box = one aligned Morton quad
    assert y_box_under_x_layout >= n_parts - 1  # 1-D layout: other dim scatters
    assert z_y_only < n_parts - 1  # zkey layout keeps SOME locality per dim


def test_range_ntile_multi_known_quantiles(spark):
    """Direct operator test for range_ntile_multi: two metrics with
    opposite orderings, k=3 on 9 rows (even split), plus the N < k edge
    (every row its own bucket, no empty-bucket arithmetic errors)."""
    from data_integration_spark.operators.prefix import range_ntile_multi

    rows = [(i, float(i), float(9 - i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id long, up double, down double")
    got = {
        r["id"]: (r["up_bucket"], r["down_bucket"])
        for r in range_ntile_multi(df, "id", ["up", "down"], 3).collect()
    }
    for i in range(1, 10):
        want_up = (i - 1) // 3 + 1         # 1..9 ascending -> 3 even buckets
        want_down = (9 - i) // 3 + 1       # reversed metric -> reversed buckets
        assert got[i] == (want_up, want_down), (i, got[i])

    tiny = spark.createDataFrame([(1, 5.0), (2, 3.0)], "id long, v double")
    got2 = {
        r["id"]: r["v_bucket"]
        for r in range_ntile_multi(tiny, "id", ["v"], 5).collect()
    }
    assert got2 == {2: 1, 1: 2}  # N=2 < k=5: first two buckets, value order
