"""r11 second-half sf10 (100×) rehearsals — the new ops' scale evidence:

1. ivfpq: IVFADC self-join at the PRODUCTION knobs (fit n_cells=√N,
   m=16, k_codes=16 over the 100× embedding corpus, then search_all at
   Q = N) — the claim under test is that the cogrouped LUT-gather
   kernel carries the same Q≈N economics as the float IVF self-join
   (10.6 s at sf10 in SCALING.md r11) while scanning CODES, not
   vectors.
2. unigram: tokenizer EM training at 100× — the bounded-sample design
   claim: the 10% hash sample grows linearly (50k docs), each EM
   iteration is one distributed lattice pass + a ≤|vocab|-row collect,
   so wall scales ~linearly in sample size, not corpus pair space.
   Also times the Viterbi encode query over all 500k docs.
3. phash: 500k-image perceptual pHash + pigeonhole pairing with the
   planted-distance histogram check (the dHash rehearsal contract:
   every in-group pair at distance ≤ 3 must surface — 6 pairs per
   group of 4 → ≥ 750k pairs at 500k images).

Usage: python tools/rehearse_r11b.py [ivfpq|unigram|phash ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.scratch/sf10"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def rehearse_ivfpq(spark, sf_dir, tag):
    import math

    from pyspark.sql import functions as F

    from data_integration_spark.similarity.ann import as_double_array
    from data_integration_spark.similarity.ivfpq import IVFPQIndex
    from data_integration_spark.sources.catalog import Catalog

    emb = Catalog(spark, sf_dir)["embeddings"].select(
        "vec_id", as_double_array("embedding", "e")
    )
    n = emb.count()
    n_cells = max(8, min(4096, int(math.isqrt(n))))
    t0 = time.time()
    index = IVFPQIndex(n_cells=n_cells, m=16, k_codes=16, seed=17).fit(emb)
    index.codes = index.codes.cache()
    index.codes.count()
    fit_s = time.time() - t0
    t0 = time.time()
    noop(index.search_all(emb, k=5, nprobe=3))
    search_s = time.time() - t0
    index.codes.unpersist()
    print(
        json.dumps(
            {
                "op": "ivfpq_self_join",
                "tag": tag,
                "n": n,
                "n_cells": n_cells,
                "fit_sec": round(fit_s, 1),
                "search_all_sec": round(search_s, 1),
            }
        ),
        flush=True,
    )


def rehearse_unigram(spark, sf_dir, tag):
    from data_integration_spark.queries.tokenizer_unigram import (
        q_unigram_encode,
        q_unigram_train,
    )

    t0 = time.time()
    vocab_rows = q_unigram_train(spark, sf_dir).count()
    train_s = time.time() - t0
    t0 = time.time()
    noop(q_unigram_encode(spark, sf_dir))
    enc_s = time.time() - t0
    print(
        json.dumps(
            {
                "op": "unigram",
                "tag": tag,
                "vocab_rows": vocab_rows,
                "train_sec": round(train_s, 1),
                "encode_sec": round(enc_s, 1),
            }
        ),
        flush=True,
    )


def rehearse_phash(spark, sf_dir, tag):
    from pyspark.sql import functions as F

    from data_integration_spark.queries.multimodal_queries import (
        q_image_dedup_phash,
    )
    from data_integration_spark.sources.catalog import Catalog

    n_docs = Catalog(spark, sf_dir)["documents"].count()
    t0 = time.time()
    hist = (
        q_image_dedup_phash(spark, sf_dir)
        .groupBy("distance")
        .count()
        .orderBy("distance")
        .collect()
    )
    wall = time.time() - t0
    by_d = {int(r["distance"]): int(r["count"]) for r in hist}
    groups = n_docs // 4
    # planted in-group pairs: distances 1/2/3 occur 3/2/1 times per group
    planted_ok = (
        by_d.get(1, 0) >= 3 * groups
        and by_d.get(2, 0) >= 2 * groups
        and by_d.get(3, 0) >= 1 * groups
    )
    print(
        json.dumps(
            {
                "op": "phash",
                "tag": tag,
                "n_images": n_docs,
                "pairs_by_distance": by_d,
                "planted_histogram_ok": planted_ok,
                "wall_sec": round(wall, 1),
            }
        ),
        flush=True,
    )


def main():
    from data_integration_spark.session import get_spark

    which = set(sys.argv[1:]) or {"ivfpq", "unigram", "phash"}
    spark = get_spark(app_name="rehearse_r11b", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SF01, "sf0.1"), (SF10, "sf10")):
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", flush=True)
            continue
        for name, fn in (
            ("ivfpq", rehearse_ivfpq),
            ("unigram", rehearse_unigram),
            ("phash", rehearse_phash),
        ):
            if name in which:
                fn(spark, sf_dir, tag)
    spark.stop()


if __name__ == "__main__":
    main()
