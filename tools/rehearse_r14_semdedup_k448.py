"""The q_semdedup SCALE-PATH rehearsal leg: same 200k-vector sf10 corpus,
but K = 448 ≈ sqrt(N) TRAINED centroids (a NumPy Lloyd fit on a driver
sample — the rehearsal needs timing, not an oracle, so no pinned grid).
The pinned 8-cell grid exists for the ORACLE; with cells that grow with
the corpus the within-cell GEMM is quadratic (measured 209.7 s at sf10
on 8 cells). With K ≈ sqrt(N) cells stay constant-sized and the
operator is linear-times-GEMM — this leg measures that claim.

Usage: python tools/rehearse_r14_semdedup_k448.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

if __name__ == "__main__":
    from data_integration_spark.session import get_spark
    from data_integration_spark.similarity.ann import as_double_array
    from data_integration_spark.similarity.semdedup import semdedup_decisions
    from data_integration_spark.sources.catalog import Catalog

    spark = get_spark(app_name="rehearse-r14-semdedup-k448")
    d = "/root/repo/.scratch/sf10"
    emb = Catalog(spark, d)["embeddings"].select(
        "vec_id", as_double_array("embedding", "e")
    )
    # bounded driver sample -> 5 Lloyd iterations (k-means++ would be the
    # production fit; plain seeded-subset init suffices for a timing leg)
    sample = np.stack(
        [r["e"] for r in emb.filter("vec_id % 101 < 6").limit(12000).collect()]
    )
    K = 448
    if len(sample) < K:  # a too-small sample would silently mis-shape C
        raise SystemExit(f"sample {len(sample)} < K={K}; widen the filter")
    C = sample[:K].copy()
    for _ in range(5):
        # GEMM distance identity (the semdedup kernel's own form) — the
        # broadcast (12000, 448, 64) difference tensor would be ~2.8 GB
        # per iteration (r14 review finding #6)
        d2 = (
            (sample**2).sum(1)[:, None]
            - 2.0 * sample @ C.T
            + (C**2).sum(1)[None, :]
        )
        a = d2.argmin(1)
        for k in range(K):
            m = sample[a == k]
            if len(m):
                C[k] = m.mean(0)

    def run():
        semdedup_decisions(emb, C.tolist(), 0.40).write.format("noop").mode(
            "overwrite"
        ).save()

    run()  # warm
    t0 = time.perf_counter()
    run()
    print(
        json.dumps(
            {
                "op": "q_semdedup(raw, K=448 trained)",
                "tag": "sf10 (100x)",
                "n_vectors": emb.count(),
                "sec": round(time.perf_counter() - t0, 2),
            }
        ),
        flush=True,
    )
    spark.stop()
