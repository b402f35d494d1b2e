"""sf10 (100x) rehearsal for the staged q_semdedup operator
(similarity/semdedup.py): 200k vectors (the sf0.1 embeddings replicated
100x — every vector has 99 exact same-cell copies, a brutal duplicate
density), pinned 8-cell grid, tau=0.4. Times the RAW operator without
the parity plant (the +1e6 plant offset collides with the replica id
stride at rehearsal scale; the plant adds <0.5% rows at driver SFs).

Usage: python tools/rehearse_r14_semdedup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

if __name__ == "__main__":
    from data_integration_spark.queries.similarity_queries import (
        pinned_centroid_grid,
    )
    from data_integration_spark.session import get_spark
    from data_integration_spark.similarity.ann import as_double_array
    from data_integration_spark.similarity.semdedup import semdedup_decisions
    from data_integration_spark.sources.catalog import Catalog

    spark = get_spark(app_name="rehearse-r14-semdedup")
    for tag, d in (("sf0.1 (1x)", "/root/testdata/sf0.1"),
                   ("sf10 (100x)", "/root/repo/.scratch/sf10")):
        emb = Catalog(spark, d)["embeddings"].select(
            "vec_id", as_double_array("embedding", "e")
        )
        def run():
            semdedup_decisions(
                emb, pinned_centroid_grid(), 0.40
            ).write.format("noop").mode("overwrite").save()
        run()  # warm
        t0 = time.perf_counter()
        run()
        n = emb.count()
        print(json.dumps({"op": "q_semdedup(raw)", "tag": tag,
                          "n_vectors": n,
                          "sec": round(time.perf_counter() - t0, 2)}),
              flush=True)
    spark.stop()
