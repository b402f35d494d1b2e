from data_integration_spark.similarity.ann import (
    as_double_array,
    cosine_pairs,
    cosine_topk,
    hyperplane_lsh_buckets,
)

__all__ = ["as_double_array", "cosine_pairs", "cosine_topk", "hyperplane_lsh_buckets"]
