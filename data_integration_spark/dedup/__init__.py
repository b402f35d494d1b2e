from data_integration_spark.dedup.exact import exact_dedup
from data_integration_spark.dedup.minhash import minhash_signatures, minhash_lsh_pairs
from data_integration_spark.dedup.simhash import simhash64, simhash_near_pairs

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_near_pairs",
]
