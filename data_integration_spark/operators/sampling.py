"""Deterministic sampling & splits for training-data curation.

``df.sample`` is partition-dependent: the same row can enter or leave the
sample when the file layout changes — unacceptable for reproducible dataset
releases. These operators key every decision on a row-content hash
(``functions/rng.hash_uniform``: xxhash64 → uniform), so membership is a
pure function of (key, salt): stable across runs, partitionings, cluster
sizes, and engine versions. All pure Column expressions — a sample is a
FILTER, no shuffle, fully pushdown-friendly.

The same keyed-uniform also yields leakage-safe train/test splits: hashing
a GROUP key (e.g. a document's url/domain) puts every member of the group
on the same side of the split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_spark.functions.rng import hash_uniform


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff hash_uniform(key) < fraction — a Bernoulli sample
    that is a deterministic function of the row's key."""
    return df.filter(hash_uniform(*key_cols, salt=salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy`` made deterministic):
    strata absent from ``fractions`` use ``default_fraction``. The fraction
    lookup is a map literal — no join, the sample stays a narrow filter."""
    m = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    frac: Column = F.coalesce(m[F.col(strata_col)], F.lit(float(default_fraction)))
    return df.filter(hash_uniform(*key_cols, salt=salt) < frac)


def train_test_split(
    df: DataFrame,
    test_fraction: float,
    key_cols: list[str],
    split_col: str = "split",
    salt: int = 0,
) -> DataFrame:
    """Tag each row 'test' iff hash_uniform(key) < test_fraction else
    'train'. Hash a GROUP key (domain, author, near-dup cluster id) to keep
    correlated rows on one side — the leakage control exact row-level
    splits cannot give."""
    u = hash_uniform(*key_cols, salt=salt)
    return df.withColumn(
        split_col,
        F.when(u < F.lit(float(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )
