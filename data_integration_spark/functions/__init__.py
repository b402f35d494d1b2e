from data_integration_spark.functions.math import expit, linear_predictor, logit
from data_integration_spark.functions.stats import (
    error_measures,
    mspe_by_group,
    survey_mean_se,
    weighted_mean_by_group,
)
from data_integration_spark.functions.rng import bernoulli, hash_uniform, seeded_normal

__all__ = [
    "expit",
    "logit",
    "linear_predictor",
    "error_measures",
    "mspe_by_group",
    "survey_mean_se",
    "weighted_mean_by_group",
    "bernoulli",
    "hash_uniform",
    "seeded_normal",
]
