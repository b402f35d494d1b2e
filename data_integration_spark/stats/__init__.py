from data_integration_spark.stats.em import EMEstimator, EMResult
from data_integration_spark.stats.glmm import FixedEffectsGLM

__all__ = ["EMEstimator", "EMResult", "FixedEffectsGLM"]
