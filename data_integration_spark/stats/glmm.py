"""Fixed-effects logistic baseline via MLlib (reference M1/M2).

The reference fits ``glmer(demvote ~ x1..x7 + (1|state), binomial)``
(``Method_code.Rmd:68-71``) and extracts fixed effects/variance components
(``Rmd:72-80``). Spark has no GLMM; per SURVEY.md §2.10 the mapping is:
(a) fixed-effects-only baseline here (MLlib GeneralizedLinearRegression,
JVM-side IRLS — used for EM initialization and as the glmer-vs-EM
cross-check the reference prints at ``Rmd:602-607``), and (b) the random
intercept via the EM estimator (stats/em.py) — which is exactly what the
paper built it for.
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GeneralizedLinearRegression
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_spark.functions.math import expit
from data_integration_spark.stats.design import X_COLS, prep_design, x_beta_col


class FixedEffectsGLM:
    """Binomial/logit GLM over the reference design (intercept + x1..x7)."""

    def __init__(
        self,
        reg_param: float = 0.0,
        max_iter: int = 50,
        weight_col: str | None = None,
    ):
        self.reg_param = reg_param
        self.max_iter = max_iter
        self.weight_col = weight_col  # survey-weighted fit (svyglm analog)
        self.beta_: np.ndarray | None = None

    def fit(self, survey: DataFrame) -> "FixedEffectsGLM":
        prepped = prep_design(survey)
        assembled = VectorAssembler(
            inputCols=X_COLS, outputCol="features"
        ).transform(prepped)
        glr = GeneralizedLinearRegression(
            family="binomial",
            link="logit",
            labelCol="y",
            featuresCol="features",
            regParam=self.reg_param,
            maxIter=self.max_iter,
            **({"weightCol": self.weight_col} if self.weight_col else {}),
        )
        model = glr.fit(assembled)
        self.beta_ = np.concatenate(
            [[model.intercept], np.asarray(model.coefficients)]
        )
        return self

    def predict_col(self, v_col: Column | None = None) -> Column:
        """θ = expit(xβ [+ v]) as a native expression over a prepped frame
        (reference M3 ``predict(type='response')``, ``Rmd:171-181``) —
        no model object needed at scoring time."""
        assert self.beta_ is not None, "fit first"
        xb = x_beta_col(self.beta_)
        if v_col is not None:
            xb = xb + v_col
        return expit(xb)

    def score(self, survey: DataFrame, v_df: DataFrame | None = None) -> DataFrame:
        """Attach θ to every unit; per-area v̂ arrives by broadcast join with
        ``coalesce(v_hat, 0)`` for areas absent from the model (the
        generalized MT/SD path, ``Rmd:433-435``)."""
        prepped = prep_design(survey, with_outcome=False)
        if v_df is not None:
            prepped = prepped.join(F.broadcast(v_df), "state", "left")
            v = F.coalesce(F.col("v_hat"), F.lit(0.0))
        else:
            v = None
        return prepped.withColumn("theta", self.predict_col(v))
