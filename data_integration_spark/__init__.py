"""data_integration_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference repo ``asen123/data_integration`` (replication code for
"Estimation of finite population proportions for small areas", arXiv:2305.12336),
re-expressed Spark-first:

- a relational/dataflow layer (projections, filters, joins, unions, grouped
  weighted aggregations, SQL entry point) built entirely on Catalyst-native
  DataFrame / Spark SQL operations (SURVEY.md §2.1-2.9);
- a statistical layer (GLMM via EM with adjusted maximum likelihood, EBP,
  survey-weighted direct estimation, parametric bootstrap MSPE) built on
  MLlib + ``applyInPandas`` + driver-side SciPy with distributed objectives
  (SURVEY.md §2.10-2.12);
- large-scale training-data pipeline extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search, text
  analysis, multimodal column plumbing, structured streaming.

Design rules: DataFrame-first, declarative plans for Catalyst, broadcast small
dims, no driver-side row loops, Pandas UDFs only where built-ins genuinely
cannot express the semantics.
"""

from data_integration_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
