from data_integration_spark.sources.catalog import Catalog, load_table, register_views
from data_integration_spark.sources.sinks import write_csv, write_parquet

__all__ = ["Catalog", "load_table", "register_views", "write_csv", "write_parquet"]
