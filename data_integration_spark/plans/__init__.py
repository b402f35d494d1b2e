from data_integration_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
]
