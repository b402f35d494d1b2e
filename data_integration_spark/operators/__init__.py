from data_integration_spark.operators.projections import (
    add_row_id,
    bind_via_join,
    one_hot,
    rename_columns,
    set_headers,
)
from data_integration_spark.operators.joins import (
    anti_join,
    broadcast_lookup,
    full_outer_fold,
    semi_join,
    union_all_by_name,
)
from data_integration_spark.operators.aggregates import group_collect_sorted
from data_integration_spark.operators.explode import mc_replicates

__all__ = [
    "add_row_id",
    "bind_via_join",
    "one_hot",
    "rename_columns",
    "set_headers",
    "anti_join",
    "broadcast_lookup",
    "full_outer_fold",
    "semi_join",
    "union_all_by_name",
    "group_collect_sorted",
    "mc_replicates",
]
