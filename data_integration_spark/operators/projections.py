"""Projection / column operators (SURVEY.md §2.2).

The reference mutates data.frame columns in place and relies on positional
row order (``cbind``/``rownames``). DataFrames are unordered multisets, so
every positional idiom is re-expressed with explicit keys:

- P6 row-ID (``df$ID <- 1:nrow(df)``, ``Method_code.Rmd:48,208``) →
  ``row_number()`` over an explicit ordering key.
- P9 one-hot (``fastDummies::dummy_cols``, ``Rmd:51-58``) → per-category
  indicator columns, vectorized ``when`` expressions.
- P10 positional cbind (``Rmd:268,285,426,...``) → join on an explicit key
  (never positional; SURVEY.md §7.5).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_row_id(
    df: DataFrame, order_by: str | Sequence[str], id_col: str = "ID",
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Dense 1..n row id (reference P6/W1).

    Scale note: an unpartitioned ``row_number`` funnels all rows through one
    task — fine for dimension-sized tables; for fact tables either pass
    ``partition_by`` (per-group ids) or use ``monotonically_increasing_id``
    when only uniqueness is required.
    """
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if partition_by is None:
        w = Window.orderBy(*order_by)
    else:
        partition_by = (
            [partition_by] if isinstance(partition_by, str) else list(partition_by)
        )
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(id_col, F.row_number().over(w).cast("long"))


def sanitize_name(name: str) -> str:
    """Column-name sanitation matching the reference's manual rename of
    ``educ4_col grad`` → ``educ4_col_grad`` (``Rmd:53``)."""
    return re.sub(r"[^0-9A-Za-z_]", "_", name)


def one_hot(
    df: DataFrame, column: str, categories: Sequence[str], prefix: str | None = None,
    drop_input: bool = False,
) -> DataFrame:
    """One 0/1 column per category (reference P9, ``dummy_cols`` ``Rmd:51-58``).

    ``categories`` is explicit (deterministic schema — R factor levels made
    explicit per SURVEY.md §7.5) rather than discovered at plan time.
    """
    prefix = prefix if prefix is not None else column
    out = df
    for cat in categories:
        out = out.withColumn(
            sanitize_name(f"{prefix}_{cat}"),
            (F.col(column) == F.lit(cat)).cast("int"),
        )
    return out.drop(column) if drop_input else out


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename (reference P3, ``Rmd:53,691``)."""
    return df.withColumnsRenamed(mapping)


def set_headers(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Bulk header reassign (reference P4, ``colnames(df) <- c(...)``,
    ``Rmd:207,274,431,453,757``)."""
    return df.toDF(*names)


def bind_via_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Key-based replacement for positional ``cbind`` (reference P10).

    The reference pastes computed vectors next to existing columns relying on
    row order; distributed tables have no order, so binding is ALWAYS a join
    on an explicit key.
    """
    return left.join(right, on=on, how=how)
