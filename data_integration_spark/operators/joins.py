"""Join operators (SURVEY.md §2.4).

The reference's join surface: an n-way full-outer fold (``reduce(full_join)``,
``Method_code.Rmd:466-469``), chained SQL left joins (``Rmd:763-772``),
implicit per-state scalar lookups inside loops (``Rmd:322,422``), rbind
unions (14 sites), and %in%-membership that is semantically a semi/anti join
(``Rmd:165,168``).

Scale strategy: per-area tables are ≤51 rows → ALWAYS broadcast (no shuffle);
fact-to-fact joins shuffle on the key and rely on AQE for skew. The
loop-over-states + filter pattern (O(S·n) scans in the reference) becomes a
single broadcast hash join.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_outer_fold(dfs: Sequence[DataFrame], on: str | list[str]) -> DataFrame:
    """Fold N tables with full outer joins on a shared key (reference J1,
    ``df_list %>% reduce(full_join, by='state')``, ``Rmd:466-469``)."""
    return reduce(lambda a, b: a.join(b, on=on, how="full_outer"), dfs)


def broadcast_lookup(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Broadcast hash join of a small dimension onto a fact table (reference
    J3: the per-state scalar lookup loop ``vr[vr$state==s,]$v_tilde``,
    ``Rmd:322,422`` — one broadcast join replaces S full-table filters)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``left`` whose key appears in ``right`` (reference J5:
    ``cps$state %in% pew_state_list``, ``Rmd:168``)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of ``left`` whose key is absent from ``right`` (reference J6 —
    the general form of the hard-coded MT/SD complement, ``Rmd:165``)."""
    return left.join(right, on=on, how="left_anti")


def union_all_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """By-name union of N tables (reference J4, ``rbind``/``bind_rows`` —
    14 sites). Missing columns are not allowed (strict, like ``rbind``)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
