"""Physical-plan introspection helpers.

The engine's performance contract is enforced as TESTS over the plans
Catalyst actually produces (tests/test_plans.py): filters reach the parquet
scan (PushedFilters), projections prune the read schema (ReadSchema),
dimension joins broadcast (BroadcastHashJoin), aggregations keep map-side
partials. A regression that silently de-optimizes a plan fails CI, not a
100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across scans in the EXECUTED plan
    (one string per scan, possibly empty). Dynamic partition pruning
    shows as a ``dynamicpruning…`` expression, static pruning as a
    plain predicate on the partition column — callers assert whichever
    contract they rely on."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        m.group(1) for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan)
    ]


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    # formatted output lists each node once in the tree ("(7) Exchange") and
    # once in the details section — count tree nodes only
    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Descriptions of every UNPARTITIONED window whose input is not
    provably bounded — the single-task funnel anti-pattern (VERDICT r13
    #2: a global ``row_number`` over an order-level or vocabulary-sized
    frame serializes the whole frame through one task at 100 TB; the
    scale-safe top-k is ``orderBy().limit(k)`` → TakeOrderedAndProject,
    then window-number the ≤ k survivors).

    Walks the JVM physical-plan tree: a ``WindowExec``/
    ``WindowGroupLimitExec`` with an EMPTY partitionSpec is flagged
    UNLESS its child subtree contains a limit-shaped node
    (TakeOrderedAndProject / GlobalLimit / CollectLimit — the input is
    then ≤ a literal k rows regardless of data scale) or is a
    LocalTableScan (driver-built literal frame). Partitioned windows and
    bounded global windows return nothing. Subquery plans are not
    traversed (no registered query hides a window in one)."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()

    _BOUNDED = (
        "TakeOrderedAndProjectExec",
        "GlobalLimitExec",
        "CollectLimitExec",
        "LocalTableScanExec",
    )

    def subtree_bounded(node) -> bool:
        """True iff the node's OUTPUT row count is bounded by a literal
        (a limit on the direct chain, or all inputs of a join/union
        bounded). A limit hiding on ONE side of a join must NOT bound
        the join (r14 review: big_fact ⋈ small.limit(10) is fact-sized),
        and a Generate (explode) re-expands rows past any limit below
        it, so neither is crossed optimistically."""
        name = node.getClass().getSimpleName()
        if name in _BOUNDED:
            return True
        if "Generate" in name:  # row-multiplying: a limit below is void
            return False
        if name == "ReusedExchangeExec":
            # a childless REFERENCE node — follow the referenced exchange
            # so a bounded-and-reused subtree isn't flagged as a scan
            # (review pass 2); if the accessor ever changes, fall back to
            # the conservative (flagging) answer
            try:
                return subtree_bounded(node.child())
            except Exception:  # noqa: BLE001 — conservative fallback
                return False
        ch = node.children()
        n = ch.size()
        if n == 0:
            return False  # a real scan: corpus-sized
        if n == 1:
            # project/filter/sort/agg/exchange/window/codegen: output ≤ input
            return subtree_bounded(ch.apply(0))
        # joins, unions, cartesian products: output bounded only if EVERY
        # input is (|A ⋈ B| ≤ |A|·|B|, both literal-bounded → literal)
        return all(subtree_bounded(ch.apply(i)) for i in range(n))

    flagged: list[str] = []
    stack = [plan]
    while stack:
        p = stack.pop()
        name = p.getClass().getSimpleName()
        if name in ("WindowExec", "WindowGroupLimitExec") and p.partitionSpec().isEmpty():
            # an unpartitioned rank-filter plans as TWO WindowGroupLimit
            # nodes: a Partial-mode instance that prunes MAP-SIDE on every
            # partition (distributed — not itself a funnel) below the
            # single-partition Final one. Flag only the Final/WindowExec
            # hit so a future rank()<=k query gets ONE genuine finding,
            # not a duplicate needing whitelisting (ADVICE r14). Unknown
            # mode accessors fall through to flagging (conservative).
            partial = False
            if name == "WindowGroupLimitExec":
                try:
                    partial = str(p.mode()) == "Partial"
                except Exception:  # noqa: BLE001 — conservative fallback
                    partial = False
            if not partial and not subtree_bounded(p):
                flagged.append(p.simpleString(120))
        ch = p.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return flagged
