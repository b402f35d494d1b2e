"""Result-preservation pins for the VERDICT r13 #2 top-k refactors.

q_top_orders and q_term_cooccurrence replaced global unpartitioned
``row_number`` windows (a single-task funnel over an order-level /
vocabulary-sized frame at 100 TB) with ``orderBy().limit(k)`` —
TakeOrderedAndProject, Spark's distributed partial top-k — followed by
window-numbering only the ≤ k survivors. Both orders are TOTAL
((revenue desc, o_orderkey) / (df desc, tk) — the tie-break column is
unique), so the refactor is result-preserving BY CONSTRUCTION; these
pins hold the exact pre-refactor outputs (captured on the pre-edit r14
tree at both driver SFs) so the construction argument is also a test —
if the driver hash ever shifts, this fails before the signing window
does. Plan shape is asserted in tests/test_plans.py (the global-window
lint + TakeOrdered contract).
"""

from __future__ import annotations

import pytest

from data_integration_spark.queries import QUERIES, load_all

load_all()

# captured on the PRE-refactor tree (global-window form), 2026-08-16
_TOP_ORDERS_PINNED = {
    "/root/testdata/sf0.001": [
        (370, 498059.6788, 8),
        (406, 478634.1161, 10),
        (555, 499926.0206, 7),
        (641, 492555.6349, 9),
        (660, 579710.6815, 3),
        (785, 574560.7464, 4),
        (924, 706620.2387, 1),
        (1217, 553670.4398, 6),
        (1325, 559222.5613, 5),
        (1439, 619691.7693, 2),
    ],
    "/root/testdata/sf0.01": [
        (387, 616955.1253, 3),
        (6560, 594237.9507, 7),
        (6607, 617525.2863, 2),
        (6755, 587897.0149, 10),
        (8981, 593940.8957, 8),
        (9205, 599977.3251, 5),
        (9544, 598153.5947, 6),
        (12376, 588105.072, 9),
        (13187, 601776.4549, 4),
        (14320, 642025.7188, 1),
    ],
}

_COOC_PINNED = {
    "/root/testdata/sf0.001": [
        ("agg", "query", 338),
        ("big", "query", 342),
        ("customer", "query", 341),
        ("customer", "window", 338),
        ("fast", "query", 345),
        ("fast", "sort", 339),
        ("key", "query", 341),
        ("key", "window", 342),
        ("merge", "part", 341),
        ("merge", "query", 342),
        ("order", "window", 340),
        ("part", "query", 344),
        ("query", "scan", 346),
        ("query", "sort", 340),
        ("query", "table", 341),
        ("query", "vector", 340),
        ("query", "window", 350),
        ("scan", "sort", 339),
        ("scan", "window", 340),
        ("sort", "window", 340),
    ],
    "/root/testdata/sf0.01": [
        ("agg", "data", 329),
        ("agg", "merge", 333),
        ("agg", "row", 329),
        ("agg", "scan", 336),
        ("agg", "small", 329),
        ("batch", "customer", 332),
        ("batch", "filter", 334),
        ("batch", "row", 329),
        ("batch", "scan", 331),
        ("batch", "slow", 330),
        ("batch", "small", 334),
        ("big", "customer", 334),
        ("big", "join", 329),
        ("big", "small", 334),
        ("customer", "filter", 329),
        ("customer", "join", 329),
        ("customer", "small", 329),
        ("filter", "scan", 333),
        ("order", "scan", 330),
        ("small", "stream", 330),
    ],
}


@pytest.mark.parametrize("sf_dir", sorted(_TOP_ORDERS_PINNED))
def test_top_orders_matches_pre_refactor_pin(spark, sf_dir):
    got = sorted(tuple(r) for r in QUERIES["q_top_orders"](spark, sf_dir).collect())
    assert got == _TOP_ORDERS_PINNED[sf_dir]


@pytest.mark.parametrize("sf_dir", sorted(_COOC_PINNED))
def test_term_cooccurrence_matches_pre_refactor_pin(spark, sf_dir):
    got = sorted(
        tuple(r) for r in QUERIES["q_term_cooccurrence"](spark, sf_dir).collect()
    )
    assert got == _COOC_PINNED[sf_dir]
