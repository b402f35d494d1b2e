"""Registration-order contract: the external driver signs the FIRST 50
registered queries per round (CORRECTNESS_r01/r02 each contain exactly the
first 50 of their round's registration order). ``load_all`` therefore rotates
still-unsigned names to the front via ``_SIGN_PRIORITY``.

This test is self-maintaining: it unions every CORRECTNESS_r*.json present at
the repo root, so when a new round's file lands the "unsigned" set shrinks
and the rotation list must be re-derived if anything new falls outside the
window.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_integration_spark import queries as Q

DRIVER_WINDOW = 50


def _signed() -> set[str]:
    signed: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        signed |= set(json.load(open(path)))
    return signed


def test_unsigned_queries_fit_driver_window():
    Q.load_all()
    names = list(Q.QUERIES)
    unsigned = [n for n in names if n not in _signed()]
    window = set(names[:DRIVER_WINDOW])
    if len(unsigned) <= DRIVER_WINDOW:
        outside = [n for n in unsigned if n not in window]
        assert not outside, (
            f"{len(outside)} unsigned queries fall outside the driver's "
            f"first-{DRIVER_WINDOW} window — extend _SIGN_PRIORITY in "
            f"queries/__init__.py: {outside}"
        )
    else:
        # more unsigned than slots: every slot must go to a name that is
        # unsigned OR a declared re-sign (prior row errored / invalidated)
        eligible = set(unsigned) | Q._RESIGN
        wasted = [n for n in names[:DRIVER_WINDOW] if n not in eligible]
        assert not wasted, (
            f"window slots wasted on already-signed queries: {wasted}"
        )


def test_registries_stay_aligned_after_rotation():
    Q.load_all()
    assert set(Q.ORACLES) <= set(Q.QUERIES)
    # rotation must not drop or duplicate anything
    assert len(Q.QUERIES) == len(set(Q.QUERIES))
    priority_present = [n for n in Q._SIGN_PRIORITY if n in Q.QUERIES]
    assert list(Q.QUERIES)[: len(priority_present)] == priority_present
