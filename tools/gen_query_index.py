"""Generate QUERIES.md — the navigable index of every registered t2 query.

Run: python tools/gen_query_index.py   (rewrites QUERIES.md at repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_integration_spark.queries import (  # noqa: E402
    ORACLES,
    PENDING_R10,
    QUERIES,
    load_all,
)


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", " — ", " -- "):
        if stop in text:
            return text.split(stop, 1)[0].rstrip(".") + "."
    return text[:140]


def main() -> None:
    load_all()
    lines = [
        "# QUERIES — index of the registered t2 surface (generated)",
        "",
        "Regenerate with `python tools/gen_query_index.py`. 'oracle' = the",
        "driver value-checks the query against DuckDB SQL; 'rows-only' = the",
        "contract's escape hatch (stochastic / engine-internal hashing), with",
        "the real assertion in pytest (see COVERAGE.md for the mapping).",
        "",
        "| # | query | module | check | what it does |",
        "|---|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        mod = fn.__module__.rsplit(".", 1)[-1]
        check = "oracle" if name in ORACLES else "rows-only"
        desc = first_sentence(fn.__doc__).replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {mod} | {check} | {desc} |")
    n_oracle = len(ORACLES)
    lines += [
        "",
        f"**{len(QUERIES)} queries — {n_oracle} oracle-checked, "
        f"{len(QUERIES) - n_oracle} rows-only.**",
        "",
    ]
    if PENDING_R10:
        lines += [
            "## Staged for the r10 window (PENDING_R10 — not yet registered)",
            "",
            "Built and oracle-verified ahead of their signing round "
            "(tests/test_pending_r10.py); names already in the table above "
            "are rows-only → full-oracle upgrades at the flip.",
            "",
            "| staged query | module | what it does |",
            "|---|---|---|",
        ]
        for name, (fn, _oracle) in PENDING_R10.items():
            mod = fn.__module__.rsplit(".", 1)[-1]
            desc = first_sentence(fn.__doc__).replace("|", "\\|")
            lines.append(f"| `{name}` | {mod} | {desc} |")
        lines.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(QUERIES)} queries, {n_oracle} oracles")


if __name__ == "__main__":
    main()
