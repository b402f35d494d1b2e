"""Choropleth map sink (reference S4, ``Method_code.Rmd:513-549``: US maps
of actual / direct / EBP via ``plot_usmap``).

Spark-first shape: the map consumes the ≤51-row tidy estimate table (one
``toPandas()`` of an already-aggregated frame — never unit-level data), and
renders a dependency-free SVG **tile-grid cartogram** of the US states (the
standard equal-size state-tile layout popularised by NPR/FiveThirtyEight;
coordinates below are that public layout). No matplotlib/plotly in this
container — SVG needs none.

The color scale is a linear two-color ramp with explicit domain handling
(NULL → hatched gray tile, matching the reference's gray for
missing-from-survey states). Deterministic output: same input table → same
bytes, so tests golden-check the SVG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Standard US state tile-grid positions (col, row) — public layout.
TILE_GRID: dict[str, tuple[int, int]] = {
    "AK": (0, 0), "ME": (10, 0),
    "VT": (9, 1), "NH": (10, 1),
    "WA": (0, 2), "ID": (1, 2), "MT": (2, 2), "ND": (3, 2), "MN": (4, 2),
    "IL": (5, 2), "WI": (6, 2), "MI": (7, 2), "NY": (8, 2), "RI": (9, 2),
    "MA": (10, 2),
    "OR": (0, 3), "NV": (1, 3), "WY": (2, 3), "SD": (3, 3), "IA": (4, 3),
    "IN": (5, 3), "OH": (6, 3), "PA": (7, 3), "NJ": (8, 3), "CT": (9, 3),
    "CA": (0, 4), "UT": (1, 4), "CO": (2, 4), "NE": (3, 4), "MO": (4, 4),
    "KY": (5, 4), "WV": (6, 4), "VA": (7, 4), "MD": (8, 4), "DE": (9, 4),
    "AZ": (1, 5), "NM": (2, 5), "KS": (3, 5), "AR": (4, 5), "TN": (5, 5),
    "NC": (6, 5), "SC": (7, 5), "DC": (8, 5),
    "OK": (3, 6), "LA": (4, 6), "MS": (5, 6), "AL": (6, 6), "GA": (7, 6),
    "HI": (0, 7), "TX": (3, 7), "FL": (8, 7),
}

_CELL = 52
_PAD = 8
_LOW = (247, 251, 255)   # light
_HIGH = (8, 48, 107)     # dark blue


def _ramp(t: float) -> str:
    t = min(max(t, 0.0), 1.0)
    r = round(_LOW[0] + t * (_HIGH[0] - _LOW[0]))
    g = round(_LOW[1] + t * (_HIGH[1] - _LOW[1]))
    b = round(_LOW[2] + t * (_HIGH[2] - _LOW[2]))
    return f"#{r:02x}{g:02x}{b:02x}"


def render_choropleth_svg(
    estimates: DataFrame | "list[tuple]",
    state_col: str = "state",
    value_col: str = "value",
    title: str = "",
    vmin: float | None = None,
    vmax: float | None = None,
) -> str:
    """Render a per-state estimate table as an SVG tile-grid choropleth.

    ``estimates``: a Spark DataFrame holding one row per state (any states
    absent or NULL-valued render as hatched gray, the reference's
    missing-state convention), or an already-collected list of
    (state, value) tuples. Collecting a ≤51-row aggregate is the ONLY
    driver materialization — correct at any input scale because the
    aggregation upstream already reduced to areas.
    """
    if isinstance(estimates, DataFrame):
        rows = [
            (r[state_col], r[value_col])
            for r in estimates.select(state_col, value_col).collect()
        ]
    else:
        rows = list(estimates)
    values = {s: v for s, v in rows}
    # non-US area codes (synthetic fixtures, other geographies) fall back to
    # a dense alphabetical grid — same tile semantics, no hard-coded layout
    known = sum(1 for s in values if s in TILE_GRID)
    if values and known < len(values) / 2:
        codes = sorted(values)
        per_row = 10
        grid = {
            s: (i % per_row, i // per_row) for i, s in enumerate(codes)
        }
    else:
        grid = TILE_GRID
    present = [v for v in values.values() if v is not None]
    lo = vmin if vmin is not None else (min(present) if present else 0.0)
    hi = vmax if vmax is not None else (max(present) if present else 1.0)
    span = (hi - lo) or 1.0

    ncols = 1 + max((c for c, _ in grid.values()), default=0)
    nrows = 1 + max((r for _, r in grid.values()), default=0)
    w = _PAD * 2 + ncols * _CELL
    h = _PAD * 2 + nrows * _CELL + (28 if title else 0) + 40  # legend strip
    top = _PAD + (28 if title else 0)

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'font-family="sans-serif">',
        '<defs><pattern id="na" width="6" height="6" '
        'patternUnits="userSpaceOnUse" patternTransform="rotate(45)">'
        '<rect width="6" height="6" fill="#eeeeee"/>'
        '<line x1="0" y1="0" x2="0" y2="6" stroke="#bbbbbb" stroke-width="2"/>'
        "</pattern></defs>",
    ]
    if title:
        out.append(
            f'<text x="{w / 2}" y="{_PAD + 14}" text-anchor="middle" '
            f'font-size="16">{title}</text>'
        )
    for st in sorted(grid):
        c, r = grid[st]
        x = _PAD + c * _CELL
        y = top + r * _CELL
        v = values.get(st)
        fill = "url(#na)" if v is None else _ramp((v - lo) / span)
        label_fill = (
            "#000000" if v is None or (v - lo) / span < 0.55 else "#ffffff"
        )
        tip = "n/a" if v is None else f"{v:.2f}"
        out.append(
            f'<rect x="{x}" y="{y}" width="{_CELL - 4}" height="{_CELL - 4}" '
            f'rx="4" fill="{fill}" stroke="#ffffff">'
            f"<title>{st}: {tip}</title></rect>"
        )
        out.append(
            f'<text x="{x + (_CELL - 4) / 2}" y="{y + _CELL / 2 + 2}" '
            f'text-anchor="middle" font-size="13" fill="{label_fill}">{st}</text>'
        )
    # legend: 5-stop ramp + min/max labels
    ly = top + nrows * _CELL + 10
    for i in range(5):
        out.append(
            f'<rect x="{_PAD + i * 40}" y="{ly}" width="40" height="12" '
            f'fill="{_ramp(i / 4)}"/>'
        )
    out.append(
        f'<text x="{_PAD}" y="{ly + 26}" font-size="11">{lo:.2f}</text>'
    )
    out.append(
        f'<text x="{_PAD + 200}" y="{ly + 26}" text-anchor="end" '
        f'font-size="11">{hi:.2f}</text>'
    )
    out.append("</svg>")
    return "\n".join(out)


def save_choropleth(
    estimates: DataFrame,
    path: str,
    state_col: str = "state",
    value_col: str = "value",
    title: str = "",
    **kwargs,
) -> str:
    """Write the SVG map to ``path`` (the S4 'file sink' form); returns the
    path. Mirrors the reference's three map outputs when called once per
    estimator column (``Rmd:513-549``)."""
    svg = render_choropleth_svg(
        estimates, state_col=state_col, value_col=value_col, title=title, **kwargs
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(svg)
    return path
