"""S4 choropleth sink: deterministic SVG tile-grid maps of per-area
estimates (reference ``Method_code.Rmd:513-549``)."""

from __future__ import annotations

from pyspark.sql import Row

from data_integration_spark.viz import render_choropleth_svg, save_choropleth
from data_integration_spark.viz.choropleth import TILE_GRID


def test_svg_from_spark_dataframe(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(state="CA", value=80.0), Row(state="TX", value=20.0),
         Row(state="MT", value=None)]
    )
    path = save_choropleth(df, str(tmp_path / "m.svg"), title="EBP")
    svg = open(path).read()
    # every US tile drawn; NULL state hatched; title present
    assert svg.count("<rect") >= len(TILE_GRID)
    assert 'url(#na)' in svg and ">EBP</text>" in svg
    # color monotone: CA (max) darker than TX (min) — max maps to _HIGH
    assert "#08306b" in svg  # dark end of the ramp on the max state
    assert "#f7fbff" in svg  # light end on the min state


def test_svg_deterministic_and_scale_fixed(spark):
    rows = [("CA", 80.0), ("TX", 20.0), ("NY", 50.0)]
    a = render_choropleth_svg(rows)
    b = render_choropleth_svg(list(reversed(rows)))
    assert a == b  # input order never changes the bytes
    # explicit domain: same value renders the same color across maps
    c1 = render_choropleth_svg([("CA", 50.0)], vmin=0.0, vmax=100.0)
    c2 = render_choropleth_svg([("CA", 50.0), ("TX", 99.0)], vmin=0.0, vmax=100.0)
    ca1 = [l for l in c1.splitlines() if "CA: 50.00" in l][0]
    ca2 = [l for l in c2.splitlines() if "CA: 50.00" in l][0]
    assert ca1 == ca2


def test_synthetic_states_fall_back_to_generic_grid():
    svg = render_choropleth_svg([(f"S{i:02d}", float(i)) for i in range(51)])
    assert svg.count("<rect") >= 51
    assert ">S00</text>" in svg and ">S50</text>" in svg
