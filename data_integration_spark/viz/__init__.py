from data_integration_spark.viz.choropleth import (
    render_choropleth_svg,
    save_choropleth,
)

__all__ = ["render_choropleth_svg", "save_choropleth"]
