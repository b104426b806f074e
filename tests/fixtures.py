"""Thin wrapper re-exporting the engine's deterministic fixture generators."""

from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (  # noqa: F401
    gen_pages,
    gen_polygons,
    gen_tiles,
    write_all_fixtures,
)
