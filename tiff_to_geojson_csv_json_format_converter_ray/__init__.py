"""Ray-Data-native raster<->vector spatial data-processing engine.

Built from scratch (not a port) with the query/data-processing
capabilities of the reference repo
``Aditya00712/Tiff-to-geojson-csv-json-format-converter`` (see SURVEY.md):
pixel->point extraction, affine + CRS transforms, NoData filtering,
deterministic stride sampling, GeoJSON/CSV/JSON/Parquet sinks, per-band
and polygon-clipped zonal statistics, bbox pruning, point-in-polygon
joins, kNN lookups and fuzzy layer matching -- generalized into a
streaming tiling + spatial-join pipeline over Common-Crawl-style
web-page Parquet tables, plus the large-scale training-data operators
(dedup families, ANN search, text analysis, multimodal plumbing).

Everything runs as ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches; stateful stages (spatial indexes, kNN
trees) are actor pools.  All geo kernels are pure NumPy.

Nothing in this package calls ``ray.init()`` -- sessions are owned by
the caller (driver / bench / test fixture).
"""

__version__ = "0.1.0"

_API = {
    "convert": ("pipelines.convert", "convert"),
    "extract_points": ("pipelines.convert", "extract_points"),
    "build_catalog": ("pipelines.convert", "build_catalog"),
    "analyze": ("pipelines.analyze", "analyze"),
    "master_report": ("pipelines.analyze", "master_report"),
    "zonal_stats": ("pipelines.zonal", "zonal_stats"),
    "pages_flagship": ("pipelines.pages", "pages_flagship"),
    "geocode_pages": ("pipelines.pages", "geocode_pages"),
    "run_resumable": ("state.checkpoint", "run_resumable"),
    "find_layer_by_patterns": ("functions.match", "find_layer_by_patterns"),
}


def __getattr__(name):
    """Lazy top-level API (keeps `import <pkg>` light -- no Ray import
    until a pipeline is actually used)."""
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(name)
