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
