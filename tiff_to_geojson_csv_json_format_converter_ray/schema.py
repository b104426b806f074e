"""Canonical Arrow schemas of the engine's tables.

Derived from the reference's implicit data model (SURVEY.md par.1):

- tile table    -- the raster: one row per tile window, replicating the
  GeoTIFF semantics of ``rasterio.open`` band reads
  (reference: completePixleOutput.py:21-35).
- point table   -- the pivoted raster, one row per pixel
  (reference: completePixleOutput.py:41-52).
- polygon table -- GeoJSON-ish vector side table (reference:
  test2.py:250-272).
- pages table   -- Common-Crawl-style web pages (BASELINE.json
  input_hint).
- stats table   -- per-band / per-polygon zonal statistics record
  (reference: test2.py:1381-1388).
- manifest      -- per-partition lineage/checkpoint record
  (BASELINE.json north_rule).
"""

from __future__ import annotations

import pyarrow as pa

# float32 lowest: the reference's NoData sentinel
# (willOnlyStoreValidPoints.py:66 uses threshold z > -1e30 against it).
NODATA_F32 = -3.4028234663852886e38
NODATA_THRESHOLD = -1e30

TILE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("src", pa.string()),          # source raster name (file-level lineage)
        ("band", pa.int32()),
        ("row_off", pa.int32()),
        ("col_off", pa.int32()),
        ("height", pa.int32()),
        ("width", pa.int32()),
        ("transform", pa.list_(pa.float64(), 6)),  # GDAL order a,b,c,d,e,f
        ("crs", pa.string()),
        ("nodata", pa.float64()),
        ("values", pa.list_(pa.float32())),        # row-major H*W
    ]
)

POINT_SCHEMA = pa.schema(
    [
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("z", pa.float64()),
        ("band", pa.int32()),
        ("src", pa.string()),
        ("pix", pa.int64()),  # flat pixel index within the source raster (stride sampling key)
    ]
)

POLYGON_SCHEMA = pa.schema(
    [
        ("polygon_id", pa.string()),
        ("geom_type", pa.string()),  # Polygon | MultiPolygon
        # rings: list of rings, each a list of [lon, lat] pairs; first ring of
        # each polygon is the shell, later rings are holes (even-odd rule).
        ("rings", pa.list_(pa.list_(pa.list_(pa.float64(), 2)))),
        ("minx", pa.float64()),
        ("miny", pa.float64()),
        ("maxx", pa.float64()),
        ("maxy", pa.float64()),
    ]
)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

BAND_STATS_SCHEMA = pa.schema(
    [
        ("key", pa.string()),        # e.g. "band_1" or polygon_id
        ("band", pa.int32()),
        ("min", pa.float64()),       # null when count == 0 ("Null" sentinel)
        ("max", pa.float64()),
        ("mean", pa.float64()),
        ("std", pa.float64()),
        ("count", pa.int64()),
        ("data_type", pa.string()),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.string()),
        ("input_blocks", pa.list_(pa.string())),
        ("cell_min", pa.uint64()),
        ("cell_max", pa.uint64()),
        ("row_count", pa.int64()),
        ("output_path", pa.string()),
        ("finished_ts", pa.timestamp("us")),
    ]
)
