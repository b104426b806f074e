"""The graft flagship pipeline: Common-Crawl-style pages -> extract ->
geocode -> cell encode -> spatial join -> aggregates.

This is the pipeline BASELINE.json's metric measures: per-row HTML
text extraction (byte-identical per url), geo-span geocoding, frozen
cell assignment at res 7-9, optional point-in-polygon join against an
admin polygon side table, and skew-aware per-cell aggregation.  All
stages are ``map_batches`` over Arrow; the only materialized results
are small aggregate tables.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.extract import PageExtract, add_cells
from ..stages.joins import PIPJoiner, broadcast_table
from ..stages.shuffle import partial_count

PAGES_READ_COLS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=columns or PAGES_READ_COLS)


def geocode_pages(
    pages: ray.data.Dataset,
    resolutions: tuple[int, ...] = (7, 8, 9),
    check_invariant: bool = True,
) -> ray.data.Dataset:
    """pages -> geocoded point rows (rows without a geo span keep
    cell = -1; drop with a filter if not wanted)."""
    ds = pages.map_batches(
        PageExtract(check_invariant=check_invariant), batch_format="pyarrow", batch_size=None
    )
    return ds.map_batches(
        lambda b: add_cells(b, resolutions), batch_format="pyarrow", batch_size=None
    )


def pages_flagship(
    pages_path: str,
    polygons: pa.Table | None = None,
    res: int = 8,
    concurrency: int | None = None,
) -> dict[str, pa.Table]:
    """End-to-end: returns small aggregate tables
    {cell_counts, lang_counts, polygon_counts?}."""
    geo = geocode_pages(read_pages(pages_path))
    geo_only = geo.map_batches(
        lambda b: b.filter(pc.equal(b["has_geo"], True)), batch_format="pyarrow", batch_size=None
    )

    out: dict[str, pa.Table] = {}
    out["lang_counts"] = partial_count(geo, ["lang"])
    out["cell_counts"] = partial_count(geo_only, [f"cell_{res}"])

    if polygons is not None:
        ref = broadcast_table(polygons)
        kwargs: dict = {"batch_format": "pyarrow"}
        if concurrency is None:
            joined = geo_only.map_batches(PIPJoiner(ref), **kwargs)
        else:
            joined = geo_only.map_batches(
                PIPJoiner,
                fn_constructor_kwargs={"polygons": ref},
                concurrency=concurrency,
                **kwargs,
            )
        out["polygon_counts"] = partial_count(joined, ["polygon_id"])
    return out
