"""The converter pipelines -- Ray-Data re-expression of the reference's
four extractor scripts (SURVEY par.3.1):

- mode='full'     completePixleOutput.py: ALL pixels, WGS84, 6/2 dp,
                  GeoJSON sink
- mode='valid'    willOnlyStoreValidPoints.py: threshold NoData filter
                  before output
- mode='sample'   doesSamples.py: stride sampling to <=100k points/src,
                  CSV+JSON+GeoJSON sinks
- mode='compress' thiswillcompress.py: native CRS, 2 dp, gzip CSV /
                  NPZ / gzip JSON / grid sinks

Execution shape: read tile parquet (column-pruned) -> TilePivot
map_batches (the controlled explode) -> vectorized filter/sample ->
distributed sinks + catalog.  Nothing materializes the point table on
the driver; catalogs/bounds come from partial/final aggregates.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import ray.data

from ..sinks import CSVSink, GeoJSONSink, JSONSink, NPZSink, run_sink
from ..stages.extract import TilePivot, master_widths_of
from ..stages.sampling import StrideSampler, sample_rate_for
from ..stages.stats import grouped_minmax
from ..stages.transform import ValidityFilter

TILE_META_COLS = ["tile_id", "src", "band", "row_off", "col_off", "height", "width"]


def _tif_paths(path: str) -> list[str]:
    """All GeoTIFF files under ``path`` (file, or dir globbed with the
    reference's four extension spellings, completePixleOutput.py:175)."""
    p = Path(path)
    if p.is_file():
        return [str(p)] if p.suffix.lower() in (".tif", ".tiff") else []
    if p.is_dir():
        return sorted(
            str(f)
            for pat in ("*.tif", "*.tiff", "*.TIF", "*.TIFF")
            for f in p.glob(pat)
        )
    return []


def read_geotiff_tiles(
    paths: list[str] | str,
    band: int | None = 1,
    tile: int = 256,
) -> ray.data.Dataset:
    """GeoTIFF source (S1): real ``.tif`` bytes -> TILE_SCHEMA rows via
    the from-scratch codec (sources/geotiff.py), replacing the
    reference's ``rasterio.open`` (completePixleOutput.py:21-35).

    One file per read task (``read_binary_files``) -- TIFF IFDs point
    anywhere in the file, so whole-file bytes are the natural unit; the
    emitted tile rows then stream through the same pivot stages as
    parquet tiles.  At 100 TB the per-file decode parallelizes across
    the cluster; oversized single files should be pre-split upstream."""
    from ..sources.geotiff import geotiff_to_tiles

    if isinstance(paths, str):
        paths = _tif_paths(paths) or [paths]

    def decode(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            src = Path(batch["path"][i].as_py()).stem
            data = batch["bytes"][i].as_py()
            out.append(geotiff_to_tiles(data, src, tile=tile, band=band))
        return pa.concat_tables(out)

    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(decode, batch_format="pyarrow", batch_size=None)


def read_tiles(path: str, band: int | None = 1) -> ray.data.Dataset:
    """Tile source (S1/S2): parquet tile rows, or a directory / file of
    real GeoTIFFs (decoded by sources/geotiff.py); band pruned at
    read."""
    tifs = _tif_paths(path)
    if tifs:
        return read_geotiff_tiles(tifs, band=band)
    if band is None:
        return ray.data.read_parquet(path)
    import pyarrow.dataset  # noqa: F401  (expression pushdown)
    import pyarrow.compute as pc

    return ray.data.read_parquet(path, filter=(pc.field("band") == band))


def tiles_metadata(path: str, tile: int = 256, band: int = 1) -> pa.Table:
    """Driver-side tiny read of tile geometry columns only (pruned).
    For GeoTIFF inputs this is a header-only mmap scan (a few KB per
    file, no pixel decode) over the same tile-window grid that
    :func:`read_geotiff_tiles` emits."""
    tifs = _tif_paths(path)
    if tifs:
        from ..sources.geotiff import open_geotiff_info

        ids, srcs, ro, co, hh, ww = [], [], [], [], [], []
        for f in tifs:
            info = open_geotiff_info(f)
            src = Path(f).stem
            for r0 in range(0, info.height, tile):
                for c0 in range(0, info.width, tile):
                    ids.append(f"{src}_b{band}_{r0}_{c0}")
                    srcs.append(src)
                    ro.append(r0)
                    co.append(c0)
                    hh.append(min(tile, info.height - r0))
                    ww.append(min(tile, info.width - c0))
        return pa.table(
            {
                "tile_id": ids,
                "src": srcs,
                "band": pa.array([band] * len(ids), pa.int32()),
                "row_off": pa.array(ro, pa.int32()),
                "col_off": pa.array(co, pa.int32()),
                "height": pa.array(hh, pa.int32()),
                "width": pa.array(ww, pa.int32()),
            }
        )
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=TILE_META_COLS)


def extract_points(
    tiles: ray.data.Dataset,
    meta: pa.Table,
    mode: str = "full",
    max_points: int = 100_000,
    cell_resolutions: tuple[int, ...] = (),
    sample_rate: int | None = None,
) -> ray.data.Dataset:
    """tiles -> point table Dataset under the reference mode semantics.

    ``sample_rate`` overrides the computed per-src rate with a fixed
    every-Nth-pixel stride (the user-facing knob of the recovered
    ``tiff_processor_enhanced`` module, SURVEY par.0)."""
    widths = master_widths_of(meta)
    reproject = mode != "compress"
    pivot = TilePivot(
        round_output=True,
        reproject=reproject,
        with_cells=cell_resolutions,
        master_widths=widths,
    )
    pts = tiles.map_batches(pivot, batch_format="pyarrow", batch_size=None)
    if mode in ("valid",):
        pts = pts.map_batches(ValidityFilter("threshold"), batch_format="pyarrow", batch_size=None)
    if sample_rate is not None and sample_rate > 1:
        pts = pts.map_batches(
            StrideSampler(int(sample_rate)), batch_format="pyarrow", batch_size=None
        )
    elif mode == "sample":
        import pyarrow.compute as pc

        t = meta
        n = pc.multiply(t["height"], t["width"])
        totals = (
            t.append_column("n", n)
            .group_by("src")
            .aggregate([("n", "sum")])
        )
        rates = {
            s: sample_rate_for(int(v), max_points)
            for s, v in zip(
                totals["src"].to_pylist(), totals["n_sum"].to_pylist()
            )
        }
        pts = pts.map_batches(StrideSampler(rates), batch_format="pyarrow", batch_size=None)
    return pts


def combine_csv_outputs(
    csv_dir: str,
    out_path: str,
    manifest: pa.Table | None = None,
    scratch_dir: str | None = None,
) -> int:
    """The reference's combined-file step (create_combined_file,
    completePixleOutput.py:252-282): re-ingest the per-source CSV
    outputs (S3), union them with a ``source_file`` lineage column
    derived from the file name, and write one combined CSV.  Returns
    the combined row count.

    Streaming: each input file becomes one Ray task that writes a
    header-less CSV fragment with the lineage column appended; the
    driver then byte-concatenates header + fragments in file order.
    The driver never holds the point rows (VERDICT r1 par."What's
    wrong" 3).  When the sink's ``manifest`` table is given, the input
    list comes from its ``output_path`` column instead of a directory
    glob, so stale files in ``csv_dir`` can't leak in.

    ``scratch_dir``: where fragment files are written.  Defaults to a
    driver-local tempdir (fine single-node); on a multi-node cluster
    pass a cluster-visible path (NFS / fuse mount) so fragment tasks on
    other nodes and the driver's concat see the same files."""
    import shutil
    import tempfile

    import ray.data as rd

    if manifest is not None and "output_path" in manifest.column_names:
        files = sorted(
            p for p in manifest["output_path"].to_pylist() if p.endswith(".csv")
        )
    else:
        files = sorted(str(p) for p in Path(csv_dir).glob("*.csv"))
    if not files:
        return 0

    if scratch_dir is not None:
        frag_dir = Path(scratch_dir)
        frag_dir.mkdir(parents=True, exist_ok=True)
    else:
        frag_dir = Path(tempfile.mkdtemp(prefix="combine_csv_"))

    def write_fragment(batch: pa.Table) -> pa.Table:
        import pandas as pd

        out = []
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            ordinal = batch["ord"][i].as_py()
            df = pd.read_csv(path)
            df["source_file"] = Path(path).stem.rsplit("_", 1)[0]
            frag = frag_dir / f"{ordinal:06d}.csv"
            # pandas' default float repr is per-row, so fragment-wise
            # writes byte-match the old whole-table to_csv
            df.to_csv(frag, index=False, header=False)
            out.append({"ord": ordinal, "rows": len(df),
                        "cols": ",".join(df.columns)})
        return pa.Table.from_pylist(out)

    ds = rd.from_items([{"path": f, "ord": i} for i, f in enumerate(files)])
    frags = pa.concat_tables(
        [
            t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in ds.map_batches(
                write_fragment, batch_format="pyarrow", batch_size=1
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
    )
    total = int(pa.compute.sum(frags["rows"]).as_py() or 0)
    header = frags["cols"][0].as_py() + "\n"
    with open(out_path, "wb") as out:
        out.write(header.encode())
        for ordinal in sorted(frags["ord"].to_pylist()):
            with open(frag_dir / f"{ordinal:06d}.csv", "rb") as f:
                shutil.copyfileobj(f, out)
    shutil.rmtree(frag_dir, ignore_errors=True)
    return total


def build_catalog_from_manifest(manifest: pa.Table) -> dict:
    """Catalog from a sink's manifest rows (per-partition bounds already
    recorded) -- no extra pass over the point table."""
    agg = (
        manifest.group_by("partition_key")
        .aggregate([("min_lon", "min"), ("max_lon", "max"),
                    ("min_lat", "min"), ("max_lat", "max"),
                    ("min_z", "min"), ("max_z", "max")])
        .rename_columns(["src", "min_lon", "max_lon", "min_lat",
                         "max_lat", "min_z", "max_z"])
    )
    return _catalog_from_bounds(agg)


def build_catalog(points: ray.data.Dataset, meta: pa.Table) -> dict:
    """Master catalog (K9, completePixleOutput.py:292-377): per-src
    bounds + has_valid_data + overall bounds, sorted by source name.
    Computed with one distributed partial/final pass."""
    bounds = grouped_minmax(points, ["src"], ["lon", "lat", "z"])
    return _catalog_from_bounds(bounds)


def _catalog_from_bounds(bounds: pa.Table) -> dict:
    files = []
    ob = {
        "min_x": float("inf"), "max_x": float("-inf"),
        "min_y": float("inf"), "max_y": float("-inf"),
        "min_z": float("inf"), "max_z": float("-inf"),
    }
    rows = bounds.to_pylist()
    for r in sorted(rows, key=lambda r: r["src"]):
        b = {
            "min_longitude": r["min_lon"], "max_longitude": r["max_lon"],
            "min_latitude": r["min_lat"], "max_latitude": r["max_lat"],
            "min_elevation": r["min_z"], "max_elevation": r["max_z"],
        }
        ob["min_x"] = min(ob["min_x"], b["min_longitude"])
        ob["max_x"] = max(ob["max_x"], b["max_longitude"])
        ob["min_y"] = min(ob["min_y"], b["min_latitude"])
        ob["max_y"] = max(ob["max_y"], b["max_latitude"])
        ob["min_z"] = min(ob["min_z"], b["min_elevation"])
        ob["max_z"] = max(ob["max_z"], b["max_elevation"])
        files.append(
            {
                "source_tiff": r["src"],
                "bounds_wgs84": b,
                # reference proxy: all-NoData files collapse min==max
                # (completePixleOutput.py:355)
                "has_valid_data": b["min_elevation"] != b["max_elevation"],
            }
        )
    return {
        "type": "elevation_catalog",
        "total_files": len(files),
        "overall_bounds": ob,
        "files": files,
    }


def convert(
    tiles_path: str,
    out_dir: str,
    mode: str = "full",
    formats: tuple[str, ...] | None = None,
) -> dict:
    """Full converter run: extract -> sinks -> catalog; returns summary
    {mode, formats, total_points, catalog_path, manifests}."""
    if formats is None:
        formats = {
            "full": ("geojson",),
            "valid": ("geojson",),
            "sample": ("csv", "json", "geojson"),
            "compress": ("csv_gz", "npz", "json_gz"),
        }[mode]

    meta = tiles_metadata(tiles_path)
    meta = meta.filter(pa.compute.equal(meta["band"], 1))
    tiles = read_tiles(tiles_path, band=1)
    pts = extract_points(tiles, meta, mode=mode)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifests: dict[str, pa.Table] = {}
    sink_map = {
        "geojson": GeoJSONSink(str(out / "geojson")),
        "csv": CSVSink(str(out / "csv"), wgs84=True),
        "csv_gz": CSVSink(str(out / "csv"), wgs84=False, compression="gzip"),
        "json": JSONSink(str(out / "json")),
        "json_records": JSONSink(str(out / "json"), records=True),
        "json_gz": JSONSink(str(out / "json"), compression="gzip"),
        "npz": NPZSink(str(out / "npz")),
        "parquet": None,
    }
    total_points = None
    file_formats = [f for f in formats if f != "parquet"]
    if "parquet" in formats:
        pts.write_parquet(str(out / "parquet"))
    if file_formats:
        from ..sinks import MultiSink

        combined = run_sink(
            pts, MultiSink({f: sink_map[f] for f in file_formats})
        )
        for fmt in file_formats:
            manifests[fmt] = combined.filter(
                pa.compute.equal(combined["format"], fmt)
            ).drop_columns(["format"])
        total_points = int(
            pa.compute.sum(manifests[file_formats[0]]["row_count"]).as_py() or 0
        )

    if manifests:
        # bounds already recorded per written file -- no extra pass
        first = next(iter(manifests.values()))
        catalog = build_catalog_from_manifest(first)
    else:
        catalog = build_catalog(pts, meta)
    catalog_path = out / "elevation_catalog.json"
    catalog_path.write_text(json.dumps(catalog, indent=2))
    return {
        "mode": mode,
        "formats": list(formats),
        "total_points": total_points,
        "catalog_path": str(catalog_path),
        "manifests": {k: v.to_pylist() for k, v in manifests.items()},
    }


def write_grid_geotiffs(
    points: ray.data.Dataset,
    specs: dict,
    out_dir: str,
    nodata: float | None = None,
) -> pa.Table:
    """Distributed K7 grid output with a real GeoTIFF container: one
    ``groupby(src)`` shuffle co-locates each source raster's points,
    and the per-group task regrids + writes ``<src>.tif`` via the
    from-scratch codec -- the engine round-trips the reference's
    native format end-to-end.  ``specs``: ``{src: {"transform": [...],
    "height": H, "width": W, "crs": ..., "nodata": ...}}`` (driver-side
    tiny; from :func:`tiles_metadata` + footer scans).  Partitioning
    assumption: ONE SOURCE RASTER's grid fits a worker (the same bound
    as the reference's per-file processing)."""
    from pathlib import Path as _Path

    from ..schema import NODATA_F32
    from ..sinks import write_regrid_geotiff

    _Path(out_dir).mkdir(parents=True, exist_ok=True)
    default_nd = float(NODATA_F32) if nodata is None else float(nodata)

    def one(group: pa.Table) -> pa.Table:
        src = group["src"][0].as_py()
        spec = specs[src]
        path = str(_Path(out_dir) / f"{src}.tif")
        write_regrid_geotiff(
            group, path,
            transform=[float(t) for t in spec["transform"]],
            height=int(spec["height"]), width=int(spec["width"]),
            nodata=float(spec.get("nodata", default_nd)),
            crs=spec.get("crs", "EPSG:4326"),
        )
        return pa.table(
            {
                "src": pa.array([src]),
                "path": pa.array([path]),
                "row_count": pa.array([group.num_rows], pa.int64()),
            }
        )

    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in points.groupby("src")
        .map_groups(one, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    return pa.concat_tables(parts, promote_options="default")
