"""Sinks (reference K1-K9), distributed and resumable.

Each format sink is a ``map_batches`` stage that writes ONE file per
block inside the task and emits a tiny manifest row (path, rows,
bounds, partition key) instead of the data -- consuming the manifest
dataset both materializes the writes and yields the lineage/checkpoint
records (K9's catalog generalized; see state/checkpoint.py).  Output is
therefore partitioned (many files, never one giant file) and a resumed
run can skip finished partitions.

Format parity pinned to the reference:
- GeoJSON: FeatureCollection of Point [lon, lat, z] with crs + metadata
  block, compact separators (completePixleOutput.py:94-128).
- CSV: longitude,latitude,elevation at %.6f (doesSamples.py:95-103);
  gzip x,y,z at %.2f (thiswillcompress.py:64-73).
- JSON: {metadata:{...bounds...}, data:{longitude:[...],...}} compact,
  optionally gzip (doesSamples.py:106-139, thiswillcompress.py:91-116).
- NPZ: np.savez_compressed(x, y, z, metadata) (thiswillcompress.py:76-88).
- Grid: the inverse of extraction -- {transform, nodata, width, height,
  elevation_grid} (thiswillcompress.py:118-138).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa


def _block_tag(batch: pa.Table) -> str:
    """Deterministic per-block file tag: a content hash over the point
    columns.  A Ray task retry (or a re-run into the same out_dir)
    reproduces the SAME name and idempotently overwrites, instead of
    leaving uuid4 orphans that a later directory glob would union in as
    duplicate rows (ADVICE r1; mirrors checkpoint._atomic_write_parquet's
    deterministic naming)."""
    h = hashlib.sha1()
    h.update(str(batch.num_rows).encode())
    for c in ("pix", "lon", "lat", "z"):
        if c in batch.column_names and batch.num_rows:
            h.update(batch[c].to_numpy(zero_copy_only=False).tobytes())
    return h.hexdigest()[:12]


def _atomic_bytes(path: str, payload: bytes) -> None:
    """Write-then-rename so a killed task never leaves a torn file."""
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def _manifest_row(path: str, batch: pa.Table, key: str) -> pa.Table:
    def col(name):
        if name in batch.column_names and batch.num_rows:
            return batch[name].to_numpy(zero_copy_only=False)
        return np.array([np.nan])

    lon, lat, z = col("lon"), col("lat"), col("z")
    return pa.table(
        {
            "output_path": [path],
            "row_count": [batch.num_rows],
            "partition_key": [key],
            "min_lon": [float(np.nanmin(lon))],
            "max_lon": [float(np.nanmax(lon))],
            "min_lat": [float(np.nanmin(lat))],
            "max_lat": [float(np.nanmax(lat))],
            "min_z": [float(np.nanmin(z))],
            "max_z": [float(np.nanmax(z))],
        }
    )



def _split_by_src(batch: pa.Table):
    """One output file per (block, src): the reference writes per-source
    files, so lineage via file name stays exact even when a block mixes
    sources."""
    if "src" not in batch.column_names or batch.num_rows == 0:
        yield _part_name(batch), batch
        return
    srcs = batch["src"].to_pylist()
    uniq = sorted(set(srcs))
    if len(uniq) == 1:
        yield uniq[0], batch
        return
    import numpy as np

    arr = np.asarray(srcs, dtype=object)
    for s in uniq:
        yield s, batch.filter(pa.array(arr == s))


def _part_name(batch: pa.Table) -> str:
    if "src" in batch.column_names and batch.num_rows:
        return str(batch["src"][0].as_py())
    return "part"


class GeoJSONSink:
    """One FeatureCollection .geojson file per block (K1).

    ``max_points`` applies the reference's second-level GeoJSON cap
    (10,000 points via a second stride, doesSamples.py:145-150)."""

    def __init__(self, out_dir: str, source_label: str = "engine",
                 max_points: int | None = None):
        self.out_dir = out_dir
        self.source_label = source_label
        self.max_points = max_points

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            self._write_one(key, sub) for key, sub in _split_by_src(batch)
        ]
        return pa.concat_tables(rows, promote_options="default")

    def _write_one(self, key: str, batch: pa.Table) -> pa.Table:
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        path = os.path.join(self.out_dir, f"{key}_{_block_tag(batch)}.geojson")
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        if self.max_points is not None:
            from .stages.sampling import secondary_stride_indices

            keep = secondary_stride_indices(len(lon), self.max_points)
            lon, lat, z = lon[keep], lat[keep], z[keep]
        # direct string build: byte-identical to json.dump of the
        # nested Feature dicts with separators=(',',':') -- json uses
        # float.__repr__, so repr() here reproduces it exactly --
        # without allocating 3 dicts + 1 list per point
        features = ",".join(
            '{"type":"Feature","geometry":{"type":"Point","coordinates":'
            f"[{a!r},{b!r},{c!r}]}}}}"
            for a, b, c in zip(lon.tolist(), lat.tolist(), z.tolist())
        )
        header = {
            "type": "FeatureCollection",
            "crs": {"type": "name", "properties": {"name": "EPSG:4326"}},
            "metadata": {
                "source_file": key,
                "coordinate_system": "EPSG:4326 (WGS84)",
                "total_original_points": batch.num_rows,
                "geojson_points": int(len(lon)),
                "note": "Coordinates: [longitude, latitude, elevation]",
            },
        }
        head = json.dumps(header, separators=(",", ":"))
        doc = head[:-1] + ',"features":[' + features + "]}"
        _atomic_bytes(path, doc.encode())
        return _manifest_row(path, batch, key)


class CSVSink:
    """Plain or gzip CSV per block (K2/K3)."""

    def __init__(self, out_dir: str, wgs84: bool = True, compression: str | None = None):
        self.out_dir = out_dir
        self.wgs84 = wgs84  # True: longitude,latitude,elevation %.6f; False: x,y,z %.2f
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            self._write_one(key, sub) for key, sub in _split_by_src(batch)
        ]
        return pa.concat_tables(rows, promote_options="default")

    def _write_one(self, key: str, batch: pa.Table) -> pa.Table:
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        ext = ".csv.gz" if self.compression == "gzip" else ".csv"
        path = os.path.join(self.out_dir, f"{key}_{_block_tag(batch)}{ext}")
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        import pandas as pd

        # pandas to_csv with float_format reproduces the reference's
        # writers byte-for-byte (doesSamples.py:101 '%.6f',
        # thiswillcompress.py:70 '%.2f' + gzip)
        if self.wgs84:
            df = pd.DataFrame(
                {"longitude": lon, "latitude": lat, "elevation": z}
            )
            fmt = "%.6f"
        else:
            df = pd.DataFrame({"x": lon, "y": lat, "z": z})
            fmt = "%.2f"
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        df.to_csv(
            tmp, index=False, float_format=fmt,
            compression="gzip" if self.compression == "gzip" else None,
        )
        os.replace(tmp, path)
        return _manifest_row(path, batch, key)


class JSONSink:
    """Column-array JSON with metadata header (K4), optionally gzip
    (K5).  ``records=True`` writes the row-records orient instead
    ([{longitude, latitude, elevation}, ...]) -- the variant of the
    recovered ``tiff_processor_enhanced`` module (SURVEY par.0)."""

    def __init__(self, out_dir: str, compression: str | None = None,
                 extra_metadata: dict | None = None, records: bool = False):
        self.out_dir = out_dir
        self.compression = compression
        self.extra_metadata = extra_metadata or {}
        self.records = records

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            self._write_one(key, sub) for key, sub in _split_by_src(batch)
        ]
        return pa.concat_tables(rows, promote_options="default")

    def _write_one(self, key: str, batch: pa.Table) -> pa.Table:
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        ext = ".json.gz" if self.compression == "gzip" else ".json"
        path = os.path.join(self.out_dir, f"{key}_{_block_tag(batch)}{ext}")
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        doc = {
            "metadata": {
                "source_file": key,
                "output_crs": "EPSG:4326",
                "frontend_points": int(len(lon)),
                "bounds": {
                    "min_longitude": float(lon.min()) if len(lon) else None,
                    "max_longitude": float(lon.max()) if len(lon) else None,
                    "min_latitude": float(lat.min()) if len(lat) else None,
                    "max_latitude": float(lat.max()) if len(lat) else None,
                    "min_elevation": float(z.min()) if len(z) else None,
                    "max_elevation": float(z.max()) if len(z) else None,
                },
                **self.extra_metadata,
            },
            "data": (
                [
                    {"longitude": a, "latitude": b, "elevation": c}
                    for a, b, c in zip(lon.tolist(), lat.tolist(), z.tolist())
                ]
                if self.records
                else {
                    "longitude": lon.tolist(),
                    "latitude": lat.tolist(),
                    "elevation": z.tolist(),
                }
            ),
        }
        payload = json.dumps(doc, separators=(",", ":")).encode()
        if self.compression == "gzip":
            # mtime=0 keeps the gzip bytes deterministic across retries
            payload = gzip.compress(payload, mtime=0)
        _atomic_bytes(path, payload)
        return _manifest_row(path, batch, key)


class NPZSink:
    """Compressed binary columns (K6)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            self._write_one(key, sub) for key, sub in _split_by_src(batch)
        ]
        return pa.concat_tables(rows, promote_options="default")

    def _write_one(self, key: str, batch: pa.Table) -> pa.Table:
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        path = os.path.join(self.out_dir, f"{key}_{_block_tag(batch)}.npz")
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp.npz"
        np.savez_compressed(
            tmp,
            x=batch["lon"].to_numpy(zero_copy_only=False),
            y=batch["lat"].to_numpy(zero_copy_only=False),
            z=batch["z"].to_numpy(zero_copy_only=False),
            metadata=np.array([json.dumps({"source_file": key})]),
        )
        os.replace(tmp, path)
        return _manifest_row(path, batch, key)


def regrid_points(
    points: pa.Table, transform: list[float], height: int, width: int,
    nodata: float, src: str = "grid",
) -> dict:
    """Grid ("ultra-compact") writer payload (K7): scatter points back
    to the raster grid via the inverse affine -- the exact inverse of
    extraction (thiswillcompress.py:118-138)."""
    from .functions.affine import world_to_pixel

    lon = points["lon"].to_numpy(zero_copy_only=False)
    lat = points["lat"].to_numpy(zero_copy_only=False)
    z = points["z"].to_numpy(zero_copy_only=False)
    row, col = world_to_pixel(transform, lon, lat)
    r = np.floor(row).astype(np.int64)
    c = np.floor(col).astype(np.int64)
    ok = (r >= 0) & (r < height) & (c >= 0) & (c < width)
    grid = np.full((height, width), nodata, dtype=np.float64)
    grid[r[ok], c[ok]] = z[ok]
    return {
        "meta": {
            "file": src,
            "width": width,
            "height": height,
            "transform": [float(t) for t in transform],
            "nodata": float(nodata),
        },
        "elevation_grid": grid.tolist(),
    }


class MultiSink:
    """Write ALL requested formats in one pass over the stream: each
    batch goes through every member sink; manifest rows gain a
    ``format`` column.  One pipeline execution instead of one per
    format."""

    def __init__(self, sinks: dict):
        self.sinks = sinks

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for name, sink in self.sinks.items():
            m = sink(batch)
            outs.append(m.append_column("format", pa.array([name] * m.num_rows)))
        return pa.concat_tables(outs, promote_options="default")


def run_sink(ds, sink) -> pa.Table:
    """Execute a sink stage and return the combined manifest table.
    This consumes the stream (writes happen inside tasks); only the
    tiny manifest is collected on the driver."""
    manifest_ds = ds.map_batches(sink, batch_format="pyarrow", batch_size=None)
    tables = [
        t
        for t in manifest_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t]) for t in tables]
    if not tables:
        return pa.table(
            {"output_path": [], "row_count": [], "partition_key": [],
             "min_lon": [], "max_lon": [], "min_lat": [], "max_lat": [],
             "min_z": [], "max_z": []}
        )
    return pa.concat_tables(tables, promote_options="default")


def write_dataset_parquet(ds, out_dir: str) -> "pa.Table":
    """Streaming parquet sink for Dataset results whose row count (e.g.
    one row per user) exceeds driver memory: ``Dataset.write_parquet``
    streams blocks to one file each -- nothing is collected -- then a
    driver-side footer scan builds the small manifest table (path,
    row_count, bytes) for lineage/resume bookkeeping (ROADMAP r3 item
    2: the scale path behind the collected per-key queries)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    Path(out_dir).mkdir(parents=True, exist_ok=True)
    ds.write_parquet(out_dir)
    paths, rows, sizes = [], [], []
    for f in sorted(Path(out_dir).glob("*.parquet")):
        paths.append(str(f))
        rows.append(pq.read_metadata(f).num_rows)
        sizes.append(f.stat().st_size)
    return pa.table(
        {
            "path": pa.array(paths),
            "row_count": pa.array(rows, pa.int64()),
            "bytes": pa.array(sizes, pa.int64()),
        }
    )


def write_regrid_geotiff(
    points: pa.Table,
    out_path: str,
    transform: list[float],
    height: int,
    width: int,
    nodata: float,
    crs: str = "EPSG:4326",
    compression: str = "deflate",
) -> None:
    """Grid writer (K7) with a real GeoTIFF container: scatter the
    point table back to the raster via the inverse affine
    (:func:`regrid_points`) and write it with the from-scratch codec
    (sources/geotiff.py) -- full-circle reference parity: the engine
    can now read AND write the reference's native format."""
    from .sources.geotiff import write_geotiff

    payload = regrid_points(
        points, transform, height, width, nodata
    )
    grid = np.asarray(payload["elevation_grid"], dtype=np.float32)
    tmp = f"{out_path}.{uuid.uuid4().hex[:8]}.tmp"
    write_geotiff(
        tmp, grid, transform=transform, crs=crs, nodata=nodata,
        compression=compression,
    )
    os.replace(tmp, out_path)
