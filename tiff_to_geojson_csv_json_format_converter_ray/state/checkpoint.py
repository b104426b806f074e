"""Per-partition lineage manifest + kill-and-resume execution.

BASELINE.json north_rule: "Every partition records lineage (input block
ids, cell ranges, row counts) to a checkpoint manifest so a killed
run resumes without recomputing completed cells."

Design (SURVEY par.4): the resumable unit is an input shard (one
parquet file).  A run is a Ray Data pipeline over shard descriptors --
``from_items(paths) -> map_batches(ShardProcessor)`` (the custom-
datasource pattern); each task:

  1. reads its shard (column-pruned),
  2. applies the stage chain (the same Arrow-callable stage objects
     the streaming pipelines use),
  3. writes the output fragment ATOMICALLY (tmp + rename) to a
     deterministic per-shard path (idempotent overwrite on recompute),
  4. then appends a manifest row file (also tmp + rename, written
     strictly AFTER the fragment -- so a manifest row implies its
     fragment is complete).

On restart, completed shard ids are read from the manifest directory
and filtered out of the shard enumeration BEFORE the Dataset is built:
completed partitions are never recomputed.  The reference has no
analogue (its accidental resume point is re-reading JSON sidecars,
completePixleOutput.py:309-321); this makes it a contract.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SUFFIX = ".manifest.json"
MARKER_SUFFIX = ".ok"


class ManifestStore:
    """Directory of one JSON manifest row per completed partition.

    ``commit_mode`` picks the durability protocol:

    - ``"rename"`` (default, POSIX): write tmp then rename -- a reader
      never sees a torn file.
    - ``"marker"`` (object stores: S3-style PUT is atomic per object
      but RENAME does not exist): write the row object directly, then
      PUT a zero-byte ``.ok`` marker strictly AFTER -- ``completed()``
      only trusts rows whose marker exists, so a crash between the two
      PUTs reads as incomplete, never as torn/half-committed.
    """

    def __init__(self, manifest_dir: str, commit_mode: str = "rename"):
        if commit_mode not in ("rename", "marker"):
            raise ValueError(f"unknown commit mode: {commit_mode}")
        self.dir = Path(manifest_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.commit_mode = commit_mode

    def completed(self) -> dict[str, dict]:
        out = {}
        for p in sorted(self.dir.glob(f"*{MANIFEST_SUFFIX}")):
            if self.commit_mode == "marker" and not p.with_name(
                p.name + MARKER_SUFFIX
            ).exists():
                continue  # data object without its commit marker
            try:
                row = json.loads(p.read_text())
                out[row["partition_id"]] = row
            except (json.JSONDecodeError, KeyError):
                # torn write (no atomic rename) -> treat as incomplete
                continue
        return out

    def record(self, row: dict) -> None:
        safe = row["partition_id"].replace("/", "_").replace(".", "_")
        final = self.dir / f"{safe}{MANIFEST_SUFFIX}"
        if self.commit_mode == "marker":
            final.write_text(json.dumps(row))
            final.with_name(final.name + MARKER_SUFFIX).write_text("")
            return
        tmp = self.dir / f".{safe}.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(row))
        tmp.rename(final)

    def rows(self) -> pa.Table:
        rows = list(self.completed().values())
        return pa.Table.from_pylist(rows) if rows else pa.table({})


def _atomic_write_parquet(
    table: pa.Table, path: Path, commit_mode: str = "rename"
) -> None:
    if commit_mode == "marker":
        # object-store protocol: whole-object PUT (atomic per object),
        # marker strictly after; consumers gate on the marker
        pq.write_table(table, path)
        path.with_name(path.name + MARKER_SUFFIX).write_text("")
        return
    tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(table, tmp)
    tmp.rename(path)


class ShardProcessor:
    """map_batches task body: each input row is a shard descriptor
    {shard_id, path}; the stage chain runs inside the task."""

    def __init__(self, stages: list, out_dir: str, manifest_dir: str,
                 columns: list[str] | None = None, cell_col: str = "cell_8",
                 fail_on: set[str] | None = None,
                 commit_mode: str = "rename",
                 reader=None):
        self.stages = stages
        self.out_dir = Path(out_dir)
        self.store = ManifestStore(manifest_dir, commit_mode=commit_mode)
        self.columns = columns
        self.cell_col = cell_col
        self.fail_on = fail_on or set()  # test hook: simulate a crash
        self.commit_mode = commit_mode
        # shard reader: path -> pa.Table.  Default parquet; a GeoTIFF
        # job passes a .tif-bytes -> TILE_SCHEMA reader instead.
        self.reader = reader

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.out_dir.mkdir(parents=True, exist_ok=True)
        out_rows = []
        for i in range(batch.num_rows):
            shard_id = batch["shard_id"][i].as_py()
            path = batch["path"][i].as_py()
            if shard_id in self.fail_on:
                raise RuntimeError(f"injected failure on shard {shard_id}")
            if self.reader is not None:
                table = self.reader(path)
            else:
                table = pq.read_table(path, columns=self.columns)
            rows_in = table.num_rows
            for stage in self.stages:
                table = stage(table)
                if not isinstance(table, pa.Table):
                    table = pa.concat_tables(list(table))
            out_path = self.out_dir / f"{shard_id}.parquet"
            _atomic_write_parquet(table, out_path, self.commit_mode)
            cell_min = cell_max = None
            if self.cell_col in table.column_names and table.num_rows:
                c = table[self.cell_col].to_numpy(zero_copy_only=False)
                c = c[c >= 0]
                if len(c):
                    cell_min, cell_max = int(c.min()), int(c.max())
            row = {
                "partition_id": shard_id,
                "input_blocks": [path],
                "cell_min": cell_min,
                "cell_max": cell_max,
                "rows_in": rows_in,
                "row_count": int(table.num_rows),
                "output_path": str(out_path),
            }
            self.store.record(row)  # strictly after the fragment rename
            out_rows.append(row)
        return pa.Table.from_pylist(out_rows) if out_rows else pa.table(
            {"partition_id": pa.array([], pa.string())}
        )


def enumerate_shards(input_path: str, pattern: str = "*.parquet") -> list[dict]:
    """Shard descriptors for a file or directory of files (``pattern``
    selects the extension -- parquet by default, ``*.tif`` for raster
    jobs).

    shard_id derives from the file path ALONE (stem + short hash of the
    name), never from enumeration order: if files are added to or
    removed from the input directory between a kill and a resume, ids
    of the unchanged files must not shift, or completed-shard filtering
    would recompute them into second output fragments (ADVICE r1)."""
    import hashlib

    p = Path(input_path)
    files = sorted(p.glob(pattern)) if p.is_dir() else [p]
    return [
        {
            "shard_id": (
                f"{f.stem}_{hashlib.sha1(f.name.encode()).hexdigest()[:8]}"
            ),
            "path": str(f),
        }
        for f in files
    ]


def run_resumable(
    input_path: str,
    out_dir: str,
    manifest_dir: str,
    stages: list,
    columns: list[str] | None = None,
    fail_on: set[str] | None = None,
    concurrency: int | None = None,
    commit_mode: str = "rename",
    reader=None,
    pattern: str = "*.parquet",
) -> dict:
    """Execute (or resume) a checkpointed run.  Returns
    {completed_before, processed_now, manifest} -- completed shards
    are filtered out BEFORE the Dataset is built.  ``commit_mode=
    "marker"`` is the rename-free object-store protocol (see
    ManifestStore)."""
    import ray.data

    store = ManifestStore(manifest_dir, commit_mode=commit_mode)
    done = store.completed()
    shards = enumerate_shards(input_path, pattern=pattern)
    remaining = [s for s in shards if s["shard_id"] not in done]
    result = {
        "completed_before": sorted(done),
        "processed_now": [],
        "total_shards": len(shards),
    }
    if remaining:
        ds = ray.data.from_items(remaining)
        proc = ShardProcessor(
            stages, out_dir, manifest_dir, columns=columns, fail_on=fail_on,
            commit_mode=commit_mode, reader=reader,
        )
        kwargs: dict = {"batch_format": "pyarrow", "batch_size": 1}
        out = ds.map_batches(proc, **kwargs)
        processed = []
        for t in out.iter_batches(batch_format="pyarrow", batch_size=None):
            tt = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            if "partition_id" in tt.column_names:
                processed.extend(tt["partition_id"].to_pylist())
        result["processed_now"] = sorted(processed)
    result["manifest"] = store.completed()
    return result
