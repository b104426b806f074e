"""Size-aware Parquet reader.

``ray.data.read_parquet`` picks its block count from estimated cluster
parallelism (roughly 2 tasks per CPU), which over-splits small inputs:
a 37 MB corpus becomes 64 tiny read tasks whose per-task overhead
dwarfs the decode work.  At the other end, a 100 TB corpus needs block
count driven by BYTES (so each block lands near
``DataContext.target_max_block_size``), not by CPU count.

:func:`read_parquet_auto` sizes ``override_num_blocks`` from the
on-disk footprint:

    size_blocks = ceil(disk_bytes * expansion / target_max_block_size)
    blocks      = max(size_blocks, min(cpus, 4 * size_blocks))

- Large inputs: ``size_blocks`` dominates -> blocks of ~target size,
  thousands of tasks on a real cluster, streaming as usual.
- Small inputs: task count is bounded at 4 small blocks per
  size-block (parallelism without drowning in per-task overhead),
  never more than the CPU count.

``expansion`` is the decoded-Arrow / on-disk ratio (snappy + dict
encoding on text compresses ~4x; pass a measured value for other
schemas).  Column pruning happens before decode, so pass ``columns``
exactly as with ``ray.data.read_parquet``.
"""

from __future__ import annotations

import math
from pathlib import Path

import ray
import ray.data


def _disk_bytes(path) -> int:
    """Total on-disk parquet bytes under ``path`` (file, dir, or list).
    Driver-side stat calls only -- no data is read.  Returns 0 for
    non-local paths (object stores); callers fall back to Ray's own
    estimate there."""
    total = 0
    paths = path if isinstance(path, (list, tuple)) else [path]
    for p in paths:
        try:
            pp = Path(p)
            if pp.is_file():
                total += pp.stat().st_size
            elif pp.is_dir():
                total += sum(
                    f.stat().st_size for f in pp.rglob("*.parquet")
                )
        except OSError:
            return 0
    return total


def auto_num_blocks(disk_bytes: int, expansion: float = 4.0) -> int | None:
    """Block count for a given on-disk size; None = let Ray decide.

    Measured note (round 2): pushing mid-sized inputs to one block per
    core (e.g. 28-32 blocks for a 110 MB corpus at 32 cpus) ran the
    pages pipeline 4-8x SLOWER on this host than the 4-blocks-per-
    size-block cap below (16 blocks) -- task-start overhead and
    worker oversubscription dominate before per-core fan-out pays off.
    At 100 TB ``size_blocks`` dominates and the cap is irrelevant."""
    if disk_bytes <= 0:
        return None
    ctx = ray.data.DataContext.get_current()
    target = getattr(ctx, "target_max_block_size", None) or (128 << 20)
    size_blocks = max(1, math.ceil(disk_bytes * expansion / target))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    return max(size_blocks, min(cpus, 4 * size_blocks))


def _stripped_schema(path, columns):
    """Footer schema with key-value metadata removed (projected to
    ``columns`` when given).

    pandas-written parquet carries a ``pandas`` metadata blob that makes
    ``hash(pa.Schema)`` raise ``unhashable type: 'dict'`` on pyarrow 16;
    Ray Data hashes block schemas to dedup them in ``unify_schemas``,
    so every such block logs a warning and skips the fast path.  Reading
    with an explicit metadata-free schema keeps block schemas hashable
    (and identical across files).  Returns None when the footer can't be
    read locally (object stores) -- Ray's own inference applies then."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = path[0] if isinstance(path, (list, tuple)) else path
    try:
        pp = Path(p)
        if pp.is_dir():
            pp = next(pp.rglob("*.parquet"))
        schema = pq.read_schema(pp)
    except Exception:
        return None
    if schema.metadata is None and columns is None:
        return None  # nothing to strip
    schema = schema.remove_metadata()
    if columns is not None:
        try:
            schema = pa.schema([schema.field(c) for c in columns])
        except KeyError:
            return None  # partition columns etc.: let Ray infer
    return schema


def read_parquet_auto(
    path,
    *,
    columns: list[str] | None = None,
    expansion: float = 4.0,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with a size-derived block count and a
    metadata-free read schema (see :func:`_stripped_schema`).

    Any explicit ``override_num_blocks`` / ``schema`` in ``kwargs``
    wins; non-local paths (s3:// etc.) keep Ray's default planning."""
    if "override_num_blocks" not in kwargs:
        nb = auto_num_blocks(_disk_bytes(path), expansion)
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    if "schema" not in kwargs:
        schema = _stripped_schema(path, columns)
        if schema is not None:
            kwargs["schema"] = schema
    return ray.data.read_parquet(path, columns=columns, **kwargs)
