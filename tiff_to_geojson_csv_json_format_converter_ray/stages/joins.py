"""Spatial joins: bbox semi-join (J1/J2), point-in-polygon join (J3),
kNN lookup (J4) -- the engine's wide/stateful stages.

Broadcast pattern: the polygon / point side table is small relative to
the stream, so it is ``ray.put`` once and each actor deserializes it
ONCE in ``__init__`` (never per batch).  Pass these classes to
``map_batches(Cls, fn_constructor_kwargs=..., concurrency=N)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.geometry import Polygon, STRtree, bbox_intersects
from ..functions.knn import KNNIndex


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in km, operation order pinned so the SQL
    oracle (identical RADIANS/SIN/COS/ASIN composition) is
    bit-reproducible: 12742 * asin(sqrt(sin^2(dlat/2) +
    cos(lat1) cos(lat2) sin^2(dlon/2)))."""
    rlat1 = np.radians(lat1)
    rlat2 = np.radians(lat2)
    s1 = np.sin((rlat2 - rlat1) / 2.0)
    s2 = np.sin((np.radians(lon2) - np.radians(lon1)) / 2.0)
    h = s1 * s1 + np.cos(rlat1) * np.cos(rlat2) * (s2 * s2)
    return 12742.0 * np.arcsin(np.sqrt(h))


def polygons_from_table(tbl: pa.Table) -> list[Polygon]:
    out = []
    for i in range(tbl.num_rows):
        rings = [np.asarray(r, dtype=np.float64) for r in tbl["rings"][i].as_py()]
        out.append(
            Polygon(
                tbl["polygon_id"][i].as_py(),
                rings,
                bbox=(
                    tbl["minx"][i].as_py(),
                    tbl["miny"][i].as_py(),
                    tbl["maxx"][i].as_py(),
                    tbl["maxy"][i].as_py(),
                ),
            )
        )
    return out


def _resolve(ref_or_obj):
    """Accept a ray ObjectRef (broadcast) or a plain object (tests)."""
    try:
        import ray

        if isinstance(ref_or_obj, ray.ObjectRef):
            return ray.get(ref_or_obj)
    except ImportError:  # pragma: no cover
        pass
    return ref_or_obj


class BboxSemiJoin:
    """Tile/file pruning join (test2.py:93-110): keep stream rows whose
    bbox intersects ANY polygon bbox.  Row bbox comes either from
    explicit columns or from the tile transform + dims."""

    def __init__(self, polygons, from_transform: bool = False):
        tbl = _resolve(polygons)
        self.boxes = np.stack(
            [
                tbl["minx"].to_numpy(zero_copy_only=False),
                tbl["miny"].to_numpy(zero_copy_only=False),
                tbl["maxx"].to_numpy(zero_copy_only=False),
                tbl["maxy"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        self.from_transform = from_transform

    def _row_boxes(self, batch: pa.Table) -> np.ndarray:
        if not self.from_transform:
            return np.stack(
                [
                    batch["minx"].to_numpy(zero_copy_only=False),
                    batch["miny"].to_numpy(zero_copy_only=False),
                    batch["maxx"].to_numpy(zero_copy_only=False),
                    batch["maxy"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            )
        from ..functions.affine import pixel_to_world

        n = batch.num_rows
        boxes = np.empty((n, 4))
        tr = batch["transform"].to_pylist()
        ro = batch["row_off"].to_numpy(zero_copy_only=False)
        co = batch["col_off"].to_numpy(zero_copy_only=False)
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        for i in range(n):
            rows = np.array([float(ro[i]), float(ro[i]) + float(hs[i])])
            cols = np.array([float(co[i]), float(co[i]) + float(ws[i])])
            xs, ys = pixel_to_world(
                tr[i], np.repeat(rows, 2), np.tile(cols, 2), offset=0.0
            )
            boxes[i] = (xs.min(), ys.min(), xs.max(), ys.max())
        return boxes

    def __call__(self, batch: pa.Table) -> pa.Table:
        row_boxes = self._row_boxes(batch)
        keep = np.zeros(batch.num_rows, dtype=bool)
        for pb in self.boxes:
            keep |= bbox_intersects(row_boxes, pb[0], pb[1], pb[2], pb[3])
            if keep.all():
                break
        return batch.filter(pa.array(keep))


class PIPJoiner:
    """Point-in-polygon inner join (the clip, J3): emits one output row
    per (point, containing polygon) pair -- a point inside two
    overlapping polygons matches both (rasterio.mask per-polygon
    semantics, test2.py:1272).

    Actor state: Polygon list + STRtree over their bboxes, built once
    per actor from the broadcast polygon table.

    mode='join' appends polygon_id; mode='filter' keeps points in any
    polygon (clip); mode='anti' keeps points in none.
    """

    def __init__(self, polygons, lon_col: str = "lon", lat_col: str = "lat",
                 mode: str = "join"):
        tbl = _resolve(polygons)
        self.polys = polygons_from_table(tbl)
        self.tree = STRtree(np.array([p.bbox for p in self.polys]))
        self.lon_col = lon_col
        self.lat_col = lat_col
        if mode not in ("join", "filter", "anti"):
            raise ValueError(f"unknown PIP mode: {mode}")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        n = len(lon)
        if n == 0:
            hits = []
        else:
            # candidate polygons for this batch: bbox of the batch
            cand = self.tree.query(
                float(np.nanmin(lon)) if n else 0.0,
                float(np.nanmin(lat)) if n else 0.0,
                float(np.nanmax(lon)) if n else 0.0,
                float(np.nanmax(lat)) if n else 0.0,
            )
            hits = [(pi, self.polys[pi].contains(lon, lat)) for pi in cand]

        if self.mode == "join":
            parts = []
            for pi, mask in hits:
                if mask.any():
                    sub = batch.filter(pa.array(mask))
                    parts.append(
                        sub.append_column(
                            "polygon_id",
                            pa.array([self.polys[pi].polygon_id] * sub.num_rows),
                        )
                    )
            if not parts:
                return batch.slice(0, 0).append_column(
                    "polygon_id", pa.array([], type=pa.string())
                )
            return pa.concat_tables(parts)

        any_mask = np.zeros(n, dtype=bool)
        for _, mask in hits:
            any_mask |= mask
        if self.mode == "anti":
            any_mask = ~any_mask
        return batch.filter(pa.array(any_mask))


class KNNLookup:
    """kNN lookup stage (J4): each actor builds a KNNIndex over the
    broadcast reference-point table once, then answers batched queries
    -- the distributed form of the reference's getElevation linear
    scan (SURVEY par.2.6 J4)."""

    def __init__(self, ref_points, k: int = 1,
                 lon_col: str = "lon", lat_col: str = "lat",
                 ref_lon: str = "lon", ref_lat: str = "lat",
                 payload_cols: tuple[str, ...] = ("z",),
                 backend: str = "grid"):
        from ..functions.knn import BallTree

        tbl = _resolve(ref_points)
        lon = tbl[ref_lon].to_numpy(zero_copy_only=False)
        lat = tbl[ref_lat].to_numpy(zero_copy_only=False)
        if backend == "grid":
            self.index = KNNIndex(lon, lat)
        elif backend == "balltree":
            self.index = BallTree(lon, lat)
        else:
            raise ValueError(f"unknown kNN backend: {backend}")
        self.payloads = {
            c: tbl[c].to_numpy(zero_copy_only=False) for c in payload_cols
        }
        self.k = k
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        idx, dist = self.index.query(lon, lat, k=self.k)
        # idx == -1 means "no neighbor found" (cannot occur for a
        # non-empty index after the ring-bound fix, but a negative
        # index would silently gather the LAST payload row -- emit
        # null instead of a wrong join value).
        missing = idx < 0
        safe_idx = np.where(missing, 0, idx)
        if self.k == 1:
            for c, arr in self.payloads.items():
                batch = batch.append_column(
                    f"nn_{c}",
                    pa.array(arr[safe_idx[:, 0]], mask=missing[:, 0]),
                )
            batch = batch.append_column(
                "nn_dist", pa.array(dist[:, 0], mask=missing[:, 0])
            )
            return batch
        # k > 1: emit list columns (None for missing slots)
        for c, arr in self.payloads.items():
            vals = arr[safe_idx].tolist()
            if missing.any():
                vals = [
                    [None if m else v for v, m in zip(row, mrow)]
                    for row, mrow in zip(vals, missing)
                ]
            batch = batch.append_column(f"nn_{c}", pa.array(vals))
        dvals = dist.tolist()
        if missing.any():
            dvals = [
                [None if m else v for v, m in zip(row, mrow)]
                for row, mrow in zip(dvals, missing)
            ]
        batch = batch.append_column("nn_dist", pa.array(dvals))
        return batch


class RadiusJoin:
    """Distance-band join (range form of J4): emit one output row per
    (probe, reference point within ``radius``) pair -- the windowed
    analogue of the reference's getElevation nearest lookup, for
    "all stations within R" style queries.

    Each actor builds the bucket-grid index over the broadcast
    reference table once (``__init__``); per batch it scans only the
    radius window of buckets per probe.  Output = probe columns
    repeated per match + ``payload_cols`` + ``dist``; probes with no
    match emit nothing (inner-join semantics)."""

    def __init__(self, ref_points, radius: float,
                 lon_col: str = "lon", lat_col: str = "lat",
                 ref_lon: str = "lon", ref_lat: str = "lat",
                 payload_cols: tuple[str, ...] = ("z",),
                 metric: str = "euclidean"):
        tbl = _resolve(ref_points)
        lon = tbl[ref_lon].to_numpy(zero_copy_only=False)
        lat = tbl[ref_lat].to_numpy(zero_copy_only=False)
        self.index = KNNIndex(lon, lat)
        self.ref_lon_v = lon
        self.ref_lat_v = lat
        self.payloads = {
            c: tbl[c].to_numpy(zero_copy_only=False) for c in payload_cols
        }
        if metric not in ("euclidean", "haversine"):
            raise ValueError(f"unknown metric: {metric}")
        self.metric = metric
        self.radius = float(radius)  # degrees (euclidean) / km (haversine)
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        if self.metric == "euclidean":
            qi, ri, d = self.index.query_radius(lon, lat, self.radius)
        else:
            # candidate pass in degree space (conservative radius: a
            # km is at most 1/110.574 deg of lat and widens with
            # latitude in lon), exact great-circle filter after
            max_lat = min(89.0, float(np.abs(lat).max(initial=0.0)) + 1.0)
            deg_r = self.radius / (110.574 * np.cos(np.radians(max_lat)))
            qi, ri, _ = self.index.query_radius(lon, lat, deg_r)
            d = haversine_km(
                lon[qi], lat[qi], self.ref_lon_v[ri], self.ref_lat_v[ri]
            )
            keep = d <= self.radius
            qi, ri, d = qi[keep], ri[keep], d[keep]
        out = batch.take(pa.array(qi))
        for c, arr in self.payloads.items():
            out = out.append_column(f"nn_{c}", pa.array(arr[ri]))
        return out.append_column("dist", pa.array(d))


def polygon_cell_covering(polygons: pa.Table, res: int) -> pa.Table:
    """One row per (cell, polygon): every res-``res`` cell whose grid
    rectangle intersects the polygon's bbox.  Uses the SAME clipped
    floor formula as ``cells.cell_of``, so a point inside the polygon
    is GUARANTEED to land in one of the covering cells."""
    import json

    from ..functions import cells as C

    s = C.cell_size(res)
    nx_max = 2 ** (res + 8) - 1
    ny_max = 2 ** (res + 7) - 1
    out_cells, out_rows = [], []
    for i in range(polygons.num_rows):
        minx = polygons["minx"][i].as_py()
        miny = polygons["miny"][i].as_py()
        maxx = polygons["maxx"][i].as_py()
        maxy = polygons["maxy"][i].as_py()
        ix_lo = int(np.clip(np.floor((minx + 180.0) / s), 0, nx_max))
        ix_hi = int(np.clip(np.floor((maxx + 180.0) / s), 0, nx_max))
        iy_lo = int(np.clip(np.floor((miny + 90.0) / s), 0, ny_max))
        iy_hi = int(np.clip(np.floor((maxy + 90.0) / s), 0, ny_max))
        iy, ix = np.meshgrid(
            np.arange(iy_lo, iy_hi + 1), np.arange(ix_lo, ix_hi + 1),
            indexing="ij",
        )
        cells = C.pack(res, iy.ravel(), ix.ravel())
        out_cells.append(cells)
        out_rows.append(
            {
                "polygon_id": polygons["polygon_id"][i].as_py(),
                "rings_json": json.dumps(
                    [list(map(list, r)) for r in polygons["rings"][i].as_py()]
                ),
                "n_cells": len(cells),
            }
        )
    reps = np.concatenate(out_cells) if out_cells else np.array([], np.int64)
    ids = np.repeat(
        np.arange(len(out_rows), dtype=np.int64),
        [r["n_cells"] for r in out_rows],
    )
    return pa.table(
        {
            "_cell": pa.array(reps),
            "polygon_id": pa.array([out_rows[j]["polygon_id"] for j in ids]),
            "rings_json": pa.array([out_rows[j]["rings_json"] for j in ids]),
        }
    )


def sharded_pip_join(
    points_ds,
    polygons: pa.Table,
    res: int = 7,
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """Scale-tier point-in-polygon join: NO broadcast of the polygon
    side.  Points are keyed by their res-``res`` cell; polygons are
    replicated to the cells covering their bbox; one
    ``groupby(_cell).map_groups`` co-locates each cell's points with
    exactly the polygons that can contain them, and an in-group PIP
    emits (point row + polygon_id) pairs.

    Identical output to the broadcast ``PIPJoiner(mode='join')``
    (each point lives in exactly ONE cell, so no duplicate pairs) --
    use this tier when the polygon table is too large for `ray.put`
    (e.g. millions of admin polygons); the broadcast tier wins when
    polygons fit in object-store memory.  Hot cells (urban skew)
    bound the group size; pre-salt with a finer ``res`` if one cell's
    points exceed worker memory.
    """
    import json

    import ray.data

    from ..functions import cells as C
    from ..functions.geometry import Polygon

    point_schema: pa.Schema = points_ds.schema().base_schema
    point_cols = list(point_schema.names)
    poly_cells = polygon_cell_covering(polygons, res)

    def tag_points(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        batch = batch.append_column("_cell", pa.array(C.cell_of(lon, lat, res)))
        batch = batch.append_column(
            "polygon_id", pa.array([None] * batch.num_rows, pa.string())
        )
        return batch.append_column(
            "rings_json", pa.array([None] * batch.num_rows, pa.string())
        )

    def tag_polys(batch: pa.Table) -> pa.Table:
        for c in point_cols:
            batch = batch.append_column(
                c, pa.nulls(batch.num_rows, point_schema.field(c).type)
            )
        return batch.select(
            ["_cell", "polygon_id", "rings_json"] + point_cols
        )

    pts_tagged = points_ds.map_batches(
        tag_points, batch_format="pyarrow", batch_size=None
    ).map_batches(
        lambda b: b.select(["_cell", "polygon_id", "rings_json"] + point_cols),
        batch_format="pyarrow", batch_size=None,
    )
    polys_tagged = ray.data.from_arrow(poly_cells).map_batches(
        tag_polys, batch_format="pyarrow", batch_size=None
    )
    unioned = pts_tagged.union(polys_tagged)

    empty_schema = pa.schema(
        list(point_schema) + [pa.field("polygon_id", pa.string())]
    )

    def group_pip(group: pa.Table) -> pa.Table:
        is_poly = pa.compute.is_valid(group["rings_json"])
        polys = group.filter(is_poly)
        pts = group.filter(pa.compute.invert(is_poly))
        if polys.num_rows == 0 or pts.num_rows == 0:
            return empty_schema.empty_table()
        lon = pts[lon_col].to_numpy(zero_copy_only=False)
        lat = pts[lat_col].to_numpy(zero_copy_only=False)
        parts = []
        for j in range(polys.num_rows):
            rings = [
                np.asarray(r, np.float64)
                for r in json.loads(polys["rings_json"][j].as_py())
            ]
            mask = Polygon(
                polys["polygon_id"][j].as_py(), rings
            ).contains(lon, lat)
            if mask.any():
                sub = pts.filter(pa.array(mask)).select(point_cols)
                parts.append(
                    sub.append_column(
                        "polygon_id",
                        pa.array(
                            [polys["polygon_id"][j].as_py()] * sub.num_rows
                        ),
                    )
                )
        if not parts:
            return empty_schema.empty_table()
        return pa.concat_tables(parts).cast(empty_schema)

    from .shuffle import grouped_by_key

    return grouped_by_key(unioned, "_cell", group_pip)


class AsofLookup:
    """As-of (most-recent-at-or-before) join against a small sorted
    side: for each stream row's ``ts`` attach the greatest side key
    <= ts (binary search per batch, vectorized).  The side is the
    broadcast dimension -- the Ray-Data-native form of an as-of join
    when one side is small; for two big sides, range-partition both on
    time and apply this kernel per partition."""

    def __init__(self, side_keys, ts_col: str = "ts", out_col: str = "asof_key"):
        keys = _resolve(side_keys)
        if isinstance(keys, pa.Table):
            keys = keys.column(0).to_numpy(zero_copy_only=False)
        self.side = np.sort(np.unique(np.asarray(keys, np.int64)))
        self.ts_col = ts_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch[self.ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.side, ts, side="right") - 1
        vals = np.where(idx >= 0, self.side[np.maximum(idx, 0)], 0)
        arr = pa.array(
            [int(v) if i >= 0 else None for v, i in zip(vals, idx)],
            pa.int64(),
        )
        return batch.append_column(self.out_col, arr)


class IntervalJoin:
    """Range (interval-overlap) join against a small broadcast side:
    each stream row with instant ``ts`` emits one output row per side
    interval with ``start <= ts < end`` (inner join, multi-match).

    Vectorized candidate generation: intervals are sorted by start and
    the maximum interval length is recorded, so the candidates for a
    query instant ``t`` are exactly the sorted-start window
    ``(searchsorted(starts, t - max_len), searchsorted(starts, t)]``;
    the window is expanded with repeat/arange (no Python loop) and
    filtered by ``end > t``.  For two BIG sides, range-partition both
    on time (intervals replicated into every partition they overlap,
    as sharded_pip_join replicates polygons into cells) and apply this
    kernel per partition -- the max-length bound keeps the replication
    factor at ``1 + max_len / partition_span``.
    """

    def __init__(
        self,
        intervals,
        ts_col: str = "ts",
        id_col: str = "interval_id",
        start_col: str = "start_ts",
        end_col: str = "end_ts",
    ):
        tbl = _resolve(intervals)
        starts = tbl[start_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(starts, kind="stable")
        self.starts = starts[order]
        self.ends = (
            tbl[end_col].cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
        )
        self.ids = tbl[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)[order]
        self.max_len = (
            int((self.ends - self.starts).max()) if len(self.starts) else 0
        )
        self.ts_col = ts_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch[self.ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(self.starts, ts - self.max_len, side="left")
        hi = np.searchsorted(self.starts, ts, side="right")
        counts = hi - lo
        row_idx = np.repeat(np.arange(len(ts)), counts)
        # candidate interval index: lo[row] + offset within the window
        offs = np.arange(int(counts.sum())) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        cand = np.repeat(lo, counts) + offs
        keep = (self.ends[cand] > ts[row_idx]) & (self.starts[cand] <= ts[row_idx])
        row_idx, cand = row_idx[keep], cand[keep]
        out = batch.take(pa.array(row_idx, pa.int64()))
        return out.append_column(
            self.id_col, pa.array(self.ids[cand], pa.int64())
        )


def partitioned_interval_join(
    stream,
    intervals,
    span_us: int,
    ts_col: str = "ts",
    id_col: str = "interval_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
):
    """Big-big range join: the scale tier of :class:`IntervalJoin` for
    when the interval side is too large to broadcast.  Both sides are
    tagged with time partitions of width ``span_us``; each interval is
    replicated into EVERY partition it overlaps (replication factor
    ``1 + max_interval_len / span``, the bound stated on the broadcast
    kernel), the union shuffles once on the partition key, and the
    vectorized candidate kernel runs per group -- the same
    cell-replication shape as :func:`sharded_pip_join` uses for
    polygons.  Returns a Dataset of the stream columns + ``id_col``.
    """
    import ray.data

    span = np.int64(span_us)
    sch = stream.schema()  # ray.data.Schema wrapper: .names + pyarrow .types
    stream_cols = list(sch.names)
    stream_types = dict(zip(sch.names, sch.types))

    def tag_stream(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = batch.append_column("_part", pa.array(ts // span, pa.int64()))
        t = t.append_column("_iid", pa.nulls(len(ts), pa.int64()))
        t = t.append_column("_istart", pa.nulls(len(ts), pa.int64()))
        return t.append_column("_iend", pa.nulls(len(ts), pa.int64()))

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = batch[start_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = batch[end_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        iid = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        p0 = s // span
        p1 = np.maximum(e - 1, s) // span  # end exclusive
        counts = (p1 - p0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(s)), counts)
        offs = np.arange(int(counts.sum())) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        part = p0[rep] + offs
        cols = {c: pa.nulls(len(rep), stream_types[c]) for c in stream_cols}
        cols["_part"] = pa.array(part, pa.int64())
        cols["_iid"] = pa.array(iid[rep], pa.int64())
        cols["_istart"] = pa.array(s[rep], pa.int64())
        cols["_iend"] = pa.array(e[rep], pa.int64())
        return pa.table(cols)

    tagged = stream.map_batches(
        tag_stream, batch_format="pyarrow", batch_size=None
    ).union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow", batch_size=None)
    )

    def join_group(group: pa.Table) -> pa.Table:
        side_iv = group.filter(pc.is_valid(group["_iid"]))
        side_st = group.filter(pc.is_null(group["_iid"]))
        if side_iv.num_rows == 0 or side_st.num_rows == 0:
            return pa.table(
                {c: pa.array([], stream_types[c]) for c in stream_cols}
                | {id_col: pa.array([], pa.int64())}
            )
        kern = IntervalJoin(
            pa.table(
                {
                    id_col: side_iv["_iid"],
                    start_col: side_iv["_istart"],
                    end_col: side_iv["_iend"],
                }
            ),
            ts_col=ts_col,
            id_col=id_col,
        )
        return kern(side_st.select(stream_cols))

    return tagged.groupby("_part").map_groups(join_group, batch_format="pyarrow")


def asof_bucket_kernel(
    group: pa.Table,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    out_prefix: str = "asof_",
) -> pa.Table:
    """Vectorized as-of merge over ONE hash bucket of keys: rows carry
    ``_side`` (0 = right/build, 1 = left/probe) and int64 ``ts_col``.
    Sort by (key, ts, side) puts each right row before any left row
    with the same timestamp (at-or-before includes equality), then a
    single segmented cummax of right-row indices gives every left row
    its most recent matching right row -- no per-key Python loop.
    Ties among right rows at the same (key, ts) resolve to the largest
    original index deterministically."""
    n = group.num_rows
    out_schema = pa.schema(
        [group.schema.field(c) for c in [key_col] + left_cols]
        + [
            pa.field(out_prefix + c, group.schema.field(c).type)
            for c in [ts_col] + right_cols
        ]
    )
    if n == 0:
        return out_schema.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                   ("_side", "ascending")],
    )
    g = group.take(order)
    keys = g[key_col].to_numpy(zero_copy_only=False)
    side = g["_side"].to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    head = np.r_[True, keys[1:] != keys[:-1]]
    seg_id = np.cumsum(head) - 1
    # segmented forward-max of right-row indices: offset every segment
    # into its own disjoint value range so the plain cummax cannot
    # carry a match across a key boundary
    base = seg_id * np.int64(n + 1)
    v = base + np.where(side == 0, idx + 1, np.int64(0))
    match = np.maximum.accumulate(v) - base - 1  # -1 = no right row yet
    is_left = side == 1
    lmatch = match[is_left]
    has = lmatch >= 0
    take_right = pa.array(
        np.where(has, lmatch, 0), pa.int64(), mask=~has
    )
    left_rows = g.filter(pa.array(is_left))
    cols = {key_col: left_rows[key_col]}
    for c in left_cols:
        cols[c] = left_rows[c]
    for c in [ts_col] + right_cols:
        cols[out_prefix + c] = g[c].take(take_right)
    return pa.table(cols, schema=out_schema)


def partitioned_asof_join(
    left,
    right,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str] | None = None,
    out_prefix: str = "asof_",
    num_buckets: int = 64,
    direction: str = "backward",
):
    """Big-big as-of join: for every left row, the right row with the
    same ``key_col`` and the greatest ``ts_col`` at-or-before the left
    row's (SQL ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``).
    ``direction="forward"`` flips the inequality (earliest right row
    at-or-after, ``l.ts <= r.ts``) by negating the sort timestamp
    internally -- the kernel is direction-agnostic.
    The scale tier of :class:`AsofLookup` for when neither side fits a
    task: both sides hash-bucket on the key (mix32), the union shuffles
    ONCE on the bucket, and :func:`asof_bucket_kernel` merges a whole
    bucket per group -- per-key work is a zero-copy segment, Ray's
    per-group overhead is paid per bucket (the grouped_by_key shape,
    stages/shuffle.py).  Skew bound: one bucket's rows, not one key's.

    ``ts_col`` is cast to int64 (us for timestamp[us]); output columns
    are ``key_col``, ``left_cols``, and ``out_prefix + (ts | right
    payload)`` -- null where the key has no right row at-or-before.
    """
    right_cols = list(right_cols or [])
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    flip = direction == "forward"
    from ..functions.sketch import mix32

    key_t = pa.int64()
    lsch, rsch = left.schema(), right.schema()
    payload_types = dict(zip(lsch.names, lsch.types)) | {
        c: t for c, t in zip(rsch.names, rsch.types) if c in right_cols
    }
    all_payload = list(left_cols) + [
        c for c in right_cols if c not in left_cols
    ]

    def norm(side_val: int, keep: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key_col].cast(key_t).to_numpy(zero_copy_only=False)
            ts = batch[ts_col].cast(pa.int64())
            if flip:
                ts = pc.negate(ts)
            cols: dict[str, pa.Array] = {
                key_col: pa.array(k, key_t),
                ts_col: ts,
                "_side": pa.array(
                    np.full(len(k), side_val, np.int8)
                ),
                "_bkt": pa.array(np.abs(mix32(k)) % num_buckets),
            }
            for c in all_payload:
                cols[c] = (
                    batch[c] if c in keep
                    else pa.nulls(len(k), payload_types[c])
                )
            return pa.table(cols)

        return fn

    tagged = left.map_batches(
        norm(1, list(left_cols)), batch_format="pyarrow", batch_size=None
    ).union(
        right.map_batches(
            norm(0, right_cols), batch_format="pyarrow", batch_size=None
        )
    )
    # NOTE: Ray's groupby may pass through ZERO-COLUMN empty blocks for
    # empty partitions (map_batches/map_groups UDFs are never invoked on
    # them, so they cannot be coerced in-pipeline); write_parquet and
    # collect_tables both skip such blocks, so downstream is unaffected.
    joined = tagged.groupby("_bkt").map_groups(
        lambda g: asof_bucket_kernel(
            g.drop_columns(["_bkt"]), key_col, ts_col,
            left_cols, right_cols, out_prefix,
        ),
        batch_format="pyarrow",
    )
    if not flip:
        return joined

    ts_out = out_prefix + ts_col

    def unflip(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(ts_out)
        return batch.set_column(i, ts_out, pc.negate(batch[ts_out]))

    return joined.map_batches(unflip, batch_format="pyarrow", batch_size=None)


def window_join_bucket_kernel(
    group: pa.Table,
    key_col: str,
    ts_col: str,
    window_us: int,
    left_id: str,
    right_id: str,
) -> pa.Table:
    """Vectorized per-key windowed stream-stream join over ONE hash
    bucket: every left row pairs with every right row of the same key
    whose ts lies in ``[left_ts, left_ts + window_us]`` (inclusive).
    Sort once by (key, side, ts); within each key the right rows form a
    sorted run, so each left row's matches are a ``searchsorted``
    window expanded with repeat/arange -- no per-key Python loop and no
    per-left scan."""
    out_schema = pa.schema(
        [
            pa.field(key_col, pa.int64()),
            pa.field(left_id, pa.int64()),
            pa.field(right_id, pa.int64()),
        ]
    )
    n = group.num_rows
    if n == 0:
        return out_schema.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[(key_col, "ascending"), ("_side", "ascending"),
                   (ts_col, "ascending")],
    )
    g = group.take(order)
    keys = g[key_col].to_numpy(zero_copy_only=False)
    side = g["_side"].to_numpy(zero_copy_only=False)
    ts = g[ts_col].to_numpy(zero_copy_only=False)
    ids = g["_id"].to_numpy(zero_copy_only=False)
    head = np.r_[True, keys[1:] != keys[:-1]]
    seg_id = np.cumsum(head) - 1
    idx = np.arange(n, dtype=np.int64)
    seg_start = idx[head][seg_id]
    # within a segment: right rows (side 0) first, sorted by ts; then
    # left rows (side 1) sorted by ts
    is_left = side == 1
    # first left index per segment = seg_start + count of right rows
    right_counts = np.bincount(
        seg_id[~is_left], minlength=seg_id.max() + 1
    )
    first_left = idx[head] + right_counts
    l_idx = idx[is_left]
    if not len(l_idx):
        return out_schema.empty_table()
    l_seg = seg_id[is_left]
    r_lo_seg = seg_start[is_left]              # right run start
    r_hi_seg = first_left[l_seg]               # right run end (exclusive)
    l_ts = ts[is_left]
    # searchsorted per segment on the global sorted ts: the right run
    # [r_lo, r_hi) is ts-sorted, so bound each left row's window by
    # bisecting only within its own run via offset arithmetic
    lo = np.empty(len(l_idx), dtype=np.int64)
    hi = np.empty(len(l_idx), dtype=np.int64)
    # per-segment bisect: l_seg is sorted, so segments are contiguous
    # runs -- one Python iteration per KEY (a ~us slice + two vector
    # bisects), never per row (the grouped_by_key cost model)
    run_starts = np.flatnonzero(np.r_[True, l_seg[1:] != l_seg[:-1]])
    run_ends = np.r_[run_starts[1:], len(l_seg)]
    for s0, s1 in zip(run_starts, run_ends):
        a, b = r_lo_seg[s0], r_hi_seg[s0]
        run = ts[a:b]
        lo[s0:s1] = a + np.searchsorted(run, l_ts[s0:s1], side="left")
        hi[s0:s1] = a + np.searchsorted(
            run, l_ts[s0:s1] + window_us, side="right"
        )
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return out_schema.empty_table()
    rep = np.repeat(np.arange(len(l_idx)), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    r_pos = lo[rep] + offs
    return pa.table(
        {
            key_col: pa.array(keys[is_left][rep]),
            left_id: pa.array(ids[is_left][rep]),
            right_id: pa.array(ids[r_pos]),
        },
        schema=out_schema,
    )


def keyed_window_join(
    left,
    right,
    key_col: str,
    ts_col: str,
    window_us: int,
    left_id: str = "left_id",
    right_id: str = "right_id",
    num_buckets: int = 64,
):
    """Per-key windowed stream-stream join (the CEP / attribution
    shape): emit (key, left_id, right_id) for every left/right pair
    with the same key and ``right.ts in [left.ts, left.ts +
    window_us]``.  Both sides hash-bucket on the key and shuffle ONCE;
    :func:`window_join_bucket_kernel` resolves a whole bucket
    vectorized.  The multi-match complement of
    :func:`partitioned_asof_join` (which keeps one row); unlike
    :func:`partitioned_interval_join` the partitioning key is the
    JOIN key, not time, so no interval replication is needed and skew
    is bounded by the hottest bucket.

    ``left`` / ``right`` need columns (key_col, ts_col, id); the id
    column name per side is given by ``left_id`` / ``right_id``.
    """
    from ..functions.sketch import mix32

    def norm(side_val: int, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    key_col: pa.array(k),
                    ts_col: batch[ts_col].cast(pa.int64()),
                    "_id": batch[id_col].cast(pa.int64()),
                    "_side": pa.array(np.full(len(k), side_val, np.int8)),
                    "_bkt": pa.array(np.abs(mix32(k)) % num_buckets),
                }
            )

        return fn

    tagged = left.map_batches(
        norm(1, left_id), batch_format="pyarrow", batch_size=None
    ).union(
        right.map_batches(norm(0, right_id), batch_format="pyarrow",
                          batch_size=None)
    )
    return tagged.groupby("_bkt").map_groups(
        lambda g: window_join_bucket_kernel(
            g.drop_columns(["_bkt"]), key_col, ts_col, window_us,
            left_id, right_id,
        ),
        batch_format="pyarrow",
    )


class BloomFilter:
    """Plain Bloom filter over int64 keys, built for broadcast semi-join
    pushdown: at 100 TB the fact side is filtered by a few MB of bits
    in every read task BEFORE any shuffle/join, instead of shipping the
    full key set or shuffling unmatched rows.  ``k`` hash functions are
    :func:`~..functions.sketch.mix32` with distinct seeds (vectorized);
    false-positive rate ~ (1 - e^{-kn/m})^k.  May return false
    positives, never false negatives -- compose with an exact
    verification join on the survivors."""

    def __init__(self, keys: np.ndarray, bits_per_key: int = 12, k: int = 5):
        from ..functions.sketch import mix32

        n = max(len(keys), 1)
        self.m = 1 << int(np.ceil(np.log2(n * bits_per_key)))
        self.k = k
        self.words = np.zeros(self.m // 64, dtype=np.uint64)
        keys = np.asarray(keys, np.int64)
        for s in range(k):
            h = mix32(keys, seed=0x9E37 + s * 0x85EB) & (self.m - 1)
            np.bitwise_or.at(
                self.words, h >> 6, np.uint64(1) << (h.astype(np.uint64) & np.uint64(63))
            )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        from ..functions.sketch import mix32

        keys = np.asarray(keys, np.int64)
        hit = np.ones(len(keys), dtype=bool)
        for s in range(self.k):
            h = mix32(keys, seed=0x9E37 + s * 0x85EB) & (self.m - 1)
            bit = (self.words[h >> 6] >> (h.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
            hit &= bit.astype(bool)
        return hit


class BloomSemiJoin:
    """Semi-join the stream against a small side's key set: Bloom
    prefilter (tiny bitset, broadcast) then exact ``pc.is_in`` verify
    against the sorted key array.  At sandbox scale both fit in the
    broadcast; at 100 TB the bloom goes to EVERY read task (a few MB)
    while the exact verify runs on the tiny surviving fraction -- the
    standard runtime-filter pushdown.  Tracks prefilter pass-through
    counts so tests can assert the bloom actually pruned."""

    def __init__(self, side_keys, on: str, exact: bool = True):
        keys = _resolve(side_keys)
        if isinstance(keys, pa.Table):
            keys = keys.column(0).to_numpy(zero_copy_only=False)
        keys = np.unique(np.asarray(keys, np.int64))
        self.bloom = BloomFilter(keys)
        self.keys = keys if exact else None
        self.on = on
        self.seen = 0
        self.bloom_pass = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch[self.on].cast(pa.int64()).to_numpy(zero_copy_only=False)
        mask = self.bloom.contains(vals)
        self.seen += len(vals)
        self.bloom_pass += int(mask.sum())
        if self.keys is not None and mask.any():
            idx = np.flatnonzero(mask)
            exact = np.isin(vals[idx], self.keys, assume_unique=False)
            mask = np.zeros(len(vals), dtype=bool)
            mask[idx[exact]] = True
        return batch.filter(pa.array(mask))


def broadcast_table(tbl: pa.Table):
    """``ray.put`` a small side table once; returns the ObjectRef to
    hand to the stage constructors (read per actor, never per batch)."""
    import ray

    return ray.put(tbl)
