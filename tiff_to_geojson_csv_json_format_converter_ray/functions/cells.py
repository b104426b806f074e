"""Frozen hierarchical cell index (H3-role), pure NumPy and SQL-expressible.

BASELINE.json's north rule requires deterministic tile/cell assignments
at H3-like resolutions 7-9.  With no ``h3`` library in the environment,
the engine freezes its own spec (FROZEN -- changing any constant breaks
the golden cell-assignment fixtures):

    cell_size(r)  = 360 / 2**(r + 8)        degrees   (r in [0, 15])
    ix            = floor((lon + 180) / cell_size(r)) clipped to [0, 2**(r+8) - 1]
    iy            = floor((lat +  90) / cell_size(r)) clipped to [0, 2**(r+7) - 1]
    cell_id       = (r << 56) | (iy << 28) | ix       int64

Resolution 7 gives ~0.011 deg (~1.2 km) cells -- the scale of H3 res 7;
res 9 ~300 m.  Parent/child: the res r-1 parent halves ix and iy, so a
cell's parent is ``pack(r-1, iy >> 1, ix >> 1)``.

The whole spec uses only floor/shift arithmetic so a DuckDB oracle can
reproduce assignments exactly (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15


def cell_size(res: int) -> float:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution out of range: {res}")
    return 360.0 / float(2 ** (res + 8))


def pack(res: int, iy: np.ndarray, ix: np.ndarray) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(56))
        | (iy.astype(np.int64) << np.int64(28))
        | ix.astype(np.int64)
    )


def cell_of(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized (lon, lat) degrees -> int64 cell id at ``res``."""
    s = cell_size(res)
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / s).astype(np.int64)
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / s).astype(np.int64)
    np.clip(ix, 0, 2 ** (res + 8) - 1, out=ix)
    np.clip(iy, 0, 2 ** (res + 7) - 1, out=iy)
    return pack(res, iy, ix)


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell id -> (res, iy, ix)."""
    cell = np.asarray(cell, np.int64)
    res = (cell >> np.int64(56)) & np.int64(0xFF)
    iy = (cell >> np.int64(28)) & np.int64((1 << 28) - 1)
    ix = cell & np.int64((1 << 28) - 1)
    return res, iy, ix


def parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Parent cell id (one level up by default)."""
    res, iy, ix = unpack(cell)
    target = res - 1 if parent_res is None else np.full_like(res, parent_res)
    if np.any(target < 0) or np.any(target > res):
        raise ValueError("invalid parent resolution")
    shift = (res - target).astype(np.int64)
    return pack_arr(target, iy >> shift, ix >> shift)


def pack_arr(res: np.ndarray, iy: np.ndarray, ix: np.ndarray) -> np.ndarray:
    return (
        (res.astype(np.int64) << np.int64(56))
        | (iy.astype(np.int64) << np.int64(28))
        | ix.astype(np.int64)
    )


def cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(minlon, minlat, maxlon, maxlat) of one cell."""
    res, iy, ix = unpack(np.asarray([cell]))
    s = cell_size(int(res[0]))
    minlon = float(ix[0]) * s - 180.0
    minlat = float(iy[0]) * s - 90.0
    return minlon, minlat, minlon + s, minlat + s


def cells_for_bbox(
    minlon: float, minlat: float, maxlon: float, maxlat: float, res: int
) -> np.ndarray:
    """All cell ids at ``res`` intersecting a bbox (for bbox semi-joins)."""
    s = cell_size(res)
    ix0 = max(0, int(np.floor((minlon + 180.0) / s)))
    ix1 = min(2 ** (res + 8) - 1, int(np.floor((maxlon + 180.0) / s)))
    iy0 = max(0, int(np.floor((minlat + 90.0) / s)))
    iy1 = min(2 ** (res + 7) - 1, int(np.floor((maxlat + 90.0) / s)))
    ixs, iys = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64),
        np.arange(iy0, iy1 + 1, dtype=np.int64),
    )
    return pack(res, iys.ravel(), ixs.ravel())


def zorder_of(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """S2-style space-filling variant: same frozen (ix, iy) grid, but
    the id interleaves the bits (Morton/Z-order), so numerically
    adjacent ids are spatially adjacent -- the property S2 keys provide
    for range-partitioned locality.  Use as a SORT/partition key;
    ``cell_of`` remains the equality/groupby key."""
    s = cell_size(res)
    ix = np.clip(
        np.floor((np.asarray(lon, np.float64) + 180.0) / s).astype(np.int64),
        0, 2 ** (res + 8) - 1,
    )
    iy = np.clip(
        np.floor((np.asarray(lat, np.float64) + 90.0) / s).astype(np.int64),
        0, 2 ** (res + 7) - 1,
    )
    z = np.zeros(len(ix), dtype=np.int64)
    for b in range(res + 8):
        z |= ((ix >> np.int64(b)) & np.int64(1)) << np.int64(2 * b)
        z |= ((iy >> np.int64(b)) & np.int64(1)) << np.int64(2 * b + 1)
    return (np.int64(res) << np.int64(56)) | z


def oracle_sql_expr(lon_col: str, lat_col: str, res: int) -> str:
    """DuckDB SQL expression computing the identical cell id (oracle parity)."""
    s = repr(cell_size(res))
    nx = 2 ** (res + 8) - 1
    ny = 2 ** (res + 7) - 1
    return (
        f"((CAST({res} AS BIGINT) << 56)"
        f" | (LEAST(GREATEST(CAST(FLOOR(({lat_col} + 90.0) / {s}) AS BIGINT), 0), {ny}) << 28)"
        f" | LEAST(GREATEST(CAST(FLOOR(({lon_col} + 180.0) / {s}) AS BIGINT), 0), {nx}))"
    )


def focal_mean(
    cell_ids: np.ndarray, values: np.ndarray, k: int = 1
) -> np.ndarray:
    """Focal (moving-window) mean over a per-cell aggregate: for each
    input cell, the mean of ``values`` across the cells PRESENT in its
    (2k+1)^2 Chebyshev neighborhood (itself included) -- the raster
    "focal statistics" op, applied to the already-aggregated cell
    table, so its cost is O(cells * window), never O(points).

    All ids must share one resolution.  Neighbors outside the global
    grid extent are excluded (no wraparound: an ix of -1 would
    otherwise alias row iy-1's last column through the bit packing).
    """
    cell_ids = np.asarray(cell_ids, np.int64)
    values = np.asarray(values, np.float64)
    res_arr, iy, ix = unpack(cell_ids)
    res = int(res_arr[0])
    maxx = 2 ** (res + 8) - 1
    maxy = 2 ** (res + 7) - 1
    key = (iy << np.int64(28)) | ix
    order = np.argsort(key)
    skey = key[order]
    sval = values[order]
    total = np.zeros(len(key))
    cnt = np.zeros(len(key))
    for dy in range(-k, k + 1):
        ny = iy + dy
        for dx in range(-k, k + 1):
            nx = ix + dx
            valid = (nx >= 0) & (nx <= maxx) & (ny >= 0) & (ny <= maxy)
            nk = (ny << np.int64(28)) | nx
            pos = np.searchsorted(skey, nk)
            pos_c = np.clip(pos, 0, len(skey) - 1)
            found = valid & (skey[pos_c] == nk)
            total += np.where(found, sval[pos_c], 0.0)
            cnt += found
    return total / cnt


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_of(lon: np.ndarray, lat: np.ndarray, precision: int = 6) -> list[str]:
    """Standard geohash (Niemeyer): binary subdivision of lon then lat,
    base32 alphabet.  The subdivision equals direct quantization --
    ``precision`` chars carry ceil(5p/2) lon bits and floor(5p/2) lat
    bits (lon gets the even interleave positions) -- so the vectorized
    form is two floor-quantizations + a bit interleave, identical to
    the reference algorithm's bisection output and expressible in SQL
    (integer arithmetic + alphabet substring)."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision out of range: {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    qlon = np.clip(
        np.floor(
            (np.asarray(lon, np.float64) + 180.0) / 360.0 * (1 << nlon)
        ).astype(np.int64),
        0, (1 << nlon) - 1,
    )
    qlat = np.clip(
        np.floor(
            (np.asarray(lat, np.float64) + 90.0) / 180.0 * (1 << nlat)
        ).astype(np.int64),
        0, (1 << nlat) - 1,
    )
    z = np.zeros(len(qlon), dtype=np.int64)
    # bit i (0-based, MSB-first in the hash) alternates lon, lat
    for b in range(nlon):
        z |= ((qlon >> np.int64(nlon - 1 - b)) & np.int64(1)) << np.int64(
            nbits - 1 - 2 * b
        )
    for b in range(nlat):
        z |= ((qlat >> np.int64(nlat - 1 - b)) & np.int64(1)) << np.int64(
            nbits - 2 - 2 * b
        )
    # vectorized base32 assembly: (n, precision) char-code matrix ->
    # fixed-width byte strings (no per-row bit loop)
    alpha = np.frombuffer(_GEOHASH32.encode(), dtype=np.uint8)
    shifts = (5 * (precision - 1 - np.arange(precision))).astype(np.int64)
    codes = np.ascontiguousarray(
        alpha[(z[:, None] >> shifts[None, :]) & np.int64(31)]
    )
    return codes.view(f"S{precision}").ravel().astype(str).tolist()


def geohash_sql_expr(lon_col: str, lat_col: str, precision: int = 6) -> str:
    """DuckDB expression computing :func:`geohash_of` bit-exactly."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    qlon = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_col}) + 180.0) / 360.0 "
        f"* {1 << nlon}) AS BIGINT), 0), {(1 << nlon) - 1})"
    )
    qlat = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_col}) + 90.0) / 180.0 "
        f"* {1 << nlat}) AS BIGINT), 0), {(1 << nlat) - 1})"
    )
    lon_terms = " | ".join(
        f"((({qlon} >> {nlon - 1 - b}) & 1) << {nbits - 1 - 2 * b})"
        for b in range(nlon)
    )
    lat_terms = " | ".join(
        f"((({qlat} >> {nlat - 1 - b}) & 1) << {nbits - 2 - 2 * b})"
        for b in range(nlat)
    )
    z = f"({lon_terms} | {lat_terms})"
    chars = " || ".join(
        f"substring('{_GEOHASH32}', "
        f"CAST((({z}) >> {5 * (precision - 1 - c)}) & 31 AS INTEGER) + 1, 1)"
        for c in range(precision)
    )
    return f"({chars})"


def adaptive_quadtree(
    ds,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res_min: int = 5,
    res_max: int = 8,
    max_points: int = 100,
):
    """Adaptive quadtree tiling: start at ``res_min`` cells and split
    any cell holding more than ``max_points`` points into its 4
    children, down to ``res_max`` -- the balanced-partition builder
    for skewed point sets (each final cell is a shuffle-ready range;
    cf. the hot-cell salting in stages/shuffle.py).  Cell indices are
    the frozen flat-grid floors; child index = 2*parent (+0/1)
    EXACTLY because cell sizes halve by powers of two.

    Per level: one combiner count pass over the points (restricted to
    still-open cells via a broadcast set -- open-set size is bounded
    by split cells, not points), split decision driver-side.  Returns
    ``(res, iy, ix, n_points)`` for the final cells (only cells that
    contain points exist)."""
    import pyarrow as pa

    from ..stages.shuffle import partial_count

    final_rows = []
    open_set = None  # None = all cells at res_min
    for r in range(res_min, res_max + 1):
        s = cell_size(r)
        rr = r

        def level_ix(batch: pa.Table, _s=s, _r=rr, _open=open_set) -> pa.Table:
            lon = batch[lon_col].to_numpy(zero_copy_only=False)
            lat = batch[lat_col].to_numpy(zero_copy_only=False)
            ix = np.floor((lon + 180.0) / _s).astype(np.int64)
            iy = np.floor((lat + 90.0) / _s).astype(np.int64)
            t = pa.table({"iy": pa.array(iy), "ix": pa.array(ix)})
            if _open is not None:
                keep = np.fromiter(
                    ((int(a), int(b)) in _open for a, b in zip(iy, ix)),
                    bool, len(ix),
                )
                t = t.filter(pa.array(keep))
            return t

        counts = partial_count(
            ds.map_batches(level_ix, batch_format="pyarrow", batch_size=None),
            ["iy", "ix"],
        )
        iy = counts["iy"].to_numpy(zero_copy_only=False)
        ix = counts["ix"].to_numpy(zero_copy_only=False)
        n = counts["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = (n > max_points) & (r < res_max)
        for a, b, c in zip(iy[~split], ix[~split], n[~split]):
            final_rows.append((r, int(a), int(b), int(c)))
        if not split.any():
            break
        open_set = {
            (2 * int(a) + dy, 2 * int(b) + dx)
            for a, b in zip(iy[split], ix[split])
            for dy in (0, 1)
            for dx in (0, 1)
        }
    return pa.table(
        {
            "res": pa.array([r for r, *_ in final_rows], pa.int64()),
            "iy": pa.array([a for _, a, _b, _c in final_rows], pa.int64()),
            "ix": pa.array([b for _, _a, b, _c in final_rows], pa.int64()),
            "n_points": pa.array(
                [c for *_x, c in final_rows], pa.int64()
            ),
        }
    ).sort_by([("res", "ascending"), ("iy", "ascending"), ("ix", "ascending")])


def cover_bbox(
    minx: float, miny: float, maxx: float, maxy: float,
    res_min: int = 5,
    res_max: int = 8,
):
    """Covering-cell planner: decompose a query bbox into MAXIMAL
    grid cells (the S2/H3 ``RegionCoverer`` role) -- cells fully
    inside the bbox emit at their coarsest resolution, boundary cells
    recurse, res_max boundary cells emit as partial.  This is the
    query-side planner that turns a spatial predicate into cell-range
    scans (prune parquet by cell id); the data-side counterpart is
    :func:`adaptive_quadtree`.  Driver-side recursion -- output size
    is O(perimeter / finest cell), never area.  Returns an Arrow
    table ``(res, iy, ix, full)``, full = 1 for fully-inside cells."""
    import pyarrow as pa

    out = []

    def bounds(r, iy, ix):
        s = cell_size(r)
        return (ix * s - 180.0, iy * s - 90.0,
                (ix + 1) * s - 180.0, (iy + 1) * s - 90.0)

    def visit(r, iy, ix):
        cx0, cy0, cx1, cy1 = bounds(r, iy, ix)
        if cx1 <= minx or cx0 >= maxx or cy1 <= miny or cy0 >= maxy:
            return  # disjoint
        if cx0 >= minx and cx1 <= maxx and cy0 >= miny and cy1 <= maxy:
            out.append((r, iy, ix, 1))
            return
        if r == res_max:
            out.append((r, iy, ix, 0))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                visit(r + 1, 2 * iy + dy, 2 * ix + dx)

    s0 = cell_size(res_min)
    ix0 = int(np.floor((minx + 180.0) / s0))
    ix1 = int(np.floor((maxx + 180.0) / s0))
    iy0 = int(np.floor((miny + 90.0) / s0))
    iy1 = int(np.floor((maxy + 90.0) / s0))
    for iy in range(iy0, iy1 + 1):
        for ix in range(ix0, ix1 + 1):
            visit(res_min, iy, ix)
    out.sort()
    return pa.table(
        {
            "res": pa.array([r for r, *_ in out], pa.int64()),
            "iy": pa.array([a for _, a, _b, _f in out], pa.int64()),
            "ix": pa.array([b for _r, _a, b, _f in out], pa.int64()),
            "full": pa.array([f for *_x, f in out], pa.int64()),
        }
    )
