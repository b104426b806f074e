"""Distributed raster focal operators via tile halo exchange.

The reference ships a slope layer to the browser through WMS
(slope.js:56-76 requests ``useruploads:slopeAll_Data`` from GeoServer)
-- the derivative raster itself is precomputed server-side (GDAL
``gdaldem slope``, Horn 1981).  The engine implements that computation
as a first-class distributed operator over the tile table:

1. each tile emits itself plus 1-pixel boundary strips addressed to
   its 8 neighbors (``emit_halos``, a stateless ``map_batches``);
2. a ``groupby`` on the receiving tile's origin co-locates every tile
   with its halo strips;
3. ``horn_kernel`` (run via ``map_groups``) pads the tile with the
   received halo and evaluates the 3x3 Horn derivative vectorized.

No stage ever holds more than one tile + its 1-pixel halo, so the
operator streams at any raster size; the shuffle moves only the thin
strips plus the tiles themselves (halo volume is O(perimeter), ~4/H of
the data for HxH tiles).

Partitioning assumption (documented per the brief): a REGULAR tile
grid per (src, band) -- all tiles of one raster share one
(height, width), so a neighbor's origin is this tile's origin +- the
tile dims.  Irregular tilings need a repartition-to-regular pass
first.

Pixels are valid for the derivative only when the full 3x3 window is
inside the raster AND every window value passes the reference's
validity threshold (z > -1e30, willOnlyStoreValidPoints.py:66); edge
pixels and nodata-adjacent pixels are dropped, matching ``gdaldem``'s
default edge/nodata behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import NODATA_THRESHOLD

# sender-relative direction -> the slice of the sender's array a
# receiver in that direction needs (1-pixel halo)
_DIRS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)]


def _halo_key(src: str, band: int, r0: int, c0: int) -> str:
    return f"{src}|{band}|{r0}|{c0}"


def make_emit_halos(
    stride_r: int | None = None,
    stride_c: int | None = None,
    halo: int = 1,
):
    """Build the halo-emit map_batches function.  ``stride_r``/``c``
    are the tile GRID strides: a sender addressing its up/left
    neighbor needs the NEIGHBOR's extent, which equals the sender's
    own only on uniform tilings.  With the strides given, receiver
    origins snap to the stride grid, so RAGGED tilings (short edge
    tiles -- every real raster whose size is not a tile multiple) halo
    correctly.  Default (None) keeps the uniform-tiling behavior.
    ``halo`` is the strip width in pixels (1 for 3x3 kernels, 2 for
    5x5 -- shuffle volume stays O(halo x perimeter) per tile)."""

    def emit(batch: pa.Table) -> pa.Table:
        return _emit_halos_impl(batch, stride_r, stride_c, halo)

    return emit


def emit_halos(batch: pa.Table) -> pa.Table:
    """Uniform-tiling halo emit (see :func:`make_emit_halos`)."""
    return _emit_halos_impl(batch, None, None, 1)


def _emit_halos_impl(
    batch: pa.Table,
    stride_r: int | None,
    stride_c: int | None,
    halo: int = 1,
) -> pa.Table:
    """Explode a tile batch into core rows + boundary-strip rows, each
    keyed by the RECEIVING tile's origin.  ``rel_r``/``rel_c`` record
    the sender's position relative to the receiver so the receiver can
    place the strip into its padded array."""
    out_key, out_rel_r, out_rel_c = [], [], []
    out_vals, out_h, out_w = [], [], []
    out_row0, out_col0, out_transform = [], [], []
    n = batch.num_rows
    src = batch["src"].to_pylist()
    band = batch["band"].to_pylist()
    r_off = batch["row_off"].to_pylist()
    c_off = batch["col_off"].to_pylist()
    hs = batch["height"].to_pylist()
    ws = batch["width"].to_pylist()
    transforms = batch["transform"].to_pylist()
    values = batch["values"]
    for i in range(n):
        h, w = hs[i], ws[i]
        if h < halo or w < halo:
            # ADVICE r3: strips only reach IMMEDIATE neighbors, so a
            # tile smaller than the halo would silently starve its
            # second-ring receivers (binom5's nok==25 mask would then
            # drop valid boundary pixels) -- fail loudly instead
            raise ValueError(
                f"tile {h}x{w} smaller than halo={halo}: retile the "
                "input so every tile dimension is >= the halo width"
            )
        arr = np.asarray(values[i].as_py(), np.float32).reshape(h, w)
        # the tile itself (rel 0,0)
        out_key.append(_halo_key(src[i], band[i], r_off[i], c_off[i]))
        out_rel_r.append(0)
        out_rel_c.append(0)
        out_vals.append(arr.ravel())
        out_h.append(h)
        out_w.append(w)
        out_row0.append(r_off[i])
        out_col0.append(c_off[i])
        out_transform.append(transforms[i])
        for dr, dc in _DIRS:
            # receiver origin: DOWN/RIGHT neighbors start right past
            # this tile (origin + extent); UP/LEFT neighbors start one
            # grid stride back (their OWN extent -- equal to the
            # sender's only on uniform tilings, hence the strides)
            sr = stride_r if stride_r is not None else h
            sc = stride_c if stride_c is not None else w
            nr0 = r_off[i] + (h if dr == 1 else -sr if dr == -1 else 0)
            nc0 = c_off[i] + (w if dc == 1 else -sc if dc == -1 else 0)
            if nr0 < 0 or nc0 < 0:
                continue
            k = halo
            rows = slice(max(0, h - k), h) if dr == 1 else slice(0, min(k, h)) if dr == -1 else slice(0, h)
            cols = slice(max(0, w - k), w) if dc == 1 else slice(0, min(k, w)) if dc == -1 else slice(0, w)
            strip = arr[rows, cols]
            out_key.append(_halo_key(src[i], band[i], nr0, nc0))
            # sender relative to receiver = -direction
            out_rel_r.append(-dr)
            out_rel_c.append(-dc)
            out_vals.append(strip.ravel())
            out_h.append(strip.shape[0])
            out_w.append(strip.shape[1])
            out_row0.append(r_off[i])
            out_col0.append(c_off[i])
            out_transform.append(transforms[i])
    return pa.table(
        {
            "halo_key": pa.array(out_key),
            "rel_r": pa.array(out_rel_r, pa.int8()),
            "rel_c": pa.array(out_rel_c, pa.int8()),
            "h": pa.array(out_h, pa.int32()),
            "w": pa.array(out_w, pa.int32()),
            "row0": pa.array(out_row0, pa.int32()),
            "col0": pa.array(out_col0, pa.int32()),
            "transform": pa.array(out_transform, pa.list_(pa.float64(), 6)),
            "values": pa.array(
                [v.tolist() for v in out_vals], pa.list_(pa.float32())
            ),
        }
    )


def _assemble_padded(group: pa.Table, halo: int = 1):
    """Rebuild one tile + its halo strips into a NaN-padded
    (h+2*halo, w+2*halo) array.  Returns None for orphan halo groups
    (strips addressed past the raster boundary, no core tile)."""
    rel_r = group["rel_r"].to_numpy(zero_copy_only=False)
    rel_c = group["rel_c"].to_numpy(zero_copy_only=False)
    core_idx = np.flatnonzero((rel_r == 0) & (rel_c == 0))
    if len(core_idx) == 0:
        return None
    ci = int(core_idx[0])
    h = int(group["h"][ci].as_py())
    w = int(group["w"][ci].as_py())
    r0 = int(group["row0"][ci].as_py())
    c0 = int(group["col0"][ci].as_py())
    transform = group["transform"][ci].as_py()  # GDAL order a,b,c,d,e,f
    core = (
        np.asarray(group["values"][ci].as_py(), np.float32)
        .reshape(h, w)
        .astype(np.float64)
    )
    k = halo
    pad = np.full((h + 2 * k, w + 2 * k), np.nan)
    pad[k : h + k, k : w + k] = core
    for j in range(group.num_rows):
        if j == ci:
            continue
        sr, sc = int(rel_r[j]), int(rel_c[j])
        sh = int(group["h"][j].as_py())
        sw = int(group["w"][j].as_py())
        strip = (
            np.asarray(group["values"][j].as_py(), np.float32)
            .reshape(sh, sw)
            .astype(np.float64)
        )
        rows = slice(k - sh, k) if sr == -1 else slice(h + k, h + k + sh) if sr == 1 else slice(k, k + sh)
        cols = slice(k - sw, k) if sc == -1 else slice(w + k, w + k + sw) if sc == 1 else slice(k, k + sw)
        pad[rows, cols] = strip
    return pad, h, w, r0, c0, transform


def horn_kernel(group: pa.Table) -> pa.Table:
    """One tile + its halo strips -> per-pixel Horn slope (and aspect).

    p = dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * xres)
    q = dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * yres)
    slope_pct = 100 * sqrt(p^2 + q^2); aspect = atan2(q, -p) degrees.

    Arithmetic is ordered exactly like the SQL oracle (left-assoc
    sums, division by ``8 * res``) so rounded outputs are
    bit-identical to DuckDB.
    """
    asm = _assemble_padded(group)
    if asm is None:
        return _empty_slope_table()
    pad, h, w, r0, c0, transform = asm
    xres = abs(transform[0])
    yres = abs(transform[4])
    # 3x3 windows: letters per Horn (a b c / d e f / g h i), row-major
    za = pad[0:h, 0:w]
    zb = pad[0:h, 1 : w + 1]
    zc = pad[0:h, 2 : w + 2]
    zd = pad[1 : h + 1, 0:w]
    ze = pad[1 : h + 1, 1 : w + 1]
    zf = pad[1 : h + 1, 2 : w + 2]
    zg = pad[2 : h + 2, 0:w]
    zh = pad[2 : h + 2, 1 : w + 1]
    zi = pad[2 : h + 2, 2 : w + 2]
    stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return _empty_slope_table()
    p = ((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * xres)
    q = ((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * yres)
    slope = 100.0 * np.sqrt(p * p + q * q)
    aspect = np.degrees(np.arctan2(q, -p))
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "slope_pct": pa.array(slope[rr, cc]),
            "aspect_deg": pa.array(aspect[rr, cc]),
        }
    )


def _empty_slope_table() -> pa.Table:
    return pa.table(
        {
            "row": pa.array([], pa.int64()),
            "col": pa.array([], pa.int64()),
            "slope_pct": pa.array([], pa.float64()),
            "aspect_deg": pa.array([], pa.float64()),
        }
    )


# ESRI D8 direction codes in tie-break priority order:
# E, SE, S, SW, W, NW, N, NE
_D8 = [
    (0, 1, 1.0, 1), (1, 1, 2.0 ** 0.5, 2), (1, 0, 1.0, 4),
    (1, -1, 2.0 ** 0.5, 8), (0, -1, 1.0, 16), (-1, -1, 2.0 ** 0.5, 32),
    (-1, 0, 1.0, 64), (-1, 1, 2.0 ** 0.5, 128),
]


def d8_kernel(group: pa.Table) -> pa.Table:
    """D8 flow direction (hydrology): per pixel, the ESRI direction
    code of the steepest positive descent, drop = (z - z_n) / dist
    (dist = sqrt(2) on diagonals); ties break in E,SE,S,SW,W,NW,N,NE
    order; sinks/flats (no positive drop) code 0.  Validity contract
    identical to :func:`horn_kernel` (full 3x3 window present and
    above the nodata threshold)."""
    asm = _assemble_padded(group)
    if asm is None:
        return pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "d8": pa.array([], pa.int64()),
            }
        )
    pad, h, w, r0, c0, _ = asm
    ze = pad[1 : h + 1, 1 : w + 1]
    windows = [
        pad[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w] for dr, dc, _, _ in _D8
    ]
    stack = np.stack([ze] + windows)
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "d8": pa.array([], pa.int64()),
            }
        )
    drops = [ (ze - zn) / dist for (_, _, dist, _), zn in zip(_D8, windows) ]
    best = np.maximum.reduce(drops)
    code = np.zeros((h, w), np.int64)
    # first direction (in priority order) achieving the max positive
    # drop wins: assign from the LAST priority backwards
    for (_, _, _, c), d in reversed(list(zip(_D8, drops))):
        code = np.where(d == best, c, code)
    code = np.where(best > 0.0, code, 0)
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "d8": pa.array(code[rr, cc]),
        }
    )


def tile_flow_direction(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """D8 flow direction over a tile Dataset via the same halo-exchange
    shuffle as :func:`tile_slope`."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(d8_kernel, batch_format="pyarrow")


def tile_slope(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """Horn slope/aspect over a tile Dataset: halo-exchange shuffle,
    then the per-tile kernel.  Streams -- one tile + halo in memory
    per task."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(horn_kernel, batch_format="pyarrow")


_HS_LX = -0.5000000000000001   # cos(45 deg) * sin(315 deg)
_HS_LY = 0.4999999999999999    # cos(45 deg) * cos(315 deg)
_HS_LZ = 0.7071067811865475    # sin(45 deg)


def hillshade_kernel(group: pa.Table) -> pa.Table:
    """One tile + halo -> Lambertian hillshade (azimuth 315, altitude
    45): the per-pixel trig-free algebraic form -- surface normal
    (-p, -q, 1)/sqrt(1 + p^2 + q^2) dotted with the PRECOMPUTED light
    vector constants, so engine and SQL share pure arithmetic + one
    correctly-rounded sqrt (bit-identical after rounding).  p, q are
    the Horn gradients (same windows as horn_kernel)."""
    asm = _assemble_padded(group)
    if asm is None:
        return pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "hillshade": pa.array([], pa.float64()),
            }
        )
    pad, h, w, r0, c0, transform = asm
    xres = abs(transform[0])
    yres = abs(transform[4])
    za = pad[0:h, 0:w]
    zb = pad[0:h, 1 : w + 1]
    zc = pad[0:h, 2 : w + 2]
    zd = pad[1 : h + 1, 0:w]
    ze = pad[1 : h + 1, 1 : w + 1]
    zf = pad[1 : h + 1, 2 : w + 2]
    zg = pad[2 : h + 2, 0:w]
    zh = pad[2 : h + 2, 1 : w + 1]
    zi = pad[2 : h + 2, 2 : w + 2]
    stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "hillshade": pa.array([], pa.float64()),
            }
        )
    p = ((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * xres)
    q = ((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * yres)
    dot = (_HS_LX * (-p) + _HS_LY * (-q) + _HS_LZ) / np.sqrt(
        1.0 + (p * p + q * q)
    )
    shade = 255.0 * np.maximum(dot, 0.0)
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "hillshade": pa.array(shade[rr, cc]),
        }
    )


def tile_hillshade(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """Hillshade layer over a tile Dataset (halo-exchange shuffle +
    per-tile Lambertian kernel) -- the engine analogue of the
    reference's precomputed shaded-relief WMS layer."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(
        hillshade_kernel, batch_format="pyarrow"
    )


def tri_kernel(group: pa.Table) -> pa.Table:
    """One tile + halo -> per-pixel Terrain Ruggedness Index (Riley et
    al. 1999): sqrt of the summed squared elevation differences to the
    8 neighbors.  The sum is written in the exact left-associative
    a,b,c,d,f,g,h,i order so the rounded output is bit-identical to
    the SQL oracle (sqrt is correctly rounded IEEE on both sides)."""
    asm = _assemble_padded(group)
    if asm is None:
        return _empty_tri_table()
    pad, h, w, r0, c0, _transform = asm
    za = pad[0:h, 0:w]
    zb = pad[0:h, 1 : w + 1]
    zc = pad[0:h, 2 : w + 2]
    zd = pad[1 : h + 1, 0:w]
    ze = pad[1 : h + 1, 1 : w + 1]
    zf = pad[1 : h + 1, 2 : w + 2]
    zg = pad[2 : h + 2, 0:w]
    zh = pad[2 : h + 2, 1 : w + 1]
    zi = pad[2 : h + 2, 2 : w + 2]
    stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return _empty_tri_table()
    d = (
        (za - ze) * (za - ze)
        + (zb - ze) * (zb - ze)
        + (zc - ze) * (zc - ze)
        + (zd - ze) * (zd - ze)
        + (zf - ze) * (zf - ze)
        + (zg - ze) * (zg - ze)
        + (zh - ze) * (zh - ze)
        + (zi - ze) * (zi - ze)
    )
    tri = np.sqrt(d)
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "tri": pa.array(tri[rr, cc]),
        }
    )


def _empty_tri_table() -> pa.Table:
    return pa.table(
        {
            "row": pa.array([], pa.int64()),
            "col": pa.array([], pa.int64()),
            "tri": pa.array([], pa.float64()),
        }
    )


def tile_ruggedness(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """Terrain Ruggedness Index over a tile Dataset: the same
    halo-exchange shuffle as tile_slope, TRI kernel per tile."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(tri_kernel, batch_format="pyarrow")


def tpi_kernel(group: pa.Table) -> pa.Table:
    """One tile + halo -> per-pixel Topographic Position Index (Weiss
    2001): center elevation minus the mean of its 8 neighbors.
    Positive = ridge/peak, negative = valley/pit, ~0 = flat or
    constant slope.  The neighbor sum is written in the exact
    left-associative a,b,c,d,f,g,h,i order so the rounded output is
    bit-identical to the SQL oracle."""
    asm = _assemble_padded(group)
    if asm is None:
        return _empty_tpi_table()
    pad, h, w, r0, c0, _transform = asm
    za = pad[0:h, 0:w]
    zb = pad[0:h, 1 : w + 1]
    zc = pad[0:h, 2 : w + 2]
    zd = pad[1 : h + 1, 0:w]
    ze = pad[1 : h + 1, 1 : w + 1]
    zf = pad[1 : h + 1, 2 : w + 2]
    zg = pad[2 : h + 2, 0:w]
    zh = pad[2 : h + 2, 1 : w + 1]
    zi = pad[2 : h + 2, 2 : w + 2]
    stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return _empty_tpi_table()
    tpi = ze - (za + zb + zc + zd + zf + zg + zh + zi) / 8.0
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "tpi": pa.array(tpi[rr, cc]),
        }
    )


def _empty_tpi_table() -> pa.Table:
    return pa.table(
        {
            "row": pa.array([], pa.int64()),
            "col": pa.array([], pa.int64()),
            "tpi": pa.array([], pa.float64()),
        }
    )


def tile_tpi(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """Topographic Position Index over a tile Dataset: the same
    halo-exchange shuffle as tile_slope, TPI kernel per tile."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(tpi_kernel, batch_format="pyarrow")


def curvature_kernel(group: pa.Table) -> pa.Table:
    """Zevenbergen & Thorne (1987) surface curvature on the 3x3
    window (letters a..i as in :func:`horn_kernel`, cell size L from
    the tile transform):

        D = ((zd + zf) / 2 - ze) / L^2      (d2z/dx2 / 2)
        E = ((zb + zh) / 2 - ze) / L^2      (d2z/dy2 / 2)
        F = (-za + zc + zg - zi) / (4 L^2)  (d2z/dxdy)
        G = (-zd + zf) / (2 L)              (dz/dx)
        H = (zb - zh) / (2 L)               (dz/dy)

    Outputs (x100, the ArcGIS/gdaldem-style per-100-units scale):
    ``curv_general = (-2 (D + E)) * 100``; ``curv_profile =
    (-2 (D G^2 + E H^2 + F G H) / (G^2 + H^2)) * 100`` and
    ``curv_plan = (2 (D H^2 + E G^2 - F G H) / (G^2 + H^2)) * 100``,
    both defined 0 on flats (G^2 + H^2 == 0).  Every float op is
    written in the exact left-associative order of the SQL oracle so
    rounded outputs are bit-identical to DuckDB.  Validity contract
    identical to horn_kernel (full 3x3 window above the nodata
    threshold)."""
    asm = _assemble_padded(group)
    if asm is None:
        return _empty_curvature_table()
    pad, h, w, r0, c0, transform = asm
    res = abs(transform[0])
    za = pad[0:h, 0:w]
    zb = pad[0:h, 1 : w + 1]
    zc = pad[0:h, 2 : w + 2]
    zd = pad[1 : h + 1, 0:w]
    ze = pad[1 : h + 1, 1 : w + 1]
    zf = pad[1 : h + 1, 2 : w + 2]
    zg = pad[2 : h + 2, 0:w]
    zh = pad[2 : h + 2, 1 : w + 1]
    zi = pad[2 : h + 2, 2 : w + 2]
    stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return _empty_curvature_table()
    l2 = res * res
    dd = ((zd + zf) / 2.0 - ze) / l2
    ee = ((zb + zh) / 2.0 - ze) / l2
    ff = (-za + zc + zg - zi) / (4.0 * l2)
    gg = (-zd + zf) / (2.0 * res)
    hh2 = (zb - zh) / (2.0 * res)
    g2h2 = gg * gg + hh2 * hh2
    general = (-2.0 * (dd + ee)) * 100.0
    with np.errstate(divide="ignore", invalid="ignore"):
        profile = (
            -2.0 * (dd * gg * gg + ee * hh2 * hh2 + ff * gg * hh2) / g2h2
        ) * 100.0
        plan = (
            2.0 * (dd * hh2 * hh2 + ee * gg * gg - ff * gg * hh2) / g2h2
        ) * 100.0
    flat = g2h2 == 0.0
    profile = np.where(flat, 0.0, profile)
    plan = np.where(flat, 0.0, plan)
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "curv_general": pa.array(general[rr, cc]),
            "curv_profile": pa.array(profile[rr, cc]),
            "curv_plan": pa.array(plan[rr, cc]),
        }
    )


def _empty_curvature_table() -> pa.Table:
    return pa.table(
        {
            "row": pa.array([], pa.int64()),
            "col": pa.array([], pa.int64()),
            "curv_general": pa.array([], pa.float64()),
            "curv_profile": pa.array([], pa.float64()),
            "curv_plan": pa.array([], pa.float64()),
        }
    )


def tile_curvature(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """Zevenbergen-Thorne curvature over a tile Dataset via the same
    halo-exchange shuffle as :func:`tile_slope`: O(perimeter) strip
    shuffle, one tile + halo in memory per task."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(
        curvature_kernel, batch_format="pyarrow"
    )


# marching-squares case -> crossing-edge pairs.  Corners (tl, tr, br,
# bl) set bits (1, 2, 4, 8); edges are 0=top 1=right 2=bottom 3=left.
# Ambiguous saddles (5, 10) use the fixed non-connected convention.
_MS_SEGMENTS = {
    0: [], 15: [],
    1: [(3, 0)], 14: [(3, 0)],
    2: [(0, 1)], 13: [(0, 1)],
    4: [(1, 2)], 11: [(1, 2)],
    8: [(2, 3)], 7: [(2, 3)],
    3: [(3, 1)], 12: [(3, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    5: [(3, 0), (1, 2)],
    10: [(0, 1), (2, 3)],
}


def contour_case_kernel(level: float):
    """Marching-squares classifier + interpolated segment length for
    ONE tile + halo: 2x2 windows anchored at each core pixel (the
    right/bottom corners come from the halo, so tile boundaries emit
    no duplicate windows).  Returns per-tile case histogram plus the
    summed euclidean contour length in pixel units."""

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "case_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "length_px": pa.array([], pa.float64()),
            }
        )
        asm = _assemble_padded(group)
        if asm is None:
            return empty
        pad, h, w, r0, c0, _transform = asm
        tl = pad[1 : h + 1, 1 : w + 1]
        tr = pad[1 : h + 1, 2 : w + 2]
        bl = pad[2 : h + 2, 1 : w + 1]
        br = pad[2 : h + 2, 2 : w + 2]
        stack = np.stack([tl, tr, br, bl])
        valid = np.all(
            np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0
        )
        if not valid.any():
            return empty
        case = (
            (tl > level).astype(np.int64)
            + 2 * (tr > level).astype(np.int64)
            + 4 * (br > level).astype(np.int64)
            + 8 * (bl > level).astype(np.int64)
        )
        case = np.where(valid, case, -1)
        cs = case[valid]
        hist = np.bincount(cs, minlength=16)

        # interpolated crossing point per edge (unit-square coords)
        def frac(a, b):
            with np.errstate(divide="ignore", invalid="ignore"):
                return (level - a) / (b - a)

        ex = {
            0: (frac(tl, tr), np.zeros_like(tl)),        # top edge
            1: (np.ones_like(tl), frac(tr, br)),         # right
            2: (frac(bl, br), np.ones_like(tl)),         # bottom
            3: (np.zeros_like(tl), frac(tl, bl)),        # left
        }
        total_len = 0.0
        for c_id, segs in _MS_SEGMENTS.items():
            if not segs:
                continue
            m = valid & (case == c_id)
            if not m.any():
                continue
            for e1, e2 in segs:
                x1, y1 = ex[e1][0][m], ex[e1][1][m]
                x2, y2 = ex[e2][0][m], ex[e2][1][m]
                total_len += float(
                    np.hypot(x2 - x1, y2 - y1).sum()
                )
        nz = np.flatnonzero(hist)
        # case rows carry counts; one sentinel row (case_id=-1) carries
        # the tile's total interpolated length -- both sum-combinable
        case_ids = np.concatenate([nz, [-1]]).astype(np.int64)
        ns = np.concatenate([hist[nz], [0]]).astype(np.int64)
        lens = np.concatenate([np.zeros(len(nz)), [total_len]])
        return pa.table(
            {
                "case_id": pa.array(case_ids),
                "n": pa.array(ns),
                "length_px": pa.array(lens),
            }
        )

    return kernel


def tile_contours(
    tiles: ray.data.Dataset, level: float, stride: int | None = None
) -> ray.data.Dataset:
    """Marching-squares contour statistics at ``level`` over a tile
    Dataset: the same halo-exchange shuffle as :func:`tile_slope`,
    then the per-tile classifier.  Per-tile output rows are
    sum-combinable: case rows (case_id >= 0, n) plus one sentinel row
    (case_id = -1) whose length_px is the tile's interpolated contour
    length."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride), batch_format="pyarrow",
        batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(
        contour_case_kernel(level), batch_format="pyarrow"
    )


def contour_segment_kernel(level: float):
    """Marching squares, GEOMETRY output (VERDICT r2 item 8 / ROADMAP
    4): per 2x2 window, emit each interpolated contour segment's two
    endpoints in GLOBAL pixel coordinates (x = col + local, y = row +
    local; windows anchored at their top-left core pixel so tile
    boundaries emit no duplicates).  Saddle cases 5/10 use the fixed
    _MS_SEGMENTS disambiguation.  Rows: (row, col, seg, x1, y1, x2,
    y2), coordinates rounded to 6 dp -- the SQL-comparable segment set
    the per-tile stitcher consumes."""

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "seg": pa.array([], pa.int64()),
                "x1": pa.array([], pa.float64()),
                "y1": pa.array([], pa.float64()),
                "x2": pa.array([], pa.float64()),
                "y2": pa.array([], pa.float64()),
            }
        )
        asm = _assemble_padded(group)
        if asm is None:
            return empty
        pad, h, w, r0, c0, _transform = asm
        tl = pad[1 : h + 1, 1 : w + 1]
        tr = pad[1 : h + 1, 2 : w + 2]
        bl = pad[2 : h + 2, 1 : w + 1]
        br = pad[2 : h + 2, 2 : w + 2]
        stack = np.stack([tl, tr, br, bl])
        valid = np.all(
            np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0
        )
        if not valid.any():
            return empty
        case = (
            (tl > level).astype(np.int64)
            + 2 * (tr > level).astype(np.int64)
            + 4 * (br > level).astype(np.int64)
            + 8 * (bl > level).astype(np.int64)
        )
        rows_g = np.broadcast_to(
            np.arange(h, dtype=np.int64)[:, None] + r0, (h, w)
        )
        cols_g = np.broadcast_to(
            np.arange(w, dtype=np.int64)[None, :] + c0, (h, w)
        )

        def frac(a, b):
            with np.errstate(divide="ignore", invalid="ignore"):
                return (level - a) / (b - a)

        # edge -> (local_x, local_y) of the interpolated crossing
        ex = {
            0: (frac(tl, tr), np.zeros_like(tl)),
            1: (np.ones_like(tl), frac(tr, br)),
            2: (frac(bl, br), np.ones_like(tl)),
            3: (np.zeros_like(tl), frac(tl, bl)),
        }
        out_r, out_c, out_s = [], [], []
        out = {k: [] for k in ("x1", "y1", "x2", "y2")}
        for c_id, segs in _MS_SEGMENTS.items():
            if not segs:
                continue
            m = valid & (case == c_id)
            if not m.any():
                continue
            for s_idx, (e1, e2) in enumerate(segs):
                out_r.append(rows_g[m])
                out_c.append(cols_g[m])
                out_s.append(np.full(int(m.sum()), s_idx, np.int64))
                out["x1"].append(cols_g[m] + ex[e1][0][m])
                out["y1"].append(rows_g[m] + ex[e1][1][m])
                out["x2"].append(cols_g[m] + ex[e2][0][m])
                out["y2"].append(rows_g[m] + ex[e2][1][m])
        if not out_r:
            return empty
        from ..functions.rounding import round_like_sql

        return pa.table(
            {
                "row": pa.array(np.concatenate(out_r)),
                "col": pa.array(np.concatenate(out_c)),
                "seg": pa.array(np.concatenate(out_s)),
                "x1": round_like_sql(np.concatenate(out["x1"]), 6),
                "y1": round_like_sql(np.concatenate(out["y1"]), 6),
                "x2": round_like_sql(np.concatenate(out["x2"]), 6),
                "y2": round_like_sql(np.concatenate(out["y2"]), 6),
            }
        )

    return kernel


def tile_contour_segments(
    tiles: ray.data.Dataset, level: float, stride: int | None = None
) -> ray.data.Dataset:
    """Contour segment geometry over a tile Dataset: halo-exchange
    shuffle, then :func:`contour_segment_kernel` per tile."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride), batch_format="pyarrow",
        batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(
        contour_segment_kernel(level), batch_format="pyarrow"
    )


def stitch_segments(segments: pa.Table) -> pa.Table:
    """Chain contour segments into polylines by shared (rounded 6 dp)
    endpoints -- union-find over the segment set (bounded: one tile's
    or one collected level-set's segments, NOT the raster).  Returns
    per-polyline rows (polyline_id = min segment ordinal, n_segments,
    length, closed)."""
    n = segments.num_rows
    if n == 0:
        return pa.table(
            {
                "polyline_id": pa.array([], pa.int64()),
                "n_segments": pa.array([], pa.int64()),
                "length": pa.array([], pa.float64()),
                "closed": pa.array([], pa.bool_()),
            }
        )
    x1 = segments["x1"].to_numpy(zero_copy_only=False)
    y1 = segments["y1"].to_numpy(zero_copy_only=False)
    x2 = segments["x2"].to_numpy(zero_copy_only=False)
    y2 = segments["y2"].to_numpy(zero_copy_only=False)

    # endpoint -> node id (exact match on the 6-dp rounded coords)
    pts = np.concatenate(
        [np.stack([x1, y1], 1), np.stack([x2, y2], 1)]
    )
    uniq, inv = np.unique(pts, axis=0, return_inverse=True)
    a_node, b_node = inv[:n], inv[n:]

    parent = np.arange(len(uniq))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        ra, rb = find(int(a_node[i])), find(int(b_node[i]))
        if ra != rb:
            parent[rb] = ra
    comp = np.array([find(int(c)) for c in a_node])
    length = np.hypot(x2 - x1, y2 - y1)

    # node degree: closed loop <=> every node has degree 2
    deg = np.bincount(
        np.concatenate([a_node, b_node]), minlength=len(uniq)
    )
    rows = []
    for root in np.unique(comp):
        m = comp == root
        nodes = np.unique(np.concatenate([a_node[m], b_node[m]]))
        rows.append(
            {
                "polyline_id": int(np.flatnonzero(m)[0]),
                "n_segments": int(m.sum()),
                "length": float(length[m].sum()),
                "closed": bool((deg[nodes] == 2).all()),
            }
        )
    rows.sort(key=lambda r: r["polyline_id"])
    return pa.table(
        {
            "polyline_id": pa.array([r["polyline_id"] for r in rows], pa.int64()),
            "n_segments": pa.array([r["n_segments"] for r in rows], pa.int64()),
            "length": pa.array([r["length"] for r in rows], pa.float64()),
            "closed": pa.array([r["closed"] for r in rows], pa.bool_()),
        }
    )

# ------------------------------------------------------ flow accumulation
_D8_OFFSET = {1: (0, 1), 2: (1, 1), 4: (1, 0), 8: (1, -1),
              16: (0, -1), 32: (-1, -1), 64: (-1, 0), 128: (-1, 1)}
_FLOW_TERM = 1 << 62  # sentinel: route terminates inside the block


def _block_next(rows, cols, codes, br, bc, block):
    """Per-block next-pointer map: pos -> in-block next pos, the
    string "OUT" paired with the target cell when the flow crosses the
    block boundary, or None for sinks / targets outside the valid node
    set."""
    idx = {(int(r), int(c)) for r, c in zip(rows, cols)}
    nxt = {}
    for r, c, code in zip(rows, cols, codes):
        p = (int(r), int(c))
        code = int(code)
        if code == 0:
            nxt[p] = None
            continue
        dr, dc = _D8_OFFSET[code]
        t = (p[0] + dr, p[1] + dc)
        if t[0] // block == br and t[1] // block == bc:
            nxt[p] = t if t in idx else None
        else:
            nxt[p] = ("OUT", t)
    return nxt


def _local_accumulate(nxt):
    """Kahn pass over one block's flow forest -> (acc: in-block
    drainage incl. self, outflows: [(boundary target cell, amount)])."""
    indeg = {p: 0 for p in nxt}
    for p, t in nxt.items():
        if isinstance(t, tuple) and t[0] != "OUT":
            indeg[t] += 1
    acc = {p: 1 for p in nxt}
    stack = [p for p, d in indeg.items() if d == 0]
    outflows = []
    while stack:
        p = stack.pop()
        t = nxt[p]
        if t is None:
            continue
        if t[0] == "OUT":
            outflows.append((t[1], acc[p]))
            continue
        acc[t] += acc[p]
        indeg[t] -= 1
        if indeg[t] == 0:
            stack.append(t)
    return acc, outflows


def _entry_route(nxt, entry):
    """Cells an external inflow at ``entry`` visits inside the block,
    plus the exit target cell (None when it terminates in-block)."""
    visited = []
    p = entry
    while True:
        visited.append(p)
        t = nxt[p]
        if t is None:
            return visited, None
        if t[0] == "OUT":
            return visited, t[1]
        p = t


def _is_boundary(p, br, bc, block):
    r_in = p[0] - br * block
    c_in = p[1] - bc * block
    return (
        r_in == 0 or r_in == block - 1 or c_in == 0 or c_in == block - 1
    )


def _solve_flow_forest(route: dict, base_in: dict) -> dict:
    """Kahn over a boundary-entry forest: route maps entry -> exit
    entry (or None when the path terminates / leaves the valid node
    set); base_in carries direct inflow amounts (entries absent from
    ``route`` are invalid -- their inflow vanishes).  Returns
    {entry: total inflow > 0} where total = sum of base_in over the
    entry's in-forest subtree (itself included)."""
    nxt_e = {}
    indeg = {e: 0 for e in route}
    for e in route:
        t = route[e]
        t = t if t is not None and t in route else None
        nxt_e[e] = t
        if t is not None:
            indeg[t] += 1
    total = {e: base_in.get(e, 0) for e in route}
    stack = [e for e, d in indeg.items() if d == 0]
    while stack:
        e = stack.pop()
        t = nxt_e[e]
        if t is None:
            continue
        total[t] += total[e]
        indeg[t] -= 1
        if indeg[t] == 0:
            stack.append(t)
    return {e: x for e, x in total.items() if x > 0}


def flow_accumulation(
    tiles: ray.data.Dataset,
    block: int = 32,
    stride: int | None = None,
    forest_tier: str = "auto",
    super_factor: int = 8,
    max_driver_entries: int = 2_000_000,
    cache_d8: bool = True,
) -> pa.Table:
    """D8 flow accumulation (drainage area in cells, incl. self) --
    the TauDEM-style two-level decomposition:

      1. :func:`tile_flow_direction` (halo-exchange shuffle) -> the
         global (row, col, d8) node table;
      2. per-BLOCK ``groupby.map_groups`` emits ONLY perimeter-bounded
         rows (VERDICT r3 item 4 -- no full-grid kind-0 rows): boundary
         outflows carrying the accumulated count at each crossing, and
         route compression entry->exit for every boundary cell;
      3. the inter-block inflow system lives on BOUNDARY cells only.
         ``forest_tier`` picks how it is solved:
           - ``'driver'``: one topological walk on the driver (right
             when the total perimeter fits driver memory);
           - ``'distributed'``: the SECOND recursion level -- entries
             are grouped by SUPER-block (``super_factor`` blocks per
             side), each super-group Kahn-solves its in-super forest
             and emits cross-super outflows plus route compression for
             its PORTS (cross-super inflow targets, marked by a
             shuffled marker row); the resulting port forest (another
             ``super_factor`` smaller) is driver-solved only when it
             fits ``max_driver_entries``, else the SAME machinery
             recurses at ever larger granularity until it does
             (:func:`_forest_totals_tiered`), and port inflows are
             replayed inside the super-groups with one more grouped
             shuffle.  Entry inflows are delivered back to blocks by a
             bk-keyed union+groupby, never a driver broadcast.
           - ``'auto'``: routes on the materialized entry-row count
             (``> max_driver_entries`` -> distributed).
      4. a final per-block pass replays each entry's route, adding its
         solved total inflow to every visited cell.

    Exactly equals the global sequential Kahn reference (tests, both
    tiers) and the recursive SQL ancestor-count (oracle)."""
    import ray

    if forest_tier not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown forest_tier: {forest_tier}")
    d8 = tile_flow_direction(tiles, stride=stride)

    def add_block(batch: pa.Table) -> pa.Table:
        r = batch["row"].to_numpy(zero_copy_only=False)
        c = batch["col"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bk", pa.array((r // block) * 100000 + (c // block))
        )

    # the blocked d8 node table is consumed twice (block phase +
    # final replay).  cache_d8=True pins it in the object store
    # (spillable); at raster scales where even spilled residency is
    # unwanted, cache_d8=False leaves it lazy so each consumer
    # re-executes the halo-exchange lineage instead (compute for
    # memory -- VERDICT r3 item 4's materialize note)
    blocked = d8.map_batches(
        add_block, batch_format="pyarrow", batch_size=None
    )
    if cache_d8:
        blocked = blocked.materialize()

    def block_phase(group: pa.Table) -> pa.Table:
        """Perimeter-bounded output only: kind 1 = boundary outflow
        (target cell, accumulated amount at the crossing); kind 2 =
        route compression entry -> exit target (or _FLOW_TERM)."""
        rows = group["row"].to_numpy(zero_copy_only=False)
        cols = group["col"].to_numpy(zero_copy_only=False)
        codes = group["d8"].to_numpy(zero_copy_only=False)
        br, bc = int(rows[0]) // block, int(cols[0]) // block
        nxt = _block_next(rows, cols, codes, br, bc, block)
        _, outflows = _local_accumulate(nxt)
        r1, c1, r2, c2, v, kind = [], [], [], [], [], []
        for t, a in outflows:
            r1.append(t[0]); c1.append(t[1]); r2.append(0); c2.append(0)
            v.append(a); kind.append(1)
        for p in nxt:
            if not _is_boundary(p, br, bc, block):
                continue
            _, exit_t = _entry_route(nxt, p)
            er, ec = (exit_t if exit_t is not None
                      else (_FLOW_TERM, _FLOW_TERM))
            r1.append(p[0]); c1.append(p[1]); r2.append(er); c2.append(ec)
            v.append(0); kind.append(2)
        return pa.table(
            {
                "r1": pa.array(np.asarray(r1, np.int64)),
                "c1": pa.array(np.asarray(c1, np.int64)),
                "r2": pa.array(np.asarray(r2, np.int64)),
                "c2": pa.array(np.asarray(c2, np.int64)),
                "v": pa.array(np.asarray(v, np.int64)),
                "kind": pa.array(np.asarray(kind, np.int64)),
            }
        )

    # perimeter-bounded; materialized because both the forest solve
    # and (in the distributed tier) the replay pass consume it
    phase_b = blocked.groupby("bk").map_groups(
        block_phase, batch_format="pyarrow"
    ).materialize()
    empty = pa.table(
        {"row": pa.array([], pa.int64()), "col": pa.array([], pa.int64()),
         "acc": pa.array([], pa.int64())}
    )
    n_entries = phase_b.count()
    if forest_tier == "auto":
        tier = "distributed" if n_entries > max_driver_entries else "driver"
    else:
        tier = forest_tier

    if tier == "driver" or n_entries == 0:
        allp = _collect_tables(phase_b)
        if allp is None or allp.num_rows == 0:
            route: dict = {}
            base_in: dict = {}
        else:
            k = allp["kind"].to_numpy(zero_copy_only=False)
            r1 = allp["r1"].to_numpy(zero_copy_only=False)
            c1 = allp["c1"].to_numpy(zero_copy_only=False)
            r2 = allp["r2"].to_numpy(zero_copy_only=False)
            c2 = allp["c2"].to_numpy(zero_copy_only=False)
            v = allp["v"].to_numpy(zero_copy_only=False)
            # boundary-entry forest (perimeter-bounded driver state)
            route = {
                (int(a), int(b)): (
                    None if int(x) == _FLOW_TERM else (int(x), int(y))
                )
                for a, b, x, y in zip(
                    r1[k == 2], c1[k == 2], r2[k == 2], c2[k == 2]
                )
            }
            base_in = {}
            for a, b, amt in zip(r1[k == 1], c1[k == 1], v[k == 1]):
                p = (int(a), int(b))
                # an outflow target is always a boundary cell of the
                # neighbor block, so validity == having a route row
                # (inflow to an invalid cell vanishes)
                if p in route:
                    base_in[p] = base_in.get(p, 0) + int(amt)
        inflow = _solve_flow_forest(route, base_in)
        inflow_ref = ray.put(inflow)

        def final_phase(group: pa.Table) -> pa.Table:
            flows = ray.get(inflow_ref)
            return _flow_final_block(group, block, flows)

        final = blocked.groupby("bk").map_groups(
            final_phase, batch_format="pyarrow"
        )
    else:
        entry_rows = _flow_entry_totals_distributed(
            phase_b, block, super_factor, max_driver_entries
        )
        # deliver entry inflows to their blocks by a bk-keyed union +
        # groupby -- no driver broadcast.  Inflow rows ride the d8
        # column as NEGATIVE amounts (blocked's schema, zero extra
        # columns); real d8 codes are >= 0.
        final = blocked.union(entry_rows).groupby("bk").map_groups(
            lambda g: _flow_final_block(
                g.filter(pc.greater_equal(g["d8"], 0)), block,
                {
                    (int(r), int(c)): -int(d)
                    for r, c, d in zip(
                        g.filter(pc.less(g["d8"], 0))["row"].to_pylist(),
                        g.filter(pc.less(g["d8"], 0))["col"].to_pylist(),
                        g.filter(pc.less(g["d8"], 0))["d8"].to_pylist(),
                    )
                },
            ),
            batch_format="pyarrow",
        )

    out = _collect_tables(final)
    if out is None or out.num_rows == 0:
        return empty
    order = pc.sort_indices(
        out, sort_keys=[("row", "ascending"), ("col", "ascending")]
    )
    return out.take(order)


def _flow_final_block(group: pa.Table, block: int, flows: dict) -> pa.Table:
    """Replay pass for ONE block: local Kahn + add each entry's solved
    external inflow along its in-block route."""
    if group.num_rows == 0:
        return pa.table(
            {"row": pa.array([], pa.int64()),
             "col": pa.array([], pa.int64()),
             "acc": pa.array([], pa.int64())}
        )
    rows = group["row"].to_numpy(zero_copy_only=False)
    cols = group["col"].to_numpy(zero_copy_only=False)
    codes = group["d8"].to_numpy(zero_copy_only=False)
    br, bc = int(rows[0]) // block, int(cols[0]) // block
    nxt = _block_next(rows, cols, codes, br, bc, block)
    acc, _ = _local_accumulate(nxt)
    for p in nxt:
        amt = flows.get(p)
        if not amt or not _is_boundary(p, br, bc, block):
            continue
        visited, _ = _entry_route(nxt, p)
        for q in visited:
            acc[q] += amt
    rr = np.fromiter((p[0] for p in acc), np.int64, len(acc))
    cc = np.fromiter((p[1] for p in acc), np.int64, len(acc))
    aa = np.fromiter((acc[p] for p in acc), np.int64, len(acc))
    return pa.table(
        {"row": pa.array(rr), "col": pa.array(cc), "acc": pa.array(aa)}
    )


def _flow_add_sbk(sb: int):
    """Factory: key forest rows by super-block of size ``sb``; emit
    kind-3 port markers for cross-super route edges (keyed by the
    EXIT's super-block)."""

    def add_sbk(batch: pa.Table) -> pa.Table:
        k = batch["kind"].to_numpy(zero_copy_only=False)
        r1 = batch["r1"].to_numpy(zero_copy_only=False)
        c1 = batch["c1"].to_numpy(zero_copy_only=False)
        r2 = batch["r2"].to_numpy(zero_copy_only=False)
        c2 = batch["c2"].to_numpy(zero_copy_only=False)
        sbk = (r1 // sb) * 100000 + (c1 // sb)
        out = batch.append_column("sbk", pa.array(sbk))
        cross = (
            (k == 2) & (r2 != _FLOW_TERM)
            & (((r2 // sb) != (r1 // sb)) | ((c2 // sb) != (c1 // sb)))
        )
        if not cross.any():
            return out
        n = int(cross.sum())
        markers = pa.table(
            {
                "r1": pa.array(r2[cross]),
                "c1": pa.array(c2[cross]),
                "r2": pa.array(np.zeros(n, np.int64)),
                "c2": pa.array(np.zeros(n, np.int64)),
                "v": pa.array(np.zeros(n, np.int64)),
                "kind": pa.array(np.full(n, 3, np.int64)),
                "sbk": pa.array(
                    (r2[cross] // sb) * 100000 + (c2[cross] // sb)
                ),
            }
        )
        return pa.concat_tables([out, markers])

    return add_sbk


def _flow_parse_group(group: pa.Table, sb: int):
    """-> (routes, bases, ports, next_in) for one super-group.
    next_in[e] is an in-super entry, ("OUT", x) for a cross-super
    exit, or None (terminal / invalid target)."""
    k = group["kind"].to_numpy(zero_copy_only=False)
    r1 = group["r1"].to_numpy(zero_copy_only=False)
    c1 = group["c1"].to_numpy(zero_copy_only=False)
    r2 = group["r2"].to_numpy(zero_copy_only=False)
    c2 = group["c2"].to_numpy(zero_copy_only=False)
    v = group["v"].to_numpy(zero_copy_only=False)
    routes = {
        (int(a), int(b)): (
            None if int(x) == _FLOW_TERM else (int(x), int(y))
        )
        for a, b, x, y in zip(
            r1[k == 2], c1[k == 2], r2[k == 2], c2[k == 2]
        )
    }
    bases: dict = {}
    for a, b, amt in zip(r1[k == 1], c1[k == 1], v[k == 1]):
        p = (int(a), int(b))
        if p in routes:
            bases[p] = bases.get(p, 0) + int(amt)
    ports = {
        (int(a), int(b)) for a, b in zip(r1[k == 3], c1[k == 3])
    }
    next_in = {}
    for e, x in routes.items():
        if x is None:
            next_in[e] = None
        elif x in routes:
            next_in[e] = x
        elif x[0] // sb == e[0] // sb and x[1] // sb == e[1] // sb:
            # same super-block but no route row -> invalid cell
            next_in[e] = None
        else:
            next_in[e] = ("OUT", x)
    return routes, bases, ports, next_in


def _flow_super_kahn(next_in: dict, bases: dict):
    """-> (tot per entry from in-super bases, cross-super
    outflows [(target, amount)])."""
    indeg = {e: 0 for e in next_in}
    for e, t in next_in.items():
        if isinstance(t, tuple) and t[0] != "OUT":
            indeg[t] += 1
    tot = {e: bases.get(e, 0) for e in next_in}
    outfl = []
    stack = [e for e, d in indeg.items() if d == 0]
    while stack:
        e = stack.pop()
        t = next_in[e]
        if t is None:
            continue
        if t[0] == "OUT":
            if tot[e]:
                outfl.append((t[1], tot[e]))
            continue
        tot[t] += tot[e]
        indeg[t] -= 1
        if indeg[t] == 0:
            stack.append(t)
    return tot, outfl


def _flow_super_phase(sb: int):
    """Factory: one super-group -> next-level forest rows (kind-1
    cross-super outflows + kind-2 compressed port routes)."""

    def super_phase(group: pa.Table) -> pa.Table:
        routes, bases, ports, next_in = _flow_parse_group(group, sb)
        _, outfl = _flow_super_kahn(next_in, bases)
        # route compression for this group's ports only
        exit_memo: dict = {}

        def exit_of(e):
            chain = []
            q = e
            while q not in exit_memo:
                chain.append(q)
                t = next_in[q]
                if t is None:
                    exit_memo[q] = None
                    break
                if t[0] == "OUT":
                    exit_memo[q] = t[1]
                    break
                q = t
            res = exit_memo[q]  # set either before the loop or at break
            for s in chain:
                exit_memo[s] = res
            return res

        r1, c1, r2, c2, v, kind = [], [], [], [], [], []
        for t, a in outfl:
            r1.append(t[0]); c1.append(t[1]); r2.append(0); c2.append(0)
            v.append(a); kind.append(1)
        for p in ports:
            if p not in routes:
                continue  # invalid target: its inflow vanishes
            x = exit_of(p)
            er, ec = x if x is not None else (_FLOW_TERM, _FLOW_TERM)
            r1.append(p[0]); c1.append(p[1]); r2.append(er); c2.append(ec)
            v.append(0); kind.append(2)
        return pa.table(
            {
                "r1": pa.array(np.asarray(r1, np.int64)),
                "c1": pa.array(np.asarray(c1, np.int64)),
                "r2": pa.array(np.asarray(r2, np.int64)),
                "c2": pa.array(np.asarray(c2, np.int64)),
                "v": pa.array(np.asarray(v, np.int64)),
                "kind": pa.array(np.asarray(kind, np.int64)),
            }
        )

    return super_phase


def _flow_solve_ports_driver(ports_out: pa.Table | None) -> dict:
    """Driver Kahn over a collected port forest -> {port: inflow}."""
    if ports_out is None or ports_out.num_rows == 0:
        return {}
    k = ports_out["kind"].to_numpy(zero_copy_only=False)
    r1 = ports_out["r1"].to_numpy(zero_copy_only=False)
    c1 = ports_out["c1"].to_numpy(zero_copy_only=False)
    r2 = ports_out["r2"].to_numpy(zero_copy_only=False)
    c2 = ports_out["c2"].to_numpy(zero_copy_only=False)
    v = ports_out["v"].to_numpy(zero_copy_only=False)
    routes3 = {
        (int(a), int(b)): (
            None if int(x) == _FLOW_TERM else (int(x), int(y))
        )
        for a, b, x, y in zip(
            r1[k == 2], c1[k == 2], r2[k == 2], c2[k == 2]
        )
    }
    base3: dict = {}
    for a, b, amt in zip(r1[k == 1], c1[k == 1], v[k == 1]):
        p = (int(a), int(b))
        if p in routes3:
            base3[p] = base3.get(p, 0) + int(amt)
    return _solve_flow_forest(routes3, base3)


def _flow_kind4_table(port_inflow: dict, sb: int) -> pa.Table:
    """{port: inflow} -> kind-4 delivery rows keyed by super-block."""
    return pa.table(
        {
            "r1": pa.array([p[0] for p in port_inflow], pa.int64()),
            "c1": pa.array([p[1] for p in port_inflow], pa.int64()),
            "r2": pa.array([0] * len(port_inflow), pa.int64()),
            "c2": pa.array([0] * len(port_inflow), pa.int64()),
            "v": pa.array(list(port_inflow.values()), pa.int64()),
            "kind": pa.array([4] * len(port_inflow), pa.int64()),
            "sbk": pa.array(
                [
                    (p[0] // sb) * 100000 + (p[1] // sb)
                    for p in port_inflow
                ],
                pa.int64(),
            ),
        }
    )


def _flow_replay_group(group: pa.Table, sb: int) -> list:
    """Replay pass for one super-group: in-super Kahn totals + kind-4
    injections walked down their chains -> [((r, c), total > 0)]."""
    k = group["kind"].to_numpy(zero_copy_only=False)
    core = group.filter(pa.array(k != 4))
    routes, bases, _, next_in = _flow_parse_group(core, sb)
    tot, _ = _flow_super_kahn(next_in, bases)
    r1 = group["r1"].to_numpy(zero_copy_only=False)
    c1 = group["c1"].to_numpy(zero_copy_only=False)
    v = group["v"].to_numpy(zero_copy_only=False)
    for a, b, amt in zip(r1[k == 4], c1[k == 4], v[k == 4]):
        p = (int(a), int(b))
        if p not in routes:
            continue
        q = p
        while True:
            tot[q] += int(amt)
            t = next_in[q]
            if t is None or t[0] == "OUT":
                break
            q = t
    return [(e, x) for e, x in tot.items() if x > 0]


def _flow_to_kind4(sb: int):
    """Factory: (r1, c1, v) port totals -> kind-4 delivery rows keyed
    by the super-block of size ``sb``."""

    def to_kind4(batch: pa.Table) -> pa.Table:
        r1 = batch["r1"].to_numpy(zero_copy_only=False)
        c1 = batch["c1"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        return pa.table(
            {
                "r1": batch["r1"],
                "c1": batch["c1"],
                "r2": pa.array(np.zeros(n, np.int64)),
                "c2": pa.array(np.zeros(n, np.int64)),
                "v": batch["v"],
                "kind": pa.array(np.full(n, 4, np.int64)),
                "sbk": pa.array((r1 // sb) * 100000 + (c1 // sb)),
            }
        )

    return to_kind4


def _flow_union_port_totals(
    l2: ray.data.Dataset, ports_ds: ray.data.Dataset, sb: int,
    super_factor: int, max_driver_entries: int,
    depth: int = 0, max_depth: int = 16,
) -> ray.data.Dataset:
    """Shared port-forest routing: driver Kahn when the port forest
    fits ``max_driver_entries`` (or the recursion-depth backstop
    fires), else recurse :func:`_forest_totals_tiered`; returns ``l2``
    with the solved kind-4 delivery rows unioned in."""
    import ray

    n_ports = ports_ds.count()
    if n_ports <= max_driver_entries or depth >= max_depth:
        port_inflow = _flow_solve_ports_driver(_collect_tables(ports_ds))
        if not port_inflow:
            return l2
        return l2.union(
            ray.data.from_arrow(_flow_kind4_table(port_inflow, sb))
        )
    totals = _forest_totals_tiered(
        ports_ds, sb, super_factor, max_driver_entries, depth + 1,
        max_depth,
    )
    return l2.union(
        totals.map_batches(
            _flow_to_kind4(sb), batch_format="pyarrow", batch_size=None
        )
    )


def _forest_totals_tiered(
    forest: ray.data.Dataset, cell: int, super_factor: int,
    max_driver_entries: int, depth: int = 1, _max_depth: int = 16,
) -> ray.data.Dataset:
    """Per-node ancestor-sum totals of a generic (r1, c1, r2, c2, v,
    kind) forest Dataset, TIERED (VERDICT r4 item 4): apply the
    super-block decomposition at granularity ``cell * super_factor``
    and RECURSE on the resulting port forest until it fits
    ``max_driver_entries`` -- every level is the same
    perimeter-compression machinery, so no level ever collects more
    than the driver threshold.  Returns a Dataset of (r1, c1, v)."""
    import ray

    sb = cell * super_factor
    l2 = forest.map_batches(
        _flow_add_sbk(sb), batch_format="pyarrow", batch_size=None
    ).materialize()
    ports_ds = l2.groupby("sbk").map_groups(
        _flow_super_phase(sb), batch_format="pyarrow"
    ).materialize()
    l2b = _flow_union_port_totals(
        l2, ports_ds, sb, super_factor, max_driver_entries,
        depth=depth, max_depth=_max_depth,
    )

    def final_totals(group: pa.Table) -> pa.Table:
        ent = _flow_replay_group(group, sb)
        return pa.table(
            {
                "r1": pa.array(
                    np.asarray([e[0][0] for e in ent], np.int64)
                ),
                "c1": pa.array(
                    np.asarray([e[0][1] for e in ent], np.int64)
                ),
                "v": pa.array(np.asarray([e[1] for e in ent], np.int64)),
            }
        )

    return l2b.groupby("sbk").map_groups(
        final_totals, batch_format="pyarrow"
    )


def _flow_entry_totals_distributed(
    phase_b: ray.data.Dataset, block: int, super_factor: int,
    max_driver_entries: int = 2_000_000,
) -> ray.data.Dataset:
    """Second+ recursion levels of the boundary-entry forest (VERDICT
    r3 item 4, deepened r4 item 4): solve entry inflow totals with the
    SAME block-decomposition trick one level up, recursively.

    Entries are grouped by super-block (= ``super_factor`` blocks per
    side).  Round 1 (grouped shuffle): each super-group Kahn-solves its
    in-super forest from its local base inflows and emits (a) cross-
    super outflows and (b) route compression for its PORTS -- entries
    targeted by a cross-super edge, announced to the owning group by a
    marker row in the same shuffle.  The resulting PORT forest
    (perimeter of super-blocks -- ``super_factor``x smaller) is solved
    on the driver only when it fits ``max_driver_entries``; otherwise
    :func:`_forest_totals_tiered` recurses the same machinery at
    ``super_factor``x larger granularity until it does, so the driver
    never holds more than the threshold at ANY raster scale.
    Round 2 (grouped shuffle): port inflows are replayed inside each
    super-group, emitting every entry's total inflow as rows keyed by
    the entry's BLOCK, with the amount carried as a NEGATIVE d8 so the
    rows union directly with the blocked d8 table.

    Returns a Dataset with schema (row, col, d8 = -total, bk)."""
    import ray

    sb = block * super_factor
    l2 = phase_b.map_batches(
        _flow_add_sbk(sb), batch_format="pyarrow", batch_size=None
    ).materialize()
    ports_ds = l2.groupby("sbk").map_groups(
        _flow_super_phase(sb), batch_format="pyarrow"
    ).materialize()
    l2b = _flow_union_port_totals(
        l2, ports_ds, sb, super_factor, max_driver_entries
    )

    def final_super(group: pa.Table) -> pa.Table:
        ent = _flow_replay_group(group, sb)
        rr = np.asarray([e[0][0] for e in ent], np.int64)
        cc = np.asarray([e[0][1] for e in ent], np.int64)
        aa = np.asarray([e[1] for e in ent], np.int64)
        return pa.table(
            {
                "row": pa.array(rr),
                "col": pa.array(cc),
                "d8": pa.array(-aa),
                "bk": pa.array((rr // block) * 100000 + (cc // block)),
            }
        )

    return l2b.groupby("sbk").map_groups(
        final_super, batch_format="pyarrow"
    )


def _collect_tables(ds: ray.data.Dataset) -> pa.Table | None:
    """Driver-side collect of a small/result dataset."""
    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        return None
    return pa.concat_tables(parts, promote_options="default")


def flow_accumulation_reference(d8_table: pa.Table) -> dict:
    """Independent GLOBAL sequential Kahn reference (test oracle for
    :func:`flow_accumulation`): pos -> drainage count."""
    rows = d8_table["row"].to_pylist()
    cols = d8_table["col"].to_pylist()
    codes = d8_table["d8"].to_pylist()
    idx = set(zip(rows, cols))
    nxt = {}
    for r, c, code in zip(rows, cols, codes):
        if code == 0:
            nxt[(r, c)] = None
        else:
            dr, dc = _D8_OFFSET[code]
            t = (r + dr, c + dc)
            nxt[(r, c)] = t if t in idx else None
    indeg = {p: 0 for p in nxt}
    for p, t in nxt.items():
        if t is not None:
            indeg[t] += 1
    acc = {p: 1 for p in nxt}
    stack = [p for p, d in indeg.items() if d == 0]
    while stack:
        p = stack.pop()
        t = nxt[p]
        if t is None:
            continue
        acc[t] += acc[p]
        indeg[t] -= 1
        if indeg[t] == 0:
            stack.append(t)
    return acc


def watershed_labels(
    tiles: ray.data.Dataset,
    block: int = 32,
    stride: int | None = None,
    forest_tier: str = "auto",
    super_factor: int = 8,
    max_driver_entries: int = 2_000_000,
    cache_d8: bool = True,
) -> pa.Table:
    """Watershed labeling: every valid D8 cell gets the (row, col) of
    the SINK its flow path terminates at (pits, flats, or exits off
    the valid node set).  Same decomposition as
    :func:`flow_accumulation`: per-block route compression sends each
    cell to its in-block terminal or block-exit target; the
    perimeter-bounded entry forest resolves exit targets to global
    sinks (``forest_tier='driver'`` walks it on the driver;
    ``'distributed'`` is the second recursion level -- super-block
    grouped resolution, driver solve of the PORT forest only, and
    need-row-routed sink delivery back to the referencing supers, so
    nothing driver-held or broadcast exceeds the cross-super edge
    count); one final per-block pass stamps the labels, receiving its
    entry sinks via a bk-keyed union+groupby in the distributed tier
    instead of a perimeter-sized ``ray.put`` dict.

    Returns (row, col, sink_row, sink_col) sorted by (row, col)."""
    import ray

    if forest_tier not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown forest_tier: {forest_tier}")
    d8 = tile_flow_direction(tiles, stride=stride)

    def add_block(batch: pa.Table) -> pa.Table:
        r = batch["row"].to_numpy(zero_copy_only=False)
        c = batch["col"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bk", pa.array((r // block) * 100000 + (c // block))
        )

    # the blocked d8 node table is consumed twice (block phase +
    # final replay).  cache_d8=True pins it in the object store
    # (spillable); at raster scales where even spilled residency is
    # unwanted, cache_d8=False leaves it lazy so each consumer
    # re-executes the halo-exchange lineage instead (compute for
    # memory -- VERDICT r3 item 4's materialize note)
    blocked = d8.map_batches(
        add_block, batch_format="pyarrow", batch_size=None
    )
    if cache_d8:
        blocked = blocked.materialize()
    OFF = 1 << 31

    def block_phase(group: pa.Table) -> pa.Table:
        """Perimeter-bounded: ONLY kind-2 rows (boundary entry ->
        in-block terminal (r2, c2) or exit target + OFF, with the last
        in-block cell in (r3, c3))."""
        rows = group["row"].to_numpy(zero_copy_only=False)
        cols = group["col"].to_numpy(zero_copy_only=False)
        codes = group["d8"].to_numpy(zero_copy_only=False)
        br, bc = int(rows[0]) // block, int(cols[0]) // block
        nxt = _block_next(rows, cols, codes, br, bc, block)
        end: dict = {}

        def resolve(p):
            path = []
            q = p
            while q not in end:
                path.append(q)
                t = nxt[q]
                if t is None:
                    end[q] = (q, None, q)
                    break
                if t[0] == "OUT":
                    end[q] = (None, t[1], q)
                    break
                q = t
            res = end[q]
            for s in path:
                end[s] = res
            return res

        r1, c1, r2, c2, r3, c3 = [], [], [], [], [], []
        for p in nxt:
            if not _is_boundary(p, br, bc, block):
                continue
            term, exit_t, last = resolve(p)
            r1.append(p[0]); c1.append(p[1])
            if term is not None:
                r2.append(term[0]); c2.append(term[1])
            else:
                r2.append(exit_t[0] + OFF)
                c2.append(exit_t[1] + OFF)
            r3.append(last[0]); c3.append(last[1])
        return pa.table(
            {
                "r1": pa.array(np.asarray(r1, np.int64)),
                "c1": pa.array(np.asarray(c1, np.int64)),
                "r2": pa.array(np.asarray(r2, np.int64)),
                "c2": pa.array(np.asarray(c2, np.int64)),
                "r3": pa.array(np.asarray(r3, np.int64)),
                "c3": pa.array(np.asarray(c3, np.int64)),
                "kind": pa.array(
                    np.full(len(r1), 2, np.int64)
                ),
            }
        )

    phase_b = blocked.groupby("bk").map_groups(
        block_phase, batch_format="pyarrow"
    ).materialize()
    empty = pa.table(
        {"row": pa.array([], pa.int64()), "col": pa.array([], pa.int64()),
         "sink_row": pa.array([], pa.int64()),
         "sink_col": pa.array([], pa.int64())}
    )
    n_entries = phase_b.count()
    if forest_tier == "auto":
        tier = "distributed" if n_entries > max_driver_entries else "driver"
    else:
        tier = forest_tier

    def _route_of(a, b, x, y, lr, lc):
        x, y = int(x), int(y)
        if x >= OFF:
            return (int(a), int(b)), ("OUT", (x - OFF, y - OFF),
                                      (int(lr), int(lc)))
        return (int(a), int(b)), ("SINK", (x, y), (int(lr), int(lc)))

    if tier == "driver" or n_entries == 0:
        allp = _collect_tables(phase_b)
        route: dict = {}
        if allp is not None and allp.num_rows:
            for a, b, x, y, lr, lc in zip(
                allp["r1"].to_pylist(), allp["c1"].to_pylist(),
                allp["r2"].to_pylist(), allp["c2"].to_pylist(),
                allp["r3"].to_pylist(), allp["c3"].to_pylist(),
            ):
                e, r = _route_of(a, b, x, y, lr, lc)
                route[e] = r
        sink_of = _solve_sink_forest(route)
        sink_ref = ray.put(sink_of)

        def final_phase(group: pa.Table) -> pa.Table:
            return _ws_final_block(group, block, ray.get(sink_ref))

        final = blocked.groupby("bk").map_groups(
            final_phase, batch_format="pyarrow"
        )
    else:
        entry_rows = _ws_entry_sinks_distributed(
            phase_b, block, super_factor, OFF, _route_of,
            max_driver_entries,
        )
        # entry sinks ride the d8 column as -(r * 2^31 + c + 1): real
        # d8 codes are >= 0, rows/cols < 2^31, so the encoding is
        # collision-free and unions with the blocked schema directly
        final = blocked.union(entry_rows).groupby("bk").map_groups(
            lambda g: _ws_final_block(
                g.filter(pc.greater_equal(g["d8"], 0)), block,
                {
                    (int(r), int(c)): divmod(-int(d) - 1, OFF)
                    for r, c, d in zip(
                        g.filter(pc.less(g["d8"], 0))["row"].to_pylist(),
                        g.filter(pc.less(g["d8"], 0))["col"].to_pylist(),
                        g.filter(pc.less(g["d8"], 0))["d8"].to_pylist(),
                    )
                },
            ),
            batch_format="pyarrow",
        )

    out = _collect_tables(final)
    if out is None or out.num_rows == 0:
        return empty
    order = pc.sort_indices(
        out, sort_keys=[("row", "ascending"), ("col", "ascending")]
    )
    return out.take(order)


def _solve_sink_forest(route: dict) -> dict:
    """Memoized walk over an entry forest with SINK/OUT edges: entry ->
    global pour point (an OUT edge whose target has no route stops AT
    the crossing cell)."""
    sink_of: dict = {}

    def resolve_entry(e):
        chain = []
        q = e
        while q not in sink_of:
            chain.append(q)
            tag, t, last = route[q]
            if tag == "SINK":
                sink_of[q] = t
                break
            if t not in route:
                sink_of[q] = last
                break
            q = t
        res = sink_of[q]
        for s in chain:
            sink_of[s] = res
        return res

    for e in route:
        resolve_entry(e)
    return sink_of


def _ws_final_block(group: pa.Table, block: int, sinks: dict) -> pa.Table:
    """Stamp pass for ONE block: each cell resolves to its in-block end
    (pit -> itself; exit -> the delivered global sink of the exit
    target, falling back to the crossing cell when the target is
    invalid)."""
    if group.num_rows == 0:
        return pa.table(
            {"row": pa.array([], pa.int64()),
             "col": pa.array([], pa.int64()),
             "sink_row": pa.array([], pa.int64()),
             "sink_col": pa.array([], pa.int64())}
        )
    rows = group["row"].to_numpy(zero_copy_only=False)
    cols = group["col"].to_numpy(zero_copy_only=False)
    codes = group["d8"].to_numpy(zero_copy_only=False)
    br, bc = int(rows[0]) // block, int(cols[0]) // block
    nxt = _block_next(rows, cols, codes, br, bc, block)
    end: dict = {}

    def resolve(p):
        chain = []
        q = p
        while q not in end:
            chain.append(q)
            t = nxt[q]
            if t is None:
                end[q] = q
                break
            if t[0] == "OUT":
                end[q] = sinks.get(t[1], q)
                break
            q = t
        res = end[q]
        for s in chain:
            end[s] = res
        return res

    rr = np.empty(len(rows), np.int64)
    cc = np.empty(len(rows), np.int64)
    sr = np.empty(len(rows), np.int64)
    sc = np.empty(len(rows), np.int64)
    for i, (r, c) in enumerate(zip(rows, cols)):
        s = resolve((int(r), int(c)))
        rr[i] = r; cc[i] = c; sr[i] = s[0]; sc[i] = s[1]
    return pa.table(
        {"row": pa.array(rr), "col": pa.array(cc),
         "sink_row": pa.array(sr), "sink_col": pa.array(sc)}
    )


def _ws_entry_sinks_distributed(
    phase_b: ray.data.Dataset, block: int, super_factor: int,
    OFF: int, _route_of, max_driver_entries: int = 2_000_000,
) -> ray.data.Dataset:
    """Second+ recursion levels for watershed (VERDICT r3 item 4,
    deepened r4 item 4).

    Round 1 (grouped shuffle by super-block): each super-group
    route-compresses its PORTS (cross-super targets, announced by
    kind-3 marker rows in the same shuffle) to an in-super SINK or the
    next cross-super target, and emits one NEED row per distinct
    cross-super target it references so sinks can later be routed back
    to exactly the supers that use them.  The port forest is
    driver-solved only when it fits ``max_driver_entries``; otherwise
    the SAME machinery recurses at ``super_factor``x larger
    granularity (``resolve_needs_tiered``) until it does, answering
    each level's NEED rows with kind-4 deliveries -- the driver never
    holds more than the threshold at ANY raster scale.  Round 2
    (grouped shuffle): delivered port sinks (kind-4 rows) let each
    super-group resolve ALL of its entries; results are emitted keyed
    by the entry's block with the sink encoded into a negative d8 for
    a schema-compatible union with the blocked node table."""
    import ray

    sb = block * super_factor

    def mk_add_sbk(sbn: int):
        """Key rows by super-block of size ``sbn``; kind-3 markers for
        cross-super OUT targets of kind-2 route rows (kind-5 need rows
        pass through keyed by their TARGET port)."""

        def add_sbk(batch: pa.Table) -> pa.Table:
            k = batch["kind"].to_numpy(zero_copy_only=False)
            r1 = batch["r1"].to_numpy(zero_copy_only=False)
            c1 = batch["c1"].to_numpy(zero_copy_only=False)
            r2 = batch["r2"].to_numpy(zero_copy_only=False)
            c2 = batch["c2"].to_numpy(zero_copy_only=False)
            sbk = (r1 // sbn) * 100000 + (c1 // sbn)
            out = batch.append_column("sbk", pa.array(sbk))
            is_out = (k == 2) & (r2 >= OFF)
            tr = np.where(is_out, r2 - OFF, 0)
            tc = np.where(is_out, c2 - OFF, 0)
            cross = is_out & (
                ((tr // sbn) != (r1 // sbn)) | ((tc // sbn) != (c1 // sbn))
            )
            if not cross.any():
                return out
            n = int(cross.sum())
            markers = pa.table(
                {
                    "r1": pa.array(tr[cross]),
                    "c1": pa.array(tc[cross]),
                    "r2": pa.array(np.zeros(n, np.int64)),
                    "c2": pa.array(np.zeros(n, np.int64)),
                    "r3": pa.array(np.zeros(n, np.int64)),
                    "c3": pa.array(np.zeros(n, np.int64)),
                    "kind": pa.array(np.full(n, 3, np.int64)),
                    "sbk": pa.array(
                        (tr[cross] // sbn) * 100000 + (tc[cross] // sbn)
                    ),
                }
            )
            return pa.concat_tables([out, markers])

        return add_sbk

    def _parse(group: pa.Table):
        k = group["kind"].to_numpy(zero_copy_only=False)
        routes: dict = {}
        ports = set()
        for a, b, x, y, lr, lc, kk in zip(
            group["r1"].to_pylist(), group["c1"].to_pylist(),
            group["r2"].to_pylist(), group["c2"].to_pylist(),
            group["r3"].to_pylist(), group["c3"].to_pylist(),
            k,
        ):
            if kk == 2:
                e, r = _route_of(a, b, x, y, lr, lc)
                routes[e] = r
            elif kk == 3:
                ports.add((int(a), int(b)))
        return routes, ports

    def mk_resolve_super(sbn: int):
        def _resolve_super(routes: dict, e, memo: dict):
            """e -> ("SINK", s) or ("OUT", cross-super target, last)."""
            chain = []
            q = e
            while q not in memo:
                chain.append(q)
                tag, t, last = routes[q]
                if tag == "SINK":
                    memo[q] = ("SINK", t)
                    break
                if t in routes:
                    if (t[0] // sbn, t[1] // sbn) == (
                        q[0] // sbn, q[1] // sbn
                    ):
                        q = t
                        continue
                    # target is in routes only when same-group;
                    # different super cannot be in this group's routes
                if (t[0] // sbn, t[1] // sbn) == (e[0] // sbn, e[1] // sbn):
                    # same super, no route row -> invalid target: pour
                    # point is the crossing cell
                    memo[q] = ("SINK", last)
                else:
                    memo[q] = ("OUT", t, last)
                break
            res = memo[q]
            for s in chain:
                memo[s] = res
            return res

        return _resolve_super

    def mk_super_phase(sbn: int):
        _resolve_super = mk_resolve_super(sbn)

        def super_phase(group: pa.Table) -> pa.Table:
            routes, ports = _parse(group)
            memo: dict = {}
            r1, c1, r2, c2, r3, c3, kind = [], [], [], [], [], [], []
            need = set()
            for p in ports:
                if p not in routes:
                    continue  # invalid port: upstream supers fall back
                res = _resolve_super(routes, p, memo)
                r1.append(p[0]); c1.append(p[1])
                if res[0] == "SINK":
                    r2.append(res[1][0]); c2.append(res[1][1])
                    r3.append(0); c3.append(0)
                else:
                    r2.append(res[1][0] + OFF); c2.append(res[1][1] + OFF)
                    r3.append(res[2][0]); c3.append(res[2][1])
                    need.add(res[1])
                kind.append(2)
            # NEED rows: every distinct cross-super target referenced
            # by ANY of this group's entries (ports or not) -- the
            # answering level must be able to resolve all of them
            this_sbk = int(group["sbk"][0].as_py())
            for e in routes:
                res = _resolve_super(routes, e, memo)
                if res[0] == "OUT":
                    need.add(res[1])
            for t in need:
                r1.append(t[0]); c1.append(t[1])
                r2.append(this_sbk); c2.append(0)
                r3.append(0); c3.append(0)
                kind.append(5)
            return pa.table(
                {
                    "r1": pa.array(np.asarray(r1, np.int64)),
                    "c1": pa.array(np.asarray(c1, np.int64)),
                    "r2": pa.array(np.asarray(r2, np.int64)),
                    "c2": pa.array(np.asarray(c2, np.int64)),
                    "r3": pa.array(np.asarray(r3, np.int64)),
                    "c3": pa.array(np.asarray(c3, np.int64)),
                    "kind": pa.array(np.asarray(kind, np.int64)),
                }
            )

        return super_phase

    def _k4_table(rows_k4: list) -> pa.Table:
        return pa.table(
            {
                "r1": pa.array([r[1][0] for r in rows_k4], pa.int64()),
                "c1": pa.array([r[1][1] for r in rows_k4], pa.int64()),
                "r2": pa.array([r[2][0] for r in rows_k4], pa.int64()),
                "c2": pa.array([r[2][1] for r in rows_k4], pa.int64()),
                "r3": pa.array([0] * len(rows_k4), pa.int64()),
                "c3": pa.array([0] * len(rows_k4), pa.int64()),
                "kind": pa.array([4] * len(rows_k4), pa.int64()),
                "sbk": pa.array([r[0] for r in rows_k4], pa.int64()),
            }
        )

    def _solve_driver(ports_out: pa.Table | None) -> list:
        """Collected kind2+kind5 port table -> k4 delivery rows."""
        routes3: dict = {}
        needs: list = []
        if ports_out is not None and ports_out.num_rows:
            for a, b, x, y, lr, lc, kk in zip(
                ports_out["r1"].to_pylist(), ports_out["c1"].to_pylist(),
                ports_out["r2"].to_pylist(), ports_out["c2"].to_pylist(),
                ports_out["r3"].to_pylist(), ports_out["c3"].to_pylist(),
                ports_out["kind"].to_pylist(),
            ):
                if kk == 2:
                    e, r = _route_of(a, b, x, y, lr, lc)
                    routes3[e] = r
                elif kk == 5:
                    needs.append(((int(a), int(b)), int(x)))
        port_sink = _solve_sink_forest(routes3)
        # route each needed port sink to exactly the supers that asked
        return [
            (need_sbk, t, port_sink[t])
            for t, need_sbk in needs
            if t in port_sink
        ]

    def resolve_needs_tiered(
        ports_ds: ray.data.Dataset, cell: int, depth: int
    ):
        """kind2 route + kind5 need Dataset -> kind-4 delivery rows
        (Dataset or None), recursing the same super-block machinery
        until the port forest fits the driver (VERDICT r4 item 4)."""
        ports_ds = ports_ds.materialize()
        if ports_ds.count() <= max_driver_entries or depth >= 16:
            rows_k4 = _solve_driver(_collect_tables(ports_ds))
            return (
                ray.data.from_arrow(_k4_table(rows_k4))
                if rows_k4
                else None
            )
        sbn = cell * super_factor
        l2x = ports_ds.map_batches(
            mk_add_sbk(sbn), batch_format="pyarrow", batch_size=None
        ).materialize()
        ports2 = l2x.groupby("sbk").map_groups(
            mk_super_phase(sbn), batch_format="pyarrow"
        )
        k4n = resolve_needs_tiered(ports2, sbn, depth + 1)
        l2y = l2x.union(k4n) if k4n is not None else l2x
        _resolve_super = mk_resolve_super(sbn)

        def answer_phase(group: pa.Table) -> pa.Table:
            k = group["kind"].to_numpy(zero_copy_only=False)
            routes, _ = _parse(group.filter(pa.array(k != 4)))
            d4 = group.filter(pa.array(k == 4))
            delivered = {
                (int(a), int(b)): (int(x), int(y))
                for a, b, x, y in zip(
                    d4["r1"].to_pylist(), d4["c1"].to_pylist(),
                    d4["r2"].to_pylist(), d4["c2"].to_pylist(),
                )
            }
            memo: dict = {}
            out_sbk, out_p, out_s = [], [], []
            for a, b, ask, kk in zip(
                group["r1"].to_pylist(), group["c1"].to_pylist(),
                group["r2"].to_pylist(), k,
            ):
                if kk != 5:
                    continue
                p = (int(a), int(b))
                if p not in routes:
                    continue  # invalid: the asking level falls back
                res = _resolve_super(routes, p, memo)
                s = (
                    res[1]
                    if res[0] == "SINK"
                    else delivered.get(res[1], res[2])
                )
                out_sbk.append(int(ask))
                out_p.append(p)
                out_s.append(s)
            return _k4_table(list(zip(out_sbk, out_p, out_s)))

        return l2y.groupby("sbk").map_groups(
            answer_phase, batch_format="pyarrow"
        )

    l2 = phase_b.map_batches(
        mk_add_sbk(sb), batch_format="pyarrow", batch_size=None
    ).materialize()
    ports_ds = l2.groupby("sbk").map_groups(
        mk_super_phase(sb), batch_format="pyarrow"
    )
    k4 = resolve_needs_tiered(ports_ds, sb, 1)
    l2b = l2.union(k4) if k4 is not None else l2
    _resolve_super_top = mk_resolve_super(sb)

    def final_super(group: pa.Table) -> pa.Table:
        k = group["kind"].to_numpy(zero_copy_only=False)
        routes, _ = _parse(group.filter(pa.array(k != 4)))
        d4 = group.filter(pa.array(k == 4))
        delivered = {
            (int(a), int(b)): (int(x), int(y))
            for a, b, x, y in zip(
                d4["r1"].to_pylist(), d4["c1"].to_pylist(),
                d4["r2"].to_pylist(), d4["c2"].to_pylist(),
            )
        }
        memo: dict = {}
        rr, cc, dd, bb = [], [], [], []
        for e in routes:
            res = _resolve_super_top(routes, e, memo)
            if res[0] == "SINK":
                s = res[1]
            else:
                s = delivered.get(res[1], res[2])
            # deliver e's sink to the blocks that can REFERENCE e (the
            # <=3 adjacent blocks one D8 step away) -- the consuming
            # block's stamp pass looks sinks up by its OUT target,
            # which lives in a NEIGHBOR block, never its own
            br, bc = e[0] // block, e[1] // block
            nbs = {
                ((e[0] + dr) // block, (e[1] + dc) // block)
                for dr in (-1, 0, 1) for dc in (-1, 0, 1)
            } - {(br, bc)}
            for nb in nbs:
                if nb[0] < 0 or nb[1] < 0:
                    continue
                rr.append(e[0]); cc.append(e[1])
                dd.append(-(s[0] * OFF + s[1] + 1))
                bb.append(nb[0] * 100000 + nb[1])
        return pa.table(
            {
                "row": pa.array(np.asarray(rr, np.int64)),
                "col": pa.array(np.asarray(cc, np.int64)),
                "d8": pa.array(np.asarray(dd, np.int64)),
                "bk": pa.array(np.asarray(bb, np.int64)),
            }
        )

    return l2b.groupby("sbk").map_groups(
        final_super, batch_format="pyarrow"
    )


def watershed_reference(d8_table: pa.Table) -> dict:
    """Independent sequential watershed reference: pos -> pour point
    (the LAST VALID cell of the path -- a pit/flat cell, or the cell
    from which flow exits the valid node set)."""
    rows = d8_table["row"].to_pylist()
    cols = d8_table["col"].to_pylist()
    codes = d8_table["d8"].to_pylist()
    idx = set(zip(rows, cols))
    nxt = {}
    for r, c, code in zip(rows, cols, codes):
        if code == 0:
            nxt[(r, c)] = None
        else:
            dr, dc = _D8_OFFSET[code]
            nxt[(r, c)] = (r + dr, c + dc)
    sink: dict = {}

    def resolve(p):
        chain = []
        q = p
        while q not in sink:
            chain.append(q)
            t = nxt[q]
            if t is None:
                sink[q] = q
                break
            if t not in idx:
                sink[q] = q  # pour point: last VALID cell
                break
            q = t
        for s in chain:
            sink[s] = sink[chain[-1]] if chain[-1] in sink else sink[q]
        return sink[p]

    return {p: resolve(p) for p in nxt}


def make_region_edge_kernel(threshold: float):
    """Connected-component labeling, stage 1: per tile (+1px halo),
    emit 4-connectivity edges between above-threshold pixels as
    ``(a, b)`` int64 keys (``key = row << 20 | col``; rasters wider
    than 2^20 columns shard the key).  Right/down edges only, emitted
    by the left/upper pixel's tile -- each cross-tile edge is emitted
    exactly once, by the tile owning its left/top endpoint."""

    def edges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        asm = _assemble_padded(group)
        if asm is None:
            return empty
        pad, h, w, r0, c0, _transform = asm
        above = np.zeros_like(pad, dtype=bool)
        fin = np.isfinite(pad)
        above[fin] = (pad[fin] > NODATA_THRESHOLD) & (pad[fin] >= threshold)
        core = above[1 : h + 1, 1 : w + 1]
        right = above[1 : h + 1, 2 : w + 2]
        down = above[2 : h + 2, 1 : w + 1]
        rows = (np.arange(h, dtype=np.int64) + r0)[:, None]
        cols = (np.arange(w, dtype=np.int64) + c0)[None, :]
        key = (rows << 20) | cols
        a_parts, b_parts = [], []
        er, ec = np.nonzero(core & right)
        a_parts.append(key[er, ec])
        b_parts.append(key[er, ec] + 1)
        dr, dc = np.nonzero(core & down)
        a_parts.append(key[dr, dc])
        b_parts.append(key[dr, dc] + (1 << 20))
        a = np.concatenate(a_parts)
        if len(a) == 0:
            return empty
        return pa.table(
            {"a": pa.array(a), "b": pa.array(np.concatenate(b_parts))}
        )

    return edges


def tile_region_labels(
    tiles: ray.data.Dataset,
    threshold: float,
    stride: int | None = None,
) -> pa.Table:
    """Distributed connected-component labeling of above-threshold
    raster regions (blob detection, 4-connectivity): the halo-exchange
    shuffle emits cross-tile edges, components come from the tiered
    min-label machinery (stages/dedup.py::_cluster_pairs -- Ray-join
    label propagation above the in-process cutoff), singletons keep
    their own key.  Returns ``(rep, n_pixels)`` per region, rep = min
    (row << 20 | col) member key.  The final per-rep count here is a
    driver combine over the region list (data-proportional only in
    the number of REGIONS, not pixels); route it through
    ``grouped_by_key`` for region counts beyond driver memory."""
    from .dedup import _cluster_pairs

    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    edge_parts = [
        b
        for b in halos.groupby("halo_key")
        .map_groups(make_region_edge_kernel(threshold), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    edge_parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in edge_parts
    ]
    edge_tbl = (
        pa.concat_tables([t for t in edge_parts if t.num_rows])
        if any(t.num_rows for t in edge_parts)
        else pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )

    def nodes(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            z = np.asarray(batch["values"][i].as_py(), np.float32).reshape(h, w)
            zz = z.astype(np.float64)
            above = np.isfinite(zz) & (zz > NODATA_THRESHOLD) & (zz >= threshold)
            rr, cc = np.nonzero(above)
            out.append(((rr + r0).astype(np.int64) << 20) | (cc + c0))
        flat = np.concatenate(out) if out else np.array([], np.int64)
        return pa.table({"node": pa.array(flat)})

    node_parts = [
        b
        for b in tiles.map_batches(nodes, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    node_parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in node_parts
    ]
    all_nodes = np.concatenate(
        [t["node"].to_numpy(zero_copy_only=False) for t in node_parts if t.num_rows]
    ) if any(t.num_rows for t in node_parts) else np.array([], np.int64)

    backend = "unionfind" if edge_tbl.num_rows < 100_000 else "labelprop"
    comp = _cluster_pairs(edge_tbl, backend, num_partitions=4)
    rep_of = dict(
        zip(comp["doc_id"].to_pylist(), comp["cluster_rep"].to_pylist())
    )
    reps = np.fromiter(
        (rep_of.get(int(n), int(n)) for n in all_nodes), np.int64, len(all_nodes)
    )
    out = (
        pa.table({"rep": pa.array(reps)})
        .group_by("rep")
        .aggregate([("rep", "count")])
        .rename_columns(["rep", "n_pixels"])
    )
    return out.sort_by("rep")


def focal_mode_kernel(group: pa.Table) -> pa.Table:
    """3x3 focal MODE (majority) filter -- the classic categorical-
    raster cleanup (salt-and-pepper removal).  Mode over the 9 window
    values; ties break to the SMALLEST value (deterministic, matching
    the SQL oracle's MIN-over-argmax).  Validity contract identical to
    :func:`horn_kernel` (full window above the nodata threshold)."""
    asm = _assemble_padded(group)
    if asm is None:
        return _empty_focal_mode_table()
    pad, h, w, r0, c0, _transform = asm
    stack = np.stack(
        [
            pad[r : r + h, c : c + w]
            for r in range(3)
            for c in range(3)
        ]
    )
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return _empty_focal_mode_table()
    counts = np.zeros_like(stack, dtype=np.int8)
    for i in range(9):
        for j in range(9):
            counts[i] += stack[i] == stack[j]
    best = counts.max(axis=0)
    cand = np.where(counts == best[None], stack, np.inf)
    mode = cand.min(axis=0)
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "focal_mode": pa.array(mode[rr, cc]),
        }
    )


def _empty_focal_mode_table() -> pa.Table:
    return pa.table(
        {
            "row": pa.array([], pa.int64()),
            "col": pa.array([], pa.int64()),
            "focal_mode": pa.array([], pa.float64()),
        }
    )


def tile_focal_mode(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """3x3 focal mode over a tile Dataset via the same halo-exchange
    shuffle as :func:`tile_slope`."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(
        focal_mode_kernel, batch_format="pyarrow"
    )


def retile(
    tiles: ray.data.Dataset,
    new_side: int,
    grid_h: int,
    grid_w: int,
) -> ray.data.Dataset:
    """Re-tile a TILE_SCHEMA Dataset onto a new tile lattice (the
    block-storage re-layout primitive: align tiles to a different
    partition side before a focal / join stage).

    Shape: ``map_batches`` slices each source tile into the fragments
    that intersect the target lattice (zero-copy numpy views, emitted
    with target offsets), one ``groupby(target)`` shuffle co-locates
    fragments, and the assemble kernel stitches the target tile --
    nodata-filled where the source tiling left gaps, ragged edge
    tiles sized to the grid.  Shuffle volume = the raster itself,
    moved exactly once (each pixel appears in exactly one fragment).
    """

    def fragment(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "tgt_key": [], "src": [], "band": [], "tgt_r0": [],
            "tgt_c0": [], "fr_r0": [], "fr_c0": [], "fr_h": [],
            "fr_w": [], "transform": [], "crs": [], "nodata": [],
            "values": [],
        }
        for i in range(batch.num_rows):
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            vals = np.asarray(
                batch["values"][i].as_py(), np.float32
            ).reshape(h, w)
            band = int(batch["band"][i].as_py())
            src = batch["src"][i].as_py()
            tr = batch["transform"][i].as_py()
            crs = batch["crs"][i].as_py()
            nod = float(batch["nodata"][i].as_py())
            for tr0 in range(
                (r0 // new_side) * new_side, r0 + h, new_side
            ):
                for tc0 in range(
                    (c0 // new_side) * new_side, c0 + w, new_side
                ):
                    rr0 = max(r0, tr0)
                    cc0 = max(c0, tc0)
                    rr1 = min(r0 + h, tr0 + new_side, grid_h)
                    cc1 = min(c0 + w, tc0 + new_side, grid_w)
                    if rr1 <= rr0 or cc1 <= cc0:
                        continue
                    out["tgt_key"].append(
                        f"{src}|{band}|{tr0}|{tc0}"
                    )
                    out["src"].append(src)
                    out["band"].append(band)
                    out["tgt_r0"].append(tr0)
                    out["tgt_c0"].append(tc0)
                    out["fr_r0"].append(rr0)
                    out["fr_c0"].append(cc0)
                    out["fr_h"].append(rr1 - rr0)
                    out["fr_w"].append(cc1 - cc0)
                    out["transform"].append(tr)
                    out["crs"].append(crs)
                    out["nodata"].append(nod)
                    out["values"].append(
                        vals[rr0 - r0 : rr1 - r0, cc0 - c0 : cc1 - c0]
                        .ravel().tolist()
                    )
        return pa.table(
            {
                "tgt_key": pa.array(out["tgt_key"]),
                "src": pa.array(out["src"]),
                "band": pa.array(out["band"], pa.int32()),
                "tgt_r0": pa.array(out["tgt_r0"], pa.int32()),
                "tgt_c0": pa.array(out["tgt_c0"], pa.int32()),
                "fr_r0": pa.array(out["fr_r0"], pa.int32()),
                "fr_c0": pa.array(out["fr_c0"], pa.int32()),
                "fr_h": pa.array(out["fr_h"], pa.int32()),
                "fr_w": pa.array(out["fr_w"], pa.int32()),
                "transform": pa.array(
                    out["transform"], pa.list_(pa.float64(), 6)
                ),
                "crs": pa.array(out["crs"]),
                "nodata": pa.array(out["nodata"], pa.float64()),
                "values": pa.array(
                    out["values"], pa.list_(pa.float32())
                ),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        tr0 = int(group["tgt_r0"][0].as_py())
        tc0 = int(group["tgt_c0"][0].as_py())
        nod = float(group["nodata"][0].as_py())
        th = min(new_side, grid_h - tr0)
        tw = min(new_side, grid_w - tc0)
        tile = np.full((th, tw), np.float32(nod), np.float32)
        for i in range(group.num_rows):
            fr0 = int(group["fr_r0"][i].as_py())
            fc0 = int(group["fr_c0"][i].as_py())
            fh = int(group["fr_h"][i].as_py())
            fw = int(group["fr_w"][i].as_py())
            frag = np.asarray(
                group["values"][i].as_py(), np.float32
            ).reshape(fh, fw)
            tile[fr0 - tr0 : fr0 - tr0 + fh, fc0 - tc0 : fc0 - tc0 + fw] = frag
        src = group["src"][0].as_py()
        return pa.table(
            {
                "tile_id": pa.array([f"{src}_{tr0}_{tc0}"]),
                "src": pa.array([src]),
                "band": pa.array(
                    [int(group["band"][0].as_py())], pa.int32()
                ),
                "row_off": pa.array([tr0], pa.int32()),
                "col_off": pa.array([tc0], pa.int32()),
                "height": pa.array([th], pa.int32()),
                "width": pa.array([tw], pa.int32()),
                "transform": group["transform"].take([0]),
                "crs": pa.array([group["crs"][0].as_py()]),
                "nodata": pa.array([nod], pa.float64()),
                "values": pa.array(
                    [tile.ravel().tolist()], pa.list_(pa.float32())
                ),
            }
        )

    return tiles.map_batches(
        fragment, batch_format="pyarrow", batch_size=None
    ).groupby("tgt_key").map_groups(assemble, batch_format="pyarrow")


def focal_median_kernel(group: pa.Table) -> pa.Table:
    """3x3 focal MEDIAN (the despeckle / salt-and-pepper filter for
    continuous rasters): the 5th order statistic of the 9 window
    values -- pure element selection, so Python and SQL
    (``quantile_disc(v, 0.5)``) agree bit-for-bit with no float
    arithmetic.  Validity contract identical to :func:`horn_kernel`
    (full window above the nodata threshold)."""
    asm = _assemble_padded(group)
    if asm is None:
        return _empty_focal_median_table()
    pad, h, w, r0, c0, _transform = asm
    stack = np.stack(
        [
            pad[r : r + h, c : c + w]
            for r in range(3)
            for c in range(3)
        ]
    )
    valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
    if not valid.any():
        return _empty_focal_median_table()
    med = np.sort(stack, axis=0)[4]
    rr, cc = np.nonzero(valid)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "focal_median": pa.array(med[rr, cc]),
        }
    )


def _empty_focal_median_table() -> pa.Table:
    return pa.table(
        {
            "row": pa.array([], pa.int64()),
            "col": pa.array([], pa.int64()),
            "focal_median": pa.array([], pa.float64()),
        }
    )


def tile_focal_median(tiles: ray.data.Dataset, stride: int | None = None) -> ray.data.Dataset:
    """3x3 focal median over a tile Dataset via the same halo-exchange
    shuffle as :func:`tile_slope`."""
    halos = tiles.map_batches(
        make_emit_halos(stride, stride),
        batch_format="pyarrow", batch_size=None,
    )
    return halos.groupby("halo_key").map_groups(
        focal_median_kernel, batch_format="pyarrow"
    )


def band_math_ndi(
    tiles: ray.data.Dataset, band_a: int = 1, band_b: int = 2
) -> ray.data.Dataset:
    """Normalized-difference band math, ``(a - b) / (a + b)`` (the
    NDVI/NDWI family): a ``groupby`` on the tile ORIGIN co-locates all
    bands of one tile (the band-align join -- bands arrive as separate
    rows in the tile table), the per-group kernel stacks the two
    requested band planes and evaluates vectorized.  Pixels valid only
    where BOTH bands pass the nodata threshold; zero denominators emit
    0 (guarded identically in the SQL oracle).  Shuffle volume = the
    tile table itself, grouped by (src, row_off, col_off)."""

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "ndi": pa.array([], pa.float64()),
            }
        )
        bands = group["band"].to_numpy(zero_copy_only=False)
        ia = np.flatnonzero(bands == band_a)
        ib = np.flatnonzero(bands == band_b)
        if len(ia) == 0 or len(ib) == 0:
            return empty
        i, j = int(ia[0]), int(ib[0])
        h = int(group["height"][i].as_py())
        w = int(group["width"][i].as_py())
        r0 = int(group["row_off"][i].as_py())
        c0 = int(group["col_off"][i].as_py())
        a = (
            np.asarray(group["values"][i].as_py(), np.float32)
            .reshape(h, w).astype(np.float64)
        )
        b = (
            np.asarray(group["values"][j].as_py(), np.float32)
            .reshape(h, w).astype(np.float64)
        )
        valid = (a > NODATA_THRESHOLD) & (b > NODATA_THRESHOLD)
        if not valid.any():
            return empty
        denom = a + b
        with np.errstate(divide="ignore", invalid="ignore"):
            ndi = (a - b) / denom
        ndi = np.where(denom == 0.0, 0.0, ndi)
        rr, cc = np.nonzero(valid)
        return pa.table(
            {
                "row": pa.array((rr + r0).astype(np.int64)),
                "col": pa.array((cc + c0).astype(np.int64)),
                "ndi": pa.array(ndi[rr, cc]),
            }
        )

    keyed = tiles.map_batches(
        lambda t: t.append_column(
            "origin_key",
            pa.array(
                [
                    f"{s}|{r}|{c}"
                    for s, r, c in zip(
                        t["src"].to_pylist(),
                        t["row_off"].to_pylist(),
                        t["col_off"].to_pylist(),
                    )
                ]
            ),
        ),
        batch_format="pyarrow", batch_size=None,
    )
    return keyed.groupby("origin_key").map_groups(
        kernel, batch_format="pyarrow"
    )


_COST_INF = np.int64(2**62)


def cost_distance_rounds(
    tiles: ray.data.Dataset,
    seed_threshold: float,
    n_rounds: int = 8,
    stride: int | None = None,
) -> ray.data.Dataset:
    """Cost-distance propagation over the raster (GIS cost surface /
    ArcGIS CostDistance): accumulated cost of the cheapest 4-connected
    path from any SEED pixel (``z >= seed_threshold``, cost 0), where
    entering a pixel costs its integer value ``round(z * 10)``.

    Runs as ``n_rounds`` SYNCHRONOUS relaxation rounds, each one a
    tile halo exchange: every tile swaps its 1-pixel cost boundary
    with its neighbors, then relaxes ``cost = min(cost, neighbor +
    entry)`` vectorized -- the iterated-halo shape (Bellman-Ford on
    the grid; a cost front advances <= 1 pixel per round, so
    ``n_rounds`` bounds the propagation radius).  All arithmetic is
    int64 -- results are exact and independent of tiling.  Invalid
    pixels (below the nodata threshold) are barriers.

    Returns ``(row, col, cost)`` for pixels reached within the round
    budget.  Costs ride the halo machinery as float32 'values'
    losslessly (integer costs < 2^24 at these value scales; larger
    cost ranges would carry an int64 column instead)."""

    def init_state(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            z = (
                np.asarray(batch["values"][i].as_py(), np.float32)
                .reshape(h, w).astype(np.float64)
            )
            valid = z > NODATA_THRESHOLD
            entry = np.where(valid, np.rint(z * 10.0), -1.0)
            cost = np.where(valid & (z >= seed_threshold), 0.0, np.inf)
            t = batch.slice(i, 1)
            for band, plane in ((1, entry), (2, cost)):
                out.append(
                    pa.table(
                        {
                            "src": t["src"],
                            "band": pa.array([band], pa.int32()),
                            "row_off": t["row_off"],
                            "col_off": t["col_off"],
                            "height": t["height"],
                            "width": t["width"],
                            "transform": t["transform"],
                            "values": pa.array(
                                [plane.astype(np.float32).ravel().tolist()],
                                pa.list_(pa.float32()),
                            ),
                        }
                    )
                )
        return pa.concat_tables(out)

    _STATE_SCHEMA = pa.schema(
        [
            ("src", pa.string()),
            ("band", pa.int32()),
            ("row_off", pa.int32()),
            ("col_off", pa.int32()),
            ("height", pa.int32()),
            ("width", pa.int32()),
            ("transform", pa.list_(pa.float64(), 6)),
            ("values", pa.list_(pa.float32())),
        ]
    )

    def _empty_state() -> pa.Table:
        return _STATE_SCHEMA.empty_table()

    def relax(group: pa.Table) -> pa.Table:
        # rows: band-1 core (entry costs, rel 0,0 only) + band-2 core
        # and halo strips (current costs)
        bands = group["band"].to_numpy(zero_copy_only=False)
        rel_r = group["rel_r"].to_numpy(zero_copy_only=False)
        rel_c = group["rel_c"].to_numpy(zero_copy_only=False)
        entry_idx = np.flatnonzero((bands == 1) & (rel_r == 0) & (rel_c == 0))
        if len(entry_idx) == 0:
            return _empty_state()
        cost_rows = np.flatnonzero(bands == 2)
        asm = _assemble_padded(group.take(pa.array(cost_rows)))
        if asm is None:
            return _empty_state()
        pad, h, w, r0, c0, transform = asm
        ei = int(entry_idx[0])
        entry = (
            np.asarray(group["values"][ei].as_py(), np.float32)
            .reshape(h, w).astype(np.float64)
        )
        up = pad[0:h, 1 : w + 1]
        down = pad[2 : h + 2, 1 : w + 1]
        left = pad[1 : h + 1, 0:w]
        right = pad[1 : h + 1, 2 : w + 2]
        cur = pad[1 : h + 1, 1 : w + 1].copy()
        best_nb = np.fmin(np.fmin(up, down), np.fmin(left, right))
        cand = best_nb + entry
        relaxable = entry >= 0.0  # valid pixels only
        new = np.where(relaxable & (cand < cur), cand, cur)
        src_name = group["halo_key"][ei].as_py().split("|")[0]
        return pa.table(
            {
                "src": pa.array([src_name] * 2),
                "band": pa.array([1, 2], pa.int32()),
                "row_off": pa.array([r0] * 2, pa.int32()),
                "col_off": pa.array([c0] * 2, pa.int32()),
                "height": pa.array([h] * 2, pa.int32()),
                "width": pa.array([w] * 2, pa.int32()),
                "transform": pa.array([transform] * 2, pa.list_(pa.float64(), 6)),
                "values": pa.array(
                    [
                        entry.astype(np.float32).ravel().tolist(),
                        new.astype(np.float32).ravel().tolist(),
                    ],
                    pa.list_(pa.float32()),
                ),
            },
            schema=_STATE_SCHEMA,
        )

    # state columns match make_emit_halos input (minus tile_id/crs/nodata)
    state = tiles.map_batches(init_state, batch_format="pyarrow", batch_size=None)
    for _ in range(n_rounds):
        halos = state.map_batches(
            _cost_emit(stride), batch_format="pyarrow", batch_size=None
        )
        state = halos.groupby("halo_key").map_groups(relax, batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        rows, cols, costs = [], [], []
        for i in range(batch.num_rows):
            if batch["band"][i].as_py() != 2:
                continue
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            cost = (
                np.asarray(batch["values"][i].as_py(), np.float32)
                .reshape(h, w).astype(np.float64)
            )
            rr, cc = np.nonzero(np.isfinite(cost))
            rows.append((rr + r0).astype(np.int64))
            cols.append((cc + c0).astype(np.int64))
            costs.append(cost[rr, cc].astype(np.int64))
        if not rows:
            return pa.table(
                {
                    "row": pa.array([], pa.int64()),
                    "col": pa.array([], pa.int64()),
                    "cost": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows)),
                "col": pa.array(np.concatenate(cols)),
                "cost": pa.array(np.concatenate(costs)),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _cost_emit(stride: int | None):
    """Halo emit for the cost rounds: band-2 (cost) rows emit core +
    strips through make_emit_halos; band-1 (entry) rows pass through
    as core-only rows in the same keyed layout."""
    base = make_emit_halos(stride, stride)

    def emit(batch: pa.Table) -> pa.Table:
        bands = batch["band"].to_numpy(zero_copy_only=False)
        cost_part = batch.filter(pa.array(bands == 2))
        entry_part = batch.filter(pa.array(bands == 1))
        halos = base(cost_part)
        # band column is dropped by make_emit_halos output; re-add
        halos = halos.append_column(
            "band", pa.array(np.full(halos.num_rows, 2, np.int32))
        )
        ent = base(entry_part)
        # entry rows: keep only their own core (rel 0,0)
        rel_ok = (
            (np.asarray(ent["rel_r"]) == 0) & (np.asarray(ent["rel_c"]) == 0)
        )
        ent = ent.filter(pa.array(rel_ok))
        # halo_key embeds the band -- rewrite entry keys to band 2 so
        # the entry core lands in the SAME group as its cost rows
        keys = []
        for k in ent["halo_key"].to_pylist():
            parts = k.split("|")
            parts[1] = "2"
            keys.append("|".join(parts))
        ent = ent.set_column(
            ent.column_names.index("halo_key"), "halo_key", pa.array(keys)
        )
        ent = ent.append_column(
            "band", pa.array(np.full(ent.num_rows, 1, np.int32))
        )
        return pa.concat_tables([halos, ent])

    return emit


def line_of_sight(
    z: np.ndarray,
    valid: np.ndarray,
    a_lon: float, a_lat: float, b_lon: float, b_lat: float,
    transform: list[float],
    n_steps: int = 64,
    clearance: float = 2.0,
):
    """Intervisibility between two points over a DEM (viewshed-lite):
    sample the terrain at ``n_steps`` fixed fractions along the sight
    line (nearest-pixel lookup, ``t = (i+1)/(n_steps+1)``), blocked
    where a valid sample strictly exceeds the interpolated sight-line
    height (endpoint elevations + ``clearance``).  Invalid endpoint
    pixels read as elevation 0 (documented fixture rule).  Pure
    comparisons after SQL-identical arithmetic -- no ray-marching
    state.  Returns (visible: bool, n_blocked: int)."""
    a = float(transform[0])
    c0 = float(transform[2])
    f0 = float(transform[5])
    h, w = z.shape

    def zval(lon: float, lat: float) -> float:
        col = int(np.floor((lon - c0) / a))
        row = int(np.floor((f0 - lat) / a))
        if 0 <= row < h and 0 <= col < w and valid[row, col]:
            return float(z[row, col])
        return 0.0

    za = zval(a_lon, a_lat) + clearance
    zb = zval(b_lon, b_lat) + clearance
    i = np.arange(n_steps, dtype=np.float64)
    t = (i + 1.0) / (n_steps + 1.0)
    lon_t = a_lon + t * (b_lon - a_lon)
    lat_t = a_lat + t * (b_lat - a_lat)
    cols = np.floor((lon_t - c0) / a).astype(np.int64)
    rows = np.floor((f0 - lat_t) / a).astype(np.int64)
    inb = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    zs = np.zeros(n_steps)
    ok = np.zeros(n_steps, dtype=bool)
    zs[inb] = z[rows[inb], cols[inb]]
    ok[inb] = valid[rows[inb], cols[inb]]
    height = za + t * (zb - za)
    blocked = ok & (zs > height)
    return bool(~blocked.any()), int(blocked.sum())


def binom5_kernel(group: pa.Table) -> pa.Table:
    """One tile + its 2-px halo strips -> 5x5 binomial (Gaussian
    approximation) blur: b = sum [1,4,6,4,1] x [1,4,6,4,1] * z10 over
    the window, defined only where all 25 cells are valid (equivalent
    to two [1,2,1]^2 passes -- convolution composes).  Deci-scaled
    input keeps the accumulation exact integer (output = value x 10 x
    256)."""
    asm = _assemble_padded(group, halo=2)
    if asm is None:
        return pa.table(
            {
                "row": pa.array([], pa.int64()),
                "col": pa.array([], pa.int64()),
                "b2560": pa.array([], pa.int64()),
            }
        )
    pad, h, w, r0, c0, _transform = asm
    valid = np.isfinite(pad) & (pad > NODATA_THRESHOLD)
    z10 = np.zeros_like(pad, np.int64)
    z10[valid] = np.rint(pad[valid] * 10.0).astype(np.int64)
    wt = (1, 4, 6, 4, 1)
    acc = np.zeros((h, w), np.int64)
    nok = np.zeros((h, w), np.int64)
    for du in range(5):
        for dv in range(5):
            win_z = z10[du : du + h, dv : dv + w]
            win_v = valid[du : du + h, dv : dv + w]
            acc += wt[du] * wt[dv] * win_z
            nok += win_v
    ok = nok == 25
    rr, cc = np.nonzero(ok)
    return pa.table(
        {
            "row": pa.array((rr + r0).astype(np.int64)),
            "col": pa.array((cc + c0).astype(np.int64)),
            "b2560": pa.array(acc[ok]),
        }
    )


def tile_binomial_blur(
    tiles: ray.data.Dataset, stride: int | None = None
) -> ray.data.Dataset:
    """Distributed 5x5 binomial blur: one 2-px halo exchange (the
    width-2 instantiation of the focal machinery), then a per-tile
    integer convolution kernel.  Shuffle volume = 2 x tile perimeter
    per tile."""
    return tiles.map_batches(
        make_emit_halos(stride, stride, halo=2),
        batch_format="pyarrow", batch_size=None,
    ).groupby("halo_key").map_groups(binom5_kernel, batch_format="pyarrow")
