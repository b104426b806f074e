"""True spherical S2 cell ids, pure NumPy (ROADMAP gap "true spherical
S2 cells").

Implements the public S2 cell-id scheme (s2geometry.io; Hilbert-curve
cell ids on the 6 faces of the quadratic-projected cube):

  lat/lng -> unit xyz -> dominant face + (u, v) -> quadratic st ->
  leaf (i, j) at 2^30 resolution -> 64-bit id = face(3 bits) ++
  Hilbert position (interleaved via 4-bit lookup tables) ++ sentinel
  bit; a level-L cell id keeps 2L position bits and sets the trailing
  sentinel at bit 2*(30-L).

Everything is vectorized: the Hilbert walk consumes (i, j) 4 bits per
step through precomputed 1024-entry lookup tables (the exact tables of
the reference C++ implementation, regenerated here from the Hilbert
ordering recursion), so a batch of N points costs 8 table gathers.

The engine's FROZEN flat cell grid (functions/cells.py) remains the
default partitioning key (SQL-expressible for oracles); S2 ids are the
spherical alternative for true-geodesic locality.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4

# Hilbert sub-cell orderings: for each of 4 orientations, the (i,j)
# traversal order and orientation deltas (public S2 constants)
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02
_POS_TO_ORIENTATION = np.array(
    [_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64
)


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """(ij << 2 | orientation) -> (pos << 2 | orientation) and inverse,
    for 4-bit (16x16) blocks -- the standard S2 lookup-table build."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init_cell(level: int, i: int, j: int, orig_o: int, o: int, pos: int):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_o] = (pos << 2) + o
            lookup_ij[(pos << 2) + orig_o] = (ij << 2) + o
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[o]
        for index in range(4):
            ij = int(r[index])
            init_cell(
                level, i + (ij >> 1), j + (ij & 1), orig_o,
                o ^ int(_POS_TO_ORIENTATION[index]), pos + index,
            )

    for orientation in range(4):
        init_cell(0, 0, 0, orientation, orientation, 0)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def _xyz_from_lonlat(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(np.asarray(lat, np.float64))
    theta = np.radians(np.asarray(lon, np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Dominant-axis face in [0, 5] and the (u, v) face coordinates."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2)
    ).astype(np.int64)
    face = face + np.where(
        np.choose(face, [x, y, z]) < 0, 3, 0
    )
    # u/v per face (S2 face coordinate frames)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn, wfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),       # +x
            (lambda: -x / y, lambda: z / y, None),      # +y
            (lambda: -x / z, lambda: -y / z, None),     # +z
            (lambda: z / x, lambda: y / x, None),       # -x
            (lambda: z / y, lambda: -x / y, None),      # -y
            (lambda: -y / z, lambda: -x / z, None),     # -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ufn()[m]
                v[m] = vfn()[m]
    return face, u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (area-uniformizing)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both arms
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _ij_from_st(st: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(st * float(1 << MAX_LEVEL)).astype(np.int64),
        0,
        (1 << MAX_LEVEL) - 1,
    )


def s2_cell_of(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Vectorized (lon, lat) degrees -> int64 S2 cell id at ``level``.

    Bit layout identical to the reference library: 3 face bits, 2*30
    Hilbert position bits, then the level-L sentinel (id truncated to
    2L position bits, trailing bit set)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"S2 level out of range: {level}")
    lon = np.atleast_1d(np.asarray(lon, np.float64))
    lat = np.atleast_1d(np.asarray(lat, np.float64))
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    i = _ij_from_st(_st_from_uv(u))
    j = _ij_from_st(_st_from_uv(v))

    # Hilbert walk: 8 steps of 4 bits, starting orientation from face
    n = np.zeros(len(lon), dtype=np.uint64)
    bits = (face & _SWAP_MASK).astype(np.int64)
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n = (n << np.uint64(2 * _LOOKUP_BITS)) | (bits >> 2).astype(np.uint64)
        bits &= _SWAP_MASK | _INVERT_MASK

    cell_id = (face.astype(np.uint64) << np.uint64(61)) | (n << np.uint64(1)) | np.uint64(1)
    # truncate to the requested level: keep 3 + 2L bits, set sentinel
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        cell_id = (cell_id & ~(lsb - np.uint64(1))) | lsb
    return cell_id.view(np.int64)


def s2_level_of(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    c = np.asarray(cell, np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    out = MAX_LEVEL - (
        np.round(np.log2(lsb.astype(np.float64))).astype(np.int64) // 2
    )
    return out


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor id at ``level`` (standard lsb widening)."""
    c = np.asarray(cell, np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((c & ~(lsb - np.uint64(1))) | lsb).view(np.int64)
