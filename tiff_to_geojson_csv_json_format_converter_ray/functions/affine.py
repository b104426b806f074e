"""6-coefficient affine transform (GDAL/rasterio convention), pure NumPy.

Semantics of ``rasterio.transform.xy(transform, rows, cols)`` at pixel
centers (reference: completePixleOutput.py:46): world coordinates of the
*center* of pixel (row, col) under affine ``(a, b, c, d, e, f)``:

    x = c + a * (col + 0.5) + b * (row + 0.5)
    y = f + d * (col + 0.5) + e * (row + 0.5)

``a`` is pixel width, ``e`` is (negative) pixel height, ``c,f`` the
upper-left corner, ``b,d`` the rotation terms (0 for axis-aligned grids).
"""

from __future__ import annotations

import numpy as np


def pixel_to_world(
    transform: np.ndarray | list[float],
    rows: np.ndarray,
    cols: np.ndarray,
    offset: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized pixel-center -> world coordinates."""
    a, b, c, d, e, f = (float(t) for t in transform)
    col_c = cols + offset
    row_c = rows + offset
    x = c + a * col_c + b * row_c
    y = f + d * col_c + e * row_c
    return x, y


def world_to_pixel(
    transform: np.ndarray | list[float],
    xs: np.ndarray,
    ys: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse affine: world -> fractional (row, col) pixel indices.

    Inverse of :func:`pixel_to_world` with offset 0 (pixel edges);
    ``floor`` of the result is the containing pixel.
    """
    a, b, c, d, e, f = (float(t) for t in transform)
    det = a * e - b * d
    if det == 0.0:
        raise ValueError("singular affine transform")
    dx = np.asarray(xs, dtype=np.float64) - c
    dy = np.asarray(ys, dtype=np.float64) - f
    col = (e * dx - b * dy) / det
    row = (a * dy - d * dx) / det
    return row, col


def grid_bounds(
    transform: np.ndarray | list[float], height: int, width: int
) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of the full grid footprint (pixel edges)."""
    rows = np.array([0.0, 0.0, float(height), float(height)])
    cols = np.array([0.0, float(width), 0.0, float(width)])
    x, y = pixel_to_world(transform, rows, cols, offset=0.0)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def bilinear_weights(
    transform: np.ndarray | list[float],
    lon: np.ndarray,
    lat: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bilinear sampling stencil: for each world point, the 4
    surrounding pixel-CENTER (rows, cols, weights), each (n, 4);
    weights sum to 1.  Axis-aligned transforms only (b = d = 0) --
    the standard raster point-sampling upgrade over nearest-neighbor
    (the reference's getElevation reads the nearest pixel)."""
    a, b, c, d, e, f = (float(t) for t in transform)
    if b != 0.0 or d != 0.0:
        raise ValueError("bilinear_weights requires an axis-aligned transform")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    fc = (lon - c) / a - 0.5
    fr = (lat - f) / e - 0.5
    c0 = np.floor(fc)
    r0 = np.floor(fr)
    wx = fc - c0
    wy = fr - r0
    rows = np.stack([r0, r0, r0 + 1, r0 + 1], axis=1).astype(np.int64)
    cols = np.stack([c0, c0 + 1, c0, c0 + 1], axis=1).astype(np.int64)
    w = np.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=1
    )
    return rows, cols, w
