"""Row-level transforms: validity masks (T6/T7/T13), uint8 rescale (T12),
coordinate-swap repair (T10) -- vectorized map_batches callables.

Mask strategies are the reference's alternatives made into an explicit
config enum (SURVEY T7) instead of scattered copies:

- ``threshold``   z > -1e30                 (willOnlyStoreValidPoints.py:66)
- ``ne_nodata``   z != nodata               (test.py:48, analyze at completePixleOutput.py:230)
- ``finite``      isfinite(z)               (get_raster_stats_direct.py:157)
- ``strict``      (z != nodata) & isfinite & (z != 0)  (get_raster_stats_enhanced.py:236-240)
- ``permissive_uint8``  z > 0               (test2.py:1424-1439 WMS path)

``zeros_are_nodata`` resolves the reference's zero-semantics check
(test2.py:1371-1414): when nodata == 0, all-zero data is invalid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASK_STRATEGIES = ("threshold", "ne_nodata", "finite", "strict", "permissive_uint8")


def validity_mask(
    z: np.ndarray,
    strategy: str = "threshold",
    nodata: float | None = None,
) -> np.ndarray:
    if strategy == "threshold":
        return z > -1e30
    if strategy == "ne_nodata":
        if nodata is None:
            return ~np.isnan(z)
        return z != nodata
    if strategy == "finite":
        return np.isfinite(z)
    if strategy == "strict":
        m = np.isfinite(z) & (z != 0)
        if nodata is not None:
            m &= z != nodata
        return m
    if strategy == "permissive_uint8":
        return z > 0
    raise ValueError(f"unknown mask strategy: {strategy}")


class ValidityFilter:
    """Vectorized NoData filter over the point table's ``z`` column."""

    def __init__(self, strategy: str = "threshold", nodata: float | None = None,
                 z_col: str = "z"):
        if strategy not in MASK_STRATEGIES:
            raise ValueError(f"unknown mask strategy: {strategy}")
        self.strategy = strategy
        self.nodata = nodata
        self.z_col = z_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        z = batch[self.z_col].to_numpy(zero_copy_only=False)
        if (
            self.nodata is None
            and self.strategy in ("ne_nodata", "strict")
            and "nodata" in batch.column_names
        ):
            # per-row nodata carried from the tile metadata
            nd = batch["nodata"].to_numpy(zero_copy_only=False)
            if self.strategy == "ne_nodata":
                mask = z != nd
            else:
                mask = np.isfinite(z) & (z != 0) & (z != nd)
            return batch.filter(pa.array(mask))
        return batch.filter(pa.array(validity_mask(z, self.strategy, self.nodata)))


def rescale_uint8(
    z: np.ndarray, orig_min: float, orig_max: float
) -> np.ndarray:
    """Linear rescale of WMS-degraded uint8 data back to the original
    range (test2.py:1482-1484): v/255*(max-min)+min, in float64."""
    z = z.astype(np.float64)
    return (z / 255.0) * (orig_max - orig_min) + orig_min


class Uint8Rescale:
    def __init__(self, orig_min: float, orig_max: float, z_col: str = "z"):
        self.orig_min = orig_min
        self.orig_max = orig_max
        self.z_col = z_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        z = batch[self.z_col].to_numpy(zero_copy_only=False)
        out = rescale_uint8(z, self.orig_min, self.orig_max)
        i = batch.column_names.index(self.z_col)
        return batch.set_column(i, self.z_col, pa.array(out))


def detect_wms_degraded(dtype: str, nodata: float | None) -> dict:
    """The reference's WMS-degradation heuristic (test2.py:1024-1060):
    uint8 data with nodata 0 came from a styled WMS render and 'may be
    scaled 0-255'; pairs with Uint8Rescale when the original range is
    known."""
    degraded = str(dtype) == "uint8" and (nodata == 0.0 or nodata is None)
    return {
        "wms_degraded": degraded,
        "warning": "Values may be WMS-scaled (0-255)" if degraded else None,
        "suggested_mask": "permissive_uint8" if degraded else "ne_nodata",
    }


def looks_like_binary_mask(values: np.ndarray) -> bool:
    """Binary-mask diagnostic (get_raster_stats_enhanced.py:221-234):
    <=3 unique values, all within {0, 255} (+nodata)."""
    u = np.unique(values[np.isfinite(values)])
    return len(u) <= 3 and bool(np.isin(u, [0.0, 255.0]).all())


def looks_like_swapped(
    minx: float, miny: float, maxx: float, maxy: float,
    lat_range: tuple[float, float] = (20.0, 35.0),
    lon_range: tuple[float, float] = (70.0, 85.0),
) -> bool:
    """The reference's coordinate-swap heuristic (test2.py:1071-1156):
    bounds whose x looks like a latitude and y like a longitude."""
    x_like_lat = lat_range[0] <= minx <= lat_range[1] and lat_range[0] <= maxx <= lat_range[1]
    y_like_lon = lon_range[0] <= miny <= lon_range[1] and lon_range[0] <= maxy <= lon_range[1]
    return x_like_lat and y_like_lon


class CoordSwapRepair:
    """Optional data-repair normalizer: swap lon/lat columns when the
    batch bounds trip the swapped-axes heuristic. Off by default in
    pipelines (documented heuristic, SURVEY T10)."""

    def __init__(self, lon_col: str = "lon", lat_col: str = "lat"):
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        if len(lon) and looks_like_swapped(
            float(np.nanmin(lon)), float(np.nanmin(lat)),
            float(np.nanmax(lon)), float(np.nanmax(lat)),
        ):
            i_lon = batch.column_names.index(self.lon_col)
            i_lat = batch.column_names.index(self.lat_col)
            batch = batch.set_column(i_lon, self.lon_col, pa.array(lat))
            batch = batch.set_column(i_lat, self.lat_col, pa.array(lon))
        return batch
