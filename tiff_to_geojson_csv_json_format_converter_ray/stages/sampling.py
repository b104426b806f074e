"""Deterministic stride (systematic) sampling -- reference P1/P2.

The reference samples ``np.arange(0, total, sample_rate)`` of the
row-major-flattened raster with ``sample_rate = total // max_points``
(doesSamples.py:73-89).  The engine reproduces the exact same index
set under ANY partitioning by keying on the point table's ``pix``
column (the flat pixel index): a pixel is kept iff ``pix % rate == 0``,
which equals membership in the reference's arange for every raster.
NOT ``ds.random_sample`` -- reference sampling is deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sample_rate_for(total_points: int, max_points: int = 100_000) -> int:
    """doesSamples.py:74-77 semantics (integer division, min rate 1)."""
    if total_points > max_points:
        return total_points // max_points
    return 1


class StrideSampler:
    """Keep rows whose ``pix % rate == 0``; ``rates`` maps src -> rate
    (computed driver-side from total pixel counts, a tiny aggregate)."""

    def __init__(self, rates: dict[str, int] | int, pix_col: str = "pix",
                 src_col: str = "src"):
        self.rates = rates
        self.pix_col = pix_col
        self.src_col = src_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix = batch[self.pix_col].to_numpy(zero_copy_only=False)
        if isinstance(self.rates, int):
            mask = pix % self.rates == 0
        else:
            srcs = np.asarray(batch[self.src_col].to_pylist(), dtype=object)
            rates = np.array(
                [self.rates.get(s, 1) for s in srcs], dtype=np.int64
            )
            mask = pix % rates == 0
        return batch.filter(pa.array(mask))


def secondary_stride_indices(n: int, max_points: int = 10_000) -> np.ndarray:
    """The GeoJSON second-level cap (doesSamples.py:145-150): stride over
    the already-sampled sequence."""
    if n > max_points:
        rate = n // max_points
        return np.arange(0, n, rate)
    return np.arange(n)
