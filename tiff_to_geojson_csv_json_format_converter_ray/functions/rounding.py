"""Exact DuckDB-ROUND-compatible rounding kernels.

DuckDB's ``ROUND(x, d)`` on DOUBLE computes ``std::round(x * 10^d) /
10^d`` -- C ``round()``: nearest integer, ties away from zero.  The
naive ``floor(x + 0.5)`` emulation is WRONG on values whose ``x + 0.5``
crosses an integer boundary through float rounding (e.g.
``x = 0.49999999999999994`` gives ``floor(x+0.5) = 1`` but
``round(x) = 0``) -- this was the round-2 ``pivot_events`` oracle
mismatch.  The exact emulation below is ``np.rint`` (correct nearest
for every non-tie) with the exactly-representable ``.5`` ties redone
away from zero; verified bit-identical to DuckDB over 630k adversarial
values including every ``k + 0.5`` edge and its neighbouring ulps.

Vectorized numpy throughout -- safe for ``map_batches`` hot paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["round_half_away", "scaled_int", "round_like_sql"]


def round_half_away(x) -> np.ndarray:
    """``std::round`` emulation: nearest integer (as float64), exact
    ``.5`` ties away from zero.  NaN/inf pass through."""
    x = np.asarray(x, dtype=np.float64)
    r = np.rint(x)  # correctly-rounded nearest; ties-to-even
    t = np.trunc(x)
    tie = np.abs(x - t) == 0.5  # only exactly-representable halves
    if tie.any():
        r = np.where(tie, t + np.copysign(1.0, x), r)
    return r


def scaled_int(values, scale: float = 100.0) -> np.ndarray:
    """``CAST(ROUND(x * scale, 0) AS BIGINT)`` -- e.g. money cents
    (``scale=100``).  Returns int64."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    x = np.asarray(values, dtype=np.float64) * float(scale)
    return round_half_away(x).astype(np.int64)


def round_like_sql(values, ndigits: int) -> pa.Array:
    """DuckDB ``ROUND(x, d)`` as a float64 Arrow array:
    ``round(x * 10^d) / 10^d`` with the exact tie kernel, bit-identical
    to the SQL oracle output."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        x = values.to_numpy(zero_copy_only=False).astype(np.float64)
    else:
        x = np.asarray(values, dtype=np.float64)
    m = 10.0 ** ndigits
    out = round_half_away(x * m) / m
    out = np.where(np.isnan(x), np.nan, out)
    return pa.array(out)
