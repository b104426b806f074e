"""Windowed (event-time) aggregates over a timestamped stream table.

The reference is strictly batch (SURVEY par.1.3: no windows,
watermarks or incremental state), but a training-data engine needs at
least tumbling-window aggregation for stream-shaped tables (the
``events`` fixture).  Implemented Ray-Data-first: the window id is a
plain integer column (floor of the epoch by the window width) computed
vectorized per batch, after which any grouped aggregate applies --
windows are just another partition key, so skew/salting machinery
reuses as-is.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_tumbling_window(
    batch: pa.Table,
    ts_col: str = "ts",
    width_s: int = 3600,
    out_col: str = "window_start",
) -> pa.Table:
    """Append the tumbling-window start timestamp: epoch floored to the
    window width (equivalent of SQL date_trunc for divisor widths)."""
    ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    w = np.int64(width_s) * np.int64(1_000_000)  # timestamps are [us]
    start = (ts // w) * w
    return batch.append_column(
        out_col, pa.array(start).cast(pa.timestamp("us"))
    )


def add_hopping_windows(
    batch: pa.Table,
    ts_col: str = "ts",
    width_s: int = 3600,
    hop_s: int = 1800,
    out_col: str = "window_start",
) -> pa.Table:
    """Hopping windows: one output row per (row, covering window) --
    a controlled explode by ``width/hop`` copies."""
    if width_s % hop_s != 0:
        raise ValueError("width must be a multiple of hop")
    ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    hop = np.int64(hop_s) * np.int64(1_000_000)
    width = np.int64(width_s) * np.int64(1_000_000)
    n_copies = int(width // hop)
    last_start = (ts // hop) * hop
    parts = []
    for k in range(n_copies):
        start = last_start - np.int64(k) * hop
        keep = ts < start + width
        sub = batch.filter(pa.array(keep))
        if sub.num_rows:
            parts.append(
                sub.append_column(
                    out_col,
                    pa.array(start[keep]).cast(pa.timestamp("us")),
                )
            )
    if not parts:
        return batch.slice(0, 0).append_column(
            out_col, pa.array([], pa.timestamp("us"))
        )
    return pa.concat_tables(parts)


def add_session_key(
    table: pa.Table,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_s: int = 1800,
    out_col: str = "session_id",
) -> pa.Table:
    """Session windows per key: rows sorted by (key, ts); a new session
    starts when the gap to the previous event of the same key exceeds
    ``gap_s``.  This is the per-group kernel -- run it inside
    ``groupby(key).map_groups`` (sessions need the key's events
    co-located, the one genuinely order-dependent window kind)."""
    idx = pc.sort_indices(
        table, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
    )
    t = table.take(idx)
    ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    keys = t[key_col].to_numpy(zero_copy_only=False)
    gap = np.int64(gap_s) * np.int64(1_000_000)
    new_key = np.r_[True, keys[1:] != keys[:-1]]
    new_gap = np.r_[True, (ts[1:] - ts[:-1]) > gap]
    starts = new_key | new_gap
    session = np.cumsum(starts) - 1
    return t.append_column(out_col, pa.array(session.astype(np.int64)))
