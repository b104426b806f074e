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

from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import scaled_int
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


class StreamingTumblingAggregator:
    """Stateful streaming tumbling-window aggregate with a watermark.

    Incremental extension beyond the reference's strictly-batch model:
    the actor accumulates per-window partials (count/sum/min/max) as
    micro-batches arrive in stream order, advances the watermark to
    ``max_event_ts - allowed_lateness``, and EMITS a window's final row
    once the watermark passes its end.  Events later than the watermark
    are counted in ``late_dropped`` (the explicit late-data policy).

    Use as a ``map_batches`` ACTOR with concurrency=1 per key range --
    parallelism comes from partitioning the stream by key upstream
    (each actor owns a shard of the key space), not from reordering one
    stream.  Call :meth:`flush` at end-of-stream for the open windows.
    """

    def __init__(self, width_s: int = 3600, allowed_lateness_s: int = 0,
                 ts_col: str = "ts", value_col: str = "value"):
        self.width = np.int64(width_s) * np.int64(1_000_000)
        self.lateness = np.int64(allowed_lateness_s) * np.int64(1_000_000)
        self.ts_col = ts_col
        self.value_col = value_col
        self.state: dict[int, list] = {}  # start -> [n, sum, min, max]
        self.max_ts = np.int64(-(2**62))
        self.late_dropped = 0

    def _emit(self, starts: list[int]) -> pa.Table:
        rows = []
        for s in sorted(starts):
            n, sm, mn, mx = self.state.pop(s)
            rows.append(
                {"window_start": int(s), "n": int(n), "sum": float(sm),
                 "min": float(mn), "max": float(mx)}
            )
        if not rows:
            return pa.table(
                {"window_start": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "sum": pa.array([], pa.float64()),
                 "min": pa.array([], pa.float64()),
                 "max": pa.array([], pa.float64())}
            )
        return pa.Table.from_pylist(rows)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch[self.ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch[self.value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        watermark = self.max_ts - self.lateness
        ok = ts >= watermark  # not later than the current watermark
        self.late_dropped += int((~ok).sum())
        ts, v = ts[ok], v[ok]
        if len(ts):
            starts = (ts // self.width) * self.width
            for s in np.unique(starts):
                m = starts == s
                st = self.state.setdefault(int(s), [0, 0.0, np.inf, -np.inf])
                st[0] += int(m.sum())
                st[1] += float(v[m].sum())
                st[2] = min(st[2], float(v[m].min()))
                st[3] = max(st[3], float(v[m].max()))
            self.max_ts = max(self.max_ts, np.int64(ts.max()))
        watermark = self.max_ts - self.lateness
        closed = [s for s in self.state if s + int(self.width) <= watermark]
        return self._emit(closed)

    def flush(self) -> pa.Table:
        return self._emit(list(self.state))


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


def keyed_window_kernel(
    group: pa.Table,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    cents_col: str = "cents",
    mov_n: int = 3,
    ndigits: int = 6,
) -> pa.Table:
    """Ordered per-key window functions over ONE key's rows (run inside
    ``groupby(key).map_groups`` -- the shuffle co-locates each key, this
    kernel never sees more than one key's rows):

    - ``rn``        ROW_NUMBER() ordered by (ts, id)
    - ``cum_cents`` running SUM over an integer-cents column (int64
      arithmetic, so the result is order-of-addition exact -- the trick
      that makes a running float sum SQL-oracle-able)
    - ``delta_us``  LAG difference of the timestamp in microseconds
      (NULL for the key's first row)
    - ``mov_avg{n}`` trailing moving average over the last ``mov_n``
      rows, computed as exact-int sliding sum / frame length / 100,
      rounded half-away like DuckDB ROUND

    All vectorized: one sort + cumsum/shift per group, no Python loop.
    """
    from ..pipelines.relational import round_like_sql

    order = pc.sort_indices(
        group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
    )
    g = group.take(order)
    n = g.num_rows
    cents = g[cents_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)

    rn = np.arange(1, n + 1, dtype=np.int64)
    cum = np.cumsum(cents)
    delta = np.empty(n, dtype=np.int64)
    delta[1:] = ts[1:] - ts[:-1]
    delta_arr = pa.array(delta, pa.int64(), mask=np.r_[True, np.zeros(n - 1, bool)])
    # trailing frame [i-mov_n+1, i]: sliding sum via cumsum difference
    padded = np.r_[np.int64(0), cum]
    lo = np.maximum(rn - mov_n, 0)
    frame_sum = cum - padded[lo]
    frame_len = rn - lo
    mov = (frame_sum.astype(np.float64) / frame_len.astype(np.float64)) / 100.0
    return pa.table(
        {
            key_col: g[key_col],
            id_col: g[id_col],
            "rn": pa.array(rn),
            "cum_cents": pa.array(cum),
            "delta_us": delta_arr,
            f"mov_avg{mov_n}": round_like_sql(mov, ndigits),
        }
    )


def keyed_window_kernel_multi(
    group: pa.Table,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    cents_col: str = "cents",
    mov_n: int = 3,
    ndigits: int = 6,
) -> pa.Table:
    """Segmented form of :func:`keyed_window_kernel`: processes a
    whole HASH BUCKET of keys in one vectorized pass (sort by
    (key, ts, id), per-key resets via segment masks) -- identical
    values, but Ray's per-group overhead is paid per bucket instead of
    per key (the round-3 per-group-overhead finding)."""
    from ..pipelines.relational import round_like_sql

    order = pc.sort_indices(
        group,
        sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                   (id_col, "ascending")],
    )
    g = group.take(order)
    n = g.num_rows
    if n == 0:
        return pa.table(
            {
                key_col: g[key_col], id_col: g[id_col],
                "rn": pa.array([], pa.int64()),
                "cum_cents": pa.array([], pa.int64()),
                "delta_us": pa.array([], pa.int64()),
                f"mov_avg{mov_n}": pa.array([], pa.float64()),
            }
        )
    keys = g[key_col].to_numpy(zero_copy_only=False)
    cents = g[cents_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    head = np.r_[True, keys[1:] != keys[:-1]]
    seg_id = np.cumsum(head) - 1
    seg_start = idx[head][seg_id]
    rn = idx - seg_start + 1
    gc = np.cumsum(cents)
    base = gc[seg_start] - cents[seg_start]
    cum = gc - base
    delta = np.empty(n, dtype=np.int64)
    delta[1:] = ts[1:] - ts[:-1]
    delta[0] = 0
    delta_arr = pa.array(delta, pa.int64(), mask=head)
    lo_rn = np.maximum(rn - mov_n, 0)
    prev_idx = seg_start + lo_rn - 1
    prev = np.where(lo_rn == 0, np.int64(0), cum[np.maximum(prev_idx, 0)])
    frame_sum = cum - prev
    frame_len = rn - lo_rn
    mov = (
        frame_sum.astype(np.float64) / frame_len.astype(np.float64)
    ) / 100.0
    return pa.table(
        {
            key_col: g[key_col],
            id_col: g[id_col],
            "rn": pa.array(rn),
            "cum_cents": pa.array(cum),
            "delta_us": delta_arr,
            f"mov_avg{mov_n}": round_like_sql(mov, ndigits),
        }
    )


def keyed_window_functions(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    mov_n: int = 3,
):
    """SQL window-function family (ROW_NUMBER / running SUM / LAG /
    moving AVG) partitioned by ``key_col``, ordered by (ts, id).

    One ``groupby(key)`` shuffle co-locates each key; the per-group
    kernel is vectorized numpy.  The float value column is converted to
    integer cents (DuckDB-identical half-away rounding) BEFORE the
    shuffle so every accumulation is exact int64 -- running float sums
    are otherwise not reproducible across partitionings.  At 100 TB the
    only all-to-all is the one keyed shuffle; group state is one key's
    rows (bounded by the heaviest key, same skew caveat as any
    PARTITION BY)."""

    def to_cents(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch[value_col], 100.0)
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                ts_col: batch[ts_col],
                "cents": pa.array(c),
            }
        )

    prepared = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None)

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions import hashing as H
        from ..functions.sketch import mix32

        col = batch[key_col]
        if pa.types.is_integer(col.type):
            h = mix32(col.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            h = H.fnv1a_array(
                [str(x) for x in col.to_pylist()]
            ).view(np.int64)
        return batch.append_column("_bkt", pa.array(np.abs(h) % 64))

    return (
        prepared.map_batches(
            add_bucket, batch_format="pyarrow", batch_size=None
        )
        .groupby("_bkt")
        .map_groups(
            lambda g: keyed_window_kernel_multi(
                g.drop_columns(["_bkt"]), key_col=key_col, ts_col=ts_col,
                id_col=id_col, mov_n=mov_n,
            ),
            batch_format="pyarrow",
        )
    )


def funnel_kernel(
    group: pa.Table,
    steps: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pa.Table:
    """Ordered-funnel progress for ONE key's events (run inside
    ``groupby(key).map_groups``): step i is reached iff an event of
    ``steps[i]`` occurs STRICTLY after the timestamp that reached step
    i-1 (the SQL min-ts-chain formulation, so ties do not advance the
    funnel).  Emits one row: the deepest step index reached (0 = none).
    Vectorized: one min() per step over masked timestamps."""
    ts = group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    et = group[type_col].to_numpy(zero_copy_only=False)
    t_prev = -np.inf
    depth = 0
    for i, s in enumerate(steps):
        m = (et == s) & (ts > t_prev)
        if not m.any():
            break
        t_prev = ts[m].min()
        depth = i + 1
    return pa.table({"depth": pa.array([depth], pa.int64())})


def funnel_kernel_multi(
    group: pa.Table,
    steps: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pa.Table:
    """Segmented form of :func:`funnel_kernel`: one hash bucket of
    keys per call; the min-ts chain advances ALL keys per step with
    one masked ``minimum.reduceat`` (identical depths, per-Ray-group
    overhead paid per bucket instead of per key)."""
    idx = pc.sort_indices(group, sort_keys=[(key_col, "ascending")])
    g = group.take(idx)
    keys = g[key_col].to_numpy(zero_copy_only=False)
    ts = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    et = g[type_col].to_numpy(zero_copy_only=False)
    n = len(keys)
    if n == 0:
        return pa.table({"depth": pa.array([], pa.int64())})
    head = np.r_[True, keys[1:] != keys[:-1]]
    seg_id = np.cumsum(head) - 1
    offsets = np.flatnonzero(head)
    S = len(offsets)
    NEG = np.int64(-(1 << 62))
    POS = np.int64((1 << 62))
    t_prev = np.full(S, NEG, dtype=np.int64)
    depth = np.zeros(S, dtype=np.int64)
    alive = np.ones(S, dtype=bool)
    for i, s in enumerate(steps):
        cand = np.where(
            (et == s) & (ts > t_prev[seg_id]) & alive[seg_id], ts, POS
        )
        m = np.minimum.reduceat(cand, offsets)
        adv = m < POS
        t_prev = np.where(adv, m, t_prev)
        depth = np.where(adv, np.int64(i + 1), depth)
        alive &= adv
        if not alive.any():
            break
    return pa.table({"depth": pa.array(depth)})


def funnel_counts(
    ds,
    steps: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pa.Table:
    """Funnel analysis: how many keys reached each step of the ordered
    ``steps`` sequence.  One keyed shuffle co-locates each key's
    events; the per-key kernel emits only its reached depth (one int),
    so the combine is |keys| rows no matter how many events -- then a
    tiny suffix-sum turns depth counts into step-reach counts."""
    from ..pipelines.relational import collect_tables

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions import hashing as H
        from ..functions.sketch import mix32

        col = batch[key_col]
        if pa.types.is_integer(col.type):
            h = mix32(col.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            h = H.fnv1a_array(
                [str(x) for x in col.to_pylist()]
            ).view(np.int64)
        return batch.append_column("_bkt", pa.array(np.abs(h) % 64))

    depths = (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_bkt")
        .map_groups(
            lambda g: funnel_kernel_multi(
                g.drop_columns(["_bkt"]), steps, key_col=key_col,
                type_col=type_col, ts_col=ts_col,
            ),
            batch_format="pyarrow",
        )
    )
    t = collect_tables(depths)
    counts = np.zeros(len(steps) + 1, dtype=np.int64)
    if t is not None:
        d = t["depth"].to_numpy(zero_copy_only=False)
        binc = np.bincount(d, minlength=len(steps) + 1)
        counts[: len(binc)] = binc[: len(steps) + 1]
    reached = np.cumsum(counts[::-1])[::-1]  # reached[i] = #keys depth >= i
    return pa.table(
        {
            "step": pa.array(list(steps), pa.string()),
            "n_reached": pa.array(reached[1:].astype(np.int64)),
        }
    )


def rolling_interval_sum(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    interval_us: int = 3_600_000_000,
):
    """Trailing time-interval window sum per key -- the SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    INTERVAL .. PRECEDING AND CURRENT ROW)`` shape, i.e. a VALUE-range
    frame (all peer rows with ts in [t - interval, t], duplicates
    included) rather than a row-count frame.

    Same contract as :func:`keyed_window_functions`: one groupby
    shuffle, exact int64 cents inside the kernel (value-range sums are
    float-order-unreproducible otherwise), and the per-group work is a
    sort + cumsum + two ``searchsorted`` calls -- no Python loop."""

    def to_cents(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch[value_col], 100.0)
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                ts_col: batch[ts_col],
                "cents": pa.array(c),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        ts = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        cum = np.r_[0, np.cumsum(cents)]
        # RANGE frame: include every row with ts' in [t - interval, t]
        start = np.searchsorted(ts, ts - interval_us, side="left")
        end = np.searchsorted(ts, ts, side="right")
        roll = cum[end] - cum[start]
        return pa.table(
            {
                key_col: g[key_col],
                id_col: g[id_col],
                "roll_cents": pa.array(roll.astype(np.int64)),
            }
        )

    from .shuffle import grouped_by_key

    prepared = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    return grouped_by_key(prepared, key_col, kernel)


def locf_resample(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Time-series resampling to a daily grid with last-observation-
    carried-forward fill: for each key, one row per calendar day from
    its first to its last event; the value is the key's most recent
    event at-or-before that day (latest (ts, id) within the day wins),
    in exact int cents.  One groupby shuffle; the kernel is sort +
    searchsorted over the key's own days -- grid size is bounded by
    the key's observed span."""

    def to_cents(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch[value_col], 100.0)
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                ts_col: batch[ts_col],
                "cents": pa.array(c),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        ts = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        grid = np.arange(day[0], day[-1] + 1, dtype=np.int64)
        # last event with day <= grid day (sorted order breaks ties by
        # latest (ts, id) automatically: searchsorted right - 1)
        pos = np.searchsorted(day, grid, side="right") - 1
        return pa.table(
            {
                key_col: pa.array(
                    np.repeat(g[key_col][0].as_py(), len(grid))
                ),
                "day": pa.array(
                    (grid * 86_400_000_000), pa.int64()
                ).cast(pa.timestamp("us")),
                "cents": pa.array(cents[pos]),
            }
        )

    from .shuffle import grouped_by_key

    prepared = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    return grouped_by_key(prepared, key_col, kernel)


def keyed_ewma(
    ds,
    alpha: float = 0.2,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Exponentially weighted moving average per key over (ts, id)
    order: ``e_0 = x_0; e_t = alpha * x_t + (1 - alpha) * e_{t-1}`` --
    the streaming smoother behind anomaly baselines and rate limiters.
    Returns one row per key: ``(key, n_points, ewma_last)``.

    The recurrence is evaluated SEQUENTIALLY with exactly the float-op
    shape above (not the closed-form power-series, whose different
    summation order drifts in the last ulp), so results are
    bit-identical to the SQL oracle's recursive CTE and invariant to
    partitioning.  One keyed shuffle; per-group state is one key's
    rows."""
    import pyarrow.compute as pc

    from ..functions.rounding import round_like_sql
    from ..stages.shuffle import grouped_by_key

    a = float(alpha)
    b = 1.0 - a

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        x = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        e = x[0]
        for v in x[1:]:
            e = a * v + b * e
        return pa.table(
            {
                key_col: pa.array([g[key_col][0].as_py()], pa.int64()),
                "n_points": pa.array([len(x)], pa.int64()),
                "ewma_last": round_like_sql([float(e)], 6),
            }
        )

    return grouped_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        kernel,
    )


def keyed_cusum_alarms(
    ds,
    h_units: float = 50.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """One-sided CUSUM changepoint alarms per key (Page 1954):
    ``S_t = max(0, S_{t-1} + dev_t)``, alarm + reset when
    ``S_t > h``.  Deviation is from the key's own mean, but computed in
    EXACT int64 arithmetic so results are partition-invariant and
    bit-identical to SQL: values quantize to cents, deviations scale
    by the key's row count (``dev = n * cents_t - total_cents`` avoids
    the division entirely), and the alarm threshold becomes
    ``h_units * 100 * n``.  Returns ``(key, n_points, n_alarms)``.
    One keyed shuffle; sequential integer recurrence per group."""
    import pyarrow.compute as pc

    from ..functions.rounding import scaled_int
    from ..stages.shuffle import grouped_by_key

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        cents = scaled_int(g[value_col], 100.0)
        n = len(cents)
        total = int(cents.sum())
        thresh = int(round(h_units * 100.0)) * n
        s = 0
        alarms = 0
        for c in cents:
            s = max(0, s + int(c) * n - total)
            if s > thresh:
                alarms += 1
                s = 0
        return pa.table(
            {
                key_col: pa.array([g[key_col][0].as_py()], pa.int64()),
                "n_points": pa.array([n], pa.int64()),
                "n_alarms": pa.array([alarms], pa.int64()),
            }
        )

    return grouped_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        kernel,
    )


def keyed_sign_test(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Sign test per key over (ts, id) order: signs of consecutive
    value differences in exact cents (ties dropped), the
    distribution-free trend screen.  Returns one row per key with at
    least one non-tie step: ``(key, n_plus, n_minus, z)`` where
    ``z = (n_plus - n_minus) / sqrt(n_plus + n_minus)`` is the only
    float step (shared verbatim with the SQL oracle)."""
    import pyarrow.compute as pc

    from ..functions.rounding import round_like_sql, scaled_int
    from ..stages.shuffle import grouped_by_key

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        c = scaled_int(g[value_col], 100.0)
        d = np.diff(c)
        npl = int((d > 0).sum())
        nmi = int((d < 0).sum())
        if npl + nmi == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_plus": pa.array([], pa.int64()),
                    "n_minus": pa.array([], pa.int64()),
                    "z": pa.array([], pa.float64()),
                }
            )
        z = float(npl - nmi) / np.sqrt(float(npl + nmi))
        return pa.table(
            {
                key_col: pa.array([g[key_col][0].as_py()], pa.int64()),
                "n_plus": pa.array([npl], pa.int64()),
                "n_minus": pa.array([nmi], pa.int64()),
                "z": round_like_sql([z], 6),
            }
        )

    return grouped_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        kernel,
    )


def keyed_debounce(
    ds,
    window_s: float = 86400.0,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
):
    """Event debounce per key: keep a row only when at least
    ``window_s`` has passed since the last KEPT row of the same key --
    the alert-suppression / retry-collapse primitive.  The kept set is
    defined by a sequential recurrence over kept timestamps (a plain
    LAG over all rows computes a DIFFERENT, wrong set), evaluated in
    exact int64 microseconds.  Returns one audit row per key:
    ``(keys..., n_events, n_kept, sum_kept_ids)``."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_by_key

    keys = key_cols if key_cols is not None else ["user_id", "event_type"]
    w_us = int(round(window_s * 1_000_000.0))

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        ts = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        last = None
        n_kept = 0
        sum_ids = 0
        for t, i in zip(ts, ids):
            if last is None or t - last >= w_us:
                n_kept += 1
                sum_ids += int(i)
                last = int(t)
        cols = {k: pa.array([g[k][0].as_py()]) for k in keys}
        cols["n_events"] = pa.array([len(ts)], pa.int64())
        cols["n_kept"] = pa.array([n_kept], pa.int64())
        cols["sum_kept_ids"] = pa.array([sum_ids], pa.int64())
        return pa.table(cols)

    return grouped_by_key(
        ds.select_columns(keys + [ts_col, id_col]), keys, kernel
    )


def keyed_linear_interp(
    ds,
    grid_us: list[int],
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Per-key linear interpolation of ``value`` at fixed grid
    timestamps (the resample-to-grid primitive next to LOCF): for each
    grid time inside the key's [first, last] span, interpolate between
    the bracketing rows -- prev = LAST row with ts <= g, next = FIRST
    row with ts >= g, both in (ts, id) order; exact-timestamp hits
    return the prev row's value.  The interpolation
    ``v0 + (v1 - v0) * ((g - t0) / (t1 - t0))`` runs on exact int64
    microsecond differences, one float division -- the SQL mirror is
    bit-identical.  Grid points outside the span emit no row."""
    import pyarrow.compute as pc

    from ..functions.rounding import round_like_sql
    from ..stages.shuffle import grouped_by_key

    grid = np.asarray(sorted(grid_us), np.int64)

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        t = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        inside = (grid >= t[0]) & (grid <= t[-1])
        gs = grid[inside]
        if len(gs) == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "grid_us": pa.array([], pa.int64()),
                    "value_interp": pa.array([], pa.float64()),
                }
            )
        i0 = np.searchsorted(t, gs, side="right") - 1
        i1 = np.searchsorted(t, gs, side="left")
        t0, t1 = t[i0], t[i1]
        v0, v1 = v[i0], v[i1]
        same = t1 == t0
        with np.errstate(divide="ignore", invalid="ignore"):
            interp = v0 + (v1 - v0) * (
                (gs - t0).astype(np.float64) / (t1 - t0).astype(np.float64)
            )
        interp = np.where(same, v0, interp)
        key = g[key_col][0].as_py()
        return pa.table(
            {
                key_col: pa.array([key] * len(gs), pa.int64()),
                "grid_us": pa.array(gs),
                "value_interp": round_like_sql(interp, 6),
            }
        )

    return grouped_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        kernel,
    )


def keyed_interval_union(
    ds,
    window_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Total covered time per key after merging overlapping activity
    intervals ``[ts, ts + window)`` -- the interval-union aggregate
    (billing/uptime semantics: overlapping sessions never double-
    count).  Gaps-and-islands over exact int64 microseconds: a new
    island starts when an interval's start exceeds the running max
    end; per-key output ``(key, n_islands, covered_us)``.  One keyed
    shuffle, vectorized kernel; parity with the SQL window mirror is
    exact (integer arithmetic only)."""
    import pyarrow.compute as pc

    from ..stages.shuffle import grouped_by_key

    w_us = int(round(window_s * 1_000_000.0))

    def kernel(group: pa.Table) -> pa.Table:
        ts = np.sort(
            group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        ends = ts + w_us
        run_max = np.maximum.accumulate(ends)
        new_island = np.ones(len(ts), dtype=bool)
        new_island[1:] = ts[1:] > run_max[:-1]
        starts = ts[new_island]
        # island end = running max at the last row of each island
        idx = np.flatnonzero(new_island)
        last = np.append(idx[1:] - 1, len(ts) - 1)
        covered = int((run_max[last] - starts).sum())
        return pa.table(
            {
                key_col: pa.array([group[key_col][0].as_py()], pa.int64()),
                "n_islands": pa.array([len(starts)], pa.int64()),
                "covered_us": pa.array([covered], pa.int64()),
            }
        )

    return grouped_by_key(
        ds.select_columns([key_col, ts_col]), key_col, kernel
    )


def keyed_bounce_rate(
    ds,
    gap_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Session bounce rate per key: sessionize by inactivity gap,
    count single-event sessions.  Exact int64 microsecond gaps; the
    rate is one float division (SQL-identical).  Returns
    ``(key, n_sessions, n_bounces, bounce_rate)``."""
    from ..functions.rounding import round_like_sql
    from ..stages.shuffle import grouped_by_key

    w_us = int(round(gap_s * 1_000_000.0))

    def kernel(group: pa.Table) -> pa.Table:
        ts = np.sort(
            group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > w_us
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(ts)))
        n_sessions = len(starts)
        n_bounces = int((sizes == 1).sum())
        return pa.table(
            {
                key_col: pa.array([group[key_col][0].as_py()], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "n_bounces": pa.array([n_bounces], pa.int64()),
                "bounce_rate": round_like_sql(
                    [n_bounces / n_sessions], 6
                ),
            }
        )

    return grouped_by_key(ds.select_columns([key_col, ts_col]), key_col, kernel)


def keyed_burstiness(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Burstiness index per key (Goh & Barabasi 2008):
    ``B = (sigma - mu) / (sigma + mu)`` over inter-event gaps --
    -1 = metronome, 0 = Poisson, ->1 = extreme bursts.  Gaps quantize
    to whole seconds (floor) so the moments sum as exact int64 (gap^2
    in microseconds would overflow); sigma uses the one-division
    moment form shared with the SQL mirror.  Keys with < 2 events
    emit no row."""
    from ..functions.rounding import round_like_sql
    from ..stages.shuffle import grouped_by_key

    def kernel(group: pa.Table) -> pa.Table:
        ts = np.sort(
            group[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        if len(ts) < 2:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "burstiness": pa.array([], pa.float64()),
                }
            )
        gaps = (ts[1:] - ts[:-1]) // 1_000_000  # whole seconds, exact
        n = float(len(gaps))
        mu = float(gaps.sum()) / n
        var = float((gaps * gaps).sum()) / n - mu * mu
        sig = float(np.sqrt(max(var, 0.0)))
        b = 0.0 if sig + mu == 0.0 else (sig - mu) / (sig + mu)
        return pa.table(
            {
                key_col: pa.array([group[key_col][0].as_py()], pa.int64()),
                "n_gaps": pa.array([len(gaps)], pa.int64()),
                "burstiness": round_like_sql([b], 6),
            }
        )

    return grouped_by_key(ds.select_columns([key_col, ts_col]), key_col, kernel)
