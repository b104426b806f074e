"""Per-key ordered pipelines as STREAMING Datasets (ROADMAP r3 item 2).

The driver contract's per-key ordered queries (track lengths, track
simplification, conversion lag) collect their results to one Arrow
table, which is fine while the key space (users) fits on the driver.
These are the same pipelines with the collect removed: the
``groupby(key).map_groups`` stage already streams, the per-row
finishing math runs in a ``map_batches``, and the result is a Dataset
the caller can ``write_parquet`` -- one row per key at ANY key
cardinality, no driver materialization.

``__ray_entry__`` wraps each with a final collect for the oracle gate,
so query semantics and these scale paths cannot drift.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
    round_like_sql,
)


def geocode_events(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The frozen event geocode: lon/lat as a pure function of
    event_id on a 96x96 lattice (shared by every track query and its
    SQL oracle)."""

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    return ds.map_batches(geocode, batch_format="pyarrow", batch_size=None)


def track_lengths_ds(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user planar track length over (ts, event_id)-ordered fixes.
    Input columns: event_id, user_id, ts."""

    def track(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        d = np.hypot(np.diff(lon), np.diff(lat))
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "track_len": round_like_sql([float(d.sum())], 6),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(geocode_events(events), "user_id", track)


def track_simplify_ds(
    events: ray.data.Dataset, tol: float = 0.02
) -> ray.data.Dataset:
    """Per-user Douglas-Peucker simplification summary (n_raw, n_kept,
    simplified length).  Input columns: event_id, user_id, ts."""

    def simplify(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            simplify_dp,
        )

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        keep = simplify_dp(lon, lat, tol=tol)
        d = np.hypot(np.diff(lon[keep]), np.diff(lat[keep]))
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_raw": pa.array([len(lon)], pa.int64()),
                "n_kept": pa.array([int(keep.sum())], pa.int64()),
                "simplified_len": round_like_sql([float(d.sum())], 6),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(geocode_events(events), "user_id", simplify)


def conversion_lag_ds(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user purchase->last-click lag (n_conversions, avg_lag_s).
    Input columns: user_id, ts, event_type.  Users with no conversion
    emit no row."""

    def lag(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_conversions": pa.array([], pa.int64()),
                "avg_lag_s": pa.array([], pa.float64()),
            }
        )
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = group["event_type"].to_numpy(zero_copy_only=False)
        clicks = np.sort(ts[et == "click"])
        purch = ts[et == "purchase"]
        if len(clicks) == 0 or len(purch) == 0:
            return empty
        idx = np.searchsorted(clicks, purch, side="right") - 1
        ok = idx >= 0
        lags_us = purch[ok] - clicks[idx[ok]]  # exact int64 microseconds
        if not len(lags_us):
            return empty
        n = len(lags_us)
        s = int(lags_us.sum())
        # division order mirrors the SQL oracle: (sum_us / n) / 1e6
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "n_conversions": pa.array([n], pa.int64()),
                "avg_lag_s": round_like_sql([float(s) / float(n) / 1e6], 6),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(events, "user_id", lag)


def geofence_transitions_ds(
    events: ray.data.Dataset,
    polygons: dict[str, list[tuple[float, float]]],
) -> ray.data.Dataset:
    """Per-user geofence ENTER/EXIT events against a small polygon set
    (the trajectory x polygon membership-change join a fleet/telemetry
    pipeline runs; the reference's PIP clip, test2.py:1272, applied
    along time-ordered tracks instead of rasters).

    Scale shape: a stateless ``map_batches`` computes ONE int64
    membership bitmask per fix (bit b = inside polygons[b]; vectorized
    even-odd PIP with bbox prefilter) -- no row amplification before
    the shuffle -- then one ``grouped_by_key(user_id)`` pass sorts each
    track by (ts, event_id) and emits a row per bit flip.  Polygon
    count <= 63 per call; larger fence sets shard into bitmask words.
    Input columns: event_id, user_id, ts.
    """
    from ..functions.geometry import Polygon

    pids = sorted(polygons)
    polys = [Polygon(pid, [np.asarray(polygons[pid], np.float64)]) for pid in pids]
    if len(polys) > 63:
        raise ValueError("geofence_transitions_ds: max 63 polygons per call")

    def add_mask(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        mask = np.zeros(len(lon), dtype=np.int64)
        for b, poly in enumerate(polys):
            mask |= poly.contains(lon, lat).astype(np.int64) << b
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "mask": pa.array(mask),
            }
        )

    def transitions(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        mask = g["mask"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = g["user_id"][0].as_py()
        out_pid, out_eid, out_tr = [], [], []
        changed = np.flatnonzero(mask[1:] != mask[:-1]) + 1
        for i in changed:
            diff = mask[i] ^ mask[i - 1]
            b = 0
            while diff:
                if diff & 1:
                    out_pid.append(pids[b])
                    out_eid.append(int(eid[i]))
                    out_tr.append(
                        "enter" if (mask[i] >> b) & 1 else "exit"
                    )
                diff >>= 1
                b += 1
        return pa.table(
            {
                "polygon_id": pa.array(out_pid, pa.string()),
                "user_id": pa.array([uid] * len(out_pid), pa.int64()),
                "event_id": pa.array(out_eid, pa.int64()),
                "transition": pa.array(out_tr, pa.string()),
            }
        )

    from ..stages.shuffle import grouped_by_key

    masked = geocode_events(events).map_batches(
        add_mask, batch_format="pyarrow", batch_size=None
    )
    return grouped_by_key(masked, "user_id", transitions)


def movement_directions_ds(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user movement-direction histogram over consecutive fixes
    (ts, event_id order): each step classifies into the 8 compass
    sectors by PURE SIGN/MAGNITUDE COMPARISONS (the D8 convention --
    cardinal when one axis dominates, diagonal on exact ties), so
    engine and SQL agree bit-for-bit with no trig.  Zero-displacement
    steps are dropped.  Returns ``(user_id, direction, n_steps)``.
    One keyed shuffle; vectorized per-group kernel."""

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        dx = lon[1:] - lon[:-1]
        dy = lat[1:] - lat[:-1]
        adx, ady = np.abs(dx), np.abs(dy)
        moved = (dx != 0.0) | (dy != 0.0)
        # D8 sectors by comparisons only
        names = np.empty(len(dx), dtype=object)
        east = adx > ady
        north = ady > adx
        diag = ~east & ~north
        names[east & (dx > 0)] = "E"
        names[east & (dx < 0)] = "W"
        names[north & (dy > 0)] = "N"
        names[north & (dy < 0)] = "S"
        names[diag & (dx > 0) & (dy > 0)] = "NE"
        names[diag & (dx > 0) & (dy < 0)] = "SE"
        names[diag & (dx < 0) & (dy > 0)] = "NW"
        names[diag & (dx < 0) & (dy < 0)] = "SW"
        keep = moved
        uid = g["user_id"][0].as_py()
        t = pa.table(
            {
                "direction": pa.array(list(names[keep]), pa.string()),
                "_one": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )
        agg = t.group_by("direction").aggregate([("_one", "sum")])
        n = agg.num_rows
        return pa.table(
            {
                "user_id": pa.array([uid] * n, pa.int64()),
                "direction": agg["direction"],
                "n_steps": agg["_one_sum"],
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(geocode_events(events), "user_id", kernel)


def track_speed_stats_ds(
    events: ray.data.Dataset, speed_limit: float = 0.1
) -> ray.data.Dataset:
    """Per-user speed profile over consecutive geocoded fixes: speed =
    planar step distance / hours elapsed; returns ``(user_id, n_steps,
    max_speed, n_speeding)`` (steps above ``speed_limit`` units/hour).
    Zero-duration steps are dropped (speed undefined).  Distance uses
    the explicit ``sqrt(dx*dx + dy*dy)`` form (NOT ``np.hypot``, whose
    internally rescaled rounding can differ from SQL's SQRT in the
    last ulp).  One keyed shuffle, vectorized kernel."""

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dx = lon[1:] - lon[:-1]
        dy = lat[1:] - lat[:-1]
        dt_us = ts[1:] - ts[:-1]
        ok = dt_us > 0
        if not ok.any():
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_steps": pa.array([], pa.int64()),
                    "max_speed": pa.array([], pa.float64()),
                    "n_speeding": pa.array([], pa.int64()),
                }
            )
        sp = np.sqrt(dx[ok] * dx[ok] + dy[ok] * dy[ok]) / (
            dt_us[ok].astype(np.float64) / 3600000000.0
        )
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_steps": pa.array([int(ok.sum())], pa.int64()),
                "max_speed": round_like_sql([float(sp.max())], 6),
                "n_speeding": pa.array(
                    [int((sp > speed_limit).sum())], pa.int64()
                ),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(geocode_events(events), "user_id", kernel)


def track_hausdorff_pairs_ds(
    events: ray.data.Dataset, max_user: int = 20
) -> ray.data.Dataset:
    """Symmetric discrete Hausdorff distance between user tracks
    (trajectory-similarity join): ``H(A,B) = max(h(A,B), h(B,A))``,
    ``h(A,B) = max over a of min over b of dist`` -- point sets, order-
    free.  Restricted to ``user_id < max_user`` (the explicit-cap
    pattern of the reference's first-N scans, test2.py:89): all-pairs
    trajectory distance is quadratic BOTH in users and track length;
    the scale path blocks pairs by spatial-extent overlap first.
    Tracks gather per user (bounded by the cap), pairs evaluate in a
    stateless map_batches over the pair list with tracks broadcast;
    distances compare squared forms, one sqrt at the end."""
    import ray

    filt = events.filter(
        expr=f"user_id < {int(max_user)}"
    )
    pts = geocode_events(filt)
    tracks: dict[int, np.ndarray] = {}
    for b in pts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        for u in np.unique(uid):
            sel = uid == u
            arr = np.stack([lon[sel], lat[sel]], axis=1)
            prev = tracks.get(int(u))
            tracks[int(u)] = arr if prev is None else np.vstack([prev, arr])
    users = sorted(tracks)
    ref = ray.put(tracks)
    pairs = pa.table(
        {
            "user_a": pa.array(
                [a for i, a in enumerate(users) for _ in users[i + 1 :]],
                pa.int64(),
            ),
            "user_b": pa.array(
                [b for i, _ in enumerate(users) for b in users[i + 1 :]],
                pa.int64(),
            ),
        }
    )

    def hdist(batch: pa.Table) -> pa.Table:
        tr = ray.get(ref)
        out = []
        for a, b in zip(
            batch["user_a"].to_pylist(), batch["user_b"].to_pylist()
        ):
            pa_, pb = tr[a], tr[b]
            dx = pa_[:, None, 0] - pb[None, :, 0]
            dy = pa_[:, None, 1] - pb[None, :, 1]
            d2 = dx * dx + dy * dy
            h = max(d2.min(axis=1).max(), d2.min(axis=0).max())
            out.append(float(np.sqrt(h)))
        from ..functions.rounding import round_like_sql

        return pa.table(
            {
                "user_a": batch["user_a"],
                "user_b": batch["user_b"],
                "hausdorff": round_like_sql(out, 6),
            }
        )

    import ray.data as rd

    return rd.from_arrow(pairs).map_batches(
        hdist, batch_format="pyarrow", batch_size=32
    )


def track_straightness_ds(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user straightness index: net displacement (first fix ->
    last fix) over gross path length -- 1.0 = beeline, ~0 = wandering
    (movement-ecology's standard tortuosity ratio).  Users with zero
    gross movement emit no row.  One keyed shuffle; step distances in
    the explicit sqrt form shared with the SQL oracle."""

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "net_disp": pa.array([], pa.float64()),
                "gross_len": pa.array([], pa.float64()),
                "straightness": pa.array([], pa.float64()),
            }
        )
        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        if len(lon) < 2:
            return empty
        dx = lon[1:] - lon[:-1]
        dy = lat[1:] - lat[:-1]
        gross = float(np.sqrt(dx * dx + dy * dy).sum())
        if gross == 0.0:
            return empty
        ndx = lon[-1] - lon[0]
        ndy = lat[-1] - lat[0]
        net = float(np.sqrt(ndx * ndx + ndy * ndy))
        from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
            round_like_sql as r6,
        )

        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "net_disp": r6([net], 6),
                "gross_len": r6([gross], 6),
                "straightness": r6([net / gross], 6),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(geocode_events(events), "user_id", kernel)


def od_matrix_ds(events: ray.data.Dataset, res: int = 6) -> ray.data.Dataset:
    """Origin-destination flow matrix over tracks: each consecutive
    fix pair contributes one trip from its origin cell to its
    destination cell at resolution ``res`` (self-loops included --
    dwell flows are real flows).  The per-user kernel PRE-AGGREGATES
    its own (from, to) counts (bounded by the track, not the matrix),
    then one small grouped combine merges users -- the OD matrix
    itself never materializes per-row."""

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.cells import cell_of

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        if len(lon) < 2:
            return pa.table(
                {
                    "cell_from": pa.array([], pa.int64()),
                    "cell_to": pa.array([], pa.int64()),
                    "n_trips": pa.array([], pa.int64()),
                }
            )
        cells = cell_of(lon, lat, res)
        t = pa.table(
            {
                "cell_from": pa.array(cells[:-1]),
                "cell_to": pa.array(cells[1:]),
                "_one": pa.array(np.ones(len(cells) - 1, np.int64)),
            }
        )
        out = t.group_by(["cell_from", "cell_to"]).aggregate([("_one", "sum")])
        return out.rename_columns(["cell_from", "cell_to", "n_trips"])

    from ..stages.shuffle import grouped_by_key

    per_user = grouped_by_key(geocode_events(events), "user_id", kernel)

    from ..pipelines.relational import hash_aggregate

    return hash_aggregate(per_user, ["cell_from", "cell_to"],
                          [("n_trips", "sum", "n_trips")])


def radius_of_gyration_ds(events: ray.data.Dataset) -> ray.data.Dataset:
    """Radius of gyration per user (Gonzalez et al. 2008, the standard
    human-mobility range metric): RMS distance of a user's fixes from
    their centroid, computed on the EXACT integer lattice indices
    (``ix = eid % 96``, ``iy = (eid // 96) % 96``) via the one-division
    moment form ``rog = 0.01 * sqrt((E[x^2]-E[x]^2) + (E[y^2]-E[y]^2))``
    -- bit-identical to the SQL AVG mirror.  One keyed shuffle."""

    def kernel(group: pa.Table) -> pa.Table:
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = eid % 96
        iy = (eid // 96) % 96
        n = float(len(eid))
        mx = float(ix.sum()) / n
        my = float(iy.sum()) / n
        sqx = float((ix * ix).sum()) / n
        sqy = float((iy * iy).sum()) / n
        var = (sqx - mx * mx) + (sqy - my * my)
        rog = 0.01 * np.sqrt(max(var, 0.0))
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "n_fixes": pa.array([len(eid)], pa.int64()),
                "rog": round_like_sql([float(rog)], 6),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(
        events.select_columns(["user_id", "event_id"]), "user_id", kernel
    )


def track_geodesic_length_ds(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user GREAT-CIRCLE track length in km: the spherical upgrade
    of track_lengths_ds, summing the pinned-op-order haversine
    (stages/joins.py::haversine_km, SQL-parity proven by the radius
    joins) over consecutive fixes."""

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.joins import haversine_km

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        d = haversine_km(lon[:-1], lat[:-1], lon[1:], lat[1:])
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_fixes": pa.array([len(lon)], pa.int64()),
                "geo_len_km": round_like_sql([float(d.sum())], 6),
            }
        )

    from ..stages.shuffle import grouped_by_key

    return grouped_by_key(geocode_events(events), "user_id", kernel)
