"""Partial/final grouped statistics (reference A1-A8).

The scalable pattern: each ``map_batches`` task computes a per-batch
partial aggregate (count, sum, sumsq, min, max per group) with Arrow's
hash group_by; the tiny partials are then combined.  This replaces a
full shuffle with one map pass + a combine over (n_blocks x n_groups)
rows -- the partial/final design SURVEY par.2.5 calls for, correct for
any partitioning because all the statistics are algebraic.

Reference semantics pinned here:
- per-band stats {min,max,mean,std,count} over valid pixels, with a
  null ("Null") record when no valid pixels exist (test2.py:1381-1388);
  std is population std (np.std, ddof=0).
- bounds per file + global combine (min/min, max/max) and
  ``has_valid_data = min_z != max_z`` (completePixleOutput.py:336-355).
- sparsity labels: sparse < 10% valid, dense > 50% (test.py:94,487-504).
- A4's deliberately approximate multi-file combine (min/max/mean/std of
  the per-file extremes, get_raster_stats_direct.py:206-232) kept
  reproducible behind ``combine_extremes``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def partial_stats_batch(
    batch: pa.Table, keys: list[str], value_col: str = "z"
) -> pa.Table:
    """Per-batch partial: group rows, emit count/sum/sumsq/min/max."""
    if batch.num_rows == 0:
        empty = {k: pa.array([], batch.schema.field(k).type) for k in keys}
        empty |= {
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.float64()),
            "s2": pa.array([], pa.float64()),
            "mn": pa.array([], pa.float64()),
            "mx": pa.array([], pa.float64()),
        }
        return pa.table(empty)
    v = batch[value_col]
    sq = pc.multiply(v, v)
    t = batch.select(keys)
    t = t.append_column("_v", v).append_column("_v2", sq)
    out = t.group_by(keys).aggregate(
        [("_v", "count"), ("_v", "sum"), ("_v2", "sum"), ("_v", "min"), ("_v", "max")]
    )
    return out.rename_columns(keys + ["n", "s", "s2", "mn", "mx"])


def combine_partials(partials: pa.Table, keys: list[str]) -> pa.Table:
    """Final combine of partials -> {keys, count, sum, sumsq, min, max}."""
    out = partials.group_by(keys).aggregate(
        [("n", "sum"), ("s", "sum"), ("s2", "sum"), ("mn", "min"), ("mx", "max")]
    )
    return out.rename_columns(keys + ["count", "sum", "sumsq", "min", "max"])


def finalize_stats(combined: pa.Table) -> pa.Table:
    """Append mean/std (population) columns; groups with count 0 keep
    nulls -- the engine's representation of the reference's "Null"
    sentinel record."""
    n = combined["count"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = combined["sum"].to_numpy(zero_copy_only=False)
    s2 = combined["sumsq"].to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / n
        var = s2 / n - mean * mean
        var = np.maximum(var, 0.0)  # numeric floor
        std = np.sqrt(var)
    mean = np.where(n > 0, mean, np.nan)
    std = np.where(n > 0, std, np.nan)
    out = combined.append_column("mean", pa.array(mean))
    out = out.append_column("std", pa.array(std))
    return out


def grouped_stats(
    ds, keys: list[str], value_col: str = "z",
    combine_tier: str = "driver", max_driver_rows: int = 2_000_000,
) -> pa.Table:
    """Distributed partial aggregation over a Dataset -> small final
    Arrow table on the driver.

    ``combine_tier='driver'`` (default) collects the PARTIALS (bounded
    by n_blocks x n_groups rows) -- right when group cardinality is
    small.  ``'shuffle'`` routes the partials through a distributed
    hash-bucket groupby instead and collects only the FINAL combined
    aggregate (<= distinct groups rows) -- the tier for key spaces
    (e.g. polygons x bands at continental zonal scale) whose
    shards-x-groups partial volume exceeds driver memory (VERDICT r4
    item 5, mirroring jobs/zonal_job.py's distributed final combine).
    ``'auto'`` materializes the partials once and routes on their row
    count (``> max_driver_rows`` -> shuffle).
    """
    if combine_tier not in ("driver", "shuffle", "auto"):
        raise ValueError(f"unknown combine_tier: {combine_tier}")
    partial = ds.map_batches(
        lambda b: partial_stats_batch(b, keys, value_col),
        batch_format="pyarrow", batch_size=None,
    )
    if combine_tier != "driver":
        partial = partial.materialize()
        tier = (
            "shuffle"
            if combine_tier == "shuffle"
            or partial.count() > max_driver_rows
            else "driver"
        )
    else:
        tier = "driver"
    if tier == "shuffle":
        from ..pipelines.relational import hash_aggregate

        combined = hash_aggregate(
            partial, keys,
            [("n", "sum", "n"), ("s", "sum", "s"), ("s2", "sum", "s2"),
             ("mn", "min", "mn"), ("mx", "max", "mx")],
            distributed_combine=True,
        )
        tables, schema = _collect_with_schema(combined)
        if not tables:
            parts = _empty_partials_schema(keys, schema).empty_table()
            return finalize_stats(combine_partials(parts, keys))
        parts = pa.concat_tables(tables, promote_options="default")
        # per-key rows are already combined; combine_partials is a
        # cheap idempotent re-group that also merges table chunks
        return finalize_stats(combine_partials(parts, keys))
    tables, schema = _collect_with_schema(partial)
    if not tables:
        # every input row filtered out: empty result with the partial
        # schema (string-typed keys if Ray elided all empty blocks --
        # callers needing exact key types should handle num_rows == 0)
        parts = _empty_partials_schema(keys, schema).empty_table()
    else:
        parts = pa.concat_tables(tables, promote_options="default")
    return finalize_stats(combine_partials(parts, keys))


def _empty_partials_schema(keys: list[str], schema) -> pa.Schema:
    if schema is not None:
        return schema
    return pa.schema(
        [(k, pa.string()) for k in keys]
        + [("n", pa.int64()), ("s", pa.float64()),
           ("s2", pa.float64()), ("mn", pa.float64()),
           ("mx", pa.float64())]
    )


def _collect_with_schema(ds):
    tables = []
    schema = None
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if t.num_columns:
            schema = t.schema
        if t.num_rows:
            tables.append(t)
    return tables, schema


def _iter_tables(ds):
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            yield b if isinstance(b, pa.Table) else pa.Table.from_batches([b])


def grouped_stats_and_minmax(
    ds, keys: list[str], value_col: str, minmax_cols: list[str]
) -> pa.Table:
    """One-pass combination of :func:`grouped_stats` on ``value_col``
    and :func:`grouped_minmax` on ``minmax_cols`` (a single partial
    per batch instead of two pipeline executions)."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {k: pa.array([], batch.schema.field(k).type) for k in keys}
            cols |= {"n": pa.array([], pa.int64()),
                     "s": pa.array([], pa.float64()),
                     "s2": pa.array([], pa.float64()),
                     "mn": pa.array([], pa.float64()),
                     "mx": pa.array([], pa.float64())}
            for c in minmax_cols:
                cols[f"min_{c}"] = pa.array([], pa.float64())
                cols[f"max_{c}"] = pa.array([], pa.float64())
            return pa.table(cols)
        v = batch[value_col]
        t = batch.select(keys + minmax_cols)
        t = t.append_column("_v", v).append_column("_v2", pc.multiply(v, v))
        aggs = [("_v", "count"), ("_v", "sum"), ("_v2", "sum"),
                ("_v", "min"), ("_v", "max")]
        aggs += [(c, "min") for c in minmax_cols]
        aggs += [(c, "max") for c in minmax_cols]
        out = t.group_by(keys).aggregate(aggs)
        names = keys + ["n", "s", "s2", "mn", "mx"]
        names += [f"min_{c}" for c in minmax_cols]
        names += [f"max_{c}" for c in minmax_cols]
        return out.rename_columns(names)

    tables, schema = _collect_with_schema(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    if not tables:
        return (schema or pa.schema([])).empty_table()
    parts = pa.concat_tables(tables, promote_options="default")
    aggs = [("n", "sum"), ("s", "sum"), ("s2", "sum"), ("mn", "min"), ("mx", "max")]
    aggs += [(f"min_{c}", "min") for c in minmax_cols]
    aggs += [(f"max_{c}", "max") for c in minmax_cols]
    out = parts.group_by(keys).aggregate(aggs)
    names = keys + ["count", "sum", "sumsq", "min", "max"]
    names += [f"min_{c}" for c in minmax_cols]
    names += [f"max_{c}" for c in minmax_cols]
    return finalize_stats(out.rename_columns(names))


def grouped_minmax(
    ds, keys: list[str], cols: list[str]
) -> pa.Table:
    """Bounds aggregation (A5): per-group min/max of several columns in
    one partial/final pass; columns named min_<c> / max_<c>."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + cols)
        aggs = [(c, "min") for c in cols] + [(c, "max") for c in cols]
        out = t.group_by(keys).aggregate(aggs)
        return out.rename_columns(
            keys + [f"min_{c}" for c in cols] + [f"max_{c}" for c in cols]
        )

    parts = pa.concat_tables(
        list(_iter_tables(ds.map_batches(partial, batch_format="pyarrow", batch_size=None))),
        promote_options="default",
    )
    aggs = [(f"min_{c}", "min") for c in cols] + [(f"max_{c}", "max") for c in cols]
    out = parts.group_by(keys).aggregate(aggs)
    return out.rename_columns(
        keys + [f"min_{c}" for c in cols] + [f"max_{c}" for c in cols]
    )


def sparsity_label(valid_pct: np.ndarray) -> np.ndarray:
    """test.py:94 ('sparse' if <10% valid) + test.py:487-504 report
    buckets ('dense' >50%, else 'medium')."""
    return np.where(
        valid_pct < 10.0, "sparse", np.where(valid_pct > 50.0, "dense", "medium")
    )


def combine_extremes(per_file_stats: pa.Table) -> dict:
    """A4 (get_raster_stats_direct.py:206-232): pool each file's
    [min, max] pair, then min/max/mean/std OF THE EXTREMES -- the
    reference's documented approximation, kept for parity testing."""
    mins = per_file_stats["min"].to_numpy(zero_copy_only=False)
    maxs = per_file_stats["max"].to_numpy(zero_copy_only=False)
    counts = per_file_stats["count"].to_numpy(zero_copy_only=False)
    pooled = np.concatenate([mins, maxs]).astype(np.float64)
    pooled = pooled[np.isfinite(pooled)]
    if len(pooled) == 0:
        return {"min": None, "max": None, "mean": None, "std": None, "count": 0}
    return {
        "min": float(pooled.min()),
        "max": float(pooled.max()),
        "mean": float(pooled.mean()),
        "std": float(pooled.std()),
        "count": int(counts.sum()),
    }


def downsample_cells(
    ds, to_res: int, from_col: str = "cell_9", value_col: str = "z"
) -> pa.Table:
    """Raster pyramid step: re-aggregate pixel/point values one or more
    cell levels up (count/sum/min/max/mean/std per parent cell) -- the
    multi-resolution counterpart of the reference's regridding sink
    (completePixleOutput.py:413-465 builds one fixed grid; this builds
    the coarser level from any finer one).

    Parent ids are exact bit-shift parents of ``from_col`` (see
    functions/cells.py), so the result is identical to re-encoding the
    raw coordinates at ``to_res``.  Partial-aggregate pattern: one map
    pass emits per-batch per-cell partials; only the tiny partial
    table is combined -- no shuffle of the input.
    """
    from ..functions import cells as _cells

    out_col = f"cell_{to_res}"

    def add_parent(batch: pa.Table) -> pa.Table:
        base = batch[from_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, pa.array(_cells.parent(base, to_res))
        )

    with_parent = ds.map_batches(
        add_parent, batch_format="pyarrow", batch_size=None
    )
    return grouped_stats(with_parent, [out_col], value_col)


def idw_interpolate(
    probe_ds,
    ref_table,
    radius: float,
    value_col: str = "z",
    probe_keys: list[str] | None = None,
    power: float = 2.0,
):
    """Inverse-distance-weighted interpolation: for each probe row,
    sum(w * v) / sum(w) over reference points within ``radius``, with
    w = 1/d^power -- the scattered-points -> value counterpart of the
    grid regrid sink (reference K7), e.g. sensor readings -> arbitrary
    query locations.

    Built on the distance-band join (joins.RadiusJoin, actor-pool
    bucket-grid index over the broadcast reference table) followed by
    the partial/final weighted-sum combine -- streams at any probe
    count.  Probes with NO reference point in range are absent from
    the result (inner-join semantics).  A probe that coincides with
    reference point(s) (d == 0, where 1/d^p is undefined) gets the
    mean of its exact hits -- tracked by a separate hit-sum pair so
    the combine stays algebraic under any partitioning.  Returns a
    small Arrow table {probe_keys, idw}.
    """
    from ..pipelines.relational import hash_aggregate
    from .joins import RadiusJoin

    probe_keys = probe_keys or ["probe_id"]

    joined = probe_ds.map_batches(
        RadiusJoin(ref_table, radius=radius, payload_cols=(value_col,)),
        batch_format="pyarrow", batch_size=None,
    )

    def add_weights(batch: pa.Table) -> pa.Table:
        d = batch["dist"].to_numpy(zero_copy_only=False)
        v = batch[f"nn_{value_col}"].to_numpy(zero_copy_only=False)
        hit = d == 0.0
        with np.errstate(divide="ignore"):
            w = d ** (-power) if power != 2.0 else 1.0 / (d * d)
        w = np.where(hit, 0.0, w)
        t = batch.select(probe_keys)
        t = t.append_column("_w", pa.array(w))
        t = t.append_column("_wv", pa.array(w * v))
        t = t.append_column("_hn", pa.array(hit.astype(np.float64)))
        return t.append_column("_hv", pa.array(np.where(hit, v, 0.0)))

    weighted = joined.map_batches(
        add_weights, batch_format="pyarrow", batch_size=None
    )
    agg = hash_aggregate(
        weighted, probe_keys,
        [("_w", "sum", "sw"), ("_wv", "sum", "swv"),
         ("_hn", "sum", "hn"), ("_hv", "sum", "hv")],
    )
    sw = agg["sw"].to_numpy(zero_copy_only=False)
    swv = agg["swv"].to_numpy(zero_copy_only=False)
    hn = agg["hn"].to_numpy(zero_copy_only=False)
    hv = agg["hv"].to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore", divide="ignore"):
        idw = np.where(hn > 0, hv / np.maximum(hn, 1.0), swv / sw)
    out = agg.select(probe_keys)
    return out.append_column("idw", pa.array(idw))


def morans_i_grid(
    cell_counts: pa.Table,
    height: int,
    width: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
    n_col: str = "n",
) -> float:
    """Global Moran's I (spatial autocorrelation) of a value field over
    a FIXED height x width lattice with rook (4-neighbor) contiguity
    weights; absent cells count as zero.

        I = (N / W) * sum_ij w_ij (x_i - mu)(x_j - mu)
                     / sum_i (x_i - mu)^2

    ``cell_counts`` is the already-aggregated per-cell table (the
    distributed combiner's output, bounded by the lattice -- never by
    events), so the neighbor cross-products run as four dense numpy
    shifts, no Python loop and no pair join."""
    grid = np.zeros((height, width), dtype=np.float64)
    gx = cell_counts[gx_col].to_numpy(zero_copy_only=False).astype(np.int64)
    gy = cell_counts[gy_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = cell_counts[n_col].to_numpy(zero_copy_only=False).astype(np.float64)
    grid[gy, gx] = n

    nn = float(height * width)
    mu = grid.sum() / nn
    dev = grid - mu
    den = float((dev * dev).sum())
    if den == 0.0:
        return float("nan")
    # rook pairs, both directions: horizontal + vertical shifts
    num = 2.0 * float((dev[:, :-1] * dev[:, 1:]).sum())
    num += 2.0 * float((dev[:-1, :] * dev[1:, :]).sum())
    w = 2.0 * (height * (width - 1) + width * (height - 1))
    return (nn / w) * num / den


def convex_hull(
    ds,
    x_col: str,
    y_col: str,
) -> pa.Table:
    """Exact distributed convex hull: per-block Akl-Toussaint prune +
    local monotone chain (each block reduces to its own hull vertices,
    bounded by the block's boundary), then one final chain over the
    concatenated per-block hulls on the driver -- sound because
    hull(union) = hull(union of hulls).  Returns CCW vertices ordered
    from the lexicographically smallest."""
    from ..functions.geometry import _monotone_chain, convex_hull_candidates

    def partial(batch: pa.Table) -> pa.Table:
        h = convex_hull_candidates(
            batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
            batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
        )
        return pa.table({"x": pa.array(h[:, 0]), "y": pa.array(h[:, 1])})

    parts = []
    for t in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if t.num_rows:
            parts.append(
                np.column_stack(
                    [
                        t["x"].to_numpy(zero_copy_only=False),
                        t["y"].to_numpy(zero_copy_only=False),
                    ]
                )
            )
    if not parts:
        return pa.table(
            {"x": pa.array([], pa.float64()), "y": pa.array([], pa.float64())}
        )
    hull = _monotone_chain(np.vstack(parts))
    return pa.table({"x": pa.array(hull[:, 0]), "y": pa.array(hull[:, 1])})


def chi2_independence(
    counts: pa.Table,
    a_col: str,
    b_col: str,
    n_col: str = "n",
    ndigits: int = 6,
) -> tuple[float, int]:
    """Pearson chi-square statistic of independence from an
    already-aggregated contingency table (the distributed combiner's
    output, bounded by |A| x |B|).  ZERO cells (pairs never observed)
    contribute their expected count, as the textbook statistic
    requires.  Returns (chi2, dof)."""
    a = counts[a_col].to_pylist()
    b = counts[b_col].to_pylist()
    n = counts[n_col].to_numpy(zero_copy_only=False).astype(np.float64)
    cats_a = sorted(set(a))
    cats_b = sorted(set(b))
    ia = {v: i for i, v in enumerate(cats_a)}
    ib = {v: i for i, v in enumerate(cats_b)}
    obs = np.zeros((len(cats_a), len(cats_b)), dtype=np.float64)
    obs[[ia[v] for v in a], [ib[v] for v in b]] = n
    tot = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / tot
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = (len(cats_a) - 1) * (len(cats_b) - 1)
    return chi2, dof


def getis_ord_gi_star(
    cell_counts: pa.Table,
    height: int,
    width: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
    n_col: str = "n",
    ndigits: int = 6,
) -> pa.Table:
    """Getis-Ord Gi* hot-spot z-score per lattice cell (3x3 binary
    weights INCLUDING self; absent cells are zeros): the classic
    local spatial statistic.  Like :func:`morans_i_grid`, the input
    is the aggregated lattice-bounded count table and the neighbor
    sums run as dense numpy shifts.

        Gi* = (S_i - mu * W_i) / (s * sqrt((n*W_i - W_i^2) / (n-1)))

    with S_i the 3x3 window sum, W_i the in-bounds window size,
    mu / s the global mean / population std."""
    grid = np.zeros((height, width), dtype=np.float64)
    gx = cell_counts[gx_col].to_numpy(zero_copy_only=False).astype(np.int64)
    gy = cell_counts[gy_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v = cell_counts[n_col].to_numpy(zero_copy_only=False).astype(np.float64)
    grid[gy, gx] = v

    nn = float(height * width)
    mu = grid.sum() / nn
    s = np.sqrt((grid * grid).sum() / nn - mu * mu)

    padded = np.zeros((height + 2, width + 2), dtype=np.float64)
    padded[1:-1, 1:-1] = grid
    win = np.zeros_like(grid)
    cnt = np.zeros_like(grid)
    ones = np.zeros_like(padded)
    ones[1:-1, 1:-1] = 1.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            win += padded[1 + dy:height + 1 + dy, 1 + dx:width + 1 + dx]
            cnt += ones[1 + dy:height + 1 + dy, 1 + dx:width + 1 + dx]
    denom = s * np.sqrt((nn * cnt - cnt * cnt) / (nn - 1.0))
    z = (win - mu * cnt) / denom

    yy, xx = np.mgrid[0:height, 0:width]
    from ..pipelines.relational import round_like_sql

    return pa.table(
        {
            gx_col: pa.array(xx.ravel().astype(np.int64)),
            gy_col: pa.array(yy.ravel().astype(np.int64)),
            "gi_z": round_like_sql(z.ravel(), ndigits),
        }
    )
