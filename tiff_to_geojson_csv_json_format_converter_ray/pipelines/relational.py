"""Generic relational operators over Ray Datasets: hash aggregation
(partial/final), top-k, distinct, broadcast joins.

These back the engine's catalog of DuckDB-oracled queries: every
aggregate is algebraic (sum/count/min/max + derived mean), computed as
per-batch Arrow partials combined over a tiny intermediate -- the
scalable alternative to a full ``groupby`` shuffle for bounded group
cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_PARTIAL_OP = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
_COMBINE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def round_like_sql(values, ndigits: int) -> pa.Array:
    """Round-half-away-from-zero computed exactly like DuckDB's ROUND
    (floor(|x| * 10^d + 0.5) / 10^d, sign restored) so rounded floats
    are BIT-identical between the engine and its SQL oracles --
    pyarrow's pc.round (half-to-even, different arithmetic) differs in
    the last ulp."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        x = values.to_numpy(zero_copy_only=False).astype(np.float64)
    else:
        x = np.asarray(values, dtype=np.float64)
    m = 10.0 ** ndigits
    out = np.where(
        x < 0, -np.floor(-x * m + 0.5) / m, np.floor(x * m + 0.5) / m
    )
    out = np.where(np.isnan(x), np.nan, out)
    return pa.array(out)


def collect_tables(ds: ray.data.Dataset) -> pa.Table | None:
    """Gather a (small!) dataset to one Arrow table on the driver."""
    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        return None
    return pa.concat_tables(parts, promote_options="default")


def hash_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    distributed_combine: bool = False,
) -> pa.Table | ray.data.Dataset:
    """Partial/final grouped aggregation.

    ``aggs``: (value_col, op, out_name) with op in sum|count|min|max.
    Default: tiny driver combine (intermediate bounded by n_blocks x
    n_groups).  ``distributed_combine=True`` routes the partials
    through a ``ds.groupby`` shuffle instead and returns a DATASET --
    the tree-reduce tier for group counts that exceed driver memory.
    """
    part_names = [f"_p{i}" for i in range(len(aggs))]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys)
        spec = []
        for (col, op, _), pn in zip(aggs, part_names):
            t = t.append_column(pn, batch[col])
            spec.append((pn, _PARTIAL_OP[op]))
        out = t.group_by(keys).aggregate(spec)
        return out.rename_columns(keys + part_names)

    partials_ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    if distributed_combine:
        import ray.data.aggregate as agg

        spec = []
        for (_, op, name), pn in zip(aggs, part_names):
            cls = {"sum": agg.Sum, "count": agg.Sum, "min": agg.Min,
                   "max": agg.Max}[op]
            spec.append(cls(pn, alias_name=name))
        return partials_ds.groupby(keys).aggregate(*spec)

    parts = collect_tables(partials_ds)
    if parts is None:
        return pa.table({k: [] for k in keys})
    spec = [
        (pn, _COMBINE_OP[op]) for (_, op, _), pn in zip(aggs, part_names)
    ]
    out = parts.group_by(keys).aggregate(spec)
    return out.rename_columns(keys + [name for _, _, name in aggs])


def top_k(
    ds: ray.data.Dataset, key: str, k: int, descending: bool = True,
    tiebreak: str | None = None,
) -> pa.Table:
    """Global top-k via per-batch partial top-k + driver combine --
    avoids a full distributed sort for small k."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        keys = [(key, "descending" if descending else "ascending")]
        if tiebreak:
            keys.append((tiebreak, "ascending"))
        idx = pc.sort_indices(batch, sort_keys=keys)[:k]
        return batch.take(idx)

    allp = collect_tables(ds.map_batches(partial, batch_format="pyarrow", batch_size=None))
    if allp is None:
        return allp
    keys = [(key, "descending" if descending else "ascending")]
    if tiebreak:
        keys.append((tiebreak, "ascending"))
    idx = pc.sort_indices(allp, sort_keys=keys)[: min(k, allp.num_rows)]
    return allp.take(idx)


def grouped_top_k(
    ds: ray.data.Dataset, group_col: str, order_col: str, k: int,
    descending: bool = True, tiebreak: str | None = None,
) -> pa.Table:
    """Per-group top-k (the windowed ROW_NUMBER <= k shape): per-batch
    partial top-k per group, tiny driver combine -- no shuffle."""
    keys = [(order_col, "descending" if descending else "ascending")]
    if tiebreak:
        keys.append((tiebreak, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[(group_col, "ascending")] + keys)
        t = batch.take(idx)
        g = t[group_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        keep = np.concatenate(
            [np.arange(s, min(s + k, e)) for s, e in zip(starts, ends)]
        ) if len(g) else np.array([], dtype=np.int64)
        return t.take(pa.array(keep))

    allp = collect_tables(ds.map_batches(partial, batch_format="pyarrow", batch_size=None))
    if allp is None:
        return allp
    # final: same per-group head over the combined partials
    idx = pc.sort_indices(allp, sort_keys=[(group_col, "ascending")] + keys)
    t = allp.take(idx)
    g = t[group_col].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    keep = np.concatenate(
        [np.arange(s, min(s + k, e)) for s, e in zip(starts, ends)]
    )
    out = t.take(pa.array(keep))
    ranks = np.concatenate(
        [np.arange(min(k, e - s)) for s, e in zip(starts, ends)]
    )
    return out.append_column("rank", pa.array(ranks.astype(np.int64)))


def distinct(ds: ray.data.Dataset, cols: list[str]) -> pa.Table:
    """Distinct tuples via per-batch unique + final unique."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    allp = collect_tables(ds.map_batches(partial, batch_format="pyarrow", batch_size=None))
    if allp is None:
        return pa.table({c: [] for c in cols})
    return allp.group_by(cols).aggregate([])


class BroadcastLookup:
    """Map-side join against a small dimension table (the engine's
    replacement for a shuffle join): dim is broadcast once, each task
    appends the looked-up columns via a vectorized Arrow join."""

    def __init__(self, dim, on: str, take_cols: list[str]):
        from ..stages.joins import _resolve

        self.dim = _resolve(dim).select([on] + take_cols)
        self.on = on
        self.take_cols = take_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.dim, keys=self.on, join_type="left outer")
