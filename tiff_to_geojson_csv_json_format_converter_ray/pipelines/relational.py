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


# Canonical DuckDB-ROUND kernel (re-exported for the many existing
# importers): see functions/rounding.py for the exact-tie semantics and
# the pivot_events post-mortem.
from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (  # noqa: E402,F401
    round_half_away,
    round_like_sql,
    scaled_int,
)


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
    combine_tier: str = "driver",
    max_driver_rows: int = 2_000_000,
) -> pa.Table | ray.data.Dataset:
    """Partial/final grouped aggregation.

    ``aggs``: (value_col, op, out_name) with op in sum|count|min|max.
    Default: tiny driver combine (intermediate bounded by n_blocks x
    n_groups).  ``distributed_combine=True`` routes the partials
    through a ``ds.groupby`` shuffle instead and returns a DATASET --
    the tree-reduce tier for group counts that exceed driver memory.

    ``combine_tier='auto'`` (round 4, the exact_dedup/pages_flagship
    routing pattern): materialize the partials once (object store,
    spillable) and route on their ROW COUNT -- above
    ``max_driver_rows`` the combine goes through the distributed
    bucket shuffle and only the FINAL aggregate (<= distinct groups)
    is collected; below, the driver combine as usual.  Still returns a
    Table; callers whose final aggregate itself exceeds driver memory
    should pass ``distributed_combine=True`` and keep the Dataset.
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
        # hash-BUCKET shuffle + vectorized Arrow combine per bucket.
        # Ray's native groupby().aggregate() pays per-GROUP overhead
        # (measured ~2 min for 600k groups at sf0.1); bucketing the
        # keys into n_buckets groups makes the Ray shuffle see only
        # n_buckets groups while each map_groups call combines its
        # whole bucket with one Arrow group_by kernel.  Bucket ids use
        # the engine's deterministic hashes (mix32 / FNV-1a), never
        # Python hash() (per-process seeded).
        from ..functions import hashing as _H
        from ..functions.sketch import mix32 as _mix32

        n_buckets = 64

        def bucket(batch: pa.Table) -> pa.Table:
            h = np.zeros(batch.num_rows, dtype=np.int64)
            for kcol in keys:
                col = batch[kcol]
                if pa.types.is_integer(col.type) or pa.types.is_boolean(
                    col.type
                ):
                    kv = col.to_numpy(zero_copy_only=False).astype(np.int64)
                    kv = _mix32(kv)
                elif pa.types.is_floating(col.type):
                    kv = _mix32(
                        col.to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        .view(np.int64)
                    )
                else:
                    kv = _H.fnv1a_array(
                        [str(x) for x in col.to_pylist()]
                    ).view(np.int64)
                h = h * np.int64(1000003) + kv
            return batch.append_column(
                "_bkt", pa.array(np.abs(h) % n_buckets)
            )

        spec = [
            (pn, _COMBINE_OP[op]) for (_, op, _), pn in zip(aggs, part_names)
        ]

        def combine_bucket(group: pa.Table) -> pa.Table:
            t = group.drop_columns(["_bkt"])
            out = t.group_by(keys).aggregate(spec)
            return out.rename_columns(
                keys + [name for _, _, name in aggs]
            )

        return (
            partials_ds.map_batches(
                bucket, batch_format="pyarrow", batch_size=None
            )
            .groupby("_bkt")
            .map_groups(combine_bucket, batch_format="pyarrow")
        )

    if combine_tier == "auto":
        partials_ds = partials_ds.materialize()
        if partials_ds.count() > max_driver_rows:
            final = hash_aggregate(
                partials_ds.map_batches(
                    lambda t: t.rename_columns(
                        keys + [c for _, _, c in aggs]
                    ),
                    batch_format="pyarrow", batch_size=None,
                ),
                keys,
                [(c, _SECOND_LEVEL_OP[op], c) for _, op, c in aggs],
                distributed_combine=True,
            )
            out = collect_tables(final)
            return out if out is not None else pa.table(
                {k: [] for k in keys}
            )
    elif combine_tier != "driver":
        raise ValueError(f"unknown combine_tier: {combine_tier}")
    parts = collect_tables(partials_ds)
    if parts is None:
        return pa.table({k: [] for k in keys})
    spec = [
        (pn, _COMBINE_OP[op]) for (_, op, _), pn in zip(aggs, part_names)
    ]
    out = parts.group_by(keys).aggregate(spec)
    return out.rename_columns(keys + [name for _, _, name in aggs])


# combining partials of `op` uses this op at the second level
# (count partials combine by SUM; the rest are idempotent)
_SECOND_LEVEL_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def pivot_wide(
    ds: ray.data.Dataset,
    key_col: str,
    cat_col: str,
    categories: list[str] | None = None,
    value_col: str | None = None,
    distributed_combine: bool = False,
):
    """Long->wide pivot: one output row per key, one count column per
    category (plus a per-category value sum when ``value_col`` is
    given) -- the SQL ``COUNT(*) FILTER (WHERE cat = c)`` shape.

    Categories unknown up front are discovered with a tiny ``distinct``
    pass (category cardinality is assumed column-bounded, as in any
    pivot).  Each batch appends vectorized 0/1 indicator columns
    (``pc.equal`` -> cast int64) and the whole thing reduces to a
    grouped SUM via :func:`hash_aggregate` -- so the combiner pattern,
    skew handling and the ``distributed_combine`` scale tier all reuse
    as-is, and the pivot itself adds NO extra shuffle."""
    if categories is None:
        categories = sorted(
            distinct(ds.select_columns([cat_col]), [cat_col])[cat_col]
            .to_pylist()
        )
    cats = list(categories)

    def indicators(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        cat = batch[cat_col]
        for c in cats:
            ind = pc.cast(pc.equal(cat, c), pa.int64())
            cols[f"n_{c}"] = ind
            if value_col is not None:
                v = batch[value_col]
                # integer value columns stay int64 so the grouped sum
                # is exact (order-independent) at any partitioning
                mult = ind if pa.types.is_integer(v.type) else ind.cast(
                    pa.float64()
                )
                cols[f"sum_{c}"] = pc.multiply(mult, v)
        return pa.table(cols)

    wide = ds.map_batches(indicators, batch_format="pyarrow", batch_size=None)
    aggs = [(f"n_{c}", "sum", f"n_{c}") for c in cats]
    if value_col is not None:
        aggs += [(f"sum_{c}", "sum", f"sum_{c}") for c in cats]
    return hash_aggregate(
        wide, [key_col], aggs, distributed_combine=distributed_combine
    )


_ROLLUP_REOP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def rollup_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    distributed_combine: bool = False,
) -> pa.Table:
    """GROUP BY ROLLUP(k1, .., kn): aggregates at every prefix level
    (k1..kn), (k1..kn-1), .., () with NULLs in the rolled-up key
    columns, SQL-style.

    The INPUT is scanned exactly once -- the finest level comes from
    :func:`hash_aggregate`; every coarser level re-aggregates the
    previous level's (group-bounded, tiny) table with Arrow kernels,
    which is sound because sum/count/min/max are all re-aggregable
    partials.  At 100 TB the cost is one grouped aggregate; the rollup
    ladder itself never touches raw rows."""
    finest = hash_aggregate(
        ds, keys, aggs, distributed_combine=distributed_combine
    )
    if not isinstance(finest, pa.Table):
        finest = collect_tables(finest)
    out_names = [name for _, _, name in aggs]
    levels = [finest]
    cur = finest
    for i in range(len(keys) - 1, -1, -1):
        sub = keys[:i]
        reops = [(n, _ROLLUP_REOP[op]) for (_, op, _), n in zip(aggs, out_names)]
        if sub:
            t = cur.select(sub + out_names).group_by(sub).aggregate(reops)
            t = t.rename_columns(sub + out_names)
        else:
            t = pa.table(
                {
                    n: pa.array(
                        [getattr(pc, ro)(cur[n]).as_py()],
                        cur.schema.field(n).type,
                    )
                    for n, ro in reops
                }
            )
        # null-fill the rolled-up key columns to SQL ROLLUP shape
        for k in keys[i:]:
            t = t.append_column(
                k, pa.nulls(t.num_rows, finest.schema.field(k).type)
            )
        levels.append(t.select(keys + out_names))
        cur = t.select((sub if sub else []) + out_names) if sub else t
    return pa.concat_tables([lv.select(keys + out_names) for lv in levels])


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


def _topk_head(
    tbl: pa.Table, group_col: str, sort_keys, k: int, with_rank: bool
) -> pa.Table:
    """Per-group head-k of a table (sort, segment, slice); appends the
    0-based ``rank`` column when ``with_rank``."""
    idx = pc.sort_indices(
        tbl, sort_keys=[(group_col, "ascending")] + sort_keys
    )
    t = tbl.take(idx)
    g = t[group_col].to_numpy(zero_copy_only=False)
    if not len(g):
        return (
            t.append_column("rank", pa.array([], pa.int64()))
            if with_rank else t
        )
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    keep = np.concatenate(
        [np.arange(s, min(s + k, e)) for s, e in zip(starts, ends)]
    )
    out = t.take(pa.array(keep))
    if not with_rank:
        return out
    ranks = np.concatenate(
        [np.arange(min(k, e - s)) for s, e in zip(starts, ends)]
    )
    return out.append_column("rank", pa.array(ranks.astype(np.int64)))


def grouped_top_k(
    ds: ray.data.Dataset, group_col: str, order_col: str, k: int,
    descending: bool = True, tiebreak: str | None = None,
    distributed_combine: bool = False,
) -> pa.Table | ray.data.Dataset:
    """Per-group top-k (the windowed ROW_NUMBER <= k shape): per-batch
    partial top-k per group, then a combine.

    Default: tiny driver combine (intermediate bounded by n_blocks x
    n_groups x k) -- right when group cardinality is bounded.
    ``distributed_combine=True`` hash-buckets the partials on the group
    key and finalizes each bucket in a ``groupby.map_groups`` shuffle,
    returning a DATASET -- the tier for data-proportional group counts
    (e.g. per-host caps over a web corpus, where hosts scale with the
    input and the driver must never hold k x n_hosts rows)."""
    keys = [(order_col, "descending" if descending else "ascending")]
    if tiebreak:
        keys.append((tiebreak, "ascending"))

    def partial(batch: pa.Table) -> pa.Table:
        return _topk_head(batch, group_col, keys, k, with_rank=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    if distributed_combine:
        from ..functions import hashing as _H
        from ..functions.sketch import mix32 as _mix32

        n_buckets = 64

        def bucket(batch: pa.Table) -> pa.Table:
            col = batch[group_col]
            if pa.types.is_integer(col.type):
                h = _mix32(col.to_numpy(zero_copy_only=False).astype(np.int64))
            else:
                h = _H.fnv1a_array(
                    [str(x) for x in col.to_pylist()]
                ).view(np.int64)
            return batch.append_column(
                "_bkt", pa.array(np.abs(h) % n_buckets)
            )

        return (
            partials.map_batches(bucket, batch_format="pyarrow", batch_size=None)
            .groupby("_bkt")
            .map_groups(
                lambda g: _topk_head(
                    g.drop_columns(["_bkt"]), group_col, keys, k,
                    with_rank=True,
                ),
                batch_format="pyarrow",
            )
        )

    allp = collect_tables(partials)
    if allp is None:
        return allp
    return _topk_head(allp, group_col, keys, k, with_rank=True)


def distinct(
    ds: ray.data.Dataset,
    cols: list[str],
    combine_tier: str = "driver",
    max_driver_rows: int = 2_000_000,
) -> pa.Table:
    """Distinct tuples via per-batch unique + final unique.

    ``combine_tier='auto'`` (round-4 routing pattern): materialize the
    per-batch uniques once and route on their row count -- above
    ``max_driver_rows`` the final unique goes through the distributed
    bucket shuffle (``hash_aggregate`` with an empty agg list is a
    grouped-keys pass) and only the final distinct set is collected."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(cols).group_by(cols).aggregate([])

    partials_ds = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    if combine_tier == "auto":
        partials_ds = partials_ds.materialize()
        if partials_ds.count() > max_driver_rows:
            out = collect_tables(
                hash_aggregate(
                    partials_ds.map_batches(
                        lambda t: t.append_column(
                            "_one",
                            pa.array(
                                np.ones(t.num_rows, np.int64)
                            ),
                        ),
                        batch_format="pyarrow", batch_size=None,
                    ),
                    cols, [("_one", "min", "_one")],
                    distributed_combine=True,
                )
            )
            if out is None:
                return pa.table({c: [] for c in cols})
            return out.select(cols)
    elif combine_tier != "driver":
        raise ValueError(f"unknown combine_tier: {combine_tier}")
    allp = collect_tables(partials_ds)
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


# Broadcast side must fit comfortably in every worker's heap alongside
# a streaming batch; 64 MiB of Arrow data is safe at 2-4 GiB heaps and
# still covers every dimension table that matters (TPC-H nation/region/
# customer at bench sf; admin polygons; probe lists).
BROADCAST_JOIN_MAX_BYTES = 64 << 20

_BCAST_JOIN_TYPES = {"inner": "inner", "left_outer": "left outer"}


def _broadcast_join_batch(
    batch: pa.Table, right_ref, on, right_on, join_type
) -> pa.Table:
    """Map-side equi-join against a broadcast right table: ray.put once,
    per-batch vectorized ``pa.Table.join``.  Verified (test pins it)
    byte-equal to Ray's shuffle ``Dataset.join`` for inner/left_outer,
    including null-key no-match semantics and the right-key-column
    coalescing in the output schema.  A plain task function, not an
    actor pool: the plasma get is zero-copy and ``pa.Table.join``
    rebuilds its hash table per call regardless, so an actor would add
    ~1 s pool spin-up for no state reuse."""
    from ..stages.joins import _resolve

    return batch.join(
        _resolve(right_ref), keys=list(on), right_keys=list(right_on),
        join_type=_BCAST_JOIN_TYPES[join_type],
    )


def equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 8,
    strategy: str = "auto",
    right_size_hint: int | None = None,
    skew_broadcast_cap: int = 2_000_000,
    skew_salt_buckets: int | None = None,
) -> ray.data.Dataset:
    """Size-aware equi-join router.

    ``strategy="auto"`` picks the physical plan from the right side's
    size *before* any execution: when ``right_size_hint`` (bytes -- the
    caller's on-disk estimate, e.g. ``sources.reader._disk_bytes`` on
    the parquet it read) is known and under ``BROADCAST_JOIN_MAX_BYTES``,
    the right side is collected once, ``ray.put`` once, and joined
    map-side per batch (no shuffle, no join-actor spin-up); otherwise --
    including when no hint is available -- both sides flow through Ray
    Data's hash shuffle join.  At 100 TB the hint exceeds the threshold
    and the shuffle tier runs; at bench sf the broadcast tier removes
    the ~2 s JoinOperator actor-pool spin-up that dominates small
    inputs.  ``strategy="broadcast"`` / ``"shuffle"`` force a tier
    (tests pin the two equal).  Broadcast is only valid for ``inner``
    and ``left_outer`` (unmatched-RIGHT semantics need a global view);
    other join types always shuffle.
    """
    right_on = tuple(right_on) if right_on is not None else tuple(on)
    can_broadcast = join_type in _BCAST_JOIN_TYPES
    if strategy == "auto":
        small = (
            right_size_hint is not None
            and right_size_hint < BROADCAST_JOIN_MAX_BYTES
        )
        strategy = "broadcast" if (can_broadcast and small) else "shuffle"
    if strategy == "broadcast":
        if not can_broadcast:
            raise ValueError(
                f"broadcast equi-join cannot express {join_type!r}"
            )
        import ray

        right_tbl = collect_tables(right)
        if right_tbl is None:
            right_tbl = pa.Table.from_batches([], schema=right.schema().base_schema)
        return left.map_batches(
            _broadcast_join_batch,
            fn_kwargs=dict(
                right_ref=ray.put(right_tbl), on=tuple(on),
                right_on=right_on, join_type=join_type,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    if strategy == "skew":
        return _skew_equi_join(
            left, right, on=tuple(on), right_on=right_on,
            join_type=join_type, num_partitions=num_partitions,
            broadcast_cap=skew_broadcast_cap,
            salt_buckets=skew_salt_buckets,
        )
    if strategy != "shuffle":
        raise ValueError(f"unknown join strategy {strategy!r}")
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions,
        on=tuple(on), right_on=right_on,
    )


def _skew_equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: tuple[str, ...],
    right_on: tuple[str, ...],
    join_type: str,
    num_partitions: int,
    hot_factor: float = 10.0,
    broadcast_cap: int = 2_000_000,
    salt_buckets: int | None = None,
) -> ray.data.Dataset:
    """Hot-key split join for SKEWED big-big joins (urban-cell skew:
    a handful of keys carry 100x the median row count and would
    hotspot one partition of a hash-shuffle join).

    Plan: a combiner-tier ``partial_count`` over the LEFT key finds
    hot keys (>= ``hot_factor`` x median -- the hot KEY LIST is tiny
    even when hot ROWS dominate); the right side's hot-key subset is
    materialized and routed by ROW COUNT (round 5, closing the r4
    audit note that the broadcast assumed it fits):

    - ``<= broadcast_cap`` rows: collect + ``ray.put`` once, hot left
      rows join map-side (no shuffle, no hotspot);
    - above the cap: SALTED shuffle -- each hot LEFT row gets one salt
      in ``[0, salt_buckets)``, hot RIGHT rows are replicated once per
      salt, and the hot join runs as a normal (key, salt) hash shuffle
      whose per-partition load is the hot key's rows / salt_buckets.
      Nothing is driver-collected or broadcast on this path.

    The cold remainders take the normal hash shuffle; results union.
    Only ``inner`` / ``left_outer`` (each left row lives in exactly
    one salt bucket, so unmatched-left detection survives salting;
    unmatched-RIGHT semantics would see every replica and do not).
    Both inputs are materialized once first: each side is consumed
    twice (hot/cold filters), and lazy lineage would otherwise
    re-execute the upstream per consumer."""
    import ray

    from ..stages.shuffle import detect_hot_keys, partial_count

    if join_type not in _BCAST_JOIN_TYPES:
        raise ValueError(f"skew equi-join cannot express {join_type!r}")
    if len(on) != 1 or len(right_on) != 1:
        raise ValueError("skew equi-join supports single-key joins")
    key, rkey = on[0], right_on[0]
    left = left.materialize()
    hot = detect_hot_keys(
        partial_count(left, [key]), key, factor=hot_factor
    )
    if not hot:
        return left.join(
            right, join_type=join_type, num_partitions=num_partitions,
            on=on, right_on=right_on,
        )
    right = right.materialize()
    hot_arr = pa.array(sorted(hot))

    def keep(col: str, is_hot: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.is_in(t[col], value_set=hot_arr)
            return t.filter(m if is_hot else pc.invert(m))

        return fn

    kwargs = {"batch_format": "pyarrow", "batch_size": None}
    right_hot_ds = right.map_batches(keep(rkey, True), **kwargs).materialize()
    if right_hot_ds.count() <= broadcast_cap:
        right_hot = collect_tables(right_hot_ds)
        if right_hot is None:
            right_hot = right.schema().base_schema.empty_table()
        hot_joined = left.map_batches(keep(key, True), **kwargs).map_batches(
            _broadcast_join_batch,
            fn_kwargs=dict(
                right_ref=ray.put(right_hot), on=on,
                right_on=right_on, join_type=join_type,
            ),
            **kwargs,
        )
    else:
        nsalt = salt_buckets or max(2, num_partitions)
        salt_l, salt_r = "_skew_salt_l", "_skew_salt_r"

        def add_salt(t: pa.Table) -> pa.Table:
            # cheap deterministic spread: row position within the
            # batch mod nsalt (batches are large relative to nsalt, so
            # every bucket fills; no RNG -- reruns are identical)
            s = np.arange(t.num_rows, dtype=np.int64) % nsalt
            return t.append_column(salt_l, pa.array(s))

        def replicate(t: pa.Table) -> pa.Table:
            idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), nsalt)
            rep = t.take(pa.array(idx))
            s = np.tile(np.arange(nsalt, dtype=np.int64), t.num_rows)
            return rep.append_column(salt_r, pa.array(s))

        hot_joined = (
            left.map_batches(keep(key, True), **kwargs)
            .map_batches(add_salt, **kwargs)
            .join(
                right_hot_ds.map_batches(replicate, **kwargs),
                join_type=join_type,
                num_partitions=num_partitions,
                on=(key, salt_l),
                right_on=(rkey, salt_r),
            )
            .map_batches(
                lambda t: t.drop_columns(
                    [c for c in (salt_l, salt_r) if c in t.column_names]
                ),
                **kwargs,
            )
        )
    cold_joined = left.map_batches(keep(key, False), **kwargs).join(
        right.map_batches(keep(rkey, False), **kwargs),
        join_type=join_type, num_partitions=num_partitions,
        on=on, right_on=right_on,
    )
    return hot_joined.union(cold_joined)


def grouped_string_agg(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    order_col: str,
    sep: str = ",",
) -> pa.Table:
    """SQL ``STRING_AGG(value, sep ORDER BY order_col)`` per group (the
    collect-to-list shape).  One keyed shuffle co-locates each group;
    the per-group kernel is a sort + Arrow ``binary_join`` -- group
    state is one group's rows, the same bound as any collect
    aggregate."""

    def kernel(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
        g = group.take(idx)
        joined = pc.binary_join(
            pa.array([g[value_col].to_pylist()], pa.list_(pa.string())),
            sep,
        )
        return pa.table({group_col: g[group_col].slice(0, 1), "agg": joined})

    out = collect_tables(
        ds.groupby(group_col).map_groups(kernel, batch_format="pyarrow")
    )
    if out is None:
        return pa.table({group_col: [], "agg": pa.array([], pa.string())})
    return out


def grouped_corr(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> pa.Table:
    """Pearson correlation per group from EXACT integer moments: x and
    y arrive as integer (cents) columns, the five sufficient statistics
    (n, Sx, Sy, Sxx, Syy, Sxy) accumulate in int64 through the standard
    combiner, and the final formula runs once per group in float64 --
    so the result is bit-reproducible at any partitioning, unlike a
    running-covariance implementation.  int64 bounds the usable range
    to Sxy < 2^63 (~1e18; at web scale feed it pre-scaled units)."""

    def moments(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                group_col: batch[group_col],
                "_n": pa.array(np.ones(len(x), np.int64)),
                "_sx": pa.array(x),
                "_sy": pa.array(y),
                "_sxx": pa.array(x * x),
                "_syy": pa.array(y * y),
                "_sxy": pa.array(x * y),
            }
        )

    m = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        [group_col],
        [(c, "sum", c) for c in ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]],
    )
    n = m["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = m["_sx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sy = m["_sy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxx = m["_sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
    syy = m["_syy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxy = m["_sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
    corr = (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    )
    return pa.table(
        {group_col: m[group_col], "corr": round_like_sql(corr, ndigits)}
    )


def grouped_zscore(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    out_col: str = "z",
    ndigits: int = 6,
) -> ray.data.Dataset:
    """Per-group z-score normalization (feature engineering's two-phase
    shape): phase 1 aggregates exact int64 moment sums per group
    (value must be integer-typed -- quantize floats upstream, cents
    style); phase 2 broadcasts the tiny (group, mean, std) table and
    standardizes each row in place.  Sample std (n-1).  Exact integer
    moments make mean/std -- and every z -- bit-reproducible at any
    partitioning."""

    def moments(batch: pa.Table) -> pa.Table:
        x = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                group_col: batch[group_col],
                "_n": pa.array(np.ones(len(x), np.int64)),
                "_sx": pa.array(x),
                "_sxx": pa.array(x * x),
            }
        )

    m = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        [group_col],
        [(c, "sum", c) for c in ["_n", "_sx", "_sxx"]],
    )
    n = m["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = m["_sx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxx = m["_sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
    mean = sx / n
    std = np.sqrt((sxx - sx * sx / n) / (n - 1))
    stats = pa.table(
        {group_col: m[group_col], "_mu": pa.array(mean), "_sd": pa.array(std)}
    )
    sref = ray.put(stats)

    def standardize(batch: pa.Table) -> pa.Table:
        st = ray.get(sref)
        idx_col = "_row"
        withe = batch.append_column(
            idx_col, pa.array(np.arange(batch.num_rows, dtype=np.int64))
        )
        j = withe.join(st, keys=group_col).sort_by(idx_col)
        x = j[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        mu = j["_mu"].to_numpy(zero_copy_only=False)
        sd = j["_sd"].to_numpy(zero_copy_only=False)
        return j.drop_columns([idx_col, "_mu", "_sd"]).append_column(
            out_col, round_like_sql((x - mu) / sd, ndigits)
        )

    return ds.map_batches(standardize, batch_format="pyarrow", batch_size=None)


def first_seen_daily(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    day_col: str = "day",
) -> pa.Table:
    """Cohort growth: new entities per day plus the running total
    (the 'first-seen' analytics shape).  Phase 1 computes global
    MIN(ts) per key through the distributed groupby shuffle -- key
    cardinality is corpus-scale, so no driver table of keys ever
    exists.  Phase 2 buckets the (already tiny per key) firsts into
    calendar days with a per-batch partial count, and the cumulative
    sum runs on the bounded day table on the driver."""
    firsts = hash_aggregate(
        ds, [key_col], [(ts_col, "min", "_fts")], distributed_combine=True
    )

    def day_key(batch: pa.Table) -> pa.Table:
        ts = batch["_fts"].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype("datetime64[us]")
        return pa.table(
            {
                day_col: pa.array(day, pa.timestamp("us")),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    daily = hash_aggregate(
        firsts.map_batches(day_key, batch_format="pyarrow", batch_size=None),
        [day_col],
        [("_one", "sum", "new_keys")],
    )
    idx = pc.sort_indices(daily, sort_keys=[(day_col, "ascending")])
    daily = daily.take(idx)
    new = daily["new_keys"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            day_col: daily[day_col],
            "new_keys": pa.array(new),
            "cum_keys": pa.array(np.cumsum(new)),
        }
    )


def grouped_mode(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    out_col: str = "mode",
) -> pa.Table:
    """Per-group mode (most frequent value, lexicographically-smallest
    tie-break -- the deterministic ROW_NUMBER()-over-count SQL shape).
    One combiner-pattern count over (group, value) pairs; the argmax
    runs over the bounded (group x value) table."""
    counts = hash_aggregate(
        ds.map_batches(
            lambda b: b.select([group_col, value_col]).append_column(
                "_one", pa.array(np.ones(b.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        [group_col, value_col],
        [("_one", "sum", "_n")],
    )
    idx = pc.sort_indices(
        counts,
        sort_keys=[
            (group_col, "ascending"),
            ("_n", "descending"),
            (value_col, "ascending"),
        ],
    )
    t = counts.take(idx)
    g = t[group_col].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    first = t.take(pa.array(starts))
    return pa.table(
        {
            group_col: first[group_col],
            out_col: first[value_col],
            "n": first["_n"].cast(pa.int64()),
        }
    )


def pareto_frontier(
    ds: ray.data.Dataset,
    max_col: str,
    min_col: str,
) -> pa.Table:
    """Skyline query: the set of (max_col, min_col) pairs not
    dominated by any other row (b dominates a when b.max >= a.max,
    b.min <= a.min, one strictly).  Classic distributed shape: each
    batch reduces to its LOCAL frontier (a local non-dominated point
    is the only kind that can survive globally), the tiny local
    frontiers union on the driver and one final scan refines.  Both
    passes are the same vectorized kernel: per distinct max value
    keep the least min, then keep values where the min strictly
    undercuts the running min over all larger max values."""

    def local_frontier(t: pa.Table) -> pa.Table:
        q = t[max_col].to_numpy(zero_copy_only=False)
        p = t[min_col].to_numpy(zero_copy_only=False)
        # least p per distinct q
        order = np.lexsort((p, -q))  # q desc, p asc
        qs, first = np.unique(-q[order], return_index=True)
        qd = -qs  # descending distinct q
        pmin = p[order][first]
        # running strict min over larger q (exclusive prefix)
        prev = np.r_[np.inf, np.minimum.accumulate(pmin)[:-1]]
        keep = pmin < prev
        return pa.table(
            {max_col: pa.array(qd[keep]), min_col: pa.array(pmin[keep])}
        )

    partials = collect_tables(
        ds.map_batches(
            lambda b: local_frontier(b.select([max_col, min_col])),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    if partials is None:
        return pa.table({max_col: [], min_col: []})
    return local_frontier(partials)


def cohort_retention(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
) -> pa.Table:
    """Retention matrix: for each cohort day (a key's first active
    day) and day offset, the number of distinct keys active that many
    days later.  One groupby shuffle co-locates each key's distinct
    active days; the per-key kernel emits (cohort, offset) pairs;
    a combiner count collapses them to the bounded days x offsets
    table.  No driver-side key table at any point."""

    def day_pairs(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)  # days since epoch
        return pa.table(
            {key_col: batch[key_col], "_day": pa.array(day)}
        ).group_by([key_col, "_day"]).aggregate([])

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow", batch_size=None)

    def per_key(group: pa.Table) -> pa.Table:
        # per-batch distinct is only local -- dedupe the key's days here
        d = np.unique(group["_day"].to_numpy(zero_copy_only=False))
        cohort = int(d.min())
        return pa.table(
            {
                "cohort_day": pa.array(
                    np.full(len(d), cohort), pa.int64()
                ),
                "day_offset": pa.array(d - cohort),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    from ..stages.shuffle import grouped_by_key

    offsets = grouped_by_key(pairs, key_col, per_key)
    out = hash_aggregate(
        offsets, ["cohort_day", "day_offset"], [("_one", "sum", "n_users")]
    )
    return pa.table(
        {
            "cohort_day": pc.cast(
                pc.multiply(out["cohort_day"], 86_400_000_000), pa.timestamp("us")
            ),
            "day_offset": out["day_offset"],
            "n_users": out["n_users"],
        }
    )


def decayed_counts(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    ref_day: str,
    half_life_days: int = 1,
    horizon: int = 40,
) -> pa.Table:
    """Exponentially time-decayed counts per group: each event weighs
    2^-(age_in_half_lives), ages beyond ``horizon`` half-lives weigh
    0.  The weight is carried as the INTEGER 2^(horizon - k), so the
    partial/final sums are int64-exact and partitioning-invariant --
    the float score materializes only at the very end (sum / 2^horizon).
    SQL-reproducible via the same bit-shift."""
    ref = np.datetime64(ref_day, "D")

    def weigh(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        age = (ref - ts.astype("datetime64[D]")).astype(np.int64)
        k = age // half_life_days
        w = np.where(
            (k >= 0) & (k <= horizon),
            np.int64(1) << np.maximum(horizon - k, 0),
            np.int64(0),
        )
        return pa.table({group_col: batch[group_col], "_w": pa.array(w)})

    out = hash_aggregate(
        ds.map_batches(weigh, batch_format="pyarrow", batch_size=None),
        [group_col],
        [("_w", "sum", "_wsum")],
    )
    score = out["_wsum"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            group_col: out[group_col],
            "decayed_n": pa.array(score / float(1 << horizon)),
        }
    )


def cube_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    distributed_combine: bool = False,
) -> pa.Table:
    """GROUP BY CUBE(k1..kn): aggregates at EVERY subset of the keys
    (2^n grouping sets), NULL-filled SQL-style.  Like
    :func:`rollup_aggregate`, the raw input is scanned exactly once;
    every grouping set re-aggregates the finest level's bounded table
    (sound for algebraic sum/count/min/max partials)."""
    from itertools import combinations

    finest = hash_aggregate(
        ds, keys, aggs, distributed_combine=distributed_combine
    )
    if not isinstance(finest, pa.Table):
        finest = collect_tables(finest)
    out_names = [name for _, _, name in aggs]
    reops = [
        (n, _ROLLUP_REOP[op]) for (_, op, _), n in zip(aggs, out_names)
    ]
    levels = [finest.select(keys + out_names)]
    for r in range(len(keys) - 1, -1, -1):
        for sub in combinations(keys, r):
            sub = list(sub)
            if sub:
                t = finest.select(sub + out_names).group_by(sub).aggregate(reops)
                t = t.rename_columns(sub + out_names)
            else:
                t = pa.table(
                    {
                        n: pa.array(
                            [getattr(pc, ro)(finest[n]).as_py()],
                            finest.schema.field(n).type,
                        )
                        for n, ro in reops
                    }
                )
            for k in keys:
                if k not in sub:
                    t = t.append_column(
                        k, pa.nulls(t.num_rows, finest.schema.field(k).type)
                    )
            levels.append(t.select(keys + out_names))
    return pa.concat_tables(levels)


def corr_matrix(
    ds: ray.data.Dataset,
    cols: list[str],
    ndigits: int = 6,
) -> pa.Table:
    """Pairwise Pearson correlation matrix over INTEGER-VALUED columns
    from ONE pass: per-batch int64 moment sums (n, sx_i, sx_i^2,
    sx_i*x_j) combine exactly at any partitioning; the closed form
    (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)) runs
    once on the tiny moment table, ordered identically to the SQL
    oracle.  Columns must already be int64 (quantize floats first --
    cents / ticks -- exactly as the oracle does)."""
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]

    def moments(batch: pa.Table) -> pa.Table:
        vals = {c: batch[c].to_numpy(zero_copy_only=False) for c in cols}
        out = {"n": pa.array([np.int64(batch.num_rows)])}
        for c in cols:
            out[f"s_{c}"] = pa.array([vals[c].sum()])
            out[f"ss_{c}"] = pa.array([(vals[c] * vals[c]).sum()])
        for i, j in pairs:
            a, b = cols[i], cols[j]
            out[f"sp_{a}_{b}"] = pa.array([(vals[a] * vals[b]).sum()])
        return pa.table(out)

    parts = collect_tables(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None)
    )
    tot = {name: int(pc.sum(parts[name]).as_py()) for name in parts.column_names}
    n = float(tot["n"])
    ca, cb, corr = [], [], []
    for i, j in pairs:
        a, b = cols[i], cols[j]
        sx, sy = float(tot[f"s_{a}"]), float(tot[f"s_{b}"])
        sxx, syy = float(tot[f"ss_{a}"]), float(tot[f"ss_{b}"])
        sxy = float(tot[f"sp_{a}_{b}"])
        denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        ca.append(a)
        cb.append(b)
        corr.append((n * sxy - sx * sy) / denom if denom else float("nan"))
    return pa.table(
        {
            "col_a": pa.array(ca),
            "col_b": pa.array(cb),
            "corr": round_like_sql(pa.array(corr), ndigits),
        }
    )


def grouped_regression(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    ndigits: int = 6,
) -> pa.Table:
    """Per-group simple linear regression (least squares y on x) from
    EXACT int64 moments -- the same combiner discipline as
    ``grouped_corr``: x/y must arrive integer-valued (caller quantizes
    to cents/ticks as the oracle does), the five sufficient statistics
    (n, Sx, Sy, Sxx, Sxy) sum exactly at any partitioning, and the
    closed forms slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
    intercept = (Sy - slope*Sx) / n run once per group in float64.
    Matches SQL regr_slope/regr_intercept semantics without their
    running-covariance order sensitivity."""

    def moments(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                group_col: batch[group_col],
                "_n": pa.array(np.ones(len(x), np.int64)),
                "_sx": pa.array(x),
                "_sy": pa.array(y),
                "_sxx": pa.array(x * x),
                "_sxy": pa.array(x * y),
            }
        )

    m = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        [group_col],
        [(c, "sum", c) for c in ["_n", "_sx", "_sy", "_sxx", "_sxy"]],
    )
    n = m["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = m["_sx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sy = m["_sy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxx = m["_sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxy = m["_sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table(
        {
            group_col: m[group_col],
            "slope": round_like_sql(slope, ndigits),
            "intercept": round_like_sql(intercept, ndigits),
        }
    )


def grouped_entropy(
    ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    ndigits: int = 6,
) -> pa.Table:
    """Shannon entropy (nats) of the ``item_col`` distribution within
    each group: distributed (group, item) counts via the combiner
    pattern, then the algebraically stable form
    H = ln(tot) - sum(n*ln(n))/tot on the driver -- intermediate is
    bounded by |groups| x |items|, never by rows."""

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: batch[group_col],
                item_col: batch[item_col],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(ones, batch_format="pyarrow", batch_size=None),
        [group_col, item_col],
        [("_one", "sum", "n")],
    )
    # tiny per-(group,item) table; order the per-group reduction by
    # item so the float sum is deterministic
    counts = counts.sort_by([(group_col, "ascending"), (item_col, "ascending")])
    groups = counts[group_col].to_pylist()
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    out_g, out_h = [], []
    i = 0
    while i < len(groups):
        j = i
        while j < len(groups) and groups[j] == groups[i]:
            j += 1
        tot = n[i:j].sum()
        h = np.log(tot) - float((n[i:j] * np.log(n[i:j])).sum()) / tot
        out_g.append(groups[i])
        out_h.append(h)
        i = j
    return pa.table(
        {
            group_col: pa.array(out_g, counts[group_col].type),
            "entropy": round_like_sql(np.asarray(out_h), ndigits),
        }
    )


def grouped_geomean(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    ndigits: int = 6,
    scale: float = 1e12,
) -> pa.Table:
    """Per-group geometric mean exp(mean(ln x)) with the log sums
    carried as FIXED-POINT int64 (round(ln(x)*1e12), DuckDB ROUND
    parity) so the combine is exact at any partitioning; the final
    exp(sum / (n*scale)) runs once per group."""

    def logs(batch: pa.Table) -> pa.Table:
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        q = (
            round_like_sql(np.log(v) * scale, 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                group_col: batch[group_col],
                "_n": pa.array(np.ones(len(v), np.int64)),
                "_slog": pa.array(q),
            }
        )

    m = hash_aggregate(
        ds.map_batches(logs, batch_format="pyarrow", batch_size=None),
        [group_col],
        [("_n", "sum", "_n"), ("_slog", "sum", "_slog")],
    )
    n = m["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = m["_slog"].to_numpy(zero_copy_only=False).astype(np.float64)
    gm = np.exp(s / (n * scale))
    return pa.table(
        {group_col: m[group_col], "geomean": round_like_sql(gm, ndigits)}
    )


def longest_streaks(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
) -> ray.data.Dataset:
    """Gaps-and-islands: longest run of CONSECUTIVE active days per
    user.  Stage 1 shrinks the stream to distinct (user, epoch_day)
    pairs inside each batch (bounded by users x days, not rows); the
    groupby shuffle then keys on user only, and the per-group kernel
    sorts the day set and takes the longest diff==1 run vectorized.
    Per-group state is bounded by the calendar span, never by events."""

    def days(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        t = pa.table({user_col: batch[user_col], "day": pa.array(day)})
        return t.group_by([user_col, "day"]).aggregate([])

    def streak(group: pa.Table) -> pa.Table:
        d = np.unique(group["day"].to_numpy(zero_copy_only=False))
        if len(d) == 0:
            return pa.table({user_col: [], "max_streak": []})
        # positions where a new run starts (gap > 1 day)
        breaks = np.flatnonzero(np.diff(d) != 1)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(d) - 1]))
        best = int((ends - starts + 1).max())
        return pa.table(
            {
                user_col: group[user_col].slice(0, 1),
                "max_streak": pa.array([best], pa.int64()),
            }
        )

    from ..stages.shuffle import grouped_by_key

    distinct_days = ds.map_batches(days, batch_format="pyarrow", batch_size=None)
    return grouped_by_key(distinct_days, user_col, streak)


def unpivot(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "measure",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Wide -> long reshape (SQL UNPIVOT): each input row yields one
    output row per entry of ``value_cols``, all cast to float64.
    Pure per-batch Arrow concat -- no shuffle, streams at any scale."""

    def melt(batch: pa.Table) -> pa.Table:
        pieces = []
        for vc in value_cols:
            t = batch.select(id_cols)
            t = t.append_column(
                name_col, pa.array([vc] * batch.num_rows, pa.string())
            )
            t = t.append_column(value_col, batch[vc].cast(pa.float64()))
            pieces.append(t)
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=None)


def coerce_empty_blocks(
    ds: ray.data.Dataset, schema: pa.Schema
) -> ray.data.Dataset:
    """Normalize ZERO-COLUMN empty blocks (which Ray's distributed
    groupby/aggregate can emit for empty hash partitions) to empty
    blocks WITH the given schema.  Arrow's hash join rejects a
    schema-less side ("no match for FieldRef"), so any groupby output
    that feeds ``Dataset.join`` must pass through this."""

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return batch

    return ds.map_batches(fix, batch_format="pyarrow", batch_size=None)


def grouping_sets_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    sets: list[list[str]],
    aggs: list[tuple[str, str, str]],
    distributed_combine: bool = False,
) -> pa.Table:
    """GROUP BY GROUPING SETS (explicit subsets of ``keys``): like
    :func:`cube_aggregate` but only the requested sets.  The raw input
    is scanned ONCE at the finest level; every set re-aggregates that
    bounded table (sound for algebraic sum/count/min/max)."""
    finest = hash_aggregate(
        ds, keys, aggs, distributed_combine=distributed_combine
    )
    if not isinstance(finest, pa.Table):
        finest = collect_tables(finest)
    out_names = [name for _, _, name in aggs]
    reops = [
        (n, _ROLLUP_REOP[op]) for (_, op, _), n in zip(aggs, out_names)
    ]
    levels = []
    for sub in sets:
        sub = list(sub)
        if sorted(sub) == sorted(keys):
            t = finest.select(keys + out_names)
            levels.append(t)
            continue
        if sub:
            t = finest.select(sub + out_names).group_by(sub).aggregate(reops)
            t = t.rename_columns(sub + out_names)
        else:
            t = pa.table(
                {
                    n: pa.array(
                        [getattr(pc, ro)(finest[n]).as_py()],
                        finest.schema.field(n).type,
                    )
                    for n, ro in reops
                }
            )
        for k in keys:
            if k not in sub:
                t = t.append_column(
                    k, pa.nulls(t.num_rows, finest.schema.field(k).type)
                )
        levels.append(t.select(keys + out_names))
    return pa.concat_tables(levels)


def markov_transitions(
    ds: ray.data.Dataset,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> pa.Table:
    """First-order transition counts of ``state_col`` sequences per
    key (the sessionized-path / clickstream Markov matrix): groupby
    shuffle on the key, per-group vectorized sort + shift emits each
    group's LOCAL (src, dst) histogram (state-vocabulary bounded), and
    the standard combiner sums them globally.  Per-group state is
    bounded by that key's event count."""

    def pairs(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(c, "ascending") for c in order_cols]
        )
        st = group[state_col].take(idx)
        if len(st) < 2:
            return pa.table(
                {
                    "src": pa.array([], pa.string()),
                    "dst": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        t = pa.table({"src": st.slice(0, len(st) - 1), "dst": st.slice(1)})
        out = t.group_by(["src", "dst"]).aggregate([("src", "count")])
        return out.rename_columns(["src", "dst", "cnt"])

    from ..stages.shuffle import grouped_by_key

    local = grouped_by_key(ds, key_col, pairs)
    return hash_aggregate(local, ["src", "dst"], [("cnt", "sum", "n")])


def association_rules(
    ds: ray.data.Dataset,
    basket_cols: list[str],
    item_col: str,
    ndigits: int = 6,
) -> pa.Table:
    """Market-basket pair statistics: baskets are the distinct
    ``basket_cols`` keys, items the distinct ``item_col`` values per
    basket.  Per unordered item pair (a < b): co-occurrence count and
    lift = P(ab) / (P(a) P(b)) = n_ab * n_baskets / (n_a * n_b).

    Plan: one distributed pass shrinks the stream to distinct (basket,
    item) rows inside each batch; the groupby shuffle keys on the
    basket; the per-group kernel emits that basket's item pairs
    (item-vocabulary bounded per basket); pair partials combine via the
    standard aggregate.  All counts are exact integers, so lift is
    bit-reproducible at any partitioning."""

    def dedupe(batch: pa.Table) -> pa.Table:
        t = batch.select(basket_cols + [item_col])
        return t.group_by(basket_cols + [item_col]).aggregate([])

    distinct_items = ds.map_batches(
        dedupe, batch_format="pyarrow", batch_size=None
    )

    def pairs(group: pa.Table) -> pa.Table:
        # one basket (post-shuffle, so batch-level dupes are gone);
        # a second dedupe guards cross-batch duplicates
        items = sorted(set(group[item_col].to_pylist()))
        a, b = [], []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                a.append(items[i])
                b.append(items[j])
        return pa.table(
            {
                "item_a": pa.array(a, pa.string()),
                "item_b": pa.array(b, pa.string()),
                "_one": pa.array(np.ones(len(a), np.int64)),
            }
        )

    pair_counts = hash_aggregate(
        distinct_items.groupby(basket_cols).map_groups(
            pairs, batch_format="pyarrow"
        ),
        ["item_a", "item_b"],
        [("_one", "sum", "n_both")],
    )

    def singles(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_one", pa.array(np.ones(batch.num_rows, np.int64))
        )

    # dedupe is only batch-local above, so the same (basket, item) can
    # reach here from several batches: global dedupe keyed on the FULL
    # triple runs through the DISTRIBUTED groupby (the triple space is
    # basket-scale -- never driver-held), then the per-item marginal
    # reduces over the item-bounded second aggregate
    triples = hash_aggregate(
        distinct_items.map_batches(
            singles, batch_format="pyarrow", batch_size=None
        ),
        basket_cols + [item_col],
        [("_one", "min", "_one")],
        distributed_combine=True,
    )
    item_counts = hash_aggregate(
        triples, [item_col], [("_one", "sum", "n_item")]
    )

    def basket_one(batch: pa.Table) -> pa.Table:
        t = batch.select(basket_cols)
        out = t.group_by(basket_cols).aggregate([])
        return out.append_column(
            "_one", pa.array(np.ones(out.num_rows, np.int64))
        )

    # basket count: distributed distinct, only the scalar count leaves
    baskets = hash_aggregate(
        ds.map_batches(basket_one, batch_format="pyarrow", batch_size=None),
        basket_cols,
        [("_one", "min", "_one")],
        distributed_combine=True,
    )
    n_baskets = baskets.count()

    ic = dict(
        zip(item_counts[item_col].to_pylist(),
            item_counts["n_item"].to_numpy(zero_copy_only=False))
    )
    na = np.array(
        [ic[v] for v in pair_counts["item_a"].to_pylist()], dtype=np.float64
    )
    nb = np.array(
        [ic[v] for v in pair_counts["item_b"].to_pylist()], dtype=np.float64
    )
    n_both = pair_counts["n_both"].to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    lift = n_both * float(n_baskets) / (na * nb)
    return pa.table(
        {
            "item_a": pair_counts["item_a"],
            "item_b": pair_counts["item_b"],
            "n_both": pair_counts["n_both"].cast(pa.int64()),
            "lift": round_like_sql(lift, ndigits),
        }
    )


def grouped_gini(
    ds: ray.data.Dataset,
    group_col: str,
    cents_col: str,
    ndigits: int = 6,
) -> pa.Table:
    """Per-group Gini coefficient -- a RANKED statistic computed
    distributed: one Ray sort on (group, value), then per-block
    partials of (count, sum_v, sum_localrank*v) in int64, combined on
    the driver by walking blocks IN ORDER and adding each group's
    running rank offset (global_rank*v = localrank*v + offset*v).
    Exact integer arithmetic end-to-end; ties are rank-permutation
    invariant, so the result is bit-stable at any partitioning.

        G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n   (i = 1..n asc)

    int64 bound: sum(rank * cents) < 2^63 -- at 10^12-row groups feed
    pre-scaled units."""
    s = ds.sort([group_col, cents_col])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_pylist()
        v = batch[cents_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_g, out_n, out_sx, out_srx = [], [], [], []
        i = 0
        while i < len(g):
            j = i
            while j < len(g) and g[j] == g[i]:
                j += 1
            seg = v[i:j]
            local_rank = np.arange(1, len(seg) + 1, dtype=np.int64)
            out_g.append(g[i])
            out_n.append(len(seg))
            out_sx.append(int(seg.sum()))
            out_srx.append(int((local_rank * seg).sum()))
            i = j
        return pa.table(
            {
                group_col: pa.array(out_g, batch[group_col].type),
                "_n": pa.array(out_n, pa.int64()),
                "_sx": pa.array(out_sx, pa.int64()),
                "_srx": pa.array(out_srx, pa.int64()),
            }
        )

    acc: dict = {}  # group -> [n, sx, srx] with offset applied
    for t in s.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for gv, n, sx, srx in zip(
            t[group_col].to_pylist(), t["_n"].to_pylist(),
            t["_sx"].to_pylist(), t["_srx"].to_pylist(),
        ):
            if gv in acc:
                a = acc[gv]
                a[2] += srx + a[0] * sx  # offset = rows seen so far
                a[1] += sx
                a[0] += n
            else:
                acc[gv] = [n, sx, srx]
    groups = sorted(acc)
    gini = []
    for gv in groups:
        n, sx, srx = (float(x) for x in acc[gv])
        gini.append(2.0 * srx / (n * sx) - (n + 1.0) / n)
    return pa.table(
        {
            group_col: pa.array(groups),
            "gini": round_like_sql(np.asarray(gini), ndigits),
        }
    )


def grouped_argmax(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
) -> pa.Table:
    """Latest/greatest ROW per key (the SCD upsert / QUALIFY
    ROW_NUMBER()=1 shape): each batch reduces to one candidate row per
    key present in it (vectorized sort + run-boundary take, no Python
    loop over rows), candidates combine with the identical reduction
    on the driver -- intermediate bounded by keys x blocks."""

    def reduce_tbl(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        asc = [(c, "ascending") for c in key_cols + order_cols]
        idx = pc.sort_indices(t, sort_keys=asc)
        t = t.take(idx)
        # last row of each key run wins (max order within key)
        keys = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        is_last = np.ones(t.num_rows, dtype=bool)
        for k in keys:
            is_last[:-1] &= k[:-1] != k[1:]
        # the final row is always a run end
        return t.filter(pa.array(is_last))

    cands = collect_tables(
        ds.map_batches(
            lambda b: reduce_tbl(b), batch_format="pyarrow", batch_size=None
        )
    )
    if cands is None:
        return None
    return reduce_tbl(cands)


def grouped_percent_rank(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    ndigits: int = 6,
) -> pa.Table:
    """PERCENT_RANK of each DISTINCT value within its group, for
    bounded-cardinality value columns: per-(group, value) counts via
    the combiner, then rank = (# strictly smaller) and
    pr = rank / (n - 1) on the tiny count table.  Matches SQL
    PERCENT_RANK row semantics because tied rows share the rank."""

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: batch[group_col],
                val_col: batch[val_col],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(ones, batch_format="pyarrow", batch_size=None),
        [group_col, val_col],
        [("_one", "sum", "n")],
    ).sort_by([(group_col, "ascending"), (val_col, "ascending")])
    g = counts[group_col].to_pylist()
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    pr = np.zeros(len(g), dtype=np.float64)
    i = 0
    while i < len(g):
        j = i
        while j < len(g) and g[j] == g[i]:
            j += 1
        seg = n[i:j]
        tot = seg.sum()
        below = np.concatenate(([0], np.cumsum(seg)[:-1]))
        pr[i:j] = below / (tot - 1) if tot > 1 else 0.0
        i = j
    return pa.table(
        {
            group_col: counts[group_col],
            val_col: counts[val_col],
            "pct_rank": round_like_sql(pr, ndigits),
        }
    )


def profile_columns(
    ds: ray.data.Dataset,
    numeric_cols: list[str],
    categorical_cols: list[str],
    ndigits: int = 6,
) -> pa.Table:
    """Data-quality profile (the Deequ/profiler shape): one row per
    column with row count, null count, EXACT distinct count, and
    numeric min/max.  Counts/min/max come from ONE combiner pass over
    all columns; each distinct count routes its column through the
    distributed groupby (value cardinality is column-scale, never
    driver-held) and reads back only the scalar."""
    cols = list(numeric_cols) + list(categorical_cols)

    def partial(batch: pa.Table) -> pa.Table:
        out = {"_k": pa.array([np.int64(0)])}
        out["_n"] = pa.array([np.int64(batch.num_rows)])
        for c in cols:
            out[f"null_{c}"] = pa.array(
                [np.int64(batch[c].null_count)]
            )
        for c in numeric_cols:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[np.isfinite(v)]
            out[f"min_{c}"] = pa.array(
                [float(v.min()) if len(v) else np.inf]
            )
            out[f"max_{c}"] = pa.array(
                [float(v.max()) if len(v) else -np.inf]
            )
        return pa.table(out)

    aggs = [("_n", "sum", "_n")]
    aggs += [(f"null_{c}", "sum", f"null_{c}") for c in cols]
    aggs += [(f"min_{c}", "min", f"min_{c}") for c in numeric_cols]
    aggs += [(f"max_{c}", "max", f"max_{c}") for c in numeric_cols]
    stats = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["_k"], aggs,
    )

    # exact COUNT(DISTINCT) for ALL columns through ONE distributed
    # groupby: each batch emits (column, value-as-string) pairs deduped
    # locally, the shuffle dedupes globally, and a bounded second
    # aggregate counts per column (string cast is injective per
    # column, so distinct counts are exact)
    def explode(batch: pa.Table) -> pa.Table:
        pieces = []
        for c in cols:
            v = pc.cast(batch[c], pa.string())
            t = pa.table(
                {
                    "_col": pa.array([c] * batch.num_rows, pa.string()),
                    "_v": v,
                }
            )
            pieces.append(t.group_by(["_col", "_v"]).aggregate([]))
        out = pa.concat_tables(pieces)
        return out.append_column(
            "_one", pa.array(np.ones(out.num_rows, np.int64))
        )

    deduped = hash_aggregate(
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None),
        ["_col", "_v"], [("_one", "min", "_one")],
        distributed_combine=True,
    )
    dcounts = hash_aggregate(
        deduped, ["_col"], [("_one", "sum", "n_distinct")]
    )
    distinct_n = dict(
        zip(
            dcounts["_col"].to_pylist(),
            dcounts["n_distinct"].to_numpy(zero_copy_only=False),
        )
    )

    n = int(stats["_n"][0].as_py())
    rows = {
        "column": [], "n": [], "n_null": [], "n_distinct": [],
        "min_v": [], "max_v": [],
    }
    for c in cols:
        rows["column"].append(c)
        rows["n"].append(n)
        rows["n_null"].append(int(stats[f"null_{c}"][0].as_py()))
        rows["n_distinct"].append(int(distinct_n[c]))
        if c in numeric_cols:
            rows["min_v"].append(float(stats[f"min_{c}"][0].as_py()))
            rows["max_v"].append(float(stats[f"max_{c}"][0].as_py()))
        else:
            rows["min_v"].append(None)
            rows["max_v"].append(None)
    return pa.table(
        {
            "column": pa.array(rows["column"]),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
            "min_v": round_like_sql(
                np.array(rows["min_v"], dtype=np.float64), ndigits
            ),
            "max_v": round_like_sql(
                np.array(rows["max_v"], dtype=np.float64), ndigits
            ),
        }
    )


def theil_sen_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    sample_mod: int = 7,
    seed: int = 41,
) -> pa.Table:
    """Theil-Sen robust slope of value-cents over event time per key:
    the median of all pairwise slopes ``(y_j - y_i) / (x_j - x_i)`` --
    the estimator that shrugs off 29% outliers where least squares
    breaks.  Inputs quantize exactly (x = int64 microseconds, y =
    int64 cents) and the median is ELEMENT SELECTION (quantile_disc
    rank convention), so no float accumulation exists anywhere --
    parity with SQL is structural, not rounding-based.

    All-pairs is quadratic, so rows enter via a deterministic mix32
    hash gate (``mix32(event_id, seed) % sample_mod == 0`` -- the
    same subsample on both sides); per-key work is bounded by the
    gated group.  One keyed shuffle, vectorized pairwise kernel."""
    import math

    from ..functions.rounding import round_like_sql, scaled_int
    from ..functions.sketch import mix32
    from ..stages.shuffle import grouped_by_key

    def gate(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = mix32(eid, seed) % sample_mod == 0
        return pa.table(
            {
                key_col: batch[key_col].filter(pa.array(keep)),
                "x": pa.array(
                    batch["ts"].cast(pa.int64()).to_numpy(
                        zero_copy_only=False
                    )[keep]
                ),
                "y": pa.array(scaled_int(batch["value"], 100.0)[keep]),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        x = group["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = group["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = x[None, :] - x[:, None]
        dy = y[None, :] - y[:, None]
        iu = np.triu_indices(len(x), k=1)
        dxe, dye = dx[iu], dy[iu]
        ok = dxe != 0
        slopes = dye[ok].astype(np.float64) / dxe[ok].astype(np.float64)
        if len(slopes) == 0:
            return pa.table(
                {
                    key_col: pa.array([], group[key_col].type),
                    "n_pairs": pa.array([], pa.int64()),
                    "ts_slope": pa.array([], pa.float64()),
                }
            )
        s = np.sort(slopes)
        med = float(s[max(0, math.ceil(0.5 * len(s)) - 1)])
        return pa.table(
            {
                key_col: pa.array([group[key_col][0].as_py()]),
                "n_pairs": pa.array([len(s)], pa.int64()),
                # slopes are cents per microsecond; report per day
                "ts_slope": round_like_sql([med * 86400000000.0], 6),
            }
        )

    gated = ds.map_batches(gate, batch_format="pyarrow", batch_size=None)
    out = collect_tables(grouped_by_key(gated, key_col, kernel))
    return out.sort_by(key_col)


def ab_conversion_ztest(
    ds: ray.data.Dataset, seed: int = 13, min_purchases: int = 14
) -> pa.Table:
    """Two-proportion z-test on conversion (user made at least
    ``min_purchases`` purchases -- a threshold near the per-user
    median so both outcomes occur) between deterministic hash-split
    arms A/B -- the experimentation-analytics primitive.  Per-user
    purchase counts reduce via the combiner tier; the z statistic is
    closed-form floats over exact integer counts, identical op order
    to the SQL oracle."""
    from ..functions.sketch import mix32
    from ..stages.shuffle import partial_count

    def flags(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        conv = (
            pa.compute.equal(batch["event_type"], "purchase")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(uid),
                "arm": pa.array(mix32(uid, seed) % 2),
                "conv": pa.array(conv),
            }
        )

    per_user = hash_aggregate(
        ds.map_batches(flags, batch_format="pyarrow", batch_size=None),
        ["user_id", "arm"],
        [("conv", "sum", "n_purchases")],
    )
    arm = per_user["arm"].to_numpy(zero_copy_only=False)
    conv = (
        per_user["n_purchases"].to_numpy(zero_copy_only=False)
        >= min_purchases
    ).astype(np.int64)
    n = np.array([(arm == 0).sum(), (arm == 1).sum()], np.float64)
    k = np.array(
        [conv[arm == 0].sum(), conv[arm == 1].sum()], np.float64
    )
    p0, p1 = k[0] / n[0], k[1] / n[1]
    pool = (k[0] + k[1]) / (n[0] + n[1])
    se = np.sqrt(pool * (1.0 - pool) * (1.0 / n[0] + 1.0 / n[1]))
    z = (p0 - p1) / se
    return pa.table(
        {
            "n_a": pa.array([int(n[0])], pa.int64()),
            "n_b": pa.array([int(n[1])], pa.int64()),
            "conv_a": pa.array([int(k[0])], pa.int64()),
            "conv_b": pa.array([int(k[1])], pa.int64()),
            "rate_a": round_like_sql([p0], 6),
            "rate_b": round_like_sql([p1], 6),
            "z_stat": round_like_sql([float(z)], 6),
        }
    )


def kaplan_meier(ds: ray.data.Dataset, event_type: str = "error") -> pa.Table:
    """Kaplan-Meier survival curve for time to a user's FIRST
    ``event_type``, censored at their last observed event (standard
    right-censoring): S(t) = prod over event times <= t of
    (1 - d_i / n_i).  Per-user (origin, first-event, last-seen)
    triples reduce via the combiner tier (MIN/MAX aggregates -- no
    keyed shuffle); the curve itself is over DISTINCT event times
    (bounded by users), evaluated with the same LN-prefix form as the
    SQL window (``exp(cumsum(ln((n-d)/n)))``, ascending times).
    Returns ``(t_us, n_at_risk, n_events, survival)``."""

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        is_ev = pa.compute.equal(batch["event_type"], event_type)
        big = np.int64(2**62)
        tnp = ts.to_numpy(zero_copy_only=False)
        evt = np.where(
            is_ev.to_numpy(zero_copy_only=False), tnp, big
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "t0": pa.array(tnp),
                "tlast": pa.array(tnp),
                "terr": pa.array(evt),
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("t0", "min", "t0"), ("tlast", "max", "tlast"),
         ("terr", "min", "terr")],
    )
    t0 = peru["t0"].to_numpy(zero_copy_only=False)
    tlast = peru["tlast"].to_numpy(zero_copy_only=False)
    terr = peru["terr"].to_numpy(zero_copy_only=False)
    big = np.int64(2**62)
    observed = terr < big
    dur = np.where(observed, terr - t0, tlast - t0)
    dsort = np.sort(dur)
    ev_times, d_counts = np.unique(dur[observed], return_counts=True)
    n_at_risk = len(dur) - np.searchsorted(dsort, ev_times, side="left")
    ratio = (n_at_risk.astype(np.float64) - d_counts.astype(np.float64)) / (
        n_at_risk.astype(np.float64)
    )
    # a zero ratio (everyone at risk fails) pins survival at 0 from
    # there on; SQL's LN raises on 0, so both sides route zeros
    # through an indicator instead of the log
    zero = ratio == 0.0
    terms = np.log(np.where(zero, 1.0, ratio))
    dead = np.cumsum(zero.astype(np.int64)) > 0
    surv = np.where(dead, 0.0, np.exp(np.cumsum(terms)))
    return pa.table(
        {
            "t_us": pa.array(ev_times.astype(np.int64)),
            "n_at_risk": pa.array(n_at_risk.astype(np.int64)),
            "n_events": pa.array(d_counts.astype(np.int64)),
            "survival": round_like_sql(surv, 6),
        }
    )
