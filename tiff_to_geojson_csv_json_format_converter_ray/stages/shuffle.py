"""Wide-operation helpers: combiner-style counting and explicit
hot-key salting (BASELINE.json north_star: "groupby-on-H3-cell with
explicit salting of hot cells (urban skew)").

Three tiers, cheapest first:

1. ``partial_count``   -- combiner inside map_batches + tiny final
   combine.  No shuffle of raw rows at all; the default for counts and
   algebraic aggregates (SURVEY par.4 "pre-aggregate inside
   map_batches").
2. ``salted_groupby``  -- when per-group processing genuinely needs the
   rows co-located (map_groups): append ``salt = pix mod k`` ONLY for
   hot keys (from a cheap pre-count), groupby (key, salt), combine the
   per-salt partials.  Bounds any partition's share of a hot key by
   1/k.
3. ``ds.sort / repartition`` -- full range partitioning, last resort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def partial_count(ds: ray.data.Dataset, keys: list[str]) -> pa.Table:
    """Distributed count-by-key via per-batch combiners; returns the
    small final table {keys..., count} on the driver."""

    def combiner(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(keys)
            .append_column("_one", pa.array(np.ones(batch.num_rows, np.int64)))
            .group_by(keys)
            .aggregate([("_one", "sum")])
        )
        return out.rename_columns(keys + ["count"])

    parts = []
    schema = None
    for t in ds.map_batches(combiner, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        t = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        schema = t.schema
        if t.num_rows:
            parts.append(t)
    if not parts:
        if schema is not None:
            return schema.empty_table()
        return pa.table({k: [] for k in keys} | {"count": []})
    allp = pa.concat_tables(parts, promote_options="default")
    out = allp.group_by(keys).aggregate([("count", "sum")])
    return out.rename_columns(keys + ["count"])


def detect_hot_keys(
    counts: pa.Table, key: str, factor: float = 10.0
) -> set:
    """Keys whose count exceeds ``factor`` x the median count."""
    c = counts["count"].to_numpy(zero_copy_only=False).astype(np.float64)
    if len(c) == 0:
        return set()
    med = max(float(np.median(c)), 1.0)
    hot = counts.filter(pa.array(c > factor * med))
    return set(hot[key].to_pylist())


class SaltStage:
    """Append a ``_salt`` column: 0 for cold keys, hash(row) mod k for
    hot keys -- so a downstream groupby((key, _salt)) splits each hot
    key across k reducers."""

    def __init__(self, key: str, hot_keys: set, k: int = 8,
                 row_hash_col: str | None = None):
        self.key = key
        # Arrow value-set for the vectorized pc.is_in hot test (the
        # hot set is small -- built once per actor, applied per batch)
        self.hot = pa.array(sorted(hot_keys)) if hot_keys else None
        self.k = k
        self.row_hash_col = row_hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.hot is None:
            hot_mask = np.zeros(batch.num_rows, dtype=bool)
        else:
            hot_mask = (
                pc.is_in(batch[self.key], value_set=self.hot)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
        if self.row_hash_col and self.row_hash_col in batch.column_names:
            h = batch[self.row_hash_col].to_numpy(zero_copy_only=False)
            salt = (h % self.k).astype(np.int64)
        else:
            salt = np.arange(batch.num_rows, dtype=np.int64) % self.k
        salt = np.where(hot_mask, salt, 0)
        return batch.append_column("_salt", pa.array(salt))


def shuffled_count(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """High-cardinality tier: a true ``ds.groupby(key).count()`` shuffle
    returning a DATASET (stays distributed).  Use when the group count
    itself is too large for a driver-side combine (e.g. res-9 cells over
    10^12 rows); ``partial_count`` is the cheaper default otherwise."""
    return ds.groupby(key).count()


def shuffled_dedup_first(
    ds: ray.data.Dataset, key: str, order_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """High-cardinality exact dedup: keep the min-``order_col`` row per
    distinct ``key`` through a shuffle -- the scale-tier alternative to
    dedup.exact_dedup's broadcast winner set.

    Grouping directly on ``key`` would pay Ray's per-GROUP map_groups
    overhead once per DISTINCT KEY (corpus-cardinality); instead keys
    hash into ``num_buckets`` deterministic buckets and each bucket
    resolves all its winners in ONE vectorized pass (sort by
    (key, order) then keep the first row of each key run)."""
    from ..functions import hashing as H
    from ..functions.sketch import mix32

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if pa.types.is_integer(col.type):
            h = mix32(col.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            h = H.fnv1a_array(
                [str(x) for x in col.to_pylist()]
            ).view(np.int64)
        return batch.append_column(
            "_bkt", pa.array(np.abs(h) % num_buckets)
        )

    def first_per_key(group: pa.Table) -> pa.Table:
        k = group[key].to_numpy(zero_copy_only=False)
        o = group[order_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, k))
        ks = k[order]
        head = np.r_[True, ks[1:] != ks[:-1]]
        return group.take(pa.array(order[head])).drop_columns(["_bkt"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_bkt")
        .map_groups(first_per_key, batch_format="pyarrow")
    )


def salted_groupby_count(
    ds: ray.data.Dataset, key: str, salt_k: int = 8, hot_factor: float = 10.0
) -> pa.Table:
    """Demonstration of tier 2 on a real shuffle: pre-count (combiner),
    detect hot keys, salt, ``ds.groupby([key, _salt]).count()``, then
    combine the per-salt counts."""
    pre = partial_count(ds, [key])
    hot = detect_hot_keys(pre, key, hot_factor)
    salted = ds.map_batches(
        SaltStage(key, hot, salt_k, row_hash_col="pix"),
        batch_format="pyarrow", batch_size=None,
    )
    grouped = salted.groupby([key, "_salt"]).count()
    parts = grouped.to_pandas()  # (n_keys x salt_k) rows -- small
    out = parts.groupby(key, as_index=False)["count()"].sum()
    out = out.rename(columns={"count()": "count"})
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_by_key(
    ds: ray.data.Dataset,
    key_col: str | list[str],
    kernel,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Scale-correct replacement for ``ds.groupby(key).map_groups(f)``
    when ``key`` has data-proportional cardinality: keys hash into
    ``num_buckets`` deterministic buckets (mix32 / FNV-1a), each Ray
    group is ONE bucket, and the original per-key ``kernel`` runs on
    zero-copy slices of the bucket's equal-key runs.  Ray's ~0.2 ms
    per-group scheduling overhead (see SCALING.md) is paid per bucket;
    the per-key cost drops to a Python call + slice (~us).  The kernel
    contract is unchanged: it still sees exactly one key's rows."""
    from ..functions import hashing as H
    from ..functions.sketch import mix32

    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.int64)
        for kc in key_cols:
            col = batch[kc]
            if pa.types.is_integer(col.type):
                kv = mix32(
                    col.to_numpy(zero_copy_only=False).astype(np.int64)
                )
            else:
                kv = H.fnv1a_array(
                    [str(x) for x in col.to_pylist()]
                ).view(np.int64)
            h = h * np.int64(1000003) + kv
        return batch.append_column(
            "_bkt", pa.array(np.abs(h) % num_buckets)
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bkt"])
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            g, sort_keys=[(kc, "ascending") for kc in key_cols]
        )
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return kernel(g)
        change = np.zeros(n - 1, dtype=bool)
        for kc in key_cols:
            keys = g[kc].to_numpy(zero_copy_only=False)
            change |= keys[1:] != keys[:-1]
        bounds = np.r_[0, np.flatnonzero(change) + 1, n].astype(np.int64)
        outs = [
            kernel(g.slice(int(s), int(t - s)))
            for s, t in zip(bounds[:-1], bounds[1:])
        ]
        outs = [o for o in outs if o.num_rows] or outs[:1]
        return pa.concat_tables(outs, promote_options="default")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def skew_report(
    ds: ray.data.Dataset, key: str, top_n: int = 3
) -> pa.Table:
    """Shuffle-key skew diagnostics -- the pre-flight check the north
    rule's explicit skew handling is built on: per-key group sizes
    (tier-2 combiner count), their p50/p90/max (quantile_disc rank
    convention), the ``top_n`` heaviest keys, and the salt factor
    ``ceil(max / p50)`` a hot-cell salter would apply
    (cf. ``salted_count``).  Output: one row per heavy key, rank
    0 = heaviest, each carrying the global stats -- so the table is
    both the report and a machine-readable salting config."""
    import math

    counts = partial_count(ds, [key])
    n = counts["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    keys = counts[key].to_pylist()
    sizes = np.sort(n)
    nk = len(sizes)

    def qdisc(q: float) -> int:
        return int(sizes[max(0, math.ceil(q * nk) - 1)])

    p50, p90, mx = qdisc(0.5), qdisc(0.9), int(sizes[-1])
    salt_k = int(math.ceil(mx / p50)) if p50 > 0 else 1
    order = np.lexsort((np.asarray(keys, dtype=object), -n))[:top_n]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "key": pa.array([str(keys[int(i)]) for i in order], pa.string()),
            "key_count": pa.array(n[order]),
            "n_keys": pa.array([nk] * len(order), pa.int64()),
            "p50": pa.array([p50] * len(order), pa.int64()),
            "p90": pa.array([p90] * len(order), pa.int64()),
            "max_count": pa.array([mx] * len(order), pa.int64()),
            "salt_k": pa.array([salt_k] * len(order), pa.int64()),
        }
    )
