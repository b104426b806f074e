"""Sketch/sampling stages on the combiner pattern: per-batch partial
sketches, tiny driver merge -- no shuffle of raw rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import hashing as H
from ..functions.sketch import HyperLogLog, mix32


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> float:
    """Mergeable HyperLogLog distinct-count estimate of a column."""

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        vals = batch[col].to_pylist()
        if vals:
            hll.add_hashes(H.fnv1a_array([str(v) for v in vals]))
        return pa.table(
            {"registers": pa.array([hll.registers.tobytes()], pa.binary())}
        )

    merged = HyperLogLog(p)
    for t in ds.map_batches(partial, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for buf in t["registers"].to_pylist():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(buf, dtype=np.uint8).copy()
            merged = merged.merge(other)
    return merged.estimate()


def quantile_histogram(
    ds: ray.data.Dataset, col: str, bins: int = 512,
    lo: float | None = None, hi: float | None = None,
) -> "QuantileHistogram":
    """Mergeable equi-width histogram sketch for approximate quantiles:
    one cheap min/max pass (skipped when lo/hi given), then per-batch
    counts merged by addition -- any partitioning gives the identical
    sketch."""
    if lo is None or hi is None:
        from .stats import grouped_minmax

        tagged = ds.map_batches(
            lambda b: b.select([col]).append_column(
                "_g", pa.array(["x"] * b.num_rows)
            ),
            batch_format="pyarrow", batch_size=None,
        )
        mm = grouped_minmax(tagged, ["_g"], [col])
        lo = float(mm[f"min_{col}"][0].as_py())
        hi = float(mm[f"max_{col}"][0].as_py())
    width = (hi - lo) / bins if hi > lo else 1.0

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins)
        return pa.table({"counts": pa.array([counts.tolist()])})

    total = np.zeros(bins, dtype=np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for c in t["counts"].to_pylist():
            total += np.asarray(c, dtype=np.int64)
    return QuantileHistogram(lo, hi, total)


class QuantileHistogram:
    def __init__(self, lo: float, hi: float, counts: np.ndarray):
        self.lo = lo
        self.hi = hi
        self.counts = counts
        self.n = int(counts.sum())

    def quantile(self, q: float) -> float:
        """Linear interpolation within the containing bin."""
        if self.n == 0:
            return float("nan")
        target = q * self.n
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, len(self.counts) - 1)
        prev = cum[b - 1] if b > 0 else 0
        inbin = self.counts[b]
        frac = (target - prev) / inbin if inbin else 0.0
        width = (self.hi - self.lo) / len(self.counts)
        return self.lo + (b + frac) * width


def _clip_idx(v: np.ndarray, lo: float, width: float, nbins: int) -> np.ndarray:
    return np.clip(
        np.floor((v - lo) / width).astype(np.int64), 0, nbins - 1
    )


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    bins: int = 1024,
    driver_cap: int = 65536,
    max_rounds: int = 8,
    method: str = "disc",
) -> pa.Table:
    """EXACT distributed quantiles via iterative histogram refinement
    -- the scale tier of the approximate :func:`quantile_histogram`
    (ROADMAP "distributed exact quantiles").

    ``method="disc"`` (default): discrete / element-selection
    semantics, DuckDB ``quantile_disc`` rank convention (the value at
    0-based sorted index ``ceil(q*n) - 1``).  ``method="cont"``:
    linear interpolation between the two adjacent order statistics at
    h = q*(n-1) -- DuckDB ``quantile_cont`` / SQL PERCENTILE_CONT
    semantics; costs at most one extra rank selection per q.

    Each round is one distributed counting pass over clipped equi-width
    bin ids; a rank resolves when its bin holds <= ``driver_cap`` rows,
    which are then collected (ONLY that bin's slice) and selected
    exactly.  Bin membership uses the identical clipped-floor formula in
    the counting and collection passes, so float edge effects cannot
    drop or double-count a row.  Rounds needed: O(log_bins(n /
    driver_cap)) -- 10^12 rows resolve in <= 3 passes at bins=1024.
    NaN/null values are excluded (SQL aggregate semantics)."""

    def stats_partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        if not len(v):
            return pa.table({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pa.table(
            {"n": [len(v)], "lo": [float(v.min())], "hi": [float(v.max())]}
        )

    parts = _collect_tables(
        ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=None)
    )
    n = int(pa.compute.sum(parts["n"]).as_py() or 0)
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    gmin = float(pa.compute.min(parts["lo"]).as_py())
    gmax = float(pa.compute.max(parts["hi"]).as_py())

    # memoize distributed passes across rank selections: every q's
    # first refinement round is IDENTICAL (tests=[]), and method="cont"
    # selects two adjacent ranks that usually share every round -- the
    # cache turns k ranks into ~log(n) total scans instead of k*log(n)
    _count_cache: dict = {}
    _collect_cache: dict = {}

    def count_pass(tests, lo, width):
        ck = (tuple(tests), lo, width)
        if ck in _count_cache:
            return _count_cache[ck]

        def partial(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[np.isfinite(v)]
            for tlo, twidth, tnb, tb in tests:
                v = v[_clip_idx(v, tlo, twidth, tnb) == tb]
            c = np.bincount(_clip_idx(v, lo, width, bins), minlength=bins)
            return pa.table({"c": pa.array([c.tolist()])})

        total = np.zeros(bins, dtype=np.int64)
        for t in _collect_tables(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        )["c"].to_pylist():
            total += np.asarray(t, dtype=np.int64)
        _count_cache[ck] = total
        return total

    def collect_bin(tests) -> np.ndarray:
        ck = tuple(tests)
        if ck in _collect_cache:
            return _collect_cache[ck]
        _collect_cache[ck] = _collect_bin_impl(tests)
        return _collect_cache[ck]

    def _collect_bin_impl(tests) -> np.ndarray:
        def pick(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[np.isfinite(v)]
            for tlo, twidth, tnb, tb in tests:
                v = v[_clip_idx(v, tlo, twidth, tnb) == tb]
            return pa.table({"v": v})

        got = _collect_tables(
            ds.map_batches(pick, batch_format="pyarrow", batch_size=None)
        )
        return np.sort(got["v"].to_numpy(zero_copy_only=False))

    def kth(k: int) -> float:
        """0-based global rank -> exact value."""
        tests: list[tuple[float, float, int, int]] = []
        lo, hi = gmin, gmax
        below = 0
        member_count = n
        for _ in range(max_rounds):
            if member_count <= driver_cap:
                vals = collect_bin(tests)
                return float(vals[k - below])
            width = max((hi - lo) / bins, 1e-300)
            counts = count_pass(tests, lo, width)
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, k - below + 1, side="left"))
            tests.append((lo, width, bins, b))
            below += int(cum[b - 1]) if b > 0 else 0
            member_count = int(counts[b])
            lo, hi = lo + b * width, lo + (b + 1) * width
            if member_count and hi - lo <= 0:
                break  # degenerate range: all members equal
        vals = collect_bin(tests)
        return float(vals[k - below])

    out = []
    for q in qs:
        if method == "cont":
            h = q * (n - 1)
            k_lo = int(np.floor(h))
            k_hi = int(np.ceil(h))
            v_lo = kth(min(max(k_lo, 0), n - 1))
            v_hi = v_lo if k_hi == k_lo else kth(min(max(k_hi, 0), n - 1))
            out.append(v_lo + (h - k_lo) * (v_hi - v_lo))
        else:
            k = int(np.ceil(q * n)) - 1
            out.append(kth(min(max(k, 0), n - 1)))
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "value": pa.array(out, pa.float64())}
    )


def grouped_exact_quantiles(
    ds: ray.data.Dataset, key: str, col: str, qs: list[float]
) -> ray.data.Dataset:
    """EXACT per-group quantiles (``quantile_disc`` rank convention:
    value at 0-based sorted index ``ceil(q*n) - 1``) via a single
    ``groupby(key).map_groups`` shuffle -- the Ray-Data-native windowed
    form of :func:`exact_quantiles`.  Each group sorts within one task,
    so the assumption is groups fit a worker (true for bounded-
    cardinality group values like flags/languages at any table size:
    10^12 rows over k groups still means each task sees only its
    group's column slice, and numpy sorts ~10^8 doubles/s).  For a
    single giant group, fall back to :func:`exact_quantiles` on the
    filtered Dataset, which never holds the group anywhere."""

    def qfn(group: pa.Table) -> pa.Table:
        v = np.sort(group[col].to_numpy(zero_copy_only=False))
        n = len(v)
        idx = [min(max(int(np.ceil(q * n)) - 1, 0), n - 1) for q in qs]
        return pa.table(
            {
                key: pa.array([group[key][0].as_py()] * len(qs)),
                "q": pa.array(list(qs), pa.float64()),
                "value": pa.array([float(v[i]) for i in idx], pa.float64()),
            }
        )

    return ds.groupby(key).map_groups(qfn, batch_format="pyarrow")


def stratified_bottomk(
    ds: ray.data.Dataset, group_col: str, key_col: str, k: int, seed: int = 0
) -> pa.Table:
    """Deterministic per-group uniform sample: the k rows with the
    smallest ``mix32(key + seed)`` WITHIN each group (the stratified
    form of :func:`bottomk_sample`).  Combiner pattern -- each batch
    keeps at most k rows per group it contains, the tiny partials
    merge driver-side -- so no shuffle of raw rows; partitioning-
    independent and SQL-reproducible (ROW_NUMBER over mix32_sql)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix32(keys, seed)
        out = batch.append_column("_h", pa.array(h))
        idx = pc.sort_indices(
            out,
            sort_keys=[(group_col, "ascending"), ("_h", "ascending"),
                       (key_col, "ascending")],
        )
        out = out.take(idx)
        g = out[group_col].to_numpy(zero_copy_only=False)
        # rank within group on the sorted table: positions since the
        # group started (vectorized run-length ranks)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        rank = np.arange(len(g)) - np.repeat(starts, np.diff(np.r_[starts, len(g)]))
        return out.filter(pa.array(rank < k))

    allp = _collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    if allp.num_rows == 0:
        return allp
    # final combine over the (n_groups x k x n_blocks)-bounded partials
    final = partial(allp.drop_columns(["_h"]))
    return final.drop_columns(["_h"])


def _collect_tables(ds: ray.data.Dataset) -> pa.Table:
    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    return (
        pa.concat_tables(parts, promote_options="default")
        if parts
        else pa.table({})
    )


def bottomk_sample(
    ds: ray.data.Dataset, key_col: str, k: int, seed: int = 0
) -> pa.Table:
    """Deterministic uniform sample: the k rows with the smallest
    ``mix32(key + seed)``.  Partitioning-independent (per-batch top-k
    partials merge exactly); ties broken by key.  The reservoir-
    sampling stand-in whose hash a SQL oracle reproduces bit-exactly
    (functions/sketch.py::mix32_sql)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix32(keys, seed)
        out = batch.append_column("_h", pa.array(h))
        if out.num_rows <= k:
            return out
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            out, sort_keys=[("_h", "ascending"), (key_col, "ascending")]
        )[:k]
        return out.take(idx)

    parts = []
    for t in ds.map_batches(partial, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        tt = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        if tt.num_rows:
            parts.append(tt)
    allp = pa.concat_tables(parts, promote_options="default")
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        allp, sort_keys=[("_h", "ascending"), (key_col, "ascending")]
    )[: min(k, allp.num_rows)]
    return allp.take(idx).drop_columns(["_h"])


def quantile_bucket(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float] = (0.25, 0.5, 0.75),
    bins: int = 256,
    driver_cap: int = 65536,
    out_col: str = "bucket",
) -> ray.data.Dataset:
    """Quantile (NTILE-by-value) bucketing, the canonical two-phase
    shape: phase 1 computes EXACT global quantile boundaries
    (:func:`exact_quantiles`, a few counting passes); phase 2 assigns
    ``bucket = 1 + #(boundaries < v)`` per row, vectorized
    ``np.searchsorted`` against the broadcast (tiny) boundary list.
    Global statistics flow through the object store; the data itself
    never shuffles.  Value-based (ties share a bucket), so the result
    is partitioning-independent -- unlike positional NTILE."""
    bt = exact_quantiles(ds, col, list(qs), bins=bins, driver_cap=driver_cap)
    bounds = np.sort(np.asarray(bt["value"].to_pylist(), dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(bounds, v, side="left") + 1
        return batch.append_column(out_col, pa.array(b.astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def weighted_bottomk(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> pa.Table:
    """Deterministic weighted sample without replacement (A-ES /
    Efraimidis-Spirakis): priority ``u^(1/w)`` with ``u = (mix32(key) +
    1) / 2^32``; keep the k largest priorities.  Per-batch top-k
    partials merge exactly (combiner pattern, no shuffle), and the
    priority is a pure function of (key, weight), so the selection is
    partitioning-independent and SQL-reproducible via POWER over
    mix32_sql."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (mix32(keys, seed).astype(np.float64) + 1.0) / 4294967296.0
        pri = u ** (1.0 / w)
        out = batch.append_column("_pri", pa.array(pri))
        if out.num_rows <= k:
            return out
        idx = pc.sort_indices(
            out, sort_keys=[("_pri", "descending"), (key_col, "ascending")]
        )[:k]
        return out.take(idx)

    allp = _collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    if allp.num_rows == 0:
        return allp
    idx = pc.sort_indices(
        allp, sort_keys=[("_pri", "descending"), (key_col, "ascending")]
    )[: min(k, allp.num_rows)]
    return allp.take(idx).drop_columns(["_pri"])


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    capacity: int = 4096,
    min_count: int = 1,
) -> pa.Table:
    """Misra-Gries heavy hitters over a (possibly unbounded-vocab)
    column.  Per-block partials are exact in-block counts (Arrow
    group_by, block-vocab bounded); the driver folds them one block at
    a time into a CAPACITY-BOUNDED Misra-Gries summary -- so driver
    memory is O(capacity) regardless of corpus vocab, the property the
    plain word-count combiner lacks.  Returned counts UNDERCOUNT by at
    most n/(capacity+1) (the classic MG guarantee, preserved under this
    summary merge per Agarwal et al., "Mergeability of Summaries").
    With ``capacity >= distinct(col)`` no decrement ever fires and the
    result is exact -- the mode the SQL oracle pins."""
    from ..functions.sketch import MisraGries

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col]).group_by(col).aggregate([(col, "count")])
        return t.rename_columns([col, "n"])

    mg = MisraGries(capacity)
    for t in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        tt = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        if tt.num_rows:
            mg.merge_counts(tt[col].to_pylist(), tt["n"].to_pylist())
    items = [(t, c) for t, c in mg.counts.items() if c >= min_count]
    items.sort(key=lambda x: (-x[1], x[0]))
    return pa.table(
        {
            col: pa.array([t for t, _ in items], pa.string()),
            "n": pa.array([c for _, c in items], pa.int64()),
        }
    )


def cms_counts(
    ds: ray.data.Dataset,
    col: str,
    width: int = 4096,
    depth: int = 4,
    min_est: int = 1,
) -> pa.Table:
    """Count-min frequency estimates for every distinct value of
    ``col``.  Per-block exact count partials stream into ONE
    (depth x width)-bounded driver sketch -- O(width*depth) driver
    memory for unbounded vocab (the CMS counterpart of
    :func:`heavy_hitters`); the query set comes from a distinct pass
    (vocab-bounded by definition of "queryable items").  Estimates
    never undercount; with ``width`` well above the distinct count the
    sketch is collision-free in practice and the counts are exact --
    the mode the SQL oracle pins (error bounds are pytest-verified at
    adversarial widths)."""
    from ..functions.hashing import fnv1a_array
    from ..functions.sketch import CountMinSketch

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col]).group_by(col).aggregate([(col, "count")])
        return t.rename_columns([col, "n"])

    cms = CountMinSketch(width, depth)
    vocab: set = set()
    for t in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        tt = t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        if not tt.num_rows:
            continue
        items = tt[col].to_pylist()
        cms.update_hashed(
            fnv1a_array(items),
            tt["n"].to_numpy(zero_copy_only=False),
        )
        vocab.update(items)
    items = sorted(vocab)
    if not items:
        return pa.table(
            {col: pa.array([], pa.string()), "est_n": pa.array([], pa.int64())}
        )
    est = cms.query_hashed(fnv1a_array(items))
    keep = est >= min_est
    return pa.table(
        {
            col: pa.array([i for i, k in zip(items, keep) if k], pa.string()),
            "est_n": pa.array(est[keep]),
        }
    )


def hash_split(
    ds: ray.data.Dataset,
    key_col: str,
    fractions: dict[str, int] | None = None,
    seed: int = 0,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: ``mix32(key) % 100``
    lands each key in a named percent range (default 80/10/10).  A pure
    function of the key, so membership is stable under reshuffles,
    reruns and incremental appends -- the property random splits lack
    -- and a SQL CASE over mix32_sql reproduces it bit-exactly."""
    if fractions is None:
        fractions = {"train": 80, "val": 10, "test": 10}
    if sum(fractions.values()) != 100:
        raise ValueError("fractions must sum to 100")
    names = list(fractions)
    edges = np.cumsum([fractions[s] for s in names])

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = mix32(keys, seed) % np.int64(100)
        which = np.searchsorted(edges, bucket, side="right")
        lab = np.asarray(names, dtype=object)[which]
        return batch.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def _quantile_cont(sorted_v: np.ndarray, q: float) -> float:
    """DuckDB ``quantile_cont`` convention: linear interpolation at
    position q*(n-1) of the sorted values."""
    n = len(sorted_v)
    if n == 0:
        return float("nan")
    pos = q * (n - 1)
    lo = int(np.floor(pos))
    frac = pos - lo
    if frac == 0.0 or lo + 1 >= n:
        return float(sorted_v[lo])
    return float(sorted_v[lo] + (sorted_v[lo + 1] - sorted_v[lo]) * frac)


def grouped_mad(
    ds: ray.data.Dataset, key: str, col: str
) -> ray.data.Dataset:
    """Per-group median absolute deviation (robust dispersion,
    DuckDB ``mad`` semantics: interpolated median both levels) via one
    ``groupby(key).map_groups`` shuffle -- same partitioning contract
    as :func:`grouped_exact_quantiles` (bounded-cardinality keys,
    each task holds one group's column slice)."""

    def kernel(group: pa.Table) -> pa.Table:
        v = np.sort(group[col].to_numpy(zero_copy_only=False).astype(np.float64))
        med = _quantile_cont(v, 0.5)
        dev = np.sort(np.abs(v - med))
        return pa.table(
            {
                key: pa.array([group[key][0].as_py()]),
                "mad": pa.array([_quantile_cont(dev, 0.5)], pa.float64()),
            }
        )

    return ds.groupby(key).map_groups(kernel, batch_format="pyarrow")


def grouped_approx_distinct(
    ds: ray.data.Dataset, group_col: str, col: str, p: int = 12
) -> pa.Table:
    """Per-group HyperLogLog distinct estimate: each batch emits one
    register blob per group present in it (group-bounded partials),
    blobs combine by element-wise max on the driver -- intermediate
    is |groups| x 2^p bytes, never rows.  Returns (group, approx_n)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col], "_v": batch[col]})
        groups, blobs = [], []
        # per-batch group slice: sort then run boundaries (vectorized
        # boundary scan; HLL update itself is numpy)
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending")])
        t = t.take(idx)
        g = t[group_col].to_pylist()
        vals = [str(v) for v in t["_v"].to_pylist()]
        i = 0
        while i < len(g):
            j = i
            while j < len(g) and g[j] == g[i]:
                j += 1
            hll = HyperLogLog(p)
            hll.add_hashes(H.fnv1a_array(vals[i:j]))
            groups.append(g[i])
            blobs.append(hll.registers.tobytes())
            i = j
        return pa.table(
            {
                group_col: pa.array(groups, batch[group_col].type),
                "registers": pa.array(blobs, pa.binary()),
            }
        )

    merged: dict = {}
    for t in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for gv, buf in zip(t[group_col].to_pylist(), t["registers"].to_pylist()):
            regs = np.frombuffer(buf, dtype=np.uint8)
            if gv in merged:
                np.maximum(merged[gv], regs, out=merged[gv])
            else:
                merged[gv] = regs.copy()
    groups = sorted(merged)
    ests = []
    for gv in groups:
        hll = HyperLogLog(p)
        hll.registers = merged[gv]
        ests.append(hll.estimate())
    return pa.table(
        {group_col: pa.array(groups), "approx_n": pa.array(ests, pa.float64())}
    )


def grouped_kmv_distinct(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    k: int = 64,
    seed: int = 31,
) -> pa.Table:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et
    al. 2002).  Each block emits its bottom-``k`` DISTINCT
    ``mix32(col, seed)`` hashes per group; bottom-k sets merge by
    union + re-truncate (mergeable, partitioning-independent), so the
    driver holds at most ``k x n_groups x n_blocks`` rows before the
    final truncate.  ``mix32`` is a bijection on [0, 2^32), so for
    sub-2^32 integer keys the k-th smallest distinct hash is exact and
    collision-free, and the estimator ``(k-1) * 2^32 // h_(k)`` is
    bit-reproducible in SQL (integer division, no float path).
    Groups with fewer than ``k`` distinct keys captured the full
    distinct set, so the estimate is the exact count."""
    from ..functions.sketch import mix32

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col].to_numpy(zero_copy_only=False))
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = mix32(v, seed)
        order = np.lexsort((hv, g))
        g, hv = g[order], hv[order]
        if len(g):
            keep = np.ones(len(g), bool)
            keep[1:] = (g[1:] != g[:-1]) | (hv[1:] != hv[:-1])
            g, hv = g[keep], hv[keep]
        _, start = np.unique(g, return_index=True)
        ends = np.append(start[1:], len(g))
        if len(start):
            idx = np.concatenate(
                [np.arange(s, min(s + k, e)) for s, e in zip(start, ends)]
            )
        else:
            idx = np.array([], np.int64)
        return pa.table(
            {
                group_col: pa.array(g[idx], batch[group_col].type),
                "_h": pa.array(hv[idx]),
            }
        )

    parts = _collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    gg = np.asarray(parts[group_col].to_numpy(zero_copy_only=False))
    hh = parts["_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((hh, gg))
    gg, hh = gg[order], hh[order]
    keep = np.ones(len(gg), bool)
    keep[1:] = (gg[1:] != gg[:-1]) | (hh[1:] != hh[:-1])
    gg, hh = gg[keep], hh[keep]
    groups, start = np.unique(gg, return_index=True)
    ends = np.append(start[1:], len(gg))
    kth, est = [], []
    for s, e in zip(start, ends):
        if e - s >= k:
            h_k = int(hh[s + k - 1])
            kth.append(h_k)
            est.append((k - 1) * 4294967296 // h_k)
        else:
            kth.append(int(hh[e - 1]))
            est.append(int(e - s))
    return pa.table(
        {
            group_col: pa.array(groups),
            "kth_hash": pa.array(np.array(kth, np.int64)),
            "est_distinct": pa.array(np.array(est, np.int64)),
        }
    )


def ams_f2(
    ds: ray.data.Dataset,
    col: str,
    rows: int = 8,
    seed: int = 100,
) -> pa.Table:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996):
    ``rows`` independent {-1,+1} sign streams ``1 - 2*(mix32(key + r,
    seed) & 1)``; each block contributes ``rows`` int64 partial sign
    sums (pure addition -- the textbook mergeable sketch), the driver
    holds ``rows`` counters, and X_r = S_r^2 estimates F2 with the
    integer-mean ``sum(X_r) // rows``.  The exact F2 runs beside it
    through a distributed grouped count -> per-batch sum-of-squares
    partials (the corpus never collects).  All-integer end to end, so
    the SQL mirror is bit-exact."""
    from ..functions.sketch import mix32
    from ..pipelines.relational import hash_aggregate

    r_ids = np.arange(rows, dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.empty(rows, np.int64)
        for r in range(rows):
            bits = mix32(v + np.int64(r), seed) & np.int64(1)
            sums[r] = len(v) - 2 * int(bits.sum())
        return pa.table({"r": pa.array(r_ids), "s": pa.array(sums)})

    parts = _collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    rr = parts["r"].to_numpy(zero_copy_only=False)
    ss = parts["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    sign_sum = np.bincount(rr, weights=ss.astype(np.float64), minlength=rows
                           ).astype(np.int64)
    x = sign_sum * sign_sum
    est = int(x.sum()) // rows

    def one(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                col: batch[col],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(one, batch_format="pyarrow", batch_size=None),
        [col],
        [("_one", "sum", "c")],
        distributed_combine=True,
    )

    def sq_partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"f2": pa.array([int((c * c).sum())], pa.int64())})

    f2_parts = _collect_tables(
        counts.map_batches(sq_partial, batch_format="pyarrow", batch_size=None)
    )
    exact = int(
        f2_parts["f2"].to_numpy(zero_copy_only=False).astype(np.int64).sum()
    )
    return pa.table(
        {
            "r": pa.array(r_ids),
            "sign_sum": pa.array(sign_sum),
            "x": pa.array(x),
            "est_f2": pa.array(np.full(rows, est, np.int64)),
            "exact_f2": pa.array(np.full(rows, exact, np.int64)),
        }
    )


def grouped_kmv_bottomk(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    k: int = 64,
    seed: int = 31,
) -> pa.Table:
    """Per-group bottom-``k`` DISTINCT ``mix32`` hashes as rows
    ``(group, _h)`` -- the raw KMV sketch behind
    :func:`grouped_kmv_distinct`, exposed so set-operation estimators
    (union / intersection via inclusion of shared hashes in the
    merged bottom-k) can combine per-group sketches driver-side.
    Driver state: k x n_groups rows."""
    from ..functions.sketch import mix32

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch[group_col].to_numpy(zero_copy_only=False))
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = mix32(v, seed)
        order = np.lexsort((hv, g))
        g, hv = g[order], hv[order]
        if len(g):
            keep = np.ones(len(g), bool)
            keep[1:] = (g[1:] != g[:-1]) | (hv[1:] != hv[:-1])
            g, hv = g[keep], hv[keep]
        _, start = np.unique(g, return_index=True)
        ends = np.append(start[1:], len(g))
        if len(start):
            idx = np.concatenate(
                [np.arange(s, min(s + k, e)) for s, e in zip(start, ends)]
            )
        else:
            idx = np.array([], np.int64)
        return pa.table(
            {
                group_col: pa.array(g[idx], batch[group_col].type),
                "_h": pa.array(hv[idx]),
            }
        )

    parts = _collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    gg = np.asarray(parts[group_col].to_numpy(zero_copy_only=False))
    hh = parts["_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((hh, gg))
    gg, hh = gg[order], hh[order]
    keep = np.ones(len(gg), bool)
    keep[1:] = (gg[1:] != gg[:-1]) | (hh[1:] != hh[:-1])
    gg, hh = gg[keep], hh[keep]
    groups, start = np.unique(gg, return_index=True)
    ends = np.append(start[1:], len(gg))
    idx = np.concatenate(
        [np.arange(s, min(s + k, e)) for s, e in zip(start, ends)]
    ) if len(start) else np.array([], np.int64)
    return pa.table(
        {group_col: pa.array(gg[idx]), "_h": pa.array(hh[idx])}
    )
