"""Sketch/sampling stages on the combiner pattern: per-batch partial
sketches, tiny driver merge -- no shuffle of raw rows."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
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
