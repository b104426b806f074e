"""Mergeable sketches + deterministic distributed sampling.

Motivated by the retrieved sampling/sketching literature (PAPERS.md:
reservoir sampling over joins, sketch+sample group-by estimates):

- :class:`HyperLogLog` -- Flajolet et al. 2007 with the standard bias
  correction; registers merge by elementwise max, so per-batch partial
  sketches combine exactly (any partitioning -> identical estimate).
- :func:`mix32` / :func:`mix32_sql` -- a 32-bit multiplicative-xor
  integer mix built ONLY from ops that stay inside int64 (so DuckDB
  reproduces it bit-exactly: no wrapping-multiply needed).  Bottom-k
  rows by ``mix32(key ^ seed)`` is a uniform deterministic sample that
  is partitioning-independent and mergeable (keep the k smallest) --
  the distributed, deterministic stand-in for reservoir sampling.
"""

from __future__ import annotations

import numpy as np

_M32 = np.int64(4294967296)  # 2^32


def mix32(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """int64 keys -> int64 in [0, 2^32): Knuth multiplicative step +
    xorshift finalizers; every intermediate fits in int64.

    The first multiply (v < 2^32 times 2654435761) would exceed int64,
    so it is split into 16-bit halves:
    ``v*C mod 2^32 = ((v_hi*C mod 2^16) << 16) + v_lo*C  (mod 2^32)``
    with every partial < 2^48.  Negative keys are masked to their low
    32 bits up front (two's-complement ``& 0xFFFFFFFF``), which both
    NumPy and DuckDB compute identically -- unlike ``%``, whose sign
    convention differs (floored vs truncated)."""
    v = (np.asarray(x, np.int64) + np.int64(seed)) & np.int64(0xFFFFFFFF)
    hi = ((v >> np.int64(16)) * np.int64(2654435761)) & np.int64(0xFFFF)
    lo = (v & np.int64(0xFFFF)) * np.int64(2654435761)
    v = ((hi << np.int64(16)) + lo) & np.int64(0xFFFFFFFF)
    v = ((v ^ (v >> np.int64(16))) * np.int64(73244475)) % _M32
    v = ((v ^ (v >> np.int64(16))) * np.int64(73244475)) % _M32
    return v ^ (v >> np.int64(16))


def mix32_sql(col: str, seed: int = 0) -> str:
    """DuckDB expression computing mix32 identically (BIGINT-safe: the
    first multiply is split into 16-bit halves exactly like
    :func:`mix32`, and the key is masked with ``& 4294967295`` so
    negative keys agree bit-for-bit with NumPy)."""
    v0 = f"(((({col}) + {seed}) & 4294967295))"
    hi = f"((({v0} >> 16) * 2654435761) & 65535)"
    lo = f"(({v0} & 65535) * 2654435761)"
    v1 = f"(((({hi} << 16) + {lo})) & 4294967295)"
    v2 = f"(((xor({v1}, {v1} >> 16)) * 73244475) % 4294967296)"
    v3 = f"(((xor({v2}, {v2} >> 16)) * 73244475) % 4294967296)"
    return f"xor({v3}, {v3} >> 16)"


def _fmix64(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 64-bit finalizer: FNV's high bits are weak, so mix
    before taking register indexes from the top bits."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(33))
    return h


class HyperLogLog:
    """Standard HLL with 2^p registers over 64-bit hashes."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1.0 + 1.079 / self.m)
        elif p >= 7:
            self.alpha = 0.7213 / (1.0 + 1.079 / self.m)
        else:
            self.alpha = 0.673

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = _fmix64(np.asarray(hashes, np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rho = position of the leftmost 1-bit in the remaining 64-p bits
        rho = np.zeros(len(h), dtype=np.uint8)
        remaining = rest.copy()
        found = np.zeros(len(h), dtype=bool)
        for bit in range(64 - self.p):
            top = (remaining >> np.uint64(63)) & np.uint64(1)
            newly = (~found) & (top == 1)
            rho[newly] = bit + 1
            found |= newly
            remaining = remaining << np.uint64(1)
        rho[~found] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert other.p == self.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        est = self.alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)


class MisraGries:
    """Capacity-bounded frequency summary (Misra-Gries).  Holds at most
    ``capacity`` (item, count) pairs; folding in an exact partial count
    table adds the counts, then, if the summary overflows, subtracts
    the (capacity+1)-th largest count from every entry and drops the
    non-positive ones -- the summary-merge form whose error stays
    <= n/(capacity+1) (Agarwal et al., "Mergeability of Summaries",
    PODS'12).  Estimates never OVERcount; an item's true count exceeds
    its stored count by at most the total decrement."""

    def __init__(self, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.counts: dict = {}
        self.total_decrement = 0

    def merge_counts(self, items, counts) -> None:
        d = self.counts
        for t, c in zip(items, counts):
            d[t] = d.get(t, 0) + int(c)
        if len(d) > self.capacity:
            vals = sorted(d.values(), reverse=True)
            sub = vals[self.capacity]
            self.counts = {t: c - sub for t, c in d.items() if c > sub}
            self.total_decrement += sub

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.merge_counts(list(other.counts), list(other.counts.values()))
        self.total_decrement += other.total_decrement
        return self


class CountMinSketch:
    """Mergeable count-min sketch: ``depth`` rows of ``width`` int64
    counters; item row-indices come from fmix64 over an FNV-1a string
    hash xor a per-row seed, so two sketches built with the same shape
    merge by element-wise ADD (the register trick shared with
    HyperLogLog).  Point estimates NEVER undercount; overcount is
    <= 2n/width with probability 1 - 2^-depth per query (Cormode &
    Muthukrishnan 2005)."""

    _ROW_SEEDS = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD],
        dtype=np.uint64,
    )

    def __init__(self, width: int = 4096, depth: int = 4):
        if depth > len(self._ROW_SEEDS):
            raise ValueError(f"depth <= {len(self._ROW_SEEDS)}")
        self.width = int(width)
        self.depth = int(depth)
        self.reg = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for pre-hashed items."""
        h = hashes.view(np.uint64)
        out = np.empty((self.depth, len(h)), dtype=np.int64)
        for r in range(self.depth):
            out[r] = (_fmix64(h ^ self._ROW_SEEDS[r]).view(np.uint64)
                      % np.uint64(self.width)).astype(np.int64)
        return out

    def update_hashed(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        idx = self._indices(hashes)
        c = np.asarray(counts, dtype=np.int64)
        for r in range(self.depth):
            np.add.at(self.reg[r], idx[r], c)
        self.total += int(c.sum())

    def query_hashed(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._indices(hashes)
        est = self.reg[0][idx[0]]
        for r in range(1, self.depth):
            est = np.minimum(est, self.reg[r][idx[r]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("shape mismatch")
        self.reg += other.reg
        self.total += other.total
        return self
