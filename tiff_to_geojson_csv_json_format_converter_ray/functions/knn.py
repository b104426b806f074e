"""Nearest-neighbor lookup kernels (reference J4), pure NumPy.

The reference ships a linear-scan k=1 elevation lookup in its emitted
frontend JS (``getElevation`` reduce over all points; recovered from
``tiff_processor_enhanced.pyc`` strings, SURVEY par.2.6 J4).  The engine
keeps that exact semantic (Euclidean argmin in coordinate space) but
provides two execution paths:

- ``query_brute``  -- exact chunked-vectorized scan (the oracle path)
- ``query``        -- grid-bucketed search: points are hashed into cells
  of width ``cell``; a query inspects expanding rings of cells until the
  best distance is provably correct.  Built once per actor
  (SURVEY ST5); this is the 100-TB path where each actor holds one
  spatial partition's points.
"""

from __future__ import annotations

import numpy as np


class KNNIndex:
    def __init__(self, lon: np.ndarray, lat: np.ndarray, payload: np.ndarray | None = None, cell: float | None = None):
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        self.payload = payload if payload is None else np.asarray(payload)
        self.n = len(self.lon)
        if self.n == 0:
            raise ValueError("empty KNN index")
        if cell is None:
            # ~sqrt(n) buckets per axis over the data extent
            span = max(
                self.lon.max() - self.lon.min(), self.lat.max() - self.lat.min(), 1e-12
            )
            cell = span / max(1.0, np.sqrt(self.n))
        self.cell = float(cell)
        self.x0 = float(self.lon.min())
        self.y0 = float(self.lat.min())
        ix = np.floor((self.lon - self.x0) / self.cell).astype(np.int64)
        iy = np.floor((self.lat - self.y0) / self.cell).astype(np.int64)
        self.nx = int(ix.max()) + 1
        self.ny = int(iy.max()) + 1
        key = iy * self.nx + ix
        order = np.argsort(key, kind="stable")
        self.order = order
        sorted_key = key[order]
        # CSR-style bucket offsets
        self.bucket_starts = np.searchsorted(
            sorted_key, np.arange(self.nx * self.ny + 1)
        )

    def _bucket_members(self, bx: int, by: int) -> np.ndarray:
        if bx < 0 or by < 0 or bx >= self.nx or by >= self.ny:
            return np.empty(0, dtype=np.int64)
        b = by * self.nx + bx
        return self.order[self.bucket_starts[b] : self.bucket_starts[b + 1]]

    def query(self, qlon: np.ndarray, qlat: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """-> (indices (nq, k), distances (nq, k)); exact."""
        qlon = np.atleast_1d(np.asarray(qlon, dtype=np.float64))
        qlat = np.atleast_1d(np.asarray(qlat, dtype=np.float64))
        nq = len(qlon)
        idx_out = np.full((nq, k), -1, dtype=np.int64)
        dist_out = np.full((nq, k), np.inf)
        for qi in range(nq):
            qx, qy = qlon[qi], qlat[qi]
            bx = int(np.floor((qx - self.x0) / self.cell))
            by = int(np.floor((qy - self.y0) / self.cell))
            # First ring that can touch the grid at all: the Chebyshev
            # bucket distance from (bx, by) to the grid rectangle
            # (0 when the query bucket is inside the grid).  Rings
            # smaller than this are entirely empty -- skip them.
            ring0 = max(
                0, -bx, bx - (self.nx - 1), -by, by - (self.ny - 1)
            )
            # A query this far outside the extent would walk ~0.4*ring0
            # clamped rings of up to (nx+ny) buckets each before the
            # stop bound fires; past this break-even the exact linear
            # scan is cheaper AND O(n)-bounded (the round-1 advisory's
            # far-outside regime: never quadratic in the offset).
            if ring0 * (self.nx + self.ny) > 2 * self.n:
                ii, dd = self.query_brute(
                    np.array([qx]), np.array([qy]), k=k
                )
                m = min(k, self.n)
                idx_out[qi, :m] = ii[0, :m]
                dist_out[qi, :m] = dd[0, :m]
                continue
            # Rings centered on the query bucket must be able to reach
            # EVERY grid bucket, even when (bx, by) lies outside the
            # grid: the bound is the Chebyshev distance to the farthest
            # grid corner, not max(nx, ny).
            max_ring = max(
                max(abs(bx), abs(bx - (self.nx - 1))),
                max(abs(by), abs(by - (self.ny - 1))),
            ) + 1
            best_d: np.ndarray = np.empty(0)
            best_i: np.ndarray = np.empty(0, dtype=np.int64)
            for ring in range(ring0, max_ring + 1):
                members = []
                if ring == 0:
                    members.append(self._bucket_members(bx, by))
                else:
                    # perimeter clamped to the grid rectangle: buckets
                    # outside [0, nx) x [0, ny) are never visited, so a
                    # ring's cost is bounded by the grid perimeter even
                    # for queries far outside the extent
                    xlo = max(bx - ring, 0)
                    xhi = min(bx + ring, self.nx - 1)
                    if by - ring >= 0:
                        for xx in range(xlo, xhi + 1):
                            members.append(self._bucket_members(xx, by - ring))
                    if by + ring <= self.ny - 1:
                        for xx in range(xlo, xhi + 1):
                            members.append(self._bucket_members(xx, by + ring))
                    ylo = max(by - ring + 1, 0)
                    yhi = min(by + ring - 1, self.ny - 1)
                    if bx - ring >= 0:
                        for yy in range(ylo, yhi + 1):
                            members.append(self._bucket_members(bx - ring, yy))
                    if bx + ring <= self.nx - 1:
                        for yy in range(ylo, yhi + 1):
                            members.append(self._bucket_members(bx + ring, yy))
                cand = np.concatenate(members) if members else np.empty(0, np.int64)
                if len(cand):
                    d = np.hypot(self.lon[cand] - qx, self.lat[cand] - qy)
                    all_d = np.concatenate([best_d, d])
                    all_i = np.concatenate([best_i, cand])
                    top = np.argsort(all_d, kind="stable")[:k]
                    best_d, best_i = all_d[top], all_i[top]
                # Stop once k found and no closer point can exist beyond
                # the scanned ring shell.
                if len(best_d) >= k and best_d[k - 1] <= ring * self.cell:
                    break
            m = len(best_i)
            idx_out[qi, :m] = best_i
            dist_out[qi, :m] = best_d
        return idx_out, dist_out

    def query_radius(
        self, qlon: np.ndarray, qlat: np.ndarray, radius: float
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All reference points within ``radius`` (planar) of each
        query -> flattened (query_idx, ref_idx, dist), ordered by
        (query_idx, ref_idx); exact.  Scans only the bucket window
        covering the radius, clamped to the grid extent, so cost per
        query is O(points inside the window), never O(n)."""
        qlon = np.atleast_1d(np.asarray(qlon, dtype=np.float64))
        qlat = np.atleast_1d(np.asarray(qlat, dtype=np.float64))
        br = int(np.ceil(radius / self.cell))
        out_q: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for qi in range(len(qlon)):
            qx, qy = qlon[qi], qlat[qi]
            bx = int(np.floor((qx - self.x0) / self.cell))
            by = int(np.floor((qy - self.y0) / self.cell))
            xlo, xhi = max(bx - br, 0), min(bx + br, self.nx - 1)
            ylo, yhi = max(by - br, 0), min(by + br, self.ny - 1)
            if xlo > xhi or ylo > yhi:
                continue
            members = [
                self.order[
                    self.bucket_starts[yy * self.nx + xlo]:
                    self.bucket_starts[yy * self.nx + xhi + 1]
                ]
                for yy in range(ylo, yhi + 1)
            ]
            cand = np.concatenate(members)
            if not len(cand):
                continue
            d = np.hypot(self.lon[cand] - qx, self.lat[cand] - qy)
            keep = d <= radius
            if not keep.any():
                continue
            ci, cd = cand[keep], d[keep]
            order = np.argsort(ci, kind="stable")
            out_q.append(np.full(len(ci), qi, dtype=np.int64))
            out_i.append(ci[order])
            out_d.append(cd[order])
        if not out_q:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), np.empty(0)
        return (
            np.concatenate(out_q),
            np.concatenate(out_i),
            np.concatenate(out_d),
        )

class BallTree:
    """Pure-NumPy ball tree (median-split on the wider axis; leaves hold
    index slices into pre-permuted coordinate arrays).  Exact kNN via
    best-first traversal with ball-distance pruning -- the
    clustered-data alternative to the grid-bucketed index (queries on
    heavily skewed point sets don't degrade with empty cells)."""

    def __init__(self, lon: np.ndarray, lat: np.ndarray, leaf_size: int = 32):
        self.lon = np.asarray(lon, np.float64)
        self.lat = np.asarray(lat, np.float64)
        n = len(self.lon)
        if n == 0:
            raise ValueError("empty ball tree")
        self.leaf_size = leaf_size
        self.order = np.arange(n, dtype=np.int64)
        # preallocate node arrays (at most 2n/leaf_size * 4 nodes)
        cap = max(4 * (n // leaf_size + 2), 8)
        self.centers = np.zeros((cap, 2))
        self.radii = np.zeros(cap)
        self.lefts = np.full(cap, -1, dtype=np.int64)
        self.rights = np.full(cap, -1, dtype=np.int64)
        self.starts = np.zeros(cap, dtype=np.int64)
        self.ends = np.zeros(cap, dtype=np.int64)
        self._n_nodes = 0
        self._build(0, n)

    def _new_node(self, s: int, e: int) -> int:
        i = self._n_nodes
        self._n_nodes += 1
        if i >= len(self.radii):  # grow
            grow = len(self.radii)
            self.centers = np.vstack([self.centers, np.zeros((grow, 2))])
            self.radii = np.r_[self.radii, np.zeros(grow)]
            self.lefts = np.r_[self.lefts, np.full(grow, -1, dtype=np.int64)]
            self.rights = np.r_[self.rights, np.full(grow, -1, dtype=np.int64)]
            self.starts = np.r_[self.starts, np.zeros(grow, dtype=np.int64)]
            self.ends = np.r_[self.ends, np.zeros(grow, dtype=np.int64)]
        idx = self.order[s:e]
        cx = self.lon[idx].mean()
        cy = self.lat[idx].mean()
        self.centers[i] = (cx, cy)
        self.radii[i] = np.hypot(self.lon[idx] - cx, self.lat[idx] - cy).max()
        self.starts[i] = s
        self.ends[i] = e
        return i

    def _build(self, s: int, e: int) -> int:
        node = self._new_node(s, e)
        if e - s <= self.leaf_size:
            return node
        idx = self.order[s:e]
        span_x = self.lon[idx].max() - self.lon[idx].min()
        span_y = self.lat[idx].max() - self.lat[idx].min()
        vals = self.lon[idx] if span_x >= span_y else self.lat[idx]
        mid = (e - s) // 2
        part = np.argpartition(vals, mid)
        self.order[s:e] = idx[part]
        self.lefts[node] = self._build(s, s + mid)
        self.rights[node] = self._build(s + mid, e)
        return node

    def query(self, qlon: np.ndarray, qlat: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        qlon = np.atleast_1d(np.asarray(qlon, np.float64))
        qlat = np.atleast_1d(np.asarray(qlat, np.float64))
        nq = len(qlon)
        idx_out = np.full((nq, k), -1, dtype=np.int64)
        dist_out = np.full((nq, k), np.inf)
        for qi in range(nq):
            qx, qy = qlon[qi], qlat[qi]
            best_d = np.full(k, np.inf)
            best_i = np.full(k, -1, dtype=np.int64)
            stack = [0]
            while stack:
                node = stack.pop()
                lower = max(
                    0.0,
                    np.hypot(qx - self.centers[node, 0], qy - self.centers[node, 1])
                    - self.radii[node],
                )
                if lower >= best_d[k - 1]:
                    continue
                if self.lefts[node] < 0:  # leaf
                    members = self.order[self.starts[node] : self.ends[node]]
                    d = np.hypot(self.lon[members] - qx, self.lat[members] - qy)
                    all_d = np.concatenate([best_d, d])
                    all_i = np.concatenate([best_i, members])
                    top = np.argsort(all_d, kind="stable")[:k]
                    best_d, best_i = all_d[top], all_i[top]
                else:
                    l, r = self.lefts[node], self.rights[node]
                    dl = np.hypot(qx - self.centers[l, 0], qy - self.centers[l, 1])
                    dr = np.hypot(qx - self.centers[r, 0], qy - self.centers[r, 1])
                    # visit nearer child first (push farther first)
                    if dl <= dr:
                        stack.extend([r, l])
                    else:
                        stack.extend([l, r])
            idx_out[qi] = best_i
            dist_out[qi] = best_d
        return idx_out, dist_out


def _query_brute(self, qlon: np.ndarray, qlat: np.ndarray, k: int = 1, chunk: int = 256) -> tuple[np.ndarray, np.ndarray]:
        """Exact chunked linear scan -- the reference's JS semantics."""
        qlon = np.atleast_1d(np.asarray(qlon, dtype=np.float64))
        qlat = np.atleast_1d(np.asarray(qlat, dtype=np.float64))
        nq = len(qlon)
        idx_out = np.empty((nq, k), dtype=np.int64)
        dist_out = np.empty((nq, k))
        for s in range(0, nq, chunk):
            ql = qlon[s : s + chunk, None]
            qa = qlat[s : s + chunk, None]
            d = np.hypot(self.lon[None, :] - ql, self.lat[None, :] - qa)
            if k == 1:
                ii = np.argmin(d, axis=1)[:, None]
            else:
                ii = np.argpartition(d, kth=min(k, self.n) - 1, axis=1)[:, :k]
                row = np.arange(len(ii))[:, None]
                ii = ii[row, np.argsort(d[row, ii], axis=1, kind="stable")]
            idx_out[s : s + chunk] = ii
            dist_out[s : s + chunk] = d[np.arange(len(ii))[:, None], ii]
        return idx_out, dist_out


# exact linear-scan oracle path, attached as a method
KNNIndex.query_brute = _query_brute
