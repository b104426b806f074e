"""Approximate-nearest-neighbor search over an embedding column.

Baseline: exact brute-force cosine top-k -- per batch, one dense
matmul of the batch's embeddings against the broadcast query matrix,
with per-batch top-k partials combined driver-side (the partials are
(n_blocks x n_queries x k) rows, tiny).  Scale path: IVF -- seeded
k-means centroids (Lloyd on a sample), searchers probe only the
``nprobe`` nearest inverted lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def list_col_to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix via the flat value
    buffer (no per-row Python lists).  Falls back to to_pylist for
    ragged rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size % n == 0:
        d = flat.size // n
        offsets = (
            col.offsets.to_numpy(zero_copy_only=False)
            if hasattr(col, "offsets")
            else None
        )
        if offsets is None or (np.diff(offsets) == d).all():
            return flat.reshape(n, d)
    return np.asarray(col.to_pylist(), dtype=np.float64)


class BruteTopK:
    """map_batches stage: batch embeddings x broadcast queries ->
    per-batch top-k partial rows {query_id, vec_id, score}."""

    def __init__(self, queries: np.ndarray, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.q = _unit(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = list_col_to_matrix(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(vecs) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 self.id_col: pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        scores = _unit(vecs) @ self.q.T  # (n, nq)
        k = min(self.k, len(vecs))
        top = np.argpartition(-scores, kth=k - 1, axis=0)[:k]  # (k, nq)
        rows_q, rows_i, rows_s = [], [], []
        for qi in range(self.q.shape[0]):
            ti = top[:, qi]
            rows_q.append(np.full(k, qi, dtype=np.int64))
            rows_i.append(ids[ti])
            rows_s.append(scores[ti, qi])
        return pa.table(
            {
                "query_id": np.concatenate(rows_q),
                self.id_col: np.concatenate(rows_i),
                "score": np.concatenate(rows_s),
            }
        )


def brute_topk(
    ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k: distributed partials + driver combine.
    Returns {query_id, vec_id, score, rank} sorted by (query_id, rank);
    ties broken by vec_id for determinism."""
    stage = BruteTopK(queries, k, vec_col, id_col)
    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in ds.map_batches(stage, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if t.num_rows
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    qid = allp["query_id"].to_numpy(zero_copy_only=False)
    vid = allp[id_col].to_numpy(zero_copy_only=False)
    sc = allp["score"].to_numpy(zero_copy_only=False)
    rows = []
    for q in np.unique(qid):
        m = qid == q
        order = np.lexsort((vid[m], -sc[m]))[:k]
        for rank, j in enumerate(order):
            rows.append(
                {
                    "query_id": int(q),
                    id_col: int(vid[m][j]),
                    "score": float(sc[m][j]),
                    "rank": rank,
                }
            )
    return pa.Table.from_pylist(rows)


class IVFIndex:
    """Seeded Lloyd k-means over a sample -> centroids; ``assign``
    gives each vector its nearest-centroid list id (the partitioning
    key for co-locating lists at scale)."""

    def __init__(self, sample: np.ndarray, n_lists: int = 16, iters: int = 10,
                 seed: int = 42):
        x = _unit(np.asarray(sample, dtype=np.float64))
        rng = np.random.RandomState(seed)
        init = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
        c = init.copy()
        for _ in range(iters):
            a = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                m = a == j
                if m.any():
                    c[j] = _unit(x[m].mean(axis=0, keepdims=True))[0]
        self.centroids = c

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(_unit(np.asarray(vecs, np.float64)) @ self.centroids.T, axis=1)


def ivf_topk(
    ds: ray.data.Dataset, queries: np.ndarray, k: int = 10, n_lists: int = 16,
    nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
    train_sample: int = 2048, seed: int = 42,
) -> pa.Table:
    """IVF ANN: train centroids on a head sample, then scan only rows
    whose list id is among each query's ``nprobe`` nearest lists.
    Same output shape as brute_topk (approximate)."""
    sample = np.asarray(
        [r[vec_col] for r in ds.take(train_sample)], dtype=np.float64
    )
    index = IVFIndex(sample, n_lists=n_lists, seed=seed)
    q = _unit(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(map(int, p)) for p in probe]

    class Stage:
        def __init__(self):
            self.index = index
            self.inner = BruteTopK(queries, k, vec_col, id_col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = list_col_to_matrix(batch[vec_col])
            if len(vecs) == 0:
                return self.inner(batch)
            lists = self.index.assign(vecs)
            # a row is scanned for the union of probed lists; per-query
            # filtering happens in the score matrix by masking
            union = set().union(*probe_sets)
            mask = np.fromiter((int(l) in union for l in lists), bool, len(lists))
            sub = batch.filter(pa.array(mask))
            out = self.inner(sub)
            # drop (query, row) hits whose list wasn't probed by that query
            if out.num_rows:
                sub_lists = self.index.assign(list_col_to_matrix(sub[vec_col]))
                id_to_list = dict(
                    zip(sub[id_col].to_pylist(), map(int, sub_lists))
                )
                qs = out["query_id"].to_numpy(zero_copy_only=False)
                vs = out[id_col].to_numpy(zero_copy_only=False)
                keep = np.fromiter(
                    (id_to_list[v] in probe_sets[int(qq)] for qq, v in zip(qs, vs)),
                    bool, len(qs),
                )
                out = out.filter(pa.array(keep))
            return out

    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in ds.map_batches(Stage, concurrency=2, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if t.num_rows
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    qid = allp["query_id"].to_numpy(zero_copy_only=False)
    vid = allp[id_col].to_numpy(zero_copy_only=False)
    sc = allp["score"].to_numpy(zero_copy_only=False)
    rows = []
    for qq in np.unique(qid):
        m = qid == qq
        order = np.lexsort((vid[m], -sc[m]))[:k]
        for rank, j in enumerate(order):
            rows.append(
                {"query_id": int(qq), id_col: int(vid[m][j]),
                 "score": float(sc[m][j]), "rank": rank}
            )
    return pa.Table.from_pylist(rows)
