"""Deduplication operators for web-scale corpora.

The reference only deduplicates file lists (``list(set(files))`` +
sort, test.py:225-226); at 10^12-document scale the engine provides the
standard published family, each built on the same two-phase shape:

  1. a cheap vectorized ``map_batches`` signature stage (hashes fit in
     a few uint64 per row -- the corpus body never moves), then
  2. a shuffle of the SIGNATURES ONLY (groupby hash / band key), plus
     driver-side union-find over the candidate pairs (pairs are tiny
     relative to the corpus; at extreme scale this becomes an
     iterative distributed connected-components, noted below).

Operators: exact (hash groupby + min-id representative), MinHash+LSH
(Broder), SimHash (Charikar), n-gram Jaccard verification, and
embedding-cosine near-dup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import hashing as H


# ------------------------------------------------------------------ exact
class ExactKeyStage:
    """Append a stable 64-bit content hash of ``key_col``."""

    def __init__(self, key_col: str = "text", out_col: str = "content_hash"):
        self.key_col = key_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch[self.key_col].to_pylist()
        hs = H.fnv1a_array([v if v is not None else "" for v in vals])
        # int64 view for Arrow friendliness (bit pattern preserved)
        return batch.append_column(self.out_col, pa.array(hs.view(np.int64)))


def exact_dedup_representatives(
    ds: ray.data.Dataset, key_col: str, id_col: str
) -> pa.Table:
    """(content key -> min id) via signature-only combine: per batch,
    group by hash and keep the min id; final combine over the tiny
    partials.  Returns {content_hash, doc_id(min)} -- the exact-dup
    representative set (hash-partition + per-group first, SURVEY 2.9)."""

    hashed = ds.map_batches(ExactKeyStage(key_col), batch_format="pyarrow", batch_size=None)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["content_hash", id_col])
        out = t.group_by("content_hash").aggregate([(id_col, "min")])
        return out.rename_columns(["content_hash", id_col])

    parts = []
    for t in hashed.map_batches(partial, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if t.num_rows:
            parts.append(t if isinstance(t, pa.Table) else pa.Table.from_batches([t]))
    allp = pa.concat_tables(parts, promote_options="default")
    out = allp.group_by("content_hash").aggregate([(id_col, "min")])
    return out.rename_columns(["content_hash", id_col])


def exact_dedup(
    ds: ray.data.Dataset, key_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep only the min-id row per distinct key (broadcast the winner
    id set -- small -- and filter the stream)."""
    reps = exact_dedup_representatives(ds, key_col, id_col)
    winner_ids = set(reps[id_col].to_pylist())

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.fromiter((i in winner_ids for i in ids), bool, len(ids))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------- minhash
class MinHashStage:
    """(id, text) -> (id, band_0..band_{b-1} keys, signature) --
    signatures built once per batch; MinHasher state per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, bands: int = 8, shingle_k: int = 5):
        self.text_col = text_col
        self.id_col = id_col
        self.mh = H.MinHasher(num_perm=num_perm)
        self.bands = bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        hashes, boundaries = H.char_shingle_hashes_batch(texts, self.shingle_k)
        sigs = self.mh.signatures_concat(hashes, boundaries)
        keys = self.mh.band_keys_batch(sigs, self.bands)
        cols = {self.id_col: pa.array(ids)}
        for b in range(self.bands):
            cols[f"band_{b}"] = pa.array(keys[:, b].view(np.int64))
        cols["sig"] = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(sigs).view(np.int64).ravel()),
            self.mh.num_perm,
        )
        return pa.table(cols)


def _pairs_from_buckets(
    sig_table: pa.Table, band_cols: list[str], id_col: str
) -> set[tuple]:
    """Candidate pairs: ids sharing any band key.  Bucket sizes are
    bounded in practice; a bucket-size cap guards pathological buckets
    (equivalent of hot-key salting for LSH)."""
    ids = sig_table[id_col].to_numpy(zero_copy_only=False)
    pairs: set[tuple] = set()
    for bc in band_cols:
        keys = sig_table[bc].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        ends = np.r_[starts[1:], len(sk)]
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > 1000:  # cap pathological buckets
                continue
            bucket = np.sort(ids[order[s:e]])
            for i in range(len(bucket)):
                for j in range(i + 1, len(bucket)):
                    pairs.add((int(bucket[i]), int(bucket[j])))
    return pairs


def label_propagation_clusters(
    pairs: list[tuple[int, int]] | pa.Table,
    num_partitions: int = 8,
    max_iters: int = 50,
) -> pa.Table:
    """Distributed connected components over a candidate-pair edge list:
    iterative min-label propagation, each round ONE hash join (labels
    onto edges) + ONE groupby-min -- both Ray Data shuffles, nothing
    driver-sized.  Converges in O(component diameter) rounds.  The
    scale tier of the dedup clustering (driver union-find is the small
    tier).  Returns {doc_id, cluster_rep} for nodes in non-singleton
    components, identical to the union-find output."""
    import ray.data

    if isinstance(pairs, pa.Table):
        edge_list = list(
            zip(pairs["a"].to_pylist(), pairs["b"].to_pylist())
        )
    else:
        edge_list = list(pairs)
    if not edge_list:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_rep": pa.array([], pa.int64())}
        )
    a = np.array([e[0] for e in edge_list], dtype=np.int64)
    b = np.array([e[1] for e in edge_list], dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    # symmetric edges + self-loops keep every node's own label in play
    src = np.concatenate([a, b, nodes])
    dst = np.concatenate([b, a, nodes])
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    labels = ray.data.from_arrow(
        pa.table({"node": nodes, "label": nodes})
    )
    prev_sum = None
    for _ in range(max_iters):
        msgs = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        )
        new_labels = (
            msgs.groupby("dst")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow", batch_size=None,
            )
        )
        tbl = pa.concat_tables(
            [
                t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
                for t in new_labels.iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
                if t.num_rows
            ]
        )
        s = int(tbl["label"].to_numpy().sum())
        labels = ray.data.from_arrow(tbl)
        if s == prev_sum:
            break
        prev_sum = s
    final = tbl
    node = final["node"].to_numpy(zero_copy_only=False)
    lab = final["label"].to_numpy(zero_copy_only=False)
    # non-singleton components only
    import collections

    sizes = collections.Counter(lab.tolist())
    keep = np.fromiter((sizes[l] > 1 for l in lab), bool, len(lab))
    order = np.argsort(node[keep], kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(node[keep][order]),
            "cluster_rep": pa.array(lab[keep][order]),
        }
    )


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id wins -> deterministic representatives
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 8,
    sim_threshold: float = 0.8,
    shingle_k: int = 5,
) -> pa.Table:
    """MinHash+LSH near-dedup: shingle -> minhash -> band buckets ->
    candidate pairs -> signature-similarity verify -> union-find
    clusters.  Returns {doc_id, cluster_rep} for every doc that has a
    near-duplicate (cluster_rep = min doc id of its cluster)."""
    stage = MinHashStage(text_col, id_col, num_perm, bands, shingle_k)
    sig_ds = ds.map_batches(stage, batch_format="pyarrow", batch_size=None)
    sig_tbl = pa.concat_tables(
        [
            t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in sig_ds.iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ],
        promote_options="default",
    )
    band_cols = [f"band_{b}" for b in range(bands)]
    pairs = _pairs_from_buckets(sig_tbl, band_cols, id_col)

    ids = sig_tbl[id_col].to_numpy(zero_copy_only=False)
    sig_col = sig_tbl["sig"].combine_chunks()
    sigs = (
        sig_col.flatten()
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
        .view(np.uint64)
        .reshape(sig_tbl.num_rows, -1)
    )
    pos = {int(i): k for k, i in enumerate(ids)}
    uf = _UnionFind()
    for a, b in pairs:
        sim = float((sigs[pos[a]] == sigs[pos[b]]).mean())
        if sim >= sim_threshold:
            uf.union(a, b)
    # emit every doc in a non-singleton cluster
    rows = []
    clusters: dict = {}
    for i in ids:
        clusters.setdefault(uf.find(int(i)), []).append(int(i))
    for rep, members in clusters.items():
        if len(members) > 1:
            for m in sorted(members):
                rows.append({"doc_id": m, "cluster_rep": rep})
    return pa.Table.from_pylist(rows or [], schema=pa.schema(
        [("doc_id", pa.int64()), ("cluster_rep", pa.int64())]
    ))


# ---------------------------------------------------------------- simhash
class SimHashStage:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col]
        toks = [(t or "").split() for t in texts]
        flat = [w for d in toks for w in d]
        hashes = H.fnv1a_array(flat)
        bounds = np.r_[0, np.cumsum([len(d) for d in toks])].astype(np.int64)
        out = H.simhash_batch(hashes, bounds)
        return pa.table({self.id_col: ids, "simhash": pa.array(out.view(np.int64))})


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pa.Table:
    """SimHash near-dup: 64-bit fingerprints bucketed by each of four
    16-bit sub-bands (any pair within hamming<=3 shares at least one
    band by pigeonhole when distance <=3 over 4 bands); verify with the
    exact Hamming distance.  Returns {doc_id, cluster_rep}."""
    sig_ds = ds.map_batches(SimHashStage(text_col, id_col), batch_format="pyarrow", batch_size=None)
    t = pa.concat_tables(
        [
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in sig_ds.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows
        ],
        promote_options="default",
    )
    ids = t[id_col].to_numpy(zero_copy_only=False)
    sh = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    uf = _UnionFind()
    for band in range(4):
        key = (sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        sk = key[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        ends = np.r_[starts[1:], len(sk)]
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > 1000:
                continue
            members = order[s:e]
            for ii in range(len(members)):
                d = H.hamming64(sh[members[ii]], sh[members[ii + 1 :]])
                for jj in np.flatnonzero(d <= max_hamming):
                    uf.union(int(ids[members[ii]]), int(ids[members[ii + 1 + jj]]))
    clusters: dict = {}
    for i in ids:
        clusters.setdefault(uf.find(int(i)), []).append(int(i))
    rows = [
        {"doc_id": m, "cluster_rep": rep}
        for rep, members in clusters.items()
        if len(members) > 1
        for m in sorted(members)
    ]
    return pa.Table.from_pylist(rows or [], schema=pa.schema(
        [("doc_id", pa.int64()), ("cluster_rep", pa.int64())]
    ))


# ------------------------------------------------------------ n-gram jaccard
def ngram_jaccard_matrix(
    texts: list[str], n: int = 3
) -> np.ndarray:  # small-side helper for verification stages/tests
    hs = [H.word_ngram_hashes((t or "").split(), n) for t in texts]
    m = len(hs)
    out = np.eye(m)
    for i in range(m):
        for j in range(i + 1, m):
            out[i, j] = out[j, i] = H.jaccard(hs[i], hs[j])
    return out


def jaccard_verify_pairs(
    ds: ray.data.Dataset,
    pairs: list[tuple[int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> pa.Table:
    """Exact n-gram-Jaccard verification of candidate pairs: fetch only
    the pair members' texts (broadcast id set, filtered scan), compute
    exact similarity.  Returns {a, b, jaccard, is_dup}."""
    need = {i for p in pairs for i in p}

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.fromiter((i in need for i in ids), bool, len(ids))
        return batch.filter(pa.array(mask)).select([id_col, text_col])

    texts: dict[int, str] = {}
    for t in ds.map_batches(pick, batch_format="pyarrow", batch_size=None).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for i, tx in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            texts[i] = tx
    rows = []
    for a, b in pairs:
        ha = H.word_ngram_hashes((texts.get(a) or "").split(), n)
        hb = H.word_ngram_hashes((texts.get(b) or "").split(), n)
        j = H.jaccard(ha, hb)
        rows.append({"a": a, "b": b, "jaccard": j, "is_dup": j >= threshold})
    return pa.Table.from_pylist(rows or [], schema=pa.schema(
        [("a", pa.int64()), ("b", pa.int64()),
         ("jaccard", pa.float64()), ("is_dup", pa.bool_())]
    ))


# ----------------------------------------------------- embedding near-dup
def embedding_neardup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> pa.Table:
    """Embedding-cosine near-dup via random-hyperplane LSH: bucket by
    the sign pattern of ``n_planes`` seeded hyperplanes, then exact
    cosine within buckets (and the 1-bit-flip neighbor buckets of each
    vector, catching near-threshold pairs across a plane)."""
    first = ds.take(1)
    dim = len(first[0][vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))

    def stage(batch: pa.Table) -> pa.Table:
        from .ann import list_col_to_matrix

        vecs = list_col_to_matrix(batch[vec_col])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        signs = (unit @ planes.T) > 0
        key = np.zeros(len(vecs), dtype=np.uint64)
        for b in range(n_planes):
            key |= signs[:, b].astype(np.uint64) << np.uint64(b)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(key.view(np.int64)),
                "unit": pa.array(unit.tolist()),
            }
        )

    t = pa.concat_tables(
        [
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in ds.map_batches(stage, batch_format="pyarrow", batch_size=None).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if b.num_rows
        ],
        promote_options="default",
    )
    ids = t[id_col].to_numpy(zero_copy_only=False)
    buckets = t["bucket"].to_numpy(zero_copy_only=False).view(np.uint64)
    units = np.asarray(t["unit"].to_pylist())

    # candidate pairs: same bucket or buckets differing in one bit
    bucket_map: dict[int, list[int]] = {}
    for k, b in enumerate(buckets):
        bucket_map.setdefault(int(b), []).append(k)
    pairs: set[tuple[int, int]] = set()
    for b, members in bucket_map.items():
        cand = list(members)
        for flip in range(n_planes):
            nb = b ^ (1 << flip)
            if nb in bucket_map and nb > b:
                cand = cand + bucket_map[nb]
        for ii in range(len(cand)):
            for jj in range(ii + 1, len(cand)):
                a, c = cand[ii], cand[jj]
                pairs.add((min(a, c), max(a, c)))
    rows = []
    for a, c in pairs:
        cos = float(units[a] @ units[c])
        if cos >= threshold:
            rows.append(
                {
                    "a": int(min(ids[a], ids[c])),
                    "b": int(max(ids[a], ids[c])),
                    "cosine": cos,
                }
            )
    rows.sort(key=lambda r: (r["a"], r["b"]))
    return pa.Table.from_pylist(rows or [], schema=pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]
    ))
