"""Property tests for the session-7 operators: phrase search
(bit-anchor positional postings) vs brute force, SymSpell deletion
blocking completeness vs exact all-pairs DP, and distributed
Bellman-Ford vs driver Dijkstra -- each under random draws, the
partition-independence guarantee the 100 TB regime depends on."""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
    _lev,
    phrase_search,
    symspell_pairs,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "omega"]


def _corpus(n_docs: int, seed: int) -> pa.Table:
    rng = np.random.RandomState(seed)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.randint(0, 30)))
        for _ in range(n_docs)
    ]
    return pa.table(
        {"doc_id": pa.array(np.arange(n_docs)), "text": pa.array(texts)}
    )


def _brute_phrase(texts, words):
    out = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        hits = sum(
            1
            for p in range(len(toks) - len(words) + 1)
            if toks[p:p + len(words)] == words
        )
        if hits:
            out[i] = hits
    return out


class TestPhraseSearch:
    @settings(max_examples=10, deadline=None)
    @given(seed=st.integers(0, 999), nblocks=st.integers(1, 4))
    def test_matches_brute_force_any_partitioning(
        self, ray_session, seed, nblocks
    ):
        import ray.data

        tbl = _corpus(40, seed)
        words = ["alpha", "beta", "gamma"]
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        got = phrase_search(ds, words)
        want = _brute_phrase(tbl["text"].to_pylist(), words)
        got_map = dict(
            zip(got["doc_id"].to_pylist(), got["n_hits"].to_pylist())
        )
        assert got_map == want


class TestSymspellCompleteness:
    @settings(max_examples=10, deadline=None)
    @given(seed=st.integers(0, 999))
    def test_blocking_finds_every_close_pair(self, ray_session, seed):
        import ray.data

        rng = np.random.RandomState(seed)
        base = ["spark", "shard", "query", "table", "batch"]
        vocab = set(base)
        letters = "abcdefgh"
        for w in base:
            for _ in range(3):
                i = rng.randint(len(w))
                op = rng.randint(3)
                if op == 0:
                    vocab.add(w[:i] + w[i + 1:])  # delete
                elif op == 1:
                    vocab.add(
                        w[:i] + letters[rng.randint(8)] + w[i:]
                    )  # insert
                else:
                    vocab.add(
                        w[:i] + letters[rng.randint(8)] + w[i + 1:]
                    )  # substitute
        vocab = sorted(v for v in vocab if len(v) >= 4)
        tbl = pa.table({"text": pa.array(vocab)})
        ds = ray.data.from_arrow(tbl).repartition(2)
        got = symspell_pairs(ds, max_dist=2, min_len=4)
        got_pairs = {
            (a, b, d)
            for a, b, d in zip(
                got["w1"].to_pylist(),
                got["w2"].to_pylist(),
                got["dist"].to_pylist(),
            )
        }
        want = set()
        for i in range(len(vocab)):
            for j in range(i + 1, len(vocab)):
                d = _lev(vocab[i], vocab[j])
                if 1 <= d <= 2:
                    want.add((vocab[i], vocab[j], d))
        assert got_pairs == want


def _dijkstra(edges, seed_node):
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {seed_node: 0}
    pq = [(0, seed_node)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


class TestSSSP:
    @settings(max_examples=6, deadline=None)
    @given(seed=st.integers(0, 99))
    def test_bellman_ford_matches_dijkstra(self, ray_session, seed):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.graph import (
            sssp_bellman_ford,
        )

        rng = np.random.RandomState(seed)
        n = 12
        edges = []
        for a in range(n):
            for b in range(a + 1, n):
                if rng.rand() < 0.3:
                    edges.append((a, b, int(rng.randint(1, 10))))
        if not edges:
            edges = [(0, 1, 3)]
        tbl = pa.table(
            {
                "node": pa.array(
                    [a for a, b, w in edges] + [b for a, b, w in edges],
                    pa.int64(),
                ),
                "neigh": pa.array(
                    [b for a, b, w in edges] + [a for a, b, w in edges],
                    pa.int64(),
                ),
                "w": pa.array(
                    [w for a, b, w in edges] * 2, pa.int64()
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        out = sssp_bellman_ford(ds, seed=0, rounds=n)
        got = {}
        for batch in out.iter_batches(batch_format="pyarrow"):
            got.update(
                zip(batch["node"].to_pylist(), batch["dist"].to_pylist())
            )
        want = _dijkstra(edges, 0)
        assert got == want
