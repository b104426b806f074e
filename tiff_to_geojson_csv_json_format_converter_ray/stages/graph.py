"""Distributed graph traversal over edge Datasets.

The dedup family already runs connected components (label
propagation, stages/dedup.py:231) and the entry runs PageRank /
triangles on the vocabulary-bounded edit-1 word graph.  This module
adds the remaining classic: multi-source BFS (min-hop distance),
as synchronous Bellman-Ford rounds -- ONE ``grouped_by_key`` shuffle
per hop, nothing driver-held but the seed list.

Round t: every node's group sees its outgoing edge rows plus any
distance rows addressed to it; the kernel takes the min incoming
distance, re-emits it for the node, and emits ``d+1`` candidates to
each neighbor (capped at ``max_hops``, which bounds frontier growth).
After ``max_hops`` rounds a final grouped min folds duplicates.

Scale notes: edges re-enter the shuffle each round (the iterative
join-per-round shape shared with label propagation); on a long-lived
cluster you would hash-partition the edge table once to parquet
(bucket = mix32(node)) and stream only distance rows between rounds
-- the kernel and keying are unchanged.  Frontier rows per round are
bounded by edges out of the current frontier, never the whole graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .shuffle import grouped_by_key

_EDGE = np.int64(-1)


def bfs_min_hops(
    edges: ray.data.Dataset,
    seeds: list[str],
    max_hops: int = 4,
) -> ray.data.Dataset:
    """Min-hop distance from any seed over a SYMMETRIC edge Dataset
    with string columns ``w1, w2`` (emit both directions upstream for
    an undirected graph).  Returns a Dataset of ``(word, hops)`` with
    ``hops <= max_hops``; unreachable nodes are absent.  Isolated
    seeds (no edges) still appear at hops 0."""

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "node": batch["w1"].cast(pa.string()),
                "neigh": batch["w2"].cast(pa.string()),
                "d": pa.array(np.full(n, _EDGE)),
            }
        )

    edge_rows = edges.map_batches(
        tag_edges, batch_format="pyarrow", batch_size=None
    )
    dist: ray.data.Dataset = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(sorted(set(seeds)), pa.string()),
                "neigh": pa.array([""] * len(set(seeds)), pa.string()),
                "d": pa.array(np.zeros(len(set(seeds)), np.int64)),
            }
        )
    )

    def propagate(group: pa.Table) -> pa.Table:
        d = group["d"].to_numpy(zero_copy_only=False)
        incoming = d[d >= 0]
        node = group["node"][0].as_py()
        if len(incoming) == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "neigh": pa.array([], pa.string()),
                    "d": pa.array([], pa.int64()),
                }
            )
        dmin = int(incoming.min())
        out_node = [node]
        out_d = [dmin]
        if dmin < max_hops:
            for j in np.flatnonzero(d == _EDGE):
                out_node.append(group["neigh"][int(j)].as_py())
                out_d.append(dmin + 1)
        return pa.table(
            {
                "node": pa.array(out_node, pa.string()),
                "neigh": pa.array([""] * len(out_node), pa.string()),
                "d": pa.array(out_d, pa.int64()),
            }
        )

    for _ in range(max_hops):
        dist = grouped_by_key(edge_rows.union(dist), "node", propagate)

    def final_min(group: pa.Table) -> pa.Table:
        d = group["d"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "word": pa.array([group["node"][0].as_py()], pa.string()),
                "hops": pa.array([int(d[d >= 0].min())], pa.int64()),
            }
        )

    return grouped_by_key(dist, "node", final_min)


_W_EDGE = np.int64(-1)


def sssp_bellman_ford(
    edges: ray.data.Dataset,
    seed: int,
    rounds: int,
) -> ray.data.Dataset:
    """Single-source shortest path over a weighted edge Dataset with
    int64 columns ``node, neigh, w`` (emit both directions upstream
    for an undirected graph) -- synchronous Bellman-Ford: ONE
    ``grouped_by_key`` shuffle per relaxation round, same shape as
    ``bfs_min_hops`` but carrying edge weights.  ``rounds`` must be
    >= the hop diameter (extra rounds are harmless: every round
    min-folds).  Returns a Dataset of ``(node, dist)``; unreachable
    nodes are absent."""

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "neigh": batch["neigh"].cast(pa.int64()),
                "w": batch["w"].cast(pa.int64()),
                "d": pa.array(
                    np.full(batch.num_rows, _W_EDGE), pa.int64()
                ),
            }
        )

    edge_rows = edges.map_batches(
        tag_edges, batch_format="pyarrow", batch_size=None
    )
    dist: ray.data.Dataset = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([seed], pa.int64()),
                "neigh": pa.array([-1], pa.int64()),
                "w": pa.array([0], pa.int64()),
                "d": pa.array([0], pa.int64()),
            }
        )
    )

    def relax(group: pa.Table) -> pa.Table:
        d = group["d"].to_numpy(zero_copy_only=False)
        incoming = d[d >= 0]
        node = group["node"][0].as_py()
        empty = pa.table(
            {
                "node": pa.array([], pa.int64()),
                "neigh": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "d": pa.array([], pa.int64()),
            }
        )
        if len(incoming) == 0:
            return empty
        dmin = int(incoming.min())
        is_edge = d == _W_EDGE
        neigh = group["neigh"].to_numpy(zero_copy_only=False)[is_edge]
        w = group["w"].to_numpy(zero_copy_only=False)[is_edge]
        out_node = np.concatenate(([node], neigh)).astype(np.int64)
        out_d = np.concatenate(([dmin], dmin + w)).astype(np.int64)
        k = len(out_node)
        return pa.table(
            {
                "node": pa.array(out_node),
                "neigh": pa.array(np.full(k, -1, np.int64)),
                "w": pa.array(np.zeros(k, np.int64)),
                "d": pa.array(out_d),
            }
        )

    for _ in range(rounds):
        dist = grouped_by_key(edge_rows.union(dist), "node", relax)

    def final_min(group: pa.Table) -> pa.Table:
        d = group["d"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array([group["node"][0].as_py()], pa.int64()),
                "dist": pa.array([int(d[d >= 0].min())], pa.int64()),
            }
        )

    return grouped_by_key(dist, "node", final_min)
