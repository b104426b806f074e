"""Query implementations, part 09 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: croston_demand, aoristic_hours, pair_correlation, crc32_audit, hop_histogram, graph_coloring_greedy, ca_trend_hours, chow_revenue_break, cvm_uniform, robust_moments, hartley_fmax, siegel_slopes, max_subarray, kendall_w, cronbach_daily_counts, h_index, kleinberg_bursts, map_at_10, lru_hit_rates, isolation_forest_lite, renyi_entropy, rocchio_feedback, dunn_index, davies_bouldin_voronoi, banzhaf_power, irv_election, price_indices, dfa_alpha, brier_hour_forecast, youden_threshold, overdispersion_panel, taylors_law, allan_variance, mattr, rmst, competing_risks, ks_uniform, ad_uniform, partition_conductance, global_transitivity ...
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
    grouped_by_key as _grouped_by_key,
)

from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
    round_half_away,
    scaled_int,
)
from .part01 import (  # noqa: F401
    _og_points_ds,
    _read_pq,
)
from .part06 import (  # noqa: F401
    _MARKOV_STATES,
)
from .part07 import (  # noqa: F401
    _ASSIGN_PROBES,
    _BH_PERMS,
    _daily_count_series,
    _daily_revenue_cents,
)
from .part08 import (  # noqa: F401
    _CLIQUE_T,
    _grid_count_cents,
    _top_count_cells_xy,
    _top_users_by_count,
)


def _holm_oracle_sql() -> str:
    """Mirror of _q_holm_adjust: the bh_fdr permutation chain plus
    the integer Holm running max."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql,
    )

    u = mix32_sql("e.eid", "tt.i * 1009 + pp.p")
    return (
        "WITH e AS (SELECT event_id AS eid, event_type AS t, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS s FROM e), "
        "tt AS (SELECT * FROM (VALUES ('click', 0), ('error', 1), "
        "('purchase', 2), ('signup', 3), ('view', 4)) AS v(name, i)), "
        "obs AS (SELECT tt.name, CAST(SUM(CASE WHEN e.t = tt.name "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
        "CAST(SUM(CASE WHEN e.t = tt.name THEN e.y ELSE 0 END) "
        "AS BIGINT) AS s1 FROM e, tt GROUP BY 1), "
        "ot AS (SELECT name, CAST(s1 AS DOUBLE) / n1 "
        "- CAST(tot.s - s1 AS DOUBLE) / (tot.n - n1) AS st "
        "FROM obs, tot), "
        f"pp AS (SELECT r.range AS p FROM range(0, {_BH_PERMS}) r), "
        f"pl AS (SELECT tt.name, pp.p, CASE WHEN ({u}) % 5 = 0 "
        "THEN 1 ELSE 0 END AS lab, e.y FROM e, tt, pp), "
        "ps AS (SELECT name, p, CAST(SUM(lab) AS BIGINT) AS n1, "
        "CAST(SUM(lab * y) AS BIGINT) AS s1 FROM pl GROUP BY 1, 2), "
        "pt AS (SELECT name, p, CAST(s1 AS DOUBLE) / n1 "
        "- CAST(tot.s - s1 AS DOUBLE) / (tot.n - n1) AS st "
        "FROM ps, tot), "
        "ex AS (SELECT pt.name, CAST(SUM(CASE WHEN ABS(pt.st) "
        ">= ABS(ot.st) THEN 1 ELSE 0 END) AS BIGINT) AS e "
        "FROM pt JOIN ot ON ot.name = pt.name GROUP BY 1), "
        "pn AS (SELECT name, 1 + e AS p_num, ROW_NUMBER() OVER "
        "(ORDER BY 1 + e, name) AS rk FROM ex), "
        "ha AS (SELECT name, p_num, rk, "
        "LEAST(101, MAX((5 - rk + 1) * p_num) OVER "
        "(ORDER BY rk ROWS UNBOUNDED PRECEDING)) AS adj FROM pn) "
        "SELECT name AS event_type, CAST(p_num AS BIGINT) AS p_num, "
        "CAST(rk AS BIGINT) AS p_rank, CAST(adj AS BIGINT) AS adj_num, "
        "ROUND(CAST(adj AS DOUBLE) / 101.0, 6) AS p_adj, "
        "CAST(CASE WHEN adj * 5 <= 101 THEN 1 ELSE 0 END AS BIGINT) "
        "AS reject FROM ha ORDER BY event_type"
    )


_CROSTON_SC = 1_000_000


def _q_croston_demand(sf_dir: str) -> pa.Table:
    """Croston's method for intermittent demand (alpha = 1/5 exact)
    over the top user's daily event counts: separate exponential
    smoothing of non-zero demand sizes and inter-demand intervals,
    both quantized at 1e6 ticks with truncating division -- the
    recurrence is bit-identical to the recursive CTE; the forecast
    z/p is one pinned float division per demand point."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    top_user = _top_users_by_count(sf_dir, 1)[0][0]
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id"],
    )

    def daily(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "mine": pa.array((uid == top_user).astype(np.int64)),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("mine", "sum", "d"), ("_one", "sum", "n")],
    )
    days = agg["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    dcount = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = int(days.min())
    seq = sorted(
        (int(t) - lo, int(d)) for t, d in zip(days, dcount) if d > 0
    )
    sc = _CROSTON_SC
    rows = []
    z = p = 0
    prev_t = None
    for i, (t, d) in enumerate(seq, start=1):
        if i == 1:
            z = d * sc
            p = (t + 1) * sc
        else:
            z = (4 * z + d * sc) // 5
            p = (4 * p + (t - prev_t) * sc) // 5
        prev_t = t
        rows.append((i, t, d, z, p, float(z) / float(p)))
    return pa.table(
        {
            "i": pa.array([r[0] for r in rows], pa.int64()),
            "t": pa.array([r[1] for r in rows], pa.int64()),
            "demand": pa.array([r[2] for r in rows], pa.int64()),
            "z_ticks": pa.array([r[3] for r in rows], pa.int64()),
            "p_ticks": pa.array([r[4] for r in rows], pa.int64()),
            "forecast": round_like_sql([r[5] for r in rows], 6),
        }
    )


def _croston_oracle_sql() -> str:
    """Mirror of _q_croston_demand: recursive CTE over the demand
    sequence with integer-tick state."""
    sc = _CROSTON_SC
    return (
        "WITH RECURSIVE uc AS (SELECT user_id, COUNT(*) AS n "
        "FROM events GROUP BY 1), "
        "top1 AS (SELECT user_id FROM uc ORDER BY n DESC, user_id "
        "LIMIT 1), "
        "lo AS (SELECT MIN(epoch_us(ts) // 86400000000) AS lo "
        "FROM events), "
        "dd AS (SELECT epoch_us(ts) // 86400000000 "
        "- (SELECT lo FROM lo) AS t, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM events WHERE user_id = (SELECT user_id FROM top1) "
        "GROUP BY 1), "
        "seq AS (SELECT t, d, CAST(ROW_NUMBER() OVER (ORDER BY t) "
        "AS BIGINT) AS i FROM dd WHERE d > 0), "
        "w AS (SELECT s.i, s.t, s.d, "
        f"s.d * {sc} AS z, (s.t + 1) * {sc} AS p FROM seq s "
        "WHERE s.i = 1 "
        "UNION ALL "
        f"SELECT s.i, s.t, s.d, (4 * w.z + s.d * {sc}) // 5, "
        f"(4 * w.p + (s.t - w.t) * {sc}) // 5 "
        "FROM w JOIN seq s ON s.i = w.i + 1) "
        "SELECT i, t, d AS demand, z AS z_ticks, p AS p_ticks, "
        "ROUND(CAST(z AS DOUBLE) / CAST(p AS DOUBLE), 6) AS forecast "
        "FROM w"
    )


def _q_aoristic_hours(sf_dir: str) -> pa.Table:
    """Aoristic temporal analysis (the crime-analysis standard for
    events known only to an interval): each event's 30-minute window
    [ts, ts+1800s) distributes its weight across the hour-of-day bins
    it overlaps, in exact MICROSECONDS -- an interval crosses at most
    one hour boundary, so the split is two integer terms per event,
    combined by the distributed aggregate."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    win = 1_800_000_000  # 30 min in us
    hour_us = 3_600_000_000

    def split(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (t // hour_us) % 24
        into = t % hour_us
        first = np.minimum(win, hour_us - into)
        second = win - first
        return pa.table(
            {
                "hour": pa.array(np.concatenate([h, (h + 1) % 24])),
                "w_us": pa.array(np.concatenate([first, second])),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(split, batch_format="pyarrow", batch_size=None),
        ["hour"],
        [("w_us", "sum", "w_us")],
    ).sort_by("hour")
    hh = agg["hour"].to_numpy(zero_copy_only=False).astype(np.int64)
    w = agg["w_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    full = np.zeros(24, np.int64)
    full[hh] = w
    tot = int(full.sum())
    return pa.table(
        {
            "hour": pa.array(list(range(24)), pa.int64()),
            "w_us": pa.array(full, pa.int64()),
            "share": round_like_sql(
                full.astype(np.float64) / float(tot), 6
            ),
        }
    )


def _q_pair_correlation(sf_dir: str) -> pa.Table:
    """Pair-correlation (radial distribution) function g(r) over the
    1-in-20 geocoded sample -- the derivative companion of Ripley's
    K: exact integer pair counts per annulus (0.02-wide rings,
    coincident pairs reported separately), normalized by the CSR
    expectation n(n-1)/A * pi(r2^2 - r1^2).  Same broadcast-matrix
    counting shape as ripley_k."""
    import ray
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    edges = (0.0, 0.02, 0.04, 0.06, 0.08, 0.10)
    area = 0.95 * 0.95

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        eid = eid[eid % 20 == 0]
        return pa.table(
            {
                "px": pa.array(77.0 + (eid % 96).astype(np.float64) * 0.01),
                "py": pa.array(
                    28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
                ),
            }
        )

    sample = ds.map_batches(
        geocode, batch_format="pyarrow", batch_size=None
    ).materialize()
    tbl = pa.concat_tables(
        [pa.table(b) for b in sample.iter_batches(batch_format="pyarrow")]
    )
    qx = tbl["px"].to_numpy(zero_copy_only=False)
    qy = tbl["py"].to_numpy(zero_copy_only=False)
    m = len(qx)
    ref = ray.put((qx, qy))

    def count_pairs(batch: pa.Table) -> pa.Table:
        bx, by = ray.get(ref)
        px = batch["px"].to_numpy(zero_copy_only=False)
        py = batch["py"].to_numpy(zero_copy_only=False)
        d2 = (
            (px[:, None] - bx[None, :]) ** 2
            + (py[:, None] - by[None, :]) ** 2
        )
        ks, cs = [], []
        ks.append(-1)  # coincident (minus self-pairs)
        cs.append(int((d2 == 0.0).sum()) - len(px))
        for k in range(len(edges) - 1):
            r1, r2 = edges[k], edges[k + 1]
            ks.append(k)
            cs.append(
                int(((d2 > r1 * r1) & (d2 <= r2 * r2)).sum())
            )
        return pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ray.data.from_arrow(tbl).map_batches(
            count_pairs, batch_format="pyarrow", batch_size=None
        ),
        ["k"],
        [("c", "sum", "c")],
    ).sort_by("k")
    kk = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    cmap = dict(zip(kk.tolist(), cc.tolist()))
    rows = []
    for k in range(len(edges) - 1):
        r1, r2 = edges[k], edges[k + 1]
        c = cmap[k]
        g = (
            float(c)
            / (float(m) * float(m - 1))
            * area
            / (np.pi * (r2 * r2 - r1 * r1))
        )
        rows.append((k, r1, r2, c, g))
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "r1": round_like_sql([r[1] for r in rows], 6),
            "r2": round_like_sql([r[2] for r in rows], 6),
            "n_pairs": pa.array([r[3] for r in rows], pa.int64()),
            "g_r": round_like_sql([r[4] for r in rows], 6),
            "n_coincident": pa.array(
                [cmap[-1]] * len(rows), pa.int64()
            ),
        }
    )


def _q_crc32_audit(sf_dir: str) -> pa.Table:
    """CRC-32 (IEEE 802.3, zlib-compatible) checksums of each
    document's first 64 bytes plus the corpus XOR digest -- the
    content-integrity audit companion of the Luhn / Merkle ops.  The
    engine uses zlib.crc32; the SQL oracle recomputes byte-by-byte
    from a generated 256-entry table (a genuinely independent
    implementation)."""
    import zlib

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def crc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        crcs = np.array(
            [zlib.crc32(t[:64].encode("ascii")) for t in texts],
            np.int64,
        )
        return pa.table({"doc_id": pa.array(ids), "crc": pa.array(crcs)})

    crcs_ds = ds.map_batches(crc, batch_format="pyarrow", batch_size=None)
    # combiner tier: per-batch xor partials + the sampled rows only
    parts = []
    xor_total = 0
    for b in crcs_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = pa.table(b)
        c = t["crc"].to_numpy(zero_copy_only=False).astype(np.int64)
        xor_total ^= int(np.bitwise_xor.reduce(c)) if len(c) else 0
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
        parts.append(t.filter(pa.array(keep)))
    tbl = pa.concat_tables(parts).sort_by("doc_id")
    return pa.table(
        {
            "doc_id": tbl["doc_id"],
            "crc": tbl["crc"],
            "corpus_xor": pa.array(
                [xor_total] * tbl.num_rows, pa.int64()
            ),
        }
    )


_CRC_TABLE_SQL = None


def _crc32_oracle_sql() -> str:
    """Mirror of _q_crc32_audit: table-driven CRC-32 as a recursive
    CTE over byte positions (table generated here, independently of
    zlib)."""
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        tbl.append(c)
    vals = ", ".join(f"({i}, {v})" for i, v in enumerate(tbl))
    return (
        "WITH RECURSIVE ct(i, v) AS (SELECT * FROM (VALUES "
        + vals
        + ") AS t(i, v)), "
        "d AS (SELECT doc_id, substr(text, 1, 64) AS s, "
        "length(substr(text, 1, 64)) AS n FROM documents), "
        "w AS (SELECT doc_id, s, n, 1 AS pos, "
        "CAST(4294967295 AS BIGINT) AS crc FROM d "
        "UNION ALL "
        "SELECT w.doc_id, w.s, w.n, w.pos + 1, "
        "xor(w.crc >> 8, ct.v) FROM w JOIN ct "
        "ON ct.i = (xor(w.crc, ascii(substr(w.s, CAST(w.pos AS INTEGER), 1))) & 255) "
        "WHERE w.pos <= w.n), "
        "f AS (SELECT doc_id, xor(crc, 4294967295) AS crc FROM w "
        "WHERE pos = n + 1), "
        "x AS (SELECT bit_xor(crc) AS corpus_xor FROM f) "
        "SELECT f.doc_id, CAST(f.crc AS BIGINT) AS crc, "
        "CAST(x.corpus_xor AS BIGINT) AS corpus_xor FROM f, x "
        "WHERE f.doc_id % 50 = 0 ORDER BY f.doc_id"
    )


def _q_hop_histogram(sf_dir: str) -> pa.Table:
    """All-pairs min-hop histogram of the edit-1 word graph with the
    exact and EFFECTIVE (90th-percentile) diameters -- the
    small-world diagnostic.  Edge construction is the distributed
    deletion-blocked join; the all-source BFS runs on the
    vocabulary-bounded adjacency (ordered pairs, unreachable pairs
    excluded); effective diameter = smallest h with 10*cum >= 9*total
    (integer predicate)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    vocab = sorted(
        set(pairs["w1"].to_pylist()) | set(pairs["w2"].to_pylist())
    )
    wid = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    adj: list[set[int]] = [set() for _ in range(n)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = wid[w1], wid[w2]
        adj[a].add(b)
        adj[b].add(a)
    hist: dict[int, int] = {}
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier and d < 12:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for v, h in dist.items():
            if h >= 1:
                hist[h] = hist.get(h, 0) + 1
    hs = sorted(hist)
    tot = sum(hist.values())
    cum = 0
    eff = None
    for h in hs:
        cum += hist[h]
        if eff is None and 10 * cum >= 9 * tot:
            eff = h
    return pa.table(
        {
            "h": pa.array(hs, pa.int64()),
            "n_pairs": pa.array([hist[h] for h in hs], pa.int64()),
            "eff_diameter": pa.array([eff] * len(hs), pa.int64()),
            "diameter": pa.array([hs[-1]] * len(hs), pa.int64()),
        }
    )


def _q_graph_coloring_greedy(sf_dir: str) -> pa.Table:
    """Greedy vertex coloring of the hot-cell proximity graph
    (top-16 cells, Chebyshev <= 4 edges) in hotness order: each
    vertex takes the smallest color unused by its earlier-ordered
    neighbors -- the classic Delta+1 heuristic (frequency / channel
    assignment).  16 sequential mex steps, unrolled in SQL."""
    verts = _top_count_cells_xy(sf_dir, 16)
    nv = len(verts)
    colors: list[int] = []
    for i in range(nv):
        used = {
            colors[j]
            for j in range(i)
            if max(
                abs(verts[i][1] - verts[j][1]),
                abs(verts[i][2] - verts[j][2]),
            )
            <= _CLIQUE_T
        }
        c = 0
        while c in used:
            c += 1
        colors.append(c)
    return pa.table(
        {
            "cell": pa.array([v[0] for v in verts], pa.int64()),
            "color": pa.array(colors, pa.int64()),
            "n_colors": pa.array(
                [max(colors) + 1] * nv, pa.int64()
            ),
        }
    )


def _coloring_oracle_sql() -> str:
    """Mirror of _q_graph_coloring_greedy: 16 unrolled mex steps."""
    steps = []
    for i in range(1, 16):
        prev = f"a{i - 1}"
        steps.append(
            f"a{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL "
            f"SELECT {i} AS bi, (SELECT MIN(c.range) FROM range(0, 16) c "
            f"WHERE c.range NOT IN (SELECT p.col FROM {prev} p "
            f"JOIN sym ON sym.a = {i} AND sym.b = p.bi)) AS col)"
        )
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
        "t16 AS (SELECT cell, "
        "ROW_NUMBER() OVER (ORDER BY n DESC, cell) - 1 AS bi "
        "FROM cc ORDER BY n DESC, cell LIMIT 16), "
        "nd AS (SELECT cell, bi, cell % 96 AS x, cell // 96 AS y "
        "FROM t16), "
        "sym AS (SELECT a.bi AS a, b.bi AS b FROM nd a JOIN nd b "
        "ON b.bi <> a.bi AND GREATEST(ABS(a.x - b.x), "
        f"ABS(a.y - b.y)) <= {_CLIQUE_T}), "
        "a0 AS (SELECT 0 AS bi, 0 AS col), "
        + ", ".join(steps)
        + " SELECT nd.cell, CAST(a15.col AS BIGINT) AS color, "
        "(SELECT CAST(MAX(col) + 1 AS BIGINT) FROM a15) AS n_colors "
        "FROM a15 JOIN nd ON nd.bi = a15.bi"
    )


def _q_ca_trend_hours(sf_dir: str) -> pa.Table:
    """Cochran-Armitage trend test of purchase share across the 24
    ordered hour-of-day groups (scores = hour): z assembled from
    exact integer sums, z = (N*T - R*S1) * sqrt(N) /
    sqrt(R*(N-R)*(N*S2 - S1^2)) -- Python-int / HUGEINT moments,
    floats only in the two square roots."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h": pa.array((ts // 3_600_000_000) % 24),
                "r": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h"],
        [("r", "sum", "r"), ("_one", "sum", "n")],
    )
    h = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = agg["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    big_n = int(nn.sum())
    big_r = int(r.sum())
    t = int((h * r).sum())
    s1 = int((h * nn).sum())
    s2 = int((h * h * nn).sum())
    num = big_n * t - big_r * s1
    den = big_r * (big_n - big_r) * (big_n * s2 - s1 * s1)
    z = float(num) * np.sqrt(float(big_n)) / np.sqrt(float(den))
    return pa.table(
        {
            "n_total": pa.array([big_n], pa.int64()),
            "n_pos": pa.array([big_r], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "z_stat": round_like_sql([float(z)], 6),
        }
    )


def _q_chow_revenue_break(sf_dir: str) -> pa.Table:
    """Chow structural-break test of the daily revenue trend at the
    series midpoint: pooled and per-segment OLS SSEs from exact
    integer moments (A = nSyy - Sy^2, B = nSxy - SxSy, C = nSxx -
    Sx^2; SSE = (A - B^2/C)/n as one pinned float chain), F =
    ((SSEp - SSE1 - SSE2)/2) / ((SSE1 + SSE2)/(n - 4))."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    mid = n // 2

    def sse(lo: int, hi: int) -> float:
        m = hi - lo
        xs = list(range(lo, hi))
        sx = sum(xs)
        sy = sum(ys[lo:hi])
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys[lo:hi])
        sxy = sum(x * y for x, y in zip(xs, ys[lo:hi]))
        a = m * syy - sy * sy
        b = m * sxy - sx * sy
        c = m * sxx - sx * sx
        return (float(a) - float(b) * float(b) / float(c)) / float(m)

    sse_p = sse(0, n)
    sse_1 = sse(0, mid)
    sse_2 = sse(mid, n)
    f = ((sse_p - sse_1 - sse_2) / 2.0) / (
        (sse_1 + sse_2) / float(n - 4)
    )
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "sse_pooled": round_like_sql([sse_p], 6),
            "sse_1": round_like_sql([sse_1], 6),
            "sse_2": round_like_sql([sse_2], 6),
            "f_stat": round_like_sql([f], 6),
        }
    )


def _q_cvm_uniform(sf_dir: str) -> pa.Table:
    """One-sample Cramer-von Mises W^2 and circular Watson U^2
    goodness-of-fit of the fractional cents u = (c mod 10^4)/10^4
    against Uniform(0,1): the order-statistic sum expands to exact
    integers -- each tie run [a,b] of value k contributes the closed
    form sum of ((2i-1)*10^4 - 2n*k)^2, accumulated as Python ints
    (HUGEINT in SQL); floats only in the final assembly."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "k": pa.array(c % 10_000),
                "_one": pa.array(np.ones(len(c), np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("_one", "sum", "m")],
    ).sort_by("k")
    ks = counts["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    ms = counts["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(ms.sum())
    su = int((ks * ms).sum())  # sum of u * 10^4
    s_total = 0
    pos = 0
    alpha = 2 * 10_000
    for k, m in zip(ks.tolist(), ms.tolist()):
        a, b = pos + 1, pos + m
        beta = -10_000 - 2 * n * int(k)
        si = (a + b) * m // 2
        si2 = (
            b * (b + 1) * (2 * b + 1) // 6
            - (a - 1) * a * (2 * a - 1) // 6
        )
        s_total += alpha * alpha * si2 + 2 * alpha * beta * si + m * beta * beta
        pos += m
    den = float(2 * n * 10_000)
    w2 = 1.0 / (12.0 * float(n)) + float(s_total) / (den * den)
    ub_num = 2 * su - n * 10_000
    dev = float(ub_num) / den
    u2 = w2 - float(n) * dev * dev
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "w2": round_like_sql([w2], 6),
            "watson_u2": round_like_sql([u2], 6),
        }
    )


def _q_robust_moments(sf_dir: str) -> pa.Table:
    """Quantile-based robust shape statistics of the price cents:
    Bowley (quartile) skewness and Moors (octile) kurtosis from the
    distributed exact-quantile machinery (quantile_disc element
    selection -- every octile an exact integer, two float divisions
    total)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        exact_quantiles,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"c": pa.array(scaled_int(batch["l_extendedprice"], 100.0))}
        )

    cds = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    qs = [i / 8.0 for i in range(1, 8)]
    qt = exact_quantiles(cds, "c", qs)
    qcol = qt["q"].to_numpy(zero_copy_only=False)
    vcol = qt.column(qt.num_columns - 1)
    e = [
        int(vcol[int(np.argmin(np.abs(qcol - i / 8.0)))].as_py())
        for i in range(1, 8)
    ]
    # octiles e[0..6] at 1/8..7/8; quartiles are e[1], e[3], e[5]
    q1, q2, q3 = e[1], e[3], e[5]
    bowley = float(q3 + q1 - 2 * q2) / float(q3 - q1)
    moors = float((e[6] - e[4]) + (e[2] - e[0])) / float(e[5] - e[1])
    return pa.table(
        {
            "q1": pa.array([q1], pa.int64()),
            "q2": pa.array([q2], pa.int64()),
            "q3": pa.array([q3], pa.int64()),
            "bowley_skew": round_like_sql([bowley], 6),
            "moors_kurt": round_like_sql([moors], 6),
        }
    )


def _q_hartley_fmax(sf_dir: str) -> pa.Table:
    """Hartley's F_max variance-ratio screen across the event types:
    group variances as exact rationals A_t / (n_t (n_t - 1)) with
    A = n*S2 - S1^2, the argmax / argmin chosen by exact HUGEINT
    cross-multiplication (name ties), F_max one float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "t": batch["event_type"],
                "_one": pa.array(np.ones(len(c), np.int64)),
                "s1": pa.array(c),
                "s2": pa.array(c * c),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("_one", "sum", "n"), ("s1", "sum", "s1"), ("s2", "sum", "s2")],
    )
    g = {}
    for i in range(agg.num_rows):
        nt = int(agg["n"][i].as_py())
        s1 = int(agg["s1"][i].as_py())
        s2 = int(agg["s2"][i].as_py())
        g[agg["t"][i].as_py()] = (nt * s2 - s1 * s1, nt * (nt - 1))
    names = sorted(g)

    def beats(x: str, y: str) -> bool:
        ax, dx = g[x]
        ay, dy = g[y]
        return ax * dy > ay * dx or (ax * dy == ay * dx and x < y)

    t_max = min(
        (t for t in names if all(not beats(o, t) for o in names if o != t))
    )
    t_min = min(
        (t for t in names if all(not beats(t, o) for o in names if o != t))
    )
    amax, dmax = g[t_max]
    amin, dmin = g[t_min]
    f = float(amax * dmin) / float(amin * dmax)
    return pa.table(
        {
            "type_max": pa.array([t_max]),
            "type_min": pa.array([t_min]),
            "f_max": round_like_sql([f], 6),
        }
    )


def _q_siegel_slopes(sf_dir: str) -> pa.Table:
    """Siegel repeated-medians robust slope of the daily revenue
    trend: per day the LOWER median of its pairwise slopes, then the
    lower median across days (explicit (m+1)//2 order-statistic rule
    on both levels -- no quantile-convention ambiguity; slopes are
    shared float divisions)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    per_i = []
    for i in range(n):
        slopes = sorted(
            float(ys[j] - ys[i]) / float(j - i)
            for j in range(n)
            if j != i
        )
        per_i.append(slopes[(len(slopes) + 1) // 2 - 1])
    per_i.sort()
    slope = per_i[(n + 1) // 2 - 1]
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "siegel_slope": round_like_sql([slope], 6),
        }
    )


def _q_max_subarray(sf_dir: str) -> pa.Table:
    """Maximum-sum contiguous run of daily revenue DELTAS (Kadane's
    problem) via the prefix-sum identity: best = max_t (S_t - min_{u<t}
    S_u) -- exact integers, expressed with window functions in SQL
    (the same prefix-min discipline as the clamped running balance).
    Canonical ties by (start, end)."""
    ys = _daily_revenue_cents(sf_dir)
    d = [ys[t] - ys[t - 1] for t in range(1, len(ys))]
    s = 0
    min_s, min_i = 0, -1  # running min prefix, FIRST index (virtual -1)
    prefixes = []
    best = None  # (-sum, start, end)
    for t, v in enumerate(d):
        s += v
        ssum = s - min_s
        start = min_i + 1
        key = (-ssum, start, t)
        if best is None or key < best:
            best = key
        prefixes.append(s)
        if s < min_s:
            min_s, min_i = s, t
    return pa.table(
        {
            "best_sum": pa.array([-best[0]], pa.int64()),
            "start_t": pa.array([best[1]], pa.int64()),
            "end_t": pa.array([best[2]], pa.int64()),
            "n_days": pa.array([len(d)], pa.int64()),
        }
    )


def _q_kendall_w(sf_dir: str) -> pa.Table:
    """Kendall's coefficient of concordance W across daily
    event-type-count ballots (blocks = days, objects = the 5 types,
    within-day ranks tie-averaged): with doubled ranks everything is
    exact integer -- W = 12 * sum(D2q) / (4 * m^2 (k^3 - k) -
    m * sum T) with the standard tie correction, one float
    division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "t": batch["event_type"],
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day", "t"],
        [("_one", "sum", "n")],
    )
    cells: dict[int, dict[str, int]] = {}
    for i in range(agg.num_rows):
        cells.setdefault(int(agg["day"][i].as_py()), {})[
            agg["t"][i].as_py()
        ] = int(agg["n"][i].as_py())
    k = len(_MARKOV_STATES)
    days = sorted(cells)
    m = len(days)
    rsum2 = {t: 0 for t in _MARKOV_STATES}  # doubled rank sums
    tie_term = 0  # sum over blocks of sum(t^3 - t) over tie groups
    for day in days:
        counts = [cells[day].get(t, 0) for t in _MARKOV_STATES]
        order = sorted(range(k), key=lambda j: counts[j])
        # doubled tie-averaged ranks
        r2 = [0] * k
        i = 0
        while i < k:
            j = i
            while j + 1 < k and counts[order[j + 1]] == counts[order[i]]:
                j += 1
            g = j - i + 1
            dr2 = (i + 1) + (j + 1)  # 2 * average rank
            for p in range(i, j + 1):
                r2[order[p]] = dr2
            tie_term += g * g * g - g
            i = j + 1
        for t, v in zip(_MARKOV_STATES, r2):
            rsum2[t] += v
    mean2 = m * (k + 1)  # doubled mean rank sum
    d2q = sum((rsum2[t] - mean2) ** 2 for t in _MARKOV_STATES)
    num = 12 * d2q
    den = 4 * (m * m * (k * k * k - k) - m * tie_term)
    w = float(num) / float(den)
    return pa.table(
        {
            "n_days": pa.array([m], pa.int64()),
            "d2_q": pa.array([d2q], pa.int64()),
            "tie_term": pa.array([tie_term], pa.int64()),
            "kendall_w": round_like_sql([w], 6),
        }
    )


def _q_cronbach_daily_counts(sf_dir: str) -> pa.Table:
    """Cronbach's alpha internal-consistency coefficient: items = the
    5 event types, subjects = days, score = daily count per type.
    Item and total variances from exact integer moments (biased /
    population form, documented) -- alpha = k/(k-1) * (1 -
    sum var_i / var_tot) reduces to one float chain over exact
    integers."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "t": batch["event_type"],
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day", "t"],
        [("_one", "sum", "n")],
    )
    cells: dict[int, dict[str, int]] = {}
    for i in range(agg.num_rows):
        cells.setdefault(int(agg["day"][i].as_py()), {})[
            agg["t"][i].as_py()
        ] = int(agg["n"][i].as_py())
    days = sorted(cells)
    m = len(days)
    k = len(_MARKOV_STATES)
    # n-scaled variances: V' = m * sum x^2 - (sum x)^2  (= m^2 * var)
    sum_vi = 0
    s_tot = 0
    s2_tot = 0
    for t in _MARKOV_STATES:
        s = sum(cells[d].get(t, 0) for d in days)
        s2 = sum(cells[d].get(t, 0) ** 2 for d in days)
        sum_vi += m * s2 - s * s
    tots = [sum(cells[d].values()) for d in days]
    s_tot = sum(tots)
    s2_tot = sum(x * x for x in tots)
    v_tot = m * s2_tot - s_tot * s_tot
    alpha = (float(k) / float(k - 1)) * (
        1.0 - float(sum_vi) / float(v_tot)
    )
    return pa.table(
        {
            "n_days": pa.array([m], pa.int64()),
            "sum_item_var": pa.array([sum_vi], pa.int64()),
            "total_var": pa.array([v_tot], pa.int64()),
            "alpha": round_like_sql([alpha], 6),
        }
    )


def _q_h_index(sf_dir: str) -> pa.Table:
    """h-index and g-index of the user-activity distribution (users
    as "papers", event counts as "citations"): h = max rank with
    count >= rank, g = max rank with cumulative count >= rank^2 --
    pure integer rank predicates over the distributed per-user
    counts."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("_one", "sum", "n")],
    )
    counts = sorted(
        (int(x) for x in agg["n"].to_pylist()), reverse=True
    )
    h = 0
    for r, c in enumerate(counts, start=1):
        if c >= r:
            h = r
    g = 0
    cum = 0
    for r, c in enumerate(counts, start=1):
        cum += c
        if cum >= r * r:
            g = r
    return pa.table(
        {
            "n_users": pa.array([len(counts)], pa.int64()),
            "h_index": pa.array([h], pa.int64()),
            "g_index": pa.array([g], pa.int64()),
        }
    )


def _q_kleinberg_bursts(sf_dir: str) -> pa.Table:
    """Kleinberg 2-state burst automaton over the daily purchase
    share: state rates p0 = global share, p1 = min(2*p0, 0.999);
    per-day binomial log-cost terms quantized at 1e9 ticks (the
    binomial coefficient cancels between states and is dropped), one
    ln(n_days)*1e9 transition charge into the burst state.  The DP
    runs on exact integer ticks (recursive CTE mirror); output is
    the per-day cost profile plus the marginal burst flag."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(day),
                "k": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("k", "sum", "k"), ("_one", "sum", "n")],
    ).sort_by("day")
    kk = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(kk)
    big_k, big_n = int(kk.sum()), int(nn.sum())
    p0 = float(big_k) / float(big_n)
    p1 = min(2.0 * p0, 0.999)

    def cost(k: int, n: int, p: float) -> int:
        return int(
            round_half_away(
                np.array(
                    [
                        -(
                            float(k) * np.log(p)
                            + float(n - k) * np.log(1.0 - p)
                        )
                        * 1e9
                    ]
                )
            )[0]
        )

    trans = int(
        round_half_away(np.array([np.log(float(m)) * 1e9]))[0]
    )
    c0, c1 = 0, 10**18  # the automaton starts in the base state
    rows = []
    for t in range(m):
        k, n = int(kk[t]), int(nn[t])
        nc0 = min(c0, c1) + cost(k, n, p0)
        nc1 = min(c0 + trans, c1) + cost(k, n, p1)
        c0, c1 = nc0, nc1
        rows.append((t, c0, c1, 1 if c1 < c0 else 0))
    return pa.table(
        {
            "t": pa.array([r[0] for r in rows], pa.int64()),
            "c0_ticks": pa.array([r[1] for r in rows], pa.int64()),
            "c1_ticks": pa.array([r[2] for r in rows], pa.int64()),
            "in_burst": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _kleinberg_oracle_sql() -> str:
    """Mirror of _q_kleinberg_bursts: recursive CTE over the
    integer-tick two-state DP."""
    return (
        "WITH RECURSIVE e AS (SELECT epoch_us(ts) // 86400000000 "
        "AS day, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        "AS k FROM events), "
        "g AS (SELECT day, CAST(SUM(k) AS BIGINT) AS k, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY day), "
        "sq AS (SELECT k, n, ROW_NUMBER() OVER (ORDER BY day) - 1 "
        "AS t FROM g), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
        "CAST(SUM(k) AS BIGINT) AS bk, CAST(SUM(n) AS BIGINT) AS bn "
        "FROM sq), "
        "pp AS (SELECT CAST(bk AS DOUBLE) / CAST(bn AS DOUBLE) AS p0, "
        "LEAST(2.0 * CAST(bk AS DOUBLE) / CAST(bn AS DOUBLE), 0.999) "
        "AS p1, CAST(ROUND(LN(CAST(m AS DOUBLE)) * 1e9, 0) AS BIGINT) "
        "AS trans, m FROM m), "
        "cst AS (SELECT sq.t, sq.k, sq.n, "
        "CAST(ROUND(-(CAST(sq.k AS DOUBLE) * LN(pp.p0) "
        "+ CAST(sq.n - sq.k AS DOUBLE) * LN(1.0 - pp.p0)) * 1e9, 0) "
        "AS BIGINT) AS q0, "
        "CAST(ROUND(-(CAST(sq.k AS DOUBLE) * LN(pp.p1) "
        "+ CAST(sq.n - sq.k AS DOUBLE) * LN(1.0 - pp.p1)) * 1e9, 0) "
        "AS BIGINT) AS q1 FROM sq, pp), "
        "w AS (SELECT cst.t, "
        "cst.q0 AS c0, (SELECT trans FROM pp) + cst.q1 AS c1 "
        "FROM cst WHERE cst.t = 0 "
        "UNION ALL "
        "SELECT cst.t, LEAST(w.c0, w.c1) + cst.q0, "
        "LEAST(w.c0 + (SELECT trans FROM pp), w.c1) + cst.q1 "
        "FROM w JOIN cst ON cst.t = w.t + 1) "
        "SELECT CAST(t AS BIGINT) AS t, c0 AS c0_ticks, "
        "c1 AS c1_ticks, "
        "CAST(CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS BIGINT) "
        "AS in_burst FROM w"
    )


def _q_map_at_10(sf_dir: str) -> pa.Table:
    """Mean-average-precision@10 inputs per language for the ranking
    "n_chars DESC, doc_id" with binary relevance n_chars % 3 = 2:
    AP's rational value is held exactly as ap_num / (2520 *
    min(R, 10)) (2520 = lcm(1..10), so every precision@i term is an
    integer), with one float division at the end.  Top-10 via
    per-block partial top-k; R from the bounded (lang) aggregate."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def topk(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_numpy(zero_copy_only=False))
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = []
        for lv in np.unique(lang):
            mm = np.nonzero(lang == lv)[0]
            order = np.lexsort((did[mm], -nc[mm]))[:10]
            keep.extend(mm[order].tolist())
        keep = np.array(keep, np.int64)
        return pa.table(
            {
                "lang": pa.array(lang[keep]),
                "doc_id": pa.array(did[keep]),
                "n_chars": pa.array(nc[keep]),
            }
        )

    tops = collect_tables(
        ds.map_batches(topk, batch_format="pyarrow", batch_size=None)
    )
    rtot = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "r": pa.array(
                        (
                            b["n_chars"].to_numpy(zero_copy_only=False)
                            % 3
                            == 2
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["lang"],
        [("r", "sum", "r")],
    )
    rmap = {
        rtot["lang"][i].as_py(): int(rtot["r"][i].as_py())
        for i in range(rtot.num_rows)
    }
    lang_t = np.asarray(tops["lang"].to_numpy(zero_copy_only=False))
    did_t = tops["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc_t = tops["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = []
    for lv in sorted(set(lang_t.tolist())):
        mm = np.nonzero(lang_t == lv)[0]
        order = np.lexsort((did_t[mm], -nc_t[mm]))[:10]
        hits = 0
        ap_num = 0
        for i, idx in enumerate(order, start=1):
            if nc_t[mm[idx]] % 3 == 2:
                hits += 1
                ap_num += (2520 // i) * hits
        r = rmap[lv]
        denom = 2520 * min(r, 10)
        rows.append(
            (lv, r, hits, ap_num, float(ap_num) / float(denom))
        )
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows]),
            "r_total": pa.array([r[1] for r in rows], pa.int64()),
            "hits_at_10": pa.array([r[2] for r in rows], pa.int64()),
            "ap_num": pa.array([r[3] for r in rows], pa.int64()),
            "ap": round_like_sql([r[4] for r in rows], 6),
        }
    )


_LRU_SIZES = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def _q_lru_hit_rates(sf_dir: str) -> pa.Table:
    """LRU cache hit-rate curve over the global user-access stream
    (Mattson 1970 stack distances, computed EXACTLY in one pass):
    access i with previous occurrence p hits a size-k cache iff its
    stack distance -- the number of distinct users seen strictly
    between p and i -- is < k.  The engine runs the offline
    expiry-sweep (BIT over positions, j counted while its next
    occurrence is still >= i); the SQL mirror states the same
    identity as a windowed join (j in (p, i) with nxt_j >= i).
    Sequential by nature -- the stream order IS the semantics -- so
    the driver holds the (pos, user) relation (one int pair per
    access), not the raw rows."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ts": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
            }
        )

    tbl = collect_tables(
        ds.map_batches(slim, batch_format="pyarrow", batch_size=None)
    ).sort_by([("ts", "ascending"), ("event_id", "ascending")])
    users = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(users)
    prev = np.full(n, -1, np.int64)
    nxt = np.full(n, n, np.int64)
    last: dict[int, int] = {}
    for i, u in enumerate(users.tolist()):
        if u in last:
            prev[i] = last[u]
            nxt[last[u]] = i
        last[u] = i
    # expiry sweep: BIT over positions; j active iff nxt_j >= i
    bit = np.zeros(n + 1, np.int64)

    def bit_add(i: int, v: int) -> None:
        i += 1
        while i <= n:
            bit[i] += v
            i += i & (-i)

    def bit_sum(i: int) -> int:  # prefix sum of [0, i]
        i += 1
        s = 0
        while i > 0:
            s += bit[i]
            i -= i & (-i)
        return s

    expire: dict[int, list[int]] = {}
    for j in range(n):
        expire.setdefault(int(nxt[j]), []).append(j)
    hist: dict[int, int] = {}
    n_reaccess = 0
    for i in range(n):
        for j in expire.get(i, ()):
            bit_add(j, -1)
        p = int(prev[i])
        if p >= 0:
            n_reaccess += 1
            sd = bit_sum(i - 1) - bit_sum(p)
            hist[sd] = hist.get(sd, 0) + 1
        bit_add(i, 1)
    rows = []
    for k in _LRU_SIZES:
        hits = sum(c for sd, c in hist.items() if sd < k)
        rows.append((k, hits))
    return pa.table(
        {
            "cache_size": pa.array([r[0] for r in rows], pa.int64()),
            "hits": pa.array([r[1] for r in rows], pa.int64()),
            "accesses": pa.array([n] * len(rows), pa.int64()),
            "reaccesses": pa.array(
                [n_reaccess] * len(rows), pa.int64()
            ),
            "hit_rate": round_like_sql(
                [float(r[1]) / float(n) for r in rows], 6
            ),
        }
    )


def _lru_oracle_sql() -> str:
    """Mirror of _q_lru_hit_rates: stack distance as the windowed
    distinct-survivor count (j in (p, i) with nxt_j >= i)."""
    sizes = ", ".join(f"({k})" for k in _LRU_SIZES)
    return (
        "WITH s AS (SELECT user_id, ROW_NUMBER() OVER "
        "(ORDER BY ts, event_id) - 1 AS pos FROM events), "
        "pn AS (SELECT pos, "
        "LAG(pos) OVER (PARTITION BY user_id ORDER BY pos) AS p, "
        "COALESCE(LEAD(pos) OVER (PARTITION BY user_id "
        "ORDER BY pos), (SELECT COUNT(*) FROM s)) AS nxt FROM s), "
        "sd AS (SELECT a.pos, CAST(COUNT(b.pos) AS BIGINT) AS sd "
        "FROM pn a LEFT JOIN pn b "
        "ON b.pos > a.p AND b.pos < a.pos AND b.nxt >= a.pos "
        "WHERE a.p IS NOT NULL GROUP BY a.pos), "
        f"ks AS (SELECT * FROM (VALUES {sizes}) AS v(k)) "
        "SELECT CAST(ks.k AS BIGINT) AS cache_size, "
        "CAST(SUM(CASE WHEN sd.sd < ks.k THEN 1 ELSE 0 END) "
        "AS BIGINT) AS hits, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS accesses, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM sd) AS reaccesses, "
        "ROUND(CAST(SUM(CASE WHEN sd.sd < ks.k THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST((SELECT COUNT(*) FROM s) AS DOUBLE), 6) "
        "AS hit_rate FROM ks, sd GROUP BY ks.k"
    )


_IFOREST_TREES = 8
_IFOREST_DEPTH = 6


def _q_isolation_forest_lite(sf_dir: str) -> pa.Table:
    """Random-split density scoring (isolation-forest variant with
    fixed depth): 8 deterministic binary trees partition the
    (hour-sum, cents-sum) user-centroid space with mix32-derived
    axis/threshold choices; a user's anomaly evidence is the summed
    population of its 8 leaves (small = isolated).  Rational
    centroids compare exactly via cross-multiplication (s < thr * n),
    so every routing decision is integer.  Top-20 most isolated
    users."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
            scaled_int,
        )

        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "_one": pa.array(np.ones(len(ts), np.int64)),
                "sh": pa.array((ts // 3_600_000_000) % 24),
                "sc": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("_one", "sum", "n"), ("sh", "sum", "sh"), ("sc", "sum", "sc")],
    )
    uid = agg["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sh = agg["sh"].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = agg["sc"].to_numpy(zero_copy_only=False).astype(np.int64)
    # feature ranges: hour in [0, 24), cents in [0, 56100)
    ranges = (24, 56_100)
    score = np.zeros(len(uid), np.int64)
    for t in range(_IFOREST_TREES):
        leaf = np.zeros(len(uid), np.int64)
        for d in range(_IFOREST_DEPTH):
            # per-(tree, depth, node) feature and threshold
            key = t * 1_000 + d * 100 + leaf
            feat = mix32(key, 3) % 2
            thr = np.where(
                feat == 0,
                mix32(key, 5) % ranges[0],
                mix32(key, 5) % ranges[1],
            )
            s = np.where(feat == 0, sh, sc)
            go_left = s < thr * nn  # mean < thr, cross-multiplied
            leaf = leaf * 2 + np.where(go_left, 0, 1)
        pop = np.zeros(1 << _IFOREST_DEPTH, np.int64)
        np.add.at(pop, leaf, 1)
        score += pop[leaf]
    order = np.lexsort((uid, score))[:20]
    return pa.table(
        {
            "user_id": pa.array(uid[order]),
            "leaf_pop_sum": pa.array(score[order]),
        }
    )


def _iforest_oracle_sql() -> str:
    """Mirror of _q_isolation_forest_lite: 6 unrolled routing levels
    per tree over the mix32 node parameters."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql,
    )

    lvls = []
    for d in range(_IFOREST_DEPTH):
        prev = f"l{d}"
        lvls.append(
            f"l{d + 1} AS MATERIALIZED (SELECT u.user_id, u.t, "
            f"u.leaf * 2 + CASE WHEN (CASE WHEN u.feat = 0 THEN u.sh "
            f"ELSE u.sc END) < u.thr * u.n THEN 0 ELSE 1 END AS leaf, "
            f"u.n, u.sh, u.sc FROM (SELECT p.*, "
            f"({mix32_sql('p.t * 1000 + ' + str(d) + ' * 100 + p.leaf', 3)}) % 2 AS feat, "
            f"CASE WHEN ({mix32_sql('p.t * 1000 + ' + str(d) + ' * 100 + p.leaf', 3)}) % 2 = 0 "
            f"THEN ({mix32_sql('p.t * 1000 + ' + str(d) + ' * 100 + p.leaf', 5)}) % 24 "
            f"ELSE ({mix32_sql('p.t * 1000 + ' + str(d) + ' * 100 + p.leaf', 5)}) % 56100 "
            f"END AS thr FROM {prev} p) u)"
        )
    return (
        "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM((epoch_us(ts) // 3600000000) % 24) AS BIGINT) AS sh, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS sc FROM events GROUP BY user_id), "
        f"tr AS (SELECT range AS t FROM range(0, {_IFOREST_TREES})), "
        "l0 AS (SELECT c.user_id, tr.t, CAST(0 AS BIGINT) AS leaf, "
        "c.n, c.sh, c.sc FROM c, tr), "
        + ", ".join(lvls)
        + f", pop AS (SELECT t, leaf, CAST(COUNT(*) AS BIGINT) AS pp "
        f"FROM l{_IFOREST_DEPTH} GROUP BY t, leaf), "
        f"sc AS (SELECT l.user_id, "
        f"CAST(SUM(pop.pp) AS BIGINT) AS leaf_pop_sum "
        f"FROM l{_IFOREST_DEPTH} l JOIN pop "
        "ON pop.t = l.t AND pop.leaf = l.leaf GROUP BY l.user_id) "
        "SELECT user_id, leaf_pop_sum FROM sc "
        "ORDER BY leaf_pop_sum, user_id LIMIT 20"
    )


def _q_renyi_entropy(sf_dir: str) -> pa.Table:
    """Renyi entropy spectrum of the corpus token distribution at
    orders 0 (Hartley / log-vocab), 2 (collision), 3 and infinity
    (min-entropy): every power sum S_a = sum c^a is an exact integer
    over the distributed token counts, so H_a = (log(N^a) -
    log(S_a)) / (a - 1) is one pinned float chain per order (natural
    log)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        ngram_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    tf = collect_tables(ngram_counts(ds, n=1))
    c = np.array([int(x) for x in tf["n"].to_pylist()], object)
    n = int(sum(c))
    v = len(c)
    s2 = int(sum(int(x) * int(x) for x in c))
    s3 = int(sum(int(x) ** 3 for x in c))
    cmax = int(max(int(x) for x in c))
    h0 = np.log(float(v))
    h2 = -(np.log(float(s2)) - 2.0 * np.log(float(n)))
    h3 = -(np.log(float(s3)) - 3.0 * np.log(float(n))) / 2.0
    hinf = -(np.log(float(cmax)) - np.log(float(n)))
    return pa.table(
        {
            "order_name": pa.array(["h0", "h2", "h3", "hinf"]),
            "entropy": round_like_sql([h0, h2, h3, hinf], 6),
            "n_tokens": pa.array([n] * 4, pa.int64()),
            "vocab": pa.array([v] * 4, pa.int64()),
        }
    )


def _q_rocchio_feedback(sf_dir: str) -> pa.Table:
    """Rocchio relevance-feedback term weights (alpha = beta = 1):
    relevant = English documents, non-relevant = the rest; weight =
    c_r(t)/N_r - c_n(t)/N_n held exactly as the integer numerator
    c_r*N_n - c_n*N_r over N_r*N_n -- ranking and ties are pure
    integer comparisons, one float division per emitted term.
    Top-10 expansion terms."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rel = (
            pc.equal(batch["lang"], "en")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat = pc.list_flatten(toks)
        r = np.repeat(rel, lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": flat.filter(pa.array(keep)),
                "r": pa.array(r[keep]),
                "_one": pa.array(
                    np.ones(int(keep.sum()), np.int64)
                ),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("r", "sum", "cr"), ("_one", "sum", "ct")],
    )
    toks = agg["t"].to_pylist()
    cr = agg["cr"].to_numpy(zero_copy_only=False).astype(np.int64)
    ct = agg["ct"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = ct - cr
    n_r = int(cr.sum())
    n_n = int(cn.sum())
    num = cr * n_n - cn * n_r
    order = np.lexsort((np.asarray(toks, object), -num))[:10]
    return pa.table(
        {
            "term": pa.array([toks[int(i)] for i in order]),
            "w_num": pa.array(num[order], pa.int64()),
            "weight": round_like_sql(
                num[order].astype(np.float64)
                / (float(n_r) * float(n_n)),
                6,
            ),
        }
    )


def _voronoi_top100(sf_dir: str):
    """Top-100 count cells labeled by nearest _ASSIGN_PROBES site
    (exact integer d2, site-order ties) -- the shared partition of
    the cluster-validity indices."""
    verts = _top_count_cells_xy(sf_dir, 100)
    sites = _ASSIGN_PROBES
    lab = []
    for _c, x, y in verts:
        best = min(
            (
                ((x - sx) ** 2 + (y - sy) ** 2, i)
                for i, (sx, sy) in enumerate(sites)
            )
        )
        lab.append(best[1])
    return verts, lab


def _q_dunn_index(sf_dir: str) -> pa.Table:
    """Dunn cluster-validity index of the Voronoi partition of the
    top-100 event cells around the 6 probe sites: min inter-cluster
    squared distance over max intra-cluster squared diameter -- all
    exact integers, one float division (on the squared form,
    documented)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    verts, lab = _voronoi_top100(sf_dir)
    n = len(verts)
    min_inter = None
    max_intra = 0
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (verts[i][1] - verts[j][1]) ** 2 + (
                verts[i][2] - verts[j][2]
            ) ** 2
            if lab[i] == lab[j]:
                max_intra = max(max_intra, d2)
            elif min_inter is None or d2 < min_inter:
                min_inter = d2
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "min_inter_d2": pa.array([min_inter], pa.int64()),
            "max_intra_d2": pa.array([max_intra], pa.int64()),
            "dunn_sq": round_like_sql(
                [float(min_inter) / float(max_intra)], 6
            ),
        }
    )


def _q_davies_bouldin_voronoi(sf_dir: str) -> pa.Table:
    """Davies-Bouldin index of the same Voronoi partition with the
    probe sites as centers: scatter s_i = (sum of distances to the
    site) / n_i held as exact rationals, R_ij = (s_i + s_j)/d_ij,
    the per-cluster max chosen on the float value (pinned chain) and
    DB = mean.  Distances are sqrt of exact integers."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    verts, lab = _voronoi_top100(sf_dir)
    sites = _ASSIGN_PROBES
    k = len(sites)
    sums = [0] * k  # 1e9-tick quantized distance sums (order-free)
    ns = [0] * k
    for (_c, x, y), li in zip(verts, lab):
        d2 = (x - sites[li][0]) ** 2 + (y - sites[li][1]) ** 2
        sums[li] += int(
            round_half_away(np.array([np.sqrt(float(d2)) * 1e9]))[0]
        )
        ns[li] += 1
    s = [
        float(sums[i]) / 1e9 / float(ns[i]) if ns[i] else 0.0
        for i in range(k)
    ]
    term_ticks = 0
    n_cl = 0
    for i in range(k):
        if ns[i] == 0:
            continue
        best = 0.0
        for j in range(k):
            if j == i or ns[j] == 0:
                continue
            dij = np.sqrt(
                float(
                    (sites[i][0] - sites[j][0]) ** 2
                    + (sites[i][1] - sites[j][1]) ** 2
                )
            )
            r = (s[i] + s[j]) / dij
            if r > best:
                best = r
        term_ticks += int(round_half_away(np.array([best * 1e9]))[0])
        n_cl += 1
    db = float(term_ticks) / 1e9 / float(n_cl)
    return pa.table(
        {
            "n_clusters": pa.array([n_cl], pa.int64()),
            "db_index": round_like_sql([db], 6),
        }
    )


def _q_banzhaf_power(sf_dir: str) -> pa.Table:
    """Banzhaf and Shapley-Shubik voting-power indices of the top-6
    users weighted by event counts (quota = majority of the total):
    Banzhaf swings by full 2^6 coalition enumeration, Shapley-Shubik
    pivots by full 6! permutation enumeration -- both exact integer
    counts, mirrored by range/VALUES enumerations in SQL."""
    from itertools import permutations

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    top = _top_users_by_count(sf_dir, 6)
    uids = [u for u, _ in top]
    w = [c for _, c in top]
    total = sum(w)
    q = total // 2 + 1
    swings = [0] * 6
    for m in range(64):
        s = sum(w[i] for i in range(6) if m >> i & 1)
        for i in range(6):
            if not m >> i & 1 and s < q <= s + w[i]:
                swings[i] += 1
    pivots = [0] * 6
    for perm in permutations(range(6)):
        s = 0
        for i in perm:
            s += w[i]
            if s >= q:
                pivots[i] += 1
                break
    return pa.table(
        {
            "user_id": pa.array(uids, pa.int64()),
            "weight": pa.array(w, pa.int64()),
            "banzhaf_swings": pa.array(swings, pa.int64()),
            "ss_pivots": pa.array(pivots, pa.int64()),
            "banzhaf_norm": round_like_sql(
                [float(s) / float(sum(swings)) for s in swings], 6
            ),
            "ss_index": round_like_sql(
                [float(p) / 720.0 for p in pivots], 6
            ),
        }
    )


def _banzhaf_oracle_sql() -> str:
    """Mirror of _q_banzhaf_power: 2^6 coalition and 6! permutation
    enumerations."""
    from itertools import permutations

    pm_rows = ", ".join(
        f"({pid}, {pos}, {i})"
        for pid, perm in enumerate(permutations(range(6)))
        for pos, i in enumerate(perm)
    )
    return (
        "WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY user_id), "
        "t6 AS (SELECT user_id, n, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, user_id) - 1 AS i FROM uc "
        "ORDER BY n DESC, user_id LIMIT 6), "
        "qq AS (SELECT CAST(SUM(n) // 2 + 1 AS BIGINT) AS q FROM t6), "
        "ms AS (SELECT range AS m FROM range(0, 64)), "
        "csum AS (SELECT ms.m, CAST(COALESCE(SUM(t6.n), 0) AS BIGINT) "
        "AS s FROM ms LEFT JOIN t6 ON (ms.m >> t6.i) & 1 = 1 "
        "GROUP BY ms.m), "
        "sw AS (SELECT t6.i, CAST(COUNT(*) AS BIGINT) AS swings "
        "FROM t6 JOIN csum ON (csum.m >> t6.i) & 1 = 0 "
        "JOIN qq ON csum.s < qq.q AND csum.s + t6.n >= qq.q "
        "GROUP BY t6.i), "
        f"pm AS (SELECT * FROM (VALUES {pm_rows}) AS v(pid, pos, i)), "
        "pc AS (SELECT pm.pid, pm.pos, pm.i, "
        "SUM(t6.n) OVER (PARTITION BY pm.pid ORDER BY pm.pos "
        "ROWS UNBOUNDED PRECEDING) AS cum FROM pm "
        "JOIN t6 ON t6.i = pm.i), "
        "pv AS (SELECT pid, MIN(pos) AS piv_pos FROM pc, qq "
        "WHERE cum >= qq.q GROUP BY pid), "
        "pivn AS (SELECT pc.i, CAST(COUNT(*) AS BIGINT) AS pivots "
        "FROM pv JOIN pc ON pc.pid = pv.pid "
        "AND pc.pos = pv.piv_pos GROUP BY pc.i), "
        "tot AS (SELECT CAST(SUM(swings) AS BIGINT) AS ts FROM sw) "
        "SELECT t6.user_id, t6.n AS weight, "
        "COALESCE(sw.swings, 0) AS banzhaf_swings, "
        "COALESCE(pivn.pivots, 0) AS ss_pivots, "
        "ROUND(CAST(COALESCE(sw.swings, 0) AS DOUBLE) "
        "/ CAST(tot.ts AS DOUBLE), 6) AS banzhaf_norm, "
        "ROUND(CAST(COALESCE(pivn.pivots, 0) AS DOUBLE) / 720.0, 6) "
        "AS ss_index "
        "FROM t6 LEFT JOIN sw ON sw.i = t6.i "
        "LEFT JOIN pivn ON pivn.i = t6.i, tot"
    )


def _q_irv_election(sf_dir: str) -> pa.Table:
    """Instant-runoff (ranked-choice) election among the 5 event
    types with days as ballots (ranking = daily counts desc, type
    ties alphabetical): 4 elimination rounds, each tallying first
    preferences among surviving candidates and eliminating the
    minimum (ties alphabetical).  Pure integer tallies; the SQL
    mirror unrolls the rounds."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "t": batch["event_type"],
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day", "t"],
        [("_one", "sum", "n")],
    )
    cells: dict[int, dict[str, int]] = {}
    for i in range(agg.num_rows):
        cells.setdefault(int(agg["day"][i].as_py()), {})[
            agg["t"][i].as_py()
        ] = int(agg["n"][i].as_py())
    active = sorted(_MARKOV_STATES)
    rows = []
    for rnd in range(1, 5):
        tally = {t: 0 for t in active}
        for day in cells:
            fp = min(
                active,
                key=lambda t: (-cells[day].get(t, 0), t),
            )
            tally[fp] += 1
        worst = min(active, key=lambda t: (tally[t], t))
        rows.append((rnd, worst, tally[worst], 0))
        active.remove(worst)
    # final round: the winner's tally
    tally = {t: 0 for t in active}
    for day in cells:
        fp = min(active, key=lambda t: (-cells[day].get(t, 0), t))
        tally[fp] += 1
    rows.append((5, active[0], tally[active[0]], 1))
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "tally": pa.array([r[2] for r in rows], pa.int64()),
            "is_winner": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _irv_oracle_sql() -> str:
    """Mirror of _q_irv_election: 4 unrolled elimination rounds."""
    base = (
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "event_type AS t FROM events), "
        "g AS (SELECT day, t, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM e GROUP BY day, t), "
        "dd AS (SELECT DISTINCT day FROM g), "
        "tt AS (SELECT * FROM (VALUES ('click'), ('error'), "
        "('purchase'), ('signup'), ('view')) AS v(t)), "
        "dn AS MATERIALIZED (SELECT dd.day, tt.t, COALESCE(g.c, 0) "
        "AS c FROM dd CROSS JOIN tt "
        "LEFT JOIN g ON g.day = dd.day AND g.t = tt.t)"
    )
    parts = [base]
    elim: list[int] = []
    for r in range(1, 5):
        excl = (
            " WHERE t NOT IN ("
            + ", ".join(f"(SELECT t FROM e{i})" for i in elim)
            + ")"
            if elim
            else ""
        )
        parts.append(
            f", fp{r} AS (SELECT day, t FROM (SELECT day, t, "
            f"ROW_NUMBER() OVER (PARTITION BY day "
            f"ORDER BY c DESC, t) AS rn FROM dn{excl}) WHERE rn = 1)"
        )
        active_excl = (
            " WHERE tt.t NOT IN ("
            + ", ".join(f"(SELECT t FROM e{i})" for i in elim)
            + ")"
            if elim
            else ""
        )
        parts.append(
            f", tl{r} AS (SELECT tt.t, CAST(COALESCE(x.n, 0) "
            f"AS BIGINT) AS n FROM tt LEFT JOIN (SELECT t, COUNT(*) "
            f"AS n FROM fp{r} GROUP BY t) x USING (t){active_excl})"
        )
        parts.append(
            f", e{r} AS MATERIALIZED (SELECT t, n FROM tl{r} "
            f"ORDER BY n, t LIMIT 1)"
        )
        elim.append(r)
    parts.append(
        ", fp5 AS (SELECT day, t FROM (SELECT day, t, "
        "ROW_NUMBER() OVER (PARTITION BY day ORDER BY c DESC, t) "
        "AS rn FROM dn WHERE t NOT IN ("
        + ", ".join(f"(SELECT t FROM e{i})" for i in elim)
        + ")) WHERE rn = 1), "
        "w5 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM fp5 GROUP BY t)"
    )
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, (SELECT t FROM e{r}) AS event_type, "
        f"(SELECT n FROM e{r}) AS tally, 0 AS is_winner"
        for r in range(1, 5)
    )
    return (
        "".join(parts)
        + " SELECT CAST(round AS BIGINT) AS round, event_type, "
        "tally, CAST(is_winner AS BIGINT) AS is_winner FROM ("
        + sel
        + " UNION ALL SELECT 5, (SELECT t FROM w5), "
        "(SELECT n FROM w5), 1)"
    )


def _q_price_indices(sf_dir: str) -> pa.Table:
    """Laspeyres, Paasche and Fisher price indices between the first
    and second half of the observation window (goods = event types,
    price = mean value cents, quantity = event count): the p*q cross
    terms with mismatched denominators are 1e6-tick quantized per
    type (order-free integer sums); same-period terms are exact
    integers (p*q = cents sum)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "t": batch["event_type"],
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day", "t"],
        [("c", "sum", "s"), ("_one", "sum", "n")],
    )
    days = sorted(set(int(x) for x in agg["day"].to_pylist()))
    mid = days[len(days) // 2]
    per: dict[tuple[int, str], tuple[int, int]] = {}
    for i in range(agg.num_rows):
        d = int(agg["day"][i].as_py())
        t = agg["t"][i].as_py()
        p = 0 if d < mid else 1
        s0, n0 = per.get((p, t), (0, 0))
        per[(p, t)] = (
            s0 + int(agg["s"][i].as_py()),
            n0 + int(agg["n"][i].as_py()),
        )
    l_num = 0  # ticks of sum p1 * q0
    p_den = 0  # ticks of sum p0 * q1
    s0_tot = 0
    s1_tot = 0
    for t in sorted(_MARKOV_STATES):
        s0, n0 = per[(0, t)]
        s1, n1 = per[(1, t)]
        s0_tot += s0
        s1_tot += s1
        l_num += int(
            round_half_away(
                np.array([float(s1) / float(n1) * float(n0) * 1e6])
            )[0]
        )
        p_den += int(
            round_half_away(
                np.array([float(s0) / float(n0) * float(n1) * 1e6])
            )[0]
        )
    lasp = float(l_num) / 1e6 / float(s0_tot)
    paas = float(s1_tot) / (float(p_den) / 1e6)
    fish = np.sqrt(lasp * paas)
    return pa.table(
        {
            "laspeyres": round_like_sql([lasp], 6),
            "paasche": round_like_sql([paas], 6),
            "fisher": round_like_sql([float(fish)], 6),
        }
    )


_DFA_SCALES = (4, 8, 16)


def _q_dfa_alpha(sf_dir: str) -> pa.Table:
    """Detrended fluctuation analysis of the daily revenue series:
    the n-scaled integer profile Y_t = n*cumsum(y) - (t+1)*sum(y) is
    exact, per-segment linear-detrend residual SSE comes from exact
    A/B/C moments (one pinned float chain each, 1e3-tick quantized
    before the cross-segment sum), and alpha is the log-log slope
    over the evenly spaced scales 4/8/16: (lf_16 - lf_4)/(2 ln 2)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    sy = sum(ys)
    cum = 0
    prof = []
    for t, y in enumerate(ys):
        cum += y
        prof.append(n * cum - (t + 1) * sy)
    rows = []
    lf = {}
    for s in _DFA_SCALES:
        nseg = n // s
        ticks = 0
        for g in range(nseg):
            seg = prof[g * s : (g + 1) * s]
            m = s
            sx = m * (m - 1) // 2
            sxx = (m - 1) * m * (2 * m - 1) // 6
            syv = sum(seg)
            syy = sum(v * v for v in seg)
            sxy = sum(i * v for i, v in enumerate(seg))
            a = m * syy - syv * syv
            b = m * sxy - sx * syv
            c = m * sxx - sx * sx
            rss = (float(a) - float(b) * float(b) / float(c)) / float(m)
            ticks += int(
                round_half_away(np.array([rss / float(n * n) * 1e3]))[
                    0
                ]
            )
        f2 = float(ticks) / 1e3 / float(nseg) / float(s)
        logf = 0.5 * np.log(f2)
        lf[s] = float(logf)
        rows.append((s, nseg, ticks, float(logf)))
    alpha = (lf[16] - lf[4]) / (2.0 * np.log(2.0))
    return pa.table(
        {
            "s": pa.array([r[0] for r in rows], pa.int64()),
            "n_segments": pa.array([r[1] for r in rows], pa.int64()),
            "rss_ticks": pa.array([r[2] for r in rows], pa.int64()),
            "log_f": round_like_sql([r[3] for r in rows], 6),
            "alpha": round_like_sql([float(alpha)] * len(rows), 6),
        }
    )


def _q_brier_hour_forecast(sf_dir: str) -> pa.Table:
    """Probabilistic-forecast evaluation with a real train/eval
    split: per-hour Laplace-smoothed purchase rates p_h = (r+1)/(n+2)
    learned on the first half of days score the second half.  Brier
    score with the Murphy reliability/resolution/uncertainty
    decomposition, ECE and log loss -- every per-hour term is a
    pinned float of exact integers, 1e9-tick quantized before the
    order-free cross-hour sum."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(t // 86_400_000_000),
                "h": pa.array((t // 3_600_000_000) % 24),
                "r": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(t), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day", "h"],
        [("r", "sum", "r"), ("_one", "sum", "n")],
    )
    days = sorted(set(int(x) for x in agg["day"].to_pylist()))
    mid = days[len(days) // 2]
    tr = {h: [0, 0] for h in range(24)}
    ev = {h: [0, 0] for h in range(24)}
    for i in range(agg.num_rows):
        d = int(agg["day"][i].as_py())
        h = int(agg["h"][i].as_py())
        tgt = tr if d < mid else ev
        tgt[h][0] += int(agg["r"][i].as_py())
        tgt[h][1] += int(agg["n"][i].as_py())
    o_r = sum(v[0] for v in ev.values())
    o_n = sum(v[1] for v in ev.values())
    pbar = float(o_r) / float(o_n)
    bs_t = rel_t = res_t = ece_t = ll_t = 0
    for h in range(24):
        r, n = tr[h]
        er, en = ev[h]
        if en == 0:
            continue
        p = float(r + 1) / float(n + 2)
        oh = float(er) / float(en)
        bs = (
            float(er) * (1.0 - p) * (1.0 - p)
            + float(en - er) * p * p
        )
        rel = float(en) * (p - oh) * (p - oh)
        res = float(en) * (oh - pbar) * (oh - pbar)
        ece = float(en) * abs(p - oh)
        ll = -(
            float(er) * np.log(p) + float(en - er) * np.log(1.0 - p)
        )
        for acc, v in (
            ("bs", bs), ("rel", rel), ("res", res), ("ece", ece),
            ("ll", ll),
        ):
            t = int(round_half_away(np.array([v * 1e9]))[0])
            if acc == "bs":
                bs_t += t
            elif acc == "rel":
                rel_t += t
            elif acc == "res":
                res_t += t
            elif acc == "ece":
                ece_t += t
            else:
                ll_t += t
    unc = pbar * (1.0 - pbar)
    return pa.table(
        {
            "n_eval": pa.array([o_n], pa.int64()),
            "brier": round_like_sql(
                [float(bs_t) / 1e9 / float(o_n)], 6
            ),
            "reliability": round_like_sql(
                [float(rel_t) / 1e9 / float(o_n)], 6
            ),
            "resolution": round_like_sql(
                [float(res_t) / 1e9 / float(o_n)], 6
            ),
            "uncertainty": round_like_sql([unc], 6),
            "ece": round_like_sql(
                [float(ece_t) / 1e9 / float(o_n)], 6
            ),
            "log_loss": round_like_sql(
                [float(ll_t) / 1e9 / float(o_n)], 6
            ),
        }
    )


def _q_youden_threshold(sf_dir: str) -> pa.Table:
    """Optimal classification threshold by Youden's J over the
    deci-cent value histogram (positives = purchases, predict
    positive iff value >= theta): J's argmax uses the exact integer
    numerator tp*N_neg - fp*N_pos (ties = smallest theta), suffix
    counts come off the bounded histogram -- never a row sort."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "d10": pa.array(scaled_int(batch["value"], 10.0)),
                "pos": pa.array(
                    (et == "purchase").astype(np.int64)
                ),
                "_one": pa.array(np.ones(len(et), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["d10"],
        [("pos", "sum", "p"), ("_one", "sum", "n")],
    ).sort_by([("d10", "descending")])
    d10 = agg["d10"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = agg["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_pos = int(p.sum())
    n_neg = int(n.sum()) - n_pos
    tp = np.cumsum(p)
    fp = np.cumsum(n - p)
    num = tp * n_neg - fp * n_pos
    # argmax, ties by smallest theta (= last index in desc order)
    best = int(num.max())
    idx = int(np.flatnonzero(num == best).max())
    theta = int(d10[idx])
    j = float(best) / (float(n_pos) * float(n_neg))
    return pa.table(
        {
            "theta_d10": pa.array([theta], pa.int64()),
            "tp": pa.array([int(tp[idx])], pa.int64()),
            "fp": pa.array([int(fp[idx])], pa.int64()),
            "j_num": pa.array([best], pa.int64()),
            "youden_j": round_like_sql([j], 6),
        }
    )


def _q_overdispersion_panel(sf_dir: str) -> pa.Table:
    """Count-model diagnostics of the (user, day) activity panel
    (zero-filled over users x dense days): method-of-moments
    negative-binomial fit (r = m^2/(v - m), p = m/v) and van den
    Broek's zero-inflation score z against Poisson(m) -- all moments
    exact integers (T, sum k^2, N = U*D, observed zeros), floats only
    in the closed-form tails (one shared exp)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pa.array(day),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"],
        [("_one", "sum", "k")],
    )
    days = [int(x) for x in agg["day"].to_pylist()]
    users = set(int(x) for x in agg["user_id"].to_pylist())
    d_lo, d_hi = min(days), max(days)
    n_days = d_hi - d_lo + 1
    n_cells = len(users) * n_days
    ks = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = int(ks.sum())
    s2 = int((ks * ks).sum())
    n_nonzero = len(ks)
    n0 = n_cells - n_nonzero
    m = float(t) / float(n_cells)
    v = float(s2) / float(n_cells) - m * m
    nb_r = m * m / (v - m)
    nb_p = m / v
    p0 = np.exp(-m)
    z = (float(n0) - float(n_cells) * p0) / np.sqrt(
        float(n_cells) * p0 * (1.0 - p0)
        - float(n_cells) * m * p0 * p0
    )
    return pa.table(
        {
            "n_cells": pa.array([n_cells], pa.int64()),
            "n_zero": pa.array([n0], pa.int64()),
            "mean": round_like_sql([m], 6),
            "variance": round_like_sql([v], 6),
            "nb_r": round_like_sql([nb_r], 6),
            "nb_p": round_like_sql([nb_p], 6),
            "zip_z": round_like_sql([float(z)], 6),
        }
    )


def _q_taylors_law(sf_dir: str) -> pa.Table:
    """Taylor's power law (variance ~ a * mean^b) across the top-50
    users' daily count series: per-user mean and population variance
    from exact integer day sums, both logged and 1e9-tick quantized,
    slope b from the exact integer tick regression (one float
    division)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "cell": batch["user_id"],
                "day": pa.array(day),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell", "day"],
        [("_one", "sum", "k")],
    )
    days = [int(x) for x in agg["day"].to_pylist()]
    d = max(days) - min(days) + 1
    per: dict[int, tuple[int, int]] = {}
    for i in range(agg.num_rows):
        c = int(agg["cell"][i].as_py())
        k = int(agg["k"][i].as_py())
        s, q = per.get(c, (0, 0))
        per[c] = (s + k, q + k * k)
    top = sorted(per.items(), key=lambda t: (-t[1][0], t[0]))[:50]
    xs, ys = [], []
    for c, (s, q) in top:
        # mean = s/d ; population variance = (d*q - s^2)/d^2
        vn = d * q - s * s
        if s <= 0 or vn <= 0:
            continue
        lx = np.log(float(s) / float(d))
        ly = np.log(float(vn) / (float(d) * float(d)))
        xs.append(int(round_half_away(np.array([lx * 1e9]))[0]))
        ys.append(int(round_half_away(np.array([ly * 1e9]))[0]))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b_num = n * sxy - sx * sy
    b_den = n * sxx - sx * sx
    b = float(b_num) / float(b_den)
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "slope_b": round_like_sql([b], 6),
        }
    )


_ALLAN_TAUS = (1, 2, 4)


def _q_allan_variance(sf_dir: str) -> pa.Table:
    """Allan variance of the daily event-count series at tau = 1, 2,
    4 days (the clock-stability statistic; non-overlapping bins):
    sigma^2(tau) = sum (B_{i+1} - B_i)^2 / (2 (M-1) tau^2) with bin
    SUMS B_i -- the numerator is an exact integer, one float division
    per tau."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs = _daily_count_series(sf_dir)
    rows = []
    for tau in _ALLAN_TAUS:
        m = len(xs) // tau
        bins = [
            sum(xs[i * tau : (i + 1) * tau]) for i in range(m)
        ]
        num = sum(
            (bins[i + 1] - bins[i]) ** 2 for i in range(m - 1)
        )
        av = float(num) / (
            2.0 * float(m - 1) * float(tau) * float(tau)
        )
        rows.append((tau, m, num, av))
    return pa.table(
        {
            "tau": pa.array([r[0] for r in rows], pa.int64()),
            "n_bins": pa.array([r[1] for r in rows], pa.int64()),
            "diff2_sum": pa.array([r[2] for r in rows], pa.int64()),
            "allan_var": round_like_sql([r[3] for r in rows], 6),
        }
    )


_MATTR_W = 50
_MATTR_STRIDE = 25


def _q_mattr(sf_dir: str) -> pa.Table:
    """Moving-average type-token ratio per language (the standard
    length-independent lexical-diversity measure; window 50, stride
    25): a token is NEW in window [s, s+50) iff its previous
    occurrence in the document is before s, so every window's
    distinct count is a windowed integer sum of LAG indicators -- no
    per-window sets anywhere.  MATTR = sum(distinct) / (50 *
    n_windows), one float division per language."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    w, st = _MATTR_W, _MATTR_STRIDE

    def prep(batch: pa.Table) -> pa.Table:
        langs, news, wins = [], [], []
        for i in range(batch.num_rows):
            toks = [t for t in batch["text"][i].as_py().split(" ") if t]
            lang = batch["lang"][i].as_py()
            n = len(toks)
            n_win = (n - w) // st + 1 if n >= w else 0
            prev: dict[str, int] = {}
            new_sum = 0
            pv = np.empty(n, np.int64)
            for j, t in enumerate(toks):
                pv[j] = prev.get(t, -1)
                prev[t] = j
            for j in range(n):
                for k in (j // st, j // st - 1):
                    if (
                        k >= 0
                        and k < n_win
                        and st * k <= j < st * k + w
                        and pv[j] < st * k
                    ):
                        new_sum += 1
            langs.append(lang)
            news.append(new_sum)
            wins.append(n_win)
        return pa.table(
            {
                "lang": pa.array(langs),
                "nd": pa.array(news, pa.int64()),
                "nw": pa.array(wins, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["lang"],
        [("nd", "sum", "nd"), ("nw", "sum", "nw")],
    ).sort_by("lang")
    nd = agg["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
    nw = agg["nw"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "lang": agg["lang"],
            "n_windows": pa.array(nw, pa.int64()),
            "sum_distinct": pa.array(nd, pa.int64()),
            "mattr": round_like_sql(
                nd.astype(np.float64) / (float(w) * nw.astype(np.float64)),
                6,
            ),
        }
    )


def _mattr_oracle_sql() -> str:
    """Mirror of _q_mattr: LAG previous-occurrence indicators summed
    over the two windows containing each position."""
    w, st = _MATTR_W, _MATTR_STRIDE
    return (
        "WITH d AS (SELECT doc_id, lang, "
        "list_filter(string_split(text, ' '), t -> t <> '') AS ws "
        "FROM documents), "
        "tp AS (SELECT doc_id, lang, len(ws) AS n, unnest(ws) AS t, "
        "generate_subscripts(ws, 1) - 1 AS i FROM d), "
        "pv AS (SELECT doc_id, lang, n, t, i, "
        "COALESCE(LAG(i) OVER (PARTITION BY doc_id, t ORDER BY i), "
        "-1) AS prev FROM tp), "
        "ks AS (SELECT * FROM (VALUES (0), (1)) AS v(o)), "
        f"wins AS (SELECT pv.lang, pv.i // {st} - ks.o AS k, pv.n, "
        "pv.i, pv.prev FROM pv, ks), "
        f"ok AS (SELECT lang, CASE WHEN prev < {st} * k THEN 1 "
        "ELSE 0 END AS nd FROM wins WHERE k >= 0 "
        f"AND k <= (n - {w}) // {st} AND n >= {w} "
        f"AND i >= {st} * k AND i < {st} * k + {w}), "
        "agg AS (SELECT lang, CAST(SUM(nd) AS BIGINT) AS nd "
        "FROM ok GROUP BY lang), "
        f"nwn AS (SELECT lang, CAST(SUM(CASE WHEN n >= {w} THEN "
        f"(n - {w}) // {st} + 1 ELSE 0 END) AS BIGINT) AS nw "
        "FROM (SELECT DISTINCT doc_id, lang, n FROM tp) "
        "GROUP BY lang) "
        "SELECT agg.lang, nwn.nw AS n_windows, "
        "agg.nd AS sum_distinct, "
        "ROUND(CAST(agg.nd AS DOUBLE) "
        f"/ ({w}.0 * CAST(nwn.nw AS DOUBLE)), 6) AS mattr "
        "FROM agg JOIN nwn USING (lang) ORDER BY agg.lang"
    )


def _q_rmst(sf_dir: str) -> pa.Table:
    """Restricted mean survival time (area under the Kaplan-Meier
    curve up to the last event time) for time-to-first-error: each
    rectangle S(t_{i-1}) * (t_i - t_{i-1}) is quantized at 1
    microsecond (integer tick sum -- order-free), one division to
    days.  Composes the existing KM operator."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        kaplan_meier, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    km = kaplan_meier(ds, event_type="error")
    t = km["t_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = km["survival"].to_numpy(zero_copy_only=False)
    ticks = 0
    prev_t = 0
    prev_s = 1.0
    for i in range(len(t)):
        ticks += int(
            round_half_away(
                np.array([prev_s * float(t[i] - prev_t)])
            )[0]
        )
        prev_t, prev_s = int(t[i]), float(s[i])
    rmst_days = float(ticks) / 86_400_000_000.0
    return pa.table(
        {
            "tau_us": pa.array([int(t[-1])], pa.int64()),
            "rmst_ticks": pa.array([ticks], pa.int64()),
            "rmst_days": round_like_sql([rmst_days], 6),
        }
    )


def _q_competing_risks(sf_dir: str) -> pa.Table:
    """Aalen-Johansen cumulative incidence of first PURCHASE with
    first ERROR as the competing risk (censoring at last activity):
    overall survival uses the KM LN-prefix discipline over combined
    event times, CIF_purchase(t) = running sum of S(t-) * d_p/n --
    both cumulations are ordered window sums, identical in SQL.
    Rows at purchase event times."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    big = np.int64(2**62)

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "t0": pa.array(ts),
                "tlast": pa.array(ts),
                "tp": pa.array(np.where(et == "purchase", ts, big)),
                "te": pa.array(np.where(et == "error", ts, big)),
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("t0", "min", "t0"), ("tlast", "max", "tlast"),
         ("tp", "min", "tp"), ("te", "min", "te")],
    )
    t0 = peru["t0"].to_numpy(zero_copy_only=False)
    tlast = peru["tlast"].to_numpy(zero_copy_only=False)
    tp = peru["tp"].to_numpy(zero_copy_only=False)
    te = peru["te"].to_numpy(zero_copy_only=False)
    tev = np.minimum(tp, te)
    observed = tev < big
    cause_p = observed & (tp <= te)
    dur = np.where(observed, tev - t0, tlast - t0)
    dsort = np.sort(dur)
    ev_times = np.unique(dur[observed])
    n_i = len(dur) - np.searchsorted(dsort, ev_times, side="left")
    d_all = np.searchsorted(
        np.sort(dur[observed]), ev_times, side="right"
    ) - np.searchsorted(np.sort(dur[observed]), ev_times, side="left")
    dp_sorted = np.sort(dur[cause_p])
    d_p = np.searchsorted(dp_sorted, ev_times, side="right") - (
        np.searchsorted(dp_sorted, ev_times, side="left")
    )
    ratio = (n_i.astype(np.float64) - d_all.astype(np.float64)) / (
        n_i.astype(np.float64)
    )
    zero = ratio == 0.0
    terms = np.log(np.where(zero, 1.0, ratio))
    dead = np.cumsum(zero.astype(np.int64)) > 0
    surv = np.where(dead, 0.0, np.exp(np.cumsum(terms)))
    s_prev = np.concatenate(([1.0], surv[:-1]))
    cif_terms = s_prev * d_p.astype(np.float64) / n_i.astype(
        np.float64
    )
    cif = np.cumsum(cif_terms)
    keep = d_p > 0
    return pa.table(
        {
            "t_us": pa.array(ev_times[keep].astype(np.int64)),
            "n_at_risk": pa.array(n_i[keep].astype(np.int64)),
            "d_purchase": pa.array(d_p[keep].astype(np.int64)),
            "cif": round_like_sql(cif[keep], 6),
        }
    )


def _competing_risks_oracle_sql() -> str:
    """Mirror of _q_competing_risks: the KM LN-prefix form plus an
    ordered running CIF sum."""
    return (
        "WITH peru AS (SELECT user_id, MIN(epoch_us(ts)) AS t0, "
        "MAX(epoch_us(ts)) AS tlast, "
        "MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) "
        "AS tp, "
        "MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) "
        "AS te FROM events GROUP BY user_id), "
        "dur AS (SELECT CASE WHEN tp IS NOT NULL OR te IS NOT NULL "
        "THEN LEAST(COALESCE(tp, tlast + 1), COALESCE(te, tlast + 1)) "
        "- t0 ELSE tlast - t0 END AS d, "
        "CASE WHEN tp IS NOT NULL OR te IS NOT NULL THEN 1 ELSE 0 "
        "END AS obs, "
        "CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) "
        "THEN 1 ELSE 0 END AS isp FROM peru), "
        "ev AS (SELECT d AS t, CAST(COUNT(*) AS BIGINT) AS di, "
        "CAST(SUM(isp) AS BIGINT) AS dp FROM dur WHERE obs = 1 "
        "GROUP BY d), "
        "risk AS (SELECT ev.t, ev.di, ev.dp, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM dur "
        "WHERE dur.d >= ev.t) AS ni FROM ev), "
        "r2 AS (SELECT t, di, dp, ni, "
        "(CAST(ni AS DOUBLE) - CAST(di AS DOUBLE)) "
        "/ CAST(ni AS DOUBLE) AS ratio FROM risk), "
        "s AS (SELECT t, dp, ni, "
        "CASE WHEN SUM(CASE WHEN ratio = 0.0 THEN 1 ELSE 0 END) "
        "OVER (ORDER BY t) > 0 THEN 0.0 ELSE "
        "EXP(SUM(LN(CASE WHEN ratio = 0.0 THEN 1.0 ELSE ratio END)) "
        "OVER (ORDER BY t)) END AS surv FROM r2), "
        "sp AS (SELECT t, dp, ni, "
        "COALESCE(LAG(surv) OVER (ORDER BY t), 1.0) AS s_prev "
        "FROM s), "
        "c AS (SELECT t, dp, ni, SUM(s_prev * CAST(dp AS DOUBLE) "
        "/ CAST(ni AS DOUBLE)) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS cif FROM sp) "
        "SELECT t AS t_us, ni AS n_at_risk, dp AS d_purchase, "
        "ROUND(cif, 6) AS cif FROM c WHERE dp > 0"
    )


def _q_ks_uniform(sf_dir: str) -> pa.Table:
    """One-sample Kolmogorov-Smirnov distance of the fractional
    cents u = (c mod 10^4)/10^4 from Uniform(0,1): D's argmax uses
    the exact integer numerators |cum * 10^4 - n * k| and
    |cum_prev * 10^4 - n * k| over the value count table -- no float
    in any comparison, one division at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "k": pa.array(c % 10_000),
                "_one": pa.array(np.ones(len(c), np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("_one", "sum", "m")],
    ).sort_by("k")
    ks = counts["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    ms = counts["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(ms.sum())
    cum = np.cumsum(ms)
    prev = cum - ms
    num = np.maximum(
        np.abs(cum * 10_000 - n * ks), np.abs(prev * 10_000 - n * ks)
    )
    d_num = int(num.max())
    d = float(d_num) / (float(n) * 10_000.0)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
            "ks_d": round_like_sql([d], 6),
            "ks_stat": round_like_sql(
                [d * np.sqrt(float(n))], 6
            ),
        }
    )


def _q_ad_uniform(sf_dir: str) -> pa.Table:
    """One-sample Anderson-Darling statistic of the fractional cents
    against Uniform(0,1): A^2 = -n - (1/n) sum (2i-1)(ln u_(i) +
    ln(1 - u_(n+1-i))).  Per distinct value the (2i-1) run sum is
    the exact closed form (b^2 - (a-1)^2), each multiplied by a
    1e9-tick quantized log pair -- order-free integer accumulation,
    two divisions at the end.  Zero/one u values are clamped to
    half-ulp ticks (documented)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "k": pa.array(c % 10_000),
                "_one": pa.array(np.ones(len(c), np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("_one", "sum", "m")],
    ).sort_by("k")
    kk = counts["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    mm = counts["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(mm.sum())
    cum = np.cumsum(mm)
    prev = cum - mm
    total = 0
    for k, a0, b0 in zip(kk.tolist(), (prev + 1).tolist(), cum.tolist()):
        run = b0 * b0 - (a0 - 1) * (a0 - 1)  # sum of (2i-1) over run
        u = max(float(k), 0.5) / 10_000.0
        u1 = max(float(10_000 - k), 0.5) / 10_000.0
        lt = int(
            round_half_away(np.array([np.log(u) * 1e9]))[0]
        )
        # the (n+1-i) reversal pairs run [a,b] of u with the SAME
        # positions of 1-u in the reversed order; accumulate both
        # halves per value
        l1 = int(
            round_half_away(np.array([np.log(u1) * 1e9]))[0]
        )
        total += run * lt
        # reversed positions: i' = n+1-i for i in [a,b] -> the
        # (2i'-1) sum over the mirrored run
        ra, rb = n + 1 - b0, n + 1 - a0
        run_r = rb * rb - (ra - 1) * (ra - 1)
        total += run_r * l1
    a2 = -float(n) - float(total) / 1e9 / float(n)
    # the raw tick total exceeds int64 at sf >= 0.1 -- report only
    # the float statistic (the HUGEINT/Python-int sum stays exact)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "a2": round_like_sql([a2], 6),
        }
    )


def _q_partition_conductance(sf_dir: str) -> pa.Table:
    """Conductance phi(S) = cut(S) / min(vol(S), vol(rest)) of each
    Voronoi cluster of the top-100 cells over the Chebyshev <= 8
    proximity graph -- the partition-quality metric behind balanced
    graph cuts.  Cut and volume counts are exact integers; one float
    division per cluster."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    verts, lab = _voronoi_top100(sf_dir)
    n = len(verts)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            if (
                max(
                    abs(verts[i][1] - verts[j][1]),
                    abs(verts[i][2] - verts[j][2]),
                )
                <= 8
            ):
                edges.append((i, j))
    deg = [0] * n
    for i, j in edges:
        deg[i] += 1
        deg[j] += 1
    vol_tot = sum(deg)
    k = len(_ASSIGN_PROBES)
    rows = []
    for li in range(k):
        members = [i for i in range(n) if lab[i] == li]
        if not members:
            continue
        mset = set(members)
        cut = sum(
            1 for i, j in edges if (i in mset) != (j in mset)
        )
        vol = sum(deg[i] for i in members)
        den = min(vol, vol_tot - vol)
        phi = float(cut) / float(den) if den > 0 else np.nan
        rows.append((li, len(members), cut, vol, phi))
    return pa.table(
        {
            "site": pa.array([r[0] for r in rows], pa.int64()),
            "n_members": pa.array([r[1] for r in rows], pa.int64()),
            "cut": pa.array([r[2] for r in rows], pa.int64()),
            "volume": pa.array([r[3] for r in rows], pa.int64()),
            "conductance": round_like_sql(
                [r[4] for r in rows], 6
            ),
        }
    )


def _q_global_transitivity(sf_dir: str) -> pa.Table:
    """Global transitivity (3 x triangles / connected triples) of the
    edit-1 word graph: triangles by the ordered-triple join, triples
    = sum deg(deg-1)/2 -- both exact integers, one float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    vocab = sorted(
        set(pairs["w1"].to_pylist()) | set(pairs["w2"].to_pylist())
    )
    wid = {w: i for i, w in enumerate(vocab)}
    nv = len(vocab)
    adj = [set() for _ in range(nv)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = wid[w1], wid[w2]
        adj[a].add(b)
        adj[b].add(a)
    tri = 0
    for a in range(nv):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[b]:
                if c > b and c in adj[a]:
                    tri += 1
    triples = sum(len(s) * (len(s) - 1) // 2 for s in adj)
    t = 3.0 * float(tri) / float(triples) if triples else np.nan
    return pa.table(
        {
            "n_nodes": pa.array([nv], pa.int64()),
            "n_triangles": pa.array([tri], pa.int64()),
            "n_triples": pa.array([triples], pa.int64()),
            "transitivity": round_like_sql([t], 6),
        }
    )


def _q_neighbor_degree_profile(sf_dir: str) -> pa.Table:
    """Average neighbor degree per degree class k_nn(k) of the edit-1
    word graph (the assortativity profile behind the single Newman
    r): exact integer numerators (sum over degree-k nodes of their
    neighbors' degrees), one float division per class."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    vocab = sorted(
        set(pairs["w1"].to_pylist()) | set(pairs["w2"].to_pylist())
    )
    wid = {w: i for i, w in enumerate(vocab)}
    nv = len(vocab)
    adj = [set() for _ in range(nv)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = wid[w1], wid[w2]
        adj[a].add(b)
        adj[b].add(a)
    per_k: dict[int, tuple[int, int]] = {}
    for v in range(nv):
        k = len(adj[v])
        if k == 0:
            continue
        s = sum(len(adj[u]) for u in adj[v])
        cnt, tot = per_k.get(k, (0, 0))
        per_k[k] = (cnt + k, tot + s)  # cnt = sum of k (denominator)
    rows = sorted(per_k.items())
    return pa.table(
        {
            "degree": pa.array([k for k, _ in rows], pa.int64()),
            "nbr_deg_sum": pa.array(
                [v[1] for _, v in rows], pa.int64()
            ),
            "knn_k": round_like_sql(
                [float(v[1]) / float(v[0]) for _, v in rows], 6
            ),
        }
    )


def _q_randic_index(sf_dir: str) -> pa.Table:
    """Randic connectivity index R = sum over edges of
    1/sqrt(d_u d_v) and the sum-connectivity variant
    1/sqrt(d_u + d_v) of the edit-1 word graph -- per-edge terms
    1e9-tick quantized (order-free), exact integer degrees."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    vocab = sorted(
        set(pairs["w1"].to_pylist()) | set(pairs["w2"].to_pylist())
    )
    wid = {w: i for i, w in enumerate(vocab)}
    deg = [0] * len(vocab)
    el = []
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = wid[w1], wid[w2]
        deg[a] += 1
        deg[b] += 1
        el.append((a, b))
    r_t = 0
    s_t = 0
    for a, b in el:
        r_t += int(
            round_half_away(
                np.array([1.0 / np.sqrt(float(deg[a] * deg[b])) * 1e9])
            )[0]
        )
        s_t += int(
            round_half_away(
                np.array([1.0 / np.sqrt(float(deg[a] + deg[b])) * 1e9])
            )[0]
        )
    return pa.table(
        {
            "n_edges": pa.array([len(el)], pa.int64()),
            "randic": round_like_sql([float(r_t) / 1e9], 6),
            "sum_connectivity": round_like_sql(
                [float(s_t) / 1e9], 6
            ),
        }
    )


def _q_forecast_error_panel(sf_dir: str) -> pa.Table:
    """Forecast-accuracy panel for the naive-1 forecast of daily
    revenue cents: MAE and RMSE from exact integer error sums, MAPE
    and sMAPE from 1e9-tick per-day rationals, pinball loss at
    q = 9/10 held exactly as integer tenths (max(9e, -e)/10), and
    Theil's U2 -- one row, every float chain pinned."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys) - 1
    abs_sum = sq_sum = pin10 = 0
    mape_t = smape_t = 0
    denom_sq = 0
    for t in range(1, len(ys)):
        e = ys[t] - ys[t - 1]
        abs_sum += abs(e)
        sq_sum += e * e
        pin10 += max(9 * e, -e)
        denom_sq += ys[t - 1] * ys[t - 1]
        if ys[t] > 0:
            mape_t += int(
                round_half_away(
                    np.array([abs(e) / float(ys[t]) * 1e9])
                )[0]
            )
        if ys[t] + ys[t - 1] > 0:
            smape_t += int(
                round_half_away(
                    np.array(
                        [
                            2.0
                            * abs(e)
                            / float(ys[t] + ys[t - 1])
                            * 1e9
                        ]
                    )
                )[0]
            )
    mae = float(abs_sum) / float(n)
    rmse = np.sqrt(float(sq_sum) / float(n))
    mape = float(mape_t) / 1e9 / float(n)
    smape = float(smape_t) / 1e9 / float(n)
    pinball = float(pin10) / 10.0 / float(n)
    u2 = np.sqrt(float(sq_sum) / float(denom_sq))
    return pa.table(
        {
            "n_forecasts": pa.array([n], pa.int64()),
            "mae": round_like_sql([mae], 6),
            "rmse": round_like_sql([float(rmse)], 6),
            "mape": round_like_sql([mape], 6),
            "smape": round_like_sql([smape], 6),
            "pinball_q90": round_like_sql([pinball], 6),
            "theil_u2": round_like_sql([float(u2)], 6),
        }
    )


def _q_winkler_interval(sf_dir: str) -> pa.Table:
    """Winkler interval score for the static 80% interval [q10, q90]
    of the first-half daily revenues evaluated on the second half:
    width + (2/alpha) x exceedance with alpha = 1/5, so every per-day
    score is an exact integer (cents x 1; penalties are 10x integer
    distances) -- coverage and mean score from integer sums."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    mid = len(ys) // 2
    train = sorted(ys[:mid])
    m = len(train)
    lo = train[max(0, -(-m // 10) - 1)]  # ceil(0.1*m)-th order stat
    hi = train[max(0, -(-(9 * m) // 10) - 1)]
    width = hi - lo
    total10 = 0
    n_cover = 0
    n_eval = len(ys) - mid
    for y in ys[mid:]:
        s10 = 10 * width
        if y < lo:
            s10 += 100 * (lo - y)
        elif y > hi:
            s10 += 100 * (y - hi)
        else:
            n_cover += 1
        total10 += s10
    return pa.table(
        {
            "q10_c": pa.array([lo], pa.int64()),
            "q90_c": pa.array([hi], pa.int64()),
            "n_eval": pa.array([n_eval], pa.int64()),
            "n_covered": pa.array([n_cover], pa.int64()),
            "mean_score": round_like_sql(
                [float(total10) / 10.0 / float(n_eval)], 6
            ),
        }
    )


def _q_multi_otsu(sf_dir: str) -> pa.Table:
    """Three-class (two-threshold) Otsu segmentation of the oracle
    raster's deci-value histogram: exhaustive search over ordered
    threshold pairs maximizing the between-class criterion
    V = s1^2/n1 + s2^2/n2 + s3^2/n3 (the mean^2 term is constant) --
    prefix sums are exact integers, V is one pinned float chain per
    candidate, ties by (t1, t2)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    pts = _og_points_ds(valid_only=True)

    def decis(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.array(scaled_int(batch["z"], 10.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        pts.map_batches(decis, batch_format="pyarrow", batch_size=None),
        ["v"],
        [("_one", "sum", "n")],
    ).sort_by("v")
    vals = agg["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = np.cumsum(cnt)
    cs = np.cumsum(vals * cnt)
    n_tot, s_tot = int(cn[-1]), int(cs[-1])
    k = len(vals)
    best = None
    for i in range(k - 2):  # class 1 = values <= vals[i]
        n1, s1 = int(cn[i]), int(cs[i])
        for j in range(i + 1, k - 1):
            n2 = int(cn[j]) - n1
            s2 = int(cs[j]) - s1
            n3 = n_tot - n1 - n2
            s3 = s_tot - s1 - s2
            v = (
                float(s1) * float(s1) / float(n1)
                + float(s2) * float(s2) / float(n2)
                + float(s3) * float(s3) / float(n3)
            )
            key = (-v, int(vals[i]), int(vals[j]))
            if best is None or key < best:
                best = key
    return pa.table(
        {
            "t1_deci": pa.array([best[1]], pa.int64()),
            "t2_deci": pa.array([best[2]], pa.int64()),
            "criterion": round_like_sql([-best[0]], 6),
        }
    )


def _q_hu_moments(sf_dir: str) -> pa.Table:
    """Hu's seven rotation-invariant moments of each base image in
    the REAL-PNG fixture (decoded by the from-scratch codec): raw
    moments are exact integers, normalized central moments and the
    Hu combinations are pinned float chains per image -- the SQL
    oracle recomputes everything from the closed-form pixel rule,
    validating decode + moment pipeline end-to-end.  eta-scaled,
    first three invariants reported."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
        decode_media,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        gen_media_grid,
    )

    media = ray.data.from_arrow(gen_media_grid(n=8, size=32, n_base=16))

    def moments(batch: pa.Table) -> pa.Table:
        ids, h1s, h2s, h3s = [], [], [], []
        for i in range(batch.num_rows):
            arr = decode_media(
                batch["payload"][i].as_py(),
                batch["media_type"][i].as_py(),
            )
            g = arr[:, :, 0].astype(np.int64)
            r = np.arange(32, dtype=np.int64)[:, None]
            c = np.arange(32, dtype=np.int64)[None, :]
            m00 = int(g.sum())
            m10 = int((r * g).sum())
            m01 = int((c * g).sum())
            m20 = int((r * r * g).sum())
            m02 = int((c * c * g).sum())
            m11 = int((r * c * g).sum())
            # n-scaled central moments (exact integers)
            mu20 = m00 * m20 - m10 * m10
            mu02 = m00 * m02 - m01 * m01
            mu11 = m00 * m11 - m10 * m01
            # eta = mu / m00^2 (order-2), all pinned floats
            den = float(m00) * float(m00) * float(m00)
            e20 = float(mu20) / den
            e02 = float(mu02) / den
            e11 = float(mu11) / den
            h1 = e20 + e02
            h2 = (e20 - e02) * (e20 - e02) + 4.0 * e11 * e11
            h3 = e20 * e02 - e11 * e11  # determinant invariant
            ids.append(batch["media_id"][i].as_py())
            h1s.append(h1)
            h2s.append(h2)
            h3s.append(h3)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "h1": pa.array(h1s, pa.float64()),
                "h2": pa.array(h2s, pa.float64()),
                "h3": pa.array(h3s, pa.float64()),
            }
        )

    out = collect_tables(
        media.map_batches(moments, batch_format="pyarrow", batch_size=None)
    ).sort_by("media_id")
    return pa.table(
        {
            "media_id": out["media_id"],
            "h1": round_like_sql(out["h1"], 6),
            "h2": round_like_sql(out["h2"], 6),
            "h3": round_like_sql(out["h3"], 6),
        }
    )


def _q_radon_projections(sf_dir: str) -> pa.Table:
    """Discrete Radon projections of the event-count grid at the four
    exact lattice angles (0, 45, 90, 135 degrees -- index sums, no
    interpolation): per angle the argmax bin, its mass and the total
    -- all exact integers; the sinogram summary behind tomographic /
    line-detection screens (complements hough_lines)."""
    cnt, _ = _grid_count_cents(sf_dir)
    rows = []
    projs = {
        0: cnt.sum(axis=1),        # over columns -> per row
        90: cnt.sum(axis=0),       # per column
    }
    n = cnt.shape[0]
    p45 = np.zeros(2 * n - 1, np.int64)
    p135 = np.zeros(2 * n - 1, np.int64)
    r = np.arange(n)[:, None]
    c = np.arange(n)[None, :]
    np.add.at(p45, (r + c).ravel(), cnt.ravel())
    np.add.at(p135, (r - c + n - 1).ravel(), cnt.ravel())
    projs[45] = p45
    projs[135] = p135
    for ang in (0, 45, 90, 135):
        p = projs[ang]
        arg = int(p.argmax())  # smallest index on ties
        rows.append((ang, arg, int(p[arg]), int(p.sum())))
    return pa.table(
        {
            "angle": pa.array([r[0] for r in rows], pa.int64()),
            "argmax_bin": pa.array([r[1] for r in rows], pa.int64()),
            "max_mass": pa.array([r[2] for r in rows], pa.int64()),
            "total": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


_GOERTZEL_BINS = (8, 16)


def _q_goertzel_tones(sf_dir: str) -> pa.Table:
    """Goertzel single-bin DFT power at bins k = 8 and 16 over the
    REAL-WAV fixture clips (the tone-detection primitive behind DTMF
    / pilot-tone screens): the s-state float recursion runs in
    identical order on both sides (like the Kalman/EWMA family), so
    parity is structural; decode comes through the from-scratch PCM
    codec."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
        decode_wav,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        gen_wav_grid,
    )

    media = ray.data.from_arrow(gen_wav_grid(n=12, n_samples=256))

    def powers(batch: pa.Table) -> pa.Table:
        ids, ks, ps = [], [], []
        n = 256
        for i in range(batch.num_rows):
            samples, _sr = decode_wav(batch["payload"][i].as_py())
            x = samples[:, 0].astype(np.float64)
            for k in _GOERTZEL_BINS:
                w = 2.0 * np.pi * float(k) / float(n)
                coef = 2.0 * np.cos(w)
                s1 = s2 = 0.0
                for v in x:
                    s0 = v + coef * s1 - s2
                    s2 = s1
                    s1 = s0
                p = s1 * s1 + s2 * s2 - coef * s1 * s2
                ids.append(batch["media_id"][i].as_py())
                ks.append(k)
                ps.append(p)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "k": pa.array(ks, pa.int64()),
                "power": pa.array(ps, pa.float64()),
            }
        )

    out = collect_tables(
        media.map_batches(powers, batch_format="pyarrow", batch_size=None)
    ).sort_by([("media_id", "ascending"), ("k", "ascending")])
    return pa.table(
        {
            "media_id": out["media_id"],
            "k": out["k"],
            "log_power": round_like_sql(
                np.log(
                    np.maximum(
                        out["power"].to_numpy(zero_copy_only=False),
                        1.0,
                    )
                ),
                6,
            ),
        }
    )


def _goertzel_oracle_sql() -> str:
    """Mirror of _q_goertzel_tones: the s-recursion as a recursive
    CTE over the formula samples."""
    return (
        "WITH RECURSIVE px AS (SELECT i.range AS i, t.range AS t, "
        "CAST((t.range * 73 + i.range * 17) % 2001 - 1000 AS DOUBLE) "
        "AS v FROM range(0, 12) i, range(0, 256) t), "
        "kb AS (SELECT * FROM (VALUES (8), (16)) AS vv(k)), "
        "co AS (SELECT k, 2.0 * COS(2.0 * pi() * CAST(k AS DOUBLE) "
        "/ 256.0) AS coef FROM kb), "
        "w AS (SELECT px.i, co.k, co.coef, px.t, "
        "px.v + co.coef * CAST(0 AS DOUBLE) - CAST(0 AS DOUBLE) "
        "AS s1, CAST(0 AS DOUBLE) AS s2 "
        "FROM px, co WHERE px.t = 0 "
        "UNION ALL "
        "SELECT w.i, w.k, w.coef, px.t, "
        "px.v + w.coef * w.s1 - w.s2, w.s1 "
        "FROM w JOIN px ON px.i = w.i AND px.t = w.t + 1), "
        "f AS (SELECT i, k, s1 * s1 + s2 * s2 - coef * s1 * s2 "
        "AS p FROM w WHERE t = 255) "
        "SELECT 'w' || CAST(i AS VARCHAR) AS media_id, "
        "CAST(k AS BIGINT) AS k, "
        "ROUND(LN(GREATEST(p, 1.0)), 6) AS log_power FROM f "
        "ORDER BY media_id, k"
    )


_MONDRIAN_DEPTH = 3


def _q_mondrian_partition(sf_dir: str) -> pa.Table:
    """Mondrian-style k-anonymity partitioning of the (hour-of-day,
    value-cents) quasi-identifier space: 3 median-split levels
    alternating dimensions (exact quantile_disc medians per node,
    left = value <= median), reporting each leaf's population -- the
    greedy multidimensional generalization behind k-anon release
    planning.  All splits are exact integer comparisons."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h": pa.array((ts // 3_600_000_000) % 24),
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "node": pa.array(np.zeros(len(ts), np.int64)),
            }
        )

    cur = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    meds_per_level = []
    for d in range(_MONDRIAN_DEPTH):
        col = "h" if d % 2 == 0 else "c"
        med_tbl = collect_tables(
            grouped_exact_quantiles(cur, "node", col, [0.5])
        )
        vcol = med_tbl.column(med_tbl.num_columns - 1)
        meds = {
            int(med_tbl["node"][i].as_py()): int(vcol[i].as_py())
            for i in range(med_tbl.num_rows)
        }
        meds_per_level.append(meds)

        def split(batch: pa.Table, meds=meds, col=col) -> pa.Table:
            node = batch["node"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            v = batch[col].to_numpy(zero_copy_only=False)
            mv = np.array(
                [meds[int(x)] for x in node], np.int64
            )
            return pa.table(
                {
                    "h": batch["h"],
                    "c": batch["c"],
                    "node": pa.array(
                        node * 2 + (v > mv).astype(np.int64)
                    ),
                }
            )

        cur = cur.map_batches(
            split, batch_format="pyarrow", batch_size=None
        )

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        cur.map_batches(ones, batch_format="pyarrow", batch_size=None),
        ["node"],
        [("_one", "sum", "n")],
    ).sort_by("node")
    return pa.table(
        {
            "leaf": agg["node"],
            "n": agg["n"].cast(pa.int64()),
        }
    )


def _mondrian_oracle_sql() -> str:
    """Mirror of _q_mondrian_partition: 3 unrolled median-split
    levels with quantile_disc per node."""
    parts = [
        "WITH p0 AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
        "CAST(0 AS BIGINT) AS node FROM events)"
    ]
    for d in range(_MONDRIAN_DEPTH):
        col = "h" if d % 2 == 0 else "c"
        parts.append(
            f", m{d} AS (SELECT node, quantile_disc({col}, 0.5) "
            f"AS med FROM p{d} GROUP BY node)"
        )
        parts.append(
            f", p{d + 1} AS (SELECT p.h, p.c, p.node * 2 + "
            f"CASE WHEN p.{col} > m.med THEN 1 ELSE 0 END AS node "
            f"FROM p{d} p JOIN m{d} m ON m.node = p.node)"
        )
    parts.append(
        f" SELECT node AS leaf, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM p{_MONDRIAN_DEPTH} GROUP BY node ORDER BY node"
    )
    return "".join(parts)


def _q_diff_in_diff(sf_dir: str) -> pa.Table:
    """Difference-in-differences estimate of the mix32 A/B arm's
    effect on mean value cents across the mid-point period split:
    DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre), all four
    cell means exact rationals (one float chain), plus the
    interaction-SE-free per-cell sums for audit -- the canonical
    quasi-experimental panel estimator."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "arm": pa.array(mix32(uid, 61) % 2),
                "day": pa.array(day),
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(len(uid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["arm", "day"],
        [("c", "sum", "s"), ("_one", "sum", "n")],
    )
    days = sorted(set(int(x) for x in agg["day"].to_pylist()))
    mid = days[len(days) // 2]
    cell = {(a, p): [0, 0] for a in (0, 1) for p in (0, 1)}
    for i in range(agg.num_rows):
        a = int(agg["arm"][i].as_py())
        p = 0 if int(agg["day"][i].as_py()) < mid else 1
        cell[(a, p)][0] += int(agg["s"][i].as_py())
        cell[(a, p)][1] += int(agg["n"][i].as_py())
    mu = {
        k: float(v[0]) / float(v[1]) for k, v in cell.items()
    }
    did = (mu[(1, 1)] - mu[(1, 0)]) - (mu[(0, 1)] - mu[(0, 0)])
    return pa.table(
        {
            "mu_ctrl_pre": round_like_sql([mu[(0, 0)]], 6),
            "mu_ctrl_post": round_like_sql([mu[(0, 1)]], 6),
            "mu_treat_pre": round_like_sql([mu[(1, 0)]], 6),
            "mu_treat_post": round_like_sql([mu[(1, 1)]], 6),
            "did_cents": round_like_sql([did], 6),
        }
    )


def _q_cuped_adjustment(sf_dir: str) -> pa.Table:
    """CUPED variance reduction for the per-user post-period mean
    (pre-period value sums as the covariate): theta =
    Cov(pre, post)/Var(pre) from n-scaled exact integer moments, and
    the variance-reduction factor 1 - rho^2 as one pinned float chain
    -- the industry-standard experiment sensitivity booster."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pa.array(day),
                "c": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    pd_ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    agg = hash_aggregate(
        pd_ds, ["user_id", "day"], [("c", "sum", "s")]
    )
    days = sorted(set(int(x) for x in agg["day"].to_pylist()))
    mid = days[len(days) // 2]
    per: dict[int, list[int]] = {}
    for i in range(agg.num_rows):
        u = int(agg["user_id"][i].as_py())
        p = 0 if int(agg["day"][i].as_py()) < mid else 1
        per.setdefault(u, [0, 0])[p] += int(agg["s"][i].as_py())
    n = len(per)
    sx = sum(v[0] for v in per.values())
    sy = sum(v[1] for v in per.values())
    sxx = sum(v[0] * v[0] for v in per.values())
    syy = sum(v[1] * v[1] for v in per.values())
    sxy = sum(v[0] * v[1] for v in per.values())
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cv = n * sxy - sx * sy
    theta = float(cv) / float(vx)
    rho2 = float(cv) * float(cv) / (float(vx) * float(vy))
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "theta": round_like_sql([theta], 6),
            "rho2": round_like_sql([rho2], 6),
            "var_reduction": round_like_sql([1.0 - rho2], 6),
        }
    )


_VGRAM_LAGS = (1, 2, 4)


def _q_cross_variogram(sf_dir: str) -> pa.Table:
    """Cross-variogram between the event-count and revenue-cents
    fields on the 96x96 lattice at lags 1/2/4 (both axes pooled):
    gamma_xy(h) = sum (dx * dy) / (2 N_h) with EXACT integer
    cross-product sums -- the geostatistical co-dependence of the
    two surfaces (companion of bivariate Moran)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt, cen = _grid_count_cents(sf_dir)
    rows = []
    for h in _VGRAM_LAGS:
        s = 0
        npairs = 0
        for (a, b) in (
            (cnt[:, h:] - cnt[:, :-h], cen[:, h:] - cen[:, :-h]),
            (cnt[h:, :] - cnt[:-h, :], cen[h:, :] - cen[:-h, :]),
        ):
            s += int((a.astype(object) * b.astype(object)).sum())
            npairs += a.size
        rows.append(
            (h, npairs, s, float(s) / (2.0 * float(npairs)))
        )
    return pa.table(
        {
            "lag": pa.array([r[0] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "cross_sum": pa.array([r[2] for r in rows], pa.int64()),
            "gamma_xy": round_like_sql([r[3] for r in rows], 6),
        }
    )


def _q_madogram_lags(sf_dir: str) -> pa.Table:
    """Madogram (first-order / robust variogram) of the revenue-cents
    field at lags 1/2/4: gamma_1(h) = sum |dz| / (2 N_h) with exact
    integer absolute-difference sums -- outlier-resistant spatial
    continuity, the |.|^1 member of the variogram family."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _cnt, cen = _grid_count_cents(sf_dir)
    rows = []
    for h in _VGRAM_LAGS:
        s = 0
        npairs = 0
        for d in (
            cen[:, h:] - cen[:, :-h],
            cen[h:, :] - cen[:-h, :],
        ):
            s += int(np.abs(d).sum())
            npairs += d.size
        rows.append(
            (h, npairs, s, float(s) / (2.0 * float(npairs)))
        )
    return pa.table(
        {
            "lag": pa.array([r[0] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "abs_sum": pa.array([r[2] for r in rows], pa.int64()),
            "gamma1": round_like_sql([r[3] for r in rows], 6),
        }
    )


def _q_fellegi_sunter_weights(sf_dir: str) -> pa.Table:
    """Fellegi-Sunter record-linkage agreement weights for two
    comparison fields (lang, n_chars decile) with same-source pairs
    as ground-truth matches: every pair count comes from CLOSED FORMS
    over group sizes (C(c,2) sums -- no pair enumeration anywhere),
    m = P(agree|match), u = P(agree|non-match) are exact rationals,
    and the log2 agreement weight is one pinned float per field."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "dec": pa.array(nc // 200),
                "_one": pa.array(np.ones(len(nc), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source", "lang", "dec"],
        [("_one", "sum", "n")],
    )
    cells: dict[tuple[str, str, int], int] = {}
    for i in range(agg.num_rows):
        cells[
            (
                agg["source"][i].as_py(),
                agg["lang"][i].as_py(),
                int(agg["dec"][i].as_py()),
            )
        ] = int(agg["n"][i].as_py())

    def c2(x: int) -> int:
        return x * (x - 1) // 2

    n_tot = sum(cells.values())
    src_tot: dict[str, int] = {}
    lang_tot: dict[str, int] = {}
    dec_tot: dict[int, int] = {}
    sl: dict[tuple[str, str], int] = {}
    sd: dict[tuple[str, int], int] = {}
    for (s, lg, d), c in cells.items():
        src_tot[s] = src_tot.get(s, 0) + c
        lang_tot[lg] = lang_tot.get(lg, 0) + c
        dec_tot[d] = dec_tot.get(d, 0) + c
        sl[(s, lg)] = sl.get((s, lg), 0) + c
        sd[(s, d)] = sd.get((s, d), 0) + c
    total_pairs = c2(n_tot)
    match_pairs = sum(c2(c) for c in src_tot.values())
    nonmatch_pairs = total_pairs - match_pairs
    rows = []
    for field, ftot, fjoint in (
        ("lang", lang_tot, sl),
        ("len_decile", dec_tot, sd),
    ):
        agree_match = sum(c2(c) for c in fjoint.values())
        agree_all = sum(c2(c) for c in ftot.values())
        agree_non = agree_all - agree_match
        m = float(agree_match) / float(match_pairs)
        u = float(agree_non) / float(nonmatch_pairs)
        w = np.log2(m / u)
        rows.append((field, agree_match, agree_non, m, u, float(w)))
    return pa.table(
        {
            "field": pa.array([r[0] for r in rows]),
            "agree_match": pa.array(
                [r[1] for r in rows], pa.int64()
            ),
            "agree_nonmatch": pa.array(
                [r[2] for r in rows], pa.int64()
            ),
            "m_prob": round_like_sql([r[3] for r in rows], 6),
            "u_prob": round_like_sql([r[4] for r in rows], 6),
            "log2_weight": round_like_sql([r[5] for r in rows], 6),
        }
    )


def _q_blocking_quality(sf_dir: str) -> pa.Table:
    """Blocking-scheme evaluation for record linkage (blocks =
    (lang, n_chars-decile) composite key): reduction ratio
    1 - cand/total and pair completeness (share of true same-source
    pairs landing in the same block) -- all pair counts by C(c,2)
    closed forms over group sizes, two float divisions."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch["lang"].to_pylist()
        return pa.table(
            {
                "source": batch["source"],
                "blk": pa.array(
                    [
                        f"{lg}-{int(d)}"
                        for lg, d in zip(langs, nc // 200)
                    ]
                ),
                "_one": pa.array(np.ones(len(nc), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source", "blk"],
        [("_one", "sum", "n")],
    )

    def c2(x: int) -> int:
        return x * (x - 1) // 2

    src_tot: dict[str, int] = {}
    blk_tot: dict[str, int] = {}
    joint: dict[tuple[str, str], int] = {}
    for i in range(agg.num_rows):
        s = agg["source"][i].as_py()
        b = agg["blk"][i].as_py()
        c = int(agg["n"][i].as_py())
        src_tot[s] = src_tot.get(s, 0) + c
        blk_tot[b] = blk_tot.get(b, 0) + c
        joint[(s, b)] = joint.get((s, b), 0) + c
    n_tot = sum(src_tot.values())
    total_pairs = c2(n_tot)
    cand_pairs = sum(c2(c) for c in blk_tot.values())
    match_pairs = sum(c2(c) for c in src_tot.values())
    match_in_block = sum(c2(c) for c in joint.values())
    rr = 1.0 - float(cand_pairs) / float(total_pairs)
    pc = float(match_in_block) / float(match_pairs)
    return pa.table(
        {
            "n_blocks": pa.array([len(blk_tot)], pa.int64()),
            "cand_pairs": pa.array([cand_pairs], pa.int64()),
            "match_pairs": pa.array([match_pairs], pa.int64()),
            "reduction_ratio": round_like_sql([rr], 6),
            "pair_completeness": round_like_sql([pc], 6),
        }
    )


def _spell_probes(vocab: list[str]) -> list[str]:
    """Deterministic misspellings: the 5 longest vocab words with the
    middle character replaced by 'q' (a letter absent from the slot)."""
    longest = sorted(vocab, key=lambda w: (-len(w), w))[:5]
    out = []
    for w in longest:
        mid = len(w) // 2
        ch = "q" if w[mid] != "q" else "z"
        out.append(w[:mid] + ch + w[mid + 1 :])
    return out


def _q_spell_correct(sf_dir: str) -> pa.Table:
    """Noisy-channel spelling correction: 5 deterministic
    misspellings of vocabulary words, candidates = vocabulary within
    edit distance 1, scored by unigram frequency (the unsmoothed
    channel x LM argmax) -- ties by candidate string.  The vocabulary
    and counts come off the distributed token combiner; candidate
    generation is vocabulary-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        ngram_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    tf = collect_tables(ngram_counts(ds, n=1))
    vocab = tf["gram"].to_pylist()
    cnt = {
        w: int(c) for w, c in zip(vocab, tf["n"].to_pylist())
    }

    def ed1(a: str, b: str) -> bool:
        if abs(len(a) - len(b)) > 1:
            return False
        # classic two-pointer edit-distance-1 check
        if len(a) > len(b):
            a, b = b, a
        i = j = diff = 0
        while i < len(a) and j < len(b):
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                diff += 1
                if diff > 1:
                    return False
                if len(a) == len(b):
                    i += 1
                j += 1
        diff += len(b) - j
        return diff == 1

    probes = _spell_probes(sorted(vocab))
    rows = []
    for p in probes:
        cands = sorted(
            (w for w in vocab if ed1(p, w)),
            key=lambda w: (-cnt[w], w),
        )
        best = cands[0] if cands else None
        rows.append(
            (p, best, cnt.get(best, 0) if best else 0, len(cands))
        )
    return pa.table(
        {
            "probe": pa.array([r[0] for r in rows]),
            "correction": pa.array([r[1] for r in rows]),
            "freq": pa.array([r[2] for r in rows], pa.int64()),
            "n_candidates": pa.array(
                [r[3] for r in rows], pa.int64()
            ),
        }
    )


_TDECAY_HL_US = 6 * 3_600_000_000  # 6-hour half-life


def _q_time_decay_attribution(sf_dir: str) -> pa.Table:
    """Time-decay multi-touch attribution: each purchase distributes
    one unit of credit over the user's preceding click/view/signup
    touches with weight 2^(-dt / 6h); per-touch shares are the exact
    rational w_i / sum w (held as 1e9-tick quantized floats -- the
    2^x chain is identical in SQL), summed per channel."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"].cast(pa.int64()),
                "eid": batch["event_id"],
                "t": batch["event_type"],
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["eid"].to_numpy(zero_copy_only=False)
        tt = np.asarray(group["t"].to_pylist(), object)
        order = np.lexsort((eid, ts))
        ts, tt = ts[order], tt[order]
        credits: dict[str, int] = {}
        ln2 = np.log(2.0)
        for i in range(len(ts)):
            if tt[i] != "purchase":
                continue
            w = []
            for j in range(i):
                if tt[j] in ("click", "view", "signup"):
                    v = np.exp(
                        -float(ts[i] - ts[j])
                        / float(_TDECAY_HL_US)
                        * ln2
                    )
                    # quantize BEFORE summing: integer weights make
                    # the normalization order-free (SQL SUM order)
                    w.append(
                        (
                            tt[j],
                            int(
                                round_half_away(
                                    np.array([v * 1e9])
                                )[0]
                            ),
                        )
                    )
            tot = sum(v for _c, v in w)
            if tot == 0:
                continue
            for c, v in w:
                t9 = int(
                    round_half_away(
                        np.array([float(v) / float(tot) * 1e9])
                    )[0]
                )
                credits[c] = credits.get(c, 0) + t9
        rows = sorted(credits.items())
        return pa.table(
            {
                "channel": pa.array(
                    [r[0] for r in rows], pa.string()
                ),
                "t9": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    per_user = grouped_by_key(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id",
        kernel,
    )
    agg = hash_aggregate(per_user, ["channel"], [("t9", "sum", "t9")])
    agg = agg.sort_by("channel")
    t9 = agg["t9"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "channel": agg["channel"],
            "credit": round_like_sql(
                t9.astype(np.float64) / 1e9, 6
            ),
        }
    )


def _q_chaikin_smooth(sf_dir: str) -> pa.Table:
    """Chaikin corner-cutting (2 iterations) of the top user's first
    12 geocoded fixes: each pass replaces every segment with its 1/4
    and 3/4 points, so after two passes all coordinates are EXACT
    multiples of 1/16 -- emitted as integer sixteenths, endpoints
    preserved."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    top_user = _top_users_by_count(sf_dir, 1)[0][0]
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )

    def fixes(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = uid == top_user
        eid = batch["event_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "ts": batch["ts"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )[keep],
                "eid": pa.array(eid),
                "gx": pa.array((eid % 96).astype(np.int64)),
                "gy": pa.array(((eid // 96) % 96).astype(np.int64)),
            }
        )

    tbl = collect_tables(
        ds.map_batches(fixes, batch_format="pyarrow", batch_size=None)
    ).sort_by([("ts", "ascending"), ("eid", "ascending")])
    gx = tbl["gx"].to_numpy(zero_copy_only=False)[:12]
    gy = tbl["gy"].to_numpy(zero_copy_only=False)[:12]
    # work in quarters then sixteenths (exact integers throughout)
    px = [int(x) * 16 for x in gx]
    py = [int(y) * 16 for y in gy]
    for _ in range(2):
        nx = [px[0]]
        ny = [py[0]]
        for i in range(len(px) - 1):
            nx.append((3 * px[i] + px[i + 1]) // 4)
            ny.append((3 * py[i] + py[i + 1]) // 4)
            nx.append((px[i] + 3 * px[i + 1]) // 4)
            ny.append((py[i] + 3 * py[i + 1]) // 4)
        nx.append(px[-1])
        ny.append(py[-1])
        px, py = nx, ny
    return pa.table(
        {
            "i": pa.array(list(range(len(px))), pa.int64()),
            "x16": pa.array(px, pa.int64()),
            "y16": pa.array(py, pa.int64()),
        }
    )


_SINKHORN_ITERS = 10
_SINKHORN_SC = 1_000_000_000


def _q_sinkhorn_ot(sf_dir: str) -> pa.Table:
    """Entropic optimal transport (Sinkhorn) between the purchase and
    view hour-of-day distributions: kernel K = exp(-|i-j|_circ / 4)
    quantized once at 1e9 ticks, then 10 unrolled integer scaling
    iterations (u = a * SC^2 // (K v), v = b * SC^2 // (K u) --
    truncating divisions, the IPF discipline on an OT kernel);
    output = the per-hour scaled marginals and the tick transport
    cost estimate."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "view")
        return pa.table(
            {
                "h": pa.array(((ts // 3_600_000_000) % 24)[keep]),
                "isp": pa.array(
                    (et[keep] == "purchase").astype(np.int64)
                ),
                "_one": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h"],
        [("isp", "sum", "a"), ("_one", "sum", "n")],
    )
    a = np.zeros(24, np.int64)
    b = np.zeros(24, np.int64)
    for i in range(agg.num_rows):
        h = int(agg["h"][i].as_py())
        ap = int(agg["a"][i].as_py())
        a[h] = ap
        b[h] = int(agg["n"][i].as_py()) - ap
    sc = _SINKHORN_SC
    k = np.zeros((24, 24), np.int64)
    for i in range(24):
        for j in range(24):
            d = min(abs(i - j), 24 - abs(i - j))
            k[i, j] = int(
                round_half_away(
                    np.array([np.exp(-float(d) / 4.0) * sc])
                )[0]
            )
    u = [sc] * 24
    v = [sc] * 24
    for _ in range(_SINKHORN_ITERS):
        for i in range(24):
            kv = sum(int(k[i, j]) * v[j] for j in range(24))
            u[i] = int(a[i]) * sc * sc // kv if kv else 0
        for j in range(24):
            ku = sum(int(k[i, j]) * u[i] for i in range(24))
            v[j] = int(b[j]) * sc * sc // ku if ku else 0
    cost_t = 0
    for i in range(24):
        for j in range(24):
            d = min(abs(i - j), 24 - abs(i - j))
            # transport plan tick: u_i K_ij v_j / SC^3 -> ticks of SC
            p = u[i] * int(k[i, j]) * v[j] // (sc * sc)
            cost_t += d * p
    return pa.table(
        {
            "hour": pa.array(list(range(24)), pa.int64()),
            "u_ticks": pa.array(u, pa.int64()),
            "v_ticks": pa.array(v, pa.int64()),
            "cost_ticks": pa.array([cost_t] * 24, pa.int64()),
        }
    )


def _sinkhorn_oracle_sql() -> str:
    """Mirror of _q_sinkhorn_ot: 10 unrolled integer scaling rounds
    over the quantized kernel."""
    sc = _SINKHORN_SC
    steps = []
    for r in range(1, _SINKHORN_ITERS + 1):
        pu, pv = f"u{r - 1}", f"v{r - 1}"
        steps.append(
            f"u{r} AS MATERIALIZED (SELECT m.i, CASE WHEN s.kv > 0 "
            f"THEN ab.a * {sc} * {sc} // s.kv ELSE 0 END AS u "
            f"FROM (SELECT DISTINCT i FROM kk) m "
            f"JOIN (SELECT kk.i, CAST(SUM(kk.k * {pv}.v) AS HUGEINT) "
            f"AS kv FROM kk JOIN {pv} ON {pv}.j = kk.j GROUP BY kk.i) "
            f"s ON s.i = m.i JOIN ab ON ab.h = m.i), "
            f"v{r} AS MATERIALIZED (SELECT m.j, CASE WHEN s.ku > 0 "
            f"THEN ab.b * {sc} * {sc} // s.ku ELSE 0 END AS v "
            f"FROM (SELECT DISTINCT j FROM kk) m "
            f"JOIN (SELECT kk.j, CAST(SUM(kk.k * u{r}.u) AS HUGEINT) "
            f"AS ku FROM kk JOIN u{r} ON u{r}.i = kk.i GROUP BY kk.j) "
            f"s ON s.j = m.j JOIN ab ON ab.h = m.j)"
        )
    last = _SINKHORN_ITERS
    return (
        "WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp "
        "FROM events WHERE event_type IN ('purchase', 'view')), "
        "hr AS (SELECT range AS h FROM range(0, 24)), "
        "ab AS MATERIALIZED (SELECT hr.h, "
        "CAST(COALESCE(SUM(e.isp), 0) AS HUGEINT) AS a, "
        "CAST(COALESCE(SUM(1 - e.isp), 0) AS HUGEINT) AS b "
        "FROM hr LEFT JOIN e ON e.h = hr.h GROUP BY hr.h), "
        "kk AS MATERIALIZED (SELECT a.range AS i, b.range AS j, "
        "CAST(ROUND(EXP(-CAST(LEAST(ABS(a.range - b.range), "
        "24 - ABS(a.range - b.range)) AS DOUBLE) / 4.0) "
        f"* {sc}, 0) AS HUGEINT) AS k "
        "FROM range(0, 24) a, range(0, 24) b), "
        f"u0 AS (SELECT h AS i, CAST({sc} AS HUGEINT) AS u FROM ab), "
        f"v0 AS (SELECT h AS j, CAST({sc} AS HUGEINT) AS v FROM ab), "
        + ", ".join(steps)
        + f", plan AS (SELECT kk.i, kk.j, "
        "CAST(LEAST(ABS(kk.i - kk.j), 24 - ABS(kk.i - kk.j)) "
        f"AS HUGEINT) * (u{last}.u * kk.k * v{last}.v "
        f"// (CAST({sc} AS HUGEINT) * {sc})) AS dc "
        f"FROM kk JOIN u{last} ON u{last}.i = kk.i "
        f"JOIN v{last} ON v{last}.j = kk.j), "
        "ct AS (SELECT CAST(SUM(dc) AS BIGINT) AS c FROM plan) "
        f"SELECT CAST(ab.h AS BIGINT) AS hour, "
        f"CAST(u{last}.u AS BIGINT) AS u_ticks, "
        f"CAST(v{last}.v AS BIGINT) AS v_ticks, "
        "ct.c AS cost_ticks "
        f"FROM ab JOIN u{last} ON u{last}.i = ab.h "
        f"JOIN v{last} ON v{last}.j = ab.h, ct ORDER BY ab.h"
    )


def _q_procrustes_2d(sf_dir: str) -> pa.Table:
    """Procrustes congruence (rotation + scale, closed form -- no
    SVD) between the first 12 centered fixes of the two most active
    users: R^2 = ((Sxx'+Syy')^2 + (Sxy'-Syx')^2) / (S1 * S2) over
    n-scaled exact integer cross-moments; one float chain."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    users = [u for u, _ in _top_users_by_count(sf_dir, 2)]
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )

    def fixes(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (uid == users[0]) | (uid == users[1])
        eid = batch["event_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "u": pa.array(uid[keep]),
                "ts": batch["ts"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )[keep],
                "eid": pa.array(eid),
                "x": pa.array((eid % 96).astype(np.int64)),
                "y": pa.array(((eid // 96) % 96).astype(np.int64)),
            }
        )

    tbl = collect_tables(
        ds.map_batches(fixes, batch_format="pyarrow", batch_size=None)
    ).sort_by([("ts", "ascending"), ("eid", "ascending")])
    uu = tbl["u"].to_numpy(zero_copy_only=False)
    pts = {}
    for u in users:
        sel = uu == u
        pts[u] = (
            tbl["x"].to_numpy(zero_copy_only=False)[sel][:12],
            tbl["y"].to_numpy(zero_copy_only=False)[sel][:12],
        )
    n = 12
    (x1, y1), (x2, y2) = pts[users[0]], pts[users[1]]
    # n-scaled centering: X = n*x - sum(x)  (exact integers)
    cx1 = n * x1 - int(x1.sum())
    cy1 = n * y1 - int(y1.sum())
    cx2 = n * x2 - int(x2.sum())
    cy2 = n * y2 - int(y2.sum())
    sxx = int((cx1 * cx2).sum())
    syy = int((cy1 * cy2).sum())
    sxy = int((cx1 * cy2).sum())
    syx = int((cy1 * cx2).sum())
    s1 = int((cx1 * cx1 + cy1 * cy1).sum())
    s2 = int((cx2 * cx2 + cy2 * cy2).sum())
    num = float(sxx + syy) * float(sxx + syy) + float(
        sxy - syx
    ) * float(sxy - syx)
    r2 = num / (float(s1) * float(s2))
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "trace_sum": pa.array([sxx + syy], pa.int64()),
            "skew_diff": pa.array([sxy - syx], pa.int64()),
            "congruence_r2": round_like_sql([r2], 6),
        }
    )
