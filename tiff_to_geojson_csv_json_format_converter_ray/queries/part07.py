"""Query implementations, part 07 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: neyman_allocation, panel_fixed_effects, fairness_audit, capture_recapture, chao1_richness, good_turing, p_chart, lof_cells, frechet_profiles, spanning_tree_count, bipartite_matching, schulze_method, bootstrap_percolation, fisher_exact, conformal_interval, gmm_em_1d, logistic_gd, knn_loo_accuracy, hopkins_stat, cart_depth2, adaboost_2, sax_motifs, hampel_filter, gwr_local, soundex_blocks, cronbach_userday, hits_scores, mst_cells, binseg_changepoints, atkinson_index, palma_ratio, proximity_graphs, min_cut_cells, assignment_min_cost, hilbert_cells, randomized_response, cochran_q, icc_estimate, activity_selection, fleiss_kappa ...
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
    _read_pq,
)
from .part06 import (  # noqa: F401
    _MARKOV_STATES,
    _top_value_cells,
)


def _q_neyman_allocation(sf_dir: str) -> pa.Table:
    """Neyman optimal allocation of a 100-unit sample across event-
    type strata: weights N_h * S_h with S_h from exact integer
    moments (the sqrt is one pinned float, then a 1e6-tick quantized
    weight), seats assigned by largest remainder.  The sampling-design
    counterpart of the apportionment operator."""
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
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "_one": pa.array(np.ones(len(y), np.int64)),
                "y": pa.array(y),
                "yy": pa.array(y * y),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type"],
        [("_one", "sum", "n"), ("y", "sum", "s1"), ("yy", "sum", "s2")],
    )
    types = sorted(agg["event_type"].to_pylist())
    stats = {
        t: (int(n), int(s1), int(s2))
        for t, n, s1, s2 in zip(
            agg["event_type"].to_pylist(),
            agg["n"].to_pylist(),
            agg["s1"].to_pylist(),
            agg["s2"].to_pylist(),
        )
    }
    wq = {}
    for t in types:
        n, s1, s2 = stats[t]
        sd = np.sqrt(
            float(n * s2 - s1 * s1) / (float(n) * float(n))
        )
        wq[t] = int(
            round_half_away(np.array([float(n) * sd * 1e6]))[0]
        )
    tot = sum(wq.values())
    seats = 100
    base = {t: (wq[t] * seats) // tot for t in types}
    rem = sorted(
        types, key=lambda t: (-((wq[t] * seats) % tot), t)
    )
    alloc = dict(base)
    for t in rem[: seats - sum(base.values())]:
        alloc[t] += 1
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array([stats[t][0] for t in types], pa.int64()),
            "weight_q": pa.array([wq[t] for t in types], pa.int64()),
            "n_sample": pa.array([alloc[t] for t in types], pa.int64()),
        }
    )


def _q_panel_fixed_effects(sf_dir: str) -> pa.Table:
    """Panel fixed-effects (within) estimator of value cents on
    hour-of-day with user entities: per-user exact integer moments,
    per-entity demeaned numerator/denominator terms quantized at 1e6
    ticks (pinned double over the entity count), integer-summed across
    entities, one final float ratio.  The pooled OLS slope is reported
    for contrast -- the bias the fixed effect removes."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        x = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "u": batch["user_id"],
                "_one": pa.array(np.ones(len(x), np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
                "xx": pa.array(x * x),
                "xy": pa.array(x * y),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u"],
        [
            ("_one", "sum", "n"),
            ("x", "sum", "sx"),
            ("y", "sum", "sy"),
            ("xx", "sum", "sxx"),
            ("xy", "sum", "sxy"),
        ],
    )
    num_q = den_q = 0
    tn = tsx = tsy = tsxx = tsxy = 0
    n_users = agg.num_rows
    for i in range(n_users):
        n = int(agg["n"][i].as_py())
        sx = int(agg["sx"][i].as_py())
        sy = int(agg["sy"][i].as_py())
        sxx = int(agg["sxx"][i].as_py())
        sxy = int(agg["sxy"][i].as_py())
        num_q += int(
            round_half_away(
                np.array(
                    [float(n * sxy - sx * sy) / float(n) * 1e6]
                )
            )[0]
        )
        den_q += int(
            round_half_away(
                np.array(
                    [float(n * sxx - sx * sx) / float(n) * 1e6]
                )
            )[0]
        )
        tn += n
        tsx += sx
        tsy += sy
        tsxx += sxx
        tsxy += sxy
    beta_within = float(num_q) / float(den_q)
    beta_pooled = float(tn * tsxy - tsx * tsy) / float(
        tn * tsxx - tsx * tsx
    )
    return pa.table(
        {
            "n_users": pa.array([n_users], pa.int64()),
            "beta_within": round_like_sql([beta_within], 6),
            "beta_pooled": round_like_sql([beta_pooled], 6),
        }
    )


def _q_fairness_audit(sf_dir: str) -> pa.Table:
    """Group-fairness audit of the long-document outcome (n_chars >=
    300) across the doc_id-parity groups: exact per-group counts,
    pinned positive rates, and the demographic-parity gap repeated on
    both rows -- the governance sibling of the k-anonymity trio."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array(did % 2),
                "_one": pa.array(np.ones(len(did), np.int64)),
                "pos": pa.array((nc >= 300).astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["grp"],
        [("_one", "sum", "n"), ("pos", "sum", "n_pos")],
    ).sort_by([("grp", "ascending")])
    n = [int(x) for x in agg["n"].to_pylist()]
    p = [int(x) for x in agg["n_pos"].to_pylist()]
    rates = [float(a) / float(b) for a, b in zip(p, n)]
    gap = rates[1] - rates[0]
    return pa.table(
        {
            "grp": agg["grp"],
            "n_docs": agg["n"],
            "n_pos": agg["n_pos"],
            "pos_rate": round_like_sql(rates, 6),
            "parity_gap": round_like_sql([gap, gap], 6),
        }
    )


def _q_capture_recapture(sf_dir: str) -> pa.Table:
    """Lincoln-Petersen / Chapman capture-recapture estimate of the
    user population from week-1 and week-2 sightings: exact integer
    capture counts and overlap, pinned float estimators (the ecology
    estimator pair, here auditing how fully two windows cover the
    user base)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "u": batch["user_id"],
                "w": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "w"],
        [("_one", "sum", "_n")],
    )
    uv = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = agg["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    d0 = int(dv.min())
    wk = (dv - d0) // 7
    w1 = set(uv[wk == 0].tolist())
    w2 = set(uv[wk == 1].tolist())
    n1, n2, m = len(w1), len(w2), len(w1 & w2)
    lp = float(n1 * n2) / float(m)
    chapman = float((n1 + 1) * (n2 + 1)) / float(m + 1) - 1.0
    return pa.table(
        {
            "n_week1": pa.array([n1], pa.int64()),
            "n_week2": pa.array([n2], pa.int64()),
            "n_both": pa.array([m], pa.int64()),
            "lincoln_petersen": round_like_sql([lp], 6),
            "chapman": round_like_sql([chapman], 6),
        }
    )


def _q_chao1_richness(sf_dir: str) -> pa.Table:
    """Chao1 species-richness estimate over user sighting counts:
    S_obs + f1*(f1-1)/(2*(f2+1)) (bias-corrected form, defined even
    with no doubletons) from exact singleton/doubleton counts -- the
    how-many-users-have-we-not-seen estimator."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch["user_id"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u"],
        [("_one", "sum", "c")],
    )
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_obs = len(cv)
    f1 = int((cv == 1).sum())
    f2 = int((cv == 2).sum())
    chao1 = float(s_obs) + float(f1 * (f1 - 1)) / float(2 * (f2 + 1))
    return pa.table(
        {
            "s_obs": pa.array([s_obs], pa.int64()),
            "f1": pa.array([f1], pa.int64()),
            "f2": pa.array([f2], pa.int64()),
            "chao1": round_like_sql([chao1], 6),
        }
    )


def _q_good_turing(sf_dir: str) -> pa.Table:
    """Good-Turing frequency-of-frequency smoothing over corpus
    tokens: for each observed count r with a successor class, the
    adjusted count r* = (r+1)*N_{r+1}/N_r as a pinned float over exact
    integer class sizes; rows without N_{r+1} keep r* = r (classic
    plain-GT convention)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def toks(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_d", pa.array(np.zeros(batch.num_rows, np.int64))
        )
        t = _explode_tokens(batch, "text", "_d").select(["token"])
        return pa.table(
            {
                "token": t["token"],
                "_one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    tc = hash_aggregate(
        ds.map_batches(toks, batch_format="pyarrow", batch_size=None),
        ["token"],
        [("_one", "sum", "c")],
    )
    cv = tc["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    rs, ns = np.unique(cv, return_counts=True)
    nmap = dict(zip(rs.tolist(), ns.tolist()))
    rows = []
    for r, nr in zip(rs.tolist(), ns.tolist()):
        nr1 = nmap.get(r + 1)
        rstar = (
            float((r + 1) * nr1) / float(nr)
            if nr1 is not None
            else float(r)
        )
        rows.append((int(r), int(nr), rstar))
    return pa.table(
        {
            "r": pa.array([x[0] for x in rows], pa.int64()),
            "n_r": pa.array([x[1] for x in rows], pa.int64()),
            "r_star": round_like_sql([x[2] for x in rows], 6),
        }
    )


def _q_p_chart(sf_dir: str) -> pa.Table:
    """Attribute p-chart over the daily purchase proportion: pooled
    p-bar from exact integer totals, per-day 3-sigma binomial limits
    as pinned float chains, and out-of-control flags -- the attribute-
    chart sibling of the western_electric rules."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
                "k": pa.array((et == "purchase").astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "n"), ("k", "sum", "k")],
    ).sort_by([("d", "ascending")])
    dv = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    kv = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    d0 = int(dv.min())
    big_n = int(nv.sum())
    big_k = int(kv.sum())
    pbar = float(big_k) / float(big_n)
    rows = []
    for d, n, k in zip(dv.tolist(), nv.tolist(), kv.tolist()):
        rate = float(k) / float(n)
        sig = np.sqrt(pbar * (1.0 - pbar) / float(n))
        ucl = pbar + 3.0 * sig
        lcl = pbar - 3.0 * sig
        rows.append(
            (
                int(d) - d0,
                int(n),
                int(k),
                rate,
                1 if rate > ucl else 0,
                1 if rate < lcl else 0,
            )
        )
    return pa.table(
        {
            "t": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "k": pa.array([r[2] for r in rows], pa.int64()),
            "rate": round_like_sql([r[3] for r in rows], 6),
            "above_ucl": pa.array([r[4] for r in rows], pa.int64()),
            "below_lcl": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


def _q_lof_cells(sf_dir: str) -> pa.Table:
    """Local outlier factor (k=3, squared-distance reachability
    variant -- documented deviation keeps every quantity an exact
    integer) over the top-50 value cells: neighbors ranked by
    (d^2, cell id), reach^2 = max(kdist^2(o), d^2(p,o)), lrd sums are
    integers, and LOF = mean of 1e9-tick quantized sr_p/sr_o ratios.
    Density-based outlier scoring over the hot-cell map."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    items = _top_value_cells(sf_dir, k=50)
    cells = sorted(c for c, _ in items)
    pts = [(c % 96, c // 96) for c in cells]
    n = len(pts)
    k = 3
    neigh: list[list[int]] = []
    kd2: list[int] = []
    d2 = [
        [
            (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            for j in range(n)
        ]
        for i in range(n)
    ]
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (d2[i][j], cells[j]),
        )[:k]
        neigh.append(order)
        kd2.append(d2[i][order[-1]])
    sr = [
        sum(max(kd2[o], d2[i][o]) for o in neigh[i]) for i in range(n)
    ]
    lofq = []
    for i in range(n):
        tq = sum(
            int(
                round_half_away(
                    np.array([1e9 * float(sr[i]) / float(sr[o])])
                )[0]
            )
            for o in neigh[i]
        )
        lofq.append(tq)
    return pa.table(
        {
            "cell": pa.array(cells, pa.int64()),
            "sum_reach2": pa.array(sr, pa.int64()),
            "lof": round_like_sql(
                [float(q) / 3e9 for q in lofq], 6
            ),
        }
    )


def _q_frechet_profiles(sf_dir: str) -> pa.Table:
    """Discrete Frechet distance between the click and view hour-of-
    day profiles: the max-of-mins DP over |a_i - b_j| integer costs
    (the dog-walking counterpart of dtw_distance, same anti-diagonal
    unrolled SQL mirror)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        hod = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        m = (et == "click") | (et == "view")
        return pa.table(
            {
                "hod": pa.array(hod[m]),
                "is_a": pa.array((et[m] == "click").astype(np.int64)),
                "_one": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["hod", "is_a"],
        [("_one", "sum", "c")],
    )
    a = np.zeros(24, np.int64)
    b = np.zeros(24, np.int64)
    for h, isa, c in zip(
        agg["hod"].to_pylist(), agg["is_a"].to_pylist(), agg["c"].to_pylist()
    ):
        (a if isa else b)[int(h)] = int(c)
    dp = [[0] * 24 for _ in range(24)]
    for i in range(24):
        for j in range(24):
            cost = abs(int(a[i]) - int(b[j]))
            if i == 0 and j == 0:
                dp[i][j] = cost
            elif i == 0:
                dp[i][j] = max(cost, dp[0][j - 1])
            elif j == 0:
                dp[i][j] = max(cost, dp[i - 1][0])
            else:
                dp[i][j] = max(
                    cost,
                    min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]),
                )
    return pa.table(
        {
            "n_a": pa.array([int(a.sum())], pa.int64()),
            "n_b": pa.array([int(b.sum())], pa.int64()),
            "frechet": pa.array([dp[23][23]], pa.int64()),
        }
    )


def _q_spanning_tree_count(sf_dir: str) -> pa.Table:
    """EXACT spanning-tree count of the edit-1 word graph by the
    matrix-tree theorem: the 19x19 Laplacian minor determinant via
    fraction-free Bareiss elimination -- every intermediate is an
    exact integer and every division is exact (so truncating and
    floor division agree), 18 unrolled steps in the SQL mirror.  The
    count is emitted as a decimal string (it can exceed int64) plus
    its log10."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
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
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    lap = [[0] * n for _ in range(n)]
    n_edges = 0
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        i, j = rank[w1], rank[w2]
        lap[i][j] -= 1
        lap[j][i] -= 1
        lap[i][i] += 1
        lap[j][j] += 1
        n_edges += 1
    # minor: drop row/col 0; 1-indexed Bareiss
    m = {
        (i, j): lap[i][j]
        for i in range(1, n)
        for j in range(1, n)
    }
    size = n - 1
    prev_piv = 1
    for k in range(1, size):
        piv = m[(k, k)]
        new = {}
        for i in range(k + 1, size + 1):
            for j in range(k + 1, size + 1):
                new[(i, j)] = (
                    piv * m[(i, j)] - m[(i, k)] * m[(k, j)]
                ) // prev_piv
        m = new
        prev_piv = piv
    det = m[(size, size)]
    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_trees": pa.array([str(det)], pa.string()),
            "log10_trees": round_like_sql(
                [np.log10(float(det))], 6
            ),
        }
    )


def _q_bipartite_matching(sf_dir: str) -> pa.Table:
    """Maximum bipartite matching between the top-8 count cells and
    the top-8 value cells (edge iff Manhattan distance <= 40) by the
    exact bitmask subset DP -- 8 unrolled levels over (used-rights
    mask, matched count); by Koenig's theorem the result is also the
    minimum vertex cover."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "v": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n"), ("v", "sum", "sv")],
    )
    cells = agg["cell"].to_pylist()
    nv = agg["n"].to_pylist()
    sv = agg["sv"].to_pylist()
    left = sorted(
        (int(c) for c, _ in sorted(
            zip(cells, nv), key=lambda t: (-int(t[1]), int(t[0]))
        )[:8])
    )
    right = sorted(
        (int(c) for c, _ in sorted(
            zip(cells, sv), key=lambda t: (-int(t[1]), int(t[0]))
        )[:8])
    )
    lp = [(c % 96, c // 96) for c in left]
    rp = [(c % 96, c // 96) for c in right]
    edge = [
        [
            abs(lp[i][0] - rp[j][0]) + abs(lp[i][1] - rp[j][1]) <= 40
            for j in range(8)
        ]
        for i in range(8)
    ]
    n_edges = sum(sum(r) for r in edge)
    dp = {0: 0}
    for i in range(8):
        new = dict(dp)
        for mask, val in dp.items():
            for j in range(8):
                if edge[i][j] and not (mask >> j) & 1:
                    key = mask | (1 << j)
                    if val + 1 > new.get(key, -1):
                        new[key] = val + 1
        dp = new
    best = max(dp.values())
    return pa.table(
        {
            "n_left": pa.array([8], pa.int64()),
            "n_right": pa.array([8], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "max_matching": pa.array([best], pa.int64()),
            "min_vertex_cover": pa.array([best], pa.int64()),
        }
    )


def _q_schulze_method(sf_dir: str) -> pa.Table:
    """Schulze (beatpath) election over the five event types with
    (user, day) ballots ranked by in-context counts: exact pairwise
    preference matrix, widest-path strengths via the k-unrolled
    Floyd max-min relaxation (pure integer), and the dominance
    winner flags."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        ti = np.array(
            [tmap[t] for t in batch["event_type"].to_pylist()], np.int64
        )
        return pa.table(
            {
                "u": batch["user_id"],
                "d": pa.array(day),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "d", "t"],
        [("_one", "sum", "c")],
    )
    uv = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    _, inv = np.unique(np.stack([uv, dv], axis=1), axis=0, return_inverse=True)
    mat = np.zeros((int(inv.max()) + 1, 5), np.int64)
    mat[inv, tv] = cv
    d = [[0] * 5 for _ in range(5)]
    for i in range(5):
        for j in range(5):
            if i != j:
                # zero counts participate (absent type loses)
                d[i][j] = int((mat[:, i] > mat[:, j]).sum())
    p = [
        [
            d[i][j] if i != j and d[i][j] > d[j][i] else 0
            for j in range(5)
        ]
        for i in range(5)
    ]
    for k in range(5):
        p = [
            [
                max(p[i][j], min(p[i][k], p[k][j])) if i != j else 0
                for j in range(5)
            ]
            for i in range(5)
        ]
    wins = [sum(1 for j in range(5) if j != i and d[i][j] > d[j][i]) for i in range(5)]
    winner = [
        1
        if all(p[i][j] >= p[j][i] for j in range(5) if j != i)
        else 0
        for i in range(5)
    ]
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES),
            "pairwise_wins": pa.array(wins, pa.int64()),
            "is_schulze_winner": pa.array(winner, pa.int64()),
        }
    )


_BPERC_ROUNDS = 10


def _q_bootstrap_percolation(sf_dir: str) -> pa.Table:
    """Bootstrap percolation (threshold-2 cascade) on the edit-1 word
    graph seeded by the two smallest vocabulary words: a node
    activates when >= 2 neighbors are active, 10 synchronous integer
    rounds; reports each word's activation round (0 = seed, -1 =
    never)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
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
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    adj: list[set[int]] = [set() for _ in range(n)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = rank[w1], rank[w2]
        adj[a].add(b)
        adj[b].add(a)
    rounds = {0: 0, 1: 0} if n >= 2 else {0: 0}
    for r in range(1, _BPERC_ROUNDS + 1):
        active = set(rounds)
        newly = {
            v
            for v in range(n)
            if v not in active
            and sum(1 for u in adj[v] if u in active) >= 2
        }
        for v in newly:
            rounds[v] = r
    return pa.table(
        {
            "word": pa.array(vocab, pa.string()),
            "round": pa.array(
                [rounds.get(v, -1) for v in range(n)], pa.int64()
            ),
        }
    )


def _q_fisher_exact(sf_dir: str) -> pa.Table:
    """EXACT Fisher 2x2 test (no lgamma, no floats until the final
    ratio): sources split by rank parity vs the above-average-chars
    outcome (20*sum > total, integer predicate); the hypergeometric
    enumeration uses exact binomial coefficients, and the two-sided
    p-value sums every table with probability <= observed via pure
    integer comparisons.  The SQL mirror carries a generated Pascal
    VALUES table."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch["source"],
                "nc": batch["n_chars"],
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source"],
        [("nc", "sum", "s")],
    )
    rows = sorted(
        (w, int(s))
        for w, s in zip(agg["source"].to_pylist(), agg["s"].to_pylist())
        if len(w) >= 4
    )
    nsrc = len(rows)
    total = sum(s for _, s in rows)
    a_obs = 0
    n0 = n1 = big_k = 0
    for idx, (_, s) in enumerate(rows):
        g = idx % 2
        o = 1 if nsrc * s > total else 0
        if g == 0:
            n0 += 1
            if o:
                a_obs += 1
        else:
            n1 += 1
        big_k += o
    a_val = math.comb(n0, a_obs) * math.comb(n1, big_k - a_obs)
    num = 0
    den = math.comb(nsrc, big_k)
    for k in range(max(0, big_k - n1), min(n0, big_k) + 1):
        w = math.comb(n0, k) * math.comb(n1, big_k - k)
        if w <= a_val:
            num += w
    return pa.table(
        {
            "n_sources": pa.array([nsrc], pa.int64()),
            "a_obs": pa.array([a_obs], pa.int64()),
            "col_total": pa.array([big_k], pa.int64()),
            "p_value": round_like_sql(
                [float(num) / float(den)], 6
            ),
        }
    )


def _q_conformal_interval(sf_dir: str) -> pa.Table:
    """Split-conformal prediction interval for event value cents with
    the per-type exact integer median as the point predictor:
    calibration/test split by mix32(event_id), nonconformity =
    |y - median_type| (integer), q_hat = the ceil(0.9*(n+1))-th
    calibration order statistic, and the test-set coverage rate --
    the distribution-free uncertainty wrapper, fully exact."""
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
        columns=["event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "t": batch["event_type"],
                "cal": pa.array(mix32(eid, 99) % 2),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t", "cal", "y"],
        [("_one", "sum", "c")],
    )
    tv = agg["t"].to_pylist()
    calv = agg["cal"].to_pylist()
    yv = [int(x) for x in agg["y"].to_pylist()]
    cv = [int(x) for x in agg["c"].to_pylist()]
    # per-type exact lower median over ALL events
    med = {}
    for t in sorted(set(tv)):
        vals = sorted(
            (y, c) for ty, y, c in zip(tv, yv, cv) if ty == t
        )
        n_t = sum(c for _, c in vals)
        k = (n_t - 1) // 2  # 0-based lower median
        cum = 0
        for y, c in vals:
            cum += c
            if cum > k:
                med[t] = y
                break
    # residual multisets per split
    resid: dict[int, dict[int, int]] = {0: {}, 1: {}}
    for t, cal, y, c in zip(tv, calv, yv, cv):
        r = abs(y - med[t])
        d = resid[int(cal)]
        d[r] = d.get(r, 0) + c
    cal_d = resid[0]  # cal = mix32 % 2 == 0
    n_cal = sum(cal_d.values())
    k = min(n_cal, (9 * (n_cal + 1) + 9) // 10)
    cum = 0
    q_hat = None
    for r in sorted(cal_d):
        cum += cal_d[r]
        if cum >= k:
            q_hat = r
            break
    n_test = sum(resid[1].values())
    n_cov = sum(c for r, c in resid[1].items() if r <= q_hat)
    return pa.table(
        {
            "n_cal": pa.array([n_cal], pa.int64()),
            "n_test": pa.array([n_test], pa.int64()),
            "q_hat": pa.array([q_hat], pa.int64()),
            "coverage": round_like_sql(
                [float(n_cov) / float(n_test)], 6
            ),
        }
    )


_GMM_ITERS = 10
_GMM_RQ = 1_000_000_000


def _q_gmm_em_1d(sf_dir: str) -> pa.Table:
    """Two-component 1-D Gaussian-mixture EM on event value cents,
    bit-identical in Python and SQL: the E-step responsibility is one
    pinned float chain per distinct value (params are floats derived
    from exact integer sums, so no accumulation-order ambiguity),
    quantized at 1e9 ticks before the M-step integer sums; 10 unrolled
    iterations.  Init: exact 25th/75th-percentile order statistics and
    the exact global variance.  Reports the final params and the
    quantized log-likelihood."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def prep(batch: pa.Table) -> pa.Table:
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "y": pa.array(y),
                "_one": pa.array(np.ones(len(y), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["y"],
        [("_one", "sum", "c")],
    ).sort_by([("y", "ascending")])
    yv = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(cv.sum())
    cum = np.cumsum(cv)
    k25 = (n - 1) // 4
    k75 = (3 * (n - 1)) // 4
    mu1 = float(int(yv[int(np.searchsorted(cum, k25 + 1))]))
    mu2 = float(int(yv[int(np.searchsorted(cum, k75 + 1))]))
    sy = int((yv * cv).sum())
    syy = sum(int(y) * int(y) * int(c) for y, c in zip(yv, cv))
    v1 = v2 = float(n * syy - sy * sy) / float(n * n)
    w1 = 0.5
    yf = yv.astype(np.float64)
    cl = [int(x) for x in cv.tolist()]
    yl = [int(x) for x in yv.tolist()]
    rq_s = _GMM_RQ
    llq = 0
    for _ in range(_GMM_ITERS):
        d1 = yf - mu1
        d2 = yf - mu2
        l1 = -(d1 * d1) / (2.0 * v1) - 0.5 * np.log(v1)
        l2 = -(d2 * d2) / (2.0 * v2) - 0.5 * np.log(v2)
        with np.errstate(over="ignore"):
            z = np.log(1.0 - w1) - np.log(w1) + l2 - l1
            r1 = 1.0 / (1.0 + np.exp(z))
        r1q = round_half_away(1e9 * r1).astype(np.int64)
        rl = [int(x) for x in r1q.tolist()]
        R1 = sum(c * r for c, r in zip(cl, rl))
        R2 = sum(c * (rq_s - r) for c, r in zip(cl, rl))
        S1 = sum(c * r * y for c, r, y in zip(cl, rl, yl))
        S2 = sum(c * (rq_s - r) * y for c, r, y in zip(cl, rl, yl))
        Q1 = sum(c * r * y * y for c, r, y in zip(cl, rl, yl))
        Q2 = sum(
            c * (rq_s - r) * y * y for c, r, y in zip(cl, rl, yl)
        )
        mu1 = float(S1) / float(R1)
        mu2 = float(S2) / float(R2)
        v1 = float(Q1) / float(R1) - mu1 * mu1
        v2 = float(Q2) / float(R2) - mu2 * mu2
        w1 = float(R1) / float(R1 + R2)
    # final quantized log-likelihood under the fitted params
    d1 = yf - mu1
    d2 = yf - mu2
    l1 = -(d1 * d1) / (2.0 * v1) - 0.5 * np.log(v1)
    l2 = -(d2 * d2) / (2.0 * v2) - 0.5 * np.log(v2)
    with np.errstate(over="ignore", under="ignore"):
        mix = w1 * np.exp(l1) + (1.0 - w1) * np.exp(l2)
        ll = np.log(mix)
    tq = round_half_away(1e6 * ll).astype(np.int64)
    llq = sum(c * int(t) for c, t in zip(cl, tq.tolist()))
    return pa.table(
        {
            "mu1": round_like_sql([mu1 / 100.0], 6),
            "mu2": round_like_sql([mu2 / 100.0], 6),
            "sigma1": round_like_sql([np.sqrt(v1) / 100.0], 6),
            "sigma2": round_like_sql([np.sqrt(v2) / 100.0], 6),
            "w1": round_like_sql([w1], 6),
            "loglik_q": pa.array([llq], pa.int64()),
        }
    )


_LOGIT_ITERS = 15
_LOGIT_LR = 0.5


def _q_logistic_gd(sf_dir: str) -> pa.Table:
    """Logistic regression (is-purchase ~ standardized hour-of-day +
    standardized value cents) by batch gradient descent, bit-identical
    in SQL: standardization constants come from exact integer moments,
    each iteration's per-row residual sigma(z) - t is quantized at 1e9
    ticks so the gradient sums are exact integers (features enter the
    gradient pre-quantized at 1e6 ticks), and the coefficient update
    is one pinned float chain; 15 unrolled iterations plus an exact
    z>0 accuracy count."""
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
        hod = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "h": pa.array(hod),
                "y": pa.array(y),
                "t": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(y), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h", "y", "t"],
        [("_one", "sum", "c")],
    )
    hv = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    yv = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(cv.sum())
    sh = int((hv * cv).sum())
    shh = int((hv * hv * cv).sum())
    sy = int((yv * cv).sum())
    syy = sum(int(y) * int(y) * int(c) for y, c in zip(yv, cv))
    mh = float(sh) / float(n)
    sdh = np.sqrt(float(n * shh - sh * sh) / (float(n) * float(n)))
    my = float(sy) / float(n)
    sdy = np.sqrt(float(n * syy - sy * sy) / (float(n) * float(n)))
    # pre-quantized standardized features (1e6 ticks) keep gradient
    # sums exact
    x1q = round_half_away(
        1e6 * (hv.astype(np.float64) - mh) / sdh
    ).astype(np.int64)
    x2q = round_half_away(
        1e6 * (yv.astype(np.float64) - my) / sdy
    ).astype(np.int64)
    x1f = x1q.astype(np.float64) / 1e6
    x2f = x2q.astype(np.float64) / 1e6
    b0 = b1 = b2 = 0.0
    cl = [int(x) for x in cv.tolist()]
    for _ in range(_LOGIT_ITERS):
        z = b0 + b1 * x1f + b2 * x2f
        with np.errstate(over="ignore"):
            sig = 1.0 / (1.0 + np.exp(-z))
        rq = round_half_away(
            1e9 * (sig - tv.astype(np.float64))
        ).astype(np.int64)
        rl = [int(x) for x in rq.tolist()]
        g0 = sum(c * r for c, r in zip(cl, rl))
        g1 = sum(
            c * r * int(q) for c, r, q in zip(cl, rl, x1q.tolist())
        )
        g2 = sum(
            c * r * int(q) for c, r, q in zip(cl, rl, x2q.tolist())
        )
        b0 = b0 - _LOGIT_LR * (float(g0) / 1e9) / float(n)
        b1 = b1 - _LOGIT_LR * (float(g1) / 1e9 / 1e6) / float(n)
        b2 = b2 - _LOGIT_LR * (float(g2) / 1e9 / 1e6) / float(n)
    z = b0 + b1 * x1f + b2 * x2f
    correct = sum(
        c
        for c, zz, t in zip(cl, z.tolist(), tv.tolist())
        if (1 if zz > 0.0 else 0) == int(t)
    )
    return pa.table(
        {
            "n_obs": pa.array([n], pa.int64()),
            "b0": round_like_sql([b0], 6),
            "b1": round_like_sql([b1], 6),
            "b2": round_like_sql([b2], 6),
            "accuracy": round_like_sql(
                [float(correct) / float(n)], 6
            ),
        }
    )


def _q_knn_loo_accuracy(sf_dir: str) -> pa.Table:
    """Leave-one-out 5-NN classifier accuracy over the first 500
    embedding vectors (by vec_id; the subset keeps the all-pairs
    check scale-invariant): 1e4-tick integer squared distances,
    neighbor order (d2, vec_id), majority vote with smallest-label
    tie-break -- every decision exact."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )

    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))

    def prep(batch: pa.Table) -> pa.Table:
        m = list_col_to_matrix(batch["embedding"]).astype(np.float64)
        vq = round_half_away(m * 1e4).astype(np.int64)
        cols = {
            "vec_id": batch["vec_id"],
            "label": batch["label"].cast(pa.int64()),
        }
        for c in range(vq.shape[1]):
            cols[f"v{c}"] = pa.array(vq[:, c])
        return pa.table(cols)

    tab = collect_tables(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    )
    vid = tab["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid)[:500]
    vid = vid[order]
    lab = tab["label"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    vq = np.stack(
        [
            tab[f"v{c}"].to_numpy(zero_copy_only=False)[order]
            for c in range(64)
        ],
        axis=1,
    )
    n = len(vid)
    nrm = (vq * vq).sum(axis=1)
    d2 = nrm[:, None] + nrm[None, :] - 2 * (vq @ vq.T)
    correct = 0
    for i in range(n):
        cand = sorted(
            (int(d2[i, j]), int(vid[j]), int(lab[j]))
            for j in range(n)
            if j != i
        )[:5]
        votes: dict[int, int] = {}
        for _, _, l in cand:
            votes[l] = votes.get(l, 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        if pred == int(lab[i]):
            correct += 1
    return pa.table(
        {
            "n_vecs": pa.array([n], pa.int64()),
            "n_correct": pa.array([correct], pa.int64()),
            "accuracy": round_like_sql(
                [float(correct) / float(n)], 6
            ),
        }
    )


def _q_hopkins_stat(sf_dir: str) -> pa.Table:
    """Hopkins clusterability statistic (squared-distance variant,
    documented) over the event cell pattern: 50 mix32 lattice probes
    vs 50 mix32-sampled data cells, exact integer nearest-neighbor
    d2 sums, H = sum_u / (sum_u + sum_w) as one pinned float."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "_n")],
    )
    cells = np.sort(
        agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    xs = cells % 96
    ys = cells // 96
    idx = np.arange(50, dtype=np.int64)
    px = mix32(idx, 41) % 96
    py = mix32(idx, 43) % 96
    # data sample: 50 cells by smallest mix32(cell, 47), cell tie-break
    keys = mix32(cells, 47)
    sel = np.lexsort((cells, keys))[:50]
    su = 0
    for i in range(50):
        su += int(((xs - int(px[i])) ** 2 + (ys - int(py[i])) ** 2).min())
    sw = 0
    for i in sel.tolist():
        d = (xs - int(xs[i])) ** 2 + (ys - int(ys[i])) ** 2
        d[i] = 1 << 60
        sw += int(d.min())
    h = float(su) / float(su + sw)
    return pa.table(
        {
            "sum_u": pa.array([su], pa.int64()),
            "sum_w": pa.array([sw], pa.int64()),
            "hopkins": round_like_sql([h], 6),
        }
    )


def _q_cart_depth2(sf_dir: str) -> pa.Table:
    """Depth-2 CART classifier (is-purchase ~ hour-of-day, value
    cents): candidate thresholds are the 23 hour cuts plus 15 exact
    value-quantile order statistics; split costs are the weighted
    Gini 2p(n-p)/n as a pinned float with (feature, threshold)
    tie-break; leaf predictions by exact majority (2p > n).  Output:
    the three chosen splits and four leaves with exact counts, plus
    training accuracy."""
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
        hod = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "h": pa.array(hod),
                "y": pa.array(y),
                "t": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(y), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h", "y", "t"],
        [("_one", "sum", "c")],
    )
    hv = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    yv = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_total = int(cv.sum())
    # value quantile candidates: exact order statistics at i/16
    vorder = np.lexsort((yv,))
    ys_sorted = yv[vorder]
    cs_sorted = cv[vorder]
    cum = np.cumsum(cs_sorted)
    qthr = sorted(
        {
            int(
                ys_sorted[
                    int(np.searchsorted(cum, (i * (n_total - 1)) // 16 + 1))
                ]
            )
            for i in range(1, 16)
        }
    )
    cands = [(0, int(t)) for t in range(23)] + [(1, t) for t in qthr]

    def split_cost(mask: np.ndarray, feat: int, thr: int):
        fv = hv if feat == 0 else yv
        left = mask & (fv <= thr)
        right = mask & ~(fv <= thr)
        nl = int(cv[left].sum())
        nr = int(cv[right].sum())
        if nl == 0 or nr == 0:
            return None
        pl = int(cv[left & (tv == 1)].sum())
        pr = int(cv[right & (tv == 1)].sum())
        cost = 2.0 * float(pl) * float(nl - pl) / float(nl) + 2.0 * float(
            pr
        ) * float(nr - pr) / float(nr)
        return cost, left, right, nl, nr, pl, pr

    def best_split(mask: np.ndarray):
        best = None
        for feat, thr in cands:
            r = split_cost(mask, feat, thr)
            if r is None:
                continue
            key = (r[0], feat, thr)
            if best is None or key < best[0]:
                best = (key, r)
        return best

    root_mask = np.ones(len(cv), bool)
    (rk, rr) = best_split(root_mask)
    _, l_mask, r_mask, _, _, _, _ = rr
    rows = [
        (
            1,
            rk[1],
            rk[2],
            n_total,
            int(cv[tv == 1].sum()),
        )
    ]
    leaf_rows = []
    correct = 0
    for node_id, mask in ((2, l_mask), (3, r_mask)):
        (sk, sr) = best_split(mask)
        rows.append(
            (
                node_id,
                sk[1],
                sk[2],
                int(cv[mask].sum()),
                int(cv[mask & (tv == 1)].sum()),
            )
        )
        for off, kmask in enumerate((sr[1], sr[2])):
            nn = int(cv[kmask].sum())
            pp = int(cv[kmask & (tv == 1)].sum())
            pred = 1 if 2 * pp > nn else 0
            leaf_rows.append((node_id * 2 + off, -1, pred, nn, pp))
            correct += pp if pred == 1 else nn - pp
    acc = float(correct) / float(n_total)
    all_rows = rows + leaf_rows
    return pa.table(
        {
            "node": pa.array([r[0] for r in all_rows], pa.int64()),
            "feat": pa.array([r[1] for r in all_rows], pa.int64()),
            "thr_or_pred": pa.array(
                [r[2] for r in all_rows], pa.int64()
            ),
            "n": pa.array([r[3] for r in all_rows], pa.int64()),
            "n_pos": pa.array([r[4] for r in all_rows], pa.int64()),
            "accuracy": round_like_sql([acc] * len(all_rows), 6),
        }
    )


def _q_adaboost_2(sf_dir: str) -> pa.Table:
    """Two-round AdaBoost on decision stumps (is-purchase ~ hour /
    value-quantile thresholds, both polarities): round-1 error is an
    exact integer count; round-2 sample weights collapse to TWO values
    exp(+-alpha1), so every weighted error is a pinned two-term float
    with exact integer multiplicities and the argmin stays
    deterministic under the (feat, thr, pol) tie-break.  Reports both
    stumps, alphas, and the exact ensemble accuracy."""
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
        hod = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "h": pa.array(hod),
                "y": pa.array(y),
                "t": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(y), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h", "y", "t"],
        [("_one", "sum", "c")],
    )
    hv = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    yv = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(cv.sum())
    vorder = np.lexsort((yv,))
    cum = np.cumsum(cv[vorder])
    qthr = sorted(
        {
            int(
                yv[vorder][
                    int(np.searchsorted(cum, (i * (n - 1)) // 16 + 1))
                ]
            )
            for i in range(1, 16)
        }
    )
    cands = [
        (feat, thr, pol)
        for feat, thr in (
            [(0, int(t)) for t in range(23)] + [(1, t) for t in qthr]
        )
        for pol in (0, 1)
    ]

    def stump_pred(feat: int, thr: int, pol: int) -> np.ndarray:
        fv = hv if feat == 0 else yv
        p = (fv <= thr).astype(np.int64)
        return p if pol == 0 else 1 - p

    # round 1: exact integer error counts
    best1 = None
    for feat, thr, pol in cands:
        p = stump_pred(feat, thr, pol)
        err = int(cv[p != tv].sum())
        key = (err, feat, thr, pol)
        if best1 is None or key < best1:
            best1 = key
    e1n, f1, t1, p1 = best1
    a1 = 0.5 * np.log((float(n) - float(e1n)) / float(e1n))
    miss1 = stump_pred(f1, t1, p1) != tv
    ww = float(np.exp(a1))
    wc = float(np.exp(-a1))
    best2 = None
    for feat, thr, pol in cands:
        p = stump_pred(feat, thr, pol)
        miss = p != tv
        mw = int(cv[miss & miss1].sum())
        mc = int(cv[miss & ~miss1].sum())
        cost = ww * float(mw) + wc * float(mc)
        key = (cost, feat, thr, pol)
        if best2 is None or key < best2[0]:
            best2 = (key, mw, mc)
    (c2, f2, t2, p2), mw2, mc2 = best2
    nw = int(cv[miss1].sum())
    nc = n - nw
    e2 = (ww * float(mw2) + wc * float(mc2)) / (
        ww * float(nw) + wc * float(nc)
    )
    a2 = 0.5 * np.log((1.0 - e2) / e2)
    s1 = 2 * stump_pred(f1, t1, p1) - 1
    s2 = 2 * stump_pred(f2, t2, p2) - 1
    score = a1 * s1.astype(np.float64) + a2 * s2.astype(np.float64)
    pred = (score > 0.0).astype(np.int64)
    correct = int(cv[pred == tv].sum())
    return pa.table(
        {
            "feat1": pa.array([f1], pa.int64()),
            "thr1": pa.array([t1], pa.int64()),
            "pol1": pa.array([p1], pa.int64()),
            "alpha1": round_like_sql([a1], 6),
            "feat2": pa.array([f2], pa.int64()),
            "thr2": pa.array([t2], pa.int64()),
            "pol2": pa.array([p2], pa.int64()),
            "alpha2": round_like_sql([a2], 6),
            "accuracy": round_like_sql(
                [float(correct) / float(n)], 6
            ),
        }
    )


def _q_sax_motifs(sf_dir: str) -> pa.Table:
    """SAX-style motif mining on the daily revenue series: days
    discretized into 4 symbols by exact quartile order statistics
    (breaks at ranks (i*(n-1))//4, symbol = #breaks strictly below the
    value), all 3-gram motifs counted, top-5 by (count DESC, pattern).
    Pure integer discretization -- no z-normalization float."""
    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    srt = sorted(ys)
    breaks = [srt[(i * (n - 1)) // 4] for i in (1, 2, 3)]
    sym = [sum(1 for b in breaks if y > b) for y in ys]
    counts: dict[str, int] = {}
    for t in range(n - 2):
        pat = f"{sym[t]}{sym[t + 1]}{sym[t + 2]}"
        counts[pat] = counts.get(pat, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    return pa.table(
        {
            "motif": pa.array([k for k, _ in top], pa.string()),
            "n_occur": pa.array([v for _, v in top], pa.int64()),
        }
    )


def _daily_revenue_cents(sf_dir: str) -> list[int]:
    """Shared dense daily event-revenue cents series."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    ys = [0] * (hi - lo + 1)
    for d, y in zip((dd - lo).tolist(), agg["y"].to_pylist()):
        ys[d] = int(y)
    return ys


def _q_hampel_filter(sf_dir: str) -> pa.Table:
    """Hampel outlier filter on the daily revenue series: centered
    5-day windows (edge-truncated), exact window median and MAD via
    small-sort order statistics, flag |y - med| > 3 * MAD using the
    integer inequality |y - med| * 1 > 3 * MAD -- no float anywhere
    except none at all."""
    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    t_out, med_out, mad_out, flag = [], [], [], []
    for t in range(n):
        lo = max(0, t - 2)
        hi = min(n - 1, t + 2)
        win = sorted(ys[lo : hi + 1])
        m = win[(len(win) - 1) // 2]
        dev = sorted(abs(v - m) for v in win)
        mad = dev[(len(dev) - 1) // 2]
        t_out.append(t)
        med_out.append(m)
        mad_out.append(mad)
        flag.append(1 if abs(ys[t] - m) > 3 * mad else 0)
    return pa.table(
        {
            "t": pa.array(t_out, pa.int64()),
            "y": pa.array(ys, pa.int64()),
            "win_med": pa.array(med_out, pa.int64()),
            "win_mad": pa.array(mad_out, pa.int64()),
            "is_outlier": pa.array(flag, pa.int64()),
        }
    )


_GWR_PROBES = [(24, 24), (24, 72), (72, 24), (72, 72)]
_GWR_R2 = 900  # bandwidth^2 = 30^2


def _q_gwr_local(sf_dir: str) -> pa.Table:
    """Geographically weighted regression of event value cents on
    hour-of-day at four probe locations, with the EXACT integer
    triangular kernel w = max(0, R^2 - d^2) on the frozen grid: every
    weighted moment is an exact integer sum (the combiner tier emits
    per-probe partials), so the local slopes/intercepts are single
    pinned float ratios -- spatial non-stationarity screening without
    a single float in the aggregation."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "value"],
    )
    px = np.array([p[0] for p in _GWR_PROBES], np.int64)
    py = np.array([p[1] for p in _GWR_PROBES], np.int64)

    def partials(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        y = scaled_int(batch["value"], 100.0)
        cx = eid % 96
        cy = eid // 96 % 96
        out = {
            "probe": [], "sw": [], "swx": [], "swy": [],
            "swxx": [], "swxy": [], "n_eff": [],
        }
        for p in range(len(px)):
            d2 = (cx - px[p]) ** 2 + (cy - py[p]) ** 2
            w = np.maximum(0, _GWR_R2 - d2)
            out["probe"].append(p)
            out["sw"].append(int(w.sum()))
            out["swx"].append(int((w * x).sum()))
            out["swy"].append(int((w * y).sum()))
            out["swxx"].append(int((w * x * x).sum()))
            out["swxy"].append(int((w * x * y).sum()))
            out["n_eff"].append(int((w > 0).sum()))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in out.items()}
        )

    agg = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["probe"],
        [
            ("sw", "sum", "sw"),
            ("swx", "sum", "swx"),
            ("swy", "sum", "swy"),
            ("swxx", "sum", "swxx"),
            ("swxy", "sum", "swxy"),
            ("n_eff", "sum", "n_eff"),
        ],
    ).sort_by([("probe", "ascending")])
    slopes, intercepts = [], []
    for i in range(agg.num_rows):
        sw = int(agg["sw"][i].as_py())
        swx = int(agg["swx"][i].as_py())
        swy = int(agg["swy"][i].as_py())
        swxx = int(agg["swxx"][i].as_py())
        swxy = int(agg["swxy"][i].as_py())
        b = float(sw * swxy - swx * swy) / float(sw * swxx - swx * swx)
        slopes.append(b)
        intercepts.append(
            (float(swy) - b * float(swx)) / float(sw)
        )
    return pa.table(
        {
            "probe": agg["probe"],
            "px": pa.array(px.tolist(), pa.int64()),
            "py": pa.array(py.tolist(), pa.int64()),
            "n_eff": agg["n_eff"],
            "slope": round_like_sql(slopes, 6),
            "intercept": round_like_sql(intercepts, 6),
        }
    )


_SOUNDEX_CODE = {
    **{c: 1 for c in "bfpv"},
    **{c: 2 for c in "cgjkqsxz"},
    **{c: 3 for c in "dt"},
    "l": 4,
    **{c: 5 for c in "mn"},
    "r": 6,
    **{c: -1 for c in "hw"},  # transparent: do not break digit runs
}


def _soundex(w: str) -> str:
    """American Soundex (NARA): retain first letter; h/w transparent
    (same digits across them collapse), vowels break runs; first
    letter's own code participates in the collapse (Pfister -> P236)."""
    digits = []
    prev = _SOUNDEX_CODE.get(w[0], 0)
    for c in w[1:]:
        code = _SOUNDEX_CODE.get(c, 0)
        if code == -1:
            continue
        if 1 <= code <= 6 and code != prev:
            digits.append(str(code))
        prev = code
    return w[0].upper() + ("".join(digits) + "000")[:3]


def _q_soundex_blocks(sf_dir: str) -> pa.Table:
    """Phonetic blocking over the distinct corpus vocabulary (tokens of
    length >= 4, letters only): American Soundex code per word, then
    block-level aggregates (count + lexicographic first/last member)
    for every code with >= 2 members -- the classic cheap blocking key
    for fuzzy string dedup at scale (the per-word encode is a stateless
    map over the DISTINCT vocab, the block rollup a tiny groupby)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def batch_tokens(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_d", pa.array(np.zeros(batch.num_rows, np.int64))
        )
        return _explode_tokens(batch, "text", "_d").select(["token"])

    vocab = distinct(
        ds.map_batches(batch_tokens, batch_format="pyarrow", batch_size=None),
        ["token"],
    )
    vocab = vocab.filter(
        pc.and_(
            pc.greater_equal(pc.utf8_length(vocab["token"]), 4),
            pc.match_substring_regex(vocab["token"], "^[a-z]+$"),
        )
    )

    def encode(batch: pa.Table) -> pa.Table:
        ws = batch["token"].to_pylist()
        return pa.table(
            {
                "sdx": pa.array([_soundex(w) for w in ws], pa.string()),
                "w": pa.array(ws, pa.string()),
            }
        )

    blocks = hash_aggregate(
        rd.from_arrow(vocab).map_batches(
            encode, batch_format="pyarrow", batch_size=None
        ),
        ["sdx"],
        [
            ("w", "count", "n_words"),
            ("w", "min", "first_word"),
            ("w", "max", "last_word"),
        ],
    )
    return blocks.select(
        ["sdx", "n_words", "first_word", "last_word"]
    ).sort_by([("sdx", "ascending")])


def _q_cronbach_userday(sf_dir: str) -> pa.Table:
    """Cronbach's alpha internal-consistency coefficient treating the
    five event types as items and (user, day) as subjects, item score =
    the subject's event count of that type (zero-filled).  All variance
    numerators are EXACT integers (n*sum(x^2) - sum(x)^2; the n and the
    sample/population denominator cancel in the ratio), so alpha is one
    pinned float chain.  Distributed tier: the (user, day, type) count
    combiner; moments reduce on the driver over subject rows."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}
    k = len(_MARKOV_STATES)

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        ti = np.array([tmap[t] for t in batch["event_type"].to_pylist()],
                      np.int64)
        return pa.table(
            {
                "u": pa.array(uid),
                "d": pa.array(day),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(uid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "d", "t"],
        [("_one", "sum", "c")],
    )
    u = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    subj = u * 1_000_000 + d
    uniq, inv = np.unique(subj, return_inverse=True)
    n = len(uniq)
    # per-item moments (zeros contribute nothing to sums/squares)
    s_i = np.zeros(k, np.int64)
    q_i = np.zeros(k, np.int64)
    np.add.at(s_i, t, c)
    np.add.at(q_i, t, c * c)
    # per-subject totals
    tot = np.zeros(n, np.int64)
    np.add.at(tot, inv, c)
    num = int((n * q_i - s_i * s_i).sum())
    den = int(n * int((tot * tot).sum()) - int(tot.sum()) ** 2)
    alpha = (k / (k - 1)) * (1.0 - num / den)
    return pa.table(
        {
            "k_items": pa.array([k], pa.int64()),
            "n_subjects": pa.array([n], pa.int64()),
            "item_var_num": pa.array([num], pa.int64()),
            "total_var_num": pa.array([den], pa.int64()),
            "alpha": round_like_sql([alpha], 6),
        }
    )


_HITS_ITERS = 12
_HITS_SCALE = 1_000_000


def _q_hits_scores(sf_dir: str) -> pa.Table:
    """HITS hubs-and-authorities on the bipartite user -> event-type
    graph (edge weight = the user's event count of that type): 12
    unrolled mutual-reinforcement rounds, each a weighted matvec
    followed by a truncating integer renormalization to 1e6 ticks
    (all scores positive, so every step is bit-identical in Python
    and the generated SQL).  Distributed tier: the (user, type) count
    combiner; the iteration state is 5 authorities + n_users hubs."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = np.array([tmap[t] for t in batch["event_type"].to_pylist()],
                      np.int64)
        return pa.table(
            {
                "u": pa.array(uid),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(uid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "t"],
        [("_one", "sum", "c")],
    )
    u = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, uidx = np.unique(u, return_inverse=True)
    k = len(_MARKOV_STATES)
    a = np.full(k, _HITS_SCALE, np.int64)
    for _ in range(_HITS_ITERS):
        h = np.zeros(len(uniq), np.int64)
        np.add.at(h, uidx, c * a[t])
        h = h * _HITS_SCALE // int(h.max())
        a2 = np.zeros(k, np.int64)
        np.add.at(a2, t, c * h[uidx])
        a = a2 * _HITS_SCALE // int(a2.max())
    order = sorted(range(k), key=lambda i: (-int(a[i]), _MARKOV_STATES[i]))
    rank = [0] * k
    for r, i in enumerate(order):
        rank[i] = r + 1
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES, pa.string()),
            "auth_q": pa.array(a.tolist(), pa.int64()),
            "auth_rank": pa.array(rank, pa.int64()),
        }
    )


def _q_mst_cells(sf_dir: str) -> pa.Table:
    """Exact Prim minimum spanning tree over the top-10 event grid
    cells (by count, ties by cell id) with integer Manhattan edge
    weights: at each of the 9 steps the crossing edge with the
    smallest (d, i, j) is chosen -- a fully deterministic greedy whose
    SQL mirror unrolls the steps as ORDER-BY-LIMIT-1 CTE pairs
    carrying the visited bitmask.  Emits the edge schedule."""
    cells = _top_cells(sf_dir, 10)
    k = len(cells)
    xs = [cc % 96 for cc in cells]
    ys = [cc // 96 for cc in cells]
    in_tree = {0}
    steps, a_cells, b_cells, dist = [], [], [], []
    for step in range(1, k):
        best = None
        for i in sorted(in_tree):
            for j in range(k):
                if j in in_tree:
                    continue
                d = abs(xs[i] - xs[j]) + abs(ys[i] - ys[j])
                cand = (d, i, j)
                if best is None or cand < best:
                    best = cand
        d, i, j = best
        in_tree.add(j)
        steps.append(step)
        a_cells.append(cells[i])
        b_cells.append(cells[j])
        dist.append(d)
    return pa.table(
        {
            "step": pa.array(steps, pa.int64()),
            "a_cell": pa.array(a_cells, pa.int64()),
            "b_cell": pa.array(b_cells, pa.int64()),
            "d": pa.array(dist, pa.int64()),
        }
    )


def _q_binseg_changepoints(sf_dir: str) -> pa.Table:
    """Top-2 changepoints on the dense daily revenue series by binary
    segmentation with the EXACT quantized integer segment cost
    C(a,b) = (len*S2 - S^2) // len (the Jenks cost kernel): level 1
    picks the split minimizing (total cost, s); level 2 the
    (segment, split) with the largest exact cost drop, ties by
    smaller split.  Emits the segmentation schedule."""
    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    pre1 = [0] * (n + 1)
    pre2 = [0] * (n + 1)
    for i, y in enumerate(ys):
        pre1[i + 1] = pre1[i] + y
        pre2[i + 1] = pre2[i] + y * y

    def cost(a: int, b: int) -> int:
        ln = b - a + 1
        s = pre1[b + 1] - pre1[a]
        q = pre2[b + 1] - pre2[a]
        return (ln * q - s * s) // ln

    cfull = cost(0, n - 1)
    tot1, s1 = min(
        (cost(0, s) + cost(s + 1, n - 1), s) for s in range(0, n - 1)
    )
    cands = []
    for a, b in ((0, s1), (s1 + 1, n - 1)):
        for s in range(a, b):
            g = cost(a, b) - cost(a, s) - cost(s + 1, b)
            cands.append((-g, s, a, b))
    neg_g2, s2, a2, b2 = min(cands)
    return pa.table(
        {
            "rk": pa.array([1, 2], pa.int64()),
            "seg_a": pa.array([0, a2], pa.int64()),
            "seg_b": pa.array([n - 1, b2], pa.int64()),
            "split_t": pa.array([s1, s2], pa.int64()),
            "cost_drop": pa.array([cfull - tot1, -neg_g2], pa.int64()),
        }
    )


def _q_atkinson_index(sf_dir: str) -> pa.Table:
    """Atkinson inequality index (epsilon = 1: one minus geometric
    over arithmetic mean) of positive daily event revenue.  Each
    ln(y) is quantized at 1e9 ticks (the established log-tick
    discipline), the tick mean is a truncating integer division, so
    the index is a single pinned exp/ratio float chain over exact
    integer sums."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = np.array(
        [y for y in _daily_revenue_cents(sf_dir) if y > 0], np.int64
    )
    n = len(ys)
    s = int(ys.sum())
    lt = round_half_away(np.log(ys.astype(np.float64)) * 1e9).astype(
        np.int64
    )
    m = int(lt.sum()) // n
    atk = 1.0 - math.exp(m / 1e9) * n / s
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "total_cents": pa.array([s], pa.int64()),
            "mean_log_ticks": pa.array([m], pa.int64()),
            "atkinson": round_like_sql([atk], 6),
        }
    )


def _q_palma_ratio(sf_dir: str) -> pa.Table:
    """Palma inequality ratio of daily event revenue: sum of the top
    decile of days over the sum of the bottom four deciles, decile
    cut counts by exact integer floor ((4n)//10 lowest, above
    (9n)//10 highest) -- order-statistic sums are tie-invariant, the
    ratio is the only float."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = sorted(_daily_revenue_cents(sf_dir))
    n = len(ys)
    nb = (4 * n) // 10
    bottom = sum(ys[:nb])
    top = sum(ys[(9 * n) // 10:])
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "bottom40_cents": pa.array([bottom], pa.int64()),
            "top10_cents": pa.array([top], pa.int64()),
            "palma": round_like_sql([top / bottom], 6),
        }
    )


def _top_cells(sf_dir: str, k: int) -> list[int]:
    """Top-k event grid cells by (count DESC, cell), returned sorted by
    cell id -- the shared deterministic node set for the exact
    combinatorial queries (distributed count combiner; k rows land)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    rows = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda r: (-int(r[0]), int(r[1])),
    )[:k]
    return sorted(int(c) for _, c in rows)


def _q_proximity_graphs(sf_dir: str) -> pa.Table:
    """Gabriel and relative-neighborhood graph membership for every
    pair of the top-12 event cells, decided by EXACT integer
    squared-Euclidean certificates: Gabriel(a,b) iff no third point c
    has d2(a,c)+d2(c,b) < d2(a,b) (inside the diameter circle);
    RNG(a,b) iff no c has max(d2(a,c), d2(c,b)) < d2(a,b).  RNG is a
    subgraph of Gabriel is a subgraph of Delaunay -- no float enters
    any predicate."""
    cells = _top_cells(sf_dir, 12)
    xs = [c % 96 for c in cells]
    ys = [c // 96 for c in cells]
    k = len(cells)
    ca, cb, d2o, gab, rng = [], [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            d2 = (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2
            is_g, is_r = 1, 1
            for m in range(k):
                if m in (i, j):
                    continue
                da = (xs[i] - xs[m]) ** 2 + (ys[i] - ys[m]) ** 2
                db = (xs[j] - xs[m]) ** 2 + (ys[j] - ys[m]) ** 2
                if da + db < d2:
                    is_g = 0
                if max(da, db) < d2:
                    is_r = 0
            ca.append(cells[i])
            cb.append(cells[j])
            d2o.append(d2)
            gab.append(is_g)
            rng.append(is_r)
    return pa.table(
        {
            "a_cell": pa.array(ca, pa.int64()),
            "b_cell": pa.array(cb, pa.int64()),
            "d2": pa.array(d2o, pa.int64()),
            "is_gabriel": pa.array(gab, pa.int64()),
            "is_rng": pa.array(rng, pa.int64()),
        }
    )


def _q_min_cut_cells(sf_dir: str) -> pa.Table:
    """Exact minimum s-t cut over the top-14 event cells (s = smallest
    cell id, t = largest) on the complete graph with integer
    capacities 1000 // (1 + manhattan): all 2^12 subsets containing s
    but not t are enumerated and the crossing-capacity sum minimized
    (ties by smallest interior bitmask) -- an exact max-flow value by
    duality, with the whole certificate enumerable in SQL."""
    cells = _top_cells(sf_dir, 14)
    k = len(cells)
    xs = [c % 96 for c in cells]
    ys = [c // 96 for c in cells]
    cap = [
        [
            1000 // (1 + abs(xs[i] - xs[j]) + abs(ys[i] - ys[j]))
            for j in range(k)
        ]
        for i in range(k)
    ]
    best = None
    for m in range(1 << (k - 2)):
        inside = [True] + [bool((m >> (i - 1)) & 1) for i in range(1, k - 1)] + [False]
        cut = 0
        for i in range(k):
            for j in range(i + 1, k):
                if inside[i] != inside[j]:
                    cut += cap[i][j]
        cand = (cut, m)
        if best is None or cand < best:
            best = cand
    return pa.table(
        {
            "n_nodes": pa.array([k], pa.int64()),
            "min_cut": pa.array([best[0]], pa.int64()),
            "best_mask": pa.array([best[1]], pa.int64()),
        }
    )


_ASSIGN_PROBES = [(16, 16), (16, 80), (48, 8), (48, 48), (80, 16), (80, 80)]


def _q_assignment_min_cost(sf_dir: str) -> pa.Table:
    """Exact minimum-cost perfect assignment of the top-6 event cells
    (facilities) to six fixed probe demand sites with integer
    Manhattan costs: subset DP over demand masks (dp[i][mask] after
    assigning facilities 0..i), unrolled per facility in the SQL
    mirror -- the Hungarian-algorithm optimum without any pivoting."""
    cells = _top_cells(sf_dir, 6)
    xs = [c % 96 for c in cells]
    ys = [c // 96 for c in cells]
    k = len(cells)
    cost = [
        [abs(xs[i] - px) + abs(ys[i] - py) for px, py in _ASSIGN_PROBES]
        for i in range(k)
    ]
    inf = 1 << 60
    dp = {0: 0}
    for i in range(k):
        nxt: dict[int, int] = {}
        for mask, c0 in dp.items():
            for j in range(len(_ASSIGN_PROBES)):
                if (mask >> j) & 1:
                    continue
                nm = mask | (1 << j)
                cand = c0 + cost[i][j]
                if cand < nxt.get(nm, inf):
                    nxt[nm] = cand
        dp = nxt
    full = (1 << len(_ASSIGN_PROBES)) - 1
    return pa.table(
        {
            "n_facilities": pa.array([k], pa.int64()),
            "min_cost": pa.array([dp[full]], pa.int64()),
        }
    )


_HILBERT_N = 128  # order-7 curve covers the 96x96 grid


def _q_hilbert_cells(sf_dir: str) -> pa.Table:
    """Hilbert space-filling-curve bucketing of event grid cells:
    the order-7 xy2d walk (7 unrolled reflect/swap rounds, verified
    bijective with unit-step adjacency) runs vectorized inside
    map_batches, events are counted per d // 128 curve bucket through
    the distributed combiner -- the locality-preserving alternative to
    the Z-order key (zorder_cells) for range-partitioning at scale."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = eid % 96
        y = eid // 96 % 96
        d = np.zeros_like(x)
        s = _HILBERT_N // 2
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            swap = ry == 0
            flip = swap & (rx == 1)
            x2 = np.where(flip, _HILBERT_N - 1 - x, x)
            y2 = np.where(flip, _HILBERT_N - 1 - y, y)
            x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
            s //= 2
        return pa.table(
            {
                "bucket": pa.array(d // 128),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["bucket"],
        [("_one", "sum", "n_events")],
    )
    return agg.sort_by([("bucket", "ascending")])


def _q_randomized_response(sf_dir: str) -> pa.Table:
    """k-ary randomized-response local-DP frequency estimation over
    event types: each event reports its true type with p = 3/4, else a
    uniform type -- both decisions from the deterministic mix32 stream
    keyed by event_id -- and the debiased estimator
    n_hat = (20*obs - n) / 15 inverts the 5-ary response matrix
    exactly.  Per-type observed/true counts reduce through the
    distributed combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}
    k = len(_MARKOV_STATES)

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = np.array([tmap[t] for t in batch["event_type"].to_pylist()],
                      np.int64)
        u = mix32(eid)
        rep = np.where(u % 4 != 0, ti, (u // 4) % k)
        n_true = np.zeros(k, np.int64)
        n_obs = np.zeros(k, np.int64)
        np.add.at(n_true, ti, 1)
        np.add.at(n_obs, rep, 1)
        return pa.table(
            {
                "t": pa.array(np.arange(k, dtype=np.int64)),
                "n_true": pa.array(n_true),
                "n_obs": pa.array(n_obs),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("n_true", "sum", "n_true"), ("n_obs", "sum", "n_obs")],
    ).sort_by([("t", "ascending")])
    n = int(sum(agg["n_true"].to_pylist()))
    obs = agg["n_obs"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_hat = [float(20 * int(o) - n) / 15.0 for o in obs]
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES, pa.string()),
            "n_true": agg["n_true"],
            "n_obs": agg["n_obs"],
            "n_hat": round_like_sql(n_hat, 6),
        }
    )


def _q_cochran_q(sf_dir: str) -> pa.Table:
    """Cochran's Q test for equal success rates across the three
    8-hour day bands, subjects = (user, day), success = the subject
    has >= 1 event in the band:
    Q = (k-1)(k*sum(C_j^2) - N^2) / (k*N - sum(R_s^2)) over exact
    integer column/row totals of the presence matrix -- the only
    float is the final ratio."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        j = ts // 3_600_000_000 % 24 // 8
        return pa.table(
            {
                "u": pa.array(uid),
                "d": pa.array(day),
                "j": pa.array(j),
            }
        )

    pres = distinct(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "d", "j"],
    )
    u = pres["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = pres["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    j = pres["j"].to_numpy(zero_copy_only=False).astype(np.int64)
    c_j = np.bincount(j, minlength=3).astype(np.int64)
    _, r_s = np.unique(u * 1_000_000 + d, return_counts=True)
    n = int(c_j.sum())
    sc2 = int((c_j * c_j).sum())
    sr2 = int((r_s * r_s).sum())
    q = 2.0 * (3 * sc2 - n * n) / (3 * n - sr2)
    return pa.table(
        {
            "k_bands": pa.array([3], pa.int64()),
            "n_subjects": pa.array([len(r_s)], pa.int64()),
            "n_success": pa.array([n], pa.int64()),
            "q_stat": round_like_sql([q], 6),
        }
    )


def _q_icc_estimate(sf_dir: str) -> pa.Table:
    """One-way random-effects intraclass correlation ICC(1) of event
    value cents grouped by user, with unequal group sizes (the k0
    correction): between/within sum-of-squares are 1e3-tick integers
    built from exact per-group (n, S, Q) moments -- (S^2*1000)//n per
    group, so the mean squares and the ICC are one pinned float chain.
    Distributed tier: the per-user moment combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "u": pa.array(uid),
                "_one": pa.array(np.ones(len(uid), np.int64)),
                "y": pa.array(y),
                "y2": pa.array(y * y),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u"],
        [("_one", "sum", "n"), ("y", "sum", "s"), ("y2", "sum", "q")],
    )
    ns = [int(v) for v in agg["n"].to_pylist()]
    ss = [int(v) for v in agg["s"].to_pylist()]
    qs = [int(v) for v in agg["q"].to_pylist()]
    g = len(ns)
    nn = sum(ns)
    st = sum((s * s * 1000) // n for s, n in zip(ss, ns))
    s_all = sum(ss)
    q_all = sum(qs)
    sn2 = sum(n * n for n in ns)
    ssbq = st - (s_all * s_all * 1000) // nn
    sswq = q_all * 1000 - st
    msb = ssbq / 1000.0 / (g - 1)
    msw = sswq / 1000.0 / (nn - g)
    k0 = (nn * nn - sn2) / (nn * (g - 1))
    icc = (msb - msw) / (msb + (k0 - 1.0) * msw)
    return pa.table(
        {
            "g_groups": pa.array([g], pa.int64()),
            "n_obs": pa.array([nn], pa.int64()),
            "ssb_q": pa.array([ssbq], pa.int64()),
            "ssw_q": pa.array([sswq], pa.int64()),
            "icc": round_like_sql([icc], 6),
        }
    )


def _q_activity_selection(sf_dir: str) -> pa.Table:
    """Classic activity-selection greedy per event type: intervals
    [ts, ts + (60 + event_id % 3600) s], maximum non-overlapping count
    by the earliest-finish rule (next start >= previous end).  Each
    type's greedy runs inside ONE bucketed group kernel (the per-key
    sequential scan is the documented partitioning assumption, as in
    the track pipelines); the SQL mirror is a recursive-CTE chain of
    MIN(end) jumps -- provably the same count as greedy-by-finish."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = s + (60 + eid % 3600) * 1_000_000
        return pa.table(
            {
                "t": batch["event_type"],
                "s": pa.array(s),
                "e": pa.array(e),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        t = group["t"][0].as_py()
        s = group["s"].to_numpy(zero_copy_only=False)
        e = group["e"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, e))
        cnt = 0
        cur = -(1 << 62)
        for i in order:
            if s[i] >= cur:
                cnt += 1
                cur = int(e[i])
        return pa.table(
            {
                "event_type": pa.array([t], pa.string()),
                "n_selected": pa.array([cnt], pa.int64()),
                "n_intervals": pa.array([len(s)], pa.int64()),
            }
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    out = grouped_by_key(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "t",
        kernel,
    )
    return collect_tables(out).sort_by([("event_type", "ascending")])


def _q_fleiss_kappa(sf_dir: str) -> pa.Table:
    """Fleiss' kappa inter-rater agreement: subjects = (user, day)
    with >= 3 events, raters = the first three events by (ts,
    event_id), category = event_type.  P_bar and P_e come from exact
    integer sums (per-subject sum of squared category counts; squared
    column totals), so kappa is one pinned float chain.  The rater
    pick runs in bucketed per-subject group kernels."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}
    k = len(_MARKOV_STATES)

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = np.array([tmap[t] for t in batch["event_type"].to_pylist()],
                      np.int64)
        return pa.table(
            {
                "subj": pa.array(uid * 1_000_000 + ts // 86_400_000_000),
                "ts": pa.array(ts),
                "eid": pa.array(eid),
                "ti": pa.array(ti),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows < 3:
            return pa.table(
                {"a": pa.array([], pa.int64())}
                | {f"c{j}": pa.array([], pa.int64()) for j in range(k)}
                | {"one": pa.array([], pa.int64())}
            )
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["eid"].to_numpy(zero_copy_only=False)
        ti = group["ti"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))[:3]
        n_j = np.bincount(ti[order], minlength=k).astype(np.int64)
        row = {"a": pa.array([int((n_j * n_j).sum())], pa.int64())}
        for j in range(k):
            row[f"c{j}"] = pa.array([int(n_j[j])], pa.int64())
        row["one"] = pa.array([1], pa.int64())
        return pa.table(row)

    per_subj = grouped_by_key(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "subj",
        kernel,
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_k", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    agg = hash_aggregate(
        per_subj.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["_k"],
        [("a", "sum", "a"), ("one", "sum", "nsub")]
        + [(f"c{j}", "sum", f"c{j}") for j in range(k)],
    )
    a = int(agg["a"][0].as_py())
    nsub = int(agg["nsub"][0].as_py())
    sc2 = sum(int(agg[f"c{j}"][0].as_py()) ** 2 for j in range(k))
    pb = (a - 3 * nsub) / (6 * nsub)
    pe = sc2 / (nsub * 3) / (nsub * 3)
    kappa = (pb - pe) / (1 - pe)
    return pa.table(
        {
            "n_subjects": pa.array([nsub], pa.int64()),
            "m_raters": pa.array([3], pa.int64()),
            "a_sum": pa.array([a], pa.int64()),
            "c_sq_sum": pa.array([sc2], pa.int64()),
            "p_bar": round_like_sql([pb], 6),
            "p_e": round_like_sql([pe], 6),
            "kappa": round_like_sql([kappa], 6),
        }
    )


_SHAPLEY_CHANNELS = [("click", 1), ("view", 2), ("signup", 4)]


def _q_shapley_attribution(sf_dir: str) -> pa.Table:
    """Exact Shapley-value conversion attribution over the three
    touch channels (click / view / signup), conversion = the user has
    a purchase event: v(S) = converted users whose touched-channel
    mask is a subset of S, phi_i enumerated over all 2^3 coalitions
    with the exact weights x6 (2,1,1,2) -- every phi*6 is an integer.
    Distributed tier: the per-user flag combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_pylist()
        return pa.table(
            {
                "u": pa.array(uid),
                "c": pa.array(
                    np.array([1 if t == "click" else 0 for t in et], np.int64)
                ),
                "v": pa.array(
                    np.array([1 if t == "view" else 0 for t in et], np.int64)
                ),
                "s": pa.array(
                    np.array([1 if t == "signup" else 0 for t in et], np.int64)
                ),
                "p": pa.array(
                    np.array(
                        [1 if t == "purchase" else 0 for t in et], np.int64
                    )
                ),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u"],
        [("c", "max", "c"), ("v", "max", "v"), ("s", "max", "s"),
         ("p", "max", "p")],
    )
    import pyarrow.compute as pc

    conv = agg.filter(pc.equal(agg["p"], 1))
    mask = (
        conv["c"].to_numpy(zero_copy_only=False)
        + 2 * conv["v"].to_numpy(zero_copy_only=False)
        + 4 * conv["s"].to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    cnt = np.bincount(mask, minlength=8).astype(np.int64)
    v = [
        int(sum(cnt[m] for m in range(8) if (m & ~S & 7) == 0))
        for S in range(8)
    ]
    w6 = {0: 2, 1: 1, 2: 2}
    names, phi6s, phis = [], [], []
    for name, bit in _SHAPLEY_CHANNELS:
        phi6 = sum(
            w6[bin(S).count("1")] * (v[S | bit] - v[S])
            for S in range(8)
            if S & bit == 0
        )
        names.append(name)
        phi6s.append(phi6)
        phis.append(phi6 / 6.0)
    order = sorted(range(3), key=lambda i: names[i])
    return pa.table(
        {
            "channel": pa.array([names[i] for i in order], pa.string()),
            "phi_x6": pa.array([phi6s[i] for i in order], pa.int64()),
            "phi": round_like_sql([phis[i] for i in order], 6),
        }
    )


_KRIG_PROBES = [(20, 20), (20, 76), (76, 20), (50, 50)]


def _det4(m: list[list[int]]) -> int:
    """Exact 4x4 integer determinant by permutation expansion."""
    from itertools import permutations

    total = 0
    for perm in permutations(range(4)):
        sign = 1
        for i in range(4):
            for j in range(i + 1, 4):
                if perm[i] > perm[j]:
                    sign = -sign
        prod = 1
        for i in range(4):
            prod *= m[i][perm[i]]
        total += sign * prod
    return total


def _q_kriging_probes(sf_dir: str) -> pa.Table:
    """Ordinary kriging of cell event counts at four probe sites with
    the 3 nearest top-8 sample cells and the integer LINEAR variogram
    gamma(h) = manhattan(h): the 4x4 kriging system (3 weights + the
    Lagrange multiplier) is solved by EXACT integer Cramer
    determinants, so the estimate is a single num/den ratio of exact
    ints (both < 2^53) -- geostatistical interpolation with zero float
    drift.  Neighbor ranking ties break by cell id."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    rows = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda r: (-int(r[0]), int(r[1])),
    )[:8]
    samples = sorted((int(c), int(n)) for n, c in rows)
    pts = [(c % 96, c // 96, z) for c, z in samples]

    def manh(ax, ay, bx, by):
        return abs(ax - bx) + abs(ay - by)

    p_out, px_out, py_out, num_out, den_out, est_out = [], [], [], [], [], []
    for p, (px, py) in enumerate(_KRIG_PROBES):
        nb = sorted(
            pts, key=lambda t: (manh(t[0], t[1], px, py), t[0] + t[1] * 96)
        )[:3]
        g = [[manh(a[0], a[1], b[0], b[1]) for b in nb] for a in nb]
        gp = [manh(a[0], a[1], px, py) for a in nb]
        A = [
            [g[0][0], g[0][1], g[0][2], 1],
            [g[1][0], g[1][1], g[1][2], 1],
            [g[2][0], g[2][1], g[2][2], 1],
            [1, 1, 1, 0],
        ]
        b = [gp[0], gp[1], gp[2], 1]
        den = _det4(A)
        num = 0
        for i in range(3):
            Ai = [row[:] for row in A]
            for r in range(4):
                Ai[r][i] = b[r]
            num += nb[i][2] * _det4(Ai)
        p_out.append(p)
        px_out.append(px)
        py_out.append(py)
        num_out.append(num)
        den_out.append(den)
        est_out.append(num / den)
    return pa.table(
        {
            "probe": pa.array(p_out, pa.int64()),
            "px": pa.array(px_out, pa.int64()),
            "py": pa.array(py_out, pa.int64()),
            "est_num": pa.array(num_out, pa.int64()),
            "est_den": pa.array(den_out, pa.int64()),
            "estimate": round_like_sql(est_out, 6),
        }
    )


_RANSAC_CANDS = 50


def _q_ransac_line(sf_dir: str) -> pa.Table:
    """Deterministic RANSAC line fit on the dense daily revenue
    series: 50 candidate lines through mix32-sampled day pairs, the
    inlier test |(y-y1)(t2-t1) - (t-t1)(y2-y1)| <= thr * |t2-t1| with
    thr = (max-min revenue)//20 -- an exact integer cross-
    multiplication predicate, no float residual.  Winner by
    (inliers DESC, candidate); the slope ratio is the only float."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    thr = (max(ys) - min(ys)) // 20
    cand = np.arange(_RANSAC_CANDS, dtype=np.int64)
    i1 = mix32(cand) % n
    i2 = mix32(cand + 1000) % n
    best = None
    for c in range(_RANSAC_CANDS):
        a, b = int(i1[c]), int(i2[c])
        if a == b:
            continue
        y1, y2 = ys[a], ys[b]
        dt = b - a
        inl = sum(
            1
            for t in range(n)
            if abs((ys[t] - y1) * dt - (t - a) * (y2 - y1))
            <= thr * abs(dt)
        )
        key = (-inl, c)
        if best is None or key < best[0]:
            best = (key, c, a, b, inl, (y2 - y1) / dt)
    _, c, a, b, inl, slope = best
    return pa.table(
        {
            "cand": pa.array([c], pa.int64()),
            "t1": pa.array([a], pa.int64()),
            "t2": pa.array([b], pa.int64()),
            "n_inliers": pa.array([inl], pa.int64()),
            "slope": round_like_sql([slope], 6),
        }
    )


def _q_k_medoids_2(sf_dir: str) -> pa.Table:
    """Exact 2-medoid clustering of the top-8 event cells under
    Manhattan distance: all 28 medoid pairs enumerated, cost = sum of
    each cell's distance to its nearest medoid (pure integers), the
    argmin pair reported with ties by (cost, m1, m2)."""
    cells = _top_cells(sf_dir, 8)
    xs = [c % 96 for c in cells]
    ys = [c // 96 for c in cells]
    k = len(cells)
    best = None
    for i in range(k):
        for j in range(i + 1, k):
            cost = sum(
                min(
                    abs(xs[m] - xs[i]) + abs(ys[m] - ys[i]),
                    abs(xs[m] - xs[j]) + abs(ys[m] - ys[j]),
                )
                for m in range(k)
            )
            key = (cost, cells[i], cells[j])
            if best is None or key < best:
                best = key
    return pa.table(
        {
            "m1_cell": pa.array([best[1]], pa.int64()),
            "m2_cell": pa.array([best[2]], pa.int64()),
            "total_cost": pa.array([best[0]], pa.int64()),
        }
    )


_BH_PERMS = 100


def _one_vs_rest_perm_pnums(sf_dir: str) -> list[int]:
    """Shared permutation machinery of the multiple-testing operators
    (bh_fdr / holm_adjust): per event type the one-vs-rest mean-cents
    permutation count p_num = 1 + #{perm : |stat| >= |observed|} over
    100 mix32 relabelings -- the p-value stays the RATIONAL
    p_num / 101."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}
    k = len(_MARKOV_STATES)

    def partials(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = np.array([tmap[t] for t in batch["event_type"].to_pylist()],
                      np.int64)
        y = scaled_int(batch["value"], 100.0)
        n = len(eid)
        t_col, p_col, n1_col, s1_col = [], [], [], []
        for t in range(k):
            # p = -1 row: the observed one-vs-rest labelling
            lab = (ti == t).astype(np.int64)
            t_col.append(t)
            p_col.append(-1)
            n1_col.append(int(lab.sum()))
            s1_col.append(int((lab * y).sum()))
            for p in range(_BH_PERMS):
                plab = (mix32(eid, seed=t * 1009 + p) % 5 == 0).astype(
                    np.int64
                )
                t_col.append(t)
                p_col.append(p)
                n1_col.append(int(plab.sum()))
                s1_col.append(int((plab * y).sum()))
        return pa.table(
            {
                "t": pa.array(t_col, pa.int64()),
                "p": pa.array(p_col, pa.int64()),
                "n1": pa.array(n1_col, pa.int64()),
                "s1": pa.array(s1_col, pa.int64()),
                "n": pa.array([n] * len(t_col), pa.int64()),
                "s": pa.array([int(y.sum())] * len(t_col), pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["t", "p"],
        [("n1", "sum", "n1"), ("s1", "sum", "s1"), ("n", "sum", "n"),
         ("s", "sum", "s")],
    )
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    pv = agg["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n1 = agg["n1"].to_numpy(zero_copy_only=False).astype(np.int64)
    s1 = agg["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = agg["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    stat = s1.astype(np.float64) / n1 - (s - s1).astype(np.float64) / (
        n - n1
    )
    e = np.zeros(k, np.int64)
    obs = np.zeros(k, np.float64)
    for i in range(len(tv)):
        if pv[i] == -1:
            obs[tv[i]] = stat[i]
    for i in range(len(tv)):
        if pv[i] >= 0 and abs(stat[i]) >= abs(obs[tv[i]]):
            e[tv[i]] += 1
    return [int(1 + e[t]) for t in range(k)]


def _q_bh_fdr_perm(sf_dir: str) -> pa.Table:
    """Benjamini-Hochberg FDR over five one-vs-rest permutation tests
    (each event type's mean value cents vs the rest, 100 mix32
    binomial relabelings per type, the established permutation
    discipline): p = (1+extreme)/101 stays a RATIONAL and the BH
    step-up rule 100*(1+e) <= 101*k is a pure integer predicate --
    multiple-testing control with no float in any decision."""
    k = len(_MARKOV_STATES)
    p_num = _one_vs_rest_perm_pnums(sf_dir)
    order = sorted(range(k), key=lambda t: (p_num[t], _MARKOV_STATES[t]))
    rank = [0] * k
    for r, t in enumerate(order):
        rank[t] = r + 1
    k_max = 0
    for r, t in enumerate(order):
        if 100 * p_num[t] <= 101 * (r + 1):
            k_max = r + 1
    reject = [1 if rank[t] <= k_max else 0 for t in range(k)]
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES, pa.string()),
            "p_num": pa.array(p_num, pa.int64()),
            "p_rank": pa.array(rank, pa.int64()),
            "reject": pa.array(reject, pa.int64()),
        }
    )


def _q_kemeny_ranking(sf_dir: str) -> pa.Table:
    """Exact Kemeny-Young consensus ranking of the five event types
    from daily count ballots: P[b][a] = days on which b strictly
    out-counts a, the Kemeny cost of each of the 120 permutations is
    an exact integer pairwise-disagreement sum, and the argmin perm
    (ties by ranking string) is enumerated outright."""
    from itertools import permutations

    pref = _daily_pref_matrix(sf_dir)
    k = len(_MARKOV_STATES)
    best = None
    for perm in permutations(range(k)):
        cost = 0
        for i in range(k):
            for j in range(i + 1, k):
                cost += int(pref[perm[j], perm[i]])
        rstr = ">".join(_MARKOV_STATES[t] for t in perm)
        key = (cost, rstr)
        if best is None or key < best:
            best = key
    return pa.table(
        {
            "ranking": pa.array([best[1]], pa.string()),
            "kemeny_cost": pa.array([best[0]], pa.int64()),
        }
    )


def _q_ad_twosample(sf_dir: str) -> pa.Table:
    """Two-sample Anderson-Darling statistic (Pettitt) between click
    and error event value cents: pooled order by (value, sample tag,
    event_id), every term ((N*M_k - n*k)^2 * 1e6) // (k*(N-k)) an
    exact quantized integer, so A2 = sum / 1e6 / n / m is one pinned
    float chain -- tail-sensitive distribution comparison with a
    deterministic tie convention."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        keep = np.array([t in ("click", "error") for t in et], bool)
        tag = np.array([0 if t == "click" else 1 for t in et], np.int64)[
            keep
        ]
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        y = scaled_int(batch["value"], 100.0)[keep]
        return pa.table(
            {
                "y": pa.array(y),
                "tag": pa.array(tag),
                "eid": pa.array(eid),
            }
        )

    tbl = collect_tables(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    )
    y = tbl["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    tag = tbl["tag"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = tbl["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, tag, y))
    tag_s = tag[order]
    big_n = len(y)
    n = int((tag == 0).sum())
    m = big_n - n
    m_k = np.cumsum(tag_s == 0).astype(np.int64)
    ad_q = 0
    for kk in range(1, big_n):
        num = (big_n * int(m_k[kk - 1]) - n * kk) ** 2 * 1_000_000
        ad_q += num // (kk * (big_n - kk))
    a2 = ad_q / 1e6 / n / m
    return pa.table(
        {
            "n_click": pa.array([n], pa.int64()),
            "n_error": pa.array([m], pa.int64()),
            "ad_q": pa.array([ad_q], pa.int64()),
            "a2": round_like_sql([a2], 6),
        }
    )


_MP_PATTERNS = ["table", "scan", "hash", "row", "fast"]


def _q_multi_pattern_counts(sf_dir: str) -> pa.Table:
    """Multi-pattern substring scan over the document corpus: total
    occurrence count and containing-document count for each fixed
    pattern, via the vectorized Arrow count_substring kernel inside
    map_batches (one pass, all patterns) and the distributed count
    combiner -- the Aho-Corasick-shaped content-scan primitive."""
    import pyarrow.compute as pc

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def scan(batch: pa.Table) -> pa.Table:
        pats, occs, docs = [], [], []
        for p in _MP_PATTERNS:
            c = pc.count_substring(batch["text"], p).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            pats.append(p)
            occs.append(int(c.sum()))
            docs.append(int((c > 0).sum()))
        return pa.table(
            {
                "pattern": pa.array(pats, pa.string()),
                "n_occur": pa.array(occs, pa.int64()),
                "n_docs": pa.array(docs, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(scan, batch_format="pyarrow", batch_size=None),
        ["pattern"],
        [("n_occur", "sum", "n_occur"), ("n_docs", "sum", "n_docs")],
    )
    return agg.sort_by([("pattern", "ascending")])


def _q_deming_fit(sf_dir: str) -> pa.Table:
    """Deming (errors-in-both-variables, delta = 1) regression of
    event value cents on hour-of-day: all second moments are exact
    integer sums (Python big ints / SQL HUGEINT -- n*syy exceeds
    int64), the slope is the single pinned float chain
    (Syy - Sxx + sqrt((Syy-Sxx)^2 + 4*Sxy^2)) / (2*Sxy)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        x = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "_k": pa.array(np.zeros(len(x), np.int64)),
                "one": pa.array(np.ones(len(x), np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
                "xx": pa.array(x * x),
                "yy": pa.array(y * y),
                "xy": pa.array(x * y),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["_k"],
        [("one", "sum", "n"), ("x", "sum", "sx"), ("y", "sum", "sy"),
         ("xx", "sum", "sxx"), ("yy", "sum", "syy"),
         ("xy", "sum", "sxy")],
    )
    import math

    n = int(agg["n"][0].as_py())
    sx = int(agg["sx"][0].as_py())
    sy = int(agg["sy"][0].as_py())
    sxx = int(agg["sxx"][0].as_py())
    syy = int(agg["syy"][0].as_py())
    sxy = int(agg["sxy"][0].as_py())
    cxx = n * sxx - sx * sx
    cyy = n * syy - sy * sy
    cxy = n * sxy - sx * sy
    dd = cyy - cxx
    disc = math.sqrt(float(dd) * float(dd) + 4.0 * float(cxy) * float(cxy))
    slope = (float(dd) + disc) / (2.0 * float(cxy))
    intercept = (float(sy) - slope * float(sx)) / n
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "slope": round_like_sql([slope], 6),
            "intercept": round_like_sql([intercept], 6),
        }
    )


_BOOT_REPS = 200


def _q_bootstrap_ci_daily(sf_dir: str) -> pa.Table:
    """Deterministic bootstrap 95% CI for the daily-revenue mean: 200
    replicates resample the dense day series with mix32(b*1000 + i)
    indices, each replicate total is an EXACT integer sum, and the CI
    bounds are order statistics of the sorted totals at the exact
    integer ranks (25*(B-1))//1000 and (975*(B-1))//1000 -- the only
    floats are the two reported means."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = np.array(_daily_revenue_cents(sf_dir), np.int64)
    n = len(ys)
    sums = []
    for b in range(_BOOT_REPS):
        idx = mix32(np.arange(n, dtype=np.int64) + b * 1000) % n
        sums.append(int(ys[idx].sum()))
    sums.sort()
    lo_i = (25 * (_BOOT_REPS - 1)) // 1000
    hi_i = (975 * (_BOOT_REPS - 1)) // 1000
    lo_s, hi_s = sums[lo_i], sums[hi_i]
    return pa.table(
        {
            "n_boot": pa.array([_BOOT_REPS], pa.int64()),
            "n_days": pa.array([n], pa.int64()),
            "lo_sum": pa.array([lo_s], pa.int64()),
            "hi_sum": pa.array([hi_s], pa.int64()),
            "lo_mean": round_like_sql([lo_s / n], 6),
            "hi_mean": round_like_sql([hi_s / n], 6),
        }
    )


def _q_luhn_check(sf_dir: str) -> pa.Table:
    """Luhn checksum audit of event ids per type (the classic id-
    integrity screen): digits at odd positions from the right are
    doubled with the >9 fold, validity = checksum % 10 == 0.  The
    12-term digit expansion is leading-zero safe (doubling 0 is 0),
    fully vectorized, and reduces through the distributed combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = np.zeros_like(eid)
        for i in range(12):
            d = eid // (10 ** i) % 10
            if i % 2 == 1:
                dd = 2 * d
                dd = np.where(dd > 9, dd - 9, dd)
                total += dd
            else:
                total += d
        valid = (total % 10 == 0).astype(np.int64)
        return pa.table(
            {
                "t": batch["event_type"],
                "valid": pa.array(valid),
                "one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("valid", "sum", "n_valid"), ("one", "sum", "n_total")],
    ).sort_by([("t", "ascending")])
    nv = agg["n_valid"].to_numpy(zero_copy_only=False).astype(np.int64)
    nt = agg["n_total"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "event_type": agg["t"],
            "n_valid": agg["n_valid"],
            "n_total": agg["n_total"],
            "valid_rate": round_like_sql(
                [float(a) / float(b) for a, b in zip(nv, nt)], 6
            ),
        }
    )


def _q_tukey_hsd(sf_dir: str) -> pa.Table:
    """Tukey-Kramer HSD table over the five event types (value
    cents): within-group SS as 1e3-tick integers from exact per-group
    moments, every pairwise mean difference / studentized q / Cohen's
    d a pinned float chain over those integers -- the post-hoc
    companion to anova_eta2."""
    import math

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
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "t": batch["event_type"],
                "one": pa.array(np.ones(len(y), np.int64)),
                "y": pa.array(y),
                "y2": pa.array(y * y),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("one", "sum", "n"), ("y", "sum", "s"), ("y2", "sum", "q")],
    ).sort_by([("t", "ascending")])
    ts = agg["t"].to_pylist()
    ns = [int(v) for v in agg["n"].to_pylist()]
    ss = [int(v) for v in agg["s"].to_pylist()]
    qs = [int(v) for v in agg["q"].to_pylist()]
    k = len(ts)
    nn = sum(ns)
    swq = sum((s * s * 1000) // n for s, n in zip(ss, ns))
    ssw_q = sum(qs) * 1000 - swq
    mse = ssw_q / 1000.0 / (nn - k)
    t1o, t2o, diffs, qstats, cohds = [], [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            diff = ss[i] / ns[i] - ss[j] / ns[j]
            qst = diff / math.sqrt(
                mse / 2.0 * (1.0 / ns[i] + 1.0 / ns[j])
            )
            t1o.append(ts[i])
            t2o.append(ts[j])
            diffs.append(diff)
            qstats.append(qst)
            cohds.append(diff / math.sqrt(mse))
    return pa.table(
        {
            "t1": pa.array(t1o, pa.string()),
            "t2": pa.array(t2o, pa.string()),
            "mean_diff": round_like_sql(diffs, 6),
            "q_stat": round_like_sql(qstats, 6),
            "cohen_d": round_like_sql(cohds, 6),
        }
    )


def _q_ohlc_daily(sf_dir: str) -> pa.Table:
    """Daily OHLC bars of event value cents (open/close by the
    deterministic (ts, event_id) order, exact integer high/low/total)
    plus the record-high flag on the running maximum of daily totals
    -- the time-bar primitive.  Per-day kernels run in bucketed
    groups; the record scan is over the tiny day table."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "d": pa.array(ts // 86_400_000_000),
                "ts": pa.array(ts),
                "eid": pa.array(eid),
                "y": pa.array(y),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        d = int(group["d"][0].as_py())
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["eid"].to_numpy(zero_copy_only=False)
        y = group["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        return pa.table(
            {
                "d": pa.array([d], pa.int64()),
                "open": pa.array([int(y[order[0]])], pa.int64()),
                "high": pa.array([int(y.max())], pa.int64()),
                "low": pa.array([int(y.min())], pa.int64()),
                "close": pa.array([int(y[order[-1]])], pa.int64()),
                "total": pa.array([int(y.sum())], pa.int64()),
                "n_events": pa.array([len(y)], pa.int64()),
            }
        )

    bars = collect_tables(
        grouped_by_key(
            ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
            "d",
            kernel,
        )
    ).sort_by([("d", "ascending")])
    totals = bars["total"].to_numpy(zero_copy_only=False).astype(np.int64)
    rec = []
    run_max = None
    for t in totals.tolist():
        rec.append(1 if run_max is None or t > run_max else 0)
        run_max = t if run_max is None else max(run_max, t)
    d0 = int(bars["d"][0].as_py())
    return pa.table(
        {
            "t": pa.array(
                [int(v) - d0 for v in bars["d"].to_pylist()], pa.int64()
            ),
            "open": bars["open"],
            "high": bars["high"],
            "low": bars["low"],
            "close": bars["close"],
            "total": bars["total"],
            "n_events": bars["n_events"],
            "is_record": pa.array(rec, pa.int64()),
        }
    )


def _detn(m: list[list[int]]) -> int:
    """Exact nxn integer determinant by permutation expansion."""
    from itertools import permutations

    n = len(m)
    total = 0
    for perm in permutations(range(n)):
        sign = 1
        for i in range(n):
            for j in range(i + 1, n):
                if perm[i] > perm[j]:
                    sign = -sign
        prod = 1
        for i in range(n):
            prod *= m[i][perm[i]]
        total += sign * prod
    return total


def _daily_pref_matrix(sf_dir: str) -> np.ndarray:
    """Pairwise daily-count preference matrix P[a][b] = days on which
    type a strictly out-counts type b (the Kemeny/Colley ballot
    reduction; distributed daily-count combiner)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}
    k = len(_MARKOV_STATES)

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        ti = np.array([tmap[t] for t in batch["event_type"].to_pylist()],
                      np.int64)
        return pa.table(
            {
                "d": pa.array(day),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["d", "t"],
        [("_one", "sum", "c")],
    )
    dv = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    days = np.unique(dv)
    didx = {int(d): i for i, d in enumerate(days)}
    mat = np.zeros((len(days), k), np.int64)
    for i in range(len(dv)):
        mat[didx[int(dv[i])], tv[i]] = cv[i]
    pref = np.zeros((k, k), np.int64)
    for a in range(k):
        for b in range(k):
            if a != b:
                pref[a, b] = int((mat[:, a] > mat[:, b]).sum())
    return pref


def _q_colley_rating(sf_dir: str) -> pa.Table:
    """Colley-matrix rating of the five event types from daily
    pairwise count comparisons (wins = days strictly out-counting):
    the 5x5 Colley system (2I + diag(games) - G) r = 1 + (w-l)/2 is
    solved by EXACT integer Cramer determinants (2b integerized), so
    every rating is a pinned num/den ratio of exact ints."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    pref = _daily_pref_matrix(sf_dir)
    k = len(_MARKOV_STATES)
    g = pref + pref.T
    t_i = g.sum(axis=1)
    w_i = pref.sum(axis=1)
    l_i = pref.sum(axis=0)
    C = [
        [
            int(2 + t_i[i]) if i == j else -int(g[i, j])
            for j in range(k)
        ]
        for i in range(k)
    ]
    bb = [int(2 + w_i[i] - l_i[i]) for i in range(k)]
    den = 2 * _detn(C)
    nums, ratings = [], []
    for i in range(k):
        Ci = [row[:] for row in C]
        for r in range(k):
            Ci[r][i] = bb[r]
        num = _detn(Ci)
        nums.append(num)
        ratings.append(num / den)
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES, pa.string()),
            "wins": pa.array([int(v) for v in w_i], pa.int64()),
            "losses": pa.array([int(v) for v in l_i], pa.int64()),
            "r_num": pa.array(nums, pa.int64()),
            "r_den": pa.array([den] * k, pa.int64()),
            "rating": round_like_sql(ratings, 6),
        }
    )


_HEAT_STEPS = 5


def _q_heat_diffusion(sf_dir: str) -> pa.Table:
    """Five steps of integer heat diffusion on the 96x96 event-count
    grid, u' = (4u + up + down + left + right) // 8 with absorbing
    borders -- all operands nonnegative so floor and truncation agree
    in Python and SQL.  Emits the top-10 cells after diffusion by
    (value DESC, cell)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    u = np.zeros((96, 96), np.int64)
    cells = agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    u[cells // 96, cells % 96] = ns  # [y, x]
    for _ in range(_HEAT_STEPS):
        up = np.zeros_like(u)
        dn = np.zeros_like(u)
        lf = np.zeros_like(u)
        rt = np.zeros_like(u)
        up[1:, :] = u[:-1, :]
        dn[:-1, :] = u[1:, :]
        lf[:, 1:] = u[:, :-1]
        rt[:, :-1] = u[:, 1:]
        u = (4 * u + up + dn + lf + rt) // 8
    flat = u.reshape(-1)  # index = y * 96 + x = cell
    order = sorted(range(96 * 96), key=lambda c: (-int(flat[c]), c))[:10]
    return pa.table(
        {
            "cell": pa.array(order, pa.int64()),
            "value": pa.array([int(flat[c]) for c in order], pa.int64()),
        }
    )


def _q_markov_loglik(sf_dir: str) -> pa.Table:
    """Log-likelihood of the observed per-user event-type streams
    under the fitted first-order Markov chain: each transition's
    ln P(j|i) = ln(n_ij / n_i.) is quantized at 1e9 ticks, the total
    is the exact integer sum n_ij * ticks_ij over the 25-cell
    transition matrix, and avg NLL / perplexity are pinned float
    chains -- the sequence-model scoring primitive."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        markov_transitions, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    out = markov_transitions(ds, "user_id", "event_type", ["ts", "event_id"])
    src = out["src"].to_pylist()
    n = out["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    row_tot: dict[str, int] = {}
    for s, c in zip(src, n.tolist()):
        row_tot[s] = row_tot.get(s, 0) + int(c)
    ticks = 0
    total = 0
    for s, c in zip(src, n.tolist()):
        lp = round_half_away(
            np.array([math.log(c / row_tot[s])]) * 1e9
        ).astype(np.int64)
        ticks += int(c) * int(lp[0])
        total += int(c)
    avg_nll = -(ticks / 1e9) / total
    return pa.table(
        {
            "n_transitions": pa.array([total], pa.int64()),
            "loglik_ticks": pa.array([ticks], pa.int64()),
            "avg_nll": round_like_sql([avg_nll], 6),
            "perplexity": round_like_sql([math.exp(avg_nll)], 6),
        }
    )


def _q_yules_k(sf_dir: str) -> pa.Table:
    """Yule's K lexical-repetitiveness characteristic over the corpus
    token stream: K = 1e4 * (sum(c_w^2) - N) / N^2 from the exact
    distributed token-frequency table -- one pinned float over two
    exact integers."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def batch_tokens(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_d", pa.array(np.zeros(batch.num_rows, np.int64))
        )
        t = _explode_tokens(batch, "text", "_d").select(["token"])
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))
        )

    freq = hash_aggregate(
        ds.map_batches(batch_tokens, batch_format="pyarrow",
                       batch_size=None),
        ["token"],
        [("one", "sum", "c")],
    )
    c = freq["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(c.sum())
    sc2 = int((c * c).sum())
    k_stat = 1e4 * (sc2 - n) / (float(n) * float(n))
    return pa.table(
        {
            "n_tokens": pa.array([n], pa.int64()),
            "vocab": pa.array([len(c)], pa.int64()),
            "sum_c2": pa.array([sc2], pa.int64()),
            "yules_k": round_like_sql([k_stat], 6),
        }
    )


def _q_juilland_d(sf_dir: str) -> pa.Table:
    """Juilland's dispersion D for the five probe tokens: per-doc
    relative frequencies quantized at 1e9 ticks ((c*1e9)//len over
    ALL docs), D = 1 - CV/sqrt(n-1) with CV from the exact integer
    tick moments -- the corpus-dispersion companion to the raw
    multi-pattern counts."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    pats = set(_MP_PATTERNS)

    def prep(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, "text", "doc_id")
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = t["token"].to_pylist()
        rows_d, rows_p, rows_c, rows_l = [], [], [], []
        uniq, inv = np.unique(did, return_inverse=True)
        lens = np.bincount(inv).astype(np.int64)
        for p in sorted(pats):
            hit = np.array([tok == p for tok in toks], bool)
            cs = np.bincount(inv[hit], minlength=len(uniq)).astype(
                np.int64
            )
            rows_d.extend(int(u) for u in uniq)
            rows_p.extend([p] * len(uniq))
            rows_c.extend(int(v) for v in cs)
            rows_l.extend(int(v) for v in lens)
        return pa.table(
            {
                "doc": pa.array(rows_d, pa.int64()),
                "p": pa.array(rows_p, pa.string()),
                "c": pa.array(rows_c, pa.int64()),
                "len": pa.array(rows_l, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["doc", "p"],
        [("c", "sum", "c"), ("len", "sum", "len")],
    )
    pv = agg["p"].to_pylist()
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    lv = agg["len"].to_numpy(zero_copy_only=False).astype(np.int64)
    out_p, out_nw, out_tc, out_d = [], [], [], []
    for p in sorted(pats):
        sel = [i for i in range(len(pv)) if pv[i] == p]
        q = [(int(cv[i]) * 1_000_000_000) // int(lv[i]) for i in sel]
        n = len(q)
        s = sum(q)
        sq2 = sum(v * v for v in q)
        v = n * sq2 - s * s
        d = 1.0 - math.sqrt(float(v)) / s / math.sqrt(n - 1)
        out_p.append(p)
        out_nw.append(sum(1 for i in sel if cv[i] > 0))
        out_tc.append(sum(int(cv[i]) for i in sel))
        out_d.append(d)
    return pa.table(
        {
            "pattern": pa.array(out_p, pa.string()),
            "n_docs_with": pa.array(out_nw, pa.int64()),
            "total_count": pa.array(out_tc, pa.int64()),
            "juilland_d": round_like_sql(out_d, 6),
        }
    )


_MANTEL_PERMS = 200


def _q_mantel_test(sf_dir: str) -> pa.Table:
    """Mantel permutation test between the spatial distance matrix and
    the count-difference matrix of the top-20 event cells: the cross-
    product statistic is an exact integer, 200 deterministic label
    permutations are built by ranking the mix32 stream (rank ties by
    node index), and the one-sided p-value stays rational."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    rows = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda r: (-int(r[0]), int(r[1])),
    )[:20]
    nodes = sorted((int(cc), int(nn)) for nn, cc in rows)
    k = len(nodes)
    xs = np.array([c % 96 for c, _ in nodes], np.int64)
    ys = np.array([c // 96 for c, _ in nodes], np.int64)
    zs = np.array([n for _, n in nodes], np.int64)
    X = np.abs(xs[:, None] - xs[None, :]) + np.abs(ys[:, None] - ys[None, :])
    Y = np.abs(zs[:, None] - zs[None, :])
    iu = np.triu_indices(k, 1)
    z_obs = int((X[iu] * Y[iu]).sum())
    extreme = 0
    idx = np.arange(k, dtype=np.int64)
    for p in range(_MANTEL_PERMS):
        u = mix32(idx + p * 1000)
        order = np.lexsort((idx, u))
        pos = np.empty(k, np.int64)
        pos[order] = np.arange(k)
        Yp = Y[pos[:, None], pos[None, :]]
        zp = int((X[iu] * Yp[iu]).sum())
        if zp >= z_obs:
            extreme += 1
    return pa.table(
        {
            "z_obs": pa.array([z_obs], pa.int64()),
            "n_perms": pa.array([_MANTEL_PERMS], pa.int64()),
            "n_extreme": pa.array([extreme], pa.int64()),
            "p_value": round_like_sql(
                [(1 + extreme) / (_MANTEL_PERMS + 1)], 6
            ),
        }
    )


def _q_ulcer_index(sf_dir: str) -> pa.Table:
    """Ulcer index of the daily revenue series: drawdown from the
    running peak quantized at 1e6 ticks ((peak-y)*1e6)//peak, the
    index = sqrt(mean(dd^2))/1e6 -- downside-risk measurement with
    exact integer drawdowns."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    peak = None
    ddq = []
    for y in ys:
        peak = y if peak is None else max(peak, y)
        ddq.append(((peak - y) * 1_000_000) // peak)
    sq = sum(v * v for v in ddq)
    ulcer = math.sqrt(sq / n) / 1e6
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "max_ddq": pa.array([max(ddq)], pa.int64()),
            "ulcer": round_like_sql([ulcer], 6),
        }
    )


_BLOOM_BITS = 8192
_BLOOM_PROBES = 2000


def _q_bloom_fpr(sf_dir: str) -> pa.Table:
    """Bloom-filter false-positive-rate audit: distinct user ids
    hashed into 8192 bits with three mix32 hash functions, then 2000
    guaranteed-absent probe keys (offset 10M) tested -- every bit
    position and membership decision is exact integer arithmetic, so
    the measured FPR is deterministic and SQL-checkable end to end
    (the filter itself is the broadcast-set primitive the Bloom
    semi-join pushdown uses)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"),
                  columns=["user_id"])
    keys_t = distinct(ds, ["user_id"])
    keys = keys_t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bits = set()
    for i in range(3):
        bits.update(
            (mix32(keys, seed=i * 7777) % _BLOOM_BITS).tolist()
        )
    probes = np.arange(_BLOOM_PROBES, dtype=np.int64) + 10_000_000
    bits_arr = np.array(sorted(bits), np.int64)
    hit = np.ones(_BLOOM_PROBES, bool)
    for i in range(3):
        pos = mix32(probes, seed=i * 7777) % _BLOOM_BITS
        hit &= np.isin(pos, bits_arr)
    n_fp = int(hit.sum())
    return pa.table(
        {
            "n_keys": pa.array([len(keys)], pa.int64()),
            "n_bits_set": pa.array([len(bits)], pa.int64()),
            "n_probes": pa.array([_BLOOM_PROBES], pa.int64()),
            "n_fp": pa.array([n_fp], pa.int64()),
            "fpr": round_like_sql([n_fp / _BLOOM_PROBES], 6),
        }
    )


def _q_str_packing(sf_dir: str) -> pa.Table:
    """Sort-tile-recursive (STR) R-tree packing of the top-64 event
    cells into a 4x4 leaf grid: x-rank slices then y-rank leaves with
    the exact integer rank rule (rank*4)//n, per-leaf bounding boxes
    and areas -- the bulk-load layout audit for spatial indexing, all
    ties broken by cell id."""
    cells = _top_cells(sf_dir, 64)
    pts = sorted((c % 96, c) for c in cells)  # by (x, cell)
    n = len(pts)
    rows = []
    for rank, (x, c) in enumerate(pts):
        rows.append((rank * 4 // n, x, c // 96, c))
    out = []
    for s in range(4):
        sl = sorted(
            [(y, c, x) for (si, x, y, c) in rows if si == s]
        )  # by (y, cell)
        m = len(sl)
        for rank2, (y, c, x) in enumerate(sl):
            out.append((s, rank2 * 4 // m, x, y))
    import collections

    leaves = collections.defaultdict(list)
    for s, le, x, y in out:
        leaves[(s, le)].append((x, y))
    sx, sy, minx, maxx, miny, maxy, cnt, area = [], [], [], [], [], [], [], []
    for (s, le), ps in sorted(leaves.items()):
        xs2 = [p[0] for p in ps]
        ys2 = [p[1] for p in ps]
        sx.append(s)
        sy.append(le)
        minx.append(min(xs2))
        maxx.append(max(xs2))
        miny.append(min(ys2))
        maxy.append(max(ys2))
        cnt.append(len(ps))
        area.append((max(xs2) - min(xs2) + 1) * (max(ys2) - min(ys2) + 1))
    return pa.table(
        {
            "slice_x": pa.array(sx, pa.int64()),
            "leaf_y": pa.array(sy, pa.int64()),
            "min_x": pa.array(minx, pa.int64()),
            "max_x": pa.array(maxx, pa.int64()),
            "min_y": pa.array(miny, pa.int64()),
            "max_y": pa.array(maxy, pa.int64()),
            "n_cells": pa.array(cnt, pa.int64()),
            "area": pa.array(area, pa.int64()),
        }
    )


def _q_cvm_twosample(sf_dir: str) -> pa.Table:
    """Two-sample Cramer-von Mises statistic between click and error
    value cents (Anderson's rank form): U = n*sum((r_i - i)^2)
    + m*sum((s_j - j)^2) over pooled ranks with the deterministic
    (value, tag, event_id) tie order -- U is an exact integer and
    T = U/(n*m*N) - (4nm-1)/(6N) one pinned float chain."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pylist()
        keep = np.array([t in ("click", "error") for t in et], bool)
        tag = np.array([0 if t == "click" else 1 for t in et], np.int64)[
            keep
        ]
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        y = scaled_int(batch["value"], 100.0)[keep]
        return pa.table(
            {"y": pa.array(y), "tag": pa.array(tag), "eid": pa.array(eid)}
        )

    tbl = collect_tables(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    )
    y = tbl["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    tag = tbl["tag"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = tbl["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, tag, y))
    tag_s = tag[order]
    big_n = len(y)
    n = int((tag == 0).sum())
    m = big_n - n
    ranks = np.arange(1, big_n + 1, dtype=np.int64)
    rx = ranks[tag_s == 0]
    ry = ranks[tag_s == 1]
    ix = np.arange(1, n + 1, dtype=np.int64)
    jy = np.arange(1, m + 1, dtype=np.int64)
    u = n * int(((rx - ix) ** 2).sum()) + m * int(((ry - jy) ** 2).sum())
    t_stat = u / (n * m * big_n) - (4 * n * m - 1) / (6 * big_n)
    return pa.table(
        {
            "n_click": pa.array([n], pa.int64()),
            "n_error": pa.array([m], pa.int64()),
            "u_stat": pa.array([u], pa.int64()),
            "t_stat": round_like_sql([t_stat], 6),
        }
    )


def _bareiss_det(lap: list[list[int]], exclude: set[int]) -> int:
    """Exact determinant of the Laplacian minor with the given
    rows/cols removed, by fraction-free Bareiss elimination (every
    division exact, as in _q_spanning_tree_count)."""
    keep = [r for r in range(len(lap)) if r not in exclude]
    size = len(keep)
    m = {
        (i + 1, j + 1): lap[keep[i]][keep[j]]
        for i in range(size)
        for j in range(size)
    }
    prev_piv = 1
    for k in range(1, size):
        piv = m[(k, k)]
        new = {}
        for i in range(k + 1, size + 1):
            for j in range(k + 1, size + 1):
                new[(i, j)] = (piv * m[(i, j)] - m[(i, k)] * m[(k, j)]) \
                    // prev_piv
        m = new
        prev_piv = piv
    return m[(size, size)]


def _q_effective_resistance(sf_dir: str) -> pa.Table:
    """EXACT effective resistance between the two highest-degree
    words of the edit-1 source-word graph, by the spanning-tree
    identity R_uv = (#2-forests separating u,v) / (#spanning trees):
    both counts are exact Bareiss determinants of Laplacian minors
    (drop {u,v} rows/cols vs drop {v}), so the resistance is one
    pinned ratio -- random-walk commute distance with zero float
    drift."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
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
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    lap = [[0] * n for _ in range(n)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        i, j = rank[w1], rank[w2]
        lap[i][j] -= 1
        lap[j][i] -= 1
        lap[i][i] += 1
        lap[j][j] += 1
    deg = [(lap[i][i], vocab[i], i) for i in range(n)]
    top = sorted(deg, key=lambda t: (-t[0], t[1]))[:2]
    u, v = top[0][2], top[1][2]
    trees = _bareiss_det(lap, {v})
    forests = _bareiss_det(lap, {u, v})
    return pa.table(
        {
            "u_word": pa.array([vocab[u]], pa.string()),
            "v_word": pa.array([vocab[v]], pa.string()),
            "n_trees": pa.array([str(trees)], pa.string()),
            "n_sep_forests": pa.array([str(forests)], pa.string()),
            "resistance": round_like_sql(
                [float(forests) / float(trees)], 6
            ),
        }
    )


def _daily_count_series(sf_dir: str) -> list[int]:
    """Dense zero-filled daily event-count series (calendar frame
    lo..hi like _q_lis_daily): the combiner tier aggregates, the
    driver holds only the ~1-year vector."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {"d": pa.array(d), "_one": pa.array(np.ones(len(d), np.int64))}
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    xs = [0] * (hi - lo + 1)
    for d, x in zip((dd - lo).tolist(), agg["x"].to_pylist()):
        xs[d] = int(x)
    return xs


def _daily_count_cents_series(sf_dir: str) -> tuple[list[int], list[int]]:
    """Dense zero-filled daily (event count, revenue cents) series on
    the lo..hi calendar frame -- one combiner-tier aggregate, driver
    holds two ~1-year vectors."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
                "cents": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x"), ("cents", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    xs = [0] * (hi - lo + 1)
    ys = [0] * (hi - lo + 1)
    for d, x, y in zip(
        (dd - lo).tolist(), agg["x"].to_pylist(), agg["y"].to_pylist()
    ):
        xs[d] = int(x)
        ys[d] = int(y)
    return xs, ys


def _q_ordinal_assoc(sf_dir: str) -> pa.Table:
    """Goodman-Kruskal gamma and both Somers' D asymmetries between
    daily event count (x) and daily revenue cents (y): exact integer
    concordant / discordant / single-axis-tie pair counts over the
    dense calendar frame, three pinned ratios."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs_l, ys_l = _daily_count_cents_series(sf_dir)
    x = np.asarray(xs_l, np.int64)
    y = np.asarray(ys_l, np.int64)
    n = len(x)
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    up = np.triu(np.ones((n, n), bool), 1)
    prod = sx * sy
    c = int(((prod > 0) & up).sum())
    d = int(((prod < 0) & up).sum())
    tx = int(((sx == 0) & (sy != 0) & up).sum())
    ty = int(((sy == 0) & (sx != 0) & up).sum())
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "concordant": pa.array([c], pa.int64()),
            "discordant": pa.array([d], pa.int64()),
            "ties_x_only": pa.array([tx], pa.int64()),
            "ties_y_only": pa.array([ty], pa.int64()),
            "gamma": round_like_sql(
                [float(c - d) / float(c + d)], 6
            ),
            "somers_d_yx": round_like_sql(
                [float(c - d) / float(c + d + ty)], 6
            ),
            "somers_d_xy": round_like_sql(
                [float(c - d) / float(c + d + tx)], 6
            ),
        }
    )


def _q_omega_calmar(sf_dir: str) -> pa.Table:
    """Omega ratio (threshold 0 on day-over-day revenue changes) and
    Calmar-style ratio (mean daily change over maximum drawdown of the
    daily revenue level): exact integer gain/loss sums and running-max
    drawdown in cents, two pinned ratios."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    n = len(y)
    d = y[1:] - y[:-1]
    gains = int(d[d > 0].sum())
    losses = int(-d[d < 0].sum())
    run_max = np.maximum.accumulate(y)
    maxdd = int((run_max - y).max())
    mean_chg = float(int(y[-1]) - int(y[0])) / float(n - 1)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "gains_cents": pa.array([gains], pa.int64()),
            "losses_cents": pa.array([losses], pa.int64()),
            "max_dd_cents": pa.array([maxdd], pa.int64()),
            "omega": round_like_sql(
                [float(gains) / float(losses)], 6
            ),
            "calmar": round_like_sql([mean_chg / float(maxdd)], 6),
        }
    )
