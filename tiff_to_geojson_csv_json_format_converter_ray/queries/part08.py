"""Query implementations, part 08 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: readability_panel, katz_centrality, morisita_index, theils_u, lz76_complexity, dist_distances, cliffs_delta, jonckheere, dixon_q, rank_distance, textrank_keywords, bivariate_moran, harris_corners, kapur_threshold, distinct_substrings, block_entropy, radiation_model, local_geary, general_g, rake_keywords, brunner_munzel, cusum_squares, spectral_summary, seam_dp, ridge_two_var, cox_stuart, runs_updown, mh_odds, kulldorff_scan, retile_extract, kuiper_test, page_trend, theil_decomp, ansari_bradley, grid_prefix_sums, turning_points, sample_entropy, perm_entropy, siegel_tukey, conover_squared_ranks ...
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
    OG_H,
    OG_W,
    _og_points_ds,
    _og_tiles_table,
    _read_pq,
)
from .part03 import (  # noqa: F401
    _GFUNC_RADII_Q,
)
from .part06 import (  # noqa: F401
    _MARKOV_STATES,
    _top_value_cells,
)
from .part07 import (  # noqa: F401
    _daily_count_cents_series,
    _daily_count_series,
    _daily_revenue_cents,
    _one_vs_rest_perm_pnums,
)


def _q_readability_panel(sf_dir: str) -> pa.Table:
    """ARI, Coleman-Liau and LIX per document (the grade-level
    complements of the Flesch query): every input an exact integer
    regex count -- [A-Za-z] letters, [A-Za-z0-9] chars, \\S+ words,
    [.!?]+ sentences (min 1), 7+-char long words -- and each index one
    shared float expression."""
    import re as _re

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    w_re = _re.compile(r"\S+")
    s_re = _re.compile(r"[.!?]+")
    alpha_re = _re.compile(r"[^A-Za-z]")
    alnum_re = _re.compile(r"[^A-Za-z0-9]")

    def score(batch: pa.Table) -> pa.Table:
        ids, ls, cs, ws, ss, lws = [], [], [], [], [], []
        ari, cli, lix = [], [], []
        for i in range(batch.num_rows):
            t = batch["text"][i].as_py() or ""
            toks = w_re.findall(t)
            w = len(toks)
            s = max(len(s_re.findall(t)), 1)
            l = len(alpha_re.sub("", t))
            c = len(alnum_re.sub("", t))
            lw = sum(1 for tok in toks if len(tok) >= 7)
            ids.append(batch["doc_id"][i].as_py())
            ls.append(l)
            cs.append(c)
            ws.append(w)
            ss.append(s)
            lws.append(lw)
            if w == 0:
                ari.append(0.0)
                cli.append(0.0)
                lix.append(0.0)
            else:
                ari.append(4.71 * (c / w) + 0.5 * (w / s) - 21.43)
                cli.append(
                    0.0588 * ((l / w) * 100.0)
                    - 0.296 * ((s / w) * 100.0)
                    - 15.8
                )
                lix.append((w / s) + 100.0 * (lw / w))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_letters": pa.array(ls, pa.int64()),
                "n_alnum": pa.array(cs, pa.int64()),
                "n_long_words": pa.array(lws, pa.int64()),
                "ari": round_like_sql(ari, 6),
                "coleman_liau": round_like_sql(cli, 6),
                "lix": round_like_sql(lix, 6),
            }
        )

    return collect_tables(
        ds.map_batches(score, batch_format="pyarrow", batch_size=None)
    )


_KATZ_ITERS = 15
_KATZ_SCALE = 1_000_000
_KATZ_DIV = 16  # 1/alpha; > spectral radius of the 20-word graph


def _q_katz_centrality(sf_dir: str) -> pa.Table:
    """Katz centrality of the edit-1 source-word graph by FULLY
    INTEGER fixed-point iteration: x <- SCALE + (A.x) // 16
    (attenuation alpha = 1/16 > spectral radius margin, truncating
    division identical in Python and DuckDB //), 15 unrolled steps --
    exact integers end to end, ranks deterministic."""
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
    vt = distinct(
        _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["source"]),
        ["source"],
    )
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    adj: list[list[int]] = [[] for _ in range(n)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        i, j = rank[w1], rank[w2]
        adj[i].append(j)
        adj[j].append(i)
    x = [_KATZ_SCALE] * n
    for _ in range(_KATZ_ITERS):
        x = [
            _KATZ_SCALE + sum(x[j] for j in adj[i]) // _KATZ_DIV
            for i in range(n)
        ]
    order = sorted(range(n), key=lambda i: (-x[i], vocab[i]))
    rk = [0] * n
    for pos, i in enumerate(order):
        rk[i] = pos + 1
    return pa.table(
        {
            "word": pa.array(vocab, pa.string()),
            "katz_q": pa.array(x, pa.int64()),
            "katz": round_like_sql(
                [float(v) / 1e6 for v in x], 6
            ),
            "rnk": pa.array(rk, pa.int64()),
        }
    )


def _katz_oracle_sql() -> str:
    """Mirror of _q_katz_centrality: 15 unrolled integer fixed-point
    steps over the alphabetical node index."""
    steps = []
    for k in range(1, _KATZ_ITERS + 1):
        steps.append(
            f"k{k} AS MATERIALIZED (SELECT nd0.r, "
            f"{_KATZ_SCALE} + COALESCE((SELECT SUM(p.v) FROM adj "
            f"JOIN k{k - 1} p ON p.r = adj.b WHERE adj.a = nd0.r), 0) "
            f"// {_KATZ_DIV} AS v FROM nd0)"
        )
    return (
        "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "nd0 AS (SELECT w, ROW_NUMBER() OVER (ORDER BY w) - 1 AS r "
        "FROM tok), "
        "e AS MATERIALIZED (SELECT a.r AS r1, b.r AS r2 FROM nd0 a "
        "JOIN nd0 b ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "adj AS MATERIALIZED (SELECT r1 AS a, r2 AS b FROM e "
        "UNION ALL SELECT r2, r1 FROM e), "
        f"k0 AS (SELECT r, CAST({_KATZ_SCALE} AS BIGINT) AS v "
        "FROM nd0), "
        + ", ".join(steps)
        + f" SELECT nd0.w AS word, "
        f"CAST(k{_KATZ_ITERS}.v AS BIGINT) AS katz_q, "
        f"ROUND(CAST(k{_KATZ_ITERS}.v AS DOUBLE) / 1e6, 6) AS katz, "
        f"CAST(ROW_NUMBER() OVER (ORDER BY k{_KATZ_ITERS}.v DESC, "
        "nd0.w) AS BIGINT) AS rnk "
        f"FROM nd0 JOIN k{_KATZ_ITERS} ON k{_KATZ_ITERS}.r = nd0.r"
    )


def _q_morisita_index(sf_dir: str) -> pa.Table:
    """Morisita's index of dispersion per event type over the fixed
    9216-cell lattice frame: I = Q * sum(x*(x-1)) / (N*(N-1)) -- the
    quadrat clumping measure complementary to the variance-mean
    ratio; all moments exact int64 through the distributed groupby
    tier, one pinned ratio per type."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "cell": pa.array(eid % 9216),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    per_cell = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "cell"],
        [("_one", "sum", "x")],
        distributed_combine=True,
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "s1": batch["x"],
                "sxx1": pa.array(x * (x - 1)),
            }
        ).group_by("event_type").aggregate(
            [("s1", "sum"), ("sxx1", "sum")]
        ).rename_columns(["event_type", "s1", "sxx1"])

    parts = per_cell.map_batches(
        moments, batch_format="pyarrow", batch_size=None
    )
    agg = hash_aggregate(
        parts, ["event_type"], [("s1", "sum", "n"), ("sxx1", "sum", "sxx1")]
    ).sort_by("event_type")
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sxx1 = agg["sxx1"].to_numpy(zero_copy_only=False).astype(np.int64)
    iq = 9216.0 * sxx1.astype(np.float64) / (
        n.astype(np.float64) * (n - 1).astype(np.float64)
    )
    return pa.table(
        {
            "event_type": agg["event_type"],
            "n_events": pa.array(n),
            "sum_xx1": pa.array(sxx1),
            "morisita": round_like_sql(iq, 6),
        }
    )


def _q_theils_u(sf_dir: str) -> pa.Table:
    """Theil's uncertainty coefficient U(lang | source) = (H(lang) -
    H(lang|source)) / H(lang): both entropies from exact counts with
    1e12-tick per-term quantization (the conditional_entropy kernel
    plus its marginal), so U is a ratio of two exact int64 tick sums."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source"],
    )
    agg = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "source": b["source"],
                    "lang": b["lang"],
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        ["source", "lang"],
        [("_one", "sum", "n")],
    )
    src = agg["source"].to_pylist()
    lg = agg["lang"].to_pylist()
    nn = agg["n"].to_pylist()
    n_s: dict[str, int] = {}
    n_l: dict[str, int] = {}
    for s, l, c in zip(src, lg, nn):
        n_s[s] = n_s.get(s, 0) + int(c)
        n_l[l] = n_l.get(l, 0) + int(c)
    ntot = sum(n_s.values())
    tq_y = 0
    for c in n_l.values():
        tq_y += int(
            round_half_away(
                np.array(
                    [float(c) / float(ntot) * np.log(float(ntot) / float(c)) * 1e12]
                )
            )[0]
        )
    tq_yx = 0
    for s, l, c in zip(src, lg, nn):
        tq_yx += int(
            round_half_away(
                np.array(
                    [
                        float(c) / float(ntot)
                        * np.log(float(n_s[s]) / float(c)) * 1e12
                    ]
                )
            )[0]
        )
    return pa.table(
        {
            "n_docs": pa.array([ntot], pa.int64()),
            "h_lang_nats": round_like_sql([float(tq_y) / 1e12], 6),
            "h_cond_nats": round_like_sql([float(tq_yx) / 1e12], 6),
            "theils_u": round_like_sql(
                [float(tq_y - tq_yx) / float(tq_y)], 6
            ),
        }
    )


def _q_lz76_complexity(sf_dir: str) -> pa.Table:
    """Lempel-Ziv (LZ76) phrase complexity of the daily up/down
    revenue bit string: bit t = 1 iff day t's revenue cents strictly
    exceed day t-1's; the parse takes the SHORTEST substring at each
    position not occurring in the strictly-preceding prefix -- a
    purely combinatorial integer count, mirrored by a recursive-CTE
    string parse in SQL.  Normalized complexity phrases*log2(L)/L is
    the single pinned float."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    bits = "".join("1" if b else "0" for b in (y[1:] > y[:-1]).tolist())
    n = len(bits)
    i = 0
    phrases = 0
    while i < n:
        l = 0
        while i + l < n and bits[i : i + l + 1] in bits[:i]:
            l += 1
        phrases += 1
        i += l + 1
    norm = float(phrases) * np.log2(float(n)) / float(n)
    return pa.table(
        {
            "n_bits": pa.array([n], pa.int64()),
            "n_phrases": pa.array([phrases], pa.int64()),
            "lz_norm": round_like_sql([norm], 6),
        }
    )


def _hour_type_counts(sf_dir: str) -> dict[tuple[str, int], int]:
    """Exact 24-bin hour-of-day counts for click and error events
    (empty bins 0) via the combiner tier -- shared by the
    distribution-distance family (dist_distances, kuiper_test)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(
            batch["event_type"], value_set=pa.array(["click", "error"])
        )
        batch = batch.filter(keep)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array((us // 3_600_000_000) % 24),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "hour"],
        [("_one", "sum", "n")],
    )
    cnt = {("click", h): 0 for h in range(24)}
    cnt.update({("error", h): 0 for h in range(24)})
    for t, h, c in zip(
        agg["event_type"].to_pylist(),
        agg["hour"].to_pylist(),
        agg["n"].to_pylist(),
    ):
        cnt[(t, int(h))] = int(c)
    return cnt


def _q_dist_distances(sf_dir: str) -> pa.Table:
    """Bhattacharyya coefficient, Hellinger distance and total
    variation distance between the hour-of-day distributions of
    'click' vs 'error' events: exact integer 24-bin counts (empty
    bins included), per-bin sqrt(p*q) and |p-q| terms quantized at
    1e12 ticks, final transforms pinned."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt = _hour_type_counts(sf_dir)
    n1 = sum(cnt[("click", h)] for h in range(24))
    n2 = sum(cnt[("error", h)] for h in range(24))
    bc_tq = 0
    tv_tq = 0
    for h in range(24):
        p = float(cnt[("click", h)]) / float(n1)
        q = float(cnt[("error", h)]) / float(n2)
        bc_tq += int(
            round_half_away(np.array([np.sqrt(p * q) * 1e12]))[0]
        )
        tv_tq += int(round_half_away(np.array([abs(p - q) * 1e12]))[0])
    bc = float(bc_tq) / 1e12
    return pa.table(
        {
            "n_click": pa.array([n1], pa.int64()),
            "n_error": pa.array([n2], pa.int64()),
            "bhattacharyya": round_like_sql([bc], 6),
            "hellinger": round_like_sql([np.sqrt(1.0 - bc)], 6),
            "total_variation": round_like_sql(
                [float(tv_tq) / 1e12 / 2.0], 6
            ),
        }
    )


def _type_cents_hist(sf_dir: str) -> pa.Table:
    """Per-(event_type, cents) histogram through the distributed
    groupby tier -- the compressed sufficient statistic for the
    rank-order two-sample family (Cliff's delta, Jonckheere): the
    driver sees at most n_types x distinct-cents rows, never the
    events."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "v": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    return collect_tables(
        hash_aggregate(
            ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
            ["event_type", "v"],
            [("_one", "sum", "c")],
            distributed_combine=True,
        )
    )


def _q_cliffs_delta(sf_dir: str) -> pa.Table:
    """Cliff's delta effect size between 'click' and 'error' event
    values: exact greater-than / less-than pair counts from the
    per-cents histograms (cumulative counts on the union value grid
    -- no pair enumeration), one pinned ratio."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    hist = _type_cents_hist(sf_dir)
    et = hist["event_type"].to_pylist()
    vv = hist["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = hist["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    grid = np.unique(vv)
    pos = {int(v): i for i, v in enumerate(grid.tolist())}
    a = np.zeros(len(grid), np.int64)
    b = np.zeros(len(grid), np.int64)
    for t, v, c in zip(et, vv.tolist(), cc.tolist()):
        if t == "click":
            a[pos[v]] += c
        elif t == "error":
            b[pos[v]] += c
    n1, n2 = int(a.sum()), int(b.sum())
    b_lt = np.cumsum(b) - b  # strictly below each grid value
    b_gt = n2 - np.cumsum(b)  # strictly above
    gt = int((a * b_lt).sum())
    lt = int((a * b_gt).sum())
    return pa.table(
        {
            "n_click": pa.array([n1], pa.int64()),
            "n_error": pa.array([n2], pa.int64()),
            "n_gt": pa.array([gt], pa.int64()),
            "n_lt": pa.array([lt], pa.int64()),
            "cliffs_delta": round_like_sql(
                [float(gt - lt) / (float(n1) * float(n2))], 6
            ),
        }
    )


def _q_jonckheere(sf_dir: str) -> pa.Table:
    """Jonckheere-Terpstra ordered-alternative test across the five
    event types in alphabetical dose order: the 2x JT statistic is an
    exact integer assembled from cumulative per-cents histograms
    (ties counted half, hence the doubling); the z-score uses the
    classical tie-uncorrected moments as one shared float
    expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    hist = _type_cents_hist(sf_dir)
    et = hist["event_type"].to_pylist()
    vv = hist["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = hist["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(set(et))
    grid = np.unique(vv)
    pos = {int(v): i for i, v in enumerate(grid.tolist())}
    h = {t: np.zeros(len(grid), np.int64) for t in types}
    for t, v, c in zip(et, vv.tolist(), cc.tolist()):
        h[t][pos[v]] += c
    jt2 = 0
    for gi in range(len(types)):
        g = h[types[gi]]
        g_lt = np.cumsum(g) - g
        for hi in range(gi + 1, len(types)):
            b = h[types[hi]]
            jt2 += int((b * (2 * g_lt + g)).sum())
    sizes = [int(h[t].sum()) for t in types]
    nn = sum(sizes)
    sn2 = sum(x * x for x in sizes)
    sn23 = sum(x * x * (2 * x + 3) for x in sizes)
    z = (
        float(jt2) / 2.0 - float(nn * nn - sn2) / 4.0
    ) / np.sqrt(float(nn * nn * (2 * nn + 3) - sn23) / 72.0)
    return pa.table(
        {
            "n_events": pa.array([nn], pa.int64()),
            "jt2": pa.array([jt2], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )


def _q_dixon_q(sf_dir: str) -> pa.Table:
    """Dixon's Q outlier screen on the daily revenue series: both the
    suspect-max r10 = (y(n) - y(n-1)) / (y(n) - y(1)) and suspect-min
    variants -- pure order statistics in exact cents, two pinned
    ratios."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.sort(np.asarray(ys_l, np.int64))
    n = len(y)
    rng = int(y[-1] - y[0])
    q_max = float(int(y[-1] - y[-2])) / float(rng)
    q_min = float(int(y[1] - y[0])) / float(rng)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "range_cents": pa.array([rng], pa.int64()),
            "q_max": round_like_sql([q_max], 6),
            "q_min": round_like_sql([q_min], 6),
        }
    )


def _q_rank_distance(sf_dir: str) -> pa.Table:
    """Spearman footrule and Kendall tau distance between two
    rankings of the sources -- by document count and by total
    characters (both desc, source-name tie-break): exact integer
    rank-displacement sum and discordant-pair count, footrule
    normalized by its n^2/2 maximum."""
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
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                "nch": batch["n_chars"].cast(pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source"],
        [("_one", "sum", "n_docs"), ("nch", "sum", "n_chars")],
    )
    src = agg["source"].to_pylist()
    nd = agg["n_docs"].to_pylist()
    nc = agg["n_chars"].to_pylist()
    by_docs = sorted(range(len(src)), key=lambda i: (-int(nd[i]), src[i]))
    by_chars = sorted(range(len(src)), key=lambda i: (-int(nc[i]), src[i]))
    r1 = {src[i]: pos + 1 for pos, i in enumerate(by_docs)}
    r2 = {src[i]: pos + 1 for pos, i in enumerate(by_chars)}
    names = sorted(src)
    n = len(names)
    footrule = sum(abs(r1[s] - r2[s]) for s in names)
    kd = 0
    for i in range(n):
        for j in range(i + 1, n):
            si, sj = names[i], names[j]
            if (r1[si] - r1[sj]) * (r2[si] - r2[sj]) < 0:
                kd += 1
    return pa.table(
        {
            "n_items": pa.array([n], pa.int64()),
            "footrule": pa.array([footrule], pa.int64()),
            "kendall_dist": pa.array([kd], pa.int64()),
            "footrule_norm": round_like_sql(
                [float(footrule) / (float(n) * float(n) / 2.0)], 6
            ),
        }
    )


_TEXTRANK_ITERS = 10
_TEXTRANK_SCALE = 1_000_000
_TEXTRANK_BASE = 150_000  # (1 - 0.85) * SCALE


def _q_textrank_keywords(sf_dir: str) -> pa.Table:
    """TextRank keyword scores over the adjacency (window-2
    co-occurrence) graph of the 30 most frequent corpus tokens:
    pass 1 counts tokens (distributed) and broadcasts the vocabulary;
    pass 2 counts adjacent in-vocabulary token pairs (distributed,
    list-offset vectorized -- no Python loop over tokens); the damped
    walk x <- BASE + 85 * sum_j((w_ij * x_j) // W_j) // 100 runs 10
    FULLY INTEGER unrolled steps, bit-identical in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def tok_counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        flat = toks.combine_chunks().flatten() if isinstance(
            toks, pa.ChunkedArray
        ) else toks.flatten()
        t = pa.table({"w": flat})
        t = t.filter(pc.not_equal(t["w"], ""))
        return t.append_column(
            "_one", pa.array(np.ones(t.num_rows, np.int64))
        )

    freqs = hash_aggregate(
        ds.map_batches(tok_counts, batch_format="pyarrow", batch_size=None),
        ["w"],
        [("_one", "sum", "n")],
    )
    top = sorted(
        zip(freqs["n"].to_pylist(), freqs["w"].to_pylist()),
        key=lambda t: (-t[0], t[1]),
    )[:30]
    vocab = sorted(w for _, w in top)
    rank = {w: i for i, w in enumerate(vocab)}

    def pair_counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        arr = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray
        ) else toks
        flat = np.asarray(arr.flatten().to_pylist(), object)
        offs = np.asarray(arr.offsets.to_numpy(zero_copy_only=False))
        if len(flat) < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "_one": pa.array([], pa.int64()),
                }
            )
        k = np.arange(len(flat) - 1)
        starts = np.zeros(len(flat) + 1, bool)
        starts[offs[1:-1]] = True
        ok = ~starts[k + 1]
        a, b = flat[k[ok]], flat[k[ok] + 1]
        vlist = np.asarray(vocab, object)
        inv = np.isin(a, vlist) & np.isin(b, vlist) & (a != b)
        a, b = a[inv], b[inv]
        lo = np.where(a < b, a, b)
        hi = np.where(a < b, b, a)
        return pa.table(
            {
                "w1": pa.array(lo.tolist(), pa.string()),
                "w2": pa.array(hi.tolist(), pa.string()),
                "_one": pa.array(np.ones(len(lo), np.int64)),
            }
        )

    pairs = hash_aggregate(
        ds.map_batches(pair_counts, batch_format="pyarrow", batch_size=None),
        ["w1", "w2"],
        [("_one", "sum", "wt")],
    )
    n = len(vocab)
    wadj: dict[int, list[tuple[int, int]]] = {i: [] for i in range(n)}
    wout = [0] * n
    for w1, w2, wt in zip(
        pairs["w1"].to_pylist(), pairs["w2"].to_pylist(),
        pairs["wt"].to_pylist(),
    ):
        i, j, c = rank[w1], rank[w2], int(wt)
        wadj[i].append((j, c))
        wadj[j].append((i, c))
        wout[i] += c
        wout[j] += c
    x = [_TEXTRANK_SCALE] * n
    for _ in range(_TEXTRANK_ITERS):
        x = [
            _TEXTRANK_BASE
            + 85 * sum((c * x[j]) // wout[j] for j, c in wadj[i]) // 100
            for i in range(n)
        ]
    order = sorted(range(n), key=lambda i: (-x[i], vocab[i]))
    rk = [0] * n
    for pos, i in enumerate(order):
        rk[i] = pos + 1
    return pa.table(
        {
            "word": pa.array(vocab, pa.string()),
            "score_q": pa.array(x, pa.int64()),
            "score": round_like_sql([float(v) / 1e6 for v in x], 6),
            "rnk": pa.array(rk, pa.int64()),
        }
    )


def _textrank_oracle_sql() -> str:
    """Mirror of _q_textrank_keywords: 10 unrolled integer damped-walk
    steps over the top-30 adjacency graph."""
    steps = []
    for k in range(1, _TEXTRANK_ITERS + 1):
        steps.append(
            f"x{k} AS MATERIALIZED (SELECT nd.r, "
            f"{_TEXTRANK_BASE} + 85 * COALESCE((SELECT "
            f"SUM(adj.wt * p.v // wo.wsum) FROM adj "
            f"JOIN x{k - 1} p ON p.r = adj.b "
            f"JOIN wo ON wo.a = adj.b "
            f"WHERE adj.a = nd.r), 0) // 100 AS v FROM nd)"
        )
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "p AS (SELECT doc_id, UNNEST(toks) AS w, "
        "generate_subscripts(toks, 1) AS i FROM t), "
        "fr AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "WHERE w <> '' GROUP BY 1), "
        "tp AS (SELECT w FROM fr ORDER BY n DESC, w LIMIT 30), "
        "nd AS (SELECT w, ROW_NUMBER() OVER (ORDER BY w) - 1 AS r "
        "FROM tp), "
        "e0 AS MATERIALIZED (SELECT LEAST(a.w, b.w) AS w1, "
        "GREATEST(a.w, b.w) AS w2, CAST(COUNT(*) AS BIGINT) AS wt "
        "FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
        "WHERE a.w IN (SELECT w FROM tp) AND b.w IN (SELECT w FROM tp) "
        "AND a.w <> b.w GROUP BY 1, 2), "
        "adj AS MATERIALIZED (SELECT n1.r AS a, n2.r AS b, e0.wt "
        "FROM e0 JOIN nd n1 ON n1.w = e0.w1 JOIN nd n2 ON n2.w = e0.w2 "
        "UNION ALL SELECT n2.r, n1.r, e0.wt FROM e0 "
        "JOIN nd n1 ON n1.w = e0.w1 JOIN nd n2 ON n2.w = e0.w2), "
        "wo AS (SELECT a, CAST(SUM(wt) AS BIGINT) AS wsum FROM adj "
        "GROUP BY 1), "
        f"x0 AS (SELECT r, CAST({_TEXTRANK_SCALE} AS BIGINT) AS v "
        "FROM nd), "
        + ", ".join(steps)
        + f" SELECT nd.w AS word, "
        f"CAST(x{_TEXTRANK_ITERS}.v AS BIGINT) AS score_q, "
        f"ROUND(CAST(x{_TEXTRANK_ITERS}.v AS DOUBLE) / 1e6, 6) "
        "AS score, "
        f"CAST(ROW_NUMBER() OVER (ORDER BY x{_TEXTRANK_ITERS}.v DESC, "
        "nd.w) AS BIGINT) AS rnk "
        f"FROM nd JOIN x{_TEXTRANK_ITERS} "
        f"ON x{_TEXTRANK_ITERS}.r = nd.r"
    )


def _grid_count_cents(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Dense 96x96 (event count, revenue cents) grids on the geocode
    lattice via the combiner tier."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "gx": pa.array(eid % 96),
                "gy": pa.array((eid // 96) % 96),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "cents": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["gx", "gy"],
        [("_one", "sum", "n"), ("cents", "sum", "y")],
    )
    cnt = np.zeros((96, 96), np.int64)
    cen = np.zeros((96, 96), np.int64)
    gx = agg["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
    gy = agg["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt[gx, gy] = agg["n"].to_numpy(zero_copy_only=False)
    cen[gx, gy] = agg["y"].to_numpy(zero_copy_only=False)
    return cnt, cen


def _q_bivariate_moran(sf_dir: str) -> pa.Table:
    """Bivariate Moran's I between the event-count field and the
    revenue-cents field on the 96x96 lattice (rook weights): with
    X_i = n*x_i - Sx (n-scaled centering) every cross product is an
    exact integer (arbitrary-precision accumulation), so
    I = (n/W) * S_w(X, Y) / sqrt(SXX * SYY) is one pinned float."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt, cen = _grid_count_cents(sf_dir)
    n = 96 * 96
    sx, sy = int(cnt.sum()), int(cen.sum())
    bx = (n * cnt - sx).astype(object)
    by = (n * cen - sy).astype(object)
    sxy_w = 0
    w = 0
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        r0, r1 = max(0, dr), 96 + min(0, dr)
        c0, c1 = max(0, dc), 96 + min(0, dc)
        xi = bx[r0:r1, c0:c1]
        yj = by[r0 - dr : r1 - dr, c0 - dc : c1 - dc]
        sxy_w += int((xi * yj).sum())
        w += xi.size
    sxx = int((bx * bx).sum())
    syy = int((by * by).sum())
    i_xy = (
        float(n) / float(w) * float(sxy_w)
        / np.sqrt(float(sxx) * float(syy))
    )
    return pa.table(
        {
            "n_cells": pa.array([n], pa.int64()),
            "w_pairs": pa.array([w], pa.int64()),
            "bivariate_i": round_like_sql([i_xy], 6),
        }
    )


def _q_harris_corners(sf_dir: str) -> pa.Table:
    """Harris corner response on the event-count grid: integer Sobel
    gradients, 3x3 structure-tensor window sums, and the k=1/16
    response R16 = 16*(Sxx*Syy - Sxy^2) - (Sxx+Syy)^2 -- every step
    an exact integer, the 15 strongest corners reported."""
    cnt, _ = _grid_count_cents(sf_dir)
    g = cnt
    gx = (
        (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
    )
    gy = (
        (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
        - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
    )
    # window sums of the tensor over 3x3 gradient neighborhoods
    def win(a: np.ndarray) -> np.ndarray:
        return sum(
            a[r : r + a.shape[0] - 2, c : c + a.shape[1] - 2]
            for r in range(3)
            for c in range(3)
        )

    sxx = win(gx * gx)
    sxy = win(gx * gy)
    syy = win(gy * gy)
    r16 = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) * (sxx + syy)
    rows = []
    h, w = r16.shape
    for rr in range(h):
        for cc in range(w):
            rows.append((int(r16[rr, cc]), rr + 2, cc + 2))
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = rows[:15]
    return pa.table(
        {
            "r": pa.array([t[1] for t in top], pa.int64()),
            "c": pa.array([t[2] for t in top], pa.int64()),
            "r16": pa.array([t[0] for t in top], pa.int64()),
            "rnk": pa.array(
                list(range(1, len(top) + 1)), pa.int64()
            ),
        }
    )


def _q_kapur_threshold(sf_dir: str) -> pa.Table:
    """Kapur maximum-entropy threshold over the per-cell event-count
    histogram (the entropy-based sibling of otsu_threshold): for each
    candidate threshold the foreground/background Shannon entropies
    are 1e12-tick sums of exact count shares; the argmax threshold is
    picked on integer ticks (tie -> smallest)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt, _ = _grid_count_cents(sf_dir)
    flat = cnt.ravel()
    vals, freq = np.unique(flat, return_counts=True)
    n = int(freq.sum())
    best_t, best_tick = None, None
    for ti in range(len(vals) - 1):
        t = int(vals[ti])
        lo = freq[: ti + 1]
        hi = freq[ti + 1 :]
        w0, w1 = int(lo.sum()), int(hi.sum())
        tq = 0
        for c in lo.tolist():
            p = float(c) / float(w0)
            tq += int(
                round_half_away(np.array([-p * np.log(p) * 1e12]))[0]
            )
        for c in hi.tolist():
            p = float(c) / float(w1)
            tq += int(
                round_half_away(np.array([-p * np.log(p) * 1e12]))[0]
            )
        if best_tick is None or tq > best_tick:
            best_t, best_tick = t, tq
    return pa.table(
        {
            "n_cells": pa.array([n], pa.int64()),
            "threshold": pa.array([best_t], pa.int64()),
            "h_sum_nats": round_like_sql([float(best_tick) / 1e12], 6),
        }
    )


def _q_distinct_substrings(sf_dir: str) -> pa.Table:
    """Distinct-substring count of the daily up/down revenue bit
    string (the subword-complexity profile next to lz76_complexity):
    exact enumeration over all O(n^2) windows, plus the length-
    normalized ratio."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    bits = "".join("1" if b else "0" for b in (y[1:] > y[:-1]).tolist())
    n = len(bits)
    subs = {
        bits[i : i + l]
        for l in range(1, n + 1)
        for i in range(n - l + 1)
    }
    total = n * (n + 1) // 2
    return pa.table(
        {
            "n_bits": pa.array([n], pa.int64()),
            "n_distinct": pa.array([len(subs)], pa.int64()),
            "n_windows": pa.array([total], pa.int64()),
            "ratio": round_like_sql(
                [float(len(subs)) / float(total)], 6
            ),
        }
    )


def _q_block_entropy(sf_dir: str) -> pa.Table:
    """Block (k-gram) entropies H_1..H_4 of the daily up/down bit
    string with the entropy-rate differences H_k - H_{k-1}: exact
    k-gram counts, 1e12-tick p*ln(p) terms -- the finite-order
    complement of the Markov entropy rate."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    bits = "".join("1" if b else "0" for b in (y[1:] > y[:-1]).tolist())
    ks, hs, diffs = [], [], []
    prev_h = 0.0
    for k in range(1, 5):
        grams: dict[str, int] = {}
        for i in range(len(bits) - k + 1):
            g = bits[i : i + k]
            grams[g] = grams.get(g, 0) + 1
        tot = len(bits) - k + 1
        tq = 0
        for c in grams.values():
            p = float(c) / float(tot)
            tq += int(
                round_half_away(np.array([-p * np.log(p) * 1e12]))[0]
            )
        h = float(tq) / 1e12
        ks.append(k)
        hs.append(h)
        diffs.append(h - prev_h)
        prev_h = h
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "h_k": round_like_sql(hs, 6),
            "h_rate": round_like_sql(diffs, 6),
        }
    )


def _q_radiation_model(sf_dir: str) -> pa.Table:
    """Radiation mobility model (Simini et al. 2012) flows between
    the 10 hottest cells: T_ij = T_i * m_i * n_j / ((m_i + s_ij) *
    (m_i + n_j + s_ij)) where s_ij is the total event count of cells
    strictly inside the o->d disk (squared-distance integer
    predicate, endpoints excluded) and T_i = m_i -- every count an
    exact integer, the flow one shared float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt, _ = _grid_count_cents(sf_dir)
    rr, cc = np.nonzero(cnt)
    xs = cnt[rr, cc]
    hot = sorted(
        zip(xs.tolist(), rr.tolist(), cc.tolist()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    rows = []
    allr, allc = np.indices((96, 96))
    for mi, oi, oj in hot:
        for nj, di, dj in hot:
            if (oi, oj) == (di, dj):
                continue
            d2 = (di - oi) ** 2 + (dj - oj) ** 2
            ring = (allr - oi) ** 2 + (allc - oj) ** 2 < d2
            ring[oi, oj] = False
            ring[di, dj] = False
            s = int(cnt[ring].sum())
            flow = (
                float(mi) * float(mi) * float(nj)
                / (
                    (float(mi) + float(s))
                    * (float(mi) + float(nj) + float(s))
                )
            )
            rows.append((oi, oj, di, dj, mi, nj, s, flow))
    return pa.table(
        {
            "o_r": pa.array([r[0] for r in rows], pa.int64()),
            "o_c": pa.array([r[1] for r in rows], pa.int64()),
            "d_r": pa.array([r[2] for r in rows], pa.int64()),
            "d_c": pa.array([r[3] for r in rows], pa.int64()),
            "m_i": pa.array([r[4] for r in rows], pa.int64()),
            "n_j": pa.array([r[5] for r in rows], pa.int64()),
            "s_ij": pa.array([r[6] for r in rows], pa.int64()),
            "flow": round_like_sql([r[7] for r in rows], 6),
        }
    )


def _q_local_geary(sf_dir: str) -> pa.Table:
    """Local Geary c_i at the 10 hottest cells of the count grid:
    c_i = sum over rook neighbours of (x_i - x_j)^2 -- FULLY integer
    (no centering, no floats anywhere except the reported mean
    square), the local-heterogeneity complement of the local Moran
    LISA map."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt, _ = _grid_count_cents(sf_dir)
    rr, cc = np.nonzero(cnt)
    hot = sorted(
        zip(cnt[rr, cc].tolist(), rr.tolist(), cc.tolist()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    rows = []
    for x, r, c in hot:
        s = 0
        k = 0
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < 96 and 0 <= nc < 96:
                d = int(x) - int(cnt[nr, nc])
                s += d * d
                k += 1
        rows.append((r, c, int(x), k, s))
    return pa.table(
        {
            "r": pa.array([t[0] for t in rows], pa.int64()),
            "c": pa.array([t[1] for t in rows], pa.int64()),
            "x": pa.array([t[2] for t in rows], pa.int64()),
            "n_nb": pa.array([t[3] for t in rows], pa.int64()),
            "c_local": pa.array([t[4] for t in rows], pa.int64()),
            "c_mean": round_like_sql(
                [float(t[4]) / float(t[3]) for t in rows], 6
            ),
        }
    )


def _q_general_g(sf_dir: str) -> pa.Table:
    """Getis-Ord General G (global clustering of HIGH values) on the
    count grid with rook weights: G = S_w(x_i * x_j) / S_all(x_i *
    x_j), i != j -- both sums exact integers (arbitrary precision),
    one pinned ratio; complements the Gi* hotspot map."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnt, _ = _grid_count_cents(sf_dir)
    x = cnt.astype(object)
    num = 0
    w = 0
    for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        r0, r1 = max(0, dr), 96 + min(0, dr)
        c0, c1 = max(0, dc), 96 + min(0, dc)
        xi = x[r0:r1, c0:c1]
        xj = x[r0 - dr : r1 - dr, c0 - dc : c1 - dc]
        num += int((xi * xj).sum())
        w += xi.size
    s = int(cnt.sum())
    s2 = int((cnt.astype(object) * cnt.astype(object)).sum())
    den = s * s - s2  # sum over all i != j of x_i * x_j
    return pa.table(
        {
            "w_pairs": pa.array([w], pa.int64()),
            "num_pairsum": pa.array([num], pa.int64()),
            "general_g": round_like_sql(
                [float(num) / float(den)], 6
            ),
        }
    )


def _q_rake_keywords(sf_dir: str) -> pa.Table:
    """RAKE keyword extraction over the corpus: delimiters are the 10
    most frequent tokens (deterministic data-driven stopword set);
    candidate phrases are the maximal runs between delimiters
    (gaps-and-islands), word degree = sum of phrase lengths over
    occurrences, word score = degree/frequency quantized at 1e9
    ticks (so phrase scores are order-free integer sums); top 10
    distinct phrases reported."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def tok_counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        flat = toks.combine_chunks().flatten() if isinstance(
            toks, pa.ChunkedArray
        ) else toks.flatten()
        t = pa.table({"w": flat})
        t = t.filter(pc.not_equal(t["w"], ""))
        return t.append_column(
            "_one", pa.array(np.ones(t.num_rows, np.int64))
        )

    freqs = hash_aggregate(
        ds.map_batches(tok_counts, batch_format="pyarrow", batch_size=None),
        ["w"],
        [("_one", "sum", "n")],
    )
    stop = set(
        w
        for _, w in sorted(
            zip(freqs["n"].to_pylist(), freqs["w"].to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:10]
    )

    def phrases(batch: pa.Table) -> pa.Table:
        out_p: list[str] = []
        for i in range(batch.num_rows):
            toks = (batch["text"][i].as_py() or "").split(" ")
            run: list[str] = []
            for w in toks + [""]:
                if w == "" or w in stop:
                    if run:
                        out_p.append(" ".join(run))
                        run = []
                else:
                    run.append(w)
        return pa.table(
            {
                "phrase": pa.array(out_p, pa.string()),
                "_one": pa.array(np.ones(len(out_p), np.int64)),
            }
        )

    ph = hash_aggregate(
        ds.map_batches(phrases, batch_format="pyarrow", batch_size=None),
        ["phrase"],
        [("_one", "sum", "n")],
    )
    deg: dict[str, int] = {}
    frq: dict[str, int] = {}
    for p, c in zip(ph["phrase"].to_pylist(), ph["n"].to_pylist()):
        ws = p.split(" ")
        for w in ws:
            deg[w] = deg.get(w, 0) + len(ws) * int(c)
            frq[w] = frq.get(w, 0) + int(c)
    score_t = {
        w: int(
            round_half_away(
                np.array([float(deg[w]) / float(frq[w]) * 1e9])
            )[0]
        )
        for w in deg
    }
    scored = []
    for p, c in zip(ph["phrase"].to_pylist(), ph["n"].to_pylist()):
        st = sum(score_t[w] for w in p.split(" "))
        scored.append((st, p, int(c)))
    scored.sort(key=lambda t: (-t[0], t[1]))
    top = scored[:10]
    return pa.table(
        {
            "phrase": pa.array([t[1] for t in top], pa.string()),
            "n_occ": pa.array([t[2] for t in top], pa.int64()),
            "score": round_like_sql(
                [float(t[0]) / 1e9 for t in top], 6
            ),
            "rnk": pa.array(
                list(range(1, len(top) + 1)), pa.int64()
            ),
        }
    )


def _q_brunner_munzel(sf_dir: str) -> pa.Table:
    """Brunner-Munzel heteroscedastic rank test between click and
    error event values: 2x placements (2*C_other(<v) + m_other(v))
    and their squares are exact integers from the cents histograms,
    so the relative effect p-hat and the variance-weighted W are two
    pinned float expressions -- the unequal-variance upgrade of
    Mann-Whitney."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    hist = _type_cents_hist(sf_dir)
    et = hist["event_type"].to_pylist()
    vv = hist["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = hist["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.array([t in ("click", "error") for t in et], bool)
    grid = np.unique(vv[keep])
    pos = {int(v): i for i, v in enumerate(grid.tolist())}
    a = np.zeros(len(grid), np.int64)
    b = np.zeros(len(grid), np.int64)
    for t, v, c in zip(et, vv.tolist(), cc.tolist()):
        if t == "click":
            a[pos[v]] += c
        elif t == "error":
            b[pos[v]] += c
    n1, n2 = int(a.sum()), int(b.sum())
    # 2x placements of each group's values within the OTHER group
    p1 = 2 * (np.cumsum(b) - b) + b  # click values placed in error
    p2 = 2 * (np.cumsum(a) - a) + a
    s1 = int((a * p1).sum())
    s11 = int((a * p1 * p1).sum())
    s2 = int((b * p2).sum())
    s22 = int((b * p2 * p2).sum())
    phat = float(s1) / (2.0 * float(n1) * float(n2))
    m1 = float(s1) / float(n1)
    m2 = float(s2) / float(n2)
    v1 = (float(s11) - float(n1) * m1 * m1) / float(n1 - 1)
    v2 = (float(s22) - float(n2) * m2 * m2) / float(n2 - 1)
    w = (m2 - m1) / np.sqrt(
        4.0 * (v1 / float(n1) + v2 / float(n2))
    )
    return pa.table(
        {
            "n_click": pa.array([n1], pa.int64()),
            "n_error": pa.array([n2], pa.int64()),
            "p_hat": round_like_sql([phat], 6),
            "w_stat": round_like_sql([w], 6),
        }
    )


def _q_cusum_squares(sf_dir: str) -> pa.Table:
    """CUSUM-of-squares variance-stability screen (Brown-Durbin-
    Evans) on the daily revenue series: with integer partial sums of
    squared cents, the deviation |S_k * n - Q * k| is exact integer
    arithmetic (S_k = prefix sum of squares, Q = total); the maximum
    and its argmax day are exact, the normalized statistic one
    pinned ratio."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = [int(v) for v in ys_l]
    n = len(y)
    sq = [v * v for v in y]
    q_tot = sum(sq)
    best_dev, best_k = -1, None
    s = 0
    for k in range(1, n + 1):
        s += sq[k - 1]
        dev = abs(s * n - q_tot * k)
        if dev > best_dev:
            best_dev, best_k = dev, k
    stat = float(best_dev) / (float(q_tot) * float(n))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "argmax_k": pa.array([best_k], pa.int64()),
            "max_dev": pa.array([str(best_dev)], pa.string()),
            "stat": round_like_sql([stat], 6),
        }
    )


def _q_spectral_summary(sf_dir: str) -> pa.Table:
    """Spectral entropy and spectral flatness (Wiener entropy) of the
    daily count series over all Fourier frequencies k = 1..(n-1)//2:
    per-day cos/sin terms quantized at 1e6 (exact C/S sums per k),
    per-k power re-quantized at 1e6 ticks so the cross-frequency
    sums are order-free integers; entropy terms at 1e12."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs = np.asarray(_daily_count_series(sf_dir), np.float64)
    n = len(xs)
    t = np.arange(n, dtype=np.float64)
    kmax = (n - 1) // 2
    pq = []
    for k in range(1, kmax + 1):
        theta = 2.0 * np.pi * t * float(k) / float(n)
        cq = int(
            round_half_away(xs * np.cos(theta) * 1e6).astype(np.int64).sum()
        )
        sq = int(
            round_half_away(xs * np.sin(theta) * 1e6).astype(np.int64).sum()
        )
        c = float(cq) / 1e6
        sv = float(sq) / 1e6
        p = (c * c + sv * sv) / float(n)
        pq.append(int(round_half_away(np.array([p * 1e6]))[0]))
    tot = sum(pq)
    ent_t = 0
    log_t = 0
    n_pos = 0
    for p in pq:
        if p > 0:
            share = float(p) / float(tot)
            ent_t += int(
                round_half_away(
                    np.array([-share * np.log(share) * 1e12])
                )[0]
            )
            log_t += int(
                round_half_away(np.array([np.log(float(p)) * 1e9]))[0]
            )
            n_pos += 1
    h = float(ent_t) / 1e12
    flat = np.exp(float(log_t) / 1e9 / float(n_pos)) / (
        float(tot) / float(n_pos)
    )
    return pa.table(
        {
            "n_freqs": pa.array([kmax], pa.int64()),
            "n_pos": pa.array([n_pos], pa.int64()),
            "spec_entropy": round_like_sql([h], 6),
            "spec_entropy_norm": round_like_sql(
                [h / np.log(float(kmax))], 6
            ),
            "spec_flatness": round_like_sql([flat], 6),
        }
    )


_VOR_SITES_SQL = (
    "sites AS (SELECT * FROM (VALUES (0, 16, 16), (1, 16, 80), "
    "(2, 48, 8), (3, 48, 48), (4, 80, 16), (5, 80, 80)) "
    "AS v(i, sx, sy)), "
    "cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
    "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
    "t100 AS (SELECT cell FROM cc ORDER BY n DESC, cell "
    "LIMIT 100), "
    "nd AS (SELECT cell, cell % 96 AS x, cell // 96 AS y "
    "FROM t100), "
    "asn AS MATERIALIZED (SELECT nd.cell, nd.x, nd.y, "
    "(SELECT s.i FROM sites s ORDER BY "
    "(nd.x - s.sx) * (nd.x - s.sx) "
    "+ (nd.y - s.sy) * (nd.y - s.sy), s.i LIMIT 1) AS li "
    "FROM nd)"
)


_SEAM_INF = 1_000_000_000_000_000


def _q_seam_dp(sf_dir: str) -> pa.Table:
    """Minimum-cost vertical seam (seam-carving energy DP) through
    the 96x96 event-count grid: D[r][c] = x[r][c] +
    min(D[r-1][c-1..c+1]) with an integer edge clamp -- 95 exact
    integer DP steps, the full final-row cost profile emitted with
    deterministic ranks (95 unrolled materialized steps in SQL)."""
    cnt, _ = _grid_count_cents(sf_dir)
    d = cnt[0].copy()
    for r in range(1, 96):
        left = np.concatenate([[_SEAM_INF], d[:-1]])
        right = np.concatenate([d[1:], [_SEAM_INF]])
        d = cnt[r] + np.minimum(np.minimum(left, d), right)
    order = sorted(range(96), key=lambda c: (int(d[c]), c))
    rk = [0] * 96
    for pos, c in enumerate(order):
        rk[c] = pos + 1
    return pa.table(
        {
            "c": pa.array(list(range(96)), pa.int64()),
            "cost": pa.array(d.astype(np.int64)),
            "rnk": pa.array(rk, pa.int64()),
        }
    )


def _seam_oracle_sql() -> str:
    """Mirror of _q_seam_dp: 95 unrolled DP steps."""
    steps = []
    for r in range(1, 96):
        prev = f"d{r - 1}"
        steps.append(
            f"d{r} AS MATERIALIZED (SELECT dn.c, dn.x + LEAST("
            f"COALESCE(a.v, {_SEAM_INF}), b.v, "
            f"COALESCE(cc.v, {_SEAM_INF})) AS v FROM dn "
            f"LEFT JOIN {prev} a ON a.c = dn.c - 1 "
            f"JOIN {prev} b ON b.c = dn.c "
            f"LEFT JOIN {prev} cc ON cc.c = dn.c + 1 "
            f"WHERE dn.r = {r})"
        )
    return (
        "WITH c0 AS (SELECT event_id % 96 AS r, "
        "(event_id // 96) % 96 AS c, CAST(COUNT(*) AS BIGINT) AS x "
        "FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS r, b.range AS c FROM range(0, 96) a "
        "CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT fr.r, fr.c, COALESCE(c0.x, 0) AS x FROM fr "
        "LEFT JOIN c0 ON c0.r = fr.r AND c0.c = fr.c), "
        "d0 AS (SELECT c, x AS v FROM dn WHERE r = 0), "
        + ", ".join(steps)
        + " SELECT c, CAST(v AS BIGINT) AS cost, "
        "CAST(ROW_NUMBER() OVER (ORDER BY v, c) AS BIGINT) AS rnk "
        "FROM d95"
    )


def _q_ridge_two_var(sf_dir: str) -> pa.Table:
    """Ridge regression (cents ~ quantity + discount_bp) with a 10%
    diagonal inflation of the centered scatter matrix (generalized
    ridge; the intercept stays unpenalized via centering): all
    moments exact integers, the 2x2 Cramer solve uses arbitrary-
    precision Python ints mirrored by HUGEINT, floats only in the
    three final divisions -- the shrunk counterpart of ols_two_var."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )

    def moments(batch: pa.Table) -> pa.Table:
        x1 = round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        x2 = round_half_away(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 10000.0
        ).astype(np.int64)
        y = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(y), np.int64)),
                "_n": pa.array(np.ones(len(y), np.int64)),
                "s1": pa.array(x1),
                "s2": pa.array(x2),
                "sy": pa.array(y),
                "s11": pa.array(x1 * x1),
                "s22": pa.array(x2 * x2),
                "s12": pa.array(x1 * x2),
                "s1y": pa.array(x1 * y),
                "s2y": pa.array(x2 * y),
            }
        )

    cols = ("_n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y")
    agg = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in cols],
    )
    n, s1, s2, sy, s11, s22, s12, s1y, s2y = (
        int(agg[c][0].as_py()) for c in cols
    )
    c11 = n * s11 - s1 * s1
    c22 = n * s22 - s2 * s2
    c12 = n * s12 - s1 * s2
    c1y = n * s1y - s1 * sy
    c2y = n * s2y - s2 * sy
    a11 = c11 + c11 // 10
    a22 = c22 + c22 // 10
    det = a11 * a22 - c12 * c12
    b1 = float(c1y * a22 - c12 * c2y) / float(det)
    b2 = float(a11 * c2y - c1y * c12) / float(det)
    b0 = (float(sy) - b1 * float(s1) - b2 * float(s2)) / float(n)
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "intercept": round_like_sql([b0], 6),
            "beta_qty": round_like_sql([b1], 6),
            "beta_disc_bp": round_like_sql([b2], 6),
        }
    )


def _q_cox_stuart(sf_dir: str) -> pa.Table:
    """Cox-Stuart trend test on the daily revenue series: first-half
    vs second-half sign pairs (middle day dropped when n is odd, tied
    pairs dropped), exact integer S+/S-, binomial-normal z as one
    shared float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    n = len(y)
    m = n // 2
    off = n - m
    d = y[off : off + m] - y[:m]
    sp = int((d > 0).sum())
    sm = int((d < 0).sum())
    ne = sp + sm
    z = float(2 * sp - ne) / np.sqrt(float(ne))
    return pa.table(
        {
            "n_pairs": pa.array([ne], pa.int64()),
            "s_plus": pa.array([sp], pa.int64()),
            "s_minus": pa.array([sm], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )


def _q_runs_updown(sf_dir: str) -> pa.Table:
    """Runs up-and-down test on the daily revenue series (the
    difference-sign complement of the above/below-median runs_test):
    tied consecutive days dropped, runs of increase/decrease counted,
    classical (2n-1)/3 and (16n-29)/90 moments with n = kept signs
    + 1."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    d = y[1:] - y[:-1]
    s = np.sign(d[d != 0])
    runs = int(1 + (s[1:] != s[:-1]).sum()) if len(s) else 0
    n = len(s) + 1
    z = (float(runs) - (2.0 * float(n) - 1.0) / 3.0) / np.sqrt(
        (16.0 * float(n) - 29.0) / 90.0
    )
    return pa.table(
        {
            "n_obs": pa.array([n], pa.int64()),
            "runs": pa.array([runs], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )


def _q_mh_odds(sf_dir: str) -> pa.Table:
    """Mantel-Haenszel common odds ratio and the CMH chi-square
    across day-of-week strata: exposure = click vs error, outcome =
    event cents strictly above the pooled exact lower median; all
    2x2 cells exact integers from the distributed groupby tier,
    per-stratum rational terms quantized at 1e6 ticks, both
    statistics pinned floats over exact tick sums."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(
            batch["event_type"], value_set=pa.array(["click", "error"])
        )
        batch = batch.filter(keep)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dow": pa.array((us // 86_400_000_000) % 7),
                "event_type": batch["event_type"],
                "v": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["dow", "event_type", "v"],
        [("_one", "sum", "c")],
    )
    dow = agg["dow"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = agg["event_type"].to_pylist()
    vv = agg["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    # pooled exact lower median from the value histogram
    order = np.argsort(vv, kind="stable")
    tot = int(cc.sum())
    target = (tot + 1) // 2
    med = None
    seen: dict[int, int] = {}
    for i in order.tolist():
        seen[int(vv[i])] = seen.get(int(vv[i]), 0) + int(cc[i])
    cum = 0
    for v in sorted(seen):
        cum += seen[v]
        if cum >= target:
            med = v
            break
    cells = {(s, e, o): 0 for s in range(7) for e in (0, 1) for o in (0, 1)}
    for s, t, v, c in zip(dow.tolist(), et, vv.tolist(), cc.tolist()):
        e = 1 if t == "click" else 0
        o = 1 if v > med else 0
        cells[(int(s), e, o)] += int(c)
    num_t, den_t, a_sum, e_t, var_t = 0, 0, 0, 0, 0
    for s in range(7):
        a = cells[(s, 1, 1)]
        b = cells[(s, 1, 0)]
        c2 = cells[(s, 0, 1)]
        d = cells[(s, 0, 0)]
        n_s = a + b + c2 + d
        if n_s == 0:
            continue
        a_sum += a
        num_t += int(
            round_half_away(
                np.array([float(a) * float(d) / float(n_s) * 1e6])
            )[0]
        )
        den_t += int(
            round_half_away(
                np.array([float(b) * float(c2) / float(n_s) * 1e6])
            )[0]
        )
        e_t += int(
            round_half_away(
                np.array(
                    [float(a + b) * float(a + c2) / float(n_s) * 1e6]
                )
            )[0]
        )
        var_t += int(
            round_half_away(
                np.array(
                    [
                        float(a + b) * float(c2 + d) * float(a + c2)
                        * float(b + d)
                        / (
                            float(n_s) * float(n_s) * float(n_s - 1)
                        ) * 1e6
                    ]
                )
            )[0]
        )
    mh_or = float(num_t) / float(den_t)
    diff = (float(a_sum) * 1e6 - float(e_t)) / 1e6
    chi2 = diff * diff / (float(var_t) / 1e6)
    return pa.table(
        {
            "median_cents": pa.array([med], pa.int64()),
            "a_sum": pa.array([a_sum], pa.int64()),
            "mh_or": round_like_sql([mh_or], 6),
            "cmh_chi2": round_like_sql([chi2], 6),
        }
    )


def _q_kulldorff_scan(sf_dir: str) -> pa.Table:
    """Kulldorff spatial scan statistic over square windows of the
    96x96 event-count grid: candidate zones are Chebyshev windows
    (radius 2/4/8/16) around the 12 hottest cells; window counts come
    from the DISTRIBUTED summed-area table (stages/scan.py::grid_sat
    -- four SAT lookups per zone), the Poisson log-likelihood ratio
    is 1e9-tick quantized, candidates ranked by tick."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.scan import (
        grid_sat,
    )
    import ray.data

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        cell = (
            batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % 9216
        )
        return pa.table(
            {
                "r": pa.array(cell // 96),
                "c": pa.array(cell % 96),
                "_one": pa.array(np.ones(len(cell), np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["r", "c"],
        [("_one", "sum", "x")],
    )
    sat_t = collect_tables(
        grid_sat(ray.data.from_arrow(counts), grid=96, side=16)
    )
    sat = np.zeros((96, 96), np.int64)
    sat[
        sat_t["r"].to_numpy(zero_copy_only=False),
        sat_t["c"].to_numpy(zero_copy_only=False),
    ] = sat_t["sat"].to_numpy(zero_copy_only=False)
    n_tot = int(sat[-1, -1])

    def box(r0: int, c0: int, r1: int, c1: int) -> int:
        """Inclusive box sum via 4 SAT lookups."""
        s = int(sat[r1, c1])
        if r0 > 0:
            s -= int(sat[r0 - 1, c1])
        if c0 > 0:
            s -= int(sat[r1, c0 - 1])
        if r0 > 0 and c0 > 0:
            s += int(sat[r0 - 1, c0 - 1])
        return s

    cr = counts["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = counts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    cx = counts["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    hot = sorted(
        zip(cx.tolist(), cr.tolist(), cc.tolist()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:12]
    rows = []
    for _, hr, hc in hot:
        for rad in (2, 4, 8, 16):
            r0, c0 = max(0, hr - rad), max(0, hc - rad)
            r1, c1 = min(95, hr + rad), min(95, hc + rad)
            area = (r1 - r0 + 1) * (c1 - c0 + 1)
            c_in = box(r0, c0, r1, c1)
            e = float(n_tot) * float(area) / 9216.0
            if float(c_in) > e and c_in < n_tot:
                llr = float(c_in) * np.log(float(c_in) / e) + float(
                    n_tot - c_in
                ) * np.log(float(n_tot - c_in) / (float(n_tot) - e))
            else:
                llr = 0.0
            tick = int(round_half_away(np.array([llr * 1e9]))[0])
            rows.append((hr, hc, rad, c_in, area, tick))
    rows.sort(key=lambda t: (-t[5], t[0], t[1], t[2]))
    return pa.table(
        {
            "center_r": pa.array([r[0] for r in rows], pa.int64()),
            "center_c": pa.array([r[1] for r in rows], pa.int64()),
            "radius": pa.array([r[2] for r in rows], pa.int64()),
            "n_in": pa.array([r[3] for r in rows], pa.int64()),
            "area": pa.array([r[4] for r in rows], pa.int64()),
            "llr": round_like_sql(
                [float(r[5]) / 1e9 for r in rows], 6
            ),
            "rnk": pa.array(
                list(range(1, len(rows) + 1)), pa.int64()
            ),
        }
    )


def _q_retile_extract(sf_dir: str) -> pa.Table:
    """Grid re-tiling end to end: the 48-side fixture tiles re-laid
    onto a MISALIGNED 32-side lattice (stages/raster.py::retile, one
    fragment shuffle, each pixel moved exactly once), then per-pixel
    extraction -- every valid pixel must survive with its exact value
    and absolute coordinates, which the oracle grid SQL pins."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        retile,
    )

    tiles = ray.data.from_arrow(_og_tiles_table())
    out = retile(tiles, new_side=32, grid_h=OG_H, grid_w=OG_W)

    def extract(batch: pa.Table) -> pa.Table:
        rows, cols, zs = [], [], []
        for i in range(batch.num_rows):
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            vals = np.asarray(
                batch["values"][i].as_py(), np.float32
            ).reshape(h, w).astype(np.float64)
            ok = vals > -1e30
            rr, cc = np.nonzero(ok)
            rows.append(rr + r0)
            cols.append(cc + c0)
            zs.append(vals[rr, cc])
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows).astype(np.int64)),
                "col": pa.array(np.concatenate(cols).astype(np.int64)),
                "z": pa.array(np.concatenate(zs)),
            }
        )

    t = collect_tables(
        out.map_batches(extract, batch_format="pyarrow", batch_size=None)
    )
    return pa.table(
        {
            "row": t["row"],
            "col": t["col"],
            "z": round_like_sql(t["z"], 6),
        }
    )


def _q_kuiper_test(sf_dir: str) -> pa.Table:
    """Kuiper's V statistic between the hour-of-day CDFs of click vs
    error events (the rotation-invariant KS cousin): per-bin
    cumulative-share differences quantized at 1e12 ticks, D+ and D-
    exact integer maxima, V their sum."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    cnts = _hour_type_counts(sf_dir)
    a = np.array([cnts[("click", h)] for h in range(24)], np.int64)
    b = np.array([cnts[("error", h)] for h in range(24)], np.int64)
    n1, n2 = int(a.sum()), int(b.sum())
    ca, cb = np.cumsum(a), np.cumsum(b)
    dp_t, dm_t = 0, 0
    for h in range(24):
        p = float(ca[h]) / float(n1)
        q = float(cb[h]) / float(n2)
        dpt = int(round_half_away(np.array([(p - q) * 1e12]))[0])
        dp_t = max(dp_t, dpt)
        dm_t = max(dm_t, -dpt)
    return pa.table(
        {
            "n_click": pa.array([n1], pa.int64()),
            "n_error": pa.array([n2], pa.int64()),
            "d_plus": round_like_sql([float(dp_t) / 1e12], 6),
            "d_minus": round_like_sql([float(dm_t) / 1e12], 6),
            "v_stat": round_like_sql(
                [float(dp_t + dm_t) / 1e12], 6
            ),
        }
    )


def _q_page_trend(sf_dir: str) -> pa.Table:
    """Page's L trend test for a monotone weekday effect: complete
    weeks of the dense daily revenue series, within-week 2x
    tie-averaged ranks (exact integers), L2 = sum(position * rank2);
    the z-score uses the classical k=7 moments as one shared float
    expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    _, ys_l = _daily_count_cents_series(sf_dir)
    y = np.asarray(ys_l, np.int64)
    n_weeks = len(y) // 7
    l2 = 0
    for w in range(n_weeks):
        wk = y[w * 7 : (w + 1) * 7]
        for j in range(7):
            lt = int((wk < wk[j]).sum())
            eq = int((wk == wk[j]).sum())
            r2 = 2 * lt + eq + 1
            l2 += (j + 1) * r2
    e = float(n_weeks * 7 * 8 * 8) / 4.0
    var = float(n_weeks * 49 * 8 * 48) / 144.0
    z = (float(l2) / 2.0 - e) / np.sqrt(var)
    return pa.table(
        {
            "n_weeks": pa.array([n_weeks], pa.int64()),
            "l2": pa.array([l2], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )


def _q_theil_decomp(sf_dir: str) -> pa.Table:
    """Theil T inequality of document lengths decomposed into
    between-source and within-source components: pass 1 aggregates
    per-source (count, char sum); pass 2 broadcasts the global totals
    and computes PER-DOCUMENT 1e12-tick terms inside map_batches
    (distributed -- the tick sum is the only thing aggregated);
    within = total - between in exact tick space."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "n_chars"],
    )
    per_src = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "source": b["source"],
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                    "nch": b["n_chars"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        ),
        ["source"],
        [("_one", "sum", "ng"), ("nch", "sum", "sg")],
    )
    ng = per_src["ng"].to_numpy(zero_copy_only=False).astype(np.int64)
    sg = per_src["sg"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tot = int(ng.sum())
    s_tot = int(sg.sum())

    def doc_terms(batch: pa.Table) -> pa.Table:
        x = batch["n_chars"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        t = (
            x / float(s_tot)
            * np.log(x * float(n_tot) / float(s_tot)) * 1e12
        )
        tq = round_half_away(t).astype(np.int64)
        return pa.table({"tq": pa.array([int(tq.sum())], pa.int64())})

    agg = hash_aggregate(
        _read_pq(
            os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"]
        ).map_batches(doc_terms, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda b: b.append_column("_k", pa.array([0] * b.num_rows)),
            batch_format="pyarrow", batch_size=None,
        ),
        ["_k"],
        [("tq", "sum", "tq")],
    )
    t_ticks = int(agg["tq"][0].as_py())
    b_ticks = 0
    for g, s in zip(ng.tolist(), sg.tolist()):
        term = (
            float(s) / float(s_tot)
            * np.log(
                float(s) * float(n_tot) / (float(s_tot) * float(g))
            ) * 1e12
        )
        b_ticks += int(round_half_away(np.array([term]))[0])
    return pa.table(
        {
            "n_docs": pa.array([n_tot], pa.int64()),
            "theil_total": round_like_sql([float(t_ticks) / 1e12], 6),
            "theil_between": round_like_sql([float(b_ticks) / 1e12], 6),
            "theil_within": round_like_sql(
                [float(t_ticks - b_ticks) / 1e12], 6
            ),
        }
    )


def _q_ansari_bradley(sf_dir: str) -> pa.Table:
    """Ansari-Bradley scale test between click and error event values:
    2x tie-averaged pooled ranks folded to 2x AB scores (all exact
    integers from the cents histograms), z from the classical
    even/odd-N moments as one shared CASE float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    hist = _type_cents_hist(sf_dir)
    et = hist["event_type"].to_pylist()
    vv = hist["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = hist["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = [t in ("click", "error") for t in et]
    grid = np.unique(vv[np.asarray(keep)])
    pos = {int(v): i for i, v in enumerate(grid.tolist())}
    a = np.zeros(len(grid), np.int64)
    b = np.zeros(len(grid), np.int64)
    for t, v, c in zip(et, vv.tolist(), cc.tolist()):
        if t == "click":
            a[pos[v]] += c
        elif t == "error":
            b[pos[v]] += c
    m = a + b
    n1, n2 = int(a.sum()), int(b.sum())
    n = n1 + n2
    c_lt = np.cumsum(m) - m
    r2 = 2 * c_lt + m + 1  # 2x tie-averaged pooled rank
    s2 = np.minimum(r2, 2 * (n + 1) - r2)  # 2x AB score
    ab2 = int((a * s2).sum())
    if n % 2 == 0:
        e = float(n1 * (n + 2)) / 4.0
        var = (
            float(n1) * float(n2) * float(n + 2) * float(n - 2)
            / (48.0 * float(n - 1))
        )
    else:
        e = float(n1 * (n + 1) * (n + 1)) / (4.0 * float(n))
        var = (
            float(n1) * float(n2) * float(n + 1)
            * float(3 + n * n) / (48.0 * float(n) * float(n))
        )
    z = (float(ab2) / 2.0 - e) / np.sqrt(var)
    return pa.table(
        {
            "n_click": pa.array([n1], pa.int64()),
            "n_error": pa.array([n2], pa.int64()),
            "ab2": pa.array([ab2], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )


def _q_grid_prefix_sums(sf_dir: str) -> pa.Table:
    """Distributed summed-area table (2-D prefix scan) of the 96x96
    event-count grid: per-tile local SAT + O(side)-byte descriptor
    exchange + broadcast offset finalize -- the two-phase distributed
    scan primitive (stages/scan.py::grid_sat); every output an exact
    int64.  The SQL mirror is the double windowed cumsum."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.scan import (
        grid_sat,
    )
    import ray.data

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        cell = (
            batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % 9216
        )
        return pa.table(
            {
                "r": pa.array(cell // 96),
                "c": pa.array(cell % 96),
                "_one": pa.array(np.ones(len(cell), np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["r", "c"],
        [("_one", "sum", "x")],
    )
    out = collect_tables(
        grid_sat(ray.data.from_arrow(counts), grid=96, side=16)
    )
    idx = pa.compute.sort_indices(
        out, sort_keys=[("r", "ascending"), ("c", "ascending")]
    )
    return out.take(idx)


def _q_turning_points(sf_dir: str) -> pa.Table:
    """Turning-points test for randomness of the daily event-count
    series: exact integer count of strict interior local extrema, the
    classical N(2(n-2)/3, (16n-29)/90) z as one shared float
    expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs = np.asarray(_daily_count_series(sf_dir), np.int64)
    n = len(xs)
    a, b, c = xs[:-2], xs[1:-1], xs[2:]
    t = int((((a < b) & (b > c)) | ((a > b) & (b < c))).sum())
    z = (float(t) - 2.0 * float(n - 2) / 3.0) / np.sqrt(
        (16.0 * float(n) - 29.0) / 90.0
    )
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_turning": pa.array([t], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )


def _q_sample_entropy(sf_dir: str) -> pa.Table:
    """Sample entropy (m=2, Chebyshev) of the daily count series:
    tolerance r = max(1, 20% of the mean daily count, exact integer
    division), template-match counts B (length-2) and A (length-3)
    over i<j pairs are exact integers, SampEn = ln(B/A) is the single
    pinned float."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs = np.asarray(_daily_count_series(sf_dir), np.int64)
    n = len(xs)
    r = max(1, int(xs.sum()) // (5 * n))
    t0, t1, t2 = xs[: n - 2], xs[1 : n - 1], xs[2:]
    m = n - 2
    d0 = np.abs(t0[:, None] - t0[None, :])
    d1 = np.abs(t1[:, None] - t1[None, :])
    d2 = np.abs(t2[:, None] - t2[None, :])
    upper = np.triu(np.ones((m, m), bool), 1)
    bmask = (np.maximum(d0, d1) <= r) & upper
    amask = bmask & (d2 <= r)
    b_cnt, a_cnt = int(bmask.sum()), int(amask.sum())
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "r_tol": pa.array([r], pa.int64()),
            "b_count": pa.array([b_cnt], pa.int64()),
            "a_count": pa.array([a_cnt], pa.int64()),
            "sampen": round_like_sql(
                [float(np.log(float(b_cnt) / float(a_cnt)))], 6
            ),
        }
    )


def _q_perm_entropy(sf_dir: str) -> pa.Table:
    """Permutation (ordinal-pattern) entropy, order 3, of the daily
    count series: pattern code from three <=-comparisons (earlier
    index wins ties -- total order, two of eight codes impossible),
    exact integer pattern counts, per-pattern p*ln(p) terms quantized
    at 1e12 ticks (order-free int sum), H and H/ln(6) pinned."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs = np.asarray(_daily_count_series(sf_dir), np.int64)
    x0, x1, x2 = xs[:-2], xs[1:-1], xs[2:]
    code = (
        4 * (x0 <= x1).astype(np.int64)
        + 2 * (x0 <= x2).astype(np.int64)
        + (x1 <= x2).astype(np.int64)
    )
    n_tr = len(code)
    codes, counts = np.unique(code, return_counts=True)
    tq = 0
    for c in counts.tolist():
        p = float(c) / float(n_tr)
        tq += int(round_half_away(np.array([p * np.log(p) * 1e12]))[0])
    h = -float(tq) / 1e12
    top = sorted(zip(counts.tolist(), codes.tolist()), key=lambda t: (-t[0], t[1]))[0]
    return pa.table(
        {
            "n_triples": pa.array([n_tr], pa.int64()),
            "top_code": pa.array([int(top[1])], pa.int64()),
            "top_n": pa.array([int(top[0])], pa.int64()),
            "h_nats": round_like_sql([h], 6),
            "h_norm": round_like_sql([h / np.log(6.0)], 6),
        }
    )


def _st_run_sum(a: int, b: int, n: int) -> int:
    """Sum of Siegel-Tukey alternating-extreme ranks over the
    contiguous position run [a, b] (1-based, inclusive) of n pooled
    observations -- closed form, so the engine never expands the
    n-row position vector.  Rank law: position i gets, from the low
    end (p = i, while 2i <= n+1), 2p-1 if p odd else 2p (clamped to n
    at the odd-n middle); from the high end (q = n+1-i), 2q if q odd
    else 2q-1."""
    m = (n + 1) // 2  # last low-side position
    tot = 0
    lo_b = min(b, m)
    if a <= lo_b:
        n_odd = (lo_b + 1) // 2 - a // 2
        tot += (a + lo_b) * (lo_b - a + 1) - n_odd
        # odd-n middle with even m has f(m) = 2m = n+1 -> clamp to n
        if n % 2 == 1 and m % 2 == 0 and a <= m <= lo_b:
            tot -= 1
    hi_a = max(a, m + 1)
    if hi_a <= b:
        qa, qb = n + 1 - b, n + 1 - hi_a
        n_even = qb // 2 - (qa - 1) // 2
        tot += (qa + qb) * (qb - qa + 1) - n_even
    return tot


def _q_siegel_tukey(sf_dir: str) -> pa.Table:
    """Siegel-Tukey test of scale between the mix32 A/B arms: pooled
    observations take alternating extreme ranks (1 to the min, 2-3 to
    the two maxima, 4-5 to the next two minima, ...) so a scale shift
    moves the rank sum; the z tail is the Mann-Whitney normal
    approximation.  Positions are deterministic (ORDER BY cents, arm;
    ties positional -- documented), and each (cents, arm) group's rank
    sum over its contiguous position run is a closed form over the
    combiner-aggregated count table, never an n-row expansion."""
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
        columns=["user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "arm": pa.array(mix32(uid, 37) % 2),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c", "arm"],
        [("_one", "sum", "n")],
    ).sort_by([("c", "ascending"), ("arm", "ascending")])
    arm = counts["arm"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    big_n = int(n.sum())
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    w_a = 0
    for s, cnt, a in zip(starts.tolist(), n.tolist(), arm.tolist()):
        if a == 0:
            w_a += _st_run_sum(s + 1, s + cnt, big_n)
    n_a = int(n[arm == 0].sum())
    n_b = big_n - n_a
    u_a = float(w_a) - float(n_a) * (float(n_a) + 1.0) / 2.0
    z = (u_a - float(n_a) * float(n_b) / 2.0) / np.sqrt(
        float(n_a) * float(n_b) * (float(n_a) + float(n_b) + 1.0) / 12.0
    )
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "w_a": pa.array([w_a], pa.int64()),
            "z_stat": round_like_sql([float(z)], 6),
        }
    )


def _q_conover_squared_ranks(sf_dir: str) -> pa.Table:
    """Conover squared-ranks test of variance between the mix32 A/B
    arms (the arithmetic-only cousin of Fligner-Killeen, which needs
    normal scores DuckDB cannot express): deviations d = |c - med_arm|
    from the distributed exact per-arm medians, pooled tie-averaged
    ranks doubled into exact integers Q = 2R, and the z statistic
    assembled from exact HUGEINT/bigint moments (N*T' - n_a*S2' and
    N*S4' - S2'^2 are integers; floats only in the final two
    square roots)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "arm": pa.array(mix32(uid, 29) % 2),
            }
        )

    kd = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    med_tbl = collect_tables(grouped_exact_quantiles(kd, "arm", "c", [0.5]))
    meds = {}
    vcol = med_tbl.column(med_tbl.num_columns - 1)
    for i in range(med_tbl.num_rows):
        meds[int(med_tbl["arm"][i].as_py())] = int(vcol[i].as_py())

    def absdev(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        a = batch["arm"].to_numpy(zero_copy_only=False)
        med = np.where(a == 0, meds[0], meds[1])
        return pa.table(
            {
                "d": pa.array(np.abs(c - med)),
                "arm": batch["arm"],
                "_one": pa.array(np.ones(len(c), np.int64)),
            }
        )

    counts = hash_aggregate(
        kd.map_batches(absdev, batch_format="pyarrow", batch_size=None),
        ["d", "arm"],
        [("_one", "sum", "n")],
    ).sort_by([("d", "ascending"), ("arm", "ascending")])
    d = counts["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    arm = counts["arm"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals, inv = np.unique(d, return_inverse=True)
    n_d = np.zeros(len(vals), np.int64)
    np.add.at(n_d, inv, n)
    rank_min = 1 + np.concatenate(([0], np.cumsum(n_d)[:-1]))
    big_n = int(n.sum())
    t4 = 0  # sum over arm 0 of n * (2R)^2   (exact int)
    s2 = 0  # sum over all of n * (2R)^2
    s4 = 0  # sum over all of n * (2R)^4     (Python int <-> HUGEINT)
    n_a = 0
    for gi, a, cnt in zip(inv.tolist(), arm.tolist(), n.tolist()):
        q = 2 * int(rank_min[gi]) + int(n_d[gi]) - 1  # = 2 * avgrank
        q2 = q * q
        s2 += cnt * q2
        s4 += cnt * q2 * q2
        if a == 0:
            t4 += cnt * q2
            n_a += cnt
    n_b = big_n - n_a
    num = big_n * t4 - n_a * s2
    # n_a*n_b*(N*S4 - S2^2) overflows INT128 at sf0.1 -- split the
    # product into one pinned float multiply (identical in SQL)
    den = float(n_a * n_b) * float(big_n * s4 - s2 * s2)
    z = float(num) * np.sqrt(float(big_n - 1)) / np.sqrt(den)
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "t_sq4": pa.array([t4], pa.int64()),
            "z_stat": round_like_sql([float(z)], 6),
        }
    )


def _q_quade_test(sf_dir: str) -> pa.Table:
    """Quade test (weighted rank ANOVA for complete blocks): blocks =
    calendar days with all 5 event types, treatments = event types,
    observation = mean value cents per cell.  Within-block treatment
    ranks and across-block range ranks are deterministic ROW_NUMBER
    conventions (ties by type / day -- documented); S_bt = Q_b*(r-3)
    is integer, so A and B' are exact int64 and F = (b-1)B'/(bA - B')
    is a single float division."""
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
        [("_one", "sum", "n"), ("c", "sum", "s")],
    )
    cells: dict[int, dict[str, float]] = {}
    for i in range(agg.num_rows):
        day = int(agg["day"][i].as_py())
        cells.setdefault(day, {})[agg["t"][i].as_py()] = float(
            int(agg["s"][i].as_py())
        ) / float(int(agg["n"][i].as_py()))
    days = sorted(dd for dd, m in cells.items() if len(m) == 5)
    b = len(days)
    k = 5
    # within-block ranks (ORDER BY mean, type) and block ranges
    rk: dict[tuple[int, str], int] = {}
    rng: list[tuple[float, int]] = []
    for day in days:
        m = cells[day]
        for pos, (mu, t) in enumerate(
            sorted((mu, t) for t, mu in m.items())
        ):
            rk[(day, t)] = pos + 1
        rng.append((max(m.values()) - min(m.values()), day))
    qb = {day: pos + 1 for pos, (_, day) in enumerate(sorted(rng))}
    a_term = 0
    s_t: dict[str, int] = {}
    for (day, t), r in rk.items():
        sv = qb[day] * (r - (k + 1) // 2)
        a_term += sv * sv
        s_t[t] = s_t.get(t, 0) + sv
    b_term = sum(v * v for v in s_t.values())
    f = float((b - 1) * b_term) / float(b * a_term - b_term)
    return pa.table(
        {
            "n_blocks": pa.array([b], pa.int64()),
            "a_term": pa.array([a_term], pa.int64()),
            "b_term": pa.array([b_term], pa.int64()),
            "f_stat": round_like_sql([f], 6),
        }
    )


def _q_pcsa_distinct(sf_dir: str) -> pa.Table:
    """Flajolet-Martin PCSA distinct-count sketch over user_id (the
    1983 ancestor of the HLL the engine already carries): 64 buckets
    by mix32 low bits, per-bucket bitmap of trailing-zero counts, R =
    index of the lowest unset bit, estimate m/phi * 2^mean(R).  The
    distributed pass emits only (bucket, tz) pairs -- the combiner
    output is bounded by 64 x 32 rows regardless of cardinality."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix32(uid, 51)
        bkt = h % 64
        rest = h // 64
        low = rest & -rest
        tz = np.where(
            rest == 0,
            np.int64(30),
            np.minimum(_popcount64(low - 1), 30),
        )
        return pa.table(
            {
                "bkt": pa.array(bkt),
                "tz": pa.array(tz.astype(np.int64)),
                "_one": pa.array(np.ones(len(h), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["bkt", "tz"],
        [("_one", "sum", "n")],
    )
    bits = np.zeros(64, np.int64)
    for b, t in zip(agg["bkt"].to_pylist(), agg["tz"].to_pylist()):
        bits[int(b)] |= 1 << int(t)
    r_sum = 0
    for b in range(64):
        c = (bits[b] + 1) & ~bits[b]  # isolated lowest zero bit
        r_sum += int(c - 1).bit_count()
    est = 64.0 / 0.77351 * 2.0 ** (float(r_sum) / 64.0)
    # exact distinct for calibration (one distributed distinct)
    exact = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    ).unique("user_id")
    return pa.table(
        {
            "r_sum": pa.array([r_sum], pa.int64()),
            "pcsa_estimate": round_like_sql([est], 6),
            "exact_distinct": pa.array([len(exact)], pa.int64()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of non-negative int64 values."""
    v = x.astype(np.uint64)
    out = np.zeros(len(v), np.int64)
    while True:
        nz = v != 0
        if not nz.any():
            break
        out += (v & np.uint64(1)).astype(np.int64)
        v = v >> np.uint64(1)
    return out


def _q_hodges_lehmann(sf_dir: str) -> pa.Table:
    """Hodges-Lehmann shift estimator between the mix32 A/B arms:
    the median of all n_a x n_b pairwise differences, computed from
    the deci-cent value histograms (outer difference of the two
    bounded count vectors -- never an O(n^2) row expansion).  The
    lower/upper median selection is the explicit cumulative-weight
    rule, identical in SQL."""
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
        columns=["user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "d10": pa.array(scaled_int(batch["value"], 10.0)),
                "arm": pa.array(mix32(uid, 41) % 2),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["d10", "arm"],
        [("_one", "sum", "n")],
    )
    d10 = counts["d10"].to_numpy(zero_copy_only=False).astype(np.int64)
    arm = counts["arm"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    va, na = d10[arm == 0], n[arm == 0]
    vb, nb = d10[arm == 1], n[arm == 1]
    diff = (va[:, None] - vb[None, :]).ravel()
    w = (na[:, None] * nb[None, :]).ravel()
    order = np.argsort(diff, kind="stable")
    diff, w = diff[order], w[order]
    # merge equal diffs
    uvals, start = np.unique(diff, return_index=True)
    wsum = np.add.reduceat(w, start)
    cum = np.cumsum(wsum)
    n_pairs = int(cum[-1])
    k1 = (n_pairs + 1) // 2
    k2 = n_pairs // 2 + 1
    lo = int(uvals[np.searchsorted(cum, k1)])
    hi = int(uvals[np.searchsorted(cum, k2)])
    hl = (float(lo) + float(hi)) / 2.0 / 10.0
    return pa.table(
        {
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "lo_d10": pa.array([lo], pa.int64()),
            "hi_d10": pa.array([hi], pa.int64()),
            "hl_shift": round_like_sql([hl], 6),
        }
    )


def _q_krippendorff_alpha(sf_dir: str) -> pa.Table:
    """Krippendorff's alpha (nominal) with variable raters per unit:
    units = (user, day) with >= 2 events, values = the event types of
    the first min(3, m) events by (ts, event_id).  Coincidence-matrix
    contributions 1/(m_u - 1) are doubled into exact integers (m_u-1
    is 1 or 2), so D_o and D_e reduce to one float division:
    alpha = 1 - D_o' * (n' - 2) / sum_{c != c'} n'_c n'_{c'}."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
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
        ti = np.array(
            [tmap[t] for t in batch["event_type"].to_pylist()], np.int64
        )
        return pa.table(
            {
                "subj": pa.array(uid * 1_000_000 + ts // 86_400_000_000),
                "ts": pa.array(ts),
                "eid": pa.array(eid),
                "ti": pa.array(ti),
            }
        )

    ocols = [f"o{i}_{j}" for i in range(k) for j in range(k)]

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {"one": pa.array([], pa.int64())}
                | {c: pa.array([], pa.int64()) for c in ocols}
            )
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["eid"].to_numpy(zero_copy_only=False)
        ti = group["ti"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))[:3]
        mu = len(order)
        wgt = 2 if mu == 2 else 1  # = 2 / (m_u - 1), exact
        n_j = np.bincount(ti[order], minlength=k).astype(np.int64)
        row: dict[str, pa.Array] = {"one": pa.array([1], pa.int64())}
        for i in range(k):
            for j in range(k):
                o = n_j[i] * n_j[j] - (n_j[i] if i == j else 0)
                row[f"o{i}_{j}"] = pa.array([wgt * int(o)], pa.int64())
        return pa.table(row)

    per_subj = grouped_by_key(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "subj",
        kernel,
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    agg = hash_aggregate(
        per_subj.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["g"],
        [("one", "sum", "n_units")]
        + [(c, "sum", c) for c in ocols],
    )
    o = np.zeros((k, k), np.int64)
    for i in range(k):
        for j in range(k):
            o[i, j] = int(agg[f"o{i}_{j}"][0].as_py())
    n_c = o.sum(axis=1)
    ntot = int(n_c.sum())
    d_o = int(o.sum() - np.trace(o))
    d_e = int(n_c.sum() * n_c.sum() - (n_c * n_c).sum())
    alpha = 1.0 - float(d_o * (ntot - 2)) / float(d_e)
    return pa.table(
        {
            "n_units": pa.array(
                [int(agg["n_units"][0].as_py())], pa.int64()
            ),
            "n_values2": pa.array([ntot], pa.int64()),
            "d_o2": pa.array([d_o], pa.int64()),
            "alpha": round_like_sql([alpha], 6),
        }
    )


def _q_k_center_greedy(sf_dir: str) -> pa.Table:
    """Greedy k-center (Gonzalez 2-approximation) over the top-20
    value cells: seed at the max-value cell, then 4x add the point
    maximizing the min squared distance to the chosen centers
    (deterministic ties by cell id).  Classic facility-placement /
    coreset-seeding primitive; exact integer distances, 4 unrolled
    argmax steps in SQL."""
    items = _top_value_cells(sf_dir)
    pts = [(c, c % 96, c // 96) for c, _ in items]
    # seed: max value = first item (ties already broken by cell)
    chosen = [pts[0]]
    rows = [(1, pts[0][0], 0)]
    mind = {
        c: (x - pts[0][1]) ** 2 + (y - pts[0][2]) ** 2
        for c, x, y in pts
    }
    for step in range(2, 6):
        nxt = max(
            (p for p in pts if p[0] not in {c[0] for c in chosen}),
            key=lambda p: (mind[p[0]], -p[0]),
        )
        rows.append((step, nxt[0], mind[nxt[0]]))
        chosen.append(nxt)
        for c, x, y in pts:
            d2 = (x - nxt[1]) ** 2 + (y - nxt[2]) ** 2
            if d2 < mind[c]:
                mind[c] = d2
    return pa.table(
        {
            "step": pa.array([r[0] for r in rows], pa.int64()),
            "cell": pa.array([r[1] for r in rows], pa.int64()),
            "sep_d2": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


_TOPVAL_CELLS_SQL = (
    "cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 AS cell, "
    "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v "
    "FROM events GROUP BY 1), "
    "top20 AS (SELECT cell, v FROM cc ORDER BY v DESC, cell LIMIT 20)"
)


def _k_center_oracle_sql() -> str:
    """Mirror of _q_k_center_greedy: 4 unrolled farthest-point steps."""
    steps = []
    for s in range(2, 6):
        prev = f"m{s - 1}"
        steps.append(
            f"c{s} AS (SELECT cell, x, y, md FROM {prev} "
            f"ORDER BY md DESC, cell LIMIT 1), "
            f"m{s} AS (SELECT m.cell, m.x, m.y, "
            f"LEAST(m.md, (m.x - c.x) * (m.x - c.x) "
            f"+ (m.y - c.y) * (m.y - c.y)) AS md "
            f"FROM {prev} m, c{s} c WHERE m.cell <> c.cell)"
        )
    sel = ["SELECT 1 AS step, cell, 0 AS sep_d2 FROM c1"] + [
        f"SELECT {s} AS step, cell, md AS sep_d2 FROM c{s}"
        for s in range(2, 6)
    ]
    return (
        "WITH " + _TOPVAL_CELLS_SQL + ", "
        "nd AS (SELECT cell, cell % 96 AS x, cell // 96 AS y, v "
        "FROM top20), "
        "c1 AS (SELECT cell, x, y FROM nd ORDER BY v DESC, cell "
        "LIMIT 1), "
        "m1 AS (SELECT nd.cell, nd.x, nd.y, "
        "(nd.x - c1.x) * (nd.x - c1.x) "
        "+ (nd.y - c1.y) * (nd.y - c1.y) AS md "
        "FROM nd, c1 WHERE nd.cell <> c1.cell), "
        + ", ".join(steps)
        + " SELECT CAST(step AS BIGINT) AS step, "
        "CAST(cell AS BIGINT) AS cell, "
        "CAST(sep_d2 AS BIGINT) AS sep_d2 FROM ("
        + " UNION ALL ".join(sel)
        + ")"
    )


def _q_set_cover_greedy(sf_dir: str) -> pa.Table:
    """Greedy set cover: sets = the top-10 users by event count,
    universe = the distinct geocode cells those users visit; 5
    rounds, each picking the user covering the most uncovered cells
    (ties by user_id; picked users leave the pool).  The classic
    ln(n)-approximation, as data summarization / sensor placement.
    The distributed pass reduces to distinct (user, cell) pairs;
    the greedy loop touches only that bounded relation."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cell": pa.array(eid % 96 + (eid // 96 % 96) * 96),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    pc = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id", "cell"],
        [("_one", "sum", "n")],
    )
    uid = pc["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = pc["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = pc["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    tot: dict[int, int] = {}
    sets: dict[int, set[int]] = {}
    for u, c, cnt in zip(uid.tolist(), cell.tolist(), nn.tolist()):
        tot[u] = tot.get(u, 0) + cnt
        sets.setdefault(u, set()).add(c)
    top10 = sorted(tot, key=lambda u: (-tot[u], u))[:10]
    pool = list(top10)
    covered: set[int] = set()
    rows = []
    for rnd in range(1, 6):
        pick = max(pool, key=lambda u: (len(sets[u] - covered), -u))
        gain = len(sets[pick] - covered)
        covered |= sets[pick]
        pool.remove(pick)
        rows.append((rnd, pick, gain, len(covered)))
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "gain": pa.array([r[2] for r in rows], pa.int64()),
            "covered": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _set_cover_oracle_sql() -> str:
    """Mirror of _q_set_cover_greedy: 5 unrolled greedy rounds over
    the distinct (user, cell) relation of the top-10 users."""
    parts = [
        "WITH uc AS (SELECT user_id, "
        "event_id % 96 + (event_id // 96 % 96) * 96 AS cell, "
        "COUNT(*) AS n FROM events GROUP BY 1, 2), "
        "ut AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS tot "
        "FROM uc GROUP BY user_id), "
        "top10 AS (SELECT user_id FROM ut ORDER BY tot DESC, user_id "
        "LIMIT 10), "
        "base AS MATERIALIZED (SELECT DISTINCT uc.user_id, uc.cell "
        "FROM uc JOIN top10 USING (user_id))"
    ]
    picked: list[str] = []
    for r in range(1, 6):
        excl = (
            " WHERE t.user_id NOT IN ("
            + ", ".join(f"(SELECT user_id FROM p{i})" for i in picked)
            + ")"
            if picked
            else ""
        )
        rem = (
            f"(SELECT user_id, COUNT(*) AS gain FROM base "
            f"WHERE cell NOT IN (SELECT cell FROM cov{r - 1}) "
            f"GROUP BY user_id)"
            if r > 1
            else "(SELECT user_id, COUNT(*) AS gain FROM base "
            "GROUP BY user_id)"
        )
        parts.append(
            f", g{r} AS MATERIALIZED (SELECT t.user_id, "
            f"COALESCE(x.gain, 0) AS gain "
            f"FROM top10 t LEFT JOIN {rem} x USING (user_id){excl})"
        )
        parts.append(
            f", p{r} AS MATERIALIZED (SELECT user_id, gain FROM g{r} "
            f"ORDER BY gain DESC, user_id LIMIT 1)"
        )
        prev_cov = f"SELECT cell FROM cov{r - 1} UNION " if r > 1 else ""
        parts.append(
            f", cov{r} AS MATERIALIZED ({prev_cov}SELECT cell FROM base "
            f"JOIN p{r} USING (user_id))"
        )
        picked.append(str(r))
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, (SELECT user_id FROM p{r}) AS user_id, "
        f"(SELECT gain FROM p{r}) AS gain, "
        f"(SELECT COUNT(*) FROM cov{r}) AS covered"
        for r in range(1, 6)
    )
    return (
        "".join(parts)
        + " SELECT CAST(round AS BIGINT) AS round, user_id, "
        "CAST(gain AS BIGINT) AS gain, CAST(covered AS BIGINT) "
        "AS covered FROM (" + sel + ")"
    )


_CLIQUE_T = 4  # Chebyshev adjacency threshold over the hot cells


def _q_max_clique(sf_dir: str) -> pa.Table:
    """Exact maximum clique of the proximity graph over the top-16
    cells by event count (edge iff Chebyshev distance <= 4): full
    2^16 subset enumeration with integer non-edge certificates --
    a subset is a clique iff it contains no non-edge pair, checked
    with one AND-mask test per pair.  Canonical answer = max
    popcount, then smallest mask."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(eid % 96 + (eid // 96 % 96) * 96),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    top = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:16]
    cells = [int(c) for _, c in top]  # bit i = i-th by (n desc, cell)
    xy = [(c % 96, c // 96) for c in cells]
    nonedges = []
    for i in range(16):
        for j in range(i + 1, 16):
            if max(
                abs(xy[i][0] - xy[j][0]), abs(xy[i][1] - xy[j][1])
            ) > _CLIQUE_T:
                nonedges.append((1 << i) | (1 << j))
    masks = np.arange(1 << 16, dtype=np.int64)
    valid = np.ones(1 << 16, bool)
    for p in nonedges:
        valid &= (masks & p) != p
    pc = _popcount64(masks)
    size = int(pc[valid].max())
    best = int(masks[valid & (pc == size)].min())
    members = sorted(cells[i] for i in range(16) if best >> i & 1)
    return pa.table(
        {
            "rank": pa.array(
                list(range(1, len(members) + 1)), pa.int64()
            ),
            "cell": pa.array(members, pa.int64()),
            "clique_size": pa.array([size] * len(members), pa.int64()),
            "n_nonedges": pa.array(
                [len(nonedges)] * len(members), pa.int64()
            ),
        }
    )


def _max_clique_oracle_sql() -> str:
    """Mirror of _q_max_clique: the 2^16 enumeration as a range scan
    with a NOT EXISTS non-edge probe."""
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
        "t16 AS (SELECT cell, "
        "ROW_NUMBER() OVER (ORDER BY n DESC, cell) - 1 AS bi "
        "FROM cc ORDER BY n DESC, cell LIMIT 16), "
        "nd AS (SELECT cell, bi, cell % 96 AS x, cell // 96 AS y "
        "FROM t16), "
        "ne AS (SELECT (CAST(1 AS BIGINT) << a.bi) "
        "| (CAST(1 AS BIGINT) << b.bi) AS p FROM nd a JOIN nd b "
        "ON a.bi < b.bi AND GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) "
        f"> {_CLIQUE_T}), "
        "m AS (SELECT range AS mask FROM range(0, 65536)), "
        "v AS (SELECT mask, bit_count(mask) AS pc FROM m "
        "WHERE NOT EXISTS (SELECT 1 FROM ne "
        "WHERE (m.mask & ne.p) = ne.p)), "
        "best AS (SELECT mask, pc FROM v ORDER BY pc DESC, mask "
        "LIMIT 1) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY nd.cell) AS BIGINT) "
        "AS rank, CAST(nd.cell AS BIGINT) AS cell, "
        "CAST(best.pc AS BIGINT) AS clique_size, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ne) AS n_nonedges "
        "FROM nd, best WHERE (best.mask >> nd.bi) & 1 = 1"
    )


def _top_count_cells_xy(sf_dir: str, k: int) -> list[tuple[int, int, int]]:
    """Top-k cells by event count as (cell, x, y), ordered by
    (count desc, cell) -- the shared vertex set for the graph DPs."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(eid % 96 + (eid // 96 % 96) * 96),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    top = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:k]
    return [(int(c), int(c) % 96, int(c) // 96) for _, c in top]


def _q_steiner_tree(sf_dir: str) -> pa.Table:
    """Exact Steiner trees by Dreyfus-Wagner DP on the metric closure
    of the top-12 count cells (Manhattan distances; the complete
    metric graph needs no closure step): terminals = the 4 hottest
    cells, and for every non-empty subset S of {t1,t2,t3} the output
    row is the optimal cost of a tree connecting {t0} union S --
    merge step g(u,S) = min-partition f(u,S')+f(u,S little S''), extend
    step f(v,S) = min_u g(u,S) + d(u,v), all exact integers."""
    verts = _top_count_cells_xy(sf_dir, 12)
    nv = len(verts)
    d = [
        [
            abs(verts[u][1] - verts[v][1]) + abs(verts[u][2] - verts[v][2])
            for v in range(nv)
        ]
        for u in range(nv)
    ]
    # f[mask][v]; mask bits 0..2 = terminals t1..t3 (vertex ids 1..3)
    f: dict[int, list[int]] = {}
    for i in range(3):
        f[1 << i] = [d[v][i + 1] for v in range(nv)]
    for mask in (3, 5, 6, 7):
        if mask == 7:
            parts = [(1, 6), (2, 5), (4, 3)]
        else:
            a = mask & -mask
            parts = [(a, mask ^ a)]
        h = [
            min(f[a][u] + f[b][u] for a, b in parts) for u in range(nv)
        ]
        f[mask] = [
            min(h[u] + d[u][v] for u in range(nv)) for v in range(nv)
        ]
    return pa.table(
        {
            "subset_mask": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "steiner_cost": pa.array(
                [f[m][0] for m in (1, 2, 3, 4, 5, 6, 7)], pa.int64()
            ),
        }
    )


_STEINER_CELLS_SQL = (
    "cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 AS cell, "
    "COUNT(*) AS n FROM events GROUP BY 1), "
    "t12 AS (SELECT cell, ROW_NUMBER() OVER (ORDER BY n DESC, cell) - 1 "
    "AS bi FROM cc ORDER BY n DESC, cell LIMIT 12), "
    "nd AS (SELECT bi, cell % 96 AS x, cell // 96 AS y FROM t12), "
    "dd AS (SELECT a.bi AS u, b.bi AS v, "
    "ABS(a.x - b.x) + ABS(a.y - b.y) AS w FROM nd a, nd b)"
)


def _steiner_oracle_sql() -> str:
    """Mirror of _q_steiner_tree: Dreyfus-Wagner levels as CTEs."""
    lvl2 = []
    for mask, (p1, p2) in ((3, (1, 2)), (5, (1, 4)), (6, (2, 4))):
        lvl2.append(
            f"h{mask} AS MATERIALIZED (SELECT a.v AS u, a.c + b.c AS hc "
            f"FROM f1 a JOIN f1 b ON b.v = a.v "
            f"AND a.s = {p1} AND b.s = {p2}), "
            f"f{mask} AS MATERIALIZED (SELECT dd.v AS v, "
            f"MIN(h{mask}.hc + dd.w) AS c "
            f"FROM h{mask} JOIN dd ON dd.u = h{mask}.u GROUP BY dd.v)"
        )
    return (
        "WITH " + _STEINER_CELLS_SQL + ", "
        "f1 AS MATERIALIZED (SELECT u AS v, "
        "CASE v WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 4 END AS s, w AS c "
        "FROM dd WHERE v IN (1, 2, 3)), "
        + ", ".join(lvl2)
        + ", h7 AS MATERIALIZED (SELECT u, MIN(hc) AS hc FROM ("
        "SELECT a.v AS u, a.c + b.c AS hc FROM f1 a JOIN f6 b "
        "ON b.v = a.v AND a.s = 1 "
        "UNION ALL SELECT a.v, a.c + b.c FROM f1 a JOIN f5 b "
        "ON b.v = a.v AND a.s = 2 "
        "UNION ALL SELECT a.v, a.c + b.c FROM f1 a JOIN f3 b "
        "ON b.v = a.v AND a.s = 4) GROUP BY u), "
        "f7 AS (SELECT MIN(h7.hc + dd.w) AS c FROM h7 "
        "JOIN dd ON dd.u = h7.u WHERE dd.v = 0) "
        "SELECT CAST(subset_mask AS BIGINT) AS subset_mask, "
        "CAST(steiner_cost AS BIGINT) AS steiner_cost FROM ("
        "SELECT 1 AS subset_mask, "
        "(SELECT c FROM f1 WHERE v = 0 AND s = 1) AS steiner_cost "
        "UNION ALL SELECT 2, (SELECT c FROM f1 WHERE v = 0 AND s = 2) "
        "UNION ALL SELECT 3, (SELECT c FROM f3 WHERE v = 0) "
        "UNION ALL SELECT 4, (SELECT c FROM f1 WHERE v = 0 AND s = 4) "
        "UNION ALL SELECT 5, (SELECT c FROM f5 WHERE v = 0) "
        "UNION ALL SELECT 6, (SELECT c FROM f6 WHERE v = 0) "
        "UNION ALL SELECT 7, (SELECT c FROM f7))"
    )


_GS_ROUNDS = 30  # >= n(n-1) rejections for n = 6


def _q_stable_matching(sf_dir: str) -> pa.Table:
    """Proposer-optimal stable matching by simultaneous deferred
    acceptance (parallel Gale-Shapley): proposers = top-6 users by
    event count, acceptors = ranks 7-12, preferences from mix32
    scores.  Each round every proposer proposes to its best
    not-yet-rejecting acceptor; each acceptor keeps the best
    proposal and rejects the rest; the rejection set grows
    monotonically (<= 30), so 30 unrolled rounds reach the fixpoint.
    The engine iterates to convergence and must equal the 30-round
    SQL unroll exactly."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )

    users = [u for u, *_ in _top_users_by_count(sf_dir, 12)]
    prop, acc = users[:6], users[6:12]
    ps = {
        (p, a): int(mix32(np.array([prop[p] * 64 + a]), 7)[0])
        for p in range(6)
        for a in range(6)
    }
    asq = {
        (a, p): int(mix32(np.array([acc[a] * 64 + p]), 11)[0])
        for a in range(6)
        for p in range(6)
    }
    rej: set[tuple[int, int]] = set()
    while True:
        cand = {
            p: min(
                (a for a in range(6) if (p, a) not in rej),
                key=lambda a: (-ps[(p, a)], a),
            )
            for p in range(6)
        }
        new = []
        for a in range(6):
            props = [p for p in range(6) if cand[p] == a]
            if len(props) > 1:
                best = min(props, key=lambda p: (-asq[(a, p)], p))
                new.extend((p, a) for p in props if p != best)
        if not new:
            break
        rej.update(new)
    rows = []
    for p in range(6):
        a = cand[p]
        prank = 1 + sum(
            1
            for a2 in range(6)
            if (-ps[(p, a2)], a2) < (-ps[(p, a)], a)
        )
        arank = 1 + sum(
            1
            for p2 in range(6)
            if (-asq[(a, p2)], p2) < (-asq[(a, p)], p)
        )
        rows.append((prop[p], acc[a], prank, arank))
    return pa.table(
        {
            "p_user": pa.array([r[0] for r in rows], pa.int64()),
            "a_user": pa.array([r[1] for r in rows], pa.int64()),
            "p_rank": pa.array([r[2] for r in rows], pa.int64()),
            "a_rank": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _top_users_by_count(sf_dir: str, k: int) -> list[tuple[int, int]]:
    """Top-k users by event count, ordered by (count desc, user)."""
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
    top = sorted(
        zip(agg["n"].to_pylist(), agg["user_id"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:k]
    return [(int(u), int(n)) for n, u in top]


def _stable_matching_oracle_sql() -> str:
    """Mirror of _q_stable_matching: 30 unrolled simultaneous
    deferred-acceptance rounds over the rejection relation."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql,
    )

    rounds = []
    for r in range(1, _GS_ROUNDS + 1):
        prev = f"r{r - 1}"
        rounds.append(
            f"c{r} AS MATERIALIZED (SELECT p, a, asq FROM "
            f"(SELECT pref.p, pref.a, pref.asq, ROW_NUMBER() OVER "
            f"(PARTITION BY pref.p ORDER BY pref.ps DESC, pref.a) AS rn "
            f"FROM pref ANTI JOIN {prev} USING (p, a)) WHERE rn = 1), "
            f"w{r} AS MATERIALIZED (SELECT p, a FROM "
            f"(SELECT c.p, c.a, ROW_NUMBER() OVER (PARTITION BY c.a "
            f"ORDER BY c.asq DESC, c.p) AS rn FROM c{r} c) "
            f"WHERE rn = 1), "
            f"r{r} AS MATERIALIZED (SELECT p, a FROM {prev} UNION "
            f"SELECT c.p, c.a FROM c{r} c ANTI JOIN w{r} USING (p, a))"
        )
    last = f"c{_GS_ROUNDS}"
    return (
        "WITH uc AS (SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id), "
        "t12 AS (SELECT user_id, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, user_id) - 1 AS idx FROM uc "
        "ORDER BY n DESC, user_id LIMIT 12), "
        "pp AS (SELECT p.idx AS p, p.user_id AS pu, "
        "a.idx - 6 AS a, a.user_id AS au FROM t12 p, t12 a "
        "WHERE p.idx < 6 AND a.idx >= 6), "
        "pref AS MATERIALIZED (SELECT p, a, pu, au, "
        f"({mix32_sql('pu * 64 + a', 7)}) AS ps, "
        f"({mix32_sql('au * 64 + p', 11)}) AS asq FROM pp), "
        "r0 AS MATERIALIZED (SELECT p, a FROM pref WHERE 1 = 0), "
        + ", ".join(rounds)
        + f", fin AS (SELECT p, a FROM {last}), "
        "pr AS (SELECT p, a, ROW_NUMBER() OVER (PARTITION BY p "
        "ORDER BY ps DESC, a) AS prank FROM pref), "
        "ar AS (SELECT p, a, ROW_NUMBER() OVER (PARTITION BY a "
        "ORDER BY asq DESC, p) AS arank FROM pref) "
        "SELECT pref.pu AS p_user, pref.au AS a_user, "
        "CAST(pr.prank AS BIGINT) AS p_rank, "
        "CAST(ar.arank AS BIGINT) AS a_rank "
        "FROM fin JOIN pref ON pref.p = fin.p AND pref.a = fin.a "
        "JOIN pr ON pr.p = fin.p AND pr.a = fin.a "
        "JOIN ar ON ar.p = fin.p AND ar.a = fin.a"
    )


def _q_bin_packing_ffd(sf_dir: str) -> pa.Table:
    """First-fit-decreasing bin packing of the top-12 parts by total
    quantity (capacity = sum(sizes) // 5): the classic 11/9-OPT
    greedy, item order (size desc, partkey), first bin whose load
    fits.  The SQL mirror carries the bin-load LIST through 12
    unrolled steps (list_position / list-comprehension update)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "q": pa.array(scaled_int(batch["l_quantity"], 1.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_partkey"],
        [("q", "sum", "s")],
    )
    top = sorted(
        zip(agg["s"].to_pylist(), agg["l_partkey"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:12]
    sizes = [int(s) for s, _ in top]
    cap = sum(sizes) // 5
    loads: list[int] = []
    for sz in sizes:
        for i, ld in enumerate(loads):
            if ld + sz <= cap:
                loads[i] = ld + sz
                break
        else:
            loads.append(sz)
    return pa.table(
        {
            "bin": pa.array(
                list(range(1, len(loads) + 1)), pa.int64()
            ),
            "load": pa.array(loads, pa.int64()),
            "n_bins": pa.array([len(loads)] * len(loads), pa.int64()),
            "capacity": pa.array([cap] * len(loads), pa.int64()),
        }
    )


def _bin_packing_oracle_sql() -> str:
    """Mirror of _q_bin_packing_ffd: 12 unrolled first-fit steps over
    a LIST-typed bin-load state."""
    steps = []
    for k in range(1, 13):
        prev = f"s{k - 1}"
        steps.append(
            f"x{k} AS (SELECT {prev}.loads, it.s AS sz, "
            f"list_position(list_transform({prev}.loads, "
            f"x -> x + it.s <= cap.c), true) AS idx "
            f"FROM {prev}, (SELECT s FROM items WHERE k = {k}) it, cap), "
            f"s{k} AS MATERIALIZED (SELECT CASE WHEN idx = 0 "
            f"THEN list_append(loads, sz) "
            f"ELSE [CASE WHEN i = idx THEN loads[i] + sz "
            f"ELSE loads[i] END FOR i IN range(1, length(loads) + 1)] "
            f"END AS loads FROM x{k})"
        )
    return (
        "WITH pq AS (SELECT l_partkey, "
        "CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS s "
        "FROM lineitem GROUP BY 1), "
        "items AS MATERIALIZED (SELECT s, ROW_NUMBER() OVER "
        "(ORDER BY s DESC, l_partkey) AS k FROM pq "
        "ORDER BY s DESC, l_partkey LIMIT 12), "
        "cap AS MATERIALIZED (SELECT CAST(SUM(s) // 5 AS BIGINT) AS c "
        "FROM items), "
        "s0 AS (SELECT CAST([] AS BIGINT[]) AS loads), "
        + ", ".join(steps)
        + " SELECT CAST(generate_subscripts(loads, 1) AS BIGINT) "
        "AS bin, CAST(unnest(loads) AS BIGINT) AS load, "
        "CAST(length(loads) AS BIGINT) AS n_bins, "
        "(SELECT c FROM cap) AS capacity FROM s12"
    )


def _q_nn_fj_function(sf_dir: str) -> pa.Table:
    """Empty-space F function (NN-distance CDF from a fixed 16x16
    probe lattice to the geocoded point subset) and the van
    Lieshout-Baddeley J = (1-G)/(1-F) combining it with the existing
    G function -- the CSR diagnostic pair.  Distances quantized at
    1e9 before the integer radius comparisons; J is NULL where F = 1
    (both sides)."""
    import ray
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.functions.knn import (
        KNNIndex,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        eid = eid[eid % 100 == 0]
        return pa.table(
            {
                "px": pa.array(77.0 + (eid % 96).astype(np.float64) * 0.01),
                "py": pa.array(
                    28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
                ),
            }
        )

    pts_tbl = collect_tables(
        ds.map_batches(pts, batch_format="pyarrow", batch_size=None)
    )
    px = pts_tbl["px"].to_numpy(zero_copy_only=False)
    py = pts_tbl["py"].to_numpy(zero_copy_only=False)
    index_ref = ray.put(KNNIndex(px, py))
    radii = np.asarray(_GFUNC_RADII_Q, np.int64)
    ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    probes = pa.table(
        {
            "px": pa.array(77.0 + (ii.ravel() * 6).astype(np.float64) * 0.01),
            "py": pa.array(
                28.05 + (jj.ravel() * 6).astype(np.float64) * 0.01
            ),
        }
    )

    def terms(k_query: int):
        def f(batch: pa.Table) -> pa.Table:
            idx = ray.get(index_ref)
            qx = batch["px"].to_numpy(zero_copy_only=False)
            qy = batch["py"].to_numpy(zero_copy_only=False)
            ii_, _dd = idx.query(qx, qy, k=k_query)
            nb = ii_[:, k_query - 1]
            dx = qx - idx.lon[nb]
            dy = qy - idx.lat[nb]
            dq = round_half_away(np.sqrt(dx * dx + dy * dy) * 1e9).astype(
                np.int64
            )
            n_le = (dq[None, :] <= radii[:, None]).sum(axis=1).astype(
                np.int64
            )
            return pa.table(
                {
                    "r_q": pa.array(radii),
                    "n": pa.array(np.full(len(radii), len(dq), np.int64)),
                    "n_le": pa.array(n_le),
                }
            )

        return f

    def cdf(src_ds, k_query: int) -> dict[int, tuple[int, int]]:
        agg = hash_aggregate(
            src_ds.map_batches(
                terms(k_query), batch_format="pyarrow", batch_size=None
            ),
            ["r_q"],
            [("n", "sum", "n"), ("n_le", "sum", "n_le")],
        )
        return {
            int(agg["r_q"][i].as_py()): (
                int(agg["n"][i].as_py()),
                int(agg["n_le"][i].as_py()),
            )
            for i in range(agg.num_rows)
        }

    f_cdf = cdf(ray.data.from_arrow(probes), 1)
    g_cdf = cdf(ray.data.from_arrow(pts_tbl), 2)
    rows = []
    for rq in sorted(f_cdf):
        nf, f_le = f_cdf[rq]
        ng, g_le = g_cdf[rq]
        f_hat = float(f_le) / float(nf)
        g_hat = float(g_le) / float(ng)
        j_hat = (1.0 - g_hat) / (1.0 - f_hat) if f_hat < 1.0 else np.nan
        rows.append((rq, f_hat, g_hat, j_hat))
    return pa.table(
        {
            "r": round_like_sql(
                [r[0] / 1e9 for r in rows], 6
            ),
            "f_hat": round_like_sql([r[1] for r in rows], 6),
            "g_hat": round_like_sql([r[2] for r in rows], 6),
            "j_hat": round_like_sql([r[3] for r in rows], 6),
        }
    )


def _q_hypsometric(sf_dir: str) -> pa.Table:
    """Hypsometric curve + integral of the oracle raster (the
    geomorphology maturity diagnostic): 11 elevation thresholds at
    integer-cent decile steps of the range, relative area >= each
    threshold, plus HI = (mean - min)/(max - min).  Two distributed
    passes: exact min/max/sum, then broadcast thresholds into
    per-batch partial counts."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    pts = _og_points_ds(valid_only=True)

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": pa.array(np.zeros(batch.num_rows, np.int64)),
                "c": pa.array(scaled_int(batch["z"], 100.0)),
            }
        )

    cds = pts.map_batches(cents, batch_format="pyarrow", batch_size=None)
    s = hash_aggregate(
        cds,
        ["g"],
        [("c", "min", "mn"), ("c", "max", "mx"), ("c", "sum", "sm"),
         ("c", "count", "n")],
    )
    mn = int(s["mn"][0].as_py())
    mx = int(s["mx"][0].as_py())
    sm = int(s["sm"][0].as_py())
    n = int(s["n"][0].as_py())
    thr = [mn + (k * (mx - mn)) // 10 for k in range(11)]
    thr_arr = np.asarray(thr, np.int64)

    def above(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        na = (c[None, :] >= thr_arr[:, None]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.arange(11, dtype=np.int64)),
                "na": pa.array(na),
            }
        )

    agg = hash_aggregate(
        cds.map_batches(above, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("na", "sum", "na")],
    ).sort_by("k")
    na = agg["na"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = (float(sm) / float(n) - float(mn)) / float(mx - mn)
    return pa.table(
        {
            "k": pa.array(list(range(11)), pa.int64()),
            "threshold_c": pa.array(thr, pa.int64()),
            "n_above": pa.array(na, pa.int64()),
            "frac_above": round_like_sql(
                na.astype(np.float64) / float(n), 6
            ),
            "hi": round_like_sql([hi] * 11, 6),
        }
    )


def _q_tile_gaussian_blur(sf_dir: str) -> pa.Table:
    """5x5 binomial (Gaussian-approximation) blur over the slope
    fixture raster -- the first consumer of the width-2 halo
    exchange (stages/raster.py::tile_binomial_blur): exact integer
    [1,4,6,4,1]^2 convolution of deci-scaled elevations, defined
    where all 25 window cells are valid; SQL mirrors it as two
    [1,2,1]^2 passes (convolution composes)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_binomial_blur,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_binomial_blur(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "b2560": out["b2560"],
        }
    )


def _q_kneser_ney(sf_dir: str) -> pa.Table:
    """Interpolated Kneser-Ney bigram probabilities with the textbook
    discount D = 0.75 (exact rational 3/4): continuation counts from
    the distributed bigram-type table, and every probability reduces
    to ONE float division of exact integers --
    p = (max(4c-3,0)*NT + 3*N1(v.)*N1(.w)) / (4*c(v.)*NT).
    Top-20 bigrams by count.  Bigram counts come off the distributed
    n-gram combiner; the marginal tables are vocabulary-bounded."""
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
    bc = collect_tables(ngram_counts(ds, n=2))
    grams = bc["gram"].to_pylist()
    cnts = [int(x) for x in bc["n"].to_pylist()]
    cv: dict[str, int] = {}
    n1v: dict[str, int] = {}
    nw: dict[str, int] = {}
    rows = []
    for g, c in zip(grams, cnts):
        v, w = g.split(" ", 1)
        cv[v] = cv.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        nw[w] = nw.get(w, 0) + 1
        rows.append((v, w, c))
    nt = len(rows)
    top = sorted(rows, key=lambda r: (-r[2], r[0], r[1]))[:20]
    p = [
        float(max(4 * c - 3, 0) * nt + 3 * n1v[v] * nw[w])
        / float(4 * cv[v] * nt)
        for v, w, c in top
    ]
    return pa.table(
        {
            "v": pa.array([t[0] for t in top]),
            "w": pa.array([t[1] for t in top]),
            "c_vw": pa.array([t[2] for t in top], pa.int64()),
            "p_kn": round_like_sql(p, 6),
        }
    )


def _q_bwt_transform(sf_dir: str) -> pa.Table:
    """Burrows-Wheeler transform of the corpus signature string (the
    top-8 tokens by frequency joined with spaces + '$' sentinel):
    all rotations sorted bytewise, last column emitted with the
    primary index -- the compression-transform member of the text
    family (alongside Huffman / LZ76 / RLE).  Exactly mirrored by a
    rotation self-join in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, top_k,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        ngram_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    tf = collect_tables(ngram_counts(ds, n=1))
    top = sorted(
        zip(tf["n"].to_pylist(), tf["gram"].to_pylist()),
        key=lambda t: (-int(t[0]), t[1]),
    )[:8]
    s = " ".join(w for _, w in top) + "$"
    n = len(s)
    rots = sorted(range(n), key=lambda i: s[i:] + s[:i])
    last = [s[(i + n - 1) % n] for i in rots]
    primary = rots.index(0) + 1
    return pa.table(
        {
            "pos": pa.array(list(range(1, n + 1)), pa.int64()),
            "ch": pa.array(last),
            "primary_idx": pa.array([primary] * n, pa.int64()),
        }
    )


def _q_fisher_lda(sf_dir: str) -> pa.Table:
    """Fisher linear discriminant (two classes: purchase vs rest) on
    (hour-of-day, value deca-dollars): within-class scatter from
    n-scaled integer moments (A_k = n_k*Sxx_k - Sx_k Sx_k^T is exact),
    M = n1*A0 + n0*A1 and the mean difference share the n0*n1 factor,
    so w = M^{-1} d by exact Cramer determinants -- floats only in
    the two final divisions."""
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
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts // 3_600_000_000) % 24
        x2 = scaled_int(batch["value"], 0.1)  # deca-dollars
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        y = (et == "purchase").astype(np.int64)
        return pa.table(
            {
                "y": pa.array(y),
                "_n": pa.array(np.ones(len(y), np.int64)),
                "s1": pa.array(hour),
                "s2": pa.array(x2),
                "s11": pa.array(hour * hour),
                "s22": pa.array(x2 * x2),
                "s12": pa.array(hour * x2),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["y"],
        [(c, "sum", c) for c in ("_n", "s1", "s2", "s11", "s22", "s12")],
    )
    m = {}
    for i in range(agg.num_rows):
        m[int(agg["y"][i].as_py())] = {
            c: int(agg[c][i].as_py())
            for c in ("_n", "s1", "s2", "s11", "s22", "s12")
        }
    n0, n1 = m[0]["_n"], m[1]["_n"]
    a = {}
    for k in (0, 1):
        nk = m[k]["_n"]
        a[k] = {
            "11": nk * m[k]["s11"] - m[k]["s1"] * m[k]["s1"],
            "22": nk * m[k]["s22"] - m[k]["s2"] * m[k]["s2"],
            "12": nk * m[k]["s12"] - m[k]["s1"] * m[k]["s2"],
        }
    m11 = n1 * a[0]["11"] + n0 * a[1]["11"]
    m22 = n1 * a[0]["22"] + n0 * a[1]["22"]
    m12 = n1 * a[0]["12"] + n0 * a[1]["12"]
    d1 = n0 * m[1]["s1"] - n1 * m[0]["s1"]
    d2 = n0 * m[1]["s2"] - n1 * m[0]["s2"]
    det = m11 * m22 - m12 * m12
    w1n = m22 * d1 - m12 * d2
    w2n = m11 * d2 - m12 * d1
    return pa.table(
        {
            "n0": pa.array([n0], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "w1": round_like_sql([float(w1n) / float(det)], 6),
            "w2": round_like_sql([float(w2n) / float(det)], 6),
            "mu1_hour": round_like_sql(
                [float(m[1]["s1"]) / float(n1)], 6
            ),
            "mu1_dd": round_like_sql(
                [float(m[1]["s2"]) / float(n1)], 6
            ),
        }
    )


def _q_media_dhash_pairs(sf_dir: str) -> pa.Table:
    """Difference-hash (gradient-sign) near-duplicate image pairs
    over REAL PNG bytes -- the dhash companion of media_ahash_pairs,
    robust to the global brightness shifts that flip ahash bits
    (stages/multimodal.py::image_dhash_pairs); the SQL oracle
    recomputes signatures from the fixture's closed-form pixel
    rule, validating decode + hash end-to-end."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        gen_media_grid, image_dhash_pairs,
    )

    media = ray.data.from_arrow(gen_media_grid(n=24, size=32, n_base=16))
    return image_dhash_pairs(media, max_hamming=6)


def _q_wav_features(sf_dir: str) -> pa.Table:
    """Per-frame audio energy + zero-crossing counts over REAL PCM
    WAV bytes through the from-scratch codec (the VAD front-end;
    stages/multimodal.py::wav_frame_features) -- formula samples let
    the SQL oracle recompute both features from first principles,
    validating the WAV decode path end-to-end like media_decode does
    for PNG."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        gen_wav_grid, wav_frame_features,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    media = ray.data.from_arrow(gen_wav_grid(n=12, n_samples=256))
    return collect_tables(wav_frame_features(media, frame=64))


def _q_matrix_profile(sf_dir: str) -> pa.Table:
    """Matrix profile of the hourly event-count series (stride-6,
    window-6 un-normalized squared-Euclidean variant): per window the
    min distance to any other window and its argmin -- the motif /
    discord primitive.  Counts are exact integers, so every distance
    is an exact int64; the window table is series-bounded, never
    row-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def hourly(batch: pa.Table) -> pa.Table:
        hr = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        return pa.table(
            {"hr": pa.array(hr), "_one": pa.array(np.ones(len(hr), np.int64))}
        )

    agg = hash_aggregate(
        ds.map_batches(hourly, batch_format="pyarrow", batch_size=None),
        ["hr"],
        [("_one", "sum", "n")],
    )
    hh = agg["hr"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(hh.min()), int(hh.max())
    xs = np.zeros(hi - lo + 1, np.int64)
    xs[hh - lo] = agg["n"].to_numpy(zero_copy_only=False)
    m = 6
    n_w = (len(xs) - m) // m + 1
    win = np.stack([xs[w * m : w * m + m] for w in range(n_w)])
    d2 = ((win[:, None, :] - win[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    nn = d2.argmin(axis=1)  # smallest index on ties (argmin semantics)
    mp = d2[np.arange(n_w), nn]
    return pa.table(
        {
            "w": pa.array(np.arange(n_w, dtype=np.int64)),
            "mp_d2": pa.array(mp.astype(np.int64)),
            "nn_w": pa.array(nn.astype(np.int64)),
        }
    )


_RSI_SC = 1_000_000  # Wilder-average tick scale


def _q_rsi_wilder(sf_dir: str) -> pa.Table:
    """RSI(14) with Wilder smoothing over the daily revenue-cents
    series: the averages are a sequential rational recurrence, so the
    state is quantized at 1e6 ticks with truncating integer division
    (ag' = (13*ag + g*1e6) // 14) -- bit-identical to the recursive
    CTE; RSI itself is one pinned float chain per day."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    xs = _daily_revenue_cents(sf_dir)
    d = [xs[t] - xs[t - 1] for t in range(1, len(xs))]
    gains = [max(v, 0) for v in d]
    losses = [max(-v, 0) for v in d]
    ag = sum(gains[:14]) * _RSI_SC // 14
    al = sum(losses[:14]) * _RSI_SC // 14
    days, rsi = [], []

    def _rsi(a: int, b: int) -> float:
        if b == 0:
            return 100.0
        return 100.0 - 100.0 / (1.0 + float(a) / float(b))

    days.append(14)
    rsi.append(_rsi(ag, al))
    for t in range(14, len(d)):
        ag = (13 * ag + gains[t] * _RSI_SC) // 14
        al = (13 * al + losses[t] * _RSI_SC) // 14
        days.append(t + 1)
        rsi.append(_rsi(ag, al))
    return pa.table(
        {
            "t": pa.array(days, pa.int64()),
            "rsi": round_like_sql(rsi, 6),
        }
    )


def _rsi_oracle_sql() -> str:
    """Mirror of _q_rsi_wilder: recursive CTE over the integer-tick
    Wilder state."""
    sc = _RSI_SC
    return (
        "WITH RECURSIVE c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "df AS (SELECT t, y - LAG(y) OVER (ORDER BY t) AS dv FROM xs), "
        "gl AS (SELECT t, GREATEST(dv, 0) AS g, GREATEST(-dv, 0) AS l "
        "FROM df WHERE t >= 1), "
        "init AS (SELECT "
        f"CAST(SUM(g) AS BIGINT) * {sc} // 14 AS ag, "
        f"CAST(SUM(l) AS BIGINT) * {sc} // 14 AS al "
        "FROM gl WHERE t <= 14), "
        "nmax AS (SELECT MAX(t) AS tm FROM gl), "
        "w AS (SELECT 14 AS t, init.ag, init.al FROM init "
        "UNION ALL "
        f"SELECT w.t + 1, (13 * w.ag + gl.g * {sc}) // 14, "
        f"(13 * w.al + gl.l * {sc}) // 14 "
        "FROM w JOIN gl ON gl.t = w.t + 1, nmax "
        "WHERE w.t < nmax.tm) "
        "SELECT CAST(t AS BIGINT) AS t, "
        "ROUND(CASE WHEN al = 0 THEN 100.0 ELSE "
        "100.0 - 100.0 / (1.0 + CAST(ag AS DOUBLE) "
        "/ CAST(al AS DOUBLE)) END, 6) AS rsi FROM w"
    )


def _q_segregation_indices(sf_dir: str) -> pa.Table:
    """Duncan dissimilarity D plus isolation and exposure P* indices
    between purchase and view events over the geocode cells (the
    demography segregation triple): D's numerator sum |a_c*B - b_c*A|
    is exact integer; the interaction terms use the order-free
    1e9-tick quantization (one tick term per cell, then two float
    divisions)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "purchase") | (et == "view")
        return pa.table(
            {
                "cell": pa.array((eid % 96 + (eid // 96 % 96) * 96)[keep]),
                "a": pa.array((et[keep] == "purchase").astype(np.int64)),
                "b": pa.array((et[keep] == "view").astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("a", "sum", "a"), ("b", "sum", "b")],
    )
    a = agg["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = agg["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    big_a, big_b = int(a.sum()), int(b.sum())
    d_num = int(np.abs(a * big_b - b * big_a).sum())
    t = a + b
    iso_t = int(
        round_half_away(a.astype(np.float64) ** 2 / t * 1e9)
        .astype(np.int64)
        .sum()
    )
    exp_t = int(
        round_half_away(
            a.astype(np.float64) * b.astype(np.float64) / t * 1e9
        )
        .astype(np.int64)
        .sum()
    )
    return pa.table(
        {
            "n_cells": pa.array([len(a)], pa.int64()),
            "d_index": round_like_sql(
                [float(d_num) / (2.0 * float(big_a) * float(big_b))], 6
            ),
            "isolation_aa": round_like_sql(
                [float(iso_t) / 1e9 / float(big_a)], 6
            ),
            "exposure_ab": round_like_sql(
                [float(exp_t) / 1e9 / float(big_a)], 6
            ),
        }
    )


_SIMRANK_ITERS = 8
_SIMRANK_SC = 1_000_000_000


def _q_simrank(sf_dir: str) -> pa.Table:
    """SimRank similarity (C = 4/5) on the hot-cell proximity graph
    (top-12 cells, Chebyshev <= 4 edges): 8 unrolled iterations of
    s'(a,b) = 4*sum_{u in N(a), v in N(b)} s(u,v) // (5*|N(a)||N(b)|)
    in 1e9 ticks -- every step a truncating integer division,
    bit-identical to the SQL unroll.  Top-20 pairs by final score."""
    verts = _top_count_cells_xy(sf_dir, 12)
    nv = len(verts)
    nbrs = [
        [
            j
            for j in range(nv)
            if j != i
            and max(
                abs(verts[i][1] - verts[j][1]),
                abs(verts[i][2] - verts[j][2]),
            )
            <= _CLIQUE_T
        ]
        for i in range(nv)
    ]
    s = [
        [(_SIMRANK_SC if i == j else 0) for j in range(nv)]
        for i in range(nv)
    ]
    for _ in range(_SIMRANK_ITERS):
        ns = [[0] * nv for _ in range(nv)]
        for i in range(nv):
            ns[i][i] = _SIMRANK_SC
            for j in range(nv):
                if i == j:
                    continue
                na, nb = len(nbrs[i]), len(nbrs[j])
                if na == 0 or nb == 0:
                    continue
                tot = sum(
                    s[u][v] for u in nbrs[i] for v in nbrs[j]
                )
                ns[i][j] = (4 * tot) // (5 * na * nb)
        s = ns
    pairs = sorted(
        (
            (-s[i][j], i, j)
            for i in range(nv)
            for j in range(i + 1, nv)
        )
    )[:20]
    return pa.table(
        {
            "cell_a": pa.array(
                [verts[i][0] for _, i, _j in pairs], pa.int64()
            ),
            "cell_b": pa.array(
                [verts[j][0] for _, _i, j in pairs], pa.int64()
            ),
            "s_ticks": pa.array([-v for v, _, _ in pairs], pa.int64()),
        }
    )


def _simrank_oracle_sql() -> str:
    """Mirror of _q_simrank: 8 unrolled tick-quantized iterations."""
    sc = _SIMRANK_SC
    steps = []
    for k in range(1, _SIMRANK_ITERS + 1):
        prev = f"s{k - 1}"
        steps.append(
            f"s{k} AS MATERIALIZED (SELECT p.a, p.b, "
            f"CASE WHEN p.a = p.b THEN {sc} "
            f"WHEN p.na = 0 OR p.nb = 0 THEN 0 "
            f"ELSE (4 * COALESCE(t.sm, 0)) // (5 * p.na * p.nb) END "
            f"AS s FROM prs p LEFT JOIN ("
            f"SELECT ea.a AS a, eb.a AS b, SUM(sp.s) AS sm "
            f"FROM e ea JOIN e eb ON 1 = 1 "
            f"JOIN {prev} sp ON sp.a = ea.b AND sp.b = eb.b "
            f"GROUP BY ea.a, eb.a) t ON t.a = p.a AND t.b = p.b)"
        )
    return (
        "WITH " + _STEINER_CELLS_SQL.replace(
            "dd AS (SELECT a.bi AS u, b.bi AS v, "
            "ABS(a.x - b.x) + ABS(a.y - b.y) AS w FROM nd a, nd b)",
            "e AS (SELECT a.bi AS a, b.bi AS b FROM nd a JOIN nd b "
            f"ON b.bi <> a.bi AND GREATEST(ABS(a.x - b.x), "
            f"ABS(a.y - b.y)) <= {_CLIQUE_T})"
        )
        + ", deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS dg "
        "FROM e GROUP BY a), "
        "prs AS MATERIALIZED (SELECT a.bi AS a, b.bi AS b, "
        "COALESCE(da.dg, 0) AS na, COALESCE(db.dg, 0) AS nb "
        "FROM nd a CROSS JOIN nd b "
        "LEFT JOIN deg da ON da.a = a.bi "
        "LEFT JOIN deg db ON db.a = b.bi), "
        f"s0 AS (SELECT a, b, CASE WHEN a = b THEN {sc} ELSE 0 END "
        "AS s FROM prs), "
        + ", ".join(steps)
        + f", fin AS (SELECT a, b, s FROM s{_SIMRANK_ITERS}) "
        "SELECT t1.cell AS cell_a, t2.cell AS cell_b, "
        "CAST(fin.s AS BIGINT) AS s_ticks "
        "FROM fin JOIN t12 t1 ON t1.bi = fin.a "
        "JOIN t12 t2 ON t2.bi = fin.b "
        "WHERE fin.a < fin.b "
        "ORDER BY fin.s DESC, fin.a, fin.b LIMIT 20"
    )


def _sig_string_sql() -> str:
    """CTE fragment building the top-8-token signature string ``str``
    (shared by the BWT / border / suffix-array operators)."""
    return (
        "w AS (SELECT list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "tok AS (SELECT unnest(ws) AS t FROM w), "
        "tf AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t), "
        "t8 AS (SELECT t, n FROM tf ORDER BY n DESC, t LIMIT 8), "
        "s AS (SELECT string_agg(t, ' ' ORDER BY n DESC, t) || '$' "
        "AS str FROM t8)"
    )


def _sig_string(sf_dir: str) -> str:
    """Engine side of :func:`_sig_string_sql`."""
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
    top = sorted(
        zip(tf["n"].to_pylist(), tf["gram"].to_pylist()),
        key=lambda t: (-int(t[0]), t[1]),
    )[:8]
    return " ".join(w for _, w in top) + "$"


def _q_string_borders(sf_dir: str) -> pa.Table:
    """All borders (proper prefixes that are also suffixes) of the
    corpus signature string plus the smallest period n - maxborder --
    the KMP failure-function / string-periodicity primitive.  A
    border is a direct equality test per length, so no DP is needed
    in SQL."""
    s = _sig_string(sf_dir)
    n = len(s)
    borders = [k for k in range(1, n) if s[:k] == s[n - k :]]
    maxb = max(borders) if borders else 0
    rows = borders or [0]
    return pa.table(
        {
            "border_len": pa.array(rows, pa.int64()),
            "n": pa.array([n] * len(rows), pa.int64()),
            "period": pa.array([n - maxb] * len(rows), pa.int64()),
        }
    )


def _q_suffix_array_lcp(sf_dir: str) -> pa.Table:
    """Suffix array + LCP array of the corpus signature string (the
    index structure under substring search / LZ factorization):
    suffixes sorted bytewise, LCP = longest common prefix with the
    lexicographic predecessor by direct comparison."""
    s = _sig_string(sf_dir)
    n = len(s)
    sa = sorted(range(n), key=lambda i: s[i:])
    rows = []
    for r, i in enumerate(sa):
        if r == 0:
            lcp = 0
        else:
            a, b = s[sa[r - 1] :], s[i:]
            lcp = 0
            while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
                lcp += 1
        rows.append((r + 1, i, lcp))
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "sa": pa.array([r[1] for r in rows], pa.int64()),
            "lcp": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _q_closest_farthest_pair(sf_dir: str) -> pa.Table:
    """Closest and farthest (diameter) pair over the top-50 event
    cells -- exact integer squared distances, canonical ties by
    (cell_a, cell_b).  The farthest pair over the full set equals the
    hull diameter (rotating-calipers answer) since the max is
    attained at hull vertices."""
    verts = _top_count_cells_xy(sf_dir, 50)
    best_c = None
    best_f = None
    for i in range(len(verts)):
        for j in range(i + 1, len(verts)):
            d2 = (verts[i][1] - verts[j][1]) ** 2 + (
                verts[i][2] - verts[j][2]
            ) ** 2
            ca, cb = sorted((verts[i][0], verts[j][0]))
            key = (d2, ca, cb)
            if best_c is None or key < best_c:
                best_c = key
            fkey = (-d2, ca, cb)
            if best_f is None or fkey < best_f:
                best_f = fkey
    return pa.table(
        {
            "kind": pa.array(["closest", "farthest"]),
            "cell_a": pa.array(
                [best_c[1], best_f[1]], pa.int64()
            ),
            "cell_b": pa.array(
                [best_c[2], best_f[2]], pa.int64()
            ),
            "d2": pa.array([best_c[0], -best_f[0]], pa.int64()),
        }
    )


_RECT_R = 6  # half-side of the hot-cell squares


def _q_rect_union_area(sf_dir: str) -> pa.Table:
    """Exact area of the union of 10 axis-aligned squares (side 13)
    centered on the top-10 event cells, clipped to the 96x96 grid --
    the coverage-measure primitive (service areas, sensor footprints).
    Both sides count covered lattice cells exactly; overlap =
    sum(areas) - union."""
    cells = [c for c, _x, _y in _top_count_cells_xy(sf_dir, 10)]
    grid = np.zeros((96, 96), bool)
    total = 0
    for c in cells:
        x, y = c % 96, c // 96
        x0, x1 = max(0, x - _RECT_R), min(95, x + _RECT_R)
        y0, y1 = max(0, y - _RECT_R), min(95, y + _RECT_R)
        total += (x1 - x0 + 1) * (y1 - y0 + 1)
        grid[x0 : x1 + 1, y0 : y1 + 1] = True
    union = int(grid.sum())
    return pa.table(
        {
            "n_rects": pa.array([len(cells)], pa.int64()),
            "sum_areas": pa.array([total], pa.int64()),
            "union_area": pa.array([union], pa.int64()),
            "overlap": pa.array([total - union], pa.int64()),
        }
    )


def _q_holm_adjust(sf_dir: str) -> pa.Table:
    """Holm step-down adjustment over the same five one-vs-rest
    permutation p-values as bh_fdr (shared machinery,
    _one_vs_rest_perm_pnums): adjusted numerators are the running max
    of (m - rank + 1) * p_num clamped at 101, so every adjusted
    p-value stays the exact rational adj/101; rejection at alpha =
    0.2 is the integer predicate adj * 5 <= 101."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    k = len(_MARKOV_STATES)
    p_num = _one_vs_rest_perm_pnums(sf_dir)
    order = sorted(range(k), key=lambda t: (p_num[t], _MARKOV_STATES[t]))
    adj = {}
    run = 0
    for r, t in enumerate(order):
        run = max(run, (k - r) * p_num[t])
        adj[t] = min(101, run)
    rank = {t: r + 1 for r, t in enumerate(order)}
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES, pa.string()),
            "p_num": pa.array(p_num, pa.int64()),
            "p_rank": pa.array(
                [rank[t] for t in range(k)], pa.int64()
            ),
            "adj_num": pa.array(
                [adj[t] for t in range(k)], pa.int64()
            ),
            "p_adj": round_like_sql(
                [adj[t] / 101.0 for t in range(k)], 6
            ),
            "reject": pa.array(
                [1 if adj[t] * 5 <= 101 else 0 for t in range(k)],
                pa.int64(),
            ),
        }
    )
