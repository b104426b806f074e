"""Query implementations, part 05 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: western_electric, mmr_topk, char_bigram_entropy, dwell_time, cross_k, eigen_centrality, otsu_threshold, band_mutual_info, weibull_shape, daily_peaks, edge_support, hexbin_cells, q8_market_share, q6_forecast_revenue, q10_returned_items, q13_custdist, q15_top_supplier, q9_product_profit, q11_important_parts, q12_late_shipments, q16_supplier_cnt, q18_large_orders, q20_part_promotion, q21_waiting_suppliers, q22_global_sales_opp, cohort_ltv, common_paths, type_user_jaccard, kmv_distinct, ams_f2, max_drawdown, class_balance_sample, position_attribution, kmv_set_ops, granger_daily, pacf_lags, best_split_stump, js_divergence, pr_curve, viterbi_decode ...
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
    OG_POLYGONS,
    OG_W,
    _og_multiband_tiles_table,
    _og_points_ds,
    _og_polygons_table,
    _og_tiles_table,
    _read_pq,
)


def _q_western_electric(sf_dir: str) -> pa.Table:
    """Western Electric control-chart rules on the daily order-revenue
    series: rule 1 (beyond 3 sigma), rule 2 (2 of 3 consecutive beyond
    2 sigma, same side), rule 4 (8 consecutive strictly same side of
    the mean).  Mean/sigma come from exact integer moments; the side /
    zone indicators are integer, window sums of integers are exact, so
    only the zone-boundary compares are float -- the same expression
    both sides.  Returns (d, rule) firings."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        cents = round_half_away(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"d": pa.array(d), "cents": pa.array(cents)})

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("cents", "sum", "x")],
    )
    order = np.argsort(agg["d"].to_numpy(zero_copy_only=False))
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    xs = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n = len(xs)
    S = int(xs.sum())
    S2 = sum(int(v) * int(v) for v in xs.tolist())  # exact big-int
    mu = float(S) / float(n)
    sd = float(np.sqrt(float(S2) / float(n) - mu * mu))
    xf = xs.astype(np.float64)
    above2 = (xf > mu + 2.0 * sd).astype(np.int64)
    below2 = (xf < mu - 2.0 * sd).astype(np.int64)
    above0 = (xf > mu).astype(np.int64)
    below0 = (xf < mu).astype(np.int64)
    r1 = (xf > mu + 3.0 * sd) | (xf < mu - 3.0 * sd)

    def winsum(a: np.ndarray, w: int) -> np.ndarray:
        cs = np.concatenate([[0], np.cumsum(a)])
        out = np.empty(len(a), np.int64)
        for i in range(len(a)):
            out[i] = cs[i + 1] - cs[max(0, i + 1 - w)]
        return out

    r2 = (winsum(above2, 3) >= 2) | (winsum(below2, 3) >= 2)
    r4 = (winsum(above0, 8) == 8) | (winsum(below0, 8) == 8)
    ds_, rs = [], []
    for rule, mask in ((1, r1), (2, r2), (4, r4)):
        ds_.extend(dd[mask].tolist())
        rs.extend([rule] * int(mask.sum()))
    out = pa.table(
        {"d": pa.array(ds_, pa.int64()), "rule": pa.array(rs, pa.int64())}
    )
    return out.sort_by([("d", "ascending"), ("rule", "ascending")])


def _q_mmr_topk(sf_dir: str) -> pa.Table:
    """Maximal-marginal-relevance diversified top-5 (lambda = 0.5, so
    the argmax of rel - max_sim): query = vec 0, candidate shortlist =
    the deterministic vec_id stride-10 subset.  Embeddings quantize to
    1e6 int64 per element, every dot product is an exact int64 sum
    (the BLAS-order float caveat documented for the ANN family does
    not apply), greedy ties break by vec_id -- the oracle's recursive
    Prim-style selection must match exactly."""
    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def cand(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = vid % 10 == 0
        b = batch.filter(pa.array(keep))
        emb = np.stack(
            [np.asarray(x, np.float64) for x in b["embedding"].to_pylist()]
        ) if b.num_rows else np.zeros((0, 0))
        q = round_half_away(emb * 1e6).astype(np.int64)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "q": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    t = collect_tables(
        ds.map_batches(cand, batch_format="pyarrow", batch_size=None)
    )
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid)
    vid = vid[order]
    mat = np.stack(
        [np.asarray(x, np.int64) for x in t["q"].to_pylist()]
    )[order]
    qi = int(np.where(vid == 0)[0][0])
    dots = mat @ mat.T  # exact int64
    rel = dots[qi]
    cands = [i for i in range(len(vid)) if vid[i] != 0]
    # first pick: max rel, tie by vec_id (cands already vec_id-sorted)
    first = max(cands, key=lambda i: (rel[i], -vid[i]))
    sel = [first]
    while len(sel) < 5:
        best = None
        for i in cands:
            if i in sel:
                continue
            msim = max(int(dots[i][j]) for j in sel)
            sc = int(rel[i]) - msim
            key = (sc, -int(vid[i]))
            if best is None or key > best[0]:
                best = (key, i)
        sel.append(best[1])
    return pa.table(
        {
            "pos": pa.array(list(range(1, 6)), pa.int64()),
            "vec_id": pa.array([int(vid[i]) for i in sel], pa.int64()),
        }
    )


def _q_char_bigram_entropy(sf_dir: str) -> pa.Table:
    """Character-bigram entropy rate per language (the language-model
    compressibility screen): corpus bigram counts per lang through the
    distributed combine (bigrams keyed as code-point pairs -- a
    bijection of the oracle's 2-char strings, so counts and distinct
    totals agree), then per-lang n*ln(n) terms quantized at 1e12 so
    the cross-bigram sum is exact; H = ln(T) - sum/1e12/T."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def grams(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        out_l, out_k = [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            cp = np.frombuffer(t.encode("utf-32-le"), np.uint32).astype(
                np.int64
            )
            if len(cp) < 2:
                continue
            keys = cp[:-1] * (1 << 21) + cp[1:]
            out_l.extend([langs[i]] * len(keys))
            out_k.append(keys)
        if not out_k:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "key": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                }
            )
        k = np.concatenate(out_k)
        t = pa.table(
            {
                "lang": pa.array(out_l),
                "key": pa.array(k),
                "one": pa.array(np.ones(len(k), np.int64)),
            }
        )
        return (
            t.group_by(["lang", "key"]).aggregate([("one", "sum")])
            .rename_columns(["lang", "key", "one"])
        )

    counts = hash_aggregate(
        ds.map_batches(grams, batch_format="pyarrow", batch_size=None),
        ["lang", "key"],
        [("one", "sum", "c")],
        distributed_combine=True,
    )

    def moments(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        tq = round_half_away(c * np.log(c) * 1e12).astype(np.int64)
        t = pa.table(
            {
                "lang": batch["lang"],
                "n": pa.array(c.astype(np.int64)),
                "v": pa.array(np.ones(len(c), np.int64)),
                "tq": pa.array(tq),
            }
        )
        return (
            t.group_by("lang")
            .aggregate([("n", "sum"), ("v", "sum"), ("tq", "sum")])
            .rename_columns(["lang", "n", "v", "tq"])
        )

    parts = collect_tables(
        counts.map_batches(moments, batch_format="pyarrow", batch_size=None)
    )
    out = (
        parts.group_by("lang")
        .aggregate([("n", "sum"), ("v", "sum"), ("tq", "sum")])
        .rename_columns(["lang", "n_bigrams", "vocab", "tq"])
        .sort_by("lang")
    )
    T = out["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
    acc = out["tq"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = np.log(T) - (acc / 1e12) / T
    return pa.table(
        {
            "lang": out["lang"],
            "n_bigrams": out["n_bigrams"].cast(pa.int64()),
            "vocab": out["vocab"].cast(pa.int64()),
            "entropy": round_like_sql(h, 6),
        }
    )


def _q_dwell_time(sf_dir: str) -> pa.Table:
    """Per-cell dwell time: each user's time between consecutive fixes
    (ts, event_id order) is attributed to the cell of the EARLIER fix
    (the standard trajectory time-in-cell model); per-user sequential
    diffs run inside the keyed bucket shuffle (grouped_by_key), cell
    totals roll up via the combiner, top 10 cells by microseconds with
    cell tie-break.  All integer."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(eid) < 2:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "dwell": pa.array([], pa.int64()),
                }
            )
        cell = (eid % 96) // 8 * 12 + ((eid // 96) % 96) // 8
        return pa.table(
            {
                "cell": pa.array(cell[:-1]),
                "dwell": pa.array(np.diff(ts)),
            }
        )

    parts = _grouped_by_key(ds, "user_id", kernel)
    agg = hash_aggregate(parts, ["cell"], [("dwell", "sum", "dwell_us")])
    import pyarrow.compute as pc

    order = pc.sort_indices(
        agg,
        sort_keys=[("dwell_us", "descending"), ("cell", "ascending")],
    )
    top = agg.take(order).slice(0, 10)
    return pa.table(
        {
            "cell": top["cell"].cast(pa.int64()),
            "dwell_us": top["dwell_us"].cast(pa.int64()),
        }
    )


def _q_cross_k(sf_dir: str) -> pa.Table:
    """Bivariate (cross-type) Ripley K: for each radius r in {2,5,8}
    lattice units, the count of ordered (purchase, error) pairs within
    r over the deterministic event_id stride-5 subset, normalized by
    |W| / (nA * nB).  Anchors count their neighbours inside ONE
    coarse-cell shuffle with 8-neighbour halo rows (cell edge 8 >= max
    radius, ordered pairs need no dedup rule) -- never all-pairs.
    Counts exact int64; the K normalization is one float expression,
    1e9-quantized."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    R2S = [4, 25, 64]

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )

    def rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (eid % 5 == 0) & ((et == "purchase") | (et == "error"))
        eid, et = eid[keep], et[keep]
        is_a = (et == "purchase").astype(np.int64)
        gx = eid % 96
        gy = (eid // 96) % 96
        cx, cy = gx // 8, gy // 8
        outs = []
        for dx_ in (-1, 0, 1):
            for dy_ in (-1, 0, 1):
                nx, ny = cx + dx_, cy + dy_
                ok = (nx >= 0) & (nx < 12) & (ny >= 0) & (ny < 12)
                own = np.int64(1) if (dx_ == 0 and dy_ == 0) else np.int64(0)
                outs.append(
                    pa.table(
                        {
                            "cell": pa.array(nx[ok] * 12 + ny[ok]),
                            "own": pa.array(
                                np.full(int(ok.sum()), own, np.int64)
                            ),
                            "is_a": pa.array(is_a[ok]),
                            "gx": pa.array(gx[ok]),
                            "gy": pa.array(gy[ok]),
                        }
                    )
                )
        return pa.concat_tables(outs)

    def kernel(group: pa.Table) -> pa.Table:
        own = group["own"].to_numpy(zero_copy_only=False).astype(bool)
        isa = group["is_a"].to_numpy(zero_copy_only=False).astype(bool)
        gx = group["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gy = group["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = own & isa          # anchors: own purchase rows
        b = ~isa               # all error rows incl. halo
        na = int((own & isa).sum())
        nb_own = int((own & ~isa).sum())
        cols = {"na": pa.array([na], pa.int64()),
                "nb": pa.array([nb_own], pa.int64())}
        if a.any() and b.any():
            d2 = (
                (gx[a][:, None] - gx[b][None, :]) ** 2
                + (gy[a][:, None] - gy[b][None, :]) ** 2
            )
            for r2 in R2S:
                cols[f"c{r2}"] = pa.array([int((d2 <= r2).sum())], pa.int64())
        else:
            for r2 in R2S:
                cols[f"c{r2}"] = pa.array([0], pa.int64())
        return pa.table(cols)

    parts = collect_tables(
        _grouped_by_key(
            ds.map_batches(rows, batch_format="pyarrow", batch_size=None),
            "cell",
            kernel,
        )
    )
    na = int(parts["na"].to_numpy(zero_copy_only=False).sum())
    nb = int(parts["nb"].to_numpy(zero_copy_only=False).sum())
    r2s, cnts, kqs = [], [], []
    for r2 in R2S:
        c = int(parts[f"c{r2}"].to_numpy(zero_copy_only=False).sum())
        kq = int(
            round_half_away(
                np.array(
                    [float(c) * 9216.0 / (float(na) * float(nb)) * 1e9]
                )
            )[0]
        )
        r2s.append(r2); cnts.append(c); kqs.append(kq)
    return pa.table(
        {
            "r2": pa.array(r2s, pa.int64()),
            "n_pairs": pa.array(cnts, pa.int64()),
            "k_q": pa.array(kqs, pa.int64()),
        }
    )


def _q_eigen_centrality(sf_dir: str) -> pa.Table:
    """Eigenvector centrality by power iteration (8 fixed rounds) on
    the undirected edit-1 word graph, max-normalized and 1e6-QUANTIZED
    AFTER EVERY ROUND so each iteration's state is an exact integer
    vector -- the float-summation-order hazard of iterative graph
    scores is removed structurally (cf. word_pagerank's rounded-rank
    ordering).  Edge construction is the distributed deletion-blocked
    join; the iteration runs on the vocabulary-bounded adjacency.
    Top-15 by (score desc, word)."""
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
    a = np.array([wid[w] for w in pairs["w1"].to_pylist()], np.int64)
    b = np.array([wid[w] for w in pairs["w2"].to_pylist()], np.int64)
    srcn = np.concatenate([a, b])
    dstn = np.concatenate([b, a])
    x = np.full(n, 1_000_000, np.int64)
    for _ in range(8):
        s = np.zeros(n, np.int64)
        np.add.at(s, dstn, x[srcn])
        m = int(s.max())
        x = round_half_away(
            s.astype(np.float64) * 1e6 / float(m)
        ).astype(np.int64)
    order = np.lexsort((np.array(vocab), -x))[:15]
    return pa.table(
        {
            "word": pa.array([vocab[i] for i in order]),
            "score_q": pa.array(x[order]),
        }
    )


def _q_otsu_threshold(sf_dir: str) -> pa.Table:
    """Otsu's between-class-variance threshold over the slope-fixture
    raster: valid pixels quantize to exact decivalue integers
    (z * 10 is integral by construction), the 500-bin histogram comes
    from the distributed combiner, and the threshold sweep maximizes
    f(t) = (S*c0 - N*s0)^2 / (c0*(N - c0)) -- both sides evaluate the
    SAME double expression over identical integer moments and break
    ties by threshold, so the argmax agrees exactly."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))

    def hist(batch: pa.Table) -> pa.Table:
        out_k = []
        for i in range(batch.num_rows):
            v = np.asarray(batch["values"][i].as_py(), np.float32).astype(
                np.float64
            )
            v = v[v > -1e30]
            out_k.append(round_half_away(v * 10.0).astype(np.int64))
        k = (
            np.concatenate(out_k) if out_k
            else np.array([], np.int64)
        )
        return pa.table(
            {
                "k": pa.array(k),
                "one": pa.array(np.ones(len(k), np.int64)),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(hist, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("one", "sum", "n")],
    )
    k = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k)
    k, n = k[order], n[order]
    N = int(n.sum())
    S = int((k * n).sum())
    c0 = np.cumsum(n)
    s0 = np.cumsum(k * n)
    # candidate thresholds: observed bins with a nonempty upper class
    valid_t = c0 < N
    kk = k[valid_t].astype(np.float64)
    c0f = c0[valid_t].astype(np.float64)
    s0f = s0[valid_t].astype(np.float64)
    num = (float(S) * c0f - float(N) * s0f)
    f = num * num / (c0f * (float(N) - c0f))
    best = np.lexsort((kk, -f))[0]
    t = int(kk[best])
    f_q = int(round_half_away(np.array([f[best] / 1e6]))[0])
    c0b = int(c0f[best])
    return pa.table(
        {
            "threshold_k": pa.array([t], pa.int64()),
            "n_below": pa.array([c0b], pa.int64()),
            "n_total": pa.array([N], pa.int64()),
            "f_q": pa.array([f_q], pa.int64()),
        }
    )


def _q_band_mutual_info(sf_dir: str) -> pa.Table:
    """Mutual information between the two raster bands over a 10x10
    joint histogram of deci-value bins (the nonlinear-redundancy
    screen next to band_correlation's Pearson r): per-tile band-zip
    joint counts through the combiner, marginals derived from the
    joint table, every n*ln(n) term 1e12-quantized so the three sums
    are exact integers; MI = ln N + (A - R - S)/1e12/N."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def joint(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        b1s, b2s = [], []
        for key, bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            v1, v2 = bands[1], bands[2]
            ok = (v1 > -1e30) & (v2 > -1e30)
            k1 = np.round(v1[ok].astype(np.float64) * 10.0).astype(np.int64)
            k2 = np.round(v2[ok].astype(np.float64) * 10.0).astype(np.int64)
            b1s.append(k1 // 50)
            b2s.append(k2 // 50)
        if b1s:
            b1 = np.concatenate(b1s); b2 = np.concatenate(b2s)
        else:
            b1 = b2 = np.array([], np.int64)
        return pa.table(
            {
                "b1": pa.array(b1),
                "b2": pa.array(b2),
                "one": pa.array(np.ones(len(b1), np.int64)),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(joint, batch_format="pyarrow", batch_size=None),
        ["b1", "b2"],
        [("one", "sum", "c")],
    )
    b1 = agg["b1"].to_numpy(zero_copy_only=False).astype(np.int64)
    b2 = agg["b2"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    N = int(c.sum())

    def nlogn_q(arr: np.ndarray) -> int:
        a = arr.astype(np.float64)
        return int(
            round_half_away(a * np.log(a) * 1e12).astype(np.int64).sum()
        )

    A = nlogn_q(c)
    r = np.zeros(10, np.int64); np.add.at(r, b1, c)
    s = np.zeros(10, np.int64); np.add.at(s, b2, c)
    R = nlogn_q(r[r > 0])
    S = nlogn_q(s[s > 0])
    mi = np.log(float(N)) + (
        float(A) - float(R) - float(S)
    ) / 1e12 / float(N)
    return pa.table(
        {
            "n_cells": pa.array([N], pa.int64()),
            "mi": round_like_sql([mi], 6),
        }
    )


def _q_weibull_shape(sf_dir: str) -> pa.Table:
    """Weibull shape parameter from the Kaplan-Meier plot: OLS slope of
    ln(-ln S(t)) vs ln(t) over curve points with 0 < S < 1 and t > 0
    (slope ~ 1 means exponential/memoryless failure).  Reuses the KM
    pipeline (combiner-tier survival triples); both axes quantize at
    1e12 from the SAME 6dp-rounded survival both sides, so the HUGEINT
    OLS moments are exact."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        kaplan_meier, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    km = kaplan_meier(ds, event_type="error")
    t = km["t_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = km["survival"].to_numpy(zero_copy_only=False).astype(np.float64)
    m = (s > 0.0) & (s < 1.0) & (t > 0)
    u = round_half_away(np.log(t[m].astype(np.float64)) * 1e12).astype(
        np.int64
    )
    v = round_half_away(np.log(-np.log(s[m])) * 1e12).astype(np.int64)
    k = len(u)
    su = int(u.sum()); sv = int(v.sum())
    suv = sum(int(a) * int(b) for a, b in zip(u, v))
    suu = sum(int(a) * int(a) for a in u)
    slope = float(k * suv - su * sv) / float(k * suu - su * su)
    return pa.table(
        {
            "n_points": pa.array([k], pa.int64()),
            "weibull_shape": round_like_sql([slope], 6),
        }
    )


def _q_daily_peaks(sf_dir: str) -> pa.Table:
    """Peak detection on the daily order-revenue series: strict local
    maxima over observed-day neighbours (integer compares) that also
    clear the global mean by 10% -- the spike-candidate screen run
    before changepoint review.  Daily cents via the combiner; the
    neighbour logic is position-based over the bounded day series,
    everything int64 except the one mean compare (same float
    expression both sides)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        cents = round_half_away(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"d": pa.array(d), "cents": pa.array(cents)})

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("cents", "sum", "x")],
    )
    order = np.argsort(agg["d"].to_numpy(zero_copy_only=False))
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    xs = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n = len(xs)
    mu = float(int(xs.sum())) / float(n)
    xf = xs.astype(np.float64)
    peak = np.zeros(n, bool)
    if n >= 3:
        peak[1:-1] = (xs[1:-1] > xs[:-2]) & (xs[1:-1] > xs[2:])
    peak &= xf > 1.1 * mu
    return pa.table(
        {"d": pa.array(dd[peak]), "cents": pa.array(xs[peak])}
    )


def _q_edge_support(sf_dir: str) -> pa.Table:
    """Triangle support per edge of the edit-1 word graph (the k-truss
    building block): support(u,v) = |N(u) & N(v)|, computed on the
    vocabulary-bounded adjacency from the distributed deletion-blocked
    join (same tier as word_pagerank).  Top 15 edges by (support desc,
    w1, w2); exact integer counts."""
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
    w1 = pairs["w1"].to_pylist()
    w2 = pairs["w2"].to_pylist()
    adj: dict[str, set[str]] = {}
    for a, b in zip(w1, w2):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for a, b in zip(w1, w2):
        rows.append((a, b, len(adj[a] & adj[b])))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    top = rows[:15]
    return pa.table(
        {
            "w1": pa.array([r[0] for r in top]),
            "w2": pa.array([r[1] for r in top]),
            "support": pa.array([r[2] for r in top], pa.int64()),
        }
    )


def _q_hexbin_cells(sf_dir: str) -> pa.Table:
    """Hexagonal binning (pointy-top axial scheme, size 4 lattice
    units) over geocoded events -- the H3-like tessellation next to
    the square/s2/geohash/quadkey/z-order cell schemes.  Fractional
    axial coords and the cube-rounding tie logic are the SAME double
    expressions both sides (strict compares; generic points sit off
    the tie boundaries), so cell ids agree exactly.  Top 20 cells by
    count with (q, r) tie-break."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    S = 4.0
    SQ3 = float(np.sqrt(3.0))

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def hexes(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        x = (eid % 96).astype(np.float64)
        y = ((eid // 96) % 96).astype(np.float64)
        q = (SQ3 / 3.0 * x - 1.0 / 3.0 * y) / S
        r = (2.0 / 3.0 * y) / S
        xq, zq = q, r
        yq = -xq - zq
        rx = round_half_away(xq)
        ry = round_half_away(yq)
        rz = round_half_away(zq)
        dx = np.abs(rx - xq)
        dy = np.abs(ry - yq)
        dz = np.abs(rz - zq)
        fix_x = (dx > dy) & (dx > dz)
        fix_y = ~fix_x & (dy > dz)
        fix_z = ~fix_x & ~fix_y
        rx = np.where(fix_x, -ry - rz, rx)
        ry = np.where(fix_y, -rx - rz, ry)
        rz = np.where(fix_z, -rx - ry, rz)
        return pa.table(
            {
                "q": pa.array(rx.astype(np.int64)),
                "r": pa.array(rz.astype(np.int64)),
                "one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(hexes, batch_format="pyarrow", batch_size=None),
        ["q", "r"],
        [("one", "sum", "n")],
    )
    import pyarrow.compute as pc

    order = pc.sort_indices(
        agg,
        sort_keys=[
            ("n", "descending"), ("q", "ascending"), ("r", "ascending"),
        ],
    )
    top = agg.take(order).slice(0, 20)
    return pa.table(
        {
            "q": top["q"].cast(pa.int64()),
            "r": top["r"].cast(pa.int64()),
            "n": top["n"].cast(pa.int64()),
        }
    )


def _q_q8_market_share(sf_dir: str) -> pa.Table:
    """TPC-H Q8 analogue (national market share): nation 0's share of
    region-0-customer revenue per order year.  One lineitem x orders
    pass through the size-aware router; customer->(nation,region) and
    supplier->nation ride the broadcast tier; numerator and
    denominator accumulate as exact cents in the SAME combiner pass
    (no second shuffle); the share is one float division,
    1e9-quantized."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path, columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        c = scaled_int(
            np.asarray(p, np.float64) * (1.0 - np.asarray(d, np.float64)),
            100.0,
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "c": pa.array(c),
            }
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    )
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    rk = nat["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n2r = np.zeros(int(nk.max()) + 1, np.int64)
    n2r[nk] = rk
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).rename_columns(["o_custkey", "c_nationkey"])
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).rename_columns(["l_suppkey", "s_nationkey"])
    withn = joined.map_batches(
        BroadcastLookup(cust, on="o_custkey", take_cols=["c_nationkey"]),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(
        BroadcastLookup(supp, on="l_suppkey", take_cols=["s_nationkey"]),
        batch_format="pyarrow", batch_size=None,
    )

    def tag(batch: pa.Table) -> pa.Table:
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = n2r[cn] == 0
        b = batch.filter(pa.array(keep))
        ts = b["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        yr = (
            ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            + 1970
        )
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "yr": pa.array(yr),
                "num": pa.array(np.where(sn == 0, c, 0)),
                "den": pa.array(c),
            }
        )

    agg = hash_aggregate(
        withn.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["yr"],
        [("num", "sum", "num_cents"), ("den", "sum", "den_cents")],
    ).sort_by("yr")
    num = agg["num_cents"].to_numpy(zero_copy_only=False).astype(np.float64)
    den = agg["den_cents"].to_numpy(zero_copy_only=False).astype(np.float64)
    share_q = round_half_away(num / den * 1e9).astype(np.int64)
    return pa.table(
        {
            "yr": agg["yr"].cast(pa.int64()),
            "num_cents": agg["num_cents"].cast(pa.int64()),
            "den_cents": agg["den_cents"].cast(pa.int64()),
            "share_q": pa.array(share_q),
        }
    )


def _q_q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 analogue (forecasting revenue change): one vectorized
    predicate scan over lineitem -- shipdate in 1997, rounded discount
    cents in [5, 7], quantity < 24 -- summing l_extendedprice *
    l_discount as exact 1e-4-quantized int64 units in per-batch
    partials; the combine is one tiny groupby.  No join, no shuffle of
    row data: the classic pushed-down-filter scan shape."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )
    LO = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
    HI = np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64)

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        d = np.asarray(
            batch["l_discount"].to_numpy(zero_copy_only=False), np.float64
        )
        p = np.asarray(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False),
            np.float64,
        )
        dc = round_half_away(d * 100.0).astype(np.int64)
        keep = (ts >= LO) & (ts < HI) & (q < 24.0) & (dc >= 5) & (dc <= 7)
        rev = scaled_int(p[keep] * d[keep], 10000.0)
        return pa.table(
            {
                "g": pa.array(np.zeros(1, np.int64)),
                "revenue_q": pa.array(
                    np.array([int(rev.sum())], np.int64)
                ),
                "n_items": pa.array(
                    np.array([int(keep.sum())], np.int64)
                ),
            }
        )

    agg = hash_aggregate(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["g"],
        [("revenue_q", "sum", "revenue_q"), ("n_items", "sum", "n_items")],
    )
    return agg.select(["revenue_q", "n_items"])


def _q_q10_returned_items(sf_dir: str) -> pa.Table:
    """TPC-H Q10 analogue (returned-item reporting): revenue cents per
    customer over 'R'-flagged lineitems of 1997-Q3 orders; top 20 by
    revenue with custkey tie-break.  Lineitem filters map-side before
    the size-aware equi_join with the date-filtered orders; the
    per-customer aggregate is combiner-shaped, and the (<= n_cust)-row
    result joins customer/nation names driver-side."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    LO = np.datetime64("1997-07-01T00:00:00", "us").astype(np.int64)
    HI = np.datetime64("1997-10-01T00:00:00", "us").astype(np.int64)
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path, columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def od_filter(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array((ts >= LO) & (ts < HI))).select(
            ["o_orderkey", "o_custkey"]
        )

    od_f = od.map_batches(od_filter, batch_format="pyarrow", batch_size=None)
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount",
        ],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        p = np.asarray(
            b["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64
        )
        d = np.asarray(
            b["l_discount"].to_numpy(zero_copy_only=False), np.float64
        )
        c = scaled_int(p * (1.0 - d), 100.0)
        return pa.table({"l_orderkey": b["l_orderkey"], "c": pa.array(c)})

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od_f, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )
    agg = hash_aggregate(
        joined, ["o_custkey"], [("c", "sum", "revenue_cents")]
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    named = agg.join(
        cust.rename_columns(["o_custkey", "c_name", "c_nationkey"]),
        keys="o_custkey", join_type="inner",
    )
    named = named.join(
        nat.rename_columns(["c_nationkey", "n_name"]),
        keys="c_nationkey", join_type="inner",
    )
    order = pc.sort_indices(
        named,
        sort_keys=[
            ("revenue_cents", "descending"), ("o_custkey", "ascending"),
        ],
    )
    top = named.take(order).slice(0, 20)
    return pa.table(
        {
            "c_custkey": top["o_custkey"].cast(pa.int64()),
            "c_name": top["c_name"],
            "n_name": top["n_name"],
            "revenue_cents": top["revenue_cents"].cast(pa.int64()),
        }
    )


def _q_q13_custdist(sf_dir: str) -> pa.Table:
    """TPC-H Q13 analogue (customer order-count distribution): orders
    not in the '5-LOW' priority class counted per customer, then the
    histogram of those counts INCLUDING the zero bin.  No outer-join
    shuffle: the distributed per-customer aggregate covers customers
    with >= 1 qualifying order, and the zero bin is the exact
    complement n_customers - n_active (customer row count read from
    parquet metadata, no scan)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    od = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.invert(pc.equal(batch["o_orderpriority"], "5-LOW"))
        )
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "_one": pa.array(np.ones(len(b), np.int64)),
            }
        )

    per_cust = hash_aggregate(
        od.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [("_one", "sum", "c_count")],
    )
    counts = per_cust["c_count"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    uniq, freq = np.unique(counts, return_counts=True)
    n_cust = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")
    ).metadata.num_rows
    zero = int(n_cust) - len(counts)
    if zero > 0:
        uniq = np.concatenate([np.zeros(1, np.int64), uniq])
        freq = np.concatenate([np.array([zero], np.int64), freq])
    order = np.lexsort((-uniq, -freq))
    return pa.table(
        {
            "c_count": pa.array(uniq[order].astype(np.int64)),
            "custdist": pa.array(freq[order].astype(np.int64)),
        }
    )


def _q_q15_top_supplier(sf_dir: str) -> pa.Table:
    """TPC-H Q15 analogue (top supplier): revenue cents per supplier
    over lineitems shipped in 1997-Q1; return every supplier tied at
    the maximum (the view + scalar-subquery shape).  One filtered scan
    with per-batch cents partials, a supplier-keyed combine, then the
    argmax runs over the (n_suppliers)-row aggregate driver-side."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    LO = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
    HI = np.datetime64("1997-04-01T00:00:00", "us").astype(np.int64)
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount",
        ],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.filter(pa.array((ts >= LO) & (ts < HI)))
        p = np.asarray(
            b["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64
        )
        d = np.asarray(
            b["l_discount"].to_numpy(zero_copy_only=False), np.float64
        )
        return pa.table(
            {
                "l_suppkey": b["l_suppkey"],
                "c": pa.array(scaled_int(p * (1.0 - d), 100.0)),
            }
        )

    agg = hash_aggregate(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_suppkey"],
        [("c", "sum", "total_cents")],
    )
    tot = agg["total_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    best = agg.filter(pa.array(tot == int(tot.max())))
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    ).rename_columns(["l_suppkey", "s_name"])
    named = best.join(supp, keys="l_suppkey", join_type="inner").sort_by(
        "l_suppkey"
    )
    return pa.table(
        {
            "s_suppkey": named["l_suppkey"].cast(pa.int64()),
            "s_name": named["s_name"],
            "total_cents": named["total_cents"].cast(pa.int64()),
        }
    )


def _q_q9_product_profit(sf_dir: str) -> pa.Table:
    """TPC-H Q9 analogue (product-type profit): for parts named
    '*red*', profit = revenue cents - cost cents (p_retailprice *
    l_quantity standing in for the absent partsupp supplycost),
    grouped by supplier nation x order year.  The part filter +
    retail-price lookup ride a sorted broadcast array map-side (no
    part shuffle); lineitem x orders is the one big join; supplier ->
    nation -> name are broadcast lookups.  Both cent terms round per
    row exactly like the SQL mirror."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    pt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    red = pt.filter(pc.match_substring(pt["p_name"], "red"))
    pk = red["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    retail = np.asarray(
        red["p_retailprice"].to_numpy(zero_copy_only=False), np.float64
    )
    o_pk = np.argsort(pk)
    pk_sorted, retail_sorted = pk[o_pk], retail[o_pk]

    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(od_path, columns=["o_orderkey", "o_orderdate"])
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pos = np.clip(
            np.searchsorted(pk_sorted, lp), 0, len(pk_sorted) - 1
        )
        keep = pk_sorted[pos] == lp
        b = batch.filter(pa.array(keep))
        pos = pos[keep]
        p = np.asarray(
            b["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64
        )
        d = np.asarray(
            b["l_discount"].to_numpy(zero_copy_only=False), np.float64
        )
        q = np.asarray(
            b["l_quantity"].to_numpy(zero_copy_only=False), np.float64
        )
        amt = scaled_int(p * (1.0 - d), 100.0) - scaled_int(
            retail_sorted[pos] * q, 100.0
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "amt": pa.array(amt),
            }
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).rename_columns(["l_suppkey", "s_nationkey"])
    withn = joined.map_batches(
        BroadcastLookup(supp, on="l_suppkey", take_cols=["s_nationkey"]),
        batch_format="pyarrow", batch_size=None,
    )

    def tag(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        yr = (
            ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            + 1970
        )
        return pa.table(
            {
                "s_nationkey": batch["s_nationkey"],
                "yr": pa.array(yr),
                "amt": batch["amt"],
            }
        )

    agg = hash_aggregate(
        withn.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["s_nationkey", "yr"],
        [("amt", "sum", "profit_cents")],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).rename_columns(["s_nationkey", "n_name"])
    named = agg.join(nat, keys="s_nationkey", join_type="inner")
    order = pc.sort_indices(
        named,
        sort_keys=[("n_name", "ascending"), ("yr", "descending")],
    )
    named = named.take(order)
    return pa.table(
        {
            "n_name": named["n_name"],
            "yr": named["yr"].cast(pa.int64()),
            "profit_cents": named["profit_cents"].cast(pa.int64()),
        }
    )


def _q_q11_important_parts(sf_dir: str) -> pa.Table:
    """TPC-H Q11 analogue (important stock): per-part revenue cents
    over lineitems of nation-7 suppliers, keeping parts whose value
    exceeds 3x the mean part value (integer cross-multiplied -- no
    float threshold, scale-invariant unlike TPC-H's fixed fraction).  Supplier filter is a sorted broadcast keyset
    map-side; the per-part aggregate is the only shuffle; the HAVING
    scalar runs over the aggregate driver-side."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keyset = np.sort(sk[sn == 7])

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(keyset) == 0:
            keep = np.zeros(len(ls), bool)
        else:
            pos = np.clip(
                np.searchsorted(keyset, ls), 0, len(keyset) - 1
            )
            keep = keyset[pos] == ls
        b = batch.filter(pa.array(keep))
        p = np.asarray(
            b["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64
        )
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "c": pa.array(scaled_int(p, 100.0)),
            }
        )

    agg = hash_aggregate(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_partkey"],
        [("c", "sum", "value_cents")],
    )
    v = agg["value_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    # scale-invariant importance cut: value > 4x the mean part value
    # (integer cross-multiplied; TPC-H's fixed fraction goes vacuous
    # as the part count grows with sf)
    keep = v * len(v) > 3 * int(v.sum())
    kept = agg.filter(pa.array(keep))
    import pyarrow.compute as pc

    order = pc.sort_indices(
        kept,
        sort_keys=[
            ("value_cents", "descending"), ("l_partkey", "ascending"),
        ],
    )
    kept = kept.take(order)
    return pa.table(
        {
            "p_partkey": kept["l_partkey"].cast(pa.int64()),
            "value_cents": kept["value_cents"].cast(pa.int64()),
        }
    )


def _q_q12_late_shipments(sf_dir: str) -> pa.Table:
    """TPC-H Q12 analogue (shipping-mode priority screen): lineitems
    shipped in 1997 at least 60 days after their order date, counting
    high- vs low-priority orders per l_linestatus (standing in for the
    absent l_shipmode).  Date arithmetic stays in integer
    microseconds; the big join is lineitem x orders through the
    size-aware router; the final aggregate is two int64 counters per
    group."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    LO = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
    HI = np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64)
    DELAY = 60 * 86_400_000_000
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path, columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.filter(pa.array((ts >= LO) & (ts < HI)))
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linestatus": b["l_linestatus"],
                "ship_us": b["l_shipdate"].cast(pa.int64()),
            }
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )

    def tag(batch: pa.Table) -> pa.Table:
        ship = batch["ship_us"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ots = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        late = ship >= ots + DELAY
        b = batch.filter(pa.array(late))
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = ((pr == "1-URGENT") | (pr == "2-HIGH")).astype(np.int64)
        return pa.table(
            {
                "l_linestatus": b["l_linestatus"],
                "high": pa.array(high),
                "low": pa.array(1 - high),
            }
        )

    agg = hash_aggregate(
        joined.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["l_linestatus"],
        [("high", "sum", "high_line_count"), ("low", "sum", "low_line_count")],
    ).sort_by("l_linestatus")
    return pa.table(
        {
            "l_linestatus": agg["l_linestatus"],
            "high_line_count": agg["high_line_count"].cast(pa.int64()),
            "low_line_count": agg["low_line_count"].cast(pa.int64()),
        }
    )


def _q_q16_supplier_cnt(sf_dir: str) -> pa.Table:
    """TPC-H Q16 analogue (parts/supplier relationship): distinct
    supplier counts per (brand, type, size) over lineitem part-supp
    pairs (standing in for partsupp), excluding Brand#5, restricting
    to the classic eight sizes, and dropping low-acctbal suppliers
    (the complaints NOT IN).  The pair dedup is the distributed
    groupby; part/supplier attributes join against the deduped pair
    table driver-side (part and supplier are the small dimensions)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "l_suppkey": batch["l_suppkey"],
                "_one": pa.array(np.ones(len(batch), np.int64)),
            }
        )

    pairs = hash_aggregate(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_partkey", "l_suppkey"],
        [("_one", "sum", "_n")],
    )
    pt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).rename_columns(["l_partkey", "p_brand", "p_type", "p_size"])
    sizes = pa.array([3, 9, 14, 19, 23, 36, 45, 49], pa.int64())
    pt = pt.filter(
        pc.and_(
            pc.invert(pc.equal(pt["p_brand"], "Brand#5")),
            pc.is_in(pt["p_size"].cast(pa.int64()), value_set=sizes),
        )
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"],
    )
    good = supp.filter(
        pc.greater_equal(supp["s_acctbal"], 100.0)
    )["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    goodset = np.sort(good)
    sk = pairs["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.clip(np.searchsorted(goodset, sk), 0, len(goodset) - 1)
    pairs = pairs.filter(pa.array(goodset[pos] == sk))
    j = pairs.join(pt, keys="l_partkey", join_type="inner")
    import pandas as pd

    df = j.select(
        ["p_brand", "p_type", "p_size", "l_suppkey"]
    ).to_pandas()
    g = (
        df.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index(name="supplier_cnt")
    )
    g = g.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).head(20)
    return pa.table(
        {
            "p_brand": pa.array(g["p_brand"].tolist()),
            "p_type": pa.array(g["p_type"].tolist()),
            "p_size": pa.array(g["p_size"].astype(np.int64).tolist()),
            "supplier_cnt": pa.array(
                g["supplier_cnt"].astype(np.int64).tolist()
            ),
        }
    )


def _q_q18_large_orders(sf_dir: str) -> pa.Table:
    """TPC-H Q18 analogue (large-volume customers): orders whose
    summed lineitem quantity exceeds 300, top 10 by total price.
    The per-order quantity aggregate is the distributed groupby
    (quantities are integral, summed as exact int64); the tiny
    qualifying set then filters an orders scan map-side via a sorted
    broadcast keyset, and customer names join driver-side."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        q = round_half_away(
            np.asarray(
                batch["l_quantity"].to_numpy(zero_copy_only=False),
                np.float64,
            )
        ).astype(np.int64)
        return pa.table(
            {"l_orderkey": batch["l_orderkey"], "q": pa.array(q)}
        )

    agg = hash_aggregate(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"],
        [("q", "sum", "total_qty")],
    )
    tq = agg["total_qty"].to_numpy(zero_copy_only=False).astype(np.int64)
    big = agg.filter(pa.array(tq > 300))
    keyset = np.sort(
        big["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    od = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def od_filter(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(keyset) == 0:
            keep = np.zeros(len(ok), bool)
        else:
            pos = np.clip(
                np.searchsorted(keyset, ok), 0, len(keyset) - 1
            )
            keep = keyset[pos] == ok
        b = batch.filter(pa.array(keep))
        cents = scaled_int(
            np.asarray(
                b["o_totalprice"].to_numpy(zero_copy_only=False),
                np.float64,
            ),
            100.0,
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_orderdate": b["o_orderdate"],
                "price_cents": pa.array(cents),
            }
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    hits = collect_tables(
        od.map_batches(od_filter, batch_format="pyarrow", batch_size=None)
    )
    qty = big.rename_columns(["o_orderkey", "total_qty"])
    merged = hits.join(qty, keys="o_orderkey", join_type="inner")
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    ).rename_columns(["o_custkey", "c_name"])
    named = merged.join(cust, keys="o_custkey", join_type="inner")
    order = pc.sort_indices(
        named,
        sort_keys=[
            ("price_cents", "descending"), ("o_orderkey", "ascending"),
        ],
    )
    top = named.take(order).slice(0, 10)
    return pa.table(
        {
            "c_name": top["c_name"],
            "c_custkey": top["o_custkey"].cast(pa.int64()),
            "o_orderkey": top["o_orderkey"].cast(pa.int64()),
            "price_cents": top["price_cents"].cast(pa.int64()),
            "total_qty": top["total_qty"].cast(pa.int64()),
        }
    )


def _q_q20_part_promotion(sf_dir: str) -> pa.Table:
    """TPC-H Q20 analogue (potential part promotion): suppliers who
    shipped more than 60 units of some '*red*' part during 1997.
    The red-part keyset broadcasts into the lineitem scan; the
    per-(supplier, part) quantity aggregate is the distributed
    groupby; the EXISTS collapses to a distinct-supplier pass over
    the qualifying aggregate."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    pt = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
    )
    red = np.sort(
        pt.filter(pc.match_substring(pt["p_name"], "red"))[
            "p_partkey"
        ].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    LO = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)
    HI = np.datetime64("1998-01-01T00:00:00", "us").astype(np.int64)
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pos = np.clip(np.searchsorted(red, lp), 0, len(red) - 1)
        keep = (ts >= LO) & (ts < HI) & (red[pos] == lp)
        b = batch.filter(pa.array(keep))
        q = round_half_away(
            np.asarray(
                b["l_quantity"].to_numpy(zero_copy_only=False), np.float64
            )
        ).astype(np.int64)
        return pa.table(
            {
                "l_suppkey": b["l_suppkey"],
                "l_partkey": b["l_partkey"],
                "q": pa.array(q),
            }
        )

    agg = hash_aggregate(
        li.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["l_suppkey", "l_partkey"],
        [("q", "sum", "qty")],
    )
    qv = agg["qty"].to_numpy(zero_copy_only=False).astype(np.int64)
    sup = np.unique(
        agg.filter(pa.array(qv > 60))["l_suppkey"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    )
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    hit = supp.filter(pa.array(np.isin(sk, sup))).sort_by("s_name")
    return pa.table(
        {
            "s_name": hit["s_name"],
            "s_nationkey": hit["s_nationkey"].cast(pa.int64()),
        }
    )


def _q_q21_waiting_suppliers(sf_dir: str) -> pa.Table:
    """TPC-H Q21 analogue (suppliers who kept orders waiting): over
    finished ('F') orders with multiple suppliers, count per supplier
    the orders where ONLY that supplier shipped > 60 days after the
    order date.  lineitem x orders through the size-aware router;
    first distributed aggregate collapses to (order, supplier,
    any_late); the per-order exists/not-exists pair reduces over that
    table with the (sk+1)*late - 1 argmax trick (suppkey 0 is real)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    DELAY = 60 * 86_400_000_000
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path, columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
    )

    def od_filter(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "odate_us": b["o_orderdate"].cast(pa.int64()),
            }
        )

    od_f = od.map_batches(od_filter, batch_format="pyarrow", batch_size=None)
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "ship_us": batch["l_shipdate"].cast(pa.int64()),
            }
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od_f, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )

    def tag(batch: pa.Table) -> pa.Table:
        ship = batch["ship_us"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        odt = batch["odate_us"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        late = (ship > odt + DELAY).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "late": pa.array(late),
            }
        )

    per_os = hash_aggregate(
        joined.map_batches(tag, batch_format="pyarrow", batch_size=None),
        ["l_orderkey", "l_suppkey"],
        [("late", "sum", "n_late_lines")],
    )
    ok = per_os["l_orderkey"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sk = per_os["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    late = (
        per_os["n_late_lines"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        > 0
    ).astype(np.int64)
    order = np.argsort(ok, kind="stable")
    ok, sk, late = ok[order], sk[order], late[order]
    uniq, start = np.unique(ok, return_index=True)
    n_supp = np.diff(np.append(start, len(ok)))
    n_late = np.add.reduceat(late, start)
    late_sk = np.maximum.reduceat((sk + 1) * late, start) - 1
    cred = late_sk[(n_supp > 1) & (n_late == 1)]
    su, cnt = np.unique(cred, return_counts=True)
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    ).rename_columns(["sk", "s_name"])
    res = pa.table(
        {"sk": pa.array(su), "numwait": pa.array(cnt.astype(np.int64))}
    ).join(supp, keys="sk", join_type="inner")
    order2 = pc.sort_indices(
        res,
        sort_keys=[("numwait", "descending"), ("s_name", "ascending")],
    )
    top = res.take(order2).slice(0, 10)
    return pa.table(
        {"s_name": top["s_name"], "numwait": top["numwait"]}
    )


def _q_q22_global_sales_opp(sf_dir: str) -> pa.Table:
    """TPC-H Q22 analogue (global sales opportunity): customers in
    five nations with account balance above the positive-balance
    average (integer cross-multiplied cents -- no float threshold)
    and no orders on/after 1999-01-01, aggregated per nation.  The
    orders side runs distributed (distinct recent custkeys via the
    groupby tier); the customer dimension evaluates driver-side."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    NATIONS = np.array([1, 3, 5, 7, 9], np.int64)
    CUT = np.datetime64("1999-01-01T00:00:00", "us").astype(np.int64)
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    bal = round_half_away(
        np.asarray(
            cust["c_acctbal"].to_numpy(zero_copy_only=False), np.float64
        )
        * 100.0
    ).astype(np.int64)
    insel = np.isin(cn, NATIONS)
    pos_mask = insel & (bal > 0)
    n_pos = int(pos_mask.sum())
    tot_pos = int(bal[pos_mask].sum())

    od = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.filter(pa.array(ts >= CUT))
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "_one": pa.array(np.ones(len(b), np.int64)),
            }
        )

    recent = hash_aggregate(
        od.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [("_one", "sum", "_n")],
    )
    rk = np.sort(
        recent["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    has_recent = np.zeros(len(ck), bool)
    if len(rk):
        p = np.clip(np.searchsorted(rk, ck), 0, len(rk) - 1)
        has_recent = rk[p] == ck
    qual = insel & (bal * n_pos > tot_pos) & ~has_recent
    nk = cn[qual]
    bq = bal[qual]
    uniq, inv = np.unique(nk, return_inverse=True)
    numcust = np.bincount(inv).astype(np.int64)
    totbal = np.bincount(inv, weights=bq.astype(np.float64)).astype(
        np.int64
    )
    return pa.table(
        {
            "c_nationkey": pa.array(uniq),
            "numcust": pa.array(numcust),
            "totacctbal_cents": pa.array(totbal),
        }
    )


def _q_cohort_ltv(sf_dir: str) -> pa.Table:
    """Cohort lifetime-value curve: users cohorted by first-seen day,
    cumulative purchase cents per (cohort_day, age-in-days).  Two
    distributed aggregates (per-user min day; per-(user, day) purchase
    cents), a broadcast cohort lookup, then the cumulative sum runs
    over the bounded days x days grid driver-side."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    EPOCH = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    DAY = 86_400_000_000
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts - EPOCH) // DAY
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = np.asarray(
            batch["value"].to_numpy(zero_copy_only=False), np.float64
        )
        cents = np.where(
            et == "purchase", round_half_away(v * 100.0), 0.0
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pa.array(day),
                "cents": pa.array(cents),
            }
        )

    pd_ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    per_ud = hash_aggregate(
        pd_ds,
        ["user_id", "day"],
        [("cents", "sum", "rev"), ("day", "min", "_d")],
    )
    uid = per_ud["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = per_ud["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    rev = per_ud["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
    # per-user cohort day = min activity day (any event type)
    order = np.argsort(uid, kind="stable")
    uid, day, rev = uid[order], day[order], rev[order]
    uu, start = np.unique(uid, return_index=True)
    cohort = np.minimum.reduceat(day, start)
    cohort_full = np.repeat(cohort, np.diff(np.append(start, len(uid))))
    age = day - cohort_full
    keep = rev != 0
    key = cohort_full[keep] * 100000 + age[keep]
    uk, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=rev[keep].astype(np.float64)).astype(
        np.int64
    )
    cd = uk // 100000
    ag = uk % 100000
    # cumulative within cohort (uk is sorted, so ages ascend per cohort)
    cum = sums.copy()
    for i in range(1, len(cum)):
        if cd[i] == cd[i - 1]:
            cum[i] += cum[i - 1]
    return pa.table(
        {
            "cohort_day": pa.array(cd.astype(np.int64)),
            "age": pa.array(ag.astype(np.int64)),
            "cum_revenue_cents": pa.array(cum.astype(np.int64)),
        }
    )


def _q_common_paths(sf_dir: str) -> pa.Table:
    """Top user journey prefixes: each user's first three events (ts
    then event_id tie-break) joined into a '>' path, counted across
    users; top 15 with path tie-break.  Per-user ordering runs inside
    the bucketed grouped_by_key tier (one shuffle, vectorized slices);
    the path histogram is a bounded second aggregate."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def first3(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("ts", "ascending"), ("event_id", "ascending")],
        )
        g = group.take(order).slice(0, 3)
        path = ">".join(g["event_type"].to_pylist())
        return pa.table({"path": pa.array([path])})

    paths = collect_tables(_grouped_by_key(ds, "user_id", first3))
    vals, counts = np.unique(
        np.asarray(paths["path"].to_pylist()), return_counts=True
    )
    order = np.lexsort((vals, -counts))[:15]
    return pa.table(
        {
            "path": pa.array(vals[order]),
            "n": pa.array(counts[order].astype(np.int64)),
        }
    )


def _q_type_user_jaccard(sf_dir: str) -> pa.Table:
    """Co-engagement matrix: Jaccard overlap of user sets between
    every pair of event types.  The distinct (type, user) dedup is the
    distributed aggregate; the 5x5 pair table evaluates driver-side
    with exact integer intersection/union counts and a ROUND(...,6)
    shared float."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "user_id": batch["user_id"],
                "_one": pa.array(np.ones(len(batch), np.int64)),
            }
        )

    pairs = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "user_id"],
        [("_one", "sum", "_n")],
    )
    et = np.asarray(pairs["event_type"].to_pylist())
    uid = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = np.unique(et)
    sets = {t: set(uid[et == t].tolist()) for t in types}
    ta, tb, inter, uni, jq = [], [], [], [], []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = sets[types[i]], sets[types[j]]
            ii = len(a & b)
            uu = len(a | b)
            ta.append(types[i])
            tb.append(types[j])
            inter.append(ii)
            uni.append(uu)
            jq.append(round(ii / uu, 6) if uu else 0.0)
    return pa.table(
        {
            "type_a": pa.array(ta),
            "type_b": pa.array(tb),
            "n_inter": pa.array(np.array(inter, np.int64)),
            "n_union": pa.array(np.array(uni, np.int64)),
            "jaccard": pa.array(np.array(jq, np.float64)),
        }
    )


def _q_kmv_distinct(sf_dir: str) -> pa.Table:
    """KMV (k-minimum-values) distinct-user sketch per event type:
    per-block bottom-64 distinct mix32 hashes merge by union +
    re-truncate; the estimator (k-1)*2^32 // h_(k) is all-integer so
    the SQL mirror is bit-exact (mix32 is a bijection on [0,2^32), so
    no hash collisions for int keys)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_kmv_distinct,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    return grouped_kmv_distinct(ds, "event_type", "user_id", k=64, seed=31)


def _q_ams_f2(sf_dir: str) -> pa.Table:
    """AMS F2 (second frequency moment of per-user event counts):
    8 deterministic {-1,+1} sign streams from mix32(user_id + r, 100),
    per-block int64 partial sign sums, X_r = S_r^2, integer-mean
    estimate, with the exact F2 computed beside it via a distributed
    grouped count -> sum-of-squares partials."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        ams_f2,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    return ams_f2(ds, "user_id", rows=8, seed=100)


def _q_max_drawdown(sf_dir: str) -> pa.Table:
    """Maximum drawdown of the per-user signed running balance (even
    event_id deposits +cents, odd withdraws -cents, the
    clamped_balance convention unclamped): dd_t = runmax(P)_t - P_t,
    all exact int64 prefix scans inside the one keyed shuffle."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int as _si,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _si(batch["value"], 100.0)
        delta = np.where(eid % 2 == 0, cents, -cents)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "event_id": batch["event_id"],
                "delta": pa.array(delta),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        order = np.lexsort(
            (
                group["event_id"].to_numpy(zero_copy_only=False),
                group["ts_us"].to_numpy(zero_copy_only=False),
            )
        )
        d = group["delta"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        p = np.cumsum(d)
        peak = np.maximum.accumulate(p)
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid], group["user_id"].type),
                "max_drawdown": pa.array([int((peak - p).max())], pa.int64()),
                "peak": pa.array([int(p.max())], pa.int64()),
                "final": pa.array([int(p[-1])], pa.int64()),
            }
        )

    out = grouped_by_key(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id",
        per_user,
    )
    return collect_tables(out).sort_by("user_id")


def _q_class_balance_sample(sf_dir: str) -> pa.Table:
    """Balanced class downsampling: every language keeps exactly
    min-class-count documents, chosen as the bottom-m by
    mix32(doc_id, 77) -- deterministic, append-stable, partitioning-
    independent.  Per-lang counts are a tiny aggregate; membership is
    a per-block rank-free filter against the broadcast per-lang m-th
    hash thresholds; output is the per-lang kept count + id checksum."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],
                "hv": pa.array(mix32(did, 77)),
                "_one": pa.array(np.ones(len(did), np.int64)),
            }
        )

    pd_ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    counts = hash_aggregate(pd_ds, ["lang"], [("_one", "sum", "n")])
    m = int(
        counts["n"].to_numpy(zero_copy_only=False).astype(np.int64).min()
    )
    # per-lang m-th smallest hash = keep threshold (bottom-m partials
    # merge by union + re-truncate, exactly the KMV shape)
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_kmv_bottomk,
    )

    bk = grouped_kmv_bottomk(pd_ds, "lang", "doc_id", k=m, seed=77)
    gl = np.asarray(bk["lang"].to_numpy(zero_copy_only=False))
    gh = bk["_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    thresh = {
        lv: int(gh[gl == lv].max()) for lv in np.unique(gl)
    }

    def keep_partial(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_numpy(zero_copy_only=False))
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = batch["hv"].to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.array([thresh[lv] for lv in lang], np.int64)
        keep = hv <= thr
        lk, dk = lang[keep], did[keep]
        order = np.argsort(lk, kind="stable")
        lk, dk = lk[order], dk[order]
        gs, start = np.unique(lk, return_index=True)
        ends = np.append(start[1:], len(lk))
        return pa.table(
            {
                "lang": pa.array(gs),
                "n_kept": pa.array((ends - start).astype(np.int64)),
                "id_sum": pa.array(
                    np.add.reduceat(dk, start).astype(np.int64)
                    if len(dk)
                    else np.array([], np.int64)
                ),
            }
        )

    out = hash_aggregate(
        pd_ds.map_batches(keep_partial, batch_format="pyarrow", batch_size=None),
        ["lang"],
        [("n_kept", "sum", "n_kept"), ("id_sum", "sum", "id_sum")],
    )
    return out.sort_by("lang")


def _q_position_attribution(sf_dir: str) -> pa.Table:
    """U-shaped (position-based) multi-touch attribution: each
    purchase's cents weighted 40/20/40 across the 24 h touch window
    (1 touch -> 100%, 2 -> 50/50, else first/last 40% and the middle
    20% floor-divided with the remainder on the first middle), all in
    exact millionths so type sums are int64; per-user ordered matching
    in the groupby map_groups tier (the linear_attribution shape)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int as _si,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        cents = _si(g["value"], 100.0)
        types: dict[str, int] = {}
        is_p = et == "purchase"
        lo = np.searchsorted(ts, ts - 86_400_000_000, side="left")
        for i in np.nonzero(is_p)[0].tolist():
            j0 = int(lo[i])
            m = i - j0
            if m <= 0:
                continue
            c = int(cents[i])
            if m == 1:
                w = [1_000_000]
            elif m == 2:
                w = [500_000, 500_000]
            else:
                mid = m - 2
                base = 200_000 // mid
                rem = 200_000 % mid
                w = (
                    [400_000]
                    + [base + (rem if j == 0 else 0) for j in range(mid)]
                    + [400_000]
                )
            for j in range(j0, i):
                t = et[j]
                types[t] = types.get(t, 0) + c * w[j - j0]
        if not types:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "tq": pa.array([], pa.int64()),
                }
            )
        ks = sorted(types)
        return pa.table(
            {
                "event_type": pa.array(ks),
                "tq": pa.array([types[k] for k in ks], pa.int64()),
            }
        )

    per = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    out = collect_tables(per)
    et = np.asarray(out["event_type"].to_pylist())
    tq = out["tq"].to_numpy(zero_copy_only=False).astype(np.int64)
    ks = np.unique(et)
    sums = np.array([int(tq[et == k].sum()) for k in ks], np.int64)
    return pa.table(
        {"event_type": pa.array(ks), "credit_q": pa.array(sums)}
    )


def _q_kmv_set_ops(sf_dir: str) -> pa.Table:
    """KMV theta-sketch set operations: per-event-type bottom-64
    user-hash sketches combine pairwise driver-side into union /
    intersection distinct estimates (merged bottom-k + shared-hash
    inclusion ratio, Dasgupta et al. theta-sketch estimator) -- all
    integer, so the SQL mirror is bit-exact."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_kmv_bottomk,
    )

    K = 64
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    bk = grouped_kmv_bottomk(ds, "event_type", "user_id", k=K, seed=31)
    gl = np.asarray(bk["event_type"].to_numpy(zero_copy_only=False))
    gh = bk["_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(np.unique(gl).tolist())
    sk = {t: np.sort(gh[gl == t]) for t in types}
    ta, tb, eu, nb, ei = [], [], [], [], []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = sk[types[i]], sk[types[j]]
            merged = np.union1d(a, b)
            if len(merged) >= K:
                topk = merged[:K]
                kth = int(topk[-1])
                est_u = (K - 1) * 4294967296 // kth
            else:
                topk = merged
                est_u = len(merged)
            kk = len(topk)
            n_both = int(
                (np.isin(topk, a) & np.isin(topk, b)).sum()
            )
            ta.append(types[i])
            tb.append(types[j])
            eu.append(est_u)
            nb.append(n_both)
            ei.append(n_both * est_u // kk)
    return pa.table(
        {
            "type_a": pa.array(ta),
            "type_b": pa.array(tb),
            "est_union": pa.array(np.array(eu, np.int64)),
            "n_both": pa.array(np.array(nb, np.int64)),
            "est_inter": pa.array(np.array(ei, np.int64)),
        }
    )


def _q_granger_daily(sf_dir: str) -> pa.Table:
    """Granger-style lag-1 test: do yesterday's clicks predict today's
    purchases beyond yesterday's purchases?  Daily counts (dense day
    spine), restricted y~[1,y1] vs unrestricted y~[1,y1,x1] OLS with
    every moment an exact int64 and Cramer determinants expanded as
    exact integers (the ols_two_var discipline); F and R^2 are pinned
    shared-float expressions."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    EPOCH = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    DAY = 86_400_000_000
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array((t - EPOCH) // DAY),
                "y": pa.array((et == "purchase").astype(np.int64)),
                "x": pa.array((et == "click").astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("y", "sum", "y"), ("x", "sum", "x")],
    )
    day = agg["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    yv = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    xv = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    spine = np.arange(day.min(), day.max() + 1)
    yd = np.zeros(len(spine), np.int64)
    xd = np.zeros(len(spine), np.int64)
    yd[day - day.min()] = yv
    xd[day - day.min()] = xv
    y = yd[1:]
    y1 = yd[:-1]
    x1 = xd[:-1]
    n = len(y)
    s1 = int(y1.sum()); s2 = int(x1.sum()); sy = int(y.sum())
    s11 = int((y1 * y1).sum()); s22 = int((x1 * x1).sum())
    s12 = int((y1 * x1).sum()); s1y = int((y1 * y).sum())
    s2y = int((x1 * y).sum()); syy = int((y * y).sum())

    def det3(a, b, c, d, e, f, g, h, i):
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    d0 = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    db0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    db1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    db2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    b0 = float(db0) / float(d0)
    b1 = float(db1) / float(d0)
    b2 = float(db2) / float(d0)
    ssr_u = float(syy) - (b0 * float(sy) + b1 * float(s1y) + b2 * float(s2y))
    # restricted y ~ [1, y1]
    den_r = n * s11 - s1 * s1
    b1r = float(n * s1y - s1 * sy) / float(den_r)
    b0r = (float(sy) - b1r * float(s1)) / float(n)
    ssr_r = float(syy) - (b0r * float(sy) + b1r * float(s1y))
    f_stat = (ssr_r - ssr_u) * float(n - 3) / ssr_u
    sst = float(syy) - float(sy) * float(sy) / float(n)
    r2_u = 1.0 - ssr_u / sst
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "f_stat": round_like_sql([f_stat], 6),
            "ssr_r": round_like_sql([ssr_r], 6),
            "ssr_u": round_like_sql([ssr_u], 6),
            "r2_u": round_like_sql([r2_u], 6),
        }
    )


def _q_pacf_lags(sf_dir: str) -> pa.Table:
    """Partial autocorrelation of the hourly event-count series at
    lags 1-3 via the Durbin-Levinson recursion unrolled over the
    acf_lags moments: exact int64 sums feed the shared-float rho_1..3
    expressions, then the pinned phi chain (phi11=r1,
    phi22=(r2-r1^2)/(1-r1^2), phi33 from the level-2 coefficients)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hr": pa.array(us // 3_600_000_000),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["hr"],
        [("_one", "sum", "x")],
    ).sort_by("hr")
    hr = agg["hr"].to_numpy(zero_copy_only=False).astype(np.int64)
    xs = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(hr[0]), int(hr[-1])
    n = hi - lo + 1
    x = np.zeros(n, np.int64)
    x[hr - lo] = xs
    s_tot = int(x.sum())
    q_tot = int((x * x).sum())
    mu = float(s_tot) / float(n)
    rho = {}
    for h in (1, 2, 3):
        p = int((x[:-h] * x[h:]).sum())
        sa = int(x[:-h].sum())
        sb = int(x[h:].sum())
        num = float(p) - mu * float(sa) - mu * float(sb) + float(n - h) * mu * mu
        den = float(q_tot) - 2.0 * mu * float(s_tot) + float(n) * mu * mu
        rho[h] = num / den
    r1, r2, r3 = rho[1], rho[2], rho[3]
    p11 = r1
    p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    p21 = r1 - p22 * r1
    p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    return pa.table(
        {
            "lag": pa.array([1, 2, 3], pa.int64()),
            "pacf": round_like_sql([p11, p22, p33], 6),
        }
    )


def _q_best_split_stump(sf_dir: str) -> pa.Table:
    """Decision-stump learning: the n_chars threshold minimizing
    weighted Gini impurity for predicting lang='en' (maximizing
    sum_side sumsq_class/n_side).  Candidate thresholds = distinct
    n_chars (a bounded aggregate); cumulative class counts are exact
    int64; the score is one shared float expression and the argmax
    tie-breaks on the smaller threshold."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "t": batch["n_chars"],
                "_one": pa.array(np.ones(len(lang), np.int64)),
                "e": pa.array((lang == "en").astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("_one", "sum", "n"), ("e", "sum", "e")],
    ).sort_by("t")
    t = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    ee = agg["e"].to_numpy(zero_copy_only=False).astype(np.int64)
    nl = np.cumsum(nn)
    el = np.cumsum(ee)
    nt, et = int(nl[-1]), int(el[-1])
    keep = nl < nt
    t, nl, el = t[keep], nl[keep], el[keep]
    nr = nt - nl
    er = et - el
    score = (
        (el * el + (nl - el) * (nl - el)).astype(np.float64) / nl.astype(np.float64)
        + (er * er + (nr - er) * (nr - er)).astype(np.float64)
        / nr.astype(np.float64)
    )
    best = int(np.lexsort((t, -score))[0])
    return pa.table(
        {
            "threshold": pa.array([int(t[best])], pa.int64()),
            "n_left": pa.array([int(nl[best])], pa.int64()),
            "n_right": pa.array([int(nr[best])], pa.int64()),
            "score": round_like_sql([float(score[best])], 6),
        }
    )


def _q_js_divergence(sf_dir: str) -> pa.Table:
    """Jensen-Shannon divergence between per-source character
    distributions, all source pairs: per-(source, codepoint) counts
    via the combiner tier (utf-32 views, no char loops), per-char
    p*ln(p/m) terms quantized at 1e12 so the cross-char sums are
    exact int64, one shared float tail."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def chars(batch: pa.Table) -> pa.Table:
        srcs, cps, cnts = [], [], []
        src = np.asarray(batch["source"].to_numpy(zero_copy_only=False))
        texts = batch["text"].to_pylist()
        order = np.argsort(src, kind="stable")
        i = 0
        while i < len(order):
            j = i
            buf = []
            while j < len(order) and src[order[j]] == src[order[i]]:
                buf.append(
                    np.frombuffer(
                        texts[order[j]].encode("utf-32-le"), np.uint32
                    )
                )
                j += 1
            cp = np.concatenate(buf) if buf else np.array([], np.uint32)
            u, c = np.unique(cp, return_counts=True)
            srcs.extend([src[order[i]]] * len(u))
            cps.append(u.astype(np.int64))
            cnts.append(c.astype(np.int64))
            i = j
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "cp": pa.array(
                    np.concatenate(cps) if cps else np.array([], np.int64)
                ),
                "n": pa.array(
                    np.concatenate(cnts) if cnts else np.array([], np.int64)
                ),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(chars, batch_format="pyarrow", batch_size=None),
        ["source", "cp"],
        [("n", "sum", "n")],
    )
    src = np.asarray(agg["source"].to_numpy(zero_copy_only=False))
    cp = agg["cp"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sources = sorted(np.unique(src).tolist())
    dist = {}
    for s in sources:
        m = src == s
        dist[s] = (dict(zip(cp[m].tolist(), nn[m].tolist())), int(nn[m].sum()))
    sa_l, sb_l, js_l = [], [], []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            da, ta = dist[sources[i]]
            db, tb = dist[sources[j]]
            qa = 0
            qb = 0
            for c in set(da) | set(db):
                na = da.get(c, 0)
                nb = db.get(c, 0)
                p_a = float(na) / float(ta)
                p_b = float(nb) / float(tb)
                m = (p_a + p_b) / 2.0
                if na > 0:
                    qa += int(
                        round_half_away(
                            np.array([p_a * np.log(p_a / m) * 1e12])
                        )[0]
                    )
                if nb > 0:
                    qb += int(
                        round_half_away(
                            np.array([p_b * np.log(p_b / m) * 1e12])
                        )[0]
                    )
            js = 0.5 * (float(qa) / 1e12) + 0.5 * (float(qb) / 1e12)
            sa_l.append(sources[i])
            sb_l.append(sources[j])
            js_l.append(js)
    return pa.table(
        {
            "source_a": pa.array(sa_l),
            "source_b": pa.array(sb_l),
            "js": round_like_sql(js_l, 6),
        }
    )


def _q_pr_curve(sf_dir: str) -> pa.Table:
    """Precision-recall sweep for the rule "score = n_chars predicts
    lang='en'": one row per distinct threshold (predict positive when
    n_chars >= t) with exact int64 confusion counts and
    precision / recall / F1 / MCC as single shared float expressions
    -- the model-eval counterpart of roc_auc's rank form."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "t": batch["n_chars"],
                "_one": pa.array(np.ones(len(lang), np.int64)),
                "pos": pa.array((lang == "en").astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["t"],
        [("_one", "sum", "n"), ("pos", "sum", "pos")],
    ).sort_by([("t", "descending")])
    t = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    pp_ = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    tp = np.cumsum(pp_)
    pp = np.cumsum(nn)
    nt, pt = int(pp[-1]), int(tp[-1])
    fp = pp - tp
    fn = pt - tp
    tn = nt - pp - fn
    prec = tp.astype(np.float64) / pp.astype(np.float64)
    rec = tp.astype(np.float64) / float(pt)
    f1 = 2.0 * tp.astype(np.float64) / (2.0 * tp + fp + fn).astype(np.float64)
    den = np.sqrt(
        ((tp + fp) * (tp + fn)).astype(np.float64)
        * ((tn + fp) * (tn + fn)).astype(np.float64)
    )
    den_safe = np.where(den == 0.0, 1.0, den)
    mcc = np.where(
        den == 0.0, 0.0, (tp * tn - fp * fn).astype(np.float64) / den_safe
    )
    return pa.table(
        {
            "threshold": pa.array(t),
            "tp": pa.array(tp.astype(np.int64)),
            "fp": pa.array(fp.astype(np.int64)),
            "fn": pa.array(fn.astype(np.int64)),
            "tn": pa.array(tn.astype(np.int64)),
            "prec": round_like_sql(prec, 6),
            "rec": round_like_sql(rec, 6),
            "f1": round_like_sql(f1, 6),
            "mcc": round_like_sql(mcc, 6),
        }
    )


_VIT_STATES = ("click", "error", "purchase", "signup", "view")


def _q_viterbi_decode(sf_dir: str) -> pa.Table:
    """Viterbi decoding of each user's event sequence under a fixed
    integer-scored HMM (emission +2 match / -1 mismatch, +1 stay
    bonus): the max-sum DP runs per user inside the one keyed shuffle
    with an exact int64 5-state vector, so the recursive-CTE SQL
    mirror (one GREATEST chain per state per step) is bit-exact.
    Output: best path score + final state (alphabetical tie-break)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    states = _VIT_STATES
    s_idx = {s: i for i, s in enumerate(states)}

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        et = group.take(order)["event_type"].to_pylist()
        em0 = np.full(len(states), -1, np.int64)
        if et[0] in s_idx:
            em0[s_idx[et[0]]] = 2
        score = em0.copy()
        for ev in et[1:]:
            m = score.max()
            em = np.full(len(states), -1, np.int64)
            if ev in s_idx:
                em[s_idx[ev]] = 2
            score = np.maximum(score + 1, m) + em
        best = int(np.argmax(score))
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid], group["user_id"].type),
                "best_score": pa.array([int(score[best])], pa.int64()),
                "best_state": pa.array([states[best]], pa.string()),
            }
        )

    out = collect_tables(_grouped_by_key(ds, "user_id", per_user))
    return out.sort_by("user_id")


def _q_zonal_median(sf_dir: str) -> pa.Table:
    """Per-polygon exact raster quartiles (0.25/0.5/0.75,
    quantile_disc rank convention): PIP assignment via the per-actor
    STRtree joiner, then one grouped map_groups quantile shuffle --
    the order-statistics companion of zonal_stats' algebraic moments."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        PIPJoiner,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    pts = _og_points_ds(valid_only=True)
    joined = pts.map_batches(
        PIPJoiner(_og_polygons_table()), batch_format="pyarrow", batch_size=None
    )
    out = collect_tables(
        grouped_exact_quantiles(joined, "polygon_id", "z", [0.25, 0.5, 0.75])
    )
    return out.sort_by(
        [("polygon_id", "ascending"), ("q", "ascending")]
    )


def _q_huff_model(sf_dir: str) -> pa.Table:
    """Huff retail-gravity probabilities on the 12x12 block lattice:
    destinations = top-8 blocks by event mass (deterministic
    tie-break), attraction m / (d2 + 1) per (origin, store) quantized
    at 1e9 so the per-origin normalizing sum is an exact int64; the
    probability is the one shared float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def block(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bx": pa.array(((eid % 96) // 8).astype(np.int64)),
                "by": pa.array((((eid // 96) % 96) // 8).astype(np.int64)),
            }
        )

    counts = partial_count(
        ds.map_batches(block, batch_format="pyarrow", batch_size=None),
        ["bx", "by"],
    ).rename_columns(["bx", "by", "m"])
    bx = counts["bx"].to_numpy(zero_copy_only=False).astype(np.int64)
    by = counts["by"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = counts["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = by * 12 + bx
    top = np.lexsort((key, -m))[:8]
    ocell, scell, qv = [], [], []
    for i in range(len(key)):
        qs = []
        for j in top:
            d2 = int(
                (bx[i] - bx[j]) ** 2 + (by[i] - by[j]) ** 2
            )
            w = float(m[j]) / float(d2 + 1)
            qs.append(int(round_half_away(np.array([w * 1e9]))[0]))
        tot = sum(qs)
        for j, q in zip(top, qs):
            ocell.append(int(key[i]))
            scell.append(int(key[j]))
            qv.append(float(q) / float(tot))
    return pa.table(
        {
            "origin_cell": pa.array(ocell, pa.int64()),
            "store_cell": pa.array(scell, pa.int64()),
            "prob": round_like_sql(qv, 6),
        }
    )


def _q_mahalanobis_outliers(sf_dir: str) -> pa.Table:
    """Top-20 Mahalanobis outliers of (value cents, hour-of-day):
    exact int64 covariance moments in pass 1, the 2x2-inverse
    quadratic form as one pinned shared-float expression in pass 2
    with per-block partial top-k (no full sort) -- multivariate
    anomaly screening in two broadcast passes."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int as _si,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "value"],
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = _si(batch["value"], 100.0)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = (us // 3_600_000_000) % 24
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(x), np.int64)),
                "_n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )

    cols = ("_n", "sx", "sy", "sxx", "syy", "sxy")
    agg = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in cols],
    )
    n, sx, sy, sxx, syy, sxy = (int(agg[c][0].as_py()) for c in cols)
    mx = float(sx) / float(n)
    my = float(sy) / float(n)
    cxx = float(sxx) / float(n) - mx * mx
    cyy = float(syy) / float(n) - my * my
    cxy = float(sxy) / float(n) - mx * my
    det = cxx * cyy - cxy * cxy

    def dist(batch: pa.Table) -> pa.Table:
        x = _si(batch["value"], 100.0).astype(np.float64)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = ((us // 3_600_000_000) % 24).astype(np.float64)
        dx = x - mx
        dy = y - my
        d2 = (cyy * dx * dx - 2.0 * cxy * dx * dy + cxx * dy * dy) / det
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        top = np.lexsort((eid, -d2))[:20]
        return pa.table(
            {"event_id": pa.array(eid[top]), "d2": pa.array(d2[top])}
        )

    parts = collect_tables(
        ds.map_batches(dist, batch_format="pyarrow", batch_size=None)
    )
    eid = parts["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    d2 = parts["d2"].to_numpy(zero_copy_only=False)
    top = np.lexsort((eid, -d2))[:20]
    return pa.table(
        {
            "event_id": pa.array(eid[top]),
            "d2": round_like_sql(d2[top], 6),
        }
    )


def _q_rendezvous_hashing(sf_dir: str) -> pa.Table:
    """Rendezvous (highest-random-weight) assignment of documents to
    16 nodes: node = argmax mix32(doc_id*16 + node, 9) (bijective, so
    tie-free and append-stable -- adding a node remaps only 1/17 of
    keys); per-node count + id checksum via the combiner tier."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    N_NODES = 16
    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = np.stack(
            [mix32(did * N_NODES + nn, 9) for nn in range(N_NODES)]
        )
        node = hv.argmax(axis=0).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node),
                "_one": pa.array(np.ones(len(did), np.int64)),
                "doc_id": pa.array(did),
            }
        )

    out = hash_aggregate(
        ds.map_batches(assign, batch_format="pyarrow", batch_size=None),
        ["node"],
        [("_one", "sum", "n_docs"), ("doc_id", "sum", "id_sum")],
    )
    return out.sort_by("node")


def _q_merkle_checksums(sf_dir: str) -> pa.Table:
    """Merkle partition-verification tree over the document corpus:
    16 leaf buckets (doc_id % 16) whose order-free checksums are exact
    int64 sums of mix32(doc_id*1000003 + n_chars, 5); parents hash
    (left*31 + right) up 4 levels to the root -- the anti-entropy /
    replica-diff primitive for 100-TB shard verification.  All
    integer, SQL-mirrored level by level."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def leaf(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "idx": pa.array(did % 16),
                "h": pa.array(mix32(did * 1000003 + nc, 5)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(leaf, batch_format="pyarrow", batch_size=None),
        ["idx"],
        [("h", "sum", "h")],
    )
    ix = agg["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    hv = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    level = np.zeros(16, np.int64)
    level[ix] = hv
    out_lvl, out_idx, out_h = [], [], []
    lv = 0
    cur = level
    while True:
        for i, h in enumerate(cur):
            out_lvl.append(lv)
            out_idx.append(i)
            out_h.append(int(h))
        if len(cur) == 1:
            break
        nxt = mix32(cur[0::2] * 31 + cur[1::2], lv + 1)
        cur = nxt
        lv += 1
    return pa.table(
        {
            "level": pa.array(out_lvl, pa.int64()),
            "idx": pa.array(out_idx, pa.int64()),
            "hash": pa.array(out_h, pa.int64()),
        }
    )


def _q_anderson_darling(sf_dir: str) -> pa.Table:
    """Anderson-Darling uniformity test of hour-of-day per event type
    (midpoint CDF F = (h+0.5)/24 on the 24 bins): the (2i-1) rank
    weights collapse per bin to the exact integer identities
    b^2-(a-1)^2 / (n+1-a)^2-(n-b)^2, the two ln-CDF terms are
    1e6-quantized, so the whole sum is int64-exact and only the final
    A2 = -n - S/1e6/n is float."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "h": pa.array((us // 3_600_000_000) % 24),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "h"],
        [("_one", "sum", "c")],
    ).sort_by([("event_type", "ascending"), ("h", "ascending")])
    et = np.asarray(agg["event_type"].to_numpy(zero_copy_only=False))
    hh = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(np.unique(et).tolist())
    out_t, out_n, out_a2 = [], [], []
    for t in types:
        m = et == t
        h = hh[m]
        c = cc[m]
        n = int(c.sum())
        b = np.cumsum(c)
        a = b - c + 1
        w1 = b * b - (a - 1) * (a - 1)
        w2 = (n + 1 - a) ** 2 - (n - b) ** 2
        f = (h.astype(np.float64) + 0.5) / 24.0
        q1 = round_half_away(np.log(f) * 1e6).astype(np.int64)
        q2 = round_half_away(np.log(1.0 - f) * 1e6).astype(np.int64)
        s = int((w1 * q1 + w2 * q2).sum())
        a2 = -float(n) - (float(s) / 1e6) / float(n)
        out_t.append(t)
        out_n.append(n)
        out_a2.append(a2)
    return pa.table(
        {
            "event_type": pa.array(out_t),
            "n": pa.array(out_n, pa.int64()),
            "a2": round_like_sql(out_a2, 6),
        }
    )


def _q_cuped_adjust(sf_dir: str) -> pa.Table:
    """CUPED variance-reduced A/B readout: per-user pre-metric
    x = click count, outcome y = purchase cents, arms by
    mix32(user_id, 13) % 2; theta = cov(x,y)/var(x) from pooled exact
    int64 moments, per-arm adjusted mean = (Sy - theta*(Sx - n*mux))/n
    and the variance-reduction factor 1 - rho^2 -- every float a
    pinned shared expression over integers.  The per-user rollup runs
    through the distributed-combine shuffle tier (corpus never lands
    on the driver); the per-arm moment pass is a second combiner."""
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
        columns=["user_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_numpy(zero_copy_only=False))
        cents = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "x": pa.array((et == "click").astype(np.int64)),
                "y": pa.array(
                    np.where(et == "purchase", cents, 0).astype(np.int64)
                ),
            }
        )

    per_user = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("x", "sum", "x"), ("y", "sum", "y")],
        distributed_combine=True,
    )

    def moments(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "arm": pa.array(mix32(uid, 13) % 2),
                "_n": pa.array(np.ones(len(uid), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )

    cols = ("_n", "sx", "sy", "sxx", "syy", "sxy")
    agg = hash_aggregate(
        per_user.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["arm"],
        [(c, "sum", c) for c in cols],
    ).sort_by("arm")
    arm = agg["arm"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = {c: agg[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols}
    n = int(vals["_n"].sum())
    sx, sy = int(vals["sx"].sum()), int(vals["sy"].sum())
    sxx, syy = int(vals["sxx"].sum()), int(vals["syy"].sum())
    sxy = int(vals["sxy"].sum())
    mux = float(sx) / float(n)
    muy = float(sy) / float(n)
    varx = float(sxx) / float(n) - mux * mux
    vary = float(syy) / float(n) - muy * muy
    covxy = float(sxy) / float(n) - mux * muy
    theta = covxy / varx
    var_ratio = 1.0 - (covxy * covxy) / (varx * vary)
    out_rows = []
    for i in range(len(arm)):
        na = int(vals["_n"][i])
        sxa = int(vals["sx"][i])
        sya = int(vals["sy"][i])
        mean_y = float(sya) / float(na)
        mean_adj = (float(sya) - theta * (float(sxa) - float(na) * mux)) / float(na)
        out_rows.append((int(arm[i]), na, mean_y, mean_adj))
    return pa.table(
        {
            "arm": pa.array([r[0] for r in out_rows], pa.int64()),
            "n_users": pa.array([r[1] for r in out_rows], pa.int64()),
            "mean_y": round_like_sql([r[2] for r in out_rows], 6),
            "mean_adj": round_like_sql([r[3] for r in out_rows], 6),
            "theta": round_like_sql([theta] * len(out_rows), 6),
            "var_ratio": round_like_sql([var_ratio] * len(out_rows), 6),
        }
    )


def _q_gumbel_daily_max(sf_dir: str) -> pa.Table:
    """Gumbel (EV-I) fit to daily maximum purchase cents by the method
    of moments (scale = s*sqrt(6)/pi, loc = mean - gamma*scale): the
    daily-max table is calendar-bounded, its moments exact int64, and
    the return-level / exceedance tail is one shared float chain."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    EPOCH = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    DAY = 86_400_000_000
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_numpy(zero_copy_only=False))
        keep = et == "purchase"
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        cents = scaled_int(batch["value"], 100.0)[keep]
        return pa.table(
            {
                "day": pa.array((us - EPOCH) // DAY),
                "c": pa.array(cents),
            }
        )

    daily = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("c", "max", "mx")],
    )
    mx = daily["mx"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(mx)
    s1 = int(mx.sum())
    s2 = int((mx * mx).sum())
    mean = float(s1) / float(n)
    var = float(s2) / float(n) - mean * mean
    EULER = 0.5772156649015329
    scale = np.sqrt(var) * np.sqrt(6.0) / np.pi
    loc = mean - EULER * scale
    # 100-day return level: loc - scale * ln(-ln(1 - 1/100))
    ret100 = loc - scale * np.log(-np.log(1.0 - 1.0 / 100.0))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "loc": round_like_sql([float(loc)], 6),
            "scale": round_like_sql([float(scale)], 6),
            "ret100": round_like_sql([float(ret100)], 6),
        }
    )


def _q_wasserstein_hours(sf_dir: str) -> pa.Table:
    """Wasserstein-1 (earth mover) distance between the hour-of-day
    distributions of every event-type pair: on the 24-bin discrete
    line W1 = sum_h |CDF_a - CDF_b|, and clearing denominators makes
    the numerator sum_h |cumA*nB - cumB*nA| an EXACT int64 -- only the
    final division is float.  Distributed per-(type, hour) counts; the
    pair table is lattice-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "h": pa.array((us // 3_600_000_000) % 24),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "h"],
        [("_one", "sum", "n")],
    )
    et = np.asarray(agg["event_type"].to_numpy(zero_copy_only=False))
    hh = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(np.unique(et).tolist())
    cum = {}
    tot = {}
    for t in types:
        m = et == t
        dense = np.zeros(24, np.int64)
        dense[hh[m]] = nn[m]
        cum[t] = np.cumsum(dense)
        tot[t] = int(dense.sum())
    ta, tb, num, w1 = [], [], [], []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = types[i], types[j]
            s = int(np.abs(cum[a] * tot[b] - cum[b] * tot[a]).sum())
            ta.append(a)
            tb.append(b)
            num.append(s)
            w1.append(float(s) / (float(tot[a]) * float(tot[b])))
    return pa.table(
        {
            "type_a": pa.array(ta),
            "type_b": pa.array(tb),
            "w1_num": pa.array(num, pa.int64()),
            "w1": round_like_sql(w1, 6),
        }
    )


def _q_ndcg_at_10(sf_dir: str) -> pa.Table:
    """nDCG@10 per language for the ranking "n_chars DESC, doc_id"
    against the deterministic graded relevance rel = n_chars % 3:
    per-position gain terms (2^rel - 1)/log2(i+1) quantized at 1e9 so
    DCG and ideal-DCG are exact int64 sums; the ranking's top-10 rows
    come from per-block partial top-k merges, the ideal ordering only
    needs the per-(lang, rel) counts -- a bounded aggregate."""
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
            m = np.nonzero(lang == lv)[0]
            order = np.lexsort((did[m], -nc[m]))[:10]
            keep.extend(m[order].tolist())
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
    rel_counts = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "rel": pa.array(
                        b["n_chars"].to_numpy(zero_copy_only=False) % 3
                    ),
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["lang", "rel"],
        [("_one", "sum", "n")],
    )
    lang_t = np.asarray(tops["lang"].to_numpy(zero_copy_only=False))
    did_t = tops["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc_t = tops["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    rl = np.asarray(rel_counts["lang"].to_numpy(zero_copy_only=False))
    rr = rel_counts["rel"].to_numpy(zero_copy_only=False).astype(np.int64)
    rn = rel_counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    def term(rel: int, i: int) -> int:
        g = float(2 ** rel - 1) / (np.log(float(i + 1)) / np.log(2.0))
        return int(round_half_away(np.array([g * 1e9]))[0])

    langs = sorted(np.unique(lang_t).tolist())
    out_l, out_d, out_i, out_n = [], [], [], []
    for lv in langs:
        m = np.nonzero(lang_t == lv)[0]
        order = np.lexsort((did_t[m], -nc_t[m]))[:10]
        rels = (nc_t[m][order] % 3).tolist()
        dq = sum(term(int(r), i + 1) for i, r in enumerate(rels))
        cm = rl == lv
        ideal = []
        for rv in (2, 1, 0):
            cnt = int(rn[cm][rr[cm] == rv].sum()) if cm.any() else 0
            ideal.extend([rv] * cnt)
        ideal = ideal[:10]
        iq = sum(term(int(r), i + 1) for i, r in enumerate(ideal))
        out_l.append(lv)
        out_d.append(dq)
        out_i.append(iq)
        out_n.append(float(dq) / float(iq))
    return pa.table(
        {
            "lang": pa.array(out_l),
            "dcg_q": pa.array(out_d, pa.int64()),
            "idcg_q": pa.array(out_i, pa.int64()),
            "ndcg": round_like_sql(out_n, 6),
        }
    )


def _q_ktruss_peel(sf_dir: str) -> pa.Table:
    """4-truss peeling of the edit-1 word graph, SIX pinned rounds
    (drop edges with triangle support < 2, recompute): the
    distributed tier is the deletion-blocked edit-1 pair join; the
    peel iterations run on the vocabulary-bounded edge list with
    exact integer supports, mirrored round-for-round by chained
    MATERIALIZED CTEs in SQL.  Output: surviving edges with in-
    subgraph support plus the converged flag (round-5 == round-6)."""
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
    edges = sorted(
        {(a, b) for a, b in zip(pairs["w1"].to_pylist(),
                                pairs["w2"].to_pylist())}
    )
    sizes = []
    for _ in range(6):
        sizes.append(len(edges))
        adj: dict[str, set[str]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        edges = [
            (a, b) for a, b in edges if len(adj[a] & adj[b]) >= 2
        ]
    converged = int(len(edges) == sizes[-1])
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return pa.table(
        {
            "w1": pa.array([a for a, _ in edges]),
            "w2": pa.array([b for _, b in edges]),
            "support": pa.array(
                [len(adj[a] & adj[b]) for a, b in edges], pa.int64()
            ),
            "converged": pa.array([converged] * len(edges), pa.int64()),
        }
    )


def _q_simpson_slopes(sf_dir: str) -> pa.Table:
    """Simpson's-paradox screen: the discount -> extended-price OLS
    slope overall vs within each returnflag group, every moment an
    exact int64 and the slope-numerator SIGN compared on integers
    (the paradox flag is float-free).  Output: one row per group plus
    'ALL', with slope and integer sign."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_discount", "l_extendedprice"],
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = round_half_away(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 10000.0
        ).astype(np.int64)
        y = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "grp": batch["l_returnflag"],
                "_n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
            }
        )

    cols = ("_n", "sx", "sy", "sxx", "sxy")
    agg = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["grp"],
        [(c, "sum", c) for c in cols],
    ).sort_by("grp")
    grp = agg["grp"].to_pylist()
    v = {c: agg[c].to_numpy(zero_copy_only=False).astype(np.int64)
         for c in cols}
    rows = []
    for i in range(len(grp)):
        n, sx, sy, sxx, sxy = (int(v[c][i]) for c in cols)
        rows.append((grp[i], n, sx, sy, sxx, sxy))
    tot = ("ALL",) + tuple(
        sum(r[k] for r in rows) for k in range(1, 6)
    )
    rows.append(tot)
    out_g, out_n, out_s, out_sign = [], [], [], []
    for g, n, sx, sy, sxx, sxy in rows:
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        out_g.append(g)
        out_n.append(n)
        out_s.append(float(num) / float(den))
        out_sign.append(int(np.sign(num)))
    return pa.table(
        {
            "grp": pa.array(out_g),
            "n_rows": pa.array(out_n, pa.int64()),
            "slope": round_like_sql(out_s, 6),
            "sign_num": pa.array(out_sign, pa.int64()),
        }
    )


def _q_bbox_pip_fpr(sf_dir: str) -> pa.Table:
    """Join-pruning audit: for each polygon, valid grid points passing
    the bbox prefilter vs the exact half-plane PIP test, and the
    false-positive rate the bbox stage forwards -- the measurement
    behind sizing the two-stage spatial join.  One vectorized partial
    pass computes both masks per polygon; counts are exact int64."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    pts = _og_points_ds(valid_only=True)
    polys = sorted(OG_POLYGONS.items())

    def masks(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pid_l, nb_l, np_l = [], [], []
        for pid, poly in polys:
            xs = [p[0] for p in poly]
            ys = [p[1] for p in poly]
            in_b = (
                (lon >= min(xs)) & (lon <= max(xs))
                & (lat >= min(ys)) & (lat <= max(ys))
            )
            in_p = np.ones(len(lon), bool)
            n = len(poly)
            for i in range(n):
                ax, ay = poly[i]
                bx, by = poly[(i + 1) % n]
                in_p &= (
                    (bx - ax) * (lat - ay) - (by - ay) * (lon - ax) > 0
                )
            pid_l.append(pid)
            nb_l.append(int(in_b.sum()))
            np_l.append(int(in_p.sum()))
        return pa.table(
            {
                "polygon_id": pa.array(pid_l),
                "n_bbox": pa.array(nb_l, pa.int64()),
                "n_pip": pa.array(np_l, pa.int64()),
            }
        )

    agg = hash_aggregate(
        pts.map_batches(masks, batch_format="pyarrow", batch_size=None),
        ["polygon_id"],
        [("n_bbox", "sum", "n_bbox"), ("n_pip", "sum", "n_pip")],
    ).sort_by("polygon_id")
    nb = agg["n_bbox"].to_numpy(zero_copy_only=False).astype(np.int64)
    npp = agg["n_pip"].to_numpy(zero_copy_only=False).astype(np.int64)
    fpr = [
        0.0 if b == 0 else float(b - p) / float(b)
        for b, p in zip(nb.tolist(), npp.tolist())
    ]
    return pa.table(
        {
            "polygon_id": agg["polygon_id"],
            "n_bbox": pa.array(nb),
            "n_pip": pa.array(npp),
            "fpr": round_like_sql(fpr, 6),
        }
    )


def _q_psi_drift(sf_dir: str) -> pa.Table:
    """Population stability index of purchase cents between the first
    month (< 2024-02-01) and the rest: 10 bins from the first
    period's exact deciles (quantile_disc convention, derived from
    the distributed value-count table), +1 Laplace smoothing, per-bin
    (p2-p1)ln(p2/p1) terms quantized at 1e12 -- the model-monitoring
    drift screen.  Output: per-bin counts + the shared PSI."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    SPLIT = np.datetime64("2024-02-01T00:00:00", "us").astype(np.int64)
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_numpy(zero_copy_only=False))
        keep = et == "purchase"
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        c = scaled_int(batch["value"], 100.0)[keep]
        return pa.table(
            {
                "c": pa.array(c),
                "p": pa.array((us >= SPLIT).astype(np.int64)),
                "_one": pa.array(np.ones(len(c), np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c", "p"],
        [("_one", "sum", "n")],
    ).sort_by([("c", "ascending")])
    cv = counts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    pv = counts["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    m0 = pv == 0
    v0, n0 = cv[m0], nv[m0]
    n_first = int(n0.sum())
    cum = np.cumsum(n0)
    edges = []
    for q in [x / 10.0 for x in range(1, 10)]:
        rank = int(np.ceil(q * n_first))
        edges.append(int(v0[np.searchsorted(cum, rank)]))
    edges_a = np.array(edges, np.int64)
    b1 = np.zeros(10, np.int64)
    b2 = np.zeros(10, np.int64)
    for c, p, n in zip(cv.tolist(), pv.tolist(), nv.tolist()):
        b = int((c > edges_a).sum())
        if p == 0:
            b1[b] += n
        else:
            b2[b] += n
    n1, n2 = int(b1.sum()), int(b2.sum())
    qsum = 0
    for i in range(10):
        p1 = (float(b1[i]) + 1.0) / (float(n1) + 10.0)
        p2 = (float(b2[i]) + 1.0) / (float(n2) + 10.0)
        term = (p2 - p1) * np.log(p2 / p1)
        qsum += int(round_half_away(np.array([term * 1e12]))[0])
    psi = float(qsum) / 1e12
    return pa.table(
        {
            "bin": pa.array(list(range(10)), pa.int64()),
            "n_first": pa.array(b1),
            "n_second": pa.array(b2),
            "psi": round_like_sql([psi] * 10, 6),
        }
    )


def _q_elasticity_loglog(sf_dir: str) -> pa.Table:
    """Log-log price elasticity: OLS of ln(quantity) on
    ln(extendedprice) with both logs quantized at 1e4 so every
    regression moment is an exact int64 (documented quantization --
    the standard fixed-point dodge around float-sum ordering); the
    slope/intercept chain uses arbitrary-precision integers engine-
    side and HUGEINT in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        qn = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pr = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        lx = round_half_away(np.log(pr) * 1e4).astype(np.int64)
        ly = round_half_away(np.log(qn) * 1e4).astype(np.int64)
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(lx), np.int64)),
                "_n": pa.array(np.ones(len(lx), np.int64)),
                "sx": pa.array(lx),
                "sy": pa.array(ly),
                "sxx": pa.array(lx * lx),
                "sxy": pa.array(lx * ly),
            }
        )

    cols = ("_n", "sx", "sy", "sxx", "sxy")
    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in cols],
    )
    n, sx, sy, sxx, sxy = (int(agg[c][0].as_py()) for c in cols)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n) / 1e4
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "elasticity": round_like_sql([slope], 6),
            "intercept": round_like_sql([intercept], 6),
        }
    )


def _q_moran_correlogram(sf_dir: str) -> pa.Table:
    """Spatial correlogram: Moran's I of the 96x96 event-count lattice
    at Chebyshev ring distances 1-3 (distance-binned weights): the
    pair cross-sums S_xy / S_a / S_b / W are exact int64 via offset
    shifts over the dense zero-filled lattice, and I_d is one pinned
    float chain -- the range-of-autocorrelation diagnostic above
    morans_i's single lag."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def gridcell(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "gx": pa.array((eid % 96).astype(np.int64)),
                "gy": pa.array(((eid // 96) % 96).astype(np.int64)),
            }
        )

    counts = partial_count(
        ds.map_batches(gridcell, batch_format="pyarrow", batch_size=None),
        ["gx", "gy"],
    ).rename_columns(["gx", "gy", "n"])
    x = np.zeros((96, 96), np.int64)
    gx = counts["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
    gy = counts["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    x[gy, gx] = nn
    n = 96 * 96
    s = int(x.sum())
    q = int((x * x).sum())
    mu = float(s) / float(n)
    out_d, out_w, out_i = [], [], []
    for d in (1, 2, 3):
        sxy = 0
        sa = 0
        sb = 0
        w = 0
        for di in range(-d, d + 1):
            for dj in range(-d, d + 1):
                if max(abs(di), abs(dj)) != d:
                    continue
                a = x[
                    max(0, -di): 96 - max(0, di),
                    max(0, -dj): 96 - max(0, dj),
                ]
                b = x[
                    max(0, di): 96 - max(0, -di),
                    max(0, dj): 96 - max(0, -dj),
                ]
                sxy += int((a * b).sum())
                sa += int(a.sum())
                sb += int(b.sum())
                w += a.size
        num = (
            float(sxy) - mu * float(sa) - mu * float(sb)
            + float(w) * mu * mu
        )
        den = float(q) - 2.0 * mu * float(s) + float(n) * mu * mu
        out_d.append(d)
        out_w.append(w)
        out_i.append((float(n) / float(w)) * (num / den))
    return pa.table(
        {
            "d": pa.array(out_d, pa.int64()),
            "w_pairs": pa.array(out_w, pa.int64()),
            "moran_i": round_like_sql(out_i, 6),
        }
    )


def _q_percolation_screen(sf_dir: str) -> pa.Table:
    """Percolation screen of the raster at thresholds 20/30/40: can a
    4-connected path of cells with z >= T cross from the top row to
    the bottom?  Seeded BFS reachability (linear in the reached set,
    not the quadratic all-pairs closure) over the lattice-bounded
    valid grid; output n_cells / n_reached / spans per threshold."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    pts = collect_tables(_og_points_ds(valid_only=True))
    pix = pts["pix"].to_numpy(zero_copy_only=False).astype(np.int64)
    z = pts["z"].to_numpy(zero_copy_only=False)
    row = pix // OG_W
    col = pix % OG_W
    out_t, out_c, out_r, out_s = [], [], [], []
    for t in (20.0, 30.0, 40.0):
        keep = z >= t
        mask = np.zeros((96, 96), bool)
        mask[row[keep], col[keep]] = True
        reached = np.zeros((96, 96), bool)
        stack = [(0, int(c)) for c in np.nonzero(mask[0])[0]]
        for p in stack:
            reached[p] = True
        while stack:
            r0, c0 = stack.pop()
            for rr, cc in (
                (r0 - 1, c0), (r0 + 1, c0), (r0, c0 - 1), (r0, c0 + 1)
            ):
                if (
                    0 <= rr < 96 and 0 <= cc < 96
                    and mask[rr, cc] and not reached[rr, cc]
                ):
                    reached[rr, cc] = True
                    stack.append((rr, cc))
        out_t.append(t)
        out_c.append(int(mask.sum()))
        out_r.append(int(reached.sum()))
        out_s.append(int(reached[95].any()))
    return pa.table(
        {
            "threshold": pa.array(out_t, pa.float64()),
            "n_cells": pa.array(out_c, pa.int64()),
            "n_reached": pa.array(out_r, pa.int64()),
            "spans": pa.array(out_s, pa.int64()),
        }
    )


def _q_graph_diameter(sf_dir: str) -> pa.Table:
    """Diameter / radius / peripheral-node count of the edit-1 word
    graph over finite-distance ordered pairs: the distributed tier is
    the deletion-blocked pair join; BFS from every vocabulary node is
    vocabulary-bounded.  Mirrors a bounded-depth recursive min-hop
    closure in SQL."""
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
    adj: dict[str, set[str]] = {}
    for a, b in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ecc = {}
    n_pairs = 0
    for src in sorted(adj):
        dist = {src: 0}
        frontier = [src]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        finite = [d for w, d in dist.items() if w != src]
        n_pairs += len(finite)
        if finite:
            ecc[src] = max(finite)
    diameter = max(ecc.values())
    radius = min(ecc.values())
    peripheral = sum(1 for e in ecc.values() if e == diameter)
    return pa.table(
        {
            "diameter": pa.array([diameter], pa.int64()),
            "radius": pa.array([radius], pa.int64()),
            "n_peripheral": pa.array([peripheral], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
        }
    )


def _distinct_day_user(sf_dir: str) -> pa.Table:
    """Shared helper: distinct (epoch_day, user_id) activity pairs via
    per-block Arrow dedup partials + one grouped combine (bounded by
    days x active users, far under the raw event count)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        days = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .view("int64")
        )
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(days),
                "user_id": pa.array(uid),
                "_one": pa.array(np.ones(len(days), np.int64)),
            }
        )

    return hash_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["day", "user_id"],
        [("_one", "sum", "n")],
    )


def _q_dau_mau_stickiness(sf_dir: str) -> pa.Table:
    """Product-analytics stickiness per calendar month: sum of daily
    distinct users / (active days x monthly distinct users), all three
    operands exact int64 from the distinct (day, user) pair table --
    one float division at the end, ROUND(..., 6) shared with SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )

    du = _distinct_day_user(sf_dir)
    days = du["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    uid = du["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    months = days.astype("datetime64[D]").astype("datetime64[M]").view("int64")
    ym = (1970 + months // 12) * 100 + (months % 12 + 1)
    out_ym, dau_sum, n_days, mau, stick = [], [], [], [], []
    for m in np.unique(ym):
        sel = ym == m
        ds_ = int(sel.sum())  # distinct (day,user) pairs = sum of DAUs
        nd = int(np.unique(days[sel]).size)
        mu = int(np.unique(uid[sel]).size)
        out_ym.append(int(m))
        dau_sum.append(ds_)
        n_days.append(nd)
        mau.append(mu)
        stick.append(float(ds_) / (float(nd * mu)))
    return pa.table(
        {
            "ym": pa.array(out_ym, pa.int64()),
            "dau_sum": pa.array(dau_sum, pa.int64()),
            "n_days": pa.array(n_days, pa.int64()),
            "mau": pa.array(mau, pa.int64()),
            "stickiness": round_like_sql(stick, 6),
        }
    )


def _q_power_user_curve(sf_dir: str) -> pa.Table:
    """Power-user curve: histogram of distinct active days per user
    (the engagement L-ness curve) -- exact integer counts end-to-end."""
    du = _distinct_day_user(sf_dir)
    uid = du["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    _, per_user = np.unique(uid, return_counts=True)
    vals, cnts = np.unique(per_user, return_counts=True)
    return pa.table(
        {
            "n_active_days": pa.array(vals.astype(np.int64)),
            "n_users": pa.array(cnts.astype(np.int64)),
        }
    )


def _q_borda_count(sf_dir: str) -> pa.Table:
    """Borda rank aggregation over nations across three metrics
    (customer-balance cents, customer count, supplier-balance cents):
    each metric contributes (n_nations - row_number) points with
    deterministic nationkey tie-break -- consensus ranking with exact
    integer scores."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    nat = _read_pq(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).take_all()
    nkey = np.array([r["n_nationkey"] for r in nat], np.int64)
    nname = [r["n_name"] for r in nat]
    order_k = np.argsort(nkey)
    nkey = nkey[order_k]
    nname = [nname[i] for i in order_k]
    n = len(nkey)

    cust = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_nationkey", "c_acctbal"],
    )

    def cprep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch["c_nationkey"].cast(pa.int64()),
                "cents": pa.array(scaled_int(batch["c_acctbal"], 100.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    ct = hash_aggregate(
        cust.map_batches(cprep, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("cents", "sum", "bal"), ("_one", "sum", "ncust")],
    )
    supp = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_nationkey", "s_acctbal"],
    )
    st = hash_aggregate(
        supp.map_batches(
            lambda b: pa.table(
                {
                    "k": b["s_nationkey"].cast(pa.int64()),
                    "cents": pa.array(scaled_int(b["s_acctbal"], 100.0)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["k"],
        [("cents", "sum", "bal")],
    )

    def metric_vec(tbl: pa.Table, col: str) -> np.ndarray:
        v = np.zeros(n, np.int64)
        kk = tbl["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(nkey, kk)
        v[pos] = vv
        return v

    metrics = [
        metric_vec(ct, "bal"),
        metric_vec(ct, "ncust"),
        metric_vec(st, "bal"),
    ]
    score = np.zeros(n, np.int64)
    for mv in metrics:
        rownum = np.empty(n, np.int64)
        order = np.lexsort((nkey, -mv))
        rownum[order] = np.arange(1, n + 1)
        score += np.int64(n) - rownum
    return pa.table(
        {
            "n_name": pa.array(nname),
            "borda_score": pa.array(score),
        }
    )


def _q_mrr_first_relevant(sf_dir: str) -> pa.Table:
    """Reciprocal rank of the first relevant document (rel = n_chars %
    3 == 2) per language under the ranking n_chars DESC, doc_id ASC:
    per-block best-relevant candidates merge on the driver, then one
    exact counting pass ranks the winner (rank = 1 + docs strictly
    ahead) -- no global sort."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def best_rel(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_numpy(zero_copy_only=False))
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        rel = nc % 3 == 2
        keep = []
        for lv in np.unique(lang[rel]):
            m = np.nonzero(rel & (lang == lv))[0]
            order = np.lexsort((did[m], -nc[m]))
            keep.append(m[order[0]])
        keep = np.array(keep, np.int64)
        return pa.table(
            {
                "lang": pa.array(lang[keep]),
                "doc_id": pa.array(did[keep]),
                "n_chars": pa.array(nc[keep]),
            }
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    cands = collect_tables(
        ds.map_batches(best_rel, batch_format="pyarrow", batch_size=None)
    )
    cl = np.asarray(cands["lang"].to_numpy(zero_copy_only=False))
    cd = cands["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cands["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    winners: dict[str, tuple[int, int]] = {}
    for lv in np.unique(cl):
        m = np.nonzero(cl == lv)[0]
        order = np.lexsort((cd[m], -cn[m]))
        i = m[order[0]]
        winners[str(lv)] = (int(cn[i]), int(cd[i]))
    win_items = sorted(winners.items())
    wl = [k for k, _ in win_items]
    wn = np.array([v[0] for _, v in win_items], np.int64)
    wd = np.array([v[1] for _, v in win_items], np.int64)

    def count_ahead(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_numpy(zero_copy_only=False))
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_c = [], []
        for j, lv in enumerate(wl):
            m = lang == lv
            ahead = (nc[m] > wn[j]) | ((nc[m] == wn[j]) & (did[m] < wd[j]))
            out_l.append(lv)
            out_c.append(int(ahead.sum()))
        return pa.table(
            {
                "lang": pa.array(out_l),
                "ahead": pa.array(out_c, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(count_ahead, batch_format="pyarrow", batch_size=None),
        ["lang"],
        [("ahead", "sum", "ahead")],
    )
    al = np.asarray(agg["lang"].to_numpy(zero_copy_only=False))
    av = agg["ahead"].to_numpy(zero_copy_only=False).astype(np.int64)
    ranks = []
    for lv in wl:
        ranks.append(1 + int(av[al == lv][0]))
    ranks_a = np.array(ranks, np.int64)
    return pa.table(
        {
            "lang": pa.array(wl),
            "first_rel_rank": pa.array(ranks_a),
            "rr": round_like_sql(1.0 / ranks_a.astype(np.float64), 9),
        }
    )


def _q_mood_median(sf_dir: str) -> pa.Table:
    """Mood's median test across event types: grand median of exact
    value cents from the distributed value-count table (quantile_disc
    convention), 2xk above/at-or-below contingency counts, Pearson
    chi-square with per-cell terms quantized at 1e12 (shared float
    expression with SQL)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    counts = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "t": b["event_type"],
                    "c": pa.array(scaled_int(b["value"], 100.0)),
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["t", "c"],
        [("_one", "sum", "n")],
    ).sort_by([("c", "ascending")])
    tv = np.asarray(counts["t"].to_numpy(zero_copy_only=False))
    cv = counts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    ntot = int(nv.sum())
    cum = np.cumsum(nv)
    rank = int(np.ceil(0.5 * ntot))
    med = int(cv[np.searchsorted(cum, rank)])
    types = sorted(np.unique(tv).tolist())
    na = np.array(
        [int(nv[(tv == t) & (cv > med)].sum()) for t in types], np.int64
    )
    nb = np.array(
        [int(nv[(tv == t) & (cv <= med)].sum()) for t in types], np.int64
    )
    ta, tb = int(na.sum()), int(nb.sum())
    qsum = 0
    for i in range(len(types)):
        row = int(na[i] + nb[i])
        ea = float(row * ta) / float(ta + tb)
        eb = float(row * tb) / float(ta + tb)
        qsum += int(
            round_half_away(np.array([(na[i] - ea) * (na[i] - ea) / ea * 1e12]))[0]
        )
        qsum += int(
            round_half_away(np.array([(nb[i] - eb) * (nb[i] - eb) / eb * 1e12]))[0]
        )
    chi2 = float(qsum) / 1e12
    return pa.table(
        {
            "event_type": pa.array(types),
            "n_above": pa.array(na),
            "n_below_eq": pa.array(nb),
            "chi2": round_like_sql([chi2] * len(types), 6),
        }
    )


def _q_sign_test(sf_dir: str) -> pa.Table:
    """Per-user sign test of consecutive value steps
    (stages/window.py::keyed_sign_test): distribution-free trend
    screen, exact cent diffs, one keyed shuffle."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_sign_test,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    return collect_tables(keyed_sign_test(ds))
