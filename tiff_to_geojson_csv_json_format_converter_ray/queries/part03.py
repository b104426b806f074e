"""Query implementations, part 03 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: roc_auc, calibration_bins, lbp_histogram, glcm_texture, average_precision, lift_at_decile, binseg_changepoint, qq_slope, raster_entropy, markov_top1_accuracy, intrinsic_dim, promo_revenue_share, ship_delay_histogram, rusle_ls, rich_club, dasymetric_alloc, location_quotient, degree_assortativity, word_burstiness, emerging_hotspots, dickey_fuller, simplified_silhouette, ols_two_var, simpson_diversity, voronoi_assign, kwic_contexts, vocab_overlap, keyness_terms, terrain_openness, linear_attribution, heaps_law, hurst_exponent, markov_entropy_rate, t_closeness, levene_bf, twi, clark_evans, nn_gfunction, gravity_flows, jarque_bera ...
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
    OG_KNN_PROBES,
    OG_NODATA,
    OG_POLYGONS,
    OG_TILE,
    OG_W,
    _og_multiband_tiles_table,
    _og_points_ds,
    _og_tiles_table,
    _read_pq,
)


def _q_roc_auc(sf_dir: str) -> pa.Table:
    """ROC AUC of band 2 as a score predicting band 1's high-value
    mask (the Mann-Whitney identity with tie-averaged ranks): the
    bounded deci-value domain gives exact per-value (positives,
    total) counts distributed, and AUC = (R2_pos - n1*(n1+1)) /
    (2*n1*n0) with R2 the integer doubled rank sum -- bit-exact."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def per_value(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        vs, pos, tot = [], [], []
        acc: dict[int, list[int]] = {}
        for key, bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            v1, v2 = bands[1], bands[2]
            ok = (v1 > -1e30) & (v2 > -1e30)
            k1 = round_half_away(
                v1[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            k2 = round_half_away(
                v2[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            lab = (k1 > 250).astype(np.int64)
            for v, l_ in zip(k2.tolist(), lab.tolist()):
                e = acc.setdefault(v, [0, 0])
                e[0] += l_
                e[1] += 1
        for v, (p, t) in acc.items():
            vs.append(v)
            pos.append(p)
            tot.append(t)
        return pa.table(
            {
                "score": pa.array(vs, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "tot": pa.array(tot, pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(per_value, batch_format="pyarrow", batch_size=None),
        ["score"],
        [("pos", "sum", "pos"), ("tot", "sum", "tot")],
    )
    order = np.argsort(agg["score"].to_numpy(zero_copy_only=False))
    pos = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    tot = agg["tot"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    cum_lt = np.concatenate([[0], np.cumsum(tot)[:-1]])
    # doubled tie-averaged rank of value v: 2*cum_lt + n_eq + 1
    r2 = (2 * cum_lt + tot + 1).astype(np.int64)
    r2_pos = int((r2 * pos).sum())
    n1 = int(pos.sum())
    n0 = int(tot.sum()) - n1
    auc = float(r2_pos - n1 * (n1 + 1)) / float(2 * n1 * n0)
    return pa.table(
        {
            "n_pos": pa.array([n1], pa.int64()),
            "n_neg": pa.array([n0], pa.int64()),
            "auc": round_like_sql([auc], 6),
        }
    )


def _q_calibration_bins(sf_dir: str) -> pa.Table:
    """Reliability-curve bins for band 2's deci score predicting band
    1's high-value mask: decile score bins (k // 50), per bin the
    exact count, mean score (deci units) and positive fraction -- the
    calibration diagnostic next to roc_auc/average_precision.  All
    partials are exact int64 bincounts; two float divisions per bin
    at the end."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def per_bin(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        tot = np.zeros(10, np.int64)
        pos = np.zeros(10, np.int64)
        s_k = np.zeros(10, np.int64)
        for key, bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            v1, v2 = bands[1], bands[2]
            ok = (v1 > -1e30) & (v2 > -1e30)
            k1 = round_half_away(
                v1[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            k2 = round_half_away(
                v2[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            b = k2 // 50
            tot += np.bincount(b, minlength=10).astype(np.int64)
            pos += np.bincount(
                b, weights=(k1 > 250).astype(np.float64), minlength=10
            ).astype(np.int64)
            s_k += np.bincount(
                b, weights=k2.astype(np.float64), minlength=10
            ).astype(np.int64)
        nz = np.flatnonzero(tot)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "tot": pa.array(tot[nz]),
                "pos": pa.array(pos[nz]),
                "s_k": pa.array(s_k[nz]),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(per_bin, batch_format="pyarrow", batch_size=None),
        ["bin"],
        [("tot", "sum", "tot"), ("pos", "sum", "pos"), ("s_k", "sum", "s_k")],
    )
    order = np.argsort(agg["bin"].to_numpy(zero_copy_only=False))
    b = agg["bin"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    tot = agg["tot"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    pos = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    s_k = agg["s_k"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    return pa.table(
        {
            "bin": pa.array(b, pa.int64()),
            "n": pa.array(tot, pa.int64()),
            "mean_score_deci": round_like_sql(
                s_k.astype(np.float64) / tot.astype(np.float64), 6
            ),
            "frac_pos": round_like_sql(
                pos.astype(np.float64) / tot.astype(np.float64), 6
            ),
        }
    )


def _q_lbp_histogram(sf_dir: str) -> pa.Table:
    """Local-binary-pattern texture histogram over the slope-fixture
    raster: interior cells with a fully valid 3x3 window get an 8-bit
    code (bit k set iff neighbor k's value > center, clockwise from
    top-left), counted per code -- the classic texture descriptor.
    Pure integer comparisons on the broadcast DEM; distributed over
    row-chunks of target cells."""
    import ray
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    tiles = _og_tiles_table(sparse_invalid=True)
    z = np.full((OG_H, OG_W), np.float32(OG_NODATA), np.float32)
    for i in range(tiles.num_rows):
        r0 = tiles["row_off"][i].as_py()
        c0 = tiles["col_off"][i].as_py()
        h = tiles["height"][i].as_py()
        w = tiles["width"][i].as_py()
        z[r0 : r0 + h, c0 : c0 + w] = np.asarray(
            tiles["values"][i].as_py(), np.float32
        ).reshape(h, w)
    ref = ray.put(z)
    rows = pa.table(
        {"row": pa.array(np.arange(1, OG_H - 1, dtype=np.int64))}
    )
    # clockwise from top-left: (dr, dc) per bit
    offs = [
        (-1, -1), (-1, 0), (-1, 1), (0, 1),
        (1, 1), (1, 0), (1, -1), (0, -1),
    ]

    def codes(batch: pa.Table) -> pa.Table:
        zg = ray.get(ref)
        out = []
        for r in batch["row"].to_numpy(zero_copy_only=False).tolist():
            center = zg[r, 1:-1]
            ok = center > -1e30
            code = np.zeros(OG_W - 2, np.int64)
            for k, (dr, dc) in enumerate(offs):
                nb = zg[r + dr, 1 + dc : OG_W - 1 + dc]
                ok &= nb > -1e30
                code |= (nb > center).astype(np.int64) << k
            out.append(code[ok])
        allc = np.concatenate(out) if out else np.zeros(0, np.int64)
        return pa.table({"code": pa.array(allc)})

    counts = partial_count(
        ray.data.from_arrow(rows).map_batches(
            codes, batch_format="pyarrow", batch_size=8
        ),
        ["code"],
    ).rename_columns(["code", "n"])
    order = np.argsort(counts["code"].to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "code": counts["code"].take(pa.array(order)),
            "n": counts["n"].take(pa.array(order)).cast(pa.int64()),
        }
    )


def _q_glcm_texture(sf_dir: str) -> pa.Table:
    """GLCM texture summary (horizontal offset 1, 8 gray levels from
    the deci values, symmetric pairs not double-counted): contrast,
    homogeneity and energy from exact integer co-occurrence counts
    (homogeneity terms quantized at 1e9) -- the Haralick features a
    remote-sensing pipeline derives per scene.  Horizontal pairs that
    cross tile boundaries are captured via the 1-pixel halo exchange
    (each pair counted exactly once, attributed to the LEFT pixel's
    owning tile)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        make_emit_halos,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True))

    def pairs(group: pa.Table) -> pa.Table:
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            _assemble_padded, NODATA_THRESHOLD,
        )

        empty = pa.table(
            {
                "li": pa.array([], pa.int64()),
                "lj": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        asm = _assemble_padded(group)
        if asm is None:
            return empty
        pad, h, w, _r0, _c0, _transform = asm
        left = pad[1 : h + 1, 1 : w + 1]
        right = pad[1 : h + 1, 2 : w + 2]
        ok = (
            np.isfinite(left) & (left > NODATA_THRESHOLD)
            & np.isfinite(right) & (right > NODATA_THRESHOLD)
        )
        if not ok.any():
            return empty
        ki = (round_half_away(left[ok] * 10.0).astype(np.int64) * 8) // 500
        kj = (round_half_away(right[ok] * 10.0).astype(np.int64) * 8) // 500
        counts = np.bincount(ki * 8 + kj, minlength=64).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "li": pa.array(nz // 8, pa.int64()),
                "lj": pa.array(nz % 8, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    halos = tiles.map_batches(
        make_emit_halos(None, None), batch_format="pyarrow", batch_size=None
    )
    agg = hash_aggregate(
        halos.groupby("halo_key").map_groups(pairs, batch_format="pyarrow"),
        ["li", "lj"],
        [("n", "sum", "n")],
    )
    li = agg["li"].to_numpy(zero_copy_only=False).astype(np.int64)
    lj = agg["lj"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    ntot = int(n.sum())
    d2 = (li - lj) * (li - lj)
    contrast = float(int((n * d2).sum())) / float(ntot)
    hom_terms = round_half_away(
        n.astype(np.float64) / (1.0 + d2.astype(np.float64)) * 1e9
    ).astype(np.int64)
    homogeneity = float(int(hom_terms.sum())) / 1e9 / float(ntot)
    energy = float(int((n * n).sum())) / (float(ntot) * float(ntot))
    return pa.table(
        {
            "n_pairs": pa.array([ntot], pa.int64()),
            "contrast": round_like_sql([contrast], 6),
            "homogeneity": round_like_sql([homogeneity], 6),
            "energy": round_like_sql([energy], 6),
        }
    )


def _q_average_precision(sf_dir: str) -> pa.Table:
    """Average precision (step interpolation, ties grouped by
    distinct score) of band 2 scoring band 1's high-value mask --
    the PR-curve summary next to roc_auc.  Per-score-group precision
    terms are exact rationals quantized at 1e12; the recall weights
    are integer positive counts."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def per_value(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        acc: dict[int, list[int]] = {}
        for key, bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            v1, v2 = bands[1], bands[2]
            ok = (v1 > -1e30) & (v2 > -1e30)
            k1 = round_half_away(
                v1[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            k2 = round_half_away(
                v2[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            lab = (k1 > 250).astype(np.int64)
            for v, l_ in zip(k2.tolist(), lab.tolist()):
                e = acc.setdefault(v, [0, 0])
                e[0] += l_
                e[1] += 1
        return pa.table(
            {
                "score": pa.array(list(acc), pa.int64()),
                "pos": pa.array([acc[v][0] for v in acc], pa.int64()),
                "tot": pa.array([acc[v][1] for v in acc], pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(per_value, batch_format="pyarrow", batch_size=None),
        ["score"],
        [("pos", "sum", "pos"), ("tot", "sum", "tot")],
    )
    order = np.argsort(
        -agg["score"].to_numpy(zero_copy_only=False)
    )  # descending
    pos = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    tot = agg["tot"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    cum_pos = np.cumsum(pos)
    cum_tot = np.cumsum(tot)
    n1 = int(pos.sum())
    terms = round_half_away(
        cum_pos.astype(np.float64) / cum_tot.astype(np.float64) * 1e12
    ).astype(np.int64)
    s = int((terms * pos).sum())
    ap = float(s) / 1e12 / float(n1)
    return pa.table(
        {
            "n_pos": pa.array([n1], pa.int64()),
            "average_precision": round_like_sql([ap], 6),
        }
    )


def _q_lift_at_decile(sf_dir: str) -> pa.Table:
    """Top-decile lift: positive rate among cells whose band-2 score
    exceeds its 90th percentile (quantile_disc -- an exact order
    statistic), relative to the base rate.  All counts exact; two
    float divisions."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def per_value(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        acc: dict[int, list[int]] = {}
        for key, bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            v1, v2 = bands[1], bands[2]
            ok = (v1 > -1e30) & (v2 > -1e30)
            k1 = round_half_away(
                v1[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            k2 = round_half_away(
                v2[ok].astype(np.float64) * 10.0
            ).astype(np.int64)
            lab = (k1 > 250).astype(np.int64)
            for v, l_ in zip(k2.tolist(), lab.tolist()):
                e = acc.setdefault(v, [0, 0])
                e[0] += l_
                e[1] += 1
        return pa.table(
            {
                "score": pa.array(list(acc), pa.int64()),
                "pos": pa.array([acc[v][0] for v in acc], pa.int64()),
                "tot": pa.array([acc[v][1] for v in acc], pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(per_value, batch_format="pyarrow", batch_size=None),
        ["score"],
        [("pos", "sum", "pos"), ("tot", "sum", "tot")],
    )
    order = np.argsort(agg["score"].to_numpy(zero_copy_only=False))
    sc = agg["score"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    pos = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    tot = agg["tot"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n = int(tot.sum())
    n1 = int(pos.sum())
    # quantile_disc(0.9): value at 0-based sorted index ceil(0.9*n)-1
    import math

    target = math.ceil(0.9 * n) - 1
    cum = np.cumsum(tot)
    thresh = int(sc[np.searchsorted(cum, target + 1)])
    top = sc > thresh
    n_top = int(tot[top].sum())
    p_top = int(pos[top].sum())
    lift = (float(p_top) / float(n_top)) / (float(n1) / float(n))
    return pa.table(
        {
            "threshold_score": pa.array([thresh], pa.int64()),
            "n_top": pa.array([n_top], pa.int64()),
            "pos_top": pa.array([p_top], pa.int64()),
            "lift": round_like_sql([lift], 6),
        }
    )


def _q_binseg_changepoint(sf_dir: str) -> pa.Table:
    """Single-changepoint binary segmentation on the daily event
    series: the split minimizing SSE_left + SSE_right, every SSE from
    exact integer prefix sums (cost quantized at 1e6 so the argmin is
    an integer compare with lowest-day tie-break) -- the first step
    of any changepoint ladder."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xx = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    series = np.zeros(n, np.int64)
    series[dd - lo] = xx
    ps = np.cumsum(series)
    ps2 = np.cumsum(series * series)
    s_tot, q_tot = int(ps[-1]), int(ps2[-1])
    best_t, best_cq = -1, None
    for t in range(1, n):  # left = [0, t), right = [t, n)
        sl, ql = int(ps[t - 1]), int(ps2[t - 1])
        sr, qr = s_tot - sl, q_tot - ql
        cost = (
            (float(ql) - float(sl) * float(sl) / float(t))
            + (float(qr) - float(sr) * float(sr) / float(n - t))
        )
        cq = int(round_half_away(np.array([cost * 1e6]))[0])
        if best_cq is None or cq < best_cq:
            best_cq, best_t = cq, t
    full_cost = float(q_tot) - float(s_tot) * float(s_tot) / float(n)
    return pa.table(
        {
            "split_day_offset": pa.array([best_t], pa.int64()),
            "cost_q": pa.array([best_cq], pa.int64()),
            "full_sse": round_like_sql([full_cost], 6),
        }
    )


def _q_qq_slope(sf_dir: str) -> pa.Table:
    """Quantile-quantile comparison of the lineitem price vs the part
    retail price distributions: exact decile order statistics
    (quantile_disc selection on cents) for both columns, then the
    through-origin OLS slope over the 9 QQ points from exact integer
    moments -- the distribution-shape comparison next to the KS
    statistic."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        exact_quantiles,
    )

    qs = [i / 10.0 for i in range(1, 10)]
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    pt = _read_pq(
        os.path.join(sf_dir, "part.parquet"), columns=["p_retailprice"]
    )

    def cents(col):
        def fn(batch: pa.Table) -> pa.Table:
            k = round_half_away(
                batch[col].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table({"k": pa.array(k)})

        return fn

    qa = exact_quantiles(
        li.map_batches(
            cents("l_extendedprice"), batch_format="pyarrow", batch_size=None
        ),
        "k",
        qs,
        method="disc",
    )
    qb = exact_quantiles(
        pt.map_batches(
            cents("p_retailprice"), batch_format="pyarrow", batch_size=None
        ),
        "k",
        qs,
        method="disc",
    )
    va = [
        int(qa.column(qa.num_columns - 1)[i].as_py()) for i in range(len(qs))
    ]
    vb = [
        int(qb.column(qb.num_columns - 1)[i].as_py()) for i in range(len(qs))
    ]
    sxy = sum(a * b for a, b in zip(va, vb))
    sxx = sum(b * b for b in vb)
    slope = float(sxy) / float(sxx)
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "lineitem_cents": pa.array(va, pa.int64()),
            "part_cents": pa.array(vb, pa.int64()),
            "qq_slope": round_like_sql([slope] * len(qs), 6),
        }
    )


def _q_raster_entropy(sf_dir: str) -> pa.Table:
    """Shannon entropy of the raster's deci-unit value distribution
    (valid cells) -- the information-content summary used to pick
    compression/stretch parameters.  Distributed per-value counts
    (value domain is bounded: deci units of [0, 50)), per-value terms
    quantized at 1e12 for an exact int64 sum."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))

    def vals(batch: pa.Table) -> pa.Table:
        out_v, out_n = [], []
        for i in range(batch.num_rows):
            z = np.asarray(batch["values"][i].as_py(), np.float32)
            z = z[z > -1e30]
            vq = round_half_away(z.astype(np.float64) * 10.0).astype(
                np.int64
            )
            uv, cn = np.unique(vq, return_counts=True)
            out_v.extend(uv.tolist())
            out_n.extend(cn.tolist())
        return pa.table(
            {
                "v": pa.array(out_v, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(vals, batch_format="pyarrow", batch_size=None),
        ["v"],
        [("n", "sum", "n")],
    )
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    tot = int(n.sum())
    terms = round_half_away(
        n.astype(np.float64)
        * np.log(n.astype(np.float64) / float(tot))
        * 1e12
    ).astype(np.int64)
    h = -float(int(terms.sum())) / 1e12 / float(tot)
    return pa.table(
        {
            "n_cells": pa.array([tot], pa.int64()),
            "n_distinct": pa.array([agg.num_rows], pa.int64()),
            "entropy_nats": round_like_sql([h], 6),
        }
    )


def _q_markov_top1_accuracy(sf_dir: str) -> pa.Table:
    """Top-1 next-event predictability: if we always predict the
    modal next event per current type, what fraction of transitions
    do we hit?  Sum over src of max_dst(n) / total transitions --
    pure integer counts from the markov_transitions construction
    (deterministic ties by taking the max count, not the arg)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        markov_transitions, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    tr = markov_transitions(ds, "user_id", "event_type", ["ts", "event_id"])
    src = tr["src"].to_numpy(zero_copy_only=False)
    nn = tr["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    best: dict[str, int] = {}
    tot = 0
    for s, c in zip(src.tolist(), nn.tolist()):
        tot += c
        if c > best.get(s, 0):
            best[s] = c
    hits = sum(best.values())
    return pa.table(
        {
            "n_transitions": pa.array([tot], pa.int64()),
            "n_hits": pa.array([hits], pa.int64()),
            "top1_accuracy": round_like_sql(
                [float(hits) / float(tot)], 6
            ),
        }
    )


def _q_intrinsic_dim(sf_dir: str) -> pa.Table:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding cloud: ID = 2N / sum ln(d2_2nd / d2_1st) with squared
    distances as exact integers over 1e4-tick quantized vectors
    (|v_i - v_j|^2 = v2_i + v2_j - 2 v_i.v_j, int64 matmul), each
    log-ratio term quantized at 1e12.  Points whose nearest neighbor
    coincides exactly (d1 = 0) are excluded on both sides."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )
    import ray
    import ray.data

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    full = collect_tables(ds)
    m = list_col_to_matrix(full["embedding"])
    vq_all = round_half_away(m.astype(np.float64) * 1e4).astype(np.int64)
    ref = ray.put(vq_all)

    def terms(batch: pa.Table) -> pa.Table:
        allv = ray.get(ref)
        v2_all = (allv * allv).sum(axis=1)
        vq = round_half_away(
            list_col_to_matrix(batch["embedding"]).astype(np.float64) * 1e4
        ).astype(np.int64)
        v2 = (vq * vq).sum(axis=1)
        # squared distances via float64 BLAS: every term is an exact
        # integer < 2^53 so the doubles ARE the exact int distances
        dots = vq.astype(np.float64) @ allv.T.astype(np.float64)
        d2 = (
            v2[:, None].astype(np.float64)
            + v2_all[None, :].astype(np.float64)
            - 2.0 * dots
        )
        part = np.partition(d2, 2, axis=1)[:, :3]
        part.sort(axis=1)
        d1 = part[:, 1]  # [:, 0] is the self-distance 0
        d2nd = part[:, 2]
        ok = d1 > 0
        t = round_half_away(
            np.log(
                d2nd[ok].astype(np.float64) / d1[ok].astype(np.float64)
            )
            * 1e12
        ).astype(np.int64)
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(t), np.int64)),
                "n": pa.array(np.ones(len(t), np.int64)),
                "s": pa.array(t),
            }
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    agg = hash_aggregate(
        ds.map_batches(terms, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [("n", "sum", "n"), ("s", "sum", "s")],
    )
    n = int(agg["n"][0].as_py())
    s = int(agg["s"][0].as_py())
    # ID = 2N / sum ln(mu^2) since ln(d2 ratio) = 2 ln(d ratio)
    dim = 2.0 * float(n) / (float(s) / 1e12)
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "intrinsic_dim": round_like_sql([dim], 6),
        }
    )


def _q_promo_revenue_share(sf_dir: str) -> pa.Table:
    """TPC-H Q14-shaped promotion effect: per ship month, the percent
    of discounted revenue from PROMO-type parts.  The part side routes
    through the size-aware equi_join (broadcast at bench sf, hash
    shuffle at scale); revenue quantized to cents so month sums are
    exact int64."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    pt_path = os.path.join(sf_dir, "part.parquet")
    pt = _read_pq(pt_path, columns=["p_partkey", "p_type"])
    joined = equi_join(
        li, pt, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
        right_size_hint=_disk_bytes(pt_path),
    )

    def monthly(batch: pa.Table) -> pa.Table:
        us = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        days = us // 86_400_000_000
        # month key = year*100 + month via epoch day -> date math
        d = (days.astype("datetime64[D]")).astype("datetime64[M]")
        month = (d.astype(np.int64) + 12 * 1970).astype(np.int64)
        cents = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (
                1.0
                - batch["l_discount"].to_numpy(zero_copy_only=False)
            )
            * 100.0
        ).astype(np.int64)
        promo = (
            batch["p_type"].to_numpy(zero_copy_only=False) == "PROMO"
        ).astype(np.int64)
        return pa.table(
            {
                "month_idx": pa.array(month),
                "rev": pa.array(cents),
                "promo_rev": pa.array(cents * promo),
            }
        )

    agg = hash_aggregate(
        joined.map_batches(monthly, batch_format="pyarrow", batch_size=None),
        ["month_idx"],
        [("rev", "sum", "rev"), ("promo_rev", "sum", "promo_rev")],
    )
    order = np.argsort(agg["month_idx"].to_numpy(zero_copy_only=False))
    mi, shares, revs = [], [], []
    for i in order.tolist():
        m = int(agg["month_idx"][i].as_py())
        r = int(agg["rev"][i].as_py())
        p = int(agg["promo_rev"][i].as_py())
        mi.append(m)
        revs.append(r)
        shares.append(100.0 * float(p) / float(r))
    return pa.table(
        {
            "month_idx": pa.array(mi, pa.int64()),
            "revenue_cents": pa.array(revs, pa.int64()),
            "promo_share_pct": round_like_sql(shares, 6),
        }
    )


def _q_ship_delay_histogram(sf_dir: str) -> pa.Table:
    """Order-to-ship latency distribution per order priority: the
    lineitem x orders big-big join (size-aware router) feeding an
    exact integer day-bucket histogram (0-7 / 8-30 / 31-90 / >90
    days) -- the fulfillment-SLA profile."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path, columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    joined = equi_join(
        li, od, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )

    def bucket(batch: pa.Table) -> pa.Table:
        sd = (
            batch["l_shipdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        od_ = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // 86_400_000_000
        )
        delay = sd - od_
        b = np.where(
            delay <= 7, 0, np.where(delay <= 30, 1, np.where(delay <= 90, 2, 3))
        ).astype(np.int64)
        return pa.table(
            {
                "priority": batch["o_orderpriority"],
                "bucket": pa.array(b),
                "_one": pa.array(np.ones(len(b), np.int64)),
            }
        )

    agg = hash_aggregate(
        joined.map_batches(bucket, batch_format="pyarrow", batch_size=None),
        ["priority", "bucket"],
        [("_one", "sum", "n")],
    )
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        agg,
        sort_keys=[("priority", "ascending"), ("bucket", "ascending")],
    )
    out = agg.take(idx)
    return pa.table(
        {
            "priority": out["priority"],
            "bucket": out["bucket"],
            "n": out["n"].cast(pa.int64()),
        }
    )


def _q_rusle_ls(sf_dir: str) -> pa.Table:
    """RUSLE LS (slope-length x steepness) factor: LS =
    (acc * cellwidth / 22.13)^0.4 * (sin(atan(slope)) / 0.0896)^1.3
    over the slope-fixture raster -- the soil-erosion map-algebra
    composition of the D8 flow accumulation and Horn slope operators
    (the TWI pattern with the Moore-Burch exponents)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        flow_accumulation, tile_slope,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    acc = flow_accumulation(tiles, block=32)  # pa.Table (lattice-bounded)
    slope = collect_tables(tile_slope(tiles))
    amap = {}
    for i in range(acc.num_rows):
        amap[
            (acc["row"][i].as_py(), acc["col"][i].as_py())
        ] = acc["acc"][i].as_py()
    rows, cols, lss = [], [], []
    sr = slope["row"].to_numpy(zero_copy_only=False)
    sc = slope["col"].to_numpy(zero_copy_only=False)
    sp = slope["slope_pct"].to_numpy(zero_copy_only=False)
    for i in range(len(sr)):
        a = amap.get((int(sr[i]), int(sc[i])))
        if a is None or not (sp[i] > 0):
            continue
        ls = (float(a) * 0.01 / 22.13) ** 0.4 * (
            np.sin(np.arctan(sp[i] / 100.0)) / 0.0896
        ) ** 1.3
        rows.append(int(sr[i]))
        cols.append(int(sc[i]))
        lss.append(float(ls))
    return pa.table(
        {
            "row": pa.array(rows, pa.int64()),
            "col": pa.array(cols, pa.int64()),
            "ls": round_like_sql(lss, 6),
        }
    )


def _q_rich_club(sf_dir: str) -> pa.Table:
    """Rich-club coefficient of the edit-1 word graph: phi(k) =
    2 * E_k / (N_k * (N_k - 1)) over nodes with degree > k for k in
    2/4/8 -- do high-degree words preferentially interconnect?
    Degrees, memberships and edge counts are all exact integers."""
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
    w1 = pairs["w1"].to_pylist()
    w2 = pairs["w2"].to_pylist()
    deg: dict[str, int] = {}
    for a, b in zip(w1, w2):
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out_k, out_n, out_e, out_phi = [], [], [], []
    for k in (2, 4, 8):
        nodes = {w for w, d in deg.items() if d > k}
        nk = len(nodes)
        ek = sum(1 for a, b in zip(w1, w2) if a in nodes and b in nodes)
        phi = (
            float("nan")
            if nk < 2
            else 2.0 * float(ek) / (float(nk) * float(nk - 1))
        )
        out_k.append(k)
        out_n.append(nk)
        out_e.append(ek)
        out_phi.append(phi)
    return pa.table(
        {
            "k": pa.array(out_k, pa.int64()),
            "n_nodes": pa.array(out_n, pa.int64()),
            "n_edges": pa.array(out_e, pa.int64()),
            "phi": round_like_sql(out_phi, 6),
        }
    )


def _q_dasymetric_alloc(sf_dir: str) -> pa.Table:
    """Dasymetric reallocation: each polygon's event mass (geocoded
    PIP count) redistributed over its valid raster cells proportional
    to elevation -- the ancillary-weighted population-downscaling
    operator.  Membership uses the identical strict half-plane tests
    as the zonal oracles; weights are deci-int z (exact int64 sums);
    the per-cell allocation is one float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    polys = {k: v for k, v in OG_POLYGONS.items() if k != "q_out"}

    def member(lon: np.ndarray, lat: np.ndarray, poly) -> np.ndarray:
        ok = np.ones(len(lon), bool)
        n = len(poly)
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            ok &= (bx - ax) * (lat - ay) - (by - ay) * (lon - ax) > 0
        return ok

    # pass 1a: per-polygon event mass (geocoded events)
    ev = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def ev_mass(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        pids, ones = [], []
        for pid, poly in polys.items():
            m = int(member(lon, lat, poly).sum())
            pids.append(pid)
            ones.append(m)
        return pa.table(
            {"pid": pa.array(pids), "m": pa.array(ones, pa.int64())}
        )

    mass_t = hash_aggregate(
        ev.map_batches(ev_mass, batch_format="pyarrow", batch_size=None),
        ["pid"],
        [("m", "sum", "mass")],
    )
    mass = {
        mass_t["pid"][i].as_py(): int(mass_t["mass"][i].as_py())
        for i in range(mass_t.num_rows)
    }
    # pass 1b: per-polygon weight sums over valid cells
    pts = _og_points_ds(valid_only=True)

    def zsums(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        zq = round_half_away(
            batch["z"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 10.0
        ).astype(np.int64)
        pids, sz = [], []
        for pid, poly in polys.items():
            m = member(lon, lat, poly)
            pids.append(pid)
            sz.append(int(zq[m].sum()))
        return pa.table(
            {"pid": pa.array(pids), "s": pa.array(sz, pa.int64())}
        )

    sz_t = hash_aggregate(
        pts.map_batches(zsums, batch_format="pyarrow", batch_size=None),
        ["pid"],
        [("s", "sum", "sumz")],
    )
    sumz = {
        sz_t["pid"][i].as_py(): int(sz_t["sumz"][i].as_py())
        for i in range(sz_t.num_rows)
    }

    # pass 2: per-cell allocations with the broadcast (mass, sumz)
    def alloc(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pix = batch["pix"].to_numpy(zero_copy_only=False).astype(np.int64)
        zq = round_half_away(
            batch["z"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 10.0
        ).astype(np.int64)
        out_p, out_x, out_a = [], [], []
        for pid, poly in polys.items():
            m = member(lon, lat, poly)
            a = (
                float(mass[pid])
                * zq[m].astype(np.float64)
                / float(sumz[pid])
            )
            out_p.extend([pid] * int(m.sum()))
            out_x.extend(pix[m].tolist())
            out_a.extend(a.tolist())
        return pa.table(
            {
                "polygon_id": pa.array(out_p),
                "pix": pa.array(out_x, pa.int64()),
                "alloc": round_like_sql(out_a, 6),
            }
        )

    out = collect_tables(
        pts.map_batches(alloc, batch_format="pyarrow", batch_size=None)
    )
    return out.sort_by(
        [("polygon_id", "ascending"), ("pix", "ascending")]
    )


def _q_location_quotient(sf_dir: str) -> pa.Table:
    """Location quotient of purchase activity per 12x12 coarse block:
    (purchases_b / events_b) / (purchases / events) -- the spatial-
    economics concentration index.  Pure integer counts, one float
    expression; blocks with zero purchases report LQ 0."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        is_p = (
            batch["event_type"].to_numpy(zero_copy_only=False) == "purchase"
        ).astype(np.int64)
        return pa.table(
            {
                "bx": pa.array(((eid % 96) // 8).astype(np.int64)),
                "by": pa.array((((eid // 96) % 96) // 8).astype(np.int64)),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "p": pa.array(is_p),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        ["bx", "by"],
        [("_one", "sum", "n"), ("p", "sum", "np")],
    )
    bx = agg["bx"].to_numpy(zero_copy_only=False).astype(np.int64)
    by = agg["by"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = agg["np"].to_numpy(zero_copy_only=False).astype(np.int64)
    tot_n = int(n.sum())
    tot_p = int(p.sum())
    order = np.argsort(by * 12 + bx)
    lq = (
        p[order].astype(np.float64) / n[order].astype(np.float64)
    ) / (float(tot_p) / float(tot_n))
    return pa.table(
        {
            "bx": pa.array(bx[order]),
            "by": pa.array(by[order]),
            "n_events": pa.array(n[order]),
            "n_purchases": pa.array(p[order]),
            "lq": round_like_sql(lq, 6),
        }
    )


def _q_degree_assortativity(sf_dir: str) -> pa.Table:
    """Degree assortativity of the edit-1 word graph (Newman r over
    edge-endpoint degree pairs, both orientations): degrees and all
    five moments are exact int64, so the only float steps are the
    final correlation expression -- the graph-topology summary next
    to components / PageRank / triangles."""
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
    w1 = pairs["w1"].to_pylist()
    w2 = pairs["w2"].to_pylist()
    deg: dict[str, int] = {}
    for a, b in zip(w1, w2):
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    n = 0
    sx = sy = sxx = syy = sxy = 0
    for a, b in zip(w1, w2):
        for x, y in ((deg[a], deg[b]), (deg[b], deg[a])):
            n += 1
            sx += x
            sy += y
            sxx += x * x
            syy += y * y
            sxy += x * y
    r = float(n * sxy - sx * sy) / (
        np.sqrt(float(n * sxx - sx * sx)) * np.sqrt(float(n * syy - sy * sy))
    )
    return pa.table(
        {
            "n_edges": pa.array([len(w1)], pa.int64()),
            "n_nodes": pa.array([len(deg)], pa.int64()),
            "assortativity": round_like_sql([r], 6),
        }
    )


def _q_word_burstiness(sf_dir: str) -> pa.Table:
    """Church-Gale word burstiness: observed document frequency vs
    the Poisson expectation N*(1-exp(-tf/N)) for the 20 most frequent
    tokens -- ratios < 1 flag bursty (topical) words.  tf comes from
    the vocab-bounded count combiner; df from per-batch distinct
    (token, doc) pairs (documents never span batches, so per-batch
    distinct is globally exact)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    nd_t = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "_g": pa.array(np.zeros(b.num_rows, np.int64)),
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["_g"],
        [("_one", "sum", "n")],
    )
    n_docs = int(nd_t["n"][0].as_py())

    def tf_df(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        ids = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        t = pa.table(
            {
                "token": flat.filter(keep),
                "doc_id": pc.take(batch["doc_id"], ids).filter(keep),
            }
        )
        tf = t.group_by(["token"]).aggregate([("token", "count")])
        tf = tf.rename_columns(["token", "tf"])
        dfp = (
            t.group_by(["token", "doc_id"]).aggregate([])
            .group_by(["token"]).aggregate([("doc_id", "count")])
            .rename_columns(["token", "df"])
        )
        joined = tf.join(dfp, keys=["token"])
        return joined

    parts = collect_tables(
        ds.map_batches(tf_df, batch_format="pyarrow", batch_size=None)
    )
    merged = (
        parts.group_by(["token"]).aggregate([("tf", "sum"), ("df", "sum")])
        .rename_columns(["token", "tf", "df"])
    )
    idx = pc.sort_indices(
        merged, sort_keys=[("tf", "descending"), ("token", "ascending")]
    )[:20]
    top = merged.take(idx)
    tf = top["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
    df = top["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    exp_df = float(n_docs) * (1.0 - np.exp(-tf / float(n_docs)))
    return pa.table(
        {
            "token": top["token"],
            "tf": top["tf"].cast(pa.int64()),
            "df": top["df"].cast(pa.int64()),
            "burstiness": round_like_sql(df / exp_df, 6),
        }
    )


def _q_emerging_hotspots(sf_dir: str) -> pa.Table:
    """Emerging hot-spot analysis (the space-time cube): Getis-Ord
    Gi* per 10-day bin on the coarse 24x24 lattice, then a
    Mann-Kendall sign trend per cell across the three bins --
    composes the two existing spatial/trend operators into the
    ArcGIS-style 'emerging hotspots' product.  Trend signs compare
    the 6-dp ROUNDED z values (identical on both sides), so the
    output is fully deterministic."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        getis_ord_gi_star,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def keyed(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "gx": pa.array(((eid % 96) // 4).astype(np.int64)),
                "gy": pa.array((((eid // 96) % 96) // 4).astype(np.int64)),
            }
        )

    counts = partial_count(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        ["day", "gx", "gy"],
    ).rename_columns(["day", "gx", "gy", "n"])
    day = counts["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    md = int(day.min())
    bins = (day - md) // 10
    gxs = counts["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
    gys = counts["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
    nns = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    zs = []
    for b in (0, 1, 2):
        sel = bins == b
        # counts are per (day, cell): sum the bin's days per cell
        # before the lattice scatter (a plain assignment would keep
        # only one day's count)
        acc = np.zeros((24, 24), np.int64)
        np.add.at(acc, (gys[sel], gxs[sel]), nns[sel])
        yy0, xx0 = np.nonzero(acc)
        sub = pa.table(
            {
                "gx": pa.array(xx0.astype(np.int64)),
                "gy": pa.array(yy0.astype(np.int64)),
                "n": pa.array(acc[yy0, xx0]),
            }
        )
        z = getis_ord_gi_star(sub, 24, 24)
        zs.append(
            z["gi_z"].to_numpy(zero_copy_only=False).reshape(24, 24)
        )
    z1, z2, z3 = zs
    mk = (
        np.sign(z2 - z1) + np.sign(z3 - z1) + np.sign(z3 - z2)
    ).astype(np.int64)
    yy, xx = np.mgrid[0:24, 0:24]
    return pa.table(
        {
            "gx": pa.array(xx.ravel().astype(np.int64)),
            "gy": pa.array(yy.ravel().astype(np.int64)),
            "z_bin0": pa.array(z1.ravel()),
            "z_bin1": pa.array(z2.ravel()),
            "z_bin2": pa.array(z3.ravel()),
            "mk_s": pa.array(mk.ravel()),
        }
    )


def _q_dickey_fuller(sf_dir: str) -> pa.Table:
    """Dickey-Fuller unit-root regression on the daily event-count
    series (delta_x ~ a + b*x_lag over the dense day series): slope
    from exact integer moments, the t-statistic's float chain pinned
    identically in SQL -- the stationarity screen before any
    forecasting operator."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xx = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    series = np.zeros(hi - lo + 1, np.int64)
    series[dd - lo] = xx
    xlag = series[:-1]
    dx = series[1:] - series[:-1]
    n = len(dx)
    sx = int(xlag.sum())
    sd = int(dx.sum())
    sxx = int((xlag * xlag).sum())
    sxd = int((xlag * dx).sum())
    sdd = int((dx * dx).sum())
    b = float(n * sxd - sx * sd) / float(n * sxx - sx * sx)
    a = (float(sd) - b * float(sx)) / float(n)
    sse = float(sdd) - a * float(sd) - b * float(sxd)
    se = np.sqrt(
        sse / float(n - 2)
        / (float(sxx) - float(sx) * float(sx) / float(n))
    )
    return pa.table(
        {
            "n_obs": pa.array([n], pa.int64()),
            "beta": round_like_sql([b], 6),
            "t_stat": round_like_sql([b / se], 6),
        }
    )


def _q_simplified_silhouette(sf_dir: str) -> pa.Table:
    """Simplified (centroid-based) silhouette of the embeddings'
    given labels: a = distance to own centroid, b = distance to the
    nearest other centroid, s = (b-a)/max(a,b), averaged per label.
    Embedding values quantized at 1e4 ticks; centroid distances
    expand to exact integer quadratics (n^2*|v|^2 - 2n*(v.c) +
    |c|^2, all int64 dot products), so both sides compute identical
    doubles; per-point s quantized at 1e9 for the per-label mean.
    Distributed: per-label per-dim integer sums (combiner tier),
    centroids broadcast, per-point pass vectorized as int matmuls."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )

    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))

    def sums(batch: pa.Table) -> pa.Table:
        m = list_col_to_matrix(batch["embedding"])
        vq = round_half_away(m.astype(np.float64) * 1e4).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = np.unique(lab)
        rows = []
        for l in labs.tolist():
            sel = vq[lab == l]
            rows.append((l, int(sel.shape[0]), sel.sum(axis=0)))
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "csum": pa.array(
                    [r[2].tolist() for r in rows],
                    pa.list_(pa.int64()),
                ),
            }
        )

    parts = collect_tables(
        ds.map_batches(sums, batch_format="pyarrow", batch_size=None)
    )
    lab_n: dict[int, int] = {}
    lab_c: dict[int, np.ndarray] = {}
    for i in range(parts.num_rows):
        l = int(parts["label"][i].as_py())
        lab_n[l] = lab_n.get(l, 0) + int(parts["n"][i].as_py())
        c = np.asarray(parts["csum"][i].as_py(), np.int64)
        lab_c[l] = lab_c.get(l, 0) + c
    labels = sorted(lab_n)
    nvec = np.array([lab_n[l] for l in labels], np.int64)
    cmat = np.stack([lab_c[l] for l in labels])  # (L, dim)
    import ray

    bref = ray.put((labels, nvec, cmat))

    def score(batch: pa.Table) -> pa.Table:
        labs, nv, cm = ray.get(bref)
        m = list_col_to_matrix(batch["embedding"])
        vq = round_half_away(m.astype(np.float64) * 1e4).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        v2 = (vq * vq).sum(axis=1)  # (N,)
        vc = vq @ cm.T  # (N, L) int64
        c2 = (cm * cm).sum(axis=1)  # (L,)
        d2 = (
            nv[None, :] ** 2 * v2[:, None]
            - 2 * nv[None, :] * vc
            + c2[None, :]
        )
        lidx = np.searchsorted(np.array(labs), lab)
        dist = np.sqrt(d2.astype(np.float64)) / (
            nv[None, :].astype(np.float64) * 1e4
        )
        a = dist[np.arange(len(lab)), lidx]
        masked = dist.copy()
        masked[np.arange(len(lab)), lidx] = np.inf
        bmin = masked.min(axis=1)
        s = (bmin - a) / np.maximum(a, bmin)
        sq = round_half_away(s * 1e9).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(lab),
                "_n": pa.array(np.ones(len(lab), np.int64)),
                "sq": pa.array(sq),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(score, batch_format="pyarrow", batch_size=None),
        ["label"],
        [("_n", "sum", "n"), ("sq", "sum", "s")],
    )
    order = np.argsort(agg["label"].to_numpy(zero_copy_only=False))
    out_l, out_n, out_s = [], [], []
    for i in order.tolist():
        l = int(agg["label"][i].as_py())
        n = int(agg["n"][i].as_py())
        s = int(agg["s"][i].as_py())
        out_l.append(l)
        out_n.append(n)
        out_s.append(float(s) / 1e9 / float(n))
    return pa.table(
        {
            "label": pa.array(out_l, pa.int64()),
            "n_points": pa.array(out_n, pa.int64()),
            "mean_silhouette": round_like_sql(out_s, 6),
        }
    )


def _q_ols_two_var(sf_dir: str) -> pa.Table:
    """Two-predictor OLS (cents ~ quantity + discount_bp) via the
    normal equations: every moment (n, sums, cross products) is an
    exact int64/HUGEINT, the 3x3 system solves by Cramer's rule with
    determinants expanded as exact integers, so the only float steps
    are three divisions and the R^2 expression -- the multiple-
    regression upgrade of grouped_regression's single predictor."""
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
                "syy": pa.array(y * y),
            }
        )

    cols = ("_n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y", "syy")
    agg = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in cols],
    )
    n, s1, s2, sy, s11, s22, s12, s1y, s2y, syy = (
        int(agg[c][0].as_py()) for c in cols
    )
    # normal equations X'X b = X'y with X = [1, x1, x2]; Cramer on
    # exact integer 3x3 determinants
    def det3(a, b, c, d, e, f, g, h, i):
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    d0 = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    db0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    db1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    db2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    b0 = float(db0) / float(d0)
    b1 = float(db1) / float(d0)
    b2 = float(db2) / float(d0)
    # R^2 = 1 - SSE/SST with SSE = y'y - b'X'y (floats, pinned order)
    sse = float(syy) - (
        b0 * float(sy) + b1 * float(s1y) + b2 * float(s2y)
    )
    sst = float(syy) - float(sy) * float(sy) / float(n)
    r2 = 1.0 - sse / sst
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "intercept": round_like_sql([b0], 6),
            "beta_qty": round_like_sql([b1], 6),
            "beta_disc_bp": round_like_sql([b2], 6),
            "r2": round_like_sql([r2], 6),
        }
    )


def _q_simpson_diversity(sf_dir: str) -> pa.Table:
    """Simpson diversity of languages per source (probability two
    random docs differ in language, the unbiased n(n-1) form) plus
    the effective language count 1/(1-D) -- the corpus-balance
    summary next to lang_entropy.  Pure integer counts, one float
    expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source", "lang"],
        [("_one", "sum", "n")],
    )
    per: dict[str, dict[str, int]] = {}
    src = agg["source"].to_numpy(zero_copy_only=False)
    lg = agg["lang"].to_numpy(zero_copy_only=False)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    for s, l, c in zip(src.tolist(), lg.tolist(), nn.tolist()):
        per.setdefault(s, {})[l] = c
    out_s, out_n, out_d, out_e = [], [], [], []
    for s in sorted(per):
        counts = per[s]
        tot = sum(counts.values())
        same = sum(c * (c - 1) for c in counts.values())
        d = 1.0 - float(same) / (float(tot) * float(tot - 1))
        out_s.append(s)
        out_n.append(tot)
        out_d.append(d)
        out_e.append(1.0 / (1.0 - d))
    return pa.table(
        {
            "source": pa.array(out_s),
            "n_docs": pa.array(out_n, pa.int64()),
            "simpson_d": round_like_sql(out_d, 6),
            "effective_langs": round_like_sql(out_e, 6),
        }
    )


def _q_voronoi_assign(sf_dir: str) -> pa.Table:
    """Nearest-facility (discrete Voronoi) allocation: every valid
    grid point assigned to its closest probe facility (squared
    planar distance, ties to the lowest facility id), per-facility
    point counts + mean distance (each distance quantized at 1e9 so
    the sum is an exact int64).  The facility side is broadcast
    (4 constants); the point side streams through map_batches."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    fx = np.array([p[0] for p in OG_KNN_PROBES])
    fy = np.array([p[1] for p in OG_KNN_PROBES])

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        d2 = (lon[:, None] - fx[None, :]) ** 2 + (
            lat[:, None] - fy[None, :]
        ) ** 2
        fid = np.argmin(d2, axis=1)  # first min = lowest id on ties
        dist = np.sqrt(d2[np.arange(len(fid)), fid])
        term = round_half_away(dist * 1e9).astype(np.int64)
        return pa.table(
            {
                "facility": pa.array(fid.astype(np.int64)),
                "_n": pa.array(np.ones(len(fid), np.int64)),
                "s": pa.array(term),
            }
        )

    agg = hash_aggregate(
        _og_points_ds(valid_only=True).map_batches(
            assign, batch_format="pyarrow", batch_size=None
        ),
        ["facility"],
        [("_n", "sum", "n"), ("s", "sum", "s")],
    )
    order = np.argsort(agg["facility"].to_numpy(zero_copy_only=False))
    fac, ns, means = [], [], []
    for i in order.tolist():
        f = int(agg["facility"][i].as_py())
        n = int(agg["n"][i].as_py())
        s = int(agg["s"][i].as_py())
        fac.append(f)
        ns.append(n)
        means.append(float(s) / 1e9 / float(n))
    return pa.table(
        {
            "facility": pa.array(fac, pa.int64()),
            "n_points": pa.array(ns, pa.int64()),
            "mean_dist": round_like_sql(means, 6),
        }
    )


def _q_kwic_contexts(sf_dir: str) -> pa.Table:
    """Keyword-in-context concordance: (previous word, next word)
    pairs around the corpus's most frequent token, top-20 by count --
    the classic corpus-linguistics context profile.  Both passes are
    vectorized Arrow/numpy (no per-row Python in the token stream);
    within-doc adjacency uses the empty-filtered token sequence, so
    boundaries never pair across documents."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"token": toks})
        out = t.group_by(["token"]).aggregate([("token", "count")])
        return out.rename_columns(["token", "n"])

    merged = collect_tables(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
    )
    merged = (
        merged.group_by(["token"]).aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    idx = pc.sort_indices(
        merged, sort_keys=[("n", "descending"), ("token", "ascending")]
    )[:1]
    target = merged["token"].take(idx)[0].as_py()

    def contexts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.to_numpy(zero_copy_only=False)[keep]
        parents = parents[keep]
        lens = np.bincount(parents, minlength=batch.num_rows)
        first = np.searchsorted(parents, np.arange(batch.num_rows))
        pos = np.arange(len(flat)) - first[parents]
        hits = np.nonzero(
            (flat == target) & (pos > 0) & (pos < lens[parents] - 1)
        )[0]
        t = pa.table(
            {"prev": pa.array(flat[hits - 1]), "nxt": pa.array(flat[hits + 1])}
        )
        out = t.group_by(["prev", "nxt"]).aggregate([("prev", "count")])
        return out.rename_columns(["prev", "nxt", "n"])

    allp = collect_tables(
        ds.map_batches(contexts, batch_format="pyarrow", batch_size=None)
    )
    allp = (
        allp.group_by(["prev", "nxt"]).aggregate([("n", "sum")])
        .rename_columns(["prev", "nxt", "n"])
    )
    idx = pc.sort_indices(
        allp,
        sort_keys=[
            ("n", "descending"), ("prev", "ascending"), ("nxt", "ascending"),
        ],
    )[:20]
    out = allp.take(idx)
    return pa.table(
        {
            "prev": out["prev"],
            "nxt": out["nxt"],
            "n": out["n"].cast(pa.int64()),
        }
    )


def _q_vocab_overlap(sf_dir: str) -> pa.Table:
    """Pairwise vocabulary Jaccard between sources: distinct (token,
    source) pairs via the vocab-bounded combiner, then source-bitmask
    encoding driver-side (<= 2^n_sources masks) so intersections come
    from mask counts, not an all-pairs token loop.  Tokenization
    identical to token_frequencies."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def tok_src(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        ids = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        t = pa.table(
            {
                "token": flat.filter(keep),
                "source": pc.take(batch["source"], ids).filter(keep),
            }
        )
        out = t.group_by(["token", "source"]).aggregate([])
        return out

    pairs = collect_tables(
        ds.map_batches(tok_src, batch_format="pyarrow", batch_size=None)
    )
    pairs = pairs.group_by(["token", "source"]).aggregate([])
    srcs = sorted(set(pairs["source"].to_pylist()))
    sidx = {s: i for i, s in enumerate(srcs)}
    tok = pairs["token"].to_numpy(zero_copy_only=False)
    src = pairs["source"].to_numpy(zero_copy_only=False)
    bit = np.array([1 << sidx[s] for s in src.tolist()], np.int64)
    order = np.argsort(tok, kind="stable")
    tok, bit = tok[order], bit[order]
    # per-token OR of source bits via segmented reduce
    change = np.ones(len(tok), bool)
    change[1:] = tok[1:] != tok[:-1]
    seg = np.cumsum(change) - 1
    masks = np.zeros(int(seg[-1]) + 1 if len(seg) else 0, np.int64)
    np.bitwise_or.at(masks, seg, bit)
    mask_counts = np.bincount(masks, minlength=1 << len(srcs))
    # compact to the occupied masks (<= distinct source subsets, far
    # smaller than 2^n_sources) so the pair loop is numpy over a tiny
    # vector, not a Python scan of the full mask space per pair
    occ = np.nonzero(mask_counts)[0]
    occ_n = mask_counts[occ]
    out_a, out_b, out_va, out_vb, out_i, out_j = [], [], [], [], [], []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            ba, bb = 1 << sidx[a], 1 << sidx[b]
            in_a = (occ & ba) != 0
            in_b = (occ & bb) != 0
            va = int(occ_n[in_a].sum())
            vb = int(occ_n[in_b].sum())
            inter = int(occ_n[in_a & in_b].sum())
            out_a.append(a)
            out_b.append(b)
            out_va.append(va)
            out_vb.append(vb)
            out_i.append(inter)
            out_j.append(float(inter) / float(va + vb - inter))
    return pa.table(
        {
            "source_a": pa.array(out_a),
            "source_b": pa.array(out_b),
            "vocab_a": pa.array(out_va, pa.int64()),
            "vocab_b": pa.array(out_vb, pa.int64()),
            "inter": pa.array(out_i, pa.int64()),
            "jaccard": round_like_sql(out_j, 6),
        }
    )


def _q_keyness_terms(sf_dir: str) -> pa.Table:
    """Dunning log-likelihood (G^2) keyness: tokens most
    characteristic of the alphabetically-first source vs the rest of
    the corpus -- the corpus-linguistics screen for domain drift.
    Token counts are exact; each of the two G^2 terms is quantized at
    1e6 (zero counts contribute 0 by the x*ln(x) limit, CASE'd
    identically in SQL); deterministic top-20 by (G^2 desc, token)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def tok_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        ids = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        t = pa.table(
            {
                "token": flat.filter(keep),
                "source": pc.take(batch["source"], ids).filter(keep),
            }
        )
        out = t.group_by(["token", "source"]).aggregate([("token", "count")])
        return out.rename_columns(["token", "source", "n"])

    parts = collect_tables(
        ds.map_batches(tok_counts, batch_format="pyarrow", batch_size=None)
    )
    merged = (
        parts.group_by(["token", "source"]).aggregate([("n", "sum")])
        .rename_columns(["token", "source", "n"])
    )
    src_a = min(set(merged["source"].to_pylist()))
    tok = merged["token"].to_numpy(zero_copy_only=False)
    src = merged["source"].to_numpy(zero_copy_only=False)
    n = merged["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    in_a = src == src_a
    a_cnt: dict[str, int] = {}
    b_cnt: dict[str, int] = {}
    for t, s, c in zip(tok.tolist(), in_a.tolist(), n.tolist()):
        d = a_cnt if s else b_cnt
        d[t] = d.get(t, 0) + c
    na = sum(a_cnt.values())
    nb = sum(b_cnt.values())
    toks_all = sorted(set(a_cnt) | set(b_cnt))
    rows = []
    for t in toks_all:
        a = a_cnt.get(t, 0)
        b = b_cnt.get(t, 0)
        ea = float(na) * float(a + b) / float(na + nb)
        eb = float(nb) * float(a + b) / float(na + nb)
        t1 = (
            0
            if a == 0
            else int(
                round_half_away(
                    np.array([float(a) * np.log(float(a) / ea) * 1e6])
                )[0]
            )
        )
        t2 = (
            0
            if b == 0
            else int(
                round_half_away(
                    np.array([float(b) * np.log(float(b) / eb) * 1e6])
                )[0]
            )
        )
        rows.append((t, a, b, 2 * (t1 + t2)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:20]
    return pa.table(
        {
            "token": pa.array([r[0] for r in rows]),
            "n_a": pa.array([r[1] for r in rows], pa.int64()),
            "n_rest": pa.array([r[2] for r in rows], pa.int64()),
            "g2": round_like_sql([float(r[3]) / 1e6 for r in rows], 6),
        }
    )


def _q_terrain_openness(sf_dir: str) -> pa.Table:
    """Positive topographic openness (Yokoyama et al. 2002) over the
    sparse DEM: per cell, mean over the 8 principal directions of
    (pi/2 - max elevation angle along the ray), valid ray cells only,
    diagonal steps at true sqrt(2) spacing.  The DEM ships once via
    ray.put (the viewshed fan-out shape); per-direction angle terms
    are quantized at 1e12 so the 8-way sum is an exact int64.  Cells
    lacking a valid neighbor in any direction are dropped (the SQL
    mirror's HAVING COUNT = 8)."""
    import ray
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    tiles = _og_tiles_table(sparse_invalid=True)
    z = np.full((OG_H, OG_W), np.nan)
    for i in range(tiles.num_rows):
        r0 = tiles["row_off"][i].as_py()
        c0 = tiles["col_off"][i].as_py()
        h = tiles["height"][i].as_py()
        w = tiles["width"][i].as_py()
        z[r0 : r0 + h, c0 : c0 + w] = np.asarray(
            tiles["values"][i].as_py(), np.float32
        ).reshape(h, w)
    valid = z > -1e30
    ref = ray.put((z, valid))
    rr, cc = np.meshgrid(np.arange(OG_H), np.arange(OG_W), indexing="ij")
    targets = pa.table(
        {
            "row": pa.array(rr.ravel().astype(np.int64)),
            "col": pa.array(cc.ravel().astype(np.int64)),
        }
    )
    dirs = [
        (0, 1, 1.0), (0, -1, 1.0), (1, 0, 1.0), (-1, 0, 1.0),
        (1, 1, float(np.sqrt(2.0))), (1, -1, float(np.sqrt(2.0))),
        (-1, 1, float(np.sqrt(2.0))), (-1, -1, float(np.sqrt(2.0))),
    ]

    def openness(batch: pa.Table) -> pa.Table:
        zg, vg = ray.get(ref)
        row = batch["row"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["col"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = vg[row, col]
        row, col = row[keep], col[keep]
        z0 = zg[row, col]
        tq_sum = np.zeros(len(row), np.int64)
        n_dirs = np.zeros(len(row), np.int64)
        for dr, dc, f in dirs:
            mr = np.full(len(row), -np.inf)
            any_v = np.zeros(len(row), bool)
            for k in range(1, 96):
                tr = row + dr * k
                tc = col + dc * k
                inb = (tr >= 0) & (tr < OG_H) & (tc >= 0) & (tc < OG_W)
                if not inb.any():
                    break
                trc = np.clip(tr, 0, OG_H - 1)
                tcc = np.clip(tc, 0, OG_W - 1)
                ok = inb & vg[trc, tcc]
                ratio = (zg[trc, tcc] - z0) / (k * 0.01 * f)
                mr = np.where(ok, np.maximum(mr, ratio), mr)
                any_v |= ok
            term = round_half_away(
                (np.pi / 2.0 - np.arctan(mr)) * 1e12
            ).astype(np.int64)
            tq_sum += np.where(any_v, term, 0)
            n_dirs += any_v
        full = n_dirs == 8
        return pa.table(
            {
                "row": pa.array(row[full]),
                "col": pa.array(col[full]),
                "openness": round_like_sql(
                    (tq_sum[full].astype(np.float64) / 1e12 / 8.0), 6
                ),
            }
        )

    out = collect_tables(
        ray.data.from_arrow(targets).map_batches(
            openness, batch_format="pyarrow", batch_size=1024
        )
    )
    return out.sort_by([("row", "ascending"), ("col", "ascending")])


def _q_linear_attribution(sf_dir: str) -> pa.Table:
    """Linear multi-touch attribution: each purchase's cents split
    equally across the user's touches (any earlier event) in the 24 h
    before it, summed per touch type -- the marketing-analytics
    counterpart of first_touch_attribution.  Per-(purchase, touch)
    terms cents/c are quantized at 1e6 so type sums are exact int64;
    per-user ordered matching runs in the groupby map_groups tier."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
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
        val = g["value"].to_numpy(zero_copy_only=False)
        cents = round_half_away(val * 100.0).astype(np.int64)
        types: dict[str, int] = {}
        is_p = et == "purchase"
        lo = np.searchsorted(ts, ts - 86_400_000_000, side="left")
        for i in np.nonzero(is_p)[0].tolist():
            j0 = int(lo[i])
            if j0 >= i:
                continue
            c = i - j0
            for j in range(j0, i):
                t = et[j]
                types[t] = types.get(t, 0) + int(
                    round_half_away(
                        np.array([float(cents[i]) / float(c) * 1e6])
                    )[0]
                )
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

    per = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )
    allp = collect_tables(per)
    agg = allp.group_by(["event_type"]).aggregate([("tq", "sum")])
    agg = agg.rename_columns(["event_type", "tq"])
    import pyarrow.compute as pc

    idx = pc.sort_indices(agg, sort_keys=[("event_type", "ascending")])
    agg = agg.take(idx)
    return pa.table(
        {
            "event_type": agg["event_type"],
            "attributed_dollars": round_like_sql(
                (
                    agg["tq"].to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    / 1e6
                    / 100.0
                ),
                6,
            ),
        }
    )


def _q_heaps_law(sf_dir: str) -> pa.Table:
    """Heaps'-law vocabulary growth over the corpus in doc_id order:
    cumulative token and distinct-word counts at 10 equal id-range
    checkpoints (first-occurrence bucket per word via a distributed
    min-doc_id groupby -- the corpus never sorts), then the log-log
    OLS exponent from 1e12-quantized LN terms (exact HUGEINT
    moments).  Tokenization identical to token_frequencies (RE2 \\s+
    split, empty filtered)."""
    import math

    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    mx_t = hash_aggregate(
        _read_pq(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "_g": pa.array(np.zeros(b.num_rows, np.int64)),
                    "doc_id": b["doc_id"],
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["_g"],
        [("doc_id", "max", "mx")],
    )
    mx = int(mx_t["mx"][0].as_py())

    def tok_min(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        ids = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        t = pa.table(
            {
                "token": flat.filter(keep),
                "doc_id": pc.take(batch["doc_id"], ids).filter(keep),
            }
        )
        out = t.group_by(["token"]).aggregate([("doc_id", "min")])
        return out.rename_columns(["token", "fd"])

    firsts = collect_tables(
        ds.map_batches(tok_min, batch_format="pyarrow", batch_size=None)
    )
    firsts = (
        firsts.group_by(["token"]).aggregate([("fd", "min")])
        .rename_columns(["token", "fd"])
    )

    def tok_bucket(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        ids = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        d = (
            pc.take(batch["doc_id"], ids)
            .filter(keep)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = d * 10 // (mx + 1)
        return pa.table(
            {
                "b": pa.array(b),
                "_one": pa.array(np.ones(len(b), np.int64)),
            }
        )

    nb = hash_aggregate(
        ds.map_batches(tok_bucket, batch_format="pyarrow", batch_size=None),
        ["b"],
        [("_one", "sum", "n")],
    )
    ncur = np.zeros(10, np.int64)
    for i in range(nb.num_rows):
        ncur[int(nb["b"][i].as_py())] = int(nb["n"][i].as_py())
    vcur = np.zeros(10, np.int64)
    fb = (
        firsts["fd"].to_numpy(zero_copy_only=False).astype(np.int64)
        * 10
        // (mx + 1)
    )
    for b in fb.tolist():
        vcur[b] += 1
    cum_n = np.cumsum(ncur)
    cum_v = np.cumsum(vcur)
    us = [int(round(math.log(float(x)) * 1e12)) for x in cum_n.tolist()]
    vs = [int(round(math.log(float(x)) * 1e12)) for x in cum_v.tolist()]
    k = 10
    su, sv = sum(us), sum(vs)
    suv = sum(u * v for u, v in zip(us, vs))
    suu = sum(u * u for u in us)
    beta = float(k * suv - su * sv) / float(k * suu - su * su)
    return pa.table(
        {
            "bucket": pa.array(list(range(10)), pa.int64()),
            "cum_tokens": pa.array(cum_n.tolist(), pa.int64()),
            "cum_vocab": pa.array(cum_v.tolist(), pa.int64()),
            "heaps_beta": round_like_sql([beta] * 10, 6),
        }
    )


def _q_hurst_exponent(sf_dir: str) -> pa.Table:
    """Hurst exponent of the daily event-count series via classic
    rescaled-range analysis: per-window range of cumulative deviations
    and variance both reduce to exact integers when scaled by the
    window length (R/S = (max_j - min_j of w*cum_j - (j+1)*S) /
    sqrt(w*Q - S^2)), each window ratio quantized at 1e9, the log-log
    OLS slope from 1e12-quantized LN terms.  Dense day series
    (missing days count 0, the variance_ratio convention)."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xx = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    series = np.zeros(n, np.int64)
    series[dd - lo] = xx
    windows = (3, 5, 10, 15)  # the events table spans ~30 days
    out_w, out_nw, out_mean = [], [], []
    pts_u, pts_v = [], []
    for w in windows:
        nw = n // w
        rqs = []
        for wid in range(nw):
            x = series[wid * w : (wid + 1) * w]
            s = int(x.sum())
            q = int((x * x).sum())
            a2 = w * q - s * s
            if a2 <= 0:
                continue
            cum = np.cumsum(x)
            y = w * cum - (np.arange(1, w + 1, dtype=np.int64)) * s
            rs = int(y.max()) - int(y.min())
            rqs.append(
                int(
                    round_half_away(
                        np.array([float(rs) / np.sqrt(float(a2)) * 1e9])
                    )[0]
                )
            )
        mean_rs = float(sum(rqs)) / 1e9 / float(len(rqs))
        out_w.append(w)
        out_nw.append(len(rqs))
        out_mean.append(mean_rs)
        pts_u.append(int(round(math.log(float(w)) * 1e12)))
        pts_v.append(int(round(math.log(mean_rs) * 1e12)))
    k = len(windows)
    su, sv = sum(pts_u), sum(pts_v)
    suv = sum(u * v for u, v in zip(pts_u, pts_v))
    suu = sum(u * u for u in pts_u)
    hurst = float(k * suv - su * sv) / float(k * suu - su * su)
    return pa.table(
        {
            "window": pa.array(out_w, pa.int64()),
            "n_windows": pa.array(out_nw, pa.int64()),
            "mean_rs": round_like_sql(out_mean, 6),
            "hurst": round_like_sql([hurst] * k, 6),
        }
    )


def _q_markov_entropy_rate(sf_dir: str) -> pa.Table:
    """Entropy rate of the per-user event-type Markov chain: H =
    -(1/N) * sum over transitions of n_sd * ln(n_sd / n_s.) -- the
    compressibility / predictability summary of the clickstream,
    composed from the same transition counts as markov_transitions.
    Per-transition terms quantized at 1e12 (exact int64 sum in any
    order), one float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        markov_transitions, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    tr = markov_transitions(ds, "user_id", "event_type", ["ts", "event_id"])
    src = tr["src"].to_numpy(zero_copy_only=False)
    nn = tr["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    row_tot: dict[str, int] = {}
    for s, c in zip(src.tolist(), nn.tolist()):
        row_tot[s] = row_tot.get(s, 0) + c
    ntot = int(nn.sum())
    tq = 0
    for s, c in zip(src.tolist(), nn.tolist()):
        tq += int(
            round_half_away(
                np.array(
                    [float(c) * np.log(float(c) / float(row_tot[s])) * 1e12]
                )
            )[0]
        )
    h = -float(tq) / 1e12 / float(ntot)
    return pa.table(
        {
            "n_transitions": pa.array([ntot], pa.int64()),
            "entropy_rate_nats": round_like_sql([h], 6),
        }
    )


def _q_t_closeness(sf_dir: str) -> pa.Table:
    """t-closeness audit completing the k-anonymity / l-diversity
    governance trio: per (source, length-bucket) QI group, the
    variational distance 0.5 * sum over langs |P_g(lang) - P(lang)|
    (absent langs contribute the global share), each term quantized
    at 1e12 so the group sum is an exact int64; groups failing t in
    0.2/0.3/0.5 compared in integer space (sum_tq > t * 2e12)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "len_bucket": pa.array(nc // 100),
                "lang": batch["lang"],
                "_one": pa.array(np.ones(len(nc), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source", "len_bucket", "lang"],
        [("_one", "sum", "n")],
    )
    src = agg["source"].to_numpy(zero_copy_only=False)
    lb = agg["len_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    lg = agg["lang"].to_numpy(zero_copy_only=False)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    lang_tot: dict[str, int] = {}
    groups: dict[tuple, dict[str, int]] = {}
    for s, b, l, c in zip(src.tolist(), lb.tolist(), lg.tolist(), nn.tolist()):
        lang_tot[l] = lang_tot.get(l, 0) + c
        groups.setdefault((s, b), {})[l] = c
    ntot = sum(lang_tot.values())
    sums = {}
    sizes = {}
    for gkey, per in groups.items():
        ng = sum(per.values())
        sizes[gkey] = ng
        tq = 0
        for l, nl in lang_tot.items():
            pg = float(per.get(l, 0)) / float(ng)
            pt = float(nl) / float(ntot)
            tq += int(round_half_away(np.array([abs(pg - pt) * 1e12]))[0])
        sums[gkey] = tq
    thresholds = ((0.2, 400_000_000_000), (0.3, 600_000_000_000),
                  (0.5, 1_000_000_000_000))
    out_t, out_g, out_d = [], [], []
    for tval, tint in thresholds:
        bad = [g for g, s in sums.items() if s > tint]
        out_t.append(tval)
        out_g.append(len(bad))
        out_d.append(int(sum(sizes[g] for g in bad)))
    max_t = max(sums.values())
    return pa.table(
        {
            "t": pa.array(out_t, pa.float64()),
            "n_groups_failing": pa.array(out_g, pa.int64()),
            "docs_exposed": pa.array(out_d, pa.int64()),
            "max_t": round_like_sql(
                [float(max_t) / 2e12] * len(out_t), 6
            ),
        }
    )


def _q_levene_bf(sf_dir: str) -> pa.Table:
    """Brown-Forsythe (median-centered Levene) homogeneity-of-variance
    test of the dollar price across return flags: group medians via
    the distributed exact-quantile machinery (quantile_disc element
    selection -- an exact integer), absolute deviations are then exact
    int64, and W's float tail is evaluated in pinned A/N/R order on
    both sides."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )

    def dollars(batch: pa.Table) -> pa.Table:
        k = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"flag": batch["l_returnflag"], "k": pa.array(k)})

    kd = ds.map_batches(dollars, batch_format="pyarrow", batch_size=None)
    # one groupby shuffle for all three group medians (3 flags =
    # bounded cardinality; was 3 x exact_quantiles = 6 full passes)
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    med_tbl = collect_tables(
        grouped_exact_quantiles(kd, "flag", "k", [0.5])
    )
    meds = {}
    vcol = med_tbl.column(med_tbl.num_columns - 1)
    for i in range(med_tbl.num_rows):
        meds[med_tbl["flag"][i].as_py()] = int(vcol[i].as_py())

    med_arr = meds  # broadcast via closure (3 ints)

    def absdev(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        fl = batch["flag"].to_numpy(zero_copy_only=False)
        med = np.zeros(len(k), np.int64)
        for f, m in med_arr.items():
            med[fl == f] = m
        z = np.abs(k - med)
        return pa.table(
            {
                "flag": batch["flag"],
                "_n": pa.array(np.ones(len(z), np.int64)),
                "s1": pa.array(z),
                "s2": pa.array(z * z),
            }
        )

    agg = hash_aggregate(
        kd.map_batches(absdev, batch_format="pyarrow", batch_size=None),
        ["flag"],
        [(c, "sum", c) for c in ("_n", "s1", "s2")],
    )
    g = {}
    for i in range(agg.num_rows):
        g[agg["flag"][i].as_py()] = (
            int(agg["_n"][i].as_py()),
            int(agg["s1"][i].as_py()),
            int(agg["s2"][i].as_py()),
        )
    (na, s1a, s2a) = g["A"]
    (nn_, s1n, s2n) = g["N"]
    (nr, s1r, s2r) = g["R"]
    ntot = na + nn_ + nr
    zb = float(s1a + s1n + s1r) / float(ntot)
    za = float(s1a) / float(na)
    zn = float(s1n) / float(nn_)
    zr = float(s1r) / float(nr)
    num = (
        float(na) * (za - zb) * (za - zb)
        + float(nn_) * (zn - zb) * (zn - zb)
    ) + float(nr) * (zr - zb) * (zr - zb)
    den = (
        (float(s2a) - float(s1a) * float(s1a) / float(na))
        + (float(s2n) - float(s1n) * float(s1n) / float(nn_))
    ) + (float(s2r) - float(s1r) * float(s1r) / float(nr))
    w = (float(ntot - 3) / 2.0) * num / den
    return pa.table(
        {
            "n_total": pa.array([ntot], pa.int64()),
            "med_a": pa.array([meds["A"]], pa.int64()),
            "med_n": pa.array([meds["N"]], pa.int64()),
            "med_r": pa.array([meds["R"]], pa.int64()),
            "levene_w": round_like_sql([w], 6),
        }
    )


def _q_twi(sf_dir: str) -> pa.Table:
    """Topographic Wetness Index ln(a / tan beta) over the slope
    fixture raster: specific catchment a = D8 flow accumulation x
    cell width (the TauDEM-style two-level operator), tan beta from
    the Horn slope kernel; defined where slope > 0 and both
    derivatives exist.  Composes the two existing distributed raster
    operators with a (lattice-bounded) driver join."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        flow_accumulation, tile_slope,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    acc = flow_accumulation(tiles, block=32)  # pa.Table (lattice-bounded)
    slope = collect_tables(tile_slope(tiles))
    amap = {}
    for i in range(acc.num_rows):
        amap[
            (acc["row"][i].as_py(), acc["col"][i].as_py())
        ] = acc["acc"][i].as_py()
    rows, cols, twis = [], [], []
    sr = slope["row"].to_numpy(zero_copy_only=False)
    sc = slope["col"].to_numpy(zero_copy_only=False)
    sp = slope["slope_pct"].to_numpy(zero_copy_only=False)
    for i in range(len(sr)):
        a = amap.get((int(sr[i]), int(sc[i])))
        if a is None or not (sp[i] > 0):
            continue
        rows.append(int(sr[i]))
        cols.append(int(sc[i]))
        twis.append(float(np.log((float(a) * 0.01) / (sp[i] / 100.0))))
    return pa.table(
        {
            "row": pa.array(rows, pa.int64()),
            "col": pa.array(cols, pa.int64()),
            "twi": round_like_sql(twis, 6),
        }
    )


def _q_clark_evans(sf_dir: str) -> pa.Table:
    """Clark-Evans nearest-neighbor index R = mean-NN-dist / E[CSR]
    over the geocoded event subset (id % 100): the classic
    point-pattern dispersion screen next to Ripley's K.  The NN
    search is the bucketed ring-expansion KNNIndex (ST5 shape: index
    from a bounded subset, queries distributed per batch); each NN
    distance is re-derived as SQRT(dx*dx + dy*dy) and quantized at
    1e9 so the cross-point sum is an exact int64 in any order.  No
    edge correction (naive R; the SQL mirror repeats it)."""
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

    sub = ds.map_batches(pts, batch_format="pyarrow", batch_size=None)
    pts_tbl = collect_tables(sub)
    px = pts_tbl["px"].to_numpy(zero_copy_only=False)
    py = pts_tbl["py"].to_numpy(zero_copy_only=False)
    index_ref = ray.put(KNNIndex(px, py))

    def nn_terms(batch: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)
        qx = batch["px"].to_numpy(zero_copy_only=False)
        qy = batch["py"].to_numpy(zero_copy_only=False)
        ii, _dd = idx.query(qx, qy, k=2)
        nb = ii[:, 1]
        dx = qx - idx.lon[nb]
        dy = qy - idx.lat[nb]
        term = round_half_away(np.sqrt(dx * dx + dy * dy) * 1e9).astype(
            np.int64
        )
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(term), np.int64)),
                "n": pa.array(np.ones(len(term), np.int64)),
                "s": pa.array(term),
            }
        )

    agg = hash_aggregate(
        ray.data.from_arrow(pts_tbl).map_batches(
            nn_terms, batch_format="pyarrow", batch_size=None
        ),
        ["_g"],
        [("n", "sum", "n"), ("s", "sum", "s")],
    )
    n = int(agg["n"][0].as_py())
    s = int(agg["s"][0].as_py())
    dbar = float(s) / 1e9 / float(n)
    r = dbar / (0.5 * np.sqrt(0.9025 / float(n)))
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "mean_nn_dist": round_like_sql([dbar], 6),
            "clark_evans_r": round_like_sql([r], 6),
        }
    )


_GFUNC_RADII_Q = (0, 10_000_000, 14_142_136, 20_000_000, 30_000_000, 50_000_000)


def _q_nn_gfunction(sf_dir: str) -> pa.Table:
    """Nearest-neighbor G function (empirical CDF of the NN distance
    at fixed radii) over the same geocoded event subset as
    clark_evans -- the finer-grained companion to the single-number
    Clark-Evans R.  NN distances are quantized at 1e9 so the
    per-radius counts are exact integer comparisons; per-batch
    partial counts roll up via the tier-2 combiner."""
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

    sub = ds.map_batches(pts, batch_format="pyarrow", batch_size=None)
    pts_tbl = collect_tables(sub)
    px = pts_tbl["px"].to_numpy(zero_copy_only=False)
    py = pts_tbl["py"].to_numpy(zero_copy_only=False)
    index_ref = ray.put(KNNIndex(px, py))
    radii = np.asarray(_GFUNC_RADII_Q, np.int64)

    def g_terms(batch: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)
        qx = batch["px"].to_numpy(zero_copy_only=False)
        qy = batch["py"].to_numpy(zero_copy_only=False)
        ii, _dd = idx.query(qx, qy, k=2)
        nb = ii[:, 1]
        dx = qx - idx.lon[nb]
        dy = qy - idx.lat[nb]
        dq = round_half_away(np.sqrt(dx * dx + dy * dy) * 1e9).astype(
            np.int64
        )
        n_le = (dq[None, :] <= radii[:, None]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "r_q": pa.array(radii),
                "n": pa.array(np.full(len(radii), len(dq), np.int64)),
                "n_le": pa.array(n_le),
            }
        )

    agg = hash_aggregate(
        ray.data.from_arrow(pts_tbl).map_batches(
            g_terms, batch_format="pyarrow", batch_size=None
        ),
        ["r_q"],
        [("n", "sum", "n"), ("n_le", "sum", "n_le")],
    )
    rq = agg["r_q"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rq)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n_le = agg["n_le"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    return pa.table(
        {
            "r": round_like_sql(rq[order].astype(np.float64) / 1e9, 6),
            "n_le": pa.array(n_le, pa.int64()),
            "g_hat": round_like_sql(
                n_le.astype(np.float64) / n.astype(np.float64), 6
            ),
        }
    )


def _q_gravity_flows(sf_dir: str) -> pa.Table:
    """Gravity spatial-interaction model on the coarse 12x12 lattice
    (8x8-cell blocks of the geocode grid): T_ij = m_i * m_j / d2_ij
    for near pairs (Chebyshev block distance <= 4), masses = exact
    event counts, d2 in block units -- the trip-distribution screen.
    Distributed per-block counts; the 144-cell pair cross is
    driver-side (bounded by the lattice, not the data)."""
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
    order = np.argsort(key)
    bx, by, m, key = bx[order], by[order], m[order], key[order]
    oa, ob, oi = [], [], []
    for i in range(len(m)):
        for j in range(i + 1, len(m)):
            dx = int(bx[j] - bx[i])
            dy = int(by[j] - by[i])
            if max(abs(dx), abs(dy)) > 4:
                continue
            d2 = dx * dx + dy * dy
            oa.append(int(key[i]))
            ob.append(int(key[j]))
            oi.append(float(m[i] * m[j]) / float(d2))
    return pa.table(
        {
            "cell_a": pa.array(oa, pa.int64()),
            "cell_b": pa.array(ob, pa.int64()),
            "interaction": round_like_sql(oi, 6),
        }
    )


def _q_jarque_bera(sf_dir: str) -> pa.Table:
    """Jarque-Bera normality screen of the hundreds-of-dollars price
    per return flag: raw power sums are exact int64 per batch, the
    central-moment identities A2 = n*s2 - s1^2, A3 = n^2*s3 - 3n*s2*s1
    + 2*s1^3, A4 = n^3*s4 - 4n^2*s3*s1 + 6n*s2*s1^2 - 3*s1^4 are exact
    Python/HUGEINT integers, and skew/kurtosis collapse to g1 =
    A3/A2^1.5, g2 = A4/A2^2 (the n powers cancel) -- so the only float
    steps are two divisions, a pow, and the JB combination, written
    identically in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )

    def powers(batch: pa.Table) -> pa.Table:
        k = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        k2 = k * k
        return pa.table(
            {
                "flag": batch["l_returnflag"],
                "_n": pa.array(np.ones(len(k), np.int64)),
                "s1": pa.array(k),
                "s2": pa.array(k2),
                "s3": pa.array(k2 * k),
                "s4": pa.array(k2 * k2),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(powers, batch_format="pyarrow", batch_size=None),
        ["flag"],
        [(c, "sum", c) for c in ("_n", "s1", "s2", "s3", "s4")],
    )
    flags, ns, skews, kurts, jbs = [], [], [], [], []
    order = np.argsort(agg["flag"].to_numpy(zero_copy_only=False))
    for i in order.tolist():
        n = int(agg["_n"][i].as_py())
        s1 = int(agg["s1"][i].as_py())
        s2 = int(agg["s2"][i].as_py())
        s3 = int(agg["s3"][i].as_py())
        s4 = int(agg["s4"][i].as_py())
        a2 = n * s2 - s1 * s1
        a3 = n * n * s3 - 3 * n * s2 * s1 + 2 * s1**3
        a4 = (
            n**3 * s4 - 4 * n * n * s3 * s1 + 6 * n * s2 * s1 * s1
            - 3 * s1**4
        )
        g1 = float(a3) / float(a2) ** 1.5
        g2 = float(a4) / (float(a2) * float(a2))
        jb = float(n) / 6.0 * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0)
        flags.append(agg["flag"][i].as_py())
        ns.append(n)
        skews.append(g1)
        kurts.append(g2)
        jbs.append(jb)
    return pa.table(
        {
            "l_returnflag": pa.array(flags),
            "n_rows": pa.array(ns, pa.int64()),
            "skewness": round_like_sql(skews, 6),
            "kurtosis": round_like_sql(kurts, 6),
            "jb_stat": round_like_sql(jbs, 6),
        }
    )


def _q_cohens_d(sf_dir: str) -> pa.Table:
    """Cohen's d effect size between returned ('R') and normal ('N')
    line items on the hundreds-of-dollars price: exact int64 group
    moments, pooled sample variance ((n1-1)v1 + (n2-1)v2)/(n1+n2-2)
    with v = A2/(n(n-1)), one shared float tail."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )

    def powers(batch: pa.Table) -> pa.Table:
        k = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "flag": batch["l_returnflag"],
                "_n": pa.array(np.ones(len(k), np.int64)),
                "s1": pa.array(k),
                "s2": pa.array(k * k),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(powers, batch_format="pyarrow", batch_size=None),
        ["flag"],
        [(c, "sum", c) for c in ("_n", "s1", "s2")],
    )
    m = {}
    for i in range(agg.num_rows):
        m[agg["flag"][i].as_py()] = (
            int(agg["_n"][i].as_py()),
            int(agg["s1"][i].as_py()),
            int(agg["s2"][i].as_py()),
        )
    (n1, a1, q1), (n2, a2_, q2) = m["R"], m["N"]
    v1 = float(n1 * q1 - a1 * a1) / (float(n1) * float(n1 - 1))
    v2 = float(n2 * q2 - a2_ * a2_) / (float(n2) * float(n2 - 1))
    sp = np.sqrt(
        ((float(n1 - 1)) * v1 + (float(n2 - 1)) * v2)
        / float(n1 + n2 - 2)
    )
    d = (float(a1) / float(n1) - float(a2_) / float(n2)) / sp
    return pa.table(
        {
            "n_returned": pa.array([n1], pa.int64()),
            "n_normal": pa.array([n2], pa.int64()),
            "cohens_d": round_like_sql([d], 6),
        }
    )


def _q_durbin_watson(sf_dir: str) -> pa.Table:
    """Durbin-Watson first-order autocorrelation statistic of the
    daily order-revenue series: per-day cents summed distributed
    (exact int64), residuals against the half-away-rounded integer
    mean (DW is invariant to the constant shift), successive-diff and
    level sums as exact Python/HUGEINT integers over the observed-day
    series, one float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
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
    xs = (
        agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    ).tolist()
    n = len(xs)
    tot = sum(xs)
    mean_int = int(round_half_away(np.array([float(tot) / n]))[0])
    es = [x - mean_int for x in xs]
    num = sum(
        (es[t] - es[t - 1]) * (es[t] - es[t - 1]) for t in range(1, n)
    )
    den = sum(e * e for e in es)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "dw": round_like_sql([float(num) / float(den)], 6),
        }
    )


def _q_minhash_estimate(sf_dir: str) -> pa.Table:
    """MinHash-vs-exact Jaccard calibration over a deterministic doc
    subset: word-3-gram shingles (the dup_passages construction),
    shingle ids by dense rank so both sides hash the SAME integers,
    16 mix32 permutations (seed folded into the key: mix32(gid + s)),
    collision-rate estimate next to the exact distinct-set Jaccard --
    the estimator-accuracy audit run before trusting LSH dedup."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    n_seeds = 16
    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def shingle(batch: pa.Table) -> pa.Table:
        out_d, out_g = [], []
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        for i, t in enumerate(batch["text"].to_pylist()):
            if ids[i] % 25 != 0:
                continue
            ws = [w for w in t.split(" ") if w != ""]
            grams = {
                " ".join(ws[j : j + 3]) for j in range(len(ws) - 2)
            }
            out_d.extend([int(ids[i])] * len(grams))
            out_g.extend(sorted(grams))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "gram": pa.array(out_g),
            }
        )

    pairs_t = collect_tables(
        ds.map_batches(shingle, batch_format="pyarrow", batch_size=None)
    )
    doc = pairs_t["doc_id"].to_numpy(zero_copy_only=False)
    gram = pairs_t["gram"].to_numpy(zero_copy_only=False)
    uniq = np.unique(gram)
    gid = np.searchsorted(uniq, gram) + 1  # dense rank, 1-based
    docs = np.unique(doc)
    sets = {int(u): set(gid[doc == u].tolist()) for u in docs}
    mh = {}
    for u in docs:
        ids = np.array(sorted(sets[int(u)]), np.int64)
        mh[int(u)] = [
            int(mix32(ids + s, 0).min()) for s in range(n_seeds)
        ]
    out_a, out_b, out_e, out_x = [], [], [], []
    dl = sorted(int(u) for u in docs)
    for i, a in enumerate(dl):
        for b in dl[i + 1 :]:
            m = sum(1 for s in range(n_seeds) if mh[a][s] == mh[b][s])
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            out_a.append(a)
            out_b.append(b)
            out_e.append(float(m) / 16.0)
            out_x.append(float(inter) / float(union))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "est_jaccard": round_like_sql(out_e, 6),
            "exact_jaccard": round_like_sql(out_x, 6),
        }
    )


def _q_l_diversity(sf_dir: str) -> pa.Table:
    """l-diversity audit (companion to k_anonymity): within each
    (source, length-bucket) quasi-identifier group, how many distinct
    languages (the sensitive attribute) appear -- groups failing
    l in 2/3 and the documents they expose.  Pure integer counts."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "len_bucket": pa.array(nc // 100),
                "lang": batch["lang"],
                "_one": pa.array(np.ones(len(nc), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source", "len_bucket", "lang"],
        [("_one", "sum", "n")],
    )
    src = agg["source"].to_numpy(zero_copy_only=False)
    lb = agg["len_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    groups: dict[tuple, list[int]] = {}
    for s, b, c in zip(src.tolist(), lb.tolist(), n.tolist()):
        groups.setdefault((s, b), []).append(c)
    ls = (2, 3)
    out_l, out_f, out_d = [], [], []
    for l in ls:
        fail = [v for v in groups.values() if len(v) < l]
        out_l.append(l)
        out_f.append(len(fail))
        out_d.append(int(sum(sum(v) for v in fail)))
    return pa.table(
        {
            "l": pa.array(out_l, pa.int64()),
            "groups_failing": pa.array(out_f, pa.int64()),
            "docs_exposed": pa.array(out_d, pa.int64()),
        }
    )


def _q_variance_ratio(sf_dir: str) -> pa.Table:
    """Lo-MacKinlay variance-ratio statistic of the daily event-count
    series at horizons 2/5/10 (the random-walk / mean-reversion
    probe): q-day sums from exact integer prefix differences, both
    variances from int64 moments, one shared float expression per
    horizon."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    qs_ = (2, 5, 10)
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "d": pa.array(us // 86_400_000_000),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    ).sort_by("d")
    d = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xs = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(d[0]), int(d[-1])
    n = hi - lo + 1
    x = np.zeros(n, np.int64)
    x[d - lo] = xs
    sx = int(x.sum())
    qx = int((x * x).sum())
    mu = float(sx) / float(n)
    var_x = (float(qx) - float(n) * mu * mu) / (float(n) - 1.0)
    out_q, out_v = [], []
    for q in qs_:
        c = np.concatenate(([0], np.cumsum(x)))  # c[t] = sum of x[:t]
        s = c[q:] - c[:-q]  # q-day rolling sums, len n-q+1
        m = len(s)
        ss = int(s.sum())
        qqs = int((s * s).sum())
        mus = float(ss) / float(m)
        var_s = (float(qqs) - float(m) * mus * mus) / (float(m) - 1.0)
        out_q.append(q)
        out_v.append(var_s / (float(q) * var_x))
    return pa.table(
        {
            "horizon": pa.array(out_q, pa.int64()),
            "variance_ratio": round_like_sql(out_v, 6),
        }
    )


def _q_variogram_anisotropy(sf_dir: str) -> pa.Table:
    """Directional semivariogram anisotropy of the sparse DEM: exact
    deci-unit pair sums along BOTH axes at lags 1/2/4 (within-tile
    pairs, same machinery as grid_variogram), gamma_x / gamma_y ratio
    per lag -- the directional-structure diagnostic kriging needs."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    lags = (1, 2, 4)
    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True))

    def partial(batch: pa.Table) -> pa.Table:
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        vals = batch["values"]
        out_h, out_ax, out_n, out_s = [], [], [], []
        for i in range(batch.num_rows):
            v = np.asarray(vals[i].as_py(), np.float32).reshape(hs[i], ws[i])
            valid = v > -1e30
            k = np.zeros(v.shape, np.int64)
            k[valid] = np.round(
                v[valid].astype(np.float64) * 10.0
            ).astype(np.int64)
            for h in lags:
                bx = valid[:, :-h] & valid[:, h:]
                dx = k[:, :-h][bx] - k[:, h:][bx]
                by = valid[:-h, :] & valid[h:, :]
                dy = k[:-h, :][by] - k[h:, :][by]
                out_h.extend([h, h])
                out_ax.extend(["x", "y"])
                out_n.extend([int(bx.sum()), int(by.sum())])
                out_s.extend([int((dx * dx).sum()), int((dy * dy).sum())])
        return pa.table(
            {
                "lag": pa.array(out_h, pa.int64()),
                "axis": pa.array(out_ax),
                "n_pairs": pa.array(out_n, pa.int64()),
                "sum_d2": pa.array(out_s, pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["lag", "axis"],
        [("n_pairs", "sum", "n_pairs"), ("sum_d2", "sum", "sum_d2")],
    )
    lag = agg["lag"].to_numpy(zero_copy_only=False).astype(np.int64)
    ax = agg["axis"].to_numpy(zero_copy_only=False)
    nn = agg["n_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
    ss = agg["sum_d2"].to_numpy(zero_copy_only=False).astype(np.int64)
    gam = {
        (int(l), a): float(s) / (2.0 * float(c) * 100.0)
        for l, a, c, s in zip(lag, ax.tolist(), nn, ss)
    }
    out_l = sorted(lags)
    gx = [gam[(l, "x")] for l in out_l]
    gy = [gam[(l, "y")] for l in out_l]
    return pa.table(
        {
            "lag": pa.array(out_l, pa.int64()),
            "gamma_x": round_like_sql(gx, 6),
            "gamma_y": round_like_sql(gy, 6),
            "anisotropy": round_like_sql(
                [a / b for a, b in zip(gx, gy)], 6
            ),
        }
    )


def _q_k_anonymity(sf_dir: str) -> pa.Table:
    """k-anonymity audit over the (lang, source, length-bucket)
    quasi-identifier -- the privacy-risk counter a training-data
    governance pipeline runs before release: QI group sizes via the
    combiner tier, documents in groups smaller than k for k in
    2/5/10.  Pure integer counts."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source", "n_chars"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "len_bucket": pa.array(nc // 100),
                "_one": pa.array(np.ones(len(nc), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["lang", "source", "len_bucket"],
        [("_one", "sum", "g")],
    )
    g = agg["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    ks = (2, 5, 10)
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_groups": pa.array([len(g)] * len(ks), pa.int64()),
            "docs_at_risk": pa.array(
                [int(g[g < k].sum()) for k in ks], pa.int64()
            ),
        }
    )


def _q_home_work_od(sf_dir: str) -> pa.Table:
    """Home / work anchor inference per user (the mobility-mining
    primitive behind commute OD matrices): conditional night/day
    counts per (user, cell) via the combiner tier, per-user argmax
    with cell-id tie-break, planar commute distance as the one float
    expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (us // 3_600_000_000) % 24
        night = (h < 6) | (h >= 22)
        day = (h >= 9) & (h < 17)
        cell = ((eid // 96) % 96) * 96 + (eid % 96)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cell": pa.array(cell),
                "n_night": pa.array(night.astype(np.int64)),
                "n_day": pa.array(day.astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id", "cell"],
        [("n_night", "sum", "n_night"), ("n_day", "sum", "n_day")],
    )
    uid = agg["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n_night"].to_numpy(zero_copy_only=False).astype(np.int64)
    nd = agg["n_day"].to_numpy(zero_copy_only=False).astype(np.int64)

    def argmax_per_user(score: np.ndarray) -> dict[int, int]:
        # max score, ties to the smaller cell id; zero scores excluded
        best: dict[int, tuple[int, int]] = {}
        for u, c, s in zip(uid.tolist(), cell.tolist(), score.tolist()):
            if s <= 0:
                continue
            cur = best.get(u)
            if cur is None or (-s, c) < cur:
                best[u] = (-s, c)
        return {u: v[1] for u, v in best.items()}

    home = argmax_per_user(nn)
    work = argmax_per_user(nd)
    users = sorted(set(home) & set(work))
    hx = np.array([home[u] % 96 for u in users], np.float64)
    hy = np.array([home[u] // 96 for u in users], np.float64)
    wx = np.array([work[u] % 96 for u in users], np.float64)
    wy = np.array([work[u] // 96 for u in users], np.float64)
    dist = np.sqrt((hx - wx) * (hx - wx) + (hy - wy) * (hy - wy))
    return pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "home_cell": pa.array([home[u] for u in users], pa.int64()),
            "work_cell": pa.array([work[u] for u in users], pa.int64()),
            "commute_dist": round_like_sql(dist, 6),
        }
    )


def _q_grid_euler(sf_dir: str) -> pa.Table:
    """Euler characteristic of the valid-cell region (4-connectivity:
    V - E + Q counts components minus holes): per-tile partials carry
    the interior vertex/edge/quad counts plus BIT-PACKED boundary
    strips (tile width 48 fits one int64), the driver stitches only
    the O(perimeter) seams -- the halo-free distributed-topology
    pattern."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True))

    def pack(bits: np.ndarray) -> int:
        return int((bits.astype(np.int64) << np.arange(len(bits))).sum())

    def partial(batch: pa.Table) -> pa.Table:
        rows = {
            "r0": [], "c0": [], "v": [], "e": [], "q": [],
            "north": [], "south": [], "west": [], "east": [],
        }
        for i in range(batch.num_rows):
            h = batch["height"][i].as_py()
            w = batch["width"][i].as_py()
            m = (
                np.asarray(batch["values"][i].as_py(), np.float32).reshape(
                    h, w
                )
                > -1e30
            )
            rows["r0"].append(batch["row_off"][i].as_py())
            rows["c0"].append(batch["col_off"][i].as_py())
            rows["v"].append(int(m.sum()))
            rows["e"].append(
                int((m[:, :-1] & m[:, 1:]).sum())
                + int((m[:-1, :] & m[1:, :]).sum())
            )
            rows["q"].append(
                int(
                    (m[:-1, :-1] & m[:-1, 1:] & m[1:, :-1] & m[1:, 1:]).sum()
                )
            )
            rows["north"].append(pack(m[0]))
            rows["south"].append(pack(m[-1]))
            rows["west"].append(pack(m[:, 0]))
            rows["east"].append(pack(m[:, -1]))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )

    t = collect_tables(
        tiles.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    strips = {
        (t["r0"][i].as_py(), t["c0"][i].as_py()): {
            k: t[k][i].as_py()
            for k in ("v", "e", "q", "north", "south", "west", "east")
        }
        for i in range(t.num_rows)
    }

    def unpack(word: int, n: int = 48) -> np.ndarray:
        return (np.int64(word) >> np.arange(n)) & 1

    v_tot = sum(s["v"] for s in strips.values())
    e_tot = sum(s["e"] for s in strips.values())
    q_tot = sum(s["q"] for s in strips.values())
    for (r0, c0), s in strips.items():
        right = strips.get((r0, c0 + OG_TILE))
        if right is not None:  # vertical seam: east col touches west col
            a = unpack(s["east"])
            b = unpack(right["west"])
            e_tot += int((a & b).sum())
            q_tot += int((a[:-1] & a[1:] & b[:-1] & b[1:]).sum())
        below = strips.get((r0 + OG_TILE, c0))
        if below is not None:  # horizontal seam
            a = unpack(s["south"])
            b = unpack(below["north"])
            e_tot += int((a & b).sum())
            q_tot += int((a[:-1] & a[1:] & b[:-1] & b[1:]).sum())
        # corner quad spanning four tiles: the 2x2 block around the
        # shared corner -- this tile's SE cell, right's SW, below's
        # NE, diag's NW
        diag = strips.get((r0 + OG_TILE, c0 + OG_TILE))
        if right is not None and below is not None and diag is not None:
            se = unpack(s["south"])[-1]
            sw_r = unpack(right["south"])[0]
            ne_b = unpack(below["north"])[-1]
            nw_d = unpack(diag["north"])[0]
            if se and sw_r and ne_b and nw_d:
                q_tot += 1
    euler = v_tot - e_tot + q_tot
    return pa.table(
        {
            "n_cells": pa.array([v_tot], pa.int64()),
            "n_edges": pa.array([e_tot], pa.int64()),
            "n_quads": pa.array([q_tot], pa.int64()),
            "euler": pa.array([euler], pa.int64()),
        }
    )


VIEWSHED_OBS = (77.125, 28.875)  # observer lon/lat (clean interior pixel)


def _q_viewshed_counts(sf_dir: str) -> pa.Table:
    """Viewshed from a fixed observer over the sparse DEM: per-target
    line-of-sight with the SAME fixed-step sampling rule as
    stages/raster.py::line_of_sight, fanned out to every lattice cell
    -- the DEM ships once via ray.put, each batch of target cells
    runs the (targets x steps) comparison fully vectorized.  Returns
    one row per cell (visible flag + blocked-sample count)."""
    import ray
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    n_steps = 64
    clearance = 2.0
    a_lon, a_lat = VIEWSHED_OBS
    tiles = _og_tiles_table(sparse_invalid=True)
    z = np.zeros((OG_H, OG_W), np.float64)
    for i in range(tiles.num_rows):
        r0 = tiles["row_off"][i].as_py()
        c0 = tiles["col_off"][i].as_py()
        h = tiles["height"][i].as_py()
        w = tiles["width"][i].as_py()
        z[r0 : r0 + h, c0 : c0 + w] = np.asarray(
            tiles["values"][i].as_py(), np.float32
        ).reshape(h, w)
    valid = z > -1e30
    ref = ray.put((z, valid))

    oc = int(np.floor((a_lon - 77.0) / 0.01))
    orow = int(np.floor((29.0 - a_lat) / 0.01))
    za = (float(z[orow, oc]) if valid[orow, oc] else 0.0) + clearance

    rr, cc = np.meshgrid(np.arange(OG_H), np.arange(OG_W), indexing="ij")
    targets = pa.table(
        {
            "row": pa.array(rr.ravel().astype(np.int64)),
            "col": pa.array(cc.ravel().astype(np.int64)),
        }
    )

    def los(batch: pa.Table) -> pa.Table:
        zg, vg = ray.get(ref)
        row = batch["row"].to_numpy(zero_copy_only=False)
        col = batch["col"].to_numpy(zero_copy_only=False)
        b_lon = 77.0 + 0.01 * (col.astype(np.float64) + 0.5)
        b_lat = 29.0 - 0.01 * (row.astype(np.float64) + 0.5)
        tz = np.where(vg[row, col], zg[row, col], 0.0)
        zb = tz + clearance
        i = np.arange(n_steps, dtype=np.float64)
        t = (i + 1.0) / (n_steps + 1.0)
        lon_t = a_lon + t[None, :] * (b_lon[:, None] - a_lon)
        lat_t = a_lat + t[None, :] * (b_lat[:, None] - a_lat)
        cols = np.floor((lon_t - 77.0) / 0.01).astype(np.int64)
        rows = np.floor((29.0 - lat_t) / 0.01).astype(np.int64)
        inb = (rows >= 0) & (rows < OG_H) & (cols >= 0) & (cols < OG_W)
        zs = np.zeros_like(lon_t)
        ok = np.zeros(lon_t.shape, bool)
        zs[inb] = zg[rows[inb], cols[inb]]
        ok[inb] = vg[rows[inb], cols[inb]]
        height = za + t[None, :] * (zb[:, None] - za)
        blocked = ok & (zs > height)
        nb = blocked.sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "row": batch["row"],
                "col": batch["col"],
                "visible": pa.array((nb == 0).astype(np.int64)),
                "n_blocked": pa.array(nb),
            }
        )

    ds = ray.data.from_arrow(targets)
    return collect_tables(
        ds.map_batches(los, batch_format="pyarrow", batch_size=None)
    ).sort_by([("row", "ascending"), ("col", "ascending")])


def _q_hist_match_lut(sf_dir: str) -> pa.Table:
    """Histogram matching between the two multiband-fixture bands
    (the radiometric-normalization LUT for mosaicking): per-level
    counts via the combiner tier, the CDF comparison cross-multiplied
    (cdf2 * n1 >= cdf1 * n2) so the whole LUT is exact integer
    arithmetic -- no floats anywhere."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def levels(batch: pa.Table) -> pa.Table:
        bands = batch["band"].to_numpy(zero_copy_only=False)
        vals = batch["values"]
        out_b, out_k, out_n = [], [], []
        for i in range(batch.num_rows):
            v = np.asarray(vals[i].as_py(), np.float32)
            vv = v[v > -1e30].astype(np.float64)
            k = np.round(vv * 10.0).astype(np.int64)
            ks, cs = np.unique(k, return_counts=True)
            out_b.extend([int(bands[i])] * len(ks))
            out_k.extend(ks.tolist())
            out_n.extend(cs.astype(np.int64).tolist())
        return pa.table(
            {
                "band": pa.array(out_b, pa.int64()),
                "k": pa.array(out_k, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(levels, batch_format="pyarrow", batch_size=None),
        ["band", "k"],
        [("n", "sum", "n")],
    )
    band = agg["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    kk = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    def cdf_of(b: int):
        sel = band == b
        order = np.argsort(kk[sel])
        ks = kk[sel][order]
        cdf = np.cumsum(nn[sel][order])
        return ks, cdf, int(cdf[-1])

    k1, cdf1, n1 = cdf_of(1)
    k2, cdf2, n2 = cdf_of(2)
    # smallest band-2 level with cdf2 * n1 >= cdf1 * n2 (exact int)
    pos = np.searchsorted(cdf2 * n1, cdf1 * n2, side="left")
    tgt = k2[np.minimum(pos, len(k2) - 1)]
    return pa.table(
        {
            "src_k": pa.array(k1),
            "tgt_k": pa.array(tgt.astype(np.int64)),
        }
    )


def _q_welch_ttest(sf_dir: str) -> pa.Table:
    """Welch's unequal-variance t-test on event value cents between
    the two mix32 experiment arms (the means counterpart of the
    proportions ab_ztest): exact int64 moment sums per arm, the
    t statistic and Welch-Satterthwaite df as one shared float
    expression chain."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "arm": pa.array(mix32(uid, 13) % 2),
                "_one": pa.array(np.ones(len(uid), np.int64)),
                "s": pa.array(c),
                "q": pa.array(c * c),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["arm"],
        [("_one", "sum", "n"), ("s", "sum", "s"), ("q", "sum", "q")],
    ).sort_by("arm")
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = agg["s"].to_numpy(zero_copy_only=False).astype(np.float64)
    q = agg["q"].to_numpy(zero_copy_only=False).astype(np.float64)
    mean = s / n
    var = (q - n * mean * mean) / (n - 1.0)
    se2 = var[0] / n[0] + var[1] / n[1]
    t = (mean[0] - mean[1]) / np.sqrt(se2)
    df = (se2 * se2) / (
        (var[0] / n[0]) * (var[0] / n[0]) / (n[0] - 1.0)
        + (var[1] / n[1]) * (var[1] / n[1]) / (n[1] - 1.0)
    )
    return pa.table(
        {
            "n_a": pa.array([int(n[0])], pa.int64()),
            "n_b": pa.array([int(n[1])], pa.int64()),
            "mean_diff": round_like_sql([float(mean[0] - mean[1])], 6),
            "t_stat": round_like_sql([float(t)], 6),
            "welch_df": round_like_sql([float(df)], 6),
        }
    )


def _q_periodogram_daily(sf_dir: str) -> pa.Table:
    """Discrete-Fourier power of the daily event-count series at the
    7/14/30-day candidate periods (the seasonality spectrum probe):
    dense calendar series from the combiner tier, per-day cos/sin
    terms quantized at 1e6 so each frequency's sums are exact int64,
    power = (C^2 + S^2) / n."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    periods = (7, 14, 30)
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "d": pa.array(us // 86_400_000_000),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    ).sort_by("d")
    d = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xs = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(d[0]), int(d[-1])
    n = hi - lo + 1
    x = np.zeros(n, np.int64)
    x[d - lo] = xs
    t = np.arange(n, dtype=np.float64)
    out_p, out_w = [], []
    for p in periods:
        theta = 2.0 * np.pi * t / float(p)
        cq = int(
            round_half_away(x.astype(np.float64) * np.cos(theta) * 1e6)
            .astype(np.int64)
            .sum()
        )
        sq = int(
            round_half_away(x.astype(np.float64) * np.sin(theta) * 1e6)
            .astype(np.int64)
            .sum()
        )
        c = float(cq) / 1e6
        sv = float(sq) / 1e6
        out_p.append(p)
        out_w.append((c * c + sv * sv) / float(n))
    return pa.table(
        {
            "period_days": pa.array(out_p, pa.int64()),
            "power": round_like_sql(out_w, 6),
        }
    )


def _q_nelson_aalen(sf_dir: str) -> pa.Table:
    """Nelson-Aalen cumulative hazard for time-to-first-error (the
    additive sibling of Kaplan-Meier, same right-censored durations):
    per-time d_i/n_i terms quantized at 1e12 so the hazard prefix sum
    is an exact int64 in time order, one float division per row."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        tnp = ts.to_numpy(zero_copy_only=False)
        is_ev = pa.compute.equal(batch["event_type"], "error")
        big = np.int64(2**62)
        evt = np.where(is_ev.to_numpy(zero_copy_only=False), tnp, big)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "t0": pa.array(tnp),
                "tlast": pa.array(tnp),
                "terr": pa.array(evt),
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("t0", "min", "t0"), ("tlast", "max", "tlast"),
         ("terr", "min", "terr")],
    )
    t0 = peru["t0"].to_numpy(zero_copy_only=False)
    tlast = peru["tlast"].to_numpy(zero_copy_only=False)
    terr = peru["terr"].to_numpy(zero_copy_only=False)
    big = np.int64(2**62)
    observed = terr < big
    dur = np.where(observed, terr - t0, tlast - t0)
    dsort = np.sort(dur)
    ev_times, d_counts = np.unique(dur[observed], return_counts=True)
    n_at_risk = len(dur) - np.searchsorted(dsort, ev_times, side="left")
    tq = round_half_away(
        d_counts.astype(np.float64) / n_at_risk.astype(np.float64) * 1e12
    ).astype(np.int64)
    cum = np.cumsum(tq).astype(np.float64) / 1e12
    return pa.table(
        {
            "t_us": pa.array(ev_times.astype(np.int64)),
            "n_at_risk": pa.array(n_at_risk.astype(np.int64)),
            "n_events": pa.array(d_counts.astype(np.int64)),
            "cum_hazard": round_like_sql(cum, 6),
        }
    )


def _q_bootstrap_ci(sf_dir: str) -> pa.Table:
    """Deterministic bootstrap CI for the mean events-per-user: 200
    mix32-indexed resamples of the per-user count vector (bounded by
    users, not events), each replicate's sum an exact int64, the 95%
    interval read off order statistics (ranks 5 and 195 of 200) --
    resampling inference with a bit-reproducible RNG the SQL oracle
    replays."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    B = 200
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])

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
        [("_one", "sum", "cnt")],
    ).sort_by("user_id")
    cnt = agg["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(cnt)
    b = np.repeat(np.arange(B, dtype=np.int64), m)
    i = np.tile(np.arange(m, dtype=np.int64), B)
    idx = mix32(b * m + i, 7) % m
    sums = np.zeros(B, np.int64)
    np.add.at(sums, b, cnt[idx])
    order = np.argsort(sums, kind="stable")  # ties: by replicate id
    lo_sum = int(sums[order[4]])
    hi_sum = int(sums[order[B - 6]])
    return pa.table(
        {
            "mean": round_like_sql([float(int(cnt.sum())) / float(m)], 6),
            "boot_lo": round_like_sql([float(lo_sum) / float(m)], 6),
            "boot_hi": round_like_sql([float(hi_sum) / float(m)], 6),
        }
    )


def _q_harmonic_price(sf_dir: str) -> pa.Table:
    """Harmonic mean retail price per brand (the rate-averaging mean):
    reciprocal terms quantized at 1e12 so the distributed sum is an
    exact int64 in any combine order, one float division per brand."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_brand", "p_retailprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        price = batch["p_retailprice"].to_numpy(zero_copy_only=False)
        tq = round_half_away((1.0 / price) * 1e12).astype(np.int64)
        return pa.table(
            {
                "p_brand": batch["p_brand"],
                "_one": pa.array(np.ones(len(price), np.int64)),
                "tq": pa.array(tq),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["p_brand"],
        [("_one", "sum", "n"), ("tq", "sum", "sum_tq")],
    ).sort_by("p_brand")
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = agg["sum_tq"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "p_brand": agg["p_brand"],
            "harmonic_mean": round_like_sql(n / (s / 1e12), 6),
        }
    )


def _q_char_entropy(sf_dir: str) -> pa.Table:
    """Per-document character entropy (nats) -- the gibberish /
    low-diversity text screen: code points via a zero-copy utf-32
    view (no Python char loop), per-char n*ln(n) terms quantized at
    1e12 so the cross-char sum is exact, entropy = ln(N) - sum/N."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def ent(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_e = np.empty(len(ids), np.float64)
        for i, t in enumerate(batch["text"].to_pylist()):
            cp = np.frombuffer(t.encode("utf-32-le"), np.uint32)
            _, c = np.unique(cp, return_counts=True)
            c = c.astype(np.float64)
            acc = int(
                round_half_away(c * np.log(c) * 1e12).astype(np.int64).sum()
            )
            nc = float(len(cp))
            out_e[i] = np.log(nc) - (float(acc) / 1e12) / nc
        return pa.table(
            {"doc_id": pa.array(ids), "entropy": round_like_sql(out_e, 6)}
        )

    return collect_tables(
        ds.map_batches(ent, batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")


def _q_rayleigh_hours(sf_dir: str) -> pa.Table:
    """Rayleigh test of hour-of-day uniformity per event type
    (circular statistics: mean resultant length R and z = n R^2):
    per-(type, hour) counts via the combiner tier, the 24 cos/sin
    terms quantized at 1e6 so the circular sums are exact int64."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
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
    ty = agg["event_type"].to_numpy(zero_copy_only=False)
    h = agg["h"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    theta = 2.0 * np.pi * h / 24.0
    tqc = round_half_away(n.astype(np.float64) * np.cos(theta) * 1e6).astype(
        np.int64
    )
    tqs = round_half_away(n.astype(np.float64) * np.sin(theta) * 1e6).astype(
        np.int64
    )
    out_t, out_n, out_r, out_z = [], [], [], []
    for t in sorted(set(ty.tolist())):
        sel = ty == t
        nn = int(n[sel].sum())
        c = float(int(tqc[sel].sum())) / 1e6
        s = float(int(tqs[sel].sum())) / 1e6
        r = np.sqrt(c * c + s * s) / float(nn)
        out_t.append(t)
        out_n.append(nn)
        out_r.append(float(r))
        out_z.append(float(nn) * float(r) * float(r))
    return pa.table(
        {
            "event_type": pa.array(out_t),
            "n": pa.array(out_n, pa.int64()),
            "r_bar": round_like_sql(out_r, 6),
            "rayleigh_z": round_like_sql(out_z, 6),
        }
    )


def _q_mann_kendall(sf_dir: str) -> pa.Table:
    """Mann-Kendall trend test per 16x16 quadrat over the dense daily
    count series (the 'emerging hotspot' detector in space-time
    cubes): the S statistic is an exact int64 pairwise-sign sum, the
    tie-corrected variance comes from integer tie-group moments, and
    z is the single shared float expression.  Per-(quadrat, day)
    counts distribute; the 256 x days matrix is calendar-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        qx = (eid % 96) // 6
        qy = ((eid // 96) % 96) // 6
        return pa.table(
            {
                "q": pa.array(qy * 16 + qx),
                "d": pa.array(us // 86_400_000_000),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["q", "d"],
        [("_one", "sum", "x")],
    )
    qs = agg["q"].to_numpy(zero_copy_only=False).astype(np.int64)
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xx = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    mat = np.zeros((256, n), np.int64)
    mat[qs, dd - lo] = xx
    diff = np.sign(mat[:, None, :] - mat[:, :, None])  # (256, i, j)
    iu = np.triu_indices(n, k=1)
    s_stat = diff[:, iu[0], iu[1]].sum(axis=1).astype(np.int64)
    out_q, out_s, out_z = [], [], []
    for q in range(256):
        _, tcounts = np.unique(mat[q], return_counts=True)
        t_corr = int((tcounts * (tcounts - 1) * (2 * tcounts + 5)).sum())
        var = (float(n * (n - 1) * (2 * n + 5)) - float(t_corr)) / 18.0
        s = int(s_stat[q])
        if s > 0:
            z = (float(s) - 1.0) / np.sqrt(var)
        elif s < 0:
            z = (float(s) + 1.0) / np.sqrt(var)
        else:
            z = 0.0
        out_q.append(q)
        out_s.append(s)
        out_z.append(float(z))
    return pa.table(
        {
            "quadrat": pa.array(out_q, pa.int64()),
            "s_stat": pa.array(out_s, pa.int64()),
            "mk_z": round_like_sql(out_z, 6),
        }
    )


def _q_local_moran(sf_dir: str) -> pa.Table:
    """Local Moran's I (LISA, Anselin 1995) per lattice cell over the
    event density field: the hotspot/outlier detector behind every
    cluster map.  Rewritten so every sum is an exact int64 -- the
    neighbor VALUE sum replaces the neighbor deviation sum
    (s_nb - k*mu algebraically), the global variance comes from
    integer moments -- and the only floats are one shared expression
    per cell."""
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
    grid = np.zeros((96, 96), np.int64)
    gx = counts["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
    gy = counts["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
    grid[gy, gx] = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_nb = np.zeros((96, 96), np.int64)
    s_nb[:, 1:] += grid[:, :-1]
    s_nb[:, :-1] += grid[:, 1:]
    s_nb[1:, :] += grid[:-1, :]
    s_nb[:-1, :] += grid[1:, :]
    k = np.full((96, 96), 4, np.int64)
    k[0, :] -= 1
    k[-1, :] -= 1
    k[:, 0] -= 1
    k[:, -1] -= 1
    nn = 9216.0
    s_tot = int(grid.sum())
    q_tot = int((grid * grid).sum())
    mu = float(s_tot) / nn
    m2 = (float(q_tot) - nn * mu * mu) / nn
    li = (
        (grid.astype(np.float64) - mu)
        * (s_nb.astype(np.float64) - k.astype(np.float64) * mu)
        / m2
    )
    yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
    return pa.table(
        {
            "gx": pa.array(xx.ravel().astype(np.int64)),
            "gy": pa.array(yy.ravel().astype(np.int64)),
            "local_i": round_like_sql(li.ravel(), 6),
        }
    )


def _q_quadrat_test(sf_dir: str) -> pa.Table:
    """Quadrat chi-square test for complete spatial randomness: event
    counts in 16x16 lattice quadrats (6x6 cells each), chi^2 against
    the uniform expectation from expanded integer moments
    (Q - 2mS + 256 m^2)/m so no per-quadrat float sum exists."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def quad(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = (eid % 96) // 6
        qy = ((eid // 96) % 96) // 6
        return pa.table(
            {
                "q": pa.array(qy * 16 + qx),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(quad, batch_format="pyarrow", batch_size=None),
        ["q"],
        [("_one", "sum", "n")],
    )
    n_q = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = int(n_q.sum())
    q2 = int((n_q * n_q).sum())  # absent quadrats contribute 0
    m = float(s) / 256.0
    chi2 = (float(q2) - 2.0 * m * float(s) + 256.0 * m * m) / m
    return pa.table(
        {
            "n_events": pa.array([s], pa.int64()),
            "chi2": round_like_sql([chi2], 6),
            "df": pa.array([255], pa.int64()),
        }
    )


def _q_clamped_balance(sf_dir: str) -> pa.Table:
    """Clamped-at-zero running balance per user (warehouse /
    prepaid-credit semantics: deposits +cents on even events,
    withdrawals -cents on odd): the sequential recurrence
    y_t = max(0, y_{t-1} + d_t) vectorizes through the prefix-min
    identity y_t = P_t - min(0, min_{s<=t} P_s), so both the engine
    (cummin over the ordered per-user group) and the SQL window
    mirror stay exact int64 with NO recursion."""
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
        floor = np.minimum(np.minimum.accumulate(p), 0)
        y = p - floor
        uid = group["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid], group["user_id"].type),
                "final_balance": pa.array([int(y[-1])], pa.int64()),
                "max_balance": pa.array([int(y.max())], pa.int64()),
            }
        )

    out = grouped_by_key(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id",
        per_user,
    )
    return collect_tables(out).sort_by("user_id")


def _q_gearys_c(sf_dir: str) -> pa.Table:
    """Geary's C spatial autocorrelation (rook weights) of the event
    density field on the 96x96 geocode lattice -- the local-contrast
    complement to Moran's I.  Unlike Moran's cross-products, Geary's
    numerator sum w_ij (x_i - x_j)^2 is an exact int64 over integer
    counts, so the whole statistic is order-independent: distributed
    per-cell counts (lattice-bounded), dense integer shifts, one
    shared float expression at the end."""
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
    grid = np.zeros((96, 96), np.int64)
    gx = counts["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
    gy = counts["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
    grid[gy, gx] = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    dh = grid[:, :-1] - grid[:, 1:]
    dv = grid[:-1, :] - grid[1:, :]
    num = 2 * int((dh * dh).sum()) + 2 * int((dv * dv).sum())
    s_tot = int(grid.sum())
    q_tot = int((grid.astype(np.int64) ** 2).sum())
    nn = 9216.0
    w = 36480.0  # 2 * (96*95 + 96*95) rook pairs, both directions
    mu = float(s_tot) / nn
    den = float(q_tot) - nn * mu * mu
    c = ((nn - 1.0) * float(num)) / ((2.0 * w) * den)
    return pa.table({"gearys_c": round_like_sql([c], 6)})


def _q_hist_intersection(sf_dir: str) -> pa.Table:
    """Histogram-intersection similarity between every pair of
    sources' language distributions (sum over langs of min share) --
    the bounded-sum cousin of KL divergence; per-lang min terms
    quantized at 1e12 so the cross-language sum is an exact int64."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "lang"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["source", "lang"],
        [("_one", "sum", "n_sl")],
    )
    src = agg["source"].to_numpy(zero_copy_only=False)
    lang = agg["lang"].to_numpy(zero_copy_only=False)
    n_sl = agg["n_sl"].to_numpy(zero_copy_only=False).astype(np.int64)
    per: dict[str, dict[str, int]] = {}
    tot: dict[str, int] = {}
    for s, l, c in zip(src.tolist(), lang.tolist(), n_sl.tolist()):
        per.setdefault(s, {})[l] = c
        tot[s] = tot.get(s, 0) + c
    out_a, out_b, out_v = [], [], []
    srcs = sorted(per)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            acc = 0
            for l in per[a]:
                if l in per[b]:
                    term = min(
                        float(per[a][l]) / float(tot[a]),
                        float(per[b][l]) / float(tot[b]),
                    )
                    acc += int(round_half_away(np.float64(term * 1e12)))
            out_a.append(a)
            out_b.append(b)
            out_v.append(float(acc) / 1e12)
    return pa.table(
        {
            "source_a": pa.array(out_a),
            "source_b": pa.array(out_b),
            "overlap": round_like_sql(out_v, 6),
        }
    )
