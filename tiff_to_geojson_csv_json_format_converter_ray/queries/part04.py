"""Query implementations, part 04 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: holt_linear, holt_winters, dispersion_ellipse, kl_divergence, ripley_k, acf_lags, zorder_cells, phrase_search, kendall_tau, theil_index, track_intersections, runs_test, wilcoxon_signed, clustering_coeff, kcore_words, brier_decomposition, seasonal_decompose, min_cost_supplier, chow_test, symspell_pairs, seq_edit_distance, did_estimator, mean_direction, hoover_index, cdc_chunks, route_shortest_path, polygon_perimeter, quadkey_cells, q3_shipping_priority, q5_local_revenue, dispersion_index, grubbs_test, burrows_delta, pps_systematic, haar_energy, cell_week_churn, bayes_rate_smoothing, jaro_winkler_pairs, sprt_crossing, rbo_overlap ...
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
    _og_tiles_table,
    _read_pq,
)


def _q_holt_linear(sf_dir: str) -> pa.Table:
    """Holt double-exponential smoothing (alpha=0.3, gamma=0.1) of the
    daily event-count series: counts via the combiner tier, the
    calendar-bounded recursion on the driver -- level/trend updates
    written as the exact float expressions the recursive-CTE oracle
    repeats, so every intermediate state matches bit-for-bit."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

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
    level = float(x[0])
    trend = float(x[1]) - float(x[0])
    for t in range(1, n):
        xt = float(x[t])
        new_level = (0.3 * xt) + (0.7 * (level + trend))
        trend = (0.1 * (new_level - level)) + (0.9 * trend)
        level = new_level
    return pa.table(
        {
            "level": round_like_sql([level], 6),
            "trend": round_like_sql([trend], 6),
            "forecast_7": round_like_sql([level + 7.0 * trend], 6),
        }
    )


def _q_holt_winters(sf_dir: str) -> pa.Table:
    """Holt-Winters ADDITIVE triple-exponential smoothing (alpha=0.3,
    beta=0.1, gamma=0.2, weekly season m=7) of the daily event-count
    series: counts via the combiner tier, the calendar-bounded
    recursion on the driver.  Init: level = mean of season 1, trend =
    (sum season 2 - sum season 1)/49, seasonals = first-week
    deviations.  Every update is written as the exact float
    expression the recursive-CTE oracle repeats (the oracle carries
    the 7 live seasonal states as a LIST column), so all
    intermediates match bit-for-bit."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

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
    sum1 = int(x[:7].sum())
    sum2 = int(x[7:14].sum())
    level = float(sum1) / 7.0
    trend = (float(sum2) - float(sum1)) / 49.0
    seas = [float(x[i]) - (float(sum1) / 7.0) for i in range(7)]
    for t in range(7, n):
        xt = float(x[t])
        s_tm = seas[t - 7]
        new_level = (0.3 * (xt - s_tm)) + (0.7 * (level + trend))
        new_trend = (0.1 * (new_level - level)) + (0.9 * trend)
        seas.append((0.2 * (xt - new_level)) + (0.8 * s_tm))
        level, trend = new_level, new_trend
    return pa.table(
        {
            "level": round_like_sql([level], 6),
            "trend": round_like_sql([trend], 6),
            "forecast_1": round_like_sql([level + trend + seas[n - 7]], 6),
        }
    )


def _q_dispersion_ellipse(sf_dir: str) -> pa.Table:
    """Standard deviational ellipse per user (the point-dispersion
    summary GIS packages ship): exact int64 lattice moments via the
    combiner tier, 2x2 covariance eigen-decomposition in closed form,
    orientation from atan2 -- one shared float expression chain, so
    the SQL oracle reproduces axes and angle exactly."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = eid % 96
        gy = (eid // 96) % 96
        return pa.table(
            {
                "user_id": batch["user_id"],
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "sx": pa.array(gx),
                "sy": pa.array(gy),
                "sxx": pa.array(gx * gx),
                "syy": pa.array(gy * gy),
                "sxy": pa.array(gx * gy),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [
            ("_one", "sum", "n"),
            ("sx", "sum", "sx"),
            ("sy", "sum", "sy"),
            ("sxx", "sum", "sxx"),
            ("syy", "sum", "syy"),
            ("sxy", "sum", "sxy"),
        ],
    ).sort_by("user_id")
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = agg["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sy = agg["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxx = agg["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
    syy = agg["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxy = agg["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
    mux = sx / n
    muy = sy / n
    cxx = sxx / n - mux * mux
    cyy = syy / n - muy * muy
    cxy = sxy / n - mux * muy
    tr2 = (cxx + cyy) / 2.0
    disc = np.sqrt(
        ((cxx - cyy) / 2.0) * ((cxx - cyy) / 2.0) + cxy * cxy
    )
    semi_major = np.sqrt(tr2 + disc)
    semi_minor = np.sqrt(tr2 - disc)
    theta = np.arctan2(2.0 * cxy, cxx - cyy) / 2.0
    return pa.table(
        {
            "user_id": agg["user_id"],
            "semi_major": round_like_sql(semi_major, 6),
            "semi_minor": round_like_sql(semi_minor, 6),
            "theta": round_like_sql(theta, 6),
        }
    )


def _q_kl_divergence(sf_dir: str) -> pa.Table:
    """KL divergence of each source's language mix from the corpus
    mix (the distribution-drift monitor for training-data curation):
    (source, lang) counts via the combiner tier, per-term fixed-point
    quantization at 1e12 (the geomean trick) so the cross-language
    sum is an exact int64 in any order, one float division per
    source.  Uses count ratios inside ln -- at 10^12 rows compute the
    ln argument as (n_sl/n_s)/(n_l/n) to stay in range."""
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
    n = int(n_sl.sum())
    n_s = {}
    n_l = {}
    for s, l, c in zip(src.tolist(), lang.tolist(), n_sl.tolist()):
        n_s[s] = n_s.get(s, 0) + c
        n_l[l] = n_l.get(l, 0) + c
    acc: dict[str, int] = {}
    for s, l, c in zip(src.tolist(), lang.tolist(), n_sl.tolist()):
        term = (
            float(c) / float(n_s[s])
            * np.log(float(c * n) / float(n_s[s] * n_l[l]))
        )
        tq = int(round_half_away(np.float64(term * 1e12)))
        acc[s] = acc.get(s, 0) + tq
    srcs = sorted(acc)
    return pa.table(
        {
            "source": pa.array(srcs),
            "kl_nats": round_like_sql(
                [float(acc[s]) / 1e12 for s in srcs], 6
            ),
        }
    )


def _q_ripley_k(sf_dir: str) -> pa.Table:
    """Ripley's K point-pattern statistic at radii 0.02/0.05/0.10
    over a deterministic 1-in-20 sample of the geocoded events
    (spatial clustering vs CSR, Ripley 1977): the sample matrix is
    the classic ray.put broadcast side, each batch counts its points'
    neighbors against it vectorized, exact int64 pair counts combine,
    one float K-hat expression per radius."""
    import ray
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    radii = (0.02, 0.05, 0.10)
    area = 0.95 * 0.95  # geocode extent span per axis

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        eid = eid[eid % 20 == 0]  # deterministic 1-in-20 sample
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
        out_r, out_c = [], []
        for r in radii:
            # self-pairs (d2 == 0 on the diagonal) excluded: each
            # point sees itself exactly once in the broadcast matrix
            out_r.append(r)
            out_c.append(int((d2 <= r * r).sum()) - len(px))
        return pa.table(
            {
                "radius": pa.array(out_r, pa.float64()),
                "n_pairs": pa.array(out_c, pa.int64()),
            }
        )

    agg = hash_aggregate(
        sample.map_batches(count_pairs, batch_format="pyarrow", batch_size=None),
        ["radius"],
        [("n_pairs", "sum", "n_pairs")],
    ).sort_by("radius")
    pairs = agg["n_pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
    k_hat = area * pairs / float(m * (m - 1))
    return pa.table(
        {
            "radius": agg["radius"],
            "n_pairs": agg["n_pairs"],
            "k_hat": round_like_sql(k_hat, 6),
        }
    )


def _q_acf_lags(sf_dir: str) -> pa.Table:
    """Autocorrelation of the hourly event-count series at lags
    1/2/3/6/12/24 h (the seasonality detector behind traffic
    forecasting): per-hour counts via the combiner tier; the series
    itself is calendar-bounded (hours, not rows), so the driver-side
    ACF over exact int64 moments is scale-safe -- every float enters
    through the one shared expression the SQL mirror repeats."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    lags = (1, 2, 3, 6, 12, 24)
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
    out_l, out_a = [], []
    for h in lags:
        p = int((x[:-h] * x[h:]).sum())
        sa = int(x[:-h].sum())
        sb = int(x[h:].sum())
        num = float(p) - mu * float(sa) - mu * float(sb) + float(n - h) * mu * mu
        den = float(q_tot) - 2.0 * mu * float(s_tot) + float(n) * mu * mu
        out_l.append(h)
        out_a.append(num / den)
    return pa.table(
        {
            "lag": pa.array(out_l, pa.int64()),
            "acf": round_like_sql(out_a, 6),
        }
    )


def _q_zorder_cells(sf_dir: str) -> pa.Table:
    """Morton (z-order) locality key over the valid grid pixels,
    summarized as a 16-way range-partition plan (count + key span per
    bucket) -- the space-filling-curve partitioner that keeps
    spatially-near pixels in the same block at 100 TB (bit interleave
    is pure vectorized integer math; the plan table is O(buckets))."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    pts = _og_points_ds(valid_only=True)

    def key(batch: pa.Table) -> pa.Table:
        pix = batch["pix"].to_numpy(zero_copy_only=False).astype(np.int64)
        row = pix // OG_W
        col = pix % OG_W
        z = np.zeros(len(pix), np.int64)
        for b in range(7):
            z |= ((col >> b) & 1) << (2 * b)
            z |= ((row >> b) & 1) << (2 * b + 1)
        return pa.table(
            {
                "bucket": pa.array(z // 1024),
                "zkey": pa.array(z),
                "_one": pa.array(np.ones(len(pix), np.int64)),
            }
        )

    agg = hash_aggregate(
        pts.map_batches(key, batch_format="pyarrow", batch_size=None),
        ["bucket"],
        [
            ("_one", "sum", "n_pixels"),
            ("zkey", "min", "z_min"),
            ("zkey", "max", "z_max"),
        ],
    )
    return agg.sort_by("bucket")



def _q_phrase_search(sf_dir: str) -> pa.Table:
    """Positional exact phrase search for "row column sort": the
    bit-anchor positional-postings formulation (word k at position p
    emits (doc, p-k, 1<<k); one distributed (doc, anchor) sum; a full
    bitmask is a consecutive occurrence).  Only the three terms'
    postings leave the scan -- see stages/textops.py::phrase_search.
    Output: (doc_id, n_hits) for documents containing the phrase."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        phrase_search,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    t = phrase_search(ds, ["row", "column", "sort"])
    return pa.table(
        {"doc_id": t["doc_id"], "n_hits": t["n_hits"].cast(pa.int64())}
    )



def _q_kendall_tau(sf_dir: str) -> pa.Table:
    """Kendall tau-b per user between event time and value (the
    rank-concordance trend test; completes the rank family next to
    spearman / mann_whitney / kruskal_wallis).  All pair counts --
    concordant, discordant, time ties, value ties -- are exact int64
    computed vectorized per user group in the groupby map_groups tier
    (pairs are user-bounded, never cross keys, so the all-pairs
    kernel is per-group O(n^2) on ~constant n at any corpus size);
    tau-b itself is one shared float expression over those ints."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )

    def per_user(group: pa.Table) -> pa.Table:
        x = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = scaled_int(group["value"], 100.0)
        n = len(x)
        uid = group["user_id"][0].as_py()
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        iu = np.triu_indices(n, 1)
        s = dx[iu] * dy[iu]
        nc = int((s > 0).sum())
        nd = int((s < 0).sum())
        tx = int((dx[iu] == 0).sum())
        ty = int((dy[iu] == 0).sum())
        return pa.table(
            {
                "user_id": pa.array([uid], group["user_id"].type),
                "n": pa.array([n], pa.int64()),
                "nc": pa.array([nc], pa.int64()),
                "nd": pa.array([nd], pa.int64()),
                "tx": pa.array([tx], pa.int64()),
                "ty": pa.array([ty], pa.int64()),
            }
        )

    per = collect_tables(
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    ).sort_by("user_id")
    n = per["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    nc = per["nc"].to_numpy(zero_copy_only=False).astype(np.float64)
    nd = per["nd"].to_numpy(zero_copy_only=False).astype(np.float64)
    tx = per["tx"].to_numpy(zero_copy_only=False).astype(np.float64)
    ty = per["ty"].to_numpy(zero_copy_only=False).astype(np.float64)
    n0 = n * (n - 1.0) / 2.0
    denom = np.sqrt((n0 - tx) * (n0 - ty))
    keep = denom > 0.0
    tau = (nc - nd) / np.where(keep, denom, 1.0)
    t = pa.table(
        {
            "user_id": per["user_id"],
            "nc": per["nc"],
            "nd": per["nd"],
            "tau": round_like_sql(tau, 6),
        }
    )
    return t.filter(pa.array(keep))



def _q_theil_index(sf_dir: str) -> pa.Table:
    """Theil T inequality of per-customer spend, decomposed BETWEEN /
    WITHIN nations (the decomposable inequality index).  Pass 1: exact
    per-customer cents through the distributed groupby tier with the
    nation attached by a broadcast customer lookup; global and
    per-nation totals are exact int64.  Pass 2: each customer's
    x*ln(x/mu) and x*ln(x/mu_g) terms quantized at 1e9 inside
    map_batches (mu / per-nation mu_g broadcast), partial-summed per
    nation -- the corpus never lands on the driver.  Final index
    values are single shared float expressions over the exact sums."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, collect_tables, hash_aggregate, round_like_sql,
    )

    ords = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "cents": pa.array(scaled_int(batch["o_totalprice"], 100.0)),
            }
        )

    lookup = BroadcastLookup(cust, "c_custkey", ["c_nationkey"])
    per_cust = hash_aggregate(
        ords.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
        .map_batches(lookup, batch_format="pyarrow", batch_size=None),
        ["c_custkey", "c_nationkey"],
        [("cents", "sum", "cents")],
        distributed_combine=True,
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        one = np.ones(batch.num_rows, np.int64)
        return pa.table(
            {
                "c_nationkey": batch["c_nationkey"],
                "_one": pa.array(one),
                "cents": batch["cents"],
            }
        ).group_by("c_nationkey").aggregate(
            [("_one", "sum"), ("cents", "sum")]
        ).rename_columns(["c_nationkey", "ng", "sg"])

    nat = hash_aggregate(
        per_cust.map_batches(
            nation_partial, batch_format="pyarrow", batch_size=None
        ),
        ["c_nationkey"],
        [("ng", "sum", "ng"), ("sg", "sum", "sg")],
    ).sort_by("c_nationkey")
    ng = nat["ng"].to_numpy(zero_copy_only=False).astype(np.int64)
    sg = nat["sg"].to_numpy(zero_copy_only=False).astype(np.int64)
    nk = nat["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tot = int(ng.sum())
    s_tot = int(sg.sum())
    mu = (float(s_tot) / 100.0) / float(n_tot)
    mu_g = {
        int(k): (float(s) / 100.0) / float(n)
        for k, n, s in zip(nk, ng, sg)
    }

    def term_partial(batch: pa.Table) -> pa.Table:
        x = batch["cents"].to_numpy(zero_copy_only=False).astype(
            np.float64
        ) / 100.0
        nkb = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        mug = np.array([mu_g[int(k)] for k in np.unique(nkb)])
        mug_row = np.empty(len(nkb), np.float64)
        for k in np.unique(nkb):
            mug_row[nkb == k] = mu_g[int(k)]
        q_tot = round_half_away(x * np.log(x / mu) * 1e9).astype(np.int64)
        q_win = round_half_away(x * np.log(x / mug_row) * 1e9).astype(
            np.int64
        )
        return pa.table(
            {
                "c_nationkey": pa.array(nkb),
                "q_tot": pa.array(q_tot),
                "q_win": pa.array(q_win),
            }
        ).group_by("c_nationkey").aggregate(
            [("q_tot", "sum"), ("q_win", "sum")]
        ).rename_columns(["c_nationkey", "q_tot", "q_win"])

    terms = hash_aggregate(
        per_cust.map_batches(
            term_partial, batch_format="pyarrow", batch_size=None
        ),
        ["c_nationkey"],
        [("q_tot", "sum", "q_tot"), ("q_win", "sum", "q_win")],
    ).sort_by("c_nationkey")
    q_tot_sum = int(
        terms["q_tot"].to_numpy(zero_copy_only=False).astype(np.int64).sum()
    )
    q_win_sum = int(
        terms["q_win"].to_numpy(zero_copy_only=False).astype(np.int64).sum()
    )
    qb = round_half_away(
        (sg.astype(np.float64) / 100.0)
        * np.log(np.array([mu_g[int(k)] for k in nk]) / mu)
        * 1e9
    ).astype(np.int64)
    denom = float(n_tot) * mu
    theil_total = (float(q_tot_sum) / 1e9) / denom
    theil_between = (float(int(qb.sum())) / 1e9) / denom
    theil_within = (float(q_win_sum) / 1e9) / denom
    return pa.table(
        {
            "n_customers": pa.array([n_tot], pa.int64()),
            "theil_total": round_like_sql([theil_total], 6),
            "theil_between": round_like_sql([theil_between], 6),
            "theil_within": round_like_sql([theil_within], 6),
        }
    )



def _q_track_intersections(sf_dir: str) -> pa.Table:
    """Self-intersection count per user track (route-quality /
    loop-detection GIS primitive): non-adjacent segment pairs of the
    (ts, event_id)-ordered geocoded track tested with the classic
    exact INTEGER orientation + on-segment predicate (proper and
    improper crossings, incl. collinear touch) -- no epsilon, so the
    SQL CASE mirror is bit-identical.  The all-pairs kernel runs
    vectorized per user inside the groupby map_groups tier: pairs
    never cross keys and per-key track length is ~constant at corpus
    scale, so cost is O(n_users * seg^2 / cluster), not O(corpus^2)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = eid % 96
        y = (eid // 96) % 96
        uid = g["user_id"][0].as_py()
        m = len(eid) - 1  # segments
        if m < 3:
            return pa.table(
                {
                    "user_id": pa.array([uid], pa.int64()),
                    "n_segments": pa.array([max(m, 0)], pa.int64()),
                    "n_crossings": pa.array([0], pa.int64()),
                }
            )
        ax, ay, bx, by = x[:-1], y[:-1], x[1:], y[1:]
        i, j = np.triu_indices(m, 2)  # non-adjacent pairs j >= i+2
        Ax, Ay, Bx, By = ax[i], ay[i], bx[i], by[i]
        Cx, Cy, Dx, Dy = ax[j], ay[j], bx[j], by[j]

        def orient(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (qy - py) * (rx - px)

        d1 = orient(Cx, Cy, Dx, Dy, Ax, Ay)
        d2 = orient(Cx, Cy, Dx, Dy, Bx, By)
        d3 = orient(Ax, Ay, Bx, By, Cx, Cy)
        d4 = orient(Ax, Ay, Bx, By, Dx, Dy)
        proper = (
            ((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
            & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))
        )

        def onseg(px, py, qx, qy, rx, ry):
            return (
                (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
                & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
            )

        touch = (
            ((d1 == 0) & onseg(Cx, Cy, Dx, Dy, Ax, Ay))
            | ((d2 == 0) & onseg(Cx, Cy, Dx, Dy, Bx, By))
            | ((d3 == 0) & onseg(Ax, Ay, Bx, By, Cx, Cy))
            | ((d4 == 0) & onseg(Ax, Ay, Bx, By, Dx, Dy))
        )
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_segments": pa.array([m], pa.int64()),
                "n_crossings": pa.array(
                    [int((proper | touch).sum())], pa.int64()
                ),
            }
        )

    per = collect_tables(
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    )
    return per.sort_by("user_id")



def _q_runs_test(sf_dir: str) -> pa.Table:
    """Wald-Wolfowitz runs test for randomness of the daily event
    volume around its median: daily counts via the combiner tier
    (calendar-bounded series on the driver, like every
    daily-series query); exact lower median by rank, equal-to-median
    days dropped (standard), runs counted over the day order.  The
    z-score normal approximation is one shared float expression over
    the exact integer (n1, n2, runs) triple."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

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
    x = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(x)
    med = int(np.sort(x)[(n - 1) // 2])  # exact lower median
    keep = x != med
    s = (x[keep] > med)
    n1 = int(s.sum())
    n2 = int((~s).sum())
    runs = int(1 + (s[1:] != s[:-1]).sum()) if len(s) else 0
    nn = float(n1 + n2)
    mu = 1.0 + (2.0 * float(n1) * float(n2)) / nn
    var = (
        (2.0 * float(n1) * float(n2))
        * (2.0 * float(n1) * float(n2) - float(n1) - float(n2))
        / (nn * nn * (nn - 1.0))
    )
    z = (float(runs) - mu) / np.sqrt(var)
    return pa.table(
        {
            "n_above": pa.array([n1], pa.int64()),
            "n_below": pa.array([n2], pa.int64()),
            "runs": pa.array([runs], pa.int64()),
            "z": round_like_sql([z], 6),
        }
    )



def _q_wilcoxon_signed(sf_dir: str) -> pa.Table:
    """Wilcoxon signed-rank test per user on consecutive event-value
    pairs (paired before/after deltas in cents): zero diffs dropped
    (standard), |d| ranks tie-averaged and DOUBLED to exact int64
    (2*rank_min + ties - 1, the repo's rank discipline), W+ kept as
    the exact 2x integer; the normal-approximation z is one shared
    float expression.  Runs vectorized per user in the groupby
    map_groups tier (pairing needs per-key order co-location)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        uid = g["user_id"][0].as_py()
        y = scaled_int(g["value"], 100.0)
        m = (len(y) // 2) * 2
        d = y[1:m:2] - y[0:m:2]
        d = d[d != 0]
        n = len(d)
        empty = pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_pairs": pa.array([n], pa.int64()),
                "w_plus_2x": pa.array([0], pa.int64()),
                "z": pa.array([0.0], pa.float64()),
            }
        )
        if n < 2:
            return empty if n == 0 else empty.set_column(
                2, "w_plus_2x",
                pa.array([int((d > 0).sum() * 2)], pa.int64()),
            )
        ad = np.abs(d)
        s = np.sort(ad)
        rank_min = np.searchsorted(s, ad, side="left") + 1
        ties = (
            np.searchsorted(s, ad, side="right")
            - np.searchsorted(s, ad, side="left")
        )
        r2x = 2 * rank_min + ties - 1
        w2x = int(r2x[d > 0].sum())
        nf = float(n)
        mu = nf * (nf + 1.0) / 4.0
        sig = np.sqrt(nf * (nf + 1.0) * (2.0 * nf + 1.0) / 24.0)
        z = (float(w2x) / 2.0 - mu) / sig
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_pairs": pa.array([n], pa.int64()),
                "w_plus_2x": pa.array([w2x], pa.int64()),
                "z": round_like_sql([z], 6),
            }
        )

    per = collect_tables(
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    )
    import pyarrow.compute as pc

    return per.filter(pc.greater_equal(per["n_pairs"], 2)).sort_by(
        "user_id"
    )



def _q_clustering_coeff(sf_dir: str) -> pa.Table:
    """Local clustering coefficient per word of the edit-1 vocabulary
    graph (triangle density around each node -- the standard
    small-world statistic, completing triangles / assortativity /
    rich-club): degree and per-node triangle membership are exact
    integer counts on the vocabulary-bounded edge list; cc =
    2T/(k(k-1)) is the single ROUND per row."""
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
    edges = set(zip(w1, w2))
    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tri: dict[str, int] = {}
    # oriented enumeration a < b < c, matching the triangles oracle
    by_a: dict[str, list] = {}
    for a, b in edges:
        by_a.setdefault(a, []).append(b)
    for a, ns in by_a.items():
        ns = sorted(ns)
        for ii in range(len(ns)):
            for jj in range(ii + 1, len(ns)):
                if (ns[ii], ns[jj]) in edges:
                    for wv in (a, ns[ii], ns[jj]):
                        tri[wv] = tri.get(wv, 0) + 1
    words = sorted(w for w, k in deg.items() if k >= 2)
    ks = np.array([deg[w] for w in words], np.float64)
    ts = np.array([tri.get(w, 0) for w in words], np.float64)
    cc = (2.0 * ts) / (ks * (ks - 1.0))
    return pa.table(
        {
            "word": pa.array(words),
            "degree": pa.array([deg[w] for w in words], pa.int64()),
            "n_triangles": pa.array(
                [tri.get(w, 0) for w in words], pa.int64()
            ),
            "cc": round_like_sql(cc, 6),
        }
    )



def _q_kcore_words(sf_dir: str) -> pa.Table:
    """2-core of the edit-1 vocabulary graph by iterative peeling
    (repeatedly drop degree<2 nodes until fixpoint) -- the classic
    graph-densification primitive behind community seeding.  The
    engine peels the vocabulary-bounded edge list to convergence; the
    SQL mirror unrolls eight peel rounds (assert: the engine verifies
    convergence within eight rounds, so the unroll IS the fixpoint).
    Output: surviving words with their within-core degree."""
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
    edges = set(zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()))
    rounds = 0
    while True:
        deg: dict[str, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {w for w, k in deg.items() if k >= 2}
        new_edges = {
            (a, b) for a, b in edges if a in keep and b in keep
        }
        rounds += 1
        if new_edges == edges:
            break
        edges = new_edges
        if rounds > 8:
            raise RuntimeError(
                "2-core peeling did not converge in 8 rounds; widen the"
                " SQL unroll to match"
            )
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    words = sorted(deg)
    return pa.table(
        {
            "word": pa.array(words),
            "core_degree": pa.array([deg[w] for w in words], pa.int64()),
        }
    )



def _q_brier_decomposition(sf_dir: str) -> pa.Table:
    """Murphy decomposition of the Brier score (reliability /
    resolution / uncertainty) for band 2's deci score predicting band
    1's high-value mask -- the proper-scoring-rule companion to
    calibration_bins.  Per-bin sufficient statistics are exact int64
    (count, positives, score sum, plus the exact integer
    (score - 500*label)^2 sum for the raw Brier numerator); the two
    10-term float bin sums are 1e9-quantized so engine and SQL add
    identical integers."""
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
        qsum = np.zeros(10, np.int64)
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
            b = k2 // 50
            tot += np.bincount(b, minlength=10).astype(np.int64)
            pos += np.bincount(
                b, weights=lab.astype(np.float64), minlength=10
            ).astype(np.int64)
            s_k += np.bincount(
                b, weights=k2.astype(np.float64), minlength=10
            ).astype(np.int64)
            q = (k2 - 500 * lab) ** 2
            qsum += np.bincount(
                b, weights=q.astype(np.float64), minlength=10
            ).astype(np.int64)
        nz = np.flatnonzero(tot)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "tot": pa.array(tot[nz]),
                "pos": pa.array(pos[nz]),
                "s_k": pa.array(s_k[nz]),
                "qsum": pa.array(qsum[nz]),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(per_bin, batch_format="pyarrow", batch_size=None),
        ["bin"],
        [
            ("tot", "sum", "tot"),
            ("pos", "sum", "pos"),
            ("s_k", "sum", "s_k"),
            ("qsum", "sum", "qsum"),
        ],
    )
    tot = agg["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    s_k = agg["s_k"].to_numpy(zero_copy_only=False).astype(np.int64)
    qs = agg["qsum"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(tot.sum())
    npos = int(pos.sum())
    obar = float(npos) / float(n)
    pb = s_k.astype(np.float64) / (500.0 * tot.astype(np.float64))
    ob = pos.astype(np.float64) / tot.astype(np.float64)
    rel_q = round_half_away(
        tot.astype(np.float64) * (pb - ob) * (pb - ob) * 1e9
    ).astype(np.int64)
    res_q = round_half_away(
        tot.astype(np.float64) * (ob - obar) * (ob - obar) * 1e9
    ).astype(np.int64)
    brier = float(int(qs.sum())) / (250000.0 * float(n))
    rel = (float(int(rel_q.sum())) / 1e9) / float(n)
    res = (float(int(res_q.sum())) / 1e9) / float(n)
    unc = obar * (1.0 - obar)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "brier": round_like_sql([brier], 6),
            "reliability": round_like_sql([rel], 6),
            "resolution": round_like_sql([res], 6),
            "uncertainty": round_like_sql([unc], 6),
        }
    )



def _q_seasonal_decompose(sf_dir: str) -> pa.Table:
    """Classical additive seasonal decomposition of the daily event
    series: centered 7-day moving-average trend on the dense calendar
    (exact int window sum / 7.0), per-weekday seasonal index as the
    mean of 1e9-quantized detrended deviations (exact int sums, so
    engine and SQL add identical integers).  Output: one row per
    weekday (epoch-day mod 7) with its seasonal index."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

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
    if n < 7:
        return pa.table(
            {
                "weekday": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
                "seasonal": pa.array([], pa.float64()),
            }
        )
    csum = np.concatenate(([0], np.cumsum(x)))
    win = csum[7:] - csum[:-7]  # exact 7-day sums for t in [3, n-4]
    t_idx = np.arange(3, n - 3, dtype=np.int64)
    trend = win.astype(np.float64) / 7.0
    dq = round_half_away(
        (x[t_idx].astype(np.float64) - trend) * 1e9
    ).astype(np.int64)
    wd = (lo + t_idx) % 7
    sums = np.zeros(7, np.int64)
    cnts = np.zeros(7, np.int64)
    np.add.at(sums, wd, dq)
    np.add.at(cnts, wd, 1)
    keep = cnts > 0
    seasonal = (sums[keep].astype(np.float64) / 1e9) / cnts[
        keep
    ].astype(np.float64)
    return pa.table(
        {
            "weekday": pa.array(np.arange(7, dtype=np.int64)[keep]),
            "n_days": pa.array(cnts[keep]),
            "seasonal": round_like_sql(seasonal, 6),
        }
    )



def _q_min_cost_supplier(sf_dir: str) -> pa.Table:
    """TPC-H Q2-flavoured grouped argmin: for each part, the supplier
    with the smallest total supply cost (sum of discounted price
    cents over its lineitems), deterministic suppkey tie-break.  Two
    distributed levels: per-(part, supplier) exact cents through the
    groupby shuffle tier, then a per-part MIN over cents and suppkey
    PACKED into one int64 (cents * 2^15 + suppkey; the pack is safe
    while per-pair cents < 2^48 -- assert-guarded), so the argmin
    itself is a plain combiner-tier MIN, no per-group sort."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        c = scaled_int(
            np.asarray(p, np.float64) * (1.0 - np.asarray(disc, np.float64)),
            100.0,
        )
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "l_suppkey": batch["l_suppkey"],
                "c": pa.array(c),
            }
        )

    pairs = hash_aggregate(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        ["l_partkey", "l_suppkey"],
        [("c", "sum", "cost_cents")],
        distributed_combine=True,
    )

    def pack(batch: pa.Table) -> pa.Table:
        c = batch["cost_cents"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(c) and (int(c.max()) >= (1 << 48) or int(s.max()) >= (1 << 15)):
            raise AssertionError("argmin pack overflow; widen the pack")
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "packed": pa.array(c * (1 << 15) + s),
            }
        )

    best = hash_aggregate(
        pairs.map_batches(pack, batch_format="pyarrow", batch_size=None),
        ["l_partkey"],
        [("packed", "min", "packed")],
    ).sort_by("l_partkey")
    packed = best["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "l_partkey": best["l_partkey"],
            "l_suppkey": pa.array(packed % (1 << 15)),
            "cost_cents": pa.array(packed >> 15),
        }
    )



def _q_chow_test(sf_dir: str) -> pa.Table:
    """Chow structural-break F-test of the daily event-count linear
    trend at the series midpoint: OLS of x on t over the full dense
    calendar and each half, every SSR computed from exact int64
    moment sums (n, St, Sx, Stt, Stx, Sxx) by the shared closed form
    SSR = (Sxx - Sx^2/n) - (Stx - St*Sx/n)^2 / (Stt - St^2/n); the
    F statistic is one shared float expression (k = 2 params)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

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
    t = np.arange(n, dtype=np.int64)
    half = n // 2

    def ssr(tt: np.ndarray, xx: np.ndarray) -> float:
        nn = float(len(tt))
        st = float(int(tt.sum()))
        sx = float(int(xx.sum()))
        stt = float(int((tt * tt).sum()))
        stx = float(int((tt * xx).sum()))
        sxx = float(int((xx * xx).sum()))
        syy = sxx - sx * sx / nn
        sxy = stx - st * sx / nn
        sxx_c = stt - st * st / nn
        return syy - (sxy * sxy) / sxx_c

    ssr_p = ssr(t, x)
    ssr_1 = ssr(t[:half], x[:half])
    ssr_2 = ssr(t[half:], x[half:])
    k = 2.0
    f = ((ssr_p - ssr_1 - ssr_2) / k) / (
        (ssr_1 + ssr_2) / (float(n) - 2.0 * k)
    )
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "break_day": pa.array([lo + half], pa.int64()),
            "f_stat": round_like_sql([f], 6),
        }
    )



def _q_symspell_pairs(sf_dir: str) -> pa.Table:
    """Edit-distance<=2 fuzzy vocabulary self-join via SymSpell
    deletion blocking (extends the edit-1 deletion-blocked pair
    generation to depth 2): candidates from ONE groupby on the
    deletion-variant key, exact-DP verification -- the oracle's
    brute-force LEVENSHTEIN join doubles as an empirical completeness
    check of the blocking.  See stages/textops.py::symspell_pairs."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        symspell_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    return symspell_pairs(ds, max_dist=2, min_len=4)



def _q_seq_edit_distance(sf_dir: str) -> pa.Table:
    """Behavioral similarity: exact Levenshtein distance between the
    event-type-initial sequences of the 20 most active users (ordered
    per user by ts, event_id).  Sequences are built distributed in the
    groupby map_groups tier; only the top-K strings (deterministic
    count-desc, user-asc cut) reach the driver for the K^2 DP -- the
    corpus itself never does.  Mirrors the SQL STRING_AGG +
    LEVENSHTEIN construction exactly."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _lev,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        seq = "".join(s[0] for s in g["event_type"].to_pylist())
        return pa.table(
            {
                "user_id": pa.array(
                    [g["user_id"][0].as_py()], pa.int64()
                ),
                "n": pa.array([group.num_rows], pa.int64()),
                "seq": pa.array([seq], pa.string()),
            }
        )

    per = collect_tables(
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    ).sort_by([("n", "descending"), ("user_id", "ascending")])
    top = per.slice(0, 20)
    uid = top["user_id"].to_pylist()
    seq = top["seq"].to_pylist()
    order = np.argsort(np.asarray(uid))
    uid = [uid[i] for i in order]
    seq = [seq[i] for i in order]
    u1, u2, dist = [], [], []
    for i in range(len(uid)):
        for j in range(i + 1, len(uid)):
            u1.append(uid[i])
            u2.append(uid[j])
            dist.append(_lev(seq[i], seq[j]))
    return pa.table(
        {
            "u1": pa.array(u1, pa.int64()),
            "u2": pa.array(u2, pa.int64()),
            "dist": pa.array(dist, pa.int64()),
        }
    )



def _q_did_estimator(sf_dir: str) -> pa.Table:
    """Difference-in-differences over the event panel: treatment =
    even user_id (deterministic assignment), post = day >= series
    midpoint, outcome = event value cents.  The 2x2 cell sums are
    exact int64 through the combiner tier; the four means and the DiD
    estimate are one shared float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "d": pa.array(us // 86_400_000_000),
                "treat": pa.array((uid % 2 == 0).astype(np.int64)),
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    # pass 1: day bounds (combiner min/max)
    mm = hash_aggregate(
        prepped.map_batches(
            lambda b: pa.table({"k": pa.array([0] * b.num_rows, pa.int64()),
                                "d": b["d"]}),
            batch_format="pyarrow", batch_size=None,
        ),
        ["k"],
        [("d", "min", "lo"), ("d", "max", "hi")],
    )
    lo = int(mm["lo"][0].as_py())
    hi = int(mm["hi"][0].as_py())
    mid = lo + (hi - lo + 1) // 2

    def cell(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        post = (d >= mid).astype(np.int64)
        return pa.table(
            {
                "treat": batch["treat"],
                "post": pa.array(post),
                "c": batch["c"],
                "_one": batch["_one"],
            }
        )

    agg = hash_aggregate(
        prepped.map_batches(cell, batch_format="pyarrow", batch_size=None),
        ["treat", "post"],
        [("_one", "sum", "n"), ("c", "sum", "s")],
    ).sort_by([("treat", "ascending"), ("post", "ascending")])
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = agg["s"].to_numpy(zero_copy_only=False).astype(np.float64)
    tr = agg["treat"].to_numpy(zero_copy_only=False).astype(np.int64)
    po = agg["post"].to_numpy(zero_copy_only=False).astype(np.int64)
    mean = {}
    for i in range(len(tr)):
        mean[(int(tr[i]), int(po[i]))] = (s[i] / 100.0) / n[i]
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    return pa.table(
        {
            "mean_ctrl_pre": round_like_sql([mean[(0, 0)]], 6),
            "mean_ctrl_post": round_like_sql([mean[(0, 1)]], 6),
            "mean_treat_pre": round_like_sql([mean[(1, 0)]], 6),
            "mean_treat_post": round_like_sql([mean[(1, 1)]], 6),
            "did": round_like_sql([did], 6),
        }
    )



def _q_mean_direction(sf_dir: str) -> pa.Table:
    """Circular mean direction and resultant length per user track
    (the directional-statistics summary next to rayleigh_hours):
    steps classify into D8 sectors by comparisons only (same rule as
    movement_directions), each sector contributes a FIXED-POINT unit
    vector (1e9-scaled integer literals shared verbatim with the SQL
    CASE), so the resultant components are exact int64 sums; the
    final atan2/degrees and Rbar are one shared float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    UX = {
        "E": 1000000000, "NE": 707106781, "N": 0, "NW": -707106781,
        "W": -1000000000, "SW": -707106781, "S": 0, "SE": 707106781,
    }
    UY = {
        "E": 0, "NE": 707106781, "N": 1000000000, "NW": 707106781,
        "W": 0, "SW": -707106781, "S": -1000000000, "SE": -707106781,
    }

    def per_user(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = eid % 96
        y = (eid // 96) % 96
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        adx, ady = np.abs(dx), np.abs(dy)
        moved = (dx != 0) | (dy != 0)
        east = adx > ady
        north = ady > adx
        diag = ~east & ~north
        uxq = np.zeros(len(dx), np.int64)
        uyq = np.zeros(len(dx), np.int64)
        for name, mask in (
            ("E", east & (dx > 0)), ("W", east & (dx < 0)),
            ("N", north & (dy > 0)), ("S", north & (dy < 0)),
            ("NE", diag & (dx > 0) & (dy > 0)),
            ("SE", diag & (dx > 0) & (dy < 0)),
            ("NW", diag & (dx < 0) & (dy > 0)),
            ("SW", diag & (dx < 0) & (dy < 0)),
        ):
            uxq[mask] = UX[name]
            uyq[mask] = UY[name]
        n = int(moved.sum())
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_moves": pa.array([n], pa.int64()),
                "rxq": pa.array([int(uxq[moved].sum())], pa.int64()),
                "ryq": pa.array([int(uyq[moved].sum())], pa.int64()),
            }
        )

    per = collect_tables(
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    ).sort_by("user_id")
    import pyarrow.compute as pc

    per = per.filter(pc.greater(per["n_moves"], 0))
    n = per["n_moves"].to_numpy(zero_copy_only=False).astype(np.float64)
    rx = per["rxq"].to_numpy(zero_copy_only=False).astype(np.float64)
    ry = per["ryq"].to_numpy(zero_copy_only=False).astype(np.float64)
    mean_deg = np.degrees(np.arctan2(ry, rx))
    rbar = np.sqrt(rx * rx + ry * ry) / (n * 1e9)
    return pa.table(
        {
            "user_id": per["user_id"],
            "n_moves": per["n_moves"],
            "mean_dir_deg": round_like_sql(mean_deg, 6),
            "rbar": round_like_sql(rbar, 6),
        }
    )



def _q_hoover_index(sf_dir: str) -> pa.Table:
    """Hoover (Robin Hood) index of event concentration across
    occupied lattice cells -- "what share of events would have to
    move to equalize the cells".  The numerator sum |n*x_i - N| is
    EXACT int64 (no per-cell float shares), so the only float is the
    final division; counts come from one combiner-tier pass over the
    event->cell map."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "cell": pa.array(eid % 9216),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "x")],
    )
    x = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_cells = len(x)
    n_events = int(x.sum())
    num = int(np.abs(n_cells * x - n_events).sum())
    hoover = float(num) / (
        2.0 * float(n_events) * float(n_cells)
    )
    return pa.table(
        {
            "n_cells": pa.array([n_cells], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "hoover": round_like_sql([hoover], 6),
        }
    )



def _q_cdc_chunks(sf_dir: str) -> pa.Table:
    """Content-defined chunking statistics per document (the rolling-
    hash boundary rule behind storage/dedup systems): an 8-char
    window hash S = sum(code_j * P_j) with fixed integer coefficients
    marks a boundary where S % 61 == 0; chunk count = boundaries + 1.
    Every hash is exact int64 (codes < 2^21, coefficients < 2^9, so
    no overflow and no modular ladder); the whole pass is one
    vectorized map_batches -- utf-32 code-point view, per-offset
    strided adds, doc-crossing windows masked by parent id."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    P = np.array([1, 257, 193, 83, 211, 101, 47, 31], np.int64)

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def per_doc(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lens = np.array([len(t) for t in texts], np.int64)
        joined = "".join(texts)
        codes = np.frombuffer(
            joined.encode("utf-32-le"), np.uint32
        ).astype(np.int64)
        total = len(codes)
        ends = np.cumsum(lens)
        starts = ends - lens
        parent = np.repeat(np.arange(len(texts)), lens)
        if total >= 8:
            k = total - 7
            s = np.zeros(k, np.int64)
            for j in range(8):
                s += codes[j:j + k] * P[j]
            # window valid only when fully inside one document
            same = parent[:k] == parent[7:]
            hit = same & (s % 61 == 0)
            nb = np.zeros(len(texts), np.int64)
            np.add.at(nb, parent[:k][hit], 1)
            nw = np.zeros(len(texts), np.int64)
            np.add.at(nw, parent[:k][same], 1)
        else:
            nb = np.zeros(len(texts), np.int64)
            nw = np.zeros(len(texts), np.int64)
        return pa.table(
            {
                "doc_id": pa.array(dids),
                "n_windows": pa.array(nw),
                "n_boundaries": pa.array(nb),
                "n_chunks": pa.array(nb + 1),
            }
        )

    return collect_tables(
        ds.map_batches(per_doc, batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")



def _q_route_shortest_path(sf_dir: str) -> pa.Table:
    """Single-source shortest path over the frozen 8x8 road grid
    (right edge weight ((r*7 + c*13) % 19) + 1, down edge weight
    ((r*11 + c*5) % 17) + 1, undirected, seed node 0) -- distributed
    synchronous Bellman-Ford, one grouped shuffle per relaxation
    round (stages/graph.py::sssp_bellman_ford); 15 rounds covers the
    14-hop diameter.  Every distance is an exact int64; the oracle is
    the recursive min-dist walk over the same formula edges."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.graph import (
        sssp_bellman_ford,
    )

    r, c = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    r, c = r.ravel(), c.ravel()
    right = c < 7
    down = r < 7
    e_node = np.concatenate(
        [(r[right] * 8 + c[right]), (r[down] * 8 + c[down])]
    )
    e_neigh = np.concatenate(
        [(r[right] * 8 + c[right] + 1), ((r[down] + 1) * 8 + c[down])]
    )
    e_w = np.concatenate(
        [
            (r[right] * 7 + c[right] * 13) % 19 + 1,
            (r[down] * 11 + c[down] * 5) % 17 + 1,
        ]
    )
    edges = pa.table(
        {
            "node": pa.array(
                np.concatenate([e_node, e_neigh]), pa.int64()
            ),
            "neigh": pa.array(
                np.concatenate([e_neigh, e_node]), pa.int64()
            ),
            "w": pa.array(np.concatenate([e_w, e_w]), pa.int64()),
        }
    )
    out = sssp_bellman_ford(ray.data.from_arrow(edges), seed=0, rounds=15)
    return collect_tables(out).sort_by("node")



def _q_polygon_perimeter(sf_dir: str) -> pa.Table:
    """Perimeter per fixture polygon: each edge length quantized
    half-away at 1e9 ticks and summed as exact int64 (the
    order-independent term-quantization discipline of
    polygon_centroid), one ROUND at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    pids, perims, nedges = [], [], []
    for pid, poly in OG_POLYGONS.items():
        pts = list(poly)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        total = 0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
            d = np.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
            total += int(round_half_away(np.array([d * 1e9]))[0])
        pids.append(pid)
        perims.append(float(total) / 1e9)
        nedges.append(len(pts))
    return pa.table(
        {
            "polygon_id": pa.array(pids),
            "n_edges": pa.array(nedges, pa.int64()),
            "perimeter": round_like_sql(perims, 6),
        }
    )



def _q_quadkey_cells(sf_dir: str) -> pa.Table:
    """Bing-style quadkey encoding (level 7) of the event lattice --
    the string-prefix cell scheme next to zorder/geohash/quadtree:
    digit k = bit_k(x) + 2*bit_k(y) MSB-first, so a quadkey PREFIX is
    a containing tile.  Pure integer bit math vectorized per batch;
    one combiner-tier count per quadkey."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        x = eid % 96
        y = (eid // 96) % 96
        digits = [
            ((x >> k) & 1) + 2 * ((y >> k) & 1) for k in range(6, -1, -1)
        ]
        qk = sum(
            d * 10 ** (6 - i) for i, d in enumerate(digits)
        )  # digits 0-3 => decimal packing is collision-free
        s = np.char.zfill(qk.astype("U7"), 7)
        return pa.table(
            {
                "quadkey": pa.array(s.tolist(), pa.string()),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["quadkey"],
        [("_one", "sum", "n")],
    )
    return agg.sort_by("quadkey")



def _q_q3_shipping_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q3 analogue (shipping priority): BUILDING-segment
    customers, orders placed before 1998-06-01, lineitems shipped
    after it; revenue cents per (orderkey, orderdate, priority), top
    10 by revenue with deterministic orderkey tie-break.  Lineitem is
    the big side through the size-aware equi_join router; customer
    keys and order attributes ride the broadcast tier; revenue stays
    exact int64 cents end-to-end."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    CUT = np.datetime64("1998-06-01T00:00:00", "us").astype(np.int64)
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    keys = cust.filter(
        pc.equal(cust["c_mktsegment"], "BUILDING")
    )["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keyset = np.sort(keys)

    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path,
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def od_filter(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = (ts < CUT) & (
            keyset[
                np.clip(np.searchsorted(keyset, ck), 0, len(keyset) - 1)
            ]
            == ck
        )
        return batch.filter(pa.array(keep)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    od_f = od.map_batches(od_filter, batch_format="pyarrow", batch_size=None)

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.filter(pa.array(ts > CUT))
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = b["l_discount"].to_numpy(zero_copy_only=False)
        c = scaled_int(
            np.asarray(p, np.float64) * (1.0 - np.asarray(d, np.float64)),
            100.0,
        )
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "c": pa.array(c)}
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od_f, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )
    agg = hash_aggregate(
        joined,
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        [("c", "sum", "revenue_cents")],
    )
    import pyarrow.compute as pc2

    order = pc2.sort_indices(
        agg,
        sort_keys=[
            ("revenue_cents", "descending"), ("l_orderkey", "ascending"),
        ],
    )
    return agg.take(order).slice(0, 10)


def _q_q5_local_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q5 analogue (local-supplier revenue): revenue cents per
    nation over lineitems whose customer and supplier share the
    nation.  Big-big lineitem x orders through the equi_join router;
    customer->nation, supplier->nation and nation-name maps ride the
    broadcast tier; the equality filter runs vectorized per batch --
    the only shuffle is the big join."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(od_path, columns=["o_orderkey", "o_custkey"])
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
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).rename_columns(["o_custkey", "c_nationkey"])
    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).rename_columns(["l_suppkey", "s_nationkey"])
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).rename_columns(["c_nationkey", "n_name"])
    withc = joined.map_batches(
        BroadcastLookup(cust, on="o_custkey", take_cols=["c_nationkey"]),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(
        BroadcastLookup(supp, on="l_suppkey", take_cols=["s_nationkey"]),
        batch_format="pyarrow", batch_size=None,
    )

    def local_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.filter(
            pc.equal(batch["c_nationkey"], batch["s_nationkey"])
        )
        return pa.table({"c_nationkey": b["c_nationkey"], "c": b["c"]})

    filt = withc.map_batches(
        local_only, batch_format="pyarrow", batch_size=None
    )
    agg = hash_aggregate(
        filt, ["c_nationkey"], [("c", "sum", "revenue_cents")]
    )
    named = agg.join(nat, keys="c_nationkey", join_type="inner")
    return named.select(["n_name", "revenue_cents"]).sort_by("n_name")



def _q_dispersion_index(sf_dir: str) -> pa.Table:
    """Variance-to-mean ratio (index of dispersion) of per-cell event
    counts per event type over the FULL 9216-cell lattice frame (the
    Poisson over/under-dispersion screen next to quadrat_test): global
    per-(type, cell) counts through the distributed groupby tier,
    then per-type exact int64 (sum, sum-of-squares) moments -- zero
    cells contribute nothing to either, so the fixed frame size keeps
    them exact.  VMR and chi2 are one shared float expression."""
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
                "s2": pa.array(x * x),
            }
        ).group_by("event_type").aggregate(
            [("s1", "sum"), ("s2", "sum")]
        ).rename_columns(["event_type", "s1", "s2"])

    agg = hash_aggregate(
        per_cell.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["event_type"],
        [("s1", "sum", "s1"), ("s2", "sum", "s2")],
    ).sort_by("event_type")
    N = 9216.0
    s1 = agg["s1"].to_numpy(zero_copy_only=False).astype(np.float64)
    s2 = agg["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
    var = (s2 - s1 * s1 / N) / (N - 1.0)
    mean = s1 / N
    vmr = var / mean
    return pa.table(
        {
            "event_type": agg["event_type"],
            "n_events": agg["s1"],
            "vmr": round_like_sql(vmr, 6),
            "chi2": round_like_sql(vmr * (N - 1.0), 6),
        }
    )


def _q_grubbs_test(sf_dir: str) -> pa.Table:
    """Grubbs maximum-studentized-deviation outlier test on the daily
    event counts: exact int64 (n, sum, sum-of-squares) moments over
    the dense calendar, the deviation |x - mean| and sample s as
    shared float expressions, deterministic smallest-day tie-break
    on the argmax."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

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
    days = lo + np.arange(n, dtype=np.int64)
    s1 = float(int(x.sum()))
    s2 = float(int((x * x).sum()))
    nf = float(n)
    mean = s1 / nf
    s = np.sqrt((s2 - s1 * s1 / nf) / (nf - 1.0))
    dev = np.abs(x.astype(np.float64) - mean)
    order = np.lexsort((days, -dev))
    i = int(order[0])
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "day": pa.array([int(days[i])], pa.int64()),
            "x": pa.array([int(x[i])], pa.int64()),
            "g": round_like_sql([float(dev[i]) / s], 6),
        }
    )



def _q_burrows_delta(sf_dir: str) -> pa.Table:
    """Burrows' Delta authorship distance between sources over the 20
    most frequent corpus words: per-source relative frequencies
    quantized at 1e9 (exact int64 frame incl. zero cells), per-word
    mean/variance from exact integer sums across the 20 sources,
    z-scores as shared float expressions, and each pair's mean |z
    difference| re-quantized at 1e9 before the 20-term sum -- the
    full stylometry pipeline with zero float-accumulation drift."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"],
    )

    def counts(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, "text", "source")
        out = t.group_by(["source", "token"]).aggregate(
            [("token", "count")]
        )
        return out.rename_columns(["source", "token", "cnt"])

    sw = hash_aggregate(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        ["source", "token"],
        [("cnt", "sum", "cnt")],
    )
    src_names = sorted(set(sw["source"].to_pylist()))
    S = len(src_names)
    tok_tot: dict[str, int] = {}
    src_tot: dict[str, int] = {}
    cnt: dict[tuple, int] = {}
    for i in range(sw.num_rows):
        s = sw["source"][i].as_py()
        w = sw["token"][i].as_py()
        c = sw["cnt"][i].as_py()
        tok_tot[w] = tok_tot.get(w, 0) + c
        src_tot[s] = src_tot.get(s, 0) + c
        cnt[(s, w)] = c
    top = sorted(tok_tot, key=lambda w: (-tok_tot[w], w))[:20]
    fq = np.zeros((S, 20), np.int64)
    for si, s in enumerate(src_names):
        tot = float(src_tot[s])
        for wi, w in enumerate(top):
            c = cnt.get((s, w), 0)
            fq[si, wi] = int(
                round_half_away(np.array([float(c) / tot * 1e9]))[0]
            )
    sum1 = fq.sum(axis=0).astype(np.float64)
    sum2 = (fq.astype(object) * fq.astype(object)).sum(axis=0)
    sum2 = np.array([float(v) for v in sum2])
    mu = sum1 / float(S)
    var = (sum2 - sum1 * sum1 / float(S)) / float(S)
    sd = np.sqrt(var)
    z = (fq.astype(np.float64) - mu) / sd
    u1, u2, delta = [], [], []
    for i in range(S):
        for j in range(i + 1, S):
            dq = round_half_away(np.abs(z[i] - z[j]) * 1e9).astype(
                np.int64
            )
            u1.append(src_names[i])
            u2.append(src_names[j])
            delta.append(float(int(dq.sum())) / 1e9 / 20.0)
    return pa.table(
        {
            "s1": pa.array(u1, pa.string()),
            "s2": pa.array(u2, pa.string()),
            "delta": round_like_sql(delta, 6),
        }
    )



def _q_pps_systematic(sf_dir: str) -> pa.Table:
    """Madow systematic probability-proportional-to-size sample of
    n=100 orders by price cents, via a DISTRIBUTED TWO-LEVEL PREFIX
    SCAN: orders bucket by key range, per-bucket sums go through the
    combiner tier, the driver holds only the bucket-offset table
    (broadcast back), and each bucket computes its local ordered
    cumsum in the groupby map_groups tier.  A row is selected when
    floor(cum*n/W) - floor(cum_prev*n/W) >= 1 -- all-int64 threshold
    arithmetic, no float boundaries, deterministic for any
    partitioning.  The scan primitive is the same shape a 100 TB
    global ordered quantile/rank pass needs."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )

    N_SAMPLE = 100
    BUCKET = 1024

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": pa.array(k // BUCKET),
                "o_orderkey": batch["o_orderkey"],
                "c": pa.array(scaled_int(batch["o_totalprice"], 100.0)),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    bsums = hash_aggregate(
        prepped, ["bucket"], [("c", "sum", "s")]
    ).sort_by("bucket")
    bk = bsums["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    bs = bsums["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(bs)[:-1]))
    W = int(bs.sum())
    offset = {int(b): int(o) for b, o in zip(bk, offs)}

    def scan(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("o_orderkey", "ascending")]
        )
        g = group.take(order)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = offset[int(g["bucket"][0].as_py())]
        cum = base + np.cumsum(c)
        prev = cum - c
        hits = (cum * N_SAMPLE) // W - (prev * N_SAMPLE) // W
        keep = hits >= 1
        return pa.table(
            {
                "o_orderkey": pa.array(
                    g["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
                ),
                "cum_cents": pa.array(cum[keep]),
            }
        )

    out = collect_tables(
        prepped.groupby("bucket").map_groups(scan, batch_format="pyarrow")
    )
    return out.sort_by("o_orderkey")



def _q_haar_energy(sf_dir: str) -> pa.Table:
    """Unnormalized Haar wavelet detail energy of the daily event
    series at levels 1-3 (the multi-resolution variance screen next
    to the periodogram): level-j smooth a_j,i = a_{j-1,2i} +
    a_{j-1,2i+1}, detail d_j,i = a_{j-1,2i} - a_{j-1,2i+1}, energy =
    sum d^2 -- EVERY coefficient an exact int64, zero float anywhere.
    Uses the first 2^floor(log2(n)) days of the dense calendar."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

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
    L = int(np.floor(np.log2(n)))
    m = 1 << L
    a = x[:m]
    levels, energies, ncoef = [], [], []
    for j in range(1, 4):
        if len(a) < 2:
            break
        e, o = a[0::2], a[1::2]
        det = e - o
        a = e + o
        levels.append(j)
        energies.append(int((det * det).sum()))
        ncoef.append(len(det))
    return pa.table(
        {
            "level": pa.array(levels, pa.int64()),
            "n_coef": pa.array(ncoef, pa.int64()),
            "energy": pa.array(energies, pa.int64()),
        }
    )


def _q_cell_week_churn(sf_dir: str) -> pa.Table:
    """Week-over-week cell-count churn: per lattice cell the delta
    between the last full epoch week and the one before, top 20
    movers by |delta| (cell tie-break) -- the spatial hot-spot churn
    report, all exact integer counts through one combiner pass."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": pa.array(eid % 9216),
                "week": pa.array(us // (7 * 86_400_000_000)),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell", "week"],
        [("_one", "sum", "n")],
    )
    wk = agg["week"].to_numpy(zero_copy_only=False).astype(np.int64)
    w_last = int(wk.max())
    cells = agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cur: dict[int, int] = {}
    prv: dict[int, int] = {}
    for c, w, nn in zip(cells, wk, ns):
        if w == w_last:
            cur[int(c)] = int(nn)
        elif w == w_last - 1:
            prv[int(c)] = int(nn)
    allc = sorted(set(cur) | set(prv))
    deltas = np.array(
        [cur.get(c, 0) - prv.get(c, 0) for c in allc], np.int64
    )
    carr = np.array(allc, np.int64)
    order = np.lexsort((carr, -np.abs(deltas)))[:20]
    return pa.table(
        {
            "cell": pa.array(carr[order]),
            "n_prev": pa.array(
                np.array([prv.get(int(c), 0) for c in carr[order]],
                         np.int64)
            ),
            "n_last": pa.array(
                np.array([cur.get(int(c), 0) for c in carr[order]],
                         np.int64)
            ),
            "delta": pa.array(deltas[order]),
        }
    )



def _q_bayes_rate_smoothing(sf_dir: str) -> pa.Table:
    """Empirical-Bayes smoothed per-cell purchase rate (the
    small-sample CTR shrinkage every ranking pipeline runs): cell
    counts and purchase counts are exact int64 partials; the global
    prior p0 and each cell's shrunk rate (pos + K*p0) / (n + K) with
    prior strength K=50 are shared float expressions.  Top 20 cells
    by smoothed rate (cell tie-break)."""
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
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": pa.array(eid % 9216),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "pos": pa.array((et == "purchase").astype(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n"), ("pos", "sum", "pos")],
    )
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = agg["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    cells = agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    p0 = float(int(pos.sum())) / float(int(n.sum()))
    K = 50.0
    rate = (pos.astype(np.float64) + K * p0) / (
        n.astype(np.float64) + K
    )
    order = np.lexsort((cells, -rate))[:20]
    return pa.table(
        {
            "cell": pa.array(cells[order]),
            "n": pa.array(n[order]),
            "n_purchase": pa.array(pos[order]),
            "smoothed_rate": round_like_sql(rate[order], 6),
        }
    )



def _jaro(s1: str, s2: str) -> float:
    """Jaro similarity, the exact arithmetic DuckDB's
    jaro_winkler_similarity uses (verified bit-equal over adversarial
    vocab): match window max(l1,l2)//2 - 1, greedy left-to-right
    matching, half-transpositions."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def _q_jaro_winkler_pairs(sf_dir: str) -> pa.Table:
    """Entity-resolution scoring: Jaro-Winkler similarity over all
    source-name pairs (vocabulary-bounded like the word-graph ops),
    keeping pairs >= 0.8.  The engine's JW replicates DuckDB's exact
    float arithmetic (boost threshold 0.7, prefix scale 0.1, max
    prefix 4) -- probed bit-equal before this oracle was pinned."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vocab = sorted(
        w for w in distinct(ds, ["source"])["source"].to_pylist()
        if w is not None
    )
    w1, w2, sim = [], [], []
    for i in range(len(vocab)):
        for j in range(i + 1, len(vocab)):
            a, b = vocab[i], vocab[j]
            jv = _jaro(a, b)
            if jv > 0.7:
                l = 0
                for ca, cb in zip(a[:4], b[:4]):
                    if ca == cb:
                        l += 1
                    else:
                        break
                jv = jv + l * 0.1 * (1.0 - jv)
            if jv >= 0.8:
                w1.append(a)
                w2.append(b)
                sim.append(jv)
    return pa.table(
        {
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "jw": round_like_sql(sim, 6),
        }
    )



def _q_sprt_crossing(sf_dir: str) -> pa.Table:
    """Wald SPRT over the daily above-median indicator sequence
    (p1=0.55 vs p0=0.45, A=B=19): each day contributes +/-q where q =
    round(ln(11/9) * 1e9) is a shared INTEGER literal, so the
    log-likelihood-ratio path is an exact int64 cumsum; the crossing
    day and decision are pure integer comparisons.  Sequential
    testing with zero float state."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    Q = 200670695  # round(ln(0.55/0.45) * 1e9)
    THR = 2944438979  # round(ln(19) * 1e9)

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
    med = int(np.sort(x)[(n - 1) // 2])
    llr = np.where(x > med, Q, -Q).astype(np.int64)
    cum = np.cumsum(llr)
    up = cum >= THR
    dn = cum <= -THR
    hit = np.flatnonzero(up | dn)
    if len(hit):
        i = int(hit[0])
        day = lo + i
        decision = "accept_p1" if up[i] else "accept_p0"
        llr_q = int(cum[i])
    else:
        day, decision, llr_q = -1, "undecided", int(cum[-1])
    return pa.table(
        {
            "crossing_day": pa.array([day], pa.int64()),
            "decision": pa.array([decision], pa.string()),
            "llr_q": pa.array([llr_q], pa.int64()),
        }
    )



# RBO weights p^(d-1) at p=0.9, 1e15 fixed point -- shared literals
# between the engine and the SQL VALUES list
_RBO_P15 = [1000000000000000, 900000000000000, 810000000000000, 729000000000000, 656100000000000, 590490000000000, 531441000000000, 478296900000000, 430467210000000, 387420489000000, 348678440100000, 313810596090000, 282429536481000, 254186582832900, 228767924549610, 205891132094649, 185302018885184, 166771816996666, 150094635296999, 135085171767299]


def _q_rbo_overlap(sf_dir: str) -> pa.Table:
    """Rank-biased overlap (p=0.9, depth 20) between this week's and
    last week's top-20 cell rankings -- the IR list-similarity metric
    applied to spatial hot-spot churn.  Rankings are deterministic
    (count desc, cell asc); per-depth overlaps are exact ints; each
    depth term quantizes ov/d against the SHARED 1e15 fixed-point
    p^(d-1) literals, so the 20-term sum is exact int64."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": pa.array(eid % 9216),
                "week": pa.array(us // (7 * 86_400_000_000)),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell", "week"],
        [("_one", "sum", "n")],
    )
    wk = agg["week"].to_numpy(zero_copy_only=False).astype(np.int64)
    cells = agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    w_last = int(wk.max())

    def top20(w: int) -> list:
        sel = wk == w
        c, x = cells[sel], ns[sel]
        order = np.lexsort((c, -x))[:20]
        return c[order].tolist()

    a = top20(w_last)
    b = top20(w_last - 1)
    ra = {c: i + 1 for i, c in enumerate(a)}
    rb = {c: i + 1 for i, c in enumerate(b)}
    total = 0
    for d in range(1, 21):
        ov = len(
            {c for c, r in ra.items() if r <= d}
            & {c for c, r in rb.items() if r <= d}
        )
        total += int(
            round_half_away(
                np.array([float(ov) / float(d) * float(_RBO_P15[d - 1])])
            )[0]
        )
    rbo = 0.1 * (float(total) / 1e15)
    return pa.table(
        {
            "depth": pa.array([20], pa.int64()),
            "rbo": round_like_sql([rbo], 6),
        }
    )



def _q_geometric_median(sf_dir: str) -> pa.Table:
    """Geometric median (Weiszfeld) of each user's geocoded fixes --
    the robust home-location estimator next to the centroid/ellipse
    family.  SIX unrolled iterations from the exact-moment centroid;
    every per-fix term x/d, y/d, 1/d is 1e9-quantized before the
    per-user sum (exact int64, order-independent), coincident points
    (d == 0) excluded by rule on both sides; the iterate itself is
    the shared ratio expression.  Runs vectorized per user in the
    groupby map_groups tier; the oracle unrolls the same six levels
    as materialized CTEs."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )

    def per_user(group: pa.Table) -> pa.Table:
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        x = (eid % 96).astype(np.float64)
        y = ((eid // 96) % 96).astype(np.float64)
        n = len(x)
        sx = float(int((eid % 96).sum()))
        sy = float(int(((eid // 96) % 96).sum()))
        X = sx / float(n)
        Y = sy / float(n)
        for _ in range(6):
            d = np.sqrt((x - X) * (x - X) + (y - Y) * (y - Y))
            ok = d > 0.0
            qw = round_half_away(
                np.where(ok, 1e9 / np.where(ok, d, 1.0), 0.0)
            ).astype(np.int64)
            qx = round_half_away(
                np.where(ok, x * 1e9 / np.where(ok, d, 1.0), 0.0)
            ).astype(np.int64)
            qy = round_half_away(
                np.where(ok, y * 1e9 / np.where(ok, d, 1.0), 0.0)
            ).astype(np.int64)
            swq = int(qw.sum())
            if swq == 0:
                break
            X = float(int(qx.sum())) / float(swq)
            Y = float(int(qy.sum())) / float(swq)
        return pa.table(
            {
                "user_id": pa.array(
                    [group["user_id"][0].as_py()], pa.int64()
                ),
                "n_fixes": pa.array([n], pa.int64()),
                "gm_x": round_like_sql([X], 6),
                "gm_y": round_like_sql([Y], 6),
            }
        )

    per = collect_tables(
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    )
    return per.sort_by("user_id")



def _q_visibility_graph(sf_dir: str) -> pa.Table:
    """Natural visibility graph of the daily event series (the
    time-series-to-network transform): days a < b are linked when
    every bar between them stays strictly below the sight line,
    tested with CROSS-MULTIPLIED integer arithmetic -- x_c (b-a) <
    x_a (b-c) + x_b (c-a) -- so there is no float slope anywhere.
    Output: per-day visibility degree."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

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
    deg = np.zeros(n, np.int64)
    for a in range(n):
        for b in range(a + 1, n):
            ok = True
            for c in range(a + 1, b):
                if x[c] * (b - a) >= x[a] * (b - c) + x[b] * (c - a):
                    ok = False
                    break
            if ok:
                deg[a] += 1
                deg[b] += 1
    return pa.table(
        {
            "day": pa.array(lo + np.arange(n, dtype=np.int64)),
            "degree": pa.array(deg),
        }
    )


def _q_hill_estimator(sf_dir: str) -> pa.Table:
    """Hill tail-index estimator over per-customer spend (k = 50
    upper order statistics): exact cents order statistics with
    deterministic (cents, custkey) tie-break, each ln(x_i / x_(k+1))
    term 1e9-quantized before the exact integer sum -- the
    heavy-tail diagnostic next to zipf_slope/pareto."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    K = 50

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "c": pa.array(scaled_int(batch["o_totalprice"], 100.0)),
            }
        )

    per = hash_aggregate(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [("c", "sum", "spend")],
    )
    sp = per["spend"].to_numpy(zero_copy_only=False).astype(np.int64)
    ck = per["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ck, -sp))[: K + 1]
    top = sp[order]
    xk1 = float(top[K])
    terms = round_half_away(
        np.log(top[:K].astype(np.float64) / xk1) * 1e9
    ).astype(np.int64)
    s = int(terms.sum())
    alpha = float(K) / (float(s) / 1e9)
    return pa.table(
        {
            "k": pa.array([K], pa.int64()),
            "x_k1_cents": pa.array([int(top[K])], pa.int64()),
            "hill_alpha": round_like_sql([alpha], 6),
        }
    )



def _q_q17_small_qty_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q17 analogue: revenue impact of small-quantity orders --
    lineitems with quantity below 0.2 x their part's mean quantity.
    Two passes: per-part exact integer (sum qty, count) through the
    distributed groupby tier, broadcast back as a per-part threshold
    map; the filter comparison q < 0.2 * (sq/n) is the shared float
    expression; the kept revenue stays exact int64 cents, one /7.0
    at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qprep(batch: pa.Table) -> pa.Table:
        q = round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "q": pa.array(q),
                "_one": pa.array(np.ones(len(q), np.int64)),
            }
        )

    stats = hash_aggregate(
        ds.map_batches(qprep, batch_format="pyarrow", batch_size=None),
        ["l_partkey"],
        [("q", "sum", "sq"), ("_one", "sum", "n")],
    )
    pk = stats["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = stats["sq"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = stats["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    pk_s, sq_s, n_s = pk[order], sq[order], nn[order]

    def keep(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        q = round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        i = np.searchsorted(pk_s, p)
        thr = 0.2 * (
            sq_s[i].astype(np.float64) / n_s[i].astype(np.float64)
        )
        m = q.astype(np.float64) < thr
        c = scaled_int(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m],
            100.0,
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(int(m.sum()), np.int64)),
                "c": pa.array(c),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(keep, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("c", "sum", "s"), ("c", "count", "n")],
    )
    s = int(agg["s"][0].as_py())
    n_kept = int(agg["n"][0].as_py())
    return pa.table(
        {
            "n_lineitems": pa.array([n_kept], pa.int64()),
            "avg_yearly": round_like_sql(
                [(float(s) / 100.0) / 7.0], 6
            ),
        }
    )


def _q_q19_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 analogue: revenue under an OR-of-ANDs brand/quantity
    predicate -- the disjunctive-pushdown stress case.  Part brands
    ride the broadcast tier; the three (brand, quantity-range)
    disjuncts evaluate vectorized per batch; revenue cents stay
    exact int64."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, hash_aggregate, round_like_sql,
    )

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"],
    ).rename_columns(["l_partkey", "p_brand"])
    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        BroadcastLookup(part, on="l_partkey", take_cols=["p_brand"]),
        batch_format="pyarrow", batch_size=None,
    )

    def keep(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["p_brand"].to_pylist(), dtype=object)
        q = round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        m = (
            ((b == "Brand#1") & (q >= 1) & (q <= 11))
            | ((b == "Brand#2") & (q >= 10) & (q <= 20))
            | ((b == "Brand#3") & (q >= 20) & (q <= 30))
        )
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        c = scaled_int(
            np.asarray(p, np.float64) * (1.0 - np.asarray(dc, np.float64)),
            100.0,
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(int(m.sum()), np.int64)),
                "c": pa.array(c),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(keep, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("c", "sum", "s"), ("c", "count", "n")],
    )
    if agg.num_rows == 0:
        return pa.table(
            {
                "n_lineitems": pa.array([0], pa.int64()),
                "revenue": round_like_sql([0.0], 6),
            }
        )
    s = int(agg["s"][0].as_py())
    n_kept = int(agg["n"][0].as_py())
    return pa.table(
        {
            "n_lineitems": pa.array([n_kept], pa.int64()),
            "revenue": round_like_sql([float(s) / 100.0], 6),
        }
    )



def _q_graph_modularity(sf_dir: str) -> pa.Table:
    """Newman modularity of the even/odd-length two-partition of the
    edit-1 word graph: Q = sum_c e_c/m - sum_c (d_c / 2m)^2 with
    intra-edge counts e_c and class degree sums d_c all exact int64
    on the vocabulary-bounded edge list; Q is one shared float
    expression."""
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
    m = len(w1)
    e_c = {0: 0, 1: 0}
    d_c = {0: 0, 1: 0}
    for a, b in zip(w1, w2):
        ca, cb = len(a) % 2, len(b) % 2
        d_c[ca] += 1
        d_c[cb] += 1
        if ca == cb:
            e_c[ca] += 1
    mf = float(m)
    q = sum(
        float(e_c[c]) / mf - (float(d_c[c]) / (2.0 * mf)) ** 2
        for c in (0, 1)
    )
    return pa.table(
        {
            "n_edges": pa.array([m], pa.int64()),
            "intra_even": pa.array([e_c[0]], pa.int64()),
            "intra_odd": pa.array([e_c[1]], pa.int64()),
            "modularity": round_like_sql([q], 6),
        }
    )



def _q_feature_matrix(sf_dir: str) -> pa.Table:
    """Per-user ML feature extraction (the classic RFM-style training
    matrix): one combiner pass emits per-type counts (wide int64
    columns), exact total cents, and last-activity day; recency =
    corpus max day - user's last day.  Everything integer; no second
    shuffle -- the wide partials sum exactly."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        cols = {
            "user_id": batch["user_id"],
            "d": pa.array(us // 86_400_000_000),
            "c": pa.array(scaled_int(batch["value"], 100.0)),
        }
        for t in TYPES:
            cols[f"n_{t}"] = pa.array((et == t).astype(np.int64))
        return pa.table(cols)

    aggs = [("c", "sum", "total_cents"), ("d", "max", "last_day")]
    aggs += [(f"n_{t}", "sum", f"n_{t}") for t in TYPES]
    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        aggs,
    ).sort_by("user_id")
    dmax = int(
        agg["last_day"].to_numpy(zero_copy_only=False).astype(np.int64).max()
    )
    rec = dmax - agg["last_day"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    out = {"user_id": agg["user_id"]}
    for t in TYPES:
        out[f"n_{t}"] = agg[f"n_{t}"].cast(pa.int64())
    out["total_cents"] = agg["total_cents"].cast(pa.int64())
    out["recency_days"] = pa.array(rec)
    return pa.table(out)



def _q_ql_retrieval(sf_dir: str) -> pa.Table:
    """Query-likelihood retrieval with Dirichlet smoothing (mu=100)
    for the query [hash, join, table] -- the LM-based ranker next to
    BM25: corpus frequencies and doc lengths are exact int64 one-pass
    partials; each doc's score is the exact int64 sum of three
    1e9-quantized ln((tf + mu*cf/T) / (len + mu)) terms, so ranking
    ties break identically.  Top 10 (score desc, doc asc)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    QW = ["hash", "join", "table"]
    MU = 100.0

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def stats(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, "text", "doc_id")
        toks = t["token"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"doc_id": pa.array(did),
                "len": pa.array(np.ones(len(did), np.int64))}
        for w in QW:
            cols[f"tf_{w}"] = pa.array((toks == w).astype(np.int64))
        return pa.table(cols).group_by("doc_id").aggregate(
            [("len", "sum")] + [(f"tf_{w}", "sum") for w in QW]
        ).rename_columns(["doc_id", "len"] + [f"tf_{w}" for w in QW])

    agg = hash_aggregate(
        ds.map_batches(stats, batch_format="pyarrow", batch_size=None),
        ["doc_id"],
        [("len", "sum", "len")]
        + [(f"tf_{w}", "sum", f"tf_{w}") for w in QW],
    )
    T = float(
        int(agg["len"].to_numpy(zero_copy_only=False).astype(np.int64).sum())
    )
    cf = {
        w: float(
            int(
                agg[f"tf_{w}"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .sum()
            )
        )
        for w in QW
    }
    ln = agg["len"].to_numpy(zero_copy_only=False).astype(np.float64)
    score = np.zeros(agg.num_rows, np.int64)
    for w in QW:
        tf = agg[f"tf_{w}"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        term = np.log((tf + MU * cf[w] / T) / (ln + MU))
        score += round_half_away(term * 1e9).astype(np.int64)
    did = agg["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((did, -score))[:10]
    return pa.table(
        {
            "doc_id": pa.array(did[order]),
            "score_q": pa.array(score[order]),
        }
    )


def _q_ljung_box(sf_dir: str) -> pa.Table:
    """Ljung-Box portmanteau test at lags 1-5 on the daily
    order-revenue series: residuals are exact int64 against the
    half-away-rounded integer mean (autocovariance is shift-invariant),
    each lag's autocovariance is an exact Python-int product sum,
    rho_k = sk/s0 is one float division of identical integers both
    sides, and the per-lag Q term rho_k^2/(n-k) is 1e12-quantized so
    the cumulative statistic q_scaled = n*(n+2)*cumsum(term_q) is a
    bit-exact BIGINT."""
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
    xs = (
        agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    ).tolist()
    n = len(xs)
    tot = sum(xs)
    mean_int = int(round_half_away(np.array([float(tot) / float(n)]))[0])
    es = [x - mean_int for x in xs]
    s0 = sum(e * e for e in es)
    lags, rho_qs, q_scaleds = [], [], []
    cum = 0
    for k in range(1, 6):
        sk = sum(es[t] * es[t - k] for t in range(k, n))
        rho = float(sk) / float(s0)
        rho_q = int(round_half_away(np.array([rho * 1e9]))[0])
        term = rho * rho / float(n - k) * 1e12
        cum += int(round_half_away(np.array([term]))[0])
        lags.append(k)
        rho_qs.append(rho_q)
        q_scaleds.append(n * (n + 2) * cum)
    return pa.table(
        {
            "lag": pa.array(lags, pa.int64()),
            "rho_q": pa.array(rho_qs, pa.int64()),
            "q_scaled": pa.array(q_scaleds, pa.int64()),
        }
    )


def _q_bigram_novelty(sf_dir: str) -> pa.Table:
    """Corpus n-gram novelty curve: split doc ids into 10 ordered
    buckets and report, per bucket, the fraction of its bigram
    OCCURRENCES whose corpus-wide first occurrence (min doc_id) falls
    in that same bucket -- the "how much of each new data slice is
    genuinely new text" audit run before incremental training.  One
    gram-keyed distributed aggregate (min doc_id + 10 wide occurrence
    counts; the gram vocabulary never lands on the driver), then a
    10-row combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_ngrams,
    )

    NB = 10
    md = int(
        _read_pq(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).max("doc_id")
    )
    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def grams(batch: pa.Table) -> pa.Table:
        t = _explode_ngrams(batch, 2, "text", "doc_id")
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = did * NB // (md + 1)
        cols = {"gram": t["gram"], "doc_id": pa.array(did)}
        for i in range(NB):
            cols[f"c{i}"] = pa.array((bkt == i).astype(np.int64))
        return pa.table(cols)

    agg = hash_aggregate(
        ds.map_batches(grams, batch_format="pyarrow", batch_size=None),
        ["gram"],
        [("doc_id", "min", "first_doc")]
        + [(f"c{i}", "sum", f"n{i}") for i in range(NB)],
        distributed_combine=True,
    )

    def per_bucket(batch: pa.Table) -> pa.Table:
        fb = (
            batch["first_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
            * NB
            // (md + 1)
        )
        novel = np.zeros(NB, np.int64)
        total = np.zeros(NB, np.int64)
        for i in range(NB):
            ci = batch[f"n{i}"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            total[i] = ci.sum()
            novel[i] = ci[fb == i].sum()
        return pa.table(
            {
                "bucket": pa.array(np.arange(NB, dtype=np.int64)),
                "novel": pa.array(novel),
                "total": pa.array(total),
            }
        )

    parts = collect_tables(
        agg.map_batches(per_bucket, batch_format="pyarrow", batch_size=None)
    )
    out = (
        parts.group_by("bucket")
        .aggregate([("novel", "sum"), ("total", "sum")])
        .rename_columns(["bucket", "novel", "total"])
        .sort_by("bucket")
    )
    novel = out["novel"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = out["total"].to_numpy(zero_copy_only=False).astype(np.float64)
    rate_q = round_half_away(novel / total * 1e9).astype(np.int64)
    return pa.table(
        {
            "bucket": out["bucket"].cast(pa.int64()),
            "novel": out["novel"].cast(pa.int64()),
            "total": out["total"].cast(pa.int64()),
            "rate_q": pa.array(rate_q),
        }
    )


def _q_vocab_richness(sf_dir: str) -> pa.Table:
    """Vocabulary-richness battery per language: Yule's K
    (1e4 * (sum_w c_w^2 - N) / N^2), Guiraud's R (V / sqrt(N)) and
    Sichel's S (V(2) / V).  One (lang, token)-keyed distributed count
    (vocabulary never lands on the driver), then per-language exact
    integer moments (N, V, V2, sum c^2) from wide partials; each
    statistic is one float expression over identical integers both
    sides, 1e9/1e6-quantized."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def toks(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, "text", "lang")
        return pa.table(
            {
                "lang": t["lang"],
                "token": t["token"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(toks, batch_format="pyarrow", batch_size=None),
        ["lang", "token"],
        [("one", "sum", "c")],
        distributed_combine=True,
    )

    def moments(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "lang": batch["lang"],
                "n": pa.array(c),
                "v": pa.array(np.ones(len(c), np.int64)),
                "v2": pa.array((c == 2).astype(np.int64)),
                "s2": pa.array(c * c),
            }
        )
        return (
            t.group_by("lang")
            .aggregate(
                [("n", "sum"), ("v", "sum"), ("v2", "sum"), ("s2", "sum")]
            )
            .rename_columns(["lang", "n", "v", "v2", "s2"])
        )

    parts = collect_tables(
        counts.map_batches(moments, batch_format="pyarrow", batch_size=None)
    )
    out = (
        parts.group_by("lang")
        .aggregate([("n", "sum"), ("v", "sum"), ("v2", "sum"), ("s2", "sum")])
        .rename_columns(["lang", "n_tokens", "vocab", "v2", "s2"])
        .sort_by("lang")
    )
    n = out["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    v = out["vocab"].to_numpy(zero_copy_only=False).astype(np.float64)
    v2 = out["v2"].to_numpy(zero_copy_only=False).astype(np.float64)
    s2 = out["s2"].to_numpy(zero_copy_only=False).astype(np.float64)
    yule_q = round_half_away(1e4 * (s2 - n) / (n * n) * 1e6).astype(np.int64)
    guiraud_q = round_half_away(v / np.sqrt(n) * 1e9).astype(np.int64)
    sichel_q = round_half_away(v2 / v * 1e9).astype(np.int64)
    return pa.table(
        {
            "lang": out["lang"],
            "n_tokens": out["n_tokens"].cast(pa.int64()),
            "vocab": out["vocab"].cast(pa.int64()),
            "yule_k_q": pa.array(yule_q),
            "guiraud_q": pa.array(guiraud_q),
            "sichel_q": pa.array(sichel_q),
        }
    )


def _q_q4_order_priority(sf_dir: str) -> pa.Table:
    """TPC-H Q4 analogue (order-priority checking): orders placed in
    1997Q3 that have at least one lineitem shipped more than 90 days
    after the order date, counted per priority.  The EXISTS turns into
    a per-orderkey MAX(l_shipdate) pre-aggregate (combiner -- lineitem
    never re-shuffles raw) pruned to shipdates that can possibly
    qualify, joined to the date-windowed orders through the size-aware
    router; the semi-join predicate is then one vectorized compare."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join, hash_aggregate,
    )

    DAY = 86_400_000_000
    LO = np.datetime64("1997-07-01T00:00:00", "us").astype(np.int64)
    HI = np.datetime64("1997-10-01T00:00:00", "us").astype(np.int64)

    od = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def od_filter(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.filter(pa.array((ts >= LO) & (ts < HI)))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_ts": b["o_orderdate"].cast(pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
            }
        )

    od_f = od.map_batches(od_filter, batch_format="pyarrow", batch_size=None)

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # a lineitem shipped on or before LO+90d can never satisfy
        # ship > o_date + 90d for any order in the window
        b = batch.filter(pa.array(ts > LO + 90 * DAY))
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "s": b["l_shipdate"].cast(pa.int64()),
            }
        )

    mx = hash_aggregate(
        li.map_batches(li_prep, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"],
        [("s", "max", "max_ship")],
        distributed_combine=True,
    )
    joined = equi_join(
        mx, od_f, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late(batch: pa.Table) -> pa.Table:
        ms = batch["max_ship"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ot = batch["o_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.filter(pa.array(ms > ot + 90 * DAY))
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        joined.map_batches(late, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority"],
        [("one", "sum", "order_count")],
    )
    return agg.sort_by("o_orderpriority")


def _q_logrank_test(sf_dir: str) -> pa.Table:
    """Two-group log-rank test (time to first error, right-censored at
    last activity; groups = user_id parity).  Per-user survival triples
    reduce via the combiner tier exactly like kaplan_meier; the pooled
    event-time table is bounded by users.  Per-time expected/variance
    terms are 1e9-quantized BEFORE summing so the totals are exact
    integers (float-sum order independent); the chi-square statistic is
    one float expression over those integers, 1e6-quantized."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tnp = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_ev = pc.equal(batch["event_type"], "error").to_numpy(
            zero_copy_only=False
        )
        big = np.int64(2**62)
        evt = np.where(is_ev, tnp, big)
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
    uid = peru["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    t0 = peru["t0"].to_numpy(zero_copy_only=False)
    tlast = peru["tlast"].to_numpy(zero_copy_only=False)
    terr = peru["terr"].to_numpy(zero_copy_only=False)
    big = np.int64(2**62)
    obs = terr < big
    dur = np.where(obs, terr - t0, tlast - t0)
    grp0 = (uid % 2) == 0

    ev_times = np.unique(dur[obs])
    dall = np.sort(dur)
    d0 = np.sort(dur[grp0])
    n = len(dur) - np.searchsorted(dall, ev_times, side="left")
    n1 = len(d0) - np.searchsorted(d0, ev_times, side="left")
    obs_sorted = np.sort(dur[obs])
    obs0_sorted = np.sort(dur[obs & grp0])
    dd = (
        np.searchsorted(obs_sorted, ev_times, side="right")
        - np.searchsorted(obs_sorted, ev_times, side="left")
    )
    d1 = (
        np.searchsorted(obs0_sorted, ev_times, side="right")
        - np.searchsorted(obs0_sorted, ev_times, side="left")
    )
    nf = n.astype(np.float64)
    n1f = n1.astype(np.float64)
    ddf = dd.astype(np.float64)
    e1q = round_half_away(ddf * n1f / nf * 1e9).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        vterm = (
            ddf
            * (n1f / nf)
            * ((nf - n1f) / nf)
            * ((nf - ddf) / (nf - 1.0))
            * 1e9
        )
    vq = np.where(n > 1, round_half_away(np.where(n > 1, vterm, 0.0)), 0.0
                  ).astype(np.int64)
    o1 = int(d1.sum())
    e1_q = int(e1q.sum())
    v_q = int(vq.sum())
    num = float(o1) - float(e1_q) / 1e9
    chi2_q = int(
        round_half_away(np.array([num * num / (float(v_q) / 1e9) * 1e6]))[0]
    )
    return pa.table(
        {
            "o1": pa.array([o1], pa.int64()),
            "e1_q": pa.array([e1_q], pa.int64()),
            "v_q": pa.array([v_q], pa.int64()),
            "chi2_q": pa.array([chi2_q], pa.int64()),
        }
    )


def _q_knox_test(sf_dir: str) -> pa.Table:
    """Knox space-time interaction test over a deterministic event
    subset (event_id % 20 == 0): pair counts close in space (lattice
    dist^2 <= 25), close in time (|dt| <= 1h), and both -- WITHOUT an
    all-pairs pass.  Space pairs count inside a 12x12 coarse-cell
    shuffle with 8-neighbour halo rows (cell edge 8 >= radius 5, so
    every qualifying pair lands in some anchor cell exactly once via
    the own-row/halo true-cell ordering rule); time pairs use the same
    anchored-halo counting over hour windows.  Everything is exact
    integer counts; the Knox ratio observed/expected is one float
    expression, 1e6-quantized."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    HOUR = 3_600_000_000
    R2 = 25

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts"],
    )

    def space_rows(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = eid % 20 == 0
        eid = eid[keep]
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[
            keep
        ]
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
                            "tcell": pa.array((cx * 12 + cy)[ok]),
                            "gx": pa.array(gx[ok]),
                            "gy": pa.array(gy[ok]),
                            "t": pa.array(ts[ok]),
                            "eid": pa.array(eid[ok]),
                        }
                    )
                )
        return pa.concat_tables(outs)

    def space_kernel(group: pa.Table) -> pa.Table:
        own = group["own"].to_numpy(zero_copy_only=False).astype(bool)
        gx = group["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gy = group["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = group["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = group["tcell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = int(group["cell"][0].as_py())
        ai = np.where(own)[0]
        if len(ai) == 0:
            return pa.table(
                {"ns": pa.array([0], pa.int64()),
                 "nst": pa.array([0], pa.int64())}
            )
        d2 = (
            (gx[ai][:, None] - gx[None, :]) ** 2
            + (gy[ai][:, None] - gy[None, :]) ** 2
        )
        close = d2 <= R2
        # dedup: own-own pairs need eid_j > eid_i; own-halo pairs are
        # anchored to the smaller true cell
        allowed = np.where(
            own[None, :], eid[None, :] > eid[ai][:, None], tc[None, :] > cell
        )
        m = close & allowed
        ns = int(m.sum())
        tclose = np.abs(t[ai][:, None] - t[None, :]) <= HOUR
        nst = int((m & tclose).sum())
        return pa.table(
            {"ns": pa.array([ns], pa.int64()),
             "nst": pa.array([nst], pa.int64())}
        )

    sp = collect_tables(
        _grouped_by_key(
            ds.map_batches(
                space_rows, batch_format="pyarrow", batch_size=None
            ),
            "cell",
            space_kernel,
        )
    )
    ns = int(sp["ns"].to_numpy(zero_copy_only=False).sum())
    nst = int(sp["nst"].to_numpy(zero_copy_only=False).sum())

    def time_rows(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = eid % 20 == 0
        eid = eid[keep]
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[
            keep
        ]
        w = ts // HOUR
        outs = []
        for dw in (-1, 0, 1):
            own = np.int64(1) if dw == 0 else np.int64(0)
            outs.append(
                pa.table(
                    {
                        "w": pa.array(w + dw),
                        "own": pa.array(np.full(len(w), own, np.int64)),
                        "tw": pa.array(w),
                        "t": pa.array(ts),
                        "eid": pa.array(eid),
                    }
                )
            )
        return pa.concat_tables(outs)

    def time_kernel(group: pa.Table) -> pa.Table:
        own = group["own"].to_numpy(zero_copy_only=False).astype(bool)
        t = group["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
        tw = group["tw"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = int(group["w"][0].as_py())
        ai = np.where(own)[0]
        if len(ai) == 0:
            return pa.table({"nt": pa.array([0], pa.int64()),
                             "n_own": pa.array([0], pa.int64())})
        tclose = np.abs(t[ai][:, None] - t[None, :]) <= HOUR
        allowed = np.where(
            own[None, :], eid[None, :] > eid[ai][:, None], tw[None, :] > w
        )
        nt = int((tclose & allowed).sum())
        return pa.table(
            {"nt": pa.array([nt], pa.int64()),
             "n_own": pa.array([len(ai)], pa.int64())}
        )

    tm = collect_tables(
        _grouped_by_key(
            ds.map_batches(
                time_rows, batch_format="pyarrow", batch_size=None
            ),
            "w",
            time_kernel,
        )
    )
    nt = int(tm["nt"].to_numpy(zero_copy_only=False).sum())
    n = int(tm["n_own"].to_numpy(zero_copy_only=False).sum())
    total = n * (n - 1) // 2
    if ns == 0 or nt == 0:
        ratio_q = 0
    else:
        expected = float(ns) * float(nt) / float(total)
        ratio_q = int(
            round_half_away(np.array([float(nst) / expected * 1e6]))[0]
        )
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "ns": pa.array([ns], pa.int64()),
            "nt": pa.array([nt], pa.int64()),
            "nst": pa.array([nst], pa.int64()),
            "knox_ratio_q": pa.array([ratio_q], pa.int64()),
        }
    )


def _q_mask_morphology(sf_dir: str) -> pa.Table:
    """Binary morphology census over the slope-fixture validity mask:
    3x3 dilation (any valid neighbour incl. self), 3x3 erosion (all 9
    in-grid valid; off-grid counts invalid) and the morphological
    gradient -- the mask-cleanup sizing pass run before vectorizing
    nodata boundaries.  Same halo-exchange shuffle as the focal
    derivatives; per-tile exact integer counts roll up by one sum."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        make_emit_halos,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))

    def morph_kernel(group: pa.Table) -> pa.Table:
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            _assemble_padded, NODATA_THRESHOLD,
        )

        asm = _assemble_padded(group)
        empty = pa.table(
            {
                "n_valid": pa.array([], pa.int64()),
                "n_dilated": pa.array([], pa.int64()),
                "n_eroded": pa.array([], pa.int64()),
            }
        )
        if asm is None:
            return empty
        pad, h, w, r0, c0, transform = asm
        vm = np.isfinite(pad) & (pad > NODATA_THRESHOLD)
        views = [
            vm[i:i + h, j:j + w] for i in range(3) for j in range(3)
        ]
        stack = np.stack(views)
        center = views[4]
        dil = np.any(stack, axis=0)
        ero = np.all(stack, axis=0)
        return pa.table(
            {
                "n_valid": pa.array([int(center.sum())], pa.int64()),
                "n_dilated": pa.array([int(dil.sum())], pa.int64()),
                "n_eroded": pa.array([int(ero.sum())], pa.int64()),
            }
        )

    halos = tiles.map_batches(
        make_emit_halos(None, None), batch_format="pyarrow", batch_size=None
    )
    parts = collect_tables(
        halos.groupby("halo_key").map_groups(
            morph_kernel, batch_format="pyarrow"
        )
    )
    nv = int(parts["n_valid"].to_numpy(zero_copy_only=False).sum())
    ndil = int(parts["n_dilated"].to_numpy(zero_copy_only=False).sum())
    nero = int(parts["n_eroded"].to_numpy(zero_copy_only=False).sum())
    return pa.table(
        {
            "n_valid": pa.array([nv], pa.int64()),
            "n_dilated": pa.array([ndil], pa.int64()),
            "n_eroded": pa.array([nero], pa.int64()),
            "n_gradient": pa.array([ndil - nero], pa.int64()),
        }
    )


def _q_bh_fdr(sf_dir: str) -> pa.Table:
    """Benjamini-Hochberg FDR sweep over per-user mean-value z-scores
    (the multiple-testing gate run over thousands of per-key metric
    tests).  Per-user cents sums/counts and the global moments are
    exact int64 combiner aggregates; z and the monotone pseudo
    p-value exp(-z^2/2) are identical float expressions both sides
    (documented: a pseudo-p -- BH only consumes the ordering and the
    i/m*alpha comparisons).  Returns every user with its BH rank and
    rejected flag (step-up rule, alpha=0.2)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ALPHA = 0.2
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "c": pa.array(c),
                "c2": pa.array(c * c),
                "one": pa.array(np.ones(len(c), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("c", "sum", "su"), ("c2", "sum", "s2u"), ("one", "sum", "nu")],
    )
    su = agg["su"].to_numpy(zero_copy_only=False).astype(np.int64)
    nu = agg["nu"].to_numpy(zero_copy_only=False).astype(np.int64)
    uid = agg["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    S = int(su.sum())
    S2 = int(agg["s2u"].to_numpy(zero_copy_only=False).astype(np.int64).sum())
    N = int(nu.sum())
    mu = float(S) / float(N)
    var = float(S2) / float(N) - mu * mu
    sd = float(np.sqrt(var))
    xbar = su.astype(np.float64) / nu.astype(np.float64)
    z = (xbar - mu) / (sd / np.sqrt(nu.astype(np.float64)))
    p = np.exp(-z * z / 2.0)
    m = len(uid)
    order = np.lexsort((uid, p))
    p_s, uid_s, z_s = p[order], uid[order], z[order]
    i = np.arange(1, m + 1, dtype=np.int64)
    ok = p_s <= i.astype(np.float64) / float(m) * ALPHA
    kmax = int(i[ok].max()) if ok.any() else 0
    rejected = (i <= kmax).astype(np.int64)
    return pa.table(
        {
            "user_id": pa.array(uid_s),
            "rank_i": pa.array(i),
            "z_q": pa.array(round_half_away(z_s * 1e6).astype(np.int64)),
            "p_q": pa.array(round_half_away(p_s * 1e12).astype(np.int64)),
            "rejected": pa.array(rejected),
        }
    )


def _q_q7_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q7 analogue (volume shipping): revenue cents between the
    two largest nations by key (0 and 1) in BOTH directions, per ship
    year.  Lineitem x orders runs once through the size-aware router
    (reference: test2.py joins are driver-side; here the only shuffle
    is the big join); customer-> nation and supplier->nation maps ride
    the broadcast tier; the nation-pair filter and year bucketing are
    vectorized per batch; revenue stays exact int64 cents."""
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, equi_join, hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    NA, NB = 0, 1
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(od_path, columns=["o_orderkey", "o_custkey"])
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        ],
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        c = scaled_int(
            np.asarray(p, np.float64) * (1.0 - np.asarray(d, np.float64)),
            100.0,
        )
        ts = batch["l_shipdate"].cast(pa.int64()).to_numpy(
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
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "yr": pa.array(yr),
                "c": pa.array(c),
            }
        )

    li_f = li.map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    joined = equi_join(
        li_f, od, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path),
    )
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

    def pair_filter(batch: pa.Table) -> pa.Table:
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = ((cn == NA) & (sn == NB)) | ((cn == NB) & (sn == NA))
        b = batch.filter(pa.array(keep))
        return pa.table(
            {
                "supp_nation": b["s_nationkey"],
                "cust_nation": b["c_nationkey"],
                "yr": b["yr"],
                "c": b["c"],
            }
        )

    agg = hash_aggregate(
        withn.map_batches(pair_filter, batch_format="pyarrow",
                          batch_size=None),
        ["supp_nation", "cust_nation", "yr"],
        [("c", "sum", "revenue_cents")],
    )
    return pa.table(
        {
            "supp_nation": agg["supp_nation"].cast(pa.int64()),
            "cust_nation": agg["cust_nation"].cast(pa.int64()),
            "yr": agg["yr"].cast(pa.int64()),
            "revenue_cents": agg["revenue_cents"].cast(pa.int64()),
        }
    ).sort_by([("supp_nation", "ascending"), ("cust_nation", "ascending"),
               ("yr", "ascending")])


def _q_cochran_armitage(sf_dir: str) -> pa.Table:
    """Cochran-Armitage trend test: is the purchase share monotone in
    the (ordered) weekday?  One combiner pass yields per-weekday trial
    and success counts; every moment (T = sum w*r, sum w*n, sum w^2*n,
    R, N) is an exact Python integer, and the z statistic is a single
    float expression over them, 1e6-quantized.  Weights w = weekday
    0..6 (epoch day + 4 mod 7, the ISO convention used by DuckDB's
    dayofweek on these timestamps)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        w = (d + 4) % 7
        r = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "w": pa.array(w),
                "r": pa.array(r),
                "one": pa.array(np.ones(len(w), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["w"],
        [("r", "sum", "r"), ("one", "sum", "n")],
    ).sort_by("w")
    w = agg["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = agg["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    R = int(r.sum()); N = int(n.sum())
    T = int((w * r).sum())
    swn = int((w * n).sum())
    sw2n = int((w * w * n).sum())
    p = float(R) / float(N)
    e = p * float(swn)
    var = p * (1.0 - p) * (float(sw2n) - float(swn) * float(swn) / float(N))
    z = (float(T) - e) / float(np.sqrt(var))
    z_q = int(round_half_away(np.array([z * 1e6]))[0])
    return pa.table(
        {
            "t_stat": pa.array([T], pa.int64()),
            "r_total": pa.array([R], pa.int64()),
            "n_total": pa.array([N], pa.int64()),
            "z_q": pa.array([z_q], pa.int64()),
        }
    )


def _q_bollinger_breakouts(sf_dir: str) -> pa.Table:
    """Bollinger-band breakout screen on the daily order-revenue
    series: trailing 7-observed-day window (full windows only), band =
    mean +/- 2 population sd, both derived from EXACT int64 window
    sums of cents and squared cents (windowed integer sums are
    order-independent, so parity is structural); the breakout compare
    runs on the same float expression both sides.  Returns breakout
    days only."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    W = 7
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
    cs = np.concatenate([[0], np.cumsum(xs)])
    # squared-cents sums overflow int64 at scale: exact Python ints
    xl = xs.tolist()
    cs2 = [0]
    for v in xl:
        cs2.append(cs2[-1] + v * v)
    n = len(xs)
    if n < W:
        idx = np.array([], np.int64)
    else:
        idx = np.arange(W - 1, n)
    s = cs[idx + 1] - cs[idx + 1 - W]
    s2 = np.array(
        [float(cs2[i + 1] - cs2[i + 1 - W]) for i in idx], np.float64
    )
    mean = s.astype(np.float64) / float(W)
    var = s2 / float(W) - mean * mean
    sd = np.sqrt(var)
    x = xs[idx].astype(np.float64)
    brk = np.abs(x - mean) > 2.0 * sd
    return pa.table(
        {
            "d": pa.array(dd[idx][brk]),
            "cents": pa.array(xs[idx][brk]),
            "mean_q": pa.array(
                round_half_away(mean[brk] * 1e6).astype(np.int64)
            ),
            "sd_q": pa.array(
                round_half_away(sd[brk] * 1e6).astype(np.int64)
            ),
        }
    )


def _q_boruvka_mst(sf_dir: str) -> pa.Table:
    """Minimum spanning tree of the coarse-cell count-difference graph
    by BORUVKA rounds: nodes are the fixed 12x12 lattice supercells
    (frame-bounded, data-scale-independent), node weights come from a
    distributed event-count combiner, edge weight =
    |count(a)-count(b)| * 2^20 + edge_id (strictly distinct, so the
    MST is unique and the oracle's Prim must find the same total).
    Per-round per-component min-edge selection is vectorized argmin
    over the 264-edge frame; O(log V) rounds."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cell = (eid % 96) // 8 * 12 + ((eid // 96) % 96) // 8
        return pa.table(
            {
                "cell": pa.array(cell),
                "one": pa.array(np.ones(len(cell), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("one", "sum", "n")],
    )
    counts = np.zeros(144, np.int64)
    counts[
        agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    ] = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    eu, ev = [], []
    for i in range(144):
        if i // 12 < 11:
            eu.append(i); ev.append(i + 12)
        if i % 12 < 11:
            eu.append(i); ev.append(i + 1)
    eu = np.array(eu, np.int64); ev = np.array(ev, np.int64)
    ew = np.abs(counts[eu] - counts[ev]) * (1 << 20) + eu * 144 + ev

    label = np.arange(144, dtype=np.int64)
    total = 0
    picked: set[int] = set()
    while True:
        lu, lv = label[eu], label[ev]
        cross = lu != lv
        if not cross.any():
            break
        ci = np.where(cross)[0]
        comp = np.concatenate([lu[ci], lv[ci]])
        wts = np.concatenate([ew[ci], ew[ci]])
        eids = np.concatenate([ci, ci])
        order = np.lexsort((wts, comp))
        comp_s, eid_s = comp[order], eids[order]
        first = np.concatenate([[True], comp_s[1:] != comp_s[:-1]])
        for e in np.unique(eid_s[first]):
            a, b = label[eu[e]], label[ev[e]]
            if a != b:
                total += int(ew[e])
                picked.add(int(e))
                lo, hi = (a, b) if a < b else (b, a)
                label[label == hi] = lo
    return pa.table(
        {
            "n_edges": pa.array([len(picked)], pa.int64()),
            "total_weight": pa.array([total], pa.int64()),
        }
    )


def _q_page_hinkley(sf_dir: str) -> pa.Table:
    """Page-Hinkley drift detector on the daily order-revenue series
    (reference-mean form): deviations x_t - mu are exact int64 cents
    against the half-away-rounded integer mean, PH_t = cumsum -
    running-min is two exact integer scans, alarm when PH_t exceeds
    10 * mu.  Returns alarm days only -- everything integer, so parity
    is structural."""
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
    tot = int(xs.sum())
    mu = int(round_half_away(np.array([float(tot) / float(n)]))[0])
    dev = xs - mu
    cum = np.cumsum(dev)
    runmin = np.minimum.accumulate(cum)
    ph = cum - runmin
    lam = 10 * mu
    alarm = ph > lam
    return pa.table(
        {
            "d": pa.array(dd[alarm]),
            "ph": pa.array(ph[alarm]),
        }
    )


def _q_friedman_test(sf_dir: str) -> pa.Table:
    """Friedman rank test: blocks = weekdays (7), treatments = event
    types (5), cell metric = exact total cents.  Within-block ranks
    use the 2x tie-averaged integer trick (2r = 2*less + eq + 1), so
    the per-treatment rank sums R2_j are exact integers; the statistic
    Q = 3/(n k (k+1)) * sum R2_j^2 - 3 n (k+1) (tie correction
    omitted, documented) is one float expression, 1e6-quantized."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        w = (d + 4) % 7
        return pa.table(
            {
                "w": pa.array(w),
                "event_type": batch["event_type"],
                "c": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["w", "event_type"],
        [("c", "sum", "cents")],
    )
    w = agg["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = agg["event_type"].to_numpy(zero_copy_only=False)
    c = agg["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(set(et.tolist()))
    k = len(types)
    n_blocks = len(set(w.tolist()))
    r2sum = {t: 0 for t in types}
    for blk in sorted(set(w.tolist())):
        m = w == blk
        cv, tv = c[m], et[m]
        for i in range(len(cv)):
            less = int((cv < cv[i]).sum())
            eq = int((cv == cv[i]).sum())
            r2sum[tv[i]] += 2 * less + eq + 1
    s = sum(v * v for v in r2sum.values())
    q = (
        3.0 / (float(n_blocks) * float(k) * float(k + 1)) * float(s)
        - 3.0 * float(n_blocks) * float(k + 1)
    )
    q_q = int(round_half_away(np.array([q * 1e6]))[0])
    return pa.table(
        {
            "event_type": pa.array(types),
            "r2_sum": pa.array([r2sum[t] for t in types], pa.int64()),
            "q_q": pa.array([q_q] * k, pa.int64()),
        }
    )
