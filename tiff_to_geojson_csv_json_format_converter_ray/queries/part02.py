"""Query implementations, part 02 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: ks_statistic, cramers_v, centroid_confusion, label_scatter, profile_lineitem, kde_density, lagged_crosscorr, rolling_anomaly, pattern_match_users, rolling_week_users, winsorized_mean, contour_cases, contour_segments, zonal_mode, hist_equalize, colocation_pairs, convoy_pairs, word_triangles, word_components, word_pagerank, word_bfs_hops, latest_event_per_user, conversion_lag, interevent_median, time_weighted_avg, percent_rank_qty, gini_by_priority, bm25_search, orders_above_avg, dbscan_clusters, stay_points, chi2_independence, getis_ord, assoc_rules, pct_change_monthly, convex_hull, grouping_sets, markov_transitions, quantiles_cont, approx_distinct_by_type ...
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
    OG_KNN_PROBES,
    OG_POLYGONS,
    _og_multiband_tiles_table,
    _og_points_ds,
    _og_polygons_table,
    _og_tiles_table,
    _q_stride_sample,
    _read_pq,
)


def _q_ks_statistic(sf_dir: str) -> pa.Table:
    """Two-sample Kolmogorov-Smirnov D between the price distributions
    of returnflag R vs A: exact per-(flag, value) counts via the
    combiner (value-bounded; the unbounded tier is the quantile
    sketch), empirical CDFs + max gap on the driver."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.is_in(
                batch["l_returnflag"],
                value_set=pa.array(["R", "A"]),
            )
        )
        c = pc.multiply(batch["l_extendedprice"].cast(pa.float64()), 100.0)
        flag_r = pc.cast(
            pc.equal(batch["l_returnflag"], "R"), pa.int64()
        )
        return pa.table(
            {
                "cents": pc.cast(round_like_sql(c, 0), pa.int64()),
                "n_r": flag_r,
                "n_a": pc.subtract(pa.scalar(1, pa.int64()), flag_r),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        ["cents"],
        [("n_r", "sum", "n_r"), ("n_a", "sum", "n_a")],
    ).sort_by("cents")
    nr = counts["n_r"].to_numpy(zero_copy_only=False).astype(np.float64)
    na = counts["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
    cdf_r = np.cumsum(nr) / nr.sum()
    cdf_a = np.cumsum(na) / na.sum()
    d = float(np.abs(cdf_r - cdf_a).max())
    return pa.table({"ks_d": round_like_sql(np.asarray([d]), 6)})


def _q_cramers_v(sf_dir: str) -> pa.Table:
    """Cramer's V effect size for event type x ISO weekday (the
    normalized chi-square): V = sqrt(chi2 / (n * min(r-1, c-1)))."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        chi2_independence,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((ts // 86_400_000_000 + 3) % 7 + 1).astype(np.int64)
        return pa.table(
            {
                "a": batch["event_type"],
                "b": pa.array(dow),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["a", "b"],
        [("_one", "sum", "n")],
    )
    chi2, _dof = chi2_independence(counts, "a", "b")
    n = float(counts["n"].to_numpy(zero_copy_only=False).sum())
    r = len(set(counts["a"].to_pylist()))
    c = len(set(counts["b"].to_pylist()))
    v = np.sqrt(chi2 / (n * min(r - 1, c - 1)))
    return pa.table({"cramers_v": round_like_sql(np.asarray([v]), 6)})


def _q_centroid_confusion(sf_dir: str) -> pa.Table:
    """Nearest-class-mean classification confusion matrix over the
    embedding corpus (centroid pass -> broadcast -> vectorized
    distance argmin -> per-(true, pred) combiner)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        nearest_centroid_confusion,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"],
    )
    return nearest_centroid_confusion(ds)


def _q_label_scatter(sf_dir: str) -> pa.Table:
    """Within-class embedding scatter (mean squared distance to the
    class centroid): quantized int64 sum/sum-of-squares combiner,
    variance identity on the (labels x dims)-bounded table."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        label_scatter,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    )
    return label_scatter(ds)


def _q_profile_lineitem(sf_dir: str) -> pa.Table:
    """Data-quality profile (the Deequ shape): per-column row/null/
    exact-distinct counts + numeric min/max over lineitem."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        profile_columns,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_returnflag",
                 "l_linestatus"],
    )
    return profile_columns(
        ds,
        numeric_cols=["l_quantity", "l_extendedprice"],
        categorical_cols=["l_returnflag", "l_linestatus"],
    )


def _q_kde_density(sf_dir: str) -> pa.Table:
    """Gaussian kernel density estimate of order value at 9 fixed
    evaluation points: per-batch partial kernel sums per eval point
    (a pure combiner -- the eval grid is fixed and tiny), one final
    normalize.  The distributed form of a smoothed histogram."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
    )
    evals = [float(x) for x in range(50_000, 500_000, 50_000)]
    h = 25_000.0

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cols = {"_k": pa.array(np.zeros(1, np.int64))}
        cols["n"] = pa.array([np.int64(len(v))])
        for i, x0 in enumerate(evals):
            u = (x0 - v) / h
            cols[f"s{i}"] = pa.array([float(np.exp(-0.5 * u * u).sum())])
        return pa.table(cols)

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["_k"],
        [("n", "sum", "n")] + [(f"s{i}", "sum", f"s{i}")
                               for i in range(len(evals))],
    )
    n = float(agg["n"][0].as_py())
    norm = n * h * np.sqrt(2.0 * np.pi)
    dens = np.array(
        [float(agg[f"s{i}"][0].as_py()) for i in range(len(evals))]
    ) / norm
    return pa.table(
        {
            "x": pa.array(evals),
            "density": round_like_sql(dens * 1e6, 6),  # per-1e6 units
        }
    )


def _q_lagged_crosscorr(sf_dir: str) -> pa.Table:
    """Lagged cross-correlation of two daily series (event count vs
    mean value) at lags -3..3: daily aggregates via the combiner
    (calendar-bounded), Pearson over the aligned overlap per lag."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(ts // 86_400_000_000),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                "_v": batch["value"],
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("_one", "sum", "n"), ("_v", "sum", "sv")],
    ).sort_by("day")
    days = agg["day"].to_numpy(zero_copy_only=False)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    mv = agg["sv"].to_numpy(zero_copy_only=False) / n

    def corr(a: np.ndarray, b: np.ndarray) -> float:
        k = float(len(a))
        sa, sb = a.sum(), b.sum()
        num = k * (a * b).sum() - sa * sb
        den = np.sqrt(k * (a * a).sum() - sa * sa) * np.sqrt(
            k * (b * b).sum() - sb * sb
        )
        return float(num / den)

    lags, corrs = [], []
    for lag in range(-3, 4):
        # CALENDAR alignment (robust to missing days): pair day d's
        # count with day d-lag's mean value when both exist
        want = days - lag
        pos = np.searchsorted(days, want)
        pos = np.clip(pos, 0, len(days) - 1)
        ok = days[pos] == want
        a, b = n[ok], mv[pos[ok]]
        lags.append(lag)
        corrs.append(corr(a, b))
    return pa.table(
        {
            "lag": pa.array(lags, pa.int64()),
            "corr": round_like_sql(np.asarray(corrs), 6),
        }
    )


def _q_rolling_anomaly(sf_dir: str) -> pa.Table:
    """Rolling anomaly score: each day's event count z-scored against
    its trailing 7-day window (excluding itself); anomalous days =
    |z| > 2.  Daily counts via the combiner; the window pass runs on
    the calendar-bounded series with the exact SQL frame semantics."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(ts // 86_400_000_000),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("_one", "sum", "n")],
    ).sort_by("day")
    day = agg["day"].to_numpy(zero_copy_only=False)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    zs = np.full(len(n), np.nan)
    for i in range(len(n)):
        w = n[max(0, i - 7):i]  # trailing frame, exclusive of today
        if len(w) >= 2:
            mu = w.sum() / len(w)
            # sample stddev (SQL STDDEV), guard zero variance
            var = ((w - mu) ** 2).sum() / (len(w) - 1)
            if var > 0:
                zs[i] = (n[i] - mu) / np.sqrt(var)
    return pa.table(
        {
            "day": pa.array(
                day.astype("datetime64[D]").astype("datetime64[us]")
            ),
            "n": pa.array(n.astype(np.int64)),
            "z": round_like_sql(zs, 6),
        }
    ).sort_by("day")


def _q_pattern_match_users(sf_dir: str) -> pa.Table:
    """Sequence-pattern mining: users whose ordered event stream
    contains a signup followed by a purchase with NO error between
    (funnel-with-exclusion, the regex form of sessionized path
    analysis).  One groupby shuffle; per-group kernel builds the
    initial-letter string and applies a compiled regex."""
    import re as _re
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    pat = _re.compile(r"s[^e]*p")

    def match(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        et = group["event_type"].take(order).to_pylist()
        seq = "".join(t[0] for t in et)
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "matched": pa.array([bool(pat.search(seq))]),
                "n_events": pa.array([len(seq)], pa.int64()),
            }
        )

    t = collect_tables(
        _grouped_by_key(ds, "user_id", match)
    )
    return t.select(["user_id", "matched", "n_events"]).sort_by("user_id")


def _q_rolling_week_users(sf_dir: str) -> pa.Table:
    """Sliding-window DISTINCT: active users over each trailing 7-day
    window.  The classic hard case for pre-aggregation -- solved by
    exploding each distinct (user, day) into its 7 member windows
    (bounded 7x blowup of the already day-deduped stream), then one
    distinct-and-count combine per window."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        t = pa.table({"user_id": batch["user_id"], "day": pa.array(day)})
        t = t.group_by(["user_id", "day"]).aggregate([])  # batch dedupe
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        wins = (d[:, None] + np.arange(7)[None, :]).ravel()
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, 7)),
                "win_end": pa.array(wins),
                "_one": pa.array(np.ones(len(wins), np.int64)),
            }
        )

    # global (user, window) dedupe through the distributed combine,
    # then the window-bounded count
    pairs = hash_aggregate(
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None),
        ["user_id", "win_end"],
        [("_one", "min", "_one")],
        distributed_combine=True,
    )
    counts = hash_aggregate(
        pairs, ["win_end"], [("_one", "sum", "n_users")]
    )
    day0 = counts["win_end"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "win_end": pa.array(
                day0.astype("datetime64[D]").astype("datetime64[us]")
            ),
            "n_users": counts["n_users"].cast(pa.int64()),
        }
    ).sort_by("win_end")


def _q_winsorized_mean(sf_dir: str) -> pa.Table:
    """Per-returnflag 10%-winsorized mean of extended price: exact
    per-group p10/p90 boundaries (distributed quantile selection)
    broadcast into a vectorized clip + the exact-cents combine."""
    import ray as _ray
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.multiply(batch["l_extendedprice"].cast(pa.float64()), 100.0)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "cents": pc.cast(round_like_sql(c, 0), pa.int64()),
            }
        )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    cds = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    q = collect_tables(
        grouped_exact_quantiles(cds, "l_returnflag", "cents", [0.1, 0.9])
    )
    lo, hi = {}, {}
    for g, qq, v in zip(
        q["l_returnflag"].to_pylist(), q["q"].to_pylist(),
        q["value"].to_pylist(),
    ):
        (lo if qq == 0.1 else hi)[g] = float(v)
    bounds = _ray.put((lo, hi))

    def clipped(batch: pa.Table) -> pa.Table:
        lo_d, hi_d = _ray.get(bounds)
        g = batch["l_returnflag"].to_pylist()
        v = batch["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        lo_v = np.array([lo_d[x] for x in g])
        hi_v = np.array([hi_d[x] for x in g])
        w = np.minimum(np.maximum(v, lo_v), hi_v).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "_w": pa.array(w),
                "_one": pa.array(np.ones(len(w), np.int64)),
            }
        )

    out = hash_aggregate(
        cds.map_batches(clipped, batch_format="pyarrow", batch_size=None),
        ["l_returnflag"],
        [("_w", "sum", "sum_w"), ("_one", "sum", "n")],
    )
    sw = out["sum_w"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = out["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "winsor_mean": round_like_sql(sw / n / 100.0, 6),
        }
    )


def _q_contour_cases(sf_dir: str) -> pa.Table:
    """Marching-squares contour extraction at level 25.0 over the
    oracle raster: tile halo-exchange shuffle, per-tile 2x2 window
    classification (windows owned by their top-left pixel, so tile
    boundaries emit no duplicates); global case histogram.  The
    interpolated contour geometry itself is covered by the
    linear-field unit test."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_contours,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(tile=24))
    out = hash_aggregate(
        tile_contours(tiles, level=25.0),
        ["case_id"],
        [("n", "sum", "n")],
    )
    out = out.filter(pa.compute.greater_equal(out["case_id"], 0))
    return pa.table(
        {
            "case_id": out["case_id"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
        }
    ).sort_by("case_id")


def _q_contour_segments(sf_dir: str) -> pa.Table:
    """Marching-squares contour GEOMETRY at level 25.0: interpolated
    segment endpoints in global pixel coordinates, one row per (window,
    segment) -- the polyline feed (stages/raster.py::
    contour_segment_kernel; stitching covered by unit tests)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_contour_segments,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(tile=24))
    out = collect_tables(tile_contour_segments(tiles, level=25.0))
    return out.sort_by(
        [("row", "ascending"), ("col", "ascending"), ("seg", "ascending")]
    )


def _q_zonal_mode(sf_dir: str) -> pa.Table:
    """Categorical zonal statistics: per-polygon MODAL pixel value
    (deterministic tie-break: highest count, then smallest value) --
    the zonal companion of mean/min/max for classified rasters."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        PIPJoiner,
    )

    polys = _og_polygons_table()
    pts = _og_points_ds(valid_only=True)
    joined = pts.map_batches(
        PIPJoiner(polys), batch_format="pyarrow", batch_size=None
    )

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "polygon_id": batch["polygon_id"],
                "z": batch["z"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        joined.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        ["polygon_id", "z"],
        [("_one", "sum", "n")],
    ).sort_by(
        [("polygon_id", "ascending"), ("n", "descending"), ("z", "ascending")]
    )
    pid = counts["polygon_id"].to_pylist()
    keep = [i == 0 or pid[i] != pid[i - 1] for i in range(len(pid))]
    out = counts.filter(pa.array(keep))
    return pa.table(
        {
            "polygon_id": out["polygon_id"],
            "mode_z": out["z"],
            "n_mode": out["n"].cast(pa.int64()),
        }
    )


def _q_hist_equalize(sf_dir: str) -> pa.Table:
    """Raster histogram equalization: global value-CDF remap to [0,
    255] (the classic contrast stretch).  Distinct-value counts via
    the combiner (value-bounded here; the unbounded tier is the
    quantile histogram sketch), CDF built once on the driver, remap
    broadcast into a vectorized searchsorted pass over the pixel
    stream; output is the equalized histogram."""
    import ray as _ray
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    pts = _og_points_ds(valid_only=True)

    def vals(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "z": batch["z"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        pts.map_batches(vals, batch_format="pyarrow", batch_size=None),
        ["z"],
        [("_one", "sum", "n")],
    ).sort_by("z")
    z = counts["z"].to_numpy(zero_copy_only=False)
    n_per = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cdf = np.cumsum(n_per).astype(np.float64)
    n = float(cdf[-1])
    cmin = float(cdf[0])
    eq = (
        round_like_sql(255.0 * (cdf - cmin) / (n - cmin), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    lut = _ray.put((z, eq))

    def remap(batch: pa.Table) -> pa.Table:
        zs, eqs = _ray.get(lut)
        v = batch["z"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(zs, v)
        return pa.table({"eq": pa.array(eqs[pos])})

    out = partial_count(
        pts.map_batches(remap, batch_format="pyarrow", batch_size=None),
        ["eq"],
    ).rename_columns(["eq", "n_pixels"])
    return pa.table(
        {
            "eq": out["eq"].cast(pa.int64()),
            "n_pixels": out["n_pixels"].cast(pa.int64()),
        }
    ).sort_by("eq")


def _q_colocation_pairs(sf_dir: str) -> pa.Table:
    """Spatio-temporal co-location join: distinct user pairs seen in
    the SAME geocode cell within the SAME 10-minute window.  Bucket
    (cell, window) keys shuffle once; the per-bucket kernel emits the
    bucket's user pairs (bucket-bounded, never corpus-bounded)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        gx = (eid % 96) // 8  # 12x12 coarse cells
        gy = ((eid // 96) % 96) // 8
        win = ts // 600_000_000  # 10-minute windows
        t = pa.table(
            {
                "cell": pa.array((gx * 12 + gy).astype(np.int64)),
                "win": pa.array(win),
                "user_id": batch["user_id"],
            }
        )
        return t.group_by(["cell", "win", "user_id"]).aggregate([])

    buckets = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def pairs(group: pa.Table) -> pa.Table:
        users = sorted(set(group["user_id"].to_pylist()))
        a, b = [], []
        for i in range(len(users)):
            for j in range(i + 1, len(users)):
                a.append(users[i])
                b.append(users[j])
        return pa.table(
            {
                "user_a": pa.array(a, pa.int64()),
                "user_b": pa.array(b, pa.int64()),
                "_one": pa.array(np.ones(len(a), np.int64)),
            }
        )

    out = hash_aggregate(
        _grouped_by_key(buckets, ["cell", "win"], pairs),
        ["user_a", "user_b"],
        [("_one", "sum", "n_meetings")],
    )
    return pa.table(
        {
            "user_a": out["user_a"].cast(pa.int64()),
            "user_b": out["user_b"].cast(pa.int64()),
            "n_meetings": out["n_meetings"].cast(pa.int64()),
        }
    )


def _q_convoy_pairs(sf_dir: str) -> pa.Table:
    """Convoy (co-travel) detection, the trajectory-mining classic:
    user pairs co-located for >= 2 CONSECUTIVE 10-minute windows
    (same coarse cell).  Same bucket shuffle as colocation_pairs, a
    distinct (pair, window) pass, then gaps-and-islands per pair --
    run lengths in exact int64 windows.  Returns (user_a, user_b,
    max_run, n_cowindows)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, distinct,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        gx = (eid % 96) // 8
        gy = ((eid // 96) % 96) // 8
        win = ts // 600_000_000
        t = pa.table(
            {
                "cell": pa.array((gx * 12 + gy).astype(np.int64)),
                "win": pa.array(win),
                "user_id": batch["user_id"],
            }
        )
        return t.group_by(["cell", "win", "user_id"]).aggregate([])

    buckets = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)

    def pair_windows(group: pa.Table) -> pa.Table:
        users = sorted(set(group["user_id"].to_pylist()))
        win = group["win"][0].as_py()
        a, b = [], []
        for i in range(len(users)):
            for j in range(i + 1, len(users)):
                a.append(users[i])
                b.append(users[j])
        return pa.table(
            {
                "user_a": pa.array(a, pa.int64()),
                "user_b": pa.array(b, pa.int64()),
                "win": pa.array([win] * len(a), pa.int64()),
            }
        )

    pw = distinct(
        _grouped_by_key(buckets, ["cell", "win"], pair_windows),
        ["user_a", "user_b", "win"],
    )

    # segmented run analysis, fully vectorized: one pass over the
    # (pair, window)-sorted rows instead of a Python kernel per pair
    # (265k pairs at sf0.1 made per-key calls the bottleneck).  The
    # distributed tier runs this same kernel inside hash buckets.
    import pyarrow.compute as pc

    order = pc.sort_indices(
        pw,
        sort_keys=[("user_a", "ascending"), ("user_b", "ascending"),
                   ("win", "ascending")],
    )
    s = pw.take(order)
    ua = s["user_a"].to_numpy(zero_copy_only=False)
    ub = s["user_b"].to_numpy(zero_copy_only=False)
    wn = s["win"].to_numpy(zero_copy_only=False)
    if len(ua) == 0:
        return pa.table(
            {
                "user_a": pa.array([], pa.int64()),
                "user_b": pa.array([], pa.int64()),
                "max_run": pa.array([], pa.int64()),
                "n_cowindows": pa.array([], pa.int64()),
            }
        )
    new_pair = np.ones(len(ua), dtype=bool)
    new_pair[1:] = (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])
    new_island = new_pair.copy()
    new_island[1:] |= (wn[1:] - wn[:-1]) > 1
    island_start = np.flatnonzero(new_island)
    island_len = np.diff(np.append(island_start, len(ua)))
    pair_start = np.flatnonzero(new_pair)
    pair_id_of_island = (
        np.searchsorted(pair_start, island_start, side="right") - 1
    )
    n_pairs = len(pair_start)
    max_run = np.zeros(n_pairs, np.int64)
    np.maximum.at(max_run, pair_id_of_island, island_len)
    n_cowin = np.diff(np.append(pair_start, len(ua))).astype(np.int64)
    keep = max_run >= 2
    return pa.table(
        {
            "user_a": pa.array(ua[pair_start][keep]),
            "user_b": pa.array(ub[pair_start][keep]),
            "max_run": pa.array(max_run[keep]),
            "n_cowindows": pa.array(n_cowin[keep]),
        }
    )


def _q_word_triangles(sf_dir: str) -> pa.Table:
    """Triangle count of the edit-1 word graph (per-word triangle
    membership + global total): the classic graph-motif statistic,
    computed on the vocabulary-bounded edge list."""
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
    # oriented triangles a<b<c with all three edges present
    by_a: dict[str, list[str]] = {}
    for a, b in edges:
        by_a.setdefault(a, []).append(b)
    tri_count: dict[str, int] = {}
    total = 0
    for a, nbrs in by_a.items():
        nbrs = sorted(nbrs)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if (nbrs[i], nbrs[j]) in edges:
                    total += 1
                    for wv in (a, nbrs[i], nbrs[j]):
                        tri_count[wv] = tri_count.get(wv, 0) + 1
    words = sorted(tri_count)
    return pa.table(
        {
            "word": pa.array(words),
            "n_triangles": pa.array(
                [tri_count[w] for w in words], pa.int64()
            ),
        }
    )


def _q_word_components(sf_dir: str) -> pa.Table:
    """Connected components of the edit-distance-1 corpus-vocabulary
    graph: deletion-blocked pair generation (distributed), then
    min-label components; representative = lexicographically smallest
    member.  The distributed tier (iterative join + groupby-min) is
    dedup.label_propagation_clusters; the vocabulary-bounded graph
    here runs its small tier with the identical semantics."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        _cluster_pairs,
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
    # words -> ids ordered lexicographically, so min-id == min-word
    vocab = sorted(
        set(pairs["w1"].to_pylist()) | set(pairs["w2"].to_pylist())
    )
    wid = {w: i for i, w in enumerate(vocab)}
    edge_tbl = pa.table(
        {
            "a": pa.array([wid[w] for w in pairs["w1"].to_pylist()],
                          pa.int64()),
            "b": pa.array([wid[w] for w in pairs["w2"].to_pylist()],
                          pa.int64()),
        }
    )
    # tiered like the dedup entry paths: vocabulary-bounded edge lists
    # take the in-process union-find, big graphs the Ray-join rounds
    backend = "unionfind" if edge_tbl.num_rows < 100_000 else "labelprop"
    comp = _cluster_pairs(edge_tbl, backend, num_partitions=2)
    reps = comp["cluster_rep"].to_numpy(zero_copy_only=False)
    out = (
        pa.table({"rep": pa.array(reps)})
        .group_by("rep")
        .aggregate([("rep", "count")])
        .rename_columns(["rep", "n_words"])
    )
    return pa.table(
        {
            "rep_word": pa.array([vocab[int(r)] for r in
                                  out["rep"].to_pylist()]),
            "n_words": out["n_words"].cast(pa.int64()),
        }
    ).sort_by("rep_word")


def _q_word_pagerank(sf_dir: str) -> pa.Table:
    """PageRank (d=0.85, 10 fixed iterations) over the undirected
    edit-1 word graph.  Edge construction is the distributed
    deletion-blocked join; the iteration runs on the vocabulary-
    bounded adjacency (small tier -- the distributed tier is the same
    join+groupby round used by label_propagation_clusters).  Top-15
    by (rank desc, word)."""
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
    n = len(vocab)
    a = np.array([wid[w] for w in pairs["w1"].to_pylist()], np.int64)
    b = np.array([wid[w] for w in pairs["w2"].to_pylist()], np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    deg = np.bincount(src, minlength=n).astype(np.float64)
    d = 0.85
    rank = np.full(n, 1.0 / n)
    for _ in range(10):
        contrib = rank[src] / deg[src]
        incoming = np.zeros(n)
        np.add.at(incoming, dst, contrib)
        rank = (1.0 - d) / n + d * incoming
    # sort on the ROUNDED rank (word tiebreak) so ordering ties are
    # identical to the oracle's ORDER BY ROUND(r, 6) DESC, w
    r6 = (
        round_like_sql(rank, 6).to_numpy(zero_copy_only=False)
    )
    order = np.lexsort((np.array(vocab), -r6))[:15]
    return pa.table(
        {
            "word": pa.array([vocab[i] for i in order]),
            "rank": pa.array(r6[order]),
        }
    )


def _q_word_bfs_hops(sf_dir: str) -> pa.Table:
    """Multi-source BFS (min-hop <= 4) on the edit-1 word graph from
    the 5 lexicographically smallest vocabulary words -- the
    distributed Bellman-Ford rounds of stages/graph.py::bfs_min_hops
    (one grouped shuffle per hop; edges and frontier stay Datasets).
    Completes the graph family next to components / PageRank /
    triangles."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.graph import (
        bfs_min_hops,
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
    sym = pa.table(
        {
            "w1": pa.concat_arrays(
                [pairs["w1"].combine_chunks(), pairs["w2"].combine_chunks()]
            ),
            "w2": pa.concat_arrays(
                [pairs["w2"].combine_chunks(), pairs["w1"].combine_chunks()]
            ),
        }
    )
    # seeds: 5 smallest distinct vocabulary words (incl. isolated ones)
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
    )

    vocab_ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vocab = distinct(vocab_ds, ["source"])
    words = sorted(
        w for w in vocab["source"].to_pylist() if len(w) >= 4
    )
    seeds = words[:5]
    out = collect_tables(
        bfs_min_hops(ray.data.from_arrow(sym), seeds, max_hops=4)
    )
    return out


def _q_latest_event_per_user(sf_dir: str) -> pa.Table:
    """Latest row per key (SCD upsert / QUALIFY ROW_NUMBER()=1):
    per-batch vectorized candidate reduction, bounded driver combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_argmax,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    out = grouped_argmax(ds, ["user_id"], ["ts", "event_id"])
    return out.select(["user_id", "ts", "event_type", "value"]).sort_by(
        "user_id"
    )


def _q_conversion_lag(sf_dir: str) -> pa.Table:
    """Funnel latency: each purchase matched to the user's most recent
    click at or before it (ordered per-user window, vectorized
    searchsorted); per-user conversion count + mean lag seconds.  Thin
    collect over pipelines/tracks.py::conversion_lag_ds."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        conversion_lag_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    return collect_tables(conversion_lag_ds(ds)).select(
        ["user_id", "n_conversions", "avg_lag_s"]
    ).sort_by("user_id")


def _q_interevent_median(sf_dir: str) -> pa.Table:
    """Median inter-event gap per user (quantile_disc element
    selection over per-user ordered diffs)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id"],
    )

    def med(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ts = group["ts"].cast(pa.int64()).take(order).to_numpy(
            zero_copy_only=False
        )
        gaps = np.sort(np.diff(ts) / 1e6)
        if len(gaps) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "median_gap_s": pa.array([], pa.float64()),
                }
            )
        k = int(np.ceil(0.5 * len(gaps))) - 1  # quantile_disc rank
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "n_gaps": pa.array([len(gaps)], pa.int64()),
                "median_gap_s": pa.array([float(gaps[k])]),
            }
        )

    t = collect_tables(
        _grouped_by_key(ds, "user_id", med)
    )
    return pa.table(
        {
            "user_id": t["user_id"],
            "n_gaps": t["n_gaps"].cast(pa.int64()),
            "median_gap_s": round_like_sql(t["median_gap_s"], 6),
        }
    ).sort_by("user_id")


def _q_time_weighted_avg(sf_dir: str) -> pa.Table:
    """Time-weighted mean of the event value per user: each reading
    holds until the next event (LEAD weights), last reading excluded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"],
    )

    def twa(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(ts) < 2:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "twa_value": pa.array([], pa.float64()),
                }
            )
        dt = (ts[1:] - ts[:-1]) / 1e6
        tw = float((v[:-1] * dt).sum()) / float(dt.sum())
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "twa_value": pa.array([tw]),
            }
        )

    t = collect_tables(
        _grouped_by_key(ds, "user_id", twa)
    )
    return pa.table(
        {
            "user_id": t["user_id"],
            "twa_value": round_like_sql(t["twa_value"], 6),
        }
    ).sort_by("user_id")


def _q_percent_rank_qty(sf_dir: str) -> pa.Table:
    """PERCENT_RANK of each distinct quantity within its returnflag
    (bounded-cardinality rank from combiner counts, no row shuffle)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_percent_rank, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity"],
    )

    def quantize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "qty": pc.cast(
                    round_like_sql(batch["l_quantity"], 0), pa.int64()
                ),
            }
        )

    return grouped_percent_rank(
        ds.map_batches(quantize, batch_format="pyarrow", batch_size=None),
        "l_returnflag", "qty",
    )


def _q_gini_by_priority(sf_dir: str) -> pa.Table:
    """Per-priority Gini coefficient of order value: the distributed
    RANKED statistic -- one Ray sort, per-block int64 rank partials,
    ordered driver combine with running rank offsets."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_gini, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.multiply(batch["o_totalprice"].cast(pa.float64()), 100.0)
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "cents": pc.cast(round_like_sql(c, 0), pa.int64()),
            }
        )

    return grouped_gini(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        "o_orderpriority", "cents",
    )


def _q_bm25_search(sf_dir: str) -> pa.Table:
    """Okapi BM25 relevance of every document to the fixed query
    ('spark', 'join'): one tf/dl pass, corpus stats via combiner,
    vectorized scoring; top-20 by (score desc, doc_id)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        bm25_scores,
    )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        top_k,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # partial top-k per batch -- the matching-doc set is corpus-scale,
    # only k rows per block ever reach the driver
    return top_k(
        bm25_scores(ds, ["spark", "join"]), "score", 20, tiebreak="doc_id"
    )


def _q_orders_above_avg(sf_dir: str) -> pa.Table:
    """Correlated-subquery shape: per customer, how many of their
    orders exceed their OWN average order value (exact cents moments
    broadcast, vectorized compare).  The broadcast side is
    customer-bounded; past driver memory, route the same partials
    through the big-big shuffle join tier (as big_join_revenue does)
    instead of ray.put."""
    import ray as _ray
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.multiply(batch["o_totalprice"].cast(pa.float64()), 100.0)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": pc.cast(round_like_sql(c, 0), pa.int64()),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    cds = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    avg = hash_aggregate(
        cds, ["o_custkey"],
        [("cents", "sum", "sum_cents"), ("_one", "sum", "n")],
    )
    lut = _ray.put(
        (
            np.sort(avg["o_custkey"].to_numpy(zero_copy_only=False)),
            avg["sum_cents"].to_numpy(zero_copy_only=False)[
                np.argsort(avg["o_custkey"].to_numpy(zero_copy_only=False))
            ].astype(np.float64),
            avg["n"].to_numpy(zero_copy_only=False)[
                np.argsort(avg["o_custkey"].to_numpy(zero_copy_only=False))
            ].astype(np.float64),
        )
    )

    def above(batch: pa.Table) -> pa.Table:
        keys, sums, ns = _ray.get(lut)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        c = batch["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(keys, ck)
        hit = (c > sums[pos] / ns[pos]).astype(np.int64)
        return pa.table(
            {"o_custkey": batch["o_custkey"], "_hit": pa.array(hit)}
        )

    out = hash_aggregate(
        cds.map_batches(above, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [("_hit", "sum", "n_above")],
    )
    keep = pc.greater(out["n_above"], 0)
    out = out.filter(keep)
    return pa.table(
        {
            "o_custkey": out["o_custkey"].cast(pa.int64()),
            "n_above": out["n_above"].cast(pa.int64()),
        }
    )


def _q_dbscan_clusters(sf_dir: str) -> pa.Table:
    """Grid-tier DBSCAN over the jittered event point cloud: per-
    cluster size + bounding box, noise bucketed as label -1."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        grid_dbscan,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def jitter(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        # cluster structure: half the events concentrate in 4 blobs
        blob = (eid % 4).astype(np.float64)
        in_blob = ((eid // 4) % 2) == 0
        jx = ((eid * 2654435761) % 997).astype(np.float64) / 997.0
        jy = ((eid * 40503) % 991).astype(np.float64) / 991.0
        x = np.where(in_blob, blob * 10.0 + jx * 0.5, jx * 40.0)
        y = np.where(in_blob, blob * 5.0 + jy * 0.5, jy * 20.0)
        return pa.table({"x": pa.array(x), "y": pa.array(y)})

    pts = ds.map_batches(jitter, batch_format="pyarrow", batch_size=None)
    # density threshold scales with corpus size so the 4-blob/noise
    # structure is recovered at ANY sf (noise ~22 pts/cell at sf0.1
    # would otherwise pass a fixed min_count)
    min_count = max(8, ds.count() // 2000)
    labeled = grid_dbscan(pts, "x", "y", eps=0.6, min_count=min_count)

    def mark(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": batch["label"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                "x": batch["x"],
                "y": batch["y"],
            }
        )

    out = hash_aggregate(
        labeled.map_batches(mark, batch_format="pyarrow", batch_size=None),
        ["label"],
        [
            ("_one", "sum", "n"),
            ("x", "min", "x_min"),
            ("x", "max", "x_max"),
            ("y", "min", "y_min"),
            ("y", "max", "y_max"),
        ],
    ).sort_by("label")
    return pa.table(
        {
            "label": out["label"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
            "x_min": round_like_sql(out["x_min"], 6),
            "x_max": round_like_sql(out["x_max"], 6),
            "y_min": round_like_sql(out["y_min"], 6),
            "y_max": round_like_sql(out["y_max"], 6),
        }
    )


def _q_stay_points(sf_dir: str) -> pa.Table:
    """Stay-point detection per user track (Li et al. 2008): ordered
    per-user window through the groupby shuffle, O(n) kernel per
    group; per-user stay counts + total dwell."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    geo = ds.map_batches(geocode, batch_format="pyarrow", batch_size=None)

    def detect(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            stay_points,
        )

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        t = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) / 1e6
        sp = stay_points(lon, lat, t, eps=0.3, min_duration=3600.0)
        dwell = sum(s[3] - s[2] for s in sp)
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_stays": pa.array([len(sp)], pa.int64()),
                "total_dwell_s": pa.array([float(dwell)]),
            }
        )

    t = collect_tables(
        _grouped_by_key(geo, "user_id", detect)
    )
    return pa.table(
        {
            "user_id": t["user_id"],
            "n_stays": t["n_stays"],
            "total_dwell_s": round_like_sql(t["total_dwell_s"], 6),
        }
    )


def _q_chi2_independence(sf_dir: str) -> pa.Table:
    """Pearson chi-square test of independence between event type and
    ISO day-of-week: distributed contingency counts (combiner), dense
    matrix formula on the |A| x |B|-bounded table."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        chi2_independence,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # ISO day-of-week from epoch-us (1970-01-01 was a Thursday = 4)
        dow = ((ts // 86_400_000_000 + 3) % 7 + 1).astype(np.int64)
        return pa.table(
            {
                "a": batch["event_type"],
                "b": pa.array(dow),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["a", "b"],
        [("_one", "sum", "n")],
    )
    chi2, dof = chi2_independence(counts, "a", "b")
    return pa.table(
        {
            "chi2": round_like_sql(np.asarray([chi2]), 6),
            "dof": pa.array([dof], pa.int64()),
        }
    )


def _q_getis_ord(sf_dir: str) -> pa.Table:
    """Getis-Ord Gi* hot-spot z-scores of the event density field on
    the 96x96 geocode lattice (3x3 weights incl. self); top-20 hottest
    cells by z."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        getis_ord_gi_star,
    )
    import pyarrow.compute as pc

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
    z = getis_ord_gi_star(counts, 96, 96)
    idx = pc.sort_indices(
        z,
        sort_keys=[("gi_z", "descending"), ("gx", "ascending"),
                   ("gy", "ascending")],
    )[:20]
    return z.take(idx)


def _q_assoc_rules(sf_dir: str) -> pa.Table:
    """Market-basket association rules over (user, day) baskets of
    event types: pair co-occurrence counts + lift."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        association_rules,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pa.array(ts // 86_400_000_000),
                "event_type": batch["event_type"],
            }
        )

    return association_rules(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"],
        "event_type",
    )


def _q_pct_change_monthly(sf_dir: str) -> pa.Table:
    """Month-over-month revenue percent change (LAG window over the
    exact monthly cents sums)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )

    def monthly(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        days = (ts // 86_400_000_000).astype("datetime64[D]")
        month = days.astype("datetime64[M]").astype(np.int64)  # months
        cents = pc.cast(
            round_like_sql(
                pc.multiply(batch["o_totalprice"].cast(pa.float64()), 100.0),
                0,
            ),
            pa.int64(),
        )
        return pa.table({"month": pa.array(month), "cents": cents})

    out = hash_aggregate(
        ds.map_batches(monthly, batch_format="pyarrow", batch_size=None),
        ["month"],
        [("cents", "sum", "cents")],
    ).sort_by("month")
    m = out["month"].to_numpy(zero_copy_only=False)
    c = out["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
    pct = np.full(len(c), np.nan)
    if len(c) > 1:
        pct[1:] = (c[1:] - c[:-1]) / c[:-1] * 100.0
    # month int -> first-of-month timestamp for a portable column
    month_ts = m.astype("datetime64[M]").astype("datetime64[us]")
    return pa.table(
        {
            "month": pa.array(month_ts),
            "revenue": pa.array(c / 100.0),
            "pct_change": round_like_sql(pct, 6),
        }
    )


def _q_convex_hull(sf_dir: str) -> pa.Table:
    """Exact distributed convex hull of the jittered event point
    cloud (per-block Akl-Toussaint prune + monotone chain, driver
    merge of block hulls)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        convex_hull,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def jitter(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        # deterministic sub-cell jitter so the hull is non-trivial
        jx = ((eid * 2654435761) % 997).astype(np.float64) / 99700.0
        jy = ((eid * 40503) % 991).astype(np.float64) / 99100.0
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01 + jx
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01 + jy
        return pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})

    return convex_hull(
        ds.map_batches(jitter, batch_format="pyarrow", batch_size=None),
        "lon", "lat",
    )


def _q_grouping_sets(sf_dir: str) -> pa.Table:
    """GROUP BY GROUPING SETS ((flag), (status), ()): non-hierarchical
    explicit sets (distinct from ROLLUP/CUBE), one raw scan."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouping_sets_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        q = pc.multiply(batch["l_quantity"].cast(pa.float64()), 100.0)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qc": pc.cast(round_like_sql(q, 0), pa.int64()),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    out = grouping_sets_aggregate(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "l_linestatus"],
        [["l_returnflag"], ["l_linestatus"], []],
        [("qc", "sum", "sum_qty_cents"), ("_one", "sum", "n")],
    )
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty_cents": out["sum_qty_cents"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
        }
    )


def _q_markov_transitions(sf_dir: str) -> pa.Table:
    """Per-user clickstream transition counts (first-order Markov
    matrix over event types, ordered by (ts, event_id))."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        markov_transitions,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    out = markov_transitions(
        ds, "user_id", "event_type", ["ts", "event_id"]
    )
    return pa.table(
        {"src": out["src"], "dst": out["dst"], "n": out["n"].cast(pa.int64())}
    )


def _q_quantiles_cont(sf_dir: str) -> pa.Table:
    """Interpolated (PERCENTILE_CONT) exact distributed quantiles --
    two order-statistic selections per q through the same histogram
    refinement as quantiles_exact."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        exact_quantiles,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    out = exact_quantiles(
        ds, "l_extendedprice", [0.1, 0.5, 0.9, 0.99], bins=256,
        driver_cap=4096, method="cont",
    )
    return pa.table(
        {"q": out["q"], "value": round_like_sql(out["value"], 6)}
    )


def _q_approx_distinct_by_type(sf_dir: str) -> pa.Table:
    """Per-event-type HyperLogLog distinct-user estimate (grouped
    mergeable sketch; register blobs combine, never raw rows)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_approx_distinct,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    out = grouped_approx_distinct(ds, "event_type", "user_id")
    return pa.table(
        {
            "event_type": out["event_type"],
            "approx_n": round_like_sql(out["approx_n"], 6),
        }
    )


def _q_lm_logprob(sf_dir: str) -> pa.Table:
    """Per-document average bigram log-likelihood under the corpus's
    own bigram LM (CCNet-style fluency filter): distributed bigram
    counts -> big-big gram join -> broadcast first-token totals."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        bigram_lm_logprob,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bigram_lm_logprob(ds)


def _q_full_outer_activity(sf_dir: str) -> pa.Table:
    """Big-big FULL OUTER shuffle join: per-(user, day) click counts
    vs purchase counts -- unmatched rows survive on BOTH sides; per
    user, days with both / click-only / purchase-only."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        coerce_empty_blocks, hash_aggregate,
    )

    def side(event_type: str, key: str):
        ds = _read_pq(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )

        def days(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.equal(batch["event_type"], event_type))
            ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    f"{key}_user": batch["user_id"],
                    f"{key}_day": pa.array(ts // 86_400_000_000),
                    "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                }
            )

        agg = hash_aggregate(
            ds.map_batches(days, batch_format="pyarrow", batch_size=None),
            [f"{key}_user", f"{key}_day"],
            [("_one", "sum", f"{key}_n")],
            distributed_combine=True,
        )
        # groupby outputs can carry schema-less empty partitions,
        # which Arrow's hash join rejects
        return coerce_empty_blocks(
            agg,
            pa.schema(
                [(f"{key}_user", pa.int64()), (f"{key}_day", pa.int64()),
                 (f"{key}_n", pa.int64())]
            ),
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    # num_partitions sized to the aggregated (user x day) key space;
    # the join cost here is JoinOperator actor spin-up (fixed, ~2 s per
    # aggregator on this host), which amortizes on a long-running job
    joined = clicks.join(
        purchases, join_type="full_outer", num_partitions=4,
        on=("c_user", "c_day"), right_on=("p_user", "p_day"),
    )

    def mark(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [("user_id", pa.int64()), ("_both", pa.int64()),
                 ("_c_only", pa.int64()), ("_p_only", pa.int64())]
            ).empty_table()
        # Ray's full_outer coalesces the join keys into the LEFT key
        # columns; side presence comes from the value columns
        has_c = pc.is_valid(batch["c_n"])
        has_p = pc.is_valid(batch["p_n"])
        return pa.table(
            {
                "user_id": batch["c_user"],
                "_both": pc.cast(pc.and_(has_c, has_p), pa.int64()),
                "_c_only": pc.cast(
                    pc.and_(has_c, pc.invert(has_p)), pa.int64()
                ),
                "_p_only": pc.cast(
                    pc.and_(has_p, pc.invert(has_c)), pa.int64()
                ),
            }
        )

    out = hash_aggregate(
        joined.map_batches(mark, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [
            ("_both", "sum", "both_days"),
            ("_c_only", "sum", "click_only"),
            ("_p_only", "sum", "purchase_only"),
        ],
    )
    return pa.table(
        {
            "user_id": out["user_id"].cast(pa.int64()),
            "both_days": out["both_days"].cast(pa.int64()),
            "click_only": out["click_only"].cast(pa.int64()),
            "purchase_only": out["purchase_only"].cast(pa.int64()),
        }
    )


def _q_morans_i(sf_dir: str) -> pa.Table:
    """Global Moran's I (rook weights) of the event density field on
    the deterministic 96x96 geocode lattice: distributed per-cell
    counts (lattice-bounded), dense-shift cross products."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        morans_i_grid,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
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
    i = morans_i_grid(counts, 96, 96)
    return pa.table({"morans_i": round_like_sql(np.asarray([i]), 6)})


def _q_bpe_merges(sf_dir: str) -> pa.Table:
    """BPE merge training: one distributed word-count pass, then the
    deterministic vocabulary-bounded merge loop (Sennrich-style)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.bpe import (
        corpus_word_counts, train_merges,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    return train_merges(corpus_word_counts(ds), num_merges=20)


def _q_unpivot_measures(sf_dir: str) -> pa.Table:
    """Wide->long UNPIVOT of three lineitem measures (quantized to
    cents so sums are exact), then per (flag, measure) totals."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql, unpivot,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        out = {"l_returnflag": batch["l_returnflag"]}
        for src, dst in [
            ("l_quantity", "quantity"),
            ("l_extendedprice", "extendedprice"),
            ("l_discount", "discount"),
        ]:
            scaled = pc.multiply(batch[src].cast(pa.float64()), 100.0)
            out[dst] = pc.cast(round_like_sql(scaled, 0), pa.int64())
        return pa.table(out)

    wide = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    long = unpivot(
        wide, ["l_returnflag"], ["quantity", "extendedprice", "discount"],
        name_col="measure", value_col="cents",
    )
    out = hash_aggregate(
        long, ["l_returnflag", "measure"], [("cents", "sum", "sum_cents")]
    )
    total = pc.divide(out["sum_cents"].cast(pa.float64()), 100.0)
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "measure": out["measure"],
            "total": round_like_sql(total, 2),
        }
    )


def _q_doc_lengths(sf_dir: str) -> pa.Table:
    """Scalar string function parity: computed char length per doc."""
    import ray.data
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = collect_tables(
        ds.map_batches(
            lambda b: pa.table(
                {"doc_id": b["doc_id"], "len_chars": pc.utf8_length(b["text"])}
            ),
            batch_format="pyarrow", batch_size=None,
        )
    )
    return out


def _q_ann_top3(sf_dir: str) -> pa.Table:
    """ANN baseline: exact cosine top-3 for two stored query vectors."""
    import pyarrow.parquet as pq
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import brute_topk

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = tbl["vec_id"].to_numpy()
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    q_ids = [3, 77]
    queries = vecs[[int(np.nonzero(ids == q)[0][0]) for q in q_ids]]
    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    out = brute_topk(ds, queries, k=3)
    qmap = {i: q_ids[i] for i in range(len(q_ids))}
    return pa.table(
        {
            "query_id": pa.array(
                [qmap[q] for q in out["query_id"].to_pylist()], pa.int64()
            ),
            "vec_id": out["vec_id"],
            "rank": pa.array(out["rank"].to_pylist(), pa.int64()),
        }
    )


def _q_knn_join(sf_dir: str) -> pa.Table:
    """Exact cosine kNN SELF-join: top-3 neighbors for EVERY vector
    (similarity search over the whole corpus, one broadcast + one
    pass)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        knn_self_join,
    )

    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_self_join(ds, k=3)


def _q_fuzzy_match(sf_dir: str) -> pa.Table:
    """J5 fuzzy layer matching, golden scenarios of
    test_dynamic_patterns.py:20-51."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.match import (
        find_layer_by_patterns,
    )

    cases = [
        ("delhi_elevation", ["delhi_mosaic", "mumbai_data", "bangalore_slope"]),
        ("mumbai_satellite", ["mumbai_landsat_mosaic", "delhi_elevation", "chennai_aerial"]),
        ("slope_analysis", ["gradient_mosaic", "elevation_dem", "aspect_data"]),
        ("bangalore_roads", ["bengaluru_transportation_mosaic", "delhi_data", "mumbai_info"]),
        ("unknown_layer", ["some_mosaic", "other_composite", "random_data"]),
        ("nonexistent_layer", ["completely_different", "totally_unrelated", "nothing_matches"]),
    ]
    return pa.table(
        {
            "requested": [c[0] for c in cases],
            "matched": [find_layer_by_patterns(c[0], c[1]) for c in cases],
        }
    )


def _q_events_windowed(sf_dir: str) -> pa.Table:
    """Tumbling-window (1 h) aggregate over the events stream."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        add_tumbling_window,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def win(batch: pa.Table) -> pa.Table:
        out = add_tumbling_window(batch, "ts", 3600)
        return pa.table(
            {
                "window_start": out["window_start"].cast(pa.int64()),
                "value": out["value"],
            }
        )

    out = hash_aggregate(
        ds.map_batches(win, batch_format="pyarrow", batch_size=None),
        ["window_start"],
        [("value", "count", "n"), ("value", "min", "min_value"),
         ("value", "max", "max_value"), ("value", "sum", "sum_value")],
    )
    return pa.table(
        {
            "window_start": out["window_start"],
            "n": out["n"],
            "min_value": out["min_value"],
            "max_value": out["max_value"],
            "sum_value": round_like_sql(out["sum_value"], 4),
        }
    )


def _q_cell_counts_salted(sf_dir: str) -> pa.Table:
    """Same result as cell_counts, computed through the REAL shuffle
    path with explicit hot-cell salting (groupby (cell, salt) + final
    combine) -- the skew-handling tier of the north rule."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        salted_groupby_count,
    )

    pts = _og_points_ds(valid_only=True, cells=(8,))
    out = salted_groupby_count(pts, "cell_8", salt_k=4, hot_factor=5.0)
    return out.rename_columns(["cell_8", "n"])


def _q_events_sessions(sf_dir: str) -> pa.Table:
    """Session windows (30 min gap) per user over the events stream:
    groupby(user) co-locates each key, the session kernel runs per
    group (stages/window.py::add_session_key)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        add_session_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def sessions(group: pa.Table) -> pa.Table:
        out = add_session_key(group, gap_s=1800)
        n = len(set(out["session_id"].to_pylist()))
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "n_sessions": pa.array([n], pa.int64()),
            }
        )

    res = _grouped_by_key(ds, "user_id", sessions)
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    return collect_tables(res)



def _q_events_hopping(sf_dir: str) -> pa.Table:
    """Hopping windows (1 h width, 30 min hop): each event counted in
    both covering windows."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        add_hopping_windows,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def win(batch: pa.Table) -> pa.Table:
        out = add_hopping_windows(batch, "ts", width_s=3600, hop_s=1800)
        return pa.table(
            {
                "window_start": out["window_start"].cast(pa.int64()),
                "value": out["value"],
            }
        )

    return hash_aggregate(
        ds.map_batches(win, batch_format="pyarrow", batch_size=None),
        ["window_start"],
        [("value", "count", "n"), ("value", "min", "min_value"),
         ("value", "max", "max_value")],
    )


def _q_parts_by_brand(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_brand", "p_retailprice", "p_size"],
    )
    return hash_aggregate(
        ds, ["p_brand"],
        [("p_retailprice", "count", "n"),
         ("p_retailprice", "min", "min_price"),
         ("p_retailprice", "max", "max_price"),
         ("p_size", "max", "max_size")],
    )


def _q_supplier_by_nation(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, hash_aggregate,
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).rename_columns(["s_nationkey", "n_name"])
    ds = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    )
    joined = ds.map_batches(
        BroadcastLookup(nation, on="s_nationkey", take_cols=["n_name"]),
        batch_format="pyarrow", batch_size=None,
    )
    return hash_aggregate(
        joined, ["n_name"],
        [("s_suppkey", "count", "n_suppliers"),
         ("s_acctbal", "min", "min_acctbal"),
         ("s_acctbal", "max", "max_acctbal")],
    )


def _q_docs_by_source(sf_dir: str) -> pa.Table:
    """Grouped count + exact integer sum (lineage-style union stats)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "n_chars"]
    )
    return hash_aggregate(
        ds, ["source"],
        [("n_chars", "count", "n_docs"), ("n_chars", "sum", "total_chars")],
    )


def _q_stride_secondary(sf_dir: str) -> pa.Table:
    """P2: the GeoJSON second-level cap (doesSamples.py:145-150) --
    stride over the already-sampled sequence ordered by pix."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sampling import (
        secondary_stride_indices,
    )

    sampled = _q_stride_sample(sf_dir)
    idx = pc.sort_indices(sampled, sort_keys=[("pix", "ascending")])
    sampled = sampled.take(idx)
    keep = secondary_stride_indices(sampled.num_rows, max_points=500)
    return sampled.take(pa.array(keep))


def _q_knn_top3(sf_dir: str) -> pa.Table:
    """J4 with k=3: flattened (probe_id, rank, pix) rows."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import KNNLookup

    ref = collect_tables(_og_points_ds(valid_only=True))
    probes = pa.table(
        {
            "probe_id": pa.array(range(len(OG_KNN_PROBES)), pa.int64()),
            "lon": pa.array([p[0] for p in OG_KNN_PROBES]),
            "lat": pa.array([p[1] for p in OG_KNN_PROBES]),
        }
    )
    out = collect_tables(
        ray.data.from_arrow(probes).map_batches(
            KNNLookup(ref, k=3, payload_cols=("pix",)),
            batch_format="pyarrow", batch_size=None,
        )
    )
    rows = []
    for pid, pix3 in zip(out["probe_id"].to_pylist(), out["nn_pix"].to_pylist()):
        for rank, px in enumerate(pix3):
            rows.append({"probe_id": pid, "rank": rank, "pix": px})
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------- non-SQL queries
def _q_minhash_dedup(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        minhash_lsh_dedup,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return minhash_lsh_dedup(ds, sim_threshold=0.8)


def _q_simhash_dedup(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import simhash_dedup

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return simhash_dedup(ds, max_hamming=3)


def _q_embedding_neardup(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        embedding_neardup,
    )

    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_neardup(ds, threshold=0.95)


def _q_lang_id(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        TextAnnotate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = collect_tables(
        ds.map_batches(TextAnnotate(features=("lang",)), batch_format="pyarrow", batch_size=None)
    )
    return out.select(["doc_id", "lang_id"])


def _q_quality(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        TextAnnotate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = collect_tables(
        ds.map_batches(
            TextAnnotate(features=("quality", "fingerprint")), batch_format="pyarrow", batch_size=None
        )
    )
    return out.select(["doc_id", "quality", "simhash64"])


def _q_quality_features(sf_dir: str) -> pa.Table:
    """Gopher/C4-style quality features per document (the oracled
    subset of TextAnnotate: ratio features + monotone score; simhash
    stays in the no-oracle quality_scores row)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        TextAnnotate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = collect_tables(
        ds.map_batches(
            TextAnnotate(features=("quality",)), batch_format="pyarrow",
            batch_size=None,
        )
    )
    return out.select(
        ["doc_id", "mean_word_len", "punct_ratio", "digit_ratio",
         "upper_ratio", "stopword_ratio", "unique_token_ratio", "quality"]
    )


def _q_quality_filter_by_lang(sf_dir: str) -> pa.Table:
    """Per-language quality-threshold filter (corpus curation): keep
    documents whose quality score is STRICTLY above their language's
    median.  Two passes: (1) score + per-lang exact median (one
    bounded-cardinality groupby), (2) broadcast the tiny (lang, median)
    table and filter map-side.  The corpus streams twice and never
    shuffles."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        TextAnnotate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    scored = ds.map_batches(
        TextAnnotate(features=("quality",)), batch_format="pyarrow",
        batch_size=None,
    ).map_batches(
        lambda b: b.select(["doc_id", "lang", "quality"]),
        batch_format="pyarrow", batch_size=None,
    )
    med = collect_tables(
        grouped_exact_quantiles(scored, "lang", "quality", [0.5])
    ).select(["lang", "value"]).rename_columns(["lang", "_med"])

    def keep(batch: pa.Table) -> pa.Table:
        j = batch.join(med, keys="lang")
        j = j.filter(pc.greater(j["quality"], j["_med"]))
        return j.select(["doc_id", "lang", "quality"])

    out = collect_tables(
        scored.map_batches(keep, batch_format="pyarrow", batch_size=None)
    )
    return out


def _q_ivf_ann(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import ivf_topk

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = tbl["vec_id"].to_numpy()
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    queries = vecs[[int(np.nonzero(ids == q)[0][0]) for q in (3, 77)]]
    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_topk(ds, queries, k=5, n_lists=8, nprobe=4)


def _q_pq_ann(sf_dir: str) -> pa.Table:
    """Product-quantization ANN (stages/ann.py::pq_ann): bottom-k-
    seeded per-subspace Lloyd codebooks -> uint8 codes (32x smaller
    than the vectors) -> ADC table-lookup search with exact re-rank of
    the 8k-shortlist.  Iterative training -> not SQL-expressible;
    pinned-golden checked (partition-invariant by int64 accumulation)."""
    import pyarrow.parquet as pq
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import pq_ann

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = tbl["vec_id"].to_numpy()
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    queries = vecs[[int(np.nonzero(ids == q)[0][0]) for q in (3, 77)]]
    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_ann(ds, queries, k=5, m=8, ksub=32, iters=5, rerank=8)


def _q_zonal_multiband(sf_dir: str) -> pa.Table:
    """Zonal stats with the full pipeline (bbox prune + Null sentinel)
    over the synthetic multi-band fixture raster."""
    import tempfile

    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
        zonal_stats,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
        gen_polygons, gen_tiles,
    )

    d = tempfile.mkdtemp(prefix="graft_zonal_")
    p = os.path.join(d, "tiles.parquet")
    pq.write_table(gen_tiles(), p)
    out = zonal_stats(p, gen_polygons())
    return out.select(["polygon_id", "band", "count", "min", "max", "mean", "std"])



def _q_asof_join(sf_dir: str) -> pa.Table:
    """As-of join: each event gets the latest order date <= its ts
    (broadcast sorted side + vectorized binary search)."""
    import pyarrow.parquet as pq
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import AsofLookup

    dates = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate"]
    )["o_orderdate"].cast(pa.int64())
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )
    out = collect_tables(
        ds.map_batches(
            AsofLookup(pa.table({"k": dates}), ts_col="ts", out_col="asof_date_us"),
            batch_format="pyarrow", batch_size=None,
        )
    )
    return pa.table(
        {
            "event_id": out["event_id"],
            "ts_us": out["ts"].cast(pa.int64()),
            "asof_date_us": out["asof_date_us"],
        }
    )


def _q_asof_lag(sf_dir: str) -> pa.Table:
    """Big-big partitioned as-of join (the scale tier of asof_join):
    every click event gets its user's most recent purchase at-or-before
    the click's ts, plus the lag.  Both sides hash-bucket on user_id
    and shuffle ONCE; a segmented cummax merges each bucket (no
    broadcast, no per-key groups) -- stages/joins.py
    partitioned_asof_join.  Oracle: DuckDB ASOF LEFT JOIN."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        partitioned_asof_join,
    )

    ev = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "ts_us": b["ts"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", batch_size=None,
    )
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "ts"]
    )
    joined = partitioned_asof_join(
        clicks, purchases, "user_id", "ts",
        left_cols=["event_id", "ts_us"], right_cols=[],
    )
    out = collect_tables(joined)
    lag = pc.subtract(out["ts_us"], out["asof_ts"])
    return pa.table(
        {
            "event_id": out["event_id"],
            "asof_purchase_us": out["asof_ts"],
            "lag_us": lag,
        }
    )


def _q_asof_next(sf_dir: str) -> pa.Table:
    """Forward as-of (the attribution direction): every click gets its
    user's EARLIEST purchase at-or-after the click, via the same
    partitioned kernel with the timestamp negated internally.  Oracle:
    DuckDB ASOF LEFT JOIN with the <= inequality."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        partitioned_asof_join,
    )

    ev = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_id": b["event_id"],
                "ts_us": b["ts"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", batch_size=None,
    )
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "ts"]
    )
    joined = partitioned_asof_join(
        clicks, purchases, "user_id", "ts",
        left_cols=["event_id", "ts_us"], right_cols=[],
        direction="forward",
    )
    out = collect_tables(joined)
    wait = pc.subtract(out["asof_ts"], out["ts_us"])
    return pa.table(
        {
            "event_id": out["event_id"],
            "next_purchase_us": out["asof_ts"],
            "wait_us": wait,
        }
    )


_WINDOW_JOIN_US = 60 * 60 * 1_000_000  # 1-hour attribution window


def _q_window_join_clicks(sf_dir: str) -> pa.Table:
    """Per-key windowed stream-stream join (CEP/attribution shape):
    every (click, purchase) pair of the SAME user with the purchase
    inside [click_ts, click_ts + 1h].  Both sides hash-bucket on
    user_id and shuffle once; the bucket kernel resolves matches with
    per-key searchsorted windows (stages/joins.py keyed_window_join).
    Multi-match complement of asof_lag/asof_next."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        keyed_window_join,
    )

    ev = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    def side(etype: str, id_name: str):
        return ev.filter(expr=f"event_type == '{etype}'").map_batches(
            lambda b, _n=id_name: pa.table(
                {"user_id": b["user_id"], "ts": b["ts"], _n: b["event_id"]}
            ),
            batch_format="pyarrow", batch_size=None,
        )

    out = collect_tables(
        keyed_window_join(
            side("click", "click_id"), side("purchase", "purchase_id"),
            "user_id", "ts", _WINDOW_JOIN_US,
            left_id="click_id", right_id="purchase_id",
        )
    )
    return pa.table(
        {
            "user_id": out["user_id"],
            "click_id": out["click_id"],
            "purchase_id": out["purchase_id"],
        }
    )


_RANGE_JOIN_WINDOW_US = 45 * 60 * 1_000_000  # 45-minute windows


def _q_range_join(sf_dir: str) -> pa.Table:
    """Range (interval-overlap) join: every event whose id is divisible
    by 97 opens a 45-minute window; each event joins to ALL windows
    containing its instant (multi-match inner join).  The window side
    is derived by a streaming filter then broadcast (small by
    construction); the probe side streams through IntervalJoin's
    sorted-start + max-length candidate kernel."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        IntervalJoin,
        broadcast_table,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def derive_windows(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = (eid % 97) == 0
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "interval_id": eid[keep],
                "start_ts": t,
                "end_ts": t + _RANGE_JOIN_WINDOW_US,
            }
        )

    windows = collect_tables(
        ds.map_batches(derive_windows, batch_format="pyarrow", batch_size=None)
    )
    out = collect_tables(
        ds.map_batches(
            IntervalJoin(broadcast_table(windows), ts_col="ts"),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    return pa.table(
        {"event_id": out["event_id"], "interval_id": out["interval_id"]}
    )


def _q_bloom_semijoin(sf_dir: str) -> pa.Table:
    """Semi-join lineitem against urgent orders' keys via a broadcast
    Bloom prefilter + exact verify (runtime-filter pushdown: the bloom
    bits go to every read task; the exact set only sees survivors)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        BloomSemiJoin,
        broadcast_table,
    )

    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    urgent = orders.filter(
        pc.equal(orders["o_orderpriority"], "1-URGENT")
    ).select(["o_orderkey"])
    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    out = collect_tables(
        ds.map_batches(
            BloomSemiJoin(broadcast_table(urgent), on="l_orderkey"),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    if out is None:
        out = pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_linenumber": pa.array([], pa.int64()),
                "l_quantity": pa.array([], pa.float64()),
            }
        )
    return out


def _q_range_join_partitioned(sf_dir: str) -> pa.Table:
    """Same range join as _q_range_join but through the big-big tier:
    both sides shuffle on 30-minute time partitions (intervals
    replicated into every partition they overlap), the candidate
    kernel runs per group -- no broadcast of the interval side."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        partitioned_interval_join,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def derive_windows(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = (eid % 97) == 0
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "interval_id": eid[keep],
                "start_ts": t,
                "end_ts": t + _RANGE_JOIN_WINDOW_US,
            }
        )

    windows_ds = ds.map_batches(
        derive_windows, batch_format="pyarrow", batch_size=None
    )
    joined = partitioned_interval_join(
        ds, windows_ds, span_us=30 * 60 * 1_000_000, ts_col="ts"
    )
    out = collect_tables(joined)
    if out is None:
        return pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "interval_id": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {"event_id": out["event_id"], "interval_id": out["interval_id"]}
    )


def _q_big_join_revenue(sf_dir: str, strategy: str = "auto") -> pa.Table:
    """Big-big equi-join (lineitem x orders on orderkey) through the
    size-aware ``equi_join`` router: above the broadcast threshold both
    sides partition on the key via Ray Data's hash shuffle join (at
    100 TB this is the join shape where no side fits a task); at bench
    sf the orders side's on-disk hint routes it map-side broadcast,
    skipping the JoinOperator actor spin-up.  A forced-shuffle test
    pins the two tiers byte-equal.  Then the combiner-pattern aggregate
    runs on the joined stream."""
    import pyarrow.compute as pc
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join,
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(od_path, columns=["o_orderkey", "o_orderpriority"])
    joined = equi_join(
        li, od, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
        right_size_hint=_disk_bytes(od_path), strategy=strategy,
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        return pa.table(
            {"o_orderpriority": batch["o_orderpriority"], "rev": rev}
        )

    out = hash_aggregate(
        joined.map_batches(revenue, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority"],
        [("rev", "sum", "revenue"), ("rev", "count", "n_items")],
    )
    return pa.table(
        {
            "o_orderpriority": out["o_orderpriority"],
            "revenue": pc.round(out["revenue"], 2),
            "n_items": out["n_items"].cast(pa.int64()),
        }
    )


def _q_big_left_join(sf_dir: str) -> pa.Table:
    """Big-big LEFT OUTER equi-join (customer x orders) through the
    size-aware router: unmatched left rows survive with nulls -- per
    nation, total join rows and order-less customers.  At 100 TB the
    on-disk hint routes this through Ray's hash shuffle join; at bench
    sf the filtered orders side broadcasts map-side."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        equi_join,
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        _disk_bytes,
    )

    cu = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    od_path = os.path.join(sf_dir, "orders.parquet")
    od = _read_pq(
        od_path,
        columns=["o_custkey", "o_orderkey", "o_orderpriority"],
    ).map_batches(
        # restrict the right side so unmatched-left rows really exist
        # (every customer has SOME order; not every one has an urgent)
        lambda b: b.filter(
            pc.equal(b["o_orderpriority"], "1-URGENT")
        ).select(["o_custkey", "o_orderkey"]),
        batch_format="pyarrow", batch_size=None,
    )
    joined = equi_join(
        cu, od, join_type="left_outer", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
        right_size_hint=_disk_bytes(od_path),
    )

    def mark(batch: pa.Table) -> pa.Table:
        lonely = pc.cast(pc.is_null(batch["o_orderkey"]), pa.int64())
        return pa.table(
            {
                "c_nationkey": batch["c_nationkey"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                "_lonely": lonely,
            }
        )

    out = hash_aggregate(
        joined.map_batches(mark, batch_format="pyarrow", batch_size=None),
        ["c_nationkey"],
        [("_one", "sum", "n_rows"), ("_lonely", "sum", "n_lonely")],
    )
    return pa.table(
        {
            "c_nationkey": out["c_nationkey"].cast(pa.int64()),
            "n_rows": out["n_rows"].cast(pa.int64()),
            "n_lonely": out["n_lonely"].cast(pa.int64()),
        }
    )


def _q_token_frequencies(sf_dir: str) -> pa.Table:
    """Global token frequencies over the documents corpus (the classic
    webtext word-count): per-batch explode via RE2 ``\\s+`` split +
    in-batch count (Arrow C kernels end-to-end), vocab-sized partials
    combine driver-side, deterministic top-30 by (count desc, token)."""
    import pyarrow.compute as pc
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"token": toks})
        out = t.group_by(["token"]).aggregate([("token", "count")])
        return out.rename_columns(["token", "n"])

    parts = collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    merged = (
        parts.group_by(["token"]).aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    idx = pc.sort_indices(
        merged, sort_keys=[("n", "descending"), ("token", "ascending")]
    )[:30]
    out = merged.take(idx)
    return pa.table({"token": out["token"], "n": out["n"].cast(pa.int64())})


def _q_tfidf_scores(sf_dir: str) -> pa.Table:
    """Two-phase TF-IDF: a global document-frequency pass (vocab-
    bounded combiner) feeds a per-doc scoring pass through a broadcast
    idf table -- global statistics flow through the object store, the
    corpus itself never shuffles."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        broadcast_table,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        TfIdfScore,
        token_doc_frequencies,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    df_tbl = token_doc_frequencies(ds)
    n_docs = ds.count()
    idf = np.log(
        n_docs / df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    )
    idf_tbl = pa.table({"token": df_tbl["token"], "idf": idf})
    out = collect_tables(
        ds.map_batches(
            TfIdfScore(broadcast_table(idf_tbl)),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    return pa.table(
        {"doc_id": out["doc_id"], "tfidf": out["tfidf"]}
    )


def _q_grouped_quantiles(sf_dir: str) -> pa.Table:
    """Exact per-group quantiles (p25/p50/p95 of extendedprice per
    returnflag) through one groupby shuffle + in-group selection."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_exact_quantiles,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )
    out = collect_tables(
        grouped_exact_quantiles(
            ds, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.95]
        )
    )
    return out



def _q_top_docs_per_lang(sf_dir: str) -> pa.Table:
    """Per-group top-k (windowed ROW_NUMBER shape, no shuffle)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_top_k,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    return grouped_top_k(
        ds, "lang", "n_chars", k=3, descending=True, tiebreak="doc_id"
    )


def _q_quantiles(sf_dir: str) -> pa.Table:
    """Approximate quantiles of l_extendedprice via the mergeable
    histogram sketch (rows-only; accuracy asserted in pytest)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        quantile_histogram,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    h = quantile_histogram(ds, "l_extendedprice", bins=512)
    return pa.table(
        {
            "q": pa.array([0.25, 0.5, 0.75, 0.95]),
            "estimate": round_like_sql(
                [h.quantile(q) for q in (0.25, 0.5, 0.75, 0.95)], 2
            ),
        }
    )


def _q_stratified_sample(sf_dir: str) -> pa.Table:
    """Deterministic per-group (per-lang) bottom-k sample -- the
    stratified form of reservoir_sample; combiner pattern, no shuffle,
    SQL-reproducible via ROW_NUMBER over mix32_sql."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        stratified_bottomk,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "doc_id"]
    )
    out = stratified_bottomk(ds, "lang", "doc_id", k=3, seed=11)
    return out.select(["lang", "doc_id"])


def _q_quantiles_exact(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles (iterative histogram refinement;
    DuckDB quantile_disc rank convention) -- the oracled scale tier of
    the approximate sketch above."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        exact_quantiles,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    return exact_quantiles(
        ds, "l_extendedprice", [0.25, 0.5, 0.75, 0.95], bins=256,
        driver_cap=4096,
    )


def _q_reservoir_sample(sf_dir: str) -> pa.Table:
    """Deterministic bottom-k uniform sample of orders (the
    distributed reservoir-sampling stand-in; PAPERS.md motif)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        bottomk_sample,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )
    return bottomk_sample(ds, "o_orderkey", k=20, seed=7)


def _q_approx_distinct(sf_dir: str) -> pa.Table:
    """HyperLogLog distinct estimates (rows-only; accuracy asserted in
    pytest against exact counts)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        approx_distinct,
    )

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    rows = []
    for col in ("lang", "source", "text"):
        ds = _read_pq(
            os.path.join(sf_dir, "documents.parquet"), columns=[col]
        )
        est = round_like_sql([approx_distinct(ds, col)], 1)[0].as_py()
        rows.append({"column": col, "estimate": est})
    return pa.Table.from_pylist(rows)



def _q_text_cleaning(sf_dir: str) -> pa.Table:
    """C4-style line cleaning over documents (rows-only; determinism
    and rules tested in pytest)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import TextClean

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = collect_tables(
        ds.map_batches(
            TextClean(require_terminal_punct=False), batch_format="pyarrow",
            batch_size=None,
        )
    )
    return out.select(["doc_id", "n_lines_kept"])


def _q_media_decode(sf_dir: str) -> pa.Table:
    """Multimodal decode stats over REAL PNG bytes: the from-scratch
    codec decodes each payload inside the actor-pool MediaDecode
    stage; per-image mean/std come from exact integer moments.  The
    formula-pixel fixture (gen_media_grid) makes this fully
    SQL-oracled -- round 2's honest fake-decoder plumbing upgraded to
    a verified end-to-end decode (ROADMAP 'real media codecs')."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        MediaDecode, gen_media_grid,
    )

    ds = ray.data.from_arrow(gen_media_grid(n=24, size=32, n_base=16))
    out = collect_tables(
        ds.map_batches(
            MediaDecode(decoder="real"), batch_format="pyarrow", batch_size=None
        )
    )
    return pa.table(
        {
            "media_id": out["media_id"],
            "pixel_mean": round_like_sql(out["pixel_mean"], 6),
            "pixel_std": round_like_sql(out["pixel_std"], 6),
        }
    )


def _q_media_audio_metadata(sf_dir: str) -> pa.Table:
    """Compressed-audio header metadata over REAL FLAC/MP3 bytes
    (from-scratch STREAMINFO + MPEG-1 Layer III header parsers,
    byte-sniffed in the AudioMetadata stage); the fixture's
    closed-form fields are the SQL oracle."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        AudioMetadata, gen_media_audio,
    )

    ds = ray.data.from_arrow(gen_media_audio(n=12))
    out = collect_tables(
        ds.map_batches(
            AudioMetadata(), batch_format="pyarrow", batch_size=None
        )
    )
    return out.select(
        ["media_id", "fmt", "rate", "channels", "duration_seconds",
         "bitrate_kbps"]
    )


def _q_media_webm_metadata(sf_dir: str) -> pa.Table:
    """WebM/EBML demux metadata over REAL Matroska bytes (from-scratch
    RFC-8794 parser): doctype, float-element duration, track count,
    first codec -- the container sibling of media_mp4_metadata."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        MediaMetadata, gen_media_webm,
    )

    ds = ray.data.from_arrow(gen_media_webm(n=10))
    out = collect_tables(
        ds.map_batches(
            MediaMetadata(), batch_format="pyarrow", batch_size=None
        )
    )
    return out.select(
        ["media_id", "brand", "duration_seconds", "n_tracks", "codec0"]
    )


def _q_media_mp4_metadata(sf_dir: str) -> pa.Table:
    """Video-container demux metadata over REAL ISO-BMFF bytes: the
    from-scratch MP4 box parser extracts duration/timescale/tracks/
    codec inside the MediaMetadata stage; the fixture's closed-form
    fields are what the SQL oracle recomputes.  Sample decode remains
    the documented stub -- this is the metadata level curation
    pipelines filter on (round 4)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        MediaMetadata, gen_media_mp4,
    )

    ds = ray.data.from_arrow(gen_media_mp4(n=12))
    out = collect_tables(
        ds.map_batches(
            MediaMetadata(), batch_format="pyarrow", batch_size=None
        )
    )
    return out.select(
        ["media_id", "duration_seconds", "n_tracks", "codec0"]
    )


def _q_media_decode_jpeg(sf_dir: str) -> pa.Table:
    """Multimodal decode stats over REAL JPEG bytes: the from-scratch
    baseline JFIF codec (sources/media.py::decode_jpeg, VERDICT r3
    item 3) decodes each payload inside the actor-pool MediaDecode
    stage.  The flat-block fixture (gen_media_grid_jpeg) decodes
    bit-exactly, so the closed-form block rule IS the SQL oracle."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        MediaDecode, gen_media_grid_jpeg,
    )

    ds = ray.data.from_arrow(gen_media_grid_jpeg(n=18, size=32))
    out = collect_tables(
        ds.map_batches(
            MediaDecode(decoder="real"), batch_format="pyarrow", batch_size=None
        )
    )
    return pa.table(
        {
            "media_id": out["media_id"],
            "pixel_mean": round_like_sql(out["pixel_mean"], 6),
            "pixel_std": round_like_sql(out["pixel_std"], 6),
        }
    )


def _q_media_decode_flac(sf_dir: str) -> pa.Table:
    """Audio sample decode over REAL FLAC bytes: the from-scratch RFC
    9639 codec (sources/media.py::decode_flac, VERDICT r4 item 3)
    decodes each payload inside the actor-pool MediaDecode stage.
    FLAC is lossless and the fixture samples are an integer formula,
    so the closed-form moments ARE the SQL oracle."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        MediaDecode, gen_media_flac,
    )

    ds = ray.data.from_arrow(gen_media_flac(n=10))
    out = collect_tables(
        ds.map_batches(
            MediaDecode(decoder="real"), batch_format="pyarrow", batch_size=None
        )
    )
    return pa.table(
        {
            "media_id": out["media_id"],
            "pixel_mean": round_like_sql(out["pixel_mean"], 6),
            "pixel_std": round_like_sql(out["pixel_std"], 6),
        }
    )


def _q_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact n-gram-Jaccard verification of MinHash candidate pairs."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        jaccard_verify_pairs, minhash_lsh_dedup,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    clusters = minhash_lsh_dedup(ds, sim_threshold=0.8)
    pairs = [
        (int(r["cluster_rep"]), int(r["doc_id"]))
        for r in clusters.to_pylist()
        if r["doc_id"] != r["cluster_rep"]
    ][:20]
    return jaccard_verify_pairs(ds, pairs, threshold=0.8)


def _q_winnow_dedup(sf_dir: str) -> pa.Table:
    """Winnowing-fingerprint near-dup pairs (Schleimer et al. 2003 /
    MOSS): min 8-byte-shingle hash per sliding 16-window -> compact
    fingerprint sets -> postings-bounded shared-fingerprint counts ->
    containment overlap >= 0.5 of the smaller set."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        winnow_dedup,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return winnow_dedup(ds)


def _q_passage_dedup(sf_dir: str) -> pa.Table:
    """Exact passage dedup accounting (C4-style repeated-span rule over
    disjoint 10-token spans): per-doc span totals, corpus-duplicated
    span counts (first occurrence by (doc_id, span_idx) keeps), and the
    duplication ratio."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        passage_dedup_stats,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return passage_dedup_stats(ds)


# Deterministic URL synthesis over the documents table, mirrored
# literally by _URL_SQL (the oracle builds the identical string in SQL).
# Exercises every parser branch: www/bare hosts, plain and compound
# (co.uk-style) public suffixes, optional query strings.
_URL_SUFFIXES = (".example.com", ".site.co.uk", ".news.org")


def _synth_urls(batch: pa.Table) -> pa.Table:
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = batch["source"].to_numpy(zero_copy_only=False).astype(str)
    www = np.where(doc % 2 == 0, "www.", "")
    suf = np.asarray(_URL_SUFFIXES, dtype=object)[doc % 3].astype(str)
    q = np.where(
        doc % 5 == 0,
        np.char.add("?q=", (doc % 7).astype(str)),
        "",
    )
    url = np.char.add(
        np.char.add(
            np.char.add(np.char.add("https://", www), np.char.add(src, suf)),
            np.char.add("/p/", doc.astype(str)),
        ),
        q,
    )
    out = batch.append_column("url", pa.array(url.astype(object), pa.string()))
    return out


_URL_SQL = (
    "'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END || "
    "source || CASE doc_id % 3 WHEN 0 THEN '.example.com' "
    "WHEN 1 THEN '.site.co.uk' ELSE '.news.org' END || "
    "'/p/' || CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 5 = 0 THEN '?q=' || CAST(doc_id % 7 AS VARCHAR) "
    "ELSE '' END"
)


# Messy URL synthesis for the canonicalization operators: every
# component is a function of doc_id % 100, so each canonical URL
# recurs every 100 docs (genuine dup groups) and the variations hit
# every canonicalization branch -- scheme/host case, default vs real
# port, unsorted query params, fragments.  Mirrored by _MESSY_URL_SQL.
def _synth_messy_urls(batch: pa.Table) -> pa.Table:
    doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = doc % 100
    scheme = np.where(d % 11 == 0, "HTTPS", "https")
    hostc = np.where(d % 3 == 0, "WWW.H", "www.h")
    host = np.char.add(
        np.char.add(hostc, (d % 10).astype(str)), ".example.com"
    )
    port = np.select([d % 7 == 0, d % 7 == 1], [":443", ":8080"], "")
    path = np.char.add("/a/", (d % 5).astype(str))
    q = np.where(
        d % 2 == 0,
        np.char.add(
            np.char.add("?b=", (d % 3).astype(str)),
            np.char.add("&a=", (d % 4).astype(str)),
        ),
        "",
    )
    frag = np.where(d % 13 == 0, "#f", "")
    url = np.char.add(
        np.char.add(
            np.char.add(np.char.add(scheme, "://"), np.char.add(host, port)),
            np.char.add(path, q),
        ),
        frag,
    )
    return batch.append_column("url", pa.array(url.astype(object), pa.string()))


_MESSY_URL_SQL = (
    "CASE WHEN (doc_id % 100) % 11 = 0 THEN 'HTTPS' ELSE 'https' END "
    "|| '://' || "
    "CASE WHEN (doc_id % 100) % 3 = 0 THEN 'WWW.H' ELSE 'www.h' END "
    "|| CAST((doc_id % 100) % 10 AS VARCHAR) || '.example.com' || "
    "CASE WHEN (doc_id % 100) % 7 = 0 THEN ':443' "
    "WHEN (doc_id % 100) % 7 = 1 THEN ':8080' ELSE '' END || "
    "'/a/' || CAST((doc_id % 100) % 5 AS VARCHAR) || "
    "CASE WHEN (doc_id % 100) % 2 = 0 THEN "
    "'?b=' || CAST((doc_id % 100) % 3 AS VARCHAR) || "
    "'&a=' || CAST((doc_id % 100) % 4 AS VARCHAR) ELSE '' END || "
    "CASE WHEN (doc_id % 100) % 13 = 0 THEN '#f' ELSE '' END"
)


def _q_url_canonicalize(sf_dir: str) -> pa.Table:
    """Per-row URL canonicalization (functions/url.py): lowercase
    scheme/host, default-port strip, path default, query-param sort,
    fragment drop -- the normalization pass that precedes URL-level
    dedup in a web-corpus pipeline."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        canonicalize_urls,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def canon(batch: pa.Table) -> pa.Table:
        b = _synth_messy_urls(batch)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "canonical_url": canonicalize_urls(b["url"]),
            }
        )

    return collect_tables(
        ds.map_batches(canon, batch_format="pyarrow", batch_size=None)
    )


def _q_url_dedup(sf_dir: str) -> pa.Table:
    """URL-level exact dedup over canonical URLs: per canonical form,
    the page count and the kept doc (first by doc_id) -- combiner-
    shaped (per-batch partial count/min, tiny combine)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        canonicalize_urls,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def canon(batch: pa.Table) -> pa.Table:
        b = _synth_messy_urls(batch)
        return pa.table(
            {
                "canonical_url": canonicalize_urls(b["url"]),
                "doc_id": b["doc_id"],
            }
        )

    out = hash_aggregate(
        ds.map_batches(canon, batch_format="pyarrow", batch_size=None),
        ["canonical_url"],
        [("doc_id", "count", "n_pages"), ("doc_id", "min", "keeper")],
    )
    return pa.table(
        {
            "canonical_url": out["canonical_url"],
            "n_pages": out["n_pages"].cast(pa.int64()),
            "keeper": out["keeper"].cast(pa.int64()),
        }
    )


def _url_sql_field(name: str) -> str:
    """DuckDB expression for one parsed URL component of the column
    ``url`` (same RE2 patterns as the engine parser)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        sql_url_exprs,
    )

    return sql_url_exprs("url")[name]


def _canon_sql_expr() -> str:
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        sql_canonical_expr,
    )

    return sql_canonical_expr("url")


def _url_parse_fields_oracle_sql() -> str:
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        sql_url_exprs,
    )

    fields = ", ".join(
        f"{expr} AS {name}" for name, expr in sql_url_exprs("url").items()
    )
    return (
        f"SELECT doc_id, {fields} FROM "
        f"(SELECT doc_id, {_URL_SQL} AS url FROM documents)"
    )


def _q_url_parse_fields(sf_dir: str) -> pa.Table:
    """Per-row URL component extraction (functions/url.py): one RE2
    pass per field over the synthesized corpus URL column; the oracle
    runs the same patterns through DuckDB's regexp_extract (also RE2),
    so the two agree on every row including absent components."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        parse_urls,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )

    def parse(batch: pa.Table) -> pa.Table:
        b = _synth_urls(batch)
        parsed = parse_urls(b["url"])
        return parsed.add_column(0, "doc_id", b["doc_id"])

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    return collect_tables(
        ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
    )


def _q_url_domain_stats(sf_dir: str) -> pa.Table:
    """Per-registered-domain corpus statistics (the per-domain rollup a
    web-corpus curation pipeline runs first): page count, distinct
    hosts, total chars.  Combiner-shaped: per-batch parse + partial
    aggregate, tiny combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        parse_urls,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )

    def parse(batch: pa.Table) -> pa.Table:
        b = _synth_urls(batch)
        parsed = parse_urls(b["url"])
        return pa.table(
            {
                "registered_domain": parsed["registered_domain"],
                "host": parsed["host"],
                "n_chars": b["n_chars"],
            }
        )

    parsed = ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
    stats = hash_aggregate(
        parsed, ["registered_domain"],
        [("n_chars", "count", "n_pages"), ("n_chars", "sum", "sum_chars")],
    )
    hosts = (
        distinct(parsed, ["registered_domain", "host"])
        .group_by("registered_domain")
        .aggregate([("host", "count")])
    )
    out = stats.join(hosts, keys="registered_domain")
    return pa.table(
        {
            "registered_domain": out["registered_domain"],
            "n_pages": out["n_pages"].cast(pa.int64()),
            "n_hosts": out["host_count"].cast(pa.int64()),
            "sum_chars": out["sum_chars"].cast(pa.int64()),
        }
    )


def _q_domain_cap_sample(sf_dir: str) -> pa.Table:
    """Per-host document cap (RefinedWeb-style: keep at most K=3 pages
    per host, deterministic first-by-doc_id order): the windowed
    ROW_NUMBER <= k shape via per-batch partial top-k, no shuffle."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
        parse_urls,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_top_k,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )

    def parse(batch: pa.Table) -> pa.Table:
        b = _synth_urls(batch)
        parsed = parse_urls(b["url"])
        return pa.table({"host": parsed["host"], "doc_id": b["doc_id"]})

    # host cardinality is data-proportional (grows with the corpus), so
    # the combine is the distributed tier: the driver never holds
    # k x n_hosts rows, only this bench-scale result collect does
    out_ds = grouped_top_k(
        ds.map_batches(parse, batch_format="pyarrow", batch_size=None),
        "host", "doc_id", 3, descending=False, distributed_combine=True,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    out = collect_tables(out_ds)
    return pa.table(
        {
            "host": out["host"],
            "doc_id": out["doc_id"],
            "rank": out["rank"],
        }
    )


def _pages_docs_fixture(sf_dir: str) -> str:
    """Write the documents-derived pages corpus (deterministic doc_id
    formulas; see pipelines/pages.py::synthesize_pages_from_documents)
    to a temp parquet directory and return its path."""
    import tempfile

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
        synthesize_pages_from_documents,
    )

    docs = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    d = tempfile.mkdtemp(prefix="graft_pages_docs_")
    synthesize_pages_from_documents(docs).write_parquet(d)
    return d


def _q_pages_flagship(sf_dir: str) -> pa.Table:
    """The graft flagship (extract -> geocode -> cell -> PIP ->
    tagged-partial count) over a DOCUMENTS-derived pages corpus whose
    geo fields are integer formulas of doc_id -- so the DuckDB oracle
    replays geocode -> cell -> count independently over the driver's
    ``documents`` view while the engine runs the REAL html extraction
    with the per-row invariant check (VERDICT r4 item 2: the flagship
    row is driver-verifiable, no more ``no_oracle``)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
        pages_flagship,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
        gen_polygons,
    )

    p = _pages_docs_fixture(sf_dir)
    out = pages_flagship(p, polygons=gen_polygons(), res=8)
    return out["cell_counts"]


def _q_pages_flagship_shuffle(sf_dir: str) -> pa.Table:
    """The flagship with the SCALE-tier combine forced
    (combine_tier='shuffle': distributed hash-bucket groupby-sum, no
    driver concat of partials) -- same documents-derived corpus and
    same oracle as pages_flagship, the pip_join/pip_join_sharded
    pattern applied to the metric pipeline (VERDICT r3 item 1)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
        pages_flagship,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
        gen_polygons,
    )

    p = _pages_docs_fixture(sf_dir)
    out = pages_flagship(
        p, polygons=gen_polygons(), res=8, combine_tier="shuffle"
    )
    return out["cell_counts"]


def _q_grid_variogram(sf_dir: str) -> pa.Table:
    """Empirical semivariogram of the sparse DEM along the easting
    axis at lags 1/2/4/8 pixels (the geostatistician's first look at
    spatial autocorrelation, Matheron 1963): gamma(h) = sum (z_a -
    z_b)^2 / (2 n_h) over valid within-tile pixel pairs.  Per-tile
    vectorized shifted-diff partials in exact integer deci-units
    (z*10 is an integer by construction, recoverable from the float32
    exactly), one combine, one float division per lag -- the corpus
    never shuffles, partial volume is O(tiles x lags)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    lags = (1, 2, 4, 8)
    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True))

    def partial(batch: pa.Table) -> pa.Table:
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        vals = batch["values"]
        out_h, out_n, out_s = [], [], []
        for i in range(batch.num_rows):
            v = np.asarray(vals[i].as_py(), np.float32).reshape(hs[i], ws[i])
            valid = v > -1e30
            k = np.zeros(v.shape, np.int64)
            k[valid] = np.round(v[valid].astype(np.float64) * 10.0).astype(
                np.int64
            )
            for h in lags:
                both = valid[:, :-h] & valid[:, h:]
                d = k[:, :-h][both] - k[:, h:][both]
                out_h.append(h)
                out_n.append(int(both.sum()))
                out_s.append(int((d * d).sum()))
        return pa.table(
            {
                "lag": pa.array(out_h, pa.int64()),
                "n_pairs": pa.array(out_n, pa.int64()),
                "sum_d2": pa.array(out_s, pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["lag"],
        [("n_pairs", "sum", "n_pairs"), ("sum_d2", "sum", "sum_d2")],
    ).sort_by("lag")
    n = agg["n_pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = agg["sum_d2"].to_numpy(zero_copy_only=False).astype(np.float64)
    gamma = s / (2.0 * n * 100.0)
    return pa.table(
        {
            "lag": agg["lag"],
            "n_pairs": agg["n_pairs"],
            "gamma": round_like_sql(gamma, 6),
        }
    )


def _q_rfm_segments(sf_dir: str) -> pa.Table:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles, the classic marketing-analytics operator): per-customer
    aggregates via the combiner tier, then exact NTILE(4) assignment
    (DuckDB semantics: first n%4 tiles get the extra row; ties pinned
    by customer id) and counts per (r,f,m) segment."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int as _si,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64())
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "last_us": ts,
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                "cents": pa.array(_si(batch["o_totalprice"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [
            ("last_us", "max", "last_us"),
            ("_one", "sum", "n_orders"),
            ("cents", "sum", "cents"),
        ],
    )
    cust = agg["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(cust)

    def ntile4(metric: np.ndarray) -> np.ndarray:
        order = np.lexsort((cust, metric))
        base, extra = divmod(m, 4)
        sizes = [base + (1 if i < extra else 0) for i in range(4)]
        tile = np.empty(m, np.int64)
        pos = 0
        for i, sz in enumerate(sizes):
            tile[order[pos : pos + sz]] = i + 1
            pos += sz
        return tile

    r_q = ntile4(agg["last_us"].to_numpy(zero_copy_only=False).astype(np.int64))
    f_q = ntile4(agg["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64))
    m_q = ntile4(agg["cents"].to_numpy(zero_copy_only=False).astype(np.int64))
    seg = r_q * 100 + f_q * 10 + m_q
    vals, counts = np.unique(seg, return_counts=True)
    return pa.table(
        {
            "segment": pa.array(vals, pa.int64()),
            "n_customers": pa.array(counts.astype(np.int64)),
        }
    )


# frozen road network for map matching: 6 segments inside the event
# geocode extent (lon [77.0, 77.96], lat [28.05, 29.0]); no two
# segments parallel, so nearest-segment ties cannot occur off a
# measure-zero set.
OG_SEGMENTS = [
    (1, 77.05, 28.10, 77.90, 28.20),
    (2, 77.10, 28.90, 77.85, 28.75),
    (3, 77.20, 28.15, 77.30, 28.95),
    (4, 77.60, 28.10, 77.70, 28.85),
    (5, 77.05, 28.50, 77.95, 28.55),
    (6, 77.40, 28.30, 77.55, 28.60),
]


def _q_map_match(sf_dir: str) -> pa.Table:
    """Map matching: snap every geocoded event to the nearest segment
    of a (broadcast-constant) road network by point-to-segment
    projection -- vectorized per batch against all segments at once,
    argmin with segment-id tie-break, per-segment match count + mean
    snap offset from exact micro-unit sums.  The network is the
    classic broadcast small side: constant per task, never shuffled."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def match(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        px = 77.0 + (eid % 96).astype(np.float64) * 0.01
        py = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        best_d2 = np.full(len(eid), np.inf)
        best_seg = np.zeros(len(eid), np.int64)
        for seg_id, ax, ay, bx, by in OG_SEGMENTS:
            len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
            t = ((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / len2
            tc = np.clip(t, 0.0, 1.0)
            dx = px - (ax + tc * (bx - ax))
            dy = py - (ay + tc * (by - ay))
            d2 = dx * dx + dy * dy
            # first-wins on exact ties == ORDER BY d2, seg_id
            take = d2 < best_d2
            best_d2[take] = d2[take]
            best_seg[take] = seg_id
        um = round_half_away(np.sqrt(best_d2) * 1e6).astype(np.int64)
        return pa.table(
            {
                "seg_id": pa.array(best_seg),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "um": pa.array(um),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(match, batch_format="pyarrow", batch_size=None),
        ["seg_id"],
        [("_one", "sum", "n_matched"), ("um", "sum", "sum_um")],
    ).sort_by("seg_id")
    n = agg["n_matched"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = agg["sum_um"].to_numpy(zero_copy_only=False).astype(np.float64)
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    return pa.table(
        {
            "seg_id": agg["seg_id"],
            "n_matched": agg["n_matched"],
            "sum_um": agg["sum_um"],
            "mean_offset": round_like_sql(s / (n * 1e6), 6),
        }
    )


def _q_seasonal_mase(sf_dir: str) -> pa.Table:
    """Seasonal-naive forecast quality per event type: daily counts
    (combiner tier) on the shared calendar extent, then the ratio of
    the weekly-seasonal MAE to the one-step-naive MAE (the MASE
    denominator convention, Hyndman & Koehler 2006) -- absolute
    errors stay exact int64, one float expression at the end."""
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
                "d": pa.array(us // 86_400_000_000),
                "_one": pa.array(np.ones(len(us), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "d"],
        [("_one", "sum", "x")],
    )
    ty = agg["event_type"].to_numpy(zero_copy_only=False)
    d = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(d.min()), int(d.max())
    n = hi - lo + 1
    out_t, out_s7, out_s1, out_m = [], [], [], []
    for t in sorted(set(ty.tolist())):
        series = np.zeros(n, np.int64)
        sel = ty == t
        series[d[sel] - lo] = x[sel]
        sae7 = int(np.abs(series[7:] - series[:-7]).sum())
        sae1 = int(np.abs(series[1:] - series[:-1]).sum())
        mase = (float(sae7) / float(n - 7)) / (float(sae1) / float(n - 1))
        out_t.append(t)
        out_s7.append(sae7)
        out_s1.append(sae1)
        out_m.append(mase)
    return pa.table(
        {
            "event_type": pa.array(out_t),
            "sae_seasonal": pa.array(out_s7, pa.int64()),
            "sae_naive": pa.array(out_s1, pa.int64()),
            "mase": round_like_sql(out_m, 6),
        }
    )


def _q_band_correlation(sf_dir: str) -> pa.Table:
    """Pearson correlation between the two raster bands over
    both-valid cells (the band-redundancy screen before index math):
    per-tile exact int64 deci-unit cross moments via the band-aligned
    zip, one shared float expression."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def moments(batch: pa.Table) -> pa.Table:
        # group the batch's tiles by (row_off, col_off): band 1 and 2
        # of the same window may arrive in any order
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        n = s1 = s2 = q1 = q2 = s12 = 0
        partial_rows = {"n": [], "s1": [], "s2": [], "q1": [], "q2": [], "s12": []}
        for key, bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            v1, v2 = bands[1], bands[2]
            ok = (v1 > -1e30) & (v2 > -1e30)
            k1 = np.round(v1[ok].astype(np.float64) * 10.0).astype(np.int64)
            k2 = np.round(v2[ok].astype(np.float64) * 10.0).astype(np.int64)
            n += int(ok.sum())
            s1 += int(k1.sum())
            s2 += int(k2.sum())
            q1 += int((k1 * k1).sum())
            q2 += int((k2 * k2).sum())
            s12 += int((k1 * k2).sum())
        for k, v in zip(
            ("n", "s1", "s2", "q1", "q2", "s12"),
            (n, s1, s2, q1, q2, s12),
        ):
            partial_rows[k].append(v)
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in partial_rows.items()}
        )

    # one partial row per batch; tiny driver combine
    parts = hash_aggregate(
        tiles.map_batches(
            moments, batch_format="pyarrow", batch_size=None
        ).map_batches(
            lambda b: b.append_column(
                "_g", pa.array(np.zeros(b.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["_g"],
        [(c, "sum", c) for c in ("n", "s1", "s2", "q1", "q2", "s12")],
    )
    n = float(parts["n"][0].as_py())
    s1 = float(parts["s1"][0].as_py())
    s2 = float(parts["s2"][0].as_py())
    q1 = float(parts["q1"][0].as_py())
    q2 = float(parts["q2"][0].as_py())
    s12 = float(parts["s12"][0].as_py())
    num = s12 - s1 * s2 / n
    den = np.sqrt((q1 - s1 * s1 / n) * (q2 - s2 * s2 / n))
    return pa.table(
        {
            "n_cells": pa.array([int(n)], pa.int64()),
            "pearson_r": round_like_sql([num / den], 6),
        }
    )


def _q_field_divergence(sf_dir: str) -> pa.Table:
    """Divergence of the (band1, band2) vector field by central
    differences at tile-interior cells (the vector-calculus raster
    op behind flow/wind analysis): all four neighbors and both bands
    must be valid, exact deci-unit differences, one division per
    cell.  Within-tile stencil; the SQL mirror repeats the interior
    predicate."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def div(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        hw: dict[tuple[int, int], tuple[int, int]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            h = batch["height"][i].as_py()
            w = batch["width"][i].as_py()
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = (
                np.asarray(batch["values"][i].as_py(), np.float32).reshape(
                    h, w
                )
            )
            hw[key] = (h, w)
        out_r, out_c, out_d = [], [], []
        for (r0, c0), bands in by_pos.items():
            if 1 not in bands or 2 not in bands:
                continue
            u, v = bands[1], bands[2]
            h, w = hw[(r0, c0)]
            uk = np.zeros((h, w), np.int64)
            vk = np.zeros((h, w), np.int64)
            uok = u > -1e30
            vok = v > -1e30
            uk[uok] = np.round(u[uok].astype(np.float64) * 10.0).astype(
                np.int64
            )
            vk[vok] = np.round(v[vok].astype(np.float64) * 10.0).astype(
                np.int64
            )
            ok = (
                uok[1:-1, :-2] & uok[1:-1, 2:]
                & vok[:-2, 1:-1] & vok[2:, 1:-1]
            )
            # du/dx + dv/dy in deci-units per cell width (0.01 deg);
            # y increases downward on the grid, so dv/dy uses
            # (row+1) - (row-1)
            dnum = (
                (uk[1:-1, 2:] - uk[1:-1, :-2])
                + (vk[2:, 1:-1] - vk[:-2, 1:-1])
            )
            rr, cc = np.nonzero(ok)
            out_r.extend((rr + 1 + r0).tolist())
            out_c.extend((cc + 1 + c0).tolist())
            out_d.extend(
                (
                    dnum[rr, cc].astype(np.float64) / (2.0 * 10.0 * 0.01)
                ).tolist()
            )
        return pa.table(
            {
                "row": pa.array(out_r, pa.int64()),
                "col": pa.array(out_c, pa.int64()),
                "divergence": round_like_sql(out_d, 6),
            }
        )

    return collect_tables(
        tiles.map_batches(div, batch_format="pyarrow", batch_size=None)
    ).sort_by([("row", "ascending"), ("col", "ascending")])


def _q_lsh_blocking_audit(sf_dir: str) -> pa.Table:
    """LSH banding audit over the minhash_estimate subset: 4 bands x
    4 rows of the 16 mix32 minhashes; candidate pairs share at least
    one full band signature.  Reports reduction ratio (candidates /
    all pairs) and recall against exact Jaccard >= 0.5 -- the
    blocking-quality audit run before committing to a dedup design."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

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
            grams = {" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)}
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
    gid = np.searchsorted(uniq, gram) + 1
    docs = sorted(int(u) for u in np.unique(doc))
    sets = {u: set(gid[doc == u].tolist()) for u in docs}
    mh = {
        u: [
            int(mix32(np.array(sorted(sets[u]), np.int64) + s, 0).min())
            for s in range(16)
        ]
        for u in docs
    }
    bands = {
        u: [tuple(mh[u][b * 4 : b * 4 + 4]) for b in range(4)] for u in docs
    }
    n_docs = len(docs)
    all_pairs = n_docs * (n_docs - 1) // 2
    cand = dup = hit = 0
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            is_cand = any(bands[a][k] == bands[b][k] for k in range(4))
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            is_dup = inter * 2 >= union  # exact jaccard >= 0.5
            cand += int(is_cand)
            dup += int(is_dup)
            hit += int(is_cand and is_dup)
    recall = float(hit) / float(dup) if dup else float("nan")
    return pa.table(
        {
            "n_pairs": pa.array([all_pairs], pa.int64()),
            "n_candidates": pa.array([cand], pa.int64()),
            "n_true_dups": pa.array([dup], pa.int64()),
            "recall": round_like_sql([recall], 6),
            "reduction_ratio": round_like_sql(
                [float(cand) / float(all_pairs)], 6
            ),
        }
    )


def _q_join_counts(sf_dir: str) -> pa.Table:
    """Join-count statistics (Cliff-Ord) for the binary above-mean
    event-density surface on the 96x96 geocode lattice: BB / BW / WW
    rook-adjacent pair counts -- the categorical-data complement to
    Moran's I / Geary's C.  The black rule 9216*n > total is an exact
    integer comparison (no mean division), so every reported number
    is an order-independent int64: distributed per-cell counts
    (lattice-bounded), dense integer shifts driver-side."""
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
    tot = int(grid.sum())
    black = (grid * 9216 > tot).astype(np.int64)
    bh_a, bh_b = black[:, :-1], black[:, 1:]
    bv_a, bv_b = black[:-1, :], black[1:, :]
    bb = int((bh_a & bh_b).sum()) + int((bv_a & bv_b).sum())
    bw = int((bh_a ^ bh_b).sum()) + int((bv_a ^ bv_b).sum())
    n_pairs = 2 * 96 * 95
    return pa.table(
        {
            "n_black": pa.array([int(black.sum())], pa.int64()),
            "bb": pa.array([bb], pa.int64()),
            "bw": pa.array([bw], pa.int64()),
            "ww": pa.array([n_pairs - bb - bw], pa.int64()),
        }
    )


def _q_fractal_boxcount(sf_dir: str) -> pa.Table:
    """Box-counting dimension of the low-elevation cell set (valid
    and z < 5) on the slope-fixture raster: occupied-box counts at
    scales 1/2/4/8/16 via a distributed distinct (per-tile box
    emission -> global dedup; boxes straddling tile edges merge in
    the groupby), then the log-log regression slope from quantized
    LN terms (exact HUGEINT-safe integer moments, one float division
    -- the zipf_slope discipline)."""
    import math

    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    scales = (1, 2, 4, 8, 16)

    def boxes(batch: pa.Table) -> pa.Table:
        out_s, out_b = [], []
        for i in range(batch.num_rows):
            h = batch["height"][i].as_py()
            w = batch["width"][i].as_py()
            r0 = batch["row_off"][i].as_py()
            c0 = batch["col_off"][i].as_py()
            z = np.asarray(batch["values"][i].as_py(), np.float32).reshape(h, w)
            rr, cc = np.nonzero((z > -1e30) & (z < 5.0))
            rr = rr.astype(np.int64) + r0
            cc = cc.astype(np.int64) + c0
            for s in scales:
                b = np.unique((rr // s) * 1024 + cc // s)
                out_s.extend([s] * len(b))
                out_b.extend(b.tolist())
        return pa.table(
            {
                "scale": pa.array(out_s, pa.int64()),
                "box": pa.array(out_b, pa.int64()),
            }
        )

    occ = partial_count(
        tiles.map_batches(boxes, batch_format="pyarrow", batch_size=None),
        ["scale", "box"],
    )
    per = {s: 0 for s in scales}
    for s in occ["scale"].to_numpy(zero_copy_only=False).tolist():
        per[int(s)] += 1
    # quantized log-log OLS: u = ln(1/s), v = ln N(s), both at 1e12
    us = [int(round(math.log(1.0 / s) * 1e12)) for s in scales]
    vs = [int(round(math.log(float(per[s])) * 1e12)) for s in scales]
    k = len(scales)
    su, sv = sum(us), sum(vs)
    suv = sum(u * v for u, v in zip(us, vs))
    suu = sum(u * u for u in us)
    dim = float(k * suv - su * sv) / float(k * suu - su * su)
    return pa.table(
        {
            "n1": pa.array([per[1]], pa.int64()),
            "n2": pa.array([per[2]], pa.int64()),
            "n4": pa.array([per[4]], pa.int64()),
            "n8": pa.array([per[8]], pa.int64()),
            "n16": pa.array([per[16]], pa.int64()),
            "box_dim": round_like_sql([dim], 6),
        }
    )


def _q_polygon_iou(sf_dir: str) -> pa.Table:
    """Intersection-over-union of the two overlapping fixture
    polygons, discretized on the grid's cell centers (the
    segmentation-mask IoU metric): memberships via the identical
    strict half-plane tests, pure integer counts, one division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    q0 = OG_POLYGONS["q0"]
    q1 = OG_POLYGONS["q1"]

    def member(lon, lat, poly):
        ok = np.ones(len(lon), bool)
        n = len(poly)
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            ok &= (bx - ax) * (lat - ay) - (by - ay) * (lon - ax) > 0
        return ok

    def counts(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        m0 = member(lon, lat, q0)
        m1 = member(lon, lat, q1)
        return pa.table(
            {
                "_g": pa.array(np.zeros(1, np.int64)),
                "n_a": pa.array([int(m0.sum())], pa.int64()),
                "n_b": pa.array([int(m1.sum())], pa.int64()),
                "inter": pa.array([int((m0 & m1).sum())], pa.int64()),
            }
        )

    agg = hash_aggregate(
        _og_points_ds().map_batches(
            counts, batch_format="pyarrow", batch_size=None
        ),
        ["_g"],
        [(c, "sum", c) for c in ("n_a", "n_b", "inter")],
    )
    na = int(agg["n_a"][0].as_py())
    nb = int(agg["n_b"][0].as_py())
    inter = int(agg["inter"][0].as_py())
    union = na + nb - inter
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "inter": pa.array([inter], pa.int64()),
            "iou": round_like_sql([float(inter) / float(union)], 6),
        }
    )


def _q_raster_kappa(sf_dir: str) -> pa.Table:
    """Cohen's kappa between the two bands' high-value masks
    (deci k > 250, i.e. z > 25) over both-valid cells -- the
    classification-agreement metric for change-detection maps.
    Confusion counts are exact int64; po/pe/kappa is one pinned
    float chain."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def confusion(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        n11 = n10 = n01 = n00 = 0
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
            a = k1 > 250
            p = k2 > 250
            n11 += int((a & p).sum())
            n10 += int((a & ~p).sum())
            n01 += int((~a & p).sum())
            n00 += int((~a & ~p).sum())
        return pa.table(
            {
                "_g": pa.array(np.zeros(1, np.int64)),
                "n11": pa.array([n11], pa.int64()),
                "n10": pa.array([n10], pa.int64()),
                "n01": pa.array([n01], pa.int64()),
                "n00": pa.array([n00], pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(confusion, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in ("n11", "n10", "n01", "n00")],
    )
    n11 = int(agg["n11"][0].as_py())
    n10 = int(agg["n10"][0].as_py())
    n01 = int(agg["n01"][0].as_py())
    n00 = int(agg["n00"][0].as_py())
    n = n11 + n10 + n01 + n00
    po = float(n11 + n00) / float(n)
    pe = float(
        (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    ) / (float(n) * float(n))
    kappa = (po - pe) / (1.0 - pe)
    return pa.table(
        {
            "n11": pa.array([n11], pa.int64()),
            "n10": pa.array([n10], pa.int64()),
            "n01": pa.array([n01], pa.int64()),
            "n00": pa.array([n00], pa.int64()),
            "kappa": round_like_sql([kappa], 6),
        }
    )


def _q_mcnemar_test(sf_dir: str) -> pa.Table:
    """McNemar paired test between the two bands' high-value masks
    (deci k > 250) over both-valid cells -- did the classification
    change between the two scenes beyond symmetric noise?  Uses the
    discordant counts b = band1-only, c = band2-only: chi2 =
    (b-c)^2/(b+c), with the Edwards continuity-corrected variant
    (|b-c|-1)^2/(b+c).  Counts are exact int64 partials rolled up
    via the tier-2 combiner; the statistics are one float division
    each."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table(bands=(1, 2)))

    def discordant(batch: pa.Table) -> pa.Table:
        by_pos: dict[tuple[int, int], dict[int, np.ndarray]] = {}
        for i in range(batch.num_rows):
            key = (
                batch["row_off"][i].as_py(),
                batch["col_off"][i].as_py(),
            )
            v = np.asarray(batch["values"][i].as_py(), np.float32)
            by_pos.setdefault(key, {})[batch["band"][i].as_py()] = v
        b = c = n = 0
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
            a = k1 > 250
            p = k2 > 250
            b += int((a & ~p).sum())
            c += int((~a & p).sum())
            n += int(ok.sum())
        return pa.table(
            {
                "_g": pa.array(np.zeros(1, np.int64)),
                "b": pa.array([b], pa.int64()),
                "c": pa.array([c], pa.int64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    agg = hash_aggregate(
        tiles.map_batches(discordant, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(col, "sum", col) for col in ("b", "c", "n")],
    )
    b = int(agg["b"][0].as_py())
    c = int(agg["c"][0].as_py())
    n = int(agg["n"][0].as_py())
    chi2 = float((b - c) * (b - c)) / float(b + c)
    chi2_cc = float((abs(b - c) - 1) * (abs(b - c) - 1)) / float(b + c)
    return pa.table(
        {
            "n_pairs": pa.array([n], pa.int64()),
            "b_only1": pa.array([b], pa.int64()),
            "c_only2": pa.array([c], pa.int64()),
            "chi2": round_like_sql([chi2], 6),
            "chi2_cc": round_like_sql([chi2_cc], 6),
        }
    )
