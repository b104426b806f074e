"""Query implementations, part 10 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: largest_empty_circle, box_cox_scan, quantile_mapping, trimmed_mean, huber_location, rosner_esd, cooks_distance, gev_lmoments, repair_compress, mtf_transform, code_length_audit, dpp_map_greedy, top_trading_cycles, newsvendor, mdlp_split, woe_iv, target_encoding, mrmr_select, adwin_check, james_stein, iv_2sls, harrell_c, maximal_cliques, max_independent_set, min_dominating_set, pmi_similarity, hawkes_branching, game_of_life_steps, rv_coefficient, distance_correlation, chatterjee_xi, tail_dependence, blomqvist_beta, survey_estimators, lexis_apc, gompertz_hazard
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
    OG_TRANSFORM,
    OG_W,
    _OG_SLOPE_GRID_SQL,
    _read_pq,
)
from .part06 import (  # noqa: F401
    _ATTR_ITERS,
    _ATTR_SCALE,
    _BETW_LEVELS,
    _BETW_SCALE,
    _BT_ITERS,
    _BT_SCALE,
    _FIEDLER_ITERS,
    _HUFF_STEPS,
    _IPF_ITERS,
    _IPF_SCALE,
    _KAL_Q,
    _KAL_R,
    _KAL_SC,
    _KNAP_CAP,
    _LAYERS,
    _LIS_LEVELS,
    _LPA_ROUNDS,
    _MARKOV_STATES,
    _PCA_ITERS,
    _PCA_SCALE,
    _PEEL_STEPS,
)
from .part07 import (  # noqa: F401
    _BPERC_ROUNDS,
    _GMM_ITERS,
    _GMM_RQ,
    _LOGIT_ITERS,
    _LOGIT_LR,
    _daily_count_series,
    _daily_revenue_cents,
)
from .part08 import (  # noqa: F401
    _CLIQUE_T,
    _TOPVAL_CELLS_SQL,
    _grid_count_cents,
    _popcount64,
    _sig_string,
    _sig_string_sql,
    _top_count_cells_xy,
    _top_users_by_count,
)


def _q_largest_empty_circle(sf_dir: str) -> pa.Table:
    """Largest empty circle (obnoxious-facility / maximin placement)
    with centers on the 96x96 lattice and sites = the top-20 count
    cells: argmax over cells of the min squared distance to any site
    -- exact integers, ties by cell id."""
    verts = _top_count_cells_xy(sf_dir, 20)
    sx = np.array([v[1] for v in verts], np.int64)
    sy = np.array([v[2] for v in verts], np.int64)
    gx = np.arange(96, dtype=np.int64)[:, None, None]
    gy = np.arange(96, dtype=np.int64)[None, :, None]
    d2 = (gx - sx[None, None, :]) ** 2 + (gy - sy[None, None, :]) ** 2
    mind = d2.min(axis=2)
    best = int(mind.max())
    xs, ys = np.nonzero(mind == best)
    cells = xs * 1 + ys * 96  # cell id = x + y * 96
    order = np.argsort(cells)
    bx, by = int(xs[order[0]]), int(ys[order[0]])
    return pa.table(
        {
            "center_x": pa.array([bx], pa.int64()),
            "center_y": pa.array([by], pa.int64()),
            "min_d2": pa.array([best], pa.int64()),
        }
    )


_BOXCOX_LAMBDAS = (-10, -5, 0, 5, 10)  # lambda * 10


def _q_box_cox_scan(sf_dir: str) -> pa.Table:
    """Box-Cox profile log-likelihood scan over lambda in
    {-1, -0.5, 0, 0.5, 1} for the positive price cents: per DISTINCT
    value the transform z = (y^l - 1)/l (or ln y at 0) is quantized
    at 1e6 ticks, variance comes from exact integer tick moments, and
    LL = -n/2 ln(var) + (l - 1) sum ln y (the log-Jacobian uses
    1e6-tick ln sums) -- argmax lambda row flagged."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.array(
                    scaled_int(batch["l_extendedprice"], 100.0)
                ),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c"],
        [("_one", "sum", "m")],
    )
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = agg["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(m.sum())
    lny_t = int(
        (
            round_half_away(np.log(c.astype(np.float64)) * 1e6)
        ).astype(np.int64).__mul__(m).sum()
    )
    rows = []
    for l10 in _BOXCOX_LAMBDAS:
        lam = float(l10) / 10.0
        y = c.astype(np.float64)
        if l10 == 0:
            z = np.log(y)
        else:
            z = (np.power(y, lam) - 1.0) / lam
        zt = round_half_away(z * 1e6).astype(np.int64)
        s1 = int((zt * m).sum())
        # zt^2 exceeds int64 at lambda = 1 -- exact object arithmetic
        s2 = int(
            (zt.astype(object) * zt.astype(object) * m.astype(object))
            .sum()
        )
        mean = float(s1) / float(n)
        var = (float(s2) / float(n) - mean * mean) / 1e12
        ll = -float(n) / 2.0 * np.log(var) + (lam - 1.0) * (
            float(lny_t) / 1e6
        )
        rows.append((l10, ll))
    best = max(range(len(rows)), key=lambda i: (rows[i][1], -i))
    return pa.table(
        {
            "lambda_x10": pa.array(
                [r[0] for r in rows], pa.int64()
            ),
            "log_lik": round_like_sql([r[1] for r in rows], 6),
            "is_best": pa.array(
                [1 if i == best else 0 for i in range(len(rows))],
                pa.int64(),
            ),
        }
    )


def _q_quantile_mapping(sf_dir: str) -> pa.Table:
    """Quantile mapping (empirical CDF matching -- the downscaling /
    bias-correction standard) from the mix32 B arm onto the A arm's
    value distribution: each distinct B cent maps to the A value at
    the same quantile (quantile_disc rank convention, exact element
    selection).  Top-10 most frequent B values reported."""
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
        columns=["user_id", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "arm": pa.array(mix32(uid, 41) % 2),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c", "arm"],
        [("_one", "sum", "n")],
    ).sort_by([("c", "ascending"), ("arm", "ascending")])
    cc = counts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    aa = counts["arm"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    av, an = cc[aa == 0], nn[aa == 0]
    bv, bn = cc[aa == 1], nn[aa == 1]
    a_cum = np.cumsum(an)
    b_cum = np.cumsum(bn)
    n_a, n_b = int(a_cum[-1]), int(b_cum[-1])
    rows = []
    for i in np.argsort(-bn, kind="stable")[:10]:
        # quantile of b value = cum_b / n_b; target = A value at
        # 0-based index ceil(q * n_a) - 1  (quantile_disc rule)
        q_num = int(b_cum[i])  # q = q_num / n_b
        idx = -(-q_num * n_a // n_b) - 1  # ceil(q*n_a) - 1
        idx = max(0, min(idx, n_a - 1))
        tgt = int(av[np.searchsorted(a_cum, idx + 1)])
        rows.append((int(bv[i]), int(bn[i]), tgt))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pa.table(
        {
            "b_cents": pa.array([r[0] for r in rows], pa.int64()),
            "b_count": pa.array([r[1] for r in rows], pa.int64()),
            "mapped_a_cents": pa.array(
                [r[2] for r in rows], pa.int64()
            ),
        }
    )


def _q_trimmed_mean(sf_dir: str) -> pa.Table:
    """10% symmetric trimmed mean of the price cents: exact trim
    bounds by element selection (drop floor(n/10) from each tail),
    interior sum adjusted at the boundary values with exact partial
    counts -- one float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.array(
                    scaled_int(batch["l_extendedprice"], 100.0)
                ),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c"],
        [("_one", "sum", "m")],
    ).sort_by("c")
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = agg["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(m)
    n = int(cum[-1])
    k = n // 10
    # ranks kept: [k+1, n-k] (1-based)
    lo_i = int(np.searchsorted(cum, k + 1))
    hi_i = int(np.searchsorted(cum, n - k))
    total = int((c * m).sum())
    # subtract full tails then add back boundary partials
    below = int((c[:lo_i] * m[:lo_i]).sum())
    above = int((c[hi_i + 1 :] * m[hi_i + 1 :]).sum())
    # part of the lo boundary value still trimmed
    lo_trim = k - (int(cum[lo_i - 1]) if lo_i > 0 else 0)
    hi_trim = int(cum[hi_i]) - (n - k)
    kept = (
        total
        - below
        - above
        - lo_trim * int(c[lo_i])
        - hi_trim * int(c[hi_i])
    )
    tm = float(kept) / float(n - 2 * k)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "k_trim": pa.array([k], pa.int64()),
            "kept_sum": pa.array([kept], pa.int64()),
            "trimmed_mean": round_like_sql([tm], 6),
        }
    )


def _huber_oracle_sql() -> str:
    """Mirror of _q_huber_location: 5 unrolled integer IRLS steps."""
    sc = 1_000_000
    steps = []
    for r in range(1, 6):
        prev = f"s{r - 1}"
        steps.append(
            f"s{r} AS MATERIALIZED (SELECT "
            f"CAST(SUM(w.w * w.m * w.c) AS HUGEINT) * {sc} "
            f"// CAST(SUM(w.w * w.m) AS HUGEINT) AS mu FROM ("
            f"SELECT h.c, h.m, CASE WHEN ABS(CAST(h.c AS HUGEINT) "
            f"* {sc} - {prev}.mu) <= th.thr * {sc} THEN {sc} "
            f"ELSE CAST(th.thr AS HUGEINT) * {sc} * {sc} "
            f"// GREATEST(ABS(CAST(h.c AS HUGEINT) * {sc} "
            f"- {prev}.mu), 1) END AS w "
            f"FROM h, {prev}, th) w)"
        )
    return (
        "WITH h AS (SELECT CAST(ROUND(l_extendedprice * 100, 0) "
        "AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS m "
        "FROM lineitem GROUP BY 1), "
        "me AS (SELECT quantile_disc(CAST(ROUND(l_extendedprice "
        "* 100, 0) AS BIGINT), 0.5) AS med FROM lineitem), "
        "ma AS (SELECT quantile_disc(ABS(CAST(ROUND(l_extendedprice "
        "* 100, 0) AS BIGINT) - me.med), 0.5) AS mad "
        "FROM lineitem, me), "
        "th AS (SELECT CAST(1345 * ma.mad // 1000 AS HUGEINT) "
        "AS thr FROM ma), "
        f"s0 AS (SELECT CAST(me.med AS HUGEINT) * {sc} AS mu "
        "FROM me), "
        + ", ".join(steps)
        + " SELECT me.med AS median_c, CAST(ma.mad AS BIGINT) "
        "AS mad_c, CAST(s5.mu AS BIGINT) AS huber_ticks, "
        f"ROUND(CAST(s5.mu AS DOUBLE) / {sc}.0, 6) AS huber_c "
        "FROM me, ma, s5"
    )


_HUBER_ITERS = 5
_HUBER_SC = 1_000_000


def _q_huber_location(sf_dir: str) -> pa.Table:
    """Huber M-estimator of location for the price cents (c = 1.345
    x MAD-scale, IRLS): the scale is frozen from exact median /
    MAD element selections, then 5 unrolled reweighting steps with
    the center held in 1e6 ticks and weights w = min(1, c_thr/|r|)
    quantized at 1e6 per DISTINCT value -- truncating-division
    recursion, bit-identical in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.array(
                    scaled_int(batch["l_extendedprice"], 100.0)
                ),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c"],
        [("_one", "sum", "m")],
    ).sort_by("c")
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = agg["m"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(m)
    n = int(cum[-1])

    def order_stat(k: int) -> int:  # 1-based rank
        return int(c[np.searchsorted(cum, k)])

    med = order_stat(-(-n // 2))  # ceil(n/2) = quantile_disc 0.5
    absdev = np.abs(c - med)
    order = np.argsort(absdev, kind="stable")
    adcum = np.cumsum(m[order])
    mad = int(absdev[order][np.searchsorted(adcum, -(-n // 2))])
    thr = 1345 * mad // 1000  # 1.345 * MAD, integer thousandths
    sc = _HUBER_SC
    mu_t = med * sc  # center in 1e6 ticks of a cent
    for _ in range(_HUBER_ITERS):
        r = np.abs(c * sc - mu_t)  # |residual| in ticks
        w = np.where(
            r <= thr * sc,
            sc,
            (np.int64(thr) * sc * sc // np.maximum(r, 1)),
        ).astype(np.int64)
        num = int((w * m * c).sum())
        den = int((w * m).sum())
        mu_t = num * sc // den
    return pa.table(
        {
            "median_c": pa.array([med], pa.int64()),
            "mad_c": pa.array([mad], pa.int64()),
            "huber_ticks": pa.array([mu_t], pa.int64()),
            "huber_c": round_like_sql([float(mu_t) / float(sc)], 6),
        }
    )


def _q_rosner_esd(sf_dir: str) -> pa.Table:
    """Generalized ESD (Rosner) outlier screen, 3 rounds over the
    price cents: each round removes ONE most-extreme observation
    (argmax |n*x - S| -- an exact integer comparison, ties to the
    larger value) and reports its studentized R = |x - mean| / sd
    from the pre-removal exact moments; the 3-step state recursion
    is unrolled in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.array(
                    scaled_int(batch["l_extendedprice"], 100.0)
                ),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c"],
        [("_one", "sum", "m")],
    ).sort_by("c")
    c = [int(x) for x in agg["c"].to_pylist()]
    m = [int(x) for x in agg["m"].to_pylist()]
    n = sum(m)
    s1 = sum(v * k for v, k in zip(c, m))
    s2 = sum(v * v * k for v, k in zip(c, m))
    rows = []
    for rnd in range(1, 4):
        # argmax |n*x - S| ; ties -> larger value (documented)
        best = max(
            range(len(c)),
            key=lambda i: (abs(n * c[i] - s1), c[i]),
        )
        x = c[best]
        mean = float(s1) / float(n)
        var = (float(s2) - float(s1) * float(s1) / float(n)) / float(
            n - 1
        )
        r = abs(float(x) - mean) / np.sqrt(var)
        rows.append((rnd, x, float(r)))
        m[best] -= 1
        n -= 1
        s1 -= x
        s2 -= x * x
        if m[best] == 0:
            del c[best], m[best]
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "value_c": pa.array([r[1] for r in rows], pa.int64()),
            "r_stat": round_like_sql([r[2] for r in rows], 6),
        }
    )


def _rosner_oracle_sql() -> str:
    """Mirror of _q_rosner_esd: 3 unrolled remove-the-extreme
    rounds over the value histogram (argmax via ORDER BY ... LIMIT 1
    on the exact integer key)."""
    steps = []
    for r in range(1, 4):
        prev = f"st{r - 1}"
        steps.append(
            f"hr{r} AS MATERIALIZED (SELECT h.c, "
            f"h.m - COALESCE(rc.k, 0) AS rem FROM h "
            f"LEFT JOIN (SELECT c, COUNT(*) AS k FROM removed{r - 1} "
            f"GROUP BY c) rc ON rc.c = h.c), "
            f"x{r} AS MATERIALIZED (SELECT hr.c FROM hr{r} hr, {prev} "
            f"WHERE hr.rem > 0 "
            f"ORDER BY ABS({prev}.n * hr.c - {prev}.s1) DESC, hr.c "
            f"DESC LIMIT 1), "
            f"st{r} AS MATERIALIZED (SELECT {prev}.n - 1 AS n, "
            f"{prev}.s1 - x{r}.c AS s1, "
            f"{prev}.s2 - CAST(x{r}.c AS HUGEINT) * x{r}.c AS s2 "
            f"FROM {prev}, x{r}), "
            f"removed{r} AS (SELECT c FROM removed{r - 1} "
            f"UNION ALL SELECT c FROM x{r})"
        )
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, x{r}.c AS value_c, "
        f"ROUND(ABS(CAST(x{r}.c AS DOUBLE) "
        f"- CAST(st{r - 1}.s1 AS DOUBLE) / CAST(st{r - 1}.n "
        f"AS DOUBLE)) / SQRT((CAST(st{r - 1}.s2 AS DOUBLE) "
        f"- CAST(st{r - 1}.s1 AS DOUBLE) "
        f"* CAST(st{r - 1}.s1 AS DOUBLE) "
        f"/ CAST(st{r - 1}.n AS DOUBLE)) "
        f"/ CAST(st{r - 1}.n - 1 AS DOUBLE)), 6) AS r_stat "
        f"FROM x{r}, st{r - 1}"
        for r in range(1, 4)
    )
    return (
        "WITH h AS (SELECT CAST(ROUND(l_extendedprice * 100, 0) "
        "AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS m "
        "FROM lineitem GROUP BY 1), "
        "st0 AS (SELECT CAST(SUM(m) AS BIGINT) AS n, "
        "CAST(SUM(c * m) AS BIGINT) AS s1, "
        "SUM(CAST(c AS HUGEINT) * c * m) AS s2 FROM h), "
        "removed0 AS (SELECT CAST(NULL AS BIGINT) AS c WHERE 1 = 0), "
        + ", ".join(steps)
        + " SELECT CAST(round AS BIGINT) AS round, value_c, r_stat "
        "FROM (" + sel + ") ORDER BY round"
    )


def _q_cooks_distance(sf_dir: str) -> pa.Table:
    """Cook's distance and leverage for the daily revenue-vs-time OLS
    (the regression influence diagnostic): residuals and hat values
    from exact n-scaled integer moments (e_i = (C*y_i - (C*b0' +
    B*t_i')) rationals held as pinned floats, h_ii = 1/n + (t_i -
    tbar)^2/Stt), D_i = e^2 h / (2 s^2 (1-h)^2).  Top-5 days by
    (D desc, day)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    sx = n * (n - 1) // 2
    sy = sum(ys)
    sxx = (n - 1) * n * (2 * n - 1) // 6
    sxy = sum(i * y for i, y in enumerate(ys))
    cc = n * sxx - sx * sx  # n-scaled Stt
    bb = n * sxy - sx * sy
    # slope = bb/cc ; intercept = (sy - slope*sx)/n
    rows = []
    sse_t = 0  # 1e3-tick quantized e^2 sums (order-free)
    hs = []
    es = []
    for t, y in enumerate(ys):
        pred = (
            float(sy) / float(n)
            + float(bb) / float(cc) * (float(t) - float(sx) / float(n))
        )
        e = float(y) - pred
        d = float(t) - float(sx) / float(n)
        h = 1.0 / float(n) + d * d * float(n) / float(cc)
        es.append(e)
        hs.append(h)
        sse_t += int(round_half_away(np.array([e * e * 1e3]))[0])
    s2 = float(sse_t) / 1e3 / float(n - 2)
    for t in range(n):
        d = (
            es[t] * es[t]
            * hs[t]
            / (2.0 * s2 * (1.0 - hs[t]) * (1.0 - hs[t]))
        )
        rows.append((t, d, hs[t]))
    rows.sort(key=lambda r: (-r[1], r[0]))
    top = rows[:5]
    return pa.table(
        {
            "t": pa.array([r[0] for r in top], pa.int64()),
            "cooks_d": round_like_sql([r[1] for r in top], 6),
            "leverage": round_like_sql([r[2] for r in top], 6),
        }
    )


def _q_gev_lmoments(sf_dir: str) -> pa.Table:
    """GEV parameters for the daily MAXIMUM event value (cents) by
    the standard L-moment estimators (Hosking): l1, l2, t3 from
    exact order-statistic sums (the hockey-stick identities --
    integer numerators over n, n(n-1), n(n-1)(n-2)), then the
    closed-form c -> k -> sigma -> mu chain with its published
    constants as one pinned float sequence (gamma(1+k) via
    lgamma-free Weierstrass 8-term product, documented)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "day": pa.array(day),
                "c": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("c", "max", "mx")],
    ).sort_by("day")
    xs = sorted(int(v) for v in agg["mx"].to_pylist())
    n = len(xs)
    b0 = sum(xs)
    b1 = sum(i * x for i, x in enumerate(xs))  # i = 0-based rank
    b2 = sum(i * (i - 1) * x for i, x in enumerate(xs))
    l1 = float(b0) / float(n)
    l2 = 2.0 * float(b1) / float(n * (n - 1)) - l1
    l3 = (
        6.0 * float(b2) / float(n * (n - 1) * (n - 2))
        - 6.0 * float(b1) / float(n * (n - 1))
        + l1
    )
    t3 = l3 / l2
    cz = 2.0 / (3.0 + t3) - np.log(2.0) / np.log(3.0)
    k = 7.8590 * cz + 2.9554 * cz * cz
    # gamma(1 + k) via the Weierstrass-free Taylor of ln(Gamma):
    # use the Lanczos-free Stirling-free small-k series is overkill;
    # both sides share the SAME 8-term product approximation
    g = 1.0
    for i in range(1, 9):
        g = g * (float(i) / (float(i) + k)) * np.exp(k / float(i))
    g = g * np.exp(-0.5772156649015329 * k)
    sigma = l2 * k / ((1.0 - 2.0 ** (-k)) * g)
    mu = l1 - sigma * (g - 1.0) / k
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "l1": round_like_sql([l1], 6),
            "l2": round_like_sql([l2], 6),
            "t3": round_like_sql([t3], 6),
            "gev_k": round_like_sql([float(k)], 6),
            "gev_sigma": round_like_sql([float(sigma)], 6),
            "gev_mu": round_like_sql([float(mu)], 6),
        }
    )


_REPAIR_ROUNDS = 5


def _q_repair_compress(sf_dir: str) -> pa.Table:
    """Re-Pair grammar compression (5 rounds) of the corpus signature
    string: each round replaces every non-overlapping occurrence of
    the most frequent adjacent pair (count via the length-difference
    identity, ties lexicographic) with a fresh symbol '0'..'4' --
    both sides share Python/SQL REPLACE's left-to-right
    non-overlapping semantics.  Output: per-round rule and resulting
    length."""
    s = _sig_string(sf_dir)
    rows = []
    for rnd in range(_REPAIR_ROUNDS):
        pairs = {}
        for i in range(len(s) - 1):
            p = s[i : i + 2]
            n = (len(s) - len(s.replace(p, ""))) // 2
            pairs[p] = n
        best = min(pairs, key=lambda p: (-pairs[p], p))
        sym = str(rnd)
        s = s.replace(best, sym)
        rows.append((rnd + 1, best, pairs[best], len(s)))
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "pair": pa.array([r[1] for r in rows]),
            "n_occ": pa.array([r[2] for r in rows], pa.int64()),
            "new_len": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _repair_oracle_sql() -> str:
    """Mirror of _q_repair_compress: 5 unrolled REPLACE rounds."""
    steps = []
    for r in range(_REPAIR_ROUNDS):
        prev = f"s{r}"
        steps.append(
            f"p{r} AS MATERIALIZED (SELECT pr.p, "
            f"(LEN({prev}.str) - LEN(REPLACE({prev}.str, pr.p, ''))) "
            f"// 2 AS n FROM {prev}, (SELECT DISTINCT "
            f"substr({prev}.str, CAST(i.range AS INTEGER) + 1, 2) "
            f"AS p FROM {prev}, range(0, 4096) i "
            f"WHERE i.range < LEN({prev}.str) - 1) pr), "
            f"b{r} AS MATERIALIZED (SELECT p, n FROM p{r} "
            f"ORDER BY n DESC, p LIMIT 1), "
            f"s{r + 1} AS MATERIALIZED (SELECT "
            f"REPLACE({prev}.str, b{r}.p, '{r}') AS str "
            f"FROM {prev}, b{r})"
        )
    sel = " UNION ALL ".join(
        f"SELECT {r + 1} AS round, (SELECT p FROM b{r}) AS pair, "
        f"(SELECT n FROM b{r}) AS n_occ, "
        f"(SELECT LEN(str) FROM s{r + 1}) AS new_len"
        for r in range(_REPAIR_ROUNDS)
    )
    return (
        "WITH " + _sig_string_sql().replace(
            "s AS (SELECT", "s0 AS (SELECT"
        )
        + ", " + ", ".join(steps)
        + " SELECT CAST(round AS BIGINT) AS round, pair, "
        "CAST(n_occ AS BIGINT) AS n_occ, "
        "CAST(new_len AS BIGINT) AS new_len FROM ("
        + sel
        + ") ORDER BY round"
    )


def _q_mtf_transform(sf_dir: str) -> pa.Table:
    """Move-to-front transform of the signature string's BWT (the
    bzip2 pipeline stage between BWT and RLE): the alphabet list
    state updates sequentially per position; reported as the zero
    count, total code sum and the first-16 output codes -- the
    recursion is a LIST-state recursive CTE in SQL."""
    s = _sig_string(sf_dir)
    n = len(s)
    rots = sorted(range(n), key=lambda i: s[i:] + s[:i])
    bwt = "".join(s[(i + n - 1) % n] for i in rots)
    alpha = sorted(set(bwt))
    codes = []
    for ch in bwt:
        idx = alpha.index(ch)
        codes.append(idx)
        alpha.insert(0, alpha.pop(idx))
    n_zero = sum(1 for c in codes if c == 0)
    return pa.table(
        {
            "pos": pa.array(list(range(16)), pa.int64()),
            "code": pa.array(codes[:16], pa.int64()),
            "n_zero": pa.array([n_zero] * 16, pa.int64()),
            "code_sum": pa.array([sum(codes)] * 16, pa.int64()),
        }
    )


def _mtf_oracle_sql() -> str:
    """Mirror of _q_mtf_transform: recursive CTE carrying the
    alphabet LIST state over BWT positions."""
    return (
        "WITH RECURSIVE " + _sig_string_sql() + ", "
        "n AS (SELECT LEN(str) AS n FROM s), "
        "r AS (SELECT unnest(range(0, (SELECT CAST(n AS BIGINT) "
        "FROM n))) AS i), "
        "rot AS (SELECT r.i, substr(s.str, CAST(r.i AS INTEGER) + 1) "
        "|| substr(s.str, 1, CAST(r.i AS INTEGER)) AS rstr "
        "FROM r, s), "
        "o AS (SELECT i, rstr, ROW_NUMBER() OVER (ORDER BY rstr) "
        "AS pos FROM rot), "
        "bwt AS (SELECT string_agg(substr(rstr, LEN(rstr), 1), '' "
        "ORDER BY pos) AS b FROM o), "
        "al AS (SELECT list_sort(list_distinct(list_transform("
        "range(1, LEN(b) + 1), i -> substr(b, CAST(i AS INTEGER), "
        "1)))) AS a FROM bwt), "
        "mt AS (SELECT 0 AS pos, CAST(NULL AS BIGINT) AS code, "
        "al.a AS alpha FROM al "
        "UNION ALL "
        "SELECT mt.pos + 1, "
        "CAST(list_position(mt.alpha, substr(bwt.b, mt.pos + 1, 1)) "
        "- 1 AS BIGINT), "
        "list_prepend(substr(bwt.b, mt.pos + 1, 1), "
        "list_filter(mt.alpha, x -> x <> substr(bwt.b, mt.pos + 1, "
        "1))) FROM mt, bwt, n WHERE mt.pos < n.n), "
        "c AS (SELECT pos - 1 AS pos, code FROM mt WHERE pos >= 1), "
        "agg AS (SELECT CAST(SUM(CASE WHEN code = 0 THEN 1 ELSE 0 "
        "END) AS BIGINT) AS nz, CAST(SUM(code) AS BIGINT) AS cs "
        "FROM c) "
        "SELECT CAST(c.pos AS BIGINT) AS pos, c.code, agg.nz "
        "AS n_zero, agg.cs AS code_sum FROM c, agg "
        "WHERE c.pos < 16 ORDER BY c.pos"
    )


def _q_code_length_audit(sf_dir: str) -> pa.Table:
    """Universal-code size audit of the daily event counts (+1 so
    zeros encode): total bits under Elias gamma (2 floor(log2 x) +
    1), Elias delta, Golomb-Rice k = 2 (x >> 2 + 1 + 2) and plain
    fixed 32-bit -- all exact integer closed forms via bit lengths."""
    xs = [x + 1 for x in _daily_count_series(sf_dir)]
    gamma = sum(2 * (x.bit_length() - 1) + 1 for x in xs)
    delta = sum(
        (x.bit_length() - 1)
        + 2 * ((x.bit_length()).bit_length() - 1)
        + 1
        for x in xs
    )
    rice = sum((x >> 2) + 1 + 2 for x in xs)
    fixed = 32 * len(xs)
    return pa.table(
        {
            "scheme": pa.array(
                ["elias_gamma", "elias_delta", "rice_k2", "fixed32"]
            ),
            "total_bits": pa.array(
                [gamma, delta, rice, fixed], pa.int64()
            ),
            "n_values": pa.array([len(xs)] * 4, pa.int64()),
        }
    )


def _hour_profiles_top(sf_dir: str, k: int):
    """Top-k users by count with their 24-dim hour count vectors."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "h": pa.array((ts // 3_600_000_000) % 24),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id", "h"],
        [("_one", "sum", "n")],
    )
    per: dict[int, np.ndarray] = {}
    tot: dict[int, int] = {}
    for i in range(agg.num_rows):
        u = int(agg["user_id"][i].as_py())
        per.setdefault(u, np.zeros(24, np.int64))[
            int(agg["h"][i].as_py())
        ] += int(agg["n"][i].as_py())
        tot[u] = tot.get(u, 0) + int(agg["n"][i].as_py())
    top = sorted(tot, key=lambda u: (-tot[u], u))[:k]
    return top, per


def _q_dpp_map_greedy(sf_dir: str) -> pa.Table:
    """Greedy MAP inference for a determinantal point process over
    the top-8 users' hour profiles (diverse-subset selection, the
    DPP alternative to MMR): kernel L_ij = round(cosine * 1000)
    ticks with L_ii = 1000, greedy det-gain argmax for 3 rounds --
    every determinant (1x1/2x2/3x3) is an exact integer, ties by
    user id."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    users, per = _hour_profiles_top(sf_dir, 8)
    k = len(users)
    ll = np.zeros((k, k), np.int64)
    for i in range(k):
        for j in range(k):
            if i == j:
                ll[i, j] = 1000
            else:
                a, b = per[users[i]], per[users[j]]
                dot = int((a * b).sum())
                na = int((a * a).sum())
                nb = int((b * b).sum())
                ll[i, j] = int(
                    round_half_away(
                        np.array(
                            [
                                float(dot)
                                / np.sqrt(float(na))
                                / np.sqrt(float(nb))
                                * 1000.0
                            ]
                        )
                    )[0]
                )
    chosen: list[int] = []

    def det(idx: list[int]) -> int:
        m = [[int(ll[a, b]) for b in idx] for a in idx]
        if len(m) == 1:
            return m[0][0]
        if len(m) == 2:
            return m[0][0] * m[1][1] - m[0][1] * m[1][0]
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    rows = []
    for rnd in range(1, 4):
        best = None
        for i in range(k):
            if i in chosen:
                continue
            d = det(chosen + [i])
            key = (-d, users[i])
            if best is None or key < best:
                best = key
        d, u = -best[0], best[1]
        chosen.append(users.index(u))
        rows.append((rnd, u, d))
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "det_ticks": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _q_top_trading_cycles(sf_dir: str) -> pa.Table:
    """Top-trading-cycles house allocation (the strategy-proof core
    mechanism) among the top-6 users, each initially owning house
    i = their activity rank: preferences from mix32(uid * 16 + h,
    23) descending; each round every remaining agent points at the
    owner of its favorite remaining house, all agents on cycles
    trade and leave.  Deterministic integer rounds; the SQL unrolls
    pointer compositions for cycle detection."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )

    users = [u for u, _ in _top_users_by_count(sf_dir, 6)]
    n = 6
    pref = {
        (a, h): int(mix32(np.array([users[a] * 16 + h]), 23)[0])
        for a in range(n)
        for h in range(n)
    }
    owner = {h: h for h in range(n)}  # house -> agent (rank id)
    remaining = set(range(n))
    assign = {}
    rnd = 0
    rows = []
    while remaining:
        rnd += 1
        fav = {
            a: max(
                (h for h in owner),
                key=lambda h: (pref[(a, h)], -h),
            )
            for a in remaining
        }
        ptr = {a: owner[fav[a]] for a in remaining}
        on_cycle = set()
        for a in remaining:
            x = a
            for _ in range(n):
                x = ptr[x]
                if x == a:
                    on_cycle.add(a)
                    break
        for a in on_cycle:
            assign[a] = fav[a]
            rows.append((rnd, users[a], fav[a]))
        for a in on_cycle:
            del owner[assign[a]]
        remaining -= on_cycle
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "house": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _q_newsvendor(sf_dir: str) -> pa.Table:
    """Newsvendor optimal stocking quantity for daily purchases with
    underage cost 3 and overage cost 1 (critical ratio 3/4): Q* is
    the exact 0.75 order statistic of daily demand, expected
    underage/overage are exact integer histogram sums, expected cost
    one float division."""
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
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = et == "purchase"
        return pa.table(
            {
                "day": pa.array(day[keep]),
                "_one": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day"],
        [("_one", "sum", "d")],
    )
    days = agg["day"].to_numpy(zero_copy_only=False).astype(np.int64)
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(days.min()), int(days.max())
    demand = np.zeros(hi - lo + 1, np.int64)
    demand[days - lo] = dd
    xs = np.sort(demand)
    n = len(xs)
    q = int(xs[-(-3 * n // 4) - 1])  # quantile_disc 0.75
    under = int(np.maximum(demand - q, 0).sum())
    over = int(np.maximum(q - demand, 0).sum())
    cost = (3.0 * float(under) + 1.0 * float(over)) / float(n)
    return pa.table(
        {
            "q_star": pa.array([q], pa.int64()),
            "sum_underage": pa.array([under], pa.int64()),
            "sum_overage": pa.array([over], pa.int64()),
            "exp_cost": round_like_sql([cost], 6),
        }
    )


def _ttc_oracle_sql() -> str:
    """Mirror of _q_top_trading_cycles: 6 unrolled rounds, each with
    favorite selection, pointer composition (6 deep) for cycle
    detection, and state shrink."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql,
    )

    pref = mix32_sql("t6a.uid * 16 + hh.h", 23)
    rounds = []
    for r in range(1, 7):
        prev_rem = f"rem{r - 1}"
        prev_own = f"own{r - 1}"
        comp = [
            f"p1_{r} AS (SELECT a, b FROM ptr{r})"
        ]
        for k in range(2, 7):
            comp.append(
                f"p{k}_{r} AS (SELECT p.a, q.b FROM p{k - 1}_{r} p "
                f"JOIN ptr{r} q ON q.a = p.b)"
            )
        cyc_sel = " UNION ".join(
            f"SELECT a FROM p{k}_{r} WHERE a = b" for k in range(1, 7)
        )
        rounds.append(
            f"fav{r} AS MATERIALIZED (SELECT a, h FROM ("
            f"SELECT pr.a, pr.h, ROW_NUMBER() OVER (PARTITION BY pr.a "
            f"ORDER BY pr.s DESC, pr.h) AS rn FROM prefs pr "
            f"JOIN {prev_rem} ra ON ra.a = pr.a "
            f"JOIN {prev_own} oh ON oh.h = pr.h) WHERE rn = 1), "
            f"ptr{r} AS MATERIALIZED (SELECT fav{r}.a, "
            f"{prev_own}.own AS b FROM fav{r} "
            f"JOIN {prev_own} ON {prev_own}.h = fav{r}.h), "
            + ", ".join(comp)
            + f", cyc{r} AS MATERIALIZED ({cyc_sel}), "
            f"asg{r} AS MATERIALIZED (SELECT fav{r}.a, fav{r}.h "
            f"FROM fav{r} JOIN cyc{r} ON cyc{r}.a = fav{r}.a), "
            f"own{r} AS MATERIALIZED (SELECT h, own FROM {prev_own} "
            f"WHERE h NOT IN (SELECT h FROM asg{r})), "
            f"rem{r} AS MATERIALIZED (SELECT a FROM {prev_rem} "
            f"WHERE a NOT IN (SELECT a FROM asg{r}))"
        )
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, t6.uid AS user_id, asg{r}.h AS house "
        f"FROM asg{r} JOIN t6 ON t6.a = asg{r}.a"
        for r in range(1, 7)
    )
    return (
        "WITH uc AS (SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id), "
        "t6 AS (SELECT user_id AS uid, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, user_id) - 1 AS a FROM uc "
        "ORDER BY n DESC, user_id LIMIT 6), "
        "hh AS (SELECT range AS h FROM range(0, 6)), "
        "prefs AS MATERIALIZED (SELECT t6a.a, hh.h, "
        f"({pref}) AS s FROM t6 t6a, hh), "
        "own0 AS (SELECT range AS h, range AS own FROM range(0, 6)), "
        "rem0 AS (SELECT range AS a FROM range(0, 6)), "
        + ", ".join(rounds)
        + " SELECT CAST(round AS BIGINT) AS round, user_id, "
        "CAST(house AS BIGINT) AS house FROM (" + sel + ") "
        "ORDER BY round, user_id"
    )


def _dpp_oracle_sql() -> str:
    """Mirror of _q_dpp_map_greedy: quantized cosine kernel + 3
    unrolled exact-determinant greedy rounds."""
    return (
        "WITH e AS (SELECT user_id, "
        "(epoch_us(ts) // 3600000000) % 24 AS h FROM events), "
        "uc AS (SELECT user_id, COUNT(*) AS n FROM e "
        "GROUP BY user_id), "
        "t8 AS (SELECT user_id FROM uc ORDER BY n DESC, user_id "
        "LIMIT 8), "
        "hp AS MATERIALIZED (SELECT e.user_id, e.h, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e "
        "JOIN t8 USING (user_id) GROUP BY e.user_id, e.h), "
        "nr AS (SELECT user_id, CAST(SUM(n * n) AS BIGINT) AS nn "
        "FROM hp GROUP BY user_id), "
        "ll AS MATERIALIZED (SELECT a.user_id AS u, b.user_id AS v, "
        "CASE WHEN a.user_id = b.user_id THEN 1000 ELSE "
        "CAST(ROUND(CAST(COALESCE((SELECT SUM(x.n * y.n) FROM hp x "
        "JOIN hp y ON y.h = x.h AND y.user_id = b.user_id "
        "WHERE x.user_id = a.user_id), 0) AS DOUBLE) "
        "/ SQRT(CAST(a.nn AS DOUBLE)) / SQRT(CAST(b.nn AS DOUBLE)) "
        "* 1000.0, 0) AS BIGINT) END AS l "
        "FROM nr a, nr b), "
        "c1 AS MATERIALIZED (SELECT u, l AS d FROM ll "
        "WHERE u = v ORDER BY l DESC, u LIMIT 1), "
        "g2 AS (SELECT ll.u AS cand, "
        "1000 * 1000 - x.l * x.l AS d FROM ll "
        "JOIN c1 ON 1 = 1 JOIN ll x ON x.u = c1.u "
        "AND x.v = ll.u WHERE ll.u = ll.v AND ll.u <> c1.u), "
        "c2 AS MATERIALIZED (SELECT cand AS u, d FROM g2 "
        "ORDER BY d DESC, cand LIMIT 1), "
        "g3 AS (SELECT dd.cand, "
        "1000 * (1000 * 1000 - l23.l * l23.l) "
        "- l12.l * (l12.l * 1000 - l23.l * l13.l) "
        "+ l13.l * (l12.l * l23.l - 1000 * l13.l) AS d "
        "FROM (SELECT u AS cand FROM ll WHERE u = v "
        "AND u NOT IN (SELECT u FROM c1) "
        "AND u NOT IN (SELECT u FROM c2)) dd, c1, c2 "
        "JOIN ll l12 ON l12.u = c1.u AND l12.v = c2.u "
        "JOIN ll l13 ON l13.u = c1.u, ll l23 "
        "WHERE l13.v = dd.cand AND l23.u = c2.u "
        "AND l23.v = dd.cand), "
        "c3 AS MATERIALIZED (SELECT cand AS u, d FROM g3 "
        "ORDER BY d DESC, cand LIMIT 1) "
        "SELECT CAST(round AS BIGINT) AS round, u AS user_id, "
        "CAST(d AS BIGINT) AS det_ticks FROM ("
        "SELECT 1 AS round, u, d FROM c1 "
        "UNION ALL SELECT 2, u, d FROM c2 "
        "UNION ALL SELECT 3, u, d FROM c3) ORDER BY round"
    )


def _q_mdlp_split(sf_dir: str) -> pa.Table:
    """Fayyad-Irani MDLP discretization (one split) of value
    deci-cents against the purchase label: the best threshold
    maximizes information gain (1e9-tick entropy terms over exact
    integer counts, argmax on the tick gain with smallest-threshold
    ties) and the MDL acceptance criterion gain > (log2(n-1) +
    log2(3^k - 2) - k*E terms)/n is evaluated on the same ticks."""
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
    ).sort_by("d10")
    v = agg["d10"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = agg["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cp = np.cumsum(p)
    cn = np.cumsum(n)
    big_p, big_n = int(cp[-1]), int(cn[-1])

    def ent_t(pos: int, tot: int) -> int:
        """1e9-tick binary entropy * tot (the n*H form)."""
        t = 0
        for c in (pos, tot - pos):
            if c > 0:
                sh = float(c) / float(tot)
                t += int(
                    round_half_away(
                        np.array([-float(c) * np.log2(sh) * 1e9])
                    )[0]
                )
        return t

    h_all = ent_t(big_p, big_n)
    best = None
    for i in range(len(v) - 1):  # split AFTER value v[i]
        nl, pl = int(cn[i]), int(cp[i])
        nr, pr = big_n - nl, big_p - pl
        gain = h_all - ent_t(pl, nl) - ent_t(pr, nr)
        key = (-gain, int(v[i]))
        if best is None or key < best:
            best = key
    gain_t, thr = -best[0], best[1]
    # MDL criterion ticks: delta = log2(3^k - 2) with k = 2 classes
    # both sides -> log2(7); threshold = (log2(n-1) + log2(7)) * 1e9
    crit = int(
        round_half_away(
            np.array(
                [
                    (np.log2(float(big_n - 1)) + np.log2(7.0)) * 1e9
                ]
            )
        )[0]
    )
    accepted = 1 if gain_t > crit else 0
    return pa.table(
        {
            "threshold_d10": pa.array([thr], pa.int64()),
            "gain_ticks": pa.array([gain_t], pa.int64()),
            "crit_ticks": pa.array([crit], pa.int64()),
            "accepted": pa.array([accepted], pa.int64()),
        }
    )


def _q_woe_iv(sf_dir: str) -> pa.Table:
    """Weight of evidence and information value (the credit-scoring
    predictive-power screen) of the value quintile bins against the
    purchase label: bin edges by exact quantile_disc selection, WoE =
    ln((g_i/G)/(b_i/B)) and the IV terms as pinned floats over exact
    integer counts (1e9-tick IV accumulation)."""
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
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "pos": pa.array(
                    (et == "purchase").astype(np.int64)
                ),
                "_one": pa.array(np.ones(len(et), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c"],
        [("pos", "sum", "p"), ("_one", "sum", "n")],
    ).sort_by("c")
    v = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = agg["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(n)
    big_n = int(cum[-1])
    edges = [
        int(v[np.searchsorted(cum, -(-k * big_n // 5))])
        for k in range(1, 5)
    ]
    bounds = [-(2**62)] + edges + [2**62]
    big_g = int(p.sum())
    big_b = big_n - big_g
    rows = []
    iv_t = 0
    for b in range(5):
        sel = (v > bounds[b]) & (v <= bounds[b + 1])
        g = int(p[sel].sum())
        bb = int(n[sel].sum()) - g
        gs = float(g) / float(big_g)
        bs = float(bb) / float(big_b)
        woe = np.log(gs / bs)
        term = (gs - bs) * woe
        iv_t += int(round_half_away(np.array([term * 1e9]))[0])
        rows.append((b + 1, g, bb, float(woe)))
    return pa.table(
        {
            "bin": pa.array([r[0] for r in rows], pa.int64()),
            "n_good": pa.array([r[1] for r in rows], pa.int64()),
            "n_bad": pa.array([r[2] for r in rows], pa.int64()),
            "woe": round_like_sql([r[3] for r in rows], 6),
            "iv": round_like_sql([float(iv_t) / 1e9] * 5, 6),
        }
    )


def _q_target_encoding(sf_dir: str) -> pa.Table:
    """Smoothed target (mean) encoding of hour-of-day against the
    purchase label with prior strength m = 100: enc = (k + m * prior)
    / (n + m) held as the exact rational (k*N + 100*K) / (N*(n+100))
    -- integer numerators, one float division per hour."""
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
                "pos": pa.array(
                    (et == "purchase").astype(np.int64)
                ),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h"],
        [("pos", "sum", "k"), ("_one", "sum", "n")],
    ).sort_by("h")
    hh = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    kk = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    big_k, big_n = int(kk.sum()), int(nn.sum())
    num = kk * big_n + 100 * big_k
    den = big_n * (nn + 100)
    return pa.table(
        {
            "hour": pa.array(hh, pa.int64()),
            "n": pa.array(nn, pa.int64()),
            "k_pos": pa.array(kk, pa.int64()),
            "encoding": round_like_sql(
                num.astype(np.float64) / den.astype(np.float64), 6
            ),
        }
    )


_MRMR_FEATURES = ("hour6", "dow", "vdec", "ubkt")


def _q_mrmr_select(sf_dir: str) -> pa.Table:
    """mRMR feature selection (2 greedy rounds) for predicting the
    purchase label from four discrete features (hour sextile,
    day-of-week, value decile, mix32 user bucket): every mutual
    information is the exact-count tick sum sum n_xy * log2(N n_xy /
    (n_x n_y)) / N held as 1e12 ticks; round 2 maximizes relevance -
    mean redundancy on integer tick arithmetic."""
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
        columns=["ts", "user_id", "event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour6": pa.array(((ts // 3_600_000_000) % 24) // 4),
                "dow": pa.array((ts // 86_400_000_000 + 4) % 7),
                "vdec": pa.array(
                    np.minimum(
                        scaled_int(batch["value"], 100.0) // 5_000, 9
                    )
                ),
                "ubkt": pa.array(mix32(uid, 71) % 8),
                "y": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    pd_ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    # one grouped pass over the full cross cells; marginals derive
    agg = hash_aggregate(
        pd_ds,
        list(_MRMR_FEATURES) + ["y"],
        [("_one", "sum", "n")],
    )
    cells = []
    for i in range(agg.num_rows):
        cells.append(
            (
                tuple(
                    int(agg[f][i].as_py()) for f in _MRMR_FEATURES
                ),
                int(agg["y"][i].as_py()),
                int(agg["n"][i].as_py()),
            )
        )
    big_n = sum(c[2] for c in cells)

    def mi_ticks(ai: int, bi: int | None) -> int:
        """MI between feature ai and (feature bi | the label)."""
        joint: dict[tuple[int, int], int] = {}
        ma: dict[int, int] = {}
        mb: dict[int, int] = {}
        for fv, y, n in cells:
            a = fv[ai]
            b = y if bi is None else fv[bi]
            joint[(a, b)] = joint.get((a, b), 0) + n
            ma[a] = ma.get(a, 0) + n
            mb[b] = mb.get(b, 0) + n
        t = 0
        for (a, b), nxy in sorted(joint.items()):
            val = (
                float(nxy)
                * np.log2(
                    float(big_n)
                    * float(nxy)
                    / (float(ma[a]) * float(mb[b]))
                )
                / float(big_n)
            )
            t += int(round_half_away(np.array([val * 1e12]))[0])
        return t

    rel = [mi_ticks(i, None) for i in range(4)]
    first = max(range(4), key=lambda i: (rel[i], -i))
    best2 = None
    for i in range(4):
        if i == first:
            continue
        red = mi_ticks(min(i, first), max(i, first))
        score = rel[i] - red
        key = (-score, i)
        if best2 is None or key < best2:
            best2 = key
    rows = [
        (1, _MRMR_FEATURES[first], rel[first]),
        (2, _MRMR_FEATURES[best2[1]], -best2[0]),
    ]
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "feature": pa.array([r[1] for r in rows]),
            "score_ticks": pa.array(
                [r[2] for r in rows], pa.int64()
            ),
        }
    )


def _mrmr_oracle_sql() -> str:
    """Mirror of _q_mrmr_select: 4 relevance + 6 redundancy tick-MI
    scalars, argmax selection with the same tie rules."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql,
    )

    cols = {
        0: "hour6",
        1: "dow",
        2: "vdec",
        3: "ubkt",
    }

    def mi(a: str, b: str) -> str:
        return (
            "(SELECT CAST(SUM(CAST(ROUND(CAST(j.nxy AS DOUBLE) "
            "* LOG2(CAST(nn.n AS DOUBLE) * CAST(j.nxy AS DOUBLE) "
            "/ (CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE))) "
            "/ CAST(nn.n AS DOUBLE) * 1e12, 0) AS BIGINT)) AS BIGINT) "
            f"FROM (SELECT {a} AS av, {b} AS bv, "
            "CAST(COUNT(*) AS BIGINT) AS nxy FROM base GROUP BY 1, 2) j "
            f"JOIN (SELECT {a} AS av, CAST(COUNT(*) AS BIGINT) AS na "
            "FROM base GROUP BY 1) ma ON ma.av = j.av "
            f"JOIN (SELECT {b} AS bv, CAST(COUNT(*) AS BIGINT) AS nb "
            "FROM base GROUP BY 1) mb ON mb.bv = j.bv, nn)"
        )

    rel_rows = ", ".join(
        f"({i}, '{cols[i]}', {mi(cols[i], 'y')})" for i in range(4)
    )
    red_rows = ", ".join(
        f"({i}, {j}, {mi(cols[i], cols[j])})"
        for i in range(4)
        for j in range(i + 1, 4)
    )
    return (
        "WITH base AS (SELECT "
        "((epoch_us(ts) // 3600000000) % 24) // 4 AS hour6, "
        "(epoch_us(ts) // 86400000000 + 4) % 7 AS dow, "
        "LEAST(CAST(ROUND(value * 100, 0) AS BIGINT) // 5000, 9) "
        "AS vdec, "
        f"({mix32_sql('user_id', 71)}) % 8 AS ubkt, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y "
        "FROM events), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base), "
        f"rels AS MATERIALIZED (SELECT * FROM (VALUES {rel_rows}) "
        "AS v(fid, fname, rel)), "
        f"reds AS MATERIALIZED (SELECT * FROM (VALUES {red_rows}) "
        "AS v(a, b, red)), "
        "first AS (SELECT fid, fname, rel FROM rels "
        "ORDER BY rel DESC, fid LIMIT 1), "
        "cand AS (SELECT r.fid, r.fname, r.rel - rd.red AS score "
        "FROM rels r, first f "
        "JOIN reds rd ON rd.a = LEAST(r.fid, f.fid) "
        "AND rd.b = GREATEST(r.fid, f.fid) "
        "WHERE r.fid <> f.fid), "
        "second AS (SELECT fid, fname, score FROM cand "
        "ORDER BY score DESC, fid LIMIT 1) "
        "SELECT CAST(round AS BIGINT) AS round, feature, "
        "CAST(score_ticks AS BIGINT) AS score_ticks FROM ("
        "SELECT 1 AS round, fname AS feature, rel AS score_ticks "
        "FROM first UNION ALL "
        "SELECT 2, fname, score FROM second) ORDER BY round"
    )


def _q_adwin_check(sf_dir: str) -> pa.Table:
    """ADWIN-style change check over the daily revenue series: for
    every cut, compare the two window means against the Hoeffding
    bound eps = sqrt(R^2 ln(2/delta) / 2 * (1/nl + 1/nr)) with R =
    the exact series range and delta = 0.05 -- the mean difference
    uses exact integers (|nl*Sr - nr*Sl|), the bound one pinned
    float; reports the most significant cut and whether it fires."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    n = len(ys)
    rng = max(ys) - min(ys)
    total = sum(ys)
    cum = 0
    best = None
    for t in range(1, n):
        cum += ys[t - 1]
        nl, nr = t, n - t
        sl, sr = cum, total - cum
        diff = abs(nl * sr - nr * sl)  # |mean diff| * nl * nr
        md = float(diff) / (float(nl) * float(nr))
        eps = np.sqrt(
            float(rng)
            * float(rng)
            * np.log(2.0 / 0.05)
            / 2.0
            * (1.0 / float(nl) + 1.0 / float(nr))
        )
        ratio = md / eps
        key = (-ratio, t)
        if best is None or key < best:
            best = key
    ratio, t = -best[0], best[1]
    return pa.table(
        {
            "cut_t": pa.array([t], pa.int64()),
            "ratio": round_like_sql([ratio], 6),
            "fires": pa.array(
                [1 if ratio > 1.0 else 0], pa.int64()
            ),
        }
    )


def _q_james_stein(sf_dir: str) -> pa.Table:
    """James-Stein empirical-Bayes shrinkage of the 24 hourly
    purchase rates toward the grand rate: shrink factor 1 - (k-3) *
    sigma2 / S with sigma2 = pbar(1-pbar) * mean(1/n_h) and S =
    sum (p_h - pbar)^2 (per-hour terms 1e12-tick quantized,
    order-free), shrunk rates as pinned floats."""
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
                "k": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h"],
        [("k", "sum", "k"), ("_one", "sum", "n")],
    ).sort_by("h")
    kk = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    big_k, big_n = int(kk.sum()), int(nn.sum())
    pbar = float(big_k) / float(big_n)
    m = len(kk)
    s_t = 0
    inv_t = 0
    for k, n in zip(kk.tolist(), nn.tolist()):
        ph = float(k) / float(n)
        s_t += int(
            round_half_away(
                np.array([(ph - pbar) * (ph - pbar) * 1e12])
            )[0]
        )
        inv_t += int(
            round_half_away(np.array([1.0 / float(n) * 1e12]))[0]
        )
    s = float(s_t) / 1e12
    sigma2 = pbar * (1.0 - pbar) * (float(inv_t) / 1e12 / float(m))
    shrink = max(0.0, 1.0 - float(m - 3) * sigma2 / s)
    shrunk = [
        pbar + shrink * (float(k) / float(n) - pbar)
        for k, n in zip(kk.tolist(), nn.tolist())
    ]
    return pa.table(
        {
            "hour": pa.array(
                agg["h"].to_numpy(zero_copy_only=False), pa.int64()
            ),
            "raw_rate": round_like_sql(
                [
                    float(k) / float(n)
                    for k, n in zip(kk.tolist(), nn.tolist())
                ],
                6,
            ),
            "shrunk_rate": round_like_sql(shrunk, 6),
            "shrink_factor": round_like_sql([shrink] * m, 6),
        }
    )


def _q_iv_2sls(sf_dir: str) -> pa.Table:
    """Instrumental-variables (2SLS, one instrument) estimate of the
    hour-of-day effect on value cents, instrumented by day-of-week:
    beta_IV = (N sum zy - sum z sum y) / (N sum zx - sum z sum x)
    with every moment an exact integer -- one float division, plus
    the first-stage strength (z-x covariance numerator).  Completes
    the causal panel alongside DiD / RDD / IPW / fixed effects."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_n": pa.array(np.ones(len(ts), np.int64)),
                "z": pa.array((ts // 86_400_000_000 + 4) % 7),
                "x": pa.array((ts // 3_600_000_000) % 24),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
                "zy": pa.array(
                    ((ts // 86_400_000_000 + 4) % 7)
                    * scaled_int(batch["value"], 100.0)
                ),
                "zx": pa.array(
                    ((ts // 86_400_000_000 + 4) % 7)
                    * ((ts // 3_600_000_000) % 24)
                ),
                "g": pa.array(np.zeros(len(ts), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["g"],
        [(c, "sum", c) for c in ("_n", "z", "x", "y", "zy", "zx")],
    )
    g = {c: int(agg[c][0].as_py()) for c in
         ("_n", "z", "x", "y", "zy", "zx")}
    n = g["_n"]
    num = n * g["zy"] - g["z"] * g["y"]
    den = n * g["zx"] - g["z"] * g["x"]
    beta = float(num) / float(den)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "cov_zy_num": pa.array([num], pa.int64()),
            "cov_zx_num": pa.array([den], pa.int64()),
            "beta_iv": round_like_sql([beta], 6),
        }
    )


def _q_harrell_c(sf_dir: str) -> pa.Table:
    """Harrell's concordance index for time-to-first-error with the
    user's total value cents as the risk score: over comparable pairs
    (the earlier time is an observed event), concordant = higher
    score fails earlier, ties in score count 1/2 -- doubled exact
    integer counts, one float division.  The per-user reduction is
    distributed; the pair count runs on the users-bounded table."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type", "value"],
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
                "terr": pa.array(np.where(et == "error", ts, big)),
                "sc": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("t0", "min", "t0"), ("tlast", "max", "tlast"),
         ("terr", "min", "terr"), ("sc", "sum", "sc")],
    )
    t0 = peru["t0"].to_numpy(zero_copy_only=False)
    tlast = peru["tlast"].to_numpy(zero_copy_only=False)
    terr = peru["terr"].to_numpy(zero_copy_only=False)
    sc = peru["sc"].to_numpy(zero_copy_only=False).astype(np.int64)
    obs = terr < big
    dur = np.where(obs, terr - t0, tlast - t0)
    n = len(dur)
    conc2 = 0  # doubled concordant count (score ties -> 1)
    comp = 0
    for i in range(n):
        if not obs[i]:
            continue
        # pairs where i is the (strictly) earlier observed event
        later = (dur > dur[i]) | ((dur == dur[i]) & ~obs)
        comp += int(later.sum())
        conc2 += 2 * int((sc[later] < sc[i]).sum())
        conc2 += int((sc[later] == sc[i]).sum())
    c = float(conc2) / (2.0 * float(comp))
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "n_comparable": pa.array([comp], pa.int64()),
            "conc2": pa.array([conc2], pa.int64()),
            "c_index": round_like_sql([c], 6),
        }
    )


def _clique16(sf_dir: str):
    """Shared top-16 proximity-graph machinery: cells (bit order by
    count desc, cell), per-vertex OPEN adjacency bitmasks."""
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
    cells = [int(c) for _, c in top]
    xy = [(c % 96, c // 96) for c in cells]
    adjm = [0] * 16
    for i in range(16):
        for j in range(16):
            if i != j and max(
                abs(xy[i][0] - xy[j][0]), abs(xy[i][1] - xy[j][1])
            ) <= _CLIQUE_T:
                adjm[i] |= 1 << j
    return cells, adjm


def _q_maximal_cliques(sf_dir: str) -> pa.Table:
    """EVERY maximal clique of the hot-cell proximity graph by full
    2^16 enumeration: clique = no non-edge pair inside; maximal = no
    outside vertex adjacent to all members (m subset-of adj[w]) --
    pure bitmask certificates.  Output: count per clique size plus
    the total (the Moon-Moser-style census behind community
    enumeration)."""
    _cells, adjm = _clique16(sf_dir)
    masks = np.arange(1 << 16, dtype=np.int64)
    is_clique = np.ones(1 << 16, bool)
    for i in range(16):
        for j in range(i + 1, 16):
            if not adjm[i] >> j & 1:
                p = (1 << i) | (1 << j)
                is_clique &= (masks & p) != p
    is_clique[0] = False  # the empty set is not a clique here
    extendable = np.zeros(1 << 16, bool)
    for w in range(16):
        not_in = (masks >> w & 1) == 0
        fits = (masks & ~np.int64(adjm[w])) == 0
        extendable |= not_in & fits & is_clique
    maximal = is_clique & ~extendable
    pc = _popcount64(masks)
    sizes, counts = np.unique(pc[maximal], return_counts=True)
    total = int(maximal.sum())
    return pa.table(
        {
            "size": pa.array(sizes.astype(np.int64)),
            "n_cliques": pa.array(counts.astype(np.int64)),
            "total_maximal": pa.array(
                [total] * len(sizes), pa.int64()
            ),
        }
    )


def _q_max_independent_set(sf_dir: str) -> pa.Table:
    """Exact maximum independent set of the same proximity graph
    (complement-clique by 2^16 enumeration, edges as excluders) --
    with the exact minimum vertex cover size n - alpha via Gallai's
    identity.  Canonical ties by smallest mask."""
    cells, adjm = _clique16(sf_dir)
    masks = np.arange(1 << 16, dtype=np.int64)
    ok = np.ones(1 << 16, bool)
    for i in range(16):
        for j in range(i + 1, 16):
            if adjm[i] >> j & 1:  # EDGE pairs are forbidden
                p = (1 << i) | (1 << j)
                ok &= (masks & p) != p
    pc = _popcount64(masks)
    alpha = int(pc[ok].max())
    best = int(masks[ok & (pc == alpha)].min())
    members = sorted(cells[i] for i in range(16) if best >> i & 1)
    return pa.table(
        {
            "rank": pa.array(
                list(range(1, len(members) + 1)), pa.int64()
            ),
            "cell": pa.array(members, pa.int64()),
            "alpha": pa.array([alpha] * len(members), pa.int64()),
            "vertex_cover": pa.array(
                [16 - alpha] * len(members), pa.int64()
            ),
        }
    )


def _q_min_dominating_set(sf_dir: str) -> pa.Table:
    """Exact minimum dominating set of the proximity graph by 2^16
    enumeration: a mask dominates iff the union of its members'
    CLOSED neighborhoods covers all 16 vertices -- integer bitmask
    OR certificates, argmin popcount with smallest-mask ties."""
    cells, adjm = _clique16(sf_dir)
    closed = [adjm[i] | (1 << i) for i in range(16)]
    full = (1 << 16) - 1
    masks = np.arange(1 << 16, dtype=np.int64)
    cover = np.zeros(1 << 16, np.int64)
    for w in range(16):
        inm = (masks >> w & 1) == 1
        cover[inm] |= np.int64(closed[w])
    ok = cover == full
    pc = _popcount64(masks)
    gamma = int(pc[ok].min())
    best = int(masks[ok & (pc == gamma)].min())
    members = sorted(cells[i] for i in range(16) if best >> i & 1)
    return pa.table(
        {
            "rank": pa.array(
                list(range(1, len(members) + 1)), pa.int64()
            ),
            "cell": pa.array(members, pa.int64()),
            "gamma": pa.array([gamma] * len(members), pa.int64()),
        }
    )


def _q_pmi_similarity(sf_dir: str) -> pa.Table:
    """Distributional similarity from PPMI vectors (count-based
    word embeddings): adjacent-token co-occurrence counts build each
    vocab word's PPMI row (1e6-tick quantized max(0, log2(N n_xy /
    (n_x n_y)))), similarity = cosine over the integer tick vectors
    (pinned float), top-5 pairs by (sim desc, w1, w2)."""
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
    co: dict[tuple[str, str], int] = {}
    left: dict[str, int] = {}
    right: dict[str, int] = {}
    big_n = 0
    for g, c in zip(bc["gram"].to_pylist(), bc["n"].to_pylist()):
        a, b = g.split(" ", 1)
        c = int(c)
        co[(a, b)] = co.get((a, b), 0) + c
        left[a] = left.get(a, 0) + c
        right[b] = right.get(b, 0) + c
        big_n += c
    vocab = sorted(set(left) | set(right))
    ctx = {w: i for i, w in enumerate(vocab)}
    vecs = {w: np.zeros(len(vocab), np.int64) for w in left}
    for (a, b), c in co.items():
        val = np.log2(
            float(big_n)
            * float(c)
            / (float(left[a]) * float(right[b]))
        )
        if val > 0:
            vecs[a][ctx[b]] = int(
                round_half_away(np.array([val * 1e6]))[0]
            )
    words = sorted(vecs)
    rows = []
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            a, b = vecs[words[i]], vecs[words[j]]
            dot = int((a * b).sum())
            na = int((a * a).sum())
            nb = int((b * b).sum())
            if na == 0 or nb == 0:
                continue
            sim = float(dot) / np.sqrt(float(na)) / np.sqrt(float(nb))
            rows.append((words[i], words[j], sim))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    top = rows[:5]
    return pa.table(
        {
            "w1": pa.array([r[0] for r in top]),
            "w2": pa.array([r[1] for r in top]),
            "cosine": round_like_sql([r[2] for r in top], 6),
        }
    )


def _q_hawkes_branching(sf_dir: str) -> pa.Table:
    """Self-excitation (Hawkes branching-ratio) screen over hourly
    event counts: for a cluster process the index of dispersion D =
    var/mean exceeds 1, and the moment estimate eta = 1 -
    sqrt(mean/var) (valid when D > 1).  Exact integer moments, two
    pinned float steps."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def prep(batch: pa.Table) -> pa.Table:
        hr = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        return pa.table(
            {"hr": pa.array(hr), "_one": pa.array(np.ones(len(hr), np.int64))}
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["hr"],
        [("_one", "sum", "n")],
    )
    hh = agg["hr"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(hh.min()), int(hh.max())
    xs = np.zeros(hi - lo + 1, np.int64)
    xs[hh - lo] = agg["n"].to_numpy(zero_copy_only=False)
    n = len(xs)
    s1 = int(xs.sum())
    s2 = int((xs * xs).sum())
    mean = float(s1) / float(n)
    var = float(s2) / float(n) - mean * mean
    d = var / mean
    eta = 1.0 - np.sqrt(mean / var) if d > 1.0 else 0.0
    return pa.table(
        {
            "n_hours": pa.array([n], pa.int64()),
            "dispersion": round_like_sql([d], 6),
            "eta_hat": round_like_sql([float(eta)], 6),
        }
    )


_LIFE_STEPS = 2


def _q_game_of_life_steps(sf_dir: str) -> pa.Table:
    """Conway's Game of Life, 2 steps, seeded by the event-occupancy
    mask of the 96x96 grid (the non-monotone cellular-automaton
    member of the grid-iteration family, alongside heat diffusion
    and bootstrap percolation): pure integer neighbor counts, dead
    boundary.  Output: alive count after each step plus the exact
    alive-cell-id sum checksum."""
    cnt, _ = _grid_count_cents(sf_dir)
    alive = (cnt > 0).astype(np.int64)
    rows = [(0, int(alive.sum()), int((np.flatnonzero(alive.T.ravel())).sum()))]
    for step in range(1, _LIFE_STEPS + 1):
        nb = np.zeros_like(alive)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                r0, r1 = max(0, dr), 96 + min(0, dr)
                c0, c1 = max(0, dc), 96 + min(0, dc)
                nb[r0:r1, c0:c1] += alive[
                    r0 - dr : r1 - dr, c0 - dc : c1 - dc
                ]
        alive = (
            ((alive == 1) & ((nb == 2) | (nb == 3)))
            | ((alive == 0) & (nb == 3))
        ).astype(np.int64)
        # checksum: sum of cell ids (x + y * 96) with x = first axis
        ids = np.flatnonzero(alive.T.ravel())
        rows.append((step, int(alive.sum()), int(ids.sum())))
    return pa.table(
        {
            "step": pa.array([r[0] for r in rows], pa.int64()),
            "n_alive": pa.array([r[1] for r in rows], pa.int64()),
            "id_sum": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _q_rv_coefficient(sf_dir: str) -> pa.Table:
    """Escoufier's RV coefficient (matrix correlation) between the
    hour x event-type count structures of the first and second half
    of days: with X, Y the 24x5 count matrices, RV =
    <X'X, Y'Y> / (||X'X|| ||Y'Y||) -- every Gram entry and inner
    product is an exact integer (Python-int accumulation), floats
    only in the two final square roots."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ti = np.array(
            [tmap[t] for t in batch["event_type"].to_pylist()],
            np.int64,
        )
        return pa.table(
            {
                "day": pa.array(ts // 86_400_000_000),
                "h": pa.array((ts // 3_600_000_000) % 24),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["day", "h", "t"],
        [("_one", "sum", "n")],
    )
    days = sorted(set(int(x) for x in agg["day"].to_pylist()))
    mid = days[len(days) // 2]
    x = np.zeros((24, 5), object)
    y = np.zeros((24, 5), object)
    for i in range(agg.num_rows):
        d = int(agg["day"][i].as_py())
        h = int(agg["h"][i].as_py())
        t = int(agg["t"][i].as_py())
        n = int(agg["n"][i].as_py())
        if d < mid:
            x[h, t] += n
        else:
            y[h, t] += n
    gx = x.T @ x  # 5x5 exact integer Grams
    gy = y.T @ y
    num = int((gx * gy).sum())
    nx = int((gx * gx).sum())
    ny = int((gy * gy).sum())
    rv = float(num) / np.sqrt(float(nx)) / np.sqrt(float(ny))
    return pa.table(
        {
            "inner": pa.array([num], pa.int64()),
            "rv": round_like_sql([float(rv)], 6),
        }
    )


def _q_distance_correlation(sf_dir: str) -> pa.Table:
    """Distance correlation (Szekely) between the daily revenue and
    daily event-count series -- the dependence measure that is zero
    ONLY under independence: pairwise distances double-centered in
    the n^2-scaled integer form (A~ = n^2 a - n(row+col) + tot, all
    exact), dCor^2 = <A~,B~>/sqrt(<A~,A~><B~,B~>) with the n powers
    cancelling; Python-int accumulation, floats only at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    cs = _daily_count_series(sf_dir)
    n = len(ys)

    def centered(v: list[int]) -> list[list[int]]:
        a = [[abs(v[i] - v[j]) for j in range(n)] for i in range(n)]
        row = [sum(a[i]) for i in range(n)]
        tot = sum(row)
        return [
            [
                n * n * a[i][j] - n * (row[i] + row[j]) + tot
                for j in range(n)
            ]
            for i in range(n)
        ]

    at = centered(ys)
    bt = centered(cs)
    num = sum(
        at[i][j] * bt[i][j] for i in range(n) for j in range(n)
    )
    na = sum(at[i][j] ** 2 for i in range(n) for j in range(n))
    nb = sum(bt[i][j] ** 2 for i in range(n) for j in range(n))
    dcor2 = float(num) / np.sqrt(float(na)) / np.sqrt(float(nb))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "dcor2": round_like_sql([float(dcor2)], 6),
        }
    )


def _q_chatterjee_xi(sf_dir: str) -> pa.Table:
    """Chatterjee's xi rank correlation (2020) of daily event count
    against daily revenue: order days by (revenue, day), rank the
    counts with the deterministic ROW_NUMBER convention (count, day),
    xi = 1 - 3 sum |r_{i+1} - r_i| / (n^2 - 1) -- exact integers,
    one float division."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    cs = _daily_count_series(sf_dir)
    n = len(ys)
    order = sorted(range(n), key=lambda t: (ys[t], t))
    rank_of = sorted(range(n), key=lambda t: (cs[t], t))
    rk = [0] * n
    for r, t in enumerate(rank_of):
        rk[t] = r + 1
    seq = [rk[t] for t in order]
    s = sum(abs(seq[i + 1] - seq[i]) for i in range(n - 1))
    xi = 1.0 - 3.0 * float(s) / float(n * n - 1)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "abs_rank_steps": pa.array([s], pa.int64()),
            "xi": round_like_sql([xi], 6),
        }
    )


def _q_tail_dependence(sf_dir: str) -> pa.Table:
    """Empirical copula tail-dependence coefficients between daily
    revenue and daily count at q = 0.9: lambda_U = P(both above
    their 0.9 quantile)/(1 - 0.9), lambda_L the mirrored lower
    version at 0.1 -- exact quantile_disc thresholds and integer
    joint counts, two float divisions."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    cs = _daily_count_series(sf_dir)
    n = len(ys)

    def qdisc(v: list[int], q_num: int, q_den: int) -> int:
        xs = sorted(v)
        return xs[-(-q_num * n // q_den) - 1]

    yu, cu = qdisc(ys, 9, 10), qdisc(cs, 9, 10)
    yl, cl = qdisc(ys, 1, 10), qdisc(cs, 1, 10)
    both_u = sum(
        1 for y, c in zip(ys, cs) if y > yu and c > cu
    )
    both_l = sum(
        1 for y, c in zip(ys, cs) if y <= yl and c <= cl
    )
    lam_u = float(both_u) / (0.1 * float(n))
    lam_l = float(both_l) / (0.1 * float(n))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_upper": pa.array([both_u], pa.int64()),
            "n_lower": pa.array([both_l], pa.int64()),
            "lambda_u": round_like_sql([lam_u], 6),
            "lambda_l": round_like_sql([lam_l], 6),
        }
    )


def _q_blomqvist_beta(sf_dir: str) -> pa.Table:
    """Blomqvist's beta (medial correlation) between daily revenue
    and daily count: quadrant concordance around the two exact
    medians, beta = (n_conc - n_disc) / (n_conc + n_disc) with
    on-median points excluded -- pure integer counting."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    ys = _daily_revenue_cents(sf_dir)
    cs = _daily_count_series(sf_dir)
    n = len(ys)
    my = sorted(ys)[-(-n // 2) - 1]
    mc = sorted(cs)[-(-n // 2) - 1]
    conc = disc = 0
    for y, c in zip(ys, cs):
        if y == my or c == mc:
            continue
        if (y > my) == (c > mc):
            conc += 1
        else:
            disc += 1
    beta = float(conc - disc) / float(conc + disc)
    return pa.table(
        {
            "n_conc": pa.array([conc], pa.int64()),
            "n_disc": pa.array([disc], pa.int64()),
            "beta": round_like_sql([beta], 6),
        }
    )


def _q_survey_estimators(sf_dir: str) -> pa.Table:
    """Survey-sampling estimator panel for total user revenue from a
    deterministic 1-in-5 mix32 user sample with event count as the
    auxiliary: Horvitz-Thompson (exact integer, pi = 1/5), ratio
    estimator X_tot * (sum y_s / sum x_s), regression estimator
    y_HT + b (X_tot - x_HT), and the Kish design effect of the HT
    weights -- exact moments, pinned float chains, true total
    reported for audit."""
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
        return pa.table(
            {
                "user_id": batch["user_id"],
                "y": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("y", "sum", "y"), ("_one", "sum", "x")],
    )
    uid = peru["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = peru["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = peru["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    samp = mix32(uid, 83) % 5 == 0
    y_true = int(y.sum())
    x_tot = int(x.sum())
    ys_, xs_ = y[samp], x[samp]
    n_s = int(samp.sum())
    sy, sx = int(ys_.sum()), int(xs_.sum())
    ht = 5 * sy
    ratio = float(x_tot) * (float(sy) / float(sx))
    # regression estimator with the sample OLS slope of y on x
    sxy = int((ys_ * xs_).sum())
    sxx = int((xs_ * xs_).sum())
    b = float(n_s * sxy - sx * sy) / float(n_s * sxx - sx * sx)
    reg = float(ht) + b * (float(x_tot) - 5.0 * float(sx))
    # all HT weights are 5 -> deff = 1 by construction; report it
    deff = (
        float(n_s)
        * float(n_s * 25)
        / (float(5 * n_s) * float(5 * n_s))
    )
    return pa.table(
        {
            "n_sample": pa.array([n_s], pa.int64()),
            "true_total": pa.array([y_true], pa.int64()),
            "ht_total": pa.array([ht], pa.int64()),
            "ratio_total": round_like_sql([ratio], 6),
            "reg_total": round_like_sql([reg], 6),
            "kish_deff": round_like_sql([deff], 6),
        }
    )


def _q_lexis_apc(sf_dir: str) -> pa.Table:
    """Lexis-surface age-period-cohort aggregation of user activity:
    age = whole weeks since the user's first event, period = whole
    weeks since the corpus start, cohort = period - age (the exact
    APC identity, asserted per cell).  Integer counts per (age,
    period) cell; output = per-age totals with the modal period."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": batch["ts"].cast(pa.int64()),
                "t0": batch["ts"].cast(pa.int64()),
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("t0", "min", "t0")],
    )
    t0map = {
        int(peru["user_id"][i].as_py()): int(peru["t0"][i].as_py())
        for i in range(peru.num_rows)
    }
    start = min(t0map.values())
    t0_items = sorted(t0map.items())
    uid_arr = np.array([u for u, _ in t0_items], np.int64)
    t0_arr = np.array([t for _, t in t0_items], np.int64)

    def cells(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(uid_arr, uid)
        t0 = t0_arr[pos]
        wk = 7 * 86_400_000_000
        age = (ts - t0) // wk
        per = (ts - start) // wk
        return pa.table(
            {
                "age": pa.array(age),
                "per": pa.array(per),
                "_one": pa.array(np.ones(len(ts), np.int64)),
            }
        )

    prepped = ds.map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    agg = hash_aggregate(
        prepped.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["age", "per"],
        [("_one", "sum", "n")],
    )
    per_age: dict[int, dict[int, int]] = {}
    for i in range(agg.num_rows):
        a = int(agg["age"][i].as_py())
        p = int(agg["per"][i].as_py())
        per_age.setdefault(a, {})[p] = int(agg["n"][i].as_py())
    rows = []
    for a in sorted(per_age):
        tot = sum(per_age[a].values())
        modal = min(
            per_age[a], key=lambda p: (-per_age[a][p], p)
        )
        rows.append((a, tot, modal, modal - a))
    return pa.table(
        {
            "age_weeks": pa.array([r[0] for r in rows], pa.int64()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "modal_period": pa.array(
                [r[2] for r in rows], pa.int64()
            ),
            "modal_cohort": pa.array(
                [r[3] for r in rows], pa.int64()
            ),
        }
    )


def _q_gompertz_hazard(sf_dir: str) -> pa.Table:
    """Gompertz mortality-law fit to user churn: discrete hazard per
    tenure HOUR h_w = (users whose LAST activity falls in hour w) /
    (users with tenure >= w), log-hazard 1e9-tick quantized, the
    Gompertz log-linear slope from the exact integer tick regression
    over hours with 0 < d < r -- the actuarial companion of the
    Weibull shape fit."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "t0": ts,
                "t1": ts,
            }
        )

    peru = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("t0", "min", "t0"), ("t1", "max", "t1")],
    )
    hour = 3_600_000_000
    ten = (
        (
            peru["t1"].to_numpy(zero_copy_only=False)
            - peru["t0"].to_numpy(zero_copy_only=False)
        )
        // hour
    ).astype(np.int64)
    wmax = int(ten.max())
    deaths = np.bincount(ten, minlength=wmax + 1).astype(np.int64)
    at_risk = np.cumsum(deaths[::-1])[::-1]
    xs, ys = [], []
    for w in range(wmax + 1):
        d, r = int(deaths[w]), int(at_risk[w])
        if d > 0 and d < r:
            lh = np.log(float(d) / float(r))
            xs.append(w)
            ys.append(
                int(round_half_away(np.array([lh * 1e9]))[0])
            )
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den) / 1e9
    return pa.table(
        {
            "n_hazard_hours": pa.array([n], pa.int64()),
            "gompertz_slope": round_like_sql([slope], 6),
        }
    )


def _pca_power_oracle_sql() -> str:
    """Mirror of _q_pca_power: the 40 integer power-iteration steps
    unrolled as generated CTE triples (matvec, max-abs, sign-split
    truncating renorm), all HUGEINT."""
    steps = []
    for i in range(1, _PCA_ITERS + 1):
        prev = "v0" if i == 1 else f"v{i - 1}"
        steps.append(
            f"w{i} AS MATERIALIZED (SELECT cc.d1 AS dim, "
            f"CAST(SUM(cc.c * {prev}.v) AS HUGEINT) AS w "
            f"FROM cc JOIN {prev} ON {prev}.dim = cc.d2 GROUP BY 1), "
            f"m{i} AS MATERIALIZED (SELECT MAX(ABS(w)) AS mx FROM w{i}), "
            f"v{i} AS MATERIALIZED (SELECT dim, CASE WHEN w < 0 "
            f"THEN -((-w * {_PCA_SCALE}) // mx) "
            f"ELSE (w * {_PCA_SCALE}) // mx END AS v FROM w{i}, m{i})"
        )
        last = f"v{_PCA_ITERS}"
    return (
        "WITH ev AS MATERIALIZED (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS dim, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e4, 0) "
        "AS BIGINT) AS vq FROM embeddings), "
        "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings), "
        "sv AS (SELECT dim, CAST(SUM(vq) AS HUGEINT) AS s FROM ev "
        "GROUP BY dim), "
        "spp AS (SELECT a.dim AS d1, b.dim AS d2, "
        "CAST(SUM(CAST(a.vq AS HUGEINT) * b.vq) AS HUGEINT) AS sp "
        "FROM ev a JOIN ev b ON b.vec_id = a.vec_id GROUP BY 1, 2), "
        "cc AS MATERIALIZED (SELECT spp.d1, spp.d2, nn.n * spp.sp - s1.s * s2.s AS c "
        "FROM spp JOIN sv s1 ON s1.dim = spp.d1 "
        "JOIN sv s2 ON s2.dim = spp.d2, nn), "
        "v0 AS (SELECT DISTINCT dim, "
        f"CAST({_PCA_SCALE} AS HUGEINT) AS v FROM ev), "
        + ", ".join(steps)
        + ", num AS (SELECT CAST(SUM(va.v * cc.c * vb.v) AS HUGEINT) "
        f"AS x FROM cc JOIN {last} va ON va.dim = cc.d1 "
        f"JOIN {last} vb ON vb.dim = cc.d2), "
        f"den AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS x FROM {last}) "
        f"SELECT CAST({last}.dim AS BIGINT) AS dim, "
        f"CAST({last}.v AS BIGINT) AS vq, "
        "ROUND(CAST(num.x AS DOUBLE) / CAST(den.x AS DOUBLE) "
        "/ (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) * 1e8), 6) "
        f"AS eigval FROM {last}, num, den, nn ORDER BY dim"
    )


def _dtw_oracle_sql() -> str:
    """Mirror of _q_dtw_distance: the 24x24 integer DTW DP unrolled by
    anti-diagonal as generated materialized CTEs."""
    steps = []
    for d in range(1, 47):
        dg = (
            f"LEFT JOIN g{d - 2} dg ON dg.i = c.i - 1 AND dg.j = c.j - 1 "
            if d >= 2
            else ""
        )
        case = (
            "CASE WHEN c.i = 0 THEN l.v WHEN c.j = 0 THEN u.v "
            "ELSE LEAST(u.v, l.v, dg.v) END"
            if d >= 2
            else "CASE WHEN c.i = 0 THEN l.v ELSE u.v END"
        )
        steps.append(
            f"g{d} AS MATERIALIZED (SELECT c.i, c.j, c.cost + {case} AS v "
            "FROM cost c "
            f"LEFT JOIN g{d - 1} u ON u.i = c.i - 1 AND u.j = c.j "
            f"LEFT JOIN g{d - 1} l ON l.i = c.i AND l.j = c.j - 1 "
            f"{dg}WHERE c.i + c.j = {d})"
        )
    return (
        "WITH e2 AS (SELECT epoch_us(ts) // 3600000000 % 24 AS h, "
        "event_type FROM events "
        "WHERE event_type IN ('click', 'view')), "
        "hh AS (SELECT r.range AS h FROM range(0, 24) r), "
        "pa AS MATERIALIZED (SELECT hh.h, COALESCE(x.c, 0) AS c FROM hh "
        "LEFT JOIN (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM e2 "
        "WHERE event_type = 'click' GROUP BY h) x ON x.h = hh.h), "
        "pb AS MATERIALIZED (SELECT hh.h, COALESCE(x.c, 0) AS c FROM hh "
        "LEFT JOIN (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM e2 "
        "WHERE event_type = 'view' GROUP BY h) x ON x.h = hh.h), "
        "cost AS MATERIALIZED (SELECT ai.h AS i, bj.h AS j, "
        "ABS(ai.c - bj.c) AS cost FROM pa ai, pb bj), "
        "g0 AS MATERIALIZED (SELECT 0 AS i, 0 AS j, cost AS v "
        "FROM cost WHERE i = 0 AND j = 0), "
        + ", ".join(steps)
        + " SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM pa) AS n_a, "
        "(SELECT CAST(SUM(c) AS BIGINT) FROM pb) AS n_b, "
        "CAST(g46.v AS BIGINT) AS dtw FROM g46 "
        "WHERE g46.i = 23 AND g46.j = 23"
    )


def _kalman_oracle_sql() -> str:
    """Mirror of _q_kalman_1d: 29 unrolled scalar-state filter steps
    (sign-split truncating update)."""
    sc, q, r = _KAL_SC, _KAL_Q, _KAL_R
    steps = []
    for t in range(1, 30):
        prev = f"s{t - 1}"
        steps.append(
            f"k{t} AS (SELECT s.x, s.p + {q} AS pp, "
            f"((s.p + {q}) * {sc}) // (s.p + {q} + {r}) AS k "
            f"FROM {prev} s), "
            f"s{t} AS (SELECT z.x + (CASE WHEN z.d < 0 "
            f"THEN -((-z.d) // {sc}) ELSE z.d // {sc} END) AS x, "
            f"(({sc} - z.k) * z.pp) // {sc} AS p FROM "
            f"(SELECT k.x, k.pp, k.k, k.k * (CAST((SELECT y FROM dn "
            f"WHERE t = {t}) AS HUGEINT) * {sc} - k.x) AS d "
            f"FROM k{t} k) z)"
        )
    outs = " UNION ALL ".join(
        f"SELECT {t} AS t, x FROM s{t}" for t in range(30)
    )
    return (
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "s0 AS (SELECT CAST((SELECT y FROM dn WHERE t = 0) AS HUGEINT) "
        f"* {sc} AS x, CAST({4 * sc} AS HUGEINT) AS p), "
        + ", ".join(steps)
        + f", fx AS ({outs}) "
        "SELECT CAST(fx.t AS BIGINT) AS t, dn.y, "
        "ROUND(CAST(fx.x AS DOUBLE) / 1e6, 6) AS x_filt "
        "FROM fx JOIN dn ON dn.t = fx.t ORDER BY 1"
    )


def _adaboost_oracle_sql() -> str:
    """Mirror of _q_adaboost_2: two deterministic stump picks with
    two-valued round-2 weights."""
    fv = "(CASE WHEN cand.feat = 0 THEN v.h ELSE v.y END)"
    fvm = "(CASE WHEN cand.feat = 0 THEN vm.h ELSE vm.y END)"
    pb = f"(({fv} <= cand.thr) = (cand.pol = 0))"
    pbm = f"(({fvm} <= cand.thr) = (cand.pol = 0))"
    return (
        "WITH v AS MATERIALIZED (SELECT "
        "epoch_us(ts) // 3600000000 % 24 AS h, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2, 3), "
        "nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM v), "
        "rw AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn FROM "
        "(SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events)), "
        "qt AS (SELECT DISTINCT rw.y AS thr FROM rw CROSS JOIN nt "
        "JOIN range(1, 16) i ON rw.rn = (i.range * (nt.n - 1)) // 16 "
        "+ 1), "
        "cand AS (SELECT feat, thr, pol.range AS pol FROM "
        "(SELECT 0 AS feat, i.range AS thr FROM range(0, 23) i "
        "UNION ALL SELECT 1, thr FROM qt) b, range(0, 2) pol), "
        f"c1 AS (SELECT cand.feat, cand.thr, cand.pol, "
        f"CAST(SUM(CASE WHEN {pb} <> (v.t = 1) THEN v.c ELSE 0 END) "
        "AS BIGINT) AS err FROM cand, v GROUP BY 1, 2, 3), "
        "s1 AS (SELECT * FROM c1 "
        "ORDER BY err, feat, thr, pol LIMIT 1), "
        "a1 AS (SELECT s1.feat, s1.thr, s1.pol, s1.err, "
        "0.5 * LN((CAST(nt.n AS DOUBLE) - CAST(s1.err AS DOUBLE)) "
        "/ CAST(s1.err AS DOUBLE)) AS a FROM s1, nt), "
        "vm AS MATERIALIZED (SELECT v.h, v.y, v.t, v.c, "
        "CASE WHEN ((CASE WHEN a1.feat = 0 THEN v.h ELSE v.y END) "
        "<= a1.thr) = (a1.pol = 0) THEN 1 ELSE 0 END AS p1 "
        "FROM v, a1), "
        f"c2 AS (SELECT cand.feat, cand.thr, cand.pol, "
        f"CAST(SUM(CASE WHEN {pbm} <> (vm.t = 1) AND vm.p1 <> vm.t "
        "THEN vm.c ELSE 0 END) AS BIGINT) AS mw, "
        f"CAST(SUM(CASE WHEN {pbm} <> (vm.t = 1) AND vm.p1 = vm.t "
        "THEN vm.c ELSE 0 END) AS BIGINT) AS mc "
        "FROM cand, vm GROUP BY 1, 2, 3), "
        "s2 AS (SELECT c2.*, EXP(a1.a) * CAST(c2.mw AS DOUBLE) "
        "+ EXP(-a1.a) * CAST(c2.mc AS DOUBLE) AS cost FROM c2, a1 "
        "ORDER BY cost, c2.feat, c2.thr, c2.pol LIMIT 1), "
        "nn2 AS (SELECT CAST(SUM(CASE WHEN p1 <> t THEN c ELSE 0 END) "
        "AS BIGINT) AS nw, CAST(SUM(CASE WHEN p1 = t THEN c ELSE 0 "
        "END) AS BIGINT) AS nc FROM vm), "
        "a2 AS (SELECT 0.5 * LN((1.0 - e) / e) AS a FROM (SELECT "
        "(EXP(a1.a) * CAST(s2.mw AS DOUBLE) + EXP(-a1.a) "
        "* CAST(s2.mc AS DOUBLE)) / (EXP(a1.a) "
        "* CAST(nn2.nw AS DOUBLE) + EXP(-a1.a) "
        "* CAST(nn2.nc AS DOUBLE)) AS e FROM s2, a1, nn2) q), "
        "fin AS (SELECT CAST(SUM(CASE WHEN ((a1.a "
        "* CAST(2 * q.p1 - 1 AS DOUBLE) + a2.a * q.s2v) > 0.0) "
        "= (q.t = 1) THEN q.c ELSE 0 END) AS BIGINT) AS correct "
        "FROM (SELECT vm.t, vm.c, vm.p1, "
        "CASE WHEN ((CASE WHEN s2.feat = 0 THEN vm.h ELSE vm.y END) "
        "<= s2.thr) = (s2.pol = 0) THEN 1.0 ELSE -1.0 END AS s2v "
        "FROM vm, s2) q, a1, a2) "
        "SELECT a1.feat AS feat1, a1.thr AS thr1, "
        "CAST(a1.pol AS BIGINT) AS pol1, ROUND(a1.a, 6) AS alpha1, "
        "s2.feat AS feat2, s2.thr AS thr2, CAST(s2.pol AS BIGINT) "
        "AS pol2, ROUND(a2.a, 6) AS alpha2, "
        "ROUND(CAST(fin.correct AS DOUBLE) / CAST(nt.n AS DOUBLE), 6) "
        "AS accuracy FROM a1, s2, a2, fin, nt"
    )


def _cart_oracle_sql() -> str:
    """Mirror of _q_cart_depth2: three deterministic best-split picks
    (float Gini cost with (feat, thr) tie-break) and four leaves."""
    fsel = "(CASE WHEN cand.feat = 0 THEN v.h ELSE v.y END)"
    gini = (
        "2.0 * CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE) "
        "/ CAST(nl AS DOUBLE) + 2.0 * CAST(pr AS DOUBLE) "
        "* CAST(nr - pr AS DOUBLE) / CAST(nr AS DOUBLE)"
    )

    def cost_cte(name: str, where: str) -> str:
        return (
            f"{name} AS (SELECT cand.feat, cand.thr, "
            f"CAST(SUM(CASE WHEN {fsel} <= cand.thr THEN v.c ELSE 0 "
            "END) AS BIGINT) AS nl, "
            f"CAST(SUM(CASE WHEN {fsel} <= cand.thr AND v.t = 1 "
            "THEN v.c ELSE 0 END) AS BIGINT) AS pl, "
            f"CAST(SUM(CASE WHEN {fsel} > cand.thr THEN v.c ELSE 0 "
            "END) AS BIGINT) AS nr, "
            f"CAST(SUM(CASE WHEN {fsel} > cand.thr AND v.t = 1 "
            "THEN v.c ELSE 0 END) AS BIGINT) AS pr "
            f"FROM cand, v{where} GROUP BY 1, 2)"
        )

    def pick(name: str, src: str) -> str:
        return (
            f"{name} AS (SELECT feat, thr, nl, nr, pl, pr FROM {src} "
            f"WHERE nl > 0 AND nr > 0 ORDER BY {gini}, feat, thr "
            "LIMIT 1)"
        )

    lcond = (
        " , n1 WHERE (CASE WHEN n1.feat = 0 THEN v.h ELSE v.y END) "
        "<= n1.thr"
    )
    rcond = (
        " , n1 WHERE (CASE WHEN n1.feat = 0 THEN v.h ELSE v.y END) "
        "> n1.thr"
    )
    return (
        "WITH v AS MATERIALIZED (SELECT "
        "epoch_us(ts) // 3600000000 % 24 AS h, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2, 3), "
        "nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM v), "
        "rw AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn FROM "
        "(SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events)), "
        "qt AS (SELECT DISTINCT rw.y AS thr FROM rw CROSS JOIN nt "
        "JOIN range(1, 16) i ON rw.rn = (i.range * (nt.n - 1)) // 16 "
        "+ 1), "
        "cand AS (SELECT 0 AS feat, i.range AS thr FROM range(0, 23) i "
        "UNION ALL SELECT 1, thr FROM qt), "
        + cost_cte("c1", "")
        + ", "
        + pick("n1", "c1")
        + ", "
        + cost_cte("c2", lcond)
        + ", "
        + pick("n2", "c2")
        + ", "
        + cost_cte("c3", rcond)
        + ", "
        + pick("n3", "c3")
        + ", "
        "lf AS (SELECT CASE WHEN inl THEN (CASE WHEN sub THEN 4 "
        "ELSE 5 END) ELSE (CASE WHEN sub2 THEN 6 ELSE 7 END) END "
        "AS node, CAST(SUM(c) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN t = 1 THEN c ELSE 0 END) AS BIGINT) "
        "AS n_pos FROM (SELECT v.c, v.t, "
        "(CASE WHEN n1.feat = 0 THEN v.h ELSE v.y END) <= n1.thr "
        "AS inl, "
        "(CASE WHEN n2.feat = 0 THEN v.h ELSE v.y END) <= n2.thr "
        "AS sub, "
        "(CASE WHEN n3.feat = 0 THEN v.h ELSE v.y END) <= n3.thr "
        "AS sub2 FROM v, n1, n2, n3) GROUP BY 1), "
        "acc AS (SELECT ROUND(CAST(SUM(GREATEST(n_pos, n - n_pos)) "
        "AS DOUBLE) / CAST((SELECT n FROM nt) AS DOUBLE), 6) AS a "
        "FROM lf) "
        "SELECT 1 AS node, n1.feat, n1.thr AS thr_or_pred, "
        "n1.nl + n1.nr AS n, n1.pl + n1.pr AS n_pos, acc.a AS accuracy "
        "FROM n1, acc "
        "UNION ALL SELECT 2, n2.feat, n2.thr, n2.nl + n2.nr, "
        "n2.pl + n2.pr, acc.a FROM n2, acc "
        "UNION ALL SELECT 3, n3.feat, n3.thr, n3.nl + n3.nr, "
        "n3.pl + n3.pr, acc.a FROM n3, acc "
        "UNION ALL SELECT lf.node, -1, "
        "CASE WHEN 2 * lf.n_pos > lf.n THEN 1 ELSE 0 END, lf.n, "
        "lf.n_pos, acc.a FROM lf, acc ORDER BY 1"
    )


def _logit_oracle_sql() -> str:
    """Mirror of _q_logistic_gd: 15 unrolled GD iterations with
    quantized residuals and pre-quantized standardized features."""
    lr = _LOGIT_LR

    def z_expr(b: str) -> str:
        return (
            f"({b}.b0 + {b}.b1 * (CAST(vx.x1q AS DOUBLE) / 1e6) "
            f"+ {b}.b2 * (CAST(vx.x2q AS DOUBLE) / 1e6))"
        )

    steps = []
    for k in range(1, _LOGIT_ITERS + 1):
        prev = f"b{k - 1}"
        z = z_expr("b")
        steps.append(
            f"g{k} AS (SELECT "
            "CAST(SUM(CAST(c AS HUGEINT) * rq) AS HUGEINT) AS g0, "
            "CAST(SUM(CAST(c AS HUGEINT) * rq * x1q) AS HUGEINT) "
            "AS g1, "
            "CAST(SUM(CAST(c AS HUGEINT) * rq * x2q) AS HUGEINT) "
            "AS g2 FROM (SELECT vx.c, vx.x1q, vx.x2q, "
            f"CAST(ROUND(1e9 * (1.0 / (1.0 + EXP(-{z})) "
            "- CAST(vx.t AS DOUBLE)), 0) AS BIGINT) AS rq "
            f"FROM vx, {prev} b) q), "
            f"b{k} AS MATERIALIZED (SELECT "
            f"b.b0 - {lr} * (CAST(g.g0 AS DOUBLE) / 1e9) / ms.nf "
            "AS b0, "
            f"b.b1 - {lr} * (CAST(g.g1 AS DOUBLE) / 1e9 / 1e6) "
            "/ ms.nf AS b1, "
            f"b.b2 - {lr} * (CAST(g.g2 AS DOUBLE) / 1e9 / 1e6) "
            f"/ ms.nf AS b2 FROM {prev} b, g{k} g, ms)"
        )
    last = f"b{_LOGIT_ITERS}"
    zf = z_expr("b")
    return (
        "WITH v AS MATERIALIZED (SELECT "
        "epoch_us(ts) // 3600000000 % 24 AS h, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2, 3), "
        "st AS (SELECT CAST(SUM(c) AS HUGEINT) AS n, "
        "CAST(SUM(h * c) AS HUGEINT) AS sh, "
        "CAST(SUM(h * h * c) AS HUGEINT) AS shh, "
        "CAST(SUM(y * c) AS HUGEINT) AS sy, "
        "CAST(SUM(CAST(y AS HUGEINT) * y * c) AS HUGEINT) AS syy "
        "FROM v), "
        "ms AS (SELECT CAST(sh AS DOUBLE) / CAST(n AS DOUBLE) AS mh, "
        "SQRT(CAST(n * shh - sh * sh AS DOUBLE) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sdh, "
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my, "
        "SQRT(CAST(n * syy - sy * sy AS DOUBLE) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sdy, "
        "CAST(n AS DOUBLE) AS nf, CAST(n AS BIGINT) AS nn FROM st), "
        "vx AS MATERIALIZED (SELECT v.t, v.c, "
        "CAST(ROUND(1e6 * (CAST(v.h AS DOUBLE) - ms.mh) / ms.sdh, 0) "
        "AS BIGINT) AS x1q, "
        "CAST(ROUND(1e6 * (CAST(v.y AS DOUBLE) - ms.my) / ms.sdy, 0) "
        "AS BIGINT) AS x2q FROM v, ms), "
        "b0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2), "
        + ", ".join(steps)
        + f", acc AS (SELECT CAST(SUM(CASE WHEN ({zf} > 0.0) "
        "= (vx.t = 1) THEN vx.c ELSE 0 END) AS BIGINT) AS correct "
        f"FROM vx, {last} b) "
        "SELECT ms.nn AS n_obs, ROUND(b.b0, 6) AS b0, "
        "ROUND(b.b1, 6) AS b1, ROUND(b.b2, 6) AS b2, "
        "ROUND(CAST(acc.correct AS DOUBLE) / ms.nf, 6) AS accuracy "
        f"FROM {last} b, acc, ms"
    )


def _gmm_oracle_sql() -> str:
    """Mirror of _q_gmm_em_1d: 10 unrolled EM iterations, every float
    expression pinned to the engine's numpy chain."""

    def l_expr(p: str, mu: str, vv: str) -> str:
        d = f"(CAST(v.y AS DOUBLE) - {p}.{mu})"
        return (
            f"(-({d} * {d}) / (2.0 * {p}.{vv}) - 0.5 * LN({p}.{vv}))"
        )

    steps = []
    for k in range(1, _GMM_ITERS + 1):
        p = f"p{k - 1}"
        l1 = l_expr("p", "mu1", "v1")
        l2 = l_expr("p", "mu2", "v2")
        z = f"(LN(1.0 - p.w1) - LN(p.w1) + {l2} - {l1})"
        steps.append(
            f"r{k} AS MATERIALIZED (SELECT v.y, v.c, "
            f"CAST(ROUND(1e9 * (1.0 / (1.0 + EXP({z}))), 0) AS BIGINT) "
            f"AS rq FROM v, {p} p), "
            f"m{k} AS (SELECT "
            "CAST(SUM(CAST(c AS HUGEINT) * rq) AS HUGEINT) AS r1s, "
            f"CAST(SUM(CAST(c AS HUGEINT) * ({_GMM_RQ} - rq)) "
            "AS HUGEINT) AS r2s, "
            "CAST(SUM(CAST(c AS HUGEINT) * rq * y) AS HUGEINT) AS s1, "
            f"CAST(SUM(CAST(c AS HUGEINT) * ({_GMM_RQ} - rq) * y) "
            "AS HUGEINT) AS s2, "
            "CAST(SUM(CAST(c AS HUGEINT) * rq * y * y) AS HUGEINT) "
            "AS q1, "
            f"CAST(SUM(CAST(c AS HUGEINT) * ({_GMM_RQ} - rq) * y * y) "
            f"AS HUGEINT) AS q2 FROM r{k}), "
            f"p{k} AS MATERIALIZED (SELECT mu1, mu2, "
            "CAST(q1 AS DOUBLE) / CAST(r1s AS DOUBLE) - mu1 * mu1 "
            "AS v1, CAST(q2 AS DOUBLE) / CAST(r2s AS DOUBLE) "
            "- mu2 * mu2 AS v2, "
            "CAST(r1s AS DOUBLE) / CAST(r1s + r2s AS DOUBLE) AS w1 "
            "FROM (SELECT *, CAST(s1 AS DOUBLE) / CAST(r1s AS DOUBLE) "
            "AS mu1, CAST(s2 AS DOUBLE) / CAST(r2s AS DOUBLE) AS mu2 "
            f"FROM m{k}) x)"
        )
    last = f"p{_GMM_ITERS}"
    lf1 = l_expr("p", "mu1", "v1")
    lf2 = l_expr("p", "mu2", "v2")
    return (
        "WITH v AS MATERIALIZED (SELECT y, CAST(COUNT(*) AS BIGINT) "
        "AS c FROM (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events) GROUP BY 1), "
        "st AS (SELECT CAST(SUM(c) AS HUGEINT) AS n, "
        "CAST(SUM(c * y) AS HUGEINT) AS sy, "
        "CAST(SUM(CAST(c AS HUGEINT) * y * y) AS HUGEINT) AS syy "
        "FROM v), "
        "rw AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn FROM "
        "(SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events)), "
        "p0 AS MATERIALIZED (SELECT "
        "CAST((SELECT y FROM rw, st WHERE rn = (st.n - 1) // 4 + 1) "
        "AS DOUBLE) AS mu1, "
        "CAST((SELECT y FROM rw, st WHERE rn = (3 * (st.n - 1)) // 4 "
        "+ 1) AS DOUBLE) AS mu2, "
        "CAST(st.n * st.syy - st.sy * st.sy AS DOUBLE) "
        "/ CAST(st.n * st.n AS DOUBLE) AS v1, "
        "CAST(st.n * st.syy - st.sy * st.sy AS DOUBLE) "
        "/ CAST(st.n * st.n AS DOUBLE) AS v2, 0.5 AS w1 FROM st), "
        + ", ".join(steps)
        + f", fl AS (SELECT v.c, CAST(ROUND(1e6 * LN(p.w1 "
        f"* EXP({lf1}) + (1.0 - p.w1) * EXP({lf2})), 0) AS BIGINT) "
        f"AS tq FROM v, {last} p), "
        "llq AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * tq) AS BIGINT) "
        "AS x FROM fl) "
        f"SELECT ROUND(p.mu1 / 100.0, 6) AS mu1, "
        "ROUND(p.mu2 / 100.0, 6) AS mu2, "
        "ROUND(SQRT(p.v1) / 100.0, 6) AS sigma1, "
        "ROUND(SQRT(p.v2) / 100.0, 6) AS sigma2, "
        "ROUND(p.w1, 6) AS w1, llq.x AS loglik_q "
        f"FROM {last} p, llq"
    )


def _bipartite_matching_oracle_sql() -> str:
    """Mirror of _q_bipartite_matching: 8 unrolled subset-DP levels."""
    steps = []
    for i in range(1, 9):
        prev = f"dp{i - 1}"
        steps.append(
            f"dp{i} AS MATERIALIZED (SELECT mask, MAX(val) AS val FROM ("
            f"SELECT mask, val FROM {prev} "
            f"UNION ALL SELECT p.mask | (1 << ed.j) AS mask, "
            f"p.val + 1 AS val FROM {prev} p "
            f"JOIN ed ON ed.i = {i - 1} "
            "AND ((p.mask >> ed.j) & 1) = 0) GROUP BY mask)"
        )
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS sv FROM events GROUP BY 1), "
        "lt AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 8), "
        "rt AS (SELECT cell FROM cc ORDER BY sv DESC, cell LIMIT 8), "
        "li AS (SELECT ROW_NUMBER() OVER (ORDER BY cell) - 1 AS i, "
        "cell % 96 AS x, cell // 96 AS y FROM lt), "
        "ri AS (SELECT ROW_NUMBER() OVER (ORDER BY cell) - 1 AS j, "
        "cell % 96 AS x, cell // 96 AS y FROM rt), "
        "ed AS MATERIALIZED (SELECT li.i, ri.j FROM li, ri "
        "WHERE ABS(li.x - ri.x) + ABS(li.y - ri.y) <= 40), "
        "dp0 AS (SELECT 0 AS mask, CAST(0 AS BIGINT) AS val), "
        + ", ".join(steps)
        + " SELECT CAST(8 AS BIGINT) AS n_left, CAST(8 AS BIGINT) "
        "AS n_right, (SELECT CAST(COUNT(*) AS BIGINT) FROM ed) "
        "AS n_edges, (SELECT MAX(val) FROM dp8) AS max_matching, "
        "(SELECT MAX(val) FROM dp8) AS min_vertex_cover"
    )


def _schulze_oracle_sql() -> str:
    """Mirror of _q_schulze_method: dense-context pairwise matrix and
    5 unrolled Floyd max-min relaxations."""
    idx_vals = ", ".join(
        f"('{t}', {i})" for i, t in enumerate(_MARKOV_STATES)
    )
    steps = []
    for k in range(5):
        prev = f"p{k}"
        steps.append(
            f"p{k + 1} AS MATERIALIZED (SELECT a.i, a.j, "
            "GREATEST(a.p, COALESCE(LEAST(ik.p, kj.p), 0)) AS p "
            f"FROM {prev} a "
            f"LEFT JOIN {prev} ik ON ik.i = a.i AND ik.j = {k} "
            f"LEFT JOIN {prev} kj ON kj.i = {k} AND kj.j = a.j)"
        )
    return (
        "WITH ctx AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS c FROM events "
        "GROUP BY 1, 2, 3), "
        "ctxs AS (SELECT DISTINCT user_id, d FROM ctx), "
        f"idx(t, i) AS (VALUES {idx_vals}), "
        "dense AS MATERIALIZED (SELECT ctxs.user_id, ctxs.d, idx.i, "
        "COALESCE(ctx.c, 0) AS c FROM ctxs CROSS JOIN idx "
        "LEFT JOIN ctx ON ctx.user_id = ctxs.user_id "
        "AND ctx.d = ctxs.d AND ctx.event_type = idx.t), "
        "dmat AS MATERIALIZED (SELECT a.i AS i, b.i AS j, "
        "CAST(COUNT(*) FILTER (WHERE a.c > b.c) AS BIGINT) AS d "
        "FROM dense a JOIN dense b ON b.user_id = a.user_id "
        "AND b.d = a.d AND b.i <> a.i GROUP BY 1, 2), "
        "p0 AS MATERIALIZED (SELECT a.i, a.j, "
        "CASE WHEN a.d > b.d THEN a.d ELSE 0 END AS p FROM dmat a "
        "JOIN dmat b ON b.i = a.j AND b.j = a.i), "
        + ", ".join(steps)
        + " SELECT idx.t AS event_type, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM dmat a "
        "JOIN dmat b ON b.i = a.j AND b.j = a.i "
        "WHERE a.i = idx.i AND a.d > b.d) AS pairwise_wins, "
        "CAST(CASE WHEN NOT EXISTS (SELECT 1 FROM p5 x JOIN p5 y "
        "ON y.i = x.j AND y.j = x.i WHERE x.j = idx.i "
        "AND x.p > y.p) THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_schulze_winner FROM idx ORDER BY 1"
    )


def _bperc_oracle_sql() -> str:
    """Mirror of _q_bootstrap_percolation: 10 unrolled threshold-2
    cascade rounds."""
    steps = []
    for k in range(1, _BPERC_ROUNDS + 1):
        prev = f"a{k - 1}"
        steps.append(
            f"a{k} AS MATERIALIZED (SELECT r, rnd FROM {prev} "
            f"UNION ALL SELECT cand.r, {k} AS rnd FROM "
            f"(SELECT adj.b AS r, CAST(COUNT(*) AS BIGINT) AS c "
            f"FROM adj JOIN {prev} x ON x.r = adj.a GROUP BY 1) cand "
            f"WHERE cand.c >= 2 AND cand.r NOT IN "
            f"(SELECT r FROM {prev}))"
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
        "a0 AS (SELECT r, CAST(0 AS BIGINT) AS rnd FROM nd0 "
        "WHERE r < 2), "
        + ", ".join(steps)
        + f" SELECT nd0.w AS word, "
        f"CAST(COALESCE(a{_BPERC_ROUNDS}.rnd, -1) AS BIGINT) AS round "
        f"FROM nd0 LEFT JOIN a{_BPERC_ROUNDS} "
        f"ON a{_BPERC_ROUNDS}.r = nd0.r"
    )


def _frechet_oracle_sql() -> str:
    """Mirror of _q_frechet_profiles: the DTW diagonal unroll with the
    max-of-mins recurrence."""
    steps = []
    for d in range(1, 47):
        dg = (
            f"LEFT JOIN g{d - 2} dg ON dg.i = c.i - 1 AND dg.j = c.j - 1 "
            if d >= 2
            else ""
        )
        case = (
            "CASE WHEN c.i = 0 THEN GREATEST(c.cost, l.v) "
            "WHEN c.j = 0 THEN GREATEST(c.cost, u.v) "
            "ELSE GREATEST(c.cost, LEAST(u.v, l.v, dg.v)) END"
            if d >= 2
            else "CASE WHEN c.i = 0 THEN GREATEST(c.cost, l.v) "
            "ELSE GREATEST(c.cost, u.v) END"
        )
        steps.append(
            f"g{d} AS MATERIALIZED (SELECT c.i, c.j, {case} AS v "
            "FROM cost c "
            f"LEFT JOIN g{d - 1} u ON u.i = c.i - 1 AND u.j = c.j "
            f"LEFT JOIN g{d - 1} l ON l.i = c.i AND l.j = c.j - 1 "
            f"{dg}WHERE c.i + c.j = {d})"
        )
    return (
        "WITH e2 AS (SELECT epoch_us(ts) // 3600000000 % 24 AS h, "
        "event_type FROM events "
        "WHERE event_type IN ('click', 'view')), "
        "hh AS (SELECT r.range AS h FROM range(0, 24) r), "
        "pa AS MATERIALIZED (SELECT hh.h, COALESCE(x.c, 0) AS c FROM hh "
        "LEFT JOIN (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM e2 "
        "WHERE event_type = 'click' GROUP BY h) x ON x.h = hh.h), "
        "pb AS MATERIALIZED (SELECT hh.h, COALESCE(x.c, 0) AS c FROM hh "
        "LEFT JOIN (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM e2 "
        "WHERE event_type = 'view' GROUP BY h) x ON x.h = hh.h), "
        "cost AS MATERIALIZED (SELECT ai.h AS i, bj.h AS j, "
        "ABS(ai.c - bj.c) AS cost FROM pa ai, pb bj), "
        "g0 AS MATERIALIZED (SELECT 0 AS i, 0 AS j, cost AS v "
        "FROM cost WHERE i = 0 AND j = 0), "
        + ", ".join(steps)
        + " SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM pa) AS n_a, "
        "(SELECT CAST(SUM(c) AS BIGINT) FROM pb) AS n_b, "
        "CAST(g46.v AS BIGINT) AS frechet FROM g46 "
        "WHERE g46.i = 23 AND g46.j = 23"
    )


def _spanning_tree_oracle_sql() -> str:
    """Mirror of _q_spanning_tree_count: 18 unrolled fraction-free
    Bareiss elimination steps on the 19x19 Laplacian minor (the 20-
    word source vocabulary is fixed across scale factors)."""
    steps = []
    for k in range(1, 19):
        prev = f"m{k - 1}"
        prevpiv = (
            "1"
            if k == 1
            else f"(SELECT v FROM m{k - 2} WHERE i = {k - 1} "
            f"AND j = {k - 1})"
        )
        steps.append(
            f"m{k} AS MATERIALIZED (SELECT a.i, a.j, "
            f"(pv.v * a.v - ri.v * cj.v) // {prevpiv} AS v "
            f"FROM {prev} a "
            f"JOIN {prev} pv ON pv.i = {k} AND pv.j = {k} "
            f"JOIN {prev} ri ON ri.i = a.i AND ri.j = {k} "
            f"JOIN {prev} cj ON cj.i = {k} AND cj.j = a.j "
            f"WHERE a.i > {k} AND a.j > {k})"
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
        "dg AS (SELECT a AS r, CAST(COUNT(*) AS BIGINT) AS d FROM adj "
        "GROUP BY 1), "
        "m0 AS MATERIALIZED (SELECT a.r AS i, b.r AS j, "
        "CAST(CASE WHEN a.r = b.r THEN COALESCE("
        "(SELECT d FROM dg WHERE dg.r = a.r), 0) "
        "WHEN EXISTS (SELECT 1 FROM adj WHERE adj.a = a.r "
        "AND adj.b = b.r) THEN -1 ELSE 0 END AS HUGEINT) AS v "
        "FROM nd0 a, nd0 b WHERE a.r >= 1 AND b.r >= 1), "
        + ", ".join(steps)
        + ", det AS (SELECT v FROM m18 WHERE i = 19 AND j = 19) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nd0) AS n_nodes, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges, "
        "CAST(det.v AS VARCHAR) AS n_trees, "
        "ROUND(LOG10(CAST(det.v AS DOUBLE)), 6) AS log10_trees "
        "FROM det"
    )


def _bareiss_chain_sql(prefix: str, size: int) -> str:
    """Unrolled fraction-free Bareiss elimination CTEs
    ``{prefix}1 .. {prefix}{size-1}`` over the 1-indexed ``{prefix}0``
    matrix of HUGEINT cells (i, j, v); the determinant is the single
    surviving cell ``({size},{size})`` of the last CTE.  Shared by the
    spanning-tree and effective-resistance oracles."""
    steps = []
    for k in range(1, size):
        prev = f"{prefix}{k - 1}"
        prevpiv = (
            "1"
            if k == 1
            else f"(SELECT v FROM {prefix}{k - 2} WHERE i = {k - 1} "
            f"AND j = {k - 1})"
        )
        steps.append(
            f"{prefix}{k} AS MATERIALIZED (SELECT a.i, a.j, "
            f"(pv.v * a.v - ri.v * cj.v) // {prevpiv} AS v "
            f"FROM {prev} a "
            f"JOIN {prev} pv ON pv.i = {k} AND pv.j = {k} "
            f"JOIN {prev} ri ON ri.i = a.i AND ri.j = {k} "
            f"JOIN {prev} cj ON cj.i = {k} AND cj.j = a.j "
            f"WHERE a.i > {k} AND a.j > {k})"
        )
    return ", ".join(steps)


def _eff_resistance_oracle_sql() -> str:
    """Mirror of _q_effective_resistance: nodes reordered so the two
    highest-degree words land at q=0 (u) and q=1 (v) -- a symmetric
    permutation leaves every Laplacian-minor determinant unchanged --
    then two Bareiss chains: drop {v} (19x19, spanning trees) and drop
    {u, v} (18x18, separating 2-forests).  R_uv = forests / trees."""
    lap_cell = (
        "CAST(CASE WHEN a.q = b.q THEN COALESCE((SELECT CAST(COUNT(*) "
        "AS BIGINT) FROM adjq WHERE adjq.a = a.q), 0) "
        "WHEN EXISTS (SELECT 1 FROM adjq WHERE adjq.a = a.q "
        "AND adjq.b = b.q) THEN -1 ELSE 0 END AS HUGEINT) AS v"
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
        "dg AS (SELECT a AS r, CAST(COUNT(*) AS BIGINT) AS d FROM adj "
        "GROUP BY 1), "
        "ordn AS MATERIALIZED (SELECT nd0.w, nd0.r, "
        "ROW_NUMBER() OVER (ORDER BY COALESCE(dg.d, 0) DESC, nd0.w) - 1 "
        "AS q FROM nd0 LEFT JOIN dg ON dg.r = nd0.r), "
        "eq AS MATERIALIZED (SELECT o1.q AS a, o2.q AS b FROM e "
        "JOIN ordn o1 ON o1.r = e.r1 JOIN ordn o2 ON o2.r = e.r2), "
        "adjq AS MATERIALIZED (SELECT a, b FROM eq "
        "UNION ALL SELECT b, a FROM eq), "
        "t0 AS MATERIALIZED (SELECT "
        "CASE WHEN a.q = 0 THEN 1 ELSE a.q END AS i, "
        "CASE WHEN b.q = 0 THEN 1 ELSE b.q END AS j, "
        f"{lap_cell} FROM ordn a, ordn b "
        "WHERE a.q <> 1 AND b.q <> 1), "
        + _bareiss_chain_sql("t", 19)
        + ", f0 AS MATERIALIZED (SELECT a.q - 1 AS i, b.q - 1 AS j, "
        f"{lap_cell} FROM ordn a, ordn b "
        "WHERE a.q >= 2 AND b.q >= 2), "
        + _bareiss_chain_sql("f", 18)
        + " SELECT (SELECT w FROM ordn WHERE q = 0) AS u_word, "
        "(SELECT w FROM ordn WHERE q = 1) AS v_word, "
        "CAST(dt.v AS VARCHAR) AS n_trees, "
        "CAST(df.v AS VARCHAR) AS n_sep_forests, "
        "ROUND(CAST(df.v AS DOUBLE) / CAST(dt.v AS DOUBLE), 6) "
        "AS resistance "
        "FROM (SELECT v FROM t18 WHERE i = 19 AND j = 19) dt, "
        "(SELECT v FROM f17 WHERE i = 18 AND j = 18) df"
    )


def _huffman_oracle_sql() -> str:
    """Mirror of _q_huffman_code: 25 guarded merge steps unrolled."""
    steps = []
    for k in range(1, _HUFF_STEPS + 1):
        gp, lp = f"g{k - 1}", f"l{k - 1}"
        pick = f"(SELECT grp FROM p{k} WHERE rn <= 2)"
        guard = f"(SELECT ng FROM c{k}) >= 2"
        steps.append(
            f"p{k} AS MATERIALIZED (SELECT grp, w, ROW_NUMBER() OVER "
            f"(ORDER BY w, grp) AS rn FROM {gp}), "
            f"c{k} AS (SELECT CAST(COUNT(*) AS BIGINT) AS ng FROM {gp}), "
            f"g{k} AS MATERIALIZED (SELECT grp, w FROM p{k} "
            f"WHERE rn > 2 OR NOT {guard} "
            f"UNION ALL SELECT MIN(grp) AS grp, CAST(SUM(w) AS BIGINT) "
            f"AS w FROM p{k} WHERE rn <= 2 AND {guard} "
            "HAVING COUNT(*) = 2), "
            f"l{k} AS MATERIALIZED (SELECT l.sym, l.w, "
            f"CASE WHEN {guard} AND l.grp IN {pick} "
            f"THEN (SELECT MIN(grp) FROM p{k} WHERE rn <= 2) "
            "ELSE l.grp END AS grp, "
            f"l.len + CASE WHEN {guard} AND l.grp IN {pick} "
            f"THEN 1 ELSE 0 END AS len FROM {lp} l)"
        )
    last = f"l{_HUFF_STEPS}"
    return (
        "WITH ch AS (SELECT u.c AS ch FROM documents, "
        "UNNEST(string_split(text, '')) u(c) "
        "WHERE u.c BETWEEN 'a' AND 'z'), "
        "l0 AS MATERIALIZED (SELECT unicode(ch) - 97 AS sym, "
        "CAST(COUNT(*) AS BIGINT) AS w, unicode(ch) - 97 AS grp, "
        "CAST(0 AS BIGINT) AS len FROM ch GROUP BY 1), "
        "g0 AS MATERIALIZED (SELECT grp, w FROM l0), "
        + ", ".join(steps)
        + f" SELECT chr(97 + CAST(sym AS INT)) AS letter, w AS weight, "
        f"len AS code_len, (SELECT CAST(SUM(w * len) AS BIGINT) "
        f"FROM {last}) AS total_bits FROM {last} ORDER BY 1"
    )


def _lis_oracle_sql() -> str:
    """Mirror of _q_lis_daily: 30 unrolled reachability levels."""
    steps = []
    for k in range(2, _LIS_LEVELS + 1):
        steps.append(
            f"v{k} AS MATERIALIZED (SELECT DISTINCT b.t, b.y "
            f"FROM v{k - 1} a JOIN dn b ON b.t > a.t AND b.y > a.y)"
        )
    counts = " UNION ALL ".join(
        f"SELECT {k} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM v{k}"
        for k in range(1, _LIS_LEVELS + 1)
    )
    return (
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "v1 AS MATERIALIZED (SELECT t, y FROM dn), "
        + ", ".join(steps)
        + f", un AS ({counts}) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dn) AS n_days, "
        "(SELECT CAST(MAX(k) AS BIGINT) FROM un WHERE c > 0) "
        "AS lis_len, (SELECT c FROM un WHERE k = "
        "(SELECT MAX(k) FROM un WHERE c > 0)) AS n_endings"
    )


def _chain_ladder_oracle_sql() -> str:
    """Mirror of _q_chain_ladder: quantized development factors and 4
    unrolled truncating projection steps."""
    steps = []
    for k in range(1, 5):
        j = k - 1
        steps.append(
            f"u{k} AS (SELECT u.i, CASE WHEN 4 - u.i <= {j} "
            "THEN (u.v * fq.f) // 1000000000 ELSE u.v END AS v "
            f"FROM u{k - 1} u JOIN fq ON fq.j = {j})"
        )
    return (
        "WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, "
        "event_type FROM events), "
        "d0 AS (SELECT MIN(d) AS d0 FROM ev), "
        "ew AS (SELECT user_id, CAST((d - d0.d0) // 7 AS BIGINT) AS w, "
        "event_type FROM ev, d0), "
        "fw AS (SELECT user_id, MIN(w) AS cohort FROM ew GROUP BY 1), "
        "pc AS MATERIALIZED (SELECT fw.cohort AS i, ew.w - fw.cohort "
        "AS j, CAST(COUNT(*) AS BIGINT) AS c FROM ew "
        "JOIN fw ON fw.user_id = ew.user_id "
        "WHERE ew.event_type = 'purchase' GROUP BY 1, 2), "
        "frame AS (SELECT a.range AS i, b.range AS j "
        "FROM range(0, 5) a, range(0, 5) b), "
        "cum AS MATERIALIZED (SELECT f.i, f.j, CAST(COALESCE("
        "(SELECT SUM(pc.c) FROM pc WHERE pc.i = f.i AND pc.j <= f.j), "
        "0) AS HUGEINT) AS c FROM frame f), "
        "fq AS MATERIALIZED (SELECT jr.range AS j, CAST(ROUND(1e9 * "
        "CAST((SELECT SUM(c) FROM cum WHERE cum.j = jr.range + 1 "
        "AND cum.i + cum.j <= 4) AS DOUBLE) "
        "/ CAST((SELECT SUM(c) FROM cum WHERE cum.j = jr.range "
        "AND cum.i + jr.range + 1 <= 4) AS DOUBLE), 0) AS HUGEINT) "
        "AS f FROM range(0, 4) jr), "
        "u0 AS (SELECT ir.range AS i, (SELECT c FROM cum "
        "WHERE cum.i = ir.range AND cum.j = 4 - ir.range) AS v "
        "FROM range(0, 5) ir), "
        + ", ".join(steps)
        + " SELECT CAST(u0.i AS BIGINT) AS cohort, "
        "CAST(u0.v AS BIGINT) AS latest_known, "
        "CAST(u4.v AS BIGINT) AS ultimate, "
        "CAST((SELECT c FROM cum WHERE cum.i = u0.i AND cum.j = 4) "
        "AS BIGINT) AS actual_full FROM u0 "
        "JOIN u4 ON u4.i = u0.i ORDER BY 1"
    )


def _closed_itemsets_oracle_sql() -> str:
    """Mirror of _q_closed_itemsets: all 31 subsets as a VALUES list,
    bitmask containment supports, closedness by superset scan."""
    vals = ", ".join(
        "('"
        + "+".join(_MARKOV_STATES[i] for i in range(5) if (m >> i) & 1)
        + f"', {m}, {bin(m).count('1')})"
        for m in range(1, 32)
    )
    case = " ".join(
        f"WHEN '{t}' THEN {1 << i}"
        for i, t in enumerate(_MARKOV_STATES)
    )
    return (
        "WITH b AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, "
        f"BIT_OR(CASE event_type {case} END) AS mask "
        "FROM events GROUP BY 1, 2), "
        f"its(name, m, sz) AS (VALUES {vals}), "
        "sup AS MATERIALIZED (SELECT its.name, its.m, its.sz, "
        "CAST((SELECT COUNT(*) FROM b WHERE (b.mask & its.m) = its.m) "
        "AS BIGINT) AS support FROM its) "
        "SELECT s.name AS itemset, CAST(s.sz AS BIGINT) AS size, "
        "s.support, CAST(CASE WHEN NOT EXISTS (SELECT 1 FROM sup s2 "
        "WHERE s2.m <> s.m AND (s2.m & s.m) = s.m "
        "AND s2.support = s.support) THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_closed FROM sup s ORDER BY 1"
    )


def _markov_attribution_oracle_sql() -> str:
    """Mirror of _q_markov_attribution: 60 unrolled value-iteration
    steps over (scenario, state), 1e12-tick truncating divisions."""
    sc = _ATTR_SCALE
    steps = []
    for k in range(1, _ATTR_ITERS + 1):
        prev = f"v{k - 1}"
        steps.append(
            f"v{k} AS MATERIALIZED (SELECT s2.sc, s2.s, "
            "CASE WHEN s2.s = s2.rm THEN CAST(0 AS HUGEINT) "
            "ELSE COALESCE(x.q, 0) END AS vq "
            "FROM (SELECT scen.sc, scen.rm, st.s FROM scen, states st) s2 "
            "LEFT JOIN (SELECT scen.sc, tr.s, "
            f"SUM(tr.c * (CASE WHEN tr.t = '_conv' THEN {sc} "
            "WHEN tr.t = scen.rm THEN 0 "
            f"ELSE COALESCE(vp.vq, 0) END)) // MIN(rs.r) AS q "
            "FROM scen CROSS JOIN tr JOIN rs ON rs.s = tr.s "
            f"LEFT JOIN {prev} vp ON vp.sc = scen.sc AND vp.s = tr.t "
            "GROUP BY 1, 2) x ON x.sc = s2.sc AND x.s = s2.s)"
        )
    last = f"v{_ATTR_ITERS}"
    return (
        "WITH seq AS (SELECT user_id, event_type, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events), "
        "fp AS (SELECT user_id, MIN(rn) AS fp FROM seq "
        "WHERE event_type = 'purchase' GROUP BY 1), "
        "kept AS (SELECT seq.user_id, seq.event_type, seq.rn FROM seq "
        "LEFT JOIN fp ON fp.user_id = seq.user_id "
        "WHERE seq.rn <= COALESCE(fp.fp, 1000000000)), "
        "mx AS (SELECT user_id, MAX(rn) AS mr FROM kept GROUP BY 1), "
        "ed AS (SELECT '_start' AS s, CASE WHEN k.event_type = "
        "'purchase' THEN '_conv' ELSE k.event_type END AS t "
        "FROM kept k WHERE k.rn = 1 "
        "UNION ALL SELECT a.event_type, CASE WHEN b.event_type = "
        "'purchase' THEN '_conv' ELSE b.event_type END FROM kept a "
        "JOIN kept b ON b.user_id = a.user_id AND b.rn = a.rn + 1 "
        "UNION ALL SELECT k.event_type, '_null' FROM kept k "
        "JOIN mx ON mx.user_id = k.user_id AND mx.mr = k.rn "
        "WHERE k.event_type <> 'purchase'), "
        "tr AS MATERIALIZED (SELECT s, t, CAST(COUNT(*) AS HUGEINT) "
        "AS c FROM ed GROUP BY 1, 2), "
        "rs AS MATERIALIZED (SELECT s, CAST(SUM(c) AS HUGEINT) AS r "
        "FROM tr GROUP BY 1), "
        "states AS (SELECT UNNEST(['_start', 'click', 'error', "
        "'signup', 'view']) AS s), "
        "scen(sc, rm) AS (VALUES ('none', ''), ('click', 'click'), "
        "('error', 'error'), ('signup', 'signup'), ('view', 'view')), "
        "v0 AS MATERIALIZED (SELECT scen.sc, st.s, "
        "CAST(0 AS HUGEINT) AS vq FROM scen, states st), "
        + ", ".join(steps)
        + f", pf AS (SELECT vq AS v FROM {last} "
        "WHERE sc = 'none' AND s = '_start') "
        "SELECT scen.sc AS channel, "
        "ROUND(CAST(pf.v AS DOUBLE) / 1e12, 6) AS p_full, "
        f"ROUND(CAST(vr.vq AS DOUBLE) / 1e12, 6) AS p_removed, "
        "ROUND(1.0 - CAST(vr.vq AS DOUBLE) / CAST(pf.v AS DOUBLE), 6) "
        f"AS removal_effect FROM scen JOIN {last} vr "
        "ON vr.sc = scen.sc AND vr.s = '_start' CROSS JOIN pf "
        "WHERE scen.sc <> 'none'"
    )


def _knapsack_oracle_sql() -> str:
    """Mirror of _q_knapsack_cells: 20 unrolled 0/1 item levels over
    the 601-row capacity table."""
    steps = []
    for i in range(1, 21):
        prev = f"dp{i - 1}"
        steps.append(
            f"dp{i} AS MATERIALIZED (SELECT d.c, "
            "GREATEST(d.val, COALESCE(p.val + ii.v, d.val)) AS val "
            f"FROM {prev} d CROSS JOIN "
            f"(SELECT w, v FROM it WHERE i = {i}) ii "
            f"LEFT JOIN {prev} p ON p.c = d.c - ii.w)"
        )
    return (
        f"WITH {_TOPVAL_CELLS_SQL}, "
        "it AS MATERIALIZED (SELECT cell, v, "
        "ABS(2 * (cell % 96) - 95) + ABS(2 * (cell // 96) - 95) AS w, "
        "ROW_NUMBER() OVER (ORDER BY cell) AS i FROM top20), "
        f"cp AS (SELECT r.range AS c FROM range(0, {_KNAP_CAP + 1}) r), "
        "dp0 AS MATERIALIZED (SELECT c, CAST(0 AS BIGINT) AS val FROM cp), "
        + ", ".join(steps)
        + f" SELECT CAST({_KNAP_CAP} AS BIGINT) AS capacity, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM it) AS n_items, "
        f"CAST(val AS BIGINT) AS best_value FROM dp20 "
        f"WHERE c = {_KNAP_CAP}"
    )


def _convex_layers_oracle_sql() -> str:
    """Mirror of _q_convex_layers: 6 unrolled peels, each removing the
    exact-certificate extreme points of the remaining set."""
    d1 = "(r.x - q.x) * (p.y - q.y) - (r.y - q.y) * (p.x - q.x)"
    d2 = "(s.x - r.x) * (p.y - r.y) - (s.y - r.y) * (p.x - r.x)"
    d3 = "(q.x - s.x) * (p.y - s.y) - (q.y - s.y) * (p.x - s.x)"
    steps = []
    for lv in range(1, _LAYERS + 1):
        prev = f"rem{lv - 1}"
        steps.append(
            f"ex{lv} AS MATERIALIZED (SELECT p.cell FROM {prev} p "
            "WHERE NOT (EXISTS ("
            f"SELECT 1 FROM {prev} q, {prev} r "
            "WHERE q.cell < r.cell AND q.cell <> p.cell "
            "AND r.cell <> p.cell "
            "AND (r.x - q.x) * (p.y - q.y) "
            "- (r.y - q.y) * (p.x - q.x) = 0 "
            "AND (p.x - q.x) * (p.x - r.x) "
            "+ (p.y - q.y) * (p.y - r.y) <= 0) "
            "OR EXISTS ("
            f"SELECT 1 FROM {prev} q, {prev} r, {prev} s "
            "WHERE q.cell < r.cell AND r.cell < s.cell "
            "AND q.cell <> p.cell AND r.cell <> p.cell "
            "AND s.cell <> p.cell "
            "AND (r.x - q.x) * (s.y - q.y) "
            "- (r.y - q.y) * (s.x - q.x) <> 0 "
            f"AND (({d1} >= 0 AND {d2} >= 0 AND {d3} >= 0) "
            f"OR ({d1} <= 0 AND {d2} <= 0 AND {d3} <= 0))))), "
            f"rem{lv} AS MATERIALIZED (SELECT * FROM {prev} "
            f"WHERE cell NOT IN (SELECT cell FROM ex{lv}))"
        )
    lay = " UNION ALL ".join(
        f"SELECT cell, {lv} AS layer FROM ex{lv}"
        for lv in range(1, _LAYERS + 1)
    )
    return (
        f"WITH {_TOPVAL_CELLS_SQL}, "
        "rem0 AS MATERIALIZED (SELECT cell, cell % 96 AS x, "
        "cell // 96 AS y FROM top20), "
        + ", ".join(steps)
        + f", lay AS ({lay}) "
        "SELECT t.cell, CAST(COALESCE(lay.layer, 0) AS BIGINT) AS layer "
        "FROM top20 t LEFT JOIN lay ON lay.cell = t.cell"
    )


def _bridges_oracle_sql() -> str:
    """Mirror of _q_graph_bridges: per-edge 6-level reachability
    expansion in the graph minus that edge, unrolled."""
    steps = []
    for lvl in range(1, 7):
        prev = f"sn{lvl - 1}"
        steps.append(
            f"sn{lvl} AS MATERIALIZED (SELECT DISTINCT eid, v FROM ("
            f"SELECT eid, v FROM {prev} "
            f"UNION ALL SELECT s.eid, adj.b AS v FROM {prev} s "
            "JOIN adj ON adj.a = s.v JOIN el ON el.eid = s.eid "
            "WHERE NOT ((adj.a = el.r1 AND adj.b = el.r2) "
            "OR (adj.a = el.r2 AND adj.b = el.r1))))"
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
        "el AS MATERIALIZED (SELECT ROW_NUMBER() OVER "
        "(ORDER BY r1, r2) - 1 AS eid, r1, r2 FROM e), "
        "sn0 AS MATERIALIZED (SELECT eid, r1 AS v FROM el), "
        + ", ".join(steps)
        + " SELECT a.w AS w1, b.w AS w2, "
        "CAST(CASE WHEN s.v IS NULL THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_bridge FROM el JOIN nd0 a ON a.r = el.r1 "
        "JOIN nd0 b ON b.r = el.r2 "
        "LEFT JOIN sn6 s ON s.eid = el.eid AND s.v = el.r2"
    )


def _peel_oracle_sql() -> str:
    """Mirror of _q_densest_subgraph: 19 unrolled min-degree peel
    steps with density tracking."""
    steps = []
    msel = [
        "SELECT 0 AS step, (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) "
        "AS nn, (SELECT CAST(COUNT(*) AS BIGINT) FROM e "
        "JOIN s0 x ON x.r = e.r1 JOIN s0 y ON y.r = e.r2) AS ne"
    ]
    for k in range(1, _PEEL_STEPS + 1):
        prev = f"s{k - 1}"
        steps.append(
            f"dg{k} AS MATERIALIZED (SELECT s.r, "
            "CAST(COALESCE(cnt.c, 0) AS BIGINT) AS deg "
            f"FROM {prev} s LEFT JOIN (SELECT adj.a AS r, "
            f"CAST(COUNT(*) AS BIGINT) AS c FROM adj "
            f"JOIN {prev} x ON x.r = adj.a "
            f"JOIN {prev} y ON y.r = adj.b GROUP BY 1) cnt "
            "ON cnt.r = s.r), "
            f"rm{k} AS MATERIALIZED (SELECT r FROM dg{k} "
            "ORDER BY deg, r LIMIT 1), "
            f"s{k} AS MATERIALIZED (SELECT r FROM {prev} "
            f"WHERE r NOT IN (SELECT r FROM rm{k}))"
        )
        msel.append(
            f"SELECT {k} AS step, (SELECT CAST(COUNT(*) AS BIGINT) "
            f"FROM s{k}) AS nn, (SELECT CAST(COUNT(*) AS BIGINT) FROM e "
            f"JOIN s{k} x ON x.r = e.r1 JOIN s{k} y ON y.r = e.r2) AS ne"
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
        "s0 AS MATERIALIZED (SELECT r FROM nd0), "
        + ", ".join(steps)
        + ", m AS (" + " UNION ALL ".join(msel) + ") "
        "SELECT nn AS n_nodes, ne AS n_edges, "
        "ROUND(CAST(ne AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS density "
        "FROM m ORDER BY CAST(ne AS DOUBLE) / CAST(nn AS DOUBLE) DESC, "
        "step LIMIT 1"
    )


def _lpa_oracle_sql() -> str:
    """Mirror of _q_label_prop_communities: 10 unrolled synchronous
    label-propagation rounds (mode of neighbor labels, smallest on
    ties)."""
    steps = []
    for k in range(1, _LPA_ROUNDS + 1):
        prev = f"l{k - 1}"
        steps.append(
            f"nf{k} AS MATERIALIZED (SELECT adj.a AS r, {prev}.l AS l, "
            f"CAST(COUNT(*) AS BIGINT) AS c FROM adj "
            f"JOIN {prev} ON {prev}.r = adj.b GROUP BY 1, 2), "
            f"l{k} AS MATERIALIZED (SELECT nd0.r, COALESCE(b.l, p.l) "
            f"AS l FROM nd0 JOIN {prev} p ON p.r = nd0.r "
            "LEFT JOIN (SELECT r, l FROM (SELECT r, l, ROW_NUMBER() "
            f"OVER (PARTITION BY r ORDER BY c DESC, l) AS rn FROM nf{k}) "
            "WHERE rn = 1) b ON b.r = nd0.r)"
        )
    last = f"l{_LPA_ROUNDS}"
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
        "l0 AS (SELECT r, CAST(r AS BIGINT) AS l FROM nd0), "
        + ", ".join(steps)
        + f" SELECT nd0.w AS word, {last}.l AS community "
        f"FROM nd0 JOIN {last} ON {last}.r = nd0.r"
    )


def _ipf_oracle_sql() -> str:
    """Mirror of _q_ipf_balance: 10 unrolled RAS double steps (row
    scale then column scale, truncating HUGEINT divisions)."""
    sc = _IPF_SCALE
    idx_vals = ", ".join(
        f"('{t}', {i})" for i, t in enumerate(_MARKOV_STATES)
    )
    steps = []
    for k in range(1, _IPF_ITERS + 1):
        prev = f"x{k - 1}"
        steps.append(
            f"r{k} AS MATERIALIZED (SELECT x.i, x.j, "
            f"CASE WHEN rs.s = 0 THEN 0 "
            f"ELSE (x.x * rt.c * {sc}) // rs.s END AS x "
            f"FROM {prev} x JOIN (SELECT i, CAST(SUM(x) AS HUGEINT) "
            f"AS s FROM {prev} GROUP BY 1) rs ON rs.i = x.i "
            "JOIN rt ON rt.i = x.i), "
            f"x{k} AS MATERIALIZED (SELECT r.i, r.j, "
            f"CASE WHEN cs.s = 0 THEN 0 "
            f"ELSE (r.x * ct.c * {sc}) // cs.s END AS x "
            f"FROM r{k} r JOIN (SELECT j, CAST(SUM(x) AS HUGEINT) "
            f"AS s FROM r{k} GROUP BY 1) cs ON cs.j = r.j "
            "JOIN ct ON ct.j = r.j)"
        )
    last = f"x{_IPF_ITERS}"
    return (
        "WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "epoch_us(ts) // 3600000000 % 24 // 4 AS j, event_type "
        "FROM events), "
        f"idx(t, i) AS (VALUES {idx_vals}), "
        "d0 AS (SELECT MIN(d) AS d0 FROM ev), "
        "frame AS (SELECT idx.i, r.range AS j FROM idx, range(0, 6) r), "
        "sd AS (SELECT idx.i, ev.j, CAST(COUNT(*) AS HUGEINT) AS c "
        "FROM ev JOIN idx ON idx.t = ev.event_type CROSS JOIN d0 "
        "WHERE ev.d - d0.d0 < 7 GROUP BY 1, 2), "
        "rt AS (SELECT idx.i, CAST(COUNT(*) AS HUGEINT) AS c FROM ev "
        "JOIN idx ON idx.t = ev.event_type GROUP BY 1), "
        "ct AS (SELECT j, CAST(COUNT(*) AS HUGEINT) AS c FROM ev "
        "GROUP BY 1), "
        "x0 AS MATERIALIZED (SELECT f.i, f.j, "
        f"COALESCE(sd.c, 0) * {sc} AS x FROM frame f "
        "LEFT JOIN sd ON sd.i = f.i AND sd.j = f.j), "
        + ", ".join(steps)
        + f" SELECT idx.t AS event_type, CAST(x.j AS BIGINT) AS bucket, "
        f"CAST(x.x AS BIGINT) AS x_q, "
        "ROUND(CAST(x.x AS DOUBLE) / 1e6, 6) AS x "
        f"FROM {last} x JOIN idx ON idx.i = x.i"
    )


def _betweenness_oracle_sql() -> str:
    """Mirror of _q_betweenness_seeds: layered BFS (6 unrolled levels)
    with exact sigma path counts, then the quantized Brandes backward
    pass, all as generated materialized CTEs."""
    sc = _BETW_SCALE
    fwd = []
    for lvl in range(1, _BETW_LEVELS + 1):
        fwd.append(
            f"f{lvl} AS MATERIALIZED (SELECT p.seed, adj.b AS v, "
            "CAST(SUM(p.sigma) AS HUGEINT) AS sigma "
            f"FROM f{lvl - 1} p JOIN adj ON adj.a = p.v "
            f"LEFT JOIN vis{lvl - 1} vx ON vx.seed = p.seed "
            "AND vx.v = adj.b WHERE vx.v IS NULL GROUP BY 1, 2), "
            f"vis{lvl} AS MATERIALIZED (SELECT seed, v FROM vis{lvl - 1} "
            f"UNION ALL SELECT seed, v FROM f{lvl})"
        )
    bwd = [
        f"dl{_BETW_LEVELS} AS MATERIALIZED (SELECT seed, v, sigma, "
        f"CAST(0 AS HUGEINT) AS dq FROM f{_BETW_LEVELS})"
    ]
    for lvl in range(_BETW_LEVELS - 1, 0, -1):
        bwd.append(
            f"dl{lvl} AS MATERIALIZED (SELECT u.seed, u.v, u.sigma, "
            "COALESCE(s.x, CAST(0 AS HUGEINT)) AS dq "
            f"FROM f{lvl} u LEFT JOIN (SELECT u2.seed, u2.v, "
            f"CAST(SUM((u2.sigma * ({sc} + w.dq)) // w.sigma) "
            f"AS HUGEINT) AS x FROM f{lvl} u2 "
            "JOIN adj ON adj.a = u2.v "
            f"JOIN dl{lvl + 1} w ON w.seed = u2.seed AND w.v = adj.b "
            "GROUP BY 1, 2) s ON s.seed = u.seed AND s.v = u.v)"
        )
    allu = " UNION ALL ".join(
        f"SELECT seed, v, dq FROM dl{lvl}"
        for lvl in range(1, _BETW_LEVELS + 1)
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
        "seeds AS (SELECT r FROM nd0 WHERE r < 5), "
        "f0 AS MATERIALIZED (SELECT r AS seed, r AS v, "
        "CAST(1 AS HUGEINT) AS sigma FROM seeds), "
        "vis0 AS MATERIALIZED (SELECT seed, v FROM f0), "
        + ", ".join(fwd)
        + ", "
        + ", ".join(bwd)
        + f", alld AS ({allu}) "
        "SELECT nd0.w AS word, "
        "CAST(COALESCE(SUM(alld.dq), 0) AS BIGINT) AS bc_q, "
        "ROUND(CAST(COALESCE(SUM(alld.dq), 0) AS DOUBLE) / 1e9, 6) "
        "AS bc FROM nd0 LEFT JOIN alld ON alld.v = nd0.r GROUP BY 1"
    )


def _bradley_terry_oracle_sql() -> str:
    """Mirror of _q_bradley_terry: 20 integer MM steps unrolled as
    generated materialized CTEs over the 5-row skill table."""
    sc = _BT_SCALE
    idx_vals = ", ".join(
        f"('{t}', {i})" for i, t in enumerate(_MARKOV_STATES)
    )
    steps = []
    for i in range(1, _BT_ITERS + 1):
        prev = f"p{i - 1}"
        steps.append(
            f"t{i} AS MATERIALIZED (SELECT nm.i, "
            f"CAST(SUM((nm.n * {sc} * {sc}) // (pi.p + pj.p)) "
            "AS HUGEINT) AS denom "
            f"FROM nm JOIN {prev} pi ON pi.i = nm.i "
            f"JOIN {prev} pj ON pj.i = nm.j GROUP BY 1), "
            f"r{i} AS MATERIALIZED (SELECT w.i, "
            "CASE WHEN t.denom IS NULL OR t.denom = 0 THEN 0 "
            f"ELSE (w.wins * {sc} * {sc}) // t.denom END AS praw "
            f"FROM wins w LEFT JOIN t{i} t ON t.i = w.i), "
            f"p{i} AS MATERIALIZED (SELECT r.i, (r.praw * 5 * {sc}) "
            f"// (SELECT SUM(praw) FROM r{i}) AS p FROM r{i} r)"
        )
    last = f"p{_BT_ITERS}"
    return (
        "WITH ctx AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS c FROM events "
        "GROUP BY 1, 2, 3), "
        "wm AS MATERIALIZED (SELECT a.event_type AS si, "
        "b.event_type AS sj, CAST(COUNT(*) AS BIGINT) AS wij "
        "FROM ctx a JOIN ctx b ON b.user_id = a.user_id AND b.d = a.d "
        "AND a.event_type <> b.event_type AND a.c > b.c GROUP BY 1, 2), "
        f"idx(t, i) AS (VALUES {idx_vals}), "
        "wins AS MATERIALIZED (SELECT idx.i, "
        "CAST(COALESCE(SUM(wm.wij), 0) AS HUGEINT) AS wins FROM idx "
        "LEFT JOIN wm ON wm.si = idx.t GROUP BY 1), "
        "nm0 AS (SELECT si, sj, wij FROM wm "
        "UNION ALL SELECT sj, si, wij FROM wm), "
        "nm AS MATERIALIZED (SELECT i1.i AS i, i2.i AS j, "
        "CAST(SUM(wij) AS HUGEINT) AS n FROM nm0 "
        "JOIN idx i1 ON i1.t = nm0.si JOIN idx i2 ON i2.t = nm0.sj "
        "GROUP BY 1, 2), "
        f"p0 AS (SELECT i, CAST({sc} AS HUGEINT) AS p FROM idx), "
        + ", ".join(steps)
        + " SELECT idx.t AS event_type, CAST(w.wins AS BIGINT) AS wins, "
        f"CAST({last}.p AS BIGINT) AS pq, "
        f"ROUND(CAST({last}.p AS DOUBLE) / 1e6, 6) AS skill "
        f"FROM idx JOIN wins w ON w.i = idx.i "
        f"JOIN {last} ON {last}.i = idx.i"
    )


def _tsp_oracle_sql() -> str:
    """Mirror of _q_tsp_cells: Held-Karp bitmask DP unrolled by subset
    size as generated materialized CTEs over (mask, last, cost)."""
    steps = []
    for k in range(2, 9):
        prev = "l1" if k == 2 else f"l{k - 1}"
        steps.append(
            f"l{k} AS MATERIALIZED (SELECT "
            "p.mask | (1 << dd.j) AS mask, dd.j AS last, "
            "MIN(p.cost + dd.d) AS cost "
            f"FROM {prev} p JOIN dist dd ON dd.i = p.last "
            "AND ((p.mask >> dd.j) & 1) = 0 AND dd.j <> 0 "
            "GROUP BY 1, 2)"
        )
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top8 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 8), "
        "nd AS MATERIALIZED (SELECT cell, "
        "CAST(ROW_NUMBER() OVER (ORDER BY cell) - 1 AS BIGINT) AS j, "
        "cell % 96 AS x, cell // 96 AS y FROM top8), "
        "dist AS MATERIALIZED (SELECT a.j AS i, b.j AS j, "
        "CAST(ABS(a.x - b.x) + ABS(a.y - b.y) AS BIGINT) AS d "
        "FROM nd a, nd b), "
        "l1 AS (SELECT 1 AS mask, CAST(0 AS BIGINT) AS last, "
        "CAST(0 AS BIGINT) AS cost), "
        + ", ".join(steps)
        + " SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nd) AS n_cells, "
        "(SELECT MIN(l8.cost + db.d) FROM l8 JOIN dist db "
        "ON db.i = l8.last AND db.j = 0) AS tsp_cycle, "
        "(SELECT MIN(cost) FROM l8) AS tsp_path"
    )


def _fiedler_oracle_sql() -> str:
    """Mirror of _q_fiedler_value: 30 integer deflated power-iteration
    steps on M = cI - L, unrolled as generated materialized CTEs."""
    steps = []
    for i in range(1, _FIEDLER_ITERS + 1):
        prev = f"v{i - 1}"
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT adj.a AS r, "
            f"CAST(SUM(vp.v) AS HUGEINT) AS x FROM adj "
            f"JOIN {prev} vp ON vp.r = adj.b GROUP BY 1), "
            f"mv{i} AS MATERIALIZED (SELECT nd.r, "
            f"(cs.c - nd.deg) * vv.v + COALESCE(s{i}.x, 0) AS mv "
            f"FROM nd JOIN {prev} vv ON vv.r = nd.r "
            f"LEFT JOIN s{i} ON s{i}.r = nd.r CROSS JOIN cs), "
            f"t{i} AS MATERIALIZED (SELECT r, nn.n * mv - sm.s AS t "
            f"FROM mv{i} CROSS JOIN nn CROSS JOIN "
            f"(SELECT CAST(SUM(mv) AS HUGEINT) AS s FROM mv{i}) sm), "
            f"m{i} AS MATERIALIZED (SELECT MAX(ABS(t)) AS mx FROM t{i}), "
            f"v{i} AS MATERIALIZED (SELECT r, CASE WHEN t < 0 "
            f"THEN -((-t * 1000000) // mx) "
            f"ELSE (t * 1000000) // mx END AS v FROM t{i}, m{i})"
        )
    last = f"v{_FIEDLER_ITERS}"
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
        "nd AS MATERIALIZED (SELECT nd0.r, "
        "CAST(COALESCE(d.deg, 0) AS HUGEINT) AS deg FROM nd0 "
        "LEFT JOIN (SELECT a AS r, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM adj GROUP BY 1) d ON d.r = nd0.r), "
        "nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM nd), "
        "cs AS (SELECT 2 * MAX(deg) + 1 AS c FROM nd), "
        "sr AS (SELECT CAST(SUM(r) AS HUGEINT) AS s FROM nd), "
        "v0 AS MATERIALIZED (SELECT nd.r, "
        "nn.n * CAST(nd.r AS HUGEINT) - sr.s AS v FROM nd, nn, sr), "
        + ", ".join(steps)
        + f", sf AS (SELECT adj.a AS r, CAST(SUM(vp.v) AS HUGEINT) AS x "
        f"FROM adj JOIN {last} vp ON vp.r = adj.b GROUP BY 1), "
        "mvf AS (SELECT nd.r, (cs.c - nd.deg) * vv.v "
        f"+ COALESCE(sf.x, 0) AS mv FROM nd JOIN {last} vv "
        "ON vv.r = nd.r LEFT JOIN sf ON sf.r = nd.r CROSS JOIN cs), "
        "num AS (SELECT CAST(SUM(vv.v * mvf.mv) AS HUGEINT) AS x "
        f"FROM {last} vv JOIN mvf ON mvf.r = vv.r), "
        f"den AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS x FROM {last}) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nd) AS n_nodes, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges, "
        "ROUND(CAST(cs.c AS DOUBLE) "
        "- CAST(num.x AS DOUBLE) / CAST(den.x AS DOUBLE), 6) AS lambda2, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {last} WHERE v > 0) "
        "AS n_pos FROM cs, num, den"
    )


def _markov_stationary_oracle_sql() -> str:
    """Mirror of _q_markov_stationary: the 5 principal-minor 4x4
    determinants of the self-loop-free count Laplacian written out as
    HUGEINT permutation expansions (24 signed 4-products each)."""
    from itertools import permutations

    n_states = len(_MARKOV_STATES)
    pivot = ", ".join(
        f"COALESCE(MAX(CASE WHEN src = '{s}' AND dst = '{d}' "
        f"THEN n END), 0) AS c{j}{k}"
        for j, s in enumerate(_MARKOV_STATES)
        for k, d in enumerate(_MARKOV_STATES)
    )
    rows = ", ".join(
        f"CAST({' + '.join(f'c{j}{k}' for k in range(n_states))} "
        f"AS HUGEINT) AS r{j}"
        for j in range(n_states)
    )
    lap = ", ".join(
        (
            f"CAST({' + '.join(f'c{j}{k}' for k in range(n_states) if k != j)} "
            f"AS HUGEINT) AS m{j}{j}"
            if j == k
            else f"CAST(-c{j}{k} AS HUGEINT) AS m{j}{k}"
        )
        for j in range(n_states)
        for k in range(n_states)
    )

    def det(i: int) -> str:
        idx = [j for j in range(n_states) if j != i]
        terms = []
        for perm in permutations(range(4)):
            inv = sum(
                1
                for a in range(4)
                for b in range(a + 1, 4)
                if perm[a] > perm[b]
            )
            prod = " * ".join(f"m{idx[a]}{idx[perm[a]]}" for a in range(4))
            terms.append(("- " if inv % 2 else "+ ") + prod)
        return "(" + " ".join(terms).lstrip("+ ") + ")"

    dets = ", ".join(f"{det(i)} AS a{i}" for i in range(n_states))
    svals = ", ".join(f"r{i} * a{i} AS s{i}" for i in range(n_states))
    tot = " + ".join(f"s{i}" for i in range(n_states))
    finals = " UNION ALL ".join(
        f"SELECT '{s}' AS state, CAST(r{i} AS BIGINT) AS n_out, "
        f"ROUND(CAST(s{i} AS DOUBLE) / CAST({tot} AS DOUBLE), 6) AS pi "
        "FROM z"
        for i, s in enumerate(_MARKOV_STATES)
    )
    return (
        "WITH s AS (SELECT user_id, event_type AS src, "
        "LEAD(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS dst FROM events), "
        "c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM s "
        "WHERE dst IS NOT NULL GROUP BY 1, 2), "
        f"p AS (SELECT {pivot} FROM c), "
        f"q AS (SELECT *, {rows}, {lap} FROM p), "
        f"d AS (SELECT *, {dets} FROM q), "
        f"z AS (SELECT *, {svals} FROM d) "
        f"{finals}"
    )


def _bilinear_oracle_sql(grid: str) -> str:
    """Mirror of _q_bilinear_sample: the identical driver-side stencil
    (pix, weight per probe) joined against the full grid."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.affine import (
        bilinear_weights,
    )

    plon = np.array([p[0] for p in OG_KNN_PROBES])
    plat = np.array([p[1] for p in OG_KNN_PROBES])
    rows, cols, w = bilinear_weights(OG_TRANSFORM, plon, plat)
    pix = rows * OG_W + cols
    values = ", ".join(
        f"(CAST({q} AS BIGINT), CAST({int(pix[q, j])} AS BIGINT), {w[q, j]!r})"
        for q in range(len(plon))
        for j in range(4)
    )
    return (
        f"SELECT v.probe_id, ROUND(SUM(v.w * g.z), 6) AS bilinear_z "
        f"FROM (VALUES {values}) v(probe_id, vpix, w) "
        f"JOIN ({grid}) g ON g.pix = v.vpix GROUP BY v.probe_id"
    )


def _s2_cells_oracle_sql() -> str:
    """Mirror of _q_s2_cells via the frozen-geometry trick: the geocode
    lon/lat depend only on ``event_id % 9216`` (a 96x96 lattice), so the
    Hilbert-walk S2 assignment -- not SQL-expressible directly -- is
    precomputed driver-side for all 9216 lattice positions and shipped
    as a VALUES mapping.  Data-independent: the table encodes geometry,
    not the events sample."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.s2 import (
        s2_cell_of,
    )

    gp = np.arange(9216)
    lon = 77.0 + (gp % 96).astype(np.float64) * 0.01
    lat = 28.05 + ((gp // 96) % 96).astype(np.float64) * 0.01
    cells = s2_cell_of(lon, lat, 9)
    vals = ", ".join(
        f"({int(g)},{int(c)})" for g, c in zip(gp, cells)
    )
    return (
        f"WITH m(gp, s2_9) AS (VALUES {vals}) "
        "SELECT m.s2_9, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events e JOIN m ON (e.event_id % 9216) = m.gp GROUP BY 1"
    )


def _contour_segments_oracle_sql(grid: str, level: float = 25.0) -> str:
    """Mirror of _q_contour_segments: 2x2 windows via shifted
    self-joins (the contour_cases pattern) joined to the shared
    marching-squares segment table (case_id, seg, e1, e2), endpoint
    coordinates via the identical (level-a)/(b-a) interpolation."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        _MS_SEGMENTS,
    )

    seg_rows = ", ".join(
        f"({c_id}, {s}, {e1}, {e2})"
        for c_id, segs in sorted(_MS_SEGMENTS.items())
        for s, (e1, e2) in enumerate(segs)
    )
    L = repr(float(level))
    lx = (
        "CASE {e} WHEN 0 THEN ({L} - tl)/(tr - tl) WHEN 1 THEN 1.0 "
        "WHEN 2 THEN ({L} - bl)/(br - bl) ELSE 0.0 END"
    )
    ly = (
        "CASE {e} WHEN 0 THEN 0.0 WHEN 1 THEN ({L} - tr)/(br - tr) "
        "WHEN 2 THEN 1.0 ELSE ({L} - tl)/(bl - tl) END"
    )
    return (
        f"WITH g AS (SELECT row, col, z FROM ({grid})), "
        "w AS (SELECT a.row AS row, a.col AS col, "
        "a.z AS tl, b.z AS tr, c.z AS bl, d.z AS br "
        "FROM g a JOIN g b ON b.row = a.row AND b.col = a.col + 1 "
        "JOIN g c ON c.row = a.row + 1 AND c.col = a.col "
        "JOIN g d ON d.row = a.row + 1 AND d.col = a.col + 1 "
        "WHERE a.z > -1e30 AND b.z > -1e30 AND c.z > -1e30 "
        "AND d.z > -1e30), "
        "wc AS (SELECT *, "
        f"CAST(CAST(tl > {L} AS INTEGER) + 2 * CAST(tr > {L} AS INTEGER) "
        f"+ 4 * CAST(br > {L} AS INTEGER) + 8 * CAST(bl > {L} AS INTEGER) "
        "AS BIGINT) AS case_id FROM w), "
        f"m(case_id, seg, e1, e2) AS (VALUES {seg_rows}) "
        "SELECT wc.row, wc.col, m.seg, "
        f"ROUND(wc.col + {lx.format(e='m.e1', L=L)}, 6) AS x1, "
        f"ROUND(wc.row + {ly.format(e='m.e1', L=L)}, 6) AS y1, "
        f"ROUND(wc.col + {lx.format(e='m.e2', L=L)}, 6) AS x2, "
        f"ROUND(wc.row + {ly.format(e='m.e2', L=L)}, 6) AS y2 "
        "FROM wc JOIN m ON m.case_id = wc.case_id"
    )


def _km_rint_sql(x: str) -> str:
    """numpy np.round (banker's rounding: nearest, exact .5 ties to
    even) as a DuckDB expression -- DuckDB ROUND is ties-away, so the
    tie case is redone via FLOOR parity."""
    f = f"FLOOR({x})"
    return (
        f"(CASE WHEN ({x}) - {f} = 0.5 "
        f"THEN {f} + CAST(CAST({f} AS BIGINT) % 2 <> 0 AS INTEGER) "
        f"ELSE ROUND(({x}), 0) END)"
    )


def _kmeans_oracle_sql(K: int = 8, ITERS: int = 4, SEED: int = 42,
                       QUANT: int = 1_000_000) -> str:
    """Mirror of _q_kmeans_clusters (stages/ann.py::kmeans_fit):
    Lloyd's iterations UNROLLED as chained MATERIALIZED CTEs (DuckDB
    inlines plain CTEs, which re-evaluates the chain exponentially --
    220x slower without MATERIALIZED).  Init = bottom-k by mix32,
    assignment = argmax dot with first-index tiebreak, accumulators
    int64-quantized with numpy's banker's rounding (_km_rint_sql),
    empty clusters keep their previous centroid.  Verified equal to
    the engine at sf0.01 and sf0.1; float summation-order divergence
    (numpy pairwise vs SQL sequential) is the known residual risk."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql,
    )

    h = mix32_sql("vec_id", SEED)
    parts = [
        # per-(vec, dim) float64 values
        "WITH raw AS (SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS i, "
        "CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings), "
        # unit vectors
        "nrm AS MATERIALIZED (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM raw GROUP BY 1), "
        "u AS MATERIALIZED (SELECT raw.vec_id, raw.i, "
        "raw.v / (CASE WHEN nrm.n = 0 THEN 1.0 ELSE nrm.n END) AS v "
        "FROM raw JOIN nrm ON nrm.vec_id = raw.vec_id), "
        # init: bottom-K by (mix32, vec_id), cluster ids in vec_id order
        f"init AS MATERIALIZED (SELECT vec_id FROM (SELECT vec_id, {h} AS hh "
        f"FROM embeddings) ORDER BY hh, vec_id LIMIT {K}), "
        "c0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl, "
        "vec_id FROM init), "
        # initial centroids = the unit vectors of the init rows
        "cent0 AS MATERIALIZED (SELECT c0.cl, u.i, u.v AS cv FROM c0 "
        "JOIN u ON u.vec_id = c0.vec_id)",
    ]
    for t in range(1, ITERS + 1):
        p, c = t - 1, t
        parts.append(
            # assignment against cent{p}: argmax dot, ties -> lowest cl
            f", dot{c} AS MATERIALIZED (SELECT u.vec_id, cent{p}.cl, "
            f"SUM(u.v * cent{p}.cv) AS d "
            f"FROM u JOIN cent{p} ON cent{p}.i = u.i GROUP BY 1, 2), "
            f"a{c} AS MATERIALIZED (SELECT vec_id, cl FROM (SELECT vec_id, cl, "
            f"ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY d DESC, cl ASC) AS rn FROM dot{c}) WHERE rn = 1), "
            # quantized accumulation (banker's rint like np.round)
            f"s{c} AS MATERIALIZED (SELECT a{c}.cl, u.i, "
            f"SUM(CAST({_km_rint_sql(f'u.v * {QUANT}')} AS BIGINT)) AS tot, "
            f"CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM a{c} JOIN u ON u.vec_id = a{c}.vec_id GROUP BY 1, 2), "
            # raw new centroid tot/(quant*n), then unit-normalize;
            # empty clusters keep the previous centroid
            f"r{c} AS MATERIALIZED (SELECT cl, i, "
            f"CAST(tot AS DOUBLE) / ({QUANT}.0 * CAST(n AS DOUBLE)) AS rv "
            f"FROM s{c}), "
            f"rn{c} AS MATERIALIZED (SELECT cl, SQRT(SUM(rv * rv)) AS n FROM r{c} "
            f"GROUP BY 1), "
            f"cent{c} AS MATERIALIZED ("
            f"SELECT r{c}.cl, r{c}.i, r{c}.rv / "
            f"(CASE WHEN rn{c}.n = 0 THEN 1.0 ELSE rn{c}.n END) AS cv "
            f"FROM r{c} JOIN rn{c} ON rn{c}.cl = r{c}.cl "
            f"UNION ALL "
            f"SELECT cent{p}.cl, cent{p}.i, cent{p}.cv FROM cent{p} "
            f"WHERE cent{p}.cl NOT IN (SELECT cl FROM s{c}))"
        )
    T = ITERS
    parts.append(
        f", dotF AS (SELECT u.vec_id, cent{T}.cl, SUM(u.v * cent{T}.cv) AS d "
        f"FROM u JOIN cent{T} ON cent{T}.i = u.i GROUP BY 1, 2), "
        "aF AS (SELECT vec_id, cl FROM (SELECT vec_id, cl, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cl ASC) "
        "AS rn FROM dotF) WHERE rn = 1), "
        "cnt AS (SELECT cl, CAST(COUNT(*) AS BIGINT) AS n FROM aF "
        "GROUP BY cl) "
        f"SELECT r.range AS cluster_id, COALESCE(cnt.n, 0) AS n "
        f"FROM range(0, {K}) r LEFT JOIN cnt ON cnt.cl = r.range "
        "ORDER BY cluster_id"
    )
    return "".join(parts)




_SW_EN_SQL = "['the','of','and','to','in','a','is','that','for','it','as','with','on','be','are','this','was','at','by','an']"
_SW_DE_SQL = "['der','die','das','und','ist','von','zu','mit','den','nicht','ein','eine','auf','im','des','sich']"
_SW_FR_SQL = "['le','la','les','de','des','et','un','une','est','dans','que','pour','sur','avec','ne','pas','au','du']"

_TOKS_SQL = (
    "CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') END"
)


def _lang_id_oracle_sql() -> str:
    """Mirror of functions/text.py::detect_language: devanagari/letter
    ratio gate (RE2 \\p{L} == Python [^\\W\\d_] on this corpus,
    component-verified), then best stopword-hit count with the
    dict-order tiebreak (en > de > fr), <5%% hits -> 'zz'."""
    return (
        "WITH b AS (SELECT doc_id, text, "
        "LEN(regexp_extract_all(text, '[\u0900-\u097f]')) AS n_dev, "
        "LEN(regexp_extract_all(text, '[\\p{L}]')) AS n_alpha, "
        "CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[]) ELSE "
        "REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+') END AS toks "
        "FROM documents), "
        "s AS (SELECT doc_id, n_dev, n_alpha, ARRAY_LENGTH(toks) AS n_tok, "
        "LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(" + _SW_EN_SQL + ", x))) AS h_en, "
        "LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(" + _SW_DE_SQL + ", x))) AS h_de, "
        "LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(" + _SW_FR_SQL + ", x))) AS h_fr "
        "FROM b) "
        "SELECT doc_id, CASE "
        "WHEN text_empty THEN 'zz' "
        "WHEN n_alpha > 0 AND CAST(n_dev AS DOUBLE) / n_alpha > 0.3 THEN 'hi' "
        "WHEN n_tok IS NULL OR n_tok = 0 THEN 'zz' "
        "WHEN best_hits * 20 < n_tok THEN 'zz' "
        "ELSE best END AS lang_id "
        "FROM (SELECT s.doc_id, d.text = '' AS text_empty, s.n_dev, "
        "s.n_alpha, s.n_tok, GREATEST(h_en, h_de, h_fr) AS best_hits, "
        "CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en' "
        "WHEN h_de >= h_fr AND h_de > 0 THEN 'de' "
        "WHEN h_fr > 0 THEN 'fr' ELSE 'zz' END AS best "
        "FROM s JOIN documents d ON d.doc_id = s.doc_id)"
    )


def _text_cleaning_oracle_sql() -> str:
    """Mirror of functions/text.py::clean_text(require_terminal_punct=
    False): kept lines = distinct (case-folded) non-empty stripped
    lines with >= 3 whitespace tokens; docs keeping nothing emit 0."""
    return (
        "WITH l AS (SELECT doc_id, "
        "TRIM(UNNEST(STR_SPLIT(text, chr(10)))) AS s FROM documents), "
        "q AS (SELECT doc_id, LOWER(s) AS k FROM l WHERE s <> '' "
        "AND ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(s, '\\s+')) >= 3), "
        "c AS (SELECT doc_id, CAST(COUNT(DISTINCT k) AS BIGINT) AS n "
        "FROM q GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(c.n, 0) AS n_lines_kept "
        "FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id"
    )


def _quality_features_oracle_sql() -> str:
    """Mirror of functions/text.py::quality_features: identical count
    components (component-verified vs Python at sf0.01/sf0.1) and the
    identical left-to-right float expression order for the ratios and
    the monotone score product."""
    return (
        "WITH b AS (SELECT doc_id, text, LENGTH(text) AS n_chars, "
        "LEN(regexp_extract_all(text, '[.,;:!?\"''()\\-]')) AS n_punct, "
        "LEN(regexp_extract_all(text, '[0-9]')) AS n_digit, "
        "LEN(regexp_extract_all(text, '[A-Z\u00c0-\u00d6\u00d8-\u00de]')) AS n_upper, "
        + _TOKS_SQL + " AS toks FROM documents), "
        "s AS (SELECT doc_id, n_chars, n_punct, n_digit, n_upper, "
        "COALESCE(ARRAY_LENGTH(toks), 0) AS n_tok, "
        "COALESCE(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))), 0) AS sum_len, "
        "COALESCE(LEN(LIST_DISTINCT(LIST_TRANSFORM(toks, x -> LOWER(x)))), 0) AS n_uniq, "
        "COALESCE(LEN(LIST_FILTER(LIST_TRANSFORM(toks, x -> LOWER(x)), "
        "x -> LIST_CONTAINS(" + _SW_EN_SQL + ", x))), 0) AS n_sw FROM b), "
        "f AS (SELECT doc_id, n_chars, "
        "CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(sum_len AS DOUBLE) / n_tok END AS mwl, "
        "CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END AS punct_ratio, "
        "CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_digit AS DOUBLE) / n_chars END AS digit_ratio, "
        "CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_upper AS DOUBLE) / n_chars END AS upper_ratio, "
        "CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_sw AS DOUBLE) / n_tok END AS stopword_ratio, "
        "CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_uniq AS DOUBLE) / n_tok END AS uniq, "
        "n_tok FROM s) "
        "SELECT doc_id, "
        "CASE WHEN n_chars = 0 THEN 0.0 ELSE mwl END AS mean_word_len, "
        "punct_ratio, digit_ratio, upper_ratio, stopword_ratio, "
        "uniq AS unique_token_ratio, "
        "CASE WHEN n_chars = 0 THEN 0.0 ELSE "
        "(((CASE WHEN n_tok < 5 THEN 1.0 * 0.2 ELSE 1.0 END) "
        "* (CASE WHEN mwl < 2.0 OR mwl > 12.0 THEN 0.5 ELSE 1.0 END)) "
        "* (1.0 - LEAST(digit_ratio * 2.0, 0.5))) "
        "* (0.5 + 0.5 * LEAST(uniq * 1.5, 1.0)) END AS quality "
        "FROM f"
    )





def _line_of_sight_oracle_sql(n_steps: int = 64, clearance: float = 2.0) -> str:
    """Mirror of _q_line_of_sight: identical endpoint-pixel indices
    (precomputed ints), step fractions, nearest-pixel floor lookups,
    and strict height comparison."""
    import numpy as np

    a = 0.01
    parts = []
    probes = list(enumerate(OG_KNN_PROBES))
    for i, (ia, p_a) in enumerate(probes):
        for ib, p_b in probes[i + 1:]:
            ca = int(np.floor((p_a[0] - 77.0) / a))
            ra = int(np.floor((29.0 - p_a[1]) / a))
            cb = int(np.floor((p_b[0] - 77.0) / a))
            rb = int(np.floor((29.0 - p_b[1]) / a))
            dlon = p_b[0] - p_a[0]
            dlat = p_b[1] - p_a[1]
            parts.append(
                f"SELECT CAST({ia * 10 + ib} AS BIGINT) AS pair_id, "
                f"CAST(CASE WHEN nb = 0 THEN 1 ELSE 0 END AS BIGINT) "
                f"AS visible, CAST(nb AS BIGINT) AS n_blocked FROM ("
                f"SELECT SUM(CASE WHEN gz.z IS NOT NULL "
                f"AND gz.z > e.za + s.t * (e.zb - e.za) "
                f"THEN 1 ELSE 0 END) AS nb "
                f"FROM (SELECT (CAST(i.range AS DOUBLE) + 1.0) "
                f"/ {float(n_steps + 1)!r} AS t FROM range(0, {n_steps}) i) s "
                f"CROSS JOIN (SELECT "
                f"COALESCE((SELECT z FROM g WHERE row = {ra} "
                f"AND col = {ca} AND z > -1e30), 0.0) + {clearance!r} AS za, "
                f"COALESCE((SELECT z FROM g WHERE row = {rb} "
                f"AND col = {cb} AND z > -1e30), 0.0) + {clearance!r} AS zb) e "
                f"LEFT JOIN g gz ON gz.row = CAST(FLOOR((29.0 - "
                f"({p_a[1]!r} + s.t * {dlat!r})) / 0.01) AS BIGINT) "
                f"AND gz.col = CAST(FLOOR((({p_a[0]!r} + s.t * {dlon!r}) "
                f"- 77.0) / 0.01) AS BIGINT) AND gz.z > -1e30)"
            )
    return (
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}) " + " UNION ALL ".join(parts)
    )



def _cover_bbox_oracle_sql(res_min: int = 5, res_max: int = 8) -> str:
    """Mirror of _q_cover_bbox: identical cell-size doubles and
    bounds arithmetic, recursive quadtree walk of boundary cells."""
    import numpy as np

    poly = OG_POLYGONS["q0"]
    minx = min(p[0] for p in poly)
    maxx = max(p[0] for p in poly)
    miny = min(p[1] for p in poly)
    maxy = max(p[1] for p in poly)
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        cell_size,
    )

    s0 = cell_size(res_min)
    ix0 = int(np.floor((minx + 180.0) / s0))
    ix1 = int(np.floor((maxx + 180.0) / s0))
    iy0 = int(np.floor((miny + 90.0) / s0))
    iy1 = int(np.floor((maxy + 90.0) / s0))

    def bounds_expr(r_expr, iy_expr, ix_expr):
        s = f"(360.0 / POWER(2.0, {r_expr} + 8))"
        return (
            f"({ix_expr}) * {s} - 180.0",
            f"({iy_expr}) * {s} - 90.0",
            f"(({ix_expr}) + 1) * {s} - 180.0",
            f"(({iy_expr}) + 1) * {s} - 90.0",
        )

    bx0, by0, bx1, by1 = bounds_expr(str(res_min), "iy", "ix")
    full0 = (
        f"CASE WHEN {bx0} >= {minx!r} AND {bx1} <= {maxx!r} "
        f"AND {by0} >= {miny!r} AND {by1} <= {maxy!r} THEN 1 ELSE 0 END"
    )
    disj0 = (
        f"({bx1} <= {minx!r} OR {bx0} >= {maxx!r} "
        f"OR {by1} <= {miny!r} OR {by0} >= {maxy!r})"
    )
    cx0, cy0, cx1, cy1 = ("q.cx0", "q.cy0", "q.cx1", "q.cy1")
    ex0, ey0, ex1, ey1 = bounds_expr("w.r + 1", "2 * w.iy + d.dy", "2 * w.ix + d.dx")
    return (
        f"WITH RECURSIVE roots AS (SELECT y.range AS iy, x.range AS ix "
        f"FROM range({iy0}, {iy1 + 1}) y, range({ix0}, {ix1 + 1}) x), "
        f"w(r, iy, ix, state) AS ("
        f"SELECT {res_min}, iy, ix, {full0} FROM roots WHERE NOT {disj0} "
        f"UNION ALL "
        f"SELECT q.r, q.iy, q.ix, "
        f"CASE WHEN {cx0} >= {minx!r} AND {cx1} <= {maxx!r} "
        f"AND {cy0} >= {miny!r} AND {cy1} <= {maxy!r} THEN 1 ELSE 0 END "
        f"FROM (SELECT w.r + 1 AS r, 2 * w.iy + d.dy AS iy, "
        f"2 * w.ix + d.dx AS ix, {ex0} AS cx0, {ey0} AS cy0, "
        f"{ex1} AS cx1, {ey1} AS cy1 "
        f"FROM w JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) d(dy, dx) "
        f"ON TRUE WHERE w.state = 0 AND w.r < {res_max}) q "
        f"WHERE NOT ({cx1} <= {minx!r} OR {cx0} >= {maxx!r} "
        f"OR {cy1} <= {miny!r} OR {cy0} >= {maxy!r})) "
        f"SELECT CAST(r AS BIGINT) AS res, CAST(iy AS BIGINT) AS iy, "
        f"CAST(ix AS BIGINT) AS ix, CAST(state AS BIGINT) AS full "
        f"FROM w WHERE state = 1 OR r = {res_max}"
    )
