"""DuckDB oracle SQL, part 03 of 4.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Each part replays the (cheap, string-building) local
scaffolding verbatim and appends its slice of entries to the
accumulated dict in the ORIGINAL statement order, so
cross-entry reads (e.g. flow_accumulation composing
flow_direction's SQL) keep working across parts.
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
    OG_KNN_OUTSIDE_PROBES,
    OG_KNN_PROBES,
    OG_POLYGONS,
    OG_SAMPLE_RATE,
    OG_TILE,
    OG_W,
    _OG_GRID_SQL,
    _OG_SLOPE_GRID_SQL,
    _cell_expr,
    _cell_expr_cols,
    _centroid_oracle_sql,
    _corr_matrix_oracle_sql,
    _halfplane_sql,
    _perimeter_oracle_sql,
)
from .part02 import (  # noqa: F401
    OG_SEGMENTS,
    _MESSY_URL_SQL,
    _RANGE_JOIN_WINDOW_US,
    _URL_SQL,
    _WINDOW_JOIN_US,
    _canon_sql_expr,
    _url_parse_fields_oracle_sql,
    _url_sql_field,
)
from .part03 import (  # noqa: F401
    _GFUNC_RADII_Q,
)
from .part05 import (  # noqa: F401
    _VIT_STATES,
)
from .part06 import (  # noqa: F401
    _GOPHER_STOPWORDS,
    _MARKOV_STATES,
)
from .part07 import (  # noqa: F401
    _BH_PERMS,
    _BLOOM_BITS,
    _BLOOM_PROBES,
    _BOOT_REPS,
    _GWR_PROBES,
    _GWR_R2,
    _HEAT_STEPS,
    _HILBERT_N,
    _MANTEL_PERMS,
    _MP_PATTERNS,
    _RANSAC_CANDS,
)
from .part08 import (  # noqa: F401
    _CLIQUE_T,
    _VOR_SITES_SQL,
    _bin_packing_oracle_sql,
    _k_center_oracle_sql,
    _katz_oracle_sql,
    _max_clique_oracle_sql,
    _rsi_oracle_sql,
    _seam_oracle_sql,
    _set_cover_oracle_sql,
    _sig_string_sql,
    _simrank_oracle_sql,
    _stable_matching_oracle_sql,
    _steiner_oracle_sql,
    _textrank_oracle_sql,
)
from .part09 import (  # noqa: F401
    _TDECAY_HL_US,
    _banzhaf_oracle_sql,
    _coloring_oracle_sql,
    _competing_risks_oracle_sql,
    _crc32_oracle_sql,
    _croston_oracle_sql,
    _goertzel_oracle_sql,
    _holm_oracle_sql,
    _iforest_oracle_sql,
    _irv_oracle_sql,
    _kleinberg_oracle_sql,
    _lru_oracle_sql,
    _mattr_oracle_sql,
    _mondrian_oracle_sql,
    _sinkhorn_oracle_sql,
)
from .part10 import (  # noqa: F401
    _adaboost_oracle_sql,
    _betweenness_oracle_sql,
    _bilinear_oracle_sql,
    _bipartite_matching_oracle_sql,
    _bperc_oracle_sql,
    _bradley_terry_oracle_sql,
    _bridges_oracle_sql,
    _cart_oracle_sql,
    _chain_ladder_oracle_sql,
    _closed_itemsets_oracle_sql,
    _contour_segments_oracle_sql,
    _convex_layers_oracle_sql,
    _cover_bbox_oracle_sql,
    _dpp_oracle_sql,
    _dtw_oracle_sql,
    _eff_resistance_oracle_sql,
    _fiedler_oracle_sql,
    _frechet_oracle_sql,
    _gmm_oracle_sql,
    _huber_oracle_sql,
    _huffman_oracle_sql,
    _ipf_oracle_sql,
    _kalman_oracle_sql,
    _kmeans_oracle_sql,
    _knapsack_oracle_sql,
    _lang_id_oracle_sql,
    _line_of_sight_oracle_sql,
    _lis_oracle_sql,
    _logit_oracle_sql,
    _lpa_oracle_sql,
    _markov_attribution_oracle_sql,
    _markov_stationary_oracle_sql,
    _mrmr_oracle_sql,
    _mtf_oracle_sql,
    _pca_power_oracle_sql,
    _peel_oracle_sql,
    _quality_features_oracle_sql,
    _repair_oracle_sql,
    _rosner_oracle_sql,
    _s2_cells_oracle_sql,
    _schulze_oracle_sql,
    _spanning_tree_oracle_sql,
    _text_cleaning_oracle_sql,
    _tsp_oracle_sql,
    _ttc_oracle_sql,
)
from .part11 import (  # noqa: F401
    _approx_distinct_by_type_oracle_sql,
    _approx_distinct_oracle_sql,
    _assignment_oracle_sql,
    _boundary_distance_oracle_sql,
    _colley_oracle_sql,
    _convex_hull_oracle_sql,
    _dbscan_oracle_sql,
    _geofence_oracle_sql,
    _geohash_expr_for_events,
    _hits_oracle_sql,
    _jaccard_pairs_oracle_sql,
    _kriging_oracle_sql,
    _minhash_dedup_oracle_sql,
    _mst_oracle_sql,
    _pagerank_sql,
    _passage_dedup_oracle_sql,
    _polygon_coverage_oracle_sql,
    _quality_scores_oracle_sql,
    _quantiles_oracle_sql,
    _simhash_dedup_oracle_sql,
    _stay_points_oracle_sql,
    _track_simplify_oracle_sql,
    _winnow_dedup_oracle_sql,
)
def oracle_entries(out: dict) -> dict:
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        cell_size,
    )

    grid = _OG_GRID_SQL
    valid = f"SELECT * FROM ({grid}) WHERE z > -1e30"
    cell8 = _cell_expr(8)
    probes_values = ", ".join(
        f"(CAST({i} AS BIGINT), {p[0]!r}, {p[1]!r})"
        for i, p in enumerate(OG_KNN_PROBES)
    )
    outside_values = ", ".join(
        f"(CAST({i} AS BIGINT), {p[0]!r}, {p[1]!r})"
        for i, p in enumerate(OG_KNN_OUTSIDE_PROBES)
    )
    pip_parts = []
    for pid, poly in OG_POLYGONS.items():
        pip_parts.append(
            f"SELECT '{pid}' AS polygon_id, COUNT(*) AS n FROM ({valid}) "
            f"WHERE {_halfplane_sql(poly)}"
        )
    tiles_sql = f"""
      SELECT 'og_' || CAST(tr.range * {OG_TILE} AS VARCHAR) || '_' ||
             CAST(tc.range * {OG_TILE} AS VARCHAR) AS tile_id,
             77.0 + 0.01 * (tc.range * {OG_TILE}) AS tminx,
             29.0 - 0.01 * (tr.range * {OG_TILE} + {OG_TILE}) AS tminy,
             77.0 + 0.01 * (tc.range * {OG_TILE} + {OG_TILE}) AS tmaxx,
             29.0 - 0.01 * (tr.range * {OG_TILE}) AS tmaxy
      FROM range(0, {OG_H // OG_TILE}) tr, range(0, {OG_W // OG_TILE}) tc
    """
    poly_boxes = " UNION ALL ".join(
        "SELECT {} AS pminx, {} AS pminy, {} AS pmaxx, {} AS pmaxy".format(
            repr(min(x for x, _ in poly)), repr(min(y for _, y in poly)),
            repr(max(x for x, _ in poly)), repr(max(y for _, y in poly)),
        )
        for poly in OG_POLYGONS.values()
    )
    _mt = " + ".join(
        f"((col // {1 << b}) % 2) * {1 << (2 * b)} "
        f"+ ((row // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(7)
    )
    _segs_values = ", ".join(
        f"({sid}, {ax}, {ay}, {bx}, {by})"
        for sid, ax, ay, bx, by in OG_SEGMENTS
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql as _mx,
    )

    _mb_grid = (
        "SELECT b.b AS band, r.range AS row, c.range AS col, "
        "CASE WHEN (r.range * 5 + c.range * 3 + b.b) % 29 = 0 THEN NULL "
        "ELSE CAST(ROUND(CAST(CAST(((r.range * 73 + c.range * 31 "
        "+ b.b * 101) % 500) / 10.0 AS REAL) AS DOUBLE) * 10.0, 0) "
        "AS BIGINT) END AS k "
        "FROM range(0, 96) r, range(0, 96) c, (VALUES (1), (2)) b(b)"
    )
    _mh_seeds = ", ".join(f"({s})" for s in range(16))
    _daily_frame = (
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "trp AS (SELECT d0.t, d0.x AS x0, d1.x AS x1, d2.x AS x2 "
        "FROM dn d0 JOIN dn d1 ON d1.t = d0.t + 1 "
        "JOIN dn d2 ON d2.t = d0.t + 2)"
    )
    _daily_xy_frame = (
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x, "
        "COALESCE(c0.y, 0) AS y FROM dd LEFT JOIN c0 ON c0.d = dd.d)"
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32_sql as _m32,
    )
    _rho = (
        "(CAST(p AS DOUBLE) - mu * CAST(sa AS DOUBLE) "
        "- mu * CAST(sb AS DOUBLE) + CAST(n - h AS DOUBLE) * mu * mu) "
        "/ (CAST(q AS DOUBLE) - 2.0 * mu * CAST(s AS DOUBLE) "
        "+ CAST(n AS DOUBLE) * mu * mu)"
    )
    _pa_expr = "(CAST(na AS DOUBLE) / CAST(tta AS DOUBLE))"
    _pb_expr = "(CAST(nb AS DOUBLE) / CAST(ttb AS DOUBLE))"
    _m_expr = f"(({_pa_expr} + {_pb_expr}) / 2.0)"
    _vs = list(_VIT_STATES)
    _vcols = [f"s{i}" for i in range(len(_vs))]
    _vbase = ", ".join(
        f"CASE WHEN event_type = '{s}' THEN 2 ELSE -1 END AS s{i}"
        for i, s in enumerate(_vs)
    )
    _vstep = ", ".join(
        "GREATEST("
        + ", ".join(
            f"dp.s{j} + 1" if j == i else f"dp.s{j}"
            for j in range(len(_vs))
        )
        + f") + CASE WHEN e.event_type = '{s}' THEN 2 ELSE -1 END AS s{i}"
        for i, s in enumerate(_vs)
    )
    _vbest = "GREATEST(" + ", ".join(_vcols) + ")"
    _vcase = (
        "CASE "
        + " ".join(
            f"WHEN s{i} = {_vbest} THEN '{s}'" for i, s in enumerate(_vs)
        )
        + " END"
    )
    _mk_levels = []
    _mk_levels.append(
        "l0 AS (SELECT sp.idx, COALESCE(l.h, 0) AS h FROM "
        "(SELECT UNNEST(RANGE(16)) AS idx) sp LEFT JOIN "
        "(SELECT doc_id % 16 AS idx, "
        f"CAST(SUM({_m32('doc_id * 1000003 + n_chars', 5)}) AS BIGINT) "
        "AS h FROM documents GROUP BY 1) l USING (idx))"
    )
    for _lv in range(1, 5):
        _pair = (
            f"(SELECT idx // 2 AS idx, "
            f"MAX(CASE WHEN idx % 2 = 0 THEN h END) * 31 "
            f"+ MAX(CASE WHEN idx % 2 = 1 THEN h END) AS v "
            f"FROM l{_lv - 1} GROUP BY idx // 2)"
        )
        _mk_levels.append(
            f"l{_lv} AS (SELECT idx, "
            f"CAST({_m32('v', _lv)} AS BIGINT) AS h FROM {_pair})"
        )
    _gain = (
        "CAST(ROUND(CAST(POW(2, rel) - 1 AS DOUBLE) "
        "/ (LN(CAST(i + 1 AS DOUBLE)) / LN(2.0)) * 1e9, 0) AS BIGINT)"
    )
    _kt = [
        "WITH v AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e0 AS MATERIALIZED (SELECT a.w AS w1, b.w AS w2 FROM v a "
        "JOIN v b ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1)"
    ]
    for _r in range(6):
        _kt.append(
            f", ed{_r} AS MATERIALIZED (SELECT w1, w2 FROM e{_r} "
            f"UNION ALL SELECT w2 AS w1, w1 AS w2 FROM e{_r}), "
            f"s{_r} AS MATERIALIZED (SELECT e.w1, e.w2, "
            f"(SELECT COUNT(*) FROM ed{_r} x JOIN ed{_r} y "
            f"ON x.w2 = y.w2 WHERE x.w1 = e.w1 AND y.w1 = e.w2) AS s "
            f"FROM e{_r} e), "
            f"e{_r + 1} AS MATERIALIZED (SELECT w1, w2 FROM s{_r} "
            f"WHERE s >= 2)"
        )
    _sm = (
        "SELECT l_returnflag AS grp, "
        "CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS x, "
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y "
        "FROM lineitem"
    )
    _fpr_parts = []
    for pid, poly in sorted(OG_POLYGONS.items()):
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        _fpr_parts.append(
            f"SELECT '{pid}' AS polygon_id, "
            f"CAST(SUM(CASE WHEN lon >= {min(xs)!r} AND lon <= {max(xs)!r} "
            f"AND lat >= {min(ys)!r} AND lat <= {max(ys)!r} "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_bbox, "
            f"CAST(SUM(CASE WHEN {_halfplane_sql(poly)} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_pip FROM ({valid})"
        )
    _p1 = "((CAST(f.n1 AS DOUBLE) + 1.0) / (CAST(t.tn1 AS DOUBLE) + 10.0))"
    _p2 = "((CAST(f.n2 AS DOUBLE) + 1.0) / (CAST(t.tn2 AS DOUBLE) + 10.0))"
    _binx = " + ".join(
        f"(CASE WHEN c > ed.e{i} THEN 1 ELSE 0 END)" for i in range(1, 10)
    )
    _offs = []
    for _d in (1, 2, 3):
        for _di in range(-_d, _d + 1):
            for _dj in range(-_d, _d + 1):
                if max(abs(_di), abs(_dj)) == _d:
                    _offs.append(f"({_d}, {_di}, {_dj})")
    _pc_parts = []
    _pc_ctes = []
    for _t in (20, 30, 40):
        _pc_ctes.append(
            f"v{_t} AS (SELECT row, col, row * 1048576 + col AS p "
            f"FROM ({valid}) WHERE z >= {_t}.0), "
            f"e{_t} AS (SELECT a.p AS p1, b.p AS p2 FROM v{_t} a "
            f"JOIN v{_t} b ON (b.row = a.row AND b.col = a.col + 1) "
            f"OR (b.row = a.row + 1 AND b.col = a.col)), "
            f"sym{_t} AS (SELECT p1, p2 FROM e{_t} "
            f"UNION ALL SELECT p2 AS p1, p1 AS p2 FROM e{_t}), "
            f"walk{_t}(p) AS (SELECT p FROM v{_t} WHERE row = 0 "
            f"UNION SELECT sym{_t}.p2 FROM walk{_t} "
            f"JOIN sym{_t} ON sym{_t}.p1 = walk{_t}.p)"
        )
        _pc_parts.append(
            f"SELECT CAST({_t} AS DOUBLE) AS threshold, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM v{_t}) AS n_cells, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM walk{_t}) "
            "AS n_reached, "
            f"CAST(CASE WHEN EXISTS (SELECT 1 FROM walk{_t} w "
            f"JOIN v{_t} vv ON vv.p = w.p WHERE vv.row = 95) "
            "THEN 1 ELSE 0 END AS BIGINT) AS spans"
        )
    _EV = (
        "SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e4, 0) AS BIGINT) "
        "AS vq FROM embeddings"
    )
    _sw_in = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    _MASK_SQL = (
        "pts AS (SELECT c.range AS x, r.range AS y "
        "FROM range(0, 96) r, range(0, 96) c "
        "WHERE (r.range * 73 + c.range * 31) % 500 >= 450 "
        "AND (r.range * 7 + c.range * 13) % 11 >= 3)"
    )
    _m32j = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("(j.range * 8 + k.range)", 0)
    import math as _math

    _pascal = ", ".join(
        f"({n}, {k}, {_math.comb(n, k)})"
        for n in range(21)
        for k in range(n + 1)
    )
    _m32c = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("event_id", 99)
    _DAILY_SQL = (
        "c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d)"
    )
    _probe_vals = ", ".join(
        f"({i}, {x}, {y})" for i, (x, y) in enumerate(_GWR_PROBES)
    )
    _m41 = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("i.range", 41)
    _m43 = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("i.range", 43)
    _m47 = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("cell", 47)
    _m32s = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("dn.t", "pp.p * 7919")
    _RET_SQL = (
        "c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "pp AS (SELECT a.y AS y0, b.y AS y1 FROM dn a "
        "JOIN dn b ON b.t = a.t + 1 WHERE a.y > 0), "
        "rq AS (SELECT CAST(ROUND(CAST(y1 - y0 AS DOUBLE) "
        "/ CAST(y0 AS DOUBLE) * 1e6, 0) AS BIGINT) AS r FROM pp)"
    )
    _m32p = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("e.event_id", "pp.p")
    _dense_daily = (
        "c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
    )
    _hsteps = []
    _hs = _HILBERT_N // 2
    _hi = 0
    while _hs > 0:
        _hi += 1
        _hsteps.append(
            f"h{_hi} AS MATERIALIZED (SELECT cx, cy, n, "
            f"CASE WHEN ((y // {_hs}) & 1) = 0 THEN "
            f"(CASE WHEN ((x // {_hs}) & 1) = 1 "
            f"THEN {_HILBERT_N - 1} - y ELSE y END) ELSE x END AS x, "
            f"CASE WHEN ((y // {_hs}) & 1) = 0 THEN "
            f"(CASE WHEN ((x // {_hs}) & 1) = 1 "
            f"THEN {_HILBERT_N - 1} - x ELSE x END) ELSE y END AS y, "
            f"d + {_hs * _hs} * xor(3 * ((x // {_hs}) & 1), "
            f"(y // {_hs}) & 1) AS d FROM h{_hi - 1})"
        )
        _hs //= 2
    _rr_u = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("event_id")
    _bh_u = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("e.eid", "tt.i * 1009 + pp.p")
    from itertools import permutations as _perms

    _pm_rows = ", ".join(
        f"({pid}, {pos}, '{_MARKOV_STATES[t]}')"
        for pid, perm in enumerate(_perms(range(5)))
        for pos, t in enumerate(perm)
    )
    _mp_vals = ", ".join(f"('{p}')" for p in _MP_PATTERNS)
    _bt_u = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("bb.b * 1000 + ii.t")
    _luhn_terms = " + ".join(
        (
            f"(CASE WHEN (event_id // {10 ** i} % 10) > 4 "
            f"THEN 2 * (event_id // {10 ** i} % 10) - 9 "
            f"ELSE 2 * (event_id // {10 ** i} % 10) END)"
            if i % 2 == 1
            else f"(event_id // {10 ** i} % 10)"
        )
        for i in range(12)
    )
    _mix = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql
    _bk = [_mix("u", i * 7777) for i in range(3)]
    _bp = [_mix("p", i * 7777) for i in range(3)]
    _mt_u = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("nd.idx + pp.p * 1000")
    _heat_steps_sql = []
    for _hk in range(1, _HEAT_STEPS + 1):
        _p = f"g{_hk - 1}"
        _heat_steps_sql.append(
            f"g{_hk} AS MATERIALIZED (SELECT g.x, g.y, "
            "(4 * g.v + COALESCE(u.v, 0) + COALESCE(d.v, 0) "
            "+ COALESCE(l.v, 0) + COALESCE(r.v, 0)) // 8 AS v "
            f"FROM {_p} g "
            f"LEFT JOIN {_p} u ON u.x = g.x AND u.y = g.y - 1 "
            f"LEFT JOIN {_p} d ON d.x = g.x AND d.y = g.y + 1 "
            f"LEFT JOIN {_p} l ON l.x = g.x - 1 AND l.y = g.y "
            f"LEFT JOIN {_p} r ON r.x = g.x + 1 AND r.y = g.y)"
        )
    _rx1 = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("r.range")
    _rx2 = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql("r.range + 1000")
    _mx = __import__(
        "tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
        fromlist=["mix32_sql"],
    ).mix32_sql
    _WG_SQL = (
        "tok AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e "
        "UNION ALL SELECT w2, w1 FROM e), "
        "deg AS (SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM sym GROUP BY w1)"
    )
    _GRID2_SQL = (
        "g0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy "
        "FROM range(0, 96) a, range(0, 96) b), "
        "dn AS MATERIALIZED (SELECT fr.gx, fr.gy, "
        "COALESCE(g0.n, 0) AS n, COALESCE(g0.y, 0) AS y "
        "FROM fr LEFT JOIN g0 USING (gx, gy)), "
        "lg AS (SELECT * FROM (VALUES (1), (2), (4)) AS v(h))"
    )
    _ENT = (
        "(CASE WHEN {c} > 0 THEN CAST(ROUND(-CAST({c} AS DOUBLE) "
        "* LOG2(CAST({c} AS DOUBLE) / CAST({t} AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT) ELSE 0 END)"
    )
    _G16_SQL = (
        "cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
        "t16 AS (SELECT cell, "
        "ROW_NUMBER() OVER (ORDER BY n DESC, cell) - 1 AS bi "
        "FROM cc ORDER BY n DESC, cell LIMIT 16), "
        "nd AS (SELECT cell, bi, cell % 96 AS x, cell // 96 AS y "
        "FROM t16), "
        "am AS MATERIALIZED (SELECT a.bi, "
        "CAST(COALESCE(bit_or(CAST(1 AS BIGINT) << b.bi), 0) "
        "AS BIGINT) AS adj FROM nd a LEFT JOIN nd b "
        "ON b.bi <> a.bi AND GREATEST(ABS(a.x - b.x), "
        f"ABS(a.y - b.y)) <= {_CLIQUE_T} GROUP BY a.bi), "
        "mk AS (SELECT range AS mask FROM range(1, 65536))"
    )
    _DAILY2_SQL = (
        "c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y, COALESCE(c0.c, 0) AS c "
        "FROM fr LEFT JOIN c0 USING (d))"
    )
    out["ols_two_var"] = (
        # exact HUGEINT normal-equation determinants (Cramer), float
        # only in the three divisions and the R^2 tail -- mirrors
        # _q_ols_two_var
        "WITH q AS (SELECT "
        "CAST(ROUND(l_quantity, 0) AS BIGINT) AS x1, "
        "CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS x2, "
        "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y FROM lineitem), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x1) AS HUGEINT) AS s1, "
        "CAST(SUM(x2) AS HUGEINT) AS s2, "
        "CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(x1 * x1) AS HUGEINT) AS s11, "
        "CAST(SUM(x2 * x2) AS HUGEINT) AS s22, "
        "CAST(SUM(x1 * x2) AS HUGEINT) AS s12, "
        "CAST(SUM(x1 * y) AS HUGEINT) AS s1y, "
        "CAST(SUM(x2 * y) AS HUGEINT) AS s2y, "
        "CAST(SUM(y * y) AS HUGEINT) AS syy FROM q), "
        "d AS (SELECT n, sy, s1y, s2y, syy, "
        "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) "
        "+ s2 * (s1 * s12 - s11 * s2) AS d0, "
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) "
        "+ s2 * (s1y * s12 - s11 * s2y) AS db0, "
        "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) "
        "+ s2 * (s1 * s2y - s1y * s2) AS db1, "
        "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) "
        "+ sy * (s1 * s12 - s11 * s2) AS db2 FROM m), "
        "b AS (SELECT n, sy, s1y, s2y, syy, "
        "CAST(db0 AS DOUBLE) / CAST(d0 AS DOUBLE) AS b0, "
        "CAST(db1 AS DOUBLE) / CAST(d0 AS DOUBLE) AS b1, "
        "CAST(db2 AS DOUBLE) / CAST(d0 AS DOUBLE) AS b2 FROM d) "
        "SELECT CAST(n AS BIGINT) AS n_rows, "
        "ROUND(b0, 6) AS intercept, ROUND(b1, 6) AS beta_qty, "
        "ROUND(b2, 6) AS beta_disc_bp, "
        "ROUND(1.0 - (CAST(syy AS DOUBLE) - (b0 * CAST(sy AS DOUBLE) "
        "+ b1 * CAST(s1y AS DOUBLE) + b2 * CAST(s2y AS DOUBLE))) "
        "/ (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) "
        "* CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS r2 FROM b"
    )
    out["simpson_diversity"] = (
        # unbiased Simpson 1 - sum n(n-1) / N(N-1) per source --
        # mirrors _q_simpson_diversity
        "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source, lang), "
        "s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot, "
        "CAST(SUM(n * (n - 1)) AS BIGINT) AS same "
        "FROM c GROUP BY source) "
        "SELECT source, tot AS n_docs, "
        "ROUND(1.0 - CAST(same AS DOUBLE) / (CAST(tot AS DOUBLE) "
        "* CAST(tot - 1 AS DOUBLE)), 6) AS simpson_d, "
        "ROUND(1.0 / (1.0 - (1.0 - CAST(same AS DOUBLE) "
        "/ (CAST(tot AS DOUBLE) * CAST(tot - 1 AS DOUBLE)))), 6) "
        "AS effective_langs FROM s"
    )
    out["voronoi_assign"] = (
        # nearest-probe allocation with (d2, fid) tie order and
        # 1e9-quantized distance sums -- mirrors _q_voronoi_assign
        f"WITH g AS ({_OG_GRID_SQL}), "
        "v AS (SELECT pix, lon, lat FROM g WHERE z > -1e30), "
        "f AS (SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {p[0]!r}, {p[1]!r})"
            for i, p in enumerate(OG_KNN_PROBES)
        )
        + ") t(fid, px, py)), "
        "d AS (SELECT v.pix, f.fid, "
        "(v.lon - f.px) * (v.lon - f.px) "
        "+ (v.lat - f.py) * (v.lat - f.py) AS d2, "
        "ROW_NUMBER() OVER (PARTITION BY v.pix "
        "ORDER BY (v.lon - f.px) * (v.lon - f.px) "
        "+ (v.lat - f.py) * (v.lat - f.py), f.fid) AS rn "
        "FROM v, f), "
        "a AS (SELECT pix, fid, "
        "CAST(ROUND(SQRT(d2) * 1e9, 0) AS BIGINT) AS term "
        "FROM d WHERE rn = 1) "
        "SELECT CAST(fid AS BIGINT) AS facility, "
        "CAST(COUNT(*) AS BIGINT) AS n_points, "
        "ROUND(CAST(SUM(term) AS DOUBLE) / 1e9 "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS mean_dist "
        "FROM a GROUP BY fid"
    )
    out["kwic_contexts"] = (
        # (prev, next) contexts of the global top token; adjacency on
        # the empty-filtered per-doc token list -- mirrors
        # _q_kwic_contexts
        "WITH tf AS (SELECT token FROM ("
        "SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
        "FROM documents) WHERE token <> '' "
        "GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 1), "
        "ws AS (SELECT list_filter("
        "regexp_split_to_array(text, '\\s+'), t -> t <> '') AS ws "
        "FROM documents), "
        "k AS (SELECT ws[i - 1] AS prev, ws[i + 1] AS nxt FROM ws, "
        "LATERAL (SELECT unnest(generate_series(2, len(ws) - 1)) AS i) "
        "WHERE ws[i] = (SELECT token FROM tf)) "
        "SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM k "
        "GROUP BY prev, nxt ORDER BY n DESC, prev, nxt LIMIT 20"
    )
    out["vocab_overlap"] = (
        # distinct (token, source) -> sizes + pair intersections;
        # zero-intersection pairs preserved via the LEFT JOIN --
        # mirrors _q_vocab_overlap
        "WITH tk AS (SELECT source, "
        "UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
        "FROM documents), "
        "d AS (SELECT DISTINCT source, token FROM tk WHERE token <> ''), "
        "sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v "
        "FROM d GROUP BY source), "
        "ix AS (SELECT a.source AS sa, b.source AS sb, "
        "CAST(COUNT(*) AS BIGINT) AS inter FROM d a "
        "JOIN d b ON b.token = a.token AND a.source < b.source "
        "GROUP BY 1, 2), "
        "pr AS (SELECT a.source AS sa, b.source AS sb, a.v AS va, "
        "b.v AS vb FROM sz a, sz b WHERE a.source < b.source) "
        "SELECT pr.sa AS source_a, pr.sb AS source_b, "
        "pr.va AS vocab_a, pr.vb AS vocab_b, "
        "COALESCE(ix.inter, 0) AS inter, "
        "ROUND(CAST(COALESCE(ix.inter, 0) AS DOUBLE) "
        "/ CAST(pr.va + pr.vb - COALESCE(ix.inter, 0) AS DOUBLE), 6) "
        "AS jaccard "
        "FROM pr LEFT JOIN ix ON ix.sa = pr.sa AND ix.sb = pr.sb"
    )
    out["keyness_terms"] = (
        # Dunning G^2 vs expected counts; zero cells contribute 0;
        # per-term 1e6 quantization and integer sort key -- mirrors
        # _q_keyness_terms
        "WITH tk AS (SELECT source, "
        "UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
        "FROM documents), "
        "t2 AS (SELECT source, token FROM tk WHERE token <> ''), "
        "sa AS (SELECT MIN(source) AS s FROM documents), "
        "ca AS (SELECT token, "
        "CAST(SUM(CASE WHEN t2.source = sa.s THEN 1 ELSE 0 END) "
        "AS BIGINT) AS a, "
        "CAST(SUM(CASE WHEN t2.source <> sa.s THEN 1 ELSE 0 END) "
        "AS BIGINT) AS b FROM t2, sa GROUP BY token), "
        "tt AS (SELECT CAST(SUM(a) AS BIGINT) AS na, "
        "CAST(SUM(b) AS BIGINT) AS nb FROM ca), "
        "g AS (SELECT token, a, b, 2 * ("
        "(CASE WHEN a = 0 THEN 0 ELSE "
        "CAST(ROUND(CAST(a AS DOUBLE) * LN(CAST(a AS DOUBLE) "
        "/ (CAST(na AS DOUBLE) * CAST(a + b AS DOUBLE) "
        "/ CAST(na + nb AS DOUBLE))) * 1e6, 0) AS BIGINT) END) "
        "+ (CASE WHEN b = 0 THEN 0 ELSE "
        "CAST(ROUND(CAST(b AS DOUBLE) * LN(CAST(b AS DOUBLE) "
        "/ (CAST(nb AS DOUBLE) * CAST(a + b AS DOUBLE) "
        "/ CAST(na + nb AS DOUBLE))) * 1e6, 0) AS BIGINT) END)) AS gq "
        "FROM ca, tt) "
        "SELECT token, a AS n_a, b AS n_rest, "
        "ROUND(CAST(gq AS DOUBLE) / 1e6, 6) AS g2 FROM g "
        "ORDER BY gq DESC, token LIMIT 20"
    )
    out["terrain_openness"] = (
        # positive openness: max elevation angle per direction over
        # valid ray cells, diagonal spacing sqrt(2), 1e12-quantized
        # angle terms, all-8-directions cells only -- mirrors
        # _q_terrain_openness
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT row, col, z FROM g WHERE z > -1e30), "
        "rays AS (SELECT c.row, c.col, d.dr, d.dc, "
        "MAX((t.z - c.z) / (k.k * 0.01 * d.f)) AS mr "
        "FROM v c, (VALUES (0, 1, 1.0), (0, -1, 1.0), (1, 0, 1.0), "
        "(-1, 0, 1.0), (1, 1, SQRT(2.0)), (1, -1, SQRT(2.0)), "
        "(-1, 1, SQRT(2.0)), (-1, -1, SQRT(2.0))) d(dr, dc, f), "
        "range(1, 96) k(k), v t "
        "WHERE t.row = c.row + d.dr * k.k "
        "AND t.col = c.col + d.dc * k.k "
        "GROUP BY c.row, c.col, d.dr, d.dc), "
        "terms AS (SELECT row, col, "
        "CAST(ROUND((PI() / 2 - ATAN(mr)) * 1e12, 0) AS BIGINT) AS tq "
        "FROM rays), "
        "o AS (SELECT row, col, CAST(COUNT(*) AS BIGINT) AS nd, "
        "CAST(SUM(tq) AS BIGINT) AS s FROM terms GROUP BY row, col) "
        "SELECT row, col, "
        "ROUND(CAST(s AS DOUBLE) / 1e12 / 8.0, 6) AS openness "
        "FROM o WHERE nd = 8"
    )
    out["linear_attribution"] = (
        # equal split of purchase cents over the user's 24h-window
        # touches (strict (ts, event_id) order, inclusive window
        # start); per-pair terms quantized at 1e6 -- mirrors
        # _q_linear_attribution
        "WITH e AS (SELECT user_id, event_id, event_type, "
        "epoch_us(ts) AS us, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events), "
        "p AS (SELECT user_id, event_id AS pid, us, cents FROM e "
        "WHERE event_type = 'purchase'), "
        "m AS (SELECT p.pid, p.cents, t.event_type FROM p "
        "JOIN e t ON t.user_id = p.user_id "
        "AND t.us >= p.us - 86400000000 "
        "AND (t.us < p.us OR (t.us = p.us AND t.event_id < p.pid))), "
        "cnt AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM m GROUP BY pid), "
        "terms AS (SELECT m.event_type, "
        "CAST(ROUND(CAST(m.cents AS DOUBLE) / CAST(cnt.c AS DOUBLE) "
        "* 1e6, 0) AS BIGINT) AS tq "
        "FROM m JOIN cnt ON cnt.pid = m.pid) "
        "SELECT event_type, "
        "ROUND(CAST(SUM(tq) AS DOUBLE) / 1e6 / 100.0, 6) "
        "AS attributed_dollars FROM terms GROUP BY event_type"
    )
    out["heaps_law"] = (
        # first-occurrence buckets via MIN(doc_id) per token; cumulative
        # window sums; 1e12-quantized LN OLS -- mirrors _q_heaps_law
        "WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents), "
        "tk AS (SELECT doc_id, "
        "UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
        "FROM documents), "
        "t2 AS (SELECT doc_id, token FROM tk WHERE token <> ''), "
        "fb AS (SELECT token, MIN(doc_id) AS fd FROM t2 GROUP BY token), "
        "vb AS (SELECT (fd * 10 // (mx.mx + 1)) AS b, "
        "CAST(COUNT(*) AS BIGINT) AS v FROM fb, mx GROUP BY 1), "
        "nb AS (SELECT (doc_id * 10 // (mx.mx + 1)) AS b, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM t2, mx GROUP BY 1), "
        "bl AS (SELECT r.range AS b FROM range(0, 10) r), "
        "c AS (SELECT bl.b, "
        "CAST(SUM(COALESCE(nb.n, 0)) OVER (ORDER BY bl.b "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens, "
        "CAST(SUM(COALESCE(vb.v, 0)) OVER (ORDER BY bl.b "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab "
        "FROM bl LEFT JOIN nb ON nb.b = bl.b "
        "LEFT JOIN vb ON vb.b = bl.b), "
        "q AS (SELECT b, cum_tokens, cum_vocab, "
        "CAST(ROUND(LN(CAST(cum_tokens AS DOUBLE)) * 1e12, 0) AS BIGINT) "
        "AS u, "
        "CAST(ROUND(LN(CAST(cum_vocab AS DOUBLE)) * 1e12, 0) AS BIGINT) "
        "AS v FROM c), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k, "
        "CAST(SUM(u) AS HUGEINT) AS su, CAST(SUM(v) AS HUGEINT) AS sv, "
        "SUM(CAST(u AS HUGEINT) * CAST(v AS HUGEINT)) AS suv, "
        "SUM(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS suu FROM q) "
        "SELECT q.b AS bucket, q.cum_tokens, q.cum_vocab, "
        "ROUND(CAST(m.k * m.suv - m.su * m.sv AS DOUBLE) "
        "/ CAST(m.k * m.suu - m.su * m.su AS DOUBLE), 6) AS heaps_beta "
        "FROM q, m"
    )
    out["hurst_exponent"] = (
        # scaled-integer R/S per window (rs = max-min of w*cum-(j+1)*S,
        # a2 = w*Q-S^2), per-window ratios quantized at 1e9, LN OLS at
        # 1e12 -- mirrors _q_hurst_exponent over the dense day series
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi, "
        "CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "ws AS (SELECT w.w, dn.t // w.w AS wid, dn.t, dn.x "
        "FROM dn, (VALUES (3), (5), (10), (15)) w(w), mm "
        "WHERE dn.t // w.w < mm.n // w.w), "
        "st AS (SELECT w, wid, CAST(SUM(x) AS BIGINT) AS s, "
        "CAST(SUM(x * x) AS BIGINT) AS q FROM ws GROUP BY w, wid), "
        "cm AS (SELECT w, wid, t, "
        "CAST(SUM(x) OVER (PARTITION BY w, wid ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM ws), "
        "yy AS (SELECT cm.w, cm.wid, "
        "cm.w * cm.cum - ((cm.t % cm.w) + 1) * st.s AS y "
        "FROM cm JOIN st ON st.w = cm.w AND st.wid = cm.wid), "
        "rw AS (SELECT w, wid, MAX(y) - MIN(y) AS rs "
        "FROM yy GROUP BY w, wid), "
        "aa AS (SELECT w, wid, w * q - s * s AS a2 FROM st), "
        "rr AS (SELECT rw.w, CAST(ROUND(CAST(rw.rs AS DOUBLE) "
        "/ SQRT(CAST(aa.a2 AS DOUBLE)) * 1e9, 0) AS BIGINT) AS rq "
        "FROM rw JOIN aa ON aa.w = rw.w AND aa.wid = rw.wid "
        "WHERE aa.a2 > 0), "
        "ms AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS nw, "
        "CAST(SUM(rq) AS BIGINT) AS sq FROM rr GROUP BY w), "
        "pts AS (SELECT w, nw, sq, "
        "CAST(ROUND(LN(CAST(w AS DOUBLE)) * 1e12, 0) AS BIGINT) AS u, "
        "CAST(ROUND(LN(CAST(sq AS DOUBLE) / 1e9 / CAST(nw AS DOUBLE)) "
        "* 1e12, 0) AS BIGINT) AS v FROM ms), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k, "
        "CAST(SUM(u) AS HUGEINT) AS su, CAST(SUM(v) AS HUGEINT) AS sv, "
        "SUM(CAST(u AS HUGEINT) * CAST(v AS HUGEINT)) AS suv, "
        "SUM(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS suu FROM pts) "
        "SELECT pts.w AS window, pts.nw AS n_windows, "
        "ROUND(CAST(pts.sq AS DOUBLE) / 1e9 / CAST(pts.nw AS DOUBLE), 6) "
        "AS mean_rs, "
        "ROUND(CAST(m.k * m.suv - m.su * m.sv AS DOUBLE) "
        "/ CAST(m.k * m.suu - m.su * m.su AS DOUBLE), 6) AS hurst "
        "FROM pts, m"
    )
    out["markov_entropy_rate"] = (
        # H = -(1/N) sum n_sd * ln(n_sd/n_s.), terms quantized at 1e12;
        # transition counts exactly as the markov_transitions oracle
        "WITH s AS (SELECT user_id, event_type, "
        "LEAD(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS nxt FROM events), "
        "tr AS (SELECT event_type AS src, nxt AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM s "
        "WHERE nxt IS NOT NULL GROUP BY 1, 2), "
        "rt AS (SELECT src, CAST(SUM(n) AS BIGINT) AS ns "
        "FROM tr GROUP BY src), "
        "tt AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM tr), "
        "q AS (SELECT CAST(ROUND(CAST(tr.n AS DOUBLE) "
        "* LN(CAST(tr.n AS DOUBLE) / CAST(rt.ns AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) AS tq FROM tr JOIN rt ON rt.src = tr.src) "
        "SELECT tt.ntot AS n_transitions, "
        "ROUND(-CAST(SUM(q.tq) AS DOUBLE) / 1e12 "
        "/ CAST(tt.ntot AS DOUBLE), 6) AS entropy_rate_nats "
        "FROM q, tt GROUP BY tt.ntot"
    )
    out["t_closeness"] = (
        # variational distance per QI group with absent langs
        # contributing the global share; 1e12-quantized terms, integer
        # threshold compare (sum_tq > t*2e12) -- mirrors _q_t_closeness
        "WITH c AS (SELECT source, n_chars // 100 AS len_bucket, lang, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2, 3), "
        "lt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nl "
        "FROM c GROUP BY lang), "
        "tt AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot FROM c), "
        "gs AS (SELECT source, len_bucket, CAST(SUM(n) AS BIGINT) AS ng "
        "FROM c GROUP BY 1, 2), "
        "q AS (SELECT gs.source, gs.len_bucket, gs.ng, "
        "CAST(ROUND(ABS(CAST(COALESCE(c.n, 0) AS DOUBLE) "
        "/ CAST(gs.ng AS DOUBLE) "
        "- CAST(lt.nl AS DOUBLE) / CAST(tt.ntot AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) AS tq "
        "FROM gs CROSS JOIN lt CROSS JOIN tt "
        "LEFT JOIN c ON c.source = gs.source "
        "AND c.len_bucket = gs.len_bucket AND c.lang = lt.lang), "
        "g AS (SELECT source, len_bucket, MAX(ng) AS ng, "
        "CAST(SUM(tq) AS BIGINT) AS s FROM q GROUP BY 1, 2), "
        "th AS (SELECT * FROM (VALUES "
        "(0.2, CAST(400000000000 AS BIGINT)), "
        "(0.3, CAST(600000000000 AS BIGINT)), "
        "(0.5, CAST(1000000000000 AS BIGINT))) v(t, ti)), "
        "mx AS (SELECT MAX(s) AS ms FROM g) "
        "SELECT th.t AS t, "
        "CAST(SUM(CASE WHEN g.s > th.ti THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_groups_failing, "
        "CAST(SUM(CASE WHEN g.s > th.ti THEN g.ng ELSE 0 END) AS BIGINT) "
        "AS docs_exposed, "
        "ROUND(CAST(mx.ms AS DOUBLE) / 2e12, 6) AS max_t "
        "FROM th, g, mx GROUP BY th.t, mx.ms"
    )
    out["levene_bf"] = (
        # Brown-Forsythe W with quantile_disc group medians (exact
        # ints), int64/HUGEINT abs-deviation moments, float tail in
        # pinned A/N/R order -- mirrors _q_levene_bf
        "WITH q AS (SELECT l_returnflag AS flag, "
        "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS k FROM lineitem), "
        "md AS (SELECT flag, quantile_disc(k, 0.5) AS med "
        "FROM q GROUP BY flag), "
        "z AS (SELECT q.flag, ABS(q.k - md.med) AS z FROM q "
        "JOIN md ON md.flag = q.flag), "
        "m AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(z) AS BIGINT) AS s1, "
        "CAST(SUM(z * z) AS BIGINT) AS s2 FROM z GROUP BY flag), "
        "f AS (SELECT "
        "a.n AS na, a.s1 AS s1a, a.s2 AS s2a, "
        "b.n AS nn, b.s1 AS s1n, b.s2 AS s2n, "
        "c.n AS nr, c.s1 AS s1r, c.s2 AS s2r, "
        "a.n + b.n + c.n AS ntot "
        "FROM m a, m b, m c "
        "WHERE a.flag = 'A' AND b.flag = 'N' AND c.flag = 'R'), "
        "v AS (SELECT ntot, "
        "CAST(s1a + s1n + s1r AS DOUBLE) / CAST(ntot AS DOUBLE) AS zb, "
        "CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE) AS za, "
        "CAST(s1n AS DOUBLE) / CAST(nn AS DOUBLE) AS zn, "
        "CAST(s1r AS DOUBLE) / CAST(nr AS DOUBLE) AS zr, "
        "na, nn, nr, s1a, s1n, s1r, s2a, s2n, s2r FROM f) "
        "SELECT ntot AS n_total, "
        "(SELECT med FROM md WHERE flag = 'A') AS med_a, "
        "(SELECT med FROM md WHERE flag = 'N') AS med_n, "
        "(SELECT med FROM md WHERE flag = 'R') AS med_r, "
        "ROUND((CAST(ntot - 3 AS DOUBLE) / 2.0) * "
        "((CAST(na AS DOUBLE) * (za - zb) * (za - zb) "
        "+ CAST(nn AS DOUBLE) * (zn - zb) * (zn - zb)) "
        "+ CAST(nr AS DOUBLE) * (zr - zb) * (zr - zb)) "
        "/ ((CAST(s2a AS DOUBLE) "
        "- CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE)) "
        "+ (CAST(s2n AS DOUBLE) "
        "- CAST(s1n AS DOUBLE) * CAST(s1n AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "+ (CAST(s2r AS DOUBLE) "
        "- CAST(s1r AS DOUBLE) * CAST(s1r AS DOUBLE) / CAST(nr AS DOUBLE))"
        "), 6) AS levene_w FROM v"
    )
    out["clark_evans"] = (
        # exact-min NN d2 per point (duplicate coords -> 0), each
        # distance quantized at 1e9 before the sum; naive R (no edge
        # correction), area = 0.9025 like ripley_k; mirrors
        # _q_clark_evans
        "WITH p AS (SELECT event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS px, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS py "
        "FROM events WHERE event_id % 100 = 0), "
        "nn AS (SELECT a.event_id, "
        "MIN((a.px - b.px) * (a.px - b.px) "
        "+ (a.py - b.py) * (a.py - b.py)) AS d2 "
        "FROM p a JOIN p b ON b.event_id <> a.event_id "
        "GROUP BY a.event_id), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(SQRT(d2) * 1e9, 0) AS BIGINT)) AS BIGINT) "
        "AS s FROM nn) "
        "SELECT n AS n_points, "
        "ROUND(CAST(s AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) "
        "AS mean_nn_dist, "
        "ROUND((CAST(s AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)) "
        "/ (0.5 * SQRT(0.9025 / CAST(n AS DOUBLE))), 6) "
        "AS clark_evans_r FROM t"
    )
    out["nn_gfunction"] = (
        # empirical NN-distance CDF at fixed radii, distances
        # 1e9-quantized before the integer comparison -- mirrors
        # _q_nn_gfunction
        "WITH p AS (SELECT event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS px, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS py "
        "FROM events WHERE event_id % 100 = 0), "
        "nn AS (SELECT a.event_id, "
        "MIN((a.px - b.px) * (a.px - b.px) "
        "+ (a.py - b.py) * (a.py - b.py)) AS d2 "
        "FROM p a JOIN p b ON b.event_id <> a.event_id "
        "GROUP BY a.event_id), "
        "q AS (SELECT CAST(ROUND(SQRT(d2) * 1e9, 0) AS BIGINT) AS dq "
        "FROM nn), "
        "r(rq) AS (VALUES "
        + ", ".join(f"({v})" for v in _GFUNC_RADII_Q)
        + ") "
        "SELECT ROUND(CAST(rq AS DOUBLE) / 1e9, 6) AS r, "
        "CAST(SUM(CASE WHEN dq <= rq THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_le, "
        "ROUND(CAST(SUM(CASE WHEN dq <= rq THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS g_hat "
        "FROM r, q GROUP BY rq ORDER BY rq"
    )
    out["gravity_flows"] = (
        # block masses are exact counts; near pairs by Chebyshev
        # block distance <= 4; one float division per pair -- mirrors
        # _q_gravity_flows
        "WITH b AS (SELECT ((event_id % 96) // 8) AS bx, "
        "(((event_id // 96) % 96) // 8) AS by, "
        "CAST(COUNT(*) AS BIGINT) AS m FROM events GROUP BY 1, 2) "
        "SELECT a.by * 12 + a.bx AS cell_a, "
        "c.by * 12 + c.bx AS cell_b, "
        "ROUND(CAST(a.m * c.m AS DOUBLE) "
        "/ CAST((c.bx - a.bx) * (c.bx - a.bx) "
        "+ (c.by - a.by) * (c.by - a.by) AS DOUBLE), 6) AS interaction "
        "FROM b a JOIN b c "
        "ON (a.by * 12 + a.bx) < (c.by * 12 + c.bx) "
        "AND GREATEST(ABS(c.bx - a.bx), ABS(c.by - a.by)) <= 4"
    )
    out["jarque_bera"] = (
        # exact HUGEINT central-moment identities; the n powers cancel
        # so g1 = A3/A2^1.5 and g2 = A4/A2^2 -- mirrors _q_jarque_bera
        "WITH q AS (SELECT l_returnflag AS flag, "
        "CAST(ROUND(l_extendedprice / 100.0, 0) AS BIGINT) AS k "
        "FROM lineitem), "
        "m AS (SELECT flag, CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(k) AS HUGEINT) AS s1, "
        "CAST(SUM(k * k) AS HUGEINT) AS s2, "
        "CAST(SUM(k * k * k) AS HUGEINT) AS s3, "
        "SUM(CAST(k * k AS HUGEINT) * CAST(k * k AS HUGEINT)) AS s4 "
        "FROM q GROUP BY flag), "
        "a AS (SELECT flag, n, n * s2 - s1 * s1 AS a2, "
        "n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1 AS a3, "
        "n * n * n * s4 - 4 * n * n * s3 * s1 "
        "+ 6 * n * s2 * s1 * s1 - 3 * s1 * s1 * s1 * s1 AS a4 FROM m), "
        "g AS (SELECT flag, n, "
        "CAST(a3 AS DOUBLE) / POW(CAST(a2 AS DOUBLE), 1.5) AS g1, "
        "CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) "
        "AS g2 FROM a) "
        "SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n_rows, "
        "ROUND(g1, 6) AS skewness, ROUND(g2, 6) AS kurtosis, "
        "ROUND(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 "
        "+ (g2 - 3.0) * (g2 - 3.0) / 4.0), 6) AS jb_stat FROM g"
    )
    out["cohens_d"] = (
        # pooled-variance effect size from exact int64 group moments;
        # float steps written exactly like _q_cohens_d
        "WITH q AS (SELECT l_returnflag AS flag, "
        "CAST(ROUND(l_extendedprice / 100.0, 0) AS BIGINT) AS k "
        "FROM lineitem WHERE l_returnflag IN ('R', 'N')), "
        "m AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(k) AS BIGINT) AS s1, "
        "CAST(SUM(k * k) AS BIGINT) AS s2 FROM q GROUP BY flag), "
        "v AS (SELECT flag, n, s1, "
        "CAST(n * s2 - s1 * s1 AS DOUBLE) "
        "/ (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var FROM m) "
        "SELECT r.n AS n_returned, o.n AS n_normal, "
        "ROUND((CAST(r.s1 AS DOUBLE) / CAST(r.n AS DOUBLE) "
        "- CAST(o.s1 AS DOUBLE) / CAST(o.n AS DOUBLE)) "
        "/ SQRT((CAST(r.n - 1 AS DOUBLE) * r.var "
        "+ CAST(o.n - 1 AS DOUBLE) * o.var) "
        "/ CAST(r.n + o.n - 2 AS DOUBLE)), 6) AS cohens_d "
        "FROM v r, v o WHERE r.flag = 'R' AND o.flag = 'N'"
    )
    out["durbin_watson"] = (
        # integer residuals against the half-away-rounded mean (DW is
        # shift-invariant); HUGEINT diff/level sums; mirrors
        # _q_durbin_watson
        "WITH c AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS x FROM orders GROUP BY 1), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS tot FROM c), "
        "e AS (SELECT d, x - CAST(ROUND(CAST(t.tot AS DOUBLE) "
        "/ CAST(t.n AS DOUBLE), 0) AS BIGINT) AS e FROM c, t), "
        "e2 AS (SELECT e, LAG(e) OVER (ORDER BY d) AS ep FROM e), "
        "s AS (SELECT SUM(CASE WHEN ep IS NULL THEN 0 "
        "ELSE CAST(e - ep AS HUGEINT) * CAST(e - ep AS HUGEINT) END) "
        "AS num, SUM(CAST(e AS HUGEINT) * CAST(e AS HUGEINT)) AS den "
        "FROM e2) "
        "SELECT t.n AS n_days, "
        "ROUND(CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE), 6) AS dw "
        "FROM s, t"
    )
    out["fractal_boxcount"] = (
        # occupied-box distinct counts per scale, then the quantized
        # log-log OLS slope (HUGEINT moment products; mirrors
        # _q_fractal_boxcount term for term)
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT row, col FROM g WHERE z > -1e30 AND z < 5.0), "
        "n AS (SELECT s.s AS s, CAST(COUNT(DISTINCT "
        "(row // s.s) * 1024 + (col // s.s)) AS BIGINT) AS nb "
        "FROM (VALUES (1), (2), (4), (8), (16)) s(s), v GROUP BY s.s), "
        "q AS (SELECT s, nb, "
        "CAST(ROUND(LN(1.0 / CAST(s AS DOUBLE)) * 1e12, 0) AS BIGINT) "
        "AS u, "
        "CAST(ROUND(LN(CAST(nb AS DOUBLE)) * 1e12, 0) AS BIGINT) AS v "
        "FROM n), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k, "
        "CAST(SUM(u) AS HUGEINT) AS su, CAST(SUM(v) AS HUGEINT) AS sv, "
        "SUM(CAST(u AS HUGEINT) * CAST(v AS HUGEINT)) AS suv, "
        "SUM(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS suu FROM q) "
        "SELECT "
        "(SELECT nb FROM n WHERE s = 1) AS n1, "
        "(SELECT nb FROM n WHERE s = 2) AS n2, "
        "(SELECT nb FROM n WHERE s = 4) AS n4, "
        "(SELECT nb FROM n WHERE s = 8) AS n8, "
        "(SELECT nb FROM n WHERE s = 16) AS n16, "
        "ROUND(CAST(k * suv - su * sv AS DOUBLE) "
        "/ CAST(k * suu - su * su AS DOUBLE), 6) AS box_dim FROM m"
    )
    out["q6_forecast_revenue"] = (
        # mirrors _q_q6_forecast_revenue: same rounded-cents discount
        # band, same 1e-4 revenue quantization per row
        "SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount "
        "* 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_q, "
        "CAST(COUNT(*) AS BIGINT) AS n_items FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND CAST(ROUND(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7 "
        "AND l_quantity < 24"
    )
    out["q10_returned_items"] = (
        # mirrors _q_q10_returned_items (1997-Q3 orders, 'R' lineitems)
        "WITH r AS (SELECT o.o_custkey, "
        "SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, "
        "0) AS BIGINT)) AS revenue_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_returnflag = 'R' "
        "AND o.o_orderdate >= TIMESTAMP '1997-07-01' "
        "AND o.o_orderdate < TIMESTAMP '1997-10-01' "
        "GROUP BY o.o_custkey) "
        "SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name, "
        "n.n_name, CAST(r.revenue_cents AS BIGINT) AS revenue_cents "
        "FROM r JOIN customer c ON r.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "ORDER BY r.revenue_cents DESC, c.c_custkey LIMIT 20"
    )
    out["q13_custdist"] = (
        # mirrors _q_q13_custdist (priority-class exclusion, zero bin
        # via left join)
        "WITH o AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM orders WHERE o_orderpriority <> '5-LOW' "
        "GROUP BY o_custkey), "
        "j AS (SELECT c.c_custkey, COALESCE(o.cnt, 0) AS c_count "
        "FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey) "
        "SELECT CAST(c_count AS BIGINT) AS c_count, "
        "CAST(COUNT(*) AS BIGINT) AS custdist FROM j GROUP BY c_count "
        "ORDER BY custdist DESC, c_count DESC"
    )
    out["q15_top_supplier"] = (
        # mirrors _q_q15_top_supplier (1997-Q1 revenue view + max
        # scalar subquery, ties kept)
        "WITH r AS (SELECT l_suppkey, "
        "SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0) "
        "AS BIGINT)) AS total_cents FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) "
        "SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, "
        "CAST(r.total_cents AS BIGINT) AS total_cents "
        "FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey "
        "WHERE r.total_cents = (SELECT MAX(total_cents) FROM r) "
        "ORDER BY s.s_suppkey"
    )
    out["q9_product_profit"] = (
        # mirrors _q_q9_product_profit ('red' parts, retail*qty cost
        # proxy, per-row cent rounding on both terms)
        "WITH j AS (SELECT s.s_nationkey, "
        "YEAR(o.o_orderdate) AS yr, "
        "CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) "
        "AS BIGINT) - CAST(ROUND(p.p_retailprice * l.l_quantity * 100, "
        "0) AS BIGINT) AS amt "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "WHERE p.p_name LIKE '%red%') "
        "SELECT n.n_name, CAST(j.yr AS BIGINT) AS yr, "
        "CAST(SUM(j.amt) AS BIGINT) AS profit_cents "
        "FROM j JOIN nation n ON j.s_nationkey = n.n_nationkey "
        "GROUP BY n.n_name, j.yr ORDER BY n.n_name, j.yr DESC"
    )
    out["q11_important_parts"] = (
        # mirrors _q_q11_important_parts (nation-7 suppliers, 1/1000
        # integer cross-multiplied threshold)
        "WITH v AS (SELECT l.l_partkey, "
        "SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) "
        "AS value_cents FROM lineitem l "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "WHERE s.s_nationkey = 7 GROUP BY l.l_partkey) "
        "SELECT CAST(l_partkey AS BIGINT) AS p_partkey, "
        "CAST(value_cents AS BIGINT) AS value_cents FROM v "
        "WHERE value_cents * (SELECT COUNT(*) FROM v) "
        "> 3 * (SELECT SUM(value_cents) FROM v) "
        "ORDER BY value_cents DESC, l_partkey"
    )
    out["q12_late_shipments"] = (
        # mirrors _q_q12_late_shipments (>= 60-day ship delay, 1997,
        # linestatus standing in for shipmode)
        "SELECT l.l_linestatus, "
        "CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY "
        "GROUP BY l.l_linestatus ORDER BY l.l_linestatus"
    )
    out["q16_supplier_cnt"] = (
        # mirrors _q_q16_supplier_cnt (lineitem pairs as partsupp,
        # Brand#5 exclusion, eight sizes, acctbal complaints filter)
        "WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey "
        "FROM lineitem), "
        "f AS (SELECT p.p_brand, p.p_type, p.p_size, pr.l_suppkey "
        "FROM pairs pr JOIN part p ON pr.l_partkey = p.p_partkey "
        "JOIN supplier s ON pr.l_suppkey = s.s_suppkey "
        "WHERE p.p_brand <> 'Brand#5' "
        "AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49) "
        "AND s.s_acctbal >= 100.0) "
        "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM f GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20"
    )
    out["q18_large_orders"] = (
        # mirrors _q_q18_large_orders (sum(qty) > 300, top 10 by
        # totalprice cents)
        "WITH s AS (SELECT l_orderkey, "
        "CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) "
        "AS total_qty FROM lineitem GROUP BY l_orderkey "
        "HAVING SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) > 300) "
        "SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey, "
        "CAST(o.o_orderkey AS BIGINT) AS o_orderkey, "
        "CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS price_cents, "
        "s.total_qty "
        "FROM s JOIN orders o ON s.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "ORDER BY price_cents DESC, o.o_orderkey LIMIT 10"
    )
    out["q20_part_promotion"] = (
        # mirrors _q_q20_part_promotion ('red' parts, 1997, > 60 units
        # of some part)
        "WITH red AS (SELECT p_partkey FROM part "
        "WHERE p_name LIKE '%red%'), "
        "sq AS (SELECT l.l_suppkey, l.l_partkey, "
        "SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS q "
        "FROM lineitem l JOIN red r ON l.l_partkey = r.p_partkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l.l_suppkey, l.l_partkey) "
        "SELECT s.s_name, CAST(s.s_nationkey AS BIGINT) AS s_nationkey "
        "FROM supplier s WHERE EXISTS (SELECT 1 FROM sq "
        "WHERE sq.l_suppkey = s.s_suppkey AND sq.q > 60) "
        "ORDER BY s.s_name"
    )
    out["q21_waiting_suppliers"] = (
        # mirrors _q_q21_waiting_suppliers ((sk+1)*late - 1 argmax,
        # suppkey 0 is real)
        "WITH ls AS (SELECT l.l_orderkey AS ok, l.l_suppkey AS sk, "
        "MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY "
        "THEN 1 ELSE 0 END) AS late "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderstatus = 'F' GROUP BY 1, 2), "
        "pero AS (SELECT ok, COUNT(*) AS n_supp, SUM(late) AS n_late, "
        "MAX((sk + 1) * late) - 1 AS late_sk FROM ls GROUP BY ok) "
        "SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
        "FROM pero p JOIN supplier s ON p.late_sk = s.s_suppkey "
        "WHERE p.n_supp > 1 AND p.n_late = 1 "
        "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 10"
    )
    out["q22_global_sales_opp"] = (
        # mirrors _q_q22_global_sales_opp (integer cross-multiplied
        # positive-balance average, no-recent-orders anti-join)
        "WITH sel AS (SELECT c_custkey, c_nationkey, "
        "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c "
        "FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)), "
        "pos AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(bal_c) AS BIGINT) AS tot FROM sel WHERE bal_c > 0), "
        "q AS (SELECT sel.c_nationkey, sel.bal_c FROM sel, pos "
        "WHERE sel.bal_c * pos.n > pos.tot AND NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = sel.c_custkey "
        "AND o.o_orderdate >= TIMESTAMP '1999-01-01')) "
        "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
        "CAST(COUNT(*) AS BIGINT) AS numcust, "
        "CAST(SUM(bal_c) AS BIGINT) AS totacctbal_cents FROM q "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    )
    out["cohort_ltv"] = (
        # mirrors _q_cohort_ltv (first-seen-day cohorts, purchase
        # cents, cumulative by age)
        "WITH d AS (SELECT user_id, "
        "DATEDIFF('day', TIMESTAMP '2024-01-01', ts) AS day, "
        "CASE WHEN event_type = 'purchase' "
        "THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END AS c "
        "FROM events), "
        "f AS (SELECT user_id, MIN(day) AS cd FROM d GROUP BY user_id), "
        "a AS (SELECT f.cd AS cohort_day, d.day - f.cd AS age, "
        "SUM(d.c) AS rev FROM d JOIN f ON d.user_id = f.user_id "
        "GROUP BY 1, 2 HAVING SUM(d.c) <> 0) "
        "SELECT CAST(cohort_day AS BIGINT) AS cohort_day, "
        "CAST(age AS BIGINT) AS age, "
        "CAST(SUM(rev) OVER (PARTITION BY cohort_day ORDER BY age) "
        "AS BIGINT) AS cum_revenue_cents "
        "FROM a ORDER BY cohort_day, age"
    )
    out["common_paths"] = (
        # mirrors _q_common_paths (first three events per user)
        "WITH r AS (SELECT user_id, event_type, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events), "
        "p AS (SELECT user_id, "
        "STRING_AGG(event_type, '>' ORDER BY rn) AS path "
        "FROM r WHERE rn <= 3 GROUP BY user_id) "
        "SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "GROUP BY path ORDER BY n DESC, path LIMIT 15"
    )
    out["type_user_jaccard"] = (
        # mirrors _q_type_user_jaccard (distinct-pair dedup, exact
        # integer intersection/union)
        "WITH p AS (SELECT DISTINCT event_type, user_id FROM events), "
        "t AS (SELECT event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY event_type), "
        "i AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_inter "
        "FROM p a JOIN p b ON a.user_id = b.user_id "
        "AND a.event_type < b.event_type GROUP BY 1, 2) "
        "SELECT i.type_a, i.type_b, i.n_inter, "
        "ta.n + tb.n - i.n_inter AS n_union, "
        "ROUND(CAST(i.n_inter AS DOUBLE) "
        "/ CAST(ta.n + tb.n - i.n_inter AS DOUBLE), 6) AS jaccard "
        "FROM i JOIN t ta ON i.type_a = ta.event_type "
        "JOIN t tb ON i.type_b = tb.event_type "
        "ORDER BY i.type_a, i.type_b"
    )

    out["kmv_distinct"] = (
        # mirrors _q_kmv_distinct (bottom-64 distinct mix32 hashes,
        # all-integer estimator; groups under 64 distinct fall back to
        # their exact captured count)
        "WITH h AS (SELECT DISTINCT event_type, "
        f"{_m32('user_id', 31)} AS hv FROM events), "
        "r AS (SELECT event_type, hv, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY hv) AS rn FROM h), "
        "k AS (SELECT event_type, hv AS kth FROM r WHERE rn = 64), "
        "t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(MAX(hv) AS BIGINT) AS maxh FROM h GROUP BY event_type) "
        "SELECT t.event_type, "
        "CAST(COALESCE(k.kth, t.maxh) AS BIGINT) AS kth_hash, "
        "CAST(CASE WHEN k.kth IS NULL THEN t.n "
        "ELSE (63 * 4294967296) // k.kth END AS BIGINT) AS est_distinct "
        "FROM t LEFT JOIN k ON k.event_type = t.event_type "
        "ORDER BY t.event_type"
    )
    out["ams_f2"] = (
        # mirrors _q_ams_f2 (8 sign streams mix32(user_id + r, 100),
        # integer-exact throughout)
        "WITH s AS (SELECT t.r, CAST(COUNT(*) "
        f"- 2 * SUM({_m32('user_id + t.r', 100)} & 1) AS BIGINT) "
        "AS sign_sum FROM events CROSS JOIN range(8) t(r) GROUP BY t.r), "
        "x AS (SELECT r, sign_sum, sign_sum * sign_sum AS x FROM s), "
        "e AS (SELECT CAST(SUM(x) // 8 AS BIGINT) AS est_f2 FROM x), "
        "f AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM "
        "(SELECT COUNT(*) AS c FROM events GROUP BY user_id)) "
        "SELECT CAST(x.r AS BIGINT) AS r, x.sign_sum, "
        "CAST(x.x AS BIGINT) AS x, e.est_f2, f.exact_f2 "
        "FROM x, e, f ORDER BY x.r"
    )
    out["max_drawdown"] = (
        # mirrors _q_max_drawdown (runmax(P) - P over the signed
        # balance, exact int64 window scans)
        "WITH d AS (SELECT user_id, ts, event_id, "
        "CASE WHEN event_id % 2 = 0 "
        "THEN CAST(ROUND(value * 100, 0) AS BIGINT) "
        "ELSE -CAST(ROUND(value * 100, 0) AS BIGINT) END AS delta "
        "FROM events) "
        "SELECT user_id, "
        "CAST(MAX(pk - pre) AS BIGINT) AS max_drawdown, "
        "CAST(MAX(pre) AS BIGINT) AS peak, "
        "CAST(SUM(delta) AS BIGINT) AS final "
        "FROM (SELECT user_id, delta, pre, "
        "MAX(pre) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS pk FROM "
        "(SELECT user_id, ts, event_id, delta, "
        "SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS pre FROM d)) "
        "GROUP BY user_id ORDER BY user_id"
    )
    out["class_balance_sample"] = (
        # mirrors _q_class_balance_sample (bottom-min-class-count per
        # lang by mix32(doc_id, 77))
        "WITH h AS (SELECT lang, doc_id, "
        f"{_m32('doc_id', 77)} AS hv FROM documents), "
        "m AS (SELECT MIN(n) AS mn FROM "
        "(SELECT COUNT(*) AS n FROM documents GROUP BY lang)), "
        "r AS (SELECT lang, doc_id, "
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv) AS rn FROM h) "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept, "
        "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
        "FROM r, m WHERE r.rn <= m.mn GROUP BY lang ORDER BY lang"
    )
    out["position_attribution"] = (
        # mirrors _q_position_attribution (U-shaped 40/20/40 in exact
        # millionths, remainder on the first middle touch)
        "WITH e AS (SELECT user_id, ts, event_id, event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "tp AS (SELECT p.user_id, p.event_id AS pid, p.c, "
        "t.event_type AS tt, "
        "ROW_NUMBER() OVER (PARTITION BY p.user_id, p.event_id "
        "ORDER BY t.ts, t.event_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY p.user_id, p.event_id) AS m "
        "FROM e p JOIN e t ON t.user_id = p.user_id "
        "AND t.ts >= p.ts - INTERVAL 24 HOUR "
        "AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id)) "
        "WHERE p.event_type = 'purchase'), "
        "wt AS (SELECT tt, c, CASE "
        "WHEN m = 1 THEN 1000000 "
        "WHEN m = 2 THEN 500000 "
        "WHEN rn = 1 OR rn = m THEN 400000 "
        "WHEN rn = 2 THEN 200000 // (m - 2) + 200000 % (m - 2) "
        "ELSE 200000 // (m - 2) END AS w FROM tp) "
        "SELECT tt AS event_type, "
        "CAST(SUM(c * w) AS BIGINT) AS credit_q "
        "FROM wt GROUP BY tt ORDER BY tt"
    )
    out["kmv_set_ops"] = (
        # mirrors _q_kmv_set_ops (merged bottom-64 union sketch +
        # shared-hash inclusion, all-integer estimators)
        "WITH ty AS (SELECT DISTINCT event_type FROM events), "
        "p AS (SELECT a.event_type AS ta, b.event_type AS tb "
        "FROM ty a JOIN ty b ON a.event_type < b.event_type), "
        "h AS (SELECT DISTINCT event_type, user_id, "
        f"{_m32('user_id', 31)} AS hv FROM events), "
        "u AS (SELECT p.ta, p.tb, h.user_id, MAX(h.hv) AS hv, "
        "MAX(CASE WHEN h.event_type = p.ta THEN 1 ELSE 0 END) AS ina, "
        "MAX(CASE WHEN h.event_type = p.tb THEN 1 ELSE 0 END) AS inb "
        "FROM p JOIN h ON h.event_type IN (p.ta, p.tb) "
        "GROUP BY p.ta, p.tb, h.user_id), "
        "r AS (SELECT ta, tb, hv, ina, inb, "
        "ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn, "
        "COUNT(*) OVER (PARTITION BY ta, tb) AS cnt FROM u), "
        "t AS (SELECT ta, tb, MAX(cnt) AS cnt, "
        "LEAST(MAX(cnt), 64) AS kk, "
        "MAX(CASE WHEN rn = LEAST(64, cnt) THEN hv END) AS kth, "
        "SUM(CASE WHEN rn <= 64 AND ina = 1 AND inb = 1 "
        "THEN 1 ELSE 0 END) AS nboth FROM r GROUP BY ta, tb) "
        "SELECT ta AS type_a, tb AS type_b, "
        "CAST(CASE WHEN cnt >= 64 THEN (63 * 4294967296) // kth "
        "ELSE cnt END AS BIGINT) AS est_union, "
        "CAST(nboth AS BIGINT) AS n_both, "
        "CAST((nboth * (CASE WHEN cnt >= 64 "
        "THEN (63 * 4294967296) // kth ELSE cnt END)) // kk "
        "AS BIGINT) AS est_inter "
        "FROM t ORDER BY ta, tb"
    )
    out["granger_daily"] = (
        # mirrors _q_granger_daily (exact int64 moments, Cramer
        # determinants as BIGINT, pinned shared-float F / R^2)
        "WITH d AS (SELECT DATEDIFF('day', TIMESTAMP '2024-01-01', ts) "
        "AS day, SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
        "END) AS y, SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 "
        "END) AS x FROM events GROUP BY 1), "
        "sp AS (SELECT UNNEST(RANGE((SELECT MIN(day) FROM d), "
        "(SELECT MAX(day) FROM d) + 1)) AS day), "
        "f AS (SELECT sp.day, COALESCE(d.y, 0) AS y, "
        "COALESCE(d.x, 0) AS x FROM sp LEFT JOIN d USING (day)), "
        "l AS (SELECT y, LAG(y) OVER (ORDER BY day) AS y1, "
        "LAG(x) OVER (ORDER BY day) AS x1 FROM f), "
        "mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y1) AS BIGINT) AS s1, CAST(SUM(x1) AS BIGINT) AS s2, "
        "CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(y1 * y1) AS BIGINT) AS s11, "
        "CAST(SUM(x1 * x1) AS BIGINT) AS s22, "
        "CAST(SUM(y1 * x1) AS BIGINT) AS s12, "
        "CAST(SUM(y1 * y) AS BIGINT) AS s1y, "
        "CAST(SUM(x1 * y) AS BIGINT) AS s2y, "
        "CAST(SUM(y * y) AS BIGINT) AS syy "
        "FROM l WHERE y1 IS NOT NULL), "
        "dets AS (SELECT n, sy, s1y, s2y, syy, s1, s11, "
        "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) "
        "+ s2 * (s1 * s12 - s11 * s2) AS d0, "
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) "
        "+ s2 * (s1y * s12 - s11 * s2y) AS db0, "
        "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) "
        "+ s2 * (s1 * s2y - s1y * s2) AS db1, "
        "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) "
        "+ sy * (s1 * s12 - s11 * s2) AS db2 FROM mm), "
        "fl AS (SELECT n, "
        "CAST(syy AS DOUBLE) - ("
        "(CAST(db0 AS DOUBLE) / CAST(d0 AS DOUBLE)) * CAST(sy AS DOUBLE) "
        "+ (CAST(db1 AS DOUBLE) / CAST(d0 AS DOUBLE)) * CAST(s1y AS DOUBLE) "
        "+ (CAST(db2 AS DOUBLE) / CAST(d0 AS DOUBLE)) * CAST(s2y AS DOUBLE)"
        ") AS ssr_u, "
        "CAST(syy AS DOUBLE) - ("
        "((CAST(sy AS DOUBLE) - (CAST(n * s1y - s1 * sy AS DOUBLE) "
        "/ CAST(n * s11 - s1 * s1 AS DOUBLE)) * CAST(s1 AS DOUBLE)) "
        "/ CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE) "
        "+ (CAST(n * s1y - s1 * sy AS DOUBLE) "
        "/ CAST(n * s11 - s1 * s1 AS DOUBLE)) * CAST(s1y AS DOUBLE)"
        ") AS ssr_r, "
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) "
        "/ CAST(n AS DOUBLE) AS sst FROM dets) "
        "SELECT CAST(n AS BIGINT) AS n_days, "
        "ROUND((ssr_r - ssr_u) * CAST(n - 3 AS DOUBLE) / ssr_u, 6) "
        "AS f_stat, ROUND(ssr_r, 6) AS ssr_r, ROUND(ssr_u, 6) AS ssr_u, "
        "ROUND(1.0 - ssr_u / sst, 6) AS r2_u FROM fl"
    )
    out["pacf_lags"] = (
        # mirrors _q_pacf_lags (acf_lags moments + unrolled
        # Durbin-Levinson chain, pinned float order)
        "WITH c0 AS (SELECT epoch_us(ts) // 3600000000 AS hr, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi, "
        "CAST(MAX(hr) - MIN(hr) + 1 AS BIGINT) AS n FROM c0), "
        "tot AS (SELECT CAST(SUM(x) AS BIGINT) AS s, "
        "CAST(SUM(x * x) AS BIGINT) AS q FROM c0), "
        "pr AS (SELECT l.h AS h, "
        "CAST(SUM(CASE WHEN b.hr IS NOT NULL THEN a.x * b.x "
        "ELSE 0 END) AS BIGINT) AS p, "
        "CAST(SUM(CASE WHEN a.hr <= mm.hi - l.h THEN a.x ELSE 0 END) "
        "AS BIGINT) AS sa, "
        "CAST(SUM(CASE WHEN a.hr >= mm.lo + l.h THEN a.x ELSE 0 END) "
        "AS BIGINT) AS sb "
        "FROM (VALUES (1), (2), (3)) l(h) "
        "CROSS JOIN mm CROSS JOIN c0 a "
        "LEFT JOIN c0 b ON b.hr = a.hr + l.h GROUP BY l.h), "
        "f AS (SELECT pr.h, pr.p, pr.sa, pr.sb, mm.n, tot.s, tot.q, "
        "CAST(tot.s AS DOUBLE) / CAST(mm.n AS DOUBLE) AS mu "
        "FROM pr, mm, tot), "
        f"rr AS (SELECT h, {_rho} AS rho FROM f), "
        "pv AS (SELECT MAX(CASE WHEN h = 1 THEN rho END) AS r1, "
        "MAX(CASE WHEN h = 2 THEN rho END) AS r2, "
        "MAX(CASE WHEN h = 3 THEN rho END) AS r3 FROM rr), "
        "dl AS (SELECT r1 AS p11, "
        "(r2 - r1 * r1) / (1.0 - r1 * r1) AS p22, "
        "r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1 AS p21, "
        "r1, r2, r3 FROM pv), "
        "dl2 AS (SELECT p11, p22, "
        "(r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2) "
        "AS p33 FROM dl) "
        "SELECT CAST(1 AS BIGINT) AS lag, ROUND(p11, 6) AS pacf FROM dl2 "
        "UNION ALL SELECT CAST(2 AS BIGINT), ROUND(p22, 6) FROM dl2 "
        "UNION ALL SELECT CAST(3 AS BIGINT), ROUND(p33, 6) FROM dl2 "
        "ORDER BY lag"
    )
    out["best_split_stump"] = (
        # mirrors _q_best_split_stump (cumulative class counts, one
        # shared float score, smaller-threshold tie-break)
        "WITH c AS (SELECT n_chars AS t, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS e FROM documents GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, "
        "CAST(SUM(e) AS BIGINT) AS et FROM c), "
        "w AS (SELECT t, SUM(n) OVER (ORDER BY t) AS nl, "
        "SUM(e) OVER (ORDER BY t) AS el FROM c), "
        "sc AS (SELECT t, nl, nt - nl AS nr, el, et - el AS er "
        "FROM w, tot WHERE nl < nt) "
        "SELECT CAST(t AS BIGINT) AS threshold, "
        "CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right, "
        "ROUND(CAST(el * el + (nl - el) * (nl - el) AS DOUBLE) "
        "/ CAST(nl AS DOUBLE) "
        "+ CAST(er * er + (nr - er) * (nr - er) AS DOUBLE) "
        "/ CAST(nr AS DOUBLE), 6) AS score "
        "FROM sc ORDER BY CAST(el * el + (nl - el) * (nl - el) AS DOUBLE) "
        "/ CAST(nl AS DOUBLE) "
        "+ CAST(er * er + (nr - er) * (nr - er) AS DOUBLE) "
        "/ CAST(nr AS DOUBLE) DESC, t LIMIT 1"
    )
    out["js_divergence"] = (
        # mirrors _q_js_divergence (per-char terms quantized at 1e12,
        # exact cross-char sums)
        "WITH ch AS (SELECT source, u.c AS c, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents, UNNEST(string_split(text, '')) u(c) "
        "GROUP BY 1, 2), "
        "t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot "
        "FROM ch GROUP BY 1), "
        "p AS (SELECT a.source AS sa, b.source AS sb FROM t a "
        "JOIN t b ON a.source < b.source), "
        "cc AS (SELECT DISTINCT c FROM ch), "
        "j AS (SELECT p.sa, p.sb, cc.c, "
        "COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb "
        "FROM p CROSS JOIN cc "
        "LEFT JOIN ch ca ON ca.source = p.sa AND ca.c = cc.c "
        "LEFT JOIN ch cb ON cb.source = p.sb AND cb.c = cc.c "
        "WHERE COALESCE(ca.n, 0) + COALESCE(cb.n, 0) > 0), "
        "f AS (SELECT j.sa, j.sb, j.na, j.nb, ta.tot AS tta, "
        "tb.tot AS ttb FROM j JOIN t ta ON ta.source = j.sa "
        "JOIN t tb ON tb.source = j.sb), "
        "terms AS (SELECT sa, sb, "
        f"CASE WHEN na > 0 THEN CAST(ROUND({_pa_expr} "
        f"* LN({_pa_expr} / {_m_expr}) * 1e12, 0) AS BIGINT) "
        "ELSE 0 END AS qa, "
        f"CASE WHEN nb > 0 THEN CAST(ROUND({_pb_expr} "
        f"* LN({_pb_expr} / {_m_expr}) * 1e12, 0) AS BIGINT) "
        "ELSE 0 END AS qb FROM f) "
        "SELECT sa AS source_a, sb AS source_b, "
        "ROUND(0.5 * (CAST(SUM(qa) AS DOUBLE) / 1e12) "
        "+ 0.5 * (CAST(SUM(qb) AS DOUBLE) / 1e12), 6) AS js "
        "FROM terms GROUP BY 1, 2 ORDER BY 1, 2"
    )
    out["pr_curve"] = (
        # mirrors _q_pr_curve (descending-threshold cumulative
        # confusion counts, shared float metric expressions)
        "WITH c AS (SELECT n_chars AS t, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS pos FROM documents GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, "
        "CAST(SUM(pos) AS BIGINT) AS pt FROM c), "
        "w AS (SELECT t, SUM(pos) OVER (ORDER BY t DESC) AS tp, "
        "SUM(n) OVER (ORDER BY t DESC) AS pp FROM c), "
        "k AS (SELECT t, tp, pp - tp AS fp, pt - tp AS fn, "
        "nt - pp - (pt - tp) AS tn, pp, pt FROM w, tot) "
        "SELECT CAST(t AS BIGINT) AS threshold, "
        "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
        "CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn, "
        "ROUND(CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE), 6) AS prec, "
        "ROUND(CAST(tp AS DOUBLE) / CAST(pt AS DOUBLE), 6) AS rec, "
        "ROUND(2.0 * CAST(tp AS DOUBLE) "
        "/ CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1, "
        "ROUND(CASE WHEN SQRT(CAST((tp + fp) * (tp + fn) AS DOUBLE) "
        "* CAST((tn + fp) * (tn + fn) AS DOUBLE)) = 0.0 THEN 0.0 "
        "ELSE CAST(tp * tn - fp * fn AS DOUBLE) "
        "/ SQRT(CAST((tp + fp) * (tp + fn) AS DOUBLE) "
        "* CAST((tn + fp) * (tn + fn) AS DOUBLE)) END, 6) AS mcc "
        "FROM k ORDER BY threshold DESC"
    )
    out["viterbi_decode"] = (
        # mirrors _q_viterbi_decode (integer max-sum DP, one GREATEST
        # chain per state per step)
        "WITH RECURSIVE e AS (SELECT user_id, event_type, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events), "
        "mx AS (SELECT user_id, MAX(rn) AS n FROM e GROUP BY 1), "
        f"dp AS (SELECT user_id, rn, {_vbase} FROM e WHERE rn = 1 "
        "UNION ALL "
        f"SELECT e.user_id, e.rn, {_vstep} "
        "FROM dp JOIN e ON e.user_id = dp.user_id AND e.rn = dp.rn + 1) "
        f"SELECT dp.user_id, CAST({_vbest} AS BIGINT) AS best_score, "
        f"{_vcase} AS best_state "
        "FROM dp JOIN mx ON mx.user_id = dp.user_id AND mx.n = dp.rn "
        "ORDER BY dp.user_id"
    )
    out["zonal_median"] = (
        # mirrors _q_zonal_median (quantile_disc rank convention)
        "WITH p AS ("
        + " UNION ALL ".join(
            f"SELECT '{pid}' AS polygon_id, z FROM ({grid}) "
            f"WHERE z > -1e30 AND {_halfplane_sql(poly)}"
            for pid, poly in OG_POLYGONS.items()
        )
        + ") "
        + " UNION ALL ".join(
            f"SELECT polygon_id, {q} AS q, "
            f"QUANTILE_DISC(z, {q}) AS value FROM p GROUP BY polygon_id"
            for q in (0.25, 0.5, 0.75)
        )
        + " ORDER BY polygon_id, q"
    )
    out["huff_model"] = (
        # mirrors _q_huff_model (top-8 stores, 1e9-quantized
        # attraction terms, exact per-origin sums)
        "WITH b AS (SELECT ((event_id % 96) // 8) AS bx, "
        "(((event_id // 96) % 96) // 8) AS by, "
        "CAST(COUNT(*) AS BIGINT) AS m FROM events GROUP BY 1, 2), "
        "k AS (SELECT by * 12 + bx AS key, bx, by, m FROM b), "
        "s AS (SELECT key AS skey, bx AS sbx, by AS sby, m AS sm "
        "FROM k ORDER BY m DESC, key LIMIT 8), "
        "x AS (SELECT k.key AS origin_cell, s.skey AS store_cell, "
        "CAST(ROUND(CAST(s.sm AS DOUBLE) "
        "/ CAST((k.bx - s.sbx) * (k.bx - s.sbx) "
        "+ (k.by - s.sby) * (k.by - s.sby) + 1 AS DOUBLE) "
        "* 1e9, 0) AS BIGINT) AS q FROM k CROSS JOIN s) "
        "SELECT CAST(origin_cell AS BIGINT) AS origin_cell, "
        "CAST(store_cell AS BIGINT) AS store_cell, "
        "ROUND(CAST(q AS DOUBLE) / CAST(SUM(q) OVER "
        "(PARTITION BY origin_cell) AS DOUBLE), 6) AS prob "
        "FROM x ORDER BY origin_cell, store_cell"
    )
    out["mahalanobis_outliers"] = (
        # mirrors _q_mahalanobis_outliers (exact int64 moments, pinned
        # shared-float quadratic form)
        "WITH e AS (SELECT event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS x, "
        "(epoch_us(ts) // 3600000000) % 24 AS y FROM events), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(y * y) AS BIGINT) AS syy, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM e), "
        "f0 AS (SELECT n, sxx, syy, sxy, "
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx, "
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my FROM m), "
        "f AS (SELECT mx, my, "
        "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - mx * mx AS cxx, "
        "CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - my * my AS cyy, "
        "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - mx * my AS cxy "
        "FROM f0), "
        "g AS (SELECT mx, my, cxx, cyy, cxy, "
        "cxx * cyy - cxy * cxy AS det FROM f), "
        "d AS (SELECT e.event_id, "
        "(g.cyy * (CAST(e.x AS DOUBLE) - g.mx) "
        "* (CAST(e.x AS DOUBLE) - g.mx) "
        "- 2.0 * g.cxy * (CAST(e.x AS DOUBLE) - g.mx) "
        "* (CAST(e.y AS DOUBLE) - g.my) "
        "+ g.cxx * (CAST(e.y AS DOUBLE) - g.my) "
        "* (CAST(e.y AS DOUBLE) - g.my)) / g.det AS d2 FROM e, g) "
        "SELECT event_id, ROUND(d2, 6) AS d2 FROM d "
        "ORDER BY d2 DESC, event_id LIMIT 20"
    )
    out["rendezvous_hashing"] = (
        # mirrors _q_rendezvous_hashing (argmax of 16 bijective
        # mix32 weights per doc)
        "WITH a AS (SELECT doc_id, t.n AS node, "
        f"{_m32('doc_id * 16 + t.n', 9)} AS hv "
        "FROM documents CROSS JOIN range(16) t(n)), "
        "r AS (SELECT doc_id, node, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY hv DESC, node) AS rn FROM a) "
        "SELECT CAST(node AS BIGINT) AS node, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
        "FROM r WHERE rn = 1 GROUP BY node ORDER BY node"
    )
    out["merkle_checksums"] = (
        # mirrors _q_merkle_checksums (order-free leaf sums, mix32
        # parent chain seeded by level)
        "WITH "
        + ", ".join(_mk_levels)
        + " "
        + " UNION ALL ".join(
            f"SELECT CAST({lv} AS BIGINT) AS level, "
            f"CAST(idx AS BIGINT) AS idx, h AS hash FROM l{lv}"
            for lv in range(5)
        )
        + " ORDER BY level, idx"
    )
    out["anderson_darling"] = (
        # mirrors _q_anderson_darling (per-bin rank-weight identities,
        # 1e6-quantized ln-CDF terms)
        "WITH c AS (SELECT event_type, "
        "(epoch_us(ts) // 3600000000) % 24 AS h, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "w AS (SELECT event_type, h, c, "
        "SUM(c) OVER (PARTITION BY event_type ORDER BY h) AS b, "
        "SUM(c) OVER (PARTITION BY event_type) AS n FROM c), "
        "t AS (SELECT event_type, n, "
        "b * b - (b - c) * (b - c) AS w1, "
        "(n - b + c) * (n - b + c) - (n - b) * (n - b) AS w2, "
        "CAST(ROUND(LN((CAST(h AS DOUBLE) + 0.5) / 24.0) * 1e6, 0) "
        "AS BIGINT) AS q1, "
        "CAST(ROUND(LN(1.0 - (CAST(h AS DOUBLE) + 0.5) / 24.0) * 1e6, 0) "
        "AS BIGINT) AS q2 FROM w) "
        "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, "
        "ROUND(-CAST(MAX(n) AS DOUBLE) "
        "- (CAST(SUM(w1 * q1 + w2 * q2) AS DOUBLE) / 1e6) "
        "/ CAST(MAX(n) AS DOUBLE), 6) AS a2 "
        "FROM t GROUP BY event_type ORDER BY event_type"
    )
    out["cuped_adjust"] = (
        # mirrors _q_cuped_adjust (pooled exact moments, pinned theta
        # / adjusted-mean float chain)
        "WITH pu AS (SELECT user_id, "
        "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS x, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' "
        "THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END) "
        "AS BIGINT) AS y FROM events GROUP BY user_id), "
        "a AS (SELECT "
        f"({_m32('user_id', 13)}) % 2 AS arm, "
        "CAST(COUNT(*) AS BIGINT) AS na, CAST(SUM(x) AS BIGINT) AS sxa, "
        "CAST(SUM(y) AS BIGINT) AS sya FROM pu GROUP BY 1), "
        "g0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(y * y) AS BIGINT) AS syy, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM pu), "
        "g1 AS (SELECT n, sxx, syy, sxy, "
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mux, "
        "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS muy FROM g0), "
        "g2 AS (SELECT mux, muy, "
        "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - mux * mux AS varx, "
        "CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - muy * muy AS vary, "
        "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - mux * muy AS covxy "
        "FROM g1), "
        "g AS (SELECT mux, covxy / varx AS theta, "
        "1.0 - (covxy * covxy) / (varx * vary) AS var_ratio FROM g2) "
        "SELECT CAST(a.arm AS BIGINT) AS arm, a.na AS n_users, "
        "ROUND(CAST(a.sya AS DOUBLE) / CAST(a.na AS DOUBLE), 6) "
        "AS mean_y, "
        "ROUND((CAST(a.sya AS DOUBLE) - g.theta "
        "* (CAST(a.sxa AS DOUBLE) - CAST(a.na AS DOUBLE) * g.mux)) "
        "/ CAST(a.na AS DOUBLE), 6) AS mean_adj, "
        "ROUND(g.theta, 6) AS theta, ROUND(g.var_ratio, 6) AS var_ratio "
        "FROM a, g ORDER BY a.arm"
    )
    out["gumbel_daily_max"] = (
        # mirrors _q_gumbel_daily_max (method of moments on exact
        # daily-max cents)
        "WITH d AS (SELECT DATEDIFF('day', TIMESTAMP '2024-01-01', ts) "
        "AS day, MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS mx "
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(mx) AS BIGINT) AS s1, "
        "CAST(SUM(mx * mx) AS BIGINT) AS s2 FROM d), "
        "f0 AS (SELECT n, s2, "
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM m), "
        "f1 AS (SELECT n, mean, "
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean AS var "
        "FROM f0), "
        "f2 AS (SELECT n, mean, "
        "SQRT(var) * SQRT(6.0) / PI() AS scale FROM f1), "
        "f3 AS (SELECT n, scale, "
        "mean - 0.5772156649015329 * scale AS loc FROM f2) "
        "SELECT CAST(n AS BIGINT) AS n_days, ROUND(loc, 6) AS loc, "
        "ROUND(scale, 6) AS scale, "
        "ROUND(loc - scale * LN(-LN(1.0 - 1.0 / 100.0)), 6) AS ret100 "
        "FROM f3"
    )
    out["wasserstein_hours"] = (
        # mirrors _q_wasserstein_hours (cleared-denominator exact
        # int64 CDF-gap numerator)
        "WITH c AS (SELECT event_type, "
        "(epoch_us(ts) // 3600000000) % 24 AS h, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "sp AS (SELECT t.event_type, g.h FROM "
        "(SELECT DISTINCT event_type FROM events) t "
        "CROSS JOIN range(24) g(h)), "
        "f AS (SELECT sp.event_type, sp.h, COALESCE(c.n, 0) AS n "
        "FROM sp LEFT JOIN c ON c.event_type = sp.event_type "
        "AND c.h = sp.h), "
        "w AS (SELECT event_type, h, "
        "SUM(n) OVER (PARTITION BY event_type ORDER BY h) AS cum, "
        "SUM(n) OVER (PARTITION BY event_type) AS tot FROM f), "
        "p AS (SELECT a.event_type AS ta, b.event_type AS tb, "
        "ABS(a.cum * b.tot - b.cum * a.tot) AS term, "
        "a.tot AS na, b.tot AS nb FROM w a JOIN w b "
        "ON a.h = b.h AND a.event_type < b.event_type) "
        "SELECT ta AS type_a, tb AS type_b, "
        "CAST(SUM(term) AS BIGINT) AS w1_num, "
        "ROUND(CAST(SUM(term) AS DOUBLE) "
        "/ (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE)), 6) "
        "AS w1 FROM p GROUP BY 1, 2 ORDER BY 1, 2"
    )
    out["ndcg_at_10"] = (
        # mirrors _q_ndcg_at_10 (1e9-quantized per-position gains,
        # exact int64 DCG / ideal-DCG)
        "WITH d AS (SELECT lang, doc_id, n_chars, n_chars % 3 AS rel "
        "FROM documents), "
        "r AS (SELECT lang, rel, ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id) AS i FROM d), "
        f"dcg AS (SELECT lang, CAST(SUM({_gain}) AS BIGINT) AS dq "
        "FROM r WHERE i <= 10 GROUP BY 1), "
        "ri AS (SELECT lang, rel, ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY rel DESC, doc_id) AS i FROM d), "
        f"idcg AS (SELECT lang, CAST(SUM({_gain}) AS BIGINT) AS iq "
        "FROM ri WHERE i <= 10 GROUP BY 1) "
        "SELECT dcg.lang, dcg.dq AS dcg_q, idcg.iq AS idcg_q, "
        "ROUND(CAST(dcg.dq AS DOUBLE) / CAST(idcg.iq AS DOUBLE), 6) "
        "AS ndcg FROM dcg JOIN idcg ON idcg.lang = dcg.lang "
        "ORDER BY dcg.lang"
    )
    out["ktruss_peel"] = (
        # mirrors _q_ktruss_peel (six pinned peel rounds, final
        # in-subgraph support, converged = |e6| == |e5|)
        "".join(_kt)
        + ", ed6 AS MATERIALIZED (SELECT w1, w2 FROM e6 "
        "UNION ALL SELECT w2 AS w1, w1 AS w2 FROM e6), "
        "s6 AS (SELECT e.w1, e.w2, "
        "(SELECT COUNT(*) FROM ed6 x JOIN ed6 y ON x.w2 = y.w2 "
        "WHERE x.w1 = e.w1 AND y.w1 = e.w2) AS s FROM e6 e), "
        "cv AS (SELECT CASE WHEN (SELECT COUNT(*) FROM e6) "
        "= (SELECT COUNT(*) FROM e5) THEN 1 ELSE 0 END AS conv) "
        "SELECT s6.w1, s6.w2, CAST(s6.s AS BIGINT) AS support, "
        "CAST(cv.conv AS BIGINT) AS converged FROM s6, cv "
        "ORDER BY s6.w1, s6.w2"
    )
    out["simpson_slopes"] = (
        # mirrors _q_simpson_slopes (HUGEINT Cramer numerator, integer
        # sign compare)
        f"WITH b AS ({_sm}), "
        "m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM b GROUP BY grp "
        "UNION ALL SELECT 'ALL', CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(x) AS BIGINT), CAST(SUM(y) AS BIGINT), "
        "CAST(SUM(x * x) AS BIGINT), CAST(SUM(x * y) AS BIGINT) FROM b), "
        "d AS (SELECT grp, n, "
        "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num, "
        "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den "
        "FROM m) "
        "SELECT grp, n AS n_rows, "
        "ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS slope, "
        "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END "
        "AS BIGINT) AS sign_num FROM d ORDER BY grp"
    )
    out["bbox_pip_fpr"] = (
        # mirrors _q_bbox_pip_fpr (bbox prefilter vs exact PIP counts)
        "WITH c AS ("
        + " UNION ALL ".join(_fpr_parts)
        + ") SELECT polygon_id, n_bbox, n_pip, "
        "ROUND(CASE WHEN n_bbox = 0 THEN 0.0 "
        "ELSE CAST(n_bbox - n_pip AS DOUBLE) / CAST(n_bbox AS DOUBLE) "
        "END, 6) AS fpr FROM c ORDER BY polygon_id"
    )
    out["psi_drift"] = (
        # mirrors _q_psi_drift (first-period deciles, Laplace +1,
        # 1e12-quantized terms)
        "WITH e AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
        "CASE WHEN ts >= TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END AS p "
        "FROM events WHERE event_type = 'purchase'), "
        "ed AS (SELECT "
        + ", ".join(
            f"QUANTILE_DISC(c, {i / 10.0}) AS e{i}" for i in range(1, 10)
        )
        + " FROM e WHERE p = 0), "
        f"b AS (SELECT ({_binx}) AS bin, p FROM e, ed), "
        "g AS (SELECT bin, "
        "CAST(SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
        "CAST(SUM(p) AS BIGINT) AS n2 FROM b GROUP BY bin), "
        "sp AS (SELECT UNNEST(RANGE(10)) AS bin), "
        "f AS (SELECT sp.bin, COALESCE(g.n1, 0) AS n1, "
        "COALESCE(g.n2, 0) AS n2 FROM sp LEFT JOIN g USING (bin)), "
        "t AS (SELECT CAST(SUM(n1) AS BIGINT) AS tn1, "
        "CAST(SUM(n2) AS BIGINT) AS tn2 FROM f), "
        "terms AS (SELECT f.bin, f.n1, f.n2, "
        f"CAST(ROUND(({_p2} - {_p1}) * LN({_p2} / {_p1}) * 1e12, 0) "
        "AS BIGINT) AS tq FROM f, t) "
        "SELECT CAST(bin AS BIGINT) AS bin, n1 AS n_first, "
        "n2 AS n_second, "
        "(SELECT ROUND(CAST(SUM(tq) AS DOUBLE) / 1e12, 6) FROM terms) "
        "AS psi FROM terms ORDER BY bin"
    )
    out["elasticity_loglog"] = (
        # mirrors _q_elasticity_loglog (1e4-quantized logs, HUGEINT
        # Cramer)
        "WITH b AS (SELECT "
        "CAST(ROUND(LN(l_extendedprice) * 1e4, 0) AS BIGINT) AS x, "
        "CAST(ROUND(LN(l_quantity) * 1e4, 0) AS BIGINT) AS y "
        "FROM lineitem), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM b), "
        "d AS (SELECT n, sx, sy, "
        "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num, "
        "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den "
        "FROM m), "
        "f AS (SELECT n, sx, sy, "
        "CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope FROM d) "
        "SELECT n AS n_rows, ROUND(slope, 6) AS elasticity, "
        "ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) "
        "/ CAST(n AS DOUBLE) / 1e4, 6) AS intercept FROM f"
    )
    out["moran_correlogram"] = (
        # mirrors _q_moran_correlogram (dense lattice, exact offset
        # cross-sums, pinned float chain)
        "WITH cgrid AS (SELECT gx.range AS i, gy.range AS j "
        "FROM range(96) gx, range(96) gy), "
        "cnt AS (SELECT event_id % 96 AS i, (event_id // 96) % 96 AS j, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "c AS (SELECT g.i, g.j, COALESCE(cnt.x, 0) AS x FROM cgrid g "
        "LEFT JOIN cnt ON cnt.i = g.i AND cnt.j = g.j), "
        "offs(d, di, dj) AS (VALUES " + ", ".join(_offs) + "), "
        "tot AS (SELECT CAST(SUM(x) AS BIGINT) AS s, "
        "CAST(SUM(x * x) AS BIGINT) AS q FROM c), "
        "ao AS (SELECT o.d, a.i + o.di AS bi, a.j + o.dj AS bj, "
        "a.x AS ax FROM c a, offs o), "
        "p AS (SELECT ao.d, CAST(SUM(ao.ax * b.x) AS BIGINT) AS sxy, "
        "CAST(SUM(ao.ax) AS BIGINT) AS sa, "
        "CAST(SUM(b.x) AS BIGINT) AS sb, "
        "CAST(COUNT(*) AS BIGINT) AS w "
        "FROM ao JOIN c b ON b.i = ao.bi AND b.j = ao.bj "
        "GROUP BY ao.d), "
        "f AS (SELECT p.d, p.w, p.sxy, p.sa, p.sb, tot.q, tot.s, "
        "CAST(tot.s AS DOUBLE) / CAST(9216 AS DOUBLE) AS mu "
        "FROM p, tot) "
        "SELECT CAST(d AS BIGINT) AS d, w AS w_pairs, "
        "ROUND((CAST(9216 AS DOUBLE) / CAST(w AS DOUBLE)) "
        "* ((CAST(sxy AS DOUBLE) - mu * CAST(sa AS DOUBLE) "
        "- mu * CAST(sb AS DOUBLE) + CAST(w AS DOUBLE) * mu * mu) "
        "/ (CAST(q AS DOUBLE) - 2.0 * mu * CAST(s AS DOUBLE) "
        "+ CAST(9216 AS DOUBLE) * mu * mu)), 6) AS moran_i "
        "FROM f ORDER BY d"
    )
    out["percolation_screen"] = (
        # mirrors _q_percolation_screen (top-row seeded reachability)
        "WITH RECURSIVE "
        + ", ".join(_pc_ctes)
        + " "
        + " UNION ALL ".join(_pc_parts)
        + " ORDER BY threshold"
    )
    out["graph_diameter"] = (
        # mirrors _q_graph_diameter (bounded-depth min-hop closure
        # over finite ordered pairs)
        "WITH RECURSIVE tok AS (SELECT DISTINCT source AS w "
        "FROM documents WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e UNION ALL "
        "SELECT w2 AS w1, w1 AS w2 FROM e), "
        "walk(src, w, d) AS (SELECT w, w, 0 FROM tok "
        "UNION SELECT walk.src, sym.w2, walk.d + 1 FROM walk "
        "JOIN sym ON sym.w1 = walk.w WHERE walk.d < 30), "
        "dist AS (SELECT src, w, MIN(d) AS d FROM walk "
        "WHERE w <> src GROUP BY 1, 2), "
        "ec AS (SELECT src, MAX(d) AS ecc FROM dist GROUP BY 1) "
        "SELECT CAST((SELECT MAX(ecc) FROM ec) AS BIGINT) AS diameter, "
        "CAST((SELECT MIN(ecc) FROM ec) AS BIGINT) AS radius, "
        "CAST((SELECT COUNT(*) FROM ec WHERE ecc = "
        "(SELECT MAX(ecc) FROM ec)) AS BIGINT) AS n_peripheral, "
        "CAST((SELECT COUNT(*) FROM dist) AS BIGINT) AS n_pairs"
    )
    out["dau_mau_stickiness"] = (
        # mirrors _q_dau_mau_stickiness: exact int operands, one
        # double division, ROUND 6
        "WITH du AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 "
        "AS BIGINT) AS day, user_id FROM events), "
        "g AS (SELECT CAST(YEAR(ts_d) * 100 + MONTH(ts_d) AS BIGINT) "
        "AS ym, day, user_id FROM (SELECT day, user_id, "
        "TO_TIMESTAMP(day * 86400) AS ts_d FROM du)), "
        "a AS (SELECT ym, CAST(COUNT(*) AS BIGINT) AS dau_sum, "
        "CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau "
        "FROM g GROUP BY ym) "
        "SELECT ym, dau_sum, n_days, mau, "
        "ROUND(CAST(dau_sum AS DOUBLE) / "
        "CAST(n_days * mau AS DOUBLE), 6) AS stickiness FROM a"
    )
    out["power_user_curve"] = (
        "WITH du AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 "
        "AS BIGINT) AS day, user_id FROM events), "
        "p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nd "
        "FROM du GROUP BY user_id) "
        "SELECT nd AS n_active_days, CAST(COUNT(*) AS BIGINT) "
        "AS n_users FROM p GROUP BY nd"
    )
    out["borda_count"] = (
        # mirrors _q_borda_count: 3 metrics, ROW_NUMBER with nationkey
        # tie-break, points = n_nations - rownum
        "WITH cb AS (SELECT c_nationkey AS k, "
        "CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS bal, CAST(COUNT(*) AS BIGINT) AS ncust "
        "FROM customer GROUP BY c_nationkey), "
        "sb AS (SELECT s_nationkey AS k, "
        "CAST(SUM(CAST(ROUND(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS bal FROM supplier GROUP BY s_nationkey), "
        "base AS (SELECT n_nationkey, n_name, "
        "COALESCE(cb.bal, 0) AS m1, COALESCE(cb.ncust, 0) AS m2, "
        "COALESCE(sb.bal, 0) AS m3 FROM nation "
        "LEFT JOIN cb ON cb.k = n_nationkey "
        "LEFT JOIN sb ON sb.k = n_nationkey), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base), "
        "r AS (SELECT n_name, "
        "ROW_NUMBER() OVER (ORDER BY m1 DESC, n_nationkey) AS r1, "
        "ROW_NUMBER() OVER (ORDER BY m2 DESC, n_nationkey) AS r2, "
        "ROW_NUMBER() OVER (ORDER BY m3 DESC, n_nationkey) AS r3 "
        "FROM base) "
        "SELECT n_name, CAST(3 * n.nn - r1 - r2 - r3 AS BIGINT) "
        "AS borda_score FROM r, n"
    )
    out["mrr_first_relevant"] = (
        "WITH r AS (SELECT lang, doc_id, n_chars, ROW_NUMBER() OVER ("
        "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk "
        "FROM documents), "
        "f AS (SELECT lang, CAST(MIN(rnk) AS BIGINT) AS first_rel_rank "
        "FROM r WHERE n_chars % 3 = 2 GROUP BY lang) "
        "SELECT lang, first_rel_rank, "
        "ROUND(1.0 / first_rel_rank, 9) AS rr FROM f"
    )
    out["mood_median"] = (
        # mirrors _q_mood_median (quantile_disc grand median, 1e12
        # quantized chi-square terms)
        "WITH c AS (SELECT event_type AS t, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS v FROM events), "
        "med AS (SELECT QUANTILE_DISC(v, 0.5) AS m FROM c), "
        "g AS (SELECT t, "
        "CAST(SUM(CASE WHEN v > m THEN 1 ELSE 0 END) AS BIGINT) AS na, "
        "CAST(SUM(CASE WHEN v <= m THEN 1 ELSE 0 END) AS BIGINT) AS nb "
        "FROM c, med GROUP BY t), "
        "tot AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, "
        "CAST(SUM(nb) AS BIGINT) AS tb FROM g), "
        "terms AS (SELECT t, na, nb, "
        "CAST(ROUND((na - CAST((na + nb) * ta AS DOUBLE) / (ta + tb)) "
        "* (na - CAST((na + nb) * ta AS DOUBLE) / (ta + tb)) "
        "/ (CAST((na + nb) * ta AS DOUBLE) / (ta + tb)) * 1e12, 0) "
        "AS BIGINT) + "
        "CAST(ROUND((nb - CAST((na + nb) * tb AS DOUBLE) / (ta + tb)) "
        "* (nb - CAST((na + nb) * tb AS DOUBLE) / (ta + tb)) "
        "/ (CAST((na + nb) * tb AS DOUBLE) / (ta + tb)) * 1e12, 0) "
        "AS BIGINT) AS tq FROM g, tot) "
        "SELECT t AS event_type, na AS n_above, nb AS n_below_eq, "
        "(SELECT ROUND(CAST(SUM(tq) AS DOUBLE) / 1e12, 6) FROM terms) "
        "AS chi2 FROM terms"
    )
    out["sign_test"] = (
        # mirrors stages/window.py::keyed_sign_test (ties dropped)
        "WITH o AS (SELECT user_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
        "LAG(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev "
        "FROM events), "
        "d AS (SELECT user_id, c - prev AS dv FROM o "
        "WHERE prev IS NOT NULL AND c <> prev), "
        "g AS (SELECT user_id, "
        "CAST(SUM(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS np, "
        "CAST(SUM(CASE WHEN dv < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nm "
        "FROM d GROUP BY user_id) "
        "SELECT user_id, np AS n_plus, nm AS n_minus, "
        "ROUND(CAST(np - nm AS DOUBLE) / SQRT(CAST(np + nm AS DOUBLE)), 6) "
        "AS z FROM g"
    )
    out["bartlett_test"] = (
        # mirrors _q_bartlett_test (hundreds-of-dollars units, exact
        # A2, 1e9/1e15/1e6-quantized per-group terms)
        "WITH b AS (SELECT l_returnflag AS flag, "
        "CAST(ROUND(l_extendedprice / 100, 0) AS BIGINT) AS k "
        "FROM lineitem), "
        "g AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(k) AS BIGINT) AS s1, "
        "CAST(SUM(k * k) AS BIGINT) AS s2 FROM b GROUP BY flag), "
        "a AS (SELECT flag, n, "
        "CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS a2 "
        "FROM g), "
        "v AS (SELECT flag, n, "
        "CAST(a2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS si2, "
        "CAST(ROUND((n - 1) * LN(CAST(a2 AS DOUBLE) / "
        "CAST(n * (n - 1) AS DOUBLE)) * 1e9, 0) AS BIGINT) AS lnq, "
        "CAST(ROUND(1e15 / (n - 1), 0) AS BIGINT) AS invq, "
        "CAST(ROUND(CAST(a2 AS DOUBLE) / CAST(n AS DOUBLE) * 1e6, 0) "
        "AS BIGINT) AS a2nq FROM a), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, "
        "CAST(SUM(n) AS BIGINT) AS ntot, "
        "CAST(SUM(lnq) AS BIGINT) AS slnq, "
        "CAST(SUM(invq) AS BIGINT) AS sinvq, "
        "CAST(SUM(a2nq) AS BIGINT) AS sa2nq FROM v), "
        "f AS (SELECT (CAST(ntot - k AS DOUBLE) * "
        "LN(CAST(sa2nq AS DOUBLE) / 1e6 / CAST(ntot - k AS DOUBLE)) "
        "- CAST(slnq AS DOUBLE) / 1e9) / "
        "(1.0 + (CAST(sinvq AS DOUBLE) / 1e15 - "
        "1.0 / CAST(ntot - k AS DOUBLE)) / (3.0 * CAST(k - 1 AS DOUBLE))) "
        "AS stat FROM s) "
        "SELECT v.flag, v.n, ROUND(v.si2, 6) AS group_var, "
        "(SELECT ROUND(stat, 6) FROM f) AS bartlett_stat FROM v"
    )
    out["partial_corr"] = (
        # mirrors _q_partial_corr (exact HUGEINT moment products)
        "WITH b AS (SELECT "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS x, "
        "CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS y, "
        "CAST(isodow(ts) AS BIGINT) AS z FROM events), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(z) AS HUGEINT) AS sz, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(y * y) AS HUGEINT) AS syy, "
        "CAST(SUM(z * z) AS HUGEINT) AS szz, "
        "CAST(SUM(x * y) AS HUGEINT) AS sxy, "
        "CAST(SUM(x * z) AS HUGEINT) AS sxz, "
        "CAST(SUM(y * z) AS HUGEINT) AS syz FROM b), "
        "r AS (SELECT CAST(n AS BIGINT) AS n, "
        "CAST(n * sxy - sx * sy AS DOUBLE) / "
        "(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * "
        "SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS rxy, "
        "CAST(n * sxz - sx * sz AS DOUBLE) / "
        "(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * "
        "SQRT(CAST(n * szz - sz * sz AS DOUBLE))) AS rxz, "
        "CAST(n * syz - sy * sz AS DOUBLE) / "
        "(SQRT(CAST(n * syy - sy * sy AS DOUBLE)) * "
        "SQRT(CAST(n * szz - sz * sz AS DOUBLE))) AS ryz FROM m) "
        "SELECT n, ROUND(rxy, 6) AS r_xy, ROUND(rxz, 6) AS r_xz, "
        "ROUND(ryz, 6) AS r_yz, "
        "ROUND((rxy - rxz * ryz) / (SQRT(1.0 - rxz * rxz) * "
        "SQRT(1.0 - ryz * ryz)), 6) AS partial_r FROM r"
    )
    out["calinski_harabasz"] = (
        # mirrors _q_calinski_harabasz (exact HUGEINT scatters,
        # integer-quantized per-label terms, shared ratio)
        f"WITH ev AS ({_EV}), "
        "nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM embeddings GROUP BY label), "
        "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(DISTINCT label) AS BIGINT) AS k FROM embeddings), "
        "cd AS (SELECT label, dim, CAST(SUM(vq) AS BIGINT) AS c "
        "FROM ev GROUP BY label, dim), "
        "gd AS (SELECT dim, CAST(SUM(vq) AS BIGINT) AS gc "
        "FROM ev GROUP BY dim), "
        "t2 AS (SELECT label, CAST(SUM(vq * vq) AS BIGINT) AS t "
        "FROM ev GROUP BY label), "
        "c2 AS (SELECT label, SUM(CAST(c AS HUGEINT) * c) AS c2 "
        "FROM cd GROUP BY label), "
        "bn AS (SELECT cd.label, "
        "SUM(CAST(nt.n * cd.c - nl.n * gd.gc AS HUGEINT) * "
        "(nt.n * cd.c - nl.n * gd.gc)) AS bnum "
        "FROM cd JOIN gd ON gd.dim = cd.dim "
        "JOIN nl ON nl.label = cd.label, nt GROUP BY cd.label), "
        "q AS (SELECT nl.label, nl.n, "
        "CAST(ROUND(CAST(CAST(nl.n AS HUGEINT) * t2.t - c2.c2 AS DOUBLE) "
        "/ CAST(nl.n AS DOUBLE), 0) AS BIGINT) AS within_q, "
        "CAST(ROUND(CAST(bn.bnum AS DOUBLE) / CAST(nl.n AS DOUBLE) "
        "/ CAST(nt.n * nt.n AS DOUBLE), 0) AS BIGINT) AS between_q "
        "FROM nl JOIN t2 ON t2.label = nl.label "
        "JOIN c2 ON c2.label = nl.label "
        "JOIN bn ON bn.label = nl.label, nt), "
        "f AS (SELECT (CAST(SUM(between_q) AS DOUBLE) / "
        "CAST(nt.k - 1 AS DOUBLE)) / (CAST(SUM(within_q) AS DOUBLE) / "
        "CAST(nt.n - nt.k AS DOUBLE)) AS ch FROM q, nt "
        "GROUP BY nt.k, nt.n) "
        "SELECT q.label, q.n, q.within_q, q.between_q, "
        "(SELECT ROUND(ch, 6) FROM f) AS ch_index FROM q"
    )
    out["davies_bouldin"] = (
        # mirrors _q_davies_bouldin (silhouette-style per-point
        # quantized scatter, exact centroid separations)
        f"WITH ev AS ({_EV}), "
        "nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM embeddings GROUP BY label), "
        "nt AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS k "
        "FROM embeddings), "
        "cd AS (SELECT label, dim, CAST(SUM(vq) AS BIGINT) AS c "
        "FROM ev GROUP BY label, dim), "
        "v2 AS (SELECT vec_id, label, CAST(SUM(vq * vq) AS BIGINT) AS v2 "
        "FROM ev GROUP BY vec_id, label), "
        "vc AS (SELECT ev.vec_id, CAST(SUM(ev.vq * cd.c) AS BIGINT) AS vc "
        "FROM ev JOIN cd ON cd.dim = ev.dim AND cd.label = ev.label "
        "GROUP BY ev.vec_id), "
        "c2 AS (SELECT label, CAST(SUM(c * c) AS BIGINT) AS c2 "
        "FROM cd GROUP BY label), "
        "dist AS (SELECT v2.vec_id, v2.label, "
        "SQRT(CAST(nl.n * nl.n * v2.v2 - 2 * nl.n * vc.vc + c2.c2 "
        "AS DOUBLE)) / (CAST(nl.n AS DOUBLE) * 1e4) AS d "
        "FROM v2 JOIN vc ON vc.vec_id = v2.vec_id "
        "JOIN nl ON nl.label = v2.label "
        "JOIN c2 ON c2.label = v2.label), "
        "sc AS (SELECT dist.label, nl.n, "
        "CAST(SUM(CAST(ROUND(d * 1e9, 0) AS BIGINT)) AS DOUBLE) / 1e9 "
        "/ CAST(nl.n AS DOUBLE) AS s FROM dist "
        "JOIN nl ON nl.label = dist.label GROUP BY dist.label, nl.n), "
        "pd AS (SELECT i.label AS li, j.label AS lj, "
        "SQRT(CAST(SUM(CAST(b.n * i.c - a.n * j.c AS HUGEINT) * "
        "(b.n * i.c - a.n * j.c)) AS DOUBLE)) / "
        "(CAST(a.n * b.n AS DOUBLE) * 1e4) AS d "
        "FROM cd i JOIN cd j ON j.dim = i.dim AND j.label <> i.label "
        "JOIN nl a ON a.label = i.label JOIN nl b ON b.label = j.label "
        "GROUP BY i.label, j.label, a.n, b.n), "
        "r AS (SELECT pd.li AS label, "
        "MAX((si.s + sj.s) / pd.d) AS rmax FROM pd "
        "JOIN sc si ON si.label = pd.li "
        "JOIN sc sj ON sj.label = pd.lj GROUP BY pd.li), "
        "f AS (SELECT ROUND(CAST(SUM(CAST(ROUND(rmax * 1e9, 0) "
        "AS BIGINT)) AS DOUBLE) / 1e9 / CAST(nt.k AS DOUBLE), 6) AS db "
        "FROM r, nt GROUP BY nt.k) "
        "SELECT sc.label, sc.n, ROUND(sc.s, 6) AS scatter, "
        "ROUND(r.rmax, 6) AS r_max, (SELECT db FROM f) AS db_index "
        "FROM sc JOIN r ON r.label = sc.label"
    )
    out["rrf_fusion"] = (
        # mirrors _q_rrf_fusion (fuse the bm25_search and ql_retrieval
        # oracle lists verbatim)
        f"WITH b AS ({out['bm25_search']}), q AS ({out['ql_retrieval']}), "
        "rb AS (SELECT doc_id, CAST(ROW_NUMBER() OVER ("
        "ORDER BY score DESC, doc_id) AS BIGINT) AS r FROM b), "
        "rq AS (SELECT doc_id, CAST(ROW_NUMBER() OVER ("
        "ORDER BY score_q DESC, doc_id) AS BIGINT) AS r FROM q), "
        "u AS (SELECT COALESCE(rb.doc_id, rq.doc_id) AS doc_id, "
        "COALESCE(rb.r, 0) AS bm25_rank, COALESCE(rq.r, 0) AS ql_rank "
        "FROM rb FULL OUTER JOIN rq ON rq.doc_id = rb.doc_id) "
        "SELECT doc_id, bm25_rank, ql_rank, "
        "(CASE WHEN bm25_rank > 0 THEN "
        "CAST(ROUND(1e12 / (60 + bm25_rank), 0) AS BIGINT) ELSE 0 END) "
        "+ (CASE WHEN ql_rank > 0 THEN "
        "CAST(ROUND(1e12 / (60 + ql_rank), 0) AS BIGINT) ELSE 0 END) "
        "AS rrf_q FROM u"
    )
    out["lang_confusion"] = (
        f"WITH p AS ({out['lang_id']}) "
        "SELECT d.lang, p.lang_id, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM p JOIN documents d ON d.doc_id = p.doc_id "
        "GROUP BY d.lang, p.lang_id"
    )
    out["gopher_rules"] = (
        # mirrors _q_gopher_rules (integer cross-multiplied thresholds)
        "WITH b AS (SELECT source, text, "
        "CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') END AS toks "
        "FROM documents), "
        "d AS (SELECT source, "
        "CAST(ARRAY_LENGTH(toks) AS BIGINT) AS nt, "
        "CAST(LEN(REGEXP_REPLACE(text, '\\s', '', 'g')) AS BIGINT) "
        "AS schars, "
        "CAST(LEN(text) AS BIGINT) AS nc, "
        "CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]')) AS BIGINT) AS nd, "
        f"CAST(LEN(LIST_FILTER([{_sw_in}], "
        "s -> LIST_CONTAINS(LIST_TRANSFORM(toks, x -> LOWER(x)), s))) "
        "AS BIGINT) AS nsw FROM b), "
        "f AS (SELECT source, "
        "CASE WHEN nt BETWEEN 5 AND 1000 THEN 0 ELSE 1 END AS f1, "
        "CASE WHEN 3 * nt <= schars AND schars <= 10 * nt "
        "THEN 0 ELSE 1 END AS f2, "
        "CASE WHEN 5 * nd < nc THEN 0 ELSE 1 END AS f3, "
        "CASE WHEN nsw >= 2 THEN 0 ELSE 1 END AS f4 FROM d) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(f1) AS BIGINT) AS fail_tokens, "
        "CAST(SUM(f2) AS BIGINT) AS fail_word_len, "
        "CAST(SUM(f3) AS BIGINT) AS fail_digits, "
        "CAST(SUM(f4) AS BIGINT) AS fail_stopwords, "
        "CAST(SUM(CASE WHEN f1 + f2 + f3 + f4 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_kept FROM f GROUP BY source"
    )
    out["badword_filter"] = (
        "WITH d AS (SELECT source, "
        "CAST(LEN(LIST_FILTER(string_split(text, ' '), "
        "x -> x IN ('slow', 'vector', 'spark'))) AS BIGINT) AS occ "
        "FROM documents) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_flagged, CAST(SUM(occ) AS BIGINT) AS n_occurrences "
        "FROM d GROUP BY source"
    )
    out["cronbach_alpha"] = (
        # mirrors _q_cronbach_alpha (exact integer variances, n
        # factors cancel)
        "WITH b AS (SELECT text, "
        "CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') END AS toks "
        "FROM documents), "
        "i AS (SELECT CAST(ARRAY_LENGTH(toks) AS BIGINT) AS x0, "
        "CAST(LEN(text) AS BIGINT) AS x1, "
        "CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS x2, "
        "CAST(LEN(LIST_FILTER(LIST_TRANSFORM(toks, y -> LOWER(y)), "
        f"y -> y IN ({_sw_in}))) AS BIGINT) AS x3 FROM b), "
        "w AS (SELECT x0, x1, x2, x3, x0 + x1 + x2 + x3 AS xt FROM i), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x0) AS BIGINT) AS s0, CAST(SUM(x1) AS BIGINT) AS s1, "
        "CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(x3) AS BIGINT) AS s3, "
        "CAST(SUM(x0 * x0) AS BIGINT) AS q0, "
        "CAST(SUM(x1 * x1) AS BIGINT) AS q1, "
        "CAST(SUM(x2 * x2) AS BIGINT) AS q2, "
        "CAST(SUM(x3 * x3) AS BIGINT) AS q3, "
        "CAST(SUM(xt) AS BIGINT) AS st, "
        "CAST(SUM(xt * xt) AS BIGINT) AS qt FROM w), "
        "v AS (SELECT n, "
        "(n * q0 - s0 * s0) + (n * q1 - s1 * s1) + "
        "(n * q2 - s2 * s2) + (n * q3 - s3 * s3) AS ai, "
        "n * qt - st * st AS at FROM m) "
        "SELECT n, CAST(4 AS BIGINT) AS k_items, "
        "CAST(ai AS BIGINT) AS sum_item_var_q, "
        "CAST(at AS BIGINT) AS total_var_q, "
        "ROUND((4.0 / 3.0) * (1.0 - CAST(ai AS DOUBLE) / "
        "CAST(at AS DOUBLE)), 6) AS alpha FROM v"
    )
    out["conditional_entropy"] = (
        # mirrors _q_conditional_entropy (1e12-quantized terms)
        "WITH g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source, lang), "
        "s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns "
        "FROM g GROUP BY source), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g), "
        "q AS (SELECT g.source, g.lang, g.n, "
        "CAST(ROUND((CAST(g.n AS DOUBLE) / CAST(t.nt AS DOUBLE)) * "
        "LN(CAST(s.ns AS DOUBLE) / CAST(g.n AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) AS tq FROM g JOIN s USING (source), t) "
        "SELECT source, lang, n, "
        "(SELECT ROUND(CAST(SUM(tq) AS DOUBLE) / 1e12, 6) FROM q) "
        "AS cond_entropy FROM q"
    )
    out["mean_center_drift"] = (
        # mirrors _q_mean_center_drift (exact HUGEINT drift numerator)
        "WITH p AS (SELECT CAST(epoch_us(ts) // 86400000000 // 7 "
        "AS BIGINT) AS ym, event_id % 96 AS x, "
        "(event_id // 96) % 96 AS y FROM events), "
        "g AS (SELECT ym, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy "
        "FROM p GROUP BY ym), "
        "l AS (SELECT ym, n, sx, sy, "
        "LAG(n) OVER (ORDER BY ym) AS pn, "
        "LAG(sx) OVER (ORDER BY ym) AS psx, "
        "LAG(sy) OVER (ORDER BY ym) AS psy FROM g) "
        "SELECT ym AS week, n, "
        "ROUND(0.01 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cx, "
        "ROUND(0.01 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cy, "
        "CASE WHEN pn IS NULL THEN NULL ELSE "
        "ROUND(0.01 * SQRT(CAST("
        "CAST(pn * sx - n * psx AS HUGEINT) * (pn * sx - n * psx) + "
        "CAST(pn * sy - n * psy AS HUGEINT) * (pn * sy - n * psy) "
        "AS DOUBLE)) / CAST(pn * n AS DOUBLE), 6) END AS drift FROM l"
    )
    out["adamic_adar"] = (
        # mirrors _q_adamic_adar (1e9-quantized 1/ln(deg) terms)
        "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e "
        "UNION ALL SELECT w2, w1 FROM e), "
        "deg AS (SELECT w1 AS v, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM sym GROUP BY w1), "
        "cand AS (SELECT a.w2 AS u, b.w2 AS w, a.w1 AS v "
        "FROM sym a JOIN sym b ON b.w1 = a.w1 AND a.w2 < b.w2), "
        "ne AS (SELECT u, w, v FROM cand WHERE NOT EXISTS ("
        "SELECT 1 FROM e WHERE e.w1 = cand.u AND e.w2 = cand.w)) "
        "SELECT u AS w1, w AS w2, CAST(COUNT(*) AS BIGINT) AS n_common, "
        "CAST(SUM(CAST(ROUND(1e9 / LN(CAST(deg.d AS DOUBLE)), 0) "
        "AS BIGINT)) AS BIGINT) AS aa_q "
        "FROM ne JOIN deg ON deg.v = ne.v GROUP BY u, w"
    )
    out["closeness_seeds"] = (
        "WITH RECURSIVE tok AS (SELECT DISTINCT source AS w "
        "FROM documents WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e "
        "UNION ALL SELECT w2, w1 FROM e), "
        "seeds AS (SELECT w FROM tok ORDER BY w LIMIT 5), "
        "walk(s, w, d) AS (SELECT w, w, 0 FROM seeds "
        "UNION SELECT walk.s, sym.w2, walk.d + 1 FROM walk "
        "JOIN sym ON sym.w1 = walk.w WHERE walk.d < 30), "
        "dist AS (SELECT s, w, MIN(d) AS d FROM walk GROUP BY s, w), "
        "g AS (SELECT s, CAST(COUNT(*) - 1 AS BIGINT) AS n_reached, "
        "CAST(SUM(d) AS BIGINT) AS sum_hops FROM dist GROUP BY s) "
        "SELECT s AS word, n_reached, sum_hops, "
        "CASE WHEN sum_hops > 0 THEN ROUND(CAST(n_reached AS DOUBLE) / "
        "CAST(sum_hops AS DOUBLE), 6) ELSE NULL END AS closeness FROM g"
    )
    out["f_function"] = (
        # mirrors _q_f_function (exact integer d^2, lattice probes)
        "WITH pts AS (SELECT DISTINCT event_id % 96 AS x, "
        "(event_id // 96) % 96 AS y FROM events), "
        "probes AS (SELECT a.i * 10 + b.i AS pid, "
        "a.i * 10 + 4 AS px, b.i * 10 + 4 AS py "
        "FROM (SELECT UNNEST(RANGE(10)) AS i) a, "
        "(SELECT UNNEST(RANGE(10)) AS i) b), "
        "nn AS (SELECT pid, MIN((px - x) * (px - x) + "
        "(py - y) * (py - y)) AS d2 FROM probes, pts GROUP BY pid), "
        "r AS (SELECT UNNEST([1, 2, 4, 8, 16]) AS radius) "
        "SELECT CAST(radius AS BIGINT) AS radius, "
        "CAST((SELECT COUNT(*) FROM nn WHERE d2 <= radius * radius) "
        "AS BIGINT) AS n_within, CAST(100 AS BIGINT) AS n_probes FROM r"
    )
    out["kpss_stat"] = (
        # mirrors _q_kpss_stat (exact HUGEINT partial-sum numerator,
        # lag-0 long-run variance, one float division)
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS s, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx FROM dn), "
        "p AS (SELECT CAST(t + 1 AS HUGEINT) AS t1, "
        "CAST(SUM(x) OVER (ORDER BY t) AS HUGEINT) AS pt FROM dn), "
        "a AS (SELECT CAST(SUM((m.n * p.pt - p.t1 * m.s) "
        "* (m.n * p.pt - p.t1 * m.s)) AS HUGEINT) AS num "
        "FROM p, m GROUP BY ALL) "
        "SELECT CAST(m.n AS BIGINT) AS n_obs, "
        "ROUND(CAST(a.num AS DOUBLE) "
        "/ CAST(m.n * m.n * (m.n * m.sxx - m.s * m.s) AS DOUBLE), 6) "
        "AS eta FROM a, m"
    )
    out["ipw_estimate"] = (
        # mirrors _q_ipw_estimate (hour-of-day strata, user_id%2
        # treatment, per-stratum 1e6-tick quantized IPW terms)
        "WITH e AS (SELECT epoch_us(ts) // 3600000000 % 24 AS stratum, "
        "user_id % 2 AS treat, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "g AS (SELECT stratum, treat, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS sy FROM e GROUP BY 1, 2), "
        "s AS (SELECT g1.stratum, g1.n AS n1, g1.sy AS s1, "
        "g0.n AS n0, g0.sy AS s0, g1.n + g0.n AS ns "
        "FROM g g1 JOIN g g0 ON g0.stratum = g1.stratum "
        "AND g1.treat = 1 AND g0.treat = 0), "
        "t AS (SELECT ns, n1, n0, s1, s0, "
        "CAST(ROUND((CAST(ns * s1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
        "- CAST(ns * s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 1e6, 0) "
        "AS BIGINT) AS tq FROM s), "
        "f AS (SELECT CAST(SUM(ns) AS BIGINT) AS n_tot, "
        "CAST(SUM(n1) AS BIGINT) AS n1_tot, "
        "CAST(SUM(n0) AS BIGINT) AS n0_tot, "
        "CAST(SUM(s1) AS BIGINT) AS s1_tot, "
        "CAST(SUM(s0) AS BIGINT) AS s0_tot, "
        "CAST(SUM(tq) AS BIGINT) AS tq_tot FROM t) "
        "SELECT n1_tot AS n_treat, n0_tot AS n_control, "
        "ROUND(CAST(tq_tot AS DOUBLE) / 1e6 / CAST(n_tot AS DOUBLE), 6) "
        "AS ate_ipw, "
        "ROUND(CAST(s1_tot AS DOUBLE) / CAST(n1_tot AS DOUBLE) "
        "- CAST(s0_tot AS DOUBLE) / CAST(n0_tot AS DOUBLE), 6) "
        "AS diff_naive FROM f"
    )
    out["transfer_entropy"] = (
        # mirrors _q_transfer_entropy (integer-mean binarization,
        # 1e9-tick quantized plug-in log2 terms, both directions)
        "WITH e2 AS (SELECT epoch_us(ts) // 3600000000 AS h, event_type "
        "FROM events WHERE event_type IN ('click', 'purchase')), "
        "mm AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM e2), "
        "hh AS (SELECT r.range AS t, mm.lo + r.range AS h "
        "FROM range(0, 8192) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "cx AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM e2 "
        "WHERE event_type = 'click' GROUP BY h), "
        "cy AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM e2 "
        "WHERE event_type = 'purchase' GROUP BY h), "
        "sr AS (SELECT hh.t, COALESCE(cx.c, 0) AS x, "
        "COALESCE(cy.c, 0) AS y FROM hh "
        "LEFT JOIN cx ON cx.h = hh.h LEFT JOIN cy ON cy.h = hh.h), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(y) AS BIGINT) AS sy FROM sr), "
        "b AS (SELECT sr.t, "
        "CASE WHEN nn.n * sr.x > nn.sx THEN 1 ELSE 0 END AS xb, "
        "CASE WHEN nn.n * sr.y > nn.sy THEN 1 ELSE 0 END AS yb "
        "FROM sr, nn), "
        "tr AS (SELECT 0 AS dir, b2.yb AS a, b1.yb AS bb, b1.xb AS cc "
        "FROM b b1 JOIN b b2 ON b2.t = b1.t + 1 "
        "UNION ALL "
        "SELECT 1 AS dir, b2.xb AS a, b1.xb AS bb, b1.yb AS cc "
        "FROM b b1 JOIN b b2 ON b2.t = b1.t + 1), "
        "c3 AS (SELECT dir, a, bb, cc, CAST(COUNT(*) AS BIGINT) AS n3 "
        "FROM tr GROUP BY 1, 2, 3, 4), "
        "cab AS (SELECT dir, a, bb, CAST(COUNT(*) AS BIGINT) AS nab "
        "FROM tr GROUP BY 1, 2, 3), "
        "cbc AS (SELECT dir, bb, cc, CAST(COUNT(*) AS BIGINT) AS nbc "
        "FROM tr GROUP BY 1, 2, 3), "
        "cb AS (SELECT dir, bb, CAST(COUNT(*) AS BIGINT) AS nb "
        "FROM tr GROUP BY 1, 2), "
        "nt AS (SELECT dir, CAST(COUNT(*) AS BIGINT) AS n FROM tr "
        "GROUP BY 1), "
        "terms AS (SELECT c3.dir, c3.n3 * CAST(ROUND(1e9 * LOG2("
        "CAST(c3.n3 * cb.nb AS DOUBLE) "
        "/ CAST(cbc.nbc * cab.nab AS DOUBLE)), 0) AS BIGINT) AS tq "
        "FROM c3 "
        "JOIN cab ON cab.dir = c3.dir AND cab.a = c3.a AND cab.bb = c3.bb "
        "JOIN cbc ON cbc.dir = c3.dir AND cbc.bb = c3.bb AND cbc.cc = c3.cc "
        "JOIN cb ON cb.dir = c3.dir AND cb.bb = c3.bb), "
        "f AS (SELECT dir, CAST(SUM(tq) AS BIGINT) AS s FROM terms "
        "GROUP BY 1) "
        "SELECT (SELECT n FROM nt WHERE dir = 0) AS n_trans, "
        "ROUND(CAST((SELECT s FROM f WHERE dir = 0) AS DOUBLE) / 1e9 "
        "/ CAST((SELECT n FROM nt WHERE dir = 0) AS DOUBLE), 6) AS te_xy, "
        "ROUND(CAST((SELECT s FROM f WHERE dir = 1) AS DOUBLE) / 1e9 "
        "/ CAST((SELECT n FROM nt WHERE dir = 1) AS DOUBLE), 6) AS te_yx"
    )
    out["engle_granger"] = (
        # mirrors _q_engle_granger (stage-1 OLS exact moments, 1e4-tick
        # quantized residuals, HUGEINT Dickey-Fuller stage 2)
        "WITH c0 AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS y FROM orders GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x, "
        "COALESCE(c0.y, 0) AS y FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy FROM dn), "
        "ab AS (SELECT n, sx, sy, "
        "CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE) AS b FROM m), "
        "ab2 AS (SELECT n, b, (CAST(sy AS DOUBLE) "
        "- b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a FROM ab), "
        "rr AS (SELECT dn.t, CAST(ROUND((CAST(dn.y AS DOUBLE) - ab2.a "
        "- ab2.b * CAST(dn.x AS DOUBLE)) * 1e4, 0) AS HUGEINT) AS r "
        "FROM dn, ab2), "
        "p2 AS (SELECT a1.r AS rlag, a2.r - a1.r AS dr FROM rr a1 "
        "JOIN rr a2 ON a2.t = a1.t + 1), "
        "m2 AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n2, "
        "SUM(rlag) AS s1, SUM(dr) AS s2, SUM(rlag * rlag) AS s11, "
        "SUM(rlag * dr) AS s12, SUM(dr * dr) AS s22 FROM p2), "
        "bb AS (SELECT n2, s1, s2, s11, s12, s22, "
        "CAST(n2 * s12 - s1 * s2 AS DOUBLE) "
        "/ CAST(n2 * s11 - s1 * s1 AS DOUBLE) AS b2 FROM m2), "
        "aa AS (SELECT n2, s1, s2, s11, s12, s22, b2, "
        "(CAST(s2 AS DOUBLE) - b2 * CAST(s1 AS DOUBLE)) "
        "/ CAST(n2 AS DOUBLE) AS a2 FROM bb), "
        "ss AS (SELECT n2, s1, s11, b2, "
        "CAST(s22 AS DOUBLE) - a2 * CAST(s2 AS DOUBLE) "
        "- b2 * CAST(s12 AS DOUBLE) AS sse FROM aa) "
        "SELECT CAST(ab.n AS BIGINT) AS n_obs, ROUND(ab.b, 6) "
        "AS beta_coint, ROUND(ss.b2 / SQRT(ss.sse "
        "/ CAST(ss.n2 - 2 AS DOUBLE) / (CAST(ss.s11 AS DOUBLE) "
        "- CAST(ss.s1 AS DOUBLE) * CAST(ss.s1 AS DOUBLE) "
        "/ CAST(ss.n2 AS DOUBLE))), 6) AS adf_t FROM ss, ab"
    )
    out["l_moments"] = (
        # mirrors _q_l_moments (hockey-stick order-statistic sums,
        # HUGEINT numerators, final float ratios)
        "WITH v AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS x "
        "FROM events), "
        "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) - 1 AS j FROM v), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s0, "
        "CAST(SUM(CAST(j AS HUGEINT) * x) AS HUGEINT) AS s1, "
        "CAST(SUM(CAST((j * (j - 1)) // 2 AS HUGEINT) * x) AS HUGEINT) "
        "AS s2, "
        "CAST(SUM(CAST((j * (j - 1) * (j - 2)) // 6 AS HUGEINT) * x) "
        "AS HUGEINT) AS s3 FROM r), "
        "f AS (SELECT n, s0, s1, s2, s3, "
        "2 * s1 - (n - 1) * s0 AS num2, n * (n - 1) AS den2, "
        "12 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0 AS num3, "
        "n * (n - 1) * (n - 2) AS den3, "
        "120 * s3 - 60 * (n - 3) * s2 + 12 * (n - 2) * (n - 3) * s1 "
        "- (n - 1) * (n - 2) * (n - 3) * s0 AS num4, "
        "n * (n - 1) * (n - 2) * (n - 3) AS den4 FROM m) "
        "SELECT CAST(n AS BIGINT) AS n_obs, "
        "ROUND(CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS l1, "
        "ROUND(CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE), 6) AS l2, "
        "ROUND(CAST(num3 AS DOUBLE) / CAST(den3 AS DOUBLE) "
        "/ (CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)), 6) AS tau3, "
        "ROUND(CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) "
        "/ (CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)), 6) AS tau4 "
        "FROM f"
    )
    out["isotonic_fit"] = (
        # mirrors _q_isotonic_fit (minimax block-average formulation,
        # pinned integer-over-integer double divisions)
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "p AS (SELECT t, y, SUM(y) OVER (ORDER BY t) AS cp FROM dn), "
        "pr AS (SELECT a.t AS a, b.t AS b, "
        "CAST(b.cp - a.cp + a.y AS DOUBLE) "
        "/ CAST(b.t - a.t + 1 AS DOUBLE) AS avg FROM p a "
        "JOIN p b ON b.t >= a.t), "
        "m1 AS (SELECT pr.a, dn2.t, MIN(pr.avg) AS mn FROM pr "
        "JOIN dn dn2 ON pr.b >= dn2.t AND pr.a <= dn2.t GROUP BY 1, 2) "
        "SELECT dn.t, dn.y, ROUND(f.fit, 6) AS fit FROM dn JOIN "
        "(SELECT t, MAX(mn) AS fit FROM m1 GROUP BY t) f ON f.t = dn.t "
        "ORDER BY dn.t"
    )
    out["markov_stationary"] = _markov_stationary_oracle_sql()
    out["pca_power"] = _pca_power_oracle_sql()
    out["dtw_distance"] = _dtw_oracle_sql()
    out["fiedler_value"] = _fiedler_oracle_sql()
    out["tsp_cells"] = _tsp_oracle_sql()
    out["bradley_terry"] = _bradley_terry_oracle_sql()
    out["betweenness_seeds"] = _betweenness_oracle_sql()
    out["ipf_balance"] = _ipf_oracle_sql()
    out["label_prop_communities"] = _lpa_oracle_sql()
    out["densest_subgraph"] = _peel_oracle_sql()
    out["graph_bridges"] = _bridges_oracle_sql()
    out["knapsack_cells"] = _knapsack_oracle_sql()
    out["markov_attribution"] = _markov_attribution_oracle_sql()
    out["chain_ladder"] = _chain_ladder_oracle_sql()
    out["closed_itemsets"] = _closed_itemsets_oracle_sql()
    out["huffman_code"] = _huffman_oracle_sql()
    out["lis_daily"] = _lis_oracle_sql()
    out["kalman_1d"] = _kalman_oracle_sql()
    out["dist_transform"] = (
        # mirrors _q_dist_transform (exact Manhattan min, capped 16)
        f"WITH {_MASK_SQL}, "
        "px AS (SELECT c.range AS x, r.range AS y "
        "FROM range(0, 96) r, range(0, 96) c), "
        "d AS (SELECT px.x, px.y, LEAST(CAST(16 AS BIGINT), "
        "(SELECT MIN(ABS(px.x - pts.x) + ABS(px.y - pts.y)) FROM pts)) "
        "AS dist FROM px) "
        "SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_pixels FROM d "
        "GROUP BY 1 ORDER BY 1"
    )
    out["random_projection_audit"] = (
        # mirrors _q_random_projection_audit (mix32 sign matrix,
        # exact integer squared distances, pinned ratio)
        "WITH rs AS MATERIALIZED (SELECT j.range AS j, k.range AS k, "
        f"1 - 2 * (({_m32j}) % 2) AS s "
        "FROM range(0, 64) j, range(0, 8) k), "
        "ev AS MATERIALIZED (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS dim, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e4, 0) "
        "AS BIGINT) AS vq FROM embeddings), "
        "pj AS MATERIALIZED (SELECT ev.vec_id, rs.k, "
        "CAST(SUM(ev.vq * rs.s) AS BIGINT) AS p FROM ev "
        "JOIN rs ON rs.j = ev.dim - 1 GROUP BY 1, 2), "
        "rkv AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 "
        "AS rn FROM (SELECT DISTINCT vec_id FROM embeddings)), "
        "prs AS MATERIALIZED (SELECT r.range AS i, va.vec_id AS ida, "
        "vb.vec_id AS idb FROM range(0, 100) r "
        "JOIN rkv va ON va.rn = 2 * r.range "
        "JOIN rkv vb ON vb.rn = 2 * r.range + 1), "
        "od AS (SELECT prs.i, CAST(SUM((a.vq - b.vq) * (a.vq - b.vq)) "
        "AS BIGINT) AS d FROM prs JOIN ev a ON a.vec_id = prs.ida "
        "JOIN ev b ON b.vec_id = prs.idb AND b.dim = a.dim GROUP BY 1), "
        "pd AS (SELECT prs.i, CAST(SUM((pa.p - pb.p) * (pa.p - pb.p)) "
        "AS BIGINT) AS d FROM prs JOIN pj pa ON pa.vec_id = prs.ida "
        "JOIN pj pb ON pb.vec_id = prs.idb AND pb.k = pa.k GROUP BY 1) "
        "SELECT prs.ida AS id1, prs.idb AS id2, od.d AS orig_d2, "
        "pd.d AS proj_d2, ROUND(CAST(pd.d AS DOUBLE) / 8.0 "
        "/ CAST(od.d AS DOUBLE), 6) AS ratio FROM prs "
        "JOIN od ON od.i = prs.i JOIN pd ON pd.i = prs.i"
    )
    out["neyman_allocation"] = (
        # mirrors _q_neyman_allocation (quantized N_h*S_h weights,
        # largest-remainder assignment)
        "WITH e AS (SELECT event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS HUGEINT) AS s1, "
        "CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2 FROM e "
        "GROUP BY 1), "
        "w AS (SELECT event_type, n, CAST(ROUND(CAST(n AS DOUBLE) "
        "* SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 1e6, 0) "
        "AS BIGINT) AS wq FROM m), "
        "tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS t FROM w), "
        "base AS (SELECT w.event_type, w.n, w.wq, "
        "(w.wq * 100) // tot.t AS b, (w.wq * 100) % tot.t AS r "
        "FROM w, tot), "
        "lf AS (SELECT 100 - CAST(SUM(b) AS BIGINT) AS lft FROM base), "
        "rk AS (SELECT event_type, ROW_NUMBER() OVER "
        "(ORDER BY r DESC, event_type) AS rn FROM base) "
        "SELECT base.event_type, base.n AS n_events, "
        "base.wq AS weight_q, CAST(base.b + CASE WHEN rk.rn <= lf.lft "
        "THEN 1 ELSE 0 END AS BIGINT) AS n_sample FROM base "
        "JOIN rk USING (event_type) CROSS JOIN lf ORDER BY 1"
    )
    out["panel_fixed_effects"] = (
        # mirrors _q_panel_fixed_effects (1e6-tick per-entity demeaned
        # terms, pooled contrast)
        "WITH e AS (SELECT user_id AS u, "
        "epoch_us(ts) // 3600000000 % 24 AS x, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "m AS (SELECT u, CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy "
        "FROM e GROUP BY 1), "
        "q AS (SELECT CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT) AS nq, "
        "CAST(ROUND(CAST(n * sxx - sx * sx AS DOUBLE) "
        "/ CAST(n AS DOUBLE) * 1e6, 0) AS BIGINT) AS dq, "
        "n, sx, sy, sxx, sxy FROM m), "
        "f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, "
        "CAST(SUM(nq) AS HUGEINT) AS num_q, "
        "CAST(SUM(dq) AS HUGEINT) AS den_q, "
        "CAST(SUM(n) AS HUGEINT) AS tn, CAST(SUM(sx) AS HUGEINT) "
        "AS tsx, CAST(SUM(sy) AS HUGEINT) AS tsy, "
        "CAST(SUM(sxx) AS HUGEINT) AS tsxx, "
        "CAST(SUM(sxy) AS HUGEINT) AS tsxy FROM q) "
        "SELECT n_users, ROUND(CAST(num_q AS DOUBLE) "
        "/ CAST(den_q AS DOUBLE), 6) AS beta_within, "
        "ROUND(CAST(tn * tsxy - tsx * tsy AS DOUBLE) "
        "/ CAST(tn * tsxx - tsx * tsx AS DOUBLE), 6) AS beta_pooled "
        "FROM f"
    )
    out["frechet_profiles"] = _frechet_oracle_sql()
    out["spanning_tree_count"] = _spanning_tree_oracle_sql()
    out["effective_resistance"] = _eff_resistance_oracle_sql()
    out["katz_centrality"] = _katz_oracle_sql()
    out["fisher_exact"] = (
        # mirrors _q_fisher_exact (generated Pascal table, exact
        # hypergeometric enumeration, integer two-sided rule)
        f"WITH pas(n, k, c) AS (VALUES {_pascal}), "
        "src AS (SELECT source AS w, CAST(SUM(n_chars) AS BIGINT) AS s "
        "FROM documents WHERE LEN(source) >= 4 GROUP BY 1), "
        "rk AS (SELECT w, s, ROW_NUMBER() OVER (ORDER BY w) - 1 AS idx "
        "FROM src), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nsrc, "
        "CAST(SUM(s) AS BIGINT) AS total FROM rk), "
        "fl AS (SELECT idx % 2 AS g, CASE WHEN tot.nsrc * s > tot.total "
        "THEN 1 ELSE 0 END AS o FROM rk, tot), "
        "mg AS (SELECT CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n0, CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n1, CAST(SUM(o) AS BIGINT) AS kk, "
        "CAST(SUM(CASE WHEN g = 0 AND o = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS a FROM fl), "
        "aw AS (SELECT (SELECT c FROM pas, mg WHERE pas.n = mg.n0 "
        "AND pas.k = mg.a) * (SELECT c FROM pas, mg WHERE "
        "pas.n = mg.n1 AND pas.k = mg.kk - mg.a) AS aval), "
        "ks AS (SELECT r.range AS k FROM range(0, 21) r, mg "
        "WHERE r.range >= GREATEST(0, mg.kk - mg.n1) "
        "AND r.range <= LEAST(mg.n0, mg.kk)), "
        "ws AS (SELECT ks.k, p1.c * p2.c AS w FROM ks, mg "
        "JOIN pas p1 ON p1.n = mg.n0 AND p1.k = ks.k "
        "JOIN pas p2 ON p2.n = mg.n1 AND p2.k = mg.kk - ks.k), "
        "nm AS (SELECT CAST(SUM(ws.w) AS BIGINT) AS x FROM ws, aw "
        "WHERE ws.w <= aw.aval), "
        "dn2 AS (SELECT c FROM pas, mg, tot WHERE pas.n = tot.nsrc "
        "AND pas.k = mg.kk) "
        "SELECT tot.nsrc AS n_sources, mg.a AS a_obs, "
        "mg.kk AS col_total, ROUND(CAST(nm.x AS DOUBLE) "
        "/ CAST(dn2.c AS DOUBLE), 6) AS p_value "
        "FROM tot, mg, nm, dn2"
    )
    out["conformal_interval"] = (
        # mirrors _q_conformal_interval (per-type lower median, split
        # conformal order statistic, exact coverage)
        "WITH e AS (SELECT event_type AS t, "
        f"({_m32c}) % 2 AS cal, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "med AS (SELECT t, y AS med FROM (SELECT t, y, ROW_NUMBER() "
        "OVER (PARTITION BY t ORDER BY y) AS rn, COUNT(*) OVER "
        "(PARTITION BY t) AS n FROM e) WHERE rn = (n - 1) // 2 + 1), "
        "r AS (SELECT e.cal, ABS(e.y - med.med) AS r FROM e "
        "JOIN med ON med.t = e.t), "
        "calr AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn "
        "FROM r WHERE cal = 0), "
        "nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM calr), "
        "kk AS (SELECT LEAST(nc.n, (9 * (nc.n + 1) + 9) // 10) AS k "
        "FROM nc), "
        "q AS (SELECT r AS q FROM calr, kk WHERE rn = kk.k), "
        "tst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test, "
        "CAST(COUNT(*) FILTER (WHERE r.r <= q.q) AS BIGINT) AS n_cov "
        "FROM r, q WHERE cal = 1) "
        "SELECT nc.n AS n_cal, tst.n_test, CAST(q.q AS BIGINT) "
        "AS q_hat, ROUND(CAST(tst.n_cov AS DOUBLE) "
        "/ CAST(tst.n_test AS DOUBLE), 6) AS coverage "
        "FROM nc, q, tst"
    )
    out["bipartite_matching"] = _bipartite_matching_oracle_sql()
    out["gmm_em_1d"] = _gmm_oracle_sql()
    out["logistic_gd"] = _logit_oracle_sql()
    out["cart_depth2"] = _cart_oracle_sql()
    out["adaboost_2"] = _adaboost_oracle_sql()
    out["gwr_local"] = (
        # mirrors _q_gwr_local (integer triangular kernel, exact
        # weighted moments, pinned local OLS)
        f"WITH pr(p, px, py) AS (VALUES {_probe_vals}), "
        "e AS (SELECT event_id % 96 AS cx, (event_id // 96) % 96 "
        "AS cy, epoch_us(ts) // 3600000000 % 24 AS x, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        f"w AS (SELECT pr.p, pr.px, pr.py, GREATEST(0, {_GWR_R2} "
        "- ((e.cx - pr.px) * (e.cx - pr.px) "
        "+ (e.cy - pr.py) * (e.cy - pr.py))) AS w, e.x, e.y "
        "FROM e, pr), "
        "m AS (SELECT p, px, py, CAST(SUM(w) AS HUGEINT) AS sw, "
        "CAST(SUM(w * x) AS HUGEINT) AS swx, "
        "CAST(SUM(CAST(w AS HUGEINT) * y) AS HUGEINT) AS swy, "
        "CAST(SUM(w * x * x) AS HUGEINT) AS swxx, "
        "CAST(SUM(CAST(w AS HUGEINT) * x * y) AS HUGEINT) AS swxy, "
        "CAST(COUNT(*) FILTER (WHERE w > 0) AS BIGINT) AS n_eff "
        "FROM w GROUP BY 1, 2, 3), "
        "b AS (SELECT *, CAST(sw * swxy - swx * swy AS DOUBLE) "
        "/ CAST(sw * swxx - swx * swx AS DOUBLE) AS slope FROM m) "
        "SELECT CAST(p AS BIGINT) AS probe, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, n_eff, ROUND(slope, 6) AS slope, "
        "ROUND((CAST(swy AS DOUBLE) - slope * CAST(swx AS DOUBLE)) "
        "/ CAST(sw AS DOUBLE), 6) AS intercept FROM b ORDER BY 1"
    )
    out["sax_motifs"] = (
        # mirrors _q_sax_motifs (quartile order-stat breaks, 3-gram
        # motif counts)
        f"WITH {_DAILY_SQL}, "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "rw AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn "
        "FROM dn), "
        "brk AS (SELECT "
        "(SELECT y FROM rw, nn WHERE rn = (1 * (nn.n - 1)) // 4 + 1) "
        "AS b1, "
        "(SELECT y FROM rw, nn WHERE rn = (2 * (nn.n - 1)) // 4 + 1) "
        "AS b2, "
        "(SELECT y FROM rw, nn WHERE rn = (3 * (nn.n - 1)) // 4 + 1) "
        "AS b3), "
        "sym AS (SELECT t, (CASE WHEN y > brk.b1 THEN 1 ELSE 0 END "
        "+ CASE WHEN y > brk.b2 THEN 1 ELSE 0 END "
        "+ CASE WHEN y > brk.b3 THEN 1 ELSE 0 END) AS s "
        "FROM dn, brk), "
        "tri AS (SELECT CAST(a.s AS VARCHAR) || CAST(b.s AS VARCHAR) "
        "|| CAST(c.s AS VARCHAR) AS motif FROM sym a "
        "JOIN sym b ON b.t = a.t + 1 JOIN sym c ON c.t = a.t + 2) "
        "SELECT motif, CAST(COUNT(*) AS BIGINT) AS n_occur FROM tri "
        "GROUP BY 1 ORDER BY n_occur DESC, motif LIMIT 5"
    )
    out["hampel_filter"] = (
        # mirrors _q_hampel_filter (5-day window median/MAD, integer
        # 3-MAD flag)
        f"WITH {_DAILY_SQL}, "
        "win AS (SELECT a.t, b.y AS wy FROM dn a "
        "JOIN dn b ON b.t BETWEEN a.t - 2 AND a.t + 2), "
        "med AS (SELECT t, wy AS m FROM (SELECT t, wy, ROW_NUMBER() "
        "OVER (PARTITION BY t ORDER BY wy) AS rn, COUNT(*) OVER "
        "(PARTITION BY t) AS cnt FROM win) "
        "WHERE rn = (cnt - 1) // 2 + 1), "
        "dev AS (SELECT win.t, ABS(win.wy - med.m) AS d FROM win "
        "JOIN med ON med.t = win.t), "
        "mad AS (SELECT t, d AS mad FROM (SELECT t, d, ROW_NUMBER() "
        "OVER (PARTITION BY t ORDER BY d) AS rn, COUNT(*) OVER "
        "(PARTITION BY t) AS cnt FROM dev) "
        "WHERE rn = (cnt - 1) // 2 + 1) "
        "SELECT dn.t, dn.y, med.m AS win_med, mad.mad AS win_mad, "
        "CAST(CASE WHEN ABS(dn.y - med.m) > 3 * mad.mad THEN 1 "
        "ELSE 0 END AS BIGINT) AS is_outlier FROM dn "
        "JOIN med ON med.t = dn.t JOIN mad ON mad.t = dn.t "
        "ORDER BY dn.t"
    )
    out["knn_loo_accuracy"] = (
        # mirrors _q_knn_loo_accuracy (first-500 subset, exact d2
        # neighbor order, majority vote with label tie-break)
        "WITH rkv AS (SELECT vec_id, ROW_NUMBER() OVER "
        "(ORDER BY vec_id) AS rn FROM (SELECT DISTINCT vec_id "
        "FROM embeddings)), "
        "sub AS (SELECT vec_id FROM rkv WHERE rn <= 500), "
        "e2 AS MATERIALIZED (SELECT e.vec_id, "
        "generate_subscripts(e.embedding, 1) AS dim, "
        "CAST(ROUND(CAST(UNNEST(e.embedding) AS DOUBLE) * 1e4, 0) "
        "AS BIGINT) AS vq FROM embeddings e JOIN sub "
        "ON sub.vec_id = e.vec_id), "
        "lb AS (SELECT e.vec_id, CAST(e.label AS BIGINT) AS label "
        "FROM embeddings e JOIN sub ON sub.vec_id = e.vec_id), "
        "nr AS (SELECT vec_id, CAST(SUM(vq * vq) AS BIGINT) AS n2 "
        "FROM e2 GROUP BY 1), "
        "dot AS (SELECT a.vec_id AS ia, b.vec_id AS ib, "
        "CAST(SUM(a.vq * b.vq) AS BIGINT) AS dp FROM e2 a "
        "JOIN e2 b ON b.dim = a.dim AND b.vec_id <> a.vec_id "
        "GROUP BY 1, 2), "
        "dd AS (SELECT dot.ia, dot.ib, na.n2 + nb.n2 - 2 * dot.dp "
        "AS d2 FROM dot JOIN nr na ON na.vec_id = dot.ia "
        "JOIN nr nb ON nb.vec_id = dot.ib), "
        "nb5 AS (SELECT ia, ib FROM (SELECT ia, ib, ROW_NUMBER() "
        "OVER (PARTITION BY ia ORDER BY d2, ib) AS rn FROM dd) "
        "WHERE rn <= 5), "
        "votes AS (SELECT nb5.ia, lb.label, CAST(COUNT(*) AS BIGINT) "
        "AS c FROM nb5 JOIN lb ON lb.vec_id = nb5.ib GROUP BY 1, 2), "
        "pred AS (SELECT ia, label FROM (SELECT ia, label, "
        "ROW_NUMBER() OVER (PARTITION BY ia ORDER BY c DESC, label) "
        "AS rn FROM votes) WHERE rn = 1), "
        "acc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN pred.label = lb.label THEN 1 ELSE 0 END) "
        "AS BIGINT) AS correct FROM pred "
        "JOIN lb ON lb.vec_id = pred.ia) "
        "SELECT n AS n_vecs, correct AS n_correct, "
        "ROUND(CAST(correct AS DOUBLE) / CAST(n AS DOUBLE), 6) "
        "AS accuracy FROM acc"
    )
    out["hopkins_stat"] = (
        # mirrors _q_hopkins_stat (mix32 probes and sample, exact d2
        # NN sums)
        "WITH c AS MATERIALIZED (SELECT DISTINCT "
        "event_id % 96 + (event_id // 96 % 96) * 96 AS cell, "
        "event_id % 96 AS x, (event_id // 96) % 96 AS y FROM events), "
        f"pi AS (SELECT i.range AS i, ({_m41}) % 96 AS px, "
        f"({_m43}) % 96 AS py FROM range(0, 50) i), "
        "su AS (SELECT CAST(SUM((SELECT MIN((c.x - pi.px) "
        "* (c.x - pi.px) + (c.y - pi.py) * (c.y - pi.py)) FROM c)) "
        "AS BIGINT) AS v FROM pi), "
        "smp AS (SELECT cell, x, y FROM (SELECT cell, x, y, "
        "ROW_NUMBER() OVER (ORDER BY key, cell) AS rn FROM "
        f"(SELECT cell, x, y, ({_m47}) AS key FROM c)) "
        "WHERE rn <= 50), "
        "sw AS (SELECT CAST(SUM((SELECT MIN((c.x - s.x) * (c.x - s.x) "
        "+ (c.y - s.y) * (c.y - s.y)) FROM c "
        "WHERE c.cell <> s.cell)) AS BIGINT) AS v FROM smp s) "
        "SELECT su.v AS sum_u, sw.v AS sum_w, "
        "ROUND(CAST(su.v AS DOUBLE) / CAST(su.v + sw.v AS DOUBLE), 6) "
        "AS hopkins FROM su, sw"
    )
    out["schulze_method"] = _schulze_oracle_sql()
    out["bootstrap_percolation"] = _bperc_oracle_sql()
    out["p_chart"] = (
        # mirrors _q_p_chart (pooled p-bar, 3-sigma binomial limits)
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS k FROM events GROUP BY 1), "
        "t0 AS (SELECT MIN(d) AS d0 FROM c0), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS bn, "
        "CAST(SUM(k) AS BIGINT) AS bk FROM c0), "
        "r AS (SELECT c0.d - t0.d0 AS t, c0.n, c0.k, "
        "CAST(c0.k AS DOUBLE) / CAST(c0.n AS DOUBLE) AS rate, "
        "CAST(tot.bk AS DOUBLE) / CAST(tot.bn AS DOUBLE) AS pbar "
        "FROM c0, t0, tot), "
        "f AS (SELECT t, n, k, rate, pbar, "
        "SQRT(pbar * (1.0 - pbar) / CAST(n AS DOUBLE)) AS sig FROM r) "
        "SELECT CAST(t AS BIGINT) AS t, n, k, ROUND(rate, 6) AS rate, "
        "CAST(CASE WHEN rate > pbar + 3.0 * sig THEN 1 ELSE 0 END "
        "AS BIGINT) AS above_ucl, "
        "CAST(CASE WHEN rate < pbar - 3.0 * sig THEN 1 ELSE 0 END "
        "AS BIGINT) AS below_lcl FROM f ORDER BY t"
    )
    out["lof_cells"] = (
        # mirrors _q_lof_cells (k=3 squared-distance LOF, 1e9-tick
        # ratio terms)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS v FROM events GROUP BY 1), "
        "top50 AS (SELECT cell FROM cc ORDER BY v DESC, cell LIMIT 50), "
        "p AS MATERIALIZED (SELECT cell, cell % 96 AS x, "
        "cell // 96 AS y FROM top50), "
        "dm AS (SELECT a.cell AS ca, b.cell AS cb, "
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2 "
        "FROM p a JOIN p b ON b.cell <> a.cell), "
        "rk AS MATERIALIZED (SELECT ca, cb, d2, ROW_NUMBER() OVER "
        "(PARTITION BY ca ORDER BY d2, cb) AS rn FROM dm), "
        "nb AS (SELECT ca, cb, d2 FROM rk WHERE rn <= 3), "
        "kd AS (SELECT ca, d2 AS kd2 FROM rk WHERE rn = 3), "
        "sr AS MATERIALIZED (SELECT nb.ca, "
        "CAST(SUM(GREATEST(kd.kd2, nb.d2)) AS BIGINT) AS sr FROM nb "
        "JOIN kd ON kd.ca = nb.cb GROUP BY 1), "
        "lf AS (SELECT nb.ca, CAST(SUM(CAST(ROUND(1e9 "
        "* CAST(sa.sr AS DOUBLE) / CAST(so.sr AS DOUBLE), 0) "
        "AS BIGINT)) AS BIGINT) AS q FROM nb "
        "JOIN sr sa ON sa.ca = nb.ca JOIN sr so ON so.ca = nb.cb "
        "GROUP BY 1) "
        "SELECT p.cell, sr.sr AS sum_reach2, "
        "ROUND(CAST(lf.q AS DOUBLE) / 3e9, 6) AS lof FROM p "
        "JOIN sr ON sr.ca = p.cell JOIN lf ON lf.ca = p.cell "
        "ORDER BY 1"
    )
    out["capture_recapture"] = (
        # mirrors _q_capture_recapture (exact week sightings, pinned
        # LP / Chapman estimators)
        "WITH s AS (SELECT user_id, (epoch_us(ts) // 86400000000 "
        "- (SELECT MIN(epoch_us(ts) // 86400000000) FROM events)) // 7 "
        "AS w FROM events), "
        "w1 AS (SELECT DISTINCT user_id FROM s WHERE w = 0), "
        "w2 AS (SELECT DISTINCT user_id FROM s WHERE w = 1), "
        "m AS (SELECT CAST((SELECT COUNT(*) FROM w1) AS BIGINT) AS n1, "
        "CAST((SELECT COUNT(*) FROM w2) AS BIGINT) AS n2, "
        "CAST((SELECT COUNT(*) FROM w1 JOIN w2 USING (user_id)) "
        "AS BIGINT) AS m) "
        "SELECT n1 AS n_week1, n2 AS n_week2, m AS n_both, "
        "ROUND(CAST(n1 * n2 AS DOUBLE) / CAST(m AS DOUBLE), 6) "
        "AS lincoln_petersen, "
        "ROUND(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) "
        "/ CAST(m + 1 AS DOUBLE) - 1.0, 6) AS chapman FROM m"
    )
    out["chao1_richness"] = (
        # mirrors _q_chao1_richness (bias-corrected Chao1)
        "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM events GROUP BY 1), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_obs, "
        "CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS f1, "
        "CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS f2 FROM c) "
        "SELECT s_obs, f1, f2, ROUND(CAST(s_obs AS DOUBLE) "
        "+ CAST(f1 * (f1 - 1) AS DOUBLE) "
        "/ CAST(2 * (f2 + 1) AS DOUBLE), 6) AS chao1 FROM m"
    )
    out["good_turing"] = (
        # mirrors _q_good_turing (frequency-of-frequency smoothing)
        "WITH tk AS (SELECT UNNEST(regexp_split_to_array(text, '\\s+')) "
        "AS token FROM documents), "
        "tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tk "
        "WHERE token <> '' GROUP BY 1), "
        "ff AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tc "
        "GROUP BY 1) "
        "SELECT a.r, a.n_r, ROUND(CASE WHEN b.n_r IS NULL "
        "THEN CAST(a.r AS DOUBLE) "
        "ELSE CAST((a.r + 1) * b.n_r AS DOUBLE) "
        "/ CAST(a.n_r AS DOUBLE) END, 6) AS r_star "
        "FROM ff a LEFT JOIN ff b ON b.r = a.r + 1 ORDER BY a.r"
    )
    out["fairness_audit"] = (
        # mirrors _q_fairness_audit (demographic-parity gap)
        "WITH g AS (SELECT doc_id % 2 AS grp, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_pos FROM documents GROUP BY 1), "
        "r AS (SELECT grp, n_docs, n_pos, "
        "CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS rate FROM g) "
        "SELECT r.grp, r.n_docs, r.n_pos, ROUND(r.rate, 6) AS pos_rate, "
        "ROUND((SELECT rate FROM r WHERE grp = 1) "
        "- (SELECT rate FROM r WHERE grp = 0), 6) AS parity_gap "
        "FROM r ORDER BY 1"
    )
    out["energy_distance"] = (
        # mirrors _q_energy_distance (merged-order running sums, one
        # pinned float assembly)
        "WITH e AS (SELECT CASE WHEN event_type = 'click' THEN 1 "
        "ELSE 0 END AS lab, CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events WHERE event_type IN ('click', 'purchase')), "
        "g AS (SELECT lab, y, CAST(COUNT(*) AS BIGINT) AS c FROM e "
        "GROUP BY 1, 2), "
        "w AS (SELECT lab, y, c, "
        "COALESCE(SUM(CASE WHEN lab = 1 THEN c END) OVER pre, 0) "
        "AS cnt_a, "
        "COALESCE(SUM(CASE WHEN lab = 1 THEN c * y END) OVER pre, 0) "
        "AS sum_a, "
        "COALESCE(SUM(CASE WHEN lab = 0 THEN c END) OVER pre, 0) "
        "AS cnt_b, "
        "COALESCE(SUM(CASE WHEN lab = 0 THEN c * y END) OVER pre, 0) "
        "AS sum_b FROM g WINDOW pre AS (ORDER BY y, lab "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
        "s AS (SELECT CAST(SUM(CASE WHEN lab = 1 "
        "THEN c * (y * cnt_b - sum_b) "
        "ELSE c * (y * cnt_a - sum_a) END) AS HUGEINT) AS sab, "
        "CAST(SUM(CASE WHEN lab = 1 THEN c * (y * cnt_a - sum_a) "
        "ELSE 0 END) AS HUGEINT) AS saa, "
        "CAST(SUM(CASE WHEN lab = 0 THEN c * (y * cnt_b - sum_b) "
        "ELSE 0 END) AS HUGEINT) AS sbb, "
        "CAST(SUM(CASE WHEN lab = 1 THEN c ELSE 0 END) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN lab = 0 THEN c ELSE 0 END) AS BIGINT) AS m "
        "FROM w) "
        "SELECT n AS n_click, m AS n_purchase, "
        "ROUND((2.0 * CAST(sab AS DOUBLE) / CAST(n * m AS DOUBLE) "
        "- 2.0 * CAST(saa AS DOUBLE) / CAST(n * n AS DOUBLE) "
        "- 2.0 * CAST(sbb AS DOUBLE) / CAST(m * m AS DOUBLE)) / 100.0, "
        "6) AS energy_cents FROM s"
    )
    out["secretary_rule"] = (
        # mirrors _q_secretary_rule (mix32 permutations, 37% rule)
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "pp AS (SELECT r.range AS p FROM range(0, 200) r), "
        f"ky AS (SELECT pp.p, dn.t, dn.y, ({_m32s}) AS k FROM dn, pp), "
        "rk AS MATERIALIZED (SELECT p, y, ROW_NUMBER() OVER "
        "(PARTITION BY p ORDER BY k, t) AS rn FROM ky), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "mx AS (SELECT MAX(y) AS best FROM dn), "
        "thr AS (SELECT p, MAX(y) AS thr FROM rk WHERE rn <= 11 "
        "GROUP BY 1), "
        "pick1 AS (SELECT rk.p, MIN(rk.rn) AS rn FROM rk "
        "JOIN thr ON thr.p = rk.p WHERE rk.rn > 11 AND rk.y > thr.thr "
        "GROUP BY 1), "
        "pick AS (SELECT rk.p, rk.y FROM rk "
        "JOIN pick1 ON pick1.p = rk.p AND pick1.rn = rk.rn "
        "UNION ALL SELECT rk.p, rk.y FROM rk, nn WHERE rk.rn = nn.n "
        "AND rk.p NOT IN (SELECT p FROM pick1)), "
        "wins AS (SELECT CAST(COUNT(*) AS BIGINT) AS w FROM pick, mx "
        "WHERE pick.y = mx.best) "
        "SELECT CAST(200 AS BIGINT) AS n_perms, wins.w AS n_success, "
        "ROUND(CAST(wins.w AS DOUBLE) / 200.0, 6) AS success_rate "
        "FROM wins"
    )
    out["hough_lines"] = (
        # mirrors _q_hough_lines (1e6-tick quantized trig, pinned rho
        # binning, top-5 accumulator peaks)
        f"WITH {_MASK_SQL}, "
        "th AS (SELECT k.range AS k, "
        "CAST(ROUND(1e6 * COS(k.range * PI() / 8), 0) AS BIGINT) AS cq, "
        "CAST(ROUND(1e6 * SIN(k.range * PI() / 8), 0) AS BIGINT) AS sq "
        "FROM range(0, 8) k), "
        "v AS (SELECT th.k, CAST(ROUND(CAST(pts.x * th.cq "
        "+ pts.y * th.sq AS DOUBLE) / 1e6, 0) AS BIGINT) AS rho "
        "FROM pts, th), "
        "acc AS (SELECT k, rho, CAST(COUNT(*) AS BIGINT) AS votes "
        "FROM v GROUP BY 1, 2) "
        "SELECT CAST(k AS BIGINT) AS theta_k, rho, votes FROM acc "
        "ORDER BY votes DESC, k, rho LIMIT 5"
    )
    out["catchment_2sfca"] = (
        # mirrors _q_catchment_2sfca (1e9-tick provider ratios, exact
        # integer accessibility sums, top-20)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS sv FROM events GROUP BY 1), "
        "sup AS (SELECT cell, sv FROM cc ORDER BY sv DESC, cell "
        "LIMIT 10), "
        "rq AS MATERIALIZED (SELECT s.cell, (s.sv * 1000000000) // "
        "(SELECT SUM(d.n) FROM cc d WHERE "
        "(d.cell % 96 - s.cell % 96) * (d.cell % 96 - s.cell % 96) "
        "+ (d.cell // 96 - s.cell // 96) * (d.cell // 96 - s.cell // 96) "
        "<= 100) AS r FROM sup s), "
        "ac AS (SELECT d.cell, CAST(SUM(rq.r) AS BIGINT) AS a FROM cc d "
        "JOIN rq ON (d.cell % 96 - rq.cell % 96) "
        "* (d.cell % 96 - rq.cell % 96) "
        "+ (d.cell // 96 - rq.cell // 96) "
        "* (d.cell // 96 - rq.cell // 96) <= 100 GROUP BY 1) "
        "SELECT cc.cell, COALESCE(ac.a, 0) AS access_q, "
        "ROUND(CAST(COALESCE(ac.a, 0) AS DOUBLE) / 1e9, 6) AS access "
        "FROM cc LEFT JOIN ac ON ac.cell = cc.cell "
        "ORDER BY access_q DESC, cc.cell LIMIT 20"
    )
    out["mean_excess"] = (
        # mirrors _q_mean_excess (exact exceedance sums per threshold)
        "WITH th AS (SELECT UNNEST([1000, 2000, 4000, 8000, 16000]) "
        "AS u), "
        "e AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events), "
        "m AS (SELECT th.u, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(e.y - th.u) AS BIGINT) AS s FROM th "
        "JOIN e ON e.y > th.u GROUP BY 1) "
        "SELECT CAST(u AS BIGINT) AS threshold, n AS n_exceed, "
        "ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) "
        "AS mean_excess FROM m ORDER BY 1"
    )
    out["epoch_folding"] = (
        # mirrors _q_epoch_folding (exact integer folded-bin chi2)
        "WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events), "
        "pr AS (SELECT UNNEST([6, 12, 24, 168]) AS p), "
        "ob AS (SELECT pr.p, e.h % pr.p AS b, "
        "CAST(COUNT(*) AS BIGINT) AS o FROM e, pr GROUP BY 1, 2), "
        "tt AS (SELECT p, CAST(SUM(o) AS BIGINT) AS t FROM ob "
        "GROUP BY 1), "
        "fr AS (SELECT pr.p, r.range AS b FROM pr, range(0, 168) r "
        "WHERE r.range < pr.p), "
        "nm AS (SELECT fr.p, CAST(SUM((fr.p * COALESCE(ob.o, 0) - tt.t) "
        "* (fr.p * COALESCE(ob.o, 0) - tt.t)) AS HUGEINT) AS num "
        "FROM fr JOIN tt ON tt.p = fr.p "
        "LEFT JOIN ob ON ob.p = fr.p AND ob.b = fr.b GROUP BY 1) "
        "SELECT CAST(nm.p AS BIGINT) AS period_h, tt.t AS n_events, "
        "ROUND(CAST(nm.num AS DOUBLE) / CAST(nm.p * tt.t AS DOUBLE), 6) "
        "AS chi2 FROM nm JOIN tt ON tt.p = nm.p ORDER BY 1"
    )
    out["seat_apportionment"] = (
        # mirrors _q_seat_apportionment (D'Hondt top-100 quotients,
        # Hamilton largest remainders, type tie-breaks)
        "WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM events GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM c), "
        "q AS (SELECT c.event_type, k.range + 1 AS k, "
        "CAST(c.c AS DOUBLE) / CAST(k.range + 1 AS DOUBLE) AS q "
        "FROM c, range(0, 100) k), "
        "topq AS (SELECT event_type FROM q "
        "ORDER BY q DESC, event_type, k LIMIT 100), "
        "dh AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS s "
        "FROM topq GROUP BY 1), "
        "base AS (SELECT c.event_type, c.c, (c.c * 100) // tot.t AS b, "
        "(c.c * 100) % tot.t AS r FROM c, tot), "
        "lf AS (SELECT 100 - CAST(SUM(b) AS BIGINT) AS lft FROM base), "
        "rk AS (SELECT event_type, ROW_NUMBER() OVER "
        "(ORDER BY r DESC, event_type) AS rn FROM base) "
        "SELECT c.event_type, c.c AS n_events, "
        "CAST(COALESCE(dh.s, 0) AS BIGINT) AS dhondt, "
        "CAST(base.b + CASE WHEN rk.rn <= lf.lft THEN 1 ELSE 0 END "
        "AS BIGINT) AS hamilton FROM c "
        "JOIN base ON base.event_type = c.event_type "
        "JOIN rk ON rk.event_type = c.event_type "
        "LEFT JOIN dh ON dh.event_type = c.event_type "
        "CROSS JOIN lf ORDER BY 1"
    )
    out["rle_runs"] = (
        # mirrors _q_rle_runs (gaps-and-islands run lengths per row)
        f"WITH {_MASK_SQL}, "
        "isl AS (SELECT y, x, x - ROW_NUMBER() OVER (PARTITION BY y "
        "ORDER BY x) AS grp FROM pts), "
        "runs AS (SELECT y, grp, CAST(COUNT(*) AS BIGINT) AS len "
        "FROM isl GROUP BY 1, 2) "
        "SELECT len AS run_length, CAST(COUNT(*) AS BIGINT) AS n_runs "
        "FROM runs GROUP BY 1 ORDER BY 1"
    )
    out["sharpe_sortino"] = (
        # mirrors _q_sharpe_sortino (1e6-tick returns, exact moments)
        f"WITH {_RET_SQL}, "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(r) AS HUGEINT) AS s1, "
        "CAST(SUM(CAST(r AS HUGEINT) * r) AS HUGEINT) AS s2, "
        "CAST(SUM(CASE WHEN r < 0 THEN CAST(r AS HUGEINT) * r "
        "ELSE 0 END) AS HUGEINT) AS d2 FROM rq), "
        "f AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, "
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2, "
        "CAST(d2 AS DOUBLE) / CAST(n AS DOUBLE) AS dvar FROM m) "
        "SELECT CAST(n AS BIGINT) AS n_ret, ROUND(mean / 1e6, 6) "
        "AS mean_ret, ROUND(mean / SQRT(m2 - mean * mean), 6) AS sharpe, "
        "ROUND(mean / SQRT(dvar), 6) AS sortino FROM f"
    )
    out["var_cvar"] = (
        # mirrors _q_var_cvar (k-th order statistic + exact tail mean)
        f"WITH {_RET_SQL}, "
        "rr AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn FROM rq), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS BIGINT) * 5 // 100 + 1 AS k FROM rq) "
        "SELECT nn.n AS n_ret, nn.k AS k_tail, "
        "ROUND(CAST((SELECT r FROM rr, nn WHERE rn = nn.k) AS DOUBLE) "
        "/ 1e6, 6) AS var05, "
        "ROUND(CAST((SELECT SUM(r) FROM rr, nn WHERE rn <= nn.k) "
        "AS DOUBLE) / CAST(nn.k AS DOUBLE) / 1e6, 6) AS cvar05 FROM nn"
    )
    out["reg_discontinuity"] = (
        # mirrors _q_reg_discontinuity (per-side exact OLS moments,
        # fitted-value difference at the cutoff)
        "WITH e AS (SELECT CASE WHEN user_id % 100 >= 50 THEN 1 ELSE 0 "
        "END AS side, user_id % 100 AS x, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "m AS (SELECT side, CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy "
        "FROM e GROUP BY 1), "
        "b AS (SELECT side, n, sx, sy, sxy, "
        "CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE) AS b FROM m), "
        "f AS (SELECT side, n, (CAST(sy AS DOUBLE) "
        "- b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) + b * 50.0 "
        "AS fit FROM b) "
        "SELECT (SELECT CAST(n AS BIGINT) FROM f WHERE side = 0) "
        "AS n_left, (SELECT CAST(n AS BIGINT) FROM f WHERE side = 1) "
        "AS n_right, "
        "ROUND((SELECT fit FROM f WHERE side = 0), 6) AS y_left, "
        "ROUND((SELECT fit FROM f WHERE side = 1), 6) AS y_right, "
        "ROUND((SELECT fit FROM f WHERE side = 1) "
        "- (SELECT fit FROM f WHERE side = 0), 6) AS rd_effect"
    )
    out["convex_layers"] = _convex_layers_oracle_sql()
    out["delaunay_triangles"] = (
        # mirrors _q_delaunay_triangles (exact integer empty-
        # circumcircle certificates over top-20 cells by value cents)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS n FROM events GROUP BY 1), "
        "top20 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 20), "
        "p AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY cell) - 1 "
        "AS i, cell % 96 AS x, cell // 96 AS y FROM top20), "
        "tri0 AS (SELECT a.i AS i, b.i AS j, c.i AS k, "
        "a.x AS ax, a.y AS ay, "
        "2 * (a.x * (b.y - c.y) + b.x * (c.y - a.y) "
        "+ c.x * (a.y - b.y)) AS d, "
        "(a.x * a.x + a.y * a.y) * (b.y - c.y) "
        "+ (b.x * b.x + b.y * b.y) * (c.y - a.y) "
        "+ (c.x * c.x + c.y * c.y) * (a.y - b.y) AS ux, "
        "(a.x * a.x + a.y * a.y) * (c.x - b.x) "
        "+ (b.x * b.x + b.y * b.y) * (a.x - c.x) "
        "+ (c.x * c.x + c.y * c.y) * (b.x - a.x) AS uy "
        "FROM p a JOIN p b ON b.i > a.i JOIN p c ON c.i > b.i), "
        "tri1 AS (SELECT *, (d * ax - ux) * (d * ax - ux) "
        "+ (d * ay - uy) * (d * ay - uy) AS rnum FROM tri0 "
        "WHERE d <> 0), "
        "tris AS MATERIALIZED (SELECT i, j, k FROM tri1 t "
        "WHERE NOT EXISTS (SELECT 1 FROM p q "
        "WHERE q.i <> t.i AND q.i <> t.j AND q.i <> t.k AND "
        "(t.d * q.x - t.ux) * (t.d * q.x - t.ux) "
        "+ (t.d * q.y - t.uy) * (t.d * q.y - t.uy) < t.rnum)), "
        "de AS (SELECT DISTINCT a, b FROM (SELECT i AS a, j AS b "
        "FROM tris UNION ALL SELECT i, k FROM tris "
        "UNION ALL SELECT j, k FROM tris)) "
        "SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, "
        "CAST(k AS BIGINT) AS k, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM de) AS n_edges FROM tris"
    )
    out["enclosing_circle"] = (
        # mirrors _q_enclosing_circle (integer containment certificates
        # on pairs + circumcircle triples, pinned-double winner pick)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top20 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 20), "
        "p AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY cell) - 1 "
        "AS i, cell % 96 AS x, cell // 96 AS y FROM top20), "
        "pair AS (SELECT a.i AS i, b.i AS j, -1 AS k, "
        "CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) "
        "AS DOUBLE) / 4.0 AS r2f, "
        "CAST(a.x + b.x AS DOUBLE) / 2.0 AS cxf, "
        "CAST(a.y + b.y AS DOUBLE) / 2.0 AS cyf "
        "FROM p a JOIN p b ON b.i > a.i WHERE NOT EXISTS ("
        "SELECT 1 FROM p q WHERE "
        "(2 * q.x - a.x - b.x) * (2 * q.x - a.x - b.x) "
        "+ (2 * q.y - a.y - b.y) * (2 * q.y - a.y - b.y) "
        "> (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))), "
        "tri0 AS (SELECT a.i AS i, b.i AS j, c.i AS k, "
        "a.x AS ax, a.y AS ay, "
        "2 * (a.x * (b.y - c.y) + b.x * (c.y - a.y) "
        "+ c.x * (a.y - b.y)) AS d, "
        "(a.x * a.x + a.y * a.y) * (b.y - c.y) "
        "+ (b.x * b.x + b.y * b.y) * (c.y - a.y) "
        "+ (c.x * c.x + c.y * c.y) * (a.y - b.y) AS ux, "
        "(a.x * a.x + a.y * a.y) * (c.x - b.x) "
        "+ (b.x * b.x + b.y * b.y) * (a.x - c.x) "
        "+ (c.x * c.x + c.y * c.y) * (b.x - a.x) AS uy "
        "FROM p a JOIN p b ON b.i > a.i JOIN p c ON c.i > b.i), "
        "tri1 AS (SELECT *, (d * ax - ux) * (d * ax - ux) "
        "+ (d * ay - uy) * (d * ay - uy) AS rnum FROM tri0 "
        "WHERE d <> 0), "
        "tri AS (SELECT i, j, k, "
        "CAST(rnum AS DOUBLE) / CAST(d * d AS DOUBLE) AS r2f, "
        "CAST(ux AS DOUBLE) / CAST(d AS DOUBLE) AS cxf, "
        "CAST(uy AS DOUBLE) / CAST(d AS DOUBLE) AS cyf FROM tri1 t "
        "WHERE NOT EXISTS (SELECT 1 FROM p q WHERE "
        "(t.d * q.x - t.ux) * (t.d * q.x - t.ux) "
        "+ (t.d * q.y - t.uy) * (t.d * q.y - t.uy) > t.rnum)), "
        "cand AS (SELECT * FROM pair UNION ALL SELECT * FROM tri) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_points, "
        "ROUND(SQRT(r2f), 6) AS radius, ROUND(cxf, 6) AS cx, "
        "ROUND(cyf, 6) AS cy FROM cand ORDER BY r2f, i, j, k LIMIT 1"
    )
    out["item_cf_pairs"] = (
        # mirrors _q_item_cf_pairs (distinct user-cell visits, co-visit
        # dots, top-20 by dot with cell-id tie-break, pinned cosine)
        "WITH uc AS (SELECT DISTINCT user_id AS u, "
        "event_id % 96 + (event_id // 96 % 96) * 96 AS cell "
        "FROM events), "
        "n AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS nv FROM uc "
        "GROUP BY 1), "
        "d AS (SELECT a.cell AS c1, b.cell AS c2, "
        "CAST(COUNT(*) AS BIGINT) AS dot FROM uc a "
        "JOIN uc b ON b.u = a.u AND a.cell < b.cell GROUP BY 1, 2) "
        "SELECT d.c1, d.c2, d.dot, "
        "ROUND(CAST(d.dot AS DOUBLE) "
        "/ SQRT(CAST(n1.nv * n2.nv AS DOUBLE)), 6) AS cos_sim "
        "FROM d JOIN n n1 ON n1.cell = d.c1 "
        "JOIN n n2 ON n2.cell = d.c2 "
        "ORDER BY d.dot DESC, d.c1, d.c2 LIMIT 20"
    )
    out["nb_lang_eval"] = (
        # mirrors _q_nb_lang_eval (Laplace-smoothed letter NB, 1e9-tick
        # quantized log-probs, smallest-lang argmax tie-break)
        "WITH ch AS (SELECT doc_id, lang, u.c AS c FROM documents, "
        "UNNEST(string_split(text, '')) u(c) "
        "WHERE u.c BETWEEN 'a' AND 'z'), "
        "letters AS (SELECT chr(97 + CAST(r.range AS INT)) AS c "
        "FROM range(0, 26) r), "
        "lg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd "
        "FROM documents GROUP BY 1), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents), "
        "tc AS (SELECT lang, c, CAST(COUNT(*) AS BIGINT) AS n FROM ch "
        "GROUP BY 1, 2), "
        "tl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM ch "
        "GROUP BY 1), "
        "cond AS (SELECT lg.lang, lt.c, CAST(ROUND(1e9 * LN("
        "CAST(COALESCE(tc.n, 0) + 1 AS DOUBLE) "
        "/ CAST(tl.n + 26 AS DOUBLE)), 0) AS BIGINT) AS lq "
        "FROM lg CROSS JOIN letters lt "
        "JOIN tl ON tl.lang = lg.lang "
        "LEFT JOIN tc ON tc.lang = lg.lang AND tc.c = lt.c), "
        "pri AS (SELECT lg.lang, CAST(ROUND(1e9 * LN("
        "CAST(lg.nd AS DOUBLE) / CAST(tot.n AS DOUBLE)), 0) AS BIGINT) "
        "AS pq FROM lg, tot), "
        "dc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n FROM ch "
        "GROUP BY 1, 2), "
        "ds0 AS (SELECT dc.doc_id, cond.lang, "
        "CAST(SUM(dc.n * cond.lq) AS BIGINT) AS s FROM dc "
        "JOIN cond ON cond.c = dc.c GROUP BY 1, 2), "
        "sco AS (SELECT d.doc_id, pri.lang, "
        "COALESCE(ds0.s, 0) + pri.pq AS s FROM documents d "
        "CROSS JOIN pri LEFT JOIN ds0 ON ds0.doc_id = d.doc_id "
        "AND ds0.lang = pri.lang), "
        "pred AS (SELECT doc_id, lang AS predicted FROM "
        "(SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id "
        "ORDER BY s DESC, lang) AS rn FROM sco) WHERE rn = 1) "
        "SELECT d.lang AS actual, pred.predicted, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents d "
        "JOIN pred ON pred.doc_id = d.doc_id GROUP BY 1, 2 "
        "ORDER BY 1, 2"
    )
    out["jenks_breaks"] = (
        # mirrors _q_jenks_breaks (integer N // len segment costs,
        # 4-class DP, smallest-boundary argmin reconstruction)
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.y, 0) AS y "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "p AS (SELECT t, CAST(y AS HUGEINT) AS y, "
        "CAST(SUM(y) OVER (ORDER BY t) AS HUGEINT) AS cp1, "
        "CAST(SUM(CAST(y AS HUGEINT) * y) OVER (ORDER BY t) AS HUGEINT) "
        "AS cp2 FROM dn), "
        "cst AS MATERIALIZED (SELECT a.t AS a, b.t AS b, "
        "((b.t - a.t + 1) * (b.cp2 - a.cp2 + a.y * a.y) "
        "- (b.cp1 - a.cp1 + a.y) * (b.cp1 - a.cp1 + a.y)) "
        "// (b.t - a.t + 1) AS c FROM p a JOIN p b ON b.t >= a.t), "
        "b1 AS MATERIALIZED (SELECT b AS t, c FROM cst WHERE a = 0), "
        "b2 AS MATERIALIZED (SELECT cst.b AS t, MIN(b1.c + cst.c) AS c "
        "FROM b1 JOIN cst ON cst.a = b1.t + 1 GROUP BY 1), "
        "b3 AS MATERIALIZED (SELECT cst.b AS t, MIN(b2.c + cst.c) AS c "
        "FROM b2 JOIN cst ON cst.a = b2.t + 1 GROUP BY 1), "
        "nm AS (SELECT MAX(t) AS t FROM dn), "
        "e3 AS (SELECT s FROM (SELECT b3.t AS s, b3.c + cst.c AS cost "
        "FROM b3 JOIN cst ON cst.a = b3.t + 1 CROSS JOIN nm "
        "WHERE cst.b = nm.t) ORDER BY cost, s LIMIT 1), "
        "e2 AS (SELECT s FROM (SELECT b2.t AS s, b2.c + cst.c AS cost "
        "FROM b2 JOIN cst ON cst.a = b2.t + 1 CROSS JOIN e3 ee "
        "WHERE cst.b = ee.s) ORDER BY cost, s LIMIT 1), "
        "e1 AS (SELECT s FROM (SELECT b1.t AS s, b1.c + cst.c AS cost "
        "FROM b1 JOIN cst ON cst.a = b1.t + 1 CROSS JOIN e2 ee "
        "WHERE cst.b = ee.s) ORDER BY cost, s LIMIT 1), "
        "seg AS (SELECT 1 AS class, CAST(0 AS BIGINT) AS a, "
        "CAST(e1.s AS BIGINT) AS b FROM e1 "
        "UNION ALL SELECT 2, CAST(e1.s + 1 AS BIGINT), "
        "CAST(e2.s AS BIGINT) FROM e1, e2 "
        "UNION ALL SELECT 3, CAST(e2.s + 1 AS BIGINT), "
        "CAST(e3.s AS BIGINT) FROM e2, e3 "
        "UNION ALL SELECT 4, CAST(e3.s + 1 AS BIGINT), "
        "CAST(nm.t AS BIGINT) FROM e3, nm) "
        "SELECT CAST(seg.class AS BIGINT) AS class, seg.a AS t_start, "
        "seg.b AS t_end, seg.b - seg.a + 1 AS n_days, "
        "CAST(cst.c AS BIGINT) AS cost_q FROM seg "
        "JOIN cst ON cst.a = seg.a AND cst.b = seg.b ORDER BY 1"
    )
    out["trigram_sim_pairs"] = (
        # mirrors _q_trigram_sim_pairs (trigram-blocked cosine join,
        # exact integer 25*dot^2 >= n1*n2 acceptance)
        "WITH tk AS (SELECT DISTINCT "
        "UNNEST(regexp_split_to_array(text, '\\s+')) AS w "
        "FROM documents), "
        "v AS (SELECT w FROM tk WHERE w <> '' AND LEN(w) >= 4), "
        "g AS (SELECT w, SUBSTR(w, r.range + 1, 3) AS tri FROM v, "
        "range(0, 64) r WHERE r.range <= LEN(w) - 3), "
        "gc AS (SELECT w, tri, CAST(COUNT(*) AS BIGINT) AS c FROM g "
        "GROUP BY 1, 2), "
        "nm AS (SELECT w, CAST(SUM(c * c) AS BIGINT) AS n2 FROM gc "
        "GROUP BY 1), "
        "dt AS (SELECT a.w AS w1, b.w AS w2, "
        "CAST(SUM(a.c * b.c) AS BIGINT) AS dot FROM gc a "
        "JOIN gc b ON b.tri = a.tri AND a.w < b.w GROUP BY 1, 2) "
        "SELECT dt.w1, dt.w2, dt.dot, "
        "ROUND(CAST(dt.dot AS DOUBLE) "
        "/ SQRT(CAST(n1.n2 * n2t.n2 AS DOUBLE)), 6) AS cos_sim "
        "FROM dt JOIN nm n1 ON n1.w = dt.w1 "
        "JOIN nm n2t ON n2t.w = dt.w2 "
        "WHERE 25 * dt.dot * dt.dot >= n1.n2 * n2t.n2"
    )
    out["permutation_test"] = (
        # mirrors _q_permutation_test (mix32 label permutations,
        # per-perm integer sums, pinned mean-difference chain)
        "WITH e AS (SELECT event_id, user_id % 2 AS lab, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(lab * y) AS BIGINT) "
        "AS s1, CAST(SUM(lab) AS BIGINT) AS n1 FROM e), "
        "obs AS (SELECT CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
        "- CAST(s - s1 AS DOUBLE) / CAST(n - n1 AS DOUBLE) AS t "
        "FROM tot), "
        "pp AS (SELECT r.range AS p FROM range(0, 200) r), "
        f"pl AS (SELECT pp.p, ({_m32p}) % 2 AS plab, e.y "
        "FROM e, pp), "
        "ps AS (SELECT p, CAST(SUM(plab) AS BIGINT) AS n1, "
        "CAST(SUM(plab * y) AS BIGINT) AS s1 FROM pl GROUP BY p), "
        "pt AS (SELECT p, CAST(ps.s1 AS DOUBLE) / CAST(ps.n1 AS DOUBLE) "
        "- CAST(tot.s - ps.s1 AS DOUBLE) "
        "/ CAST(tot.n - ps.n1 AS DOUBLE) AS t FROM ps, tot), "
        "ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_extreme FROM pt, "
        "obs WHERE ABS(pt.t) >= ABS(obs.t)) "
        "SELECT CAST(200 AS BIGINT) AS n_perms, ROUND(obs.t, 6) "
        "AS t_obs, ex.n_extreme, "
        "ROUND((1.0 + CAST(ex.n_extreme AS DOUBLE)) / 201.0, 6) "
        "AS p_value FROM obs, ex"
    )
    out["soundex_blocks"] = (
        # mirrors _q_soundex_blocks (American Soundex: h/w transparent
        # via row removal, vowel rows break LAG runs, first letter's
        # code participates in the collapse)
        "WITH tok AS (SELECT DISTINCT "
        "UNNEST(regexp_split_to_array(text, '\\s+')) AS w "
        "FROM documents), "
        "v AS (SELECT w FROM tok WHERE LEN(w) >= 4 "
        "AND regexp_matches(w, '^[a-z]+$')), "
        "ch AS (SELECT w, r.range AS pos, SUBSTR(w, r.range + 1, 1) "
        "AS c FROM v, range(0, 64) r WHERE r.range < LEN(w)), "
        "cd AS (SELECT w, pos, CASE "
        "WHEN c IN ('b','f','p','v') THEN 1 "
        "WHEN c IN ('c','g','j','k','q','s','x','z') THEN 2 "
        "WHEN c IN ('d','t') THEN 3 WHEN c = 'l' THEN 4 "
        "WHEN c IN ('m','n') THEN 5 WHEN c = 'r' THEN 6 "
        "WHEN c IN ('h','w') THEN -1 ELSE 0 END AS code FROM ch), "
        "kept AS (SELECT w, pos, code, LAG(code) OVER "
        "(PARTITION BY w ORDER BY pos) AS prev FROM cd "
        "WHERE pos = 0 OR code <> -1), "
        "dig AS (SELECT w, pos, code, ROW_NUMBER() OVER "
        "(PARTITION BY w ORDER BY pos) AS rn FROM kept "
        "WHERE pos > 0 AND code BETWEEN 1 AND 6 "
        "AND code <> COALESCE(prev, -9)), "
        "agg AS (SELECT v.w, COALESCE(STRING_AGG("
        "CAST(dig.code AS VARCHAR), '' ORDER BY dig.pos) "
        "FILTER (WHERE dig.rn <= 3), '') AS ds "
        "FROM v LEFT JOIN dig ON dig.w = v.w GROUP BY v.w), "
        "sx AS (SELECT w, UPPER(SUBSTR(w, 1, 1)) "
        "|| SUBSTR(ds || '000', 1, 3) AS sdx FROM agg) "
        "SELECT sdx, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "MIN(w) AS first_word, MAX(w) AS last_word FROM sx "
        "GROUP BY 1 ORDER BY 1"
    )
    out["cronbach_userday"] = (
        # mirrors _q_cronbach_alpha (items = 5 event types, subjects =
        # (user, day), exact integer variance numerators)
        "WITH c0 AS (SELECT user_id AS u, "
        "epoch_us(ts) // 86400000000 AS d, event_type AS t, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2, 3), "
        "nsub AS (SELECT CAST(COUNT(DISTINCT (u, d)) AS BIGINT) AS n "
        "FROM c0), "
        "itm AS (SELECT t, CAST(SUM(c) AS BIGINT) AS s, "
        "CAST(SUM(c * c) AS BIGINT) AS q FROM c0 GROUP BY 1), "
        "num AS (SELECT CAST(SUM(nsub.n * itm.q - itm.s * itm.s) "
        "AS BIGINT) AS x FROM itm, nsub), "
        "st AS (SELECT u, d, CAST(SUM(c) AS BIGINT) AS tot FROM c0 "
        "GROUP BY 1, 2), "
        "den AS (SELECT nsub.n * CAST(SUM(st.tot * st.tot) AS BIGINT) "
        "- CAST(SUM(st.tot) AS BIGINT) * CAST(SUM(st.tot) AS BIGINT) "
        "AS x FROM st, nsub GROUP BY nsub.n) "
        "SELECT CAST(5 AS BIGINT) AS k_items, nsub.n AS n_subjects, "
        "num.x AS item_var_num, den.x AS total_var_num, "
        "ROUND(1.25 * (1.0 - CAST(num.x AS DOUBLE) "
        "/ CAST(den.x AS DOUBLE)), 6) AS alpha "
        "FROM nsub, num, den"
    )
    out["hits_scores"] = _hits_oracle_sql()
    out["mst_cells"] = _mst_oracle_sql()
    out["binseg_changepoints"] = (
        # mirrors _q_binseg_changepoints (Jenks integer cost kernel,
        # level-1 argmin by (total, s), level-2 max exact cost drop)
        "WITH " + _dense_daily +
        "p AS (SELECT t, CAST(y AS HUGEINT) AS y, "
        "CAST(SUM(y) OVER (ORDER BY t) AS HUGEINT) AS cp1, "
        "CAST(SUM(CAST(y AS HUGEINT) * y) OVER (ORDER BY t) AS HUGEINT) "
        "AS cp2 FROM dn), "
        "cst AS MATERIALIZED (SELECT a.t AS a, b.t AS b, "
        "((b.t - a.t + 1) * (b.cp2 - a.cp2 + a.y * a.y) "
        "- (b.cp1 - a.cp1 + a.y) * (b.cp1 - a.cp1 + a.y)) "
        "// (b.t - a.t + 1) AS c FROM p a JOIN p b ON b.t >= a.t), "
        "nm AS (SELECT MAX(t) AS t FROM dn), "
        "cf AS (SELECT c FROM cst, nm WHERE a = 0 AND b = nm.t), "
        "l1 AS (SELECT c1.b AS s, c1.c + c2.c AS tot FROM cst c1 "
        "JOIN cst c2 ON c2.a = c1.b + 1 CROSS JOIN nm "
        "WHERE c1.a = 0 AND c2.b = nm.t), "
        "e1 AS (SELECT s, tot FROM l1 ORDER BY tot, s LIMIT 1), "
        "segs AS (SELECT CAST(0 AS BIGINT) AS a, e1.s AS b FROM e1 "
        "UNION ALL SELECT e1.s + 1, nm.t FROM e1, nm), "
        "cand AS (SELECT segs.a, segs.b, c1.b AS s, "
        "cs.c - c1.c - c2.c AS g FROM segs "
        "JOIN cst cs ON cs.a = segs.a AND cs.b = segs.b "
        "JOIN cst c1 ON c1.a = segs.a AND c1.b < segs.b "
        "JOIN cst c2 ON c2.a = c1.b + 1 AND c2.b = segs.b), "
        "e2 AS (SELECT * FROM cand ORDER BY g DESC, s LIMIT 1) "
        "SELECT CAST(1 AS BIGINT) AS rk, CAST(0 AS BIGINT) AS seg_a, "
        "CAST(nm.t AS BIGINT) AS seg_b, CAST(e1.s AS BIGINT) "
        "AS split_t, CAST(cf.c - e1.tot AS BIGINT) AS cost_drop "
        "FROM nm, cf, e1 UNION ALL "
        "SELECT 2, CAST(e2.a AS BIGINT), CAST(e2.b AS BIGINT), "
        "CAST(e2.s AS BIGINT), CAST(e2.g AS BIGINT) FROM e2"
    )
    out["atkinson_index"] = (
        # mirrors _q_atkinson_index (1e9 log ticks, truncating tick
        # mean, pinned exp/ratio chain)
        "WITH " + _dense_daily +
        "pos AS (SELECT y FROM dn WHERE y > 0), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS s FROM pos), "
        "lt AS (SELECT CAST(ROUND(LN(CAST(y AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT) AS l FROM pos), "
        "mq AS (SELECT CAST(SUM(l) AS BIGINT) // nn.n AS m FROM lt, nn "
        "GROUP BY nn.n) "
        "SELECT nn.n AS n_days, nn.s AS total_cents, "
        "mq.m AS mean_log_ticks, "
        "ROUND(1.0 - EXP(CAST(mq.m AS DOUBLE) / 1e9) * nn.n / nn.s, 6) "
        "AS atkinson FROM nn, mq"
    )
    out["palma_ratio"] = (
        # mirrors _q_palma_ratio (exact decile cut counts, order-
        # statistic sums over the dense series, single ratio float)
        "WITH " + _dense_daily +
        "r AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y, t) AS rn "
        "FROM dn), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "bt AS (SELECT CAST(SUM(y) AS BIGINT) AS s FROM r, nn "
        "WHERE rn <= (4 * nn.n) // 10), "
        "tp AS (SELECT CAST(SUM(y) AS BIGINT) AS s FROM r, nn "
        "WHERE rn > (9 * nn.n) // 10) "
        "SELECT nn.n AS n_days, bt.s AS bottom40_cents, "
        "tp.s AS top10_cents, ROUND(CAST(tp.s AS DOUBLE) "
        "/ CAST(bt.s AS DOUBLE), 6) AS palma FROM nn, bt, tp"
    )
    out["hilbert_cells"] = (
        # mirrors _q_hilbert_cells (order-7 xy2d: 7 unrolled
        # reflect/swap rounds over distinct cells, counts per bucket)
        "WITH cc AS (SELECT event_id % 96 AS cx, "
        "event_id // 96 % 96 AS cy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "h0 AS (SELECT cx, cy, n, cx AS x, cy AS y, "
        "CAST(0 AS BIGINT) AS d FROM cc), "
        + ", ".join(_hsteps)
        + f" SELECT d // 128 AS bucket, "
        f"CAST(SUM(n) AS BIGINT) AS n_events FROM h{_hi} "
        "GROUP BY 1 ORDER BY 1"
    )
    out["randomized_response"] = (
        # mirrors _q_randomized_response (mix32 keep/replace stream,
        # exact 5-ary debias (20*obs - n) / 15)
        f"WITH e AS (SELECT event_type AS t, ({_rr_u}) AS u "
        "FROM events), "
        "obs AS (SELECT CASE WHEN (u % 4) <> 0 THEN t ELSE "
        "CASE ((u // 4) % 5) WHEN 0 THEN 'click' WHEN 1 THEN 'error' "
        "WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' "
        "ELSE 'view' END END AS rt FROM e), "
        "oc AS (SELECT rt, CAST(COUNT(*) AS BIGINT) AS c FROM obs "
        "GROUP BY 1), "
        "tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM e "
        "GROUP BY 1), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e) "
        "SELECT tc.t AS event_type, tc.c AS n_true, oc.c AS n_obs, "
        "ROUND(CAST(20 * oc.c - nn.n AS DOUBLE) / 15.0, 6) AS n_hat "
        "FROM tc JOIN oc ON oc.rt = tc.t, nn ORDER BY 1"
    )
    out["cochran_q"] = (
        # mirrors _q_cochran_q (presence matrix over 8-hour bands,
        # exact integer row/column totals)
        "WITH p AS (SELECT DISTINCT user_id AS u, "
        "epoch_us(ts) // 86400000000 AS d, "
        "epoch_us(ts) // 3600000000 % 24 // 8 AS j FROM events), "
        "cj AS (SELECT j, CAST(COUNT(*) AS BIGINT) AS c FROM p "
        "GROUP BY 1), "
        "rs AS (SELECT u, d, CAST(COUNT(*) AS BIGINT) AS r FROM p "
        "GROUP BY 1, 2), "
        "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, "
        "CAST(SUM(c * c) AS BIGINT) AS sc2 FROM cj), "
        "rr AS (SELECT CAST(SUM(r * r) AS BIGINT) AS sr2 FROM rs), "
        "ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS g FROM rs) "
        "SELECT CAST(3 AS BIGINT) AS k_bands, ns.g AS n_subjects, "
        "tot.n AS n_success, "
        "ROUND(2.0 * (3 * tot.sc2 - tot.n * tot.n) "
        "/ (3 * tot.n - rr.sr2), 6) AS q_stat FROM tot, rr, ns"
    )
    out["icc_estimate"] = (
        # mirrors _q_icc_estimate (1e3-tick between/within SS from
        # exact per-user moments, k0 unequal-size correction)
        "WITH g AS (SELECT user_id AS u, "
        "CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS HUGEINT) "
        "AS s, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT) "
        "* CAST(ROUND(value * 100, 0) AS BIGINT)) AS HUGEINT) AS q "
        "FROM events GROUP BY 1), "
        "tq AS (SELECT u, n, s, q, (s * s * 1000) // n AS t FROM g), "
        "agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS gg, "
        "CAST(SUM(n) AS HUGEINT) AS nn, CAST(SUM(s) AS HUGEINT) AS ss, "
        "CAST(SUM(q) AS HUGEINT) AS qq, CAST(SUM(t) AS HUGEINT) AS st, "
        "CAST(SUM(n * n) AS HUGEINT) AS sn2 FROM tq), "
        "v AS (SELECT gg, nn, st - (ss * ss * 1000) // nn AS ssbq, "
        "qq * 1000 - st AS sswq, sn2 FROM agg), "
        "m AS (SELECT gg, nn, ssbq, sswq, "
        "CAST(ssbq AS DOUBLE) / 1000.0 / CAST(gg - 1 AS DOUBLE) AS msb, "
        "CAST(sswq AS DOUBLE) / 1000.0 / CAST(nn - gg AS DOUBLE) AS msw, "
        "CAST(nn * nn - sn2 AS DOUBLE) "
        "/ CAST(nn * (gg - 1) AS DOUBLE) AS k0 FROM v) "
        "SELECT CAST(gg AS BIGINT) AS g_groups, CAST(nn AS BIGINT) "
        "AS n_obs, CAST(ssbq AS BIGINT) AS ssb_q, CAST(sswq AS BIGINT) "
        "AS ssw_q, ROUND((msb - msw) / (msb + (k0 - 1.0) * msw), 6) "
        "AS icc FROM m"
    )
    out["proximity_graphs"] = (
        # mirrors _q_proximity_graphs (integer squared-Euclidean
        # Gabriel / RNG certificates over the top-12 cells)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top12 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 12), "
        "nd AS MATERIALIZED (SELECT cell, cell % 96 AS x, "
        "cell // 96 AS y FROM top12), "
        "pr AS (SELECT a.cell AS a_cell, a.x AS ax, a.y AS ay, "
        "b.cell AS b_cell, b.x AS bx, b.y AS by_, "
        "CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) "
        "AS BIGINT) AS d2 FROM nd a JOIN nd b ON a.cell < b.cell) "
        "SELECT a_cell, b_cell, d2, "
        "CAST(CASE WHEN EXISTS (SELECT 1 FROM nd c "
        "WHERE c.cell <> pr.a_cell AND c.cell <> pr.b_cell "
        "AND (c.x - pr.ax) * (c.x - pr.ax) "
        "+ (c.y - pr.ay) * (c.y - pr.ay) "
        "+ (c.x - pr.bx) * (c.x - pr.bx) "
        "+ (c.y - pr.by_) * (c.y - pr.by_) < pr.d2) "
        "THEN 0 ELSE 1 END AS BIGINT) AS is_gabriel, "
        "CAST(CASE WHEN EXISTS (SELECT 1 FROM nd c "
        "WHERE c.cell <> pr.a_cell AND c.cell <> pr.b_cell "
        "AND GREATEST((c.x - pr.ax) * (c.x - pr.ax) "
        "+ (c.y - pr.ay) * (c.y - pr.ay), "
        "(c.x - pr.bx) * (c.x - pr.bx) "
        "+ (c.y - pr.by_) * (c.y - pr.by_)) < pr.d2) "
        "THEN 0 ELSE 1 END AS BIGINT) AS is_rng "
        "FROM pr ORDER BY 1, 2"
    )
    out["min_cut_cells"] = (
        # mirrors _q_min_cut_cells (2^12 subset enumeration, crossing-
        # capacity sums, ties by smallest interior mask)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top14 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 14), "
        "nd AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY cell) - 1 "
        "AS BIGINT) AS i, cell % 96 AS x, cell // 96 AS y FROM top14), "
        "cp AS MATERIALIZED (SELECT a.i AS i, b.i AS j, "
        "1000 // (1 + ABS(a.x - b.x) + ABS(a.y - b.y)) AS cap "
        "FROM nd a JOIN nd b ON a.i < b.i), "
        "mk AS (SELECT r.range AS m FROM range(0, 4096) r), "
        "cut AS (SELECT mk.m, CAST(SUM(cp.cap) AS BIGINT) AS cut "
        "FROM mk JOIN cp ON "
        "(CASE WHEN cp.i = 0 THEN 1 WHEN cp.i <= 12 "
        "THEN (mk.m >> (cp.i - 1)) & 1 ELSE 0 END) <> "
        "(CASE WHEN cp.j = 0 THEN 1 WHEN cp.j <= 12 "
        "THEN (mk.m >> (cp.j - 1)) & 1 ELSE 0 END) GROUP BY 1) "
        "SELECT CAST(14 AS BIGINT) AS n_nodes, cut AS min_cut, "
        "CAST(m AS BIGINT) AS best_mask FROM cut "
        "ORDER BY cut, m LIMIT 1"
    )
    out["assignment_min_cost"] = _assignment_oracle_sql()
    out["activity_selection"] = (
        # mirrors _q_activity_selection (recursive chain of MIN(end)
        # jumps per type == greedy-by-earliest-finish count)
        "WITH RECURSIVE iv AS (SELECT event_type AS t, epoch_us(ts) "
        "AS s, epoch_us(ts) + (60 + event_id % 3600) * 1000000 AS e "
        "FROM events), "
        "chain AS (SELECT t, MIN(e) AS e FROM iv GROUP BY t "
        "UNION ALL SELECT chain.t, (SELECT MIN(iv.e) FROM iv "
        "WHERE iv.t = chain.t AND iv.s >= chain.e) FROM chain "
        "WHERE EXISTS (SELECT 1 FROM iv WHERE iv.t = chain.t "
        "AND iv.s >= chain.e)), "
        "cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM iv "
        "GROUP BY 1) "
        "SELECT chain.t AS event_type, CAST(COUNT(*) AS BIGINT) "
        "AS n_selected, MIN(cnt.c) AS n_intervals FROM chain "
        "JOIN cnt ON cnt.t = chain.t GROUP BY 1 ORDER BY 1"
    )
    out["fleiss_kappa"] = (
        # mirrors _q_fleiss_kappa (first-3-raters pick by (ts,
        # event_id), exact integer agreement sums)
        "WITH r AS (SELECT user_id AS u, "
        "epoch_us(ts) // 86400000000 AS d, event_type AS t, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, "
        "epoch_us(ts) // 86400000000 ORDER BY ts, event_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY user_id, "
        "epoch_us(ts) // 86400000000) AS cnt FROM events), "
        "sel AS (SELECT u, d, t FROM r WHERE cnt >= 3 AND rn <= 3), "
        "nij AS (SELECT u, d, t, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM sel GROUP BY 1, 2, 3), "
        "subj AS (SELECT u, d, CAST(SUM(n * n) AS BIGINT) AS a "
        "FROM nij GROUP BY 1, 2), "
        "cj AS (SELECT t, CAST(SUM(n) AS BIGINT) AS c FROM nij "
        "GROUP BY 1), "
        "agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS nsub, "
        "CAST(SUM(a) AS BIGINT) AS a FROM subj), "
        "sc AS (SELECT CAST(SUM(c * c) AS BIGINT) AS sc2 FROM cj), "
        "m AS (SELECT agg.nsub, agg.a, sc.sc2, "
        "CAST(agg.a - 3 * agg.nsub AS DOUBLE) / (6 * agg.nsub) AS pb, "
        "CAST(sc.sc2 AS DOUBLE) / (agg.nsub * 3) / (agg.nsub * 3) "
        "AS pe FROM agg, sc) "
        "SELECT nsub AS n_subjects, CAST(3 AS BIGINT) AS m_raters, "
        "a AS a_sum, sc2 AS c_sq_sum, ROUND(pb, 6) AS p_bar, "
        "ROUND(pe, 6) AS p_e, "
        "ROUND((pb - pe) / (1 - pe), 6) AS kappa FROM m"
    )
    out["shapley_attribution"] = (
        # mirrors _q_shapley_attribution (2^3 coalition enumeration,
        # exact x6 Shapley weights over subset-closure counts)
        "WITH f AS (SELECT user_id AS u, "
        "MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c, "
        "MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v, "
        "MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s, "
        "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p "
        "FROM events GROUP BY 1), "
        "mk AS (SELECT c + 2 * v + 4 * s AS mask FROM f WHERE p = 1), "
        "subs AS (SELECT r.range AS m, (r.range & 1) "
        "+ ((r.range >> 1) & 1) + ((r.range >> 2) & 1) AS pc "
        "FROM range(0, 8) r), "
        "vs AS (SELECT subs.m AS sm, CAST(COUNT(mk.mask) AS BIGINT) "
        "AS v FROM subs LEFT JOIN mk "
        "ON (mk.mask & (7 - subs.m)) = 0 GROUP BY 1), "
        "ch AS (SELECT * FROM (VALUES ('click', 1), ('view', 2), "
        "('signup', 4)) AS t(name, bit)), "
        "phi AS (SELECT ch.name, CAST(SUM((CASE subs.pc WHEN 0 THEN 2 "
        "WHEN 1 THEN 1 ELSE 2 END) * (va.v - vb.v)) AS BIGINT) "
        "AS phi6 FROM ch JOIN subs ON (subs.m & ch.bit) = 0 "
        "JOIN vs va ON va.sm = (subs.m | ch.bit) "
        "JOIN vs vb ON vb.sm = subs.m GROUP BY 1) "
        "SELECT name AS channel, phi6 AS phi_x6, "
        "ROUND(CAST(phi6 AS DOUBLE) / 6.0, 6) AS phi FROM phi "
        "ORDER BY 1"
    )
    return out
