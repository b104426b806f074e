"""DuckDB oracle SQL, part 02 of 4.

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
    out["hist_intersection"] = (
        "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source, lang), "
        "s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot "
        "FROM c GROUP BY source), "
        "q AS (SELECT x.source AS source_a, y.source AS source_b, "
        "CAST(ROUND(LEAST("
        "CAST(x.n AS DOUBLE) / CAST(sa.tot AS DOUBLE), "
        "CAST(y.n AS DOUBLE) / CAST(sb.tot AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) AS tq "
        "FROM c x JOIN c y ON y.lang = x.lang AND x.source < y.source "
        "JOIN s sa ON sa.source = x.source "
        "JOIN s sb ON sb.source = y.source) "
        "SELECT source_a, source_b, "
        "ROUND(CAST(SUM(tq) AS DOUBLE) / 1e12, 6) AS overlap "
        "FROM q GROUP BY source_a, source_b"
    )
    out["holt_linear"] = (
        # recursive-CTE Holt smoothing over the dense daily series;
        # level/trend expressions literally repeat _q_holt_linear's
        "WITH RECURSIVE c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "h(t, l, b) AS ("
        "SELECT 0, CAST(x0.x AS DOUBLE), "
        "CAST(x1.x AS DOUBLE) - CAST(x0.x AS DOUBLE) "
        "FROM dn x0, dn x1 WHERE x0.t = 0 AND x1.t = 1 "
        "UNION ALL "
        "SELECT h.t + 1, "
        "(0.3 * d.x) + (0.7 * (h.l + h.b)), "
        "(0.1 * (((0.3 * d.x) + (0.7 * (h.l + h.b))) - h.l)) "
        "+ (0.9 * h.b) "
        "FROM h JOIN dn d ON d.t = h.t + 1) "
        "SELECT ROUND(l, 6) AS level, ROUND(b, 6) AS trend, "
        "ROUND(l + 7.0 * b, 6) AS forecast_7 FROM h "
        "WHERE t = (SELECT hi - lo FROM mm)"
    )
    out["seq_edit_distance"] = (
        # STRING_AGG initial-char sequences; deterministic top-20 cut
        "WITH s AS (SELECT user_id, COUNT(*) AS n, "
        "STRING_AGG(SUBSTR(event_type, 1, 1), '' "
        "ORDER BY ts, event_id) AS seq FROM events GROUP BY user_id), "
        "top AS (SELECT user_id, seq FROM s "
        "ORDER BY n DESC, user_id LIMIT 20) "
        "SELECT a.user_id AS u1, b.user_id AS u2, "
        "CAST(LEVENSHTEIN(a.seq, b.seq) AS BIGINT) AS dist "
        "FROM top a JOIN top b ON a.user_id < b.user_id"
    )
    out["ql_retrieval"] = (
        "WITH tokens AS (SELECT doc_id, "
        "UNNEST(string_split_regex(text, '\\s+')) AS w "
        "FROM documents), "
        "tk AS (SELECT doc_id, w FROM tokens WHERE w <> ''), "
        "d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len, "
        "CAST(SUM(CASE WHEN w = 'hash' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS tf_hash, "
        "CAST(SUM(CASE WHEN w = 'join' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS tf_join, "
        "CAST(SUM(CASE WHEN w = 'table' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS tf_table FROM tk GROUP BY doc_id), "
        "g AS (SELECT CAST(SUM(len) AS DOUBLE) AS t, "
        "CAST(SUM(tf_hash) AS DOUBLE) AS cf_hash, "
        "CAST(SUM(tf_join) AS DOUBLE) AS cf_join, "
        "CAST(SUM(tf_table) AS DOUBLE) AS cf_table FROM d), "
        "s AS (SELECT d.doc_id, "
        "CAST(ROUND(LN((CAST(d.tf_hash AS DOUBLE) "
        "+ 100.0 * g.cf_hash / g.t) "
        "/ (CAST(d.len AS DOUBLE) + 100.0)) * 1e9, 0) AS BIGINT) "
        "+ CAST(ROUND(LN((CAST(d.tf_join AS DOUBLE) "
        "+ 100.0 * g.cf_join / g.t) "
        "/ (CAST(d.len AS DOUBLE) + 100.0)) * 1e9, 0) AS BIGINT) "
        "+ CAST(ROUND(LN((CAST(d.tf_table AS DOUBLE) "
        "+ 100.0 * g.cf_table / g.t) "
        "/ (CAST(d.len AS DOUBLE) + 100.0)) * 1e9, 0) AS BIGINT) "
        "AS score_q FROM d, g) "
        "SELECT doc_id, score_q FROM s "
        "ORDER BY score_q DESC, doc_id LIMIT 10"
    )
    out["cochran_armitage"] = (
        # mirrors _q_cochran_armitage: exact integer moments, one
        # float expression in the same operation order
        "WITH e AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS w, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r "
        "FROM events), "
        "a AS (SELECT w, CAST(SUM(r) AS BIGINT) AS r, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY w), "
        "m AS (SELECT CAST(SUM(w * r) AS BIGINT) AS t, "
        "CAST(SUM(r) AS BIGINT) AS rr, CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(SUM(w * n) AS BIGINT) AS swn, "
        "CAST(SUM(w * w * n) AS BIGINT) AS sw2n FROM a) "
        "SELECT t AS t_stat, rr AS r_total, nn AS n_total, "
        "CAST(ROUND((CAST(t AS DOUBLE) - CAST(rr AS DOUBLE) "
        "/ CAST(nn AS DOUBLE) * CAST(swn AS DOUBLE)) "
        "/ SQRT(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE) "
        "* (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "* (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE) "
        "* CAST(swn AS DOUBLE) / CAST(nn AS DOUBLE))) * 1e6, 0) "
        "AS BIGINT) AS z_q FROM m"
    )
    out["q8_market_share"] = (
        # mirrors _q_q8_market_share (region 0 customers, nation 0
        # suppliers)
        "WITH j AS (SELECT YEAR(o.o_orderdate) AS yr, "
        "s.s_nationkey AS sn, "
        "CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) * 100, 0) "
        "AS BIGINT) AS c "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer cu ON o.o_custkey = cu.c_custkey "
        "JOIN nation n ON cu.c_nationkey = n.n_nationkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "WHERE n.n_regionkey = 0) "
        "SELECT CAST(yr AS BIGINT) AS yr, "
        "CAST(SUM(CASE WHEN sn = 0 THEN c ELSE 0 END) AS BIGINT) "
        "AS num_cents, CAST(SUM(c) AS BIGINT) AS den_cents, "
        "CAST(ROUND(CAST(SUM(CASE WHEN sn = 0 THEN c ELSE 0 END) "
        "AS DOUBLE) / CAST(SUM(c) AS DOUBLE) * 1e9, 0) AS BIGINT) "
        "AS share_q FROM j GROUP BY yr ORDER BY yr"
    )
    out["hexbin_cells"] = (
        # mirrors _q_hexbin_cells: same axial + cube-round doubles
        "WITH p AS (SELECT CAST(event_id % 96 AS DOUBLE) AS x, "
        "CAST((event_id // 96) % 96 AS DOUBLE) AS y FROM events), "
        "f AS (SELECT (SQRT(3.0) / 3.0 * x - 1.0 / 3.0 * y) / 4.0 "
        "AS xq, (2.0 / 3.0 * y) / 4.0 AS zq FROM p), "
        "g AS (SELECT xq, zq, -xq - zq AS yq, "
        "ROUND(xq, 0) AS rx, ROUND(-xq - zq, 0) AS ry, "
        "ROUND(zq, 0) AS rz FROM f), "
        "d AS (SELECT xq, yq, zq, rx, ry, rz, "
        "ABS(rx - xq) AS dx, ABS(ry - yq) AS dy, ABS(rz - zq) AS dz "
        "FROM g), "
        "h AS (SELECT CASE WHEN dx > dy AND dx > dz THEN -ry - rz "
        "ELSE rx END AS fx, "
        "CASE WHEN NOT (dx > dy AND dx > dz) AND dy > dz "
        "THEN -rx - rz ELSE ry END AS fy, rx, ry, rz, dx, dy, dz "
        "FROM d), "
        "k AS (SELECT CAST(fx AS BIGINT) AS q, "
        "CAST(CASE WHEN NOT (dx > dy AND dx > dz) "
        "AND NOT (NOT (dx > dy AND dx > dz) AND dy > dz) "
        "THEN -fx - fy ELSE rz END AS BIGINT) AS r FROM h) "
        "SELECT q, r, CAST(COUNT(*) AS BIGINT) AS n FROM k "
        "GROUP BY q, r ORDER BY n DESC, q, r LIMIT 20"
    )
    out["edge_support"] = (
        # mirrors _q_edge_support on the same LEVENSHTEIN=1 graph
        "WITH v AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e1 AS (SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "ed AS (SELECT w1, w2 FROM e1 "
        "UNION ALL SELECT w2 AS w1, w1 AS w2 FROM e1) "
        "SELECT e.w1, e.w2, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM ed x JOIN ed y "
        "ON x.w2 = y.w2 WHERE x.w1 = e.w1 AND y.w1 = e.w2) AS support "
        "FROM e1 e ORDER BY support DESC, e.w1, e.w2 LIMIT 15"
    )
    out["daily_peaks"] = (
        # mirrors _q_daily_peaks via LAG/LEAD (series ends excluded)
        "WITH c AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS x FROM orders GROUP BY 1), "
        "m AS (SELECT CAST(SUM(x) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE) AS mu FROM c), "
        "w AS (SELECT d, x, LAG(x) OVER (ORDER BY d) AS xp, "
        "LEAD(x) OVER (ORDER BY d) AS xn FROM c) "
        "SELECT d, x AS cents FROM w, m "
        "WHERE xp IS NOT NULL AND xn IS NOT NULL "
        "AND x > xp AND x > xn AND CAST(x AS DOUBLE) > 1.1 * m.mu "
        "ORDER BY d"
    )
    out["weibull_shape"] = (
        # KM construction identical to the kaplan_meier oracle, then
        # the quantized log-log OLS tail (fractal_boxcount pattern)
        "WITH peru AS (SELECT user_id, MIN(epoch_us(ts)) AS t0, "
        "MAX(epoch_us(ts)) AS tlast, "
        "MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) "
        "AS terr FROM events GROUP BY user_id), "
        "dur AS (SELECT CASE WHEN terr IS NOT NULL THEN terr - t0 "
        "ELSE tlast - t0 END AS d, "
        "CASE WHEN terr IS NOT NULL THEN 1 ELSE 0 END AS obs "
        "FROM peru), "
        "ev AS (SELECT d AS t, CAST(COUNT(*) AS BIGINT) AS di "
        "FROM dur WHERE obs = 1 GROUP BY d), "
        "risk AS (SELECT ev.t, ev.di, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM dur "
        "WHERE dur.d >= ev.t) AS ni FROM ev), "
        "r2 AS (SELECT t, di, ni, "
        "(CAST(ni AS DOUBLE) - CAST(di AS DOUBLE)) "
        "/ CAST(ni AS DOUBLE) AS ratio FROM risk), "
        "km AS (SELECT t, "
        "ROUND(CASE WHEN SUM(CASE WHEN ratio = 0.0 THEN 1 ELSE 0 END) "
        "OVER (ORDER BY t) > 0 THEN 0.0 ELSE "
        "EXP(SUM(LN(CASE WHEN ratio = 0.0 THEN 1.0 ELSE ratio END)) "
        "OVER (ORDER BY t)) END, 6) AS s FROM r2), "
        "q AS (SELECT "
        "CAST(ROUND(LN(CAST(t AS DOUBLE)) * 1e12, 0) AS BIGINT) AS u, "
        "CAST(ROUND(LN(-LN(s)) * 1e12, 0) AS BIGINT) AS v "
        "FROM km WHERE s > 0.0 AND s < 1.0 AND t > 0), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k, "
        "CAST(SUM(u) AS HUGEINT) AS su, CAST(SUM(v) AS HUGEINT) AS sv, "
        "SUM(CAST(u AS HUGEINT) * CAST(v AS HUGEINT)) AS suv, "
        "SUM(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS suu FROM q) "
        "SELECT CAST(k AS BIGINT) AS n_points, "
        "ROUND(CAST(k * suv - su * sv AS DOUBLE) "
        "/ CAST(k * suu - su * su AS DOUBLE), 6) AS weibull_shape "
        "FROM m"
    )
    out["band_mutual_info"] = (
        # mirrors _q_band_mutual_info (same two-band formula grid as
        # band_correlation; joint 10x10 deci-bin histogram)
        "WITH mb AS (" + "SELECT b.b AS band, r.range AS row, c.range AS col, "
        "CASE WHEN (r.range * 5 + c.range * 3 + b.b) % 29 = 0 THEN NULL "
        "ELSE CAST(ROUND(CAST(CAST(((r.range * 73 + c.range * 31 "
        "+ b.b * 101) % 500) / 10.0 AS REAL) AS DOUBLE) * 10.0, 0) "
        "AS BIGINT) END AS k "
        "FROM range(0, 96) r, range(0, 96) c, (VALUES (1), (2)) b(b)" + "), "
        "j AS (SELECT a.k // 50 AS b1, d.k // 50 AS b2 FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "cj AS (SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM j GROUP BY 1, 2), "
        "a AS (SELECT CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) "
        "* LN(CAST(c AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS aa, CAST(SUM(c) AS BIGINT) AS n FROM cj), "
        "r AS (SELECT CAST(SUM(CAST(ROUND(CAST(rc AS DOUBLE) "
        "* LN(CAST(rc AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS rr FROM (SELECT CAST(SUM(c) AS BIGINT) AS rc FROM cj "
        "GROUP BY b1)), "
        "s AS (SELECT CAST(SUM(CAST(ROUND(CAST(sc AS DOUBLE) "
        "* LN(CAST(sc AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS ss FROM (SELECT CAST(SUM(c) AS BIGINT) AS sc FROM cj "
        "GROUP BY b2)) "
        "SELECT a.n AS n_cells, "
        "ROUND(LN(CAST(a.n AS DOUBLE)) + (CAST(a.aa AS DOUBLE) "
        "- CAST(r.rr AS DOUBLE) - CAST(s.ss AS DOUBLE)) / 1e12 "
        "/ CAST(a.n AS DOUBLE), 6) AS mi FROM a, r, s"
    )
    out["otsu_threshold"] = (
        # mirrors _q_otsu_threshold over the same frozen grid
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "h AS (SELECT CAST(ROUND(z * 10, 0) AS BIGINT) AS k, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM g WHERE z > -1e30 "
        "GROUP BY 1), "
        "m AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(SUM(k * n) AS BIGINT) AS s FROM h), "
        "c AS (SELECT k, "
        "CAST(SUM(n) OVER (ORDER BY k) AS BIGINT) AS c0, "
        "CAST(SUM(k * n) OVER (ORDER BY k) AS BIGINT) AS s0 FROM h), "
        "f AS (SELECT c.k, c.c0, "
        "(CAST(m.s AS DOUBLE) * CAST(c.c0 AS DOUBLE) "
        "- CAST(m.nn AS DOUBLE) * CAST(c.s0 AS DOUBLE)) "
        "* (CAST(m.s AS DOUBLE) * CAST(c.c0 AS DOUBLE) "
        "- CAST(m.nn AS DOUBLE) * CAST(c.s0 AS DOUBLE)) "
        "/ (CAST(c.c0 AS DOUBLE) "
        "* (CAST(m.nn AS DOUBLE) - CAST(c.c0 AS DOUBLE))) AS f, "
        "m.nn AS nn FROM c, m WHERE c.c0 < m.nn) "
        "SELECT k AS threshold_k, c0 AS n_below, nn AS n_total, "
        "CAST(ROUND(f / 1e6, 0) AS BIGINT) AS f_q "
        "FROM f ORDER BY f DESC, k LIMIT 1"
    )
    out["eigen_centrality"] = (
        # mirrors _q_eigen_centrality: 8 unrolled max-normalized
        # integer power iterations (no recursion needed for a fixed
        # iteration count)
        "WITH v AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e1 AS (SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "ed AS (SELECT w1, w2 FROM e1 "
        "UNION ALL SELECT w2 AS w1, w1 AS w2 FROM e1), "
        "vv AS (SELECT DISTINCT w1 AS w FROM ed), "
        "x0 AS (SELECT w, CAST(1000000 AS BIGINT) AS x FROM vv), "
        "s1 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x0 x ON x.w = e.w1 GROUP BY e.w2), "
        "m1 AS (SELECT MAX(s) AS m FROM s1), "
        "x1 AS (SELECT s1.w, CAST(ROUND(CAST(s1.s AS DOUBLE) * 1e6 / CAST(m1.m AS DOUBLE), 0) AS BIGINT) AS x FROM s1, m1), "
        "s2 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x1 x ON x.w = e.w1 GROUP BY e.w2), "
        "m2 AS (SELECT MAX(s) AS m FROM s2), "
        "x2 AS (SELECT s2.w, CAST(ROUND(CAST(s2.s AS DOUBLE) * 1e6 / CAST(m2.m AS DOUBLE), 0) AS BIGINT) AS x FROM s2, m2), "
        "s3 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x2 x ON x.w = e.w1 GROUP BY e.w2), "
        "m3 AS (SELECT MAX(s) AS m FROM s3), "
        "x3 AS (SELECT s3.w, CAST(ROUND(CAST(s3.s AS DOUBLE) * 1e6 / CAST(m3.m AS DOUBLE), 0) AS BIGINT) AS x FROM s3, m3), "
        "s4 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x3 x ON x.w = e.w1 GROUP BY e.w2), "
        "m4 AS (SELECT MAX(s) AS m FROM s4), "
        "x4 AS (SELECT s4.w, CAST(ROUND(CAST(s4.s AS DOUBLE) * 1e6 / CAST(m4.m AS DOUBLE), 0) AS BIGINT) AS x FROM s4, m4), "
        "s5 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x4 x ON x.w = e.w1 GROUP BY e.w2), "
        "m5 AS (SELECT MAX(s) AS m FROM s5), "
        "x5 AS (SELECT s5.w, CAST(ROUND(CAST(s5.s AS DOUBLE) * 1e6 / CAST(m5.m AS DOUBLE), 0) AS BIGINT) AS x FROM s5, m5), "
        "s6 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x5 x ON x.w = e.w1 GROUP BY e.w2), "
        "m6 AS (SELECT MAX(s) AS m FROM s6), "
        "x6 AS (SELECT s6.w, CAST(ROUND(CAST(s6.s AS DOUBLE) * 1e6 / CAST(m6.m AS DOUBLE), 0) AS BIGINT) AS x FROM s6, m6), "
        "s7 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x6 x ON x.w = e.w1 GROUP BY e.w2), "
        "m7 AS (SELECT MAX(s) AS m FROM s7), "
        "x7 AS (SELECT s7.w, CAST(ROUND(CAST(s7.s AS DOUBLE) * 1e6 / CAST(m7.m AS DOUBLE), 0) AS BIGINT) AS x FROM s7, m7), "
        "s8 AS (SELECT e.w2 AS w, CAST(SUM(x.x) AS BIGINT) AS s FROM ed e JOIN x7 x ON x.w = e.w1 GROUP BY e.w2), "
        "m8 AS (SELECT MAX(s) AS m FROM s8), "
        "x8 AS (SELECT s8.w, CAST(ROUND(CAST(s8.s AS DOUBLE) * 1e6 / CAST(m8.m AS DOUBLE), 0) AS BIGINT) AS x FROM s8, m8), "
        "f AS (SELECT w AS word, x AS score_q FROM x8) "
        "SELECT word, score_q FROM f "
        "ORDER BY score_q DESC, word LIMIT 15"
    )
    out["cross_k"] = (
        # brute ordered-pair mirror of _q_cross_k on the same subset
        "WITH p AS (SELECT event_id AS eid, event_type AS et, "
        "event_id % 96 AS gx, (event_id // 96) % 96 AS gy FROM events "
        "WHERE event_id % 5 = 0 "
        "AND event_type IN ('purchase', 'error')), "
        "a AS (SELECT * FROM p WHERE et = 'purchase'), "
        "b AS (SELECT * FROM p WHERE et = 'error'), "
        "d AS (SELECT (a.gx - b.gx) * (a.gx - b.gx) "
        "+ (a.gy - b.gy) * (a.gy - b.gy) AS d2 FROM a, b), "
        "n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS na, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS nb), "
        "c AS (SELECT r.r2 AS r2, CAST(SUM(CASE WHEN d.d2 <= r.r2 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs "
        "FROM (VALUES (4), (25), (64)) r(r2), d GROUP BY r.r2) "
        "SELECT CAST(c.r2 AS BIGINT) AS r2, c.n_pairs, "
        "CAST(ROUND(CAST(c.n_pairs AS DOUBLE) * 9216.0 "
        "/ (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT) AS k_q FROM c, n ORDER BY r2"
    )
    out["dwell_time"] = (
        # mirrors _q_dwell_time via LEAD over (user, ts, event_id)
        "WITH f AS (SELECT user_id, "
        "(event_id % 96) // 8 * 12 + ((event_id // 96) % 96) // 8 "
        "AS cell, epoch_us(ts) AS t, "
        "LEAD(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS tn FROM events) "
        "SELECT cell, CAST(SUM(tn - t) AS BIGINT) AS dwell_us "
        "FROM f WHERE tn IS NOT NULL GROUP BY cell "
        "ORDER BY dwell_us DESC, cell LIMIT 10"
    )
    out["char_bigram_entropy"] = (
        # mirrors _q_char_bigram_entropy: 2-char strings group exactly
        # like the engine's code-point pair keys
        "WITH cs AS (SELECT lang, string_split(text, '') AS s "
        "FROM documents), "
        "bg AS (SELECT lang, s[i] || s[i+1] AS g FROM cs, "
        "LATERAL (SELECT UNNEST(generate_series(1, len(s)-1)) AS i) "
        "WHERE len(s) >= 2), "
        "c AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM bg GROUP BY lang, g), "
        "q AS (SELECT lang, n, "
        "CAST(ROUND(CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE)) * 1e12, "
        "0) AS BIGINT) AS tq FROM c) "
        "SELECT lang, CAST(SUM(n) AS BIGINT) AS n_bigrams, "
        "CAST(COUNT(*) AS BIGINT) AS vocab, "
        "ROUND(LN(CAST(SUM(n) AS DOUBLE)) "
        "- (CAST(SUM(tq) AS DOUBLE) / 1e12) / CAST(SUM(n) AS DOUBLE), "
        "6) AS entropy FROM q GROUP BY lang ORDER BY lang"
    )
    out["mmr_topk"] = (
        # recursive greedy MMR over the same 1e6-quantized int dots
        "WITH RECURSIVE c AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id % 10 = 0), "
        "el AS (SELECT vec_id, "
        "UNNEST(generate_series(1, len(embedding))) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e6, 0) "
        "AS BIGINT) AS q FROM c), "
        "dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, "
        "CAST(SUM(a.q * b.q) AS BIGINT) AS dot "
        "FROM el a JOIN el b ON a.i = b.i GROUP BY 1, 2), "
        "relv AS (SELECT vb AS v, dot AS rel FROM dots "
        "WHERE va = 0 AND vb <> 0), "
        "p(k, sel) AS ("
        "SELECT 1, [(SELECT v FROM relv ORDER BY rel DESC, v LIMIT 1)] "
        "UNION ALL "
        "SELECT p.k + 1, list_append(p.sel, t.v) FROM p, LATERAL ("
        "SELECT r.v FROM relv r JOIN dots d ON d.vb = r.v "
        "AND list_contains(p.sel, d.va) "
        "WHERE NOT list_contains(p.sel, r.v) "
        "GROUP BY r.v, r.rel ORDER BY r.rel - MAX(d.dot) DESC, r.v "
        "LIMIT 1) t WHERE p.k < 5), "
        "f AS (SELECT sel FROM p ORDER BY k DESC LIMIT 1) "
        "SELECT CAST(UNNEST(generate_series(1, len(sel))) AS BIGINT) "
        "AS pos, CAST(UNNEST(sel) AS BIGINT) AS vec_id FROM f"
    )
    out["western_electric"] = (
        # mirrors _q_western_electric: integer zone indicators +
        # exact window sums; trailing windows clip at the series start
        "WITH c AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS x FROM orders GROUP BY 1), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS s, "
        "SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) "
        "AS s2 FROM c), "
        "g AS (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu, "
        "SQRT(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS sd FROM m), "
        "z AS (SELECT d, CAST(x AS DOUBLE) AS xf FROM c), "
        "ind AS (SELECT d, xf, "
        "CASE WHEN xf > g.mu + 2.0 * g.sd THEN 1 ELSE 0 END AS a2, "
        "CASE WHEN xf < g.mu - 2.0 * g.sd THEN 1 ELSE 0 END AS b2, "
        "CASE WHEN xf > g.mu THEN 1 ELSE 0 END AS a0, "
        "CASE WHEN xf < g.mu THEN 1 ELSE 0 END AS b0, "
        "CASE WHEN xf > g.mu + 3.0 * g.sd "
        "OR xf < g.mu - 3.0 * g.sd THEN 1 ELSE 0 END AS r1 "
        "FROM z, g), "
        "w AS (SELECT d, r1, "
        "SUM(a2) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND "
        "CURRENT ROW) AS wa2, "
        "SUM(b2) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND "
        "CURRENT ROW) AS wb2, "
        "SUM(a0) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND "
        "CURRENT ROW) AS wa0, "
        "SUM(b0) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND "
        "CURRENT ROW) AS wb0 FROM ind) "
        "SELECT d, CAST(1 AS BIGINT) AS rule FROM w WHERE r1 = 1 "
        "UNION ALL "
        "SELECT d, CAST(2 AS BIGINT) FROM w WHERE wa2 >= 2 OR wb2 >= 2 "
        "UNION ALL "
        "SELECT d, CAST(4 AS BIGINT) FROM w WHERE wa0 = 8 OR wb0 = 8 "
        "ORDER BY d, rule"
    )
    out["friedman_test"] = (
        # mirrors _q_friedman_test: 2x tie-averaged integer ranks
        # within weekday blocks, exact rank sums, one float Q
        "WITH e AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS w, "
        "event_type, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS c FROM events GROUP BY 1, 2), "
        "r AS (SELECT a.event_type, "
        "CAST(2 * SUM(CASE WHEN b.c < a.c THEN 1 ELSE 0 END) "
        "+ SUM(CASE WHEN b.c = a.c THEN 1 ELSE 0 END) + 1 AS BIGINT) "
        "AS r2 FROM e a JOIN e b ON a.w = b.w "
        "GROUP BY a.w, a.event_type, a.c), "
        "j AS (SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_sum "
        "FROM r GROUP BY event_type), "
        "m AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS n, "
        "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM e), "
        "s AS (SELECT CAST(SUM(CAST(r2_sum AS HUGEINT) "
        "* CAST(r2_sum AS HUGEINT)) AS BIGINT) AS s2 FROM j) "
        "SELECT j.event_type, j.r2_sum, "
        "CAST(ROUND((3.0 / (CAST(m.n AS DOUBLE) * CAST(m.k AS DOUBLE) "
        "* CAST(m.k + 1 AS DOUBLE)) * CAST(s.s2 AS DOUBLE) "
        "- 3.0 * CAST(m.n AS DOUBLE) * CAST(m.k + 1 AS DOUBLE)) "
        "* 1e6, 0) AS BIGINT) AS q_q "
        "FROM j, m, s ORDER BY j.event_type"
    )
    out["page_hinkley"] = (
        # mirrors _q_page_hinkley: integer cumsum minus running MIN
        "WITH c AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS x FROM orders GROUP BY 1), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS tot FROM c), "
        "mu AS (SELECT CAST(ROUND(CAST(t.tot AS DOUBLE) "
        "/ CAST(t.n AS DOUBLE), 0) AS BIGINT) AS mu FROM t), "
        "s AS (SELECT d, CAST(SUM(x - mu.mu) OVER (ORDER BY d) "
        "AS BIGINT) AS cum FROM c, mu), "
        "p AS (SELECT d, cum - CAST(MIN(cum) OVER (ORDER BY d) "
        "AS BIGINT) AS ph FROM s) "
        "SELECT p.d, p.ph FROM p, mu WHERE p.ph > 10 * mu.mu "
        "ORDER BY p.d"
    )
    out["boruvka_mst"] = (
        # recursive-CTE Prim over the same distinct-weight graph; a
        # unique MST makes Boruvka total == Prim total exactly
        "WITH RECURSIVE cnt AS (SELECT (event_id % 96) // 8 * 12 "
        "+ ((event_id // 96) % 96) // 8 AS cell, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "frame AS (SELECT x.range * 12 + y.range AS id "
        "FROM range(0,12) x, range(0,12) y), "
        "nodes AS (SELECT f.id AS id, COALESCE(c.n, 0) AS n "
        "FROM frame f LEFT JOIN cnt c ON c.cell = f.id), "
        "e1 AS (SELECT a.id AS u, b.id AS v, "
        "ABS(a.n - b.n) * 1048576 + a.id * 144 + b.id AS w "
        "FROM nodes a JOIN nodes b ON "
        "(b.id = a.id + 12 AND a.id // 12 < 11) "
        "OR (b.id = a.id + 1 AND a.id % 12 < 11)), "
        "ed AS (SELECT u, v, w FROM e1 "
        "UNION ALL SELECT v AS u, u AS v, w FROM e1), "
        "p(k, visited, total) AS ("
        "SELECT 0, [0], CAST(0 AS BIGINT) "
        "UNION ALL "
        "SELECT p.k + 1, list_append(p.visited, e.v), p.total + e.w "
        "FROM p JOIN ed e ON list_contains(p.visited, e.u) "
        "AND NOT list_contains(p.visited, e.v) "
        "WHERE p.k < 143 "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY e.w) = 1) "
        "SELECT CAST(k AS BIGINT) AS n_edges, total AS total_weight "
        "FROM p ORDER BY k DESC LIMIT 1"
    )
    out["bollinger_breakouts"] = (
        # mirrors _q_bollinger_breakouts: exact integer window sums
        "WITH c AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS x FROM orders GROUP BY 1), "
        "w AS (SELECT d, x, "
        "CAST(SUM(x) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND "
        "CURRENT ROW) AS BIGINT) AS s, "
        "SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) OVER "
        "(ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) "
        "AS s2, "
        "ROW_NUMBER() OVER (ORDER BY d) AS i FROM c), "
        "f AS (SELECT d, x, "
        "CAST(s AS DOUBLE) / 7.0 AS mean, "
        "SQRT(CAST(s2 AS DOUBLE) / 7.0 - (CAST(s AS DOUBLE) / 7.0) "
        "* (CAST(s AS DOUBLE) / 7.0)) AS sd FROM w WHERE i >= 7) "
        "SELECT d, x AS cents, "
        "CAST(ROUND(mean * 1e6, 0) AS BIGINT) AS mean_q, "
        "CAST(ROUND(sd * 1e6, 0) AS BIGINT) AS sd_q "
        "FROM f WHERE ABS(CAST(x AS DOUBLE) - mean) > 2.0 * sd "
        "ORDER BY d"
    )
    out["q7_volume"] = (
        # mirrors _q_q7_volume (nation keys 0/1 both directions)
        "SELECT s.s_nationkey AS supp_nation, "
        "c.c_nationkey AS cust_nation, "
        "CAST(YEAR(l.l_shipdate) AS BIGINT) AS yr, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice "
        "* (1.0 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "WHERE (c.c_nationkey = 0 AND s.s_nationkey = 1) "
        "OR (c.c_nationkey = 1 AND s.s_nationkey = 0) "
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    )
    out["bh_fdr"] = (
        # mirrors _q_bh_fdr: exact integer moments, identical float
        # z / pseudo-p expressions, BH step-up with MAX(rank) rule
        "WITH u AS (SELECT user_id, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS su, "
        "SUM(CAST(ROUND(value * 100, 0) AS BIGINT) "
        "* CAST(ROUND(value * 100, 0) AS BIGINT)) AS s2u, "
        "CAST(COUNT(*) AS BIGINT) AS nu FROM events GROUP BY user_id), "
        "g AS (SELECT CAST(SUM(su) AS BIGINT) AS s, "
        "CAST(SUM(s2u) AS BIGINT) AS s2, CAST(SUM(nu) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS m FROM u), "
        "z AS (SELECT u.user_id, "
        "(CAST(u.su AS DOUBLE) / CAST(u.nu AS DOUBLE) "
        "- CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)) "
        "/ (SQRT(CAST(g.s2 AS DOUBLE) / CAST(g.n AS DOUBLE) "
        "- (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)) "
        "* (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))) "
        "/ SQRT(CAST(u.nu AS DOUBLE))) AS z FROM u, g), "
        "pr AS (SELECT user_id, z, EXP(-z * z / 2.0) AS p FROM z), "
        "r AS (SELECT user_id, z, p, "
        "ROW_NUMBER() OVER (ORDER BY p, user_id) AS i FROM pr), "
        "k AS (SELECT COALESCE(MAX(CASE WHEN r.p <= "
        "CAST(r.i AS DOUBLE) / CAST(g.m AS DOUBLE) * 0.2 "
        "THEN r.i END), 0) AS kmax FROM r, g) "
        "SELECT r.user_id, r.i AS rank_i, "
        "CAST(ROUND(r.z * 1e6, 0) AS BIGINT) AS z_q, "
        "CAST(ROUND(r.p * 1e12, 0) AS BIGINT) AS p_q, "
        "CAST(CASE WHEN r.i <= k.kmax THEN 1 ELSE 0 END AS BIGINT) "
        "AS rejected FROM r, k ORDER BY rank_i"
    )
    out["mask_morphology"] = (
        # mirrors _q_mask_morphology over the same frozen grid: window
        # EXISTS for dilation, 9-valid-neighbour HAVING for erosion
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_valid FROM g "
        "WHERE z > -1e30), "
        "d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dilated FROM g e "
        "WHERE EXISTS (SELECT 1 FROM g n "
        "WHERE n.row BETWEEN e.row - 1 AND e.row + 1 "
        "AND n.col BETWEEN e.col - 1 AND e.col + 1 AND n.z > -1e30)), "
        "er AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eroded FROM ("
        "SELECT e.row, e.col FROM g e JOIN g n "
        "ON n.row BETWEEN e.row - 1 AND e.row + 1 "
        "AND n.col BETWEEN e.col - 1 AND e.col + 1 AND n.z > -1e30 "
        "GROUP BY e.row, e.col HAVING COUNT(*) = 9)) "
        "SELECT v.n_valid, d.n_dilated, er.n_eroded, "
        "d.n_dilated - er.n_eroded AS n_gradient FROM v, d, er"
    )
    out["knox_test"] = (
        # mirrors _q_knox_test: brute-force pairs over the same subset
        # (the engine's halo-anchored counts must equal this exactly)
        "WITH p AS (SELECT event_id AS eid, epoch_us(ts) AS t, "
        "event_id % 96 AS gx, (event_id // 96) % 96 AS gy "
        "FROM events WHERE event_id % 20 = 0), "
        "pr AS (SELECT a.eid, "
        "CASE WHEN (a.gx-b.gx)*(a.gx-b.gx) + (a.gy-b.gy)*(a.gy-b.gy) "
        "<= 25 THEN 1 ELSE 0 END AS sc, "
        "CASE WHEN ABS(a.t - b.t) <= 3600000000 THEN 1 ELSE 0 END AS tc "
        "FROM p a JOIN p b ON a.eid < b.eid), "
        "s AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n, "
        "CAST(SUM(sc) AS BIGINT) AS ns, CAST(SUM(tc) AS BIGINT) AS nt, "
        "CAST(SUM(sc * tc) AS BIGINT) AS nst, "
        "CAST(COUNT(*) AS BIGINT) AS total FROM pr) "
        "SELECT n AS n_points, ns, nt, nst, "
        "CASE WHEN ns = 0 OR nt = 0 THEN CAST(0 AS BIGINT) ELSE "
        "CAST(ROUND(CAST(nst AS DOUBLE) / (CAST(ns AS DOUBLE) "
        "* CAST(nt AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6, 0) "
        "AS BIGINT) END AS knox_ratio_q FROM s"
    )
    out["logrank_test"] = (
        # mirrors _q_logrank_test term for term (1e9-quantized per-time
        # terms, integer totals, one final float expression)
        "WITH per AS (SELECT user_id, user_id % 2 AS grp, MIN(ts) AS t0, "
        "MAX(ts) AS tl, MIN(CASE WHEN event_type = 'error' THEN ts END) "
        "AS te FROM events GROUP BY user_id), "
        "d AS (SELECT grp, CASE WHEN te IS NOT NULL THEN "
        "epoch_us(te) - epoch_us(t0) ELSE epoch_us(tl) - epoch_us(t0) "
        "END AS dur, CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS obs "
        "FROM per), "
        "t AS (SELECT DISTINCT dur AS t FROM d WHERE obs = 1), "
        "a AS (SELECT t.t, "
        "CAST(SUM(CASE WHEN d.dur >= t.t THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n, "
        "CAST(SUM(CASE WHEN d.dur >= t.t AND d.grp = 0 THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n1, "
        "CAST(SUM(CASE WHEN d.dur = t.t AND d.obs = 1 THEN 1 ELSE 0 "
        "END) AS BIGINT) AS dd, "
        "CAST(SUM(CASE WHEN d.dur = t.t AND d.obs = 1 AND d.grp = 0 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS d1 "
        "FROM t, d GROUP BY t.t), "
        "q AS (SELECT d1, "
        "CAST(ROUND(CAST(dd AS DOUBLE) * CAST(n1 AS DOUBLE) "
        "/ CAST(n AS DOUBLE) * 1e9, 0) AS BIGINT) AS e1q, "
        "CASE WHEN n > 1 THEN CAST(ROUND(CAST(dd AS DOUBLE) "
        "* (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* ((CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE)) / CAST(n AS DOUBLE)) "
        "* ((CAST(n AS DOUBLE) - CAST(dd AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) - 1.0)) * 1e9, 0) AS BIGINT) "
        "ELSE 0 END AS vq FROM a), "
        "s AS (SELECT CAST(SUM(d1) AS BIGINT) AS o1, "
        "CAST(SUM(e1q) AS BIGINT) AS e1_q, "
        "CAST(SUM(vq) AS BIGINT) AS v_q FROM q) "
        "SELECT o1, e1_q, v_q, "
        "CAST(ROUND((CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1e9) "
        "* (CAST(o1 AS DOUBLE) - CAST(e1_q AS DOUBLE) / 1e9) "
        "/ (CAST(v_q AS DOUBLE) / 1e9) * 1e6, 0) AS BIGINT) AS chi2_q "
        "FROM s"
    )
    out["q4_order_priority"] = (
        # mirrors _q_q4_order_priority (Q4 with a ship-lag EXISTS,
        # this schema has no commit/receipt dates)
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) "
        "AS order_count FROM orders o "
        "WHERE o.o_orderdate >= TIMESTAMP '1997-07-01' "
        "AND o.o_orderdate < TIMESTAMP '1997-10-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) "
        "+ 90 * 86400000000) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    out["vocab_richness"] = (
        # mirrors _q_vocab_richness: (lang, token) counts, then exact
        # HUGEINT moments; same float expression order per statistic
        "WITH tok AS (SELECT lang, "
        "UNNEST(string_split_regex(text, '\\s+')) AS w FROM documents), "
        "tk AS (SELECT lang, w FROM tok WHERE w <> ''), "
        "c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tk GROUP BY lang, w), "
        "m AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS v, "
        "CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2, "
        "CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS BIGINT) "
        "AS s2 FROM c GROUP BY lang) "
        "SELECT lang, n AS n_tokens, v AS vocab, "
        "CAST(ROUND(1e4 * (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e6, 0) AS BIGINT) "
        "AS yule_k_q, "
        "CAST(ROUND(CAST(v AS DOUBLE) / SQRT(CAST(n AS DOUBLE)) * 1e9, "
        "0) AS BIGINT) AS guiraud_q, "
        "CAST(ROUND(CAST(v2 AS DOUBLE) / CAST(v AS DOUBLE) * 1e9, 0) "
        "AS BIGINT) AS sichel_q "
        "FROM m ORDER BY lang"
    )
    out["bigram_novelty"] = (
        # mirrors _q_bigram_novelty: bigram first-seen doc via MIN,
        # occurrence counts per doc-id decile bucket, novelty = share
        # of a bucket's occurrences first seen in that bucket
        "WITH m AS (SELECT MAX(doc_id) AS md FROM documents), "
        "w AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram FROM w, "
        "LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i)), "
        "f AS (SELECT gram, MIN(doc_id) AS fd FROM g GROUP BY gram), "
        "b AS (SELECT g.doc_id * 10 // (m.md + 1) AS bucket, "
        "f.fd * 10 // (m.md + 1) AS fb FROM g, m "
        "JOIN f ON g.gram = f.gram), "
        "s AS (SELECT bucket, "
        "CAST(SUM(CASE WHEN fb = bucket THEN 1 ELSE 0 END) AS BIGINT) "
        "AS novel, CAST(COUNT(*) AS BIGINT) AS total "
        "FROM b GROUP BY bucket) "
        "SELECT bucket, novel, total, "
        "CAST(ROUND(CAST(novel AS DOUBLE) / CAST(total AS DOUBLE) "
        "* 1e9, 0) AS BIGINT) AS rate_q FROM s ORDER BY bucket"
    )
    out["ljung_box"] = (
        # daily-cents residual series against the rounded integer mean
        # (same construction as durbin_watson); HUGEINT autocovariance
        # sums; rho 1e9-quantized, Q terms 1e12-quantized then the
        # exact integer n*(n+2)*cumsum; mirrors _q_ljung_box
        "WITH c AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS x FROM orders GROUP BY 1), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS tot FROM c), "
        "e AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, "
        "x - CAST(ROUND(CAST(t.tot AS DOUBLE) "
        "/ CAST(t.n AS DOUBLE), 0) AS BIGINT) AS e FROM c, t), "
        "den AS (SELECT SUM(CAST(e AS HUGEINT) * CAST(e AS HUGEINT)) "
        "AS s0 FROM e), "
        "ks AS (SELECT k FROM (VALUES (1), (2), (3), (4), (5)) v(k)), "
        "cov AS (SELECT ks.k AS k, "
        "SUM(CAST(a.e AS HUGEINT) * CAST(b.e AS HUGEINT)) AS sk "
        "FROM ks JOIN e a ON TRUE JOIN e b ON b.i = a.i - ks.k "
        "GROUP BY ks.k), "
        "r AS (SELECT cov.k, CAST(cov.sk AS DOUBLE) "
        "/ CAST(den.s0 AS DOUBLE) AS rho FROM cov, den), "
        "q AS (SELECT r.k, "
        "CAST(ROUND(rho * 1e9, 0) AS BIGINT) AS rho_q, "
        "CAST(ROUND(rho * rho / CAST(t.n - r.k AS DOUBLE) * 1e12, 0) "
        "AS BIGINT) AS tq FROM r, t) "
        "SELECT q.k AS lag, q.rho_q, "
        "CAST(CAST(t.n AS HUGEINT) * CAST(t.n + 2 AS HUGEINT) "
        "* SUM(q.tq) OVER (ORDER BY q.k) AS BIGINT) AS q_scaled "
        "FROM q, t ORDER BY lag"
    )
    out["feature_matrix"] = (
        "WITH u AS (SELECT user_id, "
        "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_click, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n_purchase, "
        "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_error, "
        "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_signup, "
        "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_view, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS total_cents, "
        "CAST(MAX(epoch_us(ts) // 86400000000) AS BIGINT) AS last_day "
        "FROM events GROUP BY user_id), "
        "g AS (SELECT MAX(last_day) AS dmax FROM u) "
        "SELECT user_id, n_click, n_error, n_purchase, n_signup, "
        "n_view, total_cents, "
        "CAST(g.dmax - u.last_day AS BIGINT) AS recency_days "
        "FROM u, g"
    )
    out["graph_modularity"] = (
        # same graph CTE as word_triangles; classes by LEN % 2.
        # Q = (e0/m - (d0/2m)^2) + (e1/m - (d1/2m)^2), summed in
        # class order exactly as the engine does
        "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "lab AS (SELECT w1, w2, LEN(w1) % 2 AS c1, LEN(w2) % 2 AS c2 "
        "FROM e), "
        "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
        "CAST(SUM(CASE WHEN c1 = 0 AND c2 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS e0, "
        "CAST(SUM(CASE WHEN c1 = 1 AND c2 = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS e1, "
        "CAST(SUM(CASE WHEN c1 = 0 THEN 1 ELSE 0 END "
        "+ CASE WHEN c2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0, "
        "CAST(SUM(CASE WHEN c1 = 1 THEN 1 ELSE 0 END "
        "+ CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1 "
        "FROM lab) "
        "SELECT m AS n_edges, e0 AS intra_even, e1 AS intra_odd, "
        "ROUND((CAST(e0 AS DOUBLE) / CAST(m AS DOUBLE) "
        "- (CAST(d0 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))) "
        "* (CAST(d0 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))) "
        "+ (CAST(e1 AS DOUBLE) / CAST(m AS DOUBLE) "
        "- (CAST(d1 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))) "
        "* (CAST(d1 AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))), 6) "
        "AS modularity FROM st"
    )
    out["q17_small_qty_revenue"] = (
        "WITH t AS (SELECT l_partkey, "
        "CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) "
        "AS sq, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY 1), "
        "k AS (SELECT CAST(ROUND(l.l_extendedprice * 100, 0) "
        "AS BIGINT) AS c FROM lineitem l JOIN t "
        "ON t.l_partkey = l.l_partkey "
        "WHERE CAST(CAST(ROUND(l.l_quantity, 0) AS BIGINT) AS DOUBLE) "
        "< 0.2 * (CAST(t.sq AS DOUBLE) / CAST(t.n AS DOUBLE))) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems, "
        "ROUND((CAST(SUM(c) AS DOUBLE) / 100.0) / 7.0, 6) "
        "AS avg_yearly FROM k"
    )
    out["q19_disjunctive_revenue"] = (
        "WITH k AS (SELECT CAST(ROUND(l.l_extendedprice "
        "* (1.0 - l.l_discount) * 100, 0) AS BIGINT) AS c "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey, "
        "LATERAL (SELECT CAST(ROUND(l.l_quantity, 0) AS BIGINT) "
        "AS q) lat "
        "WHERE (p.p_brand = 'Brand#1' AND lat.q BETWEEN 1 AND 11) "
        "OR (p.p_brand = 'Brand#2' AND lat.q BETWEEN 10 AND 20) "
        "OR (p.p_brand = 'Brand#3' AND lat.q BETWEEN 20 AND 30)) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems, "
        "ROUND(CAST(SUM(c) AS DOUBLE) / 100.0, 6) AS revenue FROM k"
    )
    out["visibility_graph"] = (
        # NOT EXISTS blocking-bar predicate, integer cross products
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS MATERIALIZED (SELECT dd.t, dd.d, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "vis AS (SELECT a.t AS ta, b.t AS tb FROM dn a "
        "JOIN dn b ON b.t > a.t WHERE NOT EXISTS ("
        "SELECT 1 FROM dn m WHERE m.t > a.t AND m.t < b.t "
        "AND m.x * (b.t - a.t) >= a.x * (b.t - m.t) "
        "+ b.x * (m.t - a.t))), "
        "deg AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS degree FROM ("
        "SELECT ta AS t FROM vis UNION ALL SELECT tb FROM vis) "
        "GROUP BY t) "
        "SELECT dn.d AS day, COALESCE(deg.degree, 0) AS degree "
        "FROM dn LEFT JOIN deg ON deg.t = dn.t"
    )
    out["hill_estimator"] = (
        "WITH per AS (SELECT o_custkey, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS spend FROM orders GROUP BY 1), "
        "rk AS (SELECT spend, ROW_NUMBER() OVER "
        "(ORDER BY spend DESC, o_custkey) AS r FROM per), "
        "xk1 AS (SELECT CAST(spend AS DOUBLE) AS v, spend AS s "
        "FROM rk WHERE r = 51), "
        "t AS (SELECT CAST(SUM(CAST(ROUND(LN(CAST(rk.spend AS DOUBLE) "
        "/ xk1.v) * 1e9, 0) AS BIGINT)) AS BIGINT) AS s "
        "FROM rk, xk1 WHERE rk.r <= 50) "
        "SELECT CAST(50 AS BIGINT) AS k, xk1.s AS x_k1_cents, "
        "ROUND(50.0 / (CAST(t.s AS DOUBLE) / 1e9), 6) AS hill_alpha "
        "FROM t, xk1"
    )
    out["geometric_median"] = (
        # six unrolled Weiszfeld levels, 1e9-quantized per-fix terms
        "WITH f AS MATERIALIZED (SELECT user_id, CAST(event_id % 96 AS DOUBLE) AS x, CAST((event_id // 96) % 96 AS DOUBLE) AS y FROM events), "
        "e0 AS MATERIALIZED (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(x AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gx, CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gy FROM f GROUP BY user_id), "
        "e1 AS MATERIALIZED (SELECT e.user_id, e.n, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.x * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gx, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.y * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gy FROM f JOIN e0 e ON e.user_id = f.user_id GROUP BY e.user_id, e.n), "
        "e2 AS MATERIALIZED (SELECT e.user_id, e.n, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.x * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gx, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.y * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gy FROM f JOIN e1 e ON e.user_id = f.user_id GROUP BY e.user_id, e.n), "
        "e3 AS MATERIALIZED (SELECT e.user_id, e.n, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.x * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gx, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.y * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gy FROM f JOIN e2 e ON e.user_id = f.user_id GROUP BY e.user_id, e.n), "
        "e4 AS MATERIALIZED (SELECT e.user_id, e.n, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.x * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gx, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.y * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gy FROM f JOIN e3 e ON e.user_id = f.user_id GROUP BY e.user_id, e.n), "
        "e5 AS MATERIALIZED (SELECT e.user_id, e.n, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.x * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gx, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.y * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gy FROM f JOIN e4 e ON e.user_id = f.user_id GROUP BY e.user_id, e.n), "
        "e6 AS MATERIALIZED (SELECT e.user_id, e.n, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.x * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gx, CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(f.y * 1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)) > 0.0 THEN CAST(ROUND(1e9 / SQRT((f.x - e.gx) * (f.x - e.gx) + (f.y - e.gy) * (f.y - e.gy)), 0) AS BIGINT) ELSE 0 END) AS DOUBLE) AS gy FROM f JOIN e5 e ON e.user_id = f.user_id GROUP BY e.user_id, e.n) "
        "SELECT user_id, n AS n_fixes, ROUND(gx, 6) AS gm_x, ROUND(gy, 6) AS gm_y FROM e6"
    )
    out["rbo_overlap"] = (
        # same deterministic rankings; same 1e15 p^(d-1) literals
        "WITH cw AS (SELECT event_id % 9216 AS cell, "
        "epoch_us(ts) // 604800000000 AS week, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "wl AS (SELECT MAX(week) AS w FROM cw), "
        "ta AS (SELECT cell, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, cell) AS r FROM cw, wl "
        "WHERE week = wl.w QUALIFY r <= 20), "
        "tb AS (SELECT cell, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, cell) AS r FROM cw, wl "
        "WHERE week = wl.w - 1 QUALIFY r <= 20), "
        "pw(d, p15) AS (VALUES (1, 1000000000000000), (2, 900000000000000), (3, 810000000000000), (4, 729000000000000), (5, 656100000000000), (6, 590490000000000), (7, 531441000000000), (8, 478296900000000), (9, 430467210000000), (10, 387420489000000), (11, 348678440100000), (12, 313810596090000), (13, 282429536481000), (14, 254186582832900), (15, 228767924549610), (16, 205891132094649), (17, 185302018885184), (18, 166771816996666), (19, 150094635296999), (20, 135085171767299)), "
        "j AS (SELECT ta.cell, ta.r AS ra, tb.r AS rb FROM ta "
        "JOIN tb ON tb.cell = ta.cell), "
        "ov AS (SELECT pw.d, pw.p15, CAST(COUNT(j.cell) AS BIGINT) "
        "AS ov FROM pw LEFT JOIN j "
        "ON j.ra <= pw.d AND j.rb <= pw.d "
        "GROUP BY 1, 2), "
        "terms AS (SELECT CAST(SUM(CAST(ROUND(CAST(ov AS DOUBLE) "
        "/ CAST(d AS DOUBLE) * CAST(p15 AS DOUBLE), 0) AS BIGINT)) "
        "AS BIGINT) AS s FROM ov) "
        "SELECT CAST(20 AS BIGINT) AS depth, "
        "ROUND(0.1 * (CAST(s AS DOUBLE) / 1e15), 6) AS rbo FROM terms"
    )
    out["sprt_crossing"] = (
        # same +-200670695 integer increments; first |cum| >= THR day
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, dd.d, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rk, "
        "COUNT(*) OVER () AS n FROM dn), "
        "med AS (SELECT x AS m FROM r WHERE rk = (n - 1) // 2 + 1), "
        "p AS (SELECT dn.t, dn.d, CAST(SUM(CASE WHEN dn.x > med.m "
        "THEN 200670695 ELSE -200670695 END) "
        "OVER (ORDER BY dn.t) AS BIGINT) AS cum FROM dn, med), "
        "hit AS (SELECT d, cum, "
        "CASE WHEN cum >= 2944438979 THEN 'accept_p1' "
        "ELSE 'accept_p0' END AS decision "
        "FROM p WHERE ABS(cum) >= 2944438979 ORDER BY t LIMIT 1), "
        "fallback AS (SELECT -1 AS d, cum, "
        "'undecided' AS decision FROM p "
        "ORDER BY t DESC LIMIT 1) "
        "SELECT CAST(d AS BIGINT) AS crossing_day, decision, "
        "cum AS llr_q FROM hit "
        "UNION ALL SELECT CAST(d AS BIGINT), decision, cum "
        "FROM fallback WHERE NOT EXISTS (SELECT 1 FROM hit)"
    )
    out["jaro_winkler_pairs"] = (
        "WITH tok AS (SELECT DISTINCT source AS w FROM documents) "
        "SELECT a.w AS w1, b.w AS w2, "
        "ROUND(jaro_winkler_similarity(a.w, b.w), 6) AS jw "
        "FROM tok a JOIN tok b ON a.w < b.w "
        "WHERE jaro_winkler_similarity(a.w, b.w) >= 0.8"
    )
    out["bayes_rate_smoothing"] = (
        "WITH c AS (SELECT event_id % 9216 AS cell, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS pos FROM events GROUP BY 1), "
        "g AS (SELECT CAST(SUM(pos) AS DOUBLE) "
        "/ CAST(SUM(n) AS DOUBLE) AS p0 FROM c), "
        "r AS (SELECT cell, n, pos, "
        "(CAST(pos AS DOUBLE) + 50.0 * g.p0) "
        "/ (CAST(n AS DOUBLE) + 50.0) AS rate FROM c, g) "
        "SELECT cell, n, pos AS n_purchase, "
        "ROUND(rate, 6) AS smoothed_rate FROM r "
        "ORDER BY rate DESC, cell LIMIT 20"
    )
    out["haar_energy"] = (
        # three materialized halving levels; pure integer sums/diffs
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "sz AS (SELECT CAST(POWER(2, FLOOR(LOG2(COUNT(*)))) AS BIGINT) "
        "AS m FROM dn), "
        "l0 AS MATERIALIZED (SELECT t AS i, x AS a FROM dn, sz "
        "WHERE t < sz.m), "
        "l1 AS MATERIALIZED (SELECT e.i // 2 AS i, e.a + o.a AS a, "
        "e.a - o.a AS det FROM l0 e JOIN l0 o ON o.i = e.i + 1 "
        "WHERE e.i % 2 = 0), "
        "l2 AS MATERIALIZED (SELECT e.i // 2 AS i, e.a + o.a AS a, "
        "e.a - o.a AS det FROM l1 e JOIN l1 o ON o.i = e.i + 1 "
        "WHERE e.i % 2 = 0), "
        "l3 AS MATERIALIZED (SELECT e.i // 2 AS i, e.a + o.a AS a, "
        "e.a - o.a AS det FROM l2 e JOIN l2 o ON o.i = e.i + 1 "
        "WHERE e.i % 2 = 0) "
        "SELECT 1 AS level, CAST(COUNT(*) AS BIGINT) AS n_coef, "
        "CAST(SUM(det * det) AS BIGINT) AS energy FROM l1 "
        "UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(det * det) AS BIGINT) FROM l2 "
        "UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(det * det) AS BIGINT) FROM l3"
    )
    out["cell_week_churn"] = (
        "WITH cw AS (SELECT event_id % 9216 AS cell, "
        "epoch_us(ts) // 604800000000 AS week, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "wl AS (SELECT MAX(week) AS w FROM cw), "
        "cur AS (SELECT cell, n FROM cw, wl WHERE week = wl.w), "
        "prv AS (SELECT cell, n FROM cw, wl WHERE week = wl.w - 1), "
        "allc AS (SELECT cell FROM cur UNION SELECT cell FROM prv), "
        "j AS (SELECT allc.cell, COALESCE(prv.n, 0) AS n_prev, "
        "COALESCE(cur.n, 0) AS n_last "
        "FROM allc LEFT JOIN cur ON cur.cell = allc.cell "
        "LEFT JOIN prv ON prv.cell = allc.cell) "
        "SELECT cell, n_prev, n_last, n_last - n_prev AS delta FROM j "
        "ORDER BY ABS(n_last - n_prev) DESC, cell LIMIT 20"
    )
    out["pps_systematic"] = (
        "WITH p AS (SELECT o_orderkey, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c "
        "FROM orders), "
        "s AS (SELECT o_orderkey, c, "
        "CAST(SUM(c) OVER (ORDER BY o_orderkey) AS BIGINT) AS cum "
        "FROM p), "
        "t AS (SELECT CAST(SUM(c) AS BIGINT) AS w FROM p) "
        "SELECT o_orderkey, cum AS cum_cents FROM s, t "
        "WHERE (cum * 100) // t.w - ((cum - c) * 100) // t.w >= 1"
    )
    out["burrows_delta"] = (
        # same frame: 20 top words x all sources, zero cells kept;
        # 1e9-quantized frequencies and |dz| terms
        "WITH tokens AS (SELECT source, UNNEST(string_split_regex("
        "text, '\\s+')) AS w FROM documents), "
        "tk AS (SELECT source, w FROM tokens WHERE w <> ''), "
        "cnts AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tk GROUP BY 1, 2), "
        "tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t "
        "FROM cnts GROUP BY 1), "
        "top AS (SELECT w FROM (SELECT w, SUM(c) AS g FROM cnts "
        "GROUP BY w) ORDER BY g DESC, w LIMIT 20), "
        "frame AS (SELECT tot.source, top.w, tot.t, "
        "COALESCE(cnts.c, 0) AS c FROM tot CROSS JOIN top "
        "LEFT JOIN cnts ON cnts.source = tot.source "
        "AND cnts.w = top.w), "
        "f AS (SELECT source, w, "
        "CAST(ROUND(CAST(c AS DOUBLE) / CAST(t AS DOUBLE) * 1e9, 0) "
        "AS BIGINT) AS fq FROM frame), "
        "ns AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS s "
        "FROM f), "
        "wstat AS (SELECT w, CAST(SUM(fq) AS BIGINT) AS s1, "
        "CAST(SUM(fq * fq) AS BIGINT) AS s2 FROM f GROUP BY w), "
        "z AS (SELECT f.source, f.w, "
        "(CAST(f.fq AS DOUBLE) - CAST(wstat.s1 AS DOUBLE) / ns.s) "
        "/ SQRT((CAST(wstat.s2 AS DOUBLE) - CAST(wstat.s1 AS DOUBLE) "
        "* CAST(wstat.s1 AS DOUBLE) / ns.s) / ns.s) AS z "
        "FROM f JOIN wstat ON wstat.w = f.w, ns), "
        "pairs AS (SELECT a.source AS s1, b.source AS s2, "
        "CAST(SUM(CAST(ROUND(ABS(a.z - b.z) * 1e9, 0) AS BIGINT)) "
        "AS BIGINT) AS dq "
        "FROM z a JOIN z b ON b.w = a.w AND a.source < b.source "
        "GROUP BY 1, 2) "
        "SELECT s1, s2, "
        "ROUND(CAST(dq AS DOUBLE) / 1e9 / 20.0, 6) AS delta "
        "FROM pairs"
    )
    out["dispersion_index"] = (
        "WITH c AS (SELECT event_type, event_id % 9216 AS cell, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "m AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS s1, "
        "CAST(SUM(x * x) AS BIGINT) AS s2 FROM c GROUP BY 1) "
        "SELECT event_type, s1 AS n_events, "
        "ROUND(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "* CAST(s1 AS DOUBLE) / 9216.0) / 9215.0) "
        "/ (CAST(s1 AS DOUBLE) / 9216.0), 6) AS vmr, "
        "ROUND((((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "* CAST(s1 AS DOUBLE) / 9216.0) / 9215.0) "
        "/ (CAST(s1 AS DOUBLE) / 9216.0)) * 9215.0, 6) AS chi2 "
        "FROM m"
    )
    out["grubbs_test"] = (
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT mm.lo + r.range AS d FROM range(0, 4096) r, mm "
        "WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.d, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS s1, "
        "CAST(SUM(x * x) AS BIGINT) AS s2 FROM dn), "
        "dev AS (SELECT dn.d, dn.x, "
        "ABS(CAST(dn.x AS DOUBLE) - CAST(m.s1 AS DOUBLE) "
        "/ CAST(m.n AS DOUBLE)) AS dv FROM dn, m) "
        "SELECT m.n AS n_days, dev.d AS day, dev.x, "
        "ROUND(dev.dv / SQRT((CAST(m.s2 AS DOUBLE) "
        "- CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE) "
        "/ CAST(m.n AS DOUBLE)) / (CAST(m.n AS DOUBLE) - 1.0)), 6) "
        "AS g "
        "FROM dev, m ORDER BY dev.dv DESC, dev.d LIMIT 1"
    )
    out["q3_shipping_priority"] = (
        "SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) "
        "* 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1998-06-01' "
        "AND l.l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY 1, 2, 3 "
        "ORDER BY revenue_cents DESC, l.l_orderkey LIMIT 10"
    )
    out["q5_local_revenue"] = (
        "SELECT n.n_name, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice * (1.0 - l.l_discount) "
        "* 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "WHERE c.c_nationkey = s.s_nationkey "
        "GROUP BY 1"
    )
    out["quadkey_cells"] = (
        "WITH p AS (SELECT CAST(event_id % 96 AS BIGINT) AS x, "
        "CAST((event_id // 96) % 96 AS BIGINT) AS y FROM events), "
        "q AS (SELECT CAST(((x // 64) % 2) + 2 * ((y // 64) % 2) AS VARCHAR) || CAST(((x // 32) % 2) + 2 * ((y // 32) % 2) AS VARCHAR) || CAST(((x // 16) % 2) + 2 * ((y // 16) % 2) AS VARCHAR) || CAST(((x // 8) % 2) + 2 * ((y // 8) % 2) AS VARCHAR) || CAST(((x // 4) % 2) + 2 * ((y // 4) % 2) AS VARCHAR) || CAST(((x // 2) % 2) + 2 * ((y // 2) % 2) AS VARCHAR) || CAST(((x // 1) % 2) + 2 * ((y // 1) % 2) AS VARCHAR) AS quadkey FROM p) "
        "SELECT quadkey, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM q GROUP BY quadkey"
    )
    out["polygon_perimeter"] = _perimeter_oracle_sql()
    out["route_shortest_path"] = (
        # recursive min-dist walk over the same formula edges; UNION
        # dedups (node, dist) states; cap prunes dominated paths
        "WITH RECURSIVE g AS (SELECT r.range AS r, c.range AS c "
        "FROM range(0, 8) r, range(0, 8) c), "
        "e0 AS (SELECT r * 8 + c AS node, r * 8 + c + 1 AS neigh, "
        "(r * 7 + c * 13) % 19 + 1 AS w FROM g WHERE c < 7 "
        "UNION ALL "
        "SELECT r * 8 + c, (r + 1) * 8 + c, "
        "(r * 11 + c * 5) % 17 + 1 FROM g WHERE r < 7), "
        "sym AS (SELECT node, neigh, w FROM e0 "
        "UNION ALL SELECT neigh, node, w FROM e0), "
        "walk(node, dist) AS (SELECT CAST(0 AS BIGINT), "
        "CAST(0 AS BIGINT) "
        "UNION "
        "SELECT sym.neigh, walk.dist + sym.w FROM walk "
        "JOIN sym ON sym.node = walk.node "
        "WHERE walk.dist + sym.w <= 300) "
        "SELECT CAST(node AS BIGINT) AS node, "
        "CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node"
    )
    out["cdc_chunks"] = (
        # char-position explode + 7 LEADs; same fixed coefficients
        "WITH ch AS (SELECT doc_id, "
        "generate_subscripts(string_split(text, ''), 1) AS i, "
        "unicode(UNNEST(string_split(text, ''))) AS c "
        "FROM documents), "
        "w AS (SELECT doc_id, i, "
        "c * 1 "
        "+ LEAD(c, 1) OVER win * 257 "
        "+ LEAD(c, 2) OVER win * 193 "
        "+ LEAD(c, 3) OVER win * 83 "
        "+ LEAD(c, 4) OVER win * 211 "
        "+ LEAD(c, 5) OVER win * 101 "
        "+ LEAD(c, 6) OVER win * 47 "
        "+ LEAD(c, 7) OVER win * 31 AS s "
        "FROM ch WINDOW win AS (PARTITION BY doc_id ORDER BY i)), "
        "v AS (SELECT doc_id, s FROM w WHERE s IS NOT NULL) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(v.nw, 0) AS BIGINT) AS n_windows, "
        "CAST(COALESCE(v.nb, 0) AS BIGINT) AS n_boundaries, "
        "CAST(COALESCE(v.nb, 0) + 1 AS BIGINT) AS n_chunks "
        "FROM (SELECT DISTINCT doc_id FROM documents) d "
        "LEFT JOIN (SELECT doc_id, COUNT(*) AS nw, "
        "SUM(CASE WHEN s % 61 = 0 THEN 1 ELSE 0 END) AS nb "
        "FROM v GROUP BY doc_id) v ON v.doc_id = d.doc_id"
    )
    out["hoover_index"] = (
        "WITH c AS (SELECT event_id % 9216 AS cell, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, "
        "CAST(SUM(x) AS BIGINT) AS n_events FROM c), "
        "nm AS (SELECT CAST(SUM(ABS(t.n_cells * c.x - t.n_events)) "
        "AS BIGINT) AS num FROM c, t) "
        "SELECT t.n_cells, t.n_events, "
        "ROUND(CAST(nm.num AS DOUBLE) "
        "/ (2.0 * CAST(t.n_events AS DOUBLE) "
        "* CAST(t.n_cells AS DOUBLE)), 6) AS hoover FROM t, nm"
    )
    out["mean_direction"] = (
        # same D8 comparisons; identical 1e9 fixed-point unit vectors
        "WITH f AS (SELECT user_id, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS k, "
        "CAST(event_id % 96 AS BIGINT) AS x, "
        "CAST((event_id // 96) % 96 AS BIGINT) AS y FROM events), "
        "st AS (SELECT a.user_id, b.x - a.x AS dx, b.y - a.y AS dy "
        "FROM f a JOIN f b ON b.user_id = a.user_id "
        "AND b.k = a.k + 1 WHERE b.x <> a.x OR b.y <> a.y), "
        "u AS (SELECT user_id, "
        "CASE WHEN ABS(dx) > ABS(dy) THEN "
        "CASE WHEN dx > 0 THEN 1000000000 ELSE -1000000000 END "
        "WHEN ABS(dy) > ABS(dx) THEN 0 "
        "WHEN dx > 0 THEN 707106781 ELSE -707106781 END AS uxq, "
        "CASE WHEN ABS(dy) > ABS(dx) THEN "
        "CASE WHEN dy > 0 THEN 1000000000 ELSE -1000000000 END "
        "WHEN ABS(dx) > ABS(dy) THEN 0 "
        "WHEN dy > 0 THEN 707106781 ELSE -707106781 END AS uyq "
        "FROM st), "
        "agg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_moves, "
        "CAST(SUM(uxq) AS BIGINT) AS rxq, "
        "CAST(SUM(uyq) AS BIGINT) AS ryq FROM u GROUP BY user_id) "
        "SELECT user_id, n_moves, "
        "ROUND(DEGREES(ATAN2(CAST(ryq AS DOUBLE), "
        "CAST(rxq AS DOUBLE))), 6) AS mean_dir_deg, "
        "ROUND(SQRT(CAST(rxq AS DOUBLE) * CAST(rxq AS DOUBLE) "
        "+ CAST(ryq AS DOUBLE) * CAST(ryq AS DOUBLE)) "
        "/ (CAST(n_moves AS DOUBLE) * 1e9), 6) AS rbar "
        "FROM agg"
    )
    out["did_estimator"] = (
        "WITH b AS (SELECT MIN(epoch_us(ts) // 86400000000) AS lo, "
        "MAX(epoch_us(ts) // 86400000000) AS hi FROM events), "
        "m AS (SELECT lo + (hi - lo + 1) // 2 AS mid FROM b), "
        "cells AS (SELECT "
        "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat, "
        "CASE WHEN epoch_us(ts) // 86400000000 >= m.mid "
        "THEN 1 ELSE 0 END AS post, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS s FROM events, m GROUP BY 1, 2), "
        "mn AS (SELECT treat, post, "
        "(CAST(s AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS mu "
        "FROM cells) "
        "SELECT "
        "ROUND((SELECT mu FROM mn WHERE treat = 0 AND post = 0), 6) "
        "AS mean_ctrl_pre, "
        "ROUND((SELECT mu FROM mn WHERE treat = 0 AND post = 1), 6) "
        "AS mean_ctrl_post, "
        "ROUND((SELECT mu FROM mn WHERE treat = 1 AND post = 0), 6) "
        "AS mean_treat_pre, "
        "ROUND((SELECT mu FROM mn WHERE treat = 1 AND post = 1), 6) "
        "AS mean_treat_post, "
        "ROUND(((SELECT mu FROM mn WHERE treat = 1 AND post = 1) "
        "- (SELECT mu FROM mn WHERE treat = 1 AND post = 0)) "
        "- ((SELECT mu FROM mn WHERE treat = 0 AND post = 1) "
        "- (SELECT mu FROM mn WHERE treat = 0 AND post = 0)), 6) "
        "AS did"
    )
    out["symspell_pairs"] = (
        "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4) "
        "SELECT a.w AS w1, b.w AS w2, "
        "CAST(LEVENSHTEIN(a.w, b.w) AS BIGINT) AS dist "
        "FROM tok a JOIN tok b ON a.w < b.w "
        "WHERE LEVENSHTEIN(a.w, b.w) BETWEEN 1 AND 2"
    )
    out["chow_test"] = (
        # same exact moment sums per segment; shared SSR closed form
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi, "
        "CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "seg AS (SELECT CASE WHEN t < (SELECT n // 2 FROM mm) "
        "THEN 1 ELSE 2 END AS s, t, x FROM dn), "
        "mom AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS nn, "
        "CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(t * t) AS BIGINT) AS stt, "
        "CAST(SUM(t * x) AS BIGINT) AS stx, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx FROM seg GROUP BY s), "
        "momp AS (SELECT CAST(SUM(nn) AS BIGINT) AS nn, "
        "CAST(SUM(st) AS BIGINT) AS st, CAST(SUM(sx) AS BIGINT) AS sx, "
        "CAST(SUM(stt) AS BIGINT) AS stt, "
        "CAST(SUM(stx) AS BIGINT) AS stx, "
        "CAST(SUM(sxx) AS BIGINT) AS sxx FROM mom), "
        "ss AS (SELECT s, "
        "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) "
        "/ CAST(nn AS DOUBLE)) "
        "- ((CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) "
        "* CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "* (CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) "
        "* CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE))) "
        "/ (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) "
        "* CAST(st AS DOUBLE) / CAST(nn AS DOUBLE)) AS ssr FROM mom), "
        "ssp AS (SELECT "
        "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) "
        "/ CAST(nn AS DOUBLE)) "
        "- ((CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) "
        "* CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "* (CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) "
        "* CAST(sx AS DOUBLE) / CAST(nn AS DOUBLE))) "
        "/ (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) "
        "* CAST(st AS DOUBLE) / CAST(nn AS DOUBLE)) AS ssr_p, "
        "nn FROM momp) "
        "SELECT CAST(ssp.nn AS BIGINT) AS n_days, "
        "(SELECT lo + n // 2 FROM mm) AS break_day, "
        "ROUND(((ssp.ssr_p - s1.ssr - s2.ssr) / 2.0) "
        "/ ((s1.ssr + s2.ssr) / (CAST(ssp.nn AS DOUBLE) - 4.0)), 6) "
        "AS f_stat "
        "FROM ssp, (SELECT ssr FROM ss WHERE s = 1) s1, "
        "(SELECT ssr FROM ss WHERE s = 2) s2"
    )
    out["min_cost_supplier"] = (
        # two-level aggregate + (cost, suppkey) lexicographic argmin
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) "
        "* 100, 0) AS BIGINT)) AS BIGINT) AS cost_cents "
        "FROM lineitem GROUP BY 1, 2), "
        "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey "
        "ORDER BY cost_cents, l_suppkey) AS rn FROM ps) "
        "SELECT l_partkey, l_suppkey, cost_cents FROM rk WHERE rn = 1"
    )
    out["seasonal_decompose"] = (
        # dense calendar; 7-day centered window sum / 7.0; quantized
        # detrended deviations summed per weekday
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, dd.d, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "w AS (SELECT t, d, x, "
        "CAST(SUM(x) OVER (ORDER BY t "
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7, "
        "CAST(COUNT(*) OVER (ORDER BY t "
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS c7 "
        "FROM dn), "
        "dt AS (SELECT d % 7 AS weekday, "
        "CAST(ROUND((CAST(x AS DOUBLE) "
        "- CAST(s7 AS DOUBLE) / 7.0) * 1e9, 0) AS BIGINT) AS dq "
        "FROM w WHERE c7 = 7) "
        "SELECT weekday, CAST(COUNT(*) AS BIGINT) AS n_days, "
        "ROUND((CAST(SUM(dq) AS DOUBLE) / 1e9) "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS seasonal "
        "FROM dt GROUP BY weekday"
    )
    out["brier_decomposition"] = (
        # Murphy decomposition over the same decile bins; per-bin
        # float terms 1e9-quantized before the SUM
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT d.k // 50 AS bin, d.k AS score, "
        "CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS lab FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "b AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb, "
        "CAST(SUM(lab) AS BIGINT) AS pb, "
        "CAST(SUM(score) AS BIGINT) AS sb, "
        "CAST(SUM((score - 500 * lab) * (score - 500 * lab)) "
        "AS BIGINT) AS qb FROM j GROUP BY bin), "
        "t AS (SELECT CAST(SUM(nb) AS BIGINT) AS n, "
        "CAST(SUM(pb) AS BIGINT) AS npos, "
        "CAST(SUM(qb) AS BIGINT) AS q FROM b), "
        "terms AS (SELECT "
        "CAST(SUM(CAST(ROUND(CAST(b.nb AS DOUBLE) "
        "* (CAST(b.sb AS DOUBLE) / (500.0 * CAST(b.nb AS DOUBLE)) "
        "- CAST(b.pb AS DOUBLE) / CAST(b.nb AS DOUBLE)) "
        "* (CAST(b.sb AS DOUBLE) / (500.0 * CAST(b.nb AS DOUBLE)) "
        "- CAST(b.pb AS DOUBLE) / CAST(b.nb AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS rel_q, "
        "CAST(SUM(CAST(ROUND(CAST(b.nb AS DOUBLE) "
        "* (CAST(b.pb AS DOUBLE) / CAST(b.nb AS DOUBLE) "
        "- CAST(t.npos AS DOUBLE) / CAST(t.n AS DOUBLE)) "
        "* (CAST(b.pb AS DOUBLE) / CAST(b.nb AS DOUBLE) "
        "- CAST(t.npos AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS res_q "
        "FROM b, t GROUP BY ALL) "
        "SELECT t.n, "
        "ROUND(CAST(t.q AS DOUBLE) / (250000.0 * CAST(t.n AS DOUBLE)), "
        "6) AS brier, "
        "ROUND((CAST(terms.rel_q AS DOUBLE) / 1e9) "
        "/ CAST(t.n AS DOUBLE), 6) AS reliability, "
        "ROUND((CAST(terms.res_q AS DOUBLE) / 1e9) "
        "/ CAST(t.n AS DOUBLE), 6) AS resolution, "
        "ROUND((CAST(t.npos AS DOUBLE) / CAST(t.n AS DOUBLE)) "
        "* (1.0 - CAST(t.npos AS DOUBLE) / CAST(t.n AS DOUBLE)), 6) "
        "AS uncertainty "
        "FROM t, terms"
    )
    out["kcore_words"] = (
        # eight unrolled peel rounds (engine asserts convergence <= 8);
        # MATERIALIZED stops exponential CTE inlining
        'WITH tok AS (SELECT DISTINCT source AS w FROM documents WHERE LEN(source) >= 4), e0 AS MATERIALIZED (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 AND LEVENSHTEIN(a.w, b.w) = 1), s0 AS MATERIALIZED (SELECT w1, w2 FROM e0 UNION ALL SELECT w2, w1 FROM e0), k0 AS MATERIALIZED (SELECT w1 AS w FROM s0 GROUP BY w1 HAVING COUNT(*) >= 2), e1 AS MATERIALIZED (SELECT e0.w1, e0.w2 FROM e0 JOIN k0 ka ON ka.w = e0.w1 JOIN k0 kb ON kb.w = e0.w2), s1 AS MATERIALIZED (SELECT w1, w2 FROM e1 UNION ALL SELECT w2, w1 FROM e1), k1 AS MATERIALIZED (SELECT w1 AS w FROM s1 GROUP BY w1 HAVING COUNT(*) >= 2), e2 AS MATERIALIZED (SELECT e1.w1, e1.w2 FROM e1 JOIN k1 ka ON ka.w = e1.w1 JOIN k1 kb ON kb.w = e1.w2), s2 AS MATERIALIZED (SELECT w1, w2 FROM e2 UNION ALL SELECT w2, w1 FROM e2), k2 AS MATERIALIZED (SELECT w1 AS w FROM s2 GROUP BY w1 HAVING COUNT(*) >= 2), e3 AS MATERIALIZED (SELECT e2.w1, e2.w2 FROM e2 JOIN k2 ka ON ka.w = e2.w1 JOIN k2 kb ON kb.w = e2.w2), s3 AS MATERIALIZED (SELECT w1, w2 FROM e3 UNION ALL SELECT w2, w1 FROM e3), k3 AS MATERIALIZED (SELECT w1 AS w FROM s3 GROUP BY w1 HAVING COUNT(*) >= 2), e4 AS MATERIALIZED (SELECT e3.w1, e3.w2 FROM e3 JOIN k3 ka ON ka.w = e3.w1 JOIN k3 kb ON kb.w = e3.w2), s4 AS MATERIALIZED (SELECT w1, w2 FROM e4 UNION ALL SELECT w2, w1 FROM e4), k4 AS MATERIALIZED (SELECT w1 AS w FROM s4 GROUP BY w1 HAVING COUNT(*) >= 2), e5 AS MATERIALIZED (SELECT e4.w1, e4.w2 FROM e4 JOIN k4 ka ON ka.w = e4.w1 JOIN k4 kb ON kb.w = e4.w2), s5 AS MATERIALIZED (SELECT w1, w2 FROM e5 UNION ALL SELECT w2, w1 FROM e5), k5 AS MATERIALIZED (SELECT w1 AS w FROM s5 GROUP BY w1 HAVING COUNT(*) >= 2), e6 AS MATERIALIZED (SELECT e5.w1, e5.w2 FROM e5 JOIN k5 ka ON ka.w = e5.w1 JOIN k5 kb ON kb.w = e5.w2), s6 AS MATERIALIZED (SELECT w1, w2 FROM e6 UNION ALL SELECT w2, w1 FROM e6), k6 AS MATERIALIZED (SELECT w1 AS w FROM s6 GROUP BY w1 HAVING COUNT(*) >= 2), e7 AS MATERIALIZED (SELECT e6.w1, e6.w2 FROM e6 JOIN k6 ka ON ka.w = e6.w1 JOIN k6 kb ON kb.w = e6.w2), s7 AS MATERIALIZED (SELECT w1, w2 FROM e7 UNION ALL SELECT w2, w1 FROM e7), k7 AS MATERIALIZED (SELECT w1 AS w FROM s7 GROUP BY w1 HAVING COUNT(*) >= 2), e8 AS MATERIALIZED (SELECT e7.w1, e7.w2 FROM e7 JOIN k7 ka ON ka.w = e7.w1 JOIN k7 kb ON kb.w = e7.w2), fin AS (SELECT w1, w2 FROM e8 UNION ALL SELECT w2, w1 FROM e8) SELECT w1 AS word, CAST(COUNT(*) AS BIGINT) AS core_degree FROM fin GROUP BY w1'
    )
    out["clustering_coeff"] = (
        # degree from symmetric edges, triangle membership from the
        # ordered tri CTE (same graph as word_triangles)
        "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
        "WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e UNION ALL SELECT w2, w1 FROM e), "
        "deg AS (SELECT w1 AS word, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM sym GROUP BY 1), "
        "tri AS (SELECT e1.w1 AS a, e1.w2 AS b, e2.w2 AS c "
        "FROM e e1 JOIN e e2 ON e2.w1 = e1.w2 "
        "JOIN e e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2), "
        "m AS (SELECT a AS word FROM tri UNION ALL "
        "SELECT b FROM tri UNION ALL SELECT c FROM tri), "
        "tc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS t "
        "FROM m GROUP BY word) "
        "SELECT deg.word, deg.k AS degree, "
        "COALESCE(tc.t, 0) AS n_triangles, "
        "ROUND((2.0 * CAST(COALESCE(tc.t, 0) AS DOUBLE)) "
        "/ (CAST(deg.k AS DOUBLE) * (CAST(deg.k AS DOUBLE) - 1.0)), 6) "
        "AS cc "
        "FROM deg LEFT JOIN tc ON tc.word = deg.word "
        "WHERE deg.k >= 2"
    )
    out["wilcoxon_signed"] = (
        # consecutive (odd, even) row-number pairing; 2x tie-averaged
        # ranks as exact ints; z repeats the engine expression
        "WITH o AS (SELECT user_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events), "
        "pr AS (SELECT user_id, (rn - 1) // 2 AS pk, "
        "CAST(SUM(CASE WHEN rn % 2 = 0 THEN y ELSE -y END) AS BIGINT) "
        "AS d FROM o GROUP BY 1, 2 HAVING COUNT(*) = 2), "
        "nz AS (SELECT user_id, d, ABS(d) AS ad FROM pr WHERE d <> 0), "
        "rk AS (SELECT user_id, d, "
        "2 * RANK() OVER (PARTITION BY user_id ORDER BY ad) "
        "+ COUNT(*) OVER (PARTITION BY user_id, ad) - 1 AS r2x "
        "FROM nz), "
        "w AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(COALESCE(SUM(CASE WHEN d > 0 THEN r2x END), 0) "
        "AS BIGINT) AS w_plus_2x FROM rk GROUP BY user_id) "
        "SELECT user_id, n_pairs, w_plus_2x, "
        "ROUND((CAST(w_plus_2x AS DOUBLE) / 2.0 "
        "- CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) "
        "/ 4.0) "
        "/ SQRT(CAST(n_pairs AS DOUBLE) "
        "* (CAST(n_pairs AS DOUBLE) + 1.0) "
        "* (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0), 6) AS z "
        "FROM w WHERE n_pairs >= 2"
    )
    out["runs_test"] = (
        # exact lower median by rank; runs via LAG over the day order
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rk, "
        "COUNT(*) OVER () AS n FROM c), "
        "med AS (SELECT x AS m FROM r WHERE rk = (n - 1) // 2 + 1), "
        "k AS (SELECT c.d, CASE WHEN c.x > med.m THEN 1 ELSE 0 END "
        "AS s FROM c, med WHERE c.x <> med.m), "
        "lagged AS (SELECT s, LAG(s) OVER (ORDER BY d) AS ps FROM k), "
        "st AS (SELECT "
        "CAST((SELECT SUM(s) FROM k) AS BIGINT) AS n1, "
        "CAST((SELECT COUNT(*) - SUM(s) FROM k) AS BIGINT) AS n2, "
        "CAST((SELECT 1 + SUM(CASE WHEN ps IS NOT NULL "
        "AND s <> ps THEN 1 ELSE 0 END) FROM lagged) AS BIGINT) "
        "AS runs) "
        "SELECT n1 AS n_above, n2 AS n_below, runs, "
        "ROUND((CAST(runs AS DOUBLE) "
        "- (1.0 + (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) "
        "/ (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))) "
        "/ SQRT((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) "
        "* (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) "
        "- CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)) "
        "/ ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) "
        "* (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) "
        "* (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))), 6) AS z "
        "FROM st"
    )
    out["turning_points"] = (
        # mirrors _q_turning_points (strict interior extrema of the
        # dense daily count series; classical normal approx)
        _daily_frame
        + ", st AS (SELECT CAST((SELECT COUNT(*) FROM dn) AS BIGINT) "
        "AS n, CAST(SUM(CASE WHEN (x0 < x1 AND x1 > x2) "
        "OR (x0 > x1 AND x1 < x2) THEN 1 ELSE 0 END) AS BIGINT) AS tp "
        "FROM trp) "
        "SELECT n AS n_days, tp AS n_turning, "
        "ROUND((CAST(tp AS DOUBLE) - 2.0 * CAST(n - 2 AS DOUBLE) / 3.0) "
        "/ SQRT((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6) AS z "
        "FROM st"
    )
    out["sample_entropy"] = (
        # mirrors _q_sample_entropy (Chebyshev template matches at
        # integer tolerance r = max(1, mean/5); SampEn = ln(B/A))
        _daily_frame
        + ", nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS s1 FROM dn), "
        "rr AS (SELECT GREATEST(1, s1 // (5 * n)) AS r FROM nn), "
        "pc AS (SELECT CAST(SUM(CASE WHEN GREATEST(ABS(a.x0 - b.x0), "
        "ABS(a.x1 - b.x1)) <= rr.r THEN 1 ELSE 0 END) AS BIGINT) "
        "AS b_count, CAST(SUM(CASE WHEN GREATEST(ABS(a.x0 - b.x0), "
        "ABS(a.x1 - b.x1)) <= rr.r AND ABS(a.x2 - b.x2) <= rr.r "
        "THEN 1 ELSE 0 END) AS BIGINT) AS a_count "
        "FROM trp a JOIN trp b ON b.t > a.t, rr) "
        "SELECT nn.n AS n_days, rr.r AS r_tol, pc.b_count, pc.a_count, "
        "ROUND(LN(CAST(pc.b_count AS DOUBLE) "
        "/ CAST(pc.a_count AS DOUBLE)), 6) AS sampen FROM nn, rr, pc"
    )
    out["perm_entropy"] = (
        # mirrors _q_perm_entropy (order-3 ordinal patterns, <= with
        # earlier-index tie rule; 1e12-tick p*ln(p) terms)
        _daily_frame
        + ", cd AS (SELECT 4 * CASE WHEN x0 <= x1 THEN 1 ELSE 0 END "
        "+ 2 * CASE WHEN x0 <= x2 THEN 1 ELSE 0 END "
        "+ CASE WHEN x1 <= x2 THEN 1 ELSE 0 END AS code FROM trp), "
        "g AS (SELECT code, CAST(COUNT(*) AS BIGINT) AS n FROM cd "
        "GROUP BY 1), "
        "nt AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tr FROM g), "
        "tk AS (SELECT CAST(SUM(CAST(ROUND(CAST(n AS DOUBLE) "
        "/ CAST(nt.n_tr AS DOUBLE) * LN(CAST(n AS DOUBLE) "
        "/ CAST(nt.n_tr AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS tq FROM g, nt), "
        "tp AS (SELECT code, n FROM g ORDER BY n DESC, code LIMIT 1) "
        "SELECT nt.n_tr AS n_triples, tp.code AS top_code, "
        "tp.n AS top_n, ROUND(-CAST(tk.tq AS DOUBLE) / 1e12, 6) "
        "AS h_nats, ROUND((-CAST(tk.tq AS DOUBLE) / 1e12) / LN(6.0), 6) "
        "AS h_norm FROM nt, tk, tp"
    )
    out["ordinal_assoc"] = (
        # mirrors _q_ordinal_assoc (daily count vs cents pair signs)
        _daily_xy_frame
        + ", pr AS (SELECT SIGN(a.x - b.x) AS sx, SIGN(a.y - b.y) "
        "AS sy FROM dn a JOIN dn b ON b.t > a.t), "
        "st AS (SELECT "
        "CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS c, "
        "CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS d, "
        "CAST(SUM(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS tx, "
        "CAST(SUM(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS ty FROM pr) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dn) AS n_days, "
        "c AS concordant, d AS discordant, tx AS ties_x_only, "
        "ty AS ties_y_only, "
        "ROUND(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 6) "
        "AS gamma, "
        "ROUND(CAST(c - d AS DOUBLE) / CAST(c + d + ty AS DOUBLE), 6) "
        "AS somers_d_yx, "
        "ROUND(CAST(c - d AS DOUBLE) / CAST(c + d + tx AS DOUBLE), 6) "
        "AS somers_d_xy FROM st"
    )
    out["omega_calmar"] = (
        # mirrors _q_omega_calmar (day-over-day gains/losses +
        # running-max drawdown of the daily revenue level)
        _daily_xy_frame
        + ", df AS (SELECT b.y - a.y AS ch FROM dn a "
        "JOIN dn b ON b.t = a.t + 1), "
        "gl AS (SELECT CAST(SUM(CASE WHEN ch > 0 THEN ch ELSE 0 END) "
        "AS BIGINT) AS gains, "
        "CAST(SUM(CASE WHEN ch < 0 THEN -ch ELSE 0 END) AS BIGINT) "
        "AS losses FROM df), "
        "rm AS (SELECT t, y, MAX(y) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS p FROM dn), "
        "mdd AS (SELECT CAST(MAX(p - y) AS BIGINT) AS maxdd FROM rm), "
        "ends AS (SELECT "
        "CAST((SELECT y FROM dn ORDER BY t DESC LIMIT 1) AS BIGINT) "
        "AS ylast, "
        "CAST((SELECT y FROM dn ORDER BY t LIMIT 1) AS BIGINT) "
        "AS yfirst, "
        "CAST((SELECT COUNT(*) FROM dn) AS BIGINT) AS n) "
        "SELECT ends.n AS n_days, gl.gains AS gains_cents, "
        "gl.losses AS losses_cents, mdd.maxdd AS max_dd_cents, "
        "ROUND(CAST(gl.gains AS DOUBLE) / CAST(gl.losses AS DOUBLE), 6) "
        "AS omega, "
        "ROUND((CAST(ends.ylast - ends.yfirst AS DOUBLE) "
        "/ CAST(ends.n - 1 AS DOUBLE)) / CAST(mdd.maxdd AS DOUBLE), 6) "
        "AS calmar FROM ends, gl, mdd"
    )
    out["morisita_index"] = (
        # mirrors _q_morisita_index (Q=9216 lattice quadrats)
        "WITH pc AS (SELECT event_type, event_id % 9216 AS cell, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "m AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS n, "
        "CAST(SUM(x * (x - 1)) AS BIGINT) AS sxx1 FROM pc GROUP BY 1) "
        "SELECT event_type, n AS n_events, sxx1 AS sum_xx1, "
        "ROUND(9216.0 * CAST(sxx1 AS DOUBLE) / (CAST(n AS DOUBLE) "
        "* CAST(n - 1 AS DOUBLE)), 6) AS morisita FROM m"
    )
    out["theils_u"] = (
        # mirrors _q_theils_u (1e12-tick marginal + conditional
        # entropy terms, exact tick-sum ratio)
        "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY 1, 2), "
        "ns AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_s FROM c "
        "GROUP BY 1), "
        "nl AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_l FROM c "
        "GROUP BY 1), "
        "nt AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM c), "
        "ty AS (SELECT CAST(SUM(CAST(ROUND(CAST(n_l AS DOUBLE) "
        "/ CAST(nt.n AS DOUBLE) * LN(CAST(nt.n AS DOUBLE) "
        "/ CAST(n_l AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS tq FROM nl, nt), "
        "tyx AS (SELECT CAST(SUM(CAST(ROUND(CAST(c.n AS DOUBLE) "
        "/ CAST(nt.n AS DOUBLE) * LN(CAST(ns.n_s AS DOUBLE) "
        "/ CAST(c.n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS tq FROM c JOIN ns ON ns.source = c.source, nt) "
        "SELECT nt.n AS n_docs, "
        "ROUND(CAST(ty.tq AS DOUBLE) / 1e12, 6) AS h_lang_nats, "
        "ROUND(CAST(tyx.tq AS DOUBLE) / 1e12, 6) AS h_cond_nats, "
        "ROUND(CAST(ty.tq - tyx.tq AS DOUBLE) / CAST(ty.tq AS DOUBLE), "
        "6) AS theils_u FROM nt, ty, tyx"
    )
    out["lz76_complexity"] = (
        # mirrors _q_lz76_complexity (recursive-CTE shortest-new-
        # phrase parse over the up/down bit string)
        _daily_xy_frame.replace("WITH ", "WITH RECURSIVE ")
        + ", bt AS (SELECT a.t AS i, CASE WHEN b.y > a.y THEN '1' "
        "ELSE '0' END AS b FROM dn a JOIN dn b ON b.t = a.t + 1), "
        "s AS (SELECT STRING_AGG(b, '' ORDER BY i) AS str, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM bt), "
        "rec(i, ph) AS ("
        "SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT) "
        "UNION ALL "
        "SELECT rec.i + (SELECT COALESCE(MAX(r.range), 0) "
        "FROM range(1, 4096) r "
        "WHERE r.range <= s.n - rec.i + 1 "
        "AND strpos(substr(s.str, 1, CAST(rec.i - 1 AS INT)), "
        "substr(s.str, CAST(rec.i AS INT), CAST(r.range AS INT))) > 0"
        ") + 1, rec.ph + 1 FROM rec, s WHERE rec.i <= s.n) "
        "SELECT s.n AS n_bits, "
        "CAST((SELECT MAX(ph) FROM rec) AS BIGINT) AS n_phrases, "
        "ROUND(CAST((SELECT MAX(ph) FROM rec) AS DOUBLE) "
        "* LOG2(CAST(s.n AS DOUBLE)) / CAST(s.n AS DOUBLE), 6) "
        "AS lz_norm FROM s"
    )
    out["dist_distances"] = (
        # mirrors _q_dist_distances (24-bin hour histograms of click
        # vs error; 1e12-tick sqrt(pq) and |p-q| terms)
        "WITH h AS (SELECT r.range AS hour FROM range(0, 24) r), "
        "c AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 "
        "AS hour, CAST(COUNT(*) AS BIGINT) AS n FROM events "
        "WHERE event_type IN ('click', 'error') GROUP BY 1, 2), "
        "f AS (SELECT h.hour, COALESCE(ck.n, 0) AS c1, "
        "COALESCE(er.n, 0) AS c2 FROM h "
        "LEFT JOIN c ck ON ck.hour = h.hour "
        "AND ck.event_type = 'click' "
        "LEFT JOIN c er ON er.hour = h.hour "
        "AND er.event_type = 'error'), "
        "nn AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
        "CAST(SUM(c2) AS BIGINT) AS n2 FROM f), "
        "tk AS (SELECT CAST(SUM(CAST(ROUND(SQRT((CAST(c1 AS DOUBLE) "
        "/ CAST(nn.n1 AS DOUBLE)) * (CAST(c2 AS DOUBLE) "
        "/ CAST(nn.n2 AS DOUBLE))) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS bc, CAST(SUM(CAST(ROUND(ABS(CAST(c1 AS DOUBLE) "
        "/ CAST(nn.n1 AS DOUBLE) - CAST(c2 AS DOUBLE) "
        "/ CAST(nn.n2 AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS tv FROM f, nn) "
        "SELECT nn.n1 AS n_click, nn.n2 AS n_error, "
        "ROUND(CAST(tk.bc AS DOUBLE) / 1e12, 6) AS bhattacharyya, "
        "ROUND(SQRT(1.0 - CAST(tk.bc AS DOUBLE) / 1e12), 6) "
        "AS hellinger, "
        "ROUND(CAST(tk.tv AS DOUBLE) / 1e12 / 2.0, 6) "
        "AS total_variation FROM nn, tk"
    )
    out["textrank_keywords"] = _textrank_oracle_sql()
    out["brunner_munzel"] = (
        # mirrors _q_brunner_munzel (2x cross-placements from the
        # cents histograms)
        "WITH h AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v, "
        "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS c1, "
        "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS c2 FROM events "
        "WHERE event_type IN ('click', 'error') GROUP BY 1), "
        "cm AS (SELECT v, c1, c2, "
        "2 * (SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c2) "
        "+ c2 AS p1, "
        "2 * (SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c1) "
        "+ c1 AS p2 FROM h), "
        "st AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
        "CAST(SUM(c2) AS BIGINT) AS n2, "
        "CAST(SUM(c1 * p1) AS BIGINT) AS s1, "
        "CAST(SUM(c1 * p1 * p1) AS BIGINT) AS s11, "
        "CAST(SUM(c2 * p2) AS BIGINT) AS s2, "
        "CAST(SUM(c2 * p2 * p2) AS BIGINT) AS s22 FROM cm), "
        "mm AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
        "AS m1, CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2 "
        "FROM st), "
        "vv AS (SELECT *, (CAST(s11 AS DOUBLE) - CAST(n1 AS DOUBLE) "
        "* m1 * m1) / CAST(n1 - 1 AS DOUBLE) AS v1, "
        "(CAST(s22 AS DOUBLE) - CAST(n2 AS DOUBLE) * m2 * m2) "
        "/ CAST(n2 - 1 AS DOUBLE) AS v2 FROM mm) "
        "SELECT n1 AS n_click, n2 AS n_error, "
        "ROUND(CAST(s1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) "
        "* CAST(n2 AS DOUBLE)), 6) AS p_hat, "
        "ROUND((m2 - m1) / SQRT(4.0 * (v1 / CAST(n1 AS DOUBLE) "
        "+ v2 / CAST(n2 AS DOUBLE))), 6) AS w_stat FROM vv"
    )
    out["cusum_squares"] = (
        # mirrors _q_cusum_squares (HUGEINT prefix-of-squares
        # deviations)
        _daily_xy_frame
        + ", sq AS (SELECT t, CAST(y AS HUGEINT) * y AS s FROM dn), "
        "tot AS (SELECT CAST(SUM(s) AS HUGEINT) AS q, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM sq), "
        "pf AS (SELECT t, SUM(s) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS sk, "
        "ROW_NUMBER() OVER (ORDER BY t) AS k FROM sq), "
        "dv AS (SELECT k, ABS(sk * tot.n - tot.q * k) AS dev "
        "FROM pf, tot), "
        "best AS (SELECT k, dev FROM dv ORDER BY dev DESC, k LIMIT 1) "
        "SELECT tot.n AS n_days, CAST(best.k AS BIGINT) AS argmax_k, "
        "CAST(best.dev AS VARCHAR) AS max_dev, "
        "ROUND(CAST(best.dev AS DOUBLE) / (CAST(tot.q AS DOUBLE) "
        "* CAST(tot.n AS DOUBLE)), 6) AS stat FROM best, tot"
    )
    out["spectral_summary"] = (
        # mirrors _q_spectral_summary (1e6-tick cos/sin sums, 1e6-tick
        # powers, 1e12/1e9-tick entropy and log-mean terms)
        _daily_xy_frame
        + ", nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "ks AS (SELECT k.range AS k FROM range(1, 2048) k, nn "
        "WHERE k.range <= (nn.n - 1) // 2), "
        "cs AS (SELECT ks.k, CAST(SUM(CAST(ROUND(CAST(dn.x AS DOUBLE) "
        "* COS(2.0 * PI() * CAST(dn.t AS DOUBLE) * CAST(ks.k "
        "AS DOUBLE) / CAST(nn.n AS DOUBLE)) * 1e6, 0) AS BIGINT)) "
        "AS BIGINT) AS cq, CAST(SUM(CAST(ROUND(CAST(dn.x AS DOUBLE) "
        "* SIN(2.0 * PI() * CAST(dn.t AS DOUBLE) * CAST(ks.k "
        "AS DOUBLE) / CAST(nn.n AS DOUBLE)) * 1e6, 0) AS BIGINT)) "
        "AS BIGINT) AS sq FROM ks, dn, nn GROUP BY 1), "
        "pw AS (SELECT k, CAST(ROUND(((CAST(cq AS DOUBLE) / 1e6) "
        "* (CAST(cq AS DOUBLE) / 1e6) + (CAST(sq AS DOUBLE) / 1e6) "
        "* (CAST(sq AS DOUBLE) / 1e6)) / CAST(nn.n AS DOUBLE) * 1e6, "
        "0) AS BIGINT) AS p FROM cs, nn), "
        "tt AS (SELECT CAST(SUM(p) AS BIGINT) AS tot, "
        "CAST(SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_pos, CAST(COUNT(*) AS BIGINT) AS kmax FROM pw), "
        "tk AS (SELECT CAST(SUM(CASE WHEN p > 0 THEN "
        "CAST(ROUND(-(CAST(p AS DOUBLE) / CAST(tt.tot AS DOUBLE)) "
        "* LN(CAST(p AS DOUBLE) / CAST(tt.tot AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) ELSE 0 END) AS BIGINT) AS ent, "
        "CAST(SUM(CASE WHEN p > 0 THEN "
        "CAST(ROUND(LN(CAST(p AS DOUBLE)) * 1e9, 0) AS BIGINT) "
        "ELSE 0 END) AS BIGINT) AS lgt FROM pw, tt) "
        "SELECT tt.kmax AS n_freqs, tt.n_pos, "
        "ROUND(CAST(tk.ent AS DOUBLE) / 1e12, 6) AS spec_entropy, "
        "ROUND(CAST(tk.ent AS DOUBLE) / 1e12 "
        "/ LN(CAST(tt.kmax AS DOUBLE)), 6) AS spec_entropy_norm, "
        "ROUND(EXP(CAST(tk.lgt AS DOUBLE) / 1e9 "
        "/ CAST(tt.n_pos AS DOUBLE)) / (CAST(tt.tot AS DOUBLE) "
        "/ CAST(tt.n_pos AS DOUBLE)), 6) AS spec_flatness FROM tt, tk"
    )
    out["local_geary"] = (
        # mirrors _q_local_geary (integer squared neighbour diffs)
        "WITH c0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy FROM range(0, 96) "
        "a CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT fr.gx AS r, fr.gy AS c, COALESCE(c0.n, 0) AS x "
        "FROM fr LEFT JOIN c0 ON c0.gx = fr.gx AND c0.gy = fr.gy), "
        "hot AS (SELECT r, c, x FROM dn WHERE x > 0 "
        "ORDER BY x DESC, r, c LIMIT 10), "
        "nb AS (SELECT h.r, h.c, h.x, CAST(COUNT(*) AS BIGINT) "
        "AS n_nb, CAST(SUM((h.x - d.x) * (h.x - d.x)) AS BIGINT) "
        "AS c_local FROM hot h JOIN dn d ON "
        "(d.r = h.r + 1 AND d.c = h.c) OR "
        "(d.r = h.r - 1 AND d.c = h.c) OR "
        "(d.r = h.r AND d.c = h.c + 1) OR "
        "(d.r = h.r AND d.c = h.c - 1) GROUP BY 1, 2, 3) "
        "SELECT r, c, x, n_nb, c_local, "
        "ROUND(CAST(c_local AS DOUBLE) / CAST(n_nb AS DOUBLE), 6) "
        "AS c_mean FROM nb"
    )
    out["general_g"] = (
        # mirrors _q_general_g (rook pair sum over all-pair sum)
        "WITH c0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy FROM range(0, 96) "
        "a CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT fr.gx AS r, fr.gy AS c, COALESCE(c0.n, 0) AS x "
        "FROM fr LEFT JOIN c0 ON c0.gx = fr.gx AND c0.gy = fr.gy), "
        "pr AS (SELECT CAST(SUM(s) AS HUGEINT) AS num, "
        "CAST(COUNT(*) AS BIGINT) AS w FROM ("
        "SELECT a.x * b.x AS s FROM dn a JOIN dn b "
        "ON b.r = a.r + 1 AND b.c = a.c "
        "UNION ALL SELECT a.x * b.x FROM dn a JOIN dn b "
        "ON b.r = a.r - 1 AND b.c = a.c "
        "UNION ALL SELECT a.x * b.x FROM dn a JOIN dn b "
        "ON b.r = a.r AND b.c = a.c + 1 "
        "UNION ALL SELECT a.x * b.x FROM dn a JOIN dn b "
        "ON b.r = a.r AND b.c = a.c - 1)), "
        "tt AS (SELECT CAST(SUM(x) AS HUGEINT) AS s, "
        "CAST(SUM(x * x) AS HUGEINT) AS s2 FROM dn) "
        "SELECT pr.w AS w_pairs, CAST(pr.num AS BIGINT) "
        "AS num_pairsum, ROUND(CAST(pr.num AS DOUBLE) "
        "/ CAST(tt.s * tt.s - tt.s2 AS DOUBLE), 6) AS general_g "
        "FROM pr, tt"
    )
    out["rake_keywords"] = (
        # mirrors _q_rake_keywords (gaps-and-islands phrases, 1e9-tick
        # word scores)
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "p AS (SELECT doc_id, UNNEST(toks) AS w, "
        "generate_subscripts(toks, 1) AS i FROM t), "
        "frq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "WHERE w <> '' GROUP BY 1), "
        "stp AS (SELECT w FROM frq ORDER BY n DESC, w LIMIT 10), "
        "q AS (SELECT doc_id, i, w, CASE WHEN w = '' "
        "OR w IN (SELECT w FROM stp) THEN 1 ELSE 0 END AS is_del "
        "FROM p), "
        "isl AS (SELECT doc_id, i, w, is_del, SUM(is_del) OVER "
        "(PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) "
        "AS grp FROM q), "
        "ph0 AS (SELECT doc_id, grp, STRING_AGG(w, ' ' ORDER BY i) "
        "AS phrase FROM isl WHERE is_del = 0 GROUP BY 1, 2), "
        "ph AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n FROM ph0 "
        "GROUP BY 1), "
        "wd AS (SELECT UNNEST(string_split(phrase, ' ')) AS w, "
        "LENGTH(string_split(phrase, ' ')) AS plen, n FROM ph), "
        "ws AS (SELECT w, CAST(SUM(plen * n) AS BIGINT) AS deg, "
        "CAST(SUM(n) AS BIGINT) AS f FROM wd GROUP BY 1), "
        "st AS (SELECT w, CAST(ROUND(CAST(deg AS DOUBLE) "
        "/ CAST(f AS DOUBLE) * 1e9, 0) AS BIGINT) AS tick FROM ws), "
        "ps AS (SELECT ph.phrase, ph.n, CAST(SUM(st.tick) AS BIGINT) "
        "AS stt FROM ph, UNNEST(string_split(ph.phrase, ' ')) AS u(w) "
        "JOIN st ON st.w = u.w GROUP BY 1, 2) "
        "SELECT phrase, n AS n_occ, "
        "ROUND(CAST(stt AS DOUBLE) / 1e9, 6) AS score, "
        "CAST(ROW_NUMBER() OVER (ORDER BY stt DESC, phrase) AS BIGINT) "
        "AS rnk FROM ps ORDER BY stt DESC, phrase LIMIT 10"
    )
    out["kapur_threshold"] = (
        # mirrors _q_kapur_threshold (per-cell count histogram incl.
        # zero cells; 1e12-tick entropy sums per candidate)
        "WITH c0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy FROM range(0, 96) "
        "a CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT COALESCE(c0.n, 0) AS x FROM fr LEFT JOIN c0 "
        "ON c0.gx = fr.gx AND c0.gy = fr.gy), "
        "h AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS f FROM dn "
        "GROUP BY 1), "
        "cands AS (SELECT v AS t FROM h "
        "WHERE v < (SELECT MAX(v) FROM h)), "
        "w AS (SELECT c.t, CAST(SUM(CASE WHEN h.v <= c.t THEN h.f "
        "ELSE 0 END) AS BIGINT) AS w0, "
        "CAST(SUM(CASE WHEN h.v > c.t THEN h.f ELSE 0 END) AS BIGINT) "
        "AS w1 FROM cands c, h GROUP BY 1), "
        "tk AS (SELECT w.t, CAST(SUM(CAST(ROUND("
        "-(CAST(h.f AS DOUBLE) / CAST(CASE WHEN h.v <= w.t THEN w.w0 "
        "ELSE w.w1 END AS DOUBLE)) * LN(CAST(h.f AS DOUBLE) "
        "/ CAST(CASE WHEN h.v <= w.t THEN w.w0 ELSE w.w1 END "
        "AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS BIGINT) AS tq "
        "FROM w JOIN h ON TRUE GROUP BY 1), "
        "best AS (SELECT t, tq FROM tk ORDER BY tq DESC, t LIMIT 1) "
        "SELECT (SELECT CAST(SUM(f) AS BIGINT) FROM h) AS n_cells, "
        "best.t AS threshold, "
        "ROUND(CAST(best.tq AS DOUBLE) / 1e12, 6) AS h_sum_nats "
        "FROM best"
    )
    out["distinct_substrings"] = (
        # mirrors _q_distinct_substrings (subword complexity of the
        # up/down bit string)
        _daily_xy_frame
        + ", bt AS (SELECT a.t AS i, CASE WHEN b.y > a.y THEN '1' "
        "ELSE '0' END AS b FROM dn a JOIN dn b ON b.t = a.t + 1), "
        "s AS (SELECT STRING_AGG(b, '' ORDER BY i) AS str, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM bt), "
        "u AS (SELECT DISTINCT substr(s.str, CAST(i.range AS INT), "
        "CAST(l.range AS INT)) AS w FROM s, range(1, 4096) i, "
        "range(1, 4096) l WHERE i.range <= s.n "
        "AND l.range <= s.n - i.range + 1) "
        "SELECT s.n AS n_bits, "
        "CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_distinct, "
        "s.n * (s.n + 1) // 2 AS n_windows, "
        "ROUND(CAST((SELECT COUNT(*) FROM u) AS DOUBLE) "
        "/ CAST(s.n * (s.n + 1) // 2 AS DOUBLE), 6) AS ratio FROM s"
    )
    out["block_entropy"] = (
        # mirrors _q_block_entropy (k-gram entropies, k = 1..4)
        _daily_xy_frame
        + ", bt AS (SELECT a.t AS i, CASE WHEN b.y > a.y THEN '1' "
        "ELSE '0' END AS b FROM dn a JOIN dn b ON b.t = a.t + 1), "
        "s AS (SELECT STRING_AGG(b, '' ORDER BY i) AS str, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM bt), "
        "g AS (SELECT k.range AS k, substr(s.str, "
        "CAST(i.range AS INT), CAST(k.range AS INT)) AS w "
        "FROM s, range(1, 5) k, range(1, 4096) i "
        "WHERE i.range <= s.n - k.range + 1), "
        "cnt AS (SELECT k, w, CAST(COUNT(*) AS BIGINT) AS c FROM g "
        "GROUP BY 1, 2), "
        "tot AS (SELECT k, CAST(SUM(c) AS BIGINT) AS t FROM cnt "
        "GROUP BY 1), "
        "tk AS (SELECT cnt.k, CAST(SUM(CAST(ROUND("
        "-(CAST(c AS DOUBLE) / CAST(tot.t AS DOUBLE)) "
        "* LN(CAST(c AS DOUBLE) / CAST(tot.t AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT)) AS BIGINT) AS tq FROM cnt "
        "JOIN tot ON tot.k = cnt.k GROUP BY 1) "
        "SELECT k, ROUND(CAST(tq AS DOUBLE) / 1e12, 6) AS h_k, "
        "ROUND(CAST(tq AS DOUBLE) / 1e12 "
        "- COALESCE(CAST(LAG(tq) OVER (ORDER BY k) AS DOUBLE) / 1e12, "
        "0.0), 6) AS h_rate FROM tk ORDER BY k"
    )
    out["radiation_model"] = (
        # mirrors _q_radiation_model (strict-disk s_ij, endpoints
        # excluded; zero cells contribute nothing)
        "WITH c0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "hot AS (SELECT gx, gy, n FROM c0 ORDER BY n DESC, gx, gy "
        "LIMIT 10), "
        "pr AS (SELECT o.gx AS o_r, o.gy AS o_c, d.gx AS d_r, "
        "d.gy AS d_c, o.n AS m_i, d.n AS n_j, "
        "(d.gx - o.gx) * (d.gx - o.gx) + (d.gy - o.gy) * (d.gy - o.gy) "
        "AS d2 FROM hot o JOIN hot d "
        "ON NOT (o.gx = d.gx AND o.gy = d.gy)), "
        "sij AS (SELECT pr.o_r, pr.o_c, pr.d_r, pr.d_c, pr.m_i, "
        "pr.n_j, CAST(COALESCE(SUM(CASE WHEN "
        "(c0.gx - pr.o_r) * (c0.gx - pr.o_r) "
        "+ (c0.gy - pr.o_c) * (c0.gy - pr.o_c) < pr.d2 "
        "AND NOT (c0.gx = pr.o_r AND c0.gy = pr.o_c) "
        "AND NOT (c0.gx = pr.d_r AND c0.gy = pr.d_c) THEN c0.n END), "
        "0) AS BIGINT) AS s_ij FROM pr LEFT JOIN c0 ON TRUE "
        "GROUP BY 1, 2, 3, 4, 5, 6) "
        "SELECT o_r, o_c, d_r, d_c, m_i, n_j, s_ij, "
        "ROUND(CAST(m_i AS DOUBLE) * CAST(m_i AS DOUBLE) "
        "* CAST(n_j AS DOUBLE) / ((CAST(m_i AS DOUBLE) "
        "+ CAST(s_ij AS DOUBLE)) * (CAST(m_i AS DOUBLE) "
        "+ CAST(n_j AS DOUBLE) + CAST(s_ij AS DOUBLE))), 6) AS flow "
        "FROM sij"
    )
    out["seam_dp"] = _seam_oracle_sql()
    out["bivariate_moran"] = (
        # mirrors _q_bivariate_moran (rook shifts as 4 equi-joins,
        # HUGEINT n-scaled centering)
        "WITH c0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy FROM range(0, 96) "
        "a CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT fr.gx, fr.gy, COALESCE(c0.n, 0) AS x, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 "
        "ON c0.gx = fr.gx AND c0.gy = fr.gy), "
        "tt AS (SELECT CAST(SUM(x) AS HUGEINT) AS sx, "
        "CAST(SUM(y) AS HUGEINT) AS sy FROM dn), "
        "cx AS (SELECT gx, gy, CAST(9216 AS HUGEINT) * x - tt.sx "
        "AS bx, CAST(9216 AS HUGEINT) * y - tt.sy AS byy "
        "FROM dn, tt), "
        "pr AS (SELECT CAST(SUM(s) AS HUGEINT) AS sxyw, "
        "CAST(COUNT(*) AS BIGINT) AS w FROM ("
        "SELECT a.bx * b.byy AS s FROM cx a JOIN cx b "
        "ON b.gx = a.gx + 1 AND b.gy = a.gy "
        "UNION ALL SELECT a.bx * b.byy FROM cx a JOIN cx b "
        "ON b.gx = a.gx - 1 AND b.gy = a.gy "
        "UNION ALL SELECT a.bx * b.byy FROM cx a JOIN cx b "
        "ON b.gx = a.gx AND b.gy = a.gy + 1 "
        "UNION ALL SELECT a.bx * b.byy FROM cx a JOIN cx b "
        "ON b.gx = a.gx AND b.gy = a.gy - 1)), "
        "ss AS (SELECT CAST(SUM(bx * bx) AS HUGEINT) AS sxx, "
        "CAST(SUM(byy * byy) AS HUGEINT) AS syy FROM cx) "
        "SELECT CAST(9216 AS BIGINT) AS n_cells, pr.w AS w_pairs, "
        "ROUND(CAST(9216 AS DOUBLE) / CAST(pr.w AS DOUBLE) "
        "* CAST(pr.sxyw AS DOUBLE) / SQRT(CAST(ss.sxx AS DOUBLE) "
        "* CAST(ss.syy AS DOUBLE)), 6) AS bivariate_i FROM pr, ss"
    )
    out["harris_corners"] = (
        # mirrors _q_harris_corners (integer Sobel + 3x3 tensor
        # window, k=1/16 response, full-window HAVING guard)
        "WITH c0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy FROM range(0, 96) "
        "a CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT fr.gx AS r, fr.gy AS c, COALESCE(c0.n, 0) AS x "
        "FROM fr LEFT JOIN c0 ON c0.gx = fr.gx AND c0.gy = fr.gy), "
        "gr AS (SELECT e.r, e.c, "
        "(n3.x + 2 * n6.x + n9.x) - (n1.x + 2 * n4.x + n7.x) AS gxv, "
        "(n7.x + 2 * n8.x + n9.x) - (n1.x + 2 * n2.x + n3.x) AS gyv "
        "FROM dn e "
        "JOIN dn n1 ON n1.r = e.r - 1 AND n1.c = e.c - 1 "
        "JOIN dn n2 ON n2.r = e.r - 1 AND n2.c = e.c "
        "JOIN dn n3 ON n3.r = e.r - 1 AND n3.c = e.c + 1 "
        "JOIN dn n4 ON n4.r = e.r AND n4.c = e.c - 1 "
        "JOIN dn n6 ON n6.r = e.r AND n6.c = e.c + 1 "
        "JOIN dn n7 ON n7.r = e.r + 1 AND n7.c = e.c - 1 "
        "JOIN dn n8 ON n8.r = e.r + 1 AND n8.c = e.c "
        "JOIN dn n9 ON n9.r = e.r + 1 AND n9.c = e.c + 1), "
        "tw AS (SELECT e.r, e.c, "
        "CAST(SUM(w.gxv * w.gxv) AS HUGEINT) AS sxx, "
        "CAST(SUM(w.gxv * w.gyv) AS HUGEINT) AS sxy, "
        "CAST(SUM(w.gyv * w.gyv) AS HUGEINT) AS syy "
        "FROM gr e JOIN gr w ON w.r BETWEEN e.r - 1 AND e.r + 1 "
        "AND w.c BETWEEN e.c - 1 AND e.c + 1 "
        "GROUP BY e.r, e.c HAVING COUNT(*) = 9), "
        "rr AS (SELECT r, c, 16 * (sxx * syy - sxy * sxy) "
        "- (sxx + syy) * (sxx + syy) AS r16 FROM tw) "
        "SELECT r, c, CAST(r16 AS BIGINT) AS r16, "
        "CAST(ROW_NUMBER() OVER (ORDER BY r16 DESC, r, c) AS BIGINT) "
        "AS rnk FROM rr ORDER BY r16 DESC, r, c LIMIT 15"
    )
    out["ridge_two_var"] = (
        # mirrors _q_ridge_two_var (centered HUGEINT scatter, 10%
        # diagonal inflation, exact 2x2 Cramer)
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
        "CAST(SUM(x2 * y) AS HUGEINT) AS s2y FROM q), "
        "c AS (SELECT n, s1, s2, sy, "
        "n * s11 - s1 * s1 AS c11, n * s22 - s2 * s2 AS c22, "
        "n * s12 - s1 * s2 AS c12, n * s1y - s1 * sy AS c1y, "
        "n * s2y - s2 * sy AS c2y FROM m), "
        "a AS (SELECT *, c11 + c11 // 10 AS a11, "
        "c22 + c22 // 10 AS a22 FROM c), "
        "b AS (SELECT n, s1, s2, sy, "
        "CAST(c1y * a22 - c12 * c2y AS DOUBLE) "
        "/ CAST(a11 * a22 - c12 * c12 AS DOUBLE) AS b1, "
        "CAST(a11 * c2y - c1y * c12 AS DOUBLE) "
        "/ CAST(a11 * a22 - c12 * c12 AS DOUBLE) AS b2 FROM a) "
        "SELECT CAST(n AS BIGINT) AS n_rows, "
        "ROUND((CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE) "
        "- b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 6) "
        "AS intercept, ROUND(b1, 6) AS beta_qty, "
        "ROUND(b2, 6) AS beta_disc_bp FROM b"
    )
    out["cox_stuart"] = (
        # mirrors _q_cox_stuart (first/second half sign pairs)
        _daily_xy_frame
        + ", st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "pr AS (SELECT b.y - a.y AS d FROM dn a JOIN dn b "
        "ON b.t = a.t + (SELECT n - n // 2 FROM st) "
        "WHERE a.t < (SELECT n // 2 FROM st)), "
        "ct AS (SELECT CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS sp, CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS sm FROM pr) "
        "SELECT sp + sm AS n_pairs, sp AS s_plus, sm AS s_minus, "
        "ROUND(CAST(2 * sp - (sp + sm) AS DOUBLE) "
        "/ SQRT(CAST(sp + sm AS DOUBLE)), 6) AS z FROM ct"
    )
    out["runs_updown"] = (
        # mirrors _q_runs_updown (difference-sign runs, ties dropped)
        _daily_xy_frame
        + ", df AS (SELECT a.t, SIGN(b.y - a.y) AS s FROM dn a "
        "JOIN dn b ON b.t = a.t + 1 WHERE b.y <> a.y), "
        "lg AS (SELECT s, LAG(s) OVER (ORDER BY t) AS ps FROM df), "
        "st AS (SELECT CAST(1 + SUM(CASE WHEN ps IS NOT NULL "
        "AND s <> ps THEN 1 ELSE 0 END) AS BIGINT) AS runs, "
        "CAST(COUNT(*) + 1 AS BIGINT) AS n FROM lg) "
        "SELECT n AS n_obs, runs, "
        "ROUND((CAST(runs AS DOUBLE) - (2.0 * CAST(n AS DOUBLE) - 1.0) "
        "/ 3.0) / SQRT((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6) "
        "AS z FROM st"
    )
    out["mh_odds"] = (
        # mirrors _q_mh_odds (day-of-week strata, 1e6-tick rational
        # terms, explicit diff*diff to avoid POWER)
        "WITH e AS (SELECT (epoch_us(ts) // 86400000000) % 7 AS dow, "
        "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ex, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS v FROM events "
        "WHERE event_type IN ('click', 'error')), "
        "md AS (SELECT quantile_disc(v, 0.5) AS m FROM e), "
        "cl AS (SELECT dow, ex, CASE WHEN v > md.m THEN 1 ELSE 0 END "
        "AS o, CAST(COUNT(*) AS BIGINT) AS c FROM e, md "
        "GROUP BY 1, 2, 3), "
        "sl AS (SELECT dow, "
        "CAST(COALESCE(SUM(CASE WHEN ex = 1 AND o = 1 THEN c END), 0) "
        "AS BIGINT) AS a, "
        "CAST(COALESCE(SUM(CASE WHEN ex = 1 AND o = 0 THEN c END), 0) "
        "AS BIGINT) AS b, "
        "CAST(COALESCE(SUM(CASE WHEN ex = 0 AND o = 1 THEN c END), 0) "
        "AS BIGINT) AS cc, "
        "CAST(COALESCE(SUM(CASE WHEN ex = 0 AND o = 0 THEN c END), 0) "
        "AS BIGINT) AS d FROM cl GROUP BY 1), "
        "tk AS (SELECT CAST(SUM(a) AS BIGINT) AS a_sum, "
        "CAST(SUM(CAST(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) "
        "/ CAST(a + b + cc + d AS DOUBLE) * 1e6, 0) AS BIGINT)) "
        "AS BIGINT) AS num, "
        "CAST(SUM(CAST(ROUND(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE) "
        "/ CAST(a + b + cc + d AS DOUBLE) * 1e6, 0) AS BIGINT)) "
        "AS BIGINT) AS den, "
        "CAST(SUM(CAST(ROUND(CAST(a + b AS DOUBLE) "
        "* CAST(a + cc AS DOUBLE) / CAST(a + b + cc + d AS DOUBLE) "
        "* 1e6, 0) AS BIGINT)) AS BIGINT) AS e_t, "
        "CAST(SUM(CAST(ROUND(CAST(a + b AS DOUBLE) "
        "* CAST(cc + d AS DOUBLE) * CAST(a + cc AS DOUBLE) "
        "* CAST(b + d AS DOUBLE) / (CAST(a + b + cc + d AS DOUBLE) "
        "* CAST(a + b + cc + d AS DOUBLE) "
        "* CAST(a + b + cc + d - 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)) "
        "AS BIGINT) AS var_t FROM sl WHERE a + b + cc + d > 0), "
        "dd AS (SELECT (CAST(a_sum AS DOUBLE) * 1e6 "
        "- CAST(e_t AS DOUBLE)) / 1e6 AS diff FROM tk) "
        "SELECT (SELECT CAST(m AS BIGINT) FROM md) AS median_cents, "
        "tk.a_sum, "
        "ROUND(CAST(tk.num AS DOUBLE) / CAST(tk.den AS DOUBLE), 6) "
        "AS mh_or, "
        "ROUND(dd.diff * dd.diff / (CAST(tk.var_t AS DOUBLE) / 1e6), "
        "6) AS cmh_chi2 FROM tk, dd"
    )
    out["kulldorff_scan"] = (
        # mirrors _q_kulldorff_scan (square scan windows around the
        # 12 hottest cells, Poisson LLR at 1e9 ticks)
        "WITH c0 AS (SELECT (event_id % 9216) // 96 AS r, "
        "(event_id % 9216) % 96 AS c, CAST(COUNT(*) AS BIGINT) AS x "
        "FROM events GROUP BY 1, 2), "
        "nt AS (SELECT CAST(SUM(x) AS BIGINT) AS n FROM c0), "
        "hot AS (SELECT r, c FROM c0 ORDER BY x DESC, r, c LIMIT 12), "
        "rad AS (SELECT UNNEST([2, 4, 8, 16]) AS radius), "
        "z AS (SELECT hot.r AS hr, hot.c AS hc, rad.radius, "
        "GREATEST(0, hot.r - rad.radius) AS r0, "
        "GREATEST(0, hot.c - rad.radius) AS cl0, "
        "LEAST(95, hot.r + rad.radius) AS r1, "
        "LEAST(95, hot.c + rad.radius) AS cl1 "
        "FROM hot CROSS JOIN rad), "
        "agg AS (SELECT z.hr, z.hc, z.radius, "
        "(z.r1 - z.r0 + 1) * (z.cl1 - z.cl0 + 1) AS area, "
        "CAST(COALESCE(SUM(c0.x), 0) AS BIGINT) AS n_in FROM z "
        "LEFT JOIN c0 ON c0.r BETWEEN z.r0 AND z.r1 "
        "AND c0.c BETWEEN z.cl0 AND z.cl1 "
        "GROUP BY z.hr, z.hc, z.radius, "
        "(z.r1 - z.r0 + 1) * (z.cl1 - z.cl0 + 1)), "
        "lr AS (SELECT hr, hc, radius, n_in, area, "
        "CAST(ROUND(CASE WHEN CAST(n_in AS DOUBLE) > "
        "CAST(nt.n AS DOUBLE) * CAST(area AS DOUBLE) / 9216.0 "
        "AND n_in < nt.n THEN (CAST(n_in AS DOUBLE) "
        "* LN(CAST(n_in AS DOUBLE) / (CAST(nt.n AS DOUBLE) "
        "* CAST(area AS DOUBLE) / 9216.0)) "
        "+ CAST(nt.n - n_in AS DOUBLE) "
        "* LN(CAST(nt.n - n_in AS DOUBLE) / (CAST(nt.n AS DOUBLE) "
        "- CAST(nt.n AS DOUBLE) * CAST(area AS DOUBLE) / 9216.0))) "
        "* 1e9 ELSE 0.0 END, 0) AS BIGINT) AS tick FROM agg, nt) "
        "SELECT hr AS center_r, hc AS center_c, "
        "CAST(radius AS BIGINT) AS radius, n_in, "
        "CAST(area AS BIGINT) AS area, "
        "ROUND(CAST(tick AS DOUBLE) / 1e9, 6) AS llr, "
        "CAST(ROW_NUMBER() OVER (ORDER BY tick DESC, hr, hc, radius) "
        "AS BIGINT) AS rnk FROM lr"
    )
    out["retile_extract"] = (
        # mirrors _q_retile_extract (re-tiling must be value- and
        # coordinate-preserving; the oracle is the grid itself)
        f"SELECT row, col, ROUND(z, 6) AS z FROM ({_OG_GRID_SQL}) g "
        "WHERE z > -1e30"
    )
    out["kuiper_test"] = (
        # mirrors _q_kuiper_test (1e12-tick cumulative-share diffs,
        # integer maxima)
        "WITH h AS (SELECT r.range AS hour FROM range(0, 24) r), "
        "c AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 "
        "AS hour, CAST(COUNT(*) AS BIGINT) AS n FROM events "
        "WHERE event_type IN ('click', 'error') GROUP BY 1, 2), "
        "f AS (SELECT h.hour, COALESCE(ck.n, 0) AS c1, "
        "COALESCE(er.n, 0) AS c2 FROM h "
        "LEFT JOIN c ck ON ck.hour = h.hour "
        "AND ck.event_type = 'click' "
        "LEFT JOIN c er ON er.hour = h.hour "
        "AND er.event_type = 'error'), "
        "nn AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
        "CAST(SUM(c2) AS BIGINT) AS n2 FROM f), "
        "cm AS (SELECT hour, SUM(c1) OVER (ORDER BY hour "
        "ROWS UNBOUNDED PRECEDING) AS ca, SUM(c2) OVER (ORDER BY hour "
        "ROWS UNBOUNDED PRECEDING) AS cb FROM f), "
        "tk AS (SELECT CAST(GREATEST(MAX(CAST(ROUND((CAST(cm.ca "
        "AS DOUBLE) / CAST(nn.n1 AS DOUBLE) - CAST(cm.cb AS DOUBLE) "
        "/ CAST(nn.n2 AS DOUBLE)) * 1e12, 0) AS BIGINT)), 0) "
        "AS BIGINT) AS dp, CAST(GREATEST(MAX(-CAST(ROUND((CAST(cm.ca "
        "AS DOUBLE) / CAST(nn.n1 AS DOUBLE) - CAST(cm.cb AS DOUBLE) "
        "/ CAST(nn.n2 AS DOUBLE)) * 1e12, 0) AS BIGINT)), 0) "
        "AS BIGINT) AS dm FROM cm, nn) "
        "SELECT nn.n1 AS n_click, nn.n2 AS n_error, "
        "ROUND(CAST(tk.dp AS DOUBLE) / 1e12, 6) AS d_plus, "
        "ROUND(CAST(tk.dm AS DOUBLE) / 1e12, 6) AS d_minus, "
        "ROUND(CAST(tk.dp + tk.dm AS DOUBLE) / 1e12, 6) AS v_stat "
        "FROM nn, tk"
    )
    out["page_trend"] = (
        # mirrors _q_page_trend (complete weeks, within-week 2x
        # tie-averaged ranks, classical k=7 moments)
        _daily_xy_frame
        + ", wd AS (SELECT t // 7 AS w, t % 7 + 1 AS j, y FROM dn "
        "WHERE t // 7 < (SELECT COUNT(*) FROM dn) // 7), "
        "rk AS (SELECT a.w, a.j, CAST(2 * SUM(CASE WHEN b.y < a.y "
        "THEN 1 ELSE 0 END) + SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 "
        "END) + 1 AS BIGINT) AS r2 FROM wd a JOIN wd b ON b.w = a.w "
        "GROUP BY a.w, a.j), "
        "st AS (SELECT CAST(SUM(j * r2) AS BIGINT) AS l2, "
        "CAST((SELECT COUNT(*) FROM dn) // 7 AS BIGINT) AS b FROM rk) "
        "SELECT b AS n_weeks, l2, "
        "ROUND((CAST(l2 AS DOUBLE) / 2.0 "
        "- CAST(b * 7 * 8 * 8 AS DOUBLE) / 4.0) "
        "/ SQRT(CAST(b * 49 * 8 * 48 AS DOUBLE) / 144.0), 6) AS z "
        "FROM st"
    )
    out["theil_decomp"] = (
        # mirrors _q_theil_decomp (per-doc and per-source 1e12-tick
        # terms, within = total - between in tick space)
        "WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(n_chars) AS BIGINT) AS s FROM documents), "
        "tt AS (SELECT CAST(SUM(CAST(ROUND(CAST(n_chars AS DOUBLE) "
        "/ CAST(tot.s AS DOUBLE) * LN(CAST(n_chars AS DOUBLE) "
        "* CAST(tot.n AS DOUBLE) / CAST(tot.s AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT)) AS BIGINT) AS tq FROM documents, tot), "
        "g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ng, "
        "CAST(SUM(n_chars) AS BIGINT) AS sg FROM documents GROUP BY 1), "
        "bt AS (SELECT CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) "
        "/ CAST(tot.s AS DOUBLE) * LN(CAST(sg AS DOUBLE) "
        "* CAST(tot.n AS DOUBLE) / (CAST(tot.s AS DOUBLE) "
        "* CAST(ng AS DOUBLE))) * 1e12, 0) AS BIGINT)) AS BIGINT) "
        "AS bq FROM g, tot) "
        "SELECT tot.n AS n_docs, "
        "ROUND(CAST(tt.tq AS DOUBLE) / 1e12, 6) AS theil_total, "
        "ROUND(CAST(bt.bq AS DOUBLE) / 1e12, 6) AS theil_between, "
        "ROUND(CAST(tt.tq - bt.bq AS DOUBLE) / 1e12, 6) "
        "AS theil_within FROM tot, tt, bt"
    )
    out["ansari_bradley"] = (
        # mirrors _q_ansari_bradley (folded 2x pooled ranks from the
        # cents histograms, even/odd-N classical moments)
        "WITH h AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v, "
        "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS c1, "
        "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS c2 FROM events "
        "WHERE event_type IN ('click', 'error') GROUP BY 1), "
        "cm AS (SELECT v, c1, c1 + c2 AS m, "
        "SUM(c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) "
        "- (c1 + c2) AS clt FROM h), "
        "nn AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
        "CAST(SUM(c2) AS BIGINT) AS n2, "
        "CAST(SUM(c1 + c2) AS BIGINT) AS n FROM h), "
        "ab AS (SELECT CAST(SUM(cm.c1 * LEAST(2 * cm.clt + cm.m + 1, "
        "2 * (nn.n + 1) - (2 * cm.clt + cm.m + 1))) AS BIGINT) AS ab2 "
        "FROM cm, nn) "
        "SELECT nn.n1 AS n_click, nn.n2 AS n_error, ab.ab2, "
        "ROUND((CAST(ab.ab2 AS DOUBLE) / 2.0 - CASE WHEN nn.n % 2 = 0 "
        "THEN CAST(nn.n1 * (nn.n + 2) AS DOUBLE) / 4.0 "
        "ELSE CAST(nn.n1 * (nn.n + 1) * (nn.n + 1) AS DOUBLE) "
        "/ (4.0 * CAST(nn.n AS DOUBLE)) END) "
        "/ SQRT(CASE WHEN nn.n % 2 = 0 "
        "THEN CAST(nn.n1 AS DOUBLE) * CAST(nn.n2 AS DOUBLE) "
        "* CAST(nn.n + 2 AS DOUBLE) * CAST(nn.n - 2 AS DOUBLE) "
        "/ (48.0 * CAST(nn.n - 1 AS DOUBLE)) "
        "ELSE CAST(nn.n1 AS DOUBLE) * CAST(nn.n2 AS DOUBLE) "
        "* CAST(nn.n + 1 AS DOUBLE) * CAST(3 + nn.n * nn.n AS DOUBLE) "
        "/ (48.0 * CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) END), "
        "6) AS z FROM nn, ab"
    )
    out["grid_prefix_sums"] = (
        # mirrors _q_grid_prefix_sums (dense 96x96 frame, row-major
        # cumsum then column-major cumsum of the row cumsums)
        "WITH c0 AS (SELECT (event_id % 9216) // 96 AS r, "
        "(event_id % 9216) % 96 AS c, CAST(COUNT(*) AS BIGINT) AS x "
        "FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS r, b.range AS c FROM range(0, 96) a "
        "CROSS JOIN range(0, 96) b), "
        "dn AS (SELECT fr.r, fr.c, COALESCE(c0.x, 0) AS x FROM fr "
        "LEFT JOIN c0 ON c0.r = fr.r AND c0.c = fr.c), "
        "rc AS (SELECT r, c, SUM(x) OVER (PARTITION BY r ORDER BY c "
        "ROWS UNBOUNDED PRECEDING) AS rx FROM dn) "
        "SELECT r, c, CAST(SUM(rx) OVER (PARTITION BY c ORDER BY r "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sat FROM rc "
        "ORDER BY r, c"
    )
    out["cliffs_delta"] = (
        # mirrors _q_cliffs_delta (cumulative-histogram pair counts)
        "WITH h AS (SELECT event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS v, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events "
        "WHERE event_type IN ('click', 'error') GROUP BY 1, 2), "
        "u AS (SELECT DISTINCT v FROM h), "
        "a0 AS (SELECT u.v, COALESCE(h.c, 0) AS c FROM u "
        "LEFT JOIN h ON h.v = u.v AND h.event_type = 'click'), "
        "b0 AS (SELECT u.v, COALESCE(h.c, 0) AS c FROM u "
        "LEFT JOIN h ON h.v = u.v AND h.event_type = 'error'), "
        "bc AS (SELECT v, c, SUM(c) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING) - c AS clt, "
        "(SELECT SUM(c) FROM b0) - SUM(c) OVER (ORDER BY v "
        "ROWS UNBOUNDED PRECEDING) AS cgt FROM b0), "
        "st AS (SELECT CAST(SUM(a0.c * bc.clt) AS BIGINT) AS gt, "
        "CAST(SUM(a0.c * bc.cgt) AS BIGINT) AS lt "
        "FROM a0 JOIN bc ON bc.v = a0.v), "
        "nn AS (SELECT CAST((SELECT SUM(c) FROM a0) AS BIGINT) AS n1, "
        "CAST((SELECT SUM(c) FROM b0) AS BIGINT) AS n2) "
        "SELECT nn.n1 AS n_click, nn.n2 AS n_error, st.gt AS n_gt, "
        "st.lt AS n_lt, ROUND(CAST(st.gt - st.lt AS DOUBLE) "
        "/ (CAST(nn.n1 AS DOUBLE) * CAST(nn.n2 AS DOUBLE)), 6) "
        "AS cliffs_delta FROM nn, st"
    )
    out["jonckheere"] = (
        # mirrors _q_jonckheere (alphabetical dose order, 2x JT from
        # per-type cumulative histograms, tie-uncorrected moments)
        "WITH h AS (SELECT event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS v, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
        "u AS (SELECT DISTINCT v FROM h), "
        "tt AS (SELECT DISTINCT event_type FROM h), "
        "g AS (SELECT tt.event_type, u.v, COALESCE(h.c, 0) AS c "
        "FROM tt CROSS JOIN u LEFT JOIN h "
        "ON h.event_type = tt.event_type AND h.v = u.v), "
        "cg AS (SELECT event_type, v, c, SUM(c) OVER "
        "(PARTITION BY event_type ORDER BY v "
        "ROWS UNBOUNDED PRECEDING) - c AS clt FROM g), "
        "jt AS (SELECT CAST(SUM(b.c * (2 * a.clt + a.c)) AS BIGINT) "
        "AS jt2 FROM cg a JOIN cg b ON b.v = a.v "
        "AND a.event_type < b.event_type), "
        "sz AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h "
        "GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(SUM(n * n) AS BIGINT) AS sn2, "
        "CAST(SUM(n * n * (2 * n + 3)) AS BIGINT) AS sn23 FROM sz) "
        "SELECT tot.nn AS n_events, jt.jt2, "
        "ROUND((CAST(jt.jt2 AS DOUBLE) / 2.0 "
        "- CAST(tot.nn * tot.nn - tot.sn2 AS DOUBLE) / 4.0) "
        "/ SQRT(CAST(tot.nn * tot.nn * (2 * tot.nn + 3) "
        "- tot.sn23 AS DOUBLE) / 72.0), 6) AS z FROM tot, jt"
    )
    out["dixon_q"] = (
        # mirrors _q_dixon_q (order statistics of daily cents)
        _daily_xy_frame
        + ", o AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS k "
        "FROM dn), "
        "cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "st AS (SELECT "
        "CAST((SELECT y FROM o, cnt WHERE o.k = cnt.n) AS BIGINT) "
        "AS ymax, "
        "CAST((SELECT y FROM o, cnt WHERE o.k = cnt.n - 1) AS BIGINT) "
        "AS y2max, "
        "CAST((SELECT y FROM o WHERE k = 1) AS BIGINT) AS ymin, "
        "CAST((SELECT y FROM o WHERE k = 2) AS BIGINT) AS y2min, "
        "(SELECT n FROM cnt) AS n) "
        "SELECT n AS n_days, ymax - ymin AS range_cents, "
        "ROUND(CAST(ymax - y2max AS DOUBLE) "
        "/ CAST(ymax - ymin AS DOUBLE), 6) AS q_max, "
        "ROUND(CAST(y2min - ymin AS DOUBLE) "
        "/ CAST(ymax - ymin AS DOUBLE), 6) AS q_min FROM st"
    )
    out["rank_distance"] = (
        # mirrors _q_rank_distance (doc-count vs char-count rankings)
        "WITH a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM documents "
        "GROUP BY 1), "
        "r AS (SELECT source, ROW_NUMBER() OVER (ORDER BY n_docs DESC, "
        "source) AS r1, ROW_NUMBER() OVER (ORDER BY n_chars DESC, "
        "source) AS r2 FROM a), "
        "f AS (SELECT CAST(SUM(ABS(r1 - r2)) AS BIGINT) AS footrule, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM r), "
        "k AS (SELECT CAST(SUM(CASE WHEN (x.r1 - y.r1) "
        "* (x.r2 - y.r2) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS kd "
        "FROM r x JOIN r y ON x.source < y.source) "
        "SELECT f.n AS n_items, f.footrule, k.kd AS kendall_dist, "
        "ROUND(CAST(f.footrule AS DOUBLE) / (CAST(f.n AS DOUBLE) "
        "* CAST(f.n AS DOUBLE) / 2.0), 6) AS footrule_norm FROM f, k"
    )
    out["readability_panel"] = (
        # mirrors _q_readability_panel (ARI / Coleman-Liau / LIX from
        # exact regex counts; same CASE w=0 guard as flesch)
        "WITH b AS (SELECT doc_id, "
        "LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS l, "
        "LENGTH(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS c, "
        "LENGTH(regexp_extract_all(text, '\\S+')) AS w, "
        "GREATEST(LENGTH(regexp_extract_all(text, '[.!?]+')), 1) AS s, "
        "LENGTH(list_filter(regexp_extract_all(text, '\\S+'), "
        "x -> LENGTH(x) >= 7)) AS lw FROM documents) "
        "SELECT doc_id, CAST(l AS BIGINT) AS n_letters, "
        "CAST(c AS BIGINT) AS n_alnum, CAST(lw AS BIGINT) "
        "AS n_long_words, "
        "ROUND(CASE WHEN w = 0 THEN 0.0 ELSE 4.71 * (CAST(c AS DOUBLE) "
        "/ CAST(w AS DOUBLE)) + 0.5 * (CAST(w AS DOUBLE) "
        "/ CAST(s AS DOUBLE)) - 21.43 END, 6) AS ari, "
        "ROUND(CASE WHEN w = 0 THEN 0.0 ELSE 0.0588 * "
        "((CAST(l AS DOUBLE) / CAST(w AS DOUBLE)) * 100.0) - 0.296 * "
        "((CAST(s AS DOUBLE) / CAST(w AS DOUBLE)) * 100.0) - 15.8 "
        "END, 6) AS coleman_liau, "
        "ROUND(CASE WHEN w = 0 THEN 0.0 ELSE (CAST(w AS DOUBLE) "
        "/ CAST(s AS DOUBLE)) + 100.0 * (CAST(lw AS DOUBLE) "
        "/ CAST(w AS DOUBLE)) END, 6) AS lix FROM b"
    )
    out["track_intersections"] = (
        # ordered fixes -> segments -> non-adjacent pair CASE mirror
        # of the integer orientation/on-segment predicate
        "WITH f AS (SELECT user_id, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS k, "
        "CAST(event_id % 96 AS BIGINT) AS x, "
        "CAST((event_id // 96) % 96 AS BIGINT) AS y FROM events), "
        "s AS (SELECT a.user_id, a.k AS i, a.x AS ax, a.y AS ay, "
        "b.x AS bx, b.y AS by FROM f a "
        "JOIN f b ON b.user_id = a.user_id AND b.k = a.k + 1), "
        "ns AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments "
        "FROM s GROUP BY user_id), "
        "pr AS (SELECT p.user_id, "
        "(p.bx - p.ax) * (q.ay - p.ay) "
        "- (p.by - p.ay) * (q.ax - p.ax) AS d3, "
        "(p.bx - p.ax) * (q.by - p.ay) "
        "- (p.by - p.ay) * (q.bx - p.ax) AS d4, "
        "(q.bx - q.ax) * (p.ay - q.ay) "
        "- (q.by - q.ay) * (p.ax - q.ax) AS d1, "
        "(q.bx - q.ax) * (p.by - q.ay) "
        "- (q.by - q.ay) * (p.bx - q.ax) AS d2, "
        "p.ax, p.ay, p.bx, p.by, q.ax AS cx, q.ay AS cy, "
        "q.bx AS dx, q.by AS dy "
        "FROM s p JOIN s q ON q.user_id = p.user_id "
        "AND q.i >= p.i + 2), "
        "hit AS (SELECT user_id, "
        "CASE WHEN ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) "
        "AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)) THEN 1 "
        "WHEN d1 = 0 AND ax BETWEEN LEAST(cx, dx) AND GREATEST(cx, dx) "
        "AND ay BETWEEN LEAST(cy, dy) AND GREATEST(cy, dy) THEN 1 "
        "WHEN d2 = 0 AND bx BETWEEN LEAST(cx, dx) AND GREATEST(cx, dx) "
        "AND by BETWEEN LEAST(cy, dy) AND GREATEST(cy, dy) THEN 1 "
        "WHEN d3 = 0 AND cx BETWEEN LEAST(ax, bx) AND GREATEST(ax, bx) "
        "AND cy BETWEEN LEAST(ay, by) AND GREATEST(ay, by) THEN 1 "
        "WHEN d4 = 0 AND dx BETWEEN LEAST(ax, bx) AND GREATEST(ax, bx) "
        "AND dy BETWEEN LEAST(ay, by) AND GREATEST(ay, by) THEN 1 "
        "ELSE 0 END AS c FROM pr), "
        "hc AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_crossings "
        "FROM hit GROUP BY user_id) "
        "SELECT ns.user_id, ns.n_segments, "
        "COALESCE(hc.n_crossings, 0) AS n_crossings "
        "FROM ns LEFT JOIN hc ON hc.user_id = ns.user_id"
    )
    out["theil_index"] = (
        # same two-pass quantized-moment construction: exact cents,
        # exact 1e9-quantized x*ln(x/mu) term sums, shared float tail
        "WITH pc AS (SELECT o.o_custkey, c.c_nationkey, "
        "CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS cents "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "GROUP BY 1, 2), "
        "g AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS ng, "
        "CAST(SUM(cents) AS BIGINT) AS sg FROM pc GROUP BY 1), "
        "t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n_tot, "
        "CAST(SUM(sg) AS BIGINT) AS s_tot FROM g), "
        "mu AS (SELECT n_tot, s_tot, "
        "(CAST(s_tot AS DOUBLE) / 100.0) / CAST(n_tot AS DOUBLE) AS mu "
        "FROM t), "
        "terms AS (SELECT "
        "CAST(SUM(CAST(ROUND((CAST(pc.cents AS DOUBLE) / 100.0) "
        "* LN((CAST(pc.cents AS DOUBLE) / 100.0) / mu.mu) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS q_tot, "
        "CAST(SUM(CAST(ROUND((CAST(pc.cents AS DOUBLE) / 100.0) "
        "* LN((CAST(pc.cents AS DOUBLE) / 100.0) "
        "/ ((CAST(g.sg AS DOUBLE) / 100.0) / CAST(g.ng AS DOUBLE))) "
        "* 1e9, 0) AS BIGINT)) AS BIGINT) AS q_win "
        "FROM pc JOIN g ON g.c_nationkey = pc.c_nationkey, mu), "
        "btw AS (SELECT CAST(SUM(CAST(ROUND("
        "(CAST(g.sg AS DOUBLE) / 100.0) "
        "* LN(((CAST(g.sg AS DOUBLE) / 100.0) / CAST(g.ng AS DOUBLE)) "
        "/ mu.mu) * 1e9, 0) AS BIGINT)) AS BIGINT) AS q_btw "
        "FROM g, mu) "
        "SELECT mu.n_tot AS n_customers, "
        "ROUND((CAST(terms.q_tot AS DOUBLE) / 1e9) "
        "/ (CAST(mu.n_tot AS DOUBLE) * mu.mu), 6) AS theil_total, "
        "ROUND((CAST(btw.q_btw AS DOUBLE) / 1e9) "
        "/ (CAST(mu.n_tot AS DOUBLE) * mu.mu), 6) AS theil_between, "
        "ROUND((CAST(terms.q_win AS DOUBLE) / 1e9) "
        "/ (CAST(mu.n_tot AS DOUBLE) * mu.mu), 6) AS theil_within "
        "FROM terms, btw, mu"
    )
    out["kendall_tau"] = (
        # exact pair counts via the event_id-ordered self-join; tau-b
        # repeats the engine's float expression over the same ints
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS x, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "p AS (SELECT a.user_id, "
        "CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y) "
        "OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS nc, "
        "CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y) "
        "OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS nd, "
        "CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) "
        "AS tx, "
        "CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) "
        "AS ty, "
        "CAST(COUNT(*) AS BIGINT) AS n0 "
        "FROM e a JOIN e b ON b.user_id = a.user_id "
        "AND a.event_id < b.event_id GROUP BY a.user_id), "
        "q AS (SELECT user_id, nc, nd, "
        "SQRT((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE)) "
        "* (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))) AS denom "
        "FROM p) "
        "SELECT user_id, nc, nd, "
        "ROUND((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE)) / denom, 6) "
        "AS tau FROM q WHERE denom > 0.0"
    )
    out["phrase_search"] = (
        # positional self-join mirror of the bit-anchor phrase count:
        # 1-based generate_subscripts vs the engine's 0-based anchors
        # -- only relative adjacency matters
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "p AS (SELECT doc_id, UNNEST(toks) AS w, "
        "generate_subscripts(toks, 1) AS i FROM t) "
        "SELECT a.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits "
        "FROM p a "
        "JOIN p b ON b.doc_id = a.doc_id AND b.i = a.i + 1 "
        "JOIN p c ON c.doc_id = a.doc_id AND c.i = a.i + 2 "
        "WHERE a.w = 'row' AND b.w = 'column' AND c.w = 'sort' "
        "GROUP BY 1"
    )
    out["holt_winters"] = (
        # recursive-CTE Holt-Winters additive (m=7): the 7 live
        # seasonal states travel as a LIST column, s[1] is the
        # season-lagged state; expressions literally repeat
        # _q_holt_winters's
        "WITH RECURSIVE c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "init AS (SELECT "
        "CAST(w1.s1 AS DOUBLE) / 7.0 AS l0, "
        "(CAST(w2.s2 AS DOUBLE) - CAST(w1.s1 AS DOUBLE)) / 49.0 AS b0, "
        "(SELECT LIST(CAST(dn.x AS DOUBLE) "
        "- CAST(w1.s1 AS DOUBLE) / 7.0 ORDER BY dn.t) "
        "FROM dn WHERE dn.t < 7) AS s0 "
        "FROM (SELECT CAST(SUM(x) AS BIGINT) AS s1 FROM dn "
        "WHERE t < 7) w1, "
        "(SELECT CAST(SUM(x) AS BIGINT) AS s2 FROM dn "
        "WHERE t >= 7 AND t < 14) w2), "
        "h(t, l, b, s) AS ("
        "SELECT 6, l0, b0, s0 FROM init "
        "UNION ALL "
        "SELECT h.t + 1, "
        "(0.3 * (d.x - h.s[1])) + (0.7 * (h.l + h.b)), "
        "(0.1 * (((0.3 * (d.x - h.s[1])) + (0.7 * (h.l + h.b))) - h.l)) "
        "+ (0.9 * h.b), "
        "list_concat(h.s[2:7], [(0.2 * (d.x "
        "- ((0.3 * (d.x - h.s[1])) + (0.7 * (h.l + h.b))))) "
        "+ (0.8 * h.s[1])]) "
        "FROM h JOIN dn d ON d.t = h.t + 1) "
        "SELECT ROUND(l, 6) AS level, ROUND(b, 6) AS trend, "
        "ROUND(l + b + s[1], 6) AS forecast_1 FROM h "
        "WHERE t = (SELECT hi - lo FROM mm)"
    )
    out["dispersion_ellipse"] = (
        "WITH m AS (SELECT user_id, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(event_id % 96) AS BIGINT) AS sx, "
        "CAST(SUM((event_id // 96) % 96) AS BIGINT) AS sy, "
        "CAST(SUM((event_id % 96) * (event_id % 96)) AS BIGINT) AS sxx, "
        "CAST(SUM(((event_id // 96) % 96) * ((event_id // 96) % 96)) "
        "AS BIGINT) AS syy, "
        "CAST(SUM((event_id % 96) * ((event_id // 96) % 96)) AS BIGINT) "
        "AS sxy FROM events GROUP BY user_id), "
        "cov AS (SELECT user_id, "
        "CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS cxx, "
        "CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cyy, "
        "CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cxy "
        "FROM m), "
        "eig AS (SELECT user_id, "
        "(cxx + cyy) / 2.0 AS tr2, "
        "SQRT(((cxx - cyy) / 2.0) * ((cxx - cyy) / 2.0) + cxy * cxy) "
        "AS disc, "
        "ATAN2(2.0 * cxy, cxx - cyy) / 2.0 AS theta FROM cov) "
        "SELECT user_id, "
        "ROUND(SQRT(tr2 + disc), 6) AS semi_major, "
        "ROUND(SQRT(tr2 - disc), 6) AS semi_minor, "
        "ROUND(theta, 6) AS theta FROM eig"
    )
    out["kl_divergence"] = (
        # per-(source,lang) terms quantized at 1e12 (exact int64
        # cross-language sum in any order), mirroring _q_kl_divergence
        "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_sl "
        "FROM documents GROUP BY source, lang), "
        "s AS (SELECT source, CAST(SUM(n_sl) AS BIGINT) AS n_s "
        "FROM c GROUP BY source), "
        "l AS (SELECT lang, CAST(SUM(n_sl) AS BIGINT) AS n_l "
        "FROM c GROUP BY lang), "
        "t AS (SELECT CAST(SUM(n_sl) AS BIGINT) AS n FROM c), "
        "q AS (SELECT c.source, "
        "CAST(ROUND(CAST(c.n_sl AS DOUBLE) / CAST(s.n_s AS DOUBLE) "
        "* LN(CAST(c.n_sl * t.n AS DOUBLE) "
        "/ CAST(s.n_s * l.n_l AS DOUBLE)) * 1e12, 0) AS BIGINT) AS tq "
        "FROM c JOIN s ON s.source = c.source "
        "JOIN l ON l.lang = c.lang CROSS JOIN t) "
        "SELECT source, "
        "ROUND(CAST(SUM(tq) AS DOUBLE) / 1e12, 6) AS kl_nats "
        "FROM q GROUP BY source"
    )
    out["ripley_k"] = (
        "WITH p AS (SELECT event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS px, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS py "
        "FROM events WHERE event_id % 20 = 0), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p), "
        "r AS (SELECT CAST(rad AS DOUBLE) AS rad "
        "FROM (VALUES (0.02), (0.05), (0.10)) v(rad)), "
        "c AS (SELECT r.rad, CAST(COUNT(*) AS BIGINT) AS n_pairs "
        "FROM r, p a, p b "
        "WHERE a.event_id <> b.event_id "
        "AND (a.px - b.px) * (a.px - b.px) "
        "+ (a.py - b.py) * (a.py - b.py) <= r.rad * r.rad "
        "GROUP BY r.rad) "
        "SELECT c.rad AS radius, c.n_pairs, "
        "ROUND(0.9025 * CAST(c.n_pairs AS DOUBLE) "
        "/ CAST(m.m * (m.m - 1) AS DOUBLE), 6) AS k_hat "
        "FROM c, m"
    )
    out["watershed_labels"] = (
        f"WITH RECURSIVE fd AS ({out['flow_direction']}), "
        "e AS MATERIALIZED (SELECT f.row AS r, f.col AS c, "
        "f.row + CASE f.d8 WHEN 2 THEN 1 WHEN 4 THEN 1 WHEN 8 THEN 1 "
        "WHEN 32 THEN -1 WHEN 64 THEN -1 WHEN 128 THEN -1 "
        "ELSE 0 END AS nr, "
        "f.col + CASE f.d8 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 128 THEN 1 "
        "WHEN 8 THEN -1 WHEN 16 THEN -1 WHEN 32 THEN -1 "
        "ELSE 0 END AS nc "
        "FROM fd f WHERE f.d8 <> 0), "
        "en AS MATERIALIZED (SELECT e.r, e.c, e.nr, e.nc FROM e "
        "JOIN fd t ON t.row = e.nr AND t.col = e.nc), "
        "ws(sr, sc, r, c) AS ("
        "SELECT f.row, f.col, f.row, f.col FROM fd f "
        "UNION "
        "SELECT w.sr, w.sc, en.nr, en.nc FROM ws w "
        "JOIN en ON en.r = w.r AND en.c = w.c) "
        "SELECT sr AS row, sc AS col, "
        "r AS sink_row, c AS sink_col FROM ws "
        "WHERE NOT EXISTS (SELECT 1 FROM en WHERE en.r = ws.r "
        "AND en.c = ws.c)"
    )
    out["twi"] = (
        # ln(flow_acc * cellwidth / tan(slope)) composing the
        # flow_accumulation recursive closure with the Horn slope
        # window; mirrors _q_twi's shared float expression
        f"WITH RECURSIVE fd AS ({out['flow_direction']}), "
        "e AS MATERIALIZED (SELECT f.row AS r, f.col AS c, "
        "f.row + CASE f.d8 WHEN 2 THEN 1 WHEN 4 THEN 1 WHEN 8 THEN 1 "
        "WHEN 32 THEN -1 WHEN 64 THEN -1 WHEN 128 THEN -1 "
        "ELSE 0 END AS nr, "
        "f.col + CASE f.d8 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 128 THEN 1 "
        "WHEN 8 THEN -1 WHEN 16 THEN -1 WHEN 32 THEN -1 "
        "ELSE 0 END AS nc "
        "FROM fd f WHERE f.d8 <> 0), "
        "en AS MATERIALIZED (SELECT e.r, e.c, e.nr, e.nc FROM e "
        "JOIN fd t ON t.row = e.nr AND t.col = e.nc), "
        "reach(sr, sc, r, c) AS ("
        "SELECT en.r, en.c, en.nr, en.nc FROM en "
        "UNION "
        "SELECT reach.sr, reach.sc, en.nr, en.nc FROM reach "
        "JOIN en ON en.r = reach.r AND en.c = reach.c), "
        "anc AS (SELECT r, c, COUNT(*) AS n FROM reach GROUP BY r, c), "
        "acc AS (SELECT f.row, f.col, "
        "CAST(1 + COALESCE(anc.n, 0) AS BIGINT) AS acc "
        "FROM fd f LEFT JOIN anc ON anc.r = f.row AND anc.c = f.col), "
        f"g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
        "SELECT e.row AS row, e.col AS col, "
        "n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
        "n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
        "FROM g e "
        "JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
        "JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
        "JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
        "JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
        "JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
        "JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
        "JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
        "JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1), "
        "s AS (SELECT row, col, 100.0 * SQRT(p * p + q * q) AS slope_pct "
        "FROM (SELECT row, col, "
        "((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * 0.01) AS p, "
        "((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * 0.01) AS q "
        "FROM w WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
        "AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
        "AND zg > -1e30 AND zh > -1e30 AND zi > -1e30)) "
        "SELECT s.row, s.col, "
        "ROUND(LN((CAST(acc.acc AS DOUBLE) * 0.01) "
        "/ (s.slope_pct / 100.0)), 6) AS twi "
        "FROM s JOIN acc ON acc.row = s.row AND acc.col = s.col "
        "WHERE s.slope_pct > 0"
    )
    out["join_counts"] = (
        # exact integer black rule (9216*n > total) and pair counts;
        # mirrors _q_join_counts' dense shifts via the two
        # one-directional adjacency joins
        "WITH e AS (SELECT (event_id % 96) AS gx, "
        "((event_id // 96) % 96) AS gy, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "lat AS (SELECT a.i AS gx, b.i AS gy FROM "
        "generate_series(0, 95) a(i) CROSS JOIN "
        "generate_series(0, 95) b(i)), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM e), "
        "x AS (SELECT lat.gx, lat.gy, "
        "CASE WHEN CAST(COALESCE(e.n, 0) AS BIGINT) * 9216 > t.tot "
        "THEN 1 ELSE 0 END AS b "
        "FROM lat LEFT JOIN e ON lat.gx = e.gx AND lat.gy = e.gy "
        "CROSS JOIN t), "
        "p AS (SELECT a.b AS b1, c.b AS b2 FROM x a "
        "JOIN x c ON c.gy = a.gy AND c.gx = a.gx + 1 "
        "UNION ALL SELECT a.b, c.b FROM x a "
        "JOIN x c ON c.gx = a.gx AND c.gy = a.gy + 1) "
        "SELECT (SELECT CAST(SUM(b) AS BIGINT) FROM x) AS n_black, "
        "CAST(SUM(CASE WHEN b1 = 1 AND b2 = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS bb, "
        "CAST(SUM(CASE WHEN b1 <> b2 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS bw, "
        "CAST(SUM(CASE WHEN b1 = 0 AND b2 = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS ww FROM p"
    )
    out["polygon_iou"] = (
        # cell-center IoU of q0/q1 via the strict half-plane tests --
        # mirrors _q_polygon_iou
        f"WITH g AS ({_OG_GRID_SQL}), "
        f"m AS (SELECT CASE WHEN {_halfplane_sql(OG_POLYGONS['q0'])} "
        "THEN 1 ELSE 0 END AS a, "
        f"CASE WHEN {_halfplane_sql(OG_POLYGONS['q1'])} "
        "THEN 1 ELSE 0 END AS b FROM g) "
        "SELECT CAST(SUM(a) AS BIGINT) AS n_a, "
        "CAST(SUM(b) AS BIGINT) AS n_b, "
        "CAST(SUM(a * b) AS BIGINT) AS inter, "
        "ROUND(CAST(SUM(a * b) AS DOUBLE) "
        "/ CAST(SUM(a) + SUM(b) - SUM(a * b) AS DOUBLE), 6) AS iou "
        "FROM m"
    )
    out["raster_kappa"] = (
        # Cohen's kappa of the two bands' k>250 masks; exact confusion
        # counts -- mirrors _q_raster_kappa
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS x, "
        "CASE WHEN d.k > 250 THEN 1 ELSE 0 END AS y FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "c AS (SELECT "
        "CAST(SUM(x * y) AS BIGINT) AS n11, "
        "CAST(SUM(x * (1 - y)) AS BIGINT) AS n10, "
        "CAST(SUM((1 - x) * y) AS BIGINT) AS n01, "
        "CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS n00 FROM j), "
        "f AS (SELECT n11, n10, n01, n00, "
        "n11 + n10 + n01 + n00 AS n, "
        "CAST(n11 + n00 AS DOUBLE) "
        "/ CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po, "
        "CAST((n11 + n10) * (n11 + n01) "
        "+ (n01 + n00) * (n10 + n00) AS DOUBLE) "
        "/ (CAST(n11 + n10 + n01 + n00 AS DOUBLE) "
        "* CAST(n11 + n10 + n01 + n00 AS DOUBLE)) AS pe FROM c) "
        "SELECT n11, n10, n01, n00, "
        "ROUND((po - pe) / (1.0 - pe), 6) AS kappa FROM f"
    )
    out["calibration_bins"] = (
        # decile reliability bins of band 2's deci score vs band 1's
        # k>250 mask; exact integer bin sums -- mirrors
        # _q_calibration_bins
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT d.k // 50 AS bin, d.k AS score, "
        "CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS lab FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col) "
        "SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(CAST(SUM(score) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS mean_score_deci, "
        "ROUND(CAST(SUM(lab) AS DOUBLE) "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS frac_pos "
        "FROM j GROUP BY bin ORDER BY bin"
    )
    out["mcnemar_test"] = (
        # McNemar discordant-pair chi2 (+ Edwards continuity) of the
        # two bands' k>250 masks -- mirrors _q_mcnemar_test
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS x, "
        "CASE WHEN d.k > 250 THEN 1 ELSE 0 END AS y FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x * (1 - y)) AS BIGINT) AS b, "
        "CAST(SUM((1 - x) * y) AS BIGINT) AS c FROM j) "
        "SELECT n AS n_pairs, b AS b_only1, c AS c_only2, "
        "ROUND(CAST((b - c) * (b - c) AS DOUBLE) "
        "/ CAST(b + c AS DOUBLE), 6) AS chi2, "
        "ROUND(CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS DOUBLE) "
        "/ CAST(b + c AS DOUBLE), 6) AS chi2_cc FROM c"
    )
    out["roc_auc"] = (
        # Mann-Whitney AUC with doubled tie-averaged ranks over the
        # bounded score domain -- mirrors _q_roc_auc
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT d.k AS score, "
        "CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS lab FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "c AS (SELECT score, CAST(SUM(lab) AS BIGINT) AS pos, "
        "CAST(COUNT(*) AS BIGINT) AS tot FROM j GROUP BY score), "
        "w AS (SELECT score, pos, tot, "
        "CAST(SUM(tot) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) "
        "- tot AS BIGINT) AS cum_lt FROM c), "
        "m AS (SELECT CAST(SUM((2 * cum_lt + tot + 1) * pos) AS BIGINT) "
        "AS r2p, CAST(SUM(pos) AS BIGINT) AS n1, "
        "CAST(SUM(tot) AS BIGINT) AS nt FROM w) "
        "SELECT n1 AS n_pos, nt - n1 AS n_neg, "
        "ROUND(CAST(r2p - n1 * (n1 + 1) AS DOUBLE) "
        "/ CAST(2 * n1 * (nt - n1) AS DOUBLE), 6) AS auc FROM m"
    )
    out["average_precision"] = (
        # step AP with distinct-score tie groups, 1e12-quantized
        # precision terms -- mirrors _q_average_precision
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT d.k AS score, "
        "CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS lab FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "c AS (SELECT score, CAST(SUM(lab) AS BIGINT) AS pos, "
        "CAST(COUNT(*) AS BIGINT) AS tot FROM j GROUP BY score), "
        "w AS (SELECT score, pos, tot, "
        "CAST(SUM(pos) OVER (ORDER BY score DESC "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp, "
        "CAST(SUM(tot) OVER (ORDER BY score DESC "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct FROM c), "
        "t AS (SELECT CAST(SUM(CAST(ROUND(CAST(cp AS DOUBLE) "
        "/ CAST(ct AS DOUBLE) * 1e12, 0) AS BIGINT) * pos) AS BIGINT) "
        "AS s, CAST(SUM(pos) AS BIGINT) AS n1 FROM w) "
        "SELECT n1 AS n_pos, "
        "ROUND(CAST(s AS DOUBLE) / 1e12 / CAST(n1 AS DOUBLE), 6) "
        "AS average_precision FROM t"
    )
    out["lift_at_decile"] = (
        # positive rate above the exact P90 score vs base rate --
        # mirrors _q_lift_at_decile
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT d.k AS score, "
        "CASE WHEN a.k > 250 THEN 1 ELSE 0 END AS lab FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "q AS (SELECT quantile_disc(score, 0.9) AS th FROM j), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(lab) AS BIGINT) AS n1 FROM j), "
        "tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_top, "
        "CAST(SUM(lab) AS BIGINT) AS p_top FROM j, q "
        "WHERE j.score > q.th) "
        "SELECT q.th AS threshold_score, tp.n_top, "
        "tp.p_top AS pos_top, "
        "ROUND((CAST(tp.p_top AS DOUBLE) / CAST(tp.n_top AS DOUBLE)) "
        "/ (CAST(t.n1 AS DOUBLE) / CAST(t.n AS DOUBLE)), 6) AS lift "
        "FROM q, t, tp"
    )
    out["lbp_histogram"] = (
        # 8-bit local binary pattern codes over fully-valid 3x3
        # windows, clockwise from top-left; integer counts -- mirrors
        # _q_lbp_histogram
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
        "SELECT e.z AS ze, "
        "n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, "
        "n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
        "FROM g e "
        "JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
        "JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
        "JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
        "JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
        "JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
        "JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
        "JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
        "JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1 "
        "WHERE e.z > -1e30 AND n1.z > -1e30 AND n2.z > -1e30 "
        "AND n3.z > -1e30 AND n4.z > -1e30 AND n6.z > -1e30 "
        "AND n7.z > -1e30 AND n8.z > -1e30 AND n9.z > -1e30), "
        "c AS (SELECT "
        "CAST(CASE WHEN za > ze THEN 1 ELSE 0 END "
        "+ CASE WHEN zb > ze THEN 2 ELSE 0 END "
        "+ CASE WHEN zc > ze THEN 4 ELSE 0 END "
        "+ CASE WHEN zf > ze THEN 8 ELSE 0 END "
        "+ CASE WHEN zi > ze THEN 16 ELSE 0 END "
        "+ CASE WHEN zh > ze THEN 32 ELSE 0 END "
        "+ CASE WHEN zg > ze THEN 64 ELSE 0 END "
        "+ CASE WHEN zd > ze THEN 128 ELSE 0 END AS BIGINT) AS code "
        "FROM w) "
        "SELECT code, CAST(COUNT(*) AS BIGINT) AS n FROM c "
        "GROUP BY code ORDER BY code"
    )
    out["glcm_texture"] = (
        # horizontal-offset-1 GLCM contrast/homogeneity/energy from
        # exact integer co-occurrence counts, homogeneity terms
        # 1e9-quantized -- mirrors _q_glcm_texture
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "q AS (SELECT row, col, "
        "(CAST(ROUND(z * 10, 0) AS BIGINT) * 8) // 500 AS k "
        "FROM g WHERE z > -1e30), "
        "p AS (SELECT a.k AS li, b.k AS lj FROM q a "
        "JOIN q b ON b.row = a.row AND b.col = a.col + 1), "
        "c AS (SELECT li, lj, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM p GROUP BY li, lj), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot, "
        "CAST(SUM(n * (li - lj) * (li - lj)) AS BIGINT) AS csum, "
        "CAST(SUM(CAST(ROUND(CAST(n AS DOUBLE) "
        "/ (1.0 + CAST((li - lj) * (li - lj) AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS hsum, "
        "CAST(SUM(n * n) AS BIGINT) AS esum FROM c) "
        "SELECT ntot AS n_pairs, "
        "ROUND(CAST(csum AS DOUBLE) / CAST(ntot AS DOUBLE), 6) "
        "AS contrast, "
        "ROUND(CAST(hsum AS DOUBLE) / 1e9 / CAST(ntot AS DOUBLE), 6) "
        "AS homogeneity, "
        "ROUND(CAST(esum AS DOUBLE) "
        "/ (CAST(ntot AS DOUBLE) * CAST(ntot AS DOUBLE)), 6) "
        "AS energy FROM t"
    )
    out["binseg_changepoint"] = (
        # split minimizing quantized SSE_left + SSE_right over the
        # dense day series; integer argmin, lowest-day ties -- mirrors
        # _q_binseg_changepoint
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "pf AS (SELECT t, CAST(SUM(x) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c, "
        "CAST(SUM(x * x) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2 FROM dn), "
        "tt AS (SELECT MAX(c) AS s_tot, MAX(c2) AS q_tot, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM pf), "
        "sp AS (SELECT pf.t + 1 AS t, pf.c AS sl, pf.c2 AS ql "
        "FROM pf, tt WHERE pf.t + 1 <= tt.n - 1), "
        "cost AS (SELECT sp.t, CAST(ROUND((("
        "CAST(sp.ql AS DOUBLE) - CAST(sp.sl AS DOUBLE) "
        "* CAST(sp.sl AS DOUBLE) / CAST(sp.t AS DOUBLE)) "
        "+ (CAST(tt.q_tot - sp.ql AS DOUBLE) "
        "- CAST(tt.s_tot - sp.sl AS DOUBLE) "
        "* CAST(tt.s_tot - sp.sl AS DOUBLE) "
        "/ CAST(tt.n - sp.t AS DOUBLE))) * 1e6, 0) AS BIGINT) AS cq "
        "FROM sp, tt) "
        "SELECT cost.t AS split_day_offset, cost.cq AS cost_q, "
        "ROUND(CAST(tt.q_tot AS DOUBLE) - CAST(tt.s_tot AS DOUBLE) "
        "* CAST(tt.s_tot AS DOUBLE) / CAST(tt.n AS DOUBLE), 6) "
        "AS full_sse "
        "FROM cost, tt ORDER BY cost.cq, cost.t LIMIT 1"
    )
    out["qq_slope"] = (
        # exact decile order statistics of both cents columns + the
        # through-origin OLS slope -- mirrors _q_qq_slope
        "WITH pts AS ("
        + " UNION ALL ".join(
            f"SELECT CAST({q!r} AS DOUBLE) AS q, "
            f"(SELECT quantile_disc("
            f"CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), {q!r}) "
            f"FROM lineitem) AS a, "
            f"(SELECT quantile_disc("
            f"CAST(ROUND(p_retailprice * 100, 0) AS BIGINT), {q!r}) "
            f"FROM part) AS b"
            for q in [i / 10.0 for i in range(1, 10)]
        )
        + "), m AS (SELECT CAST(SUM(a * b) AS BIGINT) AS sxy, "
        "CAST(SUM(b * b) AS BIGINT) AS sxx FROM pts) "
        "SELECT pts.q, pts.a AS lineitem_cents, pts.b AS part_cents, "
        "ROUND(CAST(m.sxy AS DOUBLE) / CAST(m.sxx AS DOUBLE), 6) "
        "AS qq_slope FROM pts, m"
    )
    out["raster_entropy"] = (
        # per-value 1e12-quantized n*ln(n/N) terms -- mirrors
        # _q_raster_entropy
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT CAST(ROUND(z * 10, 0) AS BIGINT) AS vq "
        "FROM g WHERE z > -1e30), "
        "c AS (SELECT vq, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM v GROUP BY vq), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, "
        "CAST(COUNT(*) AS BIGINT) AS nd FROM c), "
        "q AS (SELECT CAST(ROUND(CAST(n AS DOUBLE) "
        "* LN(CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) AS tq FROM c, t) "
        "SELECT t.tot AS n_cells, t.nd AS n_distinct, "
        "ROUND(-CAST(SUM(tq) AS DOUBLE) / 1e12 / CAST(t.tot AS DOUBLE), "
        "6) AS entropy_nats FROM q, t GROUP BY t.tot, t.nd"
    )
    out["markov_top1_accuracy"] = (
        # modal-next-event hit rate; integer counts -- mirrors
        # _q_markov_top1_accuracy
        "WITH s AS (SELECT user_id, event_type, "
        "LEAD(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS nxt FROM events), "
        "tr AS (SELECT event_type AS src, nxt AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM s "
        "WHERE nxt IS NOT NULL GROUP BY 1, 2), "
        "rt AS (SELECT src, CAST(MAX(n) AS BIGINT) AS best "
        "FROM tr GROUP BY src) "
        "SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM tr) "
        "AS n_transitions, "
        "CAST(SUM(best) AS BIGINT) AS n_hits, "
        "ROUND(CAST(SUM(best) AS DOUBLE) "
        "/ (SELECT CAST(SUM(n) AS DOUBLE) FROM tr), 6) "
        "AS top1_accuracy FROM rt"
    )
    out["intrinsic_dim"] = (
        # TwoNN: order-statistic 1st/2nd squared NN distances over
        # 1e4-tick integer vectors (list_inner_product is exact here:
        # every term < 2^53); log-ratio terms quantized at 1e12 --
        # mirrors _q_intrinsic_dim
        "WITH q AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e4, 0) AS BIGINT)) AS vq "
        "FROM embeddings), "
        "v2 AS (SELECT vec_id, vq, list_inner_product(vq, vq) AS s2 "
        "FROM q), "
        "p AS (SELECT a.vec_id AS i, "
        "a.s2 + b.s2 - 2 * list_inner_product(a.vq, b.vq) AS d2, "
        "b.vec_id AS j, "
        "ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY "
        "a.s2 + b.s2 - 2 * list_inner_product(a.vq, b.vq), b.vec_id) "
        "AS rn FROM v2 a JOIN v2 b ON b.vec_id <> a.vec_id), "
        "nn AS (SELECT i, "
        "MAX(CASE WHEN rn = 1 THEN d2 END) AS d1, "
        "MAX(CASE WHEN rn = 2 THEN d2 END) AS d2nd "
        "FROM p WHERE rn <= 2 GROUP BY i), "
        "tq AS (SELECT CAST(ROUND(LN(CAST(d2nd AS DOUBLE) "
        "/ CAST(d1 AS DOUBLE)) * 1e12, 0) AS BIGINT) AS t "
        "FROM nn WHERE d1 > 0) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_points, "
        "ROUND(2.0 * CAST(COUNT(*) AS DOUBLE) "
        "/ (CAST(SUM(t) AS DOUBLE) / 1e12), 6) AS intrinsic_dim "
        "FROM tq"
    )
    out["promo_revenue_share"] = (
        # Q14-shaped monthly promo share; cents exact -- mirrors
        # _q_promo_revenue_share (month_idx = year*12 + month - 1)
        "WITH j AS (SELECT l.l_shipdate, "
        "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0) "
        "AS BIGINT) AS cents, p.p_type FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey), "
        "m AS (SELECT CAST(DATE_PART('year', l_shipdate) * 12 "
        "+ DATE_PART('month', l_shipdate) - 1 AS BIGINT) AS month_idx, "
        "CAST(SUM(cents) AS BIGINT) AS rev, "
        "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) "
        "AS BIGINT) AS pr FROM j GROUP BY 1) "
        "SELECT month_idx, rev AS revenue_cents, "
        "ROUND(100.0 * CAST(pr AS DOUBLE) / CAST(rev AS DOUBLE), 6) "
        "AS promo_share_pct FROM m"
    )
    out["ship_delay_histogram"] = (
        # per-priority ship-latency day buckets; pure counts --
        # mirrors _q_ship_delay_histogram
        "WITH j AS (SELECT "
        "epoch_us(l.l_shipdate) // 86400000000 "
        "- epoch_us(o.o_orderdate) // 86400000000 AS delay, "
        "o.o_orderpriority AS priority FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey) "
        "SELECT priority, "
        "CAST(CASE WHEN delay <= 7 THEN 0 WHEN delay <= 30 THEN 1 "
        "WHEN delay <= 90 THEN 2 ELSE 3 END AS BIGINT) AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY 1, 2"
    )
    out["rusle_ls"] = (
        # Moore-Burch LS factor over the same acc/slope composition as
        # twi -- mirrors _q_rusle_ls
        f"WITH RECURSIVE fd AS ({out['flow_direction']}), "
        "e AS MATERIALIZED (SELECT f.row AS r, f.col AS c, "
        "f.row + CASE f.d8 WHEN 2 THEN 1 WHEN 4 THEN 1 WHEN 8 THEN 1 "
        "WHEN 32 THEN -1 WHEN 64 THEN -1 WHEN 128 THEN -1 "
        "ELSE 0 END AS nr, "
        "f.col + CASE f.d8 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 128 THEN 1 "
        "WHEN 8 THEN -1 WHEN 16 THEN -1 WHEN 32 THEN -1 "
        "ELSE 0 END AS nc "
        "FROM fd f WHERE f.d8 <> 0), "
        "en AS MATERIALIZED (SELECT e.r, e.c, e.nr, e.nc FROM e "
        "JOIN fd t ON t.row = e.nr AND t.col = e.nc), "
        "reach(sr, sc, r, c) AS ("
        "SELECT en.r, en.c, en.nr, en.nc FROM en "
        "UNION "
        "SELECT reach.sr, reach.sc, en.nr, en.nc FROM reach "
        "JOIN en ON en.r = reach.r AND en.c = reach.c), "
        "anc AS (SELECT r, c, COUNT(*) AS n FROM reach GROUP BY r, c), "
        "acc AS (SELECT f.row, f.col, "
        "CAST(1 + COALESCE(anc.n, 0) AS BIGINT) AS acc "
        "FROM fd f LEFT JOIN anc ON anc.r = f.row AND anc.c = f.col), "
        f"g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
        "SELECT e.row AS row, e.col AS col, "
        "n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
        "n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
        "FROM g e "
        "JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
        "JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
        "JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
        "JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
        "JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
        "JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
        "JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
        "JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1), "
        "s AS (SELECT row, col, 100.0 * SQRT(p * p + q * q) AS slope_pct "
        "FROM (SELECT row, col, "
        "((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * 0.01) AS p, "
        "((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * 0.01) AS q "
        "FROM w WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
        "AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
        "AND zg > -1e30 AND zh > -1e30 AND zi > -1e30)) "
        "SELECT s.row, s.col, "
        "ROUND(POW(CAST(acc.acc AS DOUBLE) * 0.01 / 22.13, 0.4) "
        "* POW(SIN(ATAN(s.slope_pct / 100.0)) / 0.0896, 1.3), 6) AS ls "
        "FROM s JOIN acc ON acc.row = s.row AND acc.col = s.col "
        "WHERE s.slope_pct > 0"
    )
    out["rich_club"] = (
        # phi(k) over the edit-1 graph; exact counts -- mirrors
        # _q_rich_club
        "WITH v AS (SELECT DISTINCT source AS token FROM documents "
        "WHERE LEN(source) >= 4), "
        "e AS (SELECT a.token AS w1, b.token AS w2 FROM v a JOIN v b "
        "ON a.token < b.token "
        "AND ABS(LEN(a.token) - LEN(b.token)) <= 1 "
        "AND LEVENSHTEIN(a.token, b.token) = 1), "
        "d AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS deg FROM ("
        "SELECT w1 AS token FROM e UNION ALL SELECT w2 FROM e) "
        "GROUP BY token), "
        "q AS (SELECT k.k AS k, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM d WHERE deg > k.k) AS nk, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM e "
        "JOIN d da ON da.token = e.w1 JOIN d db ON db.token = e.w2 "
        "WHERE da.deg > k.k AND db.deg > k.k) AS ek "
        "FROM (VALUES (2), (4), (8)) k(k)) "
        "SELECT CAST(k AS BIGINT) AS k, nk AS n_nodes, ek AS n_edges, "
        "CASE WHEN nk < 2 THEN CAST('nan' AS DOUBLE) "
        "ELSE ROUND(2.0 * CAST(ek AS DOUBLE) "
        "/ (CAST(nk AS DOUBLE) * CAST(nk - 1 AS DOUBLE)), 6) END AS phi "
        "FROM q"
    )
    out["dasymetric_alloc"] = " UNION ALL ".join(
        f"SELECT '{pid}' AS polygon_id, pix, ROUND("
        f"(SELECT CAST(COUNT(*) AS DOUBLE) FROM "
        f"(SELECT 77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
        f"28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
        f"FROM events) e WHERE {_halfplane_sql(poly)}) "
        f"* CAST(CAST(ROUND(z * 10, 0) AS BIGINT) AS DOUBLE) "
        f"/ (SELECT CAST(SUM(CAST(ROUND(z * 10, 0) AS BIGINT)) AS DOUBLE) "
        f"FROM ({valid}) WHERE {_halfplane_sql(poly)}), 6) AS alloc "
        f"FROM ({valid}) WHERE {_halfplane_sql(poly)}"
        for pid, poly in OG_POLYGONS.items()
        if pid != "q_out"
    )
    out["location_quotient"] = (
        # per-block purchase concentration vs the global share --
        # mirrors _q_location_quotient
        "WITH b AS (SELECT ((event_id % 96) // 8) AS bx, "
        "(((event_id // 96) % 96) // 8) AS by, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS np FROM events GROUP BY 1, 2), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, "
        "CAST(SUM(np) AS BIGINT) AS tp FROM b) "
        "SELECT bx, by, n AS n_events, np AS n_purchases, "
        "ROUND((CAST(np AS DOUBLE) / CAST(n AS DOUBLE)) "
        "/ (CAST(t.tp AS DOUBLE) / CAST(t.tn AS DOUBLE)), 6) AS lq "
        "FROM b, t"
    )
    out["degree_assortativity"] = (
        # Newman r over both edge orientations; exact int64 moments
        # -- mirrors _q_degree_assortativity on the edit1_pairs graph
        "WITH v AS (SELECT DISTINCT source AS token FROM documents "
        "WHERE LEN(source) >= 4), "
        "e AS (SELECT a.token AS w1, b.token AS w2 FROM v a JOIN v b "
        "ON a.token < b.token "
        "AND ABS(LEN(a.token) - LEN(b.token)) <= 1 "
        "AND LEVENSHTEIN(a.token, b.token) = 1), "
        "d AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS deg FROM ("
        "SELECT w1 AS token FROM e UNION ALL SELECT w2 FROM e) "
        "GROUP BY token), "
        "p AS (SELECT da.deg AS x, db.deg AS y FROM e "
        "JOIN d da ON da.token = e.w1 JOIN d db ON db.token = e.w2 "
        "UNION ALL SELECT db.deg, da.deg FROM e "
        "JOIN d da ON da.token = e.w1 JOIN d db ON db.token = e.w2), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS BIGINT) AS sxx, "
        "CAST(SUM(y * y) AS BIGINT) AS syy, "
        "CAST(SUM(x * y) AS BIGINT) AS sxy FROM p) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_nodes, "
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) "
        "* SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) "
        "AS assortativity FROM m"
    )
    out["word_burstiness"] = (
        # df vs Poisson-expected df for the top-20 tf tokens --
        # mirrors _q_word_burstiness
        "WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents), "
        "tk AS (SELECT doc_id, "
        "UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
        "FROM documents), "
        "t2 AS (SELECT doc_id, token FROM tk WHERE token <> ''), "
        "m AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf, "
        "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df "
        "FROM t2 GROUP BY token) "
        "SELECT token, tf, df, "
        "ROUND(CAST(df AS DOUBLE) / (CAST(nd.n AS DOUBLE) "
        "* (1.0 - EXP(-CAST(tf AS DOUBLE) / CAST(nd.n AS DOUBLE)))), 6) "
        "AS burstiness FROM m, nd "
        "ORDER BY tf DESC, token LIMIT 20"
    )
    out["emerging_hotspots"] = (
        # per-bin Gi* on the 24x24 lattice + Mann-Kendall sign trend
        # over the three rounded z values -- mirrors
        # _q_emerging_hotspots
        "WITH e AS (SELECT ((event_id % 96) // 4) AS gx, "
        "(((event_id // 96) % 96) // 4) AS gy, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "md AS (SELECT MIN(day) AS md FROM e), "
        "c AS (SELECT (day - md.md) // 10 AS bin, gx, gy, "
        "COUNT(*) AS n FROM e, md GROUP BY 1, 2, 3), "
        "lat AS (SELECT t.b AS bin, a.i AS gx, b.i AS gy "
        "FROM generate_series(0, 23) a(i) "
        "CROSS JOIN generate_series(0, 23) b(i) "
        "CROSS JOIN (VALUES (0), (1), (2)) t(b)), "
        "x AS (SELECT lat.bin, lat.gx, lat.gy, "
        "CAST(COALESCE(c.n, 0) AS DOUBLE) AS v FROM lat "
        "LEFT JOIN c ON c.bin = lat.bin AND c.gx = lat.gx "
        "AND c.gy = lat.gy), "
        "s AS (SELECT bin, CAST(COUNT(*) AS DOUBLE) AS nn, "
        "SUM(v) / COUNT(*) AS mu, "
        "SQRT(SUM(v * v) / COUNT(*) - "
        "(SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*))) AS sd "
        "FROM x GROUP BY bin), "
        "w AS (SELECT a.bin, a.gx, a.gy, SUM(b.v) AS win, "
        "CAST(COUNT(*) AS DOUBLE) AS cnt FROM x a JOIN x b "
        "ON b.bin = a.bin AND abs(a.gx - b.gx) <= 1 "
        "AND abs(a.gy - b.gy) <= 1 GROUP BY 1, 2, 3), "
        "z AS (SELECT w.bin, w.gx, w.gy, "
        "ROUND((win - s.mu * cnt) / (s.sd * SQRT((s.nn * cnt "
        "- cnt * cnt) / (s.nn - 1))), 6) AS z "
        "FROM w JOIN s ON s.bin = w.bin), "
        "p AS (SELECT gx, gy, "
        "MAX(CASE WHEN bin = 0 THEN z END) AS z0, "
        "MAX(CASE WHEN bin = 1 THEN z END) AS z1, "
        "MAX(CASE WHEN bin = 2 THEN z END) AS z2 "
        "FROM z GROUP BY gx, gy) "
        "SELECT gx, gy, z0 AS z_bin0, z1 AS z_bin1, z2 AS z_bin2, "
        "CAST(SIGN(z1 - z0) + SIGN(z2 - z0) + SIGN(z2 - z1) "
        "AS BIGINT) AS mk_s FROM p"
    )
    out["dickey_fuller"] = (
        # unit-root regression on the dense daily series; exact int
        # moments, pinned float t-stat chain -- mirrors
        # _q_dickey_fuller
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "p AS (SELECT a.x AS xlag, b.x - a.x AS dx FROM dn a "
        "JOIN dn b ON b.t = a.t + 1), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(xlag) AS BIGINT) AS sx, "
        "CAST(SUM(dx) AS BIGINT) AS sd, "
        "CAST(SUM(xlag * xlag) AS BIGINT) AS sxx, "
        "CAST(SUM(xlag * dx) AS BIGINT) AS sxd, "
        "CAST(SUM(dx * dx) AS BIGINT) AS sdd FROM p), "
        "bb AS (SELECT n, sx, sd, sxd, sdd, sxx, "
        "CAST(n * sxd - sx * sd AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE) AS b FROM m), "
        "aa AS (SELECT n, sx, sd, sxd, sdd, sxx, b, "
        "(CAST(sd AS DOUBLE) - b * CAST(sx AS DOUBLE)) "
        "/ CAST(n AS DOUBLE) AS a FROM bb), "
        "s AS (SELECT n, sxx, sx, b, "
        "CAST(sdd AS DOUBLE) - a * CAST(sd AS DOUBLE) "
        "- b * CAST(sxd AS DOUBLE) AS sse FROM aa) "
        "SELECT n AS n_obs, ROUND(b, 6) AS beta, "
        "ROUND(b / SQRT(sse / CAST(n - 2 AS DOUBLE) "
        "/ (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) "
        "* CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS t_stat "
        "FROM s"
    )
    out["simplified_silhouette"] = (
        # centroid-silhouette in exact integer quadratics (1e4-tick
        # values, n^2*|v|^2 - 2n*(v.c) + |c|^2), per-point s quantized
        # at 1e9 -- mirrors _q_simplified_silhouette
        "WITH ev AS (SELECT vec_id, label, "
        "generate_subscripts(embedding, 1) AS dim, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e4, 0) "
        "AS BIGINT) AS vq FROM embeddings), "
        "nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM embeddings GROUP BY label), "
        "cd AS (SELECT label, dim, CAST(SUM(vq) AS BIGINT) AS c "
        "FROM ev GROUP BY label, dim), "
        "v2 AS (SELECT vec_id, label, "
        "CAST(SUM(vq * vq) AS BIGINT) AS v2 "
        "FROM ev GROUP BY vec_id, label), "
        "vc AS (SELECT ev.vec_id, cd.label AS clabel, "
        "CAST(SUM(ev.vq * cd.c) AS BIGINT) AS vc "
        "FROM ev JOIN cd ON cd.dim = ev.dim GROUP BY ev.vec_id, cd.label), "
        "c2 AS (SELECT label, CAST(SUM(c * c) AS BIGINT) AS c2 "
        "FROM cd GROUP BY label), "
        "dist AS (SELECT v2.vec_id, v2.label AS plabel, "
        "vc.clabel, "
        "SQRT(CAST(nl.n * nl.n * v2.v2 - 2 * nl.n * vc.vc + c2.c2 "
        "AS DOUBLE)) / (CAST(nl.n AS DOUBLE) * 1e4) AS d "
        "FROM v2 JOIN vc ON vc.vec_id = v2.vec_id "
        "JOIN nl ON nl.label = vc.clabel "
        "JOIN c2 ON c2.label = vc.clabel), "
        "ab AS (SELECT vec_id, plabel, "
        "MAX(CASE WHEN clabel = plabel THEN d END) AS a, "
        "MIN(CASE WHEN clabel <> plabel THEN d END) AS b "
        "FROM dist GROUP BY vec_id, plabel), "
        "sq AS (SELECT plabel, CAST(ROUND((b - a) / GREATEST(a, b) "
        "* 1e9, 0) AS BIGINT) AS sq FROM ab) "
        "SELECT CAST(plabel AS BIGINT) AS label, "
        "CAST(COUNT(*) AS BIGINT) AS n_points, "
        "ROUND(CAST(SUM(sq) AS DOUBLE) / 1e9 "
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS mean_silhouette "
        "FROM sq GROUP BY plabel"
    )
    return out
