"""DuckDB oracle SQL, part 04 of 4.

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
    out["bh_fdr_perm"] = (
        # mirrors _q_bh_fdr (5 one-vs-rest mix32 permutation tests,
        # integer BH step-up 100*(1+e) <= 101*k)
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
        f"pl AS (SELECT tt.name, pp.p, CASE WHEN ({_bh_u}) % 5 = 0 "
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
        "km AS (SELECT COALESCE(MAX(rk), 0) AS kmax FROM pn "
        "WHERE 100 * p_num <= 101 * rk) "
        "SELECT pn.name AS event_type, pn.p_num, "
        "CAST(pn.rk AS BIGINT) AS p_rank, "
        "CAST(CASE WHEN pn.rk <= km.kmax THEN 1 ELSE 0 END AS BIGINT) "
        "AS reject FROM pn, km ORDER BY 1"
    )
    out["kemeny_ranking"] = (
        # mirrors _q_kemeny_ranking (daily count ballots, exact
        # pairwise-disagreement costs over all 120 permutations)
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "event_type AS t, CAST(COUNT(*) AS BIGINT) AS c FROM events "
        "GROUP BY 1, 2), "
        "dd AS (SELECT DISTINCT d FROM c0), "
        "tt AS (SELECT * FROM (VALUES ('click'), ('error'), "
        "('purchase'), ('signup'), ('view')) AS v(t)), "
        "dn AS (SELECT dd.d, tt.t, COALESCE(c0.c, 0) AS c FROM dd "
        "CROSS JOIN tt LEFT JOIN c0 ON c0.d = dd.d AND c0.t = tt.t), "
        "pref AS (SELECT a.t AS w, b.t AS l, "
        "CAST(SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n FROM dn a JOIN dn b ON b.d = a.d AND a.t <> b.t "
        "GROUP BY 1, 2), "
        f"pm AS (SELECT * FROM (VALUES {_pm_rows}) AS v(pid, pos, t)), "
        "cost AS (SELECT a.pid, CAST(SUM(pref.n) AS BIGINT) AS cost "
        "FROM pm a JOIN pm b ON b.pid = a.pid AND b.pos > a.pos "
        "JOIN pref ON pref.w = b.t AND pref.l = a.t GROUP BY 1), "
        "rs AS (SELECT pid, STRING_AGG(t, '>' ORDER BY pos) "
        "AS ranking FROM pm GROUP BY 1) "
        "SELECT rs.ranking, cost.cost AS kemeny_cost FROM cost "
        "JOIN rs ON rs.pid = cost.pid "
        "ORDER BY cost.cost, rs.ranking LIMIT 1"
    )
    out["ad_twosample"] = (
        # mirrors _q_ad_twosample (pooled (y, tag, eid) order, 1e6-
        # tick quantized Pettitt terms, pinned A2 chain)
        "WITH e AS (SELECT event_id AS eid, CASE WHEN event_type "
        "= 'click' THEN 0 ELSE 1 END AS tag, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events "
        "WHERE event_type IN ('click', 'error')), "
        "o AS (SELECT tag, ROW_NUMBER() OVER (ORDER BY y, tag, eid) "
        "AS k, SUM(CASE WHEN tag = 0 THEN 1 ELSE 0 END) OVER "
        "(ORDER BY y, tag, eid ROWS UNBOUNDED PRECEDING) AS mk "
        "FROM e), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all, "
        "CAST(SUM(CASE WHEN tag = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n0 FROM e), "
        "t1 AS (SELECT CAST(nn.n_all * o.mk - nn.n0 * o.k AS HUGEINT) "
        "AS dk, o.k AS k, nn.n_all AS na FROM o, nn "
        "WHERE o.k < nn.n_all), "
        "tq AS (SELECT CAST(SUM((dk * dk * 1000000) "
        "// (k * (na - k))) AS HUGEINT) AS adq FROM t1) "
        "SELECT nn.n0 AS n_click, nn.n_all - nn.n0 AS n_error, "
        "CAST(tq.adq AS BIGINT) AS ad_q, "
        "ROUND(CAST(tq.adq AS DOUBLE) / 1e6 / nn.n0 "
        "/ (nn.n_all - nn.n0), 6) AS a2 FROM nn, tq"
    )
    out["multi_pattern_counts"] = (
        # mirrors _q_multi_pattern_counts (substring occurrence and
        # containing-doc counts per fixed pattern)
        f"WITH pats AS (SELECT * FROM (VALUES {_mp_vals}) AS v(p)), "
        "cnt AS (SELECT pats.p, (LEN(d.text) "
        "- LEN(REPLACE(d.text, pats.p, ''))) // LEN(pats.p) AS c "
        "FROM documents d, pats) "
        "SELECT p AS pattern, CAST(SUM(c) AS BIGINT) AS n_occur, "
        "CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_docs FROM cnt GROUP BY 1 ORDER BY 1"
    )
    out["deming_fit"] = (
        # mirrors _q_deming_fit (HUGEINT centered moments, pinned
        # sqrt slope chain)
        "WITH e AS (SELECT epoch_us(ts) // 3600000000 % 24 AS x, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy, "
        "CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy FROM e), "
        "c AS (SELECT n, sx, sy, n * sxx - sx * sx AS cxx, "
        "n * syy - sy * sy AS cyy, n * sxy - sx * sy AS cxy FROM mo), "
        "s AS (SELECT n, sx, sy, (CAST(cyy - cxx AS DOUBLE) "
        "+ SQRT(CAST(cyy - cxx AS DOUBLE) * CAST(cyy - cxx AS DOUBLE) "
        "+ 4.0 * CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE))) "
        "/ (2.0 * CAST(cxy AS DOUBLE)) AS slope FROM c) "
        "SELECT CAST(n AS BIGINT) AS n, ROUND(slope, 6) AS slope, "
        "ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) "
        "/ CAST(n AS DOUBLE), 6) AS intercept FROM s"
    )
    out["bootstrap_ci_daily"] = (
        # mirrors _q_bootstrap_ci (mix32 resample indices, exact
        # replicate totals, integer-rank order statistics)
        "WITH " + _dense_daily +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        f"bb AS (SELECT r.range AS b FROM range(0, {_BOOT_REPS}) r), "
        "ii AS (SELECT t FROM dn), "
        f"pick AS (SELECT bb.b, ({_bt_u}) % nn.n AS idx "
        "FROM bb, ii, nn), "
        "reps AS (SELECT pick.b, CAST(SUM(dn.y) AS BIGINT) AS s "
        "FROM pick JOIN dn ON dn.t = pick.idx GROUP BY 1), "
        f"lo AS (SELECT s FROM reps ORDER BY s "
        f"LIMIT 1 OFFSET {(25 * (_BOOT_REPS - 1)) // 1000}), "
        f"hi AS (SELECT s FROM reps ORDER BY s "
        f"LIMIT 1 OFFSET {(975 * (_BOOT_REPS - 1)) // 1000}) "
        f"SELECT CAST({_BOOT_REPS} AS BIGINT) AS n_boot, "
        "nn.n AS n_days, lo.s AS lo_sum, hi.s AS hi_sum, "
        "ROUND(CAST(lo.s AS DOUBLE) / nn.n, 6) AS lo_mean, "
        "ROUND(CAST(hi.s AS DOUBLE) / nn.n, 6) AS hi_mean "
        "FROM nn, lo, hi"
    )
    out["luhn_check"] = (
        # mirrors _q_luhn_check (12-term leading-zero-safe digit
        # expansion, checksum % 10 validity)
        f"WITH e AS (SELECT event_type AS t, ({_luhn_terms}) % 10 "
        "AS chk FROM events) "
        "SELECT t AS event_type, CAST(SUM(CASE WHEN chk = 0 THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_valid, "
        "CAST(COUNT(*) AS BIGINT) AS n_total, "
        "ROUND(CAST(SUM(CASE WHEN chk = 0 THEN 1 ELSE 0 END) "
        "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS valid_rate "
        "FROM e GROUP BY 1 ORDER BY 1"
    )
    out["tukey_hsd"] = (
        # mirrors _q_tukey_hsd (1e3-tick within-SS, pinned pairwise
        # diff / q / Cohen's d chains)
        "WITH g AS (SELECT event_type AS t, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS s, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT) "
        "* CAST(ROUND(value * 100, 0) AS BIGINT)) AS HUGEINT) AS q "
        "FROM events GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(COUNT(*) AS BIGINT) AS k, "
        "CAST(SUM(q) AS HUGEINT) * 1000 "
        "- CAST(SUM((CAST(s AS HUGEINT) * s * 1000) // n) AS HUGEINT) "
        "AS ssw_q FROM g), "
        "m AS (SELECT CAST(ssw_q AS DOUBLE) / 1000.0 / (nn - k) "
        "AS mse FROM tot), "
        "pr AS (SELECT a.t AS t1, b.t AS t2, "
        "CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n "
        "AS diff, a.n AS na, b.n AS nb FROM g a "
        "JOIN g b ON a.t < b.t) "
        "SELECT t1, t2, ROUND(diff, 6) AS mean_diff, "
        "ROUND(diff / SQRT(m.mse / 2.0 * (1.0 / na + 1.0 / nb)), 6) "
        "AS q_stat, ROUND(diff / SQRT(m.mse), 6) AS cohen_d "
        "FROM pr, m ORDER BY 1, 2"
    )
    out["ohlc_daily"] = (
        # mirrors _q_ohlc_daily (first/last by (ts, event_id), exact
        # integer extremes, record flag on running max of totals)
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d, ts, "
        "event_id AS eid, CAST(ROUND(value * 100, 0) AS BIGINT) AS y "
        "FROM events), "
        "w AS (SELECT d, FIRST_VALUE(y) OVER "
        "(PARTITION BY d ORDER BY ts, eid ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND UNBOUNDED FOLLOWING) AS open, "
        "LAST_VALUE(y) OVER (PARTITION BY d ORDER BY ts, eid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS close, y FROM e), "
        "bars AS (SELECT d, MIN(open) AS open, "
        "CAST(MAX(y) AS BIGINT) AS high, CAST(MIN(y) AS BIGINT) "
        "AS low, MIN(close) AS close, CAST(SUM(y) AS BIGINT) "
        "AS total, CAST(COUNT(*) AS BIGINT) AS n_events FROM w "
        "GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS d0 FROM bars), "
        "rc AS (SELECT bars.*, MAX(total) OVER (ORDER BY d "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
        "FROM bars) "
        "SELECT CAST(rc.d - mm.d0 AS BIGINT) AS t, rc.open, rc.high, "
        "rc.low, rc.close, rc.total, rc.n_events, "
        "CAST(CASE WHEN rc.pm IS NULL OR rc.total > rc.pm THEN 1 "
        "ELSE 0 END AS BIGINT) AS is_record FROM rc, mm ORDER BY 1"
    )
    out["bloom_fpr"] = (
        # mirrors _q_bloom_fpr (3 mix32 hashes into 8192 bits,
        # absent-key probes, exact membership joins)
        "WITH keys AS (SELECT DISTINCT user_id AS u FROM events), "
        "bits AS (SELECT DISTINCT b FROM ("
        f"SELECT ({_bk[0]}) % {_BLOOM_BITS} AS b FROM keys "
        f"UNION ALL SELECT ({_bk[1]}) % {_BLOOM_BITS} FROM keys "
        f"UNION ALL SELECT ({_bk[2]}) % {_BLOOM_BITS} FROM keys)), "
        f"pr AS (SELECT r.range + 10000000 AS p "
        f"FROM range(0, {_BLOOM_PROBES}) r), "
        f"ph AS (SELECT p, ({_bp[0]}) % {_BLOOM_BITS} AS h0, "
        f"({_bp[1]}) % {_BLOOM_BITS} AS h1, "
        f"({_bp[2]}) % {_BLOOM_BITS} AS h2 FROM pr), "
        "fp AS (SELECT CAST(COUNT(*) AS BIGINT) AS nfp FROM ph "
        "WHERE EXISTS (SELECT 1 FROM bits WHERE bits.b = ph.h0) "
        "AND EXISTS (SELECT 1 FROM bits WHERE bits.b = ph.h1) "
        "AND EXISTS (SELECT 1 FROM bits WHERE bits.b = ph.h2)) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS n_keys, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set, "
        f"CAST({_BLOOM_PROBES} AS BIGINT) AS n_probes, fp.nfp AS n_fp, "
        f"ROUND(CAST(fp.nfp AS DOUBLE) / {_BLOOM_PROBES}, 6) AS fpr "
        "FROM fp"
    )
    out["str_packing"] = (
        # mirrors _q_str_packing (x-rank slices, y-rank leaves, exact
        # (rank*4)//n rule, ties by cell)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top64 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 64), "
        "nd AS (SELECT cell, cell % 96 AS x, cell // 96 AS y "
        "FROM top64), "
        "r1 AS (SELECT cell, x, y, "
        "ROW_NUMBER() OVER (ORDER BY x, cell) - 1 AS rn FROM nd), "
        "s1 AS (SELECT cell, x, y, "
        "(rn * 4) // (SELECT COUNT(*) FROM nd) AS s FROM r1), "
        "r2 AS (SELECT s, x, y, ROW_NUMBER() OVER (PARTITION BY s "
        "ORDER BY y, cell) - 1 AS rn2, "
        "COUNT(*) OVER (PARTITION BY s) AS m FROM s1), "
        "l2 AS (SELECT s, (rn2 * 4) // m AS le, x, y FROM r2) "
        "SELECT CAST(s AS BIGINT) AS slice_x, CAST(le AS BIGINT) "
        "AS leaf_y, CAST(MIN(x) AS BIGINT) AS min_x, "
        "CAST(MAX(x) AS BIGINT) AS max_x, CAST(MIN(y) AS BIGINT) "
        "AS min_y, CAST(MAX(y) AS BIGINT) AS max_y, "
        "CAST(COUNT(*) AS BIGINT) AS n_cells, "
        "CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) "
        "AS BIGINT) AS area FROM l2 GROUP BY 1, 2 ORDER BY 1, 2"
    )
    out["cvm_twosample"] = (
        # mirrors _q_cvm_twosample (pooled + within-sample ranks,
        # exact integer U, pinned T chain)
        "WITH e AS (SELECT event_id AS eid, CASE WHEN event_type "
        "= 'click' THEN 0 ELSE 1 END AS tag, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events "
        "WHERE event_type IN ('click', 'error')), "
        "o AS (SELECT tag, ROW_NUMBER() OVER (ORDER BY y, tag, eid) "
        "AS k, ROW_NUMBER() OVER (PARTITION BY tag "
        "ORDER BY y, tag, eid) AS i FROM e), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all, "
        "CAST(SUM(CASE WHEN tag = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n0 FROM e), "
        "ux AS (SELECT CAST(SUM((k - i) * (k - i)) AS BIGINT) AS sx "
        "FROM o WHERE tag = 0), "
        "uy AS (SELECT CAST(SUM((k - i) * (k - i)) AS BIGINT) AS sy "
        "FROM o WHERE tag = 1), "
        "uu AS (SELECT nn.n0 * ux.sx + (nn.n_all - nn.n0) * uy.sy "
        "AS u FROM nn, ux, uy) "
        "SELECT nn.n0 AS n_click, nn.n_all - nn.n0 AS n_error, "
        "uu.u AS u_stat, ROUND(CAST(uu.u AS DOUBLE) "
        "/ (nn.n0 * (nn.n_all - nn.n0) * nn.n_all) "
        "- CAST(4 * nn.n0 * (nn.n_all - nn.n0) - 1 AS DOUBLE) "
        "/ (6 * nn.n_all), 6) AS t_stat FROM nn, uu"
    )
    out["yules_k"] = (
        # mirrors _q_yules_k (token-frequency second moment)
        "WITH tk AS (SELECT UNNEST(regexp_split_to_array(text, "
        "'\\s+')) AS token FROM documents), "
        "fr AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tk "
        "WHERE token <> '' GROUP BY 1), "
        "ag AS (SELECT CAST(SUM(c) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS vocab, "
        "CAST(SUM(c * c) AS BIGINT) AS sc2 FROM fr) "
        "SELECT n AS n_tokens, vocab, sc2 AS sum_c2, "
        "ROUND(1e4 * (sc2 - n) / (CAST(n AS DOUBLE) "
        "* CAST(n AS DOUBLE)), 6) AS yules_k FROM ag"
    )
    out["juilland_d"] = (
        # mirrors _q_juilland_d (1e9-tick per-doc relative freqs over
        # ALL docs, pinned CV chain)
        f"WITH pats AS (SELECT * FROM (VALUES {_mp_vals}) AS v(p)), "
        "tk AS (SELECT doc_id, UNNEST(regexp_split_to_array(text, "
        "'\\s+')) AS token FROM documents), "
        "tk2 AS (SELECT * FROM tk WHERE token <> ''), "
        "dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len "
        "FROM tk2 GROUP BY 1), "
        "m AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tk2 GROUP BY 1, 2), "
        "pc0 AS (SELECT dl.doc_id, pats.p, dl.len, "
        "COALESCE(m.c, 0) AS c FROM dl CROSS JOIN pats "
        "LEFT JOIN m ON m.doc_id = dl.doc_id AND m.token = pats.p), "
        "rq AS (SELECT p, (c * 1000000000) // len AS q, c FROM pc0), "
        "ag AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sq2, "
        "CAST(SUM(q) AS BIGINT) AS s, "
        "CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS nw, CAST(SUM(c) AS BIGINT) AS tc FROM rq GROUP BY 1) "
        "SELECT p AS pattern, nw AS n_docs_with, tc AS total_count, "
        "ROUND(1.0 - SQRT(CAST(n * sq2 - CAST(s AS HUGEINT) * s "
        "AS DOUBLE)) / s / SQRT(CAST(n - 1 AS DOUBLE)), 6) "
        "AS juilland_d FROM ag ORDER BY 1"
    )
    out["mantel_test"] = (
        # mirrors _q_mantel_test (rank-of-mix32 label permutations,
        # exact integer cross-product statistic)
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top20 AS (SELECT cell, n FROM cc ORDER BY n DESC, cell "
        "LIMIT 20), "
        "nd AS MATERIALIZED (SELECT "
        "CAST(ROW_NUMBER() OVER (ORDER BY cell) - 1 AS BIGINT) AS idx, "
        "cell % 96 AS x, cell // 96 AS y, n FROM top20), "
        "xp AS (SELECT a.idx AS i, b.idx AS j, "
        "CAST(ABS(a.x - b.x) + ABS(a.y - b.y) AS BIGINT) AS x "
        "FROM nd a JOIN nd b ON a.idx < b.idx), "
        "yd AS (SELECT a.idx AS a, b.idx AS b, "
        "CAST(ABS(a.n - b.n) AS BIGINT) AS y FROM nd a, nd b), "
        "obs AS (SELECT CAST(SUM(xp.x * yd.y) AS BIGINT) AS z "
        "FROM xp JOIN yd ON yd.a = xp.i AND yd.b = xp.j), "
        f"pp AS (SELECT r.range AS p FROM range(0, {_MANTEL_PERMS}) "
        "r), "
        f"pm AS MATERIALIZED (SELECT pp.p, nd.idx, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY pp.p "
        f"ORDER BY ({_mt_u}), nd.idx) - 1 AS BIGINT) AS pos "
        "FROM pp, nd), "
        "zp AS (SELECT pm1.p, CAST(SUM(xp.x * yd.y) AS BIGINT) AS z "
        "FROM xp JOIN pm pm1 ON pm1.idx = xp.i "
        "JOIN pm pm2 ON pm2.p = pm1.p AND pm2.idx = xp.j "
        "JOIN yd ON yd.a = pm1.pos AND yd.b = pm2.pos GROUP BY 1), "
        "ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS e FROM zp, obs "
        "WHERE zp.z >= obs.z) "
        "SELECT obs.z AS z_obs, "
        f"CAST({_MANTEL_PERMS} AS BIGINT) AS n_perms, ex.e "
        "AS n_extreme, ROUND((1.0 + ex.e) "
        f"/ {_MANTEL_PERMS + 1}.0, 6) AS p_value FROM obs, ex"
    )
    out["ulcer_index"] = (
        # mirrors _q_ulcer_index (running-peak drawdown ticks)
        "WITH " + _dense_daily +
        "pk AS (SELECT t, y, MAX(y) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS peak FROM dn), "
        "dw AS (SELECT ((peak - y) * 1000000) // peak AS q FROM pk), "
        "ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(MAX(q) AS BIGINT) AS mq, "
        "CAST(SUM(q * q) AS BIGINT) AS sq FROM dw) "
        "SELECT n AS n_days, mq AS max_ddq, "
        "ROUND(SQRT(CAST(sq AS DOUBLE) / n) / 1e6, 6) AS ulcer "
        "FROM ag"
    )
    out["colley_rating"] = _colley_oracle_sql()
    out["heat_diffusion"] = (
        # mirrors _q_heat_diffusion (5 unrolled diffusion steps with
        # absorbing borders, all-nonnegative integer floor division)
        "WITH cc AS (SELECT event_id % 96 AS cx, "
        "event_id // 96 % 96 AS cy, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2), "
        "g0 AS (SELECT gx.range AS x, gy.range AS y, "
        "COALESCE(cc.n, 0) AS v FROM range(0, 96) gx "
        "CROSS JOIN range(0, 96) gy LEFT JOIN cc "
        "ON cc.cx = gx.range AND cc.cy = gy.range), "
        + ", ".join(_heat_steps_sql)
        + f" SELECT CAST(y * 96 + x AS BIGINT) AS cell, "
        f"CAST(v AS BIGINT) AS value FROM g{_HEAT_STEPS} "
        "ORDER BY v DESC, cell LIMIT 10"
    )
    out["markov_loglik"] = (
        # mirrors _q_markov_loglik (1e9-tick transition log-probs,
        # exact integer tick total, pinned NLL/perplexity chain)
        "WITH s AS (SELECT user_id, event_type, "
        "LEAD(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS nxt FROM events), "
        "tr AS (SELECT event_type AS src, nxt AS dst, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM s WHERE nxt IS NOT NULL "
        "GROUP BY 1, 2), "
        "rt AS (SELECT src, CAST(SUM(n) AS BIGINT) AS t FROM tr "
        "GROUP BY 1), "
        "tk AS (SELECT tr.n, CAST(ROUND(LN(CAST(tr.n AS DOUBLE) "
        "/ rt.t) * 1e9, 0) AS BIGINT) AS lp FROM tr "
        "JOIN rt ON rt.src = tr.src), "
        "ag AS (SELECT CAST(SUM(n) AS BIGINT) AS total, "
        "CAST(SUM(n * lp) AS BIGINT) AS ticks FROM tk) "
        "SELECT total AS n_transitions, ticks AS loglik_ticks, "
        "ROUND(-(CAST(ticks AS DOUBLE) / 1e9) / total, 6) AS avg_nll, "
        "ROUND(EXP(-(CAST(ticks AS DOUBLE) / 1e9) / total), 6) "
        "AS perplexity FROM ag"
    )
    out["kriging_probes"] = _kriging_oracle_sql()
    out["ransac_line"] = (
        # mirrors _q_ransac_line (mix32 candidate pairs, integer
        # cross-multiplication inlier predicate, argmax by (ni, c))
        "WITH " + _dense_daily +
        f"cands AS (SELECT r.range AS c, ({_rx1}) AS u1, "
        f"({_rx2}) AS u2 FROM range(0, {_RANSAC_CANDS}) r), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dn), "
        "th AS (SELECT (MAX(y) - MIN(y)) // 20 AS thr FROM dn), "
        "cp AS (SELECT c, u1 % nn.n AS a, u2 % nn.n AS b FROM cands, "
        "nn WHERE u1 % nn.n <> u2 % nn.n), "
        "ln AS (SELECT cp.c, cp.a, cp.b, p1.y AS y1, p2.y AS y2 "
        "FROM cp JOIN dn p1 ON p1.t = cp.a "
        "JOIN dn p2 ON p2.t = cp.b), "
        "inl AS (SELECT ln.c, ln.a, ln.b, ln.y1, ln.y2, "
        "CAST(SUM(CASE WHEN ABS((q.y - ln.y1) * (ln.b - ln.a) "
        "- (q.t - ln.a) * (ln.y2 - ln.y1)) "
        "<= th.thr * ABS(ln.b - ln.a) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS ni FROM ln, dn q, th GROUP BY 1, 2, 3, 4, 5), "
        "w AS (SELECT * FROM inl ORDER BY ni DESC, c LIMIT 1) "
        "SELECT CAST(c AS BIGINT) AS cand, CAST(a AS BIGINT) AS t1, "
        "CAST(b AS BIGINT) AS t2, ni AS n_inliers, "
        "ROUND(CAST(y2 - y1 AS DOUBLE) / CAST(b - a AS DOUBLE), 6) "
        "AS slope FROM w"
    )
    out["k_medoids_2"] = (
        # mirrors _q_k_medoids_2 (28-pair enumeration, nearest-medoid
        # Manhattan cost, argmin by (cost, m1, m2))
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top8 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 8), "
        "nd AS (SELECT cell, cell % 96 AS x, cell // 96 AS y "
        "FROM top8), "
        "prs AS (SELECT a.cell AS m1, a.x AS ax, a.y AS ay, "
        "b.cell AS m2, b.x AS bx, b.y AS by_ FROM nd a "
        "JOIN nd b ON a.cell < b.cell), "
        "cost AS (SELECT prs.m1, prs.m2, "
        "CAST(SUM(LEAST(ABS(nd.x - prs.ax) + ABS(nd.y - prs.ay), "
        "ABS(nd.x - prs.bx) + ABS(nd.y - prs.by_))) AS BIGINT) AS c "
        "FROM prs, nd GROUP BY 1, 2) "
        "SELECT m1 AS m1_cell, m2 AS m2_cell, c AS total_cost "
        "FROM cost ORDER BY c, m1, m2 LIMIT 1"
    )
    out["siegel_tukey"] = (
        # alternating-extreme ranks from deterministic positions
        # (ORDER BY c, arm), Mann-Whitney z tail -- mirrors
        # _q_siegel_tukey (closed-form run sums in the engine)
        "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
        f"({_mx('user_id', 37)}) % 2 AS arm FROM events), "
        "pos AS (SELECT arm, "
        "CAST(ROW_NUMBER() OVER (ORDER BY c, arm) AS BIGINT) AS i, "
        "CAST(COUNT(*) OVER () AS BIGINT) AS n FROM p), "
        "st AS (SELECT arm, CASE WHEN 2 * i <= n + 1 THEN "
        "LEAST(CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END, n) "
        "ELSE CASE WHEN (n + 1 - i) % 2 = 1 THEN 2 * (n + 1 - i) "
        "ELSE 2 * (n + 1 - i) - 1 END END AS r FROM pos), "
        "s AS (SELECT "
        "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
        "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
        "CAST(SUM(CASE WHEN arm = 0 THEN r ELSE 0 END) AS BIGINT) AS w "
        "FROM st) "
        "SELECT na AS n_a, nb AS n_b, w AS w_a, "
        "ROUND((CAST(w AS DOUBLE) "
        "- CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0) / 2.0 "
        "- CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) "
        "/ SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) "
        "* (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0) / 12.0), 6) "
        "AS z_stat FROM s"
    )
    out["conover_squared_ranks"] = (
        # |c - med_arm| deviations (quantile_disc exact medians),
        # doubled tie-averaged ranks Q = 2R as exact ints, HUGEINT
        # moment identities, floats only in the two final square
        # roots -- mirrors _q_conover_squared_ranks
        "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
        f"({_mx('user_id', 29)}) % 2 AS arm FROM events), "
        "md AS (SELECT arm, quantile_disc(c, 0.5) AS med "
        "FROM p GROUP BY arm), "
        "z AS (SELECT p.arm, ABS(p.c - md.med) AS d FROM p "
        "JOIN md ON md.arm = p.arm), "
        "r AS (SELECT arm, CAST(2 * RANK() OVER (ORDER BY d) "
        "+ COUNT(*) OVER (PARTITION BY d) - 1 AS HUGEINT) AS q FROM z), "
        "s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na, "
        "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb, "
        "SUM(CASE WHEN arm = 0 THEN q * q ELSE 0 END) AS t4, "
        "SUM(q * q) AS s2, SUM(q * q * q * q) AS s4 FROM r) "
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, "
        "CAST(t4 AS BIGINT) AS t_sq4, "
        "ROUND(CAST(n * t4 - na * s2 AS DOUBLE) "
        "* SQRT(CAST(n - 1 AS DOUBLE)) "
        "/ SQRT(CAST(na * nb AS DOUBLE) "
        "* CAST(n * s4 - s2 * s2 AS DOUBLE)), 6) "
        "AS z_stat FROM s"
    )
    out["quade_test"] = (
        # complete day-blocks x 5 treatments, deterministic ROW_NUMBER
        # rank conventions, integer S_bt = Q_b * (r - 3) -- mirrors
        # _q_quade_test
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "event_type AS t, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "g AS (SELECT day, t, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(c) AS BIGINT) AS s FROM e GROUP BY day, t), "
        "fd AS (SELECT day FROM g GROUP BY day HAVING COUNT(*) = 5), "
        "m AS (SELECT g.day, g.t, "
        "CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE) AS mu "
        "FROM g JOIN fd USING (day)), "
        "r AS (SELECT day, t, CAST(ROW_NUMBER() OVER "
        "(PARTITION BY day ORDER BY mu, t) AS BIGINT) AS rk FROM m), "
        "rg AS (SELECT day, MAX(mu) - MIN(mu) AS rng "
        "FROM m GROUP BY day), "
        "qb AS (SELECT day, CAST(ROW_NUMBER() OVER "
        "(ORDER BY rng, day) AS BIGINT) AS q FROM rg), "
        "sbt AS (SELECT r.t, qb.q * (r.rk - 3) AS sv "
        "FROM r JOIN qb USING (day)), "
        "agg AS (SELECT CAST((SELECT COUNT(*) FROM fd) AS BIGINT) AS b, "
        "CAST(SUM(sv * sv) AS BIGINT) AS a FROM sbt), "
        "bt AS (SELECT t, CAST(SUM(sv) AS BIGINT) AS st "
        "FROM sbt GROUP BY t), "
        "bb AS (SELECT CAST(SUM(st * st) AS BIGINT) AS bp FROM bt) "
        "SELECT agg.b AS n_blocks, agg.a AS a_term, bb.bp AS b_term, "
        "ROUND(CAST((agg.b - 1) * bb.bp AS DOUBLE) "
        "/ CAST(agg.b * agg.a - bb.bp AS DOUBLE), 6) AS f_stat "
        "FROM agg, bb"
    )
    out["pcsa_distinct"] = (
        # 64-bucket Flajolet-Martin bitmaps; tz via (x & -x) - 1
        # popcount, lowest unset bit via ((b+1) & ~b) - 1 popcount --
        # mirrors _q_pcsa_distinct
        "WITH h AS (SELECT "
        f"({_mx('user_id', 51)}) AS hv FROM events), "
        "b AS (SELECT hv % 64 AS bkt, hv // 64 AS rest FROM h), "
        "t AS (SELECT bkt, CASE WHEN rest = 0 THEN 30 ELSE "
        "LEAST(bit_count((rest & -rest) - 1), 30) END AS tz FROM b), "
        "bm AS (SELECT bkt, bit_or(1 << tz) AS bits "
        "FROM t GROUP BY bkt), "
        "ab AS (SELECT range AS bkt FROM range(0, 64)), "
        "r AS (SELECT ab.bkt, COALESCE(bm.bits, 0) AS bits "
        "FROM ab LEFT JOIN bm USING (bkt)), "
        "rr AS (SELECT bit_count(((bits + 1) & ~bits) - 1) AS rv "
        "FROM r), "
        "s AS (SELECT CAST(SUM(rv) AS BIGINT) AS r_sum FROM rr) "
        "SELECT r_sum, "
        "ROUND(64.0 / 0.77351 "
        "* POW(2.0, CAST(r_sum AS DOUBLE) / 64.0), 6) AS pcsa_estimate, "
        "(SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) "
        "AS exact_distinct FROM s"
    )
    out["hodges_lehmann"] = (
        # outer difference of the two deci-cent histograms, explicit
        # lower/upper weighted-median selection -- mirrors
        # _q_hodges_lehmann
        "WITH p AS (SELECT CAST(ROUND(value * 10, 0) AS BIGINT) AS d10, "
        f"({_mx('user_id', 41)}) % 2 AS arm FROM events), "
        "ha AS (SELECT d10, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "WHERE arm = 0 GROUP BY d10), "
        "hb AS (SELECT d10, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "WHERE arm = 1 GROUP BY d10), "
        "j AS (SELECT a.d10 - b.d10 AS diff, "
        "CAST(SUM(a.n * b.n) AS BIGINT) AS w "
        "FROM ha a CROSS JOIN hb b GROUP BY 1), "
        "c AS (SELECT diff, SUM(w) OVER (ORDER BY diff "
        "ROWS UNBOUNDED PRECEDING) AS cum, SUM(w) OVER () AS np_ "
        "FROM j), "
        "lo AS (SELECT MIN(diff) AS v FROM c "
        "WHERE cum >= (np_ + 1) // 2), "
        "hi AS (SELECT MIN(diff) AS v FROM c "
        "WHERE cum >= np_ // 2 + 1) "
        "SELECT (SELECT CAST(MAX(np_) AS BIGINT) FROM c) AS n_pairs, "
        "lo.v AS lo_d10, hi.v AS hi_d10, "
        "ROUND((CAST(lo.v AS DOUBLE) + CAST(hi.v AS DOUBLE)) "
        "/ 2.0 / 10.0, 6) AS hl_shift FROM lo, hi"
    )
    out["krippendorff_alpha"] = (
        # doubled coincidence-matrix contributions (2/(m_u-1) is an
        # integer for m_u in {2,3}); alpha = 1 - D_o'(n'-2)/sum n'c
        # n'c' -- mirrors _q_krippendorff_alpha
        "WITH e AS (SELECT user_id * 1000000 "
        "+ epoch_us(ts) // 86400000000 AS subj, ts, event_id, "
        "event_type AS t FROM events), "
        "f AS (SELECT subj, t, ROW_NUMBER() OVER (PARTITION BY subj "
        "ORDER BY ts, event_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY subj) AS m FROM e), "
        "g AS (SELECT subj, t, rn FROM f WHERE rn <= 3 AND m >= 2), "
        "u AS (SELECT subj, CAST(COUNT(*) AS BIGINT) AS mu "
        "FROM g GROUP BY subj), "
        "prs AS (SELECT a.t AS c1, b.t AS c2, "
        "CASE WHEN u.mu = 2 THEN 2 ELSE 1 END AS w "
        "FROM g a JOIN g b ON b.subj = a.subj AND b.rn <> a.rn "
        "JOIN u ON u.subj = a.subj), "
        "o AS (SELECT c1, c2, CAST(SUM(w) AS BIGINT) AS o2 "
        "FROM prs GROUP BY c1, c2), "
        "mc AS (SELECT c1, CAST(SUM(o2) AS BIGINT) AS nc "
        "FROM o GROUP BY c1), "
        "s AS (SELECT "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_units, "
        "(SELECT CAST(SUM(nc) AS BIGINT) FROM mc) AS ntot, "
        "(SELECT CAST(SUM(CASE WHEN c1 <> c2 THEN o2 ELSE 0 END) "
        "AS BIGINT) FROM o) AS do2, "
        "(SELECT CAST(SUM(a.nc * b.nc) AS BIGINT) FROM mc a "
        "JOIN mc b ON b.c1 <> a.c1) AS de2) "
        "SELECT n_units, ntot AS n_values2, do2 AS d_o2, "
        "ROUND(1.0 - CAST(do2 * (ntot - 2) AS DOUBLE) "
        "/ CAST(de2 AS DOUBLE), 6) AS alpha FROM s"
    )
    out["k_center_greedy"] = _k_center_oracle_sql()
    out["set_cover_greedy"] = _set_cover_oracle_sql()
    out["max_clique"] = _max_clique_oracle_sql()
    out["steiner_tree"] = _steiner_oracle_sql()
    out["stable_matching"] = _stable_matching_oracle_sql()
    out["bin_packing_ffd"] = _bin_packing_oracle_sql()
    out["nn_fj_function"] = (
        # probe-lattice empty-space F + point G + J = (1-G)/(1-F),
        # distances 1e9-quantized, J NULL where F = 1 -- mirrors
        # _q_nn_fj_function
        "WITH p AS (SELECT event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS px, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS py "
        "FROM events WHERE event_id % 100 = 0), "
        "pr AS (SELECT i.range AS i, j.range AS j, "
        "77.0 + CAST(i.range * 6 AS DOUBLE) * 0.01 AS px, "
        "28.05 + CAST(j.range * 6 AS DOUBLE) * 0.01 AS py "
        "FROM range(0, 16) i, range(0, 16) j), "
        "fn AS (SELECT pr.i, pr.j, "
        "MIN((pr.px - p.px) * (pr.px - p.px) "
        "+ (pr.py - p.py) * (pr.py - p.py)) AS d2 "
        "FROM pr, p GROUP BY pr.i, pr.j), "
        "fq AS (SELECT CAST(ROUND(SQRT(d2) * 1e9, 0) AS BIGINT) AS dq "
        "FROM fn), "
        "gn AS (SELECT a.event_id, "
        "MIN((a.px - b.px) * (a.px - b.px) "
        "+ (a.py - b.py) * (a.py - b.py)) AS d2 "
        "FROM p a JOIN p b ON b.event_id <> a.event_id "
        "GROUP BY a.event_id), "
        "gq AS (SELECT CAST(ROUND(SQRT(d2) * 1e9, 0) AS BIGINT) AS dq "
        "FROM gn), "
        "r(rq) AS (VALUES "
        + ", ".join(f"({v})" for v in _GFUNC_RADII_Q)
        + "), "
        "ff AS (SELECT rq, CAST(SUM(CASE WHEN dq <= rq THEN 1 ELSE 0 "
        "END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS f_hat "
        "FROM r, fq GROUP BY rq), "
        "gg AS (SELECT rq, CAST(SUM(CASE WHEN dq <= rq THEN 1 ELSE 0 "
        "END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS g_hat "
        "FROM r, gq GROUP BY rq) "
        "SELECT ROUND(CAST(ff.rq AS DOUBLE) / 1e9, 6) AS r, "
        "ROUND(ff.f_hat, 6) AS f_hat, ROUND(gg.g_hat, 6) AS g_hat, "
        "CASE WHEN ff.f_hat < 1.0 THEN "
        "ROUND((1.0 - gg.g_hat) / (1.0 - ff.f_hat), 6) "
        "ELSE NULL END AS j_hat "
        "FROM ff JOIN gg USING (rq) ORDER BY ff.rq"
    )
    out["hypsometric"] = (
        # exact integer-cent thresholds at decile steps of the range;
        # HI from exact sum/min/max -- mirrors _q_hypsometric
        f"WITH g AS ({_OG_GRID_SQL}), "
        "v AS (SELECT CAST(ROUND(z * 100, 0) AS BIGINT) AS c FROM g "
        "WHERE z > -1e30), "
        "s AS (SELECT CAST(MIN(c) AS BIGINT) AS mn, "
        "CAST(MAX(c) AS BIGINT) AS mx, CAST(SUM(c) AS BIGINT) AS sm, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM v), "
        "kk AS (SELECT range AS k FROM range(0, 11)), "
        "t AS (SELECT kk.k, s.mn + (kk.k * (s.mx - s.mn)) // 10 "
        "AS thr FROM kk, s), "
        "a AS (SELECT t.k, t.thr, CAST(SUM(CASE WHEN v.c >= t.thr "
        "THEN 1 ELSE 0 END) AS BIGINT) AS na FROM t, v "
        "GROUP BY t.k, t.thr) "
        "SELECT CAST(a.k AS BIGINT) AS k, a.thr AS threshold_c, "
        "a.na AS n_above, "
        "ROUND(CAST(a.na AS DOUBLE) / CAST(s.n AS DOUBLE), 6) "
        "AS frac_above, "
        "ROUND((CAST(s.sm AS DOUBLE) / CAST(s.n AS DOUBLE) "
        "- CAST(s.mn AS DOUBLE)) / CAST(s.mx - s.mn AS DOUBLE), 6) "
        "AS hi FROM a, s ORDER BY a.k"
    )
    out["tile_gaussian_blur"] = (
        # two [1,2,1]^2 integer passes == the engine's one 5x5
        # binomial kernel (convolution composes); defined where all
        # 25 cells valid -- mirrors _q_tile_gaussian_blur
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT row, col, CAST(ROUND(z * 10, 0) AS BIGINT) "
        "AS z10 FROM g WHERE z > -1e30), "
        "y AS (SELECT a.row, a.col, "
        "CAST(SUM((2 - ABS(b.row - a.row)) * (2 - ABS(b.col - a.col)) "
        "* b.z10) AS BIGINT) AS y, COUNT(*) AS k FROM v a JOIN v b "
        "ON ABS(b.row - a.row) <= 1 AND ABS(b.col - a.col) <= 1 "
        "GROUP BY a.row, a.col), "
        "y9 AS (SELECT row, col, y FROM y WHERE k = 9), "
        "b AS (SELECT a.row, a.col, "
        "CAST(SUM((2 - ABS(b.row - a.row)) * (2 - ABS(b.col - a.col)) "
        "* b.y) AS BIGINT) AS b2560, COUNT(*) AS k FROM y9 a "
        "JOIN y9 b ON ABS(b.row - a.row) <= 1 "
        "AND ABS(b.col - a.col) <= 1 GROUP BY a.row, a.col) "
        "SELECT CAST(row AS BIGINT) AS row, CAST(col AS BIGINT) "
        "AS col, b2560 FROM b WHERE k = 9"
    )
    out["kneser_ney"] = (
        # D = 3/4 exact rational; continuation counts from the bigram
        # TYPE table; one float division per bigram -- mirrors
        # _q_kneser_ney
        "WITH w AS (SELECT list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "g AS (SELECT ws[i] AS v, ws[i+1] AS w2 FROM w, "
        "LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i)), "
        "bc AS (SELECT v, w2, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM g GROUP BY 1, 2), "
        "cv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv, "
        "CAST(COUNT(*) AS BIGINT) AS n1v FROM bc GROUP BY v), "
        "cw AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nw "
        "FROM bc GROUP BY w2), "
        "nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM bc), "
        "top AS (SELECT v, w2, c FROM bc "
        "ORDER BY c DESC, v, w2 LIMIT 20) "
        "SELECT top.v, top.w2 AS w, top.c AS c_vw, "
        "ROUND(CAST(GREATEST(4 * top.c - 3, 0) * nt.nt "
        "+ 3 * cv.n1v * cw.nw AS DOUBLE) "
        "/ CAST(4 * cv.cv * nt.nt AS DOUBLE), 6) AS p_kn "
        "FROM top JOIN cv USING (v) JOIN cw USING (w2), nt"
    )
    out["bwt_transform"] = (
        # all rotations of the top-8-token signature string sorted
        # bytewise -- mirrors _q_bwt_transform
        "WITH w AS (SELECT list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "tok AS (SELECT unnest(ws) AS t FROM w), "
        "tf AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t), "
        "t8 AS (SELECT t, n FROM tf ORDER BY n DESC, t LIMIT 8), "
        "s AS (SELECT string_agg(t, ' ' ORDER BY n DESC, t) || '$' "
        "AS str FROM t8), "
        "r AS (SELECT unnest(range(0, length(str))) AS i FROM s), "
        "rot AS (SELECT r.i, substr(s.str, CAST(r.i AS INTEGER) + 1) "
        "|| substr(s.str, 1, CAST(r.i AS INTEGER)) AS rstr "
        "FROM r, s), "
        "o AS (SELECT i, rstr, CAST(ROW_NUMBER() OVER "
        "(ORDER BY rstr) AS BIGINT) AS pos FROM rot) "
        "SELECT pos, substr(rstr, length(rstr), 1) AS ch, "
        "(SELECT pos FROM o WHERE i = 0) AS primary_idx "
        "FROM o ORDER BY pos"
    )
    out["fisher_lda"] = (
        # n-scaled integer scatter, HUGEINT Cramer solve, floats only
        # in the final divisions -- mirrors _q_fisher_lda
        "WITH p AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 "
        "ELSE 0 END AS y, "
        "(epoch_us(ts) // 3600000000) % 24 AS h, "
        "CAST(ROUND(value * 0.1, 0) AS BIGINT) AS x2 FROM events), "
        "m AS (SELECT y, CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(h) AS HUGEINT) AS s1, "
        "CAST(SUM(x2) AS HUGEINT) AS s2, "
        "CAST(SUM(h * h) AS HUGEINT) AS s11, "
        "CAST(SUM(x2 * x2) AS HUGEINT) AS s22, "
        "CAST(SUM(h * x2) AS HUGEINT) AS s12 FROM p GROUP BY y), "
        "ab AS (SELECT "
        "a.n AS n0, b.n AS n1, "
        "a.n * a.s11 - a.s1 * a.s1 AS a11_0, "
        "a.n * a.s22 - a.s2 * a.s2 AS a22_0, "
        "a.n * a.s12 - a.s1 * a.s2 AS a12_0, "
        "b.n * b.s11 - b.s1 * b.s1 AS a11_1, "
        "b.n * b.s22 - b.s2 * b.s2 AS a22_1, "
        "b.n * b.s12 - b.s1 * b.s2 AS a12_1, "
        "a.n * b.s1 - b.n * a.s1 AS d1, "
        "a.n * b.s2 - b.n * a.s2 AS d2, "
        "a.s1 AS s1_0, b.s1 AS s1_1, b.s2 AS s2_1 "
        "FROM m a, m b WHERE a.y = 0 AND b.y = 1), "
        "mm AS (SELECT n0, n1, d1, d2, s1_1, s2_1, "
        "n1 * a11_0 + n0 * a11_1 AS m11, "
        "n1 * a22_0 + n0 * a22_1 AS m22, "
        "n1 * a12_0 + n0 * a12_1 AS m12 FROM ab) "
        "SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, "
        "ROUND(CAST(m22 * d1 - m12 * d2 AS DOUBLE) "
        "/ CAST(m11 * m22 - m12 * m12 AS DOUBLE), 6) AS w1, "
        "ROUND(CAST(m11 * d2 - m12 * d1 AS DOUBLE) "
        "/ CAST(m11 * m22 - m12 * m12 AS DOUBLE), 6) AS w2, "
        "ROUND(CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) "
        "AS mu1_hour, "
        "ROUND(CAST(s2_1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) "
        "AS mu1_dd FROM mm"
    )
    out["media_dhash_pairs"] = (
        # block-sum grid from the formula pixels, horizontal
        # gradient-sign bits, Hamming pairs -- mirrors
        # _q_media_dhash_pairs
        "WITH px AS (SELECT i.range AS i, r.range AS r, c.range AS c, "
        "(r.range * 73 + c.range * 31 + (i.range % 16) * 17 "
        "+ CASE WHEN i.range >= 16 AND r.range < 4 AND c.range < 4 "
        "THEN 100 ELSE 0 END) % 256 AS v "
        "FROM range(0, 24) i, range(0, 32) r, range(0, 32) c), "
        "blk AS (SELECT i, r // 4 AS br, c // 4 AS bc, "
        "SUM(v) AS bs FROM px GROUP BY i, br, bc), "
        "bits AS (SELECT a.i, a.br * 7 + a.bc AS b, "
        "CASE WHEN a.bs > x.bs THEN 1 ELSE 0 END AS bit "
        "FROM blk a JOIN blk x ON x.i = a.i AND x.br = a.br "
        "AND x.bc = a.bc + 1), "
        "ham AS (SELECT a.i AS ia, b.i AS ib, "
        "SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h "
        "FROM bits a JOIN bits b ON a.b = b.b "
        "AND 'm' || CAST(a.i AS VARCHAR) < 'm' || CAST(b.i AS VARCHAR) "
        "GROUP BY a.i, b.i) "
        "SELECT 'm' || CAST(ia AS VARCHAR) AS id_a, "
        "'m' || CAST(ib AS VARCHAR) AS id_b, "
        "CAST(h AS BIGINT) AS hamming FROM ham WHERE h <= 6"
    )
    out["wav_features"] = (
        # recompute the formula samples; exact integer energy and
        # strict-sign-flip counts per 64-sample frame -- mirrors
        # _q_wav_features
        "WITH s AS (SELECT i.range AS i, t.range AS t, "
        "(t.range * 73 + i.range * 17) % 2001 - 1000 AS v "
        "FROM range(0, 12) i, range(0, 256) t), "
        "f AS (SELECT i, t // 64 AS fr, v, "
        "LAG(v) OVER (PARTITION BY i, t // 64 ORDER BY t) AS pv "
        "FROM s) "
        "SELECT 'w' || CAST(i AS VARCHAR) AS media_id, "
        "CAST(fr AS BIGINT) AS frame, "
        "CAST(SUM(v * v) AS BIGINT) AS energy, "
        "CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS zcr FROM f GROUP BY i, fr"
    )
    out["matrix_profile"] = (
        # dense hourly frame, stride-6 window-6 windows, exact int
        # squared distances, argmin with smallest-index ties --
        # mirrors _q_matrix_profile
        "WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series("
        "(SELECT MIN(hr) FROM h), (SELECT MAX(hr) FROM h))) AS hr), "
        "x AS (SELECT fr.hr - (SELECT MIN(hr) FROM h) AS idx, "
        "COALESCE(h.n, 0) AS v FROM fr LEFT JOIN h USING (hr)), "
        "nw AS (SELECT ((SELECT COUNT(*) FROM x) - 6) // 6 + 1 AS n_w), "
        "win AS (SELECT x.idx // 6 AS w, x.idx % 6 AS k, x.v "
        "FROM x, nw WHERE x.idx < nw.n_w * 6), "
        "d AS (SELECT a.w AS i, b.w AS j, "
        "CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2 "
        "FROM win a JOIN win b ON b.k = a.k AND b.w <> a.w "
        "GROUP BY a.w, b.w), "
        "p AS (SELECT i, d2, j, ROW_NUMBER() OVER (PARTITION BY i "
        "ORDER BY d2, j) AS rn FROM d) "
        "SELECT CAST(i AS BIGINT) AS w, d2 AS mp_d2, "
        "CAST(j AS BIGINT) AS nn_w FROM p WHERE rn = 1"
    )
    out["rsi_wilder"] = _rsi_oracle_sql()
    out["segregation_indices"] = (
        # exact |a*B - b*A| numerator; 1e9-tick interaction terms --
        # mirrors _q_segregation_indices
        "WITH p AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a, "
        "CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b "
        "FROM events WHERE event_type IN ('purchase', 'view')), "
        "c AS (SELECT cell, CAST(SUM(a) AS BIGINT) AS a, "
        "CAST(SUM(b) AS BIGINT) AS b FROM p GROUP BY cell), "
        "tt AS (SELECT CAST(SUM(a) AS BIGINT) AS ba, "
        "CAST(SUM(b) AS BIGINT) AS bb, "
        "CAST(COUNT(*) AS BIGINT) AS nc FROM c), "
        "terms AS (SELECT "
        "CAST(SUM(ABS(c.a * tt.bb - c.b * tt.ba)) AS BIGINT) AS dn, "
        "CAST(SUM(CAST(ROUND(CAST(c.a AS DOUBLE) * CAST(c.a AS DOUBLE) "
        "/ CAST(c.a + c.b AS DOUBLE) * 1e9, 0) AS BIGINT)) AS BIGINT) "
        "AS iso, "
        "CAST(SUM(CAST(ROUND(CAST(c.a AS DOUBLE) * CAST(c.b AS DOUBLE) "
        "/ CAST(c.a + c.b AS DOUBLE) * 1e9, 0) AS BIGINT)) AS BIGINT) "
        "AS expo FROM c, tt) "
        "SELECT tt.nc AS n_cells, "
        "ROUND(CAST(terms.dn AS DOUBLE) "
        "/ (2.0 * CAST(tt.ba AS DOUBLE) * CAST(tt.bb AS DOUBLE)), 6) "
        "AS d_index, "
        "ROUND(CAST(terms.iso AS DOUBLE) / 1e9 "
        "/ CAST(tt.ba AS DOUBLE), 6) AS isolation_aa, "
        "ROUND(CAST(terms.expo AS DOUBLE) / 1e9 "
        "/ CAST(tt.ba AS DOUBLE), 6) AS exposure_ab "
        "FROM terms, tt"
    )
    out["simrank"] = _simrank_oracle_sql()
    out["string_borders"] = (
        # border = direct prefix/suffix equality per length; period =
        # n - maxborder -- mirrors _q_string_borders
        "WITH " + _sig_string_sql() + ", "
        "nn AS (SELECT CAST(length(str) AS BIGINT) AS n FROM s), "
        "k AS (SELECT unnest(generate_series(1, "
        "(SELECT n FROM nn) - 1)) AS k), "
        "b AS (SELECT k.k FROM k, s WHERE "
        "substr(s.str, 1, CAST(k.k AS INTEGER)) = "
        "substr(s.str, CAST(length(s.str) - k.k AS INTEGER) + 1)), "
        "mb AS (SELECT COALESCE(MAX(k), 0) AS m FROM b), "
        "rows_ AS (SELECT k FROM b UNION ALL "
        "SELECT 0 WHERE NOT EXISTS (SELECT 1 FROM b)) "
        "SELECT CAST(rows_.k AS BIGINT) AS border_len, nn.n, "
        "CAST(nn.n - mb.m AS BIGINT) AS period "
        "FROM rows_, nn, mb"
    )
    out["suffix_array_lcp"] = (
        # suffixes sorted bytewise; LCP with the predecessor via a
        # bounded-k equality probe -- mirrors _q_suffix_array_lcp
        "WITH " + _sig_string_sql() + ", "
        "idx AS (SELECT unnest(generate_series(0, "
        "(SELECT CAST(length(str) AS BIGINT) FROM s) - 1)) AS i), "
        "suf AS (SELECT idx.i, substr(s.str, "
        "CAST(idx.i AS INTEGER) + 1) AS sfx FROM idx, s), "
        "o AS (SELECT i, sfx, CAST(ROW_NUMBER() OVER (ORDER BY sfx) "
        "AS BIGINT) AS rnk FROM suf), "
        "p AS (SELECT a.rnk, a.i, a.sfx AS cur, b.sfx AS prev "
        "FROM o a LEFT JOIN o b ON b.rnk = a.rnk - 1), "
        "ks AS (SELECT unnest(generate_series(1, "
        "(SELECT CAST(length(str) AS BIGINT) FROM s))) AS k), "
        "lc AS (SELECT p.rnk, MAX(ks.k) AS lcp FROM p JOIN ks "
        "ON ks.k <= LEAST(length(p.cur), length(p.prev)) "
        "AND substr(p.cur, 1, CAST(ks.k AS INTEGER)) = "
        "substr(p.prev, 1, CAST(ks.k AS INTEGER)) GROUP BY p.rnk) "
        "SELECT p.rnk AS rank, CAST(p.i AS BIGINT) AS sa, "
        "CAST(COALESCE(lc.lcp, 0) AS BIGINT) AS lcp "
        "FROM p LEFT JOIN lc ON lc.rnk = p.rnk"
    )
    out["closest_farthest_pair"] = (
        # exact integer d2 extremes over the top-50 cells, canonical
        # (cell_a < cell_b) ties -- mirrors _q_closest_farthest_pair
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
        "t50 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 50), "
        "nd AS (SELECT cell, cell % 96 AS x, cell // 96 AS y "
        "FROM t50), "
        "prs AS (SELECT a.cell AS ca, b.cell AS cb, "
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2 "
        "FROM nd a JOIN nd b ON a.cell < b.cell) "
        "SELECT kind, CAST(ca AS BIGINT) AS cell_a, "
        "CAST(cb AS BIGINT) AS cell_b, CAST(d2 AS BIGINT) AS d2 FROM ("
        "(SELECT 'closest' AS kind, ca, cb, d2 FROM prs "
        "ORDER BY d2, ca, cb LIMIT 1) "
        "UNION ALL "
        "(SELECT 'farthest', ca, cb, d2 FROM prs "
        "ORDER BY d2 DESC, ca, cb LIMIT 1))"
    )
    out["rect_union_area"] = (
        # covered-lattice-cell count = exact union area -- mirrors
        # _q_rect_union_area
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
        "t10 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 10), "
        "b AS (SELECT GREATEST(0, cell % 96 - 6) AS x0, "
        "LEAST(95, cell % 96 + 6) AS x1, "
        "GREATEST(0, cell // 96 - 6) AS y0, "
        "LEAST(95, cell // 96 + 6) AS y1 FROM t10), "
        "sa AS (SELECT CAST(SUM((x1 - x0 + 1) * (y1 - y0 + 1)) "
        "AS BIGINT) AS s FROM b), "
        "g AS (SELECT gx.range AS x, gy.range AS y "
        "FROM range(0, 96) gx, range(0, 96) gy), "
        "u AS (SELECT CAST(COUNT(*) AS BIGINT) AS u FROM g "
        "WHERE EXISTS (SELECT 1 FROM b WHERE g.x BETWEEN b.x0 AND b.x1 "
        "AND g.y BETWEEN b.y0 AND b.y1)) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t10) AS n_rects, "
        "sa.s AS sum_areas, u.u AS union_area, "
        "CAST(sa.s - u.u AS BIGINT) AS overlap FROM sa, u"
    )
    out["holm_adjust"] = _holm_oracle_sql()
    out["croston_demand"] = _croston_oracle_sql()
    out["aoristic_hours"] = (
        # 30-min windows split across hour bins in exact microseconds
        # -- mirrors _q_aoristic_hours
        "WITH e AS (SELECT epoch_us(ts) AS t FROM events), "
        "sp AS (SELECT (t // 3600000000) % 24 AS hour, "
        "LEAST(1800000000, 3600000000 - t % 3600000000) AS w FROM e "
        "UNION ALL "
        "SELECT ((t // 3600000000) + 1) % 24, "
        "1800000000 - LEAST(1800000000, 3600000000 - t % 3600000000) "
        "FROM e), "
        "a AS (SELECT hour, CAST(SUM(w) AS BIGINT) AS w_us FROM sp "
        "GROUP BY hour), "
        "fr AS (SELECT range AS hour FROM range(0, 24)), "
        "f AS (SELECT fr.hour, COALESCE(a.w_us, 0) AS w_us "
        "FROM fr LEFT JOIN a USING (hour)), "
        "t AS (SELECT SUM(w_us) AS tot FROM f) "
        "SELECT CAST(f.hour AS BIGINT) AS hour, f.w_us, "
        "ROUND(CAST(f.w_us AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) "
        "AS share FROM f, t ORDER BY f.hour"
    )
    out["pair_correlation"] = (
        # ordered-pair annulus counts (coincident separate), CSR
        # normalization with area = 0.95*0.95 -- mirrors
        # _q_pair_correlation
        "WITH p AS (SELECT event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS px, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS py "
        "FROM events WHERE event_id % 20 = 0), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p), "
        "ed AS (SELECT * FROM (VALUES (0, 0.0, 0.02), "
        "(1, 0.02, 0.04), (2, 0.04, 0.06), (3, 0.06, 0.08), "
        "(4, 0.08, 0.10)) AS v(k, r1, r2)), "
        "pr AS MATERIALIZED (SELECT "
        "(a.px - b.px) * (a.px - b.px) "
        "+ (a.py - b.py) * (a.py - b.py) AS d2 FROM p a, p b), "
        "cnt AS (SELECT ed.k, ed.r1, ed.r2, "
        "CAST(SUM(CASE WHEN pr.d2 > ed.r1 * ed.r1 "
        "AND pr.d2 <= ed.r2 * ed.r2 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS c FROM ed, pr GROUP BY ed.k, ed.r1, ed.r2), "
        "co AS (SELECT CAST(SUM(CASE WHEN d2 = 0.0 THEN 1 ELSE 0 END) "
        "AS BIGINT) - (SELECT m FROM n) AS nco FROM pr) "
        "SELECT CAST(cnt.k AS BIGINT) AS k, ROUND(cnt.r1, 6) AS r1, "
        "ROUND(cnt.r2, 6) AS r2, cnt.c AS n_pairs, "
        "ROUND(CAST(cnt.c AS DOUBLE) "
        "/ (CAST(n.m AS DOUBLE) * CAST(n.m - 1 AS DOUBLE)) "
        "* (0.95 * 0.95) / (pi() * (cnt.r2 * cnt.r2 "
        "- cnt.r1 * cnt.r1)), 6) AS g_r, "
        "co.nco AS n_coincident "
        "FROM cnt, n, co ORDER BY cnt.k"
    )
    out["crc32_audit"] = _crc32_oracle_sql()
    out["hop_histogram"] = (
        # all-source bounded recursive closure, ordered reachable
        # pairs; effective diameter by integer 10c >= 9t -- mirrors
        # _q_hop_histogram
        "WITH RECURSIVE tok AS (SELECT DISTINCT source AS w "
        "FROM documents WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e "
        "UNION ALL SELECT w2, w1 FROM e), "
        "nodes AS (SELECT DISTINCT w1 AS w FROM sym), "
        "walk(s, w, d) AS (SELECT w, w, 0 FROM nodes "
        "UNION SELECT walk.s, sym.w2, walk.d + 1 FROM walk "
        "JOIN sym ON sym.w1 = walk.w WHERE walk.d < 12), "
        "mh AS (SELECT s, w, MIN(d) AS h FROM walk GROUP BY s, w), "
        "hp AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM mh "
        "WHERE h >= 1 GROUP BY h), "
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM hp), "
        "cum AS (SELECT h, n, SUM(n) OVER (ORDER BY h) AS c FROM hp), "
        "eff AS (SELECT CAST(MIN(h) AS BIGINT) AS ed FROM cum, tot "
        "WHERE 10 * c >= 9 * t), "
        "dm AS (SELECT CAST(MAX(h) AS BIGINT) AS dm FROM hp) "
        "SELECT CAST(hp.h AS BIGINT) AS h, hp.n AS n_pairs, "
        "eff.ed AS eff_diameter, dm.dm AS diameter "
        "FROM hp, eff, dm ORDER BY hp.h"
    )
    out["graph_coloring_greedy"] = _coloring_oracle_sql()
    out["ca_trend_hours"] = (
        # exact HUGEINT trend moments, floats only in the two square
        # roots -- mirrors _q_cochran_armitage
        "WITH p AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r "
        "FROM events), "
        "g AS (SELECT h, CAST(SUM(r) AS HUGEINT) AS r, "
        "CAST(COUNT(*) AS HUGEINT) AS n FROM p GROUP BY h), "
        "s AS (SELECT CAST(SUM(n) AS HUGEINT) AS n, "
        "CAST(SUM(r) AS HUGEINT) AS r, "
        "CAST(SUM(h * r) AS HUGEINT) AS t, "
        "CAST(SUM(h * n) AS HUGEINT) AS s1, "
        "CAST(SUM(h * h * n) AS HUGEINT) AS s2 FROM g) "
        "SELECT CAST(n AS BIGINT) AS n_total, "
        "CAST(r AS BIGINT) AS n_pos, "
        "CAST(n * t - r * s1 AS BIGINT) AS num, "
        "ROUND(CAST(n * t - r * s1 AS DOUBLE) "
        "* SQRT(CAST(n AS DOUBLE)) "
        "/ SQRT(CAST(r * (n - r) * (n * s2 - s1 * s1) AS DOUBLE)), 6) "
        "AS z_stat FROM s"
    )
    out["chow_revenue_break"] = (
        # pooled + two-segment OLS SSEs from exact integer moments,
        # one pinned float chain each -- mirrors _q_chow_test
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(*) // 2 AS BIGINT) AS mid FROM xs), "
        "m AS (SELECT 0 AS s, CAST(COUNT(*) AS BIGINT) AS m, "
        "CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(t * t) AS BIGINT) AS sxx, "
        "CAST(SUM(y * y) AS BIGINT) AS syy, "
        "CAST(SUM(t * y) AS BIGINT) AS sxy FROM xs "
        "UNION ALL SELECT 1, CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(t) AS BIGINT), CAST(SUM(y) AS BIGINT), "
        "CAST(SUM(t * t) AS BIGINT), CAST(SUM(y * y) AS BIGINT), "
        "CAST(SUM(t * y) AS BIGINT) FROM xs, nn WHERE t < nn.mid "
        "UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT), "
        "CAST(SUM(t) AS BIGINT), CAST(SUM(y) AS BIGINT), "
        "CAST(SUM(t * t) AS BIGINT), CAST(SUM(y * y) AS BIGINT), "
        "CAST(SUM(t * y) AS BIGINT) FROM xs, nn WHERE t >= nn.mid), "
        "e AS (SELECT s, (CAST(m * syy - sy * sy AS DOUBLE) "
        "- CAST(m * sxy - sx * sy AS DOUBLE) "
        "* CAST(m * sxy - sx * sy AS DOUBLE) "
        "/ CAST(m * sxx - sx * sx AS DOUBLE)) / CAST(m AS DOUBLE) "
        "AS sse FROM m) "
        "SELECT nn.n AS n_days, "
        "ROUND((SELECT sse FROM e WHERE s = 0), 6) AS sse_pooled, "
        "ROUND((SELECT sse FROM e WHERE s = 1), 6) AS sse_1, "
        "ROUND((SELECT sse FROM e WHERE s = 2), 6) AS sse_2, "
        "ROUND((((SELECT sse FROM e WHERE s = 0) "
        "- (SELECT sse FROM e WHERE s = 1) "
        "- (SELECT sse FROM e WHERE s = 2)) / 2.0) "
        "/ (((SELECT sse FROM e WHERE s = 1) "
        "+ (SELECT sse FROM e WHERE s = 2)) "
        "/ CAST(nn.n - 4 AS DOUBLE)), 6) AS f_stat FROM nn"
    )
    out["cvm_uniform"] = (
        # exact HUGEINT order-statistic sum; floats only in the
        # final assembly -- mirrors _q_cvm_uniform
        "WITH u AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) "
        "% 10000 AS k FROM events), "
        "r AS (SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS i, "
        "COUNT(*) OVER () AS n FROM u), "
        "t AS (SELECT SUM(CAST((2 * i - 1) * 10000 - 2 * n * k "
        "AS HUGEINT) * CAST((2 * i - 1) * 10000 - 2 * n * k "
        "AS HUGEINT)) AS s, CAST(MAX(n) AS BIGINT) AS n, "
        "CAST(SUM(k) AS BIGINT) AS su FROM r) "
        "SELECT n, "
        "ROUND(1.0 / (12.0 * CAST(n AS DOUBLE)) "
        "+ CAST(s AS DOUBLE) / (CAST(2 * n * 10000 AS DOUBLE) "
        "* CAST(2 * n * 10000 AS DOUBLE)), 6) AS w2, "
        "ROUND(1.0 / (12.0 * CAST(n AS DOUBLE)) "
        "+ CAST(s AS DOUBLE) / (CAST(2 * n * 10000 AS DOUBLE) "
        "* CAST(2 * n * 10000 AS DOUBLE)) "
        "- CAST(n AS DOUBLE) "
        "* (CAST(2 * su - n * 10000 AS DOUBLE) "
        "/ CAST(2 * n * 10000 AS DOUBLE)) "
        "* (CAST(2 * su - n * 10000 AS DOUBLE) "
        "/ CAST(2 * n * 10000 AS DOUBLE)), 6) AS watson_u2 FROM t"
    )
    out["robust_moments"] = (
        # quantile_disc octiles (exact ints), two float divisions --
        # mirrors _q_robust_moments
        "WITH c AS (SELECT CAST(ROUND(l_extendedprice * 100, 0) "
        "AS BIGINT) AS c FROM lineitem), "
        "q AS (SELECT quantile_disc(c, 0.125) AS e1, "
        "quantile_disc(c, 0.25) AS e2, quantile_disc(c, 0.375) AS e3, "
        "quantile_disc(c, 0.5) AS e4, quantile_disc(c, 0.625) AS e5, "
        "quantile_disc(c, 0.75) AS e6, quantile_disc(c, 0.875) AS e7 "
        "FROM c) "
        "SELECT CAST(e2 AS BIGINT) AS q1, CAST(e4 AS BIGINT) AS q2, "
        "CAST(e6 AS BIGINT) AS q3, "
        "ROUND(CAST(e6 + e2 - 2 * e4 AS DOUBLE) "
        "/ CAST(e6 - e2 AS DOUBLE), 6) AS bowley_skew, "
        "ROUND(CAST((e7 - e5) + (e3 - e1) AS DOUBLE) "
        "/ CAST(e6 - e2 AS DOUBLE), 6) AS moors_kurt FROM q"
    )
    out["hartley_fmax"] = (
        # argmax/argmin variance by exact HUGEINT cross-compare --
        # mirrors _q_hartley_fmax
        "WITH p AS (SELECT event_type AS t, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "m AS (SELECT t, CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(c) AS HUGEINT) AS s1, "
        "CAST(SUM(c * c) AS HUGEINT) AS s2 FROM p GROUP BY t), "
        "v AS (SELECT t, n * s2 - s1 * s1 AS a, n * (n - 1) AS d "
        "FROM m), "
        "mx AS (SELECT t, a, d FROM v x WHERE NOT EXISTS ("
        "SELECT 1 FROM v y WHERE y.t <> x.t AND (y.a * x.d > "
        "x.a * y.d OR (y.a * x.d = x.a * y.d AND y.t < x.t)))), "
        "mn AS (SELECT t, a, d FROM v x WHERE NOT EXISTS ("
        "SELECT 1 FROM v y WHERE y.t <> x.t AND (x.a * y.d > "
        "y.a * x.d OR (x.a * y.d = y.a * x.d AND x.t < y.t)))) "
        "SELECT mx.t AS type_max, mn.t AS type_min, "
        "ROUND(CAST(mx.a * mn.d AS DOUBLE) "
        "/ CAST(mn.a * mx.d AS DOUBLE), 6) AS f_max FROM mx, mn"
    )
    out["siegel_slopes"] = (
        # two-level explicit lower-median selection over pairwise
        # slopes -- mirrors _q_siegel_slopes
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "sl AS (SELECT a.t AS i, CAST(b.y - a.y AS DOUBLE) "
        "/ CAST(b.t - a.t AS DOUBLE) AS s FROM xs a "
        "JOIN xs b ON b.t <> a.t), "
        "pm AS (SELECT i, s, ROW_NUMBER() OVER (PARTITION BY i "
        "ORDER BY s) AS rn, COUNT(*) OVER (PARTITION BY i) AS m "
        "FROM sl), "
        "med AS (SELECT i, s FROM pm WHERE rn = (m + 1) // 2), "
        "om AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn, "
        "CAST(COUNT(*) OVER () AS BIGINT) AS m FROM med) "
        "SELECT (SELECT m FROM om LIMIT 1) AS n_days, "
        "ROUND((SELECT s FROM om WHERE rn = (m + 1) // 2), 6) "
        "AS siegel_slope"
    )
    out["max_subarray"] = (
        # prefix-sum identity with first-occurrence argmin prefix,
        # ties by (start, end) -- mirrors _q_max_subarray
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "dif AS (SELECT t - 1 AS t, dv FROM (SELECT t, "
        "y - LAG(y) OVER (ORDER BY t) AS dv FROM xs) WHERE t >= 1), "
        "p AS (SELECT t, SUM(dv) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS s FROM dif), "
        "mn AS (SELECT t, s, LEAST(0, COALESCE(MIN(s) OVER "
        "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING), 0)) AS mp FROM p), "
        "st AS (SELECT mn.t, mn.s - mn.mp AS ssum, "
        "CASE WHEN mn.mp = 0 THEN -1 ELSE "
        "(SELECT MIN(u.t) FROM p u WHERE u.t < mn.t AND u.s = mn.mp) "
        "END AS pu FROM mn) "
        "SELECT CAST(ssum AS BIGINT) AS best_sum, "
        "CAST(pu + 1 AS BIGINT) AS start_t, CAST(t AS BIGINT) "
        "AS end_t, (SELECT CAST(COUNT(*) AS BIGINT) FROM dif) "
        "AS n_days FROM st ORDER BY ssum DESC, pu + 1, t LIMIT 1"
    )
    out["kendall_w"] = (
        # doubled tie-averaged ranks (exact ints), standard tie
        # correction -- mirrors _q_kendall_w
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "event_type AS t FROM events), "
        "g AS (SELECT day, t, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM e GROUP BY day, t), "
        "dd AS (SELECT DISTINCT day FROM g), "
        "tt AS (SELECT * FROM (VALUES ('click'), ('error'), "
        "('purchase'), ('signup'), ('view')) AS v(t)), "
        "dn AS (SELECT dd.day, tt.t, COALESCE(g.c, 0) AS c "
        "FROM dd CROSS JOIN tt "
        "LEFT JOIN g ON g.day = dd.day AND g.t = tt.t), "
        "r2 AS (SELECT day, t, CAST(2 * RANK() OVER "
        "(PARTITION BY day ORDER BY c) "
        "+ COUNT(*) OVER (PARTITION BY day, c) - 1 AS BIGINT) AS r2 "
        "FROM dn), "
        "tie AS (SELECT CAST(SUM(g * g * g - g) AS BIGINT) AS tt_ "
        "FROM (SELECT day, c, COUNT(*) AS g FROM dn "
        "GROUP BY day, c)), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM dd), "
        "rs AS (SELECT t, CAST(SUM(r2) AS BIGINT) AS rsum2 "
        "FROM r2 GROUP BY t), "
        "dq AS (SELECT CAST(SUM((rsum2 - m.m * 6) "
        "* (rsum2 - m.m * 6)) AS BIGINT) AS d2q FROM rs, m) "
        "SELECT m.m AS n_days, dq.d2q AS d2_q, tie.tt_ AS tie_term, "
        "ROUND(CAST(12 * dq.d2q AS DOUBLE) "
        "/ CAST(4 * (m.m * m.m * 120 - m.m * tie.tt_) AS DOUBLE), 6) "
        "AS kendall_w FROM m, dq, tie"
    )
    out["cronbach_daily_counts"] = (
        # n-scaled integer item/total variances, one float chain --
        # mirrors _q_cronbach_alpha
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "event_type AS t FROM events), "
        "g AS (SELECT day, t, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM e GROUP BY day, t), "
        "dd AS (SELECT DISTINCT day FROM g), "
        "tt AS (SELECT * FROM (VALUES ('click'), ('error'), "
        "('purchase'), ('signup'), ('view')) AS v(t)), "
        "dn AS (SELECT dd.day, tt.t, COALESCE(g.c, 0) AS c "
        "FROM dd CROSS JOIN tt "
        "LEFT JOIN g ON g.day = dd.day AND g.t = tt.t), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM dd), "
        "iv AS (SELECT CAST(SUM(vi) AS BIGINT) AS sum_vi FROM ("
        "SELECT t, m.m * SUM(c * c) - SUM(c) * SUM(c) AS vi "
        "FROM dn, m GROUP BY t, m.m)), "
        "tot AS (SELECT day, SUM(c) AS x FROM dn GROUP BY day), "
        "tv AS (SELECT CAST(m.m * SUM(x * x) - SUM(x) * SUM(x) "
        "AS BIGINT) AS v_tot FROM tot, m GROUP BY m.m) "
        "SELECT m.m AS n_days, iv.sum_vi AS sum_item_var, "
        "tv.v_tot AS total_var, "
        "ROUND((CAST(5 AS DOUBLE) / CAST(4 AS DOUBLE)) "
        "* (1.0 - CAST(iv.sum_vi AS DOUBLE) "
        "/ CAST(tv.v_tot AS DOUBLE)), 6) AS alpha FROM m, iv, tv"
    )
    out["h_index"] = (
        # pure integer rank predicates over per-user counts --
        # mirrors _q_h_index
        "WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM events GROUP BY user_id), "
        "r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC) AS rk, "
        "SUM(n) OVER (ORDER BY n DESC ROWS UNBOUNDED PRECEDING) "
        "AS cum FROM uc) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uc) AS n_users, "
        "(SELECT CAST(MAX(rk) AS BIGINT) FROM r WHERE n >= rk) "
        "AS h_index, "
        "(SELECT CAST(MAX(rk) AS BIGINT) FROM r WHERE cum >= rk * rk) "
        "AS g_index"
    )
    out["lru_hit_rates"] = _lru_oracle_sql()
    out["isolation_forest_lite"] = _iforest_oracle_sql()
    out["banzhaf_power"] = _banzhaf_oracle_sql()
    out["irv_election"] = _irv_oracle_sql()
    out["price_indices"] = (
        # 1e6-tick cross-period p*q terms; same-period terms exact
        # (p*q = cents sum) -- mirrors _q_price_indices
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "event_type AS t, CAST(ROUND(value * 100, 0) AS BIGINT) AS c "
        "FROM events), "
        "g AS (SELECT day, t, CAST(SUM(c) AS BIGINT) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY day, t), "
        "md AS (SELECT day AS mid FROM (SELECT day, "
        "ROW_NUMBER() OVER (ORDER BY day) - 1 AS r FROM "
        "(SELECT DISTINCT day FROM g)) WHERE r = "
        "(SELECT COUNT(DISTINCT day) FROM g) // 2), "
        "per AS (SELECT CASE WHEN g.day < md.mid THEN 0 ELSE 1 END "
        "AS p, g.t, CAST(SUM(g.s) AS BIGINT) AS s, "
        "CAST(SUM(g.n) AS BIGINT) AS n FROM g, md GROUP BY 1, 2), "
        "j AS (SELECT a.t, a.s AS s0, a.n AS n0, b.s AS s1, "
        "b.n AS n1 FROM per a JOIN per b ON b.t = a.t "
        "AND a.p = 0 AND b.p = 1), "
        "terms AS (SELECT "
        "CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) "
        "* CAST(n0 AS DOUBLE) * 1e6, 0) AS BIGINT)) AS BIGINT) "
        "AS l_num, "
        "CAST(SUM(CAST(ROUND(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) "
        "* CAST(n1 AS DOUBLE) * 1e6, 0) AS BIGINT)) AS BIGINT) "
        "AS p_den, "
        "CAST(SUM(s0) AS BIGINT) AS s0t, "
        "CAST(SUM(s1) AS BIGINT) AS s1t FROM j) "
        "SELECT "
        "ROUND(CAST(l_num AS DOUBLE) / 1e6 / CAST(s0t AS DOUBLE), 6) "
        "AS laspeyres, "
        "ROUND(CAST(s1t AS DOUBLE) / (CAST(p_den AS DOUBLE) / 1e6), 6) "
        "AS paasche, "
        "ROUND(SQRT((CAST(l_num AS DOUBLE) / 1e6 "
        "/ CAST(s0t AS DOUBLE)) * (CAST(s1t AS DOUBLE) "
        "/ (CAST(p_den AS DOUBLE) / 1e6))), 6) AS fisher FROM terms"
    )
    out["dfa_alpha"] = (
        # n-scaled integer profile, exact per-segment detrend
        # moments, 1e3-tick rss sums, evenly spaced log-log slope --
        # mirrors _q_dfa_alpha
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS sy FROM xs), "
        "prof AS (SELECT xs.t, nn.n * SUM(xs.y) OVER (ORDER BY xs.t "
        "ROWS UNBOUNDED PRECEDING) - (xs.t + 1) * nn.sy AS p "
        "FROM xs, nn), "
        "scl AS (SELECT * FROM (VALUES (4), (8), (16)) AS v(s)), "
        "seg AS (SELECT scl.s, prof.t // scl.s AS g, "
        "prof.t % scl.s AS i, prof.p FROM scl, prof, nn "
        "WHERE prof.t < (nn.n // scl.s) * scl.s), "
        "mom AS (SELECT s, g, CAST(COUNT(*) AS HUGEINT) AS m, "
        "CAST(SUM(i) AS HUGEINT) AS sx, "
        "CAST(SUM(i * i) AS HUGEINT) AS sxx, "
        "CAST(SUM(p) AS HUGEINT) AS syv, "
        "SUM(CAST(p AS HUGEINT) * CAST(p AS HUGEINT)) AS syy, "
        "CAST(SUM(i * p) AS HUGEINT) AS sxy FROM seg GROUP BY s, g), "
        "rss AS (SELECT s, g, (CAST(m * syy - syv * syv AS DOUBLE) "
        "- CAST(m * sxy - sx * syv AS DOUBLE) "
        "* CAST(m * sxy - sx * syv AS DOUBLE) "
        "/ CAST(m * sxx - sx * sx AS DOUBLE)) / CAST(m AS DOUBLE) "
        "AS rss FROM mom), "
        "tk AS (SELECT s, CAST(SUM(CAST(ROUND(rss "
        "/ CAST(nn.n * nn.n AS DOUBLE) * 1e3, 0) AS BIGINT)) "
        "AS BIGINT) AS ticks, CAST(COUNT(*) AS BIGINT) AS nseg "
        "FROM rss, nn GROUP BY s), "
        "lf AS (SELECT s, nseg, ticks, "
        "0.5 * LN(CAST(ticks AS DOUBLE) / 1e3 / CAST(nseg AS DOUBLE) "
        "/ CAST(s AS DOUBLE)) AS logf FROM tk) "
        "SELECT CAST(s AS BIGINT) AS s, nseg AS n_segments, "
        "ticks AS rss_ticks, ROUND(logf, 6) AS log_f, "
        "ROUND(((SELECT logf FROM lf WHERE s = 16) "
        "- (SELECT logf FROM lf WHERE s = 4)) / (2.0 * LN(2.0)), 6) "
        "AS alpha FROM lf ORDER BY s"
    )
    out["brier_hour_forecast"] = (
        # train/eval day split, Laplace-smoothed per-hour rates,
        # 1e9-tick per-hour terms -- mirrors _q_brier_decomposition
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "(epoch_us(ts) // 3600000000) % 24 AS h, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r "
        "FROM events), "
        "md AS (SELECT day AS mid FROM (SELECT day, "
        "ROW_NUMBER() OVER (ORDER BY day) - 1 AS rr FROM "
        "(SELECT DISTINCT day FROM e)) WHERE rr = "
        "(SELECT COUNT(DISTINCT day) FROM e) // 2), "
        "tr AS (SELECT h, CAST(SUM(r) AS BIGINT) AS r, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e, md "
        "WHERE day < mid GROUP BY h), "
        "ev AS (SELECT h, CAST(SUM(r) AS BIGINT) AS er, "
        "CAST(COUNT(*) AS BIGINT) AS en FROM e, md "
        "WHERE day >= mid GROUP BY h), "
        "tot AS (SELECT CAST(SUM(er) AS BIGINT) AS o_r, "
        "CAST(SUM(en) AS BIGINT) AS o_n, "
        "CAST(SUM(er) AS DOUBLE) / CAST(SUM(en) AS DOUBLE) AS pbar "
        "FROM ev), "
        "ph AS (SELECT ev.h, ev.er, ev.en, "
        "CAST(COALESCE(tr.r, 0) + 1 AS DOUBLE) "
        "/ CAST(COALESCE(tr.n, 0) + 2 AS DOUBLE) AS p, "
        "CAST(ev.er AS DOUBLE) / CAST(ev.en AS DOUBLE) AS oh "
        "FROM ev LEFT JOIN tr USING (h)), "
        "tk AS (SELECT "
        "CAST(SUM(CAST(ROUND((CAST(er AS DOUBLE) * (1.0 - p) "
        "* (1.0 - p) + CAST(en - er AS DOUBLE) * p * p) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS bs, "
        "CAST(SUM(CAST(ROUND(CAST(en AS DOUBLE) * (p - oh) "
        "* (p - oh) * 1e9, 0) AS BIGINT)) AS BIGINT) AS rel, "
        "CAST(SUM(CAST(ROUND(CAST(en AS DOUBLE) * (oh - tot.pbar) "
        "* (oh - tot.pbar) * 1e9, 0) AS BIGINT)) AS BIGINT) AS res, "
        "CAST(SUM(CAST(ROUND(CAST(en AS DOUBLE) * ABS(p - oh) "
        "* 1e9, 0) AS BIGINT)) AS BIGINT) AS ece, "
        "CAST(SUM(CAST(ROUND(-(CAST(er AS DOUBLE) * LN(p) "
        "+ CAST(en - er AS DOUBLE) * LN(1.0 - p)) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS ll FROM ph, tot) "
        "SELECT tot.o_n AS n_eval, "
        "ROUND(CAST(tk.bs AS DOUBLE) / 1e9 "
        "/ CAST(tot.o_n AS DOUBLE), 6) AS brier, "
        "ROUND(CAST(tk.rel AS DOUBLE) / 1e9 "
        "/ CAST(tot.o_n AS DOUBLE), 6) AS reliability, "
        "ROUND(CAST(tk.res AS DOUBLE) / 1e9 "
        "/ CAST(tot.o_n AS DOUBLE), 6) AS resolution, "
        "ROUND(tot.pbar * (1.0 - tot.pbar), 6) AS uncertainty, "
        "ROUND(CAST(tk.ece AS DOUBLE) / 1e9 "
        "/ CAST(tot.o_n AS DOUBLE), 6) AS ece, "
        "ROUND(CAST(tk.ll AS DOUBLE) / 1e9 "
        "/ CAST(tot.o_n AS DOUBLE), 6) AS log_loss FROM tk, tot"
    )
    out["youden_threshold"] = (
        # exact integer J numerator over suffix counts of the
        # deci-cent histogram, smallest-theta ties -- mirrors
        # _q_youden_threshold
        "WITH p AS (SELECT CAST(ROUND(value * 10, 0) AS BIGINT) "
        "AS d10, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        "AS pos FROM events), "
        "h AS (SELECT d10, CAST(SUM(pos) AS BIGINT) AS p, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY d10), "
        "tt AS (SELECT CAST(SUM(p) AS BIGINT) AS n_pos, "
        "CAST(SUM(n - p) AS BIGINT) AS n_neg FROM h), "
        "c AS (SELECT d10, "
        "SUM(p) OVER (ORDER BY d10 DESC ROWS UNBOUNDED PRECEDING) "
        "AS tp, SUM(n - p) OVER (ORDER BY d10 DESC "
        "ROWS UNBOUNDED PRECEDING) AS fp FROM h), "
        "j AS (SELECT d10, tp, fp, "
        "tp * tt.n_neg - fp * tt.n_pos AS num FROM c, tt) "
        "SELECT d10 AS theta_d10, CAST(tp AS BIGINT) AS tp, "
        "CAST(fp AS BIGINT) AS fp, CAST(num AS BIGINT) AS j_num, "
        "ROUND(CAST(num AS DOUBLE) / (CAST(tt.n_pos AS DOUBLE) "
        "* CAST(tt.n_neg AS DOUBLE)), 6) AS youden_j "
        "FROM j, tt ORDER BY num DESC, d10 LIMIT 1"
    )
    out["overdispersion_panel"] = (
        # exact panel moments, one shared exp -- mirrors
        # _q_overdispersion_panel
        "WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 "
        "AS day FROM events), "
        "g AS (SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM e GROUP BY user_id, day), "
        "b AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u, "
        "CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS nd FROM e), "
        "s AS (SELECT CAST(SUM(k) AS BIGINT) AS t, "
        "CAST(SUM(k * k) AS BIGINT) AS s2, "
        "CAST(COUNT(*) AS BIGINT) AS nz FROM g), "
        "c AS (SELECT b.u * b.nd AS n_cells, "
        "b.u * b.nd - s.nz AS n0, "
        "CAST(s.t AS DOUBLE) / CAST(b.u * b.nd AS DOUBLE) AS m, "
        "CAST(s.s2 AS DOUBLE) / CAST(b.u * b.nd AS DOUBLE) AS m2 "
        "FROM b, s), "
        "v AS (SELECT n_cells, n0, m, m2 - m * m AS var, "
        "EXP(-m) AS p0 FROM c) "
        "SELECT n_cells, n0 AS n_zero, ROUND(m, 6) AS mean, "
        "ROUND(var, 6) AS variance, "
        "ROUND(m * m / (var - m), 6) AS nb_r, "
        "ROUND(m / var, 6) AS nb_p, "
        "ROUND((CAST(n0 AS DOUBLE) - CAST(n_cells AS DOUBLE) * p0) "
        "/ SQRT(CAST(n_cells AS DOUBLE) * p0 * (1.0 - p0) "
        "- CAST(n_cells AS DOUBLE) * m * p0 * p0), 6) AS zip_z "
        "FROM v"
    )
    out["taylors_law"] = (
        # 1e9-tick log mean/variance pairs, exact integer tick
        # regression -- mirrors _q_taylors_law
        "WITH e AS (SELECT user_id AS cell, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "g AS (SELECT cell, day, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM e GROUP BY cell, day), "
        "dd AS (SELECT CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS d "
        "FROM e), "
        "per AS (SELECT cell, CAST(SUM(k) AS BIGINT) AS s, "
        "CAST(SUM(k * k) AS BIGINT) AS q FROM g GROUP BY cell), "
        "top AS (SELECT cell, s, q FROM per ORDER BY s DESC, cell "
        "LIMIT 50), "
        "lg AS (SELECT CAST(ROUND(LN(CAST(s AS DOUBLE) "
        "/ CAST(dd.d AS DOUBLE)) * 1e9, 0) AS BIGINT) AS x, "
        "CAST(ROUND(LN(CAST(dd.d * q - s * s AS DOUBLE) "
        "/ (CAST(dd.d AS DOUBLE) * CAST(dd.d AS DOUBLE))) * 1e9, 0) "
        "AS BIGINT) AS y FROM top, dd "
        "WHERE s > 0 AND dd.d * q - s * s > 0), "
        "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
        "SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx, "
        "SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy FROM lg) "
        "SELECT CAST(n AS BIGINT) AS n_users, "
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_b FROM m"
    )
    out["allan_variance"] = (
        # exact integer bin-difference sums -- mirrors
        # _q_allan_variance
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xs), "
        "taus AS (SELECT * FROM (VALUES (1), (2), (4)) AS v(tau)), "
        "bins AS (SELECT taus.tau, xs.t // taus.tau AS b, "
        "CAST(SUM(xs.y) AS BIGINT) AS bs FROM xs, taus, nn "
        "WHERE xs.t < (nn.n // taus.tau) * taus.tau "
        "GROUP BY taus.tau, b), "
        "df AS (SELECT tau, bs - LAG(bs) OVER (PARTITION BY tau "
        "ORDER BY b) AS dv FROM bins), "
        "a AS (SELECT tau, CAST(SUM(dv * dv) AS BIGINT) AS num, "
        "CAST(COUNT(*) + 1 AS BIGINT) AS m FROM df "
        "WHERE dv IS NOT NULL GROUP BY tau) "
        "SELECT CAST(tau AS BIGINT) AS tau, m AS n_bins, "
        "num AS diff2_sum, "
        "ROUND(CAST(num AS DOUBLE) / (2.0 * CAST(m - 1 AS DOUBLE) "
        "* CAST(tau AS DOUBLE) * CAST(tau AS DOUBLE)), 6) "
        "AS allan_var FROM a ORDER BY tau"
    )
    out["mattr"] = _mattr_oracle_sql()
    out["rmst"] = (
        # area under the KM curve, 1-microsecond rectangle ticks --
        # mirrors _q_rmst (wraps the kaplan_meier oracle verbatim)
        "WITH km AS (SELECT * FROM (" + out["kaplan_meier"] + ")), "
        "seg AS (SELECT t_us, survival, "
        "COALESCE(LAG(t_us) OVER (ORDER BY t_us), 0) AS pt, "
        "COALESCE(LAG(survival) OVER (ORDER BY t_us), 1.0) AS ps "
        "FROM km), "
        "tk AS (SELECT CAST(SUM(CAST(ROUND(ps "
        "* CAST(t_us - pt AS DOUBLE), 0) AS BIGINT)) AS BIGINT) "
        "AS ticks FROM seg) "
        "SELECT (SELECT CAST(MAX(t_us) AS BIGINT) FROM km) AS tau_us, "
        "tk.ticks AS rmst_ticks, "
        "ROUND(CAST(tk.ticks AS DOUBLE) / 86400000000.0, 6) "
        "AS rmst_days FROM tk"
    )
    out["competing_risks"] = _competing_risks_oracle_sql()
    out["ks_uniform"] = (
        # exact integer CDF-deviation numerators -- mirrors
        # _q_ks_uniform
        "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) "
        "% 10000 AS k FROM events), "
        "c AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS m FROM p "
        "GROUP BY k), "
        "w AS (SELECT k, m, SUM(m) OVER (ORDER BY k) AS cum, "
        "SUM(m) OVER () AS n FROM c), "
        "d AS (SELECT GREATEST(ABS(cum * 10000 - n * k), "
        "ABS((cum - m) * 10000 - n * k)) AS num, n FROM w), "
        "mx AS (SELECT CAST(MAX(num) AS BIGINT) AS d_num, "
        "CAST(MAX(n) AS BIGINT) AS n FROM d) "
        "SELECT n, d_num, "
        "ROUND(CAST(d_num AS DOUBLE) / (CAST(n AS DOUBLE) "
        "* 10000.0), 6) AS ks_d, "
        "ROUND((CAST(d_num AS DOUBLE) / (CAST(n AS DOUBLE) "
        "* 10000.0)) * SQRT(CAST(n AS DOUBLE)), 6) AS ks_stat "
        "FROM mx"
    )
    out["ad_uniform"] = (
        # closed-form (2i-1) run sums x 1e9-tick logs (HUGEINT
        # accumulation) -- mirrors _q_ad_uniform
        "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) "
        "% 10000 AS k FROM events), "
        "c AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS m FROM p "
        "GROUP BY k), "
        "w AS (SELECT k, m, SUM(m) OVER (ORDER BY k) AS cum, "
        "SUM(m) OVER () AS n FROM c), "
        "t AS (SELECT "
        "CAST(cum * cum - (cum - m) * (cum - m) AS HUGEINT) "
        "* CAST(ROUND(LN(GREATEST(CAST(k AS DOUBLE), 0.5) "
        "/ 10000.0) * 1e9, 0) AS BIGINT) "
        "+ CAST((n - (cum - m)) * (n - (cum - m)) "
        "- (n - cum) * (n - cum) AS HUGEINT) "
        "* CAST(ROUND(LN(GREATEST(CAST(10000 - k AS DOUBLE), 0.5) "
        "/ 10000.0) * 1e9, 0) AS BIGINT) AS term, n FROM w), "
        "s AS (SELECT CAST(SUM(term) AS HUGEINT) AS total, "
        "CAST(MAX(n) AS BIGINT) AS n FROM t) "
        "SELECT n, "
        "ROUND(-CAST(n AS DOUBLE) - CAST(total AS DOUBLE) / 1e9 "
        "/ CAST(n AS DOUBLE), 6) AS a2 FROM s"
    )
    out["partition_conductance"] = (
        # exact integer cut/volume per Voronoi cluster over the
        # Chebyshev <= 8 proximity graph -- mirrors
        # _q_partition_conductance
        "WITH " + _VOR_SITES_SQL + ", "
        "ed AS MATERIALIZED (SELECT a.cell AS ca, a.li AS la, "
        "b.cell AS cb, b.li AS lb FROM asn a JOIN asn b "
        "ON a.cell < b.cell "
        "AND GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) <= 8), "
        "sym8 AS (SELECT ca AS c, la AS l FROM ed "
        "UNION ALL SELECT cb, lb FROM ed), "
        "dg AS (SELECT l, c, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM sym8 GROUP BY l, c), "
        "nm AS (SELECT li AS site, CAST(COUNT(*) AS BIGINT) AS nmem "
        "FROM asn GROUP BY li), "
        "vol AS (SELECT nm.site, nm.nmem, "
        "CAST(COALESCE((SELECT SUM(d) FROM dg WHERE dg.l = nm.site), "
        "0) AS BIGINT) AS volume FROM nm), "
        "vt AS (SELECT CAST(COALESCE(SUM(d), 0) AS BIGINT) AS v "
        "FROM dg), "
        "ct AS (SELECT vol.site, vol.nmem, vol.volume, "
        "CAST((SELECT COUNT(*) FROM ed WHERE (ed.la = vol.site) <> "
        "(ed.lb = vol.site)) AS BIGINT) AS cut FROM vol) "
        "SELECT CAST(site AS BIGINT) AS site, nmem AS n_members, "
        "cut, volume, "
        "CASE WHEN LEAST(volume, vt.v - volume) > 0 THEN "
        "ROUND(CAST(cut AS DOUBLE) "
        "/ CAST(LEAST(volume, vt.v - volume) AS DOUBLE), 6) "
        "ELSE NULL END AS conductance FROM ct, vt ORDER BY site"
    )
    out["global_transitivity"] = (
        # 3 x ordered-triple triangles over sum deg(deg-1)/2 --
        # mirrors _q_global_transitivity
        "WITH " + _WG_SQL + ", "
        "tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM e e1 "
        "JOIN e e2 ON e2.w1 = e1.w2 "
        "JOIN e e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2), "
        "tp AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS tr, "
        "CAST(COUNT(*) AS BIGINT) AS nv FROM deg) "
        "SELECT tp.nv AS n_nodes, tri.t AS n_triangles, "
        "tp.tr AS n_triples, "
        "ROUND(3.0 * CAST(tri.t AS DOUBLE) "
        "/ CAST(tp.tr AS DOUBLE), 6) AS transitivity FROM tri, tp"
    )
    out["neighbor_degree_profile"] = (
        # exact neighbor-degree sums per degree class -- mirrors
        # _q_neighbor_degree_profile
        "WITH " + _WG_SQL + ", "
        "nb AS (SELECT sym.w1 AS v, d2.d AS nd FROM sym "
        "JOIN deg d2 ON d2.w = sym.w2), "
        "pv AS (SELECT nb.v, MAX(dv.d) AS k, "
        "CAST(SUM(nb.nd) AS BIGINT) AS s FROM nb "
        "JOIN deg dv ON dv.w = nb.v GROUP BY nb.v) "
        "SELECT CAST(k AS BIGINT) AS degree, "
        "CAST(SUM(s) AS BIGINT) AS nbr_deg_sum, "
        "ROUND(CAST(SUM(s) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6) "
        "AS knn_k FROM pv GROUP BY k ORDER BY k"
    )
    out["randic_index"] = (
        # 1e9-tick per-edge connectivity terms -- mirrors
        # _q_randic_index
        "WITH " + _WG_SQL + ", "
        "et AS (SELECT CAST(ROUND(1.0 / SQRT(CAST(da.d * db.d "
        "AS DOUBLE)) * 1e9, 0) AS BIGINT) AS rt, "
        "CAST(ROUND(1.0 / SQRT(CAST(da.d + db.d AS DOUBLE)) "
        "* 1e9, 0) AS BIGINT) AS st FROM e "
        "JOIN deg da ON da.w = e.w1 JOIN deg db ON db.w = e.w2) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "ROUND(CAST(SUM(rt) AS DOUBLE) / 1e9, 6) AS randic, "
        "ROUND(CAST(SUM(st) AS DOUBLE) / 1e9, 6) "
        "AS sum_connectivity FROM et"
    )
    out["forecast_error_panel"] = (
        # exact integer error sums; 1e9-tick MAPE/sMAPE; pinball as
        # integer tenths -- mirrors _q_forecast_error_panel
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "df AS (SELECT y, py FROM (SELECT y, "
        "LAG(y) OVER (ORDER BY t) AS py FROM xs) WHERE py IS NOT "
        "NULL), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(ABS(y - py)) AS BIGINT) AS a, "
        "CAST(SUM((y - py) * (y - py)) AS BIGINT) AS sq, "
        "CAST(SUM(GREATEST(9 * (y - py), -(y - py))) AS BIGINT) "
        "AS pin10, CAST(SUM(py * py) AS BIGINT) AS dsq, "
        "CAST(SUM(CASE WHEN y > 0 THEN CAST(ROUND(ABS(y - py) "
        "/ CAST(y AS DOUBLE) * 1e9, 0) AS BIGINT) ELSE 0 END) "
        "AS BIGINT) AS mp, "
        "CAST(SUM(CASE WHEN y + py > 0 THEN CAST(ROUND(2.0 "
        "* ABS(y - py) / CAST(y + py AS DOUBLE) * 1e9, 0) "
        "AS BIGINT) ELSE 0 END) AS BIGINT) AS smp FROM df) "
        "SELECT n AS n_forecasts, "
        "ROUND(CAST(a AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mae, "
        "ROUND(SQRT(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)), 6) "
        "AS rmse, "
        "ROUND(CAST(mp AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) "
        "AS mape, "
        "ROUND(CAST(smp AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) "
        "AS smape, "
        "ROUND(CAST(pin10 AS DOUBLE) / 10.0 / CAST(n AS DOUBLE), 6) "
        "AS pinball_q90, "
        "ROUND(SQRT(CAST(sq AS DOUBLE) / CAST(dsq AS DOUBLE)), 6) "
        "AS theil_u2 FROM s"
    )
    out["winkler_interval"] = (
        # exact order-statistic interval from the train half, integer
        # tenths scores on the eval half -- mirrors
        "-- _q_winkler_interval\n"
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "nn AS (SELECT CAST(COUNT(*) // 2 AS BIGINT) AS mid FROM xs), "
        "tr AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn, "
        "COUNT(*) OVER () AS m FROM xs, nn WHERE t < nn.mid), "
        "w AS (SELECT "
        "(SELECT y FROM tr WHERE rn = (m + 9) // 10 LIMIT 1) AS lo, "
        "(SELECT y FROM tr WHERE rn = (9 * m + 9) // 10 LIMIT 1) "
        "AS hi FROM (SELECT DISTINCT m FROM tr)), "
        "ev AS (SELECT y FROM xs, nn WHERE t >= nn.mid), "
        "sc AS (SELECT CAST(SUM(10 * (w.hi - w.lo) "
        "+ CASE WHEN y < w.lo THEN 100 * (w.lo - y) "
        "WHEN y > w.hi THEN 100 * (y - w.hi) ELSE 0 END) AS BIGINT) "
        "AS total10, "
        "CAST(SUM(CASE WHEN y >= w.lo AND y <= w.hi THEN 1 ELSE 0 "
        "END) AS BIGINT) AS ncov, CAST(COUNT(*) AS BIGINT) AS ne "
        "FROM ev, w) "
        "SELECT w.lo AS q10_c, w.hi AS q90_c, sc.ne AS n_eval, "
        "sc.ncov AS n_covered, "
        "ROUND(CAST(sc.total10 AS DOUBLE) / 10.0 "
        "/ CAST(sc.ne AS DOUBLE), 6) AS mean_score FROM sc, w"
    )
    out["multi_otsu"] = (
        # exhaustive two-threshold search, exact integer prefix
        # moments, pinned float criterion -- mirrors _q_multi_otsu
        f"WITH g AS ({_OG_GRID_SQL}), "
        "vv AS (SELECT CAST(ROUND(z * 10, 0) AS BIGINT) AS v FROM g "
        "WHERE z > -1e30), "
        "h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM vv "
        "GROUP BY v), "
        "p AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cn, "
        "SUM(v * n) OVER (ORDER BY v) AS cs FROM h), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, "
        "CAST(SUM(v * n) AS BIGINT) AS st FROM h), "
        "cand AS (SELECT a.v AS t1, b.v AS t2, "
        "CAST(a.cs AS DOUBLE) * CAST(a.cs AS DOUBLE) "
        "/ CAST(a.cn AS DOUBLE) "
        "+ CAST(b.cs - a.cs AS DOUBLE) * CAST(b.cs - a.cs AS DOUBLE) "
        "/ CAST(b.cn - a.cn AS DOUBLE) "
        "+ CAST(t.st - b.cs AS DOUBLE) * CAST(t.st - b.cs AS DOUBLE) "
        "/ CAST(t.nt - b.cn AS DOUBLE) AS crit "
        "FROM p a JOIN p b ON b.v > a.v, t WHERE b.cn < t.nt) "
        "SELECT t1 AS t1_deci, t2 AS t2_deci, "
        "ROUND(crit, 6) AS criterion FROM cand "
        "ORDER BY crit DESC, t1, t2 LIMIT 1"
    )
    out["hu_moments"] = (
        # exact raw moments from the formula pixels, n-scaled central
        # moments, pinned eta chains -- mirrors _q_hu_moments
        "WITH px AS (SELECT i.range AS i, r.range AS r, c.range AS c, "
        "(r.range * 73 + c.range * 31 + i.range * 17) % 256 AS v "
        "FROM range(0, 8) i, range(0, 32) r, range(0, 32) c), "
        "m AS (SELECT i, CAST(SUM(v) AS BIGINT) AS m00, "
        "CAST(SUM(r * v) AS BIGINT) AS m10, "
        "CAST(SUM(c * v) AS BIGINT) AS m01, "
        "CAST(SUM(r * r * v) AS BIGINT) AS m20, "
        "CAST(SUM(c * c * v) AS BIGINT) AS m02, "
        "CAST(SUM(r * c * v) AS BIGINT) AS m11 FROM px GROUP BY i), "
        "mu AS (SELECT i, m00 * m20 - m10 * m10 AS mu20, "
        "m00 * m02 - m01 * m01 AS mu02, "
        "m00 * m11 - m10 * m01 AS mu11, "
        "CAST(m00 AS DOUBLE) * CAST(m00 AS DOUBLE) "
        "* CAST(m00 AS DOUBLE) AS den FROM m), "
        "e AS (SELECT i, CAST(mu20 AS DOUBLE) / den AS e20, "
        "CAST(mu02 AS DOUBLE) / den AS e02, "
        "CAST(mu11 AS DOUBLE) / den AS e11 FROM mu) "
        "SELECT 'm' || CAST(i AS VARCHAR) AS media_id, "
        "ROUND(e20 + e02, 6) AS h1, "
        "ROUND((e20 - e02) * (e20 - e02) + 4.0 * e11 * e11, 6) AS h2, "
        "ROUND(e20 * e02 - e11 * e11, 6) AS h3 "
        "FROM e ORDER BY media_id"
    )
    out["radon_projections"] = (
        # exact lattice-angle index sums, smallest-bin argmax ties --
        # mirrors _q_radon_projections
        "WITH e AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy FROM events), "
        "b AS (SELECT 0 AS angle, gx AS bin FROM e "
        "UNION ALL SELECT 90, gy FROM e "
        "UNION ALL SELECT 45, gx + gy FROM e "
        "UNION ALL SELECT 135, gx - gy + 95 FROM e), "
        "a AS (SELECT angle, bin, CAST(COUNT(*) AS BIGINT) AS mass "
        "FROM b GROUP BY angle, bin), "
        "best AS (SELECT angle, bin, mass, ROW_NUMBER() OVER "
        "(PARTITION BY angle ORDER BY mass DESC, bin) AS rn FROM a) "
        "SELECT CAST(angle AS BIGINT) AS angle, "
        "CAST(bin AS BIGINT) AS argmax_bin, mass AS max_mass, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS total "
        "FROM best WHERE rn = 1 ORDER BY angle"
    )
    out["goertzel_tones"] = _goertzel_oracle_sql()
    out["mondrian_partition"] = _mondrian_oracle_sql()
    out["diff_in_diff"] = (
        # four exact cell means, one float chain -- mirrors
        # _q_diff_in_diff
        "WITH e AS (SELECT "
        f"({_mx('user_id', 61)}) % 2 AS arm, "
        "epoch_us(ts) // 86400000000 AS day, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "md AS (SELECT day AS mid FROM (SELECT day, "
        "ROW_NUMBER() OVER (ORDER BY day) - 1 AS r FROM "
        "(SELECT DISTINCT day FROM e)) WHERE r = "
        "(SELECT COUNT(DISTINCT day) FROM e) // 2), "
        "cells AS (SELECT arm, CASE WHEN e.day < md.mid THEN 0 "
        "ELSE 1 END AS p, CAST(SUM(c) AS BIGINT) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e, md GROUP BY 1, 2), "
        "mu AS (SELECT arm, p, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
        "AS m FROM cells) "
        "SELECT "
        "ROUND((SELECT m FROM mu WHERE arm = 0 AND p = 0), 6) "
        "AS mu_ctrl_pre, "
        "ROUND((SELECT m FROM mu WHERE arm = 0 AND p = 1), 6) "
        "AS mu_ctrl_post, "
        "ROUND((SELECT m FROM mu WHERE arm = 1 AND p = 0), 6) "
        "AS mu_treat_pre, "
        "ROUND((SELECT m FROM mu WHERE arm = 1 AND p = 1), 6) "
        "AS mu_treat_post, "
        "ROUND(((SELECT m FROM mu WHERE arm = 1 AND p = 1) "
        "- (SELECT m FROM mu WHERE arm = 1 AND p = 0)) "
        "- ((SELECT m FROM mu WHERE arm = 0 AND p = 1) "
        "- (SELECT m FROM mu WHERE arm = 0 AND p = 0)), 6) "
        "AS did_cents"
    )
    out["cuped_adjustment"] = (
        # n-scaled exact covariance moments -- mirrors
        # _q_cuped_adjustment
        "WITH e AS (SELECT user_id, "
        "epoch_us(ts) // 86400000000 AS day, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "g AS (SELECT user_id, day, CAST(SUM(c) AS BIGINT) AS s "
        "FROM e GROUP BY user_id, day), "
        "md AS (SELECT day AS mid FROM (SELECT day, "
        "ROW_NUMBER() OVER (ORDER BY day) - 1 AS r FROM "
        "(SELECT DISTINCT day FROM g)) WHERE r = "
        "(SELECT COUNT(DISTINCT day) FROM g) // 2), "
        "per AS (SELECT user_id, "
        "CAST(SUM(CASE WHEN g.day < md.mid THEN s ELSE 0 END) "
        "AS BIGINT) AS x, "
        "CAST(SUM(CASE WHEN g.day >= md.mid THEN s ELSE 0 END) "
        "AS BIGINT) AS y FROM g, md GROUP BY user_id), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(x * x) AS HUGEINT) AS sxx, "
        "CAST(SUM(y * y) AS HUGEINT) AS syy, "
        "CAST(SUM(x * y) AS HUGEINT) AS sxy FROM per) "
        "SELECT n AS n_users, "
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta, "
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
        "* CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ (CAST(n * sxx - sx * sx AS DOUBLE) "
        "* CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho2, "
        "ROUND(1.0 - CAST(n * sxy - sx * sy AS DOUBLE) "
        "* CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ (CAST(n * sxx - sx * sx AS DOUBLE) "
        "* CAST(n * syy - sy * sy AS DOUBLE)), 6) "
        "AS var_reduction FROM m"
    )
    out["cross_variogram"] = (
        # exact integer cross-product sums over both axes -- mirrors
        # _q_cross_variogram
        "WITH " + _GRID2_SQL + ", "
        "pr AS (SELECT lg.h, (b.n - a.n) * (b.y - a.y) AS xy "
        "FROM lg, dn a JOIN dn b ON b.gx = a.gx "
        "AND b.gy = a.gy + lg.h "
        "UNION ALL SELECT lg.h, (b.n - a.n) * (b.y - a.y) "
        "FROM lg, dn a JOIN dn b ON b.gy = a.gy "
        "AND b.gx = a.gx + lg.h) "
        "SELECT CAST(h AS BIGINT) AS lag, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(xy) AS BIGINT) AS cross_sum, "
        "ROUND(CAST(SUM(xy) AS DOUBLE) "
        "/ (2.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS gamma_xy "
        "FROM pr GROUP BY h ORDER BY h"
    )
    out["madogram_lags"] = (
        # exact integer absolute-difference sums -- mirrors
        # _q_madogram_lags
        "WITH " + _GRID2_SQL + ", "
        "pr AS (SELECT lg.h, ABS(b.y - a.y) AS ad "
        "FROM lg, dn a JOIN dn b ON b.gx = a.gx "
        "AND b.gy = a.gy + lg.h "
        "UNION ALL SELECT lg.h, ABS(b.y - a.y) "
        "FROM lg, dn a JOIN dn b ON b.gy = a.gy "
        "AND b.gx = a.gx + lg.h) "
        "SELECT CAST(h AS BIGINT) AS lag, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(ad) AS BIGINT) AS abs_sum, "
        "ROUND(CAST(SUM(ad) AS DOUBLE) "
        "/ (2.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS gamma1 "
        "FROM pr GROUP BY h ORDER BY h"
    )
    out["fellegi_sunter_weights"] = (
        # C(c,2) closed-form pair counts per field, exact m/u
        # rationals, one pinned log2 per field -- mirrors
        # _q_fellegi_sunter_weights
        "WITH d AS (SELECT source, lang, n_chars // 200 AS dec "
        "FROM documents), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d), "
        "mp AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS m "
        "FROM (SELECT COUNT(*) AS c FROM d GROUP BY source)), "
        "tp AS (SELECT CAST(n * (n - 1) // 2 AS BIGINT) AS t FROM n), "
        "am AS (SELECT 'lang' AS field, "
        "CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS a FROM "
        "(SELECT COUNT(*) AS c FROM d GROUP BY source, lang) "
        "UNION ALL SELECT 'len_decile', "
        "CAST(SUM(c * (c - 1) // 2) AS BIGINT) FROM "
        "(SELECT COUNT(*) AS c FROM d GROUP BY source, dec)), "
        "aa AS (SELECT 'lang' AS field, "
        "CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS a FROM "
        "(SELECT COUNT(*) AS c FROM d GROUP BY lang) "
        "UNION ALL SELECT 'len_decile', "
        "CAST(SUM(c * (c - 1) // 2) AS BIGINT) FROM "
        "(SELECT COUNT(*) AS c FROM d GROUP BY dec)) "
        "SELECT am.field, am.a AS agree_match, "
        "CAST(aa.a - am.a AS BIGINT) AS agree_nonmatch, "
        "ROUND(CAST(am.a AS DOUBLE) / CAST(mp.m AS DOUBLE), 6) "
        "AS m_prob, "
        "ROUND(CAST(aa.a - am.a AS DOUBLE) "
        "/ CAST(tp.t - mp.m AS DOUBLE), 6) AS u_prob, "
        "ROUND(LOG2((CAST(am.a AS DOUBLE) / CAST(mp.m AS DOUBLE)) "
        "/ (CAST(aa.a - am.a AS DOUBLE) "
        "/ CAST(tp.t - mp.m AS DOUBLE))), 6) AS log2_weight "
        "FROM am JOIN aa USING (field), mp, tp, n ORDER BY am.field"
    )
    out["blocking_quality"] = (
        # (lang, decile) blocking; closed-form pair counts --
        # mirrors _q_blocking_quality
        "WITH d AS (SELECT source, lang || '-' || "
        "CAST(n_chars // 200 AS VARCHAR) AS blk FROM documents), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d), "
        "bt AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS cp, "
        "CAST(COUNT(*) AS BIGINT) AS nb FROM "
        "(SELECT COUNT(*) AS c FROM d GROUP BY blk)), "
        "mt AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS m "
        "FROM (SELECT COUNT(*) AS c FROM d GROUP BY source)), "
        "jt AS (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS mib "
        "FROM (SELECT COUNT(*) AS c FROM d GROUP BY source, blk)) "
        "SELECT bt.nb AS n_blocks, bt.cp AS cand_pairs, "
        "mt.m AS match_pairs, "
        "ROUND(1.0 - CAST(bt.cp AS DOUBLE) "
        "/ CAST(n.n * (n.n - 1) // 2 AS DOUBLE), 6) "
        "AS reduction_ratio, "
        "ROUND(CAST(jt.mib AS DOUBLE) / CAST(mt.m AS DOUBLE), 6) "
        "AS pair_completeness FROM bt, mt, jt, n"
    )
    out["spell_correct"] = (
        # deterministic misspellings, LEVENSHTEIN = 1 candidates
        # scored by unigram frequency -- mirrors _q_spell_correct
        "WITH w AS (SELECT list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "tok AS (SELECT unnest(ws) AS t FROM w), "
        "tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tok GROUP BY t), "
        "lw AS (SELECT t AS w, ROW_NUMBER() OVER "
        "(ORDER BY LEN(t) DESC, t) AS rn FROM tf), "
        "pr AS (SELECT substr(w, 1, CAST(LEN(w) // 2 AS INTEGER)) "
        "|| (CASE WHEN substr(w, CAST(LEN(w) // 2 AS INTEGER) + 1, 1) "
        "<> 'q' THEN 'q' ELSE 'z' END) "
        "|| substr(w, CAST(LEN(w) // 2 AS INTEGER) + 2) AS probe "
        "FROM lw WHERE rn <= 5), "
        "cand AS (SELECT pr.probe, tf.t AS w, tf.c FROM pr "
        "JOIN tf ON LEVENSHTEIN(pr.probe, tf.t) = 1), "
        "best AS (SELECT probe, w, c, ROW_NUMBER() OVER "
        "(PARTITION BY probe ORDER BY c DESC, w) AS rn, "
        "COUNT(*) OVER (PARTITION BY probe) AS nc FROM cand) "
        "SELECT probe, w AS correction, c AS freq, "
        "CAST(nc AS BIGINT) AS n_candidates FROM best WHERE rn = 1"
    )
    out["time_decay_attribution"] = (
        # per-pair 1e9-tick decayed weights quantized BEFORE the
        # per-conversion normalization (order-free) -- mirrors
        # _q_time_decay_attribution
        "WITH e AS (SELECT user_id, epoch_us(ts) AS ts, "
        "event_id AS eid, event_type AS t FROM events), "
        "p AS (SELECT user_id, ts, eid FROM e "
        "WHERE t = 'purchase'), "
        "tc AS (SELECT user_id, ts, eid, t FROM e "
        "WHERE t IN ('click', 'view', 'signup')), "
        "pairs AS (SELECT p.user_id, p.eid AS peid, tc.t AS c, "
        "CAST(ROUND(EXP(-CAST(p.ts - tc.ts AS DOUBLE) "
        f"/ {float(_TDECAY_HL_US)} * LN(2.0)) * 1e9, 0) AS BIGINT) "
        "AS w9 FROM p JOIN tc ON tc.user_id = p.user_id "
        "AND (tc.ts < p.ts OR (tc.ts = p.ts AND tc.eid < p.eid))), "
        "tot AS (SELECT user_id, peid, CAST(SUM(w9) AS BIGINT) "
        "AS tw FROM pairs GROUP BY user_id, peid), "
        "sh AS (SELECT pairs.c, CAST(ROUND(CAST(pairs.w9 AS DOUBLE) "
        "/ CAST(tot.tw AS DOUBLE) * 1e9, 0) AS BIGINT) AS t9 "
        "FROM pairs JOIN tot USING (user_id, peid) "
        "WHERE tot.tw > 0) "
        "SELECT c AS channel, "
        "ROUND(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) AS credit "
        "FROM sh GROUP BY c ORDER BY c"
    )
    out["chaikin_smooth"] = (
        # exact integer sixteenths through two unrolled corner-cut
        # passes -- mirrors _q_chaikin_smooth
        "WITH uc AS (SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id), "
        "top1 AS (SELECT user_id FROM uc ORDER BY n DESC, user_id "
        "LIMIT 1), "
        "fx AS (SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 "
        "AS i, (event_id % 96) * 16 AS x, "
        "((event_id // 96) % 96) * 16 AS y FROM events "
        "WHERE user_id = (SELECT user_id FROM top1)), "
        "s0 AS MATERIALIZED (SELECT i, x, y FROM fx WHERE i < 12), "
        "s1 AS MATERIALIZED ("
        "SELECT 0 AS i, x, y FROM s0 WHERE i = 0 "
        "UNION ALL SELECT 1 + 2 * a.i, (3 * a.x + b.x) // 4, "
        "(3 * a.y + b.y) // 4 FROM s0 a JOIN s0 b ON b.i = a.i + 1 "
        "UNION ALL SELECT 2 + 2 * a.i, (a.x + 3 * b.x) // 4, "
        "(a.y + 3 * b.y) // 4 FROM s0 a JOIN s0 b ON b.i = a.i + 1 "
        "UNION ALL SELECT (SELECT 2 * MAX(i) + 1 FROM s0), x, y "
        "FROM s0 WHERE i = (SELECT MAX(i) FROM s0)), "
        "s2 AS ("
        "SELECT 0 AS i, x, y FROM s1 WHERE i = 0 "
        "UNION ALL SELECT 1 + 2 * a.i, (3 * a.x + b.x) // 4, "
        "(3 * a.y + b.y) // 4 FROM s1 a JOIN s1 b ON b.i = a.i + 1 "
        "UNION ALL SELECT 2 + 2 * a.i, (a.x + 3 * b.x) // 4, "
        "(a.y + 3 * b.y) // 4 FROM s1 a JOIN s1 b ON b.i = a.i + 1 "
        "UNION ALL SELECT (SELECT 2 * MAX(i) + 1 FROM s1), x, y "
        "FROM s1 WHERE i = (SELECT MAX(i) FROM s1)) "
        "SELECT CAST(i AS BIGINT) AS i, CAST(x AS BIGINT) AS x16, "
        "CAST(y AS BIGINT) AS y16 FROM s2 ORDER BY i"
    )
    out["sinkhorn_ot"] = _sinkhorn_oracle_sql()
    out["procrustes_2d"] = (
        # rank-paired n-scaled centered cross moments, one float
        # chain -- mirrors _q_procrustes_2d
        "WITH uc AS (SELECT user_id, COUNT(*) AS n FROM events "
        "GROUP BY user_id), "
        "t2 AS (SELECT user_id, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, user_id) AS rk FROM uc "
        "ORDER BY n DESC, user_id LIMIT 2), "
        "fx AS (SELECT t2.rk, ROW_NUMBER() OVER (PARTITION BY t2.rk "
        "ORDER BY e.ts, e.event_id) AS rn, "
        "(e.event_id % 96) AS x, ((e.event_id // 96) % 96) AS y "
        "FROM events e JOIN t2 ON t2.user_id = e.user_id), "
        "f1 AS (SELECT rn, x, y FROM fx WHERE rk = 1 AND rn <= 12), "
        "f2 AS (SELECT rn, x, y FROM fx WHERE rk = 2 AND rn <= 12), "
        "m1 AS (SELECT CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(y) AS BIGINT) AS sy FROM f1), "
        "m2 AS (SELECT CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(y) AS BIGINT) AS sy FROM f2), "
        "cm AS (SELECT 12 * a.x - m1.sx AS x1, "
        "12 * a.y - m1.sy AS y1, 12 * b.x - m2.sx AS x2, "
        "12 * b.y - m2.sy AS y2 FROM f1 a JOIN f2 b ON b.rn = a.rn, "
        "m1, m2), "
        "s AS (SELECT CAST(SUM(x1 * x2) AS BIGINT) AS sxx, "
        "CAST(SUM(y1 * y2) AS BIGINT) AS syy, "
        "CAST(SUM(x1 * y2) AS BIGINT) AS sxy, "
        "CAST(SUM(y1 * x2) AS BIGINT) AS syx, "
        "CAST(SUM(x1 * x1 + y1 * y1) AS BIGINT) AS s1, "
        "CAST(SUM(x2 * x2 + y2 * y2) AS BIGINT) AS s2 FROM cm) "
        "SELECT CAST(12 AS BIGINT) AS n_points, "
        "CAST(sxx + syy AS BIGINT) AS trace_sum, "
        "CAST(sxy - syx AS BIGINT) AS skew_diff, "
        "ROUND((CAST(sxx + syy AS DOUBLE) * CAST(sxx + syy AS DOUBLE) "
        "+ CAST(sxy - syx AS DOUBLE) * CAST(sxy - syx AS DOUBLE)) "
        "/ (CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)), 6) "
        "AS congruence_r2 FROM s"
    )
    out["largest_empty_circle"] = (
        # exact integer maximin distance on the lattice -- mirrors
        # _q_largest_empty_circle
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, COUNT(*) AS n FROM events GROUP BY 1), "
        "t20 AS (SELECT cell, cell % 96 AS x, cell // 96 AS y "
        "FROM cc ORDER BY n DESC, cell LIMIT 20), "
        "g AS (SELECT a.range AS x, b.range AS y "
        "FROM range(0, 96) a, range(0, 96) b), "
        "md AS (SELECT g.x, g.y, MIN((g.x - t20.x) * (g.x - t20.x) "
        "+ (g.y - t20.y) * (g.y - t20.y)) AS d2 FROM g, t20 "
        "GROUP BY g.x, g.y) "
        "SELECT CAST(x AS BIGINT) AS center_x, "
        "CAST(y AS BIGINT) AS center_y, CAST(d2 AS BIGINT) AS min_d2 "
        "FROM md ORDER BY d2 DESC, x + y * 96 LIMIT 1"
    )
    out["box_cox_scan"] = (
        # per-distinct 1e6-tick transforms, HUGEINT tick moments,
        # pinned LL chain -- mirrors _q_box_cox_scan
        "WITH h AS (SELECT CAST(ROUND(l_extendedprice * 100, 0) "
        "AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS m "
        "FROM lineitem GROUP BY 1), "
        "nn AS (SELECT CAST(SUM(m) AS BIGINT) AS n, "
        "CAST(SUM(m * CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1e6, 0) "
        "AS BIGINT)) AS BIGINT) AS lnt FROM h), "
        "lam AS (SELECT * FROM (VALUES (-10), (-5), (0), (5), (10)) "
        "AS v(l10)), "
        "zt AS (SELECT lam.l10, h.m, CASE WHEN lam.l10 = 0 THEN "
        "CAST(ROUND(LN(CAST(h.c AS DOUBLE)) * 1e6, 0) AS BIGINT) "
        "ELSE CAST(ROUND((POWER(CAST(h.c AS DOUBLE), "
        "CAST(lam.l10 AS DOUBLE) / 10.0) - 1.0) "
        "/ (CAST(lam.l10 AS DOUBLE) / 10.0) * 1e6, 0) AS BIGINT) "
        "END AS z FROM lam, h), "
        "mo AS (SELECT l10, CAST(SUM(z * m) AS HUGEINT) AS s1, "
        "SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT) "
        "* CAST(m AS HUGEINT)) AS s2 FROM zt GROUP BY l10), "
        "ll AS (SELECT l10, -CAST(nn.n AS DOUBLE) / 2.0 "
        "* LN((CAST(s2 AS DOUBLE) / CAST(nn.n AS DOUBLE) "
        "- (CAST(s1 AS DOUBLE) / CAST(nn.n AS DOUBLE)) "
        "* (CAST(s1 AS DOUBLE) / CAST(nn.n AS DOUBLE))) / 1e12) "
        "+ (CAST(l10 AS DOUBLE) / 10.0 - 1.0) "
        "* (CAST(nn.lnt AS DOUBLE) / 1e6) AS ll FROM mo, nn), "
        "bk AS (SELECT l10 FROM ll ORDER BY ll DESC, l10 LIMIT 1) "
        "SELECT CAST(ll.l10 AS BIGINT) AS lambda_x10, "
        "ROUND(ll.ll, 6) AS log_lik, "
        "CAST(CASE WHEN ll.l10 = bk.l10 THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_best FROM ll, bk ORDER BY ll.l10"
    )
    out["quantile_mapping"] = (
        # quantile_disc-rule empirical CDF matching -- mirrors
        "-- _q_quantile_mapping\n"
        "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) "
        f"AS c, ({_mx('user_id', 41)}) % 2 AS arm FROM events), "
        "ha AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "WHERE arm = 0 GROUP BY c), "
        "hb AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM p "
        "WHERE arm = 1 GROUP BY c), "
        "ca AS (SELECT c, n, SUM(n) OVER (ORDER BY c) AS cum "
        "FROM ha), "
        "cb AS (SELECT c, n, SUM(n) OVER (ORDER BY c) AS cum "
        "FROM hb), "
        "tt AS (SELECT (SELECT SUM(n) FROM ha) AS na, "
        "(SELECT SUM(n) FROM hb) AS nb), "
        "t10 AS (SELECT c, n, cum FROM cb ORDER BY n DESC, c "
        "LIMIT 10), "
        "mp AS (SELECT t10.c AS b_cents, t10.n AS b_count, "
        "(SELECT MIN(ca.c) FROM ca WHERE ca.cum >= "
        "LEAST(GREATEST((t10.cum * tt.na + tt.nb - 1) // tt.nb, 1), "
        "tt.na)) "
        "AS mapped FROM t10, tt) "
        "SELECT b_cents, b_count, "
        "CAST(mapped AS BIGINT) AS mapped_a_cents FROM mp "
        "ORDER BY b_count DESC, b_cents"
    )
    out["trimmed_mean"] = (
        # exact element-selection trim bounds with boundary partial
        # counts -- mirrors _q_trimmed_mean
        "WITH h AS (SELECT CAST(ROUND(l_extendedprice * 100, 0) "
        "AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS m "
        "FROM lineitem GROUP BY 1), "
        "w AS (SELECT c, m, SUM(m) OVER (ORDER BY c) AS cum FROM h), "
        "nn AS (SELECT CAST(SUM(m) AS BIGINT) AS n, "
        "CAST(SUM(c * m) AS BIGINT) AS tot FROM h), "
        "kk AS (SELECT n // 10 AS k FROM nn), "
        "lo AS (SELECT MIN(c) AS v FROM w, kk WHERE cum >= kk.k + 1), "
        "hi AS (SELECT MIN(c) AS v FROM w, nn, kk "
        "WHERE cum >= nn.n - kk.k), "
        "parts AS (SELECT "
        "(SELECT CAST(COALESCE(SUM(c * m), 0) AS BIGINT) FROM h, lo "
        "WHERE c < lo.v) AS below, "
        "(SELECT CAST(COALESCE(SUM(c * m), 0) AS BIGINT) FROM h, hi "
        "WHERE c > hi.v) AS above, "
        "(SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) FROM h, lo "
        "WHERE c < lo.v) AS nbelow, "
        "(SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) FROM h, hi "
        "WHERE c <= hi.v) AS nthru) "
        "SELECT nn.n, kk.k AS k_trim, "
        "CAST(nn.tot - parts.below - parts.above "
        "- (kk.k - parts.nbelow) * lo.v "
        "- (parts.nthru - (nn.n - kk.k)) * hi.v AS BIGINT) "
        "AS kept_sum, "
        "ROUND(CAST(nn.tot - parts.below - parts.above "
        "- (kk.k - parts.nbelow) * lo.v "
        "- (parts.nthru - (nn.n - kk.k)) * hi.v AS DOUBLE) "
        "/ CAST(nn.n - 2 * kk.k AS DOUBLE), 6) AS trimmed_mean "
        "FROM nn, kk, parts, lo, hi"
    )
    out["huber_location"] = _huber_oracle_sql()
    out["rosner_esd"] = _rosner_oracle_sql()
    out["cooks_distance"] = (
        # exact moment-based residuals/leverage, 1e3-tick SSE,
        # pinned D chain -- mirrors _q_cooks_distance
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(t * t) AS BIGINT) AS sxx, "
        "CAST(SUM(t * y) AS BIGINT) AS sxy FROM xs), "
        "mm AS (SELECT n, sx, sy, n * sxx - sx * sx AS cc, "
        "n * sxy - sx * sy AS bb FROM m), "
        "eh AS (SELECT xs.t, "
        "CAST(xs.y AS DOUBLE) - (CAST(mm.sy AS DOUBLE) "
        "/ CAST(mm.n AS DOUBLE) + CAST(mm.bb AS DOUBLE) "
        "/ CAST(mm.cc AS DOUBLE) * (CAST(xs.t AS DOUBLE) "
        "- CAST(mm.sx AS DOUBLE) / CAST(mm.n AS DOUBLE))) AS e, "
        "1.0 / CAST(mm.n AS DOUBLE) "
        "+ (CAST(xs.t AS DOUBLE) - CAST(mm.sx AS DOUBLE) "
        "/ CAST(mm.n AS DOUBLE)) * (CAST(xs.t AS DOUBLE) "
        "- CAST(mm.sx AS DOUBLE) / CAST(mm.n AS DOUBLE)) "
        "* CAST(mm.n AS DOUBLE) / CAST(mm.cc AS DOUBLE) AS h "
        "FROM xs, mm), "
        "ss AS (SELECT CAST(SUM(CAST(ROUND(e * e * 1e3, 0) "
        "AS BIGINT)) AS BIGINT) AS sset FROM eh), "
        "s2 AS (SELECT CAST(sset AS DOUBLE) / 1e3 "
        "/ CAST((SELECT n - 2 FROM mm) AS DOUBLE) AS s2 FROM ss), "
        "dd AS (SELECT eh.t, eh.e * eh.e * eh.h "
        "/ (2.0 * s2.s2 * (1.0 - eh.h) * (1.0 - eh.h)) AS d, "
        "eh.h FROM eh, s2) "
        "SELECT CAST(t AS BIGINT) AS t, ROUND(d, 6) AS cooks_d, "
        "ROUND(h, 6) AS leverage FROM dd "
        "ORDER BY d DESC, t LIMIT 5"
    )
    out["gev_lmoments"] = (
        # hockey-stick L-moment sums, shared 8-term gamma product,
        # pinned Hosking chain -- mirrors _q_gev_lmoments
        "WITH mx AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "CAST(MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS x FROM events GROUP BY 1), "
        "rk AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) - 1 AS i "
        "FROM mx), "
        "b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(x) AS BIGINT) AS b0, "
        "CAST(SUM(i * x) AS BIGINT) AS b1, "
        "CAST(SUM(i * (i - 1) * x) AS BIGINT) AS b2 FROM rk), "
        "lm AS (SELECT n, "
        "CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l1, "
        "2.0 * CAST(b1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) "
        "- CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l2, "
        "6.0 * CAST(b2 AS DOUBLE) "
        "/ CAST(n * (n - 1) * (n - 2) AS DOUBLE) "
        "- 6.0 * CAST(b1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) "
        "+ CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l3 FROM b), "
        "kk AS (SELECT n, l1, l2, l3 / l2 AS t3, "
        "7.8590 * (2.0 / (3.0 + l3 / l2) - LN(2.0) / LN(3.0)) "
        "+ 2.9554 * (2.0 / (3.0 + l3 / l2) - LN(2.0) / LN(3.0)) "
        "* (2.0 / (3.0 + l3 / l2) - LN(2.0) / LN(3.0)) AS k "
        "FROM lm), "
        "gg AS (SELECT kk.*, "
        "1.0 * (1.0 / (1.0 + k)) * EXP(k / 1.0) "
        "* (2.0 / (2.0 + k)) * EXP(k / 2.0) "
        "* (3.0 / (3.0 + k)) * EXP(k / 3.0) "
        "* (4.0 / (4.0 + k)) * EXP(k / 4.0) "
        "* (5.0 / (5.0 + k)) * EXP(k / 5.0) "
        "* (6.0 / (6.0 + k)) * EXP(k / 6.0) "
        "* (7.0 / (7.0 + k)) * EXP(k / 7.0) "
        "* (8.0 / (8.0 + k)) * EXP(k / 8.0) "
        "* EXP(-0.5772156649015329 * k) AS g FROM kk), "
        "sg AS (SELECT gg.*, l2 * k "
        "/ ((1.0 - POWER(2.0, -k)) * g) AS sigma FROM gg) "
        "SELECT CAST(n AS BIGINT) AS n_days, ROUND(l1, 6) AS l1, "
        "ROUND(l2, 6) AS l2, ROUND(t3, 6) AS t3, "
        "ROUND(k, 6) AS gev_k, ROUND(sigma, 6) AS gev_sigma, "
        "ROUND(l1 - sigma * (g - 1.0) / k, 6) AS gev_mu FROM sg"
    )
    out["repair_compress"] = _repair_oracle_sql()
    out["mtf_transform"] = _mtf_oracle_sql()
    out["dpp_map_greedy"] = _dpp_oracle_sql()
    out["top_trading_cycles"] = _ttc_oracle_sql()
    out["newsvendor"] = (
        # exact 0.75 order statistic + integer histogram sums --
        "-- mirrors _q_newsvendor\n"
        "WITH p AS (SELECT epoch_us(ts) // 86400000000 AS d "
        "FROM events WHERE event_type = 'purchase'), "
        "c0 AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS y FROM p "
        "GROUP BY d), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT COALESCE(c0.y, 0) AS y "
        "FROM fr LEFT JOIN c0 USING (d)), "
        "r AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn, "
        "COUNT(*) OVER () AS n FROM xs), "
        "qq AS (SELECT y AS q, n FROM r "
        "WHERE rn = (3 * n + 3) // 4 LIMIT 1), "
        "s AS (SELECT CAST(SUM(GREATEST(xs.y - qq.q, 0)) AS BIGINT) "
        "AS und, CAST(SUM(GREATEST(qq.q - xs.y, 0)) AS BIGINT) "
        "AS ovr, MAX(qq.q) AS q, MAX(qq.n) AS n FROM xs, qq) "
        "SELECT CAST(q AS BIGINT) AS q_star, und AS sum_underage, "
        "ovr AS sum_overage, "
        "ROUND((3.0 * CAST(und AS DOUBLE) + 1.0 * CAST(ovr "
        "AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS exp_cost FROM s"
    )
    out["mdlp_split"] = (
        # 1e9-tick entropy gains over exact counts, MDL acceptance --
        "-- mirrors _q_mdlp_split\n"
        "WITH p AS (SELECT CAST(ROUND(value * 10, 0) AS BIGINT) "
        "AS d10, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        "AS pos FROM events), "
        "h AS (SELECT d10, CAST(SUM(pos) AS BIGINT) AS p, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY d10), "
        "w AS (SELECT d10, SUM(p) OVER (ORDER BY d10) AS cp, "
        "SUM(n) OVER (ORDER BY d10) AS cn, "
        "SUM(p) OVER () AS bp, SUM(n) OVER () AS bn, "
        "ROW_NUMBER() OVER (ORDER BY d10) AS rn, "
        "COUNT(*) OVER () AS nv FROM h), "
        "ha AS (SELECT " + _ENT.format(c="bp", t="bn") + " + "
        + _ENT.format(c="bn - bp", t="bn")
        + " AS h_all, bn FROM w LIMIT 1), "
        "g AS (SELECT w.d10 AS thr, ha.h_all - ("
        + _ENT.format(c="w.cp", t="w.cn") + " + "
        + _ENT.format(c="w.cn - w.cp", t="w.cn") + " + "
        + _ENT.format(c="w.bp - w.cp", t="w.bn - w.cn") + " + "
        + _ENT.format(c="(w.bn - w.cn) - (w.bp - w.cp)",
                      t="w.bn - w.cn")
        + ") AS gain FROM w, ha WHERE w.rn < w.nv), "
        "best AS (SELECT thr, gain FROM g ORDER BY gain DESC, thr "
        "LIMIT 1), "
        "crit AS (SELECT CAST(ROUND((LOG2(CAST(bn - 1 AS DOUBLE)) "
        "+ LOG2(7.0)) * 1e9, 0) AS BIGINT) AS c FROM ha) "
        "SELECT best.thr AS threshold_d10, "
        "CAST(best.gain AS BIGINT) AS gain_ticks, crit.c "
        "AS crit_ticks, CAST(CASE WHEN best.gain > crit.c THEN 1 "
        "ELSE 0 END AS BIGINT) AS accepted FROM best, crit"
    )
    out["woe_iv"] = (
        # quantile_disc-rule quintile edges, pinned WoE chains,
        # 1e9-tick IV -- mirrors _q_woe_iv
        "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) "
        "AS c, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END "
        "AS pos FROM events), "
        "h AS (SELECT c, CAST(SUM(pos) AS BIGINT) AS p, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY c), "
        "w AS (SELECT c, p, n, SUM(n) OVER (ORDER BY c) AS cum, "
        "SUM(n) OVER () AS bn FROM h), "
        "ed AS (SELECT "
        "(SELECT MIN(c) FROM w WHERE cum >= (1 * bn + 4) // 5) AS e1, "
        "(SELECT MIN(c) FROM w WHERE cum >= (2 * bn + 4) // 5) AS e2, "
        "(SELECT MIN(c) FROM w WHERE cum >= (3 * bn + 4) // 5) AS e3, "
        "(SELECT MIN(c) FROM w WHERE cum >= (4 * bn + 4) // 5) AS e4 "
        "FROM (SELECT DISTINCT bn FROM w)), "
        "bb AS (SELECT CASE WHEN h.c <= ed.e1 THEN 1 "
        "WHEN h.c <= ed.e2 THEN 2 WHEN h.c <= ed.e3 THEN 3 "
        "WHEN h.c <= ed.e4 THEN 4 ELSE 5 END AS bin, "
        "CAST(SUM(h.p) AS BIGINT) AS g, "
        "CAST(SUM(h.n - h.p) AS BIGINT) AS b FROM h, ed "
        "GROUP BY 1), "
        "tt AS (SELECT CAST(SUM(g) AS BIGINT) AS gg, "
        "CAST(SUM(b) AS BIGINT) AS bt FROM bb), "
        "wv AS (SELECT bb.bin, bb.g, bb.b, "
        "LN((CAST(bb.g AS DOUBLE) / CAST(tt.gg AS DOUBLE)) "
        "/ (CAST(bb.b AS DOUBLE) / CAST(tt.bt AS DOUBLE))) AS woe, "
        "CAST(ROUND((CAST(bb.g AS DOUBLE) / CAST(tt.gg AS DOUBLE) "
        "- CAST(bb.b AS DOUBLE) / CAST(tt.bt AS DOUBLE)) "
        "* LN((CAST(bb.g AS DOUBLE) / CAST(tt.gg AS DOUBLE)) "
        "/ (CAST(bb.b AS DOUBLE) / CAST(tt.bt AS DOUBLE))) * 1e9, 0) "
        "AS BIGINT) AS ivt FROM bb, tt), "
        "iv AS (SELECT CAST(SUM(ivt) AS BIGINT) AS t FROM wv) "
        "SELECT CAST(wv.bin AS BIGINT) AS bin, wv.g AS n_good, "
        "wv.b AS n_bad, ROUND(wv.woe, 6) AS woe, "
        "ROUND(CAST(iv.t AS DOUBLE) / 1e9, 6) AS iv "
        "FROM wv, iv ORDER BY wv.bin"
    )
    out["target_encoding"] = (
        # exact rational smoothed encodings -- mirrors
        "-- _q_target_encoding\n"
        "WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos "
        "FROM events), "
        "g AS (SELECT h, CAST(SUM(pos) AS BIGINT) AS k, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY h), "
        "t AS (SELECT CAST(SUM(k) AS BIGINT) AS bk, "
        "CAST(SUM(n) AS BIGINT) AS bn FROM g) "
        "SELECT CAST(g.h AS BIGINT) AS hour, g.n, g.k AS k_pos, "
        "ROUND(CAST(g.k * t.bn + 100 * t.bk AS DOUBLE) "
        "/ CAST(t.bn * (g.n + 100) AS DOUBLE), 6) AS encoding "
        "FROM g, t ORDER BY g.h"
    )
    out["mrmr_select"] = _mrmr_oracle_sql()
    out["adwin_check"] = (
        # exact integer mean-difference numerators vs the pinned
        # Hoeffding bound -- mirrors _q_adwin_check
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT fr.d - (SELECT MIN(d) FROM c0) AS t, "
        "COALESCE(c0.y, 0) AS y FROM fr LEFT JOIN c0 USING (d)), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS tot, "
        "CAST(MAX(y) - MIN(y) AS BIGINT) AS rng FROM xs), "
        "cu AS (SELECT t + 1 AS cut, SUM(y) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS sl FROM xs), "
        "rt AS (SELECT cu.cut AS t, "
        "(CAST(ABS(cu.cut * (nn.tot - cu.sl) "
        "- (nn.n - cu.cut) * cu.sl) AS DOUBLE) "
        "/ (CAST(cu.cut AS DOUBLE) * CAST(nn.n - cu.cut AS DOUBLE))) "
        "/ SQRT(CAST(nn.rng AS DOUBLE) * CAST(nn.rng AS DOUBLE) "
        "* LN(2.0 / 0.05) / 2.0 * (1.0 / CAST(cu.cut AS DOUBLE) "
        "+ 1.0 / CAST(nn.n - cu.cut AS DOUBLE))) AS ratio "
        "FROM cu, nn WHERE cu.cut < nn.n) "
        "SELECT CAST(t AS BIGINT) AS cut_t, ROUND(ratio, 6) "
        "AS ratio, CAST(CASE WHEN ratio > 1.0 THEN 1 ELSE 0 END "
        "AS BIGINT) AS fires FROM rt ORDER BY ratio DESC, t LIMIT 1"
    )
    out["james_stein"] = (
        # 1e12-tick per-hour terms, pinned shrink chain -- mirrors
        "-- _q_james_stein\n"
        "WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS h, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS k "
        "FROM events), "
        "g AS (SELECT h, CAST(SUM(k) AS BIGINT) AS k, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY h), "
        "t AS (SELECT CAST(SUM(k) AS BIGINT) AS bk, "
        "CAST(SUM(n) AS BIGINT) AS bn, "
        "CAST(COUNT(*) AS BIGINT) AS m FROM g), "
        "pb AS (SELECT CAST(bk AS DOUBLE) / CAST(bn AS DOUBLE) "
        "AS pbar, m FROM t), "
        "tk AS (SELECT "
        "CAST(SUM(CAST(ROUND((CAST(g.k AS DOUBLE) "
        "/ CAST(g.n AS DOUBLE) - pb.pbar) * (CAST(g.k AS DOUBLE) "
        "/ CAST(g.n AS DOUBLE) - pb.pbar) * 1e12, 0) AS BIGINT)) "
        "AS BIGINT) AS st, "
        "CAST(SUM(CAST(ROUND(1.0 / CAST(g.n AS DOUBLE) * 1e12, 0) "
        "AS BIGINT)) AS BIGINT) AS invt FROM g, pb), "
        "sh AS (SELECT GREATEST(0.0, 1.0 "
        "- CAST(pb.m - 3 AS DOUBLE) * (pb.pbar * (1.0 - pb.pbar) "
        "* (CAST(tk.invt AS DOUBLE) / 1e12 / CAST(pb.m AS DOUBLE))) "
        "/ (CAST(tk.st AS DOUBLE) / 1e12)) AS f, pb.pbar "
        "FROM tk, pb) "
        "SELECT CAST(g.h AS BIGINT) AS hour, "
        "ROUND(CAST(g.k AS DOUBLE) / CAST(g.n AS DOUBLE), 6) "
        "AS raw_rate, "
        "ROUND(sh.pbar + sh.f * (CAST(g.k AS DOUBLE) "
        "/ CAST(g.n AS DOUBLE) - sh.pbar), 6) AS shrunk_rate, "
        "ROUND(sh.f, 6) AS shrink_factor FROM g, sh ORDER BY g.h"
    )
    out["iv_2sls"] = (
        # exact integer IV moments -- mirrors _q_iv_2sls
        "WITH e AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 "
        "AS z, (epoch_us(ts) // 3600000000) % 24 AS x, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(z) AS BIGINT) AS sz, CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(z * y) AS BIGINT) AS szy, "
        "CAST(SUM(z * x) AS BIGINT) AS szx FROM e) "
        "SELECT n, CAST(n * szy - sz * sy AS BIGINT) AS cov_zy_num, "
        "CAST(n * szx - sz * sx AS BIGINT) AS cov_zx_num, "
        "ROUND(CAST(n * szy - sz * sy AS DOUBLE) "
        "/ CAST(n * szx - sz * sx AS DOUBLE), 6) AS beta_iv FROM s"
    )
    out["harrell_c"] = (
        # doubled concordance counts over comparable pairs -- mirrors
        "-- _q_harrell_c\n"
        "WITH peru AS (SELECT user_id, MIN(epoch_us(ts)) AS t0, "
        "MAX(epoch_us(ts)) AS tlast, "
        "MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) "
        "AS terr, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS sc FROM events GROUP BY user_id), "
        "d AS (SELECT user_id, CASE WHEN terr IS NOT NULL "
        "THEN terr - t0 ELSE tlast - t0 END AS dur, "
        "CASE WHEN terr IS NOT NULL THEN 1 ELSE 0 END AS obs, sc "
        "FROM peru), "
        "prs AS (SELECT i.sc AS si, j.sc AS sj FROM d i JOIN d j "
        "ON i.obs = 1 AND (j.dur > i.dur "
        "OR (j.dur = i.dur AND j.obs = 0))), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS comp, "
        "CAST(SUM(CASE WHEN sj < si THEN 2 "
        "WHEN sj = si THEN 1 ELSE 0 END) AS BIGINT) AS conc2 "
        "FROM prs) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_users, "
        "comp AS n_comparable, conc2, "
        "ROUND(CAST(conc2 AS DOUBLE) / (2.0 * CAST(comp AS DOUBLE)), "
        "6) AS c_index FROM s"
    )
    out["maximal_cliques"] = (
        # bitmask clique + extendability certificates -- mirrors
        "-- _q_maximal_cliques\n"
        "WITH " + _G16_SQL + ", "
        "ne AS MATERIALIZED (SELECT (CAST(1 AS BIGINT) << a.bi) "
        "| (CAST(1 AS BIGINT) << b.bi) AS p FROM nd a JOIN nd b "
        "ON a.bi < b.bi AND GREATEST(ABS(a.x - b.x), "
        f"ABS(a.y - b.y)) > {_CLIQUE_T}), "
        "cq AS MATERIALIZED (SELECT mask FROM mk "
        "WHERE NOT EXISTS (SELECT 1 FROM ne "
        "WHERE (mk.mask & ne.p) = ne.p)), "
        "mxl AS (SELECT mask FROM cq WHERE NOT EXISTS ("
        "SELECT 1 FROM am WHERE (cq.mask >> am.bi) & 1 = 0 "
        "AND (cq.mask & xor(CAST(65535 AS BIGINT), am.adj)) = 0)) "
        "SELECT CAST(bit_count(mask) AS BIGINT) AS size, "
        "CAST(COUNT(*) AS BIGINT) AS n_cliques, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM mxl) AS total_maximal "
        "FROM mxl GROUP BY 1 ORDER BY 1"
    )
    out["max_independent_set"] = (
        # complement-clique enumeration; Gallai vertex cover --
        "-- mirrors _q_max_independent_set\n"
        "WITH " + _G16_SQL + ", "
        "ee AS MATERIALIZED (SELECT (CAST(1 AS BIGINT) << a.bi) "
        "| (CAST(1 AS BIGINT) << b.bi) AS p FROM nd a JOIN nd b "
        "ON a.bi < b.bi AND GREATEST(ABS(a.x - b.x), "
        f"ABS(a.y - b.y)) <= {_CLIQUE_T}), "
        "ok AS (SELECT mask, bit_count(mask) AS pc FROM ("
        "SELECT 0 AS mask UNION ALL SELECT mask FROM mk) "
        "WHERE NOT EXISTS (SELECT 1 FROM ee "
        "WHERE (mask & ee.p) = ee.p)), "
        "best AS (SELECT mask, pc FROM ok ORDER BY pc DESC, mask "
        "LIMIT 1) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY nd.cell) AS BIGINT) "
        "AS rank, CAST(nd.cell AS BIGINT) AS cell, "
        "CAST(best.pc AS BIGINT) AS alpha, "
        "CAST(16 - best.pc AS BIGINT) AS vertex_cover "
        "FROM nd, best WHERE (best.mask >> nd.bi) & 1 = 1"
    )
    out["min_dominating_set"] = (
        # closed-neighborhood OR coverage -- mirrors
        "-- _q_min_dominating_set\n"
        "WITH " + _G16_SQL + ", "
        "cm AS (SELECT bi, CAST(adj | (CAST(1 AS BIGINT) << bi) "
        "AS BIGINT) AS cl FROM am), "
        "cov AS (SELECT mk.mask, "
        "CAST(bit_or(cm.cl) AS BIGINT) AS cover "
        "FROM mk JOIN cm ON (mk.mask >> cm.bi) & 1 = 1 "
        "GROUP BY mk.mask), "
        "ok AS (SELECT mask, bit_count(mask) AS pc FROM cov "
        "WHERE cover = 65535), "
        "best AS (SELECT mask, pc FROM ok ORDER BY pc, mask LIMIT 1) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY nd.cell) AS BIGINT) "
        "AS rank, CAST(nd.cell AS BIGINT) AS cell, "
        "CAST(best.pc AS BIGINT) AS gamma "
        "FROM nd, best WHERE (best.mask >> nd.bi) & 1 = 1"
    )
    out["pmi_similarity"] = (
        # 1e6-tick PPMI vectors from exact bigram counts, pinned
        "-- cosines -- mirrors _q_pmi_similarity\n"
        "WITH w AS (SELECT list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "g AS (SELECT ws[i] AS a, ws[i+1] AS b FROM w, "
        "LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i)), "
        "bc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM g GROUP BY a, b), "
        "lm AS (SELECT a, CAST(SUM(c) AS BIGINT) AS la "
        "FROM bc GROUP BY a), "
        "rm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS rb "
        "FROM bc GROUP BY b), "
        "nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bc), "
        "pp AS MATERIALIZED (SELECT bc.a, bc.b, "
        "CAST(ROUND(LOG2(CAST(nn.n AS DOUBLE) * CAST(bc.c AS DOUBLE) "
        "/ (CAST(lm.la AS DOUBLE) * CAST(rm.rb AS DOUBLE))) * 1e6, "
        "0) AS BIGINT) AS v FROM bc "
        "JOIN lm USING (a) JOIN rm USING (b), nn "
        "WHERE LOG2(CAST(nn.n AS DOUBLE) * CAST(bc.c AS DOUBLE) "
        "/ (CAST(lm.la AS DOUBLE) * CAST(rm.rb AS DOUBLE))) > 0), "
        "nrm AS (SELECT a, CAST(SUM(v * v) AS BIGINT) AS nv "
        "FROM pp GROUP BY a), "
        "dots AS (SELECT p1.a AS w1, p2.a AS w2, "
        "CAST(SUM(p1.v * p2.v) AS BIGINT) AS dot FROM pp p1 "
        "JOIN pp p2 ON p2.b = p1.b AND p1.a < p2.a "
        "GROUP BY p1.a, p2.a), "
        "sims AS (SELECT lm1.a AS w1, lm2.a AS w2, "
        "CAST(COALESCE(d.dot, 0) AS DOUBLE) "
        "/ SQRT(CAST(n1.nv AS DOUBLE)) / SQRT(CAST(n2.nv AS DOUBLE)) "
        "AS sim FROM lm lm1 JOIN lm lm2 ON lm1.a < lm2.a "
        "JOIN nrm n1 ON n1.a = lm1.a JOIN nrm n2 ON n2.a = lm2.a "
        "LEFT JOIN dots d ON d.w1 = lm1.a AND d.w2 = lm2.a) "
        "SELECT w1, w2, ROUND(sim, 6) AS cosine FROM sims "
        "ORDER BY sim DESC, w1, w2 LIMIT 5"
    )
    out["hawkes_branching"] = (
        # exact hourly moments, D and eta -- mirrors
        "-- _q_hawkes_branching\n"
        "WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(hr) FROM h), "
        "(SELECT MAX(hr) FROM h))) AS hr), "
        "xs AS (SELECT COALESCE(h.n, 0) AS y FROM fr "
        "LEFT JOIN h USING (hr)), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS s1, "
        "CAST(SUM(y * y) AS BIGINT) AS s2 FROM xs), "
        "v AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) "
        "AS mean, CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS var FROM m) "
        "SELECT n AS n_hours, ROUND(var / mean, 6) AS dispersion, "
        "ROUND(CASE WHEN var / mean > 1.0 "
        "THEN 1.0 - SQRT(mean / var) ELSE 0.0 END, 6) AS eta_hat "
        "FROM v"
    )
    out["game_of_life_steps"] = (
        # 2 unrolled B3/S23 steps with dead boundary; exact id-sum
        "-- checksums -- mirrors _q_game_of_life_steps\n"
        "WITH g0 AS (SELECT event_id % 96 AS gx, "
        "(event_id // 96) % 96 AS gy FROM events GROUP BY 1, 2), "
        "fr AS (SELECT a.range AS gx, b.range AS gy "
        "FROM range(0, 96) a, range(0, 96) b), "
        "a0 AS MATERIALIZED (SELECT fr.gx, fr.gy, "
        "CASE WHEN g0.gx IS NOT NULL THEN 1 ELSE 0 END AS a "
        "FROM fr LEFT JOIN g0 USING (gx, gy)), "
        "n1 AS (SELECT a.gx, a.gy, a.a, "
        "CAST(SUM(b.a) AS BIGINT) AS nb FROM a0 a JOIN a0 b "
        "ON ABS(b.gx - a.gx) <= 1 AND ABS(b.gy - a.gy) <= 1 "
        "AND NOT (b.gx = a.gx AND b.gy = a.gy) GROUP BY 1, 2, 3), "
        "a1 AS MATERIALIZED (SELECT gx, gy, CASE WHEN (a = 1 AND "
        "(nb = 2 OR nb = 3)) OR (a = 0 AND nb = 3) THEN 1 ELSE 0 "
        "END AS a FROM n1), "
        "n2 AS (SELECT a.gx, a.gy, a.a, "
        "CAST(SUM(b.a) AS BIGINT) AS nb FROM a1 a JOIN a1 b "
        "ON ABS(b.gx - a.gx) <= 1 AND ABS(b.gy - a.gy) <= 1 "
        "AND NOT (b.gx = a.gx AND b.gy = a.gy) GROUP BY 1, 2, 3), "
        "a2 AS MATERIALIZED (SELECT gx, gy, CASE WHEN (a = 1 AND "
        "(nb = 2 OR nb = 3)) OR (a = 0 AND nb = 3) THEN 1 ELSE 0 "
        "END AS a FROM n2) "
        "SELECT CAST(step AS BIGINT) AS step, "
        "CAST(n_alive AS BIGINT) AS n_alive, "
        "CAST(id_sum AS BIGINT) AS id_sum FROM ("
        "SELECT 0 AS step, SUM(a) AS n_alive, "
        "SUM(a * (gx + gy * 96)) AS id_sum FROM a0 "
        "UNION ALL SELECT 1, SUM(a), SUM(a * (gx + gy * 96)) FROM a1 "
        "UNION ALL SELECT 2, SUM(a), SUM(a * (gx + gy * 96)) FROM a2) "
        "ORDER BY step"
    )
    out["rv_coefficient"] = (
        # exact integer Gram matrices and inner products -- mirrors
        "-- _q_rv_coefficient\n"
        "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
        "(epoch_us(ts) // 3600000000) % 24 AS h, event_type AS t "
        "FROM events), "
        "md AS (SELECT day AS mid FROM (SELECT day, "
        "ROW_NUMBER() OVER (ORDER BY day) - 1 AS r FROM "
        "(SELECT DISTINCT day FROM e)) WHERE r = "
        "(SELECT COUNT(DISTINCT day) FROM e) // 2), "
        "m AS MATERIALIZED (SELECT CASE WHEN e.day < md.mid THEN 0 "
        "ELSE 1 END AS p, e.h, e.t, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM e, md GROUP BY 1, 2, 3), "
        "gx AS (SELECT a.t AS t1, b.t AS t2, "
        "CAST(SUM(a.n * b.n) AS BIGINT) AS g FROM m a JOIN m b "
        "ON b.p = 0 AND b.h = a.h AND a.p = 0 GROUP BY 1, 2), "
        "gy AS (SELECT a.t AS t1, b.t AS t2, "
        "CAST(SUM(a.n * b.n) AS BIGINT) AS g FROM m a JOIN m b "
        "ON b.p = 1 AND b.h = a.h AND a.p = 1 GROUP BY 1, 2), "
        "s AS (SELECT "
        "(SELECT CAST(SUM(gx.g * gy.g) AS BIGINT) FROM gx JOIN gy "
        "ON gy.t1 = gx.t1 AND gy.t2 = gx.t2) AS num, "
        "(SELECT SUM(CAST(g AS HUGEINT) * g) FROM gx) AS nx, "
        "(SELECT SUM(CAST(g AS HUGEINT) * g) FROM gy) AS ny) "
        "SELECT num AS inner, "
        "ROUND(CAST(num AS DOUBLE) / SQRT(CAST(nx AS DOUBLE)) "
        "/ SQRT(CAST(ny AS DOUBLE)), 6) AS rv FROM s"
    )
    out["distance_correlation"] = (
        # n^2-scaled integer double-centering, HUGEINT inner
        "-- products -- mirrors _q_distance_correlation\n"
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS MATERIALIZED (SELECT fr.d - (SELECT MIN(d) FROM c0) "
        "AS t, COALESCE(c0.y, 0) AS y, COALESCE(c0.c, 0) AS c "
        "FROM fr LEFT JOIN c0 USING (d)), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xs), "
        "pa AS MATERIALIZED (SELECT a.t AS i, b.t AS j, "
        "ABS(a.y - b.y) AS ay, ABS(a.c - b.c) AS ac "
        "FROM xs a, xs b), "
        "rw AS (SELECT i, CAST(SUM(ay) AS BIGINT) AS ry, "
        "CAST(SUM(ac) AS BIGINT) AS rc FROM pa GROUP BY i), "
        "tt AS (SELECT CAST(SUM(ay) AS BIGINT) AS ty, "
        "CAST(SUM(ac) AS BIGINT) AS tc FROM pa), "
        "ct AS (SELECT pa.i, pa.j, "
        "CAST(nn.n * nn.n * pa.ay - nn.n * (ri.ry + rj.ry) + tt.ty "
        "AS HUGEINT) AS at, "
        "CAST(nn.n * nn.n * pa.ac - nn.n * (ri.rc + rj.rc) + tt.tc "
        "AS HUGEINT) AS bt FROM pa "
        "JOIN rw ri ON ri.i = pa.i JOIN rw rj ON rj.i = pa.j, "
        "nn, tt), "
        "s AS (SELECT SUM(at * bt) AS num, SUM(at * at) AS na, "
        "SUM(bt * bt) AS nb FROM ct) "
        "SELECT (SELECT n FROM nn) AS n_days, "
        "ROUND(CAST(num AS DOUBLE) / SQRT(CAST(na AS DOUBLE)) "
        "/ SQRT(CAST(nb AS DOUBLE)), 6) AS dcor2 FROM s"
    )
    out["chatterjee_xi"] = (
        # deterministic ROW_NUMBER rank conventions, exact step sum
        "-- mirrors _q_chatterjee_xi\n"
        "WITH " + _DAILY2_SQL + ", "
        "rk AS (SELECT t, ROW_NUMBER() OVER (ORDER BY c, t) AS r "
        "FROM xs), "
        "sq AS (SELECT rk.r, ROW_NUMBER() OVER "
        "(ORDER BY xs.y, xs.t) AS pos FROM xs "
        "JOIN rk ON rk.t = xs.t), "
        "dfs AS (SELECT r - LAG(r) OVER (ORDER BY pos) AS dr "
        "FROM sq), "
        "st AS (SELECT CAST(SUM(ABS(dr)) AS BIGINT) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM dfs) "
        "SELECT n AS n_days, s AS abs_rank_steps, "
        "ROUND(1.0 - 3.0 * CAST(s AS DOUBLE) "
        "/ CAST(n * n - 1 AS DOUBLE), 6) AS xi FROM st"
    )
    out["tail_dependence"] = (
        # exact decile thresholds (quantile_disc rule) + integer
        "-- joint counts -- mirrors _q_tail_dependence\n"
        "WITH " + _DAILY2_SQL + ", "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xs), "
        "ry AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn "
        "FROM xs), "
        "rc AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn "
        "FROM xs), "
        "th AS (SELECT "
        "(SELECT y FROM ry, nn WHERE rn = (9 * n + 9) // 10 LIMIT 1) "
        "AS yu, "
        "(SELECT c FROM rc, nn WHERE rn = (9 * n + 9) // 10 LIMIT 1) "
        "AS cu, "
        "(SELECT y FROM ry, nn WHERE rn = (n + 9) // 10 LIMIT 1) "
        "AS yl, "
        "(SELECT c FROM rc, nn WHERE rn = (n + 9) // 10 LIMIT 1) "
        "AS cl), "
        "ct AS (SELECT "
        "CAST(SUM(CASE WHEN xs.y > th.yu AND xs.c > th.cu THEN 1 "
        "ELSE 0 END) AS BIGINT) AS bu, "
        "CAST(SUM(CASE WHEN xs.y <= th.yl AND xs.c <= th.cl THEN 1 "
        "ELSE 0 END) AS BIGINT) AS bl FROM xs, th) "
        "SELECT nn.n AS n_days, ct.bu AS n_upper, ct.bl AS n_lower, "
        "ROUND(CAST(ct.bu AS DOUBLE) / (0.1 * CAST(nn.n AS DOUBLE)), "
        "6) AS lambda_u, "
        "ROUND(CAST(ct.bl AS DOUBLE) / (0.1 * CAST(nn.n AS DOUBLE)), "
        "6) AS lambda_l FROM ct, nn"
    )
    out["blomqvist_beta"] = (
        # quadrant counts around the exact medians -- mirrors
        "-- _q_blomqvist_beta\n"
        "WITH " + _DAILY2_SQL + ", "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xs), "
        "ry AS (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rn "
        "FROM xs), "
        "rc AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn "
        "FROM xs), "
        "md AS (SELECT "
        "(SELECT y FROM ry, nn WHERE rn = (n + 1) // 2 LIMIT 1) "
        "AS my, "
        "(SELECT c FROM rc, nn WHERE rn = (n + 1) // 2 LIMIT 1) "
        "AS mc), "
        "ct AS (SELECT "
        "CAST(SUM(CASE WHEN xs.y <> md.my AND xs.c <> md.mc "
        "AND ((xs.y > md.my) = (xs.c > md.mc)) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS conc, "
        "CAST(SUM(CASE WHEN xs.y <> md.my AND xs.c <> md.mc "
        "AND ((xs.y > md.my) <> (xs.c > md.mc)) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS disc FROM xs, md) "
        "SELECT conc AS n_conc, disc AS n_disc, "
        "ROUND(CAST(conc - disc AS DOUBLE) "
        "/ CAST(conc + disc AS DOUBLE), 6) AS beta FROM ct"
    )
    out["survey_estimators"] = (
        # deterministic 1-in-5 sample, HT/ratio/regression panel --
        "-- mirrors _q_survey_estimators\n"
        "WITH peru AS (SELECT user_id, "
        "CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) "
        "AS y, CAST(COUNT(*) AS BIGINT) AS x FROM events "
        "GROUP BY user_id), "
        "s AS (SELECT *, "
        f"CASE WHEN ({_mx('user_id', 83)}) % 5 = 0 THEN 1 ELSE 0 END "
        "AS samp FROM peru), "
        "m AS (SELECT CAST(SUM(samp) AS BIGINT) AS ns, "
        "CAST(SUM(y) AS BIGINT) AS ytrue, "
        "CAST(SUM(x) AS BIGINT) AS xtot, "
        "CAST(SUM(CASE WHEN samp = 1 THEN y ELSE 0 END) AS BIGINT) "
        "AS sy, "
        "CAST(SUM(CASE WHEN samp = 1 THEN x ELSE 0 END) AS BIGINT) "
        "AS sx, "
        "CAST(SUM(CASE WHEN samp = 1 THEN y * x ELSE 0 END) "
        "AS BIGINT) AS sxy, "
        "CAST(SUM(CASE WHEN samp = 1 THEN x * x ELSE 0 END) "
        "AS BIGINT) AS sxx FROM s) "
        "SELECT ns AS n_sample, ytrue AS true_total, "
        "CAST(5 * sy AS BIGINT) AS ht_total, "
        "ROUND(CAST(xtot AS DOUBLE) * (CAST(sy AS DOUBLE) "
        "/ CAST(sx AS DOUBLE)), 6) AS ratio_total, "
        "ROUND(CAST(5 * sy AS DOUBLE) "
        "+ (CAST(ns * sxy - sx * sy AS DOUBLE) "
        "/ CAST(ns * sxx - sx * sx AS DOUBLE)) "
        "* (CAST(xtot AS DOUBLE) - 5.0 * CAST(sx AS DOUBLE)), 6) "
        "AS reg_total, "
        "ROUND(CAST(ns AS DOUBLE) * CAST(ns * 25 AS DOUBLE) "
        "/ (CAST(5 * ns AS DOUBLE) * CAST(5 * ns AS DOUBLE)), 6) "
        "AS kish_deff FROM m"
    )
    out["lexis_apc"] = (
        # exact week cells, APC identity via modal period -- mirrors
        "-- _q_lexis_apc\n"
        "WITH t0 AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 "
        "FROM events GROUP BY user_id), "
        "st AS (SELECT MIN(t0) AS s FROM t0), "
        "cells AS (SELECT "
        "(epoch_us(e.ts) - t0.t0) // 604800000000 AS age, "
        "(epoch_us(e.ts) - st.s) // 604800000000 AS per, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events e "
        "JOIN t0 USING (user_id), st GROUP BY 1, 2), "
        "pa AS (SELECT age, CAST(SUM(n) AS BIGINT) AS tot "
        "FROM cells GROUP BY age), "
        "modal AS (SELECT age, per FROM (SELECT age, per, "
        "ROW_NUMBER() OVER (PARTITION BY age ORDER BY n DESC, per) "
        "AS rn FROM cells) WHERE rn = 1) "
        "SELECT CAST(pa.age AS BIGINT) AS age_weeks, "
        "pa.tot AS n_events, "
        "CAST(modal.per AS BIGINT) AS modal_period, "
        "CAST(modal.per - pa.age AS BIGINT) AS modal_cohort "
        "FROM pa JOIN modal USING (age) ORDER BY pa.age"
    )
    out["gompertz_hazard"] = (
        # discrete hazards, 1e9-tick logs, exact tick regression --
        "-- mirrors _q_gompertz_hazard\n"
        "WITH peru AS (SELECT user_id, "
        "(MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 3600000000 "
        "AS ten FROM events GROUP BY user_id), "
        "d AS (SELECT ten, CAST(COUNT(*) AS BIGINT) AS dd "
        "FROM peru GROUP BY ten), "
        "r AS (SELECT d.ten, d.dd, "
        "(SELECT CAST(SUM(d2.dd) AS BIGINT) FROM d d2 "
        "WHERE d2.ten >= d.ten) AS rr FROM d), "
        "v AS (SELECT ten AS w, CAST(ROUND(LN(CAST(dd AS DOUBLE) "
        "/ CAST(rr AS DOUBLE)) * 1e9, 0) AS BIGINT) AS lh FROM r "
        "WHERE dd > 0 AND dd < rr), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(w) AS BIGINT) AS sx, CAST(SUM(lh) AS BIGINT) AS sy, "
        "CAST(SUM(w * w) AS BIGINT) AS sxx, "
        "SUM(CAST(w AS HUGEINT) * lh) AS sxy FROM v) "
        "SELECT n AS n_hazard_hours, "
        "ROUND(CAST(n * sxy - sx * sy AS DOUBLE) "
        "/ CAST(n * sxx - sx * sx AS DOUBLE) / 1e9, 6) "
        "AS gompertz_slope FROM m"
    )
    out["code_length_audit"] = (
        # exact bit-length closed forms via bin() -- mirrors
        "-- _q_code_length_audit\n"
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1), "
        "fr AS (SELECT unnest(generate_series((SELECT MIN(d) FROM c0), "
        "(SELECT MAX(d) FROM c0))) AS d), "
        "xs AS (SELECT COALESCE(c0.y, 0) + 1 AS x "
        "FROM fr LEFT JOIN c0 USING (d)), "
        "bl AS (SELECT x, CAST(LEN(bin(x)) AS BIGINT) AS b FROM xs), "
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(2 * (b - 1) + 1) AS BIGINT) AS gamma, "
        "CAST(SUM((b - 1) + 2 * (CAST(LEN(bin(b)) AS BIGINT) - 1) "
        "+ 1) AS BIGINT) AS delta, "
        "CAST(SUM((x >> 2) + 3) AS BIGINT) AS rice FROM bl) "
        "SELECT scheme, total_bits, n AS n_values FROM ("
        "SELECT 'elias_gamma' AS scheme, gamma AS total_bits, n "
        "FROM s UNION ALL SELECT 'elias_delta', delta, n FROM s "
        "UNION ALL SELECT 'rice_k2', rice, n FROM s "
        "UNION ALL SELECT 'fixed32', 32 * n, n FROM s)"
    )
    out["renyi_entropy"] = (
        # exact integer power sums, one pinned log chain per order --
        # mirrors _q_renyi_entropy
        "WITH w AS (SELECT list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "tok AS (SELECT unnest(ws) AS t FROM w), "
        "tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM tok GROUP BY t), "
        "s AS (SELECT CAST(SUM(c) AS BIGINT) AS n, "
        "CAST(COUNT(*) AS BIGINT) AS v, "
        "CAST(SUM(c * c) AS BIGINT) AS s2, "
        "CAST(SUM(c * c * c) AS BIGINT) AS s3, "
        "CAST(MAX(c) AS BIGINT) AS cm FROM tf) "
        "SELECT o.order_name, "
        "ROUND(CASE o.order_name "
        "WHEN 'h0' THEN LN(CAST(s.v AS DOUBLE)) "
        "WHEN 'h2' THEN -(LN(CAST(s.s2 AS DOUBLE)) "
        "- 2.0 * LN(CAST(s.n AS DOUBLE))) "
        "WHEN 'h3' THEN -(LN(CAST(s.s3 AS DOUBLE)) "
        "- 3.0 * LN(CAST(s.n AS DOUBLE))) / 2.0 "
        "ELSE -(LN(CAST(s.cm AS DOUBLE)) - LN(CAST(s.n AS DOUBLE))) "
        "END, 6) AS entropy, s.n AS n_tokens, s.v AS vocab "
        "FROM (SELECT * FROM (VALUES ('h0'), ('h2'), ('h3'), "
        "('hinf')) AS vv(order_name)) o, s"
    )
    out["rocchio_feedback"] = (
        # exact integer weight numerators c_r*N_n - c_n*N_r --
        # mirrors _q_rocchio_feedback
        "WITH d AS (SELECT lang, list_filter(string_split(text, ' '), "
        "t -> t <> '') AS ws FROM documents), "
        "tok AS (SELECT unnest(ws) AS t, "
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r FROM d), "
        "a AS (SELECT t, CAST(SUM(r) AS BIGINT) AS cr, "
        "CAST(COUNT(*) AS BIGINT) AS ct FROM tok GROUP BY t), "
        "tt AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, "
        "CAST(SUM(ct - cr) AS BIGINT) AS nn FROM a), "
        "ww AS (SELECT t, CAST(cr * tt.nn - (ct - cr) * tt.nr "
        "AS BIGINT) AS num FROM a, tt) "
        "SELECT ww.t AS term, ww.num AS w_num, "
        "ROUND(CAST(ww.num AS DOUBLE) / (CAST(tt.nr AS DOUBLE) "
        "* CAST(tt.nn AS DOUBLE)), 6) AS weight FROM ww, tt "
        "ORDER BY ww.num DESC, ww.t LIMIT 10"
    )
    out["dunn_index"] = (
        # exact integer inter/intra extremes over the shared Voronoi
        # partition -- mirrors _q_dunn_index
        "WITH " + _VOR_SITES_SQL + ", "
        "prs AS (SELECT a.li AS la, b.li AS lb, "
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2 "
        "FROM asn a JOIN asn b ON a.cell < b.cell) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM asn) "
        "AS n_points, "
        "CAST(MIN(d2) FILTER (WHERE la <> lb) AS BIGINT) "
        "AS min_inter_d2, "
        "CAST(MAX(d2) FILTER (WHERE la = lb) AS BIGINT) "
        "AS max_intra_d2, "
        "ROUND(CAST(MIN(d2) FILTER (WHERE la <> lb) AS DOUBLE) "
        "/ CAST(MAX(d2) FILTER (WHERE la = lb) AS DOUBLE), 6) "
        "AS dunn_sq FROM prs"
    )
    out["davies_bouldin_voronoi"] = (
        # 1e9-tick quantized scatter sums and R-term accumulation --
        # mirrors _q_davies_bouldin
        "WITH " + _VOR_SITES_SQL + ", "
        "sc AS (SELECT asn.li, CAST(SUM(CAST(ROUND(SQRT(CAST("
        "(asn.x - s.sx) * (asn.x - s.sx) "
        "+ (asn.y - s.sy) * (asn.y - s.sy) AS DOUBLE)) * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS ticks, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM asn "
        "JOIN sites s ON s.i = asn.li GROUP BY asn.li), "
        "sv AS (SELECT li, CAST(ticks AS DOUBLE) / 1e9 "
        "/ CAST(n AS DOUBLE) AS s FROM sc), "
        "r AS (SELECT a.li, MAX((a.s + b.s) / SQRT(CAST("
        "(sa.sx - sb.sx) * (sa.sx - sb.sx) "
        "+ (sa.sy - sb.sy) * (sa.sy - sb.sy) AS DOUBLE))) AS best "
        "FROM sv a JOIN sv b ON b.li <> a.li "
        "JOIN sites sa ON sa.i = a.li JOIN sites sb ON sb.i = b.li "
        "GROUP BY a.li), "
        "t2 AS (SELECT CAST(SUM(CAST(ROUND(best * 1e9, 0) "
        "AS BIGINT)) AS BIGINT) AS tt, "
        "CAST(COUNT(*) AS BIGINT) AS nc FROM r) "
        "SELECT nc AS n_clusters, "
        "ROUND(CAST(tt AS DOUBLE) / 1e9 / CAST(nc AS DOUBLE), 6) "
        "AS db_index FROM t2"
    )
    out["kleinberg_bursts"] = _kleinberg_oracle_sql()
    out["map_at_10"] = (
        # AP as exact integer numerator over 2520 * min(R, 10) --
        # mirrors _q_map_at_10
        "WITH r AS (SELECT lang, doc_id, n_chars, "
        "CASE WHEN n_chars % 3 = 2 THEN 1 ELSE 0 END AS rel, "
        "ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id) AS rn FROM documents), "
        "rt AS (SELECT lang, CAST(SUM(rel) AS BIGINT) AS r_total "
        "FROM r GROUP BY lang), "
        "t10 AS (SELECT lang, rel, rn, "
        "SUM(rel) OVER (PARTITION BY lang ORDER BY rn "
        "ROWS UNBOUNDED PRECEDING) AS hits FROM r WHERE rn <= 10), "
        "ap AS (SELECT lang, CAST(MAX(hits) AS BIGINT) AS hits_at_10, "
        "CAST(SUM(CASE WHEN rel = 1 THEN (2520 // rn) * hits "
        "ELSE 0 END) AS BIGINT) AS ap_num FROM t10 GROUP BY lang) "
        "SELECT ap.lang, rt.r_total, ap.hits_at_10, ap.ap_num, "
        "ROUND(CAST(ap.ap_num AS DOUBLE) "
        "/ CAST(2520 * LEAST(rt.r_total, 10) AS DOUBLE), 6) AS ap "
        "FROM ap JOIN rt USING (lang)"
    )
    return out
