"""DuckDB oracle SQL, part 01 of 4.

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
# Flagship oracle: replay of synthesize_pages_from_documents' integer
# doc_id formulas + the '%.6f' geo-span round-trip + frozen cell encode
# (events_geocode_cells playbook; VERDICT r4 item 2).  Rows with
# doc_id % 19 == 0 carry no geo span and never reach cell_counts.
_PAGES_FLAGSHIP_SQL = (
    f"SELECT {_cell_expr_cols('glon', 'glat', 8)} AS cell_8, "
    "CAST(COUNT(*) AS BIGINT) AS \"count\" "
    "FROM (SELECT "
    "CAST(printf('%.6f', 77.0 + CAST((doc_id * 37) % 256 AS DOUBLE) "
    "* 0.01) AS DOUBLE) AS glon, "
    "CAST(printf('%.6f', 26.5 + CAST((doc_id * 53) % 256 AS DOUBLE) "
    "* 0.01) AS DOUBLE) AS glat "
    "FROM documents WHERE doc_id % 19 <> 0) GROUP BY 1"
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
    out = {
        "extract_full": f"SELECT pix, lon, lat, z FROM ({grid})",
        "extract_valid": f"SELECT pix, lon, lat, z FROM ({valid})",
        "stride_sample": (
            f"SELECT pix, lon, lat, z FROM ({grid}) WHERE pix % {OG_SAMPLE_RATE} = 0"
        ),
        "bounds": (
            f"SELECT 'oracle' AS src, MIN(lon) AS min_lon, MAX(lon) AS max_lon, "
            f"MIN(lat) AS min_lat, MAX(lat) AS max_lat, "
            f"MIN(z) AS min_z, MAX(z) AS max_z FROM ({valid})"
        ),
        "band_stats": (
            f"SELECT 1 AS band, COUNT(*) AS count, MIN(z) AS min, MAX(z) AS max, "
            f"ROUND(AVG(z), 6) AS mean, "
            f"ROUND(SQRT(GREATEST(AVG(z*z) - AVG(z)*AVG(z), 0.0)), 6) AS std "
            f"FROM ({valid})"
        ),
        "cell_counts": (
            f"SELECT {cell8} AS cell_8, COUNT(*) AS n FROM ({valid}) GROUP BY 1"
        ),
        "cell_counts_salted": (
            f"SELECT {cell8} AS cell_8, COUNT(*) AS n FROM ({valid}) GROUP BY 1"
        ),
        "bbox_join": (
            f"SELECT t.tile_id FROM ({tiles_sql}) t WHERE EXISTS ("
            f"SELECT 1 FROM ({poly_boxes}) p WHERE NOT (t.tmaxx < p.pminx OR "
            f"t.tminx > p.pmaxx OR t.tmaxy < p.pminy OR t.tminy > p.pmaxy))"
        ),
        "pip_join": " UNION ALL ".join(pip_parts),
        # the sharded tier must produce the IDENTICAL result
        "pip_join_sharded": " UNION ALL ".join(pip_parts),
        "zonal_stats": " UNION ALL ".join(
            f"SELECT '{pid}' AS polygon_id, COUNT(*) AS count, MIN(z) AS min, "
            f"MAX(z) AS max, ROUND(AVG(z), 6) AS mean, "
            f"ROUND(SQRT(GREATEST(AVG(z*z) - AVG(z)*AVG(z), 0.0)), 6) AS std "
            f"FROM ({valid}) WHERE {_halfplane_sql(poly)}"
            for pid, poly in OG_POLYGONS.items()
            if pid != "q_out"
        ),
        "knn_lookup": (
            f"SELECT probe_id, pix, z FROM ("
            f"SELECT p.probe_id, g.pix, g.z, ROW_NUMBER() OVER ("
            f"PARTITION BY p.probe_id ORDER BY "
            f"(g.lon - p.plon) * (g.lon - p.plon) + (g.lat - p.plat) * (g.lat - p.plat), g.pix"
            f") AS rn FROM (VALUES {probes_values}) p(probe_id, plon, plat), ({valid}) g"
            f") WHERE rn = 1"
        ),
        "knn_balltree": (
            f"SELECT probe_id, pix, z FROM ("
            f"SELECT p.probe_id, g.pix, g.z, ROW_NUMBER() OVER ("
            f"PARTITION BY p.probe_id ORDER BY "
            f"(g.lon - p.plon) * (g.lon - p.plon) + (g.lat - p.plat) * (g.lat - p.plat), g.pix"
            f") AS rn FROM (VALUES {probes_values}) p(probe_id, plon, plat), ({valid}) g"
            f") WHERE rn = 1"
        ),
        "knn_outside": (
            f"SELECT probe_id, pix, z FROM ("
            f"SELECT p.probe_id, g.pix, g.z, ROW_NUMBER() OVER ("
            f"PARTITION BY p.probe_id ORDER BY "
            f"(g.lon - p.plon) * (g.lon - p.plon) + (g.lat - p.plat) * (g.lat - p.plat), g.pix"
            f") AS rn FROM (VALUES {outside_values}) p(probe_id, plon, plat), ({valid}) g"
            f") WHERE rn = 1"
        ),
        # distance-band join: 0.025 deg window, margins to the radius
        # boundary are ~4e-4 on this grid, so <= on d vs d^2 agree
        "within_radius": (
            f"SELECT p.probe_id, g.pix, g.z "
            f"FROM (VALUES {probes_values}) p(probe_id, plon, plat), ({valid}) g "
            f"WHERE (g.lon - p.plon) * (g.lon - p.plon) "
            f"+ (g.lat - p.plat) * (g.lat - p.plat) <= 0.025 * 0.025"
        ),
        "downsample_raster": (
            f"SELECT {_cell_expr(5)} AS cell_5, COUNT(*) AS n, "
            f"ROUND(AVG(z), 6) AS avg_z, MIN(z) AS min_z, MAX(z) AS max_z "
            f"FROM ({valid}) GROUP BY 1"
        ),
        "bilinear_sample": _bilinear_oracle_sql(grid),
        "s2_cells": _s2_cells_oracle_sql(),
        "geohash_cells": (
            "SELECT " + _geohash_expr_for_events() + " AS geohash6, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1"
        ),
        "track_simplify": _track_simplify_oracle_sql(),
        "kmeans_clusters": _kmeans_oracle_sql(),
        "convex_hull": _convex_hull_oracle_sql(),
        "dbscan_clusters": _dbscan_oracle_sql(),
        "approx_distinct": _approx_distinct_oracle_sql(),
        "approx_distinct_by_type": _approx_distinct_by_type_oracle_sql(),
        "quality_scores": _quality_scores_oracle_sql(),
        "quality_filter_by_lang": (
            f"WITH qf AS ({_quality_features_oracle_sql()}), "
            "q AS (SELECT qf.doc_id, d.lang, qf.quality FROM qf "
            "JOIN documents d ON d.doc_id = qf.doc_id), "
            "m AS (SELECT lang, quantile_disc(quality, 0.5) AS med "
            "FROM q GROUP BY lang) "
            "SELECT q.doc_id, q.lang, q.quality FROM q "
            "JOIN m ON q.lang = m.lang WHERE q.quality > m.med"
        ),
        "quantiles": _quantiles_oracle_sql(),
        "minhash_dedup": _minhash_dedup_oracle_sql(),
        "simhash_dedup": _simhash_dedup_oracle_sql(),
        "jaccard_pairs": _jaccard_pairs_oracle_sql(),
        "winnow_dedup": _winnow_dedup_oracle_sql(),
        "passage_dedup": _passage_dedup_oracle_sql(),
        "lang_id": _lang_id_oracle_sql(),
        "text_cleaning": _text_cleaning_oracle_sql(),
        "quality_features": _quality_features_oracle_sql(),
        "stay_points": _stay_points_oracle_sql(),
        "focal_counts": (
            # 3x3 focal mean over per-cell counts; ix/iy arithmetic
            # mirrors functions/cells.py (res 8: s=360/2^16)
            f"WITH c AS (SELECT "
            f"LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / {cell_size(8)!r}) AS BIGINT), 0), {2**16 - 1}) AS ix, "
            f"LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / {cell_size(8)!r}) AS BIGINT), 0), {2**15 - 1}) AS iy, "
            f"COUNT(*) AS n FROM ({valid}) GROUP BY 1, 2) "
            f"SELECT (CAST(8 AS BIGINT) << 56) | (a.iy << 28) | a.ix AS cell_8, "
            f"ROUND(AVG(CAST(b.n AS DOUBLE)), 6) AS focal_n "
            f"FROM c a JOIN c b ON b.ix BETWEEN a.ix - 1 AND a.ix + 1 "
            f"AND b.iy BETWEEN a.iy - 1 AND a.iy + 1 GROUP BY 1"
        ),
        "tile_slope": (
            # Horn 3x3 slope; every window value must exist (inner
            # joins drop raster-edge pixels) and pass the validity
            # threshold; arithmetic ordered exactly like horn_kernel
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1) "
            f"SELECT row, col, ROUND(100.0 * SQRT(p * p + q * q), 6) AS slope_pct "
            f"FROM (SELECT row, col, "
            f"((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * 0.01) AS p, "
            f"((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * 0.01) AS q "
            f"FROM w WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
            f"AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
            f"AND zg > -1e30 AND zh > -1e30 AND zi > -1e30)"
        ),
        "tile_ruggedness": (
            # Riley et al. 1999 TRI; identical window joins and
            # left-associative squared-diff sum as tri_kernel
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1) "
            f"SELECT row, col, ROUND(SQRT("
            f"(za - ze) * (za - ze) + (zb - ze) * (zb - ze) "
            f"+ (zc - ze) * (zc - ze) + (zd - ze) * (zd - ze) "
            f"+ (zf - ze) * (zf - ze) + (zg - ze) * (zg - ze) "
            f"+ (zh - ze) * (zh - ze) + (zi - ze) * (zi - ze)), 6) AS tri "
            f"FROM w WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
            f"AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
            f"AND zg > -1e30 AND zh > -1e30 AND zi > -1e30"
        ),
        "tile_tpi": (
            # Weiss TPI: center minus 8-neighbor mean; identical
            # window joins and left-associative neighbor sum as
            # tpi_kernel
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1) "
            f"SELECT row, col, ROUND(ze - "
            f"(za + zb + zc + zd + zf + zg + zh + zi) / 8.0, 6) AS tpi "
            f"FROM w WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
            f"AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
            f"AND zg > -1e30 AND zh > -1e30 AND zi > -1e30"
        ),
        "region_labels": (
            # recursive min-label closure over 4-adjacency of
            # above-threshold pixels; key = row * 2^20 + col
            f"WITH RECURSIVE g AS ({_OG_SLOPE_GRID_SQL}), "
            "v AS (SELECT row * 1048576 + col AS p, row, col FROM g "
            "WHERE z > -1e30 AND z >= 45.0), "
            "e AS (SELECT a.p AS p1, b.p AS p2 FROM v a JOIN v b ON "
            "(b.row = a.row AND b.col = a.col + 1) "
            "OR (b.row = a.row + 1 AND b.col = a.col)), "
            "sym AS (SELECT p1, p2 FROM e UNION ALL SELECT p2, p1 FROM e), "
            "walk(p, r) AS (SELECT p, p FROM v "
            "UNION SELECT sym.p2, walk.r FROM walk "
            "JOIN sym ON sym.p1 = walk.p), "
            "lab AS (SELECT p, MIN(r) AS rep FROM walk GROUP BY p) "
            "SELECT rep, CAST(COUNT(*) AS BIGINT) AS n_pixels "
            "FROM lab GROUP BY rep"
        ),
        "tile_curvature": (
            # Zevenbergen-Thorne curvature: identical window joins to
            # tile_slope; D,E,F,G,H and the three outputs written in
            # the kernel's exact left-associative float order
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1 "
            f"WHERE n1.z > -1e30 AND n2.z > -1e30 AND n3.z > -1e30 "
            f"AND n4.z > -1e30 AND e.z > -1e30 AND n6.z > -1e30 "
            f"AND n7.z > -1e30 AND n8.z > -1e30 AND n9.z > -1e30), "
            f"d AS (SELECT row, col, "
            f"((zd + zf) / 2.0 - ze) / (0.01 * 0.01) AS dd, "
            f"((zb + zh) / 2.0 - ze) / (0.01 * 0.01) AS ee, "
            f"(-za + zc + zg - zi) / (4.0 * (0.01 * 0.01)) AS ff, "
            f"(-zd + zf) / (2.0 * 0.01) AS gg, "
            f"(zb - zh) / (2.0 * 0.01) AS hh FROM w), "
            f"e2 AS (SELECT row, col, dd, ee, ff, gg, hh, "
            f"gg * gg + hh * hh AS g2h2 FROM d) "
            f"SELECT row, col, "
            f"ROUND((-2.0 * (dd + ee)) * 100.0, 6) AS curv_general, "
            f"ROUND(CASE WHEN g2h2 = 0.0 THEN 0.0 ELSE "
            f"(-2.0 * (dd * gg * gg + ee * hh * hh + ff * gg * hh) / g2h2) * 100.0 "
            f"END, 6) AS curv_profile, "
            f"ROUND(CASE WHEN g2h2 = 0.0 THEN 0.0 ELSE "
            f"(2.0 * (dd * hh * hh + ee * gg * gg - ff * gg * hh) / g2h2) * 100.0 "
            f"END, 6) AS curv_plan FROM e2"
        ),
        "tile_hillshade": (
            # Lambertian hillshade: Horn p/q windows, constant
            # light vector, one sqrt -- identical float order to
            # hillshade_kernel
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1) "
            f"SELECT row, col, ROUND(255.0 * GREATEST("
            f"(CAST(-0.5000000000000001 AS DOUBLE) * (-p) "
            f"+ CAST(0.4999999999999999 AS DOUBLE) * (-q) "
            f"+ CAST(0.7071067811865475 AS DOUBLE)) "
            f"/ SQRT(1.0 + (p * p + q * q)), 0.0), 6) AS hillshade "
            f"FROM (SELECT row, col, "
            f"((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * 0.01) AS p, "
            f"((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * 0.01) AS q "
            f"FROM w WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
            f"AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
            f"AND zg > -1e30 AND zh > -1e30 AND zi > -1e30)"
        ),
        "idw_probes": (
            f"SELECT probe_id, ROUND(SUM(z / dd) / SUM(1.0 / dd), 6) AS idw_z "
            f"FROM (SELECT p.probe_id, g.z, "
            f"(g.lon - p.plon) * (g.lon - p.plon) "
            f"+ (g.lat - p.plat) * (g.lat - p.plat) AS dd "
            f"FROM (VALUES {probes_values}) p(probe_id, plon, plat), ({valid}) g "
            f"WHERE (g.lon - p.plon) * (g.lon - p.plon) "
            f"+ (g.lat - p.plat) * (g.lat - p.plat) <= 0.025 * 0.025"
            f") GROUP BY probe_id"
        ),
        "events_geocode_cells": (
            f"SELECT {_cell_expr_cols('glon', 'glat', 8)} AS cell_8, "
            f"COUNT(*) AS n FROM ("
            f"SELECT 77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS glon, "
            f"28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS glat "
            f"FROM events) GROUP BY 1"
        ),
        # The flagship's pages corpus is synthesized from the documents
        # view by integer doc_id formulas (pipelines/pages.py::
        # synthesize_pages_from_documents); the engine extracts the geo
        # span from REAL html ('%.6f' lat,lon) while this SQL replays
        # the same printf round-trip -- identical bytes, identical
        # parsed float64, identical frozen cell (VERDICT r4 item 2).
        "pages_flagship": _PAGES_FLAGSHIP_SQL,
        "pages_flagship_shuffle": _PAGES_FLAGSHIP_SQL,
        "window_funcs": (
            "WITH e AS (SELECT event_id, user_id, ts, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events) "
            "SELECT user_id, event_id, "
            "CAST(ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn, "
            "CAST(SUM(cents) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS BIGINT) AS cum_cents, "
            "CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) "
            "AS delta_us, "
            "ROUND(AVG(cents) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND "
            "CURRENT ROW) / 100.0, 6) AS mov_avg3 "
            "FROM e"
        ),
        "zscore_chars": (
            "WITH m AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(n_chars) AS DOUBLE) AS sx, "
            "CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sxx "
            "FROM documents GROUP BY lang) "
            "SELECT doc_id, "
            "ROUND((n_chars - sx / n) / "
            "sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS z "
            "FROM documents JOIN m USING (lang)"
        ),
        "hash_split": (
            "SELECT lang, CASE WHEN b < 80 THEN 'train' "
            "WHEN b < 90 THEN 'val' ELSE 'test' END AS split, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM "
            "(SELECT lang, ("
            + __import__("tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
                         fromlist=["mix32_sql"]).mix32_sql("doc_id", 17)
            + ") % 100 AS b FROM documents) GROUP BY lang, split"
        ),
        "intersect_users": (
            "SELECT DISTINCT user_id FROM events WHERE event_type = 'click' "
            "INTERSECT "
            "SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'"
        ),
        "bigram_counts": (
            "WITH w AS (SELECT list_filter(string_split(text, ' '), "
            "t -> t <> '') AS ws FROM documents), "
            "g AS (SELECT ws[i] || ' ' || ws[i+1] AS gram FROM w, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i)) "
            "SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM g "
            "GROUP BY gram ORDER BY n DESC, gram LIMIT 50"
        ),
        "dup_passages": (
            "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "t -> t <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] "
            "AS gram FROM w, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i)), "
            "d AS (SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd "
            "FROM g GROUP BY gram) "
            "SELECT gram, nd FROM d WHERE nd >= 2 "
            "ORDER BY nd DESC, gram LIMIT 50"
        ),
        "new_users_daily": (
            "WITH f AS (SELECT user_id, MIN(ts) AS fts FROM events "
            "GROUP BY user_id), "
            "d AS (SELECT date_trunc('day', fts) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS new_keys FROM f GROUP BY day) "
            "SELECT day, new_keys, "
            "CAST(SUM(new_keys) OVER (ORDER BY day) AS BIGINT) AS cum_keys "
            "FROM d"
        ),
        "pii_redact": (
            lambda _ep=__import__(
                "tiff_to_geojson_csv_json_format_converter_ray.stages.textops",
                fromlist=["PII_PATTERNS"],
            ).PII_PATTERNS: (
                "WITH s AS (SELECT doc_id, 'contact user' || "
                "CAST(doc_id AS VARCHAR) || '@' || source || '.com or +91' "
                "|| CAST(n_chars AS VARCHAR) || ' ' || substr(text, 1, 40) "
                "AS raw FROM documents) "
                "SELECT doc_id, "
                f"CAST(len(regexp_extract_all(raw, '{_ep[0][1]}')) AS BIGINT)"
                " AS n_email, "
                "CAST(len(regexp_extract_all(regexp_replace(raw, "
                f"'{_ep[0][1]}', '{_ep[0][2]}', 'g'), '{_ep[1][1]}')) "
                "AS BIGINT) AS n_number, "
                f"regexp_replace(regexp_replace(raw, '{_ep[0][1]}', "
                f"'{_ep[0][2]}', 'g'), '{_ep[1][1]}', '{_ep[1][2]}', 'g') "
                "AS redacted FROM s"
            )
        )(),
        "mode_source": (
            "SELECT lang, source AS mode, n FROM ("
            "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n, "
            "ROW_NUMBER() OVER (PARTITION BY lang "
            "ORDER BY COUNT(*) DESC, source) AS rn "
            "FROM documents GROUP BY lang, source) WHERE rn = 1"
        ),
        "pmi_bigrams": (
            "WITH w AS (SELECT list_filter(string_split(text, ' '), "
            "t -> t <> '') AS ws FROM documents), "
            "uni AS (SELECT unnest(ws) AS tok FROM w), "
            "u AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c "
            "FROM uni GROUP BY tok), "
            "nu AS (SELECT SUM(c) AS n1 FROM u), "
            "big AS (SELECT ws[i] AS w1, ws[i+1] AS w2, "
            "ws[i] || ' ' || ws[i+1] AS gram FROM w, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i)), "
            "b AS (SELECT w1, w2, gram, CAST(COUNT(*) AS DOUBLE) AS cb "
            "FROM big GROUP BY w1, w2, gram), "
            "nb AS (SELECT SUM(cb) AS n2 FROM b) "
            "SELECT gram, CAST(cb AS BIGINT) AS n, "
            "ROUND(ln((cb / n2) / ((u1.c / n1) * (u2.c / n1))), 6) AS pmi "
            "FROM b JOIN u u1 ON b.w1 = u1.tok "
            "JOIN u u2 ON b.w2 = u2.tok, nb, nu "
            "WHERE cb >= 5 ORDER BY pmi DESC, gram LIMIT 50"
        ),
        "except_docs": (
            "SELECT doc_id FROM documents WHERE contains(text, 'spark') "
            "EXCEPT "
            "SELECT doc_id FROM documents WHERE contains(text, 'vector')"
        ),
        "dow_histogram": (
            "SELECT CAST(isodow(ts) AS BIGINT) AS isodow, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY isodow"
        ),
        "lang_share": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, "
            "ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS share "
            "FROM documents GROUP BY lang"
        ),
        "lang_temperature_sample": (
            # identical float order to the engine: rate =
            # ROUND(min(1, pow(n,.3)/S*N/n), 6); keep iff
            # mix32(doc_id,29)/2^32 < rate
            "WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang), "
            "t AS (SELECT CAST(SUM(n) AS DOUBLE) AS big_n, "
            "SUM(POWER(CAST(n AS DOUBLE), 0.3)) AS s FROM c), "
            "r AS (SELECT lang, n, ROUND(LEAST(1.0, "
            "POWER(CAST(n AS DOUBLE), 0.3) / s * big_n / CAST(n AS DOUBLE)"
            "), 6) AS rate FROM c, t), "
            "k AS (SELECT d.lang, "
            "SUM(CASE WHEN CAST(("
            + __import__("tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
                         fromlist=["mix32_sql"]).mix32_sql("d.doc_id", 29)
            + ") AS DOUBLE) / 4294967296.0 < r.rate THEN 1 ELSE 0 END) AS n_after, "
            "SUM(CASE WHEN CAST(("
            + __import__("tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
                         fromlist=["mix32_sql"]).mix32_sql("d.doc_id", 29)
            + ") AS DOUBLE) / 4294967296.0 < r.rate THEN d.doc_id ELSE 0 END) "
            "AS sum_kept_ids FROM documents d JOIN r ON r.lang = d.lang "
            "GROUP BY d.lang) "
            "SELECT r.lang, CAST(r.n AS BIGINT) AS n_before, "
            "CAST(k.n_after AS BIGINT) AS n_after, "
            "CAST(k.sum_kept_ids AS BIGINT) AS sum_kept_ids "
            "FROM r JOIN k ON k.lang = r.lang"
        ),
        "ngram_repetition": (
            "WITH arr AS (SELECT doc_id, "
            "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') "
            "AS a FROM documents), "
            "tri AS (SELECT doc_id, UNNEST(list_transform("
            "range(1, len(a) - 1), "
            "i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS g "
            "FROM arr WHERE len(a) >= 3) "
            "SELECT doc_id, "
            "ROUND(1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*), 6) "
            "AS dup3 FROM tri GROUP BY doc_id"
        ),
        "cms_counts": (
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS est_n FROM "
            "(SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents) WHERE token <> '' GROUP BY token"
        ),
        "distinct_users_by_type": (
            "SELECT event_type, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "props_extract": (
            "SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY k"
        ),
        "funnel_steps": (
            "WITH v AS (SELECT user_id, MIN(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts > v.t "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "p AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts > c.t "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT 'view' AS step, CAST((SELECT COUNT(*) FROM v) AS BIGINT) "
            "AS n_reached "
            "UNION ALL SELECT 'click', CAST((SELECT COUNT(*) FROM c) AS "
            "BIGINT) "
            "UNION ALL SELECT 'purchase', CAST((SELECT COUNT(*) FROM p) AS "
            "BIGINT)"
        ),
        "string_agg_nations": (
            "SELECT c_nationkey, "
            "STRING_AGG(c_name, ',' ORDER BY c_custkey) AS agg "
            "FROM customer GROUP BY c_nationkey"
        ),
        "grouped_corr": (
            "WITH l AS (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
            "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS dollars "
            "FROM lineitem), "
            "m AS (SELECT l_returnflag, "
            "CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(qty) AS DOUBLE) AS sx, "
            "CAST(SUM(dollars) AS DOUBLE) AS sy, "
            "CAST(SUM(qty * qty) AS DOUBLE) AS sxx, "
            "CAST(SUM(dollars * dollars) AS DOUBLE) AS syy, "
            "CAST(SUM(qty * dollars) AS DOUBLE) AS sxy FROM l "
            "GROUP BY l_returnflag) "
            "SELECT l_returnflag, "
            "ROUND((n * sxy - sx * sy) / "
            "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) "
            "AS corr FROM m"
        ),
        "quantile_buckets": (
            "WITH b AS (SELECT "
            "quantile_disc(l_extendedprice, 0.25) AS q1, "
            "quantile_disc(l_extendedprice, 0.50) AS q2, "
            "quantile_disc(l_extendedprice, 0.75) AS q3 FROM lineitem), "
            "l AS (SELECT l_extendedprice AS v, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents "
            "FROM lineitem) "
            "SELECT CAST(1 + CAST(v > b.q1 AS INTEGER) "
            "+ CAST(v > b.q2 AS INTEGER) + CAST(v > b.q3 AS INTEGER) "
            "AS BIGINT) AS bucket, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents "
            "FROM l CROSS JOIN b GROUP BY bucket"
        ),
        "weighted_sample": (
            "SELECT o_orderkey, o_totalprice FROM ("
            "SELECT o_orderkey, o_totalprice, "
            "POWER((CAST("
            + __import__("tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
                         fromlist=["mix32_sql"]).mix32_sql("o_orderkey", 13)
            + " AS DOUBLE) + 1.0) / 4294967296.0, 1.0 / o_totalprice) "
            "AS pri FROM orders) ORDER BY pri DESC, o_orderkey LIMIT 25"
        ),
        "heavy_hitters": (
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM "
            "(SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents) WHERE token <> '' "
            "GROUP BY token HAVING COUNT(*) >= 50"
        ),
        "rollup_pricing": (
            "WITH l AS (SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents "
            "FROM lineitem) "
            "SELECT l_returnflag, l_linestatus, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents "
            "FROM l GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "pivot_events": (
            "WITH e AS (SELECT user_id, event_type, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events) "
            "SELECT user_id, "
            + ", ".join(
                f"COUNT(*) FILTER (WHERE event_type = '{c}') AS n_{c}, "
                f"CAST(COALESCE(SUM(cents) FILTER "
                f"(WHERE event_type = '{c}'), 0) AS BIGINT) AS sum_{c}"
                for c in ["click", "error", "purchase", "signup", "view"]
            )
            + " FROM e GROUP BY user_id"
        ),
        "track_lengths": (
            f"WITH g AS (SELECT user_id, ts, event_id, "
            f"77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            f"28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            f"FROM events), "
            f"s AS (SELECT user_id, "
            f"SQRT((lon - LAG(lon) OVER w) * (lon - LAG(lon) OVER w) "
            f"+ (lat - LAG(lat) OVER w) * (lat - LAG(lat) OVER w)) AS step "
            f"FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            f"SELECT user_id, ROUND(COALESCE(SUM(step), 0.0), 6) AS track_len "
            f"FROM s GROUP BY user_id"
        ),
        "geofence_transitions": _geofence_oracle_sql(),
        "polygon_coverage": _polygon_coverage_oracle_sql(),
        "boundary_distance": _boundary_distance_oracle_sql(),
        "bounce_rate": (
            "WITH s AS (SELECT user_id, epoch_us(ts) AS t, "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts) AS prev FROM events), "
            "m AS (SELECT user_id, "
            "SUM(CASE WHEN prev IS NULL OR t - prev > 1800000000 "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY t ROWS UNBOUNDED PRECEDING) AS sess FROM s), "
            "g AS (SELECT user_id, sess, COUNT(*) AS sz "
            "FROM m GROUP BY user_id, sess) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions, "
            "CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_bounces, "
            "ROUND(CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate "
            "FROM g GROUP BY user_id"
        ),
        "burstiness": (
            "WITH s AS (SELECT user_id, "
            "(epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts)) // 1000000 AS gap FROM events), "
            "g AS (SELECT user_id, gap FROM s WHERE gap IS NOT NULL), "
            "m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "AVG(CAST(gap AS DOUBLE)) AS mu, "
            "SQRT(GREATEST(AVG(CAST(gap AS DOUBLE) * CAST(gap AS DOUBLE)) "
            "- AVG(CAST(gap AS DOUBLE)) * AVG(CAST(gap AS DOUBLE)), 0.0)) "
            "AS sig FROM g GROUP BY user_id) "
            "SELECT user_id, n AS n_gaps, "
            "ROUND(CASE WHEN sig + mu = 0.0 THEN 0.0 "
            "ELSE (sig - mu) / (sig + mu) END, 6) AS burstiness FROM m"
        ),
        "hapax_ratio": (
            "WITH c AS (SELECT lang, token, COUNT(*) AS n FROM ("
            "SELECT lang, UNNEST(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM documents) WHERE token <> '' "
            "GROUP BY lang, token) "
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_vocab, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_hapax, "
            "ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio "
            "FROM c GROUP BY lang"
        ),
        "dedup_summary": (
            "WITH c AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents GROUP BY text) "
            "SELECT n AS cluster_size, CAST(COUNT(*) AS BIGINT) "
            "AS n_clusters, CAST(n * COUNT(*) AS BIGINT) AS n_docs "
            "FROM c GROUP BY n"
        ),
        "zipf_slope": (
            "WITH c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM (SELECT UNNEST(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM documents) WHERE token <> '' GROUP BY token), "
            "r AS (SELECT n, ROW_NUMBER() OVER "
            "(ORDER BY n DESC, token) AS rank FROM c), "
            "qz AS (SELECT "
            "CAST(ROUND(LN(CAST(rank AS DOUBLE)) * 10000.0, 0) AS BIGINT) AS xq, "
            "CAST(ROUND(LN(CAST(n AS DOUBLE)) * 10000.0, 0) AS BIGINT) AS yq "
            "FROM r), "
            "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy, "
            "CAST(SUM(xq * xq) AS BIGINT) AS sxx, "
            "CAST(SUM(xq * yq) AS BIGINT) AS sxy FROM qz) "
            "SELECT cnt AS n_vocab, "
            "ROUND(CAST(cnt * sxy - sx * sy AS DOUBLE) "
            "/ CAST(cnt * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope FROM m"
        ),
        "interval_union": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS s, "
            "epoch_us(ts) + 1800000000 AS f FROM events), "
            "o AS (SELECT user_id, s, f, MAX(f) OVER ("
            "PARTITION BY user_id ORDER BY s, f "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prev_max FROM e), "
            "isl AS (SELECT user_id, s, f, "
            "SUM(CASE WHEN prev_max IS NULL OR s > prev_max "
            "THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY s, f) AS island FROM o), "
            "g AS (SELECT user_id, island, MIN(s) AS st, MAX(f) AS en "
            "FROM isl GROUP BY user_id, island) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands, "
            "CAST(SUM(en - st) AS BIGINT) AS covered_us "
            "FROM g GROUP BY user_id"
        ),
        "kaplan_meier": (
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
            "/ CAST(ni AS DOUBLE) AS ratio FROM risk) "
            "SELECT t AS t_us, ni AS n_at_risk, di AS n_events, "
            "ROUND(CASE WHEN SUM(CASE WHEN ratio = 0.0 THEN 1 ELSE 0 END) "
            "OVER (ORDER BY t) > 0 THEN 0.0 ELSE "
            "EXP(SUM(LN(CASE WHEN ratio = 0.0 THEN 1.0 ELSE ratio END)) "
            "OVER (ORDER BY t)) END, 6) AS survival FROM r2"
        ),
        "aspect_classes": (
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1 "
            f"WHERE n1.z > -1e30 AND n2.z > -1e30 AND n3.z > -1e30 "
            f"AND n4.z > -1e30 AND e.z > -1e30 AND n6.z > -1e30 "
            f"AND n7.z > -1e30 AND n8.z > -1e30 AND n9.z > -1e30), "
            f"d AS (SELECT "
            f"-(((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * 0.01)) AS dx, "
            f"-(((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * 0.01)) AS dy "
            f"FROM w) "
            f"SELECT CASE WHEN ABS(dx) > ABS(dy) THEN "
            f"(CASE WHEN dx > 0 THEN 'E' ELSE 'W' END) "
            f"WHEN ABS(dy) > ABS(dx) THEN "
            f"(CASE WHEN dy > 0 THEN 'N' ELSE 'S' END) "
            f"WHEN dx > 0 AND dy > 0 THEN 'NE' "
            f"WHEN dx > 0 AND dy < 0 THEN 'SE' "
            f"WHEN dx < 0 AND dy > 0 THEN 'NW' "
            f"WHEN dx < 0 AND dy < 0 THEN 'SW' "
            f"ELSE 'FLAT' END AS octant, "
            f"CAST(COUNT(*) AS BIGINT) AS n_pixels FROM d GROUP BY octant"
        ),
        "line_of_sight": _line_of_sight_oracle_sql(),
        "kruskal_wallis": (
            # per-group rank sums in TYPE ORDER (left-assoc H sum
            # matches the engine loop over sorted types)
            "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
            "event_type FROM events), "
            "r AS (SELECT event_type, "
            "CAST(RANK() OVER (ORDER BY c) AS DOUBLE) "
            "+ (CAST(COUNT(*) OVER (PARTITION BY c) AS DOUBLE) - 1.0) / 2.0 "
            "AS avgrank FROM p), "
            "g AS (SELECT event_type, SUM(avgrank) AS r, "
            "CAST(COUNT(*) AS DOUBLE) AS m FROM r GROUP BY event_type), "
            "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(SUM(m) AS DOUBLE) AS big_n, "
            "SUM(r * r / m ORDER BY event_type) AS hterm FROM g) "
            "SELECT n_groups, CAST(big_n AS BIGINT) AS n_total, "
            "ROUND(12.0 / (big_n * (big_n + 1.0)) * hterm "
            "- 3.0 * (big_n + 1.0), 6) AS h_stat FROM s"
        ),
        "mann_whitney": (
            "WITH p AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c, "
            "(xor((((xor((((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296), (((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296) >> 16)) * 73244475) % 4294967296), (((xor((((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296), (((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296) >> 16)) * 73244475) % 4294967296) >> 16)) % 2 AS arm FROM events), "
            "r AS (SELECT arm, CAST(RANK() OVER (ORDER BY c) AS DOUBLE) "
            "+ (CAST(COUNT(*) OVER (PARTITION BY c) AS DOUBLE) - 1.0) / 2.0 "
            "AS avgrank FROM p), "
            "s AS (SELECT "
            "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, "
            "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b, "
            "SUM(CASE WHEN arm = 0 THEN avgrank ELSE 0.0 END) AS ra FROM r) "
            "SELECT n_a, n_b, ROUND(ra, 6) AS rank_sum_a, "
            "ROUND(ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0, 6) AS u_a, "
            "ROUND((ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1) / 2.0 "
            "- CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) "
            "/ SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) "
            "* (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1) / 12.0), 6) "
            "AS z_stat FROM s"
        ),
        "cover_bbox": _cover_bbox_oracle_sql(),
        "mutual_nn": (
            "WITH c AS (SELECT user_id, "
            "AVG(CAST(event_id % 96 AS DOUBLE)) AS cx, "
            "AVG(CAST((event_id // 96) % 96 AS DOUBLE)) AS cy "
            "FROM events GROUP BY user_id), "
            "nn AS (SELECT a.user_id AS u, b.user_id AS v, "
            "(a.cx - b.cx) * (a.cx - b.cx) "
            "+ (a.cy - b.cy) * (a.cy - b.cy) AS d2, "
            "ROW_NUMBER() OVER (PARTITION BY a.user_id ORDER BY "
            "(a.cx - b.cx) * (a.cx - b.cx) "
            "+ (a.cy - b.cy) * (a.cy - b.cy), b.user_id) AS rn "
            "FROM c a JOIN c b ON a.user_id <> b.user_id), "
            "best AS (SELECT u, v, d2 FROM nn WHERE rn = 1) "
            "SELECT x.u AS user_a, x.v AS user_b, "
            "ROUND(SQRT(x.d2), 6) AS dist "
            "FROM best x JOIN best y ON y.u = x.v AND y.v = x.u "
            "WHERE x.u < x.v"
        ),
        "abc_classes": (
            "WITH pp AS (SELECT l_partkey, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) "
            "AS BIGINT) AS rev FROM lineitem GROUP BY l_partkey), "
            "o AS (SELECT rev, SUM(rev) OVER ("
            "ORDER BY rev DESC, l_partkey "
            "ROWS UNBOUNDED PRECEDING) AS cum, "
            "SUM(rev) OVER () AS total FROM pp), "
            "c AS (SELECT rev, CASE "
            "WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8 "
            "THEN 'A' "
            "WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95 "
            "THEN 'B' ELSE 'C' END AS abc_class FROM o) "
            "SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts, "
            "CAST(SUM(rev) AS BIGINT) AS revenue_cents "
            "FROM c GROUP BY abc_class"
        ),
        "peak_concurrency": (
            "WITH e AS (SELECT epoch_us(ts) AS t, 1 AS d FROM events "
            "UNION ALL "
            "SELECT epoch_us(ts) + 1800000000 AS t, -1 AS d FROM events), "
            "r AS (SELECT SUM(d) OVER (ORDER BY t, d "
            "ROWS UNBOUNDED PRECEDING) AS running FROM e) "
            "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) "
            "AS n_intervals, "
            "CAST(MAX(running) AS BIGINT) AS peak_concurrency FROM r"
        ),
        "value_histogram": (
            "WITH p AS (SELECT event_type, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
            "mm AS (SELECT MIN(c) AS cmin, MAX(c) AS cmax FROM p), "
            "w AS (SELECT cmin, GREATEST((cmax - cmin + 19) // 20, 1) AS width FROM mm) "
            "SELECT event_type, "
            "LEAST((c - w.cmin) // w.width, 19) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM p, w GROUP BY event_type, bin"
        ),
        "word_degree_dist": (
            "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
            "WHERE LEN(source) >= 4), "
            "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
            "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
            "AND LEVENSHTEIN(a.w, b.w) = 1), "
            "d AS (SELECT w, COUNT(*) AS deg FROM ("
            "SELECT w1 AS w FROM e UNION ALL SELECT w2 FROM e) "
            "GROUP BY w) "
            "SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_words "
            "FROM d GROUP BY deg"
        ),

        "adaptive_quadtree": (
            # per-level floors (identical cell-size doubles), quadtree
            # walk by integer child//2 = parent joins
            f"WITH RECURSIVE pts AS (SELECT lon, lat FROM ({valid})), "
            "cnt AS (SELECT l.range AS r, "
            "CAST(FLOOR((lat + 90.0) / (360.0 / POWER(2.0, l.range + 8))) "
            "AS BIGINT) AS iy, "
            "CAST(FLOOR((lon + 180.0) / (360.0 / POWER(2.0, l.range + 8))) "
            "AS BIGINT) AS ix, COUNT(*) AS n "
            "FROM range(5, 9) l, pts GROUP BY r, iy, ix), "
            "o(r, iy, ix, n) AS ("
            "SELECT r, iy, ix, n FROM cnt WHERE r = 5 "
            "UNION ALL "
            "SELECT c.r, c.iy, c.ix, c.n FROM o JOIN cnt c "
            "ON c.r = o.r + 1 AND c.iy // 2 = o.iy AND c.ix // 2 = o.ix "
            "WHERE o.n > 12 AND o.r < 8) "
            "SELECT r AS res, iy, ix, CAST(n AS BIGINT) AS n_points "
            "FROM o WHERE n <= 12 OR r = 8"
        ),
        "spearman": (
            "WITH b AS (SELECT l_returnflag AS f, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS x, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y "
            "FROM lineitem), "
            "r AS (SELECT f, "
            "2 * RANK() OVER (PARTITION BY f ORDER BY x) "
            "+ COUNT(*) OVER (PARTITION BY f, x) - 1 AS sx, "
            "2 * RANK() OVER (PARTITION BY f ORDER BY y) "
            "+ COUNT(*) OVER (PARTITION BY f, y) - 1 AS sy FROM b), "
            "m AS (SELECT f, CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(sx) AS DOUBLE) AS sxs, "
            "CAST(SUM(sy) AS DOUBLE) AS sys, "
            "CAST(SUM(sx * sx) AS DOUBLE) AS sxx, "
            "CAST(SUM(sy * sy) AS DOUBLE) AS syy, "
            "CAST(SUM(sx * sy) AS DOUBLE) AS sxy FROM r GROUP BY f) "
            "SELECT f AS l_returnflag, CAST(n AS BIGINT) AS n, "
            "ROUND((n * sxy - sxs * sys) / SQRT("
            "(n * sxx - sxs * sxs) * (n * syy - sys * sys)), 6) "
            "AS spearman_rho FROM m"
        ),
        "anova_eta2": (
            "WITH p AS (SELECT event_type, "
            "(epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
            "h AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS sq "
            "FROM p GROUP BY event_type, hour), "
            "g AS (SELECT event_type, "
            "CAST(SUM(n) AS DOUBLE) AS big_n, "
            "CAST(SUM(s) AS DOUBLE) AS big_s, "
            "CAST(SUM(sq) AS DOUBLE) AS big_sq, "
            "SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) "
            "/ CAST(n AS DOUBLE)) AS bsum "
            "FROM h GROUP BY event_type) "
            "SELECT event_type, "
            "ROUND((bsum / big_n - (big_s / big_n) * (big_s / big_n)) "
            "/ (big_sq / big_n - (big_s / big_n) * (big_s / big_n)), 6) "
            "AS eta_squared FROM g"
        ),
        "ab_ztest": (
            "WITH u AS (SELECT user_id, (xor((((xor((((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296), (((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296) >> 16)) * 73244475) % 4294967296), (((xor((((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296), (((xor((((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((user_id) + 13) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((user_id) + 13) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296) >> 16)) * 73244475) % 4294967296) >> 16)) % 2 AS arm, "
            "CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 "
            "ELSE 0 END) >= 14 THEN 1 ELSE 0 END "
            "AS converted FROM events GROUP BY user_id, arm), "
            "s AS (SELECT "
            "CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0, "
            "CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1, "
            "CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS DOUBLE) AS k0, "
            "CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS DOUBLE) AS k1 "
            "FROM u) "
            "SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b, "
            "CAST(k0 AS BIGINT) AS conv_a, CAST(k1 AS BIGINT) AS conv_b, "
            "ROUND(k0 / n0, 6) AS rate_a, ROUND(k1 / n1, 6) AS rate_b, "
            "ROUND((k0 / n0 - k1 / n1) / SQRT((k0 + k1) / (n0 + n1) "
            "* (1.0 - (k0 + k1) / (n0 + n1)) * (1.0 / n0 + 1.0 / n1)), 6) "
            "AS z_stat FROM s"
        ),
        "readability": (
            "SELECT doc_id, "
            "CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words, "
            "CAST(GREATEST(LENGTH(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences, "
            "CAST(LENGTH(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_vowel_groups, "
            "ROUND(CASE WHEN LENGTH(regexp_extract_all(text, '\\S+')) = 0 "
            "THEN 0.0 ELSE 206.835 "
            "- 1.015 * (CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS DOUBLE) "
            "/ CAST(GREATEST(LENGTH(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)) "
            "- 84.6 * (CAST(LENGTH(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS DOUBLE) "
            "/ CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS DOUBLE)) END, 6) "
            "AS flesch FROM documents"
        ),
        "theil_sen": (
            # identical hash gate, pairwise slopes on exact ints,
            # quantile_disc median -- element selection, no sums
            "WITH p AS (SELECT event_id, event_type, epoch_us(ts) AS x, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS y FROM events "
            "WHERE (xor((((xor((((xor((((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296), (((xor((((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296) >> 16)) * 73244475) % 4294967296), (((xor((((xor((((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296), (((xor((((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295), (((((((((((event_id) + 41) & 4294967295)) >> 16) * 2654435761) & 65535) << 16) + ((((((event_id) + 41) & 4294967295)) & 65535) * 2654435761))) & 4294967295) >> 16)) * 73244475) % 4294967296) >> 16)) * 73244475) % 4294967296) >> 16)) % 7 = 0), "
            "pr AS (SELECT a.event_type, "
            "CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s "
            "FROM p a JOIN p b ON a.event_type = b.event_type "
            "AND a.event_id < b.event_id WHERE b.x - a.x <> 0) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
            "ROUND(quantile_disc(s, 0.5) * 86400000000.0, 6) AS ts_slope "
            "FROM pr GROUP BY event_type"
        ),
        "radius_of_gyration": (
            "WITH p AS (SELECT user_id, event_id % 96 AS ix, "
            "(event_id // 96) % 96 AS iy FROM events) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_fixes, "
            "ROUND(0.01 * SQRT(GREATEST("
            "(AVG(CAST(ix * ix AS DOUBLE)) "
            "- AVG(CAST(ix AS DOUBLE)) * AVG(CAST(ix AS DOUBLE))) "
            "+ (AVG(CAST(iy * iy AS DOUBLE)) "
            "- AVG(CAST(iy AS DOUBLE)) * AVG(CAST(iy AS DOUBLE))), 0.0)), 6) "
            "AS rog FROM p GROUP BY user_id"
        ),
        "visit_entropy": (
            "WITH g AS (SELECT user_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events), "
            "c AS (SELECT user_id, ((CAST(6 AS BIGINT) << 56) | (LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 0.02197265625) AS BIGINT), 0), 8191) << 28) | LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 0.02197265625) AS BIGINT), 0), 16383)) AS cell_6, "
            "CAST(COUNT(*) AS DOUBLE) AS n FROM g GROUP BY 1, 2), "
            "t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id) "
            "SELECT c.user_id, "
            "ROUND(LN(MAX(t.tot)) - SUM(c.n * LN(c.n)) / MAX(t.tot), 6) "
            "AS entropy FROM c JOIN t ON c.user_id = t.user_id "
            "GROUP BY c.user_id"
        ),
        "skew_report": (
            "WITH c AS (SELECT lang AS key, COUNT(*) AS n "
            "FROM documents GROUP BY lang), "
            "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk, "
            "CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50v, "
            "CAST(quantile_disc(n, 0.9) AS BIGINT) AS p90v, "
            "CAST(MAX(n) AS BIGINT) AS mx FROM c), "
            "t AS (SELECT key, n, "
            "ROW_NUMBER() OVER (ORDER BY n DESC, key) - 1 AS rank FROM c) "
            "SELECT t.rank, t.key, CAST(t.n AS BIGINT) AS key_count, "
            "s.nk AS n_keys, s.p50v AS p50, s.p90v AS p90, "
            "s.mx AS max_count, "
            "CAST(CEIL(CAST(s.mx AS DOUBLE) / CAST(s.p50v AS DOUBLE)) "
            "AS BIGINT) AS salt_k FROM t, s WHERE t.rank < 3"
        ),
        "cost_distance": (
            # min path cost over <= 8 edges from any seed = 8
            # synchronous Bellman-Ford rounds; bounded path expansion
            # with UNION dedup, equi-join on shifted (row, col)
            f"WITH RECURSIVE g AS ({_OG_SLOPE_GRID_SQL}), "
            "v AS (SELECT row, col, CAST(ROUND(z * 10, 0) AS BIGINT) "
            "AS e, z FROM g WHERE z > -1e30), "
            "dirs(dr, dc) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)), "
            "walk(row, col, cost, d) AS ("
            "SELECT row, col, CAST(0 AS BIGINT), 0 FROM v "
            "WHERE z >= 48.0 "
            "UNION "
            "SELECT n.row, n.col, walk.cost + n.e, walk.d + 1 "
            "FROM walk JOIN dirs ON TRUE "
            "JOIN v n ON n.row = walk.row + dirs.dr "
            "AND n.col = walk.col + dirs.dc "
            "WHERE walk.d < 8) "
            "SELECT row, col, MIN(cost) AS cost "
            "FROM walk GROUP BY row, col"
        ),
        "band_math_ndi": (
            # per-band formula grids joined on (row, col); guard and
            # expression identical to the engine kernel
            "WITH b1 AS (SELECT r.range AS row, c.range AS col, "
            "CASE WHEN (r.range * 5 + c.range * 3 + 1) % 29 = 0 "
            "THEN CAST(CAST(-3.4028234663852886e+38 AS REAL) AS DOUBLE) "
            "ELSE CAST(CAST(((r.range * 73 + c.range * 31 + 101) % 500) "
            "/ 10.0 AS REAL) AS DOUBLE) END AS z "
            "FROM range(0, 96) r, range(0, 96) c), "
            "b2 AS (SELECT r.range AS row, c.range AS col, "
            "CASE WHEN (r.range * 5 + c.range * 3 + 2) % 29 = 0 "
            "THEN CAST(CAST(-3.4028234663852886e+38 AS REAL) AS DOUBLE) "
            "ELSE CAST(CAST(((r.range * 73 + c.range * 31 + 202) % 500) "
            "/ 10.0 AS REAL) AS DOUBLE) END AS z "
            "FROM range(0, 96) r, range(0, 96) c) "
            "SELECT a.row AS row, a.col AS col, "
            "ROUND(CASE WHEN a.z + b.z = 0.0 THEN 0.0 "
            "ELSE (a.z - b.z) / (a.z + b.z) END, 6) AS ndi "
            "FROM b1 a JOIN b2 b ON b.row = a.row AND b.col = a.col "
            "WHERE a.z > -1e30 AND b.z > -1e30"
        ),
        "od_matrix": (
            "WITH g AS (SELECT user_id, ts, event_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events), "
            "s AS (SELECT user_id, lon, lat, LAG(lon) OVER w AS plon, "
            "LAG(lat) OVER w AS plat FROM g "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT ((CAST(6 AS BIGINT) << 56) | (LEAST(GREATEST(CAST(FLOOR((plat + 90.0) / 0.02197265625) AS BIGINT), 0), 8191) << 28) | LEAST(GREATEST(CAST(FLOOR((plon + 180.0) / 0.02197265625) AS BIGINT), 0), 16383)) AS cell_from, "
            "((CAST(6 AS BIGINT) << 56) | (LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 0.02197265625) AS BIGINT), 0), 8191) << 28) | LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 0.02197265625) AS BIGINT), 0), 16383)) AS cell_to, "
            "CAST(COUNT(*) AS BIGINT) AS n_trips FROM s "
            "WHERE plon IS NOT NULL GROUP BY cell_from, cell_to"
        ),
        "track_geodesic": (
            "WITH g AS (SELECT user_id, ts, event_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events), "
            "s AS (SELECT user_id, lon, lat, LAG(lon) OVER w AS plon, "
            "LAG(lat) OVER w AS plat FROM g "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "d AS (SELECT user_id, "
            "SIN((RADIANS(lat) - RADIANS(plat)) / 2.0) AS s1, "
            "SIN((RADIANS(lon) - RADIANS(plon)) / 2.0) AS s2, "
            "COS(RADIANS(plat)) AS c1, COS(RADIANS(lat)) AS c2 "
            "FROM s WHERE plon IS NOT NULL) "
            "SELECT user_id, CAST(COUNT(*) + 1 AS BIGINT) AS n_fixes, "
            "ROUND(SUM(12742.0 * ASIN(SQRT(s1 * s1 + c1 * c2 * (s2 * s2)))), 6) "
            "AS geo_len_km FROM d GROUP BY user_id"
        ),
        "track_straightness": (
            "WITH g AS (SELECT user_id, ts, event_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events), "
            "s AS (SELECT user_id, lon, lat, "
            "lon - LAG(lon) OVER w AS dx, lat - LAG(lat) OVER w AS dy, "
            "FIRST_VALUE(lon) OVER w AS lon0, "
            "FIRST_VALUE(lat) OVER w AS lat0, "
            "LAST_VALUE(lon) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS lon1, "
            "LAST_VALUE(lat) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS lat1 "
            "FROM g WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "agg AS (SELECT user_id, "
            "SUM(SQRT(dx * dx + dy * dy)) AS gross, "
            "MAX((lon1 - lon0) * (lon1 - lon0) "
            "+ (lat1 - lat0) * (lat1 - lat0)) AS net2 "
            "FROM s GROUP BY user_id) "
            "SELECT user_id, ROUND(SQRT(net2), 6) AS net_disp, "
            "ROUND(gross, 6) AS gross_len, "
            "ROUND(SQRT(net2) / gross, 6) AS straightness "
            "FROM agg WHERE gross > 0"
        ),
        "hourly_profile": (
            "SELECT event_type, "
            "(epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) "
            "AS DOUBLE) / COUNT(*) / 100.0, 6) AS mean_value "
            "FROM events GROUP BY event_type, hour"
        ),
        "linear_interp": (
            # bracketing rows via LATERAL top-1 in (ts, event_id)
            # order; int64 microsecond deltas, one float division
            "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
            "value FROM events), "
            "u AS (SELECT DISTINCT user_id FROM p), "
            "gr(gt) AS (VALUES (1704672000000000), (1705276800000000), (1705881600000000), (1706486400000000)), "
            "j AS (SELECT u.user_id, gr.gt, pv.t AS t0, pv.value AS v0, "
            "nx.t AS t1, nx.value AS v1 FROM u CROSS JOIN gr "
            "LEFT JOIN LATERAL (SELECT t, value FROM p "
            "WHERE p.user_id = u.user_id AND p.t <= gr.gt "
            "ORDER BY t DESC, event_id DESC LIMIT 1) pv ON TRUE "
            "LEFT JOIN LATERAL (SELECT t, value FROM p "
            "WHERE p.user_id = u.user_id AND p.t >= gr.gt "
            "ORDER BY t ASC, event_id ASC LIMIT 1) nx ON TRUE) "
            "SELECT user_id, gt AS grid_us, "
            "ROUND(CASE WHEN t1 = t0 THEN v0 ELSE v0 + (v1 - v0) * "
            "(CAST(gt - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)) END, 6) "
            "AS value_interp FROM j "
            "WHERE t0 IS NOT NULL AND t1 IS NOT NULL"
        ),
        "track_hausdorff": (
            # max-min squared distances both directions, sqrt at the
            # end; point sets from the geocode lattice, users 0-19
            "WITH g AS (SELECT user_id, event_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events WHERE user_id < 20), "
            "mab AS (SELECT a.user_id AS ua, b.user_id AS ub, "
            "a.event_id AS pid, "
            "MIN((a.lon - b.lon) * (a.lon - b.lon) "
            "+ (a.lat - b.lat) * (a.lat - b.lat)) AS md "
            "FROM g a JOIN g b ON a.user_id < b.user_id "
            "GROUP BY a.user_id, b.user_id, a.event_id), "
            "hab AS (SELECT ua, ub, MAX(md) AS h FROM mab GROUP BY ua, ub), "
            "mba AS (SELECT a.user_id AS ua, b.user_id AS ub, "
            "b.event_id AS pid, "
            "MIN((a.lon - b.lon) * (a.lon - b.lon) "
            "+ (a.lat - b.lat) * (a.lat - b.lat)) AS md "
            "FROM g a JOIN g b ON a.user_id < b.user_id "
            "GROUP BY a.user_id, b.user_id, b.event_id), "
            "hba AS (SELECT ua, ub, MAX(md) AS h FROM mba GROUP BY ua, ub) "
            "SELECT hab.ua AS user_a, hab.ub AS user_b, "
            "ROUND(SQRT(GREATEST(hab.h, hba.h)), 6) AS hausdorff "
            "FROM hab JOIN hba ON hba.ua = hab.ua AND hba.ub = hab.ub"
        ),

        "media_decode": (
            # recompute decoded-pixel stats from the formula grid:
            # AVG over the gray plane == AVG over 3 equal channels
            # (identical correctly-rounded quotients of exact sums)
            "WITH px AS (SELECT i.range AS i, "
            "(r.range * 73 + c.range * 31 + (i.range % 16) * 17 "
            "+ CASE WHEN i.range >= 16 AND r.range < 4 AND c.range < 4 "
            "THEN 100 ELSE 0 END) % 256 AS v "
            "FROM range(0, 24) i, range(0, 32) r, range(0, 32) c) "
            "SELECT 'm' || CAST(i AS VARCHAR) AS media_id, "
            "ROUND(AVG(CAST(v AS DOUBLE)), 6) AS pixel_mean, "
            "ROUND(SQRT(GREATEST(AVG(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) "
            "- AVG(CAST(v AS DOUBLE)) * AVG(CAST(v AS DOUBLE)), 0.0)), 6) "
            "AS pixel_std FROM px GROUP BY i"
        ),
        "media_decode_jpeg": (
            # the flat-block JPEG fixture decodes BIT-EXACTLY (even
            # values, q00=16), so the SQL just recomputes the block
            # rule: one row per 8x8 block == uniform pixel weights
            "WITH blk AS (SELECT i.range AS i, "
            "((br.range * 73 + bc.range * 31 + i.range * 17) % 128) * 2 "
            "AS v FROM range(0, 18) i, range(0, 4) br, range(0, 4) bc) "
            "SELECT 'j' || CAST(i AS VARCHAR) AS media_id, "
            "ROUND(AVG(CAST(v AS DOUBLE)), 6) AS pixel_mean, "
            "ROUND(SQRT(GREATEST(AVG(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) "
            "- AVG(CAST(v AS DOUBLE)) * AVG(CAST(v AS DOUBLE)), 0.0)), 6) "
            "AS pixel_std FROM blk GROUP BY i"
        ),
        "media_decode_flac": (
            # FLAC is lossless and the fixture is an integer formula
            # (s[t] = ((t*(i+3)) % 200) - 100, n_i = 600 + i*37), so
            # the SQL recomputes the exact moments the RFC 9639
            # decoder must reproduce sample-for-sample
            "WITH smp AS (SELECT i.range AS i, "
            "((t.range * (i.range + 3)) % 200) - 100 AS v "
            "FROM range(0, 10) i, range(0, 600 + 9 * 37) t "
            "WHERE t.range < 600 + i.range * 37) "
            "SELECT 'f' || CAST(i AS VARCHAR) AS media_id, "
            "ROUND(AVG(CAST(v AS DOUBLE)), 6) AS pixel_mean, "
            "ROUND(SQRT(GREATEST(AVG(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) "
            "- AVG(CAST(v AS DOUBLE)) * AVG(CAST(v AS DOUBLE)), 0.0)), 6) "
            "AS pixel_std FROM smp GROUP BY i"
        ),
        "media_mp4_metadata": (
            # the fixture's closed-form container fields; durations in
            # 0.25 s steps are exact in binary floats AND 1000-tick
            # integers, so equality is bit-exact
            "SELECT 'v' || CAST(i.range AS VARCHAR) AS media_id, "
            "1.0 + (i.range * 7 % 50) * 0.25 AS duration_seconds, "
            "CAST(CASE WHEN i.range % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) "
            "AS n_tracks, "
            "CASE WHEN i.range % 2 = 0 THEN 'avc1' ELSE 'vp09' END "
            "AS codec0 FROM range(0, 12) i"
        ),
        "media_webm_metadata": (
            "SELECT 'w' || CAST(i.range AS VARCHAR) AS media_id, "
            "'webm' AS brand, "
            "2.0 + (i.range * 11 % 40) * 0.25 AS duration_seconds, "
            "CAST(CASE WHEN i.range % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) "
            "AS n_tracks, 'V_VP9' AS codec0 FROM range(0, 10) i"
        ),
        "media_audio_metadata": (
            "SELECT 'a' || CAST(i.range AS VARCHAR) AS media_id, "
            "CASE WHEN i.range % 2 = 0 THEN 'flac' ELSE 'mp3' END AS fmt, "
            "CAST(CASE WHEN i.range % 2 = 0 THEN 48000 ELSE 44100 END "
            "AS BIGINT) AS rate, "
            "CAST(CASE WHEN i.range % 2 = 0 THEN 1 + (i.range // 2) % 2 "
            "ELSE 2 END AS BIGINT) AS channels, "
            "CASE WHEN i.range % 2 = 0 "
            "THEN (i.range + 1) * 12000 / 48000.0 "
            "ELSE (30 + i.range * 9) * 1152 / 44100.0 END "
            "AS duration_seconds, "
            "CAST(CASE WHEN i.range % 2 = 1 THEN "
            "[128, 192, 256][(i.range // 2) % 3 + 1] ELSE NULL END "
            "AS BIGINT) AS bitrate_kbps FROM range(0, 12) i"
        ),
        "media_ahash_pairs": (
            # recompute the decoded-pixel rule in SQL: block sums over
            # the formula grid, division-free mean bits, Hamming pairs
            "WITH px AS (SELECT i.range AS i, r.range AS r, c.range AS c, "
            "(r.range * 73 + c.range * 31 + (i.range % 16) * 17 "
            "+ CASE WHEN i.range >= 16 AND r.range < 4 AND c.range < 4 "
            "THEN 100 ELSE 0 END) % 256 AS v "
            "FROM range(0, 24) i, range(0, 32) r, range(0, 32) c), "
            "blk AS (SELECT i, (r // 4) * 8 + (c // 4) AS b, "
            "SUM(v) AS bs FROM px GROUP BY i, b), "
            "tot AS (SELECT i, SUM(v) AS ts FROM px GROUP BY i), "
            "bits AS (SELECT blk.i, blk.b, "
            "CASE WHEN blk.bs * 64 > tot.ts THEN 1 ELSE 0 END AS bit "
            "FROM blk JOIN tot ON tot.i = blk.i), "
            "ham AS (SELECT a.i AS ia, b.i AS ib, "
            "SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h "
            "FROM bits a JOIN bits b ON a.b = b.b "
            "AND 'm' || CAST(a.i AS VARCHAR) < 'm' || CAST(b.i AS VARCHAR) "
            "GROUP BY a.i, b.i) "
            "SELECT 'm' || CAST(ia AS VARCHAR) AS id_a, "
            "'m' || CAST(ib AS VARCHAR) AS id_b, "
            "CAST(h AS BIGINT) AS hamming FROM ham WHERE h <= 6"
        ),
        "media_ahash_pairs_banded": (
            # recompute the decoded-pixel rule in SQL: block sums over
            # the formula grid, division-free mean bits, Hamming pairs
            "WITH px AS (SELECT i.range AS i, r.range AS r, c.range AS c, "
            "(r.range * 73 + c.range * 31 + (i.range % 16) * 17 "
            "+ CASE WHEN i.range >= 16 AND r.range < 4 AND c.range < 4 "
            "THEN 100 ELSE 0 END) % 256 AS v "
            "FROM range(0, 24) i, range(0, 32) r, range(0, 32) c), "
            "blk AS (SELECT i, (r // 4) * 8 + (c // 4) AS b, "
            "SUM(v) AS bs FROM px GROUP BY i, b), "
            "tot AS (SELECT i, SUM(v) AS ts FROM px GROUP BY i), "
            "bits AS (SELECT blk.i, blk.b, "
            "CASE WHEN blk.bs * 64 > tot.ts THEN 1 ELSE 0 END AS bit "
            "FROM blk JOIN tot ON tot.i = blk.i), "
            "ham AS (SELECT a.i AS ia, b.i AS ib, "
            "SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h "
            "FROM bits a JOIN bits b ON a.b = b.b "
            "AND 'm' || CAST(a.i AS VARCHAR) < 'm' || CAST(b.i AS VARCHAR) "
            "GROUP BY a.i, b.i) "
            "SELECT 'm' || CAST(ia AS VARCHAR) AS id_a, "
            "'m' || CAST(ib AS VARCHAR) AS id_b, "
            "CAST(h AS BIGINT) AS hamming FROM ham WHERE h <= 6"
        ),
        "track_speed_stats": (
            "WITH g AS (SELECT user_id, ts, event_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events), "
            "s AS (SELECT user_id, lon - LAG(lon) OVER w AS dx, "
            "lat - LAG(lat) OVER w AS dy, "
            "date_diff('microsecond', LAG(ts) OVER w, ts) AS dt_us "
            "FROM g WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "v AS (SELECT user_id, SQRT(dx * dx + dy * dy) / "
            "(CAST(dt_us AS DOUBLE) / 3600000000.0) AS sp "
            "FROM s WHERE dt_us > 0) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_steps, "
            "ROUND(MAX(sp), 6) AS max_speed, "
            "CAST(SUM(CASE WHEN sp > 0.1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_speeding FROM v GROUP BY user_id"
        ),
        "debounce_events": (
            # sequential kept-set recurrence (last KEPT ts, 24 h) as a
            # recursive CTE in exact int64 microseconds
            "WITH RECURSIVE p AS (SELECT user_id, event_type, "
            "ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) - 1 AS i, "
            "epoch_us(ts) AS t, event_id FROM events), "
            "ext AS (SELECT user_id, event_type, COUNT(*) AS n "
            "FROM p GROUP BY user_id, event_type), "
            "rec(user_id, event_type, i, last_t, n_kept, sum_ids) AS ("
            "SELECT user_id, event_type, -1, CAST(NULL AS BIGINT), "
            "CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM ext "
            "UNION ALL "
            "SELECT q.user_id, q.event_type, q.i, "
            "CASE WHEN q.keep THEN q.t ELSE q.last_t END, "
            "q.n_kept + CAST(q.keep AS BIGINT), "
            "q.sum_ids + CASE WHEN q.keep THEN q.event_id ELSE 0 END "
            "FROM (SELECT rec.user_id, rec.event_type, rec.i + 1 AS i, "
            "rec.last_t, rec.n_kept, rec.sum_ids, p.t, p.event_id, "
            "(rec.last_t IS NULL OR p.t - rec.last_t >= 86400000000) "
            "AS keep "
            "FROM rec JOIN ext ON ext.user_id = rec.user_id "
            "AND ext.event_type = rec.event_type "
            "JOIN p ON p.user_id = rec.user_id "
            "AND p.event_type = rec.event_type AND p.i = rec.i + 1 "
            "WHERE rec.i + 1 < ext.n) q) "
            "SELECT rec.user_id, rec.event_type, "
            "CAST(ext.n AS BIGINT) AS n_events, rec.n_kept AS n_kept, "
            "rec.sum_ids AS sum_kept_ids "
            "FROM rec JOIN ext ON ext.user_id = rec.user_id "
            "AND ext.event_type = rec.event_type "
            "WHERE rec.i = ext.n - 1"
        ),
        "tile_focal_mode": (
            # 3x3 focal mode: identical window joins to tile_slope,
            # per-pixel count-per-value, MIN over the argmax ties
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1 "
            f"WHERE n1.z > -1e30 AND n2.z > -1e30 AND n3.z > -1e30 "
            f"AND n4.z > -1e30 AND e.z > -1e30 AND n6.z > -1e30 "
            f"AND n7.z > -1e30 AND n8.z > -1e30 AND n9.z > -1e30), "
            f"u AS (SELECT row, col, "
            f"UNNEST([za, zb, zc, zd, ze, zf, zg, zh, zi]) AS v FROM w), "
            f"c AS (SELECT row, col, v, COUNT(*) AS n FROM u "
            f"GROUP BY row, col, v), "
            f"m AS (SELECT row, col, MAX(n) AS mx FROM c GROUP BY row, col) "
            f"SELECT c.row, c.col, ROUND(MIN(c.v), 6) AS focal_mode "
            f"FROM c JOIN m ON m.row = c.row AND m.col = c.col "
            f"AND c.n = m.mx GROUP BY c.row, c.col"
        ),
        "tile_focal_median": (
            # 3x3 focal median: same window joins; lower-median
            # element selection via quantile_disc
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1 "
            f"WHERE n1.z > -1e30 AND n2.z > -1e30 AND n3.z > -1e30 "
            f"AND n4.z > -1e30 AND e.z > -1e30 AND n6.z > -1e30 "
            f"AND n7.z > -1e30 AND n8.z > -1e30 AND n9.z > -1e30), "
            f"u AS (SELECT row, col, "
            f"UNNEST([za, zb, zc, zd, ze, zf, zg, zh, zi]) AS v FROM w) "
            f"SELECT row, col, ROUND(quantile_disc(v, 0.5), 6) "
            f"AS focal_median FROM u GROUP BY row, col"
        ),
        "cusum_alarms": (
            # exact-integer CUSUM recurrence as a recursive CTE:
            # dev = cents * n - total, alarm/reset above 5000 * n
            "WITH RECURSIVE p AS (SELECT user_id, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) - 1 AS i, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events), "
            "ext AS (SELECT user_id, COUNT(*) AS n, SUM(cents) AS total "
            "FROM p GROUP BY user_id), "
            "rec(user_id, i, s, alarms) AS ("
            "SELECT user_id, -1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) "
            "FROM ext "
            "UNION ALL "
            "SELECT q.user_id, q.i, "
            "CASE WHEN q.alarm THEN CAST(0 AS BIGINT) ELSE q.s2 END, "
            "q.alarms + CAST(q.alarm AS BIGINT) "
            "FROM (SELECT rec.user_id, rec.i + 1 AS i, rec.alarms, "
            "GREATEST(CAST(0 AS BIGINT), "
            "rec.s + p.cents * ext.n - ext.total) AS s2, "
            "GREATEST(CAST(0 AS BIGINT), "
            "rec.s + p.cents * ext.n - ext.total) > 5000 * ext.n AS alarm "
            "FROM rec JOIN ext ON ext.user_id = rec.user_id "
            "JOIN p ON p.user_id = rec.user_id AND p.i = rec.i + 1 "
            "WHERE rec.i + 1 < ext.n) q) "
            "SELECT rec.user_id, CAST(ext.n AS BIGINT) AS n_points, "
            "rec.alarms AS n_alarms "
            "FROM rec JOIN ext ON ext.user_id = rec.user_id "
            "WHERE rec.i = ext.n - 1"
        ),
        "keyed_ewma": (
            # sequential recurrence e = 0.2*x + 0.8*e as a recursive
            # CTE (identical float-op order to the engine kernel;
            # 1.0 - 0.2 == 0.8 exactly in IEEE doubles)
            "WITH RECURSIVE p AS (SELECT user_id, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) - 1 AS i, value AS x FROM events), "
            "ext AS (SELECT user_id, COUNT(*) AS n FROM p GROUP BY user_id), "
            "rec(user_id, i, e) AS ("
            "SELECT user_id, 0, x FROM p WHERE i = 0 "
            "UNION ALL "
            "SELECT rec.user_id, rec.i + 1, 0.2 * p.x + 0.8 * rec.e "
            "FROM rec JOIN p ON p.user_id = rec.user_id "
            "AND p.i = rec.i + 1) "
            "SELECT rec.user_id, CAST(ext.n AS BIGINT) AS n_points, "
            "ROUND(rec.e, 6) AS ewma_last "
            "FROM rec JOIN ext ON ext.user_id = rec.user_id "
            "WHERE rec.i = ext.n - 1"
        ),
        "movement_directions": (
            "WITH g AS (SELECT user_id, ts, event_id, "
            "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
            "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            "FROM events), "
            "s AS (SELECT user_id, lon - LAG(lon) OVER w AS dx, "
            "lat - LAG(lat) OVER w AS dy FROM g "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "d AS (SELECT user_id, "
            "CASE WHEN ABS(dx) > ABS(dy) THEN "
            "(CASE WHEN dx > 0 THEN 'E' ELSE 'W' END) "
            "WHEN ABS(dy) > ABS(dx) THEN "
            "(CASE WHEN dy > 0 THEN 'N' ELSE 'S' END) "
            "WHEN dx > 0 AND dy > 0 THEN 'NE' "
            "WHEN dx > 0 AND dy < 0 THEN 'SE' "
            "WHEN dx < 0 AND dy > 0 THEN 'NW' "
            "ELSE 'SW' END AS direction "
            "FROM s WHERE dx IS NOT NULL "
            "AND NOT (dx = 0 AND dy = 0)) "
            "SELECT user_id, direction, CAST(COUNT(*) AS BIGINT) AS n_steps "
            "FROM d GROUP BY user_id, direction"
        ),
        "docs_pip_join": " UNION ALL ".join(
            f"SELECT '{pid}' AS polygon_id, CAST(COUNT(*) AS BIGINT) AS n FROM ("
            f"SELECT 77.0 + CAST(doc_id % 96 AS DOUBLE) * 0.01 AS lon, "
            f"28.05 + CAST((doc_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
            f"FROM documents) WHERE {_halfplane_sql(poly)}"
            for pid, poly in OG_POLYGONS.items()
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price, "
            "COUNT(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice, o_orderdate FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "events_by_type": (
            "SELECT event_type, COUNT(value) AS n, MIN(value) AS min_value, "
            "MAX(value) AS max_value FROM events GROUP BY event_type"
        ),
        "events_windowed": (
            "SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start, "
            "COUNT(value) AS n, MIN(value) AS min_value, MAX(value) AS max_value, "
            "ROUND(SUM(value), 4) AS sum_value FROM events GROUP BY 1"
        ),
        "events_hopping": (
            "SELECT window_start, COUNT(value) AS n, MIN(value) AS min_value, "
            "MAX(value) AS max_value FROM ("
            "SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS window_start, value FROM events "
            "UNION ALL "
            "SELECT (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000 AS window_start, value "
            "FROM events WHERE epoch_us(ts) < (epoch_us(ts) // 1800000000) * 1800000000 + 1800000000"
            ") GROUP BY window_start"
        ),
        "events_sessions": (
            "SELECT user_id, CAST(SUM(CASE WHEN prev IS NULL OR "
            "epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_sessions FROM (SELECT user_id, ts, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events) "
            "GROUP BY user_id"
        ),
        "supplier_by_nation": (
            "SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers, "
            "MIN(s.s_acctbal) AS min_acctbal, MAX(s.s_acctbal) AS max_acctbal "
            "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name"
        ),
        "parts_by_brand": (
            "SELECT p_brand, COUNT(p_retailprice) AS n, "
            "MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price, "
            "MAX(p_size) AS max_size FROM part GROUP BY p_brand"
        ),
        "docs_by_source": (
            "SELECT source, COUNT(n_chars) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY source"
        ),
        "quantiles_exact": (
            " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"CAST(quantile_disc(l_extendedprice, {q}) AS DOUBLE) AS value "
                "FROM lineitem"
                for q in (0.25, 0.5, 0.75, 0.95)
            )
        ),
        "stride_secondary": (
            f"SELECT pix, lon, lat, z FROM ("
            f"SELECT *, ROW_NUMBER() OVER (ORDER BY pix) - 1 AS i FROM ("
            f"SELECT pix, lon, lat, z FROM ({grid}) "
            f"WHERE pix % {OG_SAMPLE_RATE} = 0)) "
            f"WHERE i % ((SELECT COUNT(*) FROM ({grid}) "
            f"WHERE pix % {OG_SAMPLE_RATE} = 0) // 500) = 0"
        ),
        "knn_top3": (
            f"SELECT probe_id, rn - 1 AS rank, pix FROM ("
            f"SELECT p.probe_id, g.pix, ROW_NUMBER() OVER ("
            f"PARTITION BY p.probe_id ORDER BY "
            f"(g.lon - p.plon) * (g.lon - p.plon) + (g.lat - p.plat) * (g.lat - p.plat), g.pix"
            f") AS rn FROM (VALUES {probes_values}) p(probe_id, plon, plat), ({valid}) g"
            f") WHERE rn <= 3"
        ),
        "customer_nations": (
            "SELECT n.n_name, COUNT(c.c_custkey) AS n_customers FROM customer c "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
        ),
        "orders_monthly": (
            "SELECT date_trunc('month', o_orderdate) AS month, "
            "COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue "
            "FROM orders GROUP BY 1"
        ),
        "customer_regions": (
            "SELECT r.r_name, COUNT(c.c_custkey) AS n_customers "
            "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
        ),
        "customers_no_orders": (
            "SELECT c_nationkey, COUNT(c_custkey) AS n_customers "
            "FROM customer WHERE c_custkey NOT IN ("
            "SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0) "
            "GROUP BY c_nationkey"
        ),
        "distinct_langs": (
            "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"
        ),
        "top_docs_per_lang": (
            "SELECT doc_id, lang, n_chars, CAST(rn - 1 AS BIGINT) AS rank FROM ("
            "SELECT doc_id, lang, n_chars, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        "asof_join": (
            "SELECT e.event_id, epoch_us(e.ts) AS ts_us, "
            "(SELECT MAX(epoch_us(o.o_orderdate)) FROM orders o "
            "WHERE epoch_us(o.o_orderdate) <= epoch_us(e.ts)) AS asof_date_us "
            "FROM events e"
        ),
        "asof_lag": (
            "SELECT e.event_id, epoch_us(p.ts) AS asof_purchase_us, "
            "epoch_us(e.ts) - epoch_us(p.ts) AS lag_us "
            "FROM (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click') e "
            "ASOF LEFT JOIN (SELECT user_id, ts FROM events "
            "WHERE event_type = 'purchase') p "
            "ON e.user_id = p.user_id AND e.ts >= p.ts"
        ),
        "window_join_clicks": (
            "SELECT c.user_id, c.event_id AS click_id, "
            "p.event_id AS purchase_id "
            "FROM (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'click') c "
            "JOIN (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'purchase') p "
            "ON c.user_id = p.user_id AND epoch_us(p.ts) "
            f"BETWEEN epoch_us(c.ts) AND epoch_us(c.ts) + {_WINDOW_JOIN_US}"
        ),
        "asof_next": (
            "SELECT e.event_id, epoch_us(p.ts) AS next_purchase_us, "
            "epoch_us(p.ts) - epoch_us(e.ts) AS wait_us "
            "FROM (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click') e "
            "ASOF LEFT JOIN (SELECT user_id, ts FROM events "
            "WHERE event_type = 'purchase') p "
            "ON e.user_id = p.user_id AND e.ts <= p.ts"
        ),
        "url_parse_fields": _url_parse_fields_oracle_sql(),
        "url_canonicalize": (
            f"SELECT doc_id, {_canon_sql_expr()} AS canonical_url FROM "
            f"(SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents)"
        ),
        "url_dedup": (
            f"SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_pages, "
            f"MIN(doc_id) AS keeper FROM "
            f"(SELECT doc_id, {_canon_sql_expr()} AS canonical_url FROM "
            f"(SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents)) "
            f"GROUP BY canonical_url"
        ),
        "url_domain_stats": (
            f"SELECT rd AS registered_domain, CAST(COUNT(*) AS BIGINT) AS n_pages, "
            f"CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts, "
            f"CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            f"FROM (SELECT {_url_sql_field('registered_domain')} AS rd, "
            f"{_url_sql_field('host')} AS host, n_chars FROM "
            f"(SELECT {_URL_SQL} AS url, n_chars FROM documents)) GROUP BY rd"
        ),
        "domain_cap_sample": (
            f"SELECT host, doc_id, rn - 1 AS rank FROM ("
            f"SELECT host, doc_id, ROW_NUMBER() OVER ("
            f"PARTITION BY host ORDER BY doc_id) AS rn FROM "
            f"(SELECT {_url_sql_field('host')} AS host, doc_id FROM "
            f"(SELECT {_URL_SQL} AS url, doc_id FROM documents))"
            f") WHERE rn <= 3"
        ),
        "range_join": (
            "SELECT e.event_id, i.interval_id FROM events e JOIN "
            "(SELECT event_id AS interval_id, epoch_us(ts) AS s "
            "FROM events WHERE event_id % 97 = 0) i "
            "ON epoch_us(e.ts) >= i.s "
            f"AND epoch_us(e.ts) < i.s + {_RANGE_JOIN_WINDOW_US}"
        ),
        "range_join_partitioned": (
            "SELECT e.event_id, i.interval_id FROM events e JOIN "
            "(SELECT event_id AS interval_id, epoch_us(ts) AS s "
            "FROM events WHERE event_id % 97 = 0) i "
            "ON epoch_us(e.ts) >= i.s "
            f"AND epoch_us(e.ts) < i.s + {_RANGE_JOIN_WINDOW_US}"
        ),
        "bloom_semijoin": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "big_left_join": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_lonely "
            "FROM customer LEFT JOIN "
            "(SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o "
            "ON o.o_custkey = c_custkey GROUP BY 1"
        ),
        "big_join_revenue": (
            "SELECT o_orderpriority, "
            "ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "big_join_revenue_shuffle": (
            "SELECT o_orderpriority, "
            "ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "big_join_revenue_skew": (
            "SELECT o_orderpriority, "
            "ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "token_frequencies": (
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM ("
            "SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents) WHERE token <> '' "
            "GROUP BY token ORDER BY n DESC, token LIMIT 30"
        ),
        "tfidf_scores": (
            "WITH toks AS (SELECT doc_id, "
            "UNNEST(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "tk AS (SELECT * FROM toks WHERE token <> ''), "
            "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tk "
            "GROUP BY token), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tk "
            "GROUP BY doc_id, token), "
            "len AS (SELECT doc_id, COUNT(*) AS n_toks FROM tk "
            "GROUP BY doc_id) "
            "SELECT tf.doc_id, "
            "ROUND(SUM((tf.cnt / len.n_toks) * ln(n.n_docs / df.df)), 6) "
            "AS tfidf "
            "FROM tf JOIN df USING (token) JOIN len USING (doc_id) "
            "CROSS JOIN n GROUP BY tf.doc_id"
        ),
        "grouped_quantiles": (
            " UNION ALL ".join(
                f"SELECT l_returnflag, CAST({q} AS DOUBLE) AS q, "
                f"CAST(quantile_disc(l_extendedprice, {q}) AS DOUBLE) AS value "
                "FROM lineitem GROUP BY l_returnflag"
                for q in (0.25, 0.5, 0.95)
            )
        ),
        "reservoir_sample": (
            "SELECT o_orderkey, o_totalprice FROM orders ORDER BY "
            + __import__("tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
                         fromlist=["mix32_sql"]).mix32_sql("o_orderkey", 7)
            + ", o_orderkey LIMIT 20"
        ),
        "stratified_sample": (
            "SELECT lang, doc_id FROM ("
            "SELECT lang, doc_id, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY "
            + __import__("tiff_to_geojson_csv_json_format_converter_ray.functions.sketch",
                         fromlist=["mix32_sql"]).mix32_sql("doc_id", 11)
            + ", doc_id) AS rn FROM documents) WHERE rn <= 3"
        ),
        "dedup_exact": (
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        "token_counts": (
            "SELECT doc_id, CASE WHEN TRIM(text) = '' THEN 0 ELSE "
            "ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) END AS n_tokens_ws "
            "FROM documents"
        ),
        "pack_sequences": (
            # greedy per-lang packing replayed as a linear recursion:
            # row rn joins to rn+1, carrying (bin, acc)
            "WITH RECURSIVE toks AS ("
            "SELECT doc_id, lang, CASE WHEN TRIM(text) = '' THEN 0 ELSE "
            "ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) END AS n_tok, "
            "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn "
            "FROM documents), "
            "rec AS ("
            "SELECT lang, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS bin_id, n_tok AS acc "
            "FROM toks WHERE rn = 1 "
            "UNION ALL "
            "SELECT t.lang, t.rn, t.doc_id, t.n_tok, "
            "CASE WHEN r.acc > 0 AND r.acc + t.n_tok > 2048 "
            "THEN r.bin_id + 1 ELSE r.bin_id END, "
            "CASE WHEN r.acc > 0 AND r.acc + t.n_tok > 2048 "
            "THEN t.n_tok ELSE r.acc + t.n_tok END "
            "FROM rec r JOIN toks t ON t.lang = r.lang AND t.rn = r.rn + 1) "
            "SELECT doc_id, lang, n_tok, bin_id FROM rec"
        ),
        "contamination": (
            # 5-grams via inclusive list slicing toks[i:i+4]
            "WITH toks AS (SELECT doc_id, "
            "REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS t "
            "FROM documents WHERE TRIM(text) <> ''), "
            "grams AS (SELECT doc_id, "
            "UNNEST([ARRAY_TO_STRING(t[i:i+4], ' ') FOR i IN RANGE(1, LEN(t) - 3)]) AS gram "
            "FROM toks WHERE LEN(t) >= 5), "
            "bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0), "
            "hits AS (SELECT g.doc_id, "
            "CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_contam "
            "FROM grams g JOIN bench b USING (gram) "
            "WHERE g.doc_id % 97 <> 0 GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(h.n_contam, 0) AS n_contam "
            "FROM documents d LEFT JOIN hits h USING (doc_id) "
            "WHERE d.doc_id % 97 <> 0"
        ),
        "cube_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "rolling_hour_sum": (
            "WITH e AS (SELECT event_id, user_id, ts, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events) "
            "SELECT user_id, event_id, "
            "CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS roll_cents FROM e"
        ),
        "postings": (
            "WITH pairs AS (SELECT DISTINCT doc_id, token FROM ("
            "SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), "
            "'\\s+')) AS token FROM documents WHERE TRIM(text) <> '')"
            " WHERE token <> '') "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS df, "
            "STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS postings FROM pairs GROUP BY token"
        ),
        "haversine_radius": (
            f"WITH probes(probe_id, plon, plat) AS (VALUES {probes_values}), "
            f"v AS ({valid}), "
            f"d AS (SELECT p.probe_id, v.pix, "
            f"SIN((RADIANS(v.lat) - RADIANS(p.plat)) / 2.0) AS s1, "
            f"SIN((RADIANS(v.lon) - RADIANS(p.plon)) / 2.0) AS s2, "
            f"COS(RADIANS(p.plat)) AS c1, COS(RADIANS(v.lat)) AS c2 "
            f"FROM probes p, v) "
            f"SELECT probe_id, pix, ROUND(dist_km, 6) AS dist_km FROM ("
            f"SELECT probe_id, pix, "
            f"12742.0 * ASIN(SQRT(s1 * s1 + c1 * c2 * (s2 * s2))) AS dist_km "
            f"FROM d) WHERE dist_km <= 3.0"
        ),
        "polygon_centroid": _centroid_oracle_sql(),
        "flow_direction": (
            # D8 steepest-descent code; same window joins/validity as
            # tile_slope, GREATEST + priority CASE for the tie-break
            f"WITH g AS ({_OG_SLOPE_GRID_SQL}), w AS ("
            f"SELECT e.row AS row, e.col AS col, "
            f"n1.z AS za, n2.z AS zb, n3.z AS zc, n4.z AS zd, e.z AS ze, "
            f"n6.z AS zf, n7.z AS zg, n8.z AS zh, n9.z AS zi "
            f"FROM g e "
            f"JOIN g n1 ON n1.row = e.row - 1 AND n1.col = e.col - 1 "
            f"JOIN g n2 ON n2.row = e.row - 1 AND n2.col = e.col "
            f"JOIN g n3 ON n3.row = e.row - 1 AND n3.col = e.col + 1 "
            f"JOIN g n4 ON n4.row = e.row AND n4.col = e.col - 1 "
            f"JOIN g n6 ON n6.row = e.row AND n6.col = e.col + 1 "
            f"JOIN g n7 ON n7.row = e.row + 1 AND n7.col = e.col - 1 "
            f"JOIN g n8 ON n8.row = e.row + 1 AND n8.col = e.col "
            f"JOIN g n9 ON n9.row = e.row + 1 AND n9.col = e.col + 1 "
            f"WHERE za > -1e30 AND zb > -1e30 AND zc > -1e30 "
            f"AND zd > -1e30 AND ze > -1e30 AND zf > -1e30 "
            f"AND zg > -1e30 AND zh > -1e30 AND zi > -1e30), "
            f"d AS (SELECT row, col, "
            f"(ze - zf) / 1.0 AS de, (ze - zi) / SQRT(2.0) AS dse, "
            f"(ze - zh) / 1.0 AS ds, (ze - zg) / SQRT(2.0) AS dsw, "
            f"(ze - zd) / 1.0 AS dw, (ze - za) / SQRT(2.0) AS dnw, "
            f"(ze - zb) / 1.0 AS dn, (ze - zc) / SQRT(2.0) AS dne "
            f"FROM w) "
            f"SELECT row, col, CAST(CASE "
            f"WHEN GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) <= 0 THEN 0 "
            f"WHEN de = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 1 "
            f"WHEN dse = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 2 "
            f"WHEN ds = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 4 "
            f"WHEN dsw = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 8 "
            f"WHEN dw = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 16 "
            f"WHEN dnw = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 32 "
            f"WHEN dn = GREATEST(de, dse, ds, dsw, dw, dnw, dn, dne) THEN 64 "
            f"ELSE 128 END AS BIGINT) AS d8 FROM d"
        ),
        "scd2_intervals": (
            # gaps-and-islands run compression: island id = cumulative
            # count of change points, interval = island min ts, next
            # island's start via LEAD over islands
            "WITH s AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM "
            "event_type THEN 1 ELSE 0 END AS chg FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "i AS (SELECT *, SUM(chg) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS isl FROM s), "
            "r AS (SELECT user_id, isl, "
            "FIRST(event_type ORDER BY ts, event_id) AS event_type, "
            "MIN(ts) AS valid_from FROM i GROUP BY user_id, isl) "
            "SELECT user_id, event_type, valid_from, "
            "LEAD(valid_from) OVER (PARTITION BY user_id "
            "ORDER BY valid_from) AS valid_to "
            "FROM r ORDER BY user_id, valid_from"
        ),
        "lorenz_deciles": (
            "WITH r AS (SELECT o_custkey, "
            "SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev "
            "FROM orders GROUP BY o_custkey), "
            "d AS (SELECT rev, NTILE(10) OVER "
            "(ORDER BY rev, o_custkey) AS decile FROM r), "
            "t AS (SELECT CAST(SUM(rev) AS DOUBLE) AS tot FROM d), "
            "g AS (SELECT decile, SUM(rev) AS drev FROM d GROUP BY decile) "
            "SELECT CAST(decile AS BIGINT) AS decile, "
            "ROUND(CAST(SUM(drev) OVER (ORDER BY decile) AS DOUBLE) "
            "/ t.tot, 6) AS cum_share FROM g, t ORDER BY decile"
        ),
        "first_touch_attribution": (
            "WITH s AS (SELECT user_id, CAST(ts AS DATE) AS d, "
            "FIRST(event_type ORDER BY ts, event_id) AS first_touch, "
            "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS conv FROM events GROUP BY user_id, CAST(ts AS DATE)) "
            "SELECT first_touch, CAST(COUNT(*) AS BIGINT) AS n_sessions, "
            "ROUND(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 6) AS conv_rate "
            "FROM s GROUP BY first_touch"
        ),
        "mutual_information": (
            "WITH c AS (SELECT event_type AS a, "
            "CAST(ISODOW(ts) AS BIGINT) AS b, "
            "CAST(COUNT(*) AS DOUBLE) AS n FROM events GROUP BY 1, 2), "
            "t AS (SELECT SUM(n) AS tot FROM c), "
            "ra AS (SELECT a, SUM(n) AS na FROM c GROUP BY a), "
            "rb AS (SELECT b, SUM(n) AS nb FROM c GROUP BY b) "
            "SELECT ROUND(SUM((c.n / t.tot) * LN((c.n / t.tot) "
            "/ ((ra.na / t.tot) * (rb.nb / t.tot)))), 6) AS mi_nats "
            "FROM c CROSS JOIN t "
            "JOIN ra ON ra.a = c.a JOIN rb ON rb.b = c.b"
        ),
        "tukey_outliers": (
            "WITH c AS (SELECT l_returnflag, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents "
            "FROM lineitem), "
            "b AS (SELECT l_returnflag, "
            "CAST(quantile_disc(cents, 0.25) AS DOUBLE) AS q1, "
            "CAST(quantile_disc(cents, 0.75) AS DOUBLE) AS q3 "
            "FROM c GROUP BY l_returnflag), "
            "f AS (SELECT l_returnflag, "
            "q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi "
            "FROM b) "
            "SELECT c.l_returnflag, "
            "ROUND(MAX(f.lo) / 100.0, 6) AS fence_lo, "
            "ROUND(MAX(f.hi) / 100.0, 6) AS fence_hi, "
            "CAST(SUM(CASE WHEN CAST(c.cents AS DOUBLE) < f.lo "
            "OR CAST(c.cents AS DOUBLE) > f.hi THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_outliers, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM c JOIN f ON c.l_returnflag = f.l_returnflag "
            "GROUP BY c.l_returnflag"
        ),
        "benford_deviation": (
            "WITH d AS (SELECT CAST(FLOOR(o_totalprice / "
            "POWER(10.0, FLOOR(LOG10(o_totalprice)))) AS BIGINT) "
            "AS digit FROM orders), "
            "c AS (SELECT digit, CAST(COUNT(*) AS DOUBLE) AS n "
            "FROM d GROUP BY digit), "
            "t AS (SELECT SUM(n) AS tot FROM c) "
            "SELECT digit, ROUND(n / t.tot, 6) AS share, "
            "ROUND(ABS(n / t.tot - LOG10(1.0 + 1.0 / digit)), 6) "
            "AS abs_dev FROM c, t"
        ),
        "hhi_concentration": (
            "WITH c AS (SELECT lang, source, "
            "CAST(COUNT(*) AS DOUBLE) AS n FROM documents "
            "GROUP BY lang, source), "
            "t AS (SELECT lang, SUM(n) AS tot FROM c GROUP BY lang) "
            "SELECT c.lang, "
            "ROUND(SUM((c.n / t.tot) * (c.n / t.tot)), 6) AS hhi "
            "FROM c JOIN t ON c.lang = t.lang GROUP BY c.lang"
        ),
        "ks_statistic": (
            "WITH c AS (SELECT "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents, "
            "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
            "AS DOUBLE) AS nr, "
            "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) "
            "AS DOUBLE) AS na FROM lineitem "
            "WHERE l_returnflag IN ('R', 'A') GROUP BY cents), "
            "t AS (SELECT SUM(nr) AS tr, SUM(na) AS ta FROM c), "
            "w AS (SELECT SUM(nr) OVER (ORDER BY cents) / t.tr AS cr, "
            "SUM(na) OVER (ORDER BY cents) / t.ta AS ca FROM c, t) "
            "SELECT ROUND(MAX(ABS(cr - ca)), 6) AS ks_d FROM w"
        ),
        "cramers_v": (
            "WITH c AS (SELECT event_type AS a, "
            "CAST(ISODOW(ts) AS BIGINT) AS b, "
            "CAST(COUNT(*) AS DOUBLE) AS n FROM events GROUP BY 1, 2), "
            "ra AS (SELECT a, SUM(n) AS na FROM c GROUP BY a), "
            "rb AS (SELECT b, SUM(n) AS nb FROM c GROUP BY b), "
            "t AS (SELECT SUM(n) AS tot FROM c), "
            "f AS (SELECT ra.na, rb.nb, COALESCE(c.n, 0) AS n "
            "FROM ra CROSS JOIN rb "
            "LEFT JOIN c ON c.a = ra.a AND c.b = rb.b), "
            "x AS (SELECT SUM((n - na * nb / t.tot) * (n - na * nb "
            "/ t.tot) / (na * nb / t.tot)) AS chi2, "
            "MAX(t.tot) AS n, "
            "(SELECT COUNT(*) FROM ra) AS r, "
            "(SELECT COUNT(*) FROM rb) AS c FROM f, t) "
            "SELECT ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 6) "
            "AS cramers_v FROM x"
        ),
        "centroid_confusion": (
            "WITH raw AS (SELECT vec_id, CAST(label AS BIGINT) AS label, "
            "UNNEST(embedding) AS v, "
            "GENERATE_SUBSCRIPTS(embedding, 1) AS i FROM embeddings), "
            "c AS (SELECT label, i, CAST(SUM(CAST(CASE WHEN "
            "CAST(v AS DOUBLE) < 0 "
            "THEN -FLOOR(-CAST(v AS DOUBLE) * 1000000.0 + 0.5) "
            "ELSE FLOOR(CAST(v AS DOUBLE) * 1000000.0 + 0.5) END "
            "AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mu "
            "FROM raw GROUP BY 1, 2), "
            "d AS (SELECT raw.vec_id, c.label AS cand, "
            "SUM((CAST(raw.v AS DOUBLE) - c.mu) * "
            "(CAST(raw.v AS DOUBLE) - c.mu)) AS d2 "
            "FROM raw JOIN c ON c.i = raw.i GROUP BY 1, 2), "
            "p AS (SELECT vec_id, cand AS pred FROM "
            "(SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            "ORDER BY d2, cand) AS rn FROM d) WHERE rn = 1), "
            "t AS (SELECT vec_id, CAST(label AS BIGINT) AS true_label "
            "FROM embeddings) "
            "SELECT t.true_label, p.pred AS pred_label, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM t "
            "JOIN p USING (vec_id) GROUP BY 1, 2"
        ),
        "label_scatter": (
            # mirror of stages/ann.py label_scatter: same quantizer as
            # label_centroids, variance identity per (label, dim),
            # dims summed in order
            "WITH q AS (SELECT CAST(label AS BIGINT) AS label, i, "
            "CAST(CASE WHEN CAST(v AS DOUBLE) < 0 "
            "THEN -FLOOR(-CAST(v AS DOUBLE) * 1000000.0 + 0.5) "
            "ELSE FLOOR(CAST(v AS DOUBLE) * 1000000.0 + 0.5) END "
            "AS BIGINT) AS qv FROM (SELECT label, UNNEST(embedding) AS v, "
            "GENERATE_SUBSCRIPTS(embedding, 1) AS i FROM embeddings)), "
            "m AS (SELECT label, i, CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(qv) AS DOUBLE) AS sq, "
            "CAST(SUM(qv * qv) AS DOUBLE) AS sqq FROM q GROUP BY 1, 2) "
            "SELECT label, "
            "ROUND(SUM(sqq / n - (sq / n) * (sq / n)) "
            "/ (1000000.0 * 1000000.0), 6) AS scatter "
            "FROM m GROUP BY label"
        ),
        "label_centroids": (
            "SELECT label, i AS dim, "
            "ROUND(CAST(SUM(qv) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) "
            "AS mean_v FROM ("
            "SELECT CAST(label AS BIGINT) AS label, i, "
            "CAST(CASE WHEN CAST(v AS DOUBLE) < 0 "
            "THEN -FLOOR(-CAST(v AS DOUBLE) * 1000000.0 + 0.5) "
            "ELSE FLOOR(CAST(v AS DOUBLE) * 1000000.0 + 0.5) END AS BIGINT) "
            "AS qv FROM (SELECT label, UNNEST(embedding) AS v, "
            "GENERATE_SUBSCRIPTS(embedding, 1) AS i FROM embeddings)) "
            "GROUP BY 1, 2"
        ),
        "corr_matrix": _corr_matrix_oracle_sql(),
        "locf_resample": (
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CAST(ROUND(value * 100, 0) AS BIGINT) AS cents, "
            "CAST(ts AS DATE) AS d FROM events), "
            "lastper AS (SELECT user_id, d, cents FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, d "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM e) WHERE rn = 1), "
            "bounds AS (SELECT user_id, MIN(d) AS dmin, MAX(d) AS dmax "
            "FROM e GROUP BY 1), "
            "grid AS (SELECT user_id, "
            "CAST(UNNEST(GENERATE_SERIES(CAST(dmin AS TIMESTAMP), "
            "CAST(dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS TIMESTAMP) AS day "
            "FROM bounds) "
            "SELECT g.user_id, g.day, l.cents FROM grid g "
            "ASOF JOIN lastper l ON g.user_id = l.user_id "
            "AND g.day >= CAST(l.d AS TIMESTAMP)"
        ),
        "edit1_pairs": (
            "WITH v AS (SELECT DISTINCT source AS token FROM documents "
            "WHERE LEN(source) >= 4) "
            "SELECT a.token AS w1, b.token AS w2 FROM v a JOIN v b "
            "ON a.token < b.token "
            "AND ABS(LEN(a.token) - LEN(b.token)) <= 1 "
            "AND LEVENSHTEIN(a.token, b.token) = 1"
        ),
        "retention_matrix": (
            "WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d "
            "FROM events), "
            "c AS (SELECT user_id, MIN(d) AS cohort FROM ud GROUP BY 1) "
            "SELECT CAST(c.cohort AS TIMESTAMP) AS cohort_day, "
            "CAST(ud.d - c.cohort AS BIGINT) AS day_offset, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM ud JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "decayed_counts": (
            # weights as int64 powers of two -> the sum is exact; the
            # single final division is the only float op
            "SELECT event_type, "
            "CAST(SUM(CASE WHEN age BETWEEN 0 AND 40 "
            "THEN CAST(1 AS BIGINT) << (40 - age) ELSE 0 END) AS DOUBLE) "
            "/ 1099511627776.0 AS decayed_n "
            "FROM (SELECT event_type, "
            "DATE '2024-02-01' - CAST(ts AS DATE) AS age FROM events) "
            "GROUP BY 1"
        ),
        "pareto_front": (
            # dominance stated independently (NOT EXISTS) over the
            # min-price-per-quantity reduction
            "WITH pts AS (SELECT l_quantity AS qty, "
            "MIN(l_extendedprice) AS price FROM lineitem GROUP BY 1) "
            "SELECT qty, price FROM pts a WHERE NOT EXISTS ("
            "SELECT 1 FROM pts b WHERE b.qty >= a.qty "
            "AND b.price <= a.price "
            "AND (b.qty > a.qty OR b.price < a.price))"
        ),
        "grouped_mad": (
            "SELECT l_returnflag, MAD(l_quantity) AS mad "
            "FROM lineitem GROUP BY 1"
        ),
        "grouped_regression": (
            # mirror of pipelines/relational.py grouped_regression:
            # exact integer moments, closed-form slope/intercept
            "WITH l AS (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
            "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS dollars "
            "FROM lineitem), "
            "m AS (SELECT l_returnflag, "
            "CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(qty) AS DOUBLE) AS sx, "
            "CAST(SUM(dollars) AS DOUBLE) AS sy, "
            "CAST(SUM(qty * qty) AS DOUBLE) AS sxx, "
            "CAST(SUM(qty * dollars) AS DOUBLE) AS sxy FROM l "
            "GROUP BY l_returnflag) "
            "SELECT l_returnflag, "
            "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope, "
            "ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,"
            " 6) AS intercept FROM m"
        ),
        "lang_entropy": (
            "WITH c AS (SELECT lang, source, "
            "CAST(COUNT(*) AS DOUBLE) AS n FROM documents "
            "GROUP BY lang, source), "
            "t AS (SELECT lang, SUM(n) AS tot FROM c GROUP BY lang) "
            "SELECT c.lang, "
            "ROUND(LN(MAX(t.tot)) - SUM(c.n * LN(c.n)) / MAX(t.tot), 6) "
            "AS entropy FROM c JOIN t ON c.lang = t.lang GROUP BY c.lang"
        ),
        "geomean_price": (
            # fixed-point log-sum mirror of grouped_geomean (exact
            # int64 combine, exp once per group)
            "WITH l AS (SELECT p_brand, "
            "CAST(ROUND(LN(p_retailprice) * 1e12, 0) AS BIGINT) AS q "
            "FROM part) "
            "SELECT p_brand, "
            "ROUND(EXP(CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1e12)), 6) "
            "AS geomean FROM l GROUP BY p_brand"
        ),
        "user_streaks": (
            "WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d "
            "FROM events), "
            "isl AS (SELECT user_id, d, ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY d) AS rn FROM days), "
            "runs AS (SELECT user_id, COUNT(*) AS len FROM isl "
            "GROUP BY user_id, d - CAST(rn AS INTEGER)) "
            "SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak "
            "FROM runs GROUP BY user_id"
        ),
        "profile_lineitem": (
            " UNION ALL ".join(
                "SELECT '" + c + "' AS \"column\", "
                "CAST(COUNT(*) AS BIGINT) AS n, "
                "CAST(SUM(CASE WHEN " + c + " IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT) AS n_null, "
                "CAST(COUNT(DISTINCT " + c + ") AS BIGINT) AS n_distinct, "
                + (
                    "ROUND(CAST(MIN(" + c + ") AS DOUBLE), 6) AS min_v, "
                    "ROUND(CAST(MAX(" + c + ") AS DOUBLE), 6) AS max_v "
                    if c in ("l_quantity", "l_extendedprice")
                    else "CAST(NULL AS DOUBLE) AS min_v, "
                         "CAST(NULL AS DOUBLE) AS max_v "
                )
                + "FROM lineitem"
                for c in ("l_quantity", "l_extendedprice",
                          "l_returnflag", "l_linestatus")
            )
        ),
        "kde_density": (
            "WITH e AS (SELECT CAST(x AS DOUBLE) AS x FROM "
            "unnest([50000, 100000, 150000, 200000, 250000, 300000, "
            "350000, 400000, 450000]) t(x)), "
            "s AS (SELECT e.x, SUM(EXP(-0.5 * ((e.x - o_totalprice) "
            "/ 25000.0) * ((e.x - o_totalprice) / 25000.0))) AS sk, "
            "CAST(COUNT(*) AS DOUBLE) AS n "
            "FROM e CROSS JOIN orders GROUP BY e.x) "
            "SELECT x, ROUND(sk / (n * 25000.0 * SQRT(2 * PI())) "
            "* 1e6, 6) AS density FROM s"
        ),
        "lagged_crosscorr": (
            "WITH d AS (SELECT "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "CAST(COUNT(*) AS DOUBLE) AS n, "
            "SUM(value) / COUNT(*) AS mv FROM events GROUP BY 1), "
            "l AS (SELECT lag.i AS lag, a.n AS x, b.mv AS y "
            "FROM (SELECT unnest(generate_series(-3, 3)) AS i) lag "
            "JOIN d a ON TRUE JOIN d b ON b.day = a.day - lag.i), "
            "s AS (SELECT lag, CAST(COUNT(*) AS DOUBLE) AS k, "
            "SUM(x) AS sa, SUM(y) AS sb, SUM(x * x) AS sxx, "
            "SUM(y * y) AS syy, SUM(x * y) AS sxy FROM l GROUP BY lag) "
            "SELECT lag, ROUND((k * sxy - sa * sb) / "
            "(SQRT(k * sxx - sa * sa) * SQRT(k * syy - sb * sb)), 6) "
            "AS corr FROM s"
        ),
        "rolling_anomaly": (
            "WITH d AS (SELECT "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
            "w AS (SELECT day, n, "
            "AVG(CAST(n AS DOUBLE)) OVER (ORDER BY day "
            "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS mu, "
            "STDDEV(CAST(n AS DOUBLE)) OVER (ORDER BY day "
            "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sd, "
            "COUNT(*) OVER (ORDER BY day "
            "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS k FROM d) "
            "SELECT CAST(CAST(to_timestamp(day * 86400) AS DATE) "
            "AS TIMESTAMP) AS day, n, "
            "ROUND(CASE WHEN k >= 2 AND sd > 0 "
            "THEN (CAST(n AS DOUBLE) - mu) / sd END, 6) AS z FROM w"
        ),
        "pattern_match_users": (
            "WITH s AS (SELECT user_id, "
            "STRING_AGG(SUBSTR(event_type, 1, 1), '' "
            "ORDER BY ts, event_id) AS seq, "
            "CAST(COUNT(*) AS BIGINT) AS n_events FROM events "
            "GROUP BY user_id) "
            "SELECT user_id, "
            "regexp_matches(seq, 's[^e]*p') AS matched, n_events "
            "FROM s"
        ),
        "rolling_week_users": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d "
            "FROM events), "
            "w AS (SELECT DISTINCT user_id, d + k.i AS win_end "
            "FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) "
            "AS i) k) "
            "SELECT CAST(CAST(to_timestamp(win_end * 86400) AS DATE) "
            "AS TIMESTAMP) AS win_end, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM w GROUP BY 1"
        ),
        "winsorized_mean": (
            "WITH c AS (SELECT l_returnflag, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents "
            "FROM lineitem), "
            "b AS (SELECT l_returnflag, "
            "CAST(quantile_disc(cents, 0.1) AS DOUBLE) AS lo, "
            "CAST(quantile_disc(cents, 0.9) AS DOUBLE) AS hi "
            "FROM c GROUP BY l_returnflag), "
            "w AS (SELECT c.l_returnflag, CAST(LEAST(GREATEST("
            "CAST(c.cents AS DOUBLE), b.lo), b.hi) AS BIGINT) AS wc "
            "FROM c JOIN b ON c.l_returnflag = b.l_returnflag) "
            "SELECT l_returnflag, "
            "ROUND(CAST(SUM(wc) AS DOUBLE) / COUNT(*) / 100.0, 6) "
            "AS winsor_mean FROM w GROUP BY l_returnflag"
        ),
        "contour_cases": (
            # 2x2 windows via three shifted self-joins of the grid;
            # window valid only when all four corners are valid
            f"WITH g AS (SELECT row, col, z FROM ({grid})), "
            "w AS (SELECT a.z AS tl, b.z AS tr, c.z AS bl, d.z AS br "
            "FROM g a JOIN g b ON b.row = a.row AND b.col = a.col + 1 "
            "JOIN g c ON c.row = a.row + 1 AND c.col = a.col "
            "JOIN g d ON d.row = a.row + 1 AND d.col = a.col + 1 "
            "WHERE a.z > -1e30 AND b.z > -1e30 AND c.z > -1e30 "
            "AND d.z > -1e30) "
            "SELECT CAST(CAST(tl > 25.0 AS INTEGER) "
            "+ 2 * CAST(tr > 25.0 AS INTEGER) "
            "+ 4 * CAST(br > 25.0 AS INTEGER) "
            "+ 8 * CAST(bl > 25.0 AS INTEGER) AS BIGINT) AS case_id, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY case_id"
        ),
        "contour_segments": _contour_segments_oracle_sql(grid),
        "zonal_mode": (
            "WITH p AS ("
            + " UNION ALL ".join(
                f"SELECT '{pid}' AS polygon_id, z FROM ({grid}) "
                f"WHERE z > -1e30 AND {_halfplane_sql(poly)}"
                for pid, poly in OG_POLYGONS.items()
            )
            + "), "
            "c AS (SELECT polygon_id, z, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM p GROUP BY 1, 2), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY polygon_id "
            "ORDER BY n DESC, z) AS rn FROM c) "
            "SELECT polygon_id, z AS mode_z, n AS n_mode FROM r "
            "WHERE rn = 1"
        ),
        "hist_equalize": (
            f"WITH g AS (SELECT z FROM ({grid}) WHERE z > -1e30), "
            "c AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS n FROM g "
            "GROUP BY z), "
            "d AS (SELECT z, n, CAST(SUM(n) OVER (ORDER BY z) AS DOUBLE) "
            "AS cdf FROM c), "
            "s AS (SELECT MIN(cdf) AS cmin, MAX(cdf) AS ntot FROM d), "
            "m AS (SELECT z, d.n AS nv, CAST(ROUND(255.0 * (cdf - s.cmin) "
            "/ (s.ntot - s.cmin), 0) AS BIGINT) AS eq FROM d, s) "
            "SELECT eq, CAST(SUM(nv) AS BIGINT) AS n_pixels "
            "FROM m GROUP BY eq"
        ),
        "convoy_pairs": (
            "WITH k AS (SELECT DISTINCT "
            "((event_id % 96) // 8) * 12 + ((event_id // 96) % 96) // 8 "
            "AS cell, "
            "CAST(epoch_us(ts) // 600000000 AS BIGINT) AS win, user_id "
            "FROM events), "
            "pw AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub, "
            "a.win FROM k a JOIN k b ON a.cell = b.cell "
            "AND a.win = b.win AND a.user_id < b.user_id), "
            "l AS (SELECT ua, ub, win, win - LAG(win) OVER ("
            "PARTITION BY ua, ub ORDER BY win) AS stp FROM pw), "
            "isl AS (SELECT ua, ub, win, "
            "SUM(CASE WHEN stp IS NULL OR stp > 1 THEN 1 ELSE 0 END) "
            "OVER (PARTITION BY ua, ub ORDER BY win) AS island FROM l), "
            "runs AS (SELECT ua, ub, island, COUNT(*) AS run "
            "FROM isl GROUP BY ua, ub, island), "
            "agg AS (SELECT ua, ub, MAX(run) AS max_run, "
            "SUM(run) AS n_cowindows FROM runs GROUP BY ua, ub) "
            "SELECT ua AS user_a, ub AS user_b, "
            "CAST(max_run AS BIGINT) AS max_run, "
            "CAST(n_cowindows AS BIGINT) AS n_cowindows "
            "FROM agg WHERE max_run >= 2"
        ),
        "colocation_pairs": (
            "WITH k AS (SELECT DISTINCT "
            "((event_id % 96) // 8) * 12 + ((event_id // 96) % 96) // 8 "
            "AS cell, "
            "CAST(epoch_us(ts) // 600000000 AS BIGINT) AS win, user_id "
            "FROM events) "
            "SELECT a.user_id AS user_a, b.user_id AS user_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_meetings "
            "FROM k a JOIN k b ON a.cell = b.cell AND a.win = b.win "
            "AND a.user_id < b.user_id GROUP BY 1, 2"
        ),
        "word_triangles": (
            "WITH tok AS (SELECT DISTINCT source AS w FROM documents "
            "WHERE LEN(source) >= 4), "
            "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
            "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
            "AND LEVENSHTEIN(a.w, b.w) = 1), "
            "tri AS (SELECT e1.w1 AS a, e1.w2 AS b, e2.w2 AS c "
            "FROM e e1 JOIN e e2 ON e2.w1 = e1.w2 "
            "JOIN e e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2), "
            "m AS (SELECT a AS word FROM tri UNION ALL "
            "SELECT b FROM tri UNION ALL SELECT c FROM tri) "
            "SELECT word, CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM m GROUP BY word"
        ),
        "word_components": (
            # recursive reachability closure; rep = min reachable word
            "WITH RECURSIVE tok AS (SELECT DISTINCT source AS w "
            "FROM documents WHERE LEN(source) >= 4), "
            "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
            "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
            "AND LEVENSHTEIN(a.w, b.w) = 1), "
            "sym AS (SELECT w1, w2 FROM e "
            "UNION ALL SELECT w2, w1 FROM e), "
            "nodes AS (SELECT DISTINCT w1 AS w FROM sym), "
            "walk(w, r) AS (SELECT w, w FROM nodes "
            "UNION SELECT sym.w2, walk.r FROM walk "
            "JOIN sym ON sym.w1 = walk.w), "
            "lab AS (SELECT w, MIN(r) AS rep FROM walk GROUP BY w) "
            "SELECT rep AS rep_word, CAST(COUNT(*) AS BIGINT) AS n_words "
            "FROM lab GROUP BY rep"
        ),
        "word_pagerank": _pagerank_sql(),
        "word_bfs_hops": (
            # recursive min-hop closure bounded at 4 hops; seeds = 5
            # smallest vocab words (isolated seeds stay at hops 0)
            "WITH RECURSIVE tok AS (SELECT DISTINCT source AS w "
            "FROM documents WHERE LEN(source) >= 4), "
            "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
            "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
            "AND LEVENSHTEIN(a.w, b.w) = 1), "
            "sym AS (SELECT w1, w2 FROM e "
            "UNION ALL SELECT w2, w1 FROM e), "
            "seeds AS (SELECT w FROM tok ORDER BY w LIMIT 5), "
            "walk(w, d) AS (SELECT w, 0 FROM seeds "
            "UNION SELECT sym.w2, walk.d + 1 FROM walk "
            "JOIN sym ON sym.w1 = walk.w WHERE walk.d < 4) "
            "SELECT w AS word, CAST(MIN(d) AS BIGINT) AS hops "
            "FROM walk GROUP BY w"
        ),
        "latest_event_per_user": (
            "SELECT user_id, ts, event_type, value FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "WHERE rn = 1"
        ),
        "conversion_lag": (
            "WITH p AS (SELECT user_id, event_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts FROM events "
            "WHERE event_type = 'click'), "
            "m AS (SELECT p.user_id, p.event_id, p.ts, MAX(c.ts) AS cts "
            "FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts "
            "GROUP BY p.user_id, p.event_id, p.ts) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_conversions, "
            "ROUND(CAST(SUM(date_diff('microsecond', cts, ts)) AS DOUBLE) "
            "/ COUNT(*) / 1000000.0, 6) AS avg_lag_s "
            "FROM m GROUP BY user_id"
        ),
        "interevent_median": (
            "WITH s AS (SELECT user_id, ts, LEAD(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events), "
            "g AS (SELECT user_id, EPOCH(nxt - ts) AS gap FROM s "
            "WHERE nxt IS NOT NULL) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
            "ROUND(quantile_disc(gap, 0.5), 6) AS median_gap_s "
            "FROM g GROUP BY user_id"
        ),
        "time_weighted_avg": (
            "WITH s AS (SELECT user_id, value, ts, LEAD(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events), "
            "g AS (SELECT user_id, value, EPOCH(nxt - ts) AS dt FROM s "
            "WHERE nxt IS NOT NULL) "
            "SELECT user_id, "
            "ROUND(SUM(value * dt) / SUM(dt), 6) AS twa_value "
            "FROM g GROUP BY user_id"
        ),
        "percent_rank_qty": (
            "SELECT DISTINCT l_returnflag, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
            "ROUND(PERCENT_RANK() OVER (PARTITION BY l_returnflag "
            "ORDER BY CAST(ROUND(l_quantity, 0) AS BIGINT)), 6) "
            "AS pct_rank FROM lineitem"
        ),
        "gini_by_priority": (
            # mirror of pipelines/relational.py grouped_gini: ranked
            # statistic, sum(i*x) is tie-permutation invariant
            "WITH x AS (SELECT o_orderpriority AS g, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v "
            "FROM orders), "
            "r AS (SELECT g, v, ROW_NUMBER() OVER "
            "(PARTITION BY g ORDER BY v) AS i FROM x), "
            "s AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(v) AS DOUBLE) AS sx, "
            "CAST(SUM(i * v) AS DOUBLE) AS six FROM r GROUP BY g) "
            "SELECT g AS o_orderpriority, "
            "ROUND(2 * six / (n * sx) - (n + 1) / n, 6) AS gini FROM s"
        ),
        "bm25_search": (
            # mirror of stages/textops.py bm25_scores for the fixed
            # query ('spark', 'join'), k1=1.2, b=0.75
            "WITH w AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), t -> t <> '') AS ws "
            "FROM documents), "
            "d AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, "
            "CAST(len(list_filter(ws, t -> t = 'spark')) AS DOUBLE) AS tf0, "
            "CAST(len(list_filter(ws, t -> t = 'join')) AS DOUBLE) AS tf1 "
            "FROM w), "
            "s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
            "SUM(dl) / COUNT(*) AS avgdl, "
            "CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) "
            "AS df0, "
            "CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) "
            "AS df1 FROM d) "
            "SELECT doc_id, ROUND("
            "LN((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 * (1.2 + 1) "
            "/ (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) + "
            "LN((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * (1.2 + 1) "
            "/ (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6) AS score "
            "FROM d, s WHERE tf0 + tf1 > 0 "
            "ORDER BY score DESC, doc_id LIMIT 20"
        ),
        "orders_above_avg": (
            # exact-cents average so the knife-edge compare is
            # bit-identical to the engine
            "WITH c AS (SELECT o_custkey, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents "
            "FROM orders), "
            "a AS (SELECT o_custkey, "
            "CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS avg_cents "
            "FROM c GROUP BY o_custkey) "
            "SELECT c.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_above "
            "FROM c JOIN a ON c.o_custkey = a.o_custkey "
            "WHERE CAST(c.cents AS DOUBLE) > a.avg_cents "
            "GROUP BY c.o_custkey"
        ),
        "chi2_independence": (
            # mirror of stages/stats.py chi2_independence: zero cells
            # contribute their expected count via the ra x rb cross join
            "WITH c AS (SELECT event_type AS a, "
            "CAST(ISODOW(ts) AS BIGINT) AS b, "
            "CAST(COUNT(*) AS DOUBLE) AS n FROM events GROUP BY 1, 2), "
            "ra AS (SELECT a, SUM(n) AS na FROM c GROUP BY a), "
            "rb AS (SELECT b, SUM(n) AS nb FROM c GROUP BY b), "
            "t AS (SELECT SUM(n) AS tot FROM c), "
            "f AS (SELECT ra.na, rb.nb, COALESCE(c.n, 0) AS n "
            "FROM ra CROSS JOIN rb "
            "LEFT JOIN c ON c.a = ra.a AND c.b = rb.b) "
            "SELECT ROUND(SUM((n - na * nb / t.tot) * (n - na * nb / t.tot) "
            "/ (na * nb / t.tot)), 6) AS chi2, "
            "CAST((SELECT COUNT(*) - 1 FROM ra) * "
            "(SELECT COUNT(*) - 1 FROM rb) AS BIGINT) AS dof "
            "FROM f, t GROUP BY ALL"
        ),
        "getis_ord": (
            # mirror of stages/stats.py getis_ord_gi_star: 3x3 weights
            # incl. self, absent lattice cells are zeros
            "WITH e AS (SELECT (event_id % 96) AS gx, "
            "((event_id // 96) % 96) AS gy, COUNT(*) AS n FROM events "
            "GROUP BY 1, 2), "
            "lat AS (SELECT a.i AS gx, b.i AS gy FROM "
            "generate_series(0, 95) a(i) CROSS JOIN "
            "generate_series(0, 95) b(i)), "
            "x AS (SELECT lat.gx, lat.gy, "
            "CAST(COALESCE(e.n, 0) AS DOUBLE) AS v "
            "FROM lat LEFT JOIN e ON lat.gx = e.gx AND lat.gy = e.gy), "
            "s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn, "
            "SUM(v) / COUNT(*) AS mu, "
            "SQRT(SUM(v * v) / COUNT(*) - "
            "(SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*))) AS sd FROM x), "
            "w AS (SELECT a.gx, a.gy, SUM(b.v) AS win, "
            "CAST(COUNT(*) AS DOUBLE) AS cnt FROM x a JOIN x b "
            "ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1 "
            "GROUP BY a.gx, a.gy) "
            "SELECT w.gx, w.gy, "
            "ROUND((win - s.mu * cnt) / "
            "(s.sd * SQRT((s.nn * cnt - cnt * cnt) / (s.nn - 1))), 6) "
            "AS gi_z FROM w, s "
            "ORDER BY gi_z DESC, gx, gy LIMIT 20"
        ),
        "assoc_rules": (
            "WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, "
            "event_type AS t FROM events), "
            "nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM "
            "(SELECT DISTINCT user_id, d FROM b)), "
            "s AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS n FROM b "
            "GROUP BY t), "
            "p AS (SELECT x.t AS item_a, y.t AS item_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_both FROM b x JOIN b y "
            "ON x.user_id = y.user_id AND x.d = y.d AND x.t < y.t "
            "GROUP BY 1, 2) "
            "SELECT p.item_a, p.item_b, p.n_both, "
            "ROUND(CAST(p.n_both AS DOUBLE) * nb.n / (sa.n * sb.n), 6) "
            "AS lift FROM p CROSS JOIN nb "
            "JOIN s sa ON sa.t = p.item_a "
            "JOIN s sb ON sb.t = p.item_b"
        ),
        "pct_change_monthly": (
            "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
            "SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1) "
            "SELECT month, CAST(cents AS DOUBLE) / 100.0 AS revenue, "
            "ROUND((CAST(cents AS DOUBLE) - "
            "CAST(LAG(cents) OVER (ORDER BY month) AS DOUBLE)) "
            "/ CAST(LAG(cents) OVER (ORDER BY month) AS DOUBLE) * 100.0, 6) "
            "AS pct_change FROM m ORDER BY month"
        ),
        "grouping_sets": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) "
            "AS BIGINT) AS sum_qty_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
            "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
        ),
        "markov_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "LEAD(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT event_type AS src, nxt AS dst, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM s "
            "WHERE nxt IS NOT NULL GROUP BY 1, 2"
        ),
        "quantiles_cont": (
            " UNION ALL ".join(
                f"SELECT CAST({q} AS DOUBLE) AS q, "
                f"ROUND(CAST(quantile_cont(l_extendedprice, {q}) "
                "AS DOUBLE), 6) AS value FROM lineitem"
                for q in (0.1, 0.5, 0.9, 0.99)
            )
        ),
        "lm_logprob": (
            # mirror of stages/textops.py bigram_lm_logprob: corpus
            # bigram LM, P(w2|w1) = c2/c1 with c1 from bigram-first
            # positions
            "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "t -> t <> '') AS ws FROM documents), "
            "g AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM w, "
            "LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i)), "
            "c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS n2 FROM g "
            "GROUP BY w1, w2), "
            "c1 AS (SELECT w1, SUM(n2) AS n1 FROM c2 GROUP BY w1) "
            "SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
            "ROUND(AVG(LN(c2.n2 / c1.n1)), 6) AS avg_logp "
            "FROM g JOIN c2 USING (w1, w2) JOIN c1 USING (w1) "
            "GROUP BY g.doc_id"
        ),
        "full_outer_activity": (
            "WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d, "
            "COUNT(*) AS n FROM events WHERE event_type = 'click' "
            "GROUP BY 1, 2), "
            "p AS (SELECT user_id, CAST(ts AS DATE) AS d, "
            "COUNT(*) AS n FROM events WHERE event_type = 'purchase' "
            "GROUP BY 1, 2) "
            "SELECT COALESCE(c.user_id, p.user_id) AS user_id, "
            "CAST(SUM(CASE WHEN c.user_id IS NOT NULL AND p.user_id IS "
            "NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_days, "
            "CAST(SUM(CASE WHEN p.user_id IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS click_only, "
            "CAST(SUM(CASE WHEN c.user_id IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS purchase_only "
            "FROM c FULL OUTER JOIN p "
            "ON c.user_id = p.user_id AND c.d = p.d "
            "GROUP BY COALESCE(c.user_id, p.user_id)"
        ),
        "morans_i": (
            # mirror of stages/stats.py morans_i_grid on the 96x96
            # geocode lattice, rook contiguity, absent cells = 0
            "WITH e AS (SELECT (event_id % 96) AS gx, "
            "((event_id // 96) % 96) AS gy, COUNT(*) AS n FROM events "
            "GROUP BY 1, 2), "
            "lat AS (SELECT a.i AS gx, b.i AS gy FROM "
            "generate_series(0, 95) a(i) CROSS JOIN "
            "generate_series(0, 95) b(i)), "
            "x AS (SELECT lat.gx, lat.gy, "
            "CAST(COALESCE(e.n, 0) AS DOUBLE) AS v "
            "FROM lat LEFT JOIN e ON lat.gx = e.gx AND lat.gy = e.gy), "
            "s AS (SELECT AVG(v) AS mu, CAST(COUNT(*) AS DOUBLE) AS nn "
            "FROM x), "
            "nb AS ("
            "SELECT a.v AS va, b.v AS vb FROM x a JOIN x b "
            "ON a.gx = b.gx AND b.gy = a.gy + 1 "
            "UNION ALL SELECT a.v, b.v FROM x a JOIN x b "
            "ON a.gx = b.gx AND b.gy = a.gy - 1 "
            "UNION ALL SELECT a.v, b.v FROM x a JOIN x b "
            "ON a.gy = b.gy AND b.gx = a.gx + 1 "
            "UNION ALL SELECT a.v, b.v FROM x a JOIN x b "
            "ON a.gy = b.gy AND b.gx = a.gx - 1), "
            "num AS (SELECT SUM((va - s.mu) * (vb - s.mu)) AS num, "
            "CAST(COUNT(*) AS DOUBLE) AS w FROM nb, s GROUP BY ALL), "
            "den AS (SELECT SUM((v - s.mu) * (v - s.mu)) AS den FROM x, s "
            "GROUP BY ALL) "
            "SELECT ROUND((s.nn / num.w) * num.num / den.den, 6) "
            "AS morans_i FROM s, num, den"
        ),
        "unpivot_measures": (
            "WITH w AS (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS quantity, "
            "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS "
            "extendedprice, "
            "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS discount "
            "FROM lineitem), "
            "u AS (UNPIVOT w ON quantity, extendedprice, discount "
            "INTO NAME measure VALUE cents) "
            "SELECT l_returnflag, measure, "
            "ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total "
            "FROM u GROUP BY l_returnflag, measure"
        ),
        "doc_lengths": (
            "SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS len_chars FROM documents"
        ),
        "ann_top3": (
            "SELECT q.qid AS query_id, r.vec_id, r.rank FROM "
            "(SELECT CAST(3 AS BIGINT) AS qid UNION ALL SELECT CAST(77 AS BIGINT)) q, "
            "LATERAL ("
            "SELECT e.vec_id, CAST(ROW_NUMBER() OVER (ORDER BY "
            "list_cosine_similarity(e.embedding, qe.embedding) DESC, e.vec_id) - 1 AS BIGINT) AS rank "
            "FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = q.qid) qe "
            ") r WHERE r.rank < 3"
        ),
        "knn_join": (
            "SELECT a, b, rank FROM ("
            "SELECT x.vec_id AS a, y.vec_id AS b, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY "
            "list_cosine_similarity(x.embedding, y.embedding) DESC, "
            "y.vec_id) - 1 AS BIGINT) AS rank "
            "FROM embeddings x, embeddings y WHERE x.vec_id <> y.vec_id"
            ") WHERE rank < 3"
        ),
        "fuzzy_match": (
            "SELECT * FROM (VALUES "
            "('delhi_elevation', 'delhi_mosaic'), "
            "('mumbai_satellite', 'mumbai_landsat_mosaic'), "
            "('slope_analysis', 'gradient_mosaic'), "
            "('bangalore_roads', 'bengaluru_transportation_mosaic'), "
            "('unknown_layer', 'some_mosaic'), "
            "('nonexistent_layer', NULL)"
            ") AS t(requested, matched)"
        ),
    }
    # flow accumulation = recursive ancestor count over the D8 forest
    # (edges restricted to node->node; paths are unique, so the UNION
    # closure counts each (ancestor, cell) once)
    out["flow_accumulation"] = (
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
        "anc AS (SELECT r, c, COUNT(*) AS n FROM reach GROUP BY r, c) "
        "SELECT f.row, f.col, "
        "CAST(1 + COALESCE(anc.n, 0) AS BIGINT) AS acc "
        "FROM fd f LEFT JOIN anc ON anc.r = f.row AND anc.c = f.col"
    )
    # watershed: pointer-walk closure over NODE->NODE edges; the pour
    # point is the last valid cell (no node out-edge: a pit/flat or an
    # exit off the valid set)
    out["grid_variogram"] = (
        # exact int64 deci-unit pair sums; within-tile pairs only
        # (tile width 48), one float division per lag -- mirrors
        # _q_grid_variogram bit-exactly
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT row, col, CAST(ROUND(z * 10, 0) AS BIGINT) AS k "
        "FROM g WHERE z > -1e30), "
        "p AS (SELECT l.h AS lag, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM((a.k - b.k) * (a.k - b.k)) AS BIGINT) AS sum_d2 "
        "FROM (VALUES (1), (2), (4), (8)) l(h) "
        "JOIN v a ON (a.col % 48) + l.h < 48 "
        "JOIN v b ON b.row = a.row AND b.col = a.col + l.h "
        "GROUP BY l.h) "
        "SELECT CAST(lag AS BIGINT) AS lag, n_pairs, "
        "ROUND(CAST(sum_d2 AS DOUBLE) / (2.0 * CAST(n_pairs AS DOUBLE) "
        "* 100.0), 6) AS gamma FROM p"
    )
    out["rfm_segments"] = (
        "WITH c AS (SELECT o_custkey, "
        "MAX(epoch_us(o_orderdate)) AS last_us, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "AS BIGINT) AS cents FROM orders GROUP BY o_custkey), "
        "q AS (SELECT "
        "NTILE(4) OVER (ORDER BY last_us, o_custkey) AS r_q, "
        "NTILE(4) OVER (ORDER BY n_orders, o_custkey) AS f_q, "
        "NTILE(4) OVER (ORDER BY cents, o_custkey) AS m_q FROM c) "
        "SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers FROM q GROUP BY 1"
    )
    out["acf_lags"] = (
        # zero-count hours contribute 0 to every x-sum, so only the
        # calendar length n needs the dense extent; exact int64
        # moments, one shared float expression (mirrors _q_acf_lags)
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
        "FROM (VALUES (1), (2), (3), (6), (12), (24)) l(h) "
        "CROSS JOIN mm CROSS JOIN c0 a "
        "LEFT JOIN c0 b ON b.hr = a.hr + l.h "
        "GROUP BY l.h), "
        "f AS (SELECT pr.h, pr.p, pr.sa, pr.sb, mm.n, tot.s, tot.q, "
        "CAST(tot.s AS DOUBLE) / CAST(mm.n AS DOUBLE) AS mu "
        "FROM pr, mm, tot) "
        "SELECT CAST(h AS BIGINT) AS lag, "
        "ROUND((CAST(p AS DOUBLE) - mu * CAST(sa AS DOUBLE) "
        "- mu * CAST(sb AS DOUBLE) "
        "+ CAST(n - h AS DOUBLE) * mu * mu) "
        "/ (CAST(q AS DOUBLE) - 2.0 * mu * CAST(s AS DOUBLE) "
        "+ CAST(n AS DOUBLE) * mu * mu), 6) AS acf FROM f"
    )
    out["zorder_cells"] = (
        f"WITH g AS ({_OG_GRID_SQL}), "
        f"v AS (SELECT row, col FROM g WHERE z > -1e30), "
        f"z AS (SELECT CAST({_mt} AS BIGINT) AS zkey FROM v) "
        f"SELECT CAST(zkey // 1024 AS BIGINT) AS bucket, "
        f"CAST(COUNT(*) AS BIGINT) AS n_pixels, "
        f"CAST(MIN(zkey) AS BIGINT) AS z_min, "
        f"CAST(MAX(zkey) AS BIGINT) AS z_max "
        f"FROM z GROUP BY 1"
    )
    out["map_match"] = (
        # point-to-segment projection written with the identical
        # float expression as _q_map_match; ROW_NUMBER(d2, seg_id)
        # mirrors numpy first-wins argmin
        f"WITH p AS (SELECT event_id, "
        f"77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS px, "
        f"28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS py "
        f"FROM events), "
        f"s(seg_id, ax, ay, bx, by) AS (SELECT * FROM (VALUES "
        f"{_segs_values})), "
        f"d AS (SELECT p.event_id, s.seg_id, "
        f"(p.px - (s.ax + GREATEST(0.0, LEAST(1.0, "
        f"((p.px - s.ax) * (s.bx - s.ax) + (p.py - s.ay) * (s.by - s.ay)) "
        f"/ ((s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay))"
        f")) * (s.bx - s.ax))) AS dx, "
        f"(p.py - (s.ay + GREATEST(0.0, LEAST(1.0, "
        f"((p.px - s.ax) * (s.bx - s.ax) + (p.py - s.ay) * (s.by - s.ay)) "
        f"/ ((s.bx - s.ax) * (s.bx - s.ax) + (s.by - s.ay) * (s.by - s.ay))"
        f")) * (s.by - s.ay))) AS dy "
        f"FROM p, s), "
        f"r AS (SELECT event_id, seg_id, dx * dx + dy * dy AS d2, "
        f"ROW_NUMBER() OVER (PARTITION BY event_id "
        f"ORDER BY dx * dx + dy * dy, seg_id) AS rn FROM d), "
        f"b AS (SELECT seg_id, "
        f"CAST(ROUND(SQRT(d2) * 1e6, 0) AS BIGINT) AS um "
        f"FROM r WHERE rn = 1) "
        f"SELECT CAST(seg_id AS BIGINT) AS seg_id, "
        f"CAST(COUNT(*) AS BIGINT) AS n_matched, "
        f"CAST(SUM(um) AS BIGINT) AS sum_um, "
        f"ROUND(CAST(SUM(um) AS DOUBLE) "
        f"/ (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_offset "
        f"FROM b GROUP BY seg_id"
    )
    out["seasonal_mase"] = (
        # dense per-type daily series on the shared calendar extent
        # (constant-bounded range + filter: no subquery params in
        # DuckDB table functions); exact int64 absolute-error sums
        "WITH c AS (SELECT event_type, "
        "epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi, "
        "CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM c), "
        "days AS (SELECT mm.lo + r.range AS d FROM range(0, 4096) r, mm "
        "WHERE r.range <= mm.hi - mm.lo), "
        "ty AS (SELECT DISTINCT event_type FROM c), "
        "dn AS (SELECT ty.event_type, days.d, COALESCE(c.x, 0) AS x "
        "FROM ty CROSS JOIN days "
        "LEFT JOIN c ON c.event_type = ty.event_type AND c.d = days.d), "
        "e AS (SELECT event_type, x, "
        "LAG(x, 1) OVER (PARTITION BY event_type ORDER BY d) AS x1, "
        "LAG(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS x7 "
        "FROM dn), "
        "a AS (SELECT event_type, "
        "CAST(SUM(CASE WHEN x7 IS NOT NULL THEN ABS(x - x7) ELSE 0 END) "
        "AS BIGINT) AS sae_seasonal, "
        "CAST(SUM(CASE WHEN x1 IS NOT NULL THEN ABS(x - x1) ELSE 0 END) "
        "AS BIGINT) AS sae_naive FROM e GROUP BY event_type) "
        "SELECT a.event_type, a.sae_seasonal, a.sae_naive, "
        "ROUND((CAST(a.sae_seasonal AS DOUBLE) / CAST(mm.n - 7 AS DOUBLE)) "
        "/ (CAST(a.sae_naive AS DOUBLE) / CAST(mm.n - 1 AS DOUBLE)), 6) "
        "AS mase FROM a, mm"
    )
    out["band_correlation"] = (
        f"WITH mb AS ({_mb_grid}), "
        "j AS (SELECT a.k AS k1, d.k AS k2 FROM "
        "(SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL) a "
        "JOIN (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) d ON d.row = a.row AND d.col = a.col), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(k1) AS BIGINT) AS s1, "
        "CAST(SUM(k2) AS BIGINT) AS s2, "
        "CAST(SUM(k1 * k1) AS BIGINT) AS q1, "
        "CAST(SUM(k2 * k2) AS BIGINT) AS q2, "
        "CAST(SUM(k1 * k2) AS BIGINT) AS s12 FROM j) "
        "SELECT n AS n_cells, "
        "ROUND((CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "* CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "/ SQRT((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "* CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) "
        "* CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS pearson_r "
        "FROM m"
    )
    out["field_divergence"] = (
        f"WITH mb AS ({_mb_grid}), "
        "lat AS (SELECT row, col FROM mb WHERE band = 1), "
        "u AS (SELECT row, col, k FROM mb WHERE band = 1 "
        "AND k IS NOT NULL), "
        "v AS (SELECT row, col, k FROM mb WHERE band = 2 "
        "AND k IS NOT NULL) "
        "SELECT e.row, e.col, "
        "ROUND(CAST((ur.k - ul.k) + (vd.k - vu.k) AS DOUBLE) "
        "/ (2.0 * 10.0 * 0.01), 6) AS divergence "
        "FROM lat e "
        "JOIN u ul ON ul.row = e.row AND ul.col = e.col - 1 "
        "JOIN u ur ON ur.row = e.row AND ur.col = e.col + 1 "
        "JOIN v vu ON vu.row = e.row - 1 AND vu.col = e.col "
        "JOIN v vd ON vd.row = e.row + 1 AND vd.col = e.col "
        "WHERE (e.row % 48) NOT IN (0, 47) "
        "AND (e.col % 48) NOT IN (0, 47)"
    )
    out["minhash_estimate"] = (
        f"WITH w AS (SELECT doc_id, "
        f"list_filter(string_split(text, ' '), t -> t <> '') AS ws "
        f"FROM documents WHERE doc_id % 25 = 0), "
        f"g AS (SELECT DISTINCT doc_id, "
        f"ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram FROM w, "
        f"LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i)), "
        f"u AS (SELECT gram, CAST(DENSE_RANK() OVER (ORDER BY gram) "
        f"AS BIGINT) AS gid FROM (SELECT DISTINCT gram FROM g)), "
        f"gg AS (SELECT g.doc_id, u.gid FROM g "
        f"JOIN u ON u.gram = g.gram), "
        f"mh AS (SELECT doc_id, s.s, "
        f"MIN({_mx('gg.gid + s.s', 0)}) AS mh "
        f"FROM gg, (VALUES {_mh_seeds}) s(s) GROUP BY doc_id, s.s), "
        f"p AS (SELECT a.doc_id AS da, b.doc_id AS db, "
        f"CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS m FROM mh a JOIN mh b ON b.s = a.s "
        f"AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        f"ex AS (SELECT a.doc_id AS da, b.doc_id AS db, "
        f"CAST(COUNT(*) AS BIGINT) AS inter FROM gg a "
        f"JOIN gg b ON b.gid = a.gid AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2), "
        f"sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s "
        f"FROM gg GROUP BY doc_id) "
        f"SELECT p.da AS doc_a, p.db AS doc_b, "
        f"ROUND(CAST(p.m AS DOUBLE) / 16.0, 6) AS est_jaccard, "
        f"ROUND(CAST(COALESCE(ex.inter, 0) AS DOUBLE) "
        f"/ CAST(sa.s + sb.s - COALESCE(ex.inter, 0) AS DOUBLE), 6) "
        f"AS exact_jaccard "
        f"FROM p LEFT JOIN ex ON ex.da = p.da AND ex.db = p.db "
        f"JOIN sz sa ON sa.doc_id = p.da "
        f"JOIN sz sb ON sb.doc_id = p.db"
    )
    out["l_diversity"] = (
        "WITH c AS (SELECT source, n_chars // 100 AS len_bucket, "
        "lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents "
        "GROUP BY 1, 2, 3), "
        "gr AS (SELECT source, len_bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_langs, "
        "CAST(SUM(n) AS BIGINT) AS n_docs FROM c GROUP BY 1, 2) "
        "SELECT CAST(l.l AS BIGINT) AS l, "
        "CAST(COALESCE(SUM(CASE WHEN gr.n_langs < l.l THEN 1 "
        "ELSE 0 END), 0) AS BIGINT) AS groups_failing, "
        "CAST(COALESCE(SUM(CASE WHEN gr.n_langs < l.l THEN gr.n_docs "
        "ELSE 0 END), 0) AS BIGINT) AS docs_exposed "
        "FROM (VALUES (2), (3)) l(l) CROSS JOIN gr GROUP BY l.l"
    )
    out["lsh_blocking_audit"] = (
        f"WITH w AS (SELECT doc_id, "
        f"list_filter(string_split(text, ' '), t -> t <> '') AS ws "
        f"FROM documents WHERE doc_id % 25 = 0), "
        f"g AS (SELECT DISTINCT doc_id, "
        f"ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram FROM w, "
        f"LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i)), "
        f"u AS (SELECT gram, CAST(DENSE_RANK() OVER (ORDER BY gram) "
        f"AS BIGINT) AS gid FROM (SELECT DISTINCT gram FROM g)), "
        f"gg AS (SELECT g.doc_id, u.gid FROM g "
        f"JOIN u ON u.gram = g.gram), "
        f"mh AS (SELECT doc_id, s.s, "
        f"MIN({_mx('gg.gid + s.s', 0)}) AS mh "
        f"FROM gg, (VALUES {_mh_seeds}) s(s) GROUP BY doc_id, s.s), "
        f"bm AS (SELECT a.doc_id AS da, b.doc_id AS db, a.s // 4 AS bd, "
        f"CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS eq FROM mh a JOIN mh b ON b.s = a.s "
        f"AND a.doc_id < b.doc_id GROUP BY 1, 2, 3), "
        f"cand AS (SELECT da, db, "
        f"MAX(CASE WHEN eq = 4 THEN 1 ELSE 0 END) AS c "
        f"FROM bm GROUP BY 1, 2), "
        f"ex AS (SELECT a.doc_id AS da, b.doc_id AS db, "
        f"CAST(COUNT(*) AS BIGINT) AS inter FROM gg a "
        f"JOIN gg b ON b.gid = a.gid AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2), "
        f"sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s "
        f"FROM gg GROUP BY doc_id), "
        f"d AS (SELECT c.da, c.db, c.c, "
        f"CASE WHEN COALESCE(ex.inter, 0) * 2 >= "
        f"sa.s + sb.s - COALESCE(ex.inter, 0) THEN 1 ELSE 0 END AS dup "
        f"FROM cand c LEFT JOIN ex ON ex.da = c.da AND ex.db = c.db "
        f"JOIN sz sa ON sa.doc_id = c.da "
        f"JOIN sz sb ON sb.doc_id = c.db), "
        f"nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM sz) "
        f"SELECT CAST(nn.nd * (nn.nd - 1) // 2 AS BIGINT) AS n_pairs, "
        f"CAST(SUM(d.c) AS BIGINT) AS n_candidates, "
        f"CAST(SUM(d.dup) AS BIGINT) AS n_true_dups, "
        f"CASE WHEN SUM(d.dup) = 0 THEN CAST('nan' AS DOUBLE) "
        f"ELSE ROUND(CAST(SUM(d.c * d.dup) AS DOUBLE) "
        f"/ CAST(SUM(d.dup) AS DOUBLE), 6) END AS recall, "
        f"ROUND(CAST(SUM(d.c) AS DOUBLE) "
        f"/ CAST(nn.nd * (nn.nd - 1) // 2 AS DOUBLE), 6) "
        f"AS reduction_ratio "
        f"FROM d, nn GROUP BY nn.nd"
    )
    out["variance_ratio"] = (
        # q-day sums as exact prefix differences (c[t+q-1] - c[t-1]);
        # sample variances from int64 moments; mirrors
        # _q_variance_ratio
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi, "
        "CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM c0), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c0.x, 0) AS x "
        "FROM dd LEFT JOIN c0 ON c0.d = dd.d), "
        "pf AS (SELECT t, CAST(SUM(x) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c FROM dn), "
        "tx AS (SELECT CAST(SUM(x) AS BIGINT) AS sx, "
        "CAST(SUM(x * x) AS BIGINT) AS qx FROM dn), "
        "s AS (SELECT q.q, hi.c - COALESCE(lo.c, 0) AS sv "
        "FROM (VALUES (2), (5), (10)) q(q) "
        "CROSS JOIN mm "
        "JOIN pf hi ON hi.t >= q.q - 1 AND hi.t <= mm.n - 1 "
        "LEFT JOIN pf lo ON lo.t = hi.t - q.q), "
        "ms AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS m, "
        "CAST(SUM(sv) AS BIGINT) AS ss, "
        "CAST(SUM(sv * sv) AS BIGINT) AS qqs FROM s GROUP BY q), "
        "f AS (SELECT ms.q, ms.m, ms.ss, ms.qqs, mm.n, tx.sx, tx.qx, "
        "CAST(tx.sx AS DOUBLE) / CAST(mm.n AS DOUBLE) AS mu, "
        "CAST(ms.ss AS DOUBLE) / CAST(ms.m AS DOUBLE) AS mus "
        "FROM ms, mm, tx) "
        "SELECT CAST(q AS BIGINT) AS horizon, "
        "ROUND(((CAST(qqs AS DOUBLE) - CAST(m AS DOUBLE) * mus * mus) "
        "/ (CAST(m AS DOUBLE) - 1.0)) "
        "/ (CAST(q AS DOUBLE) * ((CAST(qx AS DOUBLE) "
        "- CAST(n AS DOUBLE) * mu * mu) / (CAST(n AS DOUBLE) - 1.0))), "
        "6) AS variance_ratio FROM f"
    )
    out["variogram_anisotropy"] = (
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT row, col, CAST(ROUND(z * 10, 0) AS BIGINT) AS k "
        "FROM g WHERE z > -1e30), "
        "px AS (SELECT l.h AS lag, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM((a.k - b.k) * (a.k - b.k)) AS BIGINT) AS sum_d2 "
        "FROM (VALUES (1), (2), (4)) l(h) "
        "JOIN v a ON (a.col % 48) + l.h < 48 "
        "JOIN v b ON b.row = a.row AND b.col = a.col + l.h "
        "GROUP BY l.h), "
        "py AS (SELECT l.h AS lag, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM((a.k - b.k) * (a.k - b.k)) AS BIGINT) AS sum_d2 "
        "FROM (VALUES (1), (2), (4)) l(h) "
        "JOIN v a ON (a.row % 48) + l.h < 48 "
        "JOIN v b ON b.col = a.col AND b.row = a.row + l.h "
        "GROUP BY l.h), "
        "f AS (SELECT px.lag, "
        "CAST(px.sum_d2 AS DOUBLE) / (2.0 "
        "* CAST(px.n_pairs AS DOUBLE) * 100.0) AS gx, "
        "CAST(py.sum_d2 AS DOUBLE) / (2.0 "
        "* CAST(py.n_pairs AS DOUBLE) * 100.0) AS gy "
        "FROM px JOIN py ON py.lag = px.lag) "
        "SELECT CAST(lag AS BIGINT) AS lag, ROUND(gx, 6) AS gamma_x, "
        "ROUND(gy, 6) AS gamma_y, ROUND(gx / gy, 6) AS anisotropy "
        "FROM f"
    )
    out["k_anonymity"] = (
        "WITH c AS (SELECT lang, source, n_chars // 100 AS len_bucket, "
        "CAST(COUNT(*) AS BIGINT) AS g FROM documents "
        "GROUP BY 1, 2, 3), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups FROM c) "
        "SELECT CAST(k.k AS BIGINT) AS k, t.n_groups, "
        "CAST(COALESCE((SELECT SUM(g) FROM c WHERE c.g < k.k), 0) "
        "AS BIGINT) AS docs_at_risk "
        "FROM (VALUES (2), (5), (10)) k(k), t"
    )
    out["home_work_od"] = (
        "WITH e AS (SELECT user_id, "
        "((event_id // 96) % 96) * 96 + (event_id % 96) AS cell, "
        "(epoch_us(ts) // 3600000000) % 24 AS h FROM events), "
        "c AS (SELECT user_id, cell, "
        "CAST(SUM(CASE WHEN h < 6 OR h >= 22 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_night, "
        "CAST(SUM(CASE WHEN h >= 9 AND h < 17 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_day FROM e GROUP BY 1, 2), "
        "hm AS (SELECT user_id, cell, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY n_night DESC, cell) AS rn "
        "FROM c WHERE n_night > 0), "
        "wk AS (SELECT user_id, cell, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY n_day DESC, cell) AS rn "
        "FROM c WHERE n_day > 0), "
        "j AS (SELECT h.user_id, h.cell AS home_cell, "
        "w.cell AS work_cell FROM hm h "
        "JOIN wk w ON w.user_id = h.user_id "
        "WHERE h.rn = 1 AND w.rn = 1) "
        "SELECT user_id, CAST(home_cell AS BIGINT) AS home_cell, "
        "CAST(work_cell AS BIGINT) AS work_cell, "
        "ROUND(SQRT((CAST(home_cell % 96 AS DOUBLE) "
        "- CAST(work_cell % 96 AS DOUBLE)) "
        "* (CAST(home_cell % 96 AS DOUBLE) "
        "- CAST(work_cell % 96 AS DOUBLE)) "
        "+ (CAST(home_cell // 96 AS DOUBLE) "
        "- CAST(work_cell // 96 AS DOUBLE)) "
        "* (CAST(home_cell // 96 AS DOUBLE) "
        "- CAST(work_cell // 96 AS DOUBLE))), 6) AS commute_dist "
        "FROM j"
    )
    out["grid_euler"] = (
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "v AS (SELECT row, col FROM g WHERE z > -1e30), "
        "eh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v a "
        "JOIN v b ON b.row = a.row AND b.col = a.col + 1), "
        "ev AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v a "
        "JOIN v b ON b.row = a.row + 1 AND b.col = a.col), "
        "q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v a "
        "JOIN v b ON b.row = a.row AND b.col = a.col + 1 "
        "JOIN v c ON c.row = a.row + 1 AND c.col = a.col "
        "JOIN v d ON d.row = a.row + 1 AND d.col = a.col + 1), "
        "vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v) "
        "SELECT vv.n AS n_cells, eh.n + ev.n AS n_edges, "
        "q.n AS n_quads, vv.n - (eh.n + ev.n) + q.n AS euler "
        "FROM vv, eh, ev, q"
    )
    out["viewshed_counts"] = (
        # per-target LOS with the identical fixed-step rule as
        # stages/raster.py::line_of_sight (t=(i+1)/65, nearest-pixel
        # FLOOR lookups, invalid/out-of-bounds samples never block)
        f"WITH g AS ({_OG_SLOPE_GRID_SQL}), "
        "obs AS (SELECT CASE WHEN o.z > -1e30 THEN o.z ELSE 0.0 END "
        "+ 2.0 AS za FROM g o "
        "WHERE o.row = CAST(FLOOR((29.0 - 28.875) / 0.01) AS BIGINT) "
        "AND o.col = CAST(FLOOR((77.125 - 77.0) / 0.01) AS BIGINT)), "
        "tg AS (SELECT row, col, "
        "77.0 + 0.01 * (CAST(col AS DOUBLE) + 0.5) AS blon, "
        "29.0 - 0.01 * (CAST(row AS DOUBLE) + 0.5) AS blat, "
        "CASE WHEN z > -1e30 THEN z ELSE 0.0 END + 2.0 AS zb FROM g), "
        "st AS (SELECT (CAST(i.range AS DOUBLE) + 1.0) / 65.0 AS t "
        "FROM range(0, 64) i), "
        "sm AS (SELECT tg.row, tg.col, "
        "CAST(FLOOR((77.125 + st.t * (tg.blon - 77.125) - 77.0) "
        "/ 0.01) AS BIGINT) AS scol, "
        "CAST(FLOOR((29.0 - (28.875 + st.t * (tg.blat - 28.875))) "
        "/ 0.01) AS BIGINT) AS srow, "
        "obs.za + st.t * (tg.zb - obs.za) AS height "
        "FROM tg CROSS JOIN st CROSS JOIN obs), "
        "bl AS (SELECT sm.row, sm.col, "
        "CASE WHEN gg.z IS NOT NULL AND gg.z > -1e30 "
        "AND gg.z > sm.height THEN 1 ELSE 0 END AS b "
        "FROM sm LEFT JOIN g gg "
        "ON gg.row = sm.srow AND gg.col = sm.scol) "
        "SELECT row, col, "
        "CAST(CASE WHEN SUM(b) = 0 THEN 1 ELSE 0 END AS BIGINT) "
        "AS visible, "
        "CAST(SUM(b) AS BIGINT) AS n_blocked "
        "FROM bl GROUP BY row, col"
    )
    out["hist_match_lut"] = (
        # multiband formula grid; CDF comparison cross-multiplied so
        # the LUT is pure integer arithmetic (mirrors _q_hist_match_lut)
        "WITH mb AS (SELECT b.b AS band, "
        "CASE WHEN (r.range * 5 + c.range * 3 + b.b) % 29 = 0 THEN NULL "
        "ELSE CAST(ROUND(CAST(CAST(((r.range * 73 + c.range * 31 "
        "+ b.b * 101) % 500) / 10.0 AS REAL) AS DOUBLE) * 10.0, 0) "
        "AS BIGINT) END AS k "
        "FROM range(0, 96) r, range(0, 96) c, (VALUES (1), (2)) b(b)), "
        "c AS (SELECT band, k, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM mb WHERE k IS NOT NULL GROUP BY band, k), "
        "t AS (SELECT band, CAST(SUM(n) AS BIGINT) AS tot "
        "FROM c GROUP BY band), "
        "cd AS (SELECT band, k, "
        "CAST(SUM(n) OVER (PARTITION BY band ORDER BY k "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cdf FROM c) "
        "SELECT a.k AS src_k, CAST(MIN(b.k) AS BIGINT) AS tgt_k "
        "FROM (SELECT k, cdf FROM cd WHERE band = 1) a, "
        "(SELECT k, cdf FROM cd WHERE band = 2) b, "
        "(SELECT tot FROM t WHERE band = 1) t1, "
        "(SELECT tot FROM t WHERE band = 2) t2 "
        "WHERE b.cdf * t1.tot >= a.cdf * t2.tot "
        "GROUP BY a.k"
    )
    out["welch_ttest"] = (
        f"WITH e AS (SELECT {_mx('user_id', 13)} % 2 AS arm, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "a AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(c) AS BIGINT) AS s, "
        "CAST(SUM(c * c) AS BIGINT) AS q FROM e GROUP BY arm), "
        "mo AS (SELECT arm, n, "
        "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean, "
        "(CAST(q AS DOUBLE) - CAST(n AS DOUBLE) "
        "* (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) "
        "/ (CAST(n AS DOUBLE) - 1.0) AS var FROM a), "
        "f AS (SELECT "
        "MAX(CASE WHEN arm = 0 THEN n END) AS n0, "
        "MAX(CASE WHEN arm = 1 THEN n END) AS n1, "
        "MAX(CASE WHEN arm = 0 THEN mean END) AS m0, "
        "MAX(CASE WHEN arm = 1 THEN mean END) AS m1, "
        "MAX(CASE WHEN arm = 0 THEN var END) AS v0, "
        "MAX(CASE WHEN arm = 1 THEN var END) AS v1 FROM mo), "
        "g AS (SELECT n0, n1, m0, m1, v0, v1, "
        "v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE) AS se2 "
        "FROM f) "
        "SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b, "
        "ROUND(m0 - m1, 6) AS mean_diff, "
        "ROUND((m0 - m1) / SQRT(se2), 6) AS t_stat, "
        "ROUND((se2 * se2) / ("
        "(v0 / CAST(n0 AS DOUBLE)) * (v0 / CAST(n0 AS DOUBLE)) "
        "/ (CAST(n0 AS DOUBLE) - 1.0) "
        "+ (v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE)) "
        "/ (CAST(n1 AS DOUBLE) - 1.0)), 6) AS welch_df FROM g"
    )
    out["periodogram_daily"] = (
        "WITH c AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi, "
        "CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "dn AS (SELECT dd.t, COALESCE(c.x, 0) AS x "
        "FROM dd LEFT JOIN c ON c.d = dd.d), "
        "q AS (SELECT p.p, "
        "CAST(ROUND(CAST(dn.x AS DOUBLE) * COS(2.0 * PI() "
        "* CAST(dn.t AS DOUBLE) / CAST(p.p AS DOUBLE)) * 1e6, 0) "
        "AS BIGINT) AS tqc, "
        "CAST(ROUND(CAST(dn.x AS DOUBLE) * SIN(2.0 * PI() "
        "* CAST(dn.t AS DOUBLE) / CAST(p.p AS DOUBLE)) * 1e6, 0) "
        "AS BIGINT) AS tqs "
        "FROM (VALUES (7), (14), (30)) p(p) CROSS JOIN dn), "
        "a AS (SELECT p, CAST(SUM(tqc) AS DOUBLE) / 1e6 AS cc, "
        "CAST(SUM(tqs) AS DOUBLE) / 1e6 AS ss FROM q GROUP BY p) "
        "SELECT CAST(a.p AS BIGINT) AS period_days, "
        "ROUND((a.cc * a.cc + a.ss * a.ss) / CAST(mm.n AS DOUBLE), 6) "
        "AS power FROM a, mm"
    )
    out["nelson_aalen"] = (
        # same censored durations as kaplan_meier; d/n terms quantized
        # at 1e12, hazard prefix is an exact int64 window sum
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
        "q AS (SELECT t, di, ni, "
        "CAST(ROUND(CAST(di AS DOUBLE) / CAST(ni AS DOUBLE) * 1e12, 0) "
        "AS BIGINT) AS tq FROM risk) "
        "SELECT t AS t_us, ni AS n_at_risk, di AS n_events, "
        "ROUND(CAST(SUM(tq) OVER (ORDER BY t "
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e12, 6) "
        "AS cum_hazard FROM q"
    )
    out["bootstrap_ci"] = (
        f"WITH pc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM events GROUP BY user_id), "
        f"r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY user_id) - 1 "
        f"AS i FROM pc), "
        f"m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
        f"CAST(SUM(cnt) AS BIGINT) AS tot FROM pc), "
        f"g AS (SELECT b.range AS b, i.range AS i "
        f"FROM range(0, 200) b, range(0, 8192) i, m "
        f"WHERE i.range < m.m), "
        f"ix AS (SELECT g.b, "
        f"({_mx('g.b * m.m + g.i', 7)}) % m.m AS idx FROM g, m), "
        f"s AS (SELECT ix.b, CAST(SUM(r.cnt) AS BIGINT) AS sm "
        f"FROM ix JOIN r ON r.i = ix.idx GROUP BY ix.b), "
        f"rk AS (SELECT sm, ROW_NUMBER() OVER (ORDER BY sm, b) AS rn "
        f"FROM s) "
        f"SELECT "
        f"(SELECT ROUND(CAST(tot AS DOUBLE) / CAST(m AS DOUBLE), 6) "
        f"FROM m) AS mean, "
        f"ROUND((SELECT CAST(sm AS DOUBLE) FROM rk WHERE rn = 5) "
        f"/ (SELECT CAST(m AS DOUBLE) FROM m), 6) AS boot_lo, "
        f"ROUND((SELECT CAST(sm AS DOUBLE) FROM rk WHERE rn = 195) "
        f"/ (SELECT CAST(m AS DOUBLE) FROM m), 6) AS boot_hi"
    )
    out["harmonic_price"] = (
        "WITH l AS (SELECT p_brand, "
        "CAST(ROUND((1.0 / p_retailprice) * 1e12, 0) AS BIGINT) AS tq "
        "FROM part) "
        "SELECT p_brand, "
        "ROUND(CAST(COUNT(*) AS DOUBLE) "
        "/ (CAST(SUM(tq) AS DOUBLE) / 1e12), 6) AS harmonic_mean "
        "FROM l GROUP BY p_brand"
    )
    out["char_entropy"] = (
        # per-(doc, char) counts via empty-separator split; n*ln(n)
        # terms quantized at 1e12 (exact cross-char sum), mirrors
        # _q_char_entropy
        "WITH ch AS (SELECT doc_id, u.c AS c, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents, UNNEST(string_split(text, '')) u(c) "
        "GROUP BY doc_id, u.c), "
        "q AS (SELECT doc_id, "
        "CAST(ROUND(CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE)) * 1e12, 0) "
        "AS BIGINT) AS tq, n FROM ch) "
        "SELECT doc_id, "
        "ROUND(LN(CAST(SUM(n) AS DOUBLE)) "
        "- (CAST(SUM(tq) AS DOUBLE) / 1e12) / CAST(SUM(n) AS DOUBLE), 6) "
        "AS entropy FROM q GROUP BY doc_id"
    )
    out["rayleigh_hours"] = (
        # 24 circular terms quantized at 1e6; R and z from the shared
        # float tail (mirrors _q_rayleigh_hours)
        "WITH c AS (SELECT event_type, "
        "(epoch_us(ts) // 3600000000) % 24 AS h, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "t AS (SELECT event_type, n, "
        "2.0 * PI() * CAST(h AS DOUBLE) / 24.0 AS theta FROM c), "
        "qq AS (SELECT event_type, n, "
        "CAST(ROUND(CAST(n AS DOUBLE) * COS(theta) * 1e6, 0) AS BIGINT) "
        "AS tqc, "
        "CAST(ROUND(CAST(n AS DOUBLE) * SIN(theta) * 1e6, 0) AS BIGINT) "
        "AS tqs FROM t), "
        "a AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(SUM(tqc) AS DOUBLE) / 1e6 AS cc, "
        "CAST(SUM(tqs) AS DOUBLE) / 1e6 AS ss FROM qq "
        "GROUP BY event_type), "
        "r AS (SELECT event_type, nn, "
        "SQRT(cc * cc + ss * ss) / CAST(nn AS DOUBLE) AS rb FROM a) "
        "SELECT event_type, nn AS n, ROUND(rb, 6) AS r_bar, "
        "ROUND(CAST(nn AS DOUBLE) * rb * rb, 6) AS rayleigh_z FROM r"
    )
    out["mann_kendall"] = (
        # dense (quadrat, day) series; S = exact int pairwise-sign
        # sum, tie-corrected variance from integer tie moments
        "WITH c AS (SELECT (((event_id // 96) % 96) // 6) * 16 "
        "+ ((event_id % 96) // 6) AS q, "
        "epoch_us(ts) // 86400000000 AS d, "
        "CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), "
        "mm AS (SELECT MIN(d) AS lo, MAX(d) AS hi, "
        "CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n FROM c), "
        "dd AS (SELECT r.range AS t, mm.lo + r.range AS d "
        "FROM range(0, 4096) r, mm WHERE r.range <= mm.hi - mm.lo), "
        "qg AS (SELECT g.i AS q FROM generate_series(0, 255) g(i)), "
        "dn AS (SELECT qg.q, dd.t, COALESCE(c.x, 0) AS x "
        "FROM qg CROSS JOIN dd "
        "LEFT JOIN c ON c.q = qg.q AND c.d = dd.d), "
        "s AS (SELECT a.q, "
        "CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS s_stat "
        "FROM dn a JOIN dn b ON b.q = a.q AND b.t > a.t GROUP BY a.q), "
        "tg AS (SELECT q, x, CAST(COUNT(*) AS BIGINT) AS tc "
        "FROM dn GROUP BY q, x), "
        "tcor AS (SELECT q, "
        "CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS t_corr "
        "FROM tg GROUP BY q), "
        "v AS (SELECT s.q, s.s_stat, "
        "(CAST(mm.n * (mm.n - 1) * (2 * mm.n + 5) AS DOUBLE) "
        "- CAST(tcor.t_corr AS DOUBLE)) / 18.0 AS var "
        "FROM s JOIN tcor ON tcor.q = s.q CROSS JOIN mm) "
        "SELECT q AS quadrat, s_stat, "
        "ROUND(CASE WHEN s_stat > 0 "
        "THEN (CAST(s_stat AS DOUBLE) - 1.0) / SQRT(var) "
        "WHEN s_stat < 0 "
        "THEN (CAST(s_stat AS DOUBLE) + 1.0) / SQRT(var) "
        "ELSE 0.0 END, 6) AS mk_z FROM v"
    )
    out["local_moran"] = (
        # neighbor VALUE sums stay int64 (s_nb - k*mu replaces the
        # float neighbor-deviation sum); one shared float expression
        # per cell -- mirrors _q_local_moran
        "WITH e AS (SELECT (event_id % 96) AS gx, "
        "((event_id // 96) % 96) AS gy, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "lat AS (SELECT a.i AS gx, b.i AS gy FROM "
        "generate_series(0, 95) a(i) CROSS JOIN "
        "generate_series(0, 95) b(i)), "
        "x AS (SELECT lat.gx, lat.gy, "
        "CAST(COALESCE(e.n, 0) AS BIGINT) AS v "
        "FROM lat LEFT JOIN e ON lat.gx = e.gx AND lat.gy = e.gy), "
        "nb AS (SELECT a.gx, a.gy, b.v FROM x a JOIN x b "
        "ON b.gx = a.gx + 1 AND b.gy = a.gy "
        "UNION ALL SELECT a.gx, a.gy, b.v FROM x a JOIN x b "
        "ON b.gx = a.gx - 1 AND b.gy = a.gy "
        "UNION ALL SELECT a.gx, a.gy, b.v FROM x a JOIN x b "
        "ON b.gx = a.gx AND b.gy = a.gy + 1 "
        "UNION ALL SELECT a.gx, a.gy, b.v FROM x a JOIN x b "
        "ON b.gx = a.gx AND b.gy = a.gy - 1), "
        "ns AS (SELECT gx, gy, CAST(SUM(v) AS BIGINT) AS s_nb, "
        "CAST(COUNT(*) AS BIGINT) AS k FROM nb GROUP BY gx, gy), "
        "s AS (SELECT CAST(SUM(v) AS BIGINT) AS s_tot, "
        "CAST(SUM(v * v) AS BIGINT) AS q_tot FROM x), "
        "f AS (SELECT CAST(s_tot AS DOUBLE) / 9216.0 AS mu, "
        "q_tot FROM s) "
        "SELECT x.gx, x.gy, "
        "ROUND((CAST(x.v AS DOUBLE) - f.mu) "
        "* (CAST(ns.s_nb AS DOUBLE) - CAST(ns.k AS DOUBLE) * f.mu) "
        "/ ((CAST(f.q_tot AS DOUBLE) - 9216.0 * f.mu * f.mu) / 9216.0), "
        "6) AS local_i "
        "FROM x JOIN ns ON ns.gx = x.gx AND ns.gy = x.gy CROSS JOIN f"
    )
    out["quadrat_test"] = (
        "WITH q AS (SELECT (((event_id // 96) % 96) // 6) * 16 "
        "+ ((event_id % 96) // 6) AS q FROM events), "
        "c AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM q GROUP BY q), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS s, "
        "CAST(SUM(n * n) AS BIGINT) AS q2 FROM c), "
        "f AS (SELECT s, q2, CAST(s AS DOUBLE) / 256.0 AS m FROM t) "
        "SELECT s AS n_events, "
        "ROUND((CAST(q2 AS DOUBLE) - 2.0 * m * CAST(s AS DOUBLE) "
        "+ 256.0 * m * m) / m, 6) AS chi2, "
        "CAST(255 AS BIGINT) AS df FROM f"
    )
    out["clamped_balance"] = (
        # clamped running balance via the prefix-min identity
        # y = P - LEAST(0, running_min(P)) -- exact int64, no
        # recursion; mirrors _q_clamped_balance
        "WITH d AS (SELECT user_id, ts, event_id, "
        "CASE WHEN event_id % 2 = 0 "
        "THEN CAST(ROUND(value * 100, 0) AS BIGINT) "
        "ELSE -CAST(ROUND(value * 100, 0) AS BIGINT) END AS delta "
        "FROM events), "
        "p AS (SELECT user_id, ts, event_id, "
        "SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS pre FROM d), "
        "y AS (SELECT user_id, ts, event_id, "
        "pre - LEAST(0, MIN(pre) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS bal "
        "FROM p), "
        "r AS (SELECT user_id, bal, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "FROM y) "
        "SELECT user_id, "
        "CAST(MAX(CASE WHEN rn = 1 THEN bal END) AS BIGINT) "
        "AS final_balance, "
        "CAST(MAX(bal) AS BIGINT) AS max_balance "
        "FROM r GROUP BY user_id"
    )
    out["gearys_c"] = (
        # exact int64 neighbor-diff sums (both directions via the
        # symmetric pair join counted twice), shared float tail --
        # mirrors _q_gearys_c
        "WITH e AS (SELECT (event_id % 96) AS gx, "
        "((event_id // 96) % 96) AS gy, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "lat AS (SELECT a.i AS gx, b.i AS gy FROM "
        "generate_series(0, 95) a(i) CROSS JOIN "
        "generate_series(0, 95) b(i)), "
        "x AS (SELECT lat.gx, lat.gy, "
        "CAST(COALESCE(e.n, 0) AS BIGINT) AS v "
        "FROM lat LEFT JOIN e ON lat.gx = e.gx AND lat.gy = e.gy), "
        "s AS (SELECT CAST(SUM(v) AS BIGINT) AS s_tot, "
        "CAST(SUM(v * v) AS BIGINT) AS q_tot FROM x), "
        "nb AS (SELECT CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) "
        "AS h FROM x a JOIN x b ON a.gy = b.gy AND b.gx = a.gx + 1), "
        "nv AS (SELECT CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) "
        "AS vv FROM x a JOIN x b ON a.gx = b.gx AND b.gy = a.gy + 1), "
        "f AS (SELECT 2 * nb.h + 2 * nv.vv AS num, "
        "CAST(s.s_tot AS DOUBLE) / 9216.0 AS mu, s.q_tot "
        "FROM nb, nv, s) "
        "SELECT ROUND(((9216.0 - 1.0) * CAST(num AS DOUBLE)) "
        "/ ((2.0 * 36480.0) * (CAST(q_tot AS DOUBLE) "
        "- 9216.0 * mu * mu)), 6) AS gearys_c FROM f"
    )
    return out
