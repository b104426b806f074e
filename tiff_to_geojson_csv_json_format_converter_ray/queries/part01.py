"""Query implementations, part 01 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: extract_full, extract_valid, stride_sample, bounds, band_stats, cell_counts, pip_join, pip_join_sharded, bbox_join, knn, knn_outside, within_radius, bilinear_sample, focal_counts, tile_slope, tile_ruggedness, tile_tpi, tile_curvature, region_labels, tile_hillshade, flow_direction, flow_accumulation, watershed_labels, idw_probes, downsample_raster, knn_balltree, zonal_stats, events_geocode, track_lengths, bounce_rate, burstiness, hapax_ratio, dedup_summary, zipf_slope, interval_union, kaplan_meier, aspect_classes, line_of_sight, kruskal_wallis, mann_whitney ...
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


def _read_pq(path, **kwargs):
    """Size-aware read: block count derived from on-disk bytes so the
    small-sf query tables don't shatter into dozens of tiny read tasks
    (sources/reader.py); identical semantics to ray.data.read_parquet."""
    from tiff_to_geojson_csv_json_format_converter_ray.sources.reader import (
        read_parquet_auto,
    )

    return read_parquet_auto(path, **kwargs)


# ----------------------------------------------------------------- oracle grid
# FROZEN spec -- mirrored literally in the SQL strings below.
OG_H = 96
OG_W = 96
OG_TILE = 48
OG_TRANSFORM = (0.01, 0.0, 77.0, 0.0, -0.01, 29.0)
OG_NODATA = -3.4028234663852886e38  # float32 lowest
OG_SAMPLE_RATE = OG_H * OG_W // 2000  # stride rate (doesSamples.py:74-77)

# convex CCW quads inside the grid footprint (lon [77.0, 77.96],
# lat [28.04, 29.0]): q0/q1 overlap; q_out misses the grid entirely.
# No axis-parallel edges; vertices off the pixel-center lattice.
OG_POLYGONS = {
    "q0": [(77.081, 28.153), (77.552, 28.081), (77.853, 28.522), (77.351, 28.901)],
    "q1": [(77.402, 28.303), (77.901, 28.202), (77.802, 28.751), (77.501, 28.602)],
    "q_out": [(85.1, 20.2), (86.2, 20.3), (86.0, 21.4), (85.2, 21.3)],
}

OG_KNN_PROBES = [
    (77.1234, 28.7567),
    (77.9001, 28.3002),
    (77.4567, 28.1234),
    (77.8999, 28.9101),
]

# probes FAR OUTSIDE the grid extent in every direction -- the regime
# where round-1's ring-expansion cap silently returned the wrong
# neighbor (ADVICE r1, functions/knn.py); oracled so the driver gate
# pins the fix
OG_KNN_OUTSIDE_PROBES = [
    (90.0, 50.0),
    (60.0, 5.0),
    (77.25, -40.0),
    (95.0, 80.0),
    (-10.0, 28.0),
]


def _og_tiles_table(sparse_invalid: bool = False, tile: int = OG_TILE) -> pa.Table:
    """Engine-side construction of the oracle grid as a tile table
    (4 tiles of 48x48) -- values identical to the SQL expressions.

    ``sparse_invalid`` switches to the slope fixture's nodata rule
    ((r*5 + c*3) % 29 == 0, ~3.4%): the default rule's residues mod 11
    cover EVERY 3x3 window, so no window is fully valid and focal
    derivatives would be vacuously empty."""
    from tiff_to_geojson_csv_json_format_converter_ray.schema import TILE_SCHEMA

    rr, cc = np.meshgrid(np.arange(OG_H), np.arange(OG_W), indexing="ij")
    raw = ((rr * 73 + cc * 31) % 500) / 10.0
    vals = raw.astype(np.float32)
    if sparse_invalid:
        invalid = (rr * 5 + cc * 3) % 29 == 0
    else:
        invalid = (rr * 7 + cc * 13) % 11 < 3
    vals[invalid] = np.float32(OG_NODATA)

    ids, srcs, bands, ro, co, hs, ws, tr, crs, nd, values = ([] for _ in range(11))
    for r0 in range(0, OG_H, tile):
        for c0 in range(0, OG_W, tile):
            ids.append(f"og_{r0}_{c0}")
            srcs.append("oracle")
            bands.append(1)
            ro.append(r0)
            co.append(c0)
            hs.append(tile)
            ws.append(tile)
            tr.append(list(OG_TRANSFORM))
            crs.append("EPSG:4326")
            nd.append(OG_NODATA)
            values.append(
                vals[r0 : r0 + tile, c0 : c0 + tile].ravel().tolist()
            )
    return pa.table(
        {
            "tile_id": ids, "src": srcs,
            "band": pa.array(bands, pa.int32()),
            "row_off": pa.array(ro, pa.int32()),
            "col_off": pa.array(co, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "transform": pa.array(tr, pa.list_(pa.float64(), 6)),
            "crs": crs,
            "nodata": pa.array(nd, pa.float64()),
            "values": pa.array(values, pa.list_(pa.float32())),
        },
        schema=TILE_SCHEMA,
    )


def _og_points_ds(valid_only: bool = False, cells: tuple[int, ...] = ()):
    """Oracle grid -> point Dataset via the real pipeline stages."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
        TilePivot, master_widths_of,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.transform import (
        ValidityFilter,
    )

    tiles = _og_tiles_table()
    ds = ray.data.from_arrow(tiles)
    pivot = TilePivot(
        round_output=False,
        reproject=True,
        with_cells=cells,
        master_widths=master_widths_of(tiles),
    )
    pts = ds.map_batches(pivot, batch_format="pyarrow", batch_size=None)
    if valid_only:
        pts = pts.map_batches(ValidityFilter("threshold"), batch_format="pyarrow", batch_size=None)
    return pts


# SQL fragment generating the identical grid (lon/lat/z/pix), the
# float32 quantization included.
_OG_GRID_SQL = f"""
  SELECT
    r.range AS row, c.range AS col,
    (r.range * {OG_W} + c.range) AS pix,
    CAST(CAST(77.0 + 0.01 * (CAST(c.range AS DOUBLE) + 0.5) AS REAL) AS DOUBLE) AS lon,
    CAST(CAST(29.0 + (-0.01) * (CAST(r.range AS DOUBLE) + 0.5) AS REAL) AS DOUBLE) AS lat,
    CASE WHEN (r.range * 7 + c.range * 13) % 11 < 3
         THEN CAST(CAST(-3.4028234663852886e+38 AS REAL) AS DOUBLE)
         ELSE CAST(CAST(((r.range * 73 + c.range * 31) % 500) / 10.0 AS REAL) AS DOUBLE)
    END AS z
  FROM range(0, {OG_H}) r, range(0, {OG_W}) c
"""

# the slope fixture's grid: same values, sparse nodata rule
# (_og_tiles_table(sparse_invalid=True))
_OG_SLOPE_GRID_SQL = f"""
  SELECT
    r.range AS row, c.range AS col,
    CASE WHEN (r.range * 5 + c.range * 3) % 29 = 0
         THEN CAST(CAST(-3.4028234663852886e+38 AS REAL) AS DOUBLE)
         ELSE CAST(CAST(((r.range * 73 + c.range * 31) % 500) / 10.0 AS REAL) AS DOUBLE)
    END AS z
  FROM range(0, {OG_H}) r, range(0, {OG_W}) c
"""


def _corr_matrix_oracle_sql() -> str:
    """Pairwise Pearson matrix from the SAME exact int64 moments the
    engine accumulates (corr from SQL's CORR() would differ in float
    summation order; this formulation is bit-reproducible)."""
    cols = ["qty", "dollars", "disc_bp", "tax_bp"]
    base = (
        "WITH q AS (SELECT "
        "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
        "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS dollars, "
        "CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS disc_bp, "
        "CAST(ROUND(l_tax * 10000, 0) AS BIGINT) AS tax_bp "
        "FROM lineitem), m AS (SELECT "
        "CAST(COUNT(*) AS DOUBLE) AS n, "
    )
    parts = []
    for c in cols:
        parts.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
        parts.append(f"CAST(SUM({c} * {c}) AS DOUBLE) AS ss_{c}")
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            parts.append(f"CAST(SUM({a} * {b}) AS DOUBLE) AS sp_{a}_{b}")
    base += ", ".join(parts) + " FROM q) "
    selects = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"ROUND((n * sp_{a}_{b} - s_{a} * s_{b}) / "
                f"(SQRT(n * ss_{a} - s_{a} * s_{a}) * "
                f"SQRT(n * ss_{b} - s_{b} * s_{b})), 6) AS corr FROM m"
            )
    return base + " UNION ALL ".join(selects)



def _perimeter_oracle_sql() -> str:
    """Edge-quantized perimeter over the fixture polygons (mirrors
    _q_polygon_perimeter's 1e9-tick edge terms)."""
    rows = []
    for pid, poly in OG_POLYGONS.items():
        pts = list(poly)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
            rows.append(f"('{pid}', {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    values = ", ".join(rows)
    return (
        f"WITH e0(pid, rx1, ry1, rx2, ry2) AS (VALUES {values}), "
        "e AS (SELECT pid, CAST(rx1 AS DOUBLE) AS x1, "
        "CAST(ry1 AS DOUBLE) AS y1, CAST(rx2 AS DOUBLE) AS x2, "
        "CAST(ry2 AS DOUBLE) AS y2 FROM e0), "
        "t AS (SELECT pid, CAST(ROUND(SQRT((x2 - x1) * (x2 - x1) "
        "+ (y2 - y1) * (y2 - y1)) * 1e9, 0) AS BIGINT) AS q FROM e) "
        "SELECT pid AS polygon_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_edges, "
        "ROUND(CAST(SUM(q) AS DOUBLE) / 1e9, 6) AS perimeter "
        "FROM t GROUP BY pid"
    )


def _centroid_oracle_sql() -> str:
    """Shoelace area+centroid over the fixture polygons: per-edge
    VALUES, each term quantized half-away to 1e-6 ticks and summed as
    BIGINT -- the identical integers the engine accumulates
    (functions/geometry.py::ring_centroid_quantized), so the final
    double divisions match bit-for-bit."""
    rows = []
    for pid, poly in OG_POLYGONS.items():
        pts = list(poly)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
            rows.append(f"('{pid}', {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    values = ", ".join(rows)
    q = (
        "CAST(CASE WHEN {t} < 0 THEN -FLOOR(-({t}) * 1000000.0 + 0.5) "
        "ELSE FLOOR(({t}) * 1000000.0 + 0.5) END AS BIGINT)"
    )
    return (
        f"WITH e0(pid, rx1, ry1, rx2, ry2) AS (VALUES {values}), "
        f"e AS (SELECT pid, CAST(rx1 AS DOUBLE) AS x1, "
        f"CAST(ry1 AS DOUBLE) AS y1, CAST(rx2 AS DOUBLE) AS x2, "
        f"CAST(ry2 AS DOUBLE) AS y2 FROM e0), "
        f"t AS (SELECT pid, "
        f"{q.format(t='x1 * y2 - x2 * y1')} AS qc, "
        f"{q.format(t='(x1 + x2) * (x1 * y2 - x2 * y1)')} AS qx, "
        f"{q.format(t='(y1 + y2) * (x1 * y2 - x2 * y1)')} AS qy "
        f"FROM e), "
        f"s AS (SELECT pid, SUM(qc) AS a2, SUM(qx) AS cx6, SUM(qy) AS cy6 "
        f"FROM t GROUP BY pid) "
        f"SELECT pid AS polygon_id, "
        f"ROUND(CAST(a2 AS DOUBLE) / (2.0 * 1000000.0), 6) AS area, "
        f"ROUND(CAST(cx6 AS DOUBLE) / (3.0 * CAST(a2 AS DOUBLE)), 6) AS cx, "
        f"ROUND(CAST(cy6 AS DOUBLE) / (3.0 * CAST(a2 AS DOUBLE)), 6) AS cy "
        f"FROM s"
    )


def _halfplane_sql(poly: list[tuple[float, float]]) -> str:
    """Strict-interior convex PIP as AND of half-plane tests (CCW)."""
    terms = []
    n = len(poly)
    for i in range(n):
        ax, ay = poly[i]
        bx, by = poly[(i + 1) % n]
        terms.append(
            f"(({bx!r} - {ax!r}) * (lat - {ay!r}) - ({by!r} - {ay!r}) * (lon - {ax!r}) > 0)"
        )
    return " AND ".join(terms)


def _cell_expr(res: int) -> str:
    return _cell_expr_cols("lon", "lat", res)


def _cell_expr_cols(lon_col: str, lat_col: str, res: int) -> str:
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        oracle_sql_expr,
    )

    return oracle_sql_expr(lon_col, lat_col, res)


# ------------------------------------------------------------------- queries
def _q_extract_full(sf_dir: str) -> pa.Table:
    """T1/T2: full pixel->point extract of the oracle grid."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    pts = _og_points_ds(valid_only=False)
    t = collect_tables(pts)
    return t.select(["pix", "lon", "lat", "z"])


def _q_extract_valid(sf_dir: str) -> pa.Table:
    """T6: validity filter (z > -1e30)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    return collect_tables(_og_points_ds(valid_only=True)).select(
        ["pix", "lon", "lat", "z"]
    )


def _q_stride_sample(sf_dir: str) -> pa.Table:
    """P1: deterministic stride sampling."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sampling import (
        StrideSampler,
    )

    pts = _og_points_ds().map_batches(
        StrideSampler(OG_SAMPLE_RATE), batch_format="pyarrow", batch_size=None
    )
    return collect_tables(pts).select(["pix", "lon", "lat", "z"])


def _q_bounds(sf_dir: str) -> pa.Table:
    """A5/P6: global bounds over valid points."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        grouped_minmax,
    )

    out = grouped_minmax(_og_points_ds(valid_only=True), ["src"], ["lon", "lat", "z"])
    return out.select(
        ["src", "min_lon", "max_lon", "min_lat", "max_lat", "min_z", "max_z"]
    )


def _q_band_stats(sf_dir: str) -> pa.Table:
    """A1: per-band stats over valid pixels (mean/std rounded 6 dp)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import grouped_stats

    out = grouped_stats(_og_points_ds(valid_only=True), ["band"], "z")
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import round_like_sql

    return pa.table(
        {
            "band": out["band"],
            "count": out["count"],
            "min": out["min"],
            "max": out["max"],
            "mean": round_like_sql(out["mean"], 6),
            "std": round_like_sql(out["std"], 6),
        }
    )


def _q_cell_counts(sf_dir: str) -> pa.Table:
    """Cell encoding (frozen H3-role index) + count per res-8 cell."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    pts = _og_points_ds(valid_only=True, cells=(8,))
    return partial_count(pts, ["cell_8"]).rename_columns(["cell_8", "n"])


def _q_pip_join(sf_dir: str) -> pa.Table:
    """J3: point-in-polygon join counts per polygon."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import PIPJoiner
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    polys = _og_polygons_table()
    pts = _og_points_ds(valid_only=True)
    joined = pts.map_batches(PIPJoiner(polys), batch_format="pyarrow", batch_size=None)
    out = partial_count(joined, ["polygon_id"]).rename_columns(["polygon_id", "n"])
    return _complete_zero(out, list(OG_POLYGONS))


def _q_pip_join_sharded(sf_dir: str) -> pa.Table:
    """J3 scale tier: cell-sharded PIP join (groupby-cell co-location,
    NO polygon broadcast) -- must hash-match the broadcast pip_join
    oracle exactly."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        sharded_pip_join,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    polys = _og_polygons_table()
    pts = _og_points_ds(valid_only=True)
    joined = sharded_pip_join(pts, polys, res=7)
    out = partial_count(joined, ["polygon_id"]).rename_columns(["polygon_id", "n"])
    return _complete_zero(out, list(OG_POLYGONS))


def _complete_zero(counts: pa.Table, all_ids: list[str]) -> pa.Table:
    """Add n=0 rows for polygons with no matches (join completeness)."""
    have = set(counts["polygon_id"].to_pylist())
    missing = [p for p in all_ids if p not in have]
    if not missing:
        return counts
    extra = pa.table(
        {
            "polygon_id": pa.array(missing, counts.schema.field("polygon_id").type),
            "n": pa.array([0] * len(missing), counts.schema.field("n").type),
        }
    )
    return pa.concat_tables([counts, extra], promote_options="default")


def _og_polygons_table() -> pa.Table:
    rows = []
    for pid, ring in OG_POLYGONS.items():
        r = [[float(x), float(y)] for x, y in ring] + [[float(ring[0][0]), float(ring[0][1])]]
        xs = [p[0] for p in r]
        ys = [p[1] for p in r]
        rows.append(
            {
                "polygon_id": pid, "geom_type": "Polygon", "rings": [r],
                "minx": min(xs), "miny": min(ys), "maxx": max(xs), "maxy": max(ys),
            }
        )
    return pa.Table.from_pylist(rows)


def _q_bbox_join(sf_dir: str) -> pa.Table:
    """J1: tile x polygon bbox semi-join -> surviving tile ids."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import BboxSemiJoin
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    tiles = ray.data.from_arrow(_og_tiles_table())
    pruned = tiles.map_batches(
        BboxSemiJoin(_og_polygons_table(), from_transform=True),
        batch_format="pyarrow", batch_size=None,
    )
    t = collect_tables(pruned)
    if t is None:
        return pa.table({"tile_id": pa.array([], pa.string())})
    return t.select(["tile_id"])


def _q_knn(sf_dir: str) -> pa.Table:
    """J4: k=1 nearest valid grid point per probe."""
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
    out = (
        ray.data.from_arrow(probes)
        .map_batches(
            KNNLookup(ref, k=1, payload_cols=("pix", "z")),
            batch_format="pyarrow", batch_size=None,
        )
    )
    t = collect_tables(out)
    return t.select(["probe_id", "nn_pix", "nn_z"]).rename_columns(
        ["probe_id", "pix", "z"]
    )



def _q_knn_outside(sf_dir: str) -> pa.Table:
    """J4 with probes far outside the index extent (ADVICE r1 fix):
    the grid index must still return the true nearest neighbor."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import KNNLookup

    ref = collect_tables(_og_points_ds(valid_only=True))
    probes = pa.table(
        {
            "probe_id": pa.array(range(len(OG_KNN_OUTSIDE_PROBES)), pa.int64()),
            "lon": pa.array([p[0] for p in OG_KNN_OUTSIDE_PROBES]),
            "lat": pa.array([p[1] for p in OG_KNN_OUTSIDE_PROBES]),
        }
    )
    out = (
        ray.data.from_arrow(probes)
        .map_batches(
            KNNLookup(ref, k=1, payload_cols=("pix", "z")),
            batch_format="pyarrow", batch_size=None,
        )
    )
    t = collect_tables(out)
    return t.select(["probe_id", "nn_pix", "nn_z"]).rename_columns(
        ["probe_id", "pix", "z"]
    )


def _q_within_radius(sf_dir: str) -> pa.Table:
    """Distance-band join (range form of J4): every valid grid point
    within 0.025 deg of each probe -- one row per (probe, point)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import RadiusJoin

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
            RadiusJoin(ref, radius=0.025, payload_cols=("pix", "z")),
            batch_format="pyarrow", batch_size=None,
        )
    )
    return out.select(["probe_id", "nn_pix", "nn_z"]).rename_columns(
        ["probe_id", "pix", "z"]
    )


def _q_bilinear_sample(sf_dir: str) -> pa.Table:
    """Raster point sampling, bilinear: each probe's value is the
    weighted mean of its 4 surrounding pixel centers.  The tiny
    (pix -> probe, weight) stencil is built driver-side from the
    affine transform, broadcast, and gathered from the streaming
    point dataset by a partial-sum combine -- the raster stays
    distributed, only the 16-row stencil moves."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.affine import (
        bilinear_weights,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    plon = np.array([p[0] for p in OG_KNN_PROBES])
    plat = np.array([p[1] for p in OG_KNN_PROBES])
    rows, cols, w = bilinear_weights(OG_TRANSFORM, plon, plat)
    stencil_pix = (rows * OG_W + cols).ravel()
    stencil_probe = np.repeat(np.arange(len(plon), dtype=np.int64), 4)
    stencil_w = w.ravel()
    order = np.argsort(stencil_pix, kind="stable")
    spix, sprobe, sw = (
        stencil_pix[order], stencil_probe[order], stencil_w[order]
    )

    pts = _og_points_ds(valid_only=False)

    def gather(batch: pa.Table) -> pa.Table:
        pix = batch["pix"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        # candidate rows via one sorted lookup, then emit one row per
        # matching STENCIL entry (handles probes sharing a pixel)
        keep = np.flatnonzero(np.isin(pix, spix))
        probes_out: list[np.ndarray] = []
        wz_out: list[np.ndarray] = []
        for i in keep:
            m = spix == pix[i]
            probes_out.append(sprobe[m])
            wz_out.append(sw[m] * z[i])
        if not probes_out:
            return pa.table(
                {"probe_id": pa.array([], pa.int64()),
                 "wz": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "probe_id": pa.array(np.concatenate(probes_out)),
                "wz": pa.array(np.concatenate(wz_out)),
            }
        )

    agg = hash_aggregate(
        pts.map_batches(gather, batch_format="pyarrow", batch_size=None),
        ["probe_id"], [("wz", "sum", "bilinear_z")],
    )
    return pa.table(
        {
            "probe_id": agg["probe_id"],
            "bilinear_z": round_like_sql(agg["bilinear_z"], 6),
        }
    )


def _q_focal_counts(sf_dir: str) -> pa.Table:
    """Focal statistics: per-cell point counts smoothed by the 3x3
    neighborhood mean (over cells present) -- count via the tier-2
    combiner, focal window over the small aggregated table."""
    import numpy as np
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        focal_mean,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    pts = _og_points_ds(valid_only=True, cells=(8,))
    counts = partial_count(pts, ["cell_8"]).rename_columns(["cell_8", "n"])
    fm = focal_mean(
        counts["cell_8"].to_numpy(zero_copy_only=False),
        counts["n"].to_numpy(zero_copy_only=False).astype(np.float64),
        k=1,
    )
    return pa.table(
        {"cell_8": counts["cell_8"], "focal_n": round_like_sql(pa.array(fm), 6)}
    )


def _q_tile_slope(sf_dir: str) -> pa.Table:
    """Horn 3x3 slope over the oracle raster via the distributed tile
    halo-exchange operator (stages/raster.py): tiles swap 1-pixel
    boundary strips through a groupby shuffle, the derivative runs
    per-tile -- the engine analogue of the precomputed slope layer the
    reference serves over WMS (slope.js:56-76)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_slope,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_slope(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "slope_pct": round_like_sql(out["slope_pct"], 6),
        }
    )


def _q_tile_ruggedness(sf_dir: str) -> pa.Table:
    """Terrain Ruggedness Index (Riley et al. 1999) over the slope
    fixture raster via the halo-exchange shuffle -- third consumer of
    the stages/raster.py focal machinery."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_ruggedness,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_ruggedness(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "tri": round_like_sql(out["tri"], 6),
        }
    )


def _q_tile_tpi(sf_dir: str) -> pa.Table:
    """Topographic Position Index (Weiss 2001: center minus 8-neighbor
    mean; ridge/valley classifier input) over the slope fixture raster
    via the halo-exchange shuffle (stages/raster.py::tile_tpi)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_tpi,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_tpi(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "tpi": round_like_sql(out["tpi"], 6),
        }
    )


def _q_tile_curvature(sf_dir: str) -> pa.Table:
    """Zevenbergen-Thorne general/profile/plan curvature over the
    slope fixture raster via the halo-exchange shuffle
    (stages/raster.py::tile_curvature) -- the remaining classic DEM
    derivative next to slope/aspect/TRI/hillshade that GIS servers
    precompute for map UIs (the reference serves such derived layers
    over WMS, slope.js:56-76)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_curvature,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_curvature(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "curv_general": round_like_sql(out["curv_general"], 6),
            "curv_profile": round_like_sql(out["curv_profile"], 6),
            "curv_plan": round_like_sql(out["curv_plan"], 6),
        }
    )


def _q_region_labels(sf_dir: str) -> pa.Table:
    """Connected-component labeling of above-threshold raster regions
    (blob detection, 4-connectivity) over the slope fixture: the
    halo-exchange shuffle emits cross-tile adjacency edges once each,
    the tiered min-label machinery resolves components
    (stages/raster.py::tile_region_labels)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_region_labels,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    return tile_region_labels(tiles, threshold=45.0)


def _q_tile_hillshade(sf_dir: str) -> pa.Table:
    """Lambertian hillshade (az 315 / alt 45) over the slope fixture
    raster -- trig-free algebraic normal-dot-light form, fourth
    consumer of the halo-exchange focal machinery."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_hillshade,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_hillshade(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "hillshade": round_like_sql(out["hillshade"], 6),
        }
    )


def _q_flow_direction(sf_dir: str) -> pa.Table:
    """D8 flow direction over the slope fixture raster via the halo-
    exchange shuffle (second consumer of stages/raster.py, proving the
    focal machinery generalizes beyond Horn)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_flow_direction,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_flow_direction(tiles))
    return out.select(["row", "col", "d8"])


def _q_flow_accumulation(sf_dir: str) -> pa.Table:
    """D8 flow accumulation (drainage cells incl. self) over the slope
    fixture raster -- the TauDEM-style two-level operator
    (stages/raster.py::flow_accumulation): per-block sequential Kahn +
    boundary-outflow forwarding on the perimeter-bounded entry forest
    + route replay."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        flow_accumulation,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    return flow_accumulation(tiles, block=32)


def _q_watershed_labels(sf_dir: str) -> pa.Table:
    """Watershed labeling over the slope fixture raster: every valid
    D8 cell labeled with its terminal sink cell (same two-level
    decomposition as flow_accumulation)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        watershed_labels,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    return watershed_labels(tiles, block=32)


def _q_idw_probes(sf_dir: str) -> pa.Table:
    """Inverse-distance-weighted interpolation at the probe points
    (w = 1/d^2 over valid grid points within 0.025 deg)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        idw_interpolate,
    )

    ref = collect_tables(_og_points_ds(valid_only=True))
    probes = pa.table(
        {
            "probe_id": pa.array(range(len(OG_KNN_PROBES)), pa.int64()),
            "lon": pa.array([p[0] for p in OG_KNN_PROBES]),
            "lat": pa.array([p[1] for p in OG_KNN_PROBES]),
        }
    )
    out = idw_interpolate(
        ray.data.from_arrow(probes), ref, radius=0.025, value_col="z"
    )
    return pa.table(
        {"probe_id": out["probe_id"], "idw_z": round_like_sql(out["idw"], 6)}
    )


def _q_downsample_raster(sf_dir: str) -> pa.Table:
    """Raster pyramid step: re-aggregate the res-9 extract to res-5
    cells (~16 points per cell on this grid; count/avg/min/max per
    parent cell) via exact bit-shift parenthood + the
    partial-aggregate combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        downsample_cells,
    )

    pts = _og_points_ds(valid_only=True, cells=(9,))
    t = downsample_cells(pts, 5, from_col="cell_9", value_col="z")
    return pa.table(
        {
            "cell_5": t["cell_5"],
            "n": t["count"],
            "avg_z": round_like_sql(t["mean"], 6),
            "min_z": t["min"],
            "max_z": t["max"],
        }
    )


def _q_knn_balltree(sf_dir: str) -> pa.Table:
    """J4 via the ball-tree backend -- must equal the grid backend
    (and the SQL oracle) exactly."""
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
            KNNLookup(ref, k=1, payload_cols=("pix", "z"), backend="balltree"),
            batch_format="pyarrow", batch_size=None,
        )
    )
    return out.select(["probe_id", "nn_pix", "nn_z"]).rename_columns(
        ["probe_id", "pix", "z"]
    )


def _q_zonal_stats(sf_dir: str) -> pa.Table:
    """A1 x J3: per-polygon zonal stats over the oracle grid."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import PIPJoiner
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import grouped_stats
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import round_like_sql

    pts = _og_points_ds(valid_only=True)
    joined = pts.map_batches(PIPJoiner(_og_polygons_table()), batch_format="pyarrow", batch_size=None)
    out = grouped_stats(joined, ["polygon_id"], "z")
    return pa.table(
        {
            "polygon_id": out["polygon_id"],
            "count": out["count"],
            "min": out["min"],
            "max": out["max"],
            "mean": round_like_sql(out["mean"], 6),
            "std": round_like_sql(out["std"], 6),
        }
    )


# ---------------- spatial ops driven from the driver's own tables ----------
def _q_events_geocode(sf_dir: str) -> pa.Table:
    """Geocode events rows (deterministic id->lon/lat), assign frozen
    res-8 cells, count per cell -- the tiling shuffle shape of the
    flagship pipeline, over a driver table."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import cell_of
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        return pa.table(
            {"cell_8": pa.array(cell_of(lon, lat, 8))}
        )

    return partial_count(
        ds.map_batches(geocode, batch_format="pyarrow", batch_size=None), ["cell_8"]
    ).rename_columns(["cell_8", "n"])


def _q_track_lengths(sf_dir: str) -> pa.Table:
    """Per-user track length: geocoded events ordered by (ts,
    event_id) within each user, planar distance summed over
    consecutive fixes -- an ordered per-key spatial window, routed
    through the groupby shuffle + map_groups tier (co-location is
    required for the ordering).  Thin collect over the streaming
    pipelines/tracks.py::track_lengths_ds (the write_parquet scale
    path for key spaces beyond driver memory)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        track_lengths_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(track_lengths_ds(ds)).select(
        ["user_id", "track_len"]
    )


def _og_multiband_tiles_table(bands: tuple[int, ...] = (1, 2)) -> pa.Table:
    """Formula multiband tile fixture: band b's pixel value is
    ``((r*73 + c*31 + b*101) % 500) / 10.0`` (float32), invalid where
    ``(r*5 + c*3 + b) % 29 == 0`` -- per-band nodata masks, so band
    math exercises the both-bands-valid contract."""
    from tiff_to_geojson_csv_json_format_converter_ray.schema import TILE_SCHEMA

    rr, cc = np.meshgrid(np.arange(OG_H), np.arange(OG_W), indexing="ij")
    rows = {k: [] for k in (
        "tile_id", "src", "band", "row_off", "col_off", "height",
        "width", "transform", "crs", "nodata", "values",
    )}
    for b in bands:
        raw = ((rr * 73 + cc * 31 + b * 101) % 500) / 10.0
        vals = raw.astype(np.float32)
        vals[(rr * 5 + cc * 3 + b) % 29 == 0] = np.float32(OG_NODATA)
        for r0 in range(0, OG_H, OG_TILE):
            for c0 in range(0, OG_W, OG_TILE):
                rows["tile_id"].append(f"og_{r0}_{c0}_b{b}")
                rows["src"].append("oracle")
                rows["band"].append(b)
                rows["row_off"].append(r0)
                rows["col_off"].append(c0)
                rows["height"].append(OG_TILE)
                rows["width"].append(OG_TILE)
                rows["transform"].append(list(OG_TRANSFORM))
                rows["crs"].append("EPSG:4326")
                rows["nodata"].append(OG_NODATA)
                rows["values"].append(
                    vals[r0 : r0 + OG_TILE, c0 : c0 + OG_TILE].ravel().tolist()
                )
    return pa.table(
        {
            "tile_id": rows["tile_id"], "src": rows["src"],
            "band": pa.array(rows["band"], pa.int32()),
            "row_off": pa.array(rows["row_off"], pa.int32()),
            "col_off": pa.array(rows["col_off"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "width": pa.array(rows["width"], pa.int32()),
            "transform": pa.array(rows["transform"], pa.list_(pa.float64(), 6)),
            "crs": rows["crs"],
            "nodata": pa.array(rows["nodata"], pa.float64()),
            "values": pa.array(rows["values"], pa.list_(pa.float32())),
        },
        schema=TILE_SCHEMA,
    )


def _q_bounce_rate(sf_dir: str) -> pa.Table:
    """Session bounce rate per user (30-min inactivity sessionization;
    stages/window.py::keyed_bounce_rate)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_bounce_rate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return collect_tables(keyed_bounce_rate(ds, gap_s=1800.0))


def _q_burstiness(sf_dir: str) -> pa.Table:
    """Burstiness index per user over inter-event gaps (Goh &
    Barabasi; stages/window.py::keyed_burstiness)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_burstiness,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return collect_tables(keyed_burstiness(ds))


def _q_hapax_ratio(sf_dir: str) -> pa.Table:
    """Hapax legomena ratio per language: share of vocabulary
    occurring exactly once -- the corpus-linguistics health check
    (synthetic/templated text collapses it).  Token counts per (lang,
    token) via per-batch combiners; the ratio is one division over
    exact counts."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # the SAME RE2 \\s+ tokenizer as token_frequencies / the SQL
        # oracle (python str.split differs on Unicode whitespace)
        lists = pc.split_pattern_regex(batch["text"], pattern=r"\s+")
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        toks = pc.list_flatten(lists)
        langs = pa.array(
            np.repeat(
                np.asarray(batch["lang"].to_pylist(), dtype=object), lens
            ),
            pa.string(),
        )
        keep = pc.not_equal(toks, "")
        t = pa.table({"lang": langs, "token": toks}).filter(keep)
        t = t.append_column("_one", pa.array(np.ones(t.num_rows, np.int64)))
        out = t.group_by(["lang", "token"]).aggregate([("_one", "sum")])
        return out.rename_columns(["lang", "token", "n"])

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["lang", "token"],
        [("n", "sum", "n")],
    )
    lang = np.asarray(counts["lang"].to_pylist(), dtype=object)
    n = counts["n"].to_numpy(zero_copy_only=False)
    out_l, out_v, out_h, out_r = [], [], [], []
    for lg in sorted(set(lang.tolist())):
        sel = lang == lg
        vocab = int(sel.sum())
        hapax = int((n[sel] == 1).sum())
        out_l.append(lg)
        out_v.append(vocab)
        out_h.append(hapax)
        out_r.append(hapax / vocab)
    return pa.table(
        {
            "lang": pa.array(out_l, pa.string()),
            "n_vocab": pa.array(out_v, pa.int64()),
            "n_hapax": pa.array(out_h, pa.int64()),
            "hapax_ratio": round_like_sql(out_r, 6),
        }
    )


def _q_dedup_summary(sf_dir: str) -> pa.Table:
    """Exact-duplicate cluster-size histogram over document text (the
    dedup audit: how much mass sits in clusters of each size).
    Text-hash counts via per-batch combiners; histogram = counts of
    counts."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "text": batch["text"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        out = t.group_by(["text"]).aggregate([("_one", "sum")])
        return out.rename_columns(["text", "n"])

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["text"],
        [("n", "sum", "n")],
    )
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sizes, freqs = np.unique(n, return_counts=True)
    return pa.table(
        {
            "cluster_size": pa.array(sizes),
            "n_clusters": pa.array(freqs.astype(np.int64)),
            "n_docs": pa.array((sizes * freqs).astype(np.int64)),
        }
    )


def _q_zipf_slope(sf_dir: str) -> pa.Table:
    """Zipf rank-frequency exponent of the corpus vocabulary: least-
    squares slope of ln(freq) on ln(rank), both quantized to 1e-4
    fixed point so the five regression moments sum as EXACT integers
    (the grouped_regression discipline; int64-safe at webtext vocab
    sizes).  Rank ties break (count desc, token).  Healthy natural
    text sits near -1."""
    import pyarrow.compute as pc
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away, round_like_sql,
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

    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    counts = (
        pa.concat_tables([t for t in parts if t.num_rows])
        .group_by("token")
        .aggregate([("n", "sum")])
        .rename_columns(["token", "n"])
    )
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = np.asarray(counts["token"].to_pylist(), dtype=object)
    order = np.lexsort((toks, -n))
    n = n[order]
    rank = np.arange(1, len(n) + 1, dtype=np.float64)
    xq = round_half_away(np.log(rank) * 10000.0).astype(np.int64)
    yq = round_half_away(np.log(n.astype(np.float64)) * 10000.0).astype(np.int64)
    cnt = np.int64(len(xq))
    sx, sy = int(xq.sum()), int(yq.sum())
    sxx, sxy = int((xq * xq).sum()), int((xq * yq).sum())
    slope = (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
    return pa.table(
        {
            "n_vocab": pa.array([int(cnt)], pa.int64()),
            "zipf_slope": round_like_sql([float(slope)], 6),
        }
    )


def _q_interval_union(sf_dir: str) -> pa.Table:
    """Merged-interval coverage time per user (30-min activity
    windows; stages/window.py::keyed_interval_union)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_interval_union,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts"],
    )
    return collect_tables(keyed_interval_union(ds, window_s=1800.0))


def _q_kaplan_meier(sf_dir: str) -> pa.Table:
    """Kaplan-Meier survival of time-to-first-error per user with
    right-censoring at last activity
    (pipelines/relational.py::kaplan_meier)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        kaplan_meier,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    return kaplan_meier(ds, event_type="error")


def _q_aspect_classes(sf_dir: str) -> pa.Table:
    """Slope-facing (aspect) octant histogram over the fixture DEM:
    downhill direction = (-p, -q) from the Horn gradients, classified
    into 8 compass octants by PURE COMPARISONS (D8 convention, no
    atan2 -- trig octant boundaries would be the only float-parity
    hazard); flats (p = q = 0) bucket separately.  Counts roll up via
    the tier-2 combiner."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        make_emit_halos,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))

    def pq_kernel(group: pa.Table) -> pa.Table:
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            _assemble_padded, NODATA_THRESHOLD,
        )

        asm = _assemble_padded(group)
        empty = pa.table({"octant": pa.array([], pa.string())})
        if asm is None:
            return empty
        pad, h, w, r0, c0, transform = asm
        za = pad[0:h, 0:w]; zb = pad[0:h, 1:w+1]; zc = pad[0:h, 2:w+2]
        zd = pad[1:h+1, 0:w]; ze = pad[1:h+1, 1:w+1]; zf = pad[1:h+1, 2:w+2]
        zg = pad[2:h+2, 0:w]; zh = pad[2:h+2, 1:w+1]; zi = pad[2:h+2, 2:w+2]
        stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
        valid = np.all(np.isfinite(stack) & (stack > NODATA_THRESHOLD), axis=0)
        if not valid.any():
            return empty
        p = ((zc + 2.0 * zf + zi) - (za + 2.0 * zd + zg)) / (8.0 * 0.01)
        q = ((zg + 2.0 * zh + zi) - (za + 2.0 * zb + zc)) / (8.0 * 0.01)
        dx, dy = -p, -q  # downhill
        adx, ady = np.abs(dx), np.abs(dy)
        east = adx > ady
        north = ady > adx
        diag = ~east & ~north
        names = np.full(dx.shape, "FLAT", dtype=object)
        names[east & (dx > 0)] = "E"
        names[east & (dx < 0)] = "W"
        names[north & (dy > 0)] = "N"
        names[north & (dy < 0)] = "S"
        names[diag & (dx > 0) & (dy > 0)] = "NE"
        names[diag & (dx > 0) & (dy < 0)] = "SE"
        names[diag & (dx < 0) & (dy > 0)] = "NW"
        names[diag & (dx < 0) & (dy < 0)] = "SW"
        return pa.table(
            {"octant": pa.array(list(names[valid]), pa.string())}
        )

    halos = tiles.map_batches(
        make_emit_halos(None, None), batch_format="pyarrow", batch_size=None
    )
    oct_ds = halos.groupby("halo_key").map_groups(
        pq_kernel, batch_format="pyarrow"
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    out = partial_count(oct_ds, ["octant"])
    return pa.table(
        {
            "octant": out["octant"],
            "n_pixels": out["count"].cast(pa.int64()),
        }
    ).sort_by("octant")


def _q_line_of_sight(sf_dir: str) -> pa.Table:
    """Intervisibility between all probe pairs over the slope-fixture
    DEM (stages/raster.py::line_of_sight): fixed-fraction nearest-
    pixel sampling along each sight line, blocked where valid terrain
    strictly exceeds the interpolated line (+2.0 clearance at the
    endpoints).  The distributed form is the broadcast-raster
    map_batches of the bilinear_sample family; the fixture DEM is
    driver-bounded here."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        line_of_sight,
    )

    tiles = _og_tiles_table(sparse_invalid=True, tile=24)
    z = np.full((OG_H, OG_W), np.nan, np.float64)
    for i in range(tiles.num_rows):
        r0 = tiles["row_off"][i].as_py()
        c0 = tiles["col_off"][i].as_py()
        hh = tiles["height"][i].as_py()
        ww = tiles["width"][i].as_py()
        z[r0:r0+hh, c0:c0+ww] = np.asarray(
            tiles["values"][i].as_py(), np.float32
        ).reshape(hh, ww).astype(np.float64)
    valid = z > -1e30
    out_pid, out_vis, out_nb = [], [], []
    probes = list(enumerate(OG_KNN_PROBES))
    for i, (ia, pa_) in enumerate(probes):
        for ib, pb in probes[i + 1:]:
            vis, nb = line_of_sight(
                z, valid, pa_[0], pa_[1], pb[0], pb[1],
                list(OG_TRANSFORM), n_steps=64, clearance=2.0,
            )
            out_pid.append(ia * 10 + ib)
            out_vis.append(1 if vis else 0)
            out_nb.append(nb)
    return pa.table(
        {
            "pair_id": pa.array(out_pid, pa.int64()),
            "visible": pa.array(out_vis, pa.int64()),
            "n_blocked": pa.array(out_nb, pa.int64()),
        }
    )


def _q_kruskal_wallis(sf_dir: str) -> pa.Table:
    """Kruskal-Wallis H across the event types (k-group rank test,
    the nonparametric one-way ANOVA): tie-averaged ranks from the
    combiner-aggregated (cents, type) count table, per-group rank
    sums exact multiples of 0.5, H closed-form (no tie correction,
    documented)."""
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
        return pa.table(
            {
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "event_type": batch["event_type"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c", "event_type"],
        [("_one", "sum", "n")],
    ).sort_by([("c", "ascending"), ("event_type", "ascending")])
    c = counts["c"].to_numpy(zero_copy_only=False)
    et = np.asarray(counts["event_type"].to_pylist(), dtype=object)
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals, inv = np.unique(c, return_inverse=True)
    n_c = np.zeros(len(vals), np.int64)
    np.add.at(n_c, inv, n)
    rank_min = 1 + np.concatenate(([0], np.cumsum(n_c)[:-1]))
    avgrank = rank_min.astype(np.float64) + (n_c - 1).astype(np.float64) / 2.0
    big_n = float(n.sum())
    types, rsum, ns = [], [], []
    for t in sorted(set(et.tolist())):
        sel = et == t
        types.append(t)
        rsum.append(float((n[sel] * avgrank[inv[sel]]).sum()))
        ns.append(float(n[sel].sum()))
    h = 0.0
    for r, m in zip(rsum, ns):
        h = h + r * r / m
    h = 12.0 / (big_n * (big_n + 1.0)) * h - 3.0 * (big_n + 1.0)
    return pa.table(
        {
            "n_groups": pa.array([len(types)], pa.int64()),
            "n_total": pa.array([int(big_n)], pa.int64()),
            "h_stat": round_like_sql([h], 6),
        }
    )


def _q_mann_whitney(sf_dir: str) -> pa.Table:
    """Mann-Whitney U (rank-sum) test of event value between the
    hash-split A/B arms -- the nonparametric counterpart of ab_ztest.
    Tie-averaged ranks from a combiner-aggregated (cents, arm) count
    table (distinct cents are domain-bounded, so ranks need no global
    sort of rows); rank sums are exact multiples of 0.5, so parity
    with SQL is structural.  z uses the no-tie-correction normal
    approximation (documented)."""
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
                "arm": pa.array(mix32(uid, 13) % 2),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c", "arm"],
        [("_one", "sum", "n")],
    ).sort_by([("c", "ascending"), ("arm", "ascending")])
    c = counts["c"].to_numpy(zero_copy_only=False)
    arm = counts["arm"].to_numpy(zero_copy_only=False)
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals, inv = np.unique(c, return_inverse=True)
    n_c = np.zeros(len(vals), np.int64)
    np.add.at(n_c, inv, n)
    rank_min = 1 + np.concatenate(([0], np.cumsum(n_c)[:-1]))
    avgrank = rank_min.astype(np.float64) + (n_c - 1).astype(np.float64) / 2.0
    r_a = float((n[arm == 0] * avgrank[inv[arm == 0]]).sum())
    n_a = int(n[arm == 0].sum())
    n_b = int(n[arm == 1].sum())
    u_a = r_a - n_a * (n_a + 1) / 2.0
    mu = n_a * n_b / 2.0
    se = np.sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)
    z = (u_a - mu) / se
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "rank_sum_a": round_like_sql([r_a], 6),
            "u_a": round_like_sql([u_a], 6),
            "z_stat": round_like_sql([float(z)], 6),
        }
    )


def _q_mutual_nn(sf_dir: str) -> pa.Table:
    """Reciprocal nearest-neighbor pairs over user activity centroids
    (mutual-NN is the high-precision matcher used in entity
    resolution and bitext mining): centroids from exact integer
    lattice moments (combiner tier), NN by squared distance with
    user-id tie-break, keep pairs where each is the other's NN."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
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
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "sx": pa.array(eid % 96),
                "sy": pa.array((eid // 96) % 96),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("_one", "sum", "n"), ("sx", "sum", "sx"), ("sy", "sum", "sy")],
    ).sort_by("user_id")
    uid = agg["user_id"].to_numpy(zero_copy_only=False)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    cx = agg["sx"].to_numpy(zero_copy_only=False).astype(np.float64) / n
    cy = agg["sy"].to_numpy(zero_copy_only=False).astype(np.float64) / n
    dx = cx[:, None] - cx[None, :]
    dy = cy[:, None] - cy[None, :]
    d2 = dx * dx + dy * dy
    np.fill_diagonal(d2, np.inf)
    # NN with user-id tie-break: argmin over (d2, uid)
    order = np.lexsort((np.broadcast_to(uid, d2.shape), d2))
    nn = uid[order[:, 0]]
    nn_d2 = d2[np.arange(len(uid)), order[:, 0]]
    nn_of = dict(zip(uid.tolist(), nn.tolist()))
    out_a, out_b, out_d = [], [], []
    for i, u in enumerate(uid.tolist()):
        v = int(nn[i])
        if u < v and nn_of[v] == u:
            out_a.append(u)
            out_b.append(v)
            out_d.append(float(np.sqrt(nn_d2[i])))
    return pa.table(
        {
            "user_a": pa.array(out_a, pa.int64()),
            "user_b": pa.array(out_b, pa.int64()),
            "dist": round_like_sql(out_d, 6),
        }
    )


def _q_abc_classes(sf_dir: str) -> pa.Table:
    """ABC (Pareto) inventory classification: parts sorted by revenue
    (exact cents), class A = cumulative share <= 0.8, B <= 0.95, C
    rest -- cumulative shares from exact integer prefix sums, one
    float division per part.  Per-part revenue via the combiner tier;
    the classification pass is over the part dimension."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "c": pa.array(scaled_int(batch["l_extendedprice"], 100.0)),
            }
        )

    per_part = hash_aggregate(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        ["l_partkey"],
        [("c", "sum", "rev")],
    )
    pk = per_part["l_partkey"].to_numpy(zero_copy_only=False)
    rev = per_part["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pk, -rev))
    rev_s = rev[order]
    total = float(rev_s.sum())
    cum = np.cumsum(rev_s).astype(np.float64)
    share = cum / total
    cls = np.where(share <= 0.8, "A", np.where(share <= 0.95, "B", "C"))
    out_cls, out_n, out_rev = [], [], []
    for k in ("A", "B", "C"):
        sel = cls == k
        out_cls.append(k)
        out_n.append(int(sel.sum()))
        out_rev.append(int(rev_s[sel].sum()))
    return pa.table(
        {
            "abc_class": pa.array(out_cls, pa.string()),
            "n_parts": pa.array(out_n, pa.int64()),
            "revenue_cents": pa.array(out_rev, pa.int64()),
        }
    )


def _q_peak_concurrency(sf_dir: str) -> pa.Table:
    """Peak concurrency: the maximum number of simultaneously active
    30-minute event windows (the max-concurrent-users sweep).
    Half-open [start, end) intervals -- at equal timestamps ENDS
    process before STARTS; exact int64 endpoint deltas, running sum,
    global max."""
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
    parts = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        parts.append(t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
    ts = np.concatenate(parts)
    w = 1_800_000_000
    times = np.concatenate([ts, ts + w])
    delta = np.concatenate(
        [np.ones(len(ts), np.int64), -np.ones(len(ts), np.int64)]
    )
    order = np.lexsort((delta, times))  # ends (-1) before starts (+1)
    running = np.cumsum(delta[order])
    return pa.table(
        {
            "n_intervals": pa.array([len(ts)], pa.int64()),
            "peak_concurrency": pa.array([int(running.max())], pa.int64()),
        }
    )


def _q_value_histogram(sf_dir: str) -> pa.Table:
    """Equal-width value histogram per event type (20 bins over the
    global [min, max); top bin closed) -- the profiling staple.  Bin
    edges from exact global cents min/max, bin ids by integer
    arithmetic, counts via the combiner tier."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "c": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    q = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    mm = hash_aggregate(
        q, [], [("c", "min", "cmin"), ("c", "max", "cmax")]
    )
    cmin = int(mm["cmin"][0].as_py())
    cmax = int(mm["cmax"][0].as_py())
    width = max((cmax - cmin + 19) // 20, 1)

    def binned(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        b = np.minimum((c - cmin) // width, 19)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "bin": pa.array(b.astype(np.int64)),
                "_one": batch["_one"],
            }
        )

    out = hash_aggregate(
        q.map_batches(binned, batch_format="pyarrow", batch_size=None),
        ["event_type", "bin"],
        [("_one", "sum", "n")],
    )
    return pa.table(
        {
            "event_type": out["event_type"],
            "bin": out["bin"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
        }
    ).sort_by([("event_type", "ascending"), ("bin", "ascending")])


def _q_word_degree_dist(sf_dir: str) -> pa.Table:
    """Degree distribution of the edit-1 word graph (how many words
    have k variants) -- the graph-shape profile next to components /
    PageRank / triangles."""
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
    words = pairs["w1"].to_pylist() + pairs["w2"].to_pylist()
    uniq, deg = np.unique(np.asarray(words, dtype=object), return_counts=True)
    ks, nk = np.unique(deg, return_counts=True)
    return pa.table(
        {
            "degree": pa.array(ks.astype(np.int64)),
            "n_words": pa.array(nk.astype(np.int64)),
        }
    )


def _q_cover_bbox(sf_dir: str) -> pa.Table:
    """Covering-cell planner (RegionCoverer role) over the q0
    polygon bbox: maximal fully-inside cells + res-8 boundary cells
    (functions/cells.py::cover_bbox)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        cover_bbox,
    )

    poly = OG_POLYGONS["q0"]
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    return cover_bbox(min(xs), min(ys), max(xs), max(ys),
                      res_min=5, res_max=8)


def _q_adaptive_quadtree(sf_dir: str) -> pa.Table:
    """Adaptive quadtree tiling of the valid oracle points (split
    cells holding > 12 points, res 5..8) -- the balanced-partition
    builder for skewed point sets
    (functions/cells.py::adaptive_quadtree)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        adaptive_quadtree,
    )

    pts = _og_points_ds(valid_only=True)
    return adaptive_quadtree(
        pts, res_min=5, res_max=8, max_points=12
    )


def _q_spearman(sf_dir: str) -> pa.Table:
    """Spearman rank correlation of quantity vs price per returnflag:
    tie-averaged ranks DOUBLED to exact int64 (``2*rank_min + ties -
    1``; Pearson is scale-invariant, so corr over 2x-ranks equals
    corr over ranks), rank maps built from domain-bounded distinct-
    value counts and broadcast for the per-row moment pass -- every
    sufficient statistic an exact int64 sum, closed form once per
    group in SQL-identical float order."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def quantize(batch: pa.Table) -> pa.Table:
        x = round_half_away(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        y = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "f": batch["l_returnflag"],
                "x": pa.array(x),
                "y": pa.array(y),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    quant = ds.map_batches(quantize, batch_format="pyarrow", batch_size=None)

    def rank_map(col: str) -> dict:
        counts = hash_aggregate(
            quant, ["f", col], [("_one", "sum", "n")]
        ).sort_by([("f", "ascending"), (col, "ascending")])
        fs = np.asarray(counts["f"].to_pylist(), dtype=object)
        vs = counts[col].to_numpy(zero_copy_only=False)
        ns = counts["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {}
        for f in sorted(set(fs.tolist())):
            sel = fs == f
            v, n = vs[sel], ns[sel]
            rank_min = 1 + np.concatenate(([0], np.cumsum(n)[:-1]))
            s = 2 * rank_min + (n - 1)  # exact 2x tie-averaged rank
            out[f] = dict(zip(v.tolist(), s.tolist()))
        return out

    mx, my = rank_map("x"), rank_map("y")

    # per-flag sorted lookup arrays for vectorized searchsorted maps
    lookup = {}
    for f in set(mx) | set(my):
        xv = np.array(sorted(mx[f]), np.int64)
        xs = np.array([mx[f][int(v)] for v in xv], np.int64)
        yv = np.array(sorted(my[f]), np.int64)
        ys = np.array([my[f][int(v)] for v in yv], np.int64)
        lookup[f] = (xv, xs, yv, ys)

    def moments(batch: pa.Table) -> pa.Table:
        fs = np.asarray(batch["f"].to_pylist(), dtype=object)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        sx = np.zeros(len(x), np.int64)
        sy = np.zeros(len(y), np.int64)
        for f in set(fs.tolist()):
            sel = fs == f
            xv, xs, yv, ys = lookup[f]
            sx[sel] = xs[np.searchsorted(xv, x[sel])]
            sy[sel] = ys[np.searchsorted(yv, y[sel])]
        return pa.table(
            {
                "f": batch["f"],
                "_one": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(sx),
                "sy": pa.array(sy),
                "sxx": pa.array(sx * sx),
                "syy": pa.array(sy * sy),
                "sxy": pa.array(sx * sy),
            }
        )

    agg = hash_aggregate(
        quant.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["f"],
        [("_one", "sum", "n"), ("sx", "sum", "sx"), ("sy", "sum", "sy"),
         ("sxx", "sum", "sxx"), ("syy", "sum", "syy"),
         ("sxy", "sum", "sxy")],
    ).sort_by("f")
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = agg["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
    sy = agg["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxx = agg["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
    syy = agg["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
    sxy = agg["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
    rho = (n * sxy - sx * sy) / np.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return pa.table(
        {
            "l_returnflag": agg["f"],
            "n": agg["n"].cast(pa.int64()),
            "spearman_rho": round_like_sql(rho, 6),
        }
    )


def _q_anova_eta2(sf_dir: str) -> pa.Table:
    """One-way ANOVA effect size (eta-squared) of hour-of-day on
    event value, per event type -- the seasonality-strength scalar
    behind the hourly profile: between-group variance over total
    variance, all sufficient statistics exact int64 cents sums
    (combiner tier), closed forms once per type."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array((ts // 3_600_000_000) % 24),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
                "c": pa.array(c),
                "cc": pa.array(c * c),
            }
        )

    out = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "hour"],
        [("_one", "sum", "n"), ("c", "sum", "s"), ("cc", "sum", "sq")],
    )
    et = np.asarray(out["event_type"].to_pylist(), dtype=object)
    n = out["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = out["s"].to_numpy(zero_copy_only=False).astype(np.float64)
    sq = out["sq"].to_numpy(zero_copy_only=False).astype(np.float64)
    types, e2 = [], []
    for t in sorted(set(et.tolist())):
        sel = et == t
        big_n = n[sel].sum()
        big_s = s[sel].sum()
        big_sq = sq[sel].sum()
        mean = big_s / big_n
        total_var = big_sq / big_n - mean * mean
        between = (s[sel] * s[sel] / n[sel]).sum() / big_n - mean * mean
        types.append(t)
        e2.append(between / total_var)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "eta_squared": round_like_sql(e2, 6),
        }
    )


def _q_ab_ztest(sf_dir: str) -> pa.Table:
    """Two-proportion z-test on user conversion between hash-split
    A/B arms (pipelines/relational.py::ab_conversion_ztest)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        ab_conversion_ztest,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    return ab_conversion_ztest(ds, seed=13, min_purchases=14)


def _q_readability(sf_dir: str) -> pa.Table:
    """Flesch reading-ease per document from regex-countable proxies
    (stages/textops.py::readability_scores)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        readability_scores,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return collect_tables(readability_scores(ds))


def _q_theil_sen(sf_dir: str) -> pa.Table:
    """Theil-Sen robust value-over-time slope per event type: median
    of pairwise slopes over a deterministic hash-gated subsample --
    element selection end to end, no float accumulation
    (pipelines/relational.py::theil_sen_by_key)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        theil_sen_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "ts", "value"],
    )
    return theil_sen_by_key(ds, "event_type", sample_mod=7, seed=41)


def _q_radius_of_gyration(sf_dir: str) -> pa.Table:
    """Radius of gyration per user (Gonzalez et al. 2008) on the exact
    integer lattice via the one-division moment form
    (pipelines/tracks.py::radius_of_gyration_ds)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        radius_of_gyration_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id"],
    )
    return collect_tables(radius_of_gyration_ds(ds))


def _q_visit_entropy(sf_dir: str) -> pa.Table:
    """Visit-location entropy per user (Song et al. 2010
    predictability): Shannon entropy of the res-6 cell visit
    distribution -- the mobility instance of the grouped-entropy
    combiner (pipelines/relational.py::grouped_entropy)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        cell_of,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_entropy,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        geocode_events,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def add_cell(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "cell_6": pa.array(
                    cell_of(
                        batch["lon"].to_numpy(zero_copy_only=False),
                        batch["lat"].to_numpy(zero_copy_only=False),
                        6,
                    )
                ),
            }
        )

    cells = geocode_events(ds).map_batches(
        add_cell, batch_format="pyarrow", batch_size=None
    )
    return grouped_entropy(cells, "user_id", "cell_6")


def _q_skew_report(sf_dir: str) -> pa.Table:
    """Shuffle-key skew diagnostics over documents.lang (heavy keys,
    size quantiles, recommended salt factor) -- the machine-readable
    pre-flight for the explicit skew handling the north rule requires
    (stages/shuffle.py::skew_report)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        skew_report,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )
    return skew_report(ds, "lang", top_n=3)


def _q_cost_distance(sf_dir: str) -> pa.Table:
    """Cost-distance propagation (GIS cost surface) over the slope
    fixture: 8 synchronous relaxation rounds, each one a tile halo
    exchange (stages/raster.py::cost_distance_rounds) -- equals the
    min path cost over <= 8 edges from any seed, which the bounded
    recursive oracle enumerates.  All-int64 costs: exact, tiling-
    independent."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        cost_distance_rounds,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    return collect_tables(
        cost_distance_rounds(tiles, seed_threshold=48.0, n_rounds=8)
    )


def _q_band_math_ndi(sf_dir: str) -> pa.Table:
    """Normalized-difference band math over the formula multiband
    fixture: the band-align groupby join + vectorized (a-b)/(a+b)
    (stages/raster.py::band_math_ndi)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        band_math_ndi,
    )

    tiles = ray.data.from_arrow(_og_multiband_tiles_table((1, 2)))
    out = collect_tables(band_math_ndi(tiles, band_a=1, band_b=2))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "ndi": round_like_sql(out["ndi"], 6),
        }
    )


def _q_od_matrix(sf_dir: str) -> pa.Table:
    """Origin-destination flow matrix over user tracks at cell res 6
    (pipelines/tracks.py::od_matrix_ds): per-user pre-aggregated
    (from, to) trip counts, one small grouped combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        od_matrix_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    out = od_matrix_ds(ds, res=6)
    return pa.table(
        {
            "cell_from": out["cell_from"].cast(pa.int64()),
            "cell_to": out["cell_to"].cast(pa.int64()),
            "n_trips": out["n_trips"].cast(pa.int64()),
        }
    )


def _q_track_geodesic(sf_dir: str) -> pa.Table:
    """Great-circle per-user track length (km) via the pinned-order
    haversine (pipelines/tracks.py::track_geodesic_length_ds)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        track_geodesic_length_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(track_geodesic_length_ds(ds))


def _q_track_straightness(sf_dir: str) -> pa.Table:
    """Per-user straightness (tortuosity) index: net displacement /
    gross path length (pipelines/tracks.py::track_straightness_ds)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        track_straightness_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(track_straightness_ds(ds))


def _q_hourly_profile(sf_dir: str) -> pa.Table:
    """Seasonal hour-of-day profile per event type: count + exact-
    cents mean value per (type, UTC hour) -- the calendar-seasonality
    rollup, combiner-shaped (per-batch partials, one small grouped
    combine)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array((ts // 3_600_000_000) % 24),
                "cents": pa.array(scaled_int(batch["value"], 100.0)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    out = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type", "hour"],
        [("_one", "sum", "n"), ("cents", "sum", "sum_cents")],
    )
    n = out["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    sc = out["sum_cents"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "event_type": out["event_type"],
            "hour": out["hour"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
            "mean_value": round_like_sql(sc / n / 100.0, 6),
        }
    )


_INTERP_GRID_US = [
    # 2024-01-08 / 15 / 22 / 29 00:00 UTC, microseconds since epoch
    1704672000000000,
    1705276800000000,
    1705881600000000,
    1706486400000000,
]


def _q_linear_interp(sf_dir: str) -> pa.Table:
    """Per-user linear interpolation of event value at 4 weekly grid
    timestamps (resample-to-grid; the interpolating cousin of LOCF) --
    exact int64 microsecond arithmetic, one float division
    (stages/window.py::keyed_linear_interp)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_linear_interp,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    return collect_tables(keyed_linear_interp(ds, _INTERP_GRID_US))


def _q_track_hausdorff(sf_dir: str) -> pa.Table:
    """Symmetric discrete Hausdorff distance between the tracks of
    users 0-19 (trajectory-similarity join;
    pipelines/tracks.py::track_hausdorff_pairs_ds)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        track_hausdorff_pairs_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(track_hausdorff_pairs_ds(ds, max_user=20))


def _q_boundary_distance(sf_dir: str) -> pa.Table:
    """Distance from probe points to each polygon's BOUNDARY (min
    point-to-segment distance over edges;
    functions/geometry.py::boundary_distance) -- the distance-to-
    geofence primitive behind proximity alerts.  Probes = the kNN
    fixture sets (inside ids 0-3, outside ids 100-104)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
        boundary_distance,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )

    probes = [(i, p) for i, p in enumerate(OG_KNN_PROBES)]
    probes += [(100 + i, p) for i, p in enumerate(OG_KNN_OUTSIDE_PROBES)]
    tbl = pa.table(
        {
            "probe_id": pa.array([i for i, _ in probes], pa.int64()),
            "lon": pa.array([p[0] for _, p in probes]),
            "lat": pa.array([p[1] for _, p in probes]),
        }
    )
    polys = {pid: np.asarray(pts, np.float64) for pid, pts in OG_POLYGONS.items()}

    def dist(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pid_out, probe_out, d_out = [], [], []
        for pid in sorted(polys):
            d = boundary_distance(lon, lat, polys[pid])
            pid_out.extend([pid] * len(d))
            probe_out.extend(batch["probe_id"].to_pylist())
            d_out.extend(d.tolist())
        return pa.table(
            {
                "probe_id": pa.array(probe_out, pa.int64()),
                "polygon_id": pa.array(pid_out, pa.string()),
                "dist_boundary": round_like_sql(d_out, 6),
            }
        )

    return collect_tables(
        ray.data.from_arrow(tbl).map_batches(
            dist, batch_format="pyarrow", batch_size=None
        )
    )


def _q_polygon_coverage(sf_dir: str) -> pa.Table:
    """Polygon rasterization: res-7 cell coverage fractions via an
    8x8 strict-halfplane supersample (the inverse of zonal stats;
    pipelines/zonal.py::polygon_coverage_ds).  Exact integer counts --
    engine and SQL evaluate the identical subpoint lattice and edge
    tests."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
        polygon_coverage_ds,
    )

    return collect_tables(polygon_coverage_ds(OG_POLYGONS, res=7, ss=8))


def _q_media_ahash_pairs(sf_dir: str) -> pa.Table:
    """Perceptual (average-hash) near-duplicate image pairs over REAL
    PNG bytes: the from-scratch codec decodes each payload, a
    stateless map_batches emits one 64-bit signature per image,
    Hamming pairs follow (stages/multimodal.py::image_ahash_pairs).
    The fixture's closed-form pixel rule (gen_media_grid) is what the
    SQL oracle recomputes -- so a hash mismatch catches BOTH a decode
    bug and a hash bug."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        gen_media_grid, image_ahash_pairs,
    )

    media = ray.data.from_arrow(gen_media_grid(n=24, size=32, n_base=16))
    return image_ahash_pairs(media, max_hamming=6)


def _q_media_ahash_pairs_banded(sf_dir: str) -> pa.Table:
    """The banded-LSH scale tier of the perceptual-pair op (signatures
    stay a Dataset; band groupby + exact popcount verify) against the
    SAME SQL oracle as media_ahash_pairs -- the pip_join_sharded
    pattern, round 4."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
        gen_media_grid, image_ahash_pairs,
    )

    media = ray.data.from_arrow(gen_media_grid(n=24, size=32, n_base=16))
    return image_ahash_pairs(media, max_hamming=6, tier="banded")


def _q_track_speed_stats(sf_dir: str) -> pa.Table:
    """Per-user speed profile (max speed, speeding-step count above
    0.1 units/hour) over consecutive geocoded fixes
    (pipelines/tracks.py::track_speed_stats_ds)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        track_speed_stats_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(track_speed_stats_ds(ds, speed_limit=0.1))


def _q_debounce_events(sf_dir: str) -> pa.Table:
    """Event debounce per (user, event_type): keep a row only >= 24 h
    after the last KEPT row (alert suppression; the kept set is a
    sequential recurrence, not a LAG) -- exact int64 microseconds
    (stages/window.py::keyed_debounce)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_debounce,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return collect_tables(keyed_debounce(ds, window_s=86400.0))


def _q_tile_focal_mode(sf_dir: str) -> pa.Table:
    """3x3 focal-mode (majority) filter over the slope fixture raster
    via the halo-exchange shuffle -- categorical-raster cleanup
    (stages/raster.py::focal_mode_kernel; smallest-value tie-break)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_focal_mode,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_focal_mode(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "focal_mode": round_like_sql(out["focal_mode"], 6),
        }
    )


def _q_tile_focal_median(sf_dir: str) -> pa.Table:
    """3x3 focal-median despeckle filter over the slope fixture raster
    via the halo-exchange shuffle -- pure element selection (5th order
    statistic), so no rounding is needed for SQL parity
    (stages/raster.py::focal_median_kernel)."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_focal_median,
    )

    tiles = ray.data.from_arrow(_og_tiles_table(sparse_invalid=True, tile=24))
    out = collect_tables(tile_focal_median(tiles))
    return pa.table(
        {
            "row": out["row"],
            "col": out["col"],
            "focal_median": round_like_sql(out["focal_median"], 6),
        }
    )


def _q_cusum_alarms(sf_dir: str) -> pa.Table:
    """One-sided CUSUM changepoint alarms per user (Page 1954), exact
    int64 arithmetic (cents x n deviations -- no float accumulation),
    partition-invariant (stages/window.py::keyed_cusum_alarms)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_cusum_alarms,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    return collect_tables(keyed_cusum_alarms(ds, h_units=50.0))


def _q_keyed_ewma(sf_dir: str) -> pa.Table:
    """Per-user exponentially weighted moving average of event value
    (alpha=0.2) over (ts, event_id) order -- the streaming smoother,
    evaluated sequentially so partitioning cannot change the float
    result (stages/window.py::keyed_ewma)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_ewma,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    return collect_tables(keyed_ewma(ds, alpha=0.2))


def _q_movement_directions(sf_dir: str) -> pa.Table:
    """Per-user movement-direction histogram (8 compass sectors, D8
    comparison-only classification) over consecutive geocoded fixes
    (pipelines/tracks.py::movement_directions_ds)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        movement_directions_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(movement_directions_ds(ds))


def _q_geofence_transitions(sf_dir: str) -> pa.Table:
    """Geofence ENTER/EXIT detection: geocoded user tracks vs the
    fixture polygon set (pipelines/tracks.py::geofence_transitions_ds).
    One int64 membership bitmask per fix before the shuffle (no row
    amplification), one keyed pass per user, a row per membership
    flip -- the trajectory-analytics form of the reference's PIP clip
    (test2.py:1272)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        geofence_transitions_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(geofence_transitions_ds(ds, OG_POLYGONS))


def _q_window_funcs(sf_dir: str) -> pa.Table:
    """SQL window-function family (ROW_NUMBER, running SUM, LAG delta,
    trailing moving AVG) per user ordered by (ts, event_id).  One keyed
    groupby shuffle; exact-int cents arithmetic inside the per-group
    kernel makes the running sums bit-reproducible vs DuckDB."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        keyed_window_functions,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    out = collect_tables(keyed_window_functions(ds))
    return pa.table(
        {
            "user_id": out["user_id"],
            "event_id": out["event_id"],
            "rn": out["rn"],
            "cum_cents": out["cum_cents"],
            "delta_us": out["delta_us"],
            "mov_avg3": out["mov_avg3"],
        }
    )


def _q_pivot_events(sf_dir: str) -> pa.Table:
    """Long->wide pivot: per-user count + value-cents sum per
    event_type (COUNT/SUM FILTER shape).  Indicator columns + grouped
    sum -- the pivot adds no shuffle beyond the aggregate's own."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        pivot_wide,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "cents": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    prepared = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    out = pivot_wide(
        prepared, "user_id", "event_type",
        categories=["click", "error", "purchase", "signup", "view"],
        value_col="cents",
    )
    cols = {"user_id": out["user_id"]}
    for c in ["click", "error", "purchase", "signup", "view"]:
        cols[f"n_{c}"] = out[f"n_{c}"].cast(pa.int64())
        cols[f"sum_{c}"] = out[f"sum_{c}"].cast(pa.int64())
    return pa.table(cols)


def _q_rollup_pricing(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(returnflag, linestatus): all prefix aggregation
    levels from ONE scan -- coarser levels re-aggregate the finest
    (group-bounded) table, never the raw rows."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        rollup_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "cents": pa.array(scaled_int(batch["l_extendedprice"], 100.0)),
            }
        )

    prepared = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=None)
    out = rollup_aggregate(
        prepared,
        ["l_returnflag", "l_linestatus"],
        [("cents", "count", "n"), ("cents", "sum", "sum_cents")],
    )
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "n": out["n"].cast(pa.int64()),
            "sum_cents": out["sum_cents"].cast(pa.int64()),
        }
    )


def _q_quantile_buckets(sf_dir: str) -> pa.Table:
    """NTILE-by-value bucketing: exact global quartile boundaries
    (iterative-histogram passes) broadcast into a per-row assign stage;
    per-bucket count + cents sum.  Data never shuffles."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        quantile_bucket,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
    )
    bucketed = quantile_bucket(
        ds, "l_extendedprice", qs=[0.25, 0.5, 0.75], bins=256,
        driver_cap=4096,
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": batch["bucket"],
                "cents": pa.array(scaled_int(batch["l_extendedprice"], 100.0)),
            }
        )

    out = hash_aggregate(
        bucketed.map_batches(to_cents, batch_format="pyarrow", batch_size=None),
        ["bucket"],
        [("cents", "count", "n"), ("cents", "sum", "sum_cents")],
    )
    return pa.table(
        {
            "bucket": out["bucket"].cast(pa.int64()),
            "n": out["n"].cast(pa.int64()),
            "sum_cents": out["sum_cents"].cast(pa.int64()),
        }
    )


def _q_weighted_sample(sf_dir: str) -> pa.Table:
    """Deterministic weighted sample w/o replacement (A-ES priorities
    over the bit-reproducible mix32 hash); combiner-pattern top-k."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        weighted_bottomk,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )
    out = weighted_bottomk(ds, "o_orderkey", "o_totalprice", k=25, seed=13)
    return pa.table(
        {"o_orderkey": out["o_orderkey"], "o_totalprice": out["o_totalprice"]}
    )


def _q_heavy_hitters(sf_dir: str) -> pa.Table:
    """Misra-Gries heavy-hitter tokens over documents: per-block exact
    count partials fold into a capacity-bounded driver summary.  At the
    fixture's vocab the summary never decrements, so the counts are
    exact and the SQL HAVING oracle pins them; the small-capacity
    error bound is pytest-verified."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        heavy_hitters,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    toks = ds.map_batches(
        lambda b: _explode_tokens(b, "text", "doc_id"),
        batch_format="pyarrow", batch_size=None,
    )
    return heavy_hitters(toks, "token", capacity=4096, min_count=50)


def _q_props_extract(sf_dir: str) -> pa.Table:
    """JSON metadata probe (webtext fast path): one vectorized RE2
    extract pulls the integer field from the JSON props column; counts
    per value via the grouped-sum combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.text import (
        json_probe_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["props"])

    def probe(batch: pa.Table) -> pa.Table:
        k = json_probe_int(batch["props"], "k")
        return pa.table({"k": k, "one": pa.nulls(len(k), pa.int64()).fill_null(1)})

    out = hash_aggregate(
        ds.map_batches(probe, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("one", "sum", "n")],
    )
    return pa.table(
        {"k": out["k"].cast(pa.int64()), "n": out["n"].cast(pa.int64())}
    )


def _q_funnel_steps(sf_dir: str) -> pa.Table:
    """Ordered funnel (view -> click -> purchase): per-user deepest
    step via one keyed shuffle; each user reduces to a single int
    before the combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        funnel_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts"],
    )
    return funnel_counts(ds, ["view", "click", "purchase"])


def _q_string_agg_nations(sf_dir: str) -> pa.Table:
    """Per-nation ordered STRING_AGG of customer names (the
    collect-to-list aggregate shape)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_string_agg,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_nationkey", "c_name", "c_custkey"],
    )
    out = grouped_string_agg(ds, "c_nationkey", "c_name", "c_custkey")
    return pa.table(
        {"c_nationkey": out["c_nationkey"].cast(pa.int32()), "agg": out["agg"]}
    )


def _q_grouped_corr(sf_dir: str) -> pa.Table:
    """Pearson corr(quantity, price-dollars) per returnflag from exact
    int64 moment sums -- bit-reproducible at any partitioning, unlike
    running-covariance corr."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_corr,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def to_ints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "qty": pa.array(scaled_int(batch["l_quantity"], 1.0)),
                "dollars": pa.array(scaled_int(batch["l_extendedprice"], 1.0)),
            }
        )

    prepared = ds.map_batches(to_ints, batch_format="pyarrow", batch_size=None)
    return grouped_corr(prepared, "l_returnflag", "qty", "dollars")


def _q_ngram_repetition(sf_dir: str) -> pa.Table:
    """Gopher/C4 quality signal: within-doc duplicate trigram fraction,
    vectorized entirely in Arrow kernels per batch."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        ngram_repetition,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = collect_tables(
        ds.map_batches(ngram_repetition, batch_format="pyarrow", batch_size=None)
    )
    return pa.table({"doc_id": out["doc_id"], "dup3": out["dup3"]})


def _q_cms_counts(sf_dir: str) -> pa.Table:
    """Count-min token frequencies: O(width*depth) driver state for
    unbounded vocab.  At the fixture vocab the sketch is collision-free
    (deterministic per seed+data), so the exact-count oracle pins it;
    adversarial-width error bounds are pytest-verified."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        cms_counts,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    toks = ds.map_batches(
        lambda b: _explode_tokens(b, "text", "doc_id"),
        batch_format="pyarrow", batch_size=None,
    )
    return cms_counts(toks, "token", width=4096, depth=4)


def _q_distinct_users_by_type(sf_dir: str) -> pa.Table:
    """Exact grouped COUNT(DISTINCT): per-batch distinct pairs combine
    to a (types x users)-bounded intermediate, then a tiny count."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    pairs = distinct(ds, ["event_type", "user_id"])
    out = (
        pairs.group_by("event_type")
        .aggregate([("user_id", "count")])
        .rename_columns(["event_type", "n_users"])
    )
    return pa.table(
        {"event_type": out["event_type"], "n_users": out["n_users"].cast(pa.int64())}
    )


def _q_kmeans_clusters(sf_dir: str) -> pa.Table:
    """Distributed Lloyd k-means over the embedding corpus (curation
    clustering).  Iterative, so no SQL oracle; partition-invariant by
    int64-quantized accumulation, pinned-golden checked."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        kmeans_cluster_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return kmeans_cluster_counts(ds, k=8, iters=4, seed=42)


def _q_zscore_chars(sf_dir: str) -> pa.Table:
    """Per-language z-score of document length: exact int64 moments ->
    broadcast (group, mean, std) -> vectorized standardize join."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, grouped_zscore,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    out = collect_tables(grouped_zscore(ds, "lang", "n_chars"))
    return pa.table({"doc_id": out["doc_id"], "z": out["z"]})


def _q_hash_split(sf_dir: str) -> pa.Table:
    """Deterministic 80/10/10 train/val/test split by mix32(doc_id);
    per (lang, split) counts.  Membership is append-stable, unlike a
    random split."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        hash_split,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    tagged = hash_split(ds, "doc_id", seed=17)

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "split": batch["split"],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    out = hash_aggregate(
        tagged.map_batches(ones, batch_format="pyarrow", batch_size=None),
        ["lang", "split"],
        [("one", "sum", "n")],
    )
    return pa.table(
        {"lang": out["lang"], "split": out["split"], "n": out["n"].cast(pa.int64())}
    )


def _q_intersect_users(sf_dir: str) -> pa.Table:
    """Set INTERSECT: users who both clicked and purchased -- two
    distinct passes, Arrow in-driver join of the (user-bounded) sets."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    clicked = distinct(
        ds.filter(expr="event_type == 'click'").select_columns(["user_id"]),
        ["user_id"],
    )
    bought = distinct(
        ds.filter(expr="event_type == 'purchase'").select_columns(["user_id"]),
        ["user_id"],
    )
    both = clicked.join(bought, keys="user_id")
    return pa.table({"user_id": both["user_id"].cast(pa.int64())})


def _q_bigram_counts(sf_dir: str) -> pa.Table:
    """Global bigram LM counts, top 50: per-batch Arrow gram histogram
    (combiner) -> distributed groupby combine -> partial top-k.  The
    gram vocabulary never lands on the driver."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        top_k,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        ngram_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    counts = ngram_counts(ds, n=2)
    t = top_k(counts, "n", 50, tiebreak="gram")
    return pa.table({"gram": t["gram"], "n": t["n"].cast(pa.int64())})


def _q_dup_passages(sf_dir: str) -> pa.Table:
    """Duplicate-passage candidates: trigrams present in >= 2 distinct
    documents (corpus boilerplate signal), top 50 by doc count.  The
    distinct-doc counts come from per-batch distinct pairs (one row
    per doc => exact partials) through the distributed combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        top_k,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        shared_ngram_docs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    nd = shared_ngram_docs(ds, n=3)

    def at_least_two(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["nd"], 2))

    shared = nd.map_batches(
        at_least_two, batch_format="pyarrow", batch_size=None
    )
    t = top_k(shared, "nd", 50, tiebreak="gram")
    return pa.table({"gram": t["gram"], "nd": t["nd"].cast(pa.int64())})


def _q_new_users_daily(sf_dir: str) -> pa.Table:
    """Cohort growth: first-seen day per user (distributed MIN combine)
    -> new-users-per-day + running total over the bounded day table."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        first_seen_daily,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return first_seen_daily(ds, "user_id", "ts")


def _q_mode_source(sf_dir: str) -> pa.Table:
    """Per-language modal source (deterministic lexicographic
    tie-break) -- one combiner-pattern count, bounded argmax."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_mode,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "source"]
    )
    return grouped_mode(ds, "lang", "source")


def _q_pmi_bigrams(sf_dir: str) -> pa.Table:
    """Top-50 collocations by PMI (min bigram count 5): two streaming
    corpus aggregates (unigrams broadcast, bigrams distributed) + a
    per-batch scoring join -- see stages/textops.py::pmi_bigrams."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        top_k,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        pmi_bigrams,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    scored = pmi_bigrams(ds, min_count=5)
    t = top_k(scored, "pmi", 50, tiebreak="gram")
    return pa.table(
        {"gram": t["gram"], "n": t["n"], "pmi": t["pmi"]}
    )


def _q_except_docs(sf_dir: str) -> pa.Table:
    """Set EXCEPT: docs mentioning 'spark' but not 'vector' -- one scan
    computes BOTH substring predicates with vectorized Arrow
    ``match_substring`` (not two passes), then a left-anti join of the
    (match-bounded) id sets."""
    import pyarrow.compute as pc

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        has_a = pc.match_substring(batch["text"], "spark")
        has_b = pc.match_substring(batch["text"], "vector")
        t = pa.table(
            {"doc_id": batch["doc_id"], "has_a": has_a, "has_b": has_b}
        )
        return t.filter(pc.or_(has_a, has_b))  # non-matches never leave

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    t = collect_tables(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    )
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    a = ids[t["has_a"].to_numpy(zero_copy_only=False)]
    b = ids[t["has_b"].to_numpy(zero_copy_only=False)]
    keep = np.setdiff1d(a, b)  # sorted unique difference
    return pa.table({"doc_id": pa.array(keep, pa.int64())})


def _q_dow_histogram(sf_dir: str) -> pa.Table:
    """Events per ISO day-of-week (1=Mon..7=Sun): vectorized epoch-day
    arithmetic per batch, 7-row combiner aggregate."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def dow(batch: pa.Table) -> pa.Table:
        days = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .view("int64")
        )
        isodow = (days + 3) % 7 + 1  # 1970-01-01 was a Thursday (=4)
        return pa.table(
            {
                "isodow": pa.array(isodow),
                "_one": pa.array(np.ones(len(days), np.int64)),
            }
        )

    out = hash_aggregate(
        ds.map_batches(dow, batch_format="pyarrow", batch_size=None),
        ["isodow"],
        [("_one", "sum", "n")],
    )
    return pa.table(
        {"isodow": out["isodow"], "n": out["n"].cast(pa.int64())}
    )


def _q_lang_share(sf_dir: str) -> pa.Table:
    """Ratio-to-report: per-language share of the corpus (grouped count
    over a bounded key set + driver-side normalization)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )
    out = hash_aggregate(
        ds.map_batches(
            lambda b: b.append_column(
                "_one", pa.array(np.ones(b.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["lang"],
        [("_one", "sum", "n")],
    )
    n = out["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "lang": out["lang"],
            "n": out["n"].cast(pa.int64()),
            "share": round_like_sql(n / n.sum(), 6),
        }
    )


def _q_lang_temperature_sample(sf_dir: str) -> pa.Table:
    """Temperature-balanced language resampling (XLM-R / mT5 corpus
    rebalance, alpha=0.3): per-language keep rate from the share
    flattened by the temperature exponent, deterministic mix32-hash
    Bernoulli keep (stages/textops.py::lang_temperature_sample).
    Returns the per-language audit (n_before, n_after, kept-id
    checksum pinning the exact kept set)."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        lang_temperature_sample,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    return lang_temperature_sample(ds, alpha=0.3, seed=29)


def _q_track_simplify(sf_dir: str) -> pa.Table:
    """Per-user GPS-track Douglas-Peucker simplification: the ordered
    per-key spatial window (groupby shuffle co-locates each user's
    fixes, map_groups sorts and simplifies).  Oracled by the
    recursive-CTE DP mirror (_track_simplify_oracle_sql).  Thin
    collect over pipelines/tracks.py::track_simplify_ds.  Reference
    semantic kin: the polyline handling in clip.js/slope.js (SURVEY
    S8/J6)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
        track_simplify_ds,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    return collect_tables(track_simplify_ds(ds, tol=0.02)).select(
        ["user_id", "n_raw", "n_kept", "simplified_len"]
    )


def _q_pii_redact(sf_dir: str) -> pa.Table:
    """PII scrubbing with a REAL oracle: a contact string is
    constructed as a pure function of table columns on BOTH sides
    (engine and SQL), then emails and digit-runs are redacted --
    Arrow RE2 kernels vs DuckDB RE2, bit-identical replacements."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        pii_redact,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars", "text"],
    )

    def build_and_redact(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        raw = pc.binary_join_element_wise(
            "contact user",
            batch["doc_id"].cast(pa.string()),
            "@",
            batch["source"],
            ".com or +91",
            batch["n_chars"].cast(pa.string()),
            " ",
            pc.utf8_slice_codeunits(batch["text"], 0, 40),
            "",
        )
        t = pa.table({"doc_id": batch["doc_id"], "raw": raw})
        out = pii_redact(t, text_col="raw")
        return out.select(["doc_id", "n_email", "n_number", "redacted"])

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    return collect_tables(
        ds.map_batches(
            build_and_redact, batch_format="pyarrow", batch_size=None
        )
    )


def _q_s2_cells(sf_dir: str) -> pa.Table:
    """TRUE spherical S2 cell assignment (functions/s2.py: face +
    quadratic ST + Hilbert walk) at level 9 over geocoded events --
    the geodesic alternative to the frozen flat grid.  Not
    SQL-expressible (Hilbert curve); pinned-golden checked."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.functions.s2 import (
        s2_cell_of,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        return pa.table({"s2_9": pa.array(s2_cell_of(lon, lat, 9))})

    return partial_count(
        ds.map_batches(geocode, batch_format="pyarrow", batch_size=None),
        ["s2_9"],
    ).rename_columns(["s2_9", "n"])


def _q_geohash_cells(sf_dir: str) -> pa.Table:
    """Standard base32 geohash (Niemeyer) cell counts at precision 6
    over the geocoded events lattice -- the string cell scheme
    alongside the flat grid / Z-order / S2 ids
    (functions/cells.py::geohash_of, bisection-verified)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        geohash_of,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def geocode(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (eid % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((eid // 96) % 96).astype(np.float64) * 0.01
        return pa.table({"geohash6": pa.array(geohash_of(lon, lat, 6))})

    return partial_count(
        ds.map_batches(geocode, batch_format="pyarrow", batch_size=None),
        ["geohash6"],
    ).rename_columns(["geohash6", "n"])


def _q_docs_pip(sf_dir: str) -> pa.Table:
    """PIP join of geocoded documents rows against the oracle polygons."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import PIPJoiner
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def geocode(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lon = 77.0 + (did % 96).astype(np.float64) * 0.01
        lat = 28.05 + ((did // 96) % 96).astype(np.float64) * 0.01
        return pa.table({"doc_id": batch["doc_id"], "lon": lon, "lat": lat})

    joined = ds.map_batches(geocode, batch_format="pyarrow", batch_size=None).map_batches(
        PIPJoiner(_og_polygons_table()), batch_format="pyarrow", batch_size=None
    )
    out = partial_count(joined, ["polygon_id"]).rename_columns(["polygon_id", "n"])
    return _complete_zero(out, list(OG_POLYGONS))


# ------------------------------ relational / text / dedup over sf tables ----
def _q_pricing_summary(sf_dir: str) -> pa.Table:
    """A1-analogue grouped aggregation over lineitem (TPC-H Q1 shape)."""
    import ray.data
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )

    def derive(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        return batch.append_column("disc_price", disc)

    out = hash_aggregate(
        ds.map_batches(derive, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_base_price"),
            ("disc_price", "sum", "sum_disc_price"),
            ("l_quantity", "count", "count_order"),
        ],
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import round_like_sql

    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": round_like_sql(out["sum_qty"], 2),
            "sum_base_price": round_like_sql(out["sum_base_price"], 2),
            "sum_disc_price": round_like_sql(out["sum_disc_price"], 2),
            "count_order": out["count_order"],
        }
    )


def _q_top_orders(sf_dir: str) -> pa.Table:
    """P5/P6: global top-k by price with key tiebreak."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import top_k

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    )
    return top_k(ds, "o_totalprice", 10, descending=True, tiebreak="o_orderkey")


def _q_events_by_type(sf_dir: str) -> pa.Table:
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return hash_aggregate(
        ds, ["event_type"],
        [("value", "count", "n"), ("value", "min", "min_value"),
         ("value", "max", "max_value")],
    )


def _q_orders_monthly(sf_dir: str) -> pa.Table:
    """Calendar-month bucketing (irregular window widths, unlike the
    fixed-second tumbling windows): order count + revenue per month.
    Month keys come from numpy datetime64[M] truncation inside
    map_batches; tier-2 combine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )

    def month_key(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        month = ts.astype("datetime64[M]").astype("datetime64[us]")
        return pa.table(
            {
                "month": pa.array(month, pa.timestamp("us")),
                "o_totalprice": batch["o_totalprice"],
            }
        )

    agg = hash_aggregate(
        ds.map_batches(month_key, batch_format="pyarrow", batch_size=None),
        ["month"],
        [("o_totalprice", "count", "n_orders"),
         ("o_totalprice", "sum", "revenue")],
    )
    return pa.table(
        {
            "month": agg["month"],
            "n_orders": agg["n_orders"],
            "revenue": round_like_sql(agg["revenue"], 2),
        }
    )


def _q_customer_nations(sf_dir: str) -> pa.Table:
    """J5-analogue broadcast dimension join: customers per nation name."""
    import pyarrow.parquet as pq
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, hash_aggregate,
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "n_name"])
    ds = _read_pq(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    joined = ds.map_batches(
        BroadcastLookup(nation, on="c_nationkey", take_cols=["n_name"]),
        batch_format="pyarrow", batch_size=None,
    )
    return hash_aggregate(joined, ["n_name"], [("c_custkey", "count", "n_customers")])


def _q_customer_regions(sf_dir: str) -> pa.Table:
    """3-way broadcast join chain (customer -> nation -> region):
    dimension tables pre-joined driver-side (tiny), one broadcast
    lookup on the fact stream -- the star-schema shape."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        BroadcastLookup, hash_aggregate,
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    # dim x dim join stays on the driver: |nation| = 25 rows
    idx = pc.index_in(
        nation["n_regionkey"],
        value_set=region["r_regionkey"].combine_chunks(),
    )
    dim = pa.table(
        {
            "c_nationkey": nation["n_nationkey"],
            "r_name": region["r_name"].take(idx),
        }
    )
    ds = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    joined = ds.map_batches(
        BroadcastLookup(dim, on="c_nationkey", take_cols=["r_name"]),
        batch_format="pyarrow", batch_size=None,
    )
    return hash_aggregate(
        joined, ["r_name"], [("c_custkey", "count", "n_customers")]
    )


def _q_customers_no_orders(sf_dir: str) -> pa.Table:
    """Anti-join (TPC-H Q22 shape): customers with NO high-value order
    (o_totalprice > 300000), counted per nation.  The distinct
    order-customer key set is built by the tier-2 combiner and
    broadcast into the filter -- at a key count beyond driver capacity
    this routes through shuffled_dedup_first instead
    (stages/shuffle.py)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 300000.0)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow", batch_size=None,
    )
    have = partial_count(orders, ["o_custkey"])["o_custkey"].combine_chunks()

    cust = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )

    def anti(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch["c_custkey"], value_set=have))
        return batch.filter(keep)

    return hash_aggregate(
        cust.map_batches(anti, batch_format="pyarrow", batch_size=None),
        ["c_nationkey"], [("c_custkey", "count", "n_customers")],
    )


def _q_distinct_langs(sf_dir: str) -> pa.Table:
    """A8: distinct + counts."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        partial_count,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )
    return partial_count(ds, ["lang"]).rename_columns(["lang", "n"])


def _q_dedup_exact(sf_dir: str) -> pa.Table:
    """Exact dedup representatives: min doc_id per distinct text."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        exact_dedup_representatives,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    reps = exact_dedup_representatives(ds, "text", "doc_id")
    return reps.select(["doc_id"])


def _q_token_counts(sf_dir: str) -> pa.Table:
    """Token counting (whitespace) per doc."""
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
        ds.map_batches(TextAnnotate(features=("tokens",)), batch_format="pyarrow", batch_size=None)
    )
    return out.select(["doc_id", "n_tokens_ws"])


def _q_pack_sequences(sf_dir: str) -> pa.Table:
    """Sequence packing: greedy fill of 2048-token bins per lang in
    doc_id order (stages/textops.py::pack_sequences) -- the batch-
    packing op a training pipeline runs before writing example
    shards.  Oracle: DuckDB recursive CTE replaying the same greedy
    scan."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        pack_sequences,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    out = collect_tables(pack_sequences(ds, budget=2048))
    return out.select(["doc_id", "lang", "n_tok", "bin_id"])


def _q_cube_pricing(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(returnflag, linestatus): all four grouping sets
    from ONE scan (algebraic partials re-aggregate)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        cube_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def to_int(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(q.astype(np.int64)),
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    prepared = ds.map_batches(to_int, batch_format="pyarrow", batch_size=None)
    out = cube_aggregate(
        prepared,
        ["l_returnflag", "l_linestatus"],
        [("qty", "sum", "sum_qty"), ("_one", "sum", "n")],
    )
    return out.select(["l_returnflag", "l_linestatus", "sum_qty", "n"])


def _q_rolling_hour_sum(sf_dir: str) -> pa.Table:
    """Trailing 1-hour VALUE-range window sum per user (RANGE frame,
    peers included) -- exact int cents, searchsorted kernel."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        rolling_interval_sum,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    out = collect_tables(rolling_interval_sum(ds))
    return out.select(["user_id", "event_id", "roll_cents"])


def _q_postings(sf_dir: str) -> pa.Table:
    """Inverted-index construction: per token, document frequency and
    the ordered posting list (comma-joined doc ids).  Distinct
    (token, doc) pairs -> one groupby(token) shuffle -> sort+join
    kernel; posting-list state is one token's docs."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def pairs(batch: pa.Table) -> pa.Table:
        return (
            _explode_tokens(batch, "text", "doc_id")
            .group_by(["doc_id", "token"])
            .aggregate([])
        )

    def kernel(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        joined = ",".join(str(v) for v in d)
        return pa.table(
            {
                "token": group["token"].slice(0, 1),
                "df": pa.array([len(d)], pa.int64()),
                "postings": pa.array([joined], pa.string()),
            }
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
    out = collect_tables(
        _grouped_by_key(pair_ds, "token", kernel)
    )
    return out.select(["token", "df", "postings"])


def _q_haversine_radius(sf_dir: str) -> pa.Table:
    """Great-circle distance-band join: all valid grid points within
    3 km of each probe, exact haversine after a conservative degree-
    space candidate pass."""
    import ray.data
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        RadiusJoin,
    )

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
            RadiusJoin(ref, radius=3.0, payload_cols=("pix",),
                       metric="haversine"),
            batch_format="pyarrow", batch_size=None,
        )
    )
    return pa.table(
        {
            "probe_id": out["probe_id"],
            "pix": out["nn_pix"],
            "dist_km": round_like_sql(out["dist"], 6),
        }
    )


def _q_polygon_centroid(sf_dir: str) -> pa.Table:
    """Shoelace area + centroid per fixture polygon with QUANTIZED
    int64 edge-term accumulation (order-independent, SQL-exact)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
        ring_centroid_quantized,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    pids, areas, cxs, cys = [], [], [], []
    for pid, poly in OG_POLYGONS.items():
        a2, cx6, cy6 = ring_centroid_quantized(poly)
        pids.append(pid)
        areas.append(float(a2) / (2.0 * 1e6))
        cxs.append(float(cx6) / (3.0 * a2))
        cys.append(float(cy6) / (3.0 * a2))
    return pa.table(
        {
            "polygon_id": pa.array(pids),
            "area": round_like_sql(pa.array(areas), 6),
            "cx": round_like_sql(pa.array(cxs), 6),
            "cy": round_like_sql(pa.array(cys), 6),
        }
    )


def _q_contamination(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: per non-benchmark doc, the count of
    distinct 5-grams shared with the broadcast benchmark slice
    (doc_id % 97 == 0 plays the eval suite).  Build-set pass +
    actor-pool scan; oracle recomputes via list-comprehension n-grams
    and a join."""
    import ray
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        ContaminationTag, benchmark_ngram_set,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def is_bench(col):
        return pa.array(col.to_numpy(zero_copy_only=False) % 97 == 0)

    def not_bench(col):
        return pa.array(col.to_numpy(zero_copy_only=False) % 97 != 0)

    bench = benchmark_ngram_set(ds, n=5, pred=is_bench)
    ref = ray.put(bench)
    out = collect_tables(
        ds.map_batches(
            ContaminationTag,
            fn_constructor_kwargs={
                "bench_ref": ref, "n": 5, "exclude_pred": not_bench,
            },
            concurrency=2,
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    return out.select(["doc_id", "n_contam"])


def _q_label_centroids(sf_dir: str) -> pa.Table:
    """Per-class mean embedding over the corpus: quantized int64
    component sums combine exactly; (label x dim)-bounded output."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        label_centroids,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label", "embedding"],
    )
    out = label_centroids(ds)
    return pa.table(
        {
            "label": out["label"].cast(pa.int64()),
            "dim": out["dim"],
            "mean_v": round_like_sql(out["mean_v"], 6),
        }
    )


def _q_corr_matrix(sf_dir: str) -> pa.Table:
    """Pairwise Pearson matrix over (qty, dollars, discount-bp,
    tax-bp) from one pass of exact int64 moments."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        corr_matrix,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def quantize(batch: pa.Table) -> pa.Table:
        def ints(col, mult):
            return pa.array(scaled_int(batch[col], mult))

        return pa.table(
            {
                "qty": ints("l_quantity", 1.0),
                "dollars": ints("l_extendedprice", 1.0),
                "disc_bp": ints("l_discount", 10000.0),
                "tax_bp": ints("l_tax", 10000.0),
            }
        )

    prepared = ds.map_batches(quantize, batch_format="pyarrow", batch_size=None)
    return corr_matrix(prepared, ["qty", "dollars", "disc_bp", "tax_bp"])


def _q_locf_resample(sf_dir: str) -> pa.Table:
    """Daily-grid resample with last-observation-carried-forward per
    user (gap filling), exact int cents; ASOF-join SQL oracle."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
        locf_resample,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    out = collect_tables(locf_resample(ds))
    return out.select(["user_id", "day", "cents"])


def _q_edit1_pairs(sf_dir: str) -> pa.Table:
    """Fuzzy vocabulary join: all distinct corpus-token pairs at edit
    distance exactly 1, via deletion-neighborhood blocking + exact
    per-bucket verify."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    return edit1_vocab_pairs(ds, min_len=4)


def _q_retention_matrix(sf_dir: str) -> pa.Table:
    """Cohort retention: distinct users active k days after their
    first-seen day, per cohort day."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        cohort_retention,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return cohort_retention(ds, "user_id", "ts")


def _q_decayed_counts(sf_dir: str) -> pa.Table:
    """Exponentially time-decayed event counts per type (half-life
    1 day, horizon 40): weights carried as int64 powers of two so the
    distributed sum is exact and partitioning-invariant."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        decayed_counts,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )
    return decayed_counts(
        ds, "event_type", "ts", ref_day="2024-02-01", half_life_days=1,
        horizon=40,
    )


def _q_pareto_front(sf_dir: str) -> pa.Table:
    """Skyline query over lineitem: (quantity, price) pairs not
    dominated by any other (higher-or-equal quantity at lower-or-equal
    price).  Local frontier per block -> tiny union -> final scan."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        pareto_frontier,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice"],
    )
    out = pareto_frontier(ds, "l_quantity", "l_extendedprice")
    return out.rename_columns(["qty", "price"])


def _q_grouped_mad(sf_dir: str) -> pa.Table:
    """Per-returnflag median absolute deviation of quantity (robust
    dispersion, DuckDB mad semantics)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
        grouped_mad,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity"],
    )
    out = collect_tables(grouped_mad(ds, "l_returnflag", "l_quantity"))
    return out.select(["l_returnflag", "mad"])


def _q_grouped_regression(sf_dir: str) -> pa.Table:
    """Per-returnflag least-squares fit of price (cents->dollars ints)
    on quantity: exact int64 moment combine, closed-form slope and
    intercept (regr_slope/regr_intercept semantics)."""
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_regression, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def quantize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "qty": pc.cast(
                    round_like_sql(batch["l_quantity"], 0), pa.int64()
                ),
                "dollars": pc.cast(
                    round_like_sql(batch["l_extendedprice"], 0), pa.int64()
                ),
            }
        )

    q = ds.map_batches(quantize, batch_format="pyarrow", batch_size=None)
    return grouped_regression(q, "l_returnflag", "qty", "dollars")


def _q_lang_entropy(sf_dir: str) -> pa.Table:
    """Shannon entropy (nats) of the source mix within each language --
    a corpus-diversity signal for training-data curation."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_entropy,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "source"]
    )
    return grouped_entropy(ds, "lang", "source")


def _q_geomean_price(sf_dir: str) -> pa.Table:
    """Per-brand geometric mean of retail price: fixed-point log-sum
    combine (exact at any partitioning), exp once per group."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        grouped_geomean,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "part.parquet"), columns=["p_brand", "p_retailprice"]
    )
    return grouped_geomean(ds, "p_brand", "p_retailprice")


def _q_user_streaks(sf_dir: str) -> pa.Table:
    """Gaps-and-islands: longest run of consecutive active days per
    user (distinct-day shrink -> per-user vectorized run-length)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, longest_streaks,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    out = collect_tables(longest_streaks(ds, "user_id", "ts"))
    return out.select(["user_id", "max_streak"])


def _q_scd2_intervals(sf_dir: str) -> pa.Table:
    """SCD2 history build: compress each user's ordered event-type
    stream into change intervals (consecutive equal values merge;
    valid_from = first ts of the run, valid_to = next run's start,
    NULL for the open current row) -- the classic CDC/warehouse
    history shape, one groupby shuffle + vectorized run-length."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def runs(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        et = np.asarray(g["event_type"].to_pylist())
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = np.flatnonzero(
            np.concatenate(([True], et[1:] != et[:-1]))
        )
        valid_from = ts[start]
        valid_to = np.append(valid_from[1:], -1)  # -1 = open row
        return pa.table(
            {
                "user_id": pa.array(
                    [g["user_id"][0].as_py()] * len(start), pa.int64()
                ),
                "event_type": pa.array(et[start]),
                "valid_from": pa.array(valid_from).cast(pa.timestamp("us")),
                "valid_to": pa.array(
                    [None if v < 0 else v for v in valid_to], pa.int64()
                ).cast(pa.timestamp("us")),
            }
        )

    t = collect_tables(
        _grouped_by_key(ds, "user_id", runs)
    )
    return t.sort_by(
        [("user_id", "ascending"), ("valid_from", "ascending")]
    )


def _q_lorenz_deciles(sf_dir: str) -> pa.Table:
    """Lorenz curve: cumulative revenue share by customer decile
    (NTILE(10) ordered by revenue, custkey tiebreak) -- the Gini's
    graphical companion.  Per-customer totals via the combiner
    (customer-bounded; the big tier is the rank machinery of
    grouped_gini), decile assignment mirrors SQL NTILE exactly."""
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
            }
        )

    per_cust = hash_aggregate(
        ds.map_batches(cents, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        [("cents", "sum", "rev")],
    ).sort_by([("rev", "ascending"), ("o_custkey", "ascending")])
    rev = per_cust["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(rev)
    # NTILE(10): the first n % 10 tiles get ceil(n/10) rows
    base, extra = divmod(n, 10)
    sizes = np.array([base + (1 if i < extra else 0) for i in range(10)])
    bounds = np.cumsum(sizes)
    tot = float(rev.sum())
    cum = np.cumsum(rev).astype(np.float64)
    share = cum[bounds - 1] / tot
    return pa.table(
        {
            "decile": pa.array(np.arange(1, 11, dtype=np.int64)),
            "cum_share": round_like_sql(share, 6),
        }
    )


def _q_first_touch_attribution(sf_dir: str) -> pa.Table:
    """Marketing attribution: per (user, day) session, the FIRST event
    type of the day vs whether a purchase happened that day --
    conversion rate per first-touch channel.  One groupby shuffle on
    the session key, vocabulary-bounded output."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "day": pa.array(ts // 86_400_000_000),
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
            }
        )

    def session(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        et = group["event_type"].take(order).to_pylist()
        return pa.table(
            {
                "first_touch": pa.array([et[0]], pa.string()),
                "_conv": pa.array(
                    [1 if "purchase" in et else 0], pa.int64()
                ),
                "_one": pa.array([1], pa.int64()),
            }
        )

    sessions = _grouped_by_key(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        ["user_id", "day"], session,
    )
    out = hash_aggregate(
        sessions, ["first_touch"],
        [("_conv", "sum", "n_converted"), ("_one", "sum", "n_sessions")],
    ).sort_by("first_touch")
    conv = out["n_converted"].to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    tot = out["n_sessions"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "first_touch": out["first_touch"],
            "n_sessions": out["n_sessions"].cast(pa.int64()),
            "conv_rate": round_like_sql(conv / tot, 6),
        }
    )


def _q_mutual_information(sf_dir: str) -> pa.Table:
    """Mutual information (nats) between event type and ISO weekday:
    the information-theoretic dependence measure over the same
    distributed contingency counts as chi2/Cramer's V.  Only observed
    cells contribute (0 log 0 = 0)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
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
    ).sort_by([("a", "ascending"), ("b", "ascending")])
    a = counts["a"].to_pylist()
    b = counts["b"].to_pylist()
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    tot = n.sum()
    na: dict = {}
    nb: dict = {}
    for av, bv, nv in zip(a, b, n):
        na[av] = na.get(av, 0.0) + nv
        nb[bv] = nb.get(bv, 0.0) + nv
    mi = 0.0
    for av, bv, nv in zip(a, b, n):
        p = nv / tot
        mi += p * np.log(p / ((na[av] / tot) * (nb[bv] / tot)))
    return pa.table({"mi_nats": round_like_sql(np.asarray([mi]), 6)})


def _q_tukey_outliers(sf_dir: str) -> pa.Table:
    """Per-returnflag Tukey fences (Q1/Q3 +- 1.5 IQR on exact
    quantiles) and the count of rows outside them -- the standard
    robust outlier screen, two passes (quantile selection, fence
    count)."""
    import ray as _ray
    import pyarrow.compute as pc
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate, round_like_sql,
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

    cds = ds.map_batches(cents, batch_format="pyarrow", batch_size=None)
    q = collect_tables(
        grouped_exact_quantiles(cds, "l_returnflag", "cents", [0.25, 0.75])
    )
    q1, q3 = {}, {}
    for g, qq, v in zip(
        q["l_returnflag"].to_pylist(), q["q"].to_pylist(),
        q["value"].to_pylist(),
    ):
        (q1 if qq == 0.25 else q3)[g] = float(v)
    fences = {
        g: (q1[g] - 1.5 * (q3[g] - q1[g]), q3[g] + 1.5 * (q3[g] - q1[g]))
        for g in q1
    }
    ref = _ray.put(fences)

    def mark(batch: pa.Table) -> pa.Table:
        f = _ray.get(ref)
        g = batch["l_returnflag"].to_pylist()
        v = batch["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.array([f[x][0] for x in g])
        hi = np.array([f[x][1] for x in g])
        out = ((v < lo) | (v > hi)).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "_out": pa.array(out),
                "_one": pa.array(np.ones(len(out), np.int64)),
            }
        )

    agg = hash_aggregate(
        cds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        ["l_returnflag"],
        [("_out", "sum", "n_outliers"), ("_one", "sum", "n")],
    ).sort_by("l_returnflag")
    gs = agg["l_returnflag"].to_pylist()
    return pa.table(
        {
            "l_returnflag": agg["l_returnflag"],
            "fence_lo": round_like_sql(
                np.array([fences[g][0] for g in gs]) / 100.0, 6
            ),
            "fence_hi": round_like_sql(
                np.array([fences[g][1] for g in gs]) / 100.0, 6
            ),
            "n_outliers": agg["n_outliers"].cast(pa.int64()),
            "n": agg["n"].cast(pa.int64()),
        }
    )


def _q_benford_deviation(sf_dir: str) -> pa.Table:
    """Benford's-law screen: first-digit distribution of order values
    vs log10(1 + 1/d), per-digit observed share and absolute
    deviation -- the classic fraud/data-quality signal, one combiner
    pass."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
    )

    def digit(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        d = np.floor(v / np.power(10.0, np.floor(np.log10(v)))).astype(
            np.int64
        )
        return pa.table(
            {
                "digit": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    out = hash_aggregate(
        ds.map_batches(digit, batch_format="pyarrow", batch_size=None),
        ["digit"],
        [("_one", "sum", "n")],
    ).sort_by("digit")
    n = out["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    tot = n.sum()
    d = out["digit"].to_numpy(zero_copy_only=False).astype(np.float64)
    share = n / tot
    benford = np.log10(1.0 + 1.0 / d)
    return pa.table(
        {
            "digit": out["digit"].cast(pa.int64()),
            "share": round_like_sql(share, 6),
            "abs_dev": round_like_sql(np.abs(share - benford), 6),
        }
    )


def _q_hhi_concentration(sf_dir: str) -> pa.Table:
    """Herfindahl-Hirschman concentration of sources within each
    language: HHI = sum(share^2) over the (lang, source)-bounded count
    table -- the market-concentration companion of lang_entropy."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "source"]
    )

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(ones, batch_format="pyarrow", batch_size=None),
        ["lang", "source"],
        [("_one", "sum", "n")],
    ).sort_by([("lang", "ascending"), ("source", "ascending")])
    langs = counts["lang"].to_pylist()
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    out_l, out_h = [], []
    i = 0
    while i < len(langs):
        j = i
        while j < len(langs) and langs[j] == langs[i]:
            j += 1
        tot = n[i:j].sum()
        out_l.append(langs[i])
        out_h.append(float(((n[i:j] / tot) ** 2).sum()))
        i = j
    return pa.table(
        {
            "lang": pa.array(out_l),
            "hhi": round_like_sql(np.asarray(out_h), 6),
        }
    )
