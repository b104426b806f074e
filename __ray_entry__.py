"""Driver contract for the Ray-Data spatial engine.

``queries()`` exposes one callable per implemented operator family
(SURVEY.md par.2), each taking ``sf_dir`` and returning an Arrow table /
pandas DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent SQL over
the same parquet views for every SQL-expressible query.

Spatial queries run over a FROZEN deterministic synthetic raster (the
"oracle grid") whose values are integer-derived, so the DuckDB oracle
reproduces the engine's float32->float64 arithmetic bit-exactly from
``range()`` -- no external data, any scale factor.  Web-page and media
pipelines (non-SQL-expressible) are exercised by ``entry()`` and the
pytest suite instead.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
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


def _q_pages_flagship(sf_dir: str) -> pa.Table:
    """The graft flagship over the synthetic pages corpus (extract ->
    geocode -> cell -> count), scaled by sf when recognisable."""
    import tempfile

    import pyarrow.parquet as pq
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
        pages_flagship,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
        gen_pages, gen_polygons,
    )

    n = 2000
    d = tempfile.mkdtemp(prefix="graft_pages_")
    p = os.path.join(d, "pages.parquet")
    pq.write_table(gen_pages(n), p)
    out = pages_flagship(p, polygons=gen_polygons(), res=8)
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


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: pages extract -> geocode ->
    frozen-cell encode -> per-cell counts (plus invariant check inside
    the extract stage).  Returns a stable (cell_8:int64, count:int64)
    Arrow table."""
    return _q_pages_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # spatial operators over the frozen oracle grid
        "extract_full": _q_extract_full,
        "extract_valid": _q_extract_valid,
        "stride_sample": _q_stride_sample,
        "bounds": _q_bounds,
        "band_stats": _q_band_stats,
        "cell_counts": _q_cell_counts,
        "cell_counts_salted": _q_cell_counts_salted,
        "bbox_join": _q_bbox_join,
        "pip_join": _q_pip_join,
        "pip_join_sharded": _q_pip_join_sharded,
        "zonal_stats": _q_zonal_stats,
        "knn_lookup": _q_knn,
        "knn_top3": _q_knn_top3,
        "knn_balltree": _q_knn_balltree,
        "knn_outside": _q_knn_outside,
        "within_radius": _q_within_radius,
        "downsample_raster": _q_downsample_raster,
        "idw_probes": _q_idw_probes,
        "focal_counts": _q_focal_counts,
        "tile_slope": _q_tile_slope,
        "tile_ruggedness": _q_tile_ruggedness,
        "tile_tpi": _q_tile_tpi,
        "tile_curvature": _q_tile_curvature,
        "region_labels": _q_region_labels,
        "tile_hillshade": _q_tile_hillshade,
        "flow_direction": _q_flow_direction,
        "flow_accumulation": _q_flow_accumulation,
        "watershed_labels": _q_watershed_labels,
        "bilinear_sample": _q_bilinear_sample,
        "stride_secondary": _q_stride_secondary,
        # spatial ops driven from the driver's tables
        "events_geocode_cells": _q_events_geocode,
        "s2_cells": _q_s2_cells,
        "geohash_cells": _q_geohash_cells,
        "track_lengths": _q_track_lengths,
        "geofence_transitions": _q_geofence_transitions,
        "keyed_ewma": _q_keyed_ewma,
        "tile_focal_mode": _q_tile_focal_mode,
        "track_speed_stats": _q_track_speed_stats,
        "media_ahash_pairs": _q_media_ahash_pairs,
        "polygon_coverage": _q_polygon_coverage,
        "boundary_distance": _q_boundary_distance,
        "linear_interp": _q_linear_interp,
        "track_straightness": _q_track_straightness,
        "track_geodesic": _q_track_geodesic,
        "od_matrix": _q_od_matrix,
        "band_math_ndi": _q_band_math_ndi,
        "cost_distance": _q_cost_distance,
        "skew_report": _q_skew_report,
        "radius_of_gyration": _q_radius_of_gyration,
        "theil_sen": _q_theil_sen,
        "ab_ztest": _q_ab_ztest,
        "anova_eta2": _q_anova_eta2,
        "spearman": _q_spearman,
        "adaptive_quadtree": _q_adaptive_quadtree,
        "cover_bbox": _q_cover_bbox,
        "value_histogram": _q_value_histogram,
        "abc_classes": _q_abc_classes,
        "mutual_nn": _q_mutual_nn,
        "peak_concurrency": _q_peak_concurrency,
        "grid_variogram": _q_grid_variogram,
        "rfm_segments": _q_rfm_segments,
        "acf_lags": _q_acf_lags,
        "zorder_cells": _q_zorder_cells,
        "map_match": _q_map_match,
        "seasonal_mase": _q_seasonal_mase,
        "kl_divergence": _q_kl_divergence,
        "ripley_k": _q_ripley_k,
        "gearys_c": _q_gearys_c,
        "hist_intersection": _q_hist_intersection,
        "holt_linear": _q_holt_linear,
        "holt_winters": _q_holt_winters,
        "phrase_search": _q_phrase_search,
        "kendall_tau": _q_kendall_tau,
        "theil_index": _q_theil_index,
        "track_intersections": _q_track_intersections,
        "runs_test": _q_runs_test,
        "wilcoxon_signed": _q_wilcoxon_signed,
        "clustering_coeff": _q_clustering_coeff,
        "kcore_words": _q_kcore_words,
        "brier_decomposition": _q_brier_decomposition,
        "seasonal_decompose": _q_seasonal_decompose,
        "min_cost_supplier": _q_min_cost_supplier,
        "chow_test": _q_chow_test,
        "symspell_pairs": _q_symspell_pairs,
        "seq_edit_distance": _q_seq_edit_distance,
        "did_estimator": _q_did_estimator,
        "mean_direction": _q_mean_direction,
        "hoover_index": _q_hoover_index,
        "cdc_chunks": _q_cdc_chunks,
        "route_shortest_path": _q_route_shortest_path,
        "polygon_perimeter": _q_polygon_perimeter,
        "quadkey_cells": _q_quadkey_cells,
        "q3_shipping_priority": _q_q3_shipping_priority,
        "q5_local_revenue": _q_q5_local_revenue,
        "dispersion_index": _q_dispersion_index,
        "grubbs_test": _q_grubbs_test,
        "burrows_delta": _q_burrows_delta,
        "pps_systematic": _q_pps_systematic,
        "haar_energy": _q_haar_energy,
        "cell_week_churn": _q_cell_week_churn,
        "bayes_rate_smoothing": _q_bayes_rate_smoothing,
        "jaro_winkler_pairs": _q_jaro_winkler_pairs,
        "sprt_crossing": _q_sprt_crossing,
        "rbo_overlap": _q_rbo_overlap,
        "geometric_median": _q_geometric_median,
        "visibility_graph": _q_visibility_graph,
        "hill_estimator": _q_hill_estimator,
        "q17_small_qty_revenue": _q_q17_small_qty_revenue,
        "q19_disjunctive_revenue": _q_q19_disjunctive_revenue,
        "graph_modularity": _q_graph_modularity,
        "feature_matrix": _q_feature_matrix,
        "ljung_box": _q_ljung_box,
        "bigram_novelty": _q_bigram_novelty,
        "vocab_richness": _q_vocab_richness,
        "ql_retrieval": _q_ql_retrieval,
        "dispersion_ellipse": _q_dispersion_ellipse,
        "local_moran": _q_local_moran,
        "quadrat_test": _q_quadrat_test,
        "clamped_balance": _q_clamped_balance,
        "harmonic_price": _q_harmonic_price,
        "char_entropy": _q_char_entropy,
        "rayleigh_hours": _q_rayleigh_hours,
        "mann_kendall": _q_mann_kendall,
        "welch_ttest": _q_welch_ttest,
        "periodogram_daily": _q_periodogram_daily,
        "nelson_aalen": _q_nelson_aalen,
        "bootstrap_ci": _q_bootstrap_ci,
        "viewshed_counts": _q_viewshed_counts,
        "hist_match_lut": _q_hist_match_lut,
        "home_work_od": _q_home_work_od,
        "grid_euler": _q_grid_euler,
        "variance_ratio": _q_variance_ratio,
        "variogram_anisotropy": _q_variogram_anisotropy,
        "k_anonymity": _q_k_anonymity,
        "minhash_estimate": _q_minhash_estimate,
        "l_diversity": _q_l_diversity,
        "band_correlation": _q_band_correlation,
        "field_divergence": _q_field_divergence,
        "lsh_blocking_audit": _q_lsh_blocking_audit,
        "join_counts": _q_join_counts,
        "fractal_boxcount": _q_fractal_boxcount,
        "jarque_bera": _q_jarque_bera,
        "cohens_d": _q_cohens_d,
        "durbin_watson": _q_durbin_watson,
        "clark_evans": _q_clark_evans,
        "nn_gfunction": _q_nn_gfunction,
        "gravity_flows": _q_gravity_flows,
        "levene_bf": _q_levene_bf,
        "twi": _q_twi,
        "heaps_law": _q_heaps_law,
        "hurst_exponent": _q_hurst_exponent,
        "terrain_openness": _q_terrain_openness,
        "linear_attribution": _q_linear_attribution,
        "vocab_overlap": _q_vocab_overlap,
        "keyness_terms": _q_keyness_terms,
        "voronoi_assign": _q_voronoi_assign,
        "kwic_contexts": _q_kwic_contexts,
        "ols_two_var": _q_ols_two_var,
        "simpson_diversity": _q_simpson_diversity,
        "dickey_fuller": _q_dickey_fuller,
        "simplified_silhouette": _q_simplified_silhouette,
        "emerging_hotspots": _q_emerging_hotspots,
        "degree_assortativity": _q_degree_assortativity,
        "word_burstiness": _q_word_burstiness,
        "dasymetric_alloc": _q_dasymetric_alloc,
        "location_quotient": _q_location_quotient,
        "rusle_ls": _q_rusle_ls,
        "rich_club": _q_rich_club,
        "promo_revenue_share": _q_promo_revenue_share,
        "ship_delay_histogram": _q_ship_delay_histogram,
        "raster_entropy": _q_raster_entropy,
        "markov_top1_accuracy": _q_markov_top1_accuracy,
        "intrinsic_dim": _q_intrinsic_dim,
        "binseg_changepoint": _q_binseg_changepoint,
        "qq_slope": _q_qq_slope,
        "polygon_iou": _q_polygon_iou,
        "raster_kappa": _q_raster_kappa,
        "mcnemar_test": _q_mcnemar_test,
        "calibration_bins": _q_calibration_bins,
        "roc_auc": _q_roc_auc,
        "average_precision": _q_average_precision,
        "lift_at_decile": _q_lift_at_decile,
        "lbp_histogram": _q_lbp_histogram,
        "glcm_texture": _q_glcm_texture,
        "markov_entropy_rate": _q_markov_entropy_rate,
        "t_closeness": _q_t_closeness,
        "word_degree_dist": _q_word_degree_dist,
        "mann_whitney": _q_mann_whitney,
        "kruskal_wallis": _q_kruskal_wallis,
        "line_of_sight": _q_line_of_sight,
        "aspect_classes": _q_aspect_classes,
        "kaplan_meier": _q_kaplan_meier,
        "interval_union": _q_interval_union,
        "zipf_slope": _q_zipf_slope,
        "hapax_ratio": _q_hapax_ratio,
        "dedup_summary": _q_dedup_summary,
        "bounce_rate": _q_bounce_rate,
        "burstiness": _q_burstiness,
        "readability": _q_readability,
        "visit_entropy": _q_visit_entropy,
        "hourly_profile": _q_hourly_profile,
        "track_hausdorff": _q_track_hausdorff,
        "debounce_events": _q_debounce_events,
        "cusum_alarms": _q_cusum_alarms,
        "movement_directions": _q_movement_directions,
        "window_funcs": _q_window_funcs,
        "pivot_events": _q_pivot_events,
        "rollup_pricing": _q_rollup_pricing,
        "quantile_buckets": _q_quantile_buckets,
        "weighted_sample": _q_weighted_sample,
        "heavy_hitters": _q_heavy_hitters,
        "props_extract": _q_props_extract,
        "funnel_steps": _q_funnel_steps,
        "string_agg_nations": _q_string_agg_nations,
        "grouped_corr": _q_grouped_corr,
        "ngram_repetition": _q_ngram_repetition,
        "cms_counts": _q_cms_counts,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "kmeans_clusters": _q_kmeans_clusters,
        "zscore_chars": _q_zscore_chars,
        "hash_split": _q_hash_split,
        "intersect_users": _q_intersect_users,
        "bigram_counts": _q_bigram_counts,
        "dup_passages": _q_dup_passages,
        "new_users_daily": _q_new_users_daily,
        "mode_source": _q_mode_source,
        "pii_redact": _q_pii_redact,
        "track_simplify": _q_track_simplify,
        "except_docs": _q_except_docs,
        "pmi_bigrams": _q_pmi_bigrams,
        "dow_histogram": _q_dow_histogram,
        "lang_share": _q_lang_share,
        "lang_temperature_sample": _q_lang_temperature_sample,
        "docs_pip_join": _q_docs_pip,
        # relational operators
        "pricing_summary": _q_pricing_summary,
        "top_orders": _q_top_orders,
        "events_by_type": _q_events_by_type,
        "events_windowed": _q_events_windowed,
        "events_hopping": _q_events_hopping,
        "events_sessions": _q_events_sessions,
        "customer_nations": _q_customer_nations,
        "customer_regions": _q_customer_regions,
        "orders_monthly": _q_orders_monthly,
        "customers_no_orders": _q_customers_no_orders,
        "supplier_by_nation": _q_supplier_by_nation,
        "parts_by_brand": _q_parts_by_brand,
        "docs_by_source": _q_docs_by_source,
        "distinct_langs": _q_distinct_langs,
        "reservoir_sample": _q_reservoir_sample,
        "asof_join": _q_asof_join,
        "asof_lag": _q_asof_lag,
        "asof_next": _q_asof_next,
        "window_join_clicks": _q_window_join_clicks,
        "range_join": _q_range_join,
        "range_join_partitioned": _q_range_join_partitioned,
        "bloom_semijoin": _q_bloom_semijoin,
        "token_frequencies": _q_token_frequencies,
        "grouped_quantiles": _q_grouped_quantiles,
        "big_join_revenue": _q_big_join_revenue,
        # forced hash-shuffle tier of the same join (driver-checkable
        # proof the scale path stays correct as the router evolves)
        "big_join_revenue_shuffle": (
            lambda sf_dir: _q_big_join_revenue(sf_dir, strategy="shuffle")
        ),
        "big_left_join": _q_big_left_join,
        "tfidf_scores": _q_tfidf_scores,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "quantiles": _q_quantiles,
        "quantiles_exact": _q_quantiles_exact,
        "stratified_sample": _q_stratified_sample,
        # text / dedup / ANN
        "dedup_exact": _q_dedup_exact,
        "token_counts": _q_token_counts,
        "pack_sequences": _q_pack_sequences,
        "contamination": _q_contamination,
        "cube_pricing": _q_cube_pricing,
        "rolling_hour_sum": _q_rolling_hour_sum,
        "postings": _q_postings,
        "haversine_radius": _q_haversine_radius,
        "polygon_centroid": _q_polygon_centroid,
        "edit1_pairs": _q_edit1_pairs,
        "label_centroids": _q_label_centroids,
        "corr_matrix": _q_corr_matrix,
        "locf_resample": _q_locf_resample,
        "retention_matrix": _q_retention_matrix,
        "decayed_counts": _q_decayed_counts,
        "pareto_front": _q_pareto_front,
        "grouped_mad": _q_grouped_mad,
        "grouped_regression": _q_grouped_regression,
        "lang_entropy": _q_lang_entropy,
        "geomean_price": _q_geomean_price,
        "user_streaks": _q_user_streaks,
        "unpivot_measures": _q_unpivot_measures,
        "lm_logprob": _q_lm_logprob,
        "full_outer_activity": _q_full_outer_activity,
        "morans_i": _q_morans_i,
        "grouping_sets": _q_grouping_sets,
        "markov_transitions": _q_markov_transitions,
        "quantiles_cont": _q_quantiles_cont,
        "chi2_independence": _q_chi2_independence,
        "getis_ord": _q_getis_ord,
        "assoc_rules": _q_assoc_rules,
        "pct_change_monthly": _q_pct_change_monthly,
        "gini_by_priority": _q_gini_by_priority,
        "bm25_search": _q_bm25_search,
        "orders_above_avg": _q_orders_above_avg,
        "latest_event_per_user": _q_latest_event_per_user,
        "word_components": _q_word_components,
        "word_pagerank": _q_word_pagerank,
        "word_bfs_hops": _q_word_bfs_hops,
        "colocation_pairs": _q_colocation_pairs,
        "convoy_pairs": _q_convoy_pairs,
        "hist_equalize": _q_hist_equalize,
        "zonal_mode": _q_zonal_mode,
        "contour_cases": _q_contour_cases,
        "contour_segments": _q_contour_segments,
        "rolling_week_users": _q_rolling_week_users,
        "pattern_match_users": _q_pattern_match_users,
        "kde_density": _q_kde_density,
        "profile_lineitem": _q_profile_lineitem,
        "label_scatter": _q_label_scatter,
        "centroid_confusion": _q_centroid_confusion,
        "ks_statistic": _q_ks_statistic,
        "cramers_v": _q_cramers_v,
        "tukey_outliers": _q_tukey_outliers,
        "mutual_information": _q_mutual_information,
        "lorenz_deciles": _q_lorenz_deciles,
        "scd2_intervals": _q_scd2_intervals,
        "first_touch_attribution": _q_first_touch_attribution,
        "benford_deviation": _q_benford_deviation,
        "hhi_concentration": _q_hhi_concentration,
        "lagged_crosscorr": _q_lagged_crosscorr,
        "rolling_anomaly": _q_rolling_anomaly,
        "winsorized_mean": _q_winsorized_mean,
        "word_triangles": _q_word_triangles,
        "conversion_lag": _q_conversion_lag,
        "interevent_median": _q_interevent_median,
        "time_weighted_avg": _q_time_weighted_avg,
        "percent_rank_qty": _q_percent_rank_qty,
        "doc_lengths": _q_doc_lengths,
        "ann_top3": _q_ann_top3,
        "knn_join": _q_knn_join,
        "fuzzy_match": _q_fuzzy_match,
        # non-SQL-expressible (rows-only checks)
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "embedding_neardup": _q_embedding_neardup,
        "lang_id": _q_lang_id,
        "quality_scores": _q_quality,
        "quality_filter_by_lang": _q_quality_filter_by_lang,
        "quality_features": _q_quality_features,
        "text_cleaning": _q_text_cleaning,
        "ivf_ann": _q_ivf_ann,
        "pq_ann": _q_pq_ann,
        "zonal_multiband": _q_zonal_multiband,
        "winnow_dedup": _q_winnow_dedup,
        "passage_dedup": _q_passage_dedup,
        "url_parse_fields": _q_url_parse_fields,
        "url_domain_stats": _q_url_domain_stats,
        "domain_cap_sample": _q_domain_cap_sample,
        "url_canonicalize": _q_url_canonicalize,
        "url_dedup": _q_url_dedup,
        "pages_flagship": _q_pages_flagship,
        "approx_distinct": _q_approx_distinct,
        "media_decode": _q_media_decode,
        "jaccard_pairs": _q_jaccard_pairs,
        "bpe_merges": _q_bpe_merges,
        "approx_distinct_by_type": _q_approx_distinct_by_type,
        "convex_hull": _q_convex_hull,
        "dbscan_clusters": _q_dbscan_clusters,
        "stay_points": _q_stay_points,
    }


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


def _boundary_distance_oracle_sql() -> str:
    """Mirror of _q_boundary_distance: per edge, the clamped
    projection t and squared offset with engine-identical float
    constants (dx, dy, denom precomputed in Python and inlined, so
    both sides multiply the same doubles); LEAST over edges, one
    SQRT, ROUND 6."""
    probes = [(i, p) for i, p in enumerate(OG_KNN_PROBES)]
    probes += [(100 + i, p) for i, p in enumerate(OG_KNN_OUTSIDE_PROBES)]
    values = ", ".join(
        f"(CAST({i} AS BIGINT), {p[0]!r}, {p[1]!r})" for i, p in probes
    )
    parts = []
    for pid, pts in sorted(OG_POLYGONS.items()):
        terms = []
        n = len(pts)
        for e in range(n):
            ax, ay = float(pts[e][0]), float(pts[e][1])
            bx, by = float(pts[(e + 1) % n][0]), float(pts[(e + 1) % n][1])
            dx, dy = bx - ax, by - ay
            denom = dx * dx + dy * dy
            t = (
                f"LEAST(GREATEST((((lon - {ax!r}) * {dx!r} "
                f"+ (lat - {ay!r}) * {dy!r}) / {denom!r}), 0.0), 1.0)"
            )
            terms.append(
                f"((lon - ({ax!r} + {t} * {dx!r})) "
                f"* (lon - ({ax!r} + {t} * {dx!r})) "
                f"+ (lat - ({ay!r} + {t} * {dy!r})) "
                f"* (lat - ({ay!r} + {t} * {dy!r})))"
            )
        parts.append(
            f"SELECT probe_id, '{pid}' AS polygon_id, "
            f"ROUND(SQRT(LEAST({', '.join(terms)})), 6) AS dist_boundary "
            f"FROM (SELECT * FROM (VALUES {values}) "
            f"AS t(probe_id, lon, lat))"
        )
    return " UNION ALL ".join(parts)


def _polygon_coverage_oracle_sql(res: int = 7, ss: int = 8) -> str:
    """Mirror of _q_polygon_coverage: per polygon, the identical
    subpoint lattice (cell index + (i+0.5)/ss offsets, exact cell
    size 360/2^(res+8)) and the identical strict half-plane test."""
    import numpy as np

    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        cell_size,
    )

    s = cell_size(res)
    parts = []
    for pid, pts in sorted(OG_POLYGONS.items()):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ix0 = int(np.floor((min(xs) + 180.0) / s))
        ix1 = int(np.floor((max(xs) + 180.0) / s))
        iy0 = int(np.floor((min(ys) + 90.0) / s))
        iy1 = int(np.floor((max(ys) + 90.0) / s))
        parts.append(
            f"SELECT '{pid}' AS polygon_id, "
            f"(CAST({res} AS BIGINT) << 56) | (iy << 28) | ix AS cell, "
            f"ROUND(CAST(cnt AS DOUBLE) / {float(ss * ss)!r}, 6) AS coverage "
            f"FROM (SELECT ix, iy, SUM(hit) AS cnt FROM ("
            f"SELECT x.range AS ix, y.range AS iy, "
            f"CASE WHEN {{hp}} THEN 1 ELSE 0 END AS hit FROM ("
            f"SELECT x.range, "
            f"-180.0 + (CAST(x.range AS DOUBLE) "
            f"+ (CAST(i.range AS DOUBLE) + 0.5) / {float(ss)!r}) * {s!r} AS lon "
            f"FROM range({ix0}, {ix1 + 1}) x, range(0, {ss}) i) x, ("
            f"SELECT y.range, "
            f"-90.0 + (CAST(y.range AS DOUBLE) "
            f"+ (CAST(j.range AS DOUBLE) + 0.5) / {float(ss)!r}) * {s!r} AS lat "
            f"FROM range({iy0}, {iy1 + 1}) y, range(0, {ss}) j) y"
            f") GROUP BY ix, iy) WHERE cnt > 0".format(hp=_halfplane_sql(pts))
        )
    return " UNION ALL ".join(parts)


def _geofence_oracle_sql() -> str:
    """Mirror of _q_geofence_transitions: per-polygon membership via
    the strict-interior half-plane test (equivalent to the engine's
    even-odd ray cast for these convex CCW fixtures off the lattice),
    LAG per user ordered by (ts, event_id), a row per flip."""
    geocode = (
        "SELECT user_id, ts, event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
        "FROM events"
    )
    in_cols = ", ".join(
        f"CASE WHEN {_halfplane_sql(poly)} THEN 1 ELSE 0 END AS in_{pid}"
        for pid, poly in OG_POLYGONS.items()
    )
    lag_cols = ", ".join(
        f"in_{pid}, LAG(in_{pid}) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id) AS p_{pid}"
        for pid in OG_POLYGONS
    )
    parts = [
        f"SELECT '{pid}' AS polygon_id, user_id, event_id, "
        f"CASE WHEN in_{pid} = 1 THEN 'enter' ELSE 'exit' END AS transition "
        f"FROM l WHERE p_{pid} IS NOT NULL AND in_{pid} <> p_{pid}"
        for pid in OG_POLYGONS
    ]
    return (
        f"WITH g AS ({geocode}), "
        f"m AS (SELECT user_id, ts, event_id, {in_cols} FROM g), "
        f"l AS (SELECT user_id, ts, event_id, {lag_cols} FROM m) "
        + " UNION ALL ".join(parts)
    )


def _stay_points_oracle_sql(eps: float = 0.3, min_dur: float = 3600.0) -> str:
    """Mirror of _q_stay_points (Li et al. 2008 kernel,
    functions/geometry.py::stay_points): the sequential anchor scan as
    a linear recursive CTE -- each step finds the first fix past eps of
    the anchor (squared-distance compare, identical float ops on both
    sides), emits a stay when the dwell reaches min_dur, and advances
    the anchor.  Users advance independently; recursion depth = longest
    track.  Verified bit-exact (incl. the rounded dwell sums) at
    sf0.01 and sf0.1."""
    eps2 = repr(eps * eps)
    return f"""
WITH RECURSIVE g AS (
  SELECT user_id, ts, event_id,
         77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon,
         28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat
  FROM events),
p AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
         lon, lat, epoch_us(ts) / 1000000.0 AS t FROM g),
ext AS (SELECT user_id, COUNT(*) AS n FROM p GROUP BY user_id),
rec(user_id, i, stays, dwell) AS (
  SELECT user_id, 0, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE) FROM ext
  UNION ALL
  SELECT s.user_id,
         CASE WHEN s.stay THEN s.jb ELSE s.i + 1 END,
         s.stays + CAST(s.stay AS BIGINT),
         s.dwell + CASE WHEN s.stay THEN s.tleave - s.tarr ELSE 0.0 END
  FROM (
    SELECT u.user_id, u.i, u.stays, u.dwell, u.jb, u.tarr, tl.t AS tleave,
           (tl.t - u.tarr >= {min_dur!r} AND u.jb - 1 > u.i) AS stay
    FROM (
      SELECT rec.user_id, rec.i, rec.stays, rec.dwell, pa.t AS tarr,
             COALESCE(MIN(q.i), ext.n) AS jb
      FROM rec
      JOIN ext ON ext.user_id = rec.user_id
      JOIN p pa ON pa.user_id = rec.user_id AND pa.i = rec.i
      LEFT JOIN p q ON q.user_id = rec.user_id AND q.i > rec.i
        AND (q.lon - pa.lon)*(q.lon - pa.lon)
            + (q.lat - pa.lat)*(q.lat - pa.lat) > {eps2}
      WHERE rec.i < ext.n
      GROUP BY rec.user_id, rec.i, rec.stays, rec.dwell, pa.t, ext.n
    ) u
    JOIN p tl ON tl.user_id = u.user_id AND tl.i = u.jb - 1
  ) s
)
SELECT r.user_id, r.stays AS n_stays, ROUND(r.dwell, 6) AS total_dwell_s
FROM rec r JOIN ext e ON e.user_id = r.user_id
WHERE r.i >= e.n
"""


def _track_simplify_oracle_sql(tol: float = 0.02) -> str:
    """Mirror of _q_track_simplify: Douglas-Peucker as a recursive CTE.

    DP's keep-set is independent of split-processing order, so the
    recursion is a segment work-list: each pending (a, b) finds its
    max-perpendicular-distance interior point (same |cross|/sqrt(seg2)
    formula as functions/geometry.py::simplify_dp, ROW_NUMBER tiebreak =
    np.argmax first-index) and splits while dmax > tol.  Kept vertices =
    all segment endpoints of the recursion's closure.

    DuckDB 1.0 quirk: inside a WITH RECURSIVE list, a plain ``UNION``
    between two SELECTs dedups per-branch only -- the kept CTE needs the
    explicit outer DISTINCT over UNION ALL."""
    return (
        "WITH RECURSIVE g AS ("
        "  SELECT user_id, ts, event_id,"
        "         77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon,"
        "         28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat"
        "  FROM events),"
        " p AS ("
        "  SELECT user_id,"
        "         ROW_NUMBER() OVER (PARTITION BY user_id"
        "                            ORDER BY ts, event_id) - 1 AS i,"
        "         lon, lat FROM g),"
        " ext AS (SELECT user_id, MAX(i) AS last, COUNT(*) AS n"
        "         FROM p GROUP BY user_id),"
        " seg(user_id, a, b) AS ("
        "  SELECT user_id, 0, last FROM ext"
        "  UNION ALL"
        "  SELECT v.user_id, v.na, v.nb FROM ("
        "    SELECT u.user_id, u.a, u.b, u.m, u.d,"
        "           ROW_NUMBER() OVER (PARTITION BY u.user_id, u.a, u.b"
        "                              ORDER BY u.d DESC, u.m ASC) AS rn"
        "    FROM ("
        "      SELECT seg.user_id, seg.a, seg.b, q.i AS m,"
        "             CASE WHEN (pb.lon - pa.lon)*(pb.lon - pa.lon)"
        "                       + (pb.lat - pa.lat)*(pb.lat - pa.lat) = 0.0"
        "                  THEN SQRT((q.lon - pa.lon)*(q.lon - pa.lon)"
        "                            + (q.lat - pa.lat)*(q.lat - pa.lat))"
        "                  ELSE ABS((q.lon - pa.lon)*(pb.lat - pa.lat)"
        "                           - (q.lat - pa.lat)*(pb.lon - pa.lon))"
        "                       / SQRT((pb.lon - pa.lon)*(pb.lon - pa.lon)"
        "                              + (pb.lat - pa.lat)*(pb.lat - pa.lat))"
        "             END AS d"
        "      FROM seg"
        "      JOIN p pa ON pa.user_id = seg.user_id AND pa.i = seg.a"
        "      JOIN p pb ON pb.user_id = seg.user_id AND pb.i = seg.b"
        "      JOIN p q  ON q.user_id = seg.user_id"
        "                AND q.i > seg.a AND q.i < seg.b"
        "    ) u"
        "  ) t, LATERAL (VALUES (t.user_id, t.a, t.m),"
        "                       (t.user_id, t.m, t.b)) v(user_id, na, nb)"
        f"  WHERE t.rn = 1 AND t.d > {tol!r}"
        " ),"
        " kept AS ("
        "  SELECT DISTINCT user_id, i FROM ("
        "    SELECT user_id, a AS i FROM seg"
        "    UNION ALL SELECT user_id, b AS i FROM seg)),"
        " o AS ("
        "  SELECT k.user_id, p.i, p.lon, p.lat,"
        "         LAG(p.lon) OVER w AS plon, LAG(p.lat) OVER w AS plat"
        "  FROM kept k JOIN p ON p.user_id = k.user_id AND p.i = k.i"
        "  WINDOW w AS (PARTITION BY k.user_id ORDER BY p.i)),"
        " res AS ("
        "  SELECT user_id,"
        "         COALESCE(SUM(SQRT((lon - plon)*(lon - plon)"
        "                           + (lat - plat)*(lat - plat))), 0.0)"
        "           AS len,"
        "         COUNT(*) AS n_kept"
        "  FROM o GROUP BY user_id)"
        " SELECT r.user_id, CAST(e.n AS BIGINT) AS n_raw,"
        "        CAST(r.n_kept AS BIGINT) AS n_kept,"
        "        ROUND(r.len, 6) AS simplified_len"
        " FROM res r JOIN ext e ON e.user_id = r.user_id"
    )


def _pagerank_sql(iters: int = 10) -> str:
    """Unrolled fixed-iteration PageRank mirror of _q_word_pagerank
    (recursive CTEs cannot aggregate over their own reference, so the
    10 rounds unroll as chained CTEs)."""
    head = (
        "WITH tok AS (SELECT DISTINCT source AS w "
        "FROM documents WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e UNION ALL SELECT w2, w1 FROM e), "
        "deg AS (SELECT w1 AS w, CAST(COUNT(*) AS DOUBLE) AS d "
        "FROM sym GROUP BY w1), "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg), "
        "pr0 AS (SELECT deg.w, 1.0 / nn.n AS r FROM deg, nn)"
    )
    parts = [head]
    for k in range(1, iters + 1):
        parts.append(
            f", s{k} AS (SELECT sym.w2 AS w, "
            f"SUM(pr{k-1}.r / deg.d) AS inc FROM sym "
            f"JOIN pr{k-1} ON pr{k-1}.w = sym.w1 "
            f"JOIN deg ON deg.w = sym.w1 GROUP BY sym.w2), "
            f"pr{k} AS (SELECT deg.w, "
            f"(1.0 - 0.85) / nn.n + 0.85 * COALESCE(s{k}.inc, 0.0) AS r "
            f"FROM deg CROSS JOIN nn "
            f"LEFT JOIN s{k} ON s{k}.w = deg.w)"
        )
    parts.append(
        f" SELECT w AS word, ROUND(r, 6) AS rank FROM pr{iters} "
        "ORDER BY ROUND(r, 6) DESC, w LIMIT 15"
    )
    return "".join(parts)


_ROLL_POWS = [1, 1099511628211, 956575116354345, 624165263380053675,
              11527715348014283921]  # B^0..B^4 mod 2**64 (hashing.py)


def _minhash_core_sql() -> str:
    """Shared CTE list (no WITH keyword) recomputing the full MinHash
    LSH pipeline (stages/dedup.py::minhash_lsh_dedup) in pure SQL:
    documents -> char-5-shingle Rabin-Karp rolling hashes (explicit
    5-term polynomial, the closed form of the engine's rolling update)
    -> 64 frozen universal-hash permutations (MinHasher seed 42; the
    (a_j, b_j) table is data-independent config, like the
    marching-squares segment table) -> per-doc per-perm MIN -> 8-band
    FNV band keys -> bucket-capped candidate pairs -> signature
    similarity >= 0.8 verify.  Ends with `ver(a, b)`.  Scope: mirrors
    the k=5 shingle path (every sf document is >= 44 bytes; the
    engine's short-text fallback shrinks k only below 5 bytes).
    DISTINCT shingles are value-safe (MIN ignores duplicates).  The
    2044-position grid bounds doc length; sf maxlen is 577."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.hashing import (
        MinHasher,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        FNV_OFFSET, FNV_PRIME, M64, _hexval,
    )

    mh = MinHasher(64, 42)
    perm_vals = ", ".join(
        f"({j}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for j, (a, b) in enumerate(zip(mh.a, mh.b))
    )

    def byte(pos: str) -> str:
        return (
            f"(16 * {_hexval('db.hx', f'2*({pos})-1')} "
            f"+ {_hexval('db.hx', f'2*({pos})')})::HUGEINT"
        )

    shingle = " + ".join(
        f"{byte(f'i+{j}')} * {_ROLL_POWS[4-j]}::HUGEINT" for j in range(5)
    )
    return (
        f"perms(j, a, b) AS (VALUES {perm_vals}), "
        "db AS MATERIALIZED (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "pos AS (SELECT i FROM range(1, 2045) t(i)), "
        "sh AS MATERIALIZED (SELECT DISTINCT doc_id, "
        f"(({shingle}) % {M64}) AS h "
        "FROM db JOIN pos t ON t.i <= db.n - 4), "
        "sig AS MATERIALIZED (SELECT doc_id, p.j, "
        f"MIN((h * p.a + p.b) % {M64}) AS s "
        "FROM sh, perms p GROUP BY doc_id, p.j), "
        "sigl AS MATERIALIZED (SELECT doc_id, list(s ORDER BY j) AS sl "
        "FROM sig GROUP BY doc_id), "
        "bk AS MATERIALIZED (SELECT doc_id, bb.band, "
        f"xor(list_reduce(list_prepend({FNV_OFFSET}::HUGEINT, "
        "sl[bb.band*8+1 : bb.band*8+8]), "
        f"(h, x) -> (xor(h, x) * {FNV_PRIME}::HUGEINT) % {M64}), "
        "(bb.band::HUGEINT << 56)) AS key "
        "FROM sigl, range(0, 8) bb(band)), "
        "bsz AS MATERIALIZED (SELECT band, key, COUNT(*) AS g FROM bk "
        "GROUP BY band, key), "
        "cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib "
        "FROM bk x JOIN bk y ON y.band = x.band AND y.key = x.key "
        "AND y.doc_id > x.doc_id "
        "JOIN bsz ON bsz.band = x.band AND bsz.key = x.key "
        "WHERE bsz.g BETWEEN 2 AND 1000), "
        "ver AS MATERIALIZED (SELECT c.ia AS a, c.ib AS b "
        "FROM cand c JOIN sig s1 ON s1.doc_id = c.ia "
        "JOIN sig s2 ON s2.doc_id = c.ib AND s2.j = s1.j "
        "GROUP BY c.ia, c.ib "
        "HAVING (SUM(CASE WHEN s1.s = s2.s THEN 1 ELSE 0 END) / 64.0) "
        ">= 0.8)"
    )


def _cluster_tail_sql(src: str = "ver") -> str:
    """Recursive min-label transitive closure over a pair list
    `src(a, b)` -> (doc_id, cluster_rep): the SQL form of the engine's
    label propagation / union-find (identical min-id reps,
    non-singleton components only since every node is in a pair)."""
    return (
        f"nodes AS (SELECT a AS n FROM {src} UNION SELECT b FROM {src}), "
        f"edges AS (SELECT a, b FROM {src} "
        f"UNION SELECT b AS a, a AS b FROM {src}), "
        "reach(n, r) AS (SELECT n, n FROM nodes UNION "
        "SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r) "
        "SELECT n AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY n"
    )


def _winnow_dedup_oracle_sql() -> str:
    """Mirror of _q_winnow_dedup (stages/dedup.py::winnow_dedup): the
    8-term rolling-shingle polynomial, full-window sliding MIN (window
    16; docs with <= 16 shingles collapse to their global min exactly
    like the engine's short-text branch), DISTINCT fingerprints,
    postings in [2, 500], shared counts, containment overlap as the
    identical single int/int division (bit-exact, no rounding
    needed)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        M64, _hexval,
    )

    pows, p = [], 1
    for _ in range(8):
        pows.append(p)
        p = (p * 1099511628211) % (1 << 64)

    def byte(pos: str) -> str:
        return (
            f"(16 * {_hexval('db.hx', f'2*({pos})-1')} "
            f"+ {_hexval('db.hx', f'2*({pos})')})::HUGEINT"
        )

    shingle = " + ".join(
        f"{byte(f'i+{j}')} * {pows[7-j]}::HUGEINT" for j in range(8)
    )
    return (
        "WITH db AS MATERIALIZED (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "pos AS (SELECT i FROM range(1, 2045) t(i)), "
        "sh AS MATERIALIZED (SELECT doc_id, t.i AS i, "
        f"(({shingle}) % {M64}) AS h "
        "FROM db JOIN pos t ON t.i <= db.n - 7), "
        "cnt AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id), "
        "w AS (SELECT sh.doc_id, sh.i, MIN(sh.h) OVER "
        "(PARTITION BY sh.doc_id ORDER BY sh.i "
        "ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS wmin FROM sh), "
        "fps AS MATERIALIZED ("
        "SELECT DISTINCT w.doc_id, w.wmin AS fp FROM w "
        "JOIN cnt ON cnt.doc_id = w.doc_id "
        "WHERE cnt.ns > 16 AND w.i >= 16 "
        "UNION "
        "SELECT sh.doc_id, MIN(sh.h) AS fp FROM sh "
        "JOIN cnt ON cnt.doc_id = sh.doc_id WHERE cnt.ns <= 16 "
        "GROUP BY sh.doc_id), "
        "post AS (SELECT fp, COUNT(*) AS g FROM fps GROUP BY fp), "
        "pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, "
        "CAST(COUNT(*) AS BIGINT) AS shared "
        "FROM fps x JOIN fps y ON y.fp = x.fp AND y.doc_id > x.doc_id "
        "JOIN post ON post.fp = x.fp "
        "WHERE post.g BETWEEN 2 AND 500 GROUP BY x.doc_id, y.doc_id), "
        "sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m FROM fps "
        "GROUP BY doc_id) "
        "SELECT p.a, p.b, p.shared, "
        "p.shared / CAST(LEAST(sa.m, sb.m) AS DOUBLE) AS overlap "
        "FROM pairs p JOIN sz sa ON sa.doc_id = p.a "
        "JOIN sz sb ON sb.doc_id = p.b "
        "WHERE p.shared / CAST(LEAST(sa.m, sb.m) AS DOUBLE) >= 0.5"
    )


def _passage_dedup_oracle_sql(chunk: int = 10) -> str:
    """Mirror of _q_passage_dedup: disjoint token spans via list
    slicing, winner = MIN (doc_id, span_idx) per span STRING (grouping
    by the span text equals grouping by its fnv1a hash absent a 64-bit
    collision), exact int/int ratio."""
    return (
        "WITH tok AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), t -> t <> '') AS toks "
        "FROM documents), "
        f"ns AS (SELECT doc_id, toks, ARRAY_LENGTH(toks) // {chunk} AS n "
        "FROM tok), "
        "spans AS (SELECT doc_id, j AS span_idx, "
        f"array_to_string(toks[j*{chunk}+1 : j*{chunk}+{chunk}], ' ') AS s "
        "FROM ns, range(0, 205) t(j) WHERE j < ns.n), "
        "w AS (SELECT doc_id, span_idx, s, "
        "CASE WHEN ROW_NUMBER() OVER (PARTITION BY s "
        "ORDER BY doc_id, span_idx) = 1 THEN 0 ELSE 1 END AS dup "
        "FROM spans) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, "
        "CAST(SUM(dup) AS BIGINT) AS n_dup, "
        "SUM(dup) / CAST(COUNT(*) AS DOUBLE) AS dup_ratio "
        "FROM w GROUP BY doc_id"
    )


def _minhash_dedup_oracle_sql() -> str:
    """Mirror of _q_minhash_dedup; verified value-equal at
    sf0.001/0.01/0.1 (45/47/... rows)."""
    return f"WITH RECURSIVE {_minhash_core_sql()}, {_cluster_tail_sql()}"


def _simhash_dedup_oracle_sql() -> str:
    """Mirror of _q_simhash_dedup (stages/dedup.py::simhash_dedup):
    the pure-SQL SimHash (sqlmirror), four 16-bit pigeonhole band
    buckets, exact Hamming verify via bit_count(xor), same closure."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        M64, simhash64_sql,
    )

    return (
        f"WITH RECURSIVE shx AS ({simhash64_sql('documents')}), "
        "shu AS MATERIALIZED (SELECT doc_id, CASE WHEN simhash64 < 0 "
        f"THEN simhash64::HUGEINT + {M64} "
        "ELSE simhash64::HUGEINT END AS h FROM shx), "
        "bku AS MATERIALIZED (SELECT doc_id, h, "
        "CAST(bb.band * 65536 + ((h >> (bb.band * 16)) % 65536) "
        "AS BIGINT) AS gk FROM shu, range(0, 4) bb(band)), "
        "bsz AS MATERIALIZED (SELECT gk, COUNT(*) AS g FROM bku "
        "GROUP BY gk), "
        "ver AS MATERIALIZED (SELECT DISTINCT x.doc_id AS a, "
        "y.doc_id AS b "
        "FROM bku x JOIN bku y ON y.gk = x.gk AND y.doc_id > x.doc_id "
        "JOIN bsz ON bsz.gk = x.gk "
        "WHERE bsz.g BETWEEN 2 AND 1000 "
        "AND bit_count(xor(x.h, y.h)) <= 3), "
        f"{_cluster_tail_sql()}"
    )


def _jaccard_pairs_oracle_sql() -> str:
    """Mirror of _q_jaccard_pairs: the minhash pipeline's clusters ->
    first 20 (rep, doc) pairs ordered by doc_id (the engine's
    to_pylist order: label propagation emits rows sorted by doc_id) ->
    exact word-3-gram Jaccard over DISTINCT grams (set Jaccard over
    identical-fnv1a-hash grams equals set Jaccard over the gram
    strings absent a 64-bit collision)."""
    grams = (
        "CASE WHEN COALESCE(ARRAY_LENGTH(toks), 0) < 3 "
        "THEN (CASE WHEN COALESCE(ARRAY_LENGTH(toks), 0) = 0 THEN [] "
        "ELSE [array_to_string(toks, ' ')] END) "
        "ELSE list_transform(range(1, ARRAY_LENGTH(toks) - 1), "
        "i -> toks[i] || chr(31) || toks[i+1] || chr(31) || toks[i+2]) "
        "END"
    )
    return (
        f"WITH RECURSIVE {_minhash_core_sql()}, "
        "nodes AS (SELECT a AS n FROM ver UNION SELECT b FROM ver), "
        "edges AS (SELECT a, b FROM ver "
        "UNION SELECT b AS a, a AS b FROM ver), "
        "reach(n, r) AS (SELECT n, n FROM nodes UNION "
        "SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r), "
        "clus AS MATERIALIZED (SELECT n AS doc_id, MIN(r) AS rep "
        "FROM reach GROUP BY n), "
        "pick AS MATERIALIZED (SELECT rep AS a, doc_id AS b FROM clus "
        "WHERE doc_id <> rep ORDER BY doc_id LIMIT 20), "
        "tok AS MATERIALIZED (SELECT doc_id, "
        "list_filter(string_split(text, ' '), "
        "t -> t <> '') AS toks FROM documents "
        "WHERE doc_id IN (SELECT a FROM pick UNION SELECT b FROM pick)), "
        "gr AS MATERIALIZED (SELECT doc_id, "
        f"unnest(list_distinct({grams})) AS g FROM tok), "
        "sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS m FROM gr "
        "GROUP BY doc_id), "
        "inter AS MATERIALIZED (SELECT p.a, p.b, COUNT(*) AS i "
        "FROM pick p "
        "JOIN gr ga ON ga.doc_id = p.a "
        "JOIN gr gb ON gb.doc_id = p.b AND gb.g = ga.g "
        "GROUP BY p.a, p.b) "
        "SELECT p.a, p.b, "
        "COALESCE(i.i, 0) / CAST(sa.m + sb.m - COALESCE(i.i, 0) "
        "AS DOUBLE) AS jaccard, "
        "(COALESCE(i.i, 0) / CAST(sa.m + sb.m - COALESCE(i.i, 0) "
        "AS DOUBLE)) >= 0.8 AS is_dup "
        "FROM pick p "
        "JOIN sz sa ON sa.doc_id = p.a "
        "JOIN sz sb ON sb.doc_id = p.b "
        "LEFT JOIN inter i ON i.a = p.a AND i.b = p.b"
    )


def _quantiles_oracle_sql(bins: int = 512) -> str:
    """Mirror of _q_quantiles (stages/sketch.py::quantile_histogram):
    the equi-width histogram sketch is partitioning-invariant (counts
    add), so the SQL recomputes the identical sketch -- one min/max
    pass, truncating bin index with the same clip, cumulative counts
    over ALL bins, searchsorted-left containing bin, linear
    interpolation with the identical float expression order; both
    sides round 2 dp with the DuckDB kernel."""
    nb = bins
    return (
        "WITH mm AS (SELECT MIN(l_extendedprice) AS lo, "
        "MAX(l_extendedprice) AS hi, COUNT(*) AS n FROM lineitem), "
        "par AS (SELECT lo, hi, n, CASE WHEN hi > lo "
        f"THEN (hi - lo) / {nb} ELSE 1.0 END AS width FROM mm), "
        "binned AS (SELECT LEAST(GREATEST(CAST(TRUNC((l_extendedprice "
        f"- p.lo) / p.width) AS BIGINT), 0), {nb - 1}) AS b "
        "FROM lineitem, par p), "
        "counts AS (SELECT b, COUNT(*) AS c FROM binned GROUP BY b), "
        f"grid AS (SELECT i AS b FROM range(0, {nb}) t(i)), "
        "cum0 AS (SELECT g.b, COALESCE(c.c, 0) AS c, "
        "SUM(COALESCE(c.c, 0)) OVER (ORDER BY g.b) AS cs "
        "FROM grid g LEFT JOIN counts c ON c.b = g.b), "
        "cum AS (SELECT b, c, cs, "
        "COALESCE(LAG(cs) OVER (ORDER BY b), 0) AS prev_cs FROM cum0), "
        "qs AS (SELECT CAST(v.q AS DOUBLE) AS q FROM (VALUES (0.25), "
        "(0.5), (0.75), (0.95)) v(q)), "
        "pick AS (SELECT qs.q, qs.q * p.n AS target, "
        "LEAST(COALESCE(MIN(CASE WHEN cum.cs >= qs.q * p.n "
        f"THEN cum.b END), {nb - 1}), {nb - 1}) AS b "
        "FROM qs, par p, cum GROUP BY qs.q, p.n) "
        "SELECT pick.q, ROUND(p.lo + (pick.b + "
        "CASE WHEN cb.c > 0 THEN (pick.target - "
        "cb.prev_cs) / cb.c ELSE 0.0 END) * p.width, 2) "
        "AS estimate "
        "FROM pick CROSS JOIN par p "
        "JOIN cum cb ON cb.b = pick.b"
    )


def _approx_distinct_oracle_sql() -> str:
    """Mirror of _q_approx_distinct: the HyperLogLog estimate recomputed
    in pure SQL (functions/sqlmirror.py) -- FNV-1a over utf-8 bytes via
    list_reduce, fmix64 in HUGEINT with 32-bit-split wraparound
    multiplies, register max per top-12-bit index, alpha*m^2/sum(2^-reg)
    with the linear-counting fallback.  Engine and SQL both round to
    1 dp (ties-away), absorbing the float-sum-order ulp."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions import (
        sqlmirror as SM,
    )

    parts = []
    for col in ("lang", "source", "text"):
        rel = f"(SELECT {SM.fnv1a_sql(col)} AS h FROM documents)"
        parts.append(
            f"SELECT '{col}' AS \"column\", "
            f"ROUND({SM.hll_estimate_sql(rel)}, 1) AS estimate"
        )
    return " UNION ALL ".join(parts)


def _approx_distinct_by_type_oracle_sql() -> str:
    """Mirror of _q_approx_distinct_by_type
    (stages/sketch.py::grouped_approx_distinct): per-group register max
    equals the engine's blob merge, so the grouped SQL estimate is the
    same construction keyed by event_type; both sides round to 6 dp."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions import (
        sqlmirror as SM,
    )

    rel = (
        f"(SELECT event_type, "
        f"{SM.fnv1a_sql('CAST(user_id AS VARCHAR)')} AS h FROM events)"
    )
    return SM.hll_grouped_estimate_sql(rel, "event_type")


def _quality_scores_oracle_sql() -> str:
    """Mirror of _q_quality: the oracled quality expression
    (_quality_features_oracle_sql) joined to the pure-SQL SimHash
    (functions/sqlmirror.py::simhash64_sql -- FNV-1a token hashes,
    per-bit majority vote, int64 view)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        simhash64_sql,
    )

    return (
        f"WITH qf AS ({_quality_features_oracle_sql()}), "
        f"sh AS ({simhash64_sql('documents')}) "
        "SELECT qf.doc_id, qf.quality, sh.simhash64 "
        "FROM qf JOIN sh ON sh.doc_id = qf.doc_id"
    )




def _geohash_expr_for_events() -> str:
    """Geohash-6 of the events lattice geocode (the identical integer
    bit-interleave + base32 substring as functions/cells.py, no
    precomputed table)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        geohash_sql_expr,
    )

    return geohash_sql_expr(
        "(77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01)",
        "(28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01)",
        6,
    )


def _convex_hull_oracle_sql(K: int = 32) -> str:
    """Mirror of _q_convex_hull without replaying the engine: the
    strict-hull-vertex predicate evaluated in pure SQL.  K directional
    extreme points form a sound prune polygon (a hull vertex is never
    strictly inside the convex hull of ANY point subset, so libm
    cos/sin value differences between numpy and DuckDB cannot change
    the result, only the prune's tightness); the surviving O(100)
    candidates then pass the exact supporting-edge test: p is a strict
    hull vertex iff some q gives a directed line p->q with every other
    candidate strictly right of it, allowing collinear points only
    strictly BETWEEN p and q -- this reproduces the monotone chain's
    drop-collinear-vertices semantics (stages/stats.py::convex_hull).
    Verified bit-equal to the engine at sf0.001/0.01/0.1."""
    cr = "((q.x - c.x)*(r.y - c.y) - (q.y - c.y)*(r.x - c.x))"
    dt = "((r.x - c.x)*(q.x - c.x) + (r.y - c.y)*(q.y - c.y))"
    dd = "((q.x - c.x)*(q.x - c.x) + (q.y - c.y)*(q.y - c.y))"
    return (
        "WITH pts AS ("
        "  SELECT DISTINCT"
        "    (77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01)"
        "      + CAST((event_id * 2654435761) % 997 AS DOUBLE) / 99700.0 AS x,"
        "    (28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01)"
        "      + CAST((event_id * 40503) % 991 AS DOUBLE) / 99100.0 AS y"
        "  FROM events),"
        f" dirs AS (SELECT i, COS(2.0 * PI() * i / {K}.0) AS dx,"
        f"                 SIN(2.0 * PI() * i / {K}.0) AS dy"
        f"          FROM range({K}) t(i)),"
        " ext AS (SELECT DISTINCT x, y FROM ("
        "   SELECT d.i, p.x, p.y, ROW_NUMBER() OVER ("
        "     PARTITION BY d.i ORDER BY p.x*d.dx + p.y*d.dy DESC, p.x, p.y"
        "   ) AS rn FROM dirs d CROSS JOIN pts p) WHERE rn = 1),"
        " ctr AS (SELECT AVG(x) AS cx, AVG(y) AS cy FROM ext),"
        " poly AS (SELECT x, y, ROW_NUMBER() OVER ("
        "   ORDER BY ATAN2(y - ctr.cy, x - ctr.cx)) - 1 AS k FROM ext, ctr),"
        " edges AS (SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by2"
        "   FROM poly a JOIN poly b"
        "   ON b.k = (a.k + 1) % (SELECT COUNT(*) FROM poly)),"
        " cand AS (SELECT p.x, p.y FROM pts p WHERE EXISTS ("
        "   SELECT 1 FROM edges e WHERE"
        "   (e.bx - e.ax)*(p.y - e.ay) - (e.by2 - e.ay)*(p.x - e.ax) <= 0))"
        " SELECT c.x, c.y FROM cand c WHERE EXISTS ("
        "   SELECT 1 FROM cand q WHERE (q.x <> c.x OR q.y <> c.y)"
        "   AND NOT EXISTS ("
        "     SELECT 1 FROM cand r"
        "     WHERE (r.x <> c.x OR r.y <> c.y) AND (r.x <> q.x OR r.y <> q.y)"
        f"    AND NOT ({cr} < 0.0"
        f"             OR ({cr} = 0.0 AND {dt} > 0.0 AND {dt} < {dd}))))"
    )


def _dbscan_oracle_sql() -> str:
    """Mirror of _q_dbscan_clusters (stages/ann.py::grid_dbscan) in
    pure SQL: eps-cell bucketing with the identical FLOOR(x * (1/eps))
    arithmetic, dense cells (count >= max(8, n//2000)), 8-connected
    components as a recursive-CTE transitive closure over the DENSE
    cell table (bounded by cells, never points), component labels
    numbered by the component's minimum (cy, cx) cell exactly like the
    engine's lexsort first-seen numbering, and border cells joining a
    cluster only when adjacent to exactly one.  Verified bit-equal to
    the engine at sf0.001/0.01/0.1."""
    return (
        "WITH RECURSIVE base AS ("
        "  SELECT CAST(event_id % 4 AS DOUBLE) AS blob,"
        "         ((event_id // 4) % 2) = 0 AS in_blob,"
        "         CAST((event_id * 2654435761) % 997 AS DOUBLE) / 997.0 AS jx,"
        "         CAST((event_id * 40503) % 991 AS DOUBLE) / 991.0 AS jy"
        "  FROM events),"
        " p AS (SELECT"
        "   CASE WHEN in_blob THEN blob * 10.0 + jx * 0.5 ELSE jx * 40.0 END AS x,"
        "   CASE WHEN in_blob THEN blob * 5.0 + jy * 0.5 ELSE jy * 20.0 END AS y"
        "  FROM base),"
        " pc AS (SELECT x, y,"
        "   CAST(FLOOR(x * (1.0 / 0.6)) AS BIGINT) AS cx,"
        "   CAST(FLOOR(y * (1.0 / 0.6)) AS BIGINT) AS cy FROM p),"
        " mc AS (SELECT GREATEST(8, COUNT(*) // 2000) AS min_count FROM pc),"
        " cells AS (SELECT cx, cy, COUNT(*) AS n FROM pc GROUP BY 1, 2),"
        " dense AS (SELECT c.cx, c.cy FROM cells c, mc WHERE c.n >= mc.min_count),"
        " reach(cx, cy, rx, ry) AS ("
        "   SELECT cx, cy, cx, cy FROM dense"
        "   UNION"
        "   SELECT r.cx, r.cy, d.cx, d.cy FROM reach r JOIN dense d"
        "     ON ABS(d.cx - r.rx) <= 1 AND ABS(d.cy - r.ry) <= 1),"
        " roots AS (SELECT cx, cy, MIN(ry * 100000 + rx) AS rootkey"
        "           FROM reach GROUP BY 1, 2),"
        " dlab AS (SELECT cx, cy,"
        "   DENSE_RANK() OVER (ORDER BY rootkey) - 1 AS label FROM roots),"
        " blab AS ("
        "   SELECT c.cx, c.cy, CASE WHEN COUNT(DISTINCT d.label) = 1"
        "     THEN MIN(d.label) ELSE -1 END AS label"
        "   FROM (SELECT cells.cx, cells.cy FROM cells, mc"
        "         WHERE cells.n < mc.min_count) c"
        "   LEFT JOIN dlab d ON d.cx BETWEEN c.cx - 1 AND c.cx + 1"
        "     AND d.cy BETWEEN c.cy - 1 AND c.cy + 1"
        "   GROUP BY 1, 2),"
        " lab AS (SELECT * FROM dlab UNION ALL SELECT * FROM blab),"
        " pl AS (SELECT pc.x, pc.y, l.label FROM pc"
        "   JOIN lab l ON l.cx = pc.cx AND l.cy = pc.cy)"
        " SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,"
        "   ROUND(MIN(x), 6) AS x_min, ROUND(MAX(x), 6) AS x_max,"
        "   ROUND(MIN(y), 6) AS y_min, ROUND(MAX(y), 6) AS y_max"
        " FROM pl GROUP BY 1"
    )


def oracle_sql() -> dict[str, str]:
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
                f"COALESCE(SUM(cents) FILTER (WHERE event_type = '{c}'), 0) "
                f"AS sum_{c}"
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
            f"SELECT rd AS registered_domain, COUNT(*) AS n_pages, "
            f"COUNT(DISTINCT host) AS n_hosts, SUM(n_chars) AS sum_chars "
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
    _mt = " + ".join(
        f"((col // {1 << b}) % 2) * {1 << (2 * b)} "
        f"+ ((row // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(7)
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
    _segs_values = ", ".join(
        f"({sid}, {ax}, {ay}, {bx}, {by})"
        for sid, ax, ay, bx, by in OG_SEGMENTS
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
    _mh_seeds = ", ".join(f"({s})" for s in range(16))
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
    return out
