"""End-to-end pipeline tests against numpy oracles (FIXTURES.md F5).

The oracle recomputes the reference chain (meshgrid -> affine ->
reproject -> round -> filter -> sample) directly in NumPy from the
tile fixture, independent of the Ray pipeline's partitioning.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.functions import crs as _crs
from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import Polygon
from tiff_to_geojson_csv_json_format_converter_ray.schema import NODATA_F32


def _oracle_points(tiles: pa.Table, src: str, round_out=True, reproject=True):
    """Reference-chain oracle: full point table of one src (band 1)."""
    sel = tiles.filter(
        pa.compute.and_(
            pa.compute.equal(tiles["src"], src), pa.compute.equal(tiles["band"], 1)
        )
    )
    lon_all, lat_all, z_all, pix_all = [], [], [], []
    master_w = max(
        co + w
        for co, w in zip(sel["col_off"].to_pylist(), sel["width"].to_pylist())
    )
    for i in range(sel.num_rows):
        h, w = sel["height"][i].as_py(), sel["width"][i].as_py()
        t = sel["transform"][i].as_py()
        rows, cols = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        gr = rows.ravel() + sel["row_off"][i].as_py()
        gc = cols.ravel() + sel["col_off"][i].as_py()
        x = t[2] + t[0] * (gc + 0.5) + t[1] * (gr + 0.5)
        y = t[5] + t[3] * (gc + 0.5) + t[4] * (gr + 0.5)
        x = x.astype(np.float32).astype(np.float64)
        y = y.astype(np.float32).astype(np.float64)
        if reproject:
            tr = _crs.Transformer(sel["crs"][i].as_py(), "EPSG:4326")
            lon, lat = tr.transform(x, y)
        else:
            lon, lat = x, y
        z = np.asarray(sel["values"][i].as_py(), dtype=np.float32).astype(np.float64)
        if round_out:
            nd = 6 if reproject else 2
            lon, lat, z = np.round(lon, nd), np.round(lat, nd), np.round(z, 2)
        lon_all.append(lon)
        lat_all.append(lat)
        z_all.append(z)
        pix_all.append(gr.astype(np.int64) * master_w + gc.astype(np.int64))
    return (
        np.concatenate(lon_all),
        np.concatenate(lat_all),
        np.concatenate(z_all),
        np.concatenate(pix_all),
    )


@pytest.fixture(scope="module")
def tiles_table(fixtures_dir):
    return pq.read_table(os.path.join(fixtures_dir, "tiles.parquet"))


@pytest.fixture(scope="module")
def polygons_table(fixtures_dir):
    return pq.read_table(os.path.join(fixtures_dir, "polygons.parquet"))


@pytest.fixture(scope="module")
def tiles_path(fixtures_dir):
    return os.path.join(fixtures_dir, "tiles.parquet")


class TestConvert:
    def test_full_extract_counts_and_values(self, ray_session, tiles_path, tiles_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            extract_points, read_tiles, tiles_metadata,
        )

        meta = tiles_metadata(tiles_path)
        meta = meta.filter(pa.compute.equal(meta["band"], 1))
        pts = extract_points(read_tiles(tiles_path, band=1), meta, mode="full")
        got = pts.to_pandas().sort_values(["src", "pix"]).reset_index(drop=True)

        # row count per src == H*W (completePixleOutput.py:41-55)
        counts = got.groupby("src").size().to_dict()
        assert counts["master_4326"] == 256 * 256
        assert counts["allnodata"] == 32 * 32
        assert counts["utm43n"] == 64 * 64

        # value parity vs the reference-chain oracle
        for src in ("master_4326", "utm43n"):
            lon, lat, z, pix = _oracle_points(tiles_table, src)
            order = np.argsort(pix, kind="stable")
            sub = got[got["src"] == src]
            np.testing.assert_array_equal(sub["pix"].to_numpy(), pix[order])
            np.testing.assert_array_equal(sub["lon"].to_numpy(), lon[order])
            np.testing.assert_array_equal(sub["lat"].to_numpy(), lat[order])
            np.testing.assert_array_equal(sub["z"].to_numpy(), z[order])

    def test_valid_mode_filters(self, ray_session, tiles_path, tiles_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            extract_points, read_tiles, tiles_metadata,
        )

        meta = tiles_metadata(tiles_path)
        meta = meta.filter(pa.compute.equal(meta["band"], 1))
        pts = extract_points(read_tiles(tiles_path, band=1), meta, mode="valid")
        got = pts.to_pandas()
        lon, lat, z, pix = _oracle_points(tiles_table, "master_4326")
        want_n = int((z > -1e30).sum())  # willOnlyStoreValidPoints.py:66
        assert (got["src"] == "master_4326").sum() == want_n
        assert (got["src"] == "allnodata").sum() == 0  # early-exit src
        assert (got["z"] > -1e30).all()

    def test_sample_mode_stride(self, ray_session, tiles_path, tiles_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            extract_points, read_tiles, tiles_metadata,
        )

        meta = tiles_metadata(tiles_path)
        meta = meta.filter(pa.compute.equal(meta["band"], 1))
        pts = extract_points(
            read_tiles(tiles_path, band=1), meta, mode="sample", max_points=10_000
        )
        got = pts.to_pandas()
        sub = got[got["src"] == "master_4326"].sort_values("pix")
        total = 256 * 256
        rate = total // 10_000  # doesSamples.py:74-77
        want_idx = np.arange(0, total, rate)
        np.testing.assert_array_equal(sub["pix"].to_numpy(), want_idx)
        # small srcs sampled at rate 1
        assert (got["src"] == "utm43n").sum() == 64 * 64

    def test_convert_writes_sinks_and_catalog(self, ray_session, tiles_path, tmp_path):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import convert

        res = convert(tiles_path, str(tmp_path / "out"), mode="sample")
        assert res["total_points"] > 0
        cat = json.loads((tmp_path / "out" / "elevation_catalog.json").read_text())
        assert cat["total_files"] == 5
        by_src = {f["source_tiff"]: f for f in cat["files"]}
        assert not by_src["allnodata"]["has_valid_data"]  # min==max proxy
        assert by_src["master_4326"]["has_valid_data"]
        # sorted by source name (completePixleOutput.py:372)
        names = [f["source_tiff"] for f in cat["files"]]
        assert names == sorted(names)
        # geojson files parse and are FeatureCollections
        gj_dir = tmp_path / "out" / "geojson"
        files = list(gj_dir.glob("*.geojson"))
        assert files
        doc = json.loads(files[0].read_text())
        assert doc["type"] == "FeatureCollection"
        assert doc["crs"]["properties"]["name"] == "EPSG:4326"
        assert len(doc["features"]) == doc["metadata"]["geojson_points"]

    def test_explicit_sample_rate_and_records_json(self, ray_session, tiles_path, tmp_path):
        """The recovered tiff_processor_enhanced knobs: fixed every-Nth
        stride + records-orient JSON."""
        import json

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            extract_points, read_tiles, tiles_metadata,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.sinks import (
            JSONSink, run_sink,
        )

        meta = tiles_metadata(tiles_path)
        meta = meta.filter(pa.compute.equal(meta["band"], 1))
        pts = extract_points(
            read_tiles(tiles_path, band=1), meta, mode="full", sample_rate=10
        )
        got = pts.to_pandas()
        sub = got[got["src"] == "master_4326"]
        np.testing.assert_array_equal(
            np.sort(sub["pix"].to_numpy()), np.arange(0, 256 * 256, 10)
        )
        manifest = run_sink(pts, JSONSink(str(tmp_path / "jr"), records=True))
        doc = json.loads(open(manifest["output_path"][0].as_py()).read())
        assert isinstance(doc["data"], list)
        assert set(doc["data"][0]) == {"longitude", "latitude", "elevation"}

    def test_combined_csv(self, ray_session, tiles_path, tmp_path):
        """S3 + K-union: re-ingest per-source CSVs, union with a
        source_file lineage column (completePixleOutput.py:252-282)."""
        import pandas as pd

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            combine_csv_outputs, convert,
        )

        convert(tiles_path, str(tmp_path / "out"), mode="sample", formats=("csv",))
        # explicit scratch_dir exercises the cluster-visible-path mode
        n = combine_csv_outputs(
            str(tmp_path / "out" / "csv"), str(tmp_path / "combined.csv"),
            scratch_dir=str(tmp_path / "scratch"),
        )
        df = pd.read_csv(tmp_path / "combined.csv")
        assert len(df) == n > 0
        assert "source_file" in df.columns
        assert set(df.columns) == {
            "longitude", "latitude", "elevation", "source_file"
        }
        assert df["source_file"].nunique() >= 4

    def test_compress_mode_native_crs(self, ray_session, tiles_path, tiles_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            extract_points, read_tiles, tiles_metadata,
        )

        meta = tiles_metadata(tiles_path)
        meta = meta.filter(pa.compute.equal(meta["band"], 1))
        pts = extract_points(read_tiles(tiles_path, band=1), meta, mode="compress")
        got = pts.to_pandas()
        sub = got[got["src"] == "utm43n"]
        # native CRS: UTM easting ~5e5, rounded to 2 dp (thiswillcompress.py:59-61)
        assert sub["lon"].between(499000, 503000).all()
        lon, lat, z, pix = _oracle_points(
            tiles_table, "utm43n", round_out=True, reproject=False
        )
        order = np.argsort(pix, kind="stable")
        sub = sub.sort_values("pix")
        np.testing.assert_array_equal(sub["lon"].to_numpy(), lon[order])


class TestAnalyze:
    def test_analysis_records(self, ray_session, tiles_path, tiles_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.analyze import (
            analyze, master_report,
        )

        a = analyze(tiles_path).to_pandas().set_index("src")
        lon, lat, z, pix = _oracle_points(
            tiles_table, "master_4326", round_out=False
        )
        valid = z > -1e30
        r = a.loc["master_4326"]
        assert r["total_pixels"] == 256 * 256
        assert r["valid_pixels"] == int(valid.sum())
        assert r["valid_percentage"] == pytest.approx(100.0 * valid.mean())
        assert r["data_sparsity"] == ("sparse" if valid.mean() < 0.1 else "dense")
        assert r["min_elevation"] == pytest.approx(z[valid].min())
        assert r["min_longitude"] == pytest.approx(lon[valid].min())
        ana = a.loc["allnodata"]
        assert not ana["has_valid_data"] and ana["valid_pixels"] == 0
        report = master_report(analyze(tiles_path))
        assert "Files with valid data: 4" in report

    def test_combine_extremes_a4(self):
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            combine_extremes,
        )

        t = pa.table({"min": [1.0, 3.0], "max": [5.0, 9.0], "count": [10, 20]})
        got = combine_extremes(t)
        pooled = np.array([1.0, 3.0, 5.0, 9.0])
        assert got["min"] == 1.0 and got["max"] == 9.0
        assert got["mean"] == pytest.approx(pooled.mean())
        assert got["std"] == pytest.approx(pooled.std())
        assert got["count"] == 30


class TestZonal:
    def test_zonal_vs_numpy_oracle(self, ray_session, tiles_path, tiles_table, polygons_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import zonal_stats

        got = zonal_stats(tiles_path, polygons_table).to_pandas()
        lon, lat, z, _ = _oracle_points(tiles_table, "master_4326", round_out=False)
        valid = z != NODATA_F32
        for i in range(polygons_table.num_rows):
            pid = polygons_table["polygon_id"][i].as_py()
            rings = [np.asarray(r) for r in polygons_table["rings"][i].as_py()]
            poly = Polygon(pid, rings)
            m = poly.contains(lon, lat) & valid
            row = got[(got["polygon_id"] == pid) & (got["band"] == 1)].iloc[0]
            if m.sum() == 0:
                assert row["count"] == 0 and np.isnan(row["mean"])
            else:
                assert row["count"] == int(m.sum()), pid
                assert row["min"] == pytest.approx(z[m].min())
                assert row["max"] == pytest.approx(z[m].max())
                assert row["mean"] == pytest.approx(z[m].mean())
                assert row["std"] == pytest.approx(z[m].std())  # ddof=0

    def test_zonal_combine_tier_equivalence(
        self, ray_session, tiles_path, polygons_table
    ):
        """VERDICT r4 item 5: the shuffle-tier final combine (partials
        routed through a distributed groupby; the driver holds only
        polygons x bands) returns the exact same table as the driver
        combine, and 'auto' with a tiny threshold takes the shuffle
        route."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            zonal_stats,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages import stats as st

        drv = zonal_stats(
            tiles_path, polygons_table, combine_tier="driver"
        ).to_pandas()
        shf = zonal_stats(
            tiles_path, polygons_table, combine_tier="shuffle"
        ).to_pandas()
        pd.testing.assert_frame_equal(drv, shf)
        # grouped_stats 'auto' routes to shuffle when partials exceed
        # the threshold -- force it with max_driver_rows=1
        import ray.data

        t = pa.table(
            {"k": ["a", "b"] * 500, "z": np.arange(1000, dtype=np.float64)}
        )
        ds = ray.data.from_arrow(t).repartition(8)
        a = st.grouped_stats(ds, ["k"], "z", combine_tier="driver")
        b = st.grouped_stats(
            ds, ["k"], "z", combine_tier="auto", max_driver_rows=1
        )
        pd.testing.assert_frame_equal(
            a.to_pandas().sort_values("k").reset_index(drop=True),
            b.to_pandas().sort_values("k").reset_index(drop=True),
        )
        # empty input through the shuffle tier must still produce the
        # finalized schema (review r5: it crashed on the un-renamed
        # partial columns)
        empty = pa.table(
            {"k": pa.array([], pa.string()), "z": pa.array([], pa.float64())}
        )
        out = st.grouped_stats(
            ray.data.from_arrow(empty), ["k"], "z", combine_tier="shuffle"
        )
        assert out.num_rows == 0
        assert set(out.schema.names) >= {"k", "count", "mean", "std"}

    def test_center_fallback_rescues_sliver_polygon(self, ray_session, tiles_path):
        """test2.py:1335-1357 + 1392: the center-window fallback abandons
        ONLY the polygon clip -- the nodata valid_mask still applies.
        A degenerate sliver polygon (big bbox, no contained pixel
        centers) is rescued from its bbox-center window; an
        all-nodata polygon stays Null even with fallback on."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            zonal_stats,
        )

        eps = 1e-6
        # thin diagonal sliver: bbox spans ~1.5 x 2 deg of valid master
        # data, but the polygon itself contains no pixel center
        sliver = [[77.05, 26.95], [78.55, 28.93], [78.55 + eps, 28.93],
                  [77.05 + eps, 26.95], [77.05, 26.95]]
        # polygon over the allzero_nd0 tile (nodata=0, all zeros)
        zring = [[77.05, 28.75], [77.25, 28.75], [77.25, 28.93],
                 [77.05, 28.93], [77.05, 28.75]]
        polys = pa.Table.from_pylist(
            [{"polygon_id": "sliver", "geom_type": "Polygon",
              "rings": [sliver], "minx": 77.05, "miny": 26.95,
              "maxx": 78.55 + eps, "maxy": 28.93},
             {"polygon_id": "zero_poly", "geom_type": "Polygon",
              "rings": [zring], "minx": 77.05, "miny": 28.75,
              "maxx": 77.25, "maxy": 28.93}]
        )
        plain = zonal_stats(tiles_path, polys).to_pandas()
        sp = plain[plain["polygon_id"] == "sliver"]
        assert (sp["count"] == 0).all()  # clip finds nothing

        fb = zonal_stats(tiles_path, polys, center_fallback=True).to_pandas()
        # no duplicate (polygon_id, band) rows (ADVICE r1 defect 1)
        assert not fb.duplicated(["polygon_id", "band"]).any()
        sf = fb[(fb["polygon_id"] == "sliver") & (fb["band"] == 1)]
        assert len(sf) == 1 and bool(sf["from_center_fallback"].iloc[0])
        assert (sf["count"] > 0).all()
        # fallback stats come from VALID pixels only (no nodata
        # sentinel pollution -- ADVICE r1 defect 2)
        assert (sf["min"] > -1e38).all()

    def test_center_fallback_keeps_mask_and_no_dupes(self, ray_session, tmp_path):
        """A polygon Null for band 1 (all-nodata) but real for band 2
        must keep exactly one row per band: fallback replaces only the
        Null pair, and an all-nodata window is NOT rescued."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            zonal_stats,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
            TRANSFORM_4326,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.schema import NODATA_F32

        h = w = 32
        rows = []
        for band, vals in (
            (1, np.full((h, w), NODATA_F32, np.float32)),
            (2, np.full((h, w), 7.5, np.float32)),
        ):
            rows.append({
                "tile_id": f"t_b{band}", "src": "twoband", "band": band,
                "row_off": 0, "col_off": 0, "height": h, "width": w,
                "transform": list(TRANSFORM_4326), "crs": "EPSG:4326",
                "nodata": float(NODATA_F32), "values": vals.ravel().tolist(),
            })
        tiles = os.path.join(str(tmp_path), "tiles.parquet")
        pq.write_table(pa.Table.from_pylist(rows), tiles)

        ring = [[77.02, 28.80], [77.30, 28.80], [77.30, 28.98],
                [77.02, 28.98], [77.02, 28.80]]
        polys = pa.Table.from_pylist(
            [{"polygon_id": "p0", "geom_type": "Polygon", "rings": [ring],
              "minx": 77.02, "miny": 28.80, "maxx": 77.30, "maxy": 28.98}]
        )
        fb = zonal_stats(tiles, polys, center_fallback=True).to_pandas()
        assert not fb.duplicated(["polygon_id", "band"]).any()
        b1 = fb[fb["band"] == 1].iloc[0]
        b2 = fb[fb["band"] == 2].iloc[0]
        # band 1: all nodata -> still Null (mask applies at the rung)
        assert b1["count"] == 0 and not b1["from_center_fallback"]
        # band 2: resolved by the main pass, untouched by fallback
        assert b2["count"] > 0 and not b2["from_center_fallback"]
        assert b2["mean"] == pytest.approx(7.5)

    def test_zonal_buffer_grows_counts(self, ray_session, tiles_path, polygons_table):
        """T8 end-to-end: buffered polygons clip at least as many
        pixels (test2.py:275-278 inclusive-clip role)."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            zonal_stats,
        )

        plain = zonal_stats(tiles_path, polygons_table).to_pandas()
        buffered = zonal_stats(tiles_path, polygons_table, buffer=0.05).to_pandas()
        p = plain[plain["band"] == 1].set_index("polygon_id")["count"]
        b = buffered[buffered["band"] == 1].set_index("polygon_id")["count"]
        assert (b.loc[p.index] >= p).all()
        assert (b.loc[p.index] > p).any()

    def test_zonal_rescale_uint8(self, ray_session, tiles_path, polygons_table):
        """T12 end-to-end: rescale maps stats into the original range."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            zonal_stats,
        )

        plain = zonal_stats(tiles_path, polygons_table).to_pandas()
        rescaled = zonal_stats(
            tiles_path, polygons_table, rescale=(1000.0, 2000.0)
        ).to_pandas()
        p = plain[(plain["polygon_id"] == "adm_0") & (plain["band"] == 1)].iloc[0]
        r = rescaled[(rescaled["polygon_id"] == "adm_0") & (rescaled["band"] == 1)].iloc[0]
        # v/255*(max-min)+min applied before stats
        assert r["mean"] == pytest.approx(p["mean"] / 255.0 * 1000.0 + 1000.0, rel=1e-9)
        assert r["count"] == p["count"]

    def test_pages_actor_pool_path(self, ray_session, fixtures_dir, polygons_table):
        """PIP as an actor pool (concurrency=2) gives identical counts
        to the function-closure path."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
            pages_flagship,
        )

        pages_path = os.path.join(fixtures_dir, "pages.parquet")
        fn_path = pages_flagship(pages_path, polygons=polygons_table, res=8)
        actor_path = pages_flagship(
            pages_path, polygons=polygons_table, res=8, concurrency=2
        )
        a = sorted(fn_path["polygon_counts"].to_pylist(), key=lambda r: r["polygon_id"])
        b = sorted(actor_path["polygon_counts"].to_pylist(), key=lambda r: r["polygon_id"])
        assert a == b

    def test_zonal_null_sentinel_outside(self, ray_session, tiles_path, polygons_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import zonal_stats

        got = zonal_stats(tiles_path, polygons_table).to_pandas()
        out = got[got["polygon_id"] == "adm_outside"]
        assert (out["count"] == 0).all()  # test2.py:1381-1388 "Null" record


class TestPages:
    def test_flagship_counts(self, ray_session, fixtures_dir, polygons_table):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
            pages_flagship,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.functions import cells, text

        pages_path = os.path.join(fixtures_dir, "pages.parquet")
        out = pages_flagship(pages_path, polygons=polygons_table, res=8)

        tbl = pq.read_table(pages_path)
        # oracle: lang histogram
        import collections

        want_lang = collections.Counter(tbl["lang"].to_pylist())
        got_lang = {
            r["lang"]: r["count"] for r in out["lang_counts"].to_pylist()
        }
        assert got_lang == dict(want_lang)

        # oracle: geo extraction + cells + PIP
        geos = [text.extract_geo(h) for h in tbl["html"].to_pylist()]
        lat = np.array([g[0] for g in geos if g])
        lon = np.array([g[1] for g in geos if g])
        want_cells = collections.Counter(cells.cell_of(lon, lat, 8).tolist())
        got_cells = {
            r["cell_8"]: r["count"] for r in out["cell_counts"].to_pylist()
        }
        assert got_cells == dict(want_cells)

        want_poly: dict[str, int] = {}
        for i in range(polygons_table.num_rows):
            pid = polygons_table["polygon_id"][i].as_py()
            rings = [np.asarray(r) for r in polygons_table["rings"][i].as_py()]
            n = int(Polygon(pid, rings).contains(lon, lat).sum())
            if n:
                want_poly[pid] = n
        got_poly = {
            r["polygon_id"]: r["count"] for r in out["polygon_counts"].to_pylist()
        }
        assert got_poly == want_poly

    def test_flagship_combine_tiers(
        self, ray_session, fixtures_dir, polygons_table, tmp_path
    ):
        """VERDICT r3 item 1: the driver and shuffle combine tiers give
        identical aggregates; 'auto' routes on the partial-row count;
        output_path writes the combined aggregate straight to
        tag-partitioned parquet (driver never sees it)."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines import (
            pages,
        )

        pages_path = os.path.join(fixtures_dir, "pages.parquet")
        drv = pages.pages_flagship(
            pages_path, polygons=polygons_table, res=8,
            combine_tier="driver",
        )
        assert pages.LAST_COMBINE_TIER == "driver"
        shf = pages.pages_flagship(
            pages_path, polygons=polygons_table, res=8,
            combine_tier="shuffle",
        )
        assert pages.LAST_COMBINE_TIER == "shuffle"
        assert set(drv) == set(shf)
        for k in drv:
            a = sorted(drv[k].to_pylist(), key=str)
            b = sorted(shf[k].to_pylist(), key=str)
            assert a == b, k
        # auto: a tiny threshold forces the shuffle tier...
        pages.pages_flagship(
            pages_path, res=8, combine_tier="auto", max_driver_keys=1
        )
        assert pages.LAST_COMBINE_TIER == "shuffle"
        # ...and at fixture scale the default auto stays driver
        pages.pages_flagship(pages_path, res=8)
        assert pages.LAST_COMBINE_TIER == "driver"
        # scale path: combined aggregate written as parquet, not tables
        outd = str(tmp_path / "agg")
        paths = pages.pages_flagship(
            pages_path, polygons=polygons_table, res=8,
            combine_tier="shuffle", output_path=outd,
        )
        assert set(paths) == {"lang_counts", "cell_counts", "polygon_counts"}
        got_cells = {
            int(r["key"]): r["count"]
            for r in pq.read_table(paths["cell_counts"]).to_pylist()
        }
        want_cells = {
            r["cell_8"]: r["count"]
            for r in drv["cell_counts"].to_pylist()
        }
        assert got_cells == want_cells

    def test_flagship_url_dedup(self, ray_session, fixtures_dir, polygons_table):
        """dedup_urls drops the ~1%% duplicate-url rows before counting."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
            pages_flagship,
        )

        pages_path = os.path.join(fixtures_dir, "pages.parquet")
        tbl = pq.read_table(pages_path)
        n_rows = tbl.num_rows
        n_urls = len(set(tbl["url"].to_pylist()))
        assert n_urls < n_rows  # fixture plants dups

        plain = pages_flagship(pages_path)
        deduped = pages_flagship(pages_path, dedup_urls=True)
        total_plain = sum(r["count"] for r in plain["lang_counts"].to_pylist())
        total_dedup = sum(r["count"] for r in deduped["lang_counts"].to_pylist())
        assert total_plain == n_rows
        assert total_dedup == n_urls

    def test_invariant_enforced(self, ray_session, fixtures_dir):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import PageExtract

        tbl = pq.read_table(os.path.join(fixtures_dir, "pages.parquet")).slice(0, 20)
        # corrupt one golden text -> stage must raise
        texts = tbl["text"].to_pylist()
        texts[3] = texts[3] + "CORRUPTED"
        bad = tbl.set_column(
            tbl.column_names.index("text"), "text", pa.array(texts)
        )
        ds = ray.data.from_arrow(bad)
        with pytest.raises(Exception, match="invariant"):
            ds.map_batches(
                PageExtract(check_invariant=True), batch_format="pyarrow"
            ).materialize()


class TestRelationalUtils:
    def test_distinct_matches_duckdb(self, ray_session, sf_dir):
        import duckdb
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            distinct,
        )

        path = os.path.join(sf_dir, "documents.parquet")
        ds = ray.data.read_parquet(path, columns=["lang", "source"])
        got = distinct(ds, ["lang", "source"]).to_pandas()
        got = got.sort_values(["lang", "source"]).reset_index(drop=True)
        want = (
            duckdb.connect()
            .execute(
                f"SELECT DISTINCT lang, source FROM read_parquet('{path}') "
                "ORDER BY lang, source"
            )
            .fetchdf()
        )
        assert got.equals(want)

    def test_strtree_query_points(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            STRtree,
        )

        boxes = np.array([[0, 0, 1, 1], [2, 2, 3, 3]])
        tree = STRtree(boxes)
        lon = np.array([0.5, 2.5, 5.0])
        lat = np.array([0.5, 2.5, 5.0])
        masks = tree.query_points(lon, lat)
        np.testing.assert_array_equal(masks[0], [True, False, False])
        np.testing.assert_array_equal(masks[1], [False, True, False])


class TestShuffle:
    def test_salted_count_matches_plain(self, ray_session, fixtures_dir):
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.pages import (
            geocode_pages, read_pages,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
            partial_count, salted_groupby_count,
        )
        import pyarrow.compute as pc

        pages_path = os.path.join(fixtures_dir, "pages.parquet")
        geo = geocode_pages(read_pages(pages_path), check_invariant=False)
        geo = geo.map_batches(
            lambda b: b.filter(pc.equal(b["has_geo"], True)),
            batch_format="pyarrow",
        )
        # cell_7 has urban hot cells (80% of points in 5 clusters)
        plain = {
            r["cell_7"]: r["count"]
            for r in partial_count(geo, ["cell_7"]).to_pylist()
        }
        # salted path: no 'pix' col on pages -> positional salt
        salted = {
            r["cell_7"]: r["count"]
            for r in salted_groupby_count(geo, "cell_7", salt_k=4).to_pylist()
        }
        assert salted == plain
        # skew sanity: hottest cell is >10x median
        counts = np.array(sorted(plain.values()))
        assert counts[-1] > 10 * np.median(counts)

    def test_salting_balances_100x_skewed_key(self):
        """SURVEY §7.5: a 100x-skewed key must spread across reducers —
        after SaltStage, the largest (key, _salt) partition holds
        ~1/salt_k of the hot key, not all of it."""
        from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
            SaltStage, detect_hot_keys,
        )

        k = 8
        hot_n, cold_n = 100_000, 1_000
        keys = np.r_[
            np.zeros(hot_n, np.int64),
            np.repeat(np.arange(1, 21, dtype=np.int64), cold_n // 20),
        ]
        batch = pa.table({"cell": keys, "pix": np.arange(len(keys))})
        pre = (
            batch.select(["cell"])
            .append_column("_one", pa.array(np.ones(len(keys), np.int64)))
            .group_by(["cell"]).aggregate([("_one", "sum")])
            .rename_columns(["cell", "count"])
        )
        hot = detect_hot_keys(pre, "cell", factor=10.0)
        assert hot == {0}
        out = SaltStage("cell", hot, k=k, row_hash_col="pix")(batch)
        sizes = (
            out.select(["cell", "_salt"])
            .append_column("_one", pa.array(np.ones(out.num_rows, np.int64)))
            .group_by(["cell", "_salt"]).aggregate([("_one", "sum")])
        )["_one_sum"].to_numpy()
        # hot key split into k near-equal shares; bound = 2x ideal
        assert sizes.max() <= 2 * hot_n / k
        # cold keys untouched (all salt 0)
        cold = out.filter(pa.compute.not_equal(out["cell"], 0))
        assert set(cold["_salt"].to_pylist()) == {0}


class TestKeyedParquetVariants:
    """ROADMAP r3 item 2: per-key ordered pipelines as streaming
    Datasets + parquet sink -- results must equal the collected driver
    queries exactly."""

    def test_track_lengths_parquet_roundtrip(self, ray_session, sf_dir, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq
        import ray.data

        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            track_lengths_ds,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.sinks import (
            write_dataset_parquet,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts"],
        )
        out = str(tmp_path / "tracks")
        manifest = write_dataset_parquet(track_lengths_ds(ds), out)
        assert manifest.num_rows >= 1
        got = (
            pq.read_table(out, columns=["user_id", "track_len"])
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        want = (
            entry.queries()["track_lengths"](sf_dir)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        assert int(manifest["row_count"].to_numpy().sum()) == len(want)

    def test_conversion_lag_ds_matches_query(self, ray_session, sf_dir):
        import pandas as pd
        import ray.data

        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            conversion_lag_ds,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        got = (
            conversion_lag_ds(ds)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)[["user_id", "n_conversions", "avg_lag_s"]]
        )
        want = (
            entry.queries()["conversion_lag"](sf_dir)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
