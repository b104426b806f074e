"""Pluggable bbox-fetch source ladder (reference test2.py:815-992):
URL-format pins, fallback order, and the zonal pipeline running
end-to-end against the pluggable source."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.sources.fetch import (
    FetchError, LocalParquetFetcher, SourceLadder, WCSFetcher, WMSFetcher,
)

BASE = "http://geoserver.example"


@pytest.fixture(scope="module")
def tiles_path(fixtures_dir):
    return os.path.join(fixtures_dir, "tiles.parquet")


@pytest.fixture(scope="module")
def polygons_table(fixtures_dir):
    return pq.read_table(os.path.join(fixtures_dir, "polygons.parquet"))


class TestURLFormats:
    def test_wcs_201_axis_naming_by_crs(self):
        f = WCSFetcher(BASE, "2.0.1", native_crs="EPSG:4326")
        u = f.url("dem", (1.0, 2.0, 3.0, 4.0))
        assert "subset=Long(1.0,3.0)" in u and "subset=Lat(2.0,4.0)" in u
        assert "coverageId=useruploads:dem" in u
        fp = WCSFetcher(BASE, "2.0.1", native_crs="EPSG:32643")
        up = fp.url("dem", (1.0, 2.0, 3.0, 4.0))
        # projected CRS switches to E/N axis names (test2.py:826-836)
        assert "subset=E(1.0,3.0)" in up and "subset=N(2.0,4.0)" in up

    def test_wcs_111_and_100(self):
        u11 = WCSFetcher(BASE, "1.1.1").url("dem", (1, 2, 3, 4))
        assert "identifier=useruploads:dem" in u11
        assert "BoundingBox=1.0,2.0,3.0,4.0,EPSG:4326" in u11
        u10 = WCSFetcher(BASE, "1.0.0").url("dem", (1, 2, 3, 4))
        assert "coverage=useruploads:dem" in u10
        assert "response_crs=EPSG:4326" in u10 and "width=1024" in u10

    def test_wms_url(self):
        u = WMSFetcher(BASE).url("dem", (1, 2, 3, 4), buffer=0.5)
        assert "request=GetMap" in u and "layers=useruploads:dem" in u
        assert "bbox=0.5,1.5,3.5,4.5" in u and "styles=" in u

    def test_offline_fetch_raises_fetcherror(self):
        with pytest.raises(FetchError, match="no http_get"):
            WCSFetcher(BASE).fetch("dem", (1, 2, 3, 4))


class TestLadder:
    def test_falls_through_to_local(self, tiles_path):
        ladder = SourceLadder(
            [
                WCSFetcher(BASE, "2.0.1"),  # offline -> FetchError
                WCSFetcher(BASE, "1.1.1"),
                LocalParquetFetcher(tiles_path),
            ]
        )
        out = ladder.fetch("master_4326", (77.0, 28.3, 77.7, 29.0))
        assert out.num_rows > 0
        assert ladder.last_rung == "local-parquet"
        assert [n for n, _ in ladder.attempts] == ["wcs-2.0.1", "wcs-1.1.1"]

    def test_http_rung_wins_with_injected_get(self, tiles_path):
        tiles = pq.read_table(tiles_path)

        def fake_get(url):
            assert "GetCoverage" in url
            return 200, "image/geotiff", tiles

        ladder = SourceLadder(
            [WCSFetcher(BASE, "2.0.1", http_get=fake_get),
             LocalParquetFetcher(tiles_path)]
        )
        out = ladder.fetch("master_4326", (77.0, 28.3, 77.7, 29.0))
        assert out.num_rows == tiles.num_rows
        assert ladder.last_rung == "wcs-2.0.1"

    def test_non_image_response_falls_through(self, tiles_path):
        def bad_get(url):
            return 200, "text/xml", "<ServiceException/>"

        ladder = SourceLadder(
            [WCSFetcher(BASE, "2.0.1", http_get=bad_get),
             LocalParquetFetcher(tiles_path)]
        )
        ladder.fetch("master_4326", (77.0, 28.3, 77.7, 29.0))
        assert ladder.last_rung == "local-parquet"
        assert "non-image" in ladder.attempts[0][1]

    def test_unknown_layer_raises(self, tiles_path):
        ladder = SourceLadder([LocalParquetFetcher(tiles_path)])
        with pytest.raises(FetchError, match="not found"):
            ladder.fetch("nope", (0, 0, 1, 1))


class TestLocalFetcher:
    def test_prunes_tiles_outside_bbox(self, tiles_path):
        f = LocalParquetFetcher(tiles_path)
        # bbox covering only the top-left 64x64 tile of the master grid
        out = f.fetch("master_4326", (77.0, 28.4, 77.5, 29.0))
        ids = set(out["tile_id"].to_pylist())
        assert ids and ids < set(
            pq.read_table(tiles_path, columns=["tile_id"])["tile_id"].to_pylist()
        )
        # every returned tile is from the requested layer
        assert set(out["src"].to_pylist()) == {"master_4326"}

    def test_bbox_miss_raises(self, tiles_path):
        f = LocalParquetFetcher(tiles_path)
        with pytest.raises(FetchError, match="no tiles intersect"):
            f.fetch("master_4326", (120.0, 50.0, 121.0, 51.0))


class TestZonalFromSource:
    def test_zonal_runs_against_pluggable_source(
        self, ray_session, tiles_path, polygons_table
    ):
        """The reference's zonal endpoint semantics over the ladder:
        results equal zonal_stats on the full local path."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            zonal_stats, zonal_stats_from_source,
        )

        polys = polygons_table.slice(0, 3)
        ladder = SourceLadder(
            [WCSFetcher(BASE, "2.0.1"), LocalParquetFetcher(tiles_path)]
        )
        got = zonal_stats_from_source(ladder, "master_4326", polys).to_pandas()
        assert ladder.last_rung == "local-parquet"

        # oracle: zonal over a parquet restricted to the same layer
        import tempfile

        full = pq.read_table(tiles_path)
        sub = full.filter(pa.compute.equal(full["src"], "master_4326"))
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.parquet")
            pq.write_table(sub, p)
            want = zonal_stats(p, polys).to_pandas()
        cols = ["polygon_id", "band", "count", "mean", "min", "max"]
        got_b1 = got[got["band"] == 1][cols].reset_index(drop=True)
        want_b1 = want[want["band"] == 1][cols].reset_index(drop=True)
        assert got_b1.equals(want_b1)
