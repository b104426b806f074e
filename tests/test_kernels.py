"""Unit tests of the pure-NumPy geo/text/hash kernels (no Ray needed)."""

from __future__ import annotations

import numpy as np
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.functions import (
    affine,
    cells,
    crs,
    geometry,
    hashing,
    knn,
    match,
    text,
)


class TestAffine:
    def test_pixel_center(self):
        t = (0.01, 0.0, 77.0, 0.0, -0.01, 29.0)
        x, y = affine.pixel_to_world(t, np.array([0]), np.array([0]))
        assert x[0] == pytest.approx(77.005)
        assert y[0] == pytest.approx(28.995)

    def test_roundtrip(self):
        t = (0.01, 0.002, 77.0, -0.001, -0.01, 29.0)  # with rotation terms
        rows = np.arange(0, 50, 7).astype(float)
        cols = np.arange(0, 50, 7).astype(float)
        x, y = affine.pixel_to_world(t, rows, cols, offset=0.0)
        r2, c2 = affine.world_to_pixel(t, x, y)
        np.testing.assert_allclose(r2, rows, atol=1e-9)
        np.testing.assert_allclose(c2, cols, atol=1e-9)

    def test_grid_bounds(self):
        t = (0.01, 0.0, 77.0, 0.0, -0.01, 29.0)
        minx, miny, maxx, maxy = affine.grid_bounds(t, 256, 256)
        assert (minx, maxy) == (77.0, 29.0)
        assert maxx == pytest.approx(79.56)
        assert miny == pytest.approx(26.44)


class TestCRS:
    def test_lcc_snyder_worked_example(self):
        """Snyder 1987 p. 296 (LCC 2SP, Clarke 1866): the published
        worked example is the external oracle for the conic math."""
        clarke = {"a": 6378206.4, "e2": 0.00676866}
        p = dict(clarke, lat0=23.0, lon0=-96.0, sp1=33.0, sp2=45.0)
        x, y = crs.lcc_forward(np.array([-75.0]), np.array([35.0]), p)
        assert x[0] == pytest.approx(1894410.9, abs=0.5)
        assert y[0] == pytest.approx(1564649.5, abs=0.5)
        lon, lat = crs.lcc_inverse(x, y, p)
        assert lon[0] == pytest.approx(-75.0, abs=1e-8)
        assert lat[0] == pytest.approx(35.0, abs=1e-8)

    def test_albers_snyder_worked_example(self):
        """Snyder 1987 p. 292 (Albers equal-area, Clarke 1866)."""
        clarke = {"a": 6378206.4, "e2": 0.00676866}
        p = dict(clarke, lat0=23.0, lon0=-96.0, sp1=29.5, sp2=45.5)
        x, y = crs.albers_forward(np.array([-75.0]), np.array([35.0]), p)
        assert x[0] == pytest.approx(1885472.7, abs=0.5)
        assert y[0] == pytest.approx(1535925.0, abs=0.5)
        lon, lat = crs.albers_inverse(x, y, p)
        assert lon[0] == pytest.approx(-75.0, abs=1e-7)
        assert lat[0] == pytest.approx(35.0, abs=1e-7)

    def test_conic_epsg_roundtrips(self):
        """Registered GRS80 conic codes: Transformer round-trips to
        sub-1e-8-degree (Lambert-93, Conus Albers, California Albers)."""
        for code, (lon0, lat0) in [
            ("EPSG:2154", (2.35, 48.85)),
            ("EPSG:5070", (-84.4, 33.7)),
            ("EPSG:3310", (-118.2, 34.05)),
        ]:
            fwd = crs.Transformer("EPSG:4326", code)
            inv = crs.Transformer(code, "EPSG:4326")
            x, y = fwd.transform(np.array([lon0]), np.array([lat0]))
            lon, lat = inv.transform(x, y)
            assert lon[0] == pytest.approx(lon0, abs=1e-8)
            assert lat[0] == pytest.approx(lat0, abs=1e-8)

    def test_webmercator_roundtrip(self):
        lon = np.array([77.2, -122.4, 0.0])
        lat = np.array([28.6, 37.7, 0.0])
        x, y = crs.webmercator_forward(lon, lat)
        lon2, lat2 = crs.webmercator_inverse(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_webmercator_known_point(self):
        # Known EPSG:3857 value for (lon=1, lat=0): x = R * pi/180
        x, y = crs.webmercator_forward(np.array([1.0]), np.array([0.0]))
        assert x[0] == pytest.approx(111319.49079327358, rel=1e-12)
        assert y[0] == pytest.approx(0.0, abs=1e-9)

    def test_utm_known_point(self):
        # UTM zone 43N around 77.5E: central meridian 75E.  A point on the
        # central meridian maps to easting 500000 exactly.
        e, n = crs.utm_forward(np.array([75.0]), np.array([28.0]), zone=43)
        assert e[0] == pytest.approx(500000.0, abs=1e-6)
        # northing ~ meridian arc * k0 -- sanity range for 28N
        assert 3.09e6 < n[0] < 3.11e6

    def test_utm_roundtrip(self):
        rng = np.random.RandomState(0)
        lon = 75.0 + rng.rand(100) * 5.0  # inside zone 43
        lat = -60.0 + rng.rand(100) * 120.0
        e, n = crs.utm_forward(lon, lat, zone=43)
        lon2, lat2 = crs.utm_inverse(e, n, zone=43)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_transformer_utm_to_wgs84(self):
        t = crs.Transformer("EPSG:32643", "EPSG:4326")
        lon, lat = t.transform(np.array([500000.0]), np.array([3100000.0]))
        assert lon[0] == pytest.approx(75.0, abs=1e-8)
        assert 27.0 < lat[0] < 29.0

    def test_transformer_identity(self):
        t = crs.Transformer("EPSG:4326", "EPSG:4326")
        lon, lat = t.transform(np.array([77.0]), np.array([28.0]))
        assert (lon[0], lat[0]) == (77.0, 28.0)

    def test_utm_inverse_grid_matches_pointwise(self):
        """Separable grid path == pointwise Karney inverse to well below
        the engine's 6-dp output rounding (machine-precision identities
        + Taylor-of-small-correction, see crs.utm_inverse_grid)."""
        rng = np.random.RandomState(7)
        for zone, south in [(43, False), (33, False), (19, True)]:
            e = np.sort(rng.uniform(167000, 833000, 129))
            n = np.sort(rng.uniform(1_100_000, 9_300_000, 97))
            lon_g, lat_g = crs.utm_inverse_grid(e, n, zone, south)
            ee = np.broadcast_to(e[None, :], (97, 129)).ravel()
            nn = np.broadcast_to(n[:, None], (97, 129)).ravel()
            lon_p, lat_p = crs.utm_inverse(ee, nn, zone, south)
            assert np.abs(lon_g - lon_p).max() < 1e-11
            assert np.abs(lat_g - lat_p).max() < 1e-11
            assert np.array_equal(np.round(lon_g, 6), np.round(lon_p, 6))
            assert np.array_equal(np.round(lat_g, 6), np.round(lat_p, 6))

    def test_transform_grid_fallback_and_separable(self):
        x = np.linspace(300000.0, 700000.0, 33)
        y = np.linspace(3_000_000.0, 3_400_000.0, 17)
        for src in ["EPSG:32643", "EPSG:3857", "EPSG:2154"]:
            t = crs.Transformer(src, "EPSG:4326")
            if src == "EPSG:3857":
                xs, ys = x, np.linspace(2_000_000.0, 4_000_000.0, 17)
            else:
                xs, ys = x, y
            lon_g, lat_g = t.transform_grid(xs, ys)
            xx = np.broadcast_to(xs[None, :], (17, 33)).ravel()
            yy = np.broadcast_to(ys[:, None], (17, 33)).ravel()
            lon_p, lat_p = t.transform(xx, yy)
            np.testing.assert_allclose(lon_g, lon_p, atol=1e-11)
            np.testing.assert_allclose(lat_g, lat_p, atol=1e-11)


class TestCells:
    def test_pack_unpack(self):
        lon = np.array([77.2, -179.99, 179.99, 0.0])
        lat = np.array([28.6, -89.99, 89.99, 0.0])
        for res in (7, 8, 9):
            c = cells.cell_of(lon, lat, res)
            r, iy, ix = cells.unpack(c)
            assert (r == res).all()
            s = cells.cell_size(res)
            np.testing.assert_array_equal(
                ix, np.floor((lon + 180.0) / s).astype(np.int64)
            )

    def test_parent_child(self):
        lon = np.array([77.2345])
        lat = np.array([28.6789])
        c9 = cells.cell_of(lon, lat, 9)
        c8 = cells.cell_of(lon, lat, 8)
        c7 = cells.cell_of(lon, lat, 7)
        np.testing.assert_array_equal(cells.parent(c9), c8)
        np.testing.assert_array_equal(cells.parent(c9, 7), c7)

    def test_parent_matches_direct(self):
        """Shift-derived coarse ids (TilePivot's one-pass cell encode)
        == directly computed cell_of at every coarser resolution,
        including the out-of-range clip path."""
        rng = np.random.RandomState(1)
        lon = rng.uniform(-185, 185, 50000)
        lat = rng.uniform(-95, 95, 50000)
        for finest in (9, 12):
            base = cells.cell_of(lon, lat, finest)
            for r in range(0, finest):
                np.testing.assert_array_equal(
                    cells.parent(base, r), cells.cell_of(lon, lat, r)
                )

    def test_bounds_contain_point(self):
        c = cells.cell_of(np.array([77.2]), np.array([28.6]), 8)
        minlon, minlat, maxlon, maxlat = cells.cell_bounds(int(c[0]))
        assert minlon <= 77.2 < maxlon
        assert minlat <= 28.6 < maxlat

    def test_oracle_sql_matches_numpy(self):
        import duckdb

        rng = np.random.RandomState(1)
        lon = -180.0 + rng.rand(5000) * 360.0
        lat = -90.0 + rng.rand(5000) * 180.0
        for res in (7, 9):
            expected = cells.cell_of(lon, lat, res)
            con = duckdb.connect()
            con.register("pts", __import__("pyarrow").table({"lon": lon, "lat": lat}))
            got = con.execute(
                f"SELECT {cells.oracle_sql_expr('lon', 'lat', res)} AS c FROM pts"
            ).fetchnumpy()["c"]
            np.testing.assert_array_equal(got, expected)


class TestGeometry:
    def test_pip_square(self):
        sq = geometry.bbox_polygon(0.0, 0.0, 1.0, 1.0)
        lon = np.array([0.5, 1.5, -0.1, 0.99, 0.0001])
        lat = np.array([0.5, 0.5, 0.5, 0.01, 0.9999])
        np.testing.assert_array_equal(
            sq.contains(lon, lat), [True, False, False, True, True]
        )

    def test_pip_hole(self):
        outer = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
        hole = [[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]
        p = geometry.Polygon("h", [outer, hole])
        lon = np.array([0.5, 2.0, 3.5])
        lat = np.array([0.5, 2.0, 3.5])
        np.testing.assert_array_equal(p.contains(lon, lat), [True, False, True])

    def test_pip_concave(self):
        l_ring = [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]]
        p = geometry.Polygon("l", [l_ring])
        lon = np.array([0.5, 2.0, 2.0])
        lat = np.array([2.0, 0.5, 2.0])
        np.testing.assert_array_equal(p.contains(lon, lat), [True, True, False])

    def test_pip_matches_matplotlib_free_oracle(self):
        # random convex polygon: PIP must equal the half-plane test
        rng = np.random.RandomState(7)
        ang = np.sort(rng.rand(8) * 2 * np.pi)
        ring = np.stack([np.cos(ang), np.sin(ang)], axis=1)
        p = geometry.Polygon("c", [np.vstack([ring, ring[:1]])])
        pts = rng.rand(2000, 2) * 2.4 - 1.2
        got = p.contains(pts[:, 0], pts[:, 1])
        # half-plane oracle (ccw ring)
        ok = np.ones(len(pts), dtype=bool)
        for i in range(len(ring)):
            a, b = ring[i], ring[(i + 1) % len(ring)]
            cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (
                pts[:, 0] - a[0]
            )
            ok &= cross > 0
        # ignore points within eps of an edge (boundary convention)
        near_edge = np.zeros(len(pts), dtype=bool)
        for i in range(len(ring)):
            a, b = ring[i], ring[(i + 1) % len(ring)]
            d = np.abs(
                (b[0] - a[0]) * (pts[:, 1] - a[1])
                - (b[1] - a[1]) * (pts[:, 0] - a[0])
            ) / np.hypot(b[0] - a[0], b[1] - a[1])
            near_edge |= d < 1e-9
        np.testing.assert_array_equal(got[~near_edge], ok[~near_edge])

    def test_bbox_intersects(self):
        boxes = np.array([[0, 0, 1, 1], [2, 2, 3, 3], [0.5, 0.5, 2.5, 2.5]])
        np.testing.assert_array_equal(
            geometry.bbox_intersects(boxes, 0.9, 0.9, 1.1, 1.1),
            [True, False, True],
        )

    def test_strtree_vs_brute(self):
        rng = np.random.RandomState(3)
        lo = rng.rand(500, 2) * 10
        boxes = np.hstack([lo, lo + rng.rand(500, 2)])
        tree = geometry.STRtree(boxes)
        for _ in range(20):
            q = rng.rand(4) * 10
            qb = [min(q[0], q[2]), min(q[1], q[3]), max(q[0], q[2]), max(q[1], q[3])]
            got = np.sort(tree.query(*qb))
            want = np.sort(np.nonzero(geometry.bbox_intersects(boxes, *qb))[0])
            np.testing.assert_array_equal(got, want)

    def test_parse_geojson_forms(self):
        poly = {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}
        feat = {"type": "Feature", "geometry": poly}
        fc = {"type": "FeatureCollection", "features": [feat]}
        canvas = [poly, [0, 0, 1, 1]]
        for g in (poly, feat, fc, canvas):
            ps = geometry.parse_geojson(g)
            assert len(ps) == 1 and ps[0].bbox == (0.0, 0.0, 1.0, 1.0)

    def test_buffer_grows(self):
        sq = geometry.bbox_polygon(0.0, 0.0, 1.0, 1.0)
        buf = geometry.buffer_polygon(sq, 0.1)
        # point just outside the original square is inside the buffer
        assert not sq.contains(np.array([1.05]), np.array([0.5]))[0]
        assert buf.contains(np.array([1.05]), np.array([0.5]))[0]

    def test_union_bag(self):
        a = geometry.bbox_polygon(0, 0, 1, 1, "a")
        b = geometry.bbox_polygon(2, 0, 3, 1, "b")
        u = geometry.union_bag([a, b])
        lon = np.array([0.5, 2.5, 1.5])
        lat = np.array([0.5, 0.5, 0.5])
        np.testing.assert_array_equal(u.contains(lon, lat), [True, True, False])


class TestKNN:
    def test_grid_matches_brute(self):
        rng = np.random.RandomState(5)
        lon = rng.rand(3000) * 2 + 77
        lat = rng.rand(3000) * 2 + 27
        idx = knn.KNNIndex(lon, lat)
        qlon = rng.rand(50) * 2 + 77
        qlat = rng.rand(50) * 2 + 27
        gi, gd = idx.query(qlon, qlat, k=3)
        bi, bd = idx.query_brute(qlon, qlat, k=3)
        np.testing.assert_allclose(gd, bd, atol=1e-12)
        np.testing.assert_array_equal(gi, bi)

    def test_query_radius_matches_brute(self):
        rng = np.random.RandomState(11)
        lon = rng.rand(2000) * 2 + 77
        lat = rng.rand(2000) * 2 + 27
        idx = knn.KNNIndex(lon, lat)
        qlon = np.r_[rng.rand(30) * 2 + 77, 76.0, 80.5]  # incl. outside
        qlat = np.r_[rng.rand(30) * 2 + 27, 26.0, 30.5]
        r = 0.07
        qi, ri, d = idx.query_radius(qlon, qlat, r)
        # brute force reference
        for q in range(len(qlon)):
            bd = np.hypot(lon - qlon[q], lat - qlat[q])
            want = np.flatnonzero(bd <= r)
            got = ri[qi == q]
            np.testing.assert_array_equal(np.sort(got), want)
            np.testing.assert_allclose(
                d[qi == q], bd[got], atol=0, rtol=0
            )
        # ordered by (query, ref index)
        assert np.all(np.diff(qi) >= 0)

    def test_k1_exact(self):
        lon = np.array([0.0, 1.0, 2.0])
        lat = np.array([0.0, 0.0, 0.0])
        idx = knn.KNNIndex(lon, lat, payload=np.array([10.0, 20.0, 30.0]))
        gi, _ = idx.query(np.array([1.2]), np.array([0.1]))
        assert idx.payload[gi[0, 0]] == 20.0

    def test_query_far_outside_extent(self):
        """ADVICE r1: a query point whose bucket is further outside the
        grid than max(nx, ny) rings must still find its true neighbor
        (the old ring cap returned -1)."""
        rng = np.random.RandomState(11)
        lon = rng.rand(500) * 0.5 + 77  # tight extent -> many rings away
        lat = rng.rand(500) * 0.5 + 28
        idx = knn.KNNIndex(lon, lat)
        # queries far outside the extent in every direction
        qlon = np.array([77.25, 90.0, 60.0, 77.25, 95.0])
        qlat = np.array([50.0, 28.25, 5.0, -40.0, 80.0])
        gi, gd = idx.query(qlon, qlat, k=1)
        bi, bd = idx.query_brute(qlon, qlat, k=1)
        assert (gi >= 0).all()
        np.testing.assert_array_equal(gi, bi)
        np.testing.assert_allclose(gd, bd, atol=1e-12)

    def test_far_outside_is_not_quadratic_in_offset(self):
        """The round-2 regression: a probe thousands of cell widths
        outside the extent must NOT walk every empty ring one bucket at
        a time (O(offset^2) Python work -- the sf0.01 correctness run
        would take hours).  Bounded work: rings are clamped to the grid
        rectangle and queries past the break-even fall back to the
        exact linear scan, so 100 far probes finish in well under a
        second and still match brute force exactly."""
        import time

        rng = np.random.RandomState(13)
        lon = rng.rand(20000) * 0.5 + 77  # cell width ~0.0035
        lat = rng.rand(20000) * 0.5 + 28
        idx = knn.KNNIndex(lon, lat)
        qlon = rng.uniform(-200, 300, 100)
        qlat = rng.uniform(-100, 150, 100)
        t0 = time.time()
        gi, gd = idx.query(qlon, qlat, k=2)
        elapsed = time.time() - t0
        bi, bd = idx.query_brute(qlon, qlat, k=2)
        np.testing.assert_array_equal(gi, bi)
        np.testing.assert_allclose(gd, bd, atol=1e-12)
        assert elapsed < 5.0, f"far-outside kNN took {elapsed:.1f}s"

    def test_ring_clamp_fuzz_matches_brute(self):
        """Clamped-perimeter ring walk: fuzz inside/near/far probes in
        every direction against the exact scan."""
        rng = np.random.RandomState(17)
        lon = rng.rand(2000) * 3 - 1.5
        lat = rng.rand(2000) * 0.2  # anisotropic extent
        idx = knn.KNNIndex(lon, lat)
        qlon = rng.uniform(-6, 6, 300)
        qlat = rng.uniform(-3, 3, 300)
        gi, gd = idx.query(qlon, qlat, k=3)
        bi, bd = idx.query_brute(qlon, qlat, k=3)
        np.testing.assert_array_equal(gi, bi)
        np.testing.assert_allclose(gd, bd, atol=1e-12)


class TestS2:
    """True spherical S2 cell ids vs an independent bit-by-bit scalar
    Hilbert descent (no lookup tables) -- the vectorized table walk
    must agree exactly."""

    @staticmethod
    def _scalar_leaf_id(lon: float, lat: float) -> np.int64:
        from tiff_to_geojson_csv_json_format_converter_ray.functions import s2

        x, y, z = s2._xyz_from_lonlat(np.array([lon]), np.array([lat]))
        face, u, v = s2._face_uv(x, y, z)
        i = int(s2._ij_from_st(s2._st_from_uv(u))[0])
        j = int(s2._ij_from_st(s2._st_from_uv(v))[0])
        f = int(face[0])
        o = f & s2._SWAP_MASK
        n = 0
        for k in range(29, -1, -1):
            ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
            pos = int(np.where(s2._POS_TO_IJ[o] == ij)[0][0])
            n = (n << 2) | pos
            o ^= int(s2._POS_TO_ORIENTATION[pos])
        return np.int64(
            np.uint64(f) << np.uint64(61) | np.uint64(n) << np.uint64(1)
            | np.uint64(1)
        )

    def test_vectorized_matches_scalar_oracle(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions import s2

        rng = np.random.RandomState(0)
        lons = np.concatenate(
            [rng.uniform(-180, 180, 150),
             [0, 90, -90, 179.999, -179.999, 45]]
        )
        lats = np.concatenate(
            [rng.uniform(-89.9, 89.9, 150), [0, 45, -45, 89.9, -89.9, 35.3]]
        )
        vec = s2.s2_cell_of(lons, lats, 30)
        for k in range(len(lons)):
            assert vec[k] == self._scalar_leaf_id(lons[k], lats[k]), (
                lons[k], lats[k],
            )

    def test_parent_hierarchy(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions import s2

        rng = np.random.RandomState(1)
        lons = rng.uniform(-180, 180, 300)
        lats = rng.uniform(-89.9, 89.9, 300)
        leaf = s2.s2_cell_of(lons, lats, 30)
        for level in (7, 8, 9, 15):
            direct = s2.s2_cell_of(lons, lats, level)
            np.testing.assert_array_equal(direct, s2.s2_parent(leaf, level))
            assert (s2.s2_level_of(direct) == level).all()

    def test_all_faces_reached(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions import s2

        lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lats = np.array([0.0, 0.0, 89.99, 0.0, 0.0, -89.99])
        faces = (
            s2.s2_cell_of(lons, lats, 30).view(np.uint64) >> np.uint64(61)
        ).astype(int)
        assert sorted(faces.tolist()) == [0, 1, 2, 3, 4, 5]

    def test_locality(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions import s2

        a = s2.s2_cell_of(np.array([77.2]), np.array([28.6]), 9)
        b = s2.s2_cell_of(np.array([77.2000001]), np.array([28.6000001]), 9)
        far = s2.s2_cell_of(np.array([-120.0]), np.array([-40.0]), 9)
        assert a[0] == b[0] != far[0]


class TestBallTree:
    def test_matches_brute_on_clustered(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.knn import (
            BallTree,
        )

        rng = np.random.RandomState(5)
        lon = np.concatenate([77.2 + rng.randn(2000) * 0.01, 77 + rng.rand(1000) * 2])
        lat = np.concatenate([28.6 + rng.randn(2000) * 0.01, 27 + rng.rand(1000) * 2])
        bt = BallTree(lon, lat)
        idx = knn.KNNIndex(lon, lat)
        qlon, qlat = rng.rand(30) * 2 + 77, rng.rand(30) * 2 + 27
        ti, td = bt.query(qlon, qlat, k=3)
        bi, bd = idx.query_brute(qlon, qlat, k=3)
        np.testing.assert_allclose(td, bd, atol=1e-12)
        np.testing.assert_array_equal(np.sort(ti, 1), np.sort(bi, 1))

    def test_single_leaf(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.knn import (
            BallTree,
        )

        bt = BallTree(np.array([1.0, 2.0]), np.array([0.0, 0.0]))
        i, d = bt.query(np.array([1.9]), np.array([0.0]))
        assert i[0, 0] == 1


class TestZOrder:
    def test_same_grid_as_cells(self):
        rng = np.random.RandomState(2)
        lon = -180 + rng.rand(500) * 360
        lat = -90 + rng.rand(500) * 180
        for res in (7, 9):
            z = cells.zorder_of(lon, lat, res)
            c = cells.cell_of(lon, lat, res)
            _, iy, ix = cells.unpack(c)
            # de-interleave and compare
            dx = np.zeros(len(z), dtype=np.int64)
            dy = np.zeros(len(z), dtype=np.int64)
            body = z & ((np.int64(1) << np.int64(56)) - 1)
            for b in range(res + 8):
                dx |= ((body >> np.int64(2 * b)) & 1) << np.int64(b)
                dy |= ((body >> np.int64(2 * b + 1)) & 1) << np.int64(b)
            np.testing.assert_array_equal(dx, ix)
            np.testing.assert_array_equal(dy, iy)

    def test_locality(self):
        # points in a tight box share long z-prefixes: the id RANGE of
        # the box is far smaller than the global id space
        rng = np.random.RandomState(3)
        lon = 77.0 + rng.rand(200) * 0.02
        lat = 28.0 + rng.rand(200) * 0.02
        z = cells.zorder_of(lon, lat, 9)
        span = int(z.max() - z.min())
        world = cells.zorder_of(
            np.array([-179.9, 179.9]), np.array([-89.9, 89.9]), 9
        )
        assert span < int(world[1] - world[0]) / 1e6


class TestHashing:
    def test_rolling_equals_direct(self):
        t = "the quick brown fox jumps"
        h = hashing.char_shingle_hashes(t, k=5)
        assert len(h) == len(t.encode()) - 4
        # shifted recompute of one shingle matches
        h2 = hashing.char_shingle_hashes(t[3:8], k=5)
        assert h[3] == h2[0]

    def test_minhash_similarity(self):
        mh = hashing.MinHasher(num_perm=128)
        a = hashing.char_shingle_hashes("the quick brown fox jumps over the lazy dog")
        b = hashing.char_shingle_hashes("the quick brown fox jumps over the lazy cat")
        c = hashing.char_shingle_hashes("completely different text with no overlap at all")
        sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
        sim_ab = (sa == sb).mean()
        sim_ac = (sa == sc).mean()
        true_ab = hashing.jaccard(a, b)
        assert abs(sim_ab - true_ab) < 0.15
        assert sim_ab > 0.5 > sim_ac

    def test_band_keys_identical_docs_collide(self):
        mh = hashing.MinHasher(num_perm=64)
        h = hashing.char_shingle_hashes("some document text here")
        k1 = mh.band_keys(mh.signature(h), bands=8)
        k2 = mh.band_keys(mh.signature(h.copy()), bands=8)
        np.testing.assert_array_equal(k1, k2)

    def test_simhash_near(self):
        ta = hashing.fnv1a_array("the quick brown fox jumps over lazy dog".split())
        tb = hashing.fnv1a_array("the quick brown fox jumps over lazy cat".split())
        tc = hashing.fnv1a_array("totally unrelated words appear in this one".split())
        d_ab = hashing.hamming64(
            np.array([hashing.simhash(ta)]), np.array([hashing.simhash(tb)])
        )[0]
        d_ac = hashing.hamming64(
            np.array([hashing.simhash(ta)]), np.array([hashing.simhash(tc)])
        )[0]
        assert d_ab < d_ac

    def test_winnow_deterministic(self):
        f1 = hashing.winnow_fingerprint("a reasonably long document body " * 5)
        f2 = hashing.winnow_fingerprint("a reasonably long document body " * 5)
        np.testing.assert_array_equal(f1, f2)


class TestText:
    def test_extract_roundtrip(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import gen_pages

        t = gen_pages(300)
        htmls = t["html"].to_pylist()
        golden = t["text"].to_pylist()
        for h, g in zip(htmls, golden):
            assert text.extract_text(h) == g  # byte-identical invariant

    def test_extract_geo(self):
        h = b'<html><body><p>x</p><span class="geo">28.600000,77.200000</span></body></html>'
        assert text.extract_geo(h) == (28.6, 77.2)
        assert text.extract_geo(b"<html><body><p>x</p></body></html>") is None

    def test_lang_id(self):
        assert text.detect_language("the cat is on the mat and it is happy") == "en"
        assert text.detect_language("der hund ist nicht auf der matte und die katze") == "de"
        assert text.detect_language("तेज भूरी लोमड़ी कूदती है") == "hi"
        assert text.detect_language("zxcv qwer asdf") == "zz"

    def test_token_count(self):
        assert text.token_count("a b  c") == 3
        assert text.token_count("hello, world!", mode="bpe") >= 3

    def test_quality_features(self):
        f = text.quality_features("The quick brown fox jumps over the lazy dog.")
        assert f["n_tokens"] == 9.0
        assert 0.0 < f["quality"] <= 1.0
        assert text.quality_features("")["quality"] == 0.0


class TestMatch:
    """Goldens = the scenario expectations of test_dynamic_patterns.py:20-51."""

    def test_scenarios(self):
        cases = [
            ("delhi_elevation", ["delhi_mosaic", "mumbai_data", "bangalore_slope"], "delhi_mosaic"),
            ("mumbai_satellite", ["mumbai_landsat_mosaic", "delhi_elevation", "chennai_aerial"], "mumbai_landsat_mosaic"),
            ("slope_analysis", ["gradient_mosaic", "elevation_dem", "aspect_data"], "gradient_mosaic"),
            ("bangalore_roads", ["bengaluru_transportation_mosaic", "delhi_data", "mumbai_info"], "bengaluru_transportation_mosaic"),
            ("unknown_layer", ["some_mosaic", "other_composite", "random_data"], "some_mosaic"),
            ("nonexistent_layer", ["completely_different", "totally_unrelated", "nothing_matches"], None),
        ]
        for requested, available, expected in cases:
            assert match.find_layer_by_patterns(requested, available) == expected

    def test_case_sensitivity_flag(self):
        cfg = dict(match.DEFAULT_CONFIG)
        assert match.find_layer_by_patterns("DELHI_ELEVATION", ["DELHI_MOSAIC"], cfg) == "DELHI_MOSAIC"

    def test_pattern_config_mutation_roundtrip(self, tmp_path):
        """layer_pattern_manager.py:57-114 semantics: add/remove/list/
        fallback mutations persist through save/load."""
        path = tmp_path / "cfg.json"
        cfg = match.load_config(str(path))  # missing file -> default
        match.add_pattern(cfg, "location_patterns", "goa", ["goa", "mosaic"])
        match.add_fallback(cfg, "stitched")
        match.save_config(cfg, path)

        cfg2 = match.load_config(str(path))
        assert cfg2["layer_pattern_config"]["location_patterns"]["goa"] == [
            "goa", "mosaic",
        ]
        assert "stitched" in cfg2["fallback_patterns"]
        assert match.find_layer_by_patterns(
            "goa_dem", ["goa_tiles_2024", "x"], cfg2
        ) == "goa_tiles_2024"
        assert match.remove_pattern(cfg2, "location_patterns", "goa")
        assert not match.remove_pattern(cfg2, "location_patterns", "goa")
        assert match.remove_fallback(cfg2, "stitched")
        assert not match.remove_fallback(cfg2, "stitched")
        listed = match.list_patterns(cfg2, "location_patterns")
        assert "goa" not in listed["categories"]["location_patterns"]
        # load_config(None) hands out a COPY: mutating it never leaks
        # into the module default
        c = match.load_config(None)
        match.add_pattern(c, "location_patterns", "leak", ["x"])
        assert "leak" not in match.DEFAULT_CONFIG["layer_pattern_config"][
            "location_patterns"
        ]

    def test_patterns_cli(self, tmp_path):
        from tiff_to_geojson_csv_json_format_converter_ray.__main__ import main

        cfg = str(tmp_path / "cfg.json")
        assert main(["patterns", "--config", cfg, "add",
                     "--category", "location_patterns", "--term", "goa",
                     "--matches", "goa,mosaic"]) == 0
        assert main(["patterns", "--config", cfg, "test",
                     "--requested", "goa_dem",
                     "--available", "goa_tiles,x"]) == 0
        assert main(["patterns", "--config", cfg, "remove",
                     "--category", "location_patterns", "--term", "goa"]) == 0
        assert main(["patterns", "--config", cfg, "remove",
                     "--category", "location_patterns", "--term", "goa"]) == 1


class TestClipArea:
    def _poly(self, pts, pid="p"):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            Polygon,
        )
        return Polygon(pid, [np.asarray(pts, dtype=np.float64)])

    def test_area_shoelace(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            Polygon, polygon_area,
        )
        sq = self._poly([(0, 0), (2, 0), (2, 2), (0, 2)])
        assert polygon_area(sq) == pytest.approx(4.0)
        # with a 1x1 hole
        holed = Polygon("h", [
            np.array([(0, 0), (2, 0), (2, 2), (0, 2)], dtype=float),
            np.array([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)], dtype=float),
        ])
        assert polygon_area(holed) == pytest.approx(3.0)

    def test_clip_rect_rect_exact(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            clip_polygon_convex, polygon_area,
        )
        a = self._poly([(0, 0), (4, 0), (4, 4), (0, 4)])
        b = self._poly([(2, 2), (6, 2), (6, 6), (2, 6)])
        got = clip_polygon_convex(a, b)
        assert polygon_area(got) == pytest.approx(4.0)  # 2x2 overlap
        # clockwise clip ring gives the same result (normalized)
        b_cw = self._poly([(2, 2), (2, 6), (6, 6), (6, 2)])
        assert polygon_area(clip_polygon_convex(a, b_cw)) == pytest.approx(4.0)

    def test_disjoint_returns_none(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            clip_polygon_convex,
        )
        a = self._poly([(0, 0), (1, 0), (1, 1), (0, 1)])
        b = self._poly([(5, 5), (6, 5), (6, 6), (5, 6)])
        assert clip_polygon_convex(a, b) is None

    def test_clip_area_matches_pip_grid_oracle(self):
        """Clipped-polygon area == dense-grid measure of {in A and in B}
        (free numerical oracle using the independent PIP kernel)."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            clip_polygon_convex, polygon_area,
        )
        rng = np.random.RandomState(2)
        for _ in range(5):
            # random convex clip (sorted angles on a circle), random quad subject
            ang = np.sort(rng.rand(6) * 2 * np.pi)
            cx, cy = 0.5 + rng.rand() * 0.2, 0.5 + rng.rand() * 0.2
            r0 = 0.25 + rng.rand() * 0.2
            clip = self._poly(
                np.c_[cx + r0 * np.cos(ang), cy + r0 * np.sin(ang)], "clip"
            )
            ang2 = np.sort(rng.rand(4) * 2 * np.pi)
            subj = self._poly(
                np.c_[0.5 + 0.4 * np.cos(ang2), 0.5 + 0.4 * np.sin(ang2)], "s"
            )
            got = clip_polygon_convex(subj, clip)
            area = polygon_area(got) if got is not None else 0.0
            g = np.linspace(0, 1, 401)
            gx, gy = np.meshgrid(g, g)
            gx, gy = gx.ravel(), gy.ravel()
            want = (
                (subj.contains(gx, gy) & clip.contains(gx, gy)).mean()
            )  # fraction of the unit square
            assert area == pytest.approx(want, abs=6e-3)


class TestFocalMean:
    def test_matches_brute(self):
        rng = np.random.RandomState(4)
        lon = rng.uniform(77.0, 77.5, 3000)
        lat = rng.uniform(28.0, 28.5, 3000)
        ids, n = np.unique(cells.cell_of(lon, lat, 8), return_counts=True)
        vals = n.astype(np.float64)
        got = cells.focal_mean(ids, vals, k=1)
        _, iy, ix = cells.unpack(ids)
        for i in range(len(ids)):
            near = (np.abs(ix - ix[i]) <= 1) & (np.abs(iy - iy[i]) <= 1)
            assert got[i] == pytest.approx(vals[near].mean(), rel=1e-12)

    def test_no_edge_wraparound(self):
        """A cell at ix=0 must NOT pick up a same-row 'neighbor' at
        ix=max (bit-packing alias of (iy-1, max))."""
        res = 8
        maxx = 2 ** (res + 8) - 1
        ids = np.array([
            cells.pack(res, np.array([5]), np.array([0]))[0],
            cells.pack(res, np.array([4]), np.array([maxx]))[0],
        ])
        vals = np.array([10.0, 99.0])
        got = cells.focal_mean(ids, vals, k=1)
        assert got[0] == pytest.approx(10.0)  # alone in its window
        assert got[1] == pytest.approx(99.0)


class TestBilinear:
    T = (0.01, 0.0, 77.0, 0.0, -0.01, 29.0)

    def test_weights_sum_and_center_exact(self):
        rng = np.random.RandomState(6)
        lon = 77.0 + rng.rand(100) * 0.9
        lat = 28.1 + rng.rand(100) * 0.8
        rows, cols, w = affine.bilinear_weights(self.T, lon, lat)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
        # a probe exactly at a pixel center gets weight 1 on that pixel
        r5, c5, w5 = affine.bilinear_weights(
            self.T, np.array([77.0 + 0.01 * 11.5]), np.array([29.0 - 0.01 * 23.5])
        )
        i = int(np.argmax(w5[0]))
        assert w5[0, i] == pytest.approx(1.0)
        assert (rows.shape, cols.shape, w.shape) == ((100, 4), (100, 4), (100, 4))
        assert r5[0, i] == 23 and c5[0, i] == 11

    def test_reproduces_linear_surface(self):
        """Bilinear interpolation is exact for z = a*lon + b*lat + c."""
        rng = np.random.RandomState(8)
        lon = 77.05 + rng.rand(50) * 0.8
        lat = 28.15 + rng.rand(50) * 0.7
        rows, cols, w = affine.bilinear_weights(self.T, lon, lat)
        # pixel-center coordinates of each stencil corner
        clon = 77.0 + 0.01 * (cols + 0.5)
        clat = 29.0 - 0.01 * (rows + 0.5)
        z = 3.0 * clon - 2.0 * clat + 1.0
        got = (w * z).sum(axis=1)
        want = 3.0 * lon - 2.0 * lat + 1.0
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_rejects_rotated_transform(self):
        with pytest.raises(ValueError):
            affine.bilinear_weights(
                (0.01, 0.001, 77.0, 0.0, -0.01, 29.0),
                np.array([77.1]), np.array([28.5]),
            )


class TestSimplifyDP:
    def test_spike_kept_line_dropped(self):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            simplify_dp,
        )

        x = np.array([0, 1, 2, 3, 4, 5], float)
        y = np.array([0, 0, 1.0, 0, 0, 0])
        keep = simplify_dp(x, y, 2.0)
        assert keep.tolist() == [True, False, False, False, False, True]
        keep = simplify_dp(x, y, 0.5)
        assert keep[2] and keep[0] and keep[-1]

    def test_endpoints_and_degenerate(self):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            simplify_dp,
        )

        assert simplify_dp(np.array([1.0]), np.array([2.0]), 0.1).tolist() == [True]
        assert simplify_dp(
            np.array([0.0, 3.0]), np.array([0.0, 0.0]), 0.1
        ).tolist() == [True, True]
        # closed loop: anchor == far point, falls back to point distance
        keep = simplify_dp(
            np.array([0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]), 0.5
        )
        assert keep.tolist() == [True, True, True]

    def test_within_tolerance_property(self):
        """Every dropped vertex lies within tol of the simplified
        polyline's anchor chords (the DP guarantee)."""
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            simplify_dp,
        )

        rng = np.random.default_rng(11)
        x = np.cumsum(rng.uniform(0.1, 1.0, 200))
        y = np.cumsum(rng.normal(0, 0.3, 200))
        tol = 0.4
        keep = simplify_dp(x, y, tol)
        kept = np.flatnonzero(keep)
        for a, b in zip(kept[:-1], kept[1:]):
            xs, ys = x[a + 1:b], y[a + 1:b]
            dx, dy = x[b] - x[a], y[b] - y[a]
            seg = np.hypot(dx, dy)
            d = np.abs((xs - x[a]) * dy - (ys - y[a]) * dx) / seg
            assert (d <= tol + 1e-12).all()


class TestExtractTextBatch:
    """Vectorized extract_text_batch must stay byte-identical to the
    scalar extractor (the pipeline invariant depends on it)."""

    CASES = [
        "", "no paragraphs here", "<p>simple</p>", "<P CLASS='x'>upper</P>",
        "<p>a <b>bold</b> t</p><p>two</p>", "<p>nested <p>inner</p> tail",
        "junk</p><p>after orphan close</p>", "<p>unclosed at end",
        "<p></p>", "<p>   </p>", "<p>&amp; &lt;tag&gt; &nbsp;x</p>",
        "<p>multi\n  line\t\tws\xa0and em</p>",
        "<pre>not a p</pre><p>real</p>",
        "<p x=1>attr</p><P>two</P></p><p>three</p>",
        "<p>a</p>text<p>b</p>tail with <p dangling", "<p>ends&</p>",
        "<p>a&#65;b</p>", "　<p>　ideographic　</p>",
        "<p> leading</p>", "<p>trailing </p>", "<p>dbl  space</p>",
        "<p> thin spaces ls</p>",
        "<p>A</p><p></p><p>B</p>",  # empty middle paragraph kept
    ]

    def test_batch_equals_scalar(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.functions import (
            text as T,
        )

        got = T.extract_text_batch(pa.array(self.CASES, pa.string())).to_pylist()
        for case, b in zip(self.CASES, got):
            assert b == T.extract_text(case), repr(case)

    def test_whitespace_class_is_exactly_python_isspace(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions import (
            text as T,
        )

        pyws = {chr(cp) for cp in range(0x110000) if chr(cp).isspace()}
        assert set(T._UNI_WS) == pyws
