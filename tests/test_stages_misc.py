"""Tests for the remaining stages: windows, regrid (K7), coord-swap
repair (T10), uint8 rescale (T12), GeoJSON cap (P2), A3 combine."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
    add_hopping_windows, add_session_key, add_tumbling_window,
)
from tiff_to_geojson_csv_json_format_converter_ray.stages.transform import (
    CoordSwapRepair, Uint8Rescale, rescale_uint8, looks_like_swapped,
)
from tiff_to_geojson_csv_json_format_converter_ray.sinks import regrid_points


def _events(n=100):
    base = np.datetime64("2025-07-01T00:00:00", "us")
    ts = base + np.arange(n).astype("timedelta64[m]") * 7  # every 7 min
    return pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(np.arange(n) % 5),
            "value": pa.array(np.arange(n, dtype=np.float64)),
        }
    )


class TestWindows:
    def test_tumbling_matches_duckdb(self):
        import duckdb

        t = _events(200)
        out = add_tumbling_window(t, "ts", 3600)
        con = duckdb.connect()
        con.register("e", t)
        want = con.execute(
            "SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w FROM e"
        ).fetchnumpy()["w"]
        got = out["window_start"].cast(pa.int64()).to_numpy()
        np.testing.assert_array_equal(got, want)

    def test_hopping_covers(self):
        t = _events(50)
        out = add_hopping_windows(t, "ts", width_s=3600, hop_s=1800)
        # every event appears in exactly width/hop = 2 windows
        assert out.num_rows == 2 * t.num_rows
        ts = out["ts"].cast(pa.int64()).to_numpy()
        ws = out["window_start"].cast(pa.int64()).to_numpy()
        w_us = 3600 * 1_000_000
        assert ((ts >= ws) & (ts < ws + w_us)).all()

    def test_session_gap(self):
        base = np.datetime64("2025-07-01T00:00:00", "us")
        ts = base + np.array([0, 60, 120, 4000, 4100], dtype="timedelta64[s]")
        t = pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 1, 1]),
            }
        )
        out = add_session_key(t, gap_s=1800)
        sess = out["session_id"].to_numpy()
        assert list(sess) == [0, 0, 0, 1, 1]  # 4000s gap splits

    def test_session_per_key(self):
        base = np.datetime64("2025-07-01T00:00:00", "us")
        ts = base + np.array([0, 10, 0, 10], dtype="timedelta64[s]")
        t = pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 2, 2]),
            }
        )
        out = add_session_key(t, gap_s=1800)
        by_user = {}
        for u, s in zip(out["user_id"].to_pylist(), out["session_id"].to_pylist()):
            by_user.setdefault(u, set()).add(s)
        assert len(by_user[1]) == 1 and len(by_user[2]) == 1
        assert by_user[1] != by_user[2]


class TestStreamingWindow:
    def _batch(self, secs, vals):
        base = np.datetime64("2025-07-01T00:00:00", "us")
        ts = base + np.array(secs, dtype="timedelta64[s]")
        return pa.table(
            {"ts": pa.array(ts, pa.timestamp("us")),
             "value": pa.array(np.asarray(vals, dtype=np.float64))}
        )

    def test_emit_on_watermark_and_late_policy(self):
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            StreamingTumblingAggregator,
        )

        agg = StreamingTumblingAggregator(width_s=60, allowed_lateness_s=30)
        # window [0,60) gets 2 events; nothing closes yet
        out1 = agg(self._batch([10, 50], [1.0, 2.0]))
        assert out1.num_rows == 0
        # event at 150s -> watermark 120 -> window [0,60) closes
        out2 = agg(self._batch([150], [5.0]))
        assert out2.num_rows == 1
        r = out2.to_pylist()[0]
        assert r["n"] == 2 and r["sum"] == 3.0 and r["min"] == 1.0
        # late-but-allowed event (ts=125 >= watermark 120) accepted into [120,180)
        agg(self._batch([125], [7.0]))
        assert agg.late_dropped == 0
        # too-late event (ts=100 < watermark 120) dropped + counted
        agg(self._batch([100], [9.0]))
        assert agg.late_dropped == 1
        # flush emits the open windows [120,180)
        fl = agg.flush().to_pylist()
        base_us = int(
            np.datetime64("2025-07-01T00:00:00", "us").astype("int64")
        )
        assert {r["window_start"] for r in fl} == {base_us + 120_000_000}
        assert fl[0]["n"] == 2  # events at 150s and 125s; 100s was dropped

    def test_flush_matches_batch_aggregate_when_no_late(self):
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            StreamingTumblingAggregator, add_tumbling_window,
        )

        rng = np.random.RandomState(0)
        secs = np.sort(rng.randint(0, 4000, size=300))
        vals = rng.rand(300)
        agg = StreamingTumblingAggregator(width_s=600, allowed_lateness_s=4000)
        emitted = []
        for i in range(0, 300, 50):
            emitted.append(agg(self._batch(secs[i:i+50], vals[i:i+50])))
        emitted.append(agg.flush())
        got = pa.concat_tables([t for t in emitted if t.num_rows]).to_pandas()
        got = got.sort_values("window_start").reset_index(drop=True)

        whole = add_tumbling_window(self._batch(secs, vals), "ts", 600)
        want = (
            whole.to_pandas()
            .assign(ws=lambda d: d["window_start"].astype("int64"))
            .groupby("ws")["value"]
            .agg(["count", "sum", "min", "max"])
            .reset_index()
        )
        assert got["n"].tolist() == want["count"].tolist()
        np.testing.assert_allclose(got["sum"].to_numpy(), want["sum"].to_numpy())


class TestTransforms:
    def test_rescale_uint8(self):
        z = np.array([0.0, 127.5, 255.0])
        out = rescale_uint8(z, 100.0, 300.0)
        np.testing.assert_allclose(out, [100.0, 200.0, 300.0])

    def test_uint8_rescale_stage(self):
        t = pa.table({"z": pa.array([0.0, 255.0])})
        out = Uint8Rescale(10.0, 20.0)(t)
        np.testing.assert_allclose(out["z"].to_numpy(), [10.0, 20.0])

    def test_swap_heuristic(self):
        # x in [20,35] (lat-like), y in [70,85] (lon-like) -> swapped
        assert looks_like_swapped(25.0, 75.0, 30.0, 80.0)
        assert not looks_like_swapped(75.0, 25.0, 80.0, 30.0)

    def test_coord_swap_repair_stage(self):
        t = pa.table(
            {"lon": pa.array([28.0, 29.0]), "lat": pa.array([77.0, 78.0])}
        )
        out = CoordSwapRepair()(t)
        np.testing.assert_array_equal(out["lon"].to_numpy(), [77.0, 78.0])
        np.testing.assert_array_equal(out["lat"].to_numpy(), [28.0, 29.0])
        # already-correct coords untouched
        out2 = CoordSwapRepair()(out)
        assert out2["lon"].to_numpy()[0] == 77.0


class TestRegrid:
    def test_roundtrip_extraction_inverse(self):
        """K7: points scattered back to the grid reproduce the raster
        (thiswillcompress.py:118-138 inverse)."""
        transform = [0.01, 0.0, 77.0, 0.0, -0.01, 29.0]
        h = w = 16
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        lon = 77.0 + 0.01 * (cc.ravel() + 0.5)
        lat = 29.0 - 0.01 * (rr.ravel() + 0.5)
        z = (rr * w + cc).ravel().astype(np.float64)
        pts = pa.table({"lon": lon, "lat": lat, "z": z})
        doc = regrid_points(pts, transform, h, w, nodata=-9999.0)
        grid = np.asarray(doc["elevation_grid"])
        np.testing.assert_array_equal(grid, (rr * w + cc).astype(np.float64))
        assert doc["meta"]["transform"] == transform

    def test_out_of_grid_points_dropped(self):
        transform = [0.01, 0.0, 77.0, 0.0, -0.01, 29.0]
        pts = pa.table(
            {"lon": pa.array([50.0]), "lat": pa.array([10.0]), "z": pa.array([5.0])}
        )
        doc = regrid_points(pts, transform, 4, 4, nodata=-1.0)
        assert (np.asarray(doc["elevation_grid"]) == -1.0).all()


class TestPIPModes:
    def test_filter_and_anti_partition_points(self):
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            PIPJoiner,
        )

        polys = pa.Table.from_pylist(
            [
                {
                    "polygon_id": "sq",
                    "geom_type": "Polygon",
                    "rings": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]],
                    "minx": 0.0, "miny": 0.0, "maxx": 1.0, "maxy": 1.0,
                }
            ]
        )
        rng = np.random.RandomState(0)
        pts = pa.table(
            {"lon": pa.array(rng.rand(500) * 2), "lat": pa.array(rng.rand(500) * 2)}
        )
        inside = PIPJoiner(polys, mode="filter")(pts)
        outside = PIPJoiner(polys, mode="anti")(pts)
        assert inside.num_rows + outside.num_rows == 500
        assert (inside["lon"].to_numpy() <= 1.0).all()
        joined = PIPJoiner(polys, mode="join")(pts)
        assert joined.num_rows == inside.num_rows

    def test_bbox_semijoin_explicit_cols(self):
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            BboxSemiJoin,
        )

        polys = pa.table(
            {"polygon_id": ["p"], "minx": [0.0], "miny": [0.0],
             "maxx": [1.0], "maxy": [1.0]}
        )
        rows = pa.table(
            {
                "id": pa.array([1, 2, 3]),
                "minx": pa.array([0.5, 5.0, -2.0]),
                "miny": pa.array([0.5, 5.0, -2.0]),
                "maxx": pa.array([1.5, 6.0, -1.5]),
                "maxy": pa.array([1.5, 6.0, -1.5]),
            }
        )
        out = BboxSemiJoin(polys)(rows)
        assert out["id"].to_pylist() == [1]


class TestShardedPIPJoin:
    def _polys(self):
        rows = []
        # two OVERLAPPING squares (a point inside both must match both)
        for pid, (x0, y0, x1, y1) in [
            ("a", (0.0, 0.0, 1.0, 1.0)),
            ("b", (0.5, 0.5, 1.5, 1.5)),
            ("c", (5.0, 5.0, 6.0, 6.0)),
        ]:
            rows.append(
                {
                    "polygon_id": pid, "geom_type": "Polygon",
                    "rings": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
                    "minx": x0, "miny": y0, "maxx": x1, "maxy": y1,
                }
            )
        return pa.Table.from_pylist(rows)

    def test_matches_broadcast_tier_exactly(self, ray_session):
        """The no-broadcast scale tier must emit the identical
        (point, polygon) pair set as PIPJoiner, including multi-match
        points in overlapping polygons."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            PIPJoiner, sharded_pip_join,
        )

        polys = self._polys()
        rng = np.random.RandomState(3)
        pts = pa.table(
            {
                "lon": pa.array(rng.rand(4000) * 2),
                "lat": pa.array(rng.rand(4000) * 2),
                "pix": pa.array(np.arange(4000)),
            }
        )
        b = PIPJoiner(polys)(pts)
        s_parts = [
            t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in sharded_pip_join(
                ray.data.from_arrow(pts), polys, res=7
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        s = pa.concat_tables(s_parts)
        bb = sorted(zip(b["pix"].to_pylist(), b["polygon_id"].to_pylist()))
        ss = sorted(zip(s["pix"].to_pylist(), s["polygon_id"].to_pylist()))
        assert bb == ss and len(bb) > 0
        # multi-match present in the fixture (overlap region populated)
        from collections import Counter

        assert max(Counter(p for p, _ in bb).values()) == 2

    def test_covering_contains_every_point_cell(self):
        """bbox covering uses the same clipped floor formula as
        cell_of, so any point inside the polygon shares a cell with a
        polygon replica."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions import cells as C
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            polygon_cell_covering,
        )

        polys = self._polys()
        cov = polygon_cell_covering(polys, 7)
        cov_a = {
            c for c, p in zip(cov["_cell"].to_pylist(),
                              cov["polygon_id"].to_pylist())
            if p == "a"
        }
        rng = np.random.RandomState(1)
        lon = rng.rand(2000)
        lat = rng.rand(2000)
        cells = C.cell_of(lon, lat, 7)
        assert set(cells.tolist()) <= cov_a


class TestGeoJSONBytes:
    def test_writer_matches_reference_json_dump(self, tmp_path):
        """The fast string-builder must stay byte-identical to
        json.dump of nested Feature dicts with compact separators
        (completePixleOutput.py:94-128 output format)."""
        import json

        from tiff_to_geojson_csv_json_format_converter_ray.sinks import GeoJSONSink

        rng = np.random.RandomState(1)
        n = 500
        t = pa.table(
            {
                "lon": pa.array(np.round(77 + rng.rand(n) * 2, 6)),
                "lat": pa.array(np.round(27 + rng.rand(n) * 2, 6)),
                "z": pa.array(np.round(rng.rand(n) * 100, 2)),
                "src": pa.array(["s"] * n),
            }
        )
        m = GeoJSONSink(str(tmp_path))(t)
        got = open(m["output_path"][0].as_py()).read()
        feats = [
            {"type": "Feature", "geometry": {"type": "Point",
             "coordinates": [float(a), float(b), float(c)]}}
            for a, b, c in zip(
                t["lon"].to_numpy(), t["lat"].to_numpy(), t["z"].to_numpy()
            )
        ]
        want = json.dumps(
            {
                "type": "FeatureCollection",
                "crs": {"type": "name", "properties": {"name": "EPSG:4326"}},
                "metadata": {
                    "source_file": "s",
                    "coordinate_system": "EPSG:4326 (WGS84)",
                    "total_original_points": n,
                    "geojson_points": n,
                    "note": "Coordinates: [longitude, latitude, elevation]",
                },
                "features": feats,
            },
            separators=(",", ":"),
        )
        assert got == want


class TestGeoJSONCap:
    def test_secondary_cap(self, tmp_path):
        import json

        from tiff_to_geojson_csv_json_format_converter_ray.sinks import GeoJSONSink

        n = 25_000
        t = pa.table(
            {
                "lon": pa.array(np.linspace(77, 78, n)),
                "lat": pa.array(np.linspace(28, 29, n)),
                "z": pa.array(np.arange(n, dtype=np.float64)),
                "src": pa.array(["s"] * n),
            }
        )
        sink = GeoJSONSink(str(tmp_path), max_points=10_000)
        manifest = sink(t)
        path = manifest["output_path"][0].as_py()
        doc = json.loads(open(path).read())
        # stride = 25000 // 10000 = 2 -> 12500 points (reference arith)
        assert len(doc["features"]) == 12_500
        zs = [f["geometry"]["coordinates"][2] for f in doc["features"][:5]]
        assert zs == [0.0, 2.0, 4.0, 6.0, 8.0]


class TestRadiusJoin:
    def test_matches_brute_with_payload(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            RadiusJoin,
        )

        rng = np.random.RandomState(3)
        n = 500
        ref = pa.table({
            "lon": rng.rand(n) * 1.0 + 77.0,
            "lat": rng.rand(n) * 1.0 + 28.0,
            "z": rng.rand(n) * 100.0,
        })
        probes = pa.table({
            "probe_id": pa.array(range(4), pa.int64()),
            "lon": pa.array([77.2, 77.8, 77.5, 76.5]),
            "lat": pa.array([28.2, 28.8, 28.5, 27.5]),
        })
        r = 0.12
        out = pa.concat_tables(
            b for b in ray.data.from_arrow(probes).map_batches(
                RadiusJoin(ref, radius=r, payload_cols=("z",)),
                batch_format="pyarrow", batch_size=None,
            ).iter_batches(batch_format="pyarrow")
        )
        rl = ref["lon"].to_numpy(); rt = ref["lat"].to_numpy()
        zz = ref["z"].to_numpy()
        for pid, plon, plat in zip(
            probes["probe_id"].to_pylist(),
            probes["lon"].to_pylist(), probes["lat"].to_pylist(),
        ):
            d = np.hypot(rl - plon, rt - plat)
            want = np.sort(zz[d <= r])
            got = np.sort(
                out.filter(pc.equal(out["probe_id"], pid))["nn_z"].to_numpy()
            )
            np.testing.assert_array_equal(got, want)
        # probe 3 is outside the extent: inner-join semantics
        assert out.filter(pc.equal(out["probe_id"], 3)).num_rows == 0


class TestDownsampleCells:
    def test_equals_direct_reencode(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.functions import (
            cells as C,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            downsample_cells,
        )

        rng = np.random.RandomState(9)
        n = 20000
        lon = rng.rand(n) * 0.5 + 77.0
        lat = rng.rand(n) * 0.5 + 28.0
        z = rng.rand(n) * 50.0
        t = pa.table({
            "cell_9": C.cell_of(lon, lat, 9), "z": z,
        })
        out = downsample_cells(
            ray.data.from_arrow(t), 7, from_col="cell_9", value_col="z"
        )
        # direct: group by cell_of(lon, lat, 7) in numpy
        c7 = C.cell_of(lon, lat, 7)
        got = {
            c: (cnt, mn, mx)
            for c, cnt, mn, mx in zip(
                out["cell_7"].to_pylist(), out["count"].to_pylist(),
                out["min"].to_pylist(), out["max"].to_pylist(),
            )
        }
        uniq = np.unique(c7)
        assert len(got) == len(uniq)
        for c in uniq:
            m = c7 == c
            cnt, mn, mx = got[int(c)]
            assert cnt == m.sum()
            assert mn == z[m].min()
            assert mx == z[m].max()


class TestIDW:
    def test_matches_brute_and_exact_hit(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            idw_interpolate,
        )

        rng = np.random.RandomState(17)
        n = 400
        rl = rng.rand(n) + 77.0
        rt = rng.rand(n) + 28.0
        z = rng.rand(n) * 40.0
        ref = pa.table({"lon": rl, "lat": rt, "z": z})
        # probe 2 coincides exactly with reference point 5
        probes = pa.table({
            "probe_id": pa.array(range(3), pa.int64()),
            "lon": pa.array([77.3, 77.7, float(rl[5])]),
            "lat": pa.array([28.3, 28.7, float(rt[5])]),
        })
        r = 0.15
        out = idw_interpolate(
            ray.data.from_arrow(probes), ref, radius=r, value_col="z"
        )
        got = dict(zip(out["probe_id"].to_pylist(), out["idw"].to_pylist()))
        for pid, plon, plat in [(0, 77.3, 28.3), (1, 77.7, 28.7)]:
            d = np.hypot(rl - plon, rt - plat)
            m = (d <= r) & (d > 0)
            w = 1.0 / (d[m] * d[m])
            np.testing.assert_allclose(
                got[pid], np.sum(w * z[m]) / np.sum(w), rtol=1e-12
            )
        # exact hit returns the hit's value, not nan
        assert got[2] == pytest.approx(float(z[5]), abs=0)


class TestIntervalJoin:
    """Range join kernel: brute-force parity + multi-match + empties."""

    def _brute(self, ts, starts, ends, ids):
        exp = set()
        for i, t in enumerate(ts):
            for j in range(len(starts)):
                if starts[j] <= t < ends[j]:
                    exp.add((i, int(ids[j])))
        return exp

    def test_matches_brute_force_overlapping(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            IntervalJoin,
        )

        rng = np.random.RandomState(3)
        starts = np.sort(rng.randint(0, 1000, 40)).astype(np.int64)
        ends = starts + rng.randint(1, 150, 40).astype(np.int64)
        ids = np.arange(40, dtype=np.int64) * 7
        ij = IntervalJoin(
            pa.table({"interval_id": ids, "start_ts": starts, "end_ts": ends})
        )
        ts = rng.randint(-100, 1200, 800).astype(np.int64)
        out = ij(pa.table({"row": np.arange(800, dtype=np.int64), "ts": ts}))
        got = set(zip(out["row"].to_pylist(), out["interval_id"].to_pylist()))
        assert got == self._brute(ts, starts, ends, ids)
        # multi-match: at least one probe inside >= 2 intervals exists
        from collections import Counter

        assert max(Counter(out["row"].to_pylist()).values()) >= 2

    def test_no_match_empty_and_boundaries(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            IntervalJoin,
        )

        ij = IntervalJoin(
            pa.table(
                {
                    "interval_id": pa.array([5], pa.int64()),
                    "start_ts": pa.array([10], pa.int64()),
                    "end_ts": pa.array([20], pa.int64()),
                }
            )
        )
        out = ij(
            pa.table({"row": pa.array([0, 1, 2, 3], pa.int64()),
                      "ts": pa.array([9, 10, 19, 20], pa.int64())})
        )
        # half-open [start, end): 10 and 19 match, 9 and 20 don't
        assert out["row"].to_pylist() == [1, 2]
        assert out["interval_id"].to_pylist() == [5, 5]


class TestBloomSemiJoin:
    def test_no_false_negatives_and_prunes(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            BloomFilter,
            BloomSemiJoin,
        )

        rng = np.random.RandomState(11)
        keys = rng.randint(0, 1 << 40, 4000).astype(np.int64)
        bf = BloomFilter(keys)
        assert bf.contains(keys).all()  # never a false negative
        probe = rng.randint(0, 1 << 40, 50000).astype(np.int64)
        truth = np.isin(probe, keys)
        hits = bf.contains(probe)
        assert hits[truth].all()
        fp = (hits & ~truth).sum() / max((~truth).sum(), 1)
        assert fp < 0.02  # 12 bits/key, 5 hashes

        sj = BloomSemiJoin(pa.table({"k": keys[:500]}), on="v")
        out = sj(pa.table({"v": probe}))
        exp = np.isin(probe, np.unique(keys[:500]))
        assert out["v"].to_pylist() == probe[exp].tolist()
        # the bloom prefilter must have pruned the vast majority before
        # the exact verify ever ran
        assert sj.bloom_pass < 0.05 * sj.seen

    def test_exact_off_is_superset(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            BloomSemiJoin,
        )

        rng = np.random.RandomState(12)
        keys = rng.randint(0, 1 << 30, 200).astype(np.int64)
        probe = rng.randint(0, 1 << 30, 5000).astype(np.int64)
        loose = BloomSemiJoin(pa.table({"k": keys}), on="v", exact=False)
        tight = BloomSemiJoin(pa.table({"k": keys}), on="v", exact=True)
        lset = set(loose(pa.table({"v": probe}))["v"].to_pylist())
        tset = set(tight(pa.table({"v": probe}))["v"].to_pylist())
        assert tset <= lset


class TestPartitionedIntervalJoin:
    def test_matches_broadcast_tier_exactly(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            IntervalJoin,
            partitioned_interval_join,
        )

        rng = np.random.RandomState(21)
        starts = np.sort(rng.randint(0, 100_000, 60)).astype(np.int64)
        ends = starts + rng.randint(1, 9_000, 60).astype(np.int64)
        ids = np.arange(60, dtype=np.int64)
        iv = pa.table({"interval_id": ids, "start_ts": starts, "end_ts": ends})
        ts = rng.randint(-5_000, 110_000, 3000).astype(np.int64)
        stream = pa.table(
            {"row": np.arange(3000, dtype=np.int64), "ts": ts}
        )

        bc = IntervalJoin(iv)(stream)
        want = sorted(zip(bc["row"].to_pylist(), bc["interval_id"].to_pylist()))

        # span deliberately smaller than max interval length -> real
        # replication across partitions, and negative-ts partitions
        out = partitioned_interval_join(
            ray.data.from_arrow(stream).repartition(7),
            ray.data.from_arrow(iv).repartition(3),
            span_us=4_000,
        )
        tbl = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
             if b.num_rows]
        )
        got = sorted(zip(tbl["row"].to_pylist(), tbl["interval_id"].to_pylist()))
        assert got == want


class TestGroupedExactQuantiles:
    def test_matches_numpy_disc_selection(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            grouped_exact_quantiles,
        )

        rng = np.random.RandomState(5)
        g = rng.choice(list("abcd"), 5000)
        v = np.round(rng.randn(5000) * 100, 3)
        ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(6)
        qs = [0.25, 0.5, 0.95]
        out = pa.concat_tables(
            list(
                grouped_exact_quantiles(ds, "g", "v", qs).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        ).to_pydict()
        got = {
            (k, q): val
            for k, q, val in zip(out["g"], out["q"], out["value"])
        }
        for key in "abcd":
            sv = np.sort(v[g == key])
            n = len(sv)
            for q in qs:
                want = sv[min(max(int(np.ceil(q * n)) - 1, 0), n - 1)]
                assert got[(key, q)] == want


class TestTfIdf:
    def test_hand_example_and_zero_token_docs(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            TfIdfScore,
            _explode_tokens,
        )

        # idf chosen by hand; doc 3 (whitespace only) must emit no row
        idf = pa.table({"token": ["a", "b"], "idf": [0.5, 1.0]})
        b = pa.table(
            {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": ["a b a", "b", "   "]}
        )
        out = TfIdfScore(idf)(b).sort_by("doc_id").to_pydict()
        assert out["doc_id"] == [1, 2]
        # doc1: (2/3)*0.5 + (1/3)*1.0 = 0.666667 ; doc2: 1.0
        assert out["tfidf"] == [0.666667, 1.0]

    def test_doc_frequencies_batch_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            token_doc_frequencies,
        )

        tbl = pa.table(
            {"doc_id": pa.array(range(8), pa.int64()),
             "text": ["a a b", "b c", "a", "c c c", "d", "a d", "", "b a"]}
        )
        want = {"a": 4, "b": 3, "c": 2, "d": 2}
        for parts in (1, 4):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            got = token_doc_frequencies(ds).to_pydict()
            assert dict(zip(got["token"], got["df"])) == want


class TestKeyedWindowFunctions:
    def test_kernel_hand_example(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_window_kernel,
        )

        # one key, deliberately unsorted input; ts in us
        g = pa.table(
            {
                "user_id": pa.array([7, 7, 7, 7], pa.int64()),
                "event_id": pa.array([3, 1, 2, 4], pa.int64()),
                "ts": pa.array([3_000_000, 1_000_000, 2_000_000, 4_000_000],
                               pa.timestamp("us")),
                "cents": pa.array([300, 100, 200, 400], pa.int64()),
            }
        )
        out = keyed_window_kernel(g).to_pydict()
        assert out["event_id"] == [1, 2, 3, 4]
        assert out["rn"] == [1, 2, 3, 4]
        assert out["cum_cents"] == [100, 300, 600, 1000]
        assert out["delta_us"] == [None, 1_000_000, 1_000_000, 1_000_000]
        # trailing 3-row avg of cents / 100
        assert out["mov_avg3"] == [1.0, 1.5, 2.0, 3.0]

    def test_partitioning_invariant(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_window_functions,
        )

        rng = np.random.default_rng(11)
        n = 400
        tbl = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
                "ts": pa.array(rng.integers(0, 10**9, n), pa.timestamp("us")),
                "value": pa.array(rng.uniform(-50, 50, n)),
            }
        )

        def run(parts):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            t = pa.concat_tables(
                [b for b in keyed_window_functions(ds).iter_batches(
                    batch_format="pyarrow", batch_size=None)]
            )
            return t.sort_by([("user_id", "ascending"), ("event_id", "ascending")])

        a, b = run(1), run(7)
        assert a.equals(b)
        # spot-check: per-user rn is 1..count
        d = a.to_pydict()
        import collections
        cnt = collections.Counter(d["user_id"])
        last = {}
        for u, rn in zip(d["user_id"], d["rn"]):
            last[u] = max(last.get(u, 0), rn)
        assert all(last[u] == c for u, c in cnt.items())


class TestPivotRollup:
    def test_pivot_counts_and_sums(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            pivot_wide,
        )

        tbl = pa.table(
            {
                "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
                "cat": ["a", "b", "a", "a", "c"],
                "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
            }
        )
        for parts in (1, 3):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = pivot_wide(ds, "k", "cat", value_col="v")
            d = {r["k"]: r for r in out.sort_by("k").to_pylist()}
            assert d[1]["n_a"] == 1 and d[1]["sum_a"] == 10
            assert d[1]["n_b"] == 1 and d[1]["sum_b"] == 20
            assert d[1]["n_c"] == 0 and d[1]["sum_c"] == 0
            assert d[2]["n_a"] == 2 and d[2]["sum_a"] == 70
            assert d[2]["n_c"] == 1 and d[2]["sum_c"] == 50
        # discovered categories == sorted distinct
        assert [c for c in out.column_names if c.startswith("n_")] == [
            "n_a", "n_b", "n_c"
        ]

    def test_rollup_levels(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            rollup_aggregate,
        )

        tbl = pa.table(
            {
                "a": ["x", "x", "y"],
                "b": ["p", "q", "p"],
                "v": pa.array([1, 2, 4], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        out = rollup_aggregate(
            ds, ["a", "b"],
            [("v", "count", "n"), ("v", "sum", "s"), ("v", "min", "mn"),
             ("v", "max", "mx")],
        )
        rows = {
            (r["a"], r["b"]): (r["n"], r["s"], r["mn"], r["mx"])
            for r in out.to_pylist()
        }
        assert rows[("x", "p")] == (1, 1, 1, 1)
        assert rows[("x", "q")] == (1, 2, 2, 2)
        assert rows[("y", "p")] == (1, 4, 4, 4)
        assert rows[("x", None)] == (2, 3, 1, 2)
        assert rows[("y", None)] == (1, 4, 4, 4)
        assert rows[(None, None)] == (3, 7, 1, 4)
        assert len(rows) == 6


class TestJsonProbe:
    def test_int_and_str_probe_edges(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.functions.text import (
            json_probe_int, json_probe_str,
        )

        col = pa.array(
            ['{"k": 69}', '{"k": -3, "x": "y"}', '{}', None,
             '{"k": "notint"}', '{ "k" :  7 }']
        )
        assert json_probe_int(col, "k").to_pylist() == [69, -3, None, None,
                                                        None, 7]
        assert json_probe_str(col, "x").to_pylist() == [None, "y", None,
                                                        None, None, None]


class TestFunnel:
    def test_kernel_strict_order(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            funnel_kernel,
        )

        def mk(types, ts):
            return pa.table(
                {"event_type": pa.array(types, pa.string()),
                 "ts": pa.array(ts, pa.timestamp("us"))}
            )

        steps = ["view", "click", "purchase"]
        # full funnel in order
        g = mk(["view", "click", "purchase"], [1, 2, 3])
        assert funnel_kernel(g, steps)["depth"].to_pylist() == [3]
        # click before view does not count
        g = mk(["click", "view"], [1, 2])
        assert funnel_kernel(g, steps)["depth"].to_pylist() == [1]
        # tie (same ts) must NOT advance (strict >)
        g = mk(["view", "click"], [5, 5])
        assert funnel_kernel(g, steps)["depth"].to_pylist() == [1]
        # no step events at all
        g = mk(["error"], [1])
        assert funnel_kernel(g, steps)["depth"].to_pylist() == [0]

    def test_counts_monotone(self, ray_session, sf_dir):
        import os
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            funnel_counts,
        )

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts"],
        )
        out = funnel_counts(ds, ["view", "click", "purchase"]).to_pydict()
        n = out["n_reached"]
        assert out["step"] == ["view", "click", "purchase"]
        assert n[0] >= n[1] >= n[2] >= 0


class TestGroupedStringAggCorr:
    def test_string_agg_ordered(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_string_agg,
        )

        tbl = pa.table(
            {"g": pa.array([1, 1, 2, 1], pa.int64()),
             "name": ["b", "c", "z", "a"],
             "ord": pa.array([2, 3, 1, 1], pa.int64())}
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        out = grouped_string_agg(ds, "g", "name", "ord")
        d = dict(zip(out["g"].to_pylist(), out["agg"].to_pylist()))
        assert d == {1: "a,b,c", 2: "z"}

    def test_grouped_corr_matches_numpy_and_partitioning(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_corr,
        )

        rng = np.random.default_rng(9)
        n = 2000
        g = rng.integers(0, 3, n)
        x = rng.integers(1, 100, n)
        y = (2 * x + rng.integers(0, 50, n)).astype(np.int64)
        tbl = pa.table({"g": pa.array(g.astype(np.int64)),
                        "x": pa.array(x.astype(np.int64)), "y": pa.array(y)})

        def run(parts):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = grouped_corr(ds, "g", "x", "y")
            return dict(zip(out["g"].to_pylist(), out["corr"].to_pylist()))

        a, b = run(1), run(5)
        assert a == b  # exact moments -> identical at any partitioning
        for gv in (0, 1, 2):
            m = g == gv
            want = np.corrcoef(x[m], y[m])[0, 1]
            assert abs(a[gv] - want) < 1e-6


class TestNgramRepetition:
    def test_hand_example_and_short_docs(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            ngram_repetition,
        )

        b = pa.table(
            {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
             "text": ["a b a b a  x", "p q", " a a a a ", ""]}
        )
        out = ngram_repetition(b).sort_by("doc_id").to_pydict()
        # doc1: 4 trigrams, 3 distinct -> 0.25; doc2/4: <3 tokens -> no row
        # doc3: 'a a a' x2 -> dup 0.5
        assert out["doc_id"] == [1, 3]
        assert out["dup3"] == [0.25, 0.5]

    def test_no_cross_doc_trigrams(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            ngram_repetition,
        )

        # identical tails across adjacent docs must not form trigrams
        b = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": ["x y", "z x y"]}
        )
        out = ngram_repetition(b).to_pydict()
        assert out["doc_id"] == [2]  # doc1 has only 2 tokens
        assert out["dup3"] == [0.0]


class TestKMeans:
    def test_partition_invariant_and_separates_blobs(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
            kmeans_cluster_counts, kmeans_fit,
        )

        # two well-separated unit-vector blobs in 8d
        rng = np.random.default_rng(2)
        n = 300
        a = np.tile([1.0, 0, 0, 0, 0, 0, 0, 0], (n, 1)) + rng.normal(0, .05, (n, 8))
        b = np.tile([0, 1.0, 0, 0, 0, 0, 0, 0], (n, 1)) + rng.normal(0, .05, (n, 8))
        x = np.vstack([a, b])
        tbl = pa.table(
            {"vec_id": pa.array(np.arange(2 * n, dtype=np.int64)),
             "embedding": pa.array([row.tolist() for row in x],
                                   pa.list_(pa.float32()))}
        )

        def run(parts):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            return kmeans_cluster_counts(ds, k=2, iters=4, seed=1).to_pydict()

        r1, r5 = run(1), run(5)
        assert r1 == r5  # int64-quantized sums -> partitioning-exact
        assert sorted(r1["n"]) == [n, n]  # blobs recovered exactly

        c = kmeans_fit(
            ray.data.from_arrow(tbl), k=2, iters=4, seed=1
        )
        # centroids align with the blob axes
        tops = {int(np.argmax(np.abs(row))) for row in c}
        assert tops == {0, 1}


class TestTileSlope:
    """Halo-exchange Horn focal operator (stages/raster.py)."""

    def _whole_array_horn(self, vals, nodata_thresh=-1e30, res=0.01):
        import numpy as np

        h, w = vals.shape
        pad = np.full((h + 2, w + 2), np.nan)
        pad[1:-1, 1:-1] = vals.astype(np.float64)
        za, zb, zc = pad[0:h, 0:w], pad[0:h, 1:w+1], pad[0:h, 2:w+2]
        zd, ze, zf = pad[1:h+1, 0:w], pad[1:h+1, 1:w+1], pad[1:h+1, 2:w+2]
        zg, zh, zi = pad[2:h+2, 0:w], pad[2:h+2, 1:w+1], pad[2:h+2, 2:w+2]
        stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
        valid = np.all(np.isfinite(stack) & (stack > nodata_thresh), axis=0)
        p = ((zc + 2.0*zf + zi) - (za + 2.0*zd + zg)) / (8.0 * res)
        q = ((zg + 2.0*zh + zi) - (za + 2.0*zb + zc)) / (8.0 * res)
        slope = 100.0 * np.sqrt(p*p + q*q)
        aspect = np.degrees(np.arctan2(q, -p))
        rr, cc = np.nonzero(valid)
        return {(int(r), int(c)): (slope[r, c], aspect[r, c]) for r, c in zip(rr, cc)}

    def test_halo_exchange_matches_whole_array(self, ray_session):
        """Distributed tiles (with strips crossing every interior
        boundary) reproduce the single-array Horn result exactly,
        slope AND aspect."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_slope,
        )

        tiles = entry._og_tiles_table(sparse_invalid=True, tile=24)
        out_parts = [
            b for b in tile_slope(ray.data.from_arrow(tiles)).iter_batches(
                batch_format="pyarrow", batch_size=None)
        ]
        out = pa.concat_tables(
            [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
             for t in out_parts if t.num_rows]
        )
        got = {
            (r, c): (s, a)
            for r, c, s, a in zip(
                out["row"].to_pylist(), out["col"].to_pylist(),
                out["slope_pct"].to_pylist(), out["aspect_deg"].to_pylist())
        }

        # rebuild the full 96x96 array from the tile fixture
        full = np.full((96, 96), np.nan, np.float32)
        for i in range(tiles.num_rows):
            r0 = tiles["row_off"][i].as_py()
            c0 = tiles["col_off"][i].as_py()
            hh = tiles["height"][i].as_py()
            ww = tiles["width"][i].as_py()
            full[r0:r0+hh, c0:c0+ww] = np.asarray(
                tiles["values"][i].as_py(), np.float32).reshape(hh, ww)
        want = self._whole_array_horn(full)

        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]  # slope bit-exact
            assert got[k][1] == want[k][1]  # aspect bit-exact

    def test_interior_pixels_need_halo(self, ray_session):
        """Pixels on interior tile boundaries appear in the output --
        i.e. the halo actually crossed the shuffle (a no-halo version
        would drop rows 23,24,47,... entirely)."""
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_slope,
        )

        tiles = entry._og_tiles_table(sparse_invalid=True, tile=24)
        out = tile_slope(ray.data.from_arrow(tiles)).to_pandas()
        boundary_rows = out[out["row"].isin([23, 24, 47, 48, 71, 72])]
        assert len(boundary_rows) > 100


class TestParetoAndRobustStats:
    def test_pareto_partition_invariant_and_bruteforce(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            pareto_frontier,
        )

        rng = np.random.default_rng(7)
        q = rng.integers(1, 30, 400).astype(np.float64)
        p = rng.integers(1, 1000, 400).astype(np.float64)
        t = pa.table({"q": pa.array(q), "p": pa.array(p)})

        def brute(qs, ps):
            pts = set(zip(qs, ps))
            keep = []
            for a in pts:
                dom = any(
                    b[0] >= a[0] and b[1] <= a[1] and b != a
                    and (b[0] > a[0] or b[1] < a[1])
                    for b in pts
                )
                # min-per-q reduction: a point with equal q but higher p
                # is dominated too (strictness via p)
                if not dom:
                    keep.append(a)
            return sorted(keep)

        want = brute(q, p)
        for parts in (1, 9):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = pareto_frontier(ds, "q", "p").to_pandas()
            got = sorted(zip(out["q"], out["p"]))
            assert got == want

    def test_grouped_mad_matches_duckdb(self, ray_session):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            grouped_mad,
        )

        rng = np.random.default_rng(3)
        k = np.array(["a", "b"])[rng.integers(0, 2, 501)]
        v = rng.integers(0, 100, 501).astype(np.float64)
        t = pa.table({"k": pa.array(k), "v": pa.array(v)})
        out = (
            collect_tables(grouped_mad(ray.data.from_arrow(t).repartition(5), "k", "v"))
            .to_pandas().set_index("k")["mad"]
        )
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        want = con.execute(
            "SELECT k, MAD(v) AS m FROM t GROUP BY 1"
        ).df().set_index("k")["m"]
        for key in ("a", "b"):
            assert out[key] == want[key]

    def test_decayed_counts_horizon_and_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            decayed_counts,
        )

        ts = np.array(
            ["2024-01-31", "2024-01-31", "2024-01-01", "2020-01-01", "2024-02-05"],
            dtype="datetime64[us]",
        )
        t = pa.table(
            {
                "g": pa.array(["x", "x", "x", "x", "x"]),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
        for parts in (1, 3):
            out = decayed_counts(
                ray.data.from_arrow(t).repartition(parts),
                "g", "ts", ref_day="2024-02-01", half_life_days=1, horizon=40,
            ).to_pandas()
            # 2 events at age 1 (0.5 each) + 1 at age 31 (2^-31)
            # + one beyond horizon (0) + one in the future (0)
            want = 2 * 0.5 + 2.0 ** -31
            assert out["decayed_n"][0] == want


class TestCubeRollingHaversine:
    def test_cube_matches_duckdb(self, ray_session):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            cube_aggregate,
        )

        rng = np.random.default_rng(11)
        t = pa.table(
            {
                "a": pa.array(np.array(["x", "y", "z"])[rng.integers(0, 3, 300)]),
                "b": pa.array(np.array(["p", "q"])[rng.integers(0, 2, 300)]),
                "v": pa.array(rng.integers(0, 50, 300).astype(np.int64)),
            }
        )
        out = cube_aggregate(
            ray.data.from_arrow(t).repartition(4),
            ["a", "b"], [("v", "sum", "sv")],
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", t.to_pandas())
        want = con.execute(
            "SELECT a, b, CAST(SUM(v) AS BIGINT) AS sv FROM t GROUP BY CUBE(a, b)"
        ).df()
        key = lambda df: df.fillna("~").sort_values(["a", "b"]).reset_index(drop=True)
        a, b = key(out[["a", "b", "sv"]]), key(want)
        assert a.equals(b)

    def test_rolling_interval_sum_bruteforce(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            rolling_interval_sum,
        )

        rng = np.random.default_rng(5)
        n = 200
        ts = np.sort(rng.integers(0, 10_000_000_000, n)).astype("datetime64[us]")
        t = pa.table(
            {
                "user_id": pa.array(rng.integers(0, 3, n).astype(np.int64)),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(rng.normal(10, 3, n)),
            }
        )
        out = collect_tables(
            rolling_interval_sum(ray.data.from_arrow(t).repartition(5))
        ).to_pandas().set_index("event_id")["roll_cents"]

        df = t.to_pandas()
        from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import scaled_int

        cents = scaled_int(df.value.to_numpy(), 100.0)
        tsi = df.ts.astype("int64").to_numpy()
        for i in range(n):
            mask = (
                (df.user_id == df.user_id[i])
                & (tsi >= tsi[i] - 3_600_000_000)
                & (tsi <= tsi[i])
            )
            assert out[df.event_id[i]] == cents[mask].sum()

    def test_haversine_known_distance(self, ray_session):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            haversine_km,
        )

        # one degree of latitude ~ 111.19 km on the sphere (R=6371)
        d = haversine_km(np.array([0.0]), np.array([0.0]),
                         np.array([0.0]), np.array([1.0]))
        assert abs(d[0] - 111.19) < 0.01
        # symmetric and zero at identity
        assert haversine_km(np.array([77.2]), np.array([28.6]),
                            np.array([77.2]), np.array([28.6]))[0] == 0.0


class TestFlowDirection:
    def test_d8_matches_whole_array(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            _D8, tile_flow_direction,
        )

        tiles = entry._og_tiles_table(sparse_invalid=True, tile=24)
        out = tile_flow_direction(ray.data.from_arrow(tiles)).to_pandas()
        got = {(r, c): d for r, c, d in zip(out["row"], out["col"], out["d8"])}

        full = np.full((96, 96), np.nan, np.float32)
        for i in range(tiles.num_rows):
            r0, c0 = tiles["row_off"][i].as_py(), tiles["col_off"][i].as_py()
            hh, ww = tiles["height"][i].as_py(), tiles["width"][i].as_py()
            full[r0:r0+hh, c0:c0+ww] = np.asarray(
                tiles["values"][i].as_py(), np.float32).reshape(hh, ww)
        z = full.astype(np.float64)

        n_sinks = 0
        for (r, c), d in got.items():
            # per-pixel brute force with the documented tie-break
            best, code = 0.0, 0
            for dr, dc, dist, cd in _D8:
                drop = (z[r, c] - z[r + dr, c + dc]) / dist
                if drop > best:
                    best, code = drop, cd
            assert d == code, (r, c)
            n_sinks += code == 0
        assert len(got) == 6094
        assert 0 < n_sinks < len(got)  # fixture has sinks AND flows


class TestCentroidsCorrLocf:
    def test_label_centroids_partition_invariant(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
            label_centroids,
        )

        rng = np.random.default_rng(9)
        x = rng.normal(0, 1, (120, 8)).astype(np.float32)
        labels = rng.integers(0, 3, 120).astype(np.int32)
        t = pa.table(
            {
                "label": pa.array(labels, pa.int32()),
                "embedding": pa.array(
                    [r.tolist() for r in x], pa.list_(pa.float32())
                ),
            }
        )

        def run(parts):
            return label_centroids(
                ray.data.from_arrow(t).repartition(parts)
            ).to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)

        a, b = run(1), run(6)
        assert a.equals(b)
        # close to the true float mean (quantization error < 1e-5)
        want = x[labels == 0].astype(np.float64).mean(axis=0)
        got = a[a.label == 0].mean_v.to_numpy()
        assert np.abs(got - want).max() < 1e-5

    def test_corr_matrix_close_to_numpy(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            corr_matrix,
        )

        rng = np.random.default_rng(4)
        a = rng.integers(0, 100, 500)
        b = 2 * a + rng.integers(0, 30, 500)   # strongly correlated
        c = rng.integers(0, 100, 500)          # independent
        t = pa.table({"a": pa.array(a), "b": pa.array(b), "c": pa.array(c)})
        out = corr_matrix(
            ray.data.from_arrow(t).repartition(4), ["a", "b", "c"]
        ).to_pandas().set_index(["col_a", "col_b"])["corr"]
        assert abs(out[("a", "b")] - np.corrcoef(a, b)[0, 1]) < 1e-6  # 6dp rounding
        assert abs(out[("a", "c")]) < 0.2

    def test_locf_bruteforce(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            locf_resample,
        )

        # user 0: events on days 0, 3 (gap of 2 days), two events day 0
        ts = np.array(
            ["2024-01-01T05:00", "2024-01-01T09:00", "2024-01-04T01:00"],
            dtype="datetime64[us]",
        )
        t = pa.table(
            {
                "user_id": pa.array([7, 7, 7], pa.int64()),
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 9.0]),
            }
        )
        out = collect_tables(
            locf_resample(ray.data.from_arrow(t).repartition(2))
        ).to_pandas().sort_values("day")
        assert list(out.cents) == [200, 200, 200, 900]  # day0 latest=2.0
        assert out.day.iloc[0] == pd.Timestamp("2024-01-01")
        assert len(out) == 4


class TestRound2NewRelationalOps:
    def test_grouped_regression_matches_polyfit_any_partitioning(
        self, ray_session
    ):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_regression,
        )

        rng = np.random.default_rng(11)
        n = 1500
        g = rng.integers(0, 3, n).astype(np.int64)
        x = rng.integers(1, 60, n).astype(np.int64)
        y = (5 * x + rng.integers(-20, 200, n)).astype(np.int64)
        tbl = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y)})

        def run(parts):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = grouped_regression(ds, "g", "x", "y")
            return {
                gv: (s, i)
                for gv, s, i in zip(
                    out["g"].to_pylist(),
                    out["slope"].to_pylist(),
                    out["intercept"].to_pylist(),
                )
            }

        a, b = run(1), run(6)
        assert a == b  # exact int moments -> partition-invariant
        for gv in (0, 1, 2):
            m = g == gv
            slope, intercept = np.polyfit(x[m], y[m], 1)
            assert abs(a[gv][0] - slope) < 1e-5
            assert abs(a[gv][1] - intercept) < 1e-3

    def test_grouped_entropy_uniform_and_point_mass(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_entropy,
        )

        # g=a: 4 equally likely items -> ln(4); g=b: single item -> 0
        t = pa.table(
            {
                "g": pa.array(["a"] * 8 + ["b"] * 5),
                "item": pa.array(
                    ["w", "x", "y", "z"] * 2 + ["only"] * 5
                ),
            }
        )
        out = grouped_entropy(
            ray.data.from_arrow(t).repartition(3), "g", "item"
        )
        d = dict(zip(out["g"].to_pylist(), out["entropy"].to_pylist()))
        assert abs(d["a"] - np.log(4.0)) < 1e-6
        assert d["b"] == 0.0

    def test_grouped_geomean_exact_small_case(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_geomean,
        )

        t = pa.table(
            {
                "g": pa.array(["a", "a", "a", "b"]),
                "v": pa.array([2.0, 4.0, 8.0, 9.0]),
            }
        )
        out = grouped_geomean(ray.data.from_arrow(t).repartition(2), "g", "v")
        d = dict(zip(out["g"].to_pylist(), out["geomean"].to_pylist()))
        assert abs(d["a"] - 4.0) < 1e-6  # cbrt(2*4*8) = 4
        assert abs(d["b"] - 9.0) < 1e-6

    def test_longest_streaks_runs_and_gaps(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables, longest_streaks,
        )

        day = 86_400_000_000
        # u1: days 0,1,2, 5,6 -> longest 3; u2: days 10 only -> 1;
        # u3: duplicate events on one day don't inflate the streak
        ts = [0, day, 2 * day, 5 * day, 6 * day, 10 * day, 3 * day,
              3 * day + 5]
        users = [1, 1, 1, 1, 1, 2, 3, 3]
        t = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
        out = collect_tables(
            longest_streaks(
                ray.data.from_arrow(t).repartition(3), "user_id", "ts"
            )
        )
        d = dict(
            zip(out["user_id"].to_pylist(), out["max_streak"].to_pylist())
        )
        assert d == {1: 3, 2: 1, 3: 1}

    def test_unpivot_shape_and_values(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables, unpivot,
        )

        t = pa.table(
            {
                "k": pa.array(["a", "b"]),
                "m1": pa.array([1, 2], pa.int64()),
                "m2": pa.array([10.5, 20.5]),
            }
        )
        out = collect_tables(
            unpivot(ray.data.from_arrow(t), ["k"], ["m1", "m2"])
        ).to_pandas().sort_values(["k", "measure"]).reset_index(drop=True)
        assert len(out) == 4
        assert list(out.columns) == ["k", "measure", "value"]
        assert out.value.tolist() == [1.0, 10.5, 2.0, 20.5]


class TestRound2BatchB:
    def test_bigram_lm_logprob_tiny_corpus(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            bigram_lm_logprob,
        )

        # corpus: "a b" x3, "a c" x1 -> P(b|a)=3/4, P(c|a)=1/4
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["a b", "a b", "a b", "a c"]),
            }
        )
        out = bigram_lm_logprob(ray.data.from_arrow(t).repartition(2))
        d = dict(zip(out["doc_id"].to_pylist(), out["avg_logp"].to_pylist()))
        assert abs(d[0] - np.log(0.75)) < 1e-6
        assert abs(d[3] - np.log(0.25)) < 1e-6
        nb = dict(zip(out["doc_id"].to_pylist(), out["n_bigrams"].to_pylist()))
        assert nb == {0: 1, 1: 1, 2: 1, 3: 1}

    def test_morans_i_checkerboard_and_blocks(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            morans_i_grid,
        )

        h = w = 8
        gx = [x for y in range(h) for x in range(w)]
        gy = [y for y in range(h) for _ in range(w)]
        checker = pa.table(
            {"gx": gx, "gy": gy, "n": [(x + y) % 2 for y in range(h)
                                       for x in range(w)]}
        )
        assert abs(morans_i_grid(checker, h, w) + 1.0) < 1e-12
        halves = pa.table(
            {"gx": gx, "gy": gy,
             "n": [1 if x < w // 2 else 0 for y in range(h)
                   for x in range(w)]}
        )
        assert morans_i_grid(halves, h, w) > 0.8  # smooth field
        # sparse input: absent cells are zeros, not errors
        sparse = pa.table({"gx": [0], "gy": [0], "n": [5]})
        assert np.isfinite(morans_i_grid(sparse, h, w))

    def test_bpe_classic_merges_and_apply(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.functions.bpe import (
            apply_merges_tokens, train_merges,
        )

        wc = pa.table(
            {"word": ["low", "lower", "newest", "widest"],
             "n": [5, 2, 6, 3]}
        )
        m = train_merges(wc, 10)
        merges = list(zip(m["left"].to_pylist(), m["right"].to_pylist()))
        # an unseen word segment into learned subwords
        assert apply_merges_tokens("lowest", merges) == ["low", "est</w>"]
        # frequency-weighted: first merge count is 9 (newest+widest -> t</w>)
        assert m["pair_count"].to_pylist()[0] == 9
        # determinism
        m2 = train_merges(wc, 10)
        assert m.equals(m2)

    def test_bpe_word_counts_partition_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.functions.bpe import (
            corpus_word_counts,
        )

        t = pa.table({"text": ["x y x", "y z", "x"]})

        def run(parts):
            out = corpus_word_counts(
                ray.data.from_arrow(t).repartition(parts)
            )
            return dict(zip(out["word"].to_pylist(), out["n"].to_pylist()))

        assert run(1) == run(3) == {"x": 3, "y": 2, "z": 1}

    def test_bigram_lm_shuffle_tier_matches_broadcast(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            bigram_lm_logprob,
        )

        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(40)]
        docs = [
            " ".join(rng.choice(vocab, size=30))
            for _ in range(120)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(120), pa.int64()),
             "text": pa.array(docs)}
        )
        ds = ray.data.from_arrow(t).repartition(4)

        def key(out):
            return sorted(
                zip(
                    out["doc_id"].to_pylist(),
                    out["n_bigrams"].to_pylist(),
                    out["avg_logp"].to_pylist(),
                )
            )

        broad = bigram_lm_logprob(ds)
        shuf = bigram_lm_logprob(ds, broadcast_threshold=0, num_partitions=4)
        assert key(broad) == key(shuf)


class TestRound2BatchC:
    def test_grouping_sets_matches_manual(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouping_sets_aggregate,
        )

        t = pa.table(
            {
                "a": pa.array(["x", "x", "y", "y"]),
                "b": pa.array(["p", "q", "p", "q"]),
                "v": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
        out = grouping_sets_aggregate(
            ray.data.from_arrow(t).repartition(2),
            ["a", "b"],
            [["a"], ["b"], []],
            [("v", "sum", "s")],
        ).to_pandas()
        # set (a): x->3, y->7; set (b): p->4, q->6; (): 10
        by_a = out[out.b.isna() & out.a.notna()].set_index("a").s.to_dict()
        by_b = out[out.a.isna() & out.b.notna()].set_index("b").s.to_dict()
        total = out[out.a.isna() & out.b.isna()].s.tolist()
        assert by_a == {"x": 3, "y": 7}
        assert by_b == {"p": 4, "q": 6}
        assert total == [10]
        assert len(out) == 5

    def test_markov_transitions_ordering_and_counts(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            markov_transitions,
        )

        # user 1: a(t0) b(t1) a(t2); user 2: b(t0) b(t0, id tiebreak) a
        t = pa.table(
            {
                "u": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
                "ts": pa.array([0, 1, 2, 0, 0, 5], pa.int64()),
                "eid": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "st": pa.array(["a", "b", "a", "b", "b", "a"]),
            }
        )
        out = markov_transitions(
            ray.data.from_arrow(t).repartition(3), "u", "st", ["ts", "eid"]
        )
        d = {
            (s, x): n
            for s, x, n in zip(
                out["src"].to_pylist(), out["dst"].to_pylist(),
                out["n"].to_pylist(),
            )
        }
        assert d == {("a", "b"): 1, ("b", "a"): 2, ("b", "b"): 1}

    def test_exact_quantiles_cont_matches_numpy(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            exact_quantiles,
        )

        rng = np.random.default_rng(21)
        v = rng.normal(size=20_000) * 100
        ds = ray.data.from_arrow(pa.table({"v": v})).repartition(6)
        qs = [0.1, 0.5, 0.73, 0.99]
        out = exact_quantiles(
            ds, "v", qs, bins=64, driver_cap=512, method="cont"
        )
        got = out["value"].to_pylist()
        want = np.quantile(v, qs, method="linear")
        assert np.allclose(got, want, rtol=0, atol=1e-9)

    def test_grouped_approx_distinct_error_bound(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            grouped_approx_distinct,
        )

        rng = np.random.default_rng(8)
        ga = rng.integers(0, 5000, 40_000)          # 5k distinct
        gb = rng.integers(0, 200, 40_000)           # 200 distinct
        t = pa.table(
            {
                "g": pa.array(["a"] * 40_000 + ["b"] * 40_000),
                "v": pa.array(np.concatenate([ga, gb + 1_000_000])),
            }
        )
        out = grouped_approx_distinct(
            ray.data.from_arrow(t).repartition(5), "g", "v"
        )
        d = dict(zip(out["g"].to_pylist(), out["approx_n"].to_pylist()))
        true_a = len(np.unique(ga))
        true_b = len(np.unique(gb))
        assert abs(d["a"] - true_a) / true_a < 0.05
        assert abs(d["b"] - true_b) / true_b < 0.05
        # partitioning invariance: register merge is exact
        out2 = grouped_approx_distinct(
            ray.data.from_arrow(t).repartition(17), "g", "v"
        )
        d2 = dict(zip(out2["g"].to_pylist(), out2["approx_n"].to_pylist()))
        assert d == d2

    def test_convex_hull_distributed_exact(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            _monotone_chain,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            convex_hull,
        )

        rng = np.random.default_rng(13)
        x = rng.normal(size=30_000)
        y = rng.normal(size=30_000)
        ds = ray.data.from_arrow(
            pa.table({"x": x, "y": y})
        ).repartition(7)
        hull = convex_hull(ds, "x", "y")
        got = np.column_stack(
            [hull["x"].to_numpy(), hull["y"].to_numpy()]
        )
        ref = _monotone_chain(np.column_stack([x, y]))
        assert np.array_equal(np.sort(got, axis=0), np.sort(ref, axis=0))
        # every input point inside (or on) the hull
        hx, hy = got[:, 0], got[:, 1]
        bx, by = np.roll(hx, -1), np.roll(hy, -1)
        for i in range(len(got)):
            cross = (bx[i] - hx[i]) * (y - hy[i]) - (by[i] - hy[i]) * (x - hx[i])
            assert (cross >= -1e-9).all()


class TestRound2BatchD:
    def test_chi2_independence_uniform_is_zero(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            chi2_independence,
        )

        # perfectly independent 2x2 -> chi2 == 0
        t = pa.table(
            {
                "a": ["x", "x", "y", "y"],
                "b": [1, 2, 1, 2],
                "n": [10, 20, 30, 60],
            }
        )
        chi2, dof = chi2_independence(t, "a", "b")
        assert abs(chi2) < 1e-12
        assert dof == 1

    def test_chi2_zero_cells_counted(self):
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            chi2_independence,
        )

        # (y,2) never observed: expected = 5*5/20 = 1.25 contributes
        t = pa.table(
            {"a": ["x", "x", "y"], "b": [1, 2, 1], "n": [10, 5, 5]}
        )
        chi2, dof = chi2_independence(t, "a", "b")
        # manual: rows x=15,y=5; cols 1=15,2=5; tot=20
        # e = [[11.25,3.75],[3.75,1.25]]; o=[[10,5],[5,0]]
        want = (
            (10 - 11.25) ** 2 / 11.25
            + (5 - 3.75) ** 2 / 3.75
            + (5 - 3.75) ** 2 / 3.75
            + (0 - 1.25) ** 2 / 1.25
        )
        assert abs(chi2 - want) < 1e-12

    def test_getis_ord_hotspot_is_hottest(self):
        import numpy as np
        import pyarrow as pa
        from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
            getis_ord_gi_star,
        )

        # single hot 3x3 blob in a 10x10 field of zeros
        gx, gy, n = [], [], []
        for y in (4, 5, 6):
            for x in (4, 5, 6):
                gx.append(x); gy.append(y); n.append(10)
        out = getis_ord_gi_star(
            pa.table({"gx": gx, "gy": gy, "n": n}), 10, 10
        )
        z = np.asarray(out["gi_z"].to_pylist()).reshape(10, 10)
        assert z[5, 5] == z.max()  # blob center maximal
        assert z[5, 5] > 2.5       # clearly hot
        assert z[0, 0] < 0         # far corner cold

    def test_association_rules_known_lift(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            association_rules,
        )

        # 4 baskets; a in all 4, b in 2, both in 2 -> lift(ab) =
        # (2/4) / ((4/4)*(2/4)) = 1.0; c only with b -> lift(bc) = 2
        rows = [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a"),
            (4, "a"),
            # duplicate item rows in a basket must not double-count
            (1, "a"), (2, "b"),
        ]
        t = pa.table(
            {
                "bk": pa.array([r[0] for r in rows], pa.int64()),
                "it": pa.array([r[1] for r in rows]),
            }
        )
        out = association_rules(
            ray.data.from_arrow(t).repartition(3), ["bk"], "it"
        )
        d = {
            (a, b): (n, l)
            for a, b, n, l in zip(
                out["item_a"].to_pylist(), out["item_b"].to_pylist(),
                out["n_both"].to_pylist(), out["lift"].to_pylist(),
            )
        }
        assert d[("a", "b")] == (2, 1.0)
        assert d[("b", "c")] == (2, 2.0)
        assert d[("a", "c")] == (2, 1.0)


class TestRound2BatchE:
    def test_grid_dbscan_two_blobs_and_noise(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
            grid_dbscan,
        )

        rng = np.random.default_rng(7)
        blob_a = rng.normal([0, 0], 0.2, size=(300, 2))
        blob_b = rng.normal([10, 0], 0.2, size=(300, 2))
        noise = np.array([[5.0, 5.0], [-5.0, 3.0]])
        pts = np.vstack([blob_a, blob_b, noise])
        ds = ray.data.from_arrow(
            pa.table({"x": pts[:, 0], "y": pts[:, 1]})
        ).repartition(4)
        out = grid_dbscan(ds, "x", "y", eps=1.0, min_count=5).to_pandas()
        assert set(out.label.unique()) == {-1, 0, 1}
        # blob membership: every blob-a point shares one label
        a_labels = out.iloc[:0]  # placeholder
        merged = out.set_index(["x", "y"])  # deterministic coords
        la = {merged.loc[(x, y)].label for x, y in blob_a}
        lb = {merged.loc[(x, y)].label for x, y in blob_b}
        assert len(la) == 1 and len(lb) == 1 and la != lb
        assert {merged.loc[(5.0, 5.0)].label,
                merged.loc[(-5.0, 3.0)].label} == {-1}
        # partitioning invariance
        out2 = grid_dbscan(
            ray.data.from_arrow(pa.table({"x": pts[:, 0], "y": pts[:, 1]}))
            .repartition(11),
            "x", "y", eps=1.0, min_count=5,
        ).to_pandas()
        assert (
            out.sort_values(["x", "y"]).label.tolist()
            == out2.sort_values(["x", "y"]).label.tolist()
        )

    def test_stay_points_kernel(self):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            stay_points,
        )

        x = np.array([0.0, 0.1, 0.05, 5.0, 10.0, 10.1, 10.05])
        y = np.zeros(7)
        t = np.array([0.0, 50, 100, 120, 200, 260, 320])
        sp = stay_points(x, y, t, eps=0.5, min_duration=60)
        assert len(sp) == 2
        cx, cy, t_in, t_out, nfix = sp[0]
        assert abs(cx - 0.05) < 1e-9 and (t_in, t_out, nfix) == (0, 100, 3)
        # too-short dwell is not a stay
        assert stay_points(x, y, t, eps=0.5, min_duration=1000) == []

    def test_grouped_gini_extremes(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_gini,
        )

        # equal values -> gini 0; one-holds-all (n=2) -> (n-1)/n = 0.5
        t = pa.table(
            {
                "g": pa.array(["eq"] * 4 + ["uneq"] * 2),
                "cents": pa.array([5, 5, 5, 5, 0, 100], pa.int64()),
            }
        )
        out = grouped_gini(ray.data.from_arrow(t).repartition(3), "g", "cents")
        d = dict(zip(out["g"].to_pylist(), out["gini"].to_pylist()))
        assert d["eq"] == 0.0
        assert abs(d["uneq"] - 0.5) < 1e-9


class TestRound2BatchF:
    def test_grouped_argmax_latest_row_wins(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_argmax,
        )

        t = pa.table(
            {
                "k": pa.array([1, 1, 2, 2, 1], pa.int64()),
                "ts": pa.array([5, 9, 3, 3, 9], pa.int64()),
                "tie": pa.array([0, 1, 7, 8, 2], pa.int64()),
                "payload": pa.array(["a", "b", "c", "d", "e"]),
            }
        )
        # k=1: max (ts,tie) = (9,2) -> 'e'; k=2: (3,8) -> 'd'
        out = grouped_argmax(
            ray.data.from_arrow(t).repartition(3), ["k"], ["ts", "tie"]
        ).sort_by("k")
        assert out["payload"].to_pylist() == ["e", "d"]
        # partitioning invariance
        out2 = grouped_argmax(
            ray.data.from_arrow(t).repartition(1), ["k"], ["ts", "tie"]
        ).sort_by("k")
        assert out.equals(out2)

    def test_grouped_percent_rank_matches_definition(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_percent_rank,
        )

        # group g: values 1,1,2,5 -> pr(1)=0, pr(2)=2/3, pr(5)=3/3
        t = pa.table(
            {
                "g": pa.array(["g"] * 4 + ["h"]),
                "v": pa.array([1, 1, 2, 5, 9], pa.int64()),
            }
        )
        out = grouped_percent_rank(
            ray.data.from_arrow(t).repartition(2), "g", "v"
        )
        d = {
            (g, v): p
            for g, v, p in zip(
                out["g"].to_pylist(), out["v"].to_pylist(),
                out["pct_rank"].to_pylist(),
            )
        }
        assert d[("g", 1)] == 0.0
        assert abs(d[("g", 2)] - 2 / 3) < 1e-6
        assert d[("g", 5)] == 1.0
        assert d[("h", 9)] == 0.0  # single-row group

    def test_pagerank_kernel_center_of_path_highest(self):
        import numpy as np

        # 3-node path a-b-c: b must out-rank a and c (same kernel as
        # _q_word_pagerank)
        n = 3
        src = np.array([0, 1, 1, 2])
        dst = np.array([1, 0, 2, 1])
        deg = np.bincount(src, minlength=n).astype(np.float64)
        rank = np.full(n, 1.0 / n)
        for _ in range(10):
            contrib = rank[src] / deg[src]
            incoming = np.zeros(n)
            np.add.at(incoming, dst, contrib)
            rank = 0.15 / n + 0.85 * incoming
        assert rank[1] > rank[0] and rank[1] > rank[2]
        assert abs(rank.sum() - 1.0) < 1e-9


class TestContours:
    def _tiles_from_array(self, vals, tile):
        import numpy as np
        import pyarrow as pa

        h, w = vals.shape
        rows = {k: [] for k in
                ("tile_id", "src", "band", "row_off", "col_off", "height",
                 "width", "transform", "crs", "nodata", "values")}
        for r0 in range(0, h, tile):
            for c0 in range(0, w, tile):
                block = vals[r0:r0 + tile, c0:c0 + tile]
                rows["tile_id"].append(f"t_{r0}_{c0}")
                rows["src"].append("t")
                rows["band"].append(1)
                rows["row_off"].append(r0)
                rows["col_off"].append(c0)
                rows["height"].append(block.shape[0])
                rows["width"].append(block.shape[1])
                rows["transform"].append([0.01, 0.0, 77.0, 0.0, -0.01, 29.0])
                rows["crs"].append("EPSG:4326")
                rows["nodata"].append(-3.4028234663852886e38)
                rows["values"].append(
                    block.astype(np.float32).ravel().tolist()
                )
        return pa.table(
            {
                "tile_id": pa.array(rows["tile_id"]),
                "src": pa.array(rows["src"]),
                "band": pa.array(rows["band"], pa.int32()),
                "row_off": pa.array(rows["row_off"], pa.int64()),
                "col_off": pa.array(rows["col_off"], pa.int64()),
                "height": pa.array(rows["height"], pa.int32()),
                "width": pa.array(rows["width"], pa.int32()),
                "transform": pa.array(rows["transform"],
                                      pa.list_(pa.float64())),
                "crs": pa.array(rows["crs"]),
                "nodata": pa.array(rows["nodata"], pa.float64()),
                "values": pa.array(rows["values"], pa.list_(pa.float32())),
            }
        )

    def test_vertical_contour_of_linear_field(self, ray_session):
        """z = col on a dense grid: the level-L contour is one vertical
        line; every window row it crosses contributes exactly one unit
        segment, independent of the tiling."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_contours,
        )

        h = w = 32
        vals = np.tile(np.arange(w, dtype=np.float64), (h, 1))
        level = 10.5  # crosses between col 10 and 11
        for tile in (32, 8):  # whole-array vs 16 tiles: identical
            tiles = self._tiles_from_array(vals, tile)
            out = tile_contours(
                ray.data.from_arrow(tiles), level
            ).to_pandas()
            cases = out[out.case_id >= 0]
            # every crossing window is case tl=0,tr=1,br=1,bl=0 -> 2+4=6
            assert set(cases.case_id) == {0, 6, 15}
            n6 = int(cases[cases.case_id == 6].n.sum())
            # windows anchored at rows 0..h-2 (bottom corners need row+1)
            assert n6 == h - 1
            total_len = float(out[out.case_id == -1].length_px.sum())
            assert abs(total_len - (h - 1) * 1.0) < 1e-9

    def test_diagonal_contour_length(self, ray_session):
        """z = row + col: the contour is a diagonal; each crossed
        window contributes sqrt(2)/2 (corner cut) or 1-in-1-out."""
        import numpy as np
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_contours,
        )

        h = w = 16
        vals = np.add.outer(
            np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64)
        )
        tiles_a = self._tiles_from_array(vals, 16)
        tiles_b = self._tiles_from_array(vals, 4)
        la = float(
            tile_contours(ray.data.from_arrow(tiles_a), 7.5)
            .to_pandas().query("case_id == -1").length_px.sum()
        )
        lb = float(
            tile_contours(ray.data.from_arrow(tiles_b), 7.5)
            .to_pandas().query("case_id == -1").length_px.sum()
        )
        assert abs(la - lb) < 1e-9  # tiling-independent
        assert la > 0

    def test_segment_geometry_and_stitching(self, ray_session):
        """Segment endpoints (round-3 polyline output): z = col gives a
        vertical contour whose per-tile segments stitch into ONE open
        polyline; a radial bump gives one CLOSED loop."""
        import numpy as np
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            stitch_segments, tile_contour_segments,
        )

        h = w = 16
        vals = np.tile(np.arange(w, dtype=np.float64), (h, 1))
        level = 10.5
        for tile in (16, 8):
            segs = collect_tables(
                tile_contour_segments(
                    ray.data.from_arrow(self._tiles_from_array(vals, tile)),
                    level,
                )
            )
            # one unit segment per window row, all at x = 10.5
            assert segs.num_rows == h - 1
            assert set(segs["x1"].to_pylist()) == {10.5}
            assert set(segs["x2"].to_pylist()) == {10.5}
            poly = stitch_segments(segs).to_pandas()
            assert len(poly) == 1
            assert int(poly.n_segments[0]) == h - 1
            assert abs(float(poly.length[0]) - (h - 1)) < 1e-9
            assert not bool(poly.closed[0])

        # radial bump -> one closed loop
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        r2 = (yy - 7.5) ** 2 + (xx - 7.5) ** 2
        bump = 100.0 - r2
        segs = collect_tables(
            tile_contour_segments(
                ray.data.from_arrow(self._tiles_from_array(bump, 8)), 80.0
            )
        )
        poly = stitch_segments(segs).to_pandas()
        assert len(poly) == 1
        assert bool(poly.closed[0])
        # loop circumference ~ 2*pi*sqrt(20) within marching-squares error
        import math

        assert abs(float(poly.length[0]) - 2 * math.pi * math.sqrt(20)) < 2.0


class TestFrameSample:
    def test_frame_sampling_plumbing(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            FrameSample, gen_media,
        )

        media = gen_media(30, seed=3)
        ds = ray.data.from_arrow(media)
        out = ds.map_batches(
            FrameSample(stride=4), batch_format="pyarrow", batch_size=8,
            concurrency=2,
        ).to_pandas()
        vids = media.to_pandas().query("media_type.str.startswith('video')")
        # every video emits ceil(n_frames/4) rows; others exactly one
        import math
        want = 0
        for _, r in media.to_pandas().iterrows():
            if r.media_type.startswith("video/"):
                nf = 8 + (len(r.payload) % 24)
                want += math.ceil(nf / 4)
            else:
                want += 1
        assert len(out) == want
        assert (out[out.frame_idx >= 0].frame_idx % 4 == 0).all()
        # deterministic across runs/partitionings
        out2 = ray.data.from_arrow(media).repartition(5).map_batches(
            FrameSample(stride=4), batch_format="pyarrow", batch_size=4,
        ).to_pandas()
        a = out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
        b = out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
        assert a.equals(b)


class TestProfileColumns:
    def test_profile_matches_pandas_truth(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            profile_columns,
        )

        df = pd.DataFrame(
            {
                "x": [1.0, 2.0, 2.0, 9.5],
                "c": ["a", "a", "b", "c"],
            }
        )
        out = profile_columns(
            ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(2),
            ["x"], ["c"],
        ).to_pandas().set_index("column")
        assert out.loc["x"].n == 4 and out.loc["x"].n_distinct == 3
        assert out.loc["x"].min_v == 1.0 and out.loc["x"].max_v == 9.5
        assert out.loc["c"].n_distinct == 3
        assert out.loc["c"].n_null == 0


class TestFusedPivot:
    """TilePivot validity/emit fusion (round-3 headline memory-traffic
    cut): fused output must equal pivot -> ValidityFilter -> column
    selection exactly."""

    def test_fused_equals_separate(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
            gen_tiles,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
            TilePivot, master_widths_of,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.transform import (
            ValidityFilter,
        )

        tiles = gen_tiles()
        widths = master_widths_of(tiles)
        ds = ray.data.from_arrow(tiles).repartition(4)

        sep = (
            ds.map_batches(
                TilePivot(with_cells=(7, 8, 9), master_widths=widths),
                batch_format="pyarrow", batch_size=None,
            )
            .map_batches(
                ValidityFilter("threshold"),
                batch_format="pyarrow", batch_size=None,
            )
            .to_pandas()
            .sort_values(["src", "band", "pix"])
            .reset_index(drop=True)
        )
        fused = (
            ds.map_batches(
                TilePivot(
                    with_cells=(7, 8, 9), master_widths=widths,
                    validity="threshold",
                ),
                batch_format="pyarrow", batch_size=None,
            )
            .to_pandas()
            .sort_values(["src", "band", "pix"])
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(sep, fused)

    def test_emit_pruning(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
            gen_tiles,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
            TilePivot, master_widths_of,
        )

        tiles = gen_tiles()
        widths = master_widths_of(tiles)
        ds = ray.data.from_arrow(tiles)
        full = ds.map_batches(
            TilePivot(with_cells=(8,), master_widths=widths),
            batch_format="pyarrow", batch_size=None,
        ).to_pandas()
        pruned = ds.map_batches(
            TilePivot(
                with_cells=(8,), master_widths=widths,
                emit=("lon", "lat"), validity="threshold",
            ),
            batch_format="pyarrow", batch_size=None,
        ).to_pandas()
        assert list(pruned.columns) == ["lon", "lat", "cell_8"]
        # same valid points, order-independent
        valid = full[full.z > -1e30]
        assert sorted(pruned["cell_8"]) == sorted(valid["cell_8"])

    def test_validity_all_filtered_keeps_schema(self, ray_session):
        import numpy as np
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.schema import (
            NODATA_F32, TILE_SCHEMA,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
            TilePivot,
        )

        t = pa.table(
            {
                "tile_id": ["t0"], "src": ["s"],
                "band": pa.array([1], pa.int32()),
                "row_off": pa.array([0], pa.int32()),
                "col_off": pa.array([0], pa.int32()),
                "height": pa.array([4], pa.int32()),
                "width": pa.array([4], pa.int32()),
                "transform": pa.array(
                    [[0.01, 0.0, 77.0, 0.0, -0.01, 29.0]],
                    pa.list_(pa.float64(), 6),
                ),
                "crs": ["EPSG:4326"],
                "nodata": pa.array([float(NODATA_F32)], pa.float64()),
                "values": pa.array(
                    [np.full(16, NODATA_F32, np.float32).tolist()],
                    pa.list_(pa.float32()),
                ),
            },
            schema=TILE_SCHEMA,
        )
        out = ray.data.from_arrow(t).map_batches(
            TilePivot(validity="threshold"),
            batch_format="pyarrow", batch_size=None,
        )
        assert out.count() == 0
        assert out.schema().names == [
            "lon", "lat", "z", "band", "src", "pix", "nodata"
        ]


class TestBucketedDistributedCombine:
    def test_matches_driver_combine_high_cardinality(self, ray_session):
        """The hash-bucket distributed tier must equal the driver-side
        combine on a high-cardinality key (the per-group-overhead fix
        must not change values)."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            hash_aggregate,
        )

        rng = np.random.RandomState(3)
        n = 20000
        t = pa.table(
            {
                "k_int": pa.array(rng.randint(0, 5000, n).astype(np.int64)),
                "k_str": pa.array(
                    [f"s{v}" for v in rng.randint(0, 7, n)]
                ),
                "v": pa.array(rng.randint(0, 100, n).astype(np.int64)),
            }
        )
        ds = ray.data.from_arrow(t).repartition(6)
        aggs = [("v", "sum", "v_sum"), ("v", "min", "v_min"),
                ("v", "max", "v_max"), ("v", "count", "n")]
        drv = hash_aggregate(ds, ["k_int", "k_str"], aggs)
        dst = hash_aggregate(
            ds, ["k_int", "k_str"], aggs, distributed_combine=True
        )
        parts = [
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in dst.iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows
        ]
        dst_t = pa.concat_tables(parts)

        def norm(tbl):
            import pandas as pd

            df = tbl.to_pandas()[sorted(tbl.schema.names)]
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        got, want = norm(dst_t), norm(drv)
        assert got.equals(want)


class TestFusedExtractCount:
    """Fully fused extract -> PIP -> count-by-cell (the round-3 headline
    pushdown): one-stage partials must equal the three-stage pipeline's
    final counts exactly."""

    def test_fused_equals_pipeline(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            hash_aggregate,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
            gen_polygons, gen_tiles,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
            FusedExtractCount, TilePivot, master_widths_of,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            PIPJoiner,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
            partial_count,
        )

        tiles = gen_tiles()
        widths = master_widths_of(tiles)
        polys = gen_polygons()

        def pivot():
            return TilePivot(
                round_output=True, reproject=True, with_cells=(7, 8, 9),
                master_widths=widths, validity="threshold",
                emit=("lon", "lat"),
            )

        ds = ray.data.from_arrow(tiles).repartition(4)
        unfused = partial_count(
            ds.map_batches(pivot(), batch_format="pyarrow", batch_size=None)
            .map_batches(PIPJoiner(polys), batch_format="pyarrow", batch_size=None),
            ["cell_8"],
        )
        ds2 = ray.data.from_arrow(tiles).repartition(4)
        fused_partials = ds2.map_batches(
            FusedExtractCount(pivot(), [PIPJoiner(polys)], ["cell_8"]),
            batch_format="pyarrow", batch_size=None,
        )
        fused = hash_aggregate(
            fused_partials, ["cell_8"], [("count", "sum", "count")]
        )
        a = unfused.sort_by("cell_8").to_pandas()
        b = fused.select(["cell_8", "count"]).sort_by("cell_8").to_pandas()
        import pandas as pd

        pd.testing.assert_frame_equal(
            a.reset_index(drop=True),
            b.astype(a.dtypes.to_dict()).reset_index(drop=True),
        )


class TestTileCurvature:
    def test_halo_exchange_matches_whole_array(self, ray_session):
        """Distributed tile curvature == single-array Zevenbergen-
        Thorne evaluation, bit-exact, including pixels on interior
        tile boundaries (i.e. the halo strips crossed the shuffle)."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_curvature,
        )

        tiles = entry._og_tiles_table(sparse_invalid=True, tile=24)
        out = tile_curvature(ray.data.from_arrow(tiles)).to_pandas()
        got = {
            (r, c): (g, p, pl)
            for r, c, g, p, pl in zip(
                out["row"], out["col"], out["curv_general"],
                out["curv_profile"], out["curv_plan"])
        }

        full = np.full((96, 96), np.nan, np.float32)
        for i in range(tiles.num_rows):
            r0 = tiles["row_off"][i].as_py()
            c0 = tiles["col_off"][i].as_py()
            hh = tiles["height"][i].as_py()
            ww = tiles["width"][i].as_py()
            full[r0:r0+hh, c0:c0+ww] = np.asarray(
                tiles["values"][i].as_py(), np.float32).reshape(hh, ww)
        z = full.astype(np.float64)
        h, w = z.shape
        pad = np.full((h + 2, w + 2), np.nan)
        pad[1:h+1, 1:w+1] = z
        za, zb, zc = pad[0:h, 0:w], pad[0:h, 1:w+1], pad[0:h, 2:w+2]
        zd, ze, zf = pad[1:h+1, 0:w], pad[1:h+1, 1:w+1], pad[1:h+1, 2:w+2]
        zg, zh, zi = pad[2:h+2, 0:w], pad[2:h+2, 1:w+1], pad[2:h+2, 2:w+2]
        stack = np.stack([za, zb, zc, zd, ze, zf, zg, zh, zi])
        valid = np.all(np.isfinite(stack) & (stack > -1e30), axis=0)
        res = 0.01
        l2 = res * res
        dd = ((zd + zf) / 2.0 - ze) / l2
        ee = ((zb + zh) / 2.0 - ze) / l2
        ff = (-za + zc + zg - zi) / (4.0 * l2)
        gg = (-zd + zf) / (2.0 * res)
        hh2 = (zb - zh) / (2.0 * res)
        g2h2 = gg * gg + hh2 * hh2
        general = (-2.0 * (dd + ee)) * 100.0
        with np.errstate(divide="ignore", invalid="ignore"):
            profile = (-2.0 * (dd * gg * gg + ee * hh2 * hh2
                               + ff * gg * hh2) / g2h2) * 100.0
            plan = (2.0 * (dd * hh2 * hh2 + ee * gg * gg
                           - ff * gg * hh2) / g2h2) * 100.0
        flat = g2h2 == 0.0
        profile = np.where(flat, 0.0, profile)
        plan = np.where(flat, 0.0, plan)
        rr, cc = np.nonzero(valid)
        want = {
            (int(r), int(c)): (general[r, c], profile[r, c], plan[r, c])
            for r, c in zip(rr, cc)
        }

        assert set(got) == set(want)
        boundary = [k for k in want if k[0] in (23, 24, 47, 48, 71, 72)]
        assert len(boundary) > 100
        for k in want:
            assert got[k] == want[k], (k, got[k], want[k])


class TestGeofenceTransitions:
    def test_enter_exit_semantics(self, ray_session):
        """A hand-built track: out -> in -> in -> out -> in emits
        enter, exit, enter at the correct fixes; a polygon never
        touched emits nothing; the first fix never emits."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            geofence_transitions_ds,
        )

        # geocode lattice: lon = 77 + (eid % 96)/100, lat = 28.05 + (eid//96 % 96)/100
        # polygon around lon in (77.30, 77.60), lat in (28.30, 28.60) (CCW)
        poly = {
            "box": [(77.305, 28.305), (77.595, 28.305),
                    (77.595, 28.595), (77.305, 28.595)],
            "far": [(85.0, 20.0), (86.0, 20.0), (86.0, 21.0), (85.0, 21.0)],
        }
        # eids: outside (col 10, row 10), inside (col 40, row 40),
        # inside (col 50, row 40), outside (col 80, row 40), inside again
        eids = [10 * 96 + 10, 40 * 96 + 40, 40 * 96 + 50,
                40 * 96 + 80, 40 * 96 + 45]
        ev = pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array([7] * 5, pa.int64()),
                "ts": pa.array(list(range(5)), pa.timestamp("us")),
            }
        )
        out = geofence_transitions_ds(
            ray.data.from_arrow(ev), poly
        ).to_pandas()
        assert list(out["polygon_id"]) == ["box"] * 3
        # transitions are emitted in (ts, event_id) track order
        assert set(zip(out["event_id"], out["transition"])) == {
            (eids[1], "enter"), (eids[3], "exit"), (eids[4], "enter"),
        }
        assert (out["user_id"] == 7).all()


class TestLangTemperatureSample:
    def test_rebalances_head_only(self, ray_session):
        """alpha<1 downsamples only languages above their flattened
        target; the kept set is the deterministic mix32 Bernoulli
        subset (checksum recomputed independently here)."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            mix32,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
            lang_temperature_sample,
        )

        langs = ["en"] * 800 + ["fr"] * 150 + ["zh"] * 50
        ids = np.arange(1000, dtype=np.int64)
        docs = ray.data.from_arrow(pa.table(
            {"doc_id": pa.array(ids), "lang": pa.array(langs)}
        ))
        out = lang_temperature_sample(docs, alpha=0.3, seed=29).to_pandas()
        out = out.set_index("lang")
        # rare langs keep everything; the head shrinks
        assert out.loc["fr", "n_after"] == 150
        assert out.loc["zh", "n_after"] == 50
        assert out.loc["en", "n_after"] < 800

        # independent recompute of the en keep set
        n = np.array([800.0, 150.0, 50.0])
        pw = n ** 0.3
        rate = round(min(1.0, pw[0] / pw.sum() * 1000.0 / 800.0), 6)
        en_ids = ids[:800]
        keep = mix32(en_ids, 29).astype(np.float64) / 2**32 < rate
        assert out.loc["en", "n_after"] == int(keep.sum())
        assert out.loc["en", "sum_kept_ids"] == int(en_ids[keep].sum())


class TestBfsMinHops:
    def test_path_graph_and_cap(self, ray_session):
        """Chain a-b-c-d-e-f from seed a: hops 0..4, f beyond the cap
        is absent; an isolated seed appears at 0; a cross edge gives
        the MIN hop."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.graph import (
            bfs_min_hops,
        )

        chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("e", "f"), ("a", "c")]  # cross edge: c reachable in 1
        w1 = [x for x, _ in chain] + [y for _, y in chain]
        w2 = [y for _, y in chain] + [x for x, _ in chain]
        edges = ray.data.from_arrow(
            pa.table({"w1": pa.array(w1), "w2": pa.array(w2)})
        )
        out = bfs_min_hops(edges, ["a", "zzz_isolated"], max_hops=4)
        got = dict(zip(*[out.to_pandas()[c] for c in ("word", "hops")]))
        assert got == {
            "a": 0, "zzz_isolated": 0, "b": 1, "c": 1, "d": 2, "e": 3,
            "f": 4,
        }


class TestRegionLabels:
    def test_blob_spanning_four_tiles(self, ray_session):
        """A plus-shaped blob centered on the 4-tile corner merges into
        ONE region across tile boundaries; a second isolated blob and a
        singleton stay separate; counts match a reference flood fill."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_region_labels,
        )

        size, tile = 32, 16
        z = np.zeros((size, size), np.float32)
        # plus blob across the (16,16) corner
        z[14:19, 15:18] = 50.0
        z[15:18, 13:20] = 50.0
        # isolated second blob fully inside tile 0
        z[2:5, 2:4] = 60.0
        # singleton
        z[30, 30] = 70.0
        rows = []
        for r0 in range(0, size, tile):
            for c0 in range(0, size, tile):
                rows.append(
                    {
                        "src": "t", "band": 1, "row_off": r0, "col_off": c0,
                        "height": tile, "width": tile,
                        "transform": [0.01, 0.0, 77.0, 0.0, -0.01, 29.0],
                        "values": z[r0:r0+tile, c0:c0+tile].ravel().tolist(),
                    }
                )
        tiles = pa.Table.from_pylist(rows)
        out = tile_region_labels(
            ray.data.from_arrow(tiles), threshold=45.0
        ).to_pandas()

        # reference flood fill (4-connectivity)
        above = z >= 45.0
        seen = np.zeros_like(above)
        sizes = []
        for r in range(size):
            for c in range(size):
                if above[r, c] and not seen[r, c]:
                    stack, n = [(r, c)], 0
                    seen[r, c] = True
                    while stack:
                        y, x = stack.pop()
                        n += 1
                        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                            yy, xx = y + dy, x + dx
                            if (0 <= yy < size and 0 <= xx < size
                                    and above[yy, xx] and not seen[yy, xx]):
                                seen[yy, xx] = True
                                stack.append((yy, xx))
                    sizes.append(n)
        assert sorted(out["n_pixels"]) == sorted(sizes)
        assert len(out) == 3  # plus blob, rect blob, singleton
        # the plus blob's rep is its min (row<<20|col) member
        plus_cells = [(r, c) for r in range(14, 19) for c in range(15, 18)]
        plus_cells += [(r, c) for r in range(15, 18) for c in range(13, 20)]
        want_rep = min((r << 20) | c for r, c in plus_cells)
        big = out.loc[out["n_pixels"].idxmax()]
        assert int(big["rep"]) == want_rep


class TestKeyedEwmaAndDirections:
    def test_ewma_sequential_recurrence(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_ewma,
        )

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 100, 40)
        ev = pa.table(
            {
                "event_id": pa.array(np.arange(40, dtype=np.int64)),
                "user_id": pa.array([1] * 40, pa.int64()),
                "ts": pa.array(np.arange(40, dtype=np.int64), pa.timestamp("us")),
                "value": pa.array(x),
            }
        )
        out = keyed_ewma(ray.data.from_arrow(ev), alpha=0.2).to_pandas()
        e = x[0]
        for v in x[1:]:
            e = 0.2 * v + 0.8 * e
        assert out.loc[0, "n_points"] == 40
        assert out.loc[0, "ewma_last"] == round(e, 6)

    def test_direction_classification(self, ray_session):
        """Lattice moves: E, N, NE diagonal, and a long W jump."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            movement_directions_ds,
        )

        # geocode: col = eid % 96, row = eid // 96.  The (0,0)->(3,3)
        # hop is an EXACT float tie (dx == dy) on this lattice, so it
        # exercises the diagonal branch; most row/col-equal hops are
        # NOT exact ties (different bases 77.0 / 28.05) and classify
        # cardinal -- by design, identically in engine and SQL.
        path = [(0, 0), (3, 3), (3, 5), (5, 5), (5, 1)]
        eids = [r * 96 + c for r, c in path]
        ev = pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array([5] * len(eids), pa.int64()),
                "ts": pa.array(range(len(eids)), pa.timestamp("us")),
            }
        )
        out = movement_directions_ds(ray.data.from_arrow(ev)).to_pandas()
        got = dict(zip(out["direction"], out["n_steps"]))
        assert got == {"E": 1, "N": 1, "NE": 1, "W": 1}


class TestFocalModeAndCusum:
    def test_focal_mode_majority_and_tiebreak(self, ray_session):
        """A 4x4 raster of 5.0 with two 9.0 pixels: windows with <5
        nines keep mode 5.0; a window of 4 vs 5 splits by majority;
        exact ties break to the smaller value."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_focal_mode,
        )

        z = np.full((4, 4), 5.0, np.float32)
        z[1, 1] = 9.0
        z[1, 2] = 9.0
        tiles = pa.Table.from_pylist([{
            "src": "t", "band": 1, "row_off": 0, "col_off": 0,
            "height": 4, "width": 4,
            "transform": [0.01, 0.0, 77.0, 0.0, -0.01, 29.0],
            "values": z.ravel().tolist(),
        }])
        out = tile_focal_mode(ray.data.from_arrow(tiles)).to_pandas()
        got = {(r, c): v for r, c, v in zip(out["row"], out["col"],
                                            out["focal_mode"])}
        # only interior pixels have full windows: rows/cols 1-2
        assert set(got) == {(1, 1), (1, 2), (2, 1), (2, 2)}
        assert all(v == 5.0 for v in got.values())  # 9s never majority

        # exact tie: half 3.0, half 7.0 in a 3x3 is impossible (9 odd),
        # so craft 4x 3.0 + 4x 7.0 + center 3.0 -> 5 vs 4 majority 3.0;
        # then center 7.0 -> 4 vs 5 majority 7.0
        z2 = np.array([[3, 3, 7], [3, 7, 7], [3, 7, 3]], np.float32)
        tiles2 = pa.Table.from_pylist([{
            "src": "u", "band": 1, "row_off": 0, "col_off": 0,
            "height": 3, "width": 3,
            "transform": [0.01, 0.0, 77.0, 0.0, -0.01, 29.0],
            "values": z2.ravel().tolist(),
        }])
        out2 = tile_focal_mode(ray.data.from_arrow(tiles2)).to_pandas()
        assert list(out2["focal_mode"]) == [3.0]  # 5x 3.0 vs 4x 7.0

    def test_cusum_step_change(self, ray_session):
        """Flat series: no alarms.  A step change accumulates positive
        deviations and fires; alarm count matches a hand recurrence."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_cusum_alarms,
        )

        flat = [10.0] * 50
        step = [10.0] * 25 + [200.0] * 25
        rows = []
        for uid, series in ((1, flat), (2, step)):
            for i, v in enumerate(series):
                rows.append({"event_id": i, "user_id": uid,
                             "ts": i, "value": v})
        ev = pa.Table.from_pylist(rows).set_column(
            2, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        out = keyed_cusum_alarms(
            ray.data.from_arrow(ev), h_units=50.0
        ).to_pandas().set_index("user_id")
        assert out.loc[1, "n_alarms"] == 0

        # hand recurrence for user 2
        cents = np.array([round(v * 100) for v in step], np.int64)
        n, total = len(cents), int(cents.sum())
        s, alarms = 0, 0
        for c in cents:
            s = max(0, s + int(c) * n - total)
            if s > 5000 * n:
                alarms += 1
                s = 0
        assert alarms > 0
        assert out.loc[2, "n_alarms"] == alarms


class TestSpeedAndDebounce:
    def test_debounce_sequential_not_lag(self, ray_session):
        """Events at t = 0, 30, 61, 100 s with a 60 s window: kept =
        {0, 61} (the 100 s event is only 39 s after the KEPT 61 -- a
        naive LAG-on-all-rows filter would wrongly keep it)."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_debounce,
        )

        ts = [0, 30, 61, 100]
        ev = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([9] * 4, pa.int64()),
                "event_type": pa.array(["x"] * 4),
                "ts": pa.array([t * 1_000_000 for t in ts],
                               pa.timestamp("us")),
            }
        )
        out = keyed_debounce(
            ray.data.from_arrow(ev), window_s=60.0
        ).to_pandas()
        assert out.loc[0, "n_events"] == 4
        assert out.loc[0, "n_kept"] == 2
        assert out.loc[0, "sum_kept_ids"] == 1 + 3

    def test_speed_stats_hand_case(self, ray_session):
        """Two fixes 0.01 units apart over 360 s = 0.1 units/hour
        exactly -> NOT speeding (strict >); a faster step is."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            track_speed_stats_ds,
        )

        # geocode: col = eid % 96 -> dx = 0.01 per col step
        eids = [10, 11, 13]  # steps: 1 col, then 2 cols
        ev = pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "user_id": pa.array([3] * 3, pa.int64()),
                # 360 s then 360 s: speeds 0.1 then 0.2 units/hour
                "ts": pa.array([0, 360_000_000, 720_000_000],
                               pa.timestamp("us")),
            }
        )
        out = track_speed_stats_ds(
            ray.data.from_arrow(ev), speed_limit=0.1
        ).to_pandas()
        # independent recompute with the operator's exact float ops
        # (lattice deltas are NOT exactly 0.01 -- 77 + 11*0.01 minus
        # 77 + 10*0.01 carries representation error, by design shared
        # with the SQL oracle)
        import math
        lons = [77.0 + (e % 96) * 0.01 for e in eids]
        speeds = [
            math.sqrt((lons[i+1] - lons[i]) ** 2) / (360_000_000 / 3.6e9)
            for i in range(2)
        ]
        assert out.loc[0, "n_steps"] == 2
        assert out.loc[0, "n_speeding"] == sum(s > 0.1 for s in speeds)
        assert abs(out.loc[0, "max_speed"] - max(speeds)) < 1e-6


class TestImageAhash:
    def test_decode_feeds_hash(self, ray_session):
        """The signature really comes from DECODED PNG bytes: encoding
        a different image under the same id changes the pair set."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_png,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            ahash_bits, gen_media_grid, image_ahash_pairs,
        )

        media = gen_media_grid(n=24, size=32, n_base=16)
        base = image_ahash_pairs(ray.data.from_arrow(media), max_hamming=6)
        assert base.num_rows == 8  # the 8 perturbed copies pair up

        # replace m16's payload with an unrelated gradient image
        grad = np.tile(
            np.linspace(0, 255, 32, dtype=np.uint8)[None, :], (32, 1)
        )
        img = np.repeat(grad[:, :, None], 3, axis=2)
        payloads = media["payload"].to_pylist()
        payloads[16] = encode_png(img)
        media2 = media.set_column(
            2, "payload", pa.array(payloads, pa.binary())
        )
        out2 = image_ahash_pairs(ray.data.from_arrow(media2), max_hamming=6)
        pairs2 = set(zip(out2["id_a"].to_pylist(), out2["id_b"].to_pylist()))
        assert ("m0", "m16") not in pairs2
        assert out2.num_rows == 7

        # hash bits: integer block-mean comparison sanity
        flat = np.full((8, 8), 7, np.uint8)
        assert ahash_bits(flat, block=4).sum() == 0  # no block above mean


class TestPolygonCoverage:
    def test_square_coverage_fractions(self, ray_session):
        """A square polygon: interior cells reach coverage 1.0, edge
        cells land strictly between 0 and 1, total covered area
        approximates the square's area within the supersample grain."""
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
            cell_size,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.zonal import (
            polygon_coverage_ds,
        )

        s = cell_size(7)
        # CCW square 10x10 cells wide, offset to straddle boundaries
        x0, y0 = 77.0 + 0.3 * s, 28.0 + 0.6 * s
        w = 10 * s
        sq = {"sq": [(x0, y0), (x0 + w, y0), (x0 + w, y0 + w),
                     (x0, y0 + w)]}
        out = polygon_coverage_ds(sq, res=7, ss=8).to_pandas()
        assert (out["coverage"] > 0).all() and (out["coverage"] <= 1).all()
        assert (out["coverage"] == 1.0).sum() >= 81  # interior block
        assert ((out["coverage"] > 0) & (out["coverage"] < 1)).any()
        area_cells = out["coverage"].sum()
        assert abs(area_cells - 100.0) < 3.0  # ~10x10 cells of area


class TestBoundaryDistance:
    def test_segment_clamp_cases(self, ray_session):
        """Projection inside the segment, clamped to a vertex, and a
        point ON the boundary (distance 0) -- against hand geometry."""
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            boundary_distance,
        )

        sq = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)])
        lon = np.array([1.0, -3.0, 2.0, 1.0])
        lat = np.array([-1.0, -4.0, 1.0, 1.0])
        d = boundary_distance(lon, lat, sq)
        assert d[0] == 1.0          # perpendicular to bottom edge
        assert d[1] == 5.0          # clamped to corner (0,0): 3-4-5
        assert d[2] == 0.0          # on the right edge
        assert d[3] == 1.0          # interior: 1 from every edge


class TestInterpAndHausdorff:
    def test_linear_interp_brackets(self, ray_session):
        """Mid-gap interpolation, exact-timestamp hit, and grid points
        outside the span emitting nothing."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_linear_interp,
        )

        # points at t = 100, 200, 300 with values 10, 30, 20
        ev = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "user_id": pa.array([4] * 3, pa.int64()),
                "ts": pa.array([100, 200, 300], pa.timestamp("us")),
                "value": pa.array([10.0, 30.0, 20.0]),
            }
        )
        grid = [50, 150, 200, 250, 400]  # 50/400 out of span
        out = keyed_linear_interp(
            ray.data.from_arrow(ev), grid
        ).to_pandas().set_index("grid_us")
        assert sorted(out.index) == [150, 200, 250]
        assert out.loc[150, "value_interp"] == 20.0   # halfway 10->30
        assert out.loc[200, "value_interp"] == 30.0   # exact hit
        assert out.loc[250, "value_interp"] == 25.0   # halfway 30->20

    def test_hausdorff_hand_tracks(self, ray_session):
        """Two short tracks: symmetric Hausdorff equals the hand
        max-min; identical tracks give 0."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            track_hausdorff_pairs_ds,
        )

        # geocode lattice: user 0 on cols 0-2 of row 0; user 1 same
        # cols of row 5 -> every a has nearest b at dy = 5 rows and
        # vice versa; user 2 identical to user 0
        rows = []
        eid = 0
        for uid, r in ((0, 0), (1, 5), (2, 0)):
            for c in (0, 1, 2):
                rows.append({"event_id": r * 96 + c, "user_id": uid,
                             "ts": eid})
                eid += 1
        ev = pa.Table.from_pylist(rows).set_column(
            2, "ts",
            pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        )
        out = track_hausdorff_pairs_ds(
            ray.data.from_arrow(ev), max_user=3
        ).to_pandas().set_index(["user_a", "user_b"])
        lat = [28.05 + r * 0.01 for r in (0, 5)]
        want = abs(lat[1] - lat[0])
        assert abs(out.loc[(0, 1), "hausdorff"] - want) < 1e-9
        assert out.loc[(0, 2), "hausdorff"] == 0.0
        assert abs(out.loc[(1, 2), "hausdorff"] - want) < 1e-9


class TestStraightness:
    def test_beeline_vs_loop(self, ray_session):
        """A straight-line track scores 1.0; an out-and-back loop
        (return to start) scores 0."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            track_straightness_ds,
        )

        rows = []
        # user 1: cols 0..4 of row 0 (straight east)
        for i, c in enumerate(range(5)):
            rows.append({"event_id": c, "user_id": 1, "ts": i})
        # user 2: out to col 4 and back to col 0
        for i, c in enumerate([0, 4, 0]):
            rows.append({"event_id": c, "user_id": 2, "ts": 10 + i})
        ev = pa.Table.from_pylist(rows).set_column(
            2, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        out = track_straightness_ds(
            ray.data.from_arrow(ev)
        ).to_pandas().set_index("user_id")
        assert out.loc[1, "straightness"] == 1.0
        assert out.loc[2, "straightness"] == 0.0
        assert out.loc[2, "gross_len"] > 0


class TestBandMathNdi:
    def test_band_align_and_validity(self, ray_session):
        """Bands arrive as separate tile rows; NDI emits only pixels
        valid in BOTH bands, values match the direct computation."""
        import numpy as np
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            band_math_ndi,
        )

        tiles = entry._og_multiband_tiles_table((1, 2))
        out = band_math_ndi(
            ray.data.from_arrow(tiles), 1, 2
        ).to_pandas()
        rr, cc = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        a = (((rr * 73 + cc * 31 + 101) % 500) / 10.0).astype(
            np.float32).astype(np.float64)
        b = (((rr * 73 + cc * 31 + 202) % 500) / 10.0).astype(
            np.float32).astype(np.float64)
        va = (rr * 5 + cc * 3 + 1) % 29 != 0
        vb = (rr * 5 + cc * 3 + 2) % 29 != 0
        valid = va & vb
        assert len(out) == int(valid.sum())
        got = {(r, c): v for r, c, v in zip(out["row"], out["col"],
                                            out["ndi"])}
        ri, ci = np.nonzero(valid)
        for k in range(0, len(ri), 997):
            r, c = int(ri[k]), int(ci[k])
            want = (a[r, c] - b[r, c]) / (a[r, c] + b[r, c])
            assert got[(r, c)] == want


class TestCostDistance:
    def test_matches_whole_array_and_tiling_invariant(self, ray_session):
        """8 iterated halo-exchange rounds equal the single-array
        synchronous relaxation exactly, and the result is independent
        of the tiling (24px vs 48px tiles)."""
        import numpy as np
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            cost_distance_rounds,
        )

        def run(tile):
            tiles = entry._og_tiles_table(sparse_invalid=True, tile=tile)
            out = cost_distance_rounds(
                ray.data.from_arrow(tiles), seed_threshold=48.0, n_rounds=8
            ).to_pandas()
            return {(r, c): v for r, c, v in
                    zip(out["row"], out["col"], out["cost"])}

        got24 = run(24)
        got48 = run(48)
        assert got24 == got48  # tiling-invariant

        rr, cc = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        z = (((rr * 73 + cc * 31) % 500) / 10.0).astype(
            np.float32).astype(np.float64)
        invalid = (rr * 5 + cc * 3) % 29 == 0
        ent = np.where(~invalid, np.rint(z * 10.0), -1.0)
        cost = np.where(~invalid & (z >= 48.0), 0.0, np.inf)
        for _ in range(8):
            pad = np.full((98, 98), np.inf)
            pad[1:97, 1:97] = cost
            nb = np.fmin(
                np.fmin(pad[0:96, 1:97], pad[2:98, 1:97]),
                np.fmin(pad[1:97, 0:96], pad[1:97, 2:98]),
            )
            cand = nb + ent
            cost = np.where((ent >= 0) & (cand < cost), cand, cost)
        ri, ci = np.nonzero(np.isfinite(cost))
        want = {(int(r), int(c)): int(cost[r, c])
                for r, c in zip(ri, ci)}
        assert got24 == want
        # barriers: invalid pixels never appear
        assert all(not invalid[r, c] for r, c in got24)


class TestMobilityMetrics:
    def test_rog_hand_cases(self, ray_session):
        """Single-location user: rog 0.  Two equidistant locations:
        rog = half the separation."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            radius_of_gyration_ds,
        )

        rows = []
        # user 1: same cell 4 times (eid constant lattice point)
        rows += [{"event_id": 10, "user_id": 1}] * 4
        # user 2: alternating cols 0 and 10 of row 0 -> centroid at 5,
        # every fix 5 cols away -> rog = 5 * 0.01 = 0.05
        rows += [{"event_id": c, "user_id": 2} for c in (0, 10, 0, 10)]
        ev = pa.Table.from_pylist(rows)
        out = radius_of_gyration_ds(
            ray.data.from_arrow(ev)
        ).to_pandas().set_index("user_id")
        assert out.loc[1, "rog"] == 0.0
        assert out.loc[2, "rog"] == 0.05


class TestTheilSen:
    def test_robust_to_outlier(self, ray_session):
        """A clean linear trend with one wild outlier: Theil-Sen
        recovers the true slope where the mean-based fit would not."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            theil_sen_by_key,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            mix32,
        )

        # choose event_ids that PASS the hash gate (mod 1 = keep all)
        n = 30
        ts = np.arange(n, dtype=np.int64) * 86400000000  # daily
        vals = 10.0 + 2.5 * np.arange(n)  # +2.5/day
        vals[7] = 10000.0  # outlier
        ev = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(["t"] * n),
                "ts": pa.array(ts, pa.timestamp("us")),
                "value": pa.array(vals),
            }
        )
        out = theil_sen_by_key(
            ray.data.from_arrow(ev), "event_type", sample_mod=1
        ).to_pandas()
        # ts_slope is CENTS per day: +2.5 value/day = +250 cents/day
        assert abs(out.loc[0, "ts_slope"] - 250.0) < 1e-6


class TestKaplanMeier:
    def test_textbook_censoring(self, ray_session):
        """5 users: events (first 'error') at day 1, 2, 4; censoring
        (no error, last seen) at day 3 and 5.  Classic KM:
        S(1)=4/5, S(2)=4/5*3/4=3/5, S(4)=3/5*1/2=3/10."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            kaplan_meier,
        )

        DAY = 86400000000
        rows = []

        def user(uid, error_day, last_day):
            rows.append({"user_id": uid, "ts": 0, "event_type": "view"})
            if error_day is not None:
                rows.append({"user_id": uid, "ts": error_day * DAY,
                             "event_type": "error"})
            rows.append({"user_id": uid, "ts": last_day * DAY,
                         "event_type": "view"})

        user(1, 1, 6)
        user(2, 2, 6)
        user(3, None, 3)
        user(4, 4, 6)
        user(5, None, 5)
        ev = pa.Table.from_pylist(rows).set_column(
            1, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        out = kaplan_meier(
            ray.data.from_arrow(ev), event_type="error"
        ).to_pandas()
        got = dict(zip(out["t_us"] // DAY, out["survival"]))
        assert got == {1: 0.8, 2: 0.6, 4: 0.3}
        risk = dict(zip(out["t_us"] // DAY, out["n_at_risk"]))
        assert risk == {1: 5, 2: 4, 4: 2}


class TestIntervalUnion:
    def test_overlap_merge(self, ray_session):
        """Three overlapping intervals merge into one island; a
        distant fourth stays separate; covered time never
        double-counts the overlaps."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_interval_union,
        )

        # window 100 s: events at t=0, 50, 120 chain (0-100, 50-150,
        # 120-220 -> one island 0-220); event at t=1000 is separate
        ev = pa.table(
            {
                "user_id": pa.array([1] * 4, pa.int64()),
                "ts": pa.array(
                    [0, 50_000_000, 120_000_000, 1_000_000_000],
                    pa.timestamp("us"),
                ),
            }
        )
        out = keyed_interval_union(
            ray.data.from_arrow(ev), window_s=100.0
        ).to_pandas()
        assert out.loc[0, "n_islands"] == 2
        assert out.loc[0, "covered_us"] == 220_000_000 + 100_000_000


class TestZipfSlope:
    def test_synthetic_zipf_corpus(self, ray_session, tmp_path):
        """A corpus where token k appears ~C/k times fits slope ~ -1."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        words = []
        C = 2000
        for k in range(1, 101):
            words += [f"w{k:03d}"] * (C // k)
        rng = np.random.default_rng(5)
        rng.shuffle(words)
        # spread across 20 docs
        docs = [" ".join(words[i::20]) for i in range(20)]
        t = pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en"] * 20),
                "source": pa.array(["s"] * 20),
                "n_chars": pa.array([len(d) for d in docs], pa.int64()),
            }
        )
        d = tmp_path / "zipf"
        d.mkdir()
        pq.write_table(t, d / "documents.parquet")
        out = entry.queries()["zipf_slope"](str(d)).to_pandas()
        assert out.loc[0, "n_vocab"] == 100
        assert abs(out.loc[0, "zipf_slope"] + 1.0) < 0.05


class TestBounceBurstiness:
    def test_bounce_sessions(self, ray_session):
        """Events at 0s, 10s (one session), 4000s (bounce), 9000s,
        9010s (session): 3 sessions, 1 bounce."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_bounce_rate,
        )

        ts = [0, 10, 4000, 9000, 9010]
        ev = pa.table(
            {
                "user_id": pa.array([1] * 5, pa.int64()),
                "ts": pa.array([t * 1_000_000 for t in ts],
                               pa.timestamp("us")),
            }
        )
        out = keyed_bounce_rate(
            ray.data.from_arrow(ev), gap_s=1800.0
        ).to_pandas()
        assert out.loc[0, "n_sessions"] == 3
        assert out.loc[0, "n_bounces"] == 1
        assert abs(out.loc[0, "bounce_rate"] - 1 / 3) < 1e-6

    def test_burstiness_extremes(self, ray_session):
        """Metronome gaps -> B = -1 (sigma 0); highly bursty gaps
        -> B > 0."""
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_burstiness,
        )

        rows = []
        for i in range(10):  # user 1: exact 60 s metronome
            rows.append({"user_id": 1, "ts": i * 60_000_000})
        t = 0
        for i, g in enumerate([1, 1, 1, 1, 1, 1, 1, 1, 10000]):
            rows.append({"user_id": 2, "ts": t})
            t += g * 1_000_000
        rows.append({"user_id": 2, "ts": t})
        ev = pa.Table.from_pylist(rows).set_column(
            1, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        out = keyed_burstiness(
            ray.data.from_arrow(ev)
        ).to_pandas().set_index("user_id")
        assert out.loc[1, "burstiness"] == -1.0
        # finite-size max for 9 gaps is (sqrt(8)-1)/(sqrt(8)+1) ~ 0.48
        assert out.loc[2, "burstiness"] > 0.4


class TestConvoyPairs:
    def test_consecutive_run_semantics(self, ray_session, tmp_path):
        """Two users sharing a cell in windows 5,6,7 (run 3) and 20
        (isolated) convoy; a pair meeting only in scattered windows
        does not."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        WIN = 600_000_000
        rows = []
        eid = 0

        def fix(uid, win, cell_col):
            nonlocal eid
            # geocode cell = ((eid%96)//8)*12 + ((eid//96)%96)//8
            rows.append({"event_id": cell_col * 8, "user_id": uid,
                         "ts": win * WIN + uid,
                         "event_type": "view", "value": 1.0,
                         "props": "{}"})

        for w in (5, 6, 7, 20):
            fix(1, w, 0)
            fix(2, w, 0)
        for w in (3, 9, 15):  # scattered meetings only
            fix(1, w, 5)
            fix(3, w, 5)
        t = pa.Table.from_pylist(rows).set_column(
            2, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        d = tmp_path / "convoy"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        out = entry.queries()["convoy_pairs"](str(d)).to_pandas()
        assert len(out) == 1
        assert (out.loc[0, "user_a"], out.loc[0, "user_b"]) == (1, 2)
        assert out.loc[0, "max_run"] == 3
        assert out.loc[0, "n_cowindows"] == 4


class TestTerrainCLI:
    def test_terrain_subcommand(self, ray_session, tmp_path):
        """The terrain CLI runs a halo-exchange op end-to-end from a
        tiles parquet to a parquet output."""
        import json
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.__main__ import main

        tiles = tmp_path / "tiles.parquet"
        pq.write_table(
            entry._og_tiles_table(sparse_invalid=True, tile=24), tiles
        )
        out = tmp_path / "slope_out"
        rc = main(["terrain", "--tiles", str(tiles), "--out", str(out),
                   "--op", "slope"])
        assert rc in (0, None)
        got = pq.read_table(out)
        assert got.num_rows == 6094
        assert set(got.column_names) >= {"row", "col", "slope_pct"}


class TestTracksCLI:
    def test_tracks_subcommand(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from tiff_to_geojson_csv_json_format_converter_ray.__main__ import main

        out = tmp_path / "speed_out"
        rc = main(["tracks", "--events",
                   "/root/testdata/sf0.001/events.parquet",
                   "--out", str(out), "--op", "speed"])
        assert rc in (0, None)
        got = pq.read_table(out)
        assert got.num_rows == 15
        assert set(got.column_names) >= {"user_id", "max_speed",
                                         "n_speeding"}


class TestSession3Properties:
    def test_geofence_alternates_and_interval_bounds(self, ray_session):
        """Properties on random tracks: (1) per (user, polygon) the
        transition sequence strictly alternates starting with enter;
        (2) interval-union coverage is bounded by [window, n*window];
        (3) region labels partition the above-threshold pixel set."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.tracks import (
            geofence_transitions_ds,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.window import (
            keyed_interval_union,
        )

        rng = np.random.default_rng(11)
        n = 400
        ev = pa.table(
            {
                "event_id": pa.array(
                    rng.integers(0, 96 * 96, n).astype(np.int64)
                ),
                "user_id": pa.array(
                    rng.integers(1, 6, n).astype(np.int64)
                ),
                "ts": pa.array(
                    np.sort(rng.integers(0, 10**12, n)).astype(np.int64),
                    pa.timestamp("us"),
                ),
            }
        )
        poly = {"box": [(77.2, 28.2), (77.7, 28.2), (77.7, 28.7),
                        (77.2, 28.7)]}
        out = geofence_transitions_ds(
            ray.data.from_arrow(ev), poly
        ).to_pandas()
        # transitions arrive in track order within each group output;
        # verify alternation per user via the engine's own ordering
        # (a track may START inside the fence, so the first transition
        # can be either kind -- only strict alternation is invariant)
        for uid, grp in out.groupby("user_id"):
            seq = list(grp["transition"])
            for a, b in zip(seq, seq[1:]):
                assert a != b, (uid, seq)

        cov = keyed_interval_union(
            ray.data.from_arrow(ev), window_s=3600.0
        ).to_pandas()
        w_us = 3600 * 1_000_000
        counts = ev.to_pandas().groupby("user_id").size()
        for _, row in cov.iterrows():
            n_ev = counts[row["user_id"]]
            assert w_us <= row["covered_us"] <= n_ev * w_us
            assert 1 <= row["n_islands"] <= n_ev

    def test_region_labels_partition(self, ray_session):
        import numpy as np
        import ray.data
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            tile_region_labels,
        )

        tiles = entry._og_tiles_table(sparse_invalid=True, tile=24)
        out = tile_region_labels(
            ray.data.from_arrow(tiles), threshold=45.0
        ).to_pandas()
        rr, cc = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        z = (((rr * 73 + cc * 31) % 500) / 10.0).astype(
            np.float32).astype(np.float64)
        above = (z >= 45.0) & ((rr * 5 + cc * 3) % 29 != 0)
        # the regions partition the above-threshold set exactly
        assert out["n_pixels"].sum() == int(above.sum())
        # reps are themselves above-threshold pixels
        for rep in out["rep"]:
            r, c = rep >> 20, rep & ((1 << 20) - 1)
            assert above[r, c]


class TestAnovaEta2:
    def test_effect_size_extremes(self, ray_session, tmp_path):
        """value = f(hour) exactly -> eta^2 = 1; value independent of
        hour -> eta^2 ~ 0."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        HOUR = 3_600_000_000
        rows = []
        rng = np.random.default_rng(2)
        for i in range(2000):
            h = int(rng.integers(0, 24))
            ts = h * HOUR + int(rng.integers(0, 1000)) * 24 * HOUR
            rows.append({"event_id": i, "user_id": 1, "ts": ts,
                         "event_type": "hourly", "value": 10.0 + h,
                         "props": "{}"})
            rows.append({"event_id": 10_000 + i, "user_id": 1, "ts": ts,
                         "event_type": "flat",
                         "value": float(rng.integers(0, 100)),
                         "props": "{}"})
        t = pa.Table.from_pylist(rows).set_column(
            2, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        d = tmp_path / "anova"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        out = entry.queries()["anova_eta2"](str(d)).to_pandas().set_index(
            "event_type"
        )
        assert out.loc["hourly", "eta_squared"] == 1.0
        assert out.loc["flat", "eta_squared"] < 0.05


class TestMannWhitney:
    def test_shifted_distribution_detected(self, ray_session, tmp_path):
        """Arm values shifted upward produce a strongly negative /
        positive z (direction per arm assignment); identical
        distributions give |z| small.  Rank handling cross-checked
        against scipy-free closed form on a tiny case."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            mix32,
        )

        rng = np.random.default_rng(8)
        uids = np.arange(4000, dtype=np.int64)
        arms = mix32(uids, 13) % 2
        vals = np.where(
            arms == 0,
            rng.normal(50, 5, 4000),
            rng.normal(60, 5, 4000),  # arm B shifted up
        ).round(2)
        t = pa.table(
            {
                "event_id": pa.array(uids),
                "user_id": pa.array(uids),
                "ts": pa.array(uids, pa.timestamp("us")),
                "event_type": pa.array(["x"] * 4000),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * 4000),
            }
        )
        d = tmp_path / "mw"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        out = entry.queries()["mann_whitney"](str(d)).to_pandas()
        # arm A ranks far below arm B -> U_A far below mean -> very
        # negative z
        assert out.loc[0, "z_stat"] < -20


class TestKruskalWallis:
    def test_shifted_group_detected(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        rng = np.random.default_rng(4)
        rows = []
        for i in range(3000):
            g = ["a", "b", "c"][i % 3]
            v = rng.normal(50 if g != "c" else 70, 5)
            rows.append({"event_id": i, "user_id": 1, "ts": i,
                         "event_type": g, "value": round(float(v), 2),
                         "props": "{}"})
        t = pa.Table.from_pylist(rows).set_column(
            2, "ts", pa.array([r["ts"] for r in rows], pa.timestamp("us"))
        )
        d = tmp_path / "kw"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        out = entry.queries()["kruskal_wallis"](str(d)).to_pandas()
        assert out.loc[0, "n_groups"] == 3
        assert out.loc[0, "h_stat"] > 500  # c is far shifted


class TestLineOfSight:
    def test_flat_vs_wall(self, ray_session):
        """Flat terrain: visible (clearance above ground).  A wall
        between the endpoints blocks; a wall OFF the line does not."""
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
            line_of_sight,
        )

        tf = [0.01, 0.0, 77.0, 0.0, -0.01, 29.0]
        z = np.full((96, 96), 10.0)
        valid = np.ones((96, 96), bool)
        a = (77.0 + 0.10, 29.0 - 0.50)  # col 10, row 50
        b = (77.0 + 0.80, 29.0 - 0.50)  # col 80, row 50
        vis, nb = line_of_sight(z, valid, *a, *b, tf)
        assert vis and nb == 0

        z2 = z.copy()
        z2[50, 40] = 100.0  # wall on the line
        vis2, nb2 = line_of_sight(z2, valid, *a, *b, tf)
        assert not vis2 and nb2 >= 1

        z3 = z.copy()
        z3[20, 40] = 100.0  # wall far off the line
        vis3, _ = line_of_sight(z3, valid, *a, *b, tf)
        assert vis3

        # invalid wall pixel does not block
        valid4 = valid.copy()
        valid4[50, 40] = False
        vis4, _ = line_of_sight(z2, valid4, *a, *b, tf)
        assert vis4


class TestSpearman:
    def test_monotone_vs_noise(self, ray_session, tmp_path):
        """A perfectly monotone (nonlinear) relation scores rho = 1;
        shuffled values score ~0."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as entry

        rng = np.random.default_rng(6)
        n = 500
        q = rng.permutation(np.arange(1, n + 1)).astype(np.float64)
        rows = []
        for i in range(n):
            rows.append({"l_returnflag": "M", "l_quantity": float(q[i]),
                         "l_extendedprice": float(q[i] ** 3) / 100.0})
            rows.append({"l_returnflag": "Z", "l_quantity": float(q[i]),
                         "l_extendedprice": float(rng.integers(1, 10**6))
                         / 100.0})
        t = pa.Table.from_pylist(rows)
        d = tmp_path / "sp"
        d.mkdir()
        pq.write_table(t, d / "lineitem.parquet")
        out = entry.queries()["spearman"](str(d)).to_pandas().set_index(
            "l_returnflag"
        )
        assert out.loc["M", "spearman_rho"] == 1.0
        assert abs(out.loc["Z", "spearman_rho"]) < 0.1


class TestAdaptiveQuadtree:
    def test_skewed_cluster_splits_deeper(self, ray_session):
        """A dense hot cluster splits to res_max while sparse
        background cells stay coarse; the final cells PARTITION the
        point set (counts sum exactly)."""
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
            adaptive_quadtree, cell_size,
        )

        rng = np.random.default_rng(9)
        # background: 500 points spread over ~1 degree
        lon_bg = 77.0 + rng.uniform(0, 1.0, 500)
        lat_bg = 28.0 + rng.uniform(0, 1.0, 500)
        # hot cluster: 2000 points strictly inside ONE res-8 cell
        # (anchor at the cell origin -- an arbitrary anchor straddles
        # a boundary and splits the cluster)
        s8 = cell_size(8)
        ix0 = np.floor((77.4 + 180.0) / s8)
        iy0 = np.floor((28.4 + 90.0) / s8)
        lon_hot = (ix0 * s8 - 180.0) + s8 * (0.05 + 0.9 * rng.uniform(0, 1, 2000))
        lat_hot = (iy0 * s8 - 90.0) + s8 * (0.05 + 0.9 * rng.uniform(0, 1, 2000))
        pts = ray.data.from_arrow(pa.table(
            {
                "lon": pa.array(np.concatenate([lon_bg, lon_hot])),
                "lat": pa.array(np.concatenate([lat_bg, lat_hot])),
            }
        ))
        out = adaptive_quadtree(
            pts, res_min=5, res_max=8, max_points=50
        ).to_pandas()
        assert out["n_points"].sum() == 2500  # partition
        assert (out["n_points"][out["res"] < 8] <= 50).all()
        deepest = out[out["res"] == 8]
        assert len(deepest) >= 1
        assert deepest["n_points"].max() >= 2000  # the hot cell


class TestCoverBbox:
    def test_cover_is_exact_partition_of_query(self, ray_session):
        """The cover's full cells lie inside the bbox; partial cells
        touch the boundary; together they contain every in-bbox point
        and no full cell sticks out."""
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
            cell_size, cover_bbox,
        )

        minx, miny, maxx, maxy = 10.0, 20.0, 10.5, 20.4
        out = cover_bbox(minx, miny, maxx, maxy, 5, 8).to_pandas()
        for _, row in out.iterrows():
            s = cell_size(int(row["res"]))
            cx0 = row["ix"] * s - 180.0
            cy0 = row["iy"] * s - 90.0
            cx1 = cx0 + s
            cy1 = cy0 + s
            if row["full"] == 1:
                assert cx0 >= minx and cx1 <= maxx
                assert cy0 >= miny and cy1 <= maxy
            else:
                assert int(row["res"]) == 8
                # partial cells intersect but are not contained
                assert cx1 > minx and cx0 < maxx
                assert cy1 > miny and cy0 < maxy

        # random in-bbox points are covered by some cell
        rng = np.random.default_rng(3)
        px = rng.uniform(minx, maxx, 200)
        py = rng.uniform(miny, maxy, 200)
        cells = set()
        for _, row in out.iterrows():
            cells.add((int(row["res"]), int(row["iy"]), int(row["ix"])))
        for x, y in zip(px, py):
            hit = any(
                (r, int(np.floor((y + 90.0) / cell_size(r))),
                 int(np.floor((x + 180.0) / cell_size(r)))) in cells
                for r in range(5, 9)
            )
            assert hit


class TestHashAggregateAutoTier:
    def test_auto_routes_and_matches(self, ray_session):
        """combine_tier='auto' routes on the materialized partial-row
        count; both routes give identical aggregates (round-4 tier,
        the exact_dedup/pages_flagship routing pattern)."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            hash_aggregate,
        )

        rng = np.random.RandomState(3)
        t = pa.table(
            {
                "k": pa.array(rng.randint(0, 500, 20_000)),
                "v": pa.array(rng.randint(0, 1000, 20_000).astype(np.int64)),
            }
        )
        ds = ray.data.from_arrow(t).repartition(8)
        aggs = [("v", "sum", "sv"), ("v", "min", "mn"),
                ("v", "max", "mx"), ("v", "count", "n")]
        drv = hash_aggregate(ds, ["k"], aggs)
        # tiny threshold forces the shuffle route inside auto
        shf = hash_aggregate(
            ds, ["k"], aggs, combine_tier="auto", max_driver_rows=1
        )
        # and a huge threshold keeps auto on the driver route
        auto_drv = hash_aggregate(
            ds, ["k"], aggs, combine_tier="auto",
            max_driver_rows=10_000_000,
        )
        want = sorted(drv.to_pylist(), key=lambda r: r["k"])
        assert sorted(shf.to_pylist(), key=lambda r: r["k"]) == want
        assert sorted(auto_drv.to_pylist(), key=lambda r: r["k"]) == want

    def test_distinct_auto_tier(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            distinct,
        )

        rng = np.random.RandomState(5)
        t = pa.table({"a": rng.randint(0, 300, 10_000),
                      "b": rng.randint(0, 3, 10_000)})
        ds = ray.data.from_arrow(t).repartition(6)
        want = sorted(distinct(ds, ["a", "b"]).to_pylist(), key=str)
        got = sorted(
            distinct(ds, ["a", "b"], combine_tier="auto",
                     max_driver_rows=1).to_pylist(),
            key=str,
        )
        assert got == want and len(want) > 500


class TestBandedHashPairs:
    def test_banded_tier_matches_driver(self, ray_session):
        """The banded-LSH scale tier (signatures stay a Dataset, band
        groupby + exact popcount verify, distributed) returns the
        exact same pair set as the driver all-pairs tier for both
        perceptual hashes, across partitionings."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            gen_media_grid, image_ahash_pairs, image_dhash_pairs,
        )

        media_tbl = gen_media_grid(n=24, size=32, n_base=16)

        def norm(t):
            return sorted(
                (r["id_a"], r["id_b"], r["hamming"]) for r in t.to_pylist()
            )

        for fn in (image_ahash_pairs, image_dhash_pairs):
            drv = norm(fn(ray.data.from_arrow(media_tbl)))
            assert drv, fn.__name__  # fixture plants near-dups
            for parts in (1, 5):
                ds = ray.data.from_arrow(media_tbl).repartition(parts)
                got = norm(fn(ds, tier="banded"))
                assert got == drv, (fn.__name__, parts)

    def test_banded_tier_wide_signatures(self, ray_session):
        """ADVICE r4 regression: 64x64 images produce 256-bit ahash
        signatures; the banded tier must carry them as multi-word
        packed binary (a single int64 wraps shifts mod 64 and the
        exact-Hamming verify silently corrupts -- the r4 advisor
        reproduced 0 driver pairs vs 58 spurious banded pairs)."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            gen_media_grid, image_ahash_pairs,
        )

        media_tbl = gen_media_grid(n=24, size=64, n_base=16)

        def norm(t):
            return sorted(
                (r["id_a"], r["id_b"], r["hamming"]) for r in t.to_pylist()
            )

        drv = norm(image_ahash_pairs(
            ray.data.from_arrow(media_tbl), max_hamming=40))
        for parts in (1, 5):
            ds = ray.data.from_arrow(media_tbl).repartition(parts)
            got = norm(image_ahash_pairs(ds, max_hamming=40, tier="banded"))
            assert got == drv, parts


class TestMediaCLI:
    def test_media_subcommand(self, ray_session, tmp_path):
        """The media CLI runs container-metadata / decode stages from
        a payload parquet to parquet or JSON."""
        import json
        import pyarrow.parquet as pq

        from tiff_to_geojson_csv_json_format_converter_ray.__main__ import main
        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            gen_media_audio, gen_media_mp4,
        )

        vids = tmp_path / "vids.parquet"
        pq.write_table(gen_media_mp4(n=4), vids)
        out = tmp_path / "meta_out"
        rc = main(["media", "--table", str(vids), "--out", str(out)])
        assert rc in (0, None)
        got = pq.read_table(out)
        assert got.num_rows == 4
        assert set(got.column_names) >= {
            "media_id", "duration_seconds", "n_tracks", "codec0",
        }

        auds = tmp_path / "auds.parquet"
        pq.write_table(gen_media_audio(n=4), auds)
        rc = main(["media", "--table", str(auds),
                   "--mode", "audio-metadata"])
        assert rc in (0, None)

    def test_media_decode_flac_via_cli(self, ray_session, tmp_path):
        """--mode decode with the real decoder runs the RFC 9639 FLAC
        sample codec end-to-end from a payload parquet (round 5)."""
        import pyarrow.parquet as pq

        from tiff_to_geojson_csv_json_format_converter_ray.__main__ import main
        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            gen_media_flac,
        )

        flacs = tmp_path / "flacs.parquet"
        pq.write_table(gen_media_flac(n=4), flacs)
        out = tmp_path / "decode_out"
        rc = main(["media", "--table", str(flacs), "--mode", "decode",
                   "--decoder", "real", "--out", str(out)])
        assert rc in (0, None)
        got = pq.read_table(out)
        assert got.num_rows == 4
        assert set(got.column_names) >= {"media_id", "pixel_mean", "pixel_std"}
        # lossless decode of the formula fixture: mean of clip f0 is
        # exactly -0.5 (s[t] = ((t*3) % 200) - 100 over 600 samples)
        m = {
            r["media_id"]: r["pixel_mean"] for r in got.to_pylist()
        }
        assert m["f0"] == -0.5
