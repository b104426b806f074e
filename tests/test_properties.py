"""Property tests (SURVEY par.5c): invariants that must hold under ANY
partitioning or parameter draw -- the guarantees the 100 TB regime
depends on."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tiff_to_geojson_csv_json_format_converter_ray.functions import cells
from tiff_to_geojson_csv_json_format_converter_ray.stages.sampling import (
    StrideSampler, sample_rate_for,
)
from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
    combine_partials, finalize_stats, partial_stats_batch,
)
from tiff_to_geojson_csv_json_format_converter_ray.stages.transform import (
    ValidityFilter,
)


def _points(n, seed):
    rng = np.random.RandomState(seed)
    z = rng.rand(n) * 100
    z[rng.rand(n) < 0.2] = -3.4028234663852886e38
    return pa.table(
        {
            "src": pa.array(rng.choice(["a", "b", "c"], size=n)),
            "band": pa.array(rng.choice([1, 2], size=n).astype(np.int32)),
            "z": pa.array(z),
            "pix": pa.array(np.arange(n)),
        }
    )


class TestPartitionInvariance:
    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(10, 500), seed=st.integers(0, 99),
           cuts=st.lists(st.integers(1, 499), max_size=4))
    def test_stats_partial_final_equals_single_pass(self, n, seed, cuts):
        """A1 partial/final == single-pass regardless of block splits."""
        t = _points(n, seed)
        keys = ["src", "band"]
        whole = combine_partials(partial_stats_batch(t, keys), keys)

        offsets = sorted({c % n for c in cuts} | {0, n})
        parts = [
            partial_stats_batch(t.slice(a, b - a), keys)
            for a, b in zip(offsets[:-1], offsets[1:])
            if b > a
        ]
        split = combine_partials(
            pa.concat_tables(parts, promote_options="default"), keys
        )

        def norm(x):
            return (
                x.to_pandas()
                .sort_values(keys)
                .reset_index(drop=True)
                .round(9)
            )

        assert norm(finalize_stats(whole)).equals(norm(finalize_stats(split)))

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(10, 500), seed=st.integers(0, 99), cut=st.integers(1, 499))
    def test_filter_commutes_with_split(self, n, seed, cut):
        t = _points(n, seed)
        vf = ValidityFilter("threshold")
        whole = vf(t)
        c = cut % n or 1
        split = pa.concat_tables([vf(t.slice(0, c)), vf(t.slice(c))])
        assert whole.equals(split)

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 2000), rate=st.integers(1, 50), cut=st.integers(1, 1999))
    def test_stride_split_invariant(self, n, rate, cut):
        """pix%%rate sampling picks the same set under any split --
        equals the reference's arange(0, n, rate)."""
        t = pa.table(
            {"pix": pa.array(np.arange(n)), "src": pa.array(["s"] * n)}
        )
        s = StrideSampler(rate)
        whole = s(t)["pix"].to_numpy()
        c = cut % n or 1
        split = pa.concat_tables([s(t.slice(0, c)), s(t.slice(c))])["pix"].to_numpy()
        np.testing.assert_array_equal(whole, split)
        np.testing.assert_array_equal(whole, np.arange(0, n, rate))

    @settings(max_examples=50, deadline=None)
    @given(total=st.integers(1, 10_000_000), cap=st.integers(1, 200_000))
    def test_sample_rate_reference_arith(self, total, cap):
        r = sample_rate_for(total, cap)
        assert r >= 1
        if total > cap:
            assert r == total // cap  # doesSamples.py:74-77


class TestTilingInvariance:
    def test_retiling_preserves_extraction(self):
        """The same raster tiled at ANY tile size yields the identical
        point set (lon/lat/z/pix) -- the tiling layer is purely a
        partitioning choice (north-rule tile-assignment contract)."""
        import pyarrow as pa

        from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
            TilePivot, master_widths_of,
        )

        H = W = 48
        rng = np.random.RandomState(0)
        master = rng.rand(H, W).astype(np.float32) * 100
        transform = [0.01, 0.0, 77.0, 0.0, -0.01, 29.0]

        def tiles_at(ts: int) -> pa.Table:
            rows = []
            for r0 in range(0, H, ts):
                for c0 in range(0, W, ts):
                    rows.append(
                        {
                            "tile_id": f"t{r0}_{c0}", "src": "m", "band": 1,
                            "row_off": r0, "col_off": c0,
                            "height": min(ts, H - r0), "width": min(ts, W - c0),
                            "transform": transform, "crs": "EPSG:4326",
                            "nodata": -9999.0,
                            "values": master[
                                r0 : r0 + ts, c0 : c0 + ts
                            ].ravel().tolist(),
                        }
                    )
            return pa.Table.from_pylist(rows)

        results = {}
        for ts in (48, 24, 16, 8):
            t = tiles_at(ts)
            pivot = TilePivot(
                round_output=True, reproject=True,
                master_widths=master_widths_of(t),
            )
            out = pa.concat_tables(list(pivot(t)))
            idx = np.argsort(out["pix"].to_numpy(), kind="stable")
            results[ts] = {
                c: out[c].to_numpy(zero_copy_only=False)[idx]
                for c in ("pix", "lon", "lat", "z")
            }
        base = results[48]
        for ts in (24, 16, 8):
            for c in ("pix", "lon", "lat", "z"):
                np.testing.assert_array_equal(results[ts][c], base[c], err_msg=f"{ts}/{c}")


class TestCellProperties:
    @settings(max_examples=50, deadline=None)
    @given(
        lon=st.floats(-179.999, 179.999), lat=st.floats(-89.999, 89.999),
        res=st.integers(1, 12),
    )
    def test_point_in_own_cell_bounds(self, lon, lat, res):
        c = cells.cell_of(np.array([lon]), np.array([lat]), res)
        minlon, minlat, maxlon, maxlat = cells.cell_bounds(int(c[0]))
        # 1e-13 tolerance: (lon+180) quantizes at ulp(180) ~ 2.8e-14, so
        # points within half an ulp of a boundary land on its right cell
        assert minlon - 1e-13 <= lon < maxlon + 1e-13
        assert minlat - 1e-13 <= lat < maxlat + 1e-13

    @settings(max_examples=50, deadline=None)
    @given(
        lon=st.floats(-179.999, 179.999), lat=st.floats(-89.999, 89.999),
        res=st.integers(1, 12),
    )
    def test_parent_contains_child(self, lon, lat, res):
        child = cells.cell_of(np.array([lon]), np.array([lat]), res)
        parent_direct = cells.cell_of(np.array([lon]), np.array([lat]), res - 1)
        np.testing.assert_array_equal(cells.parent(child), parent_direct)

    @settings(max_examples=20, deadline=None)
    @given(
        minlon=st.floats(-170, 160), minlat=st.floats(-80, 70),
        dlon=st.floats(0.001, 5.0), dlat=st.floats(0.001, 5.0),
        res=st.integers(4, 9),
    )
    def test_bbox_cells_cover_contained_points(self, minlon, minlat, dlon, dlat, res):
        maxlon, maxlat = minlon + dlon, minlat + dlat
        cover = set(cells.cells_for_bbox(minlon, minlat, maxlon, maxlat, res).tolist())
        rng = np.random.RandomState(0)
        lons = minlon + rng.rand(50) * dlon
        lats = minlat + rng.rand(50) * dlat
        pts = cells.cell_of(lons, lats, res)
        assert set(pts.tolist()) <= cover


class TestClipProperties:
    @given(
        st.integers(0, 10_000),
    )
    @settings(max_examples=40, deadline=None)
    def test_clip_idempotent_and_bounded(self, seed):
        """clip(clip(s, c), c) == clip(s, c) (same area) and
        area(clip) <= min(area(s), area(c))."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            Polygon, clip_polygon_convex, polygon_area,
        )

        rng = np.random.RandomState(seed)
        ang = np.sort(rng.rand(5 + seed % 4) * 2 * np.pi)
        clip = Polygon("c", [np.c_[
            0.5 + (0.2 + rng.rand() * 0.3) * np.cos(ang),
            0.5 + (0.2 + rng.rand() * 0.3) * np.sin(ang),
        ]])
        ang2 = np.sort(rng.rand(4) * 2 * np.pi)
        subj = Polygon("s", [np.c_[
            rng.rand() * 0.4 + 0.3 + 0.35 * np.cos(ang2),
            rng.rand() * 0.4 + 0.3 + 0.35 * np.sin(ang2),
        ]])
        once = clip_polygon_convex(subj, clip)
        if once is None:
            return
        a1 = polygon_area(once)
        assert a1 <= polygon_area(subj) + 1e-9
        assert a1 <= polygon_area(clip) + 1e-9
        twice = clip_polygon_convex(once, clip)
        a2 = polygon_area(twice) if twice is not None else 0.0
        assert abs(a2 - a1) < 1e-9

    @given(st.integers(0, 10_000))
    @settings(max_examples=40, deadline=None)
    def test_focal_mean_constant_field(self, seed):
        """Focal mean of a constant field is that constant, any layout."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions import (
            cells as C,
        )

        rng = np.random.RandomState(seed)
        n = rng.randint(1, 200)
        lon = rng.uniform(-170, 170, n)
        lat = rng.uniform(-80, 80, n)
        ids = np.unique(C.cell_of(lon, lat, 8))
        got = C.focal_mean(ids, np.full(len(ids), 7.25), k=1)
        np.testing.assert_allclose(got, 7.25, atol=1e-12)


class TestLateRound2Properties:
    @settings(max_examples=30, deadline=None)
    @given(n=st.integers(4, 400), seed=st.integers(0, 999),
           splits=st.integers(1, 6))
    def test_convex_hull_merge_equals_global(self, n, seed, splits):
        """hull(union of per-split hulls) == hull(all points), and
        every input point lies inside (or on) the hull."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            _monotone_chain, convex_hull_candidates,
        )

        rng = np.random.RandomState(seed)
        x = rng.randn(n) * 10
        y = rng.randn(n) * 10
        ref = _monotone_chain(np.column_stack([x, y]))
        parts = [
            convex_hull_candidates(x[i::splits], y[i::splits])
            for i in range(splits)
            if len(x[i::splits])
        ]
        merged = _monotone_chain(np.vstack(parts))
        assert np.array_equal(
            np.sort(merged, axis=0), np.sort(ref, axis=0)
        )
        if len(ref) >= 3:
            hx, hy = ref[:, 0], ref[:, 1]
            bx, by = np.roll(hx, -1), np.roll(hy, -1)
            for i in range(len(ref)):
                cross = (bx[i] - hx[i]) * (y - hy[i]) - (by[i] - hy[i]) * (
                    x - hx[i]
                )
                assert (cross >= -1e-9).all()

    @settings(max_examples=20, deadline=None)
    @given(seed=st.integers(0, 999))
    def test_bpe_merges_independent_of_word_order(self, seed):
        """Training on a permuted word-count table yields identical
        merges (determinism under any distinct-word ordering)."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions.bpe import (
            train_merges,
        )

        rng = np.random.RandomState(seed)
        words = ["low", "lower", "lowest", "newer", "newest", "wide",
                 "wider", "widest"]
        counts = rng.randint(1, 50, len(words)).tolist()
        perm = rng.permutation(len(words))
        t1 = pa.table({"word": words, "n": counts})
        t2 = pa.table(
            {
                "word": [words[i] for i in perm],
                "n": [counts[i] for i in perm],
            }
        )
        assert train_merges(t1, 12).equals(train_merges(t2, 12))

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(2, 200), seed=st.integers(0, 999))
    def test_stay_points_cover_and_dwell(self, n, seed):
        """Every stay has >= 2 fixes, dwell >= min_duration, and its
        centroid lies within eps of the anchor fix."""
        from tiff_to_geojson_csv_json_format_converter_ray.functions.geometry import (
            stay_points,
        )

        rng = np.random.RandomState(seed)
        x = np.cumsum(rng.randn(n) * 0.2)
        y = np.cumsum(rng.randn(n) * 0.2)
        t = np.cumsum(rng.rand(n) * 10)
        eps, dur = 0.5, 20.0
        for cx, cy, t_in, t_out, nfix in stay_points(x, y, t, eps, dur):
            assert nfix >= 2
            assert t_out - t_in >= dur
            i = int(np.argmin(np.abs(t - t_in)))
            assert np.hypot(cx - x[i], cy - y[i]) <= eps + 1e-9

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 300), seed=st.integers(0, 999),
           g=st.integers(1, 4))
    def test_gini_bounds_and_translation(self, seed, n, g):
        """0 <= G < 1 for non-negative values; equal values -> 0."""
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            round_like_sql,
        )

        rng = np.random.RandomState(seed)
        v = np.sort(rng.randint(0, 10_000, n).astype(np.int64))
        sx = float(v.sum())
        if sx == 0:
            return
        ranks = np.arange(1, n + 1, dtype=np.float64)
        gini = 2.0 * float((ranks * v).sum()) / (n * sx) - (n + 1.0) / n
        assert -1e-12 <= gini < 1.0


class TestJPEGProperties:
    """Codec invariants under ANY parameter draw (round 4)."""

    @given(
        bh=st.integers(1, 5),
        bw=st.integers(1, 5),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=25, deadline=None)
    def test_flat_even_blocks_roundtrip_exact(self, bh, bw, seed):
        """ANY grid of flat 8x8 blocks with even gray values survives
        quality-50 JPEG bit-exactly (q00=16 divides 8*(v-128))."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.RandomState(seed)
        blocks = rng.randint(0, 128, size=(bh, bw), dtype=np.int64) * 2
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=50))
        assert (got[:, :, 0] == img).all()

    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        quality=st.sampled_from([75, 90, 95]),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=25, deadline=None)
    def test_any_shape_roundtrips_with_correct_dims(self, h, w, quality, seed):
        """Arbitrary (h, w) uint8 images -- including sizes far from
        multiples of 8 -- decode back with exact dimensions and
        bounded error."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.RandomState(seed)
        # smooth-ish field keeps quantization error interpretable
        r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img = (
            128 + 60 * np.sin(r / 7.0 + seed % 5) + 40 * np.cos(c / 9.0)
        ).clip(0, 255).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=quality))
        assert got.shape == (h, w, 3)
        err = np.abs(got[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 25, (h, w, quality, err.max())

    @given(
        dur_q=st.integers(0, 4000),
        n_tracks=st.integers(1, 4),
    )
    @settings(max_examples=25, deadline=None)
    def test_mp4_metadata_roundtrip(self, dur_q, n_tracks):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_mp4_stub, parse_mp4,
        )

        dur = dur_q * 0.25
        tracks = [("vide", "avc1")] * n_tracks
        m = parse_mp4(encode_mp4_stub(dur, 1000, tracks))
        assert m["duration_seconds"] == dur
        assert m["n_tracks"] == n_tracks


class TestFLACProperties:
    """RFC 9639 codec invariants under ANY parameter draw (round 5):
    FLAC is lossless, so EVERY signal must round-trip bit-exactly
    through encode_flac -> decode_flac, across channel counts, bit
    depths, block sizes, signal shapes (tonal / noise / constant runs)
    and non-multiple tail blocks."""

    @given(
        n=st.integers(1, 3000),
        nch=st.integers(1, 3),
        bps=st.sampled_from([8, 16]),
        block=st.sampled_from([192, 256, 1024, 4096]),
        shape=st.sampled_from(["tonal", "noise", "steps", "constant"]),
        seed=st.integers(0, 10_000),
    )
    @settings(max_examples=25, deadline=None)
    def test_any_signal_roundtrips_lossless(
        self, n, nch, bps, block, shape, seed
    ):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_flac, encode_flac,
        )

        rng = np.random.RandomState(seed)
        lim = 1 << (bps - 1)
        t = np.arange(n)
        if shape == "tonal":
            s = (
                (lim // 2) * np.sin(t[:, None] / rng.uniform(5, 60))
                + rng.randint(-lim // 8, lim // 8, (n, nch))
            )
        elif shape == "noise":
            s = rng.randint(-lim, lim, (n, nch))
        elif shape == "steps":
            s = rng.randint(-lim, lim, (max(1, n // 50) + 1, nch)).repeat(
                50, axis=0
            )[:n]
        else:
            s = np.full((n, nch), rng.randint(-lim, lim))
        s = np.clip(s, -lim, lim - 1).astype(np.int32)
        enc = encode_flac(s, 16000, bits_per_sample=bps, block_size=block)
        dec, rate = decode_flac(enc)
        assert rate == 16000
        assert dec.shape == s.shape
        assert (dec == s).all()
