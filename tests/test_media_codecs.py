"""From-scratch media codec tests (sources/media.py).

Same policy as the GeoTIFF codec tests: decoders are verified against
hand-assembled byte fixtures built with raw struct.pack (independent
of the encoders) AND encoder->decoder round-trips, then end-to-end
through the real-decoder multimodal stage.
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
    MediaCodecError,
    decode_bmp,
    decode_media,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


class TestPNG:
    def test_hand_built_rgb(self):
        """2x2 RGB PNG assembled by hand: filter 0 rows, known pixels."""
        px = [
            [(255, 0, 0), (0, 255, 0)],
            [(0, 0, 255), (10, 20, 30)],
        ]
        raw = b""
        for row in px:
            raw += b"\x00" + bytes(v for p in row for v in p)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        img = decode_png(data)
        assert img.shape == (2, 2, 3)
        np.testing.assert_array_equal(img, np.array(px, np.uint8))

    def test_hand_built_filters(self):
        """Each row uses a different filter type (0=None, 1=Sub, 2=Up,
        3=Average, 4=Paeth) over a known greyscale image; expected
        reconstruction computed from the spec by hand via an
        independent reference implementation."""
        h, w = 5, 4
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (h, w), np.uint8)
        # build filtered scanlines per the PNG spec, one type per row
        lines = b""
        prev = np.zeros(w, np.int64)
        for y, ftype in enumerate([0, 1, 2, 3, 4]):
            cur = img[y].astype(np.int64)
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                filt = cur.copy()
                filt[1:] = (cur[1:] - cur[:-1]) & 0xFF
            elif ftype == 2:
                filt = (cur - prev) & 0xFF
            elif ftype == 3:
                filt = cur.copy()
                for x in range(w):
                    left = cur[x - 1] if x else 0
                    filt[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
            else:
                def paeth(a, b, c):
                    p = a + b - c
                    if abs(p - a) <= abs(p - b) and abs(p - a) <= abs(p - c):
                        return a
                    return b if abs(p - b) <= abs(p - c) else c
                filt = cur.copy()
                for x in range(w):
                    left = int(cur[x - 1]) if x else 0
                    up = int(prev[x])
                    ul = int(prev[x - 1]) if x else 0
                    filt[x] = (cur[x] - paeth(left, up, ul)) & 0xFF
            lines += bytes([ftype]) + filt.astype(np.uint8).tobytes()
            prev = cur
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(lines))
            + _png_chunk(b"IEND", b"")
        )
        out = decode_png(data)
        np.testing.assert_array_equal(out, np.repeat(img[:, :, None], 3, 2))

    @pytest.mark.parametrize("filter_type", [0, 1, 2])
    @pytest.mark.parametrize("shape", [(7, 5), (16, 16, 3)])
    def test_roundtrip(self, filter_type, shape):
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, shape, np.uint8)
        out = decode_png(encode_png(img, filter_type=filter_type))
        want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, 2)
        np.testing.assert_array_equal(out, want)

    def test_rgba_drops_alpha(self):
        rgba = np.dstack([
            np.full((3, 3), 7, np.uint8),
            np.full((3, 3), 8, np.uint8),
            np.full((3, 3), 9, np.uint8),
            np.full((3, 3), 128, np.uint8),
        ])
        raw = b""
        for y in range(3):
            raw += b"\x00" + rgba[y].tobytes()
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 6, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        out = decode_png(data)
        assert out.shape == (3, 3, 3)
        assert (out[:, :, 0] == 7).all() and (out[:, :, 2] == 9).all()


class TestBMP:
    def test_hand_built(self):
        """2x2 24-bit bottom-up BMP with explicit padding bytes."""
        # rows padded to 4 bytes: 2 px * 3 = 6 bytes -> pad 2
        bottom = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # BGR!
        top = bytes([0, 0, 255, 1, 2, 3]) + b"\x00\x00"
        body = bottom + top  # bottom-up: first stored row = image bottom
        header = (
            b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body),
                          0, 0, 0, 0)
        )
        img = decode_bmp(header + body)
        # stored bottom row (BGR 255,0,0 / 0,255,0) = image row 1 (RGB)
        np.testing.assert_array_equal(
            img[1], np.array([[0, 0, 255], [0, 255, 0]], np.uint8)
        )
        np.testing.assert_array_equal(
            img[0], np.array([[255, 0, 0], [3, 2, 1]], np.uint8)
        )

    def test_roundtrip(self):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (9, 7, 3), np.uint8)  # odd width: padding
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


class TestPPMWav:
    def test_ppm_roundtrip_and_comment(self):
        rng = np.random.RandomState(6)
        img = rng.randint(0, 256, (4, 6, 3), np.uint8)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
        # hand-built with a comment line in the header
        data = b"P6\n# fixture\n6 4\n255\n" + img.tobytes()
        np.testing.assert_array_equal(decode_ppm(data), img)

    def test_wav_roundtrip(self):
        rng = np.random.RandomState(7)
        s = rng.randint(-30000, 30000, (1000, 2)).astype(np.int16)
        arr, rate = decode_wav(encode_wav(s, 22050))
        assert rate == 22050
        np.testing.assert_array_equal(arr, s)

    def test_dispatcher_errors(self):
        with pytest.raises(MediaCodecError):
            decode_media(b"\xff\xd8\xff\xe0 jpeg-ish", "image/jpeg")
        with pytest.raises(MediaCodecError):
            decode_png(b"not a png")


class TestRealDecodeStage:
    def test_media_decode_real_end_to_end(self, ray_session):
        """decoder='real' through the actor-pool stage over REAL
        encoded payloads: stats must equal the in-process decode."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            MediaDecode, gen_media_real,
        )

        t = gen_media_real(16)
        out = (
            ray.data.from_arrow(t)
            .map_batches(
                MediaDecode(decoder="real"),
                batch_format="pyarrow", batch_size=4,
            )
            .to_pandas()
            .set_index("media_id")
        )
        assert len(out) == 16
        for i in range(16):
            row = t.slice(i, 1)
            arr = decode_media(
                row["payload"][0].as_py(), row["media_type"][0].as_py()
            )
            got = out.loc[f"m{i}"]
            assert abs(got.pixel_mean - float(arr.mean())) < 1e-9
            assert abs(got.pixel_std - float(arr.std())) < 1e-9

    def test_unsupported_format_raises(self):
        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            _decode_real,
        )

        with pytest.raises(NotImplementedError):
            _decode_real(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


class TestJPEG:
    """Baseline JFIF codec (VERDICT r3 item 3): hand-assembled byte
    fixture with an ANALYTIC expected decode (DC-only block), flat-
    block exactness, and encoder->decoder round-trips across
    grayscale / 4:4:4 / 4:2:0 / restart-marker paths."""

    def _hand_built_dc_only(self) -> bytes:
        """8x8 grayscale, one DC-only block: dc_q=3, q00=16 ->
        every pixel EXACTLY round(3*16/8) + 128 = 134."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            _H_AC_LUMA, _H_DC_LUMA,
        )

        out = bytearray(b"\xff\xd8")
        q = bytes([16] + [1] * 63)  # zigzag order; only q[0] matters
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + q
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) \
            + bytes([1, 0x11, 0])
        for tc, spec in ((0, _H_DC_LUMA), (1, _H_AC_LUMA)):
            bits, vals = spec
            body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) \
            + bytes([1, 0x00, 0, 63, 0])
        # entropy: DC cat 2 ('011') + bits '11' (=3), EOB ('1010'),
        # padded with 1s -> 0111 1101 0111 1111
        out += bytes([0x7D, 0x7F])
        out += b"\xff\xd9"
        return bytes(out)

    def test_hand_built_dc_only_exact(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg,
        )

        got = decode_jpeg(self._hand_built_dc_only())
        assert got.shape == (8, 8, 3)
        assert (got == 134).all()

    def test_truncated_entropy_segment_honest_error(self):
        """ADVICE r4: a payload whose entropy-coded segment is cut
        short (the bit reader runs into EOI / off the end) must fail
        with MediaCodecError, not leak the internal _MarkerHit class
        or an opaque IndexError out of a Ray task."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            MediaCodecError, decode_jpeg, encode_jpeg,
        )

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (24, 24), np.uint8)
        full = encode_jpeg(img, quality=75)
        # chop most of the entropy data, keep the trailing EOI marker
        sos = full.find(b"\xff\xda")
        assert sos > 0
        for cut in (sos + 20, sos + 40):
            bad = full[:cut] + b"\xff\xd9"
            with pytest.raises(MediaCodecError):
                decode_jpeg(bad)

    def test_flat_blocks_exact(self):
        """Flat 8x8 blocks with even gray values survive quality-50
        Annex-K quantization EXACTLY (q00=16 divides 8*(v-128) when v
        is even): decode == input, bit for bit."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        rng = np.random.RandomState(7)
        blocks = rng.randint(0, 128, size=(4, 6), dtype=np.int64) * 2
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=50))
        assert (got[:, :, 0] == img).all()
        assert (got[:, :, 1] == img).all()

    @pytest.mark.parametrize("quality,tol", [(95, 6), (75, 14)])
    def test_roundtrip_gray(self, quality, tol):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        r, c = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
        img = (
            128 + 60 * np.sin(r / 9.0) + 50 * np.cos(c / 11.0)
        ).clip(0, 255).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=quality))
        assert got.shape == (40, 56, 3)
        err = np.abs(got[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= tol, err.max()

    def test_roundtrip_color_444(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        r, c = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
        img = np.stack(
            [
                (128 + 50 * np.sin(r / 7.0)).clip(0, 255),
                (128 + 50 * np.cos(c / 9.0)).clip(0, 255),
                (120 + (r + c) % 40).clip(0, 255),
            ],
            axis=2,
        ).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=92))
        err = np.abs(got.astype(int) - img.astype(int))
        assert err.max() <= 18, err.max()

    def test_roundtrip_420_subsampled_and_restarts(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        r, c = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
        img = np.stack(
            [
                (100 + r).clip(0, 255),
                (100 + c).clip(0, 255),
                (90 + (r + c) // 2).clip(0, 255),
            ],
            axis=2,
        ).astype(np.uint8)
        for ri in (0, 2):
            got = decode_jpeg(
                encode_jpeg(img, quality=92, subsample=True,
                            restart_interval=ri)
            )
            assert got.shape == (48, 48, 3)
            # chroma is 2x2-averaged: luma-dominated tolerance
            err = np.abs(got.astype(int) - img.astype(int))
            assert err.max() <= 24, (ri, err.max())

    def test_non_multiple_of_8_and_odd_sizes(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg, encode_jpeg,
        )

        for shape in ((13, 21), (9, 8)):
            img = (
                np.arange(shape[0] * shape[1], dtype=np.int64)
                .reshape(shape) * 7 % 256
            ).astype(np.uint8)
            got = decode_jpeg(encode_jpeg(img, quality=95))
            assert got.shape == (shape[0], shape[1], 3)

    def test_dispatcher_and_stage(self, ray_session):
        """decode_media routes image/jpeg; the real-decoder actor-pool
        stage decodes JPEG payloads end-to-end."""
        import pyarrow as pa

        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_jpeg,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            MEDIA_SCHEMA, MediaDecode,
        )

        img = np.full((16, 16), 150, np.uint8)
        payload = encode_jpeg(img, quality=50)
        arr = decode_media(payload, "image/jpeg")
        assert arr.shape == (16, 16, 3)
        assert (arr == 150).all()
        import ray.data

        tbl = pa.table(
            {
                "media_id": ["j0"], "media_type": ["image/jpeg"],
                "payload": pa.array([payload], pa.binary()),
                "width": pa.array([16], pa.int32()),
                "height": pa.array([16], pa.int32()),
                "sample_rate": pa.array([0], pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )
        out = (
            ray.data.from_arrow(tbl)
            .map_batches(
                MediaDecode(decoder="real"), batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )
        assert out[0]["pixel_mean"] == pytest.approx(150.0)

    def test_progressive_rejected(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_jpeg,
        )

        bad = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) \
            + bytes([1, 0x11, 0]) + b"\xff\xd9"
        with pytest.raises(MediaCodecError, match="progressive"):
            decode_jpeg(bad)


class TestMP4Demux:
    """From-scratch ISO-BMFF box parser (metadata-only demux; sample
    decode stays the documented stub)."""

    def test_hand_built_boxes(self):
        """Fixture assembled with raw struct (independent of
        encode_mp4_stub): ftyp + moov/mvhd v0 + one trak."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_mp4,
        )

        def box(fourcc, body):
            return struct.pack(">I", 8 + len(body)) + fourcc + body

        mvhd = box(b"mvhd", b"\0\0\0\0" + b"\0" * 8
                   + struct.pack(">II", 600, 3000) + b"\0" * 80)
        tkhd = box(b"tkhd", b"\0\0\0\x07" + b"\0" * 8
                   + struct.pack(">I", 9) + b"\0" * 68)
        hdlr = box(b"hdlr", b"\0\0\0\0" + b"\0" * 4 + b"soun"
                   + b"\0" * 13)
        entry = box(b"mp4a", b"\0" * 78)
        stsd = box(b"stsd", b"\0\0\0\0" + struct.pack(">I", 1) + entry)
        mdia = box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd)))
        moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
        data = box(b"ftyp", b"mp42" + b"\0\0\0\0" + b"isom") + moov
        m = parse_mp4(data)
        assert m["brand"] == "mp42"
        assert m["timescale"] == 600
        assert m["duration_seconds"] == pytest.approx(5.0)
        assert m["n_tracks"] == 1
        assert m["tracks"][0] == {
            "track_id": 9, "handler": "soun", "codec": "mp4a",
        }

    def test_largesize_and_v1_mvhd(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_mp4,
        )

        def box64(fourcc, body):
            return (struct.pack(">I", 1) + fourcc
                    + struct.pack(">Q", 16 + len(body)) + body)

        mvhd = (struct.pack(">I", 8 + 1 + 3 + 16 + 80) + b"mvhd"
                + b"\x01\0\0\0" + b"\0" * 16
                + struct.pack(">IQ", 90000, 90000 * 7) + b"\0" * 76)
        moov = box64(b"moov", mvhd)
        ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\0" * 4
        m = parse_mp4(ftyp + moov)
        assert m["duration_seconds"] == pytest.approx(7.0)
        assert m["n_tracks"] == 0

    def test_roundtrip_stub_and_stage(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            MediaMetadata, gen_media_mp4,
        )

        out = (
            ray.data.from_arrow(gen_media_mp4(n=6))
            .map_batches(MediaMetadata(), batch_format="pyarrow",
                         batch_size=None)
            .take_all()
        )
        assert len(out) == 6
        assert out[0]["duration_seconds"] == 1.0
        assert out[0]["n_tracks"] == 2 and out[1]["n_tracks"] == 1
        assert out[1]["codec0"] == "vp09"

    def test_rejects_non_mp4(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_mp4,
        )

        with pytest.raises(MediaCodecError):
            parse_mp4(b"\x89PNG\r\n\x1a\n junk")


class TestWebMDemux:
    def test_hand_built_ebml(self):
        """Fixture assembled with raw bytes, independent of
        encode_webm_stub: 2-byte size vints, float32 duration,
        explicit TimestampScale."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_webm,
        )

        def elem(eid, body):
            # 2-byte size vint (marker 0x40 in first byte)
            assert len(body) < 0x3FFF
            return eid + bytes([0x40 | (len(body) >> 8), len(body) & 0xFF]) + body

        header = elem(b"\x1aE\xdf\xa3", elem(b"\x42\x82", b"matroska"))
        info = elem(
            b"\x15\x49\xa9\x66",
            elem(b"\x2a\xd7\xb1", (500_000).to_bytes(3, "big"))
            + elem(b"\x44\x89", struct.pack(">f", 8000.0)),
        )
        trk = elem(
            b"\x16\x54\xae\x6b",
            elem(b"\xae", elem(b"\x83", b"\x02")
                 + elem(b"\x86", b"A_VORBIS")),
        )
        seg = elem(b"\x18\x53\x80\x67", info + trk)
        m = parse_webm(header + seg)
        assert m["doctype"] == "matroska"
        assert m["timestamp_scale_ns"] == 500_000
        # 8000 ticks x 0.5 ms = 4 s
        assert m["duration_seconds"] == pytest.approx(4.0)
        assert m["tracks"] == [{"type": "audio", "codec": "A_VORBIS"}]

    def test_stage_dispatches_both_containers(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            MediaMetadata, gen_media_mp4, gen_media_webm,
        )

        both = pa.concat_tables([gen_media_mp4(n=2), gen_media_webm(n=2)])
        out = (
            ray.data.from_arrow(both)
            .map_batches(MediaMetadata(), batch_format="pyarrow",
                         batch_size=None)
            .take_all()
        )
        got = {r["media_id"]: (r["brand"], r["codec0"]) for r in out}
        assert got["v0"] == ("isom", "avc1")
        assert got["w0"] == ("webm", "V_VP9")

    def test_rejects_garbage(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_webm,
        )

        with pytest.raises(MediaCodecError):
            parse_webm(b"RIFFnotebml")


class TestAudioMetadata:
    def test_hand_built_flac_streaminfo(self):
        """STREAMINFO fields packed by hand (independent of
        encode_flac_stub's packing)."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_flac_streaminfo,
        )

        sr, ch, bps, total = 44100, 2, 24, 44100 * 3 + 50
        bits = ((sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total)
        body = (b"\x10\x00\x10\x00" + b"\0" * 6
                + bits.to_bytes(8, "big") + b"\1" * 16)
        data = b"fLaC" + bytes([0x80, 0, 0, len(body)]) + body
        m = parse_flac_streaminfo(data)
        assert m["sample_rate"] == sr and m["channels"] == ch
        assert m["bits_per_sample"] == bps
        assert m["total_samples"] == total
        assert m["duration_seconds"] == pytest.approx(total / sr)

    def test_mp3_header_variants(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_mp3_stub, parse_mp3_header,
        )

        for kbps, rate, stereo in ((320, 48000, True), (64, 32000, False)):
            m = parse_mp3_header(encode_mp3_stub(kbps, rate, stereo))
            assert m == {
                "bitrate_kbps": kbps, "sample_rate": rate,
                "channels": 2 if stereo else 1,
            }

    def test_rejects_garbage(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            parse_flac_streaminfo, parse_mp3_header,
        )

        with pytest.raises(MediaCodecError):
            parse_flac_streaminfo(b"OggS junk")
        with pytest.raises(MediaCodecError):
            parse_mp3_header(b"\x00\x00\x00\x00")

    def test_stage_mixed_formats(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.multimodal import (
            AudioMetadata, gen_media_audio,
        )

        out = (
            ray.data.from_arrow(gen_media_audio(n=4))
            .map_batches(AudioMetadata(), batch_format="pyarrow",
                         batch_size=None)
            .take_all()
        )
        got = {r["media_id"]: (r["fmt"], r["rate"]) for r in out}
        assert got["a0"] == ("flac", 48000)
        assert got["a1"] == ("mp3", 44100)


class TestFLAC:
    """From-scratch FLAC sample codec (RFC 9639; VERDICT r4 item 3).

    Round-trips pin the encoder+decoder pair; the hand-built frames
    pin the DECODER alone on subframe/stereo paths our encoder never
    emits (verbatim, LPC, left/side, mid/side), with analytic
    expected samples -- the JPEG playbook."""

    def _roundtrip(self, s, rate, **kw):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_flac, encode_flac,
        )

        dec, r = decode_flac(encode_flac(s, rate, **kw))
        assert r == rate
        want = s if s.ndim == 2 else s[:, None]
        assert dec.shape == want.shape
        assert (dec == want).all()
        return dec

    def test_roundtrip_stereo_tonal(self):
        rng = np.random.RandomState(5)
        t = np.arange(9000)
        l = (2500 * np.sin(t / 40.0) + rng.randint(-150, 150, len(t)))
        r = (1500 * np.cos(t / 55.0) + rng.randint(-80, 80, len(t)))
        self._roundtrip(
            np.stack([l, r], 1).astype(np.int32), 44100
        )

    def test_roundtrip_edges(self):
        rng = np.random.RandomState(6)
        # constant, full-scale noise (escape path), odd tail block,
        # 8-bit, tiny
        self._roundtrip(np.full(5000, -32768, np.int32), 48000)
        self._roundtrip(
            rng.randint(-32768, 32768, (2049, 1)).astype(np.int32), 32000
        )
        self._roundtrip(
            rng.randint(-128, 128, 700).astype(np.int32), 8000,
            bits_per_sample=8, block_size=192,
        )
        self._roundtrip(np.array([1], np.int32), 16000)

    def test_many_frames_multibyte_coded_numbers(self):
        """157 frames of 192 samples: frame indices >= 128 exercise the
        multi-byte UTF-8-style coded-number encode AND decode paths."""
        rng = np.random.RandomState(9)
        s = (
            1000 * np.sin(np.arange(30000) / 33.0)
            + rng.randint(-50, 50, 30000)
        ).astype(np.int32)
        self._roundtrip(s, 16000, block_size=192)

    def test_compresses_tonal(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_flac,
        )

        t = np.arange(20000)
        s = (3000 * np.sin(t / 60.0)).astype(np.int32)
        enc = encode_flac(s, 44100)
        assert len(enc) < 0.7 * s.size * 2  # fixed predictors bite

    # --- hand-built decoder fixtures --------------------------------
    def _frame(self, meta_rate, meta_ch, meta_n, build_body):
        """Assemble fLaC + STREAMINFO + ONE hand-built frame whose
        subframe bits come from ``build_body(bw)``."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            _crc8_flac, _crc16_flac, _PlainBitWriter, encode_flac_stub,
        )

        stream = bytearray(encode_flac_stub(meta_rate, meta_ch, meta_n))
        bw = _PlainBitWriter()
        bw.u(0b11111111111110, 14)
        bw.u(0, 2)  # reserved + fixed blocking
        bw.u(7, 4)  # 16-bit block size follows
        bw.u(0, 4)  # rate from STREAMINFO
        yield bw  # caller writes ch/ss codes
        bw.u(0, 8)  # coded frame number 0
        bw.u(meta_n - 1, 16)
        bw.align()
        bw.u(_crc8_flac(bytes(bw.out)), 8)
        build_body(bw)
        bw.align()
        bw.u(_crc16_flac(bytes(bw.out)), 16)
        stream += bw.out
        self.stream = bytes(stream)

    def _build(self, meta_rate, meta_ch, meta_n, ch_code, ss_code, body):
        gen = self._frame(meta_rate, meta_ch, meta_n, body)
        bw = next(gen)
        bw.u(ch_code, 4)
        bw.u(ss_code, 3)
        bw.u(0, 1)
        for _ in gen:
            pass
        return self.stream

    def test_hand_built_constant_and_verbatim(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_flac,
        )

        def body(bw):
            bw.u(0, 1)
            bw.u(0, 6)  # CONSTANT
            bw.u(0, 1)
            bw.s(-42, 16)

        dec, rate = decode_flac(self._build(16000, 1, 8, 0, 4, body))
        assert rate == 16000
        assert (dec[:, 0] == -42).all() and len(dec) == 8

        vals = [5, -7, 100, -100, 0, 32767, -32768, 1]

        def body_v(bw):
            bw.u(0, 1)
            bw.u(1, 6)  # VERBATIM
            bw.u(0, 1)
            for v in vals:
                bw.s(v, 16)

        dec, _ = decode_flac(self._build(16000, 1, 8, 0, 4, body_v))
        assert dec[:, 0].tolist() == vals

    def test_hand_built_lpc(self):
        """LPC order 2, coefs [3, -1], shift 1: pred_i = (3*s[i-1] -
        s[i-2]) >> 1; warmup [10, 12], residuals all 1 -> analytic
        expansion checked in plain Python."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_flac,
        )

        n, order, shift, coefs, warm = 12, 2, 1, [3, -1], [10, 12]

        def body(bw):
            bw.u(0, 1)
            bw.u(32 + (order - 1), 6)  # LPC order 2
            bw.u(0, 1)
            for w in warm:
                bw.s(w, 16)
            bw.u(4 - 1, 4)  # precision 4 bits
            bw.s(shift, 5)
            for c in coefs:
                bw.s(c, 4)
            bw.u(0, 2)  # rice method 0
            bw.u(0, 4)  # partition order 0
            bw.u(0, 4)  # rice param 0
            for _ in range(n - order):
                bw.u(1, 3)  # unary '001' = folded 2 -> residual +1

        dec, _ = decode_flac(self._build(16000, 1, n, 0, 4, body))
        want = list(warm)
        for _ in range(n - order):
            want.append(((3 * want[-1] - want[-2]) >> shift) + 1)
        assert dec[:, 0].tolist() == want

    @pytest.mark.parametrize(
        "ch_code", [8, 9, 10], ids=["left-side", "side-right", "mid-side"]
    )
    def test_hand_built_stereo_decorrelation(self, ch_code):
        """All three stereo modes reconstruct the same analytic L/R
        from constant subframes (side channel carries bps+1 bits)."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_flac,
        )

        L, R = 1000, -250
        side = L - R
        mid = (L + R) >> 1
        n = 16

        def body(bw):
            def const(v, bits):
                bw.u(0, 1)
                bw.u(0, 6)
                bw.u(0, 1)
                bw.s(v, bits)

            if ch_code == 8:
                const(L, 16)
                const(side, 17)
            elif ch_code == 9:
                const(side, 17)
                const(R, 16)
            else:
                const(mid, 16)
                const(side, 17)

        dec, _ = decode_flac(self._build(16000, 2, n, ch_code, 4, body))
        assert (dec[:, 0] == L).all() and (dec[:, 1] == R).all()

    def test_32bit_noise_roundtrips_lossless(self):
        """Review r5: the Rice-escape raw width caps at 31 bits, so
        32-bit residuals wider than that must take the (always
        lossless) Rice path -- a clamped raw width silently masked
        high bits and corrupted full-scale 32-bit audio."""
        rng = np.random.RandomState(13)
        s = rng.randint(-(2 ** 31), 2 ** 31, 500, dtype=np.int64)
        self._roundtrip(s.astype(np.int64), 48000, bits_per_sample=32)

    def test_truncated_between_frames_raises(self):
        """Review r5: a stream cut at a frame boundary decodes fewer
        samples than STREAMINFO promises -- must raise, not silently
        return short audio into downstream stats."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            MediaCodecError, decode_flac, encode_flac,
        )

        s = (np.arange(5000) % 211).astype(np.int32)
        enc = encode_flac(s, 16000, block_size=1024)
        # find the start of the second frame (sync bytes after header)
        first = enc.index(b"\xff\xf8")
        second = enc.index(b"\xff\xf8", first + 2)
        with pytest.raises(MediaCodecError, match="truncated"):
            decode_flac(enc[:second])

    def test_order_exceeds_block_size_raises(self):
        """Review r5: a malformed frame declaring a FIXED order larger
        than its block size must fail as MediaCodecError, not emit
        extra samples or crash with a raw numpy error."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            MediaCodecError, decode_flac,
        )

        def body(bw):
            bw.u(0, 1)
            bw.u(8 + 4, 6)  # FIXED order 4 on a 2-sample block
            bw.u(0, 1)
            for _ in range(4):
                bw.s(1, 16)
            bw.u(0, 2)
            bw.u(0, 4)
            bw.u(0, 4)

        with pytest.raises(MediaCodecError, match="order"):
            decode_flac(self._build(16000, 1, 2, 0, 4, body))

    def test_crc_detects_corruption(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            MediaCodecError, decode_flac, encode_flac,
        )

        s = (np.arange(2000) % 97).astype(np.int32)
        enc = bytearray(encode_flac(s, 16000))
        enc[-30] ^= 0x10  # flip a bit inside the last frame
        with pytest.raises(MediaCodecError):
            decode_flac(bytes(enc))

    def test_metadata_only_stream_raises(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            MediaCodecError, decode_flac, encode_flac_stub,
        )

        with pytest.raises(MediaCodecError):
            decode_flac(encode_flac_stub(48000, 1, 48000))

    def test_decode_media_flac_layout(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            decode_media, encode_flac,
        )

        s = ((np.arange(500) * 7) % 200 - 100).astype(np.int32)
        arr = decode_media(encode_flac(s, 16000), "audio/flac")
        assert arr.shape == (500, 1, 1)
        assert (arr[:, 0, 0] == s).all()


class TestMP3FrameWalk:
    """walk_mp3_frames (round 5): the duration path parse_mp3_header
    declares out of header scope -- a real frame-by-frame walk using
    each header's own bitrate/padding, 1152 samples per frame."""

    def test_cbr_duration(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_mp3_stub, walk_mp3_frames,
        )

        m = walk_mp3_frames(encode_mp3_stub(192, 44100, n_frames=77))
        assert m["n_frames"] == 77
        assert m["sample_rate"] == 44100
        assert m["duration_seconds"] == 77 * 1152 / 44100

    def test_vbr_walk_steps_per_frame(self):
        """Frames of different bitrates have different lengths; the
        walk must use EACH header's bitrate, not the first one."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            encode_mp3_stub, walk_mp3_frames,
        )

        vbr = (
            encode_mp3_stub(128, 44100, n_frames=3)
            + encode_mp3_stub(320, 44100, n_frames=4)
            + encode_mp3_stub(96, 44100, n_frames=2)
        )
        m = walk_mp3_frames(vbr)
        assert m["n_frames"] == 9
        assert m["duration_seconds"] == 9 * 1152 / 44100

    def test_id3_skip_and_errors(self):
        from tiff_to_geojson_csv_json_format_converter_ray.sources.media import (
            MediaCodecError, encode_mp3_stub, walk_mp3_frames,
        )

        body = encode_mp3_stub(128, 44100, n_frames=2)
        tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
        assert walk_mp3_frames(tag + body)["n_frames"] == 2
        with pytest.raises(MediaCodecError):
            walk_mp3_frames(b"\x00\x01\x02\x03")
