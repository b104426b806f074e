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
