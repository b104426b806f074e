"""From-scratch image/audio codecs (stdlib + numpy only).

The multimodal pipeline (stages/multimodal.py) treated ALL media
decode as an environment-gated stub.  Like the GeoTIFF codec
(sources/geotiff.py), the formats whose specs are tractable without
native libraries are now real:

- PNG  : 8-bit greyscale / RGB / RGBA, non-interlaced, all five
         filter types (zlib via stdlib); encoder for fixtures.
- BMP  : 24-bit uncompressed BI_RGB (bottom-up and top-down).
- PPM  : binary P6, maxval 255.
- WAV  : PCM 8/16/32-bit via the stdlib ``wave`` module.

JPEG / MP4 / webm remain honestly stubbed in
``stages/multimodal.py::_decode_real`` (DCT/entropy-coded formats need
a real codec library).

Decoders return ``(h, w, 3)`` uint8 for images (greyscale replicated,
alpha dropped) so every downstream feature stage sees one layout;
:func:`decode_wav` returns ``(n_samples, n_channels)`` int arrays plus
the sample rate.  Verified against hand-assembled byte fixtures in
``tests/test_media_codecs.py`` (independent of the encoders).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np


class MediaCodecError(ValueError):
    pass


# ====================================================================== PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8.  8-bit depth, color types 0/2/4/6,
    non-interlaced."""
    if data[:8] != _PNG_SIG:
        raise MediaCodecError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise MediaCodecError(f"unsupported bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise MediaCodecError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise MediaCodecError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise MediaCodecError("missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise MediaCodecError("truncated IDAT")
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(
            raw, np.uint8, count=stride, offset=pos + 1
        ).astype(np.int64)
        pos += stride + 1
        if ftype == 0:  # None
            recon = row
        elif ftype == 1:  # Sub
            recon = row.copy()
            for x in range(ch, stride):
                recon[x] = (recon[x] + recon[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            recon = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = row.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = row.copy()
            for x in range(stride):
                left = int(recon[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                recon[x] = (recon[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise MediaCodecError(f"bad PNG filter {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(height, width, ch)
    if color_type == 0:
        return np.repeat(img, 3, axis=2)
    if color_type == 2:
        return img
    if color_type == 4:  # grey + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])  # RGBA -> RGB


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> PNG bytes (fixture writer;
    filter_type 0/1/2 supported)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        color_type, ch = 2, 3
    else:
        raise MediaCodecError("encoder supports grey or RGB")
    h, w, _ = arr.shape
    flat = arr.reshape(h, w * ch).astype(np.int64)
    rows = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            rows.append(0)
            rows += cur.astype(np.uint8).tobytes()
        elif filter_type == 1:
            d = cur.copy()
            d[ch:] = (cur[ch:] - cur[:-ch]) & 0xFF
            rows.append(1)
            rows += d.astype(np.uint8).tobytes()
        elif filter_type == 2:
            rows.append(2)
            rows += ((cur - prev) & 0xFF).astype(np.uint8).tobytes()
        else:
            raise MediaCodecError("encoder filters: 0/1/2")
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + chunk(b"IEND", b"")
    )


# ====================================================================== BMP


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BI_RGB BMP -> (h, w, 3) uint8 (RGB)."""
    if data[:2] != b"BM":
        raise MediaCodecError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise MediaCodecError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise MediaCodecError(f"unsupported BMP ({bpp}bpp, comp {compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img = np.zeros((h, w, 3), np.uint8)
    for row in range(h):
        off = pixel_off + row * stride
        line = np.frombuffer(data, np.uint8, count=w * 3, offset=off)
        y = row if top_down else h - 1 - row
        img[y] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return img


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    pixel_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(body)


# ====================================================================== PPM


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM (maxval 255) -> (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise MediaCodecError("not a P6 PPM")
    # header: P6 <w> <h> <maxval> separated by whitespace/comments
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise MediaCodecError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(
        data, np.uint8, count=h * w * 3, offset=pos
    ).reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


# ====================================================================== WAV


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n_samples, n_channels) int array, sample_rate)
    via the stdlib ``wave`` module (8/16/32-bit)."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        nch = f.getnchannels()
        sw = f.getsampwidth()
        rate = f.getframerate()
        frames = f.readframes(f.getnframes())
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        raise MediaCodecError(f"unsupported WAV sample width {sw}")
    arr = np.frombuffer(frames, dtype).reshape(-1, nch)
    return arr.astype(np.int64 if sw == 4 else np.int32), rate


def encode_wav(
    samples: np.ndarray, sample_rate: int, sampwidth: int = 2
) -> bytes:
    import wave

    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[sampwidth]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(sampwidth)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype(dtype).tobytes())
    return buf.getvalue()


# =============================================================== dispatcher


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """media_type-driven decode to the pipeline's canonical layouts:
    images -> (h, w, 3) uint8; audio -> (n, ch, 1) int (so the summary
    stages' (y, x, channel) indexing works unchanged).  Raises
    MediaCodecError for formats without a from-scratch codec
    (jpeg/mp4/...)."""
    mt = (media_type or "").lower()
    if mt in ("image/png",):
        return decode_png(payload)
    if mt in ("image/bmp", "image/x-ms-bmp"):
        return decode_bmp(payload)
    if mt in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(payload)
    if mt in ("audio/wav", "audio/x-wav", "audio/wave"):
        arr, _rate = decode_wav(payload)
        return arr[:, :, None]
    raise MediaCodecError(f"no from-scratch codec for {media_type}")
