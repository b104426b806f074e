"""From-scratch GeoTIFF codec (stdlib + numpy only).

The reference's primary input is real ``.tif`` files opened with
rasterio (``completePixleOutput.py:21-35``: band-1 array, ``transform``,
``crs``, ``nodata``).  This module re-implements exactly that surface
with no native deps:

- classic TIFF and BigTIFF, both byte orders;
- strip and tile layouts, chunky and planar multi-band;
- compressions: none (1), LZW (5), JPEG (7, via the from-scratch
  baseline codec in sources/media.py + the JPEGTables tag), Deflate
  (8 / 32946, stdlib zlib), LZMA (34925, stdlib lzma),
  PackBits (32773);
- predictors: none (1), horizontal differencing (2), floating-point
  byte differencing (3);
- sample formats: uint/int 8/16/32, float32/64;
- GeoKey directory (34735) -> ``EPSG:nnnn`` CRS;
- ModelPixelScale+ModelTiepoint or ModelTransformation -> the rasterio
  affine ``(a, b, c, d, e, f)`` with ``x = c + a*col + b*row``;
- GDAL_NODATA ascii tag (42113).

Scale note: decode runs inside Ray read tasks (one file per task --
see :func:`read_geotiff_tiles` in ``pipelines/convert.py``); Deflate
decode is C-speed ``zlib``, LZW is a pure-Python fallback kept for
compatibility (prefer Deflate sources for bulk runs).

A matching writer (:func:`write_geotiff`) produces classic little-
endian GeoTIFFs (strips or tiles; none/Deflate; predictor 1/2/3) for
fixtures, tests, and the grid-output sink.  The reader is additionally
verified against hand-assembled byte-level fixtures in
``tests/test_geotiff.py`` so reader and writer cannot share a
misreading of the spec.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

# --------------------------------------------------------------- tag numbers
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_JPEG_TABLES = 347
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PLANAR_CONFIG = 284
TAG_PREDICTOR = 317
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325
TAG_SAMPLE_FORMAT = 339
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_MODEL_TRANSFORMATION = 34264
TAG_GEO_KEY_DIRECTORY = 34735
TAG_GEO_DOUBLE_PARAMS = 34736
TAG_GEO_ASCII_PARAMS = 34737
TAG_GDAL_NODATA = 42113

GEOKEY_MODEL_TYPE = 1024
GEOKEY_GEOGRAPHIC_TYPE = 2048
GEOKEY_PROJECTED_CS_TYPE = 3072

# TIFF field types -> (struct char, size).  5/10 are rationals
# (numerator, denominator pairs).
_TYPE_FMT = {
    1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    6: ("b", 1), 7: ("B", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8), 16: ("Q", 8), 17: ("q", 8), 18: ("Q", 8),
}


class GeoTIFFError(ValueError):
    pass


@dataclass
class GeoTIFF:
    """Decoded raster: what ``rasterio.open`` gives the reference."""

    width: int
    height: int
    count: int  # bands
    dtype: np.dtype
    transform: list[float] | None  # (a, b, c, d, e, f) or None
    crs: str | None  # "EPSG:nnnn" or None
    nodata: float | None
    _bands: list[np.ndarray] = field(default_factory=list, repr=False)

    def read(self, band: int = 1) -> np.ndarray:
        """1-indexed band read, rasterio-style."""
        return self._bands[band - 1]


# =================================================================== reader


def _read_ifd_value(data, bo, ftype, count, payload, bigtiff):
    """Decode one IFD entry's value (inline or offset)."""
    if ftype not in _TYPE_FMT:
        return None
    ch, size = _TYPE_FMT[ftype]
    total = size * count
    inline_cap = 8 if bigtiff else 4
    if total <= inline_cap:
        raw = payload[:total]
    else:
        off = struct.unpack(bo + ("Q" if bigtiff else "I"), payload)[0]
        raw = data[off : off + total]
    if ftype == 2:  # ASCII
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if ftype in (5, 10):  # rationals -> floats
        pairs = struct.unpack(bo + ch * count, raw)
        return [
            (pairs[2 * i] / pairs[2 * i + 1]) if pairs[2 * i + 1] else 0.0
            for i in range(count)
        ]
    vals = struct.unpack(bo + ch * count, raw)
    return list(vals)


def _parse_ifd(data: bytes, bo: str, off: int, bigtiff: bool):
    """One IFD -> ({tag: value}, next_ifd_offset)."""
    if bigtiff:
        (n,) = struct.unpack_from(bo + "Q", data, off)
        entry_size, pos = 20, off + 8
    else:
        (n,) = struct.unpack_from(bo + "H", data, off)
        entry_size, pos = 12, off + 2
    tags = {}
    for i in range(n):
        e = pos + i * entry_size
        tag, ftype = struct.unpack_from(bo + "HH", data, e)
        if bigtiff:
            (count,) = struct.unpack_from(bo + "Q", data, e + 4)
            payload = data[e + 12 : e + 20]
        else:
            (count,) = struct.unpack_from(bo + "I", data, e + 4)
            payload = data[e + 8 : e + 12]
        tags[tag] = _read_ifd_value(data, bo, ftype, count, payload, bigtiff)
    next_off = struct.unpack_from(
        bo + ("Q" if bigtiff else "I"), data, pos + n * entry_size
    )[0]
    return tags, next_off


def _dtype_of(bits: int, fmt: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None or bits % 8:
        raise GeoTIFFError(f"unsupported sample format {fmt}/{bits}-bit")
    return np.dtype(f"{'<' if bo == '<' else '>'}{kind}{bits // 8}")


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (MSB-first bit order, early code-width change)."""
    CLEAR, EOI = 256, 257
    table: list[bytes] = []

    def reset():
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # 256, 257 placeholders

    reset()
    out = bytearray()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # TIFF early change: the decoder's table runs one entry
            # behind the encoder's, so widen at (1<<w)-2 (510/1022/2046)
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += data[i : i + 1] * (257 - h)
            i += 1
        # 128 = no-op
    return bytes(out)


def _decompress(raw: bytes, compression: int) -> bytes:
    if compression == 34925:  # LZMA (GDAL COMPRESS=LZMA)
        import lzma

        return lzma.decompress(raw)
    if compression == 1:
        return raw
    if compression in (8, 32946):
        return zlib.decompress(raw)
    if compression == 5:
        return _lzw_decode(raw)
    if compression == 32773:
        return _packbits_decode(raw)
    raise GeoTIFFError(f"unsupported compression {compression}")


def _undo_predictor(
    block: np.ndarray, predictor: int, dtype: np.dtype, spp: int
) -> np.ndarray:
    """``block``: (rows, cols*spp) of ``dtype`` for predictor 2, raw
    bytes rows for predictor 3."""
    if predictor == 2:
        # horizontal differencing per sample plane within the row
        w = block.shape[1] // spp
        as3 = block.reshape(block.shape[0], w, spp)
        np.cumsum(as3, axis=1, dtype=as3.dtype, out=as3)
        return as3.reshape(block.shape[0], w * spp)
    if predictor == 3:
        # floating-point predictor: per row, byte-delta then byte planes
        # (big-endian order) re-interleaved
        rows, rowbytes = block.shape
        itemsize = dtype.itemsize
        w = rowbytes // itemsize
        b = np.cumsum(block.view(np.uint8), axis=1, dtype=np.uint8)
        planes = b.reshape(rows, itemsize, w)  # [row][byteplane][col]
        be = np.ascontiguousarray(planes.transpose(0, 2, 1))  # row, col, byte
        return (
            be.reshape(rows, w * itemsize)
            .view(np.dtype(dtype.str.replace("<", ">").replace("=", ">")))
            .astype(dtype)
        )
    return block


def _epsg_from_geokeys(tags: dict) -> str | None:
    gk = tags.get(TAG_GEO_KEY_DIRECTORY)
    if not gk or len(gk) < 4:
        return None
    n_keys = gk[3]
    keys = {}
    for i in range(n_keys):
        kid, loc, cnt, val = gk[4 + 4 * i : 8 + 4 * i]
        if loc == 0:
            keys[kid] = val
    model = keys.get(GEOKEY_MODEL_TYPE)
    if model == 1:  # projected
        code = keys.get(GEOKEY_PROJECTED_CS_TYPE)
    else:  # geographic (2) or unknown
        code = keys.get(GEOKEY_GEOGRAPHIC_TYPE)
    if code and 1024 <= code < 32767:
        return f"EPSG:{code}"
    return None


def _transform_of(tags: dict) -> list[float] | None:
    mt = tags.get(TAG_MODEL_TRANSFORMATION)
    if mt and len(mt) >= 8:
        return [mt[0], mt[1], mt[3], mt[4], mt[5], mt[7]]
    scale = tags.get(TAG_MODEL_PIXEL_SCALE)
    tie = tags.get(TAG_MODEL_TIEPOINT)
    if scale and tie and len(tie) >= 6:
        sx, sy = float(scale[0]), float(scale[1])
        i, j, _, x, y, _ = (float(v) for v in tie[:6])
        return [sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy]
    return None


def _parse_header(data) -> tuple[str, dict]:
    """TIFF header + first IFD -> (byte order, tags)."""
    if len(data) < 8:
        raise GeoTIFFError("truncated header")
    order = data[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise GeoTIFFError(f"not a TIFF (byte order {order!r})")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic == 42:
        bigtiff = False
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    elif magic == 43:
        bigtiff = True
        offsize, _ = struct.unpack_from(bo + "HH", data, 4)
        if offsize != 8:
            raise GeoTIFFError(f"BigTIFF offset size {offsize}")
        (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        raise GeoTIFFError(f"bad magic {magic}")
    tags, _ = _parse_ifd(data, bo, ifd_off, bigtiff)
    return bo, tags


def _geo_fields(tags: dict) -> tuple:
    """(transform, crs, nodata) from the geo tags."""
    nodata = None
    nd = tags.get(TAG_GDAL_NODATA)
    if nd is not None:
        try:
            nodata = float(str(nd).strip().split()[0])
        except (ValueError, IndexError):
            nodata = None
    return _transform_of(tags), _epsg_from_geokeys(tags), nodata


def parse_geotiff_info(data) -> GeoTIFF:
    """Header-only parse: dimensions + geo metadata, NO pixel decode.
    Pass an ``mmap`` (or bytes) -- only the touched pages are read, so
    driver-side metadata scans of large files stay cheap."""
    bo, tags = _parse_header(data)
    width = int(tags[TAG_IMAGE_WIDTH][0])
    height = int(tags[TAG_IMAGE_LENGTH][0])
    spp = int(tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0])
    bits = int(tags.get(TAG_BITS_PER_SAMPLE, [8])[0])
    fmt = int(tags.get(TAG_SAMPLE_FORMAT, [1])[0])
    transform, crs, nodata = _geo_fields(tags)
    return GeoTIFF(
        width=width, height=height, count=spp,
        dtype=_dtype_of(bits, fmt, bo).newbyteorder("="),
        transform=transform, crs=crs, nodata=nodata, _bands=[],
    )


def open_geotiff_info(path: str) -> GeoTIFF:
    """Header-only file scan via mmap (a few KB of real I/O)."""
    import mmap

    with open(path, "rb") as f:
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mm:
            return parse_geotiff_info(mm)


def parse_geotiff(data: bytes) -> GeoTIFF:
    """Decode a GeoTIFF byte string (first IFD = the full-res image)."""
    bo, tags = _parse_header(data)

    width = int(tags[TAG_IMAGE_WIDTH][0])
    height = int(tags[TAG_IMAGE_LENGTH][0])
    spp = int(tags.get(TAG_SAMPLES_PER_PIXEL, [1])[0])
    bits_l = tags.get(TAG_BITS_PER_SAMPLE, [8])
    if len(set(bits_l)) > 1:
        raise GeoTIFFError("mixed bits-per-sample")
    bits = int(bits_l[0])
    fmt_l = tags.get(TAG_SAMPLE_FORMAT, [1])
    fmt = int(fmt_l[0])
    compression = int(tags.get(TAG_COMPRESSION, [1])[0])
    predictor = int(tags.get(TAG_PREDICTOR, [1])[0])
    planar = int(tags.get(TAG_PLANAR_CONFIG, [1])[0])
    dtype = _dtype_of(bits, fmt, bo)

    tiled = TAG_TILE_OFFSETS in tags
    if tiled:
        tw = int(tags[TAG_TILE_WIDTH][0])
        th = int(tags[TAG_TILE_LENGTH][0])
        offsets = tags[TAG_TILE_OFFSETS]
        counts = tags[TAG_TILE_BYTE_COUNTS]
        tiles_across = (width + tw - 1) // tw
        tiles_down = (height + th - 1) // th
        per_plane = tiles_across * tiles_down
    else:
        rps = int(tags.get(TAG_ROWS_PER_STRIP, [height])[0])
        rps = min(rps, height) or height
        offsets = tags[TAG_STRIP_OFFSETS]
        counts = tags[TAG_STRIP_BYTE_COUNTS]
        per_plane = (height + rps - 1) // rps

    n_planes = spp if planar == 2 else 1
    samples_per_px = 1 if planar == 2 else spp
    planes: list[np.ndarray] = []
    for p in range(n_planes):
        img = np.zeros((height, width * samples_per_px), dtype=dtype)
        for idx in range(per_plane):
            k = p * per_plane + idx
            raw = data[offsets[k] : offsets[k] + counts[k]]
            if tiled:
                ty, tx = divmod(idx, tiles_across)
                rows_here, cols_here = th, tw
            else:
                rows_here = min(rps, height - idx * rps)
                cols_here = width
            row_samples = cols_here * samples_per_px
            if compression == 7:
                # JPEG-in-TIFF: per-block abbreviated (or full) JFIF
                # streams, shared tables in the JPEGTables tag -- both
                # ends of the from-scratch codecs meet here
                if bits != 8 or fmt != 1 or planar == 2:
                    raise GeoTIFFError(
                        "JPEG compression requires 8-bit unsigned "
                        "chunky samples"
                    )
                from .media import decode_jpeg

                jt = tags.get(TAG_JPEG_TABLES)
                rgb = decode_jpeg(
                    raw, tables=bytes(jt) if jt else None
                )
                if spp == 1:
                    block = rgb[:, :, 0]
                elif spp == 3:
                    block = rgb.reshape(rgb.shape[0], -1)
                else:
                    raise GeoTIFFError(
                        f"JPEG compression with {spp} samples"
                    )
                block = block[:rows_here, :row_samples].astype(
                    dtype, copy=False
                )
                if tiled:
                    r0, c0 = ty * th, tx * tw * samples_per_px
                    rr = min(th, height - r0)
                    cc = min(tw, width - tx * tw) * samples_per_px
                    img[r0 : r0 + rr, c0 : c0 + cc] = block[:rr, :cc]
                else:
                    img[idx * rps : idx * rps + rows_here, :] = block
                continue
            payload = _decompress(raw, compression)
            if predictor == 3:
                block = np.frombuffer(
                    payload, np.uint8,
                    count=rows_here * row_samples * dtype.itemsize,
                ).reshape(rows_here, row_samples * dtype.itemsize).copy()
                block = _undo_predictor(block, 3, dtype, samples_per_px)
            else:
                block = np.frombuffer(
                    payload, dtype, count=rows_here * row_samples
                ).reshape(rows_here, row_samples)
                if predictor == 2:
                    block = _undo_predictor(
                        block.copy(), 2, dtype, samples_per_px
                    )
            if tiled:
                r0, c0 = ty * th, tx * tw * samples_per_px
                rr = min(th, height - r0)
                cc = min(tw, width - tx * tw) * samples_per_px
                img[r0 : r0 + rr, c0 : c0 + cc] = block[:rr, :cc]
            else:
                img[idx * rps : idx * rps + rows_here, :] = block
        planes.append(img)

    if planar == 2:
        bands = planes
    elif spp > 1:
        chunky = planes[0].reshape(height, width, spp)
        bands = [np.ascontiguousarray(chunky[:, :, s]) for s in range(spp)]
    else:
        bands = [planes[0]]
    # native byte order for downstream numpy kernels
    native = np.dtype(dtype.str[-2:]) if dtype.byteorder in "><" else dtype
    bands = [b.astype(native.newbyteorder("="), copy=False) for b in bands]

    transform, crs, nodata = _geo_fields(tags)
    return GeoTIFF(
        width=width,
        height=height,
        count=spp,
        dtype=bands[0].dtype,
        transform=transform,
        crs=crs,
        nodata=nodata,
        _bands=bands,
    )


def open_geotiff(path: str) -> GeoTIFF:
    with open(path, "rb") as f:
        return parse_geotiff(f.read())


# =================================================================== writer

_NP_TO_FMT = {"u": 1, "i": 2, "f": 3}


def _predictor_encode(arr: np.ndarray, predictor: int) -> bytes:
    if predictor == 2:
        d = arr.copy()
        d[:, 1:] -= arr[:, :-1]
        return d.tobytes()
    if predictor == 3:
        be = arr.astype(arr.dtype.newbyteorder(">"))
        rows, w = arr.shape
        itemsize = arr.dtype.itemsize
        planes = (
            be.view(np.uint8)
            .reshape(rows, w, itemsize)
            .transpose(0, 2, 1)
            .reshape(rows, w * itemsize)
        )
        d = planes.astype(np.uint8).copy()
        d[:, 1:] -= planes[:, :-1]
        return d.tobytes()
    return arr.tobytes()


def write_geotiff(
    path: str,
    array: np.ndarray,
    transform: list[float] | None = None,
    crs: str | None = None,
    nodata: float | None = None,
    *,
    tile: int | None = None,
    compression: str = "none",  # none | deflate | jpeg
    predictor: int = 1,
    rows_per_strip: int | None = None,
    jpeg_quality: int = 90,
) -> None:
    """Write a single-band classic little-endian GeoTIFF.

    ``transform`` is the rasterio-style affine ``(a, b, c, d, e, f)``
    with b = d = 0 (encoded as PixelScale + Tiepoint).  ``crs`` is an
    ``EPSG:nnnn`` string.
    """
    arr = np.ascontiguousarray(array)
    if arr.ndim != 2:
        raise GeoTIFFError("writer supports single-band 2-D arrays")
    h, w = arr.shape
    dt = arr.dtype.newbyteorder("<")
    arr = arr.astype(dt, copy=False)
    fmt = _NP_TO_FMT.get(dt.kind)
    if fmt is None:
        raise GeoTIFFError(f"unsupported dtype {arr.dtype}")
    comp_code = {
        "none": 1, "deflate": 8, "jpeg": 7, "lzma": 34925,
    }[compression]
    if comp_code == 7 and (arr.dtype != np.uint8):
        raise GeoTIFFError("jpeg compression requires uint8 arrays")

    # ---- payload blocks
    if comp_code == 7:
        from .media import encode_jpeg

        def enc(block: np.ndarray) -> bytes:
            # abbreviated stream; shared tables go in JPEGTables (347)
            return encode_jpeg(
                block, quality=jpeg_quality, abbreviated=True
            )
    else:
        def enc(block: np.ndarray) -> bytes:
            return _predictor_encode(block, predictor)

    blocks: list[bytes] = []
    if tile:
        for r0 in range(0, h, tile):
            for c0 in range(0, w, tile):
                block = np.zeros((tile, tile), dt)
                sub = arr[r0 : r0 + tile, c0 : c0 + tile]
                block[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(enc(block))
    else:
        rps = rows_per_strip or max(1, (1 << 16) // max(1, w * dt.itemsize))
        rps = min(rps, h)
        for r0 in range(0, h, rps):
            blocks.append(enc(arr[r0 : r0 + rps]))
    if comp_code == 8:
        blocks = [zlib.compress(b, 6) for b in blocks]
    elif comp_code == 34925:
        import lzma

        blocks = [lzma.compress(b, preset=1) for b in blocks]

    # ---- tag assembly
    entries: list[tuple[int, int, int, bytes | int]] = []

    def add(tag, ftype, values):
        ch, size = _TYPE_FMT[ftype]
        if ftype == 2:
            raw = values.encode("ascii") + b"\x00"
            count = len(raw)
        else:
            if not isinstance(values, (list, tuple)):
                values = [values]
            count = len(values)
            raw = struct.pack("<" + ch * count, *values)
        entries.append((tag, ftype, count, raw))

    add(TAG_IMAGE_WIDTH, 4, w)
    add(TAG_IMAGE_LENGTH, 4, h)
    add(TAG_BITS_PER_SAMPLE, 3, dt.itemsize * 8)
    add(TAG_COMPRESSION, 3, comp_code)
    add(TAG_PHOTOMETRIC, 3, 1)
    add(TAG_SAMPLES_PER_PIXEL, 3, 1)
    if predictor != 1:
        add(TAG_PREDICTOR, 3, predictor)
    if comp_code == 7:
        from .media import jpeg_tables_stream

        add(TAG_JPEG_TABLES, 7,
            list(jpeg_tables_stream(jpeg_quality, gray=True)))
    add(TAG_SAMPLE_FORMAT, 3, fmt)
    if tile:
        add(TAG_TILE_WIDTH, 3, tile)
        add(TAG_TILE_LENGTH, 3, tile)
    else:
        add(TAG_ROWS_PER_STRIP, 4, rps)
    if transform is not None:
        a, b, c, d, e, f = (float(v) for v in transform)
        if b or d:
            m = [a, b, 0.0, c, d, e, 0.0, f, 0, 0, 0, 0, 0, 0, 0, 1.0]
            add(TAG_MODEL_TRANSFORMATION, 12, [float(v) for v in m])
        else:
            add(TAG_MODEL_PIXEL_SCALE, 12, [a, -e, 0.0])
            add(TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, c, f, 0.0])
    if crs:
        code = int(str(crs).split(":")[-1])
        is_proj = not (4000 <= code < 5000)
        keys = [1, 1, 0, 2, GEOKEY_MODEL_TYPE, 0, 1, 1 if is_proj else 2]
        keys += (
            [GEOKEY_PROJECTED_CS_TYPE, 0, 1, code]
            if is_proj
            else [GEOKEY_GEOGRAPHIC_TYPE, 0, 1, code]
        )
        add(TAG_GEO_KEY_DIRECTORY, 3, keys)
    if nodata is not None:
        nd = (
            str(int(nodata))
            if float(nodata) == int(nodata) and abs(nodata) < 1e15
            else repr(float(nodata))
        )
        add(TAG_GDAL_NODATA, 2, nd)

    # offsets/counts tags get placeholders, patched after layout
    n_blocks = len(blocks)
    off_tag = TAG_TILE_OFFSETS if tile else TAG_STRIP_OFFSETS
    cnt_tag = TAG_TILE_BYTE_COUNTS if tile else TAG_STRIP_BYTE_COUNTS
    add(off_tag, 4, [0] * n_blocks)
    add(cnt_tag, 4, [len(b) for b in blocks])

    entries.sort(key=lambda t: t[0])
    n = len(entries)
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + n * 12 + 4
    # out-of-line data area follows the IFD
    data_off = 8 + ifd_size
    out_of_line = bytearray()
    packed_entries = bytearray()
    patch_pos: dict[int, int] = {}  # tag -> absolute pos of its data
    for tag, ftype, count, raw in entries:
        ch, size = _TYPE_FMT[ftype]
        total = len(raw)
        ent = struct.pack("<HHI", tag, ftype, count)
        if total <= 4:
            ent += raw + b"\x00" * (4 - total)
            patch_pos[tag] = 8 + 2 + len(packed_entries) + 8
        else:
            patch_pos[tag] = data_off + len(out_of_line)
            ent += struct.pack("<I", data_off + len(out_of_line))
            out_of_line += raw
        packed_entries += ent

    blocks_off = data_off + len(out_of_line)
    offsets = []
    pos = blocks_off
    for b in blocks:
        offsets.append(pos)
        pos += len(b)

    buf = bytearray(header)
    buf += struct.pack("<H", n)
    buf += packed_entries
    buf += struct.pack("<I", 0)  # next IFD
    buf += out_of_line
    for b in blocks:
        buf += b
    # patch the offsets array in place
    struct.pack_into("<" + "I" * n_blocks, buf, patch_pos[off_tag], *offsets)

    with open(path, "wb") as fh:
        fh.write(buf)


# ====================================================== tile-table builder


def geotiff_to_tiles(
    data: bytes,
    src: str,
    tile: int = 256,
    band: int | None = 1,
):
    """Decoded GeoTIFF -> TILE_SCHEMA Arrow table (one row per tile
    window per band), the engine's canonical raster representation.
    Values are cast to float32 (the reference's storage dtype,
    ``completePixleOutput.py:51``); absent nodata falls back to the
    float32-lowest sentinel so the validity threshold never matches.

    Runs inside Ray read tasks (one file per task) -- the whole-file
    byte string is the natural unit because TIFF IFDs point anywhere in
    the file."""
    import pyarrow as pa

    from ..schema import NODATA_F32, TILE_SCHEMA

    g = parse_geotiff(data)
    bands = [band] if band is not None else list(range(1, g.count + 1))
    nodata = float(g.nodata) if g.nodata is not None else float(NODATA_F32)
    transform = g.transform or [1.0, 0.0, 0.0, 0.0, -1.0, 0.0]
    crs = g.crs or "EPSG:4326"

    ids, bs, ro, co, hh, ww, vals = [], [], [], [], [], [], []
    for b in bands:
        arr = g.read(b).astype(np.float32, copy=False)
        for r0 in range(0, g.height, tile):
            for c0 in range(0, g.width, tile):
                sub = arr[r0 : r0 + tile, c0 : c0 + tile]
                ids.append(f"{src}_b{b}_{r0}_{c0}")
                bs.append(b)
                ro.append(r0)
                co.append(c0)
                hh.append(sub.shape[0])
                ww.append(sub.shape[1])
                vals.append(np.ascontiguousarray(sub).ravel())
    n = len(ids)
    flat = np.concatenate(vals) if vals else np.empty(0, np.float32)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum([v.size for v in vals], out=offsets[1:])
    values_arr = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, pa.float32())
    )
    return pa.table(
        {
            "tile_id": ids,
            "src": [src] * n,
            "band": pa.array(bs, pa.int32()),
            "row_off": pa.array(ro, pa.int32()),
            "col_off": pa.array(co, pa.int32()),
            "height": pa.array(hh, pa.int32()),
            "width": pa.array(ww, pa.int32()),
            "transform": pa.array([transform] * n, pa.list_(pa.float64(), 6)),
            "crs": [crs] * n,
            "nodata": pa.array([nodata] * n, pa.float64()),
            "values": values_arr,
        },
        schema=TILE_SCHEMA,
    )
