"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate, codec).  Decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages with small batches (payloads are large).

Decode: ``decoder='real'`` routes PNG / BMP / PPM / JPEG (round-4
baseline JFIF codec) images and PCM WAV audio through the from-scratch
stdlib codecs in ``sources/media.py`` (same policy as the GeoTIFF
codec).  Formats that genuinely need a native library (MP4 / webm
video) still raise -- honestly -- from the dispatcher;
``decoder='fake'`` keeps the deterministic seeded fake for plumbing
tests and for payloads of any type.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),   # image/png, audio/wav, video/mp4...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode via the from-scratch codecs (PNG/BMP/PPM/JPEG
    images, WAV/FLAC audio); raises NotImplementedError for formats
    whose SAMPLE decode needs a native codec library (H.264/VP9 video,
    Opus/MP3 audio -- container/metadata level is real, see
    sources/media.py parse_mp4/parse_webm/parse_mp3_header)."""
    from ..sources.media import MediaCodecError, decode_media

    try:
        return decode_media(payload, media_type)
    except MediaCodecError as e:
        raise NotImplementedError(
            f"no from-scratch codec for this payload ({e}); "
            "use decoder='fake' or plug a codec library in here"
        )


def _decode_fake(payload: bytes, media_type: str, h: int, w: int) -> np.ndarray:
    """Deterministic fake decode: pixels derived from a rolling hash of
    the payload -- stable across runs and partitions."""
    seed = int(np.frombuffer(
        payload[:8].ljust(8, b"\0"), dtype=np.uint64
    )[0] & np.uint64(0x7FFFFFFF))
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(max(h, 1), max(w, 1), 3), dtype=np.uint8)


class MediaDecode:
    """Actor-pool decode stage: binary payload -> dense array + stats.

    Use small ``batch_size`` (payloads are MBs) and ``concurrency=N``.
    Emits decoded summary columns (never the full pixel tensor into the
    table -- downstream feature stages consume the array in-process).
    """

    def __init__(self, decoder: str = "fake", thumbnail: int = 8):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.decoder = decoder
        self.thumbnail = thumbnail

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        means, stds, thumbs = [], [], []
        for p, t, h, w in zip(payloads, types, hs, ws):
            if self.decoder == "real":
                arr = _decode_real(p, t)
            else:
                arr = _decode_fake(p, t, int(h), int(w))
            # exact integer moments, ONE division each: mean = s/n and
            # var = sq/n - mean*mean match SQL's AVG(v)/AVG(v*v) forms
            # bit-for-bit (np.mean/np.std pairwise sums do not)
            a = arr.astype(np.int64)
            n = a.size
            s = int(a.sum())
            sq = int((a * a).sum())
            mean = s / n
            var = sq / n - mean * mean
            means.append(mean)
            stds.append(float(np.sqrt(max(var, 0.0))))
            # resize stub: block-mean thumbnail (deterministic)
            th = self.thumbnail
            ah, aw = arr.shape[0], arr.shape[1]
            ys = (np.arange(th) * ah) // th
            xs = (np.arange(th) * aw) // th
            thumbs.append(arr[ys][:, xs].mean(axis=2).astype(np.uint8).ravel().tolist())
        out = batch.drop_columns(["payload"])
        out = out.append_column("pixel_mean", pa.array(means))
        out = out.append_column("pixel_std", pa.array(stds))
        out = out.append_column(
            "thumbnail", pa.array(thumbs, pa.list_(pa.uint8()))
        )
        return out


def gen_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    ids, types, payloads, ws, hs, srs = [], [], [], [], [], []
    for i in range(n):
        ids.append(f"m{i}")
        kind = ["image/png", "audio/wav", "video/mp4"][i % 3]
        types.append(kind)
        payloads.append(rng.bytes(rng.randint(64, 512)))
        ws.append(int(rng.randint(8, 64)))
        hs.append(int(rng.randint(8, 64)))
        srs.append(16000 if kind.startswith("audio") else 0)
    return pa.table(
        {
            "media_id": ids, "media_type": types,
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "sample_rate": pa.array(srs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def gen_media_real(n: int = 24, seed: int = 42) -> pa.Table:
    """Synthetic media table whose payloads are REAL encoded files
    (PNG / BMP / PPM images, PCM WAV audio) from the from-scratch
    codecs -- the decoder='real' end-to-end fixture."""
    from ..sources.media import encode_bmp, encode_png, encode_ppm, encode_wav

    rng = np.random.RandomState(seed)
    ids, types, payloads, ws, hs, srs = [], [], [], [], [], []
    for i in range(n):
        kind = ["image/png", "image/bmp", "image/ppm", "audio/wav"][i % 4]
        h, w = int(rng.randint(8, 32)), int(rng.randint(8, 32))
        if kind == "audio/wav":
            samples = rng.randint(-3000, 3000, (256, 1)).astype(np.int16)
            payloads.append(encode_wav(samples, 16000))
            hs.append(256)
            ws.append(1)
            srs.append(16000)
        else:
            img = rng.randint(0, 256, (h, w, 3), np.uint8)
            enc = {
                "image/png": encode_png,
                "image/bmp": encode_bmp,
                "image/ppm": encode_ppm,
            }[kind]
            payloads.append(enc(img))
            hs.append(h)
            ws.append(w)
            srs.append(0)
        ids.append(f"m{i}")
        types.append(kind)
    return pa.table(
        {
            "media_id": ids, "media_type": types,
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "sample_rate": pa.array(srs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class FrameSample:
    """Actor-pool frame-sampling stage for video payloads: emit every
    ``stride``-th frame (deterministic), one output row per sampled
    frame with its decoded summary stats.  The frame decode reuses the
    stubbed kernel (``decoder='real'`` raises until a codec is plugged
    in; the fake is seeded per (payload, frame_idx) so results are
    stable across runs and partitionings).  Non-video rows pass
    through with frame_idx = -1 (their own single "frame")."""

    def __init__(self, stride: int = 4, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.stride = max(1, int(stride))
        self.decoder = decoder

    @staticmethod
    def _n_frames(payload: bytes) -> int:
        # deterministic stand-in for container metadata
        return 8 + (len(payload) % 24)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types = batch["media_id"].to_pylist(), batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_mean = [], [], []
        for mid, t, p, h, w in zip(ids, types, payloads, hs, ws):
            if not t.startswith("video/"):
                frames = [-1]
            else:
                frames = list(range(0, self._n_frames(p), self.stride))
            for fi in frames:
                if self.decoder == "real":
                    arr = _decode_real(p, t)
                else:
                    arr = _decode_fake(
                        p + fi.to_bytes(4, "little", signed=True), t,
                        int(h), int(w),
                    )
                out_id.append(mid)
                out_idx.append(fi)
                out_mean.append(float(arr.mean()))
        return pa.table(
            {
                "media_id": pa.array(out_id),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "pixel_mean": pa.array(out_mean),
            }
        )


def gen_media_grid(n: int = 24, size: int = 32, n_base: int = 16) -> pa.Table:
    """Formula-pixel PNG fixture: image ``i`` has grayscale pixels
    ``v(r, c) = (r*73 + c*31 + (i % n_base)*17 + p*100) % 256`` with
    ``p = 1`` on the top-left 4x4 block for the perturbed copies
    (``i >= n_base``) -- i.e. images ``i`` and ``i - n_base`` are
    NEAR-duplicates differing in one block.  Payloads are REAL PNG
    bytes from the from-scratch codec; the closed-form pixel rule is
    what makes a SQL oracle possible for ops over decoded content."""
    from ..sources.media import encode_png

    ids, payloads = [], []
    r = np.arange(size, dtype=np.int64)[:, None]
    c = np.arange(size, dtype=np.int64)[None, :]
    for i in range(n):
        k = i % n_base
        p = np.zeros((size, size), np.int64)
        if i >= n_base:
            p[:4, :4] = 1
        v = ((r * 73 + c * 31 + k * 17 + p * 100) % 256).astype(np.uint8)
        img = np.repeat(v[:, :, None], 3, axis=2)
        ids.append(f"m{i}")
        payloads.append(encode_png(img))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["image/png"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([size] * n, pa.int32()),
            "height": pa.array([size] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def gen_media_grid_jpeg(n: int = 18, size: int = 32) -> pa.Table:
    """Flat-block JPEG fixture: image ``i`` is a (size/8)^2 grid of
    flat 8x8 blocks with ``v(br, bc, i) = ((br*73 + bc*31 + i*17) %
    128) * 2``.  Even gray values survive Annex-K quality-50
    quantization EXACTLY (q00 = 16 divides 8*(v-128)), so the decode
    is bit-exact and the closed-form block rule is SQL-oracleable --
    the GeoTIFF-playbook fixture for the from-scratch JPEG codec."""
    from ..sources.media import encode_jpeg

    nb = size // 8
    br = np.arange(nb, dtype=np.int64)[:, None]
    bc = np.arange(nb, dtype=np.int64)[None, :]
    ids, payloads = [], []
    for i in range(n):
        v = (((br * 73 + bc * 31 + i * 17) % 128) * 2).astype(np.uint8)
        img = np.repeat(np.repeat(v, 8, 0), 8, 1)
        ids.append(f"j{i}")
        payloads.append(encode_jpeg(img, quality=50))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["image/jpeg"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([size] * n, pa.int32()),
            "height": pa.array([size] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaMetadata:
    """Actor-pool DEMUX-metadata stage for video/container columns:
    payload bytes -> (brand, duration_seconds, timescale, n_tracks,
    codec0) via the from-scratch container parsers (sources/media.py::
    parse_mp4 for ISO-BMFF, parse_webm for EBML/Matroska -- sniffed
    from the leading bytes).  Sample DECODE stays honestly stubbed --
    this stage covers the metadata level a curation pipeline filters
    on (duration caps, codec allowlists, track sanity)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.media import (
            MediaCodecError, parse_mp4, parse_webm,
        )

        brands, durs, tss, nts, c0s = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            try:
                if p[:4] == b"\x1aE\xdf\xa3":
                    w = parse_webm(p)
                    m = {
                        "brand": w["doctype"],
                        "duration_seconds": w["duration_seconds"],
                        "timescale": w["timestamp_scale_ns"],
                        "n_tracks": w["n_tracks"],
                        "tracks": [
                            {"codec": t["codec"]} for t in w["tracks"]
                        ],
                    }
                else:
                    m = parse_mp4(p)
            except MediaCodecError:
                m = {"brand": None, "duration_seconds": None,
                     "timescale": None, "n_tracks": 0, "tracks": []}
            brands.append(m["brand"])
            durs.append(m["duration_seconds"])
            tss.append(m["timescale"])
            nts.append(m["n_tracks"])
            c0s.append(m["tracks"][0]["codec"] if m["tracks"] else None)
        out = batch.drop_columns(["payload"])
        out = out.append_column("brand", pa.array(brands, pa.string()))
        out = out.append_column(
            "duration_seconds", pa.array(durs, pa.float64())
        )
        out = out.append_column("timescale", pa.array(tss, pa.int64()))
        out = out.append_column("n_tracks", pa.array(nts, pa.int64()))
        out = out.append_column("codec0", pa.array(c0s, pa.string()))
        return out


class AudioMetadata:
    """Header-level metadata for compressed-audio columns: FLAC
    STREAMINFO and MP3 frame headers (sources/media.py), sniffed from
    the leading bytes; WAV falls back to the real PCM decoder's rate.
    FLAC sample decode is real (sources/media.py::decode_flac, RFC
    9639); MP3 sample decode stays honestly stubbed."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.media import (
            MediaCodecError, parse_flac_streaminfo, parse_mp3_header,
            walk_mp3_frames,
        )

        fmts, rates, chans, durs, brs = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            fmt = rate = ch = dur = br = None
            try:
                if p[:4] == b"fLaC":
                    m = parse_flac_streaminfo(p)
                    fmt = "flac"
                    rate, ch = m["sample_rate"], m["channels"]
                    dur = m["duration_seconds"]
                else:
                    m = parse_mp3_header(p)
                    fmt = "mp3"
                    rate, ch = m["sample_rate"], m["channels"]
                    br = m["bitrate_kbps"]
                    # round 5: duration via the real frame walk (VBR-
                    # safe: each header's own bitrate steps the walk)
                    dur = walk_mp3_frames(p)["duration_seconds"]
            except MediaCodecError:
                pass
            fmts.append(fmt)
            rates.append(rate)
            chans.append(ch)
            durs.append(dur)
            brs.append(br)
        out = batch.drop_columns(["payload"])
        out = out.append_column("fmt", pa.array(fmts, pa.string()))
        out = out.append_column("rate", pa.array(rates, pa.int64()))
        out = out.append_column("channels", pa.array(chans, pa.int64()))
        out = out.append_column(
            "duration_seconds", pa.array(durs, pa.float64())
        )
        out = out.append_column(
            "bitrate_kbps", pa.array(brs, pa.int64())
        )
        return out


def gen_media_audio(n: int = 12) -> pa.Table:
    """Formula-field compressed-audio fixture: even ``i`` -> FLAC
    (rate 48000/44100 alternating by i//2 parity, 1 + i%2... kept
    simple: rate 48000, channels 1 + i%2, total samples
    (i+1) * 12000 -> exact durations), odd ``i`` -> MP3 (bitrate
    cycling 128/192/256, 44100 Hz stereo, ``30 + i*9`` frames so the
    frame-walk duration is oracle-exact)."""
    from ..sources.media import encode_flac_stub, encode_mp3_stub

    ids, payloads = [], []
    for i in range(n):
        ids.append(f"a{i}")
        if i % 2 == 0:
            payloads.append(
                encode_flac_stub(48000, 1 + (i // 2) % 2, (i + 1) * 12000)
            )
        else:
            payloads.append(
                encode_mp3_stub(
                    [128, 192, 256][(i // 2) % 3], 44100,
                    n_frames=30 + i * 9,
                )
            )
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(
                ["audio/flac" if i % 2 == 0 else "audio/mpeg"
                 for i in range(n)]
            ),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def gen_media_flac(n: int = 10) -> pa.Table:
    """Formula-sample FLAC fixture: clip ``i`` is mono 16-bit with
    ``600 + i*37`` samples and ``s[t] = ((t * (i + 3)) % 200) - 100``
    -- REAL FLAC bytes from the RFC 9639 encoder (fixed predictors +
    Rice residuals), closed-form samples for the SQL oracle.  FLAC is
    lossless, so decode stats are EXACT integer moments."""
    from ..sources.media import encode_flac

    ids, payloads = [], []
    for i in range(n):
        t = np.arange(600 + i * 37, dtype=np.int64)
        s = ((t * (i + 3)) % 200) - 100
        ids.append(f"f{i}")
        payloads.append(encode_flac(s.astype(np.int32), 16000, block_size=256))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["audio/flac"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def gen_media_webm(n: int = 10) -> pa.Table:
    """Formula-field WebM fixture: clip ``i`` has duration
    ``2 + (i*11 % 40) * 0.25`` seconds, a V_VP9 video track, and an
    A_OPUS audio track for every third clip -- REAL EBML bytes from
    encode_webm_stub, closed-form metadata for the SQL oracle."""
    from ..sources.media import encode_webm_stub

    ids, payloads = [], []
    for i in range(n):
        dur = 2.0 + (i * 11 % 40) * 0.25
        tracks = [("V_VP9", 1)] + (
            [("A_OPUS", 2)] if i % 3 == 0 else []
        )
        ids.append(f"w{i}")
        payloads.append(encode_webm_stub(dur, tracks))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["video/webm"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def gen_media_mp4(n: int = 12) -> pa.Table:
    """Formula-field MP4 fixture: clip ``i`` has duration
    ``1 + (i*7 % 50) * 0.25`` seconds (exact in the 1000-tick
    timescale AND in binary floating point), two tracks (avc1 video +
    mp4a audio) for even ``i`` and one vp09 video track for odd --
    REAL ISO-BMFF bytes from encode_mp4_stub, closed-form metadata
    for the SQL oracle."""
    from ..sources.media import encode_mp4_stub

    ids, payloads = [], []
    for i in range(n):
        dur = 1.0 + (i * 7 % 50) * 0.25
        tracks = (
            [("vide", "avc1"), ("soun", "mp4a")]
            if i % 2 == 0
            else [("vide", "vp09")]
        )
        ids.append(f"v{i}")
        payloads.append(encode_mp4_stub(dur, 1000, tracks))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["video/mp4"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
            "sample_rate": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def ahash_bits(gray: np.ndarray, block: int = 4) -> np.ndarray:
    """Average-hash bits of one grayscale image: bit_b = 1 iff block
    b's pixel sum x n_blocks exceeds the global sum (the integer form
    of ``block_mean > global_mean`` -- division-free, exact)."""
    h, w = gray.shape
    g = gray.astype(np.int64)
    bs = g.reshape(h // block, block, w // block, block).sum(axis=(1, 3))
    n_blocks = bs.size
    return (bs.ravel() * n_blocks > g.sum()).astype(np.int64)


def _banded_hamming_pairs(
    sig_ds: "ray.data.Dataset", max_hamming: int, num_buckets: int = 32
) -> pa.Table:
    """Distributed Hamming-pair tier over a (media_id, bits) signature
    Dataset: band each signature into ``max_hamming + 1`` bit bands
    (pigeonhole: any pair within ``max_hamming`` shares at least one
    EXACT band), groupby the hash-bucketed (band, key), verify each
    band-bucket's candidates with exact popcount Hamming, then dedupe
    the (output-sized) pair list.  The signature itself rides the
    shuffle as ceil(nbits/64) packed little-endian words in one
    fixed-width binary cell per row -- never the payload bytes (and
    never a single int64, whose mod-64 shifts corrupt signatures
    wider than 64 bits; ADVICE r4).
    Same bucketed shape as stages/dedup.py's MinHash-LSH tier."""
    import ray.data  # noqa: F401

    from .dedup import _bucket_ids, _segment_bounds

    nbands = max_hamming + 1

    def explode(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        rows = t["bits"].to_pylist()
        lens = {len(b) for b in rows}
        if len(lens) > 1:
            raise ValueError(
                f"non-uniform signature lengths {sorted(lens)}"
            )
        mat = np.asarray(rows, np.int64)
        n, nbits = mat.shape
        # ADVICE r4: pack into ceil(nbits/64) LITTLE-ENDIAN words and
        # carry the signature as fixed-width binary -- a single int64
        # wraps shifts mod 64 for signatures wider than 64 bits and
        # silently corrupts the exact-Hamming verify
        nwords = (nbits + 63) // 64
        packed = np.zeros((n, nwords), np.uint64)
        for j in range(nbits):
            packed[:, j >> 6] |= mat[:, j].astype(np.uint64) << np.uint64(
                j & 63
            )
        sig_bytes = np.ascontiguousarray(
            packed.astype("<u8")
        ).view(np.uint8).reshape(n, nwords * 8)
        sig = pa.Array.from_buffers(
            pa.binary(nwords * 8), n,
            [None, pa.py_buffer(sig_bytes.tobytes())],
        )
        edges = np.linspace(0, nbits, nbands + 1).astype(int)
        parts = []
        for b in range(nbands):
            seg = mat[:, edges[b]:edges[b + 1]]
            key = (
                seg << np.arange(seg.shape[1], dtype=np.int64)
            ).sum(axis=1)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(n, b, np.int32)),
                        "key": pa.array(key),
                        "media_id": pa.array(ids, pa.string()),
                        "sig": sig,
                    }
                )
            )
        return pa.concat_tables(parts)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bkt",
            pa.array(_bucket_ids(
                t["band"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["key"].to_numpy(zero_copy_only=False),
                num_buckets=num_buckets,
            )),
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = group["key"].to_numpy(zero_copy_only=False)
        ids = np.asarray(group["media_id"].to_pylist())
        col = group["sig"].combine_chunks()
        w = col.type.byte_width
        smat = np.frombuffer(col.buffers()[1], np.uint8)[
            col.offset * w : (col.offset + len(col)) * w
        ].reshape(len(col), w)
        order = np.lexsort((key, band))
        band, key, ids, smat = band[order], key[order], ids[order], smat[order]
        bounds = _segment_bounds(band, key)
        out_a, out_b, out_h = [], [], []
        for s, t_ in zip(bounds[:-1], bounds[1:]):
            g = int(t_ - s)
            if g < 2:
                continue
            sid, ssig = ids[s:t_], smat[s:t_]
            ii, jj = np.triu_indices(g, 1)
            x = np.bitwise_xor(ssig[ii], ssig[jj])
            ham = np.unpackbits(x, axis=1).sum(axis=1)
            k = ham <= max_hamming
            a, b = sid[ii[k]], sid[jj[k]]
            swap = a > b  # np.minimum has no unicode loop
            lo = np.where(swap, b, a)
            hi = np.where(swap, a, b)
            out_a.extend(lo.tolist())
            out_b.extend(hi.tolist())
            out_h.extend(ham[k].astype(np.int64).tolist())
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.string()),
                "id_b": pa.array(out_b, pa.string()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    pair_ds = (
        sig_ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("_bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    parts = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in pair_ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {"id_a": pa.array([], pa.string()),
             "id_b": pa.array([], pa.string()),
             "hamming": pa.array([], pa.int64())}
        )
    # the same pair surfaces once per shared band -- dedupe the
    # OUTPUT-sized list
    allp = pa.concat_tables(parts)
    out = allp.group_by(["id_a", "id_b"]).aggregate([("hamming", "min")])
    out = out.rename_columns(["id_a", "id_b", "hamming"])
    order = pc.sort_indices(
        out, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
    )
    return out.take(order)


def image_ahash_pairs(
    media: "ray.data.Dataset", max_hamming: int = 6, block: int = 4,
    tier: str = "driver",
):
    """Perceptual near-duplicate detection over IMAGE BYTES: decode
    (from-scratch codecs) + average-hash per batch (stateless
    ``map_batches``, one 64-bit signature per image leaves the stage),
    then Hamming pairs over the signature table.  The pair step here
    is the driver all-pairs tier (signature tables are tiny relative
    to payload bytes); beyond driver memory, band the 64 bits into 4x
    16-bit keys and reuse the LSH ``groupby`` machinery of
    stages/dedup.py (pigeonhole: Hamming <= 6 pairs share at least one
    exact band for 4 bands... holds for <= 3; use 7 bands of 9 bits
    for <= 6).  Returns ``(id_a, id_b, hamming)``, id_a < id_b."""
    import ray.data  # noqa: F401

    from ..sources.media import decode_media

    def sig(batch: pa.Table) -> pa.Table:
        ids, bits = [], []
        for i in range(batch.num_rows):
            arr = decode_media(
                batch["payload"][i].as_py(), batch["media_type"][i].as_py()
            )
            gray = arr[:, :, 0] if arr.ndim == 3 else arr
            ids.append(batch["media_id"][i].as_py())
            bits.append(ahash_bits(gray, block))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "bits": pa.array(
                    [b.tolist() for b in bits], pa.list_(pa.int64())
                ),
            }
        )

    sig_ds = media.map_batches(sig, batch_format="pyarrow", batch_size=None)
    if tier == "banded":
        # scale tier: signatures stay a Dataset; banded LSH groupby +
        # exact verify (see _banded_hamming_pairs)
        return _banded_hamming_pairs(sig_ds, max_hamming)
    if tier != "driver":
        raise ValueError(f"unknown tier: {tier}")
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in sig_ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    tbl = pa.concat_tables([t for t in parts if t.num_rows])
    ids = tbl["media_id"].to_pylist()
    lens = {len(b) for b in tbl["bits"].to_pylist()}
    if len(lens) > 1:
        # ADVICE r3: mixed image sizes would make a ragged object
        # array and crash cryptically below -- fail loudly (signatures
        # are fixed-width by construction; a mismatch means the caller
        # mixed signature schemes)
        raise ValueError(
            f"non-uniform signature lengths {sorted(lens)}; all images "
            "must produce the same bit-vector width"
        )
    mat = np.array(tbl["bits"].to_pylist(), np.int64)
    order = np.argsort(np.asarray(ids))
    ids = [ids[int(i)] for i in order]
    mat = mat[order]
    out_a, out_b, out_h = [], [], []
    for i in range(len(ids)):
        ham = np.abs(mat[i + 1 :] - mat[i]).sum(axis=1)
        for j in np.flatnonzero(ham <= max_hamming):
            out_a.append(ids[i])
            out_b.append(ids[i + 1 + int(j)])
            out_h.append(int(ham[int(j)]))
    return pa.table(
        {
            "id_a": pa.array(out_a, pa.string()),
            "id_b": pa.array(out_b, pa.string()),
            "hamming": pa.array(out_h, pa.int64()),
        }
    )


def dhash_bits(gray: np.ndarray, block: int = 4) -> np.ndarray:
    """Difference-hash bits of one grayscale image: block-sum grid,
    bit = left block sum > right block sum (horizontal gradient sign;
    integer-only, exact)."""
    h, w = gray.shape
    g = gray.astype(np.int64)
    bs = g.reshape(h // block, block, w // block, block).sum(axis=(1, 3))
    return (bs[:, :-1] > bs[:, 1:]).astype(np.int64).ravel()


def image_dhash_pairs(
    media: "ray.data.Dataset", max_hamming: int = 6, block: int = 4,
    tier: str = "driver",
):
    """Gradient-based (difference-hash) perceptual near-duplicate
    pairs over IMAGE BYTES -- the dhash companion of
    :func:`image_ahash_pairs` (dhash is robust to global brightness
    shifts that flip ahash bits).  Same decode -> signature ->
    driver-pair shape; same LSH banding note for beyond-driver
    scale.  Returns ``(id_a, id_b, hamming)``, id_a < id_b."""
    import ray.data  # noqa: F401

    from ..sources.media import decode_media

    def sig(batch: pa.Table) -> pa.Table:
        ids, bits = [], []
        for i in range(batch.num_rows):
            arr = decode_media(
                batch["payload"][i].as_py(), batch["media_type"][i].as_py()
            )
            gray = arr[:, :, 0] if arr.ndim == 3 else arr
            ids.append(batch["media_id"][i].as_py())
            bits.append(dhash_bits(gray, block))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "bits": pa.array(
                    [b.tolist() for b in bits], pa.list_(pa.int64())
                ),
            }
        )

    sig_ds = media.map_batches(sig, batch_format="pyarrow", batch_size=None)
    if tier == "banded":
        # scale tier: signatures stay a Dataset; banded LSH groupby +
        # exact verify (see _banded_hamming_pairs)
        return _banded_hamming_pairs(sig_ds, max_hamming)
    if tier != "driver":
        raise ValueError(f"unknown tier: {tier}")
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in sig_ds.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    tbl = pa.concat_tables([t for t in parts if t.num_rows])
    ids = tbl["media_id"].to_pylist()
    lens = {len(b) for b in tbl["bits"].to_pylist()}
    if len(lens) > 1:
        # ADVICE r3: mixed image sizes would make a ragged object
        # array and crash cryptically below -- fail loudly (signatures
        # are fixed-width by construction; a mismatch means the caller
        # mixed signature schemes)
        raise ValueError(
            f"non-uniform signature lengths {sorted(lens)}; all images "
            "must produce the same bit-vector width"
        )
    mat = np.array(tbl["bits"].to_pylist(), np.int64)
    order = np.argsort(np.asarray(ids))
    ids = [ids[int(i)] for i in order]
    mat = mat[order]
    out_a, out_b, out_h = [], [], []
    for i in range(len(ids)):
        ham = np.abs(mat[i + 1 :] - mat[i]).sum(axis=1)
        for j in np.flatnonzero(ham <= max_hamming):
            out_a.append(ids[i])
            out_b.append(ids[i + 1 + int(j)])
            out_h.append(int(ham[int(j)]))
    return pa.table(
        {
            "id_a": pa.array(out_a, pa.string()),
            "id_b": pa.array(out_b, pa.string()),
            "hamming": pa.array(out_h, pa.int64()),
        }
    )


def gen_wav_grid(n: int = 12, n_samples: int = 256) -> pa.Table:
    """Formula-sample WAV fixture: clip ``i`` has mono int16 samples
    ``s(i, t) = ((t*73 + i*17) % 2001) - 1000`` encoded as REAL PCM
    WAV bytes by the from-scratch codec -- the audio counterpart of
    :func:`gen_media_grid` (closed-form samples make SQL oracles over
    decoded audio possible)."""
    from ..sources.media import encode_wav

    t = np.arange(n_samples, dtype=np.int64)
    ids, payloads = [], []
    for i in range(n):
        s = ((t * 73 + i * 17) % 2001 - 1000).astype(np.int16)
        ids.append(f"w{i}")
        payloads.append(encode_wav(s[:, None], 16000))
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["audio/wav"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([1] * n, pa.int32()),
            "height": pa.array([n_samples] * n, pa.int32()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def wav_frame_features(
    media: "ray.data.Dataset", frame: int = 64
):
    """Per-frame audio features over WAV BYTES: decode (stdlib codec)
    then exact integer energy (sum of squared samples) and
    zero-crossing count (strict sign flips) per fixed-length frame --
    the standard VAD / segmentation front-end, one stateless
    ``map_batches`` pass.  Returns ``(media_id, frame, energy,
    zcr)``."""
    from ..sources.media import decode_wav

    def feats(batch: pa.Table) -> pa.Table:
        ids, frs, ens, zcs = [], [], [], []
        for i in range(batch.num_rows):
            samples, _sr = decode_wav(batch["payload"][i].as_py())
            s = samples[:, 0].astype(np.int64)
            n_fr = len(s) // frame
            for f in range(n_fr):
                seg = s[f * frame : (f + 1) * frame]
                ids.append(batch["media_id"][i].as_py())
                frs.append(f)
                ens.append(int((seg * seg).sum()))
                zcs.append(int((seg[:-1] * seg[1:] < 0).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame": pa.array(frs, pa.int64()),
                "energy": pa.array(ens, pa.int64()),
                "zcr": pa.array(zcs, pa.int64()),
            }
        )

    return media.map_batches(feats, batch_format="pyarrow", batch_size=None)
