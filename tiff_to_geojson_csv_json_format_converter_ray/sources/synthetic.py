"""Deterministic synthetic fixture generators (FIXTURES.md F1-F4).

The reference ships no test data (its tiffData/ input is gitignored),
so the conformance corpus is generated here: seeded (seed=42), pure
NumPy/pyarrow, no wall-clock. Used by tests, ``__ray_entry__.entry()``
and ``bench.py``.

Raster footprint: 256x256 master grid at 0.01 deg/pixel from upper-left
(77.0, 29.0) -- lon in [77.0, 79.56], lat in [26.44, 29.0] (Delhi-ish,
mirroring the reference's own fixtures, slope.js:158-167).
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

from ..schema import NODATA_F32, PAGES_SCHEMA, POLYGON_SCHEMA, TILE_SCHEMA

SEED = 42

# master grid spec (FROZEN -- golden fixtures depend on it)
GRID_H = 256
GRID_W = 256
TILE = 64
TRANSFORM_4326 = (0.01, 0.0, 77.0, 0.0, -0.01, 29.0)
TRANSFORM_UTM = (30.0, 0.0, 500000.0, 0.0, -30.0, 3200000.0)  # EPSG:32643, 30 m pixels

URBAN_CENTERS = [  # (lon, lat) -- 5 hot clusters inside the footprint
    (77.20, 28.60),  # Delhi-like
    (77.60, 27.20),
    (78.50, 28.00),
    (79.00, 26.90),
    (78.00, 26.70),
]


def _master_values(rng: np.random.RandomState) -> np.ndarray:
    """(H, W) float32 elevation: smooth field + noise + ~30% nodata blobs."""
    rows = np.arange(GRID_H)[:, None]
    cols = np.arange(GRID_W)[None, :]
    a, b, c, d, e, f = TRANSFORM_4326
    lon = c + a * (cols + 0.5)
    lat = f + e * (rows + 0.5)
    z = 100.0 + 50.0 * np.sin(lon) * np.cos(lat)
    z = z + rng.normal(0.0, 2.0, size=(GRID_H, GRID_W))
    # nodata blobs: threshold a low-frequency seeded field at ~30%
    blob = np.zeros((GRID_H, GRID_W))
    for _ in range(45):
        cy, cx = rng.randint(0, GRID_H), rng.randint(0, GRID_W)
        r = rng.randint(8, 20)
        yy, xx = np.ogrid[:GRID_H, :GRID_W]
        blob += ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(float)
    mask = blob > 0
    frac = mask.mean()
    z = z.astype(np.float32)
    if frac > 0:
        z[mask] = NODATA_F32
    return z


def gen_tiles() -> pa.Table:
    """Tile table (F2): 16 tiles of 64x64 from the 256x256 EPSG:4326
    master grid, plus one all-nodata tile, one all-zeros tile
    (zero-semantics, test2.py:1371-1414), one 3-band tile and one UTM
    (EPSG:32643) tile."""
    rng = np.random.RandomState(SEED)
    master = _master_values(rng)

    ids, srcs, bands, ro, co, hs, ws, tr, crs, nd, vals = ([] for _ in range(11))

    def add(tile_id, src, band, row_off, col_off, h, w, transform, crs_s, nodata, v):
        ids.append(tile_id)
        srcs.append(src)
        bands.append(band)
        ro.append(row_off)
        co.append(col_off)
        hs.append(h)
        ws.append(w)
        tr.append(list(transform))
        crs.append(crs_s)
        nd.append(nodata)
        vals.append(np.asarray(v, dtype=np.float32).ravel())

    for r0 in range(0, GRID_H, TILE):
        for c0 in range(0, GRID_W, TILE):
            add(
                f"grid_{r0}_{c0}", "master_4326", 1, r0, c0, TILE, TILE,
                TRANSFORM_4326, "EPSG:4326", NODATA_F32,
                master[r0 : r0 + TILE, c0 : c0 + TILE],
            )

    # all-nodata tile (early-exit path, willOnlyStoreValidPoints.py:74-95)
    add("allnodata_0_0", "allnodata", 1, 0, 0, 32, 32, TRANSFORM_4326,
        "EPSG:4326", NODATA_F32, np.full((32, 32), NODATA_F32))
    # all-zeros tile with nodata=0 (zeros-are-nodata, test2.py:1377-1388)
    add("allzero_0_0", "allzero_nd0", 1, 0, 0, 32, 32, TRANSFORM_4326,
        "EPSG:4326", 0.0, np.zeros((32, 32)))
    # 3-band tile (per-band stats)
    rng3 = np.random.RandomState(SEED + 1)
    for b in (1, 2, 3):
        add(f"multi_b{b}", "multiband", b, 0, 0, 32, 32, TRANSFORM_4326,
            "EPSG:4326", NODATA_F32,
            (b * 10.0 + rng3.rand(32, 32) * 5.0))
    # UTM tile (EPSG:32643 reprojection leg, cf. test2.py:1095)
    rngu = np.random.RandomState(SEED + 2)
    add("utm_0_0", "utm43n", 1, 0, 0, 64, 64, TRANSFORM_UTM,
        "EPSG:32643", NODATA_F32, 200.0 + rngu.rand(64, 64) * 100.0)

    return pa.table(
        {
            "tile_id": ids, "src": srcs,
            "band": pa.array(bands, pa.int32()),
            "row_off": pa.array(ro, pa.int32()),
            "col_off": pa.array(co, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "transform": pa.array(tr, pa.list_(pa.float64(), 6)),
            "crs": crs,
            "nodata": pa.array(nd, pa.float64()),
            "values": pa.array([v.tolist() for v in vals], pa.list_(pa.float32())),
        },
        schema=TILE_SCHEMA,
    )


def gen_polygons() -> pa.Table:
    """Polygon side table (F3): 10 Polygons + 2 MultiPolygons over the
    raster footprint; one concave, one with a hole, one fully outside,
    one overlapping pair."""
    rng = np.random.RandomState(SEED + 3)
    rows = []

    def hexagon(cx, cy, r):
        ang = np.linspace(0.0, 2.0 * np.pi, 7)[:-1]
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
        return np.vstack([ring, ring[:1]])

    centers = [
        (77.3, 28.5), (77.45, 28.42),  # overlapping pair adm_0 / adm_1
        (78.2, 27.8), (78.9, 27.1), (77.8, 26.9),
        (79.2, 28.6), (77.1, 27.4), (78.6, 26.6), (79.4, 26.8),
    ]
    for k, (cx, cy) in enumerate(centers):
        r = 0.12 + 0.08 * rng.rand()
        rows.append((f"adm_{k}", "Polygon", [hexagon(cx, cy, r)]))

    # concave L-shape
    l_ring = np.array(
        [[78.0, 28.2], [78.5, 28.2], [78.5, 28.35], [78.15, 28.35],
         [78.15, 28.7], [78.0, 28.7], [78.0, 28.2]]
    )
    rows.append(("adm_9", "Polygon", [l_ring]))

    # polygon with a hole
    outer = np.array(
        [[77.6, 27.6], [78.0, 27.6], [78.0, 28.0], [77.6, 28.0], [77.6, 27.6]]
    )
    hole = np.array(
        [[77.72, 27.72], [77.88, 27.72], [77.88, 27.88], [77.72, 27.88], [77.72, 27.72]]
    )
    rows.append(("adm_10", "Polygon", [outer, hole]))

    # MultiPolygon: two parts; and one fully outside the raster
    part_a = hexagon(79.3, 27.6, 0.1)
    part_b = hexagon(79.1, 27.9, 0.08)
    rows.append(("adm_11", "MultiPolygon", [part_a, part_b]))
    rows.append(("adm_outside", "Polygon", [hexagon(85.0, 20.0, 0.2)]))

    ids, gts, rings_col, minx, miny, maxx, maxy = [], [], [], [], [], [], []
    for pid, gt, rings in rows:
        ids.append(pid)
        gts.append(gt)
        rings_col.append([r.tolist() for r in rings])
        allpts = np.vstack(rings)
        minx.append(float(allpts[:, 0].min()))
        miny.append(float(allpts[:, 1].min()))
        maxx.append(float(allpts[:, 0].max()))
        maxy.append(float(allpts[:, 1].max()))

    return pa.table(
        {
            "polygon_id": ids, "geom_type": gts,
            "rings": pa.array(rings_col, POLYGON_SCHEMA.field("rings").type),
            "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
        },
        schema=POLYGON_SCHEMA,
    )


_WORDS_EN = (
    "the quick brown fox jumps over a lazy dog and runs to town with many "
    "small stones near the old river bank while birds sing in tall trees"
).split()
_WORDS_DE = "der schnelle braune fuchs springt über den faulen hund und läuft".split()
_WORDS_FR = "le rapide renard brun saute par dessus le chien paresseux et court".split()
_WORDS_HI = "तेज भूरी लोमड़ी आलसी कुत्ते के ऊपर कूदती है और शहर की ओर भागती".split()


def _gen_text(rng: np.random.RandomState, lang: str, n_words: int) -> str:
    pool = {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR, "hi": _WORDS_HI}.get(
        lang, _WORDS_EN
    )
    idx = rng.randint(0, len(pool), size=n_words)
    return " ".join(pool[i] for i in idx)


def gen_pages(n: int = 2000, seed: int = SEED) -> pa.Table:
    """Pages table (F1): urls (~1% dups), fixed-epoch timestamps,
    deterministic html embedding the golden text and a geo span; 80% of
    coordinates in 5 urban hot clusters (100x+ cell skew), 20% uniform;
    ~5% rows without a geo span.  All randomness pre-drawn as arrays
    (vectorized; only string assembly loops)."""
    rng = np.random.RandomState(seed)
    epoch = np.datetime64("2025-07-01T00:00:00", "us")

    # pre-drawn decision arrays (one RandomState, fixed call order)
    dup = np.r_[False, rng.rand(n - 1) < 0.01] if n > 1 else np.array([False])
    dup_src = rng.randint(0, np.maximum(np.arange(n), 1))
    hosts = rng.randint(0, max(2, n // 20), size=n)
    langs_arr = rng.choice(
        np.array(["en", "hi", "de", "fr", "zz"]), size=n,
        p=[0.70, 0.10, 0.05, 0.05, 0.10],
    )
    n_words = rng.randint(8, 60, size=n)
    word_idx = rng.randint(0, 1 << 30, size=(n, 60))
    has_geo = rng.rand(n) >= 0.05
    urban = rng.rand(n) < 0.8
    center_i = rng.randint(0, len(URBAN_CENTERS), size=n)
    centers = np.asarray(URBAN_CENTERS)
    lon = np.where(
        urban,
        centers[center_i, 0] + rng.normal(0.0, 0.02, size=n),
        77.0 + rng.rand(n) * 2.56,
    )
    lat = np.where(
        urban,
        centers[center_i, 1] + rng.normal(0.0, 0.02, size=n),
        26.44 + rng.rand(n) * 2.56,
    )
    offs = rng.randint(0, 86400 * 30, size=n)
    ts_arr = epoch + offs.astype("timedelta64[s]").astype("timedelta64[us]")

    pools = {k: {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR,
                 "hi": _WORDS_HI}.get(k, _WORDS_EN)
             for k in ("en", "hi", "de", "fr", "zz")}

    urls: list[str] = []
    ts: list = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    for i in range(n):
        if dup[i] and i > 0:
            j = int(dup_src[i]) % i
            urls.append(urls[j])
            ts.append(ts[j])
            htmls.append(htmls[j])
            texts.append(texts[j])
            langs.append(langs[j])
            continue
        lang = str(langs_arr[i])
        pool = pools[lang]
        k = len(pool)
        text = " ".join(pool[w % k] for w in word_idx[i, : n_words[i]])
        geo = (
            f'<span class="geo">{lat[i]:.6f},{lon[i]:.6f}</span>'
            if has_geo[i]
            else ""
        )
        page = (
            f"<html><head><title>T{i}</title></head><body>"
            f"<p>{_html.escape(text)}</p>{geo}</body></html>"
        )
        urls.append(f"https://host{hosts[i]}.example/page{i}")
        ts.append(ts_arr[i])
        htmls.append(page.encode("utf-8"))
        texts.append(text)
        langs.append(lang)

    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": texts,
            "lang": langs,
        },
        schema=PAGES_SCHEMA,
    )


def write_all_fixtures(out_dir: str, n_pages: int = 2000) -> dict[str, str]:
    """Write pages/tiles/polygons parquet under ``out_dir``; returns paths."""
    import pyarrow.parquet as pq
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {}
    for name, table in (
        ("pages", gen_pages(n_pages)),
        ("tiles", gen_tiles()),
        ("polygons", gen_polygons()),
    ):
        p = out / f"{name}.parquet"
        pq.write_table(table, p)
        paths[name] = str(p)
    return paths
