"""Pluggable "fetch tile data by bbox" sources -- the engine analogue
of the reference's GeoServer source-resolution ladder
(test2.py:815-992): WCS 2.0.1 -> WCS 1.1.1 -> WCS 1.0.0 -> WMS, each
rung tried in order, first success wins, and the WMS rung returns
styled uint8 data that the zonal pipeline must de-scale (T12).

The container has no network, so the HTTP rungs construct the real
request URLs (pinned against the reference's formats) but require an
injected ``http_get`` callable to actually fetch -- tests inject a
fake; production injects ``requests.get``.  The runnable rung is
:class:`LocalParquetFetcher`: a bbox-windowed read over a tiles
parquet (footprint prune from tile metadata WITHOUT touching the
``values`` column, then a tile_id-pushdown read of the surviving
rows) -- the same "window read" semantic as a WCS GetCoverage subset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class FetchError(Exception):
    """A rung of the source ladder failed (the reference's per-method
    try/except, test2.py:839-992)."""


def _buffered_bbox(bbox: tuple[float, float, float, float], buffer: float):
    minx, miny, maxx, maxy = bbox
    return (minx - buffer, miny - buffer, maxx + buffer, maxy + buffer)


class LocalParquetFetcher:
    """Window-read rung over a local tiles parquet: metadata-only
    footprint prune (transform-derived tile bboxes; the heavy
    ``values`` column never loads for rejected tiles), then a
    tile_id-filtered read of the hits."""

    name = "local-parquet"

    def __init__(self, tiles_path: str, layer_col: str = "src"):
        self.tiles_path = tiles_path
        self.layer_col = layer_col

    def fetch(
        self,
        layer: str,
        bbox: tuple[float, float, float, float],
        buffer: float = 0.0,
    ) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..functions.affine import pixel_to_world

        meta = pq.read_table(
            self.tiles_path,
            columns=[
                "tile_id", self.layer_col, "row_off", "col_off",
                "height", "width", "transform",
            ],
        )
        meta = meta.filter(pc.equal(meta[self.layer_col], layer))
        if meta.num_rows == 0:
            raise FetchError(f"layer {layer!r} not found")  # 404 analogue
        minx, miny, maxx, maxy = _buffered_bbox(bbox, buffer)
        keep_ids = []
        for i in range(meta.num_rows):
            tr = meta["transform"][i].as_py()
            r0 = float(meta["row_off"][i].as_py())
            c0 = float(meta["col_off"][i].as_py())
            h = float(meta["height"][i].as_py())
            w = float(meta["width"][i].as_py())
            xs, ys = pixel_to_world(
                tr,
                np.array([r0, r0, r0 + h, r0 + h]),
                np.array([c0, c0 + w, c0, c0 + w]),
                offset=0.0,
            )
            if (
                xs.min() <= maxx and xs.max() >= minx
                and ys.min() <= maxy and ys.max() >= miny
            ):
                keep_ids.append(meta["tile_id"][i].as_py())
        if not keep_ids:
            raise FetchError(
                f"layer {layer!r}: no tiles intersect bbox {bbox}"
            )
        return pq.read_table(
            self.tiles_path,
            filters=[("tile_id", "in", keep_ids)],
        )


class WCSFetcher:
    """WCS GetCoverage rung.  URL formats pinned to the reference
    (test2.py:815-905: v2.0.1 Long/Lat vs E/N axis naming, v1.1.1
    BoundingBox, v1.0.0 bbox+response_crs).  ``http_get(url) ->
    (status, content_type, body)`` must be injected to fetch."""

    def __init__(self, base_url: str, version: str = "2.0.1",
                 native_crs: str = "EPSG:4326", http_get=None,
                 workspace: str = "useruploads"):
        if version not in ("2.0.1", "1.1.1", "1.0.0"):
            raise ValueError(f"unsupported WCS version: {version}")
        self.base_url = base_url
        self.version = version
        self.native_crs = native_crs
        self.http_get = http_get
        self.workspace = workspace
        self.name = f"wcs-{version}"

    def url(self, layer: str, bbox, buffer: float = 0.0) -> str:
        minx, miny, maxx, maxy = _buffered_bbox(bbox, buffer)
        ws = f"{self.workspace}:{layer}"
        if self.version == "2.0.1":
            # axis naming differs by CRS family (test2.py:815-836)
            ax, ay = (
                ("Long", "Lat") if self.native_crs == "EPSG:4326" else ("E", "N")
            )
            return (
                f"{self.base_url}/wcs?service=WCS&version=2.0.1&"
                f"request=GetCoverage&coverageId={ws}&"
                f"subset={ax}({minx},{maxx})&subset={ay}({miny},{maxy})&"
                f"format=image/geotiff&outputCRS={self.native_crs}"
            )
        if self.version == "1.1.1":
            return (
                f"{self.base_url}/wcs?service=WCS&version=1.1.1&"
                f"request=GetCoverage&identifier={ws}&"
                f"BoundingBox={minx},{miny},{maxx},{maxy},{self.native_crs}&"
                f"format=image/geotiff&GridCS={self.native_crs}&"
                f"GridType=urn:ogc:def:method:WCS:1.1:2dSimpleGrid"
            )
        return (
            f"{self.base_url}/wcs?service=WCS&version=1.0.0&"
            f"request=GetCoverage&coverage={ws}&"
            f"bbox={minx},{miny},{maxx},{maxy}&crs={self.native_crs}&"
            f"response_crs={self.native_crs}&format=GeoTIFF&"
            f"width=1024&height=1024"
        )

    def fetch(self, layer: str, bbox, buffer: float = 0.0) -> pa.Table:
        if self.http_get is None:
            raise FetchError(f"{self.name}: no http_get injected (offline)")
        status, content_type, body = self.http_get(self.url(layer, bbox, buffer))
        if status != 200:
            raise FetchError(f"{self.name}: status {status}")
        if not str(content_type).startswith("image/") and (
            "tiff" not in str(content_type).lower()
        ):
            # the reference treats non-image bodies as failure
            raise FetchError(f"{self.name}: non-image response {content_type}")
        return self._decode(body)

    def _decode(self, body) -> pa.Table:
        # tests may inject fakes whose "body" already IS a tile table;
        # real GeoTIFF bytes go through the from-scratch codec
        # (sources/geotiff.py) -- the round-2 "no codec" stub is gone.
        if isinstance(body, pa.Table):
            return body
        if isinstance(body, (bytes, bytearray, memoryview)):
            from .geotiff import GeoTIFFError, geotiff_to_tiles

            try:
                return geotiff_to_tiles(
                    bytes(body), src=self.name, band=None
                )
            except GeoTIFFError as e:
                raise FetchError(f"{self.name}: bad GeoTIFF body: {e}")
        raise FetchError(
            f"{self.name}: cannot decode body of type {type(body).__name__}"
        )


class WMSFetcher(WCSFetcher):
    """WMS GetMap rung (the last resort): styled 8-bit output, so the
    caller must apply the T12 uint8 de-scale (test2.py:926-992)."""

    def __init__(self, base_url: str, native_crs: str = "EPSG:4326",
                 http_get=None, workspace: str = "useruploads"):
        self.base_url = base_url
        self.version = "wms-1.3.0"
        self.native_crs = native_crs
        self.http_get = http_get
        self.workspace = workspace
        self.name = "wms-1.3.0"
        self.returns_uint8 = True

    def url(self, layer: str, bbox, buffer: float = 0.0) -> str:
        minx, miny, maxx, maxy = _buffered_bbox(bbox, buffer)
        return (
            f"{self.base_url}/wms?service=WMS&version=1.3.0&request=GetMap&"
            f"layers={self.workspace}:{layer}&"
            f"bbox={minx},{miny},{maxx},{maxy}&width=1024&height=1024&"
            f"crs={self.native_crs}&format=image/geotiff&styles="
        )


class SourceLadder:
    """Try fetchers in order; first success wins (the reference's
    exception-driven fallback made explicit).  ``last_rung`` records
    which source satisfied the request, and ``attempts`` the error per
    failed rung -- the observability the reference only printed."""

    def __init__(self, fetchers: list):
        if not fetchers:
            raise ValueError("empty source ladder")
        self.fetchers = list(fetchers)
        self.last_rung: str | None = None
        self.attempts: list[tuple[str, str]] = []

    def fetch(self, layer: str, bbox, buffer: float = 0.0) -> pa.Table:
        self.attempts = []
        for f in self.fetchers:
            try:
                out = f.fetch(layer, bbox, buffer=buffer)
                self.last_rung = getattr(f, "name", type(f).__name__)
                return out
            except FetchError as e:
                self.attempts.append(
                    (getattr(f, "name", type(f).__name__), str(e))
                )
        raise FetchError(
            "all rungs failed: "
            + "; ".join(f"{n}: {m}" for n, m in self.attempts)
        )

    def _winner(self):
        for f in self.fetchers:
            if getattr(f, "name", None) == self.last_rung:
                return f
        return None

    @property
    def last_rung_is_uint8(self) -> bool:
        return bool(getattr(self._winner(), "returns_uint8", False))

    @property
    def orig_range(self):
        """(lo, hi) original value range of the winning rung's layer,
        when its fetcher knows it (catalog metadata) -- feeds the T12
        de-scale for styled uint8 rungs."""
        return getattr(self._winner(), "orig_range", None)
