"""Extraction stages: tile->point pivot (T1/T2/T3/T5) and pages
html->text+geo extraction (T14).

All are vectorized ``map_batches`` callables over Arrow batches
(``batch_format='pyarrow'``): the pivot replicates the reference's
meshgrid+flatten+affine+reproject chain (completePixleOutput.py:41-68)
and the extractor preserves the byte-identical-text-per-url invariant
(BASELINE.json input_hint).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from ..functions import affine as _affine
from ..functions import cells as _cells
from ..functions import crs as _crs
from ..functions import text as _text

# one tile row can explode into height*width point rows (controlled
# flat_map, SURVEY T1); outputs are chunked so blocks stay bounded.
DEFAULT_CHUNK_ROWS = 262_144


class TilePivot:
    """Pixel->point pivot: one tile row in, H*W point rows out.

    Reference semantics (completePixleOutput.py:41-68):
      meshgrid(rows, cols, indexing='ij') -> flatten -> affine xy at
      pixel centers -> reproject src CRS -> WGS84 -> round lon/lat to
      6 dp and z to 2 dp.

    Stateful pieces (the per-CRS transformer, ST1) are cached per actor
    in ``self._transformers`` -- pass this class to ``map_batches``
    with ``concurrency=N`` to run it as an actor pool.

    Parameters
    ----------
    round_output : replicate the reference rounding (6 dp lon/lat, 2 dp z).
    reproject    : convert to WGS84 (False = stay in native CRS, the
                   thiswillcompress.py:54-61 variant, rounded to 2 dp).
    with_cells   : also emit the frozen cell id at these resolutions.
    chunk_rows   : max rows per yielded output block.
    master_widths: {src: master raster width} for the flat pixel index
                   ``pix = global_row * width + global_col``; computed
                   driver-side from tile metadata (tiny) so ``pix`` is
                   identical under any partitioning of the tiles.
    validity     : fuse the NoData filter into the pivot (same strategy
                   names as stages.transform.ValidityFilter, applied to
                   the ROUNDED z exactly like the separate stage) --
                   invalid pixels are dropped before the cell encode and
                   never materialize, cutting the exploded table's
                   memory traffic instead of re-reading it in a second
                   stage.
    emit         : subset of the base point columns ("lon","lat","z",
                   "band","src","pix","nodata") to materialize (cells
                   always emitted).  Skipping pix/nodata/src on
                   pipelines that never read them halves the bytes per
                   point row.
    """

    _BASE_COLS = ("lon", "lat", "z", "band", "src", "pix", "nodata")

    def __init__(
        self,
        round_output: bool = True,
        reproject: bool = True,
        with_cells: tuple[int, ...] = (),
        chunk_rows: int = DEFAULT_CHUNK_ROWS,
        master_widths: dict[str, int] | None = None,
        validity: str | None = None,
        emit: tuple[str, ...] | None = None,
    ):
        self.round_output = round_output
        self.reproject = reproject
        self.with_cells = tuple(with_cells)
        self.chunk_rows = chunk_rows
        self.master_widths = master_widths or {}
        self.validity = validity
        if emit is not None:
            bad = set(emit) - set(self._BASE_COLS)
            if bad:
                raise ValueError(f"unknown emit columns: {sorted(bad)}")
            emit = tuple(c for c in self._BASE_COLS if c in emit)
        self.emit = emit if emit is not None else self._BASE_COLS
        self._transformers: dict[str, _crs.Transformer] = {}

    def _transformer(self, crs: str) -> _crs.Transformer:
        t = self._transformers.get(crs)
        if t is None:
            t = _crs.Transformer(crs, "EPSG:4326")
            self._transformers[crs] = t
        return t

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        emit = self.emit
        out_cols: dict[str, list[np.ndarray]] = {
            k: []
            for k in ("lon", "lat", "z", "band", "pix", "nodata")
            if k in emit
        }
        # src is constant per tile: accumulate (value, count) pairs and
        # build a dictionary-encoded array at flush (14x faster than
        # np.full(object) + pa.array of the exploded strings)
        src_runs: list[tuple[str, int]] = []
        cell_cols: dict[int, list[np.ndarray]] = {r: [] for r in self.with_cells}
        pending = 0
        yielded = False

        srcs = batch["src"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        row_offs = batch["row_off"].to_numpy(zero_copy_only=False)
        col_offs = batch["col_off"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        widths = batch["width"].to_numpy(zero_copy_only=False)
        transforms = batch["transform"].to_pylist()
        crss = batch["crs"].to_pylist()
        nodatas = batch["nodata"].to_numpy(zero_copy_only=False)
        values_col = batch["values"]

        def flush() -> pa.Table:
            nonlocal pending
            tbl_cols: dict = {}
            for k in ("lon", "lat", "z"):
                if k in out_cols:
                    tbl_cols[k] = np.concatenate(out_cols[k])
            if "band" in out_cols:
                tbl_cols["band"] = pa.array(
                    np.concatenate(out_cols["band"]), type=pa.int32()
                )
            if "src" in emit:
                uniq: dict[str, int] = {}
                codes = [
                    np.full(n_, uniq.setdefault(s_, len(uniq)), np.int32)
                    for s_, n_ in src_runs
                ]
                tbl_cols["src"] = pa.DictionaryArray.from_arrays(
                    pa.array(np.concatenate(codes)), pa.array(list(uniq))
                ).cast(pa.string())
            for k in ("pix", "nodata"):
                if k in out_cols:
                    tbl_cols[k] = np.concatenate(out_cols[k])
            for r in self.with_cells:
                tbl_cols[f"cell_{r}"] = np.concatenate(cell_cols[r])
            for k in out_cols:
                out_cols[k].clear()
            src_runs.clear()
            for r in self.with_cells:
                cell_cols[r].clear()
            pending = 0
            return pa.table(tbl_cols)

        for i in range(batch.num_rows):
            h, w = int(heights[i]), int(widths[i])
            ta, tb, tc, td, te, tf = (float(t) for t in transforms[i])
            z = np.asarray(
                values_col[i].values.to_numpy(zero_copy_only=False),
                dtype=np.float32,
            )
            if tb == 0.0 and td == 0.0:
                # axis-aligned (north-up) tile: world x varies only by
                # column, y only by row -> separable grid reprojection
                # (crs.Transformer.transform_grid), O(h+w) instead of
                # O(h*w) transcendentals for UTM/web-mercator sources.
                row_1d = np.arange(h, dtype=np.float64) + float(row_offs[i])
                col_1d = np.arange(w, dtype=np.float64) + float(col_offs[i])
                # value- and sign-identical to the pointwise path's
                # `c + a*col_c + b*row_c` with b == 0 (the `+ 0.0`
                # mirrors its `+ 0.0*row_c` term, normalizing -0.0),
                # then the same float32 cast (completePixleOutput.py:50-52)
                x_col = ((tc + ta * (col_1d + 0.5)) + 0.0).astype(
                    np.float32).astype(np.float64)
                y_row = ((tf + te * (row_1d + 0.5)) + 0.0).astype(
                    np.float32).astype(np.float64)
                g_rows = np.broadcast_to(row_1d[:, None], (h, w)).ravel()
                g_cols = np.broadcast_to(col_1d[None, :], (h, w)).ravel()
                if self.reproject:
                    lon, lat = self._transformer(crss[i]).transform_grid(
                        x_col, y_row
                    )
                else:
                    lon = np.broadcast_to(x_col[None, :], (h, w)).ravel().copy()
                    lat = np.broadcast_to(y_row[:, None], (h, w)).ravel().copy()
            else:
                rows, cols = np.meshgrid(
                    np.arange(h, dtype=np.float64),
                    np.arange(w, dtype=np.float64),
                    indexing="ij",
                )
                g_rows = rows.ravel() + float(row_offs[i])
                g_cols = cols.ravel() + float(col_offs[i])
                x, y = _affine.pixel_to_world(transforms[i], g_rows, g_cols)
                # float32 cast mirrors completePixleOutput.py:50-52 exactly
                x = x.astype(np.float32)
                y = y.astype(np.float32)
                if self.reproject:
                    lon, lat = self._transformer(crss[i]).transform(
                        x.astype(np.float64), y.astype(np.float64)
                    )
                else:
                    lon, lat = x.astype(np.float64), y.astype(np.float64)
            zf = z.astype(np.float64)
            if self.round_output:
                if self.reproject:
                    lon = np.round(lon, 6)  # completePixleOutput.py:66
                    lat = np.round(lat, 6)
                else:
                    lon = np.round(lon, 2)  # thiswillcompress.py:59-60
                    lat = np.round(lat, 2)
                zf = np.round(zf, 2)  # :68
            if self.validity is not None:
                # fused NoData filter: same mask, same post-rounding z,
                # as the separate ValidityFilter stage -- but invalid
                # rows never materialize in the output block
                from .transform import validity_mask

                m = validity_mask(zf, self.validity, float(nodatas[i]))
                if not m.all():
                    lon, lat, zf = lon[m], lat[m], zf[m]
                    g_rows, g_cols = g_rows[m], g_cols[m]
            n_out = len(zf)
            if "pix" in emit:
                # flat pixel index in the source raster (row-major
                # flatten order, the sampling key, doesSamples.py:84)
                master_w = self.master_widths.get(
                    srcs[i], int(col_offs[i]) + w
                )
                out_cols["pix"].append(
                    g_rows.astype(np.int64) * master_w
                    + g_cols.astype(np.int64)
                )

            if "lon" in out_cols:
                out_cols["lon"].append(lon)
            if "lat" in out_cols:
                out_cols["lat"].append(lat)
            if "z" in out_cols:
                out_cols["z"].append(zf)
            if "band" in out_cols:
                out_cols["band"].append(np.full(n_out, bands[i], np.int32))
            src_runs.append((srcs[i], n_out))
            if "nodata" in out_cols:
                out_cols["nodata"].append(np.full(n_out, float(nodatas[i])))
            if self.with_cells:
                # one floor/clip pass at the finest resolution; coarser
                # ids are exact bit-shift parents (floor((x)/2^k) of the
                # clipped index == the directly-computed coarse index,
                # pinned by test_parent_matches_direct)
                finest = max(self.with_cells)
                base = _cells.cell_of(lon, lat, finest)
                for r in self.with_cells:
                    if r == finest:
                        cell_cols[r].append(base)
                    else:
                        sh = np.int64(finest - r)
                        iy = (base >> np.int64(28)) & np.int64((1 << 28) - 1)
                        ix = base & np.int64((1 << 28) - 1)
                        cell_cols[r].append(
                            (np.int64(r) << np.int64(56))
                            | ((iy >> sh) << np.int64(28))
                            | (ix >> sh)
                        )
            pending += n_out
            if pending >= self.chunk_rows:
                yielded = True
                yield flush()
        if pending:
            yield flush()
        elif not yielded:
            # keep the output schema stable for empty input blocks and
            # for batches the fused validity filter emptied entirely
            yield self._empty_table()

    def _empty_table(self) -> pa.Table:
        types = {
            "lon": pa.float64(), "lat": pa.float64(), "z": pa.float64(),
            "band": pa.int32(), "src": pa.string(),
            "pix": pa.int64(), "nodata": pa.float64(),
        }
        cols: dict = {k: pa.array([], types[k]) for k in self.emit}
        for r in self.with_cells:
            cols[f"cell_{r}"] = pa.array([], pa.int64())
        return pa.table(cols)


def master_widths_of(tiles_meta: pa.Table) -> dict[str, int]:
    """Driver-side tiny aggregate: {src: max(col_off + width)} -- the
    master raster width feeding TilePivot's flat pixel index."""
    import pyarrow.compute as pc

    t = tiles_meta.select(["src", "col_off", "width"])
    ends = pc.add(t["col_off"], t["width"])
    t = t.set_column(1, "end", ends).group_by("src").aggregate([("end", "max")])
    return dict(zip(t["src"].to_pylist(), t["end_max"].to_pylist()))


class PageExtract:
    """Pages stage (T14): html -> (text_extracted, lat, lon, has_geo).

    Stateless and deterministic; regexes are compiled at module import
    (once per worker process).  ``check_invariant`` raises if the
    extracted text differs from the stored golden ``text`` column --
    the BASELINE.json per-row invariant, enforced in-pipeline.
    """

    def __init__(self, check_invariant: bool = False):
        self.check_invariant = check_invariant

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        html_col = batch["html"]
        if pa.types.is_binary(html_col.type) or pa.types.is_large_binary(
            html_col.type
        ):
            try:
                # C-level utf-8 validation + decode in one pass
                html_col = pc.cast(html_col, pa.string())
            except pa.ArrowInvalid:
                # invalid utf-8 somewhere: per-row lossy decode
                html_col = pa.array(
                    [
                        h.decode("utf-8", errors="replace")
                        for h in html_col.to_pylist()
                    ]
                )
        text_arr = _text.extract_text_batch(html_col)
        if self.check_invariant and "text" in batch.column_names:
            # vectorized compare; the Python loop runs only on failure
            # to name the offending url
            eq = pc.equal(text_arr, batch["text"].combine_chunks())
            if not bool(pc.min(eq).as_py() or False) or eq.null_count:
                golden = batch["text"].to_pylist()
                for u, t, g in zip(
                    batch["url"].to_pylist(), text_arr.to_pylist(), golden
                ):
                    if t != g:
                        raise ValueError(
                            f"extract_text invariant violated for url={u!r}"
                        )
        # one RE2 scan for the geo spans instead of per-row re.search
        lat, lon, has = _text.extract_geo_batch(html_col)
        out = batch.drop_columns(["html"])
        out = out.append_column("text_extracted", text_arr)
        out = out.append_column("lat", pa.array(lat))
        out = out.append_column("lon", pa.array(lon))
        out = out.append_column("has_geo", pa.array(has))
        return out


def add_cells(batch: pa.Table, resolutions: tuple[int, ...] = (7, 8, 9),
              lon_col: str = "lon", lat_col: str = "lat",
              scheme: str = "frozen") -> pa.Table:
    """Append cell ids at the given resolutions (geocode stage).

    ``scheme='frozen'`` (default) is the SQL-expressible flat grid the
    oracles replay (functions/cells.py); ``scheme='s2'`` emits TRUE
    spherical S2 cell ids (functions/s2.py) as ``s2_{level}`` columns
    for geodesic locality partitioning."""
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    ok = np.isfinite(lon) & np.isfinite(lat)
    if scheme == "frozen":
        fn, prefix = _cells.cell_of, "cell"
    elif scheme == "s2":
        from ..functions.s2 import s2_cell_of

        fn, prefix = s2_cell_of, "s2"
    else:
        raise ValueError(f"unknown cell scheme: {scheme}")
    for r in resolutions:
        c = np.full(len(lon), -1, dtype=np.int64)
        if ok.any():
            c[ok] = fn(lon[ok], lat[ok], r)
        batch = batch.append_column(f"{prefix}_{r}", pa.array(c))
    return batch


class FusedExtractCount:
    """Fully fused extract -> per-point transforms -> count-by-key stage.

    The headline job's unfused form runs three map_batches stages
    (pivot, PIP join, partial count), shipping the exploded point table
    through the object store twice (~32 bytes/pixel each way) to
    produce a final count table of a few thousand rows.  This stage
    consumes the pivot's chunk generator IN-CORE: each chunk flows
    through the per-point transforms (e.g. a PIPJoiner) and collapses
    to a (keys, count) partial immediately, so a block's output is the
    partial count table -- object-store traffic drops from O(pixels) to
    O(distinct keys), which is the pushed-down-aggregation shape a
    100 TB scan wants.  Equivalence with the unfused pipeline is pinned
    by TestFusedExtractCount.

    Parameters
    ----------
    pivot      : a TilePivot (or any generator-of-tables callable).
    transforms : per-chunk table->table callables applied in order.
    keys       : count-by columns of the transformed chunks.
    """

    def __init__(self, pivot, transforms, keys: list[str]):
        self.pivot = pivot
        self.transforms = list(transforms)
        self.keys = list(keys)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = self.keys
        parts: list[pa.Table] = []
        for chunk in self.pivot(batch):
            for fn in self.transforms:
                chunk = fn(chunk)
            if chunk.num_rows == 0:
                continue
            part = (
                chunk.select(keys)
                .append_column(
                    "_one", pa.array(np.ones(chunk.num_rows, np.int64))
                )
                .group_by(keys)
                .aggregate([("_one", "sum")])
            )
            parts.append(part.rename_columns(keys + ["count"]))
        if not parts:
            sch = pa.schema(
                [(k, pa.int64()) for k in keys] + [("count", pa.int64())]
            )
            return sch.empty_table()
        allp = pa.concat_tables(parts)
        out = allp.group_by(keys).aggregate([("count", "sum")])
        return out.rename_columns(keys + ["count"])
