"""Corpus analyzer pipeline -- Ray-Data re-expression of test.py
(SURVEY par.3.2): per-source metadata records + global aggregated
report, computed with partial/final aggregates instead of a sequential
file loop.

Per-source record fields pinned to test.py:83-95: dimensions,
total_pixels, valid_pixels, valid_percentage, bounds over VALID pixels
only (unrounded, test.py:56-77), has_valid_data, data_sparsity
('sparse' < 10% else 'dense', test.py:94).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import TilePivot, master_widths_of
from ..stages.stats import grouped_stats_and_minmax
from ..stages.transform import ValidityFilter
from .convert import read_tiles, tiles_metadata


def analyze(tiles_path: str) -> pa.Table:
    """-> one row per src: the reference's per-file metadata record."""
    meta = tiles_metadata(tiles_path)
    meta = meta.filter(pc.equal(meta["band"], 1))
    tiles = read_tiles(tiles_path, band=1)

    pivot = TilePivot(
        round_output=False,  # test.py computes bounds on unrounded coords
        reproject=True,
        master_widths=master_widths_of(meta),
    )
    pts = tiles.map_batches(pivot, batch_format="pyarrow", batch_size=None)
    valid = pts.map_batches(ValidityFilter("threshold"), batch_format="pyarrow", batch_size=None)

    # total pixels per src from tile geometry (tiny, driver-side)
    n = pc.multiply(meta["height"], meta["width"])
    totals = (
        meta.append_column("n", n).group_by("src").aggregate([("n", "sum")])
    )
    total_map = dict(
        zip(totals["src"].to_pylist(), totals["n_sum"].to_pylist())
    )
    dims = {}
    for r in meta.to_pylist():
        w = dims.setdefault(r["src"], [0, 0])
        w[0] = max(w[0], r["col_off"] + r["width"])
        w[1] = max(w[1], r["row_off"] + r["height"])

    # valid-pixel stats + bounds per src -- one distributed pass each
    combined = grouped_stats_and_minmax(valid, ["src"], "z", ["lon", "lat"])
    vb = {r["src"]: r for r in combined.to_pylist()}
    vs = vb

    rows = []
    for src in sorted(total_map):
        total = int(total_map[src])
        st = vs.get(src)
        valid_n = int(st["count"]) if st else 0
        pct = (valid_n / total) * 100.0 if total else 0.0
        b = vb.get(src)
        rows.append(
            {
                "src": src,
                "width": dims[src][0],
                "height": dims[src][1],
                "total_pixels": total,
                "valid_pixels": valid_n,
                "valid_percentage": pct,
                "has_valid_data": valid_n > 0,
                "data_sparsity": "sparse" if (valid_n / total) < 0.1 else "dense",
                "min_longitude": b["min_lon"] if b else None,
                "max_longitude": b["max_lon"] if b else None,
                "min_latitude": b["min_lat"] if b else None,
                "max_latitude": b["max_lat"] if b else None,
                "min_elevation": st["min"] if st and valid_n else None,
                "max_elevation": st["max"] if st and valid_n else None,
            }
        )
    return pa.Table.from_pylist(rows)


def master_report(analysis: pa.Table) -> str:
    """Human-readable master report (K8, test.py:366-515): counts,
    overall bounds over valid files, sparse/dense buckets."""
    rows = analysis.to_pylist()
    valid_rows = [r for r in rows if r["has_valid_data"]]
    lines = ["MASTER TIFF ANALYSIS", "=" * 50, ""]
    lines.append(f"Total files analyzed: {len(rows)}")
    lines.append(f"Files with valid data: {len(valid_rows)}")
    lines.append(f"Files with no valid data: {len(rows) - len(valid_rows)}")
    if valid_rows:
        lines.append("")
        lines.append("OVERALL COVERAGE (valid files):")
        lines.append(
            f"  Longitude: {min(r['min_longitude'] for r in valid_rows):.6f}"
            f" to {max(r['max_longitude'] for r in valid_rows):.6f}"
        )
        lines.append(
            f"  Latitude: {min(r['min_latitude'] for r in valid_rows):.6f}"
            f" to {max(r['max_latitude'] for r in valid_rows):.6f}"
        )
        lines.append(
            f"  Elevation: {min(r['min_elevation'] for r in valid_rows):.2f}"
            f" to {max(r['max_elevation'] for r in valid_rows):.2f}"
        )
    sparse = [r["src"] for r in rows if r["data_sparsity"] == "sparse"]
    dense = [r["src"] for r in rows if r["valid_percentage"] > 50.0]
    lines.append("")
    lines.append(f"Sparse files (<10% valid): {len(sparse)}")
    lines.append(f"Dense files (>50% valid): {len(dense)}")
    return "\n".join(lines)
