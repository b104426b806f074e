"""Run metrics: rollups over the per-partition lineage manifest.

Each completed partition's manifest row already carries its counters
(rows_in, row_count, cell range, output path); this module aggregates
them into the run-level metrics the north rule asks to record."""

from __future__ import annotations


def manifest_metrics(manifest: dict[str, dict]) -> dict:
    """{partition_id: row} -> run totals + cell coverage."""
    rows_in = sum(r.get("rows_in", 0) or 0 for r in manifest.values())
    rows_out = sum(r.get("row_count", 0) or 0 for r in manifest.values())
    cell_mins = [r["cell_min"] for r in manifest.values() if r.get("cell_min") is not None]
    cell_maxs = [r["cell_max"] for r in manifest.values() if r.get("cell_max") is not None]
    return {
        "partitions": len(manifest),
        "rows_in": rows_in,
        "rows_out": rows_out,
        "selectivity": (rows_out / rows_in) if rows_in else None,
        "cell_min": min(cell_mins) if cell_mins else None,
        "cell_max": max(cell_maxs) if cell_maxs else None,
    }
