"""Golden-pinned frozen specs (FIXTURES.md F5): the cell-assignment
contract must NEVER change across releases -- tile assignments are part
of the correctness contract (BASELINE.json north_rule)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tiff_to_geojson_csv_json_format_converter_ray.functions import cells

GOLDEN = Path(__file__).parent / "goldens" / "cell_assignments.json"


def test_cell_assignments_frozen():
    g = json.loads(GOLDEN.read_text())
    pts = np.asarray(g["points"])
    lon, lat = pts[:, 0], pts[:, 1]
    for r in (7, 8, 9):
        got = cells.cell_of(lon, lat, r).tolist()
        assert got == g[f"res_{r}"], (
            f"FROZEN cell spec changed at res {r} -- this breaks the "
            "tile-assignment contract; revert the cells.py change"
        )


def test_cell_size_constants_frozen():
    # the spec constants themselves
    assert cells.cell_size(7) == 360.0 / 2**15
    assert cells.cell_size(9) == 360.0 / 2**17
    c = cells.cell_of(np.array([77.2]), np.array([28.6]), 8)
    res, iy, ix = cells.unpack(c)
    assert int(res[0]) == 8
    assert int(c[0]) == (8 << 56) | (int(iy[0]) << 28) | int(ix[0])
