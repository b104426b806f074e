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


def test_sink_format_bytes_frozen(tmp_path):
    """Output formats are part of the parity contract: the GeoJSON and
    CSV writers must keep producing byte-identical files for a fixed
    input (reference formats, completePixleOutput.py:94-128 /
    doesSamples.py:95-103)."""
    import pyarrow as pa

    from tiff_to_geojson_csv_json_format_converter_ray.sinks import (
        CSVSink, GeoJSONSink,
    )

    t = pa.table(
        {
            "lon": pa.array([77.123456, 77.2, 78.000001]),
            "lat": pa.array([28.5, 28.654321, 27.0]),
            "z": pa.array([12.34, -5.0, 100.0]),
            "src": pa.array(["golden"] * 3),
        }
    )
    g = GeoJSONSink(str(tmp_path))(t)
    c = CSVSink(str(tmp_path), wgs84=True)(t)
    gdir = Path(__file__).parent / "goldens"
    got_g = open(g["output_path"][0].as_py()).read()
    got_c = open(c["output_path"][0].as_py()).read()
    assert got_g == (gdir / "golden.geojson").read_text()
    assert got_c == (gdir / "golden.csv").read_text()


def test_cell_size_constants_frozen():
    # the spec constants themselves
    assert cells.cell_size(7) == 360.0 / 2**15
    assert cells.cell_size(9) == 360.0 / 2**17
    c = cells.cell_of(np.array([77.2]), np.array([28.6]), 8)
    res, iy, ix = cells.unpack(c)
    assert int(res[0]) == 8
    assert int(c[0]) == (8 << 56) | (int(iy[0]) << 28) | int(ix[0])
