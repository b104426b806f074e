"""Distributed 2-D prefix scan (stages/scan.py::grid_sat) vs the
numpy double-cumsum ground truth: random sparse grids (duplicates and
anchor collisions included), several tile sides, empty input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.stages.scan import grid_sat


def _run(r, c, x, grid, side, ray_session):
    import ray.data

    cells = ray.data.from_arrow(
        pa.table(
            {
                "r": pa.array(r, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "x": pa.array(x, pa.int64()),
            }
        )
    )
    out = grid_sat(cells, grid=grid, side=side).take_all()
    dense = np.zeros((grid, grid), np.int64)
    np.add.at(dense, (np.asarray(r), np.asarray(c)), np.asarray(x))
    sat = dense.cumsum(axis=0).cumsum(axis=1)
    assert len(out) == grid * grid
    for row in out:
        assert sat[row["r"], row["c"]] == row["sat"], (
            row["r"], row["c"],
        )


@pytest.mark.parametrize("grid,side", [(32, 8), (48, 16)])
def test_grid_sat_random(grid, side, ray_session):
    rng = np.random.RandomState(11)
    n = 500
    _run(
        rng.randint(0, grid, n),
        rng.randint(0, grid, n),
        rng.randint(-3, 10, n),  # negative values allowed
        grid, side, ray_session,
    )


def test_grid_sat_anchor_collision(ray_session):
    # real cells exactly at every tile's anchor coordinate (0,0 of
    # each tile) must not be clobbered by the zero anchors
    grid, side = 32, 8
    coords = [
        (tr * side, tc * side)
        for tr in range(grid // side)
        for tc in range(grid // side)
    ]
    r = [p[0] for p in coords]
    c = [p[1] for p in coords]
    x = [7] * len(coords)
    _run(r, c, x, grid, side, ray_session)


def test_grid_sat_empty(ray_session):
    import ray.data

    cells = ray.data.from_arrow(
        pa.table(
            {
                "r": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
            }
        )
    )
    out = grid_sat(cells, grid=16, side=8).take_all()
    assert len(out) == 256
    assert all(row["sat"] == 0 for row in out)
