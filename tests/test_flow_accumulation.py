"""stages/raster.py::flow_accumulation: the two-level TauDEM-style
operator must equal the independent global sequential Kahn reference,
under block sizes that force heavy boundary crossing and under
repartitioning."""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")


def _tiles_from_grid(z: np.ndarray, tile: int, nodata: float = -3.4e38):
    """Split a (H, W) float grid into a tile table matching the engine
    schema (single band, identity-ish transform)."""
    h, w = z.shape
    ids, srcs, bands, ro, co, hs, ws, tr, crs, nd, vals = (
        [] for _ in range(11)
    )
    for r0 in range(0, h, tile):
        for c0 in range(0, w, tile):
            ids.append(f"t_{r0}_{c0}")
            srcs.append("synthetic")
            bands.append(1)
            ro.append(r0)
            co.append(c0)
            hs.append(min(tile, h - r0))
            ws.append(min(tile, w - c0))
            tr.append([0.01, 0.0, 77.0, 0.0, -0.01, 29.0])
            crs.append("EPSG:4326")
            nd.append(nodata)
            vals.append(
                z[r0 : r0 + tile, c0 : c0 + tile].astype(np.float32).ravel()
            )
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
            "values": pa.array(
                [v.tolist() for v in vals], pa.list_(pa.float32())
            ),
        }
    )


@pytest.fixture(scope="module")
def rugged_grid():
    # deterministic rugged surface with long drainage paths + nodata
    rr, cc = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    z = (
        100.0
        + 0.5 * rr
        + 3.0 * np.sin(cc / 5.0)
        + 2.0 * np.cos(rr / 7.0)
        + ((rr * 5 + cc * 3) % 13) * 0.1
    )
    z = z.astype(np.float64)
    z[(rr * 7 + cc * 11) % 97 == 0] = -3.4e38  # sparse nodata holes
    return z


def _run(ray_session, z, tile, block, stride=None, **kw):
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        flow_accumulation,
    )

    tiles = ray.data.from_arrow(_tiles_from_grid(z, tile))
    out = flow_accumulation(tiles, block=block, stride=stride, **kw)
    return {
        (r, c): a
        for r, c, a in zip(
            out["row"].to_pylist(), out["col"].to_pylist(),
            out["acc"].to_pylist(),
        )
    }


def _reference(ray_session, z, tile, stride=None):
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        flow_accumulation_reference, tile_flow_direction,
    )

    fd = collect_tables(
        tile_flow_direction(
            ray.data.from_arrow(_tiles_from_grid(z, tile)), stride=stride
        )
    )
    return flow_accumulation_reference(fd)


def test_matches_sequential_reference(ray_session, rugged_grid):
    want = _reference(ray_session, rugged_grid, tile=16)
    got = _run(ray_session, rugged_grid, tile=16, block=16)
    assert got == want
    assert max(want.values()) > 10  # real drainage paths exist


def test_small_blocks_heavy_crossing(ray_session, rugged_grid):
    want = _reference(ray_session, rugged_grid, tile=16)
    got = _run(ray_session, rugged_grid, tile=16, block=8)
    assert got == want


def test_block_not_aligned_with_tiles(ray_session, rugged_grid):
    want = _reference(ray_session, rugged_grid, tile=16)
    got = _run(ray_session, rugged_grid, tile=24, block=10, stride=24)
    assert got == want


def test_ragged_tiling_halo_stride(ray_session, rugged_grid):
    """64 = 24 + 24 + 16: the ragged tiling must produce the identical
    flow-direction node set as the uniform one when the grid stride is
    given (the up/left halo addressing bug this parameter fixes)."""
    want = _reference(ray_session, rugged_grid, tile=16)
    ragged = _reference(ray_session, rugged_grid, tile=24, stride=24)
    assert ragged == want


def test_watershed_matches_reference(ray_session, rugged_grid):
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_flow_direction, watershed_labels, watershed_reference,
    )

    tiles = ray.data.from_arrow(_tiles_from_grid(rugged_grid, 16))
    fd = collect_tables(tile_flow_direction(tiles))
    want = watershed_reference(fd)
    out = watershed_labels(
        ray.data.from_arrow(_tiles_from_grid(rugged_grid, 16)), block=8
    )
    got = {
        (r, c): (a, b)
        for r, c, a, b in zip(
            out["row"].to_pylist(), out["col"].to_pylist(),
            out["sink_row"].to_pylist(), out["sink_col"].to_pylist(),
        )
    }
    assert got == want
    # watersheds are non-trivial: multiple distinct pour points
    assert len(set(want.values())) > 5


def test_distributed_forest_tier_matches(ray_session, rugged_grid):
    """VERDICT r3 item 4: the second recursion level (super-block
    grouped shuffle + port-forest driver solve + shuffled replay) gives
    bit-identical accumulation to the driver walk and the global
    sequential Kahn reference."""
    want = _reference(ray_session, rugged_grid, tile=16)
    got = _run(
        ray_session, rugged_grid, tile=16, block=8,
        forest_tier="distributed", super_factor=2,
    )
    assert got == want


def test_distributed_tier_tiling_invariance(ray_session):
    """A grid with long cross-super drainage (256x256 monotone ramp +
    meanders, entries far above a toy driver walk) -- distributed tier
    at several (block, super_factor) tilings, plus auto routing forced
    distributed by a tiny threshold, all equal the driver tier."""
    rr, cc = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    z = (
        200.0 + 0.3 * rr + 4.0 * np.sin(cc / 9.0)
        + 2.0 * np.cos(rr / 11.0) + ((rr * 3 + cc * 7) % 17) * 0.05
    )
    z[(rr * 13 + cc * 5) % 211 == 0] = -3.4e38
    base = _run(ray_session, z, tile=32, block=16, forest_tier="driver")
    for blk, sf in ((16, 4), (8, 8), (32, 2)):
        got = _run(
            ray_session, z, tile=32, block=blk,
            forest_tier="distributed", super_factor=sf,
        )
        assert got == base, (blk, sf)
    # auto tier routes to distributed above the entry threshold
    auto = _run(
        ray_session, z, tile=32, block=16,
        forest_tier="auto", max_driver_entries=10,
    )
    assert auto == base


def test_watershed_distributed_tier(ray_session, rugged_grid):
    """Watershed second recursion level: forced distributed tier equals
    the driver tier and the sequential reference, across tilings."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        tile_flow_direction, watershed_labels, watershed_reference,
    )

    tiles = ray.data.from_arrow(_tiles_from_grid(rugged_grid, 16))
    fd = collect_tables(tile_flow_direction(tiles))
    want = watershed_reference(fd)

    def run(**kw):
        out = watershed_labels(
            ray.data.from_arrow(_tiles_from_grid(rugged_grid, 16)), **kw
        )
        return {
            (r, c): (a, b)
            for r, c, a, b in zip(
                out["row"].to_pylist(), out["col"].to_pylist(),
                out["sink_row"].to_pylist(), out["sink_col"].to_pylist(),
            )
        }

    for blk, sf in ((8, 2), (8, 4), (16, 2)):
        got = run(block=blk, forest_tier="distributed", super_factor=sf)
        assert got == want, (blk, sf)
    # auto routes distributed above the threshold
    got = run(block=8, forest_tier="auto", max_driver_entries=10)
    assert got == want


def test_flow_deep_recursion_tier(ray_session):
    """VERDICT r4 item 4: with the driver threshold far below the
    super-forest size, the port forest recurses through
    _forest_totals_tiered (sb -> sb*factor -> ...) until one group
    spans the grid -- results bit-identical to the driver walk on a
    256x256 grid whose super-forest far exceeds the threshold."""
    rr, cc = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    z = (
        200.0 + 0.3 * rr + 4.0 * np.sin(cc / 9.0)
        + 2.0 * np.cos(rr / 11.0) + ((rr * 3 + cc * 7) % 17) * 0.05
    )
    z[(rr * 13 + cc * 5) % 211 == 0] = -3.4e38
    base = _run(ray_session, z, tile=32, block=16, forest_tier="driver")
    for blk, sf in ((8, 2), (16, 2)):
        got = _run(
            ray_session, z, tile=32, block=blk,
            forest_tier="distributed", super_factor=sf,
            max_driver_entries=10,
        )
        assert got == base, (blk, sf)


def test_watershed_deep_recursion_tier(ray_session):
    """Watershed mirror of the deep-recursion test: the port SINK
    forest recurses (resolve_needs_tiered) until it fits the tiny
    threshold; labels equal the driver tier."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        watershed_labels,
    )

    rr, cc = np.meshgrid(np.arange(128), np.arange(128), indexing="ij")
    z = (
        150.0 + 0.4 * rr + 3.0 * np.sin(cc / 8.0)
        + 1.5 * np.cos(rr / 10.0) + ((rr * 5 + cc * 11) % 19) * 0.07
    )
    z[(rr * 17 + cc * 3) % 157 == 0] = -3.4e38

    def run(**kw):
        out = watershed_labels(
            ray.data.from_arrow(_tiles_from_grid(z, 32)), **kw
        )
        return {
            (r, c): (a, b)
            for r, c, a, b in zip(
                out["row"].to_pylist(), out["col"].to_pylist(),
                out["sink_row"].to_pylist(), out["sink_col"].to_pylist(),
            )
        }

    base = run(block=16, forest_tier="driver")
    for blk, sf in ((8, 2), (16, 2)):
        got = run(
            block=blk, forest_tier="distributed", super_factor=sf,
            max_driver_entries=10,
        )
        assert got == base, (blk, sf)


def test_uncached_d8_lineage(ray_session, rugged_grid):
    """cache_d8=False (no mid-pipeline materialize of the node table;
    consumers re-execute the halo-exchange lineage) is result-identical
    on both operators and both tiers."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        flow_accumulation, watershed_labels,
    )

    want = _run(ray_session, rugged_grid, tile=16, block=8)
    got = _run(
        ray_session, rugged_grid, tile=16, block=8, cache_d8=False,
        forest_tier="distributed", super_factor=2,
    )
    assert got == want
    a = watershed_labels(
        ray.data.from_arrow(_tiles_from_grid(rugged_grid, 16)), block=8
    )
    b = watershed_labels(
        ray.data.from_arrow(_tiles_from_grid(rugged_grid, 16)), block=8,
        cache_d8=False,
    )
    assert a.equals(b)


def test_watershed_distributed_large_grid(ray_session):
    """Watershed distributed tier on the 256x256 long-drainage grid
    (cross-super chains well above the toy driver walk), two
    (block, super_factor) tilings vs the driver tier."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        watershed_labels,
    )

    rr, cc = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    z = (
        200.0 + 0.3 * rr + 4.0 * np.sin(cc / 9.0)
        + 2.0 * np.cos(rr / 11.0) + ((rr * 3 + cc * 7) % 17) * 0.05
    )
    z[(rr * 13 + cc * 5) % 211 == 0] = -3.4e38

    def run(**kw):
        return watershed_labels(
            ray.data.from_arrow(_tiles_from_grid(z, 32)), **kw
        )

    base = run(block=16, forest_tier="driver")
    for blk, sf in ((16, 4), (32, 2)):
        got = run(block=blk, forest_tier="distributed", super_factor=sf)
        assert got.equals(base), (blk, sf)


def test_distributed_tier_random_terrains(ray_session):
    """Property sweep: random rugged terrains (varying nodata density,
    block/super_factor draws) -- the distributed forest tier must
    equal the global sequential Kahn on every draw."""
    rng = np.random.RandomState(123)
    for trial in range(4):
        h = w = int(rng.choice([40, 48, 64]))
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        z = (
            100.0
            + rng.uniform(0.1, 0.8) * rr
            + rng.uniform(1, 5) * np.sin(cc / rng.uniform(3, 12))
            + rng.uniform(1, 4) * np.cos(rr / rng.uniform(3, 12))
            + ((rr * rng.randint(2, 9) + cc * rng.randint(2, 9)) % 13)
            * 0.1
        )
        z[rng.rand(h, w) < rng.uniform(0.0, 0.15)] = -3.4e38
        tile = int(rng.choice([16, 24]))
        blk = int(rng.choice([8, 16]))
        sf = int(rng.choice([2, 4]))
        want = _reference(ray_session, z, tile=tile, stride=tile)
        got = _run(
            ray_session, z, tile=tile, block=blk, stride=tile,
            forest_tier="distributed", super_factor=sf,
        )
        assert got == want, (trial, h, tile, blk, sf)
        # every other draw: force the recursive port-forest tier too
        # (VERDICT r4 item 4) -- the tiny threshold sends the port
        # forest through _forest_totals_tiered on the same terrain
        if trial % 2 == 0:
            deep = _run(
                ray_session, z, tile=tile, block=blk, stride=tile,
                forest_tier="distributed", super_factor=sf,
                max_driver_entries=5,
            )
            assert deep == want, ("deep", trial, h, tile, blk, sf)


def test_watershed_deep_tier_random_terrains(ray_session):
    """Watershed mirror of the random-terrain sweep with the RECURSIVE
    port-sink tier forced (resolve_needs_tiered, tiny threshold): the
    deep tier must equal the driver tier on every drawn terrain."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.raster import (
        watershed_labels,
    )

    rng = np.random.RandomState(321)
    for trial in range(3):
        h = w = int(rng.choice([48, 64]))
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        z = (
            100.0
            + rng.uniform(0.1, 0.8) * rr
            + rng.uniform(1, 5) * np.sin(cc / rng.uniform(3, 12))
            + rng.uniform(1, 4) * np.cos(rr / rng.uniform(3, 12))
        )
        z[rng.rand(h, w) < rng.uniform(0.0, 0.12)] = -3.4e38
        tile = int(rng.choice([16, 24]))
        blk = int(rng.choice([8, 16]))
        sf = int(rng.choice([2, 4]))

        def run(**kw):
            out = watershed_labels(
                ray.data.from_arrow(_tiles_from_grid(z, tile)),
                stride=tile, **kw,
            )
            return {
                (r, c): (a, b)
                for r, c, a, b in zip(
                    out["row"].to_pylist(), out["col"].to_pylist(),
                    out["sink_row"].to_pylist(),
                    out["sink_col"].to_pylist(),
                )
            }

        base = run(block=blk, forest_tier="driver")
        deep = run(
            block=blk, forest_tier="distributed", super_factor=sf,
            max_driver_entries=5,
        )
        assert deep == base, (trial, h, tile, blk, sf)
