"""Distributed 2-D prefix sums (summed-area table / integral image).

The classic two-phase distributed scan, here in Ray Data form:

1. **Local phase** (``groupby(tile).map_groups``): each tile of the
   grid computes its own in-tile SAT plus three tiny *descriptors* --
   the 16 full-width row sums, the 16 full-height column sums and the
   tile total.  Only the descriptors leave the tile (O(tile_side) per
   tile, not O(tile_area)).
2. **Offset phase** (driver, O(n_tiles) work): exclusive 2-D prefix
   over the tile totals gives each tile its *corner* offset; prefix
   sums of the row/column descriptors along each tile row/column band
   give the *strip* offsets.  The combined offset table is
   O(n_tiles * tile_side) -- tiny -- and is broadcast via ``ray.put``.
3. **Finalize phase** (``map_batches``): each tile adds
   ``corner + row_strip[r_local] + col_strip[c_local]`` to its local
   SAT.  All integer arithmetic; the result is bit-exact.

At 100 TB scale the tile grid is the partitioning unit: phase 1 and 3
stream tile-at-a-time with no all-to-all (the only cross-node traffic
is the descriptor table, O(sqrt(cells)) bytes), which is why SAT/scan
belongs in the engine rather than as a window query.

The SQL mirror is the double windowed cumsum (row-major cumsum, then
column-major over the row cumsums).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["grid_sat"]


def _local_phase(group: pa.Table) -> pa.Table:
    """One tile -> its local SAT cells + one descriptor row."""
    tr = int(group["tile_r"][0].as_py())
    tc = int(group["tile_c"][0].as_py())
    side = int(group["side"][0].as_py())
    rr = group["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    xx = group["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    tile = np.zeros((side, side), np.int64)
    # accumulate (not assign): the zero-count anchor row may coincide
    # with a real cell, and sparse inputs may carry duplicates
    np.add.at(tile, (rr - tr * side, cc - tc * side), xx)
    local_sat = tile.cumsum(axis=0).cumsum(axis=1)
    row_sums = tile.sum(axis=1)  # full-width row sums (len side)
    col_sums = tile.sum(axis=0)
    cells = pa.table(
        {
            "kind": pa.array(["cell"] * (side * side)),
            "tile_r": pa.array([tr] * (side * side), pa.int64()),
            "tile_c": pa.array([tc] * (side * side), pa.int64()),
            "r": pa.array(
                (np.repeat(np.arange(side), side) + tr * side).astype(
                    np.int64
                )
            ),
            "c": pa.array(
                (np.tile(np.arange(side), side) + tc * side).astype(
                    np.int64
                )
            ),
            "v": pa.array(local_sat.ravel()),
        }
    )
    desc = pa.table(
        {
            "kind": pa.array(["desc"]),
            "tile_r": pa.array([tr], pa.int64()),
            "tile_c": pa.array([tc], pa.int64()),
            "r": pa.array([-1], pa.int64()),
            "c": pa.array([-1], pa.int64()),
            "v": pa.array([0], pa.int64()),
        }
    )
    desc = desc.append_column(
        "row_sums", pa.array([row_sums.tolist()], pa.list_(pa.int64()))
    ).append_column(
        "col_sums", pa.array([col_sums.tolist()], pa.list_(pa.int64()))
    )
    cells = cells.append_column(
        "row_sums",
        pa.array([None] * (side * side), pa.list_(pa.int64())),
    ).append_column(
        "col_sums",
        pa.array([None] * (side * side), pa.list_(pa.int64())),
    )
    return pa.concat_tables([cells, desc])


def grid_sat(
    cells: ray.data.Dataset,
    grid: int = 96,
    side: int = 16,
) -> ray.data.Dataset:
    """Summed-area table of a sparse (r, c, x) integer cell Dataset
    over the dense ``grid x grid`` frame (absent cells count 0).

    Returns a Dataset of (r, c, sat) rows covering every cell.
    """
    import ray

    n_tiles = grid // side

    def keyed(batch: pa.Table) -> pa.Table:
        rr = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tile_r": pa.array(rr // side),
                "tile_c": pa.array(cc // side),
                "tile_key": pa.array(
                    (rr // side) * n_tiles + cc // side
                ),
                "side": pa.array(
                    np.full(len(rr), side, np.int64)
                ),
                "r": batch["r"],
                "c": batch["c"],
                "x": batch["x"],
            }
        )

    # guarantee every tile produces a group (dense frame): union one
    # zero-count anchor cell per tile
    anchors = pa.table(
        {
            "r": pa.array(
                [tr * side for tr in range(n_tiles) for _ in range(n_tiles)],
                pa.int64(),
            ),
            "c": pa.array(
                [tc * side for _ in range(n_tiles) for tc in range(n_tiles)],
                pa.int64(),
            ),
            "x": pa.array([0] * (n_tiles * n_tiles), pa.int64()),
        }
    )
    full = cells.union(ray.data.from_arrow(anchors))
    # materialized once: it is read twice (descriptor collect +
    # finalize) and is grid-bounded (cells + n_tiles descriptor rows),
    # never corpus-sized
    staged = full.map_batches(
        keyed, batch_format="pyarrow", batch_size=None
    ).groupby("tile_key").map_groups(
        _local_phase, batch_format="pyarrow"
    ).materialize()

    # offset phase: only the descriptor rows reach the driver --
    # O(n_tiles * side) integers
    desc = staged.filter(expr="kind == 'desc'").select_columns(
        ["tile_r", "tile_c", "row_sums", "col_sums"]
    ).take_all()
    row_d = {}
    col_d = {}
    for row in desc:
        row_d[(int(row["tile_r"]), int(row["tile_c"]))] = np.asarray(
            row["row_sums"], np.int64
        )
        col_d[(int(row["tile_r"]), int(row["tile_c"]))] = np.asarray(
            row["col_sums"], np.int64
        )
    totals = np.zeros((n_tiles, n_tiles), np.int64)
    for (tr, tc), rs in row_d.items():
        totals[tr, tc] = rs.sum()
    # exclusive 2-D prefix of tile totals = corner offset
    incl = totals.cumsum(axis=0).cumsum(axis=1)
    corner = np.zeros_like(incl)
    corner[1:, 1:] = incl[:-1, :-1]
    # strip offsets: row_strip[tr][tc][r_local] = sum over tiles left
    # in the same tile row of their row prefix sums (rows <= r_local)
    row_strip = np.zeros((n_tiles, n_tiles, side), np.int64)
    col_strip = np.zeros((n_tiles, n_tiles, side), np.int64)
    for tr in range(n_tiles):
        acc = np.zeros(side, np.int64)
        for tc in range(n_tiles):
            row_strip[tr, tc] = acc
            acc = acc + row_d[(tr, tc)].cumsum()
    for tc in range(n_tiles):
        acc = np.zeros(side, np.int64)
        for tr in range(n_tiles):
            col_strip[tr, tc] = acc
            acc = acc + col_d[(tr, tc)].cumsum()
    offsets_ref = ray.put((corner, row_strip, col_strip, side))

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["kind"], "cell"))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "r": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "sat": pa.array([], pa.int64()),
                }
            )
        crn, rstr, cstr, sd = ray.get(offsets_ref)
        tr = batch["tile_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = batch["tile_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        rl = rr - tr * sd
        cl = cc - tc * sd
        sat = vv + crn[tr, tc] + rstr[tr, tc, rl] + cstr[tr, tc, cl]
        return pa.table(
            {
                "r": pa.array(rr),
                "c": pa.array(cc),
                "sat": pa.array(sat),
            }
        )

    return staged.map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )
