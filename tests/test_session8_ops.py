"""Property tests for the session-8 operators: the distributed /
halo-anchored counting shapes are checked against brute-force
reimplementations on the sf0.001 fixtures, independent of the SQL
oracles (which mirror the quantized formulas but not the pairing
logic)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


def test_boruvka_equals_brute_kruskal(entry_mod):
    """The distributed Boruvka rounds must produce the unique MST --
    checked against a plain union-find Kruskal on the same edges."""
    got = entry_mod.queries()["boruvka_mst"](SF)
    eid = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
        ["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    cell = (eid % 96) // 8 * 12 + ((eid // 96) % 96) // 8
    counts = np.zeros(144, np.int64)
    np.add.at(counts, cell, 1)
    edges = []
    for i in range(144):
        if i // 12 < 11:
            j = i + 12
            edges.append((abs(int(counts[i] - counts[j])) * (1 << 20)
                          + i * 144 + j, i, j))
        if i % 12 < 11:
            j = i + 1
            edges.append((abs(int(counts[i] - counts[j])) * (1 << 20)
                          + i * 144 + j, i, j))
    parent = list(range(144))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0
    n_edges = 0
    for w, u, v in sorted(edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            n_edges += 1
    assert got["n_edges"][0].as_py() == n_edges == 143
    assert got["total_weight"][0].as_py() == total


def test_hexbin_centers_contain_points(entry_mod):
    """Every lattice point must round to a hex whose center is within
    the circumradius (size s): the cube-rounding invariant."""
    S = 4.0
    SQ3 = float(np.sqrt(3.0))
    eid = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
        ["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    x = (eid % 96).astype(np.float64)
    y = ((eid // 96) % 96).astype(np.float64)
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_half_away,
    )

    q = (SQ3 / 3.0 * x - 1.0 / 3.0 * y) / S
    r = (2.0 / 3.0 * y) / S
    xq, zq = q, r
    yq = -xq - zq
    rx, ry, rz = round_half_away(xq), round_half_away(yq), round_half_away(zq)
    dx, dy, dz = np.abs(rx - xq), np.abs(ry - yq), np.abs(rz - zq)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(fix_z, -rx - ry, rz)
    # center back to cartesian (pointy-top): x = s*sqrt3*(q + r/2),
    # y = s*3/2*r
    cxp = S * SQ3 * (rx + rz / 2.0)
    cyp = S * 1.5 * rz
    d = np.hypot(x - cxp, y - cyp)
    assert float(d.max()) <= S * 1.0000001


def test_knox_counts_match_brute_pairs(entry_mod):
    """The anchored-halo pair counting (space cells + hour windows)
    must equal brute-force subset pair counts."""
    got = entry_mod.queries()["knox_test"](SF)
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t["ts"].cast("int64").to_numpy(zero_copy_only=False)
    keep = eid % 20 == 0
    eid, ts = eid[keep], ts[keep]
    gx, gy = eid % 96, (eid // 96) % 96
    n = len(eid)
    d2 = (
        (gx[:, None] - gx[None, :]) ** 2 + (gy[:, None] - gy[None, :]) ** 2
    )
    tc = np.abs(ts[:, None] - ts[None, :]) <= 3_600_000_000
    iu = np.triu_indices(n, 1)
    ns = int((d2[iu] <= 25).sum())
    nt = int(tc[iu].sum())
    nst = int(((d2[iu] <= 25) & tc[iu]).sum())
    assert got["n_points"][0].as_py() == n
    assert got["ns"][0].as_py() == ns
    assert got["nt"][0].as_py() == nt
    assert got["nst"][0].as_py() == nst


def test_cross_k_matches_brute(entry_mod):
    """Cross-K halo counting == brute ordered pairs on the subset."""
    got = entry_mod.queries()["cross_k"](SF)
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "event_type"]
    )
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = t["event_type"].to_numpy(zero_copy_only=False)
    keep = (eid % 5 == 0) & ((et == "purchase") | (et == "error"))
    eid, et = eid[keep], et[keep]
    gx, gy = eid % 96, (eid // 96) % 96
    a = et == "purchase"
    b = et == "error"
    d2 = (
        (gx[a][:, None] - gx[b][None, :]) ** 2
        + (gy[a][:, None] - gy[b][None, :]) ** 2
    )
    for i, r2 in enumerate([4, 25, 64]):
        assert got["n_pairs"][i].as_py() == int((d2 <= r2).sum())
