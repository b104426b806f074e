"""functions/cells.py::geohash_of: verified against an INDEPENDENT
textbook bisection implementation, the canonical published example
(ezs42), and the SQL expression mirror."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (  # noqa: E402
    geohash_of, geohash_sql_expr,
)

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Textbook binary-subdivision geohash (independent of the
    vectorized quantize+interleave form under test)."""
    lo1, hi1, lo2, hi2 = -180.0, 180.0, -90.0, 90.0
    out, even, ch, n = [], True, 0, 0
    while len(out) < precision:
        if even:
            mid = (lo1 + hi1) / 2
            if lon >= mid:
                ch, lo1 = (ch << 1) | 1, mid
            else:
                ch, hi1 = ch << 1, mid
        else:
            mid = (lo2 + hi2) / 2
            if lat >= mid:
                ch, lo2 = (ch << 1) | 1, mid
            else:
                ch, hi2 = ch << 1, mid
        even = not even
        n += 1
        if n == 5:
            out.append(_B32[ch])
            ch, n = 0, 0
    return "".join(out)


def test_known_value():
    # the published canonical example
    assert geohash_of(np.array([-5.6]), np.array([42.6]), 5) == ["ezs42"]


def test_matches_bisection_reference():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    for p in (1, 4, 6, 9, 12):
        got = geohash_of(lon, lat, p)
        want = [_ref_geohash(a, b, p) for a, b in zip(lon, lat)]
        assert got == want, p


def test_edges_clip():
    lon = np.array([-180.0, 180.0, 0.0])
    lat = np.array([-90.0, 90.0, 0.0])
    out = geohash_of(lon, lat, 6)
    assert len(out) == 3 and all(len(s) == 6 for s in out)


def test_sql_expr_matches():
    import duckdb

    rng = np.random.RandomState(11)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS lon, unnest(?) AS lat",
        [lon.tolist(), lat.tolist()],
    )
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {geohash_sql_expr('lon', 'lat', 6)} FROM t"
        ).fetchall()
    ]
    assert got == geohash_of(lon, lat, 6)
