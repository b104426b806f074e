"""Regression tests for the canonical DuckDB-ROUND kernel
(functions/rounding.py) — the round-2 ``pivot_events`` driver failure
was ``floor(x+0.5)`` disagreeing with DuckDB's C ``round()`` on values
whose ``x+0.5`` crosses an integer boundary through float rounding.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
    round_half_away,
    round_like_sql,
    scaled_int,
)


def _adversarial_values() -> np.ndarray:
    rng = np.random.default_rng(7)
    halves = (np.arange(-20000, 20000) + 0.5)
    return np.concatenate([
        rng.uniform(-1e6, 1e6, 100_000),
        rng.uniform(-1, 1, 50_000),
        halves,
        np.nextafter(halves, -np.inf),
        np.nextafter(halves, np.inf),
        halves / 100.0,
        halves / 1e6,
        np.array([0.49999999999999994, -0.49999999999999994,
                  4503599627370495.5, -4503599627370495.5, 0.0, -0.0]),
    ])


def test_round_half_away_matches_duckdb_round():
    import duckdb

    vals = _adversarial_values()
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    for d in (0, 2, 6):
        want = con.execute(f"SELECT ROUND(v, {d}) FROM t").fetch_arrow_table()
        got = round_like_sql(vals, d).to_numpy()
        wv = want[0].to_numpy()
        # bit-identical, including signed zeros
        assert (wv.view(np.int64) == got.view(np.int64)).all(), (
            f"ndigits={d}: first mismatch at "
            f"{vals[wv.view(np.int64) != got.view(np.int64)][:5]}"
        )


def test_scaled_int_matches_duckdb_cents():
    import duckdb

    vals = _adversarial_values()
    vals = vals[np.abs(vals) < 9e15]
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    want = con.execute(
        "SELECT CAST(ROUND(v * 100, 0) AS BIGINT) FROM t"
    ).fetch_arrow_table()[0].to_numpy()
    got = scaled_int(vals, 100.0)
    assert (want == got).all()


def test_known_edge_case():
    # THE round-2 driver failure shape: floor(x+0.5) says 1, round says 0
    x = 0.49999999999999994
    assert np.floor(x + 0.5) == 1.0  # the old, wrong kernel
    assert round_half_away(x) == 0.0
    assert round_half_away(-x) == -0.0
    assert round_half_away(0.5) == 1.0
    assert round_half_away(-0.5) == -1.0
    assert round_half_away(2.5) == 3.0  # away from zero, not ties-to-even
    assert round_half_away(1.5) == 2.0


@pytest.mark.parametrize("sf", ["sf0.01", "sf0.1"])
def test_pivot_events_parity_broad(ray_session, sf):
    """pivot_events engine-vs-DuckDB at two scales: the r2 driver red
    was value-dependent, so cover 10x more event values than the
    default sf0.01 parity sweep."""
    import duckdb

    import __ray_entry__ as entry

    sf_dir = f"/root/testdata/{sf}"
    got = entry.queries()["pivot_events"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.execute(entry.oracle_sql()["pivot_events"]).fetchdf()
    got = got.sort_values("user_id").reset_index(drop=True)
    want = want.sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want)
    for c in sorted(got.columns):
        assert (
            got[c].to_numpy(dtype=np.int64)
            == want[c].to_numpy(dtype=np.int64)
        ).all(), f"{sf}: column {c}"
