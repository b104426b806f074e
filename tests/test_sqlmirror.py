"""functions/sqlmirror.py: the DuckDB expression builders must be
bit-identical to the numpy hash kernels they mirror -- these are the
foundations under the approx_distinct / quality_scores / minhash /
simhash SQL oracles, so edge cases (empty strings, multi-byte utf-8,
wraparound at 2**64-1) are pinned here independent of the sf tables."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tiff_to_geojson_csv_json_format_converter_ray.functions import (  # noqa: E402
    sqlmirror as SM,
)
from tiff_to_geojson_csv_json_format_converter_ray.functions.hashing import (  # noqa: E402
    MinHasher, char_shingle_hashes, fnv1a_array, simhash_batch,
)
from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (  # noqa: E402
    HyperLogLog, _fmix64,
)


@pytest.fixture(scope="module")
def con():
    import duckdb

    return duckdb.connect()


TRICKY = ["", "a", "héllo wörld", "日本語テスト", "a b  c", " lead",
          "trail ", "x" * 300, "\x1f\x00ish", "UPPER lower 0123"]


def test_fnv1a_sql_matches_numpy(con):
    want = fnv1a_array(TRICKY)
    con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS s", [TRICKY])
    got = dict(con.execute(f"SELECT s, {SM.fnv1a_sql('s')} FROM t").fetchall())
    assert {s: int(h) for s, h in zip(TRICKY, want)} == {
        s: int(h) for s, h in got.items()
    }


def test_fmix64_sql_matches_numpy(con):
    vals = [0, 1, 2**32, 2**63 - 1, 2**63, 2**64 - 1, 1234567890123456789]
    want = [int(x) for x in _fmix64(np.array(vals, dtype=np.uint64))]
    fx, last = SM.fmix64_ctes(
        f"(SELECT unnest({vals}) ::HUGEINT AS h)", "t"
    )
    got = sorted(
        int(r[0]) for r in con.execute(f"WITH {fx} SELECT h FROM {last}").fetchall()
    )
    assert got == sorted(want)


def test_mul64_sql_wraparound(con):
    # worst case: max uint64 times a >= 2**63 constant
    a = 2**64 - 1
    c = 0xFF51AFD7ED558CCD
    want = (a * c) % 2**64
    got = con.execute(
        f"SELECT {SM.mul64_sql(f'{a}::HUGEINT', c)}"
    ).fetchone()[0]
    assert int(got) == want


def test_hll_estimate_sql_matches_engine(con):
    strs = [f"k{i % 379}" for i in range(5000)] + TRICKY
    hll = HyperLogLog(12)
    hll.add_hashes(fnv1a_array(strs))
    want = hll.estimate()
    con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS s", [strs])
    got = con.execute(
        "SELECT " + SM.hll_estimate_sql(
            f"(SELECT {SM.fnv1a_sql('s')} AS h FROM t)"
        )
    ).fetchone()[0]
    # float-sum order may differ by ulps; the oracles round 1-6 dp
    assert got == pytest.approx(want, abs=1e-9)


def test_hll_linear_counting_branch(con):
    strs = [f"only{i}" for i in range(10)]  # tiny -> linear counting
    hll = HyperLogLog(12)
    hll.add_hashes(fnv1a_array(strs))
    want = hll.estimate()
    con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS s", [strs])
    got = con.execute(
        "SELECT " + SM.hll_estimate_sql(
            f"(SELECT {SM.fnv1a_sql('s')} AS h FROM t)"
        )
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=1e-9)


def test_simhash64_sql_matches_engine(con):
    docs = ["the quick brown fox", "", "a a b", "héllo wörld wörld", "x",
            "t " + "dup " * 40]
    toks = [d.split() for d in docs]
    flat = [w for d in toks for w in d]
    bounds = np.r_[0, np.cumsum([len(d) for d in toks])].astype(np.int64)
    want = simhash_batch(fnv1a_array(flat), bounds).view(np.int64)
    con.execute(
        "CREATE OR REPLACE TABLE docs AS "
        "SELECT unnest(range(6)) AS doc_id, unnest(?) AS text", [docs]
    )
    got = dict(con.execute(SM.simhash64_sql("docs")).fetchall())
    assert {i: int(want[i]) for i in range(6)} == got


def test_rolling_shingle_polynomial_matches_engine(con):
    """The 5-term closed-form polynomial in the minhash oracle equals
    the engine's rolling Rabin-Karp hashes."""
    text = "héllo wörld of shingles"
    want = [int(x) for x in char_shingle_hashes(text, 5)]
    ROLL_POWS = [1, 1099511628211, 956575116354345, 624165263380053675,
                 11527715348014283921]
    hexpr = "hex(encode(?))"
    byte = lambda pos: (
        f"(16 * {SM._hexval('hx', f'2*({pos})-1')} "
        f"+ {SM._hexval('hx', f'2*({pos})')})::HUGEINT"
    )
    shingle = " + ".join(
        f"{byte(f'i+{j}')} * {ROLL_POWS[4-j]}::HUGEINT" for j in range(5)
    )
    got = [
        int(r[0])
        for r in con.execute(
            f"WITH d AS (SELECT {hexpr} AS hx, "
            "octet_length(encode(?)) AS n), "
            "p AS (SELECT i FROM range(1, 1000) t(i)) "
            f"SELECT (({shingle}) % {SM.M64}) AS h "
            "FROM d, p WHERE p.i <= d.n - 4 ORDER BY p.i",
            [text, text],
        ).fetchall()
    ]
    assert got == want


def test_minhash_permutation_matches_engine(con):
    mh = MinHasher(8, 42)
    hashes = fnv1a_array(["aaaaa", "bbbbb", "ccccc"])
    want = [int(x) for x in mh.signature(hashes)]
    vals = ", ".join(
        f"({j}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for j, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    hl = [int(h) for h in hashes]
    got = [
        int(r[0])
        for r in con.execute(
            f"WITH perms(j, a, b) AS (VALUES {vals}), "
            f"h AS (SELECT unnest({hl}) ::HUGEINT AS h) "
            f"SELECT MIN((h.h * p.a + p.b) % {SM.M64}) "
            "FROM h, perms p GROUP BY p.j ORDER BY p.j"
        ).fetchall()
    ]
    assert got == want
