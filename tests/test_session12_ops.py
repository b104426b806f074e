"""Property tests for the round-3 session-12 operators."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _st_rank_direct(i: int, n: int) -> int:
    """Direct per-position Siegel-Tukey rank (the SQL CASE)."""
    if 2 * i <= n + 1:
        f = 2 * i - 1 if i % 2 == 1 else 2 * i
        return min(f, n)
    q = n + 1 - i
    return 2 * q if q % 2 == 1 else 2 * q - 1


def test_st_ranks_are_a_permutation():
    for n in range(1, 60):
        ranks = sorted(_st_rank_direct(i, n) for i in range(1, n + 1))
        assert ranks == list(range(1, n + 1)), n


def test_st_run_sum_matches_direct():
    from __ray_entry__ import _st_run_sum

    for n in range(1, 40):
        for a in range(1, n + 1):
            for b in range(a, n + 1):
                want = sum(_st_rank_direct(i, n) for i in range(a, b + 1))
                assert _st_run_sum(a, b, n) == want, (a, b, n)


def test_st_alternation_shape():
    # the smallest value gets rank 1, the two largest 2 and 3
    assert _st_rank_direct(1, 10) == 1
    assert _st_rank_direct(10, 10) == 2
    assert _st_rank_direct(9, 10) == 3
    assert _st_rank_direct(2, 10) == 4
    assert _st_rank_direct(3, 10) == 5


def test_registry_has_no_duplicate_keys():
    """Duplicate dict keys silently shadow earlier operators (a
    later same-named entry wins) -- scan the source so a collision
    fails loudly instead."""
    import re
    from collections import Counter

    src = open(
        "/root/repo/tiff_to_geojson_csv_json_format_converter_ray/"
        "queries/registry.py"
    ).read()
    m = re.search(r"def queries\(\).*?q = \{(.*?)\n    \}", src, re.S)
    keys = re.findall(r'"([a-z0-9_]+)":', m.group(1))
    dups = sorted(k for k, c in Counter(keys).items() if c > 1)
    assert not dups, f"duplicate queries() keys: {dups}"


def test_oracles_subset_of_queries():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert not set(o) - set(q)
