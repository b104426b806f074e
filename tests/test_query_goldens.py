"""Pinned-hash goldens for the no-oracle queries (VERDICT r1 item 7):
every ``queries()`` entry without an ``oracle_sql()`` counterpart gets
a deterministic red/green here -- the results are pure functions of the
seeded sf0.001 fixtures, canonical-hashed (sorted columns + rows,
12-sig-digit floats).

If a hash mismatches after an INTENTIONAL output change, regenerate
with ``python tests/golden_hash.py`` and explain in the commit.
"""

from __future__ import annotations

import json

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from golden_hash import GOLDEN_PATH, NO_ORACLE_QUERIES, SF_DIR, canonical_hash  # noqa: E402


@pytest.fixture(scope="module")
def pinned() -> dict[str, str]:
    return json.loads(GOLDEN_PATH.read_text())


@pytest.fixture(scope="module")
def query_fns(ray_session):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __ray_entry__ as entry

    return entry.queries()


def test_golden_file_covers_exactly_the_no_oracle_tail(pinned):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __ray_entry__ as entry

    no_oracle = set(entry.queries()) - set(entry.oracle_sql())
    assert no_oracle == set(NO_ORACLE_QUERIES) == set(pinned)


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_pinned_hash(name, pinned, query_fns):
    got = canonical_hash(query_fns[name](SF_DIR))
    assert got == pinned[name], (
        f"{name}: canonical hash {got} != pinned {pinned[name]} -- if the "
        "output change is intentional, regenerate tests/goldens/"
        "query_hashes.json via `python tests/golden_hash.py`"
    )
