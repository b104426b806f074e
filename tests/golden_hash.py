"""Canonical result hashing for pinned query goldens.

The ``no_oracle`` queries (stateful/approximate/non-SQL operators)
get a deterministic red/green via a stored content hash instead of a
DuckDB oracle (VERDICT r1 item 7): results are pure functions of the
seeded fixtures, so the canonical hash is stable across rounds and
partitionings.  Regenerate with ``python tests/golden_hash.py``
after an INTENTIONAL output change, and say why in the commit.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

GOLDEN_PATH = Path(__file__).parent / "goldens" / "query_hashes.json"
SF_DIR = "/root/testdata/sf0.001"

# every queries() entry the driver can only rows-check (no oracle_sql)
NO_ORACLE_QUERIES = [
    "embedding_neardup",
    "ivf_ann",
    "pq_ann",
    "zonal_multiband",
    "bpe_merges",
]


def canonical_hash(result) -> str:
    """Order-independent content hash: normalize to pandas, sort
    columns by name and rows by all columns, format floats at 12
    significant digits, sha256 the CSV bytes."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (int, float)):
        return hashlib.sha256(f"{result:.12g}".encode()).hexdigest()[:16]
    if isinstance(result, dict):  # dict of tables -> hash of named hashes
        inner = {k: canonical_hash(v) for k, v in sorted(result.items())}
        return hashlib.sha256(json.dumps(inner).encode()).hexdigest()[:16]
    if isinstance(result, pa.Table):
        df = result.to_pandas()
    elif hasattr(result, "to_pandas"):  # ray Dataset
        df = result.to_pandas()
    else:
        df = pd.DataFrame(result)
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    buf = df.to_csv(index=False, float_format="%.12g").encode()
    return hashlib.sha256(buf).hexdigest()[:16]


def compute_all(sf_dir: str = SF_DIR) -> dict[str, str]:
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __ray_entry__ as entry

    qs = entry.queries()
    return {name: canonical_hash(qs[name](sf_dir)) for name in NO_ORACLE_QUERIES}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    hashes = compute_all()
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN_PATH.write_text(json.dumps(hashes, indent=2) + "\n")
    print(f"wrote {GOLDEN_PATH}")
    for k, v in hashes.items():
        print(f"  {k}: {v}")
    ray.shutdown()


if __name__ == "__main__":
    main()
