"""Replicates the driver's correctness gate locally: every query in
``__ray_entry__.queries()`` that has an ``oracle_sql()`` entry is run
at sf0.01 and compared against DuckDB (row count + schema + value
equality on name-sorted columns / row-sorted values)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duckdb_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # ray Dataset


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__

    return __ray_entry__


def _compare(name, got_df, want_df):
    assert len(got_df) == len(want_df), (
        f"{name}: row count {len(got_df)} != oracle {len(want_df)}"
    )
    g = _norm(got_df)
    w = _norm(want_df)
    assert list(g.columns) == list(w.columns), (
        f"{name}: columns {list(g.columns)} != {list(w.columns)}"
    )
    for c in g.columns:
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(
            w[c].dtype, np.floating
        ):
            # the DRIVER's value hash is dtype-sensitive (a CSV of
            # 46220 vs 46220.0 hashes differently), so an int64 engine
            # column against a float64 oracle column (un-cast HUGEINT
            # SUM/COUNT) is a latent driver-gate red even when values
            # are bit-equal -- the r4 url_domain_stats / r5
            # pivot_events failure class.  Require float-ness to AGREE.
            assert np.issubdtype(g[c].dtype, np.floating) == np.issubdtype(
                w[c].dtype, np.floating
            ), (
                f"{name}.{c}: dtype class mismatch {g[c].dtype} vs "
                f"{w[c].dtype} -- CAST the oracle aggregate to BIGINT"
            )
            gv = g[c].to_numpy(dtype=np.float64)
            wv = w[c].to_numpy(dtype=np.float64)
            both_nan = np.isnan(gv) & np.isnan(wv)
            assert ((gv == wv) | both_nan).all(), (
                f"{name}.{c}: max diff "
                f"{np.nanmax(np.abs(gv - wv))}"
            )
        else:
            assert g[c].equals(w[c]), f"{name}.{c} mismatch"


def test_all_oracled_queries(entry_mod):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    missing = set(sqls) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"
    con = _duckdb_con()
    failures = []
    for name, sql in sorted(sqls.items()):
        try:
            got = _to_df(qs[name](SF))
            want = con.execute(sql).fetchdf()
            _compare(name, got, want)
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(entry_mod):
    """Queries without SQL oracles must at least run and return rows>=0
    with a stable schema (the driver's weaker check)."""
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    for name in sorted(set(qs) - set(sqls)):
        out = _to_df(qs[name](SF))
        assert out is not None, name
        assert len(out.columns) > 0, name


def test_entry_smoke(entry_mod):
    out = _to_df(entry_mod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"cell_8", "count"}


def test_registry_head_curated(entry_mod):
    """The driver's correctness gate samples the FIRST ~50 registry
    entries; pin that the curated head (a) exists, (b) leads the dict,
    and (c) spans the operator families (VERDICT r3 item 2)."""
    qs = entry_mod.queries()
    head = entry_mod._REGISTRY_HEAD
    assert len(head) == len(set(head))
    assert list(qs)[: len(head)] == head
    sqls = entry_mod.oracle_sql()
    # every head entry has a SQL oracle (VERDICT r4 item 2: zero
    # no_oracle rows in the driver gate)
    assert [k for k in head if k not in sqls] == []
    families = {
        "raster": {"extract_full", "band_stats", "zonal_stats"},
        "joins": {"pip_join", "knn_lookup", "bbox_join"},
        "pages": {"pages_flagship", "url_dedup"},
        "dedup": {"dedup_exact", "minhash_dedup"},
        "ann": {"ann_top3", "kmeans_clusters"},
        "text": {"lang_id", "token_counts", "tfidf_scores"},
        "relational": {"pricing_summary", "big_join_revenue"},
        "window": {"events_windowed", "asof_join"},
        "sketch": {"heavy_hitters"},
        "multimodal": {"media_ahash_pairs"},
    }
    first50 = set(list(qs)[:50])
    for fam, names in families.items():
        assert names & first50, f"family {fam} missing from registry head"


def test_catalog_counts(entry_mod):
    """Single source of truth for the catalog size quoted in docs
    (ROADMAP/COVERAGE point here instead of hand-counting)."""
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert len(qs) == 737
    assert len(sqls) == 732
    assert set(sqls) <= set(qs)
    assert sorted(set(qs) - set(sqls)) == [
        "bpe_merges", "embedding_neardup", "ivf_ann",
        "pq_ann", "zonal_multiband",
    ]
