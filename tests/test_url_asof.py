"""URL parser (functions/url.py) and partitioned as-of join
(stages/joins.py): ground truth via urllib.parse, DuckDB regexp
mirror, and DuckDB ASOF LEFT JOIN."""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
    parse_urls, registered_domain, sql_url_exprs,
)

ADVERSARIAL = [
    "https://www.src7.example.com/p/123?q=4",
    "http://a.b.co.uk/x/y#frag",
    "ftp://user:pw@host.net:2121/file.txt",
    "https://single/",
    "not a url",
    "",
    "https://news.org",
    "http://x.gov.in:80/?#",
    "https://a.co",
    "http://trailing.dot./p",
    "scheme+x-y://h.tld/p?a=1&b=2#z",
    "//protocol-relative.example.com/x",
    "https://:8080/nohost",
    "https://host:notaport/x",
]


class TestParseUrls:
    def test_matches_urllib_on_wellformed(self):
        def ok(u):
            try:
                s = urlsplit(u)
                s.port  # raises on non-numeric port
                return bool(s.hostname)
            except ValueError:
                return False

        urls = [u for u in ADVERSARIAL if "://" in u and ok(u)]
        t = parse_urls(pa.array(urls))
        for i, u in enumerate(urls):
            s = urlsplit(u)
            assert t["scheme"][i].as_py() == s.scheme
            assert t["host"][i].as_py() == s.hostname
            got_port = t["port"][i].as_py()
            assert (int(got_port) if got_port is not None else None) == s.port
            assert t["path"][i].as_py() == (s.path or None)
            assert t["query"][i].as_py() == (s.query or None)
            assert t["fragment"][i].as_py() == (s.fragment or None)

    @given(
        host=st.lists(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz0123456789-",
                min_size=1, max_size=8,
            ).filter(lambda s: not s.startswith("-") and not s.endswith("-")),
            min_size=1, max_size=4,
        ),
        path=st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789/._-",
            max_size=20,
        ),
        query=st.one_of(
            st.none(),
            st.text(alphabet="abcdefghijklmnopqrstuvwxyz=&1", max_size=10),
        ),
    )
    @settings(max_examples=150, deadline=None)
    def test_property_vs_urllib(self, host, path, query):
        h = ".".join(host)
        u = f"https://{h}/{path}"
        if query is not None:
            u += f"?{query}"
        s = urlsplit(u)
        t = parse_urls(pa.array([u]))
        assert t["scheme"][0].as_py() == "https"
        assert t["host"][0].as_py() == s.hostname
        assert t["query"][0].as_py() == (s.query or None)

    def test_registered_domain_rules(self):
        hosts = pa.array(
            ["www.a.example.com", "a.b.co.uk", "x.com", "single",
             "deep.sub.ac.jp", "plain.org"]
        )
        assert registered_domain(hosts).to_pylist() == [
            "example.com", "b.co.uk", "x.com", "single", "sub.ac.jp",
            "plain.org",
        ]

    def test_sql_mirror_bit_equal(self):
        import duckdb

        t = parse_urls(pa.array(ADVERSARIAL)).to_pandas()
        con = duckdb.connect()
        con.execute("CREATE TABLE u(url VARCHAR)")
        con.executemany("INSERT INTO u VALUES (?)", [[u] for u in ADVERSARIAL])
        sel = ", ".join(
            f"{e} AS {n}" for n, e in sql_url_exprs("url").items()
        )
        df = con.execute(f"SELECT {sel} FROM u").fetchdf()
        for c in t.columns:
            got = t[c].tolist()
            want = df[c].where(df[c].notna(), None).tolist()
            assert got == want, (c, got, want)


CANON_CASES = [
    ("HTTPS://WWW.Ex.COM:443/a/b?b=2&a=1#frag", "https://www.ex.com/a/b?a=1&b=2"),
    ("http://h.org:80/x", "http://h.org/x"),
    ("http://h.org:8080/x?z=1", "http://h.org:8080/x?z=1"),
    ("https://h.co", "https://h.co/"),
    ("https://h.co/?b&a&c=3", "https://h.co/?a&b&c=3"),
    ("not a url", None),
    ("https://CaSe.Co.Uk/P?x=1&X=2", "https://case.co.uk/P?X=2&x=1"),
    ("", None),
]


class TestCanonicalizeUrls:
    def test_known_cases(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
            canonicalize_urls,
        )

        got = canonicalize_urls(
            pa.array([u for u, _ in CANON_CASES])
        ).to_pylist()
        assert got == [w for _, w in CANON_CASES]

    def test_sql_mirror_bit_equal(self):
        import duckdb

        from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
            canonicalize_urls, sql_canonical_expr,
        )

        urls = [u for u, _ in CANON_CASES] + ADVERSARIAL
        got = canonicalize_urls(pa.array(urls)).to_pylist()
        con = duckdb.connect()
        con.execute("CREATE TABLE u(url VARCHAR)")
        con.executemany("INSERT INTO u VALUES (?)", [[u] for u in urls])
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {sql_canonical_expr('url')} FROM u"
            ).fetchall()
        ]
        assert got == want

    def test_dedup_key_collapses_variants(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.url import (
            canonicalize_urls,
        )

        variants = [
            "https://A.example.com/p?b=1&a=2",
            "HTTPS://a.EXAMPLE.com:443/p?a=2&b=1#x",
            "https://a.example.com/p?a=2&b=1",
        ]
        got = set(canonicalize_urls(pa.array(variants)).to_pylist())
        assert got == {"https://a.example.com/p?a=2&b=1"}


class TestGroupedTopKDistributed:
    def test_matches_driver_tier(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables, grouped_top_k,
        )

        rng = np.random.RandomState(9)
        t = pa.table(
            {
                "g": rng.randint(0, 200, 5000).astype(np.int64),
                "v": rng.randint(0, 10_000, 5000).astype(np.int64),
                "id": np.arange(5000, dtype=np.int64),
            }
        )
        ds = ray.data.from_arrow(t).repartition(6)
        driver = grouped_top_k(ds, "g", "v", 4, tiebreak="id")
        dist = collect_tables(
            grouped_top_k(
                ds, "g", "v", 4, tiebreak="id", distributed_combine=True
            )
        )
        cols = ["g", "v", "id", "rank"]
        a = driver.select(cols).sort_by([(c, "ascending") for c in cols])
        b = dist.select(cols).sort_by([(c, "ascending") for c in cols])
        assert a.equals(b)


class TestPartitionedAsofJoin:
    def test_matches_duckdb_asof(self, ray_session):
        import duckdb
        import ray
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            partitioned_asof_join,
        )

        rng = np.random.RandomState(3)
        nl, nr = 4000, 2500
        lt = pa.table(
            {
                "k": rng.randint(0, 80, nl).astype(np.int64),
                "ts": rng.randint(0, 5000, nl).astype(np.int64),
                "lid": np.arange(nl, dtype=np.int64),
            }
        )
        # keys 80..99 exist only on the right; ts collisions guaranteed
        rt = pa.table(
            {
                "k": rng.randint(0, 100, nr).astype(np.int64),
                "ts": rng.randint(0, 5000, nr).astype(np.int64),
                "rv": rng.randint(0, 10, nr).astype(np.int64),
            }
        )
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )

        out = partitioned_asof_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(3),
            "k", "ts", left_cols=["lid"], right_cols=[], num_buckets=16,
        )
        # collect_tables (not raw concat of block refs): Ray's groupby
        # may emit zero-column empty blocks for empty partitions
        got = collect_tables(out).sort_by("lid").to_pandas()
        con = duckdb.connect()
        con.register("l", lt.to_pandas())
        con.register("r", rt.to_pandas())
        want = con.execute(
            "SELECT l.lid, r.ts AS asof_ts FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts ORDER BY lid"
        ).fetchdf()
        assert len(got) == nl
        g = got["asof_ts"].fillna(-1).to_numpy()
        w = want["asof_ts"].fillna(-1).to_numpy()
        assert (g == w).all()
        # right-only keys never appear; left-only keys all null
        left_only = set(lt["k"].to_pylist()) - set(rt["k"].to_pylist())
        if left_only:
            mask = got.set_index("lid").loc[
                [i for i, k in enumerate(lt["k"].to_pylist()) if k in left_only],
                "asof_ts",
            ]
            assert mask.isna().all()

    def test_forward_direction_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            partitioned_asof_join,
        )

        rng = np.random.RandomState(17)
        nl, nr = 3000, 2000
        lt = pa.table(
            {
                "k": rng.randint(0, 60, nl).astype(np.int64),
                "ts": rng.randint(0, 4000, nl).astype(np.int64),
                "lid": np.arange(nl, dtype=np.int64),
            }
        )
        rt = pa.table(
            {
                "k": rng.randint(0, 70, nr).astype(np.int64),
                "ts": rng.randint(0, 4000, nr).astype(np.int64),
            }
        )
        out = partitioned_asof_join(
            ray.data.from_arrow(lt).repartition(4),
            ray.data.from_arrow(rt).repartition(3),
            "k", "ts", left_cols=["lid"], right_cols=[],
            num_buckets=16, direction="forward",
        )
        got = collect_tables(out).sort_by("lid").to_pandas()
        con = duckdb.connect()
        con.register("l", lt.to_pandas())
        con.register("r", rt.to_pandas())
        want = con.execute(
            "SELECT l.lid, r.ts AS asof_ts FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts <= r.ts ORDER BY lid"
        ).fetchdf()
        g = got["asof_ts"].fillna(-1).to_numpy()
        w = want["asof_ts"].fillna(-1).to_numpy()
        assert len(got) == nl and (g == w).all()

    def test_keyed_window_join_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            keyed_window_join,
        )

        rng = np.random.RandomState(5)
        nl, nr = 4000, 3000
        lt = pa.table(
            {
                "k": rng.randint(0, 70, nl).astype(np.int64),
                "ts": rng.randint(0, 50_000, nl).astype(np.int64),
                "lid": np.arange(nl, dtype=np.int64),
            }
        )
        rt = pa.table(
            {
                "k": rng.randint(0, 90, nr).astype(np.int64),
                "ts": rng.randint(0, 50_000, nr).astype(np.int64),
                "rid": np.arange(nr, dtype=np.int64),
            }
        )
        out = keyed_window_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(3),
            "k", "ts", window_us=500, left_id="lid", right_id="rid",
            num_buckets=16,
        )
        got = collect_tables(out)
        con = duckdb.connect()
        con.register("l", lt.to_pandas())
        con.register("r", rt.to_pandas())
        want = con.execute(
            "SELECT l.k, l.lid, r.rid FROM l JOIN r ON l.k = r.k "
            "AND r.ts BETWEEN l.ts AND l.ts + 500"
        ).fetchdf()
        gs = set(
            zip(got["k"].to_pylist(), got["lid"].to_pylist(),
                got["rid"].to_pylist())
        )
        ws = set(zip(want["k"], want["lid"], want["rid"]))
        assert got.num_rows == len(want) and gs == ws
        # boundary inclusivity: both window edges match
        edge_l = pa.table(
            {"k": pa.array([1], pa.int64()), "ts": pa.array([100], pa.int64()),
             "lid": pa.array([0], pa.int64())}
        )
        edge_r = pa.table(
            {"k": pa.array([1, 1, 1, 1], pa.int64()),
             "ts": pa.array([99, 100, 600, 601], pa.int64()),
             "rid": pa.array([0, 1, 2, 3], pa.int64())}
        )
        eout = collect_tables(
            keyed_window_join(
                ray.data.from_arrow(edge_l), ray.data.from_arrow(edge_r),
                "k", "ts", window_us=500, left_id="lid", right_id="rid",
                num_buckets=4,
            )
        )
        assert sorted(eout["rid"].to_pylist()) == [1, 2]

    def test_empty_sides(self, ray_session):
        import ray
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
            partitioned_asof_join,
        )

        lt = pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "ts": pa.array([10, 20], pa.int64()),
                "lid": pa.array([0, 1], pa.int64()),
            }
        )
        rt = lt.slice(0, 0).rename_columns(["k", "ts", "rid"])
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables,
        )

        out = partitioned_asof_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            "k", "ts", left_cols=["lid"], right_cols=[], num_buckets=4,
        )
        got = collect_tables(out).sort_by("lid")
        assert got.num_rows == 2
        assert got["asof_ts"].null_count == 2
