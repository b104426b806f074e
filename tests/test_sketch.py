"""Tests for the sketch/sampling operators (HLL, bottom-k sampling)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tiff_to_geojson_csv_json_format_converter_ray.functions import hashing as H
from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
    HyperLogLog, mix32, mix32_sql,
)


class TestHLL:
    def test_accuracy(self):
        hll = HyperLogLog(p=12)
        n = 20_000
        hll.add_hashes(H.fnv1a_array([f"item-{i}" for i in range(n)]))
        est = hll.estimate()
        assert abs(est - n) / n < 0.05  # ~1.04/sqrt(4096) = 1.6% std err

    def test_merge_equals_union(self):
        a, b, u = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
        ha = H.fnv1a_array([f"a{i}" for i in range(5000)])
        hb = H.fnv1a_array([f"b{i}" for i in range(5000)])
        a.add_hashes(ha)
        b.add_hashes(hb)
        u.add_hashes(np.concatenate([ha, hb]))
        merged = a.merge(b)
        np.testing.assert_array_equal(merged.registers, u.registers)

    def test_duplicates_dont_inflate(self):
        hll = HyperLogLog(12)
        h = H.fnv1a_array(["x", "y", "z"] * 1000)
        hll.add_hashes(h)
        assert hll.estimate() < 10


class TestMix32:
    def test_matches_duckdb(self):
        import duckdb

        keys = np.concatenate([
            np.arange(0, 50_000, 7, dtype=np.int64),
            # realistic hashed-key magnitudes: low-32-bits > ~3.47e9
            # overflowed the old single-multiply SQL form, and negative
            # keys hit the %-sign-convention divergence (ADVICE r1)
            np.array(
                [3_470_000_000, 4_000_000_000, 4_294_967_295,
                 4_294_967_296, 10**12, 2**40 + 17, 2**62,
                 -1, -42, -4_000_000_000, -(2**40)],
                dtype=np.int64,
            ),
        ])
        mine = mix32(keys, seed=7)
        con = duckdb.connect()
        con.register("t", pa.table({"k": keys}))
        got = con.execute(
            f"SELECT {mix32_sql('k', 7)} AS h FROM t"
        ).fetchnumpy()["h"]
        np.testing.assert_array_equal(got.astype(np.int64), mine)

    def test_uniformity_rough(self):
        h = mix32(np.arange(100_000, dtype=np.int64))
        # buckets roughly uniform (chi-square-ish sanity)
        counts = np.bincount((h // (2**32 // 16)).astype(int), minlength=16)[:16]
        assert counts.min() > 100_000 / 16 * 0.9


class TestExactQuantiles:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        """Iterative-refinement selection == DuckDB quantile_disc
        exactly, with driver_cap forcing multiple counting rounds."""
        import duckdb
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            exact_quantiles,
        )

        rng = np.random.RandomState(3)
        # lognormal + duplicates + negatives: skew, ties, sign changes
        vals = np.concatenate([
            rng.lognormal(3, 1.5, 20_000),
            np.repeat([7.25, -1.5], 500),
            -rng.rand(1_000) * 10,
        ])
        ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(9)
        qs = [0.01, 0.25, 0.5, 0.75, 0.95, 0.999]
        got = exact_quantiles(ds, "v", qs, bins=32, driver_cap=300)
        con = duckdb.connect()
        con.register("t", pa.table({"v": vals}))
        want = [
            con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            for q in qs
        ]
        assert got["value"].to_pylist() == [float(w) for w in want]

    def test_nulls_and_nans_excluded(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            exact_quantiles,
        )

        ds = ray.data.from_arrow(
            pa.table({"v": [1.0, None, float("nan"), 2.0, 3.0]})
        )
        got = exact_quantiles(ds, "v", [0.5])
        assert got["value"][0].as_py() == 2.0

    def test_all_equal_degenerate(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            exact_quantiles,
        )

        ds = ray.data.from_arrow(pa.table({"v": [5.0] * 2000}))
        got = exact_quantiles(ds, "v", [0.5, 0.95], driver_cap=100)
        assert got["value"].to_pylist() == [5.0, 5.0]


class TestStratifiedBottomK:
    def test_matches_sql_window_and_partition_invariant(self, ray_session):
        import duckdb
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            mix32_sql,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            stratified_bottomk,
        )

        rng = np.random.RandomState(5)
        t = pa.table(
            {
                "g": pa.array(rng.choice(["a", "b", "c", "d"], 5000)),
                "k": pa.array(np.arange(5000, dtype=np.int64)),
            }
        )
        one = ray.data.from_arrow(t)
        many = ray.data.from_arrow([t.slice(i, 250) for i in range(0, 5000, 250)])
        s1 = stratified_bottomk(one, "g", "k", 5, seed=11)
        s2 = stratified_bottomk(many, "g", "k", 5, seed=11)
        a = sorted(zip(s1["g"].to_pylist(), s1["k"].to_pylist()))
        b = sorted(zip(s2["g"].to_pylist(), s2["k"].to_pylist()))
        assert a == b and len(a) == 20  # 4 groups x 5

        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT g, k FROM (SELECT g, k, ROW_NUMBER() OVER ("
            f"PARTITION BY g ORDER BY {mix32_sql('k', 11)}, k) AS rn FROM t) "
            "WHERE rn <= 5 ORDER BY g, k"
        ).fetchall()
        assert a == [(g, k) for g, k in want]

    def test_small_groups_keep_all_rows(self, ray_session):
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            stratified_bottomk,
        )

        t = pa.table({"g": ["x", "x", "y"], "k": [1, 2, 3]})
        out = stratified_bottomk(ray.data.from_arrow(t), "g", "k", 10)
        assert out.num_rows == 3


class TestQuantileHistogram:
    def test_accuracy_vs_numpy(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            quantile_histogram,
        )

        rng = np.random.RandomState(0)
        v = rng.lognormal(3.0, 1.0, size=50_000)
        t = pa.table({"x": pa.array(v)})
        ds = ray.data.from_arrow([t.slice(i, 5000) for i in range(0, 50_000, 5000)])
        h = quantile_histogram(ds, "x", bins=512)
        for q in (0.25, 0.5, 0.75, 0.95):
            exact = np.percentile(v, q * 100)
            est = h.quantile(q)
            assert abs(est - exact) / exact < 0.05, (q, est, exact)

    def test_partition_invariant(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            quantile_histogram,
        )

        v = np.random.RandomState(1).rand(10_000) * 100
        t = pa.table({"x": pa.array(v)})
        a = quantile_histogram(ray.data.from_arrow(t), "x", bins=64, lo=0.0, hi=100.0)
        b = quantile_histogram(
            ray.data.from_arrow([t.slice(0, 3000), t.slice(3000)]),
            "x", bins=64, lo=0.0, hi=100.0,
        )
        np.testing.assert_array_equal(a.counts, b.counts)


class TestGroupedTopK:
    def test_matches_window_function(self, ray_session, sf_dir):
        import duckdb
        import os
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            grouped_top_k,
        )

        path = os.path.join(sf_dir, "documents.parquet")
        ds = ray.data.read_parquet(path, columns=["doc_id", "lang", "n_chars"])
        got = (
            grouped_top_k(ds, "lang", "n_chars", 3, tiebreak="doc_id")
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        want = con.execute(
            f"SELECT doc_id, lang, n_chars, rn - 1 AS rank FROM ("
            f"SELECT doc_id, lang, n_chars, ROW_NUMBER() OVER ("
            f"PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
            f"FROM read_parquet('{path}')) WHERE rn <= 3 ORDER BY lang, rank"
        ).fetchdf()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()


class TestBottomK:
    def test_partition_invariant(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            bottomk_sample,
        )

        t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
        one = ray.data.from_arrow(t)
        many = ray.data.from_arrow([t.slice(i, 500) for i in range(0, 5000, 500)])
        s1 = bottomk_sample(one, "k", 25, seed=3)["k"].to_pylist()
        s2 = bottomk_sample(many, "k", 25, seed=3)["k"].to_pylist()
        assert s1 == s2
        # equals the direct definition
        h = mix32(np.arange(5000, dtype=np.int64), 3)
        want = np.arange(5000)[np.lexsort((np.arange(5000), h))][:25]
        assert sorted(s1) == sorted(want.tolist())

    def test_seed_changes_sample(self, ray_session):
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            bottomk_sample,
        )

        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(np.arange(2000, dtype=np.int64))})
        )
        a = bottomk_sample(ds, "k", 20, seed=1)["k"].to_pylist()
        b = bottomk_sample(ds, "k", 20, seed=2)["k"].to_pylist()
        assert a != b


class TestMisraGries:
    def test_exact_when_capacity_covers_vocab(self):
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            MisraGries,
        )

        mg = MisraGries(10)
        mg.merge_counts(["a", "b", "a"], [1, 1, 1])
        mg.merge_counts(["a", "c"], [5, 2])
        assert mg.counts == {"a": 7, "b": 1, "c": 2}
        assert mg.total_decrement == 0

    def test_undercount_bound(self):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            MisraGries,
        )

        # zipf-ish stream, tiny capacity: est <= true <= est + n/(cap+1)
        rng = np.random.default_rng(3)
        items = [f"t{int(v)}" for v in rng.zipf(1.5, 5000) % 200]
        true = {}
        for t in items:
            true[t] = true.get(t, 0) + 1
        cap = 20
        mg = MisraGries(cap)
        for i in range(0, len(items), 137):  # uneven blocks
            chunk = items[i:i + 137]
            cnt = {}
            for t in chunk:
                cnt[t] = cnt.get(t, 0) + 1
            mg.merge_counts(list(cnt), list(cnt.values()))
        bound = len(items) / (cap + 1)
        for t, est in mg.counts.items():
            assert est <= true[t] <= est + mg.total_decrement
        assert mg.total_decrement <= bound
        # every item with true count > total_decrement must survive
        for t, c in true.items():
            if c > mg.total_decrement:
                assert t in mg.counts

    def test_heavy_hitters_stage_partition_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            heavy_hitters,
        )

        toks = ["x"] * 50 + ["y"] * 30 + ["z"] * 5 + ["w"] * 2
        tbl = pa.table({"token": pa.array(toks, pa.string())})
        for parts in (1, 4):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = heavy_hitters(ds, "token", capacity=100, min_count=5)
            assert out.to_pydict() == {"token": ["x", "y", "z"], "n": [50, 30, 5]}


class TestQuantileBucket:
    def test_partition_invariant_and_value_based(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            quantile_bucket,
        )

        rng = np.random.default_rng(5)
        v = rng.normal(100.0, 25.0, 3000)
        tbl = pa.table({"id": pa.array(np.arange(3000, dtype=np.int64)),
                        "v": pa.array(v)})

        def run(parts):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = pa.concat_tables(list(
                quantile_bucket(ds, "v", driver_cap=256).iter_batches(
                    batch_format="pyarrow", batch_size=None)
            ))
            return dict(zip(out["id"].to_pylist(), out["bucket"].to_pylist()))

        a, b = run(1), run(6)
        assert a == b
        # quartile buckets are within 1 element of n/4 each
        import collections
        sizes = collections.Counter(a.values())
        assert set(sizes) == {1, 2, 3, 4}
        for s in sizes.values():
            assert abs(s - 750) <= 1

    def test_equal_values_share_bucket(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            quantile_bucket,
        )

        tbl = pa.table({"v": pa.array([1.0] * 10 + [2.0] * 10)})
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = pa.concat_tables(list(
            quantile_bucket(ds, "v", qs=[0.5], driver_cap=8).iter_batches(
                batch_format="pyarrow", batch_size=None)
        ))
        got = sorted(zip(out["v"].to_pylist(), out["bucket"].to_pylist()))
        assert all(b == 1 for v, b in got if v == 1.0)
        assert all(b == 2 for v, b in got if v == 2.0)


class TestWeightedBottomK:
    def test_partition_invariant_and_weight_biased(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            weighted_bottomk,
        )

        n = 4000
        # half the keys carry 50x the weight
        w = np.where(np.arange(n) < n // 2, 50.0, 1.0)
        tbl = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                        "w": pa.array(w)})

        def run(parts):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            return weighted_bottomk(ds, "k", "w", k=100, seed=3)["k"].to_pylist()

        a, b = run(1), run(5)
        assert a == b
        heavy = sum(1 for k in a if k < n // 2)
        assert heavy >= 90  # 50x weight dominates the sample


class TestCountMinSketch:
    def test_never_undercounts_and_bounds(self):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.hashing import (
            fnv1a_array,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            CountMinSketch,
        )

        rng = np.random.default_rng(7)
        items = [f"k{int(v)}" for v in rng.zipf(1.3, 20000) % 1000]
        true = {}
        for t in items:
            true[t] = true.get(t, 0) + 1
        cms = CountMinSketch(width=64, depth=4)  # adversarially narrow
        keys = list(true)
        cms.update_hashed(
            fnv1a_array(keys), np.array([true[k] for k in keys])
        )
        est = cms.query_hashed(fnv1a_array(keys))
        n = len(items)
        over = 0
        for k, e in zip(keys, est):
            assert e >= true[k]  # CMS never undercounts
            if e > true[k] + 2 * n / 64:
                over += 1
        # the 2n/w bound holds for all but a 2^-depth fraction
        assert over <= max(1, int(len(keys) * 2 ** -4 * 2))

    def test_merge_equals_single_pass(self):
        import numpy as np
        from tiff_to_geojson_csv_json_format_converter_ray.functions.hashing import (
            fnv1a_array,
        )
        from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
            CountMinSketch,
        )

        a = CountMinSketch(256, 4)
        b = CountMinSketch(256, 4)
        whole = CountMinSketch(256, 4)
        h1, c1 = fnv1a_array(["x", "y"]), np.array([3, 5])
        h2, c2 = fnv1a_array(["y", "z"]), np.array([2, 7])
        a.update_hashed(h1, c1)
        b.update_hashed(h2, c2)
        whole.update_hashed(np.r_[h1, h2], np.r_[c1, c2])
        a.merge(b)
        assert np.array_equal(a.reg, whole.reg)
        assert a.total == whole.total == 17

    def test_cms_stage_partition_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data
        from tiff_to_geojson_csv_json_format_converter_ray.stages.sketch import (
            cms_counts,
        )

        toks = ["a"] * 40 + ["b"] * 10 + ["c"] * 3
        tbl = pa.table({"token": pa.array(toks, pa.string())})
        for parts in (1, 4):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = cms_counts(ds, "token", width=1024, depth=4)
            assert dict(zip(out["token"].to_pylist(),
                            out["est_n"].to_pylist())) == {
                "a": 40, "b": 10, "c": 3
            }
