"""Size-aware equi-join router: broadcast tier must be byte-equal to
Ray's hash shuffle join (inner + left_outer, incl. null keys), and the
auto strategy must route by the right side's size hint."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
    BROADCAST_JOIN_MAX_BYTES,
    collect_tables,
    equi_join,
)


def _left(n=2000):
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 300, n).astype(np.int64)
    # sprinkle null keys: SQL semantics say they never match
    k = pa.array(keys).to_pylist()
    for i in range(0, n, 97):
        k[i] = None
    return pa.table(
        {
            "k": pa.array(k, pa.int64()),
            "payload": pa.array(rng.rand(n)),
        }
    )


def _right():
    rng = np.random.RandomState(11)
    rk = list(range(0, 250))
    rk[13] = None  # null on the right side too
    return pa.table(
        {
            "rk": pa.array(rk, pa.int64()),
            "dim": pa.array(rng.rand(len(rk))),
        }
    )


def _canon(tbl: pa.Table) -> list[tuple]:
    cols = sorted(tbl.schema.names)
    t = tbl.select(cols)
    rows = list(zip(*(t[c].to_pylist() for c in cols)))
    return sorted(
        rows, key=lambda r: tuple((v is None, v) for v in r)
    )


@pytest.mark.parametrize("join_type", ["inner", "left_outer"])
def test_broadcast_equals_shuffle(ray_session, join_type):
    import ray.data

    lt, rt = _left(), _right()
    outs = {}
    for strategy in ("broadcast", "shuffle"):
        l = ray.data.from_arrow(lt).repartition(4)
        r = ray.data.from_arrow(rt).repartition(2)
        j = equi_join(
            l, r, on=("k",), right_on=("rk",), join_type=join_type,
            num_partitions=4, strategy=strategy,
        )
        outs[strategy] = collect_tables(j)
    b, s = outs["broadcast"], outs["shuffle"]
    assert sorted(b.schema.names) == sorted(s.schema.names)
    assert _canon(b) == _canon(s)
    if join_type == "left_outer":
        # every left row survives, null keys unmatched
        assert b.num_rows >= lt.num_rows


def test_auto_routes_by_hint(ray_session):
    import ray.data

    lt, rt = _left(200), _right()
    l = ray.data.from_arrow(lt)
    r = ray.data.from_arrow(rt)
    small = equi_join(
        l, r, on=("k",), right_on=("rk",), right_size_hint=1024,
    )
    # broadcast tier is a MapBatches stage, not a JoinOperator
    assert "Join[Join]" not in str(small._plan._logical_plan.dag)
    big = equi_join(
        l, r, on=("k",), right_on=("rk",),
        right_size_hint=BROADCAST_JOIN_MAX_BYTES + 1,
    )
    assert "Join[Join]" in str(big._plan._logical_plan.dag)
    # no hint -> shuffle (never materialize an unknown-size side)
    nohint = equi_join(l, r, on=("k",), right_on=("rk",))
    assert "Join[Join]" in str(nohint._plan._logical_plan.dag)
    assert _canon(collect_tables(small)) == _canon(collect_tables(big))


def test_full_outer_never_broadcasts(ray_session):
    import ray.data

    l = ray.data.from_arrow(_left(50))
    r = ray.data.from_arrow(_right())
    j = equi_join(
        l, r, on=("k",), right_on=("rk",), join_type="full_outer",
        right_size_hint=1,  # tiny hint must still not broadcast
    )
    assert "Join[Join]" in str(j._plan._logical_plan.dag)
    with pytest.raises(ValueError):
        equi_join(
            l, r, on=("k",), right_on=("rk",), join_type="full_outer",
            strategy="broadcast",
        )


class TestSkewJoin:
    def test_skew_strategy_matches_shuffle(self, ray_session):
        """strategy='skew' (hot-key split: broadcast the right's hot
        subset, shuffle the cold remainder) equals the plain shuffle
        join on a fixture where one key carries ~50% of all rows."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables, equi_join,
        )

        rng = np.random.RandomState(11)
        n = 40_000
        # key 7 is hot (half the rows); keys 0..199 are cold; some
        # left keys (900+) have no right match and vice versa
        k = np.where(rng.rand(n) < 0.5, 7, rng.randint(0, 200, n))
        k[:50] = 900 + np.arange(50)  # unmatched-left block
        left = ray.data.from_arrow(
            pa.table({"k": k, "lv": np.arange(n, dtype=np.int64)})
        ).repartition(8)
        rk = np.concatenate(
            [np.arange(0, 150), np.array([7] * 5), np.arange(1000, 1020)]
        ).astype(np.int64)
        right = ray.data.from_arrow(
            pa.table({"rk": rk, "rv": rk * 10})
        ).repartition(4)

        def norm(ds):
            t = collect_tables(ds)
            rows = sorted(
                (
                    tuple(
                        (None if r.get(c) is None else r.get(c))
                        for c in ("k", "lv", "rk", "rv")
                    )
                    for r in t.to_pylist()
                ),
                key=str,
            )
            return rows

        for jt in ("inner", "left_outer"):
            want = norm(
                equi_join(left, right, on=("k",), right_on=("rk",),
                          join_type=jt, strategy="shuffle")
            )
            got = norm(
                equi_join(left, right, on=("k",), right_on=("rk",),
                          join_type=jt, strategy="skew")
            )
            assert got == want, jt
            assert len(want) > n / 2  # the hot key actually multiplied
            # round 5: force the SALTED tier (hot right subset 'too
            # big to broadcast') -- each hot left row takes one salt,
            # hot right rows replicate per salt, no driver collect
            salted = norm(
                equi_join(left, right, on=("k",), right_on=("rk",),
                          join_type=jt, strategy="skew",
                          skew_broadcast_cap=0, skew_salt_buckets=4)
            )
            assert salted == want, ("salted", jt)

    def test_skew_strategy_random_distributions(self, ray_session):
        """Property sweep: random key distributions (Zipf-ish skew,
        uniform, disjoint keys) -- strategy='skew' equals 'shuffle' on
        every draw, both join types."""
        import ray.data

        from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
            collect_tables, equi_join,
        )

        rng = np.random.RandomState(21)
        for trial in range(3):
            n = 8_000
            shape = trial % 3
            if shape == 0:  # zipf-ish: heavy head
                k = (rng.zipf(1.3, n) % 97).astype(np.int64)
            elif shape == 1:  # uniform: no hot keys at all
                k = rng.randint(0, 400, n).astype(np.int64)
            else:  # one mega key + singletons
                k = np.where(rng.rand(n) < 0.7, 5,
                             rng.randint(100, 4000, n)).astype(np.int64)
            left = ray.data.from_arrow(
                pa.table({"k": k, "lv": np.arange(n, dtype=np.int64)})
            ).repartition(6)
            rk = np.unique(
                rng.randint(0, 300, 180).astype(np.int64)
            )
            right = ray.data.from_arrow(
                pa.table({"rk": rk, "rv": rk * 3})
            ).repartition(3)

            def norm(ds):
                t = collect_tables(ds)
                if t is None:
                    return []
                return sorted(
                    (str(r.get("k")), str(r.get("lv")),
                     str(r.get("rk")), str(r.get("rv")))
                    for r in t.to_pylist()
                )

            for jt in ("inner", "left_outer"):
                want = norm(equi_join(
                    left, right, on=("k",), right_on=("rk",),
                    join_type=jt, strategy="shuffle"))
                got = norm(equi_join(
                    left, right, on=("k",), right_on=("rk",),
                    join_type=jt, strategy="skew"))
                assert got == want, (trial, shape, jt)
                salted = norm(equi_join(
                    left, right, on=("k",), right_on=("rk",),
                    join_type=jt, strategy="skew",
                    skew_broadcast_cap=0, skew_salt_buckets=3))
                assert salted == want, ("salted", trial, shape, jt)
