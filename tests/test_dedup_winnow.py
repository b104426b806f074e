"""stages/dedup.py::winnow_dedup: planted near-duplicates surface as
high-containment pairs; disjoint texts do not; output is partitioning-
invariant (fingerprint counts combine by addition)."""

from __future__ import annotations

import sys

import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture()
def docs_tbl():
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight") * 3
    near = base + " with one extra tail sentence appended here"
    other = ("completely different content about raster tiles and "
             "zonal statistics pipelines streaming through arrow") * 3
    return pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
         "text": [base, near, other, "short text"]}
    )


def test_winnow_finds_planted_pair(ray_session, docs_tbl):
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        winnow_dedup,
    )

    out = winnow_dedup(ray.data.from_arrow(docs_tbl))
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs), pairs
    ov = out["overlap"].to_pylist()[0]
    assert 0.5 <= ov <= 1.0


def test_winnow_partitioning_invariant(ray_session, docs_tbl):
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.dedup import (
        winnow_dedup,
    )

    one = winnow_dedup(ray.data.from_arrow(docs_tbl))
    many = winnow_dedup(
        ray.data.from_arrow(docs_tbl).repartition(4)
    )
    assert one.equals(many)


def test_passage_dedup_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        passage_dedup_stats,
    )

    span = "one two three four five six seven eight nine ten"
    docs = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": [span + " tail words here", span,  # doc2 dups doc1's span
                  "totally different words " * 4]}
    )
    out = passage_dedup_stats(ray.data.from_arrow(docs))
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert d[1]["n_dup"] == 0          # first occurrence keeps
    assert d[2]["n_dup"] == 1 and d[2]["dup_ratio"] == 1.0
    assert d[3]["n_dup"] == 0


def test_passage_dedup_partition_invariant(ray_session):
    import pyarrow as pa
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        passage_dedup_stats,
    )

    words = ["w%d" % (i % 30) for i in range(200)]
    docs = pa.table(
        {"doc_id": pa.array(list(range(8)), pa.int64()),
         "text": [" ".join(words[i:i + 60]) for i in range(0, 160, 20)]}
    )
    one = passage_dedup_stats(ray.data.from_arrow(docs))
    many = passage_dedup_stats(ray.data.from_arrow(docs).repartition(5))
    assert one.equals(many)
