"""Kill-and-resume tests (FIXTURES.md F5: 'kill mid-run -> completed
cells not recomputed; final outputs identical')."""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import gen_pages
from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
    PageExtract, add_cells,
)
from tiff_to_geojson_csv_json_format_converter_ray.state.checkpoint import (
    ManifestStore, run_resumable,
)


def _write_shards(dir_: Path, n_shards: int = 6, rows_per: int = 120):
    dir_.mkdir(parents=True, exist_ok=True)
    pages = gen_pages(n_shards * rows_per)
    for i in range(n_shards):
        pq.write_table(
            pages.slice(i * rows_per, rows_per), dir_ / f"shard{i}.parquet"
        )


STAGES = [PageExtract(check_invariant=True), lambda t: add_cells(t, (8,))]


def _sid(filename: str) -> str:
    """Path-derived shard id (mirrors checkpoint.enumerate_shards)."""
    stem = Path(filename).stem
    return f"{stem}_{hashlib.sha1(filename.encode()).hexdigest()[:8]}"


class TestResume:
    def test_clean_run_manifests(self, ray_session, tmp_path):
        _write_shards(tmp_path / "in")
        res = run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES,
        )
        assert len(res["processed_now"]) == 6
        assert res["completed_before"] == []
        m = res["manifest"]
        assert len(m) == 6
        for row in m.values():
            assert row["row_count"] == 120
            assert row["cell_min"] is not None
            assert Path(row["output_path"]).exists()
            assert row["input_blocks"][0].endswith(".parquet")

    def test_kill_then_resume_skips_completed(self, ray_session, tmp_path):
        _write_shards(tmp_path / "in")
        # first run crashes on shard 4 (after others may have completed)
        with pytest.raises(Exception):
            run_resumable(
                str(tmp_path / "in"), str(tmp_path / "out"),
                str(tmp_path / "manifest"), STAGES,
                fail_on={_sid("shard4.parquet")},
            )
        store = ManifestStore(str(tmp_path / "manifest"))
        done_after_crash = set(store.completed())
        assert _sid("shard4.parquet") not in done_after_crash

        # capture mtimes of completed fragments
        mtimes = {
            pid: os.path.getmtime(row["output_path"])
            for pid, row in store.completed().items()
        }

        # resume: completes the rest without touching finished fragments
        res = run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES,
        )
        assert set(res["completed_before"]) == done_after_crash
        assert set(res["processed_now"]) == (
            {_sid(f"shard{i}.parquet") for i in range(6)} - done_after_crash
        )
        for pid, old_mtime in mtimes.items():
            assert os.path.getmtime(store.completed()[pid]["output_path"]) == old_mtime

        # final outputs identical to an uninterrupted run
        clean = tmp_path / "clean"
        run_resumable(
            str(tmp_path / "in"), str(clean / "out"),
            str(clean / "manifest"), STAGES,
        )
        got = pq.read_table(str(tmp_path / "out")).to_pandas()
        want = pq.read_table(str(clean / "out")).to_pandas()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        want = want[cols].sort_values(cols, kind="stable").reset_index(drop=True)
        assert got.equals(want)

    def test_rerun_noop(self, ray_session, tmp_path):
        _write_shards(tmp_path / "in", n_shards=3)
        run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES,
        )
        res2 = run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES,
        )
        assert res2["processed_now"] == []
        assert len(res2["completed_before"]) == 3

    def test_ids_stable_when_files_added(self, ray_session, tmp_path):
        """ADVICE r1: adding a file between a kill and a resume must not
        shift the ids of already-completed shards (path-derived ids,
        not enumeration order)."""
        from tiff_to_geojson_csv_json_format_converter_ray.sources.synthetic import (
            gen_pages,
        )

        _write_shards(tmp_path / "in", n_shards=3)
        run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES,
        )
        store = ManifestStore(str(tmp_path / "manifest"))
        mtimes = {
            pid: os.path.getmtime(row["output_path"])
            for pid, row in store.completed().items()
        }
        # new file that sorts FIRST — would have shifted every ordinal id
        pq.write_table(gen_pages(50), tmp_path / "in" / "aaa_late.parquet")
        res = run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES,
        )
        assert res["processed_now"] == [_sid("aaa_late.parquet")]
        for pid, old in mtimes.items():
            assert os.path.getmtime(store.completed()[pid]["output_path"]) == old
        # exactly one output fragment per input file, no duplicates
        frags = sorted(p.name for p in (tmp_path / "out").glob("*.parquet"))
        assert len(frags) == 4

    def test_torn_manifest_ignored(self, tmp_path):
        store = ManifestStore(str(tmp_path / "m"))
        store.record({"partition_id": "ok", "row_count": 1})
        (tmp_path / "m" / f"bad{'' }.manifest.json").write_text("{truncated")
        assert set(store.completed()) == {"ok"}


class TestMarkerCommitMode:
    """Rename-free object-store protocol (VERDICT r1 item 10): PUT data
    object, PUT .ok marker strictly after; readers gate on the marker."""

    def test_no_rename_ever_called(self, tmp_path, monkeypatch):
        import pathlib

        def forbid(self, *a, **k):  # simulated S3: rename does not exist
            raise AssertionError(f"rename called on {self}")

        monkeypatch.setattr(pathlib.Path, "rename", forbid)
        store = ManifestStore(str(tmp_path / "m"), commit_mode="marker")
        store.record({"partition_id": "p1", "row_count": 7})
        assert store.completed()["p1"]["row_count"] == 7

        import pyarrow as pa

        from tiff_to_geojson_csv_json_format_converter_ray.state.checkpoint import (
            _atomic_write_parquet,
        )

        out = tmp_path / "frag.parquet"
        _atomic_write_parquet(pa.table({"x": [1, 2]}), out, "marker")
        assert out.exists() and (tmp_path / "frag.parquet.ok").exists()

    def test_data_without_marker_is_incomplete(self, tmp_path):
        store = ManifestStore(str(tmp_path / "m"), commit_mode="marker")
        store.record({"partition_id": "done", "row_count": 1})
        # crash between the data PUT and the marker PUT
        (tmp_path / "m" / "crashed.manifest.json").write_text(
            '{"partition_id": "crashed", "row_count": 1}'
        )
        assert set(store.completed()) == {"done"}

    def test_kill_and_resume_marker_mode(self, ray_session, tmp_path):
        _write_shards(tmp_path / "in", n_shards=4)
        with pytest.raises(Exception):
            run_resumable(
                str(tmp_path / "in"), str(tmp_path / "out"),
                str(tmp_path / "manifest"), STAGES,
                fail_on={_sid("shard2.parquet")}, commit_mode="marker",
            )
        res = run_resumable(
            str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "manifest"), STAGES, commit_mode="marker",
        )
        assert len(res["completed_before"]) + len(res["processed_now"]) == 4
        assert len(res["manifest"]) == 4
        for row in res["manifest"].values():
            assert Path(row["output_path"] + ".ok").exists()
