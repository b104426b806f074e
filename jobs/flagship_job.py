#!/usr/bin/env python
"""The ``ray job submit`` entrypoint for the checkpointed flagship run.

On a real cluster:

    ray job submit --working-dir . -- python jobs/flagship_job.py \
        --input s3://bucket/pages/ --out s3://bucket/out/ --manifest s3://bucket/manifest/

Locally (this sandbox) it runs against local paths with
``ray.init(address="local")``.  The job is kill-safe: resubmitting after
a failure resumes from the per-shard lineage manifest without
recomputing completed partitions (state/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir of pages parquet shards")
    p.add_argument("--out", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--res", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime attaches to the cluster;
        # standalone falls back to a local session
        ray.init(address="auto" if "RAY_ADDRESS" in __import__("os").environ
                 and __import__("os").environ["RAY_ADDRESS"] != "local"
                 else "local",
                 ignore_reinit_error=True, logging_level="ERROR")
    from tiff_to_geojson_csv_json_format_converter_ray.context import (
        tune_data_context,
    )

    tune_data_context()

    from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
        PageExtract, add_cells,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.state.checkpoint import (
        run_resumable,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.state.metrics import (
        manifest_metrics,
    )

    res = run_resumable(
        args.input, args.out, args.manifest,
        [PageExtract(check_invariant=False),
         lambda t: add_cells(t, (args.res,))],
    )
    print(json.dumps({
        "completed_before": len(res["completed_before"]),
        "processed_now": len(res["processed_now"]),
        "total_shards": res["total_shards"],
        "metrics": manifest_metrics(res["manifest"]),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
