#!/usr/bin/env python
"""``ray job submit`` entrypoint for a CHECKPOINTED zonal-statistics
run over a directory of GeoTIFFs.

Per shard (= one ``.tif``): decode through the from-scratch codec ->
pixel pivot -> PIP clip against the broadcast polygon table ->
validity mask -> ALGEBRAIC partials per (polygon_id, band)
(count/sum/sumsq/min/max) written atomically with a lineage manifest
(state/checkpoint.py -- same kill-and-resume contract as the pages
flagship job).  The final combine reads only the tiny partial
parquets and exactly finalizes mean/std, so a killed run resumes
without recomputing completed rasters and the driver never holds
pixels.

    python jobs/zonal_job.py --input tifs/ --polygons polys.parquet \
        --out out/ --manifest mani/
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="dir of .tif files")
    p.add_argument("--polygons", required=True, help="polygon parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args()

    import os

    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if os.environ.get("RAY_ADDRESS", "local")
                 != "local" else "local",
                 ignore_reinit_error=True, logging_level="ERROR")
    from tiff_to_geojson_csv_json_format_converter_ray.context import (
        tune_data_context,
    )

    tune_data_context()

    import pyarrow as pa

    from tiff_to_geojson_csv_json_format_converter_ray.sources.geotiff import (
        geotiff_to_tiles,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.extract import (
        TilePivot, master_widths_of,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.joins import (
        PIPJoiner, broadcast_table,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.stats import (
        finalize_stats, partial_stats_batch,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.transform import (
        ValidityFilter,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.state.checkpoint import (
        run_resumable,
    )

    polys_ref = broadcast_table(pq.read_table(args.polygons))
    tile = args.tile

    def tif_reader(path: str) -> pa.Table:
        with open(path, "rb") as f:
            return geotiff_to_tiles(
                f.read(), src=Path(path).stem, tile=tile, band=None
            )

    def pivot_stage(tiles: pa.Table) -> pa.Table:
        # per-shard pivot: the shard IS one raster, so its own widths
        # feed the pixel index (stats never read pix)
        pv = TilePivot(
            round_output=False, reproject=True,
            master_widths=master_widths_of(tiles),
        )
        return pv(tiles)

    stages = [
        pivot_stage,
        PIPJoiner(polys_ref),
        ValidityFilter("ne_nodata"),
        lambda t: partial_stats_batch(t, ["polygon_id", "band"]),
    ]
    res = run_resumable(
        args.input, args.out, args.manifest, stages,
        reader=tif_reader, pattern="*.tif",
    )

    # final combine: DISTRIBUTED parquet read over the partial files
    # (pyarrow dataset discovery skips the underscore-prefixed final
    # from a rerun) + one grouped aggregate with combine_tier='auto':
    # above the partial-row threshold the combine shuffles and the
    # driver only ever holds the (polygons x bands)-bounded result
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, hash_aggregate,
    )

    part_files = [
        str(f) for f in sorted(Path(args.out).glob("*.parquet"))
        if not f.name.startswith("_")
    ]
    final = pa.table({"polygon_id": [], "band": []})
    if part_files:
        pds = ray.data.read_parquet(part_files)
        combined = hash_aggregate(
            pds, ["polygon_id", "band"],
            [("n", "sum", "count"), ("s", "sum", "sum"),
             ("s2", "sum", "sumsq"), ("mn", "min", "min"),
             ("mx", "max", "max")],
            combine_tier="auto",
        )
        if combined.num_rows:
            import pyarrow.compute as pc

            final = finalize_stats(combined)
            # deterministic output order: a resumed rerun must be
            # byte-identical to the unkilled run
            final = final.take(pc.sort_indices(
                final,
                sort_keys=[("polygon_id", "ascending"),
                           ("band", "ascending")],
            ))
    final_path = str(Path(args.out) / "_zonal_stats_final.parquet")
    pq.write_table(final, final_path)
    print(json.dumps({
        "completed_before": len(res["completed_before"]),
        "processed_now": len(res["processed_now"]),
        "total_shards": res["total_shards"],
        "zonal_rows": final.num_rows,
        "final": final_path,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
