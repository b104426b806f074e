"""CLI: every pipeline a reference user runs today, on Ray Data.

    python -m tiff_to_geojson_csv_json_format_converter_ray convert \
        --tiles tiles.parquet --out out/ --mode sample
    ... analyze --tiles tiles.parquet
    ... zonal --tiles tiles.parquet --polygons polys.parquet [--buffer 0.001]
    ... pages --pages pages_dir/ --out out/ [--polygons polys.parquet]
    ... resume --input shards_dir/ --out out/ --manifest m/   (checkpointed)
    ... match --requested delhi_elevation --available a,b,c

Replaces the reference's script entry points (completePixleOutput.py,
willOnlyStoreValidPoints.py, doesSamples.py, thiswillcompress.py,
test.py, the zonal endpoint and layer_pattern_manager.py CLI).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tiff_to_geojson_csv_json_format_converter_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="raster tiles -> point sinks + catalog")
    c.add_argument("--tiles", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--mode", default="full",
                   choices=["full", "valid", "sample", "compress"])

    a = sub.add_parser("analyze", help="per-source metadata + master report")
    a.add_argument("--tiles", required=True)

    z = sub.add_parser("zonal", help="per-polygon zonal statistics")
    z.add_argument("--tiles", required=True)
    z.add_argument("--polygons", help="polygon parquet side table")
    z.add_argument("--geojson",
                   help="GeoJSON file (FeatureCollection/Feature/geometry/"
                        "Canvas -- the reference's 4 accepted forms)")
    z.add_argument("--mask", default="ne_nodata")
    z.add_argument("--buffer", type=float, default=0.0)
    z.add_argument("--center-fallback", action="store_true")

    g = sub.add_parser("pages", help="pages extract -> geocode -> cells -> counts")
    g.add_argument("--pages", required=True)
    g.add_argument("--polygons", default=None)
    g.add_argument("--res", type=int, default=8)

    r = sub.add_parser("resume", help="checkpointed shard run (kill-safe)")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--manifest", required=True)

    d = sub.add_parser("dedup", help="document dedup over a parquet corpus")
    d.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    d.add_argument("--method", default="exact",
                   choices=["exact", "minhash", "simhash"])
    d.add_argument("--threshold", type=float, default=0.8,
                   help="minhash signature-similarity threshold")
    d.add_argument("--max-hamming", type=int, default=3)
    d.add_argument("--out", default=None,
                   help="write {doc_id, cluster_rep} parquet here")

    pf_ = sub.add_parser(
        "profile", help="data-quality profile of a parquet table"
    )
    pf_.add_argument("--table", required=True, help="parquet path")
    pf_.add_argument("--numeric", default="", help="comma-separated cols")
    pf_.add_argument("--categorical", default="",
                     help="comma-separated cols")

    t = sub.add_parser(
        "terrain",
        help="DEM derivatives over a tile parquet (halo-exchange ops)",
    )
    t.add_argument("--tiles", required=True)
    t.add_argument("--out", required=True, help="output parquet path")
    t.add_argument(
        "--op",
        default="slope",
        choices=["slope", "curvature", "hillshade", "ruggedness",
                 "focal_mode", "flow_direction"],
    )
    t.add_argument("--stride", type=int, default=None,
                   help="tile grid stride for ragged tilings")

    tk = sub.add_parser(
        "tracks",
        help="trajectory analytics over an events parquet (per-user)",
    )
    tk.add_argument("--events", required=True)
    tk.add_argument("--out", required=True, help="output parquet path")
    tk.add_argument(
        "--op",
        default="lengths",
        choices=["lengths", "simplify", "speed", "straightness",
                 "directions"],
    )

    me = sub.add_parser(
        "media",
        help="media metadata / decode stats over a parquet of payloads",
    )
    me.add_argument("--table", required=True)
    me.add_argument(
        "--mode",
        choices=["decode", "video-metadata", "audio-metadata"],
        default="video-metadata",
    )
    me.add_argument("--decoder", choices=["real", "fake"], default="real")
    me.add_argument("--out", default=None, help="optional parquet output")

    m = sub.add_parser("match", help="fuzzy layer-name matching")
    m.add_argument("--requested", required=True)
    m.add_argument("--available", required=True, help="comma-separated")
    m.add_argument("--config", default=None)

    # pattern-config management (layer_pattern_manager.py:57-114 CLI)
    pc = sub.add_parser("patterns", help="manage layer-pattern config")
    pc.add_argument("--config", required=True, help="JSON config path")
    psub = pc.add_subparsers(dest="pcmd", required=True)
    pa_ = psub.add_parser("add", help="add category.term -> matches")
    pa_.add_argument("--category", required=True)
    pa_.add_argument("--term", required=True)
    pa_.add_argument("--matches", required=True, help="comma-separated")
    pr = psub.add_parser("remove", help="remove category.term")
    pr.add_argument("--category", required=True)
    pr.add_argument("--term", required=True)
    pl = psub.add_parser("list", help="list patterns")
    pl.add_argument("--category", default=None)
    pt = psub.add_parser("test", help="dry-run a match against the config")
    pt.add_argument("--requested", required=True)
    pt.add_argument("--available", required=True, help="comma-separated")
    pf = psub.add_parser("add-fallback")
    pf.add_argument("--pattern", required=True)
    pg = psub.add_parser("remove-fallback")
    pg.add_argument("--pattern", required=True)

    args = p.parse_args(argv)

    if args.cmd == "match":  # driver-side, no Ray needed
        from .functions.match import find_layer_by_patterns, load_config

        out = find_layer_by_patterns(
            args.requested, args.available.split(","), load_config(args.config)
        )
        print(json.dumps({"requested": args.requested, "matched": out}))
        return 0

    if args.cmd == "patterns":  # driver-side, no Ray needed
        from .functions import match as M

        cfg = M.load_config(args.config)
        if args.pcmd == "add":
            M.add_pattern(cfg, args.category, args.term, args.matches.split(","))
            M.save_config(cfg, args.config)
            print(json.dumps({"added": f"{args.category}.{args.term}"}))
        elif args.pcmd == "remove":
            ok = M.remove_pattern(cfg, args.category, args.term)
            if ok:
                M.save_config(cfg, args.config)
            print(json.dumps(
                {"removed": f"{args.category}.{args.term}", "found": ok}
            ))
            return 0 if ok else 1
        elif args.pcmd == "list":
            print(json.dumps(M.list_patterns(cfg, args.category)))
        elif args.pcmd == "test":
            out = M.find_layer_by_patterns(
                args.requested, args.available.split(","), cfg
            )
            print(json.dumps({"requested": args.requested, "matched": out}))
        elif args.pcmd == "add-fallback":
            M.add_fallback(cfg, args.pattern)
            M.save_config(cfg, args.config)
            print(json.dumps({"fallback_patterns": cfg["fallback_patterns"]}))
        elif args.pcmd == "remove-fallback":
            ok = M.remove_fallback(cfg, args.pattern)
            if ok:
                M.save_config(cfg, args.config)
            print(json.dumps({"fallback_patterns": cfg["fallback_patterns"],
                              "found": ok}))
            return 0 if ok else 1
        return 0

    from .context import init_local_ray

    owns_session = init_local_ray(args.num_cpus)
    try:
        if args.cmd == "profile":
            from .pipelines.relational import profile_columns
            from .sources.reader import read_parquet_auto

            num = [c for c in args.numeric.split(",") if c]
            cat = [c for c in args.categorical.split(",") if c]
            cols = num + cat
            ds = read_parquet_auto(args.table, columns=cols or None)
            out = profile_columns(ds, num, cat)
            rows = [
                {
                    k: (None if isinstance(v, float) and v != v else v)
                    for k, v in r.items()
                }
                for r in out.to_pylist()
            ]
            print(json.dumps({"table": args.table, "profile": rows}))
        elif args.cmd == "media":
            from .pipelines.relational import collect_tables
            from .sources.reader import read_parquet_auto
            from .stages.multimodal import (
                AudioMetadata, MediaDecode, MediaMetadata,
            )

            stage = {
                "decode": MediaDecode(decoder=args.decoder),
                "video-metadata": MediaMetadata(),
                "audio-metadata": AudioMetadata(),
            }[args.mode]
            ds = read_parquet_auto(args.table)
            out_ds = ds.map_batches(
                stage, batch_format="pyarrow", batch_size=None
            )
            if args.out:
                out_ds.write_parquet(args.out)
                print(json.dumps({"mode": args.mode, "out": args.out}))
            else:
                tbl = collect_tables(out_ds)
                rows = tbl.to_pylist() if tbl is not None else []
                print(json.dumps(
                    {"mode": args.mode, "rows": len(rows),
                     "sample": rows[:3]}, default=str,
                ))
        elif args.cmd == "convert":
            from .pipelines.convert import convert

            res = convert(args.tiles, args.out, mode=args.mode)
            res.pop("manifests", None)
            print(json.dumps(res))
        elif args.cmd == "analyze":
            from .pipelines.analyze import analyze, master_report

            t = analyze(args.tiles)
            print(master_report(t))
        elif args.cmd == "zonal":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from .pipelines.zonal import zonal_stats

            if args.geojson:
                from pathlib import Path

                from .functions.geometry import parse_geojson

                polys = parse_geojson(Path(args.geojson).read_text())
                rows = []
                for p in polys:
                    rows.append(
                        {
                            "polygon_id": p.polygon_id,
                            "geom_type": "Polygon",
                            "rings": [r.tolist() for r in p.rings],
                            "minx": p.bbox[0], "miny": p.bbox[1],
                            "maxx": p.bbox[2], "maxy": p.bbox[3],
                        }
                    )
                polygons = pa.Table.from_pylist(rows)
            elif args.polygons:
                polygons = pq.read_table(args.polygons)
            else:
                p.error("zonal requires --polygons or --geojson")
            out = zonal_stats(
                args.tiles, polygons,
                mask_strategy=args.mask, buffer=args.buffer,
                center_fallback=args.center_fallback,
            )
            print(json.dumps(out.to_pylist(), default=str))
        elif args.cmd == "pages":
            import pyarrow.parquet as pq

            from .pipelines.pages import pages_flagship

            polys = pq.read_table(args.polygons) if args.polygons else None
            out = pages_flagship(args.pages, polygons=polys, res=args.res)
            print(
                json.dumps(
                    {k: v.num_rows for k, v in out.items()}
                    | {"top_cells": sorted(
                        out["cell_counts"].to_pylist(),
                        key=lambda r: (-r["count"], r[f"cell_{args.res}"]),
                    )[:5]}
                )
            )
        elif args.cmd == "tracks":
            import ray.data

            from .pipelines import tracks as T
            from .sources.reader import read_parquet_auto

            ops = {
                "lengths": (T.track_lengths_ds,
                            ["event_id", "user_id", "ts"]),
                "simplify": (T.track_simplify_ds,
                             ["event_id", "user_id", "ts"]),
                "speed": (T.track_speed_stats_ds,
                          ["event_id", "user_id", "ts"]),
                "straightness": (T.track_straightness_ds,
                                 ["event_id", "user_id", "ts"]),
                "directions": (T.movement_directions_ds,
                               ["event_id", "user_id", "ts"]),
            }
            fn, cols = ops[args.op]
            ds = read_parquet_auto(args.events, columns=cols)
            fn(ds).write_parquet(args.out)
            n = ray.data.read_parquet(args.out).count()
            print(json.dumps(
                {"op": args.op, "events": args.events, "out": args.out,
                 "rows": n}
            ))
        elif args.cmd == "terrain":
            import ray.data

            from .sources.reader import read_parquet_auto
            from .stages import raster as R

            ops = {
                "slope": R.tile_slope,
                "curvature": R.tile_curvature,
                "hillshade": R.tile_hillshade,
                "ruggedness": R.tile_ruggedness,
                "focal_mode": R.tile_focal_mode,
                "flow_direction": R.tile_flow_direction,
            }
            ds = read_parquet_auto(args.tiles)
            out = ops[args.op](ds, stride=args.stride)
            out.write_parquet(args.out)
            n = ray.data.read_parquet(args.out).count()
            print(json.dumps(
                {"op": args.op, "tiles": args.tiles, "out": args.out,
                 "rows": n}
            ))
        elif args.cmd == "dedup":
            import pyarrow.parquet as pq
            import ray.data

            from .stages import dedup as D

            ds = ray.data.read_parquet(args.docs)
            if args.method == "exact":
                reps = D.exact_dedup_representatives(ds, "text", "doc_id")
                n_total = ds.count()
                print(json.dumps(
                    {"method": "exact", "rows": n_total,
                     "distinct": reps.num_rows,
                     "duplicates_removed": n_total - reps.num_rows}
                ))
                out_tbl = reps
            elif args.method == "minhash":
                out_tbl = D.minhash_lsh_dedup(
                    ds, sim_threshold=args.threshold
                )
                print(json.dumps(
                    {"method": "minhash", "near_dup_docs": out_tbl.num_rows,
                     "clusters": len(set(out_tbl["cluster_rep"].to_pylist()))}
                ))
            else:
                out_tbl = D.simhash_dedup(ds, max_hamming=args.max_hamming)
                print(json.dumps(
                    {"method": "simhash", "near_dup_docs": out_tbl.num_rows,
                     "clusters": len(set(out_tbl["cluster_rep"].to_pylist()))}
                ))
            if args.out:
                pq.write_table(out_tbl, args.out)
        elif args.cmd == "resume":
            from .stages.extract import PageExtract, add_cells
            from .state.checkpoint import run_resumable

            res = run_resumable(
                args.input, args.out, args.manifest,
                [PageExtract(check_invariant=False), lambda t: add_cells(t, (8,))],
            )
            res.pop("manifest", None)
            print(json.dumps(res))
    finally:
        # only tear down a session THIS invocation started: killing a
        # caller-owned cluster (pytest's session fixture, a driver)
        # forces a racy mid-process re-init (context.init_local_ray)
        if owns_session:
            import ray

            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
