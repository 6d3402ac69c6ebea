"""CLI entry point: ``python -m planetiler_ray <cmd> ...``.

The analog of the reference's ``Planetiler.create(args)...run()`` main
(``Planetiler.java:791-996``), Ray-Data-flavored.  Owns the Ray session
(guarded init) — library code never calls ``ray.init``.

Commands:

  synth     --n 10000 --out /tmp/images [--bytes]     # fixture image table
  build     --input DIR --out DIR [--min-zoom 0] [--max-zoom 14]
            [--partitions 64] [--format parquet|files|csv|archive]
            (re-running with the same --checkpoint dir resumes)
  join      --input DIR --out DIR [--zoom 14] [--partitions 64]
  osm       --pbf FILE --profile YAML --out DIR       # OSM → tile archive
  validate  --spec YAML                               # schema example runner
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_synth(args) -> dict:
    from .fixtures import images_parquet

    path = images_parquet(args.n, with_bytes=args.bytes)
    return {"path": path, "n": args.n}


def _read_images(input_dir: str):
    import ray.data

    return ray.data.read_parquet(input_dir,
                                 columns=["image_id", "caption", "phash"])


def _input_ids(input_dir: str, max_sample: int = 4000):
    import numpy as np
    import pyarrow.dataset as pads

    ids = pads.dataset(input_dir).to_table(columns=["image_id"])["image_id"]
    ids = ids.to_numpy(zero_copy_only=False)
    step = max(1, len(ids) // max_sample)
    return np.asarray(ids[::step])


def cmd_build(args) -> dict:
    from .pipelines.tiles import build_pyramid
    from .stages.render import RenderConfig

    _init_ray(args.num_cpus)
    t0 = time.monotonic()
    cfg = RenderConfig(min_zoom=args.min_zoom, max_zoom=args.max_zoom)
    images = _read_images(args.input)
    ids = _input_ids(args.input)
    # fail-fast resource plan before committing to the run
    # (Planetiler.java:998-1065 checkDiskSpace/checkMemory analog)
    from .state.estimate import estimate_pyramid
    est = estimate_pyramid(images, cfg, num_partitions=args.partitions)
    est.check_against_limits(force=getattr(args, "force", False))
    for w in est.warnings:
        print(f"[estimate] WARNING: {w}", file=sys.stderr)
    if args.format == "parquet":
        summary = build_pyramid(images, ids, cfg, num_partitions=args.partitions,
                                checkpoint_dir=args.out,
                                with_feature_ids=not args.slim)
        out = dict(summary)
    else:
        tiles = build_pyramid(images, ids, cfg, num_partitions=args.partitions,
                              with_feature_ids=not args.slim)
        from . import sinks
        if args.format == "files":
            n = sinks.write_files(tiles, args.out)
            out = {"n_tiles": n}
        elif args.format == "csv":
            out = {"n_tiles": sinks.write_csv(tiles, args.out)}
        elif args.format == "archive":
            out = sinks.write_archive(tiles, args.out)
        else:
            raise SystemExit(f"unknown format {args.format}")
    out["wall_sec"] = round(time.monotonic() - t0, 2)
    return out


def cmd_osm(args) -> dict:
    """OSM PBF + YAML profile → tile archive — the reference's main
    ``Planetiler.create(args)...run()`` flow."""
    import numpy as np
    import pyarrow as pa

    _init_ray(args.num_cpus)
    t0 = time.monotonic()
    from .config import osm_rules_from_yaml
    from .pipelines.osm import build_osm_tiles
    from .sources.osmpbf import read_osm_nodes, read_osm_ways

    rules = osm_rules_from_yaml(args.profile)
    tiles = build_osm_tiles(read_osm_nodes(args.input),
                            read_osm_ways(args.input), rules,
                            min_zoom=args.min_zoom, max_zoom=args.max_zoom,
                            num_partitions=args.partitions)

    def add_hilbert(batch: pa.Table) -> pa.Table:
        from .tilemath.tilecoord import hilbert_encode_tiles
        hil = hilbert_encode_tiles(batch["x"].to_numpy().astype(np.int64),
                                   batch["y"].to_numpy().astype(np.int64),
                                   batch["z"].to_numpy().astype(np.int64))
        return batch.append_column("hilbert_id", pa.array(hil))

    tiles = tiles.map_batches(add_hilbert, batch_format="pyarrow")
    if args.format == "pmtiles":
        from .sinks_pmtiles import write_pmtiles
        out = write_pmtiles(tiles, args.out, min_zoom=args.min_zoom,
                            max_zoom=args.max_zoom)
    elif args.format == "mbtiles":
        from .sinks_mbtiles import write_mbtiles
        out = write_mbtiles(tiles, args.out)
    else:
        from . import sinks
        out = {"n_tiles": sinks.write_files(tiles, args.out)}
    out = dict(out)
    out["wall_sec"] = round(time.monotonic() - t0, 2)
    return out


def cmd_validate(args) -> dict:
    from .validator import run_spec

    results = run_spec(args.spec)
    n_fail = sum(1 for r in results if not r["ok"])
    return {"n_examples": len(results), "n_failed": n_fail,
            "failures": [r for r in results if not r["ok"]]}


def cmd_join(args) -> dict:
    from .pipelines.tiles import spatial_join

    _init_ray(args.num_cpus)
    t0 = time.monotonic()
    join = spatial_join(_read_images(args.input), _input_ids(args.input),
                        num_partitions=args.partitions, zoom=args.zoom)
    join.write_parquet(args.out)
    return {"out": args.out, "wall_sec": round(time.monotonic() - t0, 2)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="planetiler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="generate the deterministic image fixture table")
    ps.add_argument("--n", type=int, default=10000)
    ps.add_argument("--bytes", action="store_true", help="include encoded pixel bytes")
    ps.add_argument("--out", default=None, help="(cache dir is fixed under /tmp)")
    ps.set_defaults(fn=cmd_synth)

    pb = sub.add_parser("build", help="build the tile pyramid")
    pb.add_argument("--input", required=True)
    pb.add_argument("--out", required=True)
    pb.add_argument("--min-zoom", type=int, default=0)
    pb.add_argument("--max-zoom", type=int, default=14)
    pb.add_argument("--partitions", type=int, default=64)
    pb.add_argument("--format", default="parquet",
                    choices=["parquet", "files", "csv", "archive"])
    pb.add_argument("--slim", action="store_true", help="skip feature-id lists")
    pb.add_argument("--num-cpus", type=int, default=None)
    pb.add_argument("--force", action="store_true",
                    help="run even if the upfront resource estimate "
                         "exceeds capacity (downgrades the fail-fast "
                         "check to warnings, like the reference)")
    pb.set_defaults(fn=cmd_build)

    po = sub.add_parser("osm", help="OSM PBF + YAML profile → tile archive")
    po.add_argument("--input", required=True, help="path to .osm.pbf")
    po.add_argument("--profile", required=True, help="YAML layer rules")
    po.add_argument("--out", required=True)
    po.add_argument("--min-zoom", type=int, default=0)
    po.add_argument("--max-zoom", type=int, default=14)
    po.add_argument("--partitions", type=int, default=64)
    po.add_argument("--format", default="pmtiles",
                    choices=["pmtiles", "mbtiles", "files"])
    po.add_argument("--num-cpus", type=int, default=None)
    po.set_defaults(fn=cmd_osm)

    pv = sub.add_parser("validate", help="run a YAML schema spec (profile --tests analog)")
    pv.add_argument("--spec", required=True)
    pv.set_defaults(fn=cmd_validate)

    pj = sub.add_parser("join", help="z-level spatial join + kNN captions")
    pj.add_argument("--input", required=True)
    pj.add_argument("--out", required=True)
    pj.add_argument("--zoom", type=int, default=14)
    pj.add_argument("--partitions", type=int, default=64)
    pj.add_argument("--num-cpus", type=int, default=None)
    pj.set_defaults(fn=cmd_join)

    args = p.parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()
    # schema-spec failures must fail the process (CI gates on exit code)
    return 1 if result.get("n_failed") else 0


if __name__ == "__main__":
    sys.exit(main())
