"""The flagship pipelines: full tile-pyramid build and the z14 spatial join.

Dataflow (SURVEY.md §7.0) — pure ``ray.data``, Arrow batches throughout:

    read_parquet(images, columns=[no bytes!])        # prune at the read
      └─ map_batches(georef_batch)                   # world-mercator footprints
      └─ map_batches(render_fanout)                  # z0..z14 fan-out → fragments
      └─ groupby("part")                             # explicit Hilbert range shuffle
      └─ map_groups(reduce_partition)                # per-tile merge + encode
      └─ write (checkpointed parquet per partition) or return Dataset

Partition bounds are equal-frequency quantiles of Hilbert fragment keys
computed from a deterministic driver-side sample of the input ids —
skewed (city-hotspot) key ranges automatically get narrow partitions.
The per-partition reduce is restartable: with a ``CheckpointStore``,
completed partitions are filtered out BEFORE the shuffle on resume.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import pyarrow as pa

import ray.data

from ..fixtures import georef_from_ids
from ..stages.exchange import exchange_reduce
from ..stages.georef import georef_batch
from ..stages.render import RenderConfig, compute_partition_bounds, render_fanout
from ..stages.reduce import reduce_partition
from ..state.checkpoint import CheckpointStore
from ..tilemath.hashing import fnv1a_64_u64


def sample_partition_bounds(sample_ids: np.ndarray, cfg: RenderConfig,
                            num_partitions: int) -> np.ndarray:
    """Driver-side bounds estimation from a sample of image ids.

    Renders the sample's fan-out in-process (pure numpy, no Ray) and
    takes equal-count quantiles of the resulting Hilbert keys — the
    same sample-then-range-partition approach Ray's own sort uses, but
    on the *post-fanout* key distribution so the skew of dense tiles
    is measured where it matters.
    """
    g = georef_from_ids(sample_ids)
    tbl = pa.table({
        "image_id": pa.array(np.asarray(sample_ids).tolist(), pa.string()),
        "idx": g["idx"], "cx": g["cx"], "cy": g["cy"], "hw": g["hw"], "hh": g["hh"],
    })
    frags = render_fanout(tbl, cfg)
    return compute_partition_bounds(frags["hilbert_id"].to_numpy(), num_partitions)


def render_fragments(images: "ray.data.Dataset", cfg: RenderConfig,
                     bounds: np.ndarray, slim: bool = False,
                     profile=None) -> "ray.data.Dataset":
    """images → georef → [profile.process_features] → fan-out fragments."""
    ds = images.map_batches(georef_batch, batch_format="pyarrow")
    if profile is not None:
        ds = ds.map_batches(profile.process_features, batch_format="pyarrow")
    fanout = partial(render_fanout, cfg=cfg, part_bounds=bounds, slim=slim)
    # fan-out multiplies rows ~20×; keep input batches moderate
    return ds.map_batches(fanout, batch_format="pyarrow", batch_size=8192)


class CheckpointedReduceFn:
    """Exchange reduce_fn wrapper: reduce + atomically persist one partition.

    Generic over the inner reduce (pyramid tile reduce, join reduce, …);
    the fingerprint hashes the ``content_hash`` column when present,
    else the row count — recorded in the per-partition lineage.
    """

    def __init__(self, store_root: str, reduce_fn):
        self.store = CheckpointStore(store_root)
        self.reduce_fn = reduce_fn

    def __call__(self, group: pa.Table, part: int) -> pa.Table:
        t0 = time.monotonic()
        out = self.reduce_fn(group)
        if "content_hash" in out.column_names and out.num_rows:
            hashes = out["content_hash"].to_numpy().view(np.uint64)
            fp = int(np.bitwise_xor.reduce(fnv1a_64_u64(hashes)))
        else:
            fp = out.num_rows
        lineage = self.store.write_partition(part, out, group.num_rows,
                                             time.monotonic() - t0, fp)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "n_tiles": pa.array([lineage["n_tiles"]], pa.int64()),
                         "n_fragments": pa.array([lineage["n_fragments"]], pa.int64())})


def checkpointed_exchange(frags, num_partitions: int, reduce_fn,
                          checkpoint_dir: str, extra_manifest: dict | None = None,
                          run_config: dict | None = None):
    """Run the exchange with per-partition checkpointing + resume.

    Completed partitions (lineage present) are skipped BEFORE the
    shuffle; returns the finalized manifest summary.  ``run_config``
    (bounds, partition count, input fingerprint) is recorded on first
    run — resuming with a different configuration is refused.
    """
    store = CheckpointStore(checkpoint_dir)
    if run_config is not None:
        store.check_run_config(run_config)
    done = store.completed_parts()
    parts_to_run = np.array([p for p in range(num_partitions) if p not in done],
                            dtype=np.int64)
    if len(parts_to_run):
        reducer = CheckpointedReduceFn(checkpoint_dir, reduce_fn)
        metrics = exchange_reduce(frags, num_partitions, reducer,
                                  parts_to_run=parts_to_run, pass_part=True)
        metrics.materialize()  # drive execution; tiny (one row per partition)
    return store.finalize({"num_partitions": num_partitions,
                           "resumed_parts": len(done), **(extra_manifest or {})})


def build_pyramid(images: "ray.data.Dataset", sample_ids: np.ndarray,
                  cfg: RenderConfig | None = None, num_partitions: int = 64,
                  checkpoint_dir: str | None = None,
                  with_feature_ids: bool = True,
                  shuffle: str = "exchange", profile=None,
                  bounds: np.ndarray | None = None):
    """Build the z0..max_zoom tile pyramid.

    Without ``checkpoint_dir``: returns a lazy ``Dataset`` of tile rows
    (tile_id, hilbert_id, z, x, y, n_features, content_hash,
    [feature_ids], tile_bytes).

    With ``checkpoint_dir``: runs the checkpointed, resumable variant —
    each partition writes its own parquet + lineage; returns the
    manifest summary dict.  Re-running with the same dir skips
    completed partitions before the shuffle.

    ``shuffle``: "exchange" (default; explicit map-side partition
    exchange on the precomputed Hilbert ranges — see stages/exchange.py)
    or "groupby" (pure Dataset ``groupby(part).map_groups``; same
    results, used as a cross-check in tests).
    """
    cfg = cfg or RenderConfig()
    if bounds is None:
        bounds = sample_partition_bounds(sample_ids, cfg, num_partitions)
    tpp = getattr(profile, "post_process_tile", None) if profile is not None else None
    reduce_fn = partial(reduce_partition, with_feature_ids=with_feature_ids,
                        tile_post_process=tpp,
                        skip_filled_tiles=cfg.skip_filled_tiles,
                        max_point_buffer=cfg.max_point_buffer)

    if checkpoint_dir is None:
        frags = render_fragments(images, cfg, bounds, slim=not with_feature_ids,
                                 profile=profile)
        if shuffle == "groupby":
            return frags.groupby("part").map_groups(reduce_fn, batch_format="pyarrow")
        return exchange_reduce(frags, num_partitions, reduce_fn)

    frags = render_fragments(images, cfg, bounds, slim=not with_feature_ids,
                             profile=profile)
    return checkpointed_exchange(frags, num_partitions, reduce_fn,
                                 checkpoint_dir,
                                 run_config=_run_config("pyramid", bounds,
                                                        num_partitions, cfg,
                                                        sample_ids))


def _run_config(kind: str, bounds: np.ndarray, num_partitions: int,
                cfg: "RenderConfig", sample_ids: np.ndarray) -> dict:
    """Resume-guard fingerprint: partition bounds + count + an input-id
    hash, recorded in the checkpoint store (ADVICE: refuse to resume a
    checkpoint written by a different run configuration)."""
    from ..tilemath.hashing import fnv1a_64_strings

    ids = np.asarray(sample_ids)
    fp = int(np.bitwise_xor.reduce(fnv1a_64_strings(ids.astype("U")))) \
        if len(ids) else 0
    return {"kind": kind, "num_partitions": num_partitions,
            "bounds": bounds.tolist(),
            "zooms": [cfg.min_zoom, cfg.max_zoom],
            "input_fp": fp, "n_sample": int(len(ids))}


def read_pyramid(checkpoint_dir: str) -> "ray.data.Dataset":
    """Read a checkpointed pyramid back as a Dataset."""
    return ray.data.read_parquet(CheckpointStore(checkpoint_dir).data_files())


# ---------------------------------------------------------------------------
# z14 spatial join: chip footprint × tile polygons + per-tile kNN captions
# ---------------------------------------------------------------------------

def _join_reduce(group: pa.Table, k: int = 3) -> pa.Table:
    """Per-tile: footprint-intersection rows + kNN caption ranks.

    For each tile, rank the chips whose footprint intersects the tile
    (+buffer) by Euclidean distance (world mercator) of chip centroid to
    the tile center; ties broken by image_id ascending
    (FIXTURES.md §3).  ``knn_rank`` = 1..k for the k nearest, else 0.
    """
    if group.num_rows == 0:
        return pa.table({"tile_id": pa.array([], pa.int64()),
                         "z": pa.array([], pa.int8()),
                         "x": pa.array([], pa.int32()), "y": pa.array([], pa.int32()),
                         "image_id": pa.array([], pa.string()),
                         "caption": pa.array([], pa.string()),
                         "knn_rank": pa.array([], pa.int8())})
    tile = group["tile_id"].to_numpy()
    z = group["z"].to_numpy()
    x = group["x"].to_numpy()
    y = group["y"].to_numpy()
    cx = group["cx"].to_numpy()
    cy = group["cy"].to_numpy()
    image_id = group["image_id"].to_numpy(zero_copy_only=False)

    inv = np.ldexp(1.0, -z.astype(np.int64))
    tcx = (x.astype(np.float64) + 0.5) * inv
    tcy = (y.astype(np.float64) + 0.5) * inv
    dist = np.hypot(cx - tcx, cy - tcy)

    order = np.lexsort((image_id, dist, tile))
    ts = tile[order]
    change = np.empty(len(ts), dtype=bool)
    change[0] = True
    change[1:] = np.diff(ts) != 0
    rank = np.arange(len(ts)) - np.flatnonzero(change)[np.cumsum(change) - 1]
    knn = np.where(rank < k, rank + 1, 0).astype(np.int8)
    out_rank = np.empty(len(tile), dtype=np.int8)
    out_rank[order] = knn
    # rows keep their input order → string columns pass through zero-copy
    return pa.table({
        "tile_id": group["tile_id"], "z": group["z"],
        "x": group["x"], "y": group["y"],
        "image_id": group["image_id"], "caption": group["caption"],
        "knn_rank": pa.array(out_rank),
    })


def mvt_tile_summary(sf_dir: str, zoom: int = 6, num_partitions: int = 16):
    """Driver query: REAL MVT protobuf round trip, oracle-checked.

    Builds the single-zoom tile layer with per-feature attributes
    (caption, fmt) encoded as spec-compliant MVT protobufs
    (``tilemath.mvt_pb``, vectorized), then DECODES every tile with the
    independent reference decoder and emits per-(tile, layer) stats the
    DuckDB oracle recomputes from the placement arithmetic: feature
    count, the sum of raw geometry command integers (covers zigzag,
    quantization and command framing), and an XOR of FNV-1a caption
    hashes (covers the keys/values attribute tables).
    """
    from functools import partial as _partial

    from ..sources.images import images_from_documents, sample_image_ids
    from ..stages.georef import georef_batch
    from ..tilemath.hashing import fnv1a_64_strings
    from ..tilemath.mvt_pb import decode_feature_attrs, decode_tile

    images = images_from_documents(sf_dir)
    ids = sample_image_ids(sf_dir)
    cfg = RenderConfig(min_zoom=zoom, max_zoom=zoom)
    bounds = sample_partition_bounds(ids, cfg, num_partitions)

    def fanout(batch: pa.Table) -> pa.Table:
        geo = georef_batch(batch)
        return render_fanout(geo, cfg, bounds, extra_cols=("caption", "fmt"))

    frags = images.map_batches(fanout, batch_format="pyarrow", batch_size=8192)
    reduce_fn = _partial(reduce_partition, with_feature_ids=False,
                         mvt_attrs=("caption", "fmt"))
    tiles = exchange_reduce(frags, num_partitions, reduce_fn)

    def summarize(batch: pa.Table) -> pa.Table:
        rows = {"tile_id": [], "layer": [], "n_features": [],
                "geom_sum": [], "caption_fnv_xor": [], "n_png": []}
        tids = batch["tile_id"].to_numpy()
        for i in range(batch.num_rows):
            layers = decode_tile(batch["mvt_bytes"][i].as_py())
            for lname, lay in layers.items():
                caps = []
                n_png = 0
                gsum = 0
                for f in lay["features"]:
                    gsum += sum(f["geometry"])
                    at = decode_feature_attrs(lay, f)
                    caps.append(at.get("caption", ""))
                    n_png += at.get("fmt") == "png"
                fx = np.bitwise_xor.reduce(
                    fnv1a_64_strings(np.array(caps, dtype="U"))) if caps else np.uint64(0)
                rows["tile_id"].append(int(tids[i]))
                rows["layer"].append(lname)
                rows["n_features"].append(len(lay["features"]))
                rows["geom_sum"].append(int(gsum))
                rows["caption_fnv_xor"].append(int(np.int64(np.uint64(fx).astype(np.int64))))
                rows["n_png"].append(int(n_png))
        return pa.table({
            "tile_id": pa.array(rows["tile_id"], pa.int64()),
            "layer": pa.array(rows["layer"], pa.string()),
            "n_features": pa.array(rows["n_features"], pa.int64()),
            "geom_sum": pa.array(rows["geom_sum"], pa.int64()),
            "caption_fnv_xor": pa.array(rows["caption_fnv_xor"], pa.int64()),
            "n_png": pa.array(rows["n_png"], pa.int64()),
        })

    return tiles.map_batches(summarize, batch_format="pyarrow")


def line_tile_summary(sf_dir: str, zoom: int = 4):
    """Driver query: the LINE layer end-to-end, oracle-checked.

    Per-user trajectories (events ordered by ts, event_id with the
    arithmetic placement) become polylines, stripe-clipped into tiles
    with Liang-Barsky interval math (``tilemath.clip.slice_lines`` — the
    ``render/TiledGeometry.java`` line path), shuffled by tile, encoded
    as a real MVT ``lines`` layer (MoveTo + LineTo runs), DECODED with
    the independent reference decoder, and summarized per tile.  The
    DuckDB oracle recomputes part/vertex counts and the geometry command
    sum from the same clipping arithmetic in SQL windows.
    """
    import pandas as pd

    from ..tilemath.clip import DEFAULT_BUFFER_PX, slice_lines
    from ..tilemath.mvt_pb import KIND_LINE, decode_tile, encode_tile_batch
    from ..tilemath.tilecoord import tms_encode
    from .queries import _event_world

    f = float(1 << zoom)
    buf = DEFAULT_BUFFER_PX / 256.0

    def pts(batch: pa.Table) -> pa.Table:
        t = _event_world(batch)
        return pa.table({"user_id": batch["user_id"], "ts": batch["ts"],
                         "event_id": t["event_id"], "wx": t["wx"], "wy": t["wy"]})

    def per_user(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"])
        px = g["wx"].to_numpy() * f
        py = g["wy"].to_numpy() * f
        r = slice_lines(px, py, np.array([0, len(px)]), zoom, buf)
        n_parts = len(r["x"])
        if n_parts == 0:
            return pa.table({"tile_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "part_seq": pa.array([], pa.int64()),
                             "vx": pa.array([], pa.list_(pa.float32())),
                             "vy": pa.array([], pa.list_(pa.float32()))})
        tid = tms_encode(r["x"], r["y"], np.full(n_parts, zoom, np.int64))
        off = pa.array(r["part_offsets"].astype(np.int32))
        vx = pa.ListArray.from_arrays(off, pa.array(r["vx"].astype(np.float32)))
        vy = pa.ListArray.from_arrays(off, pa.array(r["vy"].astype(np.float32)))
        return pa.table({
            "tile_id": pa.array(tid),
            "user_id": pa.array(np.full(n_parts, int(g["user_id"].iloc[0]),
                                        np.int64)),
            "part_seq": pa.array(np.arange(n_parts, dtype=np.int64)),
            "vx": vx, "vy": vy})

    parts = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(pts, batch_format="pyarrow") \
        .groupby("user_id").map_groups(per_user, batch_format="pandas")

    # parts already flowed through the per-user sort-groupby; a second
    # exchange hop measured slower than piggybacking on that sort
    return parts.groupby("tile_id").map_groups(line_parts_per_tile,
                                               batch_format="pyarrow")


def tile_hash_exchange(parts: "ray.data.Dataset", reduce_fn,
                       num_partitions: int = 32) -> "ray.data.Dataset":
    """Group rows by ``tile_id`` through the explicit exchange: tiles
    hash into ``num_partitions`` partitions and a whole partition
    reduces in one task — the scale-safe replacement for per-tile
    ``groupby().map_groups`` (one task per tile).  ``reduce_fn`` must
    handle multiple tiles per table (every per-tile reducer here
    segments by tile internally)."""
    from ..stages.exchange import exchange_reduce
    from ..tilemath.hashing import mix64

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "tile_id" not in batch.schema.names:
            return batch
        tid = batch["tile_id"].to_numpy().astype(np.uint64)
        part = (mix64(tid) % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def red(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows and "part" in tbl.schema.names:
            tbl = tbl.drop_columns(["part"])
        return reduce_fn(tbl)

    return exchange_reduce(parts.map_batches(add_part,
                                             batch_format="pyarrow"),
                           num_partitions, red)


def line_parts_per_tile(grp: pa.Table) -> pa.Table:
    """Per-tile reduce shared by the line-layer summaries: sort parts
    (tile, line, part_seq), encode a real MVT ``lines`` layer, decode it
    with the independent decoder, summarize counts + command sum."""
    from ..tilemath.mvt_pb import KIND_LINE, decode_tile, encode_tile_batch

    if grp.num_rows == 0:
        return pa.table({k: pa.array([], pa.int64()) for k in
                         ("tile_id", "n_parts", "n_vertices", "geom_sum")})
    order = np.lexsort((grp["part_seq"].to_numpy(),
                        grp["user_id"].to_numpy(),
                        grp["tile_id"].to_numpy()))
    grp = grp.take(pa.array(order))
    tid = grp["tile_id"].to_numpy()
    uid = grp["user_id"].to_numpy()
    vx_l = grp["vx"].combine_chunks()
    vy_l = grp["vy"].combine_chunks()
    voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
    vx = vx_l.flatten().to_numpy()
    vy = vy_l.flatten().to_numpy()
    n = len(tid)
    _, blobs = encode_tile_batch(
        tid, np.full(n, 2, np.int8), np.full(n, KIND_LINE, np.int8),
        uid, np.zeros(n), np.zeros(n), np.zeros(n), np.zeros(n),
        {2: "lines"}, line_verts=(vx, vy, voff))
    out = {"tile_id": [], "n_parts": [], "n_vertices": [], "geom_sum": []}
    utid = tid[np.concatenate([[True], np.diff(tid) != 0])] if n else []
    for t_id, blob in zip(utid, blobs):
        lay = decode_tile(blob.as_py())["lines"]
        nv = sum((len(ft["geometry"]) - 2) // 2 for ft in lay["features"])
        gs = sum(sum(ft["geometry"]) for ft in lay["features"])
        out["tile_id"].append(int(t_id))
        out["n_parts"].append(len(lay["features"]))
        out["n_vertices"].append(int(nv))
        out["geom_sum"].append(int(gs))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def _read(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def poly_tile_summary(sf_dir: str, zoom: int = 5):
    """Driver query: GENERAL polygon rendering end-to-end, oracle-checked.

    Deterministic triangles derived from the event placement are
    stripe-clipped with the batch Sutherland–Hodgman kernel
    (``tilemath.clip.slice_polygons`` — convex/concave rings, the
    ``render/TiledGeometry.java`` polygon path), shuffled by tile,
    encoded as real MVT polygon rings (MoveTo + LineTo + ClosePath),
    DECODED independently, and summarized per tile.  The DuckDB oracle
    replays the same four half-plane clip passes in SQL windows.
    """
    import pandas as pd

    from ..tilemath.clip import DEFAULT_BUFFER_PX, slice_polygons
    from ..tilemath.mvt_pb import KIND_POLY, decode_tile, encode_tile_batch
    from ..tilemath.tilecoord import tms_encode
    from .queries import _event_world

    f = float(1 << zoom)
    buf = DEFAULT_BUFFER_PX / 256.0

    def tri_frags(batch: pa.Table) -> pa.Table:
        t = _event_world(batch)
        eid = t["event_id"].to_numpy()
        wx, wy = t["wx"].to_numpy(), t["wy"].to_numpy()
        # deterministic non-degenerate triangle per event (tile units)
        x1, y1 = wx * f, wy * f
        x2 = (wx + 0.02 + (eid % 7) * 0.001) * f
        y2 = (wy + 0.005) * f
        x3 = (wx + 0.01) * f
        y3 = (wy + 0.03 + (eid % 5) * 0.002) * f
        n = len(eid)
        px = np.column_stack([x1, x2, x3]).reshape(-1)
        py = np.column_stack([y1, y2, y3]).reshape(-1)
        r = slice_polygons(px, py, np.arange(n + 1) * 3, zoom, buf)
        n_parts = len(r["x"])
        if n_parts == 0:
            return pa.table({"tile_id": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64()),
                             "vx": pa.array([], pa.list_(pa.float32())),
                             "vy": pa.array([], pa.list_(pa.float32()))})
        tid = tms_encode(r["x"], r["y"], np.full(n_parts, zoom, np.int64))
        off = pa.array(r["part_offsets"].astype(np.int32))
        return pa.table({
            "tile_id": pa.array(tid),
            "event_id": pa.array(eid[r["row"]]),
            "vx": pa.ListArray.from_arrays(off, pa.array(r["vx"].astype(np.float32))),
            "vy": pa.ListArray.from_arrays(off, pa.array(r["vy"].astype(np.float32))),
        })

    parts = _read(sf_dir, "events", ["event_id"]) \
        .map_batches(tri_frags, batch_format="pyarrow")

    def per_tile(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in
                             ("tile_id", "n_polys", "n_vertices", "geom_sum")})
        order = np.lexsort((grp["event_id"].to_numpy(),
                            grp["tile_id"].to_numpy()))
        grp = grp.take(pa.array(order))
        tid = grp["tile_id"].to_numpy()
        eid = grp["event_id"].to_numpy()
        vx_l = grp["vx"].combine_chunks()
        vy_l = grp["vy"].combine_chunks()
        voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
        n = len(tid)
        _, blobs = encode_tile_batch(
            tid, np.full(n, 0, np.int8), np.full(n, KIND_POLY, np.int8),
            eid, np.zeros(n), np.zeros(n), np.zeros(n), np.zeros(n),
            {0: "polys"},
            line_verts=(vx_l.flatten().to_numpy(), vy_l.flatten().to_numpy(),
                        voff))
        out = {"tile_id": [], "n_polys": [], "n_vertices": [], "geom_sum": []}
        utid = tid[np.concatenate([[True], np.diff(tid) != 0])]
        for t_id, blob in zip(utid, blobs):
            lay = decode_tile(blob.as_py())["polys"]
            nv = sum((len(ft["geometry"]) - 3) // 2 for ft in lay["features"])
            gs = sum(sum(ft["geometry"]) for ft in lay["features"])
            out["tile_id"].append(int(t_id))
            out["n_polys"].append(len(lay["features"]))
            out["n_vertices"].append(int(nv))
            out["geom_sum"].append(int(gs))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return parts.groupby("tile_id").map_groups(per_tile,
                                               batch_format="pyarrow")


def spatial_join(images: "ray.data.Dataset", sample_ids: np.ndarray,
                 num_partitions: int = 64, k: int = 3,
                 zoom: int = 14, checkpoint_dir: str | None = None,
                 bounds: np.ndarray | None = None):
    """Footprint × z14-tile intersection join with per-tile kNN captions.

    Returns a Dataset of (tile_id, z, x, y, image_id, caption, knn_rank)
    — one row per footprint∩tile(+buffer) pair.  The kNN lookup reuses
    the tile shuffle (candidates = chips in tile+buffer), the analog of
    the reference's ``geo/PointIndex.java`` radius queries but with no
    cross-node index state.
    """
    cfg = RenderConfig(min_zoom=zoom, max_zoom=zoom, emit_points=False)
    if bounds is None:
        bounds = sample_partition_bounds(sample_ids, cfg, num_partitions)
    JOIN_COLS = ["tile_id", "part", "z", "x", "y", "image_id", "caption", "cx", "cy"]

    def fanout_with_caption(batch: pa.Table) -> pa.Table:
        geo = georef_batch(batch)
        frags = render_fanout(geo, cfg, bounds, extra_cols=("caption",))
        return frags.select(JOIN_COLS)  # shuffle only what the join reduce needs

    frags = images.map_batches(fanout_with_caption, batch_format="pyarrow",
                               batch_size=8192)
    if checkpoint_dir is not None:
        return checkpointed_exchange(frags, num_partitions,
                                     partial(_join_reduce, k=k), checkpoint_dir,
                                     {"kind": "spatial_join", "zoom": zoom},
                                     run_config=_run_config("spatial_join",
                                                            bounds,
                                                            num_partitions, cfg,
                                                            sample_ids))
    return exchange_reduce(frags, num_partitions, partial(_join_reduce, k=k))
