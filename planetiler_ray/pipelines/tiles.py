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
                          run_config: dict | None = None,
                          map_fn=None, map_target_rows: int | None = None):
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
                                  parts_to_run=parts_to_run, pass_part=True,
                                  map_fn=map_fn,
                                  map_target_rows=map_target_rows)
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

    if shuffle == "groupby":
        if checkpoint_dir is not None:
            raise ValueError(
                "checkpoint_dir requires shuffle='exchange' — the "
                "groupby cross-check path has no checkpoint/resume "
                "support (it would silently run unresumable)")
        frags = render_fragments(images, cfg, bounds, slim=not with_feature_ids,
                                 profile=profile)
        return frags.groupby("part").map_groups(reduce_fn, batch_format="pyarrow")

    # fused map-side shuffle write: the georeferenced image stream (small)
    # is what crosses the object store; each split task runs the ~17×
    # row-multiplying fan-out itself and returns partition pieces directly
    # (render_fragments kept for the groupby cross-check path above)
    # default OFF: interleaved A/B at 8 cpus showed the fused task
    # granularity (one task per image block) loses the fan-out/split
    # overlap and load balance of the pipelined path; enable per-run to
    # re-measure on other hosts
    import os
    if os.environ.get("GRAFT_FUSED_EXCHANGE", "0") == "1":
        georefed = images.map_batches(georef_batch, batch_format="pyarrow")
        if profile is not None:
            georefed = georefed.map_batches(profile.process_features,
                                            batch_format="pyarrow")
        fanout = partial(render_fanout, cfg=cfg, part_bounds=bounds,
                         slim=not with_feature_ids)
        mtr = int(os.environ.get("GRAFT_FUSED_TARGET_ROWS", "16384"))
        if checkpoint_dir is None:
            return exchange_reduce(georefed, num_partitions, reduce_fn,
                                   map_fn=fanout, map_target_rows=mtr)
        return checkpointed_exchange(georefed, num_partitions, reduce_fn,
                                     checkpoint_dir,
                                     run_config=_run_config("pyramid", bounds,
                                                            num_partitions,
                                                            cfg, sample_ids),
                                     map_fn=fanout, map_target_rows=mtr)
    frags = render_fragments(images, cfg, bounds, slim=not with_feature_ids,
                             profile=profile)
    if checkpoint_dir is None:
        return exchange_reduce(frags, num_partitions, reduce_fn)
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
    from ..sources.images import images_from_documents, sample_image_ids
    from ..stages.georef import georef_batch
    from ..stages.reduce import prepare_fragments
    from ..tilemath.hashing import fnv1a_64_strings
    from ..tilemath.mvt_pb import encode_tile_batch

    images = images_from_documents(sf_dir)
    ids = sample_image_ids(sf_dir)
    cfg = RenderConfig(min_zoom=zoom, max_zoom=zoom)
    bounds = sample_partition_bounds(ids, cfg, num_partitions)

    def fanout(batch: pa.Table) -> pa.Table:
        geo = georef_batch(batch)
        return render_fanout(geo, cfg, bounds, extra_cols=("caption", "fmt"))

    frags = images.map_batches(fanout, batch_format="pyarrow", batch_size=8192)
    NAMES = {0: "chips", 1: "labels"}

    def summarize(group: pa.Table) -> pa.Table:
        """Same sort/limit/dedup front-half as ``reduce_partition``,
        then per-(tile, layer) stats straight from the ENCODER's
        vectorized command arrays + one reduceat over the per-feature
        attr streams — no Python decode loop (the independent decoder
        verifies these numbers in ``tests/test_mvt_pb.py`` goldens)."""
        empty = pa.table({
            "tile_id": pa.array([], pa.int64()),
            "layer": pa.array([], pa.string()),
            "n_features": pa.array([], pa.int64()),
            "geom_sum": pa.array([], pa.int64()),
            "caption_fnv_xor": pa.array([], pa.int64()),
            "n_png": pa.array([], pa.int64())})
        fr = prepare_fragments(group, mvt_attrs=("caption", "fmt"))
        if fr is None:
            return empty
        utid, _, st = encode_tile_batch(
            fr["tile"], fr["layer"], fr["kind"], fr["idx"],
            fr["ax"], fr["ay"], fr["bx"], fr["by"], NAMES,
            {a: fr["attr_vals"][a] for a in ("caption", "fmt")},
            return_stats=True)
        n_lays = len(st["lay_tile_ord"])
        feat_lay = st["feat_lay"]            # non-decreasing per feature
        lay_starts_f = np.concatenate(
            [[0], np.flatnonzero(np.diff(feat_lay)) + 1])
        caps = fr["attr_vals"]["caption"][st["feat_first_frag"]]
        cap_h = fnv1a_64_strings(caps.astype("U"))
        cap_xor = np.zeros(n_lays, np.uint64)
        cap_xor[feat_lay[lay_starts_f]] = np.bitwise_xor.reduceat(
            cap_h, lay_starts_f)
        fmts = fr["attr_vals"]["fmt"][st["feat_first_frag"]]
        png = (fmts == "png").astype(np.int64)
        n_png = np.zeros(n_lays, np.int64)
        n_png[feat_lay[lay_starts_f]] = np.add.reduceat(png, lay_starts_f)
        lay_names = np.array([NAMES[i] for i in sorted(NAMES)], dtype=object)
        return pa.table({
            "tile_id": pa.array(utid[st["lay_tile_ord"]], pa.int64()),
            "layer": pa.array(lay_names[st["lay_layer"]], pa.string()),
            "n_features": pa.array(st["lay_n_features"], pa.int64()),
            "geom_sum": pa.array(st["lay_geom_sum"], pa.int64()),
            "caption_fnv_xor": pa.array(cap_xor.view(np.int64)),
            "n_png": pa.array(n_png, pa.int64()),
        })

    return exchange_reduce(frags, num_partitions, summarize)


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
    from ..tilemath.clip import DEFAULT_BUFFER_PX, slice_lines
    from ..tilemath.hashing import mix64
    from ..tilemath.tilecoord import tms_encode
    from .queries import _event_world

    f = float(1 << zoom)
    buf = DEFAULT_BUFFER_PX / 256.0
    num_partitions = 32
    tile_partitions = 16        # ≤ 4^zoom+ tiles at z4 — keep task
    #                             count proportional to the tile count

    def pts(batch: pa.Table) -> pa.Table:
        t = _event_world(batch)
        uid = batch["user_id"].to_numpy()
        part = (mix64(uid.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"part": pa.array(part),
                         "user_id": batch["user_id"], "ts": batch["ts"],
                         "event_id": t["event_id"], "wx": t["wx"],
                         "wy": t["wy"]})

    def per_partition(tbl: pa.Table) -> pa.Table:
        """All users of one hash partition at once: one lexsort, ONE
        ``slice_lines`` call over per-user segment offsets — the
        vectorized replacement for the round-2 per-user ``map_groups``
        (one pandas call per user anti-scales at planet user counts)."""
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "tile_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "part_seq": pa.array([], pa.int64()),
                          "vx": pa.array([], pa.list_(pa.float32())),
                          "vy": pa.array([], pa.list_(pa.float32()))})
        if tbl.num_rows == 0:
            return empty
        uid = tbl["user_id"].to_numpy()
        order = np.lexsort((tbl["event_id"].to_numpy(),
                            tbl["ts"].to_numpy(), uid))
        uid = uid[order]
        px = tbl["wx"].to_numpy()[order] * f
        py = tbl["wy"].to_numpy()[order] * f
        ustarts = np.concatenate([[0], np.flatnonzero(np.diff(uid)) + 1,
                                  [len(uid)]])
        r = slice_lines(px, py, ustarts, zoom, buf)
        n_parts = len(r["x"])
        if n_parts == 0:
            return empty
        line_uid = uid[ustarts[:-1]][r["line"]]
        # part_seq: occurrence order within each line (slice_lines emits
        # a line's parts in segment order)
        po = np.argsort(r["line"], kind="stable")
        change = np.empty(n_parts, bool)
        change[0] = True
        change[1:] = np.diff(r["line"][po]) != 0
        run_start = np.flatnonzero(change)
        rel = np.arange(n_parts) - np.repeat(
            run_start, np.diff(np.append(run_start, n_parts)))
        part_seq = np.empty(n_parts, np.int64)
        part_seq[po] = rel
        tid = tms_encode(r["x"], r["y"], np.full(n_parts, zoom, np.int64))
        off = pa.array(r["part_offsets"].astype(np.int32))
        # fuse the NEXT exchange's tile-hash key into this reduce: the
        # second exchange then consumes these task outputs directly,
        # with no intervening Dataset execution competing with the
        # still-running reduce tasks for CPUs (measured: the nested
        # streaming-executor backoff dominated this query's wall)
        nxt = (mix64(tid.astype(np.uint64))
               % np.uint64(tile_partitions)).astype(np.int64)
        return pa.table({
            "part": pa.array(nxt),
            "tile_id": pa.array(tid),
            "user_id": pa.array(line_uid),
            "part_seq": pa.array(part_seq),
            "vx": pa.ListArray.from_arrays(
                off, pa.array(r["vx"].astype(np.float32))),
            "vy": pa.ListArray.from_arrays(
                off, pa.array(r["vy"].astype(np.float32)))})

    parts = exchange_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(pts, batch_format="pyarrow", batch_size=65536),
        num_partitions, per_partition)

    # hash-exchange: many tiles per reduce task (per-tile map_groups
    # spends a task per tile — anti-scales at planet tile counts)
    return tile_hash_exchange(parts, line_parts_per_tile, tile_partitions,
                              pre_parted=True)


def tile_hash_exchange(parts: "ray.data.Dataset", reduce_fn,
                       num_partitions: int = 32,
                       pre_parted: bool = False) -> "ray.data.Dataset":
    """Group rows by ``tile_id`` through the explicit exchange: tiles
    hash into ``num_partitions`` partitions and a whole partition
    reduces in one task — the scale-safe replacement for per-tile
    ``groupby().map_groups`` (one task per tile).  ``reduce_fn`` must
    handle multiple tiles per table (every per-tile reducer here
    segments by tile internally).

    ``pre_parted``: the caller already emitted the
    ``mix64(tile_id) % num_partitions`` key as ``part`` (e.g. fused
    into the previous exchange's reduce task) — skip the mapping
    Dataset entirely so back-to-back exchanges chain task-to-task
    without a streaming-executor hop contending for CPUs."""
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

    if not pre_parted:
        parts = parts.map_batches(add_part, batch_format="pyarrow")
    return exchange_reduce(parts, num_partitions, red)


def line_parts_per_tile(grp: pa.Table) -> pa.Table:
    """Per-tile reduce shared by the line-layer summaries: sort parts
    (tile, line, part_seq), encode a real MVT ``lines`` layer, and
    summarize counts + the raw geometry-command sum straight from the
    encoder's vectorized stats (the independent Python decoder verifies
    the same numbers in the pytest goldens — ``tests/test_mvt_pb.py``;
    re-decoding every tile here was the round-2 bench hotspot)."""
    from ..tilemath.mvt_pb import KIND_LINE, encode_tile_batch

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
    utid, _, st = encode_tile_batch(
        tid, np.full(n, 2, np.int8), np.full(n, KIND_LINE, np.int8),
        uid, np.zeros(n), np.zeros(n), np.zeros(n), np.zeros(n),
        {2: "lines"}, line_verts=(vx, vy, voff), return_stats=True)
    return pa.table({
        "tile_id": pa.array(utid[st["lay_tile_ord"]]),
        "n_parts": pa.array(st["lay_n_features"]),
        "n_vertices": pa.array(st["lay_vert_sum"]),
        "geom_sum": pa.array(st["lay_geom_sum"]),
    })


def _read(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    from ._util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


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
    from ..tilemath.mvt_pb import KIND_POLY, encode_tile_batch
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
        # summary comes from the encoder's vectorized stats; decode-based
        # verification lives in the pytest goldens (round-2 hotspot)
        utid, _, st = encode_tile_batch(
            tid, np.full(n, 0, np.int8), np.full(n, KIND_POLY, np.int8),
            eid, np.zeros(n), np.zeros(n), np.zeros(n), np.zeros(n),
            {0: "polys"},
            line_verts=(vx_l.flatten().to_numpy(), vy_l.flatten().to_numpy(),
                        voff), return_stats=True)
        return pa.table({
            "tile_id": pa.array(utid[st["lay_tile_ord"]]),
            "n_polys": pa.array(st["lay_n_features"]),
            "n_vertices": pa.array(st["lay_vert_sum"]),
            "geom_sum": pa.array(st["lay_geom_sum"]),
        })

    return tile_hash_exchange(parts, per_tile)


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


def poly_merge_tile_summary(sf_dir: str, zoom: int = 5):
    """Driver query: GENERAL polygon overlap/nearby merge end-to-end,
    oracle-checked (``FeatureMerge.mergeOverlappingPolygons``,
    ``FeatureMerge.java:291-394``).

    Deterministic rectangle trios per event group — chained overlaps
    (r0∩r1, r1∩r2, r0∩r2 = ∅) — placed fully inside one z5 tile on the
    integer px grid, so the grid-boolean union equals the exact
    rectilinear union.  Per tile: bbox-sweep clustering + union-find +
    grid union (``stages.merge.merge_overlapping_polygons``); the
    DuckDB oracle replays the placement arithmetic with
    inclusion-exclusion.  Events are capped at 110592 (= 3·36·1024):
    beyond that the 6×6 per-tile slot grid would collide.
    """
    from ..stages.merge import merge_overlapping_polygons
    from ..tilemath.tilecoord import tms_encode

    if zoom < 5:
        raise ValueError(
            f"zoom={zoom} < 5: the 32x32 tile placement grid needs "
            "2**zoom >= 32 or tile x/y overflow the zoom's range and "
            "tms_encode silently collides with other zooms' ids")

    CAP = 110592

    def rects(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        eid = eid[eid < CAP]               # event ids are 0-based
        g = eid // 3
        k = eid % 3
        t = g % 1024
        s = g // 1024
        sx = 8 + (s % 6) * 40
        sy = 8 + (s // 6) * 40
        x0 = (sx + 6 * k).astype(np.float64)
        y0 = (sy + 4 * (k % 2)).astype(np.float64)
        tid = tms_encode(t % 32, t // 32, np.full(len(eid), zoom, np.int64))
        vx = np.column_stack([x0, x0 + 10, x0 + 10, x0]).reshape(-1)
        vy = np.column_stack([y0, y0, y0 + 10, y0 + 10]).reshape(-1)
        off = pa.array((np.arange(len(eid) + 1) * 4).astype(np.int32))
        return pa.table({
            "tile_id": pa.array(tid),
            "poly_id": pa.array(eid),
            "vx": pa.ListArray.from_arrays(off, pa.array(vx)),
            "vy": pa.ListArray.from_arrays(off, pa.array(vy))})

    def per_tile(grp: pa.Table) -> pa.Table:
        empty = pa.table({k: pa.array([], pa.int64()) for k in
                          ("tile_id", "merged_id", "n_features",
                           "union_area", "mx0", "my0", "mx1", "my1")})
        if grp.num_rows == 0:
            return empty
        order = np.lexsort((grp["poly_id"].to_numpy(),
                            grp["tile_id"].to_numpy()))
        grp = grp.take(pa.array(order))
        tid = grp["tile_id"].to_numpy()
        pid = grp["poly_id"].to_numpy()
        vx_l = grp["vx"].combine_chunks()
        vy_l = grp["vy"].combine_chunks()
        voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
        vx = vx_l.flatten().to_numpy()
        vy = vy_l.flatten().to_numpy()
        rows = {k: [] for k in ("tile_id", "merged_id", "n_features",
                                "union_area", "mx0", "my0", "mx1", "my1")}
        starts = np.concatenate([[0], np.flatnonzero(np.diff(tid)) + 1,
                                 [len(tid)]])
        for si, ei in zip(starts[:-1], starts[1:]):
            sel = np.arange(si, ei)
            a, b = voff[si], voff[ei]
            r = merge_overlapping_polygons(
                pid[sel], vx[a:b], vy[a:b], voff[si:ei + 1] - a,
                np.arange(ei - si))
            nc = len(r["merged_id"])
            if nc == 0:
                continue
            # per-cluster bbox over its rings
            ro = r["offsets"]
            rbx0 = np.minimum.reduceat(r["xs"], ro[:-1])
            rbx1 = np.maximum.reduceat(r["xs"], ro[:-1])
            rby0 = np.minimum.reduceat(r["ys"], ro[:-1])
            rby1 = np.maximum.reduceat(r["ys"], ro[:-1])
            for c in range(nc):
                m = r["cluster"] == c
                rows["tile_id"].append(int(tid[si]))
                rows["merged_id"].append(int(r["merged_id"][c]))
                rows["n_features"].append(int(r["n_features"][c]))
                rows["union_area"].append(int(round(r["union_area"][c])))
                rows["mx0"].append(int(round(rbx0[m].min())))
                rows["my0"].append(int(round(rby0[m].min())))
                rows["mx1"].append(int(round(rbx1[m].max())))
                rows["my1"].append(int(round(rby1[m].max())))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    parts = _read(sf_dir, "events", ["event_id"]) \
        .map_batches(rects, batch_format="pyarrow")
    return tile_hash_exchange(parts, per_tile, 64)


def polygon_fill_archive(px: np.ndarray, py: np.ndarray,
                         ring_offsets: np.ndarray,
                         poly_of_ring: np.ndarray,
                         min_zoom: int, max_zoom: int, out_dir: str,
                         num_shards: int = 8,
                         layer_name: str = "water") -> dict:
    """Planet-polygon → sharded archive end-to-end — the reference's
    water-polygons path re-expressed run-native.

    Per zoom (fanned out as Ray tasks), the striped clip
    (``tilemath/stripeclip.py``; ``render/TiledGeometry.java:406-699``
    + ``CoveredTiles`` ``:748-806``) emits boundary-tile fragments plus
    interior fill RUNS.  Fragments hash-exchange into tiles and encode
    real MVT polygon rings; the runs stay a compact side table whose
    tiles reach the archive as run-native 16-byte entries, every one
    sharing ONE memoized fill encode
    (``render/FeatureRenderer.java:290-315``).  Interior tiles of a
    world-spanning polygon never pass through the shuffle as geometry.

    ``px, py`` in WORLD units ([0,1]²); rings grouped into polygons by
    ``poly_of_ring`` (first ring of each polygon = outer shell).
    """
    import hashlib

    import ray.data

    from ..sinks import fill_runs_from_striped, write_archive_sharded
    from ..tilemath.clip import DEFAULT_BUFFER_PX
    from ..tilemath.mvt_pb import KIND_POLY, encode_tile_batch
    from ..tilemath.stripeclip import slice_polygons_striped
    from ..tilemath.tilecoord import hilbert_encode_tiles, tms_decode, tms_encode

    buf = DEFAULT_BUFFER_PX / 256.0
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    ring_offsets = np.asarray(ring_offsets, np.int64)
    poly_of_ring = np.asarray(poly_of_ring, np.int64)

    empty_f32l = pa.array([], pa.list_(pa.float32()))

    def slice_z(batch: pa.Table) -> pa.Table:
        frags = {"is_run": [], "z": [], "tile_id": [], "ring": [],
                 "run_x": [], "run_y0": [], "run_y1": [],
                 "vx": [], "vy": []}
        tables = []
        for z in batch["z"].to_pylist():
            s = float(1 << z)
            r = slice_polygons_striped(px * s, py * s, ring_offsets, z,
                                       buf, poly_of_ring=poly_of_ring)
            n = len(r["x"])
            tid = tms_encode(r["x"], r["y"], np.full(n, z, np.int64))
            off = pa.array(np.asarray(r["part_offsets"], np.int32))
            runs = fill_runs_from_striped(r, z)
            m = runs.num_rows
            tables.append(pa.table({
                "is_run": pa.array(
                    np.concatenate([np.zeros(n, bool), np.ones(m, bool)])),
                "z": pa.array(np.full(n + m, z, np.int64)),
                "tile_id": pa.array(np.concatenate(
                    [tid, np.zeros(m, np.int64)])),
                "ring": pa.array(np.concatenate(
                    [np.asarray(r["row"], np.int64), np.zeros(m, np.int64)])),
                "run_x": pa.array(np.concatenate(
                    [np.zeros(n, np.int64), runs["x"].to_numpy()])),
                "run_y0": pa.array(np.concatenate(
                    [np.zeros(n, np.int64), runs["y0"].to_numpy()])),
                "run_y1": pa.array(np.concatenate(
                    [np.zeros(n, np.int64), runs["y1"].to_numpy()])),
                "vx": pa.concat_arrays([
                    pa.ListArray.from_arrays(
                        off, pa.array(np.asarray(r["vx"], np.float32))),
                    pa.nulls(m, pa.list_(pa.float32()))]),
                "vy": pa.concat_arrays([
                    pa.ListArray.from_arrays(
                        off, pa.array(np.asarray(r["vy"], np.float32))),
                    pa.nulls(m, pa.list_(pa.float32()))]),
            }))
        return pa.concat_tables(tables) if tables else pa.table(
            {k: pa.array([]) for k in frags})

    sliced = ray.data.from_items(
        [{"z": z} for z in range(min_zoom, max_zoom + 1)],
        override_num_blocks=max_zoom - min_zoom + 1) \
        .map_batches(slice_z, batch_format="pyarrow").materialize()

    # the runs side table is tiny (O(boundary) rows) — collect it from
    # the materialized blocks without re-running the clip; fetch each
    # block once
    def _runs_of(r) -> pa.Table:
        t = ray.get(r)
        return t.filter(t["is_run"]).select(
            ["z", "run_x", "run_y0", "run_y1"])

    runs_tbl = pa.concat_tables(
        [_runs_of(r) for r in sliced.to_arrow_refs()])
    fill_runs = pa.table({"z": runs_tbl["z"], "x": runs_tbl["run_x"],
                          "y0": runs_tbl["run_y0"],
                          "y1": runs_tbl["run_y1"]})
    frags = sliced.map_batches(
        lambda b: b.filter(pa.compute.invert(b["is_run"].combine_chunks())),
        batch_format="pyarrow") \
        .select_columns(["z", "tile_id", "ring", "vx", "vy"])

    def to_bytes(blob) -> bytes:
        return blob.as_py() if hasattr(blob, "as_py") else bytes(blob)

    def blob_hash(blob: bytes) -> int:
        return int.from_bytes(
            hashlib.blake2b(blob, digest_size=8).digest(), "little",
            signed=True)

    def per_tile(grp: pa.Table) -> pa.Table:
        cols = {"tile_id": pa.array([], pa.int64()),
                "hilbert_id": pa.array([], pa.int64()),
                "z": pa.array([], pa.int8()),
                "content_hash": pa.array([], pa.int64()),
                "mvt_bytes": pa.array([], pa.large_binary())}
        if grp.num_rows == 0:
            return pa.table(cols)
        # one FEATURE per (tile, polygon): a polygon's fragments in a
        # tile — shell fill/detail first (lowest ring index), then its
        # holes — become one multi-ring MVT feature, so decoders attach
        # interior rings to the right exterior (MVT 2.1 §4.3.4.4)
        ring0 = grp["ring"].to_numpy()
        poly0 = poly_of_ring[ring0]
        order = np.lexsort((ring0, poly0, grp["tile_id"].to_numpy()))
        grp = grp.take(pa.array(order))
        tid = grp["tile_id"].to_numpy()
        ring = grp["ring"].to_numpy()
        poly = poly_of_ring[ring]
        vx_l = grp["vx"].combine_chunks()
        vy_l = grp["vy"].combine_chunks()
        voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
        n = len(tid)
        utid, blobs = encode_tile_batch(
            tid, np.full(n, 0, np.int8), np.full(n, KIND_POLY, np.int8),
            poly, np.zeros(n), np.zeros(n), np.zeros(n), np.zeros(n),
            {0: layer_name},
            line_verts=(vx_l.flatten().to_numpy(),
                        vy_l.flatten().to_numpy(), voff),
            feature_group=poly)
        x, y, zz = tms_decode(utid)
        hil = hilbert_encode_tiles(x, y, zz)
        return pa.table({
            "tile_id": pa.array(utid),
            "hilbert_id": pa.array(hil),
            "z": pa.array(zz.astype(np.int8)),
            "content_hash": pa.array(
                np.array([blob_hash(to_bytes(b)) for b in blobs],
                         np.int64)),
            "mvt_bytes": pa.array([to_bytes(b) for b in blobs],
                                  pa.large_binary())})

    tiles = tile_hash_exchange(frags, per_tile,
                               num_partitions=max(8, num_shards))

    # ONE memoized fill encode shared by every interior tile
    bpx = DEFAULT_BUFFER_PX
    sq = np.array([-bpx, 256.0 + bpx, 256.0 + bpx, -bpx]), \
        np.array([-bpx, -bpx, 256.0 + bpx, 256.0 + bpx])
    _, fill_blobs = encode_tile_batch(
        np.array([0], np.int64), np.array([0], np.int8),
        np.array([KIND_POLY], np.int8), np.array([0], np.int64),
        np.zeros(1), np.zeros(1), np.zeros(1), np.zeros(1),
        {0: layer_name},
        line_verts=(sq[0], sq[1], np.array([0, 4], np.int64)))

    info = write_archive_sharded(tiles, out_dir, num_shards=num_shards,
                                 fill_runs=fill_runs,
                                 fill_blob=fill_blobs[0].as_py()
                                 if hasattr(fill_blobs[0], "as_py")
                                 else bytes(fill_blobs[0]))
    # n_fill_tiles = entries actually written (the sink drops a fill
    # that collides with a detail tile at the same coordinate);
    # n_fill_expanded = raw run expansion before that collision drop
    info["n_fill_tiles"] = info.pop("n_fills")
    info["n_fill_expanded"] = int(
        (fill_runs["y1"].to_numpy() - fill_runs["y0"].to_numpy() + 1).sum())
    info["n_runs"] = fill_runs.num_rows
    return info
