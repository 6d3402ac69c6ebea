"""Per-tile reduce: fragments of one Hilbert range partition → encoded tiles.

The analog of the reference's sorted-stream tile assembly
(``collection/FeatureGroup.java:339-378,527-599``) and tile encoding
(``archive/TileArchiveWriter.java:273-335``), re-expressed as one
vectorized ``groupby("part").map_groups`` stage: each group is a whole
Hilbert key-range of tiles, processed with numpy — per-tile Python
loops only in the final arrow list/binary assembly, which are O(1)
slice operations.

Steps per partition (all vectorized over every tile in the range):

1. sort fragments by (tile_id, layer, sort_key, idx) — the same total
   order the reference gets from its 64-bit external sort key
   (``FeatureGroup.java:176-180``)
2. label-grid density limit: within (tile, layer, group_id) keep the
   first ``limit`` features in sort order
   (``FeatureGroup.java:616-637``)
3. duplicate-fragment drop (same tile+layer+feature appears once)
4. encode: fixed 28-byte record per fragment (layer, kind, sort key,
   id-hash, quantized extent coords) concatenated per tile →
   ``tile_bytes``; per-tile content hash = FNV-1a fold over the
   per-record hashes in sort order (vectorized segmented fold) —
   the dedup key (analog of ``FeatureGroup.hasSameContents`` /
   ``util/Hashing.java`` content hashes)
5. emit one row per tile: ids, zxy, n_features, sorted feature_ids
   list, content_hash, tile_bytes
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tilemath.hashing import FNV1_64_INIT, FNV1_PRIME_64, fnv1a_64_u64, mix64
from ..tilemath.mvt import SCALE
from ..tilemath.tilecoord import hilbert_encode_tiles, tms_decode
from .render import LABEL_GRID_LIMIT

RECORD_DTYPE = np.dtype([
    ("layer", "u1"), ("kind", "u1"), ("sort_key", "<u2"),
    ("id_hash", "<u8"),
    ("x0", "<i4"), ("y0", "<i4"), ("x1", "<i4"), ("y1", "<i4"),
])


def _segmented_fnv_fold(rec_hash: np.ndarray, starts: np.ndarray,
                        counts: np.ndarray) -> np.ndarray:
    """FNV-1a fold of consecutive record hashes per tile, vectorized.

    ``h = (h ^ rec_i) * prime`` applied in order within each segment;
    iterates over *position-within-tile* so the total work is
    O(total fragments) regardless of skew.
    """
    h = np.full(len(starts), FNV1_64_INIT, dtype=np.uint64)
    active = np.arange(len(starts))
    k = 0
    with np.errstate(over="ignore"):
        while len(active):
            live = counts[active] > k
            active = active[live]
            if not len(active):
                break
            r = rec_hash[starts[active] + k]
            h[active] = (h[active] ^ r) * FNV1_PRIME_64
            k += 1
    return h


def reduce_partition(group: pa.Table, label_grid_limit: int = LABEL_GRID_LIMIT,
                     with_feature_ids: bool = True,
                     tile_post_process=None,
                     mvt_attrs: tuple[str, ...] | None = None,
                     layer_names: dict[int, str] | None = None,
                     skip_filled_tiles: bool = False,
                     max_point_buffer: float | None = None) -> pa.Table:
    """Reduce all fragments of one partition into encoded tile rows.

    ``tile_post_process``: optional profile hook
    (``Profile.post_process_tile`` — the ``postProcessTileFeatures``
    analog): receives the partition's sorted/limited fragment arrays as
    a dict (tile, layer, kind, sort_key, idx, ax, ay, bx, by, is_fill)
    and returns the same dict, possibly with rows dropped or geometry
    modified — vectorized across every tile in the partition.

    ``mvt_attrs``: when given, an extra ``mvt_bytes`` column holds a
    REAL Mapbox-Vector-Tile protobuf per tile (``tilemath.mvt_pb``,
    batch-vectorized across the whole partition) with the named
    fragment columns as per-feature attributes
    (``VectorTile.java:502-599`` semantics).
    """
    n = group.num_rows
    if n == 0:
        # must match the non-empty schema exactly, INCLUDING mvt_bytes
        # when mvt_attrs is set — blocks of one Dataset may not disagree
        return _empty_tiles_table(with_feature_ids,
                                  with_mvt=mvt_attrs is not None)
    fr = prepare_fragments(group, label_grid_limit, tile_post_process,
                           mvt_attrs, skip_filled_tiles, max_point_buffer)
    if fr is None:
        return _empty_tiles_table(with_feature_ids,
                                  with_mvt=mvt_attrs is not None)
    tile, layer, kind = fr["tile"], fr["layer"], fr["kind"]
    sort_key, idx = fr["sort_key"], fr["idx"]
    ax, ay, bx, by = fr["ax"], fr["ay"], fr["bx"], fr["by"]
    image_id, attr_vals = fr["image_id"], fr["attr_vals"]
    return _encode_prepared(tile, layer, kind, sort_key, idx, ax, ay, bx, by,
                            with_feature_ids, image_id, attr_vals, mvt_attrs,
                            layer_names)


def prepare_fragments(group: pa.Table, label_grid_limit: int = LABEL_GRID_LIMIT,
                      tile_post_process=None,
                      mvt_attrs: tuple[str, ...] | None = None,
                      skip_filled_tiles: bool = False,
                      max_point_buffer: float | None = None) -> dict | None:
    """Steps 1–3 of the per-partition reduce (big sort, label-grid
    limit, duplicate drop, output-shaping flags, profile hook) as a
    reusable front-half: returns the sorted/limited fragment arrays, or
    ``None`` when nothing survives.  ``reduce_partition`` and the driver
    tile summaries share this so their inputs stay byte-identical."""
    n = group.num_rows
    if n == 0:
        return None

    tile = group["tile_id"].to_numpy()
    layer = group["layer"].to_numpy()
    sort_key = group["sort_key"].to_numpy()
    idx = group["idx"].to_numpy()
    gid = group["group_id"].to_numpy()

    # 1. the big within-partition sort (reference: external merge sort order)
    order = np.lexsort((idx, sort_key, layer, tile))
    tile = tile[order]
    layer = layer[order]
    sort_key = sort_key[order]
    idx = idx[order]
    gid = gid[order]

    # 2. drop duplicate (tile, layer, idx) fragments BEFORE the grid
    # limit — a duplicated fragment must not consume two of the k grid
    # slots and evict a distinct feature (dirty-input case)
    dup = np.zeros(n, dtype=bool)
    same = (np.diff(tile) == 0) & (np.diff(layer) == 0) & (np.diff(idx) == 0)
    dup[1:] = same
    keep = ~dup

    # 3. label-grid limit: rank within (tile, layer, group_id), arrival
    # order, counted over distinct fragments only
    from .render import label_grid_keep_mask
    uniq = np.nonzero(keep)[0]
    keep_uniq = label_grid_keep_mask(tile[uniq], layer[uniq], gid[uniq],
                                     sort_key[uniq], idx[uniq],
                                     label_grid_limit)
    keep[uniq] &= keep_uniq

    sel = np.nonzero(keep)[0]
    tile, layer, sort_key, idx = tile[sel], layer[sel], sort_key[sel], idx[sel]
    osel = order[sel]
    kind = group["kind"].to_numpy()[osel]

    def _px(col: str) -> np.ndarray:
        """Wire coords back to tile px.  int16 columns carry
        PRE-QUANTIZED extent units (render._q16): /SCALE is exact in
        binary, so re-quantizing below reproduces the same integers
        bit-for-bit; the Q16 NaN sentinel round-trips to NaN.  float
        columns (older fixtures / direct callers) pass through."""
        v = group[col].to_numpy()[osel]
        if v.dtype == np.int16:
            out = v.astype(np.float64) / SCALE
            out[v == np.int16(-32768)] = np.nan
            return out
        return v

    ax = _px("ax")
    ay = _px("ay")
    bx = _px("bx")
    by = _px("by")
    is_fill = (group["is_fill"].to_numpy()[osel]
               if "is_fill" in group.column_names else np.zeros(len(osel), bool))
    image_id = (group["image_id"].to_numpy(zero_copy_only=False)[osel]
                if "image_id" in group.column_names else None)
    attr_vals = {a: group[a].to_numpy(zero_copy_only=False)[osel]
                 for a in (mvt_attrs or ()) if a in group.column_names}
    m = len(tile)
    if m == 0:
        return None

    if tile_post_process is not None:
        frags = {"tile": tile, "layer": layer, "kind": kind, "sort_key": sort_key,
                 "idx": idx, "ax": ax, "ay": ay, "bx": bx, "by": by,
                 "is_fill": is_fill, **attr_vals}
        had_image_id = image_id is not None
        if had_image_id:
            frags["image_id"] = image_id
        frags = tile_post_process(frags)
        tile, layer, kind = frags["tile"], frags["layer"], frags["kind"]
        sort_key, idx = frags["sort_key"], frags["idx"]
        ax, ay, bx, by = frags["ax"], frags["ay"], frags["bx"], frags["by"]
        is_fill = frags.get("is_fill", np.zeros(len(tile), bool))
        if had_image_id:
            if "image_id" not in frags:
                # a hook must hand back the id column it was given — falling
                # back to the stale pre-hook array silently misassigns ids
                raise ValueError("post_process_tile hook dropped 'image_id'; "
                                 "hooks must return every id/attr column "
                                 "they received")
            image_id = frags["image_id"]
        for a in list(attr_vals):
            if a not in frags:
                raise ValueError(f"post_process_tile hook dropped attr column "
                                 f"{a!r}; hooks must return every id/attr "
                                 f"column they received")
            attr_vals[a] = frags[a]
        m = len(tile)
        if m == 0:
            return None

    # output-shaping flags (config/PlanetilerConfig.java:55-71)
    def _filter_rows(mask: np.ndarray):
        nonlocal tile, layer, kind, sort_key, idx, ax, ay, bx, by, is_fill
        nonlocal image_id, m
        tile, layer, kind = tile[mask], layer[mask], kind[mask]
        sort_key, idx = sort_key[mask], idx[mask]
        ax, ay, bx, by = ax[mask], ay[mask], bx[mask], by[mask]
        is_fill = is_fill[mask]
        if image_id is not None:
            image_id = image_id[mask]
        for a in attr_vals:
            attr_vals[a] = attr_vals[a][mask]
        m = len(tile)

    if max_point_buffer is not None:
        # removePointsOutsideBuffer (FeatureMerge.java:678-695)
        b = float(max_point_buffer)
        is_pt = kind == 1
        bad = is_pt & ((ax < -b) | (ax > 256.0 + b) | (ay < -b) | (ay > 256.0 + b))
        if bad.any():
            _filter_rows(~bad)
            if m == 0:
                return None
    if skip_filled_tiles and m:
        # drop tiles whose every fragment is an interior fill
        tb = np.flatnonzero(np.diff(tile)) + 1
        ts = np.concatenate([[0], tb])
        tc = np.diff(np.concatenate([ts, [m]]))
        all_fill = np.add.reduceat(is_fill.astype(np.int64), ts) == tc
        if all_fill.any():
            drop_tiles = np.repeat(all_fill, tc)
            _filter_rows(~drop_tiles)
            if m == 0:
                return None

    return {"tile": tile, "layer": layer, "kind": kind,
            "sort_key": sort_key, "idx": idx, "ax": ax, "ay": ay,
            "bx": bx, "by": by, "is_fill": is_fill, "image_id": image_id,
            "attr_vals": attr_vals}


def _encode_prepared(tile, layer, kind, sort_key, idx, ax, ay, bx, by,
                     with_feature_ids, image_id, attr_vals,
                     mvt_attrs=None, layer_names=None) -> pa.Table:
    m = len(tile)
    # 4. encode fixed-width records (quantize px → extent units, MVT scale)
    rec = np.zeros(m, dtype=RECORD_DTYPE)
    rec["layer"] = layer
    rec["kind"] = kind
    rec["sort_key"] = (sort_key & 0xFFFF).astype(np.uint16)
    rec["id_hash"] = mix64(idx.astype(np.uint64))
    # quantize in float64 (f32 storage, f64 math — pinned so the SQL
    # oracle can reproduce it with CAST(... AS FLOAT)::DOUBLE)
    q = lambda v: np.where(np.isnan(v), np.int32(-(1 << 30)),
                           np.floor(np.asarray(v, np.float64) * SCALE + 0.5)
                           ).astype(np.int32)
    rec["x0"], rec["y0"], rec["x1"], rec["y1"] = q(ax), q(ay), q(bx), q(by)

    rec_hash = fnv1a_64_u64(
        rec["id_hash"] ^
        (rec["x0"].astype(np.int64).astype(np.uint64) << np.uint64(32)) ^
        rec["y0"].astype(np.int64).astype(np.uint64) ^
        mix64((rec["x1"].astype(np.int64) * 2654435761 + rec["y1"].astype(np.int64)
               + rec["layer"].astype(np.int64) * 7 + rec["kind"].astype(np.int64)
               ).astype(np.uint64)))

    # tile boundaries in the sorted fragment stream
    bounds = np.flatnonzero(np.diff(tile)) + 1
    starts = np.concatenate([[0], bounds])
    counts = np.diff(np.concatenate([starts, [m]]))
    n_tiles = len(starts)

    content_hash = _segmented_fnv_fold(rec_hash, starts, counts).view(np.int64)

    # zxy + hilbert recomputed from the tile id (slim-shuffle friendly)
    t_ids = tile[starts]
    x_t, y_t, z_t = tms_decode(t_ids)
    hil_t = hilbert_encode_tiles(x_t, y_t, z_t)

    # tile_bytes: one slice of the big record buffer per tile (zero-copy arrow)
    buf = rec.tobytes()
    rs = RECORD_DTYPE.itemsize
    offsets = np.empty(n_tiles + 1, dtype=np.int64)
    offsets[:-1] = starts * rs
    offsets[-1] = m * rs
    tile_bytes = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n_tiles,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf)])

    cols: dict[str, object] = {
        "tile_id": t_ids,
        "hilbert_id": hil_t,
        "z": z_t.astype(np.int8),
        "x": x_t.astype(np.int32),
        "y": y_t.astype(np.int32),
        "n_features": counts.astype(np.int32),
        "content_hash": content_hash,
    }

    result = pa.table(cols)
    if mvt_attrs is not None:
        from ..tilemath.mvt_pb import encode_tile_batch
        names = layer_names or {0: "chips", 1: "labels"}
        _, mvt_arr = encode_tile_batch(
            tile, layer, kind, idx, ax, ay, bx, by, names,
            {a: attr_vals[a] for a in mvt_attrs if a in attr_vals})
        result = result.append_column("mvt_bytes", mvt_arr)
    if with_feature_ids:
        # sorted unique feature id list per tile (golden-output column)
        import pandas as pd
        if image_id is None:
            image_id = np.char.add("img", np.char.zfill(idx.astype(str), 8))
        tid_rep = np.repeat(np.arange(n_tiles), counts)
        df = pd.DataFrame({"t": tid_rep, "f": image_id})
        df = df.drop_duplicates().sort_values(["t", "f"], kind="stable")
        fcounts = np.bincount(df["t"].to_numpy(), minlength=n_tiles)
        foff = np.zeros(n_tiles + 1, dtype=np.int32)
        np.cumsum(fcounts, out=foff[1:])
        flist = pa.ListArray.from_arrays(
            pa.array(foff, pa.int32()),
            pa.array(df["f"].to_numpy().tolist(), pa.string()))
        result = result.append_column("feature_ids", flist)
    return result.append_column("tile_bytes", tile_bytes)


def _empty_tiles_table(with_feature_ids: bool = True,
                       with_mvt: bool = False) -> pa.Table:
    t = pa.table({
        "tile_id": pa.array([], pa.int64()), "hilbert_id": pa.array([], pa.int64()),
        "z": pa.array([], pa.int8()), "x": pa.array([], pa.int32()),
        "y": pa.array([], pa.int32()), "n_features": pa.array([], pa.int32()),
        "content_hash": pa.array([], pa.int64()),
    })
    if with_mvt:
        t = t.append_column("mvt_bytes", pa.array([], pa.large_binary()))
    if with_feature_ids:
        t = t.append_column("feature_ids", pa.array([], pa.list_(pa.string())))
    return t.append_column("tile_bytes", pa.array([], pa.large_binary()))
