"""General-geometry tile pipeline: points, polylines and polygons →
real MVT tiles.

The "any-geometry" counterpart of the box/point image pyramid
(``pipelines/tiles.py``): a user with arbitrary GeoParquet WKB data
(``sources/geoparquet.read_geoparquet_geometries``) gets the same
render → shuffle → per-tile reduce → MVT dataflow the reference runs
for OSM geometries (``render/FeatureRenderer.java:62-98`` zoom loop,
``render/TiledGeometry.java`` slicing, per-tile encode):

    rows(geom_id, kind, xs, ys [world mercator], attrs…)
     └─ map_batches(fanout)     # per zoom: min-px gate, scale, slice
     │                          #   (points / Liang-Barsky lines /
     │                          #    Sutherland–Hodgman polygons)
     └─ groupby(tile_id)        # the tile shuffle
     └─ map_groups(encode)      # sort, real MVT encode (per-layer
     │                          #   value-deduped attrs), content hash
     └─ Dataset(tile_id, z, x, y, n_features, content_hash, mvt_bytes)

Layers: kind → MVT layer ("points" / "lines" / "polygons").  The
shuffle uses the Dataset ``groupby`` (cross-checked against the
explicit exchange in tests elsewhere); at planet scale swap in
``stages/exchange.py`` exactly like ``build_pyramid`` does.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

import ray.data

from ..tilemath.clip import (DEFAULT_BUFFER_PX, slice_lines, slice_points,
                             slice_polygons)
from ..tilemath.hashing import fnv1a_64_u64, mix64
from ..tilemath.mvt_pb import (KIND_LINE, KIND_POINT, KIND_POLY,
                               encode_tile_batch)
from ..tilemath.tilecoord import tms_encode

def pd_isnull_obj(a: np.ndarray) -> np.ndarray:
    """Vectorized null mask over an object/str numpy array (Arrow nulls
    surface as None after ``to_numpy(zero_copy_only=False)``)."""
    import pandas as pd
    return np.asarray(pd.isnull(a))


LAYER_OF_KIND = {"point": (1, "points", KIND_POINT),
                 "line": (2, "lines", KIND_LINE),
                 "polygon": (0, "polygons", KIND_POLY)}
LAYER_NAMES = {0: "polygons", 1: "points", 2: "lines"}


def _fanout(batch: pa.Table, min_zoom: int, max_zoom: int, buffer: float,
            min_pixel_size: float, attr_cols: tuple[str, ...],
            geometry_pipeline=None) -> pa.Table:
    kinds = batch["kind"].to_numpy(zero_copy_only=False)
    gids = batch["geom_id"].to_numpy()
    # optional per-row MVT layer (profile rules) overrides the
    # kind-derived layer id
    row_layer = (batch["layer_id"].to_numpy()
                 if "layer_id" in batch.schema.names else None)
    # optional per-row zoom range (ZoomFunction analog: each feature
    # carries its own min/max zoom, clipped to the pipeline's range)
    rz_min = (batch["min_zoom"].to_numpy().astype(np.int64)
              if "min_zoom" in batch.schema.names
              else np.full(batch.num_rows, min_zoom, np.int64))
    rz_max = (batch["max_zoom"].to_numpy().astype(np.int64)
              if "max_zoom" in batch.schema.names
              else np.full(batch.num_rows, max_zoom, np.int64))
    # clip to the pipeline's range (as documented): a feature with
    # max_zoom beyond it must keep its own-max-zoom size-gate escape at
    # the EFFECTIVE max zoom, not vanish because z == rz_max never fires
    rz_min = np.clip(rz_min, min_zoom, max_zoom)
    rz_max = np.clip(rz_max, min_zoom, max_zoom)
    xs_l = batch["xs"].combine_chunks()
    ys_l = batch["ys"].combine_chunks()
    offs = np.asarray(xs_l.offsets.to_numpy(), np.int64)
    fx = xs_l.flatten().to_numpy()
    fy = ys_l.flatten().to_numpy()
    counts = np.diff(offs)
    row_of_v = np.repeat(np.arange(batch.num_rows), counts)

    # bbox size per geometry for the min-pixel gate (points never gated)
    gx0 = np.full(batch.num_rows, np.inf)
    gx1 = np.full(batch.num_rows, -np.inf)
    gy0 = np.full(batch.num_rows, np.inf)
    gy1 = np.full(batch.num_rows, -np.inf)
    np.minimum.at(gx0, row_of_v, fx)
    np.maximum.at(gx1, row_of_v, fx)
    np.minimum.at(gy0, row_of_v, fy)
    np.maximum.at(gy1, row_of_v, fy)
    world_size = np.maximum(gx1 - gx0, gy1 - gy0)

    out = {k: [] for k in ("tile_id", "z", "layer", "kind", "geom_id",
                           "is_fill")}
    out_attr = {a: [] for a in attr_cols}
    out_vx, out_vy, out_nv = [], [], []

    def emit(rows, z, layer_id, kind_id, tid, x, y, vx, vy, part_offsets,
             is_fill=None):
        n = len(tid)
        if n == 0:
            return
        out["tile_id"].append(tid)
        out["z"].append(np.full(n, z, np.int8))
        out["layer"].append(row_layer[rows].astype(np.int8)
                            if row_layer is not None
                            else np.full(n, layer_id, np.int8))
        out["kind"].append(np.full(n, kind_id, np.int8))
        out["geom_id"].append(gids[rows])
        out["is_fill"].append(is_fill if is_fill is not None
                              else np.zeros(n, bool))
        for a in attr_cols:
            out_attr[a].append(batch[a].take(pa.array(rows)))
        out_vx.append(vx)
        out_vy.append(vy)
        out_nv.append(np.diff(part_offsets))

    for kind_name, (layer_id, _, kind_id) in LAYER_OF_KIND.items():
        sel = np.flatnonzero(kinds == kind_name)
        if not len(sel):
            continue
        sel_v = np.isin(row_of_v, sel)
        kx, ky = fx[sel_v], fy[sel_v]
        rep = np.repeat(np.arange(len(sel)), counts[sel])   # loop-invariant
        for z in range(max_zoom, min_zoom - 1, -1):
            f = float(1 << z)
            # per-feature zoom window; the size gate never drops a
            # feature at its OWN max zoom (reference semantics)
            zr = (rz_min[sel] <= z) & (z <= rz_max[sel])
            gate = zr if kind_name == "point" else (
                zr & ((world_size[sel] * f * 256.0 >= min_pixel_size)
                      | (z == rz_max[sel])))
            gi = np.flatnonzero(gate)
            if not len(gi):
                continue
            g_counts = counts[sel][gi]
            g_mask = np.zeros(len(sel), bool)
            g_mask[gi] = True
            g_v = g_mask[rep]
            gxv, gyv = kx[g_v] * f, ky[g_v] * f
            g_offs = np.concatenate([[0], np.cumsum(g_counts)])
            src_rows = sel[gi]
            if geometry_pipeline is not None and kind_name != "point":
                # per-zoom user GeometryPipeline hook
                # (geo/GeometryPipeline.java:14,
                # FeatureCollector.java:801-825): replaces the default
                # per-zoom geometry transform; must preserve geometry
                # COUNT (vertex streams may change freely)
                gxv, gyv, g_offs = geometry_pipeline(
                    z, kind_name, gxv, gyv, g_offs)
                g_offs = np.asarray(g_offs, np.int64)
                assert len(g_offs) - 1 == len(src_rows), \
                    "geometry_pipeline must preserve geometry count"
            if kind_name == "point":
                r = slice_points(gxv, gyv, z, buffer)
                tid = tms_encode(r["x"], r["y"], np.full(len(r["x"]), z,
                                                         np.int64))
                po = np.arange(len(r["x"]) + 1)
                emit(src_rows[r["row"]], z, layer_id, kind_id, tid,
                     r["x"], r["y"], r["px"], r["py"], po)
            elif kind_name == "line":
                r = slice_lines(gxv, gyv, g_offs, z, buffer)
                tid = tms_encode(r["x"], r["y"], np.full(len(r["x"]), z,
                                                         np.int64))
                emit(src_rows[r["line"]], z, layer_id, kind_id, tid,
                     r["x"], r["y"], r["vx"], r["vy"], r["part_offsets"])
            else:
                r = slice_polygons(gxv, gyv, g_offs, z, buffer)
                tid = tms_encode(r["x"], r["y"], np.full(len(r["x"]), z,
                                                         np.int64))
                emit(src_rows[r["row"]], z, layer_id, kind_id, tid,
                     r["x"], r["y"], r["vx"], r["vy"], r["part_offsets"],
                     r["is_fill"])

    if not out["tile_id"]:
        cols = {"tile_id": pa.array([], pa.int64()),
                "z": pa.array([], pa.int8()),
                "layer": pa.array([], pa.int8()),
                "kind": pa.array([], pa.int8()),
                "geom_id": pa.array([], pa.int64()),
                "is_fill": pa.array([], pa.bool_()),
                "vx": pa.array([], pa.list_(pa.float32())),
                "vy": pa.array([], pa.list_(pa.float32()))}
        for a in attr_cols:
            cols[a] = pa.array([], batch[a].type
                               if a in batch.schema.names else pa.string())
        return pa.table(cols)

    nv = np.concatenate(out_nv)
    off = pa.array(np.concatenate([[0], np.cumsum(nv)]).astype(np.int32))
    cols = {
        "tile_id": pa.array(np.concatenate(out["tile_id"])),
        "z": pa.array(np.concatenate(out["z"])),
        "layer": pa.array(np.concatenate(out["layer"])),
        "kind": pa.array(np.concatenate(out["kind"])),
        "geom_id": pa.array(np.concatenate(out["geom_id"])),
        "is_fill": pa.array(np.concatenate(out["is_fill"])),
        "vx": pa.ListArray.from_arrays(
            off, pa.array(np.concatenate(out_vx).astype(np.float32))),
        "vy": pa.ListArray.from_arrays(
            off, pa.array(np.concatenate(out_vy).astype(np.float32))),
    }
    for a in attr_cols:
        cols[a] = pa.concat_arrays([c.combine_chunks() if
                                    isinstance(c, pa.ChunkedArray) else c
                                    for c in out_attr[a]])
    return pa.table(cols)


def _merge_tile_lines(grp: pa.Table, attr_cols: tuple[str, ...],
                      opts: dict) -> pa.Table:
    """Per-tile mergeLineStrings (``FeatureMerge.java:101-231``): within
    each (tile, identical-attrs) group, join touching line fragments
    with the LoopLineMerger re-expression (loops/stubs/simplify per
    ``opts``), re-emitting merged fragments with id ``(min_id//10)*10``.
    Non-line rows pass through untouched.

    ``opts['extra_precision']`` (bool, default False) enables the
    reference's scaled-line pathway (``FeatureRenderer.java:260-269``):
    each tile's lines are noded/merged on the ``16·2^scale`` sub-grid
    (``scale = min(17, max(opts['max_zoom'], 14) - z)``) so base-grid
    rounding cannot create artificial endpoint intersections, then the
    merged output is unscaled back to the 1/16-px grid with the
    ``VectorTile.unscale`` walk (round half-up, collapse duplicate
    vertices, drop degenerates)."""
    from ..stages.merge import (LineMerger, line_extra_precision_scale,
                                unscale_lines)

    opts = dict(opts)
    extra_precision = bool(opts.pop("extra_precision", False))
    ep_max_zoom = int(opts.pop("max_zoom", 14))

    kind = grp["kind"].to_numpy()
    is_line = kind == KIND_LINE
    if not is_line.any():
        return grp
    keep = grp.filter(pa.array(~is_line))
    lines = grp.filter(pa.array(is_line))
    tid = lines["tile_id"].to_numpy()
    gid = lines["geom_id"].to_numpy()
    lay = lines["layer"].to_numpy()
    vx_l = lines["vx"].combine_chunks()
    vy_l = lines["vy"].combine_chunks()
    voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
    vx = vx_l.flatten().to_numpy().astype(np.float64)
    vy = vy_l.flatten().to_numpy().astype(np.float64)
    attr_arrays = {a: lines[a].to_numpy(zero_copy_only=False)
                   for a in attr_cols}
    # group key: (tile, LAYER, attr values) — merges never cross MVT
    # layers (tile ids < 2^55, layer int8 >= 0: the pack is collision-free)
    ginv = _attr_group_codes(tid * np.int64(256) + lay, attr_arrays,
                             attr_cols)
    rows = {"tile_id": [], "z": [], "layer": [], "kind": [], "geom_id": [],
            "is_fill": [], "vx": [], "vy": [], "nv": []}
    z_arr = lines["z"].to_numpy()
    for a in attr_cols:
        rows[a] = []
    for g in np.unique(ginv):
        sel = np.flatnonzero(ginv == g)
        if extra_precision:
            s = line_extra_precision_scale(int(z_arr[sel[0]]), ep_max_zoom)
            m = LineMerger(**{**opts, "precision": 16.0 * (1 << s)})
        else:
            s = None
            m = LineMerger(**opts)
        m.add_lines([np.column_stack([vx[voff[i]:voff[i + 1]],
                                      vy[voff[i]:voff[i + 1]]])
                     for i in sel])
        merged = m.merged()
        if s is not None:
            merged = unscale_lines(merged, s)
        mid = (int(gid[sel].min()) // 10) * 10
        for c in merged:
            rows["tile_id"].append(tid[sel[0]])
            rows["z"].append(z_arr[sel[0]])
            rows["layer"].append(lay[sel[0]])
            rows["kind"].append(KIND_LINE)
            rows["geom_id"].append(mid)
            rows["is_fill"].append(False)
            rows["vx"].append(c[:, 0])
            rows["vy"].append(c[:, 1])
            rows["nv"].append(len(c))
            for a in attr_cols:
                rows[a].append(attr_arrays[a][sel[0]])
    if not rows["tile_id"]:
        return keep
    nv = np.array(rows["nv"], np.int32)
    off = pa.array(np.concatenate([[0], np.cumsum(nv)]).astype(np.int32))
    merged_tbl = pa.table({
        "tile_id": pa.array(np.array(rows["tile_id"], np.int64)),
        "z": pa.array(np.array(rows["z"], np.int8)),
        "layer": pa.array(np.array(rows["layer"], np.int8)),
        "kind": pa.array(np.array(rows["kind"], np.int8)),
        "geom_id": pa.array(np.array(rows["geom_id"], np.int64)),
        "is_fill": pa.array(np.array(rows["is_fill"], bool)),
        "vx": pa.ListArray.from_arrays(
            off, pa.array(np.concatenate(rows["vx"]).astype(np.float32))),
        "vy": pa.ListArray.from_arrays(
            off, pa.array(np.concatenate(rows["vy"]).astype(np.float32))),
        **{a: pa.array(list(rows[a]),
                       lines.schema.field(a).type) for a in attr_cols},
    })
    return pa.concat_tables([keep.select(merged_tbl.column_names),
                             merged_tbl]).combine_chunks()


def _attr_group_codes(key: np.ndarray, attr_arrays: dict,
                      attr_cols: tuple[str, ...]) -> np.ndarray:
    """(packed tile/layer key, attr values…) → dense group codes via
    pairwise integer factorization (identical-attr merge semantics, no
    per-row Python)."""
    ginv = np.unique(key, return_inverse=True)[1]
    for a in attr_cols:
        col = attr_arrays[a]
        if col.dtype == object:
            col = np.where(pd_isnull_obj(col), "", col).astype("U")
        c = np.unique(col, return_inverse=True)[1]
        pair = ginv.astype(np.int64) * (np.int64(c.max()) + 1) + c
        ginv = np.unique(pair, return_inverse=True)[1]
    return ginv


def _merge_tile_polys(grp: pa.Table, attr_cols: tuple[str, ...],
                      opts: dict) -> pa.Table:
    """Per-tile mergeOverlapping/NearbyPolygons
    (``FeatureMerge.java:291-394``): within each (tile, identical-attrs)
    group, cluster polygon rings that overlap within ``min_dist`` and
    replace them with the grid-boolean union's rings (outers + holes
    share the cluster's merged id ``(min_id//10)*10`` so the encoder
    groups them into one multipolygon feature).  Rows of other kinds
    pass through untouched.  Opts: min_dist, min_area, min_hole_area,
    grid_max (see ``stages.merge.merge_overlapping_polygons``)."""
    from ..stages.merge import merge_overlapping_polygons

    kind = grp["kind"].to_numpy()
    is_poly = kind == KIND_POLY
    if not is_poly.any():
        return grp
    keep = grp.filter(pa.array(~is_poly))
    polys = grp.filter(pa.array(is_poly))
    tid = polys["tile_id"].to_numpy()
    gid = polys["geom_id"].to_numpy()
    attr_arrays = {a: polys[a].to_numpy(zero_copy_only=False)
                   for a in attr_cols}
    vx_l = polys["vx"].combine_chunks()
    vy_l = polys["vy"].combine_chunks()
    voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
    vx = vx_l.flatten().to_numpy().astype(np.float64)
    vy = vy_l.flatten().to_numpy().astype(np.float64)
    lay = polys["layer"].to_numpy()
    # (tile, LAYER, attrs) key — merges never cross MVT layers
    ginv = _attr_group_codes(tid * np.int64(256) + lay, attr_arrays,
                             attr_cols)
    z_arr = polys["z"].to_numpy()
    rows = {"tile_id": [], "z": [], "layer": [], "kind": [], "geom_id": [],
            "is_fill": [], "vx": [], "vy": [], "nv": []}
    for a in attr_cols:
        rows[a] = []
    for g in np.unique(ginv):
        sel = np.flatnonzero(ginv == g)
        # rings of one polygon = rows sharing geom_id within the group
        pids, poly_of_ring = np.unique(gid[sel], return_inverse=True)
        counts = voff[sel + 1] - voff[sel]
        loff = np.zeros(len(sel) + 1, np.int64)
        np.cumsum(counts, out=loff[1:])
        vidx = np.concatenate([np.arange(voff[i], voff[i + 1])
                               for i in sel])
        r = merge_overlapping_polygons(pids, vx[vidx], vy[vidx], loff,
                                       poly_of_ring, **opts)
        ro = r["offsets"]
        for c in range(len(r["offsets"]) - 1):
            ci = int(r["cluster"][c])
            rows["tile_id"].append(tid[sel[0]])
            rows["z"].append(z_arr[sel[0]])
            rows["layer"].append(lay[sel[0]])
            rows["kind"].append(KIND_POLY)
            rows["geom_id"].append(int(r["merged_id"][ci]))
            rows["is_fill"].append(False)
            rows["vx"].append(r["xs"][ro[c]:ro[c + 1]])
            rows["vy"].append(r["ys"][ro[c]:ro[c + 1]])
            rows["nv"].append(int(ro[c + 1] - ro[c]))
            for a in attr_cols:
                rows[a].append(attr_arrays[a][sel[0]])
    if not rows["tile_id"]:
        return keep
    nv = np.array(rows["nv"], np.int32)
    off = pa.array(np.concatenate([[0], np.cumsum(nv)]).astype(np.int32))
    merged_tbl = pa.table({
        "tile_id": pa.array(np.array(rows["tile_id"], np.int64)),
        "z": pa.array(np.array(rows["z"], np.int8)),
        "layer": pa.array(np.array(rows["layer"], np.int8)),
        "kind": pa.array(np.array(rows["kind"], np.int8)),
        "geom_id": pa.array(np.array(rows["geom_id"], np.int64)),
        "is_fill": pa.array(np.array(rows["is_fill"], bool)),
        "vx": pa.ListArray.from_arrays(
            off, pa.array(np.concatenate(rows["vx"]).astype(np.float32))),
        "vy": pa.ListArray.from_arrays(
            off, pa.array(np.concatenate(rows["vy"]).astype(np.float32))),
        **{a: pa.array(list(rows[a]),
                       polys.schema.field(a).type) for a in attr_cols},
    })
    return pa.concat_tables([keep.select(merged_tbl.column_names),
                             merged_tbl]).combine_chunks()


def _encode_tiles(grp: pa.Table, attr_cols: tuple[str, ...],
                  line_merge: dict | None = None,
                  poly_merge: dict | None = None,
                  layer_names: dict | None = None,
                  merge_rings: bool = True) -> pa.Table:
    if grp.num_rows and line_merge is not None:
        grp = _merge_tile_lines(grp, attr_cols, line_merge)
    if grp.num_rows and poly_merge is not None:
        grp = _merge_tile_polys(grp, attr_cols, poly_merge)
    if grp.num_rows == 0:
        return pa.table({"tile_id": pa.array([], pa.int64()),
                         "z": pa.array([], pa.int8()),
                         "x": pa.array([], pa.int32()),
                         "y": pa.array([], pa.int32()),
                         "n_features": pa.array([], pa.int32()),
                         "content_hash": pa.array([], pa.int64()),
                         "mvt_bytes": pa.array([], pa.large_binary())})
    order = np.lexsort((grp["geom_id"].to_numpy(), grp["layer"].to_numpy(),
                        grp["tile_id"].to_numpy()))
    grp = grp.take(pa.array(order))
    tid = grp["tile_id"].to_numpy()
    kind = grp["kind"].to_numpy()
    gid = grp["geom_id"].to_numpy()
    vx_l = grp["vx"].combine_chunks()
    vy_l = grp["vy"].combine_chunks()
    voff = np.asarray(vx_l.offsets.to_numpy(), np.int64)
    vx = vx_l.flatten().to_numpy()
    vy = vy_l.flatten().to_numpy()
    n = len(tid)
    # points ride the (ax, ay) path; lines/rings the vertex path
    is_pt = kind == KIND_POINT
    ax = np.zeros(n)
    ay = np.zeros(n)
    if is_pt.any():
        pi = np.flatnonzero(is_pt)
        ax[pi] = vx[voff[pi]]
        ay[pi] = vy[voff[pi]]
    attrs = {a: grp[a].to_numpy(zero_copy_only=False) for a in attr_cols}
    # polygon rings / line parts sharing geom_id AND identical attrs
    # merge into ONE feature with multiple rings/parts (holes inside
    # the same polygon feature, clipped way parts as one
    # multi-linestring — the reference's merged-feature output shape);
    # rows are sorted (tile, layer, geom_id) so groups are consecutive
    group = None
    if merge_rings and n > 1:
        same = ((kind[1:] != KIND_POINT) & (kind[:-1] == kind[1:])
                & (gid[1:] == gid[:-1]))
        for a in attr_cols:
            same &= attrs[a][1:] == attrs[a][:-1]
        group = np.cumsum(np.concatenate([[True], ~same]))
    utid, blobs = encode_tile_batch(
        tid, grp["layer"].to_numpy(), kind, gid, ax, ay,
        np.full(n, np.nan), np.full(n, np.nan),
        layer_names if layer_names is not None else LAYER_NAMES,
        attrs or None, line_verts=(vx, vy, voff), feature_group=group)

    from ..tilemath.tilecoord import tms_decode
    x_t, y_t, z_t = tms_decode(utid)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(tid)) + 1])
    counts = np.diff(np.concatenate([starts, [n]]))
    feat_counts = counts
    if group is not None:
        # n_features counts ENCODED features: grouped multi-ring/part
        # rows collapse into one (the encoder also re-splits groups at
        # tile/layer boundaries, so count distinct (tile, layer, group));
        # the content-hash fold below still runs over FRAGMENT rows
        lay_arr = grp["layer"].to_numpy()
        new_feat = np.ones(n, bool)
        new_feat[1:] = ((np.diff(group) != 0) | (np.diff(tid) != 0)
                        | (np.diff(lay_arr) != 0))
        feat_counts = np.add.reduceat(new_feat.astype(np.int64), starts)
    # content hash: segmented FNV fold of per-fragment hashes.  The
    # fragment hash folds the QUANTIZED vertex stream (position-weighted
    # XOR — vectorized, order-sensitive), the layer and every attr
    # value, mirroring the record path (stages/reduce.py rec_hash):
    # id-set-only hashes collide for distinct tiles crossed by the same
    # features, and the hash keys PMTiles RLE / archive blob dedup.
    from ..stages.reduce import _segmented_fnv_fold
    from ..tilemath.hashing import fnv1a_64_strings
    from ..tilemath.mvt_pb import quant
    nv = np.diff(voff)
    qvx = quant(vx).astype(np.uint64)
    qvy = quant(vy).astype(np.uint64)
    pos = (np.arange(len(vx)) - np.repeat(voff[:-1], nv)).astype(np.uint64)
    vh = mix64(qvx ^ mix64(qvy ^ mix64(pos + np.uint64(0x9E37))))
    frag_vh = np.zeros(n, np.uint64)
    ne = nv > 0
    if ne.any():
        # consecutive non-empty starts delimit exactly each non-empty
        # fragment's vertex range (empty fragments own no vertices)
        frag_vh[ne] = np.bitwise_xor.reduceat(vh, voff[:-1][ne])
    attr_h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for ci, a in enumerate(attr_cols):
            vals = np.where(pd_isnull_obj(attrs[a]), "", attrs[a])
            attr_h ^= mix64(fnv1a_64_strings(vals.astype("U"))
                            + np.uint64(0xA5A5 * (ci + 1)))
    rec = fnv1a_64_u64(mix64(gid.astype(np.uint64))
                       ^ kind.astype(np.uint64)
                       ^ mix64(grp["layer"].to_numpy().astype(np.uint64)
                               + np.uint64(0x51))
                       ^ frag_vh ^ attr_h)
    chash = _segmented_fnv_fold(rec, starts, counts)
    return pa.table({
        "tile_id": pa.array(utid),
        "z": pa.array(z_t.astype(np.int8)),
        "x": pa.array(x_t.astype(np.int32)),
        "y": pa.array(y_t.astype(np.int32)),
        "n_features": pa.array(feat_counts.astype(np.int32)),
        "content_hash": pa.array(chash.view(np.int64)),
        "mvt_bytes": blobs,
    })


def geometry_fragments(geoms: "ray.data.Dataset", min_zoom: int = 0,
                       max_zoom: int = 14,
                       buffer_px: float = DEFAULT_BUFFER_PX,
                       min_pixel_size: float = 1.0,
                       attr_cols: tuple[str, ...] = (),
                       geometry_pipeline=None
                       ) -> "ray.data.Dataset":
    """The pre-reduce fan-out fragment stream (tile_id, z, layer, kind,
    geom_id, vertices [, attrs…]) — the input both of the tile reduce
    (:func:`build_geometry_tiles`) and of the layer-stats sidecar
    (``sinks.vector_layer_stats``, the ``util/LayerAttrStats.java``
    contract)."""
    fan = partial(_fanout, min_zoom=min_zoom, max_zoom=max_zoom,
                  buffer=buffer_px / 256.0, min_pixel_size=min_pixel_size,
                  attr_cols=attr_cols, geometry_pipeline=geometry_pipeline)
    return geoms.map_batches(fan, batch_format="pyarrow")


def build_geometry_tiles(geoms: "ray.data.Dataset", min_zoom: int = 0,
                         max_zoom: int = 14,
                         buffer_px: float = DEFAULT_BUFFER_PX,
                         min_pixel_size: float = 1.0,
                         attr_cols: tuple[str, ...] = (),
                         line_merge: dict | None = None,
                         poly_merge: dict | None = None,
                         layer_names: dict | None = None,
                         shuffle: str = "exchange",
                         num_partitions: int = 64,
                         geometry_pipeline=None
                         ) -> "ray.data.Dataset":
    """rows(geom_id, kind, xs, ys [, attrs…]) → MVT tile Dataset.

    ``line_merge``: LoopLineMerger options (min_length, loop_min_length,
    stub_min_length, tolerance, precision) applied per (tile,
    identical-attrs) group inside the reduce — the
    ``FeatureMerge.mergeLineStrings`` hook.
    ``poly_merge``: polygon overlap-merge options (min_dist, min_area,
    min_hole_area, grid_max) — the
    ``FeatureMerge.mergeOverlapping/NearbyPolygons`` hook (grid-boolean
    union per (tile, identical-attrs) group).
    ``layer_names``: custom MVT layer names keyed by layer id; rows may
    carry a per-row ``layer_id`` column (profile rules) which overrides
    the kind-derived layer.
    ``geometry_pipeline``: per-zoom user geometry hook
    ``fn(z, kind, vx, vy, offsets) -> (vx, vy, offsets)`` applied to
    the zoom-scaled vertex stream of every line/polygon batch before
    tile slicing — the ``geo/GeometryPipeline.java`` /
    ``FeatureCollector.setGeometryPipeline`` analog (e.g. the
    ``tilemath.simplify`` midpoint/Chaikin smoothers).
    ``shuffle``: "exchange" (default) hash-partitions tiles into
    ``num_partitions`` explicit exchange partitions and encodes many
    tiles per reduce task — per-tile ``map_groups`` ("groupby") spends
    a task per tile, which anti-scales at planet tile counts."""
    enc = partial(_encode_tiles, attr_cols=attr_cols, line_merge=line_merge,
                  poly_merge=poly_merge, layer_names=layer_names)
    frags = geometry_fragments(geoms, min_zoom=min_zoom, max_zoom=max_zoom,
                               buffer_px=buffer_px,
                               min_pixel_size=min_pixel_size,
                               attr_cols=attr_cols,
                               geometry_pipeline=geometry_pipeline)
    if shuffle == "groupby":
        return frags.groupby("tile_id").map_groups(enc,
                                                   batch_format="pyarrow")
    # _encode_tiles sorts by (tile, layer, geom) and emits one row per
    # distinct tile — a whole hash partition encodes in one task
    from .tiles import tile_hash_exchange
    return tile_hash_exchange(frags, enc, num_partitions)
