"""Render fan-out: georeferenced chips → per-tile per-zoom fragments.

The analog of the reference's per-feature render loop
(``render/FeatureRenderer.java:62-98``): for each zoom from max down to
min, gate by minimum pixel size, scale to tile units, slice into the
tiles the geometry touches (``render/TiledGeometry.java``), and emit one
row per (tile, feature) fragment keyed for the big shuffle.

Two layers are emitted per chip, mirroring a typical profile:

- layer 0 ``chips``:  the footprint box, clipped per tile (+fill detection)
- layer 1 ``labels``: the centroid point, with a label-grid group id for
  density limiting (``FeatureCollector.java:890-991`` pointLabelGridâ€¦)

Output schema (one Arrow table per input batch, ~Σ_z fanout rows):

    tile_id:int64  hilbert_id:int64  part:int32  z:int8  x:int32 y:int32
    layer:int8  kind:int8(0=box,1=point)  idx:int64  image_id:str
    sort_key:int16  group_id:int16 (local grid cell)
    ax,ay,bx,by:int16 (PRE-QUANTIZED extent units, see _q16)
    (narrow shuffle dtypes — 14 fewer bytes/row through the exchange
    than the round-3 layout, exactly round-tripping the reduce's f64
    quantization and keep-mask winners)
    is_fill:bool  cx,cy:float64 (world centroid, for kNN)

``part`` is the explicit Hilbert range-partition id (searchsorted into
broadcast bounds) — the shuffle key for ``groupby("part")``, chosen so
spatially adjacent tiles land in the same partition (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tilemath.clip import DEFAULT_BUFFER_PX, slice_boxes, slice_points
from ..tilemath.extents import TileExtents
from ..tilemath.labelgrid import label_grid_id
from ..tilemath.tilecoord import hilbert_encode_tiles, tms_encode

LAYER_CHIPS = 0
LAYER_LABELS = 1
KIND_BOX = 0
KIND_POINT = 1

# label-grid defaults for the labels layer (active below max zoom):
# 32 px grid squares, keep the best 4 per square (FeatureCollector-style)
LABEL_GRID_PX = 32.0
LABEL_GRID_LIMIT = 4

# fragment coords travel the exchange PRE-QUANTIZED to MVT extent units
# (floor(px*16 + 0.5), int16): 2 bytes instead of a float32, and the
# round trip back to px (q/16, exact in binary) reproduces the reduce's
# f64 quantization bit-for-bit — the same trick the archive sinks use
# for fixed-width records (records_to_mvt_pb_batch).  Q16_NAN marks the
# unused corners of point fragments.
Q16_NAN = np.int16(-32768)


def _q16(v: np.ndarray) -> np.ndarray:
    from ..tilemath.mvt import SCALE
    q = np.floor(np.asarray(v, np.float64) * SCALE + 0.5)
    return np.clip(q, -32000, 32000).astype(np.int16)


def label_grid_keep_mask(tile, layer, gid, sort_key, idx, limit: int) -> np.ndarray:
    """Mask of rows surviving the per-(tile, layer, grid-group) limit.

    Keeps the ``limit`` lowest-(sort_key, idx) features of each label
    grid square (``collection/FeatureGroup.java:616-637``).  Used both
    as a pre-shuffle combiner (per batch) and as the exact pass in the
    per-tile reduce — keep-k is associative, so partial-then-final gives
    the same winners.
    """
    n = len(tile)
    keep = np.ones(n, dtype=bool)
    g = gid != 0
    if not g.any():
        return keep
    ti, la, gr = tile[g], layer[g], gid[g]
    sk, ix = sort_key[g], idx[g]
    order = np.lexsort((ix, sk, gr, la, ti))
    ts, ls, gs = ti[order], la[order], gr[order]
    change = np.empty(len(order), dtype=bool)
    change[0] = True
    change[1:] = (np.diff(ts) != 0) | (np.diff(ls) != 0) | (np.diff(gs) != 0)
    rank = np.arange(len(order)) - np.flatnonzero(change)[np.cumsum(change) - 1]
    sub_keep = np.ones(len(order), dtype=bool)
    sub_keep[order[rank >= limit]] = False
    keep[np.nonzero(g)[0]] = sub_keep
    return keep


class RenderConfig:
    """Pipeline configuration (the 'profile' analog, declarative subset).

    Output-shaping flags mirror ``config/PlanetilerConfig.java:55-71``:

    - ``exclude_ids``: feature idx values dropped at the fan-out
    - ``skip_filled_tiles``: tiles whose every fragment is an interior
      fill are dropped in the reduce
    - ``max_point_buffer``: points farther than this many px outside
      the tile are dropped in the reduce
      (``FeatureMerge.removePointsOutsideBuffer``, ``:678-695``)

    Per-feature zoom windows (``util/ZoomFunction`` semantics): when the
    georef batch has ``feat_min_zoom`` / ``feat_max_zoom`` columns, each
    feature is only rendered at zooms inside its own window.
    """

    def __init__(self, min_zoom: int = 0, max_zoom: int = 14,
                 buffer_px: float = DEFAULT_BUFFER_PX, min_pixel_size: float = 1.0,
                 bounds: tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0),
                 emit_points: bool = True,
                 exclude_ids: frozenset[int] | None = None,
                 skip_filled_tiles: bool = False,
                 max_point_buffer: float | None = None):
        self.min_zoom = min_zoom
        self.max_zoom = max_zoom
        self.buffer = buffer_px / 256.0
        self.min_pixel_size = min_pixel_size
        self.extents = TileExtents.compute_from_world_bounds(max_zoom, bounds)
        self.emit_points = emit_points
        self.exclude_ids = exclude_ids
        self.skip_filled_tiles = skip_filled_tiles
        self.max_point_buffer = max_point_buffer


def render_fanout(batch: pa.Table, cfg: RenderConfig,
                  part_bounds: np.ndarray | None = None,
                  slim: bool = False,
                  extra_cols: tuple[str, ...] = ()) -> pa.Table:
    """Fan one georeferenced batch out to per-tile fragments at all zooms.

    ``slim=True`` drops the columns the pyramid reduce can recompute
    (image_id string, cx/cy, hilbert_id, z/x/y) so the big shuffle moves
    ~half the bytes — the analog of the reference's compact 64-bit-key +
    msgpack-value representation (``collection/SortableFeature.java``).
    The output is sorted by ``part`` so the exchange can slice blocks
    zero-copy.
    """
    if cfg.exclude_ids:
        mask = ~np.isin(batch["idx"].to_numpy(),
                        np.fromiter(cfg.exclude_ids, dtype=np.int64))
        batch = batch.filter(pa.array(mask))
    ids = batch["image_id"].to_numpy(zero_copy_only=False)
    idx = batch["idx"].to_numpy()
    cx = batch["cx"].to_numpy()
    cy = batch["cy"].to_numpy()
    hw = batch["hw"].to_numpy()
    hh = batch["hh"].to_numpy()
    feat_minz = (batch["feat_min_zoom"].to_numpy()
                 if "feat_min_zoom" in batch.column_names else None)
    feat_maxz = (batch["feat_max_zoom"].to_numpy()
                 if "feat_max_zoom" in batch.column_names else None)

    out: dict[str, list[np.ndarray]] = {k: [] for k in (
        "row", "z", "x", "y", "layer", "kind", "sort_key", "group_id",
        "ax", "ay", "bx", "by", "is_fill")}

    world_size = np.maximum(hw, hh) * 2  # larger dimension in world units

    for z in range(cfg.max_zoom, cfg.min_zoom - 1, -1):
        f = float(1 << z)
        # per-feature zoom window (ZoomFunction minzoom/maxzoom analog)
        zoom_ok = np.ones(len(idx), dtype=bool)
        if feat_minz is not None:
            zoom_ok &= feat_minz <= z
        if feat_maxz is not None:
            zoom_ok &= z <= feat_maxz
        # min-pixel-size gate (FeatureRenderer.java:73-95): boxes (the
        # polygon layer) smaller than min_pixel_size px at this zoom are
        # skipped except at maxzoom; POINTS are never size-gated.
        gate = ((world_size * f * 256.0 >= cfg.min_pixel_size)
                | (z == cfg.max_zoom)) & zoom_ok
        gi = np.nonzero(gate)[0]

        boxes = slice_boxes((cx[gi] - hw[gi]) * f, (cy[gi] - hh[gi]) * f,
                            (cx[gi] + hw[gi]) * f, (cy[gi] + hh[gi]) * f,
                            z, cfg.buffer, cfg.extents) if len(gi) else None
        nb = len(boxes["row"]) if boxes is not None else 0
        if nb:
            out["row"].append(gi[boxes["row"]])
            out["z"].append(np.full(nb, z, np.int8))
            out["x"].append(boxes["x"].astype(np.int32))
            out["y"].append(boxes["y"].astype(np.int32))
            out["layer"].append(np.full(nb, LAYER_CHIPS, np.int8))
            out["kind"].append(np.full(nb, KIND_BOX, np.int8))
            out["sort_key"].append(np.zeros(nb, np.int16))
            out["group_id"].append(np.zeros(nb, np.int16))
            out["ax"].append(_q16(boxes["fx0"]))
            out["ay"].append(_q16(boxes["fy0"]))
            out["bx"].append(_q16(boxes["fx1"]))
            out["by"].append(_q16(boxes["fy1"]))
            out["is_fill"].append(boxes["is_fill"])

        if cfg.emit_points:
            pi = np.nonzero(zoom_ok)[0]
            pts = slice_points(cx[pi] * f, cy[pi] * f, z, cfg.buffer, cfg.extents)
            np_ = len(pts["row"])
            if np_:
                prow = pi[pts["row"]]
                out["row"].append(prow)
                out["z"].append(np.full(np_, z, np.int8))
                out["x"].append(pts["x"].astype(np.int32))
                out["y"].append(pts["y"].astype(np.int32))
                out["layer"].append(np.full(np_, LAYER_LABELS, np.int8))
                out["kind"].append(np.full(np_, KIND_POINT, np.int8))
                # sort key: chip index ordering (deterministic density rank)
                out["sort_key"].append((idx[prow] % 1000).astype(np.int16))
                # grid id narrowed to a LOCAL cell id: the limit groups
                # by (tile, layer, cell) and a tile's buffered span covers
                # at most ceil((256 + 2*buffer_px)/LABEL_GRID_PX) + 1 = 10
                # grid cells per side (32 px cells), so (gx mod 16, gy mod
                # 16) is bijective to the global cell within any one tile —
                # 2 bytes/row through the exchange instead of the packed
                # 64-bit global id.  +1 so a real cell can't collide with
                # the group_id==0 sentinel.
                g = label_grid_id(1 << z, LABEL_GRID_PX / 256.0,
                                  cx[prow] * f,
                                  cy[prow] * f).view(np.uint64)
                local = (((g >> np.uint64(32)) & np.uint64(15))
                         << np.uint64(4)
                         | (g & np.uint64(15))).astype(np.int16) + np.int16(1)
                out["group_id"].append(np.where(z < cfg.max_zoom, local,
                                                np.int16(0)))
                out["ax"].append(_q16(pts["px"]))
                out["ay"].append(_q16(pts["py"]))
                out["bx"].append(np.full(np_, Q16_NAN, np.int16))
                out["by"].append(np.full(np_, Q16_NAN, np.int16))
                out["is_fill"].append(np.zeros(np_, bool))

    if not out["row"]:
        return _empty_fragments_table(slim)

    cat = {k: np.concatenate(v) for k, v in out.items()}
    row = cat.pop("row")
    z_arr = cat["z"].astype(np.int64)
    tile_id = tms_encode(cat["x"], cat["y"], z_arr)

    # pre-shuffle combiner: drop duplicate (tile, layer, idx) fragments
    # (buffer wraparound at low zoom emits the same fragment twice into
    # one tile), then apply the label-grid limit within this batch so
    # low-zoom tiles (which collect every point) don't flood the
    # shuffle.  Dedup FIRST, exactly like the final reduce — a
    # duplicate must not consume a grid slot in either pass, or
    # partial-then-final keep-k stops being associative.
    ridx = idx[row]
    order = np.lexsort((ridx, cat["layer"], tile_id))
    dup_sorted = np.zeros(len(order), bool)
    dup_sorted[1:] = ((np.diff(tile_id[order]) == 0)
                      & (np.diff(cat["layer"][order]) == 0)
                      & (np.diff(ridx[order]) == 0))
    keep = np.ones(len(order), bool)
    keep[order] = ~dup_sorted
    uniq = np.nonzero(keep)[0]
    keep[uniq] &= label_grid_keep_mask(
        tile_id[uniq], cat["layer"][uniq], cat["group_id"][uniq],
        cat["sort_key"][uniq], ridx[uniq], LABEL_GRID_LIMIT)
    if not keep.all():
        tile_id = tile_id[keep]
        row = row[keep]
        z_arr = z_arr[keep]
        cat = {k: v[keep] for k, v in cat.items()}
    # global hilbert id: per-zoom hilbert index + zoom start offset
    hil = hilbert_encode_tiles(cat["x"], cat["y"], z_arr)

    part = (np.searchsorted(part_bounds, hil, side="right").astype(np.int32)
            if part_bounds is not None else np.zeros(len(hil), np.int32))

    # pre-sort by part: the exchange slices blocks zero-copy (no re-sort)
    order = np.argsort(part, kind="stable")

    cols = {
        "tile_id": tile_id[order],
        "part": part[order],
        "layer": cat["layer"][order],
        "kind": cat["kind"][order],
        "idx": idx[row][order],
        "sort_key": cat["sort_key"][order],
        "group_id": cat["group_id"][order],
        "ax": cat["ax"][order], "ay": cat["ay"][order],
        "bx": cat["bx"][order], "by": cat["by"][order],
        "is_fill": cat["is_fill"][order],
    }
    if not slim:
        cols["hilbert_id"] = hil[order]
        cols["z"] = cat["z"][order]
        cols["x"] = cat["x"][order]
        cols["y"] = cat["y"][order]
        cols["image_id"] = pa.array(ids[row][order].tolist(), type=pa.string())
        cols["cx"] = cx[row][order]
        cols["cy"] = cy[row][order]
    for name in extra_cols:
        # vectorized passthrough of source columns (e.g. caption) — arrow take
        cols[name] = batch[name].take(pa.array(row[order]))
    return pa.table(cols)


def _empty_fragments_table(slim: bool = False) -> pa.Table:
    cols = {
        "tile_id": pa.array([], pa.int64()), "part": pa.array([], pa.int32()),
        "layer": pa.array([], pa.int8()), "kind": pa.array([], pa.int8()),
        "idx": pa.array([], pa.int64()), "sort_key": pa.array([], pa.int16()),
        "group_id": pa.array([], pa.int16()), "ax": pa.array([], pa.int16()),
        "ay": pa.array([], pa.int16()), "bx": pa.array([], pa.int16()),
        "by": pa.array([], pa.int16()), "is_fill": pa.array([], pa.bool_()),
    }
    if not slim:
        cols["hilbert_id"] = pa.array([], pa.int64())
        cols["z"] = pa.array([], pa.int8())
        cols["x"] = pa.array([], pa.int32())
        cols["y"] = pa.array([], pa.int32())
        cols["image_id"] = pa.array([], pa.string())
        cols["cx"] = pa.array([], pa.float64())
        cols["cy"] = pa.array([], pa.float64())
    return pa.table(cols)


def compute_partition_bounds(sample_hilbert: np.ndarray, num_partitions: int) -> np.ndarray:
    """Range-partition bounds from a sample of hilbert ids.

    Equal-frequency quantiles over the sampled fragment keys — the
    explicit-range-partition analog of the reference's external sort
    chunking (``collection/ExternalMergeSort.java``).  Dense (skewed)
    key ranges automatically get narrower partitions because quantiles
    are equal-count; this is the skew-splitting mechanism (hot city
    tiles spread over many partitions of few tiles each).
    """
    if len(sample_hilbert) == 0 or num_partitions <= 1:
        return np.array([], dtype=np.int64)
    qs = np.quantile(np.asarray(sample_hilbert, dtype=np.int64),
                     np.linspace(0, 1, num_partitions + 1)[1:-1])
    return np.unique(qs.astype(np.int64))
