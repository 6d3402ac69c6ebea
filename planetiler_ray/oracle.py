"""Single-process pure-Python oracle for the pyramid and join pipelines.

Deliberately SLOW and SIMPLE: per-image Python loops with independent
re-derivations of tile enumeration, label-grid limiting and kNN ranking
(FIXTURES.md §3 golden outputs).  Shares only the fixture *placement*
function and the TMS encoding constant layout with the engine — the
distributed assembly (fan-out, shuffle, grouping, dedup, density limit,
ranking) is recomputed here the naive way, so tests catch divergence in
the Ray pipeline's moving parts.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from .fixtures import georef_from_ids
from .stages.render import LABEL_GRID_LIMIT, LABEL_GRID_PX

NEIGHBOR_EPS = 0.1 / 4096


def _zoom_start(z: int) -> int:
    return (4 ** z - 1) // 3


def _tms(x: int, y: int, z: int) -> int:
    dim = 1 << z
    return _zoom_start(z) + x * dim + (dim - 1 - y)


def _box_tiles(x0, y0, x1, y1, z, buf):
    """Naive enumeration of tiles an axis-aligned box touches (+buffer)."""
    n = 1 << z
    nb = buf + NEIGHBOR_EPS
    out = []
    min_tx, max_tx = math.floor(x0 - nb), math.floor(x1 + nb)
    if max_tx - min_tx >= n:     # wider than the world: keep the
        min_tx = max(min_tx, 0)  # unwrapped body, drop wrap slivers
        max_tx = min(max_tx, n - 1)
    for tx in range(min_tx, max_tx + 1):
        for ty in range(max(0, math.floor(y0 - nb)), min(n - 1, math.floor(y1 + nb)) + 1):
            wx = tx % n
            fx0, fx1 = max(x0 - tx, -buf) * 256, min(x1 - tx, 1 + buf) * 256
            fy0, fy1 = max(y0 - ty, -buf) * 256, min(y1 - ty, 1 + buf) * 256
            if fx1 - fx0 > -NEIGHBOR_EPS * 256 and fy1 - fy0 > -NEIGHBOR_EPS * 256:
                out.append((wx, ty))
    return out


def _point_tiles(px, py, z, buf):
    n = 1 << z
    nb = buf + NEIGHBOR_EPS
    out = []
    for tx in range(math.floor(px - nb), math.floor(px + nb) + 1):
        for ty in range(max(0, math.floor(py - nb)), min(n - 1, math.floor(py + nb)) + 1):
            out.append((tx % n, ty))
    return out


def golden_tiles(ids: np.ndarray, min_zoom: int = 0, max_zoom: int = 14,
                 buffer_px: float = 4.0, min_pixel_size: float = 1.0,
                 emit_points: bool = True,
                 label_grid_limit: int = LABEL_GRID_LIMIT) -> dict:
    """Golden pyramid: {tile_id: {"zxy": (z,x,y), "features": sorted ids,
    "n_features": int}} computed the naive way."""
    g = georef_from_ids(np.asarray(ids))
    buf = buffer_px / 256.0
    # accumulate fragments: tile -> list[(layer, sort_key, idx, image_id, grid)]
    frags: dict[int, list] = defaultdict(list)
    for i, image_id in enumerate(np.asarray(ids)):
        cx, cy, hw, hh, idx = (g["cx"][i], g["cy"][i], g["hw"][i], g["hh"][i],
                               int(g["idx"][i]))
        for z in range(min_zoom, max_zoom + 1):
            f = 1 << z
            # boxes (polygon layer) are min-pixel-size gated; points never are
            if max(hw, hh) * 2 * f * 256 >= min_pixel_size or z == max_zoom:
                for (x, y) in _box_tiles((cx - hw) * f, (cy - hh) * f,
                                         (cx + hw) * f, (cy + hh) * f, z, buf):
                    frags[_tms(x, y, z)].append((0, 0, idx, str(image_id), 0, (z, x, y)))
            if emit_points:
                for (x, y) in _point_tiles(cx * f, cy * f, z, buf):
                    grid = 0
                    if z < max_zoom:
                        gs = LABEL_GRID_PX / 256.0
                        gx = math.floor((cx * f % f) / gs)
                        gy = math.floor((cy * f) / gs)
                        # +1: avoid colliding with the no-group sentinel 0
                        grid = ((gx << 32) | (gy & 0xFFFFFFFF)) + 1
                    frags[_tms(x, y, z)].append(
                        (1, idx % 1000, idx, str(image_id), grid, (z, x, y)))

    out = {}
    for tid, rows in frags.items():
        rows.sort(key=lambda r: (r[0], r[1], r[2]))
        kept = []
        grid_counts: dict[tuple, int] = defaultdict(int)
        seen = set()
        for layer, sk, idx, image_id, grid, zxy in rows:
            # dedup BEFORE the grid limit: a duplicated fragment (e.g.
            # buffer wraparound at low zoom) must not consume one of
            # the k grid slots and evict a distinct feature
            if (layer, idx) in seen:
                continue
            if grid != 0:
                key = (layer, grid)
                if grid_counts[key] >= label_grid_limit:
                    continue
                grid_counts[key] += 1
            seen.add((layer, idx))
            kept.append((layer, sk, idx, image_id, zxy))
        out[tid] = {
            "zxy": kept[0][4],
            "n_features": len(kept),
            "features": sorted({r[3] for r in kept}),
        }
    return out


def golden_join(ids: np.ndarray, zoom: int = 14, k: int = 3,
                buffer_px: float = 4.0) -> list[tuple]:
    """Golden z14 join rows: (tile_id, image_id, caption-less, knn_rank)."""
    g = georef_from_ids(np.asarray(ids))
    buf = buffer_px / 256.0
    f = 1 << zoom
    per_tile: dict[int, list] = defaultdict(list)
    zxys = {}
    for i, image_id in enumerate(np.asarray(ids)):
        cx, cy, hw, hh = g["cx"][i], g["cy"][i], g["hw"][i], g["hh"][i]
        for (x, y) in _box_tiles((cx - hw) * f, (cy - hh) * f,
                                 (cx + hw) * f, (cy + hh) * f, zoom, buf):
            tid = _tms(x, y, zoom)
            zxys[tid] = (zoom, x, y)
            tcx, tcy = (x + 0.5) / f, (y + 0.5) / f
            dist = math.hypot(cx - tcx, cy - tcy)
            per_tile[tid].append((dist, str(image_id)))
    rows = []
    for tid, cands in per_tile.items():
        cands.sort()
        for r, (dist, image_id) in enumerate(cands):
            rows.append((tid, image_id, r + 1 if r < k else 0))
    return sorted(rows)
