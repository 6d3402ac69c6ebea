"""Label-grid ids for point density limiting, matching ``geo/GeoUtils.java:410-427``.

``labelGridId(tilesAtZoom, gridSize, coord)`` = pack
``(floor(wrap(x)/gridSize), floor(y/gridSize))`` into one int64:
``(a << 32) | (b & 0xFFFFFFFF)``.  Coordinates are in tile units at the
zoom level; ``gridSize`` is a tile fraction (e.g. 32 px / 256 = 0.125).
"""

from __future__ import annotations

import numpy as np


def wrap_double(value: np.ndarray, max_value: float) -> np.ndarray:
    """``GeoUtils.wrapDouble`` — wrap into [0, max)."""
    v = np.mod(np.asarray(value, dtype=np.float64), max_value)
    return np.where(v < 0, v + max_value, v)


def label_grid_id(tiles_at_zoom: int, grid_size: float, x, y) -> np.ndarray:
    """Vectorized grid-square id for each (x, y) in tile units."""
    gx = np.floor(wrap_double(x, tiles_at_zoom) / grid_size).astype(np.int64)
    gy = np.floor(np.asarray(y, dtype=np.float64) / grid_size).astype(np.int64)
    return (gx.astype(np.uint64) << np.uint64(32) |
            (gy.astype(np.uint64) & np.uint64(0xFFFFFFFF))).view(np.int64)
