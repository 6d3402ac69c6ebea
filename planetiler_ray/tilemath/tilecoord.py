"""TileCoord global indexes, vectorized.

Semantics of reference ``geo/TileCoord.java``:

- global TMS index: ``startIndexForZoom(z) + tmsXYToPosition(z, x, y)``
  where start index is the prefix sum of 4^z tile counts
  (``TileCoord.java:30-44,84-86``) and
  ``tmsXYToPosition(z,x,y) = x·2^z + (2^z − 1 − y)`` (``:169-172``).
- global Hilbert index: ``startIndexForZoom(z) + hilbertXYToIndex(z,x,y)``
  (``TileCoord.java:158-161``).
- tile containing a world coordinate: ``floor(worldX·2^z)``
  (``TileCoord.java:77-82`` aroundLngLat, via GeoUtils world coords).
"""

from __future__ import annotations

import numpy as np

from .hilbert import hilbert_position_to_xy, hilbert_xy_to_index

MAX_MAXZOOM = 15

# prefix sums of 4^z: start index of each zoom level in the global order
_ZOOM_START = np.zeros(MAX_MAXZOOM + 2, dtype=np.int64)
for _z in range(1, MAX_MAXZOOM + 2):
    _ZOOM_START[_z] = _ZOOM_START[_z - 1] + (1 << (2 * (_z - 1)))


def zoom_start_index(z) -> np.ndarray | int:
    """Start of zoom level ``z`` in the global index (``TileCoord.java:30-44``)."""
    if np.isscalar(z):
        return int(_ZOOM_START[z])
    return _ZOOM_START[np.asarray(z, dtype=np.int64)]


def tms_encode(x, y, z) -> np.ndarray:
    """(x, y, z) → global TMS-ordered int64 index. ``TileCoord.java:84-86,169-172``."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(z, dtype=np.int64)
    dim = np.int64(1) << z
    return _ZOOM_START[z] + x * dim + (dim - 1 - y)


def tms_decode(encoded) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global index → (x, y, z). ``TileCoord.java:45-52,163-168``."""
    encoded = np.asarray(encoded, dtype=np.int64)
    z = (np.searchsorted(_ZOOM_START, encoded, side="right") - 1).astype(np.int64)
    pos = encoded - _ZOOM_START[z]
    dim = np.int64(1) << z
    x = pos // dim
    y = dim - 1 - (pos % dim)
    return x, y, z


def hilbert_encode_tile(x, y, z: int) -> np.ndarray:
    """(x, y) at zoom ``z`` → global Hilbert-ordered index. ``TileCoord.java:158-161``."""
    return zoom_start_index(z) + hilbert_xy_to_index(z, x, y)


def hilbert_encode_tiles(x: np.ndarray, y: np.ndarray,
                         z: np.ndarray) -> np.ndarray:
    """Mixed-zoom batch form of :func:`hilbert_encode_tile` — the ONE
    home of the per-unique-z loop (previously copied at every sink and
    pipeline call site)."""
    out = np.empty(len(x), np.int64)
    for zv in np.unique(z):
        m = z == zv
        out[m] = hilbert_encode_tile(x[m], y[m], int(zv))
    return out


def hilbert_decode_tile(encoded) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global Hilbert index → (x, y, z). ``TileCoord.java:68-74``."""
    encoded = np.asarray(encoded, dtype=np.int64)
    z = (np.searchsorted(_ZOOM_START, encoded, side="right") - 1).astype(np.int64)
    x = np.empty_like(encoded)
    y = np.empty_like(encoded)
    for zv in np.unique(z):
        m = z == zv
        xs, ys = hilbert_position_to_xy(int(zv), encoded[m] - _ZOOM_START[zv])
        x[m], y[m] = xs, ys
    return x, y, z


def tile_of_point(world_x, world_y, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile containing a world web-mercator coordinate at zoom ``z``.

    ``floor(worldX·2^z)``, matching ``TileCoord.aroundLngLat``
    (``TileCoord.java:77-82``).  No clamping — callers apply
    :class:`TileExtents` / wrapping per ``render/TiledGeometry.java``.
    """
    factor = np.float64(1 << z)
    tx = np.floor(np.asarray(world_x, dtype=np.float64) * factor).astype(np.int64)
    ty = np.floor(np.asarray(world_y, dtype=np.float64) * factor).astype(np.int64)
    return tx, ty
