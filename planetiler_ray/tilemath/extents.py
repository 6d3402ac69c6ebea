"""Per-zoom tile extents filter, matching ``geo/TileExtents.java:25-70``.

For each zoom: half-open ranges [minX, maxX) × [minY, maxY) where
``minX = clamp(floor(worldMinX·2^z), 0, 2^z)`` and
``maxX = clamp(ceil(worldMaxX·2^z), 0, 2^z)`` (quantizeDown/quantizeUp,
``TileExtents.java:21-29``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


def _quantize_down(value: float, levels: int) -> int:
    return min(max(int(math.floor(value * levels)), 0), levels)


def _quantize_up(value: float, levels: int) -> int:
    return min(max(int(math.ceil(value * levels)), 0), levels)


@dataclass(frozen=True)
class ZoomExtents:
    z: int
    min_x: int
    min_y: int
    max_x: int
    max_y: int
    shape: object = None    # optional ZoomShape (tilemath/shapemask.py)

    def test_x(self, x) -> np.ndarray:
        x = np.asarray(x)
        return (x >= self.min_x) & (x < self.max_x)

    def test_y(self, y) -> np.ndarray:
        y = np.asarray(y)
        return (y >= self.min_y) & (y < self.max_y)

    def test(self, x, y) -> np.ndarray:
        m = self.test_x(x) & self.test_y(y)
        if self.shape is not None:
            # testOverShape (TileExtents.java:96-106): the polygon
            # mask refines the rectangle
            m = m & self.shape.test(x, y)
        return m


class TileExtents:
    """Per-zoom bounds filter from world web-mercator bounds."""

    def __init__(self, zoom_extents: list[ZoomExtents]):
        self._per_zoom = zoom_extents

    @classmethod
    def compute_from_world_bounds(cls, maxzoom: int, bounds: tuple[float, float, float, float],
                                  shape=None) -> "TileExtents":
        """``TileExtents.computeFromWorldBounds`` (``TileExtents.java:32-70``).

        ``bounds`` = (min_x, min_y, max_x, max_y) in world mercator [0,1].
        ``shape``: optional non-rectangular refinement — a
        ``shapemask.ShapeMask`` (already rasterized) or a parsed
        ``.poly`` dict (``sources/polyfile.py``), rasterized here per
        zoom exactly as the reference does with ``getCoveredTiles``
        (``TileExtents.java:54-64``).
        """
        if shape is not None and not hasattr(shape, "for_zoom"):
            from .shapemask import ShapeMask
            shape = ShapeMask.from_poly(shape, maxzoom)
        min_x, min_y, max_x, max_y = bounds
        out = []
        for z in range(maxzoom + 1):
            n = 1 << z
            out.append(ZoomExtents(
                z,
                _quantize_down(min_x, n),
                _quantize_down(min_y, n),
                _quantize_up(max_x, n),
                _quantize_up(max_y, n),
                shape.for_zoom(z) if shape is not None else None,
            ))
        return cls(out)

    @classmethod
    def world(cls, maxzoom: int) -> "TileExtents":
        return cls.compute_from_world_bounds(maxzoom, (0.0, 0.0, 1.0, 1.0))

    def for_zoom(self, z: int) -> ZoomExtents:
        return self._per_zoom[z]

    def test(self, x, y, z: int) -> np.ndarray:
        return self.for_zoom(z).test(x, y)
