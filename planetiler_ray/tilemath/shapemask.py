"""Per-zoom covered-tile shape mask for TileExtents.

The reference refines its rectangular per-zoom extents with an
optional polygon: ``TileExtents.computeFromWorldBounds(maxzoom,
bounds, shape)`` rasterizes the shape once per zoom with
``TiledGeometry.getCoveredTiles`` and ANDs the membership test into
``ForZoom.test`` (``geo/TileExtents.java:38-69,96-106``).  This module
is that rasterization on the engine's striped clip: per zoom, the
polygon's boundary tiles come from the stripe fragments and the
interior arrives as y-RUNS per column (never one entry per interior
tile), so build cost and memory are O(boundary + vertices) per zoom —
a planet-shaped ``.poly`` mask at z14 costs ~its boundary length, not
2^28 tiles.

Storage per zoom is the run form itself: column-sorted half-open
``[lo, hi)`` y-intervals packed as int64 ``x·(n+1)+y``; membership is
one vectorized ``searchsorted`` per query batch — the same cost shape
as the reference's bitset-per-row ``CoveredTiles`` but O(runs) memory.
"""

from __future__ import annotations

import numpy as np


def _runs_union(starts: np.ndarray, ends: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Merge possibly-overlapping packed half-open intervals (vectorized)."""
    if len(starts) == 0:
        return starts, ends
    o = np.argsort(starts, kind="stable")
    s, e = starts[o], ends[o]
    # running max of ends; a new merged run begins where start > max(prior ends)
    emax = np.maximum.accumulate(e)
    new = np.r_[True, s[1:] > emax[:-1]]
    out_s = s[new]
    out_e = np.maximum.reduceat(e, np.flatnonzero(new))
    return out_s, out_e


class ZoomShape:
    """Covered-tile set at one zoom as packed sorted y-runs."""

    def __init__(self, z: int, run_start: np.ndarray, run_end: np.ndarray):
        self.z = z
        self._k = np.int64((1 << z) + 1)
        self.run_start = run_start            # packed x*(n+1)+y, sorted
        self.run_end = run_end                # exclusive, same packing

    def test(self, x, y) -> np.ndarray:
        x = np.asarray(x, np.int64)
        y = np.asarray(y, np.int64)
        q = x * self._k + y
        i = np.searchsorted(self.run_start, q, side="right") - 1
        ic = np.maximum(i, 0)
        return (i >= 0) & (q < self.run_end[ic])

    @property
    def n_tiles(self) -> int:
        return int((self.run_end - self.run_start).sum())


class ShapeMask:
    """Per-zoom covered-tile masks for a world-coordinate polygon set."""

    def __init__(self, per_zoom: dict[int, ZoomShape]):
        self._per_zoom = per_zoom

    def for_zoom(self, z: int) -> ZoomShape:
        return self._per_zoom[z]

    def test(self, x, y, z: int) -> np.ndarray:
        return self._per_zoom[z].test(x, y)

    @classmethod
    def from_world_rings(cls, px: np.ndarray, py: np.ndarray,
                         ring_offsets: np.ndarray,
                         poly_of_ring: np.ndarray | None,
                         maxzoom: int, minzoom: int = 0) -> "ShapeMask":
        """Rasterize world-coordinate rings ([0,1]² web mercator) into
        per-zoom covered runs via the striped clip (buffer 0)."""
        from .stripeclip import slice_polygons_striped

        per_zoom: dict[int, ZoomShape] = {}
        for z in range(minzoom, maxzoom + 1):
            n = 1 << z
            k = np.int64(n + 1)
            # the clip kernel works in tile units: scale by 2^z, the
            # reference's AffineTransformation.scaleInstance(1<<z)
            s = float(n)
            res = slice_polygons_striped(px * s, py * s, ring_offsets, z,
                                         buffer=0.0,
                                         poly_of_ring=poly_of_ring)
            # boundary tiles (one per stripe fragment) as unit runs
            bx = np.asarray(res["x"], np.int64)
            by = np.asarray(res["y"], np.int64)
            b = np.unique(bx * k + by)
            # interior fill runs, already half-open in y? fill_y1 is
            # inclusive (run expansion emits y0..y1) — make half-open
            fx = np.asarray(res["fill_x"], np.int64)
            fy0 = np.asarray(res["fill_y0"], np.int64)
            fy1 = np.asarray(res["fill_y1"], np.int64)
            starts = np.concatenate([b, fx * k + fy0])
            ends = np.concatenate([b + 1, fx * k + fy1 + 1])
            s, e = _runs_union(starts, ends)
            per_zoom[z] = ZoomShape(z, s, e)
        return per_zoom and cls(per_zoom) or cls({})

    @classmethod
    def from_poly(cls, poly: dict, maxzoom: int,
                  minzoom: int = 0) -> "ShapeMask":
        """Build from a parsed ``.poly`` dict (``sources/polyfile.py``):
        lat/lon ring vertices are projected to world web mercator
        first, matching ``GeoUtils.latLonToWorldCoords`` in the
        reference's shape path (``TileExtents.java:40``)."""
        from .projection import get_world_x, get_world_y

        px = get_world_x(poly["lons"])
        py = get_world_y(poly["lats"])
        return cls.from_world_rings(px, py, poly["ring_offsets"],
                                    poly.get("poly_of_ring"), maxzoom,
                                    minzoom)
