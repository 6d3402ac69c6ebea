"""Geometry derivation kernels over polylines and boxes.

Analogs of the reference's derived-geometry accessors
(``geo/WithGeometry.java:122-304``, ``geo/LineSplitter.java``,
``FeatureCollector.java:96-325``) for this engine's geometry model:

- :func:`line_midpoint` / :func:`point_along_line` — interpolate along a
  polyline by length fraction (``lineMidpoint``/``pointAlongLine``)
- :func:`partial_line` — sub-line between two length fractions
  (``partialLine`` / ``LineSplitter.get``)
- :func:`box_centroid` / :func:`box_point_on_surface` — for axis-aligned
  boxes both are the center (vectorized)
- :func:`centroid_if_convex` — boxes are always convex → center
"""

from __future__ import annotations

import numpy as np


def _cumlen(coords: np.ndarray) -> np.ndarray:
    d = np.diff(coords, axis=0)
    seg = np.hypot(d[:, 0], d[:, 1])
    return np.concatenate([[0.0], np.cumsum(seg)])


def point_along_line(coords: np.ndarray, t: float) -> np.ndarray:
    """Point at length-fraction ``t`` ∈ [0,1] along the polyline."""
    coords = np.asarray(coords, dtype=np.float64)
    cl = _cumlen(coords)
    total = cl[-1]
    if total == 0:
        return coords[0].copy()
    target = np.clip(t, 0.0, 1.0) * total
    i = int(np.searchsorted(cl, target, side="right") - 1)
    i = min(i, len(coords) - 2)
    seg_len = cl[i + 1] - cl[i]
    f = 0.0 if seg_len == 0 else (target - cl[i]) / seg_len
    return coords[i] + f * (coords[i + 1] - coords[i])


def line_midpoint(coords: np.ndarray) -> np.ndarray:
    """``lineMidpoint`` — the point at half the line's length."""
    return point_along_line(coords, 0.5)


def partial_line(coords: np.ndarray, start: float, end: float) -> np.ndarray:
    """Sub-line between length fractions [start, end] (``LineSplitter.get``).

    Matches the reference's validation: requires 0 ≤ start < end ≤ 1.
    """
    if not (0 <= start < end <= 1):
        raise ValueError(f"invalid range [{start}, {end}]")
    coords = np.asarray(coords, dtype=np.float64)
    if start == 0 and end == 1:
        return coords.copy()
    cl = _cumlen(coords)
    total = cl[-1]
    a, b = start * total, end * total
    p_start = point_along_line(coords, start)
    p_end = point_along_line(coords, end)
    inner = coords[(cl > a) & (cl < b)]
    out = [p_start]
    for p in inner:
        if not np.allclose(p, out[-1]):
            out.append(p)
    if not np.allclose(p_end, out[-1]):
        out.append(p_end)
    if len(out) == 1:
        out.append(p_end)
    return np.asarray(out)


def box_centroid(x0, y0, x1, y1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized box centroid (== pointOnSurface for convex boxes)."""
    return ((np.asarray(x0) + np.asarray(x1)) / 2,
            (np.asarray(y0) + np.asarray(y1)) / 2)


box_point_on_surface = box_centroid
centroid_if_convex = box_centroid
