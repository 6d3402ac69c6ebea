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


# ---------------------------------------------------------------------------
# general polygon derivations
# ---------------------------------------------------------------------------


def polygon_centroid(ring: np.ndarray) -> np.ndarray:
    """Area-weighted centroid of a simple (possibly concave) ring —
    ``WithGeometry.centroid`` for general polygons."""
    r = np.asarray(ring, np.float64)
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-30:
        return r.mean(axis=0)
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return np.array([cx, cy])


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    crosses = ((y > py) != (yn > py)) & (
        px < x + (py - y) * (xn - x) / np.where(yn != y, yn - y, 1e-300))
    return bool(crosses.sum() % 2)


def _points_in_ring(px: np.ndarray, py: np.ndarray,
                    ring: np.ndarray) -> np.ndarray:
    """Ray-cast ALL probes at once (probe × edge broadcast — the same
    shape as ``_dist_to_edges``; bit-identical to the scalar test)."""
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    dy = np.where(yn != y, yn - y, 1e-300)
    pyc = py[:, None]
    crosses = ((y[None, :] > pyc) != (yn[None, :] > pyc)) & (
        px[:, None] < x[None, :] + (pyc - y[None, :]) * (xn - x)[None, :]
        / dy[None, :])
    return (crosses.sum(axis=1) % 2).astype(bool)


def _dist_to_edges(px: np.ndarray, py: np.ndarray,
                   ring: np.ndarray) -> np.ndarray:
    """Min distance from each probe point to the ring's edges
    (vectorized probe × edge)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    d = b - a
    ll = np.maximum((d ** 2).sum(axis=1), 1e-300)
    # (n_pts, n_edges) projections
    wx = px[:, None] - a[None, :, 0]
    wy = py[:, None] - a[None, :, 1]
    t = np.clip((wx * d[None, :, 0] + wy * d[None, :, 1]) / ll[None, :],
                0.0, 1.0)
    ex = wx - t * d[None, :, 0]
    ey = wy - t * d[None, :, 1]
    return np.sqrt(ex * ex + ey * ey).min(axis=1)


def point_on_surface(ring: np.ndarray) -> np.ndarray:
    """A point guaranteed inside the ring — the centroid when interior,
    else the interior probe (midpoint of the widest in-polygon span on
    the centroid's scanline): ``WithGeometry.pointOnSurface``."""
    r = np.asarray(ring, np.float64)
    c = polygon_centroid(r)
    if _point_in_ring(c[0], c[1], r):
        return c
    # scanline at cy: collect edge crossings, take widest inside span
    cy = c[1]
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    m = (y > cy) != (yn > cy)
    xs = np.sort(x[m] + (cy - y[m]) * (xn[m] - x[m])
                 / np.where(yn[m] != y[m], yn[m] - y[m], 1e-300))
    if len(xs) < 2:
        return c
    spans = xs[1::2] - xs[0::2] if len(xs) % 2 == 0 else xs[1:2] - xs[0:1]
    i = int(np.argmax(spans))
    return np.array([(xs[2 * i] + xs[2 * i + 1]) / 2.0, cy])


def innermost_point(ring: np.ndarray, precision: float = 0.01) -> np.ndarray:
    """Pole of inaccessibility — the interior point maximizing distance
    to the boundary (``WithGeometry.innermostPoint``; the reference uses
    JTS MaximumInscribedCircle).  Iterative vectorized grid refinement:
    each round probes a shrinking grid around the best cell;
    ``precision`` is relative to the bbox diagonal."""
    r = np.asarray(ring, np.float64)
    lo = r.min(axis=0)
    hi = r.max(axis=0)
    diag = float(np.hypot(*(hi - lo)))
    if diag <= 0:
        return r[0]
    cx, cy = (lo + hi) / 2.0
    half = float(max(hi[0] - lo[0], hi[1] - lo[1])) / 2.0
    best = point_on_surface(r)
    best_d = float(_dist_to_edges(best[:1], best[1:2], r)[0]) \
        if _point_in_ring(best[0], best[1], r) else 0.0
    G = 9
    while half > precision * diag:
        gx, gy = np.meshgrid(np.linspace(cx - half, cx + half, G),
                             np.linspace(cy - half, cy + half, G))
        px, py = gx.ravel(), gy.ravel()
        inside = _points_in_ring(px, py, r)
        if inside.any():
            d = np.where(inside, _dist_to_edges(px, py, r), -np.inf)
            i = int(np.argmax(d))
            if d[i] > best_d:
                best_d = float(d[i])
                best = np.array([px[i], py[i]])
                cx, cy = best
        half /= 2.0
    return best
