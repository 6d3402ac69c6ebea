"""Line simplification: Douglas-Peucker and Visvalingam-Whyatt.

Re-expressions of the reference's simplifiers:

- Douglas-Peucker (``geo/DouglasPeuckerSimplifier.java:66-95``): drop
  vertices whose *squared* perpendicular distance to the chord is below
  ``tolerance²`` (the reference compares squared distances and treats
  tolerance < 0 as no-op; degenerate chords fall back to point distance).
- Visvalingam-Whyatt (``geo/VWSimplifier.java:14-44``): iteratively drop
  the vertex with smallest effective triangle area below ``tolerance``,
  with a ``weight`` factor sharpening/smoothing corners.

Both operate on (n, 2) float64 arrays and preserve endpoints.
"""

from __future__ import annotations

import heapq

import numpy as np


def _seg_dist_sq(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared distance of each point to the *line segment* a-b (vectorized)."""
    ab = b - a
    denom = ab @ ab
    if denom == 0:
        d = pts - a
        return (d * d).sum(axis=1)
    t = ((pts - a) @ ab) / denom
    t = np.clip(t, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d = pts - proj
    return (d * d).sum(axis=1)


def douglas_peucker(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Simplify a polyline with Douglas-Peucker at ``tolerance`` (same units)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if tolerance < 0 or n <= 2:
        return coords
    tol_sq = tolerance * tolerance
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = coords[i + 1:j]
        d = _seg_dist_sq(seg, coords[i], coords[j])
        k = int(np.argmax(d))
        if d[k] > tol_sq:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return coords[keep]


def _tri_area2(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1]))


def visvalingam_whyatt(coords: np.ndarray, tolerance: float, weight: float = 0.0) -> np.ndarray:
    """Visvalingam-Whyatt simplification by effective triangle area.

    Vertices whose (weighted) triangle area < ``tolerance`` are removed
    smallest-first, recomputing neighbor areas (``geo/VWSimplifier.java``).
    ``tolerance`` is in squared-ish area units matching the reference's
    convention (area of the triangle, not doubled).
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if tolerance < 0 or n <= 2:
        return coords
    prev = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    alive = np.ones(n, dtype=bool)

    def area(i: int) -> float:
        a = _tri_area2(coords[prev[i]], coords[i], coords[nxt[i]]) / 2.0
        if weight:
            # weighted effective area per Visvalingam-Whelan weighting
            ax, ay = coords[prev[i]]
            bx, by = coords[i]
            cx, cy = coords[nxt[i]]
            v1 = np.hypot(bx - ax, by - ay)
            v2 = np.hypot(cx - bx, cy - by)
            cos = 0.0
            if v1 > 0 and v2 > 0:
                cos = ((bx - ax) * (cx - bx) + (by - ay) * (cy - by)) / (v1 * v2)
            a *= (1.0 + weight * cos)
        return a

    heap = [(area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    n_alive = n
    while heap:
        a, i = heapq.heappop(heap)
        if not alive[i] or n_alive <= 2:
            continue
        cur = area(i)
        if cur != a:  # stale entry
            heapq.heappush(heap, (cur, i))
            continue
        if cur >= tolerance:
            break
        alive[i] = False
        n_alive -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                heapq.heappush(heap, (area(j), j))
    return coords[alive]
