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


# ---------------------------------------------------------------------------
# Midpoint smoothers — geo/MidpointSmoother.java and
# geo/DualMidpointSmoother.java re-expressed as flat vectorized kernels
# over MANY lines/rings at once (flattened vertex stream + offsets).
# Rings use the engine's OPEN convention (no duplicated closing vertex):
# vertex i's neighbors are (i-1) % n and (i+1) % n; the reference's
# closed-sequence walk visits the same cyclic triples, so outputs match
# up to the ring's starting vertex (rings are cyclic).
# ---------------------------------------------------------------------------


def midpoint_smooth(vx: np.ndarray, vy: np.ndarray, offsets: np.ndarray,
                    closed: bool = False, ratio: float = 0.5,
                    iters: int = 1
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Iteratively join each edge's point-at-``ratio``
    (``geo/MidpointSmoother.java:43-67``): a line keeps its endpoints
    and gains one point per edge; a ring is replaced by its n edge
    points.  Geometries with ≤2 vertices pass through unchanged."""
    vx = np.asarray(vx, np.float64)
    vy = np.asarray(vy, np.float64)
    offsets = np.asarray(offsets, np.int64)
    for _ in range(iters):
        counts = np.diff(offsets)
        small = counts <= 2
        n_g = len(counts)
        ai = np.arange(int(offsets[-1]), dtype=np.int64)
        if closed:
            bi = ai + 1
            # wrap only NON-empty rings: an empty ring's offsets[k+1]-1
            # aliases the previous ring's end slot (corrupting its wrap)
            # and a trailing empty ring would index out of bounds
            ne = counts > 0
            bi[(offsets[1:] - 1)[ne]] = offsets[:-1][ne]
            mx = vx[ai] + (vx[bi] - vx[ai]) * ratio
            my = vy[ai] + (vy[bi] - vy[ai]) * ratio
            out_counts = counts
            # small rings copy through; others take their edge points
            keep_small = np.repeat(small, counts)
            ox = np.where(keep_small, vx, mx)
            oy = np.where(keep_small, vy, my)
            vx, vy = ox, oy
            offsets = np.concatenate([[0], np.cumsum(out_counts)])
            continue
        # lines: first + (n-1) edge points + last
        g_of = np.repeat(np.arange(n_g), counts)
        is_last = np.arange(int(offsets[-1])) == (offsets[1:][g_of] - 1)
        ea = np.flatnonzero(~is_last)
        mx = vx[ea] + (vx[ea + 1] - vx[ea]) * ratio
        my = vy[ea] + (vy[ea + 1] - vy[ea]) * ratio
        out_counts = np.where(small, counts, counts + 1)
        new_off = np.concatenate([[0], np.cumsum(out_counts)])
        ox = np.empty(int(new_off[-1]))
        oy = np.empty(int(new_off[-1]))
        # copy small geometries verbatim
        sm = np.flatnonzero(small)
        for g in sm:                      # ≤2-vertex geoms, rare
            s, e = offsets[g], offsets[g + 1]
            ox[new_off[g]:new_off[g] + (e - s)] = vx[s:e]
            oy[new_off[g]:new_off[g] + (e - s)] = vy[s:e]
        big = ~small
        if big.any():
            gb = np.flatnonzero(big)
            ox[new_off[gb]] = vx[offsets[gb]]
            oy[new_off[gb]] = vy[offsets[gb]]
            ox[new_off[gb + 1] - 1] = vx[offsets[gb + 1] - 1]
            oy[new_off[gb + 1] - 1] = vy[offsets[gb + 1] - 1]
            # midpoints land at positions new_off[g]+1 .. new_off[g+1]-2
            g_of_e = g_of[ea]
            pos = new_off[g_of_e] + 1 + (ea - offsets[g_of_e])
            bigm = big[g_of_e]
            ox[pos[bigm]] = mx[bigm]
            oy[pos[bigm]] = my[bigm]
        vx, vy, offsets = ox, oy, new_off
    return vx, vy, offsets


def dual_midpoint_smooth(vx: np.ndarray, vy: np.ndarray,
                         offsets: np.ndarray, closed: bool = False,
                         a: float = 0.25, b: float = 0.75, iters: int = 1,
                         min_vertex_area: float = 0.0,
                         min_vertex_offset: float = 0.0,
                         max_vertex_area: float = 0.0,
                         max_vertex_offset: float = 0.0
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Slice each vertex into 2 points at ratios ``a``/``b`` along its
    edges (``geo/DualMidpointSmoother.java:120-221``; Chaikin when
    a=0.25, b=0.75).  ``min_vertex_area`` / ``min_vertex_offset`` keep
    (skip) vertices whose removal triangle is already small;
    ``max_vertex_area`` / ``max_vertex_offset`` pull the new points
    toward the vertex to cap the error removed in one step.  Iteration
    stops early when an entire pass squashes nothing."""
    vx = np.asarray(vx, np.float64)
    vy = np.asarray(vy, np.float64)
    offsets = np.asarray(offsets, np.int64)
    min_sq_off = min_vertex_offset * abs(min_vertex_offset)
    max_sq_off = max_vertex_offset * abs(max_vertex_offset)
    for _ in range(iters):
        counts = np.diff(offsets)
        total = int(offsets[-1])
        n_g = len(counts)
        g_of = np.repeat(np.arange(n_g), counts)
        idx = np.arange(total, dtype=np.int64)
        first = offsets[:-1][g_of] == idx
        last = offsets[1:][g_of] - 1 == idx
        small = counts <= 2
        # squash candidates: interior vertices (lines) or all (rings)
        cand = ~np.repeat(small, counts)
        if not closed:
            cand &= ~first & ~last
        prev = idx - 1
        nxt = idx + 1
        if closed:
            prev[first] = (offsets[1:][g_of] - 1)[first]
            nxt[last] = offsets[:-1][g_of][last]
        ci = np.flatnonzero(cand)
        x1, y1 = vx[prev[ci]], vy[prev[ci]]
        x2, y2 = vx[ci], vy[ci]
        x3, y3 = vx[nxt[ci]], vy[nxt[ci]]
        # skipVertex: keep the vertex when its removal triangle is small
        tri2 = np.abs((x1 - x2) * (y3 - y2) - (y1 - y2) * (x3 - x2))
        skip = np.zeros(len(ci), bool)
        if min_vertex_area > 0:
            skip |= tri2 / 2.0 < min_vertex_area
        if min_sq_off > 0:
            dx, dy = x3 - x1, y3 - y1
            dd = dx * dx + dy * dy
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.clip(np.where(dd > 0,
                                     ((x2 - x1) * dx + (y2 - y1) * dy) / dd,
                                     0.0), 0.0, 1.0)
            px_, py_ = x1 + t * dx, y1 + t * dy
            skip |= (x2 - px_) ** 2 + (y2 - py_) ** 2 < min_sq_off
        nextA = np.full(len(ci), a)
        nextB = np.full(len(ci), b)
        if max_vertex_area > 0 or max_sq_off > 0:
            magA = np.hypot(x2 - x1, y2 - y1)
            magB = np.hypot(x3 - x2, y3 - y2)
            den = magA * magB
            aDist = magA * (1 - b)
            bDist = magB * a
            max_d2 = np.full(len(ci), np.inf)
            if max_vertex_area > 0:
                with np.errstate(divide="ignore", invalid="ignore"):
                    sin = np.where(den > 0, tri2 / den, 0.0)
                    md = np.where(sin != 0, 2 * max_vertex_area / sin,
                                  np.inf)
                max_d2 = np.minimum(max_d2, md)
            if max_sq_off > 0:
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.clip(np.where(
                        den > 0,
                        ((x1 - x2) * (x3 - x2) + (y1 - y2) * (y3 - y2))
                        / den, 0.0), -1.0, 1.0)
                max_d2 = np.minimum(max_d2, 2 * max_sq_off / (1 + cos))
            max_d = np.sqrt(max_d2)
            with np.errstate(divide="ignore", invalid="ignore"):
                adjB = aDist * aDist > max_d2
                nextB = np.where(adjB & (magA > 0), 1 - max_d / magA, nextB)
                adjA = bDist * bDist > max_d2
                nextA = np.where(adjA & (magB > 0), max_d / magB, nextA)
        # output layout: non-candidates and skipped vertices emit 1
        # point (themselves); squashed vertices emit 2
        n_out_v = np.ones(total, np.int64)
        sq = ci[~skip]
        n_out_v[sq] = 2
        if len(sq) == 0:
            break
        out_pos = np.concatenate([[0], np.cumsum(n_out_v)])
        ox = np.empty(int(out_pos[-1]))
        oy = np.empty(int(out_pos[-1]))
        keep_i = np.flatnonzero(n_out_v == 1)
        ox[out_pos[keep_i]] = vx[keep_i]
        oy[out_pos[keep_i]] = vy[keep_i]
        nb_ = nextB[~skip]
        na_ = nextA[~skip]
        sx1, sy1 = vx[prev[sq]], vy[prev[sq]]
        sx2, sy2 = vx[sq], vy[sq]
        sx3, sy3 = vx[nxt[sq]], vy[nxt[sq]]
        ox[out_pos[sq]] = sx1 + (sx2 - sx1) * nb_
        oy[out_pos[sq]] = sy1 + (sy2 - sy1) * nb_
        ox[out_pos[sq] + 1] = sx2 + (sx3 - sx2) * na_
        oy[out_pos[sq] + 1] = sy2 + (sy3 - sy2) * na_
        g_counts = np.zeros(n_g, np.int64)
        np.add.at(g_counts, g_of, n_out_v)
        vx, vy = ox, oy
        offsets = np.concatenate([[0], np.cumsum(g_counts)])
    return vx, vy, offsets


def chaikin(vx, vy, offsets, closed: bool = False, iters: int = 1,
            tolerance: float | None = None, min_area: float | None = None):
    """Chaikin smoothing (``DualMidpointSmoother.chaikin`` /
    ``chaikinToTolerance`` / ``chaikinToMinArea``)."""
    kw = {}
    if tolerance is not None:
        kw = {"iters": 10, "min_vertex_offset": tolerance}
    elif min_area is not None:
        kw = {"iters": 10, "min_vertex_area": min_area}
    else:
        kw = {"iters": iters}
    return dual_midpoint_smooth(vx, vy, offsets, closed, 0.25, 0.75, **kw)
