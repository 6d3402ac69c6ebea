"""Midpoint / dual-midpoint (Chaikin) smoothers vs a direct scalar
port of the reference semantics (``geo/MidpointSmoother.java``,
``geo/DualMidpointSmoother.java:120-221``) plus hand goldens.  Rings
use the engine's open convention; ring outputs are compared as cyclic
sequences (the reference's closed walk starts one vertex later)."""

import math

import numpy as np

from planetiler_ray.tilemath.simplify import (chaikin,
                                              dual_midpoint_smooth,
                                              midpoint_smooth)


def scalar_midpoint(pts, closed, ratio, iters):
    for _ in range(iters):
        if len(pts) <= 2:
            return pts
        out = []
        if not closed:
            out.append(pts[0])
        edges = list(zip(pts, pts[1:] + ([pts[0]] if closed else [])))
        for (x1, y1), (x2, y2) in edges:
            out.append((x1 + (x2 - x1) * ratio, y1 + (y2 - y1) * ratio))
        if not closed:
            out.append(pts[-1])
        pts = out
    return pts


def scalar_dual(pts, closed, a, b, iters, min_area=0.0, min_off=0.0,
                max_area=0.0, max_off=0.0):
    min_sq = min_off * abs(min_off)
    max_sq = max_off * abs(max_off)

    def squash(out, p1, p2, p3):
        (x1, y1), (x2, y2), (x3, y3) = p1, p2, p3
        tri2 = abs((x1 - x2) * (y3 - y2) - (y1 - y2) * (x3 - x2))
        if min_area > 0 and tri2 / 2 < min_area:
            out.append(p2)
            return False
        if min_sq > 0:
            dx, dy = x3 - x1, y3 - y1
            dd = dx * dx + dy * dy
            t = 0.0 if dd == 0 else max(
                0.0, min(1.0, ((x2 - x1) * dx + (y2 - y1) * dy) / dd))
            px, py = x1 + t * dx, y1 + t * dy
            if (x2 - px) ** 2 + (y2 - py) ** 2 < min_sq:
                out.append(p2)
                return False
        nextA, nextB = a, b
        if max_area > 0 or max_sq > 0:
            magA = math.hypot(x2 - x1, y2 - y1)
            magB = math.hypot(x3 - x2, y3 - y2)
            den = magA * magB
            aDist = magA * (1 - b)
            bDist = magB * a
            maxd2 = float("inf")
            if max_area > 0:
                sin = 0 if den <= 0 else tri2 / den
                if sin != 0:
                    maxd2 = 2 * max_area / sin
            if max_sq > 0:
                cos = 0 if den <= 0 else max(-1.0, min(1.0, (
                    (x1 - x2) * (x3 - x2) + (y1 - y2) * (y3 - y2)) / den))
                maxd2 = min(maxd2, 2 * max_sq / (1 + cos))
            maxd = None
            if aDist * aDist > maxd2:
                maxd = math.sqrt(maxd2)
                nextB = 1 - maxd / magA
            if bDist * bDist > maxd2:
                if maxd is None:
                    maxd = math.sqrt(maxd2)
                nextA = maxd / magB
        out.append((x1 + (x2 - x1) * nextB, y1 + (y2 - y1) * nextB))
        out.append((x2 + (x3 - x2) * nextA, y2 + (y3 - y2) * nextA))
        return True

    for _ in range(iters):
        if len(pts) <= 2:
            return pts
        out = []
        changed = False
        if closed:
            n = len(pts)
            for i in range(n):
                changed |= squash(out, pts[(i - 1) % n], pts[i],
                                  pts[(i + 1) % n])
        else:
            out.append(pts[0])
            for i in range(1, len(pts) - 1):
                changed |= squash(out, pts[i - 1], pts[i], pts[i + 1])
            out.append(pts[-1])
        if not changed:
            return out
        pts = out
    return pts


def _cyc_eq(a, b):
    if len(a) != len(b):
        return False
    a = [tuple(np.round(p, 9)) for p in a]
    b = [tuple(np.round(p, 9)) for p in b]
    return any(b[i:] + b[:i] == a for i in range(len(b)))


def _run_vec(fn, geoms, closed, **kw):
    vx = np.concatenate([[p[0] for p in g] for g in geoms])
    vy = np.concatenate([[p[1] for p in g] for g in geoms])
    offs = np.concatenate([[0], np.cumsum([len(g) for g in geoms])])
    ox, oy, oo = fn(vx, vy, offs, closed, **kw)
    return [list(zip(ox[oo[i]:oo[i + 1]], oy[oo[i]:oo[i + 1]]))
            for i in range(len(geoms))]


def test_midpoint_goldens():
    # line: endpoints kept, midpoints joined
    line = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0)]
    out = _run_vec(midpoint_smooth, [line], False)[0]
    assert out == [(0, 0), (1, 0), (2, 1), (2, 2)]
    # unit square ring → diamond of edge midpoints
    sq = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
    out = _run_vec(midpoint_smooth, [sq], True)[0]
    assert _cyc_eq(out, [(1, 0), (2, 1), (1, 2), (0, 1)])


def test_chaikin_square_golden():
    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    out = _run_vec(chaikin, [sq], True)[0]
    assert _cyc_eq(out, [(3.0, 0.0), (4.0, 1.0), (4.0, 3.0), (3.0, 4.0),
                         (1.0, 4.0), (0.0, 3.0), (0.0, 1.0), (1.0, 0.0)])


def test_smoothers_match_scalar_reference_fuzz():
    rng = np.random.default_rng(3)
    for trial in range(60):
        n = int(rng.integers(3, 15))
        geoms = [[(float(x), float(y))
                  for x, y in rng.uniform(0, 100, (n, 2))]
                 for _ in range(int(rng.integers(1, 5)))]
        closed = bool(rng.integers(0, 2))
        iters = int(rng.integers(1, 4))
        ratio = float(rng.uniform(0.2, 0.8))
        vec = _run_vec(midpoint_smooth, geoms, closed,
                       ratio=ratio, iters=iters)
        for g, v in zip(geoms, vec):
            s = scalar_midpoint(list(g), closed, ratio, iters)
            assert _cyc_eq(v, s) if closed else \
                [tuple(np.round(p, 9)) for p in v] == \
                [tuple(np.round(p, 9)) for p in s], trial
        kw = dict(a=0.25, b=0.75, iters=iters)
        skw = {}
        mode = int(rng.integers(0, 4))
        if mode == 1:
            kw["min_vertex_offset"] = skw["min_off"] = 2.0
        elif mode == 2:
            kw["max_vertex_offset"] = skw["max_off"] = 1.0
        elif mode == 3:
            kw["min_vertex_area"] = skw["min_area"] = 3.0
            kw["max_vertex_area"] = skw["max_area"] = 8.0
        vec = _run_vec(dual_midpoint_smooth, geoms, closed, **kw)
        for g, v in zip(geoms, vec):
            s = scalar_dual(list(g), closed, 0.25, 0.75, iters, **skw)
            assert _cyc_eq(v, s) if closed else \
                [tuple(np.round(p, 9)) for p in v] == \
                [tuple(np.round(p, 9)) for p in s], (trial, mode)


def test_chaikin_to_tolerance_terminates_and_smooths():
    # jagged line: tolerance mode stops on its own before 10 iters
    t = np.linspace(0, 10, 21)
    pts = [(float(x), float(5 + (3 if i % 2 else -3)))
           for i, x in enumerate(t)]
    out = _run_vec(chaikin, [pts], False, tolerance=0.05)[0]
    assert len(out) > len(pts)
    # max deviation between consecutive points shrinks (smoother)
    dy = np.abs(np.diff([p[1] for p in out]))
    assert dy.max() < 6.0
