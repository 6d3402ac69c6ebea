"""Polygon snap + fix validity ladder.

Batch-vectorized re-expression of the reference's
``GeoUtils.snapAndFixPolygon`` ladder (``geo/GeoUtils.java:315-399``):
the reference snaps every vertex to a precision grid, then walks an
escalating repair ladder (reduce-precision snap → ``buffer(0)`` → fix)
until the polygon is valid.  This engine has no GEOS, so the ladder is
the deterministic subset that covers the failure modes grid-snapping
itself introduces:

1. snap every vertex to the ``1/scale`` grid (round-half-even, matching
   numpy/IEEE so results are reproducible in SQL oracles),
2. collapse consecutive duplicate vertices created by the snap,
3. drop rings degenerate after snapping (< 3 distinct vertices or zero
   shoelace area),
4. re-orient: outer rings CCW, holes CW (the MVT winding contract the
   encoder expects; reference ``VectorTile.java`` encodes the same
   orientation).

Self-intersection repair (the ``buffer(0)`` rung) is documented
out-of-scope: inputs here come from the engine's own clip kernels
(Sutherland–Hodgman output is intersection-free for the convex tile
window), so the rung is unreachable in-pipeline.  A ``strict`` mode
detects (rather than repairs) self-intersection for external inputs.

All functions operate on the engine's flattened ring layout:
``px, py`` float streams + ``ring_offsets`` (``len == n_rings + 1``)
+ per-ring metadata arrays.
"""

from __future__ import annotations

import numpy as np


def ring_signed_area(px: np.ndarray, py: np.ndarray,
                     ring_offsets: np.ndarray) -> np.ndarray:
    """Shoelace signed area per ring (CCW positive), vectorized.

    Rings are open (first vertex not repeated); the closing edge is
    implied.
    """
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n = len(ring_offsets) - 1
    if n == 0 or len(px) == 0:
        return np.zeros(n, np.float64)
    # next-vertex index within each ring (wrap last -> first)
    idx = np.arange(len(px), dtype=np.int64)
    nxt = idx + 1
    # ring id per vertex
    rid = np.searchsorted(ring_offsets, idx, side="right") - 1
    last = ring_offsets[rid + 1] - 1
    nxt[idx == last] = ring_offsets[rid[idx == last]]
    cross = px * py[nxt] - px[nxt] * py
    cs = np.zeros(len(px) + 1, np.float64)
    np.cumsum(cross, out=cs[1:])
    return 0.5 * (cs[ring_offsets[1:]] - cs[ring_offsets[:-1]])


def snap_fix_rings(px: np.ndarray, py: np.ndarray,
                   ring_offsets: np.ndarray,
                   is_hole: np.ndarray | None = None,
                   scale: float = 16.0,
                   drop_zero_area: bool = True) -> dict:
    """Run the snap+fix ladder over a flattened batch of rings.

    ``scale`` is vertices-per-unit grid density (the reference uses
    ``TILE_PRECISION`` = 1/16 px grid at tile scale → ``scale=16``).

    Returns ``{"xs", "ys", "offsets", "ring_keep", "signed_area"}``:
    filtered + reoriented streams, the surviving-ring mask against the
    input, and each survivor's signed area AFTER orientation (outer > 0,
    hole < 0).
    """
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n_rings = len(ring_offsets) - 1
    if is_hole is None:
        is_hole = np.zeros(n_rings, bool)
    is_hole = np.asarray(is_hole, bool)

    # 1. snap to grid
    qx = np.round(np.asarray(px, np.float64) * scale) / scale
    qy = np.round(np.asarray(py, np.float64) * scale) / scale

    # 2. collapse consecutive duplicates (incl. last == first wrap)
    idx = np.arange(len(qx), dtype=np.int64)
    rid = np.searchsorted(ring_offsets, idx, side="right") - 1
    prev = idx - 1
    first = ring_offsets[rid]
    keep_v = np.ones(len(qx), bool)
    inner = idx > first
    keep_v[inner] = (qx[idx[inner]] != qx[prev[inner]]) | \
                    (qy[idx[inner]] != qy[prev[inner]])
    # drop a trailing vertex equal to the ring's first (explicit closure):
    # last KEPT vertex per ring == first vertex? then unkeep it
    if len(qx):
        # positions of kept vertices
        kept_idx = np.flatnonzero(keep_v)
        kept_rid = rid[kept_idx]
        # last kept vertex index of each ring
        # (searchsorted over kept_rid, which is sorted)
        ring_last = np.searchsorted(kept_rid, np.arange(n_rings), side="right") - 1
        has_any = ring_last >= np.searchsorted(kept_rid, np.arange(n_rings), side="left")
        cand = kept_idx[np.clip(ring_last, 0, None)]
        fvert = ring_offsets[:-1]
        close_dup = has_any & (cand != fvert) & \
                    (qx[cand] == qx[np.minimum(fvert, len(qx) - 1)]) & \
                    (qy[cand] == qy[np.minimum(fvert, len(qx) - 1)])
        keep_v[cand[close_dup]] = False

    # rebuild compacted streams + offsets
    cs_keep = np.zeros(len(qx) + 1, np.int64)
    np.cumsum(keep_v, out=cs_keep[1:])
    new_counts = cs_keep[ring_offsets[1:]] - cs_keep[ring_offsets[:-1]]
    sx, sy = qx[keep_v], qy[keep_v]
    new_off = np.zeros(n_rings + 1, np.int64)
    np.cumsum(new_counts, out=new_off[1:])

    # 3. drop degenerate rings.  ``drop_zero_area=False`` keeps
    # zero-net-area rings for a later self-intersection repair rung —
    # a symmetric bowtie's lobes cancel to exactly 0 here
    area = ring_signed_area(sx, sy, new_off)
    ring_keep = new_counts >= 3
    if drop_zero_area:
        ring_keep &= area != 0.0

    # compact surviving rings
    out_counts = new_counts[ring_keep]
    out_off = np.zeros(int(ring_keep.sum()) + 1, np.int64)
    np.cumsum(out_counts, out=out_off[1:])
    vkeep = np.repeat(ring_keep, new_counts)
    ox, oy = sx[vkeep], sy[vkeep]
    oarea = area[ring_keep]
    ohole = is_hole[ring_keep]

    # 4. orientation: outer CCW (area > 0), hole CW (area < 0)
    want_neg = ohole
    flip = (oarea > 0) == want_neg
    if flip.any():
        vidx = np.arange(len(ox), dtype=np.int64)
        vr = np.searchsorted(out_off, vidx, side="right") - 1
        f = flip[vr]
        # reversed position within ring: first + (last - i)
        rev = out_off[vr] + (out_off[vr + 1] - 1 - vidx)
        perm = np.where(f, rev, vidx)
        ox2, oy2 = np.empty_like(ox), np.empty_like(oy)
        ox2[perm] = ox
        oy2[perm] = oy
        ox, oy = ox2, oy2
        oarea = np.where(flip, -oarea, oarea)

    return {"xs": ox, "ys": oy, "offsets": out_off,
            "ring_keep": ring_keep, "signed_area": oarea}


def rings_self_intersect(px: np.ndarray, py: np.ndarray,
                         ring_offsets: np.ndarray) -> np.ndarray:
    """Per-ring self-intersection detection (the ``strict`` probe for
    external inputs; the reference would repair with ``buffer(0)``).

    O(k²) segment test per ring, vectorized across each ring's segment
    pairs — intended for validation paths, not the tile hot path.
    """
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n = len(ring_offsets) - 1
    out = np.zeros(n, bool)
    for r in range(n):
        a, b = ring_offsets[r], ring_offsets[r + 1]
        k = b - a
        if k < 4:
            continue
        x = np.concatenate([px[a:b], px[a:a + 1]])
        y = np.concatenate([py[a:b], py[a:a + 1]])
        x0, y0, x1, y1 = x[:-1], y[:-1], x[1:], y[1:]
        i, j = np.triu_indices(k, k=2)
        # skip the wrap pair (first segment vs last segment share a vertex)
        mask = ~((i == 0) & (j == k - 1))
        i, j = i[mask], j[mask]
        d = lambda ax, ay, bx, by, cx, cy: (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        d1 = d(x0[i], y0[i], x1[i], y1[i], x0[j], y0[j])
        d2 = d(x0[i], y0[i], x1[i], y1[i], x1[j], y1[j])
        d3 = d(x0[j], y0[j], x1[j], y1[j], x0[i], y0[i])
        d4 = d(x0[j], y0[j], x1[j], y1[j], x1[i], y1[i])
        hit = ((d1 * d2) < 0) & ((d3 * d4) < 0)
        out[r] = bool(hit.any())
        if not out[r]:
            # vertex-pinched figure-8: two NON-adjacent vertices snapped
            # onto the same point — no proper crossing, but the ring is
            # not simple (exactly the bowtie grid snapping produces)
            pts = np.stack([x[:k], y[:k]], axis=1)
            out[r] = len(np.unique(pts, axis=0)) != k
    return out


def _split_pinched_ring(px: np.ndarray, py: np.ndarray
                        ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split a ring at repeated (non-adjacent) vertices: each revisit of
    an earlier vertex pops the enclosed loop as its own sub-ring (the
    same rewind walk as the crossing split, keyed by exact coordinate).
    """
    rings: list[list[tuple[float, float]]] = []
    path: list[tuple[float, float]] = []
    open_pos: dict[tuple[float, float], int] = {}
    for x, y in zip(px, py):
        key = (float(x), float(y))
        if key in open_pos:
            start = open_pos[key]
            sub = path[start:]
            for k2, p in list(open_pos.items()):
                if p > start:
                    del open_pos[k2]
            del path[start:]
            if len(set(sub)) >= 3:
                rings.append(sub)
        open_pos[key] = len(path)
        path.append(key)
    if len(set(path)) >= 3:
        rings.append(path)
    return [(np.array([p[0] for p in r]), np.array([p[1] for p in r]))
            for r in rings]


def _segment_intersections(px: np.ndarray, py: np.ndarray):
    """Proper crossings between non-adjacent segments of one closed ring
    (vertices open, closing edge implied).  Vectorized over the segment
    pairs; returns (i, j, t_i, t_j, ix, iy) per crossing."""
    k = len(px)
    x0, y0 = px, py
    x1 = np.roll(px, -1)
    y1 = np.roll(py, -1)
    i, j = np.triu_indices(k, k=2)
    wrap = (i == 0) & (j == k - 1)
    i, j = i[~wrap], j[~wrap]
    d = lambda ax, ay, bx, by, cx, cy: \
        (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d1 = d(x0[i], y0[i], x1[i], y1[i], x0[j], y0[j])
    d2 = d(x0[i], y0[i], x1[i], y1[i], x1[j], y1[j])
    d3 = d(x0[j], y0[j], x1[j], y1[j], x0[i], y0[i])
    d4 = d(x0[j], y0[j], x1[j], y1[j], x1[i], y1[i])
    hit = ((d1 * d2) < 0) & ((d3 * d4) < 0)
    i, j = i[hit], j[hit]
    if not len(i):
        return i, j, i.astype(float), i.astype(float), i.astype(float), \
            i.astype(float)
    # parametric intersection (denominators nonzero for proper crossings)
    dxi, dyi = x1[i] - x0[i], y1[i] - y0[i]
    dxj, dyj = x1[j] - x0[j], y1[j] - y0[j]
    den = dxi * dyj - dyi * dxj
    ti = ((x0[j] - x0[i]) * dyj - (y0[j] - y0[i]) * dxj) / den
    tj = ((x0[j] - x0[i]) * dyi - (y0[j] - y0[i]) * dxi) / den
    return i, j, ti, tj, x0[i] + ti * dxi, y0[i] + ti * dyi


def split_self_intersecting_ring(px: np.ndarray, py: np.ndarray,
                                 _crossings=None
                                 ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split one self-intersecting ring into simple sub-rings — the
    ``buffer(0)`` rung of the reference's repair ladder
    (``GeoUtils.snapAndFixPolygon``, ``geo/GeoUtils.java:315-399``) for
    the crossings grid-snapping introduces: a quantization bowtie
    becomes its two lobes, each a simple ring (orientation NOT
    normalized here — callers re-orient).

    Method: first split at repeated (pinched) vertices, then insert
    every proper segment-crossing point into both edges (ordered by the
    parametric t) and walk the expanded vertex cycle popping a sub-ring
    whenever a crossing point is revisited (the standard rewind split).
    Degenerate pops (< 3 distinct vertices) are dropped.
    """
    parts = _split_pinched_ring(px, py)
    if len(parts) != 1:
        out: list[tuple[np.ndarray, np.ndarray]] = []
        for sx, sy in parts:
            out.extend(split_self_intersecting_ring(sx, sy))
        return out
    px, py = parts[0]
    i, j, ti, tj, ix, iy = (_crossings if _crossings is not None
                            else _segment_intersections(px, py))
    if not len(i):
        return [(px, py)]
    k = len(px)
    per_seg: list[list[tuple[float, float, float, int]]] = \
        [[] for _ in range(k)]
    for n, (a, b) in enumerate(zip(i, j)):
        per_seg[a].append((ti[n], ix[n], iy[n], n))
        per_seg[b].append((tj[n], ix[n], iy[n], n))
    verts: list[tuple[float, float, int]] = []   # (x, y, crossing id | -1)
    for s in range(k):
        verts.append((px[s], py[s], -1))
        for t, x, y, n in sorted(per_seg[s]):
            verts.append((x, y, n))
    rings = []
    path: list[tuple[float, float, int]] = []
    open_pos: dict[int, int] = {}
    for v in verts:
        if v[2] >= 0 and v[2] in open_pos:
            start = open_pos.pop(v[2])
            sub = path[start:]
            # crossing ids opened inside the popped loop are gone
            for cid, p in list(open_pos.items()):
                if p > start:
                    del open_pos[cid]
            del path[start:]
            if len({(sx, sy) for sx, sy, _ in sub}) >= 3:
                rings.append((np.array([p[0] for p in sub]),
                              np.array([p[1] for p in sub])))
            path.append(v)
            open_pos[v[2]] = len(path) - 1
        else:
            if v[2] >= 0:
                open_pos[v[2]] = len(path)
            path.append(v)
    if len({(sx, sy) for sx, sy, _ in path}) >= 3:
        rings.append((np.array([p[0] for p in path]),
                      np.array([p[1] for p in path])))
    return rings


def repair_rings(px: np.ndarray, py: np.ndarray, ring_offsets: np.ndarray,
                 max_check_verts: int = 4096,
                 stats=None) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]:
    """Detect + split self-intersecting rings in a flattened ring batch
    (the escalation rung after ``snap_fix_rings``).  Rings larger than
    ``max_check_verts`` skip the O(k²) crossing test (counted against
    ``data_errors.ring_repair_skipped`` when ``stats`` is given).

    Returns ``(xs, ys, offsets, src_ring)`` where ``src_ring`` maps each
    output ring to its input ring index (splits share the source).
    """
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n = len(ring_offsets) - 1
    out_x, out_y, src = [], [], []
    for r in range(n):
        a, b = ring_offsets[r], ring_offsets[r + 1]
        rx, ry = px[a:b], py[a:b]
        if b - a > max_check_verts:
            if stats is not None:
                stats.data_error("ring_repair_skipped")
            out_x.append(rx)
            out_y.append(ry)
            src.append(r)
            continue
        if b - a < 4:
            out_x.append(rx)
            out_y.append(ry)
            src.append(r)
            continue
        # one O(k^2) pass: pinch test is O(k log k); the crossing set is
        # computed ONCE here and reused by the splitter
        pts = np.stack([rx, ry], axis=1)
        pinched = len(np.unique(pts, axis=0)) != (b - a)
        crossings = None
        if not pinched:
            crossings = _segment_intersections(rx, ry)
            if not len(crossings[0]):
                out_x.append(rx)
                out_y.append(ry)
                src.append(r)
                continue
        if stats is not None:
            stats.data_error("self_intersecting_ring_repaired")
        for sx, sy in split_self_intersecting_ring(rx, ry,
                                                   _crossings=crossings):
            out_x.append(sx)
            out_y.append(sy)
            src.append(r)
    counts = np.array([len(x) for x in out_x], np.int64)
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return (np.concatenate(out_x) if out_x else np.empty(0),
            np.concatenate(out_y) if out_y else np.empty(0),
            offsets, np.array(src, np.int64))
