"""Per-tile feature-merge operators — the ``FeatureMerge`` analogs.

Re-expressions of the reference's per-tile post-processing library
(``FeatureMerge.java``, ``util/LoopLineMerger.java``) for this engine's
geometry model (axis-aligned boxes, points, polylines), all pure
numpy/python with no GEOS dependency:

- :func:`merge_multipoint` — group points by attribute key → one
  multipoint per group, parts Hilbert-ordered, merged id ``(id//10)*10``
  (``FeatureMerge.java:116-162,396-402``)
- :func:`merge_overlapping_boxes` — cluster boxes that overlap within
  ``min_dist`` via union-find (the STRtree + connected-components walk of
  ``FeatureMerge.java:601-672`` becomes a sweep over sorted intervals);
  per cluster emit the merged extent, the EXACT union area (coordinate-
  compression sweep — no polygon booleans needed for rectilinear
  input), feature count and merged id; drop clusters below ``min_area``
  (``FeatureMerge.java:291-394`` semantics, outline reduced to the
  cluster extent)
- :func:`merge_lines` — merge polylines at touching endpoints, remove
  short stubs, Douglas-Peucker simplify (``LoopLineMerger`` semantics:
  endpoint-degree-based joining, min-length stub pruning)
- :func:`remove_points_outside_buffer` — drop multipoint parts outside
  the tile buffer, drop features left empty
  (``FeatureMerge.java:678-695``)
"""

from __future__ import annotations

import numpy as np

from ..tilemath.clip import _expand_ranges
from ..tilemath.hilbert import hilbert_xy_to_index
from ..tilemath.simplify import douglas_peucker


def merge_multipoint(ids: np.ndarray, group_key: np.ndarray,
                     px: np.ndarray, py: np.ndarray,
                     extent: int = 4096) -> dict:
    """Group points by ``group_key`` → multipoints, parts Hilbert-ordered.

    Returns dict of per-group arrays: group (key), merged_id, offsets +
    flattened xs/ys (list layout).  Part order inside each group follows
    the per-tile Hilbert index of the quantized coordinate, matching the
    reference's part ordering (``FeatureMerge.java:396-402``).
    """
    order = np.lexsort((ids, group_key))
    g = group_key[order]
    change = np.empty(len(g), bool)
    if len(g):
        change[0] = True
        change[1:] = np.diff(g) != 0
    grp = np.cumsum(change) - 1
    # merged id = the group's MIN id (order is (group, id)-sorted HERE,
    # before the hilbert re-sort below — that one orders the PARTS, it
    # must not pick the identity)
    min_ids = ids[order][np.flatnonzero(change)] if len(g) \
        else np.empty(0, ids.dtype)

    # hilbert order within group (level 12 covers extent 4096)
    qx = np.clip((px[order] * (4096 / extent)).astype(np.int64), 0, 4095)
    qy = np.clip((py[order] * (4096 / extent)).astype(np.int64), 0, 4095)
    hil = hilbert_xy_to_index(12, qx, qy)
    sub = np.lexsort((hil, grp))
    order = order[sub]
    grp = grp[sub]

    n_groups = int(grp[-1]) + 1 if len(grp) else 0
    counts = np.bincount(grp, minlength=n_groups)
    offsets = np.zeros(n_groups + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    first = offsets[:-1]
    return {
        "group": group_key[order][first],
        "merged_id": (min_ids // 10) * 10,
        "n_parts": counts,
        "offsets": offsets,
        "xs": px[order],
        "ys": py[order],
    }


def remove_points_outside_buffer(px: np.ndarray, py: np.ndarray,
                                 offsets: np.ndarray, buffer: float,
                                 extent: int = 256) -> dict:
    """Drop multipoint parts outside ``[-buffer, extent+buffer]``.

    Batch-vectorized analog of the reference's
    ``FeatureMerge.removePointsOutsideBuffer``
    (``FeatureMerge.java:678-695``): every feature is a run of points in
    the flattened ``px``/``py`` stream delimited by ``offsets`` (list
    layout, ``len(offsets) == n_features + 1``).  Points strictly outside
    the buffered tile square are removed; features left with zero points
    are dropped entirely.

    Returns ``{"xs", "ys", "offsets", "feature_keep"}`` where
    ``feature_keep`` is the boolean mask of surviving input features and
    ``offsets`` delimits the surviving features' (filtered) point runs.
    """
    offsets = np.asarray(offsets, np.int64)
    n_feat = len(offsets) - 1
    lo, hi = -buffer, extent + buffer
    inside = (px >= lo) & (px <= hi) & (py >= lo) & (py <= hi)
    # per-feature surviving-point counts via prefix sums (robust to
    # empty runs and a trailing offset == len(px), unlike reduceat)
    cs = np.zeros(len(px) + 1, np.int64)
    np.cumsum(inside, out=cs[1:])
    counts = cs[offsets[1:]] - cs[offsets[:-1]] if n_feat else np.zeros(0, np.int64)
    feature_keep = counts > 0
    new_counts = counts[feature_keep]
    new_offsets = np.zeros(len(new_counts) + 1, np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    return {
        "xs": px[inside],
        "ys": py[inside],
        "offsets": new_offsets,
        "feature_keep": feature_keep,
    }


def _connected_components(n: int, ei: np.ndarray, ej: np.ndarray) -> np.ndarray:
    """Root label per node for ``n`` nodes and undirected edge list
    ``(ei, ej)`` — vectorized pointer jumping (hook lower root onto
    higher + path halving to fixpoint), O((E+N)·log N) numpy passes
    with no per-edge Python loop.  Roots are component minima, so the
    labeling is deterministic."""
    parent = np.arange(n, dtype=np.int64)
    if len(ei) == 0:
        return parent
    ei = np.asarray(ei, np.int64)
    ej = np.asarray(ej, np.int64)
    while True:
        pi_, pj_ = parent[ei], parent[ej]
        lo = np.minimum(pi_, pj_)
        hi = np.maximum(pi_, pj_)
        before = parent.copy()
        np.minimum.at(parent, hi, lo)
        pp = parent[parent]
        while not np.array_equal(pp, parent):
            parent = pp
            pp = parent[parent]
        if np.array_equal(parent, before):
            return parent


def _union_area(x0, y0, x1, y1) -> float:
    """Exact union area of axis-aligned rectangles (coordinate compression)."""
    xs = np.unique(np.concatenate([x0, x1]))
    if len(xs) < 2:
        return 0.0
    area = 0.0
    for i in range(len(xs) - 1):
        lo, hi = xs[i], xs[i + 1]
        m = (x0 < hi) & (x1 > lo)
        if not m.any():
            continue
        # merged y-interval length within this x-slab
        yy0, yy1 = y0[m], y1[m]
        o = np.argsort(yy0)
        yy0, yy1 = yy0[o], yy1[o]
        total, cur_lo, cur_hi = 0.0, yy0[0], yy1[0]
        for a, b in zip(yy0[1:], yy1[1:]):
            if a > cur_hi:
                total += cur_hi - cur_lo
                cur_lo, cur_hi = a, b
            else:
                cur_hi = max(cur_hi, b)
        total += cur_hi - cur_lo
        area += total * (hi - lo)
    return float(area)


def merge_overlapping_boxes(ids: np.ndarray, x0: np.ndarray, y0: np.ndarray,
                            x1: np.ndarray, y1: np.ndarray,
                            min_dist: float = 0.0,
                            min_area: float = 0.0) -> dict:
    """Cluster boxes overlapping within ``min_dist``; merge per cluster.

    Sweep over x-sorted expanded intervals finds overlapping candidate
    pairs; union-find builds connected components (the reference's
    iterative-DFS over STRtree adjacency, ``FeatureMerge.java:601-672``).
    Output per cluster: extent, exact union area, n features, merged id
    ``(min_id//10)*10``; clusters with union area < ``min_area`` dropped.
    """
    n = len(ids)
    if n == 0:
        return {"merged_id": np.empty(0, np.int64), "n_features": np.empty(0, np.int64),
                "mx0": np.empty(0), "my0": np.empty(0), "mx1": np.empty(0),
                "my1": np.empty(0), "union_area": np.empty(0)}
    half = min_dist / 2.0
    ex0, ey0, ex1, ey1 = x0 - half, y0 - half, x1 + half, y1 + half

    # vectorized candidate pairs: sort by expanded x-start; box i's
    # x-overlap candidates are the consecutive later boxes whose start
    # precedes i's end (searchsorted range), expanded in one shot and
    # filtered by y-overlap — work is O(n log n + P) for P real pairs,
    # not O(n · active) Python
    order = np.argsort(ex0, kind="stable")
    sx0, sx1 = ex0[order], ex1[order]
    sy0, sy1 = ey0[order], ey1[order]
    hi = np.searchsorted(sx0, sx1, side="right")
    lo = np.arange(n) + 1
    pi, pj = _expand_ranges(lo, hi - 1)
    ym = (sy0[pi] <= sy1[pj]) & (sy1[pi] >= sy0[pj])
    pi, pj = pi[ym], pj[ym]

    roots = _connected_components(n, order[pi], order[pj])
    _, comp = np.unique(roots, return_inverse=True)

    n_comp = int(comp.max()) + 1
    # per-component extents/ids via sort + reduceat (no per-component mask)
    corder = np.argsort(comp, kind="stable")
    cc = comp[corder]
    starts = np.flatnonzero(np.concatenate([[True], np.diff(cc) != 0]))
    ends = np.append(starts[1:], n)
    out = {
        "merged_id": (np.minimum.reduceat(ids[corder], starts) // 10) * 10,
        "n_features": (ends - starts).astype(np.int64),
        "mx0": np.minimum.reduceat(x0[corder], starts),
        "my0": np.minimum.reduceat(y0[corder], starts),
        "mx1": np.maximum.reduceat(x1[corder], starts),
        "my1": np.maximum.reduceat(y1[corder], starts),
        "union_area": np.empty(n_comp),
    }
    for c in range(n_comp):
        s = corder[starts[c]:ends[c]]
        out["union_area"][c] = _union_area(x0[s], y0[s], x1[s], y1[s])
    keep = out["union_area"] >= min_area
    return {k: v[keep] for k, v in out.items()}


class LineMerger:
    """Graph-based polyline merger — the ``util/LoopLineMerger.java``
    re-expression (semantics per ``:40-386``; incremental, not a port).

    Steps, in the reference's order (``getMergedLineStrings``):

    1. node the input: split lines at quantized points shared with other
       lines, build an edge graph between endpoint nodes
    2. ``degree_two_merge`` — join the two edges at every degree-2 node,
       preserving segment direction (incremental queue, linear — no full
       registry rebuild per join)
    3. ``break_loops`` (``loopMinLength``) — at each multi-edge node,
       collect the edges that close a cycle shorter than the threshold
       (bounded A* for the return path) and keep only the shortest
    4. ``remove_short_stubs`` (``stubMinLength``) — priority queue by
       length; a stub touches a degree-1 node or is a self-loop;
       removal cascades through re-merged degree-2 nodes
    5. simplify (Douglas-Peucker, endpoints pinned) + drop duplicate
       edges + re-merge
    6. ``remove_short_edges`` (``minLength``)
    """

    def __init__(self, min_length: float = 0.0, loop_min_length: float = 0.0,
                 stub_min_length: float = 0.0, tolerance: float = -1.0,
                 precision: float = 16.0):
        self.min_length = min_length
        self.loop_min_length = loop_min_length
        self.stub_min_length = stub_min_length
        self.tolerance = tolerance
        self.precision = precision
        self.edges: dict[int, dict] = {}
        self.adj: dict[tuple, set] = {}
        self._next = 0

    # -- graph plumbing ----------------------------------------------------
    def _q(self, coords: np.ndarray) -> np.ndarray:
        if self.precision and self.precision > 0:
            return np.round(coords * self.precision) / self.precision
        return np.asarray(coords, np.float64)

    @staticmethod
    def _length(c: np.ndarray) -> float:
        d = np.diff(c, axis=0)
        return float(np.hypot(d[:, 0], d[:, 1]).sum())

    def _add_edge(self, coords: np.ndarray) -> int | None:
        # drop consecutive duplicate points introduced by quantization
        if len(coords) >= 2:
            same = (np.diff(coords, axis=0) == 0).all(axis=1)
            if same.any():
                coords = coords[np.concatenate([[True], ~same])]
        if len(coords) < 2:
            return None
        eid = self._next
        self._next += 1
        a, b = tuple(coords[0]), tuple(coords[-1])
        e = {"id": eid, "coords": coords, "a": a, "b": b,
             "len": self._length(coords), "removed": False}
        self.edges[eid] = e
        self.adj.setdefault(a, set()).add((eid, 0))
        self.adj.setdefault(b, set()).add((eid, 1))
        return eid

    def _remove_edge(self, eid: int):
        e = self.edges[eid]
        if e["removed"]:
            return
        e["removed"] = True
        self.adj[e["a"]].discard((eid, 0))
        self.adj[e["b"]].discard((eid, 1))

    def _degree(self, node: tuple) -> int:
        return len(self.adj.get(node, ()))

    # -- construction ------------------------------------------------------
    def add_lines(self, lines: list[np.ndarray]):
        qlines = [self._q(np.asarray(l, np.float64)) for l in lines if len(l) >= 2]
        # usage count of each quantized vertex across all lines → split at
        # interior vertices shared with any other use (the nodeLines step)
        counts: dict[tuple, int] = {}
        for l in qlines:
            for p in map(tuple, l):
                counts[p] = counts.get(p, 0) + 1
        for l in qlines:
            cut = [0]
            for k in range(1, len(l) - 1):
                if counts[tuple(l[k])] > 1:
                    cut.append(k)
            cut.append(len(l) - 1)
            for s, t in zip(cut[:-1], cut[1:]):
                self._add_edge(l[s:t + 1])

    # -- step 2: degree-2 merge (incremental) ------------------------------
    def _merge_at(self, node: tuple) -> int | None:
        ends = list(self.adj.get(node, ()))
        if len(ends) != 2:
            return None
        (e1, end1), (e2, end2) = ends
        if e1 == e2:
            return None          # self-loop: degree is really > 2
        a = self.edges[e1]
        b = self.edges[e2]
        # orient: ...→node from edge1, node→... from edge2
        ca = a["coords"] if end1 == 1 else a["coords"][::-1]
        cb = b["coords"] if end2 == 0 else b["coords"][::-1]
        self._remove_edge(e1)
        self._remove_edge(e2)
        return self._add_edge(np.vstack([ca, cb[1:]]))

    def degree_two_merge(self):
        queue = list(self.adj.keys())
        while queue:
            node = queue.pop()
            self._merge_at(node)

    # -- step 3: loop removal ---------------------------------------------
    def _astar(self, start: tuple, end: tuple, exclude: tuple,
               max_len: float) -> float:
        """Shortest path start→end avoiding ``exclude``, bounded."""
        import heapq
        if max_len < 0:
            return float("inf")
        if start == end:
            return 0.0
        h = lambda p: float(np.hypot(p[0] - end[0], p[1] - end[1]))
        best = {start: 0.0}
        heap = [(h(start), 0.0, start)]
        while heap:
            f, g, node = heapq.heappop(heap)
            if node == end:
                return g
            if g > best.get(node, float("inf")):
                continue
            for eid, endix in self.adj.get(node, ()):
                e = self.edges[eid]
                nxt = e["b"] if endix == 0 else e["a"]
                if nxt == exclude:
                    continue
                ng = g + e["len"]
                if ng > max_len or ng >= best.get(nxt, float("inf")):
                    continue
                best[nxt] = ng
                heapq.heappush(heap, (ng + h(nxt), ng, nxt))
        return float("inf")

    def break_loops(self):
        for node in list(self.adj.keys()):
            for cur_eid, cur_end in list(self.adj.get(node, ())):
                if self._degree(node) <= 1:
                    break
                cur = self.edges[cur_eid]
                if cur["removed"]:
                    continue
                cur_to = cur["b"] if cur_end == 0 else cur["a"]
                loops = []
                for other_eid, other_end in list(self.adj.get(node, ())):
                    other = self.edges[other_eid]
                    other_to = other["b"] if other_end == 0 else other["a"]
                    dist = other["len"] + self._astar(
                        other_to, cur_to, node,
                        self.loop_min_length - other["len"])
                    if dist <= self.loop_min_length:
                        loops.append((dist, other_eid))
                if len(loops) > 1:
                    loops.sort()
                    for _, eid in loops[1:]:
                        self._remove_edge(eid)

    # -- step 4: stub removal ---------------------------------------------
    def _is_stub(self, eid: int) -> bool:
        e = self.edges.get(eid)
        if e is None or e["removed"] or e["len"] >= self.stub_min_length:
            return False
        return (self._degree(e["a"]) == 1 or self._degree(e["b"]) == 1
                or e["a"] == e["b"])

    def remove_short_stubs(self):
        import heapq
        heap = [(self.edges[eid]["len"], eid) for eid in self.edges
                if self._is_stub(eid)]
        heapq.heapify(heap)
        while heap:
            _, eid = heapq.heappop(heap)
            e = self.edges[eid]
            if e["removed"]:
                continue
            if self._is_stub(eid):
                self._remove_edge(eid)
            for node in {e["a"], e["b"]}:
                merged = self._merge_at(node)
                if merged is not None and self._is_stub(merged):
                    heapq.heappush(heap, (self.edges[merged]["len"], merged))
                ends = list(self.adj.get(node, ()))
                if len(ends) == 1 and self._is_stub(ends[0][0]):
                    heapq.heappush(heap, (self.edges[ends[0][0]]["len"],
                                          ends[0][0]))

    # -- steps 5-6 ---------------------------------------------------------
    def simplify_edges(self):
        for eid in list(self.edges):
            e = self.edges[eid]
            if e["removed"]:
                continue
            c = douglas_peucker(e["coords"], self.tolerance)
            c = self._q(c)
            self._remove_edge(eid)
            self._add_edge(c)
        self._remove_duplicates()
        self.degree_two_merge()

    def _remove_duplicates(self):
        seen = set()
        for eid in list(self.edges):
            e = self.edges[eid]
            if e["removed"]:
                continue
            key = tuple(map(tuple, e["coords"]))
            rkey = tuple(map(tuple, e["coords"][::-1]))
            if key in seen or rkey in seen:
                self._remove_edge(eid)
            else:
                seen.add(key)

    def remove_short_edges(self):
        for eid in list(self.edges):
            e = self.edges[eid]
            if not e["removed"] and e["len"] < self.min_length:
                self._remove_edge(eid)

    def merged(self) -> list[np.ndarray]:
        self.degree_two_merge()
        if self.loop_min_length > 0:
            self.break_loops()
            self.degree_two_merge()
        if self.stub_min_length > 0:
            self.remove_short_stubs()
        if self.tolerance >= 0:
            self.simplify_edges()
        if self.min_length > 0:
            self.remove_short_edges()
        return [e["coords"] for e in self.edges.values() if not e["removed"]]


def line_extra_precision_scale(zoom: int, max_zoom: int = 14) -> int:
    """Extra line precision exponent — lines are stored/merged with
    ``2^scale`` sub-grid precision so base-grid rounding cannot
    introduce artificial endpoint intersections before the merge
    (``render/FeatureRenderer.java:260-269``: ``max(maxzoom, 14) -
    zoom``, capped at ``31 - 14`` to keep zigzag deltas in 32 bits)."""
    return int(min(31 - 14, max(max_zoom, 14) - zoom))


def unscale_lines(lines: list[np.ndarray], scale: int,
                  base: float = 16.0) -> list[np.ndarray]:
    """Scale merged lines back down to the base 1/16-px grid — the
    ``VectorTile.unscale`` walk (``VectorTile.java:113-200``): each
    vertex rounds half-up (Java ``Math.round`` = ``floor(x+0.5)``) to
    the base grid, consecutive vertices that land on the same point
    collapse, and lines left with fewer than 2 points drop entirely.
    ``scale`` is informational (coords are px floats on the
    ``base·2^scale`` grid); the rounding target is always ``base``."""
    out = []
    for c in lines:
        q = np.floor(np.asarray(c, np.float64) * base + 0.5) / base
        if len(q) >= 2:
            same = (np.diff(q, axis=0) == 0).all(axis=1)
            if same.any():
                q = q[np.concatenate([[True], ~same])]
        if len(q) >= 2:
            out.append(q)
    return out


def merge_lines(lines: list[np.ndarray], min_length: float = 0.0,
                tolerance: float = -1.0, loop_min_length: float = 0.0,
                stub_min_length: float = 0.0,
                precision: float = 0.0) -> list[np.ndarray]:
    """Merge polylines at touching endpoints; remove loops/stubs; simplify.

    Thin wrapper over :class:`LineMerger` (``util/LoopLineMerger.java``
    semantics).  ``precision=0`` keeps coordinates exact (legacy callers
    quantize beforehand); pass 16.0 for the reference's 1/16-px grid.
    """
    m = LineMerger(min_length=min_length, loop_min_length=loop_min_length,
                   stub_min_length=stub_min_length, tolerance=tolerance,
                   precision=precision)
    m.add_lines(lines)
    return m.merged()


# ---------------------------------------------------------------------------
# general-polygon overlap/nearby merge — FeatureMerge.mergeOverlapping/
# NearbyPolygons (FeatureMerge.java:291-394,459-513) beyond boxes.
#
# No GEOS in this engine, so the buffer(+b) → union → buffer(−b) ladder
# is re-expressed as a BOOLEAN ON THE QUANTIZED GRID: rasterize each
# cluster's rings onto a local cell grid (even-odd per polygon, OR
# across polygons), dilate/erode by b cells (square structuring element
# — the reference's round buffer caps differ at corners; documented
# approximation), then trace the boundary back into rectilinear rings.
# For grid-aligned rectilinear input at res=1 the result equals the
# exact union (what the SQL oracle checks); for general polygons it is
# the union quantized to the tile's sub-pixel grid — the same precision
# the MVT encode quantizes to anyway.
# ---------------------------------------------------------------------------


def _fill_polys_grid(px: np.ndarray, py: np.ndarray, ring_offsets: np.ndarray,
                     poly_of_ring: np.ndarray, W: int, H: int) -> np.ndarray:
    """Rasterize polygons onto an H×W cell grid: cell (r, c) is filled
    iff its center (c+0.5, r+0.5) lies inside ≥1 polygon, where each
    polygon's interior is the even-odd fill of ITS rings (holes carve).
    Fully vectorized over every (edge, row) crossing."""
    if len(ring_offsets) <= 1 or len(px) == 0:
        return np.zeros((H, W), bool)
    idx = np.arange(len(px), dtype=np.int64)
    rid = np.searchsorted(ring_offsets, idx, side="right") - 1
    nxt = idx + 1
    last = ring_offsets[rid + 1] - 1
    nxt[idx == last] = ring_offsets[rid[idx == last]]
    pid = poly_of_ring[rid]
    x1, y1, x2, y2 = px, py, px[nxt], py[nxt]
    keep = y1 != y2
    x1, y1, x2, y2, pid = x1[keep], y1[keep], x2[keep], y2[keep], pid[keep]
    ylo, yhi = np.minimum(y1, y2), np.maximum(y1, y2)
    r0 = np.clip(np.ceil(ylo - 0.5).astype(np.int64), 0, H)
    r1 = np.clip(np.ceil(yhi - 0.5).astype(np.int64), 0, H)
    eidx, rows = _expand_ranges(r0, r1 - 1)
    if len(eidx) == 0:
        return np.zeros((H, W), bool)
    yc = rows + 0.5
    xin = x1[eidx] + (yc - y1[eidx]) * (x2[eidx] - x1[eidx]) \
        / (y2[eidx] - y1[eidx])
    ep = pid[eidx]
    # even-odd parity per (poly, row): sort crossings, alternate
    order = np.lexsort((xin, rows, ep))
    rows, xin, ep = rows[order], xin[order], ep[order]
    grp_change = np.empty(len(rows), bool)
    grp_change[0] = True
    grp_change[1:] = (np.diff(ep) != 0) | (np.diff(rows) != 0)
    pos = np.arange(len(rows)) - np.maximum.accumulate(
        np.where(grp_change, np.arange(len(rows)), 0))
    even = pos % 2 == 0
    lo_x, hi_x, lo_r = xin[even], xin[~even], rows[even]
    c0 = np.clip(np.ceil(lo_x - 0.5).astype(np.int64), 0, W)
    c1 = np.clip(np.ceil(hi_x - 0.5).astype(np.int64), 0, W)
    ok = c1 > c0
    diff = np.zeros(H * W + 1, np.int64)
    base = lo_r[ok] * W
    np.add.at(diff, base + c0[ok], 1)
    np.add.at(diff, base + c1[ok], -1)
    # coverage count > 0 = union across polygons (per-poly even-odd
    # already resolved into disjoint intervals per row)
    return (np.cumsum(diff[:-1]) > 0).reshape(H, W)


def _morph_square(grid: np.ndarray, k: int, dilate: bool) -> np.ndarray:
    """Binary dilation/erosion by a (2k+1)² square structuring element
    via 2-D window sums over an integral image — O(H·W)."""
    if k <= 0:
        return grid
    H, W = grid.shape
    S = np.zeros((H + 1, W + 1), np.int64)
    np.cumsum(np.cumsum(grid.astype(np.int64), 0), 1, out=S[1:, 1:])
    r0 = np.clip(np.arange(H) - k, 0, H)
    r1 = np.clip(np.arange(H) + k + 1, 0, H)
    c0 = np.clip(np.arange(W) - k, 0, W)
    c1 = np.clip(np.arange(W) + k + 1, 0, W)
    win = S[r1][:, c1] - S[r1][:, c0] - S[r0][:, c1] + S[r0][:, c0]
    if dilate:
        return win > 0
    full = (r1 - r0)[:, None] * (c1 - c0)[None, :]
    return win == full


def _grid_region_labels(grid: np.ndarray) -> np.ndarray:
    """4-connected component label per filled cell (−1 for empty),
    fully vectorized: horizontal runs become nodes (one pad column so
    runs never wrap rows), vertically adjacent filled cells connect
    their runs, components resolved by pointer jumping.  Used to key
    each traced hole ring to the shell ring of the SAME filled region
    (exact — no floating-point point-in-polygon)."""
    H, W = grid.shape
    padded = np.zeros((H, W + 1), bool)
    padded[:, :W] = grid
    flat = padded.reshape(-1)
    d = np.diff(flat.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if flat[0]:
        starts = np.concatenate([[0], starts])
    n_runs = len(starts)
    if n_runs == 0:
        return np.full((H, W), -1, np.int64)
    ri, pos = _expand_ranges(np.asarray(starts, np.int64),
                             np.asarray(ends, np.int64) - 1)
    run_of = np.full(H * (W + 1), -1, np.int64)
    run_of[pos] = ri
    vert = grid[:-1, :] & grid[1:, :]
    r, c = np.nonzero(vert)
    roots = _connected_components(
        n_runs, run_of[r * (W + 1) + c], run_of[(r + 1) * (W + 1) + c])
    labels = np.full(H * (W + 1), -1, np.int64)
    labels[pos] = roots[ri]
    return labels.reshape(H, W + 1)[:, :W]


# directed-edge dirs: 0 = +x, 1 = +y, 2 = −x, 3 = −y
_DIR_DX = np.array([1, 0, -1, 0])
_DIR_DY = np.array([0, 1, 0, -1])


def _trace_grid_rings(grid: np.ndarray, with_cells: bool = False):
    """Boundary rings of a binary cell grid as rectilinear polygons.

    Interior is kept on the LEFT of every directed boundary edge, so
    outer rings come out CCW (positive shoelace) and holes CW.  At
    checkerboard corners the walk takes the LEFT-most turn —
    4-connectivity: corner-touching cells stay separate rings.  Edge
    extraction and next-pointer resolution are vectorized; the final
    walk is output-proportional (one step per boundary edge, emitting
    only corner vertices).

    Returns a list of (xs, ys) open rings in grid coordinates; with
    ``with_cells=True`` returns ``(rings, cells)`` where ``cells[i]``
    is the (row, col) of one interior (filled) cell adjacent to ring
    i's first edge — the exact hole→shell region key (two rings bound
    the same 4-connected filled region iff their cells share a region
    label, see ``_grid_region_labels``).
    """
    H, W = grid.shape
    g = np.zeros((H + 2, W + 2), bool)
    g[1:-1, 1:-1] = grid
    # per filled cell (r, c) with empty neighbor → one directed edge,
    # interior on the left (cells live at x∈[c,c+1], y∈[r,r+1]):
    #   south empty → (c, r)   → +x     east empty  → (c+1, r)   → +y
    #   north empty → (c+1,r+1)→ −x     west empty  → (c, r+1)   → −y
    fx, fy, fd = [], [], []
    south = g[1:, :] & ~g[:-1, :]            # south[r,c]: cell (r+1,c) filled,
    r, c = np.nonzero(south)                 # (r,c) empty → bottom edge y=r+1
    fx.append(c); fy.append(r + 1); fd.append(np.zeros(len(r), np.int64))
    north = g[:-1, :] & ~g[1:, :]
    r, c = np.nonzero(north)
    fx.append(c + 1); fy.append(r + 1); fd.append(np.full(len(r), 2))
    west = g[:, 1:] & ~g[:, :-1]
    r, c = np.nonzero(west)
    fx.append(c + 1); fy.append(r + 1); fd.append(np.full(len(r), 3))
    east = g[:, :-1] & ~g[:, 1:]
    r, c = np.nonzero(east)
    fx.append(c + 1); fy.append(r); fd.append(np.full(len(r), 1))
    ex = np.concatenate(fx)
    ey = np.concatenate(fy)
    ed = np.concatenate(fd).astype(np.int64)
    E = len(ex)
    if E == 0:
        return ([], []) if with_cells else []
    tx = ex + _DIR_DX[ed]
    ty = ey + _DIR_DY[ed]
    # outgoing-edge lookup: one edge max per (vertex, dir)
    VW = W + 3
    out = np.full((H + 3) * VW * 4, -1, np.int64)
    out[(ey * VW + ex) * 4 + ed] = np.arange(E)
    # next = first of left turn, straight, right turn at the end vertex
    nxt = np.full(E, -1, np.int64)
    vkey = (ty * VW + tx) * 4
    for turn in (1, 0, 3):                   # left, straight, right
        cand = out[vkey + (ed + turn) % 4]
        nxt = np.where(nxt < 0, cand, nxt)
    assert (nxt >= 0).all()
    # interior (filled) cell left of each directed edge, padded coords:
    # derived from the four extraction cases above
    _IC_DR = np.array([0, 0, -1, -1])        # row offset by dir
    _IC_DC = np.array([0, -1, -1, 0])        # col offset by dir
    # walk each cycle once, emitting corners (dir changes)
    visited = np.zeros(E, bool)
    rings, cells = [], []
    for e0 in range(E):
        if visited[e0]:
            continue
        xs, ys = [], []
        e = e0
        while not visited[e]:
            visited[e] = True
            ne = nxt[e]
            if ed[ne] != ed[e]:              # corner: emit the shared vertex
                xs.append(ex[ne])
                ys.append(ey[ne])
            e = ne
        rings.append((np.array(xs, np.int64) - 1,   # un-pad
                      np.array(ys, np.int64) - 1))
        d0 = int(ed[e0])
        cells.append((int(ey[e0]) + int(_IC_DR[d0]) - 1,
                      int(ex[e0]) + int(_IC_DC[d0]) - 1))
    return (rings, cells) if with_cells else rings


def merge_overlapping_polygons(ids: np.ndarray, px: np.ndarray,
                               py: np.ndarray, ring_offsets: np.ndarray,
                               poly_of_ring: np.ndarray,
                               min_dist: float = 0.0,
                               min_area: float = 0.0,
                               min_hole_area: float | None = None,
                               grid_max: int = 512) -> dict:
    """Cluster polygons that overlap within ``min_dist`` and merge each
    cluster via the grid boolean (see module section comment).

    Inputs use the engine's flattened layout: ``px, py`` vertex streams
    (tile px), ``ring_offsets`` (n_rings+1), ``poly_of_ring`` (polygon
    ordinal per ring, rings of one polygon consecutive), ``ids`` one
    feature id per polygon.  Clusters whose union area < ``min_area``
    are dropped; holes smaller than ``min_hole_area`` are filled
    (``FeatureMerge.java:291-340`` drop semantics).

    Returns per-RING output arrays: ``cluster`` (output cluster ordinal
    per ring), ``is_hole``, ``offsets`` + flattened ``xs``/``ys`` (px
    coords), plus per-cluster ``merged_id``, ``n_features``,
    ``union_area``.
    """
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n_poly = len(ids)
    empty = {"cluster": np.empty(0, np.int64), "is_hole": np.empty(0, bool),
             "offsets": np.zeros(1, np.int64), "xs": np.empty(0),
             "ys": np.empty(0), "merged_id": np.empty(0, np.int64),
             "n_features": np.empty(0, np.int64), "union_area": np.empty(0)}
    if n_poly == 0:
        return empty
    # per-polygon bbox over its rings
    rb_x0 = np.minimum.reduceat(px, ring_offsets[:-1])
    rb_x1 = np.maximum.reduceat(px, ring_offsets[:-1])
    rb_y0 = np.minimum.reduceat(py, ring_offsets[:-1])
    rb_y1 = np.maximum.reduceat(py, ring_offsets[:-1])
    pb_x0 = np.full(n_poly, np.inf)
    pb_x1 = np.full(n_poly, -np.inf)
    pb_y0 = np.full(n_poly, np.inf)
    pb_y1 = np.full(n_poly, -np.inf)
    np.minimum.at(pb_x0, poly_of_ring, rb_x0)
    np.maximum.at(pb_x1, poly_of_ring, rb_x1)
    np.minimum.at(pb_y0, poly_of_ring, rb_y0)
    np.maximum.at(pb_y1, poly_of_ring, rb_y1)

    # candidate pairs by expanded bbox sweep → union-find clusters
    half = min_dist / 2.0
    order = np.argsort(pb_x0 - half, kind="stable")
    sx0 = (pb_x0 - half)[order]
    sx1 = (pb_x1 + half)[order]
    sy0 = (pb_y0 - half)[order]
    sy1 = (pb_y1 + half)[order]
    hi = np.searchsorted(sx0, sx1, side="right")
    lo = np.arange(n_poly) + 1
    pi, pj = _expand_ranges(lo, hi - 1)
    ym = (sy0[pi] <= sy1[pj]) & (sy1[pi] >= sy0[pj])
    pi, pj = pi[ym], pj[ym]
    roots = _connected_components(n_poly, order[pi], order[pj])
    _, comp = np.unique(roots, return_inverse=True)
    n_comp = int(comp.max()) + 1

    # group polygons AND rings by component via one sort each — the
    # per-component flatnonzero/isin masks were O(n_comp · n) (quadratic
    # for a 10⁴-polygon tile); this is O((P+R) log) total
    porder = np.argsort(comp, kind="stable")
    pstarts = np.flatnonzero(
        np.concatenate([[True], np.diff(comp[porder]) != 0]))
    pends = np.append(pstarts[1:], n_poly)
    ring_comp = comp[poly_of_ring]
    rorder = np.argsort(ring_comp, kind="stable")
    rstarts = np.flatnonzero(
        np.concatenate([[True], np.diff(ring_comp[rorder]) != 0]))
    rends = np.append(rstarts[1:], len(poly_of_ring))

    out_rings_x, out_rings_y, out_cluster, out_hole = [], [], [], []
    merged_id, n_features, union_area = [], [], []
    out_c = 0
    for ci in range(n_comp):
        polys = porder[pstarts[ci]:pends[ci]]
        rsel = rorder[rstarts[ci]:rends[ci]]
        k_px = half
        gx0 = float(np.floor(pb_x0[polys].min() - k_px)) - 1.0
        gy0 = float(np.floor(pb_y0[polys].min() - k_px)) - 1.0
        gx1 = float(np.ceil(pb_x1[polys].max() + k_px)) + 1.0
        gy1 = float(np.ceil(pb_y1[polys].max() + k_px)) + 1.0
        res = max(1.0, max(gx1 - gx0, gy1 - gy0) / grid_max)
        W = int(np.ceil((gx1 - gx0) / res))
        H = int(np.ceil((gy1 - gy0) / res))
        # local flattened rings of this cluster
        counts = ring_offsets[rsel + 1] - ring_offsets[rsel]
        loff = np.zeros(len(rsel) + 1, np.int64)
        np.cumsum(counts, out=loff[1:])
        vidx = np.concatenate(
            [np.arange(ring_offsets[r], ring_offsets[r + 1]) for r in rsel]) \
            if len(rsel) else np.empty(0, np.int64)
        lx = (px[vidx] - gx0) / res
        ly = (py[vidx] - gy0) / res
        lpoly = np.unique(poly_of_ring[rsel], return_inverse=True)[1]
        grid = _fill_polys_grid(lx, ly, loff, lpoly, W, H)
        k = int(round(half / res))
        if k > 0:
            grid = _morph_square(grid, k, dilate=True)
            grid = _morph_square(grid, k, dilate=False)
        rings, rcells = _trace_grid_rings(grid, with_cells=True)
        if not rings:
            continue
        areas = np.array([0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
                          for x, y in rings]) * res * res
        outer = areas > 0
        # per-OUTER min_area drop + small-hole fill; a hole survives
        # only with its containing outer (FeatureMerge.java:291-340)
        min_h = min_area if min_hole_area is None else min_hole_area
        keep = np.where(outer, areas >= min_area, np.abs(areas) >= min_h)
        # hole → owning shell: both rings bound the same 4-connected
        # filled region, keyed exactly by the region label of each
        # ring's interior cell (no point-in-polygon float test)
        hole_owner = np.full(len(rings), -1, np.int64)
        if (~outer & keep).any():
            region = _grid_region_labels(grid)
            ring_reg = np.array([region[r_, c_] for r_, c_ in rcells])
            shell_of = {}                    # region label → kept shell ring
            for oi in np.flatnonzero(outer & keep):
                shell_of[int(ring_reg[oi])] = oi
            for hi_ in np.flatnonzero(~outer & keep):
                oi = shell_of.get(int(ring_reg[hi_]), -1)
                if oi < 0:
                    keep[hi_] = False        # shell dropped → hole dropped
                else:
                    hole_owner[hi_] = oi
        if not (outer & keep).any():
            continue
        ua = float(areas[outer & keep].sum() + areas[~outer & keep].sum())
        # MVT 2.1 §4.3.4.4 emit order: each exterior ring immediately
        # followed by ITS holes (discovery order corrupted multi-shell
        # clusters in winding-based decoders — round-3 ADVICE)
        emit = []
        for oi in np.flatnonzero(outer & keep):
            emit.append(int(oi))
            emit.extend(int(h) for h in np.flatnonzero(~outer & keep)
                        if hole_owner[h] == oi)
        for ri in emit:
            x, y = rings[ri]
            out_rings_x.append(x * res + gx0)
            out_rings_y.append(y * res + gy0)
            out_cluster.append(out_c)
            out_hole.append(not outer[ri])
        merged_id.append((int(ids[polys].min()) // 10) * 10)
        n_features.append(len(polys))
        union_area.append(ua)
        out_c += 1
    if not out_rings_x:
        return empty
    counts = np.array([len(x) for x in out_rings_x], np.int64)
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return {"cluster": np.array(out_cluster, np.int64),
            "is_hole": np.array(out_hole, bool),
            "offsets": offsets,
            "xs": np.concatenate(out_rings_x),
            "ys": np.concatenate(out_rings_y),
            "merged_id": np.array(merged_id, np.int64),
            "n_features": np.array(n_features, np.int64),
            "union_area": np.array(union_area)}
