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
        "merged_id": (ids[order][first] // 10) * 10,
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


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return i

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


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

    uf = _UnionFind(n)
    for a, b in zip(order[pi], order[pj]):   # loop over REAL pairs only
        uf.union(int(a), int(b))
    roots = np.array([uf.find(int(i)) for i in range(n)])
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
