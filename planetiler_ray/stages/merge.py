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
"""

from __future__ import annotations

import numpy as np

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
    uf = _UnionFind(n)
    order = np.argsort(ex0, kind="stable")
    active: list[int] = []
    for i in order:
        keep = []
        for j in active:
            if ex1[j] >= ex0[i]:
                keep.append(j)
                if ey0[i] <= ey1[j] and ey1[i] >= ey0[j]:
                    uf.union(int(i), int(j))
        keep.append(int(i))
        active = keep
    roots = np.array([uf.find(int(i)) for i in range(n)])
    _, comp = np.unique(roots, return_inverse=True)

    n_comp = comp.max() + 1
    out = {"merged_id": np.empty(n_comp, np.int64),
           "n_features": np.empty(n_comp, np.int64),
           "mx0": np.empty(n_comp), "my0": np.empty(n_comp),
           "mx1": np.empty(n_comp), "my1": np.empty(n_comp),
           "union_area": np.empty(n_comp)}
    for c in range(n_comp):
        m = comp == c
        out["merged_id"][c] = (ids[m].min() // 10) * 10
        out["n_features"][c] = m.sum()
        out["mx0"][c] = x0[m].min()
        out["my0"][c] = y0[m].min()
        out["mx1"][c] = x1[m].max()
        out["my1"][c] = y1[m].max()
        out["union_area"][c] = _union_area(x0[m], y0[m], x1[m], y1[m])
    keep = out["union_area"] >= min_area
    return {k: v[keep] for k, v in out.items()}


def merge_lines(lines: list[np.ndarray], min_length: float = 0.0,
                tolerance: float = -1.0) -> list[np.ndarray]:
    """Merge polylines at touching endpoints; prune stubs; simplify.

    LoopLineMerger-style semantics (``util/LoopLineMerger.java:40-386``):

    1. join lines end-to-end at endpoints where exactly two line ends
       meet (degree-2 nodes)
    2. remove dangling stubs shorter than ``min_length``
    3. Douglas-Peucker simplify at ``tolerance`` (skipped when < 0)

    Endpoints match exactly (callers quantize coordinates first, as the
    reference does with its 1/16-px grid, ``LoopLineMerger.java:77-84``).
    """
    # node registry: endpoint tuple → list of (line_idx, is_start)
    from collections import defaultdict

    segs = [np.asarray(l, dtype=np.float64) for l in lines if len(l) >= 2]
    alive = [True] * len(segs)

    def length(c: np.ndarray) -> float:
        d = np.diff(c, axis=0)
        return float(np.hypot(d[:, 0], d[:, 1]).sum())

    changed = True
    while changed:
        changed = False
        nodes: dict[tuple, list] = defaultdict(list)
        for i, s in enumerate(segs):
            if not alive[i]:
                continue
            nodes[tuple(s[0])].append((i, True))
            nodes[tuple(s[-1])].append((i, False))
        for node, ends in nodes.items():
            if len(ends) != 2:
                continue
            (i, i_start), (j, j_start) = ends
            if i == j or not (alive[i] and alive[j]):
                continue
            a = segs[i] if not i_start else segs[i][::-1]
            b = segs[j] if j_start else segs[j][::-1]
            segs[i] = np.vstack([a, b[1:]])
            alive[j] = False
            changed = True
            break  # node registry is stale → rebuild

    merged = [s for i, s in enumerate(segs) if alive[i]]
    if min_length > 0:
        merged = [s for s in merged if length(s) >= min_length]
    if tolerance >= 0:
        merged = [douglas_peucker(s, tolerance) for s in merged]
    return merged
