"""Stripe clipping of polygons with range-tracked interior fill.

Scale-safe re-expression of the reference's two-level striped clip
(``render/TiledGeometry.java:406-699``): a polygon ring is cut into
per-tile-column strips by walking its SEGMENTS once (each segment only
visits the columns its own x-span crosses), then each column strip is
cut into rows the same way.  Long vertical runs along a column's clip
boundary — which is what the interior of a big polygon becomes after
the X pass — are not emitted per row; instead their row spans are
XOR-accumulated per side and the per-column intersection of odd left
and odd right parity yields the *filled* tile rows as RANGES
(``TiledGeometry.java:540-598`` skip + ``IntRangeSet`` xor,
``CoveredTiles`` ``:748-806``).  Total work is therefore
O(vertices + boundary-tile crossings + output fragments), independent
of the bbox tile area — a planet-spanning ocean polygon at z14 costs
~boundary length, not 2^14 × 2^14 candidate tiles.

Outputs match the semantics of ``clip.slice_polygons`` for boundary
tiles (same Sutherland–Hodgman point set per tile, possibly rotated —
rings are cyclic) and add ``fill_*`` run arrays for interior tiles
instead of materializing one fragment per interior tile.  Holes
(``poly_of_ring``) subtract their own parity ranges from the outer
ring's (``TiledGeometry.sliceWorldCopy`` ``:366-373``) and a hole
fragment landing inside the outer's filled region gets the canonical
fill square prepended for its polygon (``:613-623``).

Everything below is plain numpy over flattened vertex streams — no
per-ring or per-tile Python in the candidate path; the only Python
loops are over the 2–4 emission *cases*, not data.
"""

from __future__ import annotations

import numpy as np

from .clip import NEIGHBOR_BUFFER_EPS, _clamp_wide_columns, _expand_ranges

__all__ = ["expand_fill_runs", "slice_polygons_striped"]


def expand_fill_runs(res: dict, buffer: float,
                     outer_of_poly=None) -> dict:
    """Expand interior fill RUNS into per-tile canonical fill-square
    fragments — the sink-compatible shape (the reference analogously
    expands ``CoveredTiles`` runs at archive write, every tile reusing
    ONE memoized fill encode, ``render/FeatureRenderer.java:290-315``;
    here every square is byte-identical so the archive content-hash
    dedup collapses them the same way).  O(interior tiles) output,
    O(1) per tile — no giant-ring vertex replication.

    ``row`` of each fragment = the polygon id (or its outer ring via
    ``outer_of_poly``)."""
    import numpy as np

    from .clip import _expand_ranges

    bpx = buffer * 256.0
    rr, ys = _expand_ranges(np.asarray(res["fill_y0"], np.int64),
                            np.asarray(res["fill_y1"], np.int64))
    n = len(rr)
    poly = np.asarray(res["fill_poly"], np.int64)[rr]
    vx = np.empty((n, 4))
    vx[:] = (-bpx, 256.0 + bpx, 256.0 + bpx, -bpx)
    vy = np.empty((n, 4))
    vy[:] = (-bpx, -bpx, 256.0 + bpx, 256.0 + bpx)
    return {
        "row": poly if outer_of_poly is None else
        np.asarray(outer_of_poly, np.int64)[poly],
        "x": np.asarray(res["fill_x"], np.int64)[rr],
        "y": ys,
        "part_offsets": np.arange(n + 1, dtype=np.int64) * 4,
        "vx": vx.ravel(),
        "vy": vy.ravel(),
        "is_fill": np.ones(n, bool),
    }


def _cyclic_segments(offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(a_idx, b_idx) vertex indices of every ring's cyclic segments
    (rings stored OPEN: last vertex connects back to the first)."""
    counts = np.diff(offsets)
    total = int(offsets[-1])
    a = np.arange(total, dtype=np.int64)
    b = a + 1
    last = (offsets[1:] - 1)
    b[last] = offsets[:-1]
    return a, b


def _group_starts(keys: np.ndarray) -> np.ndarray:
    """Start indices of equal-key runs in a sorted key array."""
    if len(keys) == 0:
        return np.empty(0, np.int64)
    return np.flatnonzero(np.concatenate([[True], np.diff(keys) != 0]))


def _pack_emissions(order: np.ndarray, have1: np.ndarray, have2: np.ndarray,
                    e1x, e1y, e2x, e2y) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Scatter up to two emissions per candidate pair into one stream
    following ``order`` (sorted candidate permutation).  Returns
    (xs, ys, n_per_pair_in_order)."""
    h1 = have1[order]
    h2 = have2[order]
    n_e = h1.astype(np.int64) + h2
    pos = np.concatenate([[0], np.cumsum(n_e)[:-1]])
    total = int(n_e.sum())
    xs = np.empty(total)
    ys = np.empty(total)
    i1 = np.flatnonzero(h1)
    xs[pos[i1]] = e1x[order][i1]
    ys[pos[i1]] = e1y[order][i1]
    i2 = np.flatnonzero(h2)
    p2 = pos[i2] + h1[i2]
    xs[p2] = e2x[order][i2]
    ys[p2] = e2y[order][i2]
    return xs, ys, n_e


def _slice_axis_cases(a: np.ndarray, b: np.ndarray, ay: np.ndarray,
                      by: np.ndarray, lo: float | np.ndarray,
                      hi: float | np.ndarray):
    """The stripe clip's per-(segment, slab) emission cases
    (``TiledGeometry.java:438-467``): entry intersection OR in-slab
    start vertex, then exit intersection(s).  ``a, b`` are the clipped
    axis's coords (already slab-relative for X, global for Y with
    per-candidate bounds), ``ay, by`` the other axis.  Returns
    (have1, e1a, e1o, have2, e2a, e2o) where *a is the clipped axis
    value and *o the interpolated other-axis value."""
    d = b - a
    safe = np.where(d == 0, 1.0, d)
    enter_lo = (a < lo) & (b > lo)
    enter_hi = (a > hi) & (b < hi)
    a_in = (a >= lo) & (a <= hi)
    have1 = enter_lo | enter_hi | a_in
    bound1 = np.where(enter_lo, lo, hi)
    t1 = (bound1 - a) / safe
    e1a = np.where(a_in, a, bound1)
    e1o = np.where(a_in, ay, ay + t1 * (by - ay))
    exit_lo = (b < lo) & (a >= lo)
    exit_hi = (b > hi) & (a <= hi)
    have2 = exit_lo | exit_hi
    bound2 = np.where(exit_lo, lo, hi)
    t2 = (bound2 - a) / safe
    e2a = bound2 * np.ones_like(a)
    e2o = ay + t2 * (by - ay)
    return have1, e1a, e1o, have2, e2a, e2o


def _phase_x(px: np.ndarray, py: np.ndarray, ring_offsets: np.ndarray,
             z: int, buffer: float):
    """Cut every ring into per-column strips (``sliceX``,
    ``TiledGeometry.java:406-495``).  Returns (strip_ring, strip_col,
    strip_offsets, sx, sy, n_candidates): ``sx`` is column-relative,
    ``sy`` global tile units; strips are cyclic open rings in segment
    order."""
    n_tiles = 1 << z
    nb = buffer + NEIGHBOR_BUFFER_EPS
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n_rings = len(ring_offsets) - 1
    ai, bi = _cyclic_segments(ring_offsets)
    ax, ay = px[ai], py[ai]
    bx, by = px[bi], py[bi]
    c0 = np.floor(np.minimum(ax, bx) - nb).astype(np.int64)
    c1 = np.floor(np.maximum(ax, bx) + nb).astype(np.int64)
    c0, c1 = _clamp_wide_columns(c0, c1, n_tiles)
    seg, col = _expand_ranges(c0, c1)
    n_candidates = len(seg)
    if n_candidates == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.zeros(1, np.int64), np.empty(0), np.empty(0), 0)
    a_rel = ax[seg] - col
    b_rel = bx[seg] - col
    L, R = -buffer, 1.0 + buffer
    have1, e1a, e1o, have2, e2a, e2o = _slice_axis_cases(
        a_rel, b_rel, ay[seg], by[seg], L, R)
    ring_of_seg = np.repeat(np.arange(n_rings), np.diff(ring_offsets))
    rr = ring_of_seg[seg]
    # (ring, col, seg) order: expand_ranges already emits ascending seg
    # then col within seg, so sort by (ring, col) stably
    order = np.lexsort((col, rr))
    xs, ys, n_e = _pack_emissions(order, have1, have2, e1a, e1o, e2a, e2o)
    rr_s, col_s = rr[order], col[order]
    # group (ring, col) pairs → strips; drop empty strips
    pair_key = rr_s * np.int64(4 * n_tiles + 8) + col_s  # col ≥ −2 safe
    gs = _group_starts(pair_key)
    ge = np.append(gs[1:], len(pair_key))
    cum = np.concatenate([[0], np.cumsum(n_e)])
    strip_counts = cum[ge] - cum[gs]
    nonempty = strip_counts > 0
    strip_ring = rr_s[gs][nonempty]
    strip_col = col_s[gs][nonempty]
    strip_offsets = np.concatenate(
        [[0], np.cumsum(strip_counts[nonempty])]).astype(np.int64)
    return strip_ring, strip_col, strip_offsets, xs, ys, n_candidates


def _combine_runs(gA, loA, hiA, gB, loB, hiB, mode: str):
    """Run-set algebra on integer-keyed inclusive row runs, fully
    vectorized event sweep.  ``mode='and'`` → rows in A and B;
    ``'sub'`` → rows in A not in B; ``'xor_parity'`` → rows covered by
    an ODD number of A intervals (B ignored).  Returns (g, lo, hi)."""
    if mode == "xor_parity":
        gB = np.empty(0, np.int64)
        loB = hiB = np.empty(0, np.int64)
    ev_g = np.concatenate([gA, gA, gB, gB])
    ev_p = np.concatenate([loA, hiA + 1, loB, hiB + 1])
    ev_a = np.concatenate([np.ones(len(gA), np.int64),
                           -np.ones(len(gA), np.int64),
                           np.zeros(2 * len(gB), np.int64)])
    ev_b = np.concatenate([np.zeros(2 * len(gA), np.int64),
                           np.ones(len(gB), np.int64),
                           -np.ones(len(gB), np.int64)])
    if len(ev_g) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    order = np.lexsort((ev_p, ev_g))
    ev_g, ev_p, ev_a, ev_b = (ev_g[order], ev_p[order], ev_a[order],
                              ev_b[order])
    ca = np.cumsum(ev_a)
    cb = np.cumsum(ev_b)
    gs = _group_starts(ev_g)
    base_a = np.repeat(np.where(gs > 0, ca[gs - 1], 0), np.diff(
        np.append(gs, len(ev_g))))
    base_b = np.repeat(np.where(gs > 0, cb[gs - 1], 0), np.diff(
        np.append(gs, len(ev_g))))
    ca = ca - base_a
    cb = cb - base_b
    # active state holds on [ev_p[i], next_p) within the same group
    nxt_p = np.empty(len(ev_p), np.int64)
    nxt_p[:-1] = ev_p[1:]
    nxt_p[-1] = ev_p[-1]
    same_g = np.empty(len(ev_g), bool)
    same_g[:-1] = ev_g[1:] == ev_g[:-1]
    same_g[-1] = False
    if mode == "and":
        active = (ca > 0) & (cb > 0)
    elif mode == "sub":
        active = (ca > 0) & (cb == 0)
    else:
        active = (ca % 2) == 1
    active &= same_g & (nxt_p > ev_p)
    idx = np.flatnonzero(active)
    if len(idx) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    g, lo, hi = ev_g[idx], ev_p[idx], nxt_p[idx] - 1
    # merge adjacent/contiguous runs within a group
    glue = np.zeros(len(g), bool)
    glue[1:] = (g[1:] == g[:-1]) & (lo[1:] == hi[:-1] + 1)
    starts = np.flatnonzero(~glue)
    ends = np.append(starts[1:], len(g)) - 1
    return g[starts], lo[starts], hi[ends]


def _phase_y(strip_col, strip_offsets, sx, sy, z, buffer,
             ext_min_y, ext_max_y):
    """Cut each column strip into per-row tile fragments + fill parity
    runs (``sliceY``, ``TiledGeometry.java:502-699``).  Returns
    (frag_strip, frag_row, frag_offsets, fvx, fvy  [local px],
     par_strip, par_lo, par_hi  [per-strip left∧right odd-parity runs],
     n_candidates)."""
    n_strips = len(strip_col)
    nb = buffer + NEIGHBOR_BUFFER_EPS
    L, R = -buffer, 1.0 + buffer
    strip_offsets = np.asarray(strip_offsets, np.int64)
    ai, bi = _cyclic_segments(strip_offsets)
    sax, say = sx[ai], sy[ai]
    sbx, sby = sx[bi], sy[bi]
    strip_of_seg = np.repeat(np.arange(n_strips), np.diff(strip_offsets))
    seg_lo = np.minimum(say, sby)
    seg_hi = np.maximum(say, sby)
    y0 = np.maximum(ext_min_y, np.floor(seg_lo - nb).astype(np.int64))
    y1 = np.minimum(ext_max_y - 1, np.floor(seg_hi + nb).astype(np.int64))
    boundary = (sax == sbx) & ((sax == L) | (sax == R))
    end_start = np.maximum(ext_min_y, np.floor(seg_lo + nb).astype(np.int64))
    start_end = np.minimum(ext_max_y - 1,
                           np.floor(seg_hi - nb).astype(np.int64))

    # pass A: detail candidates — non-boundary rows + boundary rows
    # near the segment endpoints (the middle span is skipped)
    nbd = ~boundary
    segsA = [np.flatnonzero(nbd)]
    rowsA = [_expand_ranges(y0[nbd], y1[nbd])]
    bidx = np.flatnonzero(boundary)
    nears = []
    if len(bidx):
        lo_hi = np.minimum(y1[bidx], end_start[bidx])
        r1, v1 = _expand_ranges(y0[bidx], lo_hi)
        hi_lo = np.maximum(y0[bidx], start_end[bidx])
        # avoid double-emitting rows already in the low near-range
        hi_lo = np.maximum(hi_lo, lo_hi + 1)
        r2, v2 = _expand_ranges(hi_lo, y1[bidx])
        nears = [(bidx[r1], v1), (bidx[r2], v2)]
    cand_seg = np.concatenate([segsA[0][rowsA[0][0]]]
                              + [s for s, _ in nears]) \
        if nears else segsA[0][rowsA[0][0]]
    cand_row = np.concatenate([rowsA[0][1]] + [v for _, v in nears]) \
        if nears else rowsA[0][1]

    # detail-row registry per strip (slices that exist, emitted or not).
    # Pack (strip, row) with a data-sized multiplier — rows are tile y
    # indices < 2^z, and a fixed 1<<34 shift would overflow int64 once
    # the strip count reaches 2^29 (same hardening as _rows_in_runs)
    SH = np.int64((1 << z) + 2)
    dkey = strip_of_seg[cand_seg] * SH + cand_row
    det_sorted = np.unique(dkey)

    # pass B: boundary segments emit into middle rows that have detail
    if len(bidx):
        m0 = end_start[bidx] + 1
        m1 = start_end[bidx] - 1
        sk = strip_of_seg[bidx] * SH
        p0 = np.searchsorted(det_sorted, sk + m0, side="left")
        p1 = np.searchsorted(det_sorted, sk + m1, side="right")
        br, bpos = _expand_ranges(p0, p1 - 1)
        if len(br):
            cand_seg = np.concatenate([cand_seg, bidx[br]])
            cand_row = np.concatenate([cand_row, det_sorted[bpos] % SH])
    n_candidates = len(cand_seg)

    # emissions, sorted by (strip, row, segment)
    T = cand_row - buffer
    B = cand_row + 1.0 + buffer
    have1, e1a, e1o, have2, e2a, e2o = _slice_axis_cases(
        say[cand_seg], sby[cand_seg], sax[cand_seg], sbx[cand_seg], T, B)
    order = np.lexsort((cand_seg, cand_row, strip_of_seg[cand_seg]))
    # emissions carry (other=x, clipped=y): pack as (y, x) then swap
    ys_, xs_, n_e = _pack_emissions(order, have1, have2, e1a, e1o, e2a, e2o)
    st_s = strip_of_seg[cand_seg][order]
    row_s = cand_row[order]
    tile_key = st_s * SH + row_s
    gs = _group_starts(tile_key)
    ge = np.append(gs[1:], len(tile_key))
    cum = np.concatenate([[0], np.cumsum(n_e)])
    fcounts = cum[ge] - cum[gs]
    keep = fcounts >= 3
    frag_strip = st_s[gs][keep]
    frag_row = row_s[gs][keep]
    # gather kept vertex spans
    vsel_r, vpos = _expand_ranges(cum[gs][keep], cum[ge][keep] - 1)
    fvx = xs_[vpos] * 256.0
    fvy = (ys_[vpos] - frag_row[vsel_r]) * 256.0
    frag_offsets = np.concatenate(
        [[0], np.cumsum(fcounts[keep])]).astype(np.int64)

    # parity: boundary middle spans, XOR per (strip, side), then AND
    par_strip = np.empty(0, np.int64)
    par_lo = par_hi = np.empty(0, np.int64)
    if len(bidx):
        m0 = end_start[bidx] + 1
        m1 = start_end[bidx] - 1
        ok = m1 >= m0
        bs = strip_of_seg[bidx[ok]]
        side_left = sax[bidx[ok]] == L
        gl, ll, hl = _combine_runs(bs[side_left], m0[ok][side_left],
                                   m1[ok][side_left],
                                   None, None, None, "xor_parity")
        gr, lr, hr = _combine_runs(bs[~side_left], m0[ok][~side_left],
                                   m1[ok][~side_left],
                                   None, None, None, "xor_parity")
        par_strip, par_lo, par_hi = _combine_runs(gl, ll, hl, gr, lr, hr,
                                                  "and")
    return (frag_strip, frag_row, frag_offsets, fvx, fvy,
            par_strip, par_lo, par_hi, n_candidates)


def _rows_in_runs(keys: np.ndarray, rows: np.ndarray, rg: np.ndarray,
                  rlo: np.ndarray, rhi: np.ndarray) -> np.ndarray:
    """Membership test of (key, row) points against keyed runs sorted
    by (key, lo)."""
    if len(rg) == 0 or len(keys) == 0:
        return np.zeros(len(keys), bool)
    # pack (key, row) with a data-sized multiplier — a fixed 1<<34 shift
    # overflows int64 once key reaches 2**29 (≈28k polygons at z14)
    SH = np.int64(max(int(rows.max(initial=0)), int(rhi.max(initial=0)),
                      int(rlo.max(initial=0))) + 2)
    pos = np.searchsorted(rg * SH + rlo, keys * SH + rows, side="right") - 1
    ok = pos >= 0
    p = np.maximum(pos, 0)
    return ok & (rg[p] == keys) & (rhi[p] >= rows)


def slice_polygons_striped(px: np.ndarray, py: np.ndarray,
                           ring_offsets: np.ndarray, z: int, buffer: float,
                           extents=None,
                           poly_of_ring: np.ndarray | None = None) -> dict:
    """Stripe-clip polygons into boundary-tile fragments + interior
    fill RUNS (the scale path for planet-sized polygons; see module
    docstring).  ``poly_of_ring`` groups rings into polygons (first
    ring of each polygon = outer shell, the rest holes, reference
    ``sliceWorldCopy`` ``:337-339``); default: every ring is its own
    polygon.

    Returns dict with the ``clip.slice_polygons`` fragment layout
    (``row`` = RING index, ``x``/``y`` wrapped tile coords,
    ``part_offsets``, ``vx``/``vy`` local px, ``is_fill``) plus
    ``fill_poly``, ``fill_x`` (wrapped), ``fill_y0``, ``fill_y1``
    interior-run arrays and ``n_candidates`` (total (segment, slab)
    pairs — ∝ boundary, never bbox area)."""
    n_tiles = 1 << z
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n_rings = len(ring_offsets) - 1
    if poly_of_ring is None:
        poly_of_ring = np.arange(n_rings, dtype=np.int64)
    else:
        poly_of_ring = np.asarray(poly_of_ring, np.int64)
    ext_min_y, ext_max_y = 0, n_tiles
    if extents is not None:
        fz = extents.for_zoom(z)
        ext_min_y, ext_max_y = fz.min_y, fz.max_y

    (strip_ring, strip_col, strip_offsets, sx, sy,
     nc_x) = _phase_x(px, py, ring_offsets, z, buffer)
    (frag_strip, frag_row, frag_offsets, fvx, fvy,
     par_strip, par_lo, par_hi, nc_y) = _phase_y(
        strip_col, strip_offsets, sx, sy, z, buffer, ext_min_y, ext_max_y)

    # first ring of each polygon is the outer shell
    first_of_poly = {}
    for r in range(n_rings):
        first_of_poly.setdefault(int(poly_of_ring[r]), r)
    outer_ring = np.array([first_of_poly[int(p)] for p in poly_of_ring],
                          np.int64)
    is_outer_ring = np.arange(n_rings) == outer_ring

    frag_ring = strip_ring[frag_strip]
    frag_col = strip_col[frag_strip]
    frag_poly = poly_of_ring[frag_ring]

    # per-(poly, col) keyed run algebra; shift col by +2 (can be −1/−2
    # past the world edge before wrapping)
    KC = np.int64(n_tiles + 8)
    pkey = lambda poly, col: poly * KC + (col + 2)
    p_ring = strip_ring[par_strip]
    p_col = strip_col[par_strip]
    p_outer = is_outer_ring[p_ring]
    outer_g = pkey(poly_of_ring[p_ring[p_outer]], p_col[p_outer])
    outer_lo, outer_hi = par_lo[p_outer], par_hi[p_outer]
    oorder = np.lexsort((outer_lo, outer_g))
    outer_g, outer_lo, outer_hi = (outer_g[oorder], outer_lo[oorder],
                                   outer_hi[oorder])
    hole_g = pkey(poly_of_ring[p_ring[~p_outer]], p_col[~p_outer])
    fill_g, fill_lo, fill_hi = _combine_runs(
        outer_g, outer_lo, outer_hi,
        hole_g, par_lo[~p_outer], par_hi[~p_outer], "sub")
    # remove tiles that got detail from any ring of the same polygon
    fill_g, fill_lo, fill_hi = _combine_runs(
        fill_g, fill_lo, fill_hi,
        pkey(frag_poly, frag_col), frag_row, frag_row, "sub")

    # inferred fill: a hole fragment inside the outer's filled region
    # where the outer contributed no detail gets the canonical fill
    # square for its polygon (TiledGeometry.java:613-623)
    hole_frag = ~is_outer_ring[frag_ring]
    inf_poly = np.empty(0, np.int64)
    inf_col = np.empty(0, np.int64)
    inf_row = np.empty(0, np.int64)
    if hole_frag.any():
        hk = pkey(frag_poly[hole_frag], frag_col[hole_frag])
        inside = _rows_in_runs(hk, frag_row[hole_frag],
                               outer_g, outer_lo, outer_hi)
        # rows are tile y indices < n_tiles, so pack with an n_tiles
        # multiplier — a fixed 1<<34 shift overflows int64 at ≈28k
        # polygons at z14
        SH = np.int64(n_tiles)
        outer_tiles = np.unique(
            pkey(frag_poly[~hole_frag], frag_col[~hole_frag]) * SH
            + frag_row[~hole_frag])
        has_outer = np.isin(hk * SH + frag_row[hole_frag], outer_tiles)
        pick = inside & ~has_outer
        # one fill square per tile even if several holes touch it
        tiles = np.unique((hk * SH + frag_row[hole_frag])[pick])
        if len(tiles):
            inf_col = (tiles // SH) % KC - 2
            inf_poly = (tiles // SH) // KC
            inf_row = tiles % SH

    # final extents / world-wrap filtering on fragments
    wrapped = np.mod(frag_col, n_tiles)
    keep = np.ones(len(frag_ring), bool)
    if extents is not None:
        fz = extents.for_zoom(z)
        keep = fz.test_x(wrapped) & fz.test_y(frag_row)
    kidx = np.flatnonzero(keep)
    counts = np.diff(frag_offsets)
    vkeep = np.repeat(keep, counts)
    out_vx = fvx[vkeep]
    out_vy = fvy[vkeep]
    part_offsets = np.concatenate([[0], np.cumsum(counts[kidx])])

    # is_fill: fragment equals the full buffered window
    n_v = len(out_vx)
    if n_v:
        kc = counts[kidx]
        rk = np.repeat(np.arange(len(kidx)), kc)
        nxt = np.arange(n_v) + 1
        last = part_offsets[1:][rk] - 1 == np.arange(n_v)
        nxt[last] = part_offsets[:-1][rk][last]
        cs = np.zeros(len(kidx))
        np.add.at(cs, rk, out_vx * out_vy[nxt] - out_vx[nxt] * out_vy)
        win = (256.0 + 2 * buffer * 256.0) ** 2
        is_fill = np.abs(np.abs(cs) / 2.0 - win) < 1e-6
    else:
        is_fill = np.empty(0, bool)

    # append inferred fill squares (attributed to the polygon's outer)
    bpx = buffer * 256.0
    if len(inf_poly):
        inf_wrapped = np.mod(inf_col, n_tiles)
        ok = np.ones(len(inf_poly), bool)
        if extents is not None:
            fz = extents.for_zoom(z)
            ok = fz.test_x(inf_wrapped) & fz.test_y(inf_row)
        inf_poly, inf_col, inf_row, inf_wrapped = (
            inf_poly[ok], inf_col[ok], inf_row[ok], inf_wrapped[ok])
    n_inf = len(inf_poly)
    sq_x = np.tile([-bpx, 256.0 + bpx, 256.0 + bpx, -bpx], n_inf)
    sq_y = np.tile([-bpx, -bpx, 256.0 + bpx, 256.0 + bpx], n_inf)
    first_ring_arr = np.array(
        [first_of_poly[int(p)] for p in inf_poly], np.int64)

    out = {
        "row": np.concatenate([frag_ring[kidx], first_ring_arr]),
        "x": np.concatenate([wrapped[kidx], np.mod(inf_col, n_tiles)]),
        "y": np.concatenate([frag_row[kidx], inf_row]),
        "part_offsets": np.concatenate(
            [part_offsets,
             part_offsets[-1] + np.arange(1, n_inf + 1) * 4]).astype(
                 np.int64),
        "vx": np.concatenate([out_vx, sq_x]),
        "vy": np.concatenate([out_vy, sq_y]),
        "is_fill": np.concatenate([is_fill, np.ones(n_inf, bool)]),
        "n_candidates": int(nc_x + nc_y),
    }

    # fill runs: wrap columns, clip rows to extents
    f_poly = fill_g // KC
    f_col = fill_g % KC - 2
    fw = np.mod(f_col, n_tiles)
    ok = np.ones(len(f_poly), bool)
    if extents is not None:
        fz = extents.for_zoom(z)
        ok = fz.test_x(fw)
        lo_c = np.clip(fill_lo, fz.min_y, None)
        hi_c = np.clip(fill_hi, None, fz.max_y - 1)
        ok &= hi_c >= lo_c
        fill_lo, fill_hi = lo_c, hi_c
    out["fill_poly"] = f_poly[ok]
    out["fill_x"] = fw[ok]
    out["fill_y0"] = fill_lo[ok]
    out["fill_y1"] = fill_hi[ok]
    return out
