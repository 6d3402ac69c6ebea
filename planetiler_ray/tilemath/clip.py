"""Vectorized slicing of geometries into the tiles they touch.

Re-expression of the reference's stripe-clipping semantics
(``render/TiledGeometry.java``, itself adapted from mapbox/geojson-vt)
specialized to the two geometry kinds this engine's input produces:
**points** (chip centroids) and **axis-aligned boxes** (chip
footprints).  For these, the stripe clip degenerates to exact interval
arithmetic, which we vectorize over whole Arrow batches with numpy —
no per-row Python in the hot path.

Shared semantics (``TiledGeometry.java:74,86-95``):

- ``buffer`` is in tile fractions (4 px of a 256-px tile → 4/256).
- ``neighbor_buffer = buffer + 0.1/4096`` so detail running exactly
  along a tile edge lands in both neighbors.
- Candidate tile columns wrap around the antimeridian
  (``wrapInt``/``wrapX``, ``TiledGeometry.java:116-122,198-209``);
  rows are clamped to the extents.
- Local coordinates are scaled ×256 px per tile and are computed
  against the *unwrapped* column (``slicePoint``,
  ``TiledGeometry.java:245-268``).

Fill detection for boxes mirrors the interior filled-tile tracking of
``TiledGeometry.java:502-699``: a tile completely covered including its
buffer emits the canonical fill square instead of a clipped fragment
(``TiledGeometry.fill``, ``:233-243``).
"""

from __future__ import annotations

import numpy as np

NEIGHBOR_BUFFER_EPS = 0.1 / 4096
DEFAULT_BUFFER_PX = 4.0  # FeatureCollector default buffer pixels


def _clamp_wide_columns(min_x: np.ndarray, max_x: np.ndarray,
                        n_tiles: int) -> tuple[np.ndarray, np.ndarray]:
    """Cap a candidate column span wider than the world to the UNWRAPPED
    range ``[0, n_tiles-1]``.

    A buffered span can exceed ``n_tiles`` only at low zooms (z0/z1),
    where the left-edge wrap sliver (column -1) plus the geometry body
    already cover every world column; enumerating both would clip the
    same world tile twice.  Keep the BODY columns and drop the wrap
    slivers — the previous ``max_x = min_x + n_tiles - 1`` clamp kept
    the column -1 sliver and silently dropped the entire geometry body
    from the z0 tile (data loss for anything within a buffer of
    lon ±180)."""
    wide = (max_x - min_x) >= n_tiles
    if wide.any():
        min_x = np.where(wide, np.maximum(min_x, 0), min_x)
        max_x = np.where(wide, np.minimum(max_x, n_tiles - 1), max_x)
    return min_x, max_x


def _expand_ranges(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For int ranges [lo_i, hi_i] return (row_index, value) flattened.

    Vectorized variable-length range expansion (no Python loop over rows).
    """
    counts = (hi - lo + 1).clip(min=0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    row = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
    # offsets within each range: arange(total) - start_of_row + lo[row]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    val = np.arange(total, dtype=np.int64) - np.repeat(starts, counts) + lo[row]
    return row, val


def slice_points(tile_x: np.ndarray, tile_y: np.ndarray, z: int, buffer: float,
                 extents=None) -> dict[str, np.ndarray]:
    """Assign points (in tile units, 0..2^z) to every tile they touch.

    Returns dict with ``row`` (input row index), ``x``/``y`` (tile
    coords, x wrapped), ``px``/``py`` (local tile pixel coords 0..256
    relative to the emitting tile).  Matches ``TiledGeometry.slicePoint``
    (``TiledGeometry.java:245-268``).
    """
    n_tiles = 1 << z
    nb = buffer + NEIGHBOR_BUFFER_EPS
    X = np.asarray(tile_x, dtype=np.float64)
    Y = np.asarray(tile_y, dtype=np.float64)
    min_x = np.floor(X - nb).astype(np.int64)
    max_x = np.floor(X + nb).astype(np.int64)
    min_y = np.floor(Y - nb).astype(np.int64)
    max_y = np.floor(Y + nb).astype(np.int64)
    ext_min_y, ext_max_y = 0, n_tiles
    if extents is not None:
        fz = extents.for_zoom(z)
        ext_min_y, ext_max_y = fz.min_y, fz.max_y
    np.clip(min_y, ext_min_y, None, out=min_y)
    np.clip(max_y, None, ext_max_y - 1, out=max_y)

    # expand x range, then y range
    row1, xs = _expand_ranges(min_x, max_x)
    row2_rel, ys = _expand_ranges(min_y[row1], max_y[row1])
    row = row1[row2_rel]
    xs = xs[row2_rel]

    wrapped_x = np.mod(xs, n_tiles)
    keep = np.ones(len(row), dtype=bool)
    if extents is not None:
        fz = extents.for_zoom(z)
        keep = fz.test_x(wrapped_x) & fz.test_y(ys)
    row, xs, ys, wrapped_x = row[keep], xs[keep], ys[keep], wrapped_x[keep]
    return {
        "row": row,
        "x": wrapped_x,
        "y": ys,
        "px": (X[row] - xs) * 256.0,
        "py": (Y[row] - ys) * 256.0,
    }


def slice_boxes(x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray,
                z: int, buffer: float, extents=None) -> dict[str, np.ndarray]:
    """Clip axis-aligned boxes (tile units) into per-tile fragments.

    Returns dict with ``row``, ``x``/``y`` (tile coords, x wrapped),
    fragment bounds ``fx0 fy0 fx1 fy1`` in local tile px (may extend
    into the ±buffer margin), and ``is_fill`` (tile completely covered
    including buffer → fragment equals the canonical fill square,
    ``TiledGeometry.java:233-243``).

    Candidate columns/rows use ``neighbor_buffer`` like the stripe
    clipper; the fragment itself is clamped to the buffer window
    ``[-buffer·256, 256 + buffer·256]`` px.
    """
    n_tiles = 1 << z
    nb = buffer + NEIGHBOR_BUFFER_EPS
    X0 = np.asarray(x0, dtype=np.float64)
    Y0 = np.asarray(y0, dtype=np.float64)
    X1 = np.asarray(x1, dtype=np.float64)
    Y1 = np.asarray(y1, dtype=np.float64)

    min_x = np.floor(X0 - nb).astype(np.int64)
    max_x = np.floor(X1 + nb).astype(np.int64)
    # a box spanning the whole world keeps its unwrapped columns
    min_x, max_x = _clamp_wide_columns(min_x, max_x, n_tiles)
    min_y = np.floor(Y0 - nb).astype(np.int64)
    max_y = np.floor(Y1 + nb).astype(np.int64)
    ext_min_y, ext_max_y = 0, n_tiles
    if extents is not None:
        fz = extents.for_zoom(z)
        ext_min_y, ext_max_y = fz.min_y, fz.max_y
    np.clip(min_y, ext_min_y, None, out=min_y)
    np.clip(max_y, None, ext_max_y - 1, out=max_y)

    row1, xs = _expand_ranges(min_x, max_x)
    row2_rel, ys = _expand_ranges(min_y[row1], max_y[row1])
    row = row1[row2_rel]
    xs = xs[row2_rel]

    wrapped_x = np.mod(xs, n_tiles)
    keep = np.ones(len(row), dtype=bool)
    if extents is not None:
        fz = extents.for_zoom(z)
        keep = fz.test_x(wrapped_x) & fz.test_y(ys)

    # local fragment bounds in px, clamped to the buffer window
    bpx = buffer * 256.0
    lx0 = (X0[row] - xs) * 256.0
    lx1 = (X1[row] - xs) * 256.0
    ly0 = (Y0[row] - ys) * 256.0
    ly1 = (Y1[row] - ys) * 256.0
    fx0 = np.maximum(lx0, -bpx)
    fx1 = np.minimum(lx1, 256.0 + bpx)
    fy0 = np.maximum(ly0, -bpx)
    fy1 = np.minimum(ly1, 256.0 + bpx)

    # drop empty intersections (beyond the neighbor epsilon)
    eps_px = NEIGHBOR_BUFFER_EPS * 256.0
    keep &= (fx1 - fx0) > -eps_px
    keep &= (fy1 - fy0) > -eps_px

    is_fill = ((lx0 <= -bpx) & (lx1 >= 256.0 + bpx) &
               (ly0 <= -bpx) & (ly1 >= 256.0 + bpx))

    return {
        "row": row[keep],
        "x": wrapped_x[keep],
        "y": ys[keep],
        "fx0": fx0[keep],
        "fy0": fy0[keep],
        "fx1": fx1[keep],
        "fy1": fy1[keep],
        "is_fill": is_fill[keep],
    }


def _sh_clip_halfplane(vx: np.ndarray, vy: np.ndarray, offs: np.ndarray,
                       bound: np.ndarray, axis: int, keep_ge: bool
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One Sutherland–Hodgman pass over MANY rings at once.

    Clips every ring (flat ``vx, vy`` with ``offs`` of length n_rings+1)
    against its own half-plane ``coord[axis] >= bound`` (or <=), fully
    vectorized: per-edge inside/crossing classification, intersection
    interpolation, and prefix-sum output packing.
    """
    n_rings = len(offs) - 1
    total = len(vx)
    if total == 0:
        return vx, vy, offs
    counts = np.diff(offs)
    ring_of = np.repeat(np.arange(n_rings), counts)
    b = bound[ring_of]
    coord = vx if axis == 0 else vy
    inside = coord >= b if keep_ge else coord <= b
    # previous vertex (cyclic within ring)
    prev = np.arange(total) - 1
    first = offs[:-1][ring_of] == np.arange(total)
    prev[first] = (offs[1:][ring_of] - 1)[first]
    ins_prev = inside[prev]
    # per current-vertex output: crossing-in → [isect, cur]; stay-in →
    # [cur]; crossing-out → [isect]; stay-out → []
    n_out = (inside.astype(np.int64) + (inside != ins_prev))
    out_start = np.concatenate([[0], np.cumsum(n_out)[:-1]])
    total_out = int(n_out.sum())
    ox = np.empty(total_out)
    oy = np.empty(total_out)
    # intersections where the edge crosses the plane
    cross = inside != ins_prev
    ci = np.flatnonzero(cross)
    if len(ci):
        pc_, cc = prev[ci], ci
        x0_, y0_ = vx[pc_], vy[pc_]
        x1_, y1_ = vx[cc], vy[cc]
        denom = (coord[cc] - coord[pc_])
        t = (b[ci] - coord[pc_]) / np.where(denom == 0, 1.0, denom)
        ix = x0_ + t * (x1_ - x0_)
        iy = y0_ + t * (y1_ - y0_)
        if axis == 0:
            ix = b[ci]          # exact on the clip plane
        else:
            iy = b[ci]
        ox[out_start[ci]] = ix
        oy[out_start[ci]] = iy
    # current vertices that stay inside (positioned after any isect)
    ii = np.flatnonzero(inside)
    pos = out_start[ii] + cross[ii]
    ox[pos] = vx[ii]
    oy[pos] = vy[ii]
    # new per-ring offsets
    ring_counts = np.zeros(n_rings, np.int64)
    np.add.at(ring_counts, ring_of, n_out)
    new_offs = np.zeros(n_rings + 1, np.int64)
    np.cumsum(ring_counts, out=new_offs[1:])
    return ox, oy, new_offs


def slice_polygons(px: np.ndarray, py: np.ndarray, ring_offsets: np.ndarray,
                   z: int, buffer: float, extents=None) -> dict[str, np.ndarray]:
    """Clip simple polygons (single outer ring, tile units) into per-tile
    fragments — the general-polygon stripe clip
    (``render/TiledGeometry.java:406-699`` semantics for POLYGON
    geometries, re-expressed as a batch Sutherland–Hodgman against each
    candidate tile's buffered window; handles convex AND concave rings,
    vectorized over every (ring, tile) pair at once).

    Returns flat vertex arrays: ``row`` (input ring index per fragment),
    ``x, y`` (tile coords, x wrapped), ``part_offsets``, ``vx, vy``
    (clipped ring vertices, local px), ``is_fill`` (the window is fully
    interior — clipped ring is the whole buffered window).

    Scale escape: a ring whose bbox covers more than
    ``STRIPE_RING_TILES`` candidate tiles would pay
    O(bbox tiles × ring vertices) here (vertex replication per
    candidate); such rings route through the striped kernel
    (``stripeclip.slice_polygons_striped`` — O(vertices + boundary
    crossings + output), ``render/TiledGeometry.java:406-699``) with
    interior fill runs expanded to canonical fill squares, so a
    planet-spanning coastline polygon costs boundary+output work at
    every zoom, never bbox area × vertices.  (The expansion is
    O(interior tiles); a sink that consumes run-native fills can call
    ``slice_polygons_striped`` directly and skip the expansion — the
    reference ships ``CoveredTiles`` runs to the writer the same way.)
    """
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    ring_offsets = np.asarray(ring_offsets, np.int64)
    big = _stripe_escape_mask(px, py, ring_offsets, z, buffer)
    if big.any():
        return _slice_polygons_mixed(px, py, ring_offsets, z, buffer,
                                     extents, big)
    chunked = _sliced_in_chunks(slice_polygons, px, py, ring_offsets, z,
                                buffer, extents, "row")
    if chunked is not None:
        return chunked
    n_tiles = 1 << z
    nb = buffer + NEIGHBOR_BUFFER_EPS
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    ring_offsets = np.asarray(ring_offsets, np.int64)
    n_rings = len(ring_offsets) - 1
    counts = np.diff(ring_offsets)
    ring_of_v = np.repeat(np.arange(n_rings), counts)

    # candidate tiles per ring from the bbox (antimeridian wrap like boxes)
    rx0 = np.full(n_rings, np.inf)
    ry0 = np.full(n_rings, np.inf)
    rx1 = np.full(n_rings, -np.inf)
    ry1 = np.full(n_rings, -np.inf)
    np.minimum.at(rx0, ring_of_v, px)
    np.minimum.at(ry0, ring_of_v, py)
    np.maximum.at(rx1, ring_of_v, px)
    np.maximum.at(ry1, ring_of_v, py)
    min_x = np.floor(rx0 - nb).astype(np.int64)
    max_x = np.floor(rx1 + nb).astype(np.int64)
    min_x, max_x = _clamp_wide_columns(min_x, max_x, n_tiles)
    min_y = np.floor(ry0 - nb).astype(np.int64)
    max_y = np.floor(ry1 + nb).astype(np.int64)
    ext_min_y, ext_max_y = 0, n_tiles
    if extents is not None:
        fz = extents.for_zoom(z)
        ext_min_y, ext_max_y = fz.min_y, fz.max_y
    np.clip(min_y, ext_min_y, None, out=min_y)
    np.clip(max_y, None, ext_max_y - 1, out=max_y)

    row1, xs = _expand_ranges(min_x, max_x)
    row2, ys = _expand_ranges(min_y[row1], max_y[row1])
    rring = row1[row2]
    xs = xs[row2]
    n_pairs = len(rring)
    if n_pairs == 0:
        return {"row": np.empty(0, np.int64), "x": np.empty(0, np.int64),
                "y": np.empty(0, np.int64),
                "part_offsets": np.zeros(1, np.int64),
                "vx": np.empty(0), "vy": np.empty(0),
                "is_fill": np.empty(0, bool)}

    # replicate each ring's vertices once per candidate tile
    pr_counts = counts[rring]
    v_src = (np.arange(int(pr_counts.sum()))
             - np.repeat(np.concatenate([[0], np.cumsum(pr_counts)[:-1]]),
                         pr_counts)
             + np.repeat(ring_offsets[rring], pr_counts))
    vx = px[v_src]
    vy = py[v_src]
    offs = np.concatenate([[0], np.cumsum(pr_counts)])

    # 4 half-plane passes against the buffered window
    w_x0 = xs - buffer
    w_x1 = xs + 1.0 + buffer
    w_y0 = ys - buffer
    w_y1 = ys + 1.0 + buffer
    vx, vy, offs = _sh_clip_halfplane(vx, vy, offs, w_x0, 0, True)
    vx, vy, offs = _sh_clip_halfplane(vx, vy, offs, w_x1, 0, False)
    vx, vy, offs = _sh_clip_halfplane(vx, vy, offs, w_y0, 1, True)
    vx, vy, offs = _sh_clip_halfplane(vx, vy, offs, w_y1, 1, False)

    out_counts = np.diff(offs)
    keep = out_counts >= 3
    if extents is not None:
        fz = extents.for_zoom(z)
        keep &= fz.test_x(np.mod(xs, n_tiles)) & fz.test_y(ys)
    kidx = np.flatnonzero(keep)

    # local px coords + fill detection (|shoelace area| == window area)
    ring_of_out = np.repeat(np.arange(n_pairs), out_counts)
    vkeep = keep[ring_of_out]
    vx_k = (vx - xs[ring_of_out])[vkeep] * 256.0
    vy_k = (vy - ys[ring_of_out])[vkeep] * 256.0
    kept_counts = out_counts[kidx]
    part_offsets = np.concatenate([[0], np.cumsum(kept_counts)])

    # vectorized shoelace per kept ring
    n_kept_v = len(vx_k)
    if n_kept_v:
        rk = np.repeat(np.arange(len(kidx)), kept_counts)
        nxt = np.arange(n_kept_v) + 1
        last = part_offsets[1:][rk] - 1 == np.arange(n_kept_v)
        nxt[last] = part_offsets[:-1][rk][last]
        cross_sum = np.zeros(len(kidx))
        np.add.at(cross_sum, rk, vx_k * vy_k[nxt] - vx_k[nxt] * vy_k)
        area = np.abs(cross_sum) / 2.0
        win = (256.0 + 2 * buffer * 256.0) ** 2
        is_fill = np.abs(area - win) < 1e-6
        # drop zero-area phantoms on the quantized MVT grid (exact int
        # arithmetic): the SH passes for a ring that only wraps a
        # tile's CORNER collapse onto the clip-window boundary — a
        # spurious feature in a tile the polygon never touches.  The
        # striped kernel never emits these and MVT discards zero-area
        # rings, so filter them here for kernel-choice determinism.
        qx = np.floor(vx_k.astype(np.float32).astype(np.float64)
                      * 16.0 + 0.5)
        qy = np.floor(vy_k.astype(np.float32).astype(np.float64)
                      * 16.0 + 0.5)
        qcross = np.zeros(len(kidx))
        np.add.at(qcross, rk, qx * qy[nxt] - qx[nxt] * qy)
        live = qcross != 0
        if not live.all():
            kidx = kidx[live]
            is_fill = is_fill[live]
            vlive = live[rk]
            vx_k, vy_k = vx_k[vlive], vy_k[vlive]
            part_offsets = np.concatenate(
                [[0], np.cumsum(kept_counts[live])])
    else:
        is_fill = np.empty(0, bool)

    return {
        "row": rring[kidx],
        "x": np.mod(xs[kidx], n_tiles),
        "y": ys[kidx],
        "part_offsets": part_offsets,
        "vx": vx_k, "vy": vy_k,
        "is_fill": is_fill,
    }


# bbox-candidate tiles beyond which a ring takes the striped scale path
# (slice_polygons docstring): at 4096 candidates the bbox kernel's
# vertex replication starts to dominate; the striped kernel's
# boundary-proportional cost wins for everything larger.
STRIPE_RING_TILES = 4096


def _stripe_escape_mask(px, py, ring_offsets, z, buffer) -> np.ndarray:
    """Per-ring: bbox candidate-tile count exceeds STRIPE_RING_TILES."""
    n_rings = len(ring_offsets) - 1
    if n_rings == 0:
        return np.zeros(0, bool)
    nb = buffer + NEIGHBOR_BUFFER_EPS
    n_tiles = 1 << z
    o = ring_offsets[:-1]
    w = (np.floor(np.maximum.reduceat(px, o) + nb)
         - np.floor(np.minimum.reduceat(px, o) - nb) + 1)
    h = (np.floor(np.maximum.reduceat(py, o) + nb)
         - np.floor(np.minimum.reduceat(py, o) - nb) + 1)
    return np.minimum(w, n_tiles) * h > STRIPE_RING_TILES


def _slice_polygons_mixed(px, py, ring_offsets, z, buffer, extents,
                          big: np.ndarray) -> dict[str, np.ndarray]:
    """Split rings between the bbox kernel (small) and the striped
    kernel (giant), expand the striped interior fill runs into
    canonical fill-square fragments, and merge the outputs in the
    ``slice_polygons`` fragment layout."""
    from .stripeclip import expand_fill_runs, slice_polygons_striped

    counts = np.diff(ring_offsets)
    parts: list[dict[str, np.ndarray]] = []
    idx_small = np.flatnonzero(~big)
    if len(idx_small):
        m = np.repeat(~big, counts)
        offs = np.concatenate([[0], np.cumsum(counts[idx_small])])
        r = slice_polygons(px[m], py[m], offs, z, buffer, extents)
        r["row"] = idx_small[r["row"]]
        parts.append(r)
    idx_big = np.flatnonzero(big)
    m = np.repeat(big, counts)
    offs = np.concatenate([[0], np.cumsum(counts[idx_big])])
    rs = slice_polygons_striped(px[m], py[m], offs, z, buffer, extents)
    fills = expand_fill_runs(rs, buffer)
    for r in (rs, fills):
        r["row"] = idx_big[r["row"]]
        parts.append(r)
    out: dict[str, np.ndarray] = {}
    for k in ("row", "x", "y", "vx", "vy", "is_fill"):
        out[k] = np.concatenate([p[k] for p in parts])
    po = [np.asarray(p["part_offsets"], np.int64) for p in parts]
    base = np.cumsum([0] + [int(p[-1]) for p in po[:-1]])
    out["part_offsets"] = np.concatenate(
        [po[0]] + [p[1:] + b for p, b in zip(po[1:], base[1:])])
    return out


# candidate (segment, tile) pairs per internal slice chunk: the clip
# kernels materialize ~20 float64 arrays per candidate, so beyond ~10⁵
# candidates the working set falls out of cache and throughput drops
# ~8× on memory-bandwidth-bound hosts (measured).  Chunks cut at
# line/ring boundaries — outputs identical to the monolithic call.
SLICE_CHUNK_CANDIDATES = 98304


def _chunk_by_cost(offsets: np.ndarray, cost: np.ndarray,
                   budget: int) -> np.ndarray:
    """Cut points (indices into ``offsets``) so each chunk carries ≈
    ``budget`` estimated candidates, always on geometry boundaries."""
    cum = np.concatenate([[0], np.cumsum(cost)])
    total = int(cum[-1])
    approx = np.arange(budget, total, budget)
    pos = np.minimum(np.searchsorted(cum, approx, side="left"),
                     len(offsets) - 1)
    return np.unique(np.concatenate([[0], pos, [len(offsets) - 1]]))


def _slice_cost(px, py, offsets, buffer, closed: bool) -> np.ndarray:
    """Per-geometry candidate-count estimate: Σ segment-bbox tile areas
    for open lines, ring-bbox tile area for closed rings."""
    offsets = np.asarray(offsets, np.int64)
    counts = np.diff(offsets)
    if closed:
        gx0 = np.minimum.reduceat(px, offsets[:-1])
        gx1 = np.maximum.reduceat(px, offsets[:-1])
        gy0 = np.minimum.reduceat(py, offsets[:-1])
        gy1 = np.maximum.reduceat(py, offsets[:-1])
        return ((gx1 - gx0 + 1 + 2 * buffer)
                * (gy1 - gy0 + 1 + 2 * buffer)).astype(np.int64) + 1
    dx = np.abs(np.diff(px)) + 1 + 2 * buffer
    dy = np.abs(np.diff(py)) + 1 + 2 * buffer
    seg_cost = dx * dy
    # zero the pairs that straddle a geometry boundary
    seg_cost[offsets[1:-1] - 1] = 0.0
    cs = np.concatenate([[0.0], np.cumsum(seg_cost)])
    return (cs[np.minimum(offsets[1:] - 1, len(cs) - 1)]
            - cs[offsets[:-1]]).astype(np.int64) + 1


def _sliced_in_chunks(fn, px, py, offsets, z, buffer, extents,
                      geom_key: str) -> dict[str, np.ndarray] | None:
    """Run a slice kernel over candidate-budget chunks and merge the
    result dicts (``geom_key`` = per-part input-geometry index column).
    Returns None when the input fits one chunk."""
    offsets = np.asarray(offsets, np.int64)
    if len(offsets) <= 2:
        return None
    cost = _slice_cost(px, py, offsets, buffer, closed=geom_key == "row")
    if int(cost.sum()) <= SLICE_CHUNK_CANDIDATES * 3 // 2:
        return None
    cuts = _chunk_by_cost(offsets, cost, SLICE_CHUNK_CANDIDATES)
    if len(cuts) <= 2:
        return None
    outs = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        a, b = int(offsets[lo]), int(offsets[hi])
        r = fn(px[a:b], py[a:b], offsets[lo:hi + 1] - offsets[lo], z,
               buffer, extents)
        r[geom_key] = r[geom_key] + lo
        outs.append(r)
    merged: dict[str, np.ndarray] = {}
    for k in outs[0]:
        if k == "part_offsets":
            base = np.concatenate(
                [[0], np.cumsum([int(o["part_offsets"][-1])
                                 for o in outs])[:-1]])
            merged[k] = np.concatenate(
                [o["part_offsets"][:-1] + b for o, b in zip(outs, base)]
                + [[base[-1] + int(outs[-1]["part_offsets"][-1])]])
        else:
            merged[k] = np.concatenate([o[k] for o in outs])
    return merged


def slice_lines(px: np.ndarray, py: np.ndarray, line_offsets: np.ndarray,
                z: int, buffer: float, extents=None) -> dict[str, np.ndarray]:
    """Clip polylines (tile units) into per-tile sub-polyline fragments.

    The line analog of the stripe clipper
    (``render/TiledGeometry.java:406-699`` for LINE geometries): every
    segment is tested against each candidate tile's buffered window
    ``[t−buffer, t+1+buffer]``, cut with Liang-Barsky interval clipping
    (exact parametric interpolation), and consecutive surviving segments
    of the same line in the same tile are stitched back into parts.
    Fully vectorized over the whole batch of segments.

    Inputs: flat vertex arrays ``px, py`` and ``line_offsets`` (start
    index of each line, length n_lines+1).

    Returns flat VERTEX arrays describing the output parts:
      ``line``   — input line index per part
      ``x, y``   — tile coords per part (x wrapped)
      ``part_offsets`` — start of each part in the vertex stream
      ``vx, vy`` — vertex coords in local tile px (0..256 ± buffer·256)
    """
    chunked = _sliced_in_chunks(slice_lines, px, py, line_offsets, z,
                                buffer, extents, "line")
    if chunked is not None:
        return chunked
    n_tiles = 1 << z
    nb = buffer + NEIGHBOR_BUFFER_EPS
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    line_offsets = np.asarray(line_offsets, np.int64)
    n_lines = len(line_offsets) - 1

    # segments: consecutive vertex pairs within each line
    npts = np.diff(line_offsets)
    nseg = np.maximum(npts - 1, 0)
    seg_first = np.repeat(line_offsets[:-1], nseg) + \
        (np.arange(int(nseg.sum())) -
         np.repeat(np.concatenate([[0], np.cumsum(nseg)[:-1]]), nseg))
    seg_line = np.repeat(np.arange(n_lines), nseg)
    ax, ay = px[seg_first], py[seg_first]
    bx, by = px[seg_first + 1], py[seg_first + 1]

    # candidate tiles per segment: bbox expanded by the neighbor buffer
    min_x = np.floor(np.minimum(ax, bx) - nb).astype(np.int64)
    max_x = np.floor(np.maximum(ax, bx) + nb).astype(np.int64)
    min_x, max_x = _clamp_wide_columns(min_x, max_x, n_tiles)
    min_y = np.floor(np.minimum(ay, by) - nb).astype(np.int64)
    max_y = np.floor(np.maximum(ay, by) + nb).astype(np.int64)
    ext_min_y, ext_max_y = 0, n_tiles
    if extents is not None:
        fz = extents.for_zoom(z)
        ext_min_y, ext_max_y = fz.min_y, fz.max_y
    np.clip(min_y, ext_min_y, None, out=min_y)
    np.clip(max_y, None, ext_max_y - 1, out=max_y)

    srow1, xs = _expand_ranges(min_x, max_x)
    srow2, ys = _expand_ranges(min_y[srow1], max_y[srow1])
    srow = srow1[srow2]
    xs = xs[srow2]

    # Liang-Barsky against the buffered window [t−buf, t+1+buf]²
    A_x, A_y = ax[srow], ay[srow]
    D_x, D_y = bx[srow] - A_x, by[srow] - A_y
    w0x = xs - buffer
    w1x = xs + 1.0 + buffer
    w0y = ys - buffer
    w1y = ys + 1.0 + buffer
    t0 = np.zeros(len(srow))
    t1 = np.ones(len(srow))
    with np.errstate(divide="ignore", invalid="ignore"):
        for d, w0, w1, a in ((D_x, w0x, w1x, A_x), (D_y, w0y, w1y, A_y)):
            tl = np.where(d != 0, (w0 - a) / np.where(d == 0, 1.0, d), -np.inf)
            th = np.where(d != 0, (w1 - a) / np.where(d == 0, 1.0, d), np.inf)
            lo = np.minimum(tl, th)
            hi = np.maximum(tl, th)
            # zero-direction axis: inside iff a within window
            inside0 = (a >= w0) & (a <= w1)
            lo = np.where(d == 0, np.where(inside0, -np.inf, np.inf), lo)
            hi = np.where(d == 0, np.where(inside0, np.inf, -np.inf), hi)
            t0 = np.maximum(t0, lo)
            t1 = np.minimum(t1, hi)
    keep = t0 <= t1
    srow, xs, ys = srow[keep], xs[keep], ys[keep]
    t0, t1 = t0[keep], t1[keep]
    A_x, A_y, D_x, D_y = A_x[keep], A_y[keep], D_x[keep], D_y[keep]

    # clipped endpoints (local px, relative to the unwrapped column)
    cx0 = (A_x + t0 * D_x - xs) * 256.0
    cy0 = (A_y + t0 * D_y - ys) * 256.0
    cx1 = (A_x + t1 * D_x - xs) * 256.0
    cy1 = (A_y + t1 * D_y - ys) * 256.0

    # order by (line, tile, segment) → stitch consecutive segments
    seg_in_line = srow - np.repeat(np.concatenate([[0], np.cumsum(nseg)[:-1]]),
                                   nseg)[srow] if len(srow) else srow
    order = np.lexsort((seg_in_line, ys, xs, seg_line[srow]))
    srow, xs, ys = srow[order], xs[order], ys[order]
    t0, t1 = t0[order], t1[order]
    cx0, cy0, cx1, cy1 = cx0[order], cy0[order], cx1[order], cy1[order]
    sline = seg_line[srow]
    sseg = seg_in_line[order]

    n = len(srow)
    if n == 0:
        return {"line": np.empty(0, np.int64), "x": np.empty(0, np.int64),
                "y": np.empty(0, np.int64),
                "part_offsets": np.zeros(1, np.int64),
                "vx": np.empty(0, np.float64), "vy": np.empty(0, np.float64)}

    # part break: new (line, tile), non-consecutive segment, or the
    # previous segment exited the window before its end / this one
    # enters after its start
    new_group = np.empty(n, bool)
    new_group[0] = True
    new_group[1:] = ((np.diff(sline) != 0) | (np.diff(xs) != 0) |
                     (np.diff(ys) != 0))
    brk = new_group.copy()
    cont = ~new_group
    prev_t1 = np.empty(n)
    prev_t1[1:] = t1[:-1]
    prev_seg = np.empty(n, np.int64)
    prev_seg[1:] = sseg[:-1]
    brk[1:] |= (sseg[1:] != prev_seg[1:] + 1) | (prev_t1[1:] < 1.0) | (t0[1:] > 0.0)

    part_id = np.cumsum(brk) - 1
    n_parts = int(part_id[-1]) + 1
    part_start = np.flatnonzero(brk)

    # vertices per segment: 2 at a part start, 1 (the end point) after
    nverts = np.where(brk, 2, 1)
    voff = np.concatenate([[0], np.cumsum(nverts)])
    total_v = int(voff[-1])
    vx = np.empty(total_v)
    vy = np.empty(total_v)
    vx[voff[:-1][brk]] = cx0[brk]
    vy[voff[:-1][brk]] = cy0[brk]
    end_pos = voff[1:] - 1
    vx[end_pos] = cx1
    vy[end_pos] = cy1

    part_offsets = np.concatenate([voff[:-1][brk], [total_v]])
    wrapped_x = np.mod(xs[part_start], n_tiles)
    keep_p = np.ones(n_parts, bool)
    if extents is not None:
        fz = extents.for_zoom(z)
        keep_p = fz.test_x(wrapped_x) & fz.test_y(ys[part_start])
    if not keep_p.all():
        # drop filtered parts (rebuild vertex stream)
        lens = np.diff(part_offsets)
        keep_v = np.repeat(keep_p, lens)
        vx, vy = vx[keep_v], vy[keep_v]
        part_offsets = np.concatenate([[0], np.cumsum(lens[keep_p])])
        part_start = part_start[keep_p]
        wrapped_x = wrapped_x[keep_p]
    return {
        "line": sline[part_start],
        "x": wrapped_x,
        "y": ys[part_start],
        "part_offsets": part_offsets,
        "vx": vx, "vy": vy,
    }
