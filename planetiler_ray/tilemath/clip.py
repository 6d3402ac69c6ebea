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
    # a box spanning the whole world maps every column once
    np.clip(max_x, None, min_x + n_tiles - 1, out=max_x)
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
