"""Vectorized S2 cell index — the spherical analog of the TileCoord
pyramid (north-star "H3/S2 cell encoder").

Pure-numpy re-implementation of the public S2 geometry cell model
(s2geometry.io / google/s2geometry, quadrature sphere-cube + Hilbert
curve), sharing the engine's batch conventions: every function maps
numpy arrays → numpy arrays with no per-row Python.

Cell id layout (64 bits): ``face(3) | Hilbert position(2·level) |
sentinel 1 | zeros``.  Properties the engine relies on (and tests):

- curve locality: consecutive positions at a level are edge-adjacent,
  so range-partitioning cell ids gives spatially-compact shards — the
  same property the tile pipeline gets from ``tilemath/hilbert.py``;
- hierarchy by prefix: a parent's id range ``[id - (lsb-1), id +
  (lsb-1)]`` covers exactly its children → cheap containment joins;
- uniform-ish area via the quadratic ST transform.

The reference engine has no spherical index (planetiler is web-mercator
only; ``TileCoord.java``, ``Hilbert.java``); this module extends the
same curve machinery to the sphere for the spatial-join use-case in the
north star.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell tables (public S2 constants, s2coords.h):
# orientation is a 2-bit (swap | invert) state.
POS_TO_IJ = np.array([[0, 1, 3, 2],
                      [0, 2, 3, 1],
                      [3, 2, 0, 1],
                      [3, 1, 0, 2]], dtype=np.uint8)
IJ_TO_POS = np.array([[0, 1, 3, 2],
                      [0, 3, 1, 2],
                      [2, 3, 1, 0],
                      [2, 1, 3, 0]], dtype=np.uint8)
POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.uint8)   # swap, 0, 0, swap|invert


def lonlat_to_xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lon = np.deg2rad(np.asarray(lon_deg, np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube-face projection: face 0..5 (+x,+y,+z,-x,-y,-z) + (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # largest |component| wins; ties broken like canonical S2's
    # LargestAbsComponent (strict >): z beats y beats x on equality
    face = np.where((ax > ay) & (ax > az), 0,
                    np.where(ay > az, 1, 2)).astype(np.int64)
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    specs = [(lambda X, Y, Z: Y / X, lambda X, Y, Z: Z / X),
             (lambda X, Y, Z: -X / Y, lambda X, Y, Z: Z / Y),
             (lambda X, Y, Z: -X / Z, lambda X, Y, Z: -Y / Z),
             (lambda X, Y, Z: Z / X, lambda X, Y, Z: Y / X),
             (lambda X, Y, Z: Z / Y, lambda X, Y, Z: -X / Y),
             (lambda X, Y, Z: -Y / Z, lambda X, Y, Z: -X / Z)]
    # per-face masked division: 2 divisions per element, never 12, and
    # the face's own major component is nonzero so no errstate needed
    for f, (ue, ve) in enumerate(specs):
        m = face == f
        if m.any():
            X, Y, Z = x[m], y[m], z[m]
            u[m] = ue(X, Y, Z)
            v[m] = ve(X, Y, Z)
    return face, u, v


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.choose(face % 6, xs)
    y = np.choose(face % 6, ys)
    z = np.choose(face % 6, zs)
    return x, y, z


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    u = np.asarray(u, np.float64)
    return np.where(u >= 0,
                    0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij(s: np.ndarray, level: int) -> np.ndarray:
    n = 1 << level
    return np.clip(np.floor(np.asarray(s) * n), 0, n - 1).astype(np.int64)


def face_ij_to_cellid(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                      level: int) -> np.ndarray:
    """(face, i, j) at ``level`` → uint64 cell id via the Hilbert walk.

    Vectorized MSB-first orientation walk: ``level`` iterations, each a
    pair of table gathers over the whole batch (the lookup-table analog
    of the reference's per-level loop in ``Hilbert.java``, extended with
    S2's per-face swap/invert state).
    """
    face = np.asarray(face, np.int64)
    i = np.asarray(i, np.int64)
    j = np.asarray(j, np.int64)
    orient = (face & 1).astype(np.uint8)            # bits = face & kSwapMask
    pos = np.zeros(len(face), np.uint64)
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ POS_TO_ORIENT[p]
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (face.astype(np.uint64) << np.uint64(61)) | (pos << shift) | lsb


def s2_encode(lon_deg: np.ndarray, lat_deg: np.ndarray,
              level: int) -> np.ndarray:
    """lon/lat degrees → uint64 S2 cell id at ``level`` (0..30)."""
    x, y, z = lonlat_to_xyz(lon_deg, lat_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    return face_ij_to_cellid(face, i, j, level)


def cellid_lsb(cellid: np.ndarray) -> np.ndarray:
    c = np.asarray(cellid, np.uint64)
    return c & (~c + np.uint64(1))


def cellid_level(cellid: np.ndarray) -> np.ndarray:
    """Level from the sentinel-bit position (exact float64 log2 of a
    power of two)."""
    lsb = cellid_lsb(cellid)
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def cellid_parent(cellid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` (caller guarantees level <= cell level)."""
    c = np.asarray(cellid, np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (c & ~(new_lsb - np.uint64(1))) | new_lsb


def cellid_range(cellid: np.ndarray):
    """[range_min, range_max] of descendant level-30 ids — the prefix
    interval used for containment joins."""
    c = np.asarray(cellid, np.uint64)
    lsb = cellid_lsb(c)
    return c - (lsb - np.uint64(1)), c + (lsb - np.uint64(1))


def cellid_to_face_ij(cellid: np.ndarray):
    """Inverse Hilbert walk: cell id → (face, i, j, level)."""
    c = np.asarray(cellid, np.uint64)
    level = cellid_level(c)
    lmax = int(level.max()) if len(level) else 0
    face = (c >> np.uint64(61)).astype(np.int64)
    orient = (face & 1).astype(np.uint8)
    i = np.zeros(len(c), np.int64)
    j = np.zeros(len(c), np.int64)
    for k in range(lmax):
        active = level > k
        shift = (np.uint64(2) * (np.uint64(MAX_LEVEL) - np.uint64(k)) - np.uint64(1))
        p = ((c >> shift) & np.uint64(3)).astype(np.uint8)
        ij = POS_TO_IJ[orient, p]
        step_i = (ij >> 1).astype(np.int64)
        step_j = (ij & 1).astype(np.int64)
        i = np.where(active, (i << 1) | step_i, i)
        j = np.where(active, (j << 1) | step_j, j)
        orient = np.where(active, orient ^ POS_TO_ORIENT[p], orient)
    return face, i, j, level


def xyz_to_lonlat(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    lon = np.rad2deg(np.arctan2(y, x))
    lat = np.rad2deg(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def cellid_center_lonlat(cellid: np.ndarray):
    """Cell-center lon/lat degrees (the decode round-trip target)."""
    face, i, j, level = cellid_to_face_ij(cellid)
    n = (np.int64(1) << level).astype(np.float64)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u, v = st_to_uv(s), st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    return xyz_to_lonlat(x, y, z)


def cellid_token(cellid: np.ndarray) -> np.ndarray:
    """Canonical S2 token: 16-digit zero-padded hex, trailing zeros
    stripped (vectorized via numpy bytes ops)."""
    c = np.asarray(cellid, np.uint64)
    if len(c) == 0:
        return np.empty(0, dtype="<U16")
    sh = np.arange(60, -1, -4, dtype=np.uint64)          # 16 nibbles, MSB first
    nib = ((c[:, None] >> sh) & np.uint64(0xF)).astype(np.uint32)
    codes = np.where(nib < 10, nib + ord("0"), nib - 10 + ord("a"))
    hexes = np.ascontiguousarray(codes.astype(np.uint32)).view("<U16").reshape(-1)
    return np.char.rstrip(hexes, "0")
