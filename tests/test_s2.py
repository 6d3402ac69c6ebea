"""S2 cell index invariants: curve adjacency, hierarchy, round trips,
known face anchors."""

import numpy as np
import pytest

from planetiler_ray.tilemath import s2


def test_face_level0_anchor_ids():
    # level-0 cell of each face: id = face<<61 | 1<<60 (well-known anchors;
    # face-0 token is "1", face-2 (north-pole face) token "5", ...)
    lons = np.array([0.0, 90.0, 10.0, 180.0, -90.0, 10.0])
    lats = np.array([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    ids = s2.s2_encode(lons, lats, 0)
    want = (np.arange(6, dtype=np.uint64) << np.uint64(61)) | np.uint64(1 << 60)
    assert ids.tolist() == want.tolist()
    toks = s2.cellid_token(ids)
    assert toks.tolist() == ["1", "3", "5", "7", "9", "b"]


def test_level_and_parent():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    c12 = s2.s2_encode(lon, lat, 12)
    assert (s2.cellid_level(c12) == 12).all()
    c8 = s2.cellid_parent(c12, 8)
    assert (s2.cellid_level(c8) == 8).all()
    # direct encode at 8 equals parent-of-12
    assert (s2.s2_encode(lon, lat, 8) == c8).all()
    # parent's descendant range covers the child
    lo, hi = s2.cellid_range(c8)
    assert ((c12 >= lo) & (c12 <= hi)).all()


def test_roundtrip_face_ij():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-88, 88, 1000)
    for level in (1, 5, 14, 30):
        c = s2.s2_encode(lon, lat, level)
        face, i, j, lv = s2.cellid_to_face_ij(c)
        assert (lv == level).all()
        back = s2.face_ij_to_cellid(face, i, j, level)
        assert (back == c).all()


def test_center_roundtrip():
    # encoding a cell's center must return the same cell
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    for level in (4, 12, 20):
        c = s2.s2_encode(lon, lat, level)
        clon, clat = s2.cellid_center_lonlat(c)
        assert (s2.s2_encode(clon, clat, level) == c).all()


def test_curve_adjacency_within_face():
    # Hilbert locality: consecutive positions at a level are edge-adjacent
    level = 6
    n = 1 << level
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for face in (0, 1, 4):
        f = np.full(n * n, face)
        ids = s2.face_ij_to_cellid(f, ii.ravel(), jj.ravel(), level)
        order = np.argsort(ids)
        si, sj = ii.ravel()[order], jj.ravel()[order]
        d = np.abs(np.diff(si)) + np.abs(np.diff(sj))
        assert (d == 1).all()          # every curve step is one grid step
        # and the position space is a complete permutation
        pos = (ids >> np.uint64(2 * (30 - level) + 1)) & np.uint64(4 ** level - 1)
        assert len(np.unique(pos)) == n * n


def test_children_contiguous():
    # the 4 children of any cell occupy a contiguous curve range
    c = s2.s2_encode(np.array([12.3]), np.array([45.6]), 10)
    lo, hi = s2.cellid_range(c)
    kids = []
    for di in range(2):
        for dj in range(2):
            face, i, j, _ = s2.cellid_to_face_ij(c)
            kids.append(s2.face_ij_to_cellid(face, (i << 1) | di, (j << 1) | dj, 11)[0])
    kids = np.array(kids, np.uint64)
    assert ((kids >= lo) & (kids <= hi)).all()
    assert (s2.cellid_parent(kids, 10) == c[0]).all()


def test_st_uv_inverse():
    s = np.linspace(0, 1, 1001)
    assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)


def test_face_coverage_and_uv_range():
    rng = np.random.default_rng(6)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    x, y, z = s2.lonlat_to_xyz(lon, lat)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert set(np.unique(face)) == set(range(6))
    assert (np.abs(u) <= 1 + 1e-12).all() and (np.abs(v) <= 1 + 1e-12).all()
    # projection consistency: face_uv_to_xyz returns a scaled copy of xyz
    bx, by, bz = s2.face_uv_to_xyz(face, u, v)
    norm = np.sqrt(bx * bx + by * by + bz * bz)
    assert np.allclose(np.abs(bx / norm * x + by / norm * y + bz / norm * z), 1.0, atol=1e-9)


def test_token_roundtrip_strip():
    ids = s2.s2_encode(np.array([0.0, 100.0]), np.array([0.0, -45.0]), 16)
    toks = s2.cellid_token(ids)
    for t, i in zip(toks, ids):
        assert int(t.ljust(16, "0"), 16) == int(i)
        assert not t.endswith("0")
