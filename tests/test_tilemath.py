"""Conformance tests for the pure tile-math kernels.

Vectors mirror the reference's unit tests:
``geo/TileCoordTest.java``, ``util/HilbertTest.java``,
``geo/GeoUtilsTest.java``, ``collection/FeatureGroupTest.java``.
"""

import math

import numpy as np
import pytest

from planetiler_ray.tilemath import (
    TileExtents,
    decode_key,
    encode_key,
    get_world_lat,
    get_world_lon,
    get_world_x,
    get_world_y,
    hilbert_decode_tile,
    hilbert_encode_tile,
    tile_of_point,
    tms_decode,
    tms_encode,
    zoom_start_index,
)
from planetiler_ray.tilemath.hilbert import hilbert_position_to_xy, hilbert_xy_to_index
from planetiler_ray.tilemath.hashing import fnv1a_64, fnv1a_64_strings
from planetiler_ray.tilemath.sortkey import SORT_KEY_MAX, SORT_KEY_MIN


class TestProjection:
    def test_world_x(self):
        assert get_world_x(-180.0) == 0.0
        assert get_world_x(180.0) == 1.0
        assert get_world_x(0.0) == 0.5

    def test_world_y_equator_and_edges(self):
        assert get_world_y(0.0) == 0.5
        # web-mercator edge: ±85.05112878 → 0/1
        assert abs(float(get_world_y(85.05112877980659)) - 0.0) < 1e-12
        assert abs(float(get_world_y(-85.05112877980659)) - 1.0) < 1e-12

    def test_clamps(self):
        # GeoUtils.java:190-195 — out-of-range latitudes clamp to -0.1 / 1.1
        assert float(get_world_y(90.0)) == -0.1
        assert float(get_world_y(-90.0)) == 1.1

    def test_round_trip(self):
        rng = np.random.default_rng(42)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-85, 85, 1000)
        assert np.allclose(get_world_lon(get_world_x(lon)), lon, atol=1e-9)
        assert np.allclose(get_world_lat(get_world_y(lat)), lat, atol=1e-9)


class TestTmsEncoding:
    def test_zoom_start(self):
        # prefix sums of 4^z (TileCoord.java:30-44)
        assert zoom_start_index(0) == 0
        assert zoom_start_index(1) == 1
        assert zoom_start_index(2) == 5
        assert zoom_start_index(3) == 21
        assert zoom_start_index(14) == (4**14 - 1) // 3

    def test_tms_layout(self):
        # tmsXYToPosition = x*dim + (dim-1-y) (TileCoord.java:169-172)
        assert int(tms_encode(0, 0, 0)) == 0
        assert int(tms_encode(0, 1, 1)) == 1 + 0 * 2 + (2 - 1 - 1)
        assert int(tms_encode(1, 0, 1)) == 1 + 1 * 2 + (2 - 1 - 0)

    def test_round_trip_all_z3(self):
        xs, ys = np.meshgrid(np.arange(8), np.arange(8))
        enc = tms_encode(xs.ravel(), ys.ravel(), 3)
        assert len(np.unique(enc)) == 64
        x2, y2, z2 = tms_decode(enc)
        assert (x2 == xs.ravel()).all() and (y2 == ys.ravel()).all() and (z2 == 3).all()

    def test_round_trip_z14_random(self):
        rng = np.random.default_rng(42)
        x = rng.integers(0, 1 << 14, 1000)
        y = rng.integers(0, 1 << 14, 1000)
        x2, y2, z2 = tms_decode(tms_encode(x, y, 14))
        assert (x2 == x).all() and (y2 == y).all() and (z2 == 14).all()


HILBERT_VECTORS = [
    # (level, x, y, encoded) — util/HilbertTest.java testEncoding
    (0, 0, 0, 0),
    (1, 0, 0, 0), (1, 0, 1, 1), (1, 1, 1, 2), (1, 1, 0, 3),
    (2, 1, 1, 2),
    (15, 0, 0, 0), (15, 0, 1, 1), (15, 1, 1, 2), (15, 1, 0, 3),
    (15, 32767, 0, 1073741823), (15, 32767, 32767, 715827882),
    (16, 0, 0, 0), (16, 1, 0, 1), (16, 1, 1, 2), (16, 0, 1, 3),
    (16, 65535, 0, 4294967295), (16, 65535, 65535, 2863311530),
]


class TestHilbert:
    @pytest.mark.parametrize("level,x,y,encoded", HILBERT_VECTORS)
    def test_vectors(self, level, x, y, encoded):
        assert int(hilbert_xy_to_index(level, x, y)) == encoded
        dx, dy = hilbert_position_to_xy(level, encoded)
        assert int(dx) == x and int(dy) == y

    @pytest.mark.parametrize("level", [1, 2, 3, 5, 10, 15, 16])
    def test_round_trip(self, level):
        n = 1 << (2 * level)
        pos = np.unique(np.linspace(0, n - 1, 500).astype(np.int64))
        x, y = hilbert_position_to_xy(level, pos)
        assert (hilbert_xy_to_index(level, x, y) == pos).all()

    def test_tilecoord_hilbert_vectors(self):
        # geo/TileCoordTest.java testTileCoordHilbert
        vectors = [
            (1, 0, 2, 6), (1, 1, 2, 7), (0, 1, 2, 8), (0, 2, 2, 9),
            (0, 3, 2, 10), (1, 3, 2, 11), (1, 2, 2, 12), (2, 2, 2, 13),
            (2, 3, 2, 14), (3, 3, 2, 15), (3, 2, 2, 16), (3, 1, 2, 17),
            (2, 1, 2, 18), (2, 0, 2, 19), (3, 0, 2, 20),
        ]
        for x, y, z, enc in vectors:
            assert int(hilbert_encode_tile(np.array([x]), np.array([y]), z)[0]) == enc
            dx, dy, dz = hilbert_decode_tile(np.array([enc]))
            assert (int(dx), int(dy), int(dz)) == (x, y, z)

    def test_adjacency(self):
        # consecutive hilbert indexes are adjacent tiles (locality property)
        pos = np.arange((1 << 12) - 1)
        x, y = hilbert_position_to_xy(6, pos)
        x2, y2 = hilbert_position_to_xy(6, pos + 1)
        assert (np.abs(x - x2) + np.abs(y - y2) == 1).all()


class TestTileOfPoint:
    def test_basic(self):
        tx, ty = tile_of_point(np.array([0.0, 0.5, 0.999999]), np.array([0.0, 0.5, 0.999999]), 1)
        assert tx.tolist() == [0, 1, 1]
        assert ty.tolist() == [0, 1, 1]

    def test_boundary_floor(self):
        # exactly on a boundary goes to the higher tile (floor semantics)
        tx, _ = tile_of_point(np.array([0.25]), np.array([0.0]), 2)
        assert int(tx) == 1


class TestSortKey:
    def test_round_trip(self):
        rng = np.random.default_rng(42)
        tile = rng.integers(0, 1 << 33, 1000)
        layer = rng.integers(0, 256, 1000)
        sk = rng.integers(SORT_KEY_MIN, SORT_KEY_MAX + 1, 1000)
        hg = rng.integers(0, 2, 1000).astype(bool)
        t2, l2, s2, h2 = decode_key(encode_key(tile, layer, sk, hg))
        assert (t2 == tile).all() and (l2 == layer).all()
        assert (s2 == sk).all() and (h2 == hg).all()

    def test_ordering(self):
        # keys sort by (tile, layer, sortKey) — FeatureGroup.java:170-180
        k1 = encode_key(np.array([5]), np.array([0]), np.array([SORT_KEY_MAX]), np.array([False]))
        k2 = encode_key(np.array([6]), np.array([0]), np.array([SORT_KEY_MIN]), np.array([False]))
        assert int(k1) < int(k2)
        k3 = encode_key(np.array([5]), np.array([1]), np.array([SORT_KEY_MIN]), np.array([False]))
        assert int(k1) < int(k3)


class TestExtents:
    def test_world(self):
        ext = TileExtents.world(14)
        fz = ext.for_zoom(14)
        assert fz.min_x == 0 and fz.max_x == 1 << 14
        assert bool(fz.test(0, 0)) and bool(fz.test((1 << 14) - 1, 5))
        assert not bool(fz.test(1 << 14, 0))

    def test_partial(self):
        ext = TileExtents.compute_from_world_bounds(2, (0.26, 0.0, 0.74, 0.5))
        fz = ext.for_zoom(2)
        # quantizeDown(0.26·4)=1, quantizeUp(0.74·4)=3, y: [0, 2)
        assert (fz.min_x, fz.max_x, fz.min_y, fz.max_y) == (1, 3, 0, 2)


class TestHashing:
    def test_fnv_scalar_known(self):
        # standard FNV-1a test vectors
        assert int(fnv1a_64(b"")) == 0xCBF29CE484222325
        assert int(fnv1a_64(b"a")) == 0xAF63DC4C8601EC8C

    def test_vectorized_matches_scalar(self):
        ids = np.array(["img00000000", "img00000042", "x", ""])
        vec = fnv1a_64_strings(ids)
        for s, v in zip(ids, vec):
            assert int(fnv1a_64(s.encode())) == int(v)
