"""Tests for geodesic measures and compact encodings (GeoUtilsTest analogs)."""

import numpy as np
import pytest

from planetiler_ray.tilemath.measure import (
    decode_world_x,
    decode_world_y,
    encode_flat_location,
    line_length_meters,
    meters_between,
    min_zoom_for_pixel_size,
    ring_area_meters,
)


class TestHaversine:
    def test_equator_degree(self):
        # one degree of longitude at the equator ≈ 111.19 km
        d = float(meters_between(0.0, 0.0, 1.0, 0.0))
        assert d == pytest.approx(111_195, rel=1e-3)

    def test_symmetry_and_zero(self):
        assert float(meters_between(10, 20, 10, 20)) == 0
        a = float(meters_between(10, 20, 30, 40))
        b = float(meters_between(30, 40, 10, 20))
        assert a == pytest.approx(b)

    def test_line_length(self):
        lons = np.array([0.0, 1.0, 2.0])
        lats = np.zeros(3)
        assert line_length_meters(lons, lats) == pytest.approx(
            2 * float(meters_between(0, 0, 1, 0)), rel=1e-9)


class TestRingArea:
    def test_small_square_matches_planar(self):
        # 0.01°×0.01° square at the equator ≈ (1113.195 m)²
        d = 0.01
        lons = np.array([0, d, d, 0, 0], dtype=float)
        lats = np.array([0, 0, d, d, 0], dtype=float)
        side = float(meters_between(0, 0, d, 0))
        assert ring_area_meters(lons, lats) == pytest.approx(side * side, rel=1e-3)

    def test_orientation_invariant(self):
        d = 0.5
        lons = np.array([0, d, d, 0, 0], dtype=float)
        lats = np.array([10, 10, 10 + d, 10 + d, 10], dtype=float)
        a1 = ring_area_meters(lons, lats)
        a2 = ring_area_meters(lons[::-1].copy(), lats[::-1].copy())
        assert a1 == pytest.approx(a2)
        assert a1 > 0


class TestMinZoom:
    def test_thresholds(self):
        # world_size such that at z: size*2^z*256 = 1px → minzoom = z
        assert int(min_zoom_for_pixel_size(1 / 256 / (1 << 5))) == 5
        assert int(min_zoom_for_pixel_size(1.0)) == 0
        assert int(min_zoom_for_pixel_size(1e-12)) == 15  # clamped

    def test_vectorized(self):
        sizes = np.array([1.0, 1 / 256 / 4, 1e-12])
        assert min_zoom_for_pixel_size(sizes).tolist() == [0, 2, 15]


class TestFlatLocation:
    def test_round_trip_precision(self):
        rng = np.random.default_rng(42)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-85, 85, 1000)
        enc = encode_flat_location(lon, lat)
        from planetiler_ray.tilemath import get_world_x, get_world_y
        # 31-bit quantization → world-coordinate error < 2^-30
        assert np.abs(decode_world_x(enc) - get_world_x(lon)).max() < 2**-29
        assert np.abs(decode_world_y(enc) - get_world_y(lat)).max() < 2**-29

    def test_distinct(self):
        enc = encode_flat_location(np.array([0.0, 0.001]), np.array([0.0, 0.0]))
        assert enc[0] != enc[1]
