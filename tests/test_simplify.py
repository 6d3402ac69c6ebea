"""Conformance tests for DP / VW simplifiers.

Vectors mirror the reference's ``geo/DouglasPeuckerSimplifierTest.java``
and ``geo/VWSimplifierTest.java`` (including the rotation sweep).
"""

import numpy as np
import pytest

from planetiler_ray.tilemath.simplify import douglas_peucker, visvalingam_whyatt

ROTATIONS = [0, 45, 90, 180, 270]


def _rot(coords, deg):
    t = np.pi * deg / 180
    m = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    return np.asarray(coords, dtype=np.float64) @ m.T


class TestDouglasPeucker:
    @pytest.mark.parametrize("deg", ROTATIONS)
    def test_two_points_kept(self, deg):
        line = _rot([[0, 0], [10, 10]], deg)
        assert np.allclose(douglas_peucker(line, 1), line)

    @pytest.mark.parametrize("deg", ROTATIONS)
    def test_remove_a_point(self, deg):
        # DouglasPeuckerSimplifierTest.testRemoveAPoint: offset 0.9 < 1
        line = _rot([[0, 0], [5, 0.9], [10, 0]], deg)
        exp = _rot([[0, 0], [10, 0]], deg)
        assert np.allclose(douglas_peucker(line, 1), exp)

    @pytest.mark.parametrize("deg", ROTATIONS)
    def test_keep_a_point(self, deg):
        # testKeepAPoint: offset 1.1 > 1
        line = _rot([[0, 0], [5, 1.1], [10, 0]], deg)
        assert np.allclose(douglas_peucker(line, 1), line)

    def test_negative_tolerance_noop(self):
        line = np.array([[0, 0], [5, 0.1], [10, 0]], dtype=float)
        assert np.allclose(douglas_peucker(line, -1), line)

    def test_endpoints_always_kept(self):
        rng = np.random.default_rng(7)
        line = np.cumsum(rng.standard_normal((50, 2)), axis=0)
        out = douglas_peucker(line, 100.0)
        assert np.allclose(out[0], line[0]) and np.allclose(out[-1], line[-1])


class TestVisvalingam:
    @pytest.mark.parametrize("deg", ROTATIONS)
    def test_two_points_kept(self, deg):
        line = _rot([[0, 0], [10, 10]], deg)
        assert np.allclose(visvalingam_whyatt(line, 1), line)

    @pytest.mark.parametrize("deg", ROTATIONS)
    def test_remove_a_point(self, deg):
        # VWSimplifierTest.testRemoveAPoint: triangle area 4.5 < 5
        line = _rot([[0, 0], [5, 0.9], [10, 0]], deg)
        exp = _rot([[0, 0], [10, 0]], deg)
        assert np.allclose(visvalingam_whyatt(line, 5), exp)

    @pytest.mark.parametrize("deg", ROTATIONS)
    def test_keep_a_point(self, deg):
        # testKeepAPoint: triangle area 5.5 > 5
        line = _rot([[0, 0], [5, 1.1], [10, 0]], deg)
        assert np.allclose(visvalingam_whyatt(line, 5), line)

    def test_smallest_area_removed_first(self):
        line = np.array([[0, 0], [2, 0.1], [4, 0], [6, 2.0], [8, 0], [10, 0]],
                        dtype=float)
        out = visvalingam_whyatt(line, 0.5)
        # the 0.1-offset vertex (area 0.2) goes; the 2.0 vertex (area 4) stays
        assert [6.0, 2.0] in out.tolist()
        assert [2.0, 0.1] not in out.tolist()
