"""Tests for the polyline stripe-clip kernel and the LoopLineMerger
re-expression (``render/TiledGeometry.java`` line path,
``util/LoopLineMerger.java:40-386`` semantics)."""

import numpy as np
import pytest

from planetiler_ray.stages.merge import LineMerger, merge_lines
from planetiler_ray.tilemath.clip import slice_lines

L = lambda *pts: np.array(pts, float)
BUF = 4.0 / 256


def parts_of(r):
    out = []
    for i in range(len(r["x"])):
        s, e = r["part_offsets"][i], r["part_offsets"][i + 1]
        out.append((int(r["line"][i]), int(r["x"][i]), int(r["y"][i]),
                    np.column_stack([r["vx"][s:e], r["vy"][s:e]])))
    return out


class TestSliceLines:
    def test_horizontal_across_three_tiles(self):
        r = slice_lines(np.array([0.5, 2.5]), np.array([0.5, 0.5]),
                        np.array([0, 2]), 2, BUF)
        ps = parts_of(r)
        assert [(p[1], p[2]) for p in ps] == [(0, 0), (1, 0), (2, 0)]
        # middle tile gets the full buffered crossing
        mid = ps[1][3]
        assert mid[0].tolist() == [-4.0, 128.0]
        assert mid[-1].tolist() == [260.0, 128.0]

    def test_interior_line_keeps_all_vertices(self):
        r = slice_lines(np.array([0.1, 0.2, 0.3, 0.4]),
                        np.array([0.1, 0.2, 0.1, 0.2]),
                        np.array([0, 4]), 0, BUF)
        (p,) = parts_of(r)
        assert len(p[3]) == 4
        assert np.allclose(p[3][:, 0], [25.6, 51.2, 76.8, 102.4])

    def test_reentry_creates_two_parts(self):
        r = slice_lines(np.array([0.2, 1.5, 0.2]), np.array([0.2, 0.2, 0.8]),
                        np.array([0, 3]), 1, 0.0)
        ps = parts_of(r)
        tiles = [(p[1], p[2]) for p in ps]
        assert tiles.count((0, 0)) == 2          # exits then re-enters
        assert (1, 0) in tiles

    def test_multiple_lines(self):
        # two independent lines in different tiles
        px = np.array([0.25, 0.3, 1.25, 1.3])
        py = np.array([0.25, 0.3, 0.25, 0.3])
        r = slice_lines(px, py, np.array([0, 2, 4]), 1, BUF)
        ps = parts_of(r)
        assert {(p[0], p[1]) for p in ps} == {(0, 0), (1, 1)}

    def test_antimeridian_wrap(self):
        # line crossing x=2 at z1 wraps into column 0
        r = slice_lines(np.array([1.9, 2.1]), np.array([0.5, 0.5]),
                        np.array([0, 2]), 1, 0.0)
        ps = parts_of(r)
        assert {p[1] for p in ps} == {0, 1}

    def test_out_of_world_y_dropped(self):
        r = slice_lines(np.array([0.5, 0.6]), np.array([-0.5, -0.4]),
                        np.array([0, 2]), 2, BUF)
        assert len(r["x"]) == 0

    def test_clip_interpolation_exact(self):
        # 45° diagonal entering tile (1,1) at z2: window [1-buf, 2+buf]
        r = slice_lines(np.array([0.5, 1.5]), np.array([0.5, 1.5]),
                        np.array([0, 2]), 2, 0.0)
        for (_, x, y, v) in parts_of(r):
            if (x, y) == (1, 1):
                assert np.allclose(v[0], [0.0, 0.0])
                assert np.allclose(v[-1], [128.0, 128.0])


class TestLineMerger:
    def test_endpoint_merge_direction(self):
        out = merge_lines([L((0, 0), (1, 0)), L((1, 0), (2, 0))])
        assert len(out) == 1
        assert out[0][0].tolist() == [0, 0] and out[0][-1].tolist() == [2, 0]

    def test_no_merge_at_junction(self):
        out = merge_lines([L((0, 0), (1, 0)), L((1, 0), (2, 0)),
                           L((1, 0), (1, 1))])
        assert len(out) == 3

    def test_short_ring_removed(self):
        # ring shorter than loop_min_length vanishes, tail survives
        out = merge_lines([L((0, 0), (1, 0)), L((0, 0), (0.5, 2), (1, 0)),
                           L((1, 0), (3, 0))], loop_min_length=6.0)
        assert len(out) == 1 and len(out[0]) == 2

    def test_two_arm_loop_keeps_shorter(self):
        out = merge_lines([L((-2, 0), (0, 0)), L((0, 0), (1, 0)),
                           L((0, 0), (0.5, 2), (1, 0)), L((1, 0), (3, 0))],
                          loop_min_length=6.0)
        assert len(out) == 1
        assert out[0].tolist() == [[-2, 0], [0, 0], [1, 0], [3, 0]]

    def test_long_loop_survives(self):
        out = merge_lines([L((-2, 0), (0, 0)), L((0, 0), (1, 0)),
                           L((0, 0), (0.5, 2), (1, 0)), L((1, 0), (3, 0))],
                          loop_min_length=2.0)
        assert len(out) == 4

    def test_stub_removed_then_remerged(self):
        out = merge_lines([L((0, 0), (5, 0)), L((5, 0), (10, 0)),
                           L((5, 0), (5, 0.1))], stub_min_length=1.0)
        assert len(out) == 1 and len(out[0]) == 3

    def test_stub_cascade(self):
        # removing the outer stub makes the next one a stub too
        out = merge_lines([L((0, 0), (10, 0)), L((10, 0), (10.4, 0)),
                           L((10.4, 0), (10.8, 0)), L((10.4, 0), (10.4, 5))],
                          stub_min_length=1.0)
        total = sum(len(o) for o in out)
        # both short stubs gone; long line and the (10.4,5) spur remain?
        # spur length 5 ≥ 1 → survives; chain (10,0)-(10.4,0) merged or kept
        assert all(
            LineMerger._length(o) >= 1.0 or len(o) == 0 for o in out)

    def test_simplify_pins_endpoints(self):
        out = merge_lines([L((0, 0), (1, 0.001), (2, 0)),
                           L((2, 0), (3, 0.001), (4, 0), (4, 2))],
                          tolerance=0.01)
        (m,) = out
        assert m[0].tolist() == [0, 0] and m[-1].tolist() == [4, 2]
        # interior collinear wiggles removed, corner at (4,0) kept
        assert any((p == [4, 0]).all() for p in m)

    def test_min_length_filter(self):
        assert merge_lines([L((0, 0), (0.5, 0))], min_length=1.0) == []

    def test_split_at_shared_interior_vertex(self):
        # line B ends at an interior vertex of line A → A is split there
        out = merge_lines([L((0, 0), (1, 0), (2, 0)), L((1, 0), (1, 1))])
        assert len(out) == 3

    def test_duplicate_edges_dropped_after_simplify(self):
        out = merge_lines([L((0, 0), (1, 0.001), (2, 0)),
                           L((0, 0), (1, -0.001), (2, 0))], tolerance=0.01)
        assert len(out) == 1

    def test_precision_quantization(self):
        # near-coincident endpoints snap together on the 1/16 grid
        out = merge_lines([L((0, 0), (1, 0)), L((1.01, 0), (2, 0))],
                          precision=16.0)
        assert len(out) == 1


class TestExtraPrecisionScaling:
    """FeatureRenderer.java:260-269 + VectorTile.java:113-200 semantics."""

    def test_scale_formula(self):
        from planetiler_ray.stages.merge import line_extra_precision_scale
        assert line_extra_precision_scale(14) == 0
        assert line_extra_precision_scale(6) == 8
        assert line_extra_precision_scale(0) == 14
        assert line_extra_precision_scale(0, max_zoom=15) == 15
        assert line_extra_precision_scale(0, max_zoom=20) == 17   # 31-14 cap
        assert line_extra_precision_scale(10, max_zoom=10) == 4   # max(mz,14)

    def test_unscale_rounds_half_up(self):
        from planetiler_ray.stages.merge import unscale_lines
        # 16x + 0.5 lands exactly on the half: Java Math.round goes UP;
        # negative coords too (floor(x+0.5), not round-half-even)
        c = np.array([[0.0, 0.0], [1.0 + 0.5 / 16, 0.0],
                      [2.0, -(2.0 + 0.5 / 16)]])
        out = unscale_lines([c], scale=4)
        assert len(out) == 1
        np.testing.assert_allclose(
            out[0], [[0, 0], [1 + 1 / 16, 0], [2, -2]])

    def test_unscale_collapses_and_drops(self):
        from planetiler_ray.stages.merge import unscale_lines
        fine = 1 / 256.0
        # three fine-grid-distinct vertices all rounding to (1, 1)
        # followed by a real move: collapse to 2 points
        a = np.array([[1 - fine, 1.0], [1.0, 1 + fine], [1 + fine, 1.0],
                      [2.0, 1.0]])
        # a line whose every vertex collapses to one point: dropped
        b = np.array([[3.0 - fine, 0.0], [3.0 + fine, 0.0]])
        out = unscale_lines([a, b], scale=4)
        assert len(out) == 1
        np.testing.assert_allclose(out[0], [[1, 1], [2, 1]])

    def test_fine_grid_prevents_artificial_join(self):
        from planetiler_ray.stages.merge import unscale_lines
        # two separate roads whose endpoints collide at 1/16 px but are
        # distinct at the scaled grid: base-precision merge falsely
        # joins them; the scaled pathway keeps them apart
        a = L((0, 0), (1.01, 0))
        b = L((1.02, 0), (2, 0))
        assert len(merge_lines([a, b], precision=16.0)) == 1       # false join
        s = 4
        fine_merged = merge_lines([a, b], precision=16.0 * (1 << s))
        assert len(fine_merged) == 2
        out = unscale_lines(fine_merged, s)
        assert len(out) == 2                                        # stay apart
        # both endpoints round to the same base-grid point afterwards
        assert tuple(out[0][-1]) == tuple(out[1][0])


class TestSlicePolygons:
    """Batch Sutherland–Hodgman vs a naive per-ring reference."""

    @staticmethod
    def _sh_naive(ring, w):
        def clip(poly, test, isect):
            out = []
            for i in range(len(poly)):
                cur, prev = poly[i], poly[i - 1]
                ci, pi = test(cur), test(prev)
                if ci != pi:
                    out.append(isect(prev, cur))
                if ci:
                    out.append(cur)
            return out
        x0, y0, x1, y1 = w
        p = [tuple(v) for v in ring]
        passes = [
            (lambda v: v[0] >= x0,
             lambda a, b: (x0, a[1] + (x0 - a[0]) / (b[0] - a[0]) * (b[1] - a[1]))),
            (lambda v: v[0] <= x1,
             lambda a, b: (x1, a[1] + (x1 - a[0]) / (b[0] - a[0]) * (b[1] - a[1]))),
            (lambda v: v[1] >= y0,
             lambda a, b: (a[0] + (y0 - a[1]) / (b[1] - a[1]) * (b[0] - a[0]), y0)),
            (lambda v: v[1] <= y1,
             lambda a, b: (a[0] + (y1 - a[1]) / (b[1] - a[1]) * (b[0] - a[0]), y1)),
        ]
        for test, isect in passes:
            p = clip(p, test, isect)
            if not p:
                break
        return p

    def test_random_star_polygons_match_naive(self):
        from planetiler_ray.tilemath.clip import slice_polygons
        rng = np.random.default_rng(7)
        for _ in range(30):
            n = int(rng.integers(3, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(0.1, 0.8, n)
            cx, cy = rng.uniform(1.0, 3.0, 2)
            ring = np.column_stack([cx + rad * np.cos(ang),
                                    cy + rad * np.sin(ang)])
            r = slice_polygons(ring[:, 0], ring[:, 1], np.array([0, n]), 2, BUF)
            seen = set()
            for i in range(len(r["x"])):
                s, e = r["part_offsets"][i], r["part_offsets"][i + 1]
                tx, ty = int(r["x"][i]), int(r["y"][i])
                seen.add((tx, ty))
                got = [(r["vx"][j] / 256.0 + tx, r["vy"][j] / 256.0 + ty)
                       for j in range(s, e)]
                exp = self._sh_naive(ring, (tx - BUF, ty - BUF,
                                            tx + 1 + BUF, ty + 1 + BUF))
                assert len(exp) == len(got)
                for a, b in zip(exp, got):
                    assert abs(a[0] - b[0]) < 1e-9 and abs(a[1] - b[1]) < 1e-9
            for tx in range(4):
                for ty in range(4):
                    exp = self._sh_naive(ring, (tx - BUF, ty - BUF,
                                                tx + 1 + BUF, ty + 1 + BUF))
                    if len(exp) >= 3:
                        assert (tx, ty) in seen

    def test_fill_detection(self):
        from planetiler_ray.tilemath.clip import slice_polygons
        ring = np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 3.5], [0.5, 3.5]])
        r = slice_polygons(ring[:, 0], ring[:, 1], np.array([0, 4]), 2, BUF)
        fills = {(int(r["x"][i]), int(r["y"][i])): bool(r["is_fill"][i])
                 for i in range(len(r["x"]))}
        assert fills[(1, 1)] and fills[(2, 1)]
        assert not fills[(0, 0)]

    def test_concave_ring(self):
        from planetiler_ray.tilemath.clip import slice_polygons
        # concave "C" shape across tile boundary at z1
        ring = np.array([[0.2, 0.2], [1.8, 0.2], [1.8, 0.6], [0.6, 0.6],
                         [0.6, 1.2], [1.8, 1.2], [1.8, 1.6], [0.2, 1.6]])
        r = slice_polygons(ring[:, 0], ring[:, 1], np.array([0, 8]), 1, 0.0)
        # clipped against tile (1,0): two disjoint arms — SH keeps one
        # connected (possibly degenerate-bridged) ring, never crashes,
        # and preserves total vertex sanity
        assert len(r["x"]) >= 3
        assert (np.diff(r["part_offsets"]) >= 3).all()
