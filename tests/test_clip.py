"""Tests for the vectorized point/box slicing kernel.

Mirrors the semantics of ``render/TiledGeometryTest.java`` for the
geometry kinds this engine produces (points, axis-aligned boxes):
buffer membership, 4-tile corners, antimeridian wrap, filled interiors.
"""

import numpy as np

from planetiler_ray.tilemath.clip import (
    DEFAULT_BUFFER_PX,
    slice_boxes,
    slice_points,
)
from planetiler_ray.tilemath.extents import TileExtents

BUF = DEFAULT_BUFFER_PX / 256  # default 4px buffer in tile fractions


def tiles_of(res):
    return sorted(zip(res["x"].tolist(), res["y"].tolist()))


class TestSlicePoints:
    def test_interior_single_tile(self):
        r = slice_points(np.array([1.5]), np.array([1.5]), 2, BUF)
        assert tiles_of(r) == [(1, 1)]
        assert r["px"].tolist() == [128.0] and r["py"].tolist() == [128.0]

    def test_boundary_two_tiles(self):
        # on a vertical boundary → both neighbors (within buffer)
        r = slice_points(np.array([2.0]), np.array([1.5]), 2, BUF)
        assert tiles_of(r) == [(1, 1), (2, 1)]
        # local coords relative to each tile: 256 in left tile, 0 in right
        px = dict(zip(r["x"].tolist(), r["px"].tolist()))
        assert px[1] == 256.0 and px[2] == 0.0

    def test_corner_four_tiles(self):
        r = slice_points(np.array([2.0]), np.array([2.0]), 2, BUF)
        assert tiles_of(r) == [(1, 1), (1, 2), (2, 1), (2, 2)]

    def test_within_buffer(self):
        # 3px from boundary < 4px buffer → included in neighbor
        r = slice_points(np.array([2.0 + 3 / 256]), np.array([1.5]), 2, BUF)
        assert tiles_of(r) == [(1, 1), (2, 1)]
        # 5px from boundary > buffer → one tile only
        r = slice_points(np.array([2.0 + 5 / 256]), np.array([1.5]), 2, BUF)
        assert tiles_of(r) == [(2, 1)]

    def test_antimeridian_wrap(self):
        # x slightly past the right edge of the world wraps to column 0
        r = slice_points(np.array([3.999]), np.array([1.5]), 2, BUF)
        assert tiles_of(r) == [(0, 1), (3, 1)]
        # local coords computed against the unwrapped column
        px = dict(zip(r["x"].tolist(), r["px"].tolist()))
        assert abs(px[0] - (-0.256)) < 1e-9  # (3.999-4)*256
        assert abs(px[3] - 255.744) < 1e-9

    def test_y_clamped_not_wrapped(self):
        # y beyond the extents is dropped, not wrapped (TiledGeometry.java:249-251)
        r = slice_points(np.array([1.5]), np.array([-0.2]), 2, BUF, TileExtents.world(2))
        assert len(r["row"]) == 0

    def test_extents_filter(self):
        ext = TileExtents.compute_from_world_bounds(2, (0.5, 0.0, 1.0, 1.0))
        r = slice_points(np.array([0.5, 2.5]), np.array([1.5, 1.5]), 2, BUF, ext)
        assert tiles_of(r) == [(2, 1)]


class TestSliceBoxes:
    def test_single_tile(self):
        r = slice_boxes(np.array([1.25]), np.array([1.25]), np.array([1.75]), np.array([1.75]),
                        2, BUF)
        assert tiles_of(r) == [(1, 1)]
        assert r["fx0"].tolist() == [64.0] and r["fx1"].tolist() == [192.0]
        assert not r["is_fill"].any()

    def test_spanning_2x2(self):
        r = slice_boxes(np.array([1.5]), np.array([1.5]), np.array([2.5]), np.array([2.5]),
                        2, BUF)
        assert tiles_of(r) == [(1, 1), (1, 2), (2, 1), (2, 2)]
        # fragment in tile (1,1) clipped to buffer window on the high side
        i = [t for t in range(4) if r["x"][t] == 1 and r["y"][t] == 1][0]
        assert r["fx0"][i] == 128.0 and r["fx1"][i] == 256.0 + DEFAULT_BUFFER_PX

    def test_filled_interior(self):
        # box covering 3 columns fully at z2: middle tile completely covered
        r = slice_boxes(np.array([0.9]), np.array([0.9]), np.array([3.1]), np.array([3.1]),
                        2, BUF)
        fills = {(x, y) for x, y, f in zip(r["x"], r["y"], r["is_fill"]) if f}
        assert (2, 2) in fills and (1, 1) in fills
        assert (0, 0) not in fills

    def test_antimeridian_box(self):
        # box crossing the right world edge at z2 appears in columns 3 and 0
        r = slice_boxes(np.array([3.9]), np.array([1.4]), np.array([4.1]), np.array([1.6]),
                        2, BUF)
        xs = set(r["x"].tolist())
        assert xs == {3, 0}

    def test_world_spanning_box_covers_each_column_once(self):
        r = slice_boxes(np.array([-0.5]), np.array([1.4]), np.array([4.5]), np.array([1.6]),
                        2, BUF)
        xs = sorted(r["x"].tolist())
        assert xs == [0, 1, 2, 3]

    def test_no_empty_fragments(self):
        # box 10px away from tile 2's edge → only tile 1
        r = slice_boxes(np.array([1.2]), np.array([1.2]),
                        np.array([2.0 - 10 / 256]), np.array([1.5]), 2, BUF)
        assert tiles_of(r) == [(1, 1)]
