"""Tests for geometry derivations and tileset statistics."""

import numpy as np
import pytest

from planetiler_ray.tilemath.geomfn import (
    box_centroid,
    line_midpoint,
    partial_line,
    point_along_line,
)


class TestLineDerivations:
    LINE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])

    def test_point_along_line(self):
        assert point_along_line(self.LINE, 0.0).tolist() == [0, 0]
        assert point_along_line(self.LINE, 1.0).tolist() == [10, 10]
        assert point_along_line(self.LINE, 0.25).tolist() == [5, 0]
        assert point_along_line(self.LINE, 0.75).tolist() == [10, 5]

    def test_midpoint_on_vertex(self):
        assert line_midpoint(self.LINE).tolist() == [10, 0]

    def test_partial_line(self):
        # LineSplitter.get semantics: sub-line between fractions
        out = partial_line(self.LINE, 0.25, 0.75)
        assert out[0].tolist() == [5, 0] and out[-1].tolist() == [10, 5]
        assert [10, 0] in out.tolist()
        full = partial_line(self.LINE, 0.0, 1.0)
        assert np.allclose(full, self.LINE)

    def test_partial_line_validation(self):
        with pytest.raises(ValueError):
            partial_line(self.LINE, 0.5, 0.5)
        with pytest.raises(ValueError):
            partial_line(self.LINE, -0.1, 0.5)

    def test_degenerate(self):
        pt = np.array([[3.0, 4.0], [3.0, 4.0]])
        assert point_along_line(pt, 0.5).tolist() == [3, 4]

    def test_box_centroid(self):
        cx, cy = box_centroid(np.array([0.0]), np.array([0.0]),
                              np.array([4.0]), np.array([2.0]))
        assert (float(cx), float(cy)) == (2.0, 1.0)


class TestTileSizeStats:
    def test_stats(self, ray_session):
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.sinks import tile_size_stats, write_json
        from planetiler_ray.stages.render import RenderConfig
        n = 150
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        tiles = build_pyramid(ds, fixtures.image_ids(n), RenderConfig(0, 4),
                              num_partitions=4).materialize()
        stats = tile_size_stats(tiles, top_n=5)
        assert sum(v["n"] for v in stats["per_zoom"].values()) == tiles.count()
        assert len(stats["biggest_tiles"]) == 5
        sizes = [s for _, _, s in stats["biggest_tiles"]]
        assert sizes == sorted(sizes, reverse=True)
        # the biggest tile's size equals the global max
        assert sizes[0] == max(v["max_bytes"] for v in stats["per_zoom"].values())

    def test_write_json(self, ray_session, tmp_path):
        import json
        import os
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.sinks import write_json
        from planetiler_ray.stages.render import RenderConfig
        n = 60
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        tiles = build_pyramid(ds, fixtures.image_ids(n), RenderConfig(2, 2),
                              num_partitions=2)
        write_json(tiles, str(tmp_path / "json"))
        rows = []
        for f in os.listdir(tmp_path / "json"):
            with open(tmp_path / "json" / f) as fh:
                rows += [json.loads(l) for l in fh if l.strip()]
        assert len(rows) > 0
        assert {"x", "y", "z", "encoded"} <= set(rows[0])


class TestPolygonDerivations:
    def test_centroid_square(self):
        from planetiler_ray.tilemath.geomfn import polygon_centroid
        sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
        assert np.allclose(polygon_centroid(sq), [2, 2])

    def test_point_on_surface_concave(self):
        """U-shape whose centroid falls outside the polygon."""
        from planetiler_ray.tilemath.geomfn import (_point_in_ring,
                                                    point_on_surface,
                                                    polygon_centroid)
        u = np.array([[0, 0], [6, 0], [6, 6], [4, 6], [4, 2],
                      [2, 2], [2, 6], [0, 6]], float)
        c = polygon_centroid(u)
        assert not _point_in_ring(c[0], c[1], u)       # the tricky case
        p = point_on_surface(u)
        assert _point_in_ring(p[0], p[1], u)

    def test_innermost_point_square(self):
        from planetiler_ray.tilemath.geomfn import innermost_point
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        p = innermost_point(sq, precision=0.001)
        assert np.allclose(p, [5, 5], atol=0.1)

    def test_innermost_point_rectangle(self):
        """For a 10x2 rectangle the pole lies on the long midline,
        distance 1 from the boundary."""
        from planetiler_ray.tilemath.geomfn import (_dist_to_edges,
                                                    innermost_point)
        rect = np.array([[0, 0], [10, 0], [10, 2], [0, 2]], float)
        p = innermost_point(rect, precision=0.001)
        assert abs(p[1] - 1.0) < 0.05
        d = _dist_to_edges(p[:1], p[1:2], rect)[0]
        assert abs(d - 1.0) < 0.05
