"""Tests: snap+fix ladder, removePointsOutsideBuffer, LayeredProfile."""

import numpy as np
import pyarrow as pa
import pytest

from planetiler_ray.stages.merge import remove_points_outside_buffer
from planetiler_ray.tilemath.validity import (
    ring_signed_area, rings_self_intersect, snap_fix_rings)
from planetiler_ray.profile import LayeredProfile


# ---------------------------------------------------------------- validity

def _ring(coords):
    c = np.asarray(coords, float)
    return c[:, 0], c[:, 1]


def test_signed_area_orientation():
    # CCW unit square -> +1, CW -> -1
    x, y = _ring([(0, 0), (1, 0), (1, 1), (0, 1)])
    off = np.array([0, 4])
    assert ring_signed_area(x, y, off)[0] == pytest.approx(1.0)
    assert ring_signed_area(x[::-1].copy(), y[::-1].copy(), off)[0] == pytest.approx(-1.0)


def test_signed_area_multiple_rings():
    x1, y1 = _ring([(0, 0), (2, 0), (2, 2), (0, 2)])
    x2, y2 = _ring([(0, 0), (0, 1), (1, 1), (1, 0)])  # CW
    x = np.concatenate([x1, x2]); y = np.concatenate([y1, y2])
    off = np.array([0, 4, 8])
    a = ring_signed_area(x, y, off)
    assert a[0] == pytest.approx(4.0)
    assert a[1] == pytest.approx(-1.0)


def test_snap_collapses_duplicates_and_grid():
    # vertices 1/64 apart collapse on the 1/16 grid
    x = np.array([0.0, 0.01, 1.0, 1.0, 1.0, 0.0])
    y = np.array([0.0, 0.0, 0.0, 1.0, 1.001, 1.0])
    off = np.array([0, 6])
    r = snap_fix_rings(x, y, off, scale=16.0)
    assert r["ring_keep"][0]
    assert len(r["xs"]) == 4            # 6 -> 4 after dedupe
    assert r["signed_area"][0] == pytest.approx(1.0)
    # all snapped coords on the 1/16 grid
    assert np.allclose(r["xs"] * 16, np.round(r["xs"] * 16))


def test_snap_drops_degenerate_ring():
    # ring thinner than the grid collapses to zero area -> dropped
    x = np.array([0.0, 1.0, 1.0, 0.0])
    y = np.array([0.0, 0.0, 0.001, 0.001])
    off = np.array([0, 4])
    r = snap_fix_rings(x, y, off, scale=16.0)
    assert not r["ring_keep"][0]
    assert len(r["xs"]) == 0


def test_snap_fix_reorients_outer_and_hole():
    outer_cw = [(0, 0), (0, 4), (4, 4), (4, 0)]       # CW (wrong)
    hole_ccw = [(1, 1), (2, 1), (2, 2), (1, 2)]       # CCW (wrong)
    x = np.array([p[0] for p in outer_cw + hole_ccw], float)
    y = np.array([p[1] for p in outer_cw + hole_ccw], float)
    off = np.array([0, 4, 8])
    r = snap_fix_rings(x, y, off, is_hole=np.array([False, True]))
    assert r["signed_area"][0] == pytest.approx(16.0)   # outer now CCW
    assert r["signed_area"][1] == pytest.approx(-1.0)   # hole now CW
    # explicit closing vertex is removed
    assert np.diff(r["offsets"]).tolist() == [4, 4]


def test_snap_fix_strips_explicit_closure():
    x = np.array([0.0, 1.0, 1.0, 0.0, 0.0])
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.0])   # last == first
    r = snap_fix_rings(x, y, np.array([0, 5]))
    assert np.diff(r["offsets"]).tolist() == [4]


def test_self_intersection_probe():
    # bowtie self-intersects; square does not
    bx, by = _ring([(0, 0), (2, 2), (2, 0), (0, 2)])
    sx, sy = _ring([(0, 0), (1, 0), (1, 1), (0, 1)])
    x = np.concatenate([bx, sx]); y = np.concatenate([by, sy])
    hit = rings_self_intersect(x, y, np.array([0, 4, 8]))
    assert hit.tolist() == [True, False]


# ----------------------------------------------- removePointsOutsideBuffer

def test_remove_points_outside_buffer_basic():
    # feature 0: 2 inside / 1 outside; feature 1: all outside; feature 2: all in
    px = np.array([10.0, 300.0, 20.0,   -50.0, 400.0,   128.0, 1.0])
    py = np.array([10.0, 10.0, 20.0,    -50.0, 400.0,   128.0, 1.0])
    off = np.array([0, 3, 5, 7])
    r = remove_points_outside_buffer(px, py, off, buffer=4.0, extent=256)
    assert r["feature_keep"].tolist() == [True, False, True]
    assert r["offsets"].tolist() == [0, 2, 4]
    assert r["xs"].tolist() == [10.0, 20.0, 128.0, 1.0]


def test_remove_points_buffer_boundary_inclusive():
    px = np.array([-4.0, 260.0, -4.0001])
    py = np.array([0.0, 256.0, 0.0])
    r = remove_points_outside_buffer(px, py, np.array([0, 3]), buffer=4.0)
    assert r["xs"].tolist() == [-4.0, 260.0]
    assert r["feature_keep"].tolist() == [True]


def test_remove_points_empty_and_degenerate():
    r = remove_points_outside_buffer(np.zeros(0), np.zeros(0),
                                     np.array([0, 0, 0]), buffer=4.0)
    assert r["feature_keep"].tolist() == [False, False]
    assert len(r["xs"]) == 0


# ------------------------------------------------------------ LayeredProfile

def test_layered_profile_source_routing():
    t = pa.table({
        "source_layer": ["roads", "water", "roads", "poi"],
        "v": [1, 2, 3, 4],
    })
    p = LayeredProfile()
    p.register_source("roads", lambda tb: tb.filter(
        pa.compute.greater(tb["v"], 1)))
    out = p.process_features(t)
    vs = sorted(out["v"].to_pylist())
    assert vs == [2, 3, 4]          # roads v=1 dropped; water/poi pass

    p2 = LayeredProfile(pass_unmatched=False)
    p2.register_source("roads", lambda tb: tb)
    out2 = p2.process_features(t)
    assert sorted(out2["v"].to_pylist()) == [1, 3]


def test_layered_profile_tile_routing():
    frags = {
        "tile": np.array([5, 5, 5, 5], np.int64),
        "layer": np.array([0, 1, 0, 1], np.int8),
        "kind": np.zeros(4, np.int8),
        "sort_key": np.array([3, 1, 2, 0], np.int64),
        "idx": np.arange(4, dtype=np.int64),
    }
    p = LayeredProfile()
    # drop everything on layer 0
    p.register_layer(0, lambda d: {k: v[:0] for k, v in d.items()})
    out = p.post_process_tile(frags)
    assert (out["layer"] == 1).all()
    assert len(out["tile"]) == 2
    # rows re-sorted by (tile, layer, sort_key, idx)
    assert out["sort_key"].tolist() == [0, 1]


def test_layered_profile_finish():
    hits = []
    p = LayeredProfile().on_finish(lambda: hits.append(1))
    p.finish()
    assert hits == [1]


def test_split_self_intersecting_ring_bowtie():
    """Quantization bowtie → two simple lobes; area is conserved
    (|A1| + |A2| == shoelace parts of the figure-eight)."""
    import numpy as np
    from planetiler_ray.tilemath.validity import (repair_rings,
                                                  rings_self_intersect,
                                                  split_self_intersecting_ring)

    x = np.array([0.0, 2.0, 2.0, 0.0])
    y = np.array([0.0, 2.0, 0.0, 2.0])
    assert rings_self_intersect(x, y, np.array([0, 4]))[0]
    lobes = split_self_intersecting_ring(x, y)
    assert len(lobes) == 2
    for lx, ly in lobes:
        assert not rings_self_intersect(lx, ly,
                                        np.array([0, len(lx)]))[0]
    areas = sorted(abs(0.5 * np.sum(lx * np.roll(ly, -1)
                                    - np.roll(lx, -1) * ly))
                   for lx, ly in lobes)
    assert np.allclose(areas, [1.0, 1.0])
    # batch wrapper keeps simple rings untouched, maps sources
    xs, ys, offs, src = repair_rings(
        np.concatenate([x, [10, 11, 11, 10]]),
        np.concatenate([y, [10, 10, 11, 11]]),
        np.array([0, 4, 8]))
    assert src.tolist() == [0, 0, 1]
    assert len(offs) - 1 == 3


def test_snap_induced_bowtie_repaired(ray_session, tmp_path):
    """A multipolygon way ring that self-crosses after the 1e-7 snap is
    split into simple lobes by the stitch escalation (both lobes kept,
    shell orientation, no crossing in output)."""
    import numpy as np
    import tests._osmpbf_writer as W
    from planetiler_ray.pipelines.osm import assemble_multipolygons, way_geometries
    from planetiler_ray.sources.osmpbf import (read_osm_nodes,
                                               read_osm_relations,
                                               read_osm_ways)
    from planetiler_ray.tilemath.validity import rings_self_intersect

    # explicit bowtie ring (crosses regardless of snap): X over ~0.1°
    lon = [10.0, 10.1, 10.1, 10.0]
    lat = [10.0, 10.1, 10.0, 10.1]
    strings = ["", "type", "multipolygon", "outer"]
    s = {k: i for i, k in enumerate(strings)}
    nodes = W.dense_nodes([1, 2, 3, 4], lon, lat, [0, 0, 0, 0])
    w = W.way(100, [1, 2, 3, 4, 1])
    r = W.relation(500, [100], [1], [s["outer"]],
                   keyidx=[s["type"]], validx=[s["multipolygon"]])
    p = tmp_path / "bow.pbf"
    W.write_pbf(str(p), [W.primitive_block(strings, [nodes, w, r])])
    geoms = way_geometries(read_osm_nodes(str(p)), read_osm_ways(str(p)),
                           num_partitions=2)
    rings = assemble_multipolygons(read_osm_relations(str(p)), geoms,
                                   num_partitions=2).take_all()
    assert len(rings) == 2                     # bowtie → two lobes
    for rr in rings:
        assert not rr["is_hole"]
        rx, ry = np.asarray(rr["xs"]), np.asarray(rr["ys"])
        assert not rings_self_intersect(rx, ry,
                                        np.array([0, len(rx)]))[0]
        area = 0.5 * np.sum(rx * np.roll(ry, -1) - np.roll(rx, -1) * ry)
        assert area > 0                        # shells CCW
