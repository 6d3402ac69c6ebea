"""General-polygon overlap/nearby merge (FeatureMerge.mergeOverlapping/
NearbyPolygons beyond boxes): grid-boolean union, buffering, hole
handling, min-area drops — golden cases exact for grid-aligned input."""

import numpy as np

from planetiler_ray.stages.merge import (_trace_grid_rings,
                                         merge_overlapping_polygons)


def test_polygon_merge_goldens():

    def ring(pts):
        a = np.asarray(pts, float)
        return a[:, 0], a[:, 1]

    # 1. single cell grid → one square CCW ring
    g = np.zeros((4, 4), bool); g[1, 1] = True
    rings = _trace_grid_rings(g)
    assert len(rings) == 1
    x, y = rings[0]
    area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area == 1.0, area
    assert sorted(zip(x.tolist(), y.tolist())) == [(1,1),(1,2),(2,1),(2,2)]

    # 2. donut → outer CCW + hole CW
    g = np.zeros((6, 6), bool); g[1:4, 1:4] = True; g[2, 2] = False
    rings = _trace_grid_rings(g)
    areas = sorted(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) for x, y in rings)
    assert areas == [-1.0, 9.0], areas

    # 3. corner-touching cells → two separate rings
    g = np.zeros((4, 4), bool); g[1, 1] = True; g[2, 2] = True
    rings = _trace_grid_rings(g)
    assert len(rings) == 2
    for x, y in rings:
        a = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert a == 1.0

    # 4. two overlapping rects → one cluster, exact union area
    #    A = [0,10]x[0,10], B = [6,16]x[0,10]: union = 160
    ox = np.array([0.,10,10,0, 6,16,16,6])
    oy = np.array([0.,0,10,10, 0,0,10,10])
    offs = np.array([0,4,8])
    r = merge_overlapping_polygons(np.array([11, 27]), ox, oy, offs,
                                   np.array([0,1]))
    assert len(r["union_area"]) == 1 and r["union_area"][0] == 160.0, r["union_area"]
    assert r["n_features"][0] == 2 and r["merged_id"][0] == 10
    assert len(r["cluster"]) == 1 and not r["is_hole"][0]
    xs = r["xs"][r["offsets"][0]:r["offsets"][1]]
    ys = r["ys"][r["offsets"][0]:r["offsets"][1]]
    assert xs.min() == 0 and xs.max() == 16 and ys.min() == 0 and ys.max() == 10

    # 5. disjoint rects, min_dist bridges them: nearby-merge
    ox = np.array([0.,10,10,0, 13,23,23,13])
    oy = np.array([0.,0,10,10, 0,0,10,10])
    r0 = merge_overlapping_polygons(np.array([1, 2]), ox, oy, offs, np.array([0,1]))
    assert len(r0["union_area"]) == 2             # no min_dist: separate
    r1 = merge_overlapping_polygons(np.array([1, 2]), ox, oy, offs, np.array([0,1]),
                                    min_dist=4.0)
    assert len(r1["union_area"]) == 1, r1["union_area"]      # bridged
    assert r1["n_features"][0] == 2

    # 6. polygon with hole survives; small hole filled via min_hole_area
    ox = np.array([0.,12,12,0,  4,8,8,4])
    oy = np.array([0.,0,12,12,  4,4,8,8])
    po = np.array([0, 0])   # both rings same polygon (even-odd carves hole)
    r2 = merge_overlapping_polygons(np.array([5]), ox, oy, np.array([0,4,8]), po)
    assert len(r2["union_area"]) == 1
    assert r2["union_area"][0] == 144 - 16
    assert sorted(r2["is_hole"].tolist()) == [False, True]
    r3 = merge_overlapping_polygons(np.array([5]), ox, oy, np.array([0,4,8]), po,
                                    min_hole_area=20.0)
    assert not r3["is_hole"].any() and r3["union_area"][0] == 144.0

    # 7. min_area drops a small outer, keeps the big one
    ox = np.array([0.,10,10,0, 20,22,22,20])
    oy = np.array([0.,0,10,10, 0,0,2,2])
    r4 = merge_overlapping_polygons(np.array([1, 2]), ox, oy, offs, np.array([0,1]),
                                    min_area=50.0)
    assert len(r4["union_area"]) == 1 and r4["union_area"][0] == 100.0

    # 8. non-rectilinear: triangle unions still work (quantized)
    ox = np.array([0., 20, 0,   10, 30, 10])
    oy = np.array([0., 0, 20,   0, 0, 20])
    r5 = merge_overlapping_polygons(np.array([3, 4]), ox, oy, np.array([0,3,6]),
                                    np.array([0,1]))
    assert len(r5["union_area"]) == 1
    exact = 200 + 200 - 50.0   # overlap of the two right triangles
    assert abs(r5["union_area"][0] - exact) < 25, (r5["union_area"], exact)
    print("all polygon-merge cases pass")


def test_poly_merge_in_tile_pipeline(ray_session):
    """poly_merge wired into build_geometry_tiles: two overlapping
    squares with identical attrs become ONE merged polygon feature;
    different attrs stay separate."""
    import pyarrow as pa
    import ray.data
    from planetiler_ray.pipelines.geometry import build_geometry_tiles
    from planetiler_ray.tilemath.mvt_pb import decode_tile

    def run(names):
        # two overlapping squares in tile (0,0) at z0 (world coords)
        sq = lambda x0, y0, w: ([x0, x0 + w, x0 + w, x0],
                                [y0, y0, y0 + w, y0 + w])
        a = sq(0.1, 0.1, 0.2)
        b = sq(0.2, 0.2, 0.2)
        tbl = pa.table({
            "geom_id": pa.array([11, 27], pa.int64()),
            "kind": pa.array(["polygon", "polygon"], pa.string()),
            "xs": pa.array([a[0], b[0]], pa.list_(pa.float64())),
            "ys": pa.array([a[1], b[1]], pa.list_(pa.float64())),
            "name": pa.array(names, pa.string()),
        })
        tiles = build_geometry_tiles(
            ray.data.from_arrow(tbl), min_zoom=0, max_zoom=0,
            attr_cols=("name",),
            poly_merge={"min_dist": 0.0}).take_all()
        assert len(tiles) == 1
        return decode_tile(tiles[0]["mvt_bytes"])["polygons"]

    lay = run(["x", "x"])
    assert len(lay["features"]) == 1          # merged into one feature
    assert lay["features"][0]["id"] == 10     # (min_id//10)*10
    lay2 = run(["x", "y"])
    assert len(lay2["features"]) == 2         # attrs differ: no merge


def test_multi_shell_hole_emit_order():
    """Lake-with-island cluster (2 exteriors + 1 hole): each exterior
    ring must be immediately followed by ITS holes in the output
    (MVT 2.1 §4.3.4.4) — discovery order used to emit
    [shell, island, hole], attaching the hole to the island in
    winding-based decoders (round-3 ADVICE)."""
    # shell [0,20]^2 with hole [4,12]^2 (even-odd, same polygon);
    # island [6,10]^2 inside the hole as a separate polygon
    ox = np.array([0., 20, 20, 0,   4, 12, 12, 4,   6, 10, 10, 6])
    oy = np.array([0., 0, 20, 20,   4, 4, 12, 12,   6, 6, 10, 10])
    offs = np.array([0, 4, 8, 12])
    po = np.array([0, 0, 1])
    r = merge_overlapping_polygons(np.array([5, 7]), ox, oy, offs, po)
    hole = r["is_hole"]
    assert len(hole) == 3 and hole.sum() == 1
    areas = []
    for c in range(len(r["offsets"]) - 1):
        x = r["xs"][r["offsets"][c]:r["offsets"][c + 1]]
        y = r["ys"][r["offsets"][c]:r["offsets"][c + 1]]
        areas.append(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    hi = int(np.flatnonzero(hole)[0])
    assert hi > 0 and not hole[hi - 1]
    # the exterior right before the hole must be the big shell (~400-64
    # grid union), never the 16px island
    assert areas[hi - 1] > 100, (areas, hole.tolist())
    assert abs(abs(areas[hi]) - 64) <= 16          # hole ~ [4,12]^2
    # island is the other exterior, emitted after the shell's holes
    others = [a for i, a in enumerate(areas) if i not in (hi, hi - 1)]
    assert len(others) == 1 and others[0] < 100


def test_poly_merge_10k_single_tile_perf():
    """10^4 polygons in one call stays fast: the clustering +
    per-component grouping must be O(n log n) (vectorized union-find +
    sort-based grouping), not quadratic.  Bound is generous for host
    noise (~0.5 s typical on an idle box)."""
    import time
    n = 10_000
    # chain: square i = [i, i+2]x[0, 2] overlaps square i+1 → ONE
    # 10^4-polygon cluster (stresses union-find + ring grouping)
    i = np.arange(n, dtype=float)
    ox = np.stack([i, i + 2, i + 2, i], 1).ravel()
    oy = np.tile([0., 0, 2, 2], n)
    offs = np.arange(0, 4 * n + 1, 4)
    po = np.arange(n)
    t0 = time.perf_counter()
    r = merge_overlapping_polygons(np.arange(n) * 3, ox, oy, offs, po,
                                   grid_max=4096)
    chain = time.perf_counter() - t0
    assert len(r["union_area"]) == 1 and r["n_features"][0] == n
    # disjoint: 10^4 separate clusters (stresses per-component loop)
    ox2 = ox * 2.0    # square i = [2i, 2i+2] x [0,2]: gap-free? no: *2 → [2i, 2i+4]
    ox2 = np.stack([3 * i, 3 * i + 2, 3 * i + 2, 3 * i], 1).ravel()
    t0 = time.perf_counter()
    r2 = merge_overlapping_polygons(np.arange(n) * 3, ox2, oy, offs, po)
    disj = time.perf_counter() - t0
    assert len(r2["union_area"]) == n
    assert chain < 20.0 and disj < 20.0, (chain, disj)
