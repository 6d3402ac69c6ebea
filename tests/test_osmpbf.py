"""OSM PBF reader + way/relation pipeline tests over a synthetic,
deterministic PBF (hand-encoded protobuf, zlib blobs)."""

import numpy as np
import pytest

import tests._osmpbf_writer as W
from planetiler_ray.pipelines.osm import (assemble_multipolygons,
                                          relation_way_members,
                                          way_geometries)
from planetiler_ray.sources.osmpbf import (decode_varints, read_osm_nodes,
                                           read_osm_relations, read_osm_ways,
                                           scan_blob_index, zigzag_decode)
from planetiler_ray.tilemath.projection import get_world_x, get_world_y


def test_decode_varints_vectors():
    # 1, 300 (0xAC 0x02), 0, 2^40
    buf = bytes([0x01, 0xAC, 0x02, 0x00]) + W.varint(1 << 40)
    vals = decode_varints(np.frombuffer(buf, np.uint8))
    assert vals.tolist() == [1, 300, 0, 1 << 40]


def test_zigzag_roundtrip():
    vals = np.array([0, -1, 1, -2, 2, -(1 << 40), 1 << 40], np.int64)
    enc = np.array([W.zigzag(int(v)) for v in vals], np.uint64)
    assert zigzag_decode(enc).tolist() == vals.tolist()


STRINGS = ["", "type", "multipolygon", "outer", "inner", "highway",
           "primary", "name", "Main St"]
S = {s: i for i, s in enumerate(STRINGS)}


@pytest.fixture()
def pbf_file(tmp_path):
    p = tmp_path / "test.osm.pbf"
    node_ids = [1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12]
    lons = [0.0, 4.0, 4.0, 0.0, 1.0, 2.0, 2.0, 1.0, 10.0, 11.0, 12.0]
    lats = [0.0, 0.0, 4.0, 4.0, 1.0, 1.0, 2.0, 2.0, 10.0, 11.0, 10.0]
    # node 10 tagged highway=primary
    kv = [0] * 8 + [S["highway"], S["primary"], 0] + [0, 0]
    g_nodes = W.dense_nodes(node_ids, lons, lats, kv)
    g_ways = (W.way(100, [1, 2, 3])
              + W.way(101, [3, 4, 1])
              + W.way(102, [5, 6, 7, 8, 5])
              + W.way(200, [10, 11, 12],
                      keyidx=[S["highway"], S["name"]],
                      validx=[S["primary"], S["Main St"]]))
    g_rels = W.relation(500, [100, 101, 102], [1, 1, 1],
                        [S["outer"], S["outer"], S["inner"]],
                        keyidx=[S["type"]], validx=[S["multipolygon"]])
    blocks = [
        W.primitive_block(STRINGS, [g_nodes]),
        W.primitive_block(STRINGS, [g_ways, g_rels]),
    ]
    W.write_pbf(p, blocks)
    return p


def test_scan_blob_index(pbf_file):
    idx = scan_blob_index(str(pbf_file))
    assert [b["type"] for b in idx] == ["OSMHeader", "OSMData", "OSMData"]


def test_read_nodes(pbf_file, ray_session):
    rows = sorted(read_osm_nodes(str(pbf_file)).take_all(),
                  key=lambda r: r["node_id"])
    assert [r["node_id"] for r in rows] == [1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12]
    assert rows[1]["lon"] == pytest.approx(4.0)
    assert rows[2]["lat"] == pytest.approx(4.0)
    tagged = [r for r in rows if r["tag_keys"]]
    assert len(tagged) == 1 and tagged[0]["node_id"] == 10
    assert tagged[0]["tag_keys"] == ["highway"]
    assert tagged[0]["tag_vals"] == ["primary"]


def test_read_ways(pbf_file, ray_session):
    rows = sorted(read_osm_ways(str(pbf_file)).take_all(),
                  key=lambda r: r["way_id"])
    assert [r["way_id"] for r in rows] == [100, 101, 102, 200]
    assert rows[0]["refs"] == [1, 2, 3]
    assert rows[2]["refs"] == [5, 6, 7, 8, 5]
    assert rows[3]["tag_keys"] == ["highway", "name"]
    assert rows[3]["tag_vals"] == ["primary", "Main St"]


def test_read_relations(pbf_file, ray_session):
    rows = read_osm_relations(str(pbf_file)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["rel_id"] == 500
    assert r["mem_ids"] == [100, 101, 102]
    assert r["mem_roles"] == ["outer", "outer", "inner"]
    assert r["tag_keys"] == ["type"]


def test_way_geometries_join(pbf_file, ray_session):
    nodes = read_osm_nodes(str(pbf_file))
    ways = read_osm_ways(str(pbf_file))
    rows = sorted(way_geometries(nodes, ways, num_partitions=4).take_all(),
                  key=lambda r: r["way_id"])
    assert [r["way_id"] for r in rows] == [100, 101, 102, 200]
    w200 = rows[3]
    assert w200["n_refs"] == 3
    assert w200["xs"][0] == pytest.approx(float(get_world_x(10.0)))
    assert w200["ys"][1] == pytest.approx(float(get_world_y(11.0)))
    assert w200["tag_keys"] == ["highway", "name"]
    # way 102 keeps its closing duplicate ref (5 refs)
    assert rows[2]["n_refs"] == 5


def test_relation_way_members(pbf_file, ray_session):
    rels = read_osm_relations(str(pbf_file))
    rows = sorted(relation_way_members(rels).take_all(),
                  key=lambda r: r["member_seq"])
    assert [r["way_id"] for r in rows] == [100, 101, 102]
    assert all(r["rel_id"] == 500 for r in rows)
    assert [r["role"] for r in rows] == ["outer", "outer", "inner"]


def test_assemble_multipolygons(pbf_file, ray_session):
    nodes = read_osm_nodes(str(pbf_file))
    ways = read_osm_ways(str(pbf_file))
    rels = read_osm_relations(str(pbf_file))
    geoms = way_geometries(nodes, ways, num_partitions=4)
    rings = sorted(assemble_multipolygons(rels, geoms, num_partitions=2)
                   .take_all(), key=lambda r: r["is_hole"])
    assert len(rings) == 2
    outer, hole = rings
    assert not outer["is_hole"] and hole["is_hole"]
    assert outer["rel_id"] == 500
    assert len(outer["xs"]) == 4                 # stitched from 2 open ways
    assert len(hole["xs"]) == 4                  # closed way, closure dropped
    # orientation contract: outer CCW (positive shoelace), hole CW
    def area(r):
        x, y = np.asarray(r["xs"]), np.asarray(r["ys"])
        return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area(outer) > 0
    assert area(hole) < 0
    # the hole's bbox sits inside the outer's bbox
    assert min(outer["xs"]) < min(hole["xs"]) and max(hole["xs"]) < max(outer["xs"])


def test_build_osm_tiles_profile(pbf_file, ray_session):
    """Planetiler main flow: PBF + profile rules → named MVT layers.

    way 200 (open, highway=primary) → 'roads' line; way 102 (closed
    square) → 'buildings' polygon; node 10 (highway=primary) → 'pois'
    point; untagged open ways drop."""
    import pyarrow as pa

    from planetiler_ray.functions.expression import match_field
    from planetiler_ray.pipelines.osm import OsmLayerRule, build_osm_tiles
    from planetiler_ray.tilemath.mvt_pb import decode_tile

    def always(t):
        return pa.array([True] * t.num_rows)

    rules = [
        OsmLayerRule("roads", "line", match_field("highway"),
                     attrs=("highway", "name")),
        OsmLayerRule("buildings", "area", always),
        OsmLayerRule("pois", "point", match_field("highway"),
                     attrs=("highway",)),
    ]
    tiles = build_osm_tiles(read_osm_nodes(str(pbf_file)),
                            read_osm_ways(str(pbf_file)), rules,
                            min_zoom=0, max_zoom=2, min_pixel_size=0.5,
                            num_partitions=4).to_pandas()
    z0 = tiles[tiles.z == 0]
    assert len(z0) == 1
    t = decode_tile(bytes(z0.iloc[0]["mvt_bytes"]))
    assert set(t) == {"roads", "buildings", "pois"}

    def attrs_of(layer, ft):
        kv = ft["tags"]
        return {layer["keys"][kv[i]]: layer["values"][kv[i + 1]]
                for i in range(0, len(kv), 2)}

    road = t["roads"]["features"]
    assert len(road) == 1
    attrs = attrs_of(t["roads"], road[0])
    assert attrs.get("highway") == "primary"
    assert attrs.get("name") == "Main St"
    assert len(t["buildings"]["features"]) >= 1
    poi = t["pois"]["features"]
    assert len(poi) == 1
    assert attrs_of(t["pois"], poi[0]).get("highway") == "primary"
    # higher zooms still carry the layers that survive the size gate
    assert (tiles.z.max()) == 2


def test_rule_zoom_windows(pbf_file, ray_session):
    """Per-rule min/max zoom gates features out of the fan-out — the
    per-feature ZoomFunction window through the profile path."""
    import pyarrow as pa

    from planetiler_ray.functions.expression import match_field
    from planetiler_ray.pipelines.osm import OsmLayerRule, build_osm_tiles
    from planetiler_ray.tilemath.mvt_pb import decode_tile

    rules = [
        OsmLayerRule("roads", "line", match_field("highway"),
                     tag_keys=("highway",), min_zoom=2),
        OsmLayerRule("pois", "point", match_field("highway"),
                     tag_keys=("highway",), max_zoom=1),
    ]
    tiles = build_osm_tiles(read_osm_nodes(str(pbf_file)),
                            read_osm_ways(str(pbf_file)), rules,
                            min_zoom=0, max_zoom=3, min_pixel_size=0.0,
                            num_partitions=2).to_pandas()
    by_z: dict[int, set] = {}
    for _, row in tiles.iterrows():
        layers = set(decode_tile(bytes(row["mvt_bytes"])))
        by_z.setdefault(int(row["z"]), set()).update(layers)
    assert "roads" not in by_z.get(0, set())
    assert "roads" not in by_z.get(1, set())
    assert "roads" in by_z.get(2, set()) and "roads" in by_z.get(3, set())
    assert "pois" in by_z.get(0, set()) and "pois" in by_z.get(1, set())
    assert "pois" not in by_z.get(2, set())
    assert "pois" not in by_z.get(3, set())


def test_unclosed_ring_counted(tmp_path, ray_session):
    """A multipolygon whose member ways can't close rings drops the
    leftovers AND counts them (skip-and-count via RunStats)."""
    import time

    from planetiler_ray.pipelines.osm import (assemble_multipolygons,
                                              way_geometries)
    from planetiler_ray.state.stats import RunStats

    p = tmp_path / "open.osm.pbf"
    strings = ["", "type", "multipolygon", "outer"]
    s = {v: i for i, v in enumerate(strings)}
    nodes = W.dense_nodes([1, 2, 3, 4], [0.0, 1.0, 2.0, 3.0],
                          [0.0, 1.0, 2.0, 3.0], [0] * 4)
    ways = W.way(100, [1, 2]) + W.way(101, [3, 4])   # disjoint: no ring
    rels = W.relation(500, [100, 101], [1, 1], [s["outer"], s["outer"]],
                      keyidx=[s["type"]], validx=[s["multipolygon"]])
    W.write_pbf(p, [W.primitive_block(strings, [nodes, ways, rels])])

    stats = RunStats.create("unclosed")
    geoms = way_geometries(read_osm_nodes(str(p)), read_osm_ways(str(p)),
                           num_partitions=2)
    rings = assemble_multipolygons(read_osm_relations(str(p)), geoms,
                                   num_partitions=2, stats=stats).to_pandas()
    assert len(rings) == 0
    for _ in range(50):
        totals = stats.totals()
        if totals["counters"].get("data_errors.unclosed_ring", 0) >= 2:
            break
        time.sleep(0.1)
    assert totals["counters"]["data_errors.unclosed_ring"] == 2


def test_relation_rule_renders_multipolygon(pbf_file, ray_session):
    """A 'relation' profile rule renders multipolygon rings as a named
    polygon layer (outer + hole rows share the relation id)."""
    import pyarrow as pa

    from planetiler_ray.pipelines.osm import OsmLayerRule, build_osm_tiles
    from planetiler_ray.tilemath.mvt_pb import decode_tile

    def always(t):
        return pa.array([True] * t.num_rows)

    rules = [OsmLayerRule("water", "relation", always)]
    tiles = build_osm_tiles(read_osm_nodes(str(pbf_file)),
                            read_osm_ways(str(pbf_file)), rules,
                            min_zoom=0, max_zoom=1, min_pixel_size=0.5,
                            num_partitions=2,
                            relations=read_osm_relations(str(pbf_file))
                            ).to_pandas()
    z0 = tiles[tiles.z == 0]
    assert len(z0) == 1
    t = decode_tile(bytes(z0.iloc[0]["mvt_bytes"]))
    assert set(t) == {"water"}
    feats = t["water"]["features"]
    assert len(feats) == 1                       # ONE feature, two rings
    g = feats[0]["geometry"]
    n_moveto = sum(1 for v in g if v == 9)       # MoveTo command per ring
    assert n_moveto == 2
    assert sum(1 for v in g if v == 15) == 2     # two ClosePath


def test_nest_rings_containment():
    """Real-containment nesting (OsmMultipolygon.java:178-237): a
    disjoint ring whose bbox nests inside a C-shape's bbox is a SHELL,
    and 3-level concentric nesting alternates shell/hole/shell."""
    from planetiler_ray.pipelines.osm import _nest_rings

    def ring(pts):
        a = np.asarray(pts, float)
        return a[:, 0], a[:, 1]

    # C-shape (notch cut from right edge to center) + small square in
    # the notch: bbox containment says hole, geometry says shell
    cs = [(0, 0), (10, 0), (10, 4), (5, 4), (5, 6), (10, 6),
          (10, 10), (0, 10)]
    sq = [(7, 4.5), (8, 4.5), (8, 5.5), (7, 5.5)]
    xs = np.concatenate([np.asarray(cs, float)[:, 0],
                         np.asarray(sq, float)[:, 0]])
    ys = np.concatenate([np.asarray(cs, float)[:, 1],
                         np.asarray(sq, float)[:, 1]])
    offs = np.array([0, 8, 12])
    areas = np.array([80.0, 1.0])
    emit, holes = _nest_rings(xs, ys, offs, areas)
    assert not holes.any()                       # both shells
    # island-in-lake-in-island: outer shell, middle hole, inner shell
    sq3 = [(0, 0), (12, 0), (12, 12), (0, 12),
           (2, 2), (10, 2), (10, 10), (2, 10),
           (4, 4), (8, 4), (8, 8), (4, 8)]
    a3 = np.asarray(sq3, float)
    offs3 = np.array([0, 4, 8, 12])
    areas3 = np.array([144.0, 64.0, 16.0])
    emit3, holes3 = _nest_rings(a3[:, 0], a3[:, 1], offs3, areas3)
    assert holes3.tolist() == [False, True, False]
    # shells come immediately before their own holes
    assert emit3.tolist() == [0, 1, 2]
    # two disjoint squares under one relation: two shells
    two = np.asarray([(0, 0), (1, 0), (1, 1), (0, 1),
                      (5, 5), (6, 5), (6, 6), (5, 6)], float)
    _, h2 = _nest_rings(two[:, 0], two[:, 1], np.array([0, 4, 8]),
                        np.array([1.0, 1.0]))
    assert not h2.any()


def test_super_relation_closure_vectorized():
    """The vectorized multi-source BFS must match a reference dict walk
    on chain/diamond/cycle graphs, and close 1e5 synthetic edges well
    under a time bound (the round-4 per-edge Python walk did not)."""
    import time

    import numpy as np

    from planetiler_ray.pipelines.osm import _close_super_relations

    def reference(parents, childs, roots, max_depth=8):
        children = {}
        for p, c in zip(parents, childs):
            children.setdefault(int(p), []).append(int(c))
        desc_roots = set()
        for root in sorted(set(map(int, roots)) & children.keys()):
            seen = {root}
            frontier = list(children[root])
            depth = 0
            while frontier and depth < max_depth:
                nxt = []
                for c in frontier:
                    if c in seen:
                        continue
                    seen.add(c)
                    desc_roots.add((c, root))
                    nxt.extend(children.get(c, ()))
                frontier = nxt
                depth += 1
        return sorted(desc_roots)

    rng = np.random.default_rng(42)
    cases = [
        # chain deeper than the bound: closure truncates at depth 8
        (np.arange(1, 13), np.arange(2, 14), [1]),
        # diamond + shared child, two roots
        ([1, 1, 2, 3, 10], [2, 3, 4, 4, 2], [1, 10]),
        # cycle: must terminate, no dup pairs
        ([1, 2, 3], [2, 3, 1], [1]),
        # random DAG-ish graph
        (rng.integers(0, 500, 3000), rng.integers(0, 500, 3000),
         rng.integers(0, 500, 60)),
    ]
    for parents, childs, roots in cases:
        d, r = _close_super_relations(np.asarray(parents),
                                      np.asarray(childs),
                                      np.asarray(roots))
        got = sorted(zip(d.tolist(), r.tolist()))
        assert got == reference(parents, childs, roots), (parents, childs)

    # scale: 1e5 edges over a SPARSE id space (real super-relation
    # graphs are shallow forests, out-degree ≈ 1) — the per-edge dict
    # walk took minutes here; the vectorized closure must be seconds
    n = 100_000
    parents = rng.integers(0, 400_000, n)
    childs = rng.integers(0, 400_000, n)
    roots = rng.integers(0, 400_000, 5_000)
    t0 = time.perf_counter()
    d, r = _close_super_relations(parents, childs, roots)
    wall = time.perf_counter() - t0
    assert len(d) > 0
    assert wall < 10.0, wall
