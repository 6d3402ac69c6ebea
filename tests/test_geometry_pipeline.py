"""End-to-end tests for the general-geometry tile pipeline: GeoParquet
WKB (points / linestrings / polygons) → slice → tile shuffle → real MVT
layers.  The 'a user with real polygon data could switch' path."""

import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def wkb_point(x, y):
    return b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", x, y)


def wkb_linestring(coords):
    out = b"\x01" + struct.pack("<I", 2) + struct.pack("<I", len(coords))
    for x, y in coords:
        out += struct.pack("<dd", x, y)
    return out


def wkb_polygon(ring):
    closed = list(ring) + [ring[0]]
    out = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", 1)
    out += struct.pack("<I", len(closed))
    for x, y in closed:
        out += struct.pack("<dd", x, y)
    return out


@pytest.fixture(scope="module")
def wkb_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("wkb")
    p = str(d / "geoms.parquet")
    rows = [
        (1, wkb_point(10.0, 20.0), "a point"),
        (2, wkb_linestring([(-10, 0), (10, 5), (30, 10)]), "a line"),
        (3, wkb_polygon([(0, 0), (20, 0), (20, 15), (0, 15)]), "a poly"),
        (4, wkb_point(10.05, 20.05), "near point"),
    ]
    pq.write_table(pa.table({
        "fid": pa.array([r[0] for r in rows], pa.int64()),
        "geometry": pa.array([r[1] for r in rows], pa.binary()),
        "name": pa.array([r[2] for r in rows], pa.string()),
    }), p)
    return p


class TestWkbToTiles:
    def test_read_geometries(self, wkb_parquet, ray_session):
        from planetiler_ray.sources.geoparquet import read_geoparquet_geometries
        df = read_geoparquet_geometries(wkb_parquet, id_col="fid",
                                        attr_cols=("name",)).to_pandas()
        assert sorted(df["kind"]) == ["line", "point", "point", "polygon"]
        poly = df[df["kind"] == "polygon"].iloc[0]
        assert len(poly["xs"]) == 4          # closing vertex dropped
        assert poly["name"] == "a poly"
        # world mercator range
        assert all(0 <= v <= 1 for v in poly["xs"])

    def test_wkb_to_mvt_tiles(self, wkb_parquet, ray_session):
        from planetiler_ray.pipelines.geometry import build_geometry_tiles
        from planetiler_ray.sources.geoparquet import read_geoparquet_geometries
        from planetiler_ray.tilemath.mvt_pb import (decode_feature_attrs,
                                                    decode_tile)
        geoms = read_geoparquet_geometries(wkb_parquet, id_col="fid",
                                           attr_cols=("name",))
        tiles = build_geometry_tiles(geoms, min_zoom=0, max_zoom=4,
                                     attr_cols=("name",)).to_pandas()
        assert len(tiles) > 0
        z0 = tiles[tiles["z"] == 0]
        assert len(z0) == 1 and int(z0["n_features"].iloc[0]) == 4
        layers = decode_tile(z0["mvt_bytes"].iloc[0])
        assert set(layers) == {"points", "lines", "polygons"}
        assert len(layers["points"]["features"]) == 2
        (lf,) = layers["lines"]["features"]
        assert lf["type"] == 2 and lf["id"] == 2
        (pf,) = layers["polygons"]["features"]
        assert pf["type"] == 3 and pf["geometry"][-1] == 15   # ClosePath
        at = decode_feature_attrs(layers["polygons"], pf)
        assert at == {"name": "a poly"}

    def test_zoom_fanout_and_wrap(self, ray_session):
        import ray.data as rd
        from planetiler_ray.pipelines.geometry import build_geometry_tiles
        # polygon straddling the antimeridian (world x near 1)
        tbl = pa.table({
            "geom_id": pa.array([9], pa.int64()),
            "kind": pa.array(["polygon"]),
            "xs": pa.array([[0.995, 1.0, 1.0, 0.995]], pa.list_(pa.float64())),
            "ys": pa.array([[0.4, 0.4, 0.41, 0.41]], pa.list_(pa.float64())),
        })
        tiles = build_geometry_tiles(rd.from_arrow(tbl), min_zoom=6,
                                     max_zoom=6).to_pandas()
        xs = set(tiles["x"])
        assert 63 in xs                       # last column at z6
        assert (tiles["z"] == 6).all()

    def test_min_pixel_gate(self, ray_session):
        import ray.data as rd
        # tiny polygon: present at max zoom only once gated
        tbl = pa.table({
            "geom_id": pa.array([5], pa.int64()),
            "kind": pa.array(["polygon"]),
            "xs": pa.array([[0.5, 0.50001, 0.50001, 0.5]],
                           pa.list_(pa.float64())),
            "ys": pa.array([[0.5, 0.5, 0.50001, 0.50001]],
                           pa.list_(pa.float64())),
        })
        from planetiler_ray.pipelines.geometry import build_geometry_tiles
        tiles = build_geometry_tiles(rd.from_arrow(tbl), min_zoom=0,
                                     max_zoom=6,
                                     min_pixel_size=1.0).to_pandas()
        zs = sorted(set(tiles["z"]))
        assert zs[-1] == 6                    # max zoom always present
        assert 0 not in zs                    # sub-pixel at z0 → gated


class TestTileLineMerge:
    def test_touching_lines_merge_in_tile(self, ray_session):
        import ray.data as rd
        from planetiler_ray.pipelines.geometry import build_geometry_tiles
        from planetiler_ray.tilemath.mvt_pb import decode_tile
        # two lines sharing an endpoint, same attrs → one merged feature
        tbl = pa.table({
            "geom_id": pa.array([21, 32], pa.int64()),
            "kind": pa.array(["line", "line"]),
            "xs": pa.array([[0.1, 0.2], [0.2, 0.3]], pa.list_(pa.float64())),
            "ys": pa.array([[0.1, 0.2], [0.2, 0.3]], pa.list_(pa.float64())),
            "road": pa.array(["a", "a"], pa.string()),
        })
        tiles = build_geometry_tiles(rd.from_arrow(tbl), min_zoom=0,
                                     max_zoom=0, attr_cols=("road",),
                                     line_merge={}).to_pandas()
        (row,) = tiles.to_dict("records")
        lay = decode_tile(row["mvt_bytes"])["lines"]
        assert len(lay["features"]) == 1
        (f,) = lay["features"]
        assert f["id"] == 20                       # (min_id//10)*10
        assert (len(f["geometry"]) - 2) // 2 == 3  # 3 merged vertices

    def test_different_attrs_do_not_merge(self, ray_session):
        import ray.data as rd
        from planetiler_ray.pipelines.geometry import build_geometry_tiles
        from planetiler_ray.tilemath.mvt_pb import decode_tile
        tbl = pa.table({
            "geom_id": pa.array([1, 2], pa.int64()),
            "kind": pa.array(["line", "line"]),
            "xs": pa.array([[0.1, 0.2], [0.2, 0.3]], pa.list_(pa.float64())),
            "ys": pa.array([[0.1, 0.2], [0.2, 0.3]], pa.list_(pa.float64())),
            "road": pa.array(["a", "b"], pa.string()),
        })
        tiles = build_geometry_tiles(rd.from_arrow(tbl), min_zoom=0,
                                     max_zoom=0, attr_cols=("road",),
                                     line_merge={}).to_pandas()
        (row,) = tiles.to_dict("records")
        lay = decode_tile(row["mvt_bytes"])["lines"]
        assert len(lay["features"]) == 2


def test_geometry_shuffle_strategies_identical(ray_session):
    """Exchange-partitioned encode must equal the per-tile groupby."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from planetiler_ray.pipelines.geometry import build_geometry_tiles

    rng = np.random.default_rng(3)
    n = 40
    xs, ys, kinds = [], [], []
    for i in range(n):
        k = ("point", "line", "polygon")[i % 3]
        m = 1 if k == "point" else 4
        x0, y0 = rng.uniform(0.2, 0.8, 2)
        px = x0 + rng.uniform(0, 0.05, m)
        py = y0 + rng.uniform(0, 0.05, m)
        xs.append(px.tolist()); ys.append(py.tolist()); kinds.append(k)
    geoms = pa.table({
        "geom_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds, pa.string()),
        "xs": pa.array(xs, pa.list_(pa.float64())),
        "ys": pa.array(ys, pa.list_(pa.float64())),
    })

    def run(shuffle):
        return build_geometry_tiles(rd.from_arrow(geoms), 0, 5,
                                    shuffle=shuffle, num_partitions=7) \
            .to_pandas().sort_values("tile_id").reset_index(drop=True)

    a, b = run("groupby"), run("exchange")
    assert a["tile_id"].equals(b["tile_id"])
    assert a["content_hash"].equals(b["content_hash"])
    assert a["n_features"].equals(b["n_features"])
    assert all(bytes(x) == bytes(y)
               for x, y in zip(a["mvt_bytes"], b["mvt_bytes"]))


def test_content_hash_distinguishes_geometry(ray_session):
    """Two tiles crossed by the same single feature must get DIFFERENT
    content hashes: the hash folds quantized vertex coords, not just the
    feature-id set (round-2 ADVICE: id-only hashes made PMTiles RLE /
    archive dedup serve wrong tile bytes)."""
    import ray.data
    from planetiler_ray.pipelines.geometry import build_geometry_tiles

    # one horizontal line crossing two z1 tiles at different y-profiles
    tbl = pa.table({
        "geom_id": pa.array([7], pa.int64()),
        "kind": pa.array(["line"], pa.string()),
        "xs": pa.array([[0.05, 0.95]], pa.list_(pa.float64())),
        "ys": pa.array([[0.10, 0.40]], pa.list_(pa.float64())),
    })
    tiles = build_geometry_tiles(ray.data.from_arrow(tbl), min_zoom=1,
                                 max_zoom=1).take_all()
    z1 = [t for t in tiles if t["z"] == 1]
    assert len(z1) == 2
    hashes = {t["content_hash"] for t in z1}
    assert len(hashes) == 2, "same feature id, different clip → same hash"
    # attrs flow into the hash too: same geometry, different attr value
    def tiles_for(name):
        t2 = pa.table({
            "geom_id": pa.array([7], pa.int64()),
            "kind": pa.array(["point"], pa.string()),
            "xs": pa.array([[0.3]], pa.list_(pa.float64())),
            "ys": pa.array([[0.3]], pa.list_(pa.float64())),
            "name": pa.array([name], pa.string()),
        })
        out = build_geometry_tiles(ray.data.from_arrow(t2), min_zoom=0,
                                   max_zoom=0, attr_cols=("name",)).take_all()
        return out[0]["content_hash"]
    assert tiles_for("a") != tiles_for("b")
