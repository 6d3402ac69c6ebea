"""Tests for per-tile merge operators and archive sinks."""

import gzip
import struct

import numpy as np
import pyarrow as pa
import pytest

from planetiler_ray.stages.merge import (
    merge_lines,
    merge_multipoint,
    merge_overlapping_boxes,
)


class TestMergeMultipoint:
    def test_groups_and_merged_id(self):
        ids = np.array([17, 23, 31, 44])
        key = np.array([1, 1, 2, 2])
        px = np.array([10.0, 20.0, 30.0, 40.0])
        py = np.array([10.0, 20.0, 30.0, 40.0])
        out = merge_multipoint(ids, key, px, py)
        assert out["group"].tolist() == [1, 2]
        assert out["n_parts"].tolist() == [2, 2]
        assert out["merged_id"].tolist() == [10, 30]  # (min_id//10)*10

    def test_hilbert_part_order_deterministic(self):
        rng = np.random.default_rng(0)
        px = rng.uniform(0, 256, 20)
        py = rng.uniform(0, 256, 20)
        ids = np.arange(20)
        key = np.zeros(20, dtype=np.int64)
        a = merge_multipoint(ids, key, px, py)
        b = merge_multipoint(ids[::-1].copy(), key, px[::-1].copy(), py[::-1].copy())
        assert np.allclose(a["xs"], b["xs"]) and np.allclose(a["ys"], b["ys"])


class TestMergeBoxes:
    def test_overlap_clusters(self):
        # boxes 0,1 overlap; 2 is far away
        ids = np.array([12, 27, 55])
        x0 = np.array([0.0, 5.0, 100.0])
        y0 = np.array([0.0, 5.0, 100.0])
        x1 = np.array([10.0, 15.0, 110.0])
        y1 = np.array([10.0, 15.0, 110.0])
        out = merge_overlapping_boxes(ids, x0, y0, x1, y1)
        assert len(out["merged_id"]) == 2
        i = int(np.argmax(out["n_features"]))
        assert out["n_features"][i] == 2
        assert out["merged_id"][i] == 10
        # union area: 100 + 100 - 25 overlap
        assert out["union_area"][i] == pytest.approx(175.0)
        assert (out["mx0"][i], out["my1"][i]) == (0.0, 15.0)

    def test_min_dist_bridges_gap(self):
        ids = np.array([1, 2])
        out = merge_overlapping_boxes(ids, np.array([0.0, 12.0]), np.array([0.0, 0.0]),
                                      np.array([10.0, 20.0]), np.array([10.0, 10.0]),
                                      min_dist=0.0)
        assert len(out["merged_id"]) == 2          # 2-px gap, no merge
        out = merge_overlapping_boxes(ids, np.array([0.0, 12.0]), np.array([0.0, 0.0]),
                                      np.array([10.0, 20.0]), np.array([10.0, 10.0]),
                                      min_dist=4.0)
        assert len(out["merged_id"]) == 1          # bridged

    def test_min_area_drop(self):
        ids = np.array([1, 2])
        out = merge_overlapping_boxes(ids, np.array([0.0, 50.0]), np.array([0.0, 50.0]),
                                      np.array([1.0, 60.0]), np.array([1.0, 60.0]),
                                      min_area=5.0)
        assert len(out["merged_id"]) == 1          # 1px² cluster dropped
        assert out["union_area"][0] == pytest.approx(100.0)

    def test_chain_transitivity(self):
        # A-B overlap, B-C overlap, A-C don't → one cluster of 3
        ids = np.array([10, 20, 30])
        out = merge_overlapping_boxes(
            ids, np.array([0.0, 8.0, 16.0]), np.zeros(3),
            np.array([10.0, 18.0, 26.0]), np.full(3, 5.0))
        assert len(out["merged_id"]) == 1
        assert out["n_features"][0] == 3


class TestMergeLines:
    def test_endpoint_join(self):
        a = np.array([[0.0, 0.0], [1.0, 0.0]])
        b = np.array([[1.0, 0.0], [2.0, 0.0]])
        out = merge_lines([a, b])
        assert len(out) == 1
        assert len(out[0]) == 3
        assert out[0][0].tolist() == [0.0, 0.0] and out[0][-1].tolist() == [2.0, 0.0]

    def test_no_join_at_degree3_node(self):
        # three lines meeting at one point: junction preserved (LoopLineMerger)
        a = np.array([[0.0, 0.0], [1.0, 1.0]])
        b = np.array([[1.0, 1.0], [2.0, 0.0]])
        c = np.array([[1.0, 1.0], [1.0, 2.0]])
        out = merge_lines([a, b, c])
        assert len(out) == 3

    def test_stub_removal_and_simplify(self):
        long = np.array([[0.0, 0.0], [5.0, 0.001], [10.0, 0.0]])
        stub = np.array([[20.0, 20.0], [20.2, 20.0]])
        out = merge_lines([long, stub], min_length=1.0, tolerance=0.01)
        assert len(out) == 1
        assert len(out[0]) == 2  # mid-vertex simplified away

    def test_reversed_endpoint_join(self):
        a = np.array([[1.0, 0.0], [0.0, 0.0]])   # end at origin-side start
        b = np.array([[1.0, 0.0], [2.0, 0.0]])
        out = merge_lines([a, b])
        assert len(out) == 1 and len(out[0]) == 3


class TestSinks:
    @pytest.fixture(scope="class")
    def tiles(self, ray_session):
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.stages.render import RenderConfig
        n = 200
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        return build_pyramid(ds, fixtures.image_ids(n), RenderConfig(0, 4),
                             num_partitions=4).materialize()

    def test_write_files(self, tiles, tmp_path):
        from planetiler_ray.sinks import write_files
        from planetiler_ray.stages.reduce import RECORD_DTYPE
        n = write_files(tiles, str(tmp_path / "files"))
        assert n == tiles.count()
        df = tiles.to_pandas().iloc[0]
        p = tmp_path / "files" / str(df["z"]) / str(df["x"]) / f"{df['y']}.mvt.gz"
        raw = gzip.decompress(p.read_bytes())
        from planetiler_ray.tilemath.mvt_pb import decode_tile
        layers = decode_tile(raw)
        assert sum(len(l["features"]) for l in layers.values()) == df["n_features"]

    def test_write_csv_roundtrip(self, tiles, tmp_path, ray_session):
        import base64
        import pandas as pd
        import ray.data as rd
        from planetiler_ray.sinks import write_csv
        write_csv(tiles, str(tmp_path / "csv"))
        back = rd.read_csv(str(tmp_path / "csv")).to_pandas()
        assert len(back) == tiles.count()
        blob = base64.b64decode(back["encoded"].iloc[0])
        assert gzip.decompress(blob)[:4]  # valid gzip with payload

    def test_archive_roundtrip_and_dedup(self, tiles, tmp_path):
        import pyarrow as pa
        from planetiler_ray.sinks import (read_archive_index, read_archive_tile,
                                          records_to_mvt_pb_batch, write_archive)
        path = str(tmp_path / "tiles.arc")
        info = write_archive(tiles, path)
        assert info["n_tiles"] == tiles.count()
        idx = read_archive_index(path)
        # hilbert-sorted index
        assert (np.diff(idx[:, 1]) >= 0).all()
        df = tiles.to_pandas()
        row = df.iloc[len(df) // 2]
        got = read_archive_tile(path, int(row["tile_id"]))
        one = pa.table({"tile_id": pa.array([int(row["tile_id"])], pa.int64()),
                        "tile_bytes": pa.array([row["tile_bytes"]],
                                               pa.large_binary())})
        assert got == records_to_mvt_pb_batch(one)[0]

    def test_dedup_tiles(self, tiles, ray_session):
        from planetiler_ray.sinks import dedup_tiles
        dd = dedup_tiles(tiles).to_pandas()
        assert dd["ref_count"].sum() == tiles.count()
        assert len(dd) <= tiles.count()

    def test_layer_stats(self, ray_session):
        import ray.data as rd
        from planetiler_ray import fixtures
        from planetiler_ray.pipelines.tiles import (render_fragments,
                                                    sample_partition_bounds)
        from planetiler_ray.sinks import layer_stats
        from planetiler_ray.stages.render import RenderConfig
        n = 100
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        cfg = RenderConfig(0, 4)
        bounds = sample_partition_bounds(fixtures.image_ids(n), cfg, 4)
        stats = layer_stats(render_fragments(ds, cfg, bounds)).to_pandas()
        assert set(stats["layer"]) == {0, 1}
        assert (stats["n_features"] > 0).all()


def test_write_proto_stream_roundtrip(ray_session, tmp_path):
    """Length-prefixed proto stream: parallel shards decode back to the
    exact tile set (WriteableProtoStreamArchive analog)."""
    from planetiler_ray import fixtures, sinks
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig

    n = 120
    path = fixtures.images_parquet(n, with_bytes=False)
    import ray.data as rd
    tiles = build_pyramid(
        rd.read_parquet(path, columns=["image_id", "caption", "phash"]),
        fixtures.image_ids(n), RenderConfig(0, 4), num_partitions=4)
    out_dir = str(tmp_path / "proto")
    n_written = sinks.write_proto_stream(tiles, out_dir)
    back = sinks.read_proto_stream(out_dir)
    assert len(back) == n_written == tiles.count()
    df = tiles.to_pandas()
    want = set(zip(df["z"], df["x"], df["y"]))
    got = set((t["z"], t["x"], t["y"]) for t in back)
    assert want == got
    assert all(len(t["bytes"]) > 0 for t in back)


def test_vector_layers_metadata_roundtrip(ray_session, tmp_path):
    """vector_layer_stats → TileJSON vector_layers wired into MBTiles
    (``json`` metadata row) and PMTiles (metadata blob), read back by a
    client: layer ids, zoom ranges and field types survive."""
    import json
    import sqlite3

    import ray.data as rd
    from planetiler_ray.pipelines.geometry import (build_geometry_tiles,
                                                   geometry_fragments)
    from planetiler_ray.sinks import vector_layer_stats
    from planetiler_ray.sinks_mbtiles import write_mbtiles
    from planetiler_ray.sinks_pmtiles import read_pmtiles_metadata, write_pmtiles
    from planetiler_ray.tilemath.tilecoord import (hilbert_encode_tile,
                                                   tms_decode)

    geoms = rd.from_arrow(pa.table({
        "geom_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["point", "line", "point"]),
        "xs": pa.array([[0.3], [0.4, 0.6], [0.7]], pa.list_(pa.float64())),
        "ys": pa.array([[0.3], [0.4, 0.6], [0.7]], pa.list_(pa.float64())),
        # name: string; pop: number; bridge: bool — one per type bucket;
        # the line has no name (null → field absent for that feature)
        "name": pa.array(["alpha", None, "gamma"]),
        "pop": pa.array(["12", "3400", "7"]),
        "bridge": pa.array(["true", "false", "true"]),
    }))
    kw = dict(min_zoom=0, max_zoom=3, attr_cols=("name", "pop", "bridge"))
    vl = vector_layer_stats(geometry_fragments(geoms, **kw),
                            infer_types=True,
                            attr_cols=("name", "pop", "bridge"))
    by_id = {d["id"]: d for d in vl}
    assert set(by_id) == {"points", "lines"}
    assert by_id["points"]["minzoom"] == 0 and by_id["points"]["maxzoom"] == 3
    assert by_id["points"]["fields"] == {"name": "String", "pop": "Number",
                                         "bridge": "Boolean"}
    # honest default: encoded values are strings, so every field is
    # "String" unless content inference is opted into
    vl0 = vector_layer_stats(geometry_fragments(geoms, **kw),
                             attr_cols=("name", "pop", "bridge"))
    f0 = {d["id"]: d for d in vl0}["points"]["fields"]
    assert set(f0.values()) == {"String"}
    assert "name" not in by_id["lines"]["fields"]       # null-only → absent

    tiles = build_geometry_tiles(geoms, **kw, num_partitions=2)

    def ids(batch):
        x, y, z = tms_decode(batch["tile_id"].to_numpy())
        hil = np.empty(len(z), np.int64)
        for zv in np.unique(z):
            m = z == zv
            hil[m] = hilbert_encode_tile(x[m], y[m], int(zv))
        return batch.append_column("hilbert_id", pa.array(hil))

    tiles = tiles.map_batches(ids, batch_format="pyarrow").materialize()

    mb = str(tmp_path / "vl.mbtiles")
    write_mbtiles(tiles, mb, vector_layers=vl)
    con = sqlite3.connect(mb)
    row = con.execute(
        "SELECT value FROM metadata WHERE name='json'").fetchone()
    con.close()
    assert json.loads(row[0])["vector_layers"] == vl

    pm = str(tmp_path / "vl.pmtiles")
    write_pmtiles(tiles, pm, max_zoom=3, vector_layers=vl)
    assert read_pmtiles_metadata(pm)["vector_layers"] == vl
