"""Tests for the PMTiles v3 sink and the Hilbert-sharded archive."""

import gzip
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiles(ray_session):
    import ray.data as rd
    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig
    n = 200
    path = fixtures.images_parquet(n, with_bytes=False)
    ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
    return build_pyramid(ds, fixtures.image_ids(n), RenderConfig(0, 5),
                         num_partitions=4).materialize()


class TestPmtiles:
    def test_header_and_random_access(self, tiles, tmp_path):
        from planetiler_ray.sinks_pmtiles import (read_pmtiles_header,
                                                  read_pmtiles_metadata,
                                                  read_pmtiles_tile,
                                                  write_pmtiles)
        from planetiler_ray.tilemath.mvt_pb import decode_tile

        path = str(tmp_path / "t.pmtiles")
        info = write_pmtiles(tiles, path, metadata={"name": "test"},
                             min_zoom=0, max_zoom=5)
        assert info["n_addressed"] == tiles.count()
        hdr = read_pmtiles_header(path)
        assert hdr["clustered"] and hdr["tile_type"] == 1
        assert hdr["n_addressed"] == tiles.count()
        assert read_pmtiles_metadata(path)["name"] == "test"

        df = tiles.to_pandas()
        for _, row in df.sample(8, random_state=0).iterrows():
            raw = read_pmtiles_tile(path, int(row["hilbert_id"]))
            assert raw is not None
            layers = decode_tile(raw)
            assert sum(len(l["features"]) for l in layers.values()) \
                == row["n_features"]
        # absent tile id
        missing = int(df["hilbert_id"].max()) + 10**6
        assert read_pmtiles_tile(path, missing) is None

    def test_directory_round_trip(self):
        from planetiler_ray.sinks_pmtiles import (_deserialize_directory,
                                                  _serialize_directory)
        entries = [(5, 0, 10, 1), (6, 10, 20, 2), (9, 30, 5, 1),
                   (1000, 35, 7, 1)]
        tid, off, ln, rl = (np.array(c, np.int64)
                            for c in zip(*entries))
        assert _deserialize_directory(
            _serialize_directory(tid, off, ln, rl)) == entries

    def test_leaf_directories(self, ray_session, tmp_path):
        # force > MAX_ROOT_ENTRIES entries with synthetic tiny tiles
        import pyarrow as pa
        import ray.data as rd
        from planetiler_ray import sinks_pmtiles as P
        n = 9000
        tbl = pa.table({
            "tile_id": pa.array(np.arange(n), pa.int64()),
            "hilbert_id": pa.array(np.arange(n) * 3, pa.int64()),
            "z": pa.array(np.full(n, 7), pa.int8()),
            "content_hash": pa.array(np.arange(n), pa.int64()),
            "mvt_bytes": pa.array([b"x%d" % i for i in range(n)],
                                  pa.large_binary()),
        })
        ds = rd.from_arrow(tbl)
        path = str(tmp_path / "leaf.pmtiles")
        info = P.write_pmtiles(ds, path)
        assert info["n_entries"] == n
        hdr = P.read_pmtiles_header(path)
        assert hdr["leaf_len"] > 0
        got = P.read_pmtiles_tile(path, 3 * 4567)
        assert gzip.decompress(gzip.compress(b"x4567")) == b"x4567"
        assert got == b"x4567"

    def test_run_length_dedup(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd
        from planetiler_ray import sinks_pmtiles as P
        # consecutive identical content → one entry with run_length 3
        tbl = pa.table({
            "tile_id": pa.array([1, 2, 3, 4], pa.int64()),
            "hilbert_id": pa.array([10, 11, 12, 20], pa.int64()),
            "z": pa.array([3, 3, 3, 3], pa.int8()),
            "content_hash": pa.array([7, 7, 7, 9], pa.int64()),
            "mvt_bytes": pa.array([b"same", b"same", b"same", b"other"],
                                  pa.large_binary()),
        })
        path = str(tmp_path / "rl.pmtiles")
        info = P.write_pmtiles(rd.from_arrow(tbl), path)
        assert info["n_entries"] == 2 and info["n_contents"] == 2
        assert P.read_pmtiles_tile(path, 11) == b"same"
        assert P.read_pmtiles_tile(path, 20) == b"other"
        assert P.read_pmtiles_tile(path, 13) is None
        # enumerator expands the run back to one row per addressed tile
        ents = P.iter_pmtiles_entries(path)
        assert [e[0] for e in ents] == [10, 11, 12, 20]
        assert ents[0][1:] == ents[1][1:] == ents[2][1:]  # shared blob
        with open(path, "rb") as f:
            hdr = P.read_pmtiles_header(path)
            f.seek(hdr["data_off"] + ents[3][1])
            assert gzip.decompress(f.read(ents[3][2])) == b"other"

    def test_iter_entries_with_leaves(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd
        from planetiler_ray import sinks_pmtiles as P
        n = 9000
        tbl = pa.table({
            "tile_id": pa.array(np.arange(n), pa.int64()),
            "hilbert_id": pa.array(np.arange(n) * 3, pa.int64()),
            "z": pa.array(np.full(n, 7), pa.int8()),
            "content_hash": pa.array(np.arange(n), pa.int64()),
            "mvt_bytes": pa.array([b"x%d" % i for i in range(n)],
                                  pa.large_binary()),
        })
        path = str(tmp_path / "leafs.pmtiles")
        P.write_pmtiles(rd.from_arrow(tbl), path)
        assert P.read_pmtiles_header(path)["leaf_len"] > 0
        ents = P.iter_pmtiles_entries(path)
        assert [e[0] for e in ents] == (np.arange(n) * 3).tolist()
        hdr = P.read_pmtiles_header(path)
        with open(path, "rb") as f:
            for hid, off, ln in [ents[0], ents[4567], ents[-1]]:
                f.seek(hdr["data_off"] + off)
                assert gzip.decompress(f.read(ln)) == b"x%d" % (hid // 3)


class TestShardedArchive:
    def test_shards_and_random_access(self, tiles, tmp_path):
        from planetiler_ray.sinks import (read_sharded_archive_tile,
                                          write_archive_sharded)
        from planetiler_ray.tilemath.mvt_pb import decode_tile

        out = str(tmp_path / "arc")
        info = write_archive_sharded(tiles, out, num_shards=4)
        assert info["n_tiles"] == tiles.count()
        root = json.load(open(os.path.join(out, "root.json")))
        assert len(root["shards"]) >= 2          # really sharded
        parts = [p for p in os.listdir(out) if p.endswith(".arc")]
        assert len(parts) == len(root["shards"])
        df = tiles.to_pandas()
        for _, row in df.sample(6, random_state=1).iterrows():
            raw = read_sharded_archive_tile(out, int(row["tile_id"]),
                                            int(row["hilbert_id"]))
            layers = decode_tile(raw)
            assert sum(len(l["features"]) for l in layers.values()) \
                == row["n_features"]


def test_pmtiles_bounds_from_extent(tiles, tmp_path):
    """Header bounds/center come from the actual deepest-zoom tile
    envelope, not hardcoded world bounds (round-2 ADVICE)."""
    from planetiler_ray.sinks_pmtiles import read_pmtiles_header, write_pmtiles

    path = str(tmp_path / "b.pmtiles")
    write_pmtiles(tiles, path, min_zoom=0, max_zoom=5)
    hdr = read_pmtiles_header(path)
    lon0, lat0, lon1, lat1 = hdr["bounds"]
    df = tiles.to_pandas()
    z = int(df["z"].max())
    sub = df[df["z"] == z]
    exp_lon0 = sub["x"].min() / (1 << z) * 360.0 - 180.0
    exp_lon1 = (sub["x"].max() + 1) / (1 << z) * 360.0 - 180.0
    assert lon0 == pytest.approx(exp_lon0, abs=1e-6)
    assert lon1 == pytest.approx(exp_lon1, abs=1e-6)
    assert -85.1 < lat0 < lat1 < 85.1
    clon, clat = hdr["center"]
    assert clon == pytest.approx((lon0 + lon1) / 2, abs=1e-6)
    assert lat0 <= clat <= lat1


class TestShardedArchiveFillRuns:
    def test_fill_runs_spliced_with_one_stored_blob(self, ray_session,
                                                    tmp_path):
        """Run-native interior fill: the ocean-style polygon's interior
        tiles reach the archive as (tile_id, hilbert) pairs expanded
        from the compact run table, every entry sharing ONE stored
        blob; detail tiles win at the same coordinate; hilbert ranges
        without any detail tile still get their fill-only parts."""
        import pyarrow as pa
        import ray.data as rd
        from planetiler_ray.sinks import (fill_runs_from_striped,
                                          read_sharded_archive_tile,
                                          write_archive_sharded)
        from planetiler_ray.tilemath.stripeclip import slice_polygons_striped
        from planetiler_ray.tilemath.tilecoord import (hilbert_encode_tile,
                                                       tms_encode)

        z = 7
        s = float(1 << z)
        px = np.concatenate([np.array([0.1, 0.85, 0.85, 0.1]) * s,
                             np.array([0.35, 0.55, 0.55, 0.35]) * s])
        py = np.concatenate([np.array([0.3, 0.3, 0.7, 0.7]) * s,
                             np.array([0.4, 0.4, 0.6, 0.6]) * s])
        res = slice_polygons_striped(px, py, np.array([0, 4, 8]), z,
                                     4 / 256.0,
                                     poly_of_ring=np.array([0, 0]))
        runs = fill_runs_from_striped(res, z)
        n_fill = int((runs["y1"].to_numpy()
                      - runs["y0"].to_numpy() + 1).sum())
        assert n_fill > 3000

        # detail = the boundary tiles (deduped) + ONE artificial detail
        # tile placed on a fill coordinate (detail must win)
        bx, by = np.unique(np.stack([res["x"], res["y"]]), axis=1)
        fx = int(runs["x"][0].as_py())
        fy = int(runs["y0"][0].as_py())
        bx = np.concatenate([bx, [fx]])
        by = np.concatenate([by, [fy]])
        tids = tms_encode(bx, by, np.full(len(bx), z, np.int64))
        hils = hilbert_encode_tile(bx, by, z)
        tiles = rd.from_arrow(pa.table({
            "tile_id": pa.array(tids),
            "hilbert_id": pa.array(hils),
            "z": pa.array(np.full(len(bx), z, np.int8)),
            "content_hash": pa.array(np.arange(len(bx)), pa.int64()),
            "mvt_bytes": pa.array([b"detail%d" % i
                                   for i in range(len(bx))],
                                  pa.large_binary())}))

        out = str(tmp_path / "arc")
        info = write_archive_sharded(tiles, out, num_shards=4,
                                     fill_runs=runs,
                                     fill_blob=b"FILLSQUARE")
        # total = boundary + fills, minus the fill tile shadowed by the
        # artificial detail row
        assert info["n_tiles"] == len(bx) + n_fill - 1
        # n_fills counts WRITTEN fill entries: the shadowed one excluded
        assert info["n_fills"] == n_fill - 1

        root = json.load(open(os.path.join(out, "root.json")))
        # every part stores the fill blob at most once
        for sh in root["shards"]:
            assert sh["n_blobs"] <= len(bx) + 1

        # random interior tiles decode to the shared fill payload
        rr = runs.to_pandas().sample(5, random_state=2)
        for _, r in rr.iterrows():
            y = int((r["y0"] + r["y1"]) // 2)
            tid = int(tms_encode(np.array([r["x"]]), np.array([y]),
                                 np.array([z]))[0])
            hid = int(hilbert_encode_tile(np.array([r["x"]]),
                                          np.array([y]), z)[0])
            if tid == int(tids[-1]):          # the shadowed coordinate
                continue
            assert read_sharded_archive_tile(out, tid, hid) == b"FILLSQUARE"

        # the artificial detail tile wins over the fill
        assert read_sharded_archive_tile(
            out, int(tids[-1]), int(hils[-1])) == b"detail%d" % (len(bx) - 1)

    def test_empty_dataset_writes_empty_root(self, ray_session, tmp_path):
        """Zero input rows: no shard task ever runs — the sink must
        still write a valid empty root.json instead of KeyError-ing on
        the column-less summary frame."""
        import pyarrow as pa
        import ray.data as rd
        from planetiler_ray.sinks import write_archive_sharded

        empty = rd.from_arrow(pa.table({
            "tile_id": pa.array([], pa.int64()),
            "hilbert_id": pa.array([], pa.int64()),
            "z": pa.array([], pa.int8()),
            "content_hash": pa.array([], pa.int64()),
            "mvt_bytes": pa.array([], pa.large_binary())}))
        out = str(tmp_path / "empty")
        info = write_archive_sharded(empty, out, num_shards=4)
        assert info == {"n_shards": 0, "n_tiles": 0, "n_fills": 0,
                        "bytes": 0}
        root = json.load(open(os.path.join(out, "root.json")))
        assert root["shards"] == []
