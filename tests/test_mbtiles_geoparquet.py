"""Tests for the MBTiles sink and the WKB GeoParquet-style reader."""

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiles(ray_session):
    import ray.data as rd
    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig
    n = 150
    path = fixtures.images_parquet(n, with_bytes=False)
    ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
    return build_pyramid(ds, fixtures.image_ids(n), RenderConfig(0, 4),
                         num_partitions=4).materialize()


class TestMbtiles:
    def test_write_and_read_back(self, tiles, tmp_path):
        import pyarrow as pa
        from planetiler_ray.sinks import records_to_mvt_pb_batch
        from planetiler_ray.sinks_mbtiles import read_mbtiles_tile, write_mbtiles
        from planetiler_ray.tilemath.mvt_pb import decode_tile
        import gzip
        path = str(tmp_path / "out.mbtiles")
        info = write_mbtiles(tiles, path, metadata={"name": "test"})
        assert info["n_tiles"] == tiles.count()
        df = tiles.to_pandas().iloc[0]
        blob = read_mbtiles_tile(path, int(df["z"]), int(df["x"]), int(df["y"]))
        one = pa.table({"tile_id": pa.array([int(df["tile_id"])], pa.int64()),
                        "tile_bytes": pa.array([df["tile_bytes"]],
                                               pa.large_binary())})
        raw = gzip.decompress(blob)
        assert raw == records_to_mvt_pb_batch(one)[0]
        # the stored payload really is MVT protobuf (format 'pbf' is honest)
        layers = decode_tile(raw)
        assert sum(len(l["features"]) for l in layers.values()) \
            == int(df["n_features"])
        assert read_mbtiles_tile(path, 14, 0, 0) is None

    def test_compact_schema_and_metadata(self, tiles, tmp_path):
        from planetiler_ray.sinks_mbtiles import write_mbtiles
        path = str(tmp_path / "c.mbtiles")
        info = write_mbtiles(tiles, path, compact=True)
        con = sqlite3.connect(path)
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type IN ('table','view')")}
        assert {"tiles_shallow", "tiles_data", "tiles", "metadata"} <= names
        n_view = con.execute("SELECT count(*) FROM tiles").fetchone()[0]
        assert n_view == info["n_tiles"]
        meta = dict(con.execute("SELECT name, value FROM metadata"))
        assert meta["format"] == "pbf"
        con.close()

    def test_non_compact(self, tiles, tmp_path):
        from planetiler_ray.sinks_mbtiles import write_mbtiles
        info = write_mbtiles(tiles, str(tmp_path / "n.mbtiles"), compact=False)
        assert info["n_unique_blobs"] == info["n_tiles"]


def _wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_polygon(coords):
    out = struct.pack("<BIII", 1, 3, 1, len(coords))
    for x, y in coords:
        out += struct.pack("<dd", x, y)
    return out


class TestGeoParquet:
    def test_parse_wkb(self):
        from planetiler_ray.sources.geoparquet import parse_wkb
        kind, c = parse_wkb(_wkb_point(10.0, 20.0))
        assert kind == "point" and c.tolist() == [[10.0, 20.0]]
        kind, c = parse_wkb(_wkb_polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]))
        assert kind == "polygon" and len(c) == 5
        # big-endian point
        be = struct.pack(">BIdd", 0, 1, 5.0, 6.0)
        kind, c = parse_wkb(be)
        assert c.tolist() == [[5.0, 6.0]]
        assert parse_wkb(b"\x01\x02") is None

    def test_read_geoparquet(self, ray_session, tmp_path):
        from planetiler_ray.sources.geoparquet import read_geoparquet
        tbl = pa.table({
            "fid": pa.array(["a", "b", "c"], pa.string()),
            "geometry": pa.array([
                _wkb_point(0.0, 0.0),
                _wkb_polygon([(-1, -1), (1, -1), (1, 1), (-1, 1), (-1, -1)]),
                b"\x01\xff\xff\xff\xff",  # unsupported → skipped
            ], pa.binary()),
        })
        p = tmp_path / "geo.parquet"
        pq.write_table(tbl, str(p))
        df = read_geoparquet(str(p), id_col="fid").to_pandas()
        assert df["image_id"].tolist() == ["a", "b"]
        assert df["cx"][0] == pytest.approx(0.5)
        assert df["hw"][1] == pytest.approx(1 / 360)

    def test_geometry_column_detection_error(self, ray_session, tmp_path):
        from planetiler_ray.sources.geoparquet import read_geoparquet
        p = tmp_path / "plain.parquet"
        pq.write_table(pa.table({"x": [1, 2]}), str(p))
        with pytest.raises(ValueError, match="no geometry column"):
            read_geoparquet(str(p))
