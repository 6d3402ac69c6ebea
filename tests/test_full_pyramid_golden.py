"""Full z0–z14 pyramid golden test (FIXTURES.md §3 headline conformance)
plus the decoded-pixel PSNR invariant and MVT command round-trips."""

import gzip
import struct

import numpy as np
import pytest

from planetiler_ray import codec, fixtures, oracle


class TestFullPyramid:
    N = 80

    def test_z0_to_z14_matches_oracle(self, ray_session):
        import ray.data as rd
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.stages.render import RenderConfig

        path = fixtures.images_parquet(self.N, with_bytes=False)
        ids = fixtures.image_ids(self.N)
        ds = rd.read_parquet(path, columns=["image_id"])
        tiles = build_pyramid(ds, ids, RenderConfig(0, 14),
                              num_partitions=8).to_pandas()
        golden = oracle.golden_tiles(ids, 0, 14)
        assert len(tiles) == len(golden)
        got = tiles.set_index("tile_id")
        assert set(got.index) == set(golden)
        for tid, exp in golden.items():
            row = got.loc[tid]
            assert (row["z"], row["x"], row["y"]) == exp["zxy"]
            assert row["n_features"] == exp["n_features"], (tid, exp["zxy"])
            assert list(row["feature_ids"]) == exp["features"]

    def test_z14_join_matches_oracle(self, ray_session):
        import ray.data as rd
        from planetiler_ray.pipelines.tiles import spatial_join

        path = fixtures.images_parquet(self.N, with_bytes=False)
        ids = fixtures.image_ids(self.N)
        ds = rd.read_parquet(path, columns=["image_id", "caption"])
        got = spatial_join(ds, ids, num_partitions=8, zoom=14).to_pandas()
        exp = oracle.golden_join(ids, zoom=14)
        got_rows = sorted(zip(got["tile_id"].astype(int),
                              got["image_id"], got["knn_rank"].astype(int)))
        assert got_rows == exp


class TestPsnrInvariant:
    def test_decoded_pixels_psnr(self, ray_session):
        """Per-row decoded-pixel invariant: PNG lossless (inf), JPEG ≥ 40 dB."""
        import ray.data as rd
        from planetiler_ray.stages.multimodal import DecodeImages

        n = 24
        tbl = fixtures.images_table(n, with_bytes=True)
        out = rd.from_arrow(tbl).map_batches(
            DecodeImages, batch_format="pyarrow", batch_size=8,
            concurrency=2).to_pandas().sort_values("image_id")
        assert out["ok"].all()
        for _, row in out.iterrows():
            i = int(row["image_id"][3:])
            orig = fixtures.make_pixels(i, int(tbl["w"][i].as_py()),
                                        int(tbl["h"][i].as_py()))
            dec = codec.decode_image(tbl["bytes"][i].as_py())
            p = codec.psnr(orig, dec)
            if row["fmt"] == "png":
                assert p == float("inf")
            else:
                assert p >= 40.0
            # caption equality after the pipeline round-trip
            assert tbl["caption"][i].as_py() == fixtures.captions(
                np.array([i]))[0]


class TestMvtRoundTrip:
    def test_records_to_real_mvt_decodes(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.sinks import records_to_mvt_pb_batch
        from planetiler_ray.stages.reduce import RECORD_DTYPE
        from planetiler_ray.stages.render import RenderConfig
        from planetiler_ray.tilemath.mvt_pb import decode_tile
        from planetiler_ray.tilemath.varint import unzigzag

        n = 60
        path = fixtures.images_parquet(n, with_bytes=False)
        ds = rd.read_parquet(path, columns=["image_id"])
        tiles = build_pyramid(ds, fixtures.image_ids(n), RenderConfig(3, 3),
                              num_partitions=2).to_pandas()
        row = tiles.sort_values("n_features", ascending=False).iloc[0]
        one = pa.table({"tile_id": pa.array([int(row["tile_id"])], pa.int64()),
                        "tile_bytes": pa.array([row["tile_bytes"]],
                                               pa.large_binary())})
        buf = records_to_mvt_pb_batch(one)[0]
        layers = decode_tile(buf)
        feats = [(name, f) for name, lay in layers.items()
                 for f in lay["features"]]
        assert len(feats) == row["n_features"]
        rec = np.frombuffer(row["tile_bytes"], dtype=RECORD_DTYPE)
        # records are (layer, then sort order) — features decode in order
        # within each layer; verify geometry against the record coords
        by_layer = {"chips": [r for r in rec if r["layer"] == 0],
                    "labels": [r for r in rec if r["layer"] == 1]}
        for name, lay in layers.items():
            for r, f in zip(by_layer[name], lay["features"]):
                g = f["geometry"]
                x0, y0 = unzigzag(np.array(g[1:3]))
                assert (x0, y0) == (r["x0"], r["y0"])
                if r["kind"] == 0:
                    assert f["type"] == 3 and g[10] == 15
                    dx, _, _, dy = unzigzag(np.array(g[4:8]))
                    assert dx == r["x1"] - r["x0"] and dy == r["y1"] - r["y0"]
                else:
                    assert f["type"] == 1 and len(g) == 3
