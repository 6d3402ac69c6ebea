"""End-to-end pipeline tests: Ray Data pyramid + join vs the naive oracle."""

import os
import shutil

import numpy as np
import pytest

from planetiler_ray import fixtures, oracle
from planetiler_ray.stages.render import RenderConfig

N = 400


@pytest.fixture(scope="module")
def images_ds(ray_session):
    import ray.data
    path = fixtures.images_parquet(N, with_bytes=False)
    return ray.data.read_parquet(path, columns=["image_id", "caption", "phash"])


@pytest.fixture(scope="module")
def ids():
    return fixtures.image_ids(N)


class TestPyramidVsOracle:
    def test_pyramid_z6(self, ray_session, images_ds, ids):
        from planetiler_ray.pipelines.tiles import build_pyramid
        cfg = RenderConfig(min_zoom=0, max_zoom=6)
        tiles = build_pyramid(images_ds, ids, cfg, num_partitions=8).to_pandas()
        golden = oracle.golden_tiles(ids, min_zoom=0, max_zoom=6)

        assert len(tiles) == len(golden), (len(tiles), len(golden))
        got = tiles.set_index("tile_id")
        assert set(got.index) == set(golden)
        for tid, exp in golden.items():
            row = got.loc[tid]
            assert (row["z"], row["x"], row["y"]) == exp["zxy"], tid
            assert row["n_features"] == exp["n_features"], tid
            assert list(row["feature_ids"]) == exp["features"], tid

    def test_tile_bytes_decode(self, ray_session, images_ds, ids):
        from planetiler_ray.pipelines.tiles import build_pyramid
        from planetiler_ray.stages.reduce import RECORD_DTYPE
        cfg = RenderConfig(min_zoom=2, max_zoom=2)
        tiles = build_pyramid(images_ds, ids, cfg, num_partitions=4).to_pandas()
        assert (tiles["n_features"] > 0).all()
        for _, row in tiles.head(20).iterrows():
            rec = np.frombuffer(row["tile_bytes"], dtype=RECORD_DTYPE)
            assert len(rec) == row["n_features"]
            boxes = rec[rec["kind"] == 0]
            # quantized extent coords within the buffered window
            assert (boxes["x1"] >= boxes["x0"]).all()
            assert (boxes["x0"] >= -4 * 16 - 1).all()
            assert (boxes["x1"] <= 4096 + 4 * 16 + 1).all()

    def test_content_hash_deterministic(self, ray_session, images_ds, ids):
        from planetiler_ray.pipelines.tiles import build_pyramid
        cfg = RenderConfig(min_zoom=3, max_zoom=3)
        a = build_pyramid(images_ds, ids, cfg, num_partitions=4).to_pandas()
        b = build_pyramid(images_ds, ids, cfg, num_partitions=7).to_pandas()
        a = a.sort_values("tile_id").reset_index(drop=True)
        b = b.sort_values("tile_id").reset_index(drop=True)
        # same content regardless of partitioning
        assert (a["tile_id"] == b["tile_id"]).all()
        assert (a["content_hash"] == b["content_hash"]).all()


class TestSpatialJoin:
    def test_join_vs_oracle(self, ray_session, images_ds, ids):
        from planetiler_ray.pipelines.tiles import spatial_join
        got = spatial_join(images_ds, ids, num_partitions=8, zoom=10).to_pandas()
        exp = oracle.golden_join(ids, zoom=10)
        got_rows = sorted(zip(got["tile_id"], got["image_id"], got["knn_rank"]))
        assert [(t, i, r) for t, i, r in got_rows] == exp

    def test_join_caption_equality(self, ray_session, images_ds, ids):
        from planetiler_ray.pipelines.tiles import spatial_join
        got = spatial_join(images_ds, ids, num_partitions=4, zoom=8).to_pandas()
        caps = dict(zip(fixtures.image_ids(N), fixtures.captions(np.arange(N))))
        assert len(got) > 0
        for _, r in got.head(50).iterrows():
            assert r["caption"] == caps[r["image_id"]]


class TestCheckpointResume:
    def test_resume_skips_done_partitions(self, ray_session, images_ds, ids, tmp_path):
        from planetiler_ray.pipelines.tiles import build_pyramid, read_pyramid
        cfg = RenderConfig(min_zoom=0, max_zoom=5)
        ckpt = str(tmp_path / "pyramid")
        summary = build_pyramid(images_ds, ids, cfg, num_partitions=6,
                                checkpoint_dir=ckpt)
        assert summary["n_parts"] >= 2
        n_tiles_first = summary["n_tiles"]

        # record mtimes, then wipe two partitions (simulated partial failure)
        from planetiler_ray.state.checkpoint import CheckpointStore
        store = CheckpointStore(ckpt)
        parts = sorted(store.completed_parts())
        victims = parts[:2]
        mtimes = {p: os.path.getmtime(os.path.join(store.part_dir(p), "data.parquet"))
                  for p in parts}
        for p in victims:
            shutil.rmtree(store.part_dir(p))

        summary2 = build_pyramid(images_ds, ids, cfg, num_partitions=6,
                                 checkpoint_dir=ckpt)
        assert summary2["n_tiles"] == n_tiles_first
        assert summary2["resumed_parts"] == len(parts) - len(victims)
        for p in parts:
            m = os.path.getmtime(os.path.join(store.part_dir(p), "data.parquet"))
            if p in victims:
                assert m > mtimes[p]
            else:
                assert m == mtimes[p], f"partition {p} was recomputed"

        # full output equals the non-checkpointed run
        direct = build_pyramid(images_ds, ids, cfg, num_partitions=6).to_pandas()
        resumed = read_pyramid(ckpt).to_pandas()
        a = direct.sort_values("tile_id").reset_index(drop=True)
        b = resumed.sort_values("tile_id").reset_index(drop=True)
        assert (a["tile_id"].to_numpy() == b["tile_id"].to_numpy()).all()
        assert (a["content_hash"].to_numpy() == b["content_hash"].to_numpy()).all()


class TestJoinCheckpoint:
    def test_join_checkpointed_resume(self, ray_session, images_ds, ids, tmp_path):
        import shutil
        from planetiler_ray.pipelines.tiles import read_pyramid, spatial_join
        from planetiler_ray.state.checkpoint import CheckpointStore
        ckpt = str(tmp_path / "join")
        s1 = spatial_join(images_ds, ids, num_partitions=5, zoom=9,
                          checkpoint_dir=ckpt)
        assert s1["n_parts"] >= 2
        store = CheckpointStore(ckpt)
        victim = sorted(store.completed_parts())[0]
        shutil.rmtree(store.part_dir(victim))
        s2 = spatial_join(images_ds, ids, num_partitions=5, zoom=9,
                          checkpoint_dir=ckpt)
        assert s2["n_tiles"] == s1["n_tiles"]
        direct = spatial_join(images_ds, ids, num_partitions=5, zoom=9).to_pandas()
        resumed = read_pyramid(ckpt).to_pandas()
        a = sorted(zip(direct["tile_id"], direct["image_id"], direct["knn_rank"]))
        b = sorted(zip(resumed["tile_id"], resumed["image_id"], resumed["knn_rank"]))
        assert a == b
