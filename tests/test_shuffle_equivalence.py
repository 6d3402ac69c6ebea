"""Cross-check: the explicit exchange and the Dataset groupby shuffle
produce identical pyramids (partitioning strategy must not affect results)."""

import numpy as np


def test_exchange_equals_groupby(ray_session):
    import ray.data as rd
    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig

    n = 300
    path = fixtures.images_parquet(n, with_bytes=False)
    ids = fixtures.image_ids(n)
    cfg = RenderConfig(0, 5)

    def run(shuffle):
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        df = build_pyramid(ds, ids, cfg, num_partitions=6, shuffle=shuffle).to_pandas()
        return df.sort_values("tile_id").reset_index(drop=True)

    a, b = run("exchange"), run("groupby")
    assert (a["tile_id"].to_numpy() == b["tile_id"].to_numpy()).all()
    assert (a["content_hash"].to_numpy() == b["content_hash"].to_numpy()).all()
    assert (a["n_features"].to_numpy() == b["n_features"].to_numpy()).all()
    for fa, fb in zip(a["feature_ids"], b["feature_ids"]):
        assert list(fa) == list(fb)


def test_tree_merge_fanin_identical(ray_session):
    """A bounded-fan-in combine tree (max_fanin) must not change the
    exchange output (segmented-merge analog of the reference's k-way
    LongMerger)."""
    from functools import partial

    import ray.data as rd

    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import (render_fragments,
                                                sample_partition_bounds)
    from planetiler_ray.stages.exchange import exchange_reduce
    from planetiler_ray.stages.reduce import reduce_partition
    from planetiler_ray.stages.render import RenderConfig

    n = 200
    path = fixtures.images_parquet(n, with_bytes=False)
    cfg = RenderConfig(0, 4)
    bounds = sample_partition_bounds(fixtures.image_ids(n), cfg, 8)
    red = partial(reduce_partition, with_feature_ids=False)

    def run(fanin):
        ds = rd.read_parquet(path, columns=["image_id"], override_num_blocks=8)
        frags = render_fragments(ds, cfg, bounds, slim=False)
        return exchange_reduce(frags, 8, red, max_fanin=fanin) \
            .to_pandas().sort_values("tile_id").reset_index(drop=True)

    a, b = run(64), run(2)
    assert a["tile_id"].equals(b["tile_id"])
    assert a["content_hash"].equals(b["content_hash"])
    assert a["n_features"].equals(b["n_features"])


def test_segmented_exchange_identical(ray_session):
    """The segmented exchange (splitter actors own piece refs, bucket
    coordinator tasks own reduce intermediates — driver holds no piece
    refs) must produce exactly the flat exchange's output, including
    with a parts_to_run subset (resume path)."""
    from functools import partial

    import ray.data as rd

    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import (render_fragments,
                                                sample_partition_bounds)
    from planetiler_ray.stages.exchange import exchange_reduce
    from planetiler_ray.stages.reduce import reduce_partition
    from planetiler_ray.stages.render import RenderConfig

    n = 200
    path = fixtures.images_parquet(n, with_bytes=False)
    cfg = RenderConfig(0, 4)
    bounds = sample_partition_bounds(fixtures.image_ids(n), cfg, 11)
    red = partial(reduce_partition, with_feature_ids=False)

    def run(threshold, parts=None):
        ds = rd.read_parquet(path, columns=["image_id"], override_num_blocks=8)
        frags = render_fragments(ds, cfg, bounds, slim=False)
        return exchange_reduce(frags, 11, red, parts_to_run=parts,
                               two_level_threshold=threshold) \
            .to_pandas().sort_values("tile_id").reset_index(drop=True)

    flat, two = run(1 << 30), run(1)          # force both paths
    assert flat["tile_id"].equals(two["tile_id"])
    assert flat["content_hash"].equals(two["content_hash"])

    sub = np.array([2, 5, 9])
    flat_s, two_s = run(1 << 30, parts=sub), run(1, parts=sub)
    assert flat_s["tile_id"].equals(two_s["tile_id"])
    assert flat_s["content_hash"].equals(two_s["content_hash"])


def test_segmented_full_pipeline_identical(ray_session, monkeypatch):
    """Forcing the whole pyramid through the segmented exchange
    (GRAFT_EXCHANGE_SEGMENT_THRESHOLD=1) — including the checkpointed
    resume path and the fused map-side write — must reproduce the flat
    exchange's archive exactly."""
    import shutil
    import tempfile

    import ray.data as rd

    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig

    n = 300
    path = fixtures.images_parquet(n, with_bytes=False)
    ids = fixtures.image_ids(n)
    cfg = RenderConfig(0, 5)

    def run(threshold, fused=False, checkpoint=False):
        monkeypatch.setenv("GRAFT_EXCHANGE_SEGMENT_THRESHOLD", str(threshold))
        monkeypatch.setenv("GRAFT_FUSED_EXCHANGE", "1" if fused else "0")
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        ckpt = tempfile.mkdtemp(prefix="seg_ckpt_") if checkpoint else None
        try:
            if checkpoint:
                from planetiler_ray.state.checkpoint import CheckpointStore
                build_pyramid(ds, ids, cfg, num_partitions=6,
                              checkpoint_dir=ckpt)
                files = CheckpointStore(ckpt).data_files()
                df = rd.read_parquet(files).to_pandas()
                df = df[["tile_id", "content_hash", "n_features"]]
            else:
                df = build_pyramid(ds, ids, cfg, num_partitions=6).to_pandas()
                df = df[["tile_id", "content_hash", "n_features"]]
            return df.sort_values("tile_id").reset_index(drop=True)
        finally:
            if ckpt:
                shutil.rmtree(ckpt, ignore_errors=True)

    flat = run(1 << 30)
    seg = run(1)
    seg_fused = run(1, fused=True)
    seg_ckpt = run(1, checkpoint=True)
    for other in (seg, seg_fused, seg_ckpt):
        assert flat["tile_id"].equals(other["tile_id"])
        assert flat["content_hash"].equals(other["content_hash"])
        assert flat["n_features"].equals(other["n_features"])


def test_fused_map_side_split_identical(ray_session, monkeypatch):
    """The fused map-side shuffle write (GRAFT_FUSED_EXCHANGE=1: the
    fan-out runs inside the split task) must produce a pyramid
    identical to the pipelined default."""
    import ray.data as rd

    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig

    n = 300
    path = fixtures.images_parquet(n, with_bytes=False)
    ids = fixtures.image_ids(n)
    cfg = RenderConfig(0, 5)

    def run(fused):
        monkeypatch.setenv("GRAFT_FUSED_EXCHANGE", "1" if fused else "0")
        ds = rd.read_parquet(path, columns=["image_id", "caption", "phash"])
        df = build_pyramid(ds, ids, cfg, num_partitions=6).to_pandas()
        return df.sort_values("tile_id").reset_index(drop=True)

    a, b = run(True), run(False)
    assert (a["tile_id"].to_numpy() == b["tile_id"].to_numpy()).all()
    assert (a["content_hash"].to_numpy() == b["content_hash"].to_numpy()).all()
    assert (a["n_features"].to_numpy() == b["n_features"].to_numpy()).all()


def test_q16_wire_roundtrip_matches_reduce_quantization():
    """int16 wire coords must reproduce the reduce's f64 quantization
    bit-for-bit across the whole representable px range."""
    import numpy as np

    from planetiler_ray.stages.render import _q16
    from planetiler_ray.tilemath.mvt import SCALE

    rng = np.random.default_rng(7)
    px = np.concatenate([rng.uniform(-8, 264, 20000).astype(np.float32),
                         np.array([-4.0, 0.0, 255.99999, 256.0, 260.0],
                                  np.float32)])
    q = _q16(px)
    # direct quantization (what the reduce did pre-wire-format)
    direct = np.floor(px.astype(np.float64) * SCALE + 0.5).astype(np.int64)
    # wire round trip: int16 -> px float -> re-quantize (reduce._px + q())
    back = q.astype(np.float64) / SCALE
    again = np.floor(back * SCALE + 0.5).astype(np.int64)
    assert (q == direct).all()
    assert (again == direct).all()


def test_segmented_exchange_errors_propagate(ray_session):
    """A failure anywhere in the segmented split/reduce path must fail
    the exchange loudly — never complete with rows silently missing
    (regression class: discarded splitter submit refs swallowed
    exceptions)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from planetiler_ray.stages.exchange import exchange_reduce

    def mk(batch):
        i = batch["id"].to_numpy()
        return pa.table({"part": pa.array(i % 8), "v": pa.array(i)})

    frags = rd.range(4000, override_num_blocks=16) \
        .map_batches(mk, batch_format="pyarrow").materialize()

    def bad_map(t: pa.Table) -> pa.Table:
        raise RuntimeError("injected map failure")

    with pytest.raises(Exception, match="injected map failure"):
        exchange_reduce(frags, 8, lambda t: t.slice(0, 1),
                        two_level_threshold=1, map_fn=bad_map).to_pandas()

    def bad_reduce(t: pa.Table) -> pa.Table:
        raise RuntimeError("injected reduce failure")

    with pytest.raises(Exception, match="injected reduce failure"):
        exchange_reduce(frags, 8, bad_reduce,
                        two_level_threshold=1).to_pandas()

    # and the healthy path still returns every row exactly once
    out = exchange_reduce(frags, 8, lambda t: pa.table(
        {"n": pa.array([t.num_rows])}), two_level_threshold=1).to_pandas()
    assert int(out["n"].sum()) == 4000
