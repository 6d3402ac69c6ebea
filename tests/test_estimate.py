"""Upfront resource estimation (state/estimate.py —
``Planetiler.java:998-1065`` checkDiskSpace/checkMemory analog)."""

import numpy as np
import pytest


def _images(n):
    import ray.data as rd
    from planetiler_ray import fixtures
    path = fixtures.images_parquet(n, with_bytes=False)
    return rd.read_parquet(path, columns=["image_id"])


def test_estimate_measures_sample_fanout(ray_session):
    from planetiler_ray.stages.render import RenderConfig
    from planetiler_ray.state.estimate import estimate_pyramid

    images = _images(400)
    cfg = RenderConfig(0, 6)
    est = estimate_pyramid(images, cfg, num_partitions=8, sample_rows=200)
    assert est.input_rows == 400
    assert est.sampled_rows == 200
    # every image lands in >= 1 tile per zoom level it survives to
    assert est.fanout_factor > 1.0
    assert est.fragment_rows == int(400 * est.fanout_factor)
    assert est.shuffle_bytes == est.fragment_rows * 35
    assert est.per_partition_bytes == est.shuffle_bytes // 8
    s = est.summary()
    assert s["input_rows"] == 400 and s["num_partitions"] == 8

    # sane numbers pass the limit check without warnings-as-errors
    est.check_against_limits()


def test_estimate_fail_fast_and_force(ray_session):
    from planetiler_ray.stages.render import RenderConfig
    from planetiler_ray.state.estimate import (ResourceLimitError,
                                               estimate_pyramid)

    images = _images(300)
    cfg = RenderConfig(0, 5)
    est = estimate_pyramid(images, cfg, num_partitions=4, sample_rows=100)
    # shrink "capacity" so the plan cannot fit
    est.object_store_bytes = 1024
    est.worker_heap_bytes = 1024
    with pytest.raises(ResourceLimitError, match="object store"):
        est.check_against_limits()
    # --force downgrades to warnings (reference behavior)
    est.warnings.clear()
    est.check_against_limits(force=True)
    assert any("object store" in w for w in est.warnings)
    assert any("reduce partition" in w for w in est.warnings)
