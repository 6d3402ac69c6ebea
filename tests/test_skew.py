"""Skew handling: the hotspot fixture (30% of chips in 5 city boxes)
must not create unbalanced Hilbert range partitions."""

import numpy as np


def test_partition_balance_under_hotspots(ray_session):
    import ray.data as rd
    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import (render_fragments,
                                                sample_partition_bounds)
    from planetiler_ray.stages.render import RenderConfig

    n = 20000
    path = fixtures.images_parquet(n, with_bytes=False)
    ids = fixtures.image_ids(n)
    cfg = RenderConfig(0, 14)
    num_parts = 32
    bounds = sample_partition_bounds(ids, cfg, num_parts)
    assert len(bounds) >= num_parts - 2  # quantiles didn't collapse

    ds = rd.read_parquet(path, columns=["image_id"])
    frags = render_fragments(ds, cfg, bounds, slim=True)
    counts = frags.groupby("part").count().to_pandas()
    c = counts["count()"].to_numpy()
    assert len(c) >= num_parts - 2
    med = np.median(c)
    # equal-frequency bounds: the largest partition stays within a small
    # factor of the median despite 30% of points landing in 5 tiny boxes
    assert c.max() <= 4 * med, (c.max(), med)
    assert c.min() >= med / 8


def test_hotspot_tiles_are_dense_but_limited(ray_session):
    """The label-grid limit caps what a dense z-low tile can hold."""
    import ray.data as rd
    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig, LABEL_GRID_LIMIT

    n = 5000
    path = fixtures.images_parquet(n, with_bytes=False)
    ds = rd.read_parquet(path, columns=["image_id"])
    tiles = build_pyramid(ds, fixtures.image_ids(n), RenderConfig(0, 6),
                          num_partitions=8, with_feature_ids=False).to_pandas()
    # z0 has one tile; the grid is 8×8 squares of 32px (+2 extra gy rows
    # for the clamp-edge fixtures with cy∈[-0.05,1.05]) → ≤ 80·limit
    z0 = tiles[tiles["z"] == 0]
    assert len(z0) == 1
    assert int(z0["n_features"].iloc[0]) <= 80 * LABEL_GRID_LIMIT
    # low-zoom tiles as a whole are bounded by the grid, not by n
    z2 = tiles[tiles["z"] == 2]
    assert (z2["n_features"] <= 100 * LABEL_GRID_LIMIT).all()
