"""Traffic-weighted tile stats (functions.tileweights) — reference
semantics of ``util/TileWeights.java`` (accumulating put, gzipped TSV
round trip, zoom totals) and
``util/TilesetSummaryStatistics.java:129-190,320-345`` (weighted
average per zoom; overall average rescaled by each zoom's share of the
global zoom weight) with hand-computed goldens."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from planetiler_ray.functions.tileweights import (TileWeights,
                                                  weighted_tile_size_stats)
from planetiler_ray.tilemath.tilecoord import tms_encode


def tid(z, x, y):
    return int(tms_encode(np.array([x]), np.array([y]), np.array([z]))[0])


def test_tileweights_put_lookup_tsv_roundtrip(tmp_path):
    w = TileWeights()
    w.put(2, 1, 1, 10).put(2, 1, 1, 5).put(3, 4, 4, 7)   # merge-sum
    ids = np.array([tid(2, 1, 1), tid(3, 4, 4), tid(3, 0, 0)])
    assert w.get_weight(ids).tolist() == [15, 7, 0]
    assert w.zoom_weight(2) == 15 and w.zoom_weight(3) == 7
    p = str(tmp_path / "weights.tsv.gz")
    w.write(p)
    w2 = TileWeights.load(p)
    assert w2.get_weight(ids).tolist() == [15, 7, 0]
    assert w2.zoom_weight(2) == 15
    assert TileWeights.load(str(tmp_path / "missing.tsv.gz")).empty


def test_weighted_stats_golden(ray_session):
    # z1: tiles of 100 and 300 bytes, weights 3 and 1
    # z2: tiles of 50 and 70 bytes, weights 0 and 2
    rows = [(1, 0, 0, 100), (1, 1, 0, 300), (2, 0, 0, 50), (2, 1, 1, 70)]
    w = TileWeights()
    w.put(1, 0, 0, 3).put(1, 1, 0, 1).put(2, 1, 1, 2)
    tbl = pa.table({
        "tile_id": pa.array([tid(z, x, y) for z, x, y, _ in rows],
                            pa.int64()),
        "z": pa.array([r[0] for r in rows], pa.int8()),
        "tile_bytes": pa.array([b"x" * r[3] for r in rows], pa.binary()),
    })
    out = weighted_tile_size_stats(ray.data.from_arrow(tbl), w, top_n=2)
    # per-zoom weighted averages: z1 = (100*3+300*1)/4 = 150;
    # z2 = (70*2)/2 = 70
    assert out["per_zoom"][1]["weighted_avg_bytes"] == pytest.approx(150.0)
    assert out["per_zoom"][2]["weighted_avg_bytes"] == pytest.approx(70.0)
    assert out["per_zoom"][1]["avg_bytes"] == pytest.approx(200.0)
    # overall: zoom shares 4/6 and 2/6 → 150*2/3 + 70*1/3 = 123.33
    assert out["weighted_avg_bytes"] == pytest.approx(150 * 4 / 6
                                                      + 70 * 2 / 6)
    # top by traffic weight: (z1,0,0) w=3 then (z2,1,1) w=2
    assert [(t[1], t[3]) for t in out["top_weighted_tiles"]] == \
        [(1, 3), (2, 2)]


def test_weighted_stats_no_weights_falls_back_to_plain_average(ray_session):
    tbl = pa.table({
        "tile_id": pa.array([tid(1, 0, 0), tid(1, 1, 0)], pa.int64()),
        "z": pa.array([1, 1], pa.int8()),
        "tile_bytes": pa.array([b"x" * 10, b"x" * 30], pa.binary()),
    })
    out = weighted_tile_size_stats(ray.data.from_arrow(tbl), TileWeights())
    assert out["per_zoom"][1]["weighted_avg_bytes"] == pytest.approx(20.0)
    assert out["weighted_avg_bytes"] == pytest.approx(20.0)
    assert out["top_weighted_tiles"] == []
