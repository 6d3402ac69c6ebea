"""Unit checks behind the queries_geom driver suite.

- the SQL oracle's closed-form bbox ring area must equal
  ``tilemath.measure.ring_area_meters`` on the same closed 5-point ring
- a scrambled path of 2-point segments merges back to ONE polyline
  with every vertex (the line_merge_chains invariant)
- partialLine(0.25, 0.75) has exactly half the total length
"""

import numpy as np
import pytest


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_box_ring_area_closed_form(seed):
    from planetiler_ray.tilemath.measure import (AREA_FACTOR,
                                                 ring_area_meters)
    rng = np.random.default_rng(seed)
    x0, y0 = rng.uniform(-170, 160), rng.uniform(-70, 60)
    x1, y1 = x0 + rng.uniform(0.01, 20), y0 + rng.uniform(0.01, 20)
    lons = np.array([x0, x1, x1, x0, x0])
    lats = np.array([y0, y0, y1, y1, y0])
    got = ring_area_meters(lons, lats)
    r = np.pi / 180
    closed = abs(2 * (x1 - x0) * r * (np.sin(y0 * r) - np.sin(y1 * r))) \
        * AREA_FACTOR
    assert got == pytest.approx(closed, rel=1e-12)


@pytest.mark.parametrize("n,seed", [(2, 0), (5, 1), (40, 2), (200, 3)])
def test_scrambled_path_merges_to_one_line(n, seed):
    from planetiler_ray.stages.merge import merge_lines
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 4096, size=(n, 2))
    pts = np.floor(pts * 16 + 0.5) / 16
    # distinct vertices required for a clean path graph
    pts = np.unique(pts, axis=0)
    rng.shuffle(pts)
    n = len(pts)
    segs = [pts[i:i + 2].copy() for i in range(n - 1)]
    order = rng.permutation(n - 1)
    merged = merge_lines([segs[i] for i in order], precision=0.0)
    assert len(merged) == 1
    assert len(merged[0]) == n
    want = float(np.hypot(*np.diff(pts, axis=0).T).sum())
    got = float(np.hypot(*np.diff(merged[0], axis=0).T).sum())
    assert got == pytest.approx(want, rel=1e-12)


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_partial_line_half_length(seed):
    from planetiler_ray.tilemath.geomfn import partial_line
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, size=(30, 2))
    part = partial_line(coords, 0.25, 0.75)
    d = np.diff(coords, axis=0)
    total = np.hypot(d[:, 0], d[:, 1]).sum()
    dp = np.diff(part, axis=0)
    assert np.hypot(dp[:, 0], dp[:, 1]).sum() == pytest.approx(
        0.5 * total, rel=1e-9)


def test_sortkey_full_range_roundtrip():
    from planetiler_ray.tilemath.sortkey import (SORT_KEY_MAX, SORT_KEY_MIN,
                                                 decode_key, encode_key)
    tile = np.array([0, 1, (1 << 33) - 1, 12345], dtype=np.int64)
    layer = np.array([0, 255, 7, 250], dtype=np.int64)
    sk = np.array([SORT_KEY_MIN, SORT_KEY_MAX, 0, -17], dtype=np.int64)
    hg = np.array([0, 1, 1, 0], dtype=np.int64)
    key = encode_key(tile, layer, sk, hg)
    t, l, s, h = decode_key(key)
    np.testing.assert_array_equal(t, tile)
    np.testing.assert_array_equal(l, layer)
    np.testing.assert_array_equal(s, sk)
    np.testing.assert_array_equal(h.astype(np.int64), hg)
