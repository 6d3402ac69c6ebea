"""Golden round-trip tests for the real MVT protobuf encoder.

The vectorized encoder (``tilemath/mvt_pb.py``) is checked against the
independent sequential decoder, and framing against hand-computed
protobuf bytes — the interop contract of ``VectorTile.java:97-210``.
"""

import numpy as np
import pytest

from planetiler_ray.tilemath import mvt_pb as M
from planetiler_ray.tilemath.varint import (decode_varints, encode_varints,
                                            unzigzag, varint_lengths, zigzag)


def test_varint_round_trip():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1],
                 dtype=np.uint64)
    buf, lens = encode_varints(v)
    assert (lens == varint_lengths(v)).all()
    dec, end = decode_varints(buf.tobytes(), 0, len(v))
    assert end == len(buf)
    assert (dec == v).all()


def test_varint_known_bytes():
    # protobuf spec examples: 1 → 0x01, 300 → 0xAC 0x02
    buf, _ = encode_varints(np.array([1, 300], dtype=np.uint64))
    assert buf.tobytes() == b"\x01\xac\x02"


def test_zigzag_round_trip():
    v = np.array([0, -1, 1, -2, 2, 2**31, -(2**31), 2**62, -(2**62)])
    assert (unzigzag(zigzag(v)) == v).all()
    # spec vectors: 0→0, -1→1, 1→2, -2→3
    assert zigzag(np.array([0, -1, 1, -2])).tolist() == [0, 1, 2, 3]


def _encode_one_point(px=25.0, py=17.0, fid=7, attrs=None):
    tids, blobs = M.encode_tile_batch(
        np.array([1]), np.array([1], np.int8), np.array([M.KIND_POINT], np.int8),
        np.array([fid]), np.array([px]), np.array([py]),
        np.array([np.nan]), np.array([np.nan]),
        {1: "labels"}, attrs)
    return tids, blobs[0].as_py()


def test_point_round_trip():
    tids, blob = _encode_one_point()
    assert tids.tolist() == [1]
    t = M.decode_tile(blob)
    lay = t["labels"]
    assert lay["version"] == 2 and lay["extent"] == 4096
    (f,) = lay["features"]
    assert f["id"] == 7 and f["type"] == 1
    g = f["geometry"]
    assert g[0] == 9  # MoveTo ×1
    assert unzigzag(np.array([g[1]]))[0] == 25 * 16
    assert unzigzag(np.array([g[2]]))[0] == 17 * 16


def test_box_ring_and_attrs():
    tids, blobs = M.encode_tile_batch(
        np.array([42]), np.array([0], np.int8), np.array([M.KIND_BOX], np.int8),
        np.array([123456789]), np.array([-4.0]), np.array([0.0]),
        np.array([260.0]), np.array([256.0]),
        {0: "chips"}, {"caption": np.array(["a caption"]),
                       "fmt": np.array(["png"])})
    t = M.decode_tile(blobs[0].as_py())
    lay = t["chips"]
    (f,) = lay["features"]
    assert f["type"] == 3
    g = f["geometry"]
    # MoveTo(1), 2 params, LineTo(3), 6 params, ClosePath
    assert g[0] == 9 and g[3] == 26 and g[10] == 15
    x0, y0 = unzigzag(np.array(g[1:3]))
    dx, _, _, dy, ndx, _ = unzigzag(np.array(g[4:10]))
    assert (x0, y0) == (-64, 0)
    assert dx == 260 * 16 + 64 and dy == 256 * 16 and ndx == -dx
    at = M.decode_feature_attrs(lay, f)
    assert at == {"caption": "a caption", "fmt": "png"}
    assert lay["keys"] == ["caption", "fmt"]


def test_multi_tile_multi_layer_order():
    # fragments sorted by (tile, layer) — encoder must keep tile order
    n = 6
    tids, blobs = M.encode_tile_batch(
        np.array([3, 3, 3, 9, 9, 11]),
        np.array([0, 0, 1, 0, 1, 1], np.int8),
        np.array([0, 0, 1, 0, 1, 1], np.int8),
        np.arange(n), np.zeros(n), np.zeros(n),
        np.full(n, 10.0), np.full(n, 10.0),
        {0: "chips", 1: "labels"},
        {"caption": np.array([f"c{i}" for i in range(n)])})
    assert tids.tolist() == [3, 9, 11]
    t3 = M.decode_tile(blobs[0].as_py())
    assert [f["id"] for f in t3["chips"]["features"]] == [0, 1]
    assert [f["id"] for f in t3["labels"]["features"]] == [2]
    t11 = M.decode_tile(blobs[2].as_py())
    assert list(t11.keys()) == ["labels"]
    at = M.decode_feature_attrs(t11["labels"], t11["labels"]["features"][0])
    assert at["caption"] == "c5"


def test_empty_batch():
    tids, blobs = M.encode_tile_batch(
        np.empty(0, np.int64), np.empty(0, np.int8), np.empty(0, np.int8),
        np.empty(0, np.int64), np.empty(0), np.empty(0), np.empty(0),
        np.empty(0), {0: "chips"})
    assert len(tids) == 0 and len(blobs) == 0


def test_utf8_attrs():
    _, blob = _encode_one_point(attrs={"caption": np.array(["wörld — ütf8"])})
    lay = M.decode_tile(blob)["labels"]
    at = M.decode_feature_attrs(lay, lay["features"][0])
    assert at["caption"] == "wörld — ütf8"


def test_long_line_does_not_corrupt_following_features():
    """Regression: geometry-int slots beyond the old fixed 64-per-feature
    stride used to spill into the next feature's byte range."""
    import numpy as np

    from planetiler_ray.tilemath.mvt_pb import (KIND_LINE,
                                                decode_tile,
                                                encode_tile_batch)

    for nv1 in (19, 40, 200):
        vx = np.concatenate([np.linspace(0, 100, nv1), [10, 20, 30]])
        vy = np.concatenate([np.linspace(0, 50, nv1), [5, 6, 7]])
        voff = np.array([0, nv1, nv1 + 3], np.int64)
        tid = np.array([7, 7], np.int64)
        _, blobs = encode_tile_batch(
            tid, np.array([2, 2], np.int8),
            np.array([KIND_LINE, KIND_LINE], np.int8),
            np.array([1, 2], np.int64), np.zeros(2), np.zeros(2),
            np.zeros(2), np.zeros(2), {2: "lines"},
            line_verts=(vx, vy, voff))
        f = decode_tile(blobs[0].as_py())["lines"]["features"]
        assert [ft["id"] for ft in f] == [1, 2]
        assert len(f[0]["geometry"]) == 2 + 2 * nv1
        assert len(f[1]["geometry"]) == 8


def test_null_and_empty_attrs_omitted():
    """Null / empty attr values never reach the tile: no tag pair, no
    'None' string, no value-table entry (reference omits unset attrs;
    round-2 ADVICE: Arrow nulls were stringified to 'None')."""
    import numpy as np
    import pyarrow as pa
    from planetiler_ray.tilemath.mvt_pb import (decode_feature_attrs,
                                                decode_tile,
                                                encode_tile_batch)

    tid = np.array([5, 5, 9], np.int64)
    layer = np.zeros(3, np.int8)
    kind = np.ones(3, np.int8)            # points
    fid = np.array([1, 2, 3], np.int64)
    ax = np.array([10.0, 20.0, 30.0])
    ay = np.array([10.0, 20.0, 30.0])
    nan = np.full(3, np.nan)
    attrs = {"name": np.array(["alpha", None, None], object),
             "cls": np.array([None, "x", None], object)}
    utid, blobs = encode_tile_batch(tid, layer, kind, fid, ax, ay, nan, nan,
                                    {0: "pts"}, attrs)
    t5 = decode_tile(blobs[0].as_py())["pts"]
    t9 = decode_tile(blobs[1].as_py())["pts"]
    a1 = decode_feature_attrs(t5, t5["features"][0])
    a2 = decode_feature_attrs(t5, t5["features"][1])
    a3 = decode_feature_attrs(t9, t9["features"][0])
    assert a1 == {"name": "alpha"}
    assert a2 == {"cls": "x"}
    assert a3 == {}                        # all attrs absent → no tags
    assert "None" not in t5["values"] and "" not in t5["values"]
    assert t9["values"] == []              # unused values dropped per layer
