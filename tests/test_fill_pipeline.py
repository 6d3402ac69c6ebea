"""End-to-end planet-polygon pipeline: striped clip → boundary-tile MVT
through the hash exchange + run-native interior fills into the sharded
archive.  Cross-checked per zoom against the bbox kernel (forced) on
the same geometry."""

import json
import os

import numpy as np
import pytest

OCEAN = dict(X0=0.1, X1=0.85, Y0=0.3, Y1=0.7,
             H0=0.35, H1=0.55, G0=0.4, G1=0.6)


def _ocean_rings():
    o = OCEAN
    px = np.array([o["X0"], o["X1"], o["X1"], o["X0"],
                   o["H0"], o["H1"], o["H1"], o["H0"]])
    py = np.array([o["Y0"], o["Y0"], o["Y1"], o["Y1"],
                   o["G0"], o["G0"], o["G1"], o["G1"]])
    return px, py, np.array([0, 4, 8]), np.array([0, 0])


def _bbox_kernel_counts(z):
    """Independent per-zoom (edge, fill) tile counts via the bbox
    Sutherland–Hodgman kernel (striped escape disabled)."""
    import planetiler_ray.tilemath.clip as C

    px, py, offs, _ = _ocean_rings()
    s = float(1 << z)
    old = C.STRIPE_RING_TILES
    try:
        C.STRIPE_RING_TILES = 10 ** 9
        r = C.slice_polygons(px * s, py * s, offs, z, 4 / 256.0)
    finally:
        C.STRIPE_RING_TILES = old
    keys = r["x"] * (np.int64(1) << 40) + r["y"]
    outer = r["row"] == 0
    # grouped-polygon semantics (hole belongs to the outer): interior
    # fill = outer full-window tiles minus ANY tile the hole touches
    # (its boundary detail or its interior) and minus outer detail
    outer_fill = np.unique(keys[outer & r["is_fill"]])
    outer_detail = np.unique(keys[outer & ~r["is_fill"]])
    hole_any = np.unique(keys[~outer])
    fill_only = np.setdiff1d(np.setdiff1d(outer_fill, outer_detail),
                             hole_any)
    # edge tiles = outer detail + hole boundary detail (the hole's
    # boundary inside the filled region renders as detail tiles)
    hole_detail = np.unique(keys[~outer & ~r["is_fill"]])
    edge = np.union1d(outer_detail, hole_detail)
    return len(edge), len(fill_only)


def test_polygon_fill_archive_end_to_end(ray_session, tmp_path):
    from planetiler_ray.pipelines.tiles import polygon_fill_archive
    from planetiler_ray.sinks import read_sharded_archive_tile
    from planetiler_ray.tilemath.mvt_pb import decode_tile
    from planetiler_ray.tilemath.tilecoord import (hilbert_encode_tile,
                                                   tms_encode)

    px, py, offs, por = _ocean_rings()
    min_z, max_z = 0, 7
    out = str(tmp_path / "ocean")
    info = polygon_fill_archive(px, py, offs, por, min_z, max_z, out,
                                num_shards=4)

    # totals match the independent bbox kernel per zoom
    exp_edge = exp_fill = 0
    for z in range(min_z, max_z + 1):
        e, f = _bbox_kernel_counts(z)
        exp_edge += e
        exp_fill += f
    assert info["n_fill_tiles"] == exp_fill
    assert info["n_tiles"] == exp_edge + exp_fill
    # one polygon set: interior and boundary tiles are disjoint, so the
    # written count equals the raw run expansion
    assert info["n_fill_expanded"] == info["n_fill_tiles"]
    # runs compress the interior: far fewer runs than tiles
    assert info["n_runs"] < exp_fill / 3

    # interior tile random access: decodes to the canonical full-window
    # square in the named layer
    z = 7
    s = 1 << z
    ix = int(0.45 * s)
    iy = int(0.65 * s)          # inside outer, outside hole
    tid = int(tms_encode(np.array([ix]), np.array([iy]),
                         np.array([z]))[0])
    hid = int(hilbert_encode_tile(np.array([ix]), np.array([iy]), z)[0])
    layers = decode_tile(read_sharded_archive_tile(out, tid, hid))
    assert "water" in layers
    assert len(layers["water"]["features"]) == 1

    # boundary tile decodes with clipped detail
    bx = int(OCEAN["X0"] * s)
    by = int(0.5 * s)
    tidb = int(tms_encode(np.array([bx]), np.array([by]),
                          np.array([z]))[0])
    hidb = int(hilbert_encode_tile(np.array([bx]), np.array([by]), z)[0])
    layersb = decode_tile(read_sharded_archive_tile(out, tidb, hidb))
    assert "water" in layersb

    # the archive stores the fill blob once per part, not per tile
    root = json.load(open(os.path.join(out, "root.json")))
    total_blobs = sum(sh["n_blobs"] for sh in root["shards"])
    assert total_blobs < info["n_tiles"] / 10


def _ring_count(feature) -> int:
    """Count rings in a decoded MVT polygon feature (ClosePath cmds)."""
    g = feature["geometry"]
    i = rings = 0
    while i < len(g):
        cmd = g[i]
        cid, cnt = cmd & 7, cmd >> 3
        if cid == 7:
            rings += cnt
            i += 1
        else:
            i += 1 + 2 * cnt
    return rings


def test_hole_joins_its_polygon_feature(ray_session, tmp_path):
    """A tile holding the polygon's interior fill AND a hole fragment
    decodes to ONE multi-ring water feature — not two stacked polygons
    (MVT 2.1 §4.3.4.4: interior rings follow their exterior)."""
    from planetiler_ray.pipelines.tiles import polygon_fill_archive
    from planetiler_ray.sinks import read_sharded_archive_tile
    from planetiler_ray.tilemath.mvt_pb import decode_tile
    from planetiler_ray.tilemath.tilecoord import (hilbert_encode_tile,
                                                   tms_encode)

    px, py, offs, por = _ocean_rings()
    z = 7
    out = str(tmp_path / "ocean_hole")
    polygon_fill_archive(px, py, offs, por, z, z, out, num_shards=2)

    s = 1 << z
    # a tile crossed by the hole boundary, interior to the outer ring
    hx = int(OCEAN["H0"] * s)
    hy = int(0.5 * s)
    tid = int(tms_encode(np.array([hx]), np.array([hy]), np.array([z]))[0])
    hid = int(hilbert_encode_tile(np.array([hx]), np.array([hy]), z)[0])
    layers = decode_tile(read_sharded_archive_tile(out, tid, hid))
    feats = layers["water"]["features"]
    assert len(feats) == 1, \
        f"hole fragment must merge into its polygon's feature, got {len(feats)}"
    assert _ring_count(feats[0]) >= 2
