"""Stripe clip with range-tracked interior fill (tilemath.stripeclip).

Gates: (1) per-tile output equivalence with the bbox Sutherland–Hodgman
kernel on random polygons (modulo the zero-area boundary slivers the
bbox kernel emits and the reference drops), (2) hole semantics (parity
subtraction + inferred fill squares), (3) the closed-form
rectangle-with-hole tile classification that the ``ocean_fill_tiles``
SQL oracle mirrors, across z0..z12, and (4) the scale property: work
∝ boundary crossings, never bbox area (``render/TiledGeometry.java``
``:406-699`` semantics)."""

import numpy as np
import pytest

from planetiler_ray.tilemath.clip import (NEIGHBOR_BUFFER_EPS,
                                          slice_polygons)
from planetiler_ray.tilemath.stripeclip import slice_polygons_striped

BUF = 4 / 256


def _canon(x, y):
    pts = list(zip(np.round(x, 6), np.round(y, 6)))
    n = len(pts)
    best = min(range(n), key=lambda i: pts[i:] + pts[:i])
    return tuple(pts[best:] + pts[:best])


def _frags_by_tile(r, drop_slivers):
    out = {}
    po = r["part_offsets"]
    for i in range(len(r["row"])):
        x = r["vx"][po[i]:po[i + 1]]
        y = r["vy"][po[i]:po[i + 1]]
        area = 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
        if drop_slivers and area < 1e-6:
            continue
        key = (int(r["row"][i]), int(r["x"][i]), int(r["y"][i]))
        out.setdefault(key, []).append((_canon(x, y), bool(r["is_fill"][i])))
    return out


def _expand_fills(r, frags):
    bpx = BUF * 256
    sq = _canon(np.array([-bpx, 256 + bpx, 256 + bpx, -bpx]),
                np.array([-bpx, -bpx, 256 + bpx, 256 + bpx]))
    for p, x, y0, y1 in zip(r["fill_poly"], r["fill_x"],
                            r["fill_y0"], r["fill_y1"]):
        for y in range(int(y0), int(y1) + 1):
            frags.setdefault((int(p), int(x), int(y)), []).append((sq, True))
    return frags


def test_striped_matches_bbox_kernel_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(120):
        z = int(rng.integers(2, 7))
        n_tiles = 1 << z
        nv = int(rng.integers(3, 12))
        cx, cy = rng.uniform(0, n_tiles, 2)
        rad = rng.uniform(0.05, n_tiles / 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rr = rad * rng.uniform(0.3, 1.0, nv)
        px = np.clip(cx + rr * np.cos(ang), 0, n_tiles)
        py = np.clip(cy + rr * np.sin(ang), 0, n_tiles)
        offs = np.array([0, nv])
        a = slice_polygons(px, py, offs, z, BUF)
        b = slice_polygons_striped(px, py, offs, z, BUF)
        fa = _frags_by_tile(a, drop_slivers=True)
        fb = _expand_fills(b, _frags_by_tile(b, drop_slivers=True))
        assert set(fa) == set(fb), (trial, z)
        for k in fa:
            assert sorted(fa[k]) == sorted(fb[k]), (trial, z, k)


def test_hole_parity_and_inferred_fill():
    # outer [1,14]^2 with hole [5,10]^2 at z4 (tile units)
    px = np.array([1., 14, 14, 1, 5, 10, 10, 5])
    py = np.array([1., 1, 14, 14, 5, 5, 10, 10])
    r = slice_polygons_striped(px, py, np.array([0, 4, 8]), 4, BUF,
                               poly_of_ring=np.array([0, 0]))
    fill = set()
    for x, y0, y1 in zip(r["fill_x"], r["fill_y0"], r["fill_y1"]):
        fill.update((int(x), yy) for yy in range(int(y0), int(y1) + 1))
    # ring of fill between outer boundary and hole; hole interior empty
    assert (2, 7) in fill and (7, 2) in fill and (12, 12) in fill
    assert not any((x, y) in fill for x in range(5, 10)
                   for y in range(5, 10))
    # hole-boundary tiles inside the outer fill get the canonical
    # fill square attributed to the polygon's outer ring (row 0)
    sq = [(int(r["x"][i]), int(r["y"][i]))
          for i in range(len(r["row"])) if r["is_fill"][i]]
    assert (7, 4) in sq and (4, 7) in sq
    inf_rows = [int(r["row"][i]) for i in range(len(r["row"]))
                if r["is_fill"][i]]
    assert set(inf_rows) == {0}


# closed-form tile classification for the axis-aligned ocean rectangle
# with an island hole — the exact logic of the ocean_fill_tiles oracle
OCEAN = dict(X0=0.1, X1=0.85, Y0=0.3, Y1=0.7,
             H0=0.35, H1=0.55, G0=0.4, G1=0.6)


def ocean_expected(z: int) -> tuple[int, int]:
    """(edge_tiles, fill_tiles) for the OCEAN polygon at zoom z."""
    s = float(1 << z)
    b = BUF
    nb = BUF + NEIGHBOR_BUFFER_EPS
    X0, X1 = OCEAN["X0"] * s, OCEAN["X1"] * s
    Y0, Y1 = OCEAN["Y0"] * s, OCEAN["Y1"] * s
    H0, H1 = OCEAN["H0"] * s, OCEAN["H1"] * s
    G0, G1 = OCEAN["G0"] * s, OCEAN["G1"] * s
    fl = lambda v: int(np.floor(v))
    edge = fill = 0
    for c in range(fl(X0 - nb), fl(X1 + nb) + 1):
        xedge = (fl(X0 - nb) <= c <= fl(X0 + nb)
                 or fl(X1 - nb) <= c <= fl(X1 + nb))
        conn = (X0 < c - b) and (X1 > c + 1 + b)
        hole_col = fl(H0 - nb) <= c <= fl(H1 + nb)
        h_xedge = (fl(H0 - nb) <= c <= fl(H0 + nb)
                   or fl(H1 - nb) <= c <= fl(H1 + nb))
        h_conn = (H0 < c - b) and (H1 > c + 1 + b)
        for r in range(fl(Y0 - nb), fl(Y1 + nb) + 1):
            o_det = xedge or (fl(Y0 - nb) <= r <= fl(Y0 + nb)) \
                or (fl(Y1 - nb) <= r <= fl(Y1 + nb))
            h_det = hole_col and (
                (fl(G0 - nb) <= r <= fl(G1 + nb)) if h_xedge else
                (fl(G0 - nb) <= r <= fl(G0 + nb)
                 or fl(G1 - nb) <= r <= fl(G1 + nb)))
            if o_det or h_det:
                edge += 1
            elif conn and (fl(Y0 + nb) + 1 <= r <= fl(Y1 - nb) - 1) \
                    and not (h_conn
                             and fl(G0 + nb) + 1 <= r <= fl(G1 - nb) - 1):
                fill += 1
    return edge, fill


@pytest.mark.parametrize("z", list(range(13)))
def test_ocean_rectangle_closed_form(z):
    o = OCEAN
    s = float(1 << z)
    px = np.array([o["X0"], o["X1"], o["X1"], o["X0"],
                   o["H0"], o["H1"], o["H1"], o["H0"]]) * s
    py = np.array([o["Y0"], o["Y0"], o["Y1"], o["Y1"],
                   o["G0"], o["G0"], o["G1"], o["G1"]]) * s
    r = slice_polygons_striped(px, py, np.array([0, 4, 8]), z, BUF,
                               poly_of_ring=np.array([0, 0]))
    edges = len(set(zip(r["x"].tolist(), r["y"].tolist())))
    fills = int(np.sum(r["fill_y1"] - r["fill_y0"] + 1))
    assert (edges, fills) == ocean_expected(z), z
    # no fill run overlaps a detail tile
    det = set(zip(r["x"].tolist(), r["y"].tolist()))
    for x, y0, y1 in zip(r["fill_x"], r["fill_y0"], r["fill_y1"]):
        assert not any((int(x), yy) in det
                       for yy in range(int(y0), int(y1) + 1))


def test_candidates_scale_with_boundary_not_bbox():
    """A world-spanning polygon's candidate count grows ∝ boundary
    tile crossings (≈2^z), never bbox area (4^z)."""
    nv = 512
    t = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    cand = {}
    for z in (8, 10, 12):
        n_tiles = 1 << z
        px = n_tiles / 2 + (n_tiles / 2 - 1) * np.cos(t) * 0.9
        py = n_tiles / 2 + (n_tiles / 2 - 1) * np.sin(t) * 0.9
        r = slice_polygons_striped(px, py, np.array([0, nv]), z, BUF)
        cand[z] = r["n_candidates"]
        # candidates ≤ C · (vertices + boundary crossings); the
        # circle's boundary crosses O(2^z) tiles
        assert r["n_candidates"] < 40 * (nv + 4 * n_tiles), (z, cand)
    # growth from z10→z12 must track perimeter (×4), not area (×16)
    assert cand[12] / cand[10] < 6.0, cand


def test_slice_polygons_escape_matches_bbox_kernel():
    """Production entry point: a ring over the STRIPE_RING_TILES
    threshold routes through the striped kernel + fill expansion and
    must cover exactly the tiles (and fill set) of the bbox kernel."""
    import planetiler_ray.tilemath.clip as C

    z = 7
    s = float(1 << z)
    px = np.concatenate([np.array([0.1, 0.85, 0.85, 0.1]) * s,
                         np.array([0.35, 0.55, 0.55, 0.35]) * s])
    py = np.concatenate([np.array([0.3, 0.3, 0.7, 0.7]) * s,
                         np.array([0.4, 0.4, 0.6, 0.6]) * s])
    offs = np.array([0, 4, 8])
    r_new = C.slice_polygons(px, py, offs, z, BUF)
    old = C.STRIPE_RING_TILES
    try:
        C.STRIPE_RING_TILES = 10 ** 9          # force the bbox kernel
        r_old = C.slice_polygons(px, py, offs, z, BUF)
    finally:
        C.STRIPE_RING_TILES = old

    def frags(r):
        return set(zip(r["row"].tolist(), r["x"].tolist(),
                       r["y"].tolist(), r["is_fill"].tolist()))

    assert frags(r_new) == frags(r_old)
    assert len(r_new["row"]) == len(r_old["row"])
    # offsets consistent with the vertex stream
    assert r_new["part_offsets"][-1] == len(r_new["vx"])


def test_slice_polygons_escape_output_bounded():
    """The escape's work is bounded by output tiles, not bbox·vertices:
    a world-spanning ring with many vertices at z10 finishes fast and
    emits one fragment per covered tile."""
    import time

    import planetiler_ray.tilemath.clip as C

    z = 10
    n_tiles = 1 << z
    nv = 4096
    t = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    px = n_tiles / 2 + (n_tiles / 2 - 2) * np.cos(t)
    py = n_tiles / 2 + (n_tiles / 2 - 2) * np.sin(t)
    t0 = time.monotonic()
    r = C.slice_polygons(px, py, np.array([0, nv]), z, BUF)
    wall = time.monotonic() - t0
    # bbox kernel would be ~10^6 candidates × 4096 vertices (≈10^9);
    # the striped path emits ~π/4·2^20 fragments in seconds
    assert wall < 60.0, wall
    n_fill = int(r["is_fill"].sum())
    assert n_fill > 700_000, n_fill
    # every fragment tile unique per ring
    keys = r["x"] * (1 << z) + r["y"]
    assert len(np.unique(keys)) == len(keys)


def test_large_polygon_index_no_key_overflow():
    """Packed (poly, col, row) keys must survive huge polygon indexes at
    z14 (regression: a fixed 1<<34 shift overflowed int64 at ~28k
    polygons, silently corrupting fill-run attribution)."""
    from planetiler_ray.tilemath.stripeclip import slice_polygons_striped

    z = 14
    s = float(1 << z)
    # small square with a hole, owned by polygon index 40_000_000
    o = dict(X0=0.40, X1=0.402, Y0=0.40, Y1=0.402,
             H0=0.4005, H1=0.4015, G0=0.4005, G1=0.4015)
    px = np.array([o["X0"], o["X1"], o["X1"], o["X0"],
                   o["H0"], o["H1"], o["H1"], o["H0"]]) * s
    py = np.array([o["Y0"], o["Y0"], o["Y1"], o["Y1"],
                   o["G0"], o["G0"], o["G1"], o["G1"]]) * s
    offs = np.array([0, 4, 8])
    big = 40_000_000
    r = slice_polygons_striped(px, py, offs, z, 4 / 256.0,
                               poly_of_ring=np.array([big, big]))
    r0 = slice_polygons_striped(px, py, offs, z, 4 / 256.0,
                                poly_of_ring=np.array([0, 0]))
    # identical tile sets and fill runs regardless of the polygon index
    k = lambda rr: sorted(zip(rr["x"].tolist(), rr["y"].tolist()))  # noqa: E731
    assert k(r) == k(r0)
    fk = lambda rr: sorted(zip(rr["fill_x"].tolist(),               # noqa: E731
                               rr["fill_y0"].tolist(),
                               rr["fill_y1"].tolist()))
    assert fk(r) == fk(r0)
    assert (np.asarray(r["fill_x"]) >= 0).all()
