"""PolyFileReader + TileExtents polygon shape mask.

The mask must equal a brute-force "tile box intersects the polygon"
computation over the full tile grid — the same closed-form predicate
the DuckDB oracle for ``tile_extents_filter`` evaluates (L1 box
distance for a diamond), so this test is also the proof the SQL
oracle and the striped-clip rasterization agree tile-for-tile.
"""

import numpy as np
import pytest

from planetiler_ray.sources.polyfile import (PolyFileFormatError, parse_poly)
from planetiler_ray.tilemath.extents import TileExtents
from planetiler_ray.tilemath.projection import (get_world_lat,
                                                get_world_lon, get_world_x,
                                                get_world_y)
from planetiler_ray.tilemath.shapemask import ShapeMask

# world-space diamond |x-CX| + |y-CY| <= R with a smaller hole diamond
CX, CY, R = 0.513, 0.462, 0.19
HR = 0.07


def _diamond_poly_text(with_hole=True) -> str:
    def ring(cx, cy, r):
        pts = [(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)]
        return "\n".join(f"   {get_world_lon(x)!r}   {get_world_lat(y)!r}"
                         for x, y in pts)

    out = ["test-area", "area1", ring(CX, CY, R), "END"]
    if with_hole:
        out += ["!hole1", ring(CX, CY, HR), "END"]
    out.append("END")
    return "\n".join(out) + "\n"


def _expected(z: int, with_hole=True) -> np.ndarray:
    """Brute force: tile covered iff its box intersects outer \\ hole."""
    n = 1 << z
    i = np.arange(n)
    x0 = (i / n)[:, None] + np.zeros((1, n))
    y0 = (i / n)[None, :] + np.zeros((n, 1))
    x1, y1 = x0 + 1.0 / n, y0 + 1.0 / n
    near = (np.maximum(np.maximum(x0 - CX, CX - x1), 0)
            + np.maximum(np.maximum(y0 - CY, CY - y1), 0))
    hit_outer = near <= R
    if not with_hole:
        return hit_outer
    far = (np.maximum(np.abs(x0 - CX), np.abs(x1 - CX))
           + np.maximum(np.abs(y0 - CY), np.abs(y1 - CY)))
    inside_hole = far <= HR
    return hit_outer & ~inside_hole


def _margins(z: int) -> float:
    """Min distance of any decision boundary from its threshold —
    guards the test (and the SQL oracle) against fp-tie ambiguity."""
    n = 1 << z
    i = np.arange(n)
    x0 = (i / n)[:, None] + np.zeros((1, n))
    y0 = (i / n)[None, :] + np.zeros((n, 1))
    x1, y1 = x0 + 1.0 / n, y0 + 1.0 / n
    near = (np.maximum(np.maximum(x0 - CX, CX - x1), 0)
            + np.maximum(np.maximum(y0 - CY, CY - y1), 0))
    far = (np.maximum(np.abs(x0 - CX), np.abs(x1 - CX))
           + np.maximum(np.abs(y0 - CY), np.abs(y1 - CY)))
    return min(np.abs(near - R).min(), np.abs(far - HR).min())


def test_parse_poly_structure():
    p = parse_poly(_diamond_poly_text())
    assert len(p["ring_offsets"]) == 3           # outer + hole
    assert list(p["poly_of_ring"]) == [0, 0]     # hole attached to outer
    # rings auto-closed
    for r in range(2):
        s, e = p["ring_offsets"][r], p["ring_offsets"][r + 1]
        assert p["lons"][s] == p["lons"][e - 1]
        assert p["lats"][s] == p["lats"][e - 1]


def test_parse_poly_errors():
    with pytest.raises(PolyFileFormatError):
        parse_poly("junk\narea\n0 0\n1 0\n1 1\n")          # unclosed ring
    with pytest.raises(PolyFileFormatError):
        parse_poly("junk\narea\n0 0\n1 0\n1 1\nEND\n")     # no final END
    with pytest.raises(PolyFileFormatError):
        parse_poly("junk\narea\n0 0\n1 0\n1 1\nEND\nEND\ntrailing\n")


@pytest.mark.parametrize("z", [3, 5, 6, 7])
@pytest.mark.parametrize("with_hole", [False, True])
def test_mask_matches_bruteforce(z, with_hole):
    assert _margins(z) > 1e-9
    poly = parse_poly(_diamond_poly_text(with_hole))
    mask = ShapeMask.from_poly(poly, z, minzoom=z)
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    got = mask.test(xs.ravel(), ys.ravel(), z).reshape(n, n)
    exp = _expected(z, with_hole)
    bad = np.argwhere(got != exp)
    assert len(bad) == 0, f"z{z} first diffs {bad[:5]}"


def test_tile_extents_with_shape():
    poly = parse_poly(_diamond_poly_text())
    ext = TileExtents.compute_from_world_bounds(6, (0.25, 0.3, 0.95, 0.9),
                                                shape=poly)
    n = 1 << 6
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    got = ext.test(xs.ravel(), ys.ravel(), 6).reshape(n, n)
    rect = ((xs >= 16) & (xs < 61) & (ys >= 19) & (ys < 58))
    exp = _expected(6) & rect
    assert (got == exp).all()
    # world roundtrip sanity: projected corners are where we put them
    assert abs(get_world_x(get_world_lon(CX)) - CX) < 1e-12
    assert abs(get_world_y(get_world_lat(CY)) - CY) < 1e-12
