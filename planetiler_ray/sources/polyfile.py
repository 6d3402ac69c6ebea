"""Osmosis ``.poly`` polygon-filter file reader.

Same format and tolerances as the reference's
``reader/osm/PolyFileReader.java:1-103`` (see the Osmosis/"Polygon
Filter File Format" wiki page): first line is junk, each section
starts with a ring name (a leading ``!`` marks a hole), coordinates
are whitespace-separated ``lon lat`` doubles, ``END`` closes a ring,
a final ``END`` closes the file.  Rings are auto-closed.

The reference folds rings into a JTS geometry with sequential
``union``/``difference``; this engine consumes the rings directly as
flattened vertex streams for the striped-clip shape mask
(``tilemath/shapemask.py``), with every outer ring a polygon and each
hole attached to the polygon whose section it appeared in.  (For the
standard Geofabrik-style files — outers first, holes after, no
re-adding of subtracted area — the two readings coincide.)
"""

from __future__ import annotations

import numpy as np


class PolyFileFormatError(ValueError):
    pass


def parse_poly(text: str) -> dict:
    """Parse ``.poly`` text → flattened world-ring arrays.

    Returns ``{"lons": f64[:], "lats": f64[:], "ring_offsets": i64[:],
    "poly_of_ring": i64[:]}`` — one entry in ``ring_offsets`` per ring
    boundary, ``poly_of_ring[r]`` grouping holes with their outer
    (first ring of each polygon id is the shell), the layout
    ``tilemath.stripeclip.slice_polygons_striped`` consumes.
    """
    lons: list[float] = []
    lats: list[float] = []
    offsets = [0]
    poly_of_ring: list[int] = []
    n_polys = 0

    in_ring = False
    in_polygon = True
    first_line = True
    ring_is_hole = False
    ring_n = 0

    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if not in_polygon:
            raise PolyFileFormatError("File continues after end of polygon")
        if first_line:
            first_line = False          # header line is junk
            continue
        if in_ring:
            if line == "END":
                if ring_n < 3:
                    raise PolyFileFormatError("Ring with fewer than 3 points")
                # auto-close (closeRing): repeat the first point if needed
                s = offsets[-1]
                if lons[s] != lons[-1] or lats[s] != lats[-1]:
                    lons.append(lons[s])
                    lats.append(lats[s])
                offsets.append(len(lons))
                if ring_is_hole:
                    if n_polys == 0:
                        raise PolyFileFormatError("Hole before any outer ring")
                    poly_of_ring.append(n_polys - 1)
                else:
                    poly_of_ring.append(n_polys)
                    n_polys += 1
                in_ring = False
            else:
                parts = line.split()
                lons.append(float(parts[0]))
                lats.append(float(parts[1]))
                ring_n += 1
        else:
            if line == "END":
                in_polygon = False
            else:
                ring_is_hole = line[0] == "!"
                in_ring = True
                ring_n = 0
    if in_ring:
        raise PolyFileFormatError("Unclosed ring")
    if in_polygon:
        raise PolyFileFormatError("File ends before end of polygon")
    return {
        "lons": np.asarray(lons, np.float64),
        "lats": np.asarray(lats, np.float64),
        "ring_offsets": np.asarray(offsets, np.int64),
        "poly_of_ring": np.asarray(poly_of_ring, np.int64),
    }


def parse_poly_file(path: str) -> dict:
    with open(path) as f:
        return parse_poly(f.read())
