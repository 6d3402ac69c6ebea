"""Pure numpy tile-math kernels (no Ray dependency).

These are the bit-exact foundations everything else builds on; they
mirror the reference's unit-tested math:

- projection: ``geo/GeoUtils.java:164-198`` (with the y∈[-0.1,1.1] clamp)
- tilecoord:  ``geo/TileCoord.java:31-86,158-175`` (TMS global index)
- hilbert:    ``util/Hilbert.java`` (per-level Hilbert index)
- extents:    ``geo/TileExtents.java:25-70``
- sortkey:    ``collection/FeatureGroup.java:168-196`` (64-bit key layout)
- mvt:        ``VectorTile.java:103-210`` (zigzag delta command codec)
- simplify:   ``geo/DouglasPeuckerSimplifier.java``, ``geo/VWSimplifier.java``
"""

from .projection import get_world_x, get_world_y, get_world_lon, get_world_lat
from .tilecoord import (
    MAX_MAXZOOM,
    zoom_start_index,
    tms_encode,
    tms_decode,
    hilbert_encode_tile,
    hilbert_decode_tile,
    tile_of_point,
)
from .hilbert import hilbert_xy_to_index, hilbert_position_to_xy
from .sortkey import encode_key, decode_key, SORT_KEY_MIN, SORT_KEY_MAX
from .extents import TileExtents
