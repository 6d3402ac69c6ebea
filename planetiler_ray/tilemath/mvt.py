"""MVT tile-extent constants shared by the render/reduce/encode stages.

The real vectorized MVT geometry/protobuf encoder lives in
``tilemath/mvt_pb.py`` (``VectorTile.java:97-210`` semantics, public
MVT 2.1 spec); zigzag varint helpers live in ``tilemath/varint.py``.
This module keeps only the extent constants — an earlier scalar command
codec here duplicated (and subtly diverged from) the mvt_pb encoder
with no callers, so it was removed.

Coordinates flow through the engine as tile pixel coords (0..256);
``SCALE = 16`` converts px → extent units (``VectorTile.java:83-101``).
"""

from __future__ import annotations

EXTENT = 4096
SIZE_PX = 256
SCALE = EXTENT // SIZE_PX  # 16
