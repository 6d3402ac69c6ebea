"""64-bit feature sort-key packing, matching ``collection/FeatureGroup.java``.

Bit layout (``FeatureGroup.java:170-180``):

    [tile: 33 bits (63-31)][layer: 8 bits (30-23)][sortKey: 22 bits (22-1)][hasGroup: 1 bit (0)]

with sortKey biased by ``SORT_KEY_MIN = -(1 << 21)`` so it sorts unsigned
(``FeatureGroup.java:56-59``).
"""

from __future__ import annotations

import numpy as np

SORT_KEY_BITS = 22
SORT_KEY_MAX = (1 << (SORT_KEY_BITS - 1)) - 1
SORT_KEY_MIN = -(1 << (SORT_KEY_BITS - 1))
_SORT_KEY_MASK = np.uint64((1 << SORT_KEY_BITS) - 1)
TILE_ID_BITS = 33


def encode_key(tile, layer, sort_key, has_group) -> np.ndarray:
    """Pack (tile, layer, sortKey, hasGroup) → int64 key. ``FeatureGroup.java:176-180``."""
    tile = np.asarray(tile, dtype=np.int64).astype(np.uint64)
    layer = (np.asarray(layer, dtype=np.int64).astype(np.uint64)) & np.uint64(0xFF)
    sk = np.asarray(sort_key, dtype=np.int64)
    skb = ((sk - SORT_KEY_MIN).astype(np.uint64)) & _SORT_KEY_MASK
    hg = np.asarray(has_group).astype(np.uint64) & np.uint64(1)
    key = ((tile << np.uint64(64 - TILE_ID_BITS)) |
           (layer << np.uint64(SORT_KEY_BITS + 1)) |
           (skb << np.uint64(1)) | hg)
    return key.view(np.int64) if key.shape else np.int64(key.astype(np.int64))


def decode_key(key) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """int64 key → (tile, layer, sortKey, hasGroup). ``FeatureGroup.java:182-196``."""
    k = np.asarray(key, dtype=np.int64).astype(np.uint64)
    tile = (k >> np.uint64(64 - TILE_ID_BITS)).astype(np.int64)
    layer = ((k >> np.uint64(SORT_KEY_BITS + 1)) & np.uint64(0xFF)).astype(np.int64)
    sort_key = ((k >> np.uint64(1)) & _SORT_KEY_MASK).astype(np.int64) + SORT_KEY_MIN
    has_group = (k & np.uint64(1)).astype(bool)
    return tile, layer, sort_key, has_group
