"""FNV-1a hashing, scalar and vectorized, matching ``util/Hashing.java``.

The reference uses FNV-1a (init 0xcbf29ce484222325, prime 1099511628211)
for tile-content dedup hashes; we additionally use it for deterministic
georeferencing of image ids (FIXTURES.md §1).
"""

from __future__ import annotations

import numpy as np

FNV1_64_INIT = np.uint64(0xCBF29CE484222325)
FNV1_PRIME_64 = np.uint64(1099511628211)
FNV1_32_INIT = np.uint32(0x811C9DC5)
FNV1_PRIME_32 = np.uint32(16777619)


def fnv1a_64(data: bytes, init: int | np.uint64 = FNV1_64_INIT) -> np.uint64:
    """Scalar FNV-1a 64 over bytes. ``Hashing.java:62-75``."""
    h = np.uint64(init)
    with np.errstate(over="ignore"):
        for b in data:
            h = (h ^ np.uint64(b)) * FNV1_PRIME_64
    return h


def fnv1a_64_strings(strings, max_len: int | None = None) -> np.ndarray:
    """Vectorized FNV-1a 64 over an array of strings (UTF-8 bytes).

    Processes column-by-column over the padded byte matrix so the work is
    O(max_len) numpy passes instead of a per-row Python loop.  Rows
    shorter than max_len stop updating once their bytes run out (mask),
    which reproduces the sequential definition exactly.  Non-ASCII
    batches take a per-string UTF-8 encode into the same matrix (rare
    path; ASCII batches keep the zero-copy view and identical hashes —
    UTF-8 equals ASCII bytes on ASCII input).
    """
    try:
        arr = np.asarray(strings,
                         dtype="S" if max_len is None else f"S{max_len}")
        if arr.size == 0:
            return np.empty(0, dtype=np.uint64)
        width = arr.dtype.itemsize
        mat = arr.view(np.uint8).reshape(len(arr), width)
    except UnicodeEncodeError:
        bs = [str(s).encode("utf-8") for s in np.asarray(strings, object)]
        if max_len is not None:
            bs = [b[:max_len] for b in bs]
        if not bs:
            return np.empty(0, dtype=np.uint64)
        width = max((len(b) for b in bs), default=1) or 1
        mat = np.zeros((len(bs), width), np.uint8)
        for i, b in enumerate(bs):
            mat[i, :len(b)] = np.frombuffer(b, np.uint8)
    h = np.full(len(mat), FNV1_64_INIT, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            col = mat[:, j]
            live = col != 0
            if not live.any():
                break
            h[live] = (h[live] ^ col[live].astype(np.uint64)) * FNV1_PRIME_64
    return h


def mix64(values) -> np.ndarray:
    """splitmix64 finalizer — full-avalanche mix of 64-bit values.

    FNV-1a alone has weak avalanche on trailing-byte changes (ids that
    share a prefix hash to nearby values); anywhere a hash is used for
    *placement/partitioning* we post-mix with the public splitmix64
    finalizer (Steele et al., "Fast Splittable Pseudorandom Number
    Generators").
    """
    z = np.asarray(values).astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def fnv1a_64_u64(values: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over the 8 little-endian bytes of uint64 values."""
    v = np.asarray(values).astype(np.uint64)
    h = np.full(v.shape, FNV1_64_INIT, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for shift in range(0, 64, 8):
            byte = (v >> np.uint64(shift)) & np.uint64(0xFF)
            h = (h ^ byte) * FNV1_PRIME_64
    return h
