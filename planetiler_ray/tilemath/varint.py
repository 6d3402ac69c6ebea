"""Vectorized protobuf base-128 varint encoding.

The building block for the MVT protobuf encoder
(:mod:`planetiler_ray.tilemath.mvt_pb`): encodes whole numpy arrays of
uint64 values into one contiguous byte buffer with per-value offsets —
no per-value Python.  Wire format per the public protobuf spec:
7 bits per byte, little-endian groups, MSB = continuation.
"""

from __future__ import annotations

import numpy as np


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each uint64 value (1..10)."""
    v = np.asarray(values, dtype=np.uint64)
    n = np.ones(v.shape, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        n += (x != 0)
        x = x >> np.uint64(7)
    return n


def encode_varints(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode an array of uint64 → (flat uint8 buffer, per-value lengths).

    Vectorized: builds the byte matrix column-by-column (≤10 passes) and
    compacts with one boolean mask — O(total bytes) work, no Python loop
    over values.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    lens = varint_lengths(v)
    width = int(lens.max())
    mat = np.zeros((len(v), width), dtype=np.uint8)
    x = v.copy()
    for j in range(width):
        mat[:, j] = (x & np.uint64(0x7F)).astype(np.uint8)
        x = x >> np.uint64(7)
        cont = j + 1 < lens  # continuation bit for all but the last byte
        mat[cont, j] |= 0x80
    valid = np.arange(width)[None, :] < lens[:, None]
    return mat[valid], lens


def zigzag(values: np.ndarray) -> np.ndarray:
    """Signed int64 → zigzag uint64 ((v << 1) ^ (v >> 63))."""
    v = np.asarray(values, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    """Zigzag uint64 → signed int64."""
    v = np.asarray(values, dtype=np.uint64)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)


def decode_varints(buf: bytes | np.ndarray, pos: int = 0,
                   count: int | None = None) -> tuple[np.ndarray, int]:
    """Decode ``count`` varints (or all until end) from ``buf`` starting
    at ``pos``; returns (uint64 values, end position).  Plain-Python
    reference decoder for tests/verification — not a hot path."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    out = []
    i = pos
    while i < len(b) and (count is None or len(out) < count):
        val = 0
        shift = 0
        while True:
            byte = int(b[i])
            i += 1
            val |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        out.append(val & 0xFFFFFFFFFFFFFFFF)
    return np.array(out, dtype=np.uint64), i


def concat_pieces(pool: np.ndarray, src_starts: np.ndarray,
                  lengths: np.ndarray) -> np.ndarray:
    """Concatenate variable-length slices of ``pool`` in order — the
    flattened-gather trick (one fancy-index, no per-piece Python)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.uint8)
    out_starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(out_starts, lengths)
           + np.repeat(np.asarray(src_starts, dtype=np.int64), lengths))
    return pool[idx]
