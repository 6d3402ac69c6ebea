"""Vectorized per-level Hilbert curve index, matching ``util/Hilbert.java``.

The reference ports the public-domain bit-trick curve from
github.com/rawrunprotected/hilbert_curves; this is an independent numpy
re-expression of the same published algorithm (32-bit unsigned
arithmetic; level ≤ 16).  Conformance vectors come from the reference's
``util/HilbertTest.java`` and ``geo/TileCoordTest.java``.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_M = _U32(0xFFFFFFFF)
_FFFF = _U32(0xFFFF)


def _u32(a):
    return np.asarray(a).astype(np.uint32)


def _deinterleave(tx: np.ndarray) -> np.ndarray:
    tx = tx & _U32(0x55555555)
    tx = (tx | (tx >> _U32(1))) & _U32(0x33333333)
    tx = (tx | (tx >> _U32(2))) & _U32(0x0F0F0F0F)
    tx = (tx | (tx >> _U32(4))) & _U32(0x00FF00FF)
    tx = (tx | (tx >> _U32(8))) & _U32(0x0000FFFF)
    return tx


def _interleave(tx: np.ndarray) -> np.ndarray:
    tx = (tx | (tx << _U32(8))) & _U32(0x00FF00FF)
    tx = (tx | (tx << _U32(4))) & _U32(0x0F0F0F0F)
    tx = (tx | (tx << _U32(2))) & _U32(0x33333333)
    tx = (tx | (tx << _U32(1))) & _U32(0x55555555)
    return tx


def _prefix_scan(tx: np.ndarray) -> np.ndarray:
    tx = (tx >> _U32(8)) ^ tx
    tx = (tx >> _U32(4)) ^ tx
    tx = (tx >> _U32(2)) ^ tx
    tx = (tx >> _U32(1)) ^ tx
    return tx


def hilbert_position_to_xy(level: int, pos) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert index → (x, y) at ``level``. ``Hilbert.java:53-75``."""
    pos = np.asarray(pos, dtype=np.uint64)
    if level == 0:
        z = np.zeros(pos.shape, dtype=np.int64)
        return z, z
    ipos = ((pos << np.uint64(32 - 2 * level)) & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    i0 = _deinterleave(ipos)
    i1 = _deinterleave(ipos >> _U32(1))

    t0 = (i0 | i1) ^ _FFFF
    t1 = i0 & i1

    prefix_t0 = _prefix_scan(t0)
    prefix_t1 = _prefix_scan(t1)

    a = ((i0 ^ _FFFF) & prefix_t1) | (i0 & prefix_t0)

    result_x = ((a ^ i1) >> _U32(16 - level)).astype(np.int64)
    result_y = ((a ^ i0 ^ i1) >> _U32(16 - level)).astype(np.int64)
    return result_x, result_y


def hilbert_xy_to_index(level: int, x, y) -> np.ndarray:
    """(x, y) → Hilbert index at ``level``. ``Hilbert.java:78-128``."""
    if level == 0:
        return np.zeros(np.asarray(x).shape, dtype=np.int64)
    x = _u32(x) << _U32(16 - level)
    y = _u32(y) << _U32(16 - level)

    a1 = x ^ y
    b1 = _FFFF ^ a1
    c1 = _FFFF ^ (x | y)
    d1 = x & (y ^ _FFFF)

    hA = a1 | (b1 >> _U32(1))
    hB = (a1 >> _U32(1)) ^ a1
    hC = ((c1 >> _U32(1)) ^ (b1 & (d1 >> _U32(1)))) ^ c1
    hD = ((a1 & (c1 >> _U32(1))) ^ (d1 >> _U32(1))) ^ d1

    a2, b2, c2, d2 = hA, hB, hC, hD
    hA = (a2 & (a2 >> _U32(2))) ^ (b2 & (b2 >> _U32(2)))
    hB = (a2 & (b2 >> _U32(2))) ^ (b2 & ((a2 ^ b2) >> _U32(2)))
    hC = c2 ^ ((a2 & (c2 >> _U32(2))) ^ (b2 & (d2 >> _U32(2))))
    hD = d2 ^ ((b2 & (c2 >> _U32(2))) ^ ((a2 ^ b2) & (d2 >> _U32(2))))

    a3, b3, c3, d3 = hA, hB, hC, hD
    hA = (a3 & (a3 >> _U32(4))) ^ (b3 & (b3 >> _U32(4)))
    hB = (a3 & (b3 >> _U32(4))) ^ (b3 & ((a3 ^ b3) >> _U32(4)))
    hC = c3 ^ ((a3 & (c3 >> _U32(4))) ^ (b3 & (d3 >> _U32(4))))
    hD = d3 ^ ((b3 & (c3 >> _U32(4))) ^ ((a3 ^ b3) & (d3 >> _U32(4))))

    a4, b4, c4, d4 = hA, hB, hC, hD
    hC = c4 ^ ((a4 & (c4 >> _U32(8))) ^ (b4 & (d4 >> _U32(8))))
    hD = d4 ^ ((b4 & (c4 >> _U32(8))) ^ ((a4 ^ b4) & (d4 >> _U32(8))))

    a = hC ^ (hC >> _U32(1))
    b = hD ^ (hD >> _U32(1))

    i0 = x ^ y
    i1 = b | (_FFFF ^ (i0 | a))

    merged = ((_interleave(i1).astype(np.uint64) << np.uint64(1)) |
              _interleave(i0).astype(np.uint64)) & np.uint64(0xFFFFFFFF)
    return (merged >> np.uint64(32 - 2 * level)).astype(np.int64)
