"""Mapbox-Vector-Tile-style geometry command codec (zigzag delta ints).

Matches the encoding the reference uses in ``VectorTile.java:97-98,103-210``
(and the public MVT 2.1 spec): geometry is a flat int array of
``CommandInteger = (id & 0x7) | (count << 3)`` with id ∈ {MOVE_TO=1,
LINE_TO=2, CLOSE_PATH=7}, followed by zigzag-encoded coordinate deltas
``(n << 1) ^ (n >> 31)`` at tile extent 4096 (256 px · 16).

Coordinates come in as tile pixel coords (0..256 scale); ``SCALE = 16``
converts px → extent units (``VectorTile.java:83-101``).
"""

from __future__ import annotations

import numpy as np

EXTENT = 4096
SIZE_PX = 256
SCALE = EXTENT // SIZE_PX  # 16

MOVE_TO = 1
LINE_TO = 2
CLOSE_PATH = 7


def zigzag_encode(n) -> np.ndarray:
    n = np.asarray(n, dtype=np.int32)
    return ((n << np.int32(1)) ^ (n >> np.int32(31))).astype(np.int32)


def zigzag_decode(n) -> np.ndarray:
    n = np.asarray(n, dtype=np.int32)
    return ((n >> np.int32(1)) ^ (-(n & np.int32(1)))).astype(np.int32)


def _command(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def quantize_px(coords_px: np.ndarray) -> np.ndarray:
    """Tile pixel coords (float, 0..256) → integer extent units (0..4096).

    Rounding matches Java ``Math.round`` (half-up) used when the
    reference converts JTS coords to tile grid (``VectorTile.java:127``).
    """
    c = np.asarray(coords_px, dtype=np.float64) * SCALE
    return np.floor(c + 0.5).astype(np.int32)


def encode_points(coords_px: np.ndarray) -> np.ndarray:
    """Encode a multipoint: one MoveTo command with all points.

    ``coords_px``: (n, 2) float tile-pixel coordinates.
    """
    q = quantize_px(coords_px)
    n = len(q)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    deltas = np.diff(np.vstack([[[0, 0]], q]), axis=0).astype(np.int32)
    out = np.empty(1 + 2 * n, dtype=np.int32)
    out[0] = _command(MOVE_TO, n)
    out[1::2] = zigzag_encode(deltas[:, 0])
    out[2::2] = zigzag_encode(deltas[:, 1])
    return out


def encode_linestring(coords_px: np.ndarray, close: bool = False) -> np.ndarray:
    """Encode one linestring (or ring when ``close``): MoveTo 1, LineTo n-1[, ClosePath]."""
    q = quantize_px(coords_px)
    if close and len(q) > 1 and (q[0] == q[-1]).all():
        q = q[:-1]
    n = len(q)
    if n < 2:
        return np.empty(0, dtype=np.int32)
    deltas = np.diff(np.vstack([[[0, 0]], q]), axis=0).astype(np.int32)
    parts = [np.array([_command(MOVE_TO, 1), zigzag_encode(deltas[0, 0]),
                       zigzag_encode(deltas[0, 1]), _command(LINE_TO, n - 1)], dtype=np.int32)]
    body = np.empty(2 * (n - 1), dtype=np.int32)
    body[0::2] = zigzag_encode(deltas[1:, 0])
    body[1::2] = zigzag_encode(deltas[1:, 1])
    parts.append(body)
    if close:
        parts.append(np.array([_command(CLOSE_PATH, 1)], dtype=np.int32))
    return np.concatenate(parts)


def encode_box(x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    """Encode an axis-aligned box polygon ring (CW in screen coords = outer)."""
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)
    return encode_linestring(ring, close=True)


def decode_commands(cmds: np.ndarray) -> list[tuple[str, np.ndarray]]:
    """Decode a command array → list of (kind, coords-in-extent-units)."""
    cmds = np.asarray(cmds, dtype=np.int32)
    out = []
    i = 0
    x = y = 0
    cur: list[list[int]] = []
    while i < len(cmds):
        c = int(cmds[i])
        cmd_id, count = c & 0x7, c >> 3
        i += 1
        if cmd_id == MOVE_TO:
            for _ in range(count):
                if cur:
                    out.append(("line", np.array(cur, dtype=np.int32)))
                    cur = []
                x += int(zigzag_decode(cmds[i]))
                y += int(zigzag_decode(cmds[i + 1]))
                i += 2
                cur.append([x, y])
        elif cmd_id == LINE_TO:
            for _ in range(count):
                x += int(zigzag_decode(cmds[i]))
                y += int(zigzag_decode(cmds[i + 1]))
                i += 2
                cur.append([x, y])
        elif cmd_id == CLOSE_PATH:
            out.append(("ring", np.array(cur, dtype=np.int32)))
            cur = []
        else:  # pragma: no cover
            raise ValueError(f"bad command id {cmd_id}")
    if cur:
        out.append(("line" if len(cur) > 1 else "point", np.array(cur, dtype=np.int32)))
    return out
