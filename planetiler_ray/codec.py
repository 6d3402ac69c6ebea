"""Deterministic stand-in image codec ("fake PNG/JPEG").

The sandbox has no PIL/libjpeg, so real image decode is STUBBED behind
this codec (as directed: the Ray-side plumbing — schema, batch sizes,
actor signatures, output layout — is real and tested; only the
pixel-codec bytes are a deterministic fake).

Container format (little-endian):

    magic   4 bytes   b"FPNG" (lossless) | b"FJPG" (lossy)
    w       uint32
    h       uint32
    payload zlib-compressed RGB uint8 pixels, row-major (h, w, 3)

"JPEG" lossiness is modeled as uniform quantization of each channel to
multiples of ``JPEG_QUANT`` before compression; for JPEG_QUANT=4 the
reconstruction PSNR is ≈ 47 dB > the 40 dB invariant, mimicking a
quality≈90 JPEG.  Swap :func:`encode_image`/:func:`decode_image` for
PIL-based versions in a real deployment — every call site goes through
this module.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"
JPEG_QUANT = 4


class ImageDecodeError(ValueError):
    pass


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array as fake png/jpeg bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    if fmt == "png":
        magic, payload = MAGIC_PNG, pixels
    elif fmt == "jpeg":
        magic = MAGIC_JPG
        payload = (pixels // JPEG_QUANT) * JPEG_QUANT + JPEG_QUANT // 2
        payload = payload.astype(np.uint8)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return magic + struct.pack("<II", w, h) + zlib.compress(payload.tobytes(), 6)


def decode_image(data: bytes) -> np.ndarray:
    """Decode fake png/jpeg bytes → (h, w, 3) uint8 array."""
    if len(data) < 12 or data[:4] not in (MAGIC_PNG, MAGIC_JPG):
        raise ImageDecodeError("bad magic")
    w, h = struct.unpack("<II", data[4:12])
    raw = zlib.decompress(data[12:])
    if len(raw) != w * h * 3:
        raise ImageDecodeError("bad payload size")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash (8×8 block means vs median).

    Deterministic, pure-numpy stand-in for a DCT pHash: downsample the
    grayscale image to 8×8 by block averaging, then bit i = mean_i >
    overall median.  Robust to the fake-JPEG quantization noise, so
    near-duplicate pixels → near-equal hashes (small Hamming distance).
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h < 8 or w < 8:
        # sub-8px images: nearest-pixel upsample to 8x8 (empty block
        # slices would NaN the median and hash EVERY tiny image to 0)
        gray = gray[np.minimum(np.arange(8) * h // 8, h - 1)][
            :, np.minimum(np.arange(8) * w // 8, w - 1)]
        h = w = 8
    if h % 8 == 0 and w % 8 == 0:
        # fast path: exact 8×8 block means via reshape
        blocks = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (blocks > np.median(blocks)).ravel()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # return as signed int64 range for Arrow int64 columns
    return out - (1 << 64) if out >= (1 << 63) else out
