"""Deterministic synthetic image+caption tables (FIXTURES.md §1).

Schema exactly per the target input hint:

    image_id: string   # f"img{i:08d}"
    bytes:    binary   # stub-codec encoded RGB noise (codec.py)
    w:        int32    # {16, 32, 64}[i % 3]
    h:        int32    # {16, 32, 48}[(i//3) % 3]
    fmt:      string   # "png" even i / "jpeg" odd i
    caption:  string   # f"caption {i}: {adj[i%7]} {noun[i%11]}"
    phash:    int64    # perceptual hash of the decoded pixels (codec.phash64)

Georeferencing is *derived, not stored* (see :func:`georef_from_ids`):
each image is a raster chip placed deterministically from
``fnv1a_64(image_id)`` — uniform in world-mercator space, with 30% of
images concentrated into 5 fixed "city" hotspots (skew fixture) and
every 97th image straddling the antimeridian (wrap fixture).

All generation is seeded/deterministic; tables are cached as parquet
under ``/tmp/planetiler_ray_fixtures`` keyed by (n, with_bytes).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codec
from .tilemath.hashing import fnv1a_64_strings, mix64
from .tilemath.projection import get_world_x, get_world_y

ADJECTIVES = ["fast", "slow", "big", "small", "old", "new", "bright"]
NOUNS = ["river", "city", "field", "road", "tower", "lake", "forest",
         "bridge", "island", "valley", "harbor"]

WIDTHS = np.array([16, 32, 64], dtype=np.int32)
HEIGHTS = np.array([16, 32, 48], dtype=np.int32)

# five fixed 0.2°×0.2° "city" hotspot boxes: (center lon, center lat)
CITY_CENTERS = [(-74.0, 40.7), (2.35, 48.85), (139.7, 35.7), (-0.13, 51.5), (151.2, -33.9)]

CACHE_DIR = "/tmp/planetiler_ray_fixtures"

# chip footprint size: w world units per pixel (FIXTURES.md: width = w · 2^-22)
CHIP_SCALE = 2.0 ** -22


def image_ids(n: int) -> np.ndarray:
    return np.char.add("img", np.char.zfill(np.arange(n).astype(str), 8))


def captions(idx: np.ndarray) -> np.ndarray:
    adj = np.array(ADJECTIVES)[idx % 7]
    noun = np.array(NOUNS)[idx % 11]
    return np.array([f"caption {i}: {a} {b}" for i, a, b in zip(idx, adj, noun)])


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB noise for image index ``i`` (seed = i)."""
    return np.random.default_rng(i).integers(0, 256, (h, w, 3), dtype=np.uint8)


def images_table(n: int, with_bytes: bool = True) -> pa.Table:
    """Build the synthetic images table for indexes 0..n-1."""
    idx = np.arange(n, dtype=np.int64)
    ids = image_ids(n)
    w = WIDTHS[idx % 3]
    h = HEIGHTS[(idx // 3) % 3]
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    caps = captions(idx)
    if with_bytes:
        blobs, phashes = [], np.empty(n, dtype=np.int64)
        for i in range(n):
            px = make_pixels(i, int(w[i]), int(h[i]))
            blobs.append(codec.encode_image(px, str(fmt[i])))
            phashes[i] = codec.phash64(codec.decode_image(blobs[-1]))
        bytes_col = pa.array(blobs, type=pa.binary())
    else:
        # metadata-only variant for large-scale benchmarks: bytes empty,
        # phash derived from the id hash (documented deterministic stand-in)
        bytes_col = pa.array([b""] * n, type=pa.binary())
        phashes = fnv1a_64_strings(ids).view(np.int64)
    return pa.table({
        "image_id": pa.array(ids.tolist(), type=pa.string()),
        "bytes": bytes_col,
        "w": pa.array(w, type=pa.int32()),
        "h": pa.array(h, type=pa.int32()),
        "fmt": pa.array(fmt.tolist(), type=pa.string()),
        "caption": pa.array(caps.tolist(), type=pa.string()),
        "phash": pa.array(phashes, type=pa.int64()),
    })


def images_parquet(n: int, with_bytes: bool = True, shards: int = 8) -> str:
    """Materialize (cached) the images table as sharded parquet; returns dir.

    Sharded so `ray.data.read_parquet` starts from multiple blocks —
    the stand-in for a multi-file Lance dataset at real scale.
    """
    # v2: version tag so fixture-layout changes can never serve a stale
    # /tmp cache to later runs (the _DONE marker short-circuits rebuilds)
    key = f"images_v2_n{n}_{'b' if with_bytes else 'nb'}"
    out = os.path.join(CACHE_DIR, key)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    tbl = images_table(n, with_bytes=with_bytes)
    shards = max(1, min(shards, n))
    step = (n + shards - 1) // shards
    for s in range(shards):
        part = tbl.slice(s * step, step)
        if len(part):
            pq.write_table(part, os.path.join(out, f"part-{s:05d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out


def georef_from_ids(ids: np.ndarray) -> dict[str, np.ndarray]:
    """Derive the chip placement from image ids (FIXTURES.md §1 rules).

    Returns world-mercator center (cx, cy) and half extents (hw, hh)
    given the per-id hash and the fixed skew/antimeridian rules.
    ``w``/``h`` are re-derived from the numeric index (i = suffix of id),
    so placement is a pure function of image_id.
    """
    ids = np.asarray(ids)
    idx = np.char.lstrip(np.char.replace(ids.astype("U"), "img", ""), "0")
    i = np.where(idx == "", "0", idx).astype(np.int64)
    u = mix64(fnv1a_64_strings(ids))

    w = WIDTHS[i % 3].astype(np.float64)
    h = HEIGHTS[(i // 3) % 3].astype(np.float64)
    hw = w * CHIP_SCALE / 2
    hh = h * CHIP_SCALE / 2

    m26 = np.uint64((1 << 26) - 1)
    cx = ((u & m26).astype(np.float64)) / float(1 << 26)
    cy = -0.05 + 1.1 * (((u >> np.uint64(26)) & m26).astype(np.float64)) / float(1 << 26)

    # skew hotspots: i % 10 < 3 → one of 5 fixed 0.2°×0.2° city boxes
    hot = (i % 10) < 3
    if hot.any():
        city = ((i // 10) % 5)
        clon = np.array([c[0] for c in CITY_CENTERS])[city]
        clat = np.array([c[1] for c in CITY_CENTERS])[city]
        m13 = np.uint64((1 << 13) - 1)
        f1 = ((u >> np.uint64(40)) & m13).astype(np.float64) / float(1 << 13)
        f2 = ((u >> np.uint64(50)) & m13).astype(np.float64) / float(1 << 13)
        lon = clon + 0.2 * (f1 - 0.5)
        lat = clat + 0.2 * (f2 - 0.5)
        cx = np.where(hot, get_world_x(lon), cx)
        cy = np.where(hot, get_world_y(lat), cy)

    # antimeridian straddle: i % 97 == 0 → center within hw of x=1.0
    wrap = (i % 97) == 0
    if wrap.any():
        frac = ((u >> np.uint64(30)) & np.uint64(1023)).astype(np.float64) / 1024.0
        cx = np.where(wrap, 1.0 - hw * frac, cx)
        cy = np.where(wrap, np.clip(cy, 0.05, 0.95), cy)

    return {"cx": cx, "cy": cy, "hw": hw, "hh": hh, "idx": i}
