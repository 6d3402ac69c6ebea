"""GeoJSON / NDJSON feature source.

The analog of the reference's streaming GeoJSON reader
(``reader/geojson/GeoJsonReader.java``, ``GeoJsonFeatureIterator.java``):
newline-delimited GeoJSON Features with Point or (axis-aligned bbox)
Polygon geometries become georeferenced rows in the engine's model —
world-mercator centroid + half extents — ready for the render fan-out.

Parsing happens vectorized-ish inside ``map_batches`` over
``read_json`` output (Ray reads NDJSON natively into Arrow structs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..tilemath.projection import get_world_x, get_world_y


def feature_idx_from_ids(ids: list[str]) -> np.ndarray:
    """Stable 63-bit feature idx from the feature's id string.

    External readers see their input in arbitrary read-task batches, so
    a per-batch ``arange`` collides ACROSS batches — and the reduce's
    duplicate-fragment drop keys on ``(tile, layer, idx)``, which would
    silently collapse distinct features sharing a tile.  Hashing the
    stable id gives a globally-unique-in-practice idx independent of
    block boundaries (collision odds ~n²/2⁶⁴; the engine's own tables
    carry real integer ids and never take this path)."""
    import hashlib

    return np.array(
        [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "little") & ((1 << 63) - 1) for s in ids],
        np.int64)


def _features_to_rows(batch: pa.Table) -> pa.Table:
    """Parse one batch of NDJSON features, geometry math vectorized.

    ``json.loads`` per line is unavoidable (GeoJSON geometry unions
    are too ragged for Arrow JSON schema inference), but all the
    projection/extent math runs as BULK numpy over the batch: points
    as one (n, 2) array, polygon outer rings as one concatenated
    coordinate array reduced per ring with ``minimum.reduceat``."""
    import json

    feats = [json.loads(line) for line in batch["text"].to_pylist()
             if line.strip()]
    order, kinds, ids, caps = [], [], [], []
    pts, rings = [], []
    for i, f in enumerate(feats):
        geom = f.get("geometry")
        if geom is None:
            continue
        gtype = geom.get("type")
        if gtype == "Point":
            kinds.append(0)
            pts.append(geom["coordinates"][:2])
        elif gtype == "Polygon":
            kinds.append(1)
            rings.append(np.asarray(geom["coordinates"][0], np.float64))
        else:  # unsupported geometry types are skipped (counted upstream)
            continue
        prop = f.get("properties") or {}
        order.append(i)
        ids.append(str(prop.get("id", f"feat{i:08d}")))
        caps.append(str(prop.get("caption", prop.get("name", ""))))
    n = len(order)
    kinds = np.asarray(kinds, np.int8)
    cx = np.empty(n)
    cy = np.empty(n)
    hw = np.zeros(n)
    hh = np.zeros(n)
    if pts:
        p = np.asarray(pts, np.float64)
        ispt = kinds == 0
        cx[ispt] = get_world_x(p[:, 0])
        cy[ispt] = get_world_y(p[:, 1])
    if rings:
        lens = np.array([len(r) for r in rings], np.int64)
        allc = np.concatenate(rings)
        wx = get_world_x(allc[:, 0])
        wy = get_world_y(allc[:, 1])
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        x0 = np.minimum.reduceat(wx, starts)
        x1 = np.maximum.reduceat(wx, starts)
        y0 = np.minimum.reduceat(wy, starts)
        y1 = np.maximum.reduceat(wy, starts)
        ispoly = kinds == 1
        cx[ispoly] = (x0 + x1) / 2
        cy[ispoly] = (y0 + y1) / 2
        hw[ispoly] = (x1 - x0) / 2
        hh[ispoly] = (y1 - y0) / 2
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(np.zeros(n, np.int64)),
        "idx": pa.array(feature_idx_from_ids(ids)),
        "cx": pa.array(cx), "cy": pa.array(cy),
        "hw": pa.array(hw), "hh": pa.array(hh),
    })


def read_geojson(paths: str | list[str]) -> "ray.data.Dataset":
    """NDJSON GeoJSON features → georeferenced rows (engine schema).

    Read as text lines (GeoJSON geometry unions are too ragged for
    Arrow JSON schema inference — mirroring the reference's streaming
    feature iterator, ``GeoJsonFeatureIterator.java``) and parsed per
    batch.
    """
    return ray.data.read_text(paths) \
        .map_batches(_features_to_rows, batch_format="pyarrow")
