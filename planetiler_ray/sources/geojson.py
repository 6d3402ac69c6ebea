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


def _features_to_rows(batch: pa.Table) -> pa.Table:
    import json

    feats = [json.loads(line) for line in batch["text"].to_pylist() if line.strip()]
    geoms = [f.get("geometry") for f in feats]
    props = [f.get("properties") or {} for f in feats]
    ids, cxs, cys, hws, hhs, caps = [], [], [], [], [], []
    for i, (geom, prop) in enumerate(zip(geoms, props)):
        gid = str(prop.get("id", f"feat{i:08d}"))
        if geom is None:
            continue
        gtype = geom.get("type")
        if gtype == "Point":
            lon, lat = geom["coordinates"][:2]
            cx = float(get_world_x(lon))
            cy = float(get_world_y(lat))
            hw = hh = 0.0
        elif gtype == "Polygon":
            ring = np.asarray(geom["coordinates"][0], dtype=np.float64)
            wx = get_world_x(ring[:, 0])
            wy = get_world_y(ring[:, 1])
            x0, x1 = float(wx.min()), float(wx.max())
            y0, y1 = float(wy.min()), float(wy.max())
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            hw, hh = (x1 - x0) / 2, (y1 - y0) / 2
        else:  # unsupported geometry types are skipped (counted upstream)
            continue
        ids.append(gid)
        cxs.append(cx)
        cys.append(cy)
        hws.append(hw)
        hhs.append(hh)
        caps.append(str(prop.get("caption", prop.get("name", ""))))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(np.zeros(len(ids), np.int64)),
        "idx": pa.array(np.arange(len(ids), dtype=np.int64)),
        "cx": pa.array(np.array(cxs)), "cy": pa.array(np.array(cys)),
        "hw": pa.array(np.array(hws)), "hh": pa.array(np.array(hhs)),
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
