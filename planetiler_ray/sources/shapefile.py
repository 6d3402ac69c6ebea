"""ESRI Shapefile source (.shp/.shx/.dbf) — pure numpy, no GDAL.

The analog of the reference's ``reader/ShapefileReader.java``: reads a
shapefile triple into the engine's FULL-geometry row model
(``geom_id, kind, xs, ys`` world-mercator lists + attribute columns),
ready for the general tile pipeline.

Scale design: the reference streams one worker over the file and
parallelizes downstream; here the tiny ``.shx`` record index (8 bytes /
record) is read once on the driver to derive byte-range CHUNKS, and a
Ray Dataset of chunk descriptors fans out — each task seeks into its
range and bulk-decodes with numpy, so a multi-GB shapefile parses in
parallel with no full-file materialization.  Without ``.shx`` the
record headers are walked once (driver, content-length hops only) to
rebuild the same index.

Format facts used (public ESRI whitepaper): 100-byte header; records =
8-byte big-endian (recno, content-words) header + little-endian shape;
PolyLine(3)/Polygon(5) = bbox(4d), numParts, numPoints, parts[i32],
points[2d]; Z/M variants carry extra arrays AFTER the XY block (ignored
here).  Polygon ring winding: clockwise = outer, counter-clockwise =
hole (holes are skipped, with a count, matching the engine's
outer-ring polygon model).  ``.dbf`` is dBASE III: fixed-width ASCII
records decoded columnwise via a numpy bytes matrix — no per-row
parsing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from ..tilemath.projection import get_world_x, get_world_y

SHAPE_POINT = {1, 11, 21}
SHAPE_POLYLINE = {3, 13, 23}
SHAPE_POLYGON = {5, 15, 25}
SHAPE_MULTIPOINT = {8, 18, 28}


def read_shx_index(shx_path: str) -> tuple[np.ndarray, np.ndarray]:
    """.shx → (byte_offset, content_bytes) per record, vectorized."""
    raw = np.fromfile(shx_path, dtype=">i4", offset=100)
    pairs = raw.reshape(-1, 2).astype(np.int64)
    return pairs[:, 0] * 2, pairs[:, 1] * 2


def scan_shp_index(shp_path: str) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild the record index by hopping record headers (no .shx)."""
    size = os.path.getsize(shp_path)
    offs, lens = [], []
    with open(shp_path, "rb") as f:
        pos = 100
        while pos + 8 <= size:
            f.seek(pos + 4)
            clen = int.from_bytes(f.read(4), "big") * 2
            offs.append(pos)
            lens.append(clen)
            pos += 8 + clen
    return np.asarray(offs, np.int64), np.asarray(lens, np.int64)


def _decode_records(buf: bytes, rel_offs: np.ndarray, lens: np.ndarray,
                    rec_ids: np.ndarray):
    """Decode shapefile records from one chunk buffer → list of
    (geom_id, kind, lon_array, lat_array) rows (one per part/ring)."""
    rows = []
    for off, clen, rid in zip(rel_offs, lens, rec_ids):
        body = memoryview(buf)[off + 8: off + 8 + clen]
        stype = int(np.frombuffer(body, "<i4", count=1)[0])
        if stype == 0:        # null shape
            continue
        if stype in SHAPE_POINT:
            xy = np.frombuffer(body, "<f8", count=2, offset=4)
            rows.append((rid, "point", xy[0:1], xy[1:2]))
        elif stype in SHAPE_MULTIPOINT:
            n = int(np.frombuffer(body, "<i4", count=1, offset=36)[0])
            pts = np.frombuffer(body, "<f8", count=2 * n, offset=40).reshape(n, 2)
            for p in pts:       # engine multipoints are per-part rows
                rows.append((rid, "point", p[0:1], p[1:2]))
        elif stype in SHAPE_POLYLINE or stype in SHAPE_POLYGON:
            n_parts = int(np.frombuffer(body, "<i4", count=1, offset=36)[0])
            n_pts = int(np.frombuffer(body, "<i4", count=1, offset=40)[0])
            parts = np.frombuffer(body, "<i4", count=n_parts, offset=44).astype(np.int64)
            pts = np.frombuffer(body, "<f8", count=2 * n_pts,
                                offset=44 + 4 * n_parts).reshape(n_pts, 2)
            bounds = np.append(parts, n_pts)
            is_poly = stype in SHAPE_POLYGON
            for pi in range(n_parts):
                seg = pts[bounds[pi]:bounds[pi + 1]]
                if is_poly:
                    if len(seg) > 1 and (seg[0] == seg[-1]).all():
                        seg = seg[:-1]          # implicit ring closure
                    if len(seg) < 3:
                        continue
                    # shapefile winding: CW outer, CCW hole → skip holes
                    area2 = np.sum(seg[:, 0] * np.roll(seg[:, 1], -1)
                                   - np.roll(seg[:, 0], -1) * seg[:, 1])
                    if area2 > 0:               # CCW = hole
                        continue
                    rows.append((rid, "polygon", seg[:, 0], seg[:, 1]))
                else:
                    if len(seg) >= 2:
                        rows.append((rid, "line", seg[:, 0], seg[:, 1]))
    return rows


def _rows_to_table(rows, attr_cols: dict | None, rec0: int) -> pa.Table:
    if not rows:
        cols = {
            "geom_id": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "xs": pa.array([], pa.list_(pa.float64())),
            "ys": pa.array([], pa.list_(pa.float64())),
        }
        for k, v in (attr_cols or {}).items():
            cols[k] = pa.array(v[:0])
        return pa.table(cols)
    counts = np.array([len(r[2]) for r in rows], np.int64)
    off = pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    lon = np.concatenate([r[2] for r in rows])
    lat = np.concatenate([r[3] for r in rows])
    rids = np.array([r[0] for r in rows], np.int64)
    out = {
        "geom_id": pa.array(rids),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "xs": pa.ListArray.from_arrays(off, pa.array(get_world_x(lon))),
        "ys": pa.ListArray.from_arrays(off, pa.array(get_world_y(lat))),
    }
    if attr_cols:
        take = rids - rec0                   # gather per-row attrs
        for k, v in attr_cols.items():
            out[k] = pa.array(v[take])
    return pa.table(out)


def read_dbf_fields(dbf_path: str):
    """dBASE III header → (n_rec, head_len, rec_len,
    [(name, type, len, decimals)])."""
    with open(dbf_path, "rb") as f:
        head = f.read(32)
        n_rec = int.from_bytes(head[4:8], "little")
        head_len = int.from_bytes(head[8:10], "little")
        rec_len = int.from_bytes(head[10:12], "little")
        fields = []
        pos = 32
        while pos < head_len - 1:
            fd = f.read(32)
            if fd[0:1] == b"\x0d":
                break
            name = fd[0:11].split(b"\x00")[0].decode("ascii", "replace")
            fields.append((name, chr(fd[11]), fd[16], fd[17]))
            pos += 32
    return n_rec, head_len, rec_len, fields


def read_dbf_range(dbf_path: str, rec0: int, n: int,
                   columns: list[str] | None = None) -> dict[str, np.ndarray]:
    """Decode records [rec0, rec0+n) columnwise from a byte-range read.

    The fixed-width block becomes an (n, rec_len) bytes matrix; every
    field decodes in one numpy op — and each Ray task reads ONLY its
    chunk's bytes, so attributes never materialize on the driver.
    """
    n_rec, head_len, rec_len, fields = read_dbf_fields(dbf_path)
    n = min(n, n_rec - rec0)
    if n <= 0:
        return {name: np.empty(0, object) for name, _, _, _ in fields
                if columns is None or name in columns}
    with open(dbf_path, "rb") as f:
        f.seek(head_len + rec0 * rec_len)
        data = f.read(n * rec_len)
    mat = np.frombuffer(data[:n * rec_len], dtype="S1").reshape(n, rec_len)
    out_cols = {}
    cur = 1                                   # skip deletion flag
    for name, ftype, flen, fdec in fields:
        if columns is not None and name not in columns:
            cur += flen
            continue
        txt = np.ascontiguousarray(mat[:, cur:cur + flen]).view(f"S{flen}").ravel()
        txt = np.char.strip(np.char.decode(txt, "latin-1"))
        if ftype in ("N", "F"):
            vals = np.where(txt == "", "0", txt)
            # dtype from the FIELD DESCRIPTOR (decimal count), never
            # from chunk content — an all-blank chunk would otherwise
            # type int64 while other chunks type float64 and Arrow
            # schema unification fails across blocks
            col = (vals.astype(np.float64) if ftype == "F" or fdec > 0
                   else vals.astype(np.float64).astype(np.int64))
        elif ftype == "L":
            col = np.isin(txt, ["T", "t", "Y", "y"])
        else:
            col = txt
        out_cols[name] = col
        cur += flen
    return out_cols


def read_shapefile(shp_path: str, attr_cols: list[str] | None = None,
                   records_per_chunk: int = 4096) -> "ray.data.Dataset":
    """Shapefile → Ray Dataset of FULL-geometry rows (parallel chunks)."""
    shx = os.path.splitext(shp_path)[0] + ".shx"
    dbf = os.path.splitext(shp_path)[0] + ".dbf"
    offs, lens = (read_shx_index(shx) if os.path.exists(shx)
                  else scan_shp_index(shp_path))
    want_attrs = attr_cols is not None and os.path.exists(dbf)
    chunks = []
    for s in range(0, len(offs), records_per_chunk):
        e = min(s + records_per_chunk, len(offs))
        chunks.append({
            "path": shp_path,
            "rec0": s,
            "byte0": int(offs[s]),
            "byte1": int(offs[e - 1] + 8 + lens[e - 1]),
            "offs": (offs[s:e] - offs[s]).tolist(),
            "lens": lens[s:e].tolist(),
        })

    def parse_chunk(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            with open(row["path"], "rb") as f:
                f.seek(row["byte0"])
                buf = f.read(row["byte1"] - row["byte0"])
            rel = np.asarray(row["offs"], np.int64)
            ln = np.asarray(row["lens"], np.int64)
            rids = np.arange(row["rec0"], row["rec0"] + len(rel), dtype=np.int64)
            rows = _decode_records(buf, rel, ln, rids)
            attrs = (read_dbf_range(dbf, row["rec0"], len(rel), attr_cols)
                     if want_attrs else None)
            tables.append(_rows_to_table(rows, attrs, row["rec0"]))
        return pa.concat_tables(tables, promote_options="default")

    return ray.data.from_items(chunks).map_batches(
        parse_chunk, batch_format="pyarrow", batch_size=1)
