"""GeoPackage and Natural-Earth-sqlite sources — stdlib sqlite3.

Analogs of the reference's ``reader/GeoPackageReader.java`` (feature
tables listed in ``gpkg_contents``; geometry BLOB = GeoPackage binary
header + WKB) and ``reader/NaturalEarthReader.java:143-190`` (tables
``ne_*`` with a plain-WKB ``GEOMETRY`` column).  Both emit the engine's
FULL-geometry row model (``geom_id, kind, xs, ys`` world-mercator lists
+ requested attribute columns) for the general tile pipeline.

Scale design: sqlite is a single file, but rows shard cleanly by
``rowid`` — the driver reads only ``MIN(rowid)/MAX(rowid)`` per table,
fans out rowid RANGES as a Ray Dataset, and each task opens the file
read-only (``mode=ro`` URI, sqlite allows unlimited concurrent
readers) and decodes just its range.  The reference streams these
single-threaded; this parallelizes the read itself.
"""

from __future__ import annotations

import sqlite3

import numpy as np
import pyarrow as pa

import ray.data

from ..tilemath.projection import get_world_x, get_world_y
from .geoparquet import parse_wkb_parts


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def _ident(name: str) -> str:
    """Double-quote a sqlite identifier — table/column names come from
    file metadata and may contain spaces or dashes."""
    return '"' + str(name).replace('"', '""') + '"'


def strip_gpkg_header(blob: bytes) -> bytes | None:
    """GeoPackage geometry BLOB → raw WKB (spec: 'GP' magic, version,
    flags byte whose bits 1-3 select the envelope size, then srs_id)."""
    if blob is None or len(blob) < 8 or blob[0:2] != b"GP":
        return blob                      # already raw WKB (NE-style)
    flags = blob[3]
    env_code = (flags >> 1) & 0x7
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        return None
    return blob[8 + env_len:]


def gpkg_feature_tables(path: str) -> list[tuple[str, str]]:
    """[(table_name, geometry_column)] from gpkg metadata tables."""
    con = _connect_ro(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, g.column_name FROM gpkg_contents c "
            "JOIN gpkg_geometry_columns g ON g.table_name = c.table_name "
            "WHERE c.data_type = 'features'").fetchall()
        return [(str(t), str(g)) for t, g in rows]
    finally:
        con.close()


def naturalearth_tables(path: str) -> list[tuple[str, str]]:
    """Natural Earth sqlite: every ``ne_*`` table with a GEOMETRY
    column (``NaturalEarthReader.java:143-174`` semantics)."""
    con = _connect_ro(path)
    try:
        names = [r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' "
            "AND name LIKE 'ne_%'").fetchall()]
        out = []
        for t in names:
            cols = [c[1].upper() for c in con.execute(f"PRAGMA table_info({_ident(t)})")]
            if "GEOMETRY" in cols:
                real = [c[1] for c in con.execute(f"PRAGMA table_info({_ident(t)})")
                        if c[1].upper() == "GEOMETRY"][0]
                out.append((t, real))
        return out
    finally:
        con.close()


def _geoms_to_table(gids, blobs, attr_arrays: dict, layer: str) -> pa.Table:
    ids, kinds, xs_l, ys_l, keep = [], [], [], [], []
    for i, (gid, blob) in enumerate(zip(gids, blobs)):
        wkb = strip_gpkg_header(blob)
        # Natural Earth / GPKG layers are mostly Multi* — one row per
        # part, all sharing the feature's geom_id (the reduce groups
        # them back into one MVT feature)
        for kind, coords in (parse_wkb_parts(wkb) if wkb else []):
            ids.append(int(gid))
            kinds.append(kind)
            xs_l.append(get_world_x(coords[:, 0]))
            ys_l.append(get_world_y(coords[:, 1]))
            keep.append(i)
    counts = np.array([len(v) for v in xs_l], np.int64)
    off = pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
    fx = np.concatenate(xs_l) if xs_l else np.empty(0)
    fy = np.concatenate(ys_l) if ys_l else np.empty(0)
    cols = {
        "geom_id": pa.array(np.array(ids, np.int64)),
        "kind": pa.array(kinds, pa.string()),
        "source_layer": pa.array([layer] * len(ids), pa.string()),
        "xs": pa.ListArray.from_arrays(off, pa.array(fx)),
        "ys": pa.ListArray.from_arrays(off, pa.array(fy)),
    }
    keep = np.asarray(keep, np.int64)
    for k, v in attr_arrays.items():
        cols[k] = pa.array([v[i] for i in keep])
    return pa.table(cols)


def _read_sqlite_geoms(path: str, tables: list[tuple[str, str]],
                       attr_cols: list[str] | None,
                       rows_per_chunk: int) -> "ray.data.Dataset":
    con = _connect_ro(path)
    chunks = []
    try:
        for table, gcol in tables:
            lo_hi = con.execute(
                "SELECT MIN(rowid), MAX(rowid) "
                f"FROM {_ident(table)}").fetchone()
            if lo_hi[0] is None:
                continue
            lo, hi = int(lo_hi[0]), int(lo_hi[1])
            for s in range(lo, hi + 1, rows_per_chunk):
                chunks.append({"path": path, "table": table, "gcol": gcol,
                               "lo": s, "hi": min(s + rows_per_chunk - 1, hi)})
    finally:
        con.close()

    want = list(attr_cols or [])

    def parse_chunk(batch: pa.Table) -> pa.Table:
        tables_out = []
        for row in batch.to_pylist():
            c = _connect_ro(row["path"])
            try:
                sel = ", ".join(
                    ["rowid"] + [_ident(c_) for c_ in [row["gcol"]] + want])
                rows = c.execute(
                    f"SELECT {sel} FROM {_ident(row['table'])} "
                    f"WHERE rowid BETWEEN ? AND ?",
                    (row["lo"], row["hi"])).fetchall()
            finally:
                c.close()
            gids = [r[0] for r in rows]
            blobs = [r[1] for r in rows]
            attrs = {k: [r[2 + i] for r in rows] for i, k in enumerate(want)}
            tables_out.append(_geoms_to_table(gids, blobs, attrs, row["table"]))
        return pa.concat_tables(tables_out, promote_options="default")

    return ray.data.from_items(chunks).map_batches(
        parse_chunk, batch_format="pyarrow", batch_size=1)


def read_geopackage(path: str, attr_cols: list[str] | None = None,
                    rows_per_chunk: int = 8192) -> "ray.data.Dataset":
    """GeoPackage → Ray Dataset of FULL-geometry rows, one source_layer
    per feature table."""
    return _read_sqlite_geoms(path, gpkg_feature_tables(path),
                              attr_cols, rows_per_chunk)


def read_naturalearth(path: str, attr_cols: list[str] | None = None,
                      rows_per_chunk: int = 8192) -> "ray.data.Dataset":
    """Natural Earth sqlite → Ray Dataset of FULL-geometry rows."""
    return _read_sqlite_geoms(path, naturalearth_tables(path),
                              attr_cols, rows_per_chunk)
