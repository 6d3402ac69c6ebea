"""Deterministic geo-format fixtures derived from the events table.

The driver's oracle gate can only recompute from the parquet tables, so
to oracle-gate the shapefile / GeoPackage / Natural-Earth READERS we
write those formats from a pure function of ``events`` and read them
back: lon/lat are integer-arithmetic functions of ``event_id`` /
``user_id`` that ANSI SQL replicates exactly, attrs carry the ids.

Layout (one fixture dir per sf dir, cached):

- ``points.shp/.shx/.dbf`` — point records, DBF ``NAME`` C(20) =
  ``e<event_id>``, ``RANK`` N(18) = event_id (shapefile spec structs
  as in ``reader/ShapefileReader.java`` semantics).
- ``points.gpkg`` — SQLite with ``gpkg_contents`` /
  ``gpkg_geometry_columns`` and a ``events_pts`` feature table of
  GP-header point blobs.
- ``natural_earth.sqlite`` — ``ne_10m_events`` table of raw WKB points
  (the Natural-Earth sqlite shape).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pyarrow.parquet as pq

FIXTURE_ROOT = "/tmp/planetiler_ray_fixtures"
N_FIXTURE_ROWS = 400


def fixture_lonlat(event_id: np.ndarray,
                   user_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-arithmetic lon/lat (exact in float64 and in SQL)."""
    lon = ((event_id * 37) % 348).astype(np.float64) - 174.0 + 0.5
    lat = ((user_id * 13) % 156).astype(np.float64) - 78.0 + 0.5
    return lon, lat


def _write_shapefile(base: str, lon, lat, eids) -> None:
    recs = [struct.pack("<i2d", 1, float(x), float(y))
            for x, y in zip(lon, lat)]
    payload = b"".join(
        struct.pack(">ii", i + 1, len(c) // 2) + c
        for i, c in enumerate(recs))
    bbox = (float(lon.min()), float(lat.min()),
            float(lon.max()), float(lat.max()))
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0,
                         (100 + len(payload)) // 2)
    header += struct.pack("<ii4d4d", 1000, 1, *bbox, 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f:
        f.write(header + payload)

    idx = b""
    off = 100
    for c in recs:
        idx += struct.pack(">ii", off // 2, len(c) // 2)
        off += 8 + len(c)
    hdr2 = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(idx)) // 2)
    hdr2 += struct.pack("<ii4d4d", 1000, 1, *bbox, 0, 0, 0, 0)
    with open(base + ".shx", "wb") as f:
        f.write(hdr2 + idx)

    # DBF: NAME C(20), RANK N(18)
    rec_len = 1 + 20 + 18
    head_len = 32 + 2 * 32 + 1
    dbf = bytearray()
    dbf += bytes([3, 126, 1, 1]) + struct.pack("<i", len(eids))
    dbf += struct.pack("<hh", head_len, rec_len) + bytes(20)
    dbf += b"NAME".ljust(11, b"\x00") + b"C" + bytes(4) \
        + bytes([20, 0]) + bytes(14)
    dbf += b"RANK".ljust(11, b"\x00") + b"N" + bytes(4) \
        + bytes([18, 0]) + bytes(14)
    dbf += b"\x0d"
    for e in eids:
        dbf += b" " + f"e{int(e)}".ljust(20).encode() \
            + f"{int(e)}".rjust(18).encode()
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(dbf))


def _wkb_point(x: float, y: float) -> bytes:
    return b"\x01" + struct.pack("<I", 1) + struct.pack("<2d", x, y)


def _gp_blob(wkb: bytes) -> bytes:
    return b"GP" + bytes([0, 0b1]) + struct.pack("<i", 4326) + wkb


def _write_gpkg(path: str, lon, lat, eids) -> None:
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents "
                "(table_name TEXT, data_type TEXT)")
    con.execute("CREATE TABLE gpkg_geometry_columns "
                "(table_name TEXT, column_name TEXT)")
    con.execute("CREATE TABLE events_pts (fid INTEGER PRIMARY KEY, "
                "geom BLOB, name TEXT, rank INTEGER)")
    con.execute("INSERT INTO gpkg_contents VALUES ('events_pts', 'features')")
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES ('events_pts', 'geom')")
    con.executemany(
        "INSERT INTO events_pts VALUES (?,?,?,?)",
        [(i + 1, _gp_blob(_wkb_point(float(x), float(y))),
          f"e{int(e)}", int(e))
         for i, (x, y, e) in enumerate(zip(lon, lat, eids))])
    con.commit()
    con.close()


def _write_ne(path: str, lon, lat, eids) -> None:
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE ne_10m_events (ogc_fid INTEGER PRIMARY KEY, "
                "GEOMETRY BLOB, name TEXT, rank INTEGER)")
    con.execute("CREATE TABLE not_a_layer (x INTEGER)")
    con.executemany(
        "INSERT INTO ne_10m_events VALUES (?,?,?,?)",
        [(i + 1, _wkb_point(float(x), float(y)), f"e{int(e)}", int(e))
         for i, (x, y, e) in enumerate(zip(lon, lat, eids))])
    con.commit()
    con.close()


def geo_fixture_dir(sf_dir: str, n: int = N_FIXTURE_ROWS) -> str:
    """Write (once, cached) the three geo-format fixtures for ``sf_dir``
    and return the fixture directory."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(FIXTURE_ROOT, f"geo_{tag}_{n}")
    done = os.path.join(out, ".done")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_id", "user_id"])
    order = np.argsort(t["event_id"].to_numpy(), kind="stable")[:n]
    eids = t["event_id"].to_numpy()[order]
    uids = t["user_id"].to_numpy()[order]
    lon, lat = fixture_lonlat(eids, uids)
    _write_shapefile(os.path.join(out, "points"), lon, lat, eids)
    _write_gpkg(os.path.join(out, "points.gpkg"), lon, lat, eids)
    _write_ne(os.path.join(out, "natural_earth.sqlite"), lon, lat, eids)
    with open(done, "w") as f:
        f.write("ok")
    return out
