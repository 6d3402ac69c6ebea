"""Shapefile / GeoPackage / Natural Earth source tests over
deterministic synthetic files (no external data)."""

import sqlite3
import struct

import numpy as np
import pytest

from planetiler_ray.sources.gpkg import (read_geopackage, read_naturalearth,
                                         strip_gpkg_header)
from planetiler_ray.sources.shapefile import (read_dbf_range, read_shapefile,
                                              read_shx_index, scan_shp_index)
from planetiler_ray.tilemath.projection import get_world_x, get_world_y


# ------------------------------------------------------------ shapefile gen

def _shp_record(recno: int, content: bytes) -> bytes:
    return struct.pack(">ii", recno, len(content) // 2) + content


def _poly_content(stype: int, parts: list[np.ndarray]) -> bytes:
    allpts = np.concatenate(parts)
    bbox = (allpts[:, 0].min(), allpts[:, 1].min(),
            allpts[:, 0].max(), allpts[:, 1].max())
    offs, cur = [], 0
    for p in parts:
        offs.append(cur)
        cur += len(p)
    body = struct.pack("<i4d", stype, *bbox)
    body += struct.pack("<ii", len(parts), cur)
    body += struct.pack(f"<{len(parts)}i", *offs)
    body += allpts.astype("<f8").tobytes()
    return body


def _write_shapefile(base):
    # rec 0: point (10, 20)
    recs = [struct.pack("<i2d", 1, 10.0, 20.0)]
    # rec 1: polyline with 2 parts
    l1 = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    l2 = np.array([[5.0, 5.0], [6.0, 5.0]])
    recs.append(_poly_content(3, [l1, l2]))
    # rec 2: polygon outer (CW = outer in shapefile) + CCW hole, closed rings
    outer = np.array([[0.0, 0.0], [0.0, 4.0], [4.0, 4.0], [4.0, 0.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    recs.append(_poly_content(5, [outer, hole]))
    # rec 3: multipoint of 2
    mp = np.array([[7.0, 7.0], [8.0, 8.0]])
    body = struct.pack("<i4d", 8, 7.0, 7.0, 8.0, 8.0)
    body += struct.pack("<i", 2) + mp.astype("<f8").tobytes()
    recs.append(body)

    payload = b"".join(_shp_record(i + 1, c) for i, c in enumerate(recs))
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(payload)) // 2)
    header += struct.pack("<ii4d4d", 1000, 1, 0, 0, 10, 20, 0, 0, 0, 0)
    (base.with_suffix(".shp")).write_bytes(header + payload)

    # shx
    idx = b""
    off = 100
    for c in recs:
        idx += struct.pack(">ii", off // 2, len(c) // 2)
        off += 8 + len(c)
    hdr2 = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(idx)) // 2)
    hdr2 += struct.pack("<ii4d4d", 1000, 1, 0, 0, 10, 20, 0, 0, 0, 0)
    (base.with_suffix(".shx")).write_bytes(hdr2 + idx)

    # dbf: fields NAME C(8), RANK N(4)
    names = [b"alpha   ", b"beta    ", b"gamma   ", b"delta   "]
    ranks = [b"   1", b"  22", b" 333", b"4444"]
    rec_len = 1 + 8 + 4
    head_len = 32 + 2 * 32 + 1
    dbf = bytearray()
    dbf += bytes([3, 126, 1, 1]) + struct.pack("<i", 4)
    dbf += struct.pack("<hh", head_len, rec_len) + bytes(20)
    dbf += b"NAME".ljust(11, b"\x00") + b"C" + bytes(4) + bytes([8, 0]) + bytes(14)
    dbf += b"RANK".ljust(11, b"\x00") + b"N" + bytes(4) + bytes([4, 0]) + bytes(14)
    dbf += b"\x0d"
    for nm, rk in zip(names, ranks):
        dbf += b" " + nm + rk
    (base.with_suffix(".dbf")).write_bytes(bytes(dbf))


@pytest.fixture()
def shapefile(tmp_path):
    base = tmp_path / "test"
    _write_shapefile(base)
    return base


def test_shx_scan_equivalence(shapefile):
    o1, l1 = read_shx_index(str(shapefile.with_suffix(".shx")))
    o2, l2 = scan_shp_index(str(shapefile.with_suffix(".shp")))
    assert o1.tolist() == o2.tolist() and l1.tolist() == l2.tolist()


def test_dbf_range_decode(shapefile):
    cols = read_dbf_range(str(shapefile.with_suffix(".dbf")), 0, 4)
    assert cols["NAME"].tolist() == ["alpha", "beta", "gamma", "delta"]
    assert cols["RANK"].tolist() == [1, 22, 333, 4444]
    part = read_dbf_range(str(shapefile.with_suffix(".dbf")), 2, 2, ["RANK"])
    assert part["RANK"].tolist() == [333, 4444]
    assert "NAME" not in part


def test_read_shapefile_geometries(shapefile, ray_session):
    ds = read_shapefile(str(shapefile.with_suffix(".shp")),
                        attr_cols=["NAME", "RANK"])
    rows = sorted(ds.take_all(), key=lambda r: (r["geom_id"], r["xs"][0]))
    kinds = [(r["geom_id"], r["kind"]) for r in rows]
    # point, 2 line parts, 1 polygon (hole skipped), 2 multipoint rows
    assert kinds == [(0, "point"), (1, "line"), (1, "line"),
                     (2, "polygon"), (3, "point"), (3, "point")]
    pt = rows[0]
    assert pt["xs"][0] == pytest.approx(float(get_world_x(10.0)))
    assert pt["ys"][0] == pytest.approx(float(get_world_y(20.0)))
    assert pt["NAME"] == "alpha" and pt["RANK"] == 1
    poly = rows[3]
    assert len(poly["xs"]) == 4                  # closure stripped
    assert poly["NAME"] == "gamma" and poly["RANK"] == 333
    line2 = rows[2]
    assert len(line2["xs"]) in (2, 3)


# ------------------------------------------------------- geopackage / NE

def _wkb_point(x, y):
    return b"\x01" + struct.pack("<I", 1) + struct.pack("<2d", x, y)


def _wkb_line(coords):
    c = np.asarray(coords, float)
    return (b"\x01" + struct.pack("<I", 2) + struct.pack("<I", len(c))
            + c.astype("<f8").tobytes())


def _wkb_polygon(ring):
    c = np.asarray(ring, float)
    return (b"\x01" + struct.pack("<I", 3) + struct.pack("<I", 1)
            + struct.pack("<I", len(c)) + c.astype("<f8").tobytes())


def _gp_blob(wkb, with_envelope=False):
    flags = 0b00000011 if with_envelope else 0b00000001   # LE byte order bit
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", 4326)
    if with_envelope:
        head += struct.pack("<4d", 0, 1, 0, 1)
    return head + wkb


def test_strip_gpkg_header_variants():
    wkb = _wkb_point(1, 2)
    assert strip_gpkg_header(_gp_blob(wkb)) == wkb
    assert strip_gpkg_header(_gp_blob(wkb, with_envelope=True)) == wkb
    assert strip_gpkg_header(wkb) == wkb          # raw passthrough


@pytest.fixture()
def gpkg_file(tmp_path):
    p = tmp_path / "data.gpkg"
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    con.execute("CREATE TABLE gpkg_geometry_columns "
                "(table_name TEXT, column_name TEXT)")
    con.execute("CREATE TABLE pois (fid INTEGER PRIMARY KEY, geom BLOB, "
                "name TEXT, pop INTEGER)")
    con.execute("INSERT INTO gpkg_contents VALUES ('pois', 'features')")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('pois', 'geom')")
    rows = [
        (1, _gp_blob(_wkb_point(10.0, 20.0)), "a", 100),
        (2, _gp_blob(_wkb_line([[0, 0], [1, 1], [2, 0]]), with_envelope=True), "b", 200),
        (3, _gp_blob(_wkb_polygon([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])), "c", 300),
    ]
    con.executemany("INSERT INTO pois VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()
    return p


def test_read_geopackage(gpkg_file, ray_session):
    ds = read_geopackage(str(gpkg_file), attr_cols=["name", "pop"])
    rows = sorted(ds.take_all(), key=lambda r: r["geom_id"])
    assert [r["kind"] for r in rows] == ["point", "line", "polygon"]
    assert [r["name"] for r in rows] == ["a", "b", "c"]
    assert [r["pop"] for r in rows] == [100, 200, 300]
    assert rows[0]["source_layer"] == "pois"
    assert rows[0]["xs"][0] == pytest.approx(float(get_world_x(10.0)))
    assert len(rows[2]["xs"]) == 4                # ring closure stripped


@pytest.fixture()
def ne_file(tmp_path):
    p = tmp_path / "natural_earth.sqlite"
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE ne_10m_lakes (ogc_fid INTEGER PRIMARY KEY, "
                "GEOMETRY BLOB, name TEXT)")
    con.execute("CREATE TABLE not_a_layer (x INTEGER)")   # must be ignored
    con.executemany(
        "INSERT INTO ne_10m_lakes VALUES (?,?,?)",
        [(1, _wkb_polygon([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]), "lake1"),
         (2, _wkb_point(5.0, 5.0), "lake2")])
    con.commit()
    con.close()
    return p


def test_read_naturalearth(ne_file, ray_session):
    ds = read_naturalearth(str(ne_file), attr_cols=["name"])
    rows = sorted(ds.take_all(), key=lambda r: r["geom_id"])
    assert [r["kind"] for r in rows] == ["polygon", "point"]
    assert [r["name"] for r in rows] == ["lake1", "lake2"]
    assert rows[0]["source_layer"] == "ne_10m_lakes"
