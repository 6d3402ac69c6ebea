"""Deterministic synthetic OSM world → PBF fixture (no external data).

Drives the OSM PBF reader family (``sources/osmpbf.py``,
``pipelines/osm.py``) from the driver's correctness gate: every
node/way/relation is a pure integer formula of its id, scaled by the
``documents`` row count, so a DuckDB oracle can re-derive the exact
same world from ``generate_series`` (see ``pipelines/sqlgen.py``
``sql_osm_way_stats`` / ``sql_osm_multipolygon_stats``).

World layout for ``n_docs`` documents:

  generic nodes  i = 1..N,  N = 4·n_docs
      lon_e7(i) = (i·2654435761) mod 3400000000 − 1700000000
      lat_e7(i) = (i·2246822519) mod 1600000000 −  800000000
      every 10th node carries tag ``poi = str(i mod 7)``
  generic ways   w = 1..W,  W = n_docs
      L(w) = 4 + (w mod 4) refs; ref k = 1 + (w·7919 + k·104729) mod N
      tags: ``highway = CLS[w mod 5]``; ``name = "way " + w`` when w≡0 (3)
  relations      r = 1..R,  R = max(1, n_docs // 100) — THREE families
      per r, all centered on the same deterministic point:
        center:  cx_e7(r) = (r·1076767) mod 3000000000 − 1500000000
                 cy_e7(r) = (r·433494437) mod 1400000000 − 700000000
      family 1 (square-with-hole, rel_id 10^7 + r): an axis-aligned
        square (half-side 0.02°) with a square hole (half-side 0.006°),
        outer split into two open ways + one closed hole way, roles
        outer/outer/inner.  Node ids 10^7 + 100r + 0..7, way ids
        10^6 + 10r + 0..2.
      family 2 (cshape, rel_id 2·10^7 + r): a C-shaped outer (the
        square with a rectangular notch cut from its right edge to the
        center, half-height 0.006°) plus a DISJOINT small square
        (half-side 0.003°) sitting inside the notch — geometrically
        outside the C but inside its bbox.  Two shells, zero holes:
        the adversarial case for bbox-only hole nesting
        (``OsmMultipolygon.java:178-237`` real-containment semantics).
        Node ids 2·10^7 + 100r + 0..11, way ids 2·10^6 + 10r + 0..2.
      family 3 (nested3, rel_id 3·10^7 + r): three concentric squares
        (half-sides 0.02° / 0.012° / 0.004°) — island-in-lake-in-island
        3-level nesting: shell, hole, shell again (depth parity).
        Node ids 3·10^7 + 100r + 0..11, way ids 3·10^6 + 10r + 0..3.
      All three tagged ``type=multipolygon``.

The PBF encoder here is a fixture generator, not a scale path — plain
Python packing is fine at fixture sizes (≤10⁵ elements).
"""

from __future__ import annotations

import os
import struct
import tempfile
import zlib

import numpy as np

CACHE_DIR = "/tmp/planetiler_ray_fixtures"

LON_MULT, LON_MOD, LON_OFF = 2654435761, 3400000000, 1700000000
LAT_MULT, LAT_MOD, LAT_OFF = 2246822519, 1600000000, 800000000
REF_A, REF_B = 7919, 104729
CX_MULT, CX_MOD, CX_OFF = 1076767, 3000000000, 1500000000
CY_MULT, CY_MOD, CY_OFF = 433494437, 1400000000, 700000000
SQ_HALF, HOLE_HALF = 200000, 60000           # 1e-7° units
NOTCH_HALF = 60000                           # cshape notch half-height
ISLE_HALF = 30000                            # cshape disjoint square half-side
ISLE_CX = 100000                             # its center offset from cx
MID_HALF, INNER_HALF = 120000, 40000         # nested3 middle/inner half-sides
REL_NODE_BASE, REL_WAY_BASE = 10_000_000, 1_000_000
CLS = ["motorway", "primary", "secondary", "residential", "path"]


def node_lon_e7(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, np.int64)
    return (i * LON_MULT) % LON_MOD - LON_OFF


def node_lat_e7(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, np.int64)
    return (i * LAT_MULT) % LAT_MOD - LAT_OFF


def way_refs(w: int, n_nodes: int) -> list[int]:
    L = 4 + (w % 4)
    return [1 + (w * REF_A + k * REF_B) % n_nodes for k in range(L)]


def rel_center_e7(r: int) -> tuple[int, int]:
    return ((r * CX_MULT) % CX_MOD - CX_OFF,
            (r * CY_MULT) % CY_MOD - CY_OFF)


def _square(cx: int, cy: int, half: int) -> list[tuple[int, int]]:
    return [(cx - half, cy - half), (cx + half, cy - half),
            (cx + half, cy + half), (cx - half, cy + half)]


def rel_corners_e7(r: int) -> list[tuple[int, int]]:
    """8 corners: outer square c0..c3 (CCW in lon/lat) then hole c4..c7."""
    cx, cy = rel_center_e7(r)
    return _square(cx, cy, SQ_HALF) + _square(cx, cy, HOLE_HALF)


def cshape_corners_e7(r: int) -> list[tuple[int, int]]:
    """12 corners: C-shape v0..v7 (CCW in lon/lat; rectangular notch cut
    from the right edge in to the center, half-height ``NOTCH_HALF``)
    then the disjoint small square b0..b3 inside the notch."""
    cx, cy = rel_center_e7(r)
    a, h = SQ_HALF, NOTCH_HALF
    cshape = [(cx - a, cy - a), (cx + a, cy - a), (cx + a, cy - h),
              (cx, cy - h), (cx, cy + h), (cx + a, cy + h),
              (cx + a, cy + a), (cx - a, cy + a)]
    return cshape + _square(cx + ISLE_CX, cy, ISLE_HALF)


def nested3_corners_e7(r: int) -> list[tuple[int, int]]:
    """12 corners: outer o0..o3, middle m0..m3, inner i0..i3 —
    island-in-lake-in-island concentric squares."""
    cx, cy = rel_center_e7(r)
    return (_square(cx, cy, SQ_HALF) + _square(cx, cy, MID_HALF)
            + _square(cx, cy, INNER_HALF))


SUPER_DX = 600000                            # family-4 child-square offset


def superrel_corners_e7(r: int) -> list[tuple[int, int]]:
    """8 corners: two disjoint squares (half-side SQ_HALF) at
    cx ± SUPER_DX — each owned by a CHILD relation of the family-4
    super-relation (relation-in-relation closure)."""
    cx, cy = rel_center_e7(r)
    return (_square(cx - SUPER_DX, cy, SQ_HALF)
            + _square(cx + SUPER_DX, cy, SQ_HALF))


# ---------------------------------------------------------------------------
# minimal protobuf/PBF encode (fixture-only)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _key(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _vi(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def _packed(field: int, values, zz=False) -> bytes:
    return _ld(field, b"".join(
        _varint(_zz(v) if zz else v) for v in values))


def _delta(vals):
    prev, out = 0, []
    for v in vals:
        out.append(v - prev)
        prev = v
    return out


def _block(strings: list[str], groups: list[bytes]) -> bytes:
    body = _ld(1, b"".join(_ld(1, s.encode()) for s in strings))
    for g in groups:
        body += _ld(2, g)
    return body


def _frame(btype: str, payload: bytes) -> bytes:
    z = zlib.compress(payload)
    blob = _vi(2, len(payload)) + _ld(3, z)
    header = _ld(1, btype.encode()) + _vi(3, len(blob))
    return struct.pack(">i", len(header)) + header + blob


def _dense_nodes(ids, lat_e7, lon_e7, keys_vals) -> bytes:
    # units are 1e-7° (granularity 100 × nano-degrees)
    body = _packed(1, _delta(ids), zz=True)
    body += _packed(8, _delta(lat_e7), zz=True)
    body += _packed(9, _delta(lon_e7), zz=True)
    if keys_vals:
        body += _packed(10, keys_vals)
    return _ld(2, body)


def _way(wid, refs, keyidx=(), validx=()) -> bytes:
    body = _vi(1, wid)
    if keyidx:
        body += _packed(2, keyidx)
        body += _packed(3, validx)
    body += _packed(8, _delta(refs), zz=True)
    return _ld(3, body)


def _relation(rid, memids, types, roleidx, keyidx=(), validx=()) -> bytes:
    body = _vi(1, rid)
    if keyidx:
        body += _packed(2, keyidx)
        body += _packed(3, validx)
    body += _packed(8, roleidx)
    body += _packed(9, _delta(memids), zz=True)
    body += _packed(10, types)
    return _ld(4, body)


# ---------------------------------------------------------------------------
# world generation
# ---------------------------------------------------------------------------


def build_osm_world(path: str, n_docs: int,
                    nodes_per_block: int = 8000,
                    ways_per_block: int = 2000) -> None:
    n_nodes, n_ways = 4 * n_docs, n_docs
    n_rels = max(1, n_docs // 100)
    frames = []

    # generic nodes (tag every 10th: poi = str(i % 7))
    poi_strings = [str(d) for d in range(7)]
    strings = ["", "poi"] + poi_strings
    sidx = {s: i for i, s in enumerate(strings)}
    for s in range(1, n_nodes + 1, nodes_per_block):
        ids = list(range(s, min(s + nodes_per_block, n_nodes + 1)))
        lons = node_lon_e7(np.array(ids)).tolist()
        lats = node_lat_e7(np.array(ids)).tolist()
        kv = []
        for i in ids:
            if i % 10 == 0:
                kv += [sidx["poi"], sidx[str(i % 7)]]
            kv.append(0)
        frames.append(_frame("OSMData", _block(
            strings, [_dense_nodes(ids, lats, lons, kv)])))

    # generic ways
    wstrings = ["", "highway", "name"] + CLS
    widx = {s: i for i, s in enumerate(wstrings)}
    for s in range(1, n_ways + 1, ways_per_block):
        group = b""
        names = []
        for w in range(s, min(s + ways_per_block, n_ways + 1)):
            keyi, vali = [widx["highway"]], [widx[CLS[w % 5]]]
            if w % 3 == 0:
                name = f"way {w}"
                if name not in names:
                    names.append(name)
                keyi.append(widx["name"])
                vali.append(len(wstrings) + names.index(name))
            group += _way(w, way_refs(w, n_nodes), keyi, vali)
        frames.append(_frame("OSMData", _block(wstrings + names, [group])))

    # relations: three multipolygon families on dedicated nodes/ways
    rstrings = ["", "type", "multipolygon", "outer", "inner"]
    ridx = {s: i for i, s in enumerate(rstrings)}
    nd_ids, nd_lon, nd_lat = [], [], []
    wgroup, rgroup = b"", b""

    def add_nodes(base, corners):
        for c, (x, y) in enumerate(corners):
            nd_ids.append(base + c)
            nd_lon.append(x)
            nd_lat.append(y)

    for r in range(1, n_rels + 1):
        # family 1: square with hole (outer split in two + closed hole)
        base = REL_NODE_BASE + 100 * r
        add_nodes(base, rel_corners_e7(r))
        wb = REL_WAY_BASE + 10 * r
        wgroup += _way(wb + 0, [base + 0, base + 1, base + 2])
        wgroup += _way(wb + 1, [base + 2, base + 3, base + 0])
        wgroup += _way(wb + 2, [base + 4, base + 5, base + 6, base + 7,
                                base + 4])
        rgroup += _relation(
            REL_WAY_BASE * 10 + r, [wb, wb + 1, wb + 2], [1, 1, 1],
            [ridx["outer"], ridx["outer"], ridx["inner"]],
            keyidx=[ridx["type"]], validx=[ridx["multipolygon"]])
        # family 2: C-shaped outer + disjoint square inside its bbox —
        # the bbox-nesting adversarial case (two shells, no holes)
        base = 2 * REL_NODE_BASE + 100 * r
        add_nodes(base, cshape_corners_e7(r))
        wb = 2 * REL_WAY_BASE + 10 * r
        wgroup += _way(wb + 0, [base + c for c in range(5)])
        wgroup += _way(wb + 1, [base + 4, base + 5, base + 6, base + 7,
                                base + 0])
        wgroup += _way(wb + 2, [base + 8, base + 9, base + 10, base + 11,
                                base + 8])
        rgroup += _relation(
            2 * REL_WAY_BASE * 10 + r, [wb, wb + 1, wb + 2], [1, 1, 1],
            [ridx["outer"], ridx["outer"], ridx["outer"]],
            keyidx=[ridx["type"]], validx=[ridx["multipolygon"]])
        # family 3: island-in-lake-in-island (3-level depth parity)
        base = 3 * REL_NODE_BASE + 100 * r
        add_nodes(base, nested3_corners_e7(r))
        wb = 3 * REL_WAY_BASE + 10 * r
        wgroup += _way(wb + 0, [base + 0, base + 1, base + 2])
        wgroup += _way(wb + 1, [base + 2, base + 3, base + 0])
        wgroup += _way(wb + 2, [base + 4, base + 5, base + 6, base + 7,
                                base + 4])
        wgroup += _way(wb + 3, [base + 8, base + 9, base + 10, base + 11,
                                base + 8])
        rgroup += _relation(
            3 * REL_WAY_BASE * 10 + r, [wb, wb + 1, wb + 2, wb + 3],
            [1, 1, 1, 1],
            [ridx["outer"], ridx["outer"], ridx["inner"], ridx["outer"]],
            keyidx=[ridx["type"]], validx=[ridx["multipolygon"]])
        # family 4: super-relation (type=multipolygon) whose members are
        # TWO untyped child relations, each owning one closed square way
        # — exercises the relation-in-relation closure
        base = 4 * REL_NODE_BASE + 100 * r
        add_nodes(base, superrel_corners_e7(r))
        wb = 4 * REL_WAY_BASE + 10 * r
        wgroup += _way(wb + 0, [base + 0, base + 1, base + 2, base + 3,
                                base + 0])
        wgroup += _way(wb + 1, [base + 4, base + 5, base + 6, base + 7,
                                base + 4])
        child = 5 * REL_WAY_BASE * 10 + 2 * r
        rgroup += _relation(child, [wb + 0], [1], [ridx["outer"]])
        rgroup += _relation(child + 1, [wb + 1], [1], [ridx["outer"]])
        rgroup += _relation(
            4 * REL_WAY_BASE * 10 + r, [child, child + 1], [2, 2],
            [ridx["outer"], ridx["outer"]],
            keyidx=[ridx["type"]], validx=[ridx["multipolygon"]])
    frames.append(_frame("OSMData", _block(
        rstrings, [_dense_nodes(nd_ids, nd_lat, nd_lon, [0] * len(nd_ids)),
                   wgroup, rgroup])))

    # a REAL HeaderBlock (not a PrimitiveBlock StringTable): field 4 =
    # repeated required_features, field 16 = writingprogram — external
    # OSM tools parse/validate these; the bbox is optional and omitted
    head = (_ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes")
            + _ld(16, b"planetiler-ray-synthetic"))
    tmp = tempfile.mktemp(dir=os.path.dirname(path) or ".",
                          suffix=".pbf.part")
    with open(tmp, "wb") as f:
        f.write(_frame("OSMHeader", head))
        for fr in frames:
            f.write(fr)
    os.replace(tmp, path)                       # atomic: safe under races


def osm_world_pbf(n_docs: int) -> str:
    """Cached deterministic OSM PBF for a given documents row count."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    # v5: real HeaderBlock (cache name versions the world layout)
    path = os.path.join(CACHE_DIR, f"osmworld_v5_{n_docs}.pbf")
    if not os.path.exists(path):
        build_osm_world(path, n_docs)
    return path


def docs_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")) \
        .metadata.num_rows
