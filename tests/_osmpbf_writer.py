"""Minimal OSM PBF writer — test fixture generator (deterministic,
no external data).  Encodes the public fileformat/osmformat protobuf
schemas by hand (varint / zigzag / packed / length-delimited)."""

import struct
import zlib


def varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def key(field: int, wt: int) -> bytes:
    return varint((field << 3) | wt)


def ld(field: int, payload: bytes) -> bytes:
    return key(field, 2) + varint(len(payload)) + payload


def vi(field: int, v: int) -> bytes:
    return key(field, 0) + varint(v)


def packed(field: int, values, zz=False) -> bytes:
    body = b"".join(varint(zigzag(v) if zz else v) for v in values)
    return ld(field, body)


def delta(vals):
    prev = 0
    out = []
    for v in vals:
        out.append(v - prev)
        prev = v
    return out


def stringtable(strings):
    return ld(1, b"".join(ld(1, s.encode()) for s in strings))


def dense_nodes(ids, lons, lats, keys_vals):
    """lat/lon in degrees; stored in 1e-7° units (granularity 100)."""
    body = packed(1, delta(ids), zz=True)
    body += packed(8, delta([round(v * 1e7) for v in lats]), zz=True)
    body += packed(9, delta([round(v * 1e7) for v in lons]), zz=True)
    if keys_vals:
        body += packed(10, keys_vals)
    return ld(2, body)


def way(wid, refs, keyidx=(), validx=()):
    body = vi(1, wid)
    if keyidx:
        body += packed(2, keyidx)
        body += packed(3, validx)
    body += packed(8, delta(refs), zz=True)
    return ld(3, body)


def relation(rid, memids, types, roleidx, keyidx=(), validx=()):
    body = vi(1, rid)
    if keyidx:
        body += packed(2, keyidx)
        body += packed(3, validx)
    body += packed(8, roleidx)
    body += packed(9, delta(memids), zz=True)
    body += packed(10, types)
    return ld(4, body)


def primitive_block(strings, groups) -> bytes:
    body = stringtable(strings)
    for g in groups:
        body += ld(2, g)
    return body


def blob(payload: bytes, compress=True) -> bytes:
    if compress:
        z = zlib.compress(payload)
        return vi(2, len(payload)) + ld(3, z)
    return ld(1, payload)


def frame(btype: str, blob_bytes: bytes) -> bytes:
    header = ld(1, btype.encode()) + vi(3, len(blob_bytes))
    return struct.pack(">i", len(header)) + header + blob_bytes


def write_pbf(path, blocks, compress=True):
    """blocks: list of PrimitiveBlock payload bytes."""
    head = primitive_block(["", "test"], [])        # minimal OSMHeader stand-in
    with open(path, "wb") as f:
        f.write(frame("OSMHeader", blob(head, compress)))
        for b in blocks:
            f.write(frame("OSMData", blob(b, compress)))
