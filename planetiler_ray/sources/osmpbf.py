"""OSM PBF source — pure-Python/numpy protobuf wire decode, no protoc.

The analog of the reference's two-pass OSM reader
(``reader/osm/OsmInputFile.java``, ``PbfDecoder.java``,
``OsmReader.java``): reads the public OSM PBF container (fileformat /
osmformat protobuf schemas, wiki.openstreetmap.org/wiki/PBF_Format)
into Ray Datasets of nodes / ways / relations.

Decode strategy: protobuf *message* structure (a handful of fields per
~8k-element PrimitiveBlock) is walked in Python, but every *packed*
array — dense node ids, lats, lons, keys_vals, way refs, relation
memids — decodes with a fully vectorized varint kernel
(:func:`decode_varints`: continuation-bit masks + segmented
``reduceat`` fold), so per-element cost is numpy, not Python.  This is
the same "per-block Python, per-element vectorized" shape as the
reference's per-blob worker loop (``PbfDecoder.java:60-120``) mapped
onto columns.

Scale design: the driver hops blob headers once (length-prefix seeks,
no payload reads) to index the file, then fans out blob RANGES as a
Ray Dataset — each task reads only its byte range, inflates and
decodes its blobs.  Node-location resolution for ways is NOT a shared
in-RAM map (the reference's ``LongLongMap`` needs ~8 bytes × 10⁹ nodes
per worker): it is a hash-partitioned exchange join in
``pipelines/osm.py`` — the cluster-native re-expression.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

import ray.data

# ---------------------------------------------------------------------------
# varint kernels
# ---------------------------------------------------------------------------


def decode_varints(buf: np.ndarray) -> np.ndarray:
    """Decode a byte stream of back-to-back varints → uint64 array.

    Vectorized: bytes with the continuation bit clear end a value;
    value starts come from those ends; each byte's 7 payload bits shift
    by 7×(its offset within the value) and a segmented ``reduceat``
    folds them.  O(bytes) numpy, no Python loop.
    """
    buf = np.asarray(buf, np.uint8)
    if len(buf) == 0:
        return np.empty(0, np.uint64)
    last = (buf & 0x80) == 0
    ends = np.flatnonzero(last)
    n = len(ends)
    starts = np.empty(n, np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    val_idx = np.cumsum(last) - last          # value index per byte
    pos = np.arange(len(buf), dtype=np.int64) - starts[val_idx]
    contrib = (buf & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(contrib, starts)


def zigzag_decode(v: np.ndarray) -> np.ndarray:
    """Alias of :func:`tilemath.varint.unzigzag` (one implementation)."""
    from ..tilemath.varint import unzigzag

    return unzigzag(v)


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: memoryview):
    """Walk one protobuf message → yields (field_no, wire_type, value):
    varint fields give ints, length-delimited give memoryview slices,
    fixed32/64 give raw slices."""
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


# ---------------------------------------------------------------------------
# container framing
# ---------------------------------------------------------------------------


def scan_blob_index(path: str) -> list[dict]:
    """Hop blob headers → [{type, byte0, byte1}] without reading
    payloads (driver-side, O(#blobs) seeks)."""
    out = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">i", raw)[0]
            head = memoryview(f.read(hlen))
            btype, dsize = "", 0
            for field, wt, val in iter_fields(head):
                if field == 1:
                    btype = bytes(val).decode()
                elif field == 3:
                    dsize = val
            start = f.tell()
            out.append({"type": btype, "byte0": start, "byte1": start + dsize})
            f.seek(start + dsize)
    return out


def inflate_blob(data: bytes) -> bytes:
    """Blob message → raw uncompressed payload (raw or zlib)."""
    raw = None
    for field, wt, val in iter_fields(memoryview(data)):
        if field == 1:
            raw = bytes(val)
        elif field == 3:
            raw = zlib.decompress(bytes(val))
    if raw is None:
        raise ValueError("blob carries no raw/zlib data")
    return raw


# ---------------------------------------------------------------------------
# PrimitiveBlock decode
# ---------------------------------------------------------------------------


def _decode_stringtable(buf: memoryview) -> np.ndarray:
    strs = [bytes(val).decode("utf-8", "replace")
            for field, wt, val in iter_fields(buf) if field == 1]
    return np.array(strs, dtype=object)


def _tags_from_kv(kv: np.ndarray, strings: np.ndarray, n_nodes: int):
    """DenseNodes keys_vals (0-delimited pairs) → per-node list offsets
    + flat key/val string arrays, vectorized."""
    if len(kv) == 0:
        off = np.zeros(n_nodes + 1, np.int32)
        e = np.empty(0, object)
        return off, e, e
    zeros = kv == 0
    # tag pair count per node = (run length between zeros) / 2
    node_of = np.cumsum(zeros) - zeros        # node index per kv entry
    keep = ~zeros
    k_idx = kv[keep][0::2]
    v_idx = kv[keep][1::2]
    pairs_per_node = np.bincount(node_of[keep][0::2], minlength=n_nodes)
    off = np.zeros(n_nodes + 1, np.int32)
    np.cumsum(pairs_per_node, out=off[1:])
    return off, strings[k_idx], strings[v_idx]


def decode_primitive_block(data: bytes) -> dict:
    """One OSMData payload → columnar dict with keys
    ``nodes`` / ``ways`` / ``relations`` (each a dict of numpy arrays,
    absent when the block has none)."""
    buf = memoryview(data)
    strings = np.empty(0, object)
    groups = []
    granularity, lat_off, lon_off = 100, 0, 0
    for field, wt, val in iter_fields(buf):
        if field == 1:
            strings = _decode_stringtable(val)
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val
    out: dict = {}
    for g in groups:
        for field, wt, val in iter_fields(g):
            if field == 2:
                out.setdefault("nodes", []).append(
                    _decode_dense(val, strings, granularity, lat_off, lon_off))
            elif field == 3:
                out.setdefault("ways", []).append(_decode_way(val, strings))
            elif field == 4:
                out.setdefault("relations", []).append(
                    _decode_relation(val, strings))
    for k, parts in list(out.items()):
        out[k] = _merge_parts(parts)
    return out


def _packed(val) -> np.ndarray:
    return decode_varints(np.frombuffer(val, np.uint8))


def _decode_dense(buf: memoryview, strings, granularity, lat_off, lon_off):
    ids = lats = lons = kv = None
    for field, wt, val in iter_fields(buf):
        if field == 1:
            ids = np.cumsum(zigzag_decode(_packed(val)))
        elif field == 8:
            lats = np.cumsum(zigzag_decode(_packed(val)))
        elif field == 9:
            lons = np.cumsum(zigzag_decode(_packed(val)))
        elif field == 10:
            kv = _packed(val).astype(np.int64)
    n = len(ids) if ids is not None else 0
    lat_deg = 1e-9 * (lat_off + granularity * lats) if lats is not None else np.zeros(n)
    lon_deg = 1e-9 * (lon_off + granularity * lons) if lons is not None else np.zeros(n)
    if kv is None:
        kv = np.empty(0, np.int64)
    t_off, t_k, t_v = _tags_from_kv(kv, strings, n)
    return {"id": ids if ids is not None else np.empty(0, np.int64),
            "lon": lon_deg, "lat": lat_deg,
            "tag_off": t_off, "tag_keys": t_k, "tag_vals": t_v}


def _decode_way(buf: memoryview, strings):
    wid = 0
    keys = vals = refs = None
    for field, wt, val in iter_fields(buf):
        if field == 1:
            wid = val
        elif field == 2:
            keys = _packed(val).astype(np.int64)
        elif field == 3:
            vals = _packed(val).astype(np.int64)
        elif field == 8:
            refs = np.cumsum(zigzag_decode(_packed(val)))
    nk = len(keys) if keys is not None else 0
    return {"id": np.array([wid], np.int64),
            "ref_off": np.array([0, len(refs) if refs is not None else 0], np.int32),
            "refs": refs if refs is not None else np.empty(0, np.int64),
            "tag_off": np.array([0, nk], np.int32),
            "tag_keys": strings[keys] if nk else np.empty(0, object),
            "tag_vals": strings[vals] if vals is not None and len(vals) else np.empty(0, object)}


def _decode_relation(buf: memoryview, strings):
    rid = 0
    keys = vals = roles = memids = types = None
    for field, wt, val in iter_fields(buf):
        if field == 1:
            rid = val
        elif field == 2:
            keys = _packed(val).astype(np.int64)
        elif field == 3:
            vals = _packed(val).astype(np.int64)
        elif field == 8:
            roles = _packed(val).astype(np.int64)
        elif field == 9:
            memids = np.cumsum(zigzag_decode(_packed(val)))
        elif field == 10:
            types = _packed(val).astype(np.int64)
    nm = len(memids) if memids is not None else 0
    nk = len(keys) if keys is not None else 0
    return {"id": np.array([rid], np.int64),
            "mem_off": np.array([0, nm], np.int32),
            "mem_ids": memids if nm else np.empty(0, np.int64),
            "mem_types": types if types is not None else np.empty(0, np.int64),
            "mem_roles": strings[roles] if roles is not None and len(roles) else np.empty(0, object),
            "tag_off": np.array([0, nk], np.int32),
            "tag_keys": strings[keys] if nk else np.empty(0, object),
            "tag_vals": strings[vals] if vals is not None and len(vals) else np.empty(0, object)}


def _merge_parts(parts: list[dict]) -> dict:
    if len(parts) == 1:
        return parts[0]
    out = {}
    for k in parts[0]:
        if k.endswith("_off"):
            offs = [p[k] for p in parts]
            merged = [offs[0]]
            base = offs[0][-1]
            for o in offs[1:]:
                merged.append(o[1:] + base)
                base += o[-1]
            out[k] = np.concatenate(merged)
        else:
            out[k] = np.concatenate([p[k] for p in parts])
    return out


# ---------------------------------------------------------------------------
# Ray Datasets
# ---------------------------------------------------------------------------


def _list_col(flat: np.ndarray, off: np.ndarray, typ) -> pa.ListArray:
    return pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                    pa.array(flat, typ))


def _chunk_blob_ranges(path: str, blobs_per_chunk: int) -> list[dict]:
    idx = [b for b in scan_blob_index(path) if b["type"] == "OSMData"]
    chunks = []
    for s in range(0, len(idx), blobs_per_chunk):
        grp = idx[s:s + blobs_per_chunk]
        chunks.append({"path": path,
                       "offs": [(b["byte0"], b["byte1"]) for b in grp]})
    return chunks


def _read_chunk_blocks(row: dict):
    with open(row["path"], "rb") as f:
        for b0, b1 in row["offs"]:
            f.seek(b0)
            yield decode_primitive_block(inflate_blob(f.read(b1 - b0)))


def _nodes_table(blk: dict) -> pa.Table:
    nd = blk.get("nodes")
    if nd is None:
        return _empty_nodes()
    return pa.table({
        "node_id": pa.array(nd["id"].astype(np.int64)),
        "lon": pa.array(nd["lon"]),
        "lat": pa.array(nd["lat"]),
        "tag_keys": _list_col(nd["tag_keys"], nd["tag_off"], pa.string()),
        "tag_vals": _list_col(nd["tag_vals"], nd["tag_off"], pa.string()),
    })


def _empty_nodes() -> pa.Table:
    return pa.table({
        "node_id": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64()),
        "tag_keys": pa.array([], pa.list_(pa.string())),
        "tag_vals": pa.array([], pa.list_(pa.string())),
    })


def _ways_table(blk: dict) -> pa.Table:
    wy = blk.get("ways")
    if wy is None:
        return pa.table({
            "way_id": pa.array([], pa.int64()),
            "refs": pa.array([], pa.list_(pa.int64())),
            "tag_keys": pa.array([], pa.list_(pa.string())),
            "tag_vals": pa.array([], pa.list_(pa.string())),
        })
    return pa.table({
        "way_id": pa.array(wy["id"]),
        "refs": _list_col(wy["refs"].astype(np.int64), wy["ref_off"], pa.int64()),
        "tag_keys": _list_col(wy["tag_keys"], wy["tag_off"], pa.string()),
        "tag_vals": _list_col(wy["tag_vals"], wy["tag_off"], pa.string()),
    })


def _relations_table(blk: dict) -> pa.Table:
    rl = blk.get("relations")
    if rl is None:
        return pa.table({
            "rel_id": pa.array([], pa.int64()),
            "mem_ids": pa.array([], pa.list_(pa.int64())),
            "mem_types": pa.array([], pa.list_(pa.int8())),
            "mem_roles": pa.array([], pa.list_(pa.string())),
            "tag_keys": pa.array([], pa.list_(pa.string())),
            "tag_vals": pa.array([], pa.list_(pa.string())),
        })
    return pa.table({
        "rel_id": pa.array(rl["id"]),
        "mem_ids": _list_col(rl["mem_ids"].astype(np.int64), rl["mem_off"], pa.int64()),
        "mem_types": _list_col(rl["mem_types"].astype(np.int8), rl["mem_off"], pa.int8()),
        "mem_roles": _list_col(rl["mem_roles"], rl["mem_off"], pa.string()),
        "tag_keys": _list_col(rl["tag_keys"], rl["tag_off"], pa.string()),
        "tag_vals": _list_col(rl["tag_vals"], rl["tag_off"], pa.string()),
    })


def _make_reader(table_fn):
    def parse(batch: pa.Table) -> pa.Table:
        tables = [table_fn(blk)
                  for row in batch.to_pylist()
                  for blk in _read_chunk_blocks(row)]
        if not tables:
            return table_fn({})
        return pa.concat_tables(tables, promote_options="default")
    return parse


def read_osm_nodes(path: str, blobs_per_chunk: int = 4) -> "ray.data.Dataset":
    """PBF → Dataset(node_id, lon, lat, tag_keys, tag_vals)."""
    return ray.data.from_items(_chunk_blob_ranges(path, blobs_per_chunk)) \
        .map_batches(_make_reader(_nodes_table), batch_format="pyarrow",
                     batch_size=1)


def read_osm_ways(path: str, blobs_per_chunk: int = 4) -> "ray.data.Dataset":
    """PBF → Dataset(way_id, refs, tag_keys, tag_vals)."""
    return ray.data.from_items(_chunk_blob_ranges(path, blobs_per_chunk)) \
        .map_batches(_make_reader(_ways_table), batch_format="pyarrow",
                     batch_size=1)


def read_osm_relations(path: str, blobs_per_chunk: int = 4) -> "ray.data.Dataset":
    """PBF → Dataset(rel_id, mem_ids, mem_types, mem_roles, tags)."""
    return ray.data.from_items(_chunk_blob_ranges(path, blobs_per_chunk)) \
        .map_batches(_make_reader(_relations_table), batch_format="pyarrow",
                     batch_size=1)
