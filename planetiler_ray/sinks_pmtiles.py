"""PMTiles v3 archive sink — spec-compliant single-file format.

The real-format counterpart of the reference's
``pmtiles/WriteablePmtiles.java:40-309``: Hilbert tile-id addressing
(identical to our ``hilbert_id``: per-zoom Hilbert index + 4^z prefix
sum), varint-delta directories, run-length dedup of consecutive
identical tiles, gzip-compressed directories/metadata, and the 127-byte
v3 header — per the public PMTiles v3 specification.

The write is an ordered single-writer over ``iter_batches`` of the
hilbert-sorted Dataset (the analog of the reference's in-order writer
thread): tile DATA streams straight to disk — only the entry columns
(32 bytes per distinct entry, four int64 numpy arrays) are held in
memory, never the blobs and never a Python object per tile.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np
import pyarrow as pa

import ray.data

from .sinks import _encode_batch
from .tilemath.varint import encode_varints

MAGIC = b"PMTiles"
VERSION = 3
HEADER_LEN = 127
COMPRESSION_GZIP = 2
TILETYPE_MVT = 1
MAX_ROOT_ENTRIES = 4096


class _EntryStore:
    """Growable columnar entry list: four int64 numpy arrays instead of
    a Python tuple (+4 boxed ints, ~100 B) per entry — this is what
    keeps the single-writer's memory at tens of bytes per DISTINCT
    entry even on a z0-14 pyramid with poor run collapse."""

    __slots__ = ("tid", "off", "ln", "rl", "n")

    def __init__(self, cap: int = 4096):
        self.tid = np.empty(cap, np.int64)
        self.off = np.empty(cap, np.int64)
        self.ln = np.empty(cap, np.int64)
        self.rl = np.empty(cap, np.int64)
        self.n = 0

    def append(self, t: int, o: int, l: int, r: int) -> None:
        i = self.n
        if i == len(self.tid):
            for name in self.__slots__[:4]:
                a = getattr(self, name)
                b = np.empty(len(a) * 2, np.int64)
                b[:i] = a[:i]
                setattr(self, name, b)
        self.tid[i] = t
        self.off[i] = o
        self.ln[i] = l
        self.rl[i] = r
        self.n = i + 1

    def extend_last_run(self, k: int) -> None:
        self.rl[self.n - 1] += k

    def next_tid_of_last_run(self) -> int:
        """tile_id one past the last entry's run (run continues here)."""
        i = self.n - 1
        return int(self.tid[i] + self.rl[i])

    def arrays(self):
        return (self.tid[:self.n], self.off[:self.n],
                self.ln[:self.n], self.rl[:self.n])


def _serialize_directory(tid, off, ln, rl) -> bytes:
    """Entry columns (tile_id, offset, length, run_length) → spec bytes.

    Column order per spec: count, tile-id deltas, run lengths, lengths,
    offsets (offset+1, or 0 = previous offset + length).
    """
    n = len(tid)
    tid = np.asarray(tid).astype(np.uint64)
    off = np.asarray(off).astype(np.uint64)
    ln = np.asarray(ln).astype(np.uint64)
    rl = np.asarray(rl).astype(np.uint64)
    deltas = np.empty(n, np.uint64)
    if n:
        deltas[0] = tid[0]
        deltas[1:] = tid[1:] - tid[:-1]
    # offset encoding: 0 when contiguous with the previous entry
    off_enc = off + np.uint64(1)
    if n > 1:
        contiguous = off[1:] == off[:-1] + ln[:-1]
        off_enc[1:][contiguous] = 0
    stream = np.concatenate([np.array([n], np.uint64), deltas, rl, ln, off_enc])
    buf, _ = encode_varints(stream)
    return buf.tobytes()


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        byte = b[i]
        i += 1
        val |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return val, i
        shift += 7


def _deserialize_directory(data: bytes) -> list[tuple[int, int, int, int]]:
    n, i = _read_varint(data, 0)
    deltas, rls, lens, offs = [], [], [], []
    for _ in range(n):
        v, i = _read_varint(data, i)
        deltas.append(v)
    for _ in range(n):
        v, i = _read_varint(data, i)
        rls.append(v)
    for _ in range(n):
        v, i = _read_varint(data, i)
        lens.append(v)
    for _ in range(n):
        v, i = _read_varint(data, i)
        offs.append(v)
    out = []
    tid = 0
    for k in range(n):
        tid += deltas[k]
        if offs[k] == 0 and k > 0:
            off = out[-1][1] + out[-1][2]
        else:
            off = offs[k] - 1
        out.append((tid, off, lens[k], rls[k]))
    return out


def tile_extent_bounds(ext: dict) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a deepest-zoom tile-range
    extent; world bounds when no z/x/y columns were seen."""
    import math
    if ext["z"] < 0:
        return -180.0, -85.0511287, 180.0, 85.0511287
    inv = 1.0 / (1 << ext["z"])
    lon0 = ext["x0"] * inv * 360.0 - 180.0
    lon1 = (ext["x1"] + 1) * inv * 360.0 - 180.0
    # inverse web-mercator: lat = atan(sinh(pi * (1 - 2y)))
    lat1 = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * ext["y0"] * inv))))
    lat0 = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * (ext["y1"] + 1) * inv))))
    return lon0, lat0, lon1, lat1


def write_pmtiles(tiles: "ray.data.Dataset", path: str,
                  metadata: dict | None = None,
                  min_zoom: int = 0, max_zoom: int = 14,
                  vector_layers: list[dict] | None = None) -> dict:
    """Write a PMTiles v3 archive from a tile Dataset.

    Requires columns hilbert_id, content_hash, z and tile payload
    (``mvt_bytes`` or record ``tile_bytes``).  Consecutive identical
    tiles collapse into run-length entries (the ocean dedup of
    ``WriteablePmtiles.java:132``); offsets stay monotonic so the
    archive is ``clustered``.
    """
    ordered = tiles.sort("hilbert_id")
    entries = _EntryStore()
    data_tmp = path + ".data.tmp"
    pos = 0
    n_addressed = 0
    n_contents = 0
    prev_hash = None
    # actual extent: union of tile envelopes at the deepest zoom present
    # (viewers open on the tileset, not the world — round-2 ADVICE)
    ext = {"z": -1, "x0": 0, "x1": 0, "y0": 0, "y1": 0}
    with open(data_tmp, "wb") as df:
        for batch in ordered.iter_batches(batch_size=4096,
                                          batch_format="pyarrow"):
            if batch.num_rows and {"z", "x", "y"} <= set(batch.schema.names):
                zc = batch["z"].to_numpy()
                zb = int(zc.max())
                sel = zc == zb
                xs = batch["x"].to_numpy()[sel]
                ys = batch["y"].to_numpy()[sel]
                if zb > ext["z"]:
                    ext = {"z": zb, "x0": int(xs.min()), "x1": int(xs.max()),
                           "y0": int(ys.min()), "y1": int(ys.max())}
                elif zb == ext["z"]:
                    ext["x0"] = min(ext["x0"], int(xs.min()))
                    ext["x1"] = max(ext["x1"], int(xs.max()))
                    ext["y0"] = min(ext["y0"], int(ys.min()))
                    ext["y1"] = max(ext["y1"], int(ys.max()))
            if batch.num_rows == 0:
                continue
            hils = batch["hilbert_id"].to_numpy()
            hashes = batch["content_hash"].to_numpy()
            nb = len(hils)
            n_addressed += nb
            # a row STARTS a new entry unless it chains the previous
            # row's run: same content hash and the next consecutive
            # tile id (identical-ocean dedup, vectorized per batch)
            start = np.ones(nb, bool)
            start[1:] = ((hashes[1:] != hashes[:-1])
                         | (hils[1:] != hils[:-1] + 1))
            if (prev_hash is not None and entries.n
                    and int(hashes[0]) == prev_hash
                    and entries.next_tid_of_last_run() == hils[0]):
                start[0] = False
            idxs = np.flatnonzero(start)
            if len(idxs) == 0:
                entries.extend_last_run(nb)
                continue
            if idxs[0] > 0:
                entries.extend_last_run(int(idxs[0]))
            runs = np.diff(np.append(idxs, nb))
            # only entry-starting rows are written — run-continuation
            # blobs are never stored, so skip encoding them entirely
            blobs = _encode_batch(batch.take(pa.array(idxs)))
            for k, blob in enumerate(blobs):
                df.write(blob)
                entries.append(int(hils[idxs[k]]), pos, len(blob),
                               int(runs[k]))
                pos += len(blob)
                n_contents += 1
            prev_hash = int(hashes[-1])

    # directories: root only, or root → leaves of MAX_ROOT_ENTRIES
    e_tid, e_off, e_ln, e_rl = entries.arrays()
    if entries.n <= MAX_ROOT_ENTRIES:
        root_bytes = gzip.compress(
            _serialize_directory(e_tid, e_off, e_ln, e_rl), 6)
        leaves_bytes = b""
    else:
        leaves = []
        r_tid, r_off, r_ln = [], [], []
        leaf_pos = 0
        for s in range(0, entries.n, MAX_ROOT_ENTRIES):
            e = s + MAX_ROOT_ENTRIES
            lb = gzip.compress(_serialize_directory(
                e_tid[s:e], e_off[s:e], e_ln[s:e], e_rl[s:e]), 6)
            r_tid.append(int(e_tid[s]))
            r_off.append(leaf_pos)
            r_ln.append(len(lb))
            leaves.append(lb)
            leaf_pos += len(lb)
        root_bytes = gzip.compress(_serialize_directory(
            r_tid, r_off, r_ln, np.zeros(len(r_tid), np.int64)), 6)
        leaves_bytes = b"".join(leaves)

    meta = {"name": "planetiler_ray", "format": "pbf", **(metadata or {})}
    if vector_layers is not None:
        # TileJSON discovery block in the PMTiles JSON metadata
        # (``pmtiles/WriteablePmtiles.java`` writes the same key)
        meta["vector_layers"] = vector_layers
    meta_bytes = gzip.compress(json.dumps(meta).encode(), 6)

    root_off = HEADER_LEN
    meta_off = root_off + len(root_bytes)
    leaf_off = meta_off + len(meta_bytes)
    data_off = leaf_off + len(leaves_bytes)

    header = bytearray(HEADER_LEN)
    header[0:7] = MAGIC
    header[7] = VERSION
    struct.pack_into("<QQQQQQQQ", header, 8,
                     root_off, len(root_bytes), meta_off, len(meta_bytes),
                     leaf_off, len(leaves_bytes), data_off, pos)
    struct.pack_into("<QQQ", header, 72, n_addressed, entries.n, n_contents)
    header[96] = 1                       # clustered
    header[97] = COMPRESSION_GZIP        # internal compression
    header[98] = COMPRESSION_GZIP        # tile compression
    header[99] = TILETYPE_MVT
    header[100] = min_zoom
    header[101] = max_zoom
    lon0, lat0, lon1, lat1 = tile_extent_bounds(ext)
    struct.pack_into("<iiii", header, 102,
                     int(round(lon0 * 10**7)), int(round(lat0 * 10**7)),
                     int(round(lon1 * 10**7)), int(round(lat1 * 10**7)))
    header[118] = min_zoom
    struct.pack_into("<ii", header, 119,
                     int(round((lon0 + lon1) / 2 * 10**7)),
                     int(round((lat0 + lat1) / 2 * 10**7)))

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(root_bytes)
        f.write(meta_bytes)
        f.write(leaves_bytes)
        with open(data_tmp, "rb") as df:
            while chunk := df.read(1 << 20):
                f.write(chunk)
    os.remove(data_tmp)
    os.replace(tmp, path)
    return {"n_addressed": n_addressed, "n_entries": entries.n,
            "n_contents": n_contents, "bytes": os.path.getsize(path)}


def read_pmtiles_header(path: str) -> dict:
    with open(path, "rb") as f:
        h = f.read(HEADER_LEN)
    assert h[0:7] == MAGIC and h[7] == VERSION
    vals = struct.unpack_from("<QQQQQQQQ", h, 8)
    n_add, n_ent, n_cont = struct.unpack_from("<QQQ", h, 72)
    lon0, lat0, lon1, lat1 = struct.unpack_from("<iiii", h, 102)
    clon, clat = struct.unpack_from("<ii", h, 119)
    return {"root_off": vals[0], "root_len": vals[1],
            "meta_off": vals[2], "meta_len": vals[3],
            "leaf_off": vals[4], "leaf_len": vals[5],
            "data_off": vals[6], "data_len": vals[7],
            "n_addressed": n_add, "n_entries": n_ent, "n_contents": n_cont,
            "clustered": bool(h[96]), "tile_type": h[99],
            "min_zoom": h[100], "max_zoom": h[101],
            "bounds": (lon0 / 1e7, lat0 / 1e7, lon1 / 1e7, lat1 / 1e7),
            "center": (clon / 1e7, clat / 1e7)}


def read_pmtiles_tile(path: str, hilbert_id: int) -> bytes | None:
    """Random-access read (decompressed MVT) by PMTiles tile id."""
    hdr = read_pmtiles_header(path)
    with open(path, "rb") as f:
        f.seek(hdr["root_off"])
        root = _deserialize_directory(gzip.decompress(f.read(hdr["root_len"])))

        def lookup(entries, depth=0):
            lo, hi = 0, len(entries) - 1
            best = None
            while lo <= hi:
                mid = (lo + hi) // 2
                if entries[mid][0] <= hilbert_id:
                    best = entries[mid]
                    lo = mid + 1
                else:
                    hi = mid - 1
            if best is None:
                return None
            tid, off, ln, run = best
            if run == 0:              # leaf pointer
                f.seek(hdr["leaf_off"] + off)
                leaf = _deserialize_directory(gzip.decompress(f.read(ln)))
                return lookup(leaf, depth + 1)
            if hilbert_id < tid + max(run, 1):
                f.seek(hdr["data_off"] + off)
                return gzip.decompress(f.read(ln))
            return None

        return lookup(root)


def iter_pmtiles_entries(path: str) -> list[tuple[int, int, int]]:
    """Enumerate every addressed tile in the archive as
    ``(hilbert_id, data_offset, length)`` — the full-scan analog of
    ``pmtiles/ReadablePmtiles.java getAllTileCoords``.  Run-length
    entries expand to one row per addressed id (all sharing the same
    data offset/length, the de-duplicated blob)."""
    hdr = read_pmtiles_header(path)
    dirs: list[list[tuple[int, int, int, int]]] = []
    with open(path, "rb") as f:
        f.seek(hdr["root_off"])
        root = _deserialize_directory(gzip.decompress(f.read(hdr["root_len"])))
        for tid, off, ln, run in root:
            if run == 0:              # leaf-directory pointer
                f.seek(hdr["leaf_off"] + off)
                dirs.append(_deserialize_directory(
                    gzip.decompress(f.read(ln))))
            else:
                dirs.append([(tid, off, ln, run)])
    out: list[tuple[int, int, int]] = []
    for d in dirs:
        for tid, off, ln, run in d:
            for k in range(max(run, 1)):
                out.append((tid + k, off, ln))
    return out


def read_pmtiles_metadata(path: str) -> dict:
    hdr = read_pmtiles_header(path)
    with open(path, "rb") as f:
        f.seek(hdr["meta_off"])
        return json.loads(gzip.decompress(f.read(hdr["meta_len"])))
