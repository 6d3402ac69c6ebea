"""Tile-archive sinks — the ``WriteableTileArchive`` analogs.

Formats (registry mirrors ``archive/TileArchiveConfig.java:233-256``):

- :func:`write_files`    — ``{z}/{x}/{y}.mvt.gz`` directory tree, MVT
  command-encoded + gzip (``files/WriteableFilesArchive.java``);
  embarrassingly parallel ``map_batches`` writes
- :func:`write_csv`      — ``x,y,z,base64(tile)`` stream
  (``stream/WriteableCsvArchive.java:68-160``)
- :func:`write_archive`  — single-file Hilbert-clustered archive with a
  sorted index (the PMTiles layout idea: ``pmtiles/WriteablePmtiles.java``),
  identical tiles deduplicated by content hash; needs a global sort →
  ordered single-writer on the driver, used for bounded outputs
- :func:`dedup_tiles`    — identical-tile dedup table: content_hash →
  canonical tile + reference count (``archive/TileArchiveWriter.java:288-312``)
- :func:`layer_stats`    — per-(z, layer) feature counts/bytes, the
  ``util/TileSizeStats.java`` sidecar analog

Tile payload: the compact fixed-width records from the reduce
(``stages/reduce.RECORD_DTYPE``) are transcoded to real MVT-style
geometry commands (zigzag deltas, extent 4096 — ``tilemath/mvt.py``)
at the sink, then gzipped — matching the reference's encode-then-
compress order (``archive/TileArchiveWriter.java:273-335``).
"""

from __future__ import annotations

import base64
import gzip
import os
import struct

import numpy as np
import pyarrow as pa

import ray.data

from .stages.reduce import RECORD_DTYPE
from .tilemath.mvt import CLOSE_PATH, LINE_TO, MOVE_TO, zigzag_encode


def records_to_mvt(tile_bytes: bytes) -> bytes:
    """Transcode one tile's fixed-width records → MVT-style command buffer.

    Layout: uint32 n_features, then per feature: u8 layer, u8 kind,
    u16 n_cmds, int32 commands (zigzag deltas at extent 4096).
    """
    rec = np.frombuffer(tile_bytes, dtype=RECORD_DTYPE)
    parts = [struct.pack("<I", len(rec))]
    for r in rec:
        if r["kind"] == 0:  # box ring: MoveTo + 3 LineTo + Close
            x0, y0, x1, y1 = int(r["x0"]), int(r["y0"]), int(r["x1"]), int(r["y1"])
            cmds = np.array([
                (MOVE_TO & 7) | (1 << 3), zigzag_encode(x0), zigzag_encode(y0),
                (LINE_TO & 7) | (3 << 3),
                zigzag_encode(x1 - x0), 0, 0, zigzag_encode(y1 - y0),
                zigzag_encode(x0 - x1), 0, (CLOSE_PATH & 7) | (1 << 3),
            ], dtype=np.int32)
        else:  # point: single MoveTo
            cmds = np.array([(MOVE_TO & 7) | (1 << 3),
                             zigzag_encode(int(r["x0"])), zigzag_encode(int(r["y0"]))],
                            dtype=np.int32)
        parts.append(struct.pack("<BBH", int(r["layer"]), int(r["kind"]), len(cmds)))
        parts.append(cmds.tobytes())
    return b"".join(parts)


def _encode_batch(batch: pa.Table, compress: bool = True) -> list[bytes]:
    out = []
    for tb in batch["tile_bytes"].to_pylist():
        raw = records_to_mvt(tb)
        out.append(gzip.compress(raw, 6) if compress else raw)
    return out


def write_files(tiles: "ray.data.Dataset", out_dir: str) -> int:
    """Write ``{z}/{x}/{y}.mvt.gz`` files; returns tile count."""
    def write(batch: pa.Table) -> pa.Table:
        blobs = _encode_batch(batch)
        zs = batch["z"].to_numpy()
        xs = batch["x"].to_numpy()
        ys = batch["y"].to_numpy()
        for z, x, y, blob in zip(zs, xs, ys, blobs):
            d = os.path.join(out_dir, str(z), str(x))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".{y}.tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(d, f"{y}.mvt.gz"))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    res = tiles.map_batches(write, batch_format="pyarrow").to_pandas()
    return int(res["n"].sum())


def write_csv(tiles: "ray.data.Dataset", out_dir: str) -> None:
    """``x,y,z,base64(gzip(mvt))`` CSV stream (golden-output format)."""
    def enc(batch: pa.Table) -> pa.Table:
        blobs = _encode_batch(batch)
        return pa.table({
            "x": batch["x"], "y": batch["y"], "z": batch["z"],
            "encoded": pa.array([base64.b64encode(b).decode() for b in blobs],
                                pa.string()),
        })

    tiles.map_batches(enc, batch_format="pyarrow").write_csv(out_dir)


def dedup_tiles(tiles: "ray.data.Dataset") -> "ray.data.Dataset":
    """Identical-tile dedup: one canonical tile per content hash + refcount.

    The ocean-tile dedup of ``FeatureGroup.hasSameContents`` /
    ``WriteablePmtiles`` hash dedup, order-independent: groupby content
    hash, keep the lowest tile_id as canonical.
    """
    from ray.data.aggregate import Count, Min

    return tiles.groupby("content_hash").aggregate(
        Min("tile_id", alias_name="canonical_tile_id"),
        Count(alias_name="ref_count"))


def layer_stats(frags: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-(z, layer) fragment counts — the layer-stats sidecar.

    Operates on the fan-out fragment stream (pre-reduce), mirroring
    ``util/LayerAttrStats.java`` zoom-range tracking.
    """
    from ray.data.aggregate import Count

    def zl(batch: pa.Table) -> pa.Table:
        from .tilemath.tilecoord import tms_decode
        _, _, z = tms_decode(batch["tile_id"].to_numpy())
        return pa.table({"z": z.astype(np.int8), "layer": batch["layer"]})

    return frags.map_batches(zl, batch_format="pyarrow") \
        .groupby(["z", "layer"]).aggregate(Count(alias_name="n_features"))


def write_json(tiles: "ray.data.Dataset", out_dir: str) -> None:
    """NDJSON stream of ``{x, y, z, encoded}`` rows
    (``stream/WriteableJsonStreamArchive.java`` analog)."""
    def enc(batch: pa.Table) -> pa.Table:
        blobs = _encode_batch(batch)
        return pa.table({
            "x": batch["x"], "y": batch["y"], "z": batch["z"],
            "encoded": pa.array([base64.b64encode(b).decode() for b in blobs],
                                pa.string()),
        })

    tiles.map_batches(enc, batch_format="pyarrow").write_json(out_dir)


def tile_size_stats(tiles: "ray.data.Dataset", top_n: int = 10) -> dict:
    """Tileset summary statistics (``util/TilesetSummaryStatistics.java``).

    Per-zoom tile counts / byte sizes plus the global top-N biggest
    tiles — computed with partial per-batch aggregation, only the small
    summaries reach the driver.
    """
    import pandas as pd

    def per_batch(batch: pa.Table) -> pd.DataFrame:
        sizes = np.array([len(b) for b in batch["tile_bytes"].to_pylist()],
                         dtype=np.int64)
        df = pd.DataFrame({"z": batch["z"].to_numpy(), "size": sizes,
                           "tile_id": batch["tile_id"].to_numpy()})
        agg = df.groupby("z").agg(n=("size", "size"), total=("size", "sum"),
                                  biggest=("size", "max")).reset_index()
        top = df.nlargest(top_n, "size")[["tile_id", "z", "size"]]
        agg["kind"] = "agg"
        top["kind"] = "top"
        return pd.concat([agg, top], ignore_index=True)

    parts = tiles.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    aggs = parts[parts["kind"] == "agg"].groupby("z").agg(
        n=("n", "sum"), total_bytes=("total", "sum"), max_bytes=("biggest", "max"))
    tops = parts[parts["kind"] == "top"].nlargest(top_n, "size")
    return {
        "per_zoom": {int(z): {"n": int(r["n"]), "total_bytes": int(r["total_bytes"]),
                              "max_bytes": int(r["max_bytes"])}
                     for z, r in aggs.iterrows()},
        "biggest_tiles": [(int(r["tile_id"]), int(r["z"]), int(r["size"]))
                          for _, r in tops.iterrows()],
    }


def write_archive(tiles: "ray.data.Dataset", path: str) -> dict:
    """Single-file Hilbert-clustered archive with tile dedup.

    Layout: header JSON line, then an index (tile_id, hilbert_id,
    offset, length int64 LE each, sorted by hilbert_id), then the
    concatenated gzipped tile blobs (deduplicated — identical content
    hashes share bytes).  The global Hilbert order requires a sort; the
    write itself is an ordered single-writer loop over ``iter_batches``
    (the analog of the reference's in-order writer thread,
    ``archive/TileArchiveWriter.java:138-173``).  Meant for bounded
    outputs (a planet-scale deployment shards by hilbert range first).
    """
    import json

    ordered = tiles.sort("hilbert_id")
    index: list[tuple[int, int, int, int]] = []
    blob_offsets: dict[int, tuple[int, int]] = {}
    data_parts: list[bytes] = []
    pos = 0
    n_dedup = 0
    for batch in ordered.iter_batches(batch_size=4096, batch_format="pyarrow"):
        blobs = _encode_batch(batch)
        hs = batch["content_hash"].to_numpy()
        tids = batch["tile_id"].to_numpy()
        hils = batch["hilbert_id"].to_numpy()
        for tid, hil, h, blob in zip(tids, hils, hs, blobs):
            if int(h) in blob_offsets:
                off, ln = blob_offsets[int(h)]
                n_dedup += 1
            else:
                off, ln = pos, len(blob)
                blob_offsets[int(h)] = (off, ln)
                data_parts.append(blob)
                pos += ln
            index.append((int(tid), int(hil), off, ln))
    header = json.dumps({"n_tiles": len(index), "n_blobs": len(blob_offsets),
                         "format": "planetiler-ray-archive-v1"}).encode() + b"\n"
    idx = np.array(index, dtype=np.int64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(struct.pack("<Q", len(idx)))
        f.write(idx.tobytes())
        for part in data_parts:
            f.write(part)
    os.replace(tmp, path)
    return {"n_tiles": len(index), "n_unique_blobs": len(blob_offsets),
            "n_dedup": n_dedup, "bytes": os.path.getsize(path)}


def read_archive_index(path: str) -> np.ndarray:
    """Read back the archive index → (n, 4) int64 array."""
    with open(path, "rb") as f:
        f.readline()
        (n,) = struct.unpack("<Q", f.read(8))
        return np.frombuffer(f.read(n * 4 * 8), dtype=np.int64).reshape(n, 4)


def read_archive_tile(path: str, tile_id: int) -> bytes:
    """Random-access read of one tile's (decompressed) MVT buffer."""
    idx = read_archive_index(path)
    row = idx[idx[:, 0] == tile_id]
    if not len(row):
        raise KeyError(tile_id)
    _, _, off, ln = row[0]
    with open(path, "rb") as f:
        f.readline()
        header_end = f.tell() + 8 + len(idx) * 32
        f.seek(header_end + off)
        return gzip.decompress(f.read(ln))
