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

Tile payload: REAL Mapbox Vector Tile protobufs.  Tiles carrying an
``mvt_bytes`` column (attrs-bearing reduce) are written as-is; tiles
with only the compact fixed-width records are transcoded to MVT in one
vectorized pass per batch (``records_to_mvt_pb_batch``), then gzipped —
matching the reference's encode-then-compress order
(``archive/TileArchiveWriter.java:273-335``, ``VectorTile.java:97-210``).
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


def records_to_mvt_pb_batch(batch: pa.Table,
                            layer_names: dict[int, str] | None = None
                            ) -> list[bytes]:
    """Transcode a whole batch of tiles' fixed-width records → REAL MVT
    protobufs in one vectorized pass (``tilemath.mvt_pb``).

    The record coords are already quantized extent units; dividing by
    SCALE is exact in binary so the encoder's quantization round-trips
    them bit-for-bit.  No per-feature Python — the record buffers are
    concatenated zero-copy via the arrow offsets.
    """
    from .tilemath.mvt import SCALE
    from .tilemath.mvt_pb import encode_tile_batch

    arr = batch["tile_bytes"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_tiles = len(arr)
    if n_tiles == 0:
        return []
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                         count=n_tiles + 1, offset=arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]:offs[-1]]
    rec = data.view(RECORD_DTYPE)
    counts = (np.diff(offs) // RECORD_DTYPE.itemsize).astype(np.int64)
    tile_rep = np.repeat(batch["tile_id"].to_numpy(), counts)
    inv = 1.0 / SCALE
    _, blobs = encode_tile_batch(
        tile_rep, rec["layer"].astype(np.int8), rec["kind"].astype(np.int8),
        rec["id_hash"].astype(np.uint64).view(np.int64),
        rec["x0"].astype(np.float64) * inv, rec["y0"].astype(np.float64) * inv,
        rec["x1"].astype(np.float64) * inv, rec["y1"].astype(np.float64) * inv,
        layer_names or {0: "chips", 1: "labels", 2: "lines"})
    out = [b""] * n_tiles
    present = np.flatnonzero(counts > 0)
    for j, i in enumerate(present):   # O(n_tiles) blob handles, no per-feature work
        out[i] = blobs[j].as_py()
    return out


def _encode_batch(batch: pa.Table, compress: bool = True) -> list[bytes]:
    """Per-tile REAL MVT protobuf bytes (gzipped) for a batch of tiles.

    Prefers a ``mvt_bytes`` column (attrs-bearing tiles encoded in the
    reduce); otherwise transcodes the compact records vectorized."""
    if "mvt_bytes" in batch.column_names:
        raws = batch["mvt_bytes"].to_pylist()
    else:
        raws = records_to_mvt_pb_batch(batch)
    return [gzip.compress(r, 6) if compress else r for r in raws]


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


def write_csv(tiles: "ray.data.Dataset", out_dir: str) -> int:
    """``x,y,z,base64(gzip(mvt))`` CSV stream (golden-output format).
    Returns the tile count from the SAME pass — callers must not
    re-execute the lazy pipeline just to count."""
    def enc(batch: pa.Table) -> pa.Table:
        blobs = _encode_batch(batch)
        return pa.table({
            "x": batch["x"], "y": batch["y"], "z": batch["z"],
            "encoded": pa.array([base64.b64encode(b).decode() for b in blobs],
                                pa.string()),
        })

    encoded = tiles.map_batches(enc, batch_format="pyarrow").materialize()
    encoded.write_csv(out_dir)
    return encoded.count()


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


def vector_layer_stats(frags: "ray.data.Dataset",
                       attr_cols: tuple[str, ...] = (),
                       layer_names: dict | None = None,
                       infer_types: bool = False) -> list[dict]:
    """TileJSON ``vector_layers`` from the fan-out fragment stream.

    Per MVT layer: zoom range plus ``fields`` (attr name → type) — the
    ``util/LayerAttrStats.java`` contract: the reported type is the
    ENCODED value type, and this engine's MVT encoder writes every
    attr as a string value, so fields report "String" by default.
    ``infer_types=True`` instead infers "Number"/"Boolean" from value
    CONTENT (a styling hint for consumers; a field with conflicting
    content degrades to "String") — opt-in because it can claim types
    the wire encoding does not carry.  Fields only count where the
    value is present/non-empty.  Partial per-batch aggregation: only
    the tiny (layer, field) summary reaches the driver, so this second
    pass streams at any scale.
    """
    import pandas as pd
    from ray.data.aggregate import Max, Min

    def partial(batch: pa.Table) -> pa.Table:
        out = {"layer": [], "field": [], "minz": [], "maxz": [],
               "tmin": [], "tmax": []}
        if batch.num_rows:
            z = batch["z"].to_numpy()
            lay = batch["layer"].to_numpy()
            codes = np.unique(lay)

            def add(code, field, zs, tc):
                out["layer"].append(int(code))
                out["field"].append(field)
                out["minz"].append(int(zs.min()))
                out["maxz"].append(int(zs.max()))
                out["tmin"].append(int(tc.min()) if len(tc) else 0)
                out["tmax"].append(int(tc.max()) if len(tc) else 0)

            none = np.zeros(0, np.int64)
            for code in codes:                       # layers are few
                add(code, "", z[lay == code], none)
            for a in attr_cols:
                s = batch[a].to_pandas().astype("string")
                present = (s.notna() & (s != "")).to_numpy()
                if not present.any():
                    continue
                if infer_types:
                    num = pd.to_numeric(s, errors="coerce").notna() \
                        .to_numpy()
                    boo = s.str.lower().isin(["true", "false"]) \
                        .fillna(False).to_numpy()
                    tcode = np.where(boo, 1, np.where(num, 2, 3))
                else:
                    # honest default: the encoder writes strings
                    tcode = np.full(len(s), 3)
                for code in codes:
                    m = (lay == code) & present
                    if m.any():
                        add(code, a, z[m], tcode[m])
        return pa.table({"layer": pa.array(out["layer"], pa.int32()),
                         "field": pa.array(out["field"], pa.string()),
                         "minz": pa.array(out["minz"], pa.int32()),
                         "maxz": pa.array(out["maxz"], pa.int32()),
                         "tmin": pa.array(out["tmin"], pa.int32()),
                         "tmax": pa.array(out["tmax"], pa.int32())})

    agg = frags.map_batches(partial, batch_format="pyarrow") \
        .groupby(["layer", "field"]) \
        .aggregate(Min("minz", alias_name="minz"),
                   Max("maxz", alias_name="maxz"),
                   Min("tmin", alias_name="tmin"),
                   Max("tmax", alias_name="tmax")).to_pandas()
    if layer_names is None:
        from .pipelines.geometry import LAYER_NAMES as layer_names
    tnames = {1: "Boolean", 2: "Number", 3: "String"}
    layers = []
    for code, grp in agg.groupby("layer"):
        base = grp[grp["field"] == ""]
        fields = {}
        for _, r in grp[grp["field"] != ""].iterrows():
            fields[r["field"]] = ("String" if r["tmin"] != r["tmax"]
                                  else tnames[int(r["tmin"])])
        layers.append({
            "id": layer_names.get(int(code), str(int(code))),
            "minzoom": int(base["minz"].iloc[0]) if len(base)
            else int(grp["minz"].min()),
            "maxzoom": int(base["maxz"].iloc[0]) if len(base)
            else int(grp["maxz"].max()),
            "fields": dict(sorted(fields.items())),
        })
    layers.sort(key=lambda d: d["id"])
    return layers


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


def write_proto_stream(tiles: "ray.data.Dataset", out_dir: str) -> int:
    """Length-prefixed binary tile stream, one shard file per block —
    the ``stream/WriteableProtoStreamArchive.java`` analog.

    Frame layout per tile (protobuf-free, self-describing):
    ``varint(len(msg)) msg`` where ``msg`` is the protobuf-style wire
    encoding ``field1=z(varint) field2=x(varint) field3=y(varint)
    field4=tile_bytes(len-delimited)``.  Workers write shards in
    parallel; returns the tile count.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

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

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        blobs = _encode_batch(batch)
        xs = batch["x"].to_numpy()
        ys = batch["y"].to_numpy()
        zs = batch["z"].to_numpy()
        buf = bytearray()
        for x, y, z, blob in zip(xs, ys, zs, blobs):
            msg = (b"\x08" + _varint(int(z)) + b"\x10" + _varint(int(x))
                   + b"\x18" + _varint(int(y)) + b"\x22"
                   + _varint(len(blob)) + bytes(blob))
            buf += _varint(len(msg)) + msg
        shard = os.path.join(
            out_dir, f"tiles-{int(batch['tile_id'][0].as_py()):012d}.bin")
        with open(shard, "wb") as f:
            f.write(bytes(buf))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    out = tiles.map_batches(write_shard, batch_format="pyarrow").to_pandas()
    return int(out["n"].sum())


def read_proto_stream(out_dir: str) -> list[dict]:
    """Decode a proto-stream directory back to tile dicts (test helper /
    consumer contract)."""
    import os

    tiles = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".bin"):
            continue
        tiles.extend(read_proto_file(os.path.join(out_dir, name)))
    return tiles


def read_proto_file(path: str) -> list[dict]:
    """Decode ONE proto-stream shard (the per-file unit a distributed
    reader parallelizes over)."""
    tiles = []
    data = open(path, "rb").read()
    pos = 0

    def rv(p):
        r, s = 0, 0
        while True:
            b = data[p]
            p += 1
            r |= (b & 0x7F) << s
            if not b & 0x80:
                return r, p
            s += 7

    while pos < len(data):
        ln, pos = rv(pos)
        end = pos + ln
        t = {}
        while pos < end:
            key, pos = rv(pos)
            field = key >> 3
            if key & 7 == 0:
                v, pos = rv(pos)
                t[{1: "z", 2: "x", 3: "y"}[field]] = v
            else:
                bl, pos = rv(pos)
                t["bytes"] = data[pos:pos + bl]
                pos += bl
        tiles.append(t)
    return tiles


def tile_size_stats(tiles: "ray.data.Dataset", top_n: int = 10) -> dict:
    """Tileset summary statistics (``util/TilesetSummaryStatistics.java``).

    Per-zoom tile counts / byte sizes plus the global top-N biggest
    tiles — computed with partial per-batch aggregation, only the small
    summaries reach the driver.
    """
    import pandas as pd

    def per_batch(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc
        sizes = pc.binary_length(batch["tile_bytes"]).to_numpy().astype(np.int64)
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


def _expand_fill_chunk(bounds: np.ndarray, z: np.ndarray, x: np.ndarray,
                       y0: np.ndarray, y1: np.ndarray
                       ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Expand one chunk of interior fill RUNS (z, x, y0..y1) to
    hilbert-sorted (tile_id, hilbert_id) arrays — 16 bytes per fill
    tile, no geometry — PRE-PARTITIONED by the shard ``bounds``
    (one return object per shard, via ``num_returns``), so each shard
    writer fetches only its own slice instead of every expanded chunk
    (O(total fill tiles) transfer per shard otherwise).  Runs in a
    remote task so the expansion output lives in the object store,
    never on the driver."""
    from .tilemath.clip import _expand_ranges
    from .tilemath.tilecoord import hilbert_encode_tile, tms_encode

    rr, ys = _expand_ranges(np.asarray(y0, np.int64),
                            np.asarray(y1, np.int64))
    xs = np.asarray(x, np.int64)[rr]
    zs = np.asarray(z, np.int64)[rr]
    tid = tms_encode(xs, ys, zs)
    hil = np.empty(len(tid), np.int64)
    for zz in np.unique(zs):
        m = zs == zz
        hil[m] = hilbert_encode_tile(xs[m], ys[m], int(zz))
    o = np.argsort(hil, kind="stable")
    tid, hil = tid[o], hil[o]
    bounds = np.asarray(bounds, np.int64)
    # shard of h = searchsorted(bounds, h, 'right') → shard j owns
    # [bounds[j-1], bounds[j]), so the cut at bound j is the first
    # hil >= bounds[j] (side='left')
    cuts = np.concatenate([[0], np.searchsorted(hil, bounds, side="left"),
                           [len(hil)]])
    out = [(tid[a:b], hil[a:b]) for a, b in zip(cuts[:-1], cuts[1:])]
    return out if len(out) > 1 else out[0]


def fill_runs_from_striped(res: dict, z: int) -> "pa.Table":
    """Striped-clip output (``slice_polygons_striped``) → the compact
    fill-runs side table ``write_archive_sharded`` consumes."""
    n = len(res["fill_x"])
    return pa.table({
        "z": pa.array(np.full(n, z, np.int64)),
        "x": pa.array(np.asarray(res["fill_x"], np.int64)),
        "y0": pa.array(np.asarray(res["fill_y0"], np.int64)),
        "y1": pa.array(np.asarray(res["fill_y1"], np.int64))})


def write_archive_sharded(tiles: "ray.data.Dataset", out_dir: str,
                          num_shards: int = 16,
                          sample_cap: int = 100_000,
                          fill_runs: "pa.Table | None" = None,
                          fill_blob: bytes | None = None) -> dict:
    """Hilbert-range-sharded archive: per-range parts written BY WORKERS,
    the driver writes only a tiny root index.

    The scale path for :func:`write_archive` (which materializes blobs
    on the driver and is only for bounded outputs): shard bounds are
    equal-frequency quantiles of a bounded hilbert-id sample, each shard
    is one ``part-NNNNN.arc`` single-file archive (hilbert-sorted,
    content-hash-deduplicated within the shard) written inside the
    ``map_groups`` task that owns it, and the root index records the
    hilbert range → part mapping.  No stage holds more than one shard's
    blobs; a failed run can re-write only the missing parts.

    ``fill_runs`` + ``fill_blob``: run-native interior fill for
    planet-scale polygons — the analog of the reference shipping
    ``CoveredTiles`` ranges to the writer and memoizing ONE fill encode
    (``render/FeatureRenderer.java:290-315``,
    ``archive/TileArchiveWriter.java``).  The compact run table
    (z, x, y0, y1) expands in remote tasks to bare
    (tile_id, hilbert_id) pairs — 16 bytes per interior tile instead of
    a geometry row through the shuffle — and every shard writer splices
    the fill tiles of ITS hilbert range into its part, all pointing at
    one stored copy of ``fill_blob`` (raw MVT bytes, gzipped once).
    Detail tiles win over fills at the same coordinate.
    """
    import json

    os.makedirs(out_dir, exist_ok=True)

    def downsample(b: pa.Table) -> pa.Table:
        # ≤64 evenly-spaced ids per block → the driver sees a bounded,
        # whole-range sample no matter the dataset size
        step = max(1, b.num_rows // 64)
        return b.select(["hilbert_id"]).take(
            pa.array(np.arange(0, b.num_rows, step)))

    sample_df = tiles.map_batches(downsample, batch_format="pyarrow") \
        .to_pandas()
    sample = (sample_df["hilbert_id"].to_numpy()[:sample_cap]
              if "hilbert_id" in sample_df.columns     # empty → no cols
              else np.empty(0, np.int64))
    if len(sample) == 0:
        bounds = np.array([], dtype=np.int64)
    else:
        qs = np.quantile(sample, np.linspace(0, 1, num_shards + 1)[1:-1])
        bounds = np.unique(qs.astype(np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        hil = batch["hilbert_id"].to_numpy()
        shard = np.searchsorted(bounds, hil, side="right").astype(np.int32)
        return batch.append_column("shard", pa.array(shard))

    # expand fill runs AFTER bounds are known, pre-partitioned by shard
    # (num_returns = one object per shard) — each shard writer fetches
    # only its own slice, not every expanded chunk
    n_shards_eff = len(bounds) + 1
    fill_chunk_refs: list = []          # list[chunk] of list[shard ref]
    fill_blob_gz = None
    if fill_runs is not None and fill_runs.num_rows:
        if fill_blob is None:
            raise ValueError("fill_runs requires fill_blob")
        fill_blob_gz = gzip.compress(fill_blob, 6)
        expand = ray.remote(_expand_fill_chunk)
        lens = (fill_runs["y1"].to_numpy()
                - fill_runs["y0"].to_numpy() + 1)
        cuts = np.concatenate(
            [[0], np.searchsorted(np.cumsum(lens),
                                  np.arange(1, 64) * 4_000_000),
             [len(lens)]])
        for lo, hi in zip(np.unique(cuts)[:-1], np.unique(cuts)[1:]):
            if hi > lo:
                refs = expand.options(num_returns=n_shards_eff).remote(
                    bounds,
                    fill_runs["z"].to_numpy()[lo:hi],
                    fill_runs["x"].to_numpy()[lo:hi],
                    fill_runs["y0"].to_numpy()[lo:hi],
                    fill_runs["y1"].to_numpy()[lo:hi])
                fill_chunk_refs.append(
                    [refs] if n_shards_eff == 1 else list(refs))

    def shard_fills(shard: int, detail_tids: np.ndarray):
        """(tile_id, hilbert_id) of this shard's fill tiles, detail
        tiles excluded (detail wins at the same coordinate)."""
        ft, fh = [], []
        for chunk in fill_chunk_refs:
            t, h = ray.get(chunk[shard])
            ft.append(t)
            fh.append(h)
        if not ft:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ft = np.concatenate(ft)
        fh = np.concatenate(fh)
        if len(detail_tids):
            keep = ~np.isin(ft, detail_tids)
            ft, fh = ft[keep], fh[keep]
        return ft, fh

    def write_part(shard: int, grp: "pa.Table | None") -> dict:
        if grp is not None and grp.num_rows:
            order = np.argsort(grp["hilbert_id"].to_numpy(), kind="stable")
            grp = grp.take(pa.array(order))
            blobs = _encode_batch(grp)
            hs = grp["content_hash"].to_numpy()
            tids = grp["tile_id"].to_numpy()
            hils = grp["hilbert_id"].to_numpy()
        else:
            blobs, hs = [], np.empty(0, np.int64)
            tids = hils = np.empty(0, np.int64)
        index = []
        blob_offsets: dict[int, tuple[int, int]] = {}
        data_parts: list[bytes] = []
        pos = 0
        for tid, hil, h, blob in zip(tids, hils, hs, blobs):
            key = int(h)
            if key in blob_offsets:
                off, ln = blob_offsets[key]
            else:
                off, ln = pos, len(blob)
                blob_offsets[key] = (off, ln)
                data_parts.append(blob)
                pos += ln
            index.append((int(tid), int(hil), off, ln))
        # splice this shard's interior fill tiles: every entry points at
        # ONE stored copy of the shared fill blob
        n_fills = 0
        if fill_chunk_refs:
            ft, fh = shard_fills(shard, tids)
            if len(ft):
                n_fills = len(ft)
                f_off, f_ln = pos, len(fill_blob_gz)
                data_parts.append(fill_blob_gz)
                pos += f_ln
                blob_offsets[-1] = (f_off, f_ln)
                index.extend((int(t), int(h), f_off, f_ln)
                             for t, h in zip(ft, fh))
        if not index:
            return {}
        index.sort(key=lambda e: e[1])
        header = json.dumps({"n_tiles": len(index),
                             "n_blobs": len(blob_offsets),
                             "format": "planetiler-ray-archive-v1"}).encode() + b"\n"
        idx = np.array(index, dtype=np.int64)
        part_path = os.path.join(out_dir, f"part-{shard:05d}.arc")
        tmp = part_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(header)
            f.write(struct.pack("<Q", len(idx)))
            f.write(idx.tobytes())
            for p in data_parts:
                f.write(p)
        os.replace(tmp, part_path)
        return {"shard": shard, "n_tiles": len(index),
                "n_blobs": len(blob_offsets), "n_fills": n_fills,
                "min_hilbert": int(idx[:, 1].min()),
                "max_hilbert": int(idx[:, 1].max()),
                "bytes": os.path.getsize(part_path)}

    _summary_schema = {"shard": pa.int32(), "n_tiles": pa.int64(),
                       "n_blobs": pa.int64(), "n_fills": pa.int64(),
                       "min_hilbert": pa.int64(),
                       "max_hilbert": pa.int64(), "bytes": pa.int64()}

    def write_shard(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({k: pa.array([], t)
                             for k, t in _summary_schema.items()})
        shard = int(grp["shard"][0].as_py())
        rec = write_part(shard, grp)
        return pa.table({k: pa.array([rec[k]], t)
                         for k, t in _summary_schema.items()})

    summary = tiles.map_batches(assign, batch_format="pyarrow") \
        .groupby("shard").map_groups(write_shard, batch_format="pyarrow") \
        .to_pandas()
    if summary.empty:
        # zero input rows → map_groups never ran and the frame has no
        # columns; give it the typed empty shape so the root.json /
        # totals below work instead of raising KeyError
        import pandas as pd
        summary = pd.DataFrame(
            {k: pd.Series(dtype="int64") for k in _summary_schema})
    # fill-only shards: hilbert ranges no detail tile hit still own fill
    # tiles; write their parts via remote tasks (same part writer)
    if fill_chunk_refs:
        written = set(int(s) for s in summary["shard"])
        missing = [s for s in range(len(bounds) + 1) if s not in written]
        if missing:
            import pandas as pd
            part_task = ray.remote(write_part)
            recs = [r for r in ray.get(
                [part_task.remote(s, None) for s in missing]) if r]
            if recs:
                summary = pd.concat(
                    [summary, pd.DataFrame(recs)], ignore_index=True)
    root = {"format": "planetiler-ray-archive-sharded-v1",
            "bounds": bounds.tolist(),
            "shards": summary.sort_values("shard").to_dict("records")}
    with open(os.path.join(out_dir, "root.json"), "w") as f:
        json.dump(root, f, default=int)
    return {"n_shards": len(summary), "n_tiles": int(summary["n_tiles"].sum()),
            "n_fills": int(summary["n_fills"].sum()),
            "bytes": int(summary["bytes"].sum())}


def read_sharded_archive_tile(out_dir: str, tile_id: int,
                              hilbert_id: int) -> bytes:
    """Random-access read from a sharded archive via the root index."""
    import json

    with open(os.path.join(out_dir, "root.json")) as f:
        root = json.load(f)
    bounds = np.array(root["bounds"], dtype=np.int64)
    shard = int(np.searchsorted(bounds, hilbert_id, side="right"))
    return read_archive_tile(os.path.join(out_dir, f"part-{shard:05d}.arc"),
                             tile_id)


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
