"""Archive round-trip driver query: sink → reader → independent decode.

Builds the attrs-bearing single-zoom MVT tile set (the same fragment
stream the oracle-green ``mvt_tiles_z6`` summarises), writes it through
THREE archive sinks — MBTiles (sqlite, compact/deduplicated schema:
``mbtiles/Mbtiles.java:74,356``), PMTiles v3 (Hilbert clustered, RLE
dedup: ``pmtiles/WriteablePmtiles.java:132``) and the ``{z}/{x}/{y}``
gzipped-MVT file tree (``files/WriteableFilesArchive.java``) — then
reads every tile back out of each archive and re-derives the per-(tile,
layer) stats with the independent sequential protobuf decoder.

The tile identity comes from the ARCHIVE's own key (MBTiles
``zoom_level/tile_column/tile_row`` with the TMS y-flip, PMTiles Hilbert
tile id), never from the in-memory tile rows, so the query certifies the
whole write→read chain: encoder → gzip → archive layout (dedup, leaf
directories, run-length) → random-access read → gunzip → decode.

The DuckDB oracle is the placement arithmetic of ``sql_mvt_tile_summary``
cross-joined with the two archive names: every byte-level stage in
between must be lossless for the hashes to line up.

Scale notes: both sinks are the reference's single-writer archive design
(``archive/TileArchiveWriter.java:138-173``) — bounded outputs by
construction; the read-back fans the enumerated keys out through
``map_batches`` so the decode work is distributed (one sqlite/file
handle per batch, not per tile).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import sqlite3

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.exchange import exchange_reduce
from ..stages.georef import georef_batch
from ..stages.render import RenderConfig, render_fanout
from ..stages.reduce import reduce_partition
from ..tilemath.hashing import fnv1a_64_strings
from ..tilemath.mvt_pb import decode_feature_attrs, decode_tile
from ..tilemath.tilecoord import hilbert_decode_tile, tms_encode

_NAMES = {0: "chips", 1: "labels"}


def _decode_stats(archive: str, tile_ids: np.ndarray,
                  raws: list[bytes]) -> pa.Table:
    """Per-(tile, layer) stats from decoded MVT bytes — the same shape
    ``sql_mvt_tile_summary`` predicts, plus the archive tag."""
    out_tid, out_layer, out_nf, out_gs, out_cx, out_np = [], [], [], [], [], []
    for tid, raw in zip(tile_ids, raws):
        layers = decode_tile(raw)
        for name, lay in layers.items():
            feats = lay["features"]
            caps, n_png, gsum = [], 0, 0
            for f in feats:
                gsum += sum(f["geometry"])
                attrs = decode_feature_attrs(lay, f)
                caps.append(str(attrs.get("caption", "")))
                if attrs.get("fmt") == "png":
                    n_png += 1
            cx = np.uint64(0)
            if caps:
                cx = np.bitwise_xor.reduce(
                    fnv1a_64_strings(np.asarray(caps, dtype="U")))
            out_tid.append(int(tid))
            out_layer.append(name)
            out_nf.append(len(feats))
            out_gs.append(gsum)
            out_cx.append(int(np.uint64(cx).view(np.int64) if hasattr(cx, "view")
                              else np.int64(cx)))
            out_np.append(n_png)
    return pa.table({
        "archive": pa.array([archive] * len(out_tid), pa.string()),
        "tile_id": pa.array(out_tid, pa.int64()),
        "layer": pa.array(out_layer, pa.string()),
        "n_features": pa.array(out_nf, pa.int64()),
        "geom_sum": pa.array(out_gs, pa.int64()),
        "caption_fnv_xor": pa.array(out_cx, pa.int64()),
        "n_png": pa.array(out_np, pa.int64()),
    })


def archive_roundtrip_summary(sf_dir: str, zoom: int = 6,
                              num_partitions: int = 16):
    """Driver query ``archive_roundtrip``: see module docstring."""
    from ..sinks import write_files
    from ..sinks_mbtiles import write_mbtiles
    from ..sinks_pmtiles import iter_pmtiles_entries, write_pmtiles
    from .tiles import sample_partition_bounds
    from ..sources.images import images_from_documents, sample_image_ids

    images = images_from_documents(sf_dir)
    ids = sample_image_ids(sf_dir)
    cfg = RenderConfig(min_zoom=zoom, max_zoom=zoom)
    bounds = sample_partition_bounds(ids, cfg, num_partitions)

    def fanout(batch: pa.Table) -> pa.Table:
        geo = georef_batch(batch)
        return render_fanout(geo, cfg, bounds, extra_cols=("caption", "fmt"))

    frags = images.map_batches(fanout, batch_format="pyarrow", batch_size=8192)

    def reduce_fn(group: pa.Table) -> pa.Table:
        return reduce_partition(group, with_feature_ids=False,
                                mvt_attrs=("caption", "fmt"),
                                layer_names=_NAMES)

    # bounded single-zoom tile set; both sinks consume it driver-side
    # (single-writer archives), so materialize once instead of
    # re-running the pipeline per sink
    tiles = exchange_reduce(frags, num_partitions, reduce_fn).materialize()

    base = "/tmp/planetiler_ray_roundtrip"
    os.makedirs(base, exist_ok=True)
    tag = hashlib.sha1(f"{sf_dir}|{zoom}".encode()).hexdigest()[:12]
    mb_path = os.path.join(base, f"{tag}.mbtiles")
    pm_path = os.path.join(base, f"{tag}.pmtiles")
    fl_dir = os.path.join(base, f"{tag}.files")
    cs_dir = os.path.join(base, f"{tag}.csv")
    pr_dir = os.path.join(base, f"{tag}.proto")
    import shutil
    shutil.rmtree(fl_dir, ignore_errors=True)
    shutil.rmtree(cs_dir, ignore_errors=True)
    shutil.rmtree(pr_dir, ignore_errors=True)
    write_mbtiles(tiles, mb_path, compact=True)
    write_pmtiles(tiles, pm_path, min_zoom=zoom, max_zoom=zoom)
    write_files(tiles, fl_dir)
    from ..sinks import write_csv, write_proto_stream
    write_csv(tiles, cs_dir)
    write_proto_stream(tiles, pr_dir)

    # enumerate each archive's own keyspace (never the in-memory tiles)
    con = sqlite3.connect(mb_path)
    mb_keys = con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles").fetchall()
    con.close()
    pm_entries = iter_pmtiles_entries(pm_path)
    fl_keys = []
    for zdir in os.listdir(fl_dir):
        for xdir in os.listdir(os.path.join(fl_dir, zdir)):
            for yname in os.listdir(os.path.join(fl_dir, zdir, xdir)):
                fl_keys.append((int(zdir), int(xdir),
                                int(yname.split(".")[0])))

    rows = [{"archive": "mbtiles", "k0": int(z), "k1": int(xc), "k2": int(yr)}
            for z, xc, yr in mb_keys]
    rows += [{"archive": "pmtiles", "k0": int(h), "k1": int(off),
              "k2": int(ln)} for h, off, ln in pm_entries]
    rows += [{"archive": "files", "k0": z, "k1": x, "k2": y}
             for z, x, y in fl_keys]
    keys = ray.data.from_items(rows)

    def readback(batch: pa.Table) -> pa.Table:
        arch = batch["archive"].to_numpy(zero_copy_only=False)
        k0 = batch["k0"].to_numpy()
        k1 = batch["k1"].to_numpy()
        k2 = batch["k2"].to_numpy()
        parts = []
        mb = arch == "mbtiles"
        if mb.any():
            z, xc, yr = k0[mb], k1[mb], k2[mb]
            y = (1 << z.astype(np.int64)) - 1 - yr      # undo the TMS y-flip
            tids = tms_encode(xc, y, z)
            con = sqlite3.connect(mb_path)
            raws = []
            for zz, xx, rr in zip(z, xc, yr):
                blob = con.execute(
                    "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
                    "tile_column=? AND tile_row=?",
                    (int(zz), int(xx), int(rr))).fetchone()[0]
                raws.append(gzip.decompress(blob))
            con.close()
            parts.append(_decode_stats("mbtiles", tids, raws))
        fl = arch == "files"
        if fl.any():
            z, x, y = k0[fl], k1[fl], k2[fl]
            tids = tms_encode(x, y, z)
            raws = []
            for zz, xx, yy in zip(z, x, y):
                p = os.path.join(fl_dir, str(int(zz)), str(int(xx)),
                                 f"{int(yy)}.mvt.gz")
                with open(p, "rb") as f:
                    raws.append(gzip.decompress(f.read()))
            parts.append(_decode_stats("files", tids, raws))
        pm = (~mb) & (~fl)
        if pm.any():
            hx, hy, hz = hilbert_decode_tile(k0[pm])
            tids = tms_encode(hx, hy, hz)
            raws = []
            with open(pm_path, "rb") as f:
                from ..sinks_pmtiles import read_pmtiles_header
                data_off = read_pmtiles_header(pm_path)["data_off"]
                for off, ln in zip(k1[pm], k2[pm]):
                    f.seek(data_off + int(off))
                    raws.append(gzip.decompress(f.read(int(ln))))
            parts.append(_decode_stats("pmtiles", tids, raws))
        return pa.concat_tables(parts) if parts else _decode_stats(
            "mbtiles", np.array([], np.int64), [])

    rb = keys.map_batches(readback, batch_format="pyarrow", batch_size=512)

    # stream archives round-trip through their own serialization: the
    # CSV is re-read as CSV (base64 → gunzip), the proto stream is
    # re-framed shard by shard (stream/WriteableCsvArchive.java,
    # stream/WriteableProtoStreamArchive.java read contracts)
    import base64

    def csv_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _decode_stats("csv", np.array([], np.int64), [])
        z = batch["z"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        tids = tms_encode(x, y, z)
        raws = [gzip.decompress(base64.b64decode(s))
                for s in batch["encoded"].to_pylist()]
        return _decode_stats("csv", tids, raws)

    csv_ds = ray.data.read_csv(cs_dir) \
        .map_batches(csv_stats, batch_format="pyarrow")

    shard_paths = [os.path.join(pr_dir, n) for n in sorted(os.listdir(pr_dir))
                   if n.endswith(".bin")]

    def proto_stats(batch: pa.Table) -> pa.Table:
        from ..sinks import read_proto_file
        zs, xs, ys, raws = [], [], [], []
        for path in batch["path"].to_pylist():
            for t in read_proto_file(path):
                zs.append(t["z"])
                xs.append(t["x"])
                ys.append(t["y"])
                raws.append(gzip.decompress(t["bytes"]))
        tids = tms_encode(np.array(xs, np.int64), np.array(ys, np.int64),
                          np.array(zs, np.int64))
        return _decode_stats("proto", tids, raws)

    proto_ds = ray.data.from_items(
        [{"path": p} for p in shard_paths]) \
        .map_batches(proto_stats, batch_format="pyarrow")

    return rb.union(csv_ds, proto_ds)
