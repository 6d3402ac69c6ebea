"""MBTiles (sqlite) tile-archive sink.

The analog of ``mbtiles/Mbtiles.java``: standard MBTiles 1.3 layout
with the reference's optional *normalized* schema that deduplicates
identical tiles (``tiles_shallow`` referencing ``tiles_data`` by
content hash — ``Mbtiles.java:74,356`` compact mode).

sqlite requires a single writer, so this sink is an ordered
driver-side loop over ``iter_batches`` with batched prepared inserts —
the same single-writer-thread design as the reference's
``TileArchiveWriter`` (``archive/TileArchiveWriter.java:138-173``).
Tile rows use the MBTiles TMS y-flip: ``tile_row = 2^z - 1 - y``.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pyarrow as pa

import ray.data

from .sinks import _encode_batch


def write_mbtiles(tiles: "ray.data.Dataset", path: str,
                  metadata: dict | None = None, compact: bool = True,
                  batch_size: int = 2048,
                  vector_layers: list[dict] | None = None) -> dict:
    """Write the tile Dataset to an MBTiles file; returns summary stats.

    ``vector_layers`` (from :func:`sinks.vector_layer_stats`) lands in
    the MBTiles-1.3 ``json`` metadata row as
    ``{"vector_layers": [...]}`` — the TileJSON layer/zoom/field-type
    discovery block clients read (``mbtiles/MbtilesMetadata.java``)."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA synchronous=OFF")
    cur.execute("PRAGMA journal_mode=OFF")
    cur.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    if compact:
        cur.execute("""CREATE TABLE tiles_data
                       (tile_data_id INTEGER PRIMARY KEY, tile_data BLOB)""")
        cur.execute("""CREATE TABLE tiles_shallow
                       (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER,
                        tile_data_id INTEGER)""")
        cur.execute("""CREATE VIEW tiles AS
                       SELECT zoom_level, tile_column, tile_row, tile_data
                       FROM tiles_shallow JOIN tiles_data USING (tile_data_id)""")
    else:
        cur.execute("""CREATE TABLE tiles
                       (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER,
                        tile_data BLOB)""")

    meta = {"name": "planetiler_ray", "format": "pbf", "type": "overlay",
            "version": "1", **(metadata or {})}
    if vector_layers is not None:
        meta["json"] = json.dumps({"vector_layers": vector_layers})
    elif meta.get("format") == "pbf" and "json" not in meta:
        # MBTiles 1.3 REQUIRES the json row (vector_layers) for pbf
        # archives — consumers refuse archives without it, so write an
        # empty one when the caller gave no layer stats
        meta["json"] = json.dumps({"vector_layers": []})
    cur.executemany("INSERT INTO metadata VALUES (?, ?)",
                    [(k, str(v)) for k, v in meta.items()])

    n_tiles = 0
    hash_to_id: dict[int, int] = {}
    for batch in tiles.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        blobs = _encode_batch(batch)
        zs = batch["z"].to_numpy()
        xs = batch["x"].to_numpy()
        ys = batch["y"].to_numpy()
        hs = batch["content_hash"].to_numpy()
        if compact:
            shallow_rows, data_rows = [], []
            for z, x, y, h, blob in zip(zs, xs, ys, hs, blobs):
                did = hash_to_id.get(int(h))
                if did is None:
                    did = len(hash_to_id) + 1
                    hash_to_id[int(h)] = did
                    data_rows.append((did, blob))
                shallow_rows.append((int(z), int(x), (1 << int(z)) - 1 - int(y), did))
            if data_rows:
                cur.executemany("INSERT INTO tiles_data VALUES (?, ?)", data_rows)
            cur.executemany("INSERT INTO tiles_shallow VALUES (?, ?, ?, ?)",
                            shallow_rows)
        else:
            cur.executemany(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                [(int(z), int(x), (1 << int(z)) - 1 - int(y), blob)
                 for z, x, y, blob in zip(zs, xs, ys, blobs)])
        n_tiles += batch.num_rows
    if compact:
        cur.execute("""CREATE UNIQUE INDEX tiles_shallow_idx ON tiles_shallow
                       (zoom_level, tile_column, tile_row)""")
    else:
        cur.execute("""CREATE UNIQUE INDEX tiles_idx ON tiles
                       (zoom_level, tile_column, tile_row)""")
    con.commit()
    con.close()
    return {"n_tiles": n_tiles,
            "n_unique_blobs": len(hash_to_id) if compact else n_tiles,
            "bytes": os.path.getsize(path)}


def read_mbtiles_tile(path: str, z: int, x: int, y: int) -> bytes | None:
    """Random-access read (y in XYZ scheme; flipped internally)."""
    con = sqlite3.connect(path)
    try:
        row = con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? "
            "AND tile_row=?", (z, x, (1 << z) - 1 - y)).fetchone()
        return row[0] if row else None
    finally:
        con.close()
