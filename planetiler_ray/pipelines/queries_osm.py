"""Driver queries over the deterministic OSM world (``osmworld.py``).

These run the OSM PBF reader family end-to-end — container decode,
node→way exchange join, relation multipolygon assembly — and reduce to
small per-way / per-relation summaries a DuckDB oracle re-derives from
``generate_series`` (``sqlgen.sql_osm_way_stats`` /
``sql_osm_multipolygon_stats``).  Reference semantics:
``reader/osm/OsmReader.java`` (two-pass resolve),
``reader/osm/OsmMultipolygon.java`` (ring stitching).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..osmworld import REL_WAY_BASE, docs_count, osm_world_pbf
from ..sources.osmpbf import (read_osm_nodes, read_osm_relations,
                              read_osm_ways)
from .osm import assemble_multipolygons, way_geometries


def _minmax_per_list(col: pa.ChunkedArray):
    """Per-row min & max over a list<double> column, vectorized."""
    arr = col.combine_chunks()
    flat = pc.list_flatten(arr).to_numpy()
    counts = pc.list_value_length(arr).to_numpy().astype(np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return (np.minimum.reduceat(flat, starts),
            np.maximum.reduceat(flat, starts))


def q_osm_way_stats(sf_dir: str):
    """Per generic way: ref count, tag count, coordinate bbox in world
    mercator — exercises PBF decode + the node-location exchange join."""
    n_docs = docs_count(sf_dir)
    path = osm_world_pbf(n_docs)
    geoms = way_geometries(read_osm_nodes(path), read_osm_ways(path),
                           num_partitions=16)

    def stats(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        keep = pc.less_equal(batch["way_id"], n_docs)
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table({
                "way_id": pa.array([], pa.int64()),
                "n_refs": pa.array([], pa.int64()),
                "n_tags": pa.array([], pa.int64()),
                "min_x": pa.array([], pa.float64()),
                "max_x": pa.array([], pa.float64()),
                "min_y": pa.array([], pa.float64()),
                "max_y": pa.array([], pa.float64()),
            })
        min_x, max_x = _minmax_per_list(batch["xs"])
        min_y, max_y = _minmax_per_list(batch["ys"])
        return pa.table({
            "way_id": batch["way_id"],
            "n_refs": batch["n_refs"],
            "n_tags": pc.cast(pc.list_value_length(
                batch["tag_keys"].combine_chunks()), pa.int64()),
            "min_x": pa.array(min_x),
            "max_x": pa.array(max_x),
            # mercator y is transcendental — numpy and the SQL oracle's
            # libm can differ in the last ulp; both sides quantize to a
            # 1e-9 grid (x is exact algebra, no quantize needed)
            "min_y": pa.array(np.round(min_y * 1e9) / 1e9),
            "max_y": pa.array(np.round(max_y * 1e9) / 1e9),
        })

    out = geoms.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("way_id").reset_index(drop=True)


def _ring_area2_grid(xs_col: pa.ChunkedArray,
                     ys_col: pa.ChunkedArray) -> np.ndarray:
    """Per-ring 2×signed shoelace area on the 1e-7 snapped INTEGER grid
    (exact int64 — bit-reproducible in SQL).  Rings are open; the
    closing edge is implied.  Sign follows the emitted orientation:
    shells positive, holes negative."""
    arr_x = xs_col.combine_chunks()
    arr_y = ys_col.combine_chunks()
    gx = np.round(pc.list_flatten(arr_x).to_numpy() * 1e7).astype(np.int64)
    gy = np.round(pc.list_flatten(arr_y).to_numpy() * 1e7).astype(np.int64)
    counts = pc.list_value_length(arr_x).to_numpy().astype(np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    if len(gx) == 0:
        return np.zeros(len(counts), np.int64)
    rid = np.repeat(np.arange(len(counts)), counts)
    idx = np.arange(len(gx), dtype=np.int64)
    nxt = idx + 1
    is_last = idx == starts[rid] + counts[rid] - 1
    nxt[is_last] = starts[rid[is_last]]
    cross = gx * gy[nxt] - gx[nxt] * gy
    out = np.zeros(len(counts), np.int64)
    nonempty = counts > 0
    if nonempty.any():
        out[nonempty] = np.add.reduceat(cross, starts[nonempty])
    return out


def q_osm_multipolygon_stats(sf_dir: str):
    """Per multipolygon relation: ring/hole/vertex counts, snapped
    vertex bbox, and the sum of signed 2×shoelace areas on the integer
    snap grid — exercises member join, ring stitching, snap+fix AND the
    real-containment hole nesting (the cshape / nested3 families flip
    sign under bbox-only nesting)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    n_docs = docs_count(sf_dir)
    path = osm_world_pbf(n_docs)
    nodes = read_osm_nodes(path)
    ways = read_osm_ways(path)
    rels = read_osm_relations(path)
    rings = assemble_multipolygons(
        rels, way_geometries(nodes, ways, num_partitions=16),
        num_partitions=4)

    def per_ring(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "rel_id" not in batch.schema.names:
            return pa.table({
                "rel_id": pa.array([], pa.int64()),
                "is_hole_i": pa.array([], pa.int64()),
                "n_v": pa.array([], pa.int64()),
                "area2": pa.array([], pa.int64()),
                "rmin_x": pa.array([], pa.float64()),
                "rmax_x": pa.array([], pa.float64()),
                "rmin_y": pa.array([], pa.float64()),
                "rmax_y": pa.array([], pa.float64()),
            })
        batch = batch.combine_chunks()
        min_x, max_x = _minmax_per_list(batch["xs"])
        min_y, max_y = _minmax_per_list(batch["ys"])
        return pa.table({
            "rel_id": batch["rel_id"],
            "is_hole_i": pc.cast(batch["is_hole"], pa.int64()),
            "n_v": pc.cast(pc.list_value_length(
                batch["xs"].combine_chunks()), pa.int64()),
            "area2": pa.array(_ring_area2_grid(batch["xs"], batch["ys"])),
            "rmin_x": pa.array(min_x),
            "rmax_x": pa.array(max_x),
            "rmin_y": pa.array(min_y),
            "rmax_y": pa.array(max_y),
        })

    agg = rings.map_batches(per_ring, batch_format="pyarrow") \
        .groupby("rel_id") \
        .aggregate(Count(alias_name="n_rings"),
                   Sum("is_hole_i", alias_name="n_holes"),
                   Sum("n_v", alias_name="n_vertices"),
                   Sum("area2", alias_name="area2_sum"),
                   Min("rmin_x", alias_name="min_x"),
                   Max("rmax_x", alias_name="max_x"),
                   Min("rmin_y", alias_name="min_y"),
                   Max("rmax_y", alias_name="max_y")) \
        .to_pandas()
    for c in ("n_rings", "n_holes", "n_vertices", "area2_sum"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("rel_id").reset_index(drop=True)


def q_osm_line_tiles(sf_dir: str, zoom: int = 6):
    """OSM ways → MVT line-layer tiles: the reference's core dataflow
    (PBF → resolve → stripe-clip → per-tile MVT encode), summarized per
    tile and replayed by the SQL oracle (``sqlgen.sql_osm_line_tiles``)."""
    from ..tilemath.clip import DEFAULT_BUFFER_PX, slice_lines
    from ..tilemath.tilecoord import tms_encode
    from .tiles import line_parts_per_tile

    n_docs = docs_count(sf_dir)
    path = osm_world_pbf(n_docs)
    geoms = way_geometries(read_osm_nodes(path), read_osm_ways(path),
                           num_partitions=16)
    f = float(1 << zoom)
    buf = DEFAULT_BUFFER_PX / 256.0

    def fan(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "tile_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "part_seq": pa.array([], pa.int64()),
            "vx": pa.array([], pa.list_(pa.float32())),
            "vy": pa.array([], pa.list_(pa.float32())),
        })
        if batch.num_rows == 0:
            return empty
        batch = batch.combine_chunks()
        batch = batch.filter(pc.less_equal(batch["way_id"], n_docs))
        if batch.num_rows == 0:
            return empty
        xs_l = batch["xs"].combine_chunks()
        ys_l = batch["ys"].combine_chunks()
        offs = np.asarray(xs_l.offsets.to_numpy(), np.int64)
        r = slice_lines(xs_l.flatten().to_numpy() * f,
                        ys_l.flatten().to_numpy() * f,
                        offs, zoom, buf)
        n_parts = len(r["x"])
        if n_parts == 0:
            return empty
        wid = batch["way_id"].to_numpy()[r["line"]]
        # part_seq: occurrence order within each line (slice_lines emits
        # a line's parts in segment order)
        order = np.argsort(r["line"], kind="stable")
        starts = np.zeros(n_parts, np.int64)
        change = np.empty(n_parts, bool)
        change[0] = True
        change[1:] = np.diff(r["line"][order]) != 0
        run_start = np.flatnonzero(change)
        rel = np.arange(n_parts) - np.repeat(
            run_start, np.diff(np.append(run_start, n_parts)))
        part_seq = np.empty(n_parts, np.int64)
        part_seq[order] = rel
        del starts
        tid = tms_encode(r["x"], r["y"], np.full(n_parts, zoom, np.int64))
        off = pa.array(r["part_offsets"].astype(np.int32))
        return pa.table({
            "tile_id": pa.array(tid),
            "user_id": pa.array(wid),
            "part_seq": pa.array(part_seq),
            "vx": pa.ListArray.from_arrays(
                off, pa.array(r["vx"].astype(np.float32))),
            "vy": pa.ListArray.from_arrays(
                off, pa.array(r["vy"].astype(np.float32))),
        })

    from .tiles import tile_hash_exchange
    return tile_hash_exchange(geoms.map_batches(fan, batch_format="pyarrow"),
                              line_parts_per_tile)


def q_osm_poi_stats(sf_dir: str):
    """Per poi-class stats over tagged nodes (every 10th node carries
    ``poi = str(id mod 7)``) — exercises DenseNodes tag decode through
    the driver gate."""
    from ray.data.aggregate import Count, Max, Min

    n_docs = docs_count(sf_dir)
    path = osm_world_pbf(n_docs)
    nodes = read_osm_nodes(path)

    def tagged(batch: pa.Table) -> pa.Table:
        empty = pa.table({"poi": pa.array([], pa.string()),
                          "node_id": pa.array([], pa.int64()),
                          "lon": pa.array([], pa.float64())})
        if batch.num_rows == 0 or "node_id" not in batch.schema.names:
            return empty
        batch = batch.combine_chunks()
        tk = batch["tag_keys"].combine_chunks()
        flat_k = pc.list_flatten(tk)
        parents = pc.list_parent_indices(tk).to_numpy()
        vals = pc.list_flatten(
            batch["tag_vals"].combine_chunks()).to_numpy(
            zero_copy_only=False)
        hit = np.asarray(pc.equal(flat_k, "poi").to_numpy(
            zero_copy_only=False), bool)
        rows = parents[hit]
        # generic nodes only (relation corner nodes are untagged anyway)
        return pa.table({
            "poi": pa.array(vals[hit], pa.string()),
            "node_id": batch["node_id"].take(pa.array(rows, pa.int64())),
            "lon": batch["lon"].take(pa.array(rows, pa.int64())),
        })

    out = nodes.map_batches(tagged, batch_format="pyarrow") \
        .groupby("poi").aggregate(Count(alias_name="n"),
                                  Min("node_id", alias_name="min_id"),
                                  Max("node_id", alias_name="max_id"),
                                  Min("lon", alias_name="min_lon"),
                                  Max("lon", alias_name="max_lon")) \
        .to_pandas()
    for c in ("n", "min_id", "max_id"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("poi").reset_index(drop=True)


QUERIES_OSM = {
    "osm_way_stats": q_osm_way_stats,
    "osm_multipolygon_stats": q_osm_multipolygon_stats,
    "osm_line_tiles": q_osm_line_tiles,
    "osm_poi_stats": q_osm_poi_stats,
}
