"""OSM element pipelines: way→node join, relation multimap,
multipolygon assembly — cluster-native re-expressions of the
reference's two-pass OSM machinery.

The reference resolves way geometries through a shared in-RAM node
location map (``OsmReader.java`` pass1 → ``LongLongMap``, ~8 B × 10⁹
nodes on EVERY worker) and assembles relation multipolygons from an
in-process way cache (``OsmMultipolygon.java``).  At cluster scale a
shared mutable map is the wrong primitive; here both lookups become
**hash-partitioned exchange joins** on the engine's explicit shuffle
(``stages/exchange.py``):

  pass 1: nodes(node_id → lon/lat)   ways exploded to (node_id, way_id, seq)
          both hash-partitioned by node_id → per-partition sorted
          lookup (np.searchsorted) emits (way_id, seq, lon, lat)
  pass 2: resolved points + way tag rows hash-partitioned by way_id →
          vectorized segment assembly into coordinate lists

Every per-element operation is numpy (lexsort + segment boundaries);
Python touches only per-partition table plumbing.  Skew note: node ids
are hashed with a Knuth multiplicative mix before the modulo, so
id-locality (OSM ids are spatially clustered) does not skew
partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.exchange import exchange_reduce
from ..tilemath.projection import get_world_x, get_world_y

_HASH_MULT = 2654435761


def _part_of(ids: np.ndarray, num_partitions: int) -> np.ndarray:
    return (((ids.astype(np.uint64) * np.uint64(_HASH_MULT))
             >> np.uint64(16)) % np.uint64(num_partitions)).astype(np.int64)


def _close_super_relations(parents: np.ndarray, childs: np.ndarray,
                           roots: np.ndarray, max_depth: int = 8
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Bounded multi-source BFS over the relation-membership graph,
    fully vectorized (``OsmReader.java:563-607`` super-relation
    closure): returns (descendant, root) id pairs — every relation
    reachable from a root within ``max_depth`` frontier expansions —
    sorted by (descendant, root).

    Ids are rank-compressed so (root, node) pairs pack into int64
    without overflow; each expansion is two ``searchsorted`` calls
    over the parent-sorted edge array plus a variable-length range
    expansion — no per-edge Python.
    """
    parents = np.asarray(parents, np.int64)
    childs = np.asarray(childs, np.int64)
    roots = np.asarray(roots, np.int64)
    if len(parents) == 0 or len(roots) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = np.unique(np.concatenate([parents, childs, roots]))
    n = np.int64(len(ids))
    p = np.searchsorted(ids, parents)
    c = np.searchsorted(ids, childs)
    o = np.argsort(p, kind="stable")
    p, c = p[o], c[o]
    rts = np.unique(np.searchsorted(ids, roots))

    def children_of(pair_root: np.ndarray, pair_node: np.ndarray):
        lo = np.searchsorted(p, pair_node, "left")
        hi = np.searchsorted(p, pair_node, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return (np.empty(0, np.int64),) * 2
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(starts, cnt) + np.repeat(lo, cnt))
        return np.repeat(pair_root, cnt), c[idx]

    seen = np.sort(rts * n + rts)           # (root, root) pre-seen
    fr_root, fr_node = children_of(rts, rts)
    out: list[np.ndarray] = []
    for _ in range(max_depth):
        if len(fr_node) == 0:
            break
        key = np.unique(fr_root * n + fr_node)
        pos = np.searchsorted(seen, key)
        posc = np.minimum(pos, len(seen) - 1)
        new_key = key[(pos >= len(seen)) | (seen[posc] != key)]
        if len(new_key) == 0:
            break
        seen = np.union1d(seen, new_key)
        out.append(new_key)
        fr_root, fr_node = children_of(new_key // n, new_key % n)
    if not out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    allk = np.concatenate(out)
    # sort by (descendant, root): pack desc-major
    order = np.argsort((allk % n) * n + allk // n, kind="stable")
    allk = allk[order]
    return ids[allk % n], ids[allk // n]


def _empty_join_schema() -> pa.Table:
    return pa.table({
        "part": pa.array([], pa.int64()),
        "side": pa.array([], pa.int8()),
        "node_id": pa.array([], pa.int64()),
        "way_id": pa.array([], pa.int64()),
        "seq": pa.array([], pa.int64()),
        "lon": pa.array([], pa.float64()),
        "lat": pa.array([], pa.float64()),
    })


def resolve_way_nodes(nodes: "ray.data.Dataset", ways: "ray.data.Dataset",
                      num_partitions: int = 16) -> "ray.data.Dataset":
    """Join each way ref against node locations →
    Dataset(way_id, seq, lon, lat) — one row per way vertex."""

    def node_side(batch: pa.Table) -> pa.Table:
        ids = batch["node_id"].to_numpy()
        n = len(ids)
        return pa.table({
            "part": pa.array(_part_of(ids, num_partitions)),
            "side": pa.array(np.zeros(n, np.int8)),
            "node_id": pa.array(ids),
            "way_id": pa.array(np.full(n, -1, np.int64)),
            "seq": pa.array(np.full(n, -1, np.int64)),
            "lon": batch["lon"],
            "lat": batch["lat"],
        })

    def ref_side(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        refs = batch["refs"]
        flat = pc.list_flatten(refs).to_numpy()
        parent = pc.list_parent_indices(refs).to_numpy()
        counts = pc.list_value_length(refs).to_numpy().astype(np.int64)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        seq = np.arange(len(flat), dtype=np.int64) - starts[parent]
        way_ids = batch["way_id"].to_numpy()[parent]
        m = len(flat)
        return pa.table({
            "part": pa.array(_part_of(flat, num_partitions)),
            "side": pa.array(np.ones(m, np.int8)),
            "node_id": pa.array(flat),
            "way_id": pa.array(way_ids),
            "seq": pa.array(seq),
            "lon": pa.array(np.full(m, np.nan)),
            "lat": pa.array(np.full(m, np.nan)),
        })

    left = nodes.map_batches(node_side, batch_format="pyarrow")
    right = ways.map_batches(ref_side, batch_format="pyarrow")
    both = left.union(right)

    def join_partition(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"way_id": pa.array([], pa.int64()),
                             "seq": pa.array([], pa.int64()),
                             "lon": pa.array([], pa.float64()),
                             "lat": pa.array([], pa.float64())})
        side = tbl["side"].to_numpy()
        nid = tbl["node_id"].to_numpy()
        is_node = side == 0
        n_ids = nid[is_node]
        order = np.argsort(n_ids, kind="stable")
        n_sorted = n_ids[order]
        n_lon = tbl["lon"].to_numpy()[is_node][order]
        n_lat = tbl["lat"].to_numpy()[is_node][order]
        r_ids = nid[~is_node]
        pos = np.searchsorted(n_sorted, r_ids)
        ok = (pos < len(n_sorted))
        pos_c = np.minimum(pos, max(len(n_sorted) - 1, 0))
        ok &= (n_sorted[pos_c] == r_ids) if len(n_sorted) else False
        return pa.table({
            "way_id": pa.array(tbl["way_id"].to_numpy()[~is_node][ok]),
            "seq": pa.array(tbl["seq"].to_numpy()[~is_node][ok]),
            "lon": pa.array(n_lon[pos_c[ok]]),
            "lat": pa.array(n_lat[pos_c[ok]]),
        })

    return exchange_reduce(both, num_partitions, join_partition)


def assemble_way_geometries(resolved: "ray.data.Dataset",
                            ways: "ray.data.Dataset",
                            num_partitions: int = 16) -> "ray.data.Dataset":
    """(way_id, seq, lon, lat) rows + way tag rows → Dataset(way_id,
    xs, ys [world mercator lists], n_refs, tag_keys, tag_vals).
    Vectorized per partition: lexsort (way_id, seq) → segment
    boundaries → one ListArray build."""

    def point_side(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy()
        n = len(wid)
        return pa.table({
            "part": pa.array(_part_of(wid, num_partitions)),
            "side": pa.array(np.zeros(n, np.int8)),
            "way_id": batch["way_id"],
            "seq": batch["seq"],
            "lon": batch["lon"],
            "lat": batch["lat"],
            "tag_keys": pa.array([[]] * n, pa.list_(pa.string())),
            "tag_vals": pa.array([[]] * n, pa.list_(pa.string())),
        })

    def meta_side(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy()
        n = len(wid)
        return pa.table({
            "part": pa.array(_part_of(wid, num_partitions)),
            "side": pa.array(np.ones(n, np.int8)),
            "way_id": batch["way_id"],
            "seq": pa.array(np.full(n, -1, np.int64)),
            "lon": pa.array(np.full(n, np.nan)),
            "lat": pa.array(np.full(n, np.nan)),
            "tag_keys": batch["tag_keys"],
            "tag_vals": batch["tag_vals"],
        })

    both = resolved.map_batches(point_side, batch_format="pyarrow").union(
        ways.map_batches(meta_side, batch_format="pyarrow"))

    def build(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "way_id": pa.array([], pa.int64()),
            "xs": pa.array([], pa.list_(pa.float64())),
            "ys": pa.array([], pa.list_(pa.float64())),
            "n_refs": pa.array([], pa.int64()),
            "tag_keys": pa.array([], pa.list_(pa.string())),
            "tag_vals": pa.array([], pa.list_(pa.string())),
        })
        if tbl.num_rows == 0:
            return empty
        tbl = tbl.combine_chunks()
        side = tbl["side"].to_numpy()
        pts = side == 0
        wid = tbl["way_id"].to_numpy()[pts]
        if len(wid) == 0:
            return empty
        seq = tbl["seq"].to_numpy()[pts]
        lon = tbl["lon"].to_numpy()[pts]
        lat = tbl["lat"].to_numpy()[pts]
        order = np.lexsort((seq, wid))
        wid, seq = wid[order], seq[order]
        wx = get_world_x(lon[order])
        wy = get_world_y(lat[order])
        change = np.empty(len(wid), bool)
        change[0] = True
        change[1:] = np.diff(wid) != 0
        starts = np.flatnonzero(change)
        uniq = wid[starts]
        counts = np.diff(np.append(starts, len(wid)))
        off = pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
        # attach tags: meta rows sorted by way_id, gathered per segment;
        # a way with NO meta row in the partition (clipped input / dirty
        # data) null-fills its tag columns — pyarrow take() rejects -1
        # sentinels, so missing rows are marked null via the index mask
        mwid = tbl["way_id"].to_numpy()[~pts]
        tk = tbl["tag_keys"].combine_chunks()
        tv = tbl["tag_vals"].combine_chunks()
        if len(mwid):
            morder = np.argsort(mwid, kind="stable")
            msorted = mwid[morder]
            mpos = np.searchsorted(msorted, uniq)
            has = mpos < len(msorted)
            mpos_c = np.minimum(mpos, len(msorted) - 1)
            has &= msorted[mpos_c] == uniq
            meta_idx = np.flatnonzero(~pts)[morder][mpos_c]
        else:
            has = np.zeros(len(uniq), bool)
            meta_idx = np.zeros(len(uniq), np.int64)
        take_idx = pa.array(np.where(has, meta_idx, 0), pa.int64(),
                            mask=~has)
        keys_col = tk.take(take_idx)
        vals_col = tv.take(take_idx)
        return pa.table({
            "way_id": pa.array(uniq),
            "xs": pa.ListArray.from_arrays(off, pa.array(wx)),
            "ys": pa.ListArray.from_arrays(off, pa.array(wy)),
            "n_refs": pa.array(counts.astype(np.int64)),
            "tag_keys": keys_col,
            "tag_vals": vals_col,
        })

    return exchange_reduce(both, num_partitions, build)


def way_geometries(nodes: "ray.data.Dataset", ways: "ray.data.Dataset",
                   num_partitions: int = 16) -> "ray.data.Dataset":
    """The full two-pass resolve: nodes + ways → way geometries."""
    resolved = resolve_way_nodes(nodes, ways, num_partitions)
    return assemble_way_geometries(resolved, ways, num_partitions)


# ---------------------------------------------------------------------------
# relations: way→relation multimap + multipolygon assembly
# ---------------------------------------------------------------------------


def relation_way_members(relations: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode relation members of type way →
    Dataset(way_id, rel_id, member_seq, role) — the reference's
    way→relation multimap (``OsmReader.java`` relation preprocessing)
    as a flat dataset."""

    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        mids = batch["mem_ids"]
        flat = pc.list_flatten(mids).to_numpy()
        parent = pc.list_parent_indices(mids).to_numpy()
        types = pc.list_flatten(batch["mem_types"]).to_numpy()
        roles = pc.list_flatten(batch["mem_roles"]).to_pylist()
        counts = pc.list_value_length(mids).to_numpy().astype(np.int64)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        seq = np.arange(len(flat), dtype=np.int64) - starts[parent]
        is_way = types == 1
        rel_ids = batch["rel_id"].to_numpy()[parent]
        return pa.table({
            "way_id": pa.array(flat[is_way]),
            "rel_id": pa.array(rel_ids[is_way]),
            "member_seq": pa.array(seq[is_way]),
            "role": pa.array([roles[i] for i in np.flatnonzero(is_way)],
                             pa.string()),
        })

    return relations.map_batches(explode, batch_format="pyarrow")


def _stitch_rings(segments: list[np.ndarray],
                  stats=None) -> list[np.ndarray]:
    """Connect open way segments end-to-end into closed rings —
    ``OsmMultipolygon.connectPolygonSegments`` semantics (greedy
    endpoint matching, either orientation).  Input/output coords are
    (n, 2) arrays; unclosable leftovers are dropped and counted against
    ``data_errors.unclosed_ring`` when a ``RunStats`` handle is given
    (skip-and-count convention)."""
    segs = [s for s in segments if len(s) >= 2]
    rings = []
    while segs:
        cur = segs.pop()
        # already closed?
        while not (len(cur) >= 4 and (cur[0] == cur[-1]).all()):
            end = cur[-1]
            found = None
            for i, s in enumerate(segs):
                if (s[0] == end).all():
                    found, piece = i, s[1:]
                    break
                if (s[-1] == end).all():
                    found, piece = i, s[::-1][1:]
                    break
            if found is None:
                if stats is not None:
                    stats.data_error("unclosed_ring")
                cur = None
                break
            segs.pop(found)
            cur = np.vstack([cur, piece])
        if cur is not None:
            rings.append(cur[:-1])          # drop closing vertex
    return rings


def _ring_bboxes(fx: np.ndarray, fy: np.ndarray, offs: np.ndarray):
    starts = offs[:-1]
    return (np.minimum.reduceat(fx, starts), np.minimum.reduceat(fy, starts),
            np.maximum.reduceat(fx, starts), np.maximum.reduceat(fy, starts))


def _point_in_ring(px: float, py: float, rx: np.ndarray,
                   ry: np.ndarray) -> bool:
    """Crossing-number point-in-polygon test (half-open edge rule), one
    point against one open ring, vectorized over the ring's edges."""
    x2 = np.roll(rx, -1)
    y2 = np.roll(ry, -1)
    cond = (ry > py) != (y2 > py)
    if not cond.any():
        return False
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = rx + (py - ry) * (x2 - rx) / (y2 - ry)
    return bool(np.count_nonzero(cond & (px < xint)) & 1)


def _nest_rings(fx: np.ndarray, fy: np.ndarray, offs: np.ndarray,
                areas: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Real geometric ring nesting — ``OsmMultipolygon.java:51-57,
    178-237`` semantics: rings sorted by |area| descending, each ring's
    immediate parent is the SMALLEST larger ring geometrically
    containing its first vertex (bbox prefilter, then crossing-number
    test), and a ring is a hole iff its nesting depth is odd.  A
    bbox-only test misclassifies a disjoint ring whose bbox nests
    inside a concave ring's bbox (e.g. an island beside a C-shaped
    outer) — the round-2 latent defect this replaces.

    Returns ``(emit_order, is_hole)`` where ``emit_order`` lists each
    exterior ring immediately followed by its own interior rings (the
    MVT 2.1 §4.3.4.4 ring order the encoder's feature grouping relies
    on)."""
    k = len(offs) - 1
    order = np.argsort(-np.abs(areas), kind="stable")
    bx0, by0, bx1, by1 = _ring_bboxes(fx, fy, offs)
    depth = np.zeros(k, np.int64)
    parent = np.full(k, -1, np.int64)
    for rank in range(1, k):
        i = order[rank]
        px0, py0 = fx[offs[i]], fy[offs[i]]
        for rj in range(rank - 1, -1, -1):    # smallest containing ring wins
            j = order[rj]
            if not (bx0[j] <= px0 <= bx1[j] and by0[j] <= py0 <= by1[j]):
                continue
            if _point_in_ring(px0, py0, fx[offs[j]:offs[j + 1]],
                              fy[offs[j]:offs[j + 1]]):
                parent[i] = j
                depth[i] = depth[j] + 1
                break
    is_hole = (depth & 1) == 1
    shell_of = np.where(is_hole, parent, np.arange(k))
    rank_of = np.empty(k, np.int64)
    rank_of[order] = np.arange(k)
    # a hole's shell always has a smaller area rank, so sorting by
    # (shell's rank, own rank) puts each shell directly before its holes
    emit = np.lexsort((rank_of, rank_of[shell_of]))
    return emit, is_hole


def assemble_multipolygons(relations: "ray.data.Dataset",
                           way_geoms: "ray.data.Dataset",
                           num_partitions: int = 8,
                           stats=None) -> "ray.data.Dataset":
    """type=multipolygon relations + member way geometries →
    Dataset(rel_id, ring_idx, is_hole, xs, ys) with stitched rings and
    the snap+fix orientation contract (outer CCW, hole CW) applied via
    ``tilemath/validity.py``.

    Join shape: members exploded → hash-partition by way_id against
    way geometries (same exchange as the node join) → re-partition by
    rel_id → per-relation stitching (relations are small: per-relation
    Python is bounded by member count, not dataset size).
    """
    from ..tilemath.validity import (repair_rings, ring_signed_area,
                                     snap_fix_rings)

    def is_mp(batch: pa.Table) -> pa.Table:
        # vectorized over the flattened tag stream (the tags_to_columns
        # idiom) — no per-relation Python
        if batch.num_rows == 0:
            return batch
        t = tags_to_columns(batch.select(["rel_id", "tag_keys", "tag_vals"]),
                            ("type",))
        m = pc.is_in(t["type"],
                     value_set=pa.array(["multipolygon", "boundary"]))
        return batch.filter(pc.fill_null(m, False))

    mp_rels = relations.map_batches(is_mp, batch_format="pyarrow")
    members = relation_way_members(mp_rels)

    # super-relation closure (``OsmReader.java:563-607``): relations can
    # member OTHER relations; their way members belong to the root.
    # The relation-membership graph is tiny (edges only exist for
    # super-relations), so it is collected driver-side, closed with a
    # bounded BFS, and the descendant→roots map applied as one
    # vectorized re-labeling pass over the exploded members.
    def rel_edges(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        mids = batch["mem_ids"]
        flat = pc.list_flatten(mids).to_numpy()
        parent = pc.list_parent_indices(mids).to_numpy()
        types = pc.list_flatten(batch["mem_types"]).to_numpy()
        is_rel = types == 2
        return pa.table({
            "parent": pa.array(batch["rel_id"].to_numpy()[parent][is_rel]),
            "child": pa.array(flat[is_rel])})

    edges = relations.map_batches(rel_edges, batch_format="pyarrow") \
        .to_pandas()
    if len(edges):
        root_ids = mp_rels.select_columns(["rel_id"]) \
            .to_pandas()["rel_id"].to_numpy()
        pair_d, pair_r = _close_super_relations(
            edges["parent"].to_numpy(), edges["child"].to_numpy(),
            root_ids)
        if len(pair_d):
            d_sorted, r_counts = np.unique(pair_d, return_counts=True)
            r_off = np.concatenate([[0], np.cumsum(r_counts)])
            r_flat = pair_r                # grouped: pairs sorted by desc

            def relabel(batch: pa.Table) -> pa.Table:
                """way members of descendant relations → one row per
                (member, root) with rel_id replaced by the root."""
                if batch.num_rows == 0:
                    return batch
                rid = batch["rel_id"].to_numpy()
                pos = np.searchsorted(d_sorted, rid)
                posc = np.minimum(pos, len(d_sorted) - 1)
                hit = d_sorted[posc] == rid
                sel = np.flatnonzero(hit)
                if not len(sel):
                    return batch.slice(0, 0)
                reps = r_counts[posc[sel]]
                rows = np.repeat(sel, reps)
                roots = np.concatenate(
                    [r_flat[r_off[p]:r_off[p] + c]
                     for p, c in zip(posc[sel], reps)])
                out = batch.take(pa.array(rows, pa.int64()))
                return out.set_column(
                    out.schema.get_field_index("rel_id"), "rel_id",
                    pa.array(roots))

            members = members.union(
                relation_way_members(relations).map_batches(
                    relabel, batch_format="pyarrow"))

    # join members ↔ way geometries by way_id (exchange)
    def mem_side(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy()
        n = len(wid)
        return pa.table({
            "part": pa.array(_part_of(wid, num_partitions)),
            "side": pa.array(np.ones(n, np.int8)),
            "way_id": batch["way_id"],
            "rel_id": batch["rel_id"],
            "role": batch["role"],
            "xs": pa.array([[]] * n, pa.list_(pa.float64())),
            "ys": pa.array([[]] * n, pa.list_(pa.float64())),
        })

    def geom_side(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy()
        n = len(wid)
        return pa.table({
            "part": pa.array(_part_of(wid, num_partitions)),
            "side": pa.array(np.zeros(n, np.int8)),
            "way_id": batch["way_id"],
            "rel_id": pa.array(np.full(n, -1, np.int64)),
            "role": pa.array([""] * n, pa.string()),
            "xs": batch["xs"],
            "ys": batch["ys"],
        })

    both = way_geoms.map_batches(geom_side, batch_format="pyarrow").union(
        members.map_batches(mem_side, batch_format="pyarrow"))

    def join_geoms(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "rel_id": pa.array([], pa.int64()),
            "role": pa.array([], pa.string()),
            "xs": pa.array([], pa.list_(pa.float64())),
            "ys": pa.array([], pa.list_(pa.float64())),
        })
        if tbl.num_rows == 0:
            return empty
        tbl = tbl.combine_chunks()
        side = tbl["side"].to_numpy()
        g = side == 0
        gwid = tbl["way_id"].to_numpy()[g]
        if len(gwid) == 0:
            # no geometry rows in this partition: nothing can join
            return empty
        order = np.argsort(gwid, kind="stable")
        gsorted = gwid[order]
        mwid = tbl["way_id"].to_numpy()[~g]
        pos = np.searchsorted(gsorted, mwid)
        ok = pos < len(gsorted)
        pos_c = np.minimum(pos, len(gsorted) - 1)
        ok &= gsorted[pos_c] == mwid
        geom_rows = np.flatnonzero(g)[order][pos_c]
        mem_rows = np.flatnonzero(~g)
        okm = pa.array(mem_rows[ok], pa.int64())
        return pa.table({
            "rel_id": tbl["rel_id"].take(okm),
            "role": tbl["role"].take(okm),
            "xs": tbl["xs"].combine_chunks().take(
                pa.array(geom_rows[ok], pa.int64())),
            "ys": tbl["ys"].combine_chunks().take(
                pa.array(geom_rows[ok], pa.int64())),
        })

    joined = exchange_reduce(both, num_partitions, join_geoms)

    # re-partition by rel_id, stitch per relation
    def rel_part(batch: pa.Table) -> pa.Table:
        rid = batch["rel_id"].to_numpy()
        return batch.append_column("part", pa.array(_part_of(rid, num_partitions)))

    def stitch(tbl: pa.Table) -> pa.Table:
        out = {"rel_id": [], "ring_idx": [], "is_hole": [],
               "xs": [], "ys": []}
        if tbl.num_rows:
            tbl = tbl.combine_chunks()
            rid = tbl["rel_id"].to_numpy()
            order = np.argsort(rid, kind="stable")
            rid = rid[order]
            xs = tbl["xs"].to_pylist()
            ys = tbl["ys"].to_pylist()
            bounds = np.flatnonzero(np.diff(rid)) + 1
            for seg in np.split(order, bounds):
                r = int(tbl["rel_id"][seg[0]].as_py())
                segs = [np.column_stack([xs[i], ys[i]]) for i in seg]
                rings = _stitch_rings(segs, stats)
                if not rings:
                    continue
                flat_x = np.concatenate([rg[:, 0] for rg in rings])
                flat_y = np.concatenate([rg[:, 1] for rg in rings])
                roff = np.zeros(len(rings) + 1, np.int64)
                np.cumsum([len(rg) for rg in rings], out=roff[1:])
                fixed = snap_fix_rings(flat_x, flat_y, roff,
                                       is_hole=np.zeros(len(rings), bool),
                                       scale=1e7, drop_zero_area=False)
                offs = fixed["offsets"]
                fx, fy = fixed["xs"], fixed["ys"]
                if len(offs) <= 1:
                    continue
                # escalation rung: the 1e-7 snap can introduce crossings
                # (bowties) — split them into simple lobes before
                # nesting (buffer(0) analog; validity.repair_rings)
                fx, fy, offs, _src = repair_rings(fx, fy, offs,
                                                  stats=stats)
                areas = ring_signed_area(fx, fy, offs)
                live = areas != 0.0
                if not live.all():
                    counts_r = np.diff(offs)
                    vkeep = np.repeat(live, counts_r)
                    fx, fy = fx[vkeep], fy[vkeep]
                    offs = np.concatenate(
                        [[0], np.cumsum(counts_r[live])])
                    areas = areas[live]
                if len(offs) <= 1:
                    continue
                # hole ⇔ odd nesting depth under real containment
                # (area-sorted shells, point-in-ring parent test)
                emit, holes = _nest_rings(fx, fy, offs, areas)
                for out_i, i in enumerate(emit):
                    hole = bool(holes[i])
                    seg_x = fx[offs[i]:offs[i + 1]]
                    seg_y = fy[offs[i]:offs[i + 1]]
                    if hole != (areas[i] < 0):
                        seg_x, seg_y = seg_x[::-1], seg_y[::-1]
                    out["rel_id"].append(r)
                    out["ring_idx"].append(out_i)
                    out["is_hole"].append(hole)
                    out["xs"].append(seg_x.tolist())
                    out["ys"].append(seg_y.tolist())
        if stats is not None:
            stats.flush()
        return pa.table({
            "rel_id": pa.array(out["rel_id"], pa.int64()),
            "ring_idx": pa.array(out["ring_idx"], pa.int64()),
            "is_hole": pa.array(out["is_hole"], pa.bool_()),
            "xs": pa.array(out["xs"], pa.list_(pa.float64())),
            "ys": pa.array(out["ys"], pa.list_(pa.float64())),
        })

    return exchange_reduce(
        joined.map_batches(rel_part, batch_format="pyarrow"),
        num_partitions, stitch)


# ---------------------------------------------------------------------------
# OSM profile: tagged elements → named MVT layers (the Planetiler main flow)
# ---------------------------------------------------------------------------


def tags_to_columns(batch: pa.Table, keys: tuple[str, ...],
                    key_col: str = "tag_keys",
                    val_col: str = "tag_vals") -> pa.Table:
    """Promote selected OSM tags from the parallel list columns to flat
    string columns (null where absent) — vectorized over the flattened
    key stream, the columnar analog of the reference's per-element
    ``SourceFeature.getTag`` calls."""
    batch = batch.combine_chunks()
    tk = batch[key_col].combine_chunks()
    flat_k = pc.list_flatten(tk)
    flat_v = pc.list_flatten(batch[val_col].combine_chunks())
    parents = pc.list_parent_indices(tk).to_numpy()
    vals_np = flat_v.to_numpy(zero_copy_only=False)
    for key in keys:
        hit = pc.equal(flat_k, key).to_numpy(zero_copy_only=False)
        hit = np.asarray(hit, bool)
        col = np.full(batch.num_rows, None, dtype=object)
        col[parents[hit]] = vals_np[hit]
        batch = batch.append_column(key, pa.array(col, pa.string()))
    return batch


def _drop_last_vertex(col) -> pa.ListArray:
    """Rebuild a list<double> column without each row's final vertex."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.asarray(arr.offsets.to_numpy(), np.int64)
    flat = arr.flatten().to_numpy()
    counts = np.diff(off)
    keep = np.ones(len(flat), bool)
    keep[off[1:][counts > 0] - 1] = False
    new_off = np.concatenate(
        [[0], np.cumsum(np.maximum(counts - 1, 0))]).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(new_off), pa.array(flat[keep]))


class OsmLayerRule:
    """One profile layer: which elements land in which named MVT layer.

    The declarative unit of the ``Profile.processFeature`` switch every
    reference profile implements (e.g. ``ForwardingProfile`` handlers):
    ``element`` ∈ {"point", "line", "area", "relation"} selects node
    features, open ways, closed ways rendered as polygons, or
    multipolygon-relation rings; ``match`` is a compiled
    tag expression (``functions/expression.py``) over the promoted tag
    columns; ``attrs`` are the tag keys carried into MVT feature attrs.
    """

    def __init__(self, name: str, element: str, match, *,
                 attrs: tuple[str, ...] = (), tag_keys: tuple[str, ...] = (),
                 min_zoom: int = 0, max_zoom: int = 15,
                 computed_attrs: dict | None = None):
        assert element in ("point", "line", "area", "relation")
        self.name = name
        self.element = element
        self.match = match
        self.attrs = tuple(attrs)
        # name → value-expression fn (functions.valueexpr): the
        # custommap attr-value expressions (ConfigExpressionParser)
        self.computed_attrs = dict(computed_attrs or {})
        # keys the match expression needs beyond the attrs
        self.tag_keys = tuple(dict.fromkeys(tag_keys + attrs))
        # per-rule zoom window (every reference profile sets these;
        # rows carry them into the fan-out's per-feature zoom gate)
        self.min_zoom = min_zoom
        self.max_zoom = max_zoom


def osm_features(nodes: "ray.data.Dataset", ways: "ray.data.Dataset",
                 rules: list[OsmLayerRule],
                 num_partitions: int = 16,
                 relations: "ray.data.Dataset | None" = None
                 ) -> "ray.data.Dataset":
    """Nodes + resolved ways (+ multipolygon relations) →
    profile-filtered geometry rows (geom_id, kind, xs, ys, layer_id,
    attr columns).  Relation rules match against the RELATION's tags,
    broadcast driver-side (the reference holds relation info in RAM on
    every worker, "≤500MB", ``OsmReader.java:83-87`` — same budget)."""
    all_attrs = tuple(dict.fromkeys(
        a for r in rules for a in (*r.attrs, *r.computed_attrs)))
    layer_ids = {name: i for i, name in enumerate(
        dict.fromkeys(r.name for r in rules))}

    def empty() -> pa.Table:
        cols = {"geom_id": pa.array([], pa.int64()),
                "kind": pa.array([], pa.string()),
                "layer_id": pa.array([], pa.int8()),
                "min_zoom": pa.array([], pa.int8()),
                "max_zoom": pa.array([], pa.int8()),
                "xs": pa.array([], pa.list_(pa.float64())),
                "ys": pa.array([], pa.list_(pa.float64()))}
        for a in all_attrs:
            cols[a] = pa.array([], pa.string())
        return pa.table(cols)

    def apply_rules(batch: pa.Table, element_kinds: dict) -> pa.Table:
        """element_kinds: rule.element → (kind string, row mask fn)."""
        parts = []
        for r in rules:
            if r.element not in element_kinds:
                continue
            kind, elem_mask = element_kinds[r.element]
            m = r.match(batch)
            m = pc.and_(m, elem_mask) if elem_mask is not None else m
            sub = batch.filter(m)
            if sub.num_rows == 0:
                continue
            xs, ys = sub["xs"], sub["ys"]
            if r.element == "area":
                # drop the closing vertex: rings are open in the
                # geometry pipeline
                xs, ys = _drop_last_vertex(xs), _drop_last_vertex(ys)
            cols = {"geom_id": sub["geom_id"],
                    "kind": pa.array([kind] * sub.num_rows, pa.string()),
                    "layer_id": pa.array(
                        np.full(sub.num_rows, layer_ids[r.name], np.int8)),
                    "min_zoom": pa.array(
                        np.full(sub.num_rows, r.min_zoom, np.int8)),
                    "max_zoom": pa.array(
                        np.full(sub.num_rows, r.max_zoom, np.int8)),
                    "xs": xs, "ys": ys}
            for a in all_attrs:
                if a in r.attrs:
                    cols[a] = sub[a]
                elif a in r.computed_attrs:
                    cols[a] = pc.cast(r.computed_attrs[a](sub),
                                      pa.string())
                else:
                    cols[a] = pa.array([None] * sub.num_rows, pa.string())
            parts.append(pa.table(cols))
        if not parts:
            return empty()
        return pa.concat_tables(parts, promote_options="default")

    way_rules = [r for r in rules if r.element in ("line", "area")]
    node_rules = [r for r in rules if r.element == "point"]
    rel_rules = [r for r in rules if r.element == "relation"]
    out = []
    geoms = (way_geometries(nodes, ways, num_partitions)
             if (way_rules or (rel_rules and relations is not None))
             else None)

    if way_rules:
        way_keys = tuple(dict.fromkeys(
            k for r in way_rules for k in r.tag_keys))

        def ways_fn(batch: pa.Table, keys=way_keys) -> pa.Table:
            if batch.num_rows == 0 or "way_id" not in batch.schema.names:
                return empty()
            batch = tags_to_columns(batch, keys)
            xs_l = batch["xs"].combine_chunks()
            ys_l = batch["ys"].combine_chunks()
            off = np.asarray(xs_l.offsets.to_numpy(), np.int64)
            fx = xs_l.flatten().to_numpy()
            fy = ys_l.flatten().to_numpy()
            nv = np.diff(off)
            has = nv > 0
            first_i = np.where(has, off[:-1], 0)
            last_i = np.where(has, off[1:] - 1, 0)
            closed_np = (has & (nv >= 4)
                         & (fx[first_i] == fx[last_i])
                         & (fy[first_i] == fy[last_i]))
            closed = pa.array(closed_np)
            open_m = pa.array(~closed_np)
            batch = batch.rename_columns(
                ["geom_id" if c == "way_id" else c
                 for c in batch.schema.names])
            return apply_rules(batch, {"line": ("line", open_m),
                                       "area": ("polygon", closed)})

        out.append(geoms.map_batches(ways_fn, batch_format="pyarrow"))

    if node_rules:
        node_keys = tuple(dict.fromkeys(
            k for r in node_rules for k in r.tag_keys))

        def nodes_fn(batch: pa.Table, keys=node_keys) -> pa.Table:
            if batch.num_rows == 0 or "node_id" not in batch.schema.names:
                return empty()
            batch = tags_to_columns(batch, keys)
            wx = get_world_x(batch["lon"].to_numpy())
            wy = get_world_y(batch["lat"].to_numpy())
            off = pa.array(np.arange(batch.num_rows + 1, dtype=np.int32))
            batch = batch.append_column("xs", pa.ListArray.from_arrays(
                off, pa.array(wx)))
            batch = batch.append_column("ys", pa.ListArray.from_arrays(
                off, pa.array(wy)))
            batch = batch.rename_columns(
                ["geom_id" if c == "node_id" else c
                 for c in batch.schema.names])
            return apply_rules(batch, {"point": ("point", None)})

        out.append(nodes.map_batches(nodes_fn, batch_format="pyarrow"))

    if rel_rules and relations is not None:
        rel_keys = tuple(dict.fromkeys(
            k for r in rel_rules for k in r.tag_keys))
        rings = assemble_multipolygons(relations, geoms, num_partitions)
        # broadcast rel_id → tags (small side by the reference contract)
        tag_df = relations.select_columns(
            ["rel_id", "tag_keys", "tag_vals"]).to_pandas()
        order = np.argsort(tag_df["rel_id"].to_numpy(), kind="stable")
        idx_ref = ray.put((tag_df["rel_id"].to_numpy()[order],
                           tag_df["tag_keys"].to_numpy()[order],
                           tag_df["tag_vals"].to_numpy()[order]))

        def rel_fn(batch: pa.Table, keys=rel_keys) -> pa.Table:
            if batch.num_rows == 0 or "rel_id" not in batch.schema.names:
                return empty()
            batch = batch.combine_chunks()
            rid = batch["rel_id"].to_numpy()
            srid, skeys, svals = ray.get(idx_ref)
            pos = np.searchsorted(srid, rid)
            pos = np.minimum(pos, max(len(srid) - 1, 0))
            hit = (srid[pos] == rid) if len(srid) else np.zeros(len(rid), bool)
            tk = [list(skeys[p]) if h else [] for p, h in zip(pos, hit)]
            tv = [list(svals[p]) if h else [] for p, h in zip(pos, hit)]
            tmp = pa.table({
                "geom_id": pa.array(rid),
                "xs": batch["xs"], "ys": batch["ys"],
                "tag_keys": pa.array(tk, pa.list_(pa.string())),
                "tag_vals": pa.array(tv, pa.list_(pa.string())),
            })
            tmp = tags_to_columns(tmp, keys)
            # rings are already open + oriented (holes reversed); they
            # render as polygon rows sharing the relation's geom_id
            return apply_rules(tmp, {"relation": ("polygon", None)})

        out.append(rings.map_batches(rel_fn, batch_format="pyarrow"))

    if not out:
        return ray.data.from_arrow(empty())
    ds = out[0]
    for o in out[1:]:
        ds = ds.union(o)
    return ds


def build_osm_tiles(nodes: "ray.data.Dataset", ways: "ray.data.Dataset",
                    rules: list[OsmLayerRule], min_zoom: int = 0,
                    max_zoom: int = 14, num_partitions: int = 16,
                    line_merge: dict | None = None,
                    poly_merge: dict | None = None,
                    min_pixel_size: float = 1.0,
                    relations: "ray.data.Dataset | None" = None
                    ) -> "ray.data.Dataset":
    """The Planetiler main flow, Ray-Data-native: OSM elements →
    profile rules → named MVT layers → tile Dataset (ready for the
    PMTiles/MBTiles sinks).  ``Planetiler.java:791-996`` +
    ``Profile.processFeature`` semantics."""
    from .geometry import build_geometry_tiles

    all_attrs = tuple(dict.fromkeys(
        a for r in rules for a in (*r.attrs, *r.computed_attrs)))
    names = {i: name for i, name in enumerate(
        dict.fromkeys(r.name for r in rules))}
    feats = osm_features(nodes, ways, rules, num_partitions,
                         relations=relations)
    return build_geometry_tiles(feats, min_zoom=min_zoom, max_zoom=max_zoom,
                                attr_cols=all_attrs, line_merge=line_merge,
                                poly_merge=poly_merge, layer_names=names,
                                min_pixel_size=min_pixel_size)
