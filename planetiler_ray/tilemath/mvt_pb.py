"""Real Mapbox Vector Tile (MVT 2.1) protobuf encoding, batch-vectorized.

Replaces the custom record container: tiles written by the sinks are
spec-compliant ``vector_tile.Tile`` protobufs any MVT client can read
(reference semantics: ``VectorTile.java:97-210,502-599``; wire format
per the public vector-tile-spec 2.1 / vector_tile.proto).

Encoder design (NO per-feature Python in the hot path):

1. every varint in the whole batch of tiles — geometry command ints,
   ids, tag pairs, all length prefixes — is encoded in ONE
   :func:`tilemath.varint.encode_varints` call over a single stream;
2. message framing is pure arithmetic: a protobuf length prefix's size
   is computable from the value, so layer/feature lengths are derived
   bottom-up with numpy before any bytes exist;
3. final assembly is one flattened gather (``concat_pieces``) over a
   byte pool, ordered by a packed (tile, layer, section, item, sub)
   sort key.

Feature geometry kinds: 0 = axis-aligned box → polygon (one CW ring),
1 = point, 2 = polyline (MoveTo + LineTo run), 3 = general ring
(MoveTo + LineTo + ClosePath).  Attribute value tables are deduplicated
per (tile, layer) — one lexsort derives the unique set and every tag
index, no per-feature Python.

A pure-Python reference :func:`decode_tile` (independent of the
encoder's vectorized path) backs the golden round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .mvt import EXTENT, SCALE
from .varint import concat_pieces, encode_varints, varint_lengths, zigzag

KIND_BOX = 0
KIND_POINT = 1
KIND_LINE = 2
KIND_POLY = 3       # general ring via line_verts (no repeated last vertex)

_GEOM_TYPE = {KIND_BOX: 3, KIND_POINT: 1, KIND_LINE: 2, KIND_POLY: 3}

# framing tag bytes (field << 3 | wire_type)
_T_LAYER = 0x1A        # Tile.layers,   field 3, len-delim
_T_NAME = 0x0A         # Layer.name,    field 1, len-delim
_T_FEATURE = 0x12      # Layer.features field 2, len-delim
_T_KEYS = 0x1A         # Layer.keys     field 3, len-delim
_T_VALUES = 0x22       # Layer.values   field 4, len-delim
_T_EXTENT = 0x28       # Layer.extent   field 5, varint
_T_VERSION = 0x78      # Layer.version  field 15, varint
_F_ID = 0x08           # Feature.id     field 1, varint
_F_TAGS = 0x12         # Feature.tags   field 2, packed
_F_TYPE = 0x18         # Feature.type   field 3, varint
_F_GEOM = 0x22         # Feature.geometry field 4, packed
_V_STRING = 0x0A       # Value.string_value field 1


def _vlen(v: np.ndarray) -> np.ndarray:
    return varint_lengths(np.asarray(v, dtype=np.uint64))


def quant(v: np.ndarray) -> np.ndarray:
    """Pixel coords → extent units, round-half-up in float64 (same as the
    reduce; NaN → 0, used only for point rows' unused corners)."""
    with np.errstate(invalid="ignore"):
        return np.floor(np.nan_to_num(np.asarray(v, dtype=np.float64))
                        * SCALE + 0.5).astype(np.int64)


# fragments per internal encode chunk: the encoder builds ~30 piece-slot
# entries per fragment (keys/starts/lens) plus the varint pool — beyond
# ~32k fragments the working set falls out of cache and throughput drops
# ~10× on memory-bandwidth-bound hosts (measured 400k frags: 15.8s
# monolithic vs 1.4s in 25k chunks).  Chunks cut at TILE boundaries, so
# output bytes are identical to the monolithic call.
ENCODE_CHUNK = 32768


def encode_tile_batch(tile_ids: np.ndarray, layer: np.ndarray,
                      kind: np.ndarray, feat_id: np.ndarray,
                      ax: np.ndarray, ay: np.ndarray,
                      bx: np.ndarray, by: np.ndarray,
                      layer_names: dict[int, str],
                      attrs: dict[str, np.ndarray] | None = None,
                      line_verts: tuple[np.ndarray, np.ndarray,
                                        np.ndarray] | None = None,
                      feature_group: np.ndarray | None = None,
                      return_stats: bool = False,
                      ) -> tuple[np.ndarray, pa.LargeBinaryArray]:
    """Cache-chunked front of :func:`_encode_tile_chunk` (see its
    docstring for the full contract): large inputs are cut at tile
    boundaries into ``ENCODE_CHUNK``-fragment chunks and the outputs
    (blobs + optional stats) merged — byte-identical, ~10× faster on
    bandwidth-bound hosts."""
    n = len(tile_ids)
    if n > ENCODE_CHUNK + ENCODE_CHUNK // 2:
        tile_ids = np.asarray(tile_ids)
        tstarts = np.concatenate(
            [[0], np.flatnonzero(np.diff(tile_ids) != 0) + 1])
        approx = np.arange(ENCODE_CHUNK, n, ENCODE_CHUNK)
        pos = np.minimum(np.searchsorted(tstarts, approx, side="left"),
                         len(tstarts) - 1)
        cuts = np.unique(np.concatenate([[0], tstarts[pos], [n]]))
        if len(cuts) > 2:
            utids, blobs, stats = [], [], []
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                lo, hi = int(lo), int(hi)
                lv = None
                if line_verts is not None:
                    vx, vy, voff = line_verts
                    a, b = int(voff[lo]), int(voff[hi])
                    lv = (vx[a:b], vy[a:b], voff[lo:hi + 1] - voff[lo])
                r = _encode_tile_chunk(
                    tile_ids[lo:hi], layer[lo:hi], kind[lo:hi],
                    feat_id[lo:hi], ax[lo:hi], ay[lo:hi], bx[lo:hi],
                    by[lo:hi], layer_names,
                    {k: v[lo:hi] for k, v in (attrs or {}).items()} or None,
                    lv,
                    None if feature_group is None else feature_group[lo:hi],
                    return_stats)
                utids.append(r[0])
                blobs.append(r[1])
                if return_stats:
                    stats.append((r[2], lo))
            utid = np.concatenate(utids)
            arr = pa.concat_arrays([b.combine_chunks()
                                    if isinstance(b, pa.ChunkedArray) else b
                                    for b in blobs])
            if not return_stats:
                return utid, arr
            merged = {}
            tile_base = np.concatenate(
                [[0], np.cumsum([len(u) for u in utids])[:-1]])
            lay_base = np.concatenate(
                [[0], np.cumsum([len(s["lay_layer"]) for s, _ in stats])[:-1]])
            merged["lay_tile_ord"] = np.concatenate(
                [s["lay_tile_ord"] + tb for (s, _), tb in zip(stats, tile_base)])
            for k in ("lay_layer", "lay_n_features", "lay_geom_sum",
                      "lay_vert_sum"):
                merged[k] = np.concatenate([s[k] for s, _ in stats])
            merged["feat_first_frag"] = np.concatenate(
                [s["feat_first_frag"] + lo for s, lo in stats])
            merged["feat_lay"] = np.concatenate(
                [s["feat_lay"] + lb for (s, _), lb in zip(stats, lay_base)])
            return utid, arr, merged
    return _encode_tile_chunk(tile_ids, layer, kind, feat_id, ax, ay, bx, by,
                              layer_names, attrs, line_verts, feature_group,
                              return_stats)


def _encode_tile_chunk(tile_ids: np.ndarray, layer: np.ndarray,
                       kind: np.ndarray, feat_id: np.ndarray,
                       ax: np.ndarray, ay: np.ndarray,
                       bx: np.ndarray, by: np.ndarray,
                       layer_names: dict[int, str],
                       attrs: dict[str, np.ndarray] | None = None,
                       line_verts: tuple[np.ndarray, np.ndarray,
                                         np.ndarray] | None = None,
                       feature_group: np.ndarray | None = None,
                       return_stats: bool = False,
                       ) -> tuple[np.ndarray, pa.LargeBinaryArray]:
    """Encode fragments (sorted by tile, layer) into one MVT blob per tile.

    ``tile_ids`` is the per-fragment tile id (consecutive runs).  Box
    coords are (ax, ay)..(bx, by) px; points use (ax, ay); LINE
    fragments (kind 2) take their vertices from ``line_verts = (vx, vy,
    frag_vert_offsets)`` — flat px coords plus each fragment's [start,
    end) range (empty for non-line fragments).  ``attrs`` maps attr
    name → per-fragment string values (nulls → '').
    ``feature_group`` (optional, per-fragment): CONSECUTIVE fragments
    of the same tile/layer sharing a group value merge into ONE feature
    whose geometry concatenates their command streams — the
    multipolygon-with-holes / multi-part encoding (id/type/attrs come
    from the group's first fragment).  Default: one feature per
    fragment.
    Returns (unique tile ids in order, LargeBinaryArray of tile bytes);
    with ``return_stats=True`` a third dict of per-(tile, layer)
    summaries straight from the encoder's vectorized command arrays —
    what the driver tile summaries read instead of re-decoding every
    tile with the Python reference decoder (that decode stays in the
    pytest goldens): ``lay_tile_ord`` / ``lay_layer`` per layer run,
    ``lay_n_features``, ``lay_geom_sum`` (sum of raw geometry command
    ints — the oracle-checked quantity), ``lay_vert_sum`` (per-fragment
    encoded vertex count: max(nv, 2) for lines/rings), plus
    ``feat_first_frag`` / ``feat_lay`` so callers can fold per-feature
    attr stats with one reduceat.
    """
    n = len(tile_ids)
    if n == 0:
        if return_stats:
            z = np.empty(0, np.int64)
            return (z, pa.array([], pa.large_binary()),
                    {"lay_tile_ord": z, "lay_layer": z, "lay_n_features": z,
                     "lay_geom_sum": z, "lay_vert_sum": z,
                     "feat_first_frag": z, "feat_lay": z})
        return np.empty(0, np.int64), pa.array([], pa.large_binary())
    attrs = attrs or {}
    key_names = list(attrs)
    K = len(key_names)

    # --- tile / layer segmentation (input sorted by tile, layer) ---
    t_change = np.empty(n, bool)
    t_change[0] = True
    t_change[1:] = np.diff(tile_ids) != 0
    tile_idx = np.cumsum(t_change) - 1                    # per-fragment tile ordinal
    n_tiles = int(tile_idx[-1]) + 1
    l_change = t_change | np.concatenate([[True], np.diff(layer) != 0])
    lay_idx = np.cumsum(l_change) - 1                     # per-fragment (tile,layer) ordinal
    n_lays = int(lay_idx[-1]) + 1
    lay_starts = np.flatnonzero(l_change)
    lay_tile = tile_idx[lay_starts]                       # per-layer tile ordinal
    lay_layer = layer[lay_starts].astype(np.int64)        # per-layer layer id
    feat_pos = np.arange(n) - lay_starts[lay_idx]         # position within its layer

    # --- geometry command ints (already zigzagged params) ---
    qx0, qy0 = quant(ax), quant(ay)
    qx1, qy1 = quant(bx), quant(by)
    is_box = kind == KIND_BOX
    is_pt = kind == KIND_POINT
    is_line = (kind == KIND_LINE) | (kind == KIND_POLY)   # shared vertex path
    is_poly = kind == KIND_POLY
    if line_verts is not None:
        lvx, lvy, lvoff = line_verts
        lvoff = np.asarray(lvoff, np.int64)
        qvx, qvy = quant(lvx), quant(lvy)
        nv = np.diff(lvoff)
    else:
        qvx = qvy = np.empty(0, np.int64)
        lvoff = np.zeros(n + 1, np.int64)
        nv = np.zeros(n, np.int64)
    # ints per fragment: box 11, point 3, line 2·nv + 2 (MoveTo + LineTo
    # run), general ring 2·nv + 3 (+ClosePath)
    gcount = np.where(is_box, 11,
                      np.where(is_pt, 3,
                               2 * np.maximum(nv, 2) + 2
                               + is_poly.astype(np.int64))).astype(np.int64)
    gseg = np.concatenate([[0], np.cumsum(gcount)[:-1]])
    total_g = int(gcount.sum())
    gints = np.zeros(total_g, dtype=np.uint64)
    gints[gseg] = 9                                       # MoveTo ×1 (all kinds)
    bp = is_box | is_pt
    gints[gseg[bp] + 1] = zigzag(qx0[bp])
    gints[gseg[bp] + 2] = zigzag(qy0[bp])
    if is_box.any():
        b = np.flatnonzero(is_box)
        s = gseg[b]
        gints[s + 3] = 26                                 # LineTo ×3
        gints[s + 4] = zigzag(qx1[b] - qx0[b])
        gints[s + 7] = zigzag(qy1[b] - qy0[b])
        gints[s + 8] = zigzag(qx0[b] - qx1[b])
        gints[s + 10] = 15                                # ClosePath
    if is_line.any():
        lf = np.flatnonzero(is_line)
        s = gseg[lf]
        first = lvoff[lf]                                 # first vertex index
        gints[s + 1] = zigzag(qvx[first])
        gints[s + 2] = zigzag(qvy[first])
        gints[s + 3] = (2 | ((np.maximum(nv[lf], 2) - 1) << 3)).astype(np.uint64)
        # deltas for vertices 1..nv-1 of each line fragment: global vertex
        # index per line fragment, fully vectorized
        nvl = nv[lf]
        vglob = (np.arange(int(nvl.sum())) -
                 np.repeat(np.concatenate([[0], np.cumsum(nvl)[:-1]]), nvl)
                 + np.repeat(lvoff[lf], nvl))
        vfrag = np.repeat(lf, nvl)
        not_first = vglob != lvoff[vfrag]
        j = vglob[not_first]
        fj = vfrag[not_first]
        # position within the int stream: 4 + 2·(ordinal-1)
        pos = gseg[fj] + 4 + 2 * (j - lvoff[fj] - 1)
        gints[pos] = zigzag(qvx[j] - qvx[j - 1])
        gints[pos + 1] = zigzag(qvy[j] - qvy[j - 1])
        # degenerate single-vertex lines: pad with a zero-delta LineTo
        # (np.maximum(nv, 2) above reserved the space; zeros are valid)
        pf = np.flatnonzero(is_poly)
        if len(pf):
            gints[gseg[pf] + gcount[pf] - 1] = 15     # ClosePath
    geom_ints = gints
    geom_int_lens = _vlen(geom_ints)
    geom_len = np.add.reduceat(geom_int_lens, gseg)       # bytes per fragment
    geom_len[gcount == 0] = 0

    # --- attr values: per-(tile,layer) DEDUPLICATED value table ---------
    # (the spec's SHOULD-dedupe; indices are within-layer ranks of the
    # sorted unique strings — all derived with one lexsort, no loops).
    # Only genuinely NULL attr values are ABSENT (no tag pair emitted);
    # a legitimate empty string is a valid value and gets encoded —
    # the reference omits only unset attrs (``VectorTile.java`` tag
    # emission), it never drops empty strings.
    if K:
        import pandas as pd
        enc_cols = []
        null_cols = []
        for nm in key_names:
            a = np.asarray(attrs[nm])
            if a.dtype == object:
                null = np.asarray(pd.isnull(a))
                a = np.where(null, "", a)
            else:
                null = np.zeros(len(a), bool)
            null_cols.append(null)
            enc_cols.append(np.char.encode(a.astype("U"), "utf-8"))
        flat_strs = np.stack(enc_cols, axis=1).reshape(-1)     # feature-major
        flat_null = np.stack(null_cols, axis=1).reshape(-1)
        val_lay = np.repeat(lay_idx, K)
        act_idx = np.flatnonzero(~flat_null)       # present (feature, key) slots
        a_lay = val_lay[act_idx]
        a_strs = flat_strs[act_idx]
        vorder = np.lexsort((a_strs, a_lay))
        sl, ss = a_lay[vorder], a_strs[vorder]
        if len(sl):
            new_u = np.concatenate([[True],
                                    (np.diff(sl) != 0) | (ss[1:] != ss[:-1])])
            uid_sorted = np.cumsum(new_u) - 1
            n_uniq = int(uid_sorted[-1]) + 1
        else:
            new_u = np.zeros(0, bool)
            uid_sorted = np.zeros(0, np.int64)
            n_uniq = 0
        uid_act = np.empty(len(act_idx), np.int64)
        uid_act[vorder] = uid_sorted
        u_first = vorder[new_u]                    # representative active slot
        u_lay = a_lay[u_first]                     # ascending
        lay_first_uid = np.zeros(n_lays, np.int64)
        if n_uniq:
            fol = np.concatenate([[True], np.diff(u_lay) != 0])
            lay_first_uid[u_lay[fol]] = np.flatnonzero(fol)
        # -1 marks absent slots (no tag pair, not in the value table)
        val_idx_within = np.full(n * K, -1, np.int64)
        val_idx_within[act_idx] = uid_act - lay_first_uid[a_lay]
        u_within = np.arange(n_uniq) - lay_first_uid[u_lay]
        u_strs = a_strs[u_first]
    else:
        flat_strs = np.empty(0, "S1")
        flat_null = np.empty(0, bool)
        u_strs = np.empty(0, "S1")
        val_idx_within = np.empty(0, np.int64)
        u_lay = np.empty(0, np.int64)
        u_within = np.empty(0, np.int64)
        n_uniq = 0

    # --- feature grouping (multi-ring / multi-part features) ---
    if feature_group is None:
        g_change = np.ones(n, bool)
    else:
        fg = np.asarray(feature_group)
        g_change = l_change.copy()
        g_change[1:] |= fg[1:] != fg[:-1]
        g_change[0] = True
    gfirst = np.flatnonzero(g_change)                 # feature start fragment
    n_feat = len(gfirst)

    # --- tag pairs: (key_idx, within-layer value idx) per FEATURE ---
    # ``pres`` masks present (feature, key) pairs; absent pairs keep a
    # reserved slot whose piece length is ZEROED below — the framing
    # arithmetic stays fixed-stride while the wire bytes are variable.
    if K:
        pres = ~flat_null.reshape(n, K)[gfirst]            # (n_feat, K)
        tag_ints = np.empty((n_feat, 2 * K), dtype=np.uint64)
        for k in range(K):
            tag_ints[:, 2 * k] = k
            vi = val_idx_within[gfirst * K + k]
            tag_ints[:, 2 * k + 1] = np.where(pres[:, k], vi, 0) \
                .astype(np.uint64)
        tag_ints = tag_ints.reshape(-1)
        tag_int_lens = _vlen(tag_ints)
        pres2 = np.repeat(pres, 2, axis=1).reshape(-1)
        tag_piece_lens = np.where(pres2, tag_int_lens, 0)
        tseg = np.arange(n_feat) * 2 * K
        tags_len = np.add.reduceat(tag_piece_lens, tseg) if n_feat \
            else np.zeros(0, np.int64)
        has_tags = pres.any(axis=1)
    else:
        pres = np.zeros((n_feat, 0), bool)
        tag_ints = np.empty(0, np.uint64)
        tag_piece_lens = np.empty(0, np.int64)
        tags_len = np.zeros(n_feat, np.int64)
        has_tags = np.zeros(n_feat, bool)

    # --- feature message lengths (bottom-up arithmetic, per FEATURE) ---
    fid = np.asarray(feat_id, dtype=np.uint64)[gfirst]
    ftype = np.array([_GEOM_TYPE[KIND_BOX], _GEOM_TYPE[KIND_POINT],
                      _GEOM_TYPE[KIND_LINE], _GEOM_TYPE[KIND_POLY]
                      ])[kind.astype(np.int64)[gfirst]].astype(np.uint64)
    geom_len_f = np.add.reduceat(geom_len, gfirst) if n_feat \
        else np.zeros(0, np.int64)
    feat_len = (1 + _vlen(fid)                            # id
                + 1 + 1                                   # type (tag + 1-byte varint)
                + 1 + _vlen(geom_len_f) + geom_len_f)     # geometry
    if K:
        # tags framing only for features with ≥1 present attr
        feat_len = feat_len + np.where(has_tags,
                                       1 + _vlen(tags_len) + tags_len, 0)

    # --- value messages: one per UNIQUE (layer, string) ---
    if K:
        str_lens = np.char.str_len(u_strs).astype(np.int64)
        val_len = 1 + _vlen(str_lens) + str_lens          # Value.string_value framed
    else:
        str_lens = np.empty(0, np.int64)
        val_len = np.empty(0, np.int64)

    # --- per-layer aggregates ---
    name_bytes = {lid: nm.encode("utf-8") for lid, nm in layer_names.items()}
    lay_name_len = np.array([len(name_bytes[int(lid)]) for lid in lay_layer])
    feat_framed = 1 + _vlen(feat_len) + feat_len
    lay_feat_bytes = np.zeros(n_lays, np.int64)
    np.add.at(lay_feat_bytes, lay_idx[gfirst], feat_framed)
    keys_enc = [kn.encode("utf-8") for kn in key_names]
    keys_framed_const = sum(1 + int(varint_lengths(np.array([len(kb)]))[0]) + len(kb)
                            for kb in keys_enc)
    if K:
        val_framed = 1 + _vlen(val_len) + val_len
        lay_val_bytes = np.zeros(n_lays, np.int64)
        np.add.at(lay_val_bytes, u_lay, val_framed)
    else:
        lay_val_bytes = np.zeros(n_lays, np.int64)
    EXT_FR = 1 + int(varint_lengths(np.array([EXTENT]))[0])   # 0x28 + varint(4096)
    VER_FR = 2                                                # 0x78 + varint(2)
    lay_len = (1 + _vlen(lay_name_len) + lay_name_len
               + lay_feat_bytes + keys_framed_const + lay_val_bytes
               + EXT_FR + VER_FR)

    # ------------------------------------------------------------------
    # byte pool: [0] 256 identity bytes  [1] all varints  [2] strings
    # ------------------------------------------------------------------
    varint_stream = np.concatenate([
        np.asarray(lay_len, np.uint64),                   # per layer
        np.asarray(lay_name_len, np.uint64),
        feat_len.astype(np.uint64), fid, ftype,
        tags_len.astype(np.uint64) if K else np.empty(0, np.uint64),
        geom_len_f.astype(np.uint64),
        tag_ints, geom_ints,
        np.asarray(val_len, np.uint64) if K else np.empty(0, np.uint64),
        np.asarray(str_lens, np.uint64) if K else np.empty(0, np.uint64),
        np.array([EXTENT, 2], np.uint64),
    ])
    vbuf, vlens = encode_varints(varint_stream)
    voff = np.concatenate([[0], np.cumsum(vlens)])
    # slice indices into the varint stream, in the order concatenated above
    c = [0]

    def take(count):
        s = c[0]
        c[0] += count
        return np.arange(s, s + count)

    vi_laylen = take(n_lays)
    vi_layname = take(n_lays)
    vi_featlen = take(n_feat)
    vi_fid = take(n_feat)
    vi_ftype = take(n_feat)
    vi_tagslen = take(n_feat if K else 0)
    vi_geomlen = take(n_feat)
    vi_tagints = take(len(tag_ints))
    vi_geomints = take(len(geom_ints))
    vi_vallen = take(n_uniq)
    vi_strlen = take(n_uniq)
    vi_extent = take(1)
    vi_version = take(1)

    # ------------------------------------------------------------------
    # byte pool layout: [identity 256] [varint buffer] [string pool]
    # ------------------------------------------------------------------
    ident = np.arange(256, dtype=np.uint8)
    base_v = 256
    base_s = 256 + len(vbuf)
    spool_parts = []
    s_cursor = 0
    layname_off = {}
    for lid, nm in name_bytes.items():
        layname_off[lid] = s_cursor
        spool_parts.append(np.frombuffer(nm, np.uint8))
        s_cursor += len(nm)
    keys_off = []
    for kb in keys_enc:
        keys_off.append(s_cursor)
        spool_parts.append(np.frombuffer(kb, np.uint8))
        s_cursor += len(kb)
    if K and n_uniq and u_strs.dtype.itemsize:
        # padded byte matrix → masked gather (vectorized utf-8 pool),
        # unique (layer, string) values only
        width = u_strs.dtype.itemsize
        smat = u_strs.view(np.uint8).reshape(len(u_strs), width)
        svalid = np.arange(width)[None, :] < str_lens[:, None]
        str_off = s_cursor + np.concatenate([[0], np.cumsum(str_lens)[:-1]])
        spool_parts.append(smat[svalid])
        s_cursor += int(str_lens.sum())
    else:
        str_off = np.zeros(n_uniq, np.int64)
    pool = np.concatenate([ident, vbuf] + spool_parts)

    def vpiece(vi):
        """(start, len) arrays for varint stream slots vi."""
        return base_v + voff[vi], vlens[vi]

    # ------------------------------------------------------------------
    # pieces: (sort_key, src_start, length)
    # key = ((tile*64 + layer_ord)*8 + section) << 27 | item*64 + slot
    # sections: 0 hdr, 1 name, 2 features, 3 keys, 4 values, 5 extent/ver
    # ------------------------------------------------------------------
    def skey(tile_o, lay_o, section, slotted):
        return ((((np.asarray(tile_o, np.int64) * 64 + lay_o) * 8 + section)
                 << np.int64(27)) + slotted)

    ks, ss, ls = [], [], []

    def add(keys_, starts_, lens_):
        ks.append(np.asarray(keys_, np.int64))
        ss.append(np.asarray(starts_, np.int64))
        ls.append(np.asarray(lens_, np.int64))

    # ordinal of layer within its tile
    first_of_tile = np.concatenate([[True], np.diff(lay_tile) != 0])
    tile_first = np.flatnonzero(first_of_tile)
    lay_ord = np.arange(n_lays) - tile_first[np.cumsum(first_of_tile) - 1]
    if len(lay_ord) and int(lay_ord.max()) >= 64:
        # the piece sort key reserves 64 layer slots per tile — beyond
        # that the keys collide and the encoded bytes are silently
        # corrupt, so refuse loudly (no real profile emits 64+ layers)
        raise ValueError(
            f"tile with {int(lay_ord.max()) + 1} layers exceeds the "
            "64-layers-per-tile encoder limit")

    z = np.zeros(n_lays, np.int64)
    one = np.ones(n_lays)
    # section 0: layer header: 0x1A + varint(lay_len)
    add(skey(lay_tile, lay_ord, 0, z), np.full(n_lays, _T_LAYER), one)
    st, ln = vpiece(vi_laylen)
    add(skey(lay_tile, lay_ord, 0, z + 1), st, ln)
    # section 1: name: 0x0A + varint(len) + bytes
    add(skey(lay_tile, lay_ord, 1, z), np.full(n_lays, _T_NAME), one)
    st, ln = vpiece(vi_layname)
    add(skey(lay_tile, lay_ord, 1, z + 1), st, ln)
    add(skey(lay_tile, lay_ord, 1, z + 2),
        base_s + np.array([layname_off[int(l)] for l in lay_layer]),
        lay_name_len)

    # section 2: features — item = per-fragment slot base + slot.  The
    # base is a segmented cumsum of each fragment's slot need (26 fixed
    # feature-header slots for a group's FIRST fragment + one per
    # geometry int), NOT a fixed stride: a fixed stride lets long
    # geometries (>18 vertices) overflow into the next feature's slot
    # range and interleave the output bytes.  Non-first fragments of a
    # multi-ring feature contribute only geometry ints.
    ftile = tile_idx
    ford = lay_ord[lay_idx]
    hdr = np.where(g_change, 26, 0)
    slot_need = hdr + gcount
    fbase = np.cumsum(slot_need) - slot_need
    fbase = fbase - fbase[lay_starts][lay_idx]            # restart per layer
    fb_f = fbase[gfirst]
    ftile_f = tile_idx[gfirst]
    ford_f = ford[gfirst]
    onef = np.ones(n_feat)

    def fadd(slot, starts_, lens_):
        add(skey(ftile_f, ford_f, 2, fb_f + slot), starts_, lens_)

    fadd(0, np.full(n_feat, _T_FEATURE), onef)
    st, ln = vpiece(vi_featlen)
    fadd(1, st, ln)
    fadd(2, np.full(n_feat, _F_ID), onef)
    st, ln = vpiece(vi_fid)
    fadd(3, st, ln)
    if K:
        fadd(4, np.full(n_feat, _F_TAGS), np.where(has_tags, 1, 0))
        st, ln = vpiece(vi_tagslen)
        fadd(5, st, np.where(has_tags, ln, 0))
        # packed tag ints: slots 6..6+2K-1 (K ≤ 8 fits the pattern);
        # absent pairs emit zero-length pieces
        assert 2 * K <= 16
        tag_slot = vi_tagints.reshape(n_feat, 2 * K)
        for j in range(2 * K):   # loop over ATTR COLUMNS (tiny), not rows
            st, ln = vpiece(tag_slot[:, j])
            fadd(6 + j, st, np.where(pres[:, j // 2], ln, 0))
    fadd(22, np.full(n_feat, _F_TYPE), onef)
    st, ln = vpiece(vi_ftype)
    fadd(23, st, ln)
    fadd(24, np.full(n_feat, _F_GEOM), onef)
    st, ln = vpiece(vi_geomlen)
    fadd(25, st, ln)
    gi_frag = np.repeat(np.arange(n), gcount)             # fragment of each geom int
    gi_slot = np.arange(len(geom_ints)) - gseg[gi_frag] + hdr[gi_frag]
    st, ln = vpiece(vi_geomints)
    add(skey(ftile[gi_frag], ford[gi_frag], 2, fbase[gi_frag] + gi_slot), st, ln)

    # section 3: keys (constant per layer; key names are short, < 128 B)
    for j, kb in enumerate(keys_enc):
        assert len(kb) < 128
        add(skey(lay_tile, lay_ord, 3, z + j * 4), np.full(n_lays, _T_KEYS), one)
        add(skey(lay_tile, lay_ord, 3, z + j * 4 + 1), np.full(n_lays, len(kb)), one)
        add(skey(lay_tile, lay_ord, 3, z + j * 4 + 2),
            np.full(n_lays, base_s + keys_off[j]), np.full(n_lays, len(kb)))

    # section 4: values — item = (feat_pos*K + k)*8 + slot, feature-major
    if K:
        vtile = lay_tile[u_lay]
        vord = lay_ord[u_lay]
        vbase = u_within * 8
        onev = np.ones(n_uniq)
        add(skey(vtile, vord, 4, vbase), np.full(n_uniq, _T_VALUES), onev)
        st, ln = vpiece(vi_vallen)
        add(skey(vtile, vord, 4, vbase + 1), st, ln)
        add(skey(vtile, vord, 4, vbase + 2), np.full(n_uniq, _V_STRING), onev)
        st, ln = vpiece(vi_strlen)
        add(skey(vtile, vord, 4, vbase + 3), st, ln)
        add(skey(vtile, vord, 4, vbase + 4), base_s + str_off, str_lens)

    # section 5: extent + version
    add(skey(lay_tile, lay_ord, 5, z), np.full(n_lays, _T_EXTENT), one)
    st, ln = vpiece(np.repeat(vi_extent, n_lays))
    add(skey(lay_tile, lay_ord, 5, z + 1), st, ln)
    add(skey(lay_tile, lay_ord, 5, z + 2), np.full(n_lays, _T_VERSION), one)
    st, ln = vpiece(np.repeat(vi_version, n_lays))
    add(skey(lay_tile, lay_ord, 5, z + 3), st, ln)

    keys_all = np.concatenate(ks)
    starts_all = np.concatenate(ss)
    lens_all = np.concatenate(ls)
    order = np.argsort(keys_all, kind="stable")
    out = concat_pieces(pool, starts_all[order], lens_all[order])

    # per-tile offsets: tile bytes = layer pieces of that tile
    piece_tile = (keys_all[order] >> np.int64(27)) // (64 * 8)
    piece_lens = lens_all[order]
    tile_bytes_len = np.zeros(n_tiles, np.int64)
    np.add.at(tile_bytes_len, piece_tile, piece_lens)
    offsets = np.zeros(n_tiles + 1, np.int64)
    np.cumsum(tile_bytes_len, out=offsets[1:])
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n_tiles,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())])
    utids = tile_ids[np.flatnonzero(t_change)]
    if not return_stats:
        return utids, arr
    feat_lay = lay_idx[gfirst]
    stats = {
        "lay_tile_ord": lay_tile,
        "lay_layer": lay_layer,
        "lay_n_features": np.bincount(feat_lay, minlength=n_lays)
        .astype(np.int64),
        # sums of raw geometry command ints per (tile, layer) — gints
        # are laid out in fragment order and fragments are contiguous
        # per layer, so one reduceat per layer start covers it
        "lay_geom_sum": np.add.reduceat(gints.astype(np.int64),
                                        gseg[lay_starts]),
        "lay_vert_sum": np.add.reduceat(
            np.where(is_line, np.maximum(nv, 2),
                     np.where(is_pt, 1, 4)).astype(np.int64), lay_starts),
        "feat_first_frag": gfirst,
        "feat_lay": feat_lay,
    }
    return utids, arr, stats


# ---------------------------------------------------------------------------
# independent reference decoder (tests / golden verification)
# ---------------------------------------------------------------------------

def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        byte = b[i]
        i += 1
        val |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return val & 0xFFFFFFFFFFFFFFFF, i
        shift += 7


def decode_tile(data: bytes) -> dict:
    """Decode an MVT protobuf → {layer_name: {"features": [...], "keys":
    [...], "values": [...], "extent": int, "version": int}}.  Plain
    sequential decoder, independent of the vectorized encoder."""
    layers = {}
    i = 0
    while i < len(data):
        tag, i = _read_varint(data, i)
        if tag == _T_LAYER:
            ln, i = _read_varint(data, i)
            layer = _decode_layer(data[i:i + ln])
            layers[layer["name"]] = layer
            i += ln
        else:
            raise ValueError(f"unexpected tile tag {tag:#x}")
    return layers


def _decode_layer(b: bytes) -> dict:
    out = {"name": None, "features": [], "keys": [], "values": [],
           "extent": None, "version": None}
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        field, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _read_varint(b, i)
            chunk = b[i:i + ln]
            i += ln
            if field == 1:
                out["name"] = chunk.decode("utf-8")
            elif field == 2:
                out["features"].append(_decode_feature(chunk))
            elif field == 3:
                out["keys"].append(chunk.decode("utf-8"))
            elif field == 4:
                out["values"].append(_decode_value(chunk))
            else:
                raise ValueError(f"unexpected layer field {field}")
        else:
            val, i = _read_varint(b, i)
            if field == 5:
                out["extent"] = val
            elif field == 15:
                out["version"] = val
            else:
                raise ValueError(f"unexpected layer field {field}")
    return out


def _decode_feature(b: bytes) -> dict:
    out = {"id": None, "tags": [], "type": None, "geometry": []}
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        field, wt = tag >> 3, tag & 7
        if field == 1:
            out["id"], i = _read_varint(b, i)
        elif field == 2 and wt == 2:
            ln, i = _read_varint(b, i)
            end = i + ln
            while i < end:
                v, i = _read_varint(b, i)
                out["tags"].append(v)
        elif field == 3:
            out["type"], i = _read_varint(b, i)
        elif field == 4 and wt == 2:
            ln, i = _read_varint(b, i)
            end = i + ln
            while i < end:
                v, i = _read_varint(b, i)
                out["geometry"].append(v)
        else:
            raise ValueError(f"unexpected feature field {field}")
    return out


def _decode_value(b: bytes) -> object:
    i = 0
    tag, i = _read_varint(b, i)
    field, wt = tag >> 3, tag & 7
    if field == 1 and wt == 2:
        ln, i = _read_varint(b, i)
        return b[i:i + ln].decode("utf-8")
    if field == 3:
        return struct.unpack("<d", b[i:i + 8])[0]
    if field in (4, 5):
        v, i = _read_varint(b, i)
        return v
    if field == 6:
        v, i = _read_varint(b, i)
        return (v >> 1) ^ -(v & 1)
    if field == 7:
        v, i = _read_varint(b, i)
        return bool(v)
    raise ValueError(f"unexpected value field {field}")


def decode_feature_attrs(layer: dict, feature: dict) -> dict:
    """Resolve a decoded feature's tag pairs → {key: value}."""
    out = {}
    t = feature["tags"]
    for j in range(0, len(t), 2):
        out[layer["keys"][t[j]]] = layer["values"][t[j + 1]]
    return out
