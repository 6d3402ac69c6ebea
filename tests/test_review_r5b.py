"""Regression tests for the second round-5 review pass: OSM missing-meta
null fill, exchange post-map empty schema + session-scoped cache, dedup
budget/guard hardening, ANN rebuild/zero-vector safety."""

import numpy as np
import pyarrow as pa
import pytest


def test_way_without_meta_null_fills_tags(ray_session):
    """A resolved way whose meta row is missing from the partition (and a
    partition with NO meta rows at all) must null-fill tag columns, not
    crash in pyarrow take with a -1 sentinel."""
    import ray.data as rd

    from planetiler_ray.pipelines.osm import assemble_way_geometries

    resolved = rd.from_arrow(pa.table({
        "way_id": pa.array([7, 7, 9, 9], pa.int64()),
        "seq": pa.array([0, 1, 0, 1], pa.int64()),
        "lon": pa.array([0.0, 1.0, 2.0, 3.0]),
        "lat": pa.array([0.0, 1.0, 2.0, 3.0]),
    }))
    # meta only for way 7 — way 9 has none anywhere
    ways = rd.from_arrow(pa.table({
        "way_id": pa.array([7], pa.int64()),
        "tag_keys": pa.array([["highway"]], pa.list_(pa.string())),
        "tag_vals": pa.array([["primary"]], pa.list_(pa.string())),
    }))
    rows = {r["way_id"]: r for batch in
            assemble_way_geometries(resolved, ways, num_partitions=2)
            .iter_batches(batch_format="pyarrow")
            for r in batch.to_pylist()}
    assert sorted(rows) == [7, 9]
    assert rows[7]["tag_keys"] == ["highway"]
    assert rows[9]["tag_keys"] is None        # meta missing → null fill
    # the geometry itself still assembled
    assert rows[9]["n_refs"] == 2


def test_low_zoom_wide_span_keeps_geometry_body():
    """A geometry whose buffered column span exceeds n_tiles (z0/z1 near
    lon ±180) must keep its UNWRAPPED body columns — the old clamp kept
    only the wrap sliver and lost the body from the z0 tile."""
    from planetiler_ray.tilemath.clip import (slice_boxes, slice_lines,
                                              slice_polygons)
    from planetiler_ray.tilemath.stripeclip import slice_polygons_striped

    buf = 4 / 256.0
    # box touching the left world edge within buffer, body well inside
    r = slice_boxes(np.array([0.005]), np.array([0.3]),
                    np.array([0.6]), np.array([0.7]), 0, buf)
    widths = r["fx1"] - r["fx0"]
    assert widths.max() > 100          # the body fragment, ~152 px wide

    # polygon: same shape through both the bbox and striped kernels
    px = np.array([0.005, 0.6, 0.6, 0.005])
    py = np.array([0.3, 0.3, 0.7, 0.7])
    rp = slice_polygons(px, py, np.array([0, 4]), 0, buf)
    assert len(rp["x"]) >= 1
    offs = rp["part_offsets"]
    spans = [rp["vx"][offs[i]:offs[i + 1]] for i in range(len(rp["x"]))]
    assert max(float(s.max() - s.min()) for s in spans) > 100

    rs = slice_polygons_striped(px, py, np.array([0, 4]), 0, buf,
                                poly_of_ring=np.array([0]))
    frag_spans = rs["vx"]
    assert len(rs["x"]) >= 1
    assert float(frag_spans.max() - frag_spans.min()) > 100

    # line crossing most of the world at z1
    rl = slice_lines(np.array([0.01, 1.9]), np.array([0.5, 0.5]),
                     np.array([0, 2]), 1, buf)
    assert set(rl["x"].tolist()) == {0, 1}   # both halves present


def test_zero_area_corner_phantom_dropped():
    """A ring that passes diagonally OUTSIDE a tile corner used to emit
    a zero-area Sutherland-Hodgman fragment into that tile; the bbox
    kernel must drop it (as the striped kernel always did)."""
    from planetiler_ray.tilemath.clip import slice_polygons

    buf = 4 / 256.0
    # long thin diagonal sliver at z4 crossing near tile corners
    px = np.array([0.2, 12.8, 12.9, 0.3])
    py = np.array([0.3, 12.9, 13.0, 0.4])
    r = slice_polygons(px, py, np.array([0, 4]), 4, buf)
    offs = r["part_offsets"]
    for i in range(len(r["x"])):
        qx = np.floor(r["vx"][offs[i]:offs[i + 1]].astype(np.float32)
                      .astype(np.float64) * 16 + 0.5)
        qy = np.floor(r["vy"][offs[i]:offs[i + 1]].astype(np.float32)
                      .astype(np.float64) * 16 + 0.5)
        a2 = np.sum(qx * np.roll(qy, -1) - np.roll(qx, -1) * qy)
        assert a2 != 0, (int(r["x"][i]), int(r["y"][i]))


def test_mvt_refuses_over_64_layers():
    from planetiler_ray.tilemath.mvt_pb import encode_tile_batch

    n = 66
    with pytest.raises(ValueError, match="64"):
        encode_tile_batch(
            np.zeros(n, np.int64), np.arange(n, dtype=np.int8),
            np.ones(n, np.int8), np.arange(n, dtype=np.int64),
            np.full(n, 10.0), np.full(n, 10.0),
            np.full(n, np.nan), np.full(n, np.nan),
            {i: f"l{i}" for i in range(n)})


def test_quality_stats_case_insensitive():
    """Capitalized words must tokenize and count as stopwords like
    their lowercase forms."""
    import pandas as pd

    from planetiler_ray.stages.text import quality_scores, token_char_stats

    lo = pa.table({"text": pa.array(["the cat sat on the mat"])})
    hi = pa.table({"text": pa.array(["The cat sat on The mat"])})
    a = quality_scores(lo).to_pandas()
    b = quality_scores(hi).to_pandas()
    assert float(a["stop_ratio"][0]) == float(b["stop_ratio"][0])
    assert float(a["mean_word_len"][0]) == float(b["mean_word_len"][0])
    ta = token_char_stats(lo).to_pandas()
    tb = token_char_stats(hi).to_pandas()
    assert int(ta["n_words"][0]) == int(tb["n_words"][0]) == 6


def test_rolling_fingerprint_long_doc_fallback():
    """A single long doc in a wide batch must not inflate the dense
    padded matrices; results stay identical to the fast path."""
    from planetiler_ray.stages.text import rolling_fingerprint

    texts = ["short doc %d here" % i for i in range(64)]
    small = pa.table({"text": pa.array(texts)})
    fast = rolling_fingerprint(small)["fingerprint"].to_pylist()
    # same texts plus one long outlier: shared rows must hash the same
    big = pa.table({"text": pa.array(texts + ["x" * 2_000_000])})
    mixed = rolling_fingerprint(big)["fingerprint"].to_pylist()
    assert mixed[:64] == fast


def test_split_block_all_empty_uses_post_map_schema():
    """When every input block of a group is empty and a map_fn is fused,
    the empty pieces must carry the POST-map schema."""
    from planetiler_ray.stages.exchange import _split_block

    pre = pa.table({"image_id": pa.array([], pa.string())})

    def map_fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "part": pa.array(np.zeros(t.num_rows, np.int32)),
            "tile_id": pa.array(np.zeros(t.num_rows, np.int64))})

    pieces = _split_block(4, 0, 1, map_fn, pre, pre)
    assert len(pieces) == 4
    for p in pieces:
        assert p.num_rows == 0
        assert p.schema.names == ["part", "tile_id"]


def test_exchange_cache_scoped_to_session(monkeypatch, ray_session):
    """Cached slot options / remote handles must not leak across
    ray.init sessions (a stale exchange_slots requirement would hang
    every task on a cluster without the resource)."""
    from planetiler_ray.stages import exchange as ex

    c1 = ex._session_cache()
    c1["slots"] = {"resources": {"exchange_slots": 1}}    # simulate A

    class _Ctx:
        def get_job_id(self):
            return "other-session"

    monkeypatch.setattr(ex.ray, "get_runtime_context", lambda: _Ctx())
    c2 = ex._session_cache()
    assert "slots" not in c2          # cleared on session change
    monkeypatch.undo()
    ex._session_cache()               # restore for later tests


def test_hamming_unsound_bands_refused(ray_session):
    import ray.data as rd

    from planetiler_ray.stages.dedup import hamming_near_dup_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "fp": pa.array([0, 1], pa.int64())}))
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dup_pairs(ds, "fp", "doc_id", max_hamming=8, bands=4)


def test_ngram_bucket_budget_warns_and_bounds(ray_session):
    """A degenerate bucket (every doc shares the minimal shingle) stays
    within the emission budget and warns on truncation."""
    import ray.data as rd

    from planetiler_ray.stages.dedup import ngram_jaccard_pairs

    n = 40
    txt = ["alpha beta gamma delta epsilon zeta"] * n     # identical docs
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(txt, pa.string())}))
    capped = ngram_jaccard_pairs(ds, threshold=0.5,
                                 max_pairs_per_bucket=100).to_pandas()
    assert len(capped) <= 100
    full = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    assert len(full) == n * (n - 1) // 2
    assert (full["jaccard"] == 1.0).all()


def test_ngram_empty_groups_schema_stable(ray_session):
    """Singleton-only buckets must produce int64 id columns, matching
    blocks that emit pairs (no float64 empty-frame schema drift)."""
    import ray.data as rd

    from planetiler_ray.stages.dedup import ngram_jaccard_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aa bb cc dd ee", "ff gg hh ii jj"],
                         pa.string())}))
    out = ngram_jaccard_pairs(ds, threshold=0.5)
    # pandas-block schema: dtype per column must be int64, not the
    # float64 that an untyped empty frame would produce
    schema = out.schema()
    types = dict(zip(schema.names, schema.types))
    assert str(types["id_a"]) == "int64" and str(types["id_b"]) == "int64"
    assert out.count() == 0


def test_merge_multipoint_min_id_not_hilbert_first():
    """merged_id must be the group's MIN id even when a larger id's
    point sorts first in Hilbert part order."""
    from planetiler_ray.stages.merge import merge_multipoint

    r = merge_multipoint(
        ids=np.array([10, 29], np.int64),
        group_key=np.array([5, 5], np.int64),
        px=np.array([200.0, 1.0]), py=np.array([200.0, 1.0]),
        extent=256)
    assert r["merged_id"].tolist() == [10]
    # part order still Hilbert: (1,1) before (200,200)
    assert r["xs"].tolist() == [1.0, 200.0]


def test_midpoint_smooth_empty_ring_in_batch():
    """An empty ring mid-batch (or trailing) must not corrupt the
    previous ring's wrap midpoint or index out of bounds."""
    from planetiler_ray.tilemath.simplify import midpoint_smooth

    sq = ([0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0])
    vx = np.array(sq[0] + sq[0])
    vy = np.array(sq[1] + sq[1])
    # mid-batch empty ring
    ox, oy, off = midpoint_smooth(vx, vy, np.array([0, 4, 4, 8]),
                                  closed=True)
    ref_x, ref_y, _ = midpoint_smooth(np.array(sq[0]), np.array(sq[1]),
                                      np.array([0, 4]), closed=True)
    assert np.allclose(ox[:4], ref_x) and np.allclose(oy[:4], ref_y)
    assert np.allclose(ox[4:], ref_x) and np.allclose(oy[4:], ref_y)
    # trailing empty ring: no IndexError
    ox2, oy2, _ = midpoint_smooth(vx[:4], vy[:4], np.array([0, 4, 4]),
                                  closed=True)
    assert np.allclose(ox2, ref_x)


def test_vertex_pinched_bowtie_detected_and_split():
    """A figure-8 pinched at a shared vertex (no proper crossing) must
    be detected and split into its two lobes."""
    from planetiler_ray.tilemath.validity import (repair_rings,
                                                  rings_self_intersect)

    px = np.array([0.0, 2.0, 4.0, 4.0, 2.0, 0.0])
    py = np.array([0.0, 2.0, 0.0, 4.0, 2.0, 4.0])
    assert rings_self_intersect(px, py, np.array([0, 6]))[0]
    xs, ys, offs, src = repair_rings(px, py, np.array([0, 6]))
    n_out = len(offs) - 1
    assert n_out == 2
    for i in range(n_out):
        rx = xs[offs[i]:offs[i + 1]]
        ry = ys[offs[i]:offs[i + 1]]
        a2 = np.sum(rx * np.roll(ry, -1) - np.roll(rx, -1) * ry)
        assert abs(a2) / 2 == 4.0     # each lobe is a 4-unit triangle


def test_brute_force_zero_query_no_nan(ray_session):
    import ray.data as rd

    from planetiler_ray.stages.ann import brute_force_topk

    emb = np.eye(4, dtype=np.float64)
    t = pa.table({
        "vec_id": pa.array(np.arange(4, dtype=np.int64)),
        "embedding": pa.array([list(r) for r in emb],
                              pa.list_(pa.float64()))})
    q = np.vstack([np.zeros(4), emb[1]])
    out = brute_force_topk(rd.from_arrow(t), q, np.array([10, 11]),
                           k=2).to_pandas()
    assert np.isfinite(out["cosine"].to_numpy()).all()
    best = out[out["query_id"] == 11].sort_values("cosine").iloc[-1]
    assert int(best["neighbor_id"]) == 1


def test_ivf_rebuild_cleans_stale_lists(ray_session, tmp_path):
    """Rebuilding an IVF index into the same dir must not leave the old
    quantizer's list files for ivf_search_index to read."""
    import ray.data as rd

    from planetiler_ray.stages.ann import ivf_build_index, ivf_search_index

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(64, dtype=np.int64)),
        "embedding": pa.array([list(r) for r in emb],
                              pa.list_(pa.float64()))})
    out = str(tmp_path / "ivf")
    c1 = emb[:6].copy()
    ivf_build_index(rd.from_arrow(t), c1, out)
    # rebuild over a 16-row subset with 2 far-away centroids: any list
    # dir beyond the new quantizer's must be gone
    sub = pa.table({
        "vec_id": pa.array(np.arange(16, dtype=np.int64)),
        "embedding": pa.array([list(r) for r in emb[:16]],
                              pa.list_(pa.float64()))})
    c2 = emb[:2].copy()
    info = ivf_build_index(rd.from_arrow(sub), c2, out)
    assert info["n_lists"] == 2
    import glob
    import os
    lists = sorted(glob.glob(os.path.join(out, "list=*")))
    assert all(os.path.basename(p) in ("list=0", "list=1") for p in lists)
    res = ivf_search_index(out, emb[:1], np.array([0]), c2, k=3,
                           nprobe=2).to_pandas()
    # only ids from the REBUILT (16-row) dataset may appear
    assert (res["neighbor_id"] < 16).all()


def test_parse_wkb_parts_multipolygon():
    """Multi* WKB geometries (the standard Natural Earth shape) must
    yield one part per child instead of being silently dropped."""
    import struct

    from planetiler_ray.sources.geoparquet import parse_wkb_parts

    def poly(ring):
        b = struct.pack("<bII", 1, 3, 1) + struct.pack("<I", len(ring))
        for x, y in ring:
            b += struct.pack("<dd", x, y)
        return b

    r1 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    r2 = [(20, 20), (30, 20), (30, 30), (20, 30), (20, 20)]
    multi = struct.pack("<bII", 1, 6, 2) + poly(r1) + poly(r2)
    parts = parse_wkb_parts(multi)
    assert [k for k, _ in parts] == ["polygon", "polygon"]
    assert len(parts[0][1]) == 4          # closing vertex dropped
    assert parts[1][1][0].tolist() == [20.0, 20.0]

    # multilinestring
    def line(coords):
        b = struct.pack("<bII", 1, 2, len(coords))
        for x, y in coords:
            b += struct.pack("<dd", x, y)
        return b

    ml = struct.pack("<bII", 1, 5, 2) + line([(0, 0), (1, 1)]) \
        + line([(2, 2), (3, 3), (4, 4)])
    parts = parse_wkb_parts(ml)
    assert [k for k, _ in parts] == ["line", "line"]
    assert len(parts[1][1]) == 3

    # unsupported flags (Z bit) skip cleanly
    zpt = struct.pack("<bIdd", 1, 0x80000001, 1.0, 2.0)
    assert parse_wkb_parts(zpt) == []


def test_translate_names_string_and_null_qids(ray_session):
    import pandas as pd
    import ray.data as rd

    from planetiler_ray.functions.translations import (TranslationIndex,
                                                       translate_names)

    idx = TranslationIndex(np.array([42, 7], np.int64),
                           np.array(["en", "en"], object),
                           np.array(["Answer", "Seven"], object))
    t = pa.table({
        "wikidata_qid": pa.array(["Q42", None, "nonsense", "7"],
                                 pa.string()),
        "name": pa.array(["a", "b", "c", "d"]),
    })
    out = translate_names(rd.from_arrow(t), idx, ("en",)).to_pandas()
    vals = [None if pd.isnull(v) else v for v in out["name_en"]]
    assert vals == ["Answer", None, None, "Seven"]


def test_fnv_strings_non_ascii():
    from planetiler_ray.tilemath.hashing import fnv1a_64_strings

    ascii_only = fnv1a_64_strings(np.array(["cafe", "x"], dtype="U"))
    mixed = fnv1a_64_strings(np.array(["cafe", "café"], dtype="U"))
    assert mixed[0] == ascii_only[0]       # ASCII rows hash identically
    assert mixed[1] != mixed[0]


def test_merge_lines_never_cross_layers(ray_session):
    """Two touching line fragments in the SAME tile but different MVT
    layers must not merge into one feature."""
    from planetiler_ray.pipelines.geometry import _merge_tile_lines
    from planetiler_ray.tilemath.mvt_pb import KIND_LINE

    grp = pa.table({
        "tile_id": pa.array([99, 99], pa.int64()),
        "z": pa.array([2, 2], pa.int8()),
        "layer": pa.array([1, 2], pa.int8()),
        "kind": pa.array([KIND_LINE, KIND_LINE], pa.int8()),
        "geom_id": pa.array([10, 20], pa.int64()),
        "is_fill": pa.array([False, False]),
        "vx": pa.array([[0.0, 10.0], [10.0, 20.0]], pa.list_(pa.float32())),
        "vy": pa.array([[0.0, 0.0], [0.0, 0.0]], pa.list_(pa.float32())),
    })
    out = _merge_tile_lines(grp, (), {"min_length": 0.0,
                                      "tolerance": -1.0,
                                      "stub_min_length": 0.0})
    df = out.to_pandas()
    lines = df[df["kind"] == KIND_LINE]
    assert sorted(lines["layer"].tolist()) == [1, 2]   # NOT merged
