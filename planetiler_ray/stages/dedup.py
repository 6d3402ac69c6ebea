"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup, phash Hamming near-dup.

All follow the pre-aggregate-then-small-shuffle pattern:

- exact:   content hash per batch → groupby(hash) keep min id
- MinHash: shingle → k-perm minhash signature per doc (vectorized) →
           explode to (band, band_hash) rows → groupby band bucket →
           candidate pairs → Jaccard verify
- SimHash / phash: 64-bit fingerprints → banded buckets (Hamming-LSH)
           → per-bucket pairwise Hamming distance
- embedding cosine: LSH hyperplane buckets → per-bucket pairwise cosine

Candidate-pair verification happens inside the bucket groups
(vectorized), never on the driver.
"""

from __future__ import annotations

from functools import partial

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..tilemath.hashing import fnv1a_64_strings, mix64
from .text import WORD_RE

_LOG = logging.getLogger(__name__)

def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic mix64-derived permutation parameters.

    Arithmetically derivable (no RNG state) so the DuckDB oracle can
    reproduce them from the same public splitmix64 definition
    (``pipelines.sqlgen.minhash_params_sql``)."""
    p = np.arange(num_perm, dtype=np.uint64)
    a = mix64(2 * p + 1) | np.uint64(1)
    b = mix64(2 * p + 2)
    return a, b


def exact_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id",
                text_col: str = "text") -> "ray.data.Dataset":
    """Keep the lowest id per distinct text (hash-partitioned).

    The group key is a 128-bit content hash — two independent 64-bit
    FNV streams (the second over the prefixed text, so an h1 collision
    does not propagate) — because a single 64-bit key silently merges
    distinct documents at birthday scale (~billions of docs) while the
    SQL oracle groups by exact text.  The text itself never shuffles.
    """
    from ray.data.aggregate import Min

    def h(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().astype(str).to_numpy()
        width = max(1, max(map(len, texts), default=1))
        h1 = fnv1a_64_strings(texts, max_len=width)
        h2 = fnv1a_64_strings(np.char.add("\x01", texts.astype("U")),
                              max_len=width + 1)
        return pa.table({id_col: batch[id_col],
                         "text_hash": pa.array(h1.view(np.int64)),
                         "text_hash2": pa.array(h2.view(np.int64))})

    return ds.map_batches(h, batch_format="pyarrow") \
        .groupby(["text_hash", "text_hash2"]) \
        .aggregate(Min(id_col, alias_name=id_col))


def bounded_triu_pairs(n: int, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """First ``budget`` (i, j) index pairs, ``i < j``, of the strict
    upper triangle of an ``n``×``n`` grid in row-major order — WITHOUT
    materializing the full ``n*(n-1)/2`` set.

    Deterministic (row-major) so a capped output is reproducible; used
    by the degenerate-bucket caps in :func:`hamming_near_dup_pairs` and
    :func:`stages.ann.embedding_near_dup_pairs`.  O(n + budget) time and
    memory.
    """
    total = n * (n - 1) // 2
    need = min(int(budget), total)
    if need <= 0:
        z = np.zeros(0, np.int64)
        return z, z
    # pairs in row i (0-based): n-1-i of them; cum[i] = pairs through row i
    row_len = np.arange(n - 1, 0, -1, dtype=np.int64)
    cum = np.cumsum(row_len)
    k = np.arange(need, dtype=np.int64)
    i = np.searchsorted(cum, k, side="right")
    prev = cum[i] - row_len[i]
    j = i + 1 + (k - prev)
    return i, j


def shingle_hash_stream(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id", shingle: int = 3
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flattened word-``shingle``-gram hash stream for a whole batch.

    Returns ``(ids, sh_hash, seg)``: per-doc ids, the uint64 shingle
    hashes of every doc concatenated in doc order, and the start offset
    of each doc's segment in that stream (docs with < ``shingle`` words
    contribute one shingle folding all their words).  Shingle hash =
    rolling ``mix64(h ^ word_hash)`` combine — no string
    materialization.  Shared by MinHash, SimHash and the SQL oracle
    (``pipelines.sqlgen.shingle_hash_ctes``).
    """
    from .text import word_hash_stream

    ids = batch[id_col].to_numpy()
    n_docs = len(ids)
    # shared no-per-word-Python stream (byte-run scan; hashes identical
    # to fnv1a_64_strings of the word strings)
    raw_h, _, counts = word_hash_stream(
        batch[text_col].to_pandas().astype(str).str.lower())
    word_h = mix64(raw_h) if len(raw_h) else np.empty(0, np.uint64)

    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    with np.errstate(over="ignore"):
        sh_parts = []
        sh_doc_parts = []
        valid = counts >= shingle
        if valid.any():
            # windows: for docs with c words → c-shingle+1 shingles
            n_sh = np.where(valid, counts - shingle + 1, 0)
            sh_doc = np.repeat(np.arange(n_docs), n_sh)
            sh_start = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
            # global index of each shingle's first word
            local = np.arange(int(n_sh.sum()), dtype=np.int64) - sh_start[sh_doc]
            first = starts[sh_doc] + local
            h = np.zeros(len(first), dtype=np.uint64)
            for k in range(shingle):
                h = mix64(h ^ word_h[first + k])
            sh_parts.append(h)
            sh_doc_parts.append(sh_doc)
        short = ~valid
        if short.any():
            # short docs: one shingle = combine of all their words (or empty)
            sd = np.nonzero(short)[0]
            h = np.zeros(len(sd), dtype=np.uint64)
            for k in range(int(counts[sd].max()) if len(sd) else 0):
                m = counts[sd] > k
                h[m] = mix64(h[m] ^ word_h[starts[sd[m]] + k])
            sh_parts.append(h)
            sh_doc_parts.append(sd)
        sh_hash = np.concatenate(sh_parts) if sh_parts else np.empty(0, np.uint64)
        sh_docs = np.concatenate(sh_doc_parts) if sh_doc_parts else np.empty(0, np.int64)

    order = np.argsort(sh_docs, kind="stable")
    sh_hash = sh_hash[order]
    seg = np.searchsorted(sh_docs[order], np.arange(n_docs))
    return ids, sh_hash, seg


def shingle_minhash(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id", num_perm: int = 64,
                    shingle: int = 3) -> pa.Table:
    """Per-doc MinHash signature over word ``shingle``-grams.

    Fully batch-vectorized: shingle hashes from
    :func:`shingle_hash_stream`, k-perm minima via one
    ``np.minimum.reduceat`` over the whole batch's shingle stream per
    permutation chunk — no per-doc Python loop in the hot part.
    """
    a, b = _minhash_params(num_perm)
    ids, sh_hash, seg = shingle_hash_stream(batch, text_col, id_col, shingle)
    n_docs = len(ids)
    sigs = np.zeros((n_docs, num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        if len(sh_hash):
            # one 1D pass per permutation: contiguous multiply + 1D
            # reduceat is ~80× faster than the 2D-chunked variant
            for p in range(num_perm):
                sigs[:, p] = np.minimum.reduceat(sh_hash * a[p] + b[p], seg)
    return pa.table({id_col: ids,
                     "signature": pa.FixedSizeListArray.from_arrays(
                         pa.array(sigs.reshape(-1).view(np.int64)), num_perm)})


def minhash_lsh_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 8, jaccard_threshold: float = 0.5,
                      shingle: int = 3,
                      max_driver_pairs: int = 2_000_000) -> "ray.data.Dataset":
    """Near-duplicate pairs via MinHash + banded LSH.

    Shuffle-lean pipeline (the LSH exchange moves only 3 small columns,
    NOT the 64×8-byte signatures):

    1. signatures per doc (one dataset, computed once)
    2. explode to ``(band, band_hash, id)`` rows → groupby buckets →
       candidate pairs (vectorized all-pairs within bucket, deduped)
    3. signature re-join: pairs keyed by ``id_a`` union'd with the
       signature rows → groupby(key) attaches ``sig_a``; re-key by
       ``id_b`` and repeat → est. Jaccard = matching-position fraction;
       keep pairs ≥ threshold

    Two tiny extra shuffles (1 signature per *pair* side) replace the
    old 8× signature duplication through the big bucket exchange.
    """
    rows_per_band = num_perm // bands
    sig_t = pa.list_(pa.int64())

    # materialize the signature table once: three downstream consumers
    # (band keys + two join passes) would otherwise re-run the whole
    # text scan per consumer; signatures are tiny next to the text and
    # the object store spills them under pressure
    sigs = ds.map_batches(
        partial(shingle_minhash, text_col=text_col, id_col=id_col,
                num_perm=num_perm, shingle=shingle),
        batch_format="pyarrow").materialize()

    NBK = 64   # coarse shuffle buckets — many LSH buckets per group

    def to_band_keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sg = np.asarray(batch["signature"].combine_chunks().flatten()
                        .to_numpy().view(np.uint64)).reshape(len(ids), num_perm)
        out_band, out_hash, out_id = [], [], []
        for bnd in range(bands):
            chunk = sg[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            with np.errstate(over="ignore"):
                bh = chunk[:, 0].copy()
                for c in range(1, rows_per_band):
                    bh = mix64(bh ^ chunk[:, c])
            out_band.append(np.full(len(ids), bnd, np.int32))
            out_hash.append(bh.view(np.int64))
            out_id.append(ids)
        bh_all = np.concatenate(out_hash)
        bb = (bh_all.view(np.uint64) % np.uint64(NBK)).astype(np.int64)
        return pa.table({"bb": bb,
                         "band": np.concatenate(out_band),
                         "band_hash": bh_all,
                         id_col: np.concatenate(out_id)})

    def coarse_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        """All pairs within each (band, band_hash) bucket of this coarse
        group — ONE call handles thousands of buckets: vectorized
        segmentation; the per-bucket pair expansion touches only the
        (rare) buckets holding ≥2 docs."""
        if len(grp) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        b = grp["band"].to_numpy()
        h = grp["band_hash"].to_numpy()
        ids = grp[id_col].to_numpy()
        order = np.lexsort((ids, h, b))
        b, h, ids = b[order], h[order], ids[order]
        newg = np.concatenate([[True], (np.diff(b) != 0) | (np.diff(h) != 0)])
        starts = np.flatnonzero(newg)
        counts = np.diff(np.append(starts, len(ids)))
        out_a, out_b = [], []
        for s in np.flatnonzero(counts >= 2):
            seg = ids[starts[s]:starts[s] + counts[s]]
            ia, ib = np.triu_indices(len(seg), k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    cand = sigs.map_batches(to_band_keys, batch_format="pyarrow") \
        .groupby("bb") \
        .map_groups(coarse_pairs, batch_format="pandas")

    # -- verify: attach both signatures per candidate pair ----------------
    # Candidate pairs are OUTPUT-bounded (LSH collisions ≈ near-dups ≈
    # the result the caller collects anyway), so the default verify
    # gathers the deduped pairs + only the signatures they reference
    # (≤ 2 sigs/pair, membership-filtered map over the sig table) and
    # computes the estimate in one vectorized pass — a single LSH
    # shuffle total.  If the candidate set is unexpectedly huge
    # (pathological threshold), fall back to the fully-distributed
    # bucketed join.
    cand = cand.materialize()        # blocks stay in the object store
    if cand.count() > max_driver_pairs:   # metadata count — gate BEFORE
        # any pair bytes reach the driver heap
        return _minhash_verify_distributed(sigs, cand, id_col, num_perm,
                                           jaccard_threshold)
    pairs_df = cand.to_pandas()
    pair_ids = np.unique(
        np.stack([pairs_df["id_a"].to_numpy(), pairs_df["id_b"].to_numpy()]),
        axis=1).T if len(pairs_df) else np.empty((0, 2), np.int64)
    if len(pair_ids) == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64())}))
    need = np.unique(pair_ids)
    need_ref = ray.put(need)

    def filter_sigs(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        m = np.isin(ids, ray.get(need_ref))
        return batch.filter(pa.array(m))

    sub = sigs.map_batches(filter_sigs, batch_format="pyarrow").to_pandas()
    sids = sub[id_col].to_numpy()
    smat = np.stack(sub["signature"].to_numpy()).reshape(len(sids), num_perm)
    so = np.argsort(sids)
    sids, smat = sids[so], smat[so]
    pa_pos = np.searchsorted(sids, pair_ids[:, 0])
    pb_pos = np.searchsorted(sids, pair_ids[:, 1])
    est = (smat[pa_pos] == smat[pb_pos]).mean(axis=1)
    m = est >= jaccard_threshold
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array(pair_ids[m, 0], pa.int64()),
        "id_b": pa.array(pair_ids[m, 1], pa.int64()),
        "est_jaccard": pa.array(est[m], pa.float64())}))


def _minhash_verify_distributed(sigs, cand, id_col: str, num_perm: int,
                                jaccard_threshold: float):
    """Fully-distributed signature re-join for huge candidate sets:
    fixed hash buckets of the join key with a vectorized searchsorted
    merge inside each group (two keyed exchanges, one signature copy
    per pair side)."""
    NB = 32
    sig_t = pa.list_(pa.int64())
    empty_flat = pa.array([], pa.int64())

    def sig_side(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        return pa.table({
            "jb": (ids % NB).astype(np.int64),
            "id_a": ids, "id_b": np.full(len(ids), -1, np.int64),
            "sig": batch["signature"].cast(sig_t),
        })

    def pair_first(batch: pa.Table) -> pa.Table:
        keys = batch["id_a"].to_numpy()
        return pa.table({
            "jb": (keys % NB).astype(np.int64),
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "sig": pa.array([None] * batch.num_rows, sig_t),
        })

    def attach(grp: pa.Table, key_col: str) -> pa.Table:
        ids_b = grp["id_b"].to_numpy()
        is_sig = ids_b < 0
        n_pairs = int((~is_sig).sum())
        if n_pairs == 0:
            return pa.table({"id_a": empty_flat, "id_b": empty_flat,
                             "sig": pa.array([], sig_t),
                             "sig_prev": pa.array([], sig_t)})
        sig_rows = grp.filter(pa.array(is_sig))
        pair_rows = grp.filter(pa.array(~is_sig))
        sids = sig_rows["id_a"].to_numpy()
        smat = np.asarray(sig_rows["sig"].combine_chunks().flatten()
                          .to_numpy()).reshape(len(sids), num_perm)
        so = np.argsort(sids)
        sids, smat = sids[so], smat[so]
        keys = pair_rows[key_col].to_numpy()
        pos = np.clip(np.searchsorted(sids, keys), 0, max(len(sids) - 1, 0))
        hit = sids[pos] == keys if len(sids) else np.zeros(len(keys), bool)
        att = smat[pos] if len(sids) else np.zeros((len(keys), num_perm),
                                                   np.int64)
        att_list = pa.ListArray.from_arrays(
            pa.array(np.arange(n_pairs + 1, dtype=np.int32) * num_perm),
            pa.array(att.reshape(-1)))
        prev = (pair_rows["sig"].cast(sig_t)
                if "sig" in pair_rows.column_names else
                pa.array([None] * n_pairs, sig_t))
        return pa.table({"id_a": pair_rows["id_a"], "id_b": pair_rows["id_b"],
                         "sig": att_list,
                         "sig_prev": prev}).filter(pa.array(hit))

    from functools import partial as _p
    j1 = sigs.map_batches(sig_side, batch_format="pyarrow") \
        .union(cand.map_batches(pair_first, batch_format="pyarrow")) \
        .groupby("jb").map_groups(_p(attach, key_col="id_a"),
                                  batch_format="pyarrow")

    def rekey(batch: pa.Table) -> pa.Table:
        keys = batch["id_b"].to_numpy()
        return pa.table({"jb": (keys % NB).astype(np.int64),
                         "id_a": batch["id_a"], "id_b": batch["id_b"],
                         "sig": batch["sig"]})

    j2 = sigs.map_batches(sig_side, batch_format="pyarrow") \
        .union(j1.map_batches(rekey, batch_format="pyarrow")) \
        .groupby("jb").map_groups(_p(attach, key_col="id_b"),
                                  batch_format="pyarrow")

    def estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": empty_flat, "id_b": empty_flat,
                             "est_jaccard": pa.array([], pa.float64())})
        sb = np.asarray(batch["sig"].combine_chunks().flatten()
                        .to_numpy()).reshape(batch.num_rows, num_perm)
        sa = np.asarray(batch["sig_prev"].combine_chunks().flatten()
                        .to_numpy()).reshape(batch.num_rows, num_perm)
        est = (sa == sb).mean(axis=1)
        m = est >= jaccard_threshold
        return pa.table({"id_a": batch["id_a"].to_numpy()[m],
                         "id_b": batch["id_b"].to_numpy()[m],
                         "est_jaccard": est[m]})

    # pairs surfacing from bands in different coarse groups duplicate →
    # final dedup over the (tiny) threshold-passing set
    return j2.map_batches(estimate, batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).max("est_jaccard") \
        .map_batches(lambda t: t.rename_columns(["id_a", "id_b", "est_jaccard"]),
                     batch_format="pyarrow")


def hamming_near_dup_pairs(ds: "ray.data.Dataset", hash_col: str,
                           id_col: str, max_hamming: int = 3,
                           bands: int = 4,
                           max_pairs_per_bucket: int = 2_000_000
                           ) -> "ray.data.Dataset":
    """Near-dup pairs of 64-bit fingerprints (SimHash / pHash) via banded
    Hamming LSH: split the 64 bits into ``bands`` 16-bit keys — any pair
    within Hamming distance ``bands-1`` shares ≥1 exact band (pigeonhole);
    verify exact Hamming within buckets.

    ``max_hamming`` must not exceed ``bands - 1``: a pair at a larger
    distance can differ in EVERY band, share no bucket, and be silently
    missing from the output (inconsistent recall) — raise instead.

    Degenerate-bucket safety (a constant-prefix corpus lands everything
    in one bucket): verification first collapses to DISTINCT fingerprint
    values — the all-pairs test runs over D distinct values in bounded
    2048² tiles, never over raw rows — and id-pair expansion is capped
    at ``max_pairs_per_bucket`` per bucket (deterministic by sorted
    order; the same bounded-output contract as ``minhash_lsh_pairs``'s
    driver cap).  An all-identical corpus therefore completes in
    O(rows + cap) instead of O(rows²)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole guarantee "
            f"of bands={bands} (only distance <= {bands - 1} is "
            "guaranteed to share a band); raise bands or lower "
            "max_hamming")

    def to_bands(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy().view(np.uint64)
        ids = batch[id_col].to_numpy()
        width = 64 // bands
        mask = np.uint64((1 << width) - 1)
        out_band, out_key, out_id, out_h = [], [], [], []
        for bnd in range(bands):
            key = (h >> np.uint64(bnd * width)) & mask
            out_band.append(np.full(len(ids), bnd, np.int32))
            out_key.append(key.view(np.int64))
            out_id.append(ids)
            out_h.append(h.view(np.int64))
        return pa.table({"band": np.concatenate(out_band),
                         "band_key": np.concatenate(out_key),
                         id_col: np.concatenate(out_id),
                         hash_col: np.concatenate(out_h)})

    def verify(grp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64),
                              "hamming": pd.Series([], dtype=np.int64)})
        if len(grp) < 2:
            return empty
        ids = grp[id_col].to_numpy()
        h = grp[hash_col].to_numpy().view(np.uint64)
        order = np.lexsort((ids, h))
        ids, h = ids[order], h[order]
        # collapse to distinct values: runs of equal h are consecutive
        starts = np.concatenate([[0], np.flatnonzero(np.diff(h) != 0) + 1])
        counts = np.diff(np.concatenate([starts, [len(h)]]))
        uh = h[starts]
        D = len(uh)
        out_a, out_b, out_d = [], [], []
        budget = max_pairs_per_bucket
        clipped = False          # a pair that SHOULD exist was dropped

        def emit(va: int, vb: int, dist: int):
            """expand value-pair → id pairs, generating only up to the
            remaining budget (never the full cross product)."""
            nonlocal budget, clipped
            if budget <= 0:
                clipped = True
                return
            if va == vb:
                g = ids[starts[va]:starts[va] + counts[va]]
                full = len(g) * (len(g) - 1) // 2
                ia, ib = bounded_triu_pairs(len(g), budget)
                a, b = g[ia], g[ib]
            else:
                ga = ids[starts[va]:starts[va] + counts[va]]
                gb = ids[starts[vb]:starts[vb] + counts[vb]]
                full = len(ga) * len(gb)
                need = min(budget, full)
                k = np.arange(need)
                a0 = ga[k // len(gb)]
                b0 = gb[k % len(gb)]
                a, b = np.minimum(a0, b0), np.maximum(a0, b0)
            if len(a) < full:
                clipped = True
            out_a.append(a)
            out_b.append(b)
            out_d.append(np.full(len(a), dist, np.int64))
            budget -= len(a)

        # within-value pairs: hamming 0
        dup_vs = np.flatnonzero(counts > 1)
        for j, v in enumerate(dup_vs):
            emit(int(v), int(v), 0)
            if budget <= 0:
                clipped |= j + 1 < len(dup_vs)
                break
        # cross-value pairs: blocked all-pairs over DISTINCT values
        T = 2048
        for s0 in range(0, D, T):
            if budget <= 0:
                clipped = True       # unscanned tiles remain
                break
            for s1 in range(s0, D, T):
                if budget <= 0:
                    clipped = True   # unscanned tiles remain
                    break
                ha = uh[s0:s0 + T]
                hb = uh[s1:s1 + T]
                x = ha[:, None] ^ hb[None, :]
                ham = np.zeros(x.shape, np.int64)
                for _ in range(64):
                    ham += (x & np.uint64(1)).astype(np.int64)
                    x = x >> np.uint64(1)
                    if not x.any():
                        break
                ra, rb = np.nonzero(ham <= max_hamming)
                if s0 == s1:
                    keep = ra < rb
                    ra, rb = ra[keep], rb[keep]
                for j, (va, vb) in enumerate(zip(ra, rb)):
                    emit(int(s0 + va), int(s1 + vb),
                         int(ham[va, vb]))
                    if budget <= 0:
                        clipped |= j + 1 < len(ra)
                        break
        if clipped:
            # no silent caps: a legitimately dense bucket beyond the
            # per-bucket pair budget yields truncated output — say so
            # (a budget exhausted exactly by the final pair does NOT warn)
            _LOG.warning(
                "hamming_near_dup_pairs: bucket with %d rows exhausted "
                "max_pairs_per_bucket=%d; pair output truncated",
                len(grp), max_pairs_per_bucket)
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_d)})

    pairs = ds.map_batches(to_bands, batch_format="pyarrow") \
        .groupby(["band", "band_key"]).map_groups(verify, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).min("hamming") \
        .map_batches(lambda t: t.rename_columns(["id_a", "id_b", "hamming"]),
                     batch_format="pyarrow")


def ngram_jaccard_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_pairs_per_bucket: int = 2_000_000
                        ) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard near-dup pairs, LSH-bucketed by the
    document's minimum shingle hash (1-perm MinHash blocking).

    Degenerate-bucket safety (same contract as ``hamming_near_dup_pairs``
    / ``minhash_lsh_pairs``): intersections are counted by emitting doc
    pairs per SHARED shingle — memory ∝ emitted pairs, never a dense
    (docs × distinct-shingles) matrix — and the per-bucket emission is
    capped at ``max_pairs_per_bucket`` with a warning when real pairs
    were dropped (a corpus-wide common minimal shingle lands every doc
    in one bucket; unbounded, that bucket is O(rows²))."""

    def prep(batch: pa.Table) -> pa.Table:
        # shared rolling-hash shingle stream (no per-doc Python sets);
        # distinct shingles per doc via one lexsort, block = unsigned
        # min (first distinct hash in sorted order)
        ids, sh_hash, seg = shingle_hash_stream(batch, text_col, id_col,
                                                shingle=n)
        n_docs = len(ids)
        seg_full = np.concatenate([seg, [len(sh_hash)]])
        doc_of = np.repeat(np.arange(n_docs), np.diff(seg_full))
        order = np.lexsort((sh_hash, doc_of))
        dd, hh = doc_of[order], sh_hash[order]
        keep = np.concatenate([[True],
                               (np.diff(dd) != 0) | (hh[1:] != hh[:-1])]) \
            if len(dd) else np.zeros(0, bool)
        dd, hh = dd[keep], hh[keep]
        counts = np.bincount(dd, minlength=n_docs)
        starts = np.zeros(n_docs, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        return pa.table({
            id_col: ids,
            "block": pa.array(hh[starts].view(np.int64)),
            "shingles": pa.ListArray.from_arrays(
                pa.array(np.concatenate([[0], np.cumsum(counts)])
                         .astype(np.int32)),
                pa.array(hh.view(np.int64)))})

    def verify(grp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64),
                              "jaccard": pd.Series([], dtype=np.float64)})
        if len(grp) < 2:
            return empty
        ids = grp[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        shingle_lists = grp["shingles"].to_numpy()[order]
        # sparse intersection counting: group docs by shared shingle and
        # emit each group's doc pairs; one np.unique over packed pair
        # keys gives the intersection sizes.  Memory ∝ emitted pairs
        # (budget-capped), never docs × distinct-shingles.
        lists = [np.asarray(s, np.int64) for s in shingle_lists]
        sizes = np.array([len(s) for s in lists], np.int64)  # distinct/doc
        flat = np.concatenate(lists) if lists else np.empty(0, np.int64)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), sizes)
        o2 = np.argsort(flat, kind="stable")   # doc order stable per hash
        g, d = flat[o2], doc_of[o2]
        gs = np.flatnonzero(np.concatenate([[True], np.diff(g) != 0])) \
            if len(g) else np.empty(0, np.int64)
        gc = np.diff(np.append(gs, len(g)))
        pair_keys = []
        emitted = 0
        clipped = False
        n_docs = len(ids)
        for s_, c_ in zip(gs[gc >= 2], gc[gc >= 2]):
            npairs = int(c_) * (int(c_) - 1) // 2
            if emitted + npairs > max_pairs_per_bucket:
                clipped = True
                break
            docs = d[s_:s_ + c_]               # sorted (stable argsort)
            ia, ib = np.triu_indices(int(c_), k=1)
            pair_keys.append(docs[ia] * n_docs + docs[ib])
            emitted += npairs
        if clipped:
            import warnings
            warnings.warn(
                f"ngram_jaccard_pairs: bucket with {n_docs} docs exceeded "
                f"max_pairs_per_bucket={max_pairs_per_bucket} shared-"
                "shingle pair emissions; pairs beyond the budget were "
                "dropped (raise max_pairs_per_bucket for exact results)")
        if not pair_keys:
            return empty
        keys, inter_p = np.unique(np.concatenate(pair_keys),
                                  return_counts=True)
        ia, ib = keys // n_docs, keys % n_docs
        union_p = np.maximum(sizes[ia] + sizes[ib] - inter_p, 1)
        jac = inter_p / union_p
        keep = jac >= threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "jaccard": jac[keep]})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("block").map_groups(verify, batch_format="pandas")
