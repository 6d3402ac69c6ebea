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

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..tilemath.hashing import fnv1a_64_strings, mix64
from .text import WORD_RE

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
    """Keep the lowest id per distinct text (hash-partitioned)."""
    from ray.data.aggregate import Min

    def h(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().astype(str).to_numpy()
        hh = fnv1a_64_strings(texts, max_len=max(1, max(map(len, texts), default=1)))
        return pa.table({id_col: batch[id_col],
                         "text_hash": pa.array(hh.view(np.int64))})

    return ds.map_batches(h, batch_format="pyarrow") \
        .groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))


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
    ids = batch[id_col].to_numpy()
    words_all = batch[text_col].to_pandas().astype(str).str.lower().str.findall(WORD_RE)
    n_docs = len(ids)

    # flatten every word of the batch, remember per-doc boundaries
    counts = words_all.map(len).to_numpy(np.int64)
    flat_words = np.array([w for ws in words_all for w in ws], dtype=object) \
        if counts.sum() else np.empty(0, dtype=object)
    word_h = mix64(fnv1a_64_strings(flat_words.astype("U"))) if len(flat_words) \
        else np.empty(0, np.uint64)

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
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p0 in range(0, num_perm, 8):  # chunk perms to bound memory
            p1 = min(p0 + 8, num_perm)
            vals = sh_hash[:, None] * a[None, p0:p1] + b[None, p0:p1]
            sigs[:, p0:p1] = np.minimum.reduceat(vals, seg, axis=0) \
                if len(sh_hash) else np.uint64(0)
    return pa.table({id_col: ids,
                     "signature": pa.FixedSizeListArray.from_arrays(
                         pa.array(sigs.reshape(-1).view(np.int64)), num_perm)})


def minhash_lsh_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 8, jaccard_threshold: float = 0.5,
                      shingle: int = 3) -> "ray.data.Dataset":
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

    sigs = ds.map_batches(
        partial(shingle_minhash, text_col=text_col, id_col=id_col,
                num_perm=num_perm, shingle=shingle),
        batch_format="pyarrow")

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
        return pa.table({"band": np.concatenate(out_band),
                         "band_hash": np.concatenate(out_hash),
                         id_col: np.concatenate(out_id)})

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        ids = np.sort(grp[id_col].to_numpy())
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = sigs.map_batches(to_band_keys, batch_format="pyarrow") \
        .groupby(["band", "band_hash"]) \
        .map_groups(bucket_pairs, batch_format="pandas") \
        .groupby(["id_a", "id_b"]).count() \
        .select_columns(["id_a", "id_b"])  # dedup pairs seen in >1 band

    def sig_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch[id_col],
            "id_a": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "id_b": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "sig": batch["signature"].cast(sig_t),
            "sig_a": pa.array([None] * batch.num_rows, sig_t),
        })

    def pair_side(batch: pa.Table, key_col: str) -> pa.Table:
        return pa.table({
            "key": batch[key_col],
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "sig": pa.array([None] * batch.num_rows, sig_t),
            "sig_a": batch["sig_a"] if "sig_a" in batch.column_names
            else pa.array([None] * batch.num_rows, sig_t),
        })

    def attach(grp: pa.Table, out_col: str) -> pa.Table:
        ids_a = grp["id_a"].to_numpy()
        is_sig = ids_a < 0
        pairs_m = ~is_sig
        if not pairs_m.any():
            return pa.table({"key": pa.array([], pa.int64()),
                             "id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sig": pa.array([], sig_t),
                             "sig_a": pa.array([], sig_t)})
        sig_rows = grp.filter(pa.array(is_sig))
        pair_rows = grp.filter(pa.array(pairs_m))
        n = pair_rows.num_rows
        if sig_rows.num_rows:
            sig_np = np.asarray(sig_rows["sig"][0].as_py(), dtype=np.int64)
            attached = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * num_perm),
                pa.array(np.tile(sig_np, n)))
        else:
            attached = pa.array([None] * n, sig_t)
        cols = {"key": pair_rows["key"], "id_a": pair_rows["id_a"],
                "id_b": pair_rows["id_b"]}
        if out_col == "sig_a":
            cols["sig"] = pa.array([None] * n, sig_t)
            cols["sig_a"] = attached
        else:
            cols["sig"] = attached          # reuse 'sig' slot for sig_b
            cols["sig_a"] = pair_rows["sig_a"]
        return pa.table(cols)

    # pass 1: attach sig_a (key = id_a)
    joined1 = sigs.map_batches(sig_side, batch_format="pyarrow") \
        .union(cand.map_batches(partial(pair_side, key_col="id_a"),
                                batch_format="pyarrow")) \
        .groupby("key").map_groups(partial(attach, out_col="sig_a"),
                                   batch_format="pyarrow")
    # pass 2: attach sig_b (key = id_b) and compute the estimate
    joined2 = sigs.map_batches(sig_side, batch_format="pyarrow") \
        .union(joined1.map_batches(partial(pair_side, key_col="id_b"),
                                   batch_format="pyarrow")) \
        .groupby("key").map_groups(partial(attach, out_col="sig"),
                                   batch_format="pyarrow")

    def estimate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows:
            batch = batch.filter(pc.and_(pc.is_valid(batch["sig_a"]),
                                         pc.is_valid(batch["sig"])))
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = np.asarray(batch["sig_a"].combine_chunks().flatten()
                        .to_numpy()).reshape(batch.num_rows, num_perm)
        sb = np.asarray(batch["sig"].combine_chunks().flatten()
                        .to_numpy()).reshape(batch.num_rows, num_perm)
        est = (sa == sb).mean(axis=1)
        m = est >= jaccard_threshold
        return pa.table({"id_a": batch["id_a"].to_numpy()[m],
                         "id_b": batch["id_b"].to_numpy()[m],
                         "est_jaccard": est[m]})

    return joined2.map_batches(estimate, batch_format="pyarrow")


def hamming_near_dup_pairs(ds: "ray.data.Dataset", hash_col: str,
                           id_col: str, max_hamming: int = 8,
                           bands: int = 4) -> "ray.data.Dataset":
    """Near-dup pairs of 64-bit fingerprints (SimHash / pHash) via banded
    Hamming LSH: split the 64 bits into ``bands`` 16-bit keys — any pair
    within Hamming distance ``bands-1`` shares ≥1 exact band (pigeonhole);
    verify exact Hamming within buckets."""

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
        if len(grp) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ids = grp[id_col].to_numpy()
        h = grp[hash_col].to_numpy().view(np.uint64)
        order = np.argsort(ids)
        ids, h = ids[order], h[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        x = h[ia] ^ h[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
            if not x.any():
                break
        m = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][m], "id_b": ids[ib][m], "hamming": ham[m]})

    pairs = ds.map_batches(to_bands, batch_format="pyarrow") \
        .groupby(["band", "band_key"]).map_groups(verify, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).min("hamming") \
        .map_batches(lambda t: t.rename_columns(["id_a", "id_b", "hamming"]),
                     batch_format="pyarrow")


def ngram_jaccard_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> "ray.data.Dataset":
    """Exact word-n-gram Jaccard near-dup pairs, LSH-bucketed by the
    document's minimum shingle hash (1-perm MinHash blocking)."""

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        words_all = batch[text_col].to_pandas().astype(str).str.lower().str.findall(WORD_RE)
        blocks, shingle_sets = [], []
        for words in words_all:
            if len(words) < n:
                sh = {"$".join(words)} if len(words) else {""}
            else:
                sh = {"$".join(words[j:j + n]) for j in range(len(words) - n + 1)}
            h = mix64(fnv1a_64_strings(np.array(sorted(sh))))
            blocks.append(np.int64(h.min().astype(np.int64)))
            shingle_sets.append(h.view(np.int64))
        return pa.table({id_col: ids, "block": np.array(blocks, np.int64),
                         "shingles": pa.array([s.tolist() for s in shingle_sets],
                                              pa.list_(pa.int64()))})

    def verify(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        ids = grp[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        shingle_lists = grp["shingles"].to_numpy()[order]
        # bucket-level membership matrix: factorize all shingles once,
        # pairwise intersections = one integer matmul (no per-pair loop)
        flat = np.concatenate([np.unique(np.asarray(s, np.int64))
                               for s in shingle_lists])
        doc_of = np.repeat(np.arange(len(ids)),
                           [len(np.unique(np.asarray(s, np.int64)))
                            for s in shingle_lists])
        uniq, inv = np.unique(flat, return_inverse=True)
        memb = np.zeros((len(ids), len(uniq)), dtype=np.int32)
        memb[doc_of, inv] = 1
        sizes = memb.sum(axis=1)
        inter = memb @ memb.T
        ia, ib = np.triu_indices(len(ids), k=1)
        inter_p = inter[ia, ib]
        union_p = np.maximum(sizes[ia] + sizes[ib] - inter_p, 1)
        jac = inter_p / union_p
        keep = jac >= threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "jaccard": jac[keep]})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("block").map_groups(verify, batch_format="pandas")
