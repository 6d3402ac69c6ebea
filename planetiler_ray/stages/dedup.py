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

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..tilemath.hashing import fnv1a_64_strings, mix64
from .text import WORD_RE

# deterministic minhash permutation parameters (seed fixed)
_MINHASH_SEED = 42


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
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


def shingle_minhash(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id", num_perm: int = 64,
                    shingle: int = 3) -> pa.Table:
    """Per-doc MinHash signature over word ``shingle``-grams.

    Fully batch-vectorized: shingle hashes are computed WITHOUT string
    materialization (rolling combine of per-word hashes), and the k-perm
    minima use one ``np.minimum.reduceat`` over the whole batch's
    shingle stream per permutation chunk — no per-doc Python loop in
    the hot part.
    """
    a, b = _minhash_params(num_perm)
    ids = batch[id_col].to_numpy()
    words_all = batch[text_col].to_pandas().astype(str).str.lower().str.findall(WORD_RE)
    n_docs = len(ids)

    # flatten every word of the batch, remember per-doc boundaries
    counts = words_all.map(len).to_numpy(np.int64)
    flat_words = np.array([w for ws in words_all for w in ws], dtype=object) \
        if counts.sum() else np.empty(0, dtype=object)
    word_h = mix64(fnv1a_64_strings(flat_words.astype("U"))) if len(flat_words) \
        else np.empty(0, np.uint64)

    # shingle hash = combine of `shingle` consecutive word hashes within a doc
    doc_of = np.repeat(np.arange(n_docs), counts)
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
        sh_hash, sh_docs = sh_hash[order], sh_docs[order]
        seg = np.searchsorted(sh_docs, np.arange(n_docs))
        sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
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

    Pipeline: signature per doc → explode to (band, band_hash) rows →
    groupby(band, band_hash) buckets → pairwise signature-Jaccard
    estimate within buckets → pairs over threshold (deduped).
    """
    rows_per_band = num_perm // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        sig_tbl = shingle_minhash(batch, text_col, id_col, num_perm, shingle)
        ids = sig_tbl[id_col].to_numpy()
        sigs = np.asarray(sig_tbl["signature"].combine_chunks().flatten()
                          .to_numpy().view(np.uint64)).reshape(len(ids), num_perm)
        band_rows = {"band": [], "band_hash": [], id_col: [], "sig": []}
        for bnd in range(bands):
            chunk = sigs[:, bnd * rows_per_band:(bnd + 1) * rows_per_band]
            with np.errstate(over="ignore"):
                bh = chunk[:, 0].copy()
                for c in range(1, rows_per_band):
                    bh = mix64(bh ^ chunk[:, c])
            band_rows["band"].append(np.full(len(ids), bnd, np.int32))
            band_rows["band_hash"].append(bh.view(np.int64))
            band_rows[id_col].append(ids)
            band_rows["sig"].append(sigs)
        return pa.table({
            "band": np.concatenate(band_rows["band"]),
            "band_hash": np.concatenate(band_rows["band_hash"]),
            id_col: np.concatenate(band_rows[id_col]),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(band_rows["sig"], axis=0).reshape(-1).view(np.int64)),
                num_perm),
        })

    def bucket_pairs(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        ids = grp[id_col].to_numpy()
        sigs = np.stack(grp["sig"].to_numpy()).view(np.uint64)
        order = np.argsort(ids)
        ids, sigs = ids[order], sigs[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        est = (sigs[ia] == sigs[ib]).mean(axis=1)
        m = est >= jaccard_threshold
        return pd.DataFrame({"id_a": ids[ia][m], "id_b": ids[ib][m],
                             "est_jaccard": est[m]})

    pairs = ds.map_batches(to_bands, batch_format="pyarrow") \
        .groupby(["band", "band_hash"]) \
        .map_groups(bucket_pairs, batch_format="pandas")
    # a pair can surface from several bands → dedup
    return pairs.groupby(["id_a", "id_b"]).max("est_jaccard") \
        .map_batches(lambda t: t.rename_columns(["id_a", "id_b", "est_jaccard"]),
                     batch_format="pyarrow")


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
        sets = [set(s) for s in grp["shingles"]]
        order = np.argsort(ids)
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = order[i], order[j]
                inter = len(sets[a] & sets[b])
                jac = inter / max(1, len(sets[a] | sets[b]))
                if jac >= threshold:
                    rows.append((ids[a], ids[b], jac))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("block").map_groups(verify, batch_format="pandas")
