"""Text-analysis stages for large-scale training-data pipelines.

Vectorized ``map_batches`` transforms over a ``text`` column:

- token / char counts (whitespace tokenization + a BPE-ish word regex)
- quality scoring (length, punctuation ratio, stopword ratio,
  mean word length)
- language ID: character n-gram profile heuristic (no external models —
  profiles for a small language set built from public stopword lists)
- document fingerprints: 64-bit SimHash over word 3-shingles and a
  rolling (Rabin-Karp-style) content hash

All pure numpy/pandas kernels; regexes are compiled once per actor via
the callable-class pattern when used in an actor pool.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tilemath.hashing import mix64

WORD_RE = re.compile(r"[a-z0-9]+(?:'[a-z]+)?")

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"},
    "fr": {"le", "la", "et", "de", "un", "est", "pour", "que", "dans", "les"},
    "es": {"el", "la", "y", "de", "un", "es", "en", "que", "los", "por"},
}


def token_char_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add n_tokens (single-space split), n_words (regex), n_chars."""
    s = batch[text_col].to_pandas().astype(str)
    n_chars = s.str.len().to_numpy(np.int64)
    n_tokens = (n_chars - s.str.replace(" ", "", regex=False).str.len().to_numpy(np.int64)) + 1
    # WORD_RE is lowercase-only: fold case first or every capitalized
    # word is mis-tokenized ("The" -> "he")
    n_words = s.str.lower().str.count(WORD_RE.pattern).to_numpy(np.int64)
    out = batch.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("n_words", pa.array(n_words))
    return out.append_column("n_chars_calc", pa.array(n_chars))


def _flat_words(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten per-doc word lists → (flat word array 'U', per-doc counts).

    Regex fallback for the byte-run scanner below (non-ASCII batches or
    apostrophe-joined words) — the only remaining per-word Python, off
    the fixture hot path.
    """
    words = s.str.findall(WORD_RE)
    counts = words.map(len).to_numpy(np.int64)
    flat = (np.array([w for ws in words for w in ws], dtype="U")
            if counts.sum() else np.empty(0, "U1"))
    return flat, counts


def word_hash_stream(s: pd.Series) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray]:
    """FNV-1a hash + char length of every ``WORD_RE`` word of the batch
    in doc order, plus words per doc — the shared word stream of the
    text kernels with NO per-word Python: one byte-run scan over the
    ``\\x00``-joined corpus (word starts/ends from a boolean mask, word
    hashes via a ≤max-word-len column sweep).  Hashes are byte-identical
    to ``fnv1a_64_strings`` of the word strings, so consumers do
    stopword membership with ``np.isin`` on hashes.  Falls back to the
    regex flatten for non-ASCII batches or apostrophe-joined words
    (``don't``), where the run scan would mis-tokenize."""
    from ..tilemath.hashing import (FNV1_64_INIT, FNV1_PRIME_64,
                                    fnv1a_64_strings)

    def fallback():
        flat, counts = _flat_words(s)
        if not len(flat):
            return (np.empty(0, np.uint64), np.empty(0, np.int64), counts)
        return (fnv1a_64_strings(flat),
                np.char.str_len(flat).astype(np.int64), counts)

    vals = s.tolist()
    joined = "\x00".join(vals)
    if not joined:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.zeros(len(vals), np.int64))
    b = np.frombuffer(joined.encode("utf-8"), np.uint8)
    if len(b) != len(joined):                  # non-ASCII → byte offsets shift
        return fallback()
    isc = ((b >= 97) & (b <= 122)) | ((b >= 48) & (b <= 57))
    if (b == 39).any():
        isal = (b >= 97) & (b <= 122)
        if ((b[1:-1] == 39) & isc[:-2] & isal[2:]).any():
            return fallback()                  # apostrophe-joined words
    prev = np.concatenate([[False], isc[:-1]])
    nxt = np.concatenate([isc[1:], [False]])
    w_start = np.flatnonzero(isc & ~prev)
    lengths = np.flatnonzero(isc & ~nxt) + 1 - w_start
    doc_lens = s.str.len().to_numpy(np.int64)
    doc_off = np.concatenate([[0], np.cumsum(doc_lens + 1)])
    counts = np.diff(np.searchsorted(w_start, doc_off))
    h = np.full(len(w_start), FNV1_64_INIT, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lengths.max()) if len(lengths) else 0):
            m = lengths > j
            h[m] = (h[m] ^ b[w_start[m] + j].astype(np.uint64)) \
                * FNV1_PRIME_64
    return h, lengths.astype(np.int64), counts.astype(np.int64)


def _segment_sums(values: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Sum of ``values`` per doc segment given per-doc counts (0-safe)."""
    out = np.zeros(len(counts), dtype=np.float64)
    nz = counts > 0
    if nz.any():
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        out[nz] = np.add.reduceat(values.astype(np.float64), starts[nz])
    return out


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add quality columns: punct_ratio, stop_ratio, mean_word_len, q_score.

    Batch-vectorized: one flattened word stream per batch; stopword
    membership via ``np.isin``, per-doc sums via ``np.add.reduceat``.
    """
    from ..tilemath.hashing import fnv1a_64_strings

    s = batch[text_col].to_pandas().astype(str)
    n = s.str.len().to_numpy(np.float64)
    n = np.maximum(n, 1)
    punct = s.str.count(r"[^\w\s]").to_numpy(np.float64)
    # fold case before tokenizing: WORD_RE and the stopword set are
    # lowercase, and un-folded "The" would tokenize as "he" and never
    # count as a stopword — halving stop_ratio on ordinary prose
    word_h, word_len, counts = word_hash_stream(s.str.lower())
    stop_all = np.array(sorted(set().union(*STOPWORDS.values())), dtype="U")
    stop_hashes = np.sort(fnv1a_64_strings(stop_all))
    denom = np.maximum(counts, 1).astype(np.float64)
    stop_ratio = _segment_sums(np.isin(word_h, stop_hashes), counts) / denom
    mean_wl = _segment_sums(word_len, counts) / denom
    punct_ratio = punct / n
    # simple composite quality heuristic in [0,1]
    q = (1.0 - np.clip(punct_ratio * 5, 0, 1)) * 0.4 \
        + np.clip(stop_ratio * 3, 0, 1) * 0.3 \
        + np.clip((mean_wl - 2) / 6, 0, 1) * 0.3
    out = batch.append_column("punct_ratio", pa.array(punct_ratio))
    out = out.append_column("stop_ratio", pa.array(stop_ratio))
    out = out.append_column("mean_word_len", pa.array(mean_wl))
    return out.append_column("q_score", pa.array(q))


class LangId:
    """Stopword-profile language ID (actor-pool stage: profiles built once).

    The analog of the reference's per-worker language tooling
    (``util/LanguageUtils.java``, thread-local transliterators) — state
    initialised in ``__init__`` once per actor, vectorized per batch.
    """

    def __init__(self):
        from ..tilemath.hashing import fnv1a_64_strings

        # langs ordered DESC so argmax (first max) = the tie-break winner
        # of max(score, lang): highest score, then lexicographically
        # largest language code
        self.langs = sorted(STOPWORDS, reverse=True)
        self.profiles = [
            np.sort(fnv1a_64_strings(
                np.array(sorted(STOPWORDS[lg]), dtype="U")))
            for lg in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        word_h, _, counts = word_hash_stream(
            batch["text"].astype(str).str.lower())
        scores = np.stack([_segment_sums(np.isin(word_h, prof), counts)
                           for prof in self.profiles], axis=1)
        best = scores.argmax(axis=1)
        top = scores[np.arange(len(best)), best]
        pred = np.where(top > 0, np.array(self.langs)[best], "und")
        batch = batch.copy()
        batch["lang_pred"] = pred
        return batch


def simhash64(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add a 64-bit SimHash over word 3-shingles (batch-vectorized).

    Standard SimHash (Charikar): sum signed bit votes of shingle hashes,
    take the sign vector.  Shingle hashes come from the shared
    rolling-mix64 stream (``stages.dedup.shingle_hash_stream``) so the
    whole batch is one reduceat — no per-doc Python loop — and the SQL
    oracle (``pipelines.sqlgen``) can re-derive the same hashes.
    """
    from .dedup import shingle_hash_stream
    _, sh_hash, seg = shingle_hash_stream(batch, text_col, id_col=batch.column_names[0])
    n_docs = batch.num_rows
    if n_docs == 0:
        return batch.append_column("simhash", pa.array([], pa.int64()))
    counts = np.diff(np.concatenate([seg, [len(sh_hash)]]))
    bits = ((sh_hash[:, None] >> np.arange(64, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int32)
    ones = np.add.reduceat(bits, seg, axis=0) if len(sh_hash) else \
        np.zeros((n_docs, 64), np.int32)
    ones[counts == 0] = 0
    # vote > 0  ⇔  2·ones > count
    setbit = (2 * ones) > counts[:, None]
    sim = (setbit.astype(np.uint64) <<
           np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return batch.append_column("simhash", pa.array(sim.view(np.int64)))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 16) -> pa.Table:
    """Add a 64-bit rolling-hash document fingerprint (min-sampled).

    Rabin-Karp rolling hash over bytes with window ``window``; the
    fingerprint is the minimum window hash (a 1-perm MinHash), stable
    under local edits outside the minimizing window.
    """
    texts = batch[text_col].to_pandas().astype(str)
    n = len(texts)
    if n == 0:
        return batch.append_column("fingerprint", pa.array([], pa.int64()))
    B = np.uint64(1099511628211)
    pw = np.empty(window, dtype=np.uint64)
    pw[0] = 1
    with np.errstate(over="ignore"):
        for k in range(1, window):
            pw[k] = pw[k - 1] * B

    try:
        # batch-wide fast path: whole batch as one padded byte matrix,
        # all windows of all docs in a few matrix ops
        arr = np.asarray(texts.to_numpy(), dtype="S")
    except UnicodeEncodeError:
        arr = None
    if arr is not None and n * max(arr.dtype.itemsize, 1) > 64_000_000:
        # padded to the LONGEST doc: one 1 MB outlier in a 4096-row
        # batch would allocate batch × longest byte + uint64 matrices
        # (tens of GB); the per-doc loop does the same total work
        # without the padding
        arr = None
    if arr is not None:
        width = max(arr.dtype.itemsize, 1)
        mat = arr.view(np.uint8).reshape(n, width)
        lens = np.count_nonzero(mat, axis=1)  # NUL-padded → byte lengths
        out = mix64(lens.astype(np.uint64)).view(np.int64).copy()
        n_win_max = width - window + 1
        if n_win_max > 0:
            acc = np.zeros((n, n_win_max), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for k in range(window):
                    acc += mat[:, k:k + n_win_max].astype(np.uint64) * pw[window - 1 - k]
                mixed = mix64(acc)
            # mask windows past each doc's end, min per row
            win_idx = np.arange(n_win_max)[None, :]
            valid = win_idx < (lens[:, None] - window + 1)
            mixed[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
            long_m = lens >= window
            if long_m.any():
                out[long_m] = mixed[long_m].min(axis=1).view(np.int64)
        return batch.append_column("fingerprint", pa.array(out))

    # non-ASCII fallback: per-doc (rare; utf-8 byte semantics preserved)
    out = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < window:
            out[i] = np.int64(mix64(np.array([len(b)], dtype=np.uint64))[0].astype(np.int64))
            continue
        with np.errstate(over="ignore"):
            n_win = len(b) - window + 1
            acc = np.zeros(n_win, dtype=np.uint64)
            for k in range(window):
                acc += b[k:k + n_win].astype(np.uint64) * pw[window - 1 - k]
        out[i] = np.int64(mix64(acc).min().astype(np.int64))
    return batch.append_column("fingerprint", pa.array(out))
