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

from ..tilemath.hashing import fnv1a_64_strings, mix64

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
    n_words = s.str.count(WORD_RE.pattern).to_numpy(np.int64)
    out = batch.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("n_words", pa.array(n_words))
    return out.append_column("n_chars_calc", pa.array(n_chars))


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add quality columns: punct_ratio, stop_ratio, mean_word_len, q_score."""
    s = batch[text_col].to_pandas().astype(str)
    n = s.str.len().to_numpy(np.float64)
    n = np.maximum(n, 1)
    punct = s.str.count(r"[^\w\s]").to_numpy(np.float64)
    words = s.str.findall(WORD_RE)
    stop_all = set().union(*STOPWORDS.values())
    stop_ratio = words.map(
        lambda ws: sum(w in stop_all for w in ws) / max(1, len(ws))).to_numpy(np.float64)
    mean_wl = words.map(
        lambda ws: sum(map(len, ws)) / max(1, len(ws))).to_numpy(np.float64)
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
        self.profiles = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
        self.word_re = re.compile(WORD_RE.pattern)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].astype(str).str.lower().str.findall(self.word_re)

        def best(ws):
            if not ws:
                return "und"
            scores = {lang: sum(w in prof for w in ws) for lang, prof in self.profiles.items()}
            lang, score = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return lang if score > 0 else "und"

        batch = batch.copy()
        batch["lang_pred"] = words.map(best)
        return batch


def simhash64(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add a 64-bit SimHash over word 3-shingles (vectorized per batch).

    Standard SimHash (Charikar): sum signed bit votes of shingle hashes,
    take the sign vector.  Near-duplicate texts → small Hamming distance.
    """
    s = batch[text_col].to_pandas().astype(str).str.lower().str.findall(WORD_RE)
    hashes = []
    for words in s:
        if len(words) < 3:
            sh = ["$".join(words)] if words else [""]
        else:
            sh = ["$".join(words[i:i + 3]) for i in range(len(words) - 2)]
        h = mix64(fnv1a_64_strings(np.array(sh)))  # deterministic across processes
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        hashes.append(np.int64(sim.astype(np.int64)))
    return batch.append_column("simhash", pa.array(np.array(hashes, dtype=np.int64)))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 16) -> pa.Table:
    """Add a 64-bit rolling-hash document fingerprint (min-sampled).

    Rabin-Karp rolling hash over bytes with window ``window``; the
    fingerprint is the minimum window hash (a 1-perm MinHash), stable
    under local edits outside the minimizing window.
    """
    texts = batch[text_col].to_pandas().astype(str)
    B = np.uint64(1099511628211)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < window:
            out[i] = np.int64(mix64(np.array([len(b)], dtype=np.uint64))[0].astype(np.int64))
            continue
        # vectorized rolling hash: polynomial sum over sliding windows
        pw = np.empty(window, dtype=np.uint64)
        pw[0] = 1
        with np.errstate(over="ignore"):
            for k in range(1, window):
                pw[k] = pw[k - 1] * B
            n_win = len(b) - window + 1
            acc = np.zeros(n_win, dtype=np.uint64)
            for k in range(window):
                acc += b[k:k + n_win].astype(np.uint64) * pw[window - 1 - k]
        out[i] = np.int64(mix64(acc).min().astype(np.int64))
    return batch.append_column("fingerprint", pa.array(out))
