"""Name translations: the Wikidata/Translations analog.

The reference fetches ``qid → {lang: label}`` maps from Wikidata over
the network (``util/Wikidata.java``) and merges them with an element's
own ``name:lang`` tags through a configured language preference order
(``util/Translations.java:33-120``: each provider is consulted in
order; element-tag translations win over wikidata labels when both
exist).  Offline, cluster-native re-expression:

  - the translation table is a SMALL side input (qid, lang, name) —
    built once on the driver, sorted-columnar per language, broadcast
    with ``ray.put`` and read by every ``map_batches`` task (never
    re-shipped per batch, never shuffled);
  - lookup per batch is one ``np.searchsorted`` per configured
    language — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class TranslationIndex:
    """qid-sorted columnar ``lang → (qids, names)`` lookup table.

    Built from parallel arrays (one row per (qid, lang) label); the
    whole structure is numpy and pickles compactly for ``ray.put``.
    """

    def __init__(self, qids: np.ndarray, langs: np.ndarray,
                 names: np.ndarray):
        qids = np.asarray(qids, np.int64)
        langs = np.asarray(langs, object)
        names = np.asarray(names, object)
        self.by_lang: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for lg in np.unique(langs.astype(str)):
            sel = langs == lg
            q = qids[sel]
            order = np.argsort(q, kind="stable")
            self.by_lang[str(lg)] = (q[order], names[sel][order])

    def lookup(self, lang: str, qids: np.ndarray) -> np.ndarray:
        """Vectorized qid → name for one language; missing → None."""
        out = np.full(len(qids), None, dtype=object)
        entry = self.by_lang.get(lang)
        if entry is None or len(entry[0]) == 0:
            return out
        sq, names = entry
        pos = np.searchsorted(sq, qids)
        posc = np.minimum(pos, len(sq) - 1)
        hit = sq[posc] == qids
        out[hit] = names[posc[hit]]
        return out


def translate_names(ds: "ray.data.Dataset", index: TranslationIndex,
                    languages: tuple[str, ...],
                    qid_col: str = "wikidata_qid",
                    own_prefix: str = "name_tag_") -> "ray.data.Dataset":
    """Add ``name_<lang>`` columns resolved per the reference's provider
    order: an element's own ``name_tag_<lang>`` column (its ``name:lang``
    tag) wins; otherwise the broadcast wikidata label; otherwise null.
    ``Translations.java:94-120`` semantics over Arrow batches.
    """
    idx_ref = ray.put(index)

    def apply(batch: pa.Table) -> pa.Table:
        idx: TranslationIndex = ray.get(idx_ref)
        # qids arrive as ints, 'Q42'-style strings, or nulls (most OSM
        # elements carry no wikidata tag) — a plain astype(int64) would
        # crash on strings and turn NaN into INT64_MIN garbage hits
        import pandas as pd
        import pyarrow.compute as pc

        raw = batch[qid_col].combine_chunks() \
            if isinstance(batch[qid_col], pa.ChunkedArray) \
            else batch[qid_col]
        if (pa.types.is_string(raw.type)
                or pa.types.is_large_string(raw.type)):
            stripped = pc.utf8_ltrim(raw, characters="Qq")
            qids = pd.to_numeric(stripped.to_pandas(), errors="coerce") \
                .fillna(-1).to_numpy(np.int64)
        else:
            arr = raw.to_numpy(zero_copy_only=False)
            bad = np.asarray(pd.isnull(arr))
            qids = np.where(bad, -1, arr).astype(np.int64)
        for lg in languages:
            wiki = idx.lookup(lg, qids)
            own_col = f"{own_prefix}{lg}"
            if own_col in batch.schema.names:
                own = batch[own_col].to_numpy(zero_copy_only=False)
                use_own = np.array([v is not None for v in own], bool)
                wiki[use_own] = own[use_own]
            batch = batch.append_column(f"name_{lg}",
                                        pa.array(wiki, pa.string()))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")
