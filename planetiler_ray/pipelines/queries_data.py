"""Training-data operator queries (dedup / ANN / text / multimodal).

Same contract as :mod:`planetiler_ray.pipelines.queries`: ``q_*``
callables over ``sf_dir`` + DuckDB oracle SQL where the semantics are
SQL-expressible.  LSH-based ops whose *blocking* is part of the
semantics (banded Hamming) encode the same blocking in the SQL; ops
needing per-doc shingling/hashing DuckDB can't reproduce are rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ._util import round_half_away


def _read(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    from ._util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Exact text dedup: keep lowest doc_id per distinct text."""
    from ..stages.dedup import exact_dedup
    out = exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))
    return out.select_columns(["doc_id"])


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""


def q_phash_near_dup(sf_dir: str):
    """Banded-Hamming near-dup pairs over a derived 64-bit fingerprint.

    Fingerprint = splitmix64(doc_id // 4) with bit (doc_id % 4) flipped —
    deterministic clusters of 4 near-identical hashes, so the banded
    Hamming LSH (4 × 16-bit bands; catches every pair with distance ≤ 3
    by pigeonhole) must recover each cluster.  The SQL oracle replicates
    both the fingerprint (HUGEINT splitmix64) and the band blocking.
    """
    from ..stages.dedup import hamming_near_dup_pairs
    from ..tilemath.hashing import mix64

    def fp(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        h = mix64((d // 4).astype(np.uint64)) ^ (np.uint64(1) << (d % 4).astype(np.uint64))
        return pa.table({"doc_id": d, "fp": h.view(np.int64)})

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(fp, batch_format="pyarrow")
    pairs = hamming_near_dup_pairs(ds, hash_col="fp", id_col="doc_id",
                                   max_hamming=3, bands=4)
    return pairs


# splitmix64 in SQL: 32-bit-half products in HUGEINT, % 2^64 wraps.
# (validated bit-exact against tilemath.hashing.mix64; note DuckDB
# promotes xor(UBIGINT, BIGINT) to DOUBLE → keep every operand UBIGINT)
def _mulmod(z: str, c: int) -> str:
    return (f"CAST((( ({z} % 4294967296)::HUGEINT * {c} + "
            f"((({z} // 4294967296)::HUGEINT * {c}) % 4294967296) * 4294967296 )"
            f" % 18446744073709551616) AS UBIGINT)")


_SQL_SPLITMIX = f"""
s0 AS (SELECT doc_id, CAST(doc_id // 4 AS UBIGINT) AS z FROM documents),
s1 AS (SELECT doc_id, {_mulmod("xor(z, z >> 30)", 13787848793156543929)} AS z FROM s0),
s2 AS (SELECT doc_id, {_mulmod("xor(z, z >> 27)", 10723151780598845931)} AS z FROM s1),
fp AS (SELECT doc_id, xor(xor(z, z >> 31),
           CAST(CASE WHEN doc_id%4=0 THEN 1 WHEN doc_id%4=1 THEN 2
                     WHEN doc_id%4=2 THEN 4 ELSE 8 END AS UBIGINT)) AS f
       FROM s2)
"""

SQL_PHASH_NEAR_DUP = f"""
WITH {_SQL_SPLITMIX},
bands AS (SELECT doc_id, f, b.b AS band,
                 CASE b.b WHEN 0 THEN f % 65536
                          WHEN 1 THEN (f // 65536) % 65536
                          WHEN 2 THEN (f // 4294967296) % 65536
                          ELSE f // 281474976710656 END AS band_key
          FROM fp, (VALUES (0),(1),(2),(3)) b(b)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.f AS fa, b.f AS fb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
"""


def q_minhash_signatures(sf_dir: str):
    """Per-doc 64-perm MinHash signature summary (first perm + checksum)."""
    from ..stages.dedup import shingle_minhash

    def sig(batch: pa.Table) -> pa.Table:
        t = shingle_minhash(batch)
        ids = t["doc_id"].to_numpy()
        sigs = np.asarray(t["signature"].combine_chunks().flatten().to_numpy()
                          .view(np.uint64)).reshape(len(ids), -1)
        return pa.table({"doc_id": ids,
                         "minhash0": sigs[:, 0].view(np.int64),
                         "sig_xor": np.bitwise_xor.reduce(sigs, axis=1).view(np.int64)})

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(sig, batch_format="pyarrow")


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash-LSH near-dup candidate pairs (est. Jaccard ≥ 0.3)."""
    from ..stages.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                             jaccard_threshold=0.3)


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup pairs (1-perm MinHash
    blocking); jaccard rounded to 6 dp for the oracle compare."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = ngram_jaccard_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                             threshold=0.5)

    def rnd(t: pa.Table) -> pa.Table:
        j = round_half_away(t["jaccard"].to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "id_a": t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64),
            "id_b": t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64),
            "jaccard": j})

    return ds.map_batches(rnd, batch_format="pyarrow")


def q_simhash_docs(sf_dir: str):
    """Per-doc 64-bit SimHash fingerprints."""
    from ..stages.text import simhash64
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(simhash64, batch_format="pyarrow") \
        .select_columns(["doc_id", "simhash"])


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    """Per-language token/char aggregates (single-space tokenization)."""
    from ..stages.text import token_char_stats
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"]) \
        .map_batches(token_char_stats, batch_format="pyarrow")
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="sum_tokens"),
        Mean("n_chars_calc", alias_name="avg_chars")).to_pandas()
    out["avg_chars"] = round_half_away(out["avg_chars"], 2)
    return out


SQL_TOKEN_STATS = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
         AS sum_tokens,
       round(avg(CAST(length(text) AS DOUBLE)), 2) AS avg_chars
FROM documents GROUP BY lang
"""


def q_doc_quality(sf_dir: str):
    """Per-(lang, source) doc counts and length stats (quality gating)."""
    from ray.data.aggregate import Count, Max, Mean

    out = _read(sf_dir, "documents", ["lang", "source", "n_chars"]) \
        .groupby(["lang", "source"]).aggregate(
            Count(alias_name="n"),
            Mean("n_chars", alias_name="avg_chars"),
            Max("n_chars", alias_name="max_chars")).to_pandas()
    out["avg_chars"] = round_half_away(out["avg_chars"], 2)
    return out


SQL_DOC_QUALITY = """
SELECT lang, source, count(*) AS n,
       round(avg(CAST(n_chars AS DOUBLE)), 2) AS avg_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang, source
"""


def q_lang_id(sf_dir: str):
    """Heuristic language-ID over text (actor-pool stage); counts per pred."""
    from ..stages.text import LangId
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(LangId, batch_format="pandas", concurrency=2)
    return ds.groupby("lang_pred").aggregate(Count(alias_name="n"))


def q_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints (rows-only; determinism-checked)."""
    from ..stages.text import rolling_fingerprint
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(rolling_fingerprint, batch_format="pyarrow") \
        .select_columns(["doc_id", "fingerprint"])


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_ann_cosine_topk(sf_dir: str):
    """Exact cosine top-10 neighbors for query vectors vec_id 0..4."""
    import pyarrow.parquet as pq
    from ..stages.ann import brute_force_topk

    # predicate pushdown: only the 5 query rows reach the driver, never
    # the whole embedding table
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "<", 5)]) \
        .to_pandas().sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = brute_force_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                           queries, qdf["vec_id"].to_numpy(), k=10)
    df = out.to_pandas()[["query_id", "neighbor_id", "rnk"]]
    return df


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, e.embedding) AS cos
      FROM q, embeddings e),
r AS (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rnk
      FROM s)
SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 10
"""


def q_embedding_label_stats(sf_dir: str):
    """Per-label embedding count + mean first component (rounded)."""
    from ray.data.aggregate import Count, Mean

    def first_comp(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(1, batch.num_rows)
        return pa.table({"label": batch["label"],
                         "e0": flat.reshape(-1, dim)[:, 0].astype(np.float64)})

    out = _read(sf_dir, "embeddings", ["label", "embedding"]) \
        .map_batches(first_comp, batch_format="pyarrow") \
        .groupby("label").aggregate(Count(alias_name="n"),
                                    Mean("e0", alias_name="avg_e0")).to_pandas()
    out["avg_e0"] = round_half_away(out["avg_e0"], 4)
    return out


SQL_EMBEDDING_LABEL_STATS = """
SELECT label, count(*) AS n, round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_e0
FROM embeddings GROUP BY label
"""


def q_ann_ivf_topk(sf_dir: str):
    """IVF top-10 (coarse k-means lists) for query vectors 0..4.

    Driver-checked at ``nprobe = n_lists`` where the IVF machinery
    (list assignment, per-list search, merge) must reproduce brute-force
    exactly — giving the whole IVF path a SQL oracle.  The approximate
    ``nprobe < n_lists`` scale path (recall/probe trade-off) is
    unit-tested in tests/test_text_dedup_ann.py."""
    import pyarrow.parquet as pq
    from ..stages.ann import ivf_topk, train_ivf_centroids

    # bounded training read (first rows, strided ::3): at nprobe ==
    # n_lists the IVF result equals brute force for ANY quantizer, so
    # the sample only shapes routing — never pull the whole embedding
    # table onto the driver for it
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    got = []
    need = 3072 * 3
    for b in pf.iter_batches(batch_size=1024, columns=["embedding"]):
        got.append(b)
        need -= b.num_rows
        if need <= 0:
            break
    head = pa.Table.from_batches(got).to_pandas()["embedding"].to_numpy()
    sample = np.stack(head[::3]).astype(np.float64)
    cent = train_ivf_centroids(sample, n_lists=8)
    qdf = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "<", 5)]) \
        .to_pandas().sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = ivf_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                   queries, qdf["vec_id"].to_numpy(), cent, k=10, nprobe=8)
    return out.to_pandas()[["query_id", "neighbor_id", "rnk"]]


def q_embedding_near_dup(sf_dir: str):
    """Cosine near-dup pairs via hyperplane LSH buckets (rows-only)."""
    from ..stages.ann import embedding_near_dup_pairs
    return embedding_near_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        dim=64, cosine_threshold=0.2, num_planes=6)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def q_multimodal_decode(sf_dir: str):
    """Image decode + pixel stats through the actor-pool stage.

    Bytes are synthesized deterministically per doc_id inside the
    pipeline (the container has no image libs — stub codec, real
    plumbing): pixel ``p`` of image ``i`` is ``(i + p) % 256``, so the
    decoded-pixel sums (including the fake-JPEG quantization) are
    reproducible arithmetically by the DuckDB oracle.  Decoded by the
    DecodeImages actor pool; exact integer pixel sums per format.
    """
    from .. import codec
    from ..stages.multimodal import DecodeImages
    from ray.data.aggregate import Count, Sum

    def synth(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        ids, blobs, fmts, phs = [], [], [], []
        for i in d:
            w, h = 16 + (int(i) % 3) * 8, 16 + (int(i) % 2) * 8
            px = ((int(i) + np.arange(h * w * 3)) % 256) \
                .astype(np.uint8).reshape(h, w, 3)
            fmt = "png" if i % 2 == 0 else "jpeg"
            blob = codec.encode_image(px, fmt)
            ids.append(f"img{int(i):08d}")
            blobs.append(blob)
            fmts.append(fmt)
            phs.append(codec.phash64(px))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "bytes": pa.array(blobs, pa.binary()),
                         "fmt": pa.array(fmts, pa.string()),
                         "phash": pa.array(phs, pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(synth, batch_format="pyarrow", batch_size=256) \
        .map_batches(DecodeImages, batch_format="pyarrow", batch_size=128,
                     concurrency=(1, 4),  # autoscaling pool: never starves
                                          # upstream tasks on small sessions
                     # fused upstream closures land in the object store
                     # as actor ctor args; with restarts enabled Ray
                     # warns the restart could fail if they are lost
                     # (ray#53727).  The pool recreates workers itself,
                     # so disable actor-level restarts.
                     max_restarts=0)
    out = ds.groupby("fmt").aggregate(
        Count(alias_name="n"),
        Sum("ok", alias_name="n_ok"),
        Sum("sum_px", alias_name="sum_px")).to_pandas()
    out["n_ok"] = out["n_ok"].astype(np.int64)
    out["sum_px"] = out["sum_px"].astype(np.int64)
    return out


SQL_MULTIMODAL_DECODE = """
WITH img AS (SELECT doc_id AS i, 16 + (doc_id % 3) * 8 AS w,
                    16 + (doc_id % 2) * 8 AS h,
                    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
             FROM documents),
px AS (SELECT i, fmt, unnest(range(w * h * 3)) AS p FROM img),
dv AS (SELECT i, fmt,
              CASE WHEN fmt = 'png' THEN (i + p) % 256
                   ELSE (((i + p) % 256) // 4) * 4 + 2 END AS v
       FROM px)
SELECT fmt, count(DISTINCT i) AS n, count(DISTINCT i) AS n_ok,
       CAST(sum(v) AS BIGINT) AS sum_px
FROM dv GROUP BY fmt
"""


DATA_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "phash_near_dup": q_phash_near_dup,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_docs": q_simhash_docs,
    "token_stats": q_token_stats,
    "doc_quality": q_doc_quality,
    "lang_id": q_lang_id,
    "doc_fingerprints": q_fingerprints,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_label_stats": q_embedding_label_stats,
    "embedding_near_dup": q_embedding_near_dup,
    "multimodal_decode": q_multimodal_decode,
}

from .sqlgen import (sql_doc_fingerprints, sql_embedding_near_dup,  # noqa: E402
                     sql_lang_id, sql_minhash_lsh_pairs,
                     sql_minhash_signatures, sql_ngram_jaccard_pairs,
                     sql_simhash_docs)

DATA_ORACLE_SQL = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "phash_near_dup": SQL_PHASH_NEAR_DUP,
    "minhash_signatures": sql_minhash_signatures(),
    "minhash_lsh_pairs": sql_minhash_lsh_pairs(),
    "ngram_jaccard_pairs": sql_ngram_jaccard_pairs(),
    "simhash_docs": sql_simhash_docs(),
    "doc_fingerprints": sql_doc_fingerprints(),
    "lang_id": sql_lang_id(),
    "token_stats": SQL_TOKEN_STATS,
    "doc_quality": SQL_DOC_QUALITY,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    # IVF at nprobe=n_lists must equal brute force — same oracle
    "ann_ivf_topk": SQL_ANN_COSINE_TOPK,
    "embedding_label_stats": SQL_EMBEDDING_LABEL_STATS,
    "embedding_near_dup": sql_embedding_near_dup(),
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
}
