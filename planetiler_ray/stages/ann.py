"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once via ``ray.put`` and every batch does one numpy matmul
  against it (the canonical small-side-broadcast pattern; no shuffle).
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  (signs of projections) as the shuffle key; per-bucket exact cosine.
  Recall is approximate; multiple hash tables raise it.
- :func:`embedding_near_dup_pairs` — cosine near-duplicate pairs via
  the same hyperplane bucketing.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_LOG = logging.getLogger(__name__)

_LSH_SEED = 7


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def brute_force_topk(ds: "ray.data.Dataset", queries: np.ndarray,
                     query_ids: np.ndarray, k: int = 10,
                     emb_col: str = "embedding",
                     id_col: str = "vec_id") -> "ray.data.Dataset":
    """Exact cosine top-k per query over the dataset.

    Per-batch partial top-k against the broadcast query matrix (one
    matmul), then a tiny final top-k per query — f64 accumulation for
    deterministic ranking.
    """
    qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put((qn, np.asarray(query_ids)))

    def partial(batch: pa.Table) -> pa.Table:
        qn_, qids = ray.get(q_ref)
        m = _emb_matrix(batch, emb_col)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ qn_.T                      # (n, q)
        ids = batch[id_col].to_numpy()
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, q)
        out_q, out_id, out_sim = [], [], []
        for j in range(sims.shape[1]):
            out_q.append(np.full(kk, qids[j]))
            out_id.append(ids[top[:, j]])
            out_sim.append(sims[top[:, j], j])
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_id),
                         "cosine": np.concatenate(out_sim)})

    def final(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["cosine", "neighbor_id"],
                              ascending=[False, True], kind="stable").head(k)
        grp = grp.reset_index(drop=True)
        grp["rnk"] = np.arange(1, len(grp) + 1, dtype=np.int64)
        return grp

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("query_id").map_groups(final, batch_format="pandas")


def lsh_buckets(batch: pa.Table, planes: np.ndarray,
                emb_col: str = "embedding") -> np.ndarray:
    """Hyperplane signature per row → int64 bucket key.

    Projects the RAW (unnormalized) embeddings — the sign of the dot
    product is normalization-invariant, and skipping the division keeps
    the arithmetic reproducible by the SQL oracle."""
    m = _emb_matrix(batch, emb_col)
    signs = (m @ planes.T) > 0                      # (n, p)
    key = np.zeros(len(m), dtype=np.uint64)
    for b in range(planes.shape[0]):
        key |= signs[:, b].astype(np.uint64) << np.uint64(b)
    return key.view(np.int64)


def make_planes(dim: int, num_planes: int = 12) -> np.ndarray:
    """Deterministic Rademacher (±1) hyperplanes derived from the public
    splitmix64 finalizer — sign-LSH quality comparable to Gaussian
    planes, and arithmetically reproducible in the DuckDB oracle
    (``pipelines.sqlgen.rademacher_planes_sql``)."""
    from ..tilemath.hashing import mix64
    u = mix64(np.arange(num_planes * dim, dtype=np.uint64) + 1)
    return np.where((u >> np.uint64(63)).astype(bool), 1.0, -1.0) \
        .reshape(num_planes, dim)


def train_ivf_centroids(sample: np.ndarray, n_lists: int = 16,
                        iters: int = 10, seed: int = 11) -> np.ndarray:
    """Tiny k-means (numpy Lloyd iterations) over a driver-side sample —
    the IVF coarse quantizer.  Deterministic (seeded init)."""
    rng = np.random.default_rng(seed)
    sample = np.asarray(sample, dtype=np.float64)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    cent = sample[rng.choice(len(sample), size=min(n_lists, len(sample)),
                             replace=False)]
    for _ in range(iters):
        sims = sample @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-30)
    return cent


def ivf_topk(ds: "ray.data.Dataset", queries: np.ndarray, query_ids: np.ndarray,
             centroids: np.ndarray, k: int = 10, nprobe: int = 4,
             emb_col: str = "embedding", id_col: str = "vec_id") -> "ray.data.Dataset":
    """IVF approximate top-k: inverted-list shuffle + per-list exact search.

    Scale path for ANN: every vector is routed to its nearest-centroid
    list (the shuffle key); each query probes its ``nprobe`` nearest
    lists.  Per batch, similarities are computed only against the
    queries probing that vector's list, then a tiny global top-k per
    query — recall grows with ``nprobe`` (== n_lists ⇒ exact).
    """
    cnorm = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True),
                                   1e-30)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    probe_lists = np.argsort(-(qn @ cnorm.T), axis=1)[:, :nprobe]   # (q, nprobe)
    # list id → indices of queries probing it
    q_by_list: dict[int, np.ndarray] = {}
    for li in np.unique(probe_lists):
        q_by_list[int(li)] = np.nonzero((probe_lists == li).any(axis=1))[0]
    ref = ray.put((qn, np.asarray(query_ids), cnorm, q_by_list))

    def partial(batch: pa.Table) -> pa.Table:
        qn_, qids, cn_, qbl = ray.get(ref)
        m = _emb_matrix(batch, emb_col)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        ids = batch[id_col].to_numpy()
        vec_list = (m @ cn_.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for li in np.unique(vec_list):
            qidx = qbl.get(int(li))
            if qidx is None:
                continue
            vm = vec_list == li
            sims = m[vm] @ qn_[qidx].T          # (n_li, q_li)
            vids = ids[vm]
            kk = min(k, len(vids))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            for j, qi in enumerate(qidx):
                out_q.append(np.full(kk, qids[qi]))
                out_id.append(vids[top[:, j]])
                out_sim.append(sims[top[:, j], j])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_id),
                         "cosine": np.concatenate(out_sim)})

    def final(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["cosine", "neighbor_id"],
                              ascending=[False, True], kind="stable").head(k)
        grp = grp.reset_index(drop=True)
        grp["rnk"] = np.arange(1, len(grp) + 1, dtype=np.int64)
        return grp

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("query_id").map_groups(final, batch_format="pandas")


def embedding_near_dup_pairs(ds: "ray.data.Dataset", dim: int,
                             cosine_threshold: float = 0.9,
                             num_planes: int = 8,
                             emb_col: str = "embedding",
                             id_col: str = "vec_id",
                             max_pairs_per_bucket: int = 2_000_000
                             ) -> "ray.data.Dataset":
    """Cosine near-dup pairs: hyperplane buckets → exact verify in-bucket
    (distinct-row collapse + tiled matmul + per-bucket pair cap — see
    ``verify``)."""
    planes = make_planes(dim, num_planes)
    p_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        key = lsh_buckets(batch, ray.get(p_ref), emb_col)
        m = _emb_matrix(batch, emb_col)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), m.shape[1])
        return pa.table({id_col: batch[id_col], "bucket": key, "nemb": emb,
                         "dim": np.full(batch.num_rows, m.shape[1], np.int32)})

    from .dedup import bounded_triu_pairs

    def verify(grp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64)})
        if len(grp) < 2:
            return empty
        ids = grp[id_col].to_numpy()
        d = int(grp["dim"].iloc[0])
        m = np.stack(grp["nemb"].to_numpy()).reshape(len(ids), d)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        # degenerate-bucket safety: collapse byte-identical rows (an
        # all-identical corpus is one distinct vector), run the matmul
        # over DISTINCT rows in bounded 2048² tiles, cap the id-pair
        # expansion (bounded-output contract like minhash_lsh_pairs)
        mv = np.ascontiguousarray(m).view(
            np.dtype((np.void, m.dtype.itemsize * d))).reshape(-1)
        uniq, inv = np.unique(mv, return_inverse=True)
        vorder = np.argsort(inv, kind="stable")
        vstarts = np.concatenate(
            [[0], np.flatnonzero(np.diff(inv[vorder]) != 0) + 1])
        vcounts = np.diff(np.concatenate([vstarts, [len(ids)]]))
        um = m[vorder[vstarts]]
        D = len(um)
        out_a, out_b = [], []
        budget = max_pairs_per_bucket
        clipped = False          # a pair that SHOULD exist was dropped

        def emit(va: int, vb: int):
            nonlocal budget, clipped
            if budget <= 0:
                clipped = True
                return
            ga = ids[vorder[vstarts[va]:vstarts[va] + vcounts[va]]]
            if va == vb:
                full = len(ga) * (len(ga) - 1) // 2
                ia0, ib0 = bounded_triu_pairs(len(ga), budget)
                a, b = ga[ia0], ga[ib0]
            else:
                gb = ids[vorder[vstarts[vb]:vstarts[vb] + vcounts[vb]]]
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
            budget -= len(a)

        # identical rows: cosine exactly 1 ≥ threshold
        dup_vs = np.flatnonzero(vcounts > 1)
        for j, v in enumerate(dup_vs):
            emit(int(v), int(v))
            if budget <= 0:
                clipped |= j + 1 < len(dup_vs)
                break
        T = 2048
        for s0 in range(0, D, T):
            if budget <= 0:
                clipped = True       # unscanned tiles remain
                break
            for s1 in range(s0, D, T):
                if budget <= 0:
                    clipped = True   # unscanned tiles remain
                    break
                sims = um[s0:s0 + T] @ um[s1:s1 + T].T
                ra, rb = np.nonzero(sims >= cosine_threshold)
                if s0 == s1:
                    k2 = ra < rb
                    ra, rb = ra[k2], rb[k2]
                for j, (va, vb) in enumerate(zip(ra, rb)):
                    emit(int(s0 + va), int(s1 + vb))
                    if budget <= 0:
                        clipped |= j + 1 < len(ra)
                        break
        if clipped:
            # no silent caps: dense bucket beyond the pair budget → the
            # truncation is observable, not silent (a budget exhausted
            # exactly by the final legitimate pair does NOT warn)
            _LOG.warning(
                "embedding_near_dup_pairs: bucket with %d rows exhausted "
                "max_pairs_per_bucket=%d; pair output truncated",
                len(ids), max_pairs_per_bucket)
        if not out_a:
            return empty
        # ids only: the cosine value itself is float-op-order sensitive
        # (engine matmul vs oracle list_cosine_similarity); membership at
        # the threshold is the checked contract
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF with a persisted list-partitioned layout (the real scale path)
# ---------------------------------------------------------------------------


def ivf_build_index(ds: "ray.data.Dataset", centroids: np.ndarray,
                    out_dir: str, emb_col: str = "embedding",
                    id_col: str = "vec_id") -> dict:
    """Route every vector to its nearest-centroid list ONCE and persist a
    list-partitioned parquet layout (``out_dir/list=<i>/part.parquet``).

    This is the piece ``ivf_topk`` lacks at cluster scale: there, every
    query wave re-touches every block; here the routing shuffle runs
    once at build time and search I/O is proportional to ``nprobe``,
    not to the collection size.  Normalized embeddings are stored so
    search skips renormalization.
    """
    import os

    import pyarrow.parquet as pq

    from .exchange import exchange_reduce

    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    c_ref = ray.put(cn)
    n_lists = len(cn)
    os.makedirs(out_dir, exist_ok=True)
    # a REBUILD into the same dir must not leave stale list files behind:
    # a list that is non-empty under the old quantizer but empty under
    # the new one would otherwise keep serving the old vectors to
    # ivf_search_index's glob
    import glob as _glob
    import shutil as _shutil
    for stale in _glob.glob(os.path.join(out_dir, "list=*")):
        _shutil.rmtree(stale, ignore_errors=True)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "nemb": pa.array([], pa.list_(pa.float64())),
                             "part": pa.array([], pa.int64())})
        m = _emb_matrix(batch, emb_col)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        part = (m @ ray.get(c_ref).T).argmax(axis=1).astype(np.int64)
        off = pa.array(np.arange(batch.num_rows + 1, dtype=np.int32)
                       * m.shape[1])
        emb = pa.ListArray.from_arrays(off, pa.array(m.reshape(-1)))
        return pa.table({id_col: batch[id_col], "nemb": emb,
                         "part": pa.array(part)})

    def write_list(tbl: pa.Table, part_id: int) -> pa.Table:
        n = tbl.num_rows
        if n:
            path = os.path.join(out_dir, f"list={part_id}")
            os.makedirs(path, exist_ok=True)
            pq.write_table(tbl.drop_columns(["part"]),
                           os.path.join(path, "part.parquet"))
        return pa.table({"ivf_list": pa.array([part_id], pa.int64()),
                         "n_vectors": pa.array([n], pa.int64())})

    stats = exchange_reduce(ds.map_batches(assign, batch_format="pyarrow"),
                            n_lists, write_list, pass_part=True).to_pandas()
    return {"out_dir": out_dir, "n_lists": n_lists,
            "list_sizes": dict(zip(stats["ivf_list"], stats["n_vectors"]))}


def ivf_search_index(index_dir: str, queries: np.ndarray,
                     query_ids: np.ndarray, centroids: np.ndarray,
                     k: int = 10, nprobe: int = 4,
                     id_col: str = "vec_id") -> "ray.data.Dataset":
    """Search a persisted IVF layout: read ONLY the ``nprobe`` probed
    lists' files per query set (I/O ∝ probed fraction), exact cosine
    within each list, tiny global top-k per query."""
    import os

    import ray.data

    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
    q_by_list = {int(li): np.nonzero((probe == li).any(axis=1))[0]
                 for li in np.unique(probe)}
    import glob as _glob
    paths = [f for li in sorted(q_by_list)
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"list={li}", "*.parquet")))]
    ref = ray.put((qn, np.asarray(query_ids), q_by_list, cn))

    def search(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        qn_, qids, qbl, cn_ = ray.get(ref)
        m = _emb_matrix(batch, "nemb")
        ids = batch[id_col].to_numpy()
        # stored pre-normalized; re-derive each row's list id from the
        # quantizer (a batch may span two list files)
        vec_list = (m @ cn_.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for li in np.unique(vec_list):
            qidx = qbl.get(int(li))
            if qidx is None:
                continue
            vm = vec_list == li
            sims = m[vm] @ qn_[qidx].T
            vids = ids[vm]
            kk = min(k, len(vids))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            for j, qi in enumerate(qidx):
                out_q.append(np.full(kk, qids[qi]))
                out_id.append(vids[top[:, j]])
                out_sim.append(sims[top[:, j], j])
        if not out_q:
            return empty
        return pa.table({"query_id": np.concatenate(out_q),
                         "neighbor_id": np.concatenate(out_id),
                         "cosine": np.concatenate(out_sim)})

    def final(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["cosine", "neighbor_id"],
                              ascending=[False, True], kind="stable").head(k)
        grp = grp.reset_index(drop=True)
        grp["rnk"] = np.arange(1, len(grp) + 1, dtype=np.int64)
        return grp

    ds = ray.data.read_parquet(paths)
    return ds.map_batches(search, batch_format="pyarrow") \
        .groupby("query_id").map_groups(final, batch_format="pandas")
