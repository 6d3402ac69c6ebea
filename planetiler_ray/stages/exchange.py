"""Explicit partition exchange: the engine's main shuffle.

Fragments leave the render fan-out already carrying their Hilbert
range-partition id (``part``), so a full sort-based ``groupby`` — which
re-samples and re-sorts the key — is wasted work.  This module
implements the classic map-side-partition / reduce-side-merge exchange
(exactly what the reference's external merge sort achieves on disk,
``collection/ExternalMergeSort.java``) with Ray core primitives:

  map:    every fan-out block is split by ``part`` into P sub-tables
          (one vectorized argsort + slice per block)
  reduce: task p concatenates its P-th piece of every block and runs
          the per-partition reduce

On a multi-node cluster the pieces move point-to-point through the
object store exactly like any Ray shuffle; there is no central sorter.
Skew is handled upstream by the equal-frequency Hilbert bounds (dense
key ranges → narrower partitions).

At large block × partition products the flat exchange would make the
driver hold B×P piece refs (10⁵ blocks × 10³ partitions = 10⁸ refs).
Above ``two_level_threshold`` pieces the exchange switches to the
SEGMENTED form: the driver never sees a piece ref at all.  Splitter
ACTORS launch the map-side split sub-tasks and therefore OWN the
per-bucket piece refs (Ray task returns are owned by their caller);
one bucket-coordinator task per ~√P-partition bucket then pulls its
piece-ref lists straight from the splitter actors, runs the level-2
split and the per-partition tree reduce as its own sub-tasks, and
streams the finished partitions back as ordinary driver-owned task
returns.  Peak driver-held refs are O(splitters + buckets + P
outputs) — independent of the block count, the same property as the
reference's external merge sort, whose chunks own their files and
never centralize handles (``collection/ExternalMergeSort.java:84-128``).

This is the one place the engine drops below the Dataset API — the
Dataset ``groupby`` cannot express "rows are already partitioned;
just exchange them".  Input and output are still Datasets.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _split_block(num_targets: int, key_offset: int, key_div: int,
                 map_fn, *tbls: pa.Table) -> list[pa.Table]:
    """Split one or more blocks into per-target sub-tables (vectorized).

    Target of a row = ``(part - key_offset) // key_div`` — identity for
    the flat exchange, the coarse bucket id for level 1 of the two-level
    exchange, the bucket-local partition for level 2.  Several small
    input blocks may arrive per task (the driver groups tiny blocks so
    split-task count tracks data volume, not upstream block count).

    ``map_fn`` (map-side shuffle-write fusion): when given, each input
    block is mapped through it FIRST — for a fan-out map this means the
    multiplied fragment stream is born, partitioned and returned in one
    task, never round-tripping the object store between the map and the
    split (the dominant shuffle traffic at high parallelism).

    Fan-out batches arrive pre-sorted by ``part``; blocks concatenating
    several batches are near-sorted, so skip the argsort when possible
    and slice zero-copy.
    """
    if map_fn is not None:
        # map only non-empty blocks (schema-less empties can't be mapped)
        mapped = tuple(map_fn(t) for t in tbls if t.num_rows)
        if not mapped:
            # all inputs empty: push ONE typed empty through map_fn so
            # the empty pieces carry the POST-map schema — reduce_fn of
            # an empty partition must see the same columns as a live one
            typed = next((t for t in tbls if t.num_columns), None)
            mapped = (map_fn(typed.slice(0, 0)),) if typed is not None \
                else tbls
        tbls = mapped
    live = [t for t in tbls
            if t.num_rows and "part" in t.schema.names]
    if not live:
        # Ray Data passes 0-row blocks through map_batches without
        # calling the UDF, producing schema-less empties — route one
        # (harmless) empty piece to every target
        empty = next((t.slice(0, 0) for t in tbls if t.num_columns),
                     tbls[0].slice(0, 0))
        return [empty] * num_targets
    tbl = live[0] if len(live) == 1 else pa.concat_tables(live)
    part = tbl.column("part").to_numpy()
    if bool((np.diff(part) >= 0).all()):
        sorted_tbl, sp = tbl, part
    else:
        order = np.argsort(part, kind="stable")
        sorted_tbl = tbl.take(pa.array(order))
        sp = part[order]
    key = (sp - key_offset) // key_div if (key_offset or key_div != 1) else sp
    # boundaries of each target id within the sorted block
    starts = np.searchsorted(key, np.arange(num_targets + 1))
    out = []
    for p in range(num_targets):
        lo, hi = int(starts[p]), int(starts[p + 1])
        out.append(sorted_tbl.slice(lo, hi - lo))
    return out


def _merge_tables(tables):
    live = [t for t in tables if t.num_rows]
    if live:
        return pa.concat_tables(live)
    # all empty: prefer a typed empty over a schema-less one
    return next((t for t in tables if t.num_columns), tables[0])


def _combine_task(*tables: pa.Table) -> pa.Table:
    return _merge_tables(tables)


def _reduce_task(reduce_fn, pass_part: bool, part_id: int,
                 *tables: pa.Table) -> pa.Table:
    merged = _merge_tables(tables)
    return reduce_fn(merged, part_id) if pass_part else reduce_fn(merged)


class _Splitter:
    """Map-side owner of one shard of the segmented exchange.

    A zero-CPU coordinator actor: ``submit`` launches the split
    sub-tasks for its assigned block groups (so THIS process — which
    stays alive for the whole exchange — owns the piece refs, not the
    driver) and files the per-bucket piece refs; bucket-coordinator
    tasks later collect them with ``get_bucket``.  Actor-task ordering
    guarantees every ``get_bucket`` issued after the driver has awaited
    ``flush`` sees the complete piece lists.
    """

    def __init__(self, n_buckets: int, bucket_size: int, map_fn_box):
        self._n = n_buckets
        self._div = bucket_size
        self._map_ref = map_fn_box[0] if map_fn_box else None
        self._pieces: list[list] = [[] for _ in range(n_buckets)]

    def submit(self, groups: list) -> None:
        split = _remotes()["split"]
        for refs in groups:
            out = split.options(num_returns=self._n, **_slot_options()) \
                .remote(self._n, 0, self._div, self._map_ref, *refs)
            if self._n == 1:
                out = [out]
            for g, r in enumerate(out):
                self._pieces[g].append(r)

    def flush(self) -> int:
        return sum(len(p) for p in self._pieces)

    def get_bucket(self, g: int) -> list:
        return self._pieces[g]


def _bucket_reduce(reduce_fn_box, pass_part: bool, p_lo: int,
                   run_parts: list, n_local: int, max_fanin: int,
                   g: int, *splitters):
    """Reduce-side coordinator for one bucket of the segmented exchange.

    Owns every intermediate this bucket creates: pulls the bucket's
    piece-ref lists from the splitter actors (small lists of refs),
    launches the level-2 split + per-partition tree reduce as sub-tasks
    of THIS worker, then yields the finished partition tables one at a
    time — a static-``num_returns`` generator, so each output is
    serialized into a driver-owned return object and freed from this
    worker's heap before the next is fetched.
    """
    split = _remotes()["split"]
    combine = _remotes()["combine"]
    reduce_task = _remotes()["reduce"]
    rf_ref = reduce_fn_box[0]
    lists = ray.get([s.get_bucket.remote(g) for s in splitters])
    pieces = [r for lst in lists for r in lst]
    # level-2 split: bounded piece fan-in per sub-task keeps argument
    # lists and concat widths small at any upstream block count
    subs = []
    for i in range(0, len(pieces), 16):
        out = split.options(num_returns=n_local, **_slot_options()) \
            .remote(n_local, p_lo, 1, None, *pieces[i:i + 16])
        subs.append([out] if n_local == 1 else list(out))
    outs = []
    for p in run_parts:
        refs = [s[p - p_lo] for s in subs]
        while len(refs) > max_fanin:
            refs = [combine.options(**_slot_options())
                    .remote(*refs[i:i + max_fanin])
                    for i in range(0, len(refs), max_fanin)]
        outs.append(reduce_task.options(**_slot_options()).remote(
            rf_ref, pass_part, p, *refs))
    for o in outs:
        yield ray.get(o)


_REMOTE_CACHE: dict = {}


def _session_cache() -> dict:
    """``_REMOTE_CACHE`` scoped to the CURRENT Ray session: cached remote
    handles and the slot-resource lookup from a previous
    ``ray.init``/``ray.shutdown`` cycle are stale — a cached
    ``exchange_slots`` requirement from cluster A would make every
    exchange task unschedulable (hang forever) on a later cluster B
    that doesn't declare the resource."""
    try:
        sess = ray.get_runtime_context().get_job_id()
    except Exception:
        sess = None
    if _REMOTE_CACHE.get("session") != sess:
        _REMOTE_CACHE.clear()
        _REMOTE_CACHE["session"] = sess
    return _REMOTE_CACHE


def _slot_options() -> dict:
    """Per-node cap on concurrent exchange tasks via the optional
    ``exchange_slots`` custom resource.

    Exchange tasks (split / combine / reduce) are memory-bandwidth
    heavy: on this class of host, >4 concurrent ~200 MB sort+serialize
    tasks collapse aggregate bandwidth (measured 8.5× slower at 8
    concurrent than at 4).  A deployment that declares
    ``resources={"exchange_slots": K}`` per node caps them at K per
    node while leaving the remaining CPUs to compute stages — the
    shuffle analog of capping transfer threads per node.  When the
    resource is absent (tests, driver sessions) tasks run unrestricted.
    """
    cache = _session_cache()
    if "slots" not in cache:
        try:
            has = "exchange_slots" in ray.cluster_resources()
        except Exception:
            has = False
        cache["slots"] = (
            {"resources": {"exchange_slots": 1}} if has else {})
    return cache["slots"]


def _remotes() -> dict:
    """Remote handles created ONCE per session: a fresh ``ray.remote``
    per ``exchange_reduce`` call would mint a new function id each
    call and re-export it to every worker (measured ~0.1–1 s per
    exchange on a 32-worker session).  ``reduce_fn`` travels as a
    ``ray.put`` ref argument instead of a closure so one exported
    function serves every exchange."""
    cache = _session_cache()
    if "split" not in cache:
        cache["split"] = ray.remote(_split_block)
        cache["combine"] = ray.remote(_combine_task)
        cache["reduce"] = ray.remote(_reduce_task)
        cache["splitter_actor"] = ray.remote(num_cpus=0)(_Splitter)
        cache["bucket_reduce"] = ray.remote(_bucket_reduce)
    return cache


def exchange_reduce(frags: "ray.data.Dataset", num_partitions: int,
                    reduce_fn: Callable[..., pa.Table],
                    parts_to_run: np.ndarray | None = None,
                    pass_part: bool = False,
                    max_fanin: int = 64,
                    two_level_threshold: int = 65536,
                    materialize: bool = True,
                    map_fn: Callable[[pa.Table], pa.Table] | None = None,
                    map_target_rows: int | None = None) -> "ray.data.Dataset":
    """Exchange fan-out blocks by precomputed ``part`` and reduce each.

    ``parts_to_run``: optional subset of partition ids (resume support —
    completed partitions are skipped without touching their pieces).
    ``pass_part``: call ``reduce_fn(table, part_id)`` (checkpoint writers
    need the id even for empty partitions).
    ``max_fanin``: a reduce (or intermediate combine) task never takes
    more than this many piece refs — with more blocks than that, a tree
    of combine tasks merges pieces level by level, so reduce-task
    argument lists and single concat widths stay bounded at any block
    count (the segmented-merge analog of the reference's k-way
    ``LongMerger``).
    ``two_level_threshold``: when blocks × partitions exceeds this,
    switch from the flat exchange to the SEGMENTED exchange (see
    module docstring): splitter actors own the piece refs and
    per-bucket coordinator tasks own the reduce intermediates, so the
    driver never materializes any piece-ref matrix at all.
    ``materialize``: wait for the reduce tasks and return a concrete
    Dataset (default — see the NOTE below for why); pass False to get
    the lazy ref Dataset instead when composing exchanges under memory
    pressure (escape hatch: the lazy consumption path pays a measured
    6–12 s streaming-executor backoff on this Ray version).
    ``map_fn``: map-side shuffle-write fusion — each split task maps its
    input blocks through this BEFORE partitioning, so a row-multiplying
    map (tile fan-out) streams straight into the partition pieces
    without an intermediate object-store round trip.  ``frags`` is then
    the PRE-map dataset; size split tasks with ``map_target_rows``
    (pre-map rows per task, default ``target_rows`` — set it so
    rows × fan-out factor stays a bounded piece payload).
    Returns a Dataset of the concatenated reduce outputs.
    """
    # stream blocks out of the fan-out as they complete and launch their
    # split tasks immediately — overlaps the map side with the exchange
    # (no barrier until the reduce, which inherently needs every piece).
    # Tiny upstream blocks (e.g. out of a per-group stage) are grouped
    # into one split task each, so task and piece counts track data
    # volume, not upstream block count.
    split = _remotes()["split"]
    reduce_fn_ref = ray.put(reduce_fn)
    map_fn_ref = ray.put(map_fn) if map_fn is not None else None

    def launch_split(refs, n, offset=0, div=1, mf=None):
        out = split.options(num_returns=n, **_slot_options()) \
            .remote(n, offset, div, mf, *refs)
        return [out] if n == 1 else out

    # rows per split task: interleaved A/B at 8 cpus measured 262144
    # consistently ~15-30% faster than 65536 on the headline pyramid
    # (fewer split tasks and 4x fewer piece refs per reduce fan-in);
    # 1048576 regressed (map->split overlap starves).  ~10-15 MB of
    # fragment rows per split task — small vs worker heap at any scale.
    import os
    target_rows = int(os.environ.get("GRAFT_EXCHANGE_TARGET_ROWS", "262144"))
    two_level_threshold = int(os.environ.get(
        "GRAFT_EXCHANGE_SEGMENT_THRESHOLD", two_level_threshold))
    if map_fn is not None:
        target_rows = map_target_rows or target_rows
    block_groups: list[list] = []
    cur: list = []
    cur_rows = 0
    for bundle in frags.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            rows = meta.num_rows if meta.num_rows is not None else target_rows
            cur.append(block_ref)
            cur_rows += rows
            if cur_rows >= target_rows or len(cur) >= 64:
                block_groups.append(cur)
                cur, cur_rows = [], 0
    if cur:
        block_groups.append(cur)
    n_blocks = len(block_groups)
    if n_blocks == 0:
        return ray.data.from_items([])

    combine = _remotes()["combine"]
    reduce_task = _remotes()["reduce"]

    run = sorted(range(num_partitions) if parts_to_run is None
                 else [int(p) for p in parts_to_run])

    def tree_reduce(p: int, refs: list) -> "ray.ObjectRef":
        while len(refs) > max_fanin:
            refs = [combine.options(**_slot_options())
                    .remote(*refs[i:i + max_fanin])
                    for i in range(0, len(refs), max_fanin)]
        return reduce_task.options(**_slot_options()).remote(
            reduce_fn_ref, pass_part, p, *refs)

    # NOTE on the materialize() below: the exchange output refs are the
    # reduce tasks' results — already concrete object-store blocks, the
    # reduce is inherently a barrier.  Returning the ref dataset LAZY
    # makes every later consumption (another exchange, a count, a
    # to_pandas) run a streaming executor over still-pending refs, and
    # that executor's no-CPU backoff loop measured 6–12 s of pure wait
    # on this Ray version (line_tile_summary: 12 s lazy vs 1.8 s
    # materialized, idle host).  materialize() just waits for the tasks
    # and wraps their metadata; blocks stay in (spillable) object store
    # exactly as a shuffle output would.
    out_refs = []
    if n_blocks * num_partitions <= two_level_threshold or num_partitions < 4:
        # flat exchange: one split per block group, B×P refs is affordable
        pieces = [launch_split(grp, num_partitions, mf=map_fn_ref)
                  for grp in block_groups]
        for p in run:
            out_refs.append(tree_reduce(p, [pieces[b][p]
                                            for b in range(n_blocks)]))
        ds = ray.data.from_arrow_refs(out_refs)
        return ds.materialize() if materialize else ds

    # segmented: splitter actors own the piece refs, bucket coordinator
    # tasks own the reduce-side intermediates — the driver touches only
    # O(splitters + buckets + P output) refs at any block count.
    # Fault-tolerance note: a lost splitter actor loses its owned
    # pieces (no automatic method replay); a production deployment
    # would re-run the exchange from the (resumable, checkpointed)
    # consumer — the same contract as the reference's external sort,
    # which restarts a chunk whose file is gone.
    bucket_size = max(1, math.ceil(math.sqrt(num_partitions)))
    n_buckets = math.ceil(num_partitions / bucket_size)
    try:
        avail = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        avail = 8
    n_splitters = max(2, min(n_blocks, avail))
    splitter_cls = _remotes()["splitter_actor"]
    map_box = [map_fn_ref] if map_fn_ref is not None else None
    splitters = [splitter_cls.remote(n_buckets, bucket_size, map_box)
                 for _ in range(n_splitters)]
    SUBMIT_CHUNK = 32
    submit_refs = []
    for ci, i in enumerate(range(0, n_blocks, SUBMIT_CHUNK)):
        submit_refs.append(splitters[ci % n_splitters].submit.remote(
            block_groups[i:i + SUBMIT_CHUNK]))
    # barrier: all submits processed before any bucket task asks for
    # pieces (flush is ordered after this caller's submits per actor).
    # The submit refs themselves are fetched too — a submit that raised
    # must fail the exchange here, not silently drop its 32 block
    # groups from the reduce (O(blocks/32) refs, transient).
    ray.get(submit_refs)
    del submit_refs
    ray.get([s.flush.remote() for s in splitters])
    del block_groups             # driver releases its input-ref list
    bucket_remote = _remotes()["bucket_reduce"]
    rf_box = [reduce_fn_ref]
    run_arr = np.asarray(run, np.int64)
    for g in range(n_buckets):
        p_lo = g * bucket_size
        p_hi = min(p_lo + bucket_size, num_partitions)
        local = [int(p) for p in run_arr[(run_arr >= p_lo)
                                         & (run_arr < p_hi)]]
        if not local:
            continue
        r = bucket_remote.options(num_returns=len(local)).remote(
            rf_box, pass_part, p_lo, local, p_hi - p_lo, max_fanin,
            g, *splitters)
        out_refs.extend([r] if len(local) == 1 else list(r))
    if materialize:
        ds = ray.data.from_arrow_refs(out_refs).materialize()
    else:
        # outputs are driver-owned task returns, but the splitter
        # actors must outlive the bucket tasks — wait (without
        # fetching) before releasing them, then hand back the lazy ds
        ray.wait(out_refs, num_returns=len(out_refs), fetch_local=False)
        ds = ray.data.from_arrow_refs(out_refs)
    for s in splitters:
        ray.kill(s)
    return ds
