"""Upfront resource estimation with fail-fast limit checks.

The reference sizes every phase before starting and refuses to run a
job that cannot fit unless ``--force`` is given
(``Planetiler.java:998-1065`` ``checkDiskSpace``/``checkMemory`` +
``util/ResourceUsage.java``).  The Ray-native analog estimates the
pyramid's shuffle and reduce working sets from the input row count
and a MEASURED sample fan-out (run the real render kernel over a
small sample instead of guessing a multiplier), then checks them
against the cluster's object-store capacity and per-worker heap.

Usage::

    est = estimate_pyramid(images, cfg, num_partitions=64)
    est.check_against_limits()        # raises ResourceLimitError
    print(est.summary())
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# measured wire widths (stages/exchange.py round-4 slimming)
FRAGMENT_ROW_BYTES = 35          # sort_key + local gid + 4×int16 coords + keys
REDUCE_EXPANSION = 3.0           # concat + decode + encode transient factor


class ResourceLimitError(RuntimeError):
    pass


@dataclass
class ResourceEstimate:
    """One phase's resource plan (``ResourceUsage.java`` analog)."""
    input_rows: int
    sampled_rows: int
    fanout_factor: float
    fragment_rows: int
    shuffle_bytes: int
    per_partition_bytes: int
    num_partitions: int
    object_store_bytes: int
    worker_heap_bytes: int
    warnings: list[str] = field(default_factory=list)

    def check_against_limits(self, force: bool = False) -> None:
        """Fail fast when the plan exceeds capacity
        (``ResourceUsage.checkAgainstLimits``); ``force`` downgrades
        hard failures to warnings like the reference's ``--force``."""
        errs = []
        if self.shuffle_bytes > self.object_store_bytes:
            errs.append(
                f"shuffle needs ~{self.shuffle_bytes / 1e9:.1f} GB but the "
                f"object store holds {self.object_store_bytes / 1e9:.1f} GB "
                f"(spilling will dominate; raise num_partitions/nodes)")
        reduce_need = int(self.per_partition_bytes * REDUCE_EXPANSION)
        if reduce_need > self.worker_heap_bytes:
            errs.append(
                f"one reduce partition needs ~{reduce_need / 1e9:.1f} GB "
                f"transient heap but a worker has "
                f"{self.worker_heap_bytes / 1e9:.1f} GB — raise "
                f"num_partitions above {self.num_partitions}")
        soft = [w for w in (
            f"shuffle uses {100 * self.shuffle_bytes / max(self.object_store_bytes, 1):.0f}%"
            f" of the object store" if self.shuffle_bytes
            > 0.8 * self.object_store_bytes else None,) if w]
        self.warnings.extend(soft)
        if errs and not force:
            raise ResourceLimitError("; ".join(errs))
        self.warnings.extend(errs)

    def summary(self) -> dict:
        return {
            "input_rows": self.input_rows,
            "fanout_factor": round(self.fanout_factor, 3),
            "fragment_rows_est": self.fragment_rows,
            "shuffle_gb_est": round(self.shuffle_bytes / 1e9, 3),
            "per_partition_mb_est": round(self.per_partition_bytes / 1e6, 1),
            "num_partitions": self.num_partitions,
            "warnings": list(self.warnings),
        }


def estimate_pyramid(images, cfg, num_partitions: int,
                     sample_rows: int = 2048) -> ResourceEstimate:
    """Estimate the pyramid build from a measured sample fan-out.

    Runs the REAL render kernel (``stages.render.render_fanout``) over
    up to ``sample_rows`` input rows with single-partition bounds and
    scales the observed fragment multiplier to the full input — the
    engine's equivalent of the reference's input-size-proportional
    heuristics, but measured rather than assumed.
    """
    import ray
    import pyarrow as pa

    from ..stages.georef import georef_batch
    from ..stages.render import render_fanout

    n_rows = images.count()
    k = int(min(sample_rows, n_rows))
    frag_rows = 0
    if k > 0:
        # evenly-spaced rows from EVERY batch, not limit(k): inputs are
        # usually hilbert/id-sorted, so a head sample measures one
        # region's fan-out and extrapolates it to the planet
        stride = max(1, int(n_rows) // k)

        def spread(b: pa.Table) -> pa.Table:
            return b.take(pa.array(np.arange(0, b.num_rows, stride)))

        sampled = pa.concat_tables(
            [ray.get(r) for r in images.select_columns(["image_id"])
             .map_batches(spread, batch_format="pyarrow").to_arrow_refs()])
        if sampled.num_rows > k:
            sampled = sampled.take(pa.array(
                np.linspace(0, sampled.num_rows - 1, k).astype(np.int64)))
        k = sampled.num_rows
        frag_rows = render_fanout(georef_batch(sampled), cfg,
                                  slim=True).num_rows
    factor = frag_rows / max(k, 1)
    total_frags = int(n_rows * factor)
    shuffle_bytes = total_frags * FRAGMENT_ROW_BYTES
    try:
        res = ray.cluster_resources()
        store = int(res.get("object_store_memory", 2 << 30))
        cpus = max(int(res.get("CPU", 8)), 1)
        heap = int(res.get("memory", 8 << 30)) // cpus
    except Exception:
        store, heap = 2 << 30, 1 << 30
    return ResourceEstimate(
        input_rows=int(n_rows), sampled_rows=k, fanout_factor=factor,
        fragment_rows=total_frags, shuffle_bytes=shuffle_bytes,
        per_partition_bytes=shuffle_bytes // max(num_partitions, 1),
        num_partitions=num_partitions,
        object_store_bytes=store, worker_heap_bytes=heap)
