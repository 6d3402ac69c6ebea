"""Measure what the DRIVER holds during an exchange: peak Ray object
refs known to the driver core worker + peak driver RSS.

Evidence for the segmented exchange's scale claim: the flat exchange
makes the driver own B×P piece refs, the segmented exchange keeps the
driver at O(splitters + buckets + P outputs) regardless of block
count.  Run:

    python tools/exchange_driver_refs.py            # full matrix
    python tools/exchange_driver_refs.py --quick    # small matrix

Prints one JSON line per (mode, B, P) cell; paste the table into
BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


class Sampler(threading.Thread):
    def __init__(self, core_worker, interval=0.25):
        super().__init__(daemon=True)
        self.cw = core_worker
        self.interval = interval
        self.peak_refs = 0
        self.peak_rss = 0.0
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            try:
                n = len(self.cw.get_all_reference_counts())
            except Exception:
                n = 0
            self.peak_refs = max(self.peak_refs, n)
            self.peak_rss = max(self.peak_rss, _rss_mb())
            time.sleep(self.interval)

    def stop(self):
        self._halt.set()
        self.join()


def run_cell(mode: str, n_groups: int, num_partitions: int,
             rows_per_block: int = 1000) -> dict:
    import ray
    import ray.data as rd

    from planetiler_ray.stages.exchange import exchange_reduce

    # force one split-task group per upstream block so B is exact
    os.environ["GRAFT_EXCHANGE_TARGET_ROWS"] = str(rows_per_block)
    os.environ["GRAFT_EXCHANGE_SEGMENT_THRESHOLD"] = (
        "1" if mode == "segmented" else str(1 << 62))

    n = n_groups * rows_per_block
    P = num_partitions

    def mk(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy()
        return pa.table({
            "part": pa.array(((i * 2654435761) >> 8) % P),
            "val": pa.array(i.astype(np.int64)),
        })

    def red(t: pa.Table) -> pa.Table:
        v = t["val"].to_numpy() if t.num_rows else np.empty(0, np.int64)
        p = t["part"].to_numpy()[:1] if t.num_rows else np.empty(0, np.int64)
        return pa.table({"part": pa.array(p),
                         "n": pa.array([len(v)][:len(p)]),
                         "s": pa.array([int(v.sum())][:len(p)])})

    frags = rd.range(n, override_num_blocks=n_groups) \
        .map_batches(mk, batch_format="pyarrow", batch_size=rows_per_block) \
        .materialize()

    cw = ray._private.worker.global_worker.core_worker
    base_refs = len(cw.get_all_reference_counts())
    sampler = Sampler(cw)
    sampler.start()
    t0 = time.perf_counter()
    out = exchange_reduce(frags, P, red)
    total = out.to_pandas()
    wall = time.perf_counter() - t0
    sampler.stop()
    assert int(total["n"].sum()) == n, (int(total["n"].sum()), n)
    return {"mode": mode, "blocks": n_groups, "partitions": P,
            "baseline_refs": base_refs,
            "peak_refs": sampler.peak_refs,
            "peak_rss_mb": round(sampler.peak_rss, 1),
            "wall_s": round(wall, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")

    P = 256 if args.quick else 1024
    sizes = [64, 128] if args.quick else [128, 256, 512]
    cells = []
    for b in sizes:
        for mode in ("flat", "segmented"):
            cell = run_cell(mode, b, P)
            cells.append(cell)
            print(json.dumps(cell), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
