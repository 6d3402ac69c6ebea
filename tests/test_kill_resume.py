"""Mid-run kill + resume (FIXTURES.md §4): a checkpointed build killed
while partitions are completing must resume, skip finished partitions,
and produce identical output to an uninterrupted run."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SCRIPT = """
import sys, os
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from planetiler_ray import fixtures
from planetiler_ray.pipelines.tiles import build_pyramid
from planetiler_ray.stages.render import RenderConfig

n = 4000
path = fixtures.images_parquet(n, with_bytes=False)
ds = rd.read_parquet(path, columns=["image_id"])
summary = build_pyramid(ds, fixtures.image_ids(n), RenderConfig(0, 9),
                        num_partitions=12, checkpoint_dir={ckpt!r})
print("SUMMARY", summary)
ray.shutdown()
"""


def _run(ckpt: str, kill_after_parts: int | None = None):
    proc = subprocess.Popen([sys.executable, "-c",
                             RUN_SCRIPT.format(repo=REPO, ckpt=ckpt)],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    if kill_after_parts is None:
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out
        return out
    # poll the checkpoint dir; kill as soon as >= k partitions committed
    from planetiler_ray.state.checkpoint import CheckpointStore
    store = CheckpointStore(ckpt)
    deadline = time.time() + 300
    while time.time() < deadline:
        if len(store.completed_parts()) >= kill_after_parts:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
            return None
        if proc.poll() is not None:
            pytest.skip("run finished before the kill threshold was reached")
        time.sleep(0.05)
    proc.kill()
    raise TimeoutError("no partitions completed in time")


def test_checkpoint_requires_exchange_shuffle(ray_session, tmp_path):
    """checkpoint_dir + shuffle='groupby' must fail loudly — the
    cross-check path has no checkpoint/resume support and used to
    silently return an unresumable lazy Dataset."""
    import ray.data as rd

    from planetiler_ray import fixtures
    from planetiler_ray.pipelines.tiles import build_pyramid
    from planetiler_ray.stages.render import RenderConfig

    path = fixtures.images_parquet(50, with_bytes=False)
    ds = rd.read_parquet(path, columns=["image_id"])
    with pytest.raises(ValueError, match="checkpoint_dir"):
        build_pyramid(ds, fixtures.image_ids(50), RenderConfig(0, 3),
                      num_partitions=4,
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      shuffle="groupby")


def test_kill_mid_run_then_resume(tmp_path, ray_session):
    ckpt = str(tmp_path / "killed")
    _run(ckpt, kill_after_parts=3)

    from planetiler_ray.state.checkpoint import CheckpointStore
    store = CheckpointStore(ckpt)
    done_after_kill = store.completed_parts()
    assert 3 <= len(done_after_kill) < 12
    mtimes = {p: os.path.getmtime(os.path.join(store.part_dir(p), "data.parquet"))
              for p in done_after_kill}

    # resume in a fresh process
    out = _run(ckpt)
    assert "SUMMARY" in out
    assert len(store.completed_parts()) == 12
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(store.part_dir(p),
                                             "data.parquet")) == m, \
            f"partition {p} was recomputed after resume"

    # resumed output equals an uninterrupted run
    clean = str(tmp_path / "clean")
    _run(clean)
    from planetiler_ray.pipelines.tiles import read_pyramid
    a = read_pyramid(ckpt).to_pandas().sort_values("tile_id").reset_index(drop=True)
    b = read_pyramid(clean).to_pandas().sort_values("tile_id").reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["tile_id"].to_numpy() == b["tile_id"].to_numpy()).all()
    assert (a["content_hash"].to_numpy() == b["content_hash"].to_numpy()).all()


def test_run_stats_counters(ray_session):
    """Central counter actor: per-batch buffered flush from workers,
    driver-side totals (Stats.dataError analog)."""
    import pyarrow as pa
    import ray.data as rd

    from planetiler_ray.state.stats import RunStats

    stats = RunStats.create("testrun")

    def fn(batch: pa.Table, stats=stats) -> pa.Table:
        bad = int((batch["v"].to_numpy() % 7 == 0).sum())
        stats.data_error("mod7", bad)
        stats.add("rows", batch.num_rows)
        stats.time("fn", 0.001)
        stats.flush()
        return batch

    rd.range(1000).map_batches(
        lambda b: pa.table({"v": b["id"]}), batch_format="pyarrow") \
        .map_batches(fn, batch_format="pyarrow").count()
    import time
    totals = None
    for _ in range(50):          # fire-and-forget flushes need a beat
        totals = stats.totals()
        if totals["counters"].get("rows") == 1000:
            break
        time.sleep(0.1)
    assert totals["counters"]["rows"] == 1000
    assert totals["counters"]["data_errors.mod7"] == 143
    assert totals["timers"]["fn"] > 0
