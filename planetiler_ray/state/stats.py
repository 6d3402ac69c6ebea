"""Central run counters — the ``stats/Stats.java`` analog.

The reference threads a ``Stats`` handle through every stage for
counters (``dataError(name)``, processed-element counts) and timers,
then dumps them at the end of the run.  Cluster-native shape: one
named detached-scope counter ACTOR per run; stages buffer increments
locally per batch and flush ONE message per batch (never one per row),
so the actor sees O(batches) tiny dicts, not O(rows) — the same
contract as the reference's LongAdder counters.

Usage::

    stats = RunStats.create("myrun")
    # inside a map_batches fn / actor:
    stats.add("data_errors.bad_geometry", int(n_bad))   # buffered
    stats.flush()                                       # per batch
    ...
    totals = stats.totals()                             # driver side

``add``/``flush`` are safe from any worker (the handle pickles into
closures); ``totals`` folds the actor state.
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self):
        self._counts: dict[str, int] = defaultdict(int)
        self._timers: dict[str, float] = defaultdict(float)

    def add_many(self, counts: dict, timers: dict) -> None:
        for k, v in counts.items():
            self._counts[k] += int(v)
        for k, v in timers.items():
            self._timers[k] += float(v)

    def totals(self) -> dict:
        return {"counters": dict(self._counts),
                "timers": {k: round(v, 6) for k, v in self._timers.items()}}

    def reset(self) -> None:
        self._counts.clear()
        self._timers.clear()


class RunStats:
    """Picklable handle: local buffers + one flush RPC per batch."""

    def __init__(self, actor):
        self._actor = actor
        self._counts: dict[str, int] = defaultdict(int)
        self._timers: dict[str, float] = defaultdict(float)

    @classmethod
    def create(cls, name: str = "run", reset: bool = False) -> "RunStats":
        """Get-or-create the named counter actor.

        ``reset=True`` zeroes an actor surviving from an earlier run in
        the same Ray session — without it a second run's totals would
        include the first run's counts."""
        actor = _CounterActor.options(
            name=f"planetiler_stats_{name}", get_if_exists=True).remote()
        if reset:
            ray.get(actor.reset.remote())
        return cls(actor)

    # --- worker-side ---------------------------------------------------
    def add(self, counter: str, n: int = 1) -> None:
        self._counts[counter] += n

    def data_error(self, kind: str, n: int = 1) -> None:
        """Skip-and-count convention (``Stats.dataError``)."""
        self.add(f"data_errors.{kind}", n)

    def time(self, timer: str, seconds: float) -> None:
        self._timers[timer] += seconds

    def flush(self) -> None:
        """One BLOCKING RPC carrying everything buffered: a returning
        task must guarantee its counts landed on the actor, or the
        driver's end-of-run totals() can execute first and undercount
        (Ray gives no cross-caller ordering for fire-and-forget)."""
        if self._counts or self._timers:
            ray.get(self._actor.add_many.remote(dict(self._counts),
                                                dict(self._timers)))
            self._counts.clear()
            self._timers.clear()

    # --- driver-side ---------------------------------------------------
    def totals(self) -> dict:
        self.flush()
        return ray.get(self._actor.totals.remote())

    def __getstate__(self):
        # buffers are per-process: a pickled handle starts clean
        return {"actor": self._actor}

    def __setstate__(self, state):
        self._actor = state["actor"]
        self._counts = defaultdict(int)
        self._timers = defaultdict(float)
