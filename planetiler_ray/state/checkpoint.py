"""Per-partition checkpoint manifest + lineage metrics.

The analog of the reference fork's resume feature
(``Planetiler.java:862-979``: persist the sorted-chunk manifest +
string dictionaries, then ``--reuse_featuredb`` skips straight to the
archive stage): each completed Hilbert range partition writes its
output parquet ATOMICALLY (tmp file + rename) plus a small lineage
JSON recording row/tile counts and a content fingerprint.  A resumed
run lists completed partitions and filters them out BEFORE the
shuffle, so finished work is neither re-shuffled nor re-reduced.

Layout under ``root``:

    part=00042/data.parquet      # the partition's tiles
    part=00042/lineage.json      # {part, n_fragments, n_tiles, fingerprint, wall_sec}
    _manifest.json               # written by finalize(): run-level summary

A partition is "done" iff its lineage.json exists (written last, after
the data rename — the commit point).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def part_dir(self, part: int) -> str:
        return os.path.join(self.root, f"part={part:05d}")

    def completed_parts(self) -> set[int]:
        done = set()
        if not os.path.isdir(self.root):
            return done
        for name in os.listdir(self.root):
            if name.startswith("part=") and os.path.exists(
                    os.path.join(self.root, name, "lineage.json")):
                done.add(int(name.split("=")[1]))
        return done

    def check_run_config(self, config: dict) -> None:
        """Record the run configuration on first use; REFUSE to resume
        when it changed (partition bounds / partition count / input
        fingerprint) — resuming over stale partitions would silently
        mix two different runs in one manifest."""
        import hashlib

        blob = json.dumps(config, sort_keys=True, default=str).encode()
        h = hashlib.sha256(blob).hexdigest()
        p = os.path.join(self.root, "run_config.json")
        if os.path.exists(p):
            with open(p) as f:
                rec = json.load(f)
            if rec["hash"] != h:
                raise ValueError(
                    f"checkpoint dir {self.root} was written by a different "
                    f"run configuration (recorded {rec['hash'][:12]}, "
                    f"current {h[:12]}); use a fresh checkpoint dir or "
                    f"delete the old one")
            return
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"hash": h, "config": config}, f, indent=1, default=str)
        os.replace(tmp, p)

    def write_partition(self, part: int, table: pa.Table, n_fragments: int,
                        wall_sec: float, fingerprint: int) -> dict:
        """Atomically persist one partition's output + lineage row.

        Durable commit order: data bytes fsynced → renamed → directory
        fsynced → lineage fsynced → renamed → directory fsynced, so the
        ``lineage.json`` done-marker can never survive a crash that
        lost the data bytes.  Tmp names carry the writer's pid so a Ray
        retry racing a zombie original task can't interleave writes
        into one file — the loser's rename just installs its own
        complete copy.
        """
        d = self.part_dir(part)
        os.makedirs(d, exist_ok=True)
        suffix = f".tmp.{os.getpid()}"
        tmp = os.path.join(d, ".data.parquet" + suffix)
        with open(tmp, "wb") as f:
            pq.write_table(table, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, "data.parquet"))
        self._fsync_dir(d)
        lineage = {
            "part": part,
            "n_fragments": int(n_fragments),
            "n_tiles": table.num_rows,
            "fingerprint": int(fingerprint),
            "wall_sec": round(wall_sec, 4),
            "ts": time.time(),
        }
        tmp = os.path.join(d, ".lineage.json" + suffix)
        with open(tmp, "w") as f:
            json.dump(lineage, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, "lineage.json"))
        self._fsync_dir(d)
        return lineage

    @staticmethod
    def _fsync_dir(path: str) -> None:
        try:
            fd = os.open(path, os.O_RDONLY)
        except OSError:           # platforms without directory fds
            return
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def read_lineage(self) -> list[dict]:
        out = []
        for part in sorted(self.completed_parts()):
            with open(os.path.join(self.part_dir(part), "lineage.json")) as f:
                out.append(json.load(f))
        return out

    def data_files(self) -> list[str]:
        return [os.path.join(self.part_dir(p), "data.parquet")
                for p in sorted(self.completed_parts())]

    def finalize(self, extra: dict | None = None) -> dict:
        lineage = self.read_lineage()
        manifest = {
            "n_parts": len(lineage),
            "n_tiles": sum(r["n_tiles"] for r in lineage),
            "n_fragments": sum(r["n_fragments"] for r in lineage),
            **(extra or {}),
        }
        tmp = os.path.join(self.root, "._manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"summary": manifest, "partitions": lineage}, f, indent=1)
        os.replace(tmp, os.path.join(self.root, "_manifest.json"))
        return manifest
