"""Traffic-weighted tile statistics (``util/TileWeights.java`` +
``util/TilesetSummaryStatistics.java:129-190,320-345``).

``TileWeights`` holds per-tile traffic weights (e.g. 90 days of
openstreetmap.org tile loads, ``util/TopOsmTiles.java`` — the download
itself is network-gated in this environment, so weights arrive via the
same gzipped TSV format the reference persists: header ``z x y loads``,
tab-separated, accumulated per coordinate).  The weighted summary gives
average archived tile size weighted by real traffic, per zoom and
overall; combining zooms rescales each zoom's contribution by its share
of the GLOBAL zoom weight so low-zoom tiles are not overweighted when
analyzing a small extract (``TilesetSummaryStatistics.java:320-345``).

Weights broadcast to workers as two sorted numpy arrays via ``ray.put``
(a lookup, never a shuffle side).
"""

from __future__ import annotations

import gzip
import os

import numpy as np


class TileWeights:
    """tile-id keyed traffic weights + per-zoom totals."""

    def __init__(self):
        self._acc: dict[int, int] = {}
        self._keys = np.empty(0, np.int64)
        self._vals = np.empty(0, np.int64)
        self._zoom: dict[int, int] = {}
        self._dirty = False

    def put(self, z: int, x: int, y: int, weight: int) -> "TileWeights":
        """Accumulate ``weight`` onto tile (z, x, y)
        (``TileWeights.put``: merge with sum)."""
        from ..tilemath.tilecoord import tms_encode
        tid = int(tms_encode(np.array([x]), np.array([y]),
                             np.array([z]))[0])
        self._acc[tid] = self._acc.get(tid, 0) + int(weight)
        self._zoom[z] = self._zoom.get(z, 0) + int(weight)
        self._dirty = True
        return self

    def _arrays(self) -> tuple[np.ndarray, np.ndarray]:
        if self._dirty:
            k = np.array(sorted(self._acc), np.int64)
            self._keys = k
            self._vals = np.array([self._acc[int(i)] for i in k], np.int64)
            self._dirty = False
        return self._keys, self._vals

    def get_weight(self, tile_ids: np.ndarray) -> np.ndarray:
        """Vectorized weight lookup (0 for unknown tiles)."""
        k, v = self._arrays()
        tile_ids = np.asarray(tile_ids, np.int64)
        if len(k) == 0:
            return np.zeros(len(tile_ids), np.int64)
        pos = np.searchsorted(k, tile_ids)
        posc = np.minimum(pos, len(k) - 1)
        hit = (pos < len(k)) & (k[posc] == tile_ids)
        return np.where(hit, v[posc], 0)

    def zoom_weight(self, z: int) -> int:
        return self._zoom.get(int(z), 0)

    @property
    def empty(self) -> bool:
        return not self._acc

    # -- persistence: the reference's gzipped TSV (z, x, y, loads) ----

    def write(self, path: str) -> None:
        from ..tilemath.tilecoord import tms_decode
        k, v = self._arrays()
        x, y, z = tms_decode(k)
        order = np.lexsort((y, x, z))
        with gzip.open(path, "wt") as f:
            f.write("z\tx\ty\tloads\n")
            for i in order:
                f.write(f"{z[i]}\t{x[i]}\t{y[i]}\t{v[i]}\n")

    @classmethod
    def load(cls, path: str) -> "TileWeights":
        w = cls()
        if not os.path.exists(path):
            return w
        with gzip.open(path, "rt") as f:
            header = f.readline()
            if header.strip().split("\t") != ["z", "x", "y", "loads"]:
                raise ValueError(
                    f"{path}: expected TSV header 'z x y loads', got "
                    f"{header.strip()!r}")
            for line in f:
                if not line.strip():
                    continue           # tolerate trailing blank lines
                z, x, y, loads = line.strip().split("\t")
                w.put(int(z), int(x), int(y), int(loads))
        return w


def weighted_tile_size_stats(tiles, weights: TileWeights,
                             top_n: int = 10) -> dict:
    """Per-zoom and overall WEIGHTED average archived tile size + the
    top-N tiles by traffic weight.

    Semantics (``TilesetSummaryStatistics.java``): per zoom,
    ``weighted_avg = Σ size·w / Σ w`` over that zoom's tiles (plain
    average when the zoom has no weight); overall, each zoom's weighted
    average contributes proportionally to the zoom's share of the
    GLOBAL zoom weight (``:320-345``), so a small extract is not skewed
    by whichever zooms it happens to contain.  Also reports the top-N
    tiles by weight (``TopOsmTiles`` ordering).  Weights broadcast via
    ``ray.put``; only per-zoom partial sums reach the driver.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    w_ref = ray.put(weights)

    def per_batch(batch: pa.Table) -> pd.DataFrame:
        w = ray.get(w_ref)
        sizes = pc.binary_length(batch["tile_bytes"]).to_numpy() \
            .astype(np.int64)
        tids = batch["tile_id"].to_numpy()
        tw = w.get_weight(tids)
        df = pd.DataFrame({"z": batch["z"].to_numpy().astype(np.int64),
                           "size": sizes, "w": tw, "ws": tw * sizes,
                           "tile_id": tids})
        agg = df.groupby("z").agg(n=("size", "size"), bytes=("size", "sum"),
                                  w=("w", "sum"), ws=("ws", "sum")) \
            .reset_index()
        agg["kind"] = "agg"
        top = df.nlargest(top_n, "w")[["tile_id", "z", "size", "w"]]
        top = top[top["w"] > 0]
        top["kind"] = "top"
        return pd.concat([agg, top], ignore_index=True)

    parts = tiles.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    aggs = parts[parts["kind"] == "agg"].groupby("z").agg(
        n=("n", "sum"), bytes=("bytes", "sum"), w=("w", "sum"),
        ws=("ws", "sum"))
    per_zoom = {}
    for z, r in aggs.iterrows():
        per_zoom[int(z)] = {
            "n": int(r["n"]),
            "avg_bytes": float(r["bytes"]) / r["n"],
            "weighted_avg_bytes": (float(r["ws"]) / r["w"]) if r["w"] > 0
            else float(r["bytes"]) / r["n"],
        }
    # overall: zoom-share weighting over zooms with data AND weight
    shares = {z: weights.zoom_weight(z) for z in per_zoom
              if weights.zoom_weight(z) > 0 and aggs.loc[z, "w"] > 0}
    total_share = sum(shares.values())
    if total_share > 0:
        overall = sum((shares[z] / total_share)
                      * (float(aggs.loc[z, "ws"]) / aggs.loc[z, "w"])
                      for z in shares)
    else:
        overall = float(aggs["bytes"].sum()) / max(int(aggs["n"].sum()), 1)
    tops = parts[parts["kind"] == "top"].nlargest(top_n, "w")
    return {
        "per_zoom": per_zoom,
        "weighted_avg_bytes": overall,
        "top_weighted_tiles": [(int(r["tile_id"]), int(r["z"]),
                                int(r["size"]), int(r["w"]))
                               for _, r in tops.iterrows()],
    }
