"""The user-extension surface: a Python ``Profile`` protocol.

Mirrors the reference's ``Profile`` hooks (``Profile.java:36-271``) in
batch-vectorized form — each hook sees Arrow tables / numpy arrays, not
single features, because the engine is columnar:

- ``process_features(georef_table) -> georef_table``
    filter + attribute mapping + geometry choice per source row
    (``processFeature``); runs inside the fan-out ``map_batches``
- ``post_process_tile(frag_arrays: dict) -> dict``
    per-tile feature post-processing before encode
    (``postProcessTileFeatures`` / ``postProcessLayerFeatures``);
    runs inside the per-partition reduce, vectorized over every tile in
    the partition
- ``finish() -> None``
    end-of-source hook (``Profile.finish``); called on the driver after
    the pipeline completes

``DefaultProfile`` reproduces the engine's built-in behavior (all
features pass, label-grid limit only).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class Profile(Protocol):
    def process_features(self, georef: pa.Table) -> pa.Table:
        ...

    def post_process_tile(self, frags: dict) -> dict:
        ...

    def finish(self) -> None:
        ...


class DefaultProfile:
    """Pass-through profile (engine defaults only)."""

    def process_features(self, georef: pa.Table) -> pa.Table:
        return georef

    def post_process_tile(self, frags: dict) -> dict:
        return frags

    def finish(self) -> None:
        pass


class FilteredProfile(DefaultProfile):
    """Example profile: drop features failing an expression, like the
    reference's ``caresAboutSource`` + tag-filter combination."""

    def __init__(self, expr):
        self.expr = expr

    def process_features(self, georef: pa.Table) -> pa.Table:
        return georef.filter(self.expr(georef))


class BoxMergeProfile(DefaultProfile):
    """Example tile post-processor: merge overlapping footprint boxes
    per tile — the ``FeatureMerge.mergeNearbyPolygons`` hook shape
    (``FeatureMerge.java:291-394``) driven through
    ``Profile.post_process_tile``.

    Box clusters within ``min_dist`` px collapse to their cluster
    extent with merged id ``(min_id//10)*10``; point-layer rows pass
    through untouched.
    """

    def __init__(self, min_dist: float = 0.0):
        self.min_dist = min_dist

    def post_process_tile(self, frags: dict) -> dict:
        import numpy as np

        from .stages.merge import merge_overlapping_boxes

        tile = frags["tile"]
        layer = frags["layer"]
        is_box = layer == 0
        if not is_box.any():
            return frags
        keep_idx = []            # row indices passed through unchanged
        merged_rows = {k: [] for k in ("tile", "layer", "kind", "sort_key",
                                       "idx", "ax", "ay", "bx", "by")}
        box_rows = np.nonzero(is_box)[0]
        bt = tile[box_rows]
        bounds = np.flatnonzero(np.diff(bt)) + 1
        for seg in np.split(box_rows, bounds):
            if len(seg) < 2:
                keep_idx.extend(seg.tolist())
                continue
            m = merge_overlapping_boxes(frags["idx"][seg],
                                        frags["ax"][seg], frags["ay"][seg],
                                        frags["bx"][seg], frags["by"][seg],
                                        min_dist=self.min_dist)
            merged_rows["tile"].extend([tile[seg[0]]] * len(m["merged_id"]))
            merged_rows["layer"].extend([0] * len(m["merged_id"]))
            merged_rows["kind"].extend([0] * len(m["merged_id"]))
            merged_rows["sort_key"].extend([0] * len(m["merged_id"]))
            merged_rows["idx"].extend(m["merged_id"].tolist())
            merged_rows["ax"].extend(m["mx0"].tolist())
            merged_rows["ay"].extend(m["my0"].tolist())
            merged_rows["bx"].extend(m["mx1"].tolist())
            merged_rows["by"].extend(m["my1"].tolist())
        keep_idx.extend(np.nonzero(~is_box)[0].tolist())
        keep_idx = np.array(sorted(keep_idx), dtype=np.int64)

        # hook contract: EVERY key received passes through — known
        # geometry keys get the merged values, any other column (ids,
        # attrs, is_fill, …) gets kept-row values + sentinels for the
        # synthesized merged rows
        n_merged = len(merged_rows["tile"])
        out = {}
        for k, arr in frags.items():
            kept = arr[keep_idx]
            if k in merged_rows:
                filler = np.asarray(merged_rows[k], dtype=arr.dtype)
            elif arr.dtype == object:
                filler = np.full(n_merged, "", dtype=object)
            else:
                filler = np.zeros(n_merged, dtype=arr.dtype)
            out[k] = np.concatenate([kept, filler])
        # rows must stay tile-sorted for the reduce
        order = np.lexsort((out["idx"], out["sort_key"], out["layer"], out["tile"]))
        return {k: v[order] for k, v in out.items()}
