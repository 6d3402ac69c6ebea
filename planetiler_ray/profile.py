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


class LayeredProfile(DefaultProfile):
    """Per-layer handler registry — the ``ForwardingProfile`` analog
    (``ForwardingProfile.java:25-29``): the reference registers
    ``FeatureProcessor`` handlers per source layer and
    ``LayerPostProcessor``s per output layer, then forwards each feature
    / each tile layer to its registered handlers.

    Columnar form: ``register_source(name, fn)`` routes
    ``process_features`` by the georef table's ``source_layer`` column
    (rows of unregistered layers pass through when
    ``pass_unmatched=True``, else drop — the reference's
    ``caresAboutSource`` gate); ``register_layer(layer_id, fn)`` routes
    ``post_process_tile`` per output-layer id, each handler seeing only
    its layer's rows (the ``postProcessLayerFeatures`` contract).
    Handlers must preserve the frag-dict contract (same keys; rows may
    be dropped/added).
    """

    def __init__(self, pass_unmatched: bool = True):
        self._source_handlers: dict[str, list] = {}
        self._layer_handlers: dict[int, list] = {}
        self._finishers: list = []
        self.pass_unmatched = pass_unmatched

    def register_source(self, source_layer: str, fn) -> "LayeredProfile":
        self._source_handlers.setdefault(source_layer, []).append(fn)
        return self

    def register_layer(self, layer_id: int, fn) -> "LayeredProfile":
        self._layer_handlers.setdefault(layer_id, []).append(fn)
        return self

    def on_finish(self, fn) -> "LayeredProfile":
        self._finishers.append(fn)
        return self

    def process_features(self, georef: pa.Table) -> pa.Table:
        if not self._source_handlers or "source_layer" not in georef.column_names:
            return georef
        import numpy as np
        import pyarrow.compute as pc

        col = georef["source_layer"]
        parts = []
        handled = None
        for name, fns in self._source_handlers.items():
            # null source_layer rows: equal() yields null, which turns
            # the numpy mask into object-dtype None and breaks | / ~
            mask = pc.fill_null(pc.equal(col, name), False)
            sub = georef.filter(mask)
            for fn in fns:
                sub = fn(sub)
            parts.append(sub)
            m = mask.to_numpy(zero_copy_only=False)
            handled = m if handled is None else (handled | m)
        if self.pass_unmatched and handled is not None and not handled.all():
            parts.append(georef.filter(pa.array(~handled)))
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return georef.slice(0, 0)
        return pa.concat_tables(parts, promote_options="default")

    def post_process_tile(self, frags: dict) -> dict:
        if not self._layer_handlers:
            return frags
        import numpy as np

        layer = frags["layer"]
        out_parts: list[dict] = []
        handled = np.zeros(len(layer), bool)
        for lid, fns in self._layer_handlers.items():
            m = layer == lid
            if not m.any():
                continue
            handled |= m
            sub = {k: v[m] for k, v in frags.items()}
            for fn in fns:
                sub = fn(sub)
            out_parts.append(sub)
        rest = {k: v[~handled] for k, v in frags.items()}
        if rest["layer"].size:
            out_parts.append(rest)
        if not out_parts:
            return {k: v[:0] for k, v in frags.items()}
        keys = frags.keys()
        out = {k: np.concatenate([p[k] for p in out_parts]) for k in keys}
        order = np.lexsort((out["idx"], out["sort_key"], out["layer"], out["tile"]))
        return {k: v[order] for k, v in out.items()}

    def finish(self) -> None:
        for fn in self._finishers:
            fn()


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
