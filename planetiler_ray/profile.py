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
