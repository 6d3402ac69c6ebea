"""Georeferencing stage: images batch → world-mercator chip footprints.

The analog of the reference's ``SourceFeature.latLonGeometry()`` +
``GeoUtils.latLonToWorldCoords`` step (``reader/SourceFeature.java:20-46``,
``geo/GeoUtils.java:43-48``): every image row becomes a georeferenced
raster chip with a world-mercator footprint box and centroid point.

Placement is a pure function of ``image_id`` (FIXTURES.md §1), so this
stage is stateless and embarrassingly parallel: a vectorized
``map_batches(batch_format="pyarrow")`` transform.  The image payload
(``bytes``) is intentionally DROPPED here — wide binary columns must
not ride through the tile shuffle (SURVEY.md §7.4); pixel work happens
in a separate decode stage keyed by ``image_id``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures import georef_from_ids


def georef_batch(batch: pa.Table) -> pa.Table:
    """Add cx/cy (world centroid), hw/hh (half extents), idx columns.

    Passes through whatever metadata columns are present (caption,
    phash, …) — callers prune at the read, so a pyramid build that
    never touches captions reads only ``image_id``.
    """
    ids = batch["image_id"].to_numpy(zero_copy_only=False)
    g = georef_from_ids(ids)
    cols = {"image_id": batch["image_id"]}
    for passthrough in ("caption", "phash", "fmt", "w", "h"):
        if passthrough in batch.column_names:
            cols[passthrough] = batch[passthrough]
    cols.update({
        "idx": pa.array(g["idx"], type=pa.int64()),
        "cx": pa.array(g["cx"], type=pa.float64()),
        "cy": pa.array(g["cy"], type=pa.float64()),
        "hw": pa.array(g["hw"], type=pa.float64()),
        "hh": pa.array(g["hh"], type=pa.float64()),
    })
    return pa.table(cols)
