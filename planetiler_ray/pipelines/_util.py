"""Shared helpers for the query suites."""

from __future__ import annotations

import numpy as np


def round_half_away(values, ndigits: int):
    """Round half away from zero — matches SQL ROUND (numpy/pandas round
    half-to-even, which diverges on exact .5 boundaries)."""
    scale = 10.0 ** ndigits
    v = np.asarray(values, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale


def read_parquet_clean(path: str, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's pandas metadata stripped
    from the schema.  Blocks carrying the ``b'pandas'`` schema metadata
    (a nested dict) are unhashable, so every downstream schema-unify
    logs "Failed to hash the schemas (for deduplication)" and skips the
    dedup fast path — passing an explicit clean schema fixes both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    sch = pq.ParquetFile(path).schema_arrow.remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kwargs)
