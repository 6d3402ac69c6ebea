"""Image-table sources.

The engine's primary input is a Lance/parquet table shaped
``(image_id, bytes, w, h, fmt, caption, phash)`` (BASELINE.json
input_hint) — the analog of the reference's (Geo)Parquet reader
(``reader/parquet/ParquetReader.java:35-85``), pruned at the read.

For driver-checked runs over the shared testdata (which has no image
table), :func:`images_from_documents` derives one deterministically
from ``documents.parquet``: ``image_id = f"img{doc_id:08d}"``,
``caption = text``; georeferencing then follows the standard fixture
placement rules (a pure function of image_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..fixtures import HEIGHTS, WIDTHS
from ..tilemath.hashing import fnv1a_64_strings


def _docs_to_images(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"].to_numpy()
    ids = np.char.add("img", np.char.zfill(doc_id.astype(str), 8))
    return pa.table({
        "image_id": pa.array(ids.tolist(), pa.string()),
        "bytes": pa.array([b""] * len(ids), pa.binary()),
        "w": pa.array(WIDTHS[doc_id % 3], pa.int32()),
        "h": pa.array(HEIGHTS[(doc_id // 3) % 3], pa.int32()),
        "fmt": pa.array(np.where(doc_id % 2 == 0, "png", "jpeg").tolist(), pa.string()),
        "caption": batch["text"],
        "phash": pa.array(fnv1a_64_strings(ids).view(np.int64), pa.int64()),
    })


def images_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents.parquet → input-hint-shaped images Dataset (metadata-only)."""
    from ..pipelines._util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"]) \
        .map_batches(_docs_to_images, batch_format="pyarrow")


def sample_image_ids(sf_dir: str, max_sample: int = 20000) -> np.ndarray:
    """Driver-side deterministic sample of image ids for partition bounds.

    Reads only the ``doc_id`` column (cheap); at real scale this would
    read a handful of Lance fragments instead.
    """
    doc_id = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])["doc_id"].to_numpy()
    if len(doc_id) > max_sample:
        step = len(doc_id) // max_sample
        doc_id = doc_id[::step]
    return np.char.add("img", np.char.zfill(doc_id.astype(str), 8))
