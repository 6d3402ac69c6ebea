"""planetiler_ray — a Ray-Data-native tiling + spatial-join engine.

A from-scratch re-expression of the capabilities of Planetiler
(reference: phanecak-maptiler/planetiler) as idiomatic Ray Data
pipelines over Arrow batches:

- ``tilemath``   — pure numpy kernels: web-mercator projection, TileCoord
  TMS + Hilbert encoding, tile extents, MVT command codec, sort keys,
  simplification.  Bit-for-bit compatible with the reference
  (``geo/GeoUtils.java``, ``geo/TileCoord.java``, ``util/Hilbert.java``,
  ``collection/FeatureGroup.java``).
- ``stages``     — Ray Data `map_batches` stages: georeferencing, zoom
  fan-out render/clip, per-tile reduce (label-grid limit, merges, kNN
  captions), MVT-style encode, text analysis, dedup, ANN.
- ``pipelines``  — end-to-end pipelines (full z0–z14 pyramid build,
  spatial join) and the oracle-checkable query suite.
- ``state``      — checkpoint manifest + per-partition lineage for
  resumable runs (analog of the reference's ``--reuse_featuredb``).
- ``fixtures``   — deterministic synthetic image+caption tables shaped
  per the target input hint (image_id, bytes, w, h, fmt, caption, phash).

No module in this package calls ``ray.init``/``ray.shutdown`` — the
caller owns the Ray session.
"""

__version__ = "0.1.0"
