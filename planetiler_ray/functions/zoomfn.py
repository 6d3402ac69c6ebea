"""Zoom-varying values — the ``util/ZoomFunction.java:13-60`` analog.

The reference lets every feature attribute / threshold vary by zoom via
``ZoomFunction`` (an int-keyed ordered map: value at z = entry with the
largest key ≤ z) plus helpers ``minZoom`` / ``maxZoom`` / ``zoomRange``.
Here zoom is a COLUMN, not a closure, so the same semantics become
vectorized lookups applied per rendered zoom level:

- :class:`ZoomFunction` — threshold list → scalar at a given z, plus a
  vectorized ``at(z_array)``
- :func:`min_zoom` / :func:`max_zoom` / :func:`zoom_range` — boolean
  gates matching ``ZoomFunction.minZoom/maxZoom/zoomRange``
- per-feature per-zoom gating in the fan-out: ``RenderConfig`` accepts
  ``min_zoom_col`` / ``max_zoom_col`` so each feature carries its own
  zoom window through rendering (``FeatureCollector.Feature``'s
  minzoom/maxzoom fields)
"""

from __future__ import annotations

import numpy as np


class ZoomFunction:
    """Value-by-zoom step function: entries ``[(zoom, value), ...]``;
    the value at z is the entry with the largest zoom ≤ z (None below
    the first threshold) — ``ZoomFunction.fromMaxZoomThresholds`` /
    ordered-map ``floorEntry`` semantics."""

    def __init__(self, thresholds: list[tuple[int, object]],
                 fallback: object = None):
        entries = sorted(thresholds)
        self.zooms = np.array([z for z, _ in entries], dtype=np.int64)
        self.values = [v for _, v in entries]
        self.fallback = fallback

    def apply(self, z: int):
        i = int(np.searchsorted(self.zooms, z, side="right")) - 1
        return self.values[i] if i >= 0 else self.fallback

    def at(self, z: np.ndarray, dtype=np.float64) -> np.ndarray:
        """Vectorized lookup over a zoom column (fallback must be set
        for zooms below the first threshold)."""
        z = np.asarray(z, dtype=np.int64)
        idx = np.searchsorted(self.zooms, z, side="right") - 1
        vals = np.array(self.values, dtype=dtype)
        out = np.full(z.shape, self.fallback, dtype=dtype)
        m = idx >= 0
        out[m] = vals[idx[m]]
        return out


def min_zoom(z, min_z) -> np.ndarray:
    """True where z ≥ min_z (``ZoomFunction.minZoom``)."""
    return np.asarray(z) >= np.asarray(min_z)


def max_zoom(z, max_z) -> np.ndarray:
    """True where z ≤ max_z (``ZoomFunction.maxZoom``)."""
    return np.asarray(z) <= np.asarray(max_z)


def zoom_range(z, min_z, max_z) -> np.ndarray:
    """True where min_z ≤ z ≤ max_z (``ZoomFunction.zoomRange``)."""
    return min_zoom(z, min_z) & max_zoom(z, max_z)
