"""Shared helpers for the query suites."""

from __future__ import annotations

import numpy as np


def round_half_away(values, ndigits: int):
    """Round half away from zero — matches SQL ROUND (numpy/pandas round
    half-to-even, which diverges on exact .5 boundaries)."""
    scale = 10.0 ** ndigits
    v = np.asarray(values, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) * scale + 0.5) / scale
