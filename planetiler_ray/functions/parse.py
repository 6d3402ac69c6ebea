"""Scalar parsing/coercion kernels, matching ``util/Parse.java:35-223``.

Vectorized over pandas/numpy string arrays; each returns a value array
with NaN/None for unparseable inputs (the reference's ``-OrNull``
convention).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_INT_RE = re.compile(r"^\s*([+-]?\d+)")
_NUM_RE = re.compile(r"^\s*([+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)")
# meters parsing: "12", "12 m", "12.5m", "40 ft", "3 mi", "6'", "6'11\""
_METERS_RE = re.compile(
    r"^\s*(?P<num>[+-]?\d+(?:\.\d+)?)\s*(?P<unit>m|meters?|ft|feet|'|mi|miles?|km)?\s*"
    r"(?:(?P<inches>\d+(?:\.\d+)?)\s*\")?\s*$", re.I)

TRUTHY = {"yes", "true", "1"}
FALSY = {"no", "false", "0"}


def parse_long(values) -> np.ndarray:
    """Leading-integer parse → float64 array with NaN for misses
    (``Parse.parseLongOrNull``)."""
    s = pd.Series(values, dtype="object").astype(str)
    m = s.str.extract(_INT_RE, expand=False)
    return pd.to_numeric(m, errors="coerce").to_numpy(np.float64)


def parse_double(values) -> np.ndarray:
    s = pd.Series(values, dtype="object").astype(str)
    m = s.str.extract(_NUM_RE, expand=False)
    return pd.to_numeric(m, errors="coerce").to_numpy(np.float64)


def parse_bool(values) -> np.ndarray:
    """``Parse.bool``: yes/true/1 → True; everything else False."""
    s = pd.Series(values, dtype="object").astype(str).str.strip().str.lower()
    return s.isin(TRUTHY).to_numpy()


def parse_direction(values) -> np.ndarray:
    """``Parse.direction``: yes/true/1→1, -1→-1, no/false/0/other→0."""
    s = pd.Series(values, dtype="object").astype(str).str.strip().str.lower()
    out = np.zeros(len(s), dtype=np.int64)
    out[s.isin(TRUTHY).to_numpy()] = 1
    out[(s == "-1").to_numpy()] = -1
    return out


_UNIT_TO_M = {"m": 1.0, "meter": 1.0, "meters": 1.0, "km": 1000.0,
              "ft": 0.3048, "feet": 0.3048, "'": 0.3048,
              "mi": 1609.344, "mile": 1609.344, "miles": 1609.344}


def parse_meters(values) -> np.ndarray:
    """``Parse.meters``: value + optional unit (ft/mi/km/feet-inches)."""
    out = np.full(len(values), np.nan)
    for i, v in enumerate(values):
        if v is None:
            continue
        m = _METERS_RE.match(str(v))
        if not m:
            continue
        num = float(m.group("num"))
        unit = (m.group("unit") or "m").lower()
        meters = num * _UNIT_TO_M.get(unit, 1.0)
        if m.group("inches") and unit in ("'",):
            meters += float(m.group("inches")) * 0.0254
        out[i] = meters
    return out


def way_z_order(layer, bridge, tunnel) -> np.ndarray:
    """``Parse.wayzorder``-style z ordering: layer*10 + bridge(+10) /
    tunnel(-10) adjustments, clamped."""
    z = np.asarray(parse_long(layer))
    z = np.where(np.isnan(z), 0, z) * 10
    z = z + np.where(parse_bool(bridge), 10, 0)
    z = z - np.where(parse_bool(tunnel), 10, 0)
    return np.clip(z, -100, 100).astype(np.int64)
