"""Web-mercator "world" projection: lon/lat degrees ↔ [0,1]² world coords.

Semantics of reference ``geo/GeoUtils.java:164-198``:
  - world x = (lon + 180) / 360
  - world y = 0.5 − 0.25·ln((1+sin lat)/(1−sin lat))/π
  - latitudes beyond the y∈[-0.1, 1.1] range are clamped to exactly
    -0.1 / 1.1 (``GeoUtils.java:100-101``: MAX_LAT=getWorldLat(-0.1),
    MIN_LAT=getWorldLat(1.1))

All functions are vectorized over numpy float64 arrays and use the same
order of floating-point operations as the reference so that downstream
``floor(worldX * 2^z)`` tile assignment matches bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

RADIANS_PER_DEGREE = math.pi / 180
DEGREES_PER_RADIAN = 180 / math.pi


def get_world_lon(x):
    """World mercator x → longitude. ``GeoUtils.java:164-167``."""
    return np.asarray(x, dtype=np.float64) * 360 - 180


def get_world_lat(y):
    """World mercator y → latitude. ``GeoUtils.java:172-175``."""
    y = np.asarray(y, dtype=np.float64)
    n = math.pi - 2 * math.pi * y
    return DEGREES_PER_RADIAN * np.arctan(0.5 * (np.exp(n) - np.exp(-n)))


# Clamp bounds exactly as the reference computes them (GeoUtils.java:100-101).
MAX_LAT = float(get_world_lat(-0.1))
MIN_LAT = float(get_world_lat(1.1))


def get_world_x(lon):
    """Longitude → world mercator x. ``GeoUtils.java:181-183``."""
    return (np.asarray(lon, dtype=np.float64) + 180) / 360


def get_world_y(lat):
    """Latitude → world mercator y with the reference's clamps.

    ``GeoUtils.java:190-198``: lat <= MIN_LAT → 1.1; lat >= MAX_LAT → -0.1;
    else 0.5 − 0.25·ln((1+sin)/(1−sin))/π.
    """
    lat = np.asarray(lat, dtype=np.float64)
    sin = np.sin(lat * RADIANS_PER_DEGREE)
    # Guard the log against sin == ±1 (poles are clamped away anyway).
    with np.errstate(divide="ignore", invalid="ignore"):
        y = 0.5 - 0.25 * np.log((1 + sin) / (1 - sin)) / math.pi
    y = np.where(lat <= MIN_LAT, 1.1, y)
    y = np.where(lat >= MAX_LAT, -0.1, y)
    return y
