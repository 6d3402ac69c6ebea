"""Geodesic measures + compact encodings, matching ``geo/GeoUtils.java``.

- :func:`meters_between` / :func:`line_length_meters` — haversine
  (``GeoUtils.java:636-658``, AVERAGE_WORLD_RADIUS 6_371_008.8 m)
- :func:`ring_area_meters` — spherical ring area, JPL 07-03 algorithm
  (``GeoUtils.java:660-674``)
- :func:`min_zoom_for_pixel_size` — ``ceil(log2(minPixels/worldPixels))``
  clamped to [0, 15] (``GeoUtils.java:606-610``)
- :func:`encode_flat_location` / decode — lat/lon quantized to 2×31
  bits in one int64 (``GeoUtils.java:202-226``), the node-location-map
  value format
"""

from __future__ import annotations

import numpy as np

from .projection import RADIANS_PER_DEGREE, get_world_x, get_world_y
from .tilecoord import MAX_MAXZOOM

AVERAGE_WORLD_RADIUS_METERS = 6_371_008.8
AREA_FACTOR = AVERAGE_WORLD_RADIUS_METERS * AVERAGE_WORLD_RADIUS_METERS / 2
_HALF_QUANT = 2.0 ** 30  # HALF_QUANTIZED_WORLD_SIZE = 2^31/2
_LOW32 = np.uint64((1 << 32) - 1)


def meters_between(from_lon, from_lat, to_lon, to_lat) -> np.ndarray:
    """Haversine distance in meters (vectorized). ``GeoUtils.java:636-641``."""
    f_lon = np.asarray(from_lon, np.float64)
    f_lat = np.asarray(from_lat, np.float64)
    t_lon = np.asarray(to_lon, np.float64)
    t_lat = np.asarray(to_lat, np.float64)
    sdlat = np.sin((t_lat - f_lat) * RADIANS_PER_DEGREE / 2)
    sdlon = np.sin((t_lon - f_lon) * RADIANS_PER_DEGREE / 2)
    a = sdlat * sdlat + sdlon * sdlon * np.cos(f_lat * RADIANS_PER_DEGREE) \
        * np.cos(t_lat * RADIANS_PER_DEGREE)
    return AVERAGE_WORLD_RADIUS_METERS * 2 * np.arcsin(np.sqrt(a))


def line_length_meters(lons: np.ndarray, lats: np.ndarray) -> float:
    """Σ haversine edge lengths of one polyline. ``GeoUtils.java:645-658``."""
    if len(lons) < 2:
        return 0.0
    return float(meters_between(lons[:-1], lats[:-1], lons[1:], lats[1:]).sum())


def ring_area_meters(lons: np.ndarray, lats: np.ndarray) -> float:
    """Spherical ring area (m²), JPL algorithm. ``GeoUtils.java:660-674``.

    ``lons``/``lats`` form a closed ring (last == first); the sum uses
    the reference's exact index pattern over the n-1 edges.
    """
    n = len(lons) - 1
    if n < 3:
        return 0.0
    lower_x = np.asarray(lons[:n], np.float64) * RADIANS_PER_DEGREE
    mid_idx = np.where(np.arange(1, n + 1) == n, 0, np.arange(1, n + 1))
    upper_idx = np.where(np.arange(2, n + 2) >= n, np.arange(2, n + 2) % n,
                         np.arange(2, n + 2))
    mid_y = np.asarray(lats, np.float64)[mid_idx] * RADIANS_PER_DEGREE
    upper_x = np.asarray(lons, np.float64)[upper_idx] * RADIANS_PER_DEGREE
    return float(abs(((upper_x - lower_x) * np.sin(mid_y)).sum()) * AREA_FACTOR)


def min_zoom_for_pixel_size(world_size, min_pixel_size: float = 1.0) -> np.ndarray:
    """Minimum zoom where a feature ≥ ``min_pixel_size`` px. ``GeoUtils.java:606-610``."""
    world_pixels = np.asarray(world_size, np.float64) * 256
    with np.errstate(divide="ignore"):
        z = np.ceil(np.log2(min_pixel_size / world_pixels))
    return np.clip(z, 0, MAX_MAXZOOM).astype(np.int64)


def encode_flat_location(lon, lat) -> np.ndarray:
    """Pack lat/lon → int64 (2×31-bit quantized). ``GeoUtils.java:202-210``."""
    wx = get_world_x(lon) + 1
    wy = get_world_y(lat) + 1
    x = (wx * _HALF_QUANT).astype(np.int64).astype(np.uint64)
    y = (wy * _HALF_QUANT).astype(np.int64).astype(np.uint64)
    return ((x << np.uint64(32)) | (y & _LOW32)).view(np.int64)


def decode_world_x(encoded) -> np.ndarray:
    e = np.asarray(encoded, np.int64).view(np.uint64)
    return (e >> np.uint64(32)).astype(np.float64) / _HALF_QUANT - 1


def decode_world_y(encoded) -> np.ndarray:
    e = np.asarray(encoded, np.int64).view(np.uint64)
    return (e & _LOW32).astype(np.float64) / _HALF_QUANT - 1
