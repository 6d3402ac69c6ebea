"""Driver-oracle queries for the per-record geometry/packing operator
families that were previously pytest-only:

- ``sortkey_pack``   — 64-bit feature sort-key bit packing + decode
  (``tilemath.sortkey``; reference ``collection/FeatureGroup.java:170-196``)
- ``zoomfn_values``  — zoom-varying values + min/max-zoom gates
  (``functions.zoomfn``; reference ``util/ZoomFunction.java:13-60``)
- ``geom_derivations`` — lineMidpoint / pointAlongLine / partialLine over
  per-user trajectories (``tilemath.geomfn``; reference
  ``geo/WithGeometry.java:122-304``, ``geo/LineSplitter.java``)
- ``geo_measures``   — haversine length, JPL spherical ring area,
  min-zoom-for-size, flat node-location encoding (``tilemath.measure``;
  reference ``geo/GeoUtils.java:202-226,606-717``)
- ``line_merge_chains`` — LoopLineMerger degree-2 chain merge over
  exploded trajectory segments (``stages.merge``; reference
  ``util/LoopLineMerger.java``)

Placement follows the module convention of :mod:`.queries`: coordinates
derive from ``event_id`` with pure arithmetic so the SQL oracle can
reproduce them bit-for-bit; transcendental-function outputs (mercator,
haversine) are only ever compared after coarse rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tilemath.clip import DEFAULT_BUFFER_PX
from ._util import round_half_away

U_MULT = 2654435761
V_MULT = 2246822519
TWO32 = 4294967296.0


def _read(sf_dir: str, name: str, columns=None):
    from ._util import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# sortkey_pack — FeatureGroup 64-bit key layout, exact integer oracle
# ---------------------------------------------------------------------------

def q_sortkey_pack(sf_dir: str):
    """Pack (tile, layer, sortKey, hasGroup) into the FeatureGroup int64
    key and decode it back — both directions oracle-checked with exact
    integer arithmetic (no float risk)."""
    from ..tilemath.sortkey import SORT_KEY_MIN, decode_key, encode_key

    def pack(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        tile = (eid * U_MULT) % (1 << 33)
        layer = eid % 251
        sort_key = (eid * V_MULT) % (1 << 22) + SORT_KEY_MIN
        has_group = eid % 2
        key = encode_key(tile, layer, sort_key, has_group)
        d_tile, d_layer, d_sk, d_hg = decode_key(key)
        return pa.table({
            "event_id": eid, "key": key,
            "d_tile": d_tile, "d_layer": d_layer,
            "d_sort_key": d_sk, "d_has_group": d_hg.astype(np.int64),
        })

    return _read(sf_dir, "events", ["event_id"]) \
        .map_batches(pack, batch_format="pyarrow")


SQL_SORTKEY_PACK = """
WITH b AS (
    SELECT event_id,
           (event_id * 2654435761) % 8589934592 AS tile,
           event_id % 251 AS layer,
           (event_id * 2246822519) % 4194304 - 2097152 AS sort_key,
           event_id % 2 AS has_group
    FROM events),
k AS (
    SELECT *,
           tile::HUGEINT * 2147483648 + layer * 8388608
             + (sort_key + 2097152) * 2 + has_group AS raw
    FROM b)
SELECT event_id,
       CAST(CASE WHEN raw >= 9223372036854775808 THEN raw - 18446744073709551616
                 ELSE raw END AS BIGINT) AS key,
       tile AS d_tile, layer AS d_layer,
       sort_key AS d_sort_key, has_group AS d_has_group
FROM k
"""


# ---------------------------------------------------------------------------
# zoomfn_values — ZoomFunction step lookup + zoom gates
# ---------------------------------------------------------------------------

def q_zoomfn_values(sf_dir: str):
    """Per-zoom ZoomFunction value (floorEntry semantics: thresholds
    (4→10, 8→5, 12→2), fallback 0) and the zoomRange(5,10) gate count,
    aggregated over a derived per-event zoom column."""
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.zoomfn import ZoomFunction, zoom_range

    zf = ZoomFunction([(4, 10.0), (8, 5.0), (12, 2.0)], fallback=0.0)

    def attach(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        z = eid % 16
        return pa.table({
            "z": z,
            "zf_value": zf.at(z),
            "in_range": zoom_range(z, 5, 10).astype(np.int64),
        })

    out = _read(sf_dir, "events", ["event_id"]) \
        .map_batches(attach, batch_format="pyarrow") \
        .groupby("z").aggregate(Max("zf_value", alias_name="zf_value"),
                                Count(alias_name="n_events"),
                                Sum("in_range", alias_name="n_in_range")) \
        .to_pandas()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["n_in_range"] = out["n_in_range"].astype(np.int64)
    return out.sort_values("z").reset_index(drop=True)


SQL_ZOOMFN_VALUES = """
SELECT event_id % 16 AS z,
       CAST(CASE WHEN event_id % 16 >= 12 THEN 2
                 WHEN event_id % 16 >= 8 THEN 5
                 WHEN event_id % 16 >= 4 THEN 10
                 ELSE 0 END AS DOUBLE) AS zf_value,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_id % 16 BETWEEN 5 AND 10 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_in_range
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# geom_derivations — lineMidpoint / pointAlongLine / partialLine
# ---------------------------------------------------------------------------

def q_geom_derivations(sf_dir: str):
    """Per-user trajectory: midpoint, quarter-point and partialLine
    vertex count — the WithGeometry derived-point family, one polyline
    per user (ordered by ts, event_id; arithmetic placement)."""
    from ..tilemath.geomfn import line_midpoint, partial_line, point_along_line

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        u = (eid * U_MULT) % (1 << 32)
        v = (eid * V_MULT) % (1 << 32)
        return pa.table({
            "user_id": batch["user_id"], "ts": batch["ts"], "event_id": eid,
            "wx": u.astype(np.float64) / TWO32,
            "wy": 0.05 + 0.9 * (v.astype(np.float64) / TWO32),
        })

    from .userkey import user_segment_reduce

    def segs(t: pa.Table, starts: np.ndarray) -> pa.Table:
        # hash-exchange partition: sort is vectorized upstream; the
        # per-run fold walks numpy slices (the geomfn kernels are
        # per-polyline by contract — cumlen order must stay per-user
        # for bit-stable interpolation vs the windowed-SQL oracle)
        n = t.num_rows
        u = len(starts)
        wx = t["wx"].to_numpy() if n else np.empty(0)
        wy = t["wy"].to_numpy() if n else np.empty(0)
        uid = t["user_id"].to_numpy() if n else np.empty(0, np.int64)
        ends = np.r_[starts[1:], n] if u else starts
        mx = np.empty(u); my = np.empty(u)
        qx = np.empty(u); qy = np.empty(u)
        pl = np.empty(u)
        for i in range(u):
            s, e = int(starts[i]), int(ends[i])
            coords = np.column_stack([wx[s:e], wy[s:e]])
            mid = line_midpoint(coords)
            q1 = point_along_line(coords, 0.25)
            if e - s >= 2:
                part = partial_line(coords, 0.25, 0.75)
                d = np.diff(part, axis=0)
                # length of partialLine(0.25, 0.75) — exactly half the
                # total length, a CONTINUOUS check of the vertex
                # selection + interpolation
                pl[i] = float(np.hypot(d[:, 0], d[:, 1]).sum())
            else:
                pl[i] = 0.0
            mx[i], my[i] = mid
            qx[i], qy[i] = q1
        return pa.table({
            "user_id": pa.array(uid[starts] if u else
                                np.empty(0, np.int64)),
            "mid_x": pa.array(round_half_away(mx, 6)),
            "mid_y": pa.array(round_half_away(my, 6)),
            "q1_x": pa.array(round_half_away(qx, 6)),
            "q1_y": pa.array(round_half_away(qy, 6)),
            "partial_len": pa.array(round_half_away(pl, 4)),
        })

    return user_segment_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(pts, batch_format="pyarrow"), segs)


# Edge selection replicates numpy searchsorted(cl, target, 'right')-1 with
# the last-edge cap: the unique edge with cum_start <= target < cum_end,
# else the final edge when target == total.  Interpolation uses the same
# cumsum-difference segment length as geomfn._cumlen-based code.
SQL_GEOM_DERIVATIONS = """
WITH w AS (
    SELECT user_id, event_id, ts,
           ((event_id * 2654435761) % 4294967296) / 4294967296.0 AS wx,
           0.05 + 0.9 * (((event_id * 2246822519) % 4294967296) / 4294967296.0) AS wy
    FROM events),
o AS (SELECT user_id, wx, wy,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM w),
e AS (SELECT a.user_id, a.rn AS i, a.wx AS x0, a.wy AS y0,
             b.wx AS x1, b.wy AS y1,
             sqrt(power(b.wx - a.wx, 2) + power(b.wy - a.wy, 2)) AS step
      FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1),
c AS (SELECT *,
             sum(step) OVER (PARTITION BY user_id ORDER BY i) AS cum_end,
             coalesce(sum(step) OVER (PARTITION BY user_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_start,
             count(*) OVER (PARTITION BY user_id) AS n_edges
      FROM e),
tot AS (SELECT user_id, max(cum_end) AS total FROM c GROUP BY user_id),
t AS (SELECT user_id, 'mid' AS which, 0.5 * total AS target FROM tot
      UNION ALL SELECT user_id, 'q1', 0.25 * total FROM tot),
pick AS (
    SELECT t.user_id, t.which,
           c.x0 + CASE WHEN c.cum_end - c.cum_start = 0 THEN 0.0
                       ELSE (t.target - c.cum_start) / (c.cum_end - c.cum_start)
                  END * (c.x1 - c.x0) AS px,
           c.y0 + CASE WHEN c.cum_end - c.cum_start = 0 THEN 0.0
                       ELSE (t.target - c.cum_start) / (c.cum_end - c.cum_start)
                  END * (c.y1 - c.y0) AS py
    FROM t JOIN c ON c.user_id = t.user_id
    WHERE c.cum_start <= t.target
      AND (t.target < c.cum_end OR c.i = c.n_edges)),
single AS (SELECT user_id, wx, wy FROM o WHERE n = 1)
SELECT u.user_id,
       round(coalesce(m.px, s.wx), 6) AS mid_x,
       round(coalesce(m.py, s.wy), 6) AS mid_y,
       round(coalesce(q.px, s.wx), 6) AS q1_x,
       round(coalesce(q.py, s.wy), 6) AS q1_y,
       round(coalesce(0.5 * tt.total, 0), 4) AS partial_len
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN (SELECT * FROM pick WHERE which = 'mid') m USING (user_id)
LEFT JOIN (SELECT * FROM pick WHERE which = 'q1') q USING (user_id)
LEFT JOIN tot tt USING (user_id)
LEFT JOIN single s USING (user_id)
"""


# ---------------------------------------------------------------------------
# geo_measures — haversine / spherical area / min-zoom / flat location
# ---------------------------------------------------------------------------

def q_geo_measures(sf_dir: str):
    """Per-user geodesic measures over the lat/lon trajectory:
    haversine length (km), spherical bbox-ring area (km², JPL
    algorithm), min-zoom-for-pixel-size of the bbox, and the packed
    node-location encoding of the first point."""
    from ..tilemath.measure import (encode_flat_location, line_length_meters,
                                    min_zoom_for_pixel_size, ring_area_meters)
    from ..tilemath.projection import get_world_x, get_world_y

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        u = (eid * U_MULT) % (1 << 32)
        v = (eid * V_MULT) % (1 << 32)
        wx = u.astype(np.float64) / TWO32
        wy = 0.05 + 0.9 * (v.astype(np.float64) / TWO32)
        return pa.table({
            "user_id": batch["user_id"], "ts": batch["ts"], "event_id": eid,
            "lon": wx * 340 - 170,
            "lat": 72 - wy * 144,
        })

    from ..tilemath.measure import (AREA_FACTOR, RADIANS_PER_DEGREE,
                                    meters_between)
    from .userkey import segment_sums, user_segment_reduce

    def segs(t: pa.Table, starts: np.ndarray) -> pa.Table:
        # fully vectorized over users: reduceat bboxes + masked
        # haversine steps; the 4-edge JPL box-ring area collapses to
        # the same four terms ring_area_meters sums
        n = t.num_rows
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "len_km": pa.array([], pa.float64()),
                             "bbox_km2": pa.array([], pa.float64()),
                             "min_zoom": pa.array([], pa.int64()),
                             "loc0": pa.array([], pa.int64())})
        uid = t["user_id"].to_numpy()
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        steps = np.zeros(n)
        steps[1:] = meters_between(lon[:-1], lat[:-1], lon[1:], lat[1:])
        steps[starts] = 0.0
        len_km = segment_sums(steps, starts) / 1000.0
        x0 = np.minimum.reduceat(lon, starts)
        x1 = np.maximum.reduceat(lon, starts)
        y0 = np.minimum.reduceat(lat, starts)
        y1 = np.maximum.reduceat(lat, starts)
        # ring_area_meters over the closed box ring
        # [x0,x1,x1,x0,x0]×[y0,y0,y1,y1,y0]: the JPL edge terms are
        # (x1-x0)sin(y0), (x0-x1)sin(y1), (x0-x1)sin(y1), (x1-x0)sin(y0)
        dx = (x1 - x0) * RADIANS_PER_DEGREE
        t0 = dx * np.sin(y0 * RADIANS_PER_DEGREE)
        t1 = -dx * np.sin(y1 * RADIANS_PER_DEGREE)
        area = np.abs((t0 + t1) + (t1 + t0)) * AREA_FACTOR
        wx0 = get_world_x(x0)
        wx1 = get_world_x(x1)
        wy0 = get_world_y(y0)
        wy1 = get_world_y(y1)
        size = np.maximum(wx1 - wx0, np.abs(wy0 - wy1))
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "len_km": pa.array(round_half_away(len_km, 6)),
            "bbox_km2": pa.array(round_half_away(area / 1e6, 3)),
            "min_zoom": pa.array(min_zoom_for_pixel_size(size)),
            "loc0": pa.array(encode_flat_location(lon[starts],
                                                  lat[starts])),
        })

    return user_segment_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(pts, batch_format="pyarrow"), segs)


# Spherical bbox-ring area: the JPL edge sum over the closed 5-point box
# ring collapses to 2*(x1-x0)*(sin(y0)-sin(y1)) (radians) — verified
# against tilemath.measure.ring_area_meters in tests/test_queries_geom.py.
from .sqlgen import _merc_y as _MY  # noqa: E402  (shared exact op order)

SQL_GEO_MEASURES = f"""
WITH w AS (
    SELECT user_id, event_id, ts,
           ((event_id * 2654435761) % 4294967296) / 4294967296.0 AS wx,
           0.05 + 0.9 * (((event_id * 2246822519) % 4294967296) / 4294967296.0) AS wy
    FROM events),
p AS (SELECT user_id, event_id, ts,
             wx * 340 - 170 AS lon, 72 - wy * 144 AS lat
      FROM w),
o AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM p),
seg AS (SELECT a.user_id,
               6371008.8 * 2 * asin(sqrt(
                   power(sin((b.lat - a.lat) * pi() / 180 / 2), 2)
                   + power(sin((b.lon - a.lon) * pi() / 180 / 2), 2)
                     * cos(a.lat * pi() / 180) * cos(b.lat * pi() / 180))) AS d
        FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1),
len AS (SELECT user_id, sum(d) AS m FROM seg GROUP BY user_id),
bb AS (SELECT user_id, min(lon) AS x0, max(lon) AS x1,
              min(lat) AS y0, max(lat) AS y1,
              min(rn) AS rn0
       FROM o GROUP BY user_id),
first_pt AS (SELECT user_id, lon, lat FROM o WHERE rn = 1),
mz AS (SELECT user_id,
              greatest((x1 + 180) / 360 - (x0 + 180) / 360,
                       abs(({_MY('y0')})
                         - ({_MY('y1')}))) AS sz,
              abs(2 * (x1 - x0) * pi() / 180
                    * (sin(y0 * pi() / 180) - sin(y1 * pi() / 180)))
                * 6371008.8 * 6371008.8 / 2 AS area_m2
       FROM bb)
SELECT f.user_id,
       round(coalesce(l.m, 0) / 1000.0, 6) AS len_km,
       round(mz.area_m2 / 1000000.0, 3) AS bbox_km2,
       CAST(CASE WHEN mz.sz = 0 THEN 15
                 ELSE least(15, greatest(0, ceil(log2(1.0 / (mz.sz * 256)))))
            END AS BIGINT) AS min_zoom,
       CAST(trunc(((f.lon + 180) / 360 + 1) * 1073741824) AS BIGINT) * 4294967296
         + CAST(trunc(({_MY('f.lat')} + 1)
                      * 1073741824) AS BIGINT) AS loc0
FROM first_pt f
JOIN mz USING (user_id)
LEFT JOIN len l USING (user_id)
"""


# ---------------------------------------------------------------------------
# line_merge_chains — LoopLineMerger over exploded trajectory segments
# ---------------------------------------------------------------------------

def q_line_merge_chains(sf_dir: str):
    """Explode each user's trajectory into individual 2-point segments
    (scrambled order), run the LoopLineMerger degree-2 chain merge, and
    report per-user merged-line stats.  A path graph must merge back to
    exactly ONE polyline with every vertex — oracle = per-user counts
    and the window-summed length (exact-f64 coordinates, injective in
    event_id so the path can never self-touch)."""
    from ..stages.merge import merge_lines

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        u = (eid * U_MULT) % (1 << 32)
        v = (eid * V_MULT) % (1 << 32)
        # exact f64 arithmetic (+,*,/ only — bit-identical in numpy and
        # SQL) with NO grid quantization: the hash→coordinate map stays
        # INJECTIVE in event_id, so a path graph can never self-touch
        # (a quantization collision would create a degree-4 node and
        # break the merge-to-one-line invariant the oracle asserts)
        px = u.astype(np.float64) / TWO32 * 4096.0
        py = (0.05 + 0.9 * (v.astype(np.float64) / TWO32)) * 4096.0
        return pa.table({
            "user_id": batch["user_id"], "ts": batch["ts"], "event_id": eid,
            "px": px, "py": py,
        })

    from .userkey import user_segment_reduce

    def segs_fn(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        u = len(starts)
        px = t["px"].to_numpy() if n else np.empty(0)
        py = t["py"].to_numpy() if n else np.empty(0)
        eid = t["event_id"].to_numpy() if n else np.empty(0, np.int64)
        uid = t["user_id"].to_numpy() if n else np.empty(0, np.int64)
        ends = np.r_[starts[1:], n] if u else starts
        n_lines = np.zeros(u, np.int64)
        n_points = np.zeros(u, np.int64)
        length = np.zeros(u)
        for i in range(u):
            s, e = int(starts[i]), int(ends[i])
            if e - s < 2:
                n_points[i] = e - s
                continue
            coords = np.column_stack([px[s:e], py[s:e]])
            segs = [coords[j:j + 2] for j in range(e - s - 1)]
            # scramble: merge must not depend on input order
            order = np.argsort((eid[s:e - 1] * U_MULT) % (1 << 32),
                               kind="stable")
            merged = merge_lines([segs[j] for j in order], precision=0.0)
            n_lines[i] = len(merged)
            n_points[i] = sum(len(m) for m in merged)
            length[i] = sum(float(np.hypot(*np.diff(m, axis=0).T).sum())
                            for m in merged)
        return pa.table({
            "user_id": pa.array(uid[starts] if u else
                                np.empty(0, np.int64)),
            "n_lines": pa.array(n_lines),
            "n_points": pa.array(n_points),
            "length_px": pa.array(round_half_away(length, 6)),
        })

    return user_segment_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(pts, batch_format="pyarrow"), segs_fn)


SQL_LINE_MERGE_CHAINS = """
WITH w AS (
    SELECT user_id, event_id, ts,
           ((event_id * 2654435761) % 4294967296) / 4294967296.0
             * 4096 AS px,
           (0.05 + 0.9 * (((event_id * 2246822519) % 4294967296)
                          / 4294967296.0)) * 4096 AS py
    FROM events),
o AS (SELECT user_id, px, py,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM w),
seg AS (SELECT a.user_id,
               sqrt(power(b.px - a.px, 2) + power(b.py - a.py, 2)) AS d
        FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1)
SELECT o.user_id,
       CAST(CASE WHEN max(o.n) < 2 THEN 0 ELSE 1 END AS BIGINT) AS n_lines,
       CAST(max(o.n) AS BIGINT) AS n_points,
       round(coalesce((SELECT sum(d) FROM seg s WHERE s.user_id = o.user_id), 0),
             6) AS length_px
FROM o GROUP BY o.user_id
"""


# ---------------------------------------------------------------------------
# line_merge_scaled — extra-precision line merge + VectorTile.unscale
# ---------------------------------------------------------------------------

def q_line_merge_scaled(sf_dir: str):
    """The reference's scaled-line pathway end-to-end
    (``FeatureRenderer.java:260-269`` + ``VectorTile.java:113-200``):
    trajectory vertices live on a FINE ``16·2^8`` sub-grid (z6 with
    maxzoom 14 → scale 8) as ``lattice-point + jitter`` where the
    jitter is representable only at the fine grid; segments are
    scrambled, merged at full fine precision (no artificial rounding
    collisions), then unscaled — every vertex rounds half-up to the
    base 1/16-px grid, consecutive vertices collapsing onto the same
    lattice point dedup, and degenerate lines drop.  Per-user stats
    over the unscaled output; oracle replays the walk with window
    functions."""
    from ..stages.merge import (line_extra_precision_scale, merge_lines,
                                unscale_lines)

    S = line_extra_precision_scale(6)          # = 8
    fine = 16.0 * (1 << S)                     # 4096 sub-steps per px

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        u = (eid * U_MULT) % (1 << 32)
        v = (eid * V_MULT) % (1 << 32)
        # lattice point (0..39); the fine-grid jitter is added per-user
        # from the vertex rank so fine coords are INJECTIVE within a
        # user (no accidental revisit nodes in the merge graph)
        return pa.table({
            "user_id": batch["user_id"], "ts": batch["ts"], "event_id": eid,
            "kx": ((u >> 8) % 40).astype(np.float64),
            "ky": ((v >> 8) % 40).astype(np.float64),
        })

    from .userkey import user_segment_reduce

    def segs_fn(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n = t.num_rows
        u = len(starts)
        kx = t["kx"].to_numpy() if n else np.empty(0)
        ky = t["ky"].to_numpy() if n else np.empty(0)
        eid = t["event_id"].to_numpy() if n else np.empty(0, np.int64)
        uid = t["user_id"].to_numpy() if n else np.empty(0, np.int64)
        ends = np.r_[starts[1:], n] if u else starts
        n_lines = np.zeros(u, np.int64)
        n_points = np.zeros(u, np.int64)
        length = np.zeros(u)
        for i in range(u):
            s, e = int(starts[i]), int(ends[i])
            if e - s < 2:
                continue
            # jitter in [-1/32, 1/32) px on the fine grid, injective in
            # the rank for < 65536 vertices: every jittered variant
            # rounds back to its lattice point, so the unscale walk
            # collapses consecutive same-lattice vertices
            rn = np.arange(1, e - s + 1, dtype=np.int64)
            px = kx[s:e] + ((rn % 256) - 128) / fine
            py = ky[s:e] + (((rn >> 8) % 256) - 128) / fine
            coords = np.column_stack([px, py])
            segs = [coords[j:j + 2] for j in range(e - s - 1)]
            order = np.argsort((eid[s:e - 1] * U_MULT) % (1 << 32),
                               kind="stable")
            merged = merge_lines([segs[j] for j in order], precision=0.0)
            out = unscale_lines(merged, S)
            n_lines[i] = len(out)
            n_points[i] = sum(len(m) for m in out)
            length[i] = sum(float(np.hypot(*np.diff(m, axis=0).T).sum())
                            for m in out)
        return pa.table({
            "user_id": pa.array(uid[starts] if u else
                                np.empty(0, np.int64)),
            "n_lines": pa.array(n_lines),
            "n_points": pa.array(n_points),
            "length_px": pa.array(round_half_away(length, 6)),
        })

    return user_segment_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(pts, batch_format="pyarrow"), segs_fn)


SQL_LINE_MERGE_SCALED = """
WITH w AS (
    SELECT user_id, event_id, ts,
           (event_id * 2654435761) % 4294967296 AS u,
           (event_id * 2246822519) % 4294967296 AS v
    FROM events),
r0 AS (SELECT user_id, event_id, ts,
              CAST((u // 256) % 40 AS DOUBLE) AS kx,
              CAST((v // 256) % 40 AS DOUBLE) AS ky,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS rn
       FROM w),
-- rank-injective fine-grid jitter: fine coords are unique within a
-- user, so the merge graph is a clean path with no revisit nodes
p AS (SELECT user_id, rn,
             kx + ((rn % 256) - 128) / 4096.0 AS px,
             ky + (((rn // 256) % 256) - 128) / 4096.0 AS py
      FROM r0),
f AS (SELECT user_id, rn, px, py,
             floor(px * 16 + 0.5) / 16 AS rx,
             floor(py * 16 + 0.5) / 16 AS ry
      FROM p),
-- unscale walk: consecutive vertices rounding to the same base-grid
-- point collapse (VectorTile.java:174-178)
g AS (SELECT *, lag(rx) OVER uw2 AS prx, lag(ry) OVER uw2 AS pry
      FROM f WINDOW uw2 AS (PARTITION BY user_id ORDER BY rn)),
h AS (SELECT user_id, rn, rx, ry FROM g
      WHERE prx IS NULL OR rx != prx OR ry != pry),
hh AS (SELECT *, lag(rx) OVER uw3 AS lrx, lag(ry) OVER uw3 AS lry
       FROM h WINDOW uw3 AS (PARTITION BY user_id ORDER BY rn)),
st AS (SELECT user_id, count(*) AS cnt,
              coalesce(sum(sqrt(power(rx - lrx, 2) + power(ry - lry, 2))), 0)
                AS len
       FROM hh GROUP BY user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN coalesce(st.cnt, 0) >= 2 THEN 1 ELSE 0 END AS BIGINT)
         AS n_lines,
       CAST(CASE WHEN coalesce(st.cnt, 0) >= 2 THEN st.cnt ELSE 0 END AS BIGINT)
         AS n_points,
       round(CASE WHEN coalesce(st.cnt, 0) >= 2 THEN st.len ELSE 0 END, 6)
         AS length_px
FROM u LEFT JOIN st USING (user_id)
"""


# ---------------------------------------------------------------------------
# geojson_roundtrip — NDJSON serialize → read_geojson → placement stats
# ---------------------------------------------------------------------------

def q_geojson_roundtrip(sf_dir: str):
    """GeoJSON/NDJSON reader round trip, oracle-checked
    (``reader/geojson/GeoJsonReader.java`` semantics): events become
    NDJSON Features (even ids → Point, odd ids → axis-aligned bbox
    Polygon) written as sharded files from ``map_batches``, read back
    through :func:`sources.geojson.read_geojson` (text → feature parse
    → world-mercator georeference), then aggregated per caption.  The
    oracle recomputes the x-side placement with the identical float op
    sequence; JSON float serialization is shortest-round-trip so the
    doubles survive the text hop bit-for-bit.  (The y side goes through
    ``get_world_y``'s transcendentals — compared elsewhere
    (``tile_assign_z14``) and left out of this query's aggregates.)"""
    import hashlib
    import json
    import os
    import shutil
    # (shard names are deterministic; no uuid needed)

    from ..sources.geojson import read_geojson
    from ..tilemath.projection import get_world_lon

    out_dir = os.path.join("/tmp/planetiler_ray_geojson",
                           hashlib.sha1(sf_dir.encode()).hexdigest()[:12])
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        u = (eid * U_MULT) % (1 << 32)
        wx = u.astype(np.float64) / TWO32
        lon = get_world_lon(wx)
        dx = ((eid % 13) + 1) / 1000.0
        lat = 10.0 + (eid % 50) * 0.5
        lines = []
        for i in range(len(eid)):
            e = int(eid[i])
            props = {"id": f"evt{e}", "caption": f"cap{e % 7}"}
            if e % 2 == 1:
                x0, x1 = float(lon[i] - dx[i]), float(lon[i] + dx[i])
                y0, y1 = float(lat[i] - dx[i]), float(lat[i] + dx[i])
                geom = {"type": "Polygon",
                        "coordinates": [[[x0, y0], [x1, y0], [x1, y1],
                                         [x0, y1], [x0, y0]]]}
            else:
                geom = {"type": "Point",
                        "coordinates": [float(lon[i]), float(lat[i])]}
            lines.append(json.dumps({"type": "Feature", "geometry": geom,
                                     "properties": props}))
        # deterministic name keyed by the batch content + atomic rename:
        # a Ray task RETRY rewrites the same shard instead of leaving a
        # duplicate uuid-named file that read_geojson would double-count
        key = int(eid[0]) if len(eid) else 0
        path = os.path.join(out_dir,
                            f"shard-{key:012d}-{len(eid)}.ndjson")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    n_written = _read(sf_dir, "events", ["event_id"]) \
        .map_batches(write_shard, batch_format="pyarrow").to_pandas()["n"].sum()
    assert n_written > 0

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        eid = np.array([int(s[3:]) for s in ids], np.int64)
        cx = batch["cx"].to_numpy()
        hw = batch["hw"].to_numpy()
        return pa.table({
            "caption": batch["caption"],
            "is_poly": pa.array((eid % 2 == 1).astype(np.int64)),
            "eid": pa.array(eid),
            "cxg": pa.array(np.floor(cx * 1048576).astype(np.int64)),
            "hwg": pa.array(np.floor(hw * 1048576).astype(np.int64)),
        })

    from ray.data.aggregate import Count, Sum
    out = read_geojson(out_dir) \
        .map_batches(stats, batch_format="pyarrow") \
        .groupby("caption").aggregate(
            Count(alias_name="n"),
            Sum("is_poly", alias_name="n_poly"),
            Sum("eid", alias_name="id_sum"),
            Sum("cxg", alias_name="cx_grid_sum"),
            Sum("hwg", alias_name="hw_grid_sum")).to_pandas()
    for c in ("n", "n_poly", "id_sum", "cx_grid_sum", "hw_grid_sum"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("caption").reset_index(drop=True)


SQL_GEOJSON_ROUNDTRIP = """
WITH w AS (
    SELECT event_id,
           ((event_id * 2654435761) % 4294967296) / 4294967296.0 AS wx
    FROM events),
g AS (SELECT event_id,
             wx * 360 - 180 AS lon,
             ((event_id % 13) + 1) / 1000.0 AS dx,
             event_id % 2 = 1 AS is_poly,
             'cap' || CAST(event_id % 7 AS VARCHAR) AS caption
      FROM w),
-- the reader's placement arithmetic, op for op: point cx = (lon+180)/360;
-- polygon cx/hw from the projected bbox corner mean/half-spread
c AS (SELECT caption, event_id, is_poly,
             CASE WHEN is_poly
                  THEN (((lon - dx) + 180) / 360 + ((lon + dx) + 180) / 360) / 2
                  ELSE (lon + 180) / 360 END AS cx,
             CASE WHEN is_poly
                  THEN (((lon + dx) + 180) / 360 - ((lon - dx) + 180) / 360) / 2
                  ELSE 0.0 END AS hw
      FROM g)
SELECT caption,
       count(*) AS n,
       CAST(sum(CASE WHEN is_poly THEN 1 ELSE 0 END) AS BIGINT) AS n_poly,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       CAST(sum(floor(cx * 1048576)) AS BIGINT) AS cx_grid_sum,
       CAST(sum(floor(hw * 1048576)) AS BIGINT) AS hw_grid_sum
FROM c GROUP BY caption
"""


# ---------------------------------------------------------------------------
# line_smooth — midpoint + Chaikin smoothers over per-user trajectories
# ---------------------------------------------------------------------------

def q_line_smooth(sf_dir: str):
    """Midpoint and dual-midpoint (Chaikin) smoothing over per-user
    trajectories (``geo/MidpointSmoother.java``,
    ``geo/DualMidpointSmoother.java:120-221``; the per-zoom
    GeometryPipeline hook's kernels): one iteration of each, reporting
    vertex count and polyline length per user.  Placement is the
    arithmetic (ts, event_id) trajectory of ``geom_derivations`` so
    the oracle interpolates the same doubles op-for-op."""
    from ..tilemath.simplify import dual_midpoint_smooth, midpoint_smooth

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy()
        u = (eid * U_MULT) % (1 << 32)
        v = (eid * V_MULT) % (1 << 32)
        return pa.table({
            "user_id": batch["user_id"], "ts": batch["ts"], "event_id": eid,
            "wx": u.astype(np.float64) / TWO32,
            "wy": 0.05 + 0.9 * (v.astype(np.float64) / TWO32),
        })

    from .userkey import segment_sums, step_lengths, user_segment_reduce

    def segs_fn(t: pa.Table, starts: np.ndarray) -> pa.Table:
        # the smoothers are natively offset-vectorized (one numpy pass
        # over ALL users' polylines at once) — the whole partition is
        # smoothed with zero per-user Python
        n = t.num_rows
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "chaikin_n": pa.array([], pa.int64()),
                             "chaikin_len": pa.array([], pa.float64()),
                             "mid_n": pa.array([], pa.int64()),
                             "mid_len": pa.array([], pa.float64())})
        uid = t["user_id"].to_numpy()
        vx = t["wx"].to_numpy()
        vy = t["wy"].to_numpy()
        offs = np.r_[starts, n].astype(np.int64)
        cx, cy, co = dual_midpoint_smooth(vx, vy, offs, closed=False,
                                          a=0.25, b=0.75, iters=1)
        mx, my, mo = midpoint_smooth(vx, vy, offs, closed=False,
                                     ratio=0.5, iters=1)

        def lengths(x, y, o):
            st = o[:-1].astype(np.int64)
            return segment_sums(step_lengths(x, y, st, int(o[-1])), st)

        return pa.table({
            "user_id": pa.array(uid[starts]),
            "chaikin_n": pa.array(np.diff(co).astype(np.int64)),
            "chaikin_len": pa.array(round_half_away(lengths(cx, cy, co), 6)),
            "mid_n": pa.array(np.diff(mo).astype(np.int64)),
            "mid_len": pa.array(round_half_away(lengths(mx, my, mo), 6)),
        })

    return user_segment_reduce(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(pts, batch_format="pyarrow"), segs_fn)


SQL_LINE_SMOOTH = """
WITH pts AS (
    SELECT user_id, ts, event_id,
           ((event_id * 2654435761) % 4294967296) / 4294967296.0 AS wx,
           0.05 + 0.9 * (((event_id * 2246822519) % 4294967296)
                         / 4294967296.0) AS wy,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) - 1 AS i,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM events),
nbr AS (
    SELECT *,
           lag(wx) OVER w AS px, lag(wy) OVER w AS py,
           lead(wx) OVER w AS nx, lead(wy) OVER w AS ny
    FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY i)),
-- one Chaikin iteration: endpoints + 2 points per interior vertex
chk AS (
    SELECT user_id, i AS ord, wx AS x, wy AS y FROM nbr
    WHERE i = 0 OR n <= 2
    UNION ALL
    SELECT user_id, 2 * i, px + (wx - px) * 0.75, py + (wy - py) * 0.75
    FROM nbr WHERE n > 2 AND i BETWEEN 1 AND n - 2
    UNION ALL
    SELECT user_id, 2 * i + 1, wx + (nx - wx) * 0.25, wy + (ny - wy) * 0.25
    FROM nbr WHERE n > 2 AND i BETWEEN 1 AND n - 2
    UNION ALL
    SELECT user_id, 2 * n, wx, wy FROM nbr WHERE n > 2 AND i = n - 1),
-- one midpoint iteration: endpoints + one point per edge
mid AS (
    SELECT user_id, i AS ord, wx AS x, wy AS y FROM nbr
    WHERE i = 0 OR n <= 2
    UNION ALL
    SELECT user_id, i + 1, px + (wx - px) * 0.5, py + (wy - py) * 0.5
    FROM nbr WHERE n > 2 AND i >= 1
    UNION ALL
    SELECT user_id, n + 1, wx, wy FROM nbr WHERE n > 2 AND i = n - 1),
cseg AS (
    SELECT user_id, x, y,
           lag(x) OVER (PARTITION BY user_id ORDER BY ord) AS lx,
           lag(y) OVER (PARTITION BY user_id ORDER BY ord) AS ly
    FROM chk),
clen AS (
    SELECT user_id, count(*) AS chaikin_n,
           coalesce(sum(sqrt((x - lx) * (x - lx) + (y - ly) * (y - ly))),
                    0) AS raw_len
    FROM cseg GROUP BY user_id),
mseg AS (
    SELECT user_id, x, y,
           lag(x) OVER (PARTITION BY user_id ORDER BY ord) AS lx,
           lag(y) OVER (PARTITION BY user_id ORDER BY ord) AS ly
    FROM mid),
mlen AS (
    SELECT user_id, count(*) AS mid_n,
           coalesce(sum(sqrt((x - lx) * (x - lx) + (y - ly) * (y - ly))),
                    0) AS raw_len
    FROM mseg GROUP BY user_id)
SELECT c.user_id, c.chaikin_n,
       round(c.raw_len, 6) AS chaikin_len,
       m.mid_n, round(m.raw_len, 6) AS mid_len
FROM clen c JOIN mlen m USING (user_id)
"""


# ---------------------------------------------------------------------------
# ocean_fill_tiles — stripe clip with range-tracked interior fill
# ---------------------------------------------------------------------------

# world-spanning "ocean" rectangle with an island hole; tenth-fraction
# constants keep every scaled coordinate ≥0.1 tile units from tile and
# buffer boundaries at all zooms, so the closed-form oracle is exact
OCEAN = dict(X0=0.1, X1=0.85, Y0=0.3, Y1=0.7,
             H0=0.35, H1=0.55, G0=0.4, G1=0.6)
OCEAN_MAX_Z = 12


def q_ocean_fill_tiles(sf_dir: str):
    """Planet-scale polygon → tiles via the stripe clip
    (``tilemath.stripeclip``; reference ``render/TiledGeometry.java``
    ``:406-699`` + ``CoveredTiles`` ``:748-806``): per zoom, the ocean
    rectangle-with-hole is clipped into boundary-tile fragments plus
    interior fill RUNS — work ∝ boundary crossings, never bbox area.
    Output per zoom: distinct edge (detail) tiles and total filled
    tiles (summed from runs).  The oracle classifies every candidate
    tile with the same float arithmetic.  Candidate counts are logged
    (∝ boundary — the scale property this query gates)."""
    import sys

    import ray.data

    from ..tilemath.stripeclip import slice_polygons_striped

    o = OCEAN

    def slice_z(batch: pa.Table) -> pa.Table:
        out = {"z": [], "edge_tiles": [], "fill_tiles": []}
        for z in batch["z"].to_pylist():
            s = float(1 << z)
            px = np.array([o["X0"], o["X1"], o["X1"], o["X0"],
                           o["H0"], o["H1"], o["H1"], o["H0"]]) * s
            py = np.array([o["Y0"], o["Y0"], o["Y1"], o["Y1"],
                           o["G0"], o["G0"], o["G1"], o["G1"]]) * s
            r = slice_polygons_striped(
                px, py, np.array([0, 4, 8]), z, DEFAULT_BUFFER_PX / 256.0,
                poly_of_ring=np.array([0, 0]))
            out["z"].append(z)
            out["edge_tiles"].append(
                len(set(zip(r["x"].tolist(), r["y"].tolist()))))
            out["fill_tiles"].append(
                int(np.sum(r["fill_y1"] - r["fill_y0"] + 1)))
            sys.stderr.write(
                f"ocean_fill_tiles z={z} candidates={r['n_candidates']} "
                f"fill_runs={len(r['fill_x'])} (boundary-proportional)\n")
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return ray.data.from_items(
        [{"z": z} for z in range(OCEAN_MAX_Z + 1)],
        override_num_blocks=OCEAN_MAX_Z + 1) \
        .map_batches(slice_z, batch_format="pyarrow")


SQL_OCEAN_FILL_TILES = """
WITH zs AS (SELECT unnest(generate_series(0, 12)) AS z),
p AS (SELECT z, CAST(1 << z AS DOUBLE) AS s,
             0.015625 AS b, 0.015625 + 0.1 / 4096 AS nb
      FROM zs),
q AS (SELECT z, s, b, nb,
             0.1 * s AS x0, 0.85 * s AS x1,
             0.3 * s AS ylo, 0.7 * s AS yhi,
             0.35 * s AS h0, 0.55 * s AS h1,
             0.4 * s AS g0, 0.6 * s AS g1
      FROM p),
cols AS (SELECT q.*,
                unnest(generate_series(CAST(floor(x0 - nb) AS BIGINT),
                                       CAST(floor(x1 + nb) AS BIGINT))) AS c
         FROM q),
cells AS (SELECT cols.*,
                 unnest(generate_series(CAST(floor(ylo - nb) AS BIGINT),
                                        CAST(floor(yhi + nb) AS BIGINT))) AS r
          FROM cols),
cls AS (
  SELECT z,
    (c BETWEEN floor(x0 - nb) AND floor(x0 + nb)
     OR c BETWEEN floor(x1 - nb) AND floor(x1 + nb)
     OR r BETWEEN floor(ylo - nb) AND floor(ylo + nb)
     OR r BETWEEN floor(yhi - nb) AND floor(yhi + nb)) AS o_det,
    (c BETWEEN floor(h0 - nb) AND floor(h1 + nb)
     AND CASE WHEN c BETWEEN floor(h0 - nb) AND floor(h0 + nb)
                OR c BETWEEN floor(h1 - nb) AND floor(h1 + nb)
              THEN r BETWEEN floor(g0 - nb) AND floor(g1 + nb)
              ELSE r BETWEEN floor(g0 - nb) AND floor(g0 + nb)
                OR r BETWEEN floor(g1 - nb) AND floor(g1 + nb) END) AS h_det,
    (x0 < c - b AND x1 > c + 1 + b
     AND r BETWEEN floor(ylo + nb) + 1 AND floor(yhi - nb) - 1
     AND NOT (h0 < c - b AND h1 > c + 1 + b
              AND r BETWEEN floor(g0 + nb) + 1 AND floor(g1 - nb) - 1))
      AS in_fill
  FROM cells)
SELECT z,
       CAST(count(*) FILTER (o_det OR h_det) AS BIGINT) AS edge_tiles,
       CAST(count(*) FILTER (in_fill AND NOT o_det AND NOT h_det) AS BIGINT)
         AS fill_tiles
FROM cls GROUP BY z ORDER BY z
"""


# ---------------------------------------------------------------------------
# reader_roundtrip — shapefile / GeoPackage / Natural-Earth readers
# ---------------------------------------------------------------------------

def q_reader_roundtrip(sf_dir: str):
    """Oracle-gate the binary geo READERS end-to-end: deterministic
    point fixtures derived from ``events`` (``sources/geofixtures.py``)
    are written as a shapefile (+shx/dbf), a GeoPackage and a
    Natural-Earth sqlite, read back through each reader
    (``sources/shapefile.py`` / ``sources/gpkg.py`` — the
    ``ShapefileReader.java`` / ``GeoPackageReader.java`` /
    ``NaturalEarthReader.java`` analogs), and summarized per
    (source, rank-bucket): counts, id sums, quantized world-mercator
    coordinate sums and attr-length sums.  The SQL oracle recomputes
    all of it from the events parquet with the same arithmetic."""
    import ray.data

    from ..sources.geofixtures import geo_fixture_dir
    from ..sources.gpkg import read_geopackage, read_naturalearth
    from ..sources.shapefile import read_shapefile

    d = geo_fixture_dir(sf_dir)
    sources = [
        ("shp", read_shapefile(f"{d}/points.shp",
                               attr_cols=["NAME", "RANK"]), "NAME", "RANK"),
        ("gpkg", read_geopackage(f"{d}/points.gpkg",
                                 attr_cols=["name", "rank"]),
         "name", "rank"),
        ("ne", read_naturalearth(f"{d}/natural_earth.sqlite",
                                 attr_cols=["name", "rank"]),
         "name", "rank"),
    ]

    def make_partial(src: str, name_col: str, rank_col: str):
        def partial(batch: pa.Table) -> pa.Table:
            x0 = pa.compute.list_flatten(batch["xs"]).to_numpy()
            y0 = pa.compute.list_flatten(batch["ys"]).to_numpy()
            rank = batch[rank_col].to_numpy()
            nlen = pa.compute.utf8_length(
                batch[name_col]).to_numpy().astype(np.int64)
            bucket = rank % 8
            out = {"src": [], "bucket": [], "n": [], "sum_rank": [],
                   "sxq": [], "syq": [], "sum_namelen": []}
            for b in np.unique(bucket):
                m = bucket == b
                out["src"].append(src)
                out["bucket"].append(int(b))
                out["n"].append(int(m.sum()))
                out["sum_rank"].append(int(rank[m].sum()))
                out["sxq"].append(int(np.floor(
                    x0[m] * 1048576.0).astype(np.int64).sum()))
                out["syq"].append(int(np.floor(
                    y0[m] * 65536.0).astype(np.int64).sum()))
                out["sum_namelen"].append(int(nlen[m].sum()))
            return pa.table({
                "src": pa.array(out["src"], pa.string()),
                "bucket": pa.array(out["bucket"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
                "sum_rank": pa.array(out["sum_rank"], pa.int64()),
                "sxq": pa.array(out["sxq"], pa.int64()),
                "syq": pa.array(out["syq"], pa.int64()),
                "sum_namelen": pa.array(out["sum_namelen"], pa.int64())})
        return partial

    from ray.data.aggregate import Sum

    parts = [ds.map_batches(make_partial(src, nc, rc),
                            batch_format="pyarrow")
             for src, ds, nc, rc in sources]
    ds = parts[0].union(*parts[1:])
    out = ds.groupby(["src", "bucket"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_rank", alias_name="sum_rank"),
        Sum("sxq", alias_name="sxq"),
        Sum("syq", alias_name="syq"),
        Sum("sum_namelen", alias_name="sum_namelen")).to_pandas()
    for c in ("n", "sum_rank", "sxq", "syq", "sum_namelen"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["src", "bucket"]).reset_index(drop=True)


def _sql_reader_roundtrip() -> str:
    from .sqlgen import _merc_y
    return f"""
WITH e AS (SELECT event_id, user_id FROM events ORDER BY event_id LIMIT 400),
g AS (SELECT event_id,
             CAST((event_id*37) % 348 AS DOUBLE) - 174.0 + 0.5 AS lon,
             CAST((user_id*13) % 156 AS DOUBLE) - 78.0 + 0.5 AS lat FROM e),
w AS (SELECT event_id, (lon + 180) / 360 AS wx, {_merc_y('lat')} AS wy FROM g),
a AS (SELECT event_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(event_id) AS BIGINT) AS sum_rank,
             CAST(sum(CAST(floor(wx * 1048576) AS BIGINT)) AS BIGINT) AS sxq,
             CAST(sum(CAST(floor(wy * 65536) AS BIGINT)) AS BIGINT) AS syq,
             CAST(sum(length('e' || CAST(event_id AS VARCHAR))) AS BIGINT)
               AS sum_namelen
      FROM w GROUP BY 1)
SELECT src, bucket, n, sum_rank, sxq, syq, sum_namelen
FROM (VALUES ('shp'), ('gpkg'), ('ne')) s(src) CROSS JOIN a
ORDER BY src, bucket
"""


SQL_READER_ROUNDTRIP = _sql_reader_roundtrip()


GEOM_QUERIES = {
    "sortkey_pack": q_sortkey_pack,
    "zoomfn_values": q_zoomfn_values,
    "geom_derivations": q_geom_derivations,
    "geo_measures": q_geo_measures,
    "line_merge_chains": q_line_merge_chains,
    "line_merge_scaled": q_line_merge_scaled,
    "geojson_roundtrip": q_geojson_roundtrip,
    "ocean_fill_tiles": q_ocean_fill_tiles,
    "line_smooth": q_line_smooth,
    "reader_roundtrip": q_reader_roundtrip,
}

GEOM_ORACLE_SQL = {
    "sortkey_pack": SQL_SORTKEY_PACK,
    "zoomfn_values": SQL_ZOOMFN_VALUES,
    "geom_derivations": SQL_GEOM_DERIVATIONS,
    "geo_measures": SQL_GEO_MEASURES,
    "line_merge_chains": SQL_LINE_MERGE_CHAINS,
    "line_merge_scaled": SQL_LINE_MERGE_SCALED,
    "geojson_roundtrip": SQL_GEOJSON_ROUNDTRIP,
    "ocean_fill_tiles": SQL_OCEAN_FILL_TILES,
    "line_smooth": SQL_LINE_SMOOTH,
    "reader_roundtrip": SQL_READER_ROUNDTRIP,
}
