"""DuckDB-SQL builders mirroring the engine's arithmetic kernels.

The driver's correctness gate runs each ``queries()`` pipeline next to
an ANSI-SQL oracle over the same parquet tables.  Everything the engine
computes arithmetically (splitmix64, FNV-1a, Hilbert bit-tricks, the
deterministic image georeferencing, minhash permutations) is re-derived
here as SQL text so the oracle is an *independent* DuckDB evaluation of
the same public definitions — validated bit-exact against the numpy
kernels in ``tests/test_sqlgen_oracle.py``.

Conventions:

- 64-bit unsigned arithmetic runs in UBIGINT; products that would
  overflow use the 32-bit-half HUGEINT trick (``mulmod``).
- ``xor(UBIGINT, BIGINT)`` promotes to DOUBLE in DuckDB — every operand
  of ``xor`` must be UBIGINT.
- Signed int64 results use the two's-complement wrap (``to_i64``).
"""

from __future__ import annotations

import numpy as np

FNV_INIT = 0xCBF29CE484222325
FNV_PRIME = 1099511628211
MIX_C1 = 0xBF58476D1CE4E5B9
MIX_C2 = 0x94D049BB133111EB
TWO64 = 1 << 64


def mulmod(z: str, c) -> str:
    """``(z * c) mod 2^64`` with z an UBIGINT sql expr, c a 64-bit constant
    or UBIGINT column — 32-bit halves in HUGEINT, wrapped back to UBIGINT."""
    return (f"CAST((( ({z} % 4294967296)::HUGEINT * {c} + "
            f"((({z} // 4294967296)::HUGEINT * {c}) % 4294967296) * 4294967296 )"
            f" % 18446744073709551616) AS UBIGINT)")


def to_i64(v: str) -> str:
    """UBIGINT expr → signed BIGINT (two's-complement wrap)."""
    return (f"CAST(CASE WHEN {v} >= 9223372036854775808 "
            f"THEN {v}::HUGEINT - 18446744073709551616 "
            f"ELSE {v}::HUGEINT END AS BIGINT)")


def mix64_ctes(prefix: str, src: str, keys: str, expr: str,
               out: str = "h") -> str:
    """CTE chain computing splitmix64-finalizer ``mix64(expr)`` from CTE
    ``src``; final CTE is named ``prefix`` with columns ``keys, out``."""
    return f"""
{prefix}_m0 AS (SELECT {keys}, {expr} AS z FROM {src}),
{prefix}_m1 AS (SELECT {keys}, {mulmod('xor(z, z >> 30)', MIX_C1)} AS z FROM {prefix}_m0),
{prefix}_m2 AS (SELECT {keys}, {mulmod('xor(z, z >> 27)', MIX_C2)} AS z FROM {prefix}_m1),
{prefix} AS (SELECT {keys}, xor(z, z >> 31) AS {out} FROM {prefix}_m2)"""


def fnv_step(h: str, byte_expr: str) -> str:
    """One FNV-1a step: ``(h ^ byte) * prime mod 2^64``."""
    return mulmod(f"xor({h}, CAST({byte_expr} AS UBIGINT))", FNV_PRIME)


def fnv_string_expr(col: str) -> str:
    """FNV-1a 64 over an ASCII string column, via list_reduce lambda."""
    codes = f"list_transform(range(1, length({col})+1), i -> ascii(substr({col}, i, 1)))"
    return (f"list_reduce(list_prepend({FNV_INIT}::UBIGINT, {codes}), "
            f"(h, c) -> {fnv_step('h', 'c')})")


def img_id_fnv_ctes(src: str = "documents", key: str = "doc_id") -> str:
    """CTE chain: FNV-1a over the string ``'img' || lpad(doc_id, 8, '0')``
    computed digit-arithmetically (11 chained steps), then mix64 → ``u``.
    Final CTE ``geo_u(doc_id, i, u)``."""
    steps = [f"geo_f0 AS (SELECT {key} AS doc_id, "
             f"{fnv_step(f'{FNV_INIT}::UBIGINT', 105)} AS h FROM {src})"]
    # 'm' 'g' then the 8 decimal digits of doc_id
    for j, c in enumerate((109, 103), start=1):
        steps.append(f"geo_f{j} AS (SELECT doc_id, {fnv_step('h', c)} AS h FROM geo_f{j-1})")
    for d in range(8):
        j = 3 + d
        div = 10 ** (7 - d)
        steps.append(f"geo_f{j} AS (SELECT doc_id, {fnv_step('h', f'48 + (doc_id // {div}) % 10')} AS h FROM geo_f{j-1})")
    chain = ",\n".join(steps)
    return f"""{chain},
{mix64_ctes('geo_uu', 'geo_f10', 'doc_id', 'h', 'u').lstrip()},
geo_u AS (SELECT doc_id, doc_id AS i, u FROM geo_uu)"""


def _interleave16(v: str) -> list[str]:
    """Interleave steps for a 16-bit value → 32-bit spread (one step per
    line, to be chained as SQL expressions over alias ``t``)."""
    return [
        f"(({v} | ({v} << 8)) & 16711935)",           # 0x00FF00FF
        "((t | (t << 4)) & 252645135)",               # 0x0F0F0F0F
        "((t | (t << 2)) & 858993459)",               # 0x33333333
        "((t | (t << 1)) & 1431655765)",              # 0x55555555
    ]


def hilbert_ctes(level: int, src: str, keys: str, x_col: str = "x",
                 y_col: str = "y", out: str = "hpos") -> str:
    """CTE chain computing the per-level Hilbert index of (x, y) — the
    public bit-trick curve (rawrunprotected/hilbert_curves), matching
    ``tilemath/hilbert.py`` / reference ``util/Hilbert.java``.  Final CTE
    ``hil_{out}`` has columns ``keys, out``.  All values < 2^32, UBIGINT."""
    sh = 16 - level
    return f"""
hx0_{out} AS (SELECT {keys},
    ({x_col}::UBIGINT << {sh}) AS hx, ({y_col}::UBIGINT << {sh}) AS hy FROM {src}),
hx1_{out} AS (SELECT {keys}, hx, hy,
    xor(hx, hy) AS a1,
    xor(65535::UBIGINT, xor(hx, hy)) AS b1,
    xor(65535::UBIGINT, hx | hy) AS c1,
    hx & xor(hy, 65535::UBIGINT) AS d1 FROM hx0_{out}),
hx2_{out} AS (SELECT {keys}, hx, hy,
    a1 | (b1 >> 1) AS a,
    xor(a1 >> 1, a1) AS b,
    xor(xor(c1 >> 1, b1 & (d1 >> 1)), c1) AS c,
    xor(xor(a1 & (c1 >> 1), d1 >> 1), d1) AS d FROM hx1_{out}),
hx3_{out} AS (SELECT {keys}, hx, hy,
    xor(a & (a >> 2), b & (b >> 2)) AS a,
    xor(a & (b >> 2), b & (xor(a, b) >> 2)) AS b,
    xor(c, xor(a & (c >> 2), b & (d >> 2))) AS c,
    xor(d, xor(b & (c >> 2), xor(a, b) & (d >> 2))) AS d FROM hx2_{out}),
hx4_{out} AS (SELECT {keys}, hx, hy,
    xor(a & (a >> 4), b & (b >> 4)) AS a,
    xor(a & (b >> 4), b & (xor(a, b) >> 4)) AS b,
    xor(c, xor(a & (c >> 4), b & (d >> 4))) AS c,
    xor(d, xor(b & (c >> 4), xor(a, b) & (d >> 4))) AS d FROM hx3_{out}),
hx5_{out} AS (SELECT {keys}, hx, hy,
    xor(c, xor(a & (c >> 8), b & (d >> 8))) AS c,
    xor(d, xor(b & (c >> 8), xor(a, b) & (d >> 8))) AS d FROM hx4_{out}),
hx6_{out} AS (SELECT {keys}, hx, hy,
    xor(c, c >> 1) AS a, xor(d, d >> 1) AS b FROM hx5_{out}),
hx7_{out} AS (SELECT {keys},
    xor(hx, hy) AS i0,
    b | xor(65535::UBIGINT, xor(hx, hy) | a) AS i1 FROM hx6_{out}),
hx8_{out} AS (SELECT {keys},
    {_nest_interleave('i0')} AS il0,
    {_nest_interleave('i1')} AS il1 FROM hx7_{out}),
hil_{out} AS (SELECT {keys},
    ((((il1 << 1) | il0) & 4294967295) >> {32 - 2 * level}) AS {out}
    FROM hx8_{out})"""


def _nest_interleave(v: str) -> str:
    """Fully-nested 16→32-bit interleave expression."""
    e = f"(({v} | ({v} << 8)) & 16711935)"
    for shift, mask in ((4, 252645135), (2, 858993459), (1, 1431655765)):
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def s2_ctes(level: int, src: str, keys: str, lon_col: str = "lon",
            lat_col: str = "lat", out: str = "cellid") -> str:
    """CTE chain computing S2 cell ids (quadratic projection) of
    (lon, lat) degrees — mirrors ``tilemath/s2.py`` bit-for-bit: cube
    face selection, quadratic ST, MSB-first Hilbert orientation walk via
    the public S2 sub-cell tables expressed as SQL list literals.  Final
    CTE ``s2id_{out}`` has columns ``keys, {out}`` (UBIGINT)."""
    ij2pos = "[0,1,3,2, 0,3,1,2, 2,3,1,0, 2,1,3,0]"
    p2o = "[1,0,0,3]"
    n = 1 << level
    parts = [f"""
s2xyz_{out} AS (SELECT {keys},
    cos(radians({lat_col})) * cos(radians({lon_col})) AS px,
    cos(radians({lat_col})) * sin(radians({lon_col})) AS py,
    sin(radians({lat_col})) AS pz FROM {src}),
s2f0_{out} AS (SELECT {keys}, px, py, pz,
    CASE WHEN abs(px) > abs(py) AND abs(px) > abs(pz) THEN 0
         WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END AS f0
    FROM s2xyz_{out}),
s2face_{out} AS (SELECT {keys}, px, py, pz,
    CASE WHEN (CASE f0 WHEN 0 THEN px WHEN 1 THEN py ELSE pz END) < 0
         THEN f0 + 3 ELSE f0 END AS face FROM s2f0_{out}),
s2uv_{out} AS (SELECT {keys}, face,
    CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py WHEN 2 THEN -px/pz
              WHEN 3 THEN pz/px WHEN 4 THEN pz/py ELSE -py/pz END AS uu,
    CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py WHEN 2 THEN -py/pz
              WHEN 3 THEN py/px WHEN 4 THEN -px/py ELSE -px/pz END AS vv
    FROM s2face_{out}),
s2st_{out} AS (SELECT {keys}, face,
    CASE WHEN uu >= 0 THEN 0.5*sqrt(1+3*uu) ELSE 1-0.5*sqrt(1-3*uu) END AS s,
    CASE WHEN vv >= 0 THEN 0.5*sqrt(1+3*vv) ELSE 1-0.5*sqrt(1-3*vv) END AS t
    FROM s2uv_{out}),
s2ij_{out} AS (SELECT {keys}, face,
    LEAST(GREATEST(CAST(floor(s*{n}) AS BIGINT), 0), {n - 1}) AS i,
    LEAST(GREATEST(CAST(floor(t*{n}) AS BIGINT), 0), {n - 1}) AS j
    FROM s2st_{out}),
s2w{level}_{out} AS (SELECT {keys}, face, i, j,
    (face % 2) AS orient, 0::UBIGINT AS pos FROM s2ij_{out})"""]
    for k in range(level - 1, -1, -1):
        lk = f"(orient*4 + ((i>>{k})&1)*2 + ((j>>{k})&1) + 1)"
        p = f"({ij2pos})[{lk}]"
        parts.append(f"""
s2w{k}_{out} AS (SELECT {keys}, face, i, j,
    xor(orient, CAST(({p2o})[{p} + 1] AS BIGINT)) AS orient,
    pos*4::UBIGINT + CAST({p} AS UBIGINT) AS pos FROM s2w{k + 1}_{out})""")
    lsb = 1 << (2 * (30 - level))
    parts.append(f"""
s2id_{out} AS (SELECT {keys},
    CAST(face AS UBIGINT) * 2305843009213693952::UBIGINT
      + pos * {2 * lsb}::UBIGINT + {lsb}::UBIGINT AS {out} FROM s2w0_{out})""")
    return ",".join(parts)


def zoom_start(z: int) -> int:
    """Prefix sum of 4^k for k<z (``TileCoord.startIndexForZoom``)."""
    return ((4 ** z) - 1) // 3


# ---------------------------------------------------------------------------
# deterministic image georeferencing (fixtures.georef_from_ids in SQL)
# ---------------------------------------------------------------------------

# city hotspot centers (fixtures.CITY_CENTERS)
_CITIES = [(-74.0, 40.7), (2.35, 48.85), (139.7, 35.7), (-0.13, 51.5), (151.2, -33.9)]


def georef_ctes(src: str = "documents") -> str:
    """CTE chain deriving the chip placement (cx, cy, hw, hh) from doc_id,
    mirroring ``fixtures.georef_from_ids`` exactly.  Final CTE
    ``geo(doc_id, i, cx, cy, hw, hh)``."""
    clon = "CASE (i // 10) % 5 " + " ".join(
        f"WHEN {k} THEN CAST({c[0]!r} AS DOUBLE)" for k, c in enumerate(_CITIES)) + " END"
    clat = "CASE (i // 10) % 5 " + " ".join(
        f"WHEN {k} THEN CAST({c[1]!r} AS DOUBLE)" for k, c in enumerate(_CITIES)) + " END"
    return f"""{img_id_fnv_ctes(src)},
geo_base AS (SELECT doc_id, i, u,
    (CASE i % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END) * pow(2.0, -22) / 2 AS hw,
    (CASE (i // 3) % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 48 END) * pow(2.0, -22) / 2 AS hh,
    CAST(u % 67108864 AS DOUBLE) / 67108864 AS cx0,
    -0.05 + 1.1 * (CAST((u // 67108864) % 67108864 AS DOUBLE) / 67108864) AS cy0
    FROM geo_u),
geo_hot AS (SELECT doc_id, i, u, hw, hh,
    CASE WHEN i % 10 < 3 THEN
        (({clon} + 0.2 * (CAST((u // 1099511627776) % 8192 AS DOUBLE) / 8192 - 0.5)) + 180) / 360
    ELSE cx0 END AS cx1,
    CASE WHEN i % 10 < 3 THEN
        0.5 - 0.25 * ln((1 + sin(radians({clat} + 0.2 * (CAST((u // 1125899906842624) % 8192 AS DOUBLE) / 8192 - 0.5))))
                      / (1 - sin(radians({clat} + 0.2 * (CAST((u // 1125899906842624) % 8192 AS DOUBLE) / 8192 - 0.5))))) / pi()
    ELSE cy0 END AS cy1
    FROM geo_base),
geo AS (SELECT doc_id, i, hw, hh,
    CASE WHEN i % 97 = 0 THEN 1.0 - hw * (CAST((u // 1073741824) % 1024 AS DOUBLE) / 1024)
         ELSE cx1 END AS cx,
    CASE WHEN i % 97 = 0 THEN least(greatest(cy1, 0.05), 0.95) ELSE cy1 END AS cy
    FROM geo_hot)"""


# stripe-clip constants (tilemath/clip.py)
NB = 4.0 / 256 + 0.1 / 4096          # buffer + neighbor epsilon (tile units)
EPS_PX = (0.1 / 4096) * 256          # 0.00625
BPX = 4.0                            # buffer px


def sql_image_pyramid_stats(max_zoom: int = 10,
                            label_grid_limit: int = 4) -> str:
    """Oracle for the flagship ``image_pyramid_stats`` query: per-zoom
    tile/feature counts of the z0..max_zoom pyramid over the
    doc-id-derived image table — box stripe-clip (+buffer, antimeridian
    wrap, min-pixel gate) and point fan-out with the label-grid density
    limit, all re-derived in SQL windows."""
    return f"""
WITH {georef_ctes().lstrip()},
zz AS (SELECT unnest(range(0, {max_zoom + 1})) AS z),
gz AS (SELECT g.*, zz.z, CAST(1 << zz.z AS DOUBLE) AS f,
              (CAST(1 AS BIGINT) << zz.z) AS nt
       FROM geo g CROSS JOIN zz),
bg AS (SELECT * FROM gz WHERE 2 * greatest(hw, hh) * f * 256 >= 1.0 OR z = {max_zoom}),
bb AS (SELECT i, z, nt, (cx - hw) * f AS x0, (cy - hh) * f AS y0,
              (cx + hw) * f AS x1, (cy + hh) * f AS y1 FROM bg),
bxx AS (SELECT *, unnest(generate_series(
          CASE WHEN CAST(floor(x1 + {NB!r}) AS BIGINT) - (CAST(floor(x0 - {NB!r}) AS BIGINT)) >= nt THEN greatest(CAST(floor(x0 - {NB!r}) AS BIGINT), 0)
               ELSE CAST(floor(x0 - {NB!r}) AS BIGINT) END,
          CASE WHEN CAST(floor(x1 + {NB!r}) AS BIGINT) - (CAST(floor(x0 - {NB!r}) AS BIGINT)) >= nt THEN least(CAST(floor(x1 + {NB!r}) AS BIGINT), nt - 1)
               ELSE CAST(floor(x1 + {NB!r}) AS BIGINT) END)) AS gx FROM bb),
bxy AS (SELECT *, unnest(generate_series(greatest(0, CAST(floor(y0 - {NB!r}) AS BIGINT)),
          least(nt - 1, CAST(floor(y1 + {NB!r}) AS BIGINT)))) AS gy FROM bxx),
bfr AS (SELECT DISTINCT z, ((gx % nt) + nt) % nt AS x, gy AS y, i
        FROM bxy
        WHERE least((x1 - gx) * 256, 256 + {BPX!r}) - greatest((x0 - gx) * 256, -{BPX!r}) > -{EPS_PX!r}
          AND least((y1 - gy) * 256, 256 + {BPX!r}) - greatest((y0 - gy) * 256, -{BPX!r}) > -{EPS_PX!r}),
pp AS (SELECT i, z, nt, cx * f AS px, cy * f AS py FROM gz),
pxx AS (SELECT *, unnest(generate_series(CAST(floor(px - {NB!r}) AS BIGINT),
                                         CAST(floor(px + {NB!r}) AS BIGINT))) AS gx FROM pp),
pxy AS (SELECT *, unnest(generate_series(greatest(0, CAST(floor(py - {NB!r}) AS BIGINT)),
          least(nt - 1, CAST(floor(py + {NB!r}) AS BIGINT)))) AS gy FROM pxx),
pfr AS (SELECT DISTINCT z, nt, ((gx % nt) + nt) % nt AS x, gy AS y, i, px, py
        FROM pxy),
prank AS (SELECT z, x, y, i,
    row_number() OVER (PARTITION BY z, x, y,
        CAST(floor((CASE WHEN mod(px, CAST(nt AS DOUBLE)) < 0
                         THEN mod(px, CAST(nt AS DOUBLE)) + nt
                         ELSE mod(px, CAST(nt AS DOUBLE)) END) / 0.125) AS BIGINT),
        CAST(floor(py / 0.125) AS BIGINT)
        ORDER BY i % 1000, i) AS rn
    FROM pfr WHERE z < {max_zoom}),
pkeep AS (SELECT z, x, y, i FROM prank WHERE rn <= {label_grid_limit}),
pmax AS (SELECT DISTINCT z, x, y, i FROM pfr WHERE z = {max_zoom}),
allf AS (SELECT z, x, y, i FROM bfr
         UNION ALL SELECT z, x, y, i FROM pkeep
         UNION ALL SELECT z, x, y, i FROM pmax)
SELECT z, count(DISTINCT (x, y)) AS n_tiles, count(*) AS n_features
FROM allf GROUP BY z
"""


def sql_image_spatial_join(zoom: int = 12, k: int = 3) -> str:
    """Oracle for the flagship ``image_spatial_join_z12`` query: box
    footprint × z-tile intersection join + per-tile kNN caption ranks
    (distance of chip centroid to tile center, ties by image_id)."""
    nt = 1 << zoom
    return f"""
WITH {georef_ctes().lstrip()},
bb AS (SELECT doc_id, i, cx, cy,
              (cx - hw) * {nt} AS x0, (cy - hh) * {nt} AS y0,
              (cx + hw) * {nt} AS x1, (cy + hh) * {nt} AS y1 FROM geo),
bxx AS (SELECT *, unnest(generate_series(
          CASE WHEN CAST(floor(x1 + {NB!r}) AS BIGINT) - (CAST(floor(x0 - {NB!r}) AS BIGINT)) >= {nt} THEN greatest(CAST(floor(x0 - {NB!r}) AS BIGINT), 0)
               ELSE CAST(floor(x0 - {NB!r}) AS BIGINT) END,
          CASE WHEN CAST(floor(x1 + {NB!r}) AS BIGINT) - (CAST(floor(x0 - {NB!r}) AS BIGINT)) >= {nt} THEN least(CAST(floor(x1 + {NB!r}) AS BIGINT), {nt} - 1)
               ELSE CAST(floor(x1 + {NB!r}) AS BIGINT) END)) AS gx FROM bb),
bxy AS (SELECT *, unnest(generate_series(greatest(0, CAST(floor(y0 - {NB!r}) AS BIGINT)),
          least({nt - 1}, CAST(floor(y1 + {NB!r}) AS BIGINT)))) AS gy FROM bxx),
fr AS (SELECT doc_id, i, cx, cy, ((gx % {nt}) + {nt}) % {nt} AS x, gy AS y
       FROM bxy
       WHERE least((x1 - gx) * 256, 256 + {BPX!r}) - greatest((x0 - gx) * 256, -{BPX!r}) > -{EPS_PX!r}
         AND least((y1 - gy) * 256, 256 + {BPX!r}) - greatest((y0 - gy) * 256, -{BPX!r}) > -{EPS_PX!r}),
rk AS (SELECT doc_id, x, y,
              row_number() OVER (PARTITION BY x, y
                  ORDER BY sqrt((cx - (x + 0.5)/{nt}) * (cx - (x + 0.5)/{nt})
                              + (cy - (y + 0.5)/{nt}) * (cy - (y + 0.5)/{nt})),
                           doc_id) AS rn
       FROM fr)
SELECT CAST({zoom_start(zoom)} + x * {nt} + ({nt - 1} - y) AS BIGINT) AS tile_id,
       CAST({zoom} AS TINYINT) AS z,
       CAST(x AS INTEGER) AS x, CAST(y AS INTEGER) AS y,
       'img' || lpad(CAST(rk.doc_id AS VARCHAR), 8, '0') AS image_id,
       d.text AS caption,
       CAST(CASE WHEN rn <= {k} THEN rn ELSE 0 END AS TINYINT) AS knn_rank
FROM rk JOIN documents d ON d.doc_id = rk.doc_id
"""


def sql_line_tile_summary(zoom: int = 4) -> str:
    """Oracle for ``line_tiles_z4``: per-tile part/vertex counts and MVT
    geometry command sums of the stripe-clipped trajectory polylines —
    Liang-Barsky interval clipping, part stitching and zigzag-delta
    encoding re-derived in SQL windows."""
    nt = 1 << zoom
    source = f"""w AS (
    SELECT user_id, ts, event_id,
           (((event_id * 2654435761) % 4294967296) / 4294967296.0) * {nt} AS px,
           (0.05 + 0.9 * (((event_id * 2246822519) % 4294967296) / 4294967296.0)) * {nt} AS py
    FROM events),
o AS (SELECT user_id, px, py,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM w)"""
    return _line_clip_sql(source, zoom)


def sql_osm_line_tiles(zoom: int = 6) -> str:
    """Oracle for ``osm_line_tiles``: generic OSM-world ways rendered as
    the MVT line layer — the same Liang-Barsky clip/encode replay as
    ``sql_line_tile_summary``, sourced from the formula-derived way
    vertices (``osmworld.py``)."""
    nt = 1 << zoom
    source = f"""p AS (SELECT count(*) AS n_docs, 4 * count(*) AS n_nodes FROM documents),
w0 AS (SELECT CAST(row_number() OVER () AS BIGINT) AS w FROM documents),
rr AS (SELECT w0.w, g.k, 1 + (w0.w * 7919 + g.k * 104729) % p.n_nodes AS ni
       FROM w0, p, generate_series(0, 7) AS g(k)
       WHERE g.k <= 3 + w0.w % 4),
ll AS (SELECT w, k,
        1e-9 * (100 * ((ni * 2654435761) % 3400000000 - 1700000000)) AS lon,
        1e-9 * (100 * ((ni * 2246822519) % 1600000000 - 800000000)) AS lat
       FROM rr),
o AS (SELECT w AS user_id, k + 1 AS rn,
        ((lon + 180) / 360) * {nt} AS px,
        ({_merc_y('lat')}) * {nt} AS py
      FROM ll)"""
    return _line_clip_sql(source, zoom)


def _line_clip_sql(source_cte: str, zoom: int) -> str:
    """Liang-Barsky stripe-clip + MVT command-sum replay over a source
    CTE chain ending in ``o(user_id, rn, px, py)`` — px/py in tile
    units at ``zoom``, rn consecutive per line."""
    nt = 1 << zoom
    buf = 4.0 / 256
    qax = _q("(ax + t0 * dx - gx) * 256")
    qay = _q("(ay + t0 * dy - gy) * 256")
    qex = _q("(ax + t1 * dx - gx) * 256")
    qey = _q("(ay + t1 * dy - gy) * 256")
    return f"""
WITH {source_cte},
seg AS (SELECT user_id, rn AS s, px AS ax, py AS ay,
               lead(px) OVER (PARTITION BY user_id ORDER BY rn) AS bx,
               lead(py) OVER (PARTITION BY user_id ORDER BY rn) AS by
        FROM o QUALIFY bx IS NOT NULL),
sd AS (SELECT *, bx - ax AS dx, by - ay AS dy FROM seg),
cx AS (SELECT *, unnest(generate_series(
          CASE WHEN CAST(floor(greatest(ax, bx) + {buf + 0.1/4096!r}) AS BIGINT) - (CAST(floor(least(ax, bx) - {buf + 0.1/4096!r}) AS BIGINT)) >= {nt} THEN greatest(CAST(floor(least(ax, bx) - {buf + 0.1/4096!r}) AS BIGINT), 0)
               ELSE CAST(floor(least(ax, bx) - {buf + 0.1/4096!r}) AS BIGINT) END,
          CASE WHEN CAST(floor(greatest(ax, bx) + {buf + 0.1/4096!r}) AS BIGINT) - (CAST(floor(least(ax, bx) - {buf + 0.1/4096!r}) AS BIGINT)) >= {nt} THEN least(CAST(floor(greatest(ax, bx) + {buf + 0.1/4096!r}) AS BIGINT), {nt} - 1)
               ELSE CAST(floor(greatest(ax, bx) + {buf + 0.1/4096!r}) AS BIGINT) END)) AS gx
       FROM sd),
cy AS (SELECT *, unnest(generate_series(
           greatest(0, CAST(floor(least(ay, by) - {buf + 0.1/4096!r}) AS BIGINT)),
           least({nt - 1}, CAST(floor(greatest(ay, by) + {buf + 0.1/4096!r}) AS BIGINT)))) AS gy
       FROM cx),
lb AS (SELECT *,
    greatest(0.0,
      CASE WHEN dx != 0 THEN least((gx - {buf} - ax) / dx, (gx + 1 + {buf} - ax) / dx)
           WHEN ax >= gx - {buf} AND ax <= gx + 1 + {buf} THEN -1e308 ELSE 1e308 END,
      CASE WHEN dy != 0 THEN least((gy - {buf} - ay) / dy, (gy + 1 + {buf} - ay) / dy)
           WHEN ay >= gy - {buf} AND ay <= gy + 1 + {buf} THEN -1e308 ELSE 1e308 END) AS t0,
    least(1.0,
      CASE WHEN dx != 0 THEN greatest((gx - {buf} - ax) / dx, (gx + 1 + {buf} - ax) / dx)
           WHEN ax >= gx - {buf} AND ax <= gx + 1 + {buf} THEN 1e308 ELSE -1e308 END,
      CASE WHEN dy != 0 THEN greatest((gy - {buf} - ay) / dy, (gy + 1 + {buf} - ay) / dy)
           WHEN ay >= gy - {buf} AND ay <= gy + 1 + {buf} THEN 1e308 ELSE -1e308 END) AS t1
    FROM cy),
kept AS (SELECT * FROM lb WHERE t0 <= t1),
marked AS (SELECT *,
    CASE WHEN lag(s) OVER wd IS NULL OR s != lag(s) OVER wd + 1
              OR lag(t1) OVER wd < 1.0 OR t0 > 0.0 THEN 1 ELSE 0 END AS brk,
    {qax} AS qax, {qay} AS qay, {qex} AS qex, {qey} AS qey
    FROM kept WINDOW wd AS (PARTITION BY user_id, gx, gy ORDER BY s)),
pts_p AS (SELECT *, sum(brk) OVER (PARTITION BY user_id, gx, gy ORDER BY s) AS pid
          FROM marked),
contrib AS (SELECT user_id, gx, gy, pid, brk,
    CASE WHEN brk = 1
         THEN {_zz('qax')} + {_zz('qay')} + {_zz('qex - qax')} + {_zz('qey - qay')}
         ELSE {_zz('qex - lag(qex) OVER wp')} + {_zz('qey - lag(qey) OVER wp')} END AS c
    FROM pts_p WINDOW wp AS (PARTITION BY user_id, gx, gy, pid ORDER BY s)),
partagg AS (SELECT user_id, gx, gy, pid, count(*) AS nseg, sum(c) AS dsum
            FROM contrib GROUP BY 1, 2, 3, 4)
SELECT CAST({zoom_start(zoom)} + (((gx % {nt}) + {nt}) % {nt}) * {nt}
            + ({nt - 1} - gy) AS BIGINT) AS tile_id,
       count(*) AS n_parts,
       CAST(sum(nseg + 1) AS BIGINT) AS n_vertices,
       CAST(sum(9 + (2 + nseg * 8) + dsum) AS BIGINT) AS geom_sum
FROM partagg GROUP BY 1
"""


def _sh_pass_sql(idx: int, src: str, axis: str, bound: str,
                 keep_ge: bool) -> str:
    """One Sutherland–Hodgman half-plane pass as SQL text.

    ``src`` rows: (event_id, gx, gy, ord, x, y) — ring vertices ordered
    per (event_id, gx, gy) pair.  Emits the clipped ring with renumbered
    ``ord``; intersection points use the engine's exact formula (clipped
    axis pinned to the bound, other axis interpolated)."""
    other = "y" if axis == "x" else "x"
    cmp_ = ">=" if keep_ge else "<="
    t = f"(({bound}) - p{axis}v) / ({axis} - p{axis}v)"
    isect_other = f"p{other}v + {t} * ({other} - p{other}v)"
    ix = bound if axis == "x" else isect_other
    iy = bound if axis == "y" else isect_other
    return f"""
sh{idx}_p AS (
  SELECT event_id, gx, gy, ord, x, y,
         coalesce(lag(x) OVER wd, last_value(x) OVER wf) AS pxv,
         coalesce(lag(y) OVER wd, last_value(y) OVER wf) AS pyv
  FROM {src}
  WINDOW wd AS (PARTITION BY event_id, gx, gy ORDER BY ord),
         wf AS (PARTITION BY event_id, gx, gy ORDER BY ord
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
sh{idx}_e AS (
  SELECT event_id, gx, gy, ord, unnest(
    CASE
      WHEN {axis} {cmp_} ({bound}) AND p{axis}v {cmp_} ({bound})
        THEN [{{'k': 1, 'x': x, 'y': y}}]
      WHEN {axis} {cmp_} ({bound}) AND NOT (p{axis}v {cmp_} ({bound}))
        THEN [{{'k': 0, 'x': {ix}, 'y': {iy}}}, {{'k': 1, 'x': x, 'y': y}}]
      WHEN NOT ({axis} {cmp_} ({bound})) AND p{axis}v {cmp_} ({bound})
        THEN [{{'k': 0, 'x': {ix}, 'y': {iy}}}]
      ELSE CAST([] AS STRUCT(k INTEGER, x DOUBLE, y DOUBLE)[])
    END) AS v
  FROM sh{idx}_p),
sh{idx} AS (
  SELECT event_id, gx, gy,
         row_number() OVER (PARTITION BY event_id, gx, gy
                            ORDER BY ord, v.k) - 1 AS ord,
         v.x AS x, v.y AS y
  FROM sh{idx}_e)"""


def sql_poly_tile_summary(zoom: int = 5) -> str:
    """Oracle for ``poly_tiles_z5``: general-polygon stripe clip — the
    four Sutherland–Hodgman half-plane passes replayed in SQL windows
    over deterministic per-event triangles, then MVT ring command sums
    (MoveTo + LineTo run + ClosePath, f32-quantized zigzag deltas)."""
    nt = 1 << zoom
    buf = 4.0 / 256
    qx = _q("(x - gx) * 256")
    qy = _q("(y - gy) * 256")
    return f"""
WITH w AS ({{EVENTS}}),
tri AS (SELECT event_id, unnest([0, 1, 2]) AS ord,
               unnest([wx * {nt}, (wx + 0.02 + (event_id % 7) * 0.001) * {nt},
                       (wx + 0.01) * {nt}]) AS x,
               unnest([wy * {nt}, (wy + 0.005) * {nt},
                       (wy + 0.03 + (event_id % 5) * 0.002) * {nt}]) AS y
        FROM w),
bb AS (SELECT event_id, min(x) AS x0, min(y) AS y0, max(x) AS x1, max(y) AS y1
       FROM tri GROUP BY event_id),
cx AS (SELECT *, unnest(generate_series(
          CASE WHEN CAST(floor(x1 + {buf + 0.1/4096!r}) AS BIGINT) - (CAST(floor(x0 - {buf + 0.1/4096!r}) AS BIGINT)) >= {nt} THEN greatest(CAST(floor(x0 - {buf + 0.1/4096!r}) AS BIGINT), 0)
               ELSE CAST(floor(x0 - {buf + 0.1/4096!r}) AS BIGINT) END,
          CASE WHEN CAST(floor(x1 + {buf + 0.1/4096!r}) AS BIGINT) - (CAST(floor(x0 - {buf + 0.1/4096!r}) AS BIGINT)) >= {nt} THEN least(CAST(floor(x1 + {buf + 0.1/4096!r}) AS BIGINT), {nt} - 1)
               ELSE CAST(floor(x1 + {buf + 0.1/4096!r}) AS BIGINT) END)) AS gx
       FROM bb),
cy AS (SELECT *, unnest(generate_series(greatest(0, CAST(floor(y0 - {buf + 0.1/4096!r}) AS BIGINT)),
          least({nt - 1}, CAST(floor(y1 + {buf + 0.1/4096!r}) AS BIGINT)))) AS gy
       FROM cx),
sh0 AS (SELECT c.event_id, c.gx, c.gy, t.ord, t.x, t.y
        FROM cy c JOIN tri t ON t.event_id = c.event_id),
{_sh_pass_sql(1, 'sh0', 'x', f'gx - {buf}', True).lstrip()},
{_sh_pass_sql(2, 'sh1', 'x', f'gx + 1 + {buf}', False).lstrip()},
{_sh_pass_sql(3, 'sh2', 'y', f'gy - {buf}', True).lstrip()},
{_sh_pass_sql(4, 'sh3', 'y', f'gy + 1 + {buf}', False).lstrip()},
ring_sz AS (SELECT event_id, gx, gy, count(*) AS k FROM sh4
            GROUP BY 1, 2, 3 HAVING count(*) >= 3),
qv AS (SELECT s.event_id, s.gx, s.gy, s.ord, r.k,
              {qx} AS qx, {qy} AS qy
       FROM sh4 s JOIN ring_sz r USING (event_id, gx, gy)),
dv AS (SELECT event_id, gx, gy, k,
              CASE WHEN ord = 0 THEN {_zz('qx')} + {_zz('qy')}
                   ELSE {_zz('qx - lag(qx) OVER wd')} + {_zz('qy - lag(qy) OVER wd')}
              END AS c
       FROM qv WINDOW wd AS (PARTITION BY event_id, gx, gy ORDER BY ord)),
ring_sum AS (SELECT event_id, gx, gy, max(k) AS k, sum(c) AS csum
             FROM dv GROUP BY 1, 2, 3),
-- zero-area phantom filter on the quantized grid (exact BIGINT
-- shoelace; mirrors tilemath.clip.slice_polygons bit-for-bit)
area2 AS (SELECT a.event_id, a.gx, a.gy,
                 sum(a.qx * b.qy - b.qx * a.qy) AS a2
          FROM qv a JOIN qv b
            ON b.event_id = a.event_id AND b.gx = a.gx AND b.gy = a.gy
           AND b.ord = (a.ord + 1) % a.k
          GROUP BY 1, 2, 3)
SELECT CAST({zoom_start(zoom)} + (((gx % {nt}) + {nt}) % {nt}) * {nt}
            + ({nt - 1} - gy) AS BIGINT) AS tile_id,
       count(*) AS n_polys,
       CAST(sum(k) AS BIGINT) AS n_vertices,
       CAST(sum(9 + (2 + (k - 1) * 8) + 15 + csum) AS BIGINT) AS geom_sum
FROM ring_sum JOIN area2 USING (event_id, gx, gy)
WHERE a2 <> 0
GROUP BY 1
""".replace("{EVENTS}", _EVENT_WORLD_FOR_POLY)


_EVENT_WORLD_FOR_POLY = """
    SELECT event_id,
           ((event_id * 2654435761) % 4294967296) / 4294967296.0 AS wx,
           0.05 + 0.9 * (((event_id * 2246822519) % 4294967296) / 4294967296.0) AS wy
    FROM events
"""


def _zz(d: str) -> str:
    """Zigzag of a signed BIGINT sql expr."""
    return f"(CASE WHEN ({d}) >= 0 THEN 2*({d}) ELSE -2*({d}) - 1 END)"


def _q(v: str) -> str:
    """Engine quantization: float32 storage, float64 math, round-half-up
    ×16 (px → extent units)."""
    return f"CAST(floor(CAST(CAST(({v}) AS FLOAT) AS DOUBLE) * 16 + 0.5) AS BIGINT)"


def sql_mvt_tile_summary(zoom: int = 6) -> str:
    """Oracle for ``mvt_tiles_z6``: recomputes per-(tile, layer) feature
    counts, the sum of MVT geometry command integers (zigzag +
    quantization + command framing), caption FNV-xor and png counts from
    the placement arithmetic — checked against the engine's DECODED
    protobuf tiles."""
    nt = 1 << zoom
    qx0 = _q("greatest((x0 - gx) * 256, -4.0)")
    qy0 = _q("greatest((y0 - gy) * 256, -4.0)")
    qx1 = _q("least((x1 - gx) * 256, 260.0)")
    qy1 = _q("least((y1 - gy) * 256, 260.0)")
    qpx = _q("(px - gx) * 256")
    qpy = _q("(py - gy) * 256")
    return f"""
WITH {georef_ctes().lstrip()},
bb AS (SELECT doc_id, i, (cx - hw) * {nt} AS x0, (cy - hh) * {nt} AS y0,
              (cx + hw) * {nt} AS x1, (cy + hh) * {nt} AS y1 FROM geo),
bxx AS (SELECT *, unnest(generate_series(
          CASE WHEN CAST(floor(x1 + {NB!r}) AS BIGINT) - (CAST(floor(x0 - {NB!r}) AS BIGINT)) >= {nt} THEN greatest(CAST(floor(x0 - {NB!r}) AS BIGINT), 0)
               ELSE CAST(floor(x0 - {NB!r}) AS BIGINT) END,
          CASE WHEN CAST(floor(x1 + {NB!r}) AS BIGINT) - (CAST(floor(x0 - {NB!r}) AS BIGINT)) >= {nt} THEN least(CAST(floor(x1 + {NB!r}) AS BIGINT), {nt} - 1)
               ELSE CAST(floor(x1 + {NB!r}) AS BIGINT) END)) AS gx FROM bb),
bxy AS (SELECT *, unnest(generate_series(greatest(0, CAST(floor(y0 - {NB!r}) AS BIGINT)),
          least({nt - 1}, CAST(floor(y1 + {NB!r}) AS BIGINT)))) AS gy FROM bxx),
bq AS (SELECT doc_id, i, ((gx % {nt}) + {nt}) % {nt} AS x, gy AS y,
              {qx0} AS qx0, {qy0} AS qy0, {qx1} AS qx1, {qy1} AS qy1
       FROM bxy
       WHERE least((x1 - gx) * 256, 256 + {BPX!r}) - greatest((x0 - gx) * 256, -{BPX!r}) > -{EPS_PX!r}
         AND least((y1 - gy) * 256, 256 + {BPX!r}) - greatest((y0 - gy) * 256, -{BPX!r}) > -{EPS_PX!r}),
bgeo AS (SELECT doc_id, i, x, y, 'chips' AS layer,
                50 + {_zz('qx0')} + {_zz('qy0')} + {_zz('qx1 - qx0')}
                   + {_zz('qy1 - qy0')} + {_zz('qx0 - qx1')} AS gsum
         FROM bq),
pp AS (SELECT doc_id, i, cx * {nt} AS px, cy * {nt} AS py FROM geo),
pxx AS (SELECT *, unnest(generate_series(CAST(floor(px - {NB!r}) AS BIGINT),
                                         CAST(floor(px + {NB!r}) AS BIGINT))) AS gx FROM pp),
pxy AS (SELECT *, unnest(generate_series(greatest(0, CAST(floor(py - {NB!r}) AS BIGINT)),
          least({nt - 1}, CAST(floor(py + {NB!r}) AS BIGINT)))) AS gy FROM pxx),
pgeo AS (SELECT DISTINCT doc_id, i, ((gx % {nt}) + {nt}) % {nt} AS x, gy AS y,
                'labels' AS layer,
                9 + {_zz(qpx)} + {_zz(qpy)} AS gsum
         FROM pxy),
allf AS (SELECT * FROM bgeo UNION ALL SELECT doc_id, i, x, y, layer, gsum FROM pgeo),
fh AS (SELECT doc_id, {fnv_string_expr('text')} AS cap_fnv FROM documents)
SELECT CAST({zoom_start(zoom)} + x * {nt} + ({nt - 1} - y) AS BIGINT) AS tile_id,
       layer, count(*) AS n_features,
       CAST(sum(gsum) AS BIGINT) AS geom_sum,
       {to_i64('bit_xor(cap_fnv)')} AS caption_fnv_xor,
       CAST(sum(CASE WHEN a.doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_png
FROM allf a JOIN fh ON fh.doc_id = a.doc_id
GROUP BY 1, 2
"""


def sql_archive_roundtrip(zoom: int = 6) -> str:
    """Oracle for ``archive_roundtrip``: the ``sql_mvt_tile_summary``
    placement arithmetic replicated once per archive format.  The
    engine side re-derives every stat by DECODING tiles read back out
    of the MBTiles and PMTiles archives, so the whole
    encode→gzip→archive-layout→read→decode chain must be lossless for
    the hashes to line up."""
    inner = sql_mvt_tile_summary(zoom).strip().rstrip(";")
    return f"""
SELECT a.archive, s.*
FROM ({inner}) s
CROSS JOIN (SELECT 'mbtiles' AS archive UNION ALL SELECT 'pmtiles'
            UNION ALL SELECT 'files' UNION ALL SELECT 'csv'
            UNION ALL SELECT 'proto') a
"""


# ---------------------------------------------------------------------------
# minhash permutation parameters (shared with stages.dedup)
# ---------------------------------------------------------------------------

def minhash_params_sql(num_perm: int = 64) -> str:
    """VALUES list (p, a, b) of the engine's mix64-derived permutation
    parameters (``stages.dedup._minhash_params``)."""
    from ..tilemath.hashing import mix64
    p = np.arange(num_perm, dtype=np.uint64)
    a = mix64(2 * p + 1) | np.uint64(1)
    b = mix64(2 * p + 2)
    rows = ", ".join(f"({i}, {int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT)"
                     for i in range(num_perm))
    return f"perms(p, a, b) AS (SELECT * FROM (VALUES {rows}))"


def word_hash_ctes(src: str = "documents", text_col: str = "text",
                   key: str = "doc_id") -> str:
    """CTE chain: per-word ``mix64(fnv1a(word))`` with word ordinality.
    Words = lowercase ``[a-z0-9]+(?:'[a-z]+)?`` matches (stages.text.WORD_RE).
    Final CTE ``wh(doc_id, ord, nw, h)`` (ord is 0-based; nw = word count)."""
    words = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+(''[a-z]+)?')"
    return f"""
wd_l AS (SELECT {key} AS doc_id, {words} AS ws FROM {src}),
wd AS (SELECT doc_id, len(ws) AS nw, unnest(range(len(ws))) AS ord,
              unnest(ws) AS w FROM wd_l),
wd_f AS (SELECT doc_id, nw, ord, {fnv_string_expr('w')} AS f FROM wd),
{mix64_ctes('wh', 'wd_f', 'doc_id, nw, ord', 'f', 'h').lstrip()}"""


def shingle_hash_ctes(shingle: int = 3) -> str:
    """CTE chain (requires ``wh`` from :func:`word_hash_ctes`): per-doc
    3-gram shingle hashes ``sh(doc_id, sh)`` — rolling mix64 combine of
    consecutive word hashes; docs shorter than ``shingle`` words get one
    shingle folding all their words (stages.dedup.shingle_minhash)."""
    assert shingle == 3
    return f"""
sh_j AS (SELECT a.doc_id, a.ord, a.h AS h1, b.h AS h2, c.h AS h3
         FROM wh a JOIN wh b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
                   JOIN wh c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2
         WHERE a.nw >= 3),
{mix64_ctes('sh_s1', 'sh_j', 'doc_id, ord, h2, h3', 'h1', 'm1').lstrip()},
{mix64_ctes('sh_s2', 'sh_s1', 'doc_id, ord, h3', 'xor(m1, h2)', 'm2').lstrip()},
{mix64_ctes('sh_s3', 'sh_s2', 'doc_id, ord', 'xor(m2, h3)', 'm3').lstrip()},
sh_short_w AS (SELECT doc_id, nw, ord, h FROM wh WHERE nw < 3),
sh_short_1 AS (SELECT doc_id, h FROM sh_short_w WHERE nw >= 1 AND ord = 0),
{mix64_ctes('sh_sh1', 'sh_short_1', 'doc_id', 'h', 'm1').lstrip()},
sh_short_2 AS (SELECT a.doc_id, a.m1, b.h AS h2 FROM sh_sh1 a
               JOIN sh_short_w b ON a.doc_id = b.doc_id AND b.ord = 1),
{mix64_ctes('sh_sh2', 'sh_short_2', 'doc_id', 'xor(m1, h2)', 'm2').lstrip()},
sh AS (
  SELECT doc_id, m3 AS sh FROM sh_s3
  UNION ALL
  SELECT a.doc_id, CASE WHEN b.doc_id IS NOT NULL THEN b.m2 ELSE a.m1 END AS sh
  FROM sh_sh1 a LEFT JOIN sh_sh2 b ON a.doc_id = b.doc_id
)"""


def sig_ctes(num_perm: int = 64) -> str:
    """CTE chain (requires ``sh``): per-doc per-perm MinHash signature
    values ``sigv(doc_id, p, v)`` — min over shingles of
    ``(sh·a_p + b_p) mod 2^64``."""
    mm = mulmod("sh", "a")
    return f"""
{minhash_params_sql(num_perm)},
sigv AS (SELECT doc_id, p,
    min(CAST(({mm}::HUGEINT + b) % 18446744073709551616 AS UBIGINT)) AS v
    FROM sh CROSS JOIN perms GROUP BY doc_id, p)"""


def sql_minhash_signatures() -> str:
    """Oracle for ``minhash_signatures``: (doc_id, minhash0, sig_xor)."""
    return f"""
WITH {word_hash_ctes().lstrip()},
{shingle_hash_ctes().lstrip()},
{sig_ctes().lstrip()}
SELECT s0.doc_id, {to_i64('s0.v')} AS minhash0, {to_i64('x.bx')} AS sig_xor
FROM (SELECT doc_id, v FROM sigv WHERE p = 0) s0
JOIN (SELECT doc_id, bit_xor(v) AS bx FROM sigv GROUP BY doc_id) x USING (doc_id)
"""


def sql_simhash_docs() -> str:
    """Oracle for ``simhash_docs``: 64-bit SimHash over the shingle
    stream — per-bit signed votes, sign vector packed to int64."""
    return f"""
WITH {word_hash_ctes().lstrip()},
{shingle_hash_ctes().lstrip()},
cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
bits AS (SELECT doc_id, bb.b AS b,
                sum(CASE WHEN (sh >> bb.b) & (1::UBIGINT) = 1::UBIGINT
                         THEN 1 ELSE 0 END) AS ones
         FROM sh CROSS JOIN (SELECT unnest(range(64)) AS b) bb
         GROUP BY doc_id, bb.b),
sv AS (SELECT bits.doc_id,
              sum(CASE WHEN 2*ones > c THEN (1::UBIGINT << b)::HUGEINT
                       ELSE 0::HUGEINT END) AS s
       FROM bits JOIN cnt USING (doc_id) GROUP BY bits.doc_id)
SELECT doc_id, {to_i64('s')} AS simhash FROM sv
"""


def sql_minhash_lsh_pairs(num_perm: int = 64, bands: int = 8,
                          threshold: float = 0.3) -> str:
    """Oracle for ``minhash_lsh_pairs``: banded LSH buckets over the
    signatures, candidate pairs, est. Jaccard = matching-position
    fraction (exact k/64 on both sides)."""
    rpb = num_perm // bands
    chain = [f"bh_0 AS (SELECT doc_id, p // {rpb} AS band, v AS h "
             f"FROM sigv WHERE p % {rpb} = 0)"]
    for c in range(1, rpb):
        chain.append(
            f"bh_c{c}_j AS (SELECT a.doc_id, a.band, xor(a.h, s.v) AS z "
            f"FROM bh_{c-1} a JOIN sigv s ON s.doc_id = a.doc_id "
            f"AND s.p = a.band*{rpb} + {c})")
        chain.append(mix64_ctes(f"bh_{c}", f"bh_c{c}_j", "doc_id, band",
                                "z", "h").lstrip())
    bh_chain = ",\n".join(chain)
    return f"""
WITH {word_hash_ctes().lstrip()},
{shingle_hash_ctes().lstrip()},
{sig_ctes(num_perm).lstrip()},
{bh_chain},
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bh_{rpb-1} a JOIN bh_{rpb-1} b
           ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
est AS (SELECT c.id_a, c.id_b,
               avg(CASE WHEN sa.v = sb.v THEN 1.0 ELSE 0.0 END) AS est_jaccard
        FROM cand c
        JOIN sigv sa ON sa.doc_id = c.id_a
        JOIN sigv sb ON sb.doc_id = c.id_b AND sb.p = sa.p
        GROUP BY c.id_a, c.id_b)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}
"""


def sql_ngram_jaccard_pairs(threshold: float = 0.5) -> str:
    """Oracle for ``ngram_jaccard_pairs``: exact word-3-gram Jaccard
    with the op's 1-perm MinHash blocking (block = unsigned-min distinct
    shingle hash per doc; pairs only within a block) — the same
    semantics as ``stages.dedup.ngram_jaccard_pairs``."""
    return f"""
WITH {word_hash_ctes().lstrip()},
{shingle_hash_ctes().lstrip()},
d AS (SELECT DISTINCT doc_id, sh FROM sh),
blk AS (SELECT doc_id, min(sh) AS block, count(*) AS c FROM d GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.c AS ca, b.c AS cb
          FROM blk a JOIN blk b ON a.block = b.block AND a.doc_id < b.doc_id),
ix AS (SELECT p.id_a, p.id_b, count(*) AS i
       FROM pairs p
       JOIN d da ON da.doc_id = p.id_a
       JOIN d db ON db.doc_id = p.id_b AND db.sh = da.sh
       GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b,
       round(CAST(ix.i AS DOUBLE) / (p.ca + p.cb - ix.i), 6) AS jaccard
FROM pairs p JOIN ix USING (id_a, id_b)
WHERE CAST(ix.i AS DOUBLE) / (p.ca + p.cb - ix.i) >= {threshold!r}
"""


def sql_doc_fingerprints(window: int = 16) -> str:
    """Oracle for ``doc_fingerprints``: min-sampled Rabin-Karp rolling
    hash over the (ASCII) text bytes, FNV-prime base, mix64-finalized."""
    from ..tilemath.hashing import FNV1_PRIME_64
    pw = np.empty(window, dtype=np.uint64)
    pw[0] = 1
    with np.errstate(over="ignore"):
        for k in range(1, window):
            pw[k] = pw[k - 1] * FNV1_PRIME_64
    terms = " + ".join(
        f"ascii(substr(text, i + {k}, 1))::HUGEINT * {int(pw[window - 1 - k])}"
        for k in range(window))
    return f"""
WITH pos AS (SELECT doc_id, text,
                    unnest(range(1, greatest(length(text) - {window - 1}, 0) + 1)) AS i
             FROM documents),
acc0 AS (SELECT doc_id, CAST(({terms}) % 18446744073709551616 AS UBIGINT) AS z
         FROM pos),
{mix64_ctes('fpm', 'acc0', 'doc_id', 'z', 'h').lstrip()},
fp_long AS (SELECT doc_id, min(h) AS f FROM fpm GROUP BY doc_id),
shrt AS (SELECT doc_id, CAST(length(text) AS UBIGINT) AS z FROM documents
         WHERE length(text) < {window}),
{mix64_ctes('fps', 'shrt', 'doc_id', 'z', 'h').lstrip()},
allfp AS (SELECT doc_id, f FROM fp_long
          UNION ALL SELECT doc_id, h AS f FROM fps)
SELECT doc_id, {to_i64('f')} AS fingerprint FROM allfp
"""


def sql_embedding_near_dup(dim: int = 64, num_planes: int = 6,
                           cosine_threshold: float = 0.2) -> str:
    """Oracle for ``embedding_near_dup``: Rademacher sign-LSH buckets
    (the engine's mix64-derived ±1 planes inlined as literals) +
    in-bucket cosine verify."""
    from ..stages.ann import make_planes
    planes = make_planes(dim, num_planes)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(str(float(v)) for v in planes[j]))
        for j in range(num_planes))
    return f"""
WITH planes(j, s) AS (SELECT * FROM (VALUES {rows})),
bk AS (SELECT e.vec_id,
              sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], p.s) > 0
                       THEN 1 << p.j ELSE 0 END) AS bucket
       FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT p.id_a, p.id_b FROM pairs p
JOIN embeddings ea ON ea.vec_id = p.id_a
JOIN embeddings eb ON eb.vec_id = p.id_b
WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
      >= {cosine_threshold}
"""


def sql_lang_id() -> str:
    """Oracle for ``lang_id``: stopword-profile scores per doc, winner =
    (max score, lexicographically largest lang), 0 → 'und'; counts per
    predicted language."""
    from ..stages.text import STOPWORDS
    sw_rows = ", ".join(f"('{lg}', '{w}')"
                        for lg in sorted(STOPWORDS) for w in sorted(STOPWORDS[lg]))
    lang_rows = ", ".join(f"('{lg}')" for lg in sorted(STOPWORDS))
    return f"""
WITH wl AS (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+(''[a-z]+)?') AS ws
            FROM documents),
wd AS (SELECT doc_id, unnest(ws) AS w FROM wl),
sw(lang, word) AS (SELECT * FROM (VALUES {sw_rows})),
langs(lang) AS (SELECT * FROM (VALUES {lang_rows})),
hits AS (SELECT wd.doc_id, sw.lang, count(*) AS score
         FROM wd JOIN sw ON wd.w = sw.word GROUP BY 1, 2),
sc AS (SELECT d.doc_id, l.lang, coalesce(h.score, 0) AS score
       FROM (SELECT doc_id FROM documents) d
       CROSS JOIN langs l
       LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.lang = l.lang),
best AS (SELECT doc_id, lang, score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang DESC) AS rn
         FROM sc),
pred AS (SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
         FROM best WHERE rn = 1)
SELECT lang_pred, count(*) AS n FROM pred GROUP BY lang_pred
"""


# ---------------------------------------------------------------------------
# OSM world oracles (osmworld.py formulas re-derived via generate_series)
# ---------------------------------------------------------------------------


def _merc_y(lat: str) -> str:
    """World mercator y of a latitude expression — same op order as
    ``tilemath/projection.get_world_y`` (no clamp: |lat| < 85°)."""
    return (f"0.5 - 0.25 * ln((1 + sin(radians({lat}))) / "
            f"(1 - sin(radians({lat})))) / pi()")


def sql_osm_way_stats() -> str:
    """Oracle for ``osm_way_stats``: per generic way of the synthetic
    OSM world (``osmworld.py``), ref/tag counts + world-coord bbox."""
    return f"""
WITH p AS (SELECT count(*) AS n_docs, 4 * count(*) AS n_nodes FROM documents),
w AS (SELECT CAST(row_number() OVER () AS BIGINT) AS w FROM documents),
r AS (SELECT w.w, 1 + (w.w * 7919 + g.k * 104729) % p.n_nodes AS ni
      FROM w, p, generate_series(0, 7) AS g(k)
      WHERE g.k <= 3 + w.w % 4),
c AS (SELECT w,
        1e-9 * (100 * ((ni * 2654435761) % 3400000000 - 1700000000)) AS lon,
        1e-9 * (100 * ((ni * 2246822519) % 1600000000 - 800000000)) AS lat
      FROM r),
v AS (SELECT w, (lon + 180) / 360 AS x, {_merc_y('lat')} AS y FROM c)
SELECT w AS way_id,
       CAST(count(*) AS BIGINT) AS n_refs,
       CAST(CASE WHEN w % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_tags,
       min(x) AS min_x, max(x) AS max_x,
       round(min(y) * 1e9) / 1e9 AS min_y,
       round(max(y) * 1e9) / 1e9 AS max_y
FROM v GROUP BY w
"""


def _grid_x(lon_e7: str) -> str:
    """Integer snap-grid x of a 1e-7° longitude expression —
    ``round(world_x * 1e7)`` as BIGINT (the engine's scale=1e7 snap)."""
    return (f"CAST(round(((1e-9 * (100 * ({lon_e7}))) + 180) / 360 * 1e7) "
            f"AS BIGINT)")


def _grid_y(lat_e7: str) -> str:
    """Integer snap-grid y of a 1e-7° latitude expression."""
    return (f"CAST(round(({_merc_y(f'1e-9 * (100 * ({lat_e7}))')}) * 1e7) "
            f"AS BIGINT)")


def sql_osm_multipolygon_stats() -> str:
    """Oracle for ``osm_multipolygon_stats`` covering all THREE relation
    families of ``osmworld.py`` (square-with-hole, cshape + disjoint
    square, 3-level nesting).  All rings are rectilinear, so each
    ring's 2×shoelace area on the 1e-7 integer snap grid is an exact
    product of grid-coordinate differences; shells count positive,
    holes negative — the column that catches bbox-only hole nesting
    (cshape's disjoint square and nested3's inner island would flip
    sign)."""
    gx = _grid_x
    gy = _grid_y
    return f"""
WITH p AS (SELECT greatest(1, count(*) // 100) AS n_rels FROM documents),
rn AS (SELECT CAST(row_number() OVER () AS BIGINT) AS r FROM documents),
r AS (SELECT rn.r,
        (rn.r * 1076767) % 3000000000 - 1500000000 AS cx,
        (rn.r * 433494437) % 1400000000 - 700000000 AS cy
      FROM rn, p WHERE rn.r <= p.n_rels),
g AS (SELECT r,
        {gx('cx - 200000')} AS xl,  {gx('cx + 200000')} AS xr,
        {gx('cx - 60000')}  AS xhl, {gx('cx + 60000')}  AS xhr,
        {gx('cx')}          AS xc,
        {gx('cx + 70000')}  AS xbl, {gx('cx + 130000')} AS xbr,
        {gx('cx - 120000')} AS xml, {gx('cx + 120000')} AS xmr,
        {gx('cx - 40000')}  AS xil, {gx('cx + 40000')}  AS xir,
        {gy('cy - 200000')} AS yb,  {gy('cy + 200000')} AS yt,
        {gy('cy - 60000')}  AS yhb, {gy('cy + 60000')}  AS yht,
        {gy('cy - 30000')}  AS ybb, {gy('cy + 30000')}  AS ybt,
        {gy('cy - 120000')} AS ymb, {gy('cy + 120000')} AS ymt,
        {gy('cy - 40000')}  AS yib, {gy('cy + 40000')}  AS yit,
        {gx('cx - 800000')} AS xal, {gx('cx - 400000')} AS xar,
        {gx('cx + 400000')} AS xbl2, {gx('cx + 800000')} AS xbr2
      FROM r)
SELECT 10000000 + r AS rel_id,
       CAST(2 AS BIGINT) AS n_rings, CAST(1 AS BIGINT) AS n_holes,
       CAST(8 AS BIGINT) AS n_vertices,
       2 * (xr - xl) * (yb - yt) - 2 * (xhr - xhl) * (yhb - yht)
           AS area2_sum,
       xl / 1e7 AS min_x, xr / 1e7 AS max_x,
       yt / 1e7 AS min_y, yb / 1e7 AS max_y
FROM g
UNION ALL
SELECT 20000000 + r,
       CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(12 AS BIGINT),
       2 * ((xr - xl) * (yb - yt) - (xr - xc) * (yhb - yht))
           + 2 * (xbr - xbl) * (ybb - ybt),
       xl / 1e7, xr / 1e7, yt / 1e7, yb / 1e7
FROM g
UNION ALL
SELECT 30000000 + r,
       CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(12 AS BIGINT),
       2 * ((xr - xl) * (yb - yt) - (xmr - xml) * (ymb - ymt)
            + (xir - xil) * (yib - yit)),
       xl / 1e7, xr / 1e7, yt / 1e7, yb / 1e7
FROM g
UNION ALL
SELECT 40000000 + r,
       CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(8 AS BIGINT),
       2 * (xar - xal) * (yb - yt) + 2 * (xbr2 - xbl2) * (yb - yt),
       xal / 1e7, xbr2 / 1e7, yt / 1e7, yb / 1e7
FROM g
"""


def sql_osm_poi_stats() -> str:
    """Oracle for ``osm_poi_stats``: every 10th generic node carries
    ``poi = str(id mod 7)`` (``osmworld.build_osm_world``)."""
    return """
WITH p AS (SELECT 4 * count(*) AS n_nodes FROM documents),
d AS (SELECT CAST(row_number() OVER () AS BIGINT) * 10 AS r10
      FROM documents, generate_series(0, 3)),
i AS (SELECT d.r10 AS i FROM d, p WHERE d.r10 <= p.n_nodes)
SELECT CAST(i % 7 AS VARCHAR) AS poi,
       CAST(count(*) AS BIGINT) AS n,
       min(i) AS min_id, max(i) AS max_id,
       min(1e-9 * (100 * ((i * 2654435761) % 3400000000 - 1700000000)))
           AS min_lon,
       max(1e-9 * (100 * ((i * 2654435761) % 3400000000 - 1700000000)))
           AS max_lon
FROM i GROUP BY 1
"""


def sql_poly_merge_tiles(zoom: int = 5) -> str:
    """Oracle for ``poly_merge_tiles``: rectangle-trio placement replayed
    from ``event_id`` arithmetic; union areas by inclusion-exclusion
    (r0∩r1 = r1∩r2 = 24, r0∩r2 = ∅ — the chained-overlap fixture of
    ``pipelines.tiles.poly_merge_tile_summary``)."""
    nt = 1 << zoom
    return f"""
WITH ev AS (SELECT event_id FROM events WHERE event_id < 110592),
m AS (SELECT event_id // 3 AS g, count(*) AS m,
             min(event_id) AS min_e
      FROM ev GROUP BY 1),
d AS (SELECT g, m, min_e,
             (g % 1024) % {nt} AS tx, (g % 1024) // {nt} AS ty,
             8 + ((g // 1024) % 6) * 40 AS sx,
             8 + ((g // 1024) // 6) * 40 AS sy
      FROM m)
SELECT CAST({zoom_start(zoom)} + tx * {nt} + ({nt - 1} - ty) AS BIGINT)
           AS tile_id,
       (min_e // 10) * 10 AS merged_id,
       CAST(m AS BIGINT) AS n_features,
       CAST(m * 100 - CASE WHEN m >= 2 THEN 24 ELSE 0 END
                    - CASE WHEN m >= 3 THEN 24 ELSE 0 END AS BIGINT)
           AS union_area,
       CAST(sx AS BIGINT) AS mx0, CAST(sy AS BIGINT) AS my0,
       CAST(sx + 6 * (m - 1) + 10 AS BIGINT) AS mx1,
       CAST(sy + CASE WHEN m >= 2 THEN 14 ELSE 10 END AS BIGINT) AS my1
FROM d
"""
