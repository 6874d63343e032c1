"""GEOMETRY over WKB — the GeoArrow-shaped wire contract.

The reference serves DuckDB-spatial GEOMETRY columns and exports them
as GeoArrow: WKB bytes in a Binary field carrying
``ARROW:extension:name = geoarrow.wkb`` metadata so GeoPandas reads
them without conversion (/root/reference/docs/geometry.md:1-60,
/root/reference/tests/test_geoarrow.py:24-66).

Spark has no extension type system, so the engine's model is:

- **in-engine GEOMETRY** = the ``STRUCT<x: DOUBLE, y: DOUBLE>`` the
  existing ``st_*`` mini-surface computes with (JVM codegen math);
- **wire GEOMETRY** = standard little-endian point WKB (21 bytes:
  byte-order ``01``, geom-type ``1``, x, y as IEEE-754 doubles) in a
  ``BINARY`` column;
- the bridge is a pair of Arrow-vectorized Pandas UDFs
  (``st_aswkb`` / ``st_geomfromwkb``) — numpy views over the Arrow
  buffers, no per-row Python in the 21-byte layout;
- ``attach_geoarrow_metadata`` stamps GeoArrow field metadata onto
  result tables at the Arrow boundary (``Engine.collect_arrow``), the
  exact point the reference attaches its GeoArrow schema.

WKT parse/print (``st_geomfromtext`` / ``st_astext``) are pure JVM
expressions (regex + formatting) — no Python.

At 100 TB the codec cost is the Arrow transfer itself: both UDFs are
O(rows) numpy reshapes, no shuffle, applied only at the wire boundary
or where a user explicitly materializes WKB.
"""

from __future__ import annotations

import struct
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

#: GeoArrow extension metadata for WKB-encoded geometry fields
GEOARROW_EXTENSION_NAME = b"geoarrow.wkb"
#: CRS metadata: the reference exports lon/lat WGS84 by default
GEOARROW_EXTENSION_METADATA = b'{"crs": "OGC:CRS84"}'

_WKB_POINT_LE = 0x01
_WKB_HEADER_LE = struct.pack("<BI", 1, _WKB_POINT_LE)  # 01 01000000


def point_wkb(x: float, y: float) -> bytes:
    """One little-endian point WKB (host-side helper for tests)."""
    return struct.pack("<BIdd", 1, _WKB_POINT_LE, x, y)


def _encode_batch(x: pd.Series, y: pd.Series) -> pd.Series:
    """Vectorized (x, y) -> 21-byte WKB: one numpy buffer, no per-row
    struct.pack."""
    n = len(x)
    out = np.empty((n, 21), dtype=np.uint8)
    out[:, 0:5] = np.frombuffer(_WKB_HEADER_LE, dtype=np.uint8)
    out[:, 5:13] = (
        np.ascontiguousarray(x.to_numpy(dtype=np.float64))
        .view(np.uint8).reshape(n, 8))
    out[:, 13:21] = (
        np.ascontiguousarray(y.to_numpy(dtype=np.float64))
        .view(np.uint8).reshape(n, 8))
    rows = out.tobytes()
    xmask = x.isna().to_numpy()
    ymask = y.isna().to_numpy()
    return pd.Series(
        [None if (xmask[i] or ymask[i]) else rows[21 * i: 21 * i + 21]
         for i in range(n)],
        dtype=object)


def _decode_batch(wkb: pd.Series) -> pd.DataFrame:
    """Vectorized WKB -> (x, y); handles both byte orders; non-point
    or malformed values decode to NULL."""
    xs: list[float | None] = []
    ys: list[float | None] = []
    for b in wkb:
        if b is None or len(b) < 21:
            xs.append(None)
            ys.append(None)
            continue
        order = "<" if b[0] == 1 else ">"
        (gtype,) = struct.unpack_from(order + "I", b, 1)
        if gtype != _WKB_POINT_LE:
            xs.append(None)
            ys.append(None)
            continue
        gx, gy = struct.unpack_from(order + "dd", b, 5)
        xs.append(gx)
        ys.append(gy)
    return pd.DataFrame({"x": xs, "y": ys})


_WKB_POLYGON_LE = 0x03


def polygon_wkb(ring: list[tuple[float, float]]) -> bytes:
    """Single-ring polygon WKB (host-side helper for tests)."""
    out = struct.pack("<BIII", 1, _WKB_POLYGON_LE, 1, len(ring))
    for x, y in ring:
        out += struct.pack("<dd", x, y)
    return out


def _encode_ring_batch(rings: pd.Series) -> pd.Series:
    """ARRAY<STRUCT<x,y>> rows -> single-ring polygon WKB. Runs only
    at the wire boundary; per-row struct.pack over Arrow-delivered
    batches."""
    out = []
    for ring in rings:
        if ring is None:
            out.append(None)
            continue
        pts = [(p["x"], p["y"]) for p in ring]
        if any(x is None or y is None for x, y in pts):
            out.append(None)
            continue
        out.append(polygon_wkb(pts))
    return pd.Series(out, dtype=object)


def _decode_ring_batch(wkb: pd.Series) -> pd.Series:
    """Polygon WKB -> outer-ring ARRAY<STRUCT<x,y>> (holes beyond the
    first ring are dropped; both byte orders accepted)."""
    out = []
    for b in wkb:
        if b is None or len(b) < 9:
            out.append(None)
            continue
        order = "<" if b[0] == 1 else ">"
        gtype, nrings = struct.unpack_from(order + "II", b, 1)
        if gtype != _WKB_POLYGON_LE or nrings < 1:
            out.append(None)
            continue
        (npts,) = struct.unpack_from(order + "I", b, 9)
        if len(b) < 13 + 16 * npts:
            out.append(None)
            continue
        coords = struct.unpack_from(order + "d" * (2 * npts), b, 13)
        out.append(
            [{"x": coords[2 * i], "y": coords[2 * i + 1]}
             for i in range(npts)])
    return pd.Series(out, dtype=object)


def _convex_hull(points: list[tuple[float, float]]) -> list[dict]:
    """Andrew's monotone chain; closed CCW ring starting at the
    lexicographically smallest vertex; collinear points dropped."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        ring = [{"x": x, "y": y} for x, y in pts]
        return ring + ring[:1] if ring else ring

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower: list[tuple[float, float]] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[float, float]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    return [{"x": x, "y": y} for x, y in hull] + [
        {"x": hull[0][0], "y": hull[0][1]}]


def _hull_batch(point_arrays: pd.Series) -> pd.Series:
    out = []
    for pts in point_arrays:
        if pts is None:
            out.append(None)
            continue
        coords = [(p["x"], p["y"]) for p in pts
                  if p is not None and p["x"] is not None]
        out.append(_convex_hull(coords) if coords else [])
    return pd.Series(out, dtype=object)


def _pandas_geo_udfs():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def st_aswkb_xy_(x: pd.Series, y: pd.Series) -> pd.Series:
        return _encode_batch(x, y)

    @pandas_udf("array<struct<x: double, y: double>>")
    def st_convexhull_(points: pd.Series) -> pd.Series:
        return _hull_batch(points)

    @pandas_udf("struct<x: double, y: double>")
    def st_geomfromwkb_(wkb: pd.Series) -> pd.DataFrame:
        return _decode_batch(wkb)

    @pandas_udf("binary")
    def st_aswkb_poly_(rings: pd.Series) -> pd.Series:
        return _encode_ring_batch(rings)

    @pandas_udf("array<struct<x: double, y: double>>")
    def st_polyfromwkb_(wkb: pd.Series) -> pd.Series:
        return _decode_ring_batch(wkb)

    return {
        "st_aswkb_xy": st_aswkb_xy_,
        "st_geomfromwkb": st_geomfromwkb_,
        "st_aswkb_poly": st_aswkb_poly_,
        "st_polyfromwkb": st_polyfromwkb_,
        "st_convexhull": st_convexhull_,
    }


#: JVM-side geometry SQL (registered on top of the struct mini-surface
#: in functions/__init__.py)
_GEO_SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # struct -> WKB via the vectorized encoder
    "st_aswkb": (
        "(p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS BINARY",
        "st_aswkb_xy(p.x, p.y)",
    ),
    # WKT print/parse: pure JVM string ops
    "st_astext": (
        "(p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS STRING",
        "CASE WHEN p IS NULL THEN NULL ELSE"
        " concat('POINT (', format_number(p.x, '0.######'), ' ',"
        " format_number(p.y, '0.######'), ')') END",
    ),
    "st_geomfromtext": (
        "(t STRING) RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "CASE WHEN t RLIKE '^\\\\s*POINT\\\\s*\\\\(' THEN named_struct("
        "'x', CAST(regexp_extract(t,"
        " 'POINT\\\\s*\\\\(\\\\s*([-0-9.eE+]+)\\\\s+([-0-9.eE+]+)', 1) AS DOUBLE),"
        "'y', CAST(regexp_extract(t,"
        " 'POINT\\\\s*\\\\(\\\\s*([-0-9.eE+]+)\\\\s+([-0-9.eE+]+)', 2) AS DOUBLE))"
        " ELSE NULL END",
    ),
    # direct accessors over WKB (decode + project)
    "st_x_wkb": (
        "(b BINARY) RETURNS DOUBLE", "st_geomfromwkb(b).x"),
    "st_y_wkb": (
        "(b BINARY) RETURNS DOUBLE", "st_geomfromwkb(b).y"),
    "st_distance_wkb": (
        "(a BINARY, b BINARY) RETURNS DOUBLE",
        "st_distance(st_geomfromwkb(a), st_geomfromwkb(b))",
    ),
    # --- polygon tier (round-3 breadth: ST_Buffer / ST_Area /
    # ST_Centroid / ST_Within / ST_Intersects_Extent over rings) ------
    #
    # A polygon is a closed ring ARRAY<STRUCT<x,y>> (last = first).
    # st_buffer approximates ST_Buffer(point, r) with the inscribed
    # regular octagon; vertex multipliers are only 0 / ±1 / ±sqrt(0.5)
    # — sqrt is IEEE-exact, so both engines (and the DuckDB oracle)
    # build bit-identical vertices with no trig-library divergence.
    "st_buffer": (
        "(p STRUCT<x: DOUBLE, y: DOUBLE>, r DOUBLE)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "array("
        " named_struct('x', p.x + r, 'y', p.y),"
        " named_struct('x', p.x + r * sqrt(0.5d), 'y', p.y + r * sqrt(0.5d)),"
        " named_struct('x', p.x, 'y', p.y + r),"
        " named_struct('x', p.x - r * sqrt(0.5d), 'y', p.y + r * sqrt(0.5d)),"
        " named_struct('x', p.x - r, 'y', p.y),"
        " named_struct('x', p.x - r * sqrt(0.5d), 'y', p.y - r * sqrt(0.5d)),"
        " named_struct('x', p.x, 'y', p.y - r),"
        " named_struct('x', p.x + r * sqrt(0.5d), 'y', p.y - r * sqrt(0.5d)),"
        " named_struct('x', p.x + r, 'y', p.y))",
    ),
    # shoelace area over the closed ring (CCW positive), as a
    # sequential fold so the oracle's ordered list_sum matches
    "st_area": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "0.5d * aggregate(sequence(1, size(ring) - 1), 0d, (acc, i) ->"
        " acc + element_at(ring, i).x * element_at(ring, i + 1).y"
        "     - element_at(ring, i + 1).x * element_at(ring, i).y)",
    ),
    # distance inlined (not st_distance): SQL UDF calls can't take
    # lambda variables as arguments in Spark's UDF inliner
    "st_perimeter": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "aggregate(sequence(1, size(ring) - 1), 0d, (acc, i) ->"
        " acc + sqrt("
        " (element_at(ring, i).x - element_at(ring, i + 1).x)"
        " * (element_at(ring, i).x - element_at(ring, i + 1).x)"
        " + (element_at(ring, i).y - element_at(ring, i + 1).y)"
        " * (element_at(ring, i).y - element_at(ring, i + 1).y)))",
    ),
    "st_npoints": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS INT",
        "size(ring)",
    ),
    # area-weighted polygon centroid (standard shoelace form)
    "st_centroid": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "named_struct("
        "'x', aggregate(sequence(1, size(ring) - 1), 0d, (acc, i) ->"
        " acc + (element_at(ring, i).x + element_at(ring, i + 1).x)"
        " * (element_at(ring, i).x * element_at(ring, i + 1).y"
        "    - element_at(ring, i + 1).x * element_at(ring, i).y))"
        " / (6.0d * st_area(ring)),"
        "'y', aggregate(sequence(1, size(ring) - 1), 0d, (acc, i) ->"
        " acc + (element_at(ring, i).y + element_at(ring, i + 1).y)"
        " * (element_at(ring, i).x * element_at(ring, i + 1).y"
        "    - element_at(ring, i + 1).x * element_at(ring, i).y))"
        " / (6.0d * st_area(ring)))",
    ),
    # even-odd ray casting (the classic crossing-number test); points
    # exactly on an edge are engine-dependent, as in every ST_Within
    "st_within": (
        "(p STRUCT<x: DOUBLE, y: DOUBLE>,"
        " ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS BOOLEAN",
        "aggregate(sequence(1, size(ring) - 1), 0, (acc, i) ->"
        " acc + (CASE WHEN (element_at(ring, i).y > p.y)"
        "             != (element_at(ring, i + 1).y > p.y)"
        " AND p.x < (element_at(ring, i + 1).x - element_at(ring, i).x)"
        " * (p.y - element_at(ring, i).y)"
        " / nullif(element_at(ring, i + 1).y - element_at(ring, i).y, 0d)"
        " + element_at(ring, i).x"
        " THEN 1 ELSE 0 END)) % 2 = 1",
    ),
    # envelope overlap — DuckDB-spatial's ST_Intersects_Extent
    "st_intersects_extent": (
        "(a ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " b ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS BOOLEAN",
        "array_min(transform(a, v -> v.x))"
        " <= array_max(transform(b, v -> v.x))"
        " AND array_min(transform(b, v -> v.x))"
        " <= array_max(transform(a, v -> v.x))"
        " AND array_min(transform(a, v -> v.y))"
        " <= array_max(transform(b, v -> v.y))"
        " AND array_min(transform(b, v -> v.y))"
        " <= array_max(transform(a, v -> v.y))",
    ),
    # polygon WKB bridge (binary wire form of the ring tier)
    "st_x_poly_centroid_wkb": (
        "(b BINARY) RETURNS DOUBLE", "st_centroid(st_polyfromwkb(b)).x"),
    # --- third batch: envelope / affine / measure functions ----------
    "st_envelope": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS STRUCT<xmin: DOUBLE, ymin: DOUBLE,"
        " xmax: DOUBLE, ymax: DOUBLE>",
        "named_struct("
        "'xmin', array_min(transform(ring, v -> v.x)),"
        "'ymin', array_min(transform(ring, v -> v.y)),"
        "'xmax', array_max(transform(ring, v -> v.x)),"
        "'ymax', array_max(transform(ring, v -> v.y)))",
    ),
    "st_translate": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>, dx DOUBLE, dy DOUBLE)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "transform(ring, v -> named_struct('x', v.x + dx, 'y', v.y + dy))",
    ),
    "st_scale": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>, fx DOUBLE, fy DOUBLE)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "transform(ring, v -> named_struct('x', v.x * fx, 'y', v.y * fy))",
    ),
    # rotation by quarter turns about the origin (exact — no trig)
    "st_rotate90": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>, n INT)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "CASE CAST(((n % 4) + 4) % 4 AS INT)"
        " WHEN 0 THEN ring"
        " WHEN 1 THEN transform(ring, v -> named_struct('x', -v.y, 'y', v.x))"
        " WHEN 2 THEN transform(ring, v -> named_struct('x', -v.x, 'y', -v.y))"
        " ELSE transform(ring, v -> named_struct('x', v.y, 'y', -v.x)) END",
    ),
    "st_makeline": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "array(a, b)",
    ),
    # open-path length (perimeter minus the closing assumption)
    "st_length": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "aggregate(sequence(1, size(line) - 1), 0d, (acc, i) ->"
        " acc + sqrt("
        " (element_at(line, i).x - element_at(line, i + 1).x)"
        " * (element_at(line, i).x - element_at(line, i + 1).x)"
        " + (element_at(line, i).y - element_at(line, i + 1).y)"
        " * (element_at(line, i).y - element_at(line, i + 1).y)))",
    ),
    "st_isclosed": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS BOOLEAN",
        "size(ring) >= 2 AND element_at(ring, 1) = element_at(ring, -1)",
    ),
    "st_pointn": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>, n INT)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "element_at(ring, n)",
    ),
    "st_contains_env": (
        "(env STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS BOOLEAN",
        "p.x >= env.xmin AND p.x <= env.xmax"
        " AND p.y >= env.ymin AND p.y <= env.ymax",
    ),
    # --- fourth batch: predicate / construction / interpolation ------
    # (all closed-form arithmetic: linear interpolation, clamps,
    # floors — no trig, engine-identical; st_dwithin itself lives in
    # functions/__init__.py with the other point-tier functions)
    "st_expand": (
        "(env STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " d DOUBLE) RETURNS STRUCT<xmin: DOUBLE, ymin: DOUBLE,"
        " xmax: DOUBLE, ymax: DOUBLE>",
        "named_struct('xmin', env.xmin - d, 'ymin', env.ymin - d,"
        " 'xmax', env.xmax + d, 'ymax', env.ymax + d)",
    ),
    # CCW closed rectangle ring (PostGIS returns the same polygon)
    "st_makeenvelope": (
        "(xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "array("
        " named_struct('x', xmin, 'y', ymin),"
        " named_struct('x', xmax, 'y', ymin),"
        " named_struct('x', xmax, 'y', ymax),"
        " named_struct('x', xmin, 'y', ymax),"
        " named_struct('x', xmin, 'y', ymin))",
    ),
    "st_line_interpolate_point": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>, f DOUBLE)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "named_struct("
        "'x', element_at(line, 1).x"
        " + f * (element_at(line, -1).x - element_at(line, 1).x),"
        "'y', element_at(line, 1).y"
        " + f * (element_at(line, -1).y - element_at(line, 1).y))",
    ),
    # closest point on segment a-b to p: parameter t = clamp of the
    # projection; degenerate segment (a = b) falls back to a
    "st_closestpoint": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>,"
        " p STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "named_struct("
        "'x', a.x + least(greatest(coalesce("
        " ((p.x - a.x) * (b.x - a.x) + (p.y - a.y) * (b.y - a.y))"
        " / nullif((b.x - a.x) * (b.x - a.x)"
        "          + (b.y - a.y) * (b.y - a.y), 0d), 0d), 0d), 1d)"
        " * (b.x - a.x),"
        "'y', a.y + least(greatest(coalesce("
        " ((p.x - a.x) * (b.x - a.x) + (p.y - a.y) * (b.y - a.y))"
        " / nullif((b.x - a.x) * (b.x - a.x)"
        "          + (b.y - a.y) * (b.y - a.y), 0d), 0d), 0d), 1d)"
        " * (b.y - a.y))",
    ),
    "st_flipcoordinates": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "transform(ring, v -> named_struct('x', v.y, 'y', v.x))",
    ),
    "st_snaptogrid": (
        "(p STRUCT<x: DOUBLE, y: DOUBLE>, s DOUBLE)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "named_struct('x', floor(p.x / s) * s, 'y', floor(p.y / s) * s)",
    ),
    # --- fifth batch: envelope set algebra + DE-9IM-lite predicates --
    # (PostGIS ST_Intersection/ST_Union/ST_Difference restricted to
    # axis-aligned envelopes — the closed-form tier every spatial
    # engine's bbox pre-filter uses; pure min/max/compare arithmetic,
    # engine-identical)
    "st_env_area": (
        "(env STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS DOUBLE",
        "CASE WHEN env IS NULL THEN 0d ELSE"
        " greatest(env.xmax - env.xmin, 0d)"
        " * greatest(env.ymax - env.ymin, 0d) END",
    ),
    "st_intersection_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS STRUCT<xmin: DOUBLE, ymin: DOUBLE,"
        " xmax: DOUBLE, ymax: DOUBLE>",
        "CASE WHEN greatest(a.xmin, b.xmin) <= least(a.xmax, b.xmax)"
        " AND greatest(a.ymin, b.ymin) <= least(a.ymax, b.ymax)"
        " THEN named_struct("
        " 'xmin', greatest(a.xmin, b.xmin), 'ymin', greatest(a.ymin, b.ymin),"
        " 'xmax', least(a.xmax, b.xmax), 'ymax', least(a.ymax, b.ymax))"
        " ELSE NULL END",
    ),
    "st_union_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS STRUCT<xmin: DOUBLE, ymin: DOUBLE,"
        " xmax: DOUBLE, ymax: DOUBLE>",
        "named_struct("
        " 'xmin', least(a.xmin, b.xmin), 'ymin', least(a.ymin, b.ymin),"
        " 'xmax', greatest(a.xmax, b.xmax),"
        " 'ymax', greatest(a.ymax, b.ymax))",
    ),
    # area(a \\ b) by inclusion-exclusion on envelopes
    "st_difference_area_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS DOUBLE",
        "(a.xmax - a.xmin) * (a.ymax - a.ymin)"
        " - greatest(least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin), 0d)"
        " * greatest(least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin), 0d)",
    ),
    "st_equals_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS BOOLEAN",
        "a.xmin = b.xmin AND a.ymin = b.ymin"
        " AND a.xmax = b.xmax AND a.ymax = b.ymax",
    ),
    # boundaries meet but interiors do not (shared edge or corner)
    "st_touches_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS BOOLEAN",
        "greatest(a.xmin, b.xmin) <= least(a.xmax, b.xmax)"
        " AND greatest(a.ymin, b.ymin) <= least(a.ymax, b.ymax)"
        " AND (greatest(a.xmin, b.xmin) = least(a.xmax, b.xmax)"
        "      OR greatest(a.ymin, b.ymin) = least(a.ymax, b.ymax))",
    ),
    # interiors intersect and neither envelope contains the other
    "st_overlaps_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS BOOLEAN",
        "greatest(a.xmin, b.xmin) < least(a.xmax, b.xmax)"
        " AND greatest(a.ymin, b.ymin) < least(a.ymax, b.ymax)"
        " AND NOT (a.xmin <= b.xmin AND a.ymin <= b.ymin"
        "          AND a.xmax >= b.xmax AND a.ymax >= b.ymax)"
        " AND NOT (b.xmin <= a.xmin AND b.ymin <= a.ymin"
        "          AND b.xmax >= a.xmax AND b.ymax >= a.ymax)",
    ),
    "st_contains_env_env": (
        "(a STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>,"
        " b STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>)"
        " RETURNS BOOLEAN",
        "a.xmin <= b.xmin AND a.ymin <= b.ymin"
        " AND a.xmax >= b.xmax AND a.ymax >= b.ymax",
    ),
    # boundary of an open path = its two endpoints (PostGIS multipoint)
    "st_boundary_line": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "CASE WHEN size(line) >= 2"
        " AND element_at(line, 1) = element_at(line, -1)"
        " THEN array() ELSE array(element_at(line, 1),"
        " element_at(line, -1)) END",
    ),
    # radial-distance simplification (the streaming cousin of
    # Douglas-Peucker): keep a vertex when it is >= tol from the last
    # kept one; endpoints always survive
    "st_simplify_radial": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>, tol DOUBLE)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "aggregate(slice(line, 2, greatest(size(line) - 1, 0)),"
        " array(element_at(line, 1)),"
        " (acc, v) -> CASE WHEN"
        " sqrt((v.x - element_at(acc, -1).x) * (v.x - element_at(acc, -1).x)"
        " + (v.y - element_at(acc, -1).y) * (v.y - element_at(acc, -1).y))"
        " >= tol THEN array_append(acc, v) ELSE acc END)",
    ),
}


_EMPTY_RING = "cast(array() as array<struct<x: double, y: double>>)"


def _clip_edge_sql(ring: str, c1x: str, c1y: str, c2x: str, c2y: str) -> str:
    """Sutherland–Hodgman single-edge clip of closed ring ``ring``
    against the half-plane LEFT of the directed line (c1 → c2), as one
    inlined Spark SQL expression (reference docs/geometry.md polygon
    set operations; the real algorithm, not an envelope shortcut).

    Generated as a string because the polygon-polygon fold
    (``st_intersection_poly``) must clip against a *lambda-bound* edge
    — Spark's SQL-UDF inliner cannot pass lambda variables into a UDF
    call, so the edge clip is stamped inline wherever it's needed.

    Let-bindings use the transform-of-singleton-array idiom: Spark SQL
    has no LET, but ``element_at(transform(array(s), v -> e), 1)``
    evaluates ``e`` with ``v`` bound to ``s`` exactly once.

    Conventions: ring and clip are CLOSED (first = last) and CCW;
    a point exactly on the clip line counts inside (>= 0), matching
    every half-plane clipper. Output ring is closed; fully-outside
    input yields an empty array.
    """
    # per-edge struct: s = ring[i], e = ring[i+1]
    pts = (
        f"named_struct("
        f"'sx', element_at({ring}, i).x, 'sy', element_at({ring}, i).y,"
        f"'ex', element_at({ring}, i + 1).x,"
        f" 'ey', element_at({ring}, i + 1).y)"
    )
    # signed side of s and e w.r.t. the directed clip line
    sides = (
        f"named_struct("
        f"'ss', ({c2x} - ({c1x})) * (p0.sy - ({c1y}))"
        f"    - ({c2y} - ({c1y})) * (p0.sx - ({c1x})),"
        f"'se', ({c2x} - ({c1x})) * (p0.ey - ({c1y}))"
        f"    - ({c2y} - ({c1y})) * (p0.ex - ({c1x})))"
    )
    # segment/line intersection point, parameter t = ss / (ss - se)
    ipt = (
        "named_struct("
        "'x', p0.sx + sd.ss / (sd.ss - sd.se) * (p0.ex - p0.sx),"
        "'y', p0.sy + sd.ss / (sd.ss - sd.se) * (p0.ey - p0.sy))"
    )
    emit = (
        f"element_at(transform(array({sides}), sd -> CASE"
        f" WHEN sd.se >= 0d AND sd.ss >= 0d THEN"
        f"   array(named_struct('x', p0.ex, 'y', p0.ey))"
        f" WHEN sd.se >= 0d THEN"
        f"   array({ipt}, named_struct('x', p0.ex, 'y', p0.ey))"
        f" WHEN sd.ss >= 0d THEN array({ipt})"
        f" ELSE {_EMPTY_RING} END), 1)"
    )
    return (
        f"CASE WHEN {ring} IS NULL OR size({ring}) < 4 THEN {_EMPTY_RING}"
        f" ELSE aggregate(sequence(1, size({ring}) - 1), {_EMPTY_RING},"
        f" (acc, i) -> concat(acc,"
        f"   element_at(transform(array({pts}), p0 -> {emit}), 1)),"
        f" acc -> CASE WHEN size(acc) = 0 THEN acc"
        f"             ELSE concat(acc, array(element_at(acc, 1))) END)"
        f" END"
    )


#: Sixth batch — TRUE polygon set algebra (round-4): general
#: Sutherland–Hodgman clipping (any simple subject polygon × convex
#: clip polygon) and the area algebra on top of it, all JVM-side
#: whole-stage-codegen SQL. Replaces the round-3 envelope
#: approximations where the semantics genuinely need geometry.
_GEO_SQL_FUNCTIONS.update({
    # clip a closed ring by ONE half-plane (left of a → b)
    "st_clip_halfplane": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        _clip_edge_sql("ring", "a.x", "a.y", "b.x", "b.y"),
    ),
    # full polygon ∩ polygon: fold the edge clip over the (convex,
    # CCW, closed) clip ring — subject may be concave
    "st_intersection_poly": (
        "(subject ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " clip ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        f"CASE WHEN subject IS NULL OR clip IS NULL OR size(clip) < 4"
        f" THEN {_EMPTY_RING}"
        f" ELSE aggregate(sequence(1, size(clip) - 1), subject,"
        f" (rg, j) -> "
        + _clip_edge_sql(
            "rg",
            "element_at(clip, j).x", "element_at(clip, j).y",
            "element_at(clip, j + 1).x", "element_at(clip, j + 1).y",
        )
        + ") END",
    ),
    # degenerate-safe shoelace (st_area errors on size<2 sequences)
    "st_poly_area": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "CASE WHEN ring IS NULL OR size(ring) < 4 THEN 0d"
        " ELSE st_area(ring) END",
    ),
    "st_intersection_area_poly": (
        "(a ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " b ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "st_poly_area(st_intersection_poly(a, b))",
    ),
    # inclusion-exclusion: valid for any simple a, convex b
    "st_union_area_poly": (
        "(a ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " b ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "st_poly_area(a) + st_poly_area(b)"
        " - st_poly_area(st_intersection_poly(a, b))",
    ),
    "st_difference_area_poly": (
        "(a ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " b ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS DOUBLE",
        "st_poly_area(a) - st_poly_area(st_intersection_poly(a, b))",
    ),
    "st_reverse": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "reverse(ring)",
    ),
    # +1 CCW, -1 CW, 0 degenerate (PostGIS ST_IsPolygonCCW analog)
    "st_orientation": (
        "(ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS INT",
        "CAST(sign(st_poly_area(ring)) AS INT)",
    ),
    # PostGIS ST_Azimuth: radians clockwise from north, here degrees
    # in [0, 360); atan2(dx, dy) — note the argument swap vs math
    "st_azimuth_deg": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS DOUBLE",
        "pmod(degrees(atan2(b.x - a.x, b.y - a.y)) + 360d, 360d)",
    ),
})


_RING_T = "ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>"
_ENV_T = "STRUCT<xmin: DOUBLE, ymin: DOUBLE, xmax: DOUBLE, ymax: DOUBLE>"
_PT_T = "STRUCT<x: DOUBLE, y: DOUBLE>"

#: Eighth batch — accessor / constructor / predicate breadth
#: (reference docs/geometry.md "100+ spatial functions" contract):
#: each a one-expression JVM body over the ring/envelope/point model.
_GEO_SQL_FUNCTIONS.update({
    "st_xmin": (f"(ring {_RING_T}) RETURNS DOUBLE",
                "array_min(transform(ring, v -> v.x))"),
    "st_xmax": (f"(ring {_RING_T}) RETURNS DOUBLE",
                "array_max(transform(ring, v -> v.x))"),
    "st_ymin": (f"(ring {_RING_T}) RETURNS DOUBLE",
                "array_min(transform(ring, v -> v.y))"),
    "st_ymax": (f"(ring {_RING_T}) RETURNS DOUBLE",
                "array_max(transform(ring, v -> v.y))"),
    "st_width_env": (f"(env {_ENV_T}) RETURNS DOUBLE",
                     "env.xmax - env.xmin"),
    "st_height_env": (f"(env {_ENV_T}) RETURNS DOUBLE",
                      "env.ymax - env.ymin"),
    "st_isempty": (f"(ring {_RING_T}) RETURNS BOOLEAN",
                   "ring IS NULL OR size(ring) = 0"),
    # single-ring validity: closed, >= 3 distinct vertices, area != 0
    "st_isvalid_ring": (
        f"(ring {_RING_T}) RETURNS BOOLEAN",
        "ring IS NOT NULL AND size(ring) >= 4"
        " AND element_at(ring, 1) = element_at(ring, -1)"
        " AND st_poly_area(ring) != 0d"),
    "st_ispolygonccw": (f"(ring {_RING_T}) RETURNS BOOLEAN",
                        "st_orientation(ring) = 1"),
    "st_ispolygoncw": (f"(ring {_RING_T}) RETURNS BOOLEAN",
                       "st_orientation(ring) = -1"),
    # the engine's model is single-ring polygons (holes live in the
    # WKB codec only) — honest constants, as PostGIS returns for them
    "st_numinteriorrings": (f"(ring {_RING_T}) RETURNS INT", "0"),
    "st_dimension_ring": (
        f"(ring {_RING_T}) RETURNS INT",
        "CASE WHEN ring IS NULL OR size(ring) = 0 THEN -1"
        " WHEN size(ring) = 1 THEN 0"
        " WHEN st_isclosed(ring) AND size(ring) >= 4 THEN 2 ELSE 1 END"),
    "st_geometrytype_ring": (
        f"(ring {_RING_T}) RETURNS STRING",
        "CASE WHEN ring IS NULL OR size(ring) = 0 THEN NULL"
        " WHEN size(ring) = 1 THEN 'ST_Point'"
        " WHEN st_isclosed(ring) AND size(ring) >= 4 THEN 'ST_Polygon'"
        " ELSE 'ST_LineString' END"),
    "st_exteriorring": (f"(ring {_RING_T}) RETURNS {_RING_T}", "ring"),
    # close an open path (no-op when already closed)
    "st_makepolygon": (
        f"(line {_RING_T}) RETURNS {_RING_T}",
        "CASE WHEN line IS NULL OR size(line) < 3 THEN line"
        " WHEN element_at(line, 1) = element_at(line, -1) THEN line"
        " ELSE concat(line, array(element_at(line, 1))) END"),
    "st_midpoint": (
        f"(a {_PT_T}, b {_PT_T}) RETURNS {_PT_T}",
        "named_struct('x', (a.x + b.x) / 2d, 'y', (a.y + b.y) / 2d)"),
    "st_makebox2d": (
        f"(a {_PT_T}, b {_PT_T}) RETURNS {_ENV_T}",
        "named_struct('xmin', least(a.x, b.x), 'ymin', least(a.y, b.y),"
        " 'xmax', greatest(a.x, b.x), 'ymax', greatest(a.y, b.y))"),
    "st_expand_point": (
        f"(p {_PT_T}, d DOUBLE) RETURNS {_ENV_T}",
        "named_struct('xmin', p.x - d, 'ymin', p.y - d,"
        " 'xmax', p.x + d, 'ymax', p.y + d)"),
    "st_centroid_env": (
        f"(env {_ENV_T}) RETURNS {_PT_T}",
        "named_struct('x', (env.xmin + env.xmax) / 2d,"
        " 'y', (env.ymin + env.ymax) / 2d)"),
    "st_perimeter_env": (
        f"(env {_ENV_T}) RETURNS DOUBLE",
        "2d * greatest(env.xmax - env.xmin, 0d)"
        " + 2d * greatest(env.ymax - env.ymin, 0d)"),
    # min distance between two envelopes (0 when overlapping) — the
    # bbox pre-filter for distance joins
    "st_distance_env": (
        f"(a {_ENV_T}, b {_ENV_T}) RETURNS DOUBLE",
        "sqrt(pow(greatest(a.xmin - b.xmax, b.xmin - a.xmax, 0d), 2)"
        " + pow(greatest(a.ymin - b.ymax, b.ymin - a.ymax, 0d), 2))"),
    "st_minboundradius_env": (
        f"(env {_ENV_T}) RETURNS DOUBLE",
        "sqrt(pow(env.xmax - env.xmin, 2) + pow(env.ymax - env.ymin, 2))"
        " / 2d"),
    "st_removepoint": (
        f"(line {_RING_T}, n INT) RETURNS {_RING_T}",
        "filter(line, (v, i) -> i != n - 1)"),
    "st_setpoint": (
        f"(line {_RING_T}, n INT, p {_PT_T}) RETURNS {_RING_T}",
        "transform(line, (v, i) -> CASE WHEN i = n - 1 THEN p"
        " ELSE v END)"),
    # centroid when it falls inside (convex and most rings), else the
    # first vertex — PostGIS's guarantee is only point-on-surface
    "st_pointonsurface": (
        f"(ring {_RING_T}) RETURNS {_PT_T}",
        "CASE WHEN st_within(st_centroid(ring), ring)"
        " THEN st_centroid(ring) ELSE element_at(ring, 1) END"),
})


def _seg_dist2_sql(px: str, py: str) -> str:
    """Squared distance from point (px, py) to ring edge i — the
    clamped-projection formula inlined with transform-singleton
    let-bindings (shared by the distance and closest-point folds)."""
    e = ("named_struct("
         "'ax', element_at(ring, i).x, 'ay', element_at(ring, i).y,"
         "'bx', element_at(ring, i + 1).x,"
         " 'by', element_at(ring, i + 1).y)")
    t = (f"least(greatest(coalesce("
         f"(({px} - e.ax) * (e.bx - e.ax) + ({py} - e.ay) * (e.by - e.ay))"
         f" / nullif((e.bx - e.ax) * (e.bx - e.ax)"
         f" + (e.by - e.ay) * (e.by - e.ay), 0d), 0d), 0d), 1d)")
    d2 = (f"({px} - (e.ax + t * (e.bx - e.ax)))"
          f" * ({px} - (e.ax + t * (e.bx - e.ax)))"
          f" + ({py} - (e.ay + t * (e.by - e.ay)))"
          f" * ({py} - (e.ay + t * (e.by - e.ay)))")
    return (f"element_at(transform(array({e}), e ->"
            f" element_at(transform(array({t}), t -> {d2}), 1)), 1)")


#: Ninth batch — geometric algorithms beyond clipping: segment
#: intersection, point-to-ring distance/closest-point folds, max
#: distance, densify, rotation, canonical form, quadkey tiling, and
#: the WKT polygon codec. All JVM-side SQL.
_GEO_SQL_FUNCTIONS.update({
    # proper or touching segment intersection via orientation signs
    "st_segment_intersects": (
        f"(a {_PT_T}, b {_PT_T}, c {_PT_T}, d {_PT_T}) RETURNS BOOLEAN",
        "element_at(transform(array(named_struct("
        "'d1', (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x),"
        "'d2', (b.x - a.x) * (d.y - a.y) - (b.y - a.y) * (d.x - a.x),"
        "'d3', (d.x - c.x) * (a.y - c.y) - (d.y - c.y) * (a.x - c.x),"
        "'d4', (d.x - c.x) * (b.y - c.y) - (d.y - c.y) * (b.x - c.x))),"
        " s -> (s.d1 * s.d2 <= 0d AND s.d3 * s.d4 <= 0d)"
        " AND NOT (s.d1 = 0d AND s.d2 = 0d AND"
        "  (greatest(a.x, b.x) < least(c.x, d.x)"
        "   OR greatest(c.x, d.x) < least(a.x, b.x)"
        "   OR greatest(a.y, b.y) < least(c.y, d.y)"
        "   OR greatest(c.y, d.y) < least(a.y, b.y)))), 1)"),
    # intersection point of the two segment-supporting lines, NULL
    # when parallel or when it falls outside either segment
    "st_segment_intersection": (
        f"(a {_PT_T}, b {_PT_T}, c {_PT_T}, d {_PT_T}) RETURNS {_PT_T}",
        "element_at(transform(array("
        "(b.x - a.x) * (d.y - c.y) - (b.y - a.y) * (d.x - c.x)),"
        " den -> CASE WHEN den = 0d THEN CAST(NULL AS"
        " STRUCT<x: DOUBLE, y: DOUBLE>) ELSE"
        " element_at(transform(array(named_struct("
        " 't', ((c.x - a.x) * (d.y - c.y) - (c.y - a.y) * (d.x - c.x))"
        "      / den,"
        " 'u', ((c.x - a.x) * (b.y - a.y) - (c.y - a.y) * (b.x - a.x))"
        "      / den)),"
        " s -> CASE WHEN s.t >= 0d AND s.t <= 1d"
        "           AND s.u >= 0d AND s.u <= 1d"
        " THEN named_struct('x', a.x + s.t * (b.x - a.x),"
        "                   'y', a.y + s.t * (b.y - a.y))"
        " ELSE CAST(NULL AS STRUCT<x: DOUBLE, y: DOUBLE>) END), 1)"
        " END), 1)"),
    # min distance from a point to a ring's boundary path
    "st_distance_ring": (
        f"(p {_PT_T}, ring {_RING_T}) RETURNS DOUBLE",
        "CASE WHEN ring IS NULL OR size(ring) < 2 THEN NULL ELSE"
        " sqrt(aggregate(sequence(1, size(ring) - 1),"
        " cast('Infinity' as double),"
        " (m, i) -> least(m, " + _seg_dist2_sql("p.x", "p.y") + ")))"
        " END"),
    # closest point on the ring's boundary to p (argmin fold)
    "st_closestpoint_ring": (
        f"(p {_PT_T}, ring {_RING_T}) RETURNS {_PT_T}",
        "CASE WHEN ring IS NULL OR size(ring) < 2 THEN NULL ELSE"
        " aggregate(sequence(1, size(ring) - 1),"
        " named_struct('d2', cast('Infinity' as double),"
        " 'x', cast(null as double), 'y', cast(null as double)),"
        " (acc, i) -> element_at(transform(array(named_struct("
        "'ax', element_at(ring, i).x, 'ay', element_at(ring, i).y,"
        "'bx', element_at(ring, i + 1).x,"
        " 'by', element_at(ring, i + 1).y)), e ->"
        " element_at(transform(array("
        "least(greatest(coalesce("
        "((p.x - e.ax) * (e.bx - e.ax) + (p.y - e.ay) * (e.by - e.ay))"
        " / nullif((e.bx - e.ax) * (e.bx - e.ax)"
        " + (e.by - e.ay) * (e.by - e.ay), 0d), 0d), 0d), 1d)), t ->"
        " CASE WHEN"
        " (p.x - (e.ax + t * (e.bx - e.ax)))"
        " * (p.x - (e.ax + t * (e.bx - e.ax)))"
        " + (p.y - (e.ay + t * (e.by - e.ay)))"
        " * (p.y - (e.ay + t * (e.by - e.ay))) < acc.d2"
        " THEN named_struct("
        " 'd2', (p.x - (e.ax + t * (e.bx - e.ax)))"
        " * (p.x - (e.ax + t * (e.bx - e.ax)))"
        " + (p.y - (e.ay + t * (e.by - e.ay)))"
        " * (p.y - (e.ay + t * (e.by - e.ay))),"
        " 'x', e.ax + t * (e.bx - e.ax), 'y', e.ay + t * (e.by - e.ay))"
        " ELSE acc END), 1)), 1),"
        " acc -> named_struct('x', acc.x, 'y', acc.y)) END"),
    # PostGIS ST_MaxDistance: max over vertex pairs (the max distance
    # between two polygons is always vertex-to-vertex)
    "st_maxdistance": (
        f"(a {_RING_T}, b {_RING_T}) RETURNS DOUBLE",
        "sqrt(aggregate(a, 0d, (m, va) -> greatest(m,"
        " aggregate(b, 0d, (m2, vb) -> greatest(m2,"
        " (va.x - vb.x) * (va.x - vb.x)"
        " + (va.y - vb.y) * (va.y - vb.y))))))"),
    # PostGIS ST_Segmentize: subdivide every edge into ceil(len/m)
    # equal parts so no segment exceeds m
    "st_segmentize": (
        f"(line {_RING_T}, m DOUBLE) RETURNS {_RING_T}",
        "CASE WHEN line IS NULL OR size(line) < 2 OR m <= 0d THEN line"
        " ELSE concat(flatten(transform(sequence(1, size(line) - 1),"
        " i -> element_at(transform(array(greatest(cast(ceil(sqrt("
        " (element_at(line, i + 1).x - element_at(line, i).x)"
        " * (element_at(line, i + 1).x - element_at(line, i).x)"
        " + (element_at(line, i + 1).y - element_at(line, i).y)"
        " * (element_at(line, i + 1).y - element_at(line, i).y))"
        " / m) as int), 1)), k ->"
        " transform(sequence(0, k - 1), s -> named_struct("
        " 'x', element_at(line, i).x + cast(s as double) / k"
        "      * (element_at(line, i + 1).x - element_at(line, i).x),"
        " 'y', element_at(line, i).y + cast(s as double) / k"
        "      * (element_at(line, i + 1).y - element_at(line, i).y)))"
        "), 1))), array(element_at(line, -1))) END"),
    # rotate about the origin by theta radians (general-angle
    # companion of the exact st_rotate90)
    "st_rotate_rad": (
        f"(ring {_RING_T}, theta DOUBLE) RETURNS {_RING_T}",
        "transform(ring, v -> named_struct("
        "'x', v.x * cos(theta) - v.y * sin(theta),"
        "'y', v.x * sin(theta) + v.y * cos(theta)))"),
    # canonical form: rotate the closed ring so it starts at the
    # lexicographically smallest vertex (ring equality up to rotation)
    "st_normalize_ring": (
        f"(ring {_RING_T}) RETURNS {_RING_T}",
        "CASE WHEN ring IS NULL OR size(ring) < 4 THEN ring ELSE"
        " element_at(transform(array("
        " aggregate(sequence(2, size(ring) - 1), 1, (best, i) ->"
        " CASE WHEN element_at(ring, i) < element_at(ring, best)"
        " THEN i ELSE best END)), k -> concat("
        " slice(ring, k, size(ring) - k),"
        " slice(ring, 1, k - 1),"
        " array(element_at(ring, k)))), 1) END"),
    # Bing-maps quadkey of a unit-square point at zoom z
    # (digit = x_bit + 2 * y_bit per level)
    "st_quadkey": (
        "(x DOUBLE, y DOUBLE, z INT) RETURNS STRING",
        "array_join(transform(sequence(1, z), i -> cast("
        " cast(floor(x * pow(2d, i)) as int) % 2"
        " + 2 * (cast(floor(y * pow(2d, i)) as int) % 2)"
        " as string)), '')"),
    # WKT polygon print/parse (single ring)
    "st_astext_poly": (
        f"(ring {_RING_T}) RETURNS STRING",
        "CASE WHEN ring IS NULL THEN NULL ELSE concat('POLYGON ((',"
        " array_join(transform(ring, v -> concat("
        " format_number(v.x, '0.######'), ' ',"
        " format_number(v.y, '0.######'))), ', '), '))') END"),
    "st_astext_line": (
        f"(line {_RING_T}) RETURNS STRING",
        "CASE WHEN line IS NULL THEN NULL ELSE concat('LINESTRING (',"
        " array_join(transform(line, v -> concat("
        " format_number(v.x, '0.######'), ' ',"
        " format_number(v.y, '0.######'))), ', '), ')') END"),
    "st_geomfromtext_poly": (
        f"(t STRING) RETURNS {_RING_T}",
        "CASE WHEN t RLIKE 'POLYGON\\\\s*\\\\(\\\\(' THEN"
        " transform(split(regexp_extract(t,"
        " 'POLYGON\\\\s*\\\\(\\\\(([^)]*)\\\\)\\\\)', 1), ',\\\\s*'),"
        " s -> named_struct("
        " 'x', cast(split(trim(s), '\\\\s+')[0] as double),"
        " 'y', cast(split(trim(s), '\\\\s+')[1] as double)))"
        " ELSE NULL END"),
})

_REGISTERED: set[int] = set()


def register_geo(spark) -> None:
    """Idempotent per session; requires functions.register_all first
    (st_distance et al. live there)."""
    if id(spark) in _REGISTERED:
        return
    for name, fn in _pandas_geo_udfs().items():
        spark.udf.register(name, fn)
    for name, (sig, body) in _GEO_SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    _REGISTERED.add(id(spark))


# --- GeoArrow export at the Arrow boundary ---------------------------


def _looks_like_wkb(col: pa.ChunkedArray, sample: int = 16) -> bool:
    """True when the first non-null values carry a plausible WKB
    header (byte order 0/1, geometry type 1..7) — the auto-detect
    standing in for a real GEOMETRY type tag."""
    seen = 0
    for chunk in col.chunks:
        for v in chunk:
            if v.is_valid:
                b = v.as_py()
                if (len(b) < 5 or b[0] not in (0, 1)):
                    return False
                order = "<" if b[0] == 1 else ">"
                (gtype,) = struct.unpack_from(order + "I", b, 1)
                if not 1 <= gtype <= 7:
                    return False
                seen += 1
                if seen >= sample:
                    return seen > 0
    return seen > 0


def attach_geoarrow_metadata(
    table: pa.Table, geometry_columns: Iterable[str] | None = None
) -> pa.Table:
    """Stamp ``geoarrow.wkb`` extension metadata onto geometry fields.

    With ``geometry_columns=None``, binary columns are auto-detected
    by WKB header inspection of the already-materialized values (the
    reference knows from the DuckDB type; Spark erases it to BINARY).
    """
    fields = []
    changed = False
    for i, field in enumerate(table.schema):
        is_geo = False
        if pa.types.is_binary(field.type) or pa.types.is_large_binary(field.type):
            if geometry_columns is not None:
                is_geo = field.name in set(geometry_columns)
            else:
                is_geo = _looks_like_wkb(table.column(i))
        if is_geo:
            md = dict(field.metadata or {})
            md[b"ARROW:extension:name"] = GEOARROW_EXTENSION_NAME
            md[b"ARROW:extension:metadata"] = GEOARROW_EXTENSION_METADATA
            fields.append(field.with_metadata(md))
            changed = True
        else:
            fields.append(field)
    if not changed:
        return table
    return pa.Table.from_arrays(
        table.columns, schema=pa.schema(fields, metadata=table.schema.metadata))
