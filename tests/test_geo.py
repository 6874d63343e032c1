"""WKB GEOMETRY + GeoArrow export tests (reference
docs/geometry.md:1-60, tests/test_geoarrow.py:24-66): exact WKB byte
layout, lossless encode/decode round-trip, WKT parse/print, byte-order
tolerance, and extension metadata on the Arrow wire — including over
the Flight server."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest

from gizmosql_spark import geo
from gizmosql_spark.functions import register_all


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


def test_wkb_bytes_exact(spark):
    row = spark.sql(
        "SELECT st_aswkb(st_point(CAST(-74.006 AS DOUBLE),"
        " CAST(40.7128 AS DOUBLE))) AS geom").collect()[0]
    assert row["geom"] == struct.pack("<BIdd", 1, 1, -74.006, 40.7128)
    assert len(row["geom"]) == 21


def test_wkb_roundtrip_lossless(spark):
    rows = spark.sql("""
        SELECT st_geomfromwkb(st_aswkb(st_point(x, y))) AS p,
               x AS ox, y AS oy
        FROM VALUES (CAST(1.5 AS DOUBLE), CAST(-2.25 AS DOUBLE)),
                    (CAST(1e300 AS DOUBLE), CAST(-1e-300 AS DOUBLE)),
                    (CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE)) AS t(x, y)
    """).collect()
    for r in rows:
        assert r["p"]["x"] == r["ox"]  # bit-exact, not approx
        assert r["p"]["y"] == r["oy"]


def test_wkb_null_handling(spark):
    row = spark.sql(
        "SELECT st_aswkb(st_point(CAST(NULL AS DOUBLE),"
        " CAST(1.0 AS DOUBLE))) AS g").collect()[0]
    assert row["g"] is None
    row2 = spark.sql(
        "SELECT st_geomfromwkb(CAST(NULL AS BINARY)) AS p").collect()[0]
    assert row2["p"] is None or row2["p"]["x"] is None


def test_big_endian_wkb_decodes(spark):
    be = struct.pack(">BIdd", 0, 1, 3.0, 4.0)
    df = spark.createDataFrame([(be,)], "b binary")
    df.createOrReplaceTempView("t_be_wkb")
    row = spark.sql(
        "SELECT st_x_wkb(b) AS x, st_y_wkb(b) AS y FROM t_be_wkb"
    ).collect()[0]
    assert (row["x"], row["y"]) == (3.0, 4.0)


def test_wkt_parse_and_print(spark):
    row = spark.sql("""
        SELECT st_astext(st_point(CAST(1.5 AS DOUBLE), CAST(-2 AS DOUBLE))) AS t,
               st_x(st_geomfromtext('POINT (3.25 -4.5)')) AS px,
               st_y(st_geomfromtext('POINT(3.25 -4.5)')) AS py,
               st_geomfromtext('LINESTRING (0 0, 1 1)') AS notpoint
    """).collect()[0]
    assert row["t"] == "POINT (1.5 -2)"
    assert row["px"] == 3.25 and row["py"] == -4.5
    assert row["notpoint"] is None


def test_distance_over_wkb(spark):
    row = spark.sql("""
        SELECT st_distance_wkb(
            st_aswkb(st_point(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE))),
            st_aswkb(st_point(CAST(3 AS DOUBLE), CAST(4 AS DOUBLE)))) AS d
    """).collect()[0]
    assert row["d"] == 5.0


def test_attach_geoarrow_metadata_autodetect():
    t = pa.table({
        "id": [1, 2],
        "geom": [geo.point_wkb(1.0, 2.0), geo.point_wkb(3.0, 4.0)],
        "blob": [b"\xff\xfenot-wkb", b"\x99zz"],
    })
    out = geo.attach_geoarrow_metadata(t)
    md = out.schema.field("geom").metadata
    assert md[b"ARROW:extension:name"] == b"geoarrow.wkb"
    assert b"crs" in md[b"ARROW:extension:metadata"]
    assert out.schema.field("blob").metadata in (None, {})
    assert out.schema.field("id").metadata in (None, {})
    # values untouched
    assert out.column("geom").to_pylist() == t.column("geom").to_pylist()


def test_collect_arrow_stamps_geoarrow(spark):
    from gizmosql_spark.engine import Engine

    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    register_all(eng.sessions[sid].spark)
    res = eng.execute_sql(sid, """
        SELECT id, st_aswkb(st_point(CAST(id AS DOUBLE),
                                     CAST(id * 2 AS DOUBLE))) AS geom
        FROM range(3) AS t(id)
    """)
    table = eng.collect_arrow(sid, res)
    field = table.schema.field("geom")
    assert field.metadata[b"ARROW:extension:name"] == b"geoarrow.wkb"
    # decoded coordinates survive the wire
    got = [struct.unpack_from("<dd", b, 5) for b in
           table.column("geom").to_pylist()]
    assert got == [(0.0, 0.0), (1.0, 2.0), (2.0, 4.0)]
    eng.close_session(sid)


# --- polygon tier (round-3 breadth) ----------------------------------


@pytest.fixture(scope="module", autouse=True)
def _register_geo(spark):
    geo.register_geo(spark)


def test_buffer_octagon_geometry(spark):
    """Octagon buffer: 9-point closed ring, area = 2*sqrt(2)*r^2,
    perimeter = 8 * side, centroid = center."""
    import math

    r = 5.0
    row = spark.sql(f"""
        SELECT st_npoints(ring) AS n,
               st_area(ring) AS area,
               st_perimeter(ring) AS perim,
               st_centroid(ring) AS c
        FROM (SELECT st_buffer(st_point(10D, 20D), {r}D) AS ring)
    """).collect()[0]
    assert row["n"] == 9
    assert abs(row["area"] - 2 * math.sqrt(2) * r * r) < 1e-9
    side = 2 * r * math.sin(math.pi / 8)
    assert abs(row["perim"] - 8 * side) < 1e-9
    assert abs(row["c"]["x"] - 10.0) < 1e-9
    assert abs(row["c"]["y"] - 20.0) < 1e-9


def test_within_ray_casting(spark):
    rows = spark.sql("""
        SELECT st_within(st_point(10D, 20D), ring) AS center_in,
               st_within(st_point(14D, 20D), ring) AS inside_in,
               st_within(st_point(16D, 20D), ring) AS outside_out,
               st_within(st_point(10D, 26D), ring) AS above_out
        FROM (SELECT st_buffer(st_point(10D, 20D), 5D) AS ring)
    """).collect()[0]
    assert rows["center_in"] is True
    assert rows["inside_in"] is True
    assert rows["outside_out"] is False
    assert rows["above_out"] is False


def test_intersects_extent(spark):
    rows = spark.sql("""
        SELECT st_intersects_extent(
                   st_buffer(st_point(0D, 0D), 5D),
                   st_buffer(st_point(8D, 0D), 5D)) AS touching,
               st_intersects_extent(
                   st_buffer(st_point(0D, 0D), 5D),
                   st_buffer(st_point(100D, 0D), 5D)) AS apart
    """).collect()[0]
    assert rows["touching"] is True
    assert rows["apart"] is False


def test_polygon_wkb_roundtrip(spark):
    """st_polyfromwkb(st_aswkb_poly(ring)) preserves every vertex; the
    WKB bytes follow the single-ring polygon layout."""
    row = spark.sql("""
        SELECT st_aswkb_poly(ring) AS wkb,
               st_polyfromwkb(st_aswkb_poly(ring)) AS back,
               ring
        FROM (SELECT st_buffer(st_point(3D, 4D), 2D) AS ring)
    """).collect()[0]
    b = row["wkb"]
    assert b[0] == 1
    gtype, nrings, npts = struct.unpack_from("<III", b, 1)
    assert (gtype, nrings, npts) == (3, 1, 9)
    assert len(b) == 13 + 16 * 9
    assert [(p["x"], p["y"]) for p in row["back"]] == \
        [(p["x"], p["y"]) for p in row["ring"]]


def test_polygon_wkb_host_helper_matches(spark):
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    b = geo.polygon_wkb(ring)
    row = spark.sql(
        "SELECT st_area(st_polyfromwkb(X'" + b.hex() + "')) AS area,"
        " st_x_poly_centroid_wkb(X'" + b.hex() + "') AS cx").collect()[0]
    assert abs(row["area"] - 16.0) < 1e-12
    assert abs(row["cx"] - 2.0) < 1e-12


def test_affine_and_measure_functions(spark):
    """Third-batch functions: envelope, translate, scale, rotate90,
    makeline/length, pointn, isclosed on a known square."""
    row = spark.sql("""
        WITH sq AS (SELECT array(
            st_point(0D, 0D), st_point(4D, 0D), st_point(4D, 4D),
            st_point(0D, 4D), st_point(0D, 0D)) AS ring)
        SELECT st_envelope(ring) AS env,
               st_envelope(st_translate(ring, 1D, 2D)) AS tenv,
               st_envelope(st_scale(ring, 2D, 0.5D)) AS senv,
               st_pointn(st_rotate90(ring, 1), 2) AS rp,
               st_length(st_makeline(st_point(0D, 0D), st_point(3D, 4D)))
                   AS len,
               st_isclosed(ring) AS closed,
               st_isclosed(slice(ring, 1, 4)) AS open
        FROM sq
    """).collect()[0]
    assert (row["env"]["xmin"], row["env"]["ymax"]) == (0.0, 4.0)
    assert (row["tenv"]["xmin"], row["tenv"]["ymax"]) == (1.0, 6.0)
    assert (row["senv"]["xmax"], row["senv"]["ymax"]) == (8.0, 2.0)
    # rotate90 of (4,0) -> (0,4)
    assert (row["rp"]["x"], row["rp"]["y"]) == (0.0, 4.0)
    assert row["len"] == 5.0
    assert row["closed"] is True and row["open"] is False


def test_envelope_set_algebra(spark):
    """Fifth-batch functions: envelope intersection/union/difference,
    equals/touches/overlaps/contains, boundary, radial simplify —
    closed-form cases with every predicate branch exercised."""
    from gizmosql_spark import functions as gf

    gf.register_all(spark)
    row = spark.sql("""
        WITH e AS (SELECT
            named_struct('xmin', 0D, 'ymin', 0D, 'xmax', 4D, 'ymax', 4D) AS a,
            named_struct('xmin', 2D, 'ymin', 2D, 'xmax', 6D, 'ymax', 6D) AS b,
            named_struct('xmin', 4D, 'ymin', 0D, 'xmax', 8D, 'ymax', 4D) AS t,
            named_struct('xmin', 9D, 'ymin', 9D, 'xmax', 10D, 'ymax', 10D)
                AS far,
            named_struct('xmin', 1D, 'ymin', 1D, 'xmax', 2D, 'ymax', 2D)
                AS inner)
        SELECT st_intersection_env(a, b) AS ab,
               st_intersection_env(a, far) AS none,
               st_env_area(st_intersection_env(a, b)) AS ab_area,
               st_env_area(st_intersection_env(a, far)) AS none_area,
               st_env_area(st_union_env(a, b)) AS u_area,
               st_difference_area_env(a, b) AS d_area,
               st_equals_env(a, a) AS eq_self,
               st_touches_env(a, t) AS touch_edge,
               st_touches_env(a, b) AS touch_overlap,
               st_overlaps_env(a, b) AS ovl,
               st_overlaps_env(a, inner) AS ovl_contained,
               st_contains_env_env(a, inner) AS cont,
               st_numpoints(st_boundary_line(array(
                   st_point(0D, 0D), st_point(1D, 1D)))) AS open_bnd,
               st_numpoints(st_boundary_line(array(
                   st_point(0D, 0D), st_point(1D, 1D), st_point(0D, 0D))))
                   AS closed_bnd,
               st_simplify_radial(array(
                   st_point(0D, 0D), st_point(0.5D, 0D), st_point(3D, 0D),
                   st_point(3.4D, 0D), st_point(7D, 0D)), 1D) AS simp
        FROM e
    """).collect()[0]
    assert (row["ab"]["xmin"], row["ab"]["xmax"]) == (2.0, 4.0)
    assert row["none"] is None and row["none_area"] == 0.0
    assert row["ab_area"] == 4.0
    assert row["u_area"] == 36.0
    assert row["d_area"] == 12.0          # 16 - 4
    assert row["eq_self"] is True
    assert row["touch_edge"] is True      # shared x=4 edge
    assert row["touch_overlap"] is False  # interiors intersect
    assert row["ovl"] is True
    assert row["ovl_contained"] is False  # containment is not overlap
    assert row["cont"] is True
    assert row["open_bnd"] == 2 and row["closed_bnd"] == 0
    # radial simplify keeps 0, 3, 7 (0.5 and 3.4 are < tol from kept)
    assert [p["x"] for p in row["simp"]] == [0.0, 3.0, 7.0]


# --- round-4: true polygon set algebra (Sutherland–Hodgman) ----------


@pytest.fixture(scope="module")
def _geo(spark):
    geo.register_geo(spark)


def _one(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


SQUARE = ("array(named_struct('x',0d,'y',0d), named_struct('x',4d,'y',0d),"
          " named_struct('x',4d,'y',4d), named_struct('x',0d,'y',4d),"
          " named_struct('x',0d,'y',0d))")


def test_clip_halfplane_no_overlap_is_empty(spark, _geo):
    # clip to the half-plane x <= -1 (left of the upward line x=-1)
    v = _one(spark, f"""st_clip_halfplane({SQUARE},
        named_struct('x',-1d,'y',0d), named_struct('x',-1d,'y',1d))""")
    assert v == []


def test_clip_halfplane_full_containment_identity(spark, _geo):
    v = _one(spark, f"""st_poly_area(st_clip_halfplane({SQUARE},
        named_struct('x',100d,'y',0d), named_struct('x',100d,'y',1d)))""")
    assert v == 16.0


def test_intersection_poly_concave_subject(spark, _geo):
    # U-shape: 6x4 rect minus a 2x2 notch on the top edge (concave);
    # clip with its right half x >= 3 → area = 12 - 2 (half the
    # notch... notch spans x in [2,4]: right part [3,4] is 1x2) = 10
    u_shape = ("array(named_struct('x',0d,'y',0d),"
               " named_struct('x',6d,'y',0d), named_struct('x',6d,'y',4d),"
               " named_struct('x',4d,'y',4d), named_struct('x',4d,'y',2d),"
               " named_struct('x',2d,'y',2d), named_struct('x',2d,'y',4d),"
               " named_struct('x',0d,'y',4d), named_struct('x',0d,'y',0d))")
    v = _one(spark, f"""st_intersection_area_poly({u_shape},
        st_makeenvelope(3d, -1d, 7d, 5d))""")
    assert v == pytest.approx(10.0)


def test_union_difference_inclusion_exclusion(spark, _geo):
    a, b = SQUARE, "st_makeenvelope(2d, 2d, 6d, 6d)"
    inter = _one(spark, f"st_intersection_area_poly({a}, {b})")
    union = _one(spark, f"st_union_area_poly({a}, {b})")
    diff = _one(spark, f"st_difference_area_poly({a}, {b})")
    assert inter == pytest.approx(4.0)
    assert union == pytest.approx(16.0 + 16.0 - 4.0)
    assert diff == pytest.approx(12.0)


def test_convexhull_drops_interior_and_duplicates(spark, _geo):
    v = _one(spark, """st_convexhull(array(
        named_struct('x',0d,'y',0d), named_struct('x',4d,'y',0d),
        named_struct('x',4d,'y',4d), named_struct('x',0d,'y',4d),
        named_struct('x',2d,'y',2d), named_struct('x',2d,'y',0d),
        named_struct('x',0d,'y',0d)))""")
    pts = [(p["x"], p["y"]) for p in v]
    # closed CCW square from the lexicographic minimum; the interior
    # point, the collinear edge midpoint, and the duplicate are gone
    assert pts == [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]


def test_orientation_and_reverse(spark, _geo):
    assert _one(spark, f"st_orientation({SQUARE})") == 1
    assert _one(spark, f"st_orientation(st_reverse({SQUARE}))") == -1


# --- round-4: accessor/algorithm breadth batches ---------------------


def test_segment_intersects_edge_cases(spark, _geo):
    def seg(ax, ay, bx, by, cx, cy, dx, dy):
        return _one(spark, f"""st_segment_intersects(
            named_struct('x',{ax}d,'y',{ay}d), named_struct('x',{bx}d,'y',{by}d),
            named_struct('x',{cx}d,'y',{cy}d), named_struct('x',{dx}d,'y',{dy}d))""")
    assert seg(0, 0, 4, 4, 0, 4, 4, 0) is True      # proper crossing
    assert seg(0, 0, 4, 0, 4, 0, 4, 4) is True      # shared endpoint
    assert seg(0, 0, 2, 0, 3, 0, 5, 0) is False     # collinear disjoint
    assert seg(0, 0, 3, 0, 2, 0, 5, 0) is True      # collinear overlap
    assert seg(0, 0, 1, 0, 0, 1, 1, 1) is False     # parallel


def test_segment_intersection_parallel_is_null(spark, _geo):
    v = _one(spark, """st_segment_intersection(
        named_struct('x',0d,'y',0d), named_struct('x',1d,'y',0d),
        named_struct('x',0d,'y',1d), named_struct('x',1d,'y',1d))""")
    assert v is None


def test_distance_ring_inside_point_hits_boundary(spark, _geo):
    # point inside: distance is to the nearest edge of the boundary
    v = _one(spark, f"""st_distance_ring(
        named_struct('x',1d,'y',2d), {SQUARE})""")
    assert v == pytest.approx(1.0)


def test_segmentize_preserves_length_and_endpoints(spark, _geo):
    row = spark.sql("""
        SELECT st_length(st_segmentize(array(
            named_struct('x',0d,'y',0d), named_struct('x',3d,'y',4d),
            named_struct('x',3d,'y',10d)), 2d)) AS len,
               st_segmentize(array(
            named_struct('x',0d,'y',0d), named_struct('x',3d,'y',4d),
            named_struct('x',3d,'y',10d)), 2d) AS pts
    """).collect()[0]
    assert row["len"] == pytest.approx(11.0)
    assert (row["pts"][0]["x"], row["pts"][0]["y"]) == (0.0, 0.0)
    assert (row["pts"][-1]["x"], row["pts"][-1]["y"]) == (3.0, 10.0)
    # every hop <= maxlen
    xs = [(p["x"], p["y"]) for p in row["pts"]]
    for (x1, y1), (x2, y2) in zip(xs, xs[1:]):
        assert ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5 <= 2.0 + 1e-9


def test_normalize_ring_is_rotation_invariant(spark, _geo):
    rots = []
    pts = [(0, 0), (4, 0), (4, 4), (0, 4)]
    for r in range(4):
        rot = pts[r:] + pts[:r]
        arr = ", ".join(
            f"named_struct('x',{x}d,'y',{y}d)" for x, y in rot + rot[:1])
        rots.append(tuple(
            (p["x"], p["y"]) for p in
            _one(spark, f"st_normalize_ring(array({arr}))")))
    assert len(set(rots)) == 1
    assert rots[0][0] == (0.0, 0.0)


def test_wkt_polygon_roundtrip_exact(spark, _geo):
    wkt = _one(spark, f"st_astext_poly({SQUARE})")
    assert wkt == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    back = _one(spark, f"st_geomfromtext_poly('{wkt}')")
    assert [(p["x"], p["y"]) for p in back] == [
        (0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
