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
