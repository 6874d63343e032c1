"""Scalar function surface — gap-fillers for the §2E contract.

The reference advertises DuckDB's scalar inventory to clients
(/root/reference/src/duckdb/duckdb_sql_info.cpp:96-186). Nearly all of
it is native in Spark (SURVEY §2E mapping); this module registers the
gaps so the SQL surface reaches parity:

- string similarity: JACCARD / HAMMING / MISMATCHES / EDITDIST3
  (duckdb_sql_info.cpp:159-162) as **SQL UDFs** (Spark ≥4 scalar SQL
  functions) — pure Catalyst expressions, whole-stage codegen, no
  Python in the hot path. These also power the dedup operators.
- numeric gaps: GAMMA / LGAMMA / NEXTAFTER as vectorized Pandas UDFs
  (Arrow-batched; the only places Python is required).
- EVEN (round away from zero to even) as a SQL UDF.

``register_all(spark)`` is idempotent per session.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

# SQL scalar functions (JVM-evaluated): name -> (signature, body)
_SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    # char-set Jaccard similarity, DuckDB jaccard() semantics
    "jaccard": (
        "(a STRING, b STRING) RETURNS DOUBLE",
        "CAST(size(array_intersect(array_distinct(split(a, '')),"
        " array_distinct(split(b, '')))) AS DOUBLE)"
        " / size(array_union(array_distinct(split(a, '')),"
        " array_distinct(split(b, ''))))",
    ),
    # positional mismatch count over equal-length strings
    "mismatches": (
        "(a STRING, b STRING) RETURNS INT",
        "CASE WHEN length(a) <> length(b) THEN NULL ELSE"
        " size(filter(zip_with(split(a, ''), split(b, ''), (x, y) -> x = y),"
        " v -> NOT v)) END",
    ),
    # DuckDB hamming() is mismatches on equal-length strings
    "hamming": (
        "(a STRING, b STRING) RETURNS INT",
        "mismatches(a, b)",
    ),
    # EDITDIST3 = levenshtein (duckdb aliases them)
    "editdist3": (
        "(a STRING, b STRING) RETURNS INT",
        "levenshtein(a, b)",
    ),
    # round to next even integer away from zero (DuckDB even())
    "even": (
        "(x DOUBLE) RETURNS DOUBLE",
        "CASE WHEN x >= 0 THEN ceil(x / 2) * 2 ELSE floor(x / 2) * 2 END",
    ),
    # --- DuckDB dialect aliases (duckdb_sql_info.cpp:106-186) ---------
    # 1-based list access; negative indexes count from the end
    "list_element": (
        "(l ARRAY<STRING>, i INT) RETURNS STRING",
        "element_at(l, i)",
    ),
    "list_extract": (
        "(l ARRAY<STRING>, i INT) RETURNS STRING",
        "element_at(l, i)",
    ),
    "array_extract": (
        "(l ARRAY<STRING>, i INT) RETURNS STRING",
        "element_at(l, i)",
    ),
    # list_slice / array_slice: 1-based inclusive bounds
    "list_slice": (
        "(l ARRAY<STRING>, b INT, e INT) RETURNS ARRAY<STRING>",
        "slice(l, b, e - b + 1)",
    ),
    # split-family aliases over Spark's split()
    "str_split": (
        "(s STRING, sep STRING) RETURNS ARRAY<STRING>",
        "split(s, CASE WHEN sep = '' THEN '(?!^)(?!$)' ELSE regexp_replace(sep,"
        r" '([\\.\\^\\$\\*\\+\\?\\(\\)\\[\\]\\{\\}\\|\\\\])', '\\\\$1') END)",
    ),
    "string_to_array": (
        "(s STRING, sep STRING) RETURNS ARRAY<STRING>",
        "str_split(s, sep)",
    ),
    "str_split_regex": (
        "(s STRING, pat STRING) RETURNS ARRAY<STRING>",
        "split(s, pat)",
    ),
    "regexp_split_to_array": (
        "(s STRING, pat STRING) RETURNS ARRAY<STRING>",
        "split(s, pat)",
    ),
    # prefix/suffix predicates
    "prefix": (
        "(s STRING, p STRING) RETURNS BOOLEAN",
        "startswith(s, p)",
    ),
    "suffix": (
        "(s STRING, p STRING) RETURNS BOOLEAN",
        "endswith(s, p)",
    ),
    # date shortcuts (duckdb_sql_info.cpp:178-186)
    "today": ("() RETURNS DATE", "current_date()"),
    "yesterday": ("() RETURNS DATE", "date_sub(current_date(), 1)"),
    "tomorrow": ("() RETURNS DATE", "date_add(current_date(), 1)"),
    # --- spatial mini-surface (docs/geometry.md: ST_Point/ST_X/ST_Y/
    # ST_Distance/ST_Contains subset; full GEOMETRY needs Sedona) ------
    "st_point": (
        "(x DOUBLE, y DOUBLE) RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "named_struct('x', x, 'y', y)",
    ),
    "st_x": ("(p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS DOUBLE", "p.x"),
    "st_y": ("(p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS DOUBLE", "p.y"),
    "st_distance": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS DOUBLE",
        "sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))",
    ),
    "st_dwithin": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>,"
        " d DOUBLE) RETURNS BOOLEAN",
        # squared compare, not sqrt-then-compare: exact at the boundary
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= d * d",
    ),
    # point-in-envelope containment (bbox as xmin/ymin/xmax/ymax)
    "st_contains_bbox": (
        "(xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE,"
        " p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS BOOLEAN",
        "p.x >= xmin AND p.x <= xmax AND p.y >= ymin AND p.y <= ymax",
    ),
    # bearing/projection/spherical tier (docs/geometry.md contract):
    # all closed-form trig, so DuckDB oracles reproduce within float
    # tolerance (libm ulp differences only)
    "st_azimuth": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS DOUBLE",
        # clockwise-from-north bearing, normalized to [0, 2*pi)
        "(atan2(b.x - a.x, b.y - a.y) + 2 * pi()) % (2 * pi())",
    ),
    "st_project": (
        "(p STRUCT<x: DOUBLE, y: DOUBLE>, d DOUBLE, az DOUBLE)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "named_struct('x', p.x + d * sin(az), 'y', p.y + d * cos(az))",
    ),
    "st_distance_sphere": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS DOUBLE",
        # haversine over (x=lon deg, y=lat deg), R = 6371000 m
        "2 * 6371000D * asin(sqrt("
        " pow(sin(radians(b.y - a.y) / 2), 2)"
        " + cos(radians(a.y)) * cos(radians(b.y))"
        "   * pow(sin(radians(b.x - a.x) / 2), 2)))",
    ),
    "st_angle": (
        "(a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>,"
        " c STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS DOUBLE",
        # angle at vertex b, clockwise from ray b->a to ray b->c
        "(atan2(c.x - b.x, c.y - b.y) - atan2(a.x - b.x, a.y - b.y)"
        " + 4 * pi()) % (2 * pi())",
    ),
    "st_reverse": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "reverse(line)",
    ),
    "st_addpoint": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>,"
        " p STRUCT<x: DOUBLE, y: DOUBLE>)"
        " RETURNS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
        "array_append(line, p)",
    ),
    "st_numpoints": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>) RETURNS INT",
        "size(line)",
    ),
    "st_startpoint": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "element_at(line, 1)",
    ),
    "st_endpoint": (
        "(line ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)"
        " RETURNS STRUCT<x: DOUBLE, y: DOUBLE>",
        "element_at(line, -1)",
    ),
    # strftime/strptime in DuckDB argument order
    "strftime": (
        "(ts TIMESTAMP, fmt STRING) RETURNS STRING",
        # translate the most common C-style codes to Java SimpleDateFormat
        "date_format(ts, replace(replace(replace(replace(replace(replace("
        "replace(fmt, '%Y', 'yyyy'), '%m', 'MM'), '%d', 'dd'),"
        " '%H', 'HH'), '%M', 'mm'), '%S', 'ss'), '%f', 'SSSSSS'))",
    ),
}


def _pandas_gap_udfs():
    """Built lazily: pandas_udf needs an active SparkSession."""
    import unicodedata

    @pandas_udf("string")
    def strip_accents_(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: "".join(
                c for c in unicodedata.normalize("NFD", v)
                if unicodedata.category(c) != "Mn"
            )
            if v is not None
            else None
        )

    @pandas_udf("string")
    def nfc_normalize_(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    @pandas_udf("double")
    def gamma_(x: pd.Series) -> pd.Series:
        return x.map(lambda v: math.gamma(v) if v is not None else None)

    @pandas_udf("double")
    def lgamma_(x: pd.Series) -> pd.Series:
        return x.map(lambda v: math.lgamma(v) if v is not None else None)

    @pandas_udf("double")
    def nextafter_(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [
                math.nextafter(a, b) if a is not None and b is not None else None
                for a, b in zip(x, y)
            ]
        )

    return {
        "gamma": gamma_,
        "lgamma": lgamma_,
        "nextafter": nextafter_,
        "strip_accents": strip_accents_,
        "nfc_normalize": nfc_normalize_,
    }


#: sessions already carrying the surface — re-registering ~70 temp
#: functions costs ~0.45 s of spark.sql DDL round-trips per call, and
#: operators call this at build time, so the guard is a real win on
#: any multi-query session (bench: ~3 s across the spatial tier)
_REGISTERED: set[int] = set()


def register_all(spark: SparkSession) -> None:
    """Register the full gap-filler surface on a session (idempotent
    per session — temp functions survive for the session lifetime)."""
    if id(spark) in _REGISTERED:
        from gizmosql_spark.geo import register_geo

        register_geo(spark)
        return
    _REGISTERED.add(id(spark))
    for name, (sig, body) in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
    for name, fn in _pandas_gap_udfs().items():
        spark.udf.register(name, fn)
    # WKB/GeoArrow geometry tier builds on the struct st_* surface
    from gizmosql_spark.geo import register_geo

    register_geo(spark)
