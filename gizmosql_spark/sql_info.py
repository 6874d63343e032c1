"""SQL capability info + JDBC type info — the metadata contract.

Re-expresses GetSqlInfo (/root/reference/src/duckdb/duckdb_sql_info.cpp:
193-388 static flags, :35-93 dynamic keyword/function lists) and
DoGetXdbcTypeInfo (/root/reference/src/duckdb/duckdb_type_info.cpp) for
the Spark engine: the same capability keys, with values that are true
of Spark SQL, plus dynamic function/keyword inventories pulled from the
live session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: static capability flags (Flight SQL / JDBC info keys, mirroring the
#: reference's inventory with Spark-true values)
SQL_INFO: dict[str, object] = {
    "FLIGHT_SQL_SERVER_NAME": "gizmosql-spark",
    # id 1 — stock ADBC clients read name+version on connect; absence
    # surfaced in the stock-client replay gate (r5)
    "FLIGHT_SQL_SERVER_VERSION": "0.1.0",
    "FLIGHT_SQL_SERVER_ARROW_VERSION": "native",
    "FLIGHT_SQL_SERVER_READ_ONLY": False,
    "SQL_DDL_CATALOG": False,          # Spark: catalogs are plugins
    "SQL_DDL_SCHEMA": True,
    "SQL_DDL_TABLE": True,
    "SQL_IDENTIFIER_CASE": "case_insensitive",
    "SQL_IDENTIFIER_QUOTE_CHAR": "`",
    "SQL_QUOTED_IDENTIFIER_CASE": "case_insensitive",
    "SQL_ALL_TABLES_ARE_SELECTABLE": True,
    "SQL_NULL_ORDERING": "nulls_sorted_at_start",  # Spark default NULLS FIRST asc
    "SQL_MAX_COLUMNS_IN_TABLE": 0,     # unbounded
    "SQL_TRANSACTIONS_SUPPORTED": False,  # documented deviation (SURVEY §7)
    "SQL_SUPPORTED_GROUP_BY": "GROUP_BY_BEYOND_SELECT",
    "SQL_SUPPORTED_GRAMMAR": "ANSI92_FULL",
    "SQL_OUTER_JOINS_SUPPORT_LEVEL": "FULL",
    "SQL_SUPPORTED_SUBQUERIES": [
        "IN_COMPARISONS", "IN_EXISTS", "IN_INSERTS", "IN_QUANTIFIEDS",
    ],
    "SQL_CORRELATED_SUBQUERIES_SUPPORTED": True,
    "SQL_UNION_SUPPORTED": True,
    "SQL_UNION_ALL_SUPPORTED": True,
    "SQL_CATALOG_TERM": "catalog",
    "SQL_SCHEMA_TERM": "database",
    "SQL_TABLE_TERM": "table",
    "SQL_PROCEDURE_TERM": "function",
}


def get_sql_info(spark: SparkSession, keys: list[str] | None = None) -> dict[str, object]:
    """Static flags + dynamic inventories (the reference pulls these
    from duckdb_keywords()/duckdb_functions(); Spark exposes SHOW
    FUNCTIONS)."""
    info = dict(SQL_INFO)
    info["SQL_SUPPORTED_FUNCTIONS"] = sorted(
        r[0] for r in spark.sql("SHOW FUNCTIONS").collect()
    )
    if keys is not None:
        info = {k: v for k, v in info.items() if k in keys}
    return info


#: (type_name, jdbc_data_type, precision, literal_prefix, literal_suffix,
#:  nullable, case_sensitive, searchable) — the XdbcTypeInfo row shape
#: (duckdb_type_info.cpp:59+), for Spark SQL types.
_XDBC_ROWS = [
    ("BOOLEAN", 16, 1, None, None, True, False, True),
    ("TINYINT", -6, 3, None, None, True, False, True),
    ("SMALLINT", 5, 5, None, None, True, False, True),
    ("INT", 4, 10, None, None, True, False, True),
    ("BIGINT", -5, 19, None, None, True, False, True),
    ("FLOAT", 7, 7, None, None, True, False, True),
    ("DOUBLE", 8, 15, None, None, True, False, True),
    ("DECIMAL", 3, 38, None, None, True, False, True),
    ("STRING", 12, 0, "'", "'", True, True, True),
    ("BINARY", -3, 0, "X'", "'", True, False, False),
    ("DATE", 91, 10, "DATE '", "'", True, False, True),
    ("TIMESTAMP", 93, 26, "TIMESTAMP '", "'", True, False, True),
    ("TIMESTAMP_NTZ", 93, 26, "TIMESTAMP_NTZ '", "'", True, False, True),
    ("INTERVAL DAY TO SECOND", 110, 0, "INTERVAL '", "'", True, False, True),
    ("ARRAY", 2003, 0, None, None, True, False, False),
    ("MAP", 2000, 0, None, None, True, False, False),
    ("STRUCT", 2002, 0, None, None, True, False, False),
    ("VARIANT", 1111, 0, None, None, True, False, False),
]

_XDBC_SCHEMA = (
    "type_name string, data_type int, column_size int, literal_prefix string, "
    "literal_suffix string, nullable boolean, case_sensitive boolean, "
    "searchable boolean"
)


def get_xdbc_type_info(spark: SparkSession, data_type: int | None = None) -> DataFrame:
    """DoGetXdbcTypeInfo analog: static rows describing each SQL type."""
    df = spark.createDataFrame(_XDBC_ROWS, _XDBC_SCHEMA)
    if data_type is not None:
        df = df.filter(df.data_type == data_type)
    return df
