"""Table registry + catalog metadata operators.

Mirrors the reference's metadata RPC surface (SURVEY §2A): DoGetCatalogs
/ DoGetDbSchemas / DoGetTables / DoGetTableTypes are information_schema
queries in the reference (/root/reference/src/duckdb/duckdb_server.cpp:
1310-1352, :1515-1539, :1597-1606); here they are DataFrames built from
``spark.catalog``.

The table registry loads the driver parquet fixtures as temp views so
both the SQL surface and the DataFrame operators address tables by name
— the Spark analog of DuckDB's attached-database catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The driver fixture tables (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    """Register each fixture parquet as a temp view; return the frames.

    Reads are plain ``spark.read.parquet`` so Catalyst gets the native
    vectorized reader with filter/column pushdown — never a manual scan.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# --- metadata operators (Flight SQL metadata RPC analogs) -------------


def get_catalogs(spark: SparkSession) -> DataFrame:
    """DoGetCatalogs analog (duckdb_server.cpp:1310-1319)."""
    rows = [(c.name,) for c in spark.catalog.listCatalogs()]
    return spark.createDataFrame(rows, "catalog_name string")


def get_db_schemas(spark: SparkSession, pattern: str | None = None) -> DataFrame:
    """DoGetDbSchemas analog (duckdb_server.cpp:1327-1352)."""
    cat = spark.catalog.currentCatalog()
    rows = [(cat, d.name) for d in spark.catalog.listDatabases()]
    df = spark.createDataFrame(rows, "catalog_name string, db_schema_name string")
    if pattern is not None:
        df = df.filter(df.db_schema_name.like(pattern))
    return df


def get_tables(
    spark: SparkSession,
    name_pattern: str | None = None,
    include_schema: bool = False,
) -> DataFrame:
    """DoGetTables analog (duckdb_server.cpp:1515-1539, :692-745).

    ``include_schema`` attaches each table's schema (as JSON, the Spark
    analog of the serialized Arrow schema the reference attaches via
    duckdb_tables_schema_batch_reader.cpp).
    """
    cat = spark.catalog.currentCatalog()
    rows = []
    for t in spark.catalog.listTables():
        ttype = "LOCAL TEMPORARY" if t.isTemporary else "BASE TABLE"
        if t.tableType == "VIEW" and not t.isTemporary:
            ttype = "VIEW"
        row = [cat, t.namespace[0] if t.namespace else None, t.name, ttype]
        if include_schema:
            row.append(spark.table(t.name).schema.json())
        rows.append(tuple(row))
    schema = "table_catalog string, table_schema string, table_name string, table_type string"
    if include_schema:
        schema += ", table_schema_json string"
    df = spark.createDataFrame(rows, schema)
    if name_pattern is not None:
        df = df.filter(df.table_name.like(name_pattern))
    return df


def get_table_types(spark: SparkSession) -> DataFrame:
    """DoGetTableTypes analog — constant 3 rows (duckdb_server.cpp:1597-1606)."""
    return spark.createDataFrame(
        [("BASE TABLE",), ("LOCAL TEMPORARY",), ("VIEW",)], "table_type string"
    )
