"""Flight SQL metadata result tables in the wire-spec schemas.

The Flight SQL protocol fixes the Arrow result schema of every
metadata command (public contract: apache/arrow
``format/FlightSql.proto`` comments; the reference serves the same
shapes from information_schema queries,
/root/reference/src/duckdb/duckdb_server.cpp:1310-1352,1515-1656).
These builders adapt the engine's catalog / constraint / sql-info
DataFrames (catalog.py, constraints.py, sql_info.py) into
``pyarrow.Table``s with exactly those column names and types, so a
stock Flight SQL client's metadata calls parse without adaptation.

All of these frames are metadata-sized (tables, schemas, constraint
rows) — collecting them driver-side is the correct plan at any scale.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import SparkSession

from gizmosql_spark import catalog as cat
from gizmosql_spark import sql_info as si
from gizmosql_spark.constraints import ConstraintRegistry

# --- fixed wire schemas ----------------------------------------------

CATALOGS_SCHEMA = pa.schema([pa.field("catalog_name", pa.utf8(), False)])

DB_SCHEMAS_SCHEMA = pa.schema(
    [
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8(), False),
    ]
)


def tables_schema(include_schema: bool) -> pa.Schema:
    fields = [
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8()),
        pa.field("table_name", pa.utf8(), False),
        pa.field("table_type", pa.utf8(), False),
    ]
    if include_schema:
        fields.append(pa.field("table_schema", pa.binary(), False))
    return pa.schema(fields)


TABLE_TYPES_SCHEMA = pa.schema([pa.field("table_type", pa.utf8(), False)])

PRIMARY_KEYS_SCHEMA = pa.schema(
    [
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8()),
        pa.field("table_name", pa.utf8(), False),
        pa.field("column_name", pa.utf8(), False),
        pa.field("key_name", pa.utf8()),
        pa.field("key_sequence", pa.int32(), False),
    ]
)

FK_SCHEMA = pa.schema(
    [
        pa.field("pk_catalog_name", pa.utf8()),
        pa.field("pk_db_schema_name", pa.utf8()),
        pa.field("pk_table_name", pa.utf8(), False),
        pa.field("pk_column_name", pa.utf8(), False),
        pa.field("fk_catalog_name", pa.utf8()),
        pa.field("fk_db_schema_name", pa.utf8()),
        pa.field("fk_table_name", pa.utf8(), False),
        pa.field("fk_column_name", pa.utf8(), False),
        pa.field("key_sequence", pa.int32(), False),
        pa.field("fk_key_name", pa.utf8()),
        pa.field("pk_key_name", pa.utf8()),
        pa.field("update_rule", pa.uint8(), False),
        pa.field("delete_rule", pa.uint8(), False),
    ]
)

SQL_INFO_VALUE_TYPE = pa.dense_union(
    [
        pa.field("string_value", pa.utf8()),
        pa.field("bool_value", pa.bool_()),
        pa.field("bigint_value", pa.int64()),
        pa.field("int32_bitmask", pa.int32()),
        pa.field("string_list", pa.list_(pa.utf8())),
        pa.field(
            "int32_to_int32_list_map", pa.map_(pa.int32(), pa.list_(pa.int32()))
        ),
    ],
    type_codes=[0, 1, 2, 3, 4, 5],
)

SQL_INFO_SCHEMA = pa.schema(
    [
        pa.field("info_name", pa.uint32(), False),
        pa.field("value", SQL_INFO_VALUE_TYPE),
    ]
)

XDBC_TYPE_INFO_SCHEMA = pa.schema(
    [
        pa.field("type_name", pa.utf8(), False),
        pa.field("data_type", pa.int32(), False),
        pa.field("column_size", pa.int32()),
        pa.field("literal_prefix", pa.utf8()),
        pa.field("literal_suffix", pa.utf8()),
        pa.field("create_params", pa.list_(pa.utf8())),
        pa.field("nullable", pa.int32(), False),
        pa.field("case_sensitive", pa.bool_(), False),
        pa.field("searchable", pa.int32(), False),
        pa.field("unsigned_attribute", pa.bool_()),
        pa.field("fixed_prec_scale", pa.bool_(), False),
        pa.field("auto_increment", pa.bool_()),
        pa.field("local_type_name", pa.utf8()),
        pa.field("minimum_scale", pa.int32()),
        pa.field("maximum_scale", pa.int32()),
        pa.field("sql_data_type", pa.int32(), False),
        pa.field("datetime_subcode", pa.int32()),
        pa.field("num_prec_radix", pa.int32()),
        pa.field("interval_precision", pa.int32()),
    ]
)

#: SqlInfo uint32 ids (public FlightSql.proto SqlInfo enum) for the
#: keys sql_info.py tracks by name. Keys without a standard id stay
#: JSON-tier only.
SQL_INFO_IDS: dict[str, int] = {
    "FLIGHT_SQL_SERVER_NAME": 0,
    "FLIGHT_SQL_SERVER_VERSION": 1,
    "FLIGHT_SQL_SERVER_ARROW_VERSION": 2,
    "FLIGHT_SQL_SERVER_READ_ONLY": 3,
    "SQL_DDL_CATALOG": 500,
    "SQL_DDL_SCHEMA": 501,
    "SQL_DDL_TABLE": 502,
    "SQL_IDENTIFIER_CASE": 503,
    "SQL_IDENTIFIER_QUOTE_CHAR": 504,
    "SQL_QUOTED_IDENTIFIER_CASE": 505,
    "SQL_ALL_TABLES_ARE_SELECTABLE": 506,
    "SQL_NULL_ORDERING": 507,
    "SQL_SUPPORTED_FUNCTIONS": 509,  # served as a string list
}


# --- builders ---------------------------------------------------------


def get_catalogs(spark: SparkSession) -> pa.Table:
    names = [r["catalog_name"] for r in cat.get_catalogs(spark).collect()]
    return pa.table({"catalog_name": pa.array(names, pa.utf8())},
                    schema=CATALOGS_SCHEMA)


def get_db_schemas(
    spark: SparkSession, catalog: str | None = None,
    pattern: str | None = None,
) -> pa.Table:
    df = cat.get_db_schemas(spark, pattern or None)
    rows = df.collect()
    if catalog:
        rows = [r for r in rows if r["catalog_name"] == catalog]
    return pa.table(
        {
            "catalog_name": pa.array([r["catalog_name"] for r in rows], pa.utf8()),
            "db_schema_name": pa.array(
                [r["db_schema_name"] for r in rows], pa.utf8()
            ),
        },
        schema=DB_SCHEMAS_SCHEMA,
    )


def get_tables(
    spark: SparkSession,
    catalog: str | None = None,
    db_schema_pattern: str | None = None,
    table_name_pattern: str | None = None,
    table_types: list[str] | None = None,
    include_schema: bool = False,
) -> pa.Table:
    df = cat.get_tables(spark, table_name_pattern or None, include_schema=False)
    rows = df.collect()
    if catalog:
        rows = [r for r in rows if r["table_catalog"] == catalog]
    if table_types:
        rows = [r for r in rows if r["table_type"] in table_types]
    cols: dict[str, pa.Array] = {
        "catalog_name": pa.array([r["table_catalog"] for r in rows], pa.utf8()),
        "db_schema_name": pa.array([r["table_schema"] for r in rows], pa.utf8()),
        "table_name": pa.array([r["table_name"] for r in rows], pa.utf8()),
        "table_type": pa.array([r["table_type"] for r in rows], pa.utf8()),
    }
    if include_schema:
        # the spec attaches each table's *serialized Arrow schema*
        from pyspark.sql.pandas.types import to_arrow_schema

        blobs = []
        for r in rows:
            try:
                s = to_arrow_schema(spark.table(r["table_name"]).schema)
            except Exception:
                s = pa.schema([])
            blobs.append(s.serialize().to_pybytes())
        cols["table_schema"] = pa.array(blobs, pa.binary())
    return pa.table(cols, schema=tables_schema(include_schema))


def get_table_types(spark: SparkSession) -> pa.Table:
    rows = [r["table_type"] for r in cat.get_table_types(spark).collect()]
    return pa.table({"table_type": pa.array(rows, pa.utf8())},
                    schema=TABLE_TYPES_SCHEMA)


def get_primary_keys(
    spark: SparkSession, registry: ConstraintRegistry, table: str
) -> pa.Table:
    rows = registry.get_primary_keys(spark, table).collect()
    return pa.table(
        {
            "catalog_name": [r["catalog_name"] for r in rows],
            "db_schema_name": [r["db_schema_name"] for r in rows],
            "table_name": [r["table_name"] for r in rows],
            "column_name": [r["column_name"] for r in rows],
            "key_name": [r["key_name"] for r in rows],
            "key_sequence": pa.array(
                [r["key_sequence"] for r in rows], pa.int32()
            ),
        },
        schema=PRIMARY_KEYS_SCHEMA,
    )


def _fk_table(rows) -> pa.Table:
    # update_rule/delete_rule: 3 = SET_DEFAULT/no-action convention the
    # reference reports for non-enforced constraints
    return pa.table(
        {
            "pk_catalog_name": [r["pk_catalog_name"] for r in rows],
            "pk_db_schema_name": [r["pk_db_schema_name"] for r in rows],
            "pk_table_name": [r["pk_table_name"] for r in rows],
            "pk_column_name": [r["pk_column_name"] for r in rows],
            "fk_catalog_name": [r["fk_catalog_name"] for r in rows],
            "fk_db_schema_name": [r["fk_db_schema_name"] for r in rows],
            "fk_table_name": [r["fk_table_name"] for r in rows],
            "fk_column_name": [r["fk_column_name"] for r in rows],
            "key_sequence": pa.array([r["key_sequence"] for r in rows], pa.int32()),
            "fk_key_name": [r["fk_key_name"] for r in rows],
            "pk_key_name": [r["pk_key_name"] for r in rows],
            "update_rule": pa.array([3] * len(rows), pa.uint8()),
            "delete_rule": pa.array([3] * len(rows), pa.uint8()),
        },
        schema=FK_SCHEMA,
    )


def get_imported_keys(
    spark: SparkSession, registry: ConstraintRegistry, table: str
) -> pa.Table:
    return _fk_table(registry.get_imported_keys(spark, table).collect())


def get_exported_keys(
    spark: SparkSession, registry: ConstraintRegistry, table: str
) -> pa.Table:
    return _fk_table(registry.get_exported_keys(spark, table).collect())


def get_cross_reference(
    spark: SparkSession, registry: ConstraintRegistry,
    pk_table: str, fk_table: str,
) -> pa.Table:
    return _fk_table(registry.get_cross_reference(spark, pk_table, fk_table).collect())


def get_sql_info(spark: SparkSession, ids: list[int] | None = None) -> pa.Table:
    """SqlInfo rows as the spec's dense-union value column: strings →
    string_value (code 0), bools → bool_value (1), ints →
    bigint_value (2), string lists → string_list (4)."""
    info = si.get_sql_info(spark)
    items: list[tuple[int, object]] = []
    for key, value in info.items():
        num = SQL_INFO_IDS.get(key)
        if num is None:
            continue
        if ids and num not in ids:
            continue
        items.append((num, value))
    items.sort()

    type_ids: list[int] = []
    offsets: list[int] = []
    strings: list[str] = []
    bools: list[bool] = []
    ints: list[int] = []
    bitmasks: list[int] = []
    string_lists: list[list[str]] = []
    for _, value in items:
        if isinstance(value, bool):
            type_ids.append(1)
            offsets.append(len(bools))
            bools.append(value)
        elif isinstance(value, int):
            type_ids.append(2)
            offsets.append(len(ints))
            ints.append(value)
        elif isinstance(value, (list, tuple)):
            type_ids.append(4)
            offsets.append(len(string_lists))
            string_lists.append([str(v) for v in value])
        else:
            type_ids.append(0)
            offsets.append(len(strings))
            strings.append(str(value))
    value_arr = pa.UnionArray.from_dense(
        pa.array(type_ids, pa.int8()),
        pa.array(offsets, pa.int32()),
        [
            pa.array(strings, pa.utf8()),
            pa.array(bools, pa.bool_()),
            pa.array(ints, pa.int64()),
            pa.array(bitmasks, pa.int32()),
            pa.array(string_lists, pa.list_(pa.utf8())),
            pa.array([], pa.map_(pa.int32(), pa.list_(pa.int32()))),
        ],
        [f.name for f in SQL_INFO_VALUE_TYPE],
        list(SQL_INFO_VALUE_TYPE.type_codes),
    )
    return pa.Table.from_arrays(
        [pa.array([n for n, _ in items], pa.uint32()), value_arr],
        schema=SQL_INFO_SCHEMA,
    )


def get_xdbc_type_info(spark: SparkSession, data_type: int | None = None) -> pa.Table:
    rows = si.get_xdbc_type_info(spark, data_type).collect()
    n = len(rows)
    return pa.table(
        {
            "type_name": [r["type_name"] for r in rows],
            "data_type": pa.array([r["data_type"] for r in rows], pa.int32()),
            "column_size": pa.array([r["column_size"] for r in rows], pa.int32()),
            "literal_prefix": [r["literal_prefix"] for r in rows],
            "literal_suffix": [r["literal_suffix"] for r in rows],
            "create_params": pa.array([None] * n, pa.list_(pa.utf8())),
            # nullable: 1 = SQL_NULLABLE
            "nullable": pa.array(
                [1 if r["nullable"] else 0 for r in rows], pa.int32()
            ),
            "case_sensitive": pa.array(
                [bool(r["case_sensitive"]) for r in rows], pa.bool_()
            ),
            # searchable: 3 = SQL_SEARCHABLE
            "searchable": pa.array(
                [3 if r["searchable"] else 0 for r in rows], pa.int32()
            ),
            "unsigned_attribute": pa.array([None] * n, pa.bool_()),
            "fixed_prec_scale": pa.array([False] * n, pa.bool_()),
            "auto_increment": pa.array([None] * n, pa.bool_()),
            "local_type_name": [r["type_name"] for r in rows],
            "minimum_scale": pa.array([None] * n, pa.int32()),
            "maximum_scale": pa.array([None] * n, pa.int32()),
            "sql_data_type": pa.array([r["data_type"] for r in rows], pa.int32()),
            "datetime_subcode": pa.array([None] * n, pa.int32()),
            "num_prec_radix": pa.array(
                [10 if r["data_type"] in (4, 5, -6, -5, 3, 7, 8) else None
                 for r in rows],
                pa.int32(),
            ),
            "interval_precision": pa.array([None] * n, pa.int32()),
        },
        schema=XDBC_TYPE_INFO_SCHEMA,
    )
