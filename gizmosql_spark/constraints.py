"""Engine-maintained constraint metadata (PK / FK / index info).

Spark has no enforced constraints, so — per SURVEY §2A — the engine
maintains its own registry and serves the JDBC-shaped metadata frames
the reference builds from ``duckdb_constraints()``:

- DoGetPrimaryKeys (/root/reference/src/duckdb/duckdb_server.cpp:
  1614-1656): (catalog, schema, table, column, key_sequence, key_name)
- DoGetImportedKeys / DoGetExportedKeys / DoGetCrossReference
  (duckdb_server.cpp:831-856, :1664-1777): FK↔PK rows
- gizmosql_index_info system-catalog view
  (/root/reference/src/common/system_catalog.cpp:5-62): indexes ∪
  PK/UNIQUE constraints, one row per column

Declarations are engine metadata only (``NOT ENFORCED`` semantics —
the same stance Delta takes); CREATE INDEX maps to a no-op row here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ForeignKey:
    fk_table: str
    fk_columns: tuple[str, ...]
    pk_table: str
    pk_columns: tuple[str, ...]
    name: str


@dataclass
class ConstraintRegistry:
    primary_keys: dict[str, tuple[str, ...]] = field(default_factory=dict)
    foreign_keys: list[ForeignKey] = field(default_factory=list)
    indexes: dict[str, dict[str, tuple[str, ...]]] = field(default_factory=dict)

    def declare_primary_key(self, table: str, *columns: str) -> None:
        self.primary_keys[table] = tuple(columns)

    def declare_foreign_key(self, fk_table: str, fk_columns: list[str],
                            pk_table: str, pk_columns: list[str],
                            name: str | None = None) -> None:
        self.foreign_keys.append(
            ForeignKey(
                fk_table, tuple(fk_columns), pk_table, tuple(pk_columns),
                name or f"fk_{fk_table}_{pk_table}",
            )
        )

    def declare_index(self, table: str, name: str, *columns: str) -> None:
        self.indexes.setdefault(table, {})[name] = tuple(columns)

    # --- metadata frames (JDBC row shapes) ----------------------------

    def get_primary_keys(self, spark: SparkSession, table: str) -> DataFrame:
        cols = self.primary_keys.get(table, ())
        rows = [
            ("spark_catalog", "default", table, c, i + 1, f"pk_{table}")
            for i, c in enumerate(cols)
        ]
        return spark.createDataFrame(
            rows,
            "catalog_name string, db_schema_name string, table_name string, "
            "column_name string, key_sequence int, key_name string",
        )

    def _fk_rows(self, fks: list[ForeignKey]) -> list[tuple]:
        rows = []
        for fk in fks:
            for i, (fc, pc) in enumerate(zip(fk.fk_columns, fk.pk_columns)):
                rows.append(
                    (
                        "spark_catalog", "default", fk.pk_table, pc,
                        "spark_catalog", "default", fk.fk_table, fc,
                        i + 1, fk.name, f"pk_{fk.pk_table}",
                    )
                )
        return rows

    _FK_SCHEMA = (
        "pk_catalog_name string, pk_db_schema_name string, pk_table_name string, "
        "pk_column_name string, fk_catalog_name string, fk_db_schema_name string, "
        "fk_table_name string, fk_column_name string, key_sequence int, "
        "fk_key_name string, pk_key_name string"
    )

    def get_imported_keys(self, spark: SparkSession, table: str) -> DataFrame:
        """FKs defined ON this table (it imports the referenced PKs)."""
        fks = [f for f in self.foreign_keys if f.fk_table == table]
        return spark.createDataFrame(self._fk_rows(fks), self._FK_SCHEMA)

    def get_exported_keys(self, spark: SparkSession, table: str) -> DataFrame:
        """FKs in other tables referencing this table's PK."""
        fks = [f for f in self.foreign_keys if f.pk_table == table]
        return spark.createDataFrame(self._fk_rows(fks), self._FK_SCHEMA)

    def get_cross_reference(self, spark: SparkSession, pk_table: str,
                            fk_table: str) -> DataFrame:
        fks = [
            f for f in self.foreign_keys
            if f.pk_table == pk_table and f.fk_table == fk_table
        ]
        return spark.createDataFrame(self._fk_rows(fks), self._FK_SCHEMA)

    def index_info(self, spark: SparkSession) -> DataFrame:
        """gizmosql_index_info analog: indexes ∪ PKs, one row/column."""
        rows = []
        for table, cols in self.primary_keys.items():
            for i, c in enumerate(cols):
                rows.append((table, f"pk_{table}", False, c, i + 1, True))
        for table, idxs in self.indexes.items():
            for name, cols in idxs.items():
                for i, c in enumerate(cols):
                    rows.append((table, name, True, c, i + 1, False))
        return spark.createDataFrame(
            rows,
            "table_name string, index_name string, non_unique boolean, "
            "column_name string, ordinal_position int, is_primary boolean",
        )


def tpch_constraints() -> ConstraintRegistry:
    """The TPC-H star-schema constraint declarations for the fixture
    tables (the reference gets these from dbgen's DDL)."""
    r = ConstraintRegistry()
    r.declare_primary_key("region", "r_regionkey")
    r.declare_primary_key("nation", "n_nationkey")
    r.declare_primary_key("customer", "c_custkey")
    r.declare_primary_key("supplier", "s_suppkey")
    r.declare_primary_key("part", "p_partkey")
    r.declare_primary_key("orders", "o_orderkey")
    r.declare_primary_key("lineitem", "l_orderkey", "l_linenumber")
    r.declare_foreign_key("nation", ["n_regionkey"], "region", ["r_regionkey"])
    r.declare_foreign_key("customer", ["c_nationkey"], "nation", ["n_nationkey"])
    r.declare_foreign_key("supplier", ["s_nationkey"], "nation", ["n_nationkey"])
    r.declare_foreign_key("orders", ["o_custkey"], "customer", ["c_custkey"])
    r.declare_foreign_key("lineitem", ["l_orderkey"], "orders", ["o_orderkey"])
    r.declare_foreign_key("lineitem", ["l_partkey"], "part", ["p_partkey"])
    r.declare_foreign_key("lineitem", ["l_suppkey"], "supplier", ["s_suppkey"])
    return r
