"""Schema parity: every query's Spark dtypes must correspond to its
DuckDB oracle's column types (the driver's compare also checks schema,
so a HUGEINT/INT drift that value-compare tolerates would still fail
the gate)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from gizmosql_spark.testing import duckdb_conn

#: duckdb type name -> acceptable spark simpleString dtypes
_COMPAT = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BIGINT[]": {"array<bigint>"},
    "DOUBLE[]": {"array<double>"},
    "VARCHAR[]": {"array<string>"},
}


def _oracle_schema(sql: str, sf_dir: str) -> dict[str, str]:
    con = duckdb_conn(sf_dir)
    try:
        rel = con.query(sql)
        return dict(zip(rel.columns, [str(t) for t in rel.types]))
    finally:
        con.close()


_QUERIES = entry.queries()
_ORACLES = entry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_schema_types_align(spark, sf_dir, name):
    sdf = _QUERIES[name](spark, sf_dir)
    spark_types = dict(sdf.dtypes)
    oracle_types = _oracle_schema(_ORACLES[name], sf_dir)
    assert sorted(spark_types) == sorted(oracle_types), (
        f"{name}: column names differ: {sorted(spark_types)} vs {sorted(oracle_types)}"
    )
    for col, dk_type in oracle_types.items():
        sp = spark_types[col]
        if dk_type.startswith("DECIMAL"):
            assert sp.startswith("decimal"), f"{name}.{col}: {dk_type} vs {sp}"
            continue
        allowed = _COMPAT.get(dk_type)
        assert allowed is not None, (
            f"{name}.{col}: unmapped duckdb type {dk_type} (spark: {sp}) — "
            "HUGEINT usually means an uncast integer aggregate"
        )
        assert sp in allowed, f"{name}.{col}: {dk_type} vs {sp}"
