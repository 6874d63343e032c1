"""SQL-surface parity: the TPC-H oracle SQL strings — written for
DuckDB — must run UNCHANGED through the engine's SQL entry and produce
the same results as the DataFrame implementations.

This is the 'a user of the reference could switch engines and run every
query they run today' check: the corpus uses ANSI joins, correlated
subqueries, EXISTS/NOT EXISTS, IN, HAVING, intervals, year(), LIMIT —
all must parse and agree on Spark.
"""

from __future__ import annotations

import pytest

from gizmosql_spark.catalog import register_tables
from gizmosql_spark.operators import tpch

# q02's oracle correlates via the bare table name (region.r_regionkey
# outer reference) which Spark resolves differently; every other oracle
# is engine-neutral SQL.
SQL_PORTABLE = sorted(set(tpch.ORACLE) - {"q02"})


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    register_tables(spark, sf_dir)


@pytest.mark.parametrize("name", SQL_PORTABLE)
def test_oracle_sql_runs_on_spark(spark, sf_dir, name):
    via_sql = spark.sql(tpch.ORACLE[name])
    via_df = tpch.QUERIES[name](spark, sf_dir)
    sql_rows = sorted(map(str, via_sql.collect()))
    df_rows = sorted(map(str, via_df.collect()))
    assert len(sql_rows) == len(df_rows), name
    # allow float formatting wobble by comparing canonicalized tuples
    if sql_rows != df_rows:
        from gizmosql_spark.testing import _canon_cell, _rows_equal

        s = sorted(tuple(_canon_cell(v) for v in r) for r in via_sql.collect())
        d = sorted(tuple(_canon_cell(v) for v in r) for r in via_df.collect())
        for a, b in zip(s, d):
            assert _rows_equal(a, b), f"{name}: {a} != {b}"
