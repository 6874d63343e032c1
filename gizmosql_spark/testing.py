"""Differential-oracle test harness.

The reference verifies every TPC-H query by running it through both the
Flight SQL server and an embedded DuckDB connection, comparing results
row-by-row (/root/reference/tests/integration/test_tpch_benchmark.cpp:
977-996). This module is the Spark analog: run a Spark DataFrame and a
DuckDB SQL string over the same parquet fixtures and compare after
canonicalization (FIXTURES.md rules: sort by all columns, float rtol
1e-9, timestamps as UTC-naive, NULLs last).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame

from gizmosql_spark.catalog import FIXTURE_TABLES

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-9


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables as views."""
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _sort_key(row):
    # NULLs last, per SQL_NULLS_SORTED_AT_END (duckdb_sql_info.cpp:226-227)
    return tuple((v is None, str(type(v)), v) for v in row)


def _rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None or y is None:
            if x is not y:
                return False
        elif isinstance(x, float) or isinstance(y, float):
            if not math.isclose(float(x), float(y), rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL):
                return False
        else:
            if x != y:
                return False
    return True


def _strict_cell(v):
    """Driver-grade canonical form: the official correctness gate hashes
    exact value strings (after the query's own declared rounding), so a
    cell must match at repr level — no rel-tol. This is what catches the
    divergences the tolerance comparator is blind to: ``-0.0`` vs
    ``0.0`` (the stats_agg r9 official red row — DuckDB's ``round()``
    preserves the sign of a tiny negative, Spark's does not), any
    last-ulp drift that survives canonicalization, and NaN-vs-NULL
    splits. Deliberately does NOT reuse ``_canon_cell``: that maps NaN
    to None, which would hide a Spark-NaN vs DuckDB-NULL divergence
    (e.g. corr() of a zero-variance group: Spark NaN, DuckDB NULL) —
    a hash-grade difference."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)  # 'nan', '-0.0', full 17-digit form
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_strict_cell(x) for x in v)
    return v


def has_top_level_order_by(sql: str) -> bool:
    """True when the statement's FINAL result carries its own ORDER BY
    (an ``ORDER BY`` at paren depth 0 — one inside a window spec,
    subquery, or CTE body sorts an intermediate, not the result).
    Gate for ``ordered=True`` comparison: only a query that DECLARES a
    result order can be held to one."""
    import re

    s = re.sub(r"'[^']*'", "''", sql)
    depth = 0
    for m in re.finditer(r"[()]|\bORDER\s+BY\b", s, re.IGNORECASE):
        t = m.group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


def compare_to_oracle(df: DataFrame, oracle_sql: str, sf_dir: str,
                      strict: bool = False, ordered: bool = False) -> None:
    """Assert the Spark result matches the DuckDB oracle result.

    Columns are aligned by (sorted) name — the driver's compare does the
    same — so both sides must alias identically. Rows are compared
    order-insensitively unless the caller relies on LIMIT determinism,
    which each corpus query guarantees with explicit tiebreakers.

    ``strict=True`` mirrors the DRIVER's hash gate instead of the
    tolerance comparator: every float is compared as its exact repr
    string. The r9 official record proved the two gates differ —
    ``stats_agg`` passed the 250-query tolerance differential while
    failing the driver hash on a ``-0.0`` vs ``0.0`` cell — so the
    full corpus runs under strict mode before every official round
    (differential_run.py --strict).

    ``ordered=True`` additionally compares rows IN RESULT ORDER (no
    canonical sort on either side) — the check the sorted comparator
    is structurally blind to: a wrong ORDER BY that merely permutes
    rows. Only meaningful for queries that declare a result order
    (see :func:`has_top_level_order_by`); callers gate on it
    (differential_run.py --ordered).
    """
    con = duckdb_conn(sf_dir)
    try:
        oracle = con.execute(oracle_sql)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()
    finally:
        con.close()

    s_cols = df.columns
    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])

    canon = _strict_cell if strict else _canon_cell
    s_rows = [
        tuple(canon(row[i]) for i in s_order) for row in df.collect()
    ]
    o_rows = [
        tuple(canon(row[i]) for i in order) for row in o_rows
    ]
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    if not ordered:
        s_rows.sort(key=_sort_key)
        o_rows.sort(key=_sort_key)
    if strict:
        mismatches = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ]
    else:
        mismatches = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_rows, o_rows))
            if not _rows_equal(a, b)
        ]
    assert not mismatches, (
        f"{len(mismatches)} row mismatches"
        f"{' (strict/hash-grade)' if strict else ''}; "
        f"first: {mismatches[:3]}")
