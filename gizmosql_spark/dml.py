"""UPDATE / DELETE emulation for managed parquet tables.

The reference delegates UPDATE/DELETE to DuckDB (readonly gate implies
their presence, duckdb_statement.cpp:1080-1094); core Spark SQL only
supports them on Delta/Iceberg tables. For managed parquet tables the
engine rewrites them to copy-on-write: build the post-image DataFrame,
stage it to a temp table, overwrite the target from the stage, drop the
stage. This is exactly what a lakehouse format does per-file — here it
is per-table, which is correct (if heavier) at any scale and atomic at
the final overwrite.

Affected-row counts follow DuckDB's convention: DELETE returns rows
removed, UPDATE returns rows matching the predicate.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_][\w.]*|`[^`]+`)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_][\w.]*|`[^`]+`)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_update(sql: str):
    m = _UPDATE_RE.match(sql)
    if not m:
        return None
    table, set_clause, where = m.groups()
    assignments = []
    for part in _split_top_level(set_clause):
        col, _, expr = part.partition("=")
        if not expr:
            return None
        assignments.append((col.strip().strip("`"), expr.strip()))
    return table.strip("`"), assignments, where


def parse_delete(sql: str):
    m = _DELETE_RE.match(sql)
    if not m:
        return None
    table, where = m.groups()
    return table.strip("`"), where


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in parens/quotes."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def apply_update(spark: SparkSession, table: str,
                 assignments: list[tuple[str, str]], where: str | None) -> int:
    """Copy-on-write UPDATE; returns the matched-row count."""
    src = spark.table(table)
    pred = F.expr(where) if where else F.lit(True)
    matched = src.filter(pred).count()
    assigned = dict(assignments)
    post = src.select(
        *[
            F.when(pred, F.expr(assigned[f.name])).otherwise(F.col(f.name))
            .cast(f.dataType)
            .alias(f.name)
            if f.name in assigned
            else F.col(f.name)
            for f in src.schema.fields
        ]
    )
    _overwrite_via_stage(spark, table, post)
    return matched


def apply_delete(spark: SparkSession, table: str, where: str | None) -> int:
    """Copy-on-write DELETE; returns the removed-row count."""
    src = spark.table(table)
    if where is None:
        removed = src.count()
        post = src.filter(F.lit(False))
    else:
        pred = F.expr(where)
        removed = src.filter(pred).count()
        post = src.filter(~F.coalesce(pred, F.lit(False)))
    _overwrite_via_stage(spark, table, post)
    return removed


def _overwrite_via_stage(spark: SparkSession, table: str, post: DataFrame) -> None:
    """Stage the post-image, then overwrite the target from the stage —
    never reads the files it is replacing mid-write."""
    stage = f"_dml_stage_{uuid.uuid4().hex[:12]}"
    post.write.mode("overwrite").saveAsTable(stage)
    try:
        spark.table(stage).write.mode("overwrite").insertInto(table, overwrite=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {stage}")
