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
    never reads the files it is replacing mid-write.

    The final overwrite must be STATIC: under dynamic
    partitionOverwriteMode, insertInto only replaces partitions present
    in the post-image, so a DELETE that empties a partition of a
    partitioned table would silently leave its rows in place."""
    stage = f"_dml_stage_{uuid.uuid4().hex[:12]}"
    post.write.mode("overwrite").saveAsTable(stage)
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    try:
        spark.conf.set(mode_key, "static")
        spark.table(stage).write.mode("overwrite").insertInto(table, overwrite=True)
    finally:
        spark.conf.set(mode_key, prev)
        spark.sql(f"DROP TABLE IF EXISTS {stage}")


# --- MERGE INTO (upsert) ---------------------------------------------

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(\w+))?"
    r"\s+USING\s+(\(.*?\)|[A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?(\w+))?"
    r"\s+ON\s+(.*?)"
    r"\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)"
    r"(?:\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*"
    r"(?:\(([^)]*)\))?\s*VALUES\s*\((.*?)\))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_merge(sql: str):
    m = _MERGE_RE.match(sql)
    if not m:
        return None
    table, t_alias, using, s_alias, on, set_clause, ins_cols, ins_vals = m.groups()
    assignments = []
    for part in _split_top_level(set_clause):
        col, _, expr = part.partition("=")
        if not expr:
            return None
        assignments.append((col.strip().strip("`"), expr.strip()))
    insert = None
    if ins_vals is not None:
        cols = [c.strip().strip("`") for c in ins_cols.split(",")] if ins_cols else None
        insert = (cols, [v.strip() for v in _split_top_level(ins_vals)])
    return table, t_alias, using, s_alias, on, assignments, insert


def apply_merge(spark: SparkSession, parsed) -> int:
    """Copy-on-write MERGE (upsert): matched target rows take the
    UPDATE SET image, unmatched source rows become INSERTs. Errors if
    a target row matches multiple source rows (standard MERGE
    cardinality rule). Returns rows updated + inserted."""
    table, t_alias, using, s_alias, on, assignments, insert = parsed
    tgt = spark.table(table).alias(t_alias or "tgt")
    src_df = (
        spark.sql(using[1:-1]) if using.startswith("(") else spark.table(using)
    ).alias(s_alias or "src")
    cond = F.expr(on)

    joined = tgt.join(src_df.withColumn("__m", F.lit(1)), cond, "left")
    n_tgt = tgt.count()
    if joined.count() > n_tgt:
        raise ValueError("MERGE: a target row matched multiple source rows")
    n_matched = joined.filter(F.col("__m").isNotNull()).count()

    assigned = dict(assignments)
    tname = t_alias or "tgt"
    post = joined.select(
        *[
            F.when(F.col("__m").isNotNull(), F.expr(assigned[f.name]))
            .otherwise(F.col(f"{tname}.{f.name}"))
            .cast(f.dataType)
            .alias(f.name)
            if f.name in assigned
            else F.col(f"{tname}.{f.name}").alias(f.name)
            for f in spark.table(table).schema.fields
        ]
    )

    n_inserted = 0
    if insert is not None:
        cols, vals = insert
        schema = spark.table(table).schema
        cols = cols or [f.name for f in schema.fields]
        unmatched = src_df.join(tgt, cond, "left_anti")
        exprs = dict(zip(cols, vals))
        ins_df = unmatched.select(
            *[
                F.expr(exprs[f.name]).cast(f.dataType).alias(f.name)
                if f.name in exprs
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
        n_inserted = ins_df.count()
        post = post.unionByName(ins_df)

    _overwrite_via_stage(spark, table, post)
    return n_matched + n_inserted
