"""gizmosql_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
gizmodata/gizmosql (an Arrow Flight SQL server over embedded DuckDB),
re-expressed Spark-first: Spark SQL + Catalyst replace DuckDB as the
engine, a thin Python service layer replaces the Flight SQL server, and
Arrow remains the interchange format.

Layout:
    session.py    — tuned SparkSession builder (AQE, Arrow, UTC)
    catalog.py    — table registry + metadata operators (SURVEY §2A)
    engine.py     — Engine/session facade: execute_sql, prepared
                    statements, timeouts, cancel, ingest (SURVEY §3)
    dialect.py    — SQL dialect shim (SET engine.*, pseudo-functions,
                    read_parquet(), replacement scans) (SURVEY §2B)
    settings.py   — settings registry (SET gizmosql.* analog)
    admission.py  — FIFO admission controller (statement queue)
    security.py   — admin-command gate + readonly-role checks
    types.py      — Arrow ⇄ Spark type mapping (SURVEY §1.2)
    functions/    — scalar function surface (SURVEY §2E) + text ops
    operators/    — query corpus: TPC-H, dedup, similarity, multimodal
    sources/      — file/source registration helpers (SURVEY §2D)
    streaming/    — Structured Streaming extension tier (Phase 5)
"""

from gizmosql_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
