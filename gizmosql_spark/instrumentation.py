"""Session instrumentation + access/catalog log sinks.

Re-expresses the reference's Enterprise instrumentation and logging
tier (/root/reference/docs/session_instrumentation.md: instances /
sessions / sql_statements / sql_executions tables + views;
/root/reference/src/common/access_log_middleware.cpp: per-RPC
method/peer/status/duration log lines;
/root/reference/src/enterprise/catalog_logging/catalog_log_sink.cpp:
log records promoted to typed columns, batched by a writer, rest in a
JSON catch-all):

- ``InstrumentationStore`` — the four-table model with the same join
  keys (instance_id ← session_id ← statement_id ← execution_id), kept
  in bounded in-process rings and published as ``global_temp`` views
  (``engine_instr_*`` + the ``engine_active_sessions`` /
  ``engine_session_activity`` convenience joins). The reference stores
  these in a separate DuckDB/Postgres catalog; the seam here is
  ``publish()`` — a deployment points it at a real catalog writer.
- ``AccessLog`` — bounded ring + optional JSONL file sink of per-call
  records (method, peer, identity, status, duration), with SQL
  redaction applied before anything is stored, queryable via the
  ``engine_access_log()`` table function.

Scale note: instrumentation is driver-side control-plane state —
bounded rings, no per-row data-plane cost; the published views are
tiny local DataFrames.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from collections import deque
from typing import Any

from pyspark.sql import SparkSession

from gizmosql_spark.querylog import redact_sql_for_logs

_RING = 2000


class AccessLog:
    """Per-call access log (access_log_middleware.cpp analog):
    bounded ring + optional JSONL sink, redacted before storage."""

    SCHEMA = ("at double, method string, peer string, identity string,"
              " status string, duration_ms double, detail string")

    def __init__(self, path: str | None = None, capacity: int = _RING):
        self.path = path
        self._entries: deque[tuple] = deque(maxlen=capacity)
        self._lock = threading.Lock()

    def record(self, method: str, peer: str = "", identity: str = "",
               status: str = "OK", duration_ms: float = 0.0,
               detail: str = "") -> None:
        detail = redact_sql_for_logs(detail or "")
        row = (time.time(), method, peer or "unknown", identity, status,
               float(duration_ms), detail)
        with self._lock:
            self._entries.append(row)
            if self.path:
                try:
                    with open(self.path, "a", encoding="utf-8") as f:
                        json.dump(
                            dict(zip(("at", "method", "peer", "identity",
                                      "status", "duration_ms", "detail"),
                                     row)), f)
                        f.write("\n")
                except OSError:
                    pass

    def entries(self) -> list[tuple]:
        with self._lock:
            return list(self._entries)


class InstrumentationStore:
    """instances / sessions / sql_statements / sql_executions with the
    reference's join keys, in bounded rings."""

    INSTANCES_SCHEMA = (
        "instance_id string, version string, edition string,"
        " start_time double, stop_time double, status string")
    SESSIONS_SCHEMA = (
        "session_id string, instance_id string, username string,"
        " role string, auth_method string, start_time double,"
        " stop_time double, status string")
    STATEMENTS_SCHEMA = (
        "statement_id string, session_id string, sql_text string,"
        " method string, prepare_success boolean, prepare_error string,"
        " created_time double")
    EXECUTIONS_SCHEMA = (
        "execution_id string, statement_id string, status string,"
        " queue_wait_ms double, duration_ms double, rows_fetched bigint,"
        " error_message string, start_time double, end_time double")

    def __init__(self, capacity: int = _RING):
        self._lock = threading.Lock()
        self.instances: deque[tuple] = deque(maxlen=64)
        self.sessions: dict[str, list] = {}
        self.statements: deque[tuple] = deque(maxlen=capacity)
        self.executions: deque[tuple] = deque(maxlen=capacity)
        self._session_order: deque[str] = deque(maxlen=capacity)

    # --- lifecycle recording -----------------------------------------

    def instance_started(self, instance_id: str, version: str,
                         edition: str) -> None:
        with self._lock:
            self.instances.append(
                [instance_id, version, edition, time.time(), None, "running"])

    def instance_stopped(self, instance_id: str, reason: str = "") -> None:
        with self._lock:
            for row in self.instances:
                if row[0] == instance_id and row[5] == "running":
                    row[4] = time.time()
                    row[5] = "stopped"

    def session_started(self, session_id: str, instance_id: str,
                        username: str, role: str,
                        auth_method: str = "basic") -> None:
        with self._lock:
            self.sessions[session_id] = [
                session_id, instance_id, username, role, auth_method,
                time.time(), None, "active"]
            self._session_order.append(session_id)
            while len(self.sessions) > self._session_order.maxlen:
                oldest = self._session_order.popleft()
                self.sessions.pop(oldest, None)

    def session_ended(self, session_id: str, status: str = "closed") -> None:
        with self._lock:
            row = self.sessions.get(session_id)
            if row is not None and row[7] == "active":
                row[6] = time.time()
                row[7] = status

    def statement(self, session_id: str, sql: str, method: str,
                  success: bool, error: str | None = None) -> str:
        sid = uuid.uuid4().hex
        with self._lock:
            self.statements.append(
                (sid, session_id, redact_sql_for_logs(sql), method,
                 success, error, time.time()))
        return sid

    def execution(self, statement_id: str, status: str,
                  queue_wait_ms: float = 0.0, duration_ms: float = 0.0,
                  rows_fetched: int | None = None,
                  error: str | None = None) -> str:
        eid = uuid.uuid4().hex
        now = time.time()
        with self._lock:
            self.executions.append(
                (eid, statement_id, status, float(queue_wait_ms),
                 float(duration_ms), rows_fetched, error,
                 now - duration_ms / 1000.0, now))
        return eid

    # --- publication --------------------------------------------------

    def publish(self, spark: SparkSession) -> None:
        """Materialize the four tables + convenience views into
        ``global_temp`` (visible to every session, like the
        reference's read-only instrumentation views)."""
        with self._lock:
            instances = [tuple(r) for r in self.instances]
            sessions = [tuple(r) for r in self.sessions.values()]
            statements = list(self.statements)
            executions = list(self.executions)
        spark.createDataFrame(
            instances or [(None,) * 6], self.INSTANCES_SCHEMA
        ).filter("instance_id IS NOT NULL").createOrReplaceGlobalTempView(
            "engine_instr_instances")
        spark.createDataFrame(
            sessions or [(None,) * 8], self.SESSIONS_SCHEMA
        ).filter("session_id IS NOT NULL").createOrReplaceGlobalTempView(
            "engine_instr_sessions")
        spark.createDataFrame(
            statements or [(None,) * 7], self.STATEMENTS_SCHEMA
        ).filter("statement_id IS NOT NULL").createOrReplaceGlobalTempView(
            "engine_instr_statements")
        spark.createDataFrame(
            executions or [(None,) * 9], self.EXECUTIONS_SCHEMA
        ).filter("execution_id IS NOT NULL").createOrReplaceGlobalTempView(
            "engine_instr_executions")
        spark.sql("""
            CREATE OR REPLACE GLOBAL TEMP VIEW engine_active_sessions AS
            SELECT s.*, i.version, i.edition
            FROM global_temp.engine_instr_sessions s
            JOIN global_temp.engine_instr_instances i USING (instance_id)
            WHERE s.status = 'active'
        """)
        spark.sql("""
            CREATE OR REPLACE GLOBAL TEMP VIEW engine_session_activity AS
            SELECT s.session_id, s.username, s.role, s.auth_method,
                   st.statement_id, st.sql_text, st.method,
                   e.execution_id, e.status AS execution_status,
                   e.queue_wait_ms, e.duration_ms, e.rows_fetched,
                   e.error_message, e.start_time, e.end_time
            FROM global_temp.engine_instr_sessions s
            JOIN global_temp.engine_instr_statements st USING (session_id)
            LEFT JOIN global_temp.engine_instr_executions e
                 USING (statement_id)
        """)
