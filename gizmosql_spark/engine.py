"""Engine/session facade — the service layer over SparkSession.

Re-expresses the reference's Flight SQL server surface (SURVEY §2A,
§3.1-3.3) Spark-first:

- sessions = ``SparkSession.newSession()`` clones (temp-view + conf
  isolation ≈ per-connection DuckDB state, session_context.h:64-113)
- statement lifecycle = job tags + watchdog timeout + cancel
  (duckdb_statement.cpp:2042-2192 → ``cancelJobGroup``)
- prepared statements = Spark parameterized SQL
  (duckdb_server.cpp:1354-1513 → ``spark.sql(q, args=...)``)
- bulk ingest modes create/append/replace (duckdb_server.cpp:1804-1985
  → ``df.write.mode(...).saveAsTable``; append aligns columns by name,
  the reference's ``INSERT INTO ... BY NAME``)
- settings registry, admission FIFO, admin/readonly gates, graceful
  drain, kill-session, health check (SURVEY §2A rows)

Schema-before-execution comes free from the analyzed plan
(``spark.sql(q).schema`` triggers no job), matching the reference's
prepare-only pass (duckdb_statement.cpp:2456-2467).
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from gizmosql_spark import security
from gizmosql_spark.admission import AdmissionController
from gizmosql_spark.dialect import (
    IndexCommand,
    KillCommand,
    SetCommand,
    TxnCommand,
    classify_command,
    ddl_write_target,
    dml_target,
    extract_file_scans,
    extract_flight_scans,
    parse_attach_flight,
    parse_detach,
    replace_pseudo_functions,
    rewrite_settings_function,
    split_statements,
)
from gizmosql_spark.querylog import QueryLog
from gizmosql_spark.session import get_spark
from gizmosql_spark.settings import (
    SETTINGS_SCHEMA,
    SettingsState,
    settings_rows,
)
from gizmosql_spark.system_catalog import (
    SystemCatalog,
    check_system_catalog_write,
)

__version__ = "0.1.0"


class SessionClosed(RuntimeError):
    pass


class ServerDraining(RuntimeError):
    """Retriable UNAVAILABLE analog (duckdb_server.cpp:806-818)."""


class StatementTimeout(RuntimeError):
    pass


class StatementCancelled(RuntimeError):
    pass


@dataclass
class PreparedStatement:
    handle: str
    sql: str
    schema: Any  # StructType | None (None until bindable for param'd SQL)
    parameter_names: list[str]
    #: True when the statement uses JDBC/ADBC-style positional `?`
    #: markers (the form stock Flight SQL clients send) rather than
    #: named :params; binding is then by column position.
    positional: bool = False


@dataclass
class StatementResult:
    kind: str  # "query" | "update" | "set" | "kill"
    df: DataFrame | None = None
    affected_rows: int | None = None
    info: dict[str, str] = field(default_factory=dict)
    #: instrumentation key (sql_statements.statement_id)
    statement_id: str | None = None
    #: trace context (telemetry.py; collect spans parent onto these)
    trace_id: str | None = None
    root_span_id: str | None = None


@dataclass
class Transaction:
    """Session-scoped transaction over managed tables.

    The reference runs BEGIN/COMMIT/ROLLBACK on the per-session DuckDB
    connection (duckdb_server.cpp:1987-2014). Core Spark has no
    multi-statement ACID, so the engine provides rollback by
    snapshotting each managed table the first time the transaction
    writes it (created tables are simply dropped on rollback). On a
    lakehouse deployment the same API maps to Delta/Iceberg snapshots
    instead of table copies (SURVEY §7 hard part 3)."""

    txn_id: str
    #: table -> backup table name, or None when the table did not exist
    backups: dict[str, str | None] = field(default_factory=dict)


@dataclass
class SessionState:
    session_id: str
    role: str
    spark: SparkSession
    settings: SettingsState = field(default_factory=SettingsState)
    prepared: dict[str, PreparedStatement] = field(default_factory=dict)
    txn: Transaction | None = None
    closed: bool = False
    killed: bool = False
    statement_seq: int = 0
    username: str = "anonymous"
    #: catalog ACL patterns from token claims; None = unrestricted
    read_catalogs: list[str] | None = None
    write_catalogs: list[str] | None = None
    #: remote engines attached over Flight: alias -> (uri, user, pw)
    #: (adbc_scanner ATTACH analog)
    attached: dict[str, tuple[str, str | None, str | None]] = field(
        default_factory=dict)

    @property
    def is_admin(self) -> bool:
        return self.role == "admin"


# `::` excluded so DuckDB-style casts (x::int) never read as a param
_PARAM_RE = __import__("re").compile(r"(?<!:):([A-Za-z_][A-Za-z0-9_]*)")


def _mask_sql_literals(sql: str) -> str:
    """Blank out string literals, quoted identifiers, and comments
    (space-preserving, so match offsets survive). Both parameter
    scanners run over the masked text — a positional query containing
    ':word' inside a literal (``WHERE s = 'a:b' AND id = ?``) must not
    be misclassified as named-parameter."""
    out = list(sql)
    i, ln = 0, len(sql)
    while i < ln:
        c = sql[i]
        if c == "'":  # string literal, '' escapes
            i += 1
            while i < ln:
                if sql[i] == "'":
                    if i + 1 < ln and sql[i + 1] == "'":
                        out[i] = out[i + 1] = " "
                        i += 2
                        continue
                    break
                out[i] = " "
                i += 1
        elif c in ('"', "`"):  # quoted identifier
            q = c
            i += 1
            while i < ln and sql[i] != q:
                out[i] = " "
                i += 1
        elif c == "-" and sql[i:i + 2] == "--":
            while i < ln and sql[i] != "\n":
                out[i] = " "
                i += 1
            continue
        elif c == "/" and sql[i:i + 2] == "/*":
            j = sql.find("*/", i + 2)
            end = ln if j < 0 else j + 2
            for k in range(i, end):
                out[k] = " "
            i = end
            continue
        i += 1
    return "".join(out)


def _named_params(sql: str) -> list[str]:
    """Named `:param` markers outside literals/comments, sorted."""
    return sorted(set(_PARAM_RE.findall(_mask_sql_literals(sql))))


def _count_positional_params(sql: str) -> int:
    """Count JDBC/ADBC-style `?` markers outside string literals,
    quoted identifiers, and comments (the form stock Flight SQL
    clients prepare with; the reference inherits it from DuckDB's
    prepared statements)."""
    return _mask_sql_literals(sql).count("?")


class Engine:
    """One Engine per server process; sessions hang off it."""

    def __init__(self, spark: SparkSession | None = None,
                 instance_id: str | None = None, edition: str = "community",
                 access_log_path: str | None = None,
                 otlp_trace_path: str | None = None):
        self.spark = spark or get_spark("gizmosql-spark-engine")
        self.instance_id = instance_id or str(uuid.uuid4())
        self.edition = edition
        self.global_settings = SettingsState()
        self.sessions: dict[str, SessionState] = {}
        self._lock = threading.Lock()
        self._admission = AdmissionController()
        self.draining = False
        self.system_catalog = SystemCatalog()
        self.query_log = QueryLog()
        # instrumentation tables + access log sink
        # (session_instrumentation.md / access_log_middleware.cpp)
        from gizmosql_spark.instrumentation import (
            AccessLog,
            InstrumentationStore,
        )

        self.access_log = AccessLog(path=access_log_path)
        self.instr = InstrumentationStore()
        self.instr.instance_started(self.instance_id, __version__, edition)
        # OTel-shaped tracing/metrics (gizmosql_telemetry.cpp analog;
        # OTLP/JSON to a file sink — HTTP POST is a deploy-time swap)
        from gizmosql_spark.telemetry import Telemetry

        self.telemetry = Telemetry(
            path=otlp_trace_path,
            resource_attributes={"service.instance.id": self.instance_id,
                                 "service.version": __version__})
        # auth (gizmosql_security.cpp analog): basic credentials mint
        # signed tokens; sessions created from a token inherit its
        # role + catalog ACL claims
        from gizmosql_spark.auth import UserRegistry

        self.token_secret = uuid.uuid4().hex
        self.users = UserRegistry()
        #: optional JWKS key-set verification (auth.JwksManager);
        #: when set, bearer tokens carrying a kid verify against it
        self.jwks = None
        # persistent table catalog: manifest over the warehouse dir,
        # re-attaching tables from earlier processes (warehouse.py —
        # the DuckLake/ATTACH analog, docs/ducklake.md)
        from gizmosql_spark.warehouse import WarehouseCatalog

        self.warehouse = WarehouseCatalog(self.spark)
        #: optional catalog-logging sink (docs/catalog_logging.md):
        #: enabled explicitly via enable_catalog_logging()
        self.catalog_log = None
        # secrets manager (DuckDB secrets analog; admin_command_gating
        # .md:54-55): persistent entries reload from the warehouse
        from gizmosql_spark.secrets import SecretsManager
        from gizmosql_spark.warehouse import warehouse_dir

        self.secrets = SecretsManager(
            store_dir=os.path.join(warehouse_dir(self.spark), "_secrets"))
        #: DuckDB-style macros: lower-name → (params, defaults, body,
        #: is_table); expanded textually at bind time (dialect.py)
        self.macros: dict[str, tuple] = {}
        self.reattach()
        #: captured execution profiles (engine.capture_query_profile;
        #: the reference harvests DuckDB's JSON profile per execution,
        #: duckdb_statement.cpp:1884-1909, :2210-2221)
        self.query_profiles: list[dict[str, Any]] = []

    # --- session lifecycle (GetClientSession / CloseSession,
    # duckdb_server.cpp:957-1079, :2111-2130) -------------------------

    def add_user(self, username: str, password: str, role: str = "user",
                 read_catalogs: list[str] | None = None,
                 write_catalogs: list[str] | None = None) -> None:
        self.users.add_user(username, password, role, read_catalogs, write_catalogs)

    def authenticate(self, username: str, password: str) -> str:
        """Basic credentials → signed bearer token
        (gizmosql_security.cpp:263-295 mint-on-first-auth flow)."""
        return self.users.authenticate(self.token_secret, username, password)

    def use_jwks(self, jwks_path: str, refresh_interval_s: float = 300.0):
        """Enable JWKS key-set verification for bearer tokens
        (jwks_manager.cpp analog; local key file, rotation via
        re-write)."""
        from gizmosql_spark.auth import JwksManager

        self.jwks = JwksManager(jwks_path, refresh_interval_s)
        return self.jwks

    def verify_bearer(self, token: str) -> dict:
        """Verified claims for a bearer token: tokens carrying a kid
        header verify against the JWKS key set when one is configured;
        plain tokens verify against the engine secret."""
        from gizmosql_spark.auth import token_kid, verify_token

        if self.jwks is not None and token_kid(token) is not None:
            return self.jwks.verify(token)
        return verify_token(self.token_secret, token)

    def create_session(self, role: str = "user", token: str | None = None) -> str:
        """New session; a bearer token overrides ``role`` with its
        verified claims (role + catalog ACLs) — client-asserted roles
        are never trusted when a token is presented."""
        if self.draining:
            raise ServerDraining("server is draining; retry elsewhere")
        sid = str(uuid.uuid4())
        st = SessionState(sid, role, self.spark.newSession())
        if token is not None:
            claims = self.verify_bearer(token)
            st.role = claims["role"]
            st.username = claims.get("sub", "anonymous")
            st.read_catalogs = claims.get("read_catalogs")
            st.write_catalogs = claims.get("write_catalogs")
        with self._lock:
            self.sessions[sid] = st
        self.instr.session_started(
            sid, self.instance_id, st.username, st.role,
            auth_method="token" if token is not None else "asserted")
        return sid

    def _session(self, session_id: str) -> SessionState:
        st = self.sessions.get(session_id)
        if st is None or st.closed:
            raise SessionClosed(f"no such session: {session_id}")
        return st

    def close_session(self, session_id: str) -> None:
        st = self.sessions.get(session_id)
        if st is None:
            return
        st.closed = True
        st.prepared.clear()
        self._cancel_session_jobs(st)
        with self._lock:
            self.sessions.pop(session_id, None)
        self.instr.session_ended(
            session_id, "killed" if st.killed else "closed")

    def kill_session(self, session_id: str, by: str) -> bool:
        """KILL SESSION admin op (kill_session_handler.cpp; killed-set
        semantics duckdb_server.cpp:899,1240-1262). Idempotent."""
        killer = self._session(by)
        if not killer.is_admin:
            raise security.CommandDenied("KILL SESSION requires admin role")
        st = self.sessions.get(session_id)
        if st is None:
            return False
        st.killed = True
        self.close_session(session_id)
        return True

    def _cancel_session_jobs(self, st: SessionState) -> None:
        try:
            self.spark.sparkContext.cancelJobGroup(st.session_id)
        except Exception:
            pass

    # --- graceful shutdown (duckdb_server.cpp:806-818, :1193-1210) ---

    def begin_drain(self) -> None:
        self.draining = True

    def force_shutdown(self) -> None:
        self.draining = True
        try:
            self.spark.sparkContext.cancelAllJobs()
        except Exception:
            pass

    # --- settings -----------------------------------------------------

    def _apply_set(self, st: SessionState, cmd: SetCommand) -> StatementResult:
        target = self.global_settings if cmd.scope == "global" else st.settings
        value = target.set(cmd.name, cmd.value, cmd.scope, st.is_admin)
        if cmd.name == "engine.max_concurrent_statements":
            self._admission.max_concurrent = int(value)
        elif cmd.name == "engine.max_queued_statements":
            self._admission.max_queued = int(value)
        elif cmd.name == "engine.max_queue_wait":
            self._admission.max_wait_seconds = float(value)
        elif cmd.name == "engine.graceful_shutdown" and value:
            self.begin_drain()
        return StatementResult("set", info={cmd.name: str(value)})

    def _register_settings_view(self, st: SessionState) -> None:
        rows = settings_rows(st.settings, self.global_settings)
        st.spark.createDataFrame(rows, SETTINGS_SCHEMA).createOrReplaceTempView(
            "engine_settings"
        )

    # --- statement execution (§3.1 spine) -----------------------------

    def _pseudo_values(self, st: SessionState) -> dict[str, str]:
        return {
            "current_session": st.session_id,
            "current_instance": self.instance_id,
            "current_cluster": "local",
            "version": __version__,
            "user": st.username,
            "role": st.role,
            "edition": self.edition,
            # instrumentation is an Enterprise feature in the reference;
            # query_profiles is this engine's equivalent store
            "instrumentation_enabled": str(
                bool(
                    st.settings.get(
                        "engine.capture_query_profile", self.global_settings
                    )
                )
            ).lower(),
            "instrumentation_catalog": "spark_catalog",
            "instrumentation_schema": "default",
        }

    def execute_sql(self, session_id: str, sql: str) -> StatementResult:
        """Validate, rewrite, gate, and analyze a statement; queries
        return a lazy DataFrame (schema available without execution),
        DML/DDL runs eagerly."""
        if self.draining:
            raise ServerDraining("server is draining")
        st = self._session(session_id)

        cmd = classify_command(sql)
        if isinstance(cmd, SetCommand):
            return self._apply_set(st, cmd)
        if isinstance(cmd, KillCommand):
            ok = self.kill_session(cmd.session_id, by=session_id)
            return StatementResult("kill", info={"killed": str(ok).lower()})
        if isinstance(cmd, TxnCommand):
            if cmd.action == "begin":
                self.begin_transaction(session_id)
            else:
                self.end_transaction(session_id, commit=cmd.action == "commit")
            return StatementResult("txn", info={"action": cmd.action})
        if isinstance(cmd, IndexCommand):
            # CREATE/DROP INDEX (tests/test_v1_22_features.py:52-54 in
            # the reference): Spark has no secondary indexes — recorded
            # as engine metadata, surfaced via engine_index_info
            # (SURVEY §2C DDL row).
            security.check_readonly(sql, st.role)
            reg = self.system_catalog.registry
            if cmd.action == "create":
                reg.declare_index(cmd.table, cmd.name, *cmd.columns)
            else:
                for table, idx in list(reg.indexes.items()):
                    idx.pop(cmd.name, None)
            return StatementResult(
                "update", affected_rows=0, info={"index": cmd.name}
            )

        t_start = time.perf_counter()
        try:
            security.check_admin_gate(sql, st.is_admin)
            security.check_readonly(sql, st.role)
            if st.read_catalogs is not None or st.write_catalogs is not None:
                try:
                    current_cat = st.spark.catalog.currentCatalog()
                except Exception:
                    current_cat = security.DEFAULT_CATALOG
                # write DDL (CREATE/DROP/ALTER/TRUNCATE TABLE, views)
                # is ACL-checked like DML — the reference tracks these
                # in modified_databases
                security.check_catalog_access(
                    sql, st.read_catalogs, st.write_catalogs,
                    dml_target(sql) or ddl_write_target(sql),
                    current_catalog=current_cat,
                )
            check_system_catalog_write(sql)
        except Exception as exc:
            elapsed = (time.perf_counter() - t_start) * 1000
            self.query_log.record(session_id, sql, "denied", elapsed)
            self.instr.statement(
                session_id, sql, "execute_sql", False, str(exc))
            self.access_log.record(
                "execute_sql", identity=st.username, status="DENIED",
                duration_ms=elapsed, detail=sql)
            raise
        # ATTACH/DETACH of remote Flight engines (adbc_scanner analog;
        # reaches here only for admins — the admin gate above blocks
        # ATTACH/DETACH for everyone else)
        att = parse_attach_flight(sql)
        if att is not None:
            alias, uri, user, pw = att
            st.attached[alias] = (uri, user, pw)
            self.query_log.record(
                session_id, sql, "ok", (time.perf_counter() - t_start) * 1000)
            return StatementResult("set", info={"attached": alias})
        det = parse_detach(sql)
        if det is not None and det in st.attached:
            st.attached.pop(det)
            return StatementResult("set", info={"detached": det})

        self.system_catalog.observe_statement(sql)
        write_target = dml_target(sql) or ddl_write_target(sql)
        if write_target is not None:
            self.warehouse.prepare_write(st.spark, write_target)
        stmt_id = self.instr.statement(session_id, sql, "execute_sql", True)
        try:
            with self.telemetry.span(
                "statement.execute", session=session_id,
                user=st.username) as sp:
                result = self._run_statement(st, sql)
                sp.set_attribute("statement.kind", result.kind)
        except Exception as exc:
            elapsed = (time.perf_counter() - t_start) * 1000
            self.query_log.record(session_id, sql, "error", elapsed)
            self.instr.execution(
                stmt_id, "error", duration_ms=elapsed, error=str(exc))
            self.access_log.record(
                "execute_sql", identity=st.username, status="ERROR",
                duration_ms=elapsed, detail=sql)
            self.telemetry.add_counter(
                "engine.statements_total", status="error")
            raise
        if write_target is not None:
            # keep the persistent manifest in step with catalog writes
            # (record() no-ops for temp views; resolves to forget()
            # when the table no longer exists, e.g. after DROP)
            self.warehouse.record(st.spark, write_target)
            ren = self._RENAME_TO_RE.match(sql)
            if ren is not None:
                # RENAME TO: the write target is the OLD name (now
                # forgotten above); record the NEW name so the files
                # survive a restart under it
                self.warehouse.record(st.spark, ren.group(1).strip("`"))
        elapsed = (time.perf_counter() - t_start) * 1000
        self.query_log.record(session_id, sql, "ok", elapsed)
        result.statement_id = stmt_id
        result.trace_id = sp.trace_id
        result.root_span_id = sp.span_id
        if result.kind != "query":
            # eager statements executed inside _run_statement; lazy
            # queries record their execution when collected
            self.instr.execution(
                stmt_id, "success", duration_ms=elapsed,
                rows_fetched=result.affected_rows)
        self.access_log.record(
            "execute_sql", identity=st.username, status="OK",
            duration_ms=elapsed, detail=sql)
        self.telemetry.add_counter("engine.statements_total", status="ok")
        return result

    def enable_catalog_logging(self, path: str | None = None,
                               queue_max: int = 1000):
        """Fork the statement-log stream to an append-only ``logs``
        parquet table (docs/catalog_logging.md): bounded hand-off
        queue + dedicated writer thread, newest-dropped-on-overflow,
        batch-atomic appends. Readable only by admins through the
        ``engine_logs()`` table function; the table is system-managed
        (not a catalog table — client DML cannot target it, and there
        is nothing to DETACH)."""
        from gizmosql_spark.catalog_logging import CatalogLogSink
        from gizmosql_spark.warehouse import warehouse_dir

        if self.catalog_log is not None:
            return self.catalog_log
        path = path or os.path.join(
            warehouse_dir(self.spark), "_engine_logs", "logs")
        sink = CatalogLogSink(self.spark, path, queue_max=queue_max)
        self.catalog_log = sink
        self.query_log.attach_sink(
            lambda e: sink.submit(e.at, "INFO", e.session_id, e.sql,
                                  e.status, e.elapsed_ms))
        return sink

    def disable_catalog_logging(self) -> None:
        if self.catalog_log is not None:
            self.query_log.attach_sink(None)
            self.catalog_log.close()
            self.catalog_log = None

    _QUERY_LOG_FN_RE = __import__("re").compile(
        r"\bengine_query_log\s*\(\s*\)", __import__("re").IGNORECASE
    )
    _CATALOG_LOG_FN_RE = __import__("re").compile(
        r"\bengine_logs\s*\(\s*\)", __import__("re").IGNORECASE
    )
    _SECRETS_FN_RE = __import__("re").compile(
        r"\bengine_secrets\s*\(\s*\)", __import__("re").IGNORECASE
    )
    _TABLE_CHANGES_RE = __import__("re").compile(
        r"\btable_changes\s*\(\s*'([A-Za-z_][\w.]*)'\s*,\s*(\d+)"
        r"(?:\s*,\s*(\d+))?\s*\)",
        __import__("re").IGNORECASE,
    )
    _ACCESS_LOG_FN_RE = __import__("re").compile(
        r"\bengine_access_log\s*\(\s*\)", __import__("re").IGNORECASE
    )
    _MACROS_FN_RE = __import__("re").compile(
        r"\bengine_macros\s*\(\s*\)", __import__("re").IGNORECASE
    )
    _EXPORT_DB_RE = __import__("re").compile(
        r"^\s*(EXPORT|IMPORT)\s+DATABASE\s+'([^']+)'\s*;?\s*$",
        __import__("re").IGNORECASE,
    )
    _RENAME_TO_RE = __import__("re").compile(
        r"^\s*ALTER\s+TABLE\s+(?:[A-Za-z_][\w.]*|`[^`]+`)\s+RENAME"
        r"\s+TO\s+([A-Za-z_][\w.]*|`[^`]+`)\s*;?\s*$",
        __import__("re").IGNORECASE,
    )
    _ADMISSION_FN_RE = __import__("re").compile(
        r"\bengine_admission_stats\s*\(\s*\)", __import__("re").IGNORECASE
    )
    _INSTR_VIEW_RE = __import__("re").compile(
        r"\bengine_(?:instr_\w+|active_sessions|session_activity)\b",
        __import__("re").IGNORECASE,
    )

    def _run_statement(self, st: SessionState, sql: str) -> StatementResult:
        from gizmosql_spark.dialect import (
            parse_pragma,
            parse_summarize,
            rewrite_asof_join,
            rewrite_distinct_on,
            rewrite_exclude,
            rewrite_qualify,
        )

        from gizmosql_spark.secrets import parse_secret_ddl

        sec_ddl = parse_secret_ddl(sql)
        if sec_ddl is not None:
            # CREATE/DROP SECRET (admin-only — check_admin_gate already
            # rejected non-admins before this point)
            if sec_ddl[0] == "create":
                _, secret, replace = sec_ddl
                self.secrets.create(secret, replace=replace)
                return StatementResult(
                    "update", affected_rows=0,
                    info={"secret": secret.name, "action": "create"})
            _, sname, if_exists = sec_ddl
            dropped = self.secrets.drop(sname, if_exists=if_exists)
            return StatementResult(
                "update", affected_rows=0,
                info={"secret": sname,
                      "action": "drop" if dropped else "noop"})

        if "MACRO" in sql.upper():
            from gizmosql_spark.dialect import (
                parse_create_macro,
                parse_drop_macro,
            )

            cm = parse_create_macro(sql)
            if cm is not None:
                name, params, defaults, body, is_table, replace = cm
                key = name.lower()
                if key in self.macros and not replace:
                    raise ValueError(f"macro {name} already exists")
                self.macros[key] = (params, defaults, body, is_table)
                return StatementResult(
                    "update", affected_rows=0,
                    info={"macro": name, "action": "create"})
            dm = parse_drop_macro(sql)
            if dm is not None:
                name, if_exists = dm
                if name.lower() not in self.macros and not if_exists:
                    raise ValueError(f"macro {name} does not exist")
                self.macros.pop(name.lower(), None)
                return StatementResult(
                    "update", affected_rows=0,
                    info={"macro": name, "action": "drop"})
        if self.macros:
            from gizmosql_spark.dialect import expand_macros

            sql = expand_macros(sql, self.macros)

        up0 = sql.upper().lstrip()
        if up0.startswith("PIVOT"):
            from gizmosql_spark.dialect import rewrite_pivot_statement

            sql = rewrite_pivot_statement(sql, st.spark)
        elif up0.startswith("UNPIVOT"):
            from gizmosql_spark.dialect import rewrite_unpivot_statement

            sql = rewrite_unpivot_statement(sql)

        summarize_target = parse_summarize(sql)
        if summarize_target is not None:
            return StatementResult(
                "query", df=self._summarize(st, summarize_target))
        ea = __import__("re").match(
            r"^\s*EXPLAIN\s+ANALYZE\s+(.+)$", sql,
            __import__("re").IGNORECASE | __import__("re").DOTALL)
        if ea is not None:
            return self._explain_analyze(st, ea.group(1))
        pragma = parse_pragma(sql)
        if pragma is not None:
            return self._run_pragma(st, *pragma)

        sql = replace_pseudo_functions(sql, self._pseudo_values(st))
        if "ASOF" in sql.upper():
            sql = rewrite_asof_join(sql)
        sql = rewrite_qualify(sql)
        sql = rewrite_distinct_on(sql)
        sql = rewrite_exclude(sql)
        if "COLUMNS" in sql.upper():
            from gizmosql_spark.dialect import rewrite_columns

            # schema-resolved rewrite (COLUMNS('re') star-expression);
            # ADD COLUMNS etc. never match the call-form regex
            sql = rewrite_columns(sql, st.spark)
        if "REPLACE" in sql.upper():
            from gizmosql_spark.dialect import rewrite_star_replace

            sql = rewrite_star_replace(sql, st.spark)
        if "ALL" in sql.upper():
            from gizmosql_spark.dialect import rewrite_order_by_all

            sql = rewrite_order_by_all(sql, st.spark)
        sql, used_settings = rewrite_settings_function(sql)
        if used_settings:
            self._register_settings_view(st)
        if self._QUERY_LOG_FN_RE.search(sql):
            # engine_query_log() table function: the redacted statement
            # ring as a queryable view (reference: query-log telemetry,
            # gizmosql_logging.cpp)
            sql = self._QUERY_LOG_FN_RE.sub("engine_query_log", sql)
            rows = [
                (e.session_id, e.sql, e.status, float(e.elapsed_ms), float(e.at))
                for e in self.query_log.entries()
            ]
            st.spark.createDataFrame(
                rows,
                "session_id string, sql string, status string,"
                " elapsed_ms double, at double",
            ).createOrReplaceTempView("engine_query_log")
        if self._MACROS_FN_RE.search(sql):
            # engine_macros() table function: registered macro
            # templates (duckdb_functions() lists macros the same way)
            sql = self._MACROS_FN_RE.sub("engine_macros", sql)
            rows = [
                (name, list(params), str(dict(defaults)), body,
                 "table" if is_table else "scalar")
                for name, (params, defaults, body, is_table)
                in sorted(self.macros.items())
            ] or [("", [], "", "", "")]
            st.spark.createDataFrame(
                rows,
                "macro_name string, parameters array<string>,"
                " defaults string, body string, macro_type string",
            ).filter("macro_name <> ''").createOrReplaceTempView(
                "engine_macros")
        if self._ACCESS_LOG_FN_RE.search(sql):
            # engine_access_log() table function: the per-call access
            # log (method/peer/identity/status/duration, redacted) as
            # a queryable view (access_log_middleware.cpp analog)
            from gizmosql_spark.instrumentation import AccessLog

            sql = self._ACCESS_LOG_FN_RE.sub("engine_access_log", sql)
            st.spark.createDataFrame(
                self.access_log.entries() or [
                    (0.0, "", "", "", "", 0.0, "")],
                AccessLog.SCHEMA,
            ).filter("method <> ''").createOrReplaceTempView(
                "engine_access_log")
        if self._CATALOG_LOG_FN_RE.search(sql):
            # engine_logs() table function: the catalog-logging table
            # (docs/catalog_logging.md). System-managed → admin-only
            # read, exactly like the reference's log catalog.
            if not st.is_admin:
                raise security.CommandDenied(
                    "engine_logs() requires admin role")
            sql = self._CATALOG_LOG_FN_RE.sub("engine_logs", sql)
            if self.catalog_log is not None:
                # drain what queued so far — reads see a consistent
                # committed prefix of the stream
                self.catalog_log.flush(timeout=10)
                df = self.catalog_log.logs_df(st.spark)
            else:
                from gizmosql_spark.catalog_logging import LOG_SCHEMA

                df = st.spark.createDataFrame([], LOG_SCHEMA)
            df.createOrReplaceTempView("engine_logs")
        if self._SECRETS_FN_RE.search(sql):
            # engine_secrets() table function (duckdb_secrets analog) —
            # ALWAYS admin-only (admin_command_gating.md:55); values
            # are masked, raw material never leaves the registry
            if not st.is_admin:
                raise security.CommandDenied(
                    "engine_secrets() requires admin role")
            sql = self._SECRETS_FN_RE.sub("engine_secrets", sql)
            st.spark.createDataFrame(
                self.secrets.listing() or
                [("", "", "", False, "")],
                "name string, type string, scope string,"
                " persistent boolean, options string",
            ).filter("name <> ''").createOrReplaceTempView(
                "engine_secrets")
        if self._ADMISSION_FN_RE.search(sql):
            # engine_admission_stats(): statement-queue depth metrics
            # (reference statement_queuing.md depth/peak telemetry)
            s = self._admission.stats()
            sql = self._ADMISSION_FN_RE.sub("engine_admission_stats", sql)
            st.spark.createDataFrame(
                [(s.executing, s.queued, s.peak_executing, s.peak_queued,
                  s.total_admitted, s.total_rejected, s.total_timeouts,
                  self._admission.max_concurrent,
                  self._admission.max_queued)],
                "executing int, queued int, peak_executing int,"
                " peak_queued int, total_admitted bigint,"
                " total_rejected bigint, total_timeouts bigint,"
                " max_concurrent int, max_queued int",
            ).createOrReplaceTempView("engine_admission_stats")
        if self._INSTR_VIEW_RE.search(sql):
            # instrumentation views refresh on reference
            # (session_instrumentation.md read-only views)
            self.instr.publish(self.spark)
        for m in list(self._TABLE_CHANGES_RE.finditer(sql)):
            # table_changes('t', v_from[, v_to]) table function: the
            # Delta Change-Data-Feed analog over warehouse snapshots
            # (maintenance.table_changes; deviations documented in
            # docs/transactions_and_lakehouse.md §4)
            from gizmosql_spark.maintenance import table_changes

            tbl, v1, v2 = m.group(1), int(m.group(2)), m.group(3)
            view = __import__("re").sub(
                r"\W", "_", f"table_changes_{tbl}_{v1}_{v2 or 'live'}")
            df = table_changes(
                st.spark, self.warehouse, tbl, v1,
                int(v2) if v2 is not None else None)
            df.createOrReplaceTempView(view)
            sql = sql.replace(m.group(0), view)
        from gizmosql_spark.dialect import extract_time_travel

        sql, travels = extract_time_travel(sql)
        for view, tbl, spec in travels:
            if isinstance(spec, int):
                vpath = self.warehouse.version_path(tbl, spec)
            else:
                # TIMESTAMP AS OF 'ts' — resolve against archive
                # commit times; None = live table is the as-of state
                from datetime import datetime, timezone

                try:
                    ts = datetime.fromisoformat(spec)
                except ValueError as exc:
                    raise ValueError(
                        f"bad TIMESTAMP AS OF literal {spec!r}") from exc
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=timezone.utc)
                vpath = self.warehouse.version_path_at(tbl, ts.timestamp())
            if vpath is None:
                st.spark.table(tbl).createOrReplaceTempView(view)
            else:
                st.spark.read.parquet(vpath).createOrReplaceTempView(view)

        # pipeline-operator table function: every registered operator
        # (dedup, quality, sampling, sketches, …) callable from SQL —
        # the SQL surface a reference user gets for the extension tier.
        # Local dirs passed the read_* admin gate upstream
        # (security.check_admin_gate).
        from gizmosql_spark.dialect import extract_pipeline_ops

        sql, pops = extract_pipeline_ops(sql)
        for view, op_name, op_dir in pops:
            from gizmosql_spark.operators import registry as op_registry

            if not op_dir:
                op_dir = str(
                    st.settings.get(
                        "engine.pipeline_data_dir", self.global_settings)
                    or "")
                if not op_dir:
                    raise ValueError(
                        "pipeline_op: no data dir given and "
                        "engine.pipeline_data_dir is not set")
            try:
                fn = op_registry.resolve(op_name)
            except KeyError as exc:
                raise ValueError(str(exc)) from exc
            fn(st.spark, op_dir).createOrReplaceTempView(view)

        sql, scans = extract_file_scans(sql)
        for view, fmt, path in scans:
            if "://" in path and not path.startswith("file:"):
                # remote path: apply the best-scope-matching secret's
                # credentials to the Hadoop conf before the read (the
                # httpfs-pickup analog; secrets.py)
                self.secrets.apply_for_path(st.spark, path)
            st.spark.read.format(fmt).load(path).createOrReplaceTempView(view)

        # remote-engine scans (flight_scan table function + attached
        # Flight catalogs) — admin-only, like ATTACH itself; results
        # are re-fetched per statement so reads are never stale
        sql, fscans = extract_flight_scans(sql)
        if fscans and not st.is_admin:
            raise security.CommandDenied(
                "flight_scan requires admin role")
        if fscans or st.attached:
            from gizmosql_spark.sources.flight_scan import flight_scan_df

            for view, uri, rsql, user, pw in fscans:
                if user is None and pw is None:
                    # bare flight_scan: credentials from an adbc-type
                    # secret scoped to the uri (the reference's
                    # CREATE SECRET + bare ATTACH flow)
                    user, pw = self.secrets.flight_credentials(uri)
                flight_scan_df(
                    st.spark, uri, rsql, user=user, password=pw
                ).createOrReplaceTempView(view)
            for alias, (uri, user, pw) in st.attached.items():
                if user is None and pw is None:
                    user, pw = self.secrets.flight_credentials(uri)
                pat = __import__("re").compile(
                    rf"\b(FROM|JOIN)\s+{alias}\s*\.\s*([A-Za-z_]\w*)",
                    __import__("re").IGNORECASE)

                def _sub(m, _alias=alias, _uri=uri, _user=user, _pw=pw):
                    tbl = m.group(2)
                    view = f"{_alias}__{tbl}"
                    flight_scan_df(
                        st.spark, _uri, f"SELECT * FROM {tbl}",
                        user=_user, password=_pw,
                    ).createOrReplaceTempView(view)
                    return f"{m.group(1)} {view}"

                sql = pat.sub(_sub, sql)

        from gizmosql_spark import maintenance

        opt = maintenance.parse_optimize(sql)
        if opt is not None:
            # compaction rewrites files in place — snapshot the
            # pre-image so VERSION AS OF survives it
            table, target_mb, zorder = opt
            if st.txn is not None:
                self._txn_snapshot(st, table)
            self.warehouse.snapshot(st.spark, table)
            report = maintenance.apply_optimize(
                st.spark, table, target_mb, zorder=zorder)
            self._refresh_everywhere(table)
            return StatementResult("query", df=report)

        an = maintenance.parse_analyze(sql)
        if an is not None:
            # native ANALYZE computes the stats; the engine then folds
            # them into the manifest so the catalog carries statistics
            # across restarts (DuckLake stores stats in its catalog)
            df = st.spark.sql(sql)
            name = an.split(".")[-1].lower()
            entry = self.warehouse.tables().get(name)
            if entry is not None:
                entry = dict(entry)
                entry["statistics"] = maintenance.table_statistics(
                    st.spark, an)
                self.warehouse.upsert_entry(name, entry)
            return StatementResult("update", df=df, affected_rows=None)

        if __import__("re").match(r"^\s*CHECKPOINT\s*;?\s*$", sql,
                                  __import__("re").IGNORECASE):
            # DuckDB CHECKPOINT = flush the WAL; here = snapshot+prune
            # the catalog commit log (admin-gated by _ADMIN_STMT_RE)
            seq = self.warehouse.checkpoint_now()
            return StatementResult("update", affected_rows=seq)

        exp = self._EXPORT_DB_RE.match(sql)
        if exp is not None:
            # EXPORT/IMPORT DATABASE statement forms (the reference
            # classifies both admin-only, admin_command_guard.cpp:
            # 348-381; the gate already ran in execute_sql)
            from gizmosql_spark.sources.registry import (
                export_database,
                import_database,
            )

            word, target = exp.group(1).upper(), exp.group(2)
            if word == "EXPORT":
                counts = export_database(st.spark, target)
                return StatementResult(
                    "update", affected_rows=len(counts))
            import os as _os

            tables = sorted(
                d for d in _os.listdir(target)
                if _os.path.isdir(_os.path.join(target, d)))
            for t in tables:
                # an import overwrites: clear re-attached EXTERNAL
                # tables / crash leftovers at the destination first
                self.warehouse.prepare_write(st.spark, t, overwrite=True)
            import_database(st.spark, target, tables)
            for t in tables:
                self._refresh_everywhere(t)
                self.warehouse.record(st.spark, t)
            return StatementResult("update", affected_rows=len(tables))

        from gizmosql_spark.sources.registry import copy_to, parse_copy

        cp = parse_copy(sql)
        if cp is not None:
            # COPY … TO/FROM statement form (reference:
            # admin_command_guard.cpp:348-381; gate already ran in
            # execute_sql). TO exports a query/table; FROM appends a
            # file into a managed table.
            direction, src, path, fmt, opts = cp
            if direction == "to":
                q = src[1:-1] if src.startswith("(") else f"SELECT * FROM {src}"
                df = st.spark.sql(q)
                n = df.count()
                copy_to(df, path, fmt=fmt, **opts)
                return StatementResult("update", affected_rows=n)
            reader = st.spark.read.format(fmt)
            for k, v in opts.items():
                reader = reader.option(k, v)
            if fmt == "csv" and "inferSchema" not in opts:
                reader = reader.option("inferSchema", "true")
            src_df = reader.load(path)
            n = src_df.count()
            src_df.write.mode("append").insertInto(src)
            self._refresh_everywhere(src)
            self.warehouse.record(st.spark, src)
            return StatementResult("update", affected_rows=n)

        res = maintenance.parse_restore(sql)
        if res is not None:
            table, version = res
            report = maintenance.apply_restore(
                st.spark, table, version, self.warehouse)
            self._refresh_everywhere(table)
            self.warehouse.record(st.spark, table)
            return StatementResult("query", df=report)

        vac = maintenance.parse_vacuum(sql)
        if vac is not None:
            table, retain = vac
            report = maintenance.apply_vacuum(
                st.spark, table, retain, self.warehouse)
            return StatementResult("query", df=report)

        evo = maintenance.parse_alter_evolution(sql)
        if evo is not None:
            # DROP/RENAME COLUMN: unsupported on v1 parquet tables —
            # copy-on-write schema evolution (snapshot first, so the
            # archived version keeps the pre-evolution schema)
            kind, table, args = evo
            if st.txn is not None:
                self._txn_snapshot(st, table)
            self.warehouse.snapshot(st.spark, table)
            maintenance.apply_alter(
                st.spark, kind, table, args, warehouse=self.warehouse)
            self._refresh_everywhere(table)
            return StatementResult("update", affected_rows=0)

        target = dml_target(sql)
        if target is not None:
            from gizmosql_spark import dml

            up = sql.upper()
            if "OR REPLACE INTO" in up or "ON CONFLICT" in up:
                from gizmosql_spark.dialect import rewrite_insert_upsert

                sql = rewrite_insert_upsert(
                    sql, st.spark,
                    lambda t: self.system_catalog.registry.primary_keys
                    .get(t.split(".")[-1].lower()))

            mrg = dml.parse_merge(sql)
            if mrg is not None:
                if st.txn is not None:
                    self._txn_snapshot(st, target)
                self.warehouse.snapshot(st.spark, target)
                affected = dml.apply_merge(st.spark, mrg)
                self._refresh_everywhere(target)
                return StatementResult("update", affected_rows=affected)
            upd = dml.parse_update(sql)
            dele = dml.parse_delete(sql)
            if upd is not None or dele is not None:
                # UPDATE/DELETE on managed parquet tables: Spark only
                # supports these on Delta/Iceberg — emulate copy-on-
                # write at the engine layer (dml.py)
                if st.txn is not None:
                    self._txn_snapshot(st, target)
                self.warehouse.snapshot(st.spark, target)
                if upd is not None:
                    _, assignments, where = upd
                    affected = dml.apply_update(st.spark, target, assignments, where)
                else:
                    _, where = dele
                    affected = dml.apply_delete(st.spark, target, where)
                self._refresh_everywhere(target)
                return StatementResult("update", affected_rows=affected)
            # DML path: runs eagerly inside spark.sql(). Affected count
            # is measured as the table's row-count delta — count() on a
            # managed parquet table is row-group metadata only, no scan
            # (the reference reads DuckDB's changes() convention,
            # duckdb_statement.cpp:2341-2380).
            if st.txn is not None:
                self._txn_snapshot(st, target)
            before = self._table_count(st, target)
            df = st.spark.sql(sql)
            self._refresh_everywhere(target)
            after = self._table_count(st, target)
            affected = abs(after - before) if before is not None else None
            return StatementResult("update", df=df, affected_rows=affected)

        df = st.spark.sql(sql)
        if df.isStreaming or df.schema.fields:
            return StatementResult("query", df=df)
        return StatementResult("update", df=df, affected_rows=None)

    def refresh_system_views(self) -> None:
        """Publish/refresh ``global_temp.engine_index_info`` and
        ``global_temp.engine_view_definition`` (the reference's
        ``_gizmosql_system`` catalog, system_catalog.cpp:5-62)."""
        self.system_catalog.publish(self.spark)

    def execute_script(self, session_id: str,
                       script: str) -> list[StatementResult]:
        """Run a multi-statement script (the reference splits init SQL
        client-side, gizmosql_library.cpp:122-157)."""
        return [
            self.execute_sql(session_id, stmt)
            for stmt in split_statements(script)
        ]

    def cancel(self, session_id: str) -> None:
        """CancelQuery / CancelFlightInfo: interrupt the session's
        in-flight statements (duckdb_server.cpp:2016-2042)."""
        st = self._session(session_id)
        self._cancel_session_jobs(st)

    # --- transactions (duckdb_server.cpp:1987-2014) -------------------

    def _table_count(self, st: SessionState, table: str) -> int | None:
        try:
            return st.spark.table(table).count()
        except Exception:
            return None

    def _txn_snapshot(self, st: SessionState, table: str) -> None:
        """Snapshot a managed table the first time the open transaction
        writes it (lakehouse deployments use Delta/Iceberg snapshots
        instead of copies)."""
        txn = st.txn
        if txn is None or table in txn.backups:
            return
        if not st.spark.catalog.tableExists(table):
            txn.backups[table] = None
            return
        backup = f"{table}__txn_{txn.txn_id}"
        st.spark.table(table).write.mode("overwrite").saveAsTable(backup)
        txn.backups[table] = backup

    def begin_transaction(self, session_id: str) -> str:
        """Snapshot-emulated transaction (reference: real MVCC BEGIN,
        duckdb_server.cpp:1987-2014). Guarantees, deviations, and the
        Delta/Iceberg upgrade path are documented in
        docs/transactions_and_lakehouse.md."""
        st = self._session(session_id)
        if st.txn is not None:
            raise RuntimeError("transaction already open on this session")
        st.txn = Transaction(uuid.uuid4().hex[:12])
        return st.txn.txn_id

    def end_transaction(self, session_id: str, commit: bool) -> None:
        st = self._session(session_id)
        txn = st.txn
        if txn is None:
            raise RuntimeError("no open transaction on this session")
        st.txn = None
        for table, backup in txn.backups.items():
            if commit:
                if backup is not None:
                    st.spark.sql(f"DROP TABLE IF EXISTS {backup}")
            elif backup is None:
                st.spark.sql(f"DROP TABLE IF EXISTS {table}")
            else:
                st.spark.table(backup).write.mode("overwrite").saveAsTable(table)
                self._refresh_everywhere(table)
                st.spark.sql(f"DROP TABLE IF EXISTS {backup}")

    def reattach(self) -> list[str]:
        """Re-register manifest tables and views, then invalidate any
        stale per-session file listings for them (each SparkSession
        caches its own — a same-JVM 'restart' would otherwise read
        deleted part files)."""
        attached = self.warehouse.reattach_all(self.spark)
        for name in attached:
            self._refresh_everywhere(name)
        return attached

    def _refresh_everywhere(self, table: str) -> None:
        """Invalidate a table's relation cache in every session — the
        cache is per-SparkSession, so an overwrite in one session would
        otherwise leave stale file listings in the others."""
        for sp in [self.spark] + [s.spark for s in self.sessions.values()]:
            try:
                sp.catalog.refreshTable(table)
            except Exception:
                pass

    def collect(self, session_id: str, result: StatementResult,
                timeout: float | None = None) -> list:
        """Materialize under admission control + timeout watchdog
        (duckdb_statement.cpp:1956-2038 admission; :2042-2192 async
        execute + interrupt)."""
        st = self._session(session_id)
        if timeout is None:
            timeout = float(st.settings.get("engine.query_timeout", self.global_settings) or 0)
        bypass = bool(st.settings.get("engine.bypass_queue", self.global_settings))
        t_enqueue = time.perf_counter()
        if not bypass:
            self._admission.acquire()
        queue_wait_ms = (time.perf_counter() - t_enqueue) * 1000
        t_exec = time.perf_counter()
        st.statement_seq += 1
        group = st.session_id
        sc = self.spark.sparkContext
        out: dict[str, Any] = {}

        def _run():
            sc.setJobGroup(group, f"stmt-{st.statement_seq}", interruptOnCancel=True)
            try:
                out["rows"] = result.df.collect()
            except Exception as e:  # surfaced below
                out["error"] = e

        def _record(status: str, rows: int | None = None,
                    error: str | None = None) -> None:
            if result.statement_id is not None:
                self.instr.execution(
                    result.statement_id, status, queue_wait_ms=queue_wait_ms,
                    duration_ms=(time.perf_counter() - t_exec) * 1000,
                    rows_fetched=rows, error=error)
            # child span onto the statement's trace (collect phase)
            with self.telemetry.span(
                "statement.collect", trace_id=result.trace_id,
                parent_id=result.root_span_id, session=st.session_id,
                queue_wait_ms=queue_wait_ms) as sp:
                sp.set_attribute("status", status)
                if rows is not None:
                    sp.set_attribute("rows", rows)
                if error is not None:
                    sp.set_error(error)
            if rows is not None:
                self.telemetry.add_counter(
                    "engine.rows_fetched_total", float(rows))

        try:
            worker = threading.Thread(target=_run, daemon=True)
            worker.start()
            worker.join(timeout if timeout and timeout > 0 else None)
            if worker.is_alive():
                sc.cancelJobGroup(group)
                worker.join(10)
                _record("timeout", error=f"exceeded {timeout}s")
                raise StatementTimeout(f"statement exceeded {timeout}s")
        finally:
            if not bypass:
                self._admission.release()
        if "error" in out:
            err = out["error"]
            if st.killed or "cancelled" in str(err).lower():
                _record("cancelled", error=str(err))
                raise StatementCancelled(str(err))
            _record("error", error=str(err))
            raise err
        self._maybe_capture_profile(st, result)
        _record("success", rows=len(out["rows"]))
        return out["rows"]

    def _explain_analyze(self, st: SessionState,
                         inner_sql: str) -> StatementResult:
        """DuckDB-style ``EXPLAIN ANALYZE <query>``: run the query to
        completion, then report the AQE-FINALIZED physical plan (the
        plan Spark actually executed, with runtime-re-planned joins
        and coalesced partitions) plus wall-clock and row count. The
        inner statement goes through the normal gate/rewrite path, so
        readonly/ACL rules apply exactly as for direct execution.
        Restricted to query statements (documented deviation: DuckDB
        also accepts DML here) so the EXPLAIN prefix can never smuggle
        a write past a readonly session's statement classifier."""
        import time as _time

        if not __import__("re").match(
            r"^\s*(SELECT|WITH|VALUES|TABLE|FROM)\b", inner_sql,
            __import__("re").IGNORECASE,
        ):
            raise ValueError(
                "EXPLAIN ANALYZE supports query statements only")
        result = self._run_statement(st, inner_sql)
        if result.df is None:
            raise ValueError("EXPLAIN ANALYZE requires a query statement")
        t0 = _time.time()
        n_rows = result.df.count()
        elapsed = _time.time() - t0
        try:
            plan = result.df._sc._jvm.PythonSQLUtils.explainString(
                result.df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = result.df._jdf.queryExecution().toString()
        header = (
            f"rows: {n_rows}\nelapsed_sec: {round(elapsed, 4)}\n"
        )
        df = st.spark.createDataFrame(
            [(header + plan,)], "explain_analyze string")
        return StatementResult("query", df=df)

    def _maybe_capture_profile(self, st: SessionState,
                               result: StatementResult) -> None:
        if not bool(
            st.settings.get("engine.capture_query_profile", self.global_settings)
        ):
            return
        try:
            plan = result.df._sc._jvm.PythonSQLUtils.explainString(
                result.df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = ""
        self.query_profiles.append(
            {
                "session_id": st.session_id,
                "statement_seq": st.statement_seq,
                "query_tag": str(
                    st.settings.get("engine.query_tag", self.global_settings) or ""
                ),
                "plan": plan,
            }
        )

    def last_profile(self, session_id: str) -> dict[str, Any] | None:
        for p in reversed(self.query_profiles):
            if p["session_id"] == session_id:
                return p
        return None

    def collect_arrow(self, session_id: str, result: StatementResult,
                      timeout: float | None = None):
        """Materialize as a pyarrow Table — the Arrow-stream result path
        (reference: RecordBatchStream over gRPC,
        duckdb_statement_batch_reader.cpp:68-85; here ``df.toArrow()``
        with the same admission/watchdog wrapping as ``collect``)."""
        st = self._session(session_id)
        if timeout is None:
            timeout = float(st.settings.get("engine.query_timeout", self.global_settings) or 0)
        bypass = bool(st.settings.get("engine.bypass_queue", self.global_settings))
        if not bypass:
            self._admission.acquire()
        st.statement_seq += 1
        sc = self.spark.sparkContext
        out: dict[str, Any] = {}

        def _run():
            sc.setJobGroup(st.session_id, f"stmt-{st.statement_seq}", interruptOnCancel=True)
            try:
                out["table"] = result.df.toArrow()
            except Exception as e:
                out["error"] = e

        try:
            worker = threading.Thread(target=_run, daemon=True)
            worker.start()
            worker.join(timeout if timeout and timeout > 0 else None)
            if worker.is_alive():
                sc.cancelJobGroup(st.session_id)
                worker.join(10)
                raise StatementTimeout(f"statement exceeded {timeout}s")
        finally:
            if not bypass:
                self._admission.release()
        if "error" in out:
            if result.statement_id is not None:
                self.instr.execution(
                    result.statement_id, "error", error=str(out["error"]))
            raise out["error"]
        if result.statement_id is not None:
            self.instr.execution(
                result.statement_id, "success",
                rows_fetched=out["table"].num_rows)
        # GeoArrow export: stamp geometry (WKB) binary columns with
        # extension metadata at the Arrow boundary, like the reference
        # (docs/geometry.md; only binary columns are even inspected)
        from gizmosql_spark.geo import attach_geoarrow_metadata

        return attach_geoarrow_metadata(out["table"])

    # --- prepared statements (§3.2) -----------------------------------

    def prepare(self, session_id: str, sql: str) -> PreparedStatement:
        st = self._session(session_id)
        security.check_admin_gate(sql, st.is_admin)
        security.check_readonly(sql, st.role)
        sql = replace_pseudo_functions(sql, self._pseudo_values(st))
        params = _named_params(sql)
        n_pos = 0 if params else _count_positional_params(sql)
        schema = None
        if not params and not n_pos:
            schema = st.spark.sql(sql).schema  # analysis only, no job
        names = params or [f"param_{i + 1}" for i in range(n_pos)]
        ps = PreparedStatement(
            str(uuid.uuid4()), sql, schema, names, positional=n_pos > 0)
        st.prepared[ps.handle] = ps
        return ps

    def execute_prepared(self, session_id: str, handle: str,
                         params: dict[str, Any] | list | None = None,
                         ) -> StatementResult:
        st = self._session(session_id)
        ps = st.prepared.get(handle)
        if ps is None:
            raise KeyError(f"no such prepared statement: {handle}")
        if ps.positional:
            # `?` markers bind by position (Spark takes a list). A
            # stock client's parameter batch carries arbitrary column
            # names, so fall back to column order unless the names are
            # exactly our synthetic param_i placeholders.
            if isinstance(params, (list, tuple)):
                args: Any = list(params)
            elif params and set(params) >= set(ps.parameter_names):
                args = [params[k] for k in ps.parameter_names]
            else:
                args = list(params.values()) if params else []
            df = st.spark.sql(ps.sql, args=args)
        else:
            df = st.spark.sql(ps.sql, args=params or {})
        if ps.schema is None:
            ps.schema = df.schema
        return StatementResult("query", df=df)

    def close_prepared(self, session_id: str, handle: str) -> None:
        self._session(session_id).prepared.pop(handle, None)

    # --- bulk ingest (§3.3, duckdb_server.cpp:1804-1985) --------------

    def ingest(self, session_id: str, table: str, data,
               mode: str = "create") -> int:
        """Arrow table / pandas / DataFrame → managed table.

        Modes mirror the reference: ``create`` (error if exists),
        ``replace`` (overwrite), ``append`` (by-name column alignment —
        the ``INSERT INTO ... BY NAME`` path, duckdb_server.cpp:
        1954-1974). Returns ingested row count (verified the way the
        reference verifies the interim insert, :1960-1970)."""
        st = self._session(session_id)
        if st.role == "readonly":
            raise security.CommandDenied("readonly role may not ingest")
        if st.txn is not None:
            self._txn_snapshot(st, table)
        if not isinstance(data, DataFrame):
            import pyarrow as pa

            if isinstance(data, pa.RecordBatchReader):
                data = data.read_all()
            elif not isinstance(data, pa.Table) and hasattr(data, "__iter__") \
                    and not hasattr(data, "columns"):
                batches = list(data)
                if batches and isinstance(batches[0], pa.RecordBatch):
                    data = pa.Table.from_batches(batches)
        df = data if isinstance(data, DataFrame) else st.spark.createDataFrame(data)
        n = df.count()
        if mode == "replace":
            try:
                self.warehouse.snapshot(st.spark, table)
            except Exception:
                pass
        self.warehouse.prepare_write(st.spark, table,
                                     overwrite=mode == "replace")
        if mode in ("create", "fail"):
            df.write.mode("errorifexists").saveAsTable(table)
        elif mode == "replace":
            df.write.mode("overwrite").saveAsTable(table)
        elif mode == "append":
            target_cols = [f.name for f in st.spark.table(table).schema.fields]
            df.select(*target_cols).write.mode("append").saveAsTable(table)
        else:
            raise ValueError(f"unknown ingest mode: {mode}")
        self._refresh_everywhere(table)
        self.warehouse.record(st.spark, table)
        return n

    def _summarize(self, st: SessionState, target: str):
        """SUMMARIZE <table|SELECT …> — DuckDB's per-column profile
        statement, same column contract (column_name/column_type/min/
        max/approx_unique/avg/std/q25/q50/q75/count/null_percentage).
        One wide aggregation pass over the relation (every stat is a
        partial agg; percentiles are approx sketches), then the single
        collected row unpivots into the per-column report — scalars to
        the driver, never data."""
        import re as _re

        from pyspark.sql import functions as F

        t = target.strip()
        df = (st.spark.table(t)
              if _re.fullmatch(r"[A-Za-z_][\w.]*", t)
              else st.spark.sql(t))
        num_types = ("int", "bigint", "smallint", "tinyint", "double",
                     "float", "decimal")
        aggs, meta = [], []
        for f in df.schema.fields:
            c, typ = f.name, f.dataType.simpleString()
            is_num = any(typ.startswith(p) for p in num_types)
            is_simple = is_num or typ in ("string", "date", "boolean") \
                or typ.startswith("timestamp")
            meta.append((c, typ, is_num))
            col = F.col(f"`{c}`")
            aggs += [
                (F.min(col).cast("string") if is_simple else
                 F.lit(None).cast("string")).alias(f"min_{c}"),
                (F.max(col).cast("string") if is_simple else
                 F.lit(None).cast("string")).alias(f"max_{c}"),
                (F.approx_count_distinct(col) if is_simple else
                 F.lit(None).cast("bigint")).alias(f"uniq_{c}"),
                (F.avg(col) if is_num else
                 F.lit(None).cast("double")).alias(f"avg_{c}"),
                (F.stddev_samp(col) if is_num else
                 F.lit(None).cast("double")).alias(f"std_{c}"),
                (F.percentile_approx(col, 0.25) if is_num else
                 F.lit(None).cast("double")).alias(f"q25_{c}"),
                (F.percentile_approx(col, 0.5) if is_num else
                 F.lit(None).cast("double")).alias(f"q50_{c}"),
                (F.percentile_approx(col, 0.75) if is_num else
                 F.lit(None).cast("double")).alias(f"q75_{c}"),
                F.count(col).alias(f"nn_{c}"),
            ]
        row = df.agg(*aggs, F.count(F.lit(1)).alias("_n")).collect()[0]
        n = row["_n"]
        out = [
            (c, typ, row[f"min_{c}"], row[f"max_{c}"],
             row[f"uniq_{c}"],
             str(row[f"avg_{c}"]) if row[f"avg_{c}"] is not None else None,
             str(row[f"std_{c}"]) if row[f"std_{c}"] is not None else None,
             str(row[f"q25_{c}"]) if row[f"q25_{c}"] is not None else None,
             str(row[f"q50_{c}"]) if row[f"q50_{c}"] is not None else None,
             str(row[f"q75_{c}"]) if row[f"q75_{c}"] is not None else None,
             n,
             round(100.0 * (n - row[f"nn_{c}"]) / n, 2) if n else 0.0)
            for c, typ, _ in meta
        ]
        return st.spark.createDataFrame(
            out,
            "column_name string, column_type string, min string,"
            " max string, approx_unique bigint, avg string, std string,"
            " q25 string, q50 string, q75 string, count bigint,"
            " null_percentage double",
        )

    def _run_pragma(self, st: SessionState, name: str,
                    arg: str | None) -> StatementResult:
        """DuckDB client-compat PRAGMAs (the reference passes PRAGMA
        statements through to DuckDB; admin_command_guard.cpp:372
        gates the dangerous ones). Unknown pragmas fail closed."""
        from pyspark.sql import functions as F

        spark = st.spark
        if name == "version":
            df = spark.createDataFrame(
                [(f"spark-{spark.version}", "gizmosql-spark")],
                "library_version string, source_id string")
            return StatementResult("query", df=df)
        if name == "database_list":
            df = spark.createDataFrame(
                [(0, spark.catalog.currentCatalog(), "")],
                "seq int, name string, file string")
            return StatementResult("query", df=df)
        if name == "show_tables":
            df = spark.sql("SHOW TABLES").select(
                F.col("tableName").alias("name"))
            return StatementResult("query", df=df)
        if name == "table_info":
            if not arg:
                raise ValueError("PRAGMA table_info requires a table name")
            fields = spark.table(arg).schema.fields
            pks = set(
                self.system_catalog.registry.primary_keys.get(arg, ()))
            df = spark.createDataFrame(
                [(i, f.name, f.dataType.simpleString(),
                  not f.nullable, None,
                  f.name in pks)
                 for i, f in enumerate(fields)],
                "cid int, name string, type string, notnull boolean,"
                " dflt_value string, pk boolean")
            return StatementResult("query", df=df)
        if name == "table_history":
            if not arg:
                raise ValueError("PRAGMA table_history requires a table")
            vs = self.warehouse.versions(arg)
            df = spark.createDataFrame(
                [(v["version"], v["path"], float(v["at"])) for v in vs]
                or [(0, "", 0.0)],
                "version int, path string, at double")
            return StatementResult(
                "query", df=df.filter("version > 0"))
        if name == "table_files":
            # Iceberg `files` metadata-table analog: one row per data
            # file with its size — what OPTIMIZE reads to decide
            # whether compaction is worth a rewrite
            if not arg:
                raise ValueError("PRAGMA table_files requires a table")
            import os

            from gizmosql_spark import maintenance

            loc = maintenance._table_location(spark, arg)
            rows = []
            if loc and os.path.isdir(loc):
                for root, _d, files in os.walk(loc):
                    for f in sorted(files):
                        if f.startswith(("_", ".")):
                            continue
                        p = os.path.join(root, f)
                        try:
                            rows.append(
                                (os.path.relpath(p, loc),
                                 os.path.getsize(p)))
                        except OSError:
                            pass
            df = spark.createDataFrame(
                rows or [("", 0)], "file string, size_bytes bigint")
            return StatementResult("query", df=df.filter("file <> ''"))
        if name == "import_database":
            # parsed as PRAGMA by DuckDB (admin_command_guard.cpp:373);
            # route through the same admin gate as the statement form
            security.check_admin_gate(
                f"IMPORT DATABASE '{arg}'", is_admin=st.is_admin)
            import os

            from gizmosql_spark.sources.registry import import_database

            tables = sorted(
                d for d in os.listdir(arg)
                if os.path.isdir(os.path.join(arg, d)))
            import_database(spark, arg, tables)
            for t in tables:
                self._refresh_everywhere(t)
            return StatementResult("update", affected_rows=len(tables))
        raise ValueError(f"unsupported PRAGMA: {name}")

    def register_arrow_view(self, session_id: str, name: str,
                            table) -> int:
        """Arrow data → SESSION temp view (no storage write). The
        DoExchange seam: pushed batches become queryable mid-call
        without a managed-table round trip; the view lives and dies
        with the session's isolated SparkSession."""
        import re

        st = self._session(session_id)
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise ValueError(f"invalid view name: {name!r}")
        df = st.spark.createDataFrame(table)
        df.createOrReplaceTempView(name)
        return table.num_rows

    # --- metadata + health (§2A) --------------------------------------

    def get_session_options(self, session_id: str) -> dict[str, str]:
        """GetSessionOptions: current catalog/schema; doubles as a
        non-creating liveness probe (duckdb_server.cpp:2079-2109)."""
        st = self._session(session_id)
        return {
            "catalog": st.spark.catalog.currentCatalog(),
            "schema": st.spark.catalog.currentDatabase(),
        }

    def set_session_options(self, session_id: str, catalog: str | None = None,
                            schema: str | None = None) -> None:
        st = self._session(session_id)
        if catalog:
            st.spark.catalog.setCurrentCatalog(catalog)
        if schema:
            st.spark.catalog.setCurrentDatabase(schema)

    def health_check(self) -> bool:
        """SELECT 1 heartbeat (health_service.cpp)."""
        try:
            return self.spark.sql("SELECT 1").collect()[0][0] == 1
        except Exception:
            return False

    def start_health_monitor(self, interval_seconds: float = 5.0) -> None:
        """Background heartbeat with staleness detection — the
        reference runs its --health-check-query on a thread and reports
        stale when the last success ages out (health_service.cpp,
        wiring gizmosql_library.cpp:1010-1052)."""
        if getattr(self, "_health_stop", None) is not None:
            return
        self._health_stop = threading.Event()
        self._health_last_ok: float | None = None
        self._health_interval = interval_seconds

        def _loop():
            # only the very first iteration runs immediately; an
            # unhealthy engine must not hot-loop SELECT 1 with no
            # backoff while waiting for its first success
            first = True
            while not self._health_stop.wait(0.0 if first else interval_seconds):
                first = False
                if self.health_check():
                    self._health_last_ok = time.time()

        self._health_thread = threading.Thread(target=_loop, daemon=True)
        self._health_thread.start()

    def stop_health_monitor(self) -> None:
        stop = getattr(self, "_health_stop", None)
        if stop is not None:
            stop.set()
            self._health_thread.join(5)
            self._health_stop = None

    def health_status(self) -> dict[str, Any]:
        """Live + staleness view of the monitor (stale when the last
        success is older than 3 heartbeat intervals)."""
        last_ok = getattr(self, "_health_last_ok", None)
        if last_ok is None:
            return {"healthy": False, "stale": True, "last_ok_age_s": None}
        age = time.time() - last_ok
        return {
            "healthy": True,
            "stale": age > 3 * getattr(self, "_health_interval", 5.0),
            "last_ok_age_s": age,
        }
