"""Arrow Flight server exposing the Engine over the wire.

The reference IS an Arrow Flight SQL server — a gRPC service speaking
the Flight RPC verbs with Flight-SQL protobuf command payloads
(/root/reference/src/duckdb/duckdb_server.cpp:1267-1302 GetFlightInfo/
DoGet statements, :1354-1513 prepared statements, :1804-1985 DoPut
ingest, :1987-2130 DoAction session/txn ops; gRPC service assembly
/root/reference/src/common/gizmosql_library.cpp:1077-1082; header auth
middleware /root/reference/src/common/gizmosql_security.cpp:317-440).

This module re-expresses that surface on ``pyarrow.flight``:

- **GetFlightInfo** (statement command) → ``Engine.execute_sql`` —
  lazy analysis returns the Arrow schema without execution, exactly
  the reference's prepare-only pass; the returned endpoint carries a
  one-shot ticket.
- **DoGet** (ticket) → ``Engine.collect_arrow`` under admission
  control + timeout watchdog, streamed back as record batches.
- **GetSchema** → analyzed schema only, no job.
- **DoPut** (ingest command) → ``Engine.ingest`` (create / replace /
  append by-name — the ADBC ``adbc_ingest`` modes).
- **DoPut** (update command) → ``Engine.execute_sql`` DML, affected
  count returned in the app metadata (the reference's
  DoPutCommandStatementUpdate).
- **DoAction** → session create/close, BEGIN/COMMIT/ROLLBACK,
  prepared-statement lifecycle, cancel, kill-session, health check,
  session options — each a small JSON body.
- **Auth middleware**: ``authorization: Basic ...`` mints a signed
  bearer token (returned in the response headers, the reference's
  mint-on-first-auth flow); ``authorization: Bearer ...`` verifies and
  carries role + catalog-ACL claims into the session.

Protocol deviation, documented: the official Flight SQL command
payloads are protobuf ``Any`` messages; protobuf is unavailable in
this environment, so commands/tickets/action bodies are JSON objects
with a ``type`` tag mirroring the Flight SQL message names
(``statement_query`` ≈ CommandStatementQuery, ``ingest`` ≈
CommandStatementIngest, ...). The verb → engine-call mapping — the
part that carries the semantics — is one-to-one with the reference.

Scale note: the server is a thin control plane. Data movement is
Arrow record batches both directions; query execution stays inside
Spark (distributed), and the only driver-resident state per statement
is its Arrow result while it streams out.
"""

from __future__ import annotations

import base64
import json
import threading
import time
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.flight as flight

from gizmosql_spark import security
from gizmosql_spark.auth import AuthError
from gizmosql_spark.engine import Engine, StatementResult


def _spark_to_arrow_schema(df) -> pa.Schema:
    """Arrow schema from an analyzed DataFrame without running a job
    (falls back to an empty collect if the converter is unavailable)."""
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(df.schema)
    except Exception:
        return df.limit(0).toArrow().schema


class _AuthMiddleware(flight.ServerMiddleware):
    def __init__(self, claims: dict[str, Any], token: str | None,
                 minted: bool):
        self.claims = claims
        self.token = token
        self._minted = minted

    def sending_headers(self):
        # mint-on-first-auth: hand the signed bearer token back so the
        # client can switch from Basic to Bearer (reference
        # gizmosql_security.cpp:263-295)
        if self._minted and self.token:
            return {"authorization": f"Bearer {self.token}"}
        return {}


class _AuthMiddlewareFactory(flight.ServerMiddlewareFactory):
    """Header auth: Basic → authenticate + mint token; Bearer →
    verify. Anonymous calls are rejected unless the server was built
    with ``require_auth=False``."""

    def __init__(self, engine: Engine, require_auth: bool):
        self.engine = engine
        self.require_auth = require_auth

    def start_call(self, info, headers):
        auth_values = headers.get("authorization", [])
        if not auth_values:
            if self.require_auth:
                raise flight.FlightUnauthenticatedError(
                    "authorization header required")
            return _AuthMiddleware(
                {"sub": "anonymous", "role": "user"}, None, False)
        value = auth_values[0]
        try:
            if value.lower().startswith("basic "):
                decoded = base64.b64decode(value[6:]).decode("utf-8")
                username, _, password = decoded.partition(":")
                token = self.engine.authenticate(username, password)
                from gizmosql_spark.auth import verify_token

                claims = verify_token(self.engine.token_secret, token)
                return _AuthMiddleware(claims, token, minted=True)
            if value.lower().startswith("bearer "):
                token = value[7:]
                claims = self.engine.verify_bearer(token)
                return _AuthMiddleware(claims, token, minted=False)
        except AuthError as e:
            raise flight.FlightUnauthenticatedError(str(e))
        raise flight.FlightUnauthenticatedError(
            "unsupported authorization scheme")


class _AccessLogMiddleware(flight.ServerMiddleware):
    """Per-RPC access log record (access_log_middleware.cpp: method,
    status, duration emitted at CallCompleted)."""

    def __init__(self, engine: Engine, method: str):
        self.engine = engine
        self.method = method
        self._t0 = time.perf_counter()

    def call_completed(self, exception):
        self.engine.access_log.record(
            f"flight.{self.method}",
            status="ERROR" if exception is not None else "OK",
            duration_ms=(time.perf_counter() - self._t0) * 1000,
            detail=str(exception) if exception is not None else "")


class _AccessLogMiddlewareFactory(flight.ServerMiddlewareFactory):
    def __init__(self, engine: Engine):
        self.engine = engine

    def start_call(self, info, headers):
        return _AccessLogMiddleware(self.engine, str(info.method))


#: tickets expire if the client never fetches them
_TICKET_TTL_S = 600.0


class FlightEngineServer(flight.FlightServerBase):
    """The Engine served over Flight RPC on a localhost port."""

    def __init__(self, engine: Engine | None = None,
                 location: str = "grpc://127.0.0.1:0",
                 require_auth: bool = True, **kwargs):
        self.engine = engine or Engine()
        self._auth_factory = _AuthMiddlewareFactory(self.engine, require_auth)
        super().__init__(
            location,
            middleware={
                "auth": self._auth_factory,
                "accesslog": _AccessLogMiddlewareFactory(self.engine),
            },
            **kwargs)
        self._location = location
        #: ticket id -> (created_at, session_id, StatementResult)
        self._tickets: dict[str, tuple[float, str, StatementResult]] = {}
        self._tickets_lock = threading.Lock()

    # --- helpers ------------------------------------------------------

    def _claims(self, context) -> dict[str, Any]:
        mw = context.get_middleware("auth")
        if mw is None:
            return {"sub": "anonymous", "role": "user"}
        return mw.claims

    def _token(self, context) -> str | None:
        mw = context.get_middleware("auth")
        return mw.token if mw is not None else None

    def _session_for(self, context, body: dict[str, Any]) -> str:
        """Session id from the command body; sessions are explicit
        (create_session action), mirroring the reference's per-client
        session map (duckdb_server.cpp:957-1079)."""
        sid = body.get("session")
        if not sid:
            raise flight.FlightServerError(
                "missing 'session' — call the create_session action first")
        return sid

    def _prune_tickets(self) -> None:
        cutoff = time.time() - _TICKET_TTL_S
        with self._tickets_lock:
            for tid in [t for t, (at, _, _) in self._tickets.items()
                        if at < cutoff]:
                self._tickets.pop(tid, None)

    def _store_ticket(self, session_id: str, result: StatementResult) -> str:
        self._prune_tickets()
        tid = uuid.uuid4().hex
        with self._tickets_lock:
            self._tickets[tid] = (time.time(), session_id, result)
        return tid

    @staticmethod
    def _parse_command(raw: bytes) -> dict[str, Any]:
        try:
            cmd = json.loads(raw.decode("utf-8"))
        except Exception:
            raise flight.FlightServerError(
                "descriptor command must be a JSON object")
        if not isinstance(cmd, dict) or "type" not in cmd:
            raise flight.FlightServerError(
                "descriptor command must carry a 'type' tag")
        return cmd

    def _wrap_errors(self, fn, *args):
        """Engine exceptions → Flight status codes."""
        try:
            return fn(*args)
        except security.CommandDenied as e:
            raise flight.FlightUnauthorizedError(str(e))
        except AuthError as e:
            raise flight.FlightUnauthenticatedError(str(e))
        except flight.FlightError:
            raise
        except Exception as e:
            raise flight.FlightServerError(f"{type(e).__name__}: {e}")

    # --- GetFlightInfo / GetSchema / DoGet ----------------------------

    def get_flight_info(self, context, descriptor):
        cmd = self._parse_command(descriptor.command)
        if cmd["type"] in ("statement_query", "prepared_query"):
            sid = self._session_for(context, cmd)
            if cmd["type"] == "statement_query":
                result = self._wrap_errors(
                    self.engine.execute_sql, sid, cmd["sql"])
            else:
                result = self._wrap_errors(
                    self.engine.execute_prepared, sid, cmd["handle"],
                    cmd.get("parameters") or {})
            if result.df is None:
                # DML/SET through the query verb: surface the count as
                # a 1-row frame, like the reference's update results
                schema = pa.schema([("affected_rows", pa.int64())])
                tbl = pa.table(
                    {"affected_rows": [result.affected_rows or 0]})
                result = StatementResult("query_rows", df=None)
                result.arrow_table = tbl
                tid = self._store_ticket(sid, result)
                return flight.FlightInfo(
                    schema, descriptor,
                    [flight.FlightEndpoint(
                        json.dumps({"ticket": tid}).encode(), [])],
                    1, tbl.nbytes)
            n_parts = int(cmd.get("partitions", 1) or 1)
            if n_parts > 1:
                # partitioned result: materialize now and hand out one
                # ticket per slice — N endpoints that N client tasks
                # stream in parallel (the Flight multi-endpoint scale
                # path; the reference's server is single-endpoint too,
                # its parallel readers rely on the same contract)
                table = self._wrap_errors(
                    self.engine.collect_arrow, sid, result)
                n_parts = max(1, min(n_parts, max(table.num_rows, 1)))
                # balanced split: first (rows % n) slices get one extra
                base, extra = divmod(table.num_rows, n_parts)
                endpoints, off = [], 0
                for i in range(n_parts):
                    size = base + (1 if i < extra else 0)
                    chunk = StatementResult("query_rows", df=None)
                    chunk.arrow_table = table.slice(off, size)
                    off += size
                    tid = self._store_ticket(sid, chunk)
                    endpoints.append(flight.FlightEndpoint(
                        json.dumps({"ticket": tid}).encode(), []))
                return flight.FlightInfo(
                    table.schema, descriptor, endpoints,
                    table.num_rows, table.nbytes)
            schema = _spark_to_arrow_schema(result.df)
            tid = self._store_ticket(sid, result)
            return flight.FlightInfo(
                schema, descriptor,
                [flight.FlightEndpoint(
                    json.dumps({"ticket": tid}).encode(), [])],
                -1, -1)
        raise flight.FlightServerError(
            f"unsupported command type: {cmd['type']}")

    def get_schema(self, context, descriptor):
        cmd = self._parse_command(descriptor.command)
        sid = self._session_for(context, cmd)
        if cmd["type"] == "statement_query":
            result = self._wrap_errors(self.engine.execute_sql, sid, cmd["sql"])
        elif cmd["type"] == "prepared_query":
            ps = self.engine._session(sid).prepared.get(cmd["handle"])
            if ps is None or ps.schema is None:
                raise flight.FlightServerError("prepared schema unavailable")
            from pyspark.sql import DataFrame  # noqa: F401

            class _Shim:
                schema = ps.schema
            return flight.SchemaResult(_spark_to_arrow_schema(_Shim()))
        else:
            raise flight.FlightServerError(
                f"unsupported command type: {cmd['type']}")
        if result.df is None:
            return flight.SchemaResult(
                pa.schema([("affected_rows", pa.int64())]))
        return flight.SchemaResult(_spark_to_arrow_schema(result.df))

    def do_get(self, context, ticket):
        body = json.loads(ticket.ticket.decode("utf-8"))
        with self._tickets_lock:
            entry = self._tickets.pop(body["ticket"], None)
        if entry is None:
            raise flight.FlightServerError("unknown or expired ticket")
        _, sid, result = entry
        if getattr(result, "arrow_table", None) is not None:
            return flight.RecordBatchStream(result.arrow_table)
        table = self._wrap_errors(self.engine.collect_arrow, sid, result)
        return flight.RecordBatchStream(table)

    # --- DoPut: ingest + update ---------------------------------------

    def do_put(self, context, descriptor, reader, writer):
        cmd = self._parse_command(descriptor.command)
        sid = self._session_for(context, cmd)
        if cmd["type"] == "ingest":
            data = reader.read_all()
            n = self._wrap_errors(
                self.engine.ingest, sid, cmd["table"], data,
                cmd.get("mode", "create"))
            writer.write(json.dumps({"record_count": n}).encode())
            return
        if cmd["type"] == "statement_update":
            result = self._wrap_errors(
                self.engine.execute_sql, sid, cmd["sql"])
            writer.write(json.dumps(
                {"record_count": result.affected_rows
                 if result.affected_rows is not None else -1}).encode())
            return
        raise flight.FlightServerError(
            f"unsupported DoPut command type: {cmd['type']}")

    # --- DoExchange: push + transform + pull in ONE call --------------

    def do_exchange(self, context, descriptor, reader, writer):
        """Bidirectional transform: the client streams Arrow batches
        up, the server registers them as a session temp view, runs the
        command's SQL against it, and streams the result back — the
        two-round-trip ADBC pattern (ingest then query) in one RPC,
        with no managed-table write. Command: {"type":
        "exchange_transform", "session": …, "sql": …, "view": name}."""
        cmd = self._parse_command(descriptor.command)
        if cmd["type"] != "exchange_transform":
            raise flight.FlightServerError(
                f"unsupported DoExchange command type: {cmd['type']}")
        sid = self._session_for(context, cmd)
        data = reader.read_all()
        view = cmd.get("view", "exchange_input")
        self._wrap_errors(
            self.engine.register_arrow_view, sid, view, data)
        result = self._wrap_errors(self.engine.execute_sql, sid, cmd["sql"])
        table = self._wrap_errors(self.engine.collect_arrow, sid, result)
        writer.begin(table.schema)
        for batch in table.to_batches():
            writer.write_batch(batch)

    # --- DoAction -----------------------------------------------------

    _ACTIONS = {
        "create_session": "open a session (body: {role?}) -> {session}",
        "close_session": "close a session (body: {session})",
        "begin_transaction": "BEGIN (body: {session}) -> {transaction_id}",
        "end_transaction":
            "COMMIT/ROLLBACK (body: {session, commit: bool})",
        "cancel_query": "interrupt in-flight statements (body: {session})",
        "kill_session": "admin kill (body: {session, target})",
        "create_prepared_statement":
            "prepare (body: {session, sql}) -> {handle, parameters}",
        "close_prepared_statement": "close (body: {session, handle})",
        "health_check": "liveness probe -> {healthy}",
        "get_session_options": "current catalog/schema (body: {session})",
        "set_session_options":
            "set catalog/schema (body: {session, catalog?, schema?})",
        "shutdown_drain": "admin: stop accepting new statements",
    }

    def list_actions(self, context):
        return [flight.ActionType(name, desc)
                for name, desc in sorted(self._ACTIONS.items())]

    def do_action(self, context, action):
        name = action.type
        body = json.loads(action.body.to_pybytes().decode("utf-8") or "{}")
        claims = self._claims(context)

        def ok(payload: dict[str, Any]):
            return iter([flight.Result(json.dumps(payload).encode())])

        if name == "create_session":
            token = self._token(context)
            sid = self._wrap_errors(
                lambda: self.engine.create_session(
                    role=body.get("role", claims.get("role", "user")),
                    token=token))
            return ok({"session": sid})
        if name == "health_check":
            return ok({"healthy": self.engine.health_check()})
        if name == "shutdown_drain":
            if claims.get("role") != "admin":
                raise flight.FlightUnauthorizedError(
                    "drain requires admin role")
            self.engine.begin_drain()
            return ok({"draining": True})

        sid = self._session_for(context, body)
        if name == "close_session":
            self.engine.close_session(sid)
            return ok({"closed": True})
        if name == "begin_transaction":
            txn = self._wrap_errors(self.engine.begin_transaction, sid)
            return ok({"transaction_id": txn})
        if name == "end_transaction":
            self._wrap_errors(
                self.engine.end_transaction, sid, bool(body.get("commit", True)))
            return ok({"committed": bool(body.get("commit", True))})
        if name == "cancel_query":
            self._wrap_errors(self.engine.cancel, sid)
            return ok({"cancelled": True})
        if name == "kill_session":
            killed = self._wrap_errors(
                self.engine.kill_session, body["target"], sid)
            return ok({"killed": killed})
        if name == "create_prepared_statement":
            ps = self._wrap_errors(self.engine.prepare, sid, body["sql"])
            return ok({"handle": ps.handle, "parameters": ps.parameter_names})
        if name == "close_prepared_statement":
            self.engine.close_prepared(sid, body["handle"])
            return ok({"closed": True})
        if name == "get_session_options":
            return ok(self._wrap_errors(self.engine.get_session_options, sid))
        if name == "set_session_options":
            self._wrap_errors(
                self.engine.set_session_options, sid,
                body.get("catalog"), body.get("schema"))
            return ok({"ok": True})
        raise flight.FlightServerError(f"unknown action: {name}")

    # --- ListFlights: the table inventory -----------------------------

    def list_flights(self, context, criteria):
        from gizmosql_spark.catalog import get_tables

        for row in get_tables(self.engine.spark).collect():
            descriptor = flight.FlightDescriptor.for_path(
                row["table_catalog"] or "", row["table_schema"] or "",
                row["table_name"])
            yield flight.FlightInfo(pa.schema([]), descriptor, [], -1, -1)


def serve(host: str = "127.0.0.1", port: int = 8815,
          require_auth: bool = True) -> None:
    """Blocking entry point: ``python -m gizmosql_spark.flight_server``."""
    server = FlightEngineServer(
        location=f"grpc://{host}:{port}", require_auth=require_auth)
    print(f"gizmosql-spark flight server listening on {host}:{server.port}")
    server.serve()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8815)
    ap.add_argument("--no-auth", action="store_true")
    args = ap.parse_args()
    serve(args.host, args.port, require_auth=not args.no_auth)
