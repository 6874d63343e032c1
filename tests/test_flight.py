"""Loopback Flight server tests — the wire-protocol parity gate.

A FlightEngineServer on 127.0.0.1 (port 0 = ephemeral), driven by a
real ``pyarrow.flight.FlightClient``: Basic→Bearer auth handshake,
statement query (TPC-H q01 over the sf0.001 fixture via replacement
scan), schema-without-execution, DoPut ingest round-trip, DML update
counts, prepared statements, transactions, and denial paths — the
end-to-end checks the reference runs against its own server
(/root/reference/tests: test_flight_sql.py-style coverage).
"""

from __future__ import annotations

import base64
import json
import os

import pyarrow as pa
import pyarrow.flight as flight
import pytest

from gizmosql_spark.engine import Engine
from gizmosql_spark.flight_server import FlightEngineServer

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def server(spark):
    eng = Engine(spark=spark)
    eng.add_user("admin", "secret", role="admin")
    eng.add_user("reader", "r", role="readonly")
    srv = FlightEngineServer(engine=eng, location="grpc://127.0.0.1:0")
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def client(server):
    cl = flight.FlightClient(f"grpc://127.0.0.1:{server.port}")
    yield cl
    cl.close()


def _basic(user: str, pw: str) -> flight.FlightCallOptions:
    tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
    return flight.FlightCallOptions(headers=[
        (b"authorization", f"Basic {tok}".encode())])


def _bearer(token: str) -> flight.FlightCallOptions:
    return flight.FlightCallOptions(headers=[
        (b"authorization", f"Bearer {token}".encode())])


def _action(client, name, body, opts):
    results = list(client.do_action(
        flight.Action(name, json.dumps(body).encode()), options=opts))
    return json.loads(results[0].body.to_pybytes()) if results else {}


@pytest.fixture(scope="module")
def admin_session(client):
    opts = _basic("admin", "secret")
    sid = _action(client, "create_session", {}, opts)["session"]
    return sid, opts


def _run_query(client, opts, sid, sql) -> pa.Table:
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "statement_query", "session": sid,
                    "sql": sql}).encode())
    info = client.get_flight_info(desc, options=opts)
    ticket = info.endpoints[0].ticket
    return client.do_get(ticket, options=opts).read_all()


def test_auth_rejects_bad_credentials(client):
    with pytest.raises(flight.FlightUnauthenticatedError):
        _action(client, "health_check", {}, _basic("admin", "wrong"))
    with pytest.raises(flight.FlightUnauthenticatedError):
        _action(client, "health_check", {},
                flight.FlightCallOptions())  # no header


def test_health_check(client):
    assert _action(client, "health_check", {},
                   _basic("admin", "secret"))["healthy"] is True


def test_minted_bearer_token_roundtrip(server):
    """Basic auth mints a Bearer token in the response headers
    (mint-on-first-auth); the token then authenticates by itself."""

    class _Capture(flight.ClientMiddleware):
        def __init__(self, sink):
            self.sink = sink

        def received_headers(self, headers):
            for v in headers.get("authorization", []):
                self.sink.append(v)

    class _CaptureFactory(flight.ClientMiddlewareFactory):
        def __init__(self):
            self.tokens = []

        def start_call(self, info):
            return _Capture(self.tokens)

    factory = _CaptureFactory()
    cl = flight.FlightClient(
        f"grpc://127.0.0.1:{server.port}", middleware=[factory])
    try:
        _action(cl, "health_check", {}, _basic("admin", "secret"))
        bearers = [t for t in factory.tokens
                   if t.lower().startswith("bearer ")]
        assert bearers, "server should mint a Bearer token on Basic auth"
        token = bearers[0].split(" ", 1)[1]
        got = _action(cl, "health_check", {}, _bearer(token))
        assert got["healthy"] is True
        with pytest.raises(flight.FlightUnauthenticatedError):
            _action(cl, "health_check", {}, _bearer(token[:-4] + "AAAA"))
    finally:
        cl.close()


def test_statement_query_roundtrip(client, admin_session):
    sid, opts = admin_session
    t = _run_query(client, opts, sid, "SELECT 1 AS x, 'a' AS s")
    assert t.num_rows == 1
    assert t.column("x")[0].as_py() == 1


def test_tpch_q01_over_flight(client, admin_session):
    """q01 end-to-end through the wire: replacement scan on the
    fixture parquet, grouped aggregation, ordered output."""
    sid, opts = admin_session
    q01 = f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS DOUBLE)       AS sum_qty,
               CAST(sum(l_extendedprice) AS DOUBLE)  AS sum_base_price,
               count(*)                              AS count_order
        FROM '{SF_DIR}/lineitem.parquet'
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    t = _run_query(client, opts, sid, q01)
    assert t.num_rows >= 4
    assert t.column_names == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "count_order"]
    # spot-check against a direct DuckDB run of the same SQL
    import duckdb

    o = duckdb.sql(q01.replace("count(*)", "CAST(count(*) AS BIGINT)"))
    assert sorted(map(tuple, o.fetchall())) == sorted(
        tuple(r[c] for c in t.column_names)
        for r in t.to_pylist())


def test_get_schema_without_execution(client, admin_session):
    sid, opts = admin_session
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "statement_query", "session": sid,
                    "sql": "SELECT 1 AS a, CAST(2.5 AS DOUBLE) AS b"}
                   ).encode())
    res = client.get_schema(desc, options=opts)
    schema = res.schema
    assert schema.names == ["a", "b"]
    assert schema.field("b").type == pa.float64()


def test_ingest_roundtrip(client, admin_session):
    sid, opts = admin_session
    data = pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]})
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "ingest", "session": sid,
                    "table": "t_flight_ingest",
                    "mode": "replace"}).encode())
    writer, meta_reader = client.do_put(desc, data.schema, options=opts)
    writer.write_table(data)
    writer.done_writing()
    ack = json.loads(meta_reader.read().to_pybytes())
    writer.close()
    assert ack["record_count"] == 3
    t = _run_query(client, opts, sid,
                   "SELECT * FROM t_flight_ingest ORDER BY id")
    assert t.column("id").to_pylist() == [1, 2, 3]
    # append mode aligns by name
    more = pa.table({"v": ["d"], "id": [4]})
    desc2 = flight.FlightDescriptor.for_command(
        json.dumps({"type": "ingest", "session": sid,
                    "table": "t_flight_ingest",
                    "mode": "append"}).encode())
    w2, mr2 = client.do_put(desc2, more.schema, options=opts)
    w2.write_table(more)
    w2.done_writing()
    assert json.loads(mr2.read().to_pybytes())["record_count"] == 1
    w2.close()
    t2 = _run_query(client, opts, sid,
                    "SELECT count(*) AS n FROM t_flight_ingest")
    assert t2.column("n")[0].as_py() == 4


def test_statement_update_via_doput(client, admin_session):
    sid, opts = admin_session
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "statement_update", "session": sid,
                    "sql": "INSERT INTO t_flight_ingest VALUES (9, 'z')"}
                   ).encode())
    writer, meta_reader = client.do_put(
        desc, pa.schema([]), options=opts)
    writer.done_writing()
    ack = json.loads(meta_reader.read().to_pybytes())
    writer.close()
    assert ack["record_count"] == 1


def test_prepared_statement_lifecycle(client, admin_session):
    sid, opts = admin_session
    created = _action(client, "create_prepared_statement",
                      {"session": sid,
                       "sql": "SELECT :n + 1 AS out"}, opts)
    handle = created["handle"]
    assert created["parameters"] == ["n"]
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "prepared_query", "session": sid,
                    "handle": handle,
                    "parameters": {"n": 41}}).encode())
    info = client.get_flight_info(desc, options=opts)
    t = client.do_get(info.endpoints[0].ticket, options=opts).read_all()
    assert t.column("out")[0].as_py() == 42
    _action(client, "close_prepared_statement",
            {"session": sid, "handle": handle}, opts)


def test_transaction_rollback_over_flight(client, admin_session):
    sid, opts = admin_session
    _run_query(client, opts, sid, "SELECT 1")  # warm
    _action(client, "begin_transaction", {"session": sid}, opts)
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "statement_update", "session": sid,
                    "sql": "INSERT INTO t_flight_ingest VALUES (99, 'tx')"}
                   ).encode())
    w, mr = client.do_put(desc, pa.schema([]), options=opts)
    w.done_writing()
    mr.read()
    w.close()
    _action(client, "end_transaction",
            {"session": sid, "commit": False}, opts)
    t = _run_query(client, opts, sid,
                   "SELECT count(*) AS n FROM t_flight_ingest WHERE id = 99")
    assert t.column("n")[0].as_py() == 0


def test_readonly_role_denied_writes(client):
    opts = _basic("reader", "r")
    sid = _action(client, "create_session", {}, opts)["session"]
    with pytest.raises((flight.FlightUnauthorizedError, flight.FlightError)):
        _run_query(client, opts, sid,
                   "CREATE TABLE t_should_fail AS SELECT 1 AS a")
    # reads still fine
    t = _run_query(client, opts, sid, "SELECT 2 AS y")
    assert t.column("y")[0].as_py() == 2
    _action(client, "close_session", {"session": sid}, opts)


def test_session_options_over_flight(client, admin_session):
    sid, opts = admin_session
    got = _action(client, "get_session_options", {"session": sid}, opts)
    assert got["catalog"] == "spark_catalog"
    assert got["schema"] == "default"


def test_list_actions_and_flights(client, admin_session):
    sid, opts = admin_session
    names = [a.type for a in client.list_actions(options=opts)]
    assert "create_session" in names and "begin_transaction" in names
    flights = list(client.list_flights(options=opts))
    assert any(
        f.descriptor.path[-1] == b"t_flight_ingest" for f in flights)


def test_missing_session_rejected(client, admin_session):
    _, opts = admin_session
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "statement_query",
                    "sql": "SELECT 1"}).encode())
    with pytest.raises(flight.FlightError):
        client.get_flight_info(desc, options=opts)


def test_ticket_is_one_shot(client, admin_session):
    sid, opts = admin_session
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"type": "statement_query", "session": sid,
                    "sql": "SELECT 7 AS z"}).encode())
    info = client.get_flight_info(desc, options=opts)
    ticket = info.endpoints[0].ticket
    client.do_get(ticket, options=opts).read_all()
    with pytest.raises(flight.FlightError):
        client.do_get(ticket, options=opts).read_all()


def test_pipeline_op_over_flight(client, admin_session):
    """The operator tier through the wire: pipeline_op as a table
    function inside a plain Flight SQL statement."""
    sid, opts = admin_session
    t = _run_query(
        client, opts, sid,
        f"SELECT * FROM pipeline_op('dataset_split', '{SF_DIR}')"
        " ORDER BY split",
    )
    assert t.num_rows >= 1
    assert "split" in t.schema.names and "n_docs" in t.schema.names
