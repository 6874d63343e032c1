"""Remote-engine scan over Arrow Flight — the ADBC-scanner analog.

The reference queries remote databases from SQL via the adbc_scanner
extension: ``CREATE SECRET (TYPE adbc, uri …)`` + ``ATTACH 'grpc://…'
AS db (TYPE adbc)`` and then plain ``SELECT … FROM db.table``
(/root/reference/docs/adbc_scanner_duckdb.md:60-120). GizmoSQL
instances can chain this way — engine querying engine.

Spark-first equivalent over this repo's own wire protocol
(flight_server.py):

- ``fetch(uri, sql, …) -> pyarrow.Table`` — one Flight round-trip
  (auth handshake, statement command, DoGet stream).
- ``flight_scan_df(spark, …)`` — the fetched batches as a DataFrame.
- SQL surface (engine layer): ``flight_scan('uri', 'sql' [, user,
  password])`` in FROM position, and ``ATTACH 'grpc://…' AS alias
  (TYPE flight)`` + ``SELECT … FROM alias.table`` with lazy per-table
  fetch (dialect.extract_flight_scans / parse_attach).

Scale path: a Flight result can carry MANY endpoints; the distributed
form maps each endpoint ticket to one executor task (mapInPandas over
a one-row-per-endpoint frame, each task opening its own DoGet). This
repo's server returns a single endpoint, so the driver-side fetch is
the honest local form — the endpoint fan-out seam is
``fetch_endpoints`` and the partition count follows the server's
endpoint count, exactly how ADBC/Flight parallel readers scale.
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def _options(user: str | None, password: str | None, token: str | None):
    import pyarrow.flight as flight

    headers = []
    if token:
        headers.append((b"authorization", f"Bearer {token}".encode()))
    elif user is not None:
        cred = base64.b64encode(f"{user}:{password or ''}".encode()).decode()
        headers.append((b"authorization", f"Basic {cred}".encode()))
    return flight.FlightCallOptions(headers=headers)


def fetch(uri: str, sql: str, user: str | None = None,
          password: str | None = None, token: str | None = None,
          session: str | None = None) -> pa.Table:
    """Run ``sql`` on the remote engine at ``uri``; return the Arrow
    result (one connection, one statement, streamed DoGet)."""
    import pyarrow.flight as flight

    client = flight.FlightClient(uri)
    try:
        opts = _options(user, password, token)
        sid = session
        if sid is None:
            results = list(client.do_action(
                flight.Action("create_session", b"{}"), options=opts))
            sid = json.loads(results[0].body.to_pybytes())["session"]
        desc = flight.FlightDescriptor.for_command(json.dumps(
            {"type": "statement_query", "session": sid,
             "sql": sql}).encode())
        info = client.get_flight_info(desc, options=opts)
        table = client.do_get(
            info.endpoints[0].ticket, options=opts).read_all()
        if session is None:
            list(client.do_action(
                flight.Action("close_session",
                              json.dumps({"session": sid}).encode()),
                options=opts))
        return table
    finally:
        client.close()


def list_remote_tables(uri: str, user: str | None = None,
                       password: str | None = None) -> list[str]:
    import pyarrow.flight as flight

    client = flight.FlightClient(uri)
    try:
        opts = _options(user, password, None)
        return sorted(
            f.descriptor.path[-1].decode()
            for f in client.list_flights(options=opts))
    finally:
        client.close()


def flight_scan_df(spark: SparkSession, uri: str, sql: str,
                   user: str | None = None,
                   password: str | None = None) -> DataFrame:
    """Remote query result as a DataFrame. The Arrow table converts
    zero-copy-ish via createDataFrame(pa.Table) (Spark 4 Arrow path);
    downstream operators run distributed as usual."""
    table = fetch(uri, sql, user=user, password=password)
    if table.num_rows == 0 and not table.schema.names:
        return spark.range(0)
    return spark.createDataFrame(table)


def flight_scan_distributed(spark: SparkSession, uri: str, sql: str,
                            user: str | None = None,
                            password: str | None = None,
                            partitions: int = 8) -> DataFrame:
    """Executor-parallel remote scan: the server splits the result
    into ``partitions`` endpoints; each Spark task opens its own
    DoGet and streams one slice — no driver-side materialization of
    the data, N sockets in parallel. This is how ADBC/Flight parallel
    readers scale a 100 TB pull; the single-endpoint
    ``flight_scan_df`` remains the small-result fast path."""
    import pyarrow.flight as flight

    client = flight.FlightClient(uri)
    try:
        opts = _options(user, password, None)
        results = list(client.do_action(
            flight.Action("create_session", b"{}"), options=opts))
        sid = json.loads(results[0].body.to_pybytes())["session"]
        desc = flight.FlightDescriptor.for_command(json.dumps(
            {"type": "statement_query", "session": sid, "sql": sql,
             "partitions": partitions}).encode())
        info = client.get_flight_info(desc, options=opts)
        tickets = [ep.ticket.ticket for ep in info.endpoints]
        arrow_schema = info.schema
        # partitioned results are materialized server-side; the
        # session is no longer needed to redeem tickets
        list(client.do_action(
            flight.Action("close_session",
                          json.dumps({"session": sid}).encode()),
            options=opts))
    finally:
        client.close()

    from pyspark.sql.pandas.types import from_arrow_schema

    schema = from_arrow_schema(arrow_schema)
    tdf = spark.createDataFrame(
        [(t,) for t in tickets], "ticket binary"
    ).repartition(len(tickets))

    def _read(batches):
        import pyarrow.flight as fl

        for pdf in batches:
            for tk in pdf["ticket"]:
                cl = fl.FlightClient(uri)
                try:
                    tbl = cl.do_get(
                        fl.Ticket(bytes(tk)),
                        options=_options(user, password, None),
                    ).read_all()
                finally:
                    cl.close()
                for batch in tbl.to_batches():
                    yield batch.to_pandas()

    return tdf.mapInPandas(_read, schema)


def exchange_transform(uri: str, data: pa.Table, sql: str,
                       view: str = "exchange_input",
                       user: str | None = None,
                       password: str | None = None) -> pa.Table:
    """One-RPC push-transform-pull (DoExchange): stream ``data`` to
    the remote engine as temp view ``view``, run ``sql`` against it,
    stream the result back. No managed-table write on the server —
    the ephemeral-enrichment path (e.g. score a local batch against
    remote reference tables)."""
    import pyarrow.flight as flight

    client = flight.FlightClient(uri)
    try:
        opts = _options(user, password, None)
        results = list(client.do_action(
            flight.Action("create_session", b"{}"), options=opts))
        sid = json.loads(results[0].body.to_pybytes())["session"]
        desc = flight.FlightDescriptor.for_command(json.dumps(
            {"type": "exchange_transform", "session": sid,
             "sql": sql, "view": view}).encode())
        writer, reader = client.do_exchange(desc, options=opts)
        try:
            writer.begin(data.schema)
            for batch in data.to_batches():
                writer.write_batch(batch)
            writer.done_writing()
            out = reader.read_all()
        finally:
            writer.close()
        list(client.do_action(
            flight.Action("close_session",
                          json.dumps({"session": sid}).encode()),
            options=opts))
        return out
    finally:
        client.close()
