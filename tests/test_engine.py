"""Service-layer tests: sessions, settings, dialect shim, security
gates, admission, prepared statements, ingest, health.

Mirrors the reference's per-feature integration test layout (SURVEY §5:
test_authentication / test_admin_command_guard / test_admission_controller
/ test_kill_session / test_read_only_mode / test_bulk_ingest ...).
"""

from __future__ import annotations

import threading
import time

import pytest

from gizmosql_spark import security
from gizmosql_spark.admission import AdmissionController, QueueFullError
from gizmosql_spark.dialect import (
    KillCommand,
    SetCommand,
    classify_command,
    extract_file_scans,
    replace_pseudo_functions,
)
from gizmosql_spark.engine import Engine, ServerDraining, SessionClosed
from gizmosql_spark.settings import SettingError, SettingsState


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture()
def session(engine):
    sid = engine.create_session(role="admin")
    yield sid
    engine.close_session(sid)


# --- dialect ----------------------------------------------------------


def test_classify_set():
    cmd = classify_command("SET engine.query_timeout = 5")
    assert isinstance(cmd, SetCommand)
    assert cmd.scope == "session" and cmd.name == "engine.query_timeout"
    cmd = classify_command("set global gizmosql.max_concurrent_statements TO 3;")
    assert isinstance(cmd, SetCommand)
    assert cmd.scope == "global"
    assert cmd.name == "engine.max_concurrent_statements"
    assert classify_command("SELECT 1") is None
    # plain Spark SET is not an engine command
    assert classify_command("SET spark.sql.shuffle.partitions=8") is None


def test_classify_kill():
    cmd = classify_command("KILL SESSION 'abc-123'")
    assert isinstance(cmd, KillCommand) and cmd.session_id == "abc-123"


def test_pseudo_function_replacement():
    out = replace_pseudo_functions(
        "SELECT ENGINE_VERSION(), gizmosql_user() AS u", {"version": "9.9", "user": "bob"}
    )
    assert "'9.9'" in out and "'bob'" in out
    # never rewrites inside string literals
    out = replace_pseudo_functions(
        "SELECT 'engine_version()' AS s", {"version": "9.9"}
    )
    assert out == "SELECT 'engine_version()' AS s"


def test_extract_file_scans():
    sql, scans = extract_file_scans(
        "SELECT * FROM read_parquet('/tmp/x.parquet') JOIN '/tmp/y.csv' ON 1=1"
    )
    assert len(scans) == 2
    assert scans[0][1] == "parquet" and scans[1][1] == "csv"
    assert "read_parquet" not in sql and "'/tmp/y.csv'" not in sql


# --- settings ---------------------------------------------------------


def test_settings_scope_and_validation():
    s = SettingsState()
    assert s.set("engine.query_timeout", "7", "session", is_admin=False) == 7
    with pytest.raises(SettingError):
        s.set("engine.query_timeout", "-1", "session", is_admin=False)
    with pytest.raises(SettingError):
        s.set("engine.max_concurrent_statements", "2", "global", is_admin=False)
    with pytest.raises(SettingError):
        s.set("engine.nope", "1", "session", is_admin=True)


# --- security gates ---------------------------------------------------


def test_admin_gate_blocks_non_admin():
    with pytest.raises(security.CommandDenied):
        security.check_admin_gate("ATTACH '/tmp/x.db' AS x", is_admin=False)
    with pytest.raises(security.CommandDenied):
        security.check_admin_gate("SELECT * FROM read_csv('/etc/passwd')", is_admin=False)
    with pytest.raises(security.CommandDenied):
        security.check_admin_gate("COPY t TO '/tmp/out.csv'", is_admin=False)
    # remote schemes pass (proven-remote rule)
    security.check_admin_gate("SELECT * FROM read_parquet('s3://b/x.parquet')", False)
    # admin passes everything
    security.check_admin_gate("ATTACH '/tmp/x.db' AS x", is_admin=True)


def test_readonly_blocks_writes():
    with pytest.raises(security.CommandDenied):
        security.check_readonly("INSERT INTO t VALUES (1)", "readonly")
    with pytest.raises(security.CommandDenied):
        security.check_readonly("DROP TABLE t", "readonly")
    security.check_readonly("SELECT 1", "readonly")
    security.check_readonly("CREATE TEMP VIEW v AS SELECT 1", "readonly")
    security.check_readonly("INSERT INTO t VALUES (1)", "user")


# --- admission --------------------------------------------------------


def test_admission_fifo_cap():
    ac = AdmissionController(max_concurrent=1, max_queued=1)
    ac.acquire()
    order = []

    def waiter():
        ac.acquire()
        order.append("second")
        ac.release()

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.1)
    with pytest.raises(QueueFullError):
        ac.acquire()  # queue already holds the waiter
    ac.release()
    t.join(5)
    assert order == ["second"]


# --- engine lifecycle -------------------------------------------------


def test_engine_query_roundtrip(engine, session, sf_smoke):
    res = engine.execute_sql(
        session, f"SELECT count(*) AS n FROM parquet.`{sf_smoke}/nation.parquet`"
    )
    assert res.kind == "query"
    assert res.df.schema.fieldNames() == ["n"]  # schema without execution
    rows = engine.collect(session, res)
    assert rows[0]["n"] == 25


def test_engine_set_and_settings_view(engine, session):
    res = engine.execute_sql(session, "SET engine.query_timeout = 30")
    assert res.kind == "set"
    res = engine.execute_sql(session, "SELECT * FROM engine_settings() WHERE name = 'engine.query_timeout'")
    rows = engine.collect(session, res)
    assert rows[0]["value"] == "30"


def test_engine_pseudo_functions(engine, session):
    res = engine.execute_sql(session, "SELECT ENGINE_CURRENT_SESSION() AS sid")
    rows = engine.collect(session, res)
    assert rows[0]["sid"] == session


def test_engine_file_scan_rewrite(engine, session, sf_smoke):
    res = engine.execute_sql(
        session, f"SELECT count(*) AS n FROM read_parquet('{sf_smoke}/region.parquet')"
    )
    assert engine.collect(session, res)[0]["n"] == 5


def test_prepared_statement_roundtrip(engine, session, sf_smoke):
    ps = engine.prepare(
        session,
        f"SELECT n_name FROM parquet.`{sf_smoke}/nation.parquet` "
        "WHERE n_nationkey = :key ORDER BY n_name",
    )
    assert ps.parameter_names == ["key"]
    res = engine.execute_prepared(session, ps.handle, {"key": 3})
    rows = engine.collect(session, res)
    assert rows[0]["n_name"] == "NATION_3"
    engine.close_prepared(session, ps.handle)
    with pytest.raises(KeyError):
        engine.execute_prepared(session, ps.handle, {"key": 3})


def test_prepared_positional_with_colon_in_literal(engine, session, sf_smoke):
    # a ':word' inside a string literal (or comment) must not flip a
    # positional `?` query into named-parameter mode — the scan runs
    # over literal/comment-masked SQL (ADVICE r5)
    ps = engine.prepare(
        session,
        f"SELECT n_name FROM parquet.`{sf_smoke}/nation.parquet` "
        "WHERE n_name != 'a:b' -- :note\n AND n_nationkey = ?",
    )
    assert ps.positional and ps.parameter_names == ["param_1"]
    res = engine.execute_prepared(session, ps.handle, [3])
    assert engine.collect(session, res)[0]["n_name"] == "NATION_3"
    engine.close_prepared(session, ps.handle)


def test_prepared_cast_not_named_param(engine, session, sf_smoke):
    # DuckDB-style `::type` casts must not register as :type params
    ps = engine.prepare(
        session,
        f"SELECT n_nationkey::STRING AS k "
        f"FROM parquet.`{sf_smoke}/nation.parquet` ORDER BY n_nationkey",
    )
    assert ps.parameter_names == [] and not ps.positional
    engine.close_prepared(session, ps.handle)


def test_session_isolation_temp_views(engine, spark, sf_smoke):
    s1 = engine.create_session()
    s2 = engine.create_session()
    engine.execute_sql(s1, "CREATE TEMP VIEW iso_check AS SELECT 1 AS x")
    r1 = engine.execute_sql(s1, "SELECT * FROM iso_check")
    assert engine.collect(s1, r1)[0]["x"] == 1
    with pytest.raises(Exception):
        engine.execute_sql(s2, "SELECT * FROM iso_check").df.collect()
    engine.close_session(s1)
    engine.close_session(s2)


def test_kill_session_requires_admin(engine):
    victim = engine.create_session()
    user = engine.create_session(role="user")
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(user, f"KILL SESSION '{victim}'")
    admin = engine.create_session(role="admin")
    res = engine.execute_sql(admin, f"KILL SESSION '{victim}'")
    assert res.info["killed"] == "true"
    with pytest.raises(SessionClosed):
        engine.execute_sql(victim, "SELECT 1")
    # idempotent
    res = engine.execute_sql(admin, f"KILL SESSION '{victim}'")
    assert res.info["killed"] == "false"
    engine.close_session(user)
    engine.close_session(admin)


def test_readonly_session_rejects_writes(engine):
    ro = engine.create_session(role="readonly")
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(ro, "CREATE TABLE t_nope AS SELECT 1 AS x")
    engine.close_session(ro)


def test_ingest_modes(engine, session, spark):
    import pandas as pd

    spark.sql("DROP TABLE IF EXISTS ingest_t")
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    assert engine.ingest(session, "ingest_t", df, mode="create") == 3
    # append aligns by name even with reordered columns
    df2 = pd.DataFrame({"b": ["w"], "a": [4]})
    assert engine.ingest(session, "ingest_t", df2, mode="append") == 1
    rows = engine.collect(session, engine.execute_sql(session, "SELECT * FROM ingest_t ORDER BY a"))
    assert [r["a"] for r in rows] == [1, 2, 3, 4]
    assert rows[-1]["b"] == "w"
    assert engine.ingest(session, "ingest_t", df, mode="replace") == 3
    with pytest.raises(Exception):
        engine.ingest(session, "ingest_t", df, mode="create")
    spark.sql("DROP TABLE IF EXISTS ingest_t")


def test_drain_rejects_new_work(spark):
    eng = Engine(spark)
    sid = eng.create_session()
    eng.begin_drain()
    with pytest.raises(ServerDraining):
        eng.execute_sql(sid, "SELECT 1")
    with pytest.raises(ServerDraining):
        eng.create_session()


def test_health_check(engine):
    assert engine.health_check() is True


def test_session_options(engine, session):
    opts = engine.get_session_options(session)
    assert opts["catalog"] == "spark_catalog"
    assert opts["schema"] == "default"


# --- transactions / script / cancel / DML counts ----------------------


def test_split_statements():
    from gizmosql_spark.dialect import split_statements

    stmts = split_statements(
        "CREATE TEMP VIEW v AS SELECT 1; -- a comment; with semicolon\n"
        "SELECT 'a;b' AS s;\nSELECT 2"
    )
    assert len(stmts) == 3
    assert stmts[1] == "SELECT 'a;b' AS s"


def test_classify_txn():
    from gizmosql_spark.dialect import TxnCommand, classify_command

    for sql, action in [
        ("BEGIN", "begin"),
        ("begin transaction;", "begin"),
        ("START TRANSACTION", "begin"),
        ("COMMIT", "commit"),
        ("ROLLBACK;", "rollback"),
        ("ABORT", "rollback"),
    ]:
        cmd = classify_command(sql)
        assert isinstance(cmd, TxnCommand) and cmd.action == action
    assert classify_command("BEGIN WORK NOW") is None


def test_dml_target():
    from gizmosql_spark.dialect import dml_target

    assert dml_target("INSERT INTO t SELECT 1") == "t"
    assert dml_target("insert overwrite table db.t values (1)") == "db.t"
    assert dml_target("DELETE FROM t WHERE x = 1") == "t"
    assert dml_target("UPDATE t SET x = 2") == "t"
    assert dml_target("SELECT * FROM t") is None


def test_transaction_rollback_restores_table(engine, session, spark):
    spark.sql("DROP TABLE IF EXISTS txn_demo")
    engine.execute_sql(session, "CREATE TABLE txn_demo AS SELECT 1 AS x")
    try:
        engine.execute_sql(session, "BEGIN")
        r = engine.execute_sql(session, "INSERT INTO txn_demo VALUES (2)")
        assert r.kind == "update" and r.affected_rows == 1
        assert spark.table("txn_demo").count() == 2
        engine.execute_sql(session, "ROLLBACK")
        assert spark.table("txn_demo").count() == 1
        # committed txn keeps the write and clears the backup
        engine.execute_sql(session, "BEGIN")
        engine.execute_sql(session, "INSERT INTO txn_demo VALUES (3)")
        engine.execute_sql(session, "COMMIT")
        assert spark.table("txn_demo").count() == 2
        assert not [
            t for t in spark.catalog.listTables() if "__txn_" in t.name
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS txn_demo")


def test_transaction_rollback_drops_created_table(engine, session, spark):
    spark.sql("DROP TABLE IF EXISTS txn_new")
    sid = session
    engine.execute_sql(sid, "BEGIN")
    engine.ingest(sid, "txn_new", spark.range(3).toDF("x"), mode="create")
    assert spark.catalog.tableExists("txn_new")
    engine.execute_sql(sid, "ROLLBACK")
    assert not spark.catalog.tableExists("txn_new")


def test_nested_transaction_rejected(engine, session):
    engine.execute_sql(session, "BEGIN")
    with pytest.raises(RuntimeError):
        engine.begin_transaction(session)
    engine.execute_sql(session, "ROLLBACK")
    with pytest.raises(RuntimeError):
        engine.end_transaction(session, commit=True)


def test_execute_script(engine, session):
    results = engine.execute_script(
        session,
        "SET engine.query_timeout = 9; SELECT 1 AS one; SELECT 2 AS two",
    )
    assert [r.kind for r in results] == ["set", "query", "query"]
    assert results[1].df.collect()[0].one == 1


def test_cancel_noop_on_idle_session(engine, session):
    engine.cancel(session)  # no in-flight statement: must not raise


# --- system catalog / query log / BY NAME -----------------------------


def test_insert_by_name_native(engine, session, spark):
    """INSERT INTO ... BY NAME (duckdb_server.cpp:1956-1957) is native
    Spark SQL; pin the column-alignment contract."""
    spark.sql("DROP TABLE IF EXISTS byname_t")
    try:
        engine.execute_sql(session, "CREATE TABLE byname_t (a INT, b STRING)")
        r = engine.execute_sql(
            session, "INSERT INTO byname_t BY NAME SELECT 'x' AS b, 1 AS a"
        )
        assert r.affected_rows == 1
        assert spark.table("byname_t").collect()[0].a == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS byname_t")


def test_system_catalog_views(engine, session, spark):
    from gizmosql_spark.constraints import tpch_constraints

    engine.system_catalog.registry = tpch_constraints()
    engine.execute_sql(
        session, "CREATE OR REPLACE TEMP VIEW syscat_v AS SELECT 1 AS x"
    )
    engine.refresh_system_views()
    idx = spark.table("global_temp.engine_index_info")
    assert idx.filter("table_name = 'lineitem'").count() >= 2  # composite pk
    vd = spark.table("global_temp.engine_view_definition")
    row = vd.filter("view_name = 'syscat_v'").collect()
    assert len(row) == 1 and "SELECT 1" in row[0].view_definition


def test_system_catalog_readonly(engine, session):
    with pytest.raises(PermissionError):
        engine.execute_sql(
            session, "DROP VIEW global_temp.engine_index_info"
        )


def test_query_log_redaction(engine, session):
    try:
        engine.execute_sql(
            session,
            "CREATE OR REPLACE TEMP VIEW ql_v AS SELECT 'SECRET ''hunter2''' AS c",
        )
    except Exception:
        pass
    engine.execute_sql(session, "SELECT 1 AS ok_col")
    entries = engine.query_log.entries()
    assert entries[-1].status == "ok" and "SELECT 1" in entries[-1].sql
    user_sid = engine.create_session(role="user")
    try:
        with pytest.raises(security.CommandDenied):
            engine.execute_sql(user_sid, "ATTACH 'x.db' AS other")
        assert engine.query_log.entries()[-1].status == "denied"
    finally:
        engine.close_session(user_sid)


def test_redact_sql():
    from gizmosql_spark.querylog import redact_sql_for_logs

    out = redact_sql_for_logs(
        "CREATE SECRET s (TYPE S3, KEY_ID 'AKIA123', SECRET 'shh',"
        " PASSWORD 'pw'); COPY t TO 's3://u:topsecret@b/x'"
    )
    assert "AKIA123" not in out and "shh" not in out and "pw" not in out
    assert "topsecret" not in out
    assert "[REDACTED]" in out


def test_create_drop_index(engine, session, spark):
    """CREATE INDEX maps to engine metadata (Spark has no secondary
    indexes; reference test_v1_22_features.py:52-54)."""
    r = engine.execute_sql(
        session, "CREATE INDEX idx_t ON orders (o_orderdate, o_custkey)"
    )
    assert r.kind == "update" and r.info["index"] == "idx_t"
    assert engine.system_catalog.registry.indexes["orders"]["idx_t"] == (
        "o_orderdate",
        "o_custkey",
    )
    engine.execute_sql(session, "DROP INDEX idx_t")
    assert "idx_t" not in engine.system_catalog.registry.indexes.get("orders", {})


def test_readonly_cannot_create_index(engine):
    sid = engine.create_session(role="readonly")
    try:
        with pytest.raises(security.CommandDenied):
            engine.execute_sql(sid, "CREATE INDEX i ON t (c)")
    finally:
        engine.close_session(sid)


def test_query_profile_capture(engine, session):
    engine.execute_sql(session, "SET engine.capture_query_profile = true")
    res = engine.execute_sql(session, "SELECT 1 AS one")
    engine.collect(session, res)
    prof = engine.last_profile(session)
    assert prof is not None
    assert "Physical Plan" in prof["plan"]
    engine.execute_sql(session, "SET engine.capture_query_profile = false")


def test_cli_run_statement_and_repl(engine, session):
    """CLI shell (reference src/client analog): statement rendering,
    meta commands, REPL loop over an in-process engine."""
    import io

    from gizmosql_spark import cli

    out = cli.run_statement(engine, session, "SELECT 1 AS a, 'x' AS b")
    assert "a" in out and "x" in out and "(1 rows)" in out
    out = cli.run_statement(engine, session, "SET engine.query_timeout = 5")
    assert "engine.query_timeout=5" in out
    stdin = io.StringIO("SELECT 2 AS two;\n\\q\n")
    stdout = io.StringIO()
    cli.repl(engine, session, stdin=stdin, stdout=stdout)
    assert "two" in stdout.getvalue()


def test_query_log_table_function(engine, session):
    engine.execute_sql(session, "SELECT 42 AS marker_q")
    res = engine.execute_sql(
        session,
        "SELECT status, sql FROM engine_query_log() WHERE sql LIKE '%marker_q%'",
    )
    rows = engine.collect(session, res)
    assert any(r["status"] == "ok" for r in rows)


def test_query_log_redaction_in_view(engine, session):
    try:
        engine.execute_sql(
            session, "SELECT 'x' AS c /* PASSWORD 'hunter2' */"
        )
    except Exception:
        pass
    res = engine.execute_sql(
        session, "SELECT sql FROM engine_query_log() WHERE sql LIKE '%PASSWORD%'"
    )
    for r in engine.collect(session, res):
        assert "hunter2" not in r["sql"]


def test_health_monitor(engine):
    import time as _t

    engine.start_health_monitor(interval_seconds=0.5)
    deadline = _t.time() + 15
    while _t.time() < deadline and not engine.health_status()["healthy"]:
        _t.sleep(0.2)
    status = engine.health_status()
    engine.stop_health_monitor()
    assert status["healthy"] and not status["stale"]


def test_update_delete_on_managed_parquet(engine):
    """UPDATE/DELETE emulation (copy-on-write) on managed parquet
    tables — reference parity via DuckDB's native DML."""
    sid = engine.create_session(role="admin")
    try:
        engine.execute_sql(sid, "DROP TABLE IF EXISTS t_dml_emul")
        engine.execute_sql(
            sid,
            "CREATE TABLE t_dml_emul AS "
            "SELECT id, CAST(id * 10 AS DOUBLE) AS v FROM range(10)",
        )
        res = engine.execute_sql(
            sid, "UPDATE t_dml_emul SET v = v + 1 WHERE id >= 7"
        )
        assert res.affected_rows == 3
        rows = {
            r["id"]: r["v"]
            for r in engine.collect(
                sid, engine.execute_sql(sid, "SELECT * FROM t_dml_emul")
            )
        }
        assert rows[7] == 71.0 and rows[0] == 0.0
        res = engine.execute_sql(sid, "DELETE FROM t_dml_emul WHERE id < 5")
        assert res.affected_rows == 5
        res = engine.execute_sql(
            sid, "SELECT count(*) AS n FROM t_dml_emul"
        )
        assert engine.collect(sid, res)[0]["n"] == 5
        # multi-assignment update, no WHERE (all rows)
        res = engine.execute_sql(
            sid, "UPDATE t_dml_emul SET v = 0, id = id + 100"
        )
        assert res.affected_rows == 5
        res = engine.execute_sql(
            sid, "SELECT min(id) AS mn, sum(v) AS sv FROM t_dml_emul"
        )
        row = engine.collect(sid, res)[0]
        assert row["mn"] == 105 and row["sv"] == 0.0
        engine.execute_sql(sid, "DROP TABLE t_dml_emul")
    finally:
        engine.close_session(sid)


def test_update_rolls_back_in_transaction(engine):
    sid = engine.create_session(role="admin")
    try:
        engine.execute_sql(sid, "DROP TABLE IF EXISTS t_dml_txn")
        engine.execute_sql(
            sid, "CREATE TABLE t_dml_txn AS SELECT id FROM range(4)"
        )
        engine.execute_sql(sid, "BEGIN")
        engine.execute_sql(sid, "DELETE FROM t_dml_txn WHERE id > 0")
        engine.execute_sql(sid, "ROLLBACK")
        res = engine.execute_sql(sid, "SELECT count(*) AS n FROM t_dml_txn")
        assert engine.collect(sid, res)[0]["n"] == 4
        engine.execute_sql(sid, "DROP TABLE t_dml_txn")
    finally:
        engine.close_session(sid)


def test_merge_into_upsert(engine):
    """MERGE INTO emulation: matched rows update, unmatched insert."""
    sid = engine.create_session(role="admin")
    try:
        engine.execute_sql(sid, "DROP TABLE IF EXISTS t_merge_tgt")
        engine.execute_sql(
            sid,
            "CREATE TABLE t_merge_tgt AS "
            "SELECT id, CAST(id AS DOUBLE) AS v FROM range(5)",
        )
        res = engine.execute_sql(
            sid,
            "MERGE INTO t_merge_tgt t USING "
            "(SELECT id * 2 AS id, 99.0 AS v FROM range(4)) s "
            "ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)",
        )
        # matches: s.id in {0,2,4,6} ∩ t.id {0..4} = {0,2,4} → 3 updates
        # unmatched source: {6} → 1 insert
        assert res.affected_rows == 4
        rows = {
            r["id"]: r["v"]
            for r in engine.collect(
                sid, engine.execute_sql(sid, "SELECT * FROM t_merge_tgt")
            )
        }
        assert rows[0] == 99.0 and rows[2] == 99.0 and rows[6] == 99.0
        assert rows[1] == 1.0 and len(rows) == 6
        engine.execute_sql(sid, "DROP TABLE t_merge_tgt")
    finally:
        engine.close_session(sid)


def test_qualify_rewrite(engine, session, sf_smoke):
    """DuckDB QUALIFY dialect-ism runs through the engine (rewritten
    to a windowed subquery + filter)."""
    res = engine.execute_sql(
        session,
        f"""
        SELECT o_orderpriority, o_orderkey, o_totalprice
        FROM read_parquet('{sf_smoke}/orders.parquet')
        QUALIFY row_number() OVER (
            PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey) <= 2
        ORDER BY o_orderpriority, o_totalprice DESC
        """,
    )
    rows = engine.collect(session, res)
    assert len(rows) == 10  # 5 priorities x top-2
    prios = [r["o_orderpriority"] for r in rows]
    assert prios == sorted(prios)
    assert set(res.df.columns) == {"o_orderpriority", "o_orderkey", "o_totalprice"}


def test_exclude_rewrite(engine, session, sf_smoke):
    res = engine.execute_sql(
        session,
        f"SELECT * EXCLUDE (r_name) FROM read_parquet('{sf_smoke}/region.parquet')",
    )
    rows = engine.collect(session, res)
    assert len(rows) == 5
    assert set(res.df.columns) == {"r_regionkey"}
    res = engine.execute_sql(
        session,
        f"SELECT * EXCLUDE r_name FROM read_parquet('{sf_smoke}/region.parquet')",
    )
    assert set(res.df.columns) == {"r_regionkey"}


def test_distinct_on_rewrite(engine, session, sf_smoke):
    """DuckDB/Postgres DISTINCT ON dialect-ism: one row per key,
    picked by the ORDER BY."""
    res = engine.execute_sql(
        session,
        f"""
        SELECT DISTINCT ON (o_orderpriority) o_orderpriority, o_orderkey, o_totalprice
        FROM read_parquet('{sf_smoke}/orders.parquet')
        ORDER BY o_orderpriority, o_totalprice DESC
        """,
    )
    rows = engine.collect(session, res)
    assert len(rows) == 5  # one per priority
    assert set(res.df.columns) == {"o_orderpriority", "o_orderkey", "o_totalprice"}
    # each row carries its priority's max total price
    import duckdb

    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT o_orderpriority, max(o_totalprice) FROM "
            f"read_parquet('{sf_smoke}/orders.parquet') GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        assert abs(r["o_totalprice"] - want[r["o_orderpriority"]]) < 1e-9


def test_instrumentation_pseudo_functions(engine, session):
    res = engine.execute_sql(
        session,
        "SELECT ENGINE_INSTRUMENTATION_ENABLED() AS en,"
        " GIZMOSQL_INSTRUMENTATION_CATALOG() AS cat",
    )
    row = engine.collect(session, res)[0]
    assert row["en"] in ("true", "false")
    assert row["cat"] == "spark_catalog"


class TestSummarizePragma:
    """SUMMARIZE + client-compat PRAGMAs (DuckDB statement classes the
    reference serves by pass-through; admin_command_guard.cpp:372)."""

    def test_summarize_table(self, engine, session):
        eng, sid = engine, session
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_summ")
        eng.execute_sql(
            sid, "CREATE TABLE t_summ AS"
                 " SELECT id, CAST(id * 2.5 AS DOUBLE) AS v FROM range(40)")
        rows = {r["column_name"]: r for r in eng.collect(
            sid, eng.execute_sql(sid, "SUMMARIZE t_summ"))}
        assert rows["id"]["count"] == 40
        assert rows["id"]["min"] == "0" and rows["id"]["max"] == "39"
        assert rows["v"]["null_percentage"] == 0.0
        assert float(rows["v"]["avg"]) == 48.75
        eng.execute_sql(sid, "DROP TABLE t_summ")

    def test_summarize_query(self, engine, session):
        rows = engine.collect(session, engine.execute_sql(
            session, "SUMMARIZE SELECT id FROM range(7)"))
        assert rows[0]["count"] == 7

    def test_explain_analyze_runs_and_reports(self, engine, session):
        rows = engine.collect(session, engine.execute_sql(
            session,
            "EXPLAIN ANALYZE SELECT id % 3 AS k, count(*) AS n"
            " FROM range(100) GROUP BY k"))
        text = rows[0]["explain_analyze"]
        assert "rows: 3" in text
        assert "elapsed_sec:" in text
        # the AQE-finalized physical plan is included
        assert "HashAggregate" in text or "Physical Plan" in text

    def test_explain_analyze_rejects_dml(self, engine, session):
        engine.execute_sql(session, "DROP TABLE IF EXISTS t_ea")
        engine.execute_sql(
            session, "CREATE TABLE t_ea AS SELECT id FROM range(3)")
        with pytest.raises(Exception, match="query statements only"):
            engine.execute_sql(
                session, "EXPLAIN ANALYZE UPDATE t_ea SET id = 0")
        engine.execute_sql(session, "DROP TABLE t_ea")

    def test_pragma_version_and_tables(self, engine, session):
        eng, sid = engine, session
        v = eng.collect(sid, eng.execute_sql(sid, "PRAGMA version"))[0]
        assert v["library_version"].startswith("spark-")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_pragma")
        eng.execute_sql(
            sid, "CREATE TABLE t_pragma AS SELECT id FROM range(3)")
        names = [r["name"] for r in eng.collect(
            sid, eng.execute_sql(sid, "PRAGMA show_tables"))]
        assert "t_pragma" in names
        info = eng.collect(sid, eng.execute_sql(
            sid, "PRAGMA table_info('t_pragma')"))
        assert [(r["cid"], r["name"], r["type"]) for r in info] == [
            (0, "id", "bigint")]
        eng.execute_sql(sid, "DROP TABLE t_pragma")

    def test_pragma_unknown_fails_closed(self, engine, session):
        import pytest as _pytest

        with _pytest.raises(Exception):
            engine.execute_sql(session, "PRAGMA wal_autocheckpoint")


class TestPipelineOpTableFunction:
    """pipeline_op('<name>', '<dir>'): every registered operator
    callable from SQL over the engine (and hence the Flight wire) —
    the SQL surface for the extension tier."""

    def test_select_from_pipeline_op(self, engine, session):
        res = engine.execute_sql(
            session,
            "SELECT * FROM pipeline_op('token_count',"
            " '/root/testdata/sf0.001') LIMIT 5",
        )
        rows = engine.collect(session, res)
        assert 0 < len(rows) <= 5

    def test_pipeline_op_composes_with_sql(self, engine, session):
        res = engine.execute_sql(
            session,
            "SELECT count(*) AS n FROM pipeline_op('dataset_split',"
            " '/root/testdata/sf0.001') WHERE n_docs > 0",
        )
        rows = engine.collect(session, res)
        assert rows[0]["n"] >= 1

    def test_unknown_operator_rejected(self, engine, session):
        with pytest.raises(Exception, match="unknown pipeline operator"):
            engine.execute_sql(
                session,
                "SELECT * FROM pipeline_op('no_such_op',"
                " '/root/testdata/sf0.001')",
            )

    def test_non_admin_local_dir_denied(self, engine):
        sid = engine.create_session(role="user")
        try:
            with pytest.raises(security.CommandDenied):
                engine.execute_sql(
                    sid,
                    "SELECT * FROM pipeline_op('token_count',"
                    " '/root/testdata/sf0.001')",
                )
        finally:
            engine.close_session(sid)

    def test_default_data_dir_setting(self, engine, session):
        engine.execute_sql(
            session,
            "SET engine.pipeline_data_dir = '/root/testdata/sf0.001'",
        )
        res = engine.execute_sql(
            session, "SELECT * FROM pipeline_op('dataset_split')")
        rows = engine.collect(session, res)
        assert len(rows) >= 1
        engine.execute_sql(session, "SET engine.pipeline_data_dir = ''")
        with pytest.raises(Exception, match="pipeline_data_dir"):
            engine.execute_sql(
                session, "SELECT * FROM pipeline_op('dataset_split')")
