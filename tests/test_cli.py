"""CLI shell tests (reference src/client analog): output modes,
dot-command surface, script/redirect handling, bail semantics, and the
Flight-backed connection — the client/server split the reference
ships."""

from __future__ import annotations

import io
import json

import pytest

from gizmosql_spark import cli
from gizmosql_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark=spark)


@pytest.fixture()
def shell(engine):
    sid = engine.create_session(role="admin")
    out = io.StringIO()
    sh = cli.Shell(cli.EngineConnection(engine, sid), stdout=out)
    yield sh, out
    engine.close_session(sid)


def _last(out: io.StringIO) -> str:
    return out.getvalue()


def test_output_modes(shell):
    sh, out = shell
    sql = "SELECT 1 AS a, 'x,y' AS b UNION ALL SELECT 2, NULL ORDER BY a"
    sh.execute(sql)
    table = _last(out)
    assert "a" in table and "|" in table and "(2 rows)" in table

    sh.cfg.mode = "csv"
    out.truncate(0); out.seek(0)
    sh.execute(sql)
    csv_text = _last(out).strip()
    assert csv_text.splitlines()[0] == "a,b"
    assert '"x,y"' in csv_text  # delimiter-safe quoting

    sh.cfg.mode = "json"
    out.truncate(0); out.seek(0)
    sh.execute(sql)
    data = json.loads(_last(out))
    assert data[0] == {"a": 1, "b": "x,y"}
    assert data[1]["b"] is None

    sh.cfg.mode = "jsonlines"
    out.truncate(0); out.seek(0)
    sh.execute(sql)
    lines = _last(out).strip().splitlines()
    assert json.loads(lines[1])["a"] == 2

    sh.cfg.mode = "markdown"
    out.truncate(0); out.seek(0)
    sh.execute(sql)
    md = _last(out)
    assert md.startswith("| a") and "|---" in md.replace(" ", "")

    sh.cfg.mode = "line"
    out.truncate(0); out.seek(0)
    sh.execute(sql)
    assert "a = 1" in _last(out)


def test_dot_commands_config(shell):
    sh, out = shell
    assert sh.dot(".mode csv") and sh.cfg.mode == "csv"
    assert sh.dot(".headers off") and sh.cfg.headers is False
    assert sh.dot(".maxrows 5") and sh.cfg.maxrows == 5
    assert sh.dot(".nullvalue ∅") and sh.cfg.nullvalue == "∅"
    assert sh.dot(".timer on") and sh.cfg.timer is True
    assert sh.dot(".prompt db>") and sh.cfg.prompt == "db> "
    assert sh.dot(".show")
    assert "mode: csv" in _last(out).replace("      ", " ")
    assert sh.dot(".help")
    assert ".export_last" in _last(out)
    assert not sh.dot(".quit")
    assert not sh.dot("\\q")  # legacy alias


def test_null_rendering_and_maxrows(shell):
    sh, out = shell
    sh.dot(".nullvalue <null>")
    sh.dot(".maxrows 2")
    sh.execute("SELECT CAST(NULL AS INT) AS v FROM range(5)")
    text = _last(out)
    assert "<null>" in text
    assert "(5 rows, 2 shown)" in text


def test_last_and_export_last(shell, tmp_path):
    sh, out = shell
    sh.execute("SELECT 3 AS z")
    target = str(tmp_path / "export.csv")
    sh.dot(f".export_last {target}")
    assert open(target).read().strip().splitlines() == ["z", "3"]
    out.truncate(0); out.seek(0)
    sh.dot(".last")
    assert "z" in _last(out)


def test_read_script_and_bail(shell, tmp_path):
    sh, out = shell
    script = tmp_path / "s.sql"
    script.write_text(
        "SELECT 1 AS first;\n"
        "SELECT * FROM nope_missing;\n"
        "SELECT 2 AS second;\n")
    sh.dot(f".read {script}")
    text = _last(out)
    assert "first" in text and "ERROR" in text and "second" in text
    # with .bail the script stops at the error
    out.truncate(0); out.seek(0)
    sh.dot(".bail on")
    sh.dot(f".read {script}")
    text = _last(out)
    assert "first" in text and "ERROR" in text and "second" not in text


def test_output_redirect_and_once(shell, tmp_path):
    sh, out = shell
    sticky = str(tmp_path / "out.txt")
    sh.dot(f".output {sticky}")
    sh.execute("SELECT 'redirected' AS r")
    sh.dot(".output")  # back to stdout
    sh.execute("SELECT 'onscreen' AS r")
    assert "redirected" in open(sticky).read()
    assert "redirected" not in _last(out)
    assert "onscreen" in _last(out)
    once = str(tmp_path / "once.txt")
    sh.dot(f".once {once}")
    sh.execute("SELECT 'one-shot' AS r")
    sh.execute("SELECT 'after' AS r")
    assert "one-shot" in open(once).read()
    assert "after" in _last(out)


def test_tables_schema_catalogs(shell):
    sh, out = shell
    sh.execute(
        "CREATE OR REPLACE TEMP VIEW t_cli_v AS SELECT CAST(1 AS BIGINT) AS n")
    sh.dot(".tables")
    assert "t_cli_v" in _last(out)
    out.truncate(0); out.seek(0)
    sh.dot(".schema t_cli_v")
    assert "bigint" in _last(out)
    out.truncate(0); out.seek(0)
    sh.dot(".catalogs")
    assert "spark_catalog" in _last(out)


def test_echo_and_unknown_command(shell):
    sh, out = shell
    sh.dot(".echo on")
    sh.execute("SELECT 9 AS e")
    assert "SELECT 9 AS e" in _last(out)
    sh.dot(".bogus")
    assert "unknown command" in _last(out)


def test_repl_loop_with_dot_commands(engine):
    sid = engine.create_session(role="admin")
    stdin = io.StringIO(
        ".mode csv\nSELECT 5 AS five;\n.tables\n.quit\n")
    stdout = io.StringIO()
    cli.repl(engine, sid, stdin=stdin, stdout=stdout)
    text = stdout.getvalue()
    assert "five\n5" in text.replace("\r", "")
    engine.close_session(sid)


def test_flight_connection_shell(spark):
    """The CLI as a true network client: Shell over FlightConnection
    against a loopback server (flight_connection.cpp role)."""
    from gizmosql_spark.flight_server import FlightEngineServer

    eng = Engine(spark=spark)
    eng.add_user("cli", "pw", role="admin")
    srv = FlightEngineServer(engine=eng, location="grpc://127.0.0.1:0")
    try:
        conn = cli.FlightConnection(
            f"grpc://127.0.0.1:{srv.port}", "cli", "pw")
        out = io.StringIO()
        sh = cli.Shell(conn, cli.ShellConfig(mode="csv"), stdout=out)
        sh.execute("SELECT 11 AS eleven")
        assert "eleven\n11" in out.getvalue()
        conn.close()
    finally:
        srv.shutdown()


def test_ops_listing(shell):
    sh, out = shell
    sh.dot(".ops dedup")
    listing = _last(out)
    assert "dedup_exact" in listing and "dedup_minhash_lsh" in listing
    out.truncate(0); out.seek(0)
    sh.dot(".ops nosuchfilter123")
    assert "no matching operators" in _last(out)
