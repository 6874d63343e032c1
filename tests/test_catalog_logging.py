"""Catalog logging tests (docs/catalog_logging.md analog): the
statement-log stream forked to an append-only queryable ``logs``
table behind a bounded queue + dedicated writer thread — admin-only
read via engine_logs(), newest-dropped-on-overflow accounting, and
the non-blocking producer guarantee."""

from __future__ import annotations

import pytest

from gizmosql_spark.catalog_logging import CatalogLogSink
from gizmosql_spark.engine import Engine
from gizmosql_spark.security import CommandDenied


@pytest.fixture()
def engine(spark):
    return Engine(spark=spark)


def test_logs_table_end_to_end(engine, spark, tmp_path):
    engine.enable_catalog_logging(path=str(tmp_path / "logs"))
    sid = engine.create_session(role="admin")
    engine.collect(sid, engine.execute_sql(sid, "SELECT 1 AS x"))
    engine.execute_sql(
        sid, "SELECT 2 AS y /* PASSWORD 'hunter2' */")

    rows = engine.collect(sid, engine.execute_sql(
        sid,
        "SELECT message, status FROM engine_logs() ORDER BY at"))
    msgs = [r["message"] for r in rows]
    assert any("SELECT 1 AS x" in m for m in msgs)
    # the fork carries the SAME redacted records as the ring
    assert any("[REDACTED]" in m for m in msgs)
    assert not any("hunter2" in m for m in msgs)
    assert all(r["status"] in ("ok", "error", "denied") for r in rows)

    # append-only retention: a later read sees strictly more records
    engine.collect(sid, engine.execute_sql(sid, "SELECT 2 AS y"))
    rows2 = engine.collect(sid, engine.execute_sql(
        sid, "SELECT count(*) AS n FROM engine_logs()"))
    assert rows2[0]["n"] > len(rows)
    engine.disable_catalog_logging()


def test_admin_only_read(engine, tmp_path):
    engine.enable_catalog_logging(path=str(tmp_path / "logs"))
    sid = engine.create_session(role="readonly")
    with pytest.raises(CommandDenied):
        engine.execute_sql(sid, "SELECT * FROM engine_logs()")
    engine.disable_catalog_logging()


def test_disabled_returns_empty(engine):
    sid = engine.create_session(role="admin")
    rows = engine.collect(sid, engine.execute_sql(
        sid, "SELECT count(*) AS n FROM engine_logs()"))
    assert rows[0]["n"] == 0


def test_overflow_drops_newest_and_counts(spark, tmp_path):
    # writer not started → the bounded queue must absorb or drop
    sink = CatalogLogSink(spark, str(tmp_path / "logs"),
                          queue_max=3, start=False)
    for i in range(10):
        sink.submit(float(i), "INFO", "s", f"m{i}", "ok", 0.0)
    assert sink.dropped == 7  # newest records dropped, counted
    # producer never blocked: all 10 submits returned already
    sink.start()
    assert sink.flush(timeout=30)
    rows = sink.logs_df().orderBy("at").collect()
    # the 3 queued (oldest) records landed; drops are the newest
    assert [r["message"] for r in rows] == ["m0", "m1", "m2"]
    sink.close()


def test_batch_atomic_appends(spark, tmp_path):
    sink = CatalogLogSink(spark, str(tmp_path / "logs"), start=False)
    for i in range(5):
        sink.submit(float(i), "INFO", "s", f"m{i}", "ok", 1.5)
    sink.start()
    assert sink.flush(timeout=30)
    df = sink.logs_df()
    assert df.count() == 5
    assert df.schema.simpleString().startswith(
        "struct<at:double,level:string,session_id:string")
    sink.close()
