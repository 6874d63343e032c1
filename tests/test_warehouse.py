"""Persistent warehouse catalog tests (warehouse.py — the
DuckLake/ATTACH analog): manifest record/forget, stale-directory
cleanup, bucketed re-attach DDL, and a real cross-process restart
(child interpreter ingests; this process re-attaches and reads)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from gizmosql_spark.engine import Engine
from gizmosql_spark.warehouse import WarehouseCatalog, warehouse_dir


def test_record_and_forget(spark):
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(
        sid, "CREATE TABLE t_wh_rec AS SELECT 1 AS a, 'x' AS b")
    entry = eng.warehouse.tables().get("t_wh_rec")
    assert entry is not None
    assert entry["format"] == "parquet"
    assert "`a` int" in entry["schema"] or "`a` bigint" in entry["schema"]
    assert os.path.isdir(entry["location"])
    eng.execute_sql(sid, "DROP TABLE t_wh_rec")
    assert "t_wh_rec" not in eng.warehouse.tables()
    eng.close_session(sid)


def test_temp_views_not_recorded(spark):
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(
        sid, "CREATE OR REPLACE TEMP VIEW t_wh_tv AS SELECT 1 AS a")
    assert "t_wh_tv" not in eng.warehouse.tables()
    eng.close_session(sid)


def test_prepare_write_clears_stale_dir(spark):
    """A warehouse dir with neither catalog nor manifest entry is a
    crash leftover; prepare_write removes it so saveAsTable works."""
    wh = WarehouseCatalog(spark)
    stale = os.path.join(wh.dir, "t_wh_stale")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("x")
    assert not spark.catalog.tableExists("t_wh_stale")
    wh.prepare_write(spark, "t_wh_stale")
    assert not os.path.exists(stale)
    # and the write now succeeds
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    n = eng.ingest(sid, "t_wh_stale", spark.range(3).toDF("id"),
                   mode="create")
    assert n == 3
    eng.execute_sql(sid, "DROP TABLE t_wh_stale")
    eng.close_session(sid)


def test_manifest_entry_with_missing_files_pruned(spark):
    wh = WarehouseCatalog(spark)
    with wh._lock:
        tables = wh._load()
        tables["t_wh_ghost"] = {
            "schema": "`a` int", "location": "/nonexistent/path/x",
            "format": "parquet"}
        wh._save(tables)
    wh.reattach_all(spark)
    assert "t_wh_ghost" not in wh.tables()


def test_cross_process_restart_reattaches(spark):
    """The restart gate: a CHILD interpreter (own JVM, fresh in-memory
    catalog) ingests a table through its own Engine; THIS process
    builds a new Engine and must see the table again without any
    per-query special-casing."""
    wh = warehouse_dir(spark)
    child = f"""
import sys
sys.path.insert(0, {os.getcwd()!r})
from gizmosql_spark.session import get_spark
from gizmosql_spark.engine import Engine
spark = get_spark("wh-child")
eng = Engine(spark=spark)
sid = eng.create_session(role="admin")
eng.execute_sql(sid, "DROP TABLE IF EXISTS t_wh_restart")
n = eng.ingest(sid, "t_wh_restart",
               spark.sql("SELECT id, id * 2 AS dbl FROM range(5)"),
               mode="replace")
assert n == 5, n
print("CHILD_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_WAREHOUSE": wh},
        cwd=os.getcwd())
    assert "CHILD_OK" in proc.stdout, proc.stderr[-2000:]
    # fresh catalog in this process for the table (the shared test
    # session never saw the child's saveAsTable)
    spark.sql("DROP TABLE IF EXISTS t_wh_restart")
    manifest = WarehouseCatalog(spark).tables()
    assert "t_wh_restart" in manifest, manifest.keys()
    eng = Engine(spark=spark)  # __init__ runs reattach_all
    rows = eng.spark.sql(
        "SELECT sum(dbl) AS s, count(*) AS n FROM t_wh_restart").collect()[0]
    assert (rows["s"], rows["n"]) == (20, 5)
    sid = eng.create_session(role="admin")
    eng.execute_sql(sid, "DROP TABLE t_wh_restart")
    eng.close_session(sid)


def test_replace_over_reattached_external_table(spark):
    """ingest replace over a table that was re-attached as EXTERNAL
    (post-restart) must rewrite it cleanly: saveAsTable(overwrite)
    drops external tables without deleting files, which otherwise
    collides with the managed replacement at the same location."""
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    spark.sql("DROP TABLE IF EXISTS t_wh_ext")
    n = eng.ingest(sid, "t_wh_ext", spark.range(4).toDF("id"),
                   mode="create")
    assert n == 4
    entry = eng.warehouse.tables()["t_wh_ext"]
    # simulate the restart: drop catalog entry only, re-attach external
    spark.sql("DROP TABLE t_wh_ext")  # managed drop deletes files...
    import os

    os.makedirs(entry["location"], exist_ok=True)
    spark.range(4).toDF("id").write.mode("overwrite").parquet(
        entry["location"])
    spark.sql(
        f"CREATE TABLE t_wh_ext (`id` bigint) USING parquet"
        f" LOCATION '{entry['location']}'")
    d = {r["col_name"].strip(): (r["data_type"] or "").strip()
         for r in spark.sql("DESCRIBE FORMATTED t_wh_ext").collect()
         if r["col_name"]}
    assert d.get("Type", "").upper() == "EXTERNAL"
    # replace must succeed and leave a readable table
    n2 = eng.ingest(sid, "t_wh_ext",
                    spark.sql("SELECT id * 10 AS id FROM range(3)"),
                    mode="replace")
    assert n2 == 3
    got = sorted(r["id"] for r in spark.table("t_wh_ext").collect())
    assert got == [0, 10, 20]
    eng.execute_sql(sid, "DROP TABLE t_wh_ext")
    eng.close_session(sid)


class TestTimeTravel:
    """Snapshot-on-destructive-write + VERSION AS OF (the DuckLake
    AT (VERSION => n) analog; local archives copy files — a lakehouse
    deployment keeps immutable files and snapshots manifest pointers)."""

    def test_version_as_of_reads_pre_images(self, spark):
        from gizmosql_spark.engine import Engine

        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_travel")
        eng.execute_sql(
            sid, "CREATE TABLE t_travel AS"
                 " SELECT id, id * 10 AS qty FROM range(5)")
        eng.execute_sql(sid, "UPDATE t_travel SET qty = 999 WHERE id = 2")
        eng.execute_sql(sid, "DELETE FROM t_travel WHERE id = 4")

        v1 = {(r["id"], r["qty"]) for r in eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_travel VERSION AS OF 1"))}
        assert v1 == {(i, i * 10) for i in range(5)}
        v2 = {(r["id"], r["qty"]) for r in eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_travel VERSION AS OF 2"))}
        assert (2, 999) in v2 and (4, 40) in v2
        cur = {(r["id"], r["qty"]) for r in eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_travel"))}
        assert (4, 40) not in cur and (2, 999) in cur
        # history pragma lists both snapshots
        hist = [r["version"] for r in eng.collect(sid, eng.execute_sql(
            sid, "PRAGMA table_history('t_travel')"))]
        assert hist == [1, 2]
        # versioned read joins the current table (alias binding)
        joined = eng.collect(sid, eng.execute_sql(sid, """
            SELECT count(*) AS n
            FROM t_travel VERSION AS OF 1 old
            JOIN t_travel cur ON old.id = cur.id
        """))[0]["n"]
        assert joined == 4
        eng.execute_sql(sid, "DROP TABLE t_travel")
        eng.close_session(sid)

    def test_drop_clears_archive(self, spark):
        from gizmosql_spark.engine import Engine

        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_travel2")
        eng.execute_sql(
            sid, "CREATE TABLE t_travel2 AS SELECT id FROM range(3)")
        eng.execute_sql(sid, "DELETE FROM t_travel2 WHERE id = 0")
        assert eng.warehouse.versions("t_travel2")
        eng.execute_sql(sid, "DROP TABLE t_travel2")
        # recreate: version numbering restarts cleanly
        eng.execute_sql(
            sid, "CREATE TABLE t_travel2 AS SELECT id FROM range(2)")
        eng.execute_sql(sid, "DELETE FROM t_travel2 WHERE id = 0")
        assert [v["version"] for v in
                eng.warehouse.versions("t_travel2")] == [1]
        v1 = eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_travel2 VERSION AS OF 1"))
        assert {r["id"] for r in v1} == {0, 1}
        eng.execute_sql(sid, "DROP TABLE t_travel2")
        eng.close_session(sid)

    def test_unknown_version_fails(self, spark):
        import pytest as _pytest

        from gizmosql_spark.engine import Engine

        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_travel3")
        eng.execute_sql(
            sid, "CREATE TABLE t_travel3 AS SELECT id FROM range(2)")
        with _pytest.raises(Exception):
            eng.execute_sql(
                sid, "SELECT * FROM t_travel3 VERSION AS OF 9")
        eng.execute_sql(sid, "DROP TABLE t_travel3")
        eng.close_session(sid)
