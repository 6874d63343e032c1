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
    wh.upsert_entry("t_wh_ghost", {
        "schema": "`a` int", "location": "/nonexistent/path/x",
        "format": "parquet"})
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

    def test_timestamp_as_of_resolves_archives(self, spark):
        """Delta-style TIMESTAMP AS OF: a timestamp between two
        mutations reads the state that was live then (the earliest
        archive committed after it); a timestamp after every mutation
        reads the live table."""
        import time as _time
        from datetime import datetime, timezone

        from gizmosql_spark.engine import Engine

        def _iso(t: float) -> str:
            return datetime.fromtimestamp(t, tz=timezone.utc).isoformat()

        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_ts_travel")
        eng.execute_sql(
            sid, "CREATE TABLE t_ts_travel AS"
                 " SELECT id, id * 10 AS qty FROM range(5)")
        t_before_upd = _time.time()
        _time.sleep(0.02)
        eng.execute_sql(sid, "UPDATE t_ts_travel SET qty = 999 WHERE id = 2")
        _time.sleep(0.02)
        t_between = _time.time()
        _time.sleep(0.02)
        eng.execute_sql(sid, "DELETE FROM t_ts_travel WHERE id = 4")
        _time.sleep(0.02)
        t_after = _time.time()

        as_of_orig = {(r["id"], r["qty"]) for r in eng.collect(
            sid, eng.execute_sql(
                sid,
                f"SELECT * FROM t_ts_travel TIMESTAMP AS OF"
                f" '{_iso(t_before_upd)}'"))}
        assert as_of_orig == {(i, i * 10) for i in range(5)}
        as_of_mid = {(r["id"], r["qty"]) for r in eng.collect(
            sid, eng.execute_sql(
                sid,
                f"SELECT * FROM t_ts_travel TIMESTAMP AS OF"
                f" '{_iso(t_between)}'"))}
        assert (2, 999) in as_of_mid and (4, 40) in as_of_mid
        as_of_now = {(r["id"], r["qty"]) for r in eng.collect(
            sid, eng.execute_sql(
                sid,
                f"SELECT * FROM t_ts_travel TIMESTAMP AS OF"
                f" '{_iso(t_after)}'"))}
        assert (4, 40) not in as_of_now and (2, 999) in as_of_now
        with pytest.raises(Exception, match="TIMESTAMP AS OF"):
            eng.execute_sql(
                sid, "SELECT * FROM t_ts_travel TIMESTAMP AS OF 'nonsense'")
        eng.execute_sql(sid, "DROP TABLE t_ts_travel")
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


class TestMultiWriterCommits:
    """Optimistic-concurrency manifest commits: concurrent writers in
    SEPARATE processes must not lose each other's updates (the
    Delta-log CAS property the round-2 verdict asked for)."""

    def test_concurrent_processes_lose_no_updates(self, tmp_path):
        manifest = str(tmp_path / "wh" / "_catalog.json")
        script = r"""
import sys
from gizmosql_spark.warehouse import WarehouseCatalog

wh = WarehouseCatalog.__new__(WarehouseCatalog)
import threading, os
wh.dir = os.path.dirname(sys.argv[1])
wh.manifest_path = sys.argv[1]
wh.commits_dir = os.path.join(os.path.dirname(sys.argv[1]), "_commits")
wh._lock = threading.Lock()
wid = sys.argv[2]
for i in range(8):
    wh.upsert_entry(f"t_{wid}_{i}", {"schema": "`a` int",
                                     "location": f"/tmp/{wid}/{i}",
                                     "format": "parquet"})
print("done", wid)
"""
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, manifest, f"w{w}"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                cwd=os.path.dirname(os.path.dirname(__file__)))
            for w in range(4)
        ]
        for p in procs:
            out, err = p.communicate(timeout=120)
            assert p.returncode == 0, err.decode()[-2000:]

        import threading

        wh = WarehouseCatalog.__new__(WarehouseCatalog)
        wh.dir = os.path.dirname(manifest)
        wh.manifest_path = manifest
        wh.commits_dir = os.path.join(os.path.dirname(manifest), "_commits")
        wh._lock = threading.Lock()
        tables = wh.tables()
        expect = {f"t_w{w}_{i}" for w in range(4) for i in range(8)}
        assert expect <= set(tables), sorted(expect - set(tables))
        # 32 commits crossed the checkpoint threshold: snapshot exists
        # and still carries every entry
        _, seq = wh._state()
        assert seq == 32

    def test_checkpoint_prunes_and_survives(self, tmp_path):
        import threading

        manifest = str(tmp_path / "wh2" / "_catalog.json")
        wh = WarehouseCatalog.__new__(WarehouseCatalog)
        wh.dir = os.path.dirname(manifest)
        wh.manifest_path = manifest
        wh.commits_dir = os.path.join(os.path.dirname(manifest), "_commits")
        wh._lock = threading.Lock()
        for i in range(80):
            wh.upsert_entry(f"t_{i}", {"schema": "`a` int",
                                       "location": f"/tmp/t/{i}",
                                       "format": "parquet"})
        names = [n for n in os.listdir(wh.commits_dir)
                 if n.endswith(".json")]
        assert len(names) < 80  # pruned behind the checkpoint
        assert os.path.exists(manifest)
        assert len(wh.tables()) == 80


class TestSchemaEvolutionAndOptimize:
    """Lakehouse maintenance tier: ADD COLUMNS (metadata-only,
    native), DROP/RENAME COLUMN (engine copy-on-write), OPTIMIZE
    compaction — with time travel preserving pre-images."""

    def test_add_columns_metadata_only(self, spark):
        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_evo_add")
        eng.execute_sql(
            sid, "CREATE TABLE t_evo_add AS SELECT id FROM range(3)")
        eng.execute_sql(
            sid, "ALTER TABLE t_evo_add ADD COLUMNS (note STRING)")
        rows = eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_evo_add ORDER BY id"))
        assert [r["note"] for r in rows] == [None] * 3
        # manifest schema re-recorded with the new column
        assert "note" in eng.warehouse.tables()["t_evo_add"]["schema"]
        eng.execute_sql(sid, "DROP TABLE t_evo_add")
        eng.close_session(sid)

    def test_drop_and_rename_column_copy_on_write(self, spark):
        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_evo")
        eng.execute_sql(
            sid, "CREATE TABLE t_evo AS"
                 " SELECT id, id * 2 AS b, 'x' AS c FROM range(4)")
        eng.execute_sql(sid, "ALTER TABLE t_evo DROP COLUMN c")
        assert eng.spark.table("t_evo").columns == ["id", "b"]
        eng.execute_sql(sid, "ALTER TABLE t_evo RENAME COLUMN b TO dbl")
        assert eng.spark.table("t_evo").columns == ["id", "dbl"]
        rows = eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_evo ORDER BY id"))
        assert [(r["id"], r["dbl"]) for r in rows] == [
            (i, i * 2) for i in range(4)]
        # the pre-evolution snapshot still reads the OLD schema
        v1 = eng.collect(sid, eng.execute_sql(
            sid, "SELECT * FROM t_evo VERSION AS OF 1 ORDER BY id"))
        assert set(v1[0].asDict()) == {"id", "b", "c"}
        # manifest reflects the evolved schema
        assert "dbl" in eng.warehouse.tables()["t_evo"]["schema"]
        eng.execute_sql(sid, "DROP TABLE t_evo")
        eng.close_session(sid)

    def test_evolution_errors(self, spark):
        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_evo_err")
        eng.execute_sql(
            sid, "CREATE TABLE t_evo_err AS SELECT id FROM range(2)")
        with pytest.raises(Exception, match="no such column"):
            eng.execute_sql(
                sid, "ALTER TABLE t_evo_err DROP COLUMN nope")
        with pytest.raises(Exception, match="every column"):
            eng.execute_sql(sid, "ALTER TABLE t_evo_err DROP COLUMN id")
        eng.execute_sql(sid, "DROP TABLE t_evo_err")
        eng.close_session(sid)

    def test_optimize_compacts_small_files(self, spark):
        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        spark.sql("DROP TABLE IF EXISTS t_opt")
        spark.range(10000).toDF("id").repartition(16) \
            .write.saveAsTable("t_opt")
        eng.warehouse.record(spark, "t_opt")
        before = eng.collect(sid, eng.execute_sql(sid, "OPTIMIZE t_opt"))[0]
        assert before["files_before"] >= 16 and before["rewritten"]
        assert before["files_after"] < before["files_before"]
        # data unchanged
        s = eng.collect(sid, eng.execute_sql(
            sid, "SELECT count(*) AS n, sum(id) AS s FROM t_opt"))[0]
        assert (s["n"], s["s"]) == (10000, 10000 * 9999 // 2)
        # pre-compaction snapshot exists (time travel over OPTIMIZE)
        assert eng.warehouse.versions("t_opt")
        # second OPTIMIZE is a no-op report
        again = eng.collect(sid, eng.execute_sql(sid, "OPTIMIZE t_opt"))[0]
        assert not again["rewritten"]
        eng.execute_sql(sid, "DROP TABLE t_opt")
        eng.close_session(sid)

    def test_optimize_denied_readonly(self, spark):
        from gizmosql_spark.security import CommandDenied

        eng = Engine(spark=spark)
        sid = eng.create_session(role="readonly")
        with pytest.raises(CommandDenied):
            eng.execute_sql(sid, "OPTIMIZE t_whatever")
        eng.close_session(sid)


class TestAnalyzeAndVacuum:
    """Catalog statistics (ANALYZE folds into the manifest) and
    snapshot retention (VACUUM expires archived versions)."""

    def test_analyze_records_statistics(self, spark):
        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_stats")
        eng.execute_sql(
            sid, "CREATE TABLE t_stats AS"
                 " SELECT id, id % 7 AS g FROM range(1000)")
        eng.execute_sql(
            sid, "ANALYZE TABLE t_stats COMPUTE STATISTICS FOR ALL COLUMNS")
        stats = eng.warehouse.tables()["t_stats"].get("statistics")
        assert stats and stats["row_count"] == 1000
        assert stats["columns"]["g"]["distinct_count"] == "7"
        assert stats["columns"]["id"]["max"] == "999"
        eng.execute_sql(sid, "DROP TABLE t_stats")
        eng.close_session(sid)

    def test_vacuum_expires_old_versions(self, spark):
        eng = Engine(spark=spark)
        sid = eng.create_session(role="admin")
        eng.execute_sql(sid, "DROP TABLE IF EXISTS t_vac")
        eng.execute_sql(
            sid, "CREATE TABLE t_vac AS SELECT id FROM range(10)")
        for i in range(4):
            eng.execute_sql(sid, f"DELETE FROM t_vac WHERE id = {i}")
        assert len(eng.warehouse.versions("t_vac")) == 4
        rep = eng.collect(sid, eng.execute_sql(
            sid, "VACUUM t_vac RETAIN 2 VERSIONS"))[0]
        assert rep["versions_removed"] == 2 and rep["bytes_freed"] > 0
        kept = eng.warehouse.versions("t_vac")
        assert [v["version"] for v in kept] == [3, 4]
        assert all(os.path.isdir(v["path"]) for v in kept)
        # retained versions still time-travel
        rows = eng.collect(sid, eng.execute_sql(
            sid, "SELECT count(*) AS n FROM t_vac VERSION AS OF 3"))
        assert rows[0]["n"] == 8
        # expired version is gone
        with pytest.raises(Exception):
            eng.collect(sid, eng.execute_sql(
                sid, "SELECT * FROM t_vac VERSION AS OF 1"))
        # idempotent when nothing to remove
        rep2 = eng.collect(sid, eng.execute_sql(
            sid, "VACUUM t_vac RETAIN 2 VERSIONS"))[0]
        assert rep2["versions_removed"] == 0
        eng.execute_sql(sid, "DROP TABLE t_vac")
        eng.close_session(sid)

    def test_vacuum_denied_readonly(self, spark):
        from gizmosql_spark.security import CommandDenied

        eng = Engine(spark=spark)
        sid = eng.create_session(role="readonly")
        with pytest.raises(CommandDenied):
            eng.execute_sql(sid, "VACUUM whatever")
        eng.close_session(sid)


def test_table_files_pragma(spark):
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    spark.sql("DROP TABLE IF EXISTS t_files")
    spark.range(1000).toDF("id").repartition(4).write.saveAsTable("t_files")
    rows = eng.collect(sid, eng.execute_sql(
        sid, "PRAGMA table_files('t_files')"))
    assert len(rows) == 4
    assert all(r["size_bytes"] > 0 and r["file"].endswith(".parquet")
               for r in rows)
    eng.execute_sql(sid, "DROP TABLE t_files")
    eng.close_session(sid)


def test_rename_table_updates_manifest(spark):
    """ALTER TABLE … RENAME TO must re-record the manifest under the
    NEW name (the old entry resolves to forget) so the files survive
    a restart under the renamed table."""
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(sid, "DROP TABLE IF EXISTS t_ren_src")
    eng.execute_sql(sid, "DROP TABLE IF EXISTS t_ren_dst")
    eng.execute_sql(sid, "CREATE TABLE t_ren_src AS SELECT 7 AS x")
    assert "t_ren_src" in eng.warehouse.tables()
    eng.execute_sql(sid, "ALTER TABLE t_ren_src RENAME TO t_ren_dst")
    tables = eng.warehouse.tables()
    assert "t_ren_src" not in tables
    assert "t_ren_dst" in tables
    assert os.path.isdir(tables["t_ren_dst"]["location"])
    eng.execute_sql(sid, "DROP TABLE t_ren_dst")
    eng.close_session(sid)


def test_views_survive_restart(spark):
    """Persistent VIEWs: the manifest carries the definition (the
    reference keeps views in its database file); a fresh process
    re-creates them after re-attaching their base tables."""
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(sid, "DROP VIEW IF EXISTS v_wh_double")
    eng.execute_sql(sid, "DROP TABLE IF EXISTS t_wh_vbase")
    eng.execute_sql(
        sid, "CREATE TABLE t_wh_vbase AS SELECT id FROM range(4)")
    eng.execute_sql(
        sid, "CREATE VIEW v_wh_double AS"
             " SELECT id, id * 2 AS dbl FROM t_wh_vbase")
    entry = eng.warehouse.tables().get("v_wh_double")
    assert entry and entry["type"] == "view" and "dbl" in entry["view_text"]

    # simulate restart: drop both from the catalog only (view first),
    # then reattach — table returns, then the view over it
    spark.sql("DROP VIEW v_wh_double")
    loc = eng.warehouse.tables()["t_wh_vbase"]["location"]
    spark.sql("DROP TABLE t_wh_vbase")  # managed drop deletes files...
    os.makedirs(loc, exist_ok=True)
    spark.range(4).toDF("id").write.mode("overwrite").parquet(loc)
    attached = eng.reattach()
    assert "v_wh_double" in attached
    rows = eng.collect(sid, eng.execute_sql(
        sid, "SELECT sum(dbl) AS s FROM v_wh_double"))
    assert rows[0]["s"] == 12
    eng.execute_sql(sid, "DROP VIEW v_wh_double")
    assert "v_wh_double" not in eng.warehouse.tables()
    eng.execute_sql(sid, "DROP TABLE t_wh_vbase")
    eng.close_session(sid)


def test_optimize_preserves_bucketed_layout(spark):
    """OPTIMIZE on a bucketed table: insertInto enforces the table's
    bucket spec, so compaction lands one file per bucket and the
    CLUSTERED BY metadata survives."""
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    spark.sql("DROP TABLE IF EXISTS t_opt_bkt")
    spark.range(10000).toDF("id").repartition(32) \
        .write.bucketBy(4, "id").sortBy("id").saveAsTable("t_opt_bkt")
    eng.warehouse.record(spark, "t_opt_bkt")
    rep = eng.collect(sid, eng.execute_sql(sid, "OPTIMIZE t_opt_bkt"))[0]
    assert rep["rewritten"] and rep["files_after"] == 4
    d = {r["col_name"].strip(): (r["data_type"] or "").strip()
         for r in spark.sql("DESCRIBE FORMATTED t_opt_bkt").collect()
         if r["col_name"]}
    assert d.get("Num Buckets") == "4"
    assert spark.table("t_opt_bkt").count() == 10000
    eng.execute_sql(sid, "DROP TABLE t_opt_bkt")
    eng.close_session(sid)


def test_optimize_zorder_clusters_two_dims(spark):
    """OPTIMIZE … ZORDER BY (a, b): after the rewrite, each output
    file's 2-D bounding box must be dramatically tighter than the
    random layout's — the property file-stat pruning reads."""
    import glob

    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    spark.sql("DROP TABLE IF EXISTS t_opt_z")
    spark.sql(
        "CREATE TABLE t_opt_z AS"
        " SELECT CAST(id % 997 AS DOUBLE) AS a,"
        "        CAST((id * 7919) % 983 AS DOUBLE) AS b"
        " FROM range(100000)")
    eng.warehouse.record(spark, "t_opt_z")
    loc = eng.warehouse.tables()["t_opt_z"]["location"]

    def avg_bbox_area():
        areas = []
        for f in glob.glob(f"{loc}/*.parquet"):
            df = spark.read.parquet(f)
            r = df.agg({"a": "min"}).collect()  # noqa: F841 warm path
            row = df.selectExpr(
                "max(a) - min(a) AS da", "max(b) - min(b) AS db"
            ).collect()[0]
            areas.append((row["da"] + 1) * (row["db"] + 1))
        return sum(areas) / len(areas), len(areas)

    before_area, files_before = avg_bbox_area()
    rep = eng.collect(sid, eng.execute_sql(
        sid, "OPTIMIZE t_opt_z ZORDER BY (a, b)"))[0]
    assert rep["rewritten"]
    after_area, files_after = avg_bbox_area()
    assert files_after >= 4
    # random layout boxes cover ~the full key space; z-order boxes
    # must be at least 2x tighter on average
    assert after_area < before_area / 2, (before_area, after_area)
    # data unchanged
    s = eng.collect(sid, eng.execute_sql(
        sid, "SELECT count(*) AS n, round(sum(a + b), 2) AS s"
             " FROM t_opt_z"))[0]
    assert s["n"] == 100000
    eng.execute_sql(sid, "DROP TABLE t_opt_z")
    eng.close_session(sid)


def test_restore_table_to_version(spark):
    """RESTORE TABLE … TO VERSION AS OF k: rolls back to an archived
    snapshot, snapshots the current state first (undoable), and works
    across a schema evolution."""
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(sid, "DROP TABLE IF EXISTS t_restore")
    eng.execute_sql(
        sid, "CREATE TABLE t_restore AS"
             " SELECT id, id * 10 AS qty FROM range(5)")
    eng.execute_sql(sid, "DELETE FROM t_restore WHERE id >= 3")  # v1
    eng.execute_sql(
        sid, "ALTER TABLE t_restore DROP COLUMN qty")            # v2
    assert eng.spark.table("t_restore").columns == ["id"]

    rep = eng.collect(sid, eng.execute_sql(
        sid, "RESTORE TABLE t_restore TO VERSION AS OF 1"))[0]
    assert rep["restored_version"] == 1 and rep["row_count"] == 5
    rows = eng.collect(sid, eng.execute_sql(
        sid, "SELECT * FROM t_restore ORDER BY id"))
    assert [(r["id"], r["qty"]) for r in rows] == [
        (i, i * 10) for i in range(5)]
    # the restore snapshotted the pre-restore state: it is undoable
    vs = [v["version"] for v in eng.warehouse.versions("t_restore")]
    assert vs == [1, 2, 3]
    eng.execute_sql(sid, "RESTORE TABLE t_restore TO VERSION AS OF 3")
    assert eng.spark.table("t_restore").columns == ["id"]
    eng.execute_sql(sid, "DROP TABLE t_restore")
    eng.close_session(sid)


def test_restore_denied_readonly(spark):
    from gizmosql_spark.security import CommandDenied

    eng = Engine(spark=spark)
    sid = eng.create_session(role="readonly")
    with pytest.raises(CommandDenied):
        eng.execute_sql(sid, "RESTORE TABLE x TO VERSION AS OF 1")
    eng.close_session(sid)


def test_table_changes_cdf(spark):
    """table_changes('t', v_from[, v_to]): the Delta Change-Data-Feed
    analog — snapshot-diff rows labeled insert/delete with duplicate
    multiplicity, composable with plain SQL over the result."""
    eng = Engine(spark=spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(sid, "DROP TABLE IF EXISTS t_cdf")
    eng.execute_sql(
        sid, "CREATE TABLE t_cdf AS SELECT id, id * 10 AS qty FROM range(5)")
    eng.execute_sql(sid, "UPDATE t_cdf SET qty = 999 WHERE id = 2")   # v1
    eng.execute_sql(sid, "DELETE FROM t_cdf WHERE id = 4")            # v2

    # v1 (pre-update) → live: the update is a delete+insert pair, the
    # delete is a bare delete
    rows = eng.collect(sid, eng.execute_sql(
        sid,
        "SELECT id, qty, _change_type, _change_count"
        " FROM table_changes('t_cdf', 1)"
        " ORDER BY id, _change_type"))
    got = [(r["id"], r["qty"], r["_change_type"], r["_change_count"])
           for r in rows]
    assert got == [
        (2, 20, "delete", 1),
        (2, 999, "insert", 1),
        (4, 40, "delete", 1),
    ]

    # bounded window v1 → v2 excludes the later delete of id=4
    rows = eng.collect(sid, eng.execute_sql(
        sid,
        "SELECT id, _change_type FROM table_changes('t_cdf', 1, 2)"
        " ORDER BY id, _change_type"))
    assert [(r["id"], r["_change_type"]) for r in rows] == [
        (2, "delete"), (2, "insert")]

    # identical states diff to empty
    rows = eng.collect(sid, eng.execute_sql(
        sid, "SELECT count(*) AS n FROM table_changes('t_cdf', 2, 2)"))
    assert rows[0]["n"] == 0
    eng.execute_sql(sid, "DROP TABLE IF EXISTS t_cdf")
    eng.close_session(sid)
