"""Vendored google.protobuf runtime subset (gizmosql_spark/vendor).

The shim executes protoc-generated ``_pb2`` modules — specifically
PySpark's ``StateMessage_pb2``, the transformWithStateInPandas state
protocol — without the protobuf wheel. Golden wire vectors below are
hand-computed from the public proto3 encoding spec, so these tests
pin byte-exact compatibility with any conformant protobuf peer (the
JVM state server parses what we emit and vice versa).
"""

from __future__ import annotations

import os

import pytest

from gizmosql_spark.vendor import ensure_protobuf

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="protobuf bootstrap failed"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


class TestGoldenWire:
    """Byte-exact vectors, hand-computed from the encoding spec."""

    def test_set_handle_state(self):
        sm = _sm()
        req = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.CREATED)
            )
        )
        # field 2 LEN(4) { field 1 LEN(2) { field 1 varint 1 } }
        assert req.SerializeToString() == bytes.fromhex("12040a020801")

    def test_empty_message_presence_on_wire(self):
        sm = _sm()
        req = sm.StateRequest(
            version=2,
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                removeImplicitKey=sm.RemoveImplicitKey()
            ),
        )
        # field 1 varint 2; field 4 LEN(2) { field 2 LEN(0) } — the
        # empty oneof member MUST appear (presence drives dispatch)
        assert req.SerializeToString() == bytes.fromhex("080222021200")

    def test_default_scalars_elided(self):
        sm = _sm()
        # proto3 implicit presence: statusCode=0, errorMessage="" and
        # value=b"" all elide — empty wire
        resp = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
        assert resp.SerializeToString() == b""

    def test_string_and_int64(self):
        sm = _sm()
        cmd = sm.StateCallCommand()
        cmd.stateName = "s"
        cmd.ttl.durationMs = 300
        # field 1 LEN(1) "s"; field 4 LEN(3) { field 1 varint 300 }
        assert cmd.SerializeToString() == bytes.fromhex("0a01732203 08ac02".replace(" ", ""))

    def test_negative_int64_ten_bytes(self):
        sm = _sm()
        t = sm.RegisterTimer(expiryTimestampMs=-1)
        # two's-complement varint of -1 is ten 0xff... bytes
        assert t.SerializeToString() == bytes.fromhex(
            "08ffffffffffffffffff01"
        )


class TestRoundTrips:
    def test_nested_oneof_roundtrip(self):
        sm = _sm()
        call = sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="stats", schema="count LONG, total DOUBLE"
            )
        )
        req = sm.StateRequest(version=1, statefulProcessorCall=call)
        back = sm.StateRequest()
        back.ParseFromString(req.SerializeToString())
        assert back.version == 1
        which = back.statefulProcessorCall.WhichOneof("method")
        assert which == "getValueState"
        assert back.statefulProcessorCall.getValueState.stateName == "stats"

    def test_repeated_message_and_bool(self):
        sm = _sm()
        resp = sm.StateResponseWithMapIterator(
            statusCode=0,
            kvPair=[
                sm.KeyAndValuePair(key=b"k1", value=b"v1"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2"),
            ],
            requireNextFetch=True,
        )
        back = sm.StateResponseWithMapIterator()
        back.ParseFromString(resp.SerializeToString())
        assert [(p.key, p.value) for p in back.kvPair] == [
            (b"k1", b"v1"),
            (b"k2", b"v2"),
        ]
        assert back.requireNextFetch is True
        assert back.statusCode == 0 and back.errorMessage == ""

    def test_repeated_bytes(self):
        sm = _sm()
        put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=False)
        back = sm.ListStatePut()
        back.ParseFromString(put.SerializeToString())
        assert back.value == [b"a", b"bb", b""]
        assert back.fetchWithArrow is False

    def test_oneof_last_set_wins(self):
        sm = _sm()
        req = sm.ImplicitGroupingKeyRequest()
        req.setImplicitKey.key = b"x"
        req.removeImplicitKey.SetInParent = None  # touch to vivify
        # setting the second member cleared the first
        assert req.WhichOneof("method") == "removeImplicitKey"

    def test_unknown_fields_skipped(self):
        sm = _sm()
        # KeyAndValuePair bytes + an unknown field 99 varint appended
        payload = sm.KeyAndValuePair(key=b"k").SerializeToString()
        payload += bytes.fromhex("b8 06 2a".replace(" ", ""))  # 99<<3|0
        back = sm.KeyAndValuePair()
        back.ParseFromString(payload)
        assert back.key == b"k"

    def test_proto3_optional_presence(self):
        sm = _sm()
        t = sm.TimerInfo(timestampMs=5)
        assert not t.HasField("key")
        t2 = sm.TimerInfo(key=b"", timestampMs=5)
        data = t2.SerializeToString()
        back = sm.TimerInfo()
        back.ParseFromString(data)
        # explicitly-set optional bytes field survives even when empty
        assert back.HasField("key") and back.key == b""


class TestEnumsAndGating:
    def test_enum_constants_are_module_globals(self):
        sm = _sm()
        assert sm.PRE_INIT == 0
        assert sm.CREATED == 1
        assert sm.CLOSED == 5
        assert sm.HandleState.Value("INITIALIZED") == 2
        assert sm.HandleState.Name(3) == "DATA_PROCESSED"

    def test_tws_gate_open(self):
        from gizmosql_spark.streaming import windows as sw

        assert sw.tws_available()
        assert "stream_user_stats" in sw.QUERIES
        assert "stream_user_stats" in sw.ORACLE

    def test_shim_never_shadows_real_install(self):
        # The bootstrap only appends the vendor dir when no real
        # protobuf exists; with the shim active, importing must
        # resolve inside the repo (proving which one we exercised).
        import google.protobuf as gp

        from gizmosql_spark.vendor import VENDOR_DIR, _real_protobuf_present

        if not _real_protobuf_present():
            assert VENDOR_DIR in gp.__file__


class TestWorkerExport:
    """The rounds-3..5 official-record streaming crash, pinned.

    A harness that builds its SparkSession *before* importing this
    package has a JVM whose environment predates ensure_protobuf()'s
    PYTHONPATH export — transformWithState's spawned Python workers
    then can't import (vendored) protobuf and die with "driver worker
    exited unexpectedly (crashed)". export_to_spark_workers ships the
    shim path through sc.environment (PySpark's per-function env
    channel) instead, which reaches workers created after JVM launch.
    The subprocess below reproduces the exact harness ordering."""

    def test_sc_environment_export(self, spark):
        import os as _os

        from gizmosql_spark.vendor import (
            VENDOR_DIR,
            _real_protobuf_present,
            export_to_spark_workers,
        )

        if _real_protobuf_present():
            pytest.skip("real protobuf installed; shim export is a no-op")
        export_to_spark_workers(spark)
        env = spark.sparkContext.environment
        assert VENDOR_DIR in env.get("PYTHONPATH", "").split(_os.pathsep)
        # idempotent — no duplicate path segments on repeat calls
        export_to_spark_workers(spark)
        assert env["PYTHONPATH"].count(VENDOR_DIR) == 1

    def test_tws_survives_session_before_import(self, tmp_path):
        """End-to-end in a clean subprocess: PYTHONPATH scrubbed,
        SparkSession created FIRST, repo imported after — the official
        driver's ordering. The TWS query must still complete."""
        import subprocess
        import sys as _sys
        import textwrap

        repo = "/root/repo"
        script = textwrap.dedent(
            f"""
            import os, sys
            os.environ.pop("PYTHONPATH", None)
            from pyspark.sql import SparkSession
            spark = (SparkSession.builder.master("local[2]")
                     .config("spark.sql.shuffle.partitions", "1")
                     .config("spark.ui.enabled", "false")
                     .getOrCreate())
            sys.path.insert(0, {repo!r})
            import datetime
            from gizmosql_spark.streaming.windows import (
                EVENT_SCHEMA, user_stats_tws, _run_with_rocksdb)
            tmp = {str(tmp_path / "ev")!r}
            rows = [(i, datetime.datetime(2024, 1, 1, 0, i), i % 2,
                     "t", 1.0, "{{}}") for i in range(4)]
            spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)\\
                .write.mode("overwrite").parquet(tmp)
            def build():
                from gizmosql_spark.streaming.windows import (
                    tws_streaming_session)
                s = tws_streaming_session(spark)
                stream = s.readStream.schema(EVENT_SCHEMA).parquet(tmp)
                return user_stats_tws(stream)
            out = _run_with_rocksdb(spark, build, "q_tws_ordering_pin")
            print("TWS_ROWS=%d" % out.count())
            spark.stop()
            """
        )
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        proc = subprocess.run(
            [_sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=600,
            env=env,
            cwd=str(tmp_path),
        )
        assert "TWS_ROWS=2" in proc.stdout, (
            f"stdout tail: {proc.stdout[-2000:]}\n"
            f"stderr tail: {proc.stderr[-2000:]}"
        )
