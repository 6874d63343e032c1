"""Structured Streaming tests: drive each streaming operator to
completion over the events fixture and check against the batch
equivalents (which are themselves oracle-verified in test_relational)."""

from __future__ import annotations

import pytest

from gizmosql_spark.operators import events as batch_events
from gizmosql_spark.streaming import windows as sw


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    return sw.read_event_stream(spark, sf_dir)


def test_tumbling_matches_batch(spark, sf_dir, event_stream):
    out = sw.run_to_completion(sw.tumbling_counts(event_stream), "t_tumble")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in out.collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n"], r["total"])
        for r in batch_events.events_hourly(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, total) in expect.items():
        assert got[k][0] == n
        assert abs(got[k][1] - total) < 1e-6


def test_sliding_windows_run(event_stream):
    out = sw.run_to_completion(sw.sliding_counts(event_stream), "t_slide")
    rows = out.collect()
    assert len(rows) > 0
    # each event lands in window/slide = 4 sliding windows
    total_n = sum(r["n"] for r in rows)
    assert total_n == 10000 * 4


def test_session_windows_match_batch_counts(spark, sf_dir, event_stream):
    out = sw.run_to_completion(sw.session_windows(event_stream), "t_sess")
    stream_sessions = out.count()
    batch_sessions = batch_events.events_sessionize(spark, sf_dir).count()
    assert stream_sessions == batch_sessions


def test_stateful_running_totals(spark, event_stream):
    out = sw.run_to_completion(sw.running_totals(event_stream), "t_state")
    rows = {r["user_id"]: r for r in out.collect()}
    assert len(rows) > 0
    total_events = sum(r["count"] for r in rows.values())
    assert total_events == 10000


@pytest.mark.parametrize("name", sorted(sw.QUERIES))
def test_streaming_contract_matches_oracle(spark, sf_dir, name):
    """The driver-contract streaming entries run the full streaming
    plan to completion and must hash-match the batch DuckDB oracle."""
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(sw.QUERIES[name](spark, sf_dir), sw.ORACLE[name], sf_dir)


@pytest.mark.skipif(not sw.tws_available(), reason="protobuf unavailable")
def test_transform_with_state(spark, sf_dir):
    out = sw.stream_user_stats(spark, sf_dir)
    total = sum(r["count"] for r in out.collect())
    assert total == 10000


def test_stream_ingest_to_table(spark, sf_dir):
    """Streaming ingestion sink: readStream -> managed table via
    toTable with exactly-once file tracking (checkpointed)."""
    import uuid

    ckpt = f"/tmp/gizmosql-warehouse/_ckpt_{uuid.uuid4().hex[:10]}"
    spark.sql("DROP TABLE IF EXISTS t_stream_sink")
    q = (
        sw.read_event_stream(spark, sf_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .toTable("t_stream_sink")
    )
    q.awaitTermination()
    assert spark.table("t_stream_sink").count() == 10000
    spark.sql("DROP TABLE t_stream_sink")


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Faithful watermark semantics across micro-batches: three
    availableNow runs share one CHECKPOINT, so the watermark persists
    across restarts (the recovery contract). A row arriving in run 3
    with an event time below the recovered watermark is DROPPED from
    its already-finalized window (append mode)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from gizmosql_spark.streaming.windows import tumbling_counts

    H = 3_600_000_000  # one hour in microseconds
    d = tmp_path / "events"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, times):
        pq.write_table(pa.table({
            "ts": pa.array(times, pa.int64()),
            "event_type": pa.array(["click"] * len(times)),
            "value": pa.array([1.0] * len(times)),
        }), d / name)

    out = str(tmp_path / "out")

    def run(_):
        stream = (
            spark.readStream
            .schema("ts long, event_type string, value double")
            .parquet(str(d))
            .withColumn("ts", F.timestamp_micros("ts"))
        )
        agg = tumbling_counts(stream, window="1 hour",
                              watermark="10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")          # fault-tolerant sink: the
            .option("path", out)        # checkpoint replays cleanly
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import glob
        if not glob.glob(f"{out}/*.parquet"):
            return set()
        return {(r["window_start"].hour, r["n"])
                for r in spark.read.parquet(out).collect()}

    # run 1: three on-time events in the 10:00 window; watermark ends
    # at 10:20 — window still open, nothing emitted
    write("a.parquet", [10 * H, 10 * H + H // 4, 10 * H + H // 2])
    assert run("wm_run1") == set()

    # run 2: a 12:00 event recovers watermark 10:20, advances it to
    # 11:50 — the 10:00 window finalizes with its 3 ON-TIME events
    write("b.parquet", [12 * H])
    assert run("wm_run2") == {(10, 3)}

    # run 3: a LATE 10:15 event (below the recovered 11:50 watermark —
    # dropped; the window never re-emits) + a 14:00 event that pushes
    # the watermark past 13:00, finalizing the 12:00 window with n=1
    write("c.parquet", [10 * H + H // 4, 14 * H])
    assert run("wm_run3") == {(10, 3), (12, 1)}


def test_stream_sliding_matches_oracle(spark, sf_dir):
    from gizmosql_spark.streaming import windows as sw
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        sw.stream_sliding(spark, sf_dir),
        sw.ORACLE["stream_sliding"], sf_dir)


def test_stream_sink_table_matches_oracle(spark, sf_dir):
    from gizmosql_spark.streaming import windows as sw
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        sw.stream_sink_table(spark, sf_dir),
        sw.ORACLE["stream_sink_table"], sf_dir)


def test_kill_and_resume_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once across a mid-stream kill: a many-file source
    processes a few files per trigger; the query is STOPPED after the
    first committed batch, then resumed from the same checkpoint with
    availableNow. The file sink's commit log must yield exactly the
    batch-read row count — no duplicated, no dropped rows."""
    import time as _time

    from gizmosql_spark.operators import scale

    src = scale._ensure_manyfile_events(spark, sf_dir)
    expect = spark.read.parquet(src).count()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = spark.read.parquet(src).schema

    def reader():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(src)
            .select("event_id", "event_type", "value")
        )

    q = (
        reader().writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    # wait for at least one committed batch, then kill mid-stream
    deadline = _time.time() + 120
    while _time.time() < deadline:
        p = q.lastProgress
        if p and p["numInputRows"] > 0:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    partial = spark.read.parquet(out).count()
    # normally the kill lands mid-stream; on a fast machine every
    # batch may already have committed — still a valid exactly-once
    # check, just without the resume exercising new work
    assert 0 < partial <= expect, (partial, expect)

    # resume from the same checkpoint; drain everything remaining
    q2 = (
        reader().writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == expect


def test_both_ts_encodings_agree(spark, sf_dir, tmp_path):
    """The driver has shipped events.ts as BOTH parquet
    timestamp[us] and TIMESTAMP(NANOS)-read-as-long across rounds;
    batch loader and stream reader must produce identical event times
    for either file encoding (the round-2 regression family)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gizmosql_spark.operators.events import load_events

    # re-encode the fixture's events with ts as int64 nanoseconds
    t = pq.read_table(f"{sf_dir}/events.parquet")
    ts_ns = pa.compute.multiply(
        t.column("ts").cast(pa.int64()), pa.scalar(1000, pa.int64()))
    legacy = t.set_column(t.schema.get_field_index("ts"), "ts", ts_ns)
    legacy_dir = tmp_path / "legacy"
    legacy_dir.mkdir()
    pq.write_table(legacy, str(legacy_dir / "events.parquet"))

    native = load_events(spark, sf_dir).select("event_id", "ts")
    converted = load_events(spark, str(tmp_path / "legacy")).select(
        "event_id", "ts")
    # identical values, and no 1970-collapse
    assert converted.schema["ts"].dataType.typeName().startswith("timestamp")
    mism = native.withColumnRenamed("ts", "ts_a").join(
        converted.withColumnRenamed("ts", "ts_b"), "event_id"
    ).filter("cast(ts_a as string) <> cast(ts_b as string)")
    assert mism.count() == 0

    # streaming reader: same conversion guard on the legacy encoding
    stream = sw.read_event_stream(spark, str(tmp_path / "legacy"))
    out = sw.run_to_completion(
        sw.tumbling_counts(stream), "t_tumble_legacy")
    starts = {r["window_start"].year for r in out.collect()}
    assert 1970 not in starts


def test_crash_retry_rebuilds_streaming_session(spark, sf_dir):
    """The round-4 official red row: stream_user_stats crashed and all
    3 retries replayed the identical failure because the retry reused
    the streaming-session clone whose Python state-server pool had
    died. Contract now: a crash-signature failure tears down the clone
    (_reset_streaming_session) and the builder re-derives the stream
    on a FRESH clone for the next attempt."""
    calls = {"n": 0}
    sessions = []

    def build():
        calls["n"] += 1
        s = sw.streaming_session(spark)
        sessions.append(s)
        if calls["n"] == 1:
            # simulated TWS worker death (a _CRASH_SIGNS fragment)
            raise RuntimeError(
                "TransformWithStateInPySpark driver worker "
                "exited unexpectedly (crashed)")
        return sw.tumbling_counts(sw.read_event_stream(spark, sf_dir))

    out = sw.run_to_completion(build, "t_crash_retry")
    assert out.count() > 0
    assert calls["n"] == 2
    # attempt 2 ran on a rebuilt clone, not the poisoned one
    assert sessions[0] is not sessions[1]
    # and the TWS prewarm flag was reset with the session
    # (the rebuilt pool must be rewarmed before the next TWS query)


def test_crash_retry_preserves_deterministic_failures(spark, sf_dir):
    """Non-crash failures (wrong answers, analysis errors) must NOT be
    retried — a deterministic failure surfaces on attempt 1."""
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        raise ValueError("deliberate analysis error, not a crash")

    import pytest

    with pytest.raises(ValueError):
        sw.run_to_completion(build, "t_no_retry")
    assert calls["n"] == 1
