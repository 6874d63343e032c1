"""Long-lived transformWithState queries fed by bounded input swaps.

A Structured Streaming stateful query in deployment runs for months;
its driver-side Python pre-init worker (StreamingPythonRunner spawns a
fresh interpreter per query START — hardcoded useDaemon=false, measured
at ~1.0 s, not conf-reachable) and its state-store load are paid ONCE.
The bounded driver-contract entries, by contrast, used to start a fresh
query per invocation and pay that floor every time — ~1 s × 5 TWS
queries × every bench iteration (SCALING.md §6 decomposition).

This module keeps ONE live query per (state shape, fixture dir) and
feeds each bounded invocation through it:

- state is keyed by ``(run_id, user_id)`` so successive runs never see
  each other's state — run N+1 starts every key fresh while run N's
  keys idle in RocksDB (bounded: fixture keys × generation runs);
- the input file is hard-linked (or copied) into a spool directory the
  query watches; the rename into place is atomic, so a run's whole
  input lands in exactly ONE micro-batch and Update mode emits exactly
  one final row per key per run;
- ``run_id`` is derived from the spool FILENAME at scan time
  (input_file_name()), so the fixture parquet is fed byte-identical —
  no rewrite per run;
- completion is ``query.processAllAvailable()`` — the synchronous
  barrier Structured Streaming provides for exactly this pattern;
- the memory sink accumulates one generation of runs, then the query
  is rebuilt (fresh spool/checkpoint/sink) — also the recycle point
  for the seeded shape, whose initialState pre-seeds a generation of
  run_ids up front (initialState is applied only at query start).

Every entry keeps its bounded-run fallback (windows._run_with_rocksdb):
any failure here tears the live query down and the caller re-runs the
classic availableNow path, so correctness never depends on this cache.

Reference parity: the reference engine (a batch SQL server) has no
streaming tier; this is the Spark-native extension tier's deployment
shape (SURVEY.md §2C streaming row).
"""

from __future__ import annotations

import itertools
import os
import shutil
import sys
import tempfile
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: runs per live-query generation: the memory sink and the idle RocksDB
#: keys grow per run, so the query is recycled (one fresh query start)
#: every N runs. The seeded shape's initialState covers exactly one
#: generation of run_ids, so its generation doubles as the seed pool.
GENERATION_RUNS = int(os.environ.get("SPARK_GRAFT_LIVE_RUNS", "64"))
SEED_GENERATION_RUNS = int(os.environ.get("SPARK_GRAFT_LIVE_SEED_RUNS", "16"))

_REGISTRY: dict[tuple[str, str], "_LiveTws"] = {}
_LOCK = threading.RLock()
#: per-(shape, sf_dir) creation locks: query START takes ~1 s (mkdtemp
#: + StreamingPythonRunner spawn), so it must NOT run under the global
#: _LOCK — concurrent clients creating DIFFERENT shapes would serialize
#: behind each other's starts. _LOCK guards only these two dicts.
_CREATE_LOCKS: dict[tuple[str, str], threading.RLock] = {}
#: monotonically increasing instance token baked into every sink/query
#: name: the registry keys live queries by (shape, sf_dir), so two
#: fixture dirs running the same shape in one process need DISTINCT
#: active query names (Spark rejects duplicate active queryName on the
#: shared session clone) — `live_{shape}_g{gen}` alone collides.
_INSTANCE_COUNTER = itertools.count()

# spool/checkpoint dirs live in tmpfs — tear everything down when the
# process exits so repeated bench/test runs don't accumulate them
import atexit  # noqa: E402

atexit.register(lambda: reset_all())


def _event_source(session: SparkSession, sf_dir: str,
                  spool: str) -> DataFrame:
    """events-schema stream over the spool dir, with ``run_id`` decoded
    from the landed filename and the ts encoding normalized exactly as
    windows.read_event_stream does."""
    from gizmosql_spark.streaming import windows as W

    cached = W._EVENT_SCHEMA_CACHE.get(sf_dir)
    if cached is None:
        batch = (
            session.read.option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        cached = (batch.schema, dict(batch.dtypes).get("ts"))
        W._EVENT_SCHEMA_CACHE[sf_dir] = cached
    schema, ts_dtype = cached
    stream = session.readStream.schema(schema).parquet(spool)
    stream = stream.withColumn(
        "run_id",
        F.regexp_extract(F.input_file_name(), r"run(\d+)\.parquet", 1)
        .cast("long"),
    )
    if ts_dtype == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype != "timestamp":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _with_run(schema: StructType) -> StructType:
    return StructType([StructField("run_id", LongType())] + list(schema))


class _Shape:
    """One TWS state shape: how to build the keyed stream + processor
    (run-aware: grouped by (run_id, user_id)) and, optionally, the
    per-generation initial state."""

    def __init__(
        self,
        name: str,
        build: Callable[[SparkSession, DataFrame], DataFrame],
        generation_runs: int = GENERATION_RUNS,
        post: Callable[[DataFrame, int], DataFrame] | None = None,
        expected_rows: Callable[[SparkSession, str], int] | None = None,
        mode: str = "update",
        session_kind: str = "tws",
        small_only: bool = False,
    ) -> None:
        self.name = name
        self.build = build
        self.generation_runs = generation_runs
        #: restrict the live path to sub-threshold fixture dirs: the
        #: JVM-tier shapes exist to amortize ~0.3-0.5 s of per-run
        #: query-start cost, which only matters when runs are fast —
        #: at super-threshold dirs per-run compute dominates, the
        #: bounded availableNow path is the proven configuration (r8
        #: sf10 family sweep), and complete-mode shapes would
        #: accumulate every run's state/sink rows in the one JVM
        #: (the r9 sf10 heap OOM)
        self.small_only = small_only
        #: per-run output fixup (e.g. un-shift timer timestamps)
        self.post = post
        #: deterministic completion barrier for shapes whose output is
        #: produced by a TRAILING no-data batch (event-time timers and
        #: outer-join null-extensions fire after the watermark
        #: advances, which processAllAvailable does not wait for):
        #: poll the sink until the run's row count reaches this,
        #: instead of racing the trailing batch
        self.expected_rows = expected_rows
        #: sink output mode: "update" for keyed state shapes, "append"
        #: for the join shapes
        self.mode = mode
        #: which session clone hosts the query: "tws" (RocksDB — the
        #: transformWithState requirement) or "stream" (HDFS-backed
        #: store — measured faster for the JVM-only tier)
        self.session_kind = session_kind


class _LiveTws:
    """A live query instance (one generation at a time)."""

    def __init__(self, shape: _Shape, session: SparkSession,
                 sf_dir: str) -> None:
        self.shape = shape
        self.session = session
        self.sf_dir = sf_dir
        self.gen = 0
        self.token = next(_INSTANCE_COUNTER)
        self.runs_done = 0
        self.query = None
        self.spool = ""
        self.ckpt = ""
        #: serializes feed-and-read against THIS query (run_ids and the
        #: spool are per-instance state); the module _LOCK only guards
        #: the registry, so different shapes run concurrently
        self.lock = threading.RLock()
        #: the memory sink holds one generation of per-run output rows
        #: on the driver; output volume scales with the fixture, so
        #: super-threshold dirs recycle on a short generation instead
        #: of piling ~64 runs of rows onto the heap
        from gizmosql_spark.streaming import windows as W

        self.generation_runs = (
            min(shape.generation_runs, 8)
            if W.wide_for_dir(sf_dir) else shape.generation_runs)
        self._start()

    @property
    def sink(self) -> str:
        # the instance token keeps names unique across fixture dirs
        # sharing one session clone (and across rebuild races)
        return f"live_{self.shape.name}_i{self.token}_g{self.gen}"

    def _start(self) -> None:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        # spool on the FIXTURE's filesystem (default /tmp shares the
        # root device with the fixture dirs here) so os.link lands a
        # zero-copy input per run — a tmpfs spool would force a full
        # file copy every run (≈0.5 s at sf10); the checkpoint, which
        # is write-churn not linking, stays on tmpfs
        self.spool = tempfile.mkdtemp(
            prefix=f"gizmosql-live-{self.shape.name}-")
        self.ckpt = tempfile.mkdtemp(
            prefix=f"gizmosql-livec-{self.shape.name}-", dir=base)
        try:
            src = _event_source(self.session, self.sf_dir, self.spool)
            keyed = self.shape.build(self.session, src)
            self.query = (
                keyed.writeStream.outputMode(self.shape.mode)
                .format("memory")
                .queryName(self.sink)
                .option("checkpointLocation", self.ckpt)
                .start()
            )
        except Exception:
            # a failed start must not orphan the dirs it just made
            shutil.rmtree(self.spool, ignore_errors=True)
            shutil.rmtree(self.ckpt, ignore_errors=True)
            raise

    def _teardown(self) -> None:
        try:
            if self.query is not None:
                self.query.stop()
        except Exception:
            pass
        try:
            self.session.catalog.dropTempView(self.sink)
        except Exception:
            pass
        shutil.rmtree(self.spool, ignore_errors=True)
        shutil.rmtree(self.ckpt, ignore_errors=True)
        self.query = None

    def _recycle(self) -> None:
        self._teardown()
        self.gen += 1
        self.runs_done = 0
        self._start()

    def run(self) -> DataFrame:
        """Feed one bounded run through the live query; return its rows
        (run_id dropped, lineage pinned)."""
        if self.query is None or not self.query.isActive:
            # a stopped query consumes nothing yet processAllAvailable
            # returns instantly — raise so the caller rebuilds instead
            # of returning an empty frame
            raise RuntimeError(
                f"live {self.shape.name}: query is not active")
        if self.runs_done >= self.generation_runs:
            self._recycle()
        rid = self.runs_done
        self.runs_done += 1
        src = os.path.join(self.sf_dir, "events.parquet")
        tmp = os.path.join(self.spool, f".run{rid}.parquet")
        dst = os.path.join(self.spool, f"run{rid}.parquet")
        try:
            os.link(src, tmp)
        except OSError:
            shutil.copyfile(src, tmp)
        os.rename(tmp, dst)  # atomic: the run lands in ONE micro-batch
        # Phase instrumentation (r12, VERDICT r11 item 3): the timed
        # path of every stream query is link→paa→poll→post→ckpt; the
        # paa phase contains the source's pollingDelay pickup latency
        # (the micro-batch thread sleeps up to pollingDelay between
        # no-data checks, so a freshly dropped file waits ≤delay to be
        # discovered, plus ≤delay more per trailing no-data batch a
        # shape awaits). SPARK_GRAFT_STREAM_PHASES=1 prints the split
        # so the latency-vs-churn trade is measurable per run.
        import time as _time

        _phases = os.environ.get("SPARK_GRAFT_STREAM_PHASES") == "1"
        _t_paa = _time.perf_counter()
        self.query.processAllAvailable()
        _t_poll = _time.perf_counter()
        rows = self.session.table(self.sink).filter(F.col("run_id") == rid)
        if self.shape.expected_rows is not None:
            want = self.shape.expected_rows(self.session, self.sf_dir)
            # 30 s default is safe because run_live declines every
            # expected_rows shape at wide dirs BEFORE a _LiveTws
            # exists (the trailing no-data batch those shapes wait for
            # scales with the fixture — timer_flush measured ~142 s at
            # sf10, SCALING.md), so this poll only ever runs on
            # sub-threshold dirs; the env override remains for ad-hoc
            # experiments outside that gate
            budget = float(os.environ.get(
                "SPARK_GRAFT_LIVE_POLL_SEC", "30"))
            deadline = _time.monotonic() + budget
            while rows.count() < want:
                if _time.monotonic() > deadline:
                    raise TimeoutError(
                        f"live {self.shape.name} run {rid}: "
                        f"{rows.count()}/{want} rows after {budget}s")
                _time.sleep(0.05)
        _t_post = _time.perf_counter()
        if self.shape.post is not None:
            rows = self.shape.post(rows, rid)
        # pin the rows: the sink keeps growing with later runs and the
        # view is dropped on recycle — the returned frame must not
        # depend on either
        out = rows.drop("run_id").localCheckpoint(eager=True)
        if _phases:
            _t_ck = _time.perf_counter()
            print(
                f"# stream-phase {self.shape.name} run={rid} "
                f"paa={_t_poll - _t_paa:.3f} "
                f"poll={_t_post - _t_poll:.3f} "
                f"ckpt={_t_ck - _t_post:.3f}",
                file=sys.stderr)
        # the batch is committed, the source never re-reads a seen
        # file, and the returned rows are pinned — remove the spooled
        # link/copy now so the spool holds at most one in-flight input
        # regardless of whether os.link or the copy fallback landed it
        try:
            os.remove(dst)
        except OSError:
            pass
        return out


# --- shape builders ----------------------------------------------------


def _build_user_stats(session: SparkSession, src: DataFrame) -> DataFrame:
    from gizmosql_spark.streaming import windows as W

    schema = _with_run(W.USER_STATS_SCHEMA)
    # explicit column pruning: the processor reads only `value`, and
    # projection does not push through transformWithStateInPandas on
    # its own — at sf0.1 this halves the Arrow volume into the worker
    src = src.select("run_id", "user_id", "value")
    return src.groupBy("run_id", "user_id").transformWithStateInPandas(
        statefulProcessor=W._user_stats_processor(run_aware=True),
        outputStructType=schema,
        outputMode="Update",
        timeMode="None",
    )


_TYPE_MATRIX_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _build_type_matrix(session: SparkSession, src: DataFrame) -> DataFrame:
    from gizmosql_spark.streaming import windows as W

    src = src.select("run_id", "user_id", "event_type", "value")
    return src.groupBy("run_id", "user_id").transformWithStateInPandas(
        statefulProcessor=W._type_matrix_processor(run_aware=True),
        outputStructType=_with_run(_TYPE_MATRIX_SCHEMA),
        outputMode="Update",
        timeMode="None",
    )


_RECENT_EVENTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("rn", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
    ]
)


def _build_recent_events(session: SparkSession, src: DataFrame) -> DataFrame:
    from gizmosql_spark.streaming import windows as W

    events = src.select(
        "run_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    return events.groupBy("run_id", "user_id").transformWithStateInPandas(
        statefulProcessor=W._recent_events_processor(run_aware=True),
        outputStructType=_with_run(_RECENT_EVENTS_SCHEMA),
        outputMode="Update",
        timeMode="None",
    )


def _build_running_totals(session: SparkSession,
                          src: DataFrame) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    from gizmosql_spark.streaming import windows as W

    return (
        src.select("run_id", "user_id", "value")
        .groupBy("run_id", "user_id")
        .applyInPandasWithState(
            W._running_totals_run_aware,
            outputStructType=_with_run(W.RUNNING_OUTPUT_SCHEMA),
            stateStructType=W.RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SEEDED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("count", LongType()),
        StructField("total", DoubleType()),
    ]
)


class _SeededBuild:
    """seeded_stats needs the fixture dir at build time: its
    initialState (the warehouse-snapshot aggregate) is baked into the
    query start, replicated across one generation of run_ids."""

    def __init__(self, sf_dir: str) -> None:
        self.sf_dir = sf_dir

    def __call__(self, session: SparkSession, src: DataFrame) -> DataFrame:
        from gizmosql_spark.operators import loader
        from gizmosql_spark.operators.events import load_events
        from gizmosql_spark.streaming import windows as W

        seed_one = loader.keyed_persist(
            session, f"streaming.seeded_stats_seed:{self.sf_dir}",
            lambda: load_events(session, self.sf_dir)
            .filter(F.col("event_id") < W._SEED_SPLIT_ID)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("seed_count"),
                F.sum("value").alias("seed_total"),
            ),
        )
        runs = session.range(SEED_GENERATION_RUNS).select(
            F.col("id").alias("run_id"))
        seed = seed_one.crossJoin(runs).groupBy("run_id", "user_id")
        ev = src.filter(F.col("event_id") >= W._SEED_SPLIT_ID).select(
            "run_id", "user_id", "value")
        return ev.groupBy("run_id", "user_id").transformWithStateInPandas(
            statefulProcessor=W._seeded_stats_processor(run_aware=True),
            outputStructType=_with_run(_SEEDED_SCHEMA),
            outputMode="Update",
            timeMode="None",
            initialState=seed,
        )


#: per-run event-time shift for the timer shape: each run's events are
#: moved into their own disjoint time frame so the live query's
#: monotonic watermark never marks a later run's (otherwise identical)
#: timestamps late, and leftover timers from run N can't collide with
#: run N+1 keys. 4096 h per run >> the fixture's ~31-day span; output
#: flush timestamps are shifted back by the same constant.
_TIMER_SHIFT_MS = 4096 * 3600 * 1000
_TIMER_SHIFT_US = _TIMER_SHIFT_MS * 1000

_TIMER_EXPECTED: dict[str, int] = {}


def _timer_expected_rows(session: SparkSession, sf_dir: str) -> int:
    """How many users the bounded timer query emits: those whose
    (first event + flush interval) precedes the final watermark
    (max ts − 10 min) — the oracle's WHERE clause, counted once per
    fixture dir and cached."""
    got = _TIMER_EXPECTED.get(sf_dir)
    if got is None:
        from gizmosql_spark.operators.events import load_events
        from gizmosql_spark.streaming import windows as W

        ev = load_events(session, sf_dir).select(
            "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"))
        per_user = ev.groupBy("user_id").agg(
            F.min("ms").alias("lo"), F.max("ms").alias("hi"))
        # 1-row broadcast cross join for the global max — NOT a
        # collect_list of every user into one row (driver-side blowup
        # once user cardinality scales with the fixture)
        wm_hi = per_user.agg(F.max("hi").alias("wm_hi"))
        got = (
            per_user.join(F.broadcast(wm_hi))
            .filter(F.col("lo") + W._TIMER_FLUSH_MS
                    < F.col("wm_hi") - 600000)
            .count()
        )
        _TIMER_EXPECTED[sf_dir] = got
    return got


def _build_timer_flush(session: SparkSession, src: DataFrame) -> DataFrame:
    from gizmosql_spark.streaming import windows as W

    shifted = src.withColumn(
        "ts_shift",
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.col("run_id") * F.lit(_TIMER_SHIFT_US)),
    )
    events = shifted.withWatermark("ts_shift", "10 minutes").select(
        "run_id", "user_id", "value",
        F.unix_millis(F.col("ts_shift")).alias("ts_ms"), "ts_shift",
    )
    schema = _with_run(StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total", DoubleType()),
        StructField("flush_ms", LongType()),
    ]))
    return events.groupBy("run_id", "user_id").transformWithStateInPandas(
        statefulProcessor=W._timer_flush_processor(
            W._TIMER_FLUSH_MS, run_aware=True),
        outputStructType=schema,
        outputMode="Update",
        timeMode="EventTime",
    )


def _timer_post(rows: DataFrame, rid: int) -> DataFrame:
    return rows.withColumn(
        "flush_ms", F.col("flush_ms") - F.lit(rid * _TIMER_SHIFT_MS))


# --- JVM-tier shapes (windowed aggs + stream-stream joins) -------------
#
# Watermarked operators filter rows older than the query's MONOTONIC
# watermark, so every JVM-tier shape shifts each run's event times into
# a disjoint frame (the timer shape's trick, generalized): run N+1's
# otherwise-identical timestamps land Δ ahead of run N's watermark.
# Δ = 4096 h is an exact multiple of every window/slide/gap in the
# tier, so bucket boundaries stay congruent and outputs shift back by
# exactly rid·Δ.


def _shift(src: DataFrame) -> DataFrame:
    return src.withColumn(
        "ts_shift",
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.col("run_id") * F.lit(_TIMER_SHIFT_US)),
    )


def _unshift(col: str, rid: int) -> F.Column:
    return F.timestamp_micros(
        F.unix_micros(F.col(col)) - rid * _TIMER_SHIFT_US).alias(col)


def _build_tumbling(session: SparkSession, src: DataFrame) -> DataFrame:
    ev = _shift(src).withWatermark("ts_shift", "10 minutes")
    return (
        ev.groupBy("run_id", F.window("ts_shift", "1 hour").alias("w"),
                   "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total"))
        .select("run_id", F.col("w.start").alias("window_start"),
                "event_type", "n", "total")
    )


def _tumbling_post(rows: DataFrame, rid: int) -> DataFrame:
    return rows.withColumn(
        "window_start",
        F.timestamp_micros(
            F.unix_micros(F.col("window_start"))
            - rid * _TIMER_SHIFT_US))


def _build_sliding(session: SparkSession, src: DataFrame) -> DataFrame:
    ev = _shift(src).withWatermark("ts_shift", "10 minutes")
    return (
        ev.groupBy("run_id",
                   F.window("ts_shift", "1 hour", "15 minutes").alias("w"),
                   "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("run_id", F.col("w.start").alias("window_start"),
                "event_type", "n")
    )


def _build_session_windows(session: SparkSession,
                           src: DataFrame) -> DataFrame:
    ev = _shift(src).withWatermark("ts_shift", "10 minutes")
    return (
        ev.groupBy("run_id",
                   F.session_window("ts_shift", "30 minutes").alias("w"),
                   "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "run_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events", "total_value",
        )
    )


def _session_post(rows: DataFrame, rid: int) -> DataFrame:
    return rows.withColumn(
        "session_start",
        F.timestamp_micros(
            F.unix_micros(F.col("session_start")) - rid * _TIMER_SHIFT_US)
    ).withColumn(
        "session_end",
        F.timestamp_micros(
            F.unix_micros(F.col("session_end")) - rid * _TIMER_SHIFT_US))


def _build_static_join(session: SparkSession, src: DataFrame) -> DataFrame:
    tiers = session.range(0, 1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 3).alias("tier"))
    ev = _shift(src).withWatermark("ts_shift", "10 minutes")
    return (
        ev.join(F.broadcast(tiers), "user_id")
        .groupBy("run_id", "tier")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total"))
    )


def _join_sides(src: DataFrame) -> tuple[DataFrame, DataFrame]:
    shifted = _shift(src)
    clicks = (
        shifted.filter(F.col("event_type") == "click")
        .select(
            F.col("run_id").alias("c_run"),
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts_shift").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        shifted.filter(F.col("event_type") == "purchase")
        .select(
            F.col("run_id").alias("p_run"),
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts_shift").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    return clicks, purchases


def _build_stream_join(session: SparkSession, src: DataFrame,
                       how: str = "inner") -> DataFrame:
    clicks, purchases = _join_sides(src)
    joined = clicks.join(
        purchases,
        (F.col("c_run") == F.col("p_run"))
        & (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        how,
    )
    return joined.select(
        F.col("c_run").alias("run_id"),
        "click_id", "purchase_id", "c_user", "c_ts", "p_ts")


def _join_post(rows: DataFrame, rid: int) -> DataFrame:
    return rows.withColumn(
        "c_ts",
        F.timestamp_micros(
            F.unix_micros(F.col("c_ts")) - rid * _TIMER_SHIFT_US)
    ).withColumn(
        "p_ts",
        F.timestamp_micros(
            F.unix_micros(F.col("p_ts")) - rid * _TIMER_SHIFT_US))


_OUTER_EXPECTED: dict[str, int] = {}


def _outer_join_expected_rows(session: SparkSession, sf_dir: str) -> int:
    """Rows the bounded outer join emits: every interval match, plus a
    null-extension for each unmatched click whose join window closed
    strictly before the final watermark (Spark's eviction rule — the
    oracle's WHERE clause). Computed once per fixture dir in batch."""
    got = _OUTER_EXPECTED.get(sf_dir)
    if got is None:
        from gizmosql_spark.operators.events import load_events

        ev = load_events(session, sf_dir)
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"))
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"))
        cond = ((F.col("c_user") == F.col("p_user"))
                & (F.col("p_ts") > F.col("c_ts"))
                & (F.col("p_ts") <= F.col("c_ts")
                   + F.expr("INTERVAL 1 HOUR")))
        matched = c.join(p, cond).count()
        wm_row = (
            c.agg(F.max("c_ts").alias("mc")).crossJoin(
                p.agg(F.max("p_ts").alias("mp")))
            .select(F.least("mc", "mp").alias("wm")).collect()[0])
        wm = wm_row["wm"]
        evicted = (
            c.join(p, cond, "left_anti")
            .filter(F.col("c_ts") + F.expr("INTERVAL 1 HOUR")
                    < F.lit(wm) - F.expr("INTERVAL 10 MINUTES"))
            .count()
        )
        got = matched + evicted
        _OUTER_EXPECTED[sf_dir] = got
    return got


def _shapes(sf_dir: str) -> dict[str, _Shape]:
    return {
        "user_stats": _Shape("user_stats", _build_user_stats),
        "type_matrix": _Shape("type_matrix", _build_type_matrix),
        "recent_events": _Shape(
            "recent_events", _build_recent_events),
        "running_totals": _Shape(
            "running_totals", _build_running_totals),
        "seeded_stats": _Shape(
            "seeded_stats", _SeededBuild(sf_dir),
            generation_runs=SEED_GENERATION_RUNS),
        "timer_flush": _Shape(
            "timer_flush", _build_timer_flush,
            post=_timer_post, expected_rows=_timer_expected_rows),
        # JVM tier (HDFS-backed store clone; append mode for joins)
        "tumbling": _Shape(
            "tumbling", _build_tumbling,
            post=_tumbling_post, session_kind="stream", small_only=True),
        "sliding": _Shape(
            "sliding", _build_sliding,
            post=_tumbling_post, session_kind="stream", small_only=True),
        # session-window streaming aggregation REJECTS update mode
        # (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION on Spark 4.1);
        # complete mode re-emits every accumulated session each batch,
        # so this shape recycles on a short generation to bound the
        # re-emission (and the sink snapshot) to a few runs' sessions
        "session_windows": _Shape(
            "session_windows", _build_session_windows,
            post=_session_post, session_kind="stream",
            mode="complete", generation_runs=8, small_only=True),
        "static_join": _Shape(
            "static_join", _build_static_join,
            session_kind="stream", small_only=True),
        "stream_join": _Shape(
            "stream_join",
            lambda sess, src: _build_stream_join(sess, src, "inner"),
            post=_join_post, mode="append", session_kind="stream",
            small_only=True),
        "outer_join": _Shape(
            "outer_join",
            lambda sess, src: _build_stream_join(sess, src, "left_outer"),
            post=_join_post, mode="append", session_kind="stream",
            expected_rows=_outer_join_expected_rows, small_only=True),
    }


def run_live(spark: SparkSession, shape_name: str,
             sf_dir: str) -> DataFrame | None:
    """Feed one bounded run through the (created-on-demand) live query
    for ``shape_name``. Returns None when the live path is unavailable
    or failed — callers fall back to the bounded availableNow path."""
    from gizmosql_spark.streaming import windows as W

    shape = _shapes(sf_dir).get(shape_name)
    if shape is None:
        return None
    # the protobuf state-server runtime gates ONLY the TWS shapes —
    # the JVM-only tier must keep its live path when it is absent
    if shape.session_kind == "tws" and not W.tws_available():
        return None
    if shape.small_only and W.wide_for_dir(sf_dir):
        return None  # bounded path at scale (see _Shape.small_only)
    if shape.expected_rows is not None and W.wide_for_dir(sf_dir):
        # trailing-no-data-batch shapes (event-time timers, outer-join
        # null flushes) decline the live path at super-threshold dirs:
        # the barrier poll waits for a trailing batch whose cost scales
        # with the fixture (sf10 measured ~230 s/run live vs ~47 s/run
        # bounded for timer_flush — the r10 sf10 record read 699 s vs
        # 142 s before this gate), while the live path's whole economy
        # is amortizing ~1 s of query-start cost. Bounded availableNow
        # is the proven configuration at scale.
        return None
    if shape.session_kind == "tws":
        session = W.tws_streaming_session(spark)
    else:
        session = W.streaming_session(
            spark, wide=W.wide_for_dir(sf_dir))
    key = (shape_name, sf_dir)
    # the global lock covers ONLY dict lookups — query START takes ~1 s
    # (mkdtemp + StreamingPythonRunner spawn), so creation happens under
    # a PER-KEY lock instead: concurrent clients creating DIFFERENT
    # shapes proceed in parallel, while two clients racing on the SAME
    # key serialize and the loser finds the winner's instance in the
    # registry. Each instance additionally carries its own lock for the
    # feed-and-read critical section (runs against one query must
    # serialize: run_ids and the spool are per-instance state).
    with _LOCK:
        create_lock = _CREATE_LOCKS.setdefault(key, threading.RLock())
    for attempt in (0, 1):
        with create_lock:
            with _LOCK:
                live = _REGISTRY.get(key)
            try:
                if live is None or live.session is not session \
                        or live.query is None:
                    if live is not None:
                        live._teardown()
                    live = _LiveTws(shape, session, sf_dir)
                    with _LOCK:
                        _REGISTRY[key] = live
            except Exception:
                with _LOCK:
                    _REGISTRY.pop(key, None)
                if attempt == 1:
                    return None
                continue
        try:
            with live.lock:
                return live.run()
        except Exception as ex:
            # first failure: drop this live query and rebuild once
            # (covers a torn-down clone / dead worker pool); second
            # failure: give up, caller takes the bounded fallback.
            # A barrier-poll TIMEOUT is different: the query was
            # healthy but slow, so a rebuilt query would just time out
            # again — skip the retry and fall back immediately.
            # _LOCK covers ONLY the registry pop: _teardown() blocks on
            # query.stop() (joins the execution thread), and holding
            # the global lock across it would serialize every other
            # shape — the very contention the per-key locks remove.
            # The teardown itself runs under the PER-KEY create_lock
            # (two racing failure handlers must not cascade into
            # duplicate rebuilds of the same key) AND the instance
            # lock (a concurrent client that already fetched this
            # instance from the registry must not have its in-flight
            # run killed mid-processAllAvailable — it finishes, then
            # the teardown proceeds). Both are per-key scoped, so the
            # no-cross-shape-serialization property holds; lock order
            # create_lock→live.lock matches the create path, so no
            # inversion is possible.
            with _LOCK:
                if _REGISTRY.get(key) is live:
                    _REGISTRY.pop(key, None)
            with create_lock, live.lock:
                try:
                    live._teardown()
                except Exception:
                    pass
            if attempt == 1 or isinstance(ex, TimeoutError):
                return None
    return None


def reset_all() -> None:
    """Tear down every live query (called from
    windows._reset_streaming_session after a crash signature: the TWS
    clone these queries are bound to is being rebuilt)."""
    with _LOCK:
        for live in list(_REGISTRY.values()):
            try:
                live._teardown()
            except Exception:
                pass
        _REGISTRY.clear()


def quiesce(spark: SparkSession, timeout: float = 30.0) -> list[str]:
    """Stop every streaming query on every session clone and WAIT until
    no stream-execution thread is active — call this immediately before
    ``SparkSession.stop()`` / process exit, never rely on the atexit
    hook for it.

    Round-9 postmortem (VERDICT r9 item 1): bench.py called
    ``spark.stop()`` while the live queries were still running; their
    stream-execution threads died dumping ``RpcEnvStoppedException``
    stack traces that landed AFTER the bench summary line and pushed it
    out of the driver's bounded tail capture — BENCH_r09 came back
    ``parsed: null``. ``StreamingQuery.stop()`` joins the execution
    thread, so after this returns no streaming thread can outlive the
    SparkContext.

    Returns the names of any queries still active at timeout (empty on
    a clean quiesce) so callers can assert/log.
    """
    import time as _time

    # Post-measurement noise control (quiesce only ever runs at
    # teardown, after ALL measurement is complete): stopping an IDLE
    # streaming query unconditionally cancels its run-id job group,
    # and the DAGScheduler answers with a benign-by-construction
    # "Failed to cancel job group … Cannot find active jobs for it"
    # WARN — two per query, ~30 lines between the last query line and
    # the summary. The record protocol requires the captured tail to
    # be clean, not merely for the summary to land last (VERDICT r10
    # item 4) — demote that one logger to ERROR for the remainder of
    # the process.
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:
        pass

    reset_all()
    from gizmosql_spark.streaming import windows as W

    # streams are per-SESSION managers: the live/bounded queries run on
    # the windows.py clones, not the base session — sweep all of them
    sessions = [spark]
    sessions += [s for s in W._STREAM_SESSION.values() if s is not None]
    if W._TWS_SESSION is not None:
        sessions.append(W._TWS_SESSION)
    leftovers: list[str] = []
    deadline = _time.monotonic() + timeout
    for s in sessions:
        try:
            # stop() joins the execution thread; bound the join so a
            # wedged query cannot hang quiesce forever (the clones set
            # this at creation — re-assert for the base session and
            # any externally built clone)
            try:
                s.conf.set("spark.sql.streaming.stopTimeout", "15000")
            except Exception:
                pass
            for q in s.streams.active:
                # the deadline bounds the STOP calls too, not just the
                # drain wait below: each stop() joins its execution
                # thread for up to stopTimeout (15 s), so a set of
                # wedged queries could otherwise hold quiesce for
                # minutes while the caller believed `timeout` was the
                # ceiling — skip remaining stops once exceeded and
                # surface them as leftovers instead
                if _time.monotonic() > deadline:
                    leftovers.append(q.name or q.id)
                    continue
                try:
                    q.stop()  # joins the stream-execution thread
                except Exception:
                    pass
            while s.streams.active:
                if _time.monotonic() > deadline:
                    leftovers += [
                        q.name or q.id
                        for q in s.streams.active
                        if (q.name or q.id) not in leftovers
                    ]
                    break
                _time.sleep(0.05)
        except Exception:
            pass
    # The state-store maintenance executor is a JVM-global singleton
    # that outlives ``spark.stop()`` by up to one maintenance interval
    # and then dumps an ``IllegalStateException: SparkEnv already
    # stopped`` ~10 s AFTER the summary line (the BENCH_r10 tail).
    # Every streaming query is stopped and joined at this point, so
    # shut the executor down explicitly — StateStore.stop() is the
    # JVM-side teardown Spark itself runs on context shutdown, just
    # sequenced here BEFORE the context goes away.
    try:
        jvm = spark._jvm
        mod = getattr(
            getattr(jvm.org.apache.spark.sql.execution.streaming.state,
                    "StateStore$"), "MODULE$")
        mod.stop()
    except Exception:
        pass
    return leftovers
