"""Catalog logging: fork the statement-log stream to a queryable
``logs`` table (reference docs/catalog_logging.md, Enterprise tier).

Reference contract re-expressed Spark-first:

- The records emitted to the in-memory ring (querylog.QueryLog) are
  ALSO written to an append-only ``logs`` table under the warehouse —
  queryable with SQL, retained across restarts, joinable to the
  instrumentation tables.
- Writes happen on a **dedicated writer thread** behind a **bounded
  hand-off queue**: if the sink cannot keep up, the newest records are
  dropped and counted (a throttled stderr WARNING reports the running
  total). Submitting a record can never block or fail a client query.
- Each batch lands via one Spark parquet append job — the job-commit
  protocol is the analog of the reference's explicit per-batch
  transaction (committed on success, nothing visible on failure).
- The log table is **system-managed**: readable only by admins through
  the ``engine_logs()`` table function (engine.py wires the gate),
  never client-writable (it is not a registered catalog table, so DML
  cannot target it), and not detachable.

Scale notes: the writer batches whatever has queued since the last
write, so file counts stay proportional to log *pressure*, not record
count; at fleet scale the same sink points at an object-store prefix
and downstream compaction (OPTIMIZE) folds small files.
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time

from pyspark.sql import DataFrame, SparkSession

#: schema of the logs table (reference logs-table columns: timestamp,
#: level, message + statement telemetry the engine's ring carries)
LOG_SCHEMA = (
    "at double, level string, session_id string, message string,"
    " status string, elapsed_ms double"
)

_WARN_INTERVAL_S = 5.0


class CatalogLogSink:
    """Bounded-queue, dedicated-thread append sink for log records."""

    def __init__(self, spark: SparkSession, path: str,
                 queue_max: int = 1000, poll_s: float = 0.1,
                 start: bool = True):
        self.spark = spark
        self.path = path
        self._q: queue.Queue = queue.Queue(maxsize=queue_max)
        self._poll_s = poll_s
        self.dropped = 0
        self._submitted = 0
        self._done = 0  # written or dropped
        self._cond = threading.Condition()
        self._last_warn = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        if start:
            self.start()

    def start(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            self._thread = threading.Thread(
                target=self._run, daemon=True, name="catalog-log-writer"
            )
            self._thread.start()

    # -- producer side (client query path — must never block) --------

    def submit(self, at: float, level: str, session_id: str,
               message: str, status: str, elapsed_ms: float) -> None:
        """Enqueue one record; on overflow drop it and count (the
        reference drops the NEWEST records when the catalog can't
        keep up — same policy here)."""
        rec = (float(at), level, session_id, message, status,
               float(elapsed_ms))
        with self._cond:
            self._submitted += 1
        try:
            self._q.put_nowait(rec)
        except queue.Full:
            with self._cond:
                self.dropped += 1
                self._done += 1
                self._cond.notify_all()
            now = time.time()
            if now - self._last_warn > _WARN_INTERVAL_S:
                self._last_warn = now
                print(
                    f"WARNING: catalog log queue full — dropped "
                    f"{self.dropped} records so far",
                    file=sys.stderr,
                )

    # -- writer side --------------------------------------------------

    def _run(self) -> None:
        while True:
            try:
                first = self._q.get(timeout=self._poll_s)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            batch = [first]
            while True:
                try:
                    batch.append(self._q.get_nowait())
                except queue.Empty:
                    break
            try:
                self._write_batch(batch)
            except Exception as ex:  # sink failure never propagates
                print(f"WARNING: catalog log write failed: {ex}",
                      file=sys.stderr)
            finally:
                with self._cond:
                    self._done += len(batch)
                    self._cond.notify_all()

    def _write_batch(self, batch: list[tuple]) -> None:
        # Direct pyarrow write, no Spark job: the reference writes on a
        # dedicated connection precisely so logging never contends with
        # client queries — a per-batch Spark job would re-couple them
        # (and Python-worker jobs from a second thread race the client
        # thread's). Temp-file + atomic rename is the per-batch commit
        # (nothing visible on failure); Spark's reader skips dot-files.
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.path, exist_ok=True)
        at, level, sid, msg, status, ms = zip(*batch)
        table = pa.table(
            {
                "at": pa.array(at, pa.float64()),
                "level": pa.array(level, pa.string()),
                "session_id": pa.array(sid, pa.string()),
                "message": pa.array(msg, pa.string()),
                "status": pa.array(status, pa.string()),
                "elapsed_ms": pa.array(ms, pa.float64()),
            }
        )
        token = uuid.uuid4().hex
        tmp = os.path.join(self.path, f".tmp-{token}")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.path, f"batch-{token}.parquet"))

    # -- control ------------------------------------------------------

    def flush(self, timeout: float = 30.0) -> bool:
        """Wait until every submitted record is written or dropped."""
        deadline = time.time() + timeout
        with self._cond:
            while self._done < self._submitted:
                remaining = deadline - time.time()
                if remaining <= 0:
                    return False
                self._cond.wait(remaining)
        return True

    def close(self, timeout: float = 30.0) -> None:
        self.flush(timeout)
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)

    # -- read side -----------------------------------------------------

    def logs_df(self, spark: SparkSession | None = None) -> DataFrame:
        """The logs table as a DataFrame (empty frame if nothing has
        been written yet). Pass the reader's session so temp views
        registered from this frame land in that session's registry."""
        spark = spark or self.spark
        if os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return spark.read.schema(LOG_SCHEMA).parquet(self.path)
        return spark.createDataFrame([], LOG_SCHEMA)
