"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``).

The reference's extension mechanism is DuckDB extensions (INSTALL/LOAD,
admin-gated — /root/reference/src/duckdb/admin_command_guard.cpp:315-319)
and table functions like ``read_parquet()``/``glob()``. The Spark-native
analog for *new source kinds* is the Python DataSource API: a planner-
integrated source with partition-parallel reads that works for both
``spark.read`` and ``spark.readStream``.

``synthetic_events`` generates a deterministic event table from a seeded
LCG — the local stand-in for an external feed (at scale: one partition
per upstream shard; the generator kernel is replaced by the shard
fetch). Batch reads split the row range across ``numPartitions`` evenly;
the stream reader emits fixed-size micro-batches of the same rows, so
streaming results can be checked against the batch ones.

Determinism contract (mirrored by the DuckDB oracle in
operators/events.py): for row i,
    lcg(i)    = (1103515245 * i + 12345) mod 2^31
    user_id   = lcg(i) mod 97
    event_type= types[lcg(i) mod 4],  types = [view, click, purchase, refund]
    value     = (lcg(i) mod 10000) / 100.0
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

EVENT_TYPES = ("view", "click", "purchase", "refund")
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2**31

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _row(i: int) -> tuple:
    h = (_LCG_A * i + _LCG_C) % _LCG_M
    return (i, h % 97, EVENT_TYPES[h % 4], (h % 10000) / 100.0)


def _arrow_batch(start: int, end: int):
    """Vectorized range generation as one Arrow batch — the fast read
    path (a reader may yield RecordBatches instead of tuples; ~100x
    less per-row Python overhead)."""
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.int64)
    h = (_LCG_A * i + _LCG_C) % _LCG_M
    types = np.array(EVENT_TYPES)[h % 4]
    return pa.record_batch(
        [
            pa.array(i),
            pa.array(h % 97),
            pa.array(types),
            pa.array((h % 10000) / 100.0),
        ],
        names=["event_id", "user_id", "event_type", "value"],
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        n, p = self.rows, self.num_partitions
        step = (n + p - 1) // p if p else n
        return [
            _RangePartition(s, min(s + step, n)) for s in range(0, n, max(step, 1))
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        yield _arrow_batch(partition.start, partition.end)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset = rows emitted so far; each micro-batch advances by
    ``batchSize`` until ``rows`` is exhausted (then the stream idles).
    """

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch_size = int(options.get("batchSize", 250))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        return {"offset": self.rows}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["offset"], end["offset"]
        out = []
        for s in range(lo, hi, self.batch_size):
            out.append(_RangePartition(s, min(s + self.batch_size, hi)))
        return out or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of all custom Python data sources.

    Truly once-per-session: ``spark.dataSource.register`` pickles the
    class and ships it to the JVM-side registry on every call, so a
    per-query register (each corpus query calls this defensively)
    would re-serialize and re-stage the source 250 times per session.
    The sentinel keeps it to one registration per SparkSession."""
    flag = "_gizmosql_pyds_registered"
    if getattr(spark, flag, False):
        return
    spark.dataSource.register(SyntheticEventsDataSource)
    setattr(spark, flag, True)
