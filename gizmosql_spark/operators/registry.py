"""Single registry of every pipeline/query operator.

``__spark_entry__.queries()`` (the driver contract) and the engine's
``pipeline_op('<name>', '<dir>')`` SQL table function both resolve
operators here, so the SQL surface and the Python surface can never
drift apart. Import cost is deferred to first use (the operator
modules pull in pandas/geo codecs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] | None = None
_ORACLES: dict[str, str] | None = None


def _load() -> None:
    global _QUERIES, _ORACLES
    if _QUERIES is not None:
        return
    from gizmosql_spark.operators import (
        dedup,
        evalops,
        events,
        extensions,
        lm,
        multimodal,
        quality,
        relational,
        sampling,
        scale,
        similarity,
        sketch,
        text,
        tpch,
        training,
    )
    from gizmosql_spark.streaming import windows as streaming_windows

    # streaming first: dict order is the harness's default run order,
    # and the TWS state-server tier is most robust on a fresh JVM —
    # before 200+ batch queries accumulate heap/GC pressure (the
    # round-3/4 official-record crashes both happened late in the run)
    modules = [
        streaming_windows, tpch, relational, events, text, quality,
        dedup, similarity, multimodal, sampling, training, sketch,
        scale, extensions, evalops, lm,
    ]
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    o: dict[str, str] = {}
    for mod in modules:
        dup_q = set(q) & set(mod.QUERIES)
        dup_o = set(o) & set(mod.ORACLE)
        if dup_q or dup_o:
            raise AssertionError(
                f"duplicate operator key(s) {sorted(dup_q | dup_o)} in "
                f"{mod.__name__} — rename the new operator; silent "
                "shadowing corrupts the bench/correctness records")
        q.update(mod.QUERIES)
        o.update(mod.ORACLE)
    _QUERIES, _ORACLES = q, o


def pipeline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name → fn(spark, sf_dir) for every registered operator."""
    _load()
    assert _QUERIES is not None
    return _QUERIES


def pipeline_oracles() -> dict[str, str]:
    """name → DuckDB oracle SQL (same keys as pipeline_queries)."""
    _load()
    assert _ORACLES is not None
    return _ORACLES


def resolve(name: str) -> Callable[[SparkSession, str], DataFrame]:
    """Look up one operator; raises KeyError with the known-name list
    trimmed for the SQL error message."""
    qs = pipeline_queries()
    if name not in qs:
        known = ", ".join(sorted(qs)[:12])
        raise KeyError(
            f"unknown pipeline operator {name!r} (known: {known}, …)")
    return qs[name]
