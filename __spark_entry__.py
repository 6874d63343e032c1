"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H h01) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for the differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H h01) on /root/testdata/sf0.001."""
    from gizmosql_spark.operators import tpch

    return tpch.q01(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    from gizmosql_spark.operators import (
        dedup,
        events,
        multimodal,
        relational,
        scale,
        similarity,
        text,
        tpch,
    )

    from gizmosql_spark.streaming import windows as streaming_windows

    out.update(tpch.QUERIES)
    out.update(relational.QUERIES)
    out.update(events.QUERIES)
    out.update(text.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(streaming_windows.QUERIES)
    out.update(scale.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL, keyed identically to ``queries()``."""
    out: dict[str, str] = {}

    from gizmosql_spark.operators import (
        dedup,
        events,
        multimodal,
        relational,
        scale,
        similarity,
        text,
        tpch,
    )

    from gizmosql_spark.streaming import windows as streaming_windows

    out.update(tpch.ORACLE)
    out.update(relational.ORACLE)
    out.update(events.ORACLE)
    out.update(text.ORACLE)
    out.update(dedup.ORACLE)
    out.update(similarity.ORACLE)
    out.update(multimodal.ORACLE)
    out.update(streaming_windows.ORACLE)
    out.update(scale.ORACLE)
    return out
