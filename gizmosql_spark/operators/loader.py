"""Shared fixture-table loader with plan memoization.

``spark.read.parquet`` builds a fresh InMemoryFileIndex + reads the
footer schema every call; operators run many queries over the same ten
tables, so the resolved DataFrames (immutable logical plans) are
memoized per (session, dir, table). On a cluster the same role is
played by the catalog (tables registered once); this keeps the
fixture-path API allocation-free per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _CACHE[key] = df
    return df
