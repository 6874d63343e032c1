"""Parallelism-invariance gates: the determinism devices (md5-keyed
sampling, integer stratification, in-engine rounding) claim results
independent of partitioning. Prove it: run the same operator over
inputs repartitioned to 1, 3, and 32 partitions and require
bit-identical sorted results.

This is the local stand-in for the 100 TB claim that a 1000-executor
run returns exactly what local[32] returns."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"

#: operators whose results must not depend on physical partitioning
_INVARIANT_OPS = [
    "dataset_split",
    "grouped_split",
    "systematic_sample",
    "stratified_sample",
    "weighted_sample",
    "dedup_exact",
    "approx_distinct_hll",
    "token_count",
    "skyline_parts",
    "assoc_rules",
    "mutual_information",
    # round-3 determinism devices: Poisson-bootstrap hash weights,
    # integer-exact rank statistics, register merging, score decay
    "bootstrap_ci_mean",
    "auc_roc",
    "spearman_corr",
    "hll_rolling_merge",
    "decayed_user_score",
]


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.mark.parametrize("name", _INVARIANT_OPS)
def test_result_invariant_under_shuffle_width(spark, name):
    """Same operator, three shuffle widths → identical results."""
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    part_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(part_key)
    results = []
    try:
        for parts in ("1", "3", "32"):
            spark.conf.set(part_key, parts)
            results.append(_rows(fn(spark, SF)))
    finally:
        spark.conf.set(part_key, prev)
    assert results[0] == results[1] == results[2], (
        f"{name}: results vary with shuffle width")


def test_split_membership_invariant_under_repartition(spark):
    """dataset_split membership is a pure row-key function: hash the
    per-split doc_id sets computed from a 1-partition and a 16-way
    repartitioned scan of the same documents."""
    from pyspark.sql import functions as F

    from gizmosql_spark.operators.sampling import _TRAIN_MAX, _VAL_MAX

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < _TRAIN_MAX, F.lit("train"))
        .when(h < _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    out = []
    for df in (docs.coalesce(1), docs.repartition(16)):
        out.append(sorted(
            map(str, df.select("doc_id", split.alias("s")).collect())))
    assert out[0] == out[1]
