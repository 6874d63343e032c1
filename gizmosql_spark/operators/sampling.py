"""Deterministic sampling / splitting for training-data pipelines.

Extension tier (SURVEY §7 Phase 5 family). A curation pipeline needs
reproducible row selection — the same corpus must split the same way
on every run, on any engine, at any parallelism:

- **dataset_split**: hash-based train/val/test assignment. The split
  key is ``md5(doc_id)``; buckets are LEXICOGRAPHIC ranges of the hex
  string (hex is uniform, so prefix thresholds are proportions:
  ``< 'cd'`` ≈ 205/256 ≈ 80%). No RNG, no seed state, no engine hash
  — bit-identical across Spark and the DuckDB oracle.
- **stratified_sample**: per-stratum deterministic rates (downsample
  the dominant language, keep the tail) with the same md5-threshold
  trick; emits the kept rows, so the differential check verifies the
  exact membership, not just counts.
- **reservoir-style per-group top-k** (``grouped_head``): the
  deterministic analog of per-group reservoir sampling — rank by
  md5(key) inside each group, keep k. One window, one shuffle.

100 TB path: all three are scan + hash + (at most) one window
shuffle; selection is a pure function of the row key, so re-runs and
backfills select identical rows regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


#: hex-prefix thresholds: md5 < 'cd' → train (~80.1%), < 'e6' → val
#: (~89.8%), rest test. Two-hex-char granularity = 1/256 steps.
_TRAIN_MAX = "cd"
_VAL_MAX = "e6"


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split summary over documents."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < _TRAIN_MAX, F.lit("train"))
        .when(h < _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("split")
    )


#: per-language keep thresholds: downsample English hard, keep the
#: rest at higher rates (the classic rebalancing move)
_LANG_RATES = {"en": "20", "de": "cd", "fr": "cd"}
_DEFAULT_RATE = "e6"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sample: exact kept-row membership
    (doc_id order) so the oracle verifies selection, not counts."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    thr = F.lit(_DEFAULT_RATE)
    for lang, rate in sorted(_LANG_RATES.items()):
        thr = F.when(F.col("lang") == lang, F.lit(rate)).otherwise(thr)
    return (
        d.select("doc_id", "lang", "source", h.alias("h"), thr.alias("thr"))
        .filter(F.col("h") < F.col("thr"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


GROUP_K = 5


def grouped_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group k rows (reservoir-sampling analog):
    rank by md5(doc_id) within (lang, source), keep GROUP_K. The hash
    ordering is the uniform-random draw, made reproducible."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_K)
        .select("lang", "source", "doc_id", "rk")
        .orderBy("lang", "source", "rk")
    )


QUERIES = {
    "dataset_split": dataset_split,
    "stratified_sample": stratified_sample,
    "grouped_head": grouped_head,
}

ORACLE: dict[str, str] = {
    "dataset_split": f"""
        SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_TRAIN_MAX}'
                    THEN 'train'
                    WHEN md5(CAST(doc_id AS VARCHAR)) < '{_VAL_MAX}'
                    THEN 'val' ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) <
              CASE lang WHEN 'en' THEN '20' WHEN 'de' THEN 'cd'
                        WHEN 'fr' THEN 'cd' ELSE '{_DEFAULT_RATE}' END
        ORDER BY doc_id
    """,
    "grouped_head": f"""
        SELECT lang, source, doc_id, rk
        FROM (
            SELECT lang, source, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS INTEGER) AS rk
            FROM documents
        )
        WHERE rk <= {GROUP_K}
        ORDER BY lang, source, rk
    """,
}
