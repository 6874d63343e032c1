"""Similarity search over embedding vectors.

Extension tier (SURVEY §7 Phase 5): approximate-nearest-neighbor and
embedding-cosine near-duplicate detection over the ``embeddings``
fixture (array<float> of dim 64).

- **brute-force cosine top-k**: exact baseline; the query vector joins
  as a broadcast 1-row frame (no collect) and the dot product runs in
  JVM higher-order functions (zip_with + aggregate) — whole-stage
  codegen, no Python.
- **random-hyperplane LSH buckets**: the scale path — 8 deterministic
  hyperplanes hash each vector to an 8-bit bucket; at 100 TB the
  bucket is the blocking key for candidate generation (expected
  ~n/256 per bucket), turning O(n²) scoring into a per-bucket join.
- **embedding near-dup pairs**: all-pairs cosine ≥ threshold (exact
  ground truth; the LSH-bucket variant bounds it at scale).

Hyperplane weights are a deterministic LCG over (plane, dim) computed
identically in Spark and DuckDB — no RNG, no engine hash functions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64
NEARDUP_THRESHOLD = 0.4
TOP_K = 10

# cosine(a, b) over array<double> columns, computed with JVM
# higher-order functions; sequential left-to-right fold matches the
# DuckDB oracle's list_sum accumulation.
_COS_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate(transform({a}, x -> x * x), 0D, (acc, v) -> acc + v))"
    " * sqrt(aggregate(transform({b}, x -> x * x), 0D, (acc, v) -> acc + v)))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the vector cast to array<double> once, so all
    downstream arithmetic is double (portable vs the oracle)."""
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a query vector (vec_id 0), broadcast as a
    1-row frame — the pattern scales to any query batch size."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    cos = F.expr(_COS_EXPR.format(a="emb", b="q_emb"))
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(TOP_K)
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: sign pattern over 8 deterministic
    hyperplanes → 8-char bucket id per vector."""
    e = _emb(spark, sf_dir)
    bits = []
    for j in range(N_PLANES):
        # deterministic pseudo-random weight for (plane j, dim d):
        # LCG over the flattened index, scaled to [-0.5, 0.5)
        w = (
            f"transform(sequence(0, {DIM - 1}),"
            f" d -> ((1103515245L * ({j}L * {DIM} + d) + 12345L) % 1000000) / 1000000.0 - 0.5)"
        )
        dot = f"aggregate(zip_with(emb, {w}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    bucket = F.expr("concat(" + ", ".join(bits) + ")")
    return e.select("vec_id", bucket.alias("bucket")).orderBy("vec_id")


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-dup (exact ground truth; use
    ann_lsh_buckets as the blocking key at scale)."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"))
    cos = F.expr(_COS_EXPR.format(a="a_emb", b="b_emb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= NEARDUP_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_buckets": ann_lsh_buckets,
    "embedding_neardup": embedding_neardup,
}

_COS_SQL = (
    "list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)

_LSH_BIT_SQL = " || ".join(
    "CASE WHEN list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST(embedding[i] AS DOUBLE) *"
    f" (((1103515245 * ({j} * {{dim}} + (i - 1)) + 12345) % 1000000) / 1000000.0 - 0.5)))"
    " >= 0 THEN '1' ELSE '0' END"
    for j in range(N_PLANES)
).format(dim=DIM)

ORACLE: dict[str, str] = {
    "ann_bruteforce_topk": f"""
        SELECT e.vec_id,
               round({_COS_SQL.format(a="e.embedding", b="q.embedding", dim=DIM)}, 6)
                   AS cos_sim
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "ann_lsh_buckets": f"""
        SELECT vec_id, {_LSH_BIT_SQL} AS bucket
        FROM embeddings
        ORDER BY vec_id
    """,
    "embedding_neardup": f"""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({_COS_SQL.format(a="a.embedding", b="b.embedding", dim=DIM)}, 6)
                   AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND round({_COS_SQL.format(a="a.embedding", b="b.embedding", dim=DIM)}, 6)
              >= {NEARDUP_THRESHOLD}
        ORDER BY a_id, b_id
    """,
}
