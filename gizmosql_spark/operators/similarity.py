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

from gizmosql_spark.operators import loader

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
    return loader.table(spark, sf_dir, name)


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


N_BLOCKS = 8

_PAIR_SCHEMA = "a_id long, b_id long, cos_sim double"


def _block_neardup_fn(key, pdf):
    """One block-pair task: numpy GEMM over unit vectors → pairs ≥
    threshold. Runs fully executor-side; at 100 TB each block pair is
    one task and block size is chosen to fit executor memory."""
    import numpy as np
    import pandas as pd

    ba, bb = key
    left = pdf[pdf["side"] == 0]
    right = pdf[pdf["side"] == 1]
    if len(left) == 0 or len(right) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "cos_sim"])
    A = np.vstack(left["unit"].to_numpy())
    B = np.vstack(right["unit"].to_numpy())
    M = A @ B.T
    ai, bi = np.nonzero(np.round(M, 6) >= NEARDUP_THRESHOLD)
    a_ids = left["vec_id"].to_numpy()[ai]
    b_ids = right["vec_id"].to_numpy()[bi]
    cos = np.round(M[ai, bi], 6)
    if ba == bb:
        # same vectors on both sides: keep each unordered pair once
        mask = a_ids < b_ids
        a_ids, b_ids, cos = a_ids[mask], b_ids[mask], cos[mask]
    else:
        # distinct blocks: each unordered pair appears once; normalize
        # orientation (the lower vec_id may live in the higher block)
        lo = np.minimum(a_ids, b_ids)
        b_ids = np.maximum(a_ids, b_ids)
        a_ids = lo
    return pd.DataFrame({"a_id": a_ids, "b_id": b_ids, "cos_sim": cos})


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-dup via blocked GEMM.

    Vectors are unit-normalized once (JVM expressions), then fanned out
    to block pairs and multiplied with numpy inside applyInPandas — the
    canonical distributed brute-force: O(n²/B²) tasks, BLAS inside each.
    Exact semantics (same result as the SQL oracle); use
    ann_lsh_buckets as the blocking key to go sub-quadratic at scale."""
    e = _emb(spark, sf_dir)
    norm = F.expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (acc, v) -> acc + v))")
    unit = F.expr("transform(emb, x -> x / _norm)")
    ev = (
        e.withColumn("_norm", norm)
        .withColumn("unit", unit)
        .withColumn("blk", (F.col("vec_id") % N_BLOCKS).cast("int"))
        .select("vec_id", "unit", "blk")
    )
    # fan each vector out to its block pairs with one explode (a vector
    # in block k is the left side of pairs (k, b>=k) and the right side
    # of pairs (a<=k, k)) — one pass over the data, no joins
    fan = F.expr(
        f"concat("
        f" transform(sequence(blk, {N_BLOCKS - 1}),"
        f"  b -> struct(blk AS ba, b AS bb, 0 AS side)),"
        f" transform(sequence(0, blk),"
        f"  a -> struct(a AS ba, blk AS bb, 1 AS side)))"
    )
    both = ev.select(
        "vec_id", "unit", F.explode(fan).alias("p")
    ).select("vec_id", "unit", "p.ba", "p.bb", "p.side")
    return (
        both.groupBy("ba", "bb")
        .applyInPandas(_block_neardup_fn, _PAIR_SCHEMA)
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
