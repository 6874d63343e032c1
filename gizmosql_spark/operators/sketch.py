"""Distributed sketches as DataFrame compositions.

A 100 TB engine needs cardinality estimates without a full distinct
shuffle. Spark's ``approx_count_distinct`` is a native HLL++, but its
estimate is engine-specific — useless for a differential gate. This
module implements a textbook **HyperLogLog** (Flajolet et al. 2007)
from scratch as a composition of built-in DataFrame ops, fully
deterministic and portable: the DuckDB oracle runs the same
arithmetic on the same md5 bits and produces the **identical**
estimate, so the driver hash-check verifies the sketch math itself.

Shape (the whole point at scale): one scan computes (bucket, rho)
per row — all whole-stage-codegen string/arithmetic expressions —
then ONE partial-aggregatable groupBy(bucket).max(rho) over m=1024
buckets, then a 1024-row harmonic fold. Map-side combine reduces
every partition to ≤1024 rows before the shuffle, so network cost is
O(m x partitions), independent of row count — exactly how a real
sketch rollup behaves (and why it beats COUNT(DISTINCT) at 100 TB:
no per-key shuffle at all).

Register extraction from md5(key):
- bucket  = first 3 hex chars mod 1024 (12 bits → uniform over 2^10)
- rho     = position of the first 1-bit in the next 52 bits
            (13 hex chars), computed from the hex string: 4 bits per
            leading '0' char + a CASE on the first non-zero nibble —
            pure string ops, identical on any engine (no float log2).
Estimate = alpha_m * m^2 / sum_j 2^(-M_j) with the standard
small-range correction E <= 2.5m and V empty registers → m*ln(m/V).
All terms 2^(-M_j) are dyadic rationals ≥ 2^-53, so the fold is
EXACT in doubles — summation order cannot change the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader

_M = 1024          # registers (2^10)
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


def _hex_val(c: Column) -> Column:
    """Value of one lowercase hex substring (conv base16 -> base10;
    md5 output is always [0-9a-f])."""
    return F.conv(c, 16, 10).cast("int")


def _bucket_rho(key: Column) -> tuple[Column, Column]:
    h = F.md5(key.cast("string"))
    bucket = _hex_val(F.substring(h, 1, 3)) % _M
    tail = F.substring(h, 4, 13)            # 52 bits
    zeros = F.length(F.regexp_extract(tail, "^(0*)", 1))
    first = _hex_val(tail.substr(zeros + 1, F.lit(1)))
    bitlen = (
        F.when(first >= 8, 4)
        .when(first >= 4, 3)
        .when(first >= 2, 2)
        .otherwise(1)
    )
    rho = F.when(zeros == 13, F.lit(53)).otherwise(
        zeros * 4 + (4 - bitlen) + 1
    )
    return bucket, rho


def hll_sketch(df: DataFrame, key: Column, name: str) -> DataFrame:
    """One-row frame: (column_name, hll_estimate, exact_distinct,
    rel_error_pct). Exact count included for the differential check
    and the error report; a production rollup would keep only the
    1024 registers (mergeable by max) and skip the exact pass."""
    bucket, rho = _bucket_rho(key)
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    folded = regs.agg(
        F.sum(F.lit(1.0) / F.expr("cast(shiftleft(1L, m_j) as double)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    ).select(
        (F.col("s_present") + (F.lit(_M) - F.col("n_present"))).alias("s"),
        (F.lit(_M) - F.col("n_present")).alias("v"),
    )
    raw = F.lit(_ALPHA) * F.lit(float(_M * _M)) / F.col("s")
    est = F.when(
        (raw <= F.lit(2.5 * _M)) & (F.col("v") > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("v")),
    ).otherwise(raw)
    exact = df.select(
        F.count_distinct(key).cast("bigint").alias("exact_distinct"))
    return (
        folded.select(F.round(est, 4).alias("hll_estimate"))
        .crossJoin(exact)
        .select(
            F.lit(name).alias("column_name"),
            "hll_estimate",
            "exact_distinct",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct") * 100.0, 4,
            ).alias("rel_error_pct"),
        )
    )


def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL cardinality of two key columns spanning both estimate
    branches: o_custkey (small range → bias correction m*ln(m/V))
    and l_orderkey (harmonic-mean path)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        hll_sketch(o, F.col("o_custkey"), "o_custkey")
        .unionAll(hll_sketch(l, F.col("l_orderkey"), "l_orderkey"))
        .orderBy("column_name")
    )


def _oracle_one(table: str, col: str) -> str:
    hexv = "strpos('0123456789abcdef', {c}) - 1"
    h1 = hexv.format(c=f"substr(h, 1, 1)")
    h2 = hexv.format(c=f"substr(h, 2, 1)")
    h3 = hexv.format(c=f"substr(h, 3, 1)")
    fv = hexv.format(c="substr(tail, zeros + 1, 1)")
    return f"""
        SELECT '{col}' AS column_name, hll_estimate, exact_distinct,
               round(abs(hll_estimate - exact_distinct)
                     / exact_distinct * 100.0, 4) AS rel_error_pct
        FROM (
            SELECT CASE WHEN {_ALPHA!r}::DOUBLE * {float(_M * _M)!r}::DOUBLE / s
                             <= {2.5 * _M!r}::DOUBLE AND v > 0
                        THEN round({float(_M)!r}::DOUBLE * ln({float(_M)!r}::DOUBLE / v), 4)
                        ELSE round({_ALPHA!r}::DOUBLE * {float(_M * _M)!r}::DOUBLE / s, 4)
                   END AS hll_estimate
            FROM (
                SELECT sum(1.0 / CAST(CAST(1 AS BIGINT) << m_j AS DOUBLE))
                       + ({_M} - count(*)) AS s,
                       {_M} - count(*) AS v
                FROM (
                    SELECT bucket, max(rho) AS m_j FROM (
                        SELECT ({h1}) * 256 + ({h2}) * 16 + ({h3})
                                   AS raw12,
                               raw12 % {_M} AS bucket,
                               CASE WHEN zeros = 13 THEN 53
                                    ELSE zeros * 4 + (4 - CASE
                                        WHEN ({fv}) >= 8 THEN 4
                                        WHEN ({fv}) >= 4 THEN 3
                                        WHEN ({fv}) >= 2 THEN 2
                                        ELSE 1 END) + 1
                               END AS rho
                        FROM (
                            SELECT h, substr(h, 4, 13) AS tail,
                                   length(regexp_extract(tail, '^(0*)', 1))
                                       AS zeros
                            FROM (SELECT md5(CAST({col} AS VARCHAR)) AS h
                                  FROM {table})
                        )
                    ) GROUP BY bucket
                )
            )
        ),
        (SELECT CAST(count(DISTINCT {col}) AS BIGINT) AS exact_distinct
         FROM {table})
    """


QUERIES = {"approx_distinct_hll": approx_distinct_hll}

ORACLE = {
    "approx_distinct_hll": (
        _oracle_one("orders", "o_custkey")
        + " UNION ALL "
        + _oracle_one("lineitem", "l_orderkey")
        + " ORDER BY column_name"
    ),
}
