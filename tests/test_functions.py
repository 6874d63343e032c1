"""Scalar gap-filler functions vs the DuckDB originals."""

from __future__ import annotations

import duckdb
import pytest

from gizmosql_spark.functions import register_all


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


CASES = [
    ("jaccard('hello', 'world')", float),
    ("jaccard('abc', 'abc')", float),
    ("hamming('karolin', 'kathrin')", int),
    ("mismatches('abcd', 'abcd')", int),
    ("editdist3('kitten', 'sitting')", int),
    ("even(2.1)", float),
    ("even(-2.1)", float),
    ("even(0.0)", float),
]


@pytest.mark.parametrize("expr", [c[0] for c in CASES])
def test_matches_duckdb(spark, expr):
    got = spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]
    want = duckdb.sql(f"SELECT {expr} AS v").fetchall()[0][0]
    assert got == pytest.approx(want), f"{expr}: spark={got} duckdb={want}"


def test_gamma_lgamma_nextafter(spark):
    row = spark.sql(
        "SELECT gamma(5.0) AS g, lgamma(5.0) AS lg, nextafter(1.0, 2.0) AS na"
    ).collect()[0]
    assert row["g"] == pytest.approx(24.0)
    import math

    assert row["lg"] == pytest.approx(math.lgamma(5.0))
    assert row["na"] == math.nextafter(1.0, 2.0)


def test_hamming_null_on_unequal_length(spark):
    assert (
        spark.sql("SELECT hamming('ab', 'abc') AS v").collect()[0]["v"] is None
    )
