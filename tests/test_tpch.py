"""Differential TPC-H tests: Spark DataFrame result vs DuckDB oracle.

Mirrors the reference's oracle-compare CI gate
(/root/reference/tests/integration/test_tpch_benchmark.cpp:977-996).
"""

from __future__ import annotations

import pytest

from gizmosql_spark.operators import tpch
from gizmosql_spark.testing import compare_to_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_query_matches_oracle(spark, sf_dir, name):
    df = tpch.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, tpch.ORACLE[name], sf_dir)


def test_q01_nonempty(spark, sf_smoke):
    assert tpch.q01(spark, sf_smoke).count() > 0
