"""Differential tests for the extended relational operator surface."""

from __future__ import annotations

import pytest

from gizmosql_spark.operators import events, relational
from gizmosql_spark.testing import compare_to_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_matches_oracle(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, relational.ORACLE[name], sf_dir)


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_matches_oracle(spark, sf_dir, name):
    df = events.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, events.ORACLE[name], sf_dir)


def test_spatial_join_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import relational
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        relational.spatial_join(spark, sf_dir),
        relational.ORACLE["spatial_join"], sf_dir)


def test_spatial_wkb2_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import relational
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        relational.spatial_wkb2(spark, sf_dir),
        relational.ORACLE["spatial_wkb2"], sf_dir)


def test_spatial_funcs2_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import relational
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        relational.spatial_funcs2(spark, sf_dir),
        relational.ORACLE["spatial_funcs2"], sf_dir)
