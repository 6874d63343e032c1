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


def test_window_time_range_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import relational
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        relational.window_time_range(spark, sf_dir),
        relational.ORACLE["window_time_range"], sf_dir)


def test_fuzzy_join_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import relational
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        relational.fuzzy_join(spark, sf_dir),
        relational.ORACLE["fuzzy_join"], sf_dir)


def test_fuzzy_join_finds_typo_matches(spark, sf_dir):
    from gizmosql_spark.operators import relational

    rows = relational.fuzzy_join(spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe"], set()).add(r["p_name"])
    assert "blue bolt" in by_probe.get("blue boltt", set())
    assert "small ring" in by_probe.get("smal ring", set())
    assert "hot gear" in by_probe.get("hot gear", set())  # exact
    assert all(r["dist"] <= 2 for r in rows)


def test_data_quality_report_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import relational
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        relational.data_quality_report(spark, sf_dir),
        relational.ORACLE["data_quality_report"], sf_dir)
