"""Scale-pattern operators: differential correctness + the plan
properties that make them worth having (no exchange into a bucketed
join; salted aggregation recombines exactly)."""

from __future__ import annotations

import pytest

from gizmosql_spark.operators import scale
from gizmosql_spark.testing import compare_to_oracle


@pytest.mark.parametrize("name", sorted(scale.QUERIES))
def test_scale_matches_oracle(spark, sf_dir, name):
    compare_to_oracle(scale.QUERIES[name](spark, sf_dir), scale.ORACLE[name], sf_dir)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    df = scale.bucketed_join(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("Bucketed: true") == 2
    # no Exchange may feed the join — both inputs are pre-bucketed; the
    # only exchanges allowed are the post-join aggregate/sort ones
    tree = plan.split("\n\n")[0].splitlines()
    smj = next(i for i, l in enumerate(tree) if "SortMergeJoin" in l)
    assert not any("Exchange" in l for l in tree[smj + 1 :])


def test_salted_agg_two_stage(spark, sf_dir):
    plan = _plan(scale.salted_agg(spark, sf_dir))
    # two aggregation layers (salted partial + final combine), and the
    # fact scan still prunes to the aggregated columns only
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_shipdate" not in read_schema
    assert "l_quantity" in read_schema


def test_partition_pruning_in_plan(spark, sf_dir):
    df = scale.partition_pruned_agg(spark, sf_dir)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    # the date predicate must appear as a partition filter, not a data
    # filter over all files
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_date" in pf_line


def test_zorder_layout_matches_oracle(spark, sf_dir):
    from gizmosql_spark.operators import scale
    from gizmosql_spark.testing import compare_to_oracle

    compare_to_oracle(
        scale.zorder_layout(spark, sf_dir),
        scale.ORACLE["zorder_layout"], sf_dir)


def test_zorder_buckets_are_local(spark, sf_dir):
    """Z-order's point: each z-range bucket covers a small 2-D bbox.
    Every 4096-wide z bucket spans at most a 64x64 tile of the
    256x256 key space (Morton property: 4096 = 2^12 -> 6 bits per
    dimension)."""
    from gizmosql_spark.operators import scale

    rows = scale.zorder_layout(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["bx_max"] - r["bx_min"] <= 63, r
        assert r["by_max"] - r["by_min"] <= 63, r
