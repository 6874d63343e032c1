"""Pins for the input-size-keyed width policies (round 8).

loader.tune_shuffle_width: sub-threshold dirs shuffle narrow, big
dirs restore the session's launch width, external SETs win
permanently. streaming.windows.wide_for_dir: the streaming analog —
super-threshold dirs get the full-core-width session clone.
"""

from __future__ import annotations

import pytest

from gizmosql_spark.operators import loader
from gizmosql_spark.streaming import windows as w

SMALL = "/root/testdata/sf0.1"


@pytest.fixture()
def clone(spark):
    """A fresh conf-isolated session so width mutations never leak
    into the shared test session."""
    s = spark.newSession()
    yield s
    loader._WIDTH_STATE.pop(s, None)


def _fake_big_dir(name: str) -> str:
    """Register a synthetic dir as super-threshold in the cached size
    probe (no need for a real >1 GiB fixture on disk)."""
    loader._AQE_DECISION[name] = "true"  # big: adaptive on
    return name


def test_small_dir_narrows_and_big_dir_restores(clone):
    launch = clone.conf.get("spark.sql.shuffle.partitions")
    assert int(launch) > loader.SMALL_SHUFFLE_PARTITIONS
    loader.tune_shuffle_width(clone, SMALL)
    assert (clone.conf.get("spark.sql.shuffle.partitions")
            == str(loader.SMALL_SHUFFLE_PARTITIONS))
    big = _fake_big_dir("/fake/width-policy-big")
    loader.tune_shuffle_width(clone, big)
    assert clone.conf.get("spark.sql.shuffle.partitions") == launch


def test_external_set_outranks_policy(clone):
    loader.tune_shuffle_width(clone, SMALL)
    clone.conf.set("spark.sql.shuffle.partitions", "13")  # user SET
    loader.tune_shuffle_width(clone, SMALL)
    assert clone.conf.get("spark.sql.shuffle.partitions") == "13"
    loader.tune_shuffle_width(clone, _fake_big_dir("/fake/wpb2"))
    assert clone.conf.get("spark.sql.shuffle.partitions") == "13"


def test_prepinned_session_width_never_touched(clone):
    """A clone whose width was set at construction (bounded/streaming
    clones) keeps it on big dirs: first-seen width is the restore
    target."""
    clone.conf.set("spark.sql.shuffle.partitions", "4")
    loader._WIDTH_STATE.pop(clone, None)
    loader.tune_shuffle_width(clone, _fake_big_dir("/fake/wpb3"))
    assert clone.conf.get("spark.sql.shuffle.partitions") == "4"


def test_wide_for_dir_keys_off_threshold():
    assert w.wide_for_dir(SMALL) is False
    assert w.wide_for_dir(_fake_big_dir("/fake/wpb4")) is True


def test_wide_streaming_clone_width(spark):
    narrow = w.streaming_session(spark)
    wide = w.streaming_session(spark, wide=True)
    assert (int(narrow.conf.get("spark.sql.shuffle.partitions"))
            == max(w.STREAM_STATE_PARTITIONS, w.STREAM_STATE_PARTITIONS))
    assert (int(wide.conf.get("spark.sql.shuffle.partitions"))
            == max(spark.sparkContext.defaultParallelism,
                   w.STREAM_STATE_PARTITIONS))
    assert narrow is not wide


def test_two_dir_query_runs_at_last_loaded_width(clone):
    """The single-dir contract (r8 verdict item 6), pinned: the policy
    re-aligns per table() load, so a plan mixing two dirs executes at
    whichever dir was loaded LAST. Mixed-dir callers must load the big
    side last (or pin the width); every corpus query reads one dir."""
    launch = clone.conf.get("spark.sql.shuffle.partitions")
    big = _fake_big_dir("/fake/wpb-two-dir")
    # big fact loaded first, small dim last -> executes narrow
    loader.tune_shuffle_width(clone, big)
    loader.tune_shuffle_width(clone, SMALL)
    assert (clone.conf.get("spark.sql.shuffle.partitions")
            == str(loader.SMALL_SHUFFLE_PARTITIONS))
    # small dim first, big fact last -> executes at launch width
    loader.tune_shuffle_width(clone, big)
    assert clone.conf.get("spark.sql.shuffle.partitions") == launch
