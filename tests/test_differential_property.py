"""Property-based differential testing: randomized filter/agg queries
must agree between Spark and DuckDB over the same parquet.

Extends the reference's fixed-corpus oracle gate with generated
predicates (the reference relies on DuckDB upstream for randomized
coverage; here the oracle IS DuckDB, so divergence = our bug)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.01"

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_STR_COLS = ["l_returnflag", "l_linestatus"]
_OPS = ["<", "<=", ">", ">=", "="]

_predicate = st.one_of(
    st.tuples(st.sampled_from(_NUM_COLS), st.sampled_from(_OPS),
              st.floats(0.0, 60.0, allow_nan=False).map(lambda v: round(v, 2))).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    ),
    st.tuples(st.sampled_from(_STR_COLS), st.sampled_from(["F", "O", "A", "R", "N"])).map(
        lambda t: f"{t[0]} = '{t[1]}'"
    ),
)

_predicates = st.lists(_predicate, min_size=1, max_size=3)
_joiners = st.sampled_from([" AND ", " OR "])


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def sdf(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    df.createOrReplaceTempView("li_prop")
    return df


@given(preds=_predicates, joiner=_joiners)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_filter_count_sum_agree(spark, ddb, sdf, preds, joiner):
    where = joiner.join(preds)
    q = (
        "SELECT count(*) AS n, sum(l_quantity) AS s, min(l_extendedprice) AS mn "
        f"FROM {{t}} WHERE {where}"
    )
    got = spark.sql(q.format(t="li_prop")).collect()[0]
    want = ddb.execute(q.format(t="lineitem")).fetchone()
    assert got["n"] == want[0], where
    if want[1] is None:
        assert got["s"] is None, where
    else:
        assert got["s"] == pytest.approx(want[1], rel=1e-9), where
    if want[2] is None:
        assert got["mn"] is None, where
    else:
        assert got["mn"] == pytest.approx(want[2], rel=1e-9), where


@pytest.fixture(scope="module")
def ddb2():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def joined_views(spark):
    spark.read.parquet(f"{SF}/lineitem.parquet").createOrReplaceTempView("li_prop2")
    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView("ord_prop2")


_GROUPS = ["l_returnflag", "l_linestatus", "o_orderpriority", "o_orderstatus"]


@given(preds=_predicates, grp=st.sampled_from(_GROUPS))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_join_groupby_agree(spark, ddb2, joined_views, preds, grp):
    """Randomized join + group-by: per-group counts and sums must agree
    between the Catalyst plan and DuckDB."""
    where = " AND ".join(preds)
    q = (
        f"SELECT {grp} AS g, count(*) AS n, sum(l_extendedprice) AS s "
        f"FROM {{li}} JOIN {{o}} ON l_orderkey = o_orderkey "
        f"WHERE {where} GROUP BY {grp} ORDER BY g"
    )
    got = spark.sql(q.format(li="li_prop2", o="ord_prop2")).collect()
    want = ddb2.execute(q.format(li="lineitem", o="orders")).fetchall()
    assert len(got) == len(want), where
    for g_row, w_row in zip(got, want):
        assert g_row["g"] == w_row[0], where
        assert g_row["n"] == w_row[1], where
        assert g_row["s"] == pytest.approx(w_row[2], rel=1e-9), where


_WIN_PARTS = ["l_returnflag", "l_linestatus"]
_WIN_ORDS = ["l_extendedprice", "l_quantity", "l_discount"]


@given(part=st.sampled_from(_WIN_PARTS), ordc=st.sampled_from(_WIN_ORDS),
       k=st.integers(1, 5), preds=_predicates)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_window_topk_agree(spark, ddb, sdf, part, ordc, k, preds):
    """Randomized per-group top-k: row_number with a deterministic
    tie-break must select the identical rows on both engines."""
    where = " AND ".join(preds)
    q = (
        f"SELECT {part} AS g, l_orderkey, l_linenumber FROM ("
        f"  SELECT *, row_number() OVER ("
        f"    PARTITION BY {part}"
        f"    ORDER BY {ordc} DESC, l_orderkey, l_linenumber) AS rk"
        f"  FROM {{t}} WHERE {where}) r"
        f" WHERE rk <= {k} ORDER BY g, l_orderkey, l_linenumber"
    )
    got = [(r["g"], r["l_orderkey"], r["l_linenumber"])
           for r in spark.sql(q.format(t="li_prop")).collect()]
    want = ddb.execute(q.format(t="lineitem")).fetchall()
    assert got == [tuple(w) for w in want], where


@given(preds=_predicates, col=st.sampled_from(_STR_COLS))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distinct_setop_agree(spark, ddb, sdf, preds, col):
    """Randomized DISTINCT + EXCEPT: the distinct value set under a
    predicate and its complement must partition identically."""
    where = " AND ".join(preds)
    q = (
        f"SELECT DISTINCT {col} AS v FROM {{t}} WHERE {where}"
        f" EXCEPT SELECT DISTINCT {col} AS v FROM {{t}} WHERE NOT ({where})"
        f" ORDER BY v"
    )
    got = [r["v"] for r in spark.sql(q.format(t="li_prop")).collect()]
    want = [w[0] for w in ddb.execute(q.format(t="lineitem")).fetchall()]
    assert got == want, where


def test_strict_mode_catches_signed_zero(spark, sf_dir):
    """The strict (driver-hash-grade) comparator must see the -0.0 vs
    +0.0 split the tolerance comparator is blind to — the exact gap
    that let the r9 ``stats_agg`` escape the local differential while
    failing the official hash (VERDICT r9 item 3)."""
    import pytest

    from gizmosql_spark import testing

    df = spark.sql("SELECT 0.0D AS x")  # Spark: +0.0
    oracle = "SELECT -0.0::DOUBLE AS x"  # DuckDB: -0.0
    # tolerance mode: equal (0.0 == -0.0 numerically)
    testing.compare_to_oracle(df, oracle, sf_dir)
    # strict mode: repr-level difference must fail
    with pytest.raises(AssertionError, match="strict"):
        testing.compare_to_oracle(df, oracle, sf_dir, strict=True)


def test_strict_mode_catches_last_ulp_drift(spark, sf_dir):
    """Strict mode must also see one-ulp float drift (the q07/q09
    unrounded-sum hazard strict mode surfaced in r10)."""
    import math

    import pytest

    from gizmosql_spark import testing

    hi = math.nextafter(1874116.2427, math.inf)
    df = spark.sql(f"SELECT CAST({hi!r} AS DOUBLE) AS x")
    oracle = "SELECT 1874116.2427::DOUBLE AS x"
    testing.compare_to_oracle(df, oracle, sf_dir)  # tolerance: passes
    with pytest.raises(AssertionError, match="strict"):
        testing.compare_to_oracle(df, oracle, sf_dir, strict=True)


def test_ordered_mode_catches_row_permutation(spark, sf_dir):
    """The sorted comparator is structurally blind to a wrong ORDER BY
    that permutes rows; ordered mode must fail it (VERDICT r10 item
    5). Both sides here return the same SET of rows in opposite
    orders."""
    import pytest

    from gizmosql_spark import testing

    df = spark.sql(
        "SELECT * FROM VALUES (1), (2), (3) AS t(v) ORDER BY v ASC")
    oracle = "SELECT * FROM (VALUES (1), (2), (3)) t(v) ORDER BY v DESC"
    # sorted compare: identical sets, passes
    testing.compare_to_oracle(df, oracle, sf_dir)
    # ordered compare: permuted result order must fail
    with pytest.raises(AssertionError, match="row mismatches"):
        testing.compare_to_oracle(df, oracle, sf_dir, ordered=True)


def test_has_top_level_order_by():
    """Only a depth-0 ORDER BY declares a result order — one inside a
    window spec, subquery, or CTE body sorts an intermediate."""
    from gizmosql_spark import testing

    assert testing.has_top_level_order_by(
        "SELECT a FROM t ORDER BY a")
    assert testing.has_top_level_order_by(
        "WITH c AS (SELECT a FROM t) SELECT * FROM c ORDER BY a, b")
    assert not testing.has_top_level_order_by(
        "SELECT sum(a) OVER (ORDER BY b) FROM t")
    assert not testing.has_top_level_order_by(
        "SELECT * FROM (SELECT a FROM t ORDER BY a LIMIT 3) s")
    assert not testing.has_top_level_order_by(
        "SELECT 'ORDER BY inside a string literal' AS v FROM t")
    assert testing.has_top_level_order_by(
        "WITH c AS (SELECT a FROM t ORDER BY a LIMIT 2)"
        " SELECT * FROM c ORDER BY a")
