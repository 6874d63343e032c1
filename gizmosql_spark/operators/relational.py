"""Relational operator coverage beyond the TPC-H corpus.

The reference advertises (and DuckDB provides) window functions,
grouping sets/rollup/cube, set operations, PIVOT, UNNEST and VALUES
(SURVEY §2C; capability flags in /root/reference/src/duckdb/
duckdb_sql_info.cpp:350-355; PIVOT fallback duckdb_statement.cpp:1104;
UNNEST usage duckdb_server.cpp:836-841; VALUES usage
duckdb_server.cpp:1599-1601). Each operator here is a Spark-first
implementation with a DuckDB oracle.

All window orderings include a unique tiebreak key so results are
deterministic on both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


# --- window functions -------------------------------------------------


def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per priority (row_number)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderpriority", "rn")
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum + lag per customer."""
    o = _t(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_frame = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("o_custkey").orderBy(*order_cols)
    return (
        o.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w_frame), 2).alias("running_spend"),
            F.lag("o_totalprice").over(w_lag).alias("prev_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: 3-row rolling price sum per supplier."""
    l = _t(spark, sf_dir, "lineitem")
    order_cols = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = Window.partitionBy("l_suppkey").orderBy(*order_cols).rowsBetween(-2, 0)
    return (
        l.filter(F.col("l_suppkey") < 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_extendedprice").over(w), 2).alias("rolling_price"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-customer 30-day trailing order
    total and count — the moving-window-over-time capability ROWS
    frames cannot express (peers are selected by VALUE distance, not
    row position; identical semantics in both engines). One shuffle
    on the partition key, sorted within partitions."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_wtr")
    return spark.sql("""
        SELECT o_custkey, o_orderdate, o_orderkey,
               round(sum(o_totalprice) OVER w, 4) AS trailing_30d_total,
               count(*) OVER w AS trailing_30d_n
        FROM orders_wtr
        WHERE o_custkey < 200
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY CAST(o_orderdate AS TIMESTAMP)
            RANGE BETWEEN INTERVAL 29 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """)


def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-family coverage: dense_rank / percent_rank /
    cume_dist / ntile / first_value / last_value over one window."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    w_frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first_value("o_orderkey").over(w_frame).alias("top_key"),
        F.last_value("o_orderkey").over(w_frame).alias("bottom_key"),
    ).orderBy("o_orderkey")


def agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function breadth: count_if, bool_and/bool_or, FILTER
    clause aggregates, median, and ordered string aggregation."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_agg")
    return spark.sql("""
        SELECT o_orderpriority,
               count_if(o_totalprice > 100000) AS n_big,
               bool_or(o_orderstatus = 'F') AS any_f,
               bool_and(o_totalprice > 0) AS all_pos,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_total,
               median(o_totalprice) AS med_price,
               array_join(slice(array_sort(collect_list(CAST(o_orderkey AS STRING))), 1, 5), ',')
                   AS first_keys
        FROM orders_agg
        WHERE o_orderkey < 2000
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


def decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal fidelity (SURVEY §7 hard part 1): exact DECIMAL(15,2)
    aggregation — sums/min/max stay in decimal arithmetic end-to-end
    (no float drift), with both engines' differing intermediate
    precisions normalized by the explicit output casts."""
    l = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    return (
        l.select("l_returnflag", price.alias("p"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("p").cast("decimal(38,2)").alias("sum_price"),
            F.min("p").cast("decimal(15,2)").alias("min_price"),
            F.max("p").cast("decimal(15,2)").alias("max_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --- grouping sets / rollup / cube ------------------------------------


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with subtotal labels."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("orderpriority"),
            "n",
            "total",
        )
        .orderBy("orderstatus", "orderpriority")
    )


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the Spark SQL surface (per-nation, per-region,
    grand total over supplier balances)."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("gz_supplier")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("gz_nation")
    _t(spark, sf_dir, "region").createOrReplaceTempView("gz_region")
    return spark.sql(
        """
        SELECT coalesce(n_name, '(all)') AS nation,
               coalesce(r_name, '(all)') AS region,
               count(*) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_bal
        FROM gz_supplier
        JOIN gz_nation ON s_nationkey = n_nationkey
        JOIN gz_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((n_name), (r_name), ())
        ORDER BY nation, region
        """
    )


# --- set operations ---------------------------------------------------


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT + UNION ALL over nation-key domains."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("src", F.lit("both"))
    cust_only = c.subtract(s).withColumn("src", F.lit("cust_only"))
    return both.unionByName(cust_only).select("src", "nationkey").orderBy("src", "nationkey")


def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops: INTERSECT ALL / EXCEPT ALL preserve
    duplicates (advertised UNION+set-op surface,
    duckdb_sql_info.cpp:355)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ia = c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")) \
        .withColumn("op", F.lit("intersect_all"))
    ea = c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")) \
        .withColumn("op", F.lit("except_all"))
    return ia.unionByName(ea).select("op", "nationkey", "n").orderBy("op", "nationkey")


def null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL ordering semantics: explicit NULLS FIRST/LAST on a nullable
    sort key (the reference advertises SQL_NULLS_SORTED_AT_END,
    duckdb_sql_info.cpp:226-227 — here both directions are pinned
    explicitly so Spark and DuckDB agree)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    nullable = F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
        F.col("o_totalprice")
    )
    return (
        o.select("o_orderkey", nullable.alias("maybe_price"))
        .orderBy(
            F.col("maybe_price").asc_nulls_last(), F.col("o_orderkey").asc()
        )
        .limit(50)
    )


def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE; DuckDB native): a
    generated day spine LEFT-joined to events — the gap-filling
    calendar pattern, fully declarative on both engines."""
    from gizmosql_spark.operators.events import load_events

    load_events(spark, sf_dir).createOrReplaceTempView("events_rc")
    return spark.sql("""
        WITH RECURSIVE days(d) AS (
            SELECT DATE '2024-01-01'
            UNION ALL
            SELECT date_add(d, 1) FROM days WHERE d < DATE '2024-01-10'
        )
        SELECT d, count(e.event_id) AS n
        FROM days LEFT JOIN events_rc e ON CAST(e.ts AS DATE) = d
        GROUP BY d
        ORDER BY d
    """)


def lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 customers by balance per
    nation — the per-group top-k as a lateral (DuckDB and Spark share
    the syntax; Catalyst decorrelates to a ranked window)."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql("""
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation_lat n,
        LATERAL (
            SELECT c_name, c_acctbal
            FROM customer_lat
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
    """)


# --- pivot ------------------------------------------------------------


def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT linestatus counts per returnflag (direct-execution
    fallback in the reference, duckdb_statement.cpp:1104)."""
    l = _t(spark, sf_dir, "lineitem")
    piv = l.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"]).count()
    return piv.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
    ).orderBy("l_returnflag")


def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (DuckDB-popularized shorthand, native in Spark 4):
    grouping keys inferred from the non-aggregate select items."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem_gba
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus
    """)


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): lineitem's numeric measures melted into
    (metric, value) rows, aggregated per metric — both engines share
    the SQL-standard UNPIVOT clause."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_up")
    return spark.sql("""
        SELECT metric,
               count(*) AS n,
               round(sum(val), 2) AS total,
               round(avg(val), 6) AS mean
        FROM (
            SELECT l_orderkey, metric, val
            FROM lineitem_up
            UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
        )
        GROUP BY metric
        ORDER BY metric
    """)


# --- explode / unnest -------------------------------------------------


def unnest_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of an array column (UNNEST analog,
    duckdb_server.cpp:836-841)."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .select("vec_id", F.col("pos").cast("int").alias("pos"), "val")
        .orderBy("vec_id", "pos")
    )


# --- VALUES inline table ----------------------------------------------


def values_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join against an inline VALUES table (the reference itself uses
    VALUES for constant results, duckdb_server.cpp:1599-1601)."""
    o = _t(spark, sf_dir, "orders")
    # SQL VALUES → LocalRelation, entirely JVM-side (a Python-list
    # createDataFrame pays ~0.5 s of driver-side conversion per call)
    weights = spark.sql("""
        SELECT * FROM VALUES
            ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
            ('4-NOT SPECIFIED', 4), ('5-LOW', 5) AS t(o_p, w)
    """)
    return (
        o.join(F.broadcast(weights), o.o_orderpriority == weights.o_p)
        .groupBy("o_orderpriority", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("w")
    )


_QTY_BANDS = [("low", 0.0, 10.0), ("mid", 10.0, 30.0), ("high", 30.0, 51.0)]


def _band_expr(col, bands):
    """Dense non-overlapping ``[lo, hi)`` bands are a *projection*, not
    a join: fold the band table into a CASE expression so band
    assignment stays inside whole-stage codegen (no
    BroadcastNestedLoopJoin, no per-row multi-predicate join probe).
    At 100 TB this is the difference between a pure scan pipeline and a
    nested-loop over every row x band."""
    expr = None
    for name, lo, hi in bands:
        cond = (col >= F.lit(lo)) & (col < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) "join" against a dense banding dimension, planned
    as a banding *expression* + hash aggregate (scan-only pipeline).
    ``range_band_join_sparse`` keeps the genuine join formulation for
    sparse/overlapping bands where a projection can't express the
    semantics."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.select(_band_expr(F.col("l_quantity"), _QTY_BANDS).alias("band"), "l_extendedprice")
        .where(F.col("band").isNotNull())
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("band")
    )


def range_band_join_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join formulation of banding — the documented variant for
    sparse or overlapping bands (a row may match 0 or 2+ bands, which a
    CASE projection cannot express). Catalyst plans a broadcast
    nested-loop; cost is linear in the fact side x band count, so keep
    the band table tiny or pre-bucketize to an equi-join."""
    l = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        _QTY_BANDS, "band string, lo double, hi double"
    )
    return (
        l.join(
            F.broadcast(bands),
            (l.l_quantity >= bands.lo) & (l.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("band")
    )


def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (§2E numeric family): stddev/variance/
    correlation/covariance per group — all JVM-native partial aggs.

    corr/covar straddle zero, so their rounded values are normalized
    with ``+ 0.0``: DuckDB's round() preserves the sign of a tiny
    negative (round(-2.45e-07, 6) = -0.0) while Spark's returns +0.0,
    and the driver's hash gate sees the difference (the r9 official
    red row). IEEE: -0.0 + 0.0 = +0.0, a no-op for every other value.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            (F.round(F.corr("l_quantity", "l_extendedprice"), 6)
             + F.lit(0.0)).alias("corr_qty_price"),
            (F.round(F.covar_samp("l_discount", "l_tax"), 6)
             + F.lit(0.0)).alias("cov_disc_tax"),
        )
        .orderBy("l_returnflag")
    )


def regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (§2E numeric family): the SQL
    standard regr_* set — slope/intercept/r²/count/mean-x/mean-y of
    price on quantity per return flag. All JVM-native partial aggs
    (one map-side-combinable shuffle); rounded to 6 decimals so the
    engines' summation orders cannot produce last-bit drift.
    slope/intercept straddle zero → ``+ 0.0`` normalizes the signed
    zero DuckDB's round() can emit (see stats_agg)."""
    l = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        l.groupBy("l_returnflag")
        .agg(
            (F.round(F.regr_slope(y, x), 6) + F.lit(0.0)).alias("slope"),
            (F.round(F.regr_intercept(y, x), 6)
             + F.lit(0.0)).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
        )
        .orderBy("l_returnflag")
    )


def argminmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max + boolean/bitwise aggregates (§2E family:
    DuckDB arg_min/arg_max ≈ Spark min_by/max_by; bool_and/bool_or;
    bit_and/bit_or/bit_xor). The arg base is the unique o_orderkey so
    ties cannot make the answer engine-dependent."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderstatus", "o_orderkey").alias("first_status"),
            F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.bit_and("o_custkey").alias("key_band"),
            F.bit_or("o_custkey").alias("key_bor"),
            F.bit_xor("o_custkey").alias("key_bxor"),
        )
        .orderBy("o_orderpriority")
    )


def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median/p90) per group — Spark's
    ``percentile`` matches DuckDB's ``quantile_cont`` definition."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_price"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        )
        .orderBy("l_linestatus")
    )


def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (advertised SQL_OUTER_JOINS_SUPPORT_LEVEL=FULL,
    duckdb_sql_info.cpp:353; not exercised by the TPC-H corpus):
    per-nation customer counts vs supplier counts, nations appearing on
    either side."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("nk") % 3 == 0)
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("nk") % 2 == 0)
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            "nk",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nk")
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins — the physical forms Catalyst picks
    for EXISTS / NOT EXISTS (queries/h04.sql, h21/h22.sql)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    with_big = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("status")
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_big_order").alias("status")
    )
    return with_big.unionByName(without).orderBy("c_custkey")


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/ntile analytic functions over per-user event sequences
    (§2C window row: ranking/analytic set via duckdb_functions())."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    ts = F.timestamp_micros(F.expr("ts div 1000")) if dict(
        e.dtypes
    ).get("ts") == "bigint" else F.col("ts")
    e = e.withColumn("ts", ts)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.lag("value", 1).over(w).alias("prev_value"),
            F.lead("value", 1).over(w).alias("next_value"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(
                F.col("value") - F.coalesce(F.lag("value", 1).over(w), F.lit(0.0)), 6
            ).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2E date/time family driven end-to-end: date_trunc / date_part /
    last_day / dayofweek / dayofyear / weekofyear / datediff / months
    (duckdb_sql_info.cpp:178-186)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_part(F.lit("year"), d).cast("int").alias("yr"),
        F.date_part(F.lit("quarter"), d).cast("int").alias("qtr"),
        F.last_day(d).alias("month_end"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.weekofyear(d).cast("int").alias("woy"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).cast("int").alias("days_to_cutoff"),
    ).orderBy("o_orderkey")


def numeric_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2E numeric family driven end-to-end (duckdb_sql_info.cpp:
    96-104): abs/ceil/floor/round/sqrt/ln/log10/exp/sign/mod/power/
    greatest/least as one projection."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    x = F.col("l_extendedprice")
    q = F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(x - 30000).alias("abs_v"),
        F.ceil(q).cast("long").alias("ceil_q"),
        F.floor(q / 7).cast("long").alias("floor_q7"),
        F.round(F.sqrt(x), 6).alias("sqrt_x"),
        F.round(F.log(x), 6).alias("ln_x"),
        # + 0.0: x > 1 in the fixture so no real -0.0 path —
        # the lint's symmetric normalizer invariant, a no-op
        (F.round(F.log10(x), 6) + F.lit(0.0)).alias("log10_x"),
        F.round(F.exp(q / 50), 6).alias("exp_q"),
        F.signum(x - 30000).cast("int").alias("sign_v"),
        (F.col("l_partkey") % 97).alias("mod_97"),
        F.round(F.pow(q, F.lit(2)), 6).alias("q_sq"),
        F.greatest(q, F.col("l_discount") * 100).alias("gr"),
        F.least(q, F.col("l_tax") * 100).alias("ls"),
    ).orderBy("l_orderkey", "l_linenumber")


def spatial_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial mini-surface (§2E spatial family; the reference ships
    100+ ST_* via DuckDB's spatial extension — docs/geometry.md). The
    portable subset here models points as STRUCT<x,y> SQL UDFs
    (functions/: st_point/st_x/st_y/st_distance/st_dwithin/
    st_contains_bbox) — JVM expressions, whole-stage codegen; the
    oracle inlines the identical arithmetic."""
    from gizmosql_spark import functions as gf

    gf.register_all(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp")
    return spark.sql("""
        SELECT event_id,
               round(st_distance(st_point(value, CAST(user_id AS DOUBLE)),
                                 st_point(50D, 50D)), 6) AS dist,
               st_dwithin(st_point(value, CAST(user_id AS DOUBLE)),
                          st_point(50D, 50D), 25D) AS within_25,
               st_contains_bbox(0D, 0D, 50D, 50D,
                                st_point(value, CAST(user_id AS DOUBLE))) AS in_bbox,
               st_x(st_point(value, CAST(user_id AS DOUBLE))) AS px,
               st_y(st_point(value, CAST(user_id AS DOUBLE))) AS py
        FROM events_sp
        WHERE event_id < 2000
        ORDER BY event_id
    """)


def spatial_wkb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY over WKB (geo.py; reference docs/geometry.md): encode
    points to 21-byte WKB, decode back, and parse WKT — all verified
    numerically. The oracle computes the same coordinates directly, so
    a hash match proves the codec is bit-exact lossless. The WKB bytes
    themselves are covered by tests/test_geo.py (byte layout +
    GeoArrow metadata), since DuckDB's spatial extension cannot be
    installed offline here."""
    from gizmosql_spark import functions as gf

    gf.register_all(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_wkb")
    return spark.sql("""
        SELECT event_id,
               st_x_wkb(st_aswkb(st_point(value, CAST(user_id AS DOUBLE)))) AS wx,
               st_y_wkb(st_aswkb(st_point(value, CAST(user_id AS DOUBLE)))) AS wy,
               round(st_distance_wkb(
                   st_aswkb(st_point(value, CAST(user_id AS DOUBLE))),
                   st_aswkb(st_point(50D, 50D))), 6) AS wdist,
               st_x(st_geomfromtext(
                   concat('POINT (', CAST(user_id AS STRING), ' 7)'))) AS tx
        FROM events_wkb
        WHERE event_id < 1000
        ORDER BY event_id
    """)


def spatial_wkb2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-tier spatial breadth (round-3 VERDICT ask; reference
    docs/geometry.md "100+ spatial functions"): ST_Buffer (octagon
    approximation), ST_Area / ST_Perimeter / ST_Centroid (shoelace),
    ST_Within (ray casting), ST_Intersects_Extent (envelope overlap,
    DuckDB-spatial's function of the same name), and the polygon WKB
    codec round-tripped through st_aswkb_poly/st_polyfromwkb. Octagon
    vertices use only 0/±1/±sqrt(.5) multipliers — sqrt is IEEE-exact,
    so the DuckDB oracle builds bit-identical rings and the shoelace /
    crossing-number arithmetic matches term for term."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark.geo import register_geo

    gf.register_all(spark)
    register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_wkb2")
    return spark.sql("""
        WITH src AS (
            SELECT event_id, value,
                   st_point(value, CAST(user_id AS DOUBLE)) AS p,
                   value / 10D + 1D AS r
            FROM events_wkb2 WHERE event_id < 1000
        )
        SELECT event_id,
               st_within(p, st_buffer(st_point(150D, 75D), 80D)) AS in_zone,
               round(st_area(st_buffer(p, r)), 6) AS buf_area,
               round(st_perimeter(st_buffer(p, r)), 6) AS buf_perim,
               st_npoints(st_buffer(p, r)) AS npts,
               round(st_centroid(st_buffer(p, r)).x, 6) AS cx,
               round(st_x_poly_centroid_wkb(
                   st_aswkb_poly(st_buffer(p, r))), 6) AS cx_wkb,
               st_intersects_extent(
                   st_buffer(p, r),
                   st_buffer(st_point(150D, 75D), 80D)) AS env_hit
        FROM src
        ORDER BY event_id
    """)


def spatial_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third spatial batch (reference "100+ functions" contract,
    docs/geometry.md): ST_Envelope, ST_Translate, ST_Scale,
    ST_Rotate90, ST_MakeLine/ST_Length, ST_PointN, ST_IsClosed,
    ST_Contains(envelope). Every output column has an exact closed
    form (affine ops on the IEEE-exact octagon vertices — no trig, no
    accumulation), so the oracle reproduces each value bit-for-bit."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark.geo import register_geo

    gf.register_all(spark)
    register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp2")
    return spark.sql("""
        WITH src AS (
            SELECT event_id, value,
                   st_point(value, CAST(user_id AS DOUBLE)) AS p,
                   value / 20D + 1D AS r
            FROM events_sp2 WHERE event_id < 2000
        ),
        b AS (SELECT event_id, p, r, st_buffer(p, r) AS ring FROM src)
        SELECT event_id,
               st_envelope(ring).xmin AS env_xmin,
               st_envelope(ring).ymax AS env_ymax,
               st_envelope(st_scale(ring, 2D, 3D)).xmax AS scaled_xmax,
               st_envelope(st_translate(ring, 10D, -5D)).ymin AS trans_ymin,
               st_pointn(ring, 3).y AS p3y,
               st_isclosed(ring) AS closed,
               round(st_length(st_makeline(p, st_point(50D, 50D))), 6)
                   AS seg_len,
               st_contains_env(st_envelope(ring), st_point(50D, 50D))
                   AS env_has_center,
               st_pointn(st_rotate90(ring, 1), 1).x AS rot_x
        FROM b
        ORDER BY event_id
    """)


def spatial_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth spatial batch (reference "100+ functions" contract,
    docs/geometry.md): ST_DWithin, ST_Expand, ST_MakeEnvelope,
    ST_LineInterpolatePoint, ST_ClosestPoint, ST_FlipCoordinates,
    ST_SnapToGrid. Predicate/construction/interpolation tier — every
    form is squared-distance compares, linear interpolation, clamps,
    and floors, so the oracle reproduces each value bit-for-bit."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark.geo import register_geo

    gf.register_all(spark)
    register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp3")
    return spark.sql("""
        WITH src AS (
            SELECT event_id, value,
                   st_point(value, CAST(user_id AS DOUBLE)) AS p,
                   value / 20D + 1D AS r
            FROM events_sp3 WHERE event_id < 2000
        )
        SELECT event_id,
               st_dwithin(p, st_point(50D, 50D), 60D) AS near_center,
               st_expand(st_envelope(st_buffer(p, r)), 5D).xmax
                   AS expanded_xmax,
               round(st_area(st_makeenvelope(0D, 0D, value + 1D,
                                             p.y + 1D)), 6) AS env_area,
               st_line_interpolate_point(
                   st_makeline(p, st_point(50D, 50D)), 0.25D).x
                   AS interp_x,
               st_closestpoint(st_point(10D, 0D), st_point(80D, 0D), p).x
                   AS closest_x,
               st_pointn(st_flipcoordinates(st_buffer(p, r)), 1).x
                   AS flipped_x,
               st_snaptogrid(p, 7.5D).x AS snapped_x
        FROM src
        ORDER BY event_id
    """)


def spatial_funcs4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth spatial batch (reference "100+ functions" contract,
    docs/geometry.md): ST_Azimuth, ST_Project, ST_DistanceSphere
    (haversine), ST_Angle, ST_Reverse, ST_AddPoint, ST_NumPoints,
    ST_StartPoint/ST_EndPoint. Bearing/projection/spherical tier —
    closed-form trig, the oracle reproduces every value to float
    tolerance (only libm ulp differences remain, absorbed by the
    harness's relative compare)."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark.geo import register_geo

    gf.register_all(spark)
    register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp4")
    return spark.sql("""
        WITH src AS (
            SELECT event_id,
                   st_point(value % 180D - 90D,
                            CAST(user_id AS DOUBLE) % 120D - 60D) AS p
            FROM events_sp4 WHERE event_id < 2000
        )
        SELECT event_id,
               round(st_azimuth(p, st_point(0D, 0D)), 6) AS az_to_origin,
               round(st_project(p, 10D, 1.25D).x, 6) AS proj_x,
               round(st_project(p, 10D, 1.25D).y, 6) AS proj_y,
               round(st_distance_sphere(p, st_point(0D, 0D)) / 1000D, 3)
                   AS dist_km,
               round(st_angle(st_point(1D, 0D), p, st_point(0D, 1D)), 6)
                   AS corner_angle,
               st_numpoints(st_addpoint(
                   st_makeline(p, st_point(1D, 1D)), st_point(2D, 0D)))
                   AS n_points,
               round(st_startpoint(st_reverse(
                   st_makeline(p, st_point(5D, 5D)))).x, 6) AS rev_start_x,
               round(st_endpoint(
                   st_makeline(p, st_point(5D, 5D))).y, 6) AS end_y
        FROM src
        ORDER BY event_id
    """)


def columns_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB ``COLUMNS('regex')`` star-expression (dialect-ism tier):
    the engine rewrite expands the regex against the FROM table's
    schema in table order; the oracle runs DuckDB's NATIVE COLUMNS()
    on the identical regex — a direct differential of the dialect
    shim against the reference engine's own semantics."""
    from gizmosql_spark.dialect import rewrite_columns

    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_cols")
    sql = (
        "SELECT COLUMNS('^l_(orderkey|linenumber|quantity|returnflag)$')"
        " FROM li_cols WHERE l_orderkey < 200"
        " ORDER BY l_orderkey, l_linenumber"
    )
    return spark.sql(rewrite_columns(sql, spark))


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (the dbt-test / Great-Expectations
    shape): one row per declared rule with its violation count —
    uniqueness, referential integrity, range, ordering, and null
    checks across the TPC-H star — with both join-defined lineitem
    rules (orphan FK, ship-after-order) derived from ONE left join +
    conditional aggregation (the orphan count = null-extended rows,
    so the anti join is free), and the row-local quantity-range rule
    aggregated on the base lineitem frame (pruned to one column) so
    it stays one-per-row under duplicate PKs — the multi-rule
    few-pass shape a validator must have at 100 TB.
    No broadcast hint on orders: it is fact-sized at scale — the
    planner picks the strategy from runtime sizes."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")

    def rule(name: str, frame: DataFrame) -> DataFrame:
        return frame.select(
            F.lit(name).alias("rule"),
            F.col("n").cast("bigint").alias("n_violations"))

    uniq = rule(
        "orders.o_orderkey unique",
        o.agg((F.count(F.lit(1))
               - F.count_distinct("o_orderkey")).alias("n")))
    joined = l.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        l["l_orderkey"] == o["o_orderkey"], "left")
    # rule independence under dirty data: a duplicated o_orderkey (the
    # very violation rule 1 counts) fans lineitem rows out through this
    # join, so the qty range rule aggregates the BASE lineitem frame —
    # one-per-row like its oracle, with no PK-uniqueness assumption on
    # lineitem itself (r7, replacing the r6 count_distinct-on-PK form);
    # the extra scan prunes to the single l_quantity column. Orphans
    # are null-extended rows (can't fan out); the ship-date rule is
    # defined over the join pairs themselves, same as its oracle.
    lrules = joined.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1)
              .otherwise(0)).alias("orphans"),
        F.sum(F.when(F.col("o_orderkey").isNotNull()
                     & (F.col("l_shipdate") < F.col("o_orderdate")), 1)
              .otherwise(0)).alias("ship"),
    ).select(F.expr(
        "stack(2,"
        " 'lineitem.l_orderkey references orders', CAST(orphans AS BIGINT),"
        " 'lineitem ships on/after order date', CAST(ship AS BIGINT)"
        ") AS (rule, n_violations)"))
    qty = rule(
        "lineitem.l_quantity in (0, 50]",
        l.agg(F.sum(
            F.when((F.col("l_quantity") <= 0)
                   | (F.col("l_quantity") > 50), 1)
            .otherwise(0)).alias("n")))
    bal_null = rule(
        "customer.c_acctbal not null",
        c.agg(F.sum(F.when(F.col("c_acctbal").isNull(), 1)
                    .otherwise(0)).alias("n")))
    return (
        uniq.unionAll(lrules).unionAll(qty).unionAll(bal_null)
        .orderBy("rule")
    )


def fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): misspelled probe names
    match catalog part names via token-overlap blocking + Levenshtein
    verification — the standard ER shape (never all-pairs: candidates
    come from an equi-join on a shared token, the edit distance runs
    only on blocked candidates). Seeds from the reference's advertised
    LEVENSHTEIN/EDITDIST3 contract (duckdb_sql_info.cpp:159-162)."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_fj")
    return spark.sql("""
        WITH probes AS (
            SELECT probe FROM VALUES ('smal ring'), ('red wdget'),
                ('blue boltt'), ('hot gear'), ('grene gizmo')
                AS p(probe)
        ),
        p_tok AS (
            SELECT probe, explode(split(probe, ' ')) AS tok FROM probes
        ),
        n_tok AS (
            SELECT p_partkey, p_name, explode(split(p_name, ' ')) AS tok
            FROM part_fj
        ),
        cand AS (
            SELECT DISTINCT probe, p_partkey, p_name
            FROM p_tok JOIN n_tok USING (tok)
        )
        SELECT probe, p_partkey, p_name,
               CAST(levenshtein(probe, p_name) AS INT) AS dist
        FROM cand
        WHERE levenshtein(probe, p_name) <= 2
        ORDER BY probe, p_partkey
    """)


def spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-partitioned point-in-polygon JOIN — the scalable spatial
    join: each zone polygon explodes to the coarse grid cells its
    envelope covers, each point maps to exactly one cell, the join is
    a plain equi-join on cell (broadcast here: the zone-cell frame is
    tiny), and the exact st_within ray-cast runs only on
    cell-colocated candidates. At 100 TB this is the standard
    PIP-join shape: no all-pairs, no theta-join, shuffle keyed by
    grid cell. The DuckDB oracle skips the grid and applies the exact
    predicate directly — same result, proving the grid is a pure
    optimization."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark.geo import register_geo

    gf.register_all(spark)
    register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_spj")
    return spark.sql("""
        WITH zones AS (
            SELECT name, st_buffer(st_point(cx, cy), r) AS ring
            FROM VALUES ('west',  60D,  40D, 45D),
                        ('mid',  170D,  75D, 60D),
                        ('east', 290D, 110D, 50D),
                        ('north', 120D, 130D, 35D)
                 AS z(name, cx, cy, r)
        ),
        -- 50-unit grid; each zone covers the cells of its envelope
        zone_cells AS (
            SELECT name, ring, gx, gy
            FROM zones
            LATERAL VIEW explode(sequence(
                CAST(floor(array_min(transform(ring, v -> v.x)) / 50) AS INT),
                CAST(floor(array_max(transform(ring, v -> v.x)) / 50) AS INT)
            )) AS gx
            LATERAL VIEW explode(sequence(
                CAST(floor(array_min(transform(ring, v -> v.y)) / 50) AS INT),
                CAST(floor(array_max(transform(ring, v -> v.y)) / 50) AS INT)
            )) AS gy
        ),
        pts AS (
            SELECT event_id, value,
                   st_point(value, CAST(user_id AS DOUBLE)) AS p,
                   CAST(floor(value / 50) AS INT) AS gx,
                   CAST(floor(CAST(user_id AS DOUBLE) / 50) AS INT) AS gy
            FROM events_spj
        )
        SELECT name,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value
        FROM pts JOIN zone_cells USING (gx, gy)
        WHERE st_within(p, ring)
        GROUP BY name
        ORDER BY name
    """)


_KNN_RADIUS = 15.0  # search radius; grid cell size == radius, so a
                    # 3x3 neighborhood provably covers every match


def spatial_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded nearest-neighbor spatial join via grid
    blocking: each left point probes only the 3x3 grid cells around
    it (cell size == radius, so coverage is exact, not approximate),
    candidates equi-join on cell, and the exact distance filter +
    top-1 pick run on cell-colocated pairs only. The DuckDB oracle is
    the direct quadratic join — same rows, proving the grid prunes
    without changing semantics.

    100 TB shape: the join is keyed by grid cell (plain hash
    shuffle) — never a theta join; the 9x left-side explode is the
    standard price for exact radius coverage. Ranking uses SQUARED
    distance (two-term IEEE arithmetic, bit-identical across
    engines), so the (d2, neighbor-id) struct-min is deterministic."""
    r = _KNN_RADIUS
    pts = _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
        F.floor(F.col("value") / r).cast("int").alias("gx"),
        F.floor(F.col("user_id").cast("double") / r).cast("int").alias("gy"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1),"
        " dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    left = (
        pts.filter(F.col("event_id") < 500)
        .select("event_id", "x", "y", "gx", "gy", offsets.alias("o"))
        .select(
            F.col("event_id").alias("l_id"),
            F.col("x").alias("lx"),
            F.col("y").alias("ly"),
            (F.col("gx") + F.col("o.dx")).alias("gx"),
            (F.col("gy") + F.col("o.dy")).alias("gy"),
        )
    )
    d2 = (F.col("lx") - F.col("x")) * (F.col("lx") - F.col("x")) + (
        F.col("ly") - F.col("y")
    ) * (F.col("ly") - F.col("y"))
    pairs = (
        left.join(pts, ["gx", "gy"])
        .filter(F.col("event_id") != F.col("l_id"))
        .select("l_id", F.col("event_id").alias("nbr"), d2.alias("d2"))
        .filter(F.col("d2") <= r * r)
    )
    return (
        pairs.groupBy("l_id")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.round(F.sqrt(F.min("d2")), 6).alias("nearest_dist"),
            F.min(F.struct("d2", "nbr")).getField("nbr").alias("nearest_id"),
        )
        .select(
            F.col("l_id").alias("event_id"),
            "n_within", "nearest_dist", "nearest_id",
        )
        .orderBy("event_id")
    )


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2E array/struct/map family (LIST construction + extraction,
    duckdb_server.cpp:674-697 type contract; higher-order transforms):
    size/element_at/array_max/min/slice/sort_array/aggregate plus map
    and struct extraction — all JVM higher-order expressions."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )
    return (
        e.select(
            "vec_id",
            F.size("emb").cast("int").alias("n_dims"),
            F.round(F.element_at("emb", 1), 6).alias("first_v"),
            F.round(F.array_max("emb"), 6).alias("max_v"),
            F.round(F.array_min("emb"), 6).alias("min_v"),
            F.round(
                F.expr("aggregate(slice(emb, 1, 8), 0D, (a, v) -> a + v)"), 6
            ).alias("sum8"),
            F.round(F.element_at(F.sort_array("emb"), 3), 6).alias("third_smallest"),
            F.element_at(
                F.create_map(F.lit("label"), F.col("label")), "label"
            ).alias("label_via_map"),
            F.struct("vec_id", "label").getField("label").alias("label_via_struct"),
        )
        .orderBy("vec_id")
    )


def numeric_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2E numeric family, second batch (duckdb_sql_info.cpp:96-104):
    cbrt/radians/degrees/factorial/pi/atan2/cot/log2 — all JVM-native
    on both engines."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    q = F.col("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.cbrt(q), 6).alias("cbrt_q"),
        F.round(F.radians(q), 6).alias("rad_q"),
        F.round(F.degrees(q / 10), 6).alias("deg_q"),
        F.factorial(F.col("l_linenumber")).alias("fact_ln"),
        F.round(F.lit(None).cast("double") + 0, 6).alias("null_probe"),
        F.round(F.atan2(q, F.col("l_discount") + 1), 6).alias("atan2_v"),
        F.round(F.cot(q / 100 + 1), 6).alias("cot_v"),
        # + 0.0: q + 1 ≥ 2 so no real -0.0 path — lint symmetry
        (F.round(F.log2(q + 1), 6) + F.lit(0.0)).alias("log2_q"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_v"),
    ).orderBy("l_orderkey", "l_linenumber")


def datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2E date/time second batch: strftime/strptime round-trip (the
    DuckDB argument-order contract), quarter/ISO fields, make_date."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    fmt = "yyyy-MM-dd HH:mm:ss"
    roundtrip = F.to_timestamp(F.date_format(d, fmt), fmt)
    return o.select(
        "o_orderkey",
        roundtrip.alias("ts_roundtrip"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_part(F.lit("DAYOFWEEK_ISO"), d).cast("int").alias("isodow"),
        F.date_part(F.lit("YEAROFWEEK"), d).cast("int").alias("isoyear"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_first"),
        F.trunc(d, "quarter").alias("quarter_start"),
    ).orderBy("o_orderkey")


def spatial_funcs5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth spatial batch (reference "100+ functions" contract,
    docs/geometry.md): envelope set algebra + DE-9IM-lite predicates —
    ST_Intersection/ST_Union/ST_Difference restricted to axis-aligned
    envelopes (the bbox pre-filter algebra every spatial engine runs
    before exact geometry), ST_Equals/ST_Touches/ST_Overlaps/
    ST_Contains on envelopes, ST_Boundary of a path, and radial-
    distance ST_Simplify. All min/max/compare arithmetic — the oracle
    reproduces every value exactly."""
    from gizmosql_spark import functions as gf

    gf.register_all(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp5")
    return spark.sql("""
        WITH src AS (
            SELECT event_id,
                   st_makeenvelope(value, value / 2D,
                                   value + 30D, value / 2D + 20D) AS ra,
                   st_makeenvelope(CAST(user_id AS DOUBLE),
                                   CAST(user_id % 40 AS DOUBLE),
                                   CAST(user_id AS DOUBLE) + 25D,
                                   CAST(user_id % 40 AS DOUBLE) + 15D) AS rb
            FROM events_sp5 WHERE event_id < 2000
        ), env AS (
            SELECT event_id,
                   st_envelope(ra) AS a, st_envelope(rb) AS b,
                   ra, rb
            FROM src
        )
        SELECT event_id,
               round(st_env_area(st_intersection_env(a, b)), 6)
                   AS inter_area,
               round(st_env_area(st_union_env(a, b)), 6) AS union_area,
               round(st_difference_area_env(a, b), 6) AS diff_area,
               st_equals_env(a, b) AS env_equal,
               st_touches_env(a, b) AS env_touches,
               st_overlaps_env(a, b) AS env_overlaps,
               st_contains_env_env(st_expand(a, 100D), b) AS env_contains,
               st_numpoints(st_boundary_line(
                   st_makeline(st_point(a.xmin, a.ymin),
                               st_point(b.xmax, b.ymax)))) AS n_boundary,
               st_numpoints(st_simplify_radial(ra, 22D)) AS n_simplified
        FROM env
        ORDER BY event_id
    """)


def spatial_funcs6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventh spatial batch (round-4): TRUE polygon set algebra —
    general Sutherland–Hodgman clipping (concave subjects × convex
    clips) fully inlined as JVM-side SQL, replacing round 3's
    envelope approximations (reference docs/geometry.md polygon
    intersection/union/difference contract).

    The oracle never runs the clipper: every expected value is an
    INDEPENDENT closed-form formula (triangle cut by a vertical line,
    rectangle overlap, an L-shape's piecewise-linear area-vs-cut
    curve, hull of a rectangle + one outlier), so agreement validates
    the general algorithm against geometry done a different way.

    Scale shape: pure per-row expression work — whole-stage codegen,
    no shuffle but the final ORDER BY; the hull is the only Arrow
    kernel (iterative pops can't fold)."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark import geo

    gf.register_all(spark)
    geo.register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp6")
    return spark.sql("""
        WITH p AS (
            SELECT event_id,
                   CAST(10 + user_id % 50 AS DOUBLE) AS w,
                   CAST(5 + user_id % 30 AS DOUBLE) AS h,
                   CAST(1 + user_id % 67 AS DOUBLE) AS c,
                   CAST(1 + user_id % 18 AS DOUBLE) AS x0,
                   CAST(1 + user_id % 8 AS DOUBLE) AS y0,
                   CAST(1 + user_id % 6 AS DOUBLE) AS nn,
                   CAST(1 + user_id % 9 AS DOUBLE) AS mm,
                   CAST(1 + user_id % 25 AS DOUBLE) AS cl,
                   CAST(user_id % 21 - 10 AS DOUBLE) AS dx,
                   CAST(user_id % 13 - 6 AS DOUBLE) AS dy
            FROM events_sp6 WHERE event_id < 2000
        ), g AS (
            SELECT p.*,
                   array(named_struct('x', 0d, 'y', 0d),
                         named_struct('x', w, 'y', 0d),
                         named_struct('x', 0d, 'y', h),
                         named_struct('x', 0d, 'y', 0d)) AS tri,
                   st_makeenvelope(0d, 0d, c, 40d) AS cliptri,
                   st_makeenvelope(0d, 0d, 20d, 10d) AS recta,
                   st_makeenvelope(x0, y0, x0 + 20d, y0 + 10d) AS rectb,
                   array(named_struct('x', 0d, 'y', 0d),
                         named_struct('x', 20d, 'y', 0d),
                         named_struct('x', 20d, 'y', 10d - nn),
                         named_struct('x', 20d - mm, 'y', 10d - nn),
                         named_struct('x', 20d - mm, 'y', 10d),
                         named_struct('x', 0d, 'y', 10d),
                         named_struct('x', 0d, 'y', 0d)) AS lshape,
                   st_makeenvelope(0d, -5d, cl, 15d) AS clipl,
                   array(named_struct('x', 0d, 'y', 0d),
                         named_struct('x', 20d, 'y', 0d),
                         named_struct('x', 20d, 'y', 10d),
                         named_struct('x', 0d, 'y', 10d),
                         named_struct('x', 5d, 'y', 5d),
                         named_struct('x', 21d, 'y', y0)) AS cloud
            FROM p
        )
        SELECT event_id,
               round(st_intersection_area_poly(tri, cliptri), 6)
                   AS tri_clip_area,
               size(st_clip_halfplane(tri,
                    named_struct('x', c, 'y', 0d),
                    named_struct('x', c, 'y', 40d))) AS tri_clip_npts,
               round(st_intersection_area_poly(recta, rectb), 6)
                   AS rect_inter_area,
               size(st_intersection_poly(recta, rectb))
                   AS rect_inter_npts,
               round(st_union_area_poly(recta, rectb), 6)
                   AS rect_union_area,
               round(st_difference_area_poly(recta, rectb), 6)
                   AS rect_diff_area,
               round(st_intersection_area_poly(lshape, clipl), 6)
                   AS l_clip_area,
               round(st_poly_area(st_convexhull(cloud)), 6) AS hull_area,
               size(st_convexhull(cloud)) AS hull_npts,
               round(st_azimuth_deg(named_struct('x', 0d, 'y', 0d),
                                    named_struct('x', dx, 'y', dy)), 6)
                   AS azimuth,
               st_orientation(tri) AS orient_ccw,
               st_orientation(st_reverse(tri)) AS orient_cw
        FROM g
        ORDER BY event_id
    """)


def spatial_funcs7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eighth spatial batch (round-4 breadth): accessors, constructors,
    segment algorithms, ring folds, tiling, and the WKT polygon codec —
    36 new ST_* functions closing the reference's "100+ spatial
    functions" contract (docs/geometry.md). Oracle values are
    independent closed forms: envelope gaps are Pythagorean distances,
    the diagonal intersection is the rectangle center, the point-to-
    ring distance is the horizontal gap, quadkey digits come from
    INTEGER bit arithmetic while the engine computes them in floating
    point, and the WKT round-trip must reproduce the exact area."""
    from gizmosql_spark import functions as gf
    from gizmosql_spark import geo

    gf.register_all(spark)
    geo.register_geo(spark)
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sp7")
    return spark.sql("""
        WITH p AS (
            SELECT event_id,
                   CAST(user_id % 10 AS DOUBLE) AS x0,
                   CAST(user_id % 7 AS DOUBLE) AS y0,
                   CAST(4 + user_id % 6 AS DOUBLE) AS w,
                   CAST(3 + user_id % 5 AS DOUBLE) AS h,
                   CAST(1 + user_id % 5 AS DOUBLE) AS gx,
                   CAST(2 + user_id % 4 AS DOUBLE) AS gy,
                   CAST(1 + user_id % 3 AS DOUBLE) AS dxp,
                   CAST(1 + user_id % 4 AS DOUBLE) AS ed,
                   CAST(user_id % 16 AS INT) AS qx,
                   CAST(user_id % 8 AS INT) AS qy
            FROM events_sp7 WHERE event_id < 2000
        ), g AS (
            SELECT p.*,
                   st_makeenvelope(x0, y0, x0 + w, y0 + h) AS ring,
                   named_struct('xmin', x0, 'ymin', y0,
                                'xmax', x0 + w, 'ymax', y0 + h) AS env,
                   named_struct('xmin', x0 + w + gx, 'ymin', y0 + h + gy,
                                'xmax', x0 + w + gx + 2d,
                                'ymax', y0 + h + gy + 2d) AS env2,
                   named_struct('x', x0, 'y', y0) AS bl,
                   named_struct('x', x0 + w, 'y', y0 + h) AS tr,
                   named_struct('x', x0, 'y', y0 + h) AS tl,
                   named_struct('x', x0 + w, 'y', y0) AS br
            FROM p
        )
        SELECT event_id,
               st_xmin(ring) AS r_xmin, st_xmax(ring) AS r_xmax,
               st_ymin(ring) AS r_ymin, st_ymax(ring) AS r_ymax,
               st_width_env(env) AS env_w, st_height_env(env) AS env_h,
               st_isvalid_ring(ring) AS is_valid,
               st_ispolygonccw(ring) AS is_ccw,
               st_geometrytype_ring(ring) AS gtype,
               st_dimension_ring(ring) AS gdim,
               st_numinteriorrings(ring) AS n_holes,
               st_midpoint(bl, tr).x AS mid_x,
               st_midpoint(bl, tr).y AS mid_y,
               round(st_distance_env(env, env2), 6) AS env_gap,
               st_segment_intersects(bl, tr, tl, br) AS diag_hit,
               round(st_segment_intersection(bl, tr, tl, br).x, 6)
                   AS diag_ix,
               round(st_segment_intersection(bl, tr,
                     named_struct('x', x0, 'y', y0 - 1d),
                     named_struct('x', x0 + w, 'y', y0 + h - 1d)).x, 6)
                   AS par_ix,
               round(st_distance_ring(
                     named_struct('x', x0 + w + dxp, 'y', y0 + 1d),
                     ring), 6) AS ring_dist,
               st_closestpoint_ring(
                     named_struct('x', x0 + w + dxp, 'y', y0 + 1d),
                     ring).x AS cp_x,
               round(st_maxdistance(ring, ring), 6) AS max_dist,
               size(st_segmentize(array(bl, br), 2d)) AS seg_npts,
               st_normalize_ring(array(tr, tl, bl, br, tr))[0].x
                   AS norm_x,
               st_quadkey((qx + 0.5d) / 16d, (qy + 0.5d) / 8d, 4)
                   AS quadkey,
               round(st_poly_area(
                     st_geomfromtext_poly(st_astext_poly(ring))), 6)
                   AS wkt_rt_area,
               size(st_geomfromtext_poly(st_astext_poly(ring)))
                   AS wkt_rt_npts,
               st_pointonsurface(ring).x AS pos_x,
               round(st_env_area(st_expand_point(bl, ed)), 6)
                   AS exp_area,
               st_env_area(st_makebox2d(tr, bl)) AS box_area,
               size(st_makepolygon(array(bl, br, tr))) AS mkpoly_npts,
               size(st_removepoint(ring, 2)) AS rm_npts,
               st_setpoint(ring, 2, named_struct('x', 9d, 'y', 9d))[1].x
                   AS set_x,
               round(st_poly_area(st_rotate_rad(ring, 1d)), 6)
                   AS rot_area,
               round(st_perimeter_env(env), 6) AS env_perim,
               round(st_minboundradius_env(env), 6) AS env_radius,
               st_centroid_env(env).x AS cen_x,
               st_isempty(ring) AS is_empty
        FROM g
        ORDER BY event_id
    """)


def spatial_extent_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Extent_Agg analog: per-group aggregate bounding box over a
    point cloud (the layer-extent / tile-index computation), plus the
    group's point count and extent area.

    Scale shape: ONE partial-aggregable min/max groupBy — extent
    aggregation is the textbook mergeable spatial aggregate (each
    partition folds its own bbox; merge is min/max of 4 doubles)."""
    e = _t(spark, sf_dir, "events")
    px = F.col("value")
    py = F.pmod(F.col("user_id").cast("double"), F.lit(120.0)) - 60.0
    return (
        e.select("event_type", px.alias("px"), py.alias("py"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.min("px"), 6).alias("xmin"),
            F.round(F.min("py"), 6).alias("ymin"),
            F.round(F.max("px"), 6).alias("xmax"),
            F.round(F.max("py"), 6).alias("ymax"),
            F.round(
                (F.max("px") - F.min("px")) * (F.max("py") - F.min("py")), 6
            ).alias("extent_area"),
        )
        .orderBy("event_type")
    )


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the parts no other part beats on
    BOTH price (lower better) and size (higher better) — the classic
    preference/top-k-without-a-scoring-function query.

    Spark-first shape: instead of the naive O(n²) dominance anti-join,
    the frontier falls out of running maxima over the price ordering
    (the textbook sort-scan skyline): a (price, size) point survives
    iff its size equals the running max over all points priced <= it
    AND strictly exceeds the max over all points priced < it. RANGE
    frames on integer cents make both bounds exact.

    The running maxima are computed DISTRIBUTED, the same two-pass
    range-bucket scheme as scale.global_row_number (the part table
    grows with the corpus — an unpartitioned RANGE window would
    single-task it at 100 TB): equi-depth price buckets from one
    approxQuantile pass (ties never span buckets, so "priced below
    me" = strictly-earlier buckets + my bucket's local RANGE frame),
    per-bucket local running maxima behind a hash exchange, and a
    ≤B-entry literal prefix-max map from one bounded per-bucket-max
    collect (B is conf-bound — the centroid-pull scalar class). No
    unpartitioned window anywhere (plan-pinned); no joins at all."""
    from gizmosql_spark.operators import scale

    p = _t(spark, sf_dir, "part")
    pts = (
        p.select(
            F.round(F.col("p_retailprice") * 100).cast("bigint")
            .alias("price_cents"),
            F.col("p_size").cast("int").alias("size"),
        )
        .distinct()
    )
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bnds = scale.range_boundaries(
        pts, ["price_cents"], n_buckets,
        cache_key=sf_dir + ":part_price")[0]
    # materialize the bucketed frame once: the local-maxima window
    # branch and the per-bucket-max stats job are separate consumers,
    # and each would otherwise recompute the scan + DISTINCT shuffle
    # (measured at sf10: 12.7 s unmaterialized vs sub-second with the
    # r10 single-window form; the checkpoint closes most of that gap
    # while keeping the distributed shape)
    # r12: the bucketed point set and its per-bucket maxima are
    # deterministic per fixture dir — keyed-persist + scalar cache
    # (scale.keyed_frame_scalars) replaces the per-call
    # localCheckpoint + collect, so warm invocations run one job
    bpts, bmax = scale.keyed_frame_scalars(
        spark, f"{sf_dir}:skyline_pts:{scale._boundary_sig([bnds])}",
        pts.withColumn(
            "__bkt", scale.bucket_expr(F.col("price_cents"), bnds)),
        lambda bdf: sorted(
            (r["__bkt"], r["__m"])
            for r in bdf.groupBy("__bkt").agg(
                F.max("size").alias("__m")).collect()))
    w_le = (
        Window.partitionBy("__bkt").orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lt = Window.partitionBy("__bkt").orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1)
    # prefix-max of STRICTLY earlier buckets as a ≤B-entry literal
    # map (NULL for the first bucket — greatest() skips NULL
    # operands). One bounded collect replaces the r11-build's
    # broadcast collect_list-fold + hash join: the collected frame is
    # B rows (conf-bound), the same bounded-scalar class as the
    # k-means centroid pull — O(B) at any scale factor.
    pmax: dict[int, int] = {}
    cur = None
    for b, m in bmax:
        if cur is not None:
            pmax[b] = cur
        cur = m if cur is None or m > cur else cur
    if pmax:
        pmax_lookup = F.element_at(
            F.create_map(*[
                x for k, v in pmax.items()
                for x in (F.lit(int(k)), F.lit(int(v)))]),
            F.col("__bkt"))
    else:
        pmax_lookup = F.lit(None).cast("int")
    return (
        bpts.withColumn("max_le_loc", F.max("size").over(w_le))
        .withColumn("max_lt_loc", F.max("size").over(w_lt))
        .withColumn("__pmax", pmax_lookup)
        .withColumn("max_le", F.greatest("max_le_loc", "__pmax"))
        .withColumn("max_lt", F.greatest("max_lt_loc", "__pmax"))
        .filter(
            (F.col("size") == F.col("max_le"))
            & (F.col("max_lt").isNull() | (F.col("size") > F.col("max_lt")))
        )
        .select("price_cents", "size")
        .orderBy("price_cents")
    )


def benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of lineitem extended prices: observed
    leading-digit distribution vs log10(1 + 1/d), with per-digit
    chi-square contributions — the fraud/data-quality screen over a
    measure column.

    Scale shape: one scan, one 9-group partial agg; the total-count
    normalization rides a window over the 9-row aggregate (no second
    scan)."""
    l = _t(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.floor("l_extendedprice").cast("string"), 1, 1).cast("int")
    per_digit = (
        l.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy()
    total = F.sum("n").over(w_all)
    expected = F.log10(1 + 1 / F.col("digit"))
    observed = F.col("n") / total
    return (
        per_digit.select(
            "digit",
            "n",
            F.round(observed, 6).alias("observed_p"),
            # + 0.0: no real -0.0 path (log10(1 + 1/d) > 0 for d ≥ 1),
            # but the normalizer is the lint's symmetric invariant for
            # every rounded log-shaped output — a no-op here
            (F.round(expected, 6) + F.lit(0.0)).alias("benford_p"),
            (F.round(
                F.pow(observed - expected, 2) / expected * total, 6
            ) + F.lit(0.0)).alias("chi2_term"),
        )
        .orderBy("digit")
    )


QUERIES = {
    "range_band_join": range_band_join,
    "skyline_parts": skyline_parts,
    "spatial_funcs5": spatial_funcs5,
    "spatial_funcs6": spatial_funcs6,
    "spatial_funcs7": spatial_funcs7,
    "spatial_extent_agg": spatial_extent_agg,
    "benford_prices": benford_prices,
    "spatial_funcs": spatial_funcs,
    "spatial_wkb": spatial_wkb,
    "spatial_wkb2": spatial_wkb2,
    "spatial_funcs2": spatial_funcs2,
    "spatial_funcs3": spatial_funcs3,
    "spatial_funcs4": spatial_funcs4,
    "columns_expansion": columns_expansion,
    "spatial_join": spatial_join,
    "spatial_knn_join": spatial_knn_join,
    "fuzzy_join": fuzzy_join,
    "data_quality_report": data_quality_report,
    "numeric_funcs2": numeric_funcs2,
    "datetime_funcs2": datetime_funcs2,
    "array_funcs": array_funcs,
    "set_ops_all": set_ops_all,
    "null_ordering": null_ordering,
    "recursive_cte": recursive_cte,
    "lateral_join": lateral_join,
    "window_rank_funcs": window_rank_funcs,
    "window_time_range": window_time_range,
    "agg_funcs": agg_funcs,
    "decimal_agg": decimal_agg,
    "unpivot_metrics": unpivot_metrics,
    "group_by_all": group_by_all,
    "full_outer_join": full_outer_join,
    "semi_anti_join": semi_anti_join,
    "window_lag_lead": window_lag_lead,
    "datetime_funcs": datetime_funcs,
    "numeric_funcs": numeric_funcs,
    "stats_agg": stats_agg,
    "regr_agg": regr_agg,
    "argminmax_agg": argminmax_agg,
    "percentile_agg": percentile_agg,
    "window_topk": window_topk,
    "window_running": window_running,
    "window_frame": window_frame,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "grouping_sets_agg": grouping_sets_agg,
    "set_ops": set_ops,
    "pivot_counts": pivot_counts,
    "unnest_embeddings": unnest_embeddings,
    "values_join": values_join,
}

ORACLE: dict[str, str] = {
    "spatial_funcs7": """
        WITH p AS (
            SELECT event_id,
                   CAST(user_id % 10 AS DOUBLE) AS x0,
                   CAST(user_id % 7 AS DOUBLE) AS y0,
                   CAST(4 + user_id % 6 AS DOUBLE) AS w,
                   CAST(3 + user_id % 5 AS DOUBLE) AS h,
                   CAST(1 + user_id % 5 AS DOUBLE) AS gx,
                   CAST(2 + user_id % 4 AS DOUBLE) AS gy,
                   CAST(1 + user_id % 3 AS DOUBLE) AS dxp,
                   CAST(1 + user_id % 4 AS DOUBLE) AS ed,
                   CAST(user_id % 16 AS INTEGER) AS qx,
                   CAST(user_id % 8 AS INTEGER) AS qy
            FROM events WHERE event_id < 2000
        )
        SELECT event_id,
               x0 AS r_xmin, x0 + w AS r_xmax,
               y0 AS r_ymin, y0 + h AS r_ymax,
               w AS env_w, h AS env_h,
               true AS is_valid, true AS is_ccw,
               'ST_Polygon' AS gtype,
               CAST(2 AS INTEGER) AS gdim,
               CAST(0 AS INTEGER) AS n_holes,
               x0 + w / 2 AS mid_x, y0 + h / 2 AS mid_y,
               round(sqrt(gx * gx + gy * gy), 6) AS env_gap,
               true AS diag_hit,
               round(x0 + w / 2, 6) AS diag_ix,
               CAST(NULL AS DOUBLE) AS par_ix,
               round(dxp, 6) AS ring_dist,
               x0 + w AS cp_x,
               round(sqrt(w * w + h * h), 6) AS max_dist,
               CAST(ceil(w / 2) + 1 AS INTEGER) AS seg_npts,
               x0 AS norm_x,
               -- quadkey digits from INTEGER bit arithmetic (the
               -- engine derives them in floating point)
               CAST(CAST((qx // 8) % 2 + 2 * ((qy // 4) % 2) AS INTEGER)
                    AS VARCHAR)
               || CAST(CAST((qx // 4) % 2 + 2 * ((qy // 2) % 2)
                            AS INTEGER) AS VARCHAR)
               || CAST(CAST((qx // 2) % 2 + 2 * (qy % 2) AS INTEGER)
                       AS VARCHAR)
               || CAST(CAST(qx % 2 + 2 AS INTEGER) AS VARCHAR)
                   AS quadkey,
               round(w * h, 6) AS wkt_rt_area,
               CAST(5 AS INTEGER) AS wkt_rt_npts,
               x0 + w / 2 AS pos_x,
               round(4 * ed * ed, 6) AS exp_area,
               w * h AS box_area,
               CAST(4 AS INTEGER) AS mkpoly_npts,
               CAST(4 AS INTEGER) AS rm_npts,
               CAST(9 AS DOUBLE) AS set_x,
               round(w * h, 6) AS rot_area,
               round(2 * (w + h), 6) AS env_perim,
               round(sqrt(w * w + h * h) / 2, 6) AS env_radius,
               x0 + w / 2 AS cen_x,
               false AS is_empty
        FROM p
        ORDER BY event_id
    """,
    "spatial_funcs6": """
        WITH p AS (
            SELECT event_id,
                   CAST(10 + user_id % 50 AS DOUBLE) AS w,
                   CAST(5 + user_id % 30 AS DOUBLE) AS h,
                   CAST(1 + user_id % 67 AS DOUBLE) AS c,
                   CAST(1 + user_id % 18 AS DOUBLE) AS x0,
                   CAST(1 + user_id % 8 AS DOUBLE) AS y0,
                   CAST(1 + user_id % 6 AS DOUBLE) AS nn,
                   CAST(1 + user_id % 9 AS DOUBLE) AS mm,
                   CAST(1 + user_id % 25 AS DOUBLE) AS cl,
                   CAST(user_id % 21 - 10 AS DOUBLE) AS dx,
                   CAST(user_id % 13 - 6 AS DOUBLE) AS dy
            FROM events WHERE event_id < 2000
        )
        SELECT event_id,
               -- triangle (0,0)(w,0)(0,h) cut at x<=c: integral of
               -- the linear height profile (independent of clipping)
               round(CASE WHEN c >= w THEN w * h / 2
                          ELSE w * h / 2 - h * (w - c) * (w - c) / (2 * w)
                     END, 6) AS tri_clip_area,
               CAST(CASE WHEN c >= w THEN 4 ELSE 5 END AS INTEGER)
                   AS tri_clip_npts,
               round((20 - x0) * (10 - y0), 6) AS rect_inter_area,
               CAST(5 AS INTEGER) AS rect_inter_npts,
               round(400 - (20 - x0) * (10 - y0), 6) AS rect_union_area,
               round(200 - (20 - x0) * (10 - y0), 6) AS rect_diff_area,
               -- L-shape height profile: 10 left of the notch,
               -- 10-nn under it
               round(10 * least(cl, 20 - mm)
                     + (10 - nn)
                       * greatest(0, least(cl, 20) - (20 - mm)), 6)
                   AS l_clip_area,
               round(CAST(205 AS DOUBLE), 6) AS hull_area,
               CAST(6 AS INTEGER) AS hull_npts,
               round(fmod(degrees(atan2(dx, dy)) + 360, 360), 6)
                   AS azimuth,
               CAST(1 AS INTEGER) AS orient_ccw,
               CAST(-1 AS INTEGER) AS orient_cw
        FROM p
        ORDER BY event_id
    """,
    "spatial_funcs5": """
        WITH env AS (
            SELECT event_id,
                   value AS ax0, value / 2 AS ay0,
                   value + 30 AS ax1, value / 2 + 20 AS ay1,
                   CAST(user_id AS DOUBLE) AS bx0,
                   CAST(user_id % 40 AS DOUBLE) AS by0,
                   CAST(user_id AS DOUBLE) + 25 AS bx1,
                   CAST(user_id % 40 AS DOUBLE) + 15 AS by1
            FROM events WHERE event_id < 2000
        ), m AS (
            SELECT *,
                   greatest(ax0, bx0) AS ixmin, least(ax1, bx1) AS ixmax,
                   greatest(ay0, by0) AS iymin, least(ay1, by1) AS iymax
            FROM env
        )
        SELECT event_id,
               round(greatest(ixmax - ixmin, 0)
                     * greatest(iymax - iymin, 0), 6) AS inter_area,
               round((greatest(ax1, bx1) - least(ax0, bx0))
                     * (greatest(ay1, by1) - least(ay0, by0)), 6)
                   AS union_area,
               round((ax1 - ax0) * (ay1 - ay0)
                     - greatest(ixmax - ixmin, 0)
                     * greatest(iymax - iymin, 0), 6) AS diff_area,
               (ax0 = bx0 AND ay0 = by0 AND ax1 = bx1 AND ay1 = by1)
                   AS env_equal,
               (ixmin <= ixmax AND iymin <= iymax
                AND (ixmin = ixmax OR iymin = iymax)) AS env_touches,
               (ixmin < ixmax AND iymin < iymax
                AND NOT (ax0 <= bx0 AND ay0 <= by0
                         AND ax1 >= bx1 AND ay1 >= by1)
                AND NOT (bx0 <= ax0 AND by0 <= ay0
                         AND bx1 >= ax1 AND by1 >= ay1)) AS env_overlaps,
               (ax0 - 100 <= bx0 AND ay0 - 100 <= by0
                AND ax1 + 100 >= bx1 AND ay1 + 100 >= by1)
                   AS env_contains,
               CAST(CASE WHEN ax0 = bx1 AND ay0 = by1 THEN 0 ELSE 2 END
                    AS INTEGER) AS n_boundary,
               CAST(3 AS INTEGER) AS n_simplified
        FROM m
        ORDER BY event_id
    """,
    "spatial_extent_agg": """
        WITH pts AS (
            SELECT event_type, value AS px,
                   fmod(CAST(user_id AS DOUBLE), 120) - 60 AS py
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_points,
               round(min(px), 6) AS xmin, round(min(py), 6) AS ymin,
               round(max(px), 6) AS xmax, round(max(py), 6) AS ymax,
               round((max(px) - min(px)) * (max(py) - min(py)), 6)
                   AS extent_area
        FROM pts GROUP BY event_type
        ORDER BY event_type
    """,
    "skyline_parts": """
        WITH pts AS (
            SELECT DISTINCT
                   CAST(round(p_retailprice * 100) AS BIGINT)
                       AS price_cents,
                   CAST(p_size AS INTEGER) AS size
            FROM part
        ), scanned AS (
            SELECT price_cents, size,
                   max(size) OVER (
                       ORDER BY price_cents
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS max_le,
                   max(size) OVER (
                       ORDER BY price_cents
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS max_lt
            FROM pts
        )
        SELECT price_cents, size
        FROM scanned
        WHERE size = max_le AND (max_lt IS NULL OR size > max_lt)
        ORDER BY price_cents
    """,
    "benford_prices": """
        WITH per_digit AS (
            SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1
        )
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / sum(n) OVER (), 6)
                   AS observed_p,
               round(log10(1 + 1.0 / digit), 6) + 0.0 AS benford_p,
               round(pow(CAST(n AS DOUBLE) / sum(n) OVER ()
                         - log10(1 + 1.0 / digit), 2)
                     / log10(1 + 1.0 / digit) * sum(n) OVER (), 6)
                   + 0.0 AS chi2_term
        FROM per_digit
        ORDER BY digit
    """,
    "numeric_funcs2": """
        SELECT l_orderkey, l_linenumber,
               round(cbrt(l_quantity), 6) AS cbrt_q,
               round(radians(l_quantity), 6) AS rad_q,
               round(degrees(l_quantity / 10), 6) AS deg_q,
               CAST(factorial(CAST(l_linenumber AS INTEGER)) AS BIGINT) AS fact_ln,
               CAST(NULL AS DOUBLE) AS null_probe,
               round(atan2(l_quantity, l_discount + 1), 6) AS atan2_v,
               round(cot(l_quantity / 100 + 1), 6) AS cot_v,
               round(log2(l_quantity + 1), 6) + 0.0 AS log2_q,
               round(pi(), 6) AS pi_v
        FROM lineitem
        WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber
    """,
    "datetime_funcs2": """
        SELECT o_orderkey,
               strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                        '%Y-%m-%d %H:%M:%S') AS ts_roundtrip,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(isodow(o_orderdate) AS INTEGER) AS isodow,
               CAST(isoyear(o_orderdate) AS INTEGER) AS isoyear,
               make_date(CAST(year(o_orderdate) AS INTEGER),
                         CAST(month(o_orderdate) AS INTEGER), 1) AS month_first,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
        FROM orders
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey
    """,
    "group_by_all": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY l_returnflag, l_linestatus
    """,
    "unpivot_metrics": """
        SELECT metric,
               count(*) AS n,
               round(sum(val), 2) AS total,
               round(avg(val), 6) AS mean
        FROM (
            SELECT l_orderkey, metric, val
            FROM lineitem
            UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
        )
        GROUP BY metric
        ORDER BY metric
    """,
    "decimal_agg": """
        WITH l AS (
            SELECT l_returnflag,
                   CAST(l_extendedprice AS DECIMAL(15,2)) AS p
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(sum(p) AS DECIMAL(38,2)) AS sum_price,
               CAST(min(p) AS DECIMAL(15,2)) AS min_price,
               CAST(max(p) AS DECIMAL(15,2)) AS max_price,
               count(*) AS n
        FROM l
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "window_rank_funcs": """
        SELECT o_orderkey, o_orderpriority,
               CAST(dense_rank() OVER w AS INTEGER) AS drank,
               round(percent_rank() OVER w, 6) AS prank,
               round(cume_dist() OVER w, 6) AS cdist,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               first_value(o_orderkey) OVER wf AS top_key,
               last_value(o_orderkey) OVER wf AS bottom_key
        FROM orders
        WHERE o_orderkey < 300
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey),
               wf AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderkey
    """,
    "agg_funcs": """
        SELECT o_orderpriority,
               CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
               bool_or(o_orderstatus = 'F') AS any_f,
               bool_and(o_totalprice > 0) AS all_pos,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_total,
               median(o_totalprice) AS med_price,
               array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR)))[1:5], ',')
                   AS first_keys
        FROM orders
        WHERE o_orderkey < 2000
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "recursive_cte": """
        WITH RECURSIVE days(d) AS (
            SELECT DATE '2024-01-01'
            UNION ALL
            SELECT d + 1 FROM days WHERE d < DATE '2024-01-10'
        )
        SELECT d, count(e.event_id) AS n
        FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = d
        GROUP BY d
        ORDER BY d
    """,
    "lateral_join": """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n,
        LATERAL (
            SELECT c_name, c_acctbal
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
        ) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
    """,
    "set_ops_all": """
        WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
             s AS (SELECT s_nationkey AS nationkey FROM supplier),
        ia AS (
            SELECT 'intersect_all' AS op, nationkey, count(*) AS n
            FROM (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s)
            GROUP BY nationkey),
        ea AS (
            SELECT 'except_all' AS op, nationkey, count(*) AS n
            FROM (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
            GROUP BY nationkey)
        SELECT op, nationkey, n FROM ia
        UNION ALL
        SELECT op, nationkey, n FROM ea
        ORDER BY op, nationkey
    """,
    "null_ordering": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_totalprice END AS maybe_price
        FROM orders
        WHERE o_orderkey < 400
        ORDER BY maybe_price ASC NULLS LAST, o_orderkey ASC
        LIMIT 50
    """,
    "array_funcs": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
            FROM embeddings
        )
        SELECT vec_id,
               CAST(len(emb) AS INTEGER) AS n_dims,
               round(emb[1], 6) AS first_v,
               round(list_max(emb), 6) AS max_v,
               round(list_min(emb), 6) AS min_v,
               round(list_sum(emb[1:8]), 6) AS sum8,
               round(list_sort(emb)[3], 6) AS third_smallest,
               label AS label_via_map,
               label AS label_via_struct
        FROM e
        ORDER BY vec_id
    """,
    "spatial_funcs": """
        SELECT event_id,
               round(sqrt((value - 50) * (value - 50)
                          + (user_id - 50.0) * (user_id - 50.0)), 6) AS dist,
               sqrt((value - 50) * (value - 50)
                    + (user_id - 50.0) * (user_id - 50.0)) <= 25 AS within_25,
               value >= 0 AND value <= 50
                   AND user_id >= 0 AND user_id <= 50 AS in_bbox,
               value AS px,
               CAST(user_id AS DOUBLE) AS py
        FROM events
        WHERE event_id < 2000
        ORDER BY event_id
    """,
    "spatial_wkb": """
        SELECT event_id,
               value AS wx,
               CAST(user_id AS DOUBLE) AS wy,
               round(sqrt((value - 50) * (value - 50)
                          + (user_id - 50.0) * (user_id - 50.0)), 6) AS wdist,
               CAST(user_id AS DOUBLE) AS tx
        FROM events
        WHERE event_id < 1000
        ORDER BY event_id
    """,
    "spatial_wkb2": """
        WITH src AS (
            SELECT event_id, value,
                   {'x': value, 'y': CAST(user_id AS DOUBLE)} AS p,
                   value / 10 + 1 AS r
            FROM events WHERE event_id < 1000
        ),
        buf AS (
            SELECT event_id, p, r,
                [ {'x': p['x'] + r, 'y': p['y']},
                  {'x': p['x'] + r * sqrt(0.5), 'y': p['y'] + r * sqrt(0.5)},
                  {'x': p['x'], 'y': p['y'] + r},
                  {'x': p['x'] - r * sqrt(0.5), 'y': p['y'] + r * sqrt(0.5)},
                  {'x': p['x'] - r, 'y': p['y']},
                  {'x': p['x'] - r * sqrt(0.5), 'y': p['y'] - r * sqrt(0.5)},
                  {'x': p['x'], 'y': p['y'] - r},
                  {'x': p['x'] + r * sqrt(0.5), 'y': p['y'] - r * sqrt(0.5)},
                  {'x': p['x'] + r, 'y': p['y']} ] AS ring,
                [ {'x': 150.0 + 80.0, 'y': 75.0},
                  {'x': 150.0 + 80.0 * sqrt(0.5), 'y': 75.0 + 80.0 * sqrt(0.5)},
                  {'x': 150.0, 'y': 155.0},
                  {'x': 150.0 - 80.0 * sqrt(0.5), 'y': 75.0 + 80.0 * sqrt(0.5)},
                  {'x': 70.0, 'y': 75.0},
                  {'x': 150.0 - 80.0 * sqrt(0.5), 'y': 75.0 - 80.0 * sqrt(0.5)},
                  {'x': 150.0, 'y': -5.0},
                  {'x': 150.0 + 80.0 * sqrt(0.5), 'y': 75.0 - 80.0 * sqrt(0.5)},
                  {'x': 230.0, 'y': 75.0} ] AS zring
            FROM src
        )
        SELECT event_id,
            (list_sum(list_transform(range(1, 9), i ->
                CASE WHEN (zring[i]['y'] > p['y']) != (zring[i+1]['y'] > p['y'])
                      AND p['x'] < (zring[i+1]['x'] - zring[i]['x'])
                          * (p['y'] - zring[i]['y'])
                          / nullif(zring[i+1]['y'] - zring[i]['y'], 0)
                          + zring[i]['x']
                     THEN 1 ELSE 0 END)) % 2) = 1 AS in_zone,
            round(0.5 * list_sum(list_transform(range(1, 9), i ->
                ring[i]['x'] * ring[i+1]['y']
                - ring[i+1]['x'] * ring[i]['y'])), 6) AS buf_area,
            round(list_sum(list_transform(range(1, 9), i ->
                sqrt((ring[i]['x'] - ring[i+1]['x'])
                     * (ring[i]['x'] - ring[i+1]['x'])
                     + (ring[i]['y'] - ring[i+1]['y'])
                     * (ring[i]['y'] - ring[i+1]['y'])))), 6) AS buf_perim,
            CAST(len(ring) AS INT) AS npts,
            round(list_sum(list_transform(range(1, 9), i ->
                (ring[i]['x'] + ring[i+1]['x'])
                * (ring[i]['x'] * ring[i+1]['y'] - ring[i+1]['x'] * ring[i]['y'])))
                / (6.0 * 0.5 * list_sum(list_transform(range(1, 9), i ->
                    ring[i]['x'] * ring[i+1]['y']
                    - ring[i+1]['x'] * ring[i]['y']))), 6) AS cx,
            round(list_sum(list_transform(range(1, 9), i ->
                (ring[i]['x'] + ring[i+1]['x'])
                * (ring[i]['x'] * ring[i+1]['y'] - ring[i+1]['x'] * ring[i]['y'])))
                / (6.0 * 0.5 * list_sum(list_transform(range(1, 9), i ->
                    ring[i]['x'] * ring[i+1]['y']
                    - ring[i+1]['x'] * ring[i]['y']))), 6) AS cx_wkb,
            list_aggregate(list_transform(ring, v -> v['x']), 'min')
                <= list_aggregate(list_transform(zring, v -> v['x']), 'max')
            AND list_aggregate(list_transform(zring, v -> v['x']), 'min')
                <= list_aggregate(list_transform(ring, v -> v['x']), 'max')
            AND list_aggregate(list_transform(ring, v -> v['y']), 'min')
                <= list_aggregate(list_transform(zring, v -> v['y']), 'max')
            AND list_aggregate(list_transform(zring, v -> v['y']), 'min')
                <= list_aggregate(list_transform(ring, v -> v['y']), 'max')
                AS env_hit
        FROM buf
        ORDER BY event_id
    """,
    "data_quality_report": """
        SELECT 'orders.o_orderkey unique' AS rule,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_orderkey references orders',
               CAST(count(*) AS BIGINT)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem.l_quantity in (0, 50]',
               CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem ships on/after order date',
               CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'customer.c_acctbal not null',
               CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM customer
        ORDER BY rule
    """,
    "fuzzy_join": """
        WITH probes AS (
            SELECT probe FROM (VALUES ('smal ring'), ('red wdget'),
                ('blue boltt'), ('hot gear'), ('grene gizmo'))
                AS p(probe)
        ),
        p_tok AS (
            SELECT probe, unnest(string_split(probe, ' ')) AS tok
            FROM probes
        ),
        n_tok AS (
            SELECT p_partkey, p_name,
                   unnest(string_split(p_name, ' ')) AS tok
            FROM part
        ),
        cand AS (
            SELECT DISTINCT probe, p_partkey, p_name
            FROM p_tok JOIN n_tok USING (tok)
        )
        SELECT probe, p_partkey, p_name,
               CAST(levenshtein(probe, p_name) AS INT) AS dist
        FROM cand
        WHERE levenshtein(probe, p_name) <= 2
        ORDER BY probe, p_partkey
    """,
    "window_time_range": """
        SELECT o_custkey, o_orderdate, o_orderkey,
               round(sum(o_totalprice) OVER w, 4) AS trailing_30d_total,
               count(*) OVER w AS trailing_30d_n
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY CAST(o_orderdate AS TIMESTAMP)
            RANGE BETWEEN INTERVAL 29 DAYS PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "columns_expansion": """
        SELECT COLUMNS('^l_(orderkey|linenumber|quantity|returnflag)$')
        FROM lineitem WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber
    """,
    "spatial_funcs4": """
        WITH src AS (
            SELECT event_id,
                   fmod(value, 180) - 90 AS px,
                   fmod(CAST(user_id AS DOUBLE), 120) - 60 AS py
            FROM events WHERE event_id < 2000
        )
        SELECT event_id,
               round(fmod(atan2(0 - px, 0 - py) + 2 * pi(), 2 * pi()), 6)
                   AS az_to_origin,
               round(px + 10 * sin(1.25), 6) AS proj_x,
               round(py + 10 * cos(1.25), 6) AS proj_y,
               round(2 * 6371000 * asin(sqrt(
                   pow(sin(radians(0 - py) / 2), 2)
                   + cos(radians(py)) * cos(radians(0))
                     * pow(sin(radians(0 - px) / 2), 2))) / 1000, 3)
                   AS dist_km,
               round(fmod(atan2(0 - px, 1 - py)
                          - atan2(1 - px, 0 - py) + 4 * pi(),
                          2 * pi()), 6) AS corner_angle,
               CAST(3 AS INTEGER) AS n_points,
               round(CAST(5.0 AS DOUBLE), 6) AS rev_start_x,
               round(CAST(5.0 AS DOUBLE), 6) AS end_y
        FROM src
        ORDER BY event_id
    """,
    "spatial_funcs3": """
        WITH src AS (
            SELECT event_id, value,
                   CAST(user_id AS DOUBLE) AS uy,
                   value / 20 + 1 AS r
            FROM events WHERE event_id < 2000
        )
        SELECT event_id,
               (value - 50) * (value - 50) + (uy - 50) * (uy - 50)
                   <= 3600 AS near_center,
               (value + r) + 5 AS expanded_xmax,
               round((value + 1) * (uy + 1), 6) AS env_area,
               value + 0.25 * (50 - value) AS interp_x,
               10 + least(greatest(coalesce(
                   ((value - 10) * 70) / (70.0 * 70.0), 0), 0), 1) * 70
                   AS closest_x,
               uy AS flipped_x,
               floor(value / 7.5) * 7.5 AS snapped_x
        FROM src
        ORDER BY event_id
    """,
    "spatial_funcs2": """
        WITH src AS (
            SELECT event_id, value,
                   CAST(user_id AS DOUBLE) AS uy,
                   value / 20 + 1 AS r
            FROM events WHERE event_id < 2000
        )
        SELECT event_id,
               value - r AS env_xmin,
               uy + r AS env_ymax,
               (value + r) * 2 AS scaled_xmax,
               (uy - r) + (-5) AS trans_ymin,
               uy + r AS p3y,
               true AS closed,
               round(sqrt((value - 50) * (value - 50)
                          + (uy - 50) * (uy - 50)), 6) AS seg_len,
               50 >= value - r AND 50 <= value + r
                   AND 50 >= uy - r AND 50 <= uy + r AS env_has_center,
               -uy AS rot_x
        FROM src
        ORDER BY event_id
    """,
    "spatial_knn_join": f"""
        WITH pts AS (
            SELECT event_id, value AS x, CAST(user_id AS DOUBLE) AS y
            FROM events
        ),
        pairs AS (
            SELECT l.event_id AS l_id, p.event_id AS nbr,
                   (l.x - p.x) * (l.x - p.x)
                   + (l.y - p.y) * (l.y - p.y) AS d2
            FROM pts l JOIN pts p ON p.event_id <> l.event_id
            WHERE l.event_id < 500
              AND (l.x - p.x) * (l.x - p.x)
                  + (l.y - p.y) * (l.y - p.y)
                  <= {_KNN_RADIUS * _KNN_RADIUS}
        ),
        ranked AS (
            SELECT l_id, nbr, d2,
                   row_number() OVER (
                       PARTITION BY l_id ORDER BY d2, nbr) AS rn
            FROM pairs
        ),
        agg AS (
            SELECT l_id, count(*) AS n_within,
                   round(sqrt(min(d2)), 6) AS nearest_dist
            FROM pairs GROUP BY l_id
        )
        SELECT a.l_id AS event_id, a.n_within, a.nearest_dist,
               r.nbr AS nearest_id
        FROM agg a JOIN ranked r ON r.l_id = a.l_id AND r.rn = 1
        ORDER BY event_id
    """,
    "spatial_join": """
        WITH zones AS (
            SELECT name,
                [ {'x': cx + r, 'y': cy},
                  {'x': cx + r * sqrt(0.5), 'y': cy + r * sqrt(0.5)},
                  {'x': cx, 'y': cy + r},
                  {'x': cx - r * sqrt(0.5), 'y': cy + r * sqrt(0.5)},
                  {'x': cx - r, 'y': cy},
                  {'x': cx - r * sqrt(0.5), 'y': cy - r * sqrt(0.5)},
                  {'x': cx, 'y': cy - r},
                  {'x': cx + r * sqrt(0.5), 'y': cy - r * sqrt(0.5)},
                  {'x': cx + r, 'y': cy} ] AS ring
            FROM (VALUES ('west',  60.0,  40.0, 45.0),
                         ('mid',  170.0,  75.0, 60.0),
                         ('east', 290.0, 110.0, 50.0),
                         ('north', 120.0, 130.0, 35.0)) AS z(name, cx, cy, r)
        ),
        pts AS (
            SELECT event_id, value,
                   {'x': value, 'y': CAST(user_id AS DOUBLE)} AS p
            FROM events
        )
        SELECT name,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS total_value
        FROM pts, zones
        WHERE (list_sum(list_transform(range(1, 9), i ->
                CASE WHEN (ring[i]['y'] > p['y']) != (ring[i+1]['y'] > p['y'])
                      AND p['x'] < (ring[i+1]['x'] - ring[i]['x'])
                          * (p['y'] - ring[i]['y'])
                          / nullif(ring[i+1]['y'] - ring[i]['y'], 0)
                          + ring[i]['x']
                     THEN 1 ELSE 0 END)) % 2) = 1
        GROUP BY name
        ORDER BY name
    """,
    "range_band_join": """
        SELECT band, count(*) AS n,
               round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 30.0),
                     ('high', 30.0, 51.0)) AS b(band, lo, hi)
          ON l_quantity >= lo AND l_quantity < hi
        GROUP BY band
        ORDER BY band
    """,
    "full_outer_join": """
        WITH c AS (
            SELECT c_nationkey AS nk, count(*) AS n_cust
            FROM customer GROUP BY c_nationkey HAVING c_nationkey % 3 = 0),
        s AS (
            SELECT s_nationkey AS nk, count(*) AS n_supp
            FROM supplier GROUP BY s_nationkey HAVING s_nationkey % 2 = 0)
        SELECT coalesce(c.nk, s.nk) AS nk,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
        ORDER BY nk
    """,
    "semi_anti_join": """
        SELECT c_custkey, 'has_big_order' AS status
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        UNION ALL
        SELECT c_custkey, 'no_big_order' AS status
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        ORDER BY c_custkey
    """,
    "window_lag_lead": """
        SELECT user_id, event_id,
               lag(value, 1) OVER w AS prev_value,
               lead(value, 1) OVER w AS next_value,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(value - coalesce(lag(value, 1) OVER w, 0.0), 6) AS delta
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id
    """,
    "datetime_funcs": """
        SELECT o_orderkey,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
               CAST(date_part('quarter', o_orderdate) AS INTEGER) AS qtr,
               last_day(o_orderdate) AS month_end,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
               CAST(date_diff('day', o_orderdate, DATE '1998-12-01') AS INTEGER)
                   AS days_to_cutoff
        FROM orders
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey
    """,
    "numeric_funcs": """
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 30000) AS abs_v,
               CAST(ceil(l_quantity) AS BIGINT) AS ceil_q,
               CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q7,
               round(sqrt(l_extendedprice), 6) AS sqrt_x,
               round(ln(l_extendedprice), 6) AS ln_x,
               round(log10(l_extendedprice), 6) + 0.0 AS log10_x,
               round(exp(l_quantity / 50), 6) AS exp_q,
               CAST(sign(l_extendedprice - 30000) AS INTEGER) AS sign_v,
               l_partkey % 97 AS mod_97,
               round(power(l_quantity, 2), 6) AS q_sq,
               greatest(l_quantity, l_discount * 100) AS gr,
               least(l_quantity, l_tax * 100) AS ls
        FROM lineitem
        WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber
    """,
    "stats_agg": """
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 6) AS sd_price,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
               round(covar_samp(l_discount, l_tax), 6) + 0.0 AS cov_disc_tax
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "argminmax_agg": """
        SELECT o_orderpriority,
               arg_min(o_orderstatus, o_orderkey) AS first_status,
               arg_max(o_orderstatus, o_orderkey) AS last_status,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               bool_or(o_orderstatus = 'F') AS any_finished,
               bit_and(o_custkey) AS key_band,
               bit_or(o_custkey) AS key_bor,
               bit_xor(o_custkey) AS key_bxor
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "regr_agg": """
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 6) + 0.0
                   AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 6) + 0.0
                   AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
               round(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "percentile_agg": """
        SELECT l_linestatus,
               quantile_cont(l_extendedprice, 0.5) AS p50_price,
               quantile_cont(l_extendedprice, 0.9) AS p90_price
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "window_topk": """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
              FROM orders) t
        WHERE rn <= 3
        ORDER BY o_orderpriority, rn
    """,
    "window_running": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
               lag(o_totalprice) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev_price
        FROM orders
        WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderkey
    """,
    "window_frame": """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rolling_price
        FROM lineitem
        WHERE l_suppkey < 5
        ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    "rollup_agg": """
        SELECT coalesce(l_returnflag, '(all)') AS returnflag,
               coalesce(l_linestatus, '(all)') AS linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
    """,
    "cube_agg": """
        SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
               coalesce(o_orderpriority, '(all)') AS orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY orderstatus, orderpriority
    """,
    "grouping_sets_agg": """
        SELECT coalesce(n_name, '(all)') AS nation,
               coalesce(r_name, '(all)') AS region,
               count(*) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_bal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((n_name), (r_name), ())
        ORDER BY nation, region
    """,
    "set_ops": """
        SELECT 'both' AS src, nationkey
        FROM (SELECT c_nationkey AS nationkey FROM customer
              INTERSECT
              SELECT s_nationkey FROM supplier) t1
        UNION ALL
        SELECT 'cust_only' AS src, nationkey
        FROM (SELECT c_nationkey AS nationkey FROM customer
              EXCEPT
              SELECT s_nationkey FROM supplier) t2
        ORDER BY src, nationkey
    """,
    "pivot_counts": """
        SELECT l_returnflag,
               count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
               count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "unnest_embeddings": """
        SELECT vec_id, CAST(idx - 1 AS INTEGER) AS pos, val
        FROM (SELECT vec_id,
                     unnest(embedding) AS val,
                     unnest(range(1, len(embedding) + 1)) AS idx
              FROM embeddings
              WHERE vec_id < 20) t
        WHERE idx <= 8
        ORDER BY vec_id, pos
    """,
    "values_join": """
        SELECT o_orderpriority, w, count(*) AS cnt
        FROM orders
        JOIN (VALUES ('1-URGENT', 1), ('2-HIGH', 2), ('3-MEDIUM', 3),
                     ('4-NOT SPECIFIED', 4), ('5-LOW', 5)) AS t(o_p, w)
          ON o_orderpriority = o_p
        GROUP BY o_orderpriority, w
        ORDER BY w
    """,
}
