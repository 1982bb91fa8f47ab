"""Subquery, analytic-window, and scalar-function coverage beyond the
relational spine: EXISTS / IN / scalar / correlated subqueries, HAVING,
multi-way join top-k, CASE-conditional aggregation, ranking and frame
window functions, regression statistics, and the date/string function
surface.

The reference delegates all relational execution to Postgres
(SURVEY.md §2.3 note: the driver corpus expects the engine to exercise
standard join/subquery shapes beyond the repo's single equi-join,
``processor/main.py:169-182``). Everything here is declarative
DataFrame API — Catalyst handles decorrelation, semi-join planning,
and predicate pushdown; per-query scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_ztbus_python_processor_spark.functions.stats import f32
from orca_ztbus_python_processor_spark.sources.parquet import read_table
from orca_ztbus_python_processor_spark.workloads.base import Catalog

CATALOG = Catalog()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q6_forecast_revenue — the pure filter+agg shape (TPC-H Q6): every
# predicate reaches the parquet scan (range + between + less-than), the
# aggregate is a single partial-agg-friendly SUM. At 100 TB this is the
# canonical "scan-bound" query: no shuffle beyond the 1-row final agg.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(l_extendedprice * l_discount) AS REAL) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(f32(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


# --------------------------------------------------------------------------
# exists_urgent_returns — EXISTS decorrelation (TPC-H Q4 shape): orders
# in a quarter having >=1 returned lineitem. Spark plans the EXISTS as a
# LEFT SEMI join; the date filter prunes the probe side at the scan.
# Scale: semi join shuffles only (orderkey) pairs, never widens rows.
# --------------------------------------------------------------------------
@CATALOG.query(
    "exists_urgent_returns",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def exists_urgent_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    returned = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# in_subquery_region_customers — IN (subquery) over a dim chain:
# customers whose nation sits in ASIA. The nation-region join output is
# a handful of keys -> broadcast LEFT SEMI; zero shuffle of the fact.
# --------------------------------------------------------------------------
@CATALOG.query(
    "in_subquery_region_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    GROUP BY c_mktsegment
    """,
)
def in_subquery_region_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    return (
        cust.join(
            F.broadcast(asia_nations),
            cust.c_nationkey == asia_nations.n_nationkey,
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# above_avg_orders — scalar subquery kept distributed: the global AVG is
# a 1-row DataFrame broadcast-cross-joined into the filter (never a
# driver-side collect), so the same plan runs unchanged on a cluster.
# --------------------------------------------------------------------------
@CATALOG.query(
    "above_avg_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(avg(o_totalprice) AS REAL) AS avg_price
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    mean_price = orders.agg(F.avg("o_totalprice").alias("_mean"))
    return (
        orders.crossJoin(F.broadcast(mean_price))
        .where(F.col("o_totalprice") > F.col("_mean"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            f32(F.avg("o_totalprice")).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# q17_small_quantity_revenue — correlated scalar subquery (TPC-H Q17):
# lineitems below 20% of their part's average quantity. Decorrelated
# form: per-part averages are a tiny aggregate (|parts-of-brand| rows)
# broadcast back onto the fact — one fact shuffle total, vs the window-
# function form's shuffle+sort of every row.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(l_extendedprice) / 7.0 AS REAL) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    brand_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li_brand = li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
    limits = li_brand.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("_qty_limit")
    )
    return (
        li_brand.drop("p_partkey")
        .join(F.broadcast(limits), "l_partkey")
        .where(F.col("l_quantity") < F.col("_qty_limit"))
        .agg(f32(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q18_large_orders — HAVING + IN(grouped subquery) (TPC-H Q18): orders
# whose total quantity exceeds 200. The HAVING aggregate and the outer
# re-aggregation share the l_orderkey partitioning; the qualifying-key
# set is small -> broadcast semi join instead of a second fact shuffle.
# Deterministic LIMIT: ordered by (totalprice desc, orderkey).
# --------------------------------------------------------------------------
@CATALOG.query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS REAL) AS o_totalprice,
           CAST(sum(l_quantity) AS REAL) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "_k")), li.l_orderkey == F.col("_k"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(f32(F.sum("l_quantity")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .withColumn("o_totalprice", f32(F.col("o_totalprice")))
    )


# --------------------------------------------------------------------------
# q10_returned_items — 4-way join + top-k (TPC-H Q10): revenue lost to
# returns per customer over a quarter. orders is filtered BEFORE the
# join (pushdown), customer/nation broadcast; the only fact shuffle is
# the final per-customer aggregation. TakeOrderedAndProject caps the
# sort at k per partition.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", f32(F.col("_rev")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# promo_revenue_share — conditional-aggregation ratio (TPC-H Q14 shape):
# share of one part type's discounted revenue in a month. CASE folds the
# two sums into one pass; part joins broadcast.
# --------------------------------------------------------------------------
@CATALOG.query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(
      100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      / sum(l_extendedprice * (1 - l_discount)) AS REAL) AS economy_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    economy = F.when(F.col("p_type") == "ECONOMY", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(f32(100.0 * F.sum(economy) / F.sum(disc)).alias("economy_share"))
    )


# --------------------------------------------------------------------------
# priority_counts_by_flag — CASE-bucketed counts over a join (TPC-H Q12
# shape): high- vs low-priority lineitems per return flag.
# --------------------------------------------------------------------------
@CATALOG.query(
    "priority_counts_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def priority_counts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# rank_suite_customers — the ranking-function family over one window:
# dense_rank / percent_rank / cume_dist / ntile(4), top-50 per segment.
# Ties broken by c_custkey so every rank is deterministic.
# Scale: single shuffle on the partition key; rank filter applies
# before any row widens.
# --------------------------------------------------------------------------
@CATALOG.query(
    "rank_suite_customers",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(c_acctbal AS REAL) AS c_acctbal,
           CAST(dense_rank()   OVER w AS BIGINT) AS rnk,
           CAST(percent_rank() OVER w AS REAL)   AS pct_rnk,
           CAST(cume_dist()    OVER w AS REAL)   AS cum_dist,
           CAST(ntile(4)       OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY row_number() OVER w <= 50
    """,
)
def rank_suite_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            f32(F.col("c_acctbal")).alias("c_acctbal"),
            F.dense_rank().over(w).cast("long").alias("rnk"),
            f32(F.percent_rank().over(w)).alias("pct_rnk"),
            f32(F.cume_dist().over(w)).alias("cum_dist"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") <= 50)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# rolling_frames_events — explicit frame specifications: bounded ROWS
# frame (6 PRECEDING), running unbounded frame, first_value within the
# bounded frame, and lead. One shuffle+sort on (user_id, ts) serves all
# four — Catalyst collapses same-window functions into one WindowExec.
# --------------------------------------------------------------------------
@CATALOG.query(
    "rolling_frames_events",
    oracle="""
    SELECT event_id,
           CAST(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS REAL) AS roll_avg,
           CAST(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS REAL) AS run_sum,
           CAST(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS REAL) AS frame_first,
           CAST(lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS REAL) AS next_val
    FROM events
    """,
)
def rolling_frames_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    bounded = (
        W.partitionBy("user_id").orderBy(*order).rowsBetween(-6, W.currentRow)
    )
    running = (
        W.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    plain = W.partitionBy("user_id").orderBy(*order)
    return ev.select(
        "event_id",
        f32(F.avg("value").over(bounded)).alias("roll_avg"),
        f32(F.sum("value").over(running)).alias("run_sum"),
        f32(F.first("value").over(bounded)).alias("frame_first"),
        f32(F.lead("value", 1).over(plain)).alias("next_val"),
    )


# --------------------------------------------------------------------------
# regression_stats_by_flag — bivariate statistics family: corr, sample/
# population covariance, regression slope/intercept per group. All are
# partial-aggregatable (sum/sum-of-products moments), so the plan is one
# map-side partial + tiny shuffle even at full scale.
# --------------------------------------------------------------------------
@CATALOG.query(
    "regression_stats_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(corr(l_extendedprice, l_quantity)       AS REAL) AS price_qty_corr,
           CAST(covar_samp(l_extendedprice, l_quantity) AS REAL) AS price_qty_covar,
           CAST(covar_pop(l_extendedprice, l_quantity)  AS REAL) AS price_qty_covar_pop,
           CAST(regr_slope(l_extendedprice, l_quantity) AS REAL) AS price_per_qty,
           CAST(regr_intercept(l_extendedprice, l_quantity) AS REAL) AS base_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def regression_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        f32(F.corr(y, x)).alias("price_qty_corr"),
        f32(F.covar_samp(y, x)).alias("price_qty_covar"),
        f32(F.covar_pop(y, x)).alias("price_qty_covar_pop"),
        f32(F.regr_slope(y, x)).alias("price_per_qty"),
        f32(F.regr_intercept(y, x)).alias("base_price"),
    )


# --------------------------------------------------------------------------
# date_string_profile — the scalar function surface (SURVEY.md §2.9
# notes the driver corpus adds string/date functions the reference
# lacks): date-part extraction, truncation, and the core string library
# in one projection — all whole-stage-codegen expressions, no shuffle.
# --------------------------------------------------------------------------
@CATALOG.query(
    "date_string_profile",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate)   AS BIGINT) AS dom,
           date_trunc('month', o_orderdate)   AS month_start,
           upper(o_orderpriority)             AS pri_upper,
           substring(o_orderpriority, 1, 1)   AS pri_code,
           CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
           replace(o_orderpriority, '-', '_') AS pri_snake,
           concat(o_orderstatus, ':', o_orderpriority) AS status_pri,
           CAST(instr(o_orderpriority, '-') AS BIGINT) AS dash_pos,
           regexp_extract(o_orderpriority, '([0-9])', 1) AS pri_digit,
           lpad(CAST(o_orderkey AS VARCHAR), 10, '0')    AS padded_key
    FROM orders
    """,
)
def date_string_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pri = F.col("o_orderpriority")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.upper(pri).alias("pri_upper"),
        F.substring(pri, 1, 1).alias("pri_code"),
        F.length(pri).cast("long").alias("pri_len"),
        F.replace(pri, F.lit("-"), F.lit("_")).alias("pri_snake"),
        F.concat(F.col("o_orderstatus"), F.lit(":"), pri).alias("status_pri"),
        F.instr(pri, "-").cast("long").alias("dash_pos"),
        F.regexp_extract(pri, "([0-9])", 1).alias("pri_digit"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("padded_key"),
    )


# --------------------------------------------------------------------------
# q7_nation_trade_flows — 6-way join (TPC-H Q7 shape): revenue between
# (supplier nation, customer nation) pairs by ship year. The fact
# shuffles once per non-broadcast join side; customer/supplier/nation
# all broadcast, so the whole plan is broadcast-chained off the
# lineitem scan plus one final aggregation shuffle.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q7_nation_trade_flows",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND sn.n_nationkey <> cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            f32(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# approx_value_quantiles — the corpus-grain quantile SCALE PATH
# (SURVEY.md §7 risks): exact percentile needs every group value on one
# reducer, approx_percentile is a mergeable t-digest-style sketch that
# partial-aggregates map-side. Rows-only for the driver (sketch values
# are engine-specific); the accuracy bound vs the exact form is pinned
# in tests/test_operator_edges.py.
# --------------------------------------------------------------------------
@CATALOG.query("approx_value_quantiles")
def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        f32(F.approx_percentile("value", 0.5, 10000)).alias("p50_approx"),
        f32(F.approx_percentile("value", 0.95, 10000)).alias("p95_approx"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# q19_disjunctive_revenue — OR-of-ANDs predicate join (TPC-H Q19
# shape): three brand/size/quantity bands OR'd together. Catalyst
# extracts the common p_partkey = l_partkey conjunct so the join stays
# a hash join (never nested-loop) with the disjunction evaluated as a
# post-join filter; part broadcasts.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")

    def band(brand: str, size_lo: int, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & (q >= q_lo)
            & (q <= q_hi)
        )

    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(
            band("Brand#1", 1, 10, 1, 20)
            | band("Brand#2", 5, 20, 10, 30)
            | band("Brand#3", 10, 30, 20, 40)
        )
        .agg(
            f32(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# q15_top_supplier — aggregate-then-match-the-max (TPC-H Q15): supplier
# revenue over a quarter, return the supplier(s) hitting the maximum.
# The max is a 1-row aggregate of the (already tiny) revenue table,
# broadcast back as an equality filter — the classic "HAVING x = MAX"
# rewrite without a second fact scan.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS REAL) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("_top"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("_top"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", f32(F.col("total_revenue")).alias("total_revenue")
        )
    )
