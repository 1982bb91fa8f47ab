"""Remaining TPC-H query *shapes* adapted to the driver corpus.

The reference itself has exactly one join (``processor/main.py:169-182``)
and no subqueries; the driver corpus expects the engine to exercise the
standard relational repertoire (SURVEY.md §2.3 note). The corpus has no
``partsupp`` table and no phone/shipmode/commit-date columns, so queries
that need them (TPC-H q2/q9/q11/q13/q16/q20/q21/q22/q8) are rebuilt as
faithful *shape* variants on the available columns: the join graph,
subquery nesting, and aggregation structure are preserved; only the
filter columns differ.

Scale posture per query is inline; the common rules:
- dimension tables (region/nation/supplier/part) broadcast — no shuffle;
- fact-side predicates sit on the parquet scan (pushdown);
- correlated subqueries become window functions or aggregate-rejoin,
  never per-row re-scans;
- EXISTS/NOT EXISTS become one per-key aggregate + a single equi-join,
  not left-semi probes per predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_ztbus_python_processor_spark.functions.stats import f32, guarded_div
from orca_ztbus_python_processor_spark.sources.parquet import read_table
from orca_ztbus_python_processor_spark.workloads.base import Catalog

CATALOG = Catalog()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q2 shape: correlated-min subquery. For every small part, the supplier(s)
# offering the minimum observed unit price. The correlated
# "= (SELECT min(...) WHERE inner.part = outer.part)" decorrelates into a
# window-min over the per-(part,supplier) aggregate — one shuffle on
# l_partkey instead of a per-row rescan. part/supplier broadcast.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name,
           CAST(ps.unit_price AS REAL) AS unit_price
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE p.p_size <= 10
      AND ps.unit_price = (
          SELECT min(ps2.unit_price) FROM ps ps2
          WHERE ps2.l_partkey = ps.l_partkey
      )
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    supp = _t(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    # Window-min shares the groupBy shuffle's partitioning on l_partkey
    # (same key) so AQE reuses the exchange; equality against the min of
    # the same double set is exact, then f32-cast for the oracle hash.
    w = W.partitionBy("l_partkey")
    best = ps.withColumn("min_price", F.min("unit_price").over(w)).where(
        F.col("unit_price") == F.col("min_price")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", f32(F.col("unit_price")).alias("unit_price"))
    )


# --------------------------------------------------------------------------
# q8 shape: national market share. Volume share of supplier-nation
# NATION_7 within orders from ASIA customers, by order year. Two nation
# aliases (customer side, supplier side) — region/nation/supplier/customer
# all broadcast (customer is the largest dim but still dwarfed by
# lineitem; at 100 TB customer would shuffle-join instead — flagged).
# Share = conditional-sum / sum in one agg pass.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                         THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                / sum(l.l_extendedprice * (1 - l.l_discount)) AS REAL) AS mkt_share
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
    JOIN region r    ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY year(o.o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    # customer restricted to ASIA before the join: filter composes with
    # the broadcast so the probe side only tests region-matching keys.
    asia_cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(asia_cust), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            f32(
                guarded_div(
                    F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))),
                    F.sum(vol),
                )
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# q9 shape: profit by supplier nation and year for a part-name family.
# part filter prunes the probe side before the fact shuffle; the only
# shuffle is lineitem->orders (both large), then a tiny groupBy.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q9_nation_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS REAL) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    orders = _t(spark, sf_dir, "orders")
    supp_nation = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(f32(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("profit"))
    )


# --------------------------------------------------------------------------
# q11 shape: group-HAVING against a scalar subquery over the same
# aggregate. Per-brand revenue kept only if above 4% of total revenue.
# The scalar total is a second tiny agg over the 25-row brand rollup —
# cross-joined (1 row, broadcast by construction), not a rescan of fact.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q11_brand_value_share",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand, sum(l.l_extendedprice * (1 - l.l_discount)) AS val
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, CAST(val AS REAL) AS val
    FROM rev
    WHERE val > (SELECT 0.04 * sum(val) FROM rev)
    """,
)
def q11_brand_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"))
    )
    total = rev.agg((F.lit(0.04) * F.sum("val")).alias("threshold"))
    return (
        rev.join(F.broadcast(total))
        .where(F.col("val") > F.col("threshold"))
        .select("p_brand", f32(F.col("val")).alias("val"))
    )


# --------------------------------------------------------------------------
# q13 shape: customer order-count distribution. LEFT OUTER join with an
# extra join-side predicate (priority filter lives in the ON clause, so
# customers with only urgent orders still appear with count 0), then a
# second aggregation over the first — the classic double-groupBy. First
# shuffle on c_custkey, second on c_count (tiny).
# --------------------------------------------------------------------------
@CATALOG.query(
    "q13_custdist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# q16 shape: distinct-supplier counts per part attribute triple, with a
# NOT IN supplier exclusion. NOT IN over a null-free key column becomes a
# left-anti broadcast join; countDistinct is partial-aggregatable
# (two-phase) so the fact shuffle carries (brand,type,size,suppkey) pairs.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q20 shape: nested IN subqueries -> semi-join. Suppliers who shipped
# more than 12% of the total quantity of some 'small%' part
# (threshold sized so the predicate selects real rows at sf0.01 — the
# p99 per-part max supplier share there is ~0.15). Correlated
# "> 0.3 * (SELECT sum ... per part)" decorrelates into a window-sum over
# the (part,supplier) rollup; the outer IN becomes dropDuplicates + an
# equi-join against broadcast supplier.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q20_heavy_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'small%'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT sp.l_suppkey FROM sp
        WHERE sp.q > 0.12 * (
            SELECT sum(sp2.q) FROM sp sp2 WHERE sp2.l_partkey = sp.l_partkey
        )
    )
    """,
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supp = _t(spark, sf_dir, "supplier")
    sp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    w = W.partitionBy("l_partkey")
    heavy = (
        sp.withColumn("part_total", F.sum("q").over(w))
        .where(F.col("q") > 0.12 * F.col("part_total"))
        .select("l_suppkey")
        .dropDuplicates()
    )
    return supp.join(heavy, supp.s_suppkey == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )


# --------------------------------------------------------------------------
# q21 shape: EXISTS + NOT EXISTS double correlation. For finished ('F')
# multi-supplier orders, suppliers whose lines were the ONLY returned
# ('R') lines. Both correlated predicates collapse into ONE per-order
# aggregate (distinct suppliers, distinct returned suppliers) joined back
# to the returned lines — one extra shuffle on l_orderkey total, versus
# two semi/anti probes in the literal plan.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q21_sole_returner",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    """,
)
def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias(
            "n_ret_supp"
        ),
    )
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    # EXISTS other-supplier       <=> n_supp > 1
    # NOT EXISTS other returned   <=> n_ret_supp == 1 (l1's own supplier is
    # returned by construction, so it is the lone member of the set)
    return (
        returned.join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)),
            "l_orderkey",
        )
        .join(orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# q22 shape: scalar subquery threshold + NOT EXISTS anti-join. Customers
# with above-average (positive) balance and no URGENT orders, rolled up
# by nation (every customer in the corpus has at least one order, so the
# anti side carries the priority filter — same shape, non-vacuous rows). The scalar avg broadcasts as a 1-row frame; NOT EXISTS is a
# left-anti against the distinct order custkeys (shuffle on c_custkey —
# at 100 TB both sides pre-bucket on custkey and the anti-join is
# shuffle-free).
# --------------------------------------------------------------------------
@CATALOG.query(
    "q22_idle_balances",
    oracle="""
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(sum(c.c_acctbal) AS REAL) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
    )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), f32(F.sum("c_acctbal")).alias("totacctbal"))
    )


# --------------------------------------------------------------------------
# q12_ship_mode_priority — the TPC-H Q12 shape (shipping-lag priority
# audit) adapted to this corpus's columns: lineitems whose ship lag
# falls in the 30-90 day band, grouped by linestatus (the shipmode
# analog), with the two-way CASE split counting critical
# (URGENT/HIGH) vs other order priorities — Q12's signature
# conditional-aggregation-after-join form. Plan: orders joins on
# orderkey (the natural co-partition key), the lag band is a
# post-join filter on date arithmetic, and both CASE sums
# partial-aggregate before the 2-row exchange.
# --------------------------------------------------------------------------
@CATALOG.query(
    "q12_ship_mode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
)
def q12_ship_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(critical.cast("long")).alias("high_line_count"),
            F.sum((~critical).cast("long")).alias("low_line_count"),
        )
    )
