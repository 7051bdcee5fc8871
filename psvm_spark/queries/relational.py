"""Scans, projection, filtering, conditionals, sort/limit, set ops.

SURVEY.md section 2.2: B1 (scan), B6 (project), B7 (filter predicates),
B8 (case when), B27 (multi-key sort), B28 (top-k), B30 (set ops), plus
the flagship B17 ``agg_pricing_summary`` (TPC-H Q1 shape).

Scale notes (100 TB): every query here is a single scan -> narrow ops
(+ one shuffle for the aggregate/sort).  Filters and projections are
plain Catalyst expressions, so they reach the parquet reader as
PushedFilters/ReadSchema — verified via .explain in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psvm_spark.catalog import load_table
from psvm_spark.queries._util import (
    davg,
    dmoney,
    drate,
    dsum,
    one,
    sql_davg,
    sql_dsum,
    sql_money,
    sql_rate,
)
from psvm_spark.registry import query

# --------------------------------------------------------------------------
# B17 flagship — TPC-H Q1 pricing summary.
# Reference parity: the closest psvm analogue is its evaluation/reduction
# phase (SURVEY.md A9/A15: distributed sums via AllReduce) — here a single
# partial+final hash aggregate, 4 groups, map-side combined.


@query(
    "agg_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
       AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)       AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    charge = disc_price * (one() + drate("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dmoney("l_quantity")).alias("sum_qty"),
            dsum(dmoney("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(dmoney("l_quantity")).alias("avg_qty"),
            davg(dmoney("l_extendedprice")).alias("avg_price"),
            davg(drate("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# B1 — raw parquet scan (column-pruned: ReadSchema should show 4 columns).


@query(
    "scan_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
""",
)
def scan_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


# --------------------------------------------------------------------------
# B6 — projection with computed columns + aliases.  Per-row double math is
# deterministic (correctly-rounded IEEE ops on identical inputs), so no
# decimal detour is needed here.


@query(
    "project_compute",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS revenue,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
  l_quantity * 0.5 AS half_qty,
  concat(l_returnflag, '/', l_linestatus) AS flag_status
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * F.lit(0.5)).alias("half_qty"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


# --------------------------------------------------------------------------
# B7 — predicate zoo: comparison, boolean combos, IN, BETWEEN, LIKE,
# null-safe equality.  All of these push down to the parquet scan.


@query(
    "filter_predicates",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 1000 AND 200000
  AND o_orderstatus IN ('F', 'O')
  AND o_orderpriority LIKE '%URGENT%'
  AND NOT (o_custkey IS NULL)
  AND (o_totalprice > 150000 OR o_custkey % 2 = 0)
""",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_totalprice") > 150000) | (F.col("o_custkey") % 2 == 0))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# B8 — CASE WHEN / conditional expressions.


@query(
    "case_when",
    oracle="""
SELECT
  CASE WHEN o_totalprice < 50000 THEN 'small'
       WHEN o_totalprice < 200000 THEN 'medium'
       ELSE 'large' END AS bucket,
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1, 2
""",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dmoney("o_totalprice")).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# B27 — global multi-key sort.  Sort order itself is invisible to the
# order-insensitive hash, so the observable part is the row set; the
# ordering is separately asserted in tests/test_relational.py.  At scale
# this is a range-partitioned sort (sampled bounds), no single-node sort.


@query(
    "sort_multi",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
FROM customer
ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment").orderBy(
        F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )


# --------------------------------------------------------------------------
# B28 — top-k: Catalyst turns orderBy+limit into TakeOrderedAndProject
# (per-partition heap + driver merge — no global sort shuffle).
# o_orderkey tie-break keeps the row *set* deterministic.


@query(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------------
# B30 — set operations: UNION ALL / INTERSECT / EXCEPT exercised in one
# query over nation keys seen in customers vs suppliers.


@query(
    "setops",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'both' AS side, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
UNION ALL
SELECT 'customer_only' AS side, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
UNION ALL
SELECT 'supplier_only' AS side, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
""",
)
def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("side"), "nk")
    c_only = c.exceptAll(s).select(F.lit("customer_only").alias("side"), "nk")
    s_only = s.exceptAll(c).select(F.lit("supplier_only").alias("side"), "nk")
    return both.unionByName(c_only).unionByName(s_only)


# --------------------------------------------------------------------------
# TPC-H Q3 shape: three-way join (customer x orders x lineitem) with
# selective filters on both ends, grouped revenue, top-N.  This is the
# query Catalyst's join reordering + AQE exist for: both filters reach
# their scans, the customer side broadcasts, and the top-N compiles to
# TakeOrderedAndProject (no global sort).


@query(
    "join_three_way_topn",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
)
def join_three_way_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Correlated subqueries: EXISTS / NOT EXISTS + a scalar subquery, via
# SQL so Catalyst's decorrelation rewrites them (EXISTS -> semi join,
# scalar -> aggregate + join) — no per-row re-execution anywhere.


@query(
    "subquery_exists_scalar",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(*) FILTER (WHERE EXISTS (
         SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
       )) AS n_big_spenders
FROM customer
GROUP BY c_mktsegment
""",
)
def subquery_exists_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(*) FILTER (WHERE big) AS n_big_spenders
FROM (
  SELECT c_mktsegment,
         EXISTS (SELECT 1 FROM sq_orders WHERE o_custkey = c_custkey
                 AND o_totalprice > (SELECT AVG(o_totalprice) FROM sq_orders)) AS big
  FROM sq_customer
)
GROUP BY c_mktsegment
"""
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: six-table join (region -> nation -> customer/supplier
# -> orders -> lineitem) with the classic "local supplier" equality
# (c_nationkey = s_nationkey), region filter, date range, grouped
# revenue.  The three dims (region/nation + filtered customer) stay
# under the broadcast threshold at any scale factor, so Catalyst plans
# broadcast joins for them and the only shuffles are the two fact-side
# equi-joins — at 100 TB this is the canonical star-join plan the
# optimizer's join reordering exists for.


@query(
    "join_q5_shape",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM region
  JOIN nation   ON n_regionkey = r_regionkey
  JOIN supplier ON s_nationkey = n_nationkey
  JOIN lineitem ON l_suppkey = s_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def join_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Pivot: long -> wide conditional aggregation.  With an explicit value
# list there is no value-discovery job; Spark plans two aggregation
# stages (pre-aggregate on (group, pivot) pairs, then pivot on group) —
# both shuffles move only pre-aggregated cells, cardinality
# |groups| x |pivot values|, so data volume is trivial at any scale.
# The oracle is the equivalent CASE WHEN form.


@query(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_F,
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_O
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(qty).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("F_qty").alias("qty_F"),
            F.col("O_qty").alias("qty_O"),
            F.col("F_n").alias("n_F"),
            F.col("O_n").alias("n_O"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional trade volume between two nations by
# ship year.  The distinguishing pattern vs Q5 is one dimension table
# (nation) joined in TWO roles (supplier side, customer side), each
# pre-filtered to the two nations of interest so the per-role filter
# pushes into its broadcast build side; the asymmetric pair condition
# (N1,N2)|(N2,N1) then prunes same-nation rows after both roles
# resolve.  Only the two fact-side equi-joins shuffle — identical plan
# economics at 100 TB.


@query(
    "join_q7_shape",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
  FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def join_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_18", "NATION_19")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.sum(vol).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
