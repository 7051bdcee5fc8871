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


# --------------------------------------------------------------------------
# TPC-H Q13 shape: order-count distribution per customer.  The defining
# pattern is a LEFT OUTER join whose extra predicate lives in the join
# condition (it must not eliminate order-less customers, so it cannot be
# a WHERE), followed by two cascaded aggregations.  Spark pushes the
# right-side-only predicate into the orders scan; the first aggregate
# reuses the join's hash partitioning on the customer key, so the
# distribution rollup is the only extra (tiny: |distinct counts| rows)
# shuffle at 100 TB.


@query(
    "join_q13_shape",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
""",
)
def join_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by revenue in a quarter.  An
# aggregate joined against its own global max — the "argmax via
# self-referencing scalar" pattern.  The max is one row, broadcast; the
# equality compare on double is parity-safe because both sides derive
# the value from the same exact decimal sum (queries/_util.py).  At
# 100 TB the revenue agg is one shuffle on l_suppkey; the max is a
# driver-free treeAggregate-style global agg of |suppliers| rows.


@query(
    "join_q15_shape",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def join_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(dmoney("l_extendedprice") * (one() - drate("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape: revenue impact of small-quantity orders, i.e. a
# correlated scalar aggregate subquery (per-part average quantity)
# consumed as a row filter.  Spark-first plan: pre-filter parts to the
# brand (broadcastable), semi-reduce lineitem through that broadcast,
# compute the per-part threshold ONCE on the reduced set, and broadcast
# it back — the fact table is read through the broadcast filter on both
# legs, and the only shuffle is the map-side-combined per-part rollup
# (≤ |brand parts| rows per task), never raw fact rows.  The threshold
# is exact (decimal sum / count, then * 0.5 — both
# IEEE-deterministic), so the `<` compare is parity-safe.


@query(
    "subquery_q17_shape",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def subquery_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    li_brand = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li_brand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.5)
            * (F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1)))
        ).alias("thr")
    )
    return (
        li_brand.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            (F.sum(dmoney("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders.  HAVING on a fact-key aggregate,
# then the surviving (rare) keys join back to orders/customer.  At
# 100 TB the qty rollup is one shuffle on l_orderkey with map-side
# combine; the HAVING survivor set is tiny, so AQE converts the
# orders/customer joins to broadcasts at runtime — we don't force the
# hint because the survivor cardinality is data-dependent.


@query(
    "agg_q18_shape",
    oracle="""
SELECT c_name, o_orderkey, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250.0
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def agg_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunct groups spanning both join
# sides.  Catalyst's CNF conversion extracts the per-side residuals —
# the part-only disjuncts (brand/size) push into the part scan and the
# lineitem-only quantity bounds into the lineitem scan — while the mixed
# residual evaluates post-join.  Tests assert an Or reaches
# PushedFilters.  At 100 TB this is the difference between scanning 2%
# and 100% of a fact table.


@query(
    "scan_q19_shape",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def scan_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        dsum(dmoney("l_extendedprice") * (one() - drate("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape (adapted: fixtures carry no receipt/commit dates, so
# "kept waiting" becomes "sole returner"): for finished orders, count
# per supplier the returned ('R') line items on multi-supplier orders
# where NO other supplier also returned.  The classic plan is a
# semi-join AND an anti-join against the same fact table (three
# fact-sized shuffle legs — measured 12.7x at the 20x amplification,
# SCALE.md section 9).  Rewritten as ONE pass over lineitem: per
# (orderkey, suppkey) record R-row count, then per orderkey count
# distinct suppliers and distinct R-flag suppliers.  For an R-flag row,
# EXISTS(other supplier)      <=> n_supp   >= 2
# NOT EXISTS(other R supplier) <=> n_r_supp == 1  (its own supplier is
# the only R supplier), and the qualifying rows per order are exactly
# that supplier's R rows — so numwait = SUM(n_r_rows), no join back to
# the fact.  At 100 TB: lineitem shuffles ONCE (map-side combined to
# near-distinct (orderkey, suppkey) pairs, 24 B each); everything
# downstream is pair-sized.  Orders joins the tiny candidate set;
# supplier is broadcast.


@query(
    "join_q21_shape",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders     ON o_orderkey = l1.l_orderkey
WHERE l1.l_returnflag = 'R'
  AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
)
def join_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    is_r = (F.col("l_returnflag") == "R").cast("long")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(is_r).alias("n_r_rows")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_r_rows") > 0).cast("long")).alias("n_r_supp"),
    )
    cand = (
        per_supp.filter(F.col("n_r_rows") > 0)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    return (
        cand.join(o, cand.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_r_rows").alias("numwait"))
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape (adapted: every fixture customer has orders, so the
# anti-join target is "no URGENT order" rather than "no order"):
# wealthy-but-inactive accounts per nation.  Combines an uncorrelated
# scalar subquery (global positive-balance average, broadcast as a
# one-row frame — no driver collect) with a NOT EXISTS anti join.  The
# average is exact decimal-sum/count, so the `>` threshold compare is
# parity-safe.  At 100 TB: one broadcast (scalar), one anti-join shuffle
# on the customer key, nation broadcast.


@query(
    "join_q22_shape",
    oracle="""
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY n_name
""",
)
def join_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o_urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avgbal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dmoney("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avgbal")
        )
    )
    return (
        c.join(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("avgbal"))
        .join(o_urgent, c.c_custkey == o_urgent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dmoney("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape (adapted: fixtures have no partsupp, so "important
# stock" becomes "parts with outsized revenue share"): a per-key
# aggregate filtered by a scalar subquery over the SAME aggregate — the
# total is consumed as `1.2 * average share`, which is scale-invariant
# (a fixed absolute fraction would go degenerate as SF grows).  Spark
# computes the per-part rollup once; Catalyst reuses it for the scalar
# via a separate tiny agg leg, both broadcast-joined back.


@query(
    "agg_q11_shape",
    oracle="""
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS part_rev
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, part_rev
FROM pr
WHERE part_rev > 1.2 * (SELECT CAST(SUM(CAST(part_rev AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM pr)
""",
)
def agg_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        dsum(dmoney("l_extendedprice") * (one() - drate("l_discount"))).alias("part_rev")
    )
    mean = pr.agg(
        (F.sum(F.col("part_rev").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_rev"
        )
    )
    return (
        pr.join(F.broadcast(mean))
        .filter(F.col("part_rev") > F.lit(1.2) * F.col("mean_rev"))
        .select("l_partkey", "part_rev")
    )


# --------------------------------------------------------------------------
# TPC-H Q16 shape: supplier-count-per-part-attribute with a NOT IN
# blacklist subquery.  COUNT(DISTINCT) after a join plus a null-aware
# anti join against a filtered dimension.  The distinct agg expands to
# Spark's two-phase plan (partial distinct on (group, suppkey), then
# final count) — both phases map-side combine, so the shuffle carries
# pre-deduplicated pairs at 100 TB.


@query(
    "agg_q16_shape",
    oracle="""
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size IN (1, 4, 9, 16, 25, 36)
  AND p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
""",
)
def agg_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(1, 4, 9, 16, 25, 36) & (F.col("p_brand") != "Brand#13"))
        .select("p_partkey", "p_brand", "p_type")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority checking — EXISTS decorrelates to a
# LEFT SEMI join on the fact table.  The semi join shuffles only the
# (orderkey) pairs that survive the date filter; no lineitem row is
# ever materialized into the output, which is the point of semi-join
# pushup at 100 TB.


@query(
    "join_q4_shape",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def join_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# TPC-H Q6 shape: forecasting revenue — the pure pushdown query: range
# + band + threshold predicates all reach the parquet scan, one
# map-side-combined global aggregate, zero joins.  The canonical
# "is the scan doing the work" probe.


@query(
    "scan_q6_shape",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def scan_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dmoney("l_extendedprice") * drate("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape: national market share — nation in two roles again
# (customer region gates the market, supplier nation is the share
# numerator), share = decimal-exact national volume / total volume per
# order year.  CASE-gated decimal sums keep both engines bit-identical
# before the one double division.


@query(
    "join_q8_shape",
    oracle="""
WITH t AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n1.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DOUBLE)
            / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM t
GROUP BY o_year
""",
)
def join_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    t = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    return t.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))).cast("double")
            / F.sum("vol").cast("double")
        )
        .cast("double")
        .alias("mkt_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year.  The fixture
# has no partsupp, so supply cost is proxied by p_retailprice (the same
# join tree and arithmetic shape: revenue minus quantity x unit cost,
# both as exact decimal sums surfaced as doubles).


@query(
    "join_q9_shape",
    oracle="""
WITH t AS (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev,
         CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) AS cost
  FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
  WHERE p_size % 5 = 0
)
SELECT nation, o_year,
       CAST(SUM(rev) AS DOUBLE) - CAST(SUM(cost) AS DOUBLE) AS profit_proxy,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM t
GROUP BY nation, o_year
""",
)
def join_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") % 5 == 0)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    rev = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    cost = F.col("l_quantity").cast("decimal(12,2)") * F.col("p_retailprice").cast(
        "decimal(12,2)"
    )
    t = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            cost.alias("cost"),
        )
    )
    return t.groupBy("nation", "o_year").agg(
        (F.sum("rev").cast("double") - F.sum("cost").cast("double")).alias("profit_proxy"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting — top 20 customers by lost
# revenue.  The LIMIT is decided on the exact DECIMAL revenue (not the
# double projection) with c_custkey as tie-break, so the top-20 SET is
# deterministic in both engines.


@query(
    "join_q10_shape",
    oracle="""
WITH rev AS (
  SELECT c_custkey, c_name,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec,
         COUNT(*) AS n_items
  FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY c_custkey, c_name
)
SELECT c_custkey, c_name, CAST(rev_dec AS DOUBLE) AS revenue, CAST(n_items AS BIGINT) AS n_items
FROM rev
ORDER BY rev_dec DESC, c_custkey ASC
LIMIT 20
""",
)
def join_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    g = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).alias("rev_dec"), F.count(F.lit(1)).alias("n_items"))
    )
    return (
        g.orderBy(F.col("rev_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "n_items",
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-priority classification.  The fixture has
# no l_shipmode, so l_linestatus stands in as the mode dimension; the
# CASE-bucketed priority counts and the late-shipment predicate
# (l_shipdate >= o_orderdate) keep the original shape: one fact-fact
# equi-join + conditional counts.


@query(
    "join_q12_shape",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def join_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate >= o.o_orderdate))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: promotion effect — percentage of revenue from PROMO
# parts per ship month.  Decimal-exact conditional and total sums, one
# double division at the end.


@query(
    "join_q14_shape",
    oracle="""
SELECT date_trunc('month', l_shipdate) AS ship_month,
       CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(12,2))
                             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END)
                    AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS DOUBLE) AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
GROUP BY 1
""",
)
def join_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = dmoney("l_extendedprice") * (one() - drate("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part.  The fixture has no
# partsupp, so the part-supplier catalog is derived from observed
# lineitem (l_partkey, l_suppkey) pairs with MIN(l_extendedprice) as
# the cost proxy (no division — stays decimal-exact).  The correlated
# MIN decorrelates to a per-part window rank with (cost, s_suppkey)
# tie-break — the standard rewrite Catalyst also applies to the
# original Q2.


@query(
    "join_q2_shape",
    oracle="""
WITH catalog AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
ranked AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, cost,
         ROW_NUMBER() OVER (PARTITION BY p_partkey ORDER BY cost ASC, s_suppkey ASC) AS rn
  FROM catalog
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_size < 10
)
SELECT p_partkey, p_brand, s_suppkey, s_name, CAST(cost AS DOUBLE) AS min_cost
FROM ranked WHERE rn = 1
""",
)
def join_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = load_table(spark, sf_dir, "supplier")
    catalog = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dmoney("l_extendedprice")).alias("cost")
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("cost").asc(), F.col("s_suppkey").asc()
    )
    return (
        catalog.join(F.broadcast(p), catalog.l_partkey == p.p_partkey)
        .join(F.broadcast(s), catalog.l_suppkey == s.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers with excess PROMO-part volume — a
# semi-join against an aggregated-and-filtered subquery (HAVING).  Only
# qualifying supplier keys flow into the join; the supplier dimension
# never touches the fact shuffle.


@query(
    "join_q20_shape",
    oracle="""
WITH sp AS (
  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100
)
SELECT s_suppkey, s_name, CAST(qty AS DOUBLE) AS promo_qty
FROM supplier JOIN sp ON l_suppkey = s_suppkey
""",
)
def join_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    sp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return s.join(sp, s.s_suppkey == sp.l_suppkey).select(
        "s_suppkey", "s_name", F.col("qty").cast("double").alias("promo_qty")
    )


# --------------------------------------------------------------------------
# B549 (round 10) — genuine SQL recursion: Spark 4's WITH RECURSIVE
# (SPARK-24497) runs the org-chart ancestor closure ENGINE-side — the
# recursive UnionLoop re-executes the step query until the frontier
# empties, replacing B82's driver-bounded Python loop for workloads
# that arrive as SQL.  The step term joins the frontier against the
# static parent map (child -> child div 7 over the contiguous key
# space, hierarchy_closure's fixture), so each iteration is one
# equi-join exactly like the hand-rolled loop; the result is rolled up
# per depth so the key reads as the closure's LEVEL PROFILE rather
# than duplicating B82's row-level output.  Depth is log_7(n) (~6 at
# sf0.1), far under Spark's default recursion row/level limits.
# Scale: identical plan economics to hierarchy_closure — the parent
# map is dimension-sized (AQE broadcasts it), the frontier shrinks
# 7x per level, and the final rollup is a 7-row aggregate.


@query(
    "subquery_recursive_cte",
    oracle="""
WITH RECURSIVE up AS (
  SELECT c_custkey AS node, c_custkey // 7 AS anc, 1 AS depth
  FROM customer WHERE c_custkey % 11 = 0 AND c_custkey >= 1
  UNION ALL
  SELECT u.node, p.parent, u.depth + 1
  FROM up u JOIN (SELECT c_custkey AS child, c_custkey // 7 AS parent
                  FROM customer) p ON p.child = u.anc
  WHERE u.anc >= 1
)
SELECT depth,
       COUNT(*) AS n_paths,
       COUNT(DISTINCT node) AS n_nodes,
       CAST(SUM(anc) AS BIGINT) AS sum_anc,
       CAST(MAX(anc) AS BIGINT) AS max_anc
FROM up GROUP BY depth
""",
)
def subquery_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("psvm_rec_customer")
    return spark.sql(
        """
WITH RECURSIVE up AS (
  SELECT c_custkey AS node, c_custkey div 7 AS anc, 1 AS depth
  FROM psvm_rec_customer WHERE c_custkey % 11 = 0 AND c_custkey >= 1
  UNION ALL
  SELECT u.node, p.parent, u.depth + 1
  FROM up u JOIN (SELECT c_custkey AS child, c_custkey div 7 AS parent
                  FROM psvm_rec_customer) p ON p.child = u.anc
  WHERE u.anc >= 1
)
SELECT depth,
       COUNT(*) AS n_paths,
       COUNT(DISTINCT node) AS n_nodes,
       CAST(SUM(anc) AS BIGINT) AS sum_anc,
       CAST(MAX(anc) AS BIGINT) AS max_anc
FROM up GROUP BY depth
"""
    )


# --------------------------------------------------------------------------
# B550 (round 10) — schema-tolerant union: unionByName with
# allowMissingColumns unions relations whose column SETS differ (the
# everyday shape when a pipeline version adds a column and history
# must still union with the new feed) — missing columns null-fill
# POSITION-INDEPENDENTLY, unlike UNION ALL's brittle ordinal matching.
# Customers carry an account balance; suppliers don't; the union
# rolls up per nation with the balance aggregated over the side that
# has it.  Scale: two narrow projections + one map-side-combined
# rollup on the nation key — no shuffle beyond the 25-key aggregate.


@query(
    "setops_union_by_name",
    oracle="""
WITH u AS (
  SELECT c_nationkey AS nk, 'customer' AS side,
         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer
  UNION ALL
  SELECT s_nationkey AS nk, 'supplier' AS side, NULL AS bal
  FROM supplier
)
SELECT nk,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE side = 'customer') AS n_customer,
       COUNT(*) FILTER (WHERE side = 'supplier') AS n_supplier,
       CAST(SUM(bal) AS DOUBLE) AS total_bal
FROM u GROUP BY nk
""",
)
def setops_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.lit("customer").alias("side"),
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
    )
    # supplier side has NO bal column: allowMissingColumns null-fills it
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"),
        F.lit("supplier").alias("side"),
    )
    u = c.unionByName(s, allowMissingColumns=True)
    return u.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("side") == "customer", 1)).alias("n_customer"),
        F.count(F.when(F.col("side") == "supplier", 1)).alias("n_supplier"),
        F.sum("bal").cast("double").alias("total_bal"),
    )
