"""Warehouse-maintenance operators: incremental rollup refresh, snapshot
diffing, data-quality expectations, and the skew-salted join path.

These are the operations that keep a 100 TB warehouse usable: nightly
rollups must refresh from one new partition instead of rescanning
history; snapshots must be diffable to produce CDC feeds; constraint
violations must be countable in O(scan); and hot-key joins must not
funnel a terabyte into one reducer.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psvm_spark.catalog import load_events_range, load_table
from psvm_spark.registry import query

# --------------------------------------------------------------------------
# Incremental rollup refresh: the daily (day x event_type) rollup for
# days 1..29 is persisted as *partial aggregates* (decimal sum + count);
# the refresh reads ONLY the new day's raw events (raw-ns pushdown) and
# merges it with the stored partials — no history rescan.  Decimal
# partials re-aggregate exactly, so the merged rollup is bit-identical
# to the full recompute the oracle runs.  At 100 TB this turns a daily
# O(total) job into O(one day) + O(|rollup|).


@query(
    "incremental_rollup",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2
""",
)
def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut_lo, cut_hi = "2024-01-30", "2024-02-01"
    state_dir = os.path.join(
        tempfile.gettempdir(),
        f"psvm_rollup_state_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    # Nightly job (run here for self-containedness): persist partial
    # aggregates for the historical days.  decimal(20,2) leaves headroom
    # for re-aggregation at any scale.
    hist = load_events_range(spark, sf_dir, "2024-01-01", cut_lo)
    (
        hist.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(20,2)").alias("pt"),
        )
        .write.mode("overwrite")
        .parquet(state_dir)
    )
    # Refresh: new day only, merged with stored partials.
    new = (
        load_events_range(spark, sf_dir, cut_lo, cut_hi)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(20,2)").alias("pt"),
        )
    )
    return (
        spark.read.parquet(state_dir)
        .unionByName(new)
        .groupBy("day", "event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pt").cast("double").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# Snapshot diff -> CDC feed: full-outer join two table snapshots on the
# key and classify every row as added / removed / changed (unchanged
# rows are dropped).  The snapshots here are deterministic projections
# of `orders` (subset + simulated status mutation) so the oracle can
# rebuild them.  One shuffle on the key; at 100 TB both snapshots would
# be bucketed on the key, making the diff shuffle-free.


@query(
    "snapshot_diff",
    oracle="""
WITH snap_a AS (
  SELECT o_orderkey AS k, o_orderstatus AS st FROM orders WHERE o_orderkey % 11 <> 0),
snap_b AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS st
  FROM orders WHERE o_orderkey % 13 <> 0)
SELECT COALESCE(a.k, b.k) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL OR a.st <> b.st
""",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("ka"), F.col("o_orderstatus").alias("sta")
    )
    snap_b = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("kb"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("stb"),
    )
    return (
        snap_a.join(snap_b, F.col("ka") == F.col("kb"), "full_outer")
        .filter(
            F.col("ka").isNull() | F.col("kb").isNull() | (F.col("sta") != F.col("stb"))
        )
        .select(
            F.coalesce("ka", "kb").alias("o_orderkey"),
            F.when(F.col("ka").isNull(), "added")
            .when(F.col("kb").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
        )
    )


# --------------------------------------------------------------------------
# Data-quality expectations: a rule catalog evaluated in O(scan) —
# range checks and uniqueness fold into per-table aggregate passes (one
# scan each), the FK orphan check is one anti join.  Violation counts
# are integers, trivially parity-exact.  At 100 TB the per-table rules
# share a single scan regardless of rule count.


@query(
    "dq_expectations",
    oracle="""
SELECT 'lineitem.quantity_in_range' AS rule_name,
       COUNT(*) FILTER (WHERE l_quantity NOT BETWEEN 1 AND 50) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem.orderkey_fk_orders',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
UNION ALL
SELECT 'orders.totalprice_positive',
       COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
UNION ALL
SELECT 'orders.orderkey_unique',
       COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    li_rules = li.agg(
        F.sum(
            F.when(~F.col("l_quantity").between(1, 50), 1).otherwise(0)
        ).alias("quantity_in_range")
    )
    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orderkey_fk_orders"))
    )
    o_rules = o.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "totalprice_positive"
        ),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("orderkey_unique"),
    )
    wide = li_rules.join(orphans).join(o_rules)
    return wide.select(
        F.expr(
            "stack(4, "
            "'lineitem.quantity_in_range', quantity_in_range, "
            "'lineitem.orderkey_fk_orders', orderkey_fk_orders, "
            "'orders.totalprice_positive', totalprice_positive, "
            "'orders.orderkey_unique', orderkey_unique) "
            "AS (rule_name, n_violations)"
        )
    )


# --------------------------------------------------------------------------
# Skew-salted join (operators/salt.py salted_join_small): lineitem joins
# its per-returnflag average discount — a 3-row key domain, the
# textbook hot-key join.  The helper salts the big side and explodes the
# small side once per salt value, spreading each flag over 32 reducers;
# results are identical to the plain join (salt never leaks into
# values).  At local fixture size Catalyst broadcasts the tiny salted
# side anyway — the helper is the documented fallback for when the
# small side exceeds broadcast limits AND a key is hot.


@query(
    "join_salted_skew",
    oracle="""
WITH flag_avg AS (
  SELECT l_returnflag AS rf,
         CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, COUNT(*) AS n_above,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price_above
FROM lineitem JOIN flag_avg ON l_returnflag = rf
WHERE l_discount > avg_disc
GROUP BY l_returnflag
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from psvm_spark.operators.salt import salted_join_small

    li = load_table(spark, sf_dir, "lineitem")
    flag_avg = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        (
            F.sum(F.col("l_discount").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_disc")
    )
    joined = salted_join_small(
        li.withColumnRenamed("l_returnflag", "rf"), flag_avg, on=["rf"], n_buckets=32
    )
    return (
        joined.filter(F.col("l_discount") > F.col("avg_disc"))
        .groupBy(F.col("rf").alias("l_returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("price_above"),
        )
    )


# --------------------------------------------------------------------------
# Small-file compaction: the steady-state maintenance job every 100 TB
# table needs — streaming/CDC sinks leave thousands of KB-sized files,
# and scan cost becomes per-file overhead instead of bytes.  The op:
# read the fragmented table, repartitionByRange on the sort key (range
# partitioning keeps files non-overlapping so min/max data skipping
# stays effective), write back, and verify CONTENT IDENTITY — the
# oracle aggregates the original table, the query aggregates the
# compacted copy, so any row lost/duplicated in the rewrite breaks the
# hash.  One shuffle, output file count = target partition count.


@query(
    "sink_compact_small_files",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM documents
GROUP BY lang
""",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="psvm_compact_")
    frag, compact = base + "/frag", base + "/compact"
    # simulate a fragmented CDC landing zone: 64 tiny files
    d.repartition(64).write.mode("overwrite").parquet(frag)
    n_frag = len(glob.glob(frag + "/part-*"))
    back = spark.read.parquet(frag)
    back.repartitionByRange(4, "doc_id").write.mode("overwrite").parquet(compact)
    n_compact = len(glob.glob(compact + "/part-*"))
    assert n_compact < n_frag, (n_compact, n_frag)
    return (
        spark.read.parquet(compact)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )
