"""Window functions: B24-B26 + per-group top-k (B29).

Deterministic tie-breaking convention (SURVEY.md section 4.2.2): every
ORDER BY inside a window ends with a unique key so rank/lag outputs are
stable and oracle-hashable.  A window is one shuffle on its partition
keys; frames are evaluated in a single in-partition pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from psvm_spark.catalog import load_table
from psvm_spark.registry import query

# --------------------------------------------------------------------------
# B24 — ranking functions.


@query(
    "window_rank",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# B25 — lag/lead analytics: per-user event deltas.


@query(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id, event_type,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev,
       lead(event_type) OVER w AS next_type,
       first_value(event_type) OVER w AS first_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (us - F.lag(us).over(w)).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
    )


# --------------------------------------------------------------------------
# B26 — frames: running totals (rows) + range-framed moving aggregate.
# Decimal arithmetic inside the frame keeps the running sums exact.


@query(
    "window_frames",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS last3_total,
       COUNT(*) OVER (PARTITION BY o_custkey) AS n_cust_orders
FROM orders
""",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    money = F.col("o_totalprice").cast("decimal(12,2)")
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_3 = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    w_all = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money).over(w_run).cast("double").alias("running_total"),
        F.sum(money).over(w_3).cast("double").alias("last3_total"),
        F.count(F.lit(1)).over(w_all).alias("n_cust_orders"),
    )


# --------------------------------------------------------------------------
# B29 — per-group top-k: rank + filter.  At scale, if k is small and
# groups are many this stays one shuffle; for heavy skew pre-aggregate
# with min_by/max_by sketches first.


@query(
    "topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 5
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# B24 (distribution): percent_rank and cume_dist.  Both are ratios of
# small exact integers ((rank-1)/(n-1), n_le/n) computed in double with
# the same formula in both engines — correctly-rounded IEEE division of
# identical operands, so bit-parity holds with the round(9) convention.


@query(
    "window_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist() OVER w, 9) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


# --------------------------------------------------------------------------
# Upsert / CDC merge: base (events before the cutoff) + updates (at or
# after) -> latest row per key, updates overriding base.  Expressed as
# union + one ranking window — ONE shuffle on the key, the same plan a
# native MERGE compiles to for latest-wins semantics; at 100 TB the
# union sides are the stored table and the incoming CDC batch.


@query(
    "upsert_latest",
    oracle="""
WITH unioned AS (
  SELECT user_id, event_type, ts, event_id, value FROM events
    WHERE ts < TIMESTAMP '2024-01-20'
  UNION ALL
  SELECT user_id, event_type, ts, event_id, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-20'
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM unioned
)
SELECT user_id, event_type, ts AS latest_ts, event_id AS latest_event_id, value
FROM ranked WHERE rn = 1
""",
)
def upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    cutoff = F.lit("2024-01-20").cast("timestamp")
    base = ev.filter(F.col("ts") < cutoff)
    updates = ev.filter(F.col("ts") >= cutoff)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("event_id").alias("latest_event_id"),
            "value",
        )
    )


# --------------------------------------------------------------------------
# Batch sessionization: gap-based session ids via lag + running sum —
# the batch twin of the streaming session window (B40).  One shuffle on
# user_id; both window passes share the same (user_id | ts, event_id)
# sort, so Catalyst evaluates them in a single Window operator chain
# without a second exchange.  At 100 TB this is the standard
# clickstream sessionize: partitions scale with users, session state
# never leaves its partition.

_SESSION_GAP_MIN = 30


@query(
    "window_sessionize",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {_SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       date_diff('microsecond', MIN(ts), MAX(ts)) AS duration_us,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, sess_id
""",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _SESSION_GAP_MIN * 60 * 1_000_000
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                  "(PARTITION BY user_id ORDER BY ts, event_id), ts)") > gap_us),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(new_sess).over(wsum).alias("sess_id"),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias("duration_us"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# Time-interval RANGE frame: per-user rolling 1-hour sum/count ordered
# by event time.  Spark's rangeBetween needs a numeric ordering key, so
# the frame is expressed over unix microseconds — exactly the µs
# resolution DuckDB's `RANGE BETWEEN INTERVAL '1 HOUR' PRECEDING`
# evaluates at, so peer sets match bit-for-bit.  One shuffle on
# user_id + in-partition sort; at 100 TB this is the streaming-free way
# to compute trailing-window features for training data.


@query(
    "window_time_range",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS sum_1h,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h
FROM events
""",
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


# --------------------------------------------------------------------------
# Ratio-to-report: each row's share of its group total — the reporting
# window that turns absolute measures into contribution percentages.
# The partition-total window is a single shuffle on the group key and
# Spark evaluates it with a partial+final window agg (no sort needed
# for an unbounded frame).  Parity: the total is an exact DECIMAL
# window sum cast to double once; the share divides two exact doubles,
# rounded to 9.


@query(
    "window_ratio_to_report",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
       round(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_orderpriority) AS DOUBLE), 9) AS share
FROM orders
""",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(12,2)")
    w = Window.partitionBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        price_dec.cast("double").alias("price"),
        F.round(
            price_dec.cast("double") / F.sum(price_dec).over(w).cast("double"), 9
        ).alias("share"),
    )


# --------------------------------------------------------------------------
# Sliding count-distinct: distinct event types among each user's last 5
# events.  Spark has no COUNT(DISTINCT) OVER; the standard rewrite is
# size(array_distinct(collect_list() over frame)) — exact, and the frame
# is small (5 rows) so the per-row array work is O(frame), not O(n).
# The shuffle is one hash partition on user_id, identical to any other
# user-windowed analytic; ordering is (ts, event_id) for determinism.


@query(
    "window_sliding_distinct",
    oracle="""
SELECT event_id, user_id,
       CAST(len(list_distinct(list(event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))) AS INT) AS n_distinct_5
FROM events
""",
)
def window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).alias("n_distinct_5"),
    )
