"""UDF / UDAF / UDTF surface: B53-B56 (SURVEY.md section 2.2).

UDFs are the slow path (SURVEY.md section 4.2): everything here exists
to prove the extension points work, with Arrow-vectorized pandas UDFs
as the only sanctioned form for per-row Python in production.  Each
closure is self-contained — executor workers cannot import psvm_spark.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from psvm_spark.catalog import load_table
from psvm_spark.registry import query

# --------------------------------------------------------------------------
# B53 — scalar pandas UDF (Arrow-vectorized): net price, SQL-mirrorable.


@query(
    "udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
FROM lineitem
WHERE l_quantity > 40
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # no .round(): pandas rounds half-even, DuckDB half-away —
        # the raw product is bit-identical in both engines
        return price * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 40).select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


# --------------------------------------------------------------------------
# B55 — grouped-aggregate pandas UDF (UDAF): price range per flag.


@query(
    "udaf_grouped",
    oracle="""
SELECT l_returnflag,
       round(max(l_extendedprice) - min(l_extendedprice), 2) AS price_range
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def price_range(price: pd.Series) -> float:
        return round(float(price.max() - price.min()), 2)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        price_range("l_extendedprice").alias("price_range")
    )


# --------------------------------------------------------------------------
# B54 — grouped-map applyInPandas: per-segment acctbal z-scores (top row
# per segment by |z|, deterministic tie-break).  The oracle recomputes
# the same arithmetic in SQL from exact decimal sums.


@query(
    "grouped_map_zscore",
    oracle="""
WITH s AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sxx
  FROM customer GROUP BY c_mktsegment
), z AS (
  SELECT c.c_custkey, c.c_mktsegment,
         round((c.c_acctbal - s.sx / s.n)
               / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)), 6) AS z
  FROM customer c JOIN s USING (c_mktsegment)
), ranked AS (
  SELECT c_custkey, c_mktsegment, z,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY abs(z) DESC, c_custkey ASC) AS rn
  FROM z
)
SELECT c_custkey, c_mktsegment, z FROM ranked WHERE rn = 1
""",
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def top_outlier(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["c_acctbal"].to_numpy()
        n = len(x)
        sx = float(np.sum(np.round(x, 2)))
        sxx = float(np.sum(np.round(x, 2) * np.round(x, 2)))
        std = ((sxx - sx * sx / n) / (n - 1)) ** 0.5
        z = np.round((x - sx / n) / std, 6)
        pdf = pdf.assign(z=z, absz=np.abs(z))
        pdf = pdf.sort_values(["absz", "c_custkey"], ascending=[False, True])
        return pdf.head(1)[["c_custkey", "c_mktsegment", "z"]]

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        top_outlier, "c_custkey long, c_mktsegment string, z double"
    )


# --------------------------------------------------------------------------
# B56 — Python UDTF (Spark 4): explode an order into per-line tax rows.


@query(
    "udtf_explode_taxes",
    oracle="""
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(SUM(round(l_extendedprice * l_tax, 4)), 4) AS total_tax
FROM lineitem
WHERE l_orderkey % 100 = 0
GROUP BY l_orderkey
""",
)
def udtf_explode_taxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="l_orderkey bigint, tax_amt double")
    class TaxRows:
        def eval(self, orderkey: int, price: float, tax: float):
            yield orderkey, round(price * tax, 4)

    spark.udtf.register("tax_rows", TaxRows)
    # filter BEFORE the lateral UDTF — the %100 predicate doesn't push
    # below a Python table function, so pre-filter the view (measured
    # ~5.6s -> sub-second at sf0.1)
    load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    ).createOrReplaceTempView("li_v")
    exploded = spark.sql(
        "SELECT t.l_orderkey, t.tax_amt FROM li_v, "
        "LATERAL tax_rows(l_orderkey, l_extendedprice, l_tax) t"
    )
    return exploded.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("tax_amt"), 4).alias("total_tax"),
    )


# --------------------------------------------------------------------------
# mapInPandas — per-partition batch iterator (custom-operator escape
# hatch): running per-partition token count over documents.


@query(
    "map_in_pandas_tokens",
    # Exact oracle across the Arrow/pandas boundary (round 5): pandas
    # str.split(" ") and DuckDB string_split keep empty fields
    # identically, so the token counts match int-for-int.
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
FROM documents
""",
)
def map_in_pandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    def count_tokens(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int64"),
                }
            )

    d = load_table(spark, sf_dir, "documents")
    out = d.mapInPandas(count_tokens, "doc_id long, n_tokens long")
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# Cogrouped-map pandas (the remaining pandas API after B54's grouped
# map): orders and lineitem meet as two aligned pandas frames — the
# escape hatch for per-key logic that needs BOTH sides local (custom
# reconciliation, per-key model scoring).  The cogroup key is a hash
# SHARD (o_orderkey % 256), not the raw orderkey: cogrouping on the
# natural key means one Python invocation per order (~2 ms each — 90 s
# for 50 k orders, measured), while sharding amortizes the boundary to
# 256 invocations and does the per-order work vectorized inside pandas.
# That is the general rule for cogroup at 100 TB: pick a key granular
# enough to fit memory, coarse enough to amortize the Python boundary;
# the shuffle cost (one co-partitioning exchange per side) is the same.
# Float parity: lineitem money is summed in integer cents inside
# pandas, so the result is order-independent and matches the oracle's
# DECIMAL sum.

_COGROUP_SHARDS = 256


@query(
    "cogroup_reconcile",
    oracle="""
SELECT o.o_orderkey,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
       CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 0) AS DOUBLE)
         AS lineitem_total
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderkey
""",
)
def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", (F.col("o_orderkey") % _COGROUP_SHARDS).alias("shard"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        (F.col("l_orderkey") % _COGROUP_SHARDS).alias("shard"),
    )

    def reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if odf.empty:
            return pd.DataFrame(
                {"o_orderkey": [], "n_lines": [], "lineitem_total": []}
            ).astype({"o_orderkey": "int64", "n_lines": "int64", "lineitem_total": "float64"})
        cents = (ldf["l_extendedprice"] * 100).round().astype("int64")
        per_order = (
            pd.DataFrame({"k": ldf["l_orderkey"], "c": cents})
            .groupby("k")
            .agg(n_lines=("c", "size"), total_cents=("c", "sum"))
        )
        out = odf[["o_orderkey"]].merge(
            per_order, left_on="o_orderkey", right_index=True, how="left"
        )
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        out["lineitem_total"] = out["total_cents"].fillna(0).astype("int64") / 100.0
        return out[["o_orderkey", "n_lines", "lineitem_total"]]

    return (
        o.groupBy("shard")
        .cogroup(li.groupBy("shard"))
        .applyInPandas(
            reconcile, "o_orderkey bigint, n_lines bigint, lineitem_total double"
        )
    )


# --------------------------------------------------------------------------
# mapInArrow (the zero-copy Arrow-batch API below pandas): int8 vector
# quantization of the embedding column — the storage/bandwidth step a
# real ANN index applies before sharding (4x smaller vectors).  All
# outputs are exact integers (floor(x*127 + 0.5), clipped to ±127 —
# floor-plus-half, not round(), because numpy rounds half-even while
# SQL rounds half-away), so the Python boundary is parity-exact.
# At 100 TB this is a narrow Arrow-batched pass: no shuffle, memory
# bounded by the batch size knob.


@query(
    "map_in_arrow_quantize",
    oracle="""
SELECT vec_id,
       CAST(list_aggregate(list_transform(embedding,
         x -> GREATEST(-127, LEAST(127, CAST(FLOOR(CAST(x AS DOUBLE) * 127 + 0.5) AS BIGINT)))),
         'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(list_transform(embedding,
         x -> ABS(GREATEST(-127, LEAST(127, CAST(FLOOR(CAST(x AS DOUBLE) * 127 + 0.5) AS BIGINT))))),
         'sum') AS BIGINT) AS q_l1,
       CAST(len(list_filter(embedding,
         x -> FLOOR(CAST(x AS DOUBLE) * 127 + 0.5) > 127
           OR FLOOR(CAST(x AS DOUBLE) * 127 + 0.5) < -127)) AS BIGINT) AS n_clipped
FROM embeddings
""",
)
def map_in_arrow_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def quantize(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            tbl = batch.to_pydict()
            ids, qs, l1s, nc = [], [], [], []
            for vid, emb in zip(tbl["vec_id"], tbl["embedding"]):
                xd = np.asarray(emb, dtype=np.float32).astype(np.float64)
                raw = np.floor(xd * 127.0 + 0.5)
                clipped = int(((raw > 127) | (raw < -127)).sum())
                q = np.clip(raw, -127, 127).astype(np.int64)
                ids.append(vid)
                qs.append(int(q.sum()))
                l1s.append(int(np.abs(q).sum()))
                nc.append(clipped)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "q_sum": pa.array(qs, pa.int64()),
                    "q_l1": pa.array(l1s, pa.int64()),
                    "n_clipped": pa.array(nc, pa.int64()),
                }
            )

    return e.mapInArrow(
        quantize, "vec_id bigint, q_sum bigint, q_l1 bigint, n_clipped bigint"
    )


# --------------------------------------------------------------------------
# B180 (round 5) — POLYMORPHIC Python UDTF (Spark 4 `analyze`): output
# schema computed at plan time from the call's literal arguments — the
# "dynamic projection" shape that lets one table function serve any
# JSON layout without per-schema registration.  Here `json_cols(props,
# 'device', 'plan')` inspects its literal key list in analyze() and
# emits one string column per requested key; the driver's oracle twin
# is plain DuckDB json_extract_string, so the dynamic-schema machinery
# is differentially tested end to end.  Per-row Python, but over a
# pre-filtered slice (the %97 sample) — the pattern's cost note mirrors
# udtf_explode_taxes above.


@query(
    "udtf_polymorphic_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.device') AS device,
       json_extract_string(props, '$.plan') AS plan
FROM events WHERE event_id % 97 = 0
""",
)
def udtf_polymorphic_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType

    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class JsonCols:
        @staticmethod
        def analyze(payload: AnalyzeArgument, *keys: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for k in keys:
                schema = schema.add(str(k.value), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, payload: str, *keys: str):
            import json as _json

            try:
                obj = _json.loads(payload) if payload else {}
            except ValueError:
                obj = {}
            vals = tuple(
                v if isinstance(v, str) else (None if v is None else _json.dumps(v))
                for v in (obj.get(k) for k in keys)
            )
            yield vals

    spark.udtf.register("json_cols", JsonCols)
    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 97 == 0
    ).createOrReplaceTempView("ev_udtf_v")
    return spark.sql(
        "SELECT e.event_id, t.device, t.plan FROM ev_udtf_v e, "
        "LATERAL json_cols(props, 'device', 'plan') t"
    )


# --------------------------------------------------------------------------
# B518 (round 10) — SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN): the
# catalog-registered, PLAN-INLINED user function surface — unlike a
# Python UDF the body is a SQL expression Catalyst expands in place,
# so it runs JVM-side inside whole-stage codegen with zero
# serialization (the only sanctioned "UDF" for hot paths).  One scalar
# function (discounted net in cents) and one TABLE function (top
# spending tiers per order) exercised through a join; the oracle
# inlines the same expressions.


@query(
    "udf_sql_function",
    oracle="""
WITH net AS (
  SELECT l_orderkey,
         CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
           AS net_c
  FROM lineitem),
tiers AS (
  SELECT l_orderkey, SUM(net_c) AS order_c,
         CASE WHEN SUM(net_c) >= 20000000 THEN 'high'
              WHEN SUM(net_c) >= 10000000 THEN 'mid'
              ELSE 'low' END AS tier
  FROM net GROUP BY l_orderkey)
SELECT tier,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(order_c) AS BIGINT) AS total_c
FROM tiers GROUP BY tier
""",
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_sqludf_v"
    )
    # scalar SQL UDF: exact integer cents, inlined by Catalyst
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION net_cents(p DECIMAL(12,2), d DOUBLE)
           RETURNS BIGINT
           RETURN CAST(round(p * (100 - CAST(round(d * 100) AS BIGINT))) AS BIGINT)"""
    )
    # SQL table function: per-order totals bucketed into spend tiers
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION spend_tiers()
           RETURNS TABLE(l_orderkey BIGINT, order_c BIGINT, tier STRING)
           RETURN SELECT l_orderkey, SUM(net_c) AS order_c,
                  CASE WHEN SUM(net_c) >= 20000000 THEN 'high'
                       WHEN SUM(net_c) >= 10000000 THEN 'mid'
                       ELSE 'low' END AS tier
           FROM (SELECT l_orderkey,
                        net_cents(CAST(l_extendedprice AS DECIMAL(12,2)),
                                  l_discount) AS net_c
                 FROM li_sqludf_v)
           GROUP BY l_orderkey"""
    )
    return spark.sql(
        """SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(SUM(order_c) AS BIGINT) AS total_c
           FROM spend_tiers() GROUP BY tier"""
    )


# --------------------------------------------------------------------------
# B580 (round 11) — grouped-map over ARROW tables (`applyInArrow`,
# Spark 4.0): the zero-copy sibling of B54's applyInPandas — the UDF
# receives each group as a pyarrow.Table and returns one, skipping the
# pandas conversion entirely (the right tier when the group logic is
# expressible in Arrow compute kernels: columnar, no per-row Python).
# Semantics: per-mktsegment min-max scaling of account balances in
# exact cents, one double division per row; Arrow's round is forced to
# half_towards_infinity (away-from-zero on these non-negative values)
# to match Spark/DuckDB ROUND.  At 100 TB each
# group streams through a worker as Arrow batches — the shuffle is the
# only data-sized cost, identical to the pandas variant but without
# the serialization tax.


@query(
    "grouped_arrow_scale",
    oracle="""
WITH b AS (
  SELECT c_custkey, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c
  FROM customer),
rng AS (
  SELECT *, MIN(bal_c) OVER (PARTITION BY c_mktsegment) AS lo,
            MAX(bal_c) OVER (PARTITION BY c_mktsegment) AS hi
  FROM b)
SELECT c_custkey, c_mktsegment AS segment,
       CASE WHEN hi = lo THEN 0e0
            ELSE round((bal_c - lo) / CAST(hi - lo AS DOUBLE), 9) END AS scaled
FROM rng
""",
)
def grouped_arrow_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("bal_c"),
    )

    def scale(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        bal = table.column("bal_c")
        lo = pc.min(bal).as_py()
        hi = pc.max(bal).as_py()
        if hi == lo:
            scaled = pa.array([0.0] * table.num_rows, pa.float64())
        else:
            delta = pc.cast(pc.subtract(bal, pa.scalar(lo)), pa.float64())
            scaled = pc.round(
                pc.divide(delta, pa.scalar(float(hi - lo))),
                ndigits=9,
                round_mode="half_towards_infinity",
            )
        return pa.table(
            {
                "c_custkey": table.column("c_custkey"),
                "segment": table.column("segment"),
                "scaled": scaled,
            }
        )

    return c.groupBy("segment").applyInArrow(
        scale, "c_custkey bigint, segment string, scaled double"
    )


# --------------------------------------------------------------------------
# B581 (round 11) — ARROW-OPTIMIZED scalar Python UDF
# (`udf(..., useArrow=True)`, Spark 3.5+): same authoring surface as
# B53's row-at-a-time UDF, but the runtime ships Arrow batches instead
# of pickled rows — the migration path for legacy scalar UDFs that
# cannot be rewritten as pandas UDFs.  The function itself stays
# per-value Python (a digit sum — deliberately string-shaped so the
# oracle exercises the same per-digit decomposition in SQL); the key's
# point is the execution tier, pinned in tests via ArrowEvalPython in
# the plan.


@query(
    "udf_arrow_scalar",
    oracle="""
SELECT ds AS digit_sum, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT CAST(list_sum(list_transform(
           generate_series(1, length(CAST(o_orderkey AS VARCHAR))),
           i -> CAST(substr(CAST(o_orderkey AS VARCHAR), i, 1) AS INT)))
         AS BIGINT) AS ds
  FROM orders)
GROUP BY ds
""",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digit_sum = F.udf(
        lambda k: sum(int(ch) for ch in str(k)), LongType(), useArrow=True
    )
    return (
        o.select(digit_sum("o_orderkey").alias("digit_sum"))
        .groupBy("digit_sum")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# B584 (round 11) — UDTF with a TABLE(...) argument (Spark 4):
# `SELECT * FROM f(TABLE(t) PARTITION BY k ORDER BY ts)` streams each
# partition's rows, IN ORDER, through one UDTF instance — the
# SQL-surface twin of applyInPandasWithState for order-dependent
# per-key logic, and the sanctioned way to hand a whole relation to a
# Python table function (the scalar-arg UDTF of B180 can't see rows).
# Semantics: per-user session-gap profile over events — event count,
# number of >30-min gaps, and the maximum gap — all exact integer
# microsecond arithmetic.  Oracle: the LAG window twin.  At 100 TB:
# one shuffle on user_id; each partition streams through its instance
# without materializing (terminate() emits one row per user).


@query(
    "udtf_table_argument",
    oracle="""
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           AS gap_us
  FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gaps,
       CAST(COALESCE(MAX(gap_us), 0) AS BIGINT) AS max_gap_us
FROM d GROUP BY user_id
""",
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, n_gaps bigint, max_gap_us bigint")
    class SessionGaps:
        def __init__(self):
            self.user = None
            self.n = 0
            self.n_gaps = 0
            self.max_gap = 0
            self.prev_us = None

        def eval(self, row):
            self.user = row.user_id
            self.n += 1
            us = row.ts_us
            if self.prev_us is not None:
                gap = us - self.prev_us
                if gap > 1_800_000_000:
                    self.n_gaps += 1
                if gap > self.max_gap:
                    self.max_gap = gap
            self.prev_us = us

        def terminate(self):
            if self.user is not None:
                yield (self.user, self.n, self.n_gaps, self.max_gap)

    spark.udtf.register("psvm_session_gaps", SessionGaps)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    ev.createOrReplaceTempView("psvm_udtf_events")
    return spark.sql(
        """
SELECT * FROM psvm_session_gaps(
  TABLE(psvm_udtf_events) PARTITION BY user_id ORDER BY (ts_us, event_id))
"""
    )
