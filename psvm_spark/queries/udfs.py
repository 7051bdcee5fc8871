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


@query("map_in_pandas_tokens")
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
