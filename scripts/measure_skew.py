"""Measure skew resilience: naive vs AQE vs explicit salting (SURVEY.md
§4.2.3; round-1 verdict item #7).

Builds a deliberately skewed workload from lineitem at the given scale
(default sf0.1 amplified ~20x -> ~12M rows, 60% of them sharing ONE
key), then times:

  agg_naive    groupBy(hot_key).agg(...)       — one reducer owns 60%
  agg_salted   salted_groupby(n_buckets=32)    — two-phase partials
  join_naive   big join keys (AQE skewJoin ON) — AQE splits hot splits
  join_noaqe   same join, AQE skewJoin OFF     — the unmitigated case
  join_salted  salted_join_small(n_buckets=32)

Each variant materializes through the noop sink; prints one JSON line.
Usage: python scripts/measure_skew.py [sf_dir] [amplify]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from psvm_spark.catalog import load_table
from psvm_spark.operators.salt import salted_groupby, salted_join_small
from psvm_spark.session import get_spark


def _mat(df, reps: int = 2) -> float:
    """Best-of-N materialization: single-JVM local mode has multi-second
    GC/JIT variance, and min-of-reps is the standard way to see the
    plan's cost rather than the noise."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("skew_measure")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # 60% of rows share hot_key 0; the rest spread over ~1000 keys.
    # Deterministic (no RNG) so runs are comparable.
    big = (
        li.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(amplify))))
        .withColumn(
            "hot_key",
            F.when(F.col("l_orderkey") % 10 < 6, F.lit(0)).otherwise(
                F.col("l_orderkey") % 1000
            ),
        )
        .drop("rep")
    )
    big.persist()
    n = big.count()  # materialize once so scan cost is out of the timings

    dim = (
        big.select("hot_key").distinct().withColumn("key_attr", F.col("hot_key") * 7 + 1)
    ).persist()
    dim.count()

    res: dict[str, float] = {"rows": n}

    agg_exprs = [
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.max("l_extendedprice").alias("max_price"),
    ]
    res["agg_naive"] = _mat(big.groupBy("hot_key").agg(*agg_exprs))
    res["agg_salted"] = _mat(
        salted_groupby(
            big,
            ["hot_key"],
            partial_aggs=[
                F.sum("l_quantity").alias("s"),
                F.count(F.lit(1)).alias("c"),
                F.max("l_extendedprice").alias("m"),
            ],
            final_aggs=[
                F.sum("s").alias("sum_qty"),
                F.sum("c").alias("n"),
                F.max("m").alias("max_price"),
            ],
        )
    )

    joined_cnt = lambda j: j.groupBy().agg(F.count(F.lit(1)).alias("n"))  # noqa: E731
    # Force a shuffle join (no broadcast) so the skew actually lands on
    # reducers; dim is small enough to broadcast, which would hide it.
    no_bc = {"spark.sql.autoBroadcastJoinThreshold": "-1"}

    # Tune AQE so the hot partition actually crosses the skew threshold
    # (default 256MB never fires at this scale — which is itself a
    # finding: AQE skew handling is threshold-gated, salting is not).
    aqe_tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }

    def timed_join(skew_enabled: str, salted: bool) -> float:
        keys = (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            *aqe_tuned,
        )
        prev = {}
        for k in keys:
            try:
                prev[k] = spark.conf.get(k)
            except Exception:
                prev[k] = None
        try:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_enabled)
            for k, v in no_bc.items():
                spark.conf.set(k, v)
            if skew_enabled == "true":
                for k, v in aqe_tuned.items():
                    spark.conf.set(k, v)
            if salted:
                j = salted_join_small(big, dim, on=["hot_key"], n_buckets=32)
            else:
                j = big.join(dim, "hot_key")
            return _mat(joined_cnt(j))
        finally:
            # restore EVERY key: a key with no prior value is unset, not
            # skipped — skipping would leak the tuned value into the next
            # measurement in the same session
            for k, v in prev.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    try:
                        spark.conf.unset(k)
                    except Exception:
                        pass

    res["join_aqe"] = timed_join("true", salted=False)
    res["join_noaqe"] = timed_join("false", salted=False)
    res["join_salted"] = timed_join("true", salted=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
