"""Aggregate-tier unit tests (the oracle parity sweep is the primary
gate; these cover algorithmic invariants NumPy can check directly)."""

from __future__ import annotations

from psvm_spark import registry

registry.load_all()

class TestMedianTwoPass:
    def test_matches_numpy_order_statistics(self, spark, sf_dir):
        import numpy as np

        from psvm_spark.catalog import load_table
        from pyspark.sql import functions as F

        v = np.sort(
            np.array(
                load_table(spark, sf_dir, "lineitem")
                .select(
                    (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
                    .cast("bigint")
                    .alias("v")
                )
                .toPandas()["v"]
                .to_numpy()
            )
        )
        n = len(v)
        want = {p: int(v[(n - 1) * p // 100]) for p in (50, 95)}
        got = {
            r.p: r.value_cents
            for r in registry.QUERIES["agg_median_two_pass"](spark, sf_dir).collect()
        }
        assert got == want
