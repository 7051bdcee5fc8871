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


class TestRakingIPF:
    def test_margins_converge_to_targets(self, spark, sf_dir):
        rows = registry.QUERIES["agg_raking_ipf"](spark, sf_dir).collect()
        assert all(r.weight > 0 for r in rows)
        total = sum(r.n for r in rows)
        n_nat = len({r.n_name for r in rows})
        n_pri = len({r.prio for r in rows})
        rt, ct = total / n_nat, total / n_pri
        col = {}
        row = {}
        for r in rows:
            col[r.prio] = col.get(r.prio, 0.0) + r.weight
            row[r.n_name] = row.get(r.n_name, 0.0) + r.weight
        # last cycle scaled columns: column margins hit ct exactly (to
        # rounding); row margins are within a few percent after 2 rounds
        for v in col.values():
            assert abs(v - ct) < 1e-3 * ct
        for v in row.values():
            assert abs(v - rt) < 0.05 * rt


class TestHLLExactTwin:
    def test_estimate_and_union_monotonicity(self, spark, sf_dir):
        rows = registry.QUERIES["agg_hll_exact_twin"](spark, sf_dir).collect()
        per = {r.event_type: r for r in rows}
        assert "__all__" in per and len(per) >= 3
        for r in rows:
            # corrected estimate (linear counting below 2.5m, raw
            # harmonic above) within 25% of exact at m=256
            assert abs(r.est_users - r.exact_users) <= max(3, 0.25 * r.exact_users)
            assert 0 <= r.v_zero < 256
        # union registers dominate every per-type register set, so the
        # merged estimate can never be below any component's estimate
        for t, r in per.items():
            if t != "__all__":
                assert per["__all__"].raw_est >= r.raw_est


class TestKmvExactTwin:
    def test_estimates_near_truth_and_algebra_consistent(self, spark, sf_dir):
        from psvm_spark.catalog import load_table

        row = registry.QUERIES["agg_kmv_exact_twin"](spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events")
        click = {r.user_id for r in ev.filter("event_type = 'click'").select("user_id").distinct().collect()}
        view = {r.user_id for r in ev.filter("event_type = 'view'").select("user_id").distinct().collect()}
        # KMV standard error ~ 1/sqrt(k-2) ~ 12.7% at k=64; allow 3 sigma
        for est, truth in [
            (row.est_click, len(click)),
            (row.est_view, len(view)),
            (row.est_union, len(click | view)),
        ]:
            assert abs(est - truth) <= max(0.4 * truth, 5), (est, truth)
        # inclusion-exclusion identities hold exactly on the estimates
        assert row.est_intersect == round(max(row.est_click + row.est_view - row.est_union, 0))
        assert row.est_click_only == max(row.est_click - row.est_intersect, 0)


class TestHdrHistogram:
    def test_buckets_bound_relative_error_and_partition_values(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = QUERIES["agg_hdr_histogram"](spark, sf_dir).collect()
        li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
        assert sum(r.n for r in rows) == li.count()
        for r in rows:
            assert r.lo <= r.hi
            if r.lo >= 8:  # log-linear zone: bounded relative width
                assert (r.hi - r.lo) / r.lo <= 1.0 / 8 + 1e-9
        # buckets are disjoint: ranges never overlap when sorted
        spans = sorted((r.lo, r.hi) for r in rows)
        assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


class TestTimeEmbargoSplit:
    def test_partition_counts_and_embargo_gap(self, spark, sf_dir):
        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = {r.part: r for r in QUERIES["split_time_embargo"](spark, sf_dir).collect()}
        total = load_table(spark, sf_dir, "events").count()
        assert set(rows) == {"train", "embargo", "test"}
        assert sum(r.n_rows for r in rows.values()) == total
        assert rows["embargo"].n_rows > 0  # the gap really drops rows


class TestLorenzCurve:
    def test_monotone_convex_and_terminal_one(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES

        rows = sorted(
            QUERIES["agg_lorenz_curve"](spark, sf_dir).collect(),
            key=lambda r: r.decile,
        )
        assert [r.decile for r in rows] == list(range(1, 11))
        shares = [r.cum_share for r in rows]
        assert all(a <= b for a, b in zip(shares, shares[1:]))  # monotone
        assert abs(shares[-1] - 1.0) < 1e-9  # all spend covered
        # Lorenz curve lies under the diagonal (sorted ascending)
        for r in rows[:-1]:
            assert r.cum_share <= r.decile / 10 + 1e-9


class TestPercentileTwoPass:
    def test_bitwise_equal_to_buffering_percentile(self, spark, sf_dir):
        """The r12 two-pass rewrite must reproduce Spark's buffering
        Percentile aggregate BIT-FOR-BIT (same interpolation formula:
        position = p*(n-1), (higher-position)*lower + (position-lower)
        *higher), or the driver's oracle hash changes."""
        import struct

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table

        li = load_table(spark, sf_dir, "lineitem")
        price = F.col("l_extendedprice").cast("double")
        old = {
            r.l_returnflag: r
            for r in li.groupBy("l_returnflag")
            .agg(
                F.round(F.percentile(price, 0.5), 9).alias("median_price"),
                F.round(F.percentile(price, 0.95), 9).alias("p95_price"),
                F.min(price).alias("min_price"),
                F.max(price).alias("max_price"),
            )
            .collect()
        }
        new = {
            r.l_returnflag: r
            for r in registry.QUERIES["agg_percentile"](spark, sf_dir).collect()
        }
        assert set(old) == set(new) and len(old) > 0
        for k in old:
            for c in ("median_price", "p95_price", "min_price", "max_price"):
                a, b = getattr(old[k], c), getattr(new[k], c)
                assert struct.pack("<d", a) == struct.pack("<d", b), (
                    f"{k}.{c}: {a!r} != {b!r}"
                )

    def test_null_group_key_matches_buffering_percentile(self, spark, tmp_path):
        """eqNullSafe joins (ADVICE r12): a NULL l_returnflag group must
        get REAL percentiles — exactly what the buffering F.percentile
        aggregate computed for it — not NULL stats from a silently
        dropped join key.  Also covers the all-NULL-price group (NULL
        everywhere) alongside a normal group."""
        import struct

        from pyspark.sql import functions as F

        rows = (
            [("A", float(v)) for v in (3, 1, 4, 1, 5)]
            + [(None, float(v)) for v in (10, 20, 30, 40)]
            + [("B", None), ("B", None)]
        )
        spark.createDataFrame(
            rows, "l_returnflag string, l_extendedprice double"
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

        price = F.col("l_extendedprice").cast("double")
        old = {
            r.l_returnflag: r
            for r in spark.read.parquet(str(tmp_path / "lineitem.parquet"))
            .groupBy("l_returnflag")
            .agg(
                F.round(F.percentile(price, 0.5), 9).alias("median_price"),
                F.round(F.percentile(price, 0.95), 9).alias("p95_price"),
                F.min(price).alias("min_price"),
                F.max(price).alias("max_price"),
            )
            .collect()
        }
        new = {
            r.l_returnflag: r
            for r in registry.QUERIES["agg_percentile"](
                spark, str(tmp_path)
            ).collect()
        }
        assert set(old) == set(new) == {"A", "B", None}
        for k in old:
            for c in ("median_price", "p95_price", "min_price", "max_price"):
                a, b = getattr(old[k], c), getattr(new[k], c)
                if a is None or b is None:
                    assert a is None and b is None, f"{k}.{c}: {a!r} != {b!r}"
                else:
                    assert struct.pack("<d", a) == struct.pack("<d", b), (
                        f"{k}.{c}: {a!r} != {b!r}"
                    )
