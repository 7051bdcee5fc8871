"""Property-based tests (hypothesis) for the custom operators —
SURVEY.md §5.2.3.  Spark jobs are slow, so examples are few but each
covers a whole generated dataset; shrinking still isolates minimal
failing inputs."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=1000)
VAL = st.integers(min_value=-100, max_value=100)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


class TestAsofProperty:
    @_slow
    @given(
        left=st.lists(st.tuples(KEYS, TS), min_size=1, max_size=30),
        right=st.lists(st.tuples(KEYS, TS, VAL), min_size=1, max_size=30),
    )
    def test_asof_matches_bruteforce(self, spark, left, right):
        from psvm_spark.operators.asof import asof_join

        # dedup right on (key, ts) — the operator documents arbitrary
        # tie-pick among equal timestamps, so make the answer unique.
        right = list({(k, t): (k, t, v) for k, t, v in right}.values())
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
        )
        rdf = spark.createDataFrame(right, "rk long, rts long, val long")
        out = asof_join(ldf, rdf, ["k"], ["rk"], "ts", "rts", "val", "matched").toPandas()
        rpd = pd.DataFrame(right, columns=["rk", "rts", "val"])
        for _, row in out.iterrows():
            cand = rpd[(rpd.rk == row.k) & (rpd.rts <= row.ts)]
            expected = (
                cand.sort_values("rts").iloc[-1].val if len(cand) else None
            )
            got = None if pd.isna(row.matched) else row.matched
            assert got == expected, (row.k, row.ts, got, expected)

    @_slow
    @given(rows=st.lists(st.tuples(KEYS, VAL), min_size=1, max_size=50))
    def test_salted_groupby_equals_plain(self, spark, rows):
        from psvm_spark.operators.salt import salted_groupby

        df = spark.createDataFrame(rows, "k long, v long")
        plain = {
            (r.k): (r.s, r.c)
            for r in df.groupBy("k")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        }
        salted = {
            (r.k): (r.s, r.c)
            for r in salted_groupby(
                df,
                ["k"],
                partial_aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
                final_aggs=[F.sum("ps").alias("s"), F.sum("pc").alias("c")],
                n_buckets=4,
            ).collect()
        }
        assert plain == salted

    @_slow
    @given(rows=st.lists(st.tuples(KEYS, TS, VAL), min_size=1, max_size=40))
    def test_window_total_equals_group_total(self, spark, rows):
        """Unbounded running sum's last row per key == group sum."""
        from pyspark.sql import Window

        # unique ts per key so "last row" is well-defined
        rows = list({(k, t): (k, t, v) for k, t, v in rows}.values())
        df = spark.createDataFrame(rows, "k long, ts long, v long")
        w = (
            Window.partitionBy("k")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = df.withColumn("rs", F.sum("v").over(w))
        last = (
            run.withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("k").orderBy(F.col("ts").desc())),
            )
            .filter(F.col("rn") == 1)
            .select("k", "rs")
        )
        grp = df.groupBy("k").agg(F.sum("v").alias("s"))
        a = {r.k: r.rs for r in last.collect()}
        b = {r.k: r.s for r in grp.collect()}
        assert a == b


class TestComponentsProperty:
    @_slow
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=20),
                st.integers(min_value=0, max_value=20),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_components_match_union_find(self, spark, edges):
        from psvm_spark.operators.components import connected_components

        edf = spark.createDataFrame(edges, "a long, b long")
        got = {
            r.v: r.component
            for r in connected_components(edf, max_iter=50, driver_threshold=0).collect()
        }
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        clusters = {}
        for v in parent:
            clusters.setdefault(find(v), set()).add(v)
        expected = {v: min(members) for root, members in clusters.items() for v in members}
        assert got == expected
