"""Round-6 analytics additions: Holt linear smoothing."""

from psvm_spark import registry

registry.load_all()


class TestHoltLinear:
    def test_matches_python_reference_fold(self, spark, sf_dir):
        """Level/trend must equal a plain Python Holt fold over the same
        (ts, event_id)-ordered series (alpha=0.5, beta=0.25)."""
        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        out = {
            r.user_id: r
            for r in QUERIES["ts_holt_linear"](spark, sf_dir).collect()
        }
        ev = (
            load_table(spark, sf_dir, "events")
            .select("user_id", "ts", "event_id", "value")
            .collect()
        )
        series = {}
        for r in ev:
            series.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
        for uid, rows in series.items():
            vals = [float(v) for _, _, v in sorted(rows)]
            l, t = vals[0], 0.0
            for x in vals[1:]:
                nl = 0.5 * x + 0.5 * (l + t)
                t = 0.25 * (nl - l) + 0.75 * t
                l = nl
            got = out[uid]
            assert got.n_events == len(vals)
            assert abs(got.level - round(l, 9)) < 1e-12, uid
            assert abs(got.trend - round(t, 9)) < 1e-12, uid
            assert abs(got.forecast1 - round(l + t, 9)) < 1e-12, uid


class TestKCore:
    def test_core_property_holds(self, spark, sf_dir):
        """Every vertex reported in the 3-core has core-internal degree
        >= 3, and the core is a fixpoint: recomputing degrees over the
        reported vertex set changes nothing."""
        from psvm_spark.queries.graph import _KCORE_K, edge_set

        rows = registry.QUERIES["graph_kcore"](spark, sf_dir).collect()
        core = {r.vertex: r.core_degree for r in rows}
        assert all(d >= _KCORE_K for d in core.values())
        edges = [
            (r.a, r.b)
            for r in edge_set(spark, sf_dir).collect()
            if r.a in core and r.b in core
        ]
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        assert deg == core


class TestRandomWalks:
    def test_walks_are_valid_paths(self, spark, sf_dir):
        """Every consecutive (step i -> i+1) pair in a walk must be an
        actual edge, every seed produces a full-length walk, and the
        corpus is deterministic across invocations."""
        from psvm_spark.queries.graph import _WALK_LEN, edge_set

        rows = registry.QUERIES["graph_random_walks"](spark, sf_dir).collect()
        edges = set()
        for r in edge_set(spark, sf_dir).collect():
            edges.add((r.a, r.b))
            edges.add((r.b, r.a))
        walks = {}
        for r in rows:
            walks.setdefault(r.seed, {})[r.step] = r.vertex
        assert walks, "no walks produced"
        for seed, path in walks.items():
            assert sorted(path) == list(range(_WALK_LEN + 1)), seed
            assert path[0] == seed
            for i in range(_WALK_LEN):
                assert (path[i], path[i + 1]) in edges, (seed, i)
        rows2 = registry.QUERIES["graph_random_walks"](spark, sf_dir).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


class TestChangepoint:
    def test_matches_bruteforce(self, spark, sf_dir):
        """The reported split must equal an independent Python scan over
        all month boundaries, and its gain must be the global max
        (ties to the earliest month)."""
        from psvm_spark import registry

        row = registry.QUERIES["ts_changepoint_sse"](spark, sf_dir).collect()[0]
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        from pyspark.sql import functions as F

        monthly = sorted(
            (r.ym, r.y)
            for r in o.groupBy(
                (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("int")
                .alias("ym")
            )
            .agg(
                F.sum(
                    F.expr(
                        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
                    )
                ).alias("y")
            )
            .collect()
        )
        ys = [y for _, y in monthly]
        tot, n = sum(ys), len(ys)
        best = None
        cum = 0
        for i in range(n - 1):
            cum += ys[i]
            gain = (
                cum * cum / (i + 1)
                + (tot - cum) * (tot - cum) / (n - i - 1)
                - tot * tot / n
            )
            if best is None or gain > best[1]:
                best = (monthly[i][0], gain, i + 1)
        assert row.split_after_ym == best[0]
        assert row.n_left == best[2]
        assert row.n_right == n - best[2]
        assert row.gain >= 0


class TestTheilSen:
    def test_matches_numpy_lower_median_of_slopes(self, spark, sf_dir):
        import numpy as np

        from psvm_spark.catalog import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, sf_dir, "lineitem")
        p = load_table(spark, sf_dir, "part")
        monthly = (
            li.join(p, li.l_partkey == p.p_partkey)
            .groupBy(
                "p_brand",
                ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate") - 1).alias("x"),
            )
            .agg(
                F.sum((F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint")).alias("y")
            )
            .collect()
        )
        series: dict[str, list[tuple[int, int]]] = {}
        for r in monthly:
            series.setdefault(r.p_brand, []).append((int(r.x), int(r.y)))
        want = {}
        for brand, pts in series.items():
            pts.sort()
            slopes = [
                ((y2 - y1) / (x2 - x1), x1, x2)
                for i, (x1, y1) in enumerate(pts)
                for (x2, y2) in pts[i + 1 :]
            ]
            slopes.sort()
            want[brand] = (len(slopes), slopes[(len(slopes) + 1) // 2 - 1][0])
        got = {
            r.p_brand: (r.n_pairs, r.ts_slope_cents_per_month)
            for r in registry.QUERIES["ts_theil_sen"](spark, sf_dir).collect()
        }
        assert got.keys() == want.keys()
        for brand in want:
            assert got[brand][0] == want[brand][0], brand
            assert got[brand][1] == want[brand][1], brand


class TestWelchT2:
    def test_matches_numpy_welch(self, spark, sf_dir):
        import numpy as np

        from psvm_spark.catalog import load_table
        from pyspark.sql import functions as F

        rows = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
            .select(
                "o_orderpriority",
                (F.col("o_totalprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .collect()
        )
        a = np.array([r.cents for r in rows if r.o_orderpriority == "1-URGENT"], dtype=np.float64)
        b = np.array([r.cents for r in rows if r.o_orderpriority == "5-LOW"], dtype=np.float64)
        v1, v2 = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t2 = (a.mean() - b.mean()) ** 2 / (v1 + v2)
        df = (v1 + v2) ** 2 / (v1**2 / (len(a) - 1) + v2**2 / (len(b) - 1))
        got = registry.QUERIES["ab_test_welch_t2"](spark, sf_dir).collect()[0]
        assert got.n1 == len(a) and got.n2 == len(b)
        assert abs(got.t2 - t2) < 1e-6 * max(1.0, abs(t2))
        assert abs(got.df_welch - df) < 1e-6 * df
        assert abs(got.mean_diff_cents - (a.mean() - b.mean())) < 1e-6 * max(
            1.0, abs(a.mean() - b.mean())
        )


class TestPeriodogram:
    def test_matches_numpy_dft_power(self, spark, sf_dir):
        """Fixed-point DFT accumulators must equal a NumPy replay with
        the same quantized trig weights, and power must approximate the
        true float DFT power to fixed-point precision."""
        import numpy as np

        from psvm_spark.catalog import load_table
        from psvm_spark.queries.analytics import (
            _PGRAM_COS,
            _PGRAM_FP,
            _PGRAM_N,
            _PGRAM_SIN,
        )
        from pyspark.sql import functions as F

        m = (
            load_table(spark, sf_dir, "orders")
            .groupBy(
                ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1).alias("t")
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
                ).alias("y")
            )
            .collect()
        )
        y = np.zeros(_PGRAM_N, dtype=np.int64)
        for r in m:
            if 0 <= r.t < _PGRAM_N:
                y[r.t] = r.y
        got = {
            r.k: (r.c_fp, r.s_fp, r.power)
            for r in registry.QUERIES["ts_periodogram"](spark, sf_dir).collect()
        }
        for ki, k in enumerate(range(1, 7)):
            c = int((y * np.array(_PGRAM_COS[ki], dtype=np.int64)).sum())
            s = int((y * np.array(_PGRAM_SIN[ki], dtype=np.int64)).sum())
            assert got[k][0] == c and got[k][1] == s, k
            t = np.arange(_PGRAM_N)
            ct = float((y * np.cos(2 * np.pi * k * t / _PGRAM_N)).sum())
            st = float((y * np.sin(2 * np.pi * k * t / _PGRAM_N)).sum())
            true_p = ct * ct + st * st
            # quantized weights: relative error ~1e-4 on each accumulator
            assert abs(got[k][2] - true_p) < 1e-3 * max(true_p, 1.0) + 1e6, k


class TestKaplanMeier:
    def test_matches_direct_km_and_monotone(self, spark, sf_dir):
        """Replay KM from the raw (duration, event) pairs in Python and
        compare; survival must be non-increasing in t and within (0, 1]."""
        from collections import Counter

        from psvm_spark.catalog import load_table
        from pyspark.sql import functions as F

        month = ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1).cast("int")
        cust = (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.min(month).alias("t0"), F.max(month).alias("t1"))
            .collect()
        )
        m = max(r.t1 for r in cust)
        durs = [
            ((r.t1 - r.t0) if r.t1 < m else (m - r.t0), 1 if r.t1 < m else 0)
            for r in cust
        ]
        d_at = Counter(d for d, e in durs if e)
        n_all = Counter(d for d, _ in durs)
        want = {}
        s = 1.0
        n_total = len(durs)
        seen = 0
        for t in sorted(n_all):
            n_risk = n_total - seen
            if t in d_at:
                s = s * (1.0 - d_at[t] / n_risk)
                want[t] = (n_risk, d_at[t], d_at[t] * 10**9 // n_risk, s)
            seen += n_all[t]
        got = {
            r.t: (r.n_risk, r.d_events, r.hazard_fp, r.survival)
            for r in registry.QUERIES["ml_survival_km"](spark, sf_dir).collect()
        }
        assert got.keys() == want.keys()
        for t in want:
            assert got[t][:3] == want[t][:3], t
            assert abs(got[t][3] - want[t][3]) < 1e-12, t
        surv = [got[t][3] for t in sorted(got)]
        # S hits exactly 0 when the final event time exhausts the risk set
        assert all(0 <= s <= 1 for s in surv)
        assert surv == sorted(surv, reverse=True)


class TestPointInPolygon:
    def test_planted_points_including_concave_notch(self, spark, sf_dir):
        """Known inside/outside points for each fence — including the
        concave L's notch, which a bbox test would get wrong — replayed
        through the exact Spark crossing predicate."""
        from psvm_spark.queries.analytics import _PIP_POLYS, _pip_edges
        from pyspark.sql import functions as F

        cases = [
            # (px, py, poly_id, inside?)
            (-8000, -2000, 1, True),
            (-2000, -2000, 1, False),
            (4000, 3000, 2, True),
            (4000, 8000, 2, False),
            (14000, -6000, 3, True),   # inside triangle
            (11000, -4000, 3, False),  # in bbox, outside hypotenuse side
            (-16000, 7000, 4, True),   # upper arm of the L
            (-11000, 7000, 4, False),  # the notch: inside bbox, outside L
            (-11000, 4000, 4, True),   # lower arm of the L
        ]
        pts = spark.createDataFrame(
            [(i, px, py, pid) for i, (px, py, pid, _) in enumerate(cases)],
            "id int, px long, py long, poly_id int",
        )
        edges = spark.createDataFrame(
            _pip_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"
        )
        crossing = (
            ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
            & F.when(
                F.col("y2") > F.col("y1"),
                (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
                < (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1")),
            ).otherwise(
                (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
                > (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
            )
        )
        got = {
            r.id: r.nc % 2 == 1
            for r in pts.join(edges, "poly_id")
            .groupBy("id")
            .agg(F.sum(F.when(crossing, 1).otherwise(0)).alias("nc"))
            .collect()
        }
        for i, (_, _, _, want_inside) in enumerate(cases):
            assert got[i] == want_inside, cases[i]
        # and the registered query runs with every polygon populated
        rows = registry.QUERIES["join_point_in_polygon"](spark, sf_dir).collect()
        assert {r.poly_id for r in rows} <= set(_PIP_POLYS)
        assert all(r.n_inside > 0 for r in rows)


class TestGeohashCells:
    def test_geohash_encoding_matches_reference_impl(self, spark, sf_dir):
        # independent reference geohash (classic bisection algorithm)
        # vs the integer-arithmetic SQL encode, via the rollup's
        # deterministic min-subcell witness per 3-char prefix
        import hashlib

        rows = registry.QUERIES["geo_geohash_cells"](spark, sf_dir).collect()
        assert rows
        alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

        def ref_geohash(lat, lon, n_chars=4):
            lat_lo, lat_hi = -90.0, 90.0
            lon_lo, lon_hi = -180.0, 180.0
            bits = []
            even = True
            while len(bits) < 5 * n_chars:
                if even:
                    mid = (lon_lo + lon_hi) / 2
                    if lon >= mid:
                        bits.append(1); lon_lo = mid
                    else:
                        bits.append(0); lon_hi = mid
                else:
                    mid = (lat_lo + lat_hi) / 2
                    if lat >= mid:
                        bits.append(1); lat_lo = mid
                    else:
                        bits.append(0); lat_hi = mid
                even = not even
            return "".join(
                alphabet[int("".join(map(str, bits[i : i + 5])), 2)]
                for i in range(0, len(bits), 5)
            )

        from psvm_spark.catalog import load_table

        cust = load_table(spark, sf_dir, "customer").select("c_custkey").collect()
        seen = {}
        for r in cust:
            k = r.c_custkey
            x = int(hashlib.md5(f"glon:{k}".encode()).hexdigest()[:8], 16) % 36000
            y = int(hashlib.md5(f"glat:{k}".encode()).hexdigest()[:8], 16) % 16000
            gh = ref_geohash(y / 100.0 - 80.0, x / 100.0 - 180.0)
            p = gh[:3]
            seen[p] = min(seen.get(p, "~"), gh)
            seen.setdefault("_n_" + p, 0)
            seen["_n_" + p] = seen["_n_" + p] + 1
        for r in rows:
            assert seen[r.cell3] == r.first_subcell, r.cell3
            assert seen["_n_" + r.cell3] == r.n_customers


class TestLabelPropagation:
    def test_partition_and_determinism(self, spark, sf_dir):
        rows = registry.QUERIES["graph_label_propagation"](spark, sf_dir).collect()
        assert rows
        from psvm_spark.queries.graph import edge_set

        e = edge_set(spark, sf_dir)
        n_nodes = (
            e.selectExpr("a as node").union(e.selectExpr("b as node")).distinct().count()
        )
        # labels partition the vertex set
        assert sum(r.n_members for r in rows) == n_nodes
        # propagation merged at least some singleton communities
        assert len(rows) < n_nodes
        for r in rows:
            assert r.min_member <= r.member_checksum / r.n_members
        # synchronous schedule is deterministic
        again = registry.QUERIES["graph_label_propagation"](spark, sf_dir).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


class TestHoltWintersSeasonal:
    def test_matches_python_replay(self, spark, sf_dir):
        """The executor-side fold must equal a plain-Python replay of
        the additive Holt-Winters recurrence on the same series."""
        from psvm_spark.queries.analytics import _HW_M
        from psvm_spark.registry import QUERIES

        import pyspark.sql.functions as F
        from psvm_spark.catalog import load_table

        rows = {r.segment: r for r in
                QUERIES["ts_holt_winters_seasonal"](spark, sf_dir).collect()}
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        monthly = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(
                F.col("c_mktsegment").alias("seg"),
                ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
                .alias("m"),
            )
            .agg(F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100)
                       .cast("bigint")).cast("double").alias("x"))
            .collect()
        )
        series: dict[str, list] = {}
        for r in monthly:
            series.setdefault(r.seg, []).append((r.m, r.x))
        for seg, pts in series.items():
            xs = [x for _, x in sorted(pts)]
            l, t, sa = xs[0], 0.0, [0.0] * _HW_M
            for i in range(1, len(xs)):
                slot = i % _HW_M
                l_new = 0.5 * (xs[i] - sa[slot]) + 0.5 * (l + t)
                t = 0.25 * (l_new - l) + 0.75 * t
                sa[slot] = 0.5 * (xs[i] - l_new) + 0.5 * sa[slot]
                l = l_new
            got = rows[seg]
            assert got.n_months == len(xs)
            # outputs round to whole cents (magnitude-vs-grid, see query)
            assert abs(got.level - l) <= 0.5
            assert abs(got.trend - t) <= 0.5
            assert abs(got.forecast1 - (l + t + sa[len(xs) % _HW_M])) <= 0.5


class TestDecomposeClassical:
    def test_additive_identity_and_window_trim(self, spark, sf_dir):
        """x = trend + seasonal + residual EXACTLY (integer cents), and
        the CMA trims 6 months at each end of the series."""
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = QUERIES["ts_decompose_classical"](spark, sf_dir).collect()
        for r in rows:
            assert r.x_c == r.trend_c + r.seasonal_c + r.residual_c
        n_months = (
            load_table(spark, sf_dir, "orders")
            .select(
                ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
                .alias("m")
            )
            .distinct()
            .count()
        )
        assert len(rows) == n_months - 12


class TestEsdOutliers:
    def test_rounds_remove_distinct_months_with_decreasing_validity(self, spark, sf_dir):
        """K rounds remove K distinct months; each round's pick is the
        max-|z| point among the then-remaining series (replayed here
        independently)."""
        import math

        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = sorted(
            QUERIES["ts_esd_outliers"](spark, sf_dir).collect(),
            key=lambda r: r.round,
        )
        assert [r.round for r in rows] == [1, 2, 3, 4, 5]
        assert len({r.m for r in rows}) == 5
        pts = {
            r.m: r.x
            for r in load_table(spark, sf_dir, "orders")
            .groupBy(
                ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
                .cast("int")
                .alias("m")
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
                ).cast("bigint").alias("x")
            )
            .collect()
        }
        removed = set()
        for r in rows:
            rem = [(m, x) for m, x in sorted(pts.items()) if m not in removed]
            n = len(rem)
            s = sum(x for _, x in rem)
            s2 = sum(x * x for _, x in rem)
            mu = float(s) / n
            sd = math.sqrt((float(s2) - float(s) * float(s) / n) / (n - 1))
            z, m_pick, x_pick = max(
                ((round(abs(float(x) - mu) / sd, 9), m, x) for m, x in rem),
                key=lambda t: (t[0], -t[1]),
            )
            assert (r.m, r.x_c, r.z) == (m_pick, x_pick, z), r.round
            removed.add(m_pick)


class TestDtwDistance:
    def test_dtw_leq_l1_and_symmetric_pairs(self, spark, sf_dir):
        """DTW with free alignment can never exceed the aligned L1 cost,
        and every unordered region pair appears exactly once."""
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = QUERIES["ts_dtw_distance"](spark, sf_dir).collect()
        regions = [r.r_name for r in load_table(spark, sf_dir, "region").collect()]
        assert len(rows) == len(regions) * (len(regions) - 1) // 2
        assert all(r.r1 < r.r2 for r in rows)
        # aligned L1 replay for one pair
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation")
        rg = load_table(spark, sf_dir, "region")
        t = (
            o.join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .join(rg, n.n_regionkey == rg.r_regionkey)
            .groupBy(
                F.col("r_name").alias("rn"),
                ((F.year("o_orderdate") - 1992) * 4
                 + F.expr("(month(o_orderdate) - 1) div 3")).cast("int").alias("q"),
            )
            .agg(F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100)
                       .cast("bigint")).alias("x"))
        ).collect()
        for row in rows:
            sa = {r.q: int(r.x) for r in t if r.rn == row.r1}
            sb = {r.q: int(r.x) for r in t if r.rn == row.r2}
            l1 = sum(abs(sa.get(q, 0) - sb.get(q, 0)) for q in range(27))
            assert 0 < row.dtw_c <= l1


class TestKalmanFilter:
    def test_state_tracks_series_scale_and_gain_converges(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = QUERIES["ts_kalman_filter"](spark, sf_dir).collect()
        assert len(rows) == 5  # market segments
        # steady-state gain for P' = (1-K)(P+Q), K = (P+Q)/(P+Q+R) is the
        # positive root of P^2 + PQ = QR: P* ~ 731k -> K* ~ 0.246
        for r in rows:
            assert 0 < r.gain_fp < 1_000_000
            assert abs(r.gain_fp - 246_500) < 4_000  # converged to steady state
            assert r.p_var > 0
        # final state within the observed series envelope per segment
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        monthly = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(
                F.col("c_mktsegment").alias("seg"),
                ((F.year("o_orderdate") - 1995) * 12
                 + F.month("o_orderdate") - 1).alias("m"),
            )
            .agg(F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100)
                       .cast("bigint")).alias("z"))
        ).collect()
        for r in rows:
            zs = [int(x.z) for x in monthly if x.seg == r.segment]
            assert min(zs) <= r.m_c <= max(zs)


class TestHaarWavelet:
    def test_energy_conservation_and_cascade_shape(self, spark, sf_dir):
        """Unnormalized Haar: 2*||a_l||^2 = ||s_l||^2 + ||d_l||^2 per
        level, so the cascade is replayable from the monthly series."""
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = sorted(
            QUERIES["ts_haar_wavelet"](spark, sf_dir).collect(),
            key=lambda r: r.level,
        )
        assert [r.level for r in rows] == [1, 2, 3, 4, 5, 6]
        assert [r.n_coeffs for r in rows] == [32, 16, 8, 4, 2, 1]
        monthly = {
            r.m: int(r.x)
            for r in load_table(spark, sf_dir, "orders")
            .groupBy(
                ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
                .cast("int").alias("m")
            )
            .agg(F.expr(
                "sum(cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint))"
                " div 10000").alias("x"))
            .collect()
        }
        a = [monthly.get(m, 0) for m in range(64)]
        for r in rows:
            s = [a[2 * i] + a[2 * i + 1] for i in range(len(a) // 2)]
            d = [a[2 * i] - a[2 * i + 1] for i in range(len(a) // 2)]
            assert r.energy == sum(v * v for v in d)
            assert 2 * sum(v * v for v in a) == sum(v * v for v in s) + r.energy
            assert r.first_approx == s[0]
            a = s


class TestSprt:
    def test_llr_is_exact_cumsum_and_decision_consistent(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.queries.analytics import _SPRT_A, _SPRT_B, _SPRT_UP
        from psvm_spark.registry import QUERIES

        rows = {r.arm: r for r in QUERIES["ab_test_sprt"](spark, sf_dir).collect()}
        assert set(rows) == {0, 1}
        ev = (
            load_table(spark, sf_dir, "events")
            .select(
                (F.col("user_id") % 2).cast("int").alias("arm"),
                (F.col("event_type") == "purchase").cast("int").alias("y"),
                "event_id",
            )
            .collect()
        )
        for arm in (0, 1):
            stream = sorted((r.event_id, r.y) for r in ev if r.arm == arm)
            k = 0
            hit = None
            for n, (_, y) in enumerate(stream, start=1):
                k += y
                llr = _SPRT_A * k + _SPRT_B * (n - k)
                if abs(llr) >= _SPRT_UP:
                    hit = (n, k, llr)
                    break
            r = rows[arm]
            if hit:
                assert (r.n_dec, r.k_dec, r.llr_fp) == hit
                assert r.decision == ("accept_h1" if hit[2] >= _SPRT_UP else "accept_h0")
            else:
                assert r.decision == "continue" and r.n_dec == len(stream)


class TestEwmaIrregular:
    def test_fold_replay_and_decay_semantics(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        out = {r.user_id: r for r in
               QUERIES["ts_ewma_irregular"](spark, sf_dir).collect()}
        ev = (
            load_table(spark, sf_dir, "events")
            .select("user_id", F.col("ts").cast("bigint").alias("t"), "value")
            .collect()
        )
        by_user = {}
        for r in ev:
            by_user.setdefault(r.user_id, []).append((r.t, r.value))
        assert set(out) == set(by_user)
        for uid, sv in sorted(by_user.items())[:20]:
            sv.sort()
            m = sv[0][1]
            prev = sv[0][0]
            for t, v in sv[1:]:
                k = (t - prev) // 3600
                w = 0.0 if k > 62 else 1.0 / (1 << k)
                m = v + (m - v) * w
                prev = t
            assert out[uid].n_events == len(sv)
            assert out[uid].ewma == round(m, 9), uid


class TestCroston:
    def test_fold_replay_on_one_brand(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        out = {r.brand: r for r in
               QUERIES["ts_croston_intermittent"](spark, sf_dir).collect()}
        li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 50 == 7)
        p = load_table(spark, sf_dir, "part")
        wk = (
            li.join(p, li.l_partkey == p.p_partkey)
            .groupBy(
                F.col("p_brand").alias("brand"),
                F.expr("datediff(l_shipdate, date '1992-01-01') div 7")
                .cast("int").alias("w"),
            )
            .agg(F.sum(F.col("l_quantity").cast("int")).alias("z"))
            .collect()
        )
        brand = sorted(out)[0]
        zmap = {r.w: int(r.z) for r in wk if r.brand == brand}
        sz = iv = None
        gap = nd = 0
        for w in range(340):
            z = zmap.get(w, 0)
            if z == 0:
                gap += 1
                continue
            sz = z * 10**6 if sz is None else (z * 10**6 + sz) // 2
            iv = (gap + 1) * 10**6 if iv is None else ((gap + 1) * 10**6 + iv) // 2
            gap, nd = 0, nd + 1
        r = out[brand]
        assert (r.n_demand, r.size_fp, r.interval_fp) == (nd, sz, iv)
        assert r.forecast_fp == (sz * 10**6) // iv


class TestSaxSymbols:
    def test_symbols_quartile_balanced_and_replayable(self, spark, sf_dir):
        from collections import Counter

        from psvm_spark.registry import QUERIES

        rows = QUERIES["ts_sax_symbols"](spark, sf_dir).collect()
        assert len(rows) == 25  # nations
        for r in rows:
            assert r.n_segments == 21 and len(r.sax) == 21
            c = Counter(r.sax)
            assert set(c) <= set("abcd")
            # quartile breakpoints put >= floor(n/4) in the lowest band
            assert c["a"] >= 5


class TestCuped:
    def test_adjustment_preserves_grand_mean_and_reduces_nothing_biased(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES

        rows = {r.arm: r for r in QUERIES["ab_test_cuped"](spark, sf_dir).collect()}
        assert set(rows) == {0, 1}
        # the adjustment is mean-zero when weighted by arm sizes:
        # sum_a n_a * (mean_adj - mean_y) == -theta * sum_a n_a * (x_a - x_bar) == 0
        tot = sum(r.n_users for r in rows.values())
        shift = sum(r.n_users * (r.mean_adj - r.mean_y) for r in rows.values()) / tot
        assert abs(shift) < 1e-6
        assert rows[0].theta == rows[1].theta


class TestDiffInDiff:
    def test_did_matches_cell_means(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES

        rows = QUERIES["ab_test_diff_in_diff"](spark, sf_dir).collect()
        cells = {(r.arm, r.post): r.mean_v for r in rows}
        assert len(cells) == 4
        expect = round(
            (cells[(1, 1)] - cells[(1, 0)]) - (cells[(0, 1)] - cells[(0, 0)]), 9
        )
        assert all(abs(r.did - expect) < 2e-9 for r in rows)


class TestBollingerBands:
    def test_bands_bracket_mid_and_replay_on_one_nation(self, spark, sf_dir):
        import math

        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = QUERIES["ts_bollinger_bands"](spark, sf_dir).collect()
        assert all(r.lower <= r.mid <= r.upper for r in rows)
        nat = sorted({r.nat for r in rows})[0]
        series = {
            x.m: int(x.x)
            for x in load_table(spark, sf_dir, "orders")
            .join(load_table(spark, sf_dir, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(load_table(spark, sf_dir, "nation"),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .filter(F.col("n_name") == nat)
            .groupBy(((F.year("o_orderdate") - 1992) * 12
                      + F.month("o_orderdate") - 1).cast("int").alias("m"))
            .agg(F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100)
                       .cast("bigint")).alias("x"))
            .collect()
        }
        ms = sorted(series)
        got = {r.m: r for r in rows if r.nat == nat}
        for i in range(11, len(ms)):
            win = [series[m] for m in ms[i - 11 : i + 1]]
            s, s2, n = sum(win), sum(v * v for v in win), 12
            mid = s / n
            sd = math.sqrt((s2 - s / n * s) / (n - 1))
            r = got[ms[i]]
            assert r.mid == round(mid, 0)
            assert r.upper == round(mid + 2 * sd, 0)


class TestControlRules:
    def test_rule_counts_replay_on_one_nation(self, spark, sf_dir):
        import math

        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        out = {r.nat: r for r in QUERIES["ts_control_rules"](spark, sf_dir).collect()}
        monthly = (
            load_table(spark, sf_dir, "orders")
            .join(load_table(spark, sf_dir, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(load_table(spark, sf_dir, "nation"),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nat"),
                     ((F.year("o_orderdate") - 1992) * 12
                      + F.month("o_orderdate") - 1).cast("int").alias("m"))
            .agg(F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100)
                       .cast("bigint")).alias("x"))
            .collect()
        )
        nat = sorted(out)[0]
        xs = [int(r.x) for r in sorted(
            (r for r in monthly if r.nat == nat), key=lambda r: r.m)]
        n = len(xs)
        mu = sum(xs) / n
        sg = math.sqrt((sum(v * v for v in xs) - sum(xs) / n * sum(xs)) / n)
        r1 = sum(1 for v in xs if v > mu + 3 * sg or v < mu - 3 * sg)
        z2 = [1 if v > mu + 2 * sg else -1 if v < mu - 2 * sg else 0 for v in xs]
        r2 = sum(
            1 for i, z in enumerate(z2)
            if z != 0 and i >= 1 and (z2[i-1] == z or (i >= 2 and z2[i-2] == z))
        )
        side = [1 if v > mu else -1 for v in xs]
        r4 = sum(
            1 for i in range(7, n) if all(side[i-j] == side[i] for j in range(1, 8))
        )
        got = out[nat]
        assert (got.n_rule1, got.n_rule4) == (r1, r4)
        assert got.n_rule2 == r2


class TestPathTrigrams:
    def test_counts_replay(self, spark, sf_dir):
        from collections import Counter

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        rows = QUERIES["seq_path_trigrams"](spark, sf_dir).collect()
        assert 0 < len(rows) <= 20
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"
        ).collect()
        by_user = {}
        for r in ev:
            by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
        c = Counter()
        for sv in by_user.values():
            sv.sort()
            for i in range(2, len(sv)):
                c[f"{sv[i-2][2]}>{sv[i-1][2]}>{sv[i][2]}"] += 1
        expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert [(r.path, r.n) for r in rows] == expect or \
               sorted((r.path, r.n) for r in rows) == sorted(expect)


class TestLjungBox:
    def test_q_matches_numpy_acf(self, spark, sf_dir):
        """Q recomputed from the raw monthly series with numpy must
        match the engine's decimal-exact pipeline to float tolerance."""
        import numpy as np

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_ljung_box"](spark, sf_dir).collect()[0]
        o = load_table(spark, sf_dir, "orders")
        monthly = (
            o.groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                        "bigint"
                    )
                ).alias("v")
            )
            .orderBy("mo")
            .collect()
        )
        x = np.array([float(r.v) for r in monthly])
        n = len(x)
        xc = x - x.mean()
        den = (xc * xc).sum()
        q = 0.0
        for k in range(1, 7):
            rho = (xc[:-k] * xc[k:]).sum() / den
            q += rho * rho / (n - k)
        q *= n * (n + 2)
        assert row.n_months == n
        assert abs(row.q_stat - q) < 1e-4


class TestGrangerLag1:
    def test_f_matches_numpy_ols(self, spark, sf_dir):
        import numpy as np

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_granger_lag1"](spark, sf_dir).collect()[0]
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("view", "purchase"))
            .select(
                (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
                .cast("bigint")
                .alias("h"),
                "event_type",
            )
            .collect()
        )
        import collections

        cx, cy = collections.Counter(), collections.Counter()
        for r in ev:
            (cx if r.event_type == "view" else cy)[r.h] += 1
        h0 = min(min(cx), min(cy))
        h1 = max(max(cx), max(cy))
        hours = list(range(h0, h1 + 1))
        x = np.array([cx.get(h, 0) for h in hours], dtype=float)
        y = np.array([cy.get(h, 0) for h in hours], dtype=float)
        yy, u, v = y[1:], y[:-1], x[:-1]
        n = len(yy)

        def sse(X):
            b, res, *_ = np.linalg.lstsq(X, yy, rcond=None)
            r = yy - X @ b
            return float(r @ r)

        one = np.ones(n)
        sse_r = sse(np.column_stack([one, u]))
        sse_u = sse(np.column_stack([one, u, v]))
        f = (sse_r - sse_u) / (sse_u / (n - 3))
        assert row.n_pairs == n
        # sse_r/sse_u are reported rounded to WHOLE units (unbounded
        # sums of squared counts — the documented round-9 trap, ADVICE
        # r9); f_stat stays at 9 dp
        assert abs(row.sse_r - sse_r) <= 0.5 + 1e-4
        assert abs(row.sse_u - sse_u) <= 0.5 + 1e-4
        assert abs(row.f_stat - f) < 1e-4


class TestPacf:
    def test_durbin_levinson_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_pacf"](spark, sf_dir).collect()[0]
        o = load_table(spark, sf_dir, "orders")
        monthly = (
            o.groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                        "bigint"
                    )
                ).alias("v")
            )
            .orderBy("mo")
            .collect()
        )
        x = np.array([float(r.v) for r in monthly])
        n = len(x)
        xc = x - x.mean()
        den = (xc * xc).sum()
        r = [1.0] + [(xc[:-k] * xc[k:]).sum() / den for k in (1, 2, 3)]
        # Durbin-Levinson
        p11 = r[1]
        p22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
        p21 = r[1] * (1 - p22)
        p33 = (r[3] - p21 * r[2] - p22 * r[1]) / (1 - p21 * r[1] - p22 * r[2])
        assert row.n_months == n
        assert abs(row.pacf1 - p11) < 1e-6
        assert abs(row.pacf2 - p22) < 1e-6
        assert abs(row.pacf3 - p33) < 1e-6


class TestCrossCorrelation:
    def test_ccf_symmetry_and_numpy(self, spark, sf_dir):
        """CCF recomputed with numpy on the same dense spine; lag 0 must
        equal the plain Pearson correlation of the two series."""
        import collections

        import numpy as np

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {r.lag_hours: r for r in QUERIES["ts_cross_correlation"](spark, sf_dir).collect()}
        assert set(rows) == {-3, -2, -1, 0, 1, 2, 3}
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin("view", "purchase"))
            .select(
                (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
                .cast("bigint")
                .alias("h"),
                "event_type",
            )
            .collect()
        )
        cx, cy = collections.Counter(), collections.Counter()
        for r in ev:
            (cx if r.event_type == "view" else cy)[r.h] += 1
        h0, h1 = min(min(cx), min(cy)), max(max(cx), max(cy))
        x = np.array([cx.get(h, 0) for h in range(h0, h1 + 1)], dtype=float)
        y = np.array([cy.get(h, 0) for h in range(h0, h1 + 1)], dtype=float)
        for k in (-3, 0, 2):
            if k >= 0:
                a, b = x[: len(x) - k], y[k:]
            else:
                a, b = x[-k:], y[: len(y) + k]
            r = np.corrcoef(a, b)[0, 1]
            assert abs(rows[k].ccf - r) < 1e-6, k


class TestHampelFilter:
    def test_flags_match_python_replay(self, spark, sf_dir):
        """Full python replay of the 7-point rolling median/MAD rule
        over the hourly per-type counts; every flagged point (and its
        med/MAD) must match, and the fixture must actually flag
        something."""
        import collections

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        got = {
            (r.et, r.h): (r.x, r.med, r.mad)
            for r in QUERIES["ts_hampel_filter"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events").select(
            (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
            .cast("bigint")
            .alias("h"),
            "event_type",
        )
        cnt = collections.Counter(
            (r.event_type, r.h) for r in ev.collect()
        )
        series = collections.defaultdict(dict)
        for (et, h), n in cnt.items():
            series[et][h] = n
        want = {}
        for et, by_h in series.items():
            hs = sorted(by_h)
            for i in range(3, len(hs) - 3):
                vals = sorted(by_h[hs[j]] for j in range(i - 3, i + 4))
                med = vals[3]
                mad = sorted(abs(v - med) for v in vals)[3]
                x = by_h[hs[i]]
                if abs(x - med) > 3 * mad:
                    want[(et, hs[i])] = (x, med, mad)
        assert got == want and len(got) > 0


class TestMannKendall:
    def test_statistic_matches_python_replay(self, spark, sf_dir):
        import itertools

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_mann_kendall"](spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events")
        cnt = {
            r.m: r.x
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("m"))
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        }
        xs = [cnt[m] for m in sorted(cnt)]
        n = len(xs)
        s = sum(
            (0 if a == b else (1 if b > a else -1))
            for a, b in itertools.combinations(xs, 2)
        )
        import collections

        t = collections.Counter(xs)
        tt = sum(v * (v - 1) * (2 * v + 5) for v in t.values() if v > 1)
        var18 = n * (n - 1) * (2 * n + 5) - tt
        assert (row.n_days, row.s_stat, row.var18) == (n, s, var18)
        if s != 0:
            z = (s - (1 if s > 0 else -1)) / (var18 / 18) ** 0.5
            assert abs(row.z_stat - z) < 1e-8


class TestKendallTau:
    def test_tau_b_matches_python_replay(self, spark, sf_dir):
        import collections
        import itertools

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ml_kendall_tau"](spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events")
        per_day = {
            r.d: (r.x, r.y)
            for r in ev.filter(F.col("event_type").isin("view", "purchase"))
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(
                F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("x"),
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
            )
            .collect()
        }
        series = [per_day[d] for d in sorted(per_day)]
        nc = nd = 0
        for (xa, ya), (xb, yb) in itertools.combinations(series, 2):
            prod = (xb - xa) * (yb - ya)
            nc += prod > 0
            nd += prod < 0
        n = len(series)
        tx = collections.Counter(x for x, _ in series)
        ty = collections.Counter(y for _, y in series)
        a2 = n * (n - 1) - sum(t * (t - 1) for t in tx.values() if t > 1)
        b2 = n * (n - 1) - sum(t * (t - 1) for t in ty.values() if t > 1)
        assert (row.n_days, row.nc, row.nd) == (n, nc, nd)
        assert abs(row.tau_b - 2 * (nc - nd) / (a2 * b2) ** 0.5) < 1e-8
        assert -1.0 <= row.tau_b <= 1.0


class TestUnitRootDF:
    def test_beta_t_match_numpy_ols(self, spark, sf_dir):
        import numpy as np

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_unit_root_df"](spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events")
        per_day = {
            r.d: r.y
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("y"))
            .collect()
        }
        y = np.array([per_day[d] for d in sorted(per_day)], dtype=float)
        x, dy = y[:-1], np.diff(y)
        m = len(x)
        X = np.column_stack([np.ones(m), x])
        coef, *_ = np.linalg.lstsq(X, dy, rcond=None)
        resid = dy - X @ coef
        sse = float(resid @ resid)
        sxx = float(((x - x.mean()) ** 2).sum())
        se = (sse / (m - 2) / sxx) ** 0.5
        assert row.n_obs == m
        assert abs(row.beta - coef[1]) < 1e-8
        assert abs(row.t_stat - coef[1] / se) < 1e-6


class TestSkipgramPairs:
    def test_counts_match_python_replay(self, spark, sf_dir):
        import collections

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        got = {
            r.pair: (r.n_g1, r.n_g2, r.n_g3, r.n_total)
            for r in QUERIES["seq_skipgram_pairs"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"
        ).collect()
        by_user = collections.defaultdict(list)
        for r in ev:
            by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
        counts = collections.defaultdict(lambda: [0, 0, 0])
        for rows in by_user.values():
            seq = [t for _, _, t in sorted(rows)]
            for i, e in enumerate(seq):
                for gap in (1, 2, 3):
                    if i - gap >= 0:
                        counts[f"{seq[i - gap]}>{e}"][gap - 1] += 1
        ranked = sorted(
            ((sum(v), k) for k, v in counts.items()), key=lambda t: (-t[0], t[1])
        )[:20]
        assert set(got) == {k for _, k in ranked}
        for _, k in ranked:
            g1, g2, g3 = counts[k]
            assert got[k] == (g1, g2, g3, g1 + g2 + g3)


class TestRatioDelta:
    def test_moments_match_python_replay(self, spark, sf_dir):
        import collections

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        got = {
            r.variant: r
            for r in QUERIES["ab_test_ratio_delta"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "event_type", "value"
        ).collect()
        per_user = collections.defaultdict(lambda: [0, 0])
        for r in ev:
            agg = per_user[r.user_id]
            if r.event_type == "purchase":
                agg[0] += round(r.value * 100)
            agg[1] += 1
        by_var = collections.defaultdict(list)
        for uid, (x, n) in per_user.items():
            by_var[uid % 2].append((x, n))
        for variant, rows in by_var.items():
            u = len(rows)
            sx = sum(x for x, _ in rows)
            sn = sum(n for _, n in rows)
            sxx = sum(x * x for x, _ in rows)
            snn = sum(n * n for _, n in rows)
            sxn = sum(x * n for x, n in rows)
            r = sx / sn
            var_x = (u * sxx - sx * sx) / (u * (u - 1))
            cov = (u * sxn - sx * sn) / (u * (u - 1))
            var_n = (u * snn - sn * sn) / (u * (u - 1))
            var_r = (var_x - 2 * r * cov + r * r * var_n) / (u * (sn / u) ** 2)
            row = got[variant]
            assert row.u == u
            assert abs(row.ratio_cents_per_event - r) < 1e-6
            assert abs(row.se - var_r**0.5) < 1e-6
            assert row.se > 0


class TestRollingOriginBacktest:
    def test_mae_matches_python_replay(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        got = {
            r.horizon: r
            for r in QUERIES["ts_rolling_origin_backtest"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        per_day = {
            r.d: r.y
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("y"))
            .collect()
        }
        y = [per_day[d] for d in sorted(per_day)]  # 1-based in the query
        n = len(y)
        for h in (1, 2, 3):
            e_naive, e_snaive, e_drift = [], [], []
            for i in range(1, n + 1):
                t = i - h
                if t < 2:
                    continue
                e_naive.append(abs(y[i - 1] - y[t - 1]))
                if i - 7 >= 1:
                    e_snaive.append(abs(y[i - 1] - y[i - 8]))
                fc = y[t - 1] + h * (y[t - 1] - y[0]) / (t - 1)
                e_drift.append(round(abs(y[i - 1] - fc), 9))
            row = got[h]
            assert row.n_evals == len(e_naive)
            assert row.n_snaive == len(e_snaive)
            assert abs(row.mae_naive - sum(e_naive) / len(e_naive)) < 1e-8
            assert abs(row.mae_snaive - sum(e_snaive) / len(e_snaive)) < 1e-8
            assert abs(row.mae_drift - sum(e_drift) / len(e_drift)) < 1e-8


class TestWeekdayAnova:
    def test_f_matches_numpy_ols(self, spark, sf_dir):
        import collections

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_weekday_anova"](spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events")
        per_day = {
            r.d: r.y
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("y"))
            .collect()
        }
        groups = collections.defaultdict(list)
        for d, y in per_day.items():
            groups[d.isoweekday()].append(y)
        n = sum(len(v) for v in groups.values())
        k = len(groups)
        grand = sum(sum(v) for v in groups.values()) / n
        ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
        ssw = sum(
            sum((y - sum(v) / len(v)) ** 2 for y in v) for v in groups.values()
        )
        assert (row.n_days, row.n_groups) == (n, k)
        assert abs(row.ss_between - ssb) < 1e-5
        assert abs(row.ss_within - ssw) < 1e-5
        assert abs(row.f_stat - (ssb / (k - 1)) / (ssw / (n - k))) < 1e-6


class TestSmaCrossover:
    def test_crossings_alternate_and_match_series(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = QUERIES["ts_sma_crossover"](spark, sf_dir).collect()
        ev = load_table(spark, sf_dir, "events")
        per_day = {
            r.d: r.x
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        }
        days = sorted(per_day)
        xs = [per_day[d] for d in days]
        # replay: full-window SMAs, integer sign compare, emit flips
        expect = {}
        prev_sg = None
        for i in range(6, len(xs)):
            s3, s7 = sum(xs[i - 2 : i + 1]), sum(xs[i - 6 : i + 1])
            sg = 1 if 7 * s3 > 3 * s7 else (-1 if 7 * s3 < 3 * s7 else 0)
            if prev_sg is not None and sg != prev_sg and sg != 0:
                expect[str(days[i])] = "golden" if sg > prev_sg else "death"
            prev_sg = sg
        got = {r.d: r.cross_dir for r in rows}
        assert got == expect
        # a golden cross can only be followed by a death cross and v.v.
        dirs = [got[d] for d in sorted(got)]
        assert all(a != b for a, b in zip(dirs, dirs[1:]))


class TestDbscanCore:
    def test_classes_consistent_with_counts(self, spark, sf_dir):
        from psvm_spark.queries.analytics import _DBSCAN_MINPTS
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = QUERIES["geo_dbscan_core"](spark, sf_dir).collect()
        assert len(rows) > 0
        by_cls = {}
        for r in rows:
            by_cls.setdefault(r.cls, []).append(r)
            if r.cls == "core":
                assert r.n_nb >= _DBSCAN_MINPTS
            else:
                assert r.n_nb < _DBSCAN_MINPTS
        # every point is classified exactly once
        assert sum(len(v) for v in by_cls.values()) == len(rows)
        assert set(by_cls) <= {"core", "border", "noise"}

    def test_grid_conf_changes_density(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        base = QUERIES["geo_dbscan_core"](spark, sf_dir)
        nb_base = base.agg({"n_nb": "sum"}).collect()[0][0]
        spark.conf.set("psvm.geo.dbscan_grid", "96")
        try:
            spread = QUERIES["geo_dbscan_core"](spark, sf_dir)
            nb_spread = spread.agg({"n_nb": "sum"}).collect()[0][0]
        finally:
            spark.conf.unset("psvm.geo.dbscan_grid")
        # 16x the area at the same point count => strictly less neighbor
        # mass (n_nb >= 1 always: the self-pair).  Core counts can tie at
        # zero on the tiny fixture, so density is the robust proxy.
        assert nb_spread < nb_base


class TestSesOptimalAlpha:
    def test_fold_matches_local_replay(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.queries.analytics import _SES_ALPHAS
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {
            r.alpha: r
            for r in QUERIES["ts_ses_optimal_alpha"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        per_day = {
            r.d: r.x
            for r in ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        }
        xs = [float(per_day[d]) for d in sorted(per_day)]
        assert set(rows) == set(_SES_ALPHAS)
        for alpha in _SES_ALPHAS:
            s, sse = xs[0], 0.0
            for x in xs[1:]:
                sse += (x - s) * (x - s)
                s = alpha * x + (1.0 - alpha) * s
            assert rows[alpha].n_days == len(xs)
            assert abs(rows[alpha].sse - sse) < 1e-5
        assert sum(r.is_best for r in rows.values()) >= 1
        best = min(rows.values(), key=lambda r: r.sse)
        assert best.is_best == 1


class TestSeasonalStrength:
    def test_strengths_bounded_and_seasonal_dominates_noise(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_seasonal_strength"](spark, sf_dir).collect()[0]
        assert row.n_months > 12
        assert 0.0 <= row.f_seasonal <= 1.0
        assert 0.0 <= row.f_trend <= 1.0


class TestQuantilePinball:
    def test_monotone_forecasts_and_loss_replay(self, spark, sf_dir):
        import math

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {
            r.q: r for r in QUERIES["ml_quantile_pinball"](spark, sf_dir).collect()
        }
        assert set(rows) == {0.25, 0.5, 0.75}
        ev = load_table(spark, sf_dir, "events")
        per = (
            ev.filter(F.col("event_type") == "purchase")
            .groupBy(
                F.date_trunc("day", "ts").cast("date").alias("d"),
                (F.weekday("ts") + 1).alias("wd"),
            )
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        )
        md = min(r.d for r in per)
        import datetime

        cut = md + datetime.timedelta(days=21)
        train, test = {}, []
        for r in per:
            if r.d < cut:
                train.setdefault(r.wd, []).append((r.x, r.d))
            else:
                test.append((r.wd, r.x))
        assert test, "fixture span must exceed the 21-day train window"
        for q in (0.25, 0.5, 0.75):
            fc = {}
            for wd, vals in train.items():
                vals = sorted(vals)
                k = math.ceil(q * len(vals))
                fc[wd] = vals[k - 1][0]
            losses = [
                max(q * (y - fc[wd]), (q - 1) * (y - fc[wd]))
                for wd, y in test
                if wd in fc
            ]
            assert rows[q].n_evals == len(losses)
            assert abs(rows[q].total_pinball - sum(losses)) < 1e-6


class TestIqrFences:
    def test_quartiles_and_fences_replay(self, spark, sf_dir):
        import math

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {r.event_type: r for r in QUERIES["dq_iqr_fences"](spark, sf_dir).collect()}
        ev = load_table(spark, sf_dir, "events")
        per = (
            ev.groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        )
        by_type = {}
        for r in per:
            by_type.setdefault(r.event_type, []).append(r.x)
        for et, xs in by_type.items():
            xs = sorted(xs)
            n = len(xs)
            q1 = xs[math.ceil(0.25 * n) - 1]
            q3 = xs[math.ceil(0.75 * n) - 1]
            row = rows[et]
            assert (row.n_days, row.q1, row.q3) == (n, q1, q3)
            assert row.n_low == sum(1 for x in xs if 2 * x < 5 * q1 - 3 * q3)
            assert row.n_high == sum(1 for x in xs if 2 * x > 5 * q3 - 3 * q1)


class TestBayesianBeta:
    def test_posteriors_and_symmetry(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {r.variant: r for r in QUERIES["ab_test_bayesian_beta"](spark, sf_dir).collect()}
        assert set(rows) == {0, 1}
        for v, r in rows.items():
            assert r.a == r.s + 1 and r.b == r.n - r.s + 1
            assert abs(r.post_mean - (r.s + 1) / (r.n + 2)) < 1e-9
            assert 0 < r.post_var < 0.25
        # the two z-scores are mirror images
        assert abs(rows[0].z_vs_other + rows[1].z_vs_other) < 1e-8


class TestSpectralEntropy:
    def test_bounds_and_periodogram_consistency(self, spark, sf_dir):
        import math

        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ts_spectral_entropy"](spark, sf_dir).collect()[0]
        assert row.n_components == 6
        assert 0.0 <= row.entropy <= math.log(6) + 1e-9
        assert 0.0 <= row.entropy_norm <= 1.0 + 1e-9
        # replay from the committed periodogram powers
        pg = {r.k: r.power for r in QUERIES["ts_periodogram"](spark, sf_dir).collect()}
        tot = sum(pg.values())
        h = -sum((p / tot) * math.log(p / tot) for p in pg.values() if p > 0)
        assert abs(row.entropy - h) < 1e-5


class TestFactDetailReconcile:
    def test_totals_and_mismatch_accounting(self, spark, sf_dir):
        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = QUERIES["dq_fact_detail_reconcile"](spark, sf_dir).collect()
        n_orders = load_table(spark, sf_dir, "orders").count()
        assert sum(r.n_orders for r in rows) == n_orders
        for r in rows:
            assert r.n_exact + r.n_mismatched + r.n_no_detail == r.n_orders
            assert r.sum_abs_delta >= 0
            if r.n_mismatched == 0:
                assert r.sum_abs_delta == 0


class TestIpwEstimate:
    def test_ipw_weights_sum_and_naive_consistency(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["ab_test_ipw_estimate"](spark, sf_dir).collect()[0]
        assert row.n_users > 0 and row.n_strata >= 1
        assert abs(row.ate_ipw - (row.mu1_ipw - row.mu0_ipw)) < 1e-8
        # hash treatment is near-random: IPW and naive agree in sign
        # magnitude can differ; both must be finite
        for v in (row.mu1_ipw, row.mu0_ipw, row.ate_ipw, row.ate_naive):
            assert v == v  # not NaN


class TestHexBinning:
    def test_matches_independent_python_reference(self, spark, sf_dir):
        """Cross-check the SQL cube-rounding against a from-scratch
        Python hex binner on the same points (axial flat-top, size 5)."""
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.queries.analytics import _CLAT_S, _CLON_S
        from psvm_spark.registry import QUERIES

        got = {
            (r.q, r.r): (r.n, r.bal_c_sum)
            for r in QUERIES["geo_hex_binning"](spark, sf_dir).collect()
        }

        pts = (
            load_table(spark, sf_dir, "customer")
            .select(
                F.expr(_CLON_S).alias("x"),
                F.expr(_CLAT_S).alias("y"),
                (F.col("c_acctbal").cast("decimal(12,2)") * 100)
                .cast("bigint")
                .alias("bal_c"),
            )
            .collect()
        )

        def hex_qr(x, y, size=5.0):
            s3o3 = 0.5773502691896257
            qf = ((2.0 / 3.0) * x) / size
            rf = ((-1.0) / 3.0 * x + s3o3 * y) / size
            xf, zf = qf, rf
            yf = -xf - zf
            import math

            def rnd(v):
                # away-from-zero (the SQL ROUND rule) WITHOUT the
                # v + 0.5 double trap (v = nextafter(0.5, 0) would
                # round up).  v - floor(v) is exact (Sterbenz), so the
                # tie test is exact; ties go away from zero.
                f = math.floor(v)
                r = v - f
                if r > 0.5:
                    return f + 1
                if r < 0.5:
                    return f
                return f + 1 if v > 0 else f

            rx, ry, rz = rnd(xf), rnd(yf), rnd(zf)
            dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
            if dx > dy and dx > dz:
                rx = -ry - rz
            elif dy > dz:
                ry = -rx - rz
            else:
                rz = -rx - ry
            return int(rx), int(rz)

        import collections

        want = collections.defaultdict(lambda: [0, 0])
        for p in pts:
            cell = hex_qr(p.x, p.y)
            want[cell][0] += 1
            want[cell][1] += p.bal_c
        assert got == {k: tuple(v) for k, v in want.items()}
        # hex invariant: each cell id is a valid cube coordinate (q+r+s=0
        # holds by construction); density spreads across many cells
        assert len(got) > 100
