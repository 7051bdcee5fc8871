"""Warehouse-pattern operator properties."""

from __future__ import annotations

from psvm_spark import registry

registry.load_all()
class TestWriteAuditPublish:
    def test_gate_blocks_corrupt_batch(self, spark, sf_dir):
        rows = {
            r.batch: r
            for r in registry.QUERIES["warehouse_write_audit_publish"](
                spark, sf_dir
            ).collect()
        }
        assert rows["clean"].audit_pass and rows["clean"].published
        assert not rows["corrupt"].audit_pass and not rows["corrupt"].published
        # the audit counted every source row through the staged bytes
        from psvm_spark.catalog import load_table

        assert rows["clean"].n_src_rows == load_table(spark, sf_dir, "orders").count()
        assert len(rows["clean"].checksum) == 32


class TestManifestPrunedScan:
    def test_skipping_never_changes_answers(self, spark, sf_dir):
        from psvm_spark.catalog import load_table
        from psvm_spark.queries.warehouse import _MAN_HI, _MAN_LO
        from psvm_spark.registry import QUERIES

        import pyspark.sql.functions as F

        r = QUERIES["warehouse_manifest_pruned_scan"](spark, sf_dir).collect()[0]
        o = load_table(spark, sf_dir, "orders")
        direct = o.filter(
            (F.col("o_orderdate") >= F.lit(_MAN_LO).cast("date"))
            & (F.col("o_orderdate") < F.lit(_MAN_HI).cast("date"))
        ).count()
        assert r.n_rows == direct
        assert 0 < r.files_scanned < r.files_total  # pruning actually fired


class TestSnapshotTimeTravel:
    def test_snapshot1_reproduces_predelete_answer(self, spark, sf_dir):
        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        import pyspark.sql.functions as F

        rows = {r.snapshot_id: r for r in
                QUERIES["warehouse_snapshot_time_travel"](spark, sf_dir).collect()}
        o = load_table(spark, sf_dir, "orders")
        assert rows[1].n_rows == o.count()  # as-of s1 == full pre-delete table
        # the s2 rewrite dropped exactly the non-urgent June rows
        june = o.filter(
            F.date_trunc("month", "o_orderdate").cast("date") == F.lit("1996-06-01").cast("date")
        )
        dropped = june.filter(F.col("o_orderpriority") != "1-URGENT").count()
        assert dropped > 0
        assert rows[1].n_rows - rows[2].n_rows == dropped
        assert rows[1].n_files == rows[2].n_files  # rewrite replaces, never appends history


class TestVacuumUnreferenced:
    def test_vacuum_removes_only_unreferenced_and_keeps_answers(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        r = QUERIES["warehouse_vacuum_unreferenced"](spark, sf_dir).collect()[0]
        assert r.files_removed == 1  # exactly the orphaned June original
        assert r.files_before == r.files_live + r.files_removed
        o = load_table(spark, sf_dir, "orders")
        expect = o.filter(
            ~(
                (F.date_trunc("month", "o_orderdate").cast("date")
                 == F.lit("1996-06-01").cast("date"))
                & (F.col("o_orderpriority") != "1-URGENT")
            )
        ).count()
        assert r.n_rows == expect


class TestPartitionEvolution:
    def test_both_specs_prune_and_answers_match_direct_filter(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        r = QUERIES["warehouse_partition_evolution"](spark, sf_dir).collect()[0]
        o = load_table(spark, sf_dir, "orders")
        direct = o.filter(
            (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
            & (F.col("o_orderpriority") == "1-URGENT")
        ).count()
        assert r.n_rows == direct
        assert r.files_scanned_spec1 == 3  # 1995-10..12 (month-only pruning)
        assert r.files_scanned_spec2 == 3  # 1996-01..03 x one priority
        assert r.files_total > r.files_scanned_spec1 + r.files_scanned_spec2


class TestEqualityDeletes:
    def test_delete_file_indistinguishable_from_rewrite(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES

        r = QUERIES["warehouse_equality_deletes"](spark, sf_dir).collect()[0]
        o = load_table(spark, sf_dir, "orders")
        june_nonurgent = o.filter(
            (F.date_trunc("month", "o_orderdate").cast("date")
             == F.lit("1996-06-01").cast("date"))
            & (F.col("o_orderpriority") != "1-URGENT")
        ).count()
        assert r.n_deletes == june_nonurgent > 0
        assert r.n_rows == o.count() - june_nonurgent


class TestDeletionVectors:
    def test_dv_read_equals_copy_on_write(self, spark, sf_dir):
        """A DV merge-on-read scan must be indistinguishable from the
        equivalent rewrite: compare against a direct predicate filter."""
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.queries.warehouse import _DV_CENTS, _DV_MONTH
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        row = QUERIES["warehouse_deletion_vectors"](spark, sf_dir).collect()[0]
        o = load_table(spark, sf_dir, "orders")
        pred = (
            F.date_trunc("month", "o_orderdate").cast("date")
            == F.lit(_DV_MONTH).cast("date")
        ) & (
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
            < _DV_CENTS
        )
        direct = o.filter(~pred).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
            ).alias("c"),
        ).collect()[0]
        n_del = o.filter(pred).count()
        assert row.n_dv_entries == n_del
        assert row.n_rows_live == direct.n
        assert row.total_c == direct.c


class TestCompactionPlanner:
    def test_groups_are_contiguous_and_cover_all_files(self, spark, sf_dir):
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = sorted(
            QUERIES["warehouse_compaction_planner"](spark, sf_dir).collect(),
            key=lambda r: r.group_id,
        )
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.queries.warehouse import _COMPACT_TARGET

        o = load_table(spark, sf_dir, "orders")
        n_months = o.select(
            F.date_trunc("month", "o_orderdate").alias("m")
        ).distinct().count()
        n_orders = o.count()
        # the plan covers every month file exactly once and every row
        assert sum(r.n_files for r in rows) == n_months
        assert sum(r.rows_total for r in rows) == n_orders
        # contiguous in month order: clustering preserved by the rewrite
        for prev, cur in zip(rows, rows[1:]):
            assert prev.mo_hi < cur.mo_lo
        # rolling rule: replay group = prefix_before div target
        manifest = sorted(
            o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
            .count()
            .collect(),
            key=lambda r: r.m,
        )
        prefix, expect = 0, {}
        for r in manifest:
            g = prefix // _COMPACT_TARGET
            expect[g] = expect.get(g, 0) + 1
            prefix += r["count"]
        assert {r.group_id: r.n_files for r in rows} == expect


class TestRowLineage:
    def test_lineage_invariants(self, spark, sf_dir):
        """Updated rows must KEEP their snapshot-1 row ids (the id-sum
        of the seq-2 updated slice equals the same keys' id-sum in the
        base), inserts must mint fresh unique ids, and ids must be
        globally unique."""
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {r.last_seq: r for r in QUERIES["warehouse_row_lineage"](spark, sf_dir).collect()}
        o = load_table(spark, sf_dir, "orders")
        n_base = o.count()
        keys = o.select(F.col("o_orderkey").alias("k"))
        upd = keys.filter(F.col("k") % 7 == 3)
        ins = keys.filter(F.col("k") % 11 == 5)
        mx = keys.agg(F.max("k")).collect()[0][0]
        n_upd, n_ins = upd.count(), ins.count()
        upd_id_sum = upd.agg(F.sum("k")).collect()[0][0]
        ins_id_sum = ins.agg(F.sum(F.col("k") + mx)).collect()[0][0]
        # seq 1 = untouched rows; seq 2 = updated + inserted
        assert rows[1].n_rows == n_base - n_upd
        assert rows[2].n_rows == n_upd + n_ins
        assert rows[2].row_id_sum == upd_id_sum + ins_id_sum
        # per-seq uniqueness (global uniqueness follows: inserts > max)
        assert rows[1].n_distinct_ids == rows[1].n_rows
        assert rows[2].n_distinct_ids == rows[2].n_rows


class TestClusteringDepth:
    def test_layout_contrast(self, spark, sf_dir):
        """The custkey layout's files all span the same date range, so
        its max overlap depth must equal its file count; the date
        layout's contiguous ranges must report depth 1."""
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        rows = {
            r.layout: r
            for r in QUERIES["warehouse_clustering_depth"](spark, sf_dir).collect()
        }
        assert rows["by_date"].max_overlap_depth == 1
        assert rows["by_custkey"].max_overlap_depth == rows["by_custkey"].n_files


class TestDynamicPartitionPruning:
    def test_plan_carries_dpp_and_result_matches_batch(self, spark, sf_dir):
        """The physical plan must inject a dynamicpruning expression on
        the partitioned fact scan (runtime partition elimination), and
        the result must equal the unpartitioned batch join."""
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        df = QUERIES["join_dynamic_partition_pruning"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        got = sorted(map(tuple, df.collect()))
        o = load_table(spark, sf_dir, "orders")
        dim = (
            o.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & F.col("o_orderdate").between("1995-01-01", "1995-03-31")
            )
            .select(F.date_trunc("month", "o_orderdate").cast("date").alias("dm"))
            .distinct()
        )
        fact = o.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("price_c"),
        )
        want = sorted(
            map(
                tuple,
                fact.join(dim, fact.m == dim.dm)
                .groupBy("m")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum("price_c").cast("bigint").alias("t"),
                )
                .select(F.col("m").cast("string"), "n", "t")
                .collect(),
            )
        )
        assert got == want and len(got) > 0


class TestIncrementalJoinMV:
    def test_refresh_equals_full_recompute(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        got = {
            r.nationkey: (r.n_orders, r.revenue)
            for r in QUERIES["warehouse_incremental_join_mv"](spark, sf_dir).collect()
        }
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        want = {
            r.nationkey: (r.n_orders, r.revenue)
            for r in o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        }
        assert got == want and len(got) == 25


class TestFreshnessLag:
    def test_lag_and_volume_replay(self, spark, sf_dir):
        import collections

        from psvm_spark.catalog import load_table
        from psvm_spark.registry import QUERIES, load_all

        load_all()
        got = {r.event_type: r for r in QUERIES["dq_freshness_lag"](spark, sf_dir).collect()}
        ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
        hw = max(r.ts for r in ev)
        d0 = hw.replace(hour=0, minute=0, second=0, microsecond=0)
        by_type = collections.defaultdict(list)
        for r in ev:
            by_type[r.event_type].append(r.ts)
        for et, tss in by_type.items():
            last = max(tss)
            lag_min = int((hw - last).total_seconds() * 1e6) // 60_000_000
            n_last = sum(t >= d0 for t in tss)
            hist = [t for t in tss if t < d0]
            n_days = len({t.date() for t in hist})
            row = got[et]
            assert row.lag_minutes == lag_min
            assert row.n_last_day == n_last
            assert abs(row.volume_ratio - n_last / (len(hist) / n_days)) < 1e-6


class TestHilbertCluster:
    def test_fold_is_the_hilbert_bijection_on_a_full_grid(self, spark):
        """The aggregate-fold must hit every d in [0, 4096) exactly once
        over a full 64x64 grid — the defining property of the curve —
        and adjacent d values must be grid neighbors (unit L1 step),
        the locality Z-order lacks."""
        from pyspark.sql import functions as F

        from psvm_spark.queries.warehouse import _HILBERT_D

        grid = (
            spark.range(64 * 64)
            .select(
                (F.col("id") % 64).cast("int").alias("x"),
                (F.col("id") / 64).cast("int").alias("y"),
            )
            .withColumn("d", F.expr(_HILBERT_D))
        )
        rows = grid.collect()
        ds = sorted(r.d for r in rows)
        assert ds == list(range(4096))
        by_d = {r.d: (r.x, r.y) for r in rows}
        for d in range(4095):
            (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])

    def test_layout_partitions_and_within_file_sort(self, spark, sf_dir, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from psvm_spark.queries.warehouse import write_hilbert

        out = str(tmp_path / "hilbert")
        write_hilbert(spark, sf_dir, out)
        parts = glob.glob(out + "/hb=*/*.parquet")
        assert parts, "no partitioned output written"
        for f in parts:
            d = pq.read_table(f, columns=["d"]).column("d").to_pylist()
            assert d == sorted(d), f"within-file Hilbert order violated: {f}"


class TestPageIndexPrune:
    def test_column_index_in_file_and_prune_agrees(self, spark, sf_dir, tmp_path):
        """Prove the ColumnIndex/OffsetIndex pair is physically in the
        written file through the parquet-mr footer reader (pyarrow 16
        exposes page-index WRITE only), that the small-page knob
        actually produced page-granular entries, and that reads with
        page-index filtering on vs off return identical rows."""
        import glob

        from psvm_spark.queries.warehouse import (
            _PAGE_IDX_HI,
            _PAGE_IDX_LO,
            write_page_indexed,
        )

        out = str(tmp_path / "pgidx")
        write_page_indexed(spark, sf_dir, out)
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        files = sorted(glob.glob(out + "/*.parquet"))
        assert files
        rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
            jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jvm.org.apache.hadoop.fs.Path(files[0]), conf
            )
        )
        try:
            blocks = rdr.getFooter().getBlocks()
            assert blocks.size() >= 1
            found = False
            for bi in range(blocks.size()):
                cols = blocks.get(bi).getColumns()
                for ci in range(cols.size()):
                    cc = cols.get(ci)
                    if cc.getPath().toDotString() != "o_orderkey":
                        continue
                    colidx = rdr.readColumnIndex(cc)
                    offidx = rdr.readOffsetIndex(cc)
                    assert colidx is not None, "ColumnIndex missing"
                    assert offidx is not None, "OffsetIndex missing"
                    assert offidx.getPageCount() > 1, (
                        "page.row.count.limit did not split pages"
                    )
                    # sorted layout => per-page INT64 mins are
                    # non-decreasing (the property pruning relies on)
                    mins = colidx.getMinValues()
                    assert mins.size() == offidx.getPageCount()
                    decoded = []
                    for mi in range(mins.size()):
                        bb = mins.get(mi)
                        raw = bytes(
                            bb.get(k) & 0xFF for k in range(bb.remaining())
                        )
                        decoded.append(
                            int.from_bytes(raw, "little", signed=True)
                        )
                    assert decoded == sorted(decoded), decoded
                    found = True
            assert found, "o_orderkey chunk not found"
        finally:
            rdr.close()

        def rows(enabled: bool):
            return sorted(
                (r.o_orderkey, r.o_custkey)
                for r in spark.read.option(
                    "parquet.filter.columnindex.enabled", str(enabled).lower()
                )
                .parquet(out)
                .filter(
                    f"o_orderkey between {_PAGE_IDX_LO} and {_PAGE_IDX_HI}"
                )
                .select("o_orderkey", "o_custkey")
                .collect()
            )

        on, off = rows(True), rows(False)
        assert on == off and len(on) > 0


class TestMergeCowVsMor:
    def test_costs_and_equivalence(self, spark, sf_dir):
        """CoW and MoR reads of the same MERGE must agree exactly
        (total_c_cow == total_c_mor), the CoW write amplification must
        dominate the MoR commit when updates are sparse, and the
        one-file-per-month layout contract must hold physically."""
        from psvm_spark.queries.warehouse import warehouse_merge_cow_vs_mor

        row = warehouse_merge_cow_vs_mor(spark, sf_dir).collect()[0]
        assert row.total_c_cow == row.total_c_mor
        assert row.n_dv_entries_mor > 0
        # write amplification: whole-file rewrite >> row-level DV
        assert row.n_rows_rewritten_cow >= row.n_dv_entries_mor
        assert row.n_delta_rows_mor >= row.n_dv_entries_mor
        # row accounting: final = base + inserts
        from psvm_spark.catalog import load_table

        n_base = load_table(spark, sf_dir, "orders").count()
        assert row.n_rows_final == n_base + (
            row.n_delta_rows_mor - row.n_dv_entries_mor
        )

    def test_one_file_per_month_layout(self, spark, sf_dir, tmp_path):
        """repartition('mo') before partitionBy('mo') must yield
        exactly one data file per month dir — the contract that makes
        n_files_touched_cow layout-deterministic."""
        import glob

        from pyspark.sql import functions as F

        from psvm_spark.catalog import load_table

        o = load_table(spark, sf_dir, "orders")
        out = str(tmp_path / "mo_layout")
        snap = o.select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").cast("date").alias("mo"),
        )
        snap.repartition("mo").write.partitionBy("mo").mode(
            "overwrite"
        ).parquet(out)
        for d in glob.glob(out + "/mo=*"):
            files = glob.glob(d + "/*.parquet")
            assert len(files) == 1, d
