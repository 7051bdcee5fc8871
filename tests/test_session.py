"""Session-invariant hardening: the driver hands queries() an arbitrary
SparkSession (it does NOT use our factory), so every correctness-
critical runtime conf must self-apply inside the query path even when
the session arrives with hostile values preset."""

from __future__ import annotations

from psvm_spark import registry
from psvm_spark.session import _RUNTIME_CONFS, ensure_session_invariants

registry.load_all()

_HOSTILE = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "false",
}


class TestHostileSessionConfs:
    def test_invariants_win_and_queries_stay_parity_exact(self, spark, sf_dir):
        saved = {k: spark.conf.get(k) for k in _HOSTILE}
        try:
            for k, v in _HOSTILE.items():
                spark.conf.set(k, v)
            # every query path runs ensure_session_invariants via
            # load_table/stream_events; a timestamp-sensitive oracle must
            # still hash-match bitwise
            from psvm_spark.oracle import compare_query

            for name in ("scalar_datetime", "scan_time_range"):
                res = compare_query(spark, sf_dir, name)
                assert res.ok, (name, str(res))
            for k, v in _RUNTIME_CONFS.items():
                assert spark.conf.get(k) == v, k
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
            ensure_session_invariants(spark)


class TestRegistrationRotation:
    def test_first_50_keys_complete_the_registry_sweep(self):
        """The driver's correctness sample is the FIRST 50 registered
        keys; the round-12 rotation pins the ordering as: every
        never-driver-sampled key (19 round-10 pool remainders,
        oracle-backed first, then the round-11/12 additions), then the
        5 stale-converted re-serves, then the 3 spare-slot refreshers
        — so round 12's sample grants first-party driver evidence to
        EVERY remaining key (the full-registry sweep).  Pin that so an
        innocent import reorder or an early-module addition can't
        displace it."""
        from psvm_spark import registry

        registry.load_all()
        keys = list(registry.QUERIES)
        first50 = set(keys[:50])
        sampled = (
            registry._DRIVER_SAMPLED_R1_R10 | registry._DRIVER_SAMPLED_R11
        )
        never = [k for k in keys if k not in sampled]
        # the sweep completes: every never-sampled key + the stale
        # re-serves + the refreshers all fit in the 50-key window
        assert (
            len(never)
            + len(registry._STALE_CONVERTED)
            + len(registry._R12_REFRESHERS)
            == 50
        )
        assert all(k in first50 for k in never)
        assert all(k in first50 for k in registry._STALE_CONVERTED)
        assert all(k in first50 for k in registry._R12_REFRESHERS)

        # group order is total: pool(oracle, rows), stale, new,
        # refreshers, long-sampled
        def rank(k):
            if k in registry._NEVER_SAMPLED_AS_OF_R10 and k not in sampled:
                return 0 if k in registry.ORACLES else 1
            if k in registry._STALE_CONVERTED:
                return 2
            if k not in sampled:
                return 3
            if k in registry._R12_REFRESHERS:
                return 4
            return 5

        ranks = [rank(k) for k in keys]
        assert ranks == sorted(ranks)

    def test_every_registry_key_traces_to_survey_section_2(self):
        """The driver contract (__spark_entry__) defines queries() as
        one callable per SURVEY.md §2 operator; §2 (with its 2.2a/2.2b
        continuations, round 10) must therefore name every registry
        key (verdict r9 item 4)."""
        import re
        from pathlib import Path

        from psvm_spark import registry

        registry.load_all()
        lines = Path("SURVEY.md").read_text().splitlines()
        i0 = next(
            i for i, l in enumerate(lines) if l.startswith("## 2. Operator")
        )
        i1 = next(
            i for i, l in enumerate(lines) if l.startswith("## 3. Query")
        )
        sec2_keys = set(re.findall(r"`([a-z0-9_]+)`", "\n".join(lines[i0:i1])))
        missing = set(registry.QUERIES) - sec2_keys
        assert not missing, sorted(missing)


class TestLazyOracles:
    """Round-9 ADVICE fixes: deferred oracle builders + probe-mod guard."""

    def test_zlib_oracle_is_lazy_and_memoized(self):
        from psvm_spark import registry

        registry.load_all()
        key = "text_compression_ratio"
        assert key in registry.ORACLES  # membership is eager (cheap probe)
        sql1 = registry.ORACLES[key]
        assert isinstance(sql1, str) and "zlib" not in sql1  # resolved SQL
        assert "VALUES" in sql1
        # memoized: second read returns the identical resolved object
        assert registry.ORACLES[key] is sql1

    def test_oracle_dict_accessors_force_builders(self):
        """get/values/items/copy must never hand a caller an unresolved
        builder callable (ADVICE r9 — dict's native accessors bypass
        __getitem__)."""
        from psvm_spark.registry import _OracleDict

        d = _OracleDict()
        d["k"] = lambda: "SELECT 1"
        assert d.get("k") == "SELECT 1"
        assert d.get("missing", "dflt") == "dflt"
        d["k2"] = lambda: "SELECT 2"
        assert all(isinstance(v, str) for v in d.values())
        assert all(isinstance(v, str) for _, v in d.items())
        d["k3"] = lambda: "SELECT 3"
        assert all(isinstance(v, str) for v in d.copy().values())
        # resolve() hands the driver only plain strings
        resolved = registry.ORACLES.resolve()
        assert all(isinstance(v, str) for v in resolved.values())

    def test_llm_import_does_not_precompute_zlib_table(self):
        """The digest table must not be built at module import (ADVICE
        r8): a fresh interpreter importing the module stores a CALLABLE
        until first oracle read.  Simulated here by re-running the
        builder registration logic rather than forking a process."""
        from psvm_spark.queries.llm import (
            _zlib_fixture_parquets,
            _zlib_oracle_available,
            _zlib_oracle_sql,
        )

        assert _zlib_oracle_available()  # container fixtures present
        paths = _zlib_fixture_parquets()
        assert any("sf0.001" in p for p in paths)
        assert any("sf0.01" in p for p in paths)
        sql = _zlib_oracle_sql()
        assert sql is not None and "md5(d.text)" in sql

    def test_probe_modulo_guard_blocks_parity_compare(self, spark, sf_dir):
        import pytest

        from psvm_spark.oracle import compare_query

        spark.conf.set("psvm.sim.probe_modulo", "100")
        try:
            with pytest.raises(AssertionError, match="probe_modulo=100"):
                compare_query(spark, sf_dir, "sim_topk_cosine")
        finally:
            spark.conf.unset("psvm.sim.probe_modulo")
        # default conf: compare proceeds (and passes)
        assert compare_query(spark, sf_dir, "sim_topk_cosine").ok

    def test_svm_modulo_guard_blocks_parity_compare(self, spark, sf_dir):
        """The SV x test slices are conf-budgeted (verdict r9 item 2):
        a raised ``psvm.svm.sv_modulo`` is the scale harness's
        fixed-model knob and its output is NOT what the pinned-default
        oracles describe — compare_query must refuse."""
        import pytest

        from psvm_spark.oracle import compare_query

        spark.conf.set("psvm.svm.sv_modulo", "400")
        try:
            with pytest.raises(AssertionError, match="sv_modulo=400"):
                compare_query(spark, sf_dir, "svm_predict_score")
        finally:
            spark.conf.unset("psvm.svm.sv_modulo")
        assert compare_query(spark, sf_dir, "svm_predict_score").ok

    def test_svm_modulo_conf_scales_slices(self, spark, sf_dir):
        """Raising the moduli must shrink BOTH the SV model slice and
        the test panel — the fixed-size-model-artifact protocol that
        keeps the SV x test pair volume flat at amplification."""
        from psvm_spark.queries.ml import _sv_test

        sv_b, test_b = _sv_test(spark, sf_dir)
        n_sv_b, n_t_b = sv_b.count(), test_b.count()
        spark.conf.set("psvm.svm.sv_modulo", "100")
        spark.conf.set("psvm.svm.test_modulo", "100")
        try:
            sv_w, test_w = _sv_test(spark, sf_dir)
            n_sv_w, n_t_w = sv_w.count(), test_w.count()
        finally:
            spark.conf.unset("psvm.svm.sv_modulo")
            spark.conf.unset("psvm.svm.test_modulo")
        assert 0 < n_sv_w < n_sv_b
        assert 0 < n_t_w < n_t_b


class TestScratchDirCleanup:
    def test_scratch_dirs_tracked_for_atexit_removal(self):
        import os
        import shutil

        from psvm_spark.queries._util import _SCRATCH_ROOTS, scratch_dir

        d = scratch_dir("psvm_test_scratch_")
        assert os.path.isdir(d)
        assert d in _SCRATCH_ROOTS
        # Simulate the atexit cleanup for THIS dir only — running the
        # real _cleanup_scratch() here would delete scratch roots other
        # tests in this pytest process still lazily read from.
        shutil.rmtree(d, ignore_errors=True)
        _SCRATCH_ROOTS.remove(d)
        assert not os.path.exists(d)
