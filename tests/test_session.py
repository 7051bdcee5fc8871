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
    def test_first_50_keys_are_the_planned_sample_families(self):
        """The driver's correctness sample is the FIRST 50 registered
        keys; registry.load_all's import order deliberately fronts the
        families with no prior driver evidence (rotation ledger in the
        docstring).  Pin the invariant so an innocent import reorder or
        a query added to an early module can't silently displace the
        planned sample."""
        from psvm_spark import registry

        registry.load_all()
        first50 = list(registry.QUERIES)[:50]
        mods = [
            registry.QUERIES[k].__module__.rsplit(".", 1)[-1] for k in first50
        ]
        # round 5: multimodal + warehouse fully inside the window, the
        # rest of the 50 from the aggregates prefix (family sizes grew
        # past the original ledger estimate, so aggregates spills)
        assert set(mods) == {"multimodal", "warehouse", "aggregates"}
        for fam in ("multimodal", "warehouse"):
            fam_all = [
                k
                for k, fn in registry.QUERIES.items()
                if fn.__module__.rsplit(".", 1)[-1] == fam
            ]
            assert set(fam_all) <= set(first50), fam
        # families appear as contiguous blocks in the planned order
        order = ["multimodal", "warehouse", "aggregates"]
        assert mods == sorted(mods, key=order.index)
