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
        mods = {
            registry.QUERIES[k].__module__.rsplit(".", 1)[-1] for k in first50
        }
        assert mods == {"windows", "streaming", "sources", "udfs", "ml"}
        # and those five modules contribute EXACTLY 50 keys in total
        all_in_family = [
            k
            for k, fn in registry.QUERIES.items()
            if fn.__module__.rsplit(".", 1)[-1] in mods
        ]
        assert len(all_in_family) == 50
