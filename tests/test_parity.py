"""Driver-replica differential tests: every declared oracle query must
hash-match DuckDB exactly (bitwise) at sf0.001.  A heavier sf0.01 sweep
(what the driver actually runs) is in scripts/check_parity.py and run
before declaring new queries done.
"""

from __future__ import annotations

import pytest

from psvm_spark import registry

registry.load_all()
ORACLE_KEYS = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, name):
    from psvm_spark.oracle import compare_query

    res = compare_query(spark, sf_dir, name)
    assert res.ok, str(res)


def test_all_oracle_keys_have_queries():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_disc_price" in df.columns
