"""Table catalog: the ten fixture tables (FIXTURES.md) loaded as DataFrames.

Parquet scans go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; at 100 TB the same call reads a
partitioned directory tree and prunes partitions.  ``load_tables`` memoizes
per (session, sf_dir) so a multi-query run plans each scan once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psvm_spark.session import ensure_session_invariants

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-joinable (region=5 rows ...
# customer=150 rows at sf0.001, ~15k at sf0.1 — still well under the 10MB
# default autoBroadcastJoinThreshold; at 100 TB scale customer would grow
# but region/nation/supplier/part stay dimension-sized).
BROADCAST_DIMS = ("region", "nation", "supplier", "part")

_cache: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; memoized per (session, sf_dir, table).

    ``events.ts`` arrives as long nanoseconds (see session.py conf) and is
    converted here to a microsecond timestamp by integer floor-division —
    exactly how DuckDB truncates the same parquet column, so oracle
    comparisons on ``ts`` agree.
    """
    ensure_session_invariants(spark)
    key = (id(spark), sf_dir.rstrip("/"), name)
    if key not in _cache:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        _cache[key] = df
    return _cache[key]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def clear_cache() -> None:
    _cache.clear()


def load_events_range(spark: SparkSession, sf_dir: str, lo_iso: str, hi_iso: str) -> DataFrame:
    """Time-range scan of ``events`` with the range predicate pushed into
    the parquet scan.

    ``load_table`` derives the ``ts`` timestamp from the raw int64-ns
    column, and Catalyst cannot invert that expression — a filter on the
    derived column reaches the scan as ``IsNotNull`` only, which at
    100 TB means scanning every row-group.  Filtering the *raw* bigint
    column first (bounds converted to ns in Python) shows up as
    ``GreaterThanOrEqual/LessThan`` in ``PushedFilters`` and prunes
    row-groups by min/max statistics; the ns->us conversion happens
    after, so results are identical to filtering the derived column.
    """
    from datetime import datetime, timezone

    def _ns(iso: str) -> int:
        dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    ensure_session_invariants(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.filter((F.col("ts") >= _ns(lo_iso)) & (F.col("ts") < _ns(hi_iso)))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.filter(
        (F.col("ts") >= F.lit(lo_iso).cast("timestamp"))
        & (F.col("ts") < F.lit(hi_iso).cast("timestamp"))
    )
