"""Bucketed (co-located) joins — the shuffle-free fact-fact join path.

A sort-merge join of two 100 TB fact tables shuffles both sides on the
join key every time it runs.  Writing both tables bucketed (and sorted)
on that key moves the shuffle to *write time*, once: every subsequent
join reads bucket i of each side into the same task — no Exchange in
the plan (asserted in tests/test_operators.py).  This is Spark's
equivalent of the co-partitioning a native engine would maintain, and
the right storage layout for any key repeatedly joined/aggregated on.

Bucketed writes must go through ``saveAsTable`` (bucket metadata lives
in the session catalog); we pin an explicit path so the data location
is deterministic and independent of the session's warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from psvm_spark.queries._util import scratch_dir


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """(Re)write ``df`` as a bucketed+sorted parquet table named ``table``."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is None:
        path = scratch_dir(f"psvm_bucketed_{table}_")
    writer.option("path", path).saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
    names: tuple[str, str] = ("psvm_bucket_left", "psvm_bucket_right"),
) -> DataFrame:
    """Write both sides bucketed on their join keys, read back, join.

    The write is the one-time cost a real deployment pays at ingest;
    the returned join's physical plan has no shuffle Exchange under the
    SortMergeJoin.
    """
    write_bucketed(left, names[0], left_key, n_buckets)
    write_bucketed(right, names[1], right_key, n_buckets)
    bl = spark.table(names[0])
    br = spark.table(names[1])
    return bl.join(br, bl[left_key] == br[right_key])
