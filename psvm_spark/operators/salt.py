"""Skew-salting helpers (SURVEY.md §4.2.3).

AQE's skew-join splitting handles most runtime skew; these helpers are
the explicit fallback for the two shapes AQE cannot fix:

1. A groupBy whose key has a handful of giant groups (e.g. 3 return
   flags over 100 TB of lineitem): ALL rows of a group land on one
   reducer.  ``salted_groupby`` splits each group into ``n_buckets``
   sub-groups for the first (parallel) aggregation, then combines the
   per-bucket partials — valid for any algebraic aggregate expressed as
   re-aggregable partials (sum/count/min/max; avg = sum/count).
2. A shuffle join against a hot key: ``salted_join_small`` salts the
   big side deterministically and explodes the small side once per salt
   value, so the hot key's rows spread over ``n_buckets`` reducers.

The salt is ``pmod(xxhash64(entire row), n)`` — deterministic (no RNG,
stable under retries/speculative execution) and uniform.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_buckets: int, cols: Sequence[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, n_buckets)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(_SALT, F.pmod(F.xxhash64(*basis), F.lit(n_buckets)))


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_buckets: int = 32,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate within (keys + salt); ``final_aggs``
    re-aggregate the partial columns within keys.  Example::

        salted_groupby(
            li, ["l_returnflag"],
            partial_aggs=[F.sum("qty").alias("s"), F.count("*").alias("c")],
            final_aggs=[F.sum("s").alias("sum_qty"),
                        (F.sum("s") / F.sum("c")).alias("avg_qty")],
        )
    """
    salted = with_salt(df, n_buckets, salt_cols)
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join_small(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_buckets: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys and ``small`` is too
    large to broadcast outright but small enough to replicate n_buckets
    ways.  Rows of a hot key spread over n_buckets reducers instead of
    one.

    Only ``inner`` and ``left`` (big-preserving) joins are valid: the
    small side is replicated once per salt value, so right/full joins
    would emit unmatched small rows n_buckets times."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join_small supports inner/left joins, got {how!r}")
    b = with_salt(big, n_buckets)
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)).cast("array<bigint>"))
    )
    return b.join(s, [*on, _SALT], how).drop(_SALT)
