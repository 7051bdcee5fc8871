"""Distributed as-of join (SURVEY.md B15).

Spark has no native as-of join.  The scalable construction: union both
sides tagged, then a running ``last(value, ignorenulls=True)`` window
per key ordered by (ts, tag) — right rows sort before left rows at equal
timestamps, so the match is inclusive (value at ts == left ts counts).

Cost model: one shuffle on the key columns + one in-partition sort —
identical to what a native as-of operator would need.  No correlated
subqueries, no nested-loop join, no per-row Python.  At 100 TB this is
shuffle-bound on the key; skewed keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_TAG = "__asof_tag"
_VAL = "__asof_val"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """For each left row, attach ``value_col`` of the latest right row with
    matching keys and ``right_ts <= left_ts`` (backward as-of, inclusive).

    Ties among right rows at the same timestamp pick an arbitrary one —
    pass a pre-deduplicated right side (or value == ts) when that matters.
    """
    lu = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    ru = right.select(
        *[F.col(rk).alias(lk) for rk, lk in zip(right_keys, left_keys)],
        F.col(right_ts).alias(_TS),
        F.col(value_col).alias(_VAL),
    ).withColumn(_TAG, F.lit(0))
    u = lu.unionByName(ru, allowMissingColumns=True)
    w = (
        Window.partitionBy(*left_keys)
        .orderBy(F.col(_TS).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last(_VAL, ignorenulls=True).over(w))
        .filter(F.col(_TAG) == 1)
        .drop(_TS, _TAG, _VAL)
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """For each left row, attach ``value_col`` of the EARLIEST right row
    with matching keys and ``right_ts >= left_ts`` (forward as-of,
    inclusive) — the mirror of :func:`asof_join`, walking the same
    union from +infinity downward: ordering by (ts DESC, tag ASC) puts
    the right row first at equal timestamps, so the running ``last``
    each left row sees is the smallest right ts at-or-after its own.
    Identical cost model: one shuffle on the keys + one sort.
    """
    lu = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    ru = right.select(
        *[F.col(rk).alias(lk) for rk, lk in zip(right_keys, left_keys)],
        F.col(right_ts).alias(_TS),
        F.col(value_col).alias(_VAL),
    ).withColumn(_TAG, F.lit(0))
    u = lu.unionByName(ru, allowMissingColumns=True)
    w = (
        Window.partitionBy(*left_keys)
        .orderBy(F.col(_TS).desc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last(_VAL, ignorenulls=True).over(w))
        .filter(F.col(_TAG) == 1)
        .drop(_TS, _TAG, _VAL)
    )
