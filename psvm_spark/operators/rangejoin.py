"""Distributed range (band) join (SURVEY.md B14).

A naive ``|l.ts - r.ts| <= band`` predicate becomes a BroadcastNestedLoop
join in Spark — O(n*m), unusable at scale.  Instead: quantize both sides
to ``band``-sized buckets, replicate the right side into its bucket and
the two neighbors, equi-join on (keys..., bucket), then apply the exact
band predicate.  Each qualifying pair matches exactly once (buckets of
width ``band`` mean |Δts| <= band implies bucket distance <= 1).

Cost: 3x replication of the right side + one hash-partitioned equi-join
— shuffle-bound, survives a 100x scale-up; candidate pairs are
partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__band_bucket"


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    left_ts: str,
    right_ts: str,
    band: int,
) -> DataFrame:
    """Inner-join rows with equal keys and ``|left_ts - right_ts| <= band``.

    ``left_ts``/``right_ts`` must be integral (e.g. epoch microseconds via
    ``F.unix_micros``); ``band`` is in the same unit.
    """
    lb = left.withColumn(_B, F.expr(f"{left_ts} div {band}"))
    rb = right.withColumn(
        _B,
        F.explode(
            F.array(
                F.expr(f"{right_ts} div {band} - 1"),
                F.expr(f"{right_ts} div {band}"),
                F.expr(f"{right_ts} div {band} + 1"),
            )
        ),
    )
    cond = lb[_B] == rb[_B]
    for lk, rk in zip(left_keys, right_keys):
        cond = cond & (lb[lk] == rb[rk])
    band_pred = F.abs(lb[left_ts] - rb[right_ts]) <= F.lit(band)
    joined = lb.join(rb, cond).filter(band_pred)
    return joined.drop(lb[_B]).drop(rb[_B])
