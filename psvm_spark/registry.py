"""Query registry: single source of truth behind ``__spark_entry__``.

Each operator from SURVEY.md section 2 registers a (spark, sf_dir) ->
DataFrame callable plus, when SQL-expressible, its DuckDB oracle twin.
The driver hash-compares the two order-insensitively at sf0.01, sorting
columns by name — so every computed column is aliased identically on
both sides (SURVEY.md section 7 watch-list a).

Usage:

    @query("agg_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def agg_pricing_summary(spark, sf_dir):
        ...

Rows-only checks (approximate/ML/streaming ops) omit ``oracle``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so decorators run (idempotent).

    Import order is deliberate: the driver's correctness sample is the
    FIRST 50 registered keys, and rounds 1-2 sampled the same
    aggregates/analytics/joins/llm window, leaving most queries with no
    driver-green evidence.  The order rotates per round so every family
    accumulates driver-sampled rows (bench still executes ALL queries,
    so errors anywhere stay visible every round).

    Rotation ledger:
      round 3 (done, 50/50 green): relational(31) + joins(11) +
        scalars(8 of 9).
      round 4 (this order): windows(10) + streaming(11) + sources(7) +
        udfs(7) + ml(15) = exactly 50 keys never sampled in r1-r3.
        (Round-4 additions — graph(3), agg_cms_heavy_hitters, ts_ewma,
        event_transitions, doc_chunk_overlap, sample_weighted_reservoir,
        join_bloom_prune — all register AFTER the ml block, so the
        planned 50-key sample is unchanged.)
      round 5 (this order): front multimodal + warehouse + aggregates
        + analytics.  With the round-5 additions those families hold
        4 + 23 + 29 + 44 keys, so the driver's 50-key prefix is
        multimodal(4) + warehouse(23) + the first 23 aggregates keys
        (the aggregates tail + analytics spill to round 6).
      round 6 (next, write it here when rotating): front the aggregates
        tail + analytics + graph + the llm tail, then joins/scalars
        resamples.
    """
    from psvm_spark.queries import (  # noqa: F401
        multimodal,
        warehouse,
        aggregates,
        analytics,
        graph,
        llm,
        windows,
        streaming,
        sources,
        udfs,
        ml,
        relational,
        joins,
        scalars,
    )
