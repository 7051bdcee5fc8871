"""Arbitrary stateful streaming (SURVEY.md B43) — both Spark APIs.

Two implementations of the same per-user running-spend tracker:

- ``spend_tracker_classic`` — ``applyInPandasWithState`` (GroupState).
  Executes everywhere; this is what the registered ``stream_stateful``
  query uses (psvm_spark/queries/streaming.py).
- ``spend_tracker_tws`` — ``transformWithStateInPandas`` with a
  ``StatefulProcessor`` (Spark 4's successor API: typed value/list/map
  state, timers, TTL, and mandatory RocksDB state store — the scale path,
  since RocksDB spills state to disk instead of holding it on-heap).

The TWS runtime needs ``google.protobuf`` in the Python workers (Spark's
state-server protocol is protobuf-framed).  This container does not ship
protobuf, so ``tws_runtime_available()`` gates it: on a real cluster the
TWS path runs (tests/test_streaming.py exercises it whenever the runtime
is present); here it is import-checked and plan-built only.

At 100 TB both APIs shard state by the grouping key across executors;
prefer TWS + RocksDB because per-key state no longer competes with
shuffle/agg memory, and timers give eviction without a watermark hack.
"""

from __future__ import annotations

import importlib.util

from pyspark.sql import DataFrame


def tws_runtime_available() -> bool:
    """True iff transformWithStateInPandas can actually execute here.

    The JVM side always has the operator (Spark >= 4.0); the Python
    worker side additionally needs protobuf for the state protocol.
    """
    try:
        # find_spec imports the parent package, so a wholly-absent
        # `google` namespace raises rather than returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _make_spend_processor():
    """Build the StatefulProcessor class lazily (the import itself is
    cheap and protobuf-free; only *running* it needs protobuf)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpendTracker(StatefulProcessor):
        """Running (n_events, total_value) per user in typed value state."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("spend", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return SpendTracker


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def spend_tracker_tws(events: DataFrame) -> DataFrame:
    """Per-user running spend via transformWithStateInPandas.

    Caller must set ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` (TWS refuses the default HDFS-backed store) and
    have a protobuf-capable Python runtime (``tws_runtime_available``).
    """
    SpendTracker = _make_spend_processor()
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SpendTracker(),
            outputStructType="user_id bigint, n_events bigint, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )
