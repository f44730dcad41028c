"""Custom stateful streaming operator via ``applyInPandasWithState``:
running per-user totals maintained across micro-batches.

This is the pattern slot for operators Spark's built-in windowed aggs
can't express (per-key state machines, custom eviction, enrichment
caches). State here is one row per user — (n_events, sum_value,
last_ts) — updated with each batch's Arrow-transferred pandas group
and emitted after every update, so the sink always holds the latest
running totals (update semantics, deterministic under availableNow).

Scale notes: state is partitioned by the grouping key across
executors; per-key state is O(1) here so total state is O(distinct
users). The pandas hop is Arrow-batched per group — acceptable off the
hot path; pure windowed aggs should use streaming/windows.py instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user; emits the updated state row
    for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's arbitrary-state API, successor
# to applyInPandasWithState): the SAME running per-user totals through
# the new StatefulProcessor surface, so both stateful APIs are covered
# and tested against the one batch oracle. Differences that matter:
# state lives in named, typed handles (getValueState) instead of one
# tuple, the processor is an object with a lifecycle (init/close), and
# the engine REQUIRES the RocksDB state store provider.
# ---------------------------------------------------------------------------

try:  # Spark 4+
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment]

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user (n_events, sum_value, last_ts) via a named value-state
    handle; emits the updated totals for every key seen in the batch."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total, last_us = (
            self._state.get() if self._state.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, batch_max_us)
        self._state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """running_user_totals through transformWithStateInPandas. The
    caller's session must use the RocksDB state store provider
    (``ROCKSDB_PROVIDER``) — the new API refuses the HDFS-backed
    default — and the environment must provide ``google.protobuf``
    (the API's state-server protocol; the test gates on it via
    importorskip since this container lacks it)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
