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
