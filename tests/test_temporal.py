"""Unit tests for temporal joins (operators/temporal.py): interval
containment, boundary semantics (start inclusive, end exclusive), and
nearest-prior selection."""

from __future__ import annotations

import datetime as dt

from nyc_taxi_data_engineering_spark.operators.temporal import asof_join, point_in_time_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_point_in_time_interval_and_boundaries(spark):
    versions = spark.createDataFrame(
        [
            (1, "v1", _ts("2024-01-01"), _ts("2024-01-15")),
            (1, "v2", _ts("2024-01-15"), _ts("9999-12-31")),
        ],
        "k long, val string, effective_start_ts timestamp, effective_end_ts timestamp",
    )
    events = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-10")),  # inside v1
            (101, 1, _ts("2024-01-15")),  # exactly at boundary -> v2 (end exclusive)
            (102, 1, _ts("2024-06-01")),  # open-ended v2
            (103, 2, _ts("2024-01-10")),  # unknown key -> dropped (inner)
        ],
        "event_id long, k long, ts timestamp",
    )
    got = {
        r["event_id"]: r["val"]
        for r in point_in_time_join(events, versions, "k", "k", "ts").collect()
    }
    assert got == {100: "v1", 101: "v2", 102: "v2"}


def test_asof_join_picks_nearest_prior(spark):
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01"), 10.0), (1, _ts("2024-01-05"), 20.0), (1, _ts("2024-01-09"), 30.0)],
        "k long, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(7, 1, _ts("2024-01-06")), (8, 1, _ts("2024-01-09"))],
        "trade_id long, k long, tts timestamp",
    )
    got = {
        r["trade_id"]: r["px"]
        for r in asof_join(trades, quotes, "k", "tts", "qts", "trade_id").collect()
    }
    # trade 7 sees the 01-05 quote; trade 8 sees the equal-timestamp 01-09 quote
    assert got == {7: 20.0, 8: 30.0}
