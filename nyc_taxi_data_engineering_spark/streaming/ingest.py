"""Ingestion-side streaming operators: exactly-once event dedup and
stream-static dimension enrichment — the two transforms every event
pipeline runs before windowed aggregation.

Both are batch/stream-agnostic builders like streaming/windows.py: the
batch twin is oracle-checked, and stream==batch tests gate the
streaming path on identical data.

Scale notes: streaming dedup keys state by the id column;
``dropDuplicatesWithinWatermark`` bounds that state to the watermark
horizon (without it, state grows with all-time distinct keys — never
ship that). The stream-static join broadcasts the dim per micro-batch,
so the stream side never shuffles; dim updates are picked up at batch
boundaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.streaming.windows import with_watermark


def dedup_events(events: DataFrame, keys: Sequence[str] = ("event_id",)) -> DataFrame:
    """At-least-once -> exactly-once: drop redelivered events by key.

    Streaming input: watermark + ``dropDuplicatesWithinWatermark`` so
    dedup state is evicted once the horizon passes (redeliveries in
    real systems arrive within seconds, not days). Batch input: plain
    ``dropDuplicates`` — same semantics over a bounded set."""
    if events.isStreaming:
        return with_watermark(events).dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))


def enrich_events_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static left join onto the customer dim (broadcast): every
    event tagged with the customer's market segment. The static side is
    re-resolved per micro-batch, so a refreshed dim table applies
    without restarting the stream."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("mktsegment")
    )
    return events.join(F.broadcast(dim), "user_id", "left")
