"""Streaming ingest into the pure-Python Delta log: a foreachBatch
sink that appends each micro-batch as one partitioned Delta commit,
EXACTLY-ONCE across checkpoint recovery.

This is the lakehouse landing pattern the reference's Delta zones
imply (``raw_to_validated_delta.py:41-46`` partitioned Delta sink +
the streaming day's foreachBatch bridge) re-expressed on the
protocol-level log: Structured Streaming's checkpoint guarantees each
batch id is REPROCESSED at least once after a crash, so the sink must
be idempotent per batch. Delta's answer — and ours — is the ``txn``
action: every commit records ``(appId, batchId)``; a replayed batch
at-or-below the table's committed watermark for this appId is skipped
before any file is written. The (txn, add*) pair is ONE atomic commit
(put-if-absent hard link), so there is no window where data landed but
the marker didn't.

Scale notes: each micro-batch append is O(batch) — Spark writes the
partition-laid-out files in parallel, the commit is one small JSON.
Partitioning by event date keeps downstream reads partition-pruned
(read_delta_log predicates), and small per-batch files are the
documented compact_delta/OPTIMIZE trade: ingest fast, compact behind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from nyc_taxi_data_engineering_spark.sources.delta_log import (
    last_txn_version,
    write_delta,
)
from nyc_taxi_data_engineering_spark.streaming.runner import foreach_batch_sink


def delta_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    app_id: str,
    partition_by: list[str] | str | None = None,
) -> bool:
    """Append one micro-batch as one Delta commit; returns False (and
    writes nothing) when the table's txn watermark for ``app_id``
    shows this batch id already committed — the replay-after-recovery
    case."""
    last = last_txn_version(table_path, app_id)
    if last is not None and batch_id <= last:
        return False
    write_delta(
        batch,
        table_path,
        mode="append",
        operation="STREAMING UPDATE",
        partition_by=partition_by,
        txn=(app_id, batch_id),
    )
    return True


def delta_stream_sink(
    result: DataFrame,
    checkpoint_dir: str,
    table_path: str,
    app_id: str,
    partition_by: list[str] | str | None = None,
) -> StreamingQuery:
    """Drain ``result`` (availableNow) into a Delta table, one commit
    per micro-batch, exactly-once via the txn watermark."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        delta_ingest_batch(batch, batch_id, table_path, app_id, partition_by)

    return foreach_batch_sink(result, checkpoint_dir, _sink)


def ingest_events_to_delta(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    app_id: str = "events-ingest",
    max_files_per_trigger: int | None = 1,
) -> int:
    """File-source events stream → date-partitioned Delta table.
    ``maxFilesPerTrigger=1`` makes each staged file one micro-batch
    (one commit, one txn bump) — the Kafka-less stand-in for a
    continuous feed. Returns the table's final version."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_engineering_spark.sources.delta_log import latest_version
    from nyc_taxi_data_engineering_spark.streaming.runner import read_events_stream

    stream = read_events_stream(spark, source_dir, max_files_per_trigger).withColumn(
        "event_date", F.to_date("ts")
    )
    delta_stream_sink(
        stream, checkpoint_dir, table_path, app_id, partition_by="event_date"
    )
    v = latest_version(table_path)
    if v is None:
        raise RuntimeError(f"stream drained but no Delta commit at {table_path}")
    return v


def delta_upsert_batch(
    batch: DataFrame,
    batch_id: int,
    table_path: str,
    app_id: str,
    on: str | list[str],
) -> bool:
    """UPSERT one micro-batch (MERGE latest-wins by key) as one Delta
    commit, exactly-once via the txn watermark — the streaming-CDC
    landing pattern (foreachBatch + MERGE INTO). Returns False without
    touching the table when this batch id is at-or-below the committed
    watermark; a replayed batch after crash recovery is therefore a
    no-op even though MERGE rewrites data. A genuinely-no-op merge
    commits nothing (replaying a no-op is safe by construction).

    The batch must be key-unique on ``on`` (compact CDC feeds are;
    pre-aggregate latest-per-key upstream otherwise — MERGE with
    duplicate source keys would insert duplicates). The first batch
    bootstraps the table."""
    from nyc_taxi_data_engineering_spark.sources.delta_log import (
        is_delta_table,
        merge_delta,
        write_delta,
    )

    if not is_delta_table(table_path):
        write_delta(
            batch, table_path, mode="overwrite", operation="MERGE",
            txn=(app_id, batch_id),
        )
        return True
    last = last_txn_version(table_path, app_id)
    if last is not None and batch_id <= last:
        return False
    merge_delta(
        batch.sparkSession,
        table_path,
        batch,
        on=on,
        txn=(app_id, batch_id),
    )
    return True


def delta_upsert_sink(
    result: DataFrame,
    checkpoint_dir: str,
    table_path: str,
    app_id: str,
    on: str | list[str],
) -> StreamingQuery:
    """Drain ``result`` (availableNow) into a Delta table as per-batch
    MERGE upserts, exactly-once via the txn watermark."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        delta_upsert_batch(batch, batch_id, table_path, app_id, on)

    return foreach_batch_sink(result, checkpoint_dir, _sink)
