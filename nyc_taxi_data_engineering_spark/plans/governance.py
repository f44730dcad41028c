"""Governance gate (reference C8): a data-driven PASS/FAIL decision over
run metrics — the Spark re-expression of the DQ Lambda
(lambda/dq-governance-gate/lambda_function.py:39-120, lambda.py:49-116).

The gate consumes the run-metrics table (records_read/valid/quarantined),
computes quality %, and emits one decision row per run. Stage coupling is
data-at-rest exactly like the reference: the gate never shares memory with
the producing job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.functions import pct


def governance_gate(run_metrics: DataFrame, quality_threshold: float = 95.0) -> DataFrame:
    """Per-run decision: quality_pct = valid/read*100 vs threshold.

    Output: run_id, job_name, records_read, records_valid,
    records_quarantined, quality_pct, threshold, decision (PASS|FAIL).
    """
    return (
        run_metrics.withColumn(
            "quality_pct", pct(F.col("records_valid"), F.col("records_read"))
        )
        .withColumn("threshold", F.lit(float(quality_threshold)))
        .withColumn(
            "decision",
            F.when(
                F.coalesce(F.col("quality_pct"), F.lit(0.0)) >= F.col("threshold"), F.lit("PASS")
            ).otherwise(F.lit("FAIL")),
        )
        .select(
            "run_id", "job_name", "records_read", "records_valid",
            "records_quarantined", "quality_pct", "threshold", "decision",
        )
    )


def latest_run_decision(run_metrics: DataFrame, quality_threshold: float = 95.0) -> DataFrame:
    """Gate only the latest run (reference O4: the Lambda lists metric
    prefixes and picks the newest, dq-governance-gate/lambda_function.py:30-34)
    — here max(run_id) via a broadcast 1-row join, no driver round-trip."""
    latest = run_metrics.agg(F.max("run_id").alias("run_id"))
    return governance_gate(run_metrics.join(F.broadcast(latest), "run_id"), quality_threshold)
