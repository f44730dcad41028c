"""Lineage emission (reference C9:
lambda/write_data_lineage/lambda_function.py:14-55,
governance/lineage_schema.json:1-15).

One append-only row per pipeline hop; coupling between stages stays
data-at-rest exactly like the reference (SURVEY §3.1 step 4's key
design fact) — the lineage table is an audit artifact, never a control
channel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_data_engineering_spark.schemas import LINEAGE_SCHEMA


@dataclass(frozen=True)
class LineageHop:
    pipeline_name: str
    pipeline_stage: str
    source_layer: str
    source_dataset: str
    dataset_layer: str
    dataset_name: str
    transformation_name: str
    transformation_type: str
    created_by: str = "engine"
    created_at: str = "1970-01-01 00:00:00"  # injected clock
    is_active: bool = True
    lineage_version: int = 1


def lineage_row(spark: SparkSession, hop: LineageHop) -> DataFrame:
    import datetime as _dt

    values = [
        hop.pipeline_name, hop.pipeline_stage, hop.source_layer, hop.source_dataset,
        hop.dataset_layer, hop.dataset_name, hop.transformation_name,
        hop.transformation_type, hop.created_by,
        _dt.datetime.fromisoformat(hop.created_at), hop.is_active, hop.lineage_version,
    ]
    return spark.createDataFrame([values], LINEAGE_SCHEMA)


def lineage_table(spark: SparkSession, hops: list[LineageHop]) -> DataFrame:
    import datetime as _dt

    rows = [
        [
            h.pipeline_name, h.pipeline_stage, h.source_layer, h.source_dataset,
            h.dataset_layer, h.dataset_name, h.transformation_name,
            h.transformation_type, h.created_by,
            _dt.datetime.fromisoformat(h.created_at), h.is_active, h.lineage_version,
        ]
        for h in hops
    ]
    return spark.createDataFrame(rows, LINEAGE_SCHEMA)
