"""Typed schema registry (reference §1.3: explicit StructTypes + cast
projections instead of schema-on-read inference).

The trip/zone/vendor schemas mirror the reference's enforced 18-column
trip schema (/root/reference/glue_jobs/nyc_raw_to_validated_etl.py:43-62),
zone dim (nyc_validated_to_curated_etl.py:106-113) and SCD2 master
(sql/scd/01_scd_schema.sql:25-53). The star-schema mapping used by the
correctness harness is FIXTURES.md §"Mapping": fact ↔ lineitem+orders,
zone dim ↔ nation/region, vendor master ↔ supplier, SCD2 target ↔
customer.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRIP_SCHEMA = T.StructType(
    [
        T.StructField("vendorid", T.IntegerType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("passenger_count", T.IntegerType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("ratecodeid", T.IntegerType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("pulocationid", T.IntegerType()),
        T.StructField("dolocationid", T.IntegerType()),
        T.StructField("payment_type", T.IntegerType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("extra", T.DoubleType()),
        T.StructField("mta_tax", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("tolls_amount", T.DoubleType()),
        T.StructField("improvement_surcharge", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("congestion_surcharge", T.DoubleType()),
    ]
)

ZONE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("locationid", T.IntegerType(), False),
        T.StructField("borough", T.StringType()),
        T.StructField("zone", T.StringType()),
        T.StructField("service_zone", T.StringType()),
    ]
)

VENDOR_SCHEMA = T.StructType(
    [
        T.StructField("vendor_id", T.IntegerType(), False),
        T.StructField("vendor_name", T.StringType()),
        T.StructField("vendor_address", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
    ]
)

RUN_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("job_name", T.StringType()),
        T.StructField("records_read", T.LongType()),
        T.StructField("records_valid", T.LongType()),
        T.StructField("records_quarantined", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_name", T.StringType()),
        T.StructField("pipeline_stage", T.StringType()),
        T.StructField("source_layer", T.StringType()),
        T.StructField("source_dataset", T.StringType()),
        T.StructField("dataset_layer", T.StringType()),
        T.StructField("dataset_name", T.StringType()),
        T.StructField("transformation_name", T.StringType()),
        T.StructField("transformation_type", T.StringType()),
        T.StructField("created_by", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("is_active", T.BooleanType()),
        T.StructField("lineage_version", T.IntegerType()),
    ]
)

# SCD2 bookkeeping columns appended to any business schema
# (reference: record_hash/effective_start_ts/effective_end_ts/is_current/
# version_no, sql/scd/01_scd_schema.sql:33-38).
SCD2_META_COLS = (
    "record_hash",
    "effective_start_ts",
    "effective_end_ts",
    "is_current",
    "version_no",
)

SCD2_OPEN_END_TS = "9999-12-31 00:00:00"
