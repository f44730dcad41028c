"""Profiling queries: the generic single-pass table profiler applied
to the star schema (orders: mixed int/string/float/timestamp columns —
exercises every stringification branch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.operators.profiling import profile, sql_profile_oracle
from nyc_taxi_data_engineering_spark.queries.registry import query

_ORDERS_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "float"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


@query("profile_orders", oracle=sql_profile_oracle("orders", _ORDERS_COLS))
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "orders"), [c for c, _ in _ORDERS_COLS])
