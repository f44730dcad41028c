"""CDC-apply query: a deterministic I/U/D change batch derived from the
customer table, merged latest-wins into the customer base snapshot
(operators/cdc.py). Covers: superseded updates (two U's, higher seq
wins), deletes (key vanishes), inserts (new keys appear), untouched
pass-through."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.operators.cdc import apply_cdc
from nyc_taxi_data_engineering_spark.queries.registry import query

_NEW_KEY_OFFSET = 10_000_000


@query(
    "cdc_apply_customers",
    oracle=f"""
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0
            THEN 'upd2-' || CAST(c_custkey AS VARCHAR) ELSE c_name END AS c_name,
       c_nationkey
FROM customer
WHERE c_custkey % 10 <> 3
UNION ALL
SELECT c_custkey + {_NEW_KEY_OFFSET},
       'new-' || CAST(c_custkey + {_NEW_KEY_OFFSET} AS VARCHAR),
       c_nationkey
FROM customer WHERE c_custkey % 10 = 5
""",
)
def q_cdc_apply_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth change batch: keys %10==0 get TWO updates (seq 1 then 2 —
    the seq-2 image must win), %10==3 a delete, %10==5 spawn a brand-new
    inserted key; everything else passes through untouched."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    k = F.col("c_custkey")

    def change(df: DataFrame, seq: int, op: str, name: F.Column) -> DataFrame:
        return df.select(
            "c_custkey",
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            name.alias("c_name"),
            "c_nationkey",
        )

    upd = cust.filter(k % 10 == 0)
    changes = (
        change(upd, 1, "U", F.concat(F.lit("upd1-"), k.cast("string")))
        .unionByName(change(upd, 2, "U", F.concat(F.lit("upd2-"), k.cast("string"))))
        .unionByName(
            change(cust.filter(k % 10 == 3), 1, "D", F.lit(None).cast("string"))
        )
        .unionByName(
            cust.filter(k % 10 == 5).select(
                (k + _NEW_KEY_OFFSET).alias("c_custkey"),
                F.lit(1).alias("seq"),
                F.lit("I").alias("op"),
                F.concat(F.lit("new-"), (k + _NEW_KEY_OFFSET).cast("string")).alias(
                    "c_name"
                ),
                "c_nationkey",
            )
        )
    )
    return apply_cdc(
        cust, changes, "c_custkey", "seq", "op", ["c_name", "c_nationkey"]
    )
