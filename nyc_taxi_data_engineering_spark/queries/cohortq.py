"""Cohort lifetime-value curves over orders — the acquisition-cohort
companion to the events-side retention triangle
(``user_retention_cohorts``): customers cohort by FIRST-order month,
and each cohort's cumulative revenue per acquired customer unfolds by
months-since-acquisition.

Determinism contract: cohort age is pure integer month arithmetic
(year*12 + month, no months_between floats), revenue rides the
decimal transport end-to-end — the running LTV is a window SUM over
DECIMAL (exact, order-free) with ONE double division by the cohort
size at output. Month labels format engine-natively (date_format vs
strftime) from the same truncated date.

100 TB: orders collapse to per-customer first-order rows (one hash
agg), then to the (cohort x age) grid (second hash agg) — the window
cumsum runs over the grid, which is bounded by months², not by data
size. The only data-sized shuffle is the first-order join back to
orders, an equi-join on the customer key that AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.queries.registry import query

_ORACLE = """
WITH first_order AS (
    SELECT o_custkey, MIN(o_orderdate) AS d0
    FROM orders
    GROUP BY o_custkey
),
sizes AS (
    SELECT date_trunc('month', d0) AS cm, COUNT(*) AS cohort_customers
    FROM first_order
    GROUP BY 1
),
grid AS (
    SELECT date_trunc('month', f.d0) AS cm,
           (year(o.o_orderdate) * 12 + month(o.o_orderdate))
             - (year(f.d0) * 12 + month(f.d0)) AS age_months,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_custkey) AS active_customers,
           SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
)
SELECT strftime(g.cm, '%Y-%m') AS cohort_month,
       g.age_months,
       s.cohort_customers,
       g.active_customers,
       CAST(g.rev AS DOUBLE) AS revenue,
       CAST(SUM(g.rev) OVER (PARTITION BY g.cm ORDER BY g.age_months) AS DOUBLE)
         / s.cohort_customers AS cum_ltv_per_customer
FROM grid g JOIN sizes s ON g.cm = s.cm
ORDER BY cohort_month, age_months
"""


@query("cohort_ltv_customers", oracle=_ORACLE)
def q_cohort_ltv_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (first-order cohort month, months since acquisition):
    orders placed, customers still active, period revenue, and the
    cohort's cumulative LTV per acquired customer."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d0"))
    sizes = (
        first.groupBy(F.date_trunc("month", "d0").alias("cm"))
        .agg(F.count(F.lit(1)).alias("cohort_customers"))
    )
    ym = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    grid = (
        orders.join(first, "o_custkey")
        .groupBy(
            F.date_trunc("month", "d0").alias("cm"),
            (ym(F.col("o_orderdate")) - ym(F.col("d0"))).alias("age_months"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    w = Window.partitionBy("cm").orderBy("age_months")
    return (
        grid.join(sizes, "cm")
        .select(
            F.date_format("cm", "yyyy-MM").alias("cohort_month"),
            F.col("age_months").cast("bigint").alias("age_months"),
            "cohort_customers",
            "active_customers",
            F.col("rev").cast("double").alias("revenue"),
            (F.sum("rev").over(w).cast("double") / F.col("cohort_customers")).alias(
                "cum_ltv_per_customer"
            ),
        )
        .orderBy("cohort_month", "age_months")
    )
