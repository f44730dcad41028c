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


@query(
    "growth_accounting_weekly",
    oracle="""
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(floor(date_diff('day', TIMESTAMP '1970-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS w
    FROM events
),
firsts AS (SELECT user_id, MIN(w) AS first_w FROM uw GROUP BY user_id),
flags AS (
    SELECT u.user_id, u.w,
           CASE WHEN u.w = f.first_w THEN 1 ELSE 0 END AS is_new,
           CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_retained
    FROM uw u
    JOIN firsts f ON f.user_id = u.user_id
    LEFT JOIN uw p ON p.user_id = u.user_id AND p.w = u.w - 1
),
act AS (
    SELECT w,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(is_retained) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN is_new = 0 AND is_retained = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resurrected
    FROM flags GROUP BY w
),
churn AS (
    SELECT p.w + 1 AS w, CAST(COUNT(*) AS BIGINT) AS n_churned
    FROM uw p LEFT JOIN uw c ON c.user_id = p.user_id AND c.w = p.w + 1
    WHERE c.user_id IS NULL
    GROUP BY p.w + 1
)
SELECT a.w AS week, a.n_active, a.n_new, a.n_retained, a.n_resurrected,
       COALESCE(ch.n_churned, CAST(0 AS BIGINT)) AS n_churned,
       CASE WHEN COALESCE(ch.n_churned, 0) > 0
            THEN CAST(a.n_new + a.n_resurrected AS DOUBLE)
                 / CAST(ch.n_churned AS DOUBLE) END AS quick_ratio
FROM act a LEFT JOIN churn ch ON ch.w = a.w
ORDER BY week
""",
)
def q_growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the Social-Capital decomposition of
    active users into NEW (first week), RETAINED (also active the prior
    week), RESURRECTED (returned after a gap), and CHURNED (active
    prior week, gone now), plus the quick ratio
    (new + resurrected) / churned. Weeks are epoch-day/7 buckets (no
    engine-dependent ISO-week edge cases). One distinct to the
    user-week grain, a min-agg for firsts, and two self-joins keyed on
    (user, week±1) — all hash-partitioned equi-joins on the user key;
    no windows over the fact."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_engineering_spark.catalog import load_table_parallel as load_table

    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            / F.lit(7.0)
        )
        .cast("bigint")
        .alias("w"),
    ).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("w").alias("first_w"))
    prev = uw.select("user_id", (F.col("w") + 1).alias("w"))
    flags = (
        uw.join(firsts, "user_id")
        .join(
            prev.withColumnRenamed("user_id", "p_user").withColumnRenamed("w", "p_w"),
            (F.col("user_id") == F.col("p_user")) & (F.col("w") == F.col("p_w")),
            "left",
        )
        .select(
            "w",
            F.when(F.col("w") == F.col("first_w"), 1).otherwise(0).alias("is_new"),
            F.when(F.col("p_user").isNotNull(), 1).otherwise(0).alias("is_retained"),
        )
    )
    act = flags.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum("is_new").cast("bigint").alias("n_new"),
        F.sum("is_retained").cast("bigint").alias("n_retained"),
        F.sum(
            F.when((F.col("is_new") == 0) & (F.col("is_retained") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    nxt = uw.select(F.col("user_id").alias("c_user"), F.col("w").alias("c_w"))
    churn = (
        uw.join(
            nxt,
            (F.col("user_id") == F.col("c_user")) & (F.col("c_w") == F.col("w") + 1),
            "left",
        )
        .filter(F.col("c_user").isNull())
        .groupBy((F.col("w") + 1).alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    qr = F.when(
        F.coalesce(F.col("n_churned"), F.lit(0)) > 0,
        (F.col("n_new") + F.col("n_resurrected")).cast("double")
        / F.col("n_churned").cast("double"),
    )
    return (
        act.join(churn, "w", "left")
        .select(
            F.col("w").alias("week"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0).cast("bigint")).alias("n_churned"),
            qr.alias("quick_ratio"),
        )
        .orderBy("week")
    )
