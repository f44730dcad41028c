"""Dimension-enrichment queries (reference C2/J1/J2: role-played dims).

Star-schema mapping: the nation dim plays two roles — the supplier's
nation ("pickup") and the ordering customer's nation ("dropoff") —
mirroring the reference's zone dim joined twice
(nyc_validated_to_curated_etl.py:115-139).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import stable_sum
from nyc_taxi_data_engineering_spark.queries.registry import query


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supp_nation = F.broadcast(
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    cust_nation = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    order_nation = orders.join(cust_nation, orders.o_custkey == cust_nation.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    return (
        li.join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .join(order_nation, li.l_orderkey == order_nation.o_orderkey)
        .select(
            "l_orderkey", "l_linenumber", "supp_nation", "cust_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "enrich_lineitem_nations",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, ns.n_name AS supp_nation, nc.n_name AS cust_nation
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
""",
)
def q_enrich_lineitem_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _enriched(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "supp_nation", "cust_nation"
    )


@query(
    "trade_flows_by_nation",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
         AS total_revenue,
       COUNT(*) AS line_count
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
GROUP BY ns.n_name, nc.n_name
""",
    bench=True,
)
def q_trade_flows_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-heavy headline agg: two broadcast dim hops + one
    big-big join (lineitem ⋈ orders) + hash agg on a 625-cell grid."""
    return (
        _enriched(spark, sf_dir)
        .groupBy("supp_nation", "cust_nation")
        .agg(
            stable_sum("revenue").alias("total_revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "salted_enrich_order_priorities",
    oracle="""
SELECT o.o_orderpriority AS priority, n.n_name AS region_name,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY o.o_orderpriority, n.n_name
""",
)
def q_salted_enrich_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-JOIN lever on a driver-verifiable path: orders join
    their customer (then nation name) through ``salted_join`` with
    salt_n=4, so the shuffle key is (o_custkey, salt) — the explicit
    defense when one customer's orders exceed a reducer and the dim is
    too large to broadcast (here it's broadcast-able; the query exists
    to keep the lever's semantics — result identical to the unsalted
    join — under the oracle gate). The dim side replicates 4x, the
    canonical salted-join cost. Decimal-exact price sums keep the
    two-phase agg order-independent."""
    from nyc_taxi_data_engineering_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    fact = orders.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    joined = salted_join(
        fact, cust, on="c_custkey", salt_n=4, fingerprint_cols=["o_orderkey"]
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority"), F.col("n_name").alias("region_name")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
    )
