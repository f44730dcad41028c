"""Referential-integrity / set-op / partition-discovery queries
(reference J3–J5, T1, S15, A3–A6 — SURVEY.md §2.3, §2.6, §2.7).

Master dim for the FK gate = suppliers with positive account balance
(the "active master" analog), which leaves real orphans in lineitem so
the anti-join path is exercised non-trivially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import stable_sum, stable_sum_sql
from nyc_taxi_data_engineering_spark.operators.integrity import (
    except_quarantine,
    fk_null_audit,
    integrity_scorecard,
    ri_gate,
)
from nyc_taxi_data_engineering_spark.queries.registry import query
from nyc_taxi_data_engineering_spark.queries.validation import lineitem_checks

_ACTIVE_SUPPLIERS = "SELECT s_suppkey FROM supplier WHERE s_acctbal > 0"


def _active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)


@query(
    "ri_gate_orphans",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_suppkey
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM ({_ACTIVE_SUPPLIERS}) s WHERE s.s_suppkey = l.l_suppkey)
""",
)
def q_ri_gate_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    gate = ri_gate(li, _active_suppliers(spark, sf_dir), "l_suppkey", "s_suppkey")
    return gate.orphans.select("l_orderkey", "l_linenumber", "l_suppkey")


@query(
    "ri_gate_kept_by_supplier",
    oracle=f"""
SELECT l_suppkey, COUNT(*) AS kept_rows
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM ({_ACTIVE_SUPPLIERS}) s WHERE s.s_suppkey = l.l_suppkey)
GROUP BY l_suppkey
""",
    bench=True,
)
def q_ri_gate_kept_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    gate = ri_gate(li, _active_suppliers(spark, sf_dir), "l_suppkey", "s_suppkey")
    return gate.kept.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("kept_rows"))


@query(
    "fk_null_audit",
    oracle=f"""
SELECT COUNT(*) AS orphan_count
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM ({_ACTIVE_SUPPLIERS}) s WHERE s.s_suppkey = l.l_suppkey)
""",
)
def q_fk_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return fk_null_audit(li, _active_suppliers(spark, sf_dir), "l_suppkey", "s_suppkey")


@query(
    "integrity_scorecard",
    oracle=f"""
SELECT 'lineitem' AS dataset,
       COUNT(*) AS total_records,
       CAST(COALESCE(SUM(CASE WHEN s.s_suppkey IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS matched_records,
       CAST(COALESCE(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS orphan_records,
       ROUND(COALESCE(SUM(CASE WHEN s.s_suppkey IS NOT NULL THEN 1 ELSE 0 END), 0) * 100.0
             / COUNT(*), 2) AS match_pct
FROM lineitem l
LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier WHERE s_acctbal > 0) s
  ON l.l_suppkey = s.s_suppkey
""",
)
def q_integrity_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return integrity_scorecard(
        li, _active_suppliers(spark, sf_dir), "l_suppkey", "s_suppkey", dataset="lineitem"
    )


_VALID_SQL = (
    "COALESCE(l_extendedprice > 0, FALSE) AND COALESCE(l_quantity BETWEEN 1 AND 45, FALSE) "
    "AND COALESCE(l_discount BETWEEN 0 AND 0.08, FALSE) AND COALESCE(l_shipdate IS NOT NULL, FALSE)"
)


@query(
    "except_quarantine",
    oracle=f"""
SELECT * FROM lineitem
EXCEPT
SELECT * FROM lineitem WHERE {_VALID_SQL}
""",
)
def q_except_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    from nyc_taxi_data_engineering_spark.operators.validate import validate_split

    valid = validate_split(li, lineitem_checks()).valid
    return except_quarantine(li, valid)


@query(
    "latest_partition_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
""",
)
def q_latest_partition_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-batch discovery (reference S15/A4) without a driver
    round-trip: broadcast-join the 1-row max instead of collect()."""
    orders = load_table(spark, sf_dir, "orders")
    latest = orders.agg(F.max("o_orderdate").alias("o_orderdate"))
    return orders.join(F.broadcast(latest), "o_orderdate").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )


@query(
    "frequent_customers",
    oracle="""
SELECT o_custkey, COUNT(*) AS order_count
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
)
def q_frequent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group-by + HAVING invariant check (reference A3:
    verify_delta_vendors_job.py:57-62)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .filter(F.col("order_count") >= 15)
    )


@query(
    "conditional_counts_orders",
    oracle="""
SELECT COUNT(*) AS total_orders,
       CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_custkey,
       CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS nonpositive_total,
       CAST(COALESCE(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS high_value,
       ROUND(COALESCE(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END), 0) * 100.0
             / COUNT(*), 2) AS high_value_pct
FROM orders
""",
)
def q_conditional_counts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/negative/ratio counters (reference A6/A8:
    qc_positive_amounts.sql:27-29, test_no_null_vendor.sql:21-23,
    glue_mdm.py:63-65) — one aggregate pass."""
    orders = load_table(spark, sf_dir, "orders")
    from nyc_taxi_data_engineering_spark.functions import pct

    return orders.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.coalesce(F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)), F.lit(0)).alias(
            "null_custkey"
        ),
        F.coalesce(F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)), F.lit(0)).alias(
            "nonpositive_total"
        ),
        F.coalesce(F.sum(F.when(F.col("o_totalprice") > 400000, 1).otherwise(0)), F.lit(0)).alias(
            "high_value"
        ),
    ).withColumn("high_value_pct", pct(F.col("high_value"), F.col("total_orders")))


@query(
    "orders_lineitem_reconciliation",
    oracle=f"""
WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 0),
la AS (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         {stable_sum_sql('l_extendedprice')} AS gross
  FROM lineitem WHERE l_orderkey % 3 <> 0 GROUP BY 1
)
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'LINEITEM_ONLY'
            WHEN la.l_orderkey IS NULL THEN 'ORDER_ONLY'
            ELSE 'BOTH' END AS status,
       COUNT(*) AS n_keys,
       CAST(COALESCE(SUM(n_lines), 0) AS BIGINT) AS n_lines,
       CAST(CAST(SUM(CAST(gross AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS gross_value
FROM o FULL OUTER JOIN la ON o.o_orderkey = la.l_orderkey
GROUP BY 1
""",
)
def q_orders_lineitem_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation via FULL OUTER join — the audit shape
    for 'does every order have lines and every line an order', with
    planted one-sided keys on both sides (%5 orders dropped, %3
    lineitems dropped). The fact side pre-aggregates to one row per
    orderkey before the join, so the full-outer carries |keys| rows,
    not |lineitem| — at 100 TB the join input is already the rollup.
    Null-side detection must use the JOIN KEYS (never payload columns,
    which can be legitimately null)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 != 0)
        .select("o_orderkey")
    )
    la = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 != 0)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            stable_sum("l_extendedprice").alias("gross"),
        )
    )
    joined = o.join(la, o.o_orderkey == la.l_orderkey, "full_outer")
    status = (
        F.when(F.col("o_orderkey").isNull(), F.lit("LINEITEM_ONLY"))
        .when(F.col("l_orderkey").isNull(), F.lit("ORDER_ONLY"))
        .otherwise(F.lit("BOTH"))
    )
    return (
        joined.select(status.alias("status"), "n_lines", "gross")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.coalesce(F.sum("n_lines"), F.lit(0)).alias("n_lines"),
            F.sum(F.col("gross").cast("decimal(18,4)")).cast("double").alias("gross_value"),
        )
    )


def _bloom_oracle() -> str:
    from nyc_taxi_data_engineering_spark.operators.bloom import bloom_positions_sql

    build_pos = bloom_positions_sql("key")
    probe_pos = bloom_positions_sql("l_orderkey")
    bits = "\n    UNION ".join(f"SELECT DISTINCT {p} AS bit FROM bk" for p in build_pos)
    probe_where = "\n      AND ".join(f"{p} IN (SELECT bit FROM bits)" for p in probe_pos)
    return f"""
WITH bk AS (SELECT o_orderkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'),
bits AS (
    {bits}
),
pass AS (
    SELECT l_orderkey FROM lineitem
    WHERE {probe_where}
)
SELECT
  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT key FROM bk)) AS n_exact,
  (SELECT COUNT(*) FROM pass) AS n_bloom_pass,
  (SELECT COUNT(*) FROM pass)
    - (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT key FROM bk)) AS false_positives,
  (SELECT COUNT(*) FROM bits) AS n_bits_set
"""


@query("bloom_semijoin_lineitem", oracle=_bloom_oracle())
def q_bloom_semijoin_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter semi-join prefilter (operators/bloom):
    fold the urgent orders' keys into a 131072-bit filter held as a
    broadcastable set-bit DataFrame, pass lineitem through k=3
    broadcast left-semi joins (probe side never shuffles), and audit
    the filter against the exact semi-join: n_bloom_pass >= n_exact
    always (no false negatives, a Bloom guarantee the oracle re-proves
    bit-for-bit), with the md5-deterministic false-positive count
    exposed. The explicit version of AQE's runtime bloom pushdown for
    pruning a 100 TB probe before its shuffle."""
    from nyc_taxi_data_engineering_spark.operators.bloom import bloom_build, bloom_prefilter

    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bits = bloom_build(urgent, "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    passed = bloom_prefilter(li, "l_orderkey", bits)
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_exact = li.join(
        F.broadcast(urgent), li["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    return (
        n_exact.crossJoin(n_pass)
        .crossJoin(n_bits)
        .select(
            "n_exact",
            "n_bloom_pass",
            (F.col("n_bloom_pass") - F.col("n_exact")).alias("false_positives"),
            "n_bits_set",
        )
    )
