"""TPC-H-adapted decision-support battery.

The synthetic tables are TPC-H-shaped (TESTDATA.md), so the classic
decision-support queries are the natural "can I switch my analytics
here?" acceptance suite — they exercise exactly the optimizer paths a
100 TB deployment lives on: filter pushdown to the parquet scan,
filter-THEN-broadcast dim joins, semi/anti joins instead of IN/NOT IN
materialization, two-level aggregation, correlated-subquery
decorrelation (per-group threshold as a pre-agg + equi-join, never a
per-row subquery), scalar-subquery broadcast, and TakeOrderedAndProject
for top-k instead of a global sort.

Adaptations (the generator's schema is trimmed): no `partsupp`,
`l_commitdate`/`l_receiptdate`/`l_shipmode`, `o_shippriority`,
`c_phone/comment` — Q2/Q11/Q12 have no faithful equivalent (Q21 adapts via the Q4 ship-lag convention) and the
others substitute the nearest available column (noted per query).
Aggregates that feed the exact-hash oracle gate run in EXACT decimal
domain (r10): revenue/charge products cast their exact-2dp sources to
DECIMAL once and multiply in decimal (``_revenue``/``_tax_factor``,
summed by ``dec_sum`` with no intermediate rescale), and plain column
sums ride ``stable_sum``'s decimal transport — so every double matches
DuckDB bit-for-bit. The double-domain shape (product THEN cast) is
banned here: Spark and DuckDB round the double→decimal cast
differently near grid halves (VERDICT r9 #1, the sum_charge break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import (
    dec_sum,
    dec_sum_sql,
    stable_avg,
    stable_avg_sql,
    stable_sum,
    stable_sum_sql,
    stable_sum_unscaled_long,
)
from nyc_taxi_data_engineering_spark.queries.registry import query

def _revenue():
    """Discounted line revenue in EXACT decimal domain (r10, VERDICT r9 #1):
    l_extendedprice / l_discount are exact 2-dp values, so casting each to
    DECIMAL is deterministic in both engines and the product is exact
    (scale 4, no rounding anywhere). The previous double-domain shape
    (ep * (1.0 - disc) then CAST AS DECIMAL(18,4)) double-rounds in DuckDB
    and flipped sum_charge's hash at sf0.01. Lazy: building a Column
    requires an active session."""
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return ep * (F.lit(1).cast("decimal(3,2)") - disc)
_REVENUE_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))"
)


def _tax_factor():
    """(1 + l_tax) on the exact decimal grid — l_tax is an exact 2-dp rate."""
    return F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)")
_TAX_FACTOR_SQL = "(CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"


@query(
    "tpch_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {stable_sum_sql('l_quantity')} AS sum_qty,
       {stable_sum_sql('l_extendedprice')} AS sum_base_price,
       {dec_sum_sql(_REVENUE_SQL)} AS sum_disc_price,
       {dec_sum_sql(_REVENUE_SQL + ' * ' + _TAX_FACTOR_SQL)} AS sum_charge,
       {stable_avg_sql('l_quantity')} AS avg_qty,
       {stable_avg_sql('l_extendedprice')} AS avg_price,
       {stable_avg_sql('l_discount', scale=6)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: ONE scan of lineitem, the shipdate
    predicate pushed to parquet, eight aggregates in a single hash agg
    with map-side partials — at 100 TB this is scan-bound, exactly as
    it should be. disc_price/charge are computed in pinned expression
    shape so the doubles match DuckDB before the decimal transport."""
    li = load_table(spark, sf_dir, "lineitem")
    # Quantity aggregates ride the unscaled-LONG accumulator
    # (optimization r13, VERDICT r12 task 6): l_quantity <= 50 makes the
    # per-group long sum provably overflow-free at the 100 TB design
    # point, and the terminal long->decimal->double conversion is the
    # same single correctly-rounded step stable_sum ends with — values
    # bit-identical (see stable_sum_unscaled_long). sum_qty and
    # avg_qty's numerator share ONE expression so the hash agg computes
    # it once. Price-bearing columns stay on the decimal transport:
    # |l_extendedprice| * 10^4 * rows/group exceeds the long bound.
    qty_sum = stable_sum_unscaled_long("l_quantity")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_sum.alias("sum_qty"),
            stable_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(_revenue()).alias("sum_disc_price"),
            dec_sum(_revenue() * _tax_factor()).alias("sum_charge"),
            (qty_sum / F.count(F.col("l_quantity"))).alias("avg_qty"),
            stable_avg("l_extendedprice").alias("avg_price"),
            stable_avg("l_discount", scale=6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {dec_sum_sql(_REVENUE_SQL)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2001-03-15'
  AND l_shipdate > TIMESTAMP '2001-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (o_orderpriority stands in for the
    missing o_shippriority): segment-filtered customers join filtered
    orders join filtered lineitem, then top-10 unshipped orders by
    revenue. Every filter is pushed below its join; the final top-k is
    TakeOrderedAndProject (no global sort), with l_orderkey as the
    deterministic tie-break."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("2001-03-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("2001-03-15"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(_revenue()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_priority_late_ship",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
)
def q_tpch_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (ship-lag > 90 days stands in
    for the missing l_commitdate/l_receiptdate pair): EXISTS becomes a
    LEFT SEMI join — the probe side never duplicates orders no matter
    how many late lineitems an order has, and Spark plans it as one
    shuffled semi join, not a per-row subquery."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "tpch_local_supplier_volume",
    oracle=f"""
SELECT n_name, {dec_sum_sql(_REVENUE_SQL)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: revenue where the customer and
    the lineitem's supplier share a nation inside one region. The
    supplier/nation/region chain is filtered to the region FIRST and
    broadcast, so the only big-table shuffle is orders⋈lineitem; the
    same-nation condition rides the broadcast join as an extra key."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dec_sum(_revenue()).alias("revenue"))
    )


@query(
    "tpch_revenue_change",
    oracle=f"""
SELECT {dec_sum_sql('CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
""",
)
def q_tpch_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue change: pure scan-filter-aggregate —
    every predicate (date range, discount band, quantity cap) reaches
    the parquet scan as a pushed filter, and the whole query is one
    WholeStageCodegen span with a 1-row result. The canary for 'is
    pushdown actually happening'."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        dec_sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(4,2)")
        ).alias("revenue")
    )


@query(
    "tpch_volume_shipping",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {dec_sum_sql(_REVENUE_SQL)} AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_nationkey <> cn.n_nationkey
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, CAST(year(l_shipdate) AS INT)
""",
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping (all cross-nation pairs rather than one
    fixed pair, so the result is non-degenerate at every SF): the
    nation dim is role-played twice via broadcast, the inequality
    filter runs after both cheap joins, and the only shuffle left is
    the big-fact orders⋈lineitem equi-join plus the final hash agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_sum(_revenue()).alias("revenue"))
    )


@query(
    "tpch_regional_market_share",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       {dec_sum_sql(f"CASE WHEN sr.r_name = 'EUROPE' THEN {_REVENUE_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END")}
         / {dec_sum_sql(_REVENUE_SQL)} AS mkt_share
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region cr ON cr.r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN region sr ON sr.r_regionkey = sn.n_regionkey
WHERE cr.r_name = 'EUROPE'
GROUP BY CAST(year(o_orderdate) AS INT)
""",
)
def q_tpch_regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 market share, regionalized (no fixed target nation so
    every SF has signal): of revenue billed to EUROPE customers, the
    share supplied from inside EUROPE, per order year. The share is a
    conditional sum over the SAME aggregation — one pass, one shuffle —
    and both sums ride the decimal transport so the final division is
    bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    rev = _revenue()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_dim), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dec_sum(
                    F.when(F.col("supp_region") == "EUROPE", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                )
                / dec_sum(rev)
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_parttype_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {dec_sum_sql(_REVENUE_SQL)} AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
""",
)
def q_tpch_parttype_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (discounted revenue stands in for
    profit — no partsupp.ps_supplycost in this schema): the part dim is
    filtered to the target type BEFORE broadcasting, so the lineitem
    scan is cut by the broadcast hash join's runtime filter rather than
    shuffled against the full part table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dec_sum(_revenue()).alias("sum_profit"))
    )


@query(
    "tpch_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {dec_sum_sql(_REVENUE_SQL)} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by returned
    revenue in a half-year window. Aggregates to customer grain FIRST,
    then joins the tiny grouped result to the dims — the heavy
    orders⋈lineitem join never carries customer attributes, and the
    top-k is TakeOrderedAndProject with c_custkey as tie-break."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    per_cust = (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dec_sum(_revenue()).alias("revenue"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q_tpch_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: the classic
    two-level aggregation. Level 1 shuffles orders once on custkey
    (LEFT join keeps zero-order customers, COUNT(col) skips their NULL
    slot); level 2 is a near-free re-agg on the tiny (custkey,count)
    table. No window, no distinct."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_promotion_effect",
    oracle=f"""
SELECT 100.0 * {dec_sum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END")}
       / {dec_sum_sql(_REVENUE_SQL)} AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def q_tpch_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: promo share of one ship-month's
    revenue. Part joins broadcast (it only contributes a flag), both
    sums are one conditional pass, and the 100*x/y arithmetic happens
    on exact decimal-transported doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01")) & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dec_sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                )
                / dec_sum(rev)
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_top_supplier",
    oracle=f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no, {dec_sum_sql(_REVENUE_SQL)} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue per supplier, keep the
    max (ties included, per spec). The scalar max is a 1-row aggregate
    broadcast back over the tiny per-supplier table — no window, no
    second scan of lineitem — and revenue doubles are exact via the
    decimal transport so the equality join is safe cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(_revenue()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_parts_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11' AND p_size <= 10
GROUP BY p_brand, p_type, p_size
""",
)
def q_tpch_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (lineitem stands in for
    the missing partsupp): distinct suppliers per surviving
    (brand, type, size). COUNT(DISTINCT) expands to a two-stage agg —
    dedupe on (group, suppkey) then count — one extra shuffle on an
    already-reduced table, never a global distinct of the fact."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11") & (F.col("p_size") <= 10)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "tpch_small_quantity_revenue",
    oracle=f"""
WITH part_avg AS (
    SELECT l_partkey AS pk, 0.2 * {stable_avg_sql('l_quantity')} AS qty_threshold
    FROM lineitem GROUP BY l_partkey
)
SELECT {stable_sum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#11' AND l_quantity < qty_threshold
""",
)
def q_tpch_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated
    per-part-average subquery DECORRELATED — pre-aggregate lineitem to
    (partkey, 0.2*avg_qty) once, then equi-join the threshold back.
    At 100 TB the naive correlated form re-scans lineitem per part;
    this form is two scans total and the threshold table broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * stable_avg("l_quantity")).alias("qty_threshold")
    )
    brand = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(part_avg), F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((stable_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "tpch_large_volume_customers",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {stable_sum_sql('l_quantity')} AS sum_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING {stable_sum_sql('l_quantity')} > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q_tpch_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds 300. The HAVING filter runs on the orderkey-grain
    aggregate BEFORE any dim join — at scale the survivors are a few
    rows per million orders, so customer attributes join to an already
    tiny table. Top-20 by totalprice, orderkey tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(stable_sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_brand_quantity_revenue",
    oracle=f"""
SELECT {dec_sum_sql(_REVENUE_SQL)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity >= 1 AND l_quantity <= 11 AND p_size <= 5)
   OR (p_brand = 'Brand#12' AND l_quantity >= 10 AND l_quantity <= 20 AND p_size <= 10)
   OR (p_brand = 'Brand#21' AND l_quantity >= 20 AND l_quantity <= 30 AND p_size <= 15)
""",
)
def q_tpch_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (disjunctive predicate): three
    brand/quantity/size bands OR-ed together. The part side of each
    disjunct (brand, size) prunes the broadcast dim; the lineitem side
    (quantity) stays a scan filter — Catalyst splits the conjuncts per
    side rather than evaluating the whole disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & (q >= 1) & (q <= 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#12") & (q >= 10) & (q <= 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#21") & (q >= 20) & (q <= 30) & (F.col("p_size") <= 15))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dec_sum(_revenue()).alias("revenue"))
    )


@query(
    "tpch_promo_part_suppliers",
    oracle=f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING {stable_sum_sql('l_quantity')} > 50
)
""",
)
def q_tpch_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential promotion suppliers (adapted to the trimmed
    schema): suppliers who shipped > 50 units of PROMO parts in 1996.
    The IN-subquery becomes aggregate-then-LEFT-SEMI-join — the
    supplier table is probed once against the tiny qualifying-supplier
    set, never materializing an IN list on the driver."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    promo = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    qualifying = (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(stable_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 50)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")


@query(
    "tpch_dormant_rich_customers",
    oracle=f"""
WITH avg_bal AS (
    SELECT {stable_avg_sql('c_acctbal')} AS threshold
    FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name AS nation, COUNT(*) AS numcust,
       {stable_sum_sql('c_acctbal')} AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
CROSS JOIN avg_bal
WHERE c_acctbal > threshold
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY n_name
""",
)
def q_tpch_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity (nation stands in for the
    missing phone prefix; 'no 2001 orders' for 'never ordered' — this
    generator gives every customer at least one order): customers with
    above-average positive balances and no recent orders, tallied per
    nation. The scalar average broadcasts as a 1-row cross join; NOT
    EXISTS is a LEFT ANTI join against the date-filtered orders scan."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        stable_avg("c_acctbal").alias("threshold")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("numcust"), stable_sum("c_acctbal").alias("totacctbal"))
    )


@query(
    "tpch_waiting_suppliers",
    oracle="""
WITH per_os AS (
    SELECT l_orderkey, l_suppkey,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey, l_suppkey
),
flagged AS (
    SELECT *,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM per_os
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name IN ('NATION_3', 'NATION_7')
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers-who-kept-orders-waiting (ship-lag > 90 days
    stands in for the missing commit/receipt dates, the Q4
    convention): among finished multi-supplier orders, count per
    supplier the orders where it was the ONLY late shipper. The
    correlated EXISTS / NOT EXISTS pair decorrelates into one
    (order, supplier) aggregate plus two windows over the SAME
    order-key partitioning — a single extra shuffle over the already
    order-supplier-collapsed table, never a per-row subquery; the
    supplier/nation dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_os = (
        li.join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "n_late", F.sum("late").over(w)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    return (
        flagged.filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Deterministic partsupp surrogate — closes the Q2/Q11/Q20 gap
# ---------------------------------------------------------------------------
# The generator's schema has no partsupp, so the three classic shapes it
# carries (min-cost-supplier correlated subquery, global-scalar HAVING,
# availability-vs-shipped anti-stock join) had no faithful battery entry.
# Derive one deterministically from part x supplier — the same move the
# driver uses to derive documents/embeddings from the TPC-H keys: each
# part gets PS_REPLICAS suppliers by the TPC-H spread formula
# (p + i*(S//4)) mod S computed against the OBSERVED supplier count (so
# it scales with sf), and availqty/supplycost come from the md5 bucket
# transport (operators/sampling.hash_bucket) that both engines evaluate
# identically. Zero storage: the surrogate is a 4x|part| projection
# rebuilt inside each query, pennies next to any lineitem scan.

from nyc_taxi_data_engineering_spark.operators.sampling import (  # noqa: E402
    hash_bucket,
    hash_bucket_sql,
)

PS_REPLICAS = 4  # suppliers per part, as in TPC-H partsupp

_PS_KEY_SQL = "CAST(ps_partkey AS VARCHAR) || '#' || CAST(ps_suppkey AS VARCHAR)"
_PARTSUPP_SQL = f"""partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           {hash_bucket_sql(_PS_KEY_SQL, seed="psq", n_buckets=9999)} + 1 AS ps_availqty,
           CAST({hash_bucket_sql(_PS_KEY_SQL, seed="psc", n_buckets=99999)} + 1 AS DOUBLE)
             / 100.0 AS ps_supplycost
    FROM (
        SELECT DISTINCT p_partkey AS ps_partkey,
               (p_partkey + r.i * (GREATEST((SELECT COUNT(*) FROM supplier), 1) // 4))
                 % GREATEST((SELECT COUNT(*) FROM supplier), 1) AS ps_suppkey
        FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS r(i)
    )
)"""
# DISTINCT + GREATEST (ADVICE r9): with fewer than 4 suppliers the spread
# S//4 degenerates to 0 and all replicas collapse onto one supplier —
# DISTINCT stops the surrogate from carrying duplicate (part,supplier)
# rows that would silently quadruple Q11 stock values; GREATEST(S,1)
# keeps the modulus legal on an empty supplier tier (DuckDB throws on
# % 0, Spark yields NULL — an engine divergence).


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_PARTSUPP_SQL``: part x 4-row range crossJoin
    (both broadcast — no shuffle), keys spread by the observed supplier
    count, attributes from the shared md5 bucket transport."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(
        F.greatest(F.count(F.lit(1)), F.lit(1).cast("long")).alias("s_count")
    )
    reps = spark.range(PS_REPLICAS).select(F.col("id").alias("i"))
    ps = (
        part.crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") + F.col("i") * F.floor(F.col("s_count") / F.lit(4)))
                % F.col("s_count")
            )
            .cast("bigint")
            .alias("ps_suppkey"),
        )
        .distinct()  # fewer than 4 suppliers collapses the spread (see SQL twin)
    )
    key = F.concat(
        F.col("ps_partkey").cast("string"),
        F.lit("#"),
        F.col("ps_suppkey").cast("string"),
    )
    return ps.select(
        "ps_partkey",
        "ps_suppkey",
        (hash_bucket(key, seed="psq", n_buckets=9999) + F.lit(1)).alias("ps_availqty"),
        (
            (hash_bucket(key, seed="psc", n_buckets=99999) + F.lit(1)).cast("double")
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


@query(
    "tpch_min_cost_supplier",
    oracle=f"""
WITH {_PARTSUPP_SQL},
eur AS (
    SELECT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
),
cand AS (
    SELECT p.p_partkey, p.p_type, ps.ps_supplycost, e.s_acctbal, e.s_name, e.n_name
    FROM part p
    JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
    JOIN eur e ON e.s_suppkey = ps.ps_suppkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
),
mc AS (SELECT p_partkey, MIN(ps_supplycost) AS min_cost FROM cand GROUP BY p_partkey)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_type, c.ps_supplycost
FROM cand c JOIN mc ON mc.p_partkey = c.p_partkey AND c.ps_supplycost = mc.min_cost
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
LIMIT 100
""",
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (min-cost supplier): for mid-size STANDARD parts, the
    EUROPE supplier(s) at each part's minimum supply cost. The
    correlated scalar subquery (cost = min cost for that part in that
    region) decorrelates into one per-part MIN aggregate equi-joined
    back onto the candidate set — never a per-row subquery; the
    region-filtered supplier/nation dims broadcast, and the double
    equality join on min_cost is exact because both engines derive the
    identical hash-grid costs. Top-100 by account balance via
    TakeOrderedAndProject, not a global sort."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(part.select("p_partkey", "p_type")), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_type", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mc = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        cand.join(
            F.broadcast(mc),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_important_stock",
    oracle=f"""
WITH {_PARTSUPP_SQL},
asia AS (
    SELECT s.s_suppkey
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
),
v AS (
    SELECT ps_partkey,
           SUM(CAST(ps_availqty AS BIGINT)
               * CAST(round(ps_supplycost * 100.0, 0) AS BIGINT)) AS value_cents
    FROM partsupp JOIN asia ON asia.s_suppkey = partsupp.ps_suppkey
    GROUP BY ps_partkey
),
tot AS (SELECT SUM(value_cents) AS total_cents, CAST(COUNT(*) AS BIGINT) AS n_parts FROM v)
SELECT v.ps_partkey, CAST(v.value_cents AS DOUBLE) / 100.0 AS stock_value
FROM v, tot
WHERE v.value_cents * tot.n_parts > 2 * tot.total_cents
ORDER BY stock_value DESC, v.ps_partkey
""",
)
def q_tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose ASIA-held stock value
    exceeds DOUBLE the average per-part value — the global-scalar
    HAVING shape (the fraction threshold made scale-free so the query
    stays non-degenerate at every sf: value*n > 2*total in pure BIGINT
    cents, exact in both engines, no double rounding anywhere near the
    filter). One keyed agg over the surrogate partsupp, a 1-row
    broadcast of (total, n), and an integer comparison."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    v = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(asia), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_availqty").cast("bigint")
                * F.round(F.col("ps_supplycost") * F.lit(100.0), 0).cast("bigint")
            ).alias("value_cents")
        )
    )
    tot = v.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("n_parts") > F.lit(2) * F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / F.lit(100.0)).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "ps_partkey")
    )


@query(
    "tpch_excess_stock",
    oracle=f"""
WITH {_PARTSUPP_SQL},
small_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
shipped AS (
    SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_partkey, l_suppkey
),
excess AS (
    SELECT DISTINCT ps.ps_suppkey
    FROM partsupp ps
    JOIN small_parts sp ON sp.p_partkey = ps.ps_partkey
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
    WHERE CAST(ps.ps_availqty AS DECIMAL(18,2)) * 2 > sh.qty
)
SELECT s.s_name, n.n_name
FROM excess e
JOIN supplier s ON s.s_suppkey = e.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_name
""",
)
def q_tpch_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess stock, faithful now that partsupp exists):
    suppliers holding more than half a year's shipped quantity of any
    'small%' part they stock. The nested IN-subquery chain decorrelates
    into: one pushed-down-filtered lineitem agg (the only fact scan),
    an equi-join against the surrogate partsupp on (part, supplier),
    the availability comparison in exact DECIMAL (a 1-ulp double flip
    here would change row MEMBERSHIP, not a value), then distinct
    suppliers joined to broadcast dims."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    excess = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(part.select("p_partkey")), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty").cast("decimal(18,2)") * F.lit(2) > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        excess.join(F.broadcast(sup), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q12 faithful — shipmode / commit / receipt surrogates
# ---------------------------------------------------------------------------
# Same precedent as partsupp: the generator's lineitem is trimmed of
# l_shipmode/l_commitdate/l_receiptdate, so derive them deterministically
# per line from the md5 bucket transport — shipmode uniform over the 7
# TPC-H modes, commitdate within +-30 days of ship, receiptdate 1..30
# days after ship — identically in both engines. The columns are
# semantically arbitrary but the QUERY SHAPE (multi-channel conditional
# counts under a 3-way date-ordering predicate) is the faithful Q12.
# The same surrogates would upgrade Q21 to strict receipt>commit
# lateness; its adapted twin (tpch_waiting_suppliers) already exercises
# that exact join/window shape under the ship-lag convention.

_SHIPMODES = ("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")
_LI_KEY_SQL = "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
_SHIPMODE_LIST_SQL = "[" + ", ".join(f"'{m}'" for m in _SHIPMODES) + "]"


@query(
    "tpch_shipmode_priority",
    oracle=f"""
WITH li AS (
    SELECT l_orderkey,
           ({_SHIPMODE_LIST_SQL})[{hash_bucket_sql(_LI_KEY_SQL, seed="mode", n_buckets=7)} + 1]
             AS l_shipmode,
           CAST(l_shipdate AS DATE)
             + ({hash_bucket_sql(_LI_KEY_SQL, seed="commit", n_buckets=61)} - 30)
             AS l_commitdate,
           CAST(l_shipdate AS DATE)
             + (1 + {hash_bucket_sql(_LI_KEY_SQL, seed="receipt", n_buckets=30)})
             AS l_receiptdate,
           CAST(l_shipdate AS DATE) AS l_shipdate
    FROM lineitem
)
SELECT li.l_shipmode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
WHERE li.l_shipmode IN ('MAIL', 'SHIP')
  AND li.l_commitdate < li.l_receiptdate
  AND li.l_shipdate < li.l_commitdate
  AND li.l_receiptdate >= DATE '1997-01-01'
  AND li.l_receiptdate < DATE '1998-01-01'
GROUP BY li.l_shipmode
ORDER BY li.l_shipmode
""",
)
def q_tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipmode priority, faithful via the surrogate
    transport): for late-committed MAIL/SHIP lines received in 1997,
    urgent-vs-other line counts per mode. The three derived columns are
    pure per-row projections (no shuffle added); the mode + date
    predicates filter BEFORE the orders join, and the join stays a
    keyed equi-join with the priority CASE folded into one hash agg
    with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    modes = F.array(*[F.lit(m) for m in _SHIPMODES])
    ship = F.to_date("l_shipdate")
    li = li.select(
        "l_orderkey",
        F.element_at(modes, hash_bucket(key, seed="mode", n_buckets=7) + F.lit(1)).alias(
            "l_shipmode"
        ),
        F.date_add(ship, hash_bucket(key, seed="commit", n_buckets=61) - F.lit(30)).alias(
            "l_commitdate"
        ),
        F.date_add(
            ship, F.lit(1) + hash_bucket(key, seed="receipt", n_buckets=30)
        ).alias("l_receiptdate"),
        ship.alias("l_shipdate"),
    )
    filtered = li.filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1997-01-01"))
        & (F.col("l_receiptdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(filtered, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


@query(
    "tpch_waiting_suppliers_strict",
    oracle=f"""
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           CAST(l_shipdate AS DATE)
             + ({hash_bucket_sql(_LI_KEY_SQL, seed="commit", n_buckets=61)} - 30)
             AS l_commitdate,
           CAST(l_shipdate AS DATE)
             + (1 + {hash_bucket_sql(_LI_KEY_SQL, seed="receipt", n_buckets=30)})
             AS l_receiptdate
    FROM lineitem
),
per_os AS (
    SELECT li.l_orderkey, li.l_suppkey,
           MAX(CASE WHEN li.l_receiptdate > li.l_commitdate THEN 1 ELSE 0 END) AS late
    FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey AND o.o_orderstatus = 'F'
    GROUP BY li.l_orderkey, li.l_suppkey
),
flagged AS (
    SELECT l_orderkey, l_suppkey, late,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM per_os
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM flagged f
JOIN supplier s ON s.s_suppkey = f.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE f.late = 1 AND f.n_supp > 1 AND f.n_late = 1
  AND n.n_name IN ('NATION_3', 'NATION_7')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 25
""",
)
def q_tpch_waiting_suppliers_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21, STRICT lateness (receipt > commit via the SAME
    surrogate dates as Q12 — one transport, both queries): among
    finished multi-supplier orders, per-supplier count of orders where
    it was the ONLY late shipper. Identical decorrelation as the
    ship-lag twin (tpch_waiting_suppliers): per-(order, supplier) MAX
    late flag, then both EXISTS/NOT EXISTS collapse into two windows
    over ONE order-key partitioning — a single extra shuffle on the
    already-collapsed table; supplier/nation dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linenumber", "l_shipdate"
    )
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    ship = F.to_date("l_shipdate")
    li = li.select(
        "l_orderkey",
        "l_suppkey",
        F.date_add(ship, hash_bucket(key, seed="commit", n_buckets=61) - F.lit(30)).alias(
            "l_commitdate"
        ),
        F.date_add(
            ship, F.lit(1) + hash_bucket(key, seed="receipt", n_buckets=30)
        ).alias("l_receiptdate"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    per_os = (
        li.join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_receiptdate") > F.col("l_commitdate"), 1).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_os.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "n_late", F.sum("late").over(w)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    return (
        flagged.filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
