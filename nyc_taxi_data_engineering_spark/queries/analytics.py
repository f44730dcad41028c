"""Beyond-reference analytic operators the engine should own as a
query engine: ROLLUP/CUBE grouping-sets aggregation, top-k-per-group
and lag/lead windows, exact percentiles, INTERSECT, and point-in-time
(as-of) enrichment against SCD2 versions — all exact-oracle-checked.

The reference has none of these (SURVEY §2.4: "Not present:
median/percentiles, grouping sets/cube/rollup"; §2.5: no lag/lead;
§2.7: "No intersect"; §2.3: no as-of/range joins) — they are the
standard next asks of any analytics engine, and the as-of join is what
makes SCD2 masters leakage-safe for training-data assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import stable_sum, stable_sum_sql
from nyc_taxi_data_engineering_spark.operators.scd2 import scd2_apply
from nyc_taxi_data_engineering_spark.operators.temporal import point_in_time_join, range_join
from nyc_taxi_data_engineering_spark.queries.registry import query
from nyc_taxi_data_engineering_spark.queries.scd2 import KEY, TRACKED


@query(
    "orders_rollup_nation_year",
    oracle=f"""
SELECT COALESCE(n_name, '(all)') AS nation,
       COALESCE(CAST(year(o_orderdate) AS INT), -1) AS order_year,
       COUNT(*) AS n_orders,
       {stable_sum_sql('o_totalprice')} AS total_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, year(o_orderdate))
HAVING COUNT(*) > 0
""",
)
def q_orders_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(nation, year): per-(nation, year), per-nation, and grand
    totals in ONE aggregation pass (Catalyst expands the grouping sets;
    still a single shuffle with partial aggregation). Null grouping
    slots are rewritten to sentinels so the oracle comparison is
    unambiguous (dims are non-null here).

    Documented deviation: over an EMPTY input Spark emits no rows at
    all, where the SQL standard's () grouping set yields one grand
    row with count 0 — restoring it would need a second aggregation
    pass over the fact table (2x the 100 TB scan), the wrong trade, so
    the contract here (and in the cube/grouping-sets twins) is Spark's
    behavior; the oracle's HAVING COUNT(*) > 0 drops exactly that
    standard grand row and nothing else (every non-empty group counts
    >= 1)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name"), F.year("o_orderdate").alias("_yr"), F.col("o_totalprice"))
    )
    return (
        base.rollup("n_name", "_yr")
        .agg(F.count("*").alias("n_orders"), stable_sum("o_totalprice").alias("total_sales"))
        .select(
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
            F.coalesce(F.col("_yr").cast("int"), F.lit(-1)).alias("order_year"),
            "n_orders",
            "total_sales",
        )
    )


@query(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
    FROM orders
)
WHERE rnk <= 3
""",
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the top-k-per-group window pattern
    (single shuffle on the partition key; ties broken by order key so
    the result is deterministic)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "orders_cube_priority_status",
    oracle=f"""
SELECT COALESCE(o_orderpriority, '(all)') AS priority,
       COALESCE(o_orderstatus, '(all)') AS status,
       COUNT(*) AS n_orders,
       {stable_sum_sql('o_totalprice')} AS total_sales
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
HAVING COUNT(*) > 0
""",
)
def q_orders_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(priority, status): all four grouping sets in one pass —
    like rollup, Catalyst expands the sets before a single shuffle with
    partial aggregation (Expand operator), so cost is rows x sets on
    the map side, not four scans."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), stable_sum("o_totalprice").alias("total_sales"))
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            "n_orders",
            "total_sales",
        )
    )


@query(
    "parts_returned_both_flags",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
""",
)
def q_parts_returned_both_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): parts appearing under both return
    flags A and R.
    Catalyst plans intersect as an aggregate + left-semi join on the
    full row — one keyed shuffle per side, no distinct-then-join
    double shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.intersect(r)


@query(
    "nation_order_percentiles",
    oracle="""
SELECT n_name AS nation,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q_nation_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per nation. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the linear-
    interpolation definition, so the oracle match is exact. Exact
    percentiles need the group's values together (sort-based agg under
    the hood) — at corpus scale switch to ``percentile_approx`` and
    drop the oracle to rows-only; this query pins the exact baseline."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "customer_order_gaps",
    oracle="""
WITH g AS (
    SELECT o_custkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap
    FROM orders
)
SELECT o_custkey, COUNT(*) AS n_orders,
       round(avg(gap), 6) AS avg_gap_days,
       CAST(max(gap) AS INT) AS max_gap_days
FROM g GROUP BY o_custkey HAVING COUNT(*) >= 2
""",
)
def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer via ``lag`` (the
    reference has no lag/lead anywhere — SURVEY §2.5). One shuffle on
    the partition key serves both the window and the following
    aggregation; ties on order date are broken by order key so the lag
    sequence is deterministic."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap"),
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("gap"), 6).alias("avg_gap_days"),
            F.max("gap").cast("int").alias("max_gap_days"),
        )
        .filter(F.col("n_orders") >= 2)
    )


ASOF_T1, ASOF_T2 = "2024-01-01 00:00:00", "2024-01-15 00:00:00"


@query(
    "asof_customer_versions",
    oracle=f"""
SELECT e.event_id, e.user_id,
       CAST(CASE WHEN e.user_id % 10 = 0 AND e.ts >= TIMESTAMP '{ASOF_T2}'
                 THEN 2 ELSE 1 END AS INT) AS version_no,
       c.c_acctbal + CASE WHEN e.user_id % 10 = 0 AND e.ts >= TIMESTAMP '{ASOF_T2}'
                          THEN 100 ELSE 0 END AS acctbal_at_event
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
""",
)
def q_asof_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event joined to the customer
    SCD2 version effective AT ITS TIMESTAMP (v2 exists from mid-month
    for custkey%10==0). The leakage-safe way to attach master data to
    training events; oracle derives the expected version in closed
    form."""
    cust = load_table(spark, sf_dir, "customer").select(KEY, *TRACKED)
    changed = cust.withColumn(
        "c_acctbal",
        F.when(F.col(KEY) % 10 == 0, F.col("c_acctbal") + 100).otherwise(F.col("c_acctbal")),
    )
    versions = scd2_apply(scd2_apply(None, cust, KEY, TRACKED, ASOF_T1), changed, KEY, TRACKED, ASOF_T2)
    events = load_table(spark, sf_dir, "events")
    return point_in_time_join(events, versions, "user_id", KEY, "ts").select(
        "event_id",
        "user_id",
        F.col("version_no").cast("int").alias("version_no"),
        F.col("c_acctbal").alias("acctbal_at_event"),
    )


SURGE_BUCKET_S = 6 * 3600  # 6 h surge-detection windows
SURGE_PAD_MIN = 30  # each surge window padded ±30 min (overlapping)


@query(
    "events_in_surge_windows",
    oracle=f"""
WITH wins AS (
    SELECT TIMESTAMP '1970-01-01 00:00:00'
           + to_seconds(CAST(floor(epoch(ts)/{SURGE_BUCKET_S})*{SURGE_BUCKET_S} AS BIGINT)) AS ws,
           COUNT(*) AS n
    FROM events GROUP BY 1
),
pad AS (
    SELECT ws - INTERVAL {SURGE_PAD_MIN} MINUTE AS w_lo,
           ws + INTERVAL {SURGE_BUCKET_S} SECOND + INTERVAL {SURGE_PAD_MIN} MINUTE AS w_hi
    FROM wins WHERE n >= (SELECT 1.05 * avg(n) FROM wins)
)
SELECT strftime(w_lo, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {stable_sum_sql('value')} AS total_value
FROM pad JOIN events e ON e.ts >= w_lo AND e.ts < w_hi
GROUP BY 1
""",
)
def q_events_in_surge_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join (operators/temporal.range_join): detect
    surge windows (6 h buckets with event count >= 1.05x the mean),
    pad them ±30 min so they OVERLAP their neighbors, then match every
    event falling inside any padded window. The range predicate is
    rewritten to an hourly-bucket equi-join (nested-loop-free — see
    the plan test), which is what keeps a
    100 TB events x incident-windows join feasible."""
    ev = load_table(spark, sf_dir, "events")
    ws = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col("ts")) / SURGE_BUCKET_S) * SURGE_BUCKET_S
    )
    wins = ev.groupBy(ws.alias("ws")).agg(F.count(F.lit(1)).alias("n"))
    thr = wins.agg((F.avg("n") * 1.05).alias("thr"))
    pad = (
        wins.join(F.broadcast(thr))
        .filter(F.col("n") >= F.col("thr"))
        .select(
            (F.col("ws") - F.expr(f"INTERVAL {SURGE_PAD_MIN} MINUTES")).alias("w_lo"),
            (
                F.col("ws")
                + F.expr(f"INTERVAL {SURGE_BUCKET_S} SECONDS")
                + F.expr(f"INTERVAL {SURGE_PAD_MIN} MINUTES")
            ).alias("w_hi"),
        )
    )
    return (
        range_join(ev, pad, "ts", "w_lo", "w_hi", bucket_seconds=3600)
        .groupBy(F.date_format("w_lo", "yyyy-MM-dd HH:mm:ss").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"), stable_sum("value").alias("total_value"))
    )


@query(
    "supplier_rolling_revenue_7d",
    bench=True,
    oracle=f"""
WITH daily AS (
    SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
           {stable_sum_sql('l_extendedprice * (1 - l_discount)', 4, 23)} AS rev
    FROM lineitem GROUP BY 1, 2
)
SELECT l_suppkey, strftime(d, '%Y-%m-%d') AS ship_date,
       CAST(CAST(SUM(CAST(rev AS DECIMAL(23,4))) OVER w AS STRING) AS DOUBLE) AS rev_7d,
       COUNT(*) OVER w AS active_days_7d
FROM daily
WINDOW w AS (
    PARTITION BY l_suppkey ORDER BY d
    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
)
""",
)
def q_supplier_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day revenue per supplier — a RANGE frame spec
    (rowsBetween/rangeBetween), absent from the reference (SURVEY §2.5
    'no frame specs'). Two-level shape for scale: first a hash agg to
    one row per (supplier, day) — the map-side combine shrinks 100 TB
    of lineitem to |suppliers| x |days| rows — then the window frame
    runs over the already-tiny daily series, partitioned by supplier so
    state never concentrates on one task. The rolling re-sum is done in
    exact decimal (see functions.stable_sum) so the window total is
    order-independent and engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_suppkey", F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        stable_sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4, 23
        ).alias("rev")
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "l_suppkey",
        F.date_format("d", "yyyy-MM-dd").alias("ship_date"),
        F.sum(F.col("rev").cast("decimal(23,4)")).over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("active_days_7d"),
    )


@query(
    "customer_reach_by_nation",
    bench=True,
    oracle=f"""
SELECT n_name,
       COUNT(DISTINCT o_custkey) AS active_customers,
       COUNT(*) AS n_orders,
       {stable_sum_sql('o_totalprice')} AS total_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
""",
)
def q_customer_reach_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (COUNT(DISTINCT) alongside plain aggs) —
    absent from the reference (SURVEY §2.4 'not present: distinct
    aggregates'). Catalyst plans the mixed distinct/non-distinct agg as
    Expand + two-phase aggregation: partial per-key distinct happens
    map-side, so the shuffle carries (nation, custkey) partials — never
    raw orders. Nation is a broadcast dim; orders-customer is the one
    real shuffle. For count-only use cases at 100 TB the HLL sketch
    (approx_count_distinct, tested for error bounds in
    tests/test_scale_mechanisms.py) replaces the exact Expand."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum("o_totalprice").alias("total_value"),
        )
    )


_OUTLIER_STATS_SQL = f"""
  SELECT o_orderpriority AS grp, COUNT(*) AS n,
         {stable_sum_sql('o_totalprice', 2, 18)} AS sm,
         {stable_sum_sql('o_totalprice * o_totalprice', 4, 38)} AS smsq
  FROM orders GROUP BY 1
"""


@query(
    "order_price_outliers",
    oracle=f"""
WITH s AS ({_OUTLIER_STATS_SQL}),
st AS (
  SELECT grp, n, sm / n AS mean,
         sqrt((smsq - sm * sm / n) / (n - 1)) AS std
  FROM s
)
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ROUND((o_totalprice - mean) / std, 4) AS z_score
FROM orders JOIN st ON o_orderpriority = grp
WHERE abs(o_totalprice - mean) > 2.5 * std
""",
)
def q_order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: orders whose total price
    sits >2.5 sigma from their priority-group mean. Group moments come
    from ONE hash agg using exact decimal sums (order-independent, so
    mean/std — and therefore the outlier SET — are bit-identical across
    engines and runs; a plain double SUM here would make the boundary
    rows flap). The per-group stats are a handful of rows → broadcast
    join back onto orders, so the detector is one scan + one agg, no
    extra shuffle of the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        stable_sum("o_totalprice", 2, 18).alias("sm"),
        stable_sum(F.col("o_totalprice") * F.col("o_totalprice"), 4, 38).alias("smsq"),
    )
    st = stats.select(
        "grp",
        "n",
        (F.col("sm") / F.col("n")).alias("mean"),
        F.sqrt((F.col("smsq") - F.col("sm") * F.col("sm") / F.col("n")) / (F.col("n") - 1)).alias(
            "std"
        ),
    )
    return (
        orders.join(F.broadcast(st), orders.o_orderpriority == st.grp)
        .filter(F.abs(F.col("o_totalprice") - F.col("mean")) > 2.5 * F.col("std"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.round((F.col("o_totalprice") - F.col("mean")) / F.col("std"), 4).alias("z_score"),
        )
    )


_PIVOT_STATUSES = ["F", "O", "P"]


def _pivot_oracle() -> str:
    cols = []
    for s in _PIVOT_STATUSES:
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 END), 0) AS BIGINT)"
            f" AS {s}_n"
        )
        cols.append(
            f"CAST(CAST(SUM(CASE WHEN o_orderstatus = '{s}'"
            f" THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) AS {s}_rev"
        )
    return (
        "SELECT o_orderpriority, " + ", ".join(cols) + " FROM orders GROUP BY o_orderpriority"
    )


@query("orders_priority_status_pivot", oracle=_pivot_oracle())
def q_orders_priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab reshape: priority rows x status columns, count +
    revenue per cell, via DataFrame ``pivot`` with an EXPLICIT value
    list — no extra distinct-discovery job, and the plan stays one
    hash agg with map-side combine (pivot compiles to conditional
    aggregates, same as the SQL oracle spells out). Missing cells
    coalesce to 0 for counts and stay NULL for sums, matching
    SUM(CASE...END) semantics."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_sum("o_totalprice", 2, 18).alias("rev"),
        )
    )
    out_cols = [F.col("o_orderpriority")]
    for s in _PIVOT_STATUSES:
        out_cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"{s}_n"))
        out_cols.append(F.col(f"{s}_rev"))
    return p.select(*out_cols)


_DECILE_QS = [round(0.1 * i, 1) for i in range(1, 10)]


@query(
    "customer_spend_deciles",
    oracle=f"""
WITH totals AS (
  SELECT o_custkey, {stable_sum_sql('o_totalprice', 2, 18)} AS spend
  FROM orders GROUP BY 1
),
ths AS (SELECT list_transform(quantile_cont(spend, {_DECILE_QS}),
                              t -> floor(t * 1e4 + 0.5) / 1e4) AS ths
        FROM totals),
dec AS (
  SELECT o_custkey, spend,
         CAST(len(list_filter(ths.ths, t -> spend > t)) + 1 AS INTEGER) AS decile
  FROM totals, ths
)
SELECT decile, COUNT(*) AS n_customers,
       {stable_sum_sql('spend', 2, 18)} AS total_spend,
       ROUND(MIN(spend), 2) AS min_spend,
       ROUND(MAX(spend), 2) AS max_spend
FROM dec GROUP BY 1
""",
)
def q_customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing of customer lifetime spend WITHOUT a global
    sort: a plain NTILE needs a single-partition window over all
    customers (the classic scale-killer); instead the nine decile
    thresholds come from one percentile aggregate, broadcast to every
    task, and each customer's bucket is size(filter(thresholds, t ->
    spend > t)) + 1 — embarrassingly parallel. Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share the linear-interpolation
    definition, and spends are exact decimal sums, so bucket
    boundaries agree bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        stable_sum("o_totalprice", 2, 18).alias("spend")
    )
    qs = ", ".join(str(q) for q in _DECILE_QS)
    # Thresholds quantized to the 1e-4 grid (portable_round form): with
    # 2-dp spends every interpolated threshold is mathematically ON that
    # grid (g is k/10, neighbor gaps are whole cents), so the rounding
    # only absorbs the ±1-ulp noise of the two engines' different
    # interpolation expressions — at sf10 a 100-replica tie group sat
    # EXACTLY on a threshold that DuckDB computed 1 ulp below (equal
    # neighbors: Spark's a+g*(b-a) is exactly a, (1-g)*a+g*b is not),
    # flipping the whole group's bucket.
    ths = totals.agg(
        F.transform(
            F.expr(f"percentile(spend, array({qs}))"),
            lambda t: F.floor(t * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4),
        ).alias("ths")
    )
    dec = totals.crossJoin(F.broadcast(ths)).select(  # 1-row threshold side
        "o_custkey",
        "spend",
        (F.size(F.filter(F.col("ths"), lambda t: F.col("spend") > t)) + 1)
        .cast("int")
        .alias("decile"),
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        stable_sum("spend", 2, 18).alias("total_spend"),
        F.round(F.min("spend"), 2).alias("min_spend"),
        F.round(F.max("spend"), 2).alias("max_spend"),
    )


_MELT_AGG_SQL = """
  SELECT o_orderpriority,
         CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS F,
         CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS O,
         CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS P
  FROM orders GROUP BY 1
"""


@query(
    "orders_status_melt",
    oracle=f"""
WITH a AS ({_MELT_AGG_SQL})
SELECT o_orderpriority, 'F' AS o_orderstatus, F AS n_orders FROM a
UNION ALL SELECT o_orderpriority, 'O', O FROM a
UNION ALL SELECT o_orderpriority, 'P', P FROM a
""",
)
def q_orders_status_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse reshape of the pivot query: the wide
    per-priority status counts go back to long (priority, status, n)
    rows via DataFrame.unpivot, which plans as Expand (3 output rows
    per input row, no shuffle beyond the source agg)."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("o_orderstatus") == s, 1)), F.lit(0)
            ).alias(s)
            for s in _PIVOT_STATUSES
        ]
    )
    return wide.unpivot(
        ["o_orderpriority"], _PIVOT_STATUSES, "o_orderstatus", "n_orders"
    )


_TREND_MOMENTS_SQL = f"""
  SELECT l_suppkey,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(18,0))) AS STRING) AS DOUBLE) AS sx,
         {stable_sum_sql('y', 4, 23)} AS sy,
         CAST(CAST(SUM(CAST(x * x AS DECIMAL(28,0))) AS STRING) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS STRING) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS STRING) AS DOUBLE) AS syy
  FROM (
    SELECT l_suppkey, date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS x,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,4))) AS STRING) AS DOUBLE) AS y
    FROM lineitem GROUP BY 1, 2
  )
  GROUP BY 1
"""


@query(
    "supplier_revenue_trend",
    oracle=f"""
WITH m AS ({_TREND_MOMENTS_SQL})
SELECT l_suppkey, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4) AS intercept,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS r
FROM m
WHERE n >= 30
""",
)
def q_supplier_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier revenue trend: OLS slope/intercept + Pearson r of
    daily revenue vs time, computed from DECIMAL-EXACT moment sums
    (Σx, Σy, Σxy, Σx², Σy²) rather than the built-in regr_slope/corr
    aggregates — the streaming-float built-ins are order-dependent, so
    their last ulp differs across engines and partition layouts; exact
    moments make the fit bit-reproducible. One hash agg to daily
    revenue, one to the moments; the closed-form fit is per-row
    arithmetic on the exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_suppkey", F.unix_date(F.col("l_shipdate").cast("date")).alias("x")
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(23,4)"
            )
        )
        .cast("double")
        .alias("y")
    )
    m = daily.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,0)")).cast("double").alias("sx"),
        stable_sum("y", 4, 23).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,0)")).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)")).cast("double").alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,8)")).cast("double").alias("syy"),
    )
    slope = (m.n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        m.n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    r = (m.n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(m.n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(m.n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        m.filter(F.col("n") >= 30)
        .select(
            "l_suppkey",
            "n",
            F.round(slope, 6).alias("slope"),
            F.round((F.col("sy") - slope * F.col("sx")) / m.n, 4).alias("intercept"),
            F.round(r, 6).alias("r"),
        )
    )


@query(
    "customer_balance_ranks",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist,
       CAST(ntile(10) OVER w AS INT) AS decile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
)
def q_customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions per nation: percent_rank,
    cume_dist, and ntile(10) over account balance.

    The ORDER BY includes c_custkey so the total order within a nation
    is unique — ntile assigns tied balances deterministically and the
    result is engine-independent. percent_rank/cume_dist are pure
    (rank-1)/(n-1) and rank/n ratios of exact row counts, so doubles
    match the oracle bit-for-bit.

    Scale shape: one shuffle on c_nationkey, then a per-partition sort —
    the canonical ranked-window plan. Nations are a bounded key set; at
    100 TB the per-nation partitions are large but the window frame is
    unbounded-preceding only (running rank state, no buffered frame)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "orders_grouping_sets_audit",
    oracle=f"""
SELECT COALESCE(n_name, '(all)') AS nation,
       COALESCE(o_orderpriority, '(all)') AS priority,
       CAST(grouping(n_name) * 2 + grouping(o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders,
       {stable_sum_sql('o_totalprice')} AS total_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority), ())
HAVING COUNT(*) > 0
""",
)
def q_orders_grouping_sets_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind ROLLUP/CUBE
    (reference has neither; this completes the §2.4 grouping family):
    (nation, priority), nation-only, priority-only, and grand total in
    ONE aggregation pass, with grouping_id() disambiguating which set a
    row belongs to (a '(all)' sentinel alone could not distinguish a
    literal value from an aggregated-away slot).

    Scale shape: Catalyst's Expand produces 4 rows per input into a
    single partial+final hash aggregate — one shuffle regardless of how
    many sets, same as the rollup/cube plans pinned in
    test_grouping_sets_expand_once."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_orderpriority", "o_totalprice")
    )
    return (
        base.groupingSets(
            [["n_name", "o_orderpriority"], ["n_name"], ["o_orderpriority"], []],
            "n_name",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            stable_sum("o_totalprice").alias("total_sales"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("priority"),
            "gid",
            "n_orders",
            "total_sales",
        )
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the classic customer-value analysis: quintile
# scores for Recency / Frequency / Monetary, a pinned segment rule
# chain, per-segment rollup. Same scale contract as
# customer_spend_deciles: NO global-sort ntile — quintile thresholds
# come from one percentile aggregate broadcast to every task, so
# scoring is embarrassingly parallel. Spark's ``percentile`` and
# DuckDB's ``quantile_cont`` share the linear-interpolation
# definition; R/F are exact integers and M is a decimal-exact sum, so
# every threshold comparison agrees bit-for-bit.
# ---------------------------------------------------------------------------

_RFM_QS = [0.2, 0.4, 0.6, 0.8]
_RFM_SEGMENT_SQL = """CASE
  WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
  WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
  WHEN r_score >= 4 THEN 'recent'
  WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
  WHEN r_score <= 2 AND m_score >= 4 THEN 'cant_lose'
  WHEN r_score <= 2 THEN 'hibernating'
  ELSE 'regular' END"""


@query(
    "rfm_segments_customers",
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate),
              (SELECT MAX(o_orderdate) FROM orders)) AS DOUBLE) AS recency,
         CAST(COUNT(*) AS DOUBLE) AS frequency,
         {stable_sum_sql('o_totalprice', 2, 18)} AS monetary
  FROM orders GROUP BY o_custkey
),
ths AS (
  SELECT quantile_cont(recency, {_RFM_QS}) AS rt,
         quantile_cont(frequency, {_RFM_QS}) AS ft,
         quantile_cont(monetary, {_RFM_QS}) AS mt
  FROM rfm
),
scored AS (
  SELECT o_custkey, recency, frequency, monetary,
         CAST(6 - (len(list_filter(rt, t -> recency > t)) + 1) AS INTEGER) AS r_score,
         CAST(len(list_filter(ft, t -> frequency > t)) + 1 AS INTEGER) AS f_score,
         CAST(len(list_filter(mt, t -> monetary > t)) + 1 AS INTEGER) AS m_score
  FROM rfm, ths
)
SELECT {_RFM_SEGMENT_SQL} AS segment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(recency AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_recency_days,
       CAST(SUM(CAST(frequency AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_orders,
       {stable_sum_sql('monetary', 2, 18)} AS total_spend
FROM scored GROUP BY 1 ORDER BY segment
""",
)
def q_rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation of customers with a pinned rule chain
    (champion / loyal / recent / at_risk / cant_lose / hibernating /
    regular), rolled up per segment. R counts days back from the
    corpus's own max order date (1-row broadcast anchor); scores 5 =
    best on every axis."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("_anchor"))
    rfm = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("_anchor"), F.max("o_orderdate"))
            .cast("double")
            .alias("recency"),
            F.count(F.lit(1)).cast("double").alias("frequency"),
            stable_sum("o_totalprice", 2, 18).alias("monetary"),
        )
    )
    qs = ", ".join(str(q) for q in _RFM_QS)
    ths = rfm.agg(
        F.expr(f"percentile(recency, array({qs}))").alias("rt"),
        F.expr(f"percentile(frequency, array({qs}))").alias("ft"),
        F.expr(f"percentile(monetary, array({qs}))").alias("mt"),
    )
    bucket = lambda arr, v: (  # noqa: E731
        F.size(F.filter(F.col(arr), lambda t: F.col(v) > t)) + 1
    )
    scored = rfm.crossJoin(F.broadcast(ths)).select(
        "o_custkey",
        "recency",
        "frequency",
        "monetary",
        (F.lit(6) - bucket("rt", "recency")).cast("int").alias("r_score"),
        bucket("ft", "frequency").cast("int").alias("f_score"),
        bucket("mt", "monetary").cast("int").alias("m_score"),
    )
    return (
        scored.withColumn("segment", F.expr(_RFM_SEGMENT_SQL))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.col("recency").cast("bigint")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_recency_days"),
            (
                F.sum(F.col("frequency").cast("bigint")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_orders"),
            stable_sum("monetary", 2, 18).alias("total_spend"),
        )
        .orderBy("segment")
    )
