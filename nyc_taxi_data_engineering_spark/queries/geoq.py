"""Geospatial query family under the exact oracle gate: OD grid flows,
pickup hotspots, radius pairs via the neighbor-cell join, and
nearest-hub assignment.

The reference's domain is NYC trip data — zone-to-zone flow and
hotspot aggregation are its canonical analytics; the synthetic schema
has no coordinates, so points derive md5-deterministically per key
inside a pinned NYC box (operators/geo.py documents the bit-identical
cross-engine contract: no trig, exact IEEE arithmetic, decimal
transport for every sum).

Scale notes per query are inline; the one that matters is
geo_radius_pairs_customers — its DuckDB oracle is the O(n²) brute
self-join, its Spark plan is the density-bounded 3×3 neighbor-cell
equi-join, and the gate proves them identical (losslessness), the
prefix_jaccard_pairs precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import stable_sum, stable_sum_sql
from nyc_taxi_data_engineering_spark.operators.geo import (
    cell,
    cell_sql,
    derive_point,
    derive_point_sql,
    distance_km,
    distance_km_sql,
    radius_pairs,
)
from nyc_taxi_data_engineering_spark.queries.registry import query

_OD_CELL = 0.05
_HOT_CELL = 0.02
_RADIUS_KM = 1.0
_R_CELL_LAT = 0.01  # 1.1132 km >= radius
_R_CELL_LON = 0.012  # 1.0122 km >= radius


@query(
    "geo_od_cell_flows",
    oracle=f"""
WITH pts AS (
    SELECT o_orderkey,
           {derive_point_sql("o_orderkey", "pu", "pu")},
           {derive_point_sql("o_orderkey", "do", "do")}
    FROM orders
)
SELECT {cell_sql("pu_lat", _OD_CELL)} AS pu_cy,
       {cell_sql("pu_lon", _OD_CELL)} AS pu_cx,
       {cell_sql("do_lat", _OD_CELL)} AS do_cy,
       {cell_sql("do_lon", _OD_CELL)} AS do_cx,
       COUNT(*) AS trips,
       {stable_sum_sql(distance_km_sql("pu_lat", "pu_lon", "do_lat", "do_lon"), 6)} AS total_km
FROM pts
GROUP BY 1, 2, 3, 4
ORDER BY pu_cy, pu_cx, do_cy, do_cx
""",
)
def geo_od_cell_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix on a 0.05-degree grid: trips and
    exact total km per (pickup cell, dropoff cell).

    100 TB: one narrow scan of the fact (the derivation is pure
    projection in codegen) into one hash aggregation keyed by the four
    cell ints — map-side partial combine collapses each partition to
    the grid size (~3k cells) before the shuffle, so the exchange is
    grid-bounded regardless of row count.
    """
    pts = derive_point(
        derive_point(load_table(spark, sf_dir, "orders"), "o_orderkey", "pu", "pu"),
        "o_orderkey",
        "do",
        "do",
    )
    d = distance_km(F.col("pu_lat"), F.col("pu_lon"), F.col("do_lat"), F.col("do_lon"))
    return (
        pts.select(
            cell(F.col("pu_lat"), _OD_CELL).alias("pu_cy"),
            cell(F.col("pu_lon"), _OD_CELL).alias("pu_cx"),
            cell(F.col("do_lat"), _OD_CELL).alias("do_cy"),
            cell(F.col("do_lon"), _OD_CELL).alias("do_cx"),
            d.alias("_km"),
        )
        .groupBy("pu_cy", "pu_cx", "do_cy", "do_cx")
        .agg(F.count("*").alias("trips"), stable_sum(F.col("_km"), 6).alias("total_km"))
        .orderBy("pu_cy", "pu_cx", "do_cy", "do_cx")
    )


@query(
    "geo_pickup_hotspots",
    oracle=f"""
WITH pts AS (
    SELECT o_custkey, o_totalprice,
           {derive_point_sql("o_orderkey", "pu", "pu")}
    FROM orders
)
SELECT {cell_sql("pu_lat", _HOT_CELL)} AS cy,
       {cell_sql("pu_lon", _HOT_CELL)} AS cx,
       COUNT(*) AS trips,
       COUNT(DISTINCT o_custkey) AS n_custs,
       {stable_sum_sql("o_totalprice")} AS revenue
FROM pts
GROUP BY 1, 2
ORDER BY trips DESC, cy, cx
LIMIT 25
""",
)
def geo_pickup_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 pickup cells on a 0.02-degree grid by trip count, with
    distinct-customer reach and exact revenue.

    100 TB: hash agg with partial combine (the distinct rides a
    two-phase expand), then TakeOrderedAndProject — no global sort
    materializes more than 25 rows per partition.
    """
    pts = derive_point(load_table(spark, sf_dir, "orders"), "o_orderkey", "pu", "pu")
    return (
        pts.select(
            cell(F.col("pu_lat"), _HOT_CELL).alias("cy"),
            cell(F.col("pu_lon"), _HOT_CELL).alias("cx"),
            "o_custkey",
            "o_totalprice",
        )
        .groupBy("cy", "cx")
        .agg(
            F.count("*").alias("trips"),
            F.countDistinct("o_custkey").alias("n_custs"),
            stable_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy(F.desc("trips"), "cy", "cx")
        .limit(25)
    )


@query(
    "geo_radius_pairs_customers",
    oracle=f"""
WITH pts AS (
    SELECT c_custkey, {derive_point_sql("c_custkey", "loc", "p")}
    FROM customer
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       {distance_km_sql("a.p_lat", "a.p_lon", "b.p_lat", "b.p_lon")} AS dist_km
FROM pts a
JOIN pts b ON a.c_custkey < b.c_custkey
WHERE {distance_km_sql("a.p_lat", "a.p_lon", "b.p_lat", "b.p_lon")} <= {_RADIUS_KM}
ORDER BY id_a, id_b
""",
)
def geo_radius_pairs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 1 km, by the neighbor-cell equi-join.

    The oracle above is the brute O(n²) self-join — at sf0.01 that is
    2.25 M candidate rows and fine; at 100 TB it is fatal. The Spark
    plan buckets each point into one >=1 km grid cell, explodes the
    3×3 neighbor keys on the left, and hash-joins on (cy, cx):
    candidate volume is (points per cell × 9) per point — density-
    bounded, never quadratic. The gate proving both sides identical is
    the losslessness proof of the cell decomposition
    (operators/geo.py:radius_pairs).
    """
    pts = derive_point(
        load_table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", "loc", "p"
    ).select("c_custkey", F.col("p_lat").alias("lat"), F.col("p_lon").alias("lon"))
    return (
        radius_pairs(pts, "c_custkey", _RADIUS_KM, _R_CELL_LAT, _R_CELL_LON)
        .orderBy("id_a", "id_b")
    )


@query(
    "geo_nearest_hub",
    oracle=f"""
WITH hubs AS (
    SELECT n_nationkey AS hub_id, {derive_point_sql("n_nationkey", "hub", "h")}
    FROM nation
),
custs AS (
    SELECT c_custkey, {derive_point_sql("c_custkey", "loc", "p")}
    FROM customer
),
d AS (
    SELECT c_custkey, hub_id,
           {distance_km_sql("p_lat", "p_lon", "h_lat", "h_lon")} AS dist_km
    FROM custs CROSS JOIN hubs
),
m AS (
    SELECT c_custkey, MIN(dist_km) AS best_km FROM d GROUP BY c_custkey
),
a AS (
    SELECT d.c_custkey, MIN(d.hub_id) AS hub_id, MIN(m.best_km) AS best_km
    FROM d JOIN m ON d.c_custkey = m.c_custkey AND d.dist_km = m.best_km
    GROUP BY d.c_custkey
)
SELECT hub_id, COUNT(*) AS n_customers, {stable_sum_sql("best_km", 6)} AS total_km
FROM a GROUP BY hub_id ORDER BY hub_id
""",
)
def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every customer to its nearest of 25 hubs (one per nation,
    md5-derived); report per-hub counts and exact total distance.

    100 TB: the hub table broadcasts (BroadcastNestedLoopJoin over 25
    rows is a per-row loop, not a shuffle); the argmin folds INTO one
    hash aggregation — ``min(struct(dist_km, hub_id))`` orders structs
    field-by-field, so map-side partial aggregation collapses each
    customer's 25 scored rows to one BEFORE the exchange (the
    queries/similarity.nearest_centroid shape; measured: the r8 sf10
    probe put the two-agg join-back variant at slope 6.5 — this shape
    shuffles n rows instead of 2×25n). Tie-break matches the oracle's
    two-step equality formulation: smallest distance, then smallest
    hub id (bit-identical doubles make the tie semantics portable).
    """
    hubs = derive_point(
        load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("hub_id")),
        "hub_id",
        "hub",
        "h",
    )
    custs = derive_point(
        load_table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", "loc", "p"
    )
    d = custs.crossJoin(F.broadcast(hubs)).select(
        "c_custkey",
        "hub_id",
        distance_km(F.col("p_lat"), F.col("p_lon"), F.col("h_lat"), F.col("h_lon")).alias(
            "dist_km"
        ),
    )
    a = (
        d.groupBy("c_custkey")
        .agg(F.min(F.struct(F.col("dist_km"), F.col("hub_id"))).alias("best"))
        .select(F.col("best.hub_id").alias("hub_id"), F.col("best.dist_km").alias("best_km"))
    )
    return (
        a.groupBy("hub_id")
        .agg(F.count("*").alias("n_customers"), stable_sum(F.col("best_km"), 6).alias("total_km"))
        .orderBy("hub_id")
    )
