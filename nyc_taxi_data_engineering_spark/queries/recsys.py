"""Recommender-system queries: rank-2 ALS matrix factorization over
the customer x supplier purchase matrix (operators/als.py), trained AND
served under the exact oracle gate — factorization, candidate scoring,
already-purchased exclusion, and per-user top-k all replay
bit-identically in DuckDB.

Scale shape: training is two keyed join+agg sweeps per alternation
(see operators/als.py); serving broadcasts the ITEM factor table
(suppliers — the small side by construction in retail-shaped data;
at 100 TB with a huge item side, prune to the top items by rating
mass first, the standard candidate-generation step) against the
selected users, anti-joins the already-purchased pairs, and takes the
per-user top-k with a user-partitioned window — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.operators.als import als_factors, als_sql
from nyc_taxi_data_engineering_spark.queries.registry import query

RECS_TOPK = 3
USER_MOD = 97  # serve users with custkey % 97 == 0 (a pinned cohort)

_RATINGS_CTE = """ratings AS (
  SELECT o_custkey AS u, l_suppkey AS i,
         COUNT(DISTINCT o_orderkey) AS r
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)"""

_ALS_WITH, (_UF, _IF) = als_sql(_RATINGS_CTE)


@query(
    "als_supplier_recommendations",
    oracle=f"""
WITH {_ALS_WITH},
sel AS (SELECT * FROM {_UF} WHERE i % {USER_MOD} = 0),
cand AS (
  SELECT s.i AS user_id, t.i AS supplier,
         s.f1 * t.f1 + s.f2 * t.f2 AS score
  FROM sel s CROSS JOIN {_IF} t
  WHERE NOT EXISTS (
    SELECT 1 FROM ratings r WHERE r.u = s.i AND r.i = t.i
  )
),
ranked AS (
  SELECT user_id, supplier, score,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY score DESC, supplier) AS rn
  FROM cand
)
SELECT user_id, supplier, score, CAST(rn AS INT) AS rank_n
FROM ranked WHERE rn <= {RECS_TOPK}
""",
)
def q_als_supplier_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ALS recommendations: factorize the customer x
    supplier order-count matrix (rank 2, {ALS_ITERS} alternations,
    closed-form 2x2 solves — operators/als.py), then for the pinned
    user cohort score every NOT-yet-purchased supplier with the factor
    dot product and keep the top-{RECS_TOPK} per user. Training and
    serving both sit under the hash gate: a wrong factor, a leaked
    already-purchased candidate, or a mis-ranked tie all mismatch.
    Plan: training sweeps are keyed join+agg; serving is one broadcast
    cross join (item factors are the small side), one anti join on the
    rating pairs, one user-partitioned top-k window."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ratings = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("u"), F.col("l_suppkey").alias("i"))
        .agg(F.count_distinct("o_orderkey").alias("r"))
    )
    user_f, item_f = als_factors(ratings)
    sel = user_f.filter(F.col("i") % USER_MOD == 0).select(
        F.col("i").alias("user_id"), F.col("f1").alias("u1"), F.col("f2").alias("u2")
    )
    items = item_f.select(
        F.col("i").alias("supplier"), F.col("f1").alias("i1"), F.col("f2").alias("i2")
    )
    cand = (
        sel.crossJoin(F.broadcast(items))
        .join(
            ratings.select(
                F.col("u").alias("user_id"), F.col("i").alias("supplier")
            ),
            ["user_id", "supplier"],
            "left_anti",
        )
        .select(
            "user_id",
            "supplier",
            (F.col("u1") * F.col("i1") + F.col("u2") * F.col("i2")).alias("score"),
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("score").desc(), "supplier")
    )
    return (
        cand.select("user_id", "supplier", "score", rn.alias("rank_n"))
        .filter(F.col("rank_n") <= RECS_TOPK)
    )


from nyc_taxi_data_engineering_spark.operators.als import ALS_ITERS  # noqa: E402

q_als_supplier_recommendations.__doc__ = q_als_supplier_recommendations.__doc__.replace(
    "{ALS_ITERS}", str(ALS_ITERS)
).replace("{RECS_TOPK}", str(RECS_TOPK))
