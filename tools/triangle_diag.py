"""Analytic triangle-cost diagnostic for the co-purchase graph — the
wedge-volume accounting that explains why the replica scale tier is the
WRONG instrument for probing triangle_copurchase_suppliers, without
running the (unbounded) wedge join itself.

The replica tier multiplies CUSTOMERS 10x per decade but keeps the
supplier population per replica fixed at sf0.1's (TPC-H scales both
with SF; the key-offset replica scheme can't). Every extra customer
adds co-purchase edges among the SAME ~1k suppliers, so the
within-replica pair graph densifies toward complete — and triangle
counting pays Theta(wedges-after-orientation), which for a
near-complete graph is Theta(n^3/6) PER REPLICA no matter how the join
is arranged. That cost is a property of the tier's data shape (the
same class of artifact as the byte-duplication tier for fingerprints,
see tools/cipher_probe.py), not of the operator: on data where
suppliers scale with SF, edge count per node — and so wedge volume —
stays bounded.

This tool measures, from ONE degree aggregation per tier (no wedge
join): nodes, edges, density, and the EXACT oriented wedge count
sum(C(outdeg, 2)) under the same degree-ordered orientation the
operator uses — i.e. the exact number of candidate rows the triangle
join would have to materialize.

Usage: python tools/triangle_diag.py DIR [DIR ...]
Writes one JSON line per dir to stdout.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_spark import catalog  # noqa: E402
from nyc_taxi_data_engineering_spark.operators.cooccur import cooccurrence_pairs  # noqa: E402
from nyc_taxi_data_engineering_spark.queries.graphq import (  # noqa: E402
    COPURCHASE_DEGREE_CAP,
    COPURCHASE_MIN_SHARED,
)
from nyc_taxi_data_engineering_spark.session import get_spark  # noqa: E402


def diagnose(spark, sf_dir: str) -> dict:
    o = catalog.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = catalog.load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    links = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("l_suppkey").alias("supplier"), F.col("o_custkey").alias("customer")
    )
    edges = cooccurrence_pairs(
        links,
        "supplier",
        "customer",
        degree_cap=COPURCHASE_DEGREE_CAP,
        min_shared=COPURCHASE_MIN_SHARED,
    ).select("a", "b")
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).cache()
    e = (
        edges.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    outdeg = (
        e.select(F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    wedge_row = outdeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("long").alias("wedges"),
        F.max("od").alias("max_outdeg"),
    ).first()
    deg_row = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.sum("deg").alias("deg_sum"),
        F.max("deg").alias("max_deg"),
    ).first()
    nodes = int(deg_row["nodes"])
    edges_n = int(deg_row["deg_sum"]) // 2
    density = 2.0 * edges_n / (nodes * (nodes - 1)) if nodes > 1 else 0.0
    return {
        "dir": sf_dir,
        "nodes": nodes,
        "edges": edges_n,
        "density": round(density, 4),
        "max_degree": int(deg_row["max_deg"]),
        "oriented_wedges": int(wedge_row["wedges"]),
        "max_oriented_outdeg": int(wedge_row["max_outdeg"]),
    }


def main() -> None:
    spark = get_spark("triangle_diag")
    for d in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        print(json.dumps(diagnose(spark, d)))


if __name__ == "__main__":
    main()
