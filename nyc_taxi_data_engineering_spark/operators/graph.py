"""Iterative graph analytics on DataFrames — deterministic PageRank
with a fixed iteration count, the keyed-join/agg formulation every
distributed graph engine (Pregel, GraphX, GraphFrames) lowers to:

    contrib(dst) += rank(src) / outdeg(src)      -- join on src
    rank'(v) = (1-d)/N + d * sum(contrib(v))     -- groupBy dst

Determinism contract (what makes an exact DuckDB oracle possible):
per-edge contributions are ROUNDED to 12 dp then summed as
DECIMAL(28,12) — order-independent and engine-exact — and each new
rank rounds to 12 dp, so both engines walk bit-identical doubles
through every iteration. The damping constant enters as the
expression ``(1 - 0.85)`` on BOTH sides (the literal 0.15 is a
DIFFERENT double than 1-0.85; writing the same expression keeps the
teleport term bit-identical).

Scale shape per iteration: one keyed equi-join (ranks ⋈ edges on src,
both shuffled on the same key — at cluster scale pre-partition edges
by src once and every iteration reuses the layout) + one hash agg on
dst with map-side combine. Iterations are a fixed driver loop over
lazy plans, like Lloyd k-means (operators/kmeans.py); no collect
anywhere. Dangling nodes are avoided by construction here (callers
pass edges whose node set all have out-edges, e.g. bidirected
bipartite graphs); for general graphs add the standard dangling-mass
term before trusting absolute ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3
_SCALE = 12  # dp kept per contribution / rank


def pagerank(
    edges: DataFrame, iters: int = PAGERANK_ITERS, weight: str | None = None
) -> DataFrame:
    """(node, rank) after ``iters`` rounds from a uniform start over
    the distinct ``src`` nodes of ``edges`` (src, dst[, weight]).
    ``weight`` names an INTEGER edge-weight column — the random surfer
    follows an edge with probability w / strength(src) (strength =
    out-weight sum), the standard weighted extension; omitted, every
    edge weighs 1 and strength is the out-degree. Every node must
    appear as a src (no dangling mass) — true for the bidirected
    graphs this repo builds; asserted cheaply by the caller's tests."""
    w = F.col(weight) if weight is not None else F.lit(1).cast("long")
    edges = edges.select("src", "dst", w.alias("w"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("strength"))
    # (src, dst, w, strength) is loop-invariant: build once, reuse every round
    ew = edges.join(outdeg, "src")
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    teleport = (F.lit(1.0) - F.lit(PAGERANK_DAMPING)) / F.col("n")
    for _ in range(iters):
        contrib = ranks.join(ew, ranks["node"] == ew["src"]).select(
            F.col("dst").alias("node"),
            F.round(F.col("rank") * F.col("w") / F.col("strength"), _SCALE)
            .cast(f"decimal(28,{_SCALE})")
            .alias("c"),
        )
        in_sum = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(in_sum, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                F.round(
                    teleport
                    + F.lit(PAGERANK_DAMPING)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                    _SCALE,
                ).alias("rank"),
            )
        )
    return ranks


def pagerank_sql(
    edges_cte: str, iters: int = PAGERANK_ITERS, weighted: bool = False
) -> str:
    """DuckDB twin: the same fixed-point iterations as nested CTEs.
    ``edges_cte`` must define a CTE named ``edges`` with (src, dst) —
    plus an integer ``w`` column when ``weighted``. Returns a complete
    WITH...SELECT producing (node, rank)."""
    w_expr = "w" if weighted else "1::BIGINT"
    parts = [
        edges_cte,
        f"we AS (SELECT src, dst, {w_expr} AS w FROM edges)",
        "nodes AS (SELECT DISTINCT src AS node FROM we)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS (SELECT src, SUM(w) AS strength FROM we GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
    SELECT e.dst AS node,
           CAST(round(r.rank * e.w / o.strength, {_SCALE}) AS DECIMAL(28,{_SCALE})) AS c
    FROM r{i - 1} r JOIN we e ON e.src = r.node JOIN outdeg o ON o.src = e.src
)"""
        )
        parts.append(
            f"""r{i} AS (
    SELECT n.node,
           round((1 - {PAGERANK_DAMPING}) / (SELECT n FROM nn)
                 + {PAGERANK_DAMPING} * CAST(COALESCE(s.s, 0) AS DOUBLE), {_SCALE}) AS rank
    FROM nodes n LEFT JOIN (SELECT node, SUM(c) AS s FROM c{i} GROUP BY node) s
      ON s.node = n.node
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"
