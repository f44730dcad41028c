"""Iterative graph analytics on DataFrames — deterministic PageRank
with a fixed iteration count, the keyed-join/agg formulation every
distributed graph engine (Pregel, GraphX, GraphFrames) lowers to:

    contrib(dst) += rank(src) / outdeg(src)      -- join on src
    dm           = sum(rank(v) : outdeg(v) = 0)  -- 1-row dangling mass
    rank'(v) = (1-d)/N + d * (sum(contrib(v)) + dm/N)

Determinism contract (what makes an exact DuckDB oracle possible):
per-edge contributions are ROUNDED to 12 dp then summed as
DECIMAL(28,12) — order-independent and engine-exact — and each new
rank rounds to 12 dp, so both engines walk bit-identical doubles
through every iteration. The dangling mass likewise sums the (already
12-dp) ranks as DECIMAL(28,12) before the double divide, so its
redistribution is bit-identical too. The damping constant enters as
the expression ``(1 - 0.85)`` on BOTH sides (the literal 0.15 is a
DIFFERENT double than 1-0.85; writing the same expression keeps the
teleport term bit-identical).

Scale shape per iteration: one keyed equi-join (ranks ⋈ edges on src,
both shuffled on the same key — at cluster scale pre-partition edges
by src once and every iteration reuses the layout) + one hash agg on
dst with map-side combine + one 1-row broadcast aggregate for the
dangling mass (nothing per-node crosses the driver). Iterations are a
fixed driver loop over lazy plans, like Lloyd k-means
(operators/kmeans.py); no collect anywhere. Sinks (nodes with no
out-edges — the common case in link/citation graphs) are handled by
the standard dangling-mass redistribution; graphs without sinks pay
only a sum over an empty set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegralType

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3
_SCALE = 12  # dp kept per contribution / rank


def pagerank(
    edges: DataFrame, iters: int = PAGERANK_ITERS, weight: str | None = None
) -> DataFrame:
    """(node, rank) after ``iters`` rounds from a uniform start over
    the distinct nodes of ``edges`` (src, dst[, weight]) — nodes that
    only appear as a ``dst`` (sinks) are ranked too, their mass
    redistributed uniformly each round (the standard dangling-mass
    term: one 1-row aggregate, broadcast into the rank update).
    ``weight`` names an INTEGER edge-weight column — the random surfer
    follows an edge with probability w / strength(src) (strength =
    out-weight sum), the standard weighted extension; omitted, every
    edge weighs 1 and strength is the out-degree."""
    if weight is not None and not isinstance(
        edges.schema[weight].dataType, IntegralType
    ):
        raise TypeError(
            f"pagerank weight column {weight!r} must be an integer type "
            f"(got {edges.schema[weight].dataType.simpleString()}); the "
            "12-dp determinism contract needs exact strengths — scale "
            "real-valued weights to integers first"
        )
    w = F.col(weight) if weight is not None else F.lit(1).cast("long")
    edges = edges.select("src", "dst", w.alias("w"))
    srcs = edges.select(F.col("src").alias("node")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dangling = nodes.join(srcs, "node", "left_anti")
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("strength"))
    # (src, dst, w, strength) is loop-invariant: build once, reuse every round
    ew = edges.join(outdeg, "src")
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    teleport = (F.lit(1.0) - F.lit(PAGERANK_DAMPING)) / F.col("n")
    zero_dm = F.lit(0).cast(f"decimal(28,{_SCALE})")
    for _ in range(iters):
        contrib = ranks.join(ew, ranks["node"] == ew["src"]).select(
            F.col("dst").alias("node"),
            F.round(F.col("rank") * F.col("w") / F.col("strength"), _SCALE)
            .cast(f"decimal(28,{_SCALE})")
            .alias("c"),
        )
        in_sum = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        # Dangling mass: ranks already sit on a 12-dp grid, so the
        # DECIMAL sum is exact and order-independent; one row, broadcast.
        dm_row = ranks.join(dangling, "node").agg(
            F.coalesce(
                F.sum(F.col("rank").cast(f"decimal(28,{_SCALE})")), zero_dm
            ).alias("dm")
        )
        ranks = (
            nodes.join(in_sum, "node", "left")
            .crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dm_row))
            .select(
                "node",
                F.round(
                    teleport
                    + F.lit(PAGERANK_DAMPING)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dm").cast("double") / F.col("n")
                    ),
                    _SCALE,
                ).alias("rank"),
            )
        )
    return ranks


def pagerank_sql(
    edges_cte: str, iters: int = PAGERANK_ITERS, weighted: bool = False
) -> str:
    """DuckDB twin: the same fixed-point iterations as nested CTEs,
    including the per-round 1-row dangling-mass aggregate.
    ``edges_cte`` must define a CTE named ``edges`` with (src, dst) —
    plus an integer ``w`` column when ``weighted``. Returns a complete
    WITH...SELECT producing (node, rank)."""
    w_expr = "w" if weighted else "1::BIGINT"
    parts = [
        edges_cte,
        f"we AS (SELECT src, dst, {w_expr} AS w FROM edges)",
        "srcs AS (SELECT DISTINCT src AS node FROM we)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM we UNION ALL SELECT dst AS node FROM we))",
        # NOT EXISTS (not NOT IN) to match left_anti NULL semantics
        "dangling AS (SELECT node FROM nodes t WHERE NOT EXISTS "
        "(SELECT 1 FROM srcs s WHERE s.node = t.node))",
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
            f"""d{i} AS (
    SELECT COALESCE(SUM(CAST(r.rank AS DECIMAL(28,{_SCALE}))),
                    CAST(0 AS DECIMAL(28,{_SCALE}))) AS dm
    FROM r{i - 1} r JOIN dangling g ON g.node = r.node
)"""
        )
        parts.append(
            f"""r{i} AS (
    SELECT n.node,
           round((1 - {PAGERANK_DAMPING}) / (SELECT n FROM nn)
                 + {PAGERANK_DAMPING} * (CAST(COALESCE(s.s, 0) AS DOUBLE)
                     + CAST((SELECT dm FROM d{i}) AS DOUBLE) / (SELECT n FROM nn)),
                 {_SCALE}) AS rank
    FROM nodes n LEFT JOIN (SELECT node, SUM(c) AS s FROM c{i} GROUP BY node) s
      ON s.node = n.node
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"
