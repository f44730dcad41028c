"""Dominant principal component by power iteration — the embedding
whitening / decorrelation primitive a SemDeDup-style curation pipeline
runs before clustering (remove the dominant direction, cosine geometry
sharpens), and the minimal PCA any feature-drift monitor needs.

Formulated without ever materializing the covariance matrix: each
round multiplies X^T (X v) in two keyed aggregations over the
LONG-FORM corpus (vec_id, pos, val) —

    w(vec_id) = sum_pos   c(vec_id, pos) * v(pos)      -- join on pos
    u(pos)    = sum_vecid c(vec_id, pos) * w(vec_id)   -- join on vec_id
    v'(pos)   = u(pos) / ||u||

so the work per round is two hash aggs with map-side combine plus one
64-row broadcast join — never an n×n or d×d intermediate, and nothing
per-vector crosses the driver (the running vector v stays a 64-row
DataFrame, chained lazily like pagerank's ranks).

Determinism contract (same playbook as operators/graph.pagerank): the
only order-sensitive ops are the sums, and every summed term is
rounded to 12 dp then accumulated as DECIMAL(38,12) — exact and
order-independent — before one double divide/sqrt (IEEE sqrt is
correctly rounded, so engine-identical). Each new v rounds to 12 dp.
The returned component's sign is normalized so dim 1 is >= 0 (power
iteration converges up to sign; both engines see bit-identical values
and take the same branch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_ITERS = 3
_S = 12  # dp per summed term / per component
_DEC = f"decimal(38,{_S})"


def _dec_sum(term):
    return F.sum(F.round(term, _S).cast(_DEC)).cast("double")


def power_iteration_component(x: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """(dim, component) — the dominant eigenvector of the mean-centered
    covariance of a long-form corpus ``x`` (vec_id, pos, val: double),
    after ``iters`` power-iteration rounds from the uniform unit start
    (1/sqrt(d) per dim must be exact in doubles — d a power of 4, e.g.
    the 64-dim corpus gives 1/8). ``dim`` is 1-based."""
    mean = x.groupBy("pos").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)),
            _S,
        ).alias("mu")
    )
    cent = x.join(F.broadcast(mean), "pos").select(
        "vec_id", "pos", (F.col("val") - F.col("mu")).alias("cv")
    )
    d_row = mean.agg(F.count(F.lit(1)).cast("double").alias("d"))
    v = mean.crossJoin(F.broadcast(d_row)).select(
        "pos", (F.lit(1.0) / F.sqrt(F.col("d"))).alias("vv")
    )
    for _ in range(iters):
        w = (
            cent.join(F.broadcast(v), "pos")
            .groupBy("vec_id")
            .agg(_dec_sum(F.col("cv") * F.col("vv")).alias("w"))
        )
        u = (
            cent.join(w, "vec_id")
            .groupBy("pos")
            .agg(_dec_sum(F.col("cv") * F.col("w")).alias("u"))
        )
        n_row = u.agg(F.sqrt(_dec_sum(F.col("u") * F.col("u"))).alias("nrm"))
        # Zero norm (constant corpus) → NULL components, not a crash
        # (ANSI divide-by-zero) and not a wrong vector; same CASE guard
        # in the SQL twin.
        v = u.crossJoin(F.broadcast(n_row)).select(
            "pos",
            F.round(
                F.when(F.col("nrm") != 0, F.col("u") / F.col("nrm")), _S
            ).alias("vv"),
        )
    sign_row = v.filter(F.col("pos") == 0).select(
        F.when(F.col("vv") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sgn")
    )
    return v.crossJoin(F.broadcast(sign_row)).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("vv") * F.col("sgn"), _S).alias("component"),
    )


def power_iteration_sql(corpus_cte: str, iters: int = PCA_ITERS) -> str:
    """DuckDB twin: the same rounds as nested CTEs. ``corpus_cte`` must
    define a CTE named ``x`` with (vec_id, pos, val) — pos 0-based,
    val DOUBLE widened from the stored FLOAT."""
    dec = f"DECIMAL(38,{_S})"
    parts = [
        corpus_cte,
        f"""mean AS (
    SELECT pos,
           round(CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), {_S}) AS mu
    FROM x GROUP BY pos
)""",
        "cent AS (SELECT vec_id, x.pos, (val - mu) AS cv FROM x JOIN mean ON mean.pos = x.pos)",
        "dd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM mean)",
        "v0 AS (SELECT pos, 1.0 / sqrt((SELECT d FROM dd)) AS vv FROM mean)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""w{i} AS (
    SELECT vec_id,
           CAST(SUM(CAST(round(c.cv * v.vv, {_S}) AS {dec})) AS DOUBLE) AS w
    FROM cent c JOIN v{i - 1} v ON v.pos = c.pos GROUP BY vec_id
)"""
        )
        parts.append(
            f"""u{i} AS (
    SELECT pos,
           CAST(SUM(CAST(round(c.cv * w.w, {_S}) AS {dec})) AS DOUBLE) AS u
    FROM cent c JOIN w{i} w ON w.vec_id = c.vec_id GROUP BY pos
)"""
        )
        parts.append(
            f"""n{i} AS (
    SELECT sqrt(CAST(SUM(CAST(round(u * u, {_S}) AS {dec})) AS DOUBLE)) AS nrm
    FROM u{i}
)"""
        )
        parts.append(
            f"v{i} AS (SELECT pos, round(CASE WHEN (SELECT nrm FROM n{i}) <> 0 "
            f"THEN u / (SELECT nrm FROM n{i}) END, {_S}) AS vv FROM u{i})"
        )
    parts.append(
        f"sgn AS (SELECT CASE WHEN (SELECT vv FROM v{iters} WHERE pos = 0) < 0 "
        "THEN -1.0 ELSE 1.0 END AS s)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(pos + 1 AS INT) AS dim,
       round(vv * (SELECT s FROM sgn), {_S}) AS component
FROM v{iters}"""
    )
