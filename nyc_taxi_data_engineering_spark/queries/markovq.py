"""Markov-chain (removal-effect) attribution — the principled
multi-touch model beside the heuristic linear/last-touch credits
(attribution_multitouch_events): model user journeys as an absorbing
Markov chain (absorbers: purchase = converted, journey end = lost),
then credit each channel by how much the START-state conversion
probability drops when that channel is removed (its transitions
redirected to the journey end).

Exactness contract — the whole computation is generated ONCE as SQL
expression text and evaluated verbatim by BOTH engines (Spark via
``F.expr``), so there is nothing to keep in sync:
- the transition matrix pivots to ONE row of integer counts
  (conditional sums);
- conversion probabilities run ``K`` rounds of value iteration
  unrolled as chained column blocks (Spark ``select``s / DuckDB CTEs
  — linear growth, never textual substitution);
- each round's update is Σ_t n(s,t)·v(t) with v quantized onto the
  12-dp grid by the portable floor chain, the product taken as EXACT
  integer-decimal × on-grid decimal (order-free sum), the terminal
  decimal→double STRING-hopped, and ONE double division by the
  (removal-invariant) row total;
- all literals are CAST(… AS DOUBLE) because Spark parses ``1.0`` as
  a decimal literal while DuckDB reads a double — the one cross-engine
  parser divergence this module must dodge.

100 TB: the only data-scale work is one per-user window (journey
order + truncation at first purchase) and one hash agg to the
(states+2)²-bounded matrix; the 5 × K iteration is single-row
expression evaluation in codegen. Removal redirects preserve row
totals, so no variant needs a second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.queries.registry import query

CHANNELS = ["click", "error", "signup", "view"]  # non-absorbing event types
TARGETS = CHANNELS + ["purchase"]  # '(end)' contributes 0 -> never a term
SOURCES = ["start"] + CHANNELS
MARKOV_ROUNDS = 15  # both engines compute the IDENTICAL 15th iterate


def _n(s: str, t: str) -> str:
    return f"n_{s}_{t}"


def _v(var: str, s: str, k: int) -> str:
    return f"v_{var}_{s}_{k}"


def _q12(expr: str) -> str:
    """Engine-portable 12-dp quantizer (the portable_round floor chain)
    for probabilities: |x| <= 1 sits far inside the 2^53/10^12 bound."""
    return f"(floor(({expr}) * 1e12 + 0.5) / 1e12)"


def _round_expr(var: str, s: str, k: int) -> str:
    """One value-iteration update for state ``s`` in variant ``var``
    ('base' or the removed channel) at round ``k``.

    Two r10 sf1-sweep fixes, both of the documented divergence classes:
    the old ``CAST(n * v AS DECIMAL)`` cast an ARBITRARY double product
    onto the decimal grid (Spark exact-binary HALF_UP vs DuckDB
    scale-llround — near-half values legally differ), and the terminal
    ``CAST(decimal-sum AS DOUBLE)`` double-rounds in DuckDB once the
    unscaled value tops 2^53 (n·1e12 does at sf1 counts). Now: quantize
    each v onto the 12-dp grid first (portable floor chain, exact both
    engines), multiply EXACT integer n by the on-grid v in decimal
    (exact), and STRING-hop the terminal decimal->double (correctly
    rounded at any magnitude; parses under both DuckDB and F.expr)."""
    terms = []
    for t in TARGETS:
        if var != "base" and t == var:
            continue  # removed channel: its inflow redirects to (end), value 0
        val = "CAST(1.0 AS DOUBLE)" if t == "purchase" else _v(var, t, k - 1)
        terms.append(
            f"(CAST({_n(s, t)} AS DECIMAL(18,0))"
            f" * CAST({_q12(val)} AS DECIMAL(13,12)))"
        )
    total = f"tot_{s}"
    return (
        f"CASE WHEN {total} = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE CAST(CAST({' + '.join(terms)} AS STRING) AS DOUBLE)"
        f" / CAST({total} AS DOUBLE) END"
    )


def _effect_exprs() -> dict[str, tuple[str, str]]:
    """(removal_effect, attribution_share) expression text per channel."""
    base = _v("base", "start", MARKOV_ROUNDS)
    effects = {
        c: (
            f"CASE WHEN {base} = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE CAST(1.0 AS DOUBLE) - {_v(c, 'start', MARKOV_ROUNDS)} / {base} END"
        )
        for c in CHANNELS
    }
    # effects are in [0, 1]: quantize onto the grid BEFORE the decimal
    # cast (same arbitrary-double-cast divergence as _round_expr)
    denom = " + ".join(
        f"CAST({_q12(f'({effects[c]})')} AS DECIMAL(13,12))" for c in CHANNELS
    )
    out = {}
    for c in CHANNELS:
        share = (
            f"CASE WHEN CAST({denom} AS DOUBLE) = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE ({effects[c]}) / CAST({denom} AS DOUBLE) END"
        )
        out[c] = (effects[c], share)
    return out


_PAIRS_SQL = """
r AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
p AS (SELECT user_id, MIN(rn) AS prn FROM r WHERE event_type = 'purchase' GROUP BY user_id),
k AS (
    SELECT r.user_id, r.event_type, r.rn, p.prn
    FROM r LEFT JOIN p ON r.user_id = p.user_id
    WHERE p.prn IS NULL OR r.rn <= p.prn
),
k2 AS (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS mrn FROM k),
pairs AS (
    SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id ORDER BY rn), 'start') AS src,
           event_type AS dst
    FROM k2
    UNION ALL
    SELECT event_type AS src, 'end' AS dst
    FROM k2 WHERE prn IS NULL AND rn = mrn
)
"""


def _matrix_select() -> list[str]:
    cols = []
    for s in SOURCES:
        for t in TARGETS:
            cols.append(
                f"CAST(COALESCE(SUM(CASE WHEN src = '{s}' AND dst = '{t}' THEN 1 END), 0)"
                f" AS BIGINT) AS {_n(s, t)}"
            )
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN src = '{s}' THEN 1 END), 0) AS BIGINT) AS tot_{s}"
        )
    return cols


def _oracle_sql() -> str:
    variants = ["base"] + CHANNELS
    ctes = [f"m0 AS (\n  SELECT {', '.join(_matrix_select())} FROM pairs\n)"]
    zeros = ", ".join(
        f"CAST(0.0 AS DOUBLE) AS {_v(var, s, 0)}" for var in variants for s in SOURCES
    )
    ctes.append(f"it0 AS (SELECT *, {zeros} FROM m0)")
    for k in range(1, MARKOV_ROUNDS + 1):
        vs = ", ".join(
            f"{_round_expr(var, s, k)} AS {_v(var, s, k)}"
            for var in variants
            for s in SOURCES
        )
        ctes.append(f"it{k} AS (SELECT *, {vs} FROM it{k - 1})")
    eff = _effect_exprs()
    base = _v("base", "start", MARKOV_ROUNDS)
    rows = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, {base} AS base_cvr, "
        f"{_v(c, 'start', MARKOV_ROUNDS)} AS removed_cvr, "
        f"({eff[c][0]}) AS removal_effect, ({eff[c][1]}) AS attribution_share "
        f"FROM it{MARKOV_ROUNDS}"
        for c in CHANNELS
    )
    return (
        f"WITH {_PAIRS_SQL.strip().rstrip()}," + ",\n".join(ctes) + f"\n{rows}\n"
        "ORDER BY channel"
    )


@query("markov_attribution_events", oracle=_oracle_sql())
def q_markov_attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution over the events journeys: per
    channel, the base conversion probability, the conversion
    probability with that channel removed, the removal effect, and
    the normalized attribution share. 4 rows. See module docstring
    for the shared-expression exactness contract."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    # ONE scan: journey order, first-purchase truncation, journey end,
    # and the lag pair all come from windows over the same user
    # partitioning (a single sort-exchange); the lost-journey terminal
    # pair rides along as a conditional second array element.
    r = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "prn",
            F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).over(wp),
        )
        .filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
        .withColumn("mrn", F.max("rn").over(wp))
        .withColumn(
            "src", F.coalesce(F.lag("event_type").over(w), F.lit("start"))
        )
    )
    step = F.struct(F.col("src"), F.col("event_type").alias("dst"))
    end = F.struct(
        F.col("event_type").alias("src"), F.lit("end").alias("dst")
    )
    pairs = r.select(
        F.explode(
            F.when(
                F.col("prn").isNull() & (F.col("rn") == F.col("mrn")),
                F.array(step, end),
            ).otherwise(F.array(step))
        ).alias("pr")
    ).select("pr.src", "pr.dst")
    row = pairs.agg(*[F.expr(c) for c in _matrix_select()])

    variants = ["base"] + CHANNELS
    row = row.select(
        "*", *[F.lit(0.0).alias(_v(var, s, 0)) for var in variants for s in SOURCES]
    )
    for k_ in range(1, MARKOV_ROUNDS + 1):
        row = row.select(
            "*",
            *[
                F.expr(_round_expr(var, s, k_)).alias(_v(var, s, k_))
                for var in variants
                for s in SOURCES
            ],
        )
    eff = _effect_exprs()
    base = _v("base", "start", MARKOV_ROUNDS)
    entries = [
        F.struct(
            F.lit(c).alias("channel"),
            F.col(base).alias("base_cvr"),
            F.col(_v(c, "start", MARKOV_ROUNDS)).alias("removed_cvr"),
            F.expr(eff[c][0]).alias("removal_effect"),
            F.expr(eff[c][1]).alias("attribution_share"),
        )
        for c in CHANNELS
    ]
    return (
        row.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .orderBy("channel")
    )
