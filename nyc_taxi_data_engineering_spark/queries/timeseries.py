"""Time-series regularization queries: calendar gap-fill + forward
fill over the supplier daily-revenue series (operators/timeseries.py
applied to the flagship revenue rollup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.functions import stable_sum, stable_sum_sql
from nyc_taxi_data_engineering_spark.operators.timeseries import forward_fill, gap_fill
from nyc_taxi_data_engineering_spark.queries.registry import query

# One year keeps the dense spine ~365 x |suppliers| — representative
# without exploding the oracle compare. The range predicate (not
# year()) reaches the parquet scan as a pushed filter.
_LO, _HI = "1994-01-01", "1995-01-01"


@query(
    "supplier_daily_gapfill",
    oracle=f"""
WITH daily AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
         {stable_sum_sql('l_extendedprice * (1 - l_discount)', 4, 23)} AS rev,
         COUNT(*) AS n_trips
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_LO}' AND l_shipdate < TIMESTAMP '{_HI}'
  GROUP BY 1, 2
),
bounds AS (SELECT l_suppkey, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1),
spine AS (
  SELECT l_suppkey, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
)
SELECT s.l_suppkey, strftime(s.d, '%Y-%m-%d') AS ship_date,
       daily.rev IS NULL AS is_gap,
       daily.rev AS rev,
       last_value(daily.rev IGNORE NULLS) OVER (
         PARTITION BY s.l_suppkey ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_ff,
       COALESCE(daily.n_trips, 0) AS n_trips
FROM spine s LEFT JOIN daily ON s.l_suppkey = daily.l_suppkey AND s.d = daily.d
""",
)
def q_supplier_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-supplier daily revenue: every day in each supplier's
    observed 1994 range appears, gaps flagged and forward-filled with
    the last traded value. Spine generation is per-key sequence +
    explode (distributed, no driver calendar); the fill is one
    per-supplier running window. Dense output is |suppliers| x ~365
    regardless of fact skew."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_LO)) & (F.col("l_shipdate") < F.lit(_HI))
    )
    daily = li.groupBy(
        "l_suppkey", F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        stable_sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 4, 23
        ).alias("rev"),
        F.count(F.lit(1)).alias("n_trips"),
    )
    filled = gap_fill(daily, "l_suppkey", "d", ["rev"])
    ff = forward_fill(filled, "l_suppkey", "d", ["rev"])
    return ff.select(
        "l_suppkey",
        F.date_format("d", "yyyy-MM-dd").alias("ship_date"),
        "is_gap",
        "rev",
        F.col("rev_ff"),
        F.coalesce("n_trips", F.lit(0)).alias("n_trips"),
    )


ANOMALY_LOOKBACK = 24  # trailing hours in the baseline window
ANOMALY_MIN_HISTORY = 12  # hours of history before scoring starts


@query(
    "events_rate_anomaly",
    oracle=f"""
WITH hours AS (
    SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour,
           COUNT(*) AS c
    FROM events GROUP BY 1
),
w AS (
    SELECT hour, c,
           SUM(c) OVER win AS s,
           SUM(c * c) OVER win AS sq,
           COUNT(*) OVER win AS n
    FROM hours
    WINDOW win AS (ORDER BY hour
                   ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
),
m AS (
    SELECT hour, c, n,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_trailing,
           CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS msq
    FROM w
)
SELECT hour, c AS n_events, mean_trailing,
       (CAST(c AS DOUBLE) - mean_trailing)
           / sqrt(msq - mean_trailing * mean_trailing) AS z_score,
       (CAST(c AS DOUBLE) - mean_trailing)
           / sqrt(msq - mean_trailing * mean_trailing) > 3.0 AS is_anomaly
FROM m
WHERE n >= {ANOMALY_MIN_HISTORY} AND msq - mean_trailing * mean_trailing > 0
""",
)
def q_events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding z-score anomaly detection on the event rate — the
    ops-monitoring primitive (rate spike / drop flagging) computed the
    scale-correct way: raw events collapse to an HOURLY series first
    (one hash agg with map-side combine), and the trailing-24h window
    runs over that TINY series, not the data. Baseline mean/variance
    derive from integer sums (counts and squared counts), so every
    double is division/sqrt of exact integers — bit-identical in both
    engines with no rounding anywhere. Scoring starts after 12 hours
    of history; zero-variance baselines are excluded."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("hour"), "c")
    )
    win = Window.orderBy("hour").rowsBetween(-ANOMALY_LOOKBACK, -1)
    w = hours.select(
        "hour",
        "c",
        F.sum("c").over(win).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(win).alias("sq"),
        F.count(F.lit(1)).over(win).alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    m = w.select("hour", "c", "n", mean.alias("mean_trailing"),
                 (F.col("sq").cast("double") / F.col("n").cast("double")).alias("msq"))
    var = F.col("msq") - F.col("mean_trailing") * F.col("mean_trailing")
    z = (F.col("c").cast("double") - F.col("mean_trailing")) / F.sqrt(var)
    return (
        m.filter((F.col("n") >= ANOMALY_MIN_HISTORY) & (var > 0))
        .select(
            "hour",
            F.col("c").alias("n_events"),
            "mean_trailing",
            z.alias("z_score"),
            (z > 3.0).alias("is_anomaly"),
        )
    )


EWMA_LAGS = 8  # trailing hours in the exponential baseline
EWMA_SPIKE_FACTOR = 2.0


def _ewma_sql_terms() -> tuple[str, str]:
    num = " + ".join(
        f"CASE WHEN lag(c, {k}) OVER win IS NULL THEN 0.0 "
        f"ELSE CAST(lag(c, {k}) OVER win AS DOUBLE) * {2.0 ** -k!r} END"
        for k in range(1, EWMA_LAGS + 1)
    )
    den = " + ".join(
        f"CASE WHEN lag(c, {k}) OVER win IS NULL THEN 0.0 ELSE {2.0 ** -k!r} END"
        for k in range(1, EWMA_LAGS + 1)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms()


@query(
    "events_ewma_spikes",
    oracle=f"""
WITH hours AS (
    SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS hour,
           COUNT(*) AS c
    FROM events GROUP BY 1
),
w AS (
    SELECT hour, c, {_EWMA_NUM} AS num, {_EWMA_DEN} AS den
    FROM hours
    WINDOW win AS (ORDER BY hour)
)
SELECT hour, c AS n_events,
       num / den AS ewma_trailing,
       CAST(c AS DOUBLE) / (num / den) AS rate_ratio,
       CAST(c AS DOUBLE) > {EWMA_SPIKE_FACTOR} * (num / den) AS is_spike
FROM w
WHERE den > 0
""",
)
def q_events_ewma_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA rate baseline + spike flags — the smoothing alternative to
    the sliding z-score (events_rate_anomaly): recent hours dominate
    the baseline with exponentially decaying half-life-1h weights.
    Same scale shape: raw events collapse to the HOURLY series first
    (one map-side-combined hash agg), the lag window runs over the
    tiny series only. Weights are binary fractions (2^-k) so every
    term count*2^-k is EXACT in doubles, and the 8-term sums are
    written in the same left-to-right order in both engines —
    bit-identical with no rounding contract needed. Boundary hours
    normalize by the weight mass actually present."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("hour"), "c")
    )
    win = Window.orderBy("hour")
    zero = F.lit(0.0)
    num = zero
    den = zero
    for k in range(1, EWMA_LAGS + 1):
        lagc = F.lag("c", k).over(win)
        wk = F.lit(2.0 ** -k)
        num = num + F.when(lagc.isNull(), zero).otherwise(lagc.cast("double") * wk)
        den = den + F.when(lagc.isNull(), zero).otherwise(wk)
    w = hours.select("hour", "c", num.alias("num"), den.alias("den"))
    ewma = F.col("num") / F.col("den")
    return (
        w.filter(F.col("den") > 0)
        .select(
            "hour",
            F.col("c").alias("n_events"),
            ewma.alias("ewma_trailing"),
            (F.col("c").cast("double") / ewma).alias("rate_ratio"),
            (F.col("c").cast("double") > F.lit(EWMA_SPIKE_FACTOR) * ewma).alias("is_spike"),
        )
    )
