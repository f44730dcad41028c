"""Temporal joins: point-in-time (as-of) enrichment against versioned
tables — the operator that makes SCD2 masters (operators/scd2.py)
usable for training-data correctness ("what did this entity look like
WHEN the event happened", no feature leakage from the future).

Spark has no built-in as-of join; two formulations are provided:

- ``point_in_time_join``: for interval tables (SCD2's
  effective_start/end). An equi-join on the entity key plus an
  interval predicate; because SCD2 intervals are disjoint per key,
  each left row matches at most one version — exact, no dedup needed.
  The equi key keeps it a hash/sort-merge join (the range predicate is
  a post-join filter on co-partitioned data), so it scales like any
  keyed join.
- ``asof_join``: for point-timestamped right sides (no intervals):
  equi-join on key, keep right rows at-or-before the left timestamp,
  take the latest per left row via one window. Costs a join fan-out of
  the right side's per-key history — prefer compacting the right side
  to intervals (scd2) when history is long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_time_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    start_col: str = "effective_start_ts",
    end_col: str = "effective_end_ts",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the right-side version whose validity
    interval contains the left timestamp: start <= ts < end."""
    lft, rgt = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{left_key}") == F.col(f"r.{right_key}"))
        & (F.col(f"r.{start_col}") <= F.col(f"l.{left_ts}"))
        & (F.col(f"l.{left_ts}") < F.col(f"r.{end_col}"))
    )
    return lft.join(rgt, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
) -> DataFrame:
    """Nearest-prior as-of join: latest right row with
    right_ts <= left_ts per left row (``left_id`` must uniquely
    identify left rows — it anchors the top-1 window)."""
    joined = left.join(right, on, "inner").filter(F.col(right_ts) <= F.col(left_ts))
    w = Window.partitionBy(left_id).orderBy(F.col(right_ts).desc())
    return (
        joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """KEYLESS interval-containment join: each left row matched to
    every right interval with ``start <= ts < end`` (intervals may
    overlap — a row can match several).

    Without an equi key, Catalyst can only plan ``l.ts BETWEEN r.lo
    AND r.hi`` as a (broadcast) nested-loop — rows x intervals
    comparisons, a non-starter at corpus scale. This rewrites the
    range predicate into an equi-join on a derived time bucket:
    intervals explode to one row per ``bucket_seconds`` grain they
    overlap, left rows compute their single containing bucket, and the
    exact predicate runs as a post-join filter. Each match surfaces
    exactly once (the left row has ONE bucket), so no dedup pass.

    Cost model: the right side inflates by ~(interval span / grain),
    the left side not at all — pick ``bucket_seconds`` near the median
    interval span so inflation stays O(1). Requires
    ``start <= end`` on every right row (``sequence`` would fail on a
    negative step).

    ``how`` is restricted to left-preserving joins: the right side is
    exploded per bucket, so right/full-outer would surface one
    null-extended row PER UNMATCHED REPLICA of an interval — silently
    wrong multiplicity. The containment predicate lives in the join
    condition itself (not a post-join filter), so 'left' keeps
    unmatched left rows null-extended instead of dropping them.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"range_join how={how!r} not supported; use one of {sorted(allowed)} "
            "(right/full would duplicate unmatched intervals per bucket replica)"
        )
    g = int(bucket_seconds)
    lft = left.withColumn(
        "_rj_bucket", F.floor(F.unix_timestamp(F.col(left_ts)) / g)
    ).alias("_rjl")
    rgt = right.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / g),
                F.floor(F.unix_timestamp(F.col(end_col)) / g),
            )
        ),
    ).alias("_rjr")
    cond = (
        (F.col("_rjl._rj_bucket") == F.col("_rjr._rj_bucket"))
        & (F.col(f"_rjr.{start_col}") <= F.col(f"_rjl.{left_ts}"))
        & (F.col(f"_rjl.{left_ts}") < F.col(f"_rjr.{end_col}"))
    )
    return lft.join(rgt, cond, how).drop("_rj_bucket")
