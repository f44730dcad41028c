"""Materialized-view query rewriting: route an aggregate query to a
registered Delta MV when the MV can answer it, with roll-up
compensation — the optimizer trick that turns a 100 TB fact scan into
a read of a few thousand pre-aggregated rows.

A view registers its grouping keys and additive aggregate columns.
A request (keys, aggs, optional key-only filters) is answerable iff:
- requested keys are a subset of the MV's keys (coarser roll-up OK),
- every requested aggregate derives from the MV's additive state:
  SUM from the stored SUM, COUNT from the stored COUNT, AVG from the
  SUM/COUNT pair (never stored directly — averages don't re-aggregate),
- filters touch grouping keys only (anything finer needs base rows).

Rewriting then re-aggregates the MV rows (SUM of sums, SUM of counts)
— valid because the stored state is additive; the decimal transport
(functions.stable_sum) keeps the re-aggregated sums exact, so a
rewritten query is bit-identical to the base-table recompute, which
is exactly what the oracle gate checks. Unanswerable requests fall
back to the base table — same helper, same output shape, so callers
never branch.

MV freshness is the maintainer's contract (see
delta_incremental_rollup_orders for the incremental-refresh path);
the rewriter answers from whatever version the log serves.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.functions import stable_sum


@dataclass(frozen=True)
class MaterializedView:
    """An additive-state rollup MV over one base table.

    ``sums`` maps stored column name -> base expression SQL (what the
    stored decimal SUM aggregates); ``counts`` maps stored column name
    -> None (COUNT(*) state).
    """

    name: str
    base_table: str
    group_keys: tuple[str, ...]
    sums: dict[str, str] = field(default_factory=dict)
    counts: tuple[str, ...] = ("n_rows",)
    path: str = ""


@dataclass(frozen=True)
class AggRequest:
    """keys: output grouping; aggs: out_name -> (kind, operand) with
    kind in {sum, count, avg}; operand is the BASE-table expression
    SQL (matched against the MV's registered state) or None for
    count. filters: [(col, op, value)] with op in {=, <=, >=, <, >}."""

    keys: tuple[str, ...]
    aggs: dict[str, tuple[str, str | None]]
    filters: tuple[tuple[str, str, object], ...] = ()


_OPS = {
    "=": lambda c, v: c == v,
    "<=": lambda c, v: c <= v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    ">": lambda c, v: c > v,
}


def can_answer(mv: MaterializedView, req: AggRequest) -> bool:
    if not set(req.keys) <= set(mv.group_keys):
        return False
    if any(col not in mv.group_keys for col, _, _ in req.filters):
        return False
    for kind, operand in req.aggs.values():
        if kind == "count":
            if not mv.counts:
                return False
        elif kind in ("sum", "avg"):
            if operand not in mv.sums.values():
                return False
            if kind == "avg" and not mv.counts:
                return False
        else:
            return False
    return True


def _stored_sum_col(mv: MaterializedView, operand: str) -> str:
    return next(k for k, v in mv.sums.items() if v == operand)


def answer(
    spark: SparkSession,
    mv: MaterializedView,
    req: AggRequest,
    base_df: DataFrame,
) -> tuple[DataFrame, bool]:
    """(result, used_mv). The result schema is identical either way:
    req.keys then req.aggs in declaration order (sums/avgs as double,
    counts as bigint)."""
    if can_answer(mv, req):
        from nyc_taxi_data_engineering_spark.sources import delta_log as D

        src = D.read_delta_log(spark, mv.path)
        used_mv = True
    else:
        src = None
        used_mv = False

    def _filtered(df: DataFrame) -> DataFrame:
        for col, op, val in req.filters:
            df = df.filter(_OPS[op](F.col(col), val))
        return df

    if used_mv:
        aggs: list[Column] = []
        for out, (kind, operand) in req.aggs.items():
            if kind == "count":
                aggs.append(F.sum(mv.counts[0]).cast("bigint").alias(out))
            elif kind == "sum":
                stored = _stored_sum_col(mv, operand)
                # stored state is already decimal-exact; SUM of decimals
                # stays exact, cast to double only at the edge
                aggs.append(F.sum(stored).cast("double").alias(out))
            else:  # avg = exact sum / exact count
                stored = _stored_sum_col(mv, operand)
                aggs.append(
                    (F.sum(stored).cast("double") / F.sum(mv.counts[0]).cast("double")).alias(out)
                )
        return _filtered(src).groupBy(*req.keys).agg(*aggs), True

    aggs = []
    for out, (kind, operand) in req.aggs.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum":
            aggs.append(stable_sum(F.expr(operand), scale=2).alias(out))
        else:
            aggs.append(
                (stable_sum(F.expr(operand), scale=2) / F.count(F.lit(1))).alias(out)
            )
    return _filtered(base_df).groupBy(*req.keys).agg(*aggs), False


def build_mv(df: DataFrame, mv: MaterializedView) -> None:
    """Materialize the MV's additive state to its Delta path: decimal
    SUM columns (exact, mergeable) plus the COUNT column."""
    from nyc_taxi_data_engineering_spark.sources import delta_log as D

    aggs = [
        F.sum(F.expr(expr).cast("decimal(18,2)")).alias(name)
        for name, expr in mv.sums.items()
    ] + [F.count(F.lit(1)).alias(c) for c in mv.counts]
    D.write_delta(df.groupBy(*mv.group_keys).agg(*aggs), mv.path, mode="overwrite")
