"""MV query-rewriting decision logic + rewritten-vs-base equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators.mv_rewrite import (
    AggRequest,
    MaterializedView,
    answer,
    build_mv,
    can_answer,
)


@pytest.fixture()
def mv(tmp_path):
    return MaterializedView(
        name="t_by_ab",
        base_table="t",
        group_keys=("a", "b"),
        sums={"sum_x": "x"},
        path=str(tmp_path / "mv"),
    )


@pytest.fixture()
def base(spark):
    return spark.range(1000).select(
        (F.col("id") % 3).alias("a"),
        (F.col("id") % 5).alias("b"),
        (F.col("id") % 7).alias("c"),
        (F.col("id") * 1.25).alias("x"),
    )


def test_can_answer_decision_table(mv):
    ok = lambda **kw: can_answer(mv, AggRequest(**kw))  # noqa: E731
    sum_x = {"s": ("sum", "x")}
    assert ok(keys=("a",), aggs=sum_x)  # coarser roll-up
    assert ok(keys=("a", "b"), aggs=sum_x)  # exact grain
    assert ok(keys=("a",), aggs={"n": ("count", None)})
    assert ok(keys=("a",), aggs={"m": ("avg", "x")})
    assert ok(keys=("a",), aggs=sum_x, filters=(("b", "<=", 2),))  # key filter
    assert not ok(keys=("a", "c"), aggs=sum_x)  # finer than the MV
    assert not ok(keys=("a",), aggs={"s": ("sum", "y")})  # unregistered operand
    assert not ok(keys=("a",), aggs=sum_x, filters=(("c", "=", 1),))  # non-key filter
    assert not ok(keys=("a",), aggs={"m": ("max", "x")})  # non-additive kind


def test_rewritten_equals_base_recompute(spark, mv, base):
    build_mv(base, mv)
    req = AggRequest(
        keys=("a",),
        aggs={"n": ("count", None), "s": ("sum", "x"), "m": ("avg", "x")},
        filters=(("b", "<=", 2),),
    )
    got, used = answer(spark, mv, req, base)
    assert used
    # force the fallback path for the SAME request by hiding the operand
    blind = MaterializedView(
        name="blind", base_table="t", group_keys=("a", "b"), sums={}, path=mv.path
    )
    want, used2 = answer(spark, blind, req, base)
    assert not used2
    lhs = sorted(tuple(r) for r in got.collect())
    rhs = sorted(tuple(r) for r in want.collect())
    assert lhs == rhs


def test_unanswerable_falls_back_to_base(spark, mv, base):
    build_mv(base, mv)
    req = AggRequest(keys=("a",), aggs={"s": ("sum", "x")}, filters=(("c", "=", 1),))
    out, used = answer(spark, mv, req, base)
    assert not used
    assert out.count() == 3
