"""SQL workflow runner (reference C11: glue_jobs/transform_check.py —
an ordered workflow of {transform | quality | test} SQL steps where a
check step is a SELECT COUNT(*) that must return 0).

The executor is ``spark.sql`` over temp views instead of psycopg2 over
Postgres; Catalyst replaces the Postgres planner 1:1 (SURVEY §3.3).
Multi-statement transforms split on ';' exactly like the reference
(transform_check.py:50-62).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class SqlCheckFailure(RuntimeError):
    pass


@dataclass(frozen=True)
class SqlStep:
    name: str
    kind: str  # transform | quality | test
    sql: str


@dataclass
class SqlStepResult:
    name: str
    kind: str
    status: str  # OK | VIOLATIONS | ERROR
    violations: int = 0


def run_sql_workflow(
    spark: SparkSession, steps: list[SqlStep], fail_fast: bool = True
) -> list[SqlStepResult]:
    """Execute steps in order. transform: run each ';'-separated
    statement (results registered by the SQL itself via CREATE TEMP
    VIEW). quality/test: fetch the scalar violation count; > 0 means
    the contract is broken (raise under fail_fast, else record)."""
    results: list[SqlStepResult] = []
    for step in steps:
        if step.kind == "transform":
            for stmt in [s.strip() for s in step.sql.split(";") if s.strip()]:
                spark.sql(stmt)
            results.append(SqlStepResult(step.name, step.kind, "OK"))
        elif step.kind in ("quality", "test"):
            count = int(spark.sql(step.sql).first()[0])
            if count > 0:
                results.append(SqlStepResult(step.name, step.kind, "VIOLATIONS", count))
                if fail_fast:
                    raise SqlCheckFailure(f"{step.kind} step {step.name!r}: {count} violations")
            else:
                results.append(SqlStepResult(step.name, step.kind, "OK", 0))
        else:
            raise ValueError(f"unknown step kind {step.kind!r} in {step.name!r}")
    return results
