"""Aggregate-compare for the sf10 queries whose RESULT is too large to
toPandas (the sixth tier's 5 comparison-bound names, COVERAGE.md): the
engines are fine at sf10 — the harness's row-by-row compare is what
overflows — so verify them by collapsing BOTH engines' results to one
exact-aggregate row and hash-comparing that.

Per result column, engine-side (never collecting the result):
- count(*) and count(col)  — row multiset size and null layout,
- min / max                — value envelope (exact: all result columns
                             are grid-valued doubles, dates, or ints),
- an EXACT checksum: doubles go through the PORTABLE quantizer
  (floor(x*1e6 + 0.5), a fixed IEEE chain producing the identical
  integer on both engines for identical input doubles) and sum as
  DECIMAL(38,0) — a direct double->DECIMAL cast is NOT portable: the
  engines' cast rounding differs on values near the 6-dp half, which
  off-grid results (e.g. interpolation's /gap rationals) hit by the
  thousands. Integers sum as DECIMAL(38,0); dates as SUM(epoch days).

A mismatch in any aggregate proves a row-level divergence; agreement is
as strong as the grid assumption (documented per query in COVERAGE.md).

Usage:
  python tools/sf10_agg_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_NAMES = [
    "daily_vendor_revenue",
    "daily_vendor_revenue_sql",
    "supplier_daily_gapfill",
    "supplier_daily_interpolate",
    "supplier_rolling_revenue_7d",
]


def _spark_aggs(df):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.count(c).cast("long").alias(f"{f.name}__n"))
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            quant = F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
            aggs += [
                F.min(c).alias(f"{f.name}__min"),
                F.max(c).alias(f"{f.name}__max"),
                F.sum(quant).cast("string").alias(f"{f.name}__sum"),
                # domain guard: floor(x*1e6+0.5) yields LONG — overflow
                # (ANSI error) at |x| >= ~9.2e12; main() fails loudly on
                # this instead of reporting a confusing checksum mismatch
                F.max(F.abs(c)).alias(f"{f.name}__absmax"),
            ]
        elif isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.DecimalType)):
            aggs += [
                F.min(c).cast("string").alias(f"{f.name}__min"),
                F.max(c).cast("string").alias(f"{f.name}__max"),
                F.sum(c.cast("decimal(38,6)")).cast("string").alias(f"{f.name}__sum"),
            ]
        elif isinstance(f.dataType, T.DateType):
            aggs += [
                F.min(c).cast("string").alias(f"{f.name}__min"),
                F.max(c).cast("string").alias(f"{f.name}__max"),
                F.sum(F.datediff(c, F.lit("1970-01-01")).cast("decimal(38,6)"))
                .cast("string")
                .alias(f"{f.name}__sum"),
            ]
        else:  # strings etc.: count distinct + min/max lexicographic
            aggs += [
                F.min(c).cast("string").alias(f"{f.name}__min"),
                F.max(c).cast("string").alias(f"{f.name}__max"),
                F.countDistinct(c).cast("string").alias(f"{f.name}__sum"),
            ]
    return df.agg(*aggs)


def _duck_aggs(con, oracle_sql: str):
    desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle_sql})").fetchall()
    parts = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for name, typ, *_ in desc:
        q = f'"{name}"'
        parts.append(f"CAST(COUNT({q}) AS BIGINT) AS {name}__n")
        t = typ.upper()
        if t in ("DOUBLE", "FLOAT", "REAL"):
            parts += [
                f"MIN({q}) AS {name}__min",
                f"MAX({q}) AS {name}__max",
                f"CAST(SUM(CAST(floor({q} * 1e6 + 0.5) AS DECIMAL(38,0))) AS VARCHAR)"
                f" AS {name}__sum",
                f"MAX(ABS({q})) AS {name}__absmax",
            ]
        elif t.startswith(("BIGINT", "INTEGER", "SMALLINT", "DECIMAL", "HUGEINT", "TINYINT")):
            parts += [
                f"CAST(MIN({q}) AS VARCHAR) AS {name}__min",
                f"CAST(MAX({q}) AS VARCHAR) AS {name}__max",
                f"CAST(SUM(CAST({q} AS DECIMAL(38,6))) AS VARCHAR) AS {name}__sum",
            ]
        elif t == "DATE":
            parts += [
                f"CAST(MIN({q}) AS VARCHAR) AS {name}__min",
                f"CAST(MAX({q}) AS VARCHAR) AS {name}__max",
                f"CAST(SUM(CAST({q} - DATE '1970-01-01' AS DECIMAL(38,6))) AS VARCHAR)"
                f" AS {name}__sum",
            ]
        else:
            parts += [
                f"CAST(MIN({q}) AS VARCHAR) AS {name}__min",
                f"CAST(MAX({q}) AS VARCHAR) AS {name}__max",
                f"CAST(COUNT(DISTINCT {q}) AS VARCHAR) AS {name}__sum",
            ]
    return con.execute(f"SELECT {', '.join(parts)} FROM ({oracle_sql})").fetchdf()


def main() -> int:
    from nyc_taxi_data_engineering_spark.queries import registry
    from nyc_taxi_data_engineering_spark.session import get_spark
    from tools.oracle_check import compare, duckdb_con

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else os.path.join(REPO, ".scale_data", "sf10")
    names = argv[1:] or DEFAULT_NAMES

    reg = registry()
    spark = get_spark("sf10_agg_check")
    con = duckdb_con(sf_dir)
    failed = []
    for name in names:
        spec = reg[name]
        try:
            spark_pdf = _spark_aggs(spec.fn(spark, sf_dir)).toPandas()
            oracle_pdf = _duck_aggs(con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {e}")
            continue
        out_of_domain = [
            c
            for c in spark_pdf.columns
            if c.endswith("__absmax")
            and spark_pdf[c][0] is not None
            and float(spark_pdf[c][0]) >= 9.2e12
        ]
        if out_of_domain:
            failed.append(name)
            print(
                f"FAIL {name}: out of tool domain — |x| >= 9.2e12 in "
                f"{[c[: -len('__absmax')] for c in out_of_domain]}; the 1e6 "
                f"quantizer's floor() would overflow LONG. Use a decimal-domain "
                f"checksum for these columns instead."
            )
            continue
        errs = compare(spark_pdf, oracle_pdf, name)
        if errs:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"OK   {name}: agg-verified, n_rows={int(spark_pdf['n_rows'][0])}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
