"""Profiling queries: the generic single-pass table profiler applied
to the star schema (orders: mixed int/string/float/timestamp columns —
exercises every stringification branch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_data_engineering_spark.catalog import load_table
from nyc_taxi_data_engineering_spark.operators.profiling import profile, sql_profile_oracle
from nyc_taxi_data_engineering_spark.queries.registry import query

_ORDERS_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "float"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


@query("profile_orders", oracle=sql_profile_oracle("orders", _ORDERS_COLS))
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "orders"), [c for c, _ in _ORDERS_COLS])


# ------------------------------------------------- correlation matrix

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_DEC = "DECIMAL(18,6)"


def _corr_oracle(cols: list[str]) -> str:
    terms = [f"CAST(COUNT(*) AS DOUBLE) AS n"]
    for i, c in enumerate(cols):
        terms.append(f"CAST(SUM(CAST({c} AS {_DEC})) AS DOUBLE) AS s{i}")
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            # DECIMAL(19,6) factors force DuckDB's multiply into HUGEINT
            # storage (a DECIMAL(18,6)^2 product overflows its int64 path);
            # the 6-dp quantized values are identical either way, so Spark's
            # decimal(18,6) products stay exactly comparable.
            terms.append(
                f"CAST(SUM(CAST({cols[i]} AS DECIMAL(19,6)) * CAST({cols[j]} AS DECIMAL(19,6))) AS DOUBLE) AS p{i}_{j}"
            )
    moments = ",\n           ".join(terms)
    selects = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            corr = (
                f"(n * p{i}_{j} - s{i} * s{j}) / "
                f"sqrt((n * p{i}_{i} - s{i} * s{i}) * (n * p{j}_{j} - s{j} * s{j}))"
            )
            selects.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, {corr} AS corr FROM m"
            )
    return f"WITH m AS (\n    SELECT {moments}\n    FROM lineitem\n)\n" + "\nUNION ALL ".join(selects)


@query("lineitem_correlations", oracle=_corr_oracle(_CORR_COLS))
def q_lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the lineitem numeric columns in
    ONE scan: all 4 sums, 4 self-products, and 6 cross-products
    accumulate as exact DECIMAL moments in a single hash aggregate
    (map-side combine, no second pass, no Spark stat helper), then the
    6 pairwise correlations derive in double arithmetic whose inputs
    and expression shape are bit-identical to the oracle's — no
    rounding anywhere, the doubles simply match. The single-pass
    moment shape is the only way to profile 100 TB: k(k+1)/2 + k + 1
    accumulators, one shuffle of ONE row per partition."""
    from pyspark.sql import functions as F

    cols = _CORR_COLS
    dec = "decimal(18,6)"
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).cast(dec)).cast("double").alias(f"s{i}"))
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(F.col(cols[i]).cast(dec) * F.col(cols[j]).cast(dec))
                .cast("double")
                .alias(f"p{i}_{j}")
            )
    m = load_table(spark, sf_dir, "lineitem").agg(*aggs)
    n = F.col("n")
    pairs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            si, sj = F.col(f"s{i}"), F.col(f"s{j}")
            corr = (n * F.col(f"p{i}_{j}") - si * sj) / F.sqrt(
                (n * F.col(f"p{i}_{i}") - si * si) * (n * F.col(f"p{j}_{j}") - sj * sj)
            )
            pairs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    corr.alias("corr"),
                )
            )
    return m.select(F.explode(F.array(*pairs)).alias("r")).select("r.col_a", "r.col_b", "r.corr")
