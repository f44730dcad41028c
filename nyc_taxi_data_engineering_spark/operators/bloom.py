"""Deterministic Bloom-filter semi-join prefilter — the runtime-filter
pattern made explicit (Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` does this opaquely inside
AQE; this operator is the portable, testable version for pipelines
that must prune a 100 TB probe side BEFORE its shuffle).

Scale story: the build side's keys are folded into an ``m``-bit filter
represented as a DataFrame of DISTINCT set bit positions (≤ m rows —
thousands, never data-scale), which broadcasts everywhere. The probe
side then survives ``k`` consecutive **broadcast left-semi joins**
(one per hash function) — zero shuffles on the probe, no distinct, no
exchange; rows whose k positions are all set pass. Bloom semantics
guarantee NO false negatives; false positives are bounded by
``(1 - e^{-kn/m})^k`` and are removed by the real join that follows.

Hashing is the repo's deterministic md5 bucket (same as
operators/sampling.py) so a DuckDB oracle can recompute every bit
position — the filter's exact false-positive set is itself under the
correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators.sampling import hash_bucket, hash_bucket_sql

BLOOM_BITS = 1 << 17  # m: 131072 bits ≈ 16 KiB — broadcast-trivial
BLOOM_HASHES = 3  # k


def _positions(key: Column, m_bits: int, seed: str, k: int) -> list[Column]:
    return [hash_bucket(key, f"{seed}#{i}", m_bits) for i in range(k)]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_BITS,
    seed: str = "bloom",
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Set-bit positions of the filter over the build side's keys: one
    ``bit`` int column, DISTINCT, ≤ m_bits rows. One small shuffle on
    the bit value (cardinality m, never data-scale)."""
    pos = _positions(F.col(key_col), m_bits, seed, k)
    return keys.select(F.explode(F.array(*pos)).alias("bit")).distinct()


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bits: DataFrame,
    m_bits: int = BLOOM_BITS,
    seed: str = "bloom",
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Probe rows that pass the filter: ``k`` broadcast left-semi
    joins, one per hash position — the probe side never shuffles and
    never explodes. Seed/m/k MUST match the build call."""
    out = probe
    for i, p in enumerate(_positions(F.col(key_col), m_bits, seed, k)):
        out = out.withColumn(f"__b{i}", p).join(
            F.broadcast(bits), F.col(f"__b{i}") == F.col("bit"), "left_semi"
        )
    return out.drop(*[f"__b{i}" for i in range(k)])


def bloom_positions_sql(key_expr: str, m_bits: int = BLOOM_BITS, seed: str = "bloom", k: int = BLOOM_HASHES) -> list[str]:
    """DuckDB twins of the k bit-position expressions."""
    return [hash_bucket_sql(key_expr, f"{seed}#{i}", m_bits) for i in range(k)]
