"""Power-iteration PCA (operators/pca.py): recovers a planted
dominant direction, returns a unit vector, honors the sign convention."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators.pca import power_iteration_component


def _corpus(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    return df.select("vec_id", F.posexplode("v").alias("pos", "val"))


def test_recovers_planted_direction(spark):
    """Variance is overwhelmingly along dim 2 (1-based); 3 rounds of
    power iteration must align with it almost exactly."""
    rows = [
        (0, [1.0, 10.0, 0.0, 0.25]),
        (1, [2.0, -10.0, 0.5, 0.0]),
        (2, [1.5, 9.0, 0.0, 0.5]),
        (3, [2.5, -9.0, 0.25, 0.0]),
        (4, [1.0, 8.0, 0.5, 0.25]),
        (5, [2.0, -8.0, 0.0, 0.5]),
    ]
    comp = {
        r["dim"]: r["component"]
        for r in power_iteration_component(_corpus(spark, rows)).collect()
    }
    assert set(comp) == {1, 2, 3, 4}
    assert abs(comp[2]) > 0.99
    # unit norm (12-dp rounding leaves plenty of slack)
    assert math.isclose(sum(c * c for c in comp.values()), 1.0, abs_tol=1e-6)
    # sign convention: first dim non-negative
    assert comp[1] >= 0.0


def test_constant_corpus_centers_to_zero_direction_is_start(spark):
    """A constant corpus has zero covariance: u is all-zero, the norm
    is 0 and the divide yields NULL/NaN components — the degenerate
    case must not crash (callers see the NaN, not a wrong vector)."""
    rows = [(i, [3.0, 3.0, 3.0, 3.0]) for i in range(4)]
    out = power_iteration_component(_corpus(spark, rows)).collect()
    assert len(out) == 4  # one row per dim, NaN/NULL components


def test_top2_orthogonal_and_ranked(spark):
    """Two planted directions with variance 100 (dim 2) and 25
    (dim 3): pc1 aligns with the big one, pc2 with the second after
    deflation, and the pair is orthogonal to grid precision."""
    from nyc_taxi_data_engineering_spark.operators.pca import top2_components

    rows = []
    vals = [10.0, -10.0, 9.0, -9.0, 8.0, -8.0]
    for i, a in enumerate(vals):
        # b's sign pattern is chosen orthogonal to a's (+,-,+,-,+,-):
        # sum of sign products is zero, so the planted directions are
        # uncorrelated and deflation must separate them.
        b = 5.0 if i < 4 else -5.0
        rows.append((i, [0.1 * (i % 3), a, b, 0.05 * (i % 2)]))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    x = df.select("vec_id", F.posexplode("v").alias("pos", "val"))
    out = {r["dim"]: (r["pc1"], r["pc2"]) for r in top2_components(x).collect()}
    assert abs(out[2][0]) > 0.95  # pc1 ~ planted dim 2
    assert abs(out[3][1]) > 0.90  # pc2 ~ planted dim 3
    dot = sum(p1 * p2 for p1, p2 in out.values())
    assert abs(dot) < 1e-6
