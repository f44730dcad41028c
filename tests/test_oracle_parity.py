"""Every registered query with an oracle must match DuckDB at the test
scale factor — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from nyc_taxi_data_engineering_spark.queries import registry
from tools.oracle_check import compare

_REG = registry()


def test_rotation_window_is_explicit():
    """The driver samples the FIRST ~50 registry entries; ROTATION pins
    that window. Every rotation name must be registered (a typo would
    silently shrink the sampled window) and the window must lead the
    registry order."""
    from nyc_taxi_data_engineering_spark.queries.registry import ROTATION

    assert len(ROTATION) == len(set(ROTATION))
    unknown = [n for n in ROTATION if n not in _REG]
    assert not unknown, f"rotation names not registered: {unknown}"
    assert list(_REG)[: len(ROTATION)] == ROTATION


@pytest.mark.parametrize("name", sorted(_REG))
def test_oracle_parity(name, spark, sf_dir, duck):
    spec = _REG[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check: it ran
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    errs = compare(spark_pdf, oracle_pdf, name)
    assert not errs, f"{name}: " + "; ".join(errs)
