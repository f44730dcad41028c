"""Every registered query with an oracle must match DuckDB at the test
scale factor — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from nyc_taxi_data_engineering_spark.queries import registry
from tools.oracle_check import compare

_REG = registry()


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
