"""Every registered relational operator must match its DuckDB oracle
exactly (the driver's correctness gate, run here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from filda_spark import relational
from filda_spark import training  # noqa: F401  (registers training-data ops)
from filda_spark.compare import compare, duckdb_con

NAMES = sorted(relational.REGISTRY)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = relational.REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0
        return
    sdf = spec.fn(spark, sf_dir)
    odf = con.sql(spec.oracle).df()
    issues = compare(sdf, odf)
    assert not issues, f"{name}: {issues}"
