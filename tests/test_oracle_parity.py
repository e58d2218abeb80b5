"""Every catalog query with an oracle must match DuckDB exactly (SURVEY §5).

This is the same check the correctness driver runs at sf0.01; locally we run
it at sf0.001 for speed (set ORACLE_SF_DIR to override).
"""

from __future__ import annotations

import pytest

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.plans import (  # noqa: E501
    catalog,
)

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection

ORACLE_QUERIES = sorted(
    name for name, spec in catalog.CATALOG.items() if spec.oracle is not None
)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = catalog.CATALOG[name]
    df = spec.fn(spark, SF_ORACLE)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    for name, spec in catalog.CATALOG.items():
        n = spec.fn(spark, SF_ORACLE).count()
        assert n >= 0, name
