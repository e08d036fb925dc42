"""Oracle-checked tests for the relational query registry (SURVEY §2.2-2.8).

Each test mirrors the driver's t2 gate: Spark result vs DuckDB oracle on
sf0.01, order-insensitive, exact values.
"""

from __future__ import annotations

import pytest

from etl_project_gcp_spark import queries as Q
from tests.oracle import compare

ORACLE_CHECKED = sorted(Q.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, sf01_dir, name):
    fn = Q.queries()[name]
    sql = Q.oracle_sql()[name]
    compare(fn(spark, sf01_dir), sql, sf01_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_sales" in df.columns


def test_registry_names_consistent():
    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0
