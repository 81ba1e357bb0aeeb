"""The local replica of the driver's correctness gate: every catalog query
must hash-match its DuckDB oracle at sf0.001 (the driver runs the same
comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.plans.catalog import CATALOG
from vectordb_bioinsight_spark.plans.verify import compare, duckdb_connection


@pytest.fixture(scope="module")
def oracle_con():
    return duckdb_connection(SF_SMALL)


@pytest.mark.parametrize("name", [n for n, (_f, sql) in CATALOG.items() if sql is not None])
def test_query_matches_oracle(spark, oracle_con, name):
    fn, sql = CATALOG[name]
    oracle = oracle_con.execute(sql).fetchdf()
    problems = compare(fn(spark, SF_SMALL), oracle)
    assert not problems, f"{name}: {problems[:3]}"
