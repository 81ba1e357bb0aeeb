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


def test_dtype_kind_drift_detected():
    """VERDICT r08 task 2b: an int column facing a float column passes the
    tolerant isclose value compare (0 == 0.0) but stringifies differently
    under the driver's strict hasher ("0" vs "0.0") — compare() must fail
    it locally. Same-kind pairs (int32 vs int64, float32 vs float64) and
    genuinely-float pairs stay green."""
    import pandas as pd

    from vectordb_bioinsight_spark.plans.verify import _dtype_kind_drift

    sp = pd.DataFrame({"a": pd.Series([0, 100], dtype="int64"),
                       "b": pd.Series([1.5, 2.5], dtype="float64"),
                       "c": pd.Series([1, 2], dtype="int32")})
    ok = pd.DataFrame({"a": pd.Series([0, 100], dtype="int32"),
                       "b": pd.Series([1.5, 2.5], dtype="float32"),
                       "c": pd.Series([1, 2], dtype="uint64")})
    assert _dtype_kind_drift(sp, ok) == []
    # the gene_id_format failure shape: DuckDB HUGEINT -> pandas float64
    drifted = ok.assign(a=pd.Series([0.0, 100.0], dtype="float64"))
    problems = _dtype_kind_drift(sp, drifted)
    assert len(problems) == 1 and "col=a" in problems[0]
