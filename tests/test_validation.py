"""Data-contract expectations (operators/validation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.validation import (
    fk_violations,
    table_expectations,
)


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "a", 10.0, "ok"),
        (2, None, -5.0, "ok"),     # null key, range violation
        (3, "b", 200.0, "BAD!"),   # range + regex violation
        (3, "a", 50.0, "ok"),      # duplicate id
    ]
    return spark.createDataFrame(rows, "id long, k string, v double, tag string")


def test_ledger_counts(spark, dirty):
    out = {(r["rule"], r["column"]): r for r in table_expectations(
        dirty,
        [
            ("not_null", "k"),
            ("range", "v", 0.0, 100.0),
            ("accepted", "k", ["a", "b"]),
            ("regex", "tag", "^[a-z]+$"),
            ("unique", ["id"]),
        ],
    ).collect()}
    assert out[("not_null", "k")]["n_violations"] == 1
    assert out[("range", "v")]["n_violations"] == 2      # -5 and 200
    assert out[("accepted", "k")]["n_violations"] == 0   # NULL not a violation
    assert out[("accepted", "k")]["passed"] is True
    assert out[("regex", "tag")]["n_violations"] == 1
    assert out[("unique", "id")]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out[("range", "v")]["passed"] is False


def test_unique_rule_ignores_null_keys(spark):
    """ADVICE r05: NULL-keyed rows are not duplicates — a table whose
    non-null keys are unique must pass 'unique' regardless of NULLs."""
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,), (None,)], "id int"
    )
    out = {r["rule"]: r for r in table_expectations(
        df, [("unique", ["id"]), ("not_null", "id")]
    ).collect()}
    assert out["unique"]["n_violations"] == 0 and out["unique"]["passed"] is True
    assert out["not_null"]["n_violations"] == 3       # NULLs surface HERE
    # and real duplicates still count among the non-null keys
    dup = spark.createDataFrame([(1,), (1,), (None,)], "id int")
    out2 = {r["rule"]: r for r in table_expectations(
        dup, [("unique", ["id"])]
    ).collect()}
    assert out2["unique"]["n_violations"] == 1 and out2["unique"]["n_rows"] == 3


def test_single_scan_for_row_rules(spark, dirty):
    """All row rules must share ONE scan — a rule is an expression, not a
    pass."""
    import re

    plan = table_expectations(
        dirty.sparkSession.range(10).withColumn("k", F.lit("a")),
        [("not_null", "k"), ("range", "id", 0, 100), ("accepted", "k", ["a"])],
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert len(re.findall(r"^\(\d+\) Range", plan, re.MULTILINE)) == 1


def test_fk_violations_returns_orphan_rows(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 20)], "rid long, fk int"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk int")
    orphans = fk_violations(fact, "fk", dim, "pk").collect()
    assert [r["rid"] for r in orphans] == [2]  # NULL excluded by contract
