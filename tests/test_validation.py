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
