"""Bucketed-table co-located joins (sources/maintenance.py::
write_bucketed): the 100 TB fact-to-fact join story, pinned at the plan
level — same-bucketed tables must join with ZERO Exchange nodes, and the
result must equal the plain shuffle join."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.sources.maintenance import write_bucketed
from vectordb_bioinsight_spark.sources.readers import load_table


def _fmt(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_zero_exchanges_and_matches_shuffle_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    od = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "t_li_b", ["l_orderkey"], 8)
    write_bucketed(od, "t_od_b", ["l_orderkey"], 8)
    a = spark.table("t_li_b")
    b = spark.table("t_od_b")
    joined = a.join(b, "l_orderkey").groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    )
    plan = _fmt(spark, joined)
    # the join itself must be exchange-free; the only allowed exchange is
    # the final groupBy's — but groupBy key == bucket key, so even that
    # one is elided: assert ZERO total
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_ex == 0, plan[:2000]

    shuffle = li.join(od, "l_orderkey").groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, shuffle.collect())
    )


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark):
    """Different bucket counts cannot co-locate — the plan must show the
    exchange coming back (the pin that catches silent layout drift)."""
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "t_li_b8", ["l_orderkey"], 8)
    write_bucketed(od, "t_od_b4", ["l_orderkey"], 4)
    joined = (
        spark.table("t_li_b8")
        .hint("merge")  # force SMJ so broadcast can't hide the shuffle
        .join(spark.table("t_od_b4"), "l_orderkey")
    )
    plan = _fmt(spark, joined)
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) >= 1
