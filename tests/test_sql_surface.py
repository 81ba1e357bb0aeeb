"""SQL surface: kernels as SQL scalar functions (JVM expressions, no Python
in the plan) + pure-SQL query parity with the DataFrame catalog."""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL


def test_sql_kernels_values(spark):
    from vectordb_bioinsight_spark.plans.sql_surface import register_sql_kernels

    register_sql_kernels(spark)
    row = spark.sql(
        """
        SELECT log2p1(3.0d) AS a,
               clamp(5.0d, 0.0d, 1.0d) AS b,
               rrf_contrib(1L, 0.6d, 60) AS c,
               dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
               l2_norm(array(3.0d, 4.0d)) AS e,
               cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS f,
               cosine_sim(array(1.0d, 0.0d), array(0.0d, 0.0d)) AS g,
               log2fc(3.0d, 1.0d) AS h
        """
    ).collect()[0]
    assert math.isclose(row["a"], 2.0)
    assert row["b"] == 1.0
    assert math.isclose(row["c"], 0.6 / 61)
    assert row["d"] == 11.0 and row["e"] == 5.0
    assert math.isclose(row["f"], 1.0)
    assert row["g"] is None  # zero-norm → NULL, not NaN/error
    assert math.isclose(row["h"], 1.0)


def test_sql_kernels_stay_jvm_side(spark):
    """The registered kernels must inline as Catalyst expressions — no
    BatchEvalPython/ArrowEvalPython in a plan that uses them."""
    from vectordb_bioinsight_spark.plans.sql_surface import (
        register_sql_kernels,
        register_tables,
    )

    register_sql_kernels(spark)
    register_tables(spark, SF_SMALL)
    plan = (
        spark.sql(
            "SELECT vec_id, cosine_sim(cast(embedding AS ARRAY<DOUBLE>),"
            " cast(embedding AS ARRAY<DOUBLE>)) AS s FROM embeddings"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pure_sql_query_matches_dataframe_catalog(spark):
    """A catalog query re-expressed in pure spark.sql over the registered
    views returns identical rows (the engine is fully SQL-drivable)."""
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.plans.sql_surface import register_tables

    register_tables(spark, SF_SMALL)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= timestamp('1998-09-02')
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = (
        CATALOG["pricing_summary"][0](spark, SF_SMALL)
        .selectExpr("l_returnflag", "l_linestatus", "sum_qty", "avg_qty", "count_order")
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]
