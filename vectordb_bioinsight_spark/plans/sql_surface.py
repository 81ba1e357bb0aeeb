"""SQL-facing surface: temp views over the testdata tables + the scalar
kernel library as SQL functions.

The reference exposes everything through Python calls; a Spark engine should
be equally drivable from ``spark.sql``. The kernels are **SQL scalar
functions** (``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``,
Spark 3.5+) — parsed into Catalyst expressions, inlined into whole-stage
codegen, zero Python in the plan (unlike ``spark.udf.register``, which would
put a row-at-a-time Python UDF in every call site).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from vectordb_bioinsight_spark.sources.readers import TESTDATA_TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create a temp view per testdata table (nanos-safe via load_table).
    Returns the view names."""
    import os

    names = []
    for t in TESTDATA_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
            names.append(t)
    return names


#: name -> (signature, return type, body). Bodies are pure SQL expressions —
#: each compiles to the same Catalyst tree as its DataFrame twin in
#: functions/ (cosine via higher-order aggregate/zip_with, clamp via
#: least/greatest, RRF from config.py:157-158 / vector_store.py:318).
SQL_KERNELS: dict[str, tuple[str, str, str]] = {
    "log2p1": ("x DOUBLE", "DOUBLE", "log2(x + 1.0d)"),
    "clamp": ("x DOUBLE, lo DOUBLE, hi DOUBLE", "DOUBLE", "least(greatest(x, lo), hi)"),
    "rrf_contrib": ("rank BIGINT, w DOUBLE, k INT", "DOUBLE", "w / (k + rank)"),
    "dot_product": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)",
    ),
    "l2_norm": (
        "a ARRAY<DOUBLE>",
        "DOUBLE",
        "sqrt(aggregate(a, 0.0d, (acc, v) -> acc + v * v))",
    ),
    "cosine_sim": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "nullif(aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"
        " / nullif(sqrt(aggregate(a, 0.0d, (acc, v) -> acc + v * v))"
        " * sqrt(aggregate(b, 0.0d, (acc, v) -> acc + v * v)), 0.0d), double('nan'))",
    ),
    "log2fc": (
        "mean_a DOUBLE, mean_b DOUBLE",
        "DOUBLE",
        "log2((mean_a + 1.0d) / (mean_b + 1.0d))",
    ),
}


def register_sql_kernels(spark: SparkSession) -> list[str]:
    """Install the kernel library as SQL scalar functions. Idempotent
    (CREATE OR REPLACE). Returns the function names."""
    for name, (sig, ret, body) in SQL_KERNELS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) RETURNS {ret} RETURN {body}"
        )
    return list(SQL_KERNELS)
