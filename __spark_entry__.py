"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid-search query (dense cosine kNN +
BM25 subplan -> RRF fusion, SURVEY.md §3.1) on /root/testdata/sf0.001.
``queries()``/``oracle_sql()`` expose the full catalog from
vectordb_bioinsight_spark.plans.catalog — one entry per implemented operator
family from SURVEY.md §2, each hash-matched against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vectordb_bioinsight_spark.plans import catalog as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from vectordb_bioinsight_spark.plans.catalog_vector import q_hybrid_rrf

    return q_hybrid_rrf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return _catalog.oracle_sql()
