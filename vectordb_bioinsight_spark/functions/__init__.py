"""Scalar kernel library — SURVEY.md §2.8 and §4.3(5)."""

from vectordb_bioinsight_spark.functions.hashing import portable_hash64, PORTABLE_HASH64_DUCKDB  # noqa: F401
from vectordb_bioinsight_spark.functions.vector import cosine_similarity, dot_product, l2_distance, l2_norm  # noqa: F401
from vectordb_bioinsight_spark.functions.text import tokenize, STOPWORDS  # noqa: F401
