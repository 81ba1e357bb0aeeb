"""Portable 64-bit hashing.

The engine needs hashes that are (a) stable across Spark versions, (b)
reproducible by external oracles (DuckDB / Python hashlib) so that dedup,
MinHash-LSH and fingerprint operators are hash-for-hash checkable. Spark's
``xxhash64``/``hash`` have no DuckDB twin, so we derive a 60-bit integer from
the first 15 hex chars of md5 — identical bytes hash identically everywhere.

Reference analog: chunk-id hashing ``hash(title) % 100000``
(backend/app/api/routes/graph.py:308) — upgraded to a collision-resistant,
engine-portable form.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB expression template computing the same value as portable_hash64.
#: Format with the source SQL expression, e.g.
#: ``PORTABLE_HASH64_DUCKDB.format(expr="text")``.
PORTABLE_HASH64_DUCKDB = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def portable_hash64(col: Column | str) -> Column:
    """60-bit integer hash of a string column, reproducible in DuckDB/Python.

    Spark: ``conv(substr(md5(x),1,15),16,10)`` — md5 of UTF-8 bytes, first 15
    hex nibbles as a base-16 number (< 2^60, so it always fits a signed long).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def salted_hash64(col: Column | str, salt: int) -> Column:
    """Salted variant used as the i-th MinHash permutation h_i(x) = H(i||x)."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash64(F.concat(F.lit(f"{salt}|"), c))


def salted_hash64_duckdb(expr: str, salt: int) -> str:
    """DuckDB SQL computing the same value as :func:`salted_hash64`."""
    return PORTABLE_HASH64_DUCKDB.format(expr=f"'{salt}|' || {expr}")
