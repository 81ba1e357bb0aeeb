"""Local replica of the driver's correctness gate.

Runs each catalog query on Spark AND its oracle SQL on DuckDB over the same
parquet tables, then compares row count, schema shape, and values
(order-insensitive, columns sorted by name — mirroring the driver's
sort-columns-then-hash discipline). Used by tests/test_oracle_parity.py and
runnable as a CLI:

    python -m vectordb_bioinsight_spark.plans.verify /root/testdata/sf0.001 [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

from vectordb_bioinsight_spark.sources.readers import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df
    # stringify to sort rows with mixed/NaN values deterministically
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a) if a is not None else math.nan, float(b) if b is not None else math.nan
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else []
        b = list(b) if b is not None else []
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def _dtype_kind_drift(sp: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Detect int-vs-float dtype drift between the Spark and oracle frames.

    The driver's correctness gate stringifies values before hashing, so a
    value-identical column that is int64 on one side and float64 on the
    other renders ``"0"`` vs ``"0.0"`` and hash-mismatches even though the
    tolerant ``isclose`` compare below passes. This is exactly how the r08
    ``gene_id_format`` row shipped red (DuckDB ``sum`` over ints returns
    HUGEINT, which pandas renders float64, against Spark's bigint). Flag
    the class locally so it can never reach the driver again.
    """
    problems: list[str] = []
    for col in sp.columns:
        ks, ko = sp[col].dtype.kind, oracle_df[col].dtype.kind
        grp = lambda k: "i" if k in "iu" else k  # noqa: E731
        if {grp(ks), grp(ko)} == {"i", "f"}:
            problems.append(
                f"dtype drift col={col}: spark={sp[col].dtype} oracle={oracle_df[col].dtype}"
                " (int-vs-float stringifies differently under the driver hash;"
                " cast the SQL twin, e.g. ::BIGINT / ::DOUBLE, to match)"
            )
    return problems


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(oracle_df)}")
        return problems
    problems.extend(_dtype_kind_drift(sp, oracle_df))
    a, b = _canonicalize(sp), _canonicalize(oracle_df)
    n_bad = 0
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x = None if (isinstance(x, float) and pd.isna(x)) else x
            y = None if (isinstance(y, float) and pd.isna(y)) else y
            if not _values_equal(x, y):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}")
    if n_bad > 5:
        problems.append(f"... {n_bad} total mismatching cells")
    return problems


def verify_catalog(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG

    con = duckdb_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name, (fn, sql) in CATALOG.items():
        if names and name not in names:
            continue
        if sql is None:
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"oracle SQL failed: {e}"]
            continue
        try:
            results[name] = compare(fn(spark, sf_dir), oracle)
        except Exception as e:  # noqa: BLE001
            results[name] = [f"spark query failed: {e}"]
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("verify")
    results = verify_catalog(spark, sf_dir, names)
    failed = 0
    for name, problems in sorted(results.items()):
        status = "OK" if not problems else "FAIL"
        if problems:
            failed += 1
        print(f"[{status}] {name}")
        for p in problems:
            print(f"       {p}")
    print(f"{len(results) - failed}/{len(results)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
