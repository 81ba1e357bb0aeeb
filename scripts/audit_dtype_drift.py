"""Audit every oracle-backed catalog entry for Spark-vs-DuckDB dtype drift.

VERDICT r08 task 2a: the ``gene_id_format`` driver row shipped hash-red
because its DuckDB twin surfaced uncast ``sum(CASE...)`` counters — DuckDB
returns HUGEINT, pandas renders float64, the driver's strict
stringify-and-hash saw ``0.0`` vs Spark's ``0`` on value-identical results.
This script kills the CLASS: it runs every twin and its Spark query at
sf0.001 and reports any column whose pandas dtype kind is int on one side
and float on the other (the only drift the tolerant value compare passes
but the driver hash does not). ``plans.verify.compare`` now carries the
same check inline, so the parity suite also fails on it; this script is the
fast dtype-only sweep for the record.

Usage:
    python scripts/audit_dtype_drift.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_bioinsight_spark.plans.catalog import CATALOG
from vectordb_bioinsight_spark.plans.verify import _dtype_kind_drift, duckdb_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("audit-dtype-drift")
    con = duckdb_connection(sf_dir)
    n_drift = n_err = n_ok = 0
    for name, (fn, sql) in CATALOG.items():
        if sql is None:
            continue
        try:
            oracle = con.execute(sql).fetchdf()
            sp = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            n_err += 1
            print(f"[ERR] {name}: {e}")
            continue
        common = [c for c in sp.columns if c in oracle.columns]
        problems = _dtype_kind_drift(sp[common], oracle[common])
        if problems:
            n_drift += 1
            print(f"[DRIFT] {name}")
            for p in problems:
                print(f"        {p}")
        else:
            n_ok += 1
    print(f"\n{n_ok} clean, {n_drift} drifting, {n_err} errored at {sf_dir}")
    return 1 if (n_drift or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
