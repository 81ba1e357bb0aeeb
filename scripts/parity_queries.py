#!/usr/bin/env python
"""Per-query DuckDB-oracle parity at one or more SF dirs — the focused
re-verification step after touching an operator (full-suite parity lives in
tests/test_oracle_parity.py; this runs just the named queries so a round's
touched set can be re-proven at sf0.001 AND sf0.01 AND sf0.1 quickly).

    python scripts/parity_queries.py q1 q2 ... [--sf ...dir ...dir]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    args = sys.argv[1:]
    sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1:]
        args = args[:i]
    names = args
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.plans.verify import compare, duckdb_connection
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("parity", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    rc = 0
    for sf_dir in sfs:
        con = duckdb_connection(sf_dir)
        for name in names:
            fn, sql = CATALOG[name]
            if sql is None:
                print(f"{sf_dir}\t{name}\tNO_ORACLE")
                continue
            oracle = con.execute(sql).fetchdf()
            problems = compare(fn(spark, sf_dir), oracle)
            status = "OK" if not problems else f"FAIL {problems[:2]}"
            if problems:
                rc = 1
            print(f"{sf_dir}\t{name}\t{status}", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
