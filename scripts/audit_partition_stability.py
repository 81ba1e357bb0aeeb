#!/usr/bin/env python
"""Partitioning-stability audit (SCALING rule 44's empirical check):
run EVERY catalog query under two different shuffle-partition settings
and compare the value-hash of each query's own output across the runs.
A mismatch means the query's result depends on FP accumulation order —
the flake class that hit shap_gene_stats_dims and seasonal_decompose —
independent of any DuckDB comparison.

    python scripts/audit_partition_stability.py [sf_dir]

Exits non-zero and lists the unstable queries if any differ.
r07 result at sf0.001 (settings 5/8cpu vs 29/16cpu): UNSTABLE: [] over
all 304 entries, after the rule-44 replants.

Since r08 this is a GATE, not a script: tests/test_partition_stability.py
runs it (subprocess — the audit needs its own SparkSessions) as part of
the default suite, so the flake guard fires every round by construction.
"""

from __future__ import annotations

import hashlib
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def run_all(sf_dir: str, parts: int, cpus: int) -> dict[str, str]:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session(f"aud{parts}", cpus=cpus)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, str] = {}
    for name, (fn, _sql) in CATALOG.items():
        try:
            df = fn(spark, sf_dir).toPandas()
            df = df.reindex(sorted(df.columns), axis=1)
            if len(df) == 0:
                # agg(axis=1) on a 0-row frame returns a DataFrame (not a
                # Series) and sort_values() then needs 'by' — hash empty
                # results as the column list so an empty-vs-empty compare
                # still checks the schema
                key = "|".join(df.columns)
            else:
                key = (
                    df.astype(str)
                    .agg("|".join, axis=1)
                    .sort_values()
                    .str.cat(sep="\n")
                )
            out[name] = hashlib.md5(key.encode()).hexdigest()
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR:{str(e)[:80]}"
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    a = run_all(sf_dir, parts=5, cpus=8)
    b = run_all(sf_dir, parts=29, cpus=16)
    unstable = sorted(n for n in a if a[n] != b.get(n))
    # an entry that CRASHES under both settings hashes equal ("ERR:...")
    # and would otherwise slip past the stability check — fail it
    # explicitly (it is the only execution gate the two rows-only park
    # entries get, since test_oracle_parity skips sql=None entries)
    errors = sorted(
        n for n in set(a) | set(b)
        if str(a.get(n, "")).startswith("ERR:") or str(b.get(n, "")).startswith("ERR:")
    )
    print(f"checked: {len(a)}")
    print(f"UNSTABLE: {unstable}")
    print(f"ERRORS: {errors}")
    return 1 if (unstable or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
