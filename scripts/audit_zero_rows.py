"""Vacuity census across ALL scale factors: zero rows AND all-NULL columns.

A hash oracle over a degenerate result proves nothing. Two classes:

* **Zero rows** (VERDICT r08 task 5): the r08 census (driver sf0.01) caught
  basket_rules and wealthy_inactive_customers, whose thresholds matched zero
  rows at EVERY SF; the r09 3-SF sweep caught three scale-dependent ones
  (important_parts, part_link_prediction, dominant_shippers).
* **All-NULL columns** (VERDICT r09 task 2): two engines agreeing on a
  column that is entirely NULL at some SF proves nothing about that
  column's expression — the same argument as the empty-frame lesson, one
  column at a time. This sweep flags any output column with zero non-null
  values at any SF.

Both checks ride ONE aggregate job per entry per SF:
``count(1), count(col) for every output column`` — rows==0 is the zero-row
hit; rows>0 with count(col)==0 is the all-NULL hit.

Exits non-zero listing the vacuous/erroring entries; wired into the suite
by tests/test_zero_row_census.py next to the partitioning-stability gate
(its own 32-cpu subprocess session — cpus=32 is passed explicitly so the
budget numbers in SCALING rule 46 reproduce regardless of the host default).

Usage:
    python scripts/audit_zero_rows.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)

#: Output columns that are LEGITIMATELY all-NULL at some SF, each with a
#: written justification (the census otherwise fails). Keys are either
#: "entry.column" (allowed at every SF) or "entry.column@sfX" (one SF).
#: Empty today — any future addition needs the same scrutiny the zero-row
#: re-plants got (a principled input/threshold change beats an allow-list).
ALLOWED_NULL: dict[str, str] = {}


def main() -> int:
    sf_dirs = sys.argv[1:] or list(DEFAULT_SFS)
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("audit-zero-rows", cpus=32)
    empty: list[str] = []
    all_null: list[str] = []
    errors: list[str] = []
    for sf_dir in sf_dirs:
        sf_tag = os.path.basename(sf_dir.rstrip("/"))
        t0 = time.perf_counter()
        for name, (fn, _sql) in CATALOG.items():
            try:
                df = fn(spark, sf_dir)
                cols = df.columns
                counts = df.select(
                    F.count(F.lit(1)).alias("__rows"),
                    *[F.count(df[c]).alias(f"c{i}") for i, c in enumerate(cols)],
                ).collect()[0]
                if counts["__rows"] == 0:
                    empty.append(f"{name}@{sf_tag}")
                    print(f"[EMPTY] {name} @ {sf_dir}")
                    continue
                for i, c in enumerate(cols):
                    if counts[f"c{i}"] == 0:
                        key = f"{name}.{c}"
                        if key in ALLOWED_NULL or f"{key}@{sf_tag}" in ALLOWED_NULL:
                            continue
                        all_null.append(f"{key}@{sf_tag}")
                        print(f"[ALLNULL] {name}.{c} @ {sf_dir}")
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}@{sf_tag}")
                print(f"[ERR] {name} @ {sf_dir}: {e}")
        print(f"-- {sf_dir}: {time.perf_counter() - t0:.1f}s")
    print(f"EMPTY: {sorted(empty)}")
    print(f"ALLNULL: {sorted(all_null)}")
    print(f"ERRORS: {sorted(errors)}")
    return 1 if (empty or all_null or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
