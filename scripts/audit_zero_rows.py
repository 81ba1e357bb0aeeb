"""Zero-row vacuity census across ALL scale factors (VERDICT r08 task 5).

A hash oracle over an empty result proves nothing: the r08 census (run at
the driver's sf0.01) caught two entries — basket_rules and
wealthy_inactive_customers — whose thresholds matched zero rows at EVERY
SF, so every prior green driver row was vacuous. This script makes the
failure mode unregressable at all three SFs: every catalog entry must
return at least one row at sf0.001, sf0.01 AND sf0.1 (``isEmpty`` — one
limit-1 job per entry, not a full materialization).

Exits non-zero listing the vacuous/erroring entries; wired into the suite
by tests/test_zero_row_census.py next to the partitioning-stability gate.

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


def main() -> int:
    sf_dirs = sys.argv[1:] or list(DEFAULT_SFS)
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("audit-zero-rows")
    empty: list[str] = []
    errors: list[str] = []
    for sf_dir in sf_dirs:
        t0 = time.perf_counter()
        for name, (fn, _sql) in CATALOG.items():
            try:
                if fn(spark, sf_dir).isEmpty():
                    empty.append(f"{name}@{os.path.basename(sf_dir)}")
                    print(f"[EMPTY] {name} @ {sf_dir}")
            except Exception as e:  # noqa: BLE001
                errors.append(f"{name}@{os.path.basename(sf_dir)}")
                print(f"[ERR] {name} @ {sf_dir}: {e}")
        print(f"-- {sf_dir}: {time.perf_counter() - t0:.1f}s")
    print(f"EMPTY: {sorted(empty)}")
    print(f"ERRORS: {sorted(errors)}")
    return 1 if (empty or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
