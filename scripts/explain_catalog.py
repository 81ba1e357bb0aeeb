#!/usr/bin/env python
"""Dump the formatted physical plan of catalog entries — the plan-audit
loop's inspection tool (pair with tests/test_plans.py's pinned assertions).

Usage:
    python scripts/explain_catalog.py q1 [q2 ...]        # named entries
    python scripts/explain_catalog.py --grep Exchange    # scan ALL entries,
                                                         # print only those
                                                         # whose plan matches
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    args = sys.argv[1:]
    spark = get_session("explain-catalog", cpus=8)

    def plan_of(name: str) -> str:
        df = CATALOG[name][0](spark, SF_DIR)
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    if args and args[0] == "--grep":
        needle = args[1]
        for name in sorted(CATALOG):
            try:
                p = plan_of(name)
            except Exception as e:  # noqa: BLE001 — survey tool, keep going
                print(f"== {name}: ERROR {e}")
                continue
            if needle in p:
                print(f"== {name}: matches {needle!r}")
        return

    for name in args or []:
        print(f"===== {name} =====")
        print(plan_of(name))
    if not args:
        print(f"{len(CATALOG)} entries; pass names or --grep <needle>")
    spark.stop()


if __name__ == "__main__":
    main()
