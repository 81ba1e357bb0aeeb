#!/usr/bin/env python
"""The 10x robustness sweep (SCALING.md rule 13): execute EVERY catalog
query end-to-end (noop sink) at a scale factor above the correctness gate.

Parity at sf0.001/sf0.01 proves semantics; this sweep catches complexity
bugs that only surface with bigger rows/corpora (e.g. the winnowing
quadratic re-evaluation, found exactly this way).

    python scripts/sweep_catalog.py [sf_dir] [query ...]   # default /root/testdata/sf0.1, all queries

Prints one line per query (name<TAB>seconds | FAILED<TAB>error) and exits
non-zero if any query fails.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    failed = 0
    for name, (fn, _sql) in sorted(CATALOG.items()):
        if only and name not in only:
            continue
        t = time.time()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            print(f"{name}\t{round(time.time() - t, 1)}", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failed += 1
            print(f"{name}\tFAILED\t{str(exc)[:200]}", flush=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
