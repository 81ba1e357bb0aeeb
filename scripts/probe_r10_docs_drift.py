#!/usr/bin/env python
"""Standalone re-probe of the five BENCH_LOCAL_r10 docs-tier drifts
(SCALING rule 37 r10 coda): landmark/related/citation_network/explain/
paper_outcomes_docs moved 1.35-1.39x vs r09 in the suite artifact while
their per-query host telemetry showed idle 90-96% and steal ~0 — host
ruled out by the artifact, leaving suite context vs kernel. None of
their kernels changed in the r10 diff.

Protocol = probe_r09_drift template: pinned catalog shape at sf0.1, noop
sink, 1 warm + 5 timed, median-of-5, STANDALONE. Result of record
(2026-08-17): all five at or below their r09 figures (0.254 / 0.300 /
0.392 / 0.291 / 0.548 s) — suite-context subclass, no action.

    python scripts/probe_r10_docs_drift.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

#: name -> (r09 local median, r10 artifact median)
DRIFTED = {
    "landmark_docs": (0.31, 0.418),
    "related_docs": (0.34, 0.468),
    "citation_network_docs": (0.43, 0.579),
    "explain_docs": (0.61, 0.847),
    "paper_outcomes_docs": (1.02, 1.38),
}


def main() -> int:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("probe-r10-docs-drift", cpus=32)
    for name, (r09, r10) in DRIFTED.items():
        fn, _sql = CATALOG[name]
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()  # warm
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        verdict = (
            "SUITE CONTEXT (<= r09)" if med <= r09 * 1.10
            else "REPRODUCED (investigate)" if med >= r10 * 0.9
            else "BETWEEN"
        )
        print(
            f"{name:24s} r09={r09:.2f} r10={r10:.2f} standalone={med:.3f} "
            f"(runs {['%.2f' % r for r in runs]}) -> {verdict}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
