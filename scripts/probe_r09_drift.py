#!/usr/bin/env python
"""Re-probe of the four same-direction r08 bench drifts (VERDICT r08
task 4): quality_classifier 1.18->1.73 s, funnel_conversion 0.40->0.57 s,
keyword_topn 0.35->0.47 s, minhash_signatures 1.19->1.53 s between
BENCH_LOCAL_r07b and BENCH_LOCAL_r08 — none of their kernels changed in
the r08 diff, so either something environmental shifted or a shared-suite
interaction (e.g. the five new Arrow kernels) slowed untouched plans.

Protocol: each query at sf0.1, noop sink, 1 warm + 5 timed runs,
median-of-5, run STANDALONE (fresh ordering, no preceding suite) — if the
standalone medians land back at the r07b figures, the r08 artifact was
the documented rule-37 steal-spike/noise class; if they reproduce the
slow figures, there is a real plan or codegen change to chase.

    python scripts/probe_r09_drift.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

DRIFTED = {
    # name -> (r07b s, r08 s) from BENCH_LOCAL_r07b/r08.json
    "quality_classifier": (1.184, 1.728),
    "funnel_conversion": (0.399, 0.570),
    "keyword_topn": (0.352, 0.471),
    "minhash_signatures": (1.190, 1.525),
}


def main() -> int:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("probe-r09-drift")
    print(f"sf_dir={SF_DIR} runs=5 (median), 1 warm discarded")
    for name, (r07b, r08) in DRIFTED.items():
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
            "NOISE (back at r07b)" if med <= r07b * 1.15
            else "REPRODUCED (investigate)" if med >= r08 * 0.85
            else "BETWEEN"
        )
        print(
            f"{name:24s} r07b={r07b:.3f} r08={r08:.3f} now={med:.3f} "
            f"(runs {['%.3f' % r for r in runs]}) -> {verdict}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
