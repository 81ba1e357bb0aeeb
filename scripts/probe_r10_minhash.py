#!/usr/bin/env python
"""Close the minhash_signatures local-bench drift on record (VERDICT r09
task 6): quiet-host medians moved 1.19 s (r07b) -> 1.525 s (r08) ->
1.41 s (r09) with NO kernel change in either diff — mild, same-direction
across two quiet artifacts, so it does not fully pattern-match the
rule-37 uniform-noise class and gets its own standalone number.

Protocol = probe_r09_drift template: the pinned catalog shape at sf0.1,
noop sink, 1 warm + 5 timed, median-of-5, run STANDALONE (no preceding
suite). Classification: <= 1.31 s (r07b +10%) = drift was suite/host
context; >= 1.41 s = a real baseline move to record in SCALING rule 37.

    python scripts/probe_r10_minhash.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
HISTORY = {"r07b": 1.190, "r08": 1.525, "r09": 1.410}


def main() -> int:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG
    from vectordb_bioinsight_spark.session import get_session

    spark = get_session("probe-r10-minhash", cpus=32)
    fn, _sql = CATALOG["minhash_signatures"]
    df = fn(spark, SF_DIR)
    df.write.mode("overwrite").format("noop").save()  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    med = statistics.median(runs)
    hist = " ".join(f"{k}={v:.3f}" for k, v in HISTORY.items())
    verdict = (
        "SUITE/HOST CONTEXT (back at r07b)" if med <= HISTORY["r07b"] * 1.10
        else "REAL BASELINE MOVE (record it)" if med >= HISTORY["r09"] * 0.95
        else "BETWEEN (record the band)"
    )
    print(f"minhash_signatures {hist} now={med:.3f} "
          f"(runs {['%.3f' % r for r in runs]}) -> {verdict}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
