#!/usr/bin/env python
"""Supplementary larger-SF bench artifact runner (VERDICT r10 item 3).

Same protocol as bench.py — the HEADLINE list, median-of-3 warm timings,
noop sink, job descriptions — but per-query failures are RECORDED instead
of aborting the run: at 10x the bench SF some queries legitimately cross a
designed route boundary (e.g. doublet_scores' knn_join_gemm max_queries
guard — the documented scale path there is ann="ivf"), and the artifact
must say so rather than silently lose the 46 queries after the first trip.

bench.py itself is unchanged: this runner exists only to produce the
committed BENCH_LOCAL_r11_sf1a.json evidence point; the driver's bench
contract is untouched.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python scripts/bench_local_sfx.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import importlib.util  # noqa: E402

spec = importlib.util.spec_from_file_location("bench_mod", os.path.join(_REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from vectordb_bioinsight_spark.plans.catalog import CATALOG  # noqa: E402
from vectordb_bioinsight_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata_amp/sf1a")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = 3
    spark = get_session("bench-sfx", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup the main bench does: touch a dimension table
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    queries: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in bench.HEADLINE:
        fn = CATALOG[name][0]
        spark.sparkContext.setJobDescription(f"sfx:{name}")
        try:
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            queries[name] = round(ts[len(ts) // 2], 3)
        except Exception as e:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {queries.get(name, 'ERR')}", file=sys.stderr, flush=True)

    out = {
        "metric": "headline_suite_total_sfx",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "errors": errors,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "timing_protocol": "median_of_3",
        "n_ok": len(queries),
        "n_err": len(errors),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
