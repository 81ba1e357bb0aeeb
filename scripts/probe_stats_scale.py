#!/usr/bin/env python
"""Scale probe: the r05 statistics tier at 1M events (SCALING.md rows).

CUSUM/Holt are per-key folds over calendar-bounded series — their cost is
the daily groupBy, not the recursion; the bootstrap is 50 conditional
sums in one scan-local agg; rolling actives is one day-sketch groupBy +
a day-cardinality union window; RFM is three range-partition ranks.

Usage: python scripts/probe_stats_scale.py [replication]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.session import get_session
from vectordb_bioinsight_spark.sources.readers import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label: str, df) -> None:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"{label}\t{time.perf_counter() - t0:.1f}s")


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_session("probe-stats-scale", cpus=32)

    ev = load_table(spark, SF_DIR, "events")
    big = (
        ev.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select(
            (F.col("user_id") * rep + F.col("_r")).alias("user_id"),
            "event_type", "ts", "value",
            (F.col("event_id") * rep + F.col("_r")).alias("event_id"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"events: {big.count()}")

    from vectordb_bioinsight_spark.operators.stats import (
        ab_test_summary,
        bootstrap_rate_ci,
        cusum_changepoints,
    )
    from vectordb_bioinsight_spark.operators.trends import (
        holt_linear,
        rfm_scores,
        rolling_active_users,
    )

    timed("cusum_changepoints (1M events)",
          cusum_changepoints(big, "event_type", "ts", "value"))
    timed("holt_linear (1M events)", holt_linear(big, "event_type", "ts", "value"))
    timed("rolling_active_users (1M events)",
          rolling_active_users(big, "user_id", "ts", window_days=7))
    timed("rfm_scores (15k users)", rfm_scores(big, "user_id", "ts", "value"))

    users = big.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    timed("bootstrap_rate_ci (15k users, 50 reps)",
          bootstrap_rate_ci(users, "conv", "user_id"))
    armed = users.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"), "conv"
    )
    timed("ab_test_summary", ab_test_summary(armed, "arm", "conv"))


if __name__ == "__main__":
    main()
