#!/usr/bin/env python
"""Scale probe: funnel + cohort retention at 1M events (VERDICT r04 task 7).

Two replication axes, because the two operators stress differently:

* WIDE (user_id * rep + r): more users, per-user history unchanged — the
  default shape for both ops; every shuffle stays user-keyed and the
  per-user state (the funnel's collected event set, the retention
  (user, week) pairs) is constant-sized.
* DEEP (same users, ts shifted by rep days): per-user history multiplies —
  the hostile axis for the funnel's fold (collect_set array grows with
  history) and for retention's distinct-(user, week) projection.

Usage: python scripts/probe_funnel_retention.py [replication]
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
    spark = get_session("probe-funnel-retention", cpus=32)

    from vectordb_bioinsight_spark.operators.trends import (
        cohort_retention,
        funnel_conversion,
    )

    ev = load_table(spark, SF_DIR, "events")
    n0 = ev.count()
    reps = spark.range(rep).select(F.col("id").alias("_r"))

    wide = (
        ev.crossJoin(reps)
        .select(
            (F.col("user_id") * rep + F.col("_r")).alias("user_id"),
            "event_type", "ts", "value",
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"events (wide): {n0} x {rep} = {wide.count()}")
    timed(
        "funnel_conversion wide (3 steps)",
        funnel_conversion(wide, "user_id", "event_type", "ts",
                          ["signup", "view", "purchase"]),
    )
    timed("cohort_retention wide", cohort_retention(wide, "user_id", "ts"))

    deep = (
        ev.crossJoin(reps)
        .select(
            "user_id", "event_type",
            (F.col("ts") + F.make_interval(days=F.col("_r").cast("int"))).alias("ts"),
            "value",
        )
        .repartition(64)
        .localCheckpoint()
    )
    per_user = deep.count() // deep.select("user_id").distinct().count()
    print(f"events (deep): {deep.count()} rows, ~{per_user} events/user")
    timed(
        "funnel_conversion deep (3 steps)",
        funnel_conversion(deep, "user_id", "event_type", "ts",
                          ["signup", "view", "purchase"]),
    )
    timed("cohort_retention deep", cohort_retention(deep, "user_id", "ts"))


if __name__ == "__main__":
    main()
