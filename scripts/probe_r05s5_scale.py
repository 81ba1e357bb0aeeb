#!/usr/bin/env python
"""Scale probe: the r05 session-5 tier at 1M rows — RAKE keyphrases,
session paths, OLS trend + Holt backtest, WOE/IV, DP release aggregates,
compaction planning.

Usage: python scripts/probe_r05s5_scale.py
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
    spark = get_session("probe-r05s5", cpus=32)

    # 1M events (replicated users so per-user state stays realistic)
    ev = load_table(spark, SF_DIR, "events")
    rep = max(1, 1_000_000 // ev.count())
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

    from vectordb_bioinsight_spark.operators.encoding import woe_iv
    from vectordb_bioinsight_spark.operators.packing import next_fit_bins
    from vectordb_bioinsight_spark.operators.privacy import dp_counts, dp_sum
    from vectordb_bioinsight_spark.operators.trends import (
        daily_ols_trend,
        holt_backtest,
        session_paths,
    )

    timed("session_paths_1m", session_paths(big, "user_id", "ts", "event_type", "event_id"))
    timed("daily_ols_1m", daily_ols_trend(big, "event_type", "ts", "value"))
    timed("holt_backtest_1m", holt_backtest(big, "event_type", "ts", "value"))
    binned = big.select(
        F.floor(F.col("value") / 50.0).cast("int").alias("b"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    timed("woe_iv_1m", woe_iv(binned, "b", "y"))
    timed("dp_counts_1m", dp_counts(big, ["event_type"], epsilon=1.0))
    timed("dp_sum_1m", dp_sum(big, ["event_type"], "value", clip=400.0))
    files = big.groupBy("event_type", F.to_date("ts").alias("day"), (F.col("user_id") % 200).alias("part")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    timed("next_fit_bins_1m_files", next_fit_bins(files, ["event_type", "part"], "day", "n_rows", 500.0))

    # RAKE at 1M docs
    from vectordb_bioinsight_spark.operators.text_analysis import rake_keyphrases

    docs = load_table(spark, SF_DIR, "documents")
    drep = max(1, 1_000_000 // docs.count())
    bigd = (
        docs.crossJoin(spark.range(drep).select(F.col("id").alias("_r")))
        .select((F.col("doc_id") * drep + F.col("_r")).alias("doc_id"), "text")
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {bigd.count()}")
    timed("rake_1m_docs", rake_keyphrases(bigd, "doc_id", "text"))

    # --- graph + sketch tier on the sf0.1 co-purchase graph / 1M events ---
    from vectordb_bioinsight_spark.operators.joins import (
        association_rules,
        cooccurrence_edges,
    )
    from vectordb_bioinsight_spark.operators.network import personalized_pagerank
    from vectordb_bioinsight_spark.operators.sketches import kmv_overlap, kmv_shards

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_partkey").alias("part"), F.col("l_orderkey").alias("okey")
    )
    timed("basket_rules_sf01", association_rules(li, "part", "okey", min_cooc=2))
    edges = cooccurrence_edges(li, "part", "okey", min_weight=2).localCheckpoint()
    e2 = edges.withColumnRenamed("item1", "entity1").withColumnRenamed("item2", "entity2")
    seed = edges.agg(F.min(F.least("item1", "item2"))).first()[0]
    # the distributed loop does its work in eager per-round checkpoints,
    # so time construction + action together
    t0 = time.perf_counter()
    personalized_pagerank(e2, [seed], max_iter=6, collect_below=0).write.mode(
        "overwrite"
    ).format("noop").save()
    print(f"ppr_sf01\t{time.perf_counter() - t0:.1f}s")
    big2 = big.withColumn("_g", F.lit("all"))
    ka = kmv_shards(big2.filter(F.col("event_type") == "view"), ["_g"], "user_id")
    kb = kmv_shards(big2.filter(F.col("event_type") == "purchase"), ["_g"], "user_id")
    timed("kmv_overlap_1m", kmv_overlap(ka, kb))

    spark.stop()


if __name__ == "__main__":
    main()
