#!/usr/bin/env python
"""Scale probe: the r05 session-4 tier — binary quantization / Hamming
search at 1M vectors, interval-overlap join at ~6M intervals, histogram
shards at 10M rows, link prediction on the sf0.1 part co-purchase graph.

Usage: python scripts/probe_r05s4_scale.py
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


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"{label}\t{dt:.1f}s")
    return dt


def main() -> None:
    spark = get_session("probe-r05s4", cpus=32)

    # --- binary quantization at 1M x 64d -------------------------------
    from vectordb_bioinsight_spark.operators.pq import (
        binary_quantize,
        binary_thresholds,
        hamming_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    rep = max(1, 1_000_000 // emb.count())
    big = (
        emb.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select(
            (F.col("vec_id") * rep + F.col("_r")).alias("vec_id"),
            "embedding",
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"vectors: {big.count()}")
    thresholds = binary_thresholds(big, "embedding").localCheckpoint()
    codes = binary_quantize(big, "vec_id", "embedding", thresholds)
    timed("binq_encode_relational_1m", codes)
    from vectordb_bioinsight_spark.operators.pq import binary_encode_inline

    mu = [r["mu"] for r in thresholds.orderBy("dim").collect()]
    timed(
        "binq_encode_inline_1m",
        binary_encode_inline(big, "vec_id", "embedding", mu),
    )
    codes_mat = codes.select("id", "words").localCheckpoint()
    qw = codes_mat.filter(F.col("id") == 0).select(
        F.posexplode("words").alias("word", "qw")
    )
    timed("hamming_top10_1m", hamming_topk(codes_mat, qw, k=10))

    # --- interval-overlap join at lineitem x sf0.1 ---------------------
    from vectordb_bioinsight_spark.operators.intervals import (
        interval_overlap_join,
        merge_intervals,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")
    ship = F.datediff(F.col("l_shipdate"), epoch).cast("long")
    recv = ship + (F.col("l_quantity").cast("long") % 14)
    iv = li.select(
        F.col("l_suppkey").alias("suppkey"),
        ship.alias("start"),
        recv.alias("end"),
    ).localCheckpoint()
    print(f"intervals: {iv.count()}")
    islands = merge_intervals(iv, ["suppkey"], "start", "end").select(
        "suppkey", "island", "start", "end"
    )
    joined = interval_overlap_join(iv, islands, ["suppkey"], bin_size=32)
    timed(
        "overlap_join_all_intervals",
        joined.groupBy("suppkey", "island_r").agg(
            F.count("*").alias("n"), F.sum("overlap").alias("d")
        ),
    )

    # --- histogram shards at 10M rows ----------------------------------
    from vectordb_bioinsight_spark.operators.sketches import (
        hist_quantiles,
        hist_shards,
        merge_hist_shards,
    )

    ev = load_table(spark, SF_DIR, "events")
    bigev = (
        ev.crossJoin(spark.range(100).select(F.col("id").alias("_r")))
        .select("event_type", F.to_date("ts").alias("day"), "value")
        .repartition(64)
        .localCheckpoint()
    )
    print(f"event rows: {bigev.count()}")
    sh = hist_shards(bigev, ["event_type", "day"], "value", 0.0, 400.0)
    timed(
        "hist_quantiles_10m",
        hist_quantiles(merge_hist_shards(sh, ["event_type"]), ["event_type"], 0.0, 400.0),
    )

    # --- link prediction on the sf0.1 part co-purchase graph -----------
    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
    from vectordb_bioinsight_spark.operators.network import link_prediction

    li2 = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_partkey").alias("part"), F.col("l_orderkey").alias("okey")
    )
    edges = cooccurrence_edges(li2, "part", "okey", min_weight=2).localCheckpoint()
    print(f"edges: {edges.count()}")
    timed("link_prediction_sf01", link_prediction(edges, min_common=2))
    timed("link_prediction_capped", link_prediction(edges, max_degree=200))

    spark.stop()


if __name__ == "__main__":
    main()
