#!/usr/bin/env python
"""Scale probe: the r05 SFT/encoding tier at 1M rows (SCALING.md rows).

chat_render: 1M documents -> 10-word-turn conversations (one conv-keyed
shuffle); preference_pairs over hash-bucket clusters; LOO target encoding
of a 1M-row fact table; event transition matrix at 1M events.

Usage: python scripts/probe_sft_scale.py [replication]
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
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_session("probe-sft-scale", cpus=32)

    docs = load_table(spark, SF_DIR, "documents")
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
            "text", "source", "lang", "n_chars",
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {big.count()}")

    from vectordb_bioinsight_spark.operators.sft import preference_pairs, render_chat

    # hoist split() into its own projection: inside the transform lambda
    # it would re-tokenize the doc once PER TURN (probe: 13.1 -> ~6 s/1M)
    turns = big.withColumn("_w", F.split("text", " ")).select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, int(ceil(size(_w) / 10.0)) - 1),"
                " i -> array_join(slice(_w, i * 10 + 1, 10), ' '))"
            )
        ).alias("turn", "ttext"),
    ).withColumn(
        "role",
        F.when(F.col("turn") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")),
    )
    timed("render_chat (1M convs)", render_chat(turns, "doc_id", "turn", "role", "ttext"))

    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    clustered = big.select(
        "doc_id",
        F.pmod(portable_hash64(F.col("text")), F.lit(200_000)).alias("cluster"),
        F.col("n_chars").cast("double").alias("score"),
    )
    timed(
        "preference_pairs (1M docs, 200k clusters)",
        preference_pairs(clustered, "cluster", "doc_id", "score"),
    )

    from vectordb_bioinsight_spark.operators.encoding import target_encode_loo

    li = load_table(spark, SF_DIR, "lineitem")
    print(f"lineitem: {li.count()}")
    timed(
        "target_encode_loo (lineitem, supplier key)",
        target_encode_loo(
            li.select("l_suppkey", (F.col("l_returnflag") == "R").cast("int").alias("y")),
            ["l_suppkey"], "y",
        ),
    )

    from vectordb_bioinsight_spark.operators.trends import event_transition_matrix

    ev = load_table(spark, SF_DIR, "events")
    ev_rep = 10
    big_ev = (
        ev.crossJoin(spark.range(ev_rep).select(F.col("id").alias("_r")))
        .select(
            (F.col("user_id") * ev_rep + F.col("_r")).alias("user_id"),
            "event_type", "ts",
            (F.col("event_id") * ev_rep + F.col("_r")).alias("event_id"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"events: {big_ev.count()}")
    timed(
        "event_transition_matrix (1M events)",
        event_transition_matrix(big_ev, "user_id", "event_type", "ts", "event_id"),
    )


if __name__ == "__main__":
    main()
