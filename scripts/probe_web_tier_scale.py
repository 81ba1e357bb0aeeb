#!/usr/bin/env python
"""Scale probe: the r04 web-hygiene tier at 1M docs (SCALING.md rows) —
URL extraction/normalization/domain rollup, URL dedup, HTML strip +
mojibake repair, sentence segmentation, shard manifest. All are
scan-local projections or single bounded-key groupBys; this confirms the
linear behavior end-to-end with the noop sink.

Usage: python scripts/probe_web_tier_scale.py [replication]
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
    print(f"{label}\t{time.perf_counter() - t0:.1f}s", flush=True)


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_session("probe-web-tier", cpus=32)

    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    # plant a URL + light HTML on half the replicas so the extract paths
    # do real work
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
            F.when(
                F.col("_r") % 2 == 0,
                F.concat(
                    F.lit("<p>"),
                    F.col("text"),
                    F.lit("</p> see https://WWW.Example.COM/x/"),
                    (F.col("_r") % 1000).cast("string"),
                    F.lit("?utm_source=probe&id=1. donâ€™t stop"),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {n0} x {rep} = {big.count()}", flush=True)

    from vectordb_bioinsight_spark.operators.cleaning import clean_web_docs, split_sentences
    from vectordb_bioinsight_spark.operators.packing import shard_manifest, shuffle_shards
    from vectordb_bioinsight_spark.operators.urls import (
        url_dedup_docs,
        url_domain_stats,
        with_url_key,
    )

    timed("with_url_key (canonical-first-URL key)", with_url_key(big, "text"))
    timed("url_domain_stats", url_domain_stats(big, "doc_id", "text"))
    timed("url_dedup_docs", url_dedup_docs(big, "doc_id", "text"))
    timed("clean_web_docs (HTML strip + mojibake)", clean_web_docs(big, "doc_id", "text"))
    timed("split_sentences", split_sentences(big, "doc_id", "text"))
    timed(
        "shard_manifest (64 shards, over shuffle_shards)",
        shard_manifest(
            shuffle_shards(big, "doc_id", n_shards=64, salt=0),
            "shard", "doc_id", "text",
        ),
    )

    spark.stop()


if __name__ == "__main__":
    main()
