#!/usr/bin/env python
"""Re-probe the two operators whose aggregate shape changed in r04:
repeated_ngram_spans (min/max dup detection instead of countDistinct) and
gsea_prerank_es_scaled (single-pass candidate array instead of a 3-way
union). Refreshes the matching SCALING.md rows.

Usage: python scripts/probe_spans_rerun.py
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
    spark = get_session("probe-spans-rerun", cpus=32)

    # worst case per the original SCALING row: every doc duplicated 500x,
    # so EVERY shingle position survives the dup filter
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    rep = max(1, 1_000_000 // n0)
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    big = (
        docs.crossJoin(reps)
        .select((F.col("doc_id") * rep + F.col("_r")).alias("doc_id"), "text")
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {n0} x {rep} = {big.count()}", flush=True)

    from vectordb_bioinsight_spark.operators.dedup import repeated_ngram_spans

    timed("repeated_ngram_spans (all dup, worst case)",
          repeated_ngram_spans(big, "doc_id", "text", n=8, min_docs=2))

    # gsea scale twin at 1M distinct genes x 100 sets (same grid as
    # probe_dataops_scale.py)
    ev = load_table(spark, SF_DIR, "events")
    n_ev = ev.count()
    rep_e = max(1, 1_000_000 // n_ev)
    reps_e = spark.range(rep_e).select(F.col("id").alias("_r"))
    big_ev = (
        ev.crossJoin(reps_e)
        .select((F.col("event_id") * rep_e + F.col("_r")).alias("event_id"))
        .repartition(64)
        .localCheckpoint()
    )
    genes = big_ev.select(F.col("event_id").alias("gene")).distinct().select(
        "gene",
        (F.pmod(F.col("gene") * 2654435761, F.lit(100_000)) / 1000.0).alias("stat"),
    )
    membership = genes.select(
        F.pmod(F.col("gene"), F.lit(100)).cast("string").alias("gene_set"), "gene"
    )

    from vectordb_bioinsight_spark.operators.stats import gsea_prerank_es_scaled

    timed("gsea_prerank_es_scaled (1M genes, 100 sets)",
          gsea_prerank_es_scaled(genes, "gene", "stat", membership, "gene_set"))

    spark.stop()


if __name__ == "__main__":
    main()
