#!/usr/bin/env python
"""One artifact, one shape, one protocol: every r08 Arrow kernel plus the
r09 summary_parse kernel, probed at the SAME 1M-doc corpus with 5-run
medians (VERDICT r08 tasks 6-7 — SCALING rules 40/43b get one number of
record each instead of figures scattered across differently-shaped runs).

Corpus: documents replicated to 1M rows, 64 partitions, localCheckpoint
(scan cost excluded from the A/B). Each pair runs expression form then
Arrow form on identical inputs; 1 warm run discarded, median of 5 timed.

    python scripts/probe_r09_kernels.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_DOCS = 1_000_000


def timed(label: str, df) -> float:
    df.write.mode("overwrite").format("noop").save()  # warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    med = statistics.median(runs)
    print(f"{label}\t{med:.2f}s median-of-5 (runs {['%.2f' % r for r in runs]})")
    return med


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.session import get_session
    from vectordb_bioinsight_spark.sources.readers import load_table

    spark = get_session("probe-r09", cpus=32)
    docs = load_table(spark, SF_DIR, "documents")
    rep = max(1, N_DOCS // docs.count())
    corpus = (
        docs.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select(
            (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
            F.when(
                (F.col("doc_id") * rep + F.col("_r")) % 7 == 0,
                F.concat(F.col("text"), F.lit("\nlfs pdb bgk hth jcj clfs")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    n = corpus.count()
    print(f"corpus: {n} docs, 64 partitions, sf_dir={SF_DIR}")

    # --- 1. keyword extraction (rule 40 coda) -----------------------------
    from vectordb_bioinsight_spark.operators.keyword_discovery import (
        extract_keywords,
        extract_keywords_arrow,
    )

    timed("extract_keywords/expression/1M", corpus.select(extract_keywords(F.col("text"))))
    timed("extract_keywords/arrow/1M", corpus.select(extract_keywords_arrow(F.col("text"))))

    # --- 2. garbled line scoring (rule 43b) --------------------------------
    from vectordb_bioinsight_spark.operators.cleaning import (
        garbled_line_flag,
        garbled_line_flag_arrow,
    )

    def garbled_stats(flag_fn):
        lines = (
            corpus.select(
                F.col("doc_id").alias("id"),
                F.explode(F.split(F.col("text"), "\n")).alias("_l"),
            )
            .withColumn("_t", F.regexp_replace(F.col("_l"), r"^\s+|\s+$", ""))
            .filter(F.length("_t") > 0)
        )
        return (
            lines.withColumn("_g", flag_fn(F.col("_l")))
            .groupBy("id")
            .agg(F.count("*").alias("n"), F.sum(F.col("_g").cast("long")).alias("g"))
        )

    timed("garbled/expression/1M", garbled_stats(garbled_line_flag))
    timed("garbled/arrow/1M", garbled_stats(garbled_line_flag_arrow))

    # --- 3. trend matcher (rule 40 coda) ------------------------------------
    from vectordb_bioinsight_spark.functions.trend_seed import trend_dimension
    from vectordb_bioinsight_spark.operators.trend_match import primary_trends

    t_docs = corpus.select(
        "doc_id",
        F.substring("text", 1, 60).alias("title"),
        F.col("text").alias("abstract"),
    )
    dim = trend_dimension(spark)
    timed(
        "primary_trends/expression/1M",
        primary_trends(t_docs, dim, "doc_id", "title", "abstract", kernel="expression"),
    )
    timed(
        "primary_trends/arrow/1M",
        primary_trends(t_docs, dim, "doc_id", "title", "abstract", kernel="arrow"),
    )

    # --- 4. study quality (rule 42's no-CSE trap) ---------------------------
    from vectordb_bioinsight_spark.operators.paper_insights import study_quality

    timed(
        "study_quality/expression/1M",
        study_quality(t_docs, "doc_id", "title", "abstract", kernel="expression"),
    )
    timed(
        "study_quality/arrow/1M",
        study_quality(t_docs, "doc_id", "title", "abstract", kernel="arrow"),
    )

    # --- 5. bootstrap CI weights (rule 40 coda; janino 64 KB lesson) --------
    from vectordb_bioinsight_spark.operators.stats import bootstrap_rate_ci

    users = (
        corpus.select(
            (F.col("doc_id") % 1_000_000).alias("user_id"),
            ((F.col("doc_id") % 5) == 0).cast("int").alias("conv"),
        )
        .groupBy("user_id")
        .agg(F.max("conv").alias("conv"))
        .localCheckpoint()
    )
    timed(
        "bootstrap_rate_ci/arrow/1M",
        bootstrap_rate_ci(users, "conv", "user_id", n_replicates=50),
    )

    # --- 6. summary parser (r09: the per-document fold) ---------------------
    from vectordb_bioinsight_spark.operators.summary_parse import parse_summary

    s_docs = corpus.select("doc_id", F.col("text").alias("summary_text"))
    timed(
        "parse_summary/expression/1M",
        parse_summary(s_docs, kernel="expression"),
    )
    timed("parse_summary/arrow/1M", parse_summary(s_docs, kernel="arrow"))
    spark.stop()


if __name__ == "__main__":
    main()
