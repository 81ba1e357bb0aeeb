#!/usr/bin/env python
"""r08 kernel A/Bs (SCALING rules 40 coda / 41 / 43b coda): the two
Arrow-kernel switches and the high-impact let-binding, each measured
median-of-3 warm against the expression form it replaced, on identical
inputs.

    python scripts/probe_r08_kernels.py [sf_dir]

Numbers of record (2026-08-16, local[32]):
  keyword extraction   4.68 s -> 0.65 s per 50k docs   (7.2x, Arrow)
  garbled line scoring 29.8 s -> 10.8 s per 1M docs    (2.8x, Arrow)
  high_impact_filter   0.33 s -> 0.18 s per 4M rows    (1.9x, let-bind;
                       measured at 4M with 5-run medians - at 1M both
                       forms are inside scheduler noise and a single
                       median-of-3 can invert)
  primary_trends       13.2 s -> 8.1 s per 1M docs     (1.6x, Arrow;
                       window exchange 1 -> 0 - the shuffle-free pick)
  study_quality        19.8 s -> 6.4 s per 1M docs     (3.1x, Arrow;
                       the rule ladder runs once per ROW instead of
                       once per output column - rule 42's no-CSE trap)
  bootstrap_rate_ci    1.63 s -> 0.53 s at sf0.1       (3.1x, Arrow;
                       ALSO fixes a janino 64 KB codegen failure - the
                       50 md5-chain weight expressions fused into the
                       upstream keyed agg's output method and dropped
                       the whole stage to the interpreter)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(label: str, df) -> None:
    df.write.mode("overwrite").format("noop").save()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    print(f"{label}\t{runs[1]:.2f}s median-of-3")


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.session import get_session
    from vectordb_bioinsight_spark.sources.readers import load_table

    spark = get_session("probe-r08", cpus=32)
    docs = load_table(spark, SF_DIR, "documents")

    # --- keyword extraction: expression HOF tree vs Arrow kernel (50k docs)
    from vectordb_bioinsight_spark.operators.keyword_discovery import (
        extract_keywords,
        extract_keywords_arrow,
    )

    rep = max(1, 50_000 // docs.count())
    kw_docs = (
        docs.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select((F.col("doc_id") * rep + F.col("_r")).alias("doc_id"), "text")
        .repartition(64)
        .localCheckpoint()
    )
    print(f"keyword docs: {kw_docs.count()}")
    timed("extract/expression/50k", kw_docs.select(extract_keywords(F.col("text"))))
    timed("extract/arrow/50k", kw_docs.select(extract_keywords_arrow(F.col("text"))))

    # --- garbled scoring: expression fold vs Arrow kernel (1M docs)
    from vectordb_bioinsight_spark.operators.cleaning import (
        garbled_line_flag,
        garbled_line_flag_arrow,
    )

    rep = max(1, 1_000_000 // docs.count())
    g_docs = (
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
    print(f"garbled docs: {g_docs.count()}")

    def garbled_stats(flag_fn):
        lines = (
            g_docs.select(
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

    # --- high-impact filter: naive OR-fold vs the shipped let-binding (1M)
    from vectordb_bioinsight_spark.operators.briefing import (
        HIGH_IMPACT_JOURNALS,
        high_impact_filter,
    )

    journals = (
        spark.range(4_000_000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("Journal of Topic "),
                (F.col("id") % 50).cast("string"),
                F.when(F.col("id") % 9 == 0, F.lit(" Nature Section")).otherwise(
                    F.lit("")
                ),
            ).alias("journal"),
        )
        .repartition(64)
        .localCheckpoint()
    )

    def naive_filter(df, col):
        j = F.lower(F.col(col))
        cond = F.lit(False)
        for hj in HIGH_IMPACT_JOURNALS:
            cond = cond | j.contains(hj)
        return df.filter(cond)

    timed("high_impact/or-fold/4M", naive_filter(journals, "journal"))
    timed("high_impact/let-bound/4M", high_impact_filter(journals, "journal"))

    # --- trend matcher: expression cross join + window vs Arrow (1M docs)
    from vectordb_bioinsight_spark.functions.trend_seed import trend_dimension
    from vectordb_bioinsight_spark.operators.trend_match import primary_trends

    t_docs = g_docs.select(
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

    # --- study quality: per-column re-evaluated expression vs Arrow (1M)
    from vectordb_bioinsight_spark.operators.paper_insights import study_quality

    timed(
        "study_quality/expression/1M",
        study_quality(t_docs, "doc_id", "title", "abstract", kernel="expression"),
    )
    timed(
        "study_quality/arrow/1M",
        study_quality(t_docs, "doc_id", "title", "abstract", kernel="arrow"),
    )

    # --- bootstrap CI: the shipped Arrow weight kernel (the 50-expression
    # form it replaced is a codegen trap — see _poisson1_weights_arrow)
    from vectordb_bioinsight_spark.operators.stats import bootstrap_rate_ci

    ev = load_table(spark, SF_DIR, "events")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    timed(
        "bootstrap_rate_ci/arrow/sf",
        bootstrap_rate_ci(users, "conv", "user_id", n_replicates=50),
    )
    spark.stop()


if __name__ == "__main__":
    main()
