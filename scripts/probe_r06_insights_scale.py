#!/usr/bin/env python
"""Scale probe: the r06 gap-closing tier at 1M docs — garbled-text stats,
trend-definition matching (17-trend broadcast cross join), and the three
paper-insights extractors.

Usage: python scripts/probe_r06_insights_scale.py
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
    spark = get_session("probe-r06-insights", cpus=32)

    docs = load_table(spark, SF_DIR, "documents")
    rep = max(1, 1_000_000 // docs.count())
    big = (
        docs.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select(
            (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(
                        " A phase III randomized double-blind multicenter trial "
                        "enrolled 1250 patients with metastatic gastric cancer; "
                        "median age 61-75 years; 44.2% female; overall survival "
                        "hazard ratio = 0.72 (95% CI 0.58-0.89); CAR-T chimeric "
                        "antigen receptor therapy with CD19 targeting."
                    ),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {big.count()}")

    from vectordb_bioinsight_spark.functions.trend_seed import trend_dimension
    from vectordb_bioinsight_spark.operators.cleaning import garbled_text_stats
    from vectordb_bioinsight_spark.operators.paper_insights import (
        key_outcomes,
        population_info,
        study_quality,
    )
    from vectordb_bioinsight_spark.operators.trend_match import primary_trends

    timed("garbled_text_stats/1M", garbled_text_stats(big, "doc_id", "text"))
    withtitle = big.withColumn("title", F.substring("text", 1, 60))
    timed(
        "primary_trends x17/1M",
        primary_trends(withtitle, trend_dimension(spark), "doc_id", "title", "text"),
    )
    timed("study_quality/1M", study_quality(withtitle, "doc_id", "title", "text"))
    timed("key_outcomes/1M", key_outcomes(big, "doc_id", "text"))
    timed("population_info/1M", population_info(big, "doc_id", "text"))

    from vectordb_bioinsight_spark.functions.trend_seed import TREND_SEED
    from vectordb_bioinsight_spark.operators.hot_topics import (
        hot_topic_counts,
        topic_keyword_dimension,
    )
    from vectordb_bioinsight_spark.operators.news_priority import priority_scores

    feed = withtitle.select(
        F.col("doc_id").alias("nid"), "title",
        F.substring("text", 61, 200).alias("summary"),
        F.lit("FDA").alias("source"), F.lit("drug_approval").alias("type"),
        F.lit("nature").alias("journal"), F.lit("1998-06-09").alias("dt"),
    )
    timed(
        "priority_scores/1M",
        priority_scores(feed, "nid", "source", "type", "title", "summary",
                        "journal", "dt", "1998-06-10"),
    )
    topics = {tid: (cat, kws) for tid, (_n, cat, kws, _g, _m) in TREND_SEED.items()}
    timed(
        "hot_topic_counts x17/1M",
        hot_topic_counts(withtitle, topic_keyword_dimension(spark, topics),
                         "title", "text"),
    )

    from vectordb_bioinsight_spark.operators.keyword_discovery import (
        keyword_counts,
        meaningful_keywords,
    )
    from vectordb_bioinsight_spark.operators.research_gaps import gap_sentences

    timed("gap_sentences/1M", gap_sentences(big, "doc_id", "text"))
    timed(
        "keyword_discovery/1M",
        meaningful_keywords(keyword_counts(big, "text")),
    )
    spark.stop()


if __name__ == "__main__":
    main()
