#!/usr/bin/env python
"""Scale probe: the r07 tier — dataset-type detection over a 10M-cell
long matrix, deterministic-replay HLL over 10M events, and the briefing
ladders at 1M docs.

Usage: python scripts/probe_r07_scale.py
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
    spark = get_session("probe-r07", cpus=32)

    # --- dataset-type detection: 10M long-matrix rows across 40 datasets
    from vectordb_bioinsight_spark.operators.dataset_type import detect_dataset_type

    cells = (
        spark.range(10_000_000)
        .select(
            (F.col("id") % 40).cast("string").alias("ds"),
            (F.col("id") % 997).alias("gene"),
            (F.floor(F.col("id") / 997) % 1500).alias("sample"),
            (F.col("id") % 7).cast("double").alias("v"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"cells: {cells.count()}")
    timed("dataset_type/10M-cells", detect_dataset_type(cells, "ds", "gene", "sample", "v"))

    # --- replay HLL: 10M (user, day) events, per-day registers + rolling 7d
    from vectordb_bioinsight_spark.operators.trends import rolling_active_users_replay

    ev = (
        spark.range(10_000_000)
        .select(
            F.concat(F.lit("u"), (F.col("id") % 2_000_000).cast("string")).alias("u"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") % 90) * 86_400
            ).alias("ts"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"events: {ev.count()}")
    timed("rolling_active_replay/10M-events", rolling_active_users_replay(ev, "u", "ts", 7))

    from vectordb_bioinsight_spark.operators.sketches import (
        hll_replay_estimate,
        hll_replay_registers,
    )

    timed(
        "hll_replay_estimate/10M-events",
        hll_replay_estimate(
            hll_replay_registers(ev.withColumn("d", F.to_date("ts")), ["d"], "u"), ["d"]
        ),
    )

    # --- briefing ladders at 1M docs
    docs = load_table(spark, SF_DIR, "documents")
    rep = max(1, 1_000_000 // docs.count())
    big = (
        docs.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select((F.col("doc_id") * rep + F.col("_r")).alias("doc_id"), "text")
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {big.count()}")

    from vectordb_bioinsight_spark.operators.briefing import (
        aggregator_headline,
        article_type_classify,
        high_impact_filter,
    )

    pts = F.array(
        F.lit("Journal Article"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("Review")).otherwise(F.lit("Letter")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("Meta-Analysis")).otherwise(
            F.lit("Comment")
        ),
    )
    timed(
        "article_type/1M",
        article_type_classify(big.select("doc_id", pts.alias("p")), "doc_id", "p"),
    )
    journals = big.select(
        "doc_id",
        F.concat(
            F.lit("Journal of Topic "), (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 9 == 0, F.lit(" Nature Section")).otherwise(F.lit("")),
        ).alias("journal"),
    )
    timed("high_impact_filter/1M", high_impact_filter(journals, "journal"))
    news = big.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("regulatory"), F.lit("trials"), F.lit("preprints")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("cat"),
        F.element_at(
            F.array(F.lit("drug_approval"), F.lit("safety_warning"), F.lit("other")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("nt"),
        (F.col("doc_id") % 100).alias("pr"),
    )
    timed("aggregator_headline/1M", aggregator_headline(news, "doc_id", "cat", "nt", "pr"))

    # --- prefiltered population extractor at 1M (the r07 lever on record)
    from vectordb_bioinsight_spark.operators.paper_insights import population_info

    planted = big.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " enrolled 1250 patients with metastatic gastric cancer; "
                    "median age 61-75 years; 44.2% female; multicenter."
                ),
            ),
        ).otherwise(F.col("text")),
    )
    timed("population_info/1M", population_info(planted, "doc_id", "text"))

    spark.stop()


if __name__ == "__main__":
    main()
