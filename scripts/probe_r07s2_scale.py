#!/usr/bin/env python
"""Scale probe: the r07 session-2 tiers — citation analytics over a
15M-edge graph, the rule-based explainer at 1M docs, and the QA retrieval
filter + context assembly at 1M results across 100k queries.

Usage: python scripts/probe_r07s2_scale.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.session import get_session


def timed(label: str, df) -> None:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"{label}\t{time.perf_counter() - t0:.1f}s")


def main() -> None:
    spark = get_session("probe-r07s2", cpus=32)

    # --- citation analytics: 5M papers, 15M edges (3 refs each, cited
    # ids concentrated mod 500k so popular papers accumulate ~30 citers)
    from vectordb_bioinsight_spark.operators.citations import (
        citation_network_stats,
        citation_yearly_trends,
        landmark_papers,
        related_papers,
    )

    n_papers, mod = 5_000_000, 500_000
    d = F.col("id")
    meta = (
        spark.range(n_papers)
        .select(
            d.alias("paper_id"),
            F.when(d % 11 == 0, F.lit(None).cast("int"))
            .otherwise((F.lit(1985) + (d * 7) % 40).cast("int"))
            .alias("year"),
            ((d * 137) % 20011).alias("citation_count"),
            ((d * 911) % ((d * 137) % 20011 + 1)).alias("influential_citations"),
            (d % 6).cast("int").alias("n_fields"),
            (d % 3 == 0).alias("is_open_access"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    edges = (
        spark.range(n_papers)
        .select(
            d.alias("citing_id"),
            F.explode(
                F.array((d * 3 + 1) % mod, (d * 5 + 2) % mod, (d * 7 + 3) % mod)
            ).alias("cited_id"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"papers: {meta.count()}, edges: {edges.count()}")
    timed("landmark_papers/5M", landmark_papers(meta, limit=20))
    timed("citation_trends/15M-edges", citation_yearly_trends(edges, meta))
    timed("citation_network/15M-edges", citation_network_stats(edges, meta))
    timed("related_papers/15M-edges", related_papers(edges, meta, limit=10))

    # --- rule-based explainer at 1M docs (~the catalog entry's planted
    # title rotation over a 300-char body)
    from vectordb_bioinsight_spark.operators.explainers import rule_based_explain
    from vectordb_bioinsight_spark.plans.catalog_explainers import _EXPLAIN_TITLES

    body = (
        "tumor gene expression profiling with replicates and cohort "
        "follow-up across treatment arms shows pathway level changes "
    ) * 4
    docs = (
        spark.range(1_000_000)
        .select(
            d.alias("doc_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in _EXPLAIN_TITLES]),
                (d % 8 + 1).cast("int"),
            ).alias("title"),
            F.concat(F.lit(body), (d % 1000).cast("string")).alias("content"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {docs.count()}")
    timed("rule_based_explain/1M", rule_based_explain(docs, "cancer gene therapy"))

    # --- QA filter + context: 1M results, 100k queries x 10 results
    from vectordb_bioinsight_spark.operators.qa_agent import (
        build_context,
        filter_results,
    )
    from vectordb_bioinsight_spark.plans.catalog_explainers import _QA_CONTENTS

    results = (
        spark.range(1_000_000)
        .select(
            (d % 100_000).alias("query_id"),
            (F.floor(d / 100_000) + 1).cast("int").alias("rank"),
            F.element_at(
                F.array(*[F.lit(c) for c in _QA_CONTENTS]), (d % 6 + 1).cast("int")
            ).alias("content"),
            ((d * 7) % 100).cast("double").alias("relevance_score"),
            F.lit("Results").alias("section"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"results: {results.count()}")
    timed(
        "qa_filter_context/1M",
        build_context(filter_results(results, "tumor growth")),
    )

    spark.stop()


if __name__ == "__main__":
    main()
