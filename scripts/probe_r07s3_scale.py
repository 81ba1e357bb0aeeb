#!/usr/bin/env python
"""Scale probe: the r07 session-3 tiers — summary parsing, QA filter,
domain adaptation, SHAP aggregation, crawler scoring, and PubMed XML at
1M rows each.

Usage: python scripts/probe_r07s3_scale.py
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
    print(f"{label}\t{time.perf_counter() - t0:.1f}s", flush=True)


def main() -> None:
    spark = get_session("probe-r07s3", cpus=32)
    d = F.col("id")

    # --- summary parse: 1M docs, the text path (worst case — every doc
    # folds ~10 lines through the marker windows)
    from vectordb_bioinsight_spark.operators.summary_parse import parse_summary

    text = F.concat(
        F.lit("PURPOSE: find "), (d % 97).cast("string"),
        F.lit("\nsecond line of purpose\nMETHODS\n- step one\n- step two\n"
              "RESULTS: good outcome "),
        (d % 13).cast("string"),
        F.lit("\nKEY FINDINGS:\n- f1\n- f2\nLIMITATIONS: few"),
    )
    docs = (
        spark.range(1_000_000)
        .select(d.alias("doc_id"), text.alias("summary_text"))
        .repartition(64)
        .localCheckpoint()
    )
    print(f"docs: {docs.count()}")
    timed("summary_parse_text/1M", parse_summary(docs))

    # --- domain adaptation: 10M matrix cells (100k samples x 100 dims)
    from vectordb_bioinsight_spark.operators.stats import (
        reference_quantile_map,
        zscore_recalibrate,
    )

    cells = (
        spark.range(10_000_000)
        .select(
            (d % 100_000).alias("sample"),
            F.floor(d / 100_000).cast("int").alias("feature"),
            ((d * 37) % 10_007).cast("double").alias("value"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    ref = spark.range(1, 101).select(
        F.col("id").cast("int").alias("rank"),
        F.round(0.8 * (2.0 * F.col("id") / 100.0 - 1.0), 6).alias("ref_q"),
    )
    print(f"cells: {cells.count()}")
    timed("ref_quantile_map/10M", reference_quantile_map(cells, "sample", "feature", "value", ref))
    timed("zscore_recalibrate/10M", zscore_recalibrate(cells, "value"))

    # --- SHAP aggregation: the same 10M attribution matrix
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        shap_gene_stats,
        shap_top_genes_per_sample,
    )

    attr = cells.select(
        F.col("sample").alias("sample_id"),
        F.concat(F.lit("G"), F.col("feature").cast("string")).alias("gene"),
        (F.col("value") / 1000.0 - 5.0).alias("shap_value"),
        F.col("value").alias("feature_value"),
    )
    timed("shap_gene_stats/10M", shap_gene_stats(attr))
    timed("shap_top_genes/10M", shap_top_genes_per_sample(attr, top_k=5))

    # --- crawler scoring: 1M papers + 5M citation-year rows + the
    # query filter over 1M results in 100k lists
    from vectordb_bioinsight_spark.operators.paper_scoring import (
        citation_velocity,
        filter_by_query_terms,
        recency_score,
        trend_score,
    )

    papers = (
        spark.range(1_000_000)
        .select(
            d.alias("paper_id"),
            (F.lit(2016) + d % 10).cast("int").alias("year"),
            ((d * 37) % 5000).alias("citation_count"),
            (((d * 3) % 40).cast("double") / 10.0).alias("publication_surge"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    by_year = (
        spark.range(5_000_000)
        .select(
            (d % 1_000_000).alias("paper_id"),
            (F.lit(2021) + d % 5).cast("int").alias("year"),
            ((d * 7) % 30).alias("n_citations"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"papers: {papers.count()}, by_year: {by_year.count()}")
    vel = citation_velocity(by_year, current_year=2025)
    rec = recency_score(F.col("year"), 2025)
    scored = papers.join(vel, "paper_id", "left").na.fill(0.0, ["citation_velocity"]).select(
        "paper_id",
        trend_score(
            F.col("citation_velocity"), F.col("publication_surge"),
            F.col("citation_count"), rec,
        ).alias("trend"),
    )
    timed("paper_trend_scores/1M+5M", scored)

    results = (
        spark.range(1_000_000)
        .select(
            (d % 100_000).alias("group_id"),
            F.floor(d / 100_000).cast("int").alias("scan_order"),
            F.when(d % 5 < 2, F.lit("cancer paper title")).otherwise(F.lit("other topic")).alias("title"),
            F.when(d % 5 >= 2, F.lit("immunotherapy abstract")).otherwise(F.lit("")).alias("abstract"),
            (d % 90).cast("double").alias("trend_score"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"results: {results.count()}")
    timed(
        "query_filter/1M",
        filter_by_query_terms(results, "cancer immunotherapy", 4, group_col="group_id"),
    )

    # --- PubMed XML: 1M planted articles through the xpath stack
    from vectordb_bioinsight_spark.operators.pubmed_xml import parse_pubmed_articles

    xml = F.concat(
        F.lit("<PubmedArticle><MedlineCitation><PMID>10"), d.cast("string"),
        F.lit("</PMID><Article><ArticleTitle>Study of GENE"), (d % 50).cast("string"),
        F.lit(" <i>in vivo</i> effects</ArticleTitle>"
              '<Abstract><AbstractText Label="BACKGROUND">bg</AbstractText>'
              '<AbstractText Label="RESULTS">res</AbstractText></Abstract>'
              "<AuthorList><Author><ForeName>Ann</ForeName><LastName>Lee</LastName></Author></AuthorList>"
              "<Journal><Title>J One</Title></Journal><PubDate><Year>2019</Year></PubDate>"
              "<PublicationTypeList><PublicationType>Journal Article</PublicationType></PublicationTypeList>"
              "</Article></MedlineCitation><PubmedData>"
              '<ArticleId IdType="doi">10.1/x</ArticleId>'
              "</PubmedData></PubmedArticle>"),
    )
    articles = (
        spark.range(1_000_000)
        .select(xml.alias("article_xml"))
        .repartition(64)
        .localCheckpoint()
    )
    print(f"articles: {articles.count()}")
    timed("pubmed_xml_parse/1M", parse_pubmed_articles(articles))

    spark.stop()


if __name__ == "__main__":
    main()
