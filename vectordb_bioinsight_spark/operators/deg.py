"""Differential-expression pipeline — SURVEY.md M1 (portable fallback semantics).

The reference's primary path is DESeq2 via rpy2 (agent1_deg.py:168-345); its
own documented fallback (agent1_deg.py:347-447) — group means, log2FC with
pseudocount, Welch t-test, BH-FDR, significance filter — is the portable spec
we implement (the reference treats it as an accepted substitute).

Input: long counts (gene_id, sample_id, count) + metadata (sample_id,
condition). Output: the reference's DEG-results schema (FIXTURES.md §5)
with ``direction`` on the significant subset (agent1_deg.py:479-489).

Scale: counts table is the 100 TB fact — everything before ``bh_adjust`` is
one groupBy(gene_id) aggregation (map-side combinable); metadata joins
broadcast; BH runs on the per-gene table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.relational import filter_by_group_sum
from vectordb_bioinsight_spark.operators.stats import bh_adjust, group_moments, welch_ttest


def deg_analysis(
    counts: DataFrame,
    metadata: DataFrame,
    condition_a: str = "tumor",
    condition_b: str = "normal",
    min_total_count: float = 10.0,
    padj_cutoff: float = 0.05,
    log2fc_cutoff: float = 1.0,
    exact_pvalues: bool = True,
) -> DataFrame:
    """Full DEG table: (gene_id, baseMean, log2FC, stat, pvalue, padj,
    direction). ``direction`` is null for non-significant genes.

    Defaults mirror the reference (agent1_deg.py:53-62: padj<0.05, |lfc|>1;
    min row-sum 10, agent1_deg.py:193-195).
    """
    joined = counts.join(F.broadcast(metadata.select("sample_id", "condition")), "sample_id")
    filtered = filter_by_group_sum(joined, "gene_id", "count", min_total_count)
    moments = group_moments(filtered, ["gene_id"], "condition", "count", condition_a, condition_b)
    base_mean = filtered.groupBy("gene_id").agg(F.avg(F.col("count").cast("double")).alias("baseMean"))
    tested = welch_ttest(moments, exact_pvalues=exact_pvalues)
    tested = tested.withColumn(
        "log2FC", F.log2((F.col("mean_a") + 1.0) / (F.col("mean_b") + 1.0))
    )
    adjusted = bh_adjust(tested.na.drop(subset=["pvalue"]), "pvalue", "padj")
    out = adjusted.join(base_mean, "gene_id")
    direction = (
        F.when(
            (F.col("padj") < padj_cutoff) & (F.col("log2FC") > log2fc_cutoff), F.lit("up")
        )
        .when((F.col("padj") < padj_cutoff) & (F.col("log2FC") < -log2fc_cutoff), F.lit("down"))
        .otherwise(F.lit(None).cast("string"))
    )
    return out.select(
        "gene_id",
        "baseMean",
        "log2FC",
        F.col("t_stat").alias("stat"),
        "pvalue",
        "padj",
        direction.alias("direction"),
    )


def significant_degs(deg: DataFrame) -> DataFrame:
    """F2+F6: the significant subset, ranked by padj (agent1_deg.py:472-492)."""
    return deg.filter(F.col("direction").isNotNull()).orderBy(F.asc("padj"), F.asc("gene_id"))
