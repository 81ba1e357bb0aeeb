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


def detect_gene_id_format(
    df: DataFrame, gene_col: str = "gene_id", sample_n: int = 100
) -> DataFrame:
    """Gene-ID format detection
    (``rnaseq_pipeline/agents/agent4_validation.py:258-299``,
    ``_build_gene_id_mapping``'s detection head; the mygene HTTP lookup
    downstream is the declared S9 snapshot boundary): over the first
    ``sample_n`` ids (pinned: ascending gene id — the reference samples
    its DataFrame's head, an input-file order this engine does not
    preserve), count Ensembl (``ENSG`` prefix), Entrez (all digits) and
    symbol (neither) forms; ``needs_conversion`` is the symbol-majority
    rule (> 50% symbols -> pass through), and ``scope`` is the
    reference's mygene scope pick (ensembl.gene when Ensembl outnumbers
    Entrez, else entrezgene).

    One bounded head (orderBy + limit over the distinct gene dim) and a
    1-row aggregate.
    """
    sample = (
        df.select(F.col(gene_col).cast("string").alias("g"))
        .orderBy("g")
        .limit(sample_n)
    )
    agg = sample.agg(
        F.sum(F.when(F.col("g").startswith("ENSG"), 1).otherwise(0)).alias("ensembl_count"),
        F.sum(F.when(F.col("g").rlike(r"^\d+$"), 1).otherwise(0)).alias("numeric_count"),
        F.sum(
            F.when(
                ~F.col("g").startswith("ENSG") & ~F.col("g").rlike(r"^\d+$"), 1
            ).otherwise(0)
        ).alias("symbol_count"),
        F.count("*").alias("n_sampled"),
    )
    return agg.select(
        "ensembl_count",
        "numeric_count",
        "symbol_count",
        "n_sampled",
        (F.col("symbol_count") <= F.col("n_sampled") * 0.5).cast("int").alias("needs_conversion"),
        F.when(F.col("symbol_count") > F.col("n_sampled") * 0.5, F.lit("none"))
        .when(F.col("ensembl_count") > F.col("numeric_count"), F.lit("ensembl.gene"))
        .otherwise(F.lit("entrezgene"))
        .alias("scope"),
    )


def map_gene_symbols(
    df: DataFrame,
    mapping: DataFrame,
    gene_col: str = "gene_id",
    map_id_col: str = "query",
    symbol_col: str = "symbol",
    out_col: str = "gene_symbol",
) -> DataFrame:
    """Symbol-mapping application (``agent4_validation.py:300-331``):
    version suffixes are stripped before the lookup (``ENSG...{.5}`` ->
    ``ENSG...``), the mapping dimension (a mygene snapshot — KB-scale,
    broadcast) resolves the clean id, and unresolved ids keep themselves
    (the reference's self-map fallback). One broadcast join."""
    clean = F.split(F.col(gene_col).cast("string"), r"\.").getItem(0)
    dim = F.broadcast(
        mapping.select(
            F.col(map_id_col).alias("_clean"), F.col(symbol_col).alias("_sym")
        )
    )
    return (
        df.withColumn("_clean", clean)
        .join(dim, "_clean", "left")
        .withColumn(out_col, F.coalesce(F.col("_sym"), F.col(gene_col).cast("string")))
        .drop("_clean", "_sym")
    )
