"""The bulk RNA-seq dataflow end-to-end — SURVEY §3.2 as one driver-side DAG.

Reference lifecycle (orchestrator.py:105-113, 564-616): DEG → network →
pathway → validation → report, with CSV files as the inter-agent IR. Here
each stage is a DataFrame function and the IR is a parquet table contract
(``workdir`` set) or a plain lazy DataFrame (``workdir`` None) — the engine
replaces the file-shuffling with a declared-table DAG the optimizer can see.

Stage caps follow the reference (network ≤1000 genes,
agent2_network.py:127-132; enrichment needs ≥3-gene overlap,
agent3_pathway.py:241-246) and are explicit parameters — logged by being in
the plan, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.deg import deg_analysis, significant_degs
from vectordb_bioinsight_spark.operators.network import correlation_edges, hub_scores
from vectordb_bioinsight_spark.operators.scoring import checklist_score, ladder_score
from vectordb_bioinsight_spark.operators.stats import enrichment_pvalues


def pathway_enrichment(
    deg: DataFrame,
    gene_sets: DataFrame,
    min_overlap: int = 3,
) -> DataFrame:
    """M7 over-representation per gene set against the significant-DEG list.

    ``deg`` is the DEG table (gene_id, direction, ...); ``gene_sets`` is the
    dimension (set_id, gene_id). Universe = all TESTED genes (the DEG
    table), the contingency the reference's Enrichr call implies. Output:
    (set_id, overlap, set_size, n_draws, pop_size, fold_enrichment, pvalue).
    """
    universe = deg.select("gene_id", F.col("direction").isNotNull().alias("_sig"))
    totals = universe.agg(
        F.count("*").cast("long").alias("pop_size"),
        F.sum(F.col("_sig").cast("int")).cast("long").alias("n_draws"),
    )
    in_universe = gene_sets.join(universe, "gene_id")
    per_set = in_universe.groupBy("set_id").agg(
        F.count("*").cast("long").alias("set_size"),
        F.sum(F.col("_sig").cast("int")).cast("long").alias("overlap"),
    )
    cont = per_set.crossJoin(F.broadcast(totals)).filter(F.col("overlap") >= min_overlap)
    fold = (F.col("overlap") / F.col("n_draws")) / (F.col("set_size") / F.col("pop_size"))
    cont = cont.select(
        "set_id", "overlap", "set_size", "n_draws", "pop_size",
        F.round(fold, 6).alias("fold_enrichment"),
    )
    return enrichment_pvalues(cont)


def validation_scores(
    deg: DataFrame,
    hubs: DataFrame,
    db_genes: DataFrame,
) -> DataFrame:
    """M8 checklist scoring (agent4_validation.py:405-524): weighted rule
    points → confidence enum. db_genes: dimension (gene_id) of externally
    validated genes (COSMIC/OncoKB analog), broadcast-joined."""
    flags = (
        deg.join(hubs.select("entity", "is_hub").withColumnRenamed("entity", "gene_id"),
                 "gene_id", "left")
        .join(F.broadcast(db_genes.select("gene_id").withColumn("_db", F.lit(True))),
              "gene_id", "left")
        .na.fill({"is_hub": False, "_db": False})
    )
    score = checklist_score(
        [
            (F.col("direction").isNotNull(), 2.0),   # significant DEG
            (F.col("is_hub"), 2.0),                  # network hub
            (F.col("_db"), 1.5),                     # database-validated
            (F.abs(F.col("log2FC")) > 2.0, 1.0),     # strong effect
        ]
    )
    confidence = (
        F.when(F.col("validation_score") >= 4.0, "high")
        .when(F.col("validation_score") >= 2.5, "medium")
        .otherwise("low")
    )
    return (
        flags.withColumn("validation_score", F.round(score, 4))
        .withColumn("confidence", confidence)
        .select(
            "gene_id", "log2FC", "padj", "direction", "is_hub",
            F.col("_db").alias("db_match"), "validation_score", "confidence",
        )
    )


def run_bulk_pipeline(
    counts: DataFrame,
    metadata: DataFrame,
    gene_sets: DataFrame,
    db_genes: DataFrame,
    max_network_genes: int = 1000,
    min_abs_corr: float = 0.6,
    workdir: str | None = None,
) -> dict[str, DataFrame]:
    """DEG → network → pathway → validation → summary. Returns every stage
    table; with ``workdir`` each stage also persists as parquet (the table
    contract replacing orchestrator.py:168-184's CSV contract)."""
    deg = deg_analysis(counts, metadata)
    sig = significant_degs(deg)

    net_genes = sig.limit(max_network_genes).select("gene_id")
    profiles = counts.join(F.broadcast(net_genes), "gene_id").select(
        "gene_id", "sample_id", F.log2(F.col("count").cast("double") + 1.0).alias("_log2c")
    )
    edges = correlation_edges(profiles, "gene_id", "sample_id", "_log2c", min_abs_corr)
    hubs = hub_scores(edges, top_k_hubs=20)

    enrich = pathway_enrichment(deg, gene_sets)
    validated = validation_scores(deg, hubs, db_genes)
    summary = validated.agg(
        F.count("*").cast("long").alias("n_genes"),
        F.sum((F.col("direction") == "up").cast("int")).cast("long").alias("n_up"),
        F.sum((F.col("direction") == "down").cast("int")).cast("long").alias("n_down"),
        F.sum(F.col("is_hub").cast("int")).cast("long").alias("n_hubs"),
        F.sum(F.col("db_match").cast("int")).cast("long").alias("n_db_matched"),
        F.sum((F.col("confidence") == "high").cast("int")).cast("long").alias("n_high_conf"),
    )

    stages = {
        "deg": deg,
        "significant": sig,
        "network_edges": edges,
        "hubs": hubs,
        "enrichment": enrich,
        "validated": validated,
        "summary": summary,
    }
    if workdir:
        from vectordb_bioinsight_spark.sources.writers import write_table

        for name, df in stages.items():
            write_table(df, f"{workdir}/{name}")
    return stages
