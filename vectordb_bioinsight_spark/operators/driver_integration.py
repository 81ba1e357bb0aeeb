"""Multi-omic integrated driver-gene scoring — the reference's
IntegratedDriverAgent rule ladder re-expressed as one three-way gene join
plus a scan-local score expression.

Reference: ``rnaseq_pipeline/agents/agent_integrated_driver.py`` —
``_build_gene_profiles`` (:438-515) merges the DEG table, the network hub
table and the per-variant driver-mutation table into per-gene profiles;
``_calculate_integrated_score`` (:533-634) then scores each profile:

* mutation evidence (max 50): min(30, driver_score * 0.5) + 15 hotspot
  bonus + 5 clonal bonus when VAF >= 0.3;
* expression evidence (max 30): |log2FC| tiers (>2 -> 15, >1.5 -> 12,
  >1 -> 8) + padj tiers (<0.001 -> 10, <0.01 -> 7, <0.05 -> 4) + 5 when
  the direction is consistent with a KNOWN gene role (oncogene-up /
  TSG-down, :516-531 over the curated role tables :121-132);
* network evidence (max 20): hub genes add min(15, hub_score * 25);
* +10 multi-omic bonus when mutation AND expression evidence co-occur;
* final score capped at 100; classification thresholds 80/60/40
  (confirmed_driver only with both omics at >= 80), with
  mutation_only / expression_only / insufficient_evidence below.

Spark-first shape: each input table pre-aggregates to one row per gene
(the mutation fold keeps max driver score / max VAF / any-hotspot — the
reference's per-row dict merge), the three aggregates FULL-OUTER join on
the uppercased symbol, and the whole ladder is one JVM expression tree.
One bounded shuffle per input + the gene join; no window, no UDF.

Documented deviation: the reference records the LAST hotspot variant in
row-iteration order (:495-496 — pandas iteration order, not a contract);
the engine keeps max(amino_acid_change) over hotspot rows so the output
is deterministic and replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: agent_integrated_driver.py:121-125
TSG_GENES = [
    "TP53", "RB1", "PTEN", "APC", "BRCA1", "BRCA2", "CDKN2A", "NF1", "NF2",
    "VHL", "STK11", "SMAD4", "ATM", "CHEK2", "CDH1", "ARID1A", "BAP1",
    "FBXW7", "MLH1", "MSH2", "MSH6", "PALB2", "SETD2", "SMARCA4", "WT1",
]

#: agent_integrated_driver.py:127-132
ONCOGENES = [
    "KRAS", "NRAS", "HRAS", "BRAF", "PIK3CA", "EGFR", "ERBB2", "MET", "ALK",
    "ROS1", "RET", "FGFR1", "FGFR2", "FGFR3", "KIT", "PDGFRA", "ABL1", "JAK2",
    "MYC", "MYCN", "CCND1", "CDK4", "CDK6", "MDM2", "BCL2", "CTNNB1", "IDH1",
    "IDH2", "FLT3", "NPM1", "DNMT3A", "SF3B1",
]

CONFIRMED_DRIVER_THRESHOLD = 80  # :116
HIGH_CONFIDENCE_THRESHOLD = 60  # :117
CANDIDATE_THRESHOLD = 40  # :118


def gene_role(gene: Column) -> Column:
    """_get_gene_role (:516-522): TSG / Oncogene / Unknown."""
    return (
        F.when(gene.isin(TSG_GENES), "TSG")
        .when(gene.isin(ONCOGENES), "Oncogene")
        .otherwise("Unknown")
    )


def integrated_driver_scores(
    deg: DataFrame | None,
    hub: DataFrame | None,
    mutations: DataFrame | None,
    gene_col: str = "gene",
) -> DataFrame:
    """Score every gene seen by ANY of the three evidence tables.

    ``deg``: (gene, log2fc, padj[, direction]) — one row per gene;
    direction defaults to the log2fc sign (:455).
    ``hub``: (gene, hub_score).
    ``mutations``: per-VARIANT rows (gene, driver_score, vaf, is_hotspot
    [, amino_acid_change]) — folded per gene here.
    Genes uppercase; empty and ENSG-prefixed ids drop (:447-448, the
    unmapped-Ensembl guard).

    Output: (gene, role, score, classification, has_mutation, has_expr,
    is_hub, mutation_count, mutation_driver_score, mutation_vaf,
    is_hotspot, hotspot_variant, log2fc, padj, direction, hub_score) —
    score rounded 4 dp.
    """

    def _sym(df: DataFrame) -> Column:
        return F.upper(F.col(gene_col).cast("string"))

    frames = []
    if deg is not None:
        direction = (
            F.col("direction")
            if "direction" in deg.columns
            else F.when(F.col("log2fc") > 0, "up").otherwise("down")
        )
        frames.append(
            deg.select(
                _sym(deg).alias("gene"),
                F.lit(True).alias("has_expr"),
                F.col("log2fc").cast("double").alias("log2fc"),
                F.col("padj").cast("double").alias("padj"),
                direction.alias("direction"),
            )
            .filter((F.col("gene") != "") & ~F.col("gene").startswith("ENSG"))
            .groupBy("gene")
            .agg(
                F.max("has_expr").alias("has_expr"),
                F.max("log2fc").alias("log2fc"),
                F.min("padj").alias("padj"),
                F.max("direction").alias("direction"),
            )
        )
    if hub is not None:
        frames.append(
            hub.select(
                _sym(hub).alias("gene"),
                F.col("hub_score").cast("double").alias("hub_score"),
            )
            .filter((F.col("gene") != "") & ~F.col("gene").startswith("ENSG"))
            .groupBy("gene")
            .agg(F.max("hub_score").alias("hub_score"))
            .withColumn("is_hub", F.lit(True))
        )
    if mutations is not None:
        aa = (
            F.col("amino_acid_change").cast("string")
            if "amino_acid_change" in mutations.columns
            else F.lit("")
        )
        frames.append(
            mutations.select(
                _sym(mutations).alias("gene"),
                F.col("driver_score").cast("double").alias("_ds"),
                F.col("vaf").cast("double").alias("_vaf"),
                F.col("is_hotspot").cast("boolean").alias("_hot"),
                aa.alias("_aa"),
            )
            .filter(F.col("gene") != "")
            .groupBy("gene")
            .agg(
                F.lit(True).alias("has_mutation"),
                F.count("*").cast("long").alias("mutation_count"),
                F.max("_ds").alias("mutation_driver_score"),
                F.max("_vaf").alias("mutation_vaf"),
                F.max(F.coalesce(F.col("_hot"), F.lit(False))).alias("is_hotspot"),
                F.max(F.when(F.col("_hot"), F.col("_aa"))).alias("hotspot_variant"),
            )
        )
    if not frames:
        raise ValueError("at least one evidence table is required")
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, "gene", "full_outer")
    for c, default in [
        ("has_expr", F.lit(False)), ("log2fc", F.lit(None).cast("double")),
        ("padj", F.lit(None).cast("double")), ("direction", F.lit(None).cast("string")),
        ("is_hub", F.lit(False)), ("hub_score", F.lit(None).cast("double")),
        ("has_mutation", F.lit(False)), ("mutation_count", F.lit(0).cast("long")),
        ("mutation_driver_score", F.lit(None).cast("double")),
        ("mutation_vaf", F.lit(None).cast("double")),
        ("is_hotspot", F.lit(False)), ("hotspot_variant", F.lit(None).cast("string")),
    ]:
        if c not in out.columns:
            out = out.withColumn(c, default)
        else:
            out = out.withColumn(c, F.coalesce(F.col(c), default))

    has_mut = F.col("has_mutation")
    has_expr = F.col("has_expr")
    role = gene_role(F.col("gene"))
    mut_pts = F.when(
        has_mut,
        F.least(F.lit(30.0), F.coalesce(F.col("mutation_driver_score"), F.lit(0.0)) * 0.5)
        + F.when(F.col("is_hotspot"), 15.0).otherwise(0.0)
        + F.when(F.coalesce(F.col("mutation_vaf"), F.lit(0.0)) >= 0.3, 5.0).otherwise(0.0),
    ).otherwise(0.0)
    l2 = F.abs(F.coalesce(F.col("log2fc"), F.lit(0.0)))
    padj = F.coalesce(F.col("padj"), F.lit(1.0))
    consistent = (
        F.when(role == "Oncogene", F.col("direction") == "up")
        .when(role == "TSG", F.col("direction") == "down")
        .otherwise(F.lit(True))
    )
    expr_pts = F.when(
        has_expr,
        F.when(l2 > 2, 15.0).when(l2 > 1.5, 12.0).when(l2 > 1, 8.0).otherwise(0.0)
        + F.when(padj < 0.001, 10.0).when(padj < 0.01, 7.0).when(padj < 0.05, 4.0).otherwise(0.0)
        # the +5 requires BOTH consistency and a known role (:595-600)
        + F.when(F.coalesce(consistent, F.lit(False)) & (role != "Unknown"), 5.0).otherwise(0.0),
    ).otherwise(0.0)
    net_pts = F.when(
        F.col("is_hub"),
        F.least(F.lit(15.0), F.coalesce(F.col("hub_score"), F.lit(0.0)) * 25.0),
    ).otherwise(0.0)
    multi = F.when(has_mut & has_expr, 10.0).otherwise(0.0)
    score = F.least(F.lit(100.0), mut_pts + expr_pts + net_pts + multi)
    classification = (
        F.when(
            score >= CONFIRMED_DRIVER_THRESHOLD,
            F.when(has_mut & has_expr, "confirmed_driver").otherwise("high_confidence"),
        )
        .when(score >= HIGH_CONFIDENCE_THRESHOLD, "high_confidence")
        .when(score >= CANDIDATE_THRESHOLD, "candidate")
        .when(has_mut, "mutation_only")
        .when(has_expr, "expression_only")
        .otherwise("insufficient_evidence")
    )
    return out.select(
        "gene",
        role.alias("role"),
        F.round(score, 4).alias("score"),
        classification.alias("classification"),
        "has_mutation", "has_expr", "is_hub",
        "mutation_count", "mutation_driver_score", "mutation_vaf",
        "is_hotspot", "hotspot_variant",
        "log2fc", "padj", "direction", "hub_score",
    )
