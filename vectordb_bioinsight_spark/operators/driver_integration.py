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


def literature_support_col(
    is_cosmic_tier1: Column,
    is_intogen: Column,
    is_pancancer: Column,
    is_cosmic_tier2: Column,
    in_gene_roles: Column,
    is_emerging_regulator: Column,
) -> Column:
    """get_literature_support (driver_predictor.py:403-448): the database-
    presence heuristic ladder. COSMIC Tier1 (with or without IntOGen) ->
    well_established; IntOGen-this-cancer / pan-cancer / Tier2 / any
    known role / curated emerging list -> emerging; else uncharacterized.
    The flags are DIM columns here — the reference's curated tables are
    data, not logic."""
    t = F.coalesce
    return (
        F.when(t(is_cosmic_tier1, F.lit(False)), "well_established")
        .when(t(is_intogen, F.lit(False)), "emerging")
        .when(t(is_pancancer, F.lit(False)), "emerging")
        .when(t(is_cosmic_tier2, F.lit(False)), "emerging")
        .when(t(in_gene_roles, F.lit(False)), "emerging")
        .when(t(is_emerging_regulator, F.lit(False)), "emerging")
        .otherwise("uncharacterized")
    )


def _validation_suggestion(gene: Column, hotspots: Column, cosmic_tier: Column,
                           cosmic_role: Column) -> "tuple[Column, Column]":
    """get_validation_suggestion (driver_predictor.py:484-511): hotspot-
    string dispatch (codon 12/13, V600, exon panels) else role-based NGS
    defaults else the expression-correlation fallback."""
    hs3 = F.array_join(F.slice(hotspots, 1, 3), ", ")
    has_hs = F.coalesce(F.size(hotspots) > 0, F.lit(False))
    method = F.when(
        has_hs,
        F.when(hs3.contains("G12") | hs3.contains("G13"), "PCR/Sanger")
        .when(hs3.contains("V600"), "PCR/Sanger")
        .otherwise("Targeted NGS"),
    ).otherwise(
        F.when(cosmic_tier.isNotNull(), "Targeted NGS").otherwise(
            "WES/RNA-seq validation"
        )
    )
    detail = F.when(
        has_hs,
        F.when(
            hs3.contains("G12") | hs3.contains("G13"),
            F.concat(gene, F.lit(" codon 12/13 hotspot sequencing")),
        )
        .when(hs3.contains("V600"), F.concat(gene, F.lit(" V600 mutation detection")))
        .when(F.lower(hs3).contains("exon"), F.concat(gene, F.lit(" exon sequencing")))
        .otherwise(F.concat(gene, F.lit(" hotspot panel ("), hs3, F.lit(")"))),
    ).otherwise(
        F.when(
            cosmic_tier.isNotNull(),
            F.when(
                cosmic_role == "TSG",
                F.concat(gene, F.lit(" full gene sequencing (TSG)")),
            ).otherwise(F.concat(gene, F.lit(" kinase domain / hotspot panel"))),
        ).otherwise(F.concat(gene, F.lit(" expression-mutation correlation")))
    )
    return method, detail


def two_track_driver_scores(
    gene_data: DataFrame,
    driver_db: DataFrame,
) -> DataFrame:
    """The DriverPredictor's two scoring tracks (driver_predictor.py:
    764-943) as one broadcast dim join + scan-local ladders + union.

    ``gene_data``: (gene, log2fc, padj, direction, is_hub, hub_score,
    pathway_count, db_matched) — the per-gene evidence table the
    reference assembles in ``_prepare_gene_data`` (:702-762).
    ``driver_db``: curated dimension (gene, is_known, cosmic_tier,
    cosmic_role, tcga_freq, tcga_count, hotspots array<string>,
    is_intogen, is_pancancer, pancancer_cancers array<string>,
    is_cosmic_tier1, is_cosmic_tier2, in_gene_roles,
    is_emerging_regulator) — the reference loads this from COSMIC /
    IntOGen / curated files (:103-290); here it broadcasts as a dim.

    KNOWN track (:764-843, genes with is_known): COSMIC tier 25/15,
    TCGA min(25, freq*50), |log2FC| 25/20/10 (>2/>1/>0.5), padj 15/12/8,
    +10 hub; validation suggestion from the hotspot dispatch.
    CANDIDATE-REGULATOR track (:844-943, not known, |log2FC| >= 1 and
    padj <= 0.05): |log2FC| 30/25/20/15 (>3/>2/>1.5/>1), hub 30 /
    hub_score>0.5 -> 20 / >0.3 -> 10, padj 20/15/10/5
    (<1e-4/<1e-3/<0.01/<0.05), pathway min(10, count*2), +10 db match;
    kept only at total >= 40; validation method by literature-support
    ladder (emerging -> literature+functional, pan-cancer ->
    cross-cancer, else functional).

    Output: (gene, track, score, log2fc, padj, direction, is_hub,
    hub_score, cosmic_tier, cosmic_role, tcga_mutation_freq,
    literature_support, is_pancancer_driver, validation_method,
    validation_detail) — score/tcga freq rounded 4 dp.
    """
    j = gene_data.join(F.broadcast(driver_db), "gene", "left")
    gene = F.col("gene")
    l2 = F.abs(F.coalesce(F.col("log2fc"), F.lit(0.0)))
    padj = F.coalesce(F.col("padj"), F.lit(1.0))
    is_known = F.coalesce(F.col("is_known"), F.lit(False))
    lit = literature_support_col(
        F.col("is_cosmic_tier1"), F.col("is_intogen"), F.col("is_pancancer"),
        F.col("is_cosmic_tier2"), F.col("in_gene_roles"),
        F.col("is_emerging_regulator"),
    )
    is_pan = F.coalesce(F.col("is_pancancer"), F.lit(False))

    cosmic_score = F.when(F.col("cosmic_tier").isNull(), 0.0).when(
        F.col("cosmic_tier") == "Tier1", 25.0
    ).otherwise(15.0)
    tcga_score = F.least(F.lit(25.0), F.coalesce(F.col("tcga_freq"), F.lit(0.0)) * 50.0)
    known_expr = F.when(l2 > 2, 25.0).when(l2 > 1, 20.0).when(l2 > 0.5, 10.0).otherwise(0.0)
    known_sig = F.when(padj < 0.001, 15.0).when(padj < 0.01, 12.0).when(padj < 0.05, 8.0).otherwise(0.0)
    hub_bonus = F.when(F.coalesce(F.col("is_hub"), F.lit(False)), 10.0).otherwise(0.0)
    known_score = cosmic_score + tcga_score + known_expr + known_sig + hub_bonus
    kv_method, kv_detail = _validation_suggestion(
        gene, F.col("hotspots"), F.col("cosmic_tier"), F.col("cosmic_role")
    )
    known = j.filter(is_known).select(
        gene, F.lit("known").alias("track"),
        F.round(known_score, 4).alias("score"),
        "log2fc", "padj", "direction", "is_hub", "hub_score",
        "cosmic_tier", "cosmic_role",
        F.round(F.coalesce(F.col("tcga_freq"), F.lit(0.0)), 4).alias("tcga_mutation_freq"),
        lit.alias("literature_support"),
        is_pan.alias("is_pancancer_driver"),
        kv_method.alias("validation_method"),
        kv_detail.alias("validation_detail"),
    )

    novel_expr = (
        F.when(l2 > 3, 30.0).when(l2 > 2, 25.0).when(l2 > 1.5, 20.0)
        .when(l2 > 1, 15.0).otherwise(0.0)
    )
    hubv = F.coalesce(F.col("hub_score"), F.lit(0.0))
    novel_hub = (
        F.when(F.coalesce(F.col("is_hub"), F.lit(False)), 30.0)
        .when(hubv > 0.5, 20.0).when(hubv > 0.3, 10.0).otherwise(0.0)
    )
    novel_sig = (
        F.when(padj < 0.0001, 20.0).when(padj < 0.001, 15.0)
        .when(padj < 0.01, 10.0).when(padj < 0.05, 5.0).otherwise(0.0)
    )
    pathway_score = F.least(
        F.lit(10.0), F.coalesce(F.col("pathway_count"), F.lit(0)).cast("double") * 2.0
    )
    db_score = F.when(F.coalesce(F.col("db_matched"), F.lit(False)), 10.0).otherwise(0.0)
    novel_score = novel_expr + novel_hub + novel_sig + pathway_score + db_score
    nv_method = (
        F.when(lit == "emerging", "Literature validation + Functional")
        .when(is_pan, "Cross-cancer validation")
        .otherwise("Functional validation")
    )
    nv_detail = (
        F.when(
            lit == "emerging",
            F.concat(gene, F.lit(": Review existing literature, then knockdown/overexpression assay")),
        )
        .when(
            is_pan,
            F.concat(
                gene, F.lit(": Compare with "),
                F.array_join(F.slice(F.coalesce(F.col("pancancer_cancers"),
                                                F.array().cast("array<string>")), 1, 2), ", "),
                F.lit(" datasets"),
            ),
        )
        .otherwise(F.concat(gene, F.lit(" knockdown/overexpression + phenotype assay")))
    )
    novel = (
        j.filter(~is_known & (l2 >= 1.0) & (padj <= 0.05))
        .filter(novel_score >= 40.0)
        .select(
            gene, F.lit("candidate_regulator").alias("track"),
            F.round(novel_score, 4).alias("score"),
            "log2fc", "padj", "direction", "is_hub", "hub_score",
            "cosmic_tier", "cosmic_role",
            F.round(F.coalesce(F.col("tcga_freq"), F.lit(0.0)), 4).alias("tcga_mutation_freq"),
            lit.alias("literature_support"),
            is_pan.alias("is_pancancer_driver"),
            nv_method.alias("validation_method"),
            nv_detail.alias("validation_detail"),
        )
    )
    return known.unionByName(novel)
