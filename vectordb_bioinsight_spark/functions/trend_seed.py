"""A seed table of oncology research trends, shipped as a data asset.

The reference defines trends FIRST (keywords + gene symbols + MeSH terms
per trend, grouped into six categories) and maps papers TO them
(backend/app/core/oncology_trends.py:32-135, 143-309) — the inverse of
"cluster papers and call the clusters trends". This module packages the
same *shape* of asset from PUBLIC oncology knowledge (every topic below
is a widely-published research direction; nothing is copied from the
reference's entry list — overlap is inevitable because both enumerate
the field's well-known trends).

Shape notes:

* ``TREND_SEED`` maps trend_id -> (display name, category, keywords,
  gene symbols, MeSH-style terms). Keyword ORDER matters: the matcher's
  title bonus applies to the first three keywords only
  (oncology_trends.py:93-96), so each entry leads with its most
  distinctive phrases.
* The dimension is ~16 rows — broadcast-sized by construction; the
  matcher cross-joins it against the corpus and every per-pair score is
  one JVM expression tree (operators/trend_match.py).
* Gene symbols are matched with word-boundary regexes, so they must be
  plain alphanumerics (asserted at dimension build).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

#: six high-level categories (oncology_trends.py:21-29 analog)
TREND_CATEGORIES = (
    "tumor_evolution",
    "immunotherapy",
    "precision_medicine",
    "cancer_prevention",
    "treatment_resistance",
    "emerging_targets",
)

#: trend_id -> (name, category, keywords, gene_symbols, mesh_terms)
TREND_SEED: "dict[str, tuple[str, str, list[str], list[str], list[str]]]" = {
    # === tumor evolution & plasticity ===
    "lineage_plasticity": (
        "Lineage Plasticity & Cell State Transitions", "tumor_evolution",
        ["lineage plasticity", "cell state transition", "phenotypic plasticity",
         "neuroendocrine differentiation", "transdifferentiation",
         "epithelial-mesenchymal", "EMT", "dedifferentiation", "cell fate"],
        ["SOX2", "ASCL1", "NEUROD1", "RB1", "TP53"],
        ["cell plasticity"],
    ),
    "ecdna": (
        "Extrachromosomal DNA (ecDNA)", "tumor_evolution",
        ["extrachromosomal DNA", "ecDNA", "circular DNA", "double minute",
         "chromothripsis", "oncogene amplification"],
        ["MYC", "EGFR", "MDM2"],
        ["gene amplification"],
    ),
    "clonal_evolution": (
        "Clonal Evolution & Heterogeneity", "tumor_evolution",
        ["clonal evolution", "tumor heterogeneity", "subclonal",
         "phylogenetic reconstruction", "clonal hematopoiesis"],
        ["DNMT3A", "TET2", "ASXL1"],
        ["clonal evolution"],
    ),
    # === immunotherapy & TME ===
    "car_t": (
        "CAR-T & Engineered Cell Therapy", "immunotherapy",
        ["CAR-T", "chimeric antigen receptor", "adoptive cell therapy",
         "engineered T cell", "armored CAR"],
        ["CD19", "BCMA", "CD22"],
        ["immunotherapy, adoptive"],
    ),
    "bispecifics": (
        "Bispecific Antibodies & T-cell Engagers", "immunotherapy",
        ["bispecific antibody", "T-cell engager", "BiTE", "dual targeting"],
        ["CD3", "CD20"],
        ["antibodies, bispecific"],
    ),
    "checkpoint_biology": (
        "Immune Checkpoint Biology & Evasion", "immunotherapy",
        ["immune checkpoint", "checkpoint blockade", "immune evasion",
         "PD-1", "PD-L1", "CTLA-4", "antigen presentation"],
        ["PDCD1", "CD274", "CTLA4", "JAK1", "JAK2", "B2M"],
        ["immune checkpoint inhibitors"],
    ),
    "tertiary_lymphoid": (
        "Tertiary Lymphoid Structures", "immunotherapy",
        ["tertiary lymphoid structure", "tertiary lymphoid structures",
         "B cell follicle", "ectopic lymphoid"],
        ["CXCL13", "CCL19"],
        ["tumor microenvironment"],
    ),
    # === precision medicine ===
    "adc": (
        "Antibody-Drug Conjugates", "precision_medicine",
        ["antibody-drug conjugate", "ADC payload", "trastuzumab deruxtecan",
         "sacituzumab govitecan", "bystander effect"],
        ["ERBB2", "TACSTD2"],
        ["immunoconjugates"],
    ),
    "ctdna_mrd": (
        "ctDNA & Minimal Residual Disease", "precision_medicine",
        ["circulating tumor DNA", "ctDNA", "liquid biopsy",
         "minimal residual disease", "MRD", "molecular relapse"],
        [],
        ["circulating tumor dna"],
    ),
    "spatial_profiling": (
        "Spatial & Single-Cell Profiling", "precision_medicine",
        ["spatial transcriptomics", "single-cell RNA", "spatial proteomics",
         "cell atlas", "multiomic profiling"],
        [],
        ["single-cell analysis"],
    ),
    # === cancer prevention ===
    "early_detection": (
        "Multi-Cancer Early Detection", "cancer_prevention",
        ["early detection", "multi-cancer early detection", "MCED",
         "screening test", "cancer interception"],
        [],
        ["early detection of cancer"],
    ),
    "microbiome": (
        "Microbiome & Cancer Risk", "cancer_prevention",
        ["microbiome", "gut microbiota", "microbial signature",
         "fusobacterium"],
        [],
        ["gastrointestinal microbiome"],
    ),
    # === treatment resistance ===
    "persisters": (
        "Drug-Tolerant Persister Cells", "treatment_resistance",
        ["drug-tolerant persister", "persister cell", "tumor dormancy",
         "adaptive resistance", "residual disease state"],
        ["AXL", "GPX4"],
        ["drug resistance, neoplasm"],
    ),
    "resistance_mutations": (
        "Acquired Resistance Mutations", "treatment_resistance",
        ["acquired resistance", "resistance mutation", "gatekeeper mutation",
         "bypass signaling", "on-target resistance"],
        ["EGFR", "ALK", "MET", "ESR1"],
        ["drug resistance, neoplasm"],
    ),
    # === emerging targets ===
    "kras_targeting": (
        "Direct KRAS Targeting", "emerging_targets",
        ["KRAS G12C", "KRAS inhibitor", "sotorasib", "adagrasib",
         "RAS pathway", "pan-KRAS"],
        ["KRAS", "SOS1", "PTPN11"],
        ["proto-oncogene proteins p21(ras)"],
    ),
    "degraders": (
        "Targeted Protein Degradation", "emerging_targets",
        ["targeted protein degradation", "PROTAC", "molecular glue",
         "degrader", "induced proximity"],
        ["CRBN", "VHL"],
        ["proteolysis"],
    ),
    "synthetic_lethality": (
        "Synthetic Lethality", "emerging_targets",
        ["synthetic lethality", "PARP inhibitor",
         "homologous recombination deficiency", "BRCAness", "replication stress"],
        ["BRCA1", "BRCA2", "PARP1", "WRN", "POLQ"],
        ["synthetic lethal mutations"],
    ),
}


def trend_seed_rows() -> "list[tuple]":
    """Flatten the seed to dimension rows.

    Returns (trend_rank, trend_id, trend_name, category, keywords, top3,
    genes, mesh) with keywords/genes/mesh LOWERCASED (the matcher scores
    over lowered text — oncology_trends.py:70) and top3 = the first three
    keywords (title-bonus slice, oncology_trends.py:93-96). trend_rank is
    the seed's insertion order: the reference's stable sort keeps dict
    order on score ties, so the rank is the deterministic tie-break.
    """
    rows = []
    for rank, (tid, (name, cat, kws, genes, mesh)) in enumerate(TREND_SEED.items()):
        assert cat in TREND_CATEGORIES, cat
        for g in genes:  # word-boundary regexes need plain alphanumerics
            assert g.isalnum(), g
        kws_l = [k.lower() for k in kws]
        rows.append((
            rank, tid, name, cat,
            kws_l, kws_l[:3],
            [g.lower() for g in genes],
            [m.lower() for m in mesh],
        ))
    return rows


#: per-session cache of the seed-dim DataFrame: the dim is a CONSTANT from
#: code (never derived from input data), and createDataFrame of its 16
#: array-typed rows costs ~0.2-0.3 s of py4j conversion per call (r10).
#: Keyed WEAKLY on the live SparkSession object (ADVICE r10: id(sc) values
#: can be reused after GC, handing a later session a DataFrame bound to a
#: stopped context, and dead-session entries were never evicted — a weak
#: key dies with its session); the stopped-context guard covers a session
#: whose context was stopped while the wrapper object stays alive.
_DIM_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def trend_dimension(spark: SparkSession) -> DataFrame:
    """The broadcast-sized trend dimension (~16 rows)."""
    cached = _DIM_CACHE.get(spark)
    if cached is None or getattr(spark.sparkContext, "_jsc", None) is None:
        cached = spark.createDataFrame(
            trend_seed_rows(),
            "trend_rank int, trend_id string, trend_name string, category string, "
            "keywords array<string>, top3 array<string>, "
            "genes array<string>, mesh array<string>",
        )
        _DIM_CACHE[spark] = cached
    return cached
