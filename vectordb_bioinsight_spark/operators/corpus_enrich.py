"""Corpus-enrichment extractors and the paper quality scorer — the
remaining deterministic surfaces of the reference's core-corpus builder
(``backend/app/core/corpus_builder.py``), Spark-first:

* :func:`paper_quality_score` — QualityScorer.score (:407-487): article-
  type priority x 40, MeSH-count x 15, abstract-length tiers, recency
  tiers, optional disease-relevance tiers.
* :func:`extract_genes` — GeneExtractor (:489-529): uppercase-symbol
  regex + the curated known-gene wall, digit-bearing fallback.
* :func:`extract_pathways` — PathwayExtractor (:531-572): ordered
  substring sweep over the pathway keyword list.

All three are scan-local expression trees (zero shuffle); the extractors
emit SORTED/ordered CSV strings so catalog outputs stay scalar-typed for
cross-engine hashing (the token_doc_index convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.briefing import (
    ARTICLE_TYPE_PRIORITY,
    article_type_classify,
)

#: corpus_builder.py:493-495
GENE_PATTERN = r"\b([A-Z][A-Z0-9]{1,5}(?:-[A-Z0-9]+)?)\b"

#: corpus_builder.py:497-508 (curated biomarker subset)
KNOWN_GENES = [
    "DRD4", "DRD5", "DAT1", "SLC6A3", "SLC6A4", "COMT", "SNAP25",
    "BDNF", "HTR1B", "HTR2A", "CHRNA4", "ADRA2A", "DBH", "TPH2",
    "MAOA", "FOXP2", "CNTNAP2", "NRXN1", "SHANK3",
    "KRAS", "BRAF", "TP53", "EGFR", "HER2", "BRCA1", "BRCA2",
    "PIK3CA", "PTEN", "AKT1", "MYC", "RB1", "CDKN2A", "SMAD4",
    "MTHFR", "CYP2D6", "CYP2C19", "CYP3A4", "ABCB1",
]

#: corpus_builder.py:534-562 (list ORDER is the output order)
PATHWAY_KEYWORDS = [
    "dopamine pathway", "dopaminergic",
    "norepinephrine pathway", "noradrenergic",
    "serotonin pathway", "serotonergic",
    "glutamate pathway", "glutamatergic",
    "GABA pathway", "GABAergic",
    "PI3K/AKT", "PI3K-AKT",
    "MAPK pathway", "ERK pathway",
    "Wnt pathway", "Wnt signaling",
    "Notch pathway", "Notch signaling",
    "JAK-STAT", "JAK/STAT",
    "NF-kB", "NF-kappaB",
    "TGF-beta", "TGF-B",
    "glycolysis", "gluconeogenesis",
    "oxidative phosphorylation",
    "fatty acid metabolism",
    "reward pathway", "mesolimbic",
    "prefrontal cortex", "striatum",
    "default mode network", "DMN",
    "executive function",
]


def extract_genes(text: Column) -> Column:
    """Gene symbols as a sorted CSV (GeneExtractor.extract, :510-529):
    every GENE_PATTERN hit kept when it is in the known-gene wall OR is a
    >= 3-char candidate containing a digit; de-duplicated, sorted."""
    cands = F.array_distinct(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(GENE_PATTERN), 1))
    kept = F.filter(
        cands,
        lambda c: c.isin(KNOWN_GENES)
        | ((F.length(c) >= 3) & c.rlike("[0-9]")),
    )
    return F.array_join(F.array_sort(kept), ",")


def extract_pathways(text: Column) -> Column:
    """Pathway mentions as a CSV in PATHWAY_KEYWORDS order
    (PathwayExtractor.extract, :564-572): case-insensitive substring."""
    low = F.lower(F.coalesce(text, F.lit("")))
    hits = F.filter(
        F.array(*[F.lit(p) for p in PATHWAY_KEYWORDS]),
        lambda p: low.contains(F.lower(p)),
    )
    return F.array_join(hits, ",")


def paper_quality_score(
    df: DataFrame,
    id_col: str,
    pub_types_col: str,
    mesh_terms_col: str,
    abstract_col: str,
    year_col: str,
    current_year: int,
    match_has_primary_col: str | None = None,
    match_score_col: str | None = None,
) -> DataFrame:
    """QualityScorer.score (:420-487) per paper:

    * article type: priority weight x 40 (via the classify ladder);
    * MeSH: min(n/10, 1) x 15 when any terms;
    * abstract length tiers 20/15/10/5 (>1500/>800/>300/>100 chars);
    * recency tiers 15/12/8/3 by age vs ``current_year`` (the reference
      reads datetime.now() :458 — parameterized here so results replay;
      non-numeric years skip the tier, the reference's ValueError pass);
    * optional disease relevance 10/7/4 (has_primary / score > 0.5 /
      > 0.2) from precomputed vocabulary match columns
      (operators/vocabulary.py is the engine's match_score analog).

    Output: (id, article_type, quality_score) — score capped 100,
    rounded 4 dp.
    """
    typed = article_type_classify(df, id_col, pub_types_col).withColumnRenamed(
        "id", "_id"
    )
    j = df.join(typed, F.col(id_col) == F.col("_id")).drop("_id")
    type_prio = F.col("type_priority")
    mesh = F.coalesce(F.col(mesh_terms_col), F.array().cast("array<string>"))
    mesh_pts = F.when(
        F.size(mesh) > 0,
        F.least(F.size(mesh).cast("double") / 10.0, F.lit(1.0)) * 15.0,
    ).otherwise(0.0)
    alen = F.length(F.coalesce(F.col(abstract_col), F.lit("")))
    abs_pts = (
        F.when(alen > 1500, 20.0).when(alen > 800, 15.0)
        .when(alen > 300, 10.0).when(alen > 100, 5.0).otherwise(0.0)
    )
    yr = F.col(year_col).cast("string").try_cast("int")
    age = F.lit(current_year) - yr
    rec_pts = F.when(
        yr.isNull() | (F.col(year_col).cast("string") == ""), 0.0
    ).otherwise(
        F.when(age <= 2, 15.0).when(age <= 5, 12.0).when(age <= 10, 8.0).otherwise(3.0)
    )
    rel_pts = F.lit(0.0)
    if match_has_primary_col is not None and match_score_col is not None:
        rel_pts = (
            F.when(F.coalesce(F.col(match_has_primary_col), F.lit(False)), 10.0)
            .when(F.coalesce(F.col(match_score_col), F.lit(0.0)) > 0.5, 7.0)
            .when(F.coalesce(F.col(match_score_col), F.lit(0.0)) > 0.2, 4.0)
            .otherwise(0.0)
        )
    score = F.least(
        F.lit(100.0), type_prio * 40.0 + mesh_pts + abs_pts + rec_pts + rel_pts
    )
    return j.select(
        F.col(id_col).alias("id"),
        "article_type",
        F.round(score, 4).alias("quality_score"),
    )
