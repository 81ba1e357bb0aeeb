"""Rule-based explanation surfaces — the reference's no-LLM fallbacks.

Three of the reference's "AI" surfaces carry deterministic rule-based
fallback paths that run when no LLM/API is available; those fallbacks are
the computable spec and live here as JVM expression trees:

* :func:`rule_based_explain` — the recommendation explainer's rule path
  (``backend/app/services/paper_explainer.py:521-611``,
  ``RuleBasedExplainer.explain``): study-type first-match ladder,
  technique multi-match, uppercase gene-symbol regex with the exclude
  wall, query-term relevance factors, and the assembled Korean
  ``why_recommended`` sentence.
* :func:`lite_interpretation` / :func:`interpretation_confidence` — the
  multi-source gene interpreter's LLM-free summary string and its
  evidence-scored confidence ladder
  (``rnaseq_pipeline/rag/enhanced_interpreter.py:547-620``).
* :func:`prediction_recommendations` — the unified predictor's
  recommendation ladder and cancer-code -> binary-model-key routing
  (``rnaseq_pipeline/ml/unified_predictor.py:275-285, 330-360``).

The Korean rule strings are kept verbatim: they ARE the semantics being
matched (same adjudication as the trend/news ladders). Determinism pin:
the reference dedups candidate genes via ``list(set(...))`` (Python hash
order, nondeterministic across runs); here the dedup keeps FIRST-OCCURRENCE
order, which is what CPython produces for short runs seeded identically
and the only replayable choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: paper_explainer.py:527-536 — study-type keyword ladder (first match wins,
#: dict order).
STUDY_TYPE_KEYWORDS: dict[str, list[str]] = {
    "Review": ["review", "overview", "systematic review", "literature review"],
    "Meta-analysis": ["meta-analysis", "meta analysis", "pooled analysis"],
    "Clinical Trial": ["clinical trial", "randomized", "RCT", "phase I", "phase II", "phase III"],
    "Cohort Study": ["cohort", "prospective", "retrospective", "follow-up"],
    "Case Study": ["case report", "case study", "case series"],
    "Basic Research": ["in vitro", "in vivo", "cell line", "mouse model", "animal model"],
    "Bioinformatics": ["RNA-seq", "transcriptome", "TCGA", "GEO", "bioinformatics", "computational"],
}

#: paper_explainer.py:538-546 — technique keyword table (every match kept,
#: dict order).
TECHNIQUE_KEYWORDS: dict[str, list[str]] = {
    "RNA-seq": ["RNA-seq", "RNA sequencing", "transcriptome"],
    "qPCR": ["qPCR", "RT-PCR", "real-time PCR"],
    "Western Blot": ["western blot", "immunoblot"],
    "Immunohistochemistry": ["immunohistochemistry", "IHC"],
    "CRISPR": ["CRISPR", "Cas9", "gene editing"],
    "Flow Cytometry": ["flow cytometry", "FACS"],
    "Machine Learning": ["machine learning", "deep learning", "neural network", "random forest"],
}

#: paper_explainer.py:583 — abbreviations the gene regex must not surface.
GENE_EXCLUDE = ["RNA", "DNA", "PCR", "QPCR", "USA", "FDA", "WHO", "THE", "AND", "FOR"]

#: unified_predictor.py:280-283 — cancer code -> binary model key.
CANCER_MODEL_MAP: dict[str, str] = {"brca": "breast", "paad": "pancreatic"}


from vectordb_bioinsight_spark.functions.text import contains_any as _contains_any


def rule_based_explain(
    df: DataFrame,
    query: str,
    title_col: str = "title",
    content_col: str = "content",
) -> DataFrame:
    """paper_explainer.py:546-611 — RuleBasedExplainer.explain per row.

    Adds ``study_type`` (first matching ladder entry, '연구 논문'
    fallback), ``techniques``/``key_genes`` (comma-joined, genes capped
    at 5, first-occurrence dedup), ``n_relevance_factors`` (query terms
    found in the lowercased text; ``matched_terms`` is not modeled — the
    API passes none on the rule path), and the assembled
    ``why_recommended`` sentence. Pure scan-local expressions: the
    keyword sweeps are ``contains`` chains, the gene dedup is
    ``array_distinct`` (order-preserving in Spark).
    """
    raw = F.concat_ws(" ", F.col(title_col), F.col(content_col))
    text = F.lower(raw)

    study_type = F.lit("연구 논문")
    for stype, kws in reversed(list(STUDY_TYPE_KEYWORDS.items())):
        study_type = F.when(
            _contains_any(text, [k.lower() for k in kws]), F.lit(stype)
        ).otherwise(study_type)

    # lambda-free by design (the landmark_reasons lesson —
    # operators/citations.py): array_compact/filter compile to
    # CodegenFallback lambdas that re-evaluate per consuming column.
    # Technique flags are evaluated once; the joins are concat_ws (skips
    # NULLs) with a prefix-sum gate standing in for the [:2] slice.
    tech_flags = [
        _contains_any(text, [k.lower() for k in kws])
        for kws in TECHNIQUE_KEYWORDS.values()
    ]
    tech_names = list(TECHNIQUE_KEYWORDS)
    tech_parts = [F.when(f, F.lit(n)) for f, n in zip(tech_flags, tech_names)]
    n_techs = sum((F.when(f, 1).otherwise(0) for f in tech_flags), F.lit(0))
    top2_parts, prefix = [], F.lit(0)
    for f, n in zip(tech_flags, tech_names):
        top2_parts.append(F.when(f & (prefix < 2), F.lit(n)))
        prefix = prefix + F.when(f, 1).otherwise(0)

    # gene pipeline stays array-typed but codegen-native throughout:
    # regexp_extract_all -> array_distinct (order-preserving) ->
    # array_except (order-preserving on its first argument, replacing
    # the filter-lambda exclude wall) -> slice.
    genes = F.slice(
        F.array_except(
            F.array_distinct(
                F.regexp_extract_all(raw, F.lit(r"\b([A-Z][A-Z0-9]{1,5})\b"), 1)
            ),
            F.array(*[F.lit(g) for g in GENE_EXCLUDE]),
        ),
        1,
        5,
    )

    q_terms = [t for t in query.lower().split()]
    n_factors = sum(
        (F.when(text.contains(t), 1).otherwise(0) for t in q_terms), F.lit(0)
    )

    why = F.concat(
        F.lit(f"검색어 '{query}'와 관련된 "), study_type, F.lit(" 논문입니다.")
    )
    why = F.when(
        n_techs > 0,
        F.concat(
            why, F.lit(" "), F.concat_ws(", ", *top2_parts),
            F.lit(" 기법을 사용합니다."),
        ),
    ).otherwise(why)
    why = F.when(
        F.size(genes) > 0,
        F.concat(
            why, F.lit(" 주요 유전자: "),
            F.array_join(F.slice(genes, 1, 3), ", "), F.lit("."),
        ),
    ).otherwise(why)

    return (
        df.withColumn("study_type", study_type)
        .withColumn("techniques", F.concat_ws(", ", *tech_parts))
        .withColumn("key_genes", F.array_join(genes, ", "))
        .withColumn("n_relevance_factors", n_factors)
        .withColumn("why_recommended", why)
    )


def interpretation_confidence(
    n_papers: Column,
    any_high_relevance: Column,
    has_external: Column,
    cancer_role: Column,
    has_function: Column,
    n_sources: Column,
) -> Column:
    """enhanced_interpreter.py:588-620 — evidence-scored confidence.

    Literature: >=3 papers +2 (>=1 paper +1), any relevance>0.7 +1.
    External (only when a context was fetched): role known +2, protein
    function present +1, >=3 sources +1. Score >=5 high, >=2 medium,
    else low.
    """
    lit = (
        F.when(n_papers >= 3, 2).when(n_papers >= 1, 1).otherwise(0)
        + F.when(any_high_relevance, 1).otherwise(0)
    )
    ext = (
        F.when(cancer_role != "Unknown", 2).otherwise(0)
        + F.when(has_function, 1).otherwise(0)
        + F.when(n_sources >= 3, 1).otherwise(0)
    )
    score = lit + F.when(has_external, ext).otherwise(0)
    return (
        F.when(score >= 5, F.lit("high"))
        .when(score >= 2, F.lit("medium"))
        .otherwise(F.lit("low"))
    )


def lite_interpretation(
    gene_symbol: Column,
    direction: Column,
    log2fc: Column,
    n_papers: Column,
    has_external: Column,
    cancer_role: Column,
    protein_function: Column,
    actionable: Column,
    cancer_type: str,
) -> Column:
    """enhanced_interpreter.py:547-577 — the LLM-free interpretation string.

    Sentence parts in reference order: the direction header (log2FC
    rendered %.2f — Java and DuckDB printf agree for 2-decimal planted
    values), then (when an external context exists) role / function
    (first 150 chars + '...') / actionable, then the literature count or
    the not-found line. Joined with single spaces.
    """
    cancer_name = cancer_type.replace("_", " ")
    dir_text = F.when(direction == "up", F.lit("상향조절")).otherwise(F.lit("하향조절"))
    head = F.concat(
        gene_symbol, F.lit("은(는) "), F.lit(cancer_name), F.lit("에서 "),
        dir_text, F.lit("됨 (log2FC="), F.format_string("%.2f", log2fc), F.lit(")."),
    )
    role_part = F.when(
        has_external & (cancer_role != "Unknown"),
        F.concat(F.lit("암에서의 역할: "), cancer_role, F.lit(".")),
    )
    func_part = F.when(
        has_external & (protein_function != ""),
        F.concat(F.lit("기능: "), F.substring(protein_function, 1, 150), F.lit("...")),
    )
    act_part = F.when(has_external & actionable, F.lit("치료 표적으로 활용 가능."))
    lit_part = F.when(
        n_papers > 0,
        F.concat(F.lit("관련 문헌 "), n_papers.cast("string"), F.lit("편 발견.")),
    ).otherwise(F.lit("관련 문헌을 찾지 못함."))
    return F.concat_ws(
        " ", head, role_part, func_part, act_part, lit_part
    )


def prediction_recommendations(
    df: DataFrame,
    cancer_col: str = "predicted_cancer",
    confidence_level_col: str = "confidence_level",
    is_unknown_col: str = "is_unknown",
    has_binary_col: str = "has_binary_analysis",
    is_tumor_col: str = "is_tumor",
) -> DataFrame:
    """unified_predictor.py:275-285, 330-360 — recommendations + routing.

    Adds ``binary_model_key`` (lowercased cancer code through the
    brca->breast / paad->pancreatic map; NULL when the sample is
    unknown) and ``recommendations`` (the reference's ladder joined with
    ' | ': the three unknown-sample lines, else the low/medium
    verification lines plus the tumor-vs-normal line when a binary
    analysis ran, always ending with the clinical disclaimer) and
    ``n_recommendations``.
    """
    cancer = F.col(cancer_col)
    level = F.col(confidence_level_col)
    unknown = F.col(is_unknown_col)
    has_binary = F.col(has_binary_col)
    is_tumor = F.col(is_tumor_col)

    key = F.lower(cancer)
    for src, dst in CANCER_MODEL_MAP.items():
        key = F.when(F.lower(cancer) == src, F.lit(dst)).otherwise(key)
    key = F.when(unknown, F.lit(None).cast("string")).otherwise(key)

    recs = F.array_compact(
        F.array(
            F.when(unknown, F.lit("추가 샘플 분석을 통해 데이터 품질 확인")),
            F.when(unknown, F.lit("다른 분석 방법 (예: 조직 병리학) 병행 권장")),
            F.when(unknown, F.lit("샘플이 학습 데이터에 포함되지 않은 희귀 암종일 수 있음")),
            F.when(~unknown & (level == "low"), F.lit("낮은 신뢰도로 인해 추가 검증 권장")),
            F.when(~unknown & level.isin("low", "medium"), F.lit("조직 병리학적 확인 권장")),
            F.when(
                ~unknown & has_binary & is_tumor,
                F.concat(cancer, F.lit(" 특이적 마커 검사 고려")),
            ),
            F.when(
                ~unknown & has_binary & ~is_tumor,
                F.lit("정상 조직 가능성, 종양 여부 재검토"),
            ),
            F.lit("이 분석은 참고용이며 임상 진단을 대체할 수 없습니다"),
        )
    )
    return (
        df.withColumn("binary_model_key", key)
        .withColumn("recommendations", F.array_join(recs, " | "))
        .withColumn("n_recommendations", F.size(recs))
    )
