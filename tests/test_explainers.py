"""Rule-based explanation tier (operators/explainers.py) — pinned against
direct python ports of the reference's fallback paths
(paper_explainer.py:521-611, enhanced_interpreter.py:547-620,
unified_predictor.py:275-285, 330-360)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.explainers import (
    CANCER_MODEL_MAP,
    GENE_EXCLUDE,
    STUDY_TYPE_KEYWORDS,
    TECHNIQUE_KEYWORDS,
    interpretation_confidence,
    lite_interpretation,
    prediction_recommendations,
    rule_based_explain,
)


# --- python port of RuleBasedExplainer.explain (the fuzz oracle). The one
# deviation from the reference is pinned in the operator docstring: gene
# dedup keeps first-occurrence order (the reference's list(set(...)) is
# hash-order nondeterministic and unreplayable). ------------------------

def _port_explain(query, title, content):
    text = f"{title} {content}".lower()
    study_type = "연구 논문"
    for stype, keywords in STUDY_TYPE_KEYWORDS.items():
        if any(kw.lower() in text for kw in keywords):
            study_type = stype
            break
    techniques = [
        tech
        for tech, keywords in TECHNIQUE_KEYWORDS.items()
        if any(kw.lower() in text for kw in keywords)
    ]
    seen, potential = set(), []
    for g in re.findall(r"\b([A-Z][A-Z0-9]{1,5})\b", f"{title} {content}"):
        if g not in seen:
            seen.add(g)
            potential.append(g)
    key_genes = [g for g in potential if g not in set(GENE_EXCLUDE)][:5]
    n_factors = sum(1 for term in query.lower().split() if term in text)
    why = f"검색어 '{query}'와 관련된 {study_type} 논문입니다."
    if techniques:
        why += f" {', '.join(techniques[:2])} 기법을 사용합니다."
    if key_genes:
        why += f" 주요 유전자: {', '.join(key_genes[:3])}."
    return study_type, techniques, key_genes, n_factors, why


_CASES = [
    ("cancer gene therapy", "A systematic review of TP53", "tumor suppressor gene therapy"),
    ("cancer gene therapy", "Meta-analysis of BRCA1 qPCR", "pooled analysis of cancer"),
    ("kras inhibition", "Phase II randomized trial", "KRAS G12C CRISPR Cas9 and FACS panel"),
    ("microbiome", "An untyped note", "lowercase words only, no hits"),
    ("rna dna", "RNA DNA PCR FDA WHO THE AND FOR", "only excluded symbols here"),
    ("cohort", "Retrospective follow-up with IHC", "immunohistochemistry and western blot on EGFR MYC AKT1 STAT3 JAK2 BRAF"),
    ("tcga", "TCGA transcriptome machine learning", "deep learning random forest"),
]


def test_rule_based_explain_matches_port(spark):
    for query, title, content in _CASES:
        df = spark.createDataFrame([(title, content)], "title string, content string")
        row = rule_based_explain(df, query).collect()[0]
        stype, techs, genes, n, why = _port_explain(query, title, content)
        assert row["study_type"] == stype, (title, row["study_type"], stype)
        assert row["techniques"] == ", ".join(techs), title
        assert row["key_genes"] == ", ".join(genes), (title, row["key_genes"], genes)
        assert row["n_relevance_factors"] == n, title
        assert row["why_recommended"] == why, (title, row["why_recommended"], why)


def test_gene_cap_and_exclude_wall(spark):
    title = "RNA DNA TP53 BRCA1 KRAS EGFR MYC AKT1 STAT3"
    df = spark.createDataFrame([(title, "")], "title string, content string")
    row = rule_based_explain(df, "x").collect()[0]
    # excluded RNA/DNA dropped, first-occurrence order, capped at 5
    assert row["key_genes"] == "TP53, BRCA1, KRAS, EGFR, MYC"


# --- interpreter confidence + lite string --------------------------------

def _port_confidence(n_papers, high_rel, ext, role, func, n_src):
    score = 2 if n_papers >= 3 else 1 if n_papers >= 1 else 0
    score += 1 if high_rel else 0
    if ext:
        score += 2 if role != "Unknown" else 0
        score += 1 if func else 0
        score += 1 if n_src >= 3 else 0
    return "high" if score >= 5 else "medium" if score >= 2 else "low"


def _port_lite(gene, direction, log2fc, n_papers, ext, role, func, actionable):
    dir_text = "상향조절" if direction == "up" else "하향조절"
    parts = [f"{gene}은(는) breast cancer에서 {dir_text}됨 (log2FC={log2fc:.2f})."]
    if ext:
        if role != "Unknown":
            parts.append(f"암에서의 역할: {role}.")
        if func:
            parts.append(f"기능: {func[:150]}...")
        if actionable:
            parts.append("치료 표적으로 활용 가능.")
    if n_papers:
        parts.append(f"관련 문헌 {n_papers}편 발견.")
    else:
        parts.append("관련 문헌을 찾지 못함.")
    return " ".join(parts)


def test_confidence_and_lite_match_port(spark):
    rows = []
    i = 0
    for n_papers in [0, 1, 3]:
        for ext in [True, False]:
            for role in ["Oncogene", "Unknown"]:
                rows.append(
                    (f"G{i}", 1.5 if i % 2 == 0 else -0.25, n_papers, i % 3 == 0,
                     ext, role, "kinase regulator" if i % 2 == 0 else "", i % 5,
                     i % 4 == 0)
                )
                i += 1
    df = spark.createDataFrame(
        rows,
        "gene string, log2fc double, n_papers int, high_rel boolean, "
        "ext boolean, role string, func string, n_src int, act boolean",
    )
    out = df.select(
        "gene",
        interpretation_confidence(
            F.col("n_papers"), F.col("high_rel"), F.col("ext"),
            F.col("role"), F.col("func") != "", F.col("n_src"),
        ).alias("conf"),
        lite_interpretation(
            F.col("gene"),
            F.when(F.col("log2fc") >= 0, "up").otherwise("down"),
            F.col("log2fc"), F.col("n_papers"), F.col("ext"), F.col("role"),
            F.col("func"), F.col("act"), "breast_cancer",
        ).alias("interp"),
    ).collect()
    got = {r["gene"]: r for r in out}
    for gene, log2fc, n_papers, high_rel, ext, role, func, n_src, act in rows:
        assert got[gene]["conf"] == _port_confidence(
            n_papers, high_rel, ext, role, func, n_src
        ), gene
        direction = "up" if log2fc >= 0 else "down"
        assert got[gene]["interp"] == _port_lite(
            gene, direction, log2fc, n_papers, ext, role, func, act
        ), gene


# --- unified predictor recommendations -----------------------------------

def _port_recs(cancer, level, unknown, has_binary, is_tumor):
    recs = []
    if unknown:
        recs.extend([
            "추가 샘플 분석을 통해 데이터 품질 확인",
            "다른 분석 방법 (예: 조직 병리학) 병행 권장",
            "샘플이 학습 데이터에 포함되지 않은 희귀 암종일 수 있음",
        ])
    else:
        if level == "low":
            recs.append("낮은 신뢰도로 인해 추가 검증 권장")
        if level in ["low", "medium"]:
            recs.append("조직 병리학적 확인 권장")
        if has_binary:
            if is_tumor:
                recs.append(f"{cancer} 특이적 마커 검사 고려")
            else:
                recs.append("정상 조직 가능성, 종양 여부 재검토")
    recs.append("이 분석은 참고용이며 임상 진단을 대체할 수 없습니다")
    return recs


def test_prediction_recommendations_match_port(spark):
    rows = []
    i = 0
    for cancer in ["BRCA", "PAAD", "LUAD", "UNKNOWN"]:
        for level in ["low", "medium", "high"]:
            for hb in [True, False]:
                rows.append((i, cancer, level, cancer == "UNKNOWN", hb, i % 2 == 0))
                i += 1
    df = spark.createDataFrame(
        rows,
        "id int, predicted_cancer string, confidence_level string, "
        "is_unknown boolean, has_binary_analysis boolean, is_tumor boolean",
    )
    out = {r["id"]: r for r in prediction_recommendations(df).collect()}
    for i, cancer, level, unknown, hb, tumor in rows:
        want = _port_recs(cancer, level, unknown, hb, tumor)
        assert out[i]["recommendations"] == " | ".join(want), (i, cancer, level)
        assert out[i]["n_recommendations"] == len(want)
        if unknown:
            assert out[i]["binary_model_key"] is None
        else:
            want_key = CANCER_MODEL_MAP.get(cancer.lower(), cancer.lower())
            assert out[i]["binary_model_key"] == want_key, i
