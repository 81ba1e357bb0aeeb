"""Catalog entries for the rule-based explanation tier
(operators/explainers.py — the reference's no-LLM fallback paths).

Planted rotations over the documents table exercise every ladder branch;
the real (lowercased) document text is appended to the planted fragments
so the relevance sweep sees corpus-scale variety while every
branch-driving token stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.explainers import (
    interpretation_confidence,
    lite_interpretation,
    prediction_recommendations,
    rule_based_explain,
)
from vectordb_bioinsight_spark.sources.readers import load_table

#: doc_id % 8 — one per study-type branch + the fallback; gene symbols and
#: exclude-wall words mixed in (TP53/BRCA1/KRAS/EGFR real, RNA/DNA/FDA
#: excluded); techniques crossing single and multi matches.
_EXPLAIN_TITLES = [
    "A systematic review of TP53 in cancer therapy",            # Review + gene
    "Meta-analysis of BRCA1 qPCR assays",                       # Meta + gene + qPCR
    "Randomized phase II trial of EGFR inhibitors",             # Trial + gene
    "A prospective cohort with follow-up RNA DNA FDA",          # Cohort + excluded caps
    "Case report: KRAS G12C in vitro response",                 # Case beats Basic (order)
    "Mouse model CRISPR Cas9 screen of MYC",                    # Basic + CRISPR + gene
    "TCGA transcriptome atlas with machine learning",           # Bioinformatics + RNA-seq + ML
    "An untyped note about gut flora",                           # fallback, no genes
]

_QUERY = "cancer gene therapy"


def q_explain_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RuleBasedExplainer.explain (paper_explainer.py:546-611) per doc:
    planted titles (doc_id % 8 rotation) + the real lowercased text as
    content; query 'cancer gene therapy'."""
    docs = load_table(spark, sf_dir, "documents")
    title = F.element_at(
        F.array(*[F.lit(t) for t in _EXPLAIN_TITLES]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )
    frame = docs.select(
        "doc_id", title.alias("title"), F.lower(F.col("text")).alias("content")
    )
    return rule_based_explain(frame, _QUERY).select(
        "doc_id", "study_type", "techniques", "key_genes",
        "n_relevance_factors", "why_recommended",
    )


def _sql_explain() -> str:
    from vectordb_bioinsight_spark.operators.explainers import (
        GENE_EXCLUDE,
        STUDY_TYPE_KEYWORDS,
        TECHNIQUE_KEYWORDS,
    )

    titles = ",".join("'" + t.replace("'", "''") + "'" for t in _EXPLAIN_TITLES)

    def any_kw(kws: list[str]) -> str:
        return " OR ".join(f"contains(text, '{k.lower()}')" for k in kws)

    study_case = "CASE " + " ".join(
        f"WHEN ({any_kw(kws)}) THEN '{stype}'"
        for stype, kws in STUDY_TYPE_KEYWORDS.items()
    ) + " ELSE '연구 논문' END"
    tech_list = "list_filter([" + ",".join(
        f"CASE WHEN ({any_kw(kws)}) THEN '{tech}' END"
        for tech, kws in TECHNIQUE_KEYWORDS.items()
    ) + "], x -> x IS NOT NULL)"
    exclude = ",".join(f"'{g}'" for g in GENE_EXCLUDE)
    n_factors = " + ".join(
        f"CASE WHEN contains(text, '{t}') THEN 1 ELSE 0 END"
        for t in _QUERY.lower().split()
    )
    return f"""
WITH titles(i, title) AS (
  SELECT i, l[i + 1] FROM (SELECT [{titles}] AS l), range(8) r(i)
), docs AS (
  SELECT d.doc_id, t.title, lower(d.text) AS content,
         t.title || ' ' || lower(d.text) AS raw,
         lower(t.title || ' ' || lower(d.text)) AS text
  FROM documents d JOIN titles t ON t.i = d.doc_id % 8
), genes_raw AS (
  SELECT doc_id, u.e.g AS g, u.e.i AS i
  FROM docs, unnest(list_transform(
         regexp_extract_all(raw, '\\b([A-Z][A-Z0-9]{{1,5}})\\b', 1),
         (x, j) -> {{'g': x, 'i': j}})) u(e)
), genes_first AS (
  SELECT doc_id, g, min(i) AS mi FROM genes_raw
  WHERE g NOT IN ({exclude}) GROUP BY doc_id, g
), genes_list AS (
  SELECT doc_id, (list(g ORDER BY mi))[1:5] AS gl FROM genes_first GROUP BY doc_id
), scored AS (
  SELECT d.doc_id,
         {study_case} AS study_type,
         {tech_list} AS tl,
         coalesce(g.gl, []) AS gl,
         ({n_factors}) AS n_relevance_factors
  FROM docs d LEFT JOIN genes_list g ON g.doc_id = d.doc_id
)
SELECT doc_id, study_type,
       coalesce(list_aggregate(tl, 'string_agg', ', '), '') AS techniques,
       coalesce(list_aggregate(gl, 'string_agg', ', '), '') AS key_genes,
       n_relevance_factors,
       '검색어 ''{_QUERY}''와 관련된 ' || study_type || ' 논문입니다.'
       || CASE WHEN len(tl) > 0
               THEN ' ' || list_aggregate(tl[1:2], 'string_agg', ', ') || ' 기법을 사용합니다.'
               ELSE '' END
       || CASE WHEN len(gl) > 0
               THEN ' 주요 유전자: ' || list_aggregate(gl[1:3], 'string_agg', ', ') || '.'
               ELSE '' END AS why_recommended
FROM scored
"""


SQL_EXPLAIN_DOCS = _sql_explain()


def q_gene_confidence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source interpreter fallback (enhanced_interpreter.py:547-620):
    planted per-gene evidence (papers, relevance, external role/function/
    sources, actionable) -> confidence ladder + the lite interpretation
    string; cancer_type 'breast_cancer'."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    log2fc = (((d * 13) % 400) - 200).cast("double") / 100.0
    frame = docs.select(
        "doc_id",
        F.concat(F.lit("G"), d.cast("string")).alias("gene_symbol"),
        log2fc.alias("log2fc"),
        (d % 5).cast("int").alias("n_papers"),
        (d % 4 == 0).alias("any_high_rel"),
        (d % 6 != 0).alias("has_external"),
        F.when(d % 3 == 0, "Oncogene").when(d % 3 == 1, "TSG").otherwise("Unknown").alias("cancer_role"),
        F.when(d % 2 == 0, "regulates cell cycle progression").otherwise("").alias("protein_function"),
        (d % 5).cast("int").alias("n_sources"),
        (d % 7 == 0).alias("actionable"),
    )
    direction = F.when(F.col("log2fc") >= 0, "up").otherwise("down")
    return frame.select(
        "doc_id",
        interpretation_confidence(
            F.col("n_papers"), F.col("any_high_rel"), F.col("has_external"),
            F.col("cancer_role"), F.col("protein_function") != "", F.col("n_sources"),
        ).alias("confidence"),
        lite_interpretation(
            F.col("gene_symbol"), direction, F.col("log2fc"),
            F.col("n_papers"), F.col("has_external"), F.col("cancer_role"),
            F.col("protein_function"), F.col("actionable"), "breast_cancer",
        ).alias("interpretation"),
    )


SQL_GENE_CONFIDENCE_DOCS = """
WITH ev AS (
  SELECT doc_id,
         'G' || doc_id::VARCHAR AS gene_symbol,
         (((doc_id * 13) % 400) - 200)::DOUBLE / 100.0 AS log2fc,
         doc_id % 5 AS n_papers,
         doc_id % 4 = 0 AS any_high_rel,
         doc_id % 6 <> 0 AS has_external,
         CASE doc_id % 3 WHEN 0 THEN 'Oncogene' WHEN 1 THEN 'TSG' ELSE 'Unknown' END AS cancer_role,
         CASE WHEN doc_id % 2 = 0 THEN 'regulates cell cycle progression' ELSE '' END AS protein_function,
         doc_id % 5 AS n_sources,
         doc_id % 7 = 0 AS actionable
  FROM documents
), scored AS (
  SELECT *,
         (CASE WHEN n_papers >= 3 THEN 2 WHEN n_papers >= 1 THEN 1 ELSE 0 END
          + CASE WHEN any_high_rel THEN 1 ELSE 0 END
          + CASE WHEN has_external THEN
              (CASE WHEN cancer_role <> 'Unknown' THEN 2 ELSE 0 END
               + CASE WHEN protein_function <> '' THEN 1 ELSE 0 END
               + CASE WHEN n_sources >= 3 THEN 1 ELSE 0 END)
            ELSE 0 END) AS score
  FROM ev
)
SELECT doc_id,
       CASE WHEN score >= 5 THEN 'high' WHEN score >= 2 THEN 'medium' ELSE 'low' END AS confidence,
       concat_ws(' ',
         gene_symbol || '은(는) breast cancer에서 '
           || CASE WHEN log2fc >= 0 THEN '상향조절' ELSE '하향조절' END
           || '됨 (log2FC=' || printf('%.2f', log2fc) || ').',
         CASE WHEN has_external AND cancer_role <> 'Unknown'
              THEN '암에서의 역할: ' || cancer_role || '.' END,
         CASE WHEN has_external AND protein_function <> ''
              THEN '기능: ' || protein_function[1:150] || '...' END,
         CASE WHEN has_external AND actionable THEN '치료 표적으로 활용 가능.' END,
         CASE WHEN n_papers > 0 THEN '관련 문헌 ' || n_papers::VARCHAR || '편 발견.'
              ELSE '관련 문헌을 찾지 못함.' END
       ) AS interpretation
FROM scored
"""


def q_prediction_recs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified-predictor recommendation ladder + model-key routing
    (unified_predictor.py:275-285, 330-360): planted prediction outcomes
    cross unknown x confidence-level x binary-analysis x tumor branches."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    frame = docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(c) for c in ["BRCA", "PAAD", "LUAD", "COAD", "UNKNOWN"]]),
            (d % 5 + 1).cast("int"),
        ).alias("predicted_cancer"),
        F.element_at(
            F.array(F.lit("low"), F.lit("medium"), F.lit("high")),
            (d % 3 + 1).cast("int"),
        ).alias("confidence_level"),
        (d % 2 == 0).alias("has_binary_analysis"),
        (d % 3 == 0).alias("is_tumor"),
    ).withColumn("is_unknown", F.col("predicted_cancer") == "UNKNOWN")
    return prediction_recommendations(frame).select(
        "doc_id", "binary_model_key", "recommendations", "n_recommendations"
    )


SQL_PREDICTION_RECS_DOCS = """
WITH preds AS (
  SELECT doc_id,
         (['BRCA','PAAD','LUAD','COAD','UNKNOWN'])[doc_id % 5 + 1] AS cancer,
         (['low','medium','high'])[doc_id % 3 + 1] AS level,
         doc_id % 2 = 0 AS has_binary,
         doc_id % 3 = 0 AS is_tumor
  FROM documents
), flagged AS (
  SELECT *, cancer = 'UNKNOWN' AS unknown FROM preds
), recs AS (
  SELECT *,
    list_filter([
      CASE WHEN unknown THEN '추가 샘플 분석을 통해 데이터 품질 확인' END,
      CASE WHEN unknown THEN '다른 분석 방법 (예: 조직 병리학) 병행 권장' END,
      CASE WHEN unknown THEN '샘플이 학습 데이터에 포함되지 않은 희귀 암종일 수 있음' END,
      CASE WHEN NOT unknown AND level = 'low' THEN '낮은 신뢰도로 인해 추가 검증 권장' END,
      CASE WHEN NOT unknown AND level IN ('low', 'medium') THEN '조직 병리학적 확인 권장' END,
      CASE WHEN NOT unknown AND has_binary AND is_tumor THEN cancer || ' 특이적 마커 검사 고려' END,
      CASE WHEN NOT unknown AND has_binary AND NOT is_tumor THEN '정상 조직 가능성, 종양 여부 재검토' END,
      '이 분석은 참고용이며 임상 진단을 대체할 수 없습니다'
    ], x -> x IS NOT NULL) AS rl
  FROM flagged
)
SELECT doc_id,
       CASE WHEN unknown THEN NULL
            WHEN lower(cancer) = 'brca' THEN 'breast'
            WHEN lower(cancer) = 'paad' THEN 'pancreatic'
            ELSE lower(cancer) END AS binary_model_key,
       list_aggregate(rl, 'string_agg', ' | ') AS recommendations,
       len(rl) AS n_recommendations
FROM recs
"""


# --- QA paper-agent retrieval path (operators/qa_agent.py —
# paper_agent.py:21-98, 297-333) ------------------------------------------

#: doc_id % 6 content rotation: 0 = author-contribution junk (>=4
#: keywords), 1 = reference-line junk, 2-5 = normal prose; queries 0-2
#: (doc_id % 25) are planted with sub-floor scores so the top-3-non-junk
#: fallback branch is exercised alongside the strict path.
_QA_CONTENTS = [
    "Author contributions: writing, editing, review, conceptualization and methodology by all.",
    "1. Smith A, Jones B. Cancer genomics studies. J Oncol 2019.",
    "The experiment measured tumor growth under EGFR inhibition.",
    "Results show significant pathway enrichment in treated samples.",
    "Methods describe the RNA extraction and sequencing protocol.",
    "Discussion covers limitations and future clinical directions.",
]


def q_qa_context_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QA retrieval filter + context assembly (paper_agent.py:297-333):
    documents grouped into 25 retrieval result sets (query_id = doc_id %
    25, rank = arrival order), junk/normal planted contents, strict
    relevance floor 10.0 with the top-3-non-junk fallback, numbered
    [Source i] context per query."""
    from vectordb_bioinsight_spark.operators.qa_agent import (
        build_context,
        filter_results,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    frame = docs.select(
        "doc_id",
        (d % 25).cast("int").alias("query_id"),
        (F.floor(d / 25) + 1).cast("int").alias("rank"),
        F.element_at(
            F.array(*[F.lit(c) for c in _QA_CONTENTS]), (d % 6 + 1).cast("int")
        ).alias("content"),
        F.when(d % 25 < 3, ((d * 7) % 10).cast("double") / 2.0)
        .otherwise(((d * 7) % 100).cast("double"))
        .alias("relevance_score"),
        F.element_at(
            F.array(F.lit("Results"), F.lit("Methods"), F.lit(None).cast("string")),
            (d % 3 + 1).cast("int"),
        ).alias("section"),
    )
    kept = filter_results(frame, "tumor growth")
    return build_context(kept)


def _sql_qa_context() -> str:
    from vectordb_bioinsight_spark.operators.qa_agent import (
        JUNK_KEYWORDS,
        JUNK_KEYWORD_THRESHOLD,
        MIN_RELEVANCE_SCORE,
    )

    contents = ",".join("'" + c.replace("'", "''") + "'" for c in _QA_CONTENTS)
    kw_count = " + ".join(
        f"CASE WHEN contains(lower(content), '{kw}') THEN 1 ELSE 0 END"
        for kw in JUNK_KEYWORDS
    )
    return f"""
WITH contents(i, c) AS (
  SELECT i, l[i + 1] FROM (SELECT [{contents}] AS l), range(6) r(i)
), results AS (
  SELECT d.doc_id,
         d.doc_id % 25 AS query_id,
         (d.doc_id // 25 + 1) AS rank,
         ct.c AS content,
         CASE WHEN d.doc_id % 25 < 3 THEN ((d.doc_id * 7) % 10)::DOUBLE / 2.0
              ELSE ((d.doc_id * 7) % 100)::DOUBLE END AS relevance_score,
         (['Results', 'Methods', NULL])[d.doc_id % 3 + 1] AS section
  FROM documents d JOIN contents ct ON ct.i = d.doc_id % 6
), flagged AS (
  SELECT *,
         (({kw_count}) >= {JUNK_KEYWORD_THRESHOLD}
          OR regexp_matches(content, '^\\d+\\.\\s+[A-Z][a-z]+\\s+[A-Z]{{1,2}}[,.]')) AS junk
  FROM results
), marked AS (
  SELECT *,
         relevance_score >= {MIN_RELEVANCE_SCORE} AND NOT junk AS strict,
         max(CASE WHEN relevance_score >= {MIN_RELEVANCE_SCORE} AND NOT junk
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id) = 1 AS any_strict
  FROM flagged
), kept AS (
  SELECT *, CASE WHEN any_strict THEN 0 ELSE 1 END AS used_fallback
  FROM marked
  WHERE CASE WHEN any_strict THEN strict ELSE rank <= 3 AND NOT junk END
), numbered AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id ORDER BY rank ASC) AS i
  FROM kept
)
SELECT query_id,
       string_agg('[Source ' || i::VARCHAR || '] Section: '
                  || coalesce(section, 'Unknown') || e'\\nContent: ' || content,
                  e'\\n\\n---\\n\\n' ORDER BY i) AS context,
       count(*) AS n_sources,
       max(used_fallback) AS used_fallback
FROM numbered
GROUP BY query_id
"""


SQL_QA_CONTEXT_DOCS = _sql_qa_context()

#: doc_id % 8 answer rotation crossing uncertainty x citation branches:
#: none, one uncertainty phrase, two phrases (penalty applied once),
#: 1/3/5/6 citations (bonus caps at 4), both combined.
_QA_ANSWERS = [
    "The study demonstrates clear tumor suppression.",
    "The effect is unclear from the provided sections.",
    "It may help; results might vary across cohorts.",
    "Growth slowed by 40% [1].",
    "Three analyses agree [1] [2] [3].",
    "Five sources support this [1] [2] [3] [4] [5].",
    "All sections concur [1] [2] [3] [4] [5] [6].",
    "Possibly effective per [1] [2] [3] [4] [5].",
]


def q_answer_confidence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Answer-confidence estimation (paper_agent.py:82-98): planted
    answers (doc_id % 8) crossing the uncertainty-penalty and
    citation-bonus branches, including the +0.2 cap and the
    penalty-applied-once rule."""
    from vectordb_bioinsight_spark.operators.qa_agent import answer_confidence

    docs = load_table(spark, sf_dir, "documents")
    answer = F.element_at(
        F.array(*[F.lit(a) for a in _QA_ANSWERS]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.round(answer_confidence(answer), 4).alias("confidence"),
    )


def _sql_answer_confidence() -> str:
    from vectordb_bioinsight_spark.operators.qa_agent import (
        BASE_CONFIDENCE,
        CITATION_BONUS,
        MAX_CITATION_BONUS,
        UNCERTAINTY_PENALTY,
        UNCERTAINTY_PHRASES,
    )

    answers = ",".join("'" + a.replace("'", "''") + "'" for a in _QA_ANSWERS)
    uncertain = " OR ".join(
        f"contains(lower(a), '{p}')" for p in UNCERTAINTY_PHRASES
    )
    return f"""
WITH answers(i, a) AS (
  SELECT i, l[i + 1] FROM (SELECT [{answers}] AS l), range(8) r(i)
), joined AS (
  SELECT d.doc_id, ans.a
  FROM documents d JOIN answers ans ON ans.i = d.doc_id % 8
)
SELECT doc_id,
       round(greatest(0.0, least(1.0,
         {BASE_CONFIDENCE}
         - CASE WHEN ({uncertain}) THEN {UNCERTAINTY_PENALTY} ELSE 0.0 END
         + least(len(regexp_extract_all(a, '\\[\\d+\\]'))::DOUBLE * {CITATION_BONUS},
                 {MAX_CITATION_BONUS}))), 4) AS confidence
FROM joined
"""


SQL_ANSWER_CONFIDENCE_DOCS = _sql_answer_confidence()


# --- structured-summary parsing (operators/summary_parse.py —
# summarizer.py:374-484) ---------------------------------------------------

#: doc_id % 8 summary templates crossing the JSON and text paths: fenced
#: JSON with a list field, raw JSON, empty {} (still JSON path),
#: malformed JSON falling back to text, marker/bullet/overwrite text
#: forms, markerless prose, and an empty-remaining marker with blank
#: lines. <N> is replaced with the doc id so every hash row differs.
_SUMMARY_TEMPLATES = [
    'noise\n```json\n{"PURPOSE": "study <N>", "KEY_FINDINGS": ["a<N>", "b"], "LIMITATIONS": "small n"}\n```\ntail',
    '{"METHODS": "RNA-seq run <N>", "RESULTS": "up", "CONCLUSIONS": "ok"}',
    "{}",
    "PURPOSE: find <N>\nsecond line\nMETHODS\n- step one\n- step two\nRESULTS: good\nKEY FINDINGS:\n- f<N>\n• f2\nLIMITATIONS: few\nRESULTS: better later",
    "preamble dropped\n**PURPOSE:** bold <N>\nMETHODOLOGY: alt marker\n1. numbered\n3. third",
    "no markers at all, plain text <N>",
    "broken json {not valid} but PURPOSE: fallback <N> works",
    "CONCLUSIONS:\n\nfirst <N>\n\nsecond",
]


def q_summary_parse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-summary parsing (summarizer.py:374-484): planted
    summary templates (doc_id % 8) through the JSON-first,
    text-fallback parser; one wide row per document."""
    from vectordb_bioinsight_spark.operators.summary_parse import parse_summary

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    template = F.element_at(
        F.array(*[F.lit(t) for t in _SUMMARY_TEMPLATES]), (d % 8 + 1).cast("int")
    )
    frame = docs.select(
        "doc_id",
        F.replace(template, F.lit("<N>"), d.cast("string")).alias("summary_text"),
    )
    out = parse_summary(frame)
    # text-path sections that never appeared come back NULL; normalize to
    # '' for canonicalizer-stable scalars (limitations keeps its
    # reference default, already non-null)
    for c in ["purpose", "methods", "results", "conclusions", "key_findings"]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return out


def _sql_summary_parse() -> str:
    from vectordb_bioinsight_spark.operators.summary_parse import SECTION_MARKERS

    templates = ",".join(
        "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
        for t in _SUMMARY_TEMPLATES
    )
    marker_struct = "CASE " + " ".join(
        f"WHEN starts_with(upper(line), '{mk.upper()}') THEN {{'s': '{sec}', 'l': {len(mk)}}}"
        for sec, markers in SECTION_MARKERS.items()
        for mk in markers
    ) + " ELSE NULL END"
    json_schema = (
        '{"PURPOSE":"VARCHAR","METHODS":"VARCHAR","RESULTS":"VARCHAR",'
        '"CONCLUSIONS":"VARCHAR","KEY_FINDINGS":["VARCHAR"],"LIMITATIONS":"VARCHAR"}'
    )
    return f"""
WITH templates(i, t) AS (
  SELECT i, l[i + 1] FROM (SELECT [{templates}] AS l), range(8) r(i)
), docs AS (
  SELECT d.doc_id, replace(t.t, '<N>', d.doc_id::VARCHAR) AS summary_text
  FROM documents d JOIN templates t ON t.i = d.doc_id % 8
), jsoned AS (
  SELECT doc_id, summary_text,
         CASE WHEN regexp_extract(summary_text, '(?s)```(?:json)?\\s*(\\{{.*?\\}})\\s*```', 1) <> ''
              THEN regexp_extract(summary_text, '(?s)```(?:json)?\\s*(\\{{.*?\\}})\\s*```', 1)
              ELSE regexp_extract(summary_text, '(?s)(\\{{.*\\}})', 1) END AS js
  FROM docs
), routed AS (
  SELECT doc_id, summary_text, js,
         js <> '' AND json_valid(js) AS json_ok,
         CASE WHEN js <> '' AND json_valid(js)
              THEN json_transform(js, '{json_schema}') END AS pj
  FROM jsoned
), lines AS (
  SELECT doc_id, u.e.pos AS pos, trim(u.e.line) AS line
  FROM routed, unnest(list_transform(string_split(summary_text, chr(10)),
         (x, j) -> {{'line': x, 'pos': j}})) u(e)
  WHERE NOT json_ok
), marked AS (
  SELECT doc_id, pos, line, {marker_struct} AS mk FROM lines
), staged AS (
  SELECT doc_id, pos, line, mk,
         sum(CASE WHEN mk IS NOT NULL THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS inst,
         last_value(mk.s IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY pos) AS cursec
  FROM marked
), contentful AS (
  SELECT doc_id, pos, inst, cursec,
         CASE WHEN mk IS NOT NULL THEN trim(substring(line, mk.l + 1))
              WHEN regexp_matches(line, '^(-|•|\\*|1\\.|2\\.|3\\.)')
              THEN regexp_replace(line, '^[-•*0-9. ]+', '')
              ELSE line END AS content
  FROM staged WHERE inst > 0
), blocks AS (
  SELECT doc_id, inst, any_value(cursec) AS section,
         string_agg(content, chr(31) ORDER BY pos) AS joined
  FROM contentful WHERE content <> ''
  GROUP BY doc_id, inst
), resolved AS (
  SELECT doc_id, section,
         replace(joined, chr(31),
                 CASE WHEN section = 'key_findings' THEN ' | ' ELSE ' ' END) AS content,
         row_number() OVER (PARTITION BY doc_id, section ORDER BY inst DESC) AS rk
  FROM blocks
), wide AS (
  SELECT doc_id,
         max(CASE WHEN section = 'purpose' THEN content END) AS purpose,
         max(CASE WHEN section = 'methods' THEN content END) AS methods,
         max(CASE WHEN section = 'results' THEN content END) AS results,
         max(CASE WHEN section = 'conclusions' THEN content END) AS conclusions,
         max(CASE WHEN section = 'key_findings' THEN content END) AS key_findings,
         max(CASE WHEN section = 'limitations' THEN content END) AS limitations
  FROM resolved WHERE rk = 1 GROUP BY doc_id
)
SELECT r.doc_id,
       CASE WHEN r.json_ok THEN 'json' ELSE 'text' END AS parsed_from,
       CASE WHEN r.json_ok THEN coalesce(r.pj.PURPOSE, '') ELSE coalesce(w.purpose, '') END AS purpose,
       CASE WHEN r.json_ok THEN coalesce(r.pj.METHODS, '') ELSE coalesce(w.methods, '') END AS methods,
       CASE WHEN r.json_ok THEN coalesce(r.pj.RESULTS, '') ELSE coalesce(w.results, '') END AS results,
       CASE WHEN r.json_ok THEN coalesce(r.pj.CONCLUSIONS, '') ELSE coalesce(w.conclusions, '') END AS conclusions,
       CASE WHEN r.json_ok THEN coalesce(list_aggregate(r.pj.KEY_FINDINGS, 'string_agg', ' | '), '')
            ELSE coalesce(w.key_findings, '') END AS key_findings,
       CASE WHEN r.json_ok THEN coalesce(r.pj.LIMITATIONS, 'Not specified')
            ELSE coalesce(w.limitations, 'Not specified') END AS limitations
FROM routed r LEFT JOIN wide w ON w.doc_id = r.doc_id
"""


SQL_SUMMARY_PARSE_DOCS = _sql_summary_parse()
