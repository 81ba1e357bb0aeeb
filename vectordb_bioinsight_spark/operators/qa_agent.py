"""QA paper-agent retrieval path — the deterministic half of the
reference's chat-with-paper agent (``backend/app/core/paper_agent.py``).

The agent's LLM call is a declared boundary; everything around it is
rule-based and lives here:

* :func:`junk_flag` — author-contribution / reference-list detection
  (``paper_agent.py:21-52``, ``JunkContentValidator.is_junk``): >=4 junk
  keywords, or the numbered-citation line shape at the start.
* :func:`question_relevance` — stopword-stripped question-term overlap
  (``:55-66``).
* :func:`answer_confidence` — base 0.7, one uncertainty penalty (first
  matching phrase only), +0.05 per ``[n]`` citation capped at +0.2,
  clamped to [0, 1] (``:68-98``, ``ConfidenceEstimator.estimate``).
* :func:`filter_results` — the strict relevance+junk filter with the
  top-3-non-junk fallback when nothing passes (``:297-321``), plus the
  numbered ``[Source i]`` context assembly over the survivors
  (``:322-333``).

All JVM expression trees; the filter's fallback is one per-query window
(any-pass flag) instead of the reference's two list passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: paper_agent.py:24-29 — author-contribution section markers.
JUNK_KEYWORDS = [
    "writing", "editing", "review", "conceptualization",
    "methodology", "validation", "investigation", "supervision",
    "data curation", "visualization", "funding acquisition",
    "competing interests", "conflict of interest",
]

#: paper_agent.py:31-34 — question stopwords.
QA_STOP_WORDS = [
    "what", "is", "the", "are", "how", "does", "do", "can",
    "this", "that", "paper", "study", "research", "finding",
]

#: paper_agent.py:36-37.
JUNK_KEYWORD_THRESHOLD = 4

#: paper_agent.py:73-80 — confidence model constants.
BASE_CONFIDENCE = 0.7
UNCERTAINTY_PENALTY = 0.15
CITATION_BONUS = 0.05
MAX_CITATION_BONUS = 0.2
UNCERTAINTY_PHRASES = [
    "cannot find", "not mentioned", "unclear", "may", "might", "possibly",
]

#: paper_agent.py:208 (MIN_RELEVANCE_SCORE class attr used by
#: _filter_results :308) — the strict-filter floor on the reference's
#: 0-100 relevance scale.
MIN_RELEVANCE_SCORE = 10.0

_REF_LINE_RE = r"^\d+\.\s+[A-Z][a-z]+\s+[A-Z]{1,2}[,.]"


def junk_flag(text: Column) -> Column:
    """paper_agent.py:39-52 — junk iff >=4 keywords or a reference line.

    (The keyword COUNT needs per-word increments, so this stays a sum of
    whens rather than the shared contains_any boolean fold.)"""
    low = F.lower(text)
    kw_count = sum(
        (F.when(low.contains(kw), 1).otherwise(0) for kw in JUNK_KEYWORDS),
        F.lit(0),
    )
    return (kw_count >= JUNK_KEYWORD_THRESHOLD) | text.rlike(_REF_LINE_RE)


def question_relevance(content: Column, question: str) -> Column:
    """paper_agent.py:55-66 — >=1 stopword-stripped term match (or an
    empty term set). The question is a plan-time constant, so the term
    sweep compiles to a contains chain."""
    from vectordb_bioinsight_spark.functions.text import contains_any

    terms = sorted(set(question.lower().split()) - set(QA_STOP_WORDS))
    if not terms:
        return F.lit(True)
    # 'at least one term matches' IS the shared contains_any fold
    return contains_any(F.lower(content), terms)


def answer_confidence(answer: Column) -> Column:
    """paper_agent.py:82-98 — uncertainty-penalized, citation-boosted."""
    from vectordb_bioinsight_spark.functions.text import contains_any

    uncertain = contains_any(F.lower(answer), UNCERTAINTY_PHRASES)
    citations = F.size(F.regexp_extract_all(answer, F.lit(r"(\[\d+\])"), 1))
    conf = (
        F.lit(BASE_CONFIDENCE)
        - F.when(uncertain, UNCERTAINTY_PENALTY).otherwise(0.0)
        + F.least(
            citations.cast("double") * CITATION_BONUS, F.lit(MAX_CITATION_BONUS)
        )
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), conf))


def filter_results(
    df: DataFrame,
    question: str,
    query_col: str = "query_id",
    content_col: str = "content",
    score_col: str = "relevance_score",
    rank_col: str = "rank",
    min_relevance: float = MIN_RELEVANCE_SCORE,
) -> DataFrame:
    """paper_agent.py:297-321 — strict filter with top-3-non-junk fallback.

    Strict pass: ``relevance_score >= min_relevance AND NOT junk``. When a
    query has no strict survivor, its top-3 results (by the caller's
    ``rank``, the retrieval order) minus junk are returned instead, with
    ``used_fallback = 1``. One query-keyed window computes the any-pass
    flag; no second scan. The ``question`` parameter is accepted and
    IGNORED — exactly the reference's own ``_filter_results(self,
    results, question)`` signature, whose body reads only
    ``relevance_score`` and the junk flag (paper_agent.py:297-321); it
    stays for signature parity, and callers wanting term filtering
    compose :func:`question_relevance` upstream.
    """
    junk = junk_flag(F.col(content_col))
    strict = (F.col(score_col) >= min_relevance) & ~junk
    w = Window.partitionBy(query_col)
    flagged = df.withColumn("_junk", junk).withColumn("_strict", strict)
    flagged = flagged.withColumn(
        "_any_strict", F.max(F.col("_strict").cast("int")).over(w) == 1
    )
    keep = F.when(F.col("_any_strict"), F.col("_strict")).otherwise(
        (F.col(rank_col) <= 3) & ~F.col("_junk")
    )
    return (
        flagged.withColumn("used_fallback", (~F.col("_any_strict")).cast("int"))
        .filter(keep)
        .drop("_junk", "_strict", "_any_strict")
    )


def build_context(
    kept: DataFrame,
    query_col: str = "query_id",
    content_col: str = "content",
    section_col: str = "section",
    rank_col: str = "rank",
) -> DataFrame:
    """paper_agent.py:322-333 — numbered [Source i] context per query.

    Survivors are renumbered 1..n in retrieval order and joined with the
    reference's ``\\n\\n---\\n\\n`` separator. One query-keyed window for
    the renumber; the assembly is a sorted collect_list (struct-sorted by
    rank, so partition order never leaks into the string).
    """
    w = Window.partitionBy(query_col).orderBy(F.col(rank_col).asc())
    numbered = kept.withColumn("_i", F.row_number().over(w))
    part = F.concat(
        F.lit("[Source "), F.col("_i").cast("string"), F.lit("] Section: "),
        F.coalesce(F.col(section_col), F.lit("Unknown")),
        F.lit("\nContent: "), F.col(content_col),
    )
    aggs = [
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_i"), F.col("_part")))),
                lambda s: s["_part"],
            ),
            "\n\n---\n\n",
        ).alias("context"),
        F.count("*").alias("n_sources"),
    ]
    if "used_fallback" in kept.columns:
        aggs.append(F.max("used_fallback").alias("used_fallback"))
    return numbered.withColumn("_part", part).groupBy(query_col).agg(*aggs)
