"""Briefing / corpus-enrichment rule ladders — the last deterministic
aggregator-level surfaces of the reference's daily-briefing stack:

* :func:`article_type_classify` — PubMed publication-type -> article-type
  priority ladder (``backend/app/core/corpus_builder.py:359-404``:
  ``ArticleTypeClassifier.classify`` over the ``TYPE_MAPPINGS`` table
  :363-380 and ``ARTICLE_TYPE_PRIORITY`` weights :43-55, with the
  Journal-Article -> original-research fallback :400-402).
* :func:`high_impact_filter` — high-impact-journal substring filter
  (``bio-daily-briefing/src/aggregator.py:341-360``).
* :func:`aggregator_headline` — the aggregator's five-tier headline pick
  (``bio-daily-briefing/src/aggregator.py:362-394``), the sibling of the
  prioritizer's seven-tier pick (operators/news_priority.py).

All three are scan-local JVM expression trees; the headline pick ends in
one TakeOrderedAndProject (top-1), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: corpus_builder.py:363-380 — publication-type string -> article type.
TYPE_MAPPINGS: dict[str, str] = {
    "Systematic Review": "systematic_review",
    "Meta-Analysis": "meta_analysis",
    "Practice Guideline": "guideline",
    "Guideline": "guideline",
    "Consensus Development Conference": "guideline",
    "Review": "review",
    "Randomized Controlled Trial": "rct",
    "Clinical Trial": "clinical_trial",
    "Clinical Trial, Phase I": "clinical_trial",
    "Clinical Trial, Phase II": "clinical_trial",
    "Clinical Trial, Phase III": "clinical_trial",
    "Clinical Trial, Phase IV": "clinical_trial",
    "Case Reports": "case_report",
    "Editorial": "editorial",
    "Letter": "letter",
    "Comment": "letter",
}

#: corpus_builder.py:43-55 — priority weights (unknown carries 0.25).
ARTICLE_TYPE_PRIORITY: dict[str, float] = {
    "systematic_review": 1.0,
    "meta_analysis": 1.0,
    "guideline": 0.95,
    "review": 0.85,
    "rct": 0.80,
    "clinical_trial": 0.70,
    "original_research": 0.50,
    "case_report": 0.30,
    "editorial": 0.20,
    "letter": 0.10,
    "unknown": 0.25,
}

#: aggregator.py:343-350 — substring-matched high-impact journal names.
HIGH_IMPACT_JOURNALS = [
    "nature", "science", "cell", "lancet",
    "new england journal of medicine", "nejm",
    "jama", "bmj", "nature medicine", "nature genetics",
    "nature biotechnology", "cell stem cell",
    "journal of clinical oncology", "blood",
    "circulation", "gut", "annals of oncology",
]


def _pt_type(pt: Column) -> Column:
    expr = F.lit("unknown")
    for k, v in reversed(list(TYPE_MAPPINGS.items())):
        expr = F.when(pt == k, F.lit(v)).otherwise(expr)
    return expr


def _type_priority(t: Column) -> Column:
    expr = F.lit(0.0)
    for k, v in ARTICLE_TYPE_PRIORITY.items():
        expr = F.when(t == k, F.lit(v)).otherwise(expr)
    return expr


def article_type_classify(
    df: DataFrame, id_col: str, pub_types_col: str
) -> DataFrame:
    """Classify each paper's article type from its publication-types array
    (corpus_builder.py:383-404): every entry maps through TYPE_MAPPINGS
    (unmapped -> unknown at weight 0.25), the HIGHEST-priority entry wins
    with ties broken by FIRST position (the reference's strict-> fold),
    and a paper still unknown falls back to original_research when
    'Journal Article' appears. Position tie-break is order-independent as
    an argmax over (priority, -index), so the whole ladder is one
    scan-local array_max — no fold state, no shuffle.

    Output: (id, article_type, type_priority) — type_priority is the
    final type's weight (0.50 after the original-research fallback),
    rounded 4 dp.
    """
    pts = F.col(pub_types_col)
    # two-stage: map to types FIRST so the 17-branch mapping CASE runs
    # once per element (referencing _pt_type(x) in both the priority and
    # the type field would evaluate it twice — probed 2x at 1M docs)
    types = F.transform(pts, _pt_type)
    best = F.array_max(
        F.transform(
            types,
            lambda t, i: F.struct(
                _type_priority(t).alias("p"),
                (-i).cast("int").alias("ni"),
                t.alias("t"),
            ),
        )
    )
    raw_type = F.coalesce(best["t"], F.lit("unknown"))
    final_type = F.when(
        (raw_type == "unknown") & F.array_contains(pts, "Journal Article"),
        F.lit("original_research"),
    ).otherwise(raw_type)
    return df.select(
        F.col(id_col).alias("id"),
        final_type.alias("article_type"),
        F.round(_type_priority(final_type), 4).alias("type_priority"),
    )


def high_impact_filter(df: DataFrame, journal_col: str) -> DataFrame:
    """Keep papers whose lowercased journal CONTAINS any high-impact name
    (aggregator.py:341-360 — substring, not equality: 'Nature Reviews
    Cancer' passes via 'nature').

    The lowered journal is LET-BOUND once via a single-element exists()
    (SCALING rules 40/42: interpreted expressions get no subexpression
    elimination, so the naive OR-fold re-lowers the string per probe —
    17x here; the bind measured 2.6x at 1M rows, hashes unchanged)."""
    from vectordb_bioinsight_spark.functions.text import contains_any

    return df.filter(
        F.exists(
            F.array(F.lower(F.col(journal_col))),
            lambda jl: contains_any(jl, HIGH_IMPACT_JOURNALS),
        )
    )


def aggregator_headline(
    news: DataFrame,
    id_col: str,
    category_col: str,
    news_type_col: str,
    priority_col: str,
) -> DataFrame:
    """The aggregator's headline pick (aggregator.py:362-394): FDA
    approvals, then FDA safety warnings, then trial results, then
    preprints, then any regulatory item — max priority within the first
    non-empty tier. A non-empty higher tier always dominates, so the
    ladder is ONE top-1 by (tier asc, priority desc, id asc): an
    eligible-in-several-tiers item (approval is also 'any regulatory')
    takes its best tier. Tie-break within a tier is the deterministic id
    order (the reference's list-order max is ingestion-order dependent —
    a documented upgrade, same discipline as the prioritizer's pick).

    Output: one row (id, tier, category, news_type, priority) — empty
    when nothing is eligible (the reference returns None).
    """
    cat = F.col(category_col)
    nt = F.col(news_type_col)
    tier = (
        F.when((cat == "regulatory") & nt.contains("approval"), 1)
        .when(
            (cat == "regulatory")
            & (nt.contains("warning") | nt.contains("safety")),
            2,
        )
        .when(cat == "trials", 3)
        .when(cat == "preprints", 4)
        .when(cat == "regulatory", 5)
    )
    return (
        news.withColumn("tier", tier)
        .filter(F.col("tier").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            "tier",
            cat.alias("category"),
            nt.alias("news_type"),
            F.col(priority_col).alias("priority"),
        )
        .orderBy(F.asc("tier"), F.desc("priority"), F.asc("id"))
        .limit(1)
    )
