"""Trend validation scoring: explainable evidence scores for a topic.

The reference's ``TrendValidator`` (backend/app/core/trend_validator.py)
collects sparse signals per keyword over HTTP (PubMed yearly counts,
journal diversity, review coverage, ClinicalTrials activity, research-gap
mentions — :207-534) and then scores them with five deterministic
piecewise ladders and a weighted total (:536-733). The engine splits the
same pipeline Spark-first:

* signal COLLECTION is corpus aggregation (``corpus_trend_signals``):
  at 100 TB the yearly counts / diversity / coverage signals come from
  one conditional-aggregate pass over the papers table, not from a
  throttled REST loop (the reference's per-keyword 0.35 s sleeps,
  :329, :517-523, are a rate-limit workaround, not semantics);
* signal SCORING (``validate_trend_scores``) is the reference's exact
  ladder math as one JVM expression tree per keyword row.

Growth-rate semantics (trend_validator.py:334-340): 5-yr growth compares
the window's LAST yearly count to its FIRST and is 0 when the first year
has no papers; YoY compares last to previous, 0-guarded the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["WEIGHTS", "corpus_trend_signals", "validate_trend_scores"]

#: scoring weights (trend_validator.py:544-550)
WEIGHTS = {
    "publication": 0.25,
    "diversity": 0.20,
    "review": 0.20,
    "clinical": 0.20,
    "gap": 0.15,
}


def _ladder(v: Column, steps: "list[tuple[float, int]]", base: int = 0) -> Column:
    """First-match-wins threshold ladder: steps are (min_value, points)
    in descending order."""
    out = F.lit(base)
    for thr, pts in reversed(steps):
        out = F.when(v >= thr, F.lit(pts)).otherwise(out)
    return out


def corpus_trend_signals(
    papers: DataFrame,
    keyword_col: str,
    year_col: str,
    current_year: int,
    journal_col: str,
    high_if_col: str,
    review_kind_col: "str | None" = None,
    trial_col: "str | None" = None,
    phase3_col: "str | None" = None,
    gap_mention_col: "str | None" = None,
    window_years: int = 5,
) -> DataFrame:
    """Sparse trend signals per keyword from a papers-shaped table — the
    corpus-aggregation twin of SparseSignalExtractor.extract_signals +
    ValidationEvidenceCollector.collect_evidence
    (trend_validator.py:316-346, 498-534): one groupBy with conditional
    aggregates, no per-keyword loop.

    Optional boolean/str columns: ``review_kind_col`` in
    {'systematic', 'meta'}, ``trial_col``/``phase3_col``/
    ``gap_mention_col`` booleans. Missing ones emit zeros.
    """
    y = F.col(year_col)
    first_year = current_year - window_years + 1
    in_window = (y >= first_year) & (y <= current_year)
    df = papers.filter(in_window)

    def _n(cond):
        # when/otherwise (not a bare cast): a NULL predicate counts as 0,
        # and an all-NULL group sums to 0 instead of NULL
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")

    zero = F.lit(0).cast("long")
    aggs = [
        F.count("*").cast("long").alias("total_papers_5yr"),
        _n(y == first_year).alias("first_n"),
        _n(y == current_year).alias("last_n"),
        _n(y == current_year - 1).alias("prev_n"),
        F.count_distinct(F.col(journal_col)).cast("long").alias("unique_journals"),
        F.count_distinct(
            F.when(F.col(high_if_col), F.col(journal_col))
        ).cast("long").alias("high_if_journals"),
        (
            _n(F.col(review_kind_col) == "systematic")
            if review_kind_col else zero
        ).alias("systematic_reviews"),
        (_n(F.col(review_kind_col) == "meta") if review_kind_col else zero).alias(
            "meta_analyses"
        ),
        (_n(F.col(trial_col)) if trial_col else zero).alias("active_clinical_trials"),
        (_n(F.col(phase3_col)) if phase3_col else zero).alias("phase3_trials"),
        (_n(F.col(gap_mention_col)) if gap_mention_col else zero).alias(
            "future_research_mentions"
        ),
    ]
    g = df.groupBy(F.col(keyword_col).alias("keyword")).agg(*aggs)
    growth5 = F.when(
        F.col("first_n") > 0,
        (F.col("last_n") - F.col("first_n")) / F.col("first_n") * 100.0,
    ).otherwise(F.lit(0.0))
    yoy = F.when(
        F.col("prev_n") > 0,
        (F.col("last_n") - F.col("prev_n")) / F.col("prev_n") * 100.0,
    ).otherwise(F.lit(0.0))
    gap_ratio = F.when(
        F.col("total_papers_5yr") > 0,
        F.col("future_research_mentions") / F.col("total_papers_5yr") * 100.0,
    ).otherwise(F.lit(0.0))
    return g.select(
        "keyword",
        "total_papers_5yr",
        growth5.alias("growth_rate_5yr"),
        yoy.alias("growth_rate_yoy"),
        "unique_journals",
        "high_if_journals",
        "systematic_reviews",
        "meta_analyses",
        "active_clinical_trials",
        "phase3_trials",
        "future_research_mentions",
        gap_ratio.alias("gap_ratio"),
    )


def validate_trend_scores(signals: DataFrame) -> DataFrame:
    """Score a signals table with the reference's five ladders and the
    weighted total (trend_validator.py:561-733, 826-841): publication
    (growth + momentum + volume), diversity (journal breadth + high-IF),
    review coverage (SR + MA), clinical activity (trials + phase-3
    bonus), research gap — each capped at 100 — then
    total = 0.25*pub + 0.20*div + 0.20*rev + 0.20*clin + 0.15*gap and
    the confidence ladder (high >= 80 > medium >= 50 > emerging >= 30 >
    uncertain) on the UNROUNDED total, scores reported rounded 1 dp."""
    pub = F.least(
        F.lit(100),
        _ladder(F.col("growth_rate_5yr"), [(100, 50), (50, 40), (25, 30), (10, 20)])
        + F.when(
            (F.col("growth_rate_5yr") > 0) & (F.col("growth_rate_5yr") < 10), 10
        ).otherwise(0)
        + _ladder(F.col("growth_rate_yoy"), [(30, 30), (15, 20), (5, 10)])
        + _ladder(
            F.col("total_papers_5yr"), [(10000, 20), (5000, 15), (1000, 10), (100, 5)]
        ),
    ).cast("double")
    div = F.least(
        F.lit(100),
        _ladder(F.col("unique_journals"), [(50, 60), (30, 45), (15, 30), (5, 15)])
        + _ladder(F.col("high_if_journals"), [(5, 40), (3, 30), (1, 15)]),
    ).cast("double")
    rev = F.least(
        F.lit(100),
        _ladder(
            F.col("systematic_reviews"),
            [(50, 60), (20, 45), (10, 30), (5, 20), (1, 10)],
        )
        + _ladder(F.col("meta_analyses"), [(20, 40), (10, 30), (5, 20), (1, 10)]),
    ).cast("double")
    clin = F.least(
        F.lit(100),
        _ladder(
            F.col("active_clinical_trials"),
            [(100, 70), (50, 55), (20, 40), (10, 25), (1, 10)],
        )
        + _ladder(F.col("phase3_trials"), [(10, 30), (5, 20), (1, 10)]),
    ).cast("double")
    gap = _ladder(
        F.col("gap_ratio"), [(10, 100), (7, 80), (5, 60), (3, 40), (1, 20)], base=10
    ).cast("double")
    total = (
        pub * WEIGHTS["publication"]
        + div * WEIGHTS["diversity"]
        + rev * WEIGHTS["review"]
        + clin * WEIGHTS["clinical"]
        + gap * WEIGHTS["gap"]
    )
    confidence = (
        F.when(total >= 80, "high")
        .when(total >= 50, "medium")
        .when(total >= 30, "emerging")
        .otherwise("uncertain")
    )
    return signals.select(
        "keyword",
        F.round(pub, 1).alias("publication_score"),
        F.round(div, 1).alias("diversity_score"),
        F.round(rev, 1).alias("review_score"),
        F.round(clin, 1).alias("clinical_score"),
        F.round(gap, 1).alias("gap_score"),
        F.round(total, 1).alias("total_score"),
        confidence.alias("confidence_level"),
    )
