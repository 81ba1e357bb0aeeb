"""Crawler-side paper scoring — the web crawler agent's deterministic
trend metrics (``backend/app/core/web_crawler_agent.py:126-287,
728-792``). The HTTP fetch layer is the declared S7/S8 boundary; every
score computed from fetched fields is ported here:

* :func:`recency_score` — ``max(0, 100 - 20 * years_old)`` (:142-158).
* :func:`citation_velocity` — recent(last-2y) / older(prior-2y) citation
  ratio with the only-recent -> 5.0 "very hot" rule (:161-198).
* :func:`trend_score` — the 35/25/20/20 multi-factor blend with the
  log10 citation component and the two fallback branches (:201-241).
* :func:`filter_by_query_terms` — title-term filter with the
  fill-from-abstract overflow (:760-792). The reference's loop keeps an
  abstract-only match while ``len(filtered) < max_results`` AT SCAN
  TIME; because the title-match count before a candidate is
  non-decreasing in scan order, the kept abstract matches are exactly a
  PREFIX of the abstract candidates — candidate j (1-based among
  abstract-only matches, scan order) is kept iff
  ``titles_before(j) + (j - 1) < max_results`` — so the stateful Python
  loop reduces to two rank windows, no fold.

``current_year`` is a parameter everywhere the reference calls
``datetime.now()`` (replayability).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recency_score(year: Column, current_year: int) -> Column:
    """web_crawler_agent.py:142-158 — 0 for missing years."""
    score = F.greatest(
        F.lit(0.0), 100.0 - (F.lit(current_year) - year).cast("double") * 20.0
    )
    return F.when(year.isNull() | (year == 0), F.lit(0.0)).otherwise(score)


def citation_velocity(
    by_year: DataFrame,
    id_col: str = "paper_id",
    year_col: str = "year",
    count_col: str = "n_citations",
    current_year: int = 2025,
) -> DataFrame:
    """web_crawler_agent.py:161-198 over long (paper, year, count) rows:
    recent = last 2 years, older = the 2 before; velocity =
    recent/older, or 5.0 when only recent citations exist, else 0.
    One paper-keyed partial-aggregable groupBy."""
    recent = F.sum(
        F.when(F.col(year_col) >= current_year - 1, F.col(count_col)).otherwise(0)
    )
    older = F.sum(
        F.when(
            (F.col(year_col) >= current_year - 3) & (F.col(year_col) < current_year - 1),
            F.col(count_col),
        ).otherwise(0)
    )
    agg = by_year.groupBy(id_col).agg(
        recent.alias("_recent"), older.alias("_older")
    )
    velocity = (
        F.when(F.col("_older") > 0, F.col("_recent").cast("double") / F.col("_older").cast("double"))
        .when(F.col("_recent") > 0, F.lit(5.0))
        .otherwise(F.lit(0.0))
    )
    return agg.select(id_col, F.round(velocity, 6).alias("citation_velocity"))


def trend_score(
    velocity: Column,
    publication_surge: Column,
    citation_count: Column,
    recency: Column,
) -> Column:
    """web_crawler_agent.py:201-241 — velocity*0.35 + surge*0.25 +
    citations*0.20 + recency*0.20, each component capped at 100; the
    citation component is log10(n+1)*30. Fallbacks: no velocity/surge
    data -> 0.6*citations + 0.4*recency; no citations either ->
    recency * 0.5."""
    citation_score = F.when(
        citation_count > 0,
        F.least(F.lit(100.0), F.log10(citation_count.cast("double") + 1.0) * 30.0),
    ).otherwise(F.lit(0.0))
    velocity_score = F.least(F.lit(100.0), velocity * 20.0)
    surge_score = F.least(F.lit(100.0), publication_surge * 25.0)
    return (
        F.when(
            (velocity > 0) | (publication_surge > 0),
            velocity_score * 0.35 + surge_score * 0.25
            + citation_score * 0.20 + recency * 0.20,
        )
        .when(citation_count > 0, citation_score * 0.6 + recency * 0.4)
        .otherwise(recency * 0.5)
    )


def filter_by_query_terms(
    papers: DataFrame,
    query: str,
    max_results: int,
    order_col: str = "scan_order",
    title_col: str = "title",
    abstract_col: str = "abstract",
    score_col: str = "trend_score",
    *,
    group_col: str,
) -> DataFrame:
    """web_crawler_agent.py:760-792 — keep every paper with a query term
    in the title; fill with abstract-only matches (at a -10 trend-score
    penalty) only while the filtered list is still short of
    ``max_results`` at their scan position (see module docstring for the
    prefix reduction). Adds ``match_kind`` ('title' | 'abstract').

    ``group_col`` is REQUIRED (keyword-only, no default — ADVICE r08:
    a ``"group_id"`` default would silently hand per-group windows to
    any caller whose frame happens to carry that column) and partitions
    the scan windows per search-result list — the batch shape (many
    searches filtered at once) and the only scale-safe form. The
    reference's single-list call is the ``group_col = constant`` special
    case: add a literal column (``df.withColumn("group_id", F.lit(0))``)
    for a bounded result page. A ``None``/empty group_col raises rather
    than silently planning a single-partition global window
    (tests/test_plans.py gate).
    """
    if not group_col:
        raise ValueError(
            "filter_by_query_terms requires group_col; for a single bounded "
            "result page add a constant column and pass its name"
        )
    from vectordb_bioinsight_spark.functions.text import contains_any

    terms = [t for t in query.lower().split()]

    def _hits(col: Column) -> Column:
        return contains_any(F.lower(col), terms)

    flagged = papers.withColumn("_title_hit", _hits(F.col(title_col))).withColumn(
        "_abs_hit",
        (~F.col("_title_hit"))
        & F.col(abstract_col).isNotNull()
        & (F.col(abstract_col) != "")
        & _hits(F.col(abstract_col)),
    )
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    titles_before = F.sum(F.col("_title_hit").cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    abs_rank = F.sum(F.col("_abs_hit").cast("int")).over(w)  # j for abstract rows
    staged = flagged.withColumn(
        "_tb", F.coalesce(titles_before, F.lit(0))
    ).withColumn("_j", abs_rank)
    keep_abs = F.col("_abs_hit") & (F.col("_tb") + (F.col("_j") - 1) < max_results)
    return (
        staged.filter(F.col("_title_hit") | keep_abs)
        .withColumn(
            score_col,
            F.when(F.col("_abs_hit"), F.col(score_col) - 10.0).otherwise(F.col(score_col)),
        )
        .withColumn(
            "match_kind",
            F.when(F.col("_title_hit"), F.lit("title")).otherwise(F.lit("abstract")),
        )
        .drop("_title_hit", "_abs_hit", "_tb", "_j")
    )
