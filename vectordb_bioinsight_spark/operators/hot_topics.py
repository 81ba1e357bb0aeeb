"""Hybrid hot-topic tracking: predefined topic counts + emerging keywords.

The reference's ``TrendAnalyzer`` (bio-daily-briefing/src/
trend_analyzer.py:229-677) runs a 2-track daily analysis:

* **Track 1 — predefined topics**: each paper matches a topic when ANY
  of the topic's keywords appears in title+abstract (primary) or in the
  MeSH/author-keyword metadata (secondary); keywords of <= 4 chars (or
  an explicit hazard list: "bite" must not match "exhibited") use
  word-boundary regexes, longer ones plain containment (:419-440,
  :441-467). Topics under MIN_PAPER_COUNT drop; survivors join
  yesterday's and last week's persisted counts for day/week deltas and
  the indicator ladder (>= +50% hot, >= +10% up, <= -10% down, else
  flat; :34-66).
* **Track 2 — emerging keywords**: MeSH + author keywords, lowered and
  trimmed, filtered by length/stopword/blacklist validity (:492-527),
  excluding anything substring-overlapping a predefined keyword
  (hot_topics.py:191-198); a keyword is NEW when yesterday's count < 3,
  RISING when today/yesterday >= 2.0 (:344-381).

Spark-first shape: the topic dimension is broadcast rows whose keyword
structs carry PRECOMPUTED regex patterns (escaping done at build time,
engine-portable); per (paper, topic) matching is one `exists` probe; the
daily counts are one groupBy; history comparison is a 3-way broadcast
join of count tables (the persisted-snapshot pattern replaces the
reference's JSON history files). Indicator labels are ASCII tokens
(hot/up/down/flat) — the reference renders emoji, a display concern.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "SHORT_KEYWORDS_NEED_BOUNDARY",
    "KEYWORD_STOPWORDS",
    "topic_keyword_dimension",
    "hot_topic_counts",
    "predefined_trend_report",
    "keyword_frequency",
    "emerging_keywords",
]

#: >4-char keywords that still need boundary matching ("bite" vs
#: "exhibited" — trend_analyzer.py:415-418)
SHORT_KEYWORDS_NEED_BOUNDARY = {"bite", "aav", "lnp", "adc", "car", "nk", "rna", "dna"}

#: validity stopwords for emerging keywords (trend_analyzer.py:233-246
#: tier: function words + generic research vocabulary)
KEYWORD_STOPWORDS = {
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "from", "as", "is", "was", "are", "were", "been",
    "study", "studies", "research", "analysis", "results", "findings",
    "patients", "cells", "using", "based", "novel", "new", "showed",
    "humans", "animals", "male", "female", "adult", "aged",
    "cell", "cancer", "tumor", "tumors", "protein", "proteins",
    "gene", "genes", "treatment", "therapy", "prognosis", "diagnosis",
}

MIN_KEYWORD_LENGTH = 3
MIN_PAPER_COUNT = 5


def topic_keyword_dimension(
    spark: SparkSession,
    topics: "dict[str, tuple[str, list[str]]]",
) -> DataFrame:
    """Broadcast topic dimension: topic -> category + keyword structs
    with the boundary decision and regex pattern precomputed at build
    time (so the executor-side probe is one exists() with no dynamic
    escaping). ``topics`` maps name -> (category, keywords)."""
    rows = []
    for name, (category, kws) in topics.items():
        structs = []
        for kw in kws:
            k = kw.lower()
            boundary = len(k) <= 4 or k in SHORT_KEYWORDS_NEED_BOUNDARY
            structs.append((k, boundary, r"\b" + _re.escape(k) + r"\b"))
        rows.append((name, category, structs))
    return spark.createDataFrame(
        rows,
        "topic string, category string, "
        "kws array<struct<kw:string, boundary:boolean, pat:string>>",
    )


def _topic_match(primary: Column, secondary: Column) -> Column:
    """ANY keyword hits primary or secondary text, per the boundary rule
    (trend_analyzer.py:419-467). Texts must already be lowered."""
    return F.exists(
        "kws",
        lambda s: F.when(
            s["boundary"],
            F.regexp_like(primary, s["pat"]) | F.regexp_like(secondary, s["pat"]),
        ).otherwise(
            F.contains(primary, s["kw"]) | F.contains(secondary, s["kw"])
        ),
    )


def hot_topic_counts(
    papers: DataFrame,
    dim: DataFrame,
    title_col: str,
    abstract_col: str,
    meta_col: "str | None" = None,
) -> DataFrame:
    """Papers matching each predefined topic (_count_predefined_topics,
    trend_analyzer.py:441-467): one broadcast cross join, one exists
    probe per pair, one topic groupBy. ``meta_col`` is the secondary
    (MeSH + author keyword) text; omitted -> primary only. Topics with
    zero matches still emit a 0 row (the reference initializes every
    topic's counter)."""
    # pre-project the lambda-captured texts into plain ATTRIBUTES before
    # the broadcast join: Spark 4.1 codegen mis-binds captured stream-side
    # EXPRESSIONS when score evaluation is split across the join
    # (see operators/trend_match._score_cols)
    pre = papers.select(
        F.lower(
            F.concat_ws(
                " ",
                F.coalesce(F.col(title_col), F.lit("")),
                F.coalesce(F.col(abstract_col), F.lit("")),
            )
        ).alias("_ht_primary"),
        (
            F.lower(F.coalesce(F.col(meta_col), F.lit(""))) if meta_col else F.lit("")
        ).alias("_ht_secondary"),
    )
    pairs = pre.crossJoin(F.broadcast(dim)).select(
        "topic", "category",
        _topic_match(F.col("_ht_primary"), F.col("_ht_secondary")).alias("m"),
    )
    counts = pairs.groupBy("topic", "category").agg(
        F.sum(F.when(F.col("m"), 1).otherwise(0)).cast("long").alias("n")
    )
    return counts


def predefined_trend_report(
    today: DataFrame,
    yesterday: DataFrame,
    week_ago: DataFrame,
    min_count: int = MIN_PAPER_COUNT,
    top_n: int = 5,
) -> DataFrame:
    """Track 1's report (analyze_hybrid, trend_analyzer.py:316-341 +
    the PredefinedTrend delta properties :34-66): survivors of the
    min-count gate joined to the persisted yesterday/week-ago counts,
    week-over-week change (100% when last week was 0 and today is
    positive), the hot/up/down/flat indicator ladder, top-N by count.

    Inputs are (topic, category, n) count tables; history sides may be
    missing topics (coalesce to 0, like the reference's .get(key, 0))."""
    t = today.filter(F.col("n") >= min_count).select(
        "topic", "category", F.col("n").alias("count")
    )
    y = yesterday.select("topic", F.col("n").alias("previous_count"))
    w = week_ago.select("topic", F.col("n").alias("week_ago_count"))
    j = (
        t.join(F.broadcast(y), "topic", "left")
        .join(F.broadcast(w), "topic", "left")
        .withColumn("previous_count", F.coalesce("previous_count", F.lit(0)))
        .withColumn("week_ago_count", F.coalesce("week_ago_count", F.lit(0)))
    )
    change = F.when(
        F.col("week_ago_count") == 0,
        F.when(F.col("count") > 0, F.lit(100.0)).otherwise(F.lit(0.0)),
    ).otherwise(
        (F.col("count") - F.col("week_ago_count"))
        / F.col("week_ago_count") * 100.0
    )
    indicator = (
        F.when(change >= 50, "hot")
        .when(change >= 10, "up")
        .when(change <= -10, "down")
        .otherwise("flat")
    )
    return (
        j.select(
            "topic", "category", "count", "previous_count", "week_ago_count",
            F.round(change, 4).alias("week_change"),
            indicator.alias("indicator"),
        )
        .orderBy(F.col("count").desc(), "topic")
        .limit(top_n)
    )


def keyword_frequency(
    papers: DataFrame,
    keyword_arr_cols: "list[str]",
    extra_blacklist: "set[str] | None" = None,
) -> DataFrame:
    """Candidate emerging keywords with counts (_extract_all_keywords +
    _is_valid_keyword, trend_analyzer.py:492-527): explode the metadata
    keyword arrays, lower+trim, drop short/stopword/blacklisted terms.
    A paper contributes once per occurrence, like the reference's
    Counter loop."""
    bl = {s.lower() for s in (extra_blacklist or set())}
    exploded = None
    for c in keyword_arr_cols:
        part = papers.select(
            F.explode(F.coalesce(F.col(c), F.array())).alias("raw")
        )
        exploded = part if exploded is None else exploded.unionAll(part)
    kw = exploded.select(F.lower(F.trim("raw")).alias("keyword"))
    stop = sorted(KEYWORD_STOPWORDS | bl)
    valid = kw.filter(
        (F.length("keyword") >= MIN_KEYWORD_LENGTH)
        & ~F.col("keyword").isin(*stop)
    )
    return valid.groupBy("keyword").agg(F.count("*").cast("long").alias("n"))


def emerging_keywords(
    today: DataFrame,
    yesterday: DataFrame,
    predefined_keywords: "list[str]",
    min_count: int = MIN_PAPER_COUNT,
    max_out: int = 3,
) -> DataFrame:
    """Track 2 (analyze_hybrid, trend_analyzer.py:344-381 +
    is_in_predefined, hot_topics.py:191-198): drop keywords that
    substring-overlap a predefined keyword IN EITHER DIRECTION, gate on
    min_count, flag NEW (yesterday < 3) or RISING (today/yesterday >=
    2.0), top max_out by count. Inputs are (keyword, n) count tables."""
    pre = F.array(*[F.lit(k.lower()) for k in predefined_keywords])
    in_predefined = F.exists(
        pre, lambda p: F.contains(p, F.col("keyword")) | F.contains(F.col("keyword"), p)
    )
    j = (
        today.filter(F.col("n") >= min_count)
        .filter(~in_predefined)
        .join(
            F.broadcast(yesterday.select("keyword", F.col("n").alias("prev"))),
            "keyword",
            "left",
        )
        .withColumn("prev", F.coalesce("prev", F.lit(0)))
    )
    is_new = F.col("prev") < 3
    is_rising = (F.col("prev") > 0) & (F.col("n") / F.col("prev") >= 2.0)
    return (
        j.filter(is_new | is_rising)
        .select(
            "keyword",
            F.col("n").alias("count"),
            F.col("prev").alias("previous_count"),
            is_new.alias("is_new"),
        )
        .orderBy(F.col("count").desc(), "keyword")
        .limit(max_out)
    )
