"""End-to-end composition of the briefing tier: classify a raw feed,
score it, categorize, pick the headline, and run both hot-topic tracks —
the operators chain the way the reference's daily pipeline does
(aggregator.py -> prioritizer.py -> trend_analyzer.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.hot_topics import (
    emerging_keywords,
    hot_topic_counts,
    keyword_frequency,
    predefined_trend_report,
    topic_keyword_dimension,
)
from vectordb_bioinsight_spark.operators.news_priority import (
    categorize_news,
    classify_feed_items,
    priority_scores,
    select_headline,
)

AS_OF = "1998-06-10"


@pytest.fixture(scope="module")
def raw_feed(spark):
    rows = []
    for i in range(40):
        kind = i % 4
        if kind == 0:
            title = "FDA approves semaglutide for obesity"
        elif kind == 1:
            title = "Safety warning issued on therapy batch"
        elif kind == 2:
            title = "CAR-T chimeric antigen receptor durable remission data"
        else:
            title = "Routine methods note"
        rows.append((i, title, "summary text from pfizer" if i % 5 == 0 else "",
                     "FDA" if kind < 2 else "PubMed",
                     "nature" if kind == 2 else "",
                     f"1998-06-{(i % 9) + 1:02d}"))
    return spark.createDataFrame(
        rows, "nid long, title string, summary string, source string, "
              "journal string, dt string",
    )


def test_feed_to_headline_chain(spark, raw_feed):
    classified = classify_feed_items(raw_feed, "title", "summary", "source")
    scored = priority_scores(
        classified, "nid", "source", "news_type", "title", "summary",
        "journal", "dt", AS_OF,
    )
    assert scored.filter("priority_score <= 0").count() == 0
    cats = scored.withColumn("cat", categorize_news(scored, "source", "news_type"))
    by_cat = {r["cat"]: r["n"] for r in
              cats.groupBy("cat").agg(F.count("*").alias("n")).collect()}
    assert by_cat["regulatory"] == 20 and by_cat["research"] == 20
    top = select_headline(scored, "nid", "source", "news_type").collect()
    assert len(top) == 1
    # approvals exist, so the headline MUST be tier 1 and an approval
    assert top[0]["tier"] == 1 and "approval" in top[0]["news_type"]
    # drug metadata extracted on the approval rows survived the chain
    assert top[0]["drug_name"] == "Semaglutide"


def test_feed_topics_and_emerging_on_same_corpus(spark, raw_feed):
    topics = {
        "glp1": ("metabolic", ["semaglutide", "obesity"]),
        "car_t": ("cell", ["CAR-T", "chimeric antigen receptor"]),
    }
    dim = topic_keyword_dimension(spark, topics)
    today = hot_topic_counts(raw_feed, dim, "title", "summary")
    got = {r["topic"]: r["n"] for r in today.collect()}
    assert got == {"glp1": 10, "car_t": 10}
    report = predefined_trend_report(
        today,
        hot_topic_counts(raw_feed.filter("nid % 2 = 0"), dim, "title", "summary")
        .select("topic", "n"),
        hot_topic_counts(raw_feed.filter("nid % 4 = 0"), dim, "title", "summary")
        .select("topic", "n"),
        min_count=5,
    ).collect()
    rep = {r["topic"]: r for r in report}
    assert set(rep) == {"glp1", "car_t"}
    # glp1 rows sit on nid % 4 == 0, i.e. ENTIRELY inside the week-ago
    # snapshot -> no week-over-week change -> 'flat'; car_t rows
    # (nid % 4 == 2) are absent from it -> zero-baseline +100% -> 'hot'
    assert rep["glp1"]["indicator"] == "flat" and rep["glp1"]["week_change"] == 0.0
    assert rep["car_t"]["indicator"] == "hot" and rep["car_t"]["week_ago_count"] == 0
    assert rep["car_t"]["previous_count"] == 10  # even ids include them

    papers = raw_feed.select(
        F.array(F.split("title", " ").getItem(0)).alias("mesh"),
        F.array(F.lit("spatial omics")).alias("kws"),
    )
    today_kw = keyword_frequency(papers, ["mesh", "kws"])
    out = emerging_keywords(
        today_kw,
        spark.createDataFrame([("spatial omics", 10)], "keyword string, n long"),
        predefined_keywords=["semaglutide", "car-t"],
        min_count=5,
        max_out=5,
    ).collect()
    names = {r["keyword"]: r for r in out}
    # 'spatial omics' had prev=10, today=40 -> rising, not new
    assert names["spatial omics"]["is_new"] is False
    # 'routine' (10x from titles) is new (prev 0); 'fda' too
    assert names["routine"]["is_new"] is True
