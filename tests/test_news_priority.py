"""News prioritization (operators/news_priority.py) vs a pure-python port
of the reference scoring (prioritizer.py:94-287)."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.news_priority import (
    BIG_PHARMA,
    HIGH_IMPACT_JOURNALS,
    HOT_KEYWORDS,
    SOURCE_WEIGHTS,
    TYPE_WEIGHTS,
    categorize_news,
    priority_scores,
    select_headline,
)

AS_OF = "1998-06-10"


def _ref_priority(news, as_of=AS_OF):
    """Port of NewsPrioritizer.calculate_priority with the engine's
    explicit as_of in place of datetime.now()."""
    score = 0
    text = f"{news.get('title', '')} {news.get('summary', '')}".lower()
    score += SOURCE_WEIGHTS.get(news.get("source", ""), 20)
    score += TYPE_WEIGHTS.get(news.get("type", ""), 10)
    for kw in HOT_KEYWORDS:
        if kw in text:
            score += 30
            break
    for c in BIG_PHARMA:
        if c in text:
            score += 25
            break
    journal = (news.get("journal") or "").lower()
    for hj in HIGH_IMPACT_JOURNALS:
        if hj in journal:
            score += 40
            break
    if "first" in text or "breakthrough" in text or "novel" in text:
        score += 50
    ds = news.get("date", "")
    if ds:
        try:
            nd = datetime.strptime(ds[:10], "%Y-%m-%d")
            days_old = (date.fromisoformat(as_of) - nd.date()).days
            if days_old == 0:
                score += 30
            elif days_old <= 1:
                score += 20
            elif days_old <= 3:
                score += 10
        except (ValueError, TypeError):
            pass
    return score


NEWS = [
    dict(nid=0, source="FDA", type="drug_approval",
         title="FDA approves first-in-class GLP-1 therapy",
         summary="semaglutide approval for obesity from novo nordisk",
         journal="", date="1998-06-10"),
    dict(nid=1, source="ClinicalTrials", type="phase3_positive",
         title="Phase 3 readout positive", summary="CAR-T cell therapy trial",
         journal="", date="1998-06-09"),
    dict(nid=2, source="PubMed", type="research",
         title="Mechanism of checkpoint inhibitor resistance",
         summary="pd-l1 pathway analysis from pfizer collaboration",
         journal="Nature Medicine", date="1998-06-08"),
    dict(nid=3, source="bioRxiv", type="preprint",
         title="A preprint on mrna delivery", summary="",
         journal="", date="1998-06-01"),
    dict(nid=4, source="RSS", type="blog",
         title="Industry roundup", summary="nothing notable",
         journal="trade weekly", date="not-a-date"),
    dict(nid=5, source="FDA", type="safety_warning",
         title="Safety signal identified", summary="",
         journal="", date="1998-06-12"),  # future date -> <=1 branch
    dict(nid=6, source="ClinicalTrials", type="new_trial",
         title="New trial registered", summary="", journal="", date=""),
]


@pytest.fixture(scope="module")
def news_df(spark):
    return spark.createDataFrame(
        [(n["nid"], n["source"], n["type"], n["title"], n["summary"],
          n["journal"], n["date"]) for n in NEWS],
        "nid long, source string, type string, title string, summary string, "
        "journal string, dt string",
    )


def _scored(spark, news_df):
    return priority_scores(
        news_df, "nid", "source", "type", "title", "summary", "journal",
        "dt", AS_OF,
    )


def test_priority_matches_port(spark, news_df):
    got = {r["nid"]: r["priority_score"] for r in _scored(spark, news_df).collect()}
    for n in NEWS:
        assert got[n["nid"]] == _ref_priority(n), n
    # branch sanity: all four bonuses + today-recency on item 0
    assert got[0] == 100 + 150 + 30 + 25 + 50 + 30


def test_categorize_ladder(spark, news_df):
    df = news_df.withColumn("cat", categorize_news(news_df, "source", "type"))
    got = {r["nid"]: r["cat"] for r in df.collect()}
    assert got[0] == "regulatory" and got[5] == "regulatory"
    assert got[1] == "clinical" and got[6] == "clinical"
    assert got[3] == "preprints"
    assert got[2] == "research" and got[4] == "research"


def test_headline_tier_ladder(spark, news_df):
    scored = _scored(spark, news_df)
    # full feed: the FDA approval wins tier 1
    top = select_headline(scored, "nid", "source", "type").collect()
    assert len(top) == 1 and top[0]["nid"] == 0
    # no approvals: the safety warning wins tier 2
    top = select_headline(scored.filter("nid <> 0"), "nid", "source", "type").collect()
    assert top[0]["nid"] == 5
    # no regulatory at all: phase3 positive wins tier 3
    top = select_headline(
        scored.filter("source <> 'FDA'"), "nid", "source", "type"
    ).collect()
    assert top[0]["nid"] == 1
    # only research + preprints: research wins tier 5
    top = select_headline(
        scored.filter("nid in (2, 3, 4)"), "nid", "source", "type"
    ).collect()
    assert top[0]["nid"] == 2


def test_priority_fuzz_vs_port(spark):
    import random

    rng = random.Random(20260815)
    sources = list(SOURCE_WEIGHTS) + ["RSS", "", "Blog"]
    types = list(TYPE_WEIGHTS) + ["blog", "", "unknown"]
    words = ["semaglutide", "pfizer", "novel", "first", "routine", "update",
             "crispr", "merck", "breakthrough", "plain", "car-t", "obesity"]
    journals = ["", "nature", "cell", "trade weekly", "NEJM", "the lancet"]
    dates = ["1998-06-10", "1998-06-09", "1998-06-08", "1998-06-07",
             "1998-05-01", "1998-07-01", "", "garbage", "1998-6-1"]
    rows = []
    for i in range(300):
        rows.append(dict(
            nid=i, source=rng.choice(sources), type=rng.choice(types),
            title=" ".join(rng.sample(words, 3)),
            summary=" ".join(rng.sample(words, 2)),
            journal=rng.choice(journals), date=rng.choice(dates),
        ))
    df = spark.createDataFrame(
        [(n["nid"], n["source"], n["type"], n["title"], n["summary"],
          n["journal"], n["date"]) for n in rows],
        "nid long, source string, type string, title string, summary string, "
        "journal string, dt string",
    )
    got = {r["nid"]: r["priority_score"] for r in priority_scores(
        df, "nid", "source", "type", "title", "summary", "journal", "dt", AS_OF
    ).collect()}
    for n in rows:
        assert got[n["nid"]] == _ref_priority(n), n


def test_classify_feed_items_ladder_and_metadata(spark):
    from vectordb_bioinsight_spark.operators.news_priority import (
        classify_feed_items,
    )

    rows = [
        (0, "FDA approves biologics BLA for lymphoma", ""),
        (1, "Approval granted for semaglutide tablets", ""),
        (2, "Safety warning and recall notice", ""),
        (3, "Complete response letter rejects application", ""),
        (4, "Breakthrough therapy designation granted", ""),
        (5, "Advisory committee meeting", ""),
        (6, "Quarterly corporate update", "new data from pfizer and merck"),
        (7, "Routine roundup", "pembrolizumab plus nivolumab combo"),
    ]
    df = spark.createDataFrame(rows, "nid long, title string, summary string")
    out = {r["nid"]: r for r in classify_feed_items(
        df.withColumn("feed_name", F.lit("press_release")),
        "title", "summary", "feed_name",
    ).collect()}
    want_types = ["biologics_approval", "drug_approval", "safety_warning",
                  "rejection", "designation", "advisory", "press_release",
                  "press_release"]
    assert [out[i]["news_type"] for i in range(8)] == want_types
    assert out[1]["drug_name"] == "Semaglutide"
    assert out[6]["company"] == "Pfizer"   # list order, not text order
    assert out[7]["drug_name"] == "Pembrolizumab"  # first pattern hit
    assert out[0]["company"] == "" and out[0]["drug_name"] == ""
