"""Hybrid hot-topic tracking (operators/hot_topics.py) vs a pure-python
port of the reference 2-track analyzer (trend_analyzer.py:229-527)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.hot_topics import (
    KEYWORD_STOPWORDS,
    MIN_KEYWORD_LENGTH,
    SHORT_KEYWORDS_NEED_BOUNDARY,
    emerging_keywords,
    hot_topic_counts,
    keyword_frequency,
    predefined_trend_report,
    topic_keyword_dimension,
)

TOPICS = {
    "glp1": ("metabolic", ["GLP-1", "semaglutide", "tirzepatide", "obesity treatment"]),
    "car_t": ("cell", ["CAR-T", "chimeric antigen receptor", "car"]),
    "bispecifics": ("immuno", ["bispecific", "BiTE", "t cell engager"]),
    "crispr": ("editing", ["CRISPR", "gene editing", "base editing"]),
}


def _is_word_match(kw, text):
    k, t = kw.lower(), text.lower()
    if len(k) <= 4 or k in SHORT_KEYWORDS_NEED_BOUNDARY:
        return bool(re.search(r"\b" + re.escape(k) + r"\b", t))
    return k in t


def _ref_counts(papers):
    counts = {name: 0 for name in TOPICS}
    for title, abstract, meta in papers:
        primary = f"{title} {abstract}"
        for name, (_c, kws) in TOPICS.items():
            if any(_is_word_match(k, primary) or _is_word_match(k, meta) for k in kws):
                counts[name] += 1
    return counts


PAPERS = [
    ("GLP-1 agonists in obesity", "semaglutide outcomes", ""),
    ("The BiTE era", "t cell engager platforms", ""),
    # 'bite' must NOT match inside 'exhibited'/'inhibited'
    ("Compound X exhibited activity", "the drug inhibited growth", ""),
    # 'car' must NOT match 'carcinoma'; CAR-T should
    ("CAR-T consolidation", "chimeric antigen receptor persistence", ""),
    ("Carcinoma screening", "hepatocellular carcinoma cohort", ""),
    # metadata-only match
    ("Unrelated title", "unrelated abstract", "gene editing crispr screens"),
    ("Plain methods paper", "nothing topical here", ""),
]


@pytest.fixture(scope="module")
def papers_df(spark):
    return spark.createDataFrame(
        PAPERS, "title string, abstract string, meta string"
    )


def test_boundary_aware_topic_counts(spark, papers_df):
    dim = topic_keyword_dimension(spark, TOPICS)
    got = {r["topic"]: r["n"] for r in hot_topic_counts(
        papers_df, dim, "title", "abstract", "meta"
    ).collect()}
    want = _ref_counts(PAPERS)
    assert got == want, (got, want)
    # the hazards the boundary rule exists for
    assert got["bispecifics"] == 1  # 'exhibited'/'inhibited' do NOT count
    assert got["car_t"] == 1       # 'carcinoma' does NOT count
    assert got["crispr"] == 1      # metadata-only match DOES count
    assert set(got) == set(TOPICS)  # zero topics still present


def test_trend_report_deltas_and_ladder(spark):
    mk = lambda rows: spark.createDataFrame(rows, "topic string, category string, n long")
    today = mk([("a", "c", 30), ("b", "c", 12), ("c", "c", 9), ("d", "c", 3)])
    yest = mk([("a", "c", 25), ("c", "c", 9)])
    week = mk([("a", "c", 10), ("b", "c", 11), ("c", "c", 10)])
    rep = {r["topic"]: r for r in predefined_trend_report(
        today, yest.select("topic", "n"), week.select("topic", "n"), min_count=5
    ).collect()}
    assert "d" not in rep  # under min_count
    assert rep["a"]["week_change"] == pytest.approx(200.0)
    assert rep["a"]["indicator"] == "hot"
    assert rep["b"]["week_change"] == pytest.approx((12 - 11) / 11 * 100, abs=1e-4)
    assert rep["b"]["indicator"] == "flat"
    assert rep["c"]["week_change"] == pytest.approx(-10.0)
    assert rep["c"]["indicator"] == "down"
    assert rep["a"]["previous_count"] == 25 and rep["b"]["previous_count"] == 0


def test_week_change_zero_baseline(spark):
    mk = lambda rows, s: spark.createDataFrame(rows, s)
    today = mk([("x", "c", 8)], "topic string, category string, n long")
    empty = mk([("zz", 1)], "topic string, n long")
    rep = predefined_trend_report(today, empty, empty).collect()
    # reference: week_ago == 0 and count > 0 -> +100% (trend_analyzer.py:34-38)
    assert rep[0]["week_change"] == 100.0 and rep[0]["indicator"] == "hot"


def test_keyword_frequency_validity(spark):
    df = spark.createDataFrame(
        [(["CRISPR screens", "  Mutation  ", "ab"], ["crispr screens", "the"]),
         (["organoid models"], [])],
        "mesh array<string>, kws array<string>",
    )
    got = {r["keyword"]: r["n"] for r in keyword_frequency(
        df, ["mesh", "kws"], extra_blacklist={"mutation"}
    ).collect()}
    # 'ab' (short), 'the' (stopword), 'mutation' (blacklist) all drop;
    # mesh + author occurrences both count
    assert got == {"crispr screens": 2, "organoid models": 1}


def test_emerging_new_vs_rising_vs_predefined(spark):
    mk = lambda rows: spark.createDataFrame(rows, "keyword string, n long")
    today = mk([("organoid", 10), ("spatial omics", 8), ("bite platforms", 9),
                ("slow mover", 6), ("tiny", 2)])
    yest = mk([("spatial omics", 4), ("slow mover", 5)])
    out = {r["keyword"]: r for r in emerging_keywords(
        today, yest, predefined_keywords=["BiTE", "CAR-T"], min_count=5, max_out=3
    ).collect()}
    assert "bite platforms" not in out  # substring-overlaps predefined 'bite'
    assert "tiny" not in out            # under min_count
    assert "slow mover" not in out      # 6/5 < 2.0 and prev >= 3
    assert out["organoid"]["is_new"] is True and out["organoid"]["previous_count"] == 0
    assert out["spatial omics"]["is_new"] is False  # 8/4 >= 2.0 -> rising
