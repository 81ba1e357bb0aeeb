"""Briefing rule ladders (operators/briefing.py) vs pure-python ports of
the reference (corpus_builder.py:359-404, aggregator.py:341-394)."""

import random

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.briefing import (
    ARTICLE_TYPE_PRIORITY,
    HIGH_IMPACT_JOURNALS,
    TYPE_MAPPINGS,
    aggregator_headline,
    article_type_classify,
    high_impact_filter,
)


def _classify_port(pub_types):
    """ArticleTypeClassifier.classify, ported (corpus_builder.py:383-404)."""
    best_type, best_priority = "unknown", -1.0
    for pt in pub_types:
        t = TYPE_MAPPINGS.get(pt, "unknown")
        p = ARTICLE_TYPE_PRIORITY.get(t, 0)
        if p > best_priority:
            best_priority, best_type = p, t
    if best_type == "unknown" and "Journal Article" in pub_types:
        best_type = "original_research"
    return best_type


def test_article_type_fuzz_vs_port(spark):
    """200 random pub-type lists in one job: the argmax-over-(priority,
    -index) expression must equal the reference's strict-> fold —
    including first-position wins on the tied 1.0 pair."""
    pool = list(TYPE_MAPPINGS) + ["Journal Article", "Nonsense", "Also Unmapped"]
    rng = random.Random(11)
    rows = [(i, rng.sample(pool, rng.randrange(0, 6))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, pts array<string>")
    got = {r["id"]: r for r in article_type_classify(df, "id", "pts").collect()}
    for i, pts in rows:
        want = _classify_port(pts)
        assert got[i]["article_type"] == want, (pts, got[i])
        assert got[i]["type_priority"] == round(ARTICLE_TYPE_PRIORITY[want], 4)


def test_article_type_tie_and_fallback_branches(spark):
    df = spark.createDataFrame(
        [
            (1, ["Meta-Analysis", "Systematic Review"]),   # first 1.0 wins
            (2, ["Systematic Review", "Meta-Analysis"]),
            (3, ["Journal Article"]),                      # fallback
            (4, ["Nonsense", "Journal Article"]),          # unknown -> fallback
            # unknown's 0.25 BEATS letter's 0.10 (corpus_builder.py:53-54),
            # so the winner is unknown and the fallback fires
            (5, ["Comment", "Journal Article"]),
            (6, []),                                       # empty -> unknown
        ],
        "id long, pts array<string>",
    )
    got = {r["id"]: r["article_type"] for r in article_type_classify(df, "id", "pts").collect()}
    assert got == {
        1: "meta_analysis", 2: "systematic_review", 3: "original_research",
        4: "original_research", 5: "original_research", 6: "unknown",
    }


def test_high_impact_filter_substring_semantics(spark):
    rows = [
        (1, "Nature Reviews Cancer"), (2, "The Lancet"), (3, "Gut"),
        (4, "Advances in Gut Microbiome"), (5, "Journal of Pickles"),
        (6, "NEJM Evidence"), (7, "Obscure Quarterly"),
    ]
    df = spark.createDataFrame(rows, "id long, journal string")
    kept = {r["id"] for r in high_impact_filter(df, "journal").collect()}
    # python port: any high-impact name a SUBSTRING of the lowercased journal
    want = {
        i for i, j in rows
        if any(hj in j.lower() for hj in HIGH_IMPACT_JOURNALS)
    }
    assert kept == want == {1, 2, 3, 4, 6}


def _headline_port(items):
    """_select_headline, ported (aggregator.py:362-394); items are
    (id, category, news_type, priority) with deterministic id tie-break
    (the engine's documented upgrade over list-order max)."""
    regulatory = [x for x in items if x[1] == "regulatory"]
    trials = [x for x in items if x[1] == "trials"]
    preprints = [x for x in items if x[1] == "preprints"]
    for tier in (
        [x for x in regulatory if "approval" in x[2]],
        [x for x in regulatory if "warning" in x[2] or "safety" in x[2]],
        trials,
        preprints,
        regulatory,
    ):
        if tier:
            return max(tier, key=lambda x: (x[3], -x[0]))
    return None


def test_aggregator_headline_fuzz_vs_port(spark):
    rng = random.Random(23)
    cats = ["regulatory", "trials", "preprints", "other"]
    types = ["drug_approval", "safety_warning", "trial_result",
             "preprint_paper", "fda_update", "warning_label"]
    for trial in range(6):
        n = rng.randrange(0, 12)
        items = [
            (i, rng.choice(cats), rng.choice(types), rng.randrange(0, 50))
            for i in range(n)
        ]
        df = spark.createDataFrame(
            items or [(0, "other", "x", 0)],
            "id long, category string, news_type string, priority long",
        )
        rows = aggregator_headline(df, "id", "category", "news_type", "priority").collect()
        want = _headline_port(items)
        if want is None:
            assert rows == [], (trial, items)
        else:
            assert len(rows) == 1 and rows[0]["id"] == want[0], (trial, items, rows)
