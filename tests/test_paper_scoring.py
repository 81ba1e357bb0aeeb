"""Crawler-side paper scoring (operators/paper_scoring.py) — pinned
against python ports of web_crawler_agent.py:126-287 and 760-792,
including the stateful fill-from-abstract loop vs the prefix-rank
reduction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.paper_scoring import (
    citation_velocity,
    filter_by_query_terms,
    recency_score,
    trend_score,
)

CY = 2025


def _port_recency(year):
    if not year:
        return 0.0
    return max(0, 100 - (CY - year) * 20)


def _port_velocity(by_year):
    recent = sum(c for y, c in by_year.items() if y >= CY - 1)
    older = sum(c for y, c in by_year.items() if CY - 3 <= y < CY - 1)
    if older > 0:
        return recent / older
    return 5.0 if recent > 0 else 0.0


def _port_trend(velocity, surge, cc, rec):
    cscore = min(100, math.log10(cc + 1) * 30) if cc > 0 else 0
    vscore = min(100, velocity * 20)
    sscore = min(100, surge * 25)
    if velocity > 0 or surge > 0:
        return vscore * 0.35 + sscore * 0.25 + cscore * 0.20 + rec * 0.20
    elif cc > 0:
        return cscore * 0.6 + rec * 0.4
    return rec * 0.5


def test_scores_match_port(spark):
    cases = []
    i = 0
    for year in [None, 2010, 2023, 2025]:
        for cc in [0, 9, 5000]:
            for surge in [0.0, 1.3]:
                by_year = {CY - k: (i * (k + 2)) % 9 for k in range(5)}
                cases.append((i, year, cc, surge, by_year))
                i += 1
    meta = spark.createDataFrame(
        [(i, y, cc, s) for i, y, cc, s, _ in cases],
        "paper_id int, year int, citation_count long, publication_surge double",
    )
    by_year_rows = [
        (i, y, n) for i, _y, _cc, _s, by in cases for y, n in by.items()
    ]
    by_year_df = spark.createDataFrame(
        by_year_rows, "paper_id int, year int, n_citations long"
    )
    vel = citation_velocity(by_year_df, current_year=CY)
    out = meta.join(vel, "paper_id").select(
        "paper_id",
        recency_score(F.col("year"), CY).alias("rec"),
        "citation_velocity",
        trend_score(
            F.col("citation_velocity"),
            F.col("publication_surge"),
            F.col("citation_count"),
            recency_score(F.col("year"), CY),
        ).alias("trend"),
    )
    got = {r["paper_id"]: r for r in out.collect()}
    for i, year, cc, surge, by_year in cases:
        r = got[i]
        v = _port_velocity(by_year)
        assert r["rec"] == pytest.approx(_port_recency(year)), i
        assert r["citation_velocity"] == pytest.approx(round(v, 6)), i
        assert r["trend"] == pytest.approx(
            _port_trend(round(v, 6), surge, cc, _port_recency(year)), abs=1e-6
        ), i


def _port_filter(papers, query, max_results):
    """Direct port of the stateful loop (web_crawler_agent.py:760-792)."""
    terms = query.lower().split()
    filtered = []
    for p in papers:
        title_lower = p["title"].lower()
        if any(t in title_lower for t in terms):
            filtered.append((p["id"], "title", p["score"]))
        elif len(filtered) < max_results:
            if p["abstract"] and any(t in p["abstract"].lower() for t in terms):
                filtered.append((p["id"], "abstract", p["score"] - 10))
    return filtered


@pytest.mark.parametrize("max_results", [1, 3, 6])
def test_filter_matches_stateful_loop(spark, max_results):
    # adversarial order: abstract matches interleaved with late title hits
    titles = [
        "cancer note", "nothing", "plain", "cancer again", "misc",
        "therapy world", "quiet", "blank", "cancer end", "last",
    ]
    abstracts = [
        "", "therapy arm", "cancer cohort", "", "no match",
        "", "cancer deep", "therapy x", "", "cancer tail",
    ]
    papers = [
        {"id": i, "title": titles[i], "abstract": abstracts[i], "score": float(50 + i)}
        for i in range(10)
    ]
    want = _port_filter(papers, "cancer therapy", max_results)
    df = spark.createDataFrame(
        [(p["id"], 0, p["id"], p["title"], p["abstract"], p["score"]) for p in papers],
        "id int, group_id int, scan_order int, title string, abstract string, trend_score double",
    )
    got = (
        filter_by_query_terms(
            df, "cancer therapy", max_results, order_col="scan_order",
            group_col="group_id",
        )
        .orderBy("scan_order")
        .collect()
    )
    assert [(r["id"], r["match_kind"], r["trend_score"]) for r in got] == want


# --- property: the prefix-rank reduction == the stateful loop ------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_paper_kind = st.sampled_from(["title", "abstract", "none"])


@given(
    kinds=st.lists(_paper_kind, min_size=1, max_size=20),
    max_results=st.integers(min_value=1, max_value=8),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_filter_prefix_reduction_property(spark, kinds, max_results):
    """For ANY interleaving of title/abstract/none matches and ANY
    max_results, the window form equals the reference's stateful loop —
    the prefix argument in the module docstring, checked empirically."""
    papers = []
    for i, kind in enumerate(kinds):
        title = "cancer row" if kind == "title" else f"noise {i}"
        abstract = "therapy text" if kind == "abstract" else ""
        papers.append({"id": i, "title": title, "abstract": abstract, "score": float(i)})
    want = _port_filter(papers, "cancer therapy", max_results)
    df = spark.createDataFrame(
        [(p["id"], 0, p["id"], p["title"], p["abstract"], p["score"]) for p in papers],
        "id int, group_id int, scan_order int, title string, abstract string, trend_score double",
    )
    got = (
        filter_by_query_terms(
            df, "cancer therapy", max_results, order_col="scan_order",
            group_col="group_id",
        )
        .orderBy("scan_order")
        .collect()
    )
    assert [(r["id"], r["match_kind"], r["trend_score"]) for r in got] == want
