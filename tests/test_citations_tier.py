"""Citation-analytics tier (operators/citations.py) — semantics pinned
against a direct python port of the reference's ladders
(backend/app/api/routes/citations.py:287-695) plus hand-built graphs for
the dedup rules the planted catalog graph cannot exercise (self-cites,
citer-also-reference overlaps)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.citations import (
    citation_network_stats,
    citation_yearly_trends,
    landmark_papers,
    landmark_reasons,
    landmark_score,
    related_papers,
)


# --- direct port of citations.py:287-332 (the fuzz oracle) ---------------

def _port_score(year, cc, infl, nf, current_year=2025):
    if year is None:
        return 0.0
    age = max(1, current_year - year)
    cpy = cc / age
    if cpy >= 500:
        base = 100
    elif cpy >= 200:
        base = 80
    elif cpy >= 100:
        base = 60
    elif cpy >= 50:
        base = 40
    else:
        base = min(40, cpy * 0.8)
    score = (
        base
        + (infl / max(1, cc)) * 20
        + min(10, nf * 2)
        + (10 if age >= 10 and cc >= 1000 else 5 if age >= 5 and cc >= 500 else 0)
    )
    return min(100, score)


def _port_reasons(year, cc, infl, nf, oa, current_year=2025):
    """citations.py:333-367 — reason ladder. One pinned deviation: the
    velocity count renders with round-half-up (Spark/DuckDB round) where
    CPython's f'{x:.0f}' is round-half-even; the fuzz grid avoids exact
    .5 velocities so the port stays byte-exact."""
    reasons = []
    age = max(1, current_year - (year or current_year))
    cpy = cc / age
    if cc >= 10000:
        reasons.append(f"Exceptionally high citations ({cc:,})")
    elif cc >= 1000:
        reasons.append(f"Highly cited ({cc:,} citations)")
    if cpy >= 200:
        reasons.append(f"High citation velocity ({math.floor(cpy + 0.5)}/year)")
    if infl and infl >= 100:
        reasons.append(f"High influential citations ({infl})")
    if nf >= 3:
        reasons.append(f"Cross-disciplinary impact ({nf} fields)")
    if age >= 10 and cc >= 1000:
        reasons.append("Established foundational work")
    if oa:
        reasons.append("Open access - widely accessible")
    if not reasons:
        reasons.append("Significant contribution to the field")
    return reasons[:4]


def _meta_rows():
    """A deterministic grid crossing every ladder break: all velocity
    tiers, both count-reason branches, the influential/field/longevity
    bonuses, null years, zero citations, and the fallback reason."""
    rows = []
    i = 0
    for year in [None, 1990, 2012, 2019, 2023, 2024]:
        for cc in [0, 49, 50, 700, 999, 1000, 5000, 9999, 10000, 19000]:
            infl = (i * 37) % (cc + 1)
            nf = i % 6
            rows.append((i, year, cc, infl, nf, i % 3 == 0))
            i += 1
    return rows


@pytest.fixture(scope="module")
def meta_df(spark):
    return spark.createDataFrame(
        _meta_rows(),
        "paper_id long, year int, citation_count long, "
        "influential_citations long, n_fields int, is_open_access boolean",
    )


def test_landmark_score_matches_port(spark, meta_df):
    got = {
        r["paper_id"]: r["landmark_score"]
        for r in landmark_score(meta_df).collect()
    }
    for pid, year, cc, infl, nf, _oa in _meta_rows():
        assert got[pid] == pytest.approx(_port_score(year, cc, infl, nf)), (
            pid, year, cc, infl, nf,
        )


def test_landmark_reasons_match_port(spark, meta_df):
    got = {
        r["paper_id"]: (r["reasons"], r["n_reasons"])
        for r in landmark_reasons(meta_df).collect()
    }
    for pid, year, cc, infl, nf, oa in _meta_rows():
        want = _port_reasons(year, cc, infl, nf, oa)
        assert got[pid] == (" | ".join(want), len(want)), (pid, want, got[pid])


def test_landmark_papers_gate_sort_and_limit(spark, meta_df):
    out = landmark_papers(meta_df, limit=5).collect()
    assert len(out) == 5
    scores = [r["landmark_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert [r["rk"] for r in out] == [1, 2, 3, 4, 5]
    # the >=50-citation gate: papers below it never outrank the top-5
    pool = [
        round(_port_score(y, c, f, n), 4)
        for _i, y, c, f, n, _o in _meta_rows()
        if c >= 50
    ]
    assert scores == sorted(pool, reverse=True)[:5]


# --- graph semantics on hand-built edges ---------------------------------

@pytest.fixture(scope="module")
def tiny_graph(spark):
    # A cites B, C; B cites A (so A<->B overlap); C cites C (self-cite);
    # D cites A twice is impossible in a set — D cites A, B.
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "C"), ("B", "A"), ("C", "C"), ("D", "A"), ("D", "B")],
        "citing_id string, cited_id string",
    )
    meta = spark.createDataFrame(
        [("A", 2020, 100), ("B", 2021, 40), ("C", None, 7), ("D", 2019, 1000)],
        "paper_id string, year int, citation_count long",
    )
    return edges, meta


def test_network_stats_self_cite_and_overlap(spark, tiny_graph):
    edges, meta = tiny_graph
    out = {r["center"]: r for r in citation_network_stats(edges, meta).collect()}

    # Center A: refs {B, C}; citers {B, D}. B is already a reference node
    # (first-wins, the citer is not re-added); D is a new citation node.
    # Nodes = A,B,C,D = 4. Edges = 2 refs + 2 citations = 4 (the deduped
    # B still contributes its edge). The stats block counts NODES per
    # type: 2 references, 1 citation (D only).
    a = out["A"]
    assert (a["total_nodes"], a["total_edges"]) == (4, 4)
    assert (a["references_count"], a["citations_count"]) == (2, 1)
    assert a["avg_citations"] == pytest.approx((100 + 40 + 7 + 1000) / 4)

    # Center C: self-reference C->C (node deduped — the center is already
    # seen — but the edge appended) plus citer A (new node) and citer C
    # (deduped, edge appended): 2 nodes, 3 edges, 0 reference nodes,
    # 1 citation node — exactly the reference's seen-ids walk.
    c = out["C"]
    assert (c["total_nodes"], c["total_edges"]) == (2, 3)
    assert (c["references_count"], c["citations_count"]) == (0, 1)
    assert c["avg_citations"] == pytest.approx((7 + 100) / 2)


def test_related_papers_cites_this_wins_dedup(spark, tiny_graph):
    edges, meta = tiny_graph
    out = related_papers(edges, meta).collect()
    # For center A, paper B is both a citer of A and a reference of A:
    # the reference appends citations first and sorts stably -> one row,
    # relation cites_this.
    a_rows = {r["related_id"]: r for r in out if r["center"] == "A"}
    assert a_rows["B"]["relation"] == "cites_this"
    assert a_rows["B"]["relevance"] == 40
    # self-edges never surface: C is related to A (reference), C->C dropped
    c_rows = [r for r in out if r["center"] == "C" and r["related_id"] == "C"]
    assert c_rows == []
    # ranking: relevance desc — for A: D (1000) > B (40) > C (7)
    ranked = sorted((r for r in out if r["center"] == "A"), key=lambda r: r["rk"])
    assert [r["related_id"] for r in ranked] == ["D", "B", "C"]


def test_yearly_trends_null_year_skipped_and_peak_tie(spark):
    edges = spark.createDataFrame(
        [("u1", "X"), ("u2", "X"), ("u3", "X"), ("u4", "X"), ("u5", "X")],
        "citing_id string, cited_id string",
    )
    # u1,u2 in 2019; u3,u4 in 2021; u5 has no year (skipped): tie 2019
    # vs 2021 at n=2 -> earliest year flagged as peak (the pinned rule).
    meta = spark.createDataFrame(
        [("u1", 2019), ("u2", 2019), ("u3", 2021), ("u4", 2021), ("u5", None)],
        "paper_id string, year int",
    )
    out = {r["year"]: r for r in citation_yearly_trends(edges, meta).collect()}
    assert set(out) == {2019, 2021}
    assert out[2019]["n_citing"] == 2 and out[2021]["n_citing"] == 2
    assert out[2019]["is_peak"] == 1 and out[2021]["is_peak"] == 0


# --- property: the score ladder == the reference port for arbitrary
# metadata ---------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=1900, max_value=2025)),
            st.integers(min_value=0, max_value=30000),   # citations
            st.integers(min_value=0, max_value=30000),   # influential (clamped)
            st.integers(min_value=0, max_value=8),       # fields
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_landmark_score_property(spark, rows):
    data = [
        (i, y, cc, min(infl, cc), nf, oa)
        for i, (y, cc, infl, nf, oa) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "paper_id long, year int, citation_count long, "
        "influential_citations long, n_fields int, is_open_access boolean",
    )
    got = {r["paper_id"]: r["landmark_score"] for r in landmark_score(df).collect()}
    for i, y, cc, infl, nf, _oa in data:
        assert got[i] == pytest.approx(_port_score(y, cc, infl, nf)), (i, y, cc, infl, nf)
