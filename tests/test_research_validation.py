"""Research-validation scoring (operators/research_validation.py) vs a
pure-python port of the reference math (validator.py:86-415)."""

from __future__ import annotations

import math
import re

import pytest

from vectordb_bioinsight_spark.operators.research_validation import (
    CONSISTENCY_PAIRS,
    COVERAGE_STOPWORDS,
    claim_validation,
    paper_consistency,
    summary_validation,
)

# ------------------------------------------------------------ python port


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    n1 = math.sqrt(sum(x * x for x in a))
    n2 = math.sqrt(sum(y * y for y in b))
    if n1 == 0 or n2 == 0:
        return 0.0
    return dot / (n1 * n2)


def _words(t):
    return set(re.findall(r"\b[a-z]{4,}\b", t.lower())) - set(COVERAGE_STOPWORDS)


def _summary_port(s_emb, s_text, chunks):
    sims = [_cos(s_emb, e) for e, _t in chunks]
    avg, mx = sum(sims) / len(sims), max(sims)
    orig = set().union(*[_words(t) for _e, t in chunks])
    summ = _words(s_text)
    cov = len(orig & summ) / len(orig) if orig else 0.0
    sim_s, cov_s = avg * 100, cov * 100
    cons_s = (mx * 0.6 + avg * 0.4) * 100
    return avg, mx, cov, sim_s, cov_s, cons_s, sim_s * 0.4 + cov_s * 0.3 + cons_s * 0.3


PAPER_CHUNKS = {
    "p1": [
        ([1.0, 0.0, 0.0, 0.0], "tumor growth suppressed strongly here"),
        ([0.8, 0.6, 0.0, 0.0], "expression analysis shows tumor suppression"),
        ([0.0, 0.0, 0.0, 0.0], "metadata only stub chunk"),  # zero norm -> cos 0
    ],
    "p2": [
        ([0.0, 1.0, 0.0, 0.0], "completely different topic about networks"),
        ([0.0, 0.9, 0.1, 0.0], "graph networks and pathways considered"),
    ],
}
SUMMARIES = {
    "p1": ([0.9, 0.1, 0.0, 0.0], "summary about tumor suppression evidence"),
    "p2": ([1.0, 0.0, 0.0, 0.0], "orthogonal summary text entirely"),
}


def test_summary_validation_matches_port(spark):
    chunks = spark.createDataFrame(
        [(p, e, t) for p, cs in PAPER_CHUNKS.items() for e, t in cs],
        "paper string, c_emb array<double>, c_text string",
    )
    summaries = spark.createDataFrame(
        [(p, e, t) for p, (e, t) in SUMMARIES.items()],
        "paper string, s_emb array<double>, s_text string",
    )
    got = {r["paper"]: r for r in summary_validation(
        summaries, chunks, "paper", "s_emb", "s_text", "c_emb", "c_text"
    ).collect()}
    for p, (s_emb, s_text) in SUMMARIES.items():
        avg, mx, cov, sim_s, cov_s, cons_s, overall = _summary_port(
            s_emb, s_text, PAPER_CHUNKS[p]
        )
        r = got[p]
        assert r["avg_similarity"] == pytest.approx(avg, abs=1e-6)
        assert r["max_similarity"] == pytest.approx(mx, abs=1e-6)
        assert r["coverage"] == pytest.approx(cov, abs=1e-6)
        assert r["overall_confidence"] == pytest.approx(overall, abs=1e-4)
    # the crafted discriminations: p1's summary shares 'tumor'/'suppression'
    assert got["p1"]["coverage"] > 0 and got["p2"]["coverage"] == 0.0
    assert got["p1"]["max_similarity"] > got["p2"]["max_similarity"]


def test_claim_validation_thresholds_and_coverage(spark):
    rows = [
        ("c1", "pa", 0.9), ("c1", "pb", 0.7), ("c1", "pa", 0.5),
        ("c1", "pc", 0.2), ("c1", "pd", 0.1),
        ("c2", "pa", 0.4), ("c2", "pb", 0.35),
    ]
    df = spark.createDataFrame(rows, "claim string, paper string, sim double")
    got = {r["claim"]: r for r in claim_validation(
        df, "claim", "paper", "sim", corpus_count=500
    ).collect()}
    c1 = got["c1"]
    assert (c1["n_supporting"], c1["n_conflicting"], c1["n_unique_papers"]) == (2, 2, 4)
    avg = (0.9 + 0.7 + 0.5 + 0.2 + 0.1) / 5
    cov = min(4 / (500 / 50) * 100, 100)
    cons = 2 / 5 * 100
    assert c1["similarity_score"] == pytest.approx(avg * 100, abs=1e-4)
    assert c1["coverage_score"] == pytest.approx(cov, abs=1e-6)
    assert c1["overall_confidence"] == pytest.approx(
        avg * 100 * 0.4 + cov * 0.3 + cons * 0.3, abs=1e-4
    )
    c2 = got["c2"]
    assert c2["n_supporting"] == 0 and c2["n_conflicting"] == 0  # mid band
    # corpus_count below 50 -> denominator floors at 1 (validator.py:220)
    tiny = claim_validation(df, "claim", "paper", "sim", corpus_count=10).collect()
    t1 = {r["claim"]: r for r in tiny}["c1"]
    assert t1["coverage_score"] == 100.0  # min(4/1*100, 100)


def test_paper_consistency_pairs_and_fallbacks(spark):
    rows = [
        # paper q1: Abstract + ConclusionS (plural fallback) + Results +
        # Methods; NO Introduction/Discussion -> that pair drops
        ("q1", "Abstract", [1.0, 0.0, 0.0]),
        ("q1", "Abstract", [0.8, 0.2, 0.0]),   # 2 chunks -> mean
        ("q1", "Conclusions", [0.9, 0.1, 0.0]),
        ("q1", "Results", [0.0, 1.0, 0.0]),
        ("q1", "Methods", [0.0, 0.0, 1.0]),
        # paper q2: only one section -> zero resolvable pairs -> drops
        ("q2", "Abstract", [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "paper string, section string, emb array<double>")
    out = {r["paper"]: r for r in paper_consistency(
        df, "paper", "section", "emb"
    ).collect()}
    assert "q2" not in out
    q1 = out["q1"]
    abstract = [0.9, 0.1, 0.0]
    want = [
        _cos(abstract, [0.9, 0.1, 0.0]),   # Abstract-Conclusion via plural
        _cos(abstract, [0.0, 1.0, 0.0]),   # Abstract-Results
        _cos([0.0, 0.0, 1.0], [0.0, 1.0, 0.0]),  # Methods-Results
    ]
    assert q1["n_pairs"] == 3 and q1["n_sections"] == 4
    assert q1["consistency_score"] == pytest.approx(sum(want) / 3 * 100, abs=1e-4)
    assert q1["similarity_score"] == pytest.approx(max(want) * 100, abs=1e-4)
    assert q1["coverage_score"] == pytest.approx(4 / 5 * 100, abs=1e-6)


def test_consistency_exact_beats_plural(spark):
    rows = [
        ("q", "Conclusion", [1.0, 0.0]),
        ("q", "Conclusions", [0.0, 1.0]),  # must LOSE to the exact name
        ("q", "Abstract", [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "paper string, section string, emb array<double>")
    q = paper_consistency(df, "paper", "section", "emb").collect()[0]
    # Abstract-Conclusion resolves to the EXACT 'Conclusion' -> cosine 1
    assert q["similarity_score"] == pytest.approx(100.0, abs=1e-6)
    assert len(CONSISTENCY_PAIRS) == 4
