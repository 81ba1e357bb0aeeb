"""Research-gap mining (operators/research_gaps.py) vs a pure-python port
of the reference extraction/scoring (research_gaps.py:221-301)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.research_gaps import (
    GAP_PATTERNS,
    gap_priority_scores,
    gap_sentences,
)

# ------------------------------------------------------------ python port


def _extract(text, gap_type):
    sentences = re.split(r"(?<=[.!?])\s+", text)
    out = []
    for s in sentences:
        for p in GAP_PATTERNS[gap_type]:
            if re.search(p, s, re.IGNORECASE):
                clean = s.strip()[:300]
                if len(clean) > 50:
                    out.append(clean)
                break
    return out[:5]


def _priority(ratio, evidence, total):
    rs = min(100, ratio * 1000)
    es = 30 if evidence < 5 else 80 if evidence < 20 else 60 if evidence < 50 else 40
    vs = 90 if total < 100 else 70 if total < 500 else 50 if total < 2000 else 30
    return round(rs * 0.4 + es * 0.35 + vs * 0.25, 1)


DOCS = [
    (0, "The assay worked well. Future research is needed to validate these "
        "findings across larger multi-institution cohorts. The signaling "
        "mechanism remains unclear in most treated patient populations. "
        "Short gap. It is unclear whether the benefit extends to earlier "
        "disease stages of this malignancy."),
    (1, "There is limited evidence about the durability of response in "
        "elderly patients! More research is needed before adoption. "
        "Nothing else to report here today."),
    (2, "Plain text with no gap indicators whatsoever, just methods."),
    (3, "x. " + " ".join(
        f"Whether subgroup {i} benefit remains unclear under the protocol "
        "in long-term follow-up." for i in range(8))),
]


def test_gap_sentences_match_port(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = gap_sentences(df, "doc_id", "text").collect()
    got = {}
    for r in rows:
        got.setdefault((r["id"], r["gap_type"]), []).append((r["gap_idx"], r["sentence"]))
    for did, text in DOCS:
        for gt in GAP_PATTERNS:
            want = _extract(text, gt)
            mine = [s for _i, s in sorted(got.get((did, gt), []))]
            assert mine == want, (did, gt, mine, want)
    # crafted branches: the <=50-char sentence dropped; doc 2 silent
    assert (0, "future_research") in got and (0, "unclear_mechanism") in got
    assert all(k[0] != 2 for k in got)
    # doc 3 packs 8 qualifying emerging questions into ONE sentence-free
    # blob? no — single sentence, so one match; cap logic pinned below
    assert len(got.get((3, "emerging_question"), [])) <= 5


def test_gap_cap_at_five(spark):
    text = " ".join(
        f"It is unclear whether arm {i} benefits from maintenance therapy "
        "over longer horizons." for i in range(9)
    )
    df = spark.createDataFrame([(9, text)], "doc_id long, text string")
    rows = gap_sentences(df, "doc_id", "text").collect()
    em = [r for r in rows if r["gap_type"] == "emerging_question"]
    assert len(em) == 5 == len(_extract(text, "emerging_question"))
    assert [r["gap_idx"] for r in sorted(em, key=lambda r: r["gap_idx"])] == [1, 2, 3, 4, 5]


def test_priority_ladders_match_port(spark):
    cases = [
        (0.2, 10, 50), (0.05, 4, 99), (0.05, 5, 100), (0.02, 19, 499),
        (0.01, 20, 500), (0.001, 49, 1999), (0.0005, 50, 2000), (0.0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, r, e, t) for i, (r, e, t) in enumerate(cases)],
        "gid long, gap_ratio double, evidence_count long, total_papers long",
    )
    got = {r["gid"]: r["priority_score"] for r in gap_priority_scores(df).collect()}
    for i, (r, e, t) in enumerate(cases):
        assert got[i] == pytest.approx(_priority(r, e, t), abs=1e-6), (i, cases[i])
