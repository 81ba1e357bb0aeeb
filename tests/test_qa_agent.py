"""QA paper-agent retrieval path (operators/qa_agent.py) — pinned against
direct python ports of JunkContentValidator / ConfidenceEstimator /
_filter_results / _build_context (paper_agent.py:21-98, 297-333)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.qa_agent import (
    BASE_CONFIDENCE,
    CITATION_BONUS,
    JUNK_KEYWORDS,
    JUNK_KEYWORD_THRESHOLD,
    MAX_CITATION_BONUS,
    MIN_RELEVANCE_SCORE,
    QA_STOP_WORDS,
    UNCERTAINTY_PENALTY,
    UNCERTAINTY_PHRASES,
    answer_confidence,
    build_context,
    filter_results,
    junk_flag,
    question_relevance,
)


def _port_is_junk(text: str) -> bool:
    low = text.lower()
    if sum(1 for kw in JUNK_KEYWORDS if kw in low) >= JUNK_KEYWORD_THRESHOLD:
        return True
    return bool(re.match(r"^\d+\.\s+[A-Z][a-z]+\s+[A-Z]{1,2}[,.]", text))


def _port_confidence(answer: str) -> float:
    conf = BASE_CONFIDENCE
    for p in UNCERTAINTY_PHRASES:
        if p in answer.lower():
            conf -= UNCERTAINTY_PENALTY
            break
    conf += min(len(re.findall(r"\[\d+\]", answer)) * CITATION_BONUS,
                MAX_CITATION_BONUS)
    return max(0.0, min(1.0, conf))


_TEXTS = [
    "Author contributions: writing, editing, review, conceptualization done.",
    "writing and editing only",  # 2 keywords < threshold
    "1. Smith A, Jones B. Cancer genomics. 2019.",
    "12. Doe J. methods paper",  # J is 1 cap letter before '.'? pattern needs [A-Z][a-z]+ then [A-Z]{1,2}[,.]
    "Normal results paragraph about tumor growth.",
    "methodology validation investigation supervision visualization",  # 5 kws
]

_ANSWERS = [
    "Clear effect shown.",
    "The result is unclear and may vary; possibly noise.",  # penalty once
    "Supported [1] [2].",
    "Heavily cited [1] [2] [3] [4] [5] [6] [7].",  # bonus caps at 0.2
    "cannot find the answer [1]",
]


def test_junk_flag_matches_port(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)], "i int, t string")
    got = {r["i"]: r["j"] for r in df.select("i", junk_flag(F.col("t")).alias("j")).collect()}
    for i, t in enumerate(_TEXTS):
        assert got[i] == _port_is_junk(t), (i, t)


def test_answer_confidence_matches_port(spark):
    df = spark.createDataFrame([(i, a) for i, a in enumerate(_ANSWERS)], "i int, a string")
    got = {r["i"]: r["c"] for r in df.select("i", answer_confidence(F.col("a")).alias("c")).collect()}
    for i, a in enumerate(_ANSWERS):
        assert got[i] == pytest.approx(_port_confidence(a)), (i, a)


def test_question_relevance_stopwords(spark):
    df = spark.createDataFrame(
        [(0, "the tumor grows fast"), (1, "nothing matching here at all")],
        "i int, c string",
    )
    # 'what is the tumor' -> only 'tumor' survives the stopword strip
    got = {
        r["i"]: r["rel"]
        for r in df.select(
            "i", question_relevance(F.col("c"), "what is the tumor").alias("rel")
        ).collect()
    }
    assert got[0] is True and got[1] is False
    # an all-stopword question matches everything
    all_stop = " ".join(QA_STOP_WORDS[:4])
    got2 = df.select(question_relevance(F.col("c"), all_stop).alias("rel")).collect()
    assert all(r["rel"] for r in got2)


def test_filter_results_strict_and_fallback(spark):
    junk = _TEXTS[0]
    rows = [
        # query A: one strict survivor (score >= 10, not junk)
        ("A", 1, "good content", 50.0),
        ("A", 2, junk, 80.0),          # junk, dropped despite score
        ("A", 3, "low content", 5.0),  # below floor, dropped (strict mode)
        # query B: nothing passes -> fallback keeps top-3 non-junk
        ("B", 1, junk, 90.0),
        ("B", 2, "weak one", 3.0),
        ("B", 3, "weak two", 2.0),
        ("B", 4, "weak three beyond top3", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, rank int, content string, relevance_score double"
    )
    kept = filter_results(df, "tumor").collect()
    a = sorted(r["rank"] for r in kept if r["query_id"] == "A")
    b = sorted(r["rank"] for r in kept if r["query_id"] == "B")
    assert a == [1]
    assert b == [2, 3]  # top-3 window minus the junk row; rank 4 excluded
    assert all(r["used_fallback"] == 0 for r in kept if r["query_id"] == "A")
    assert all(r["used_fallback"] == 1 for r in kept if r["query_id"] == "B")


def test_build_context_numbering_and_separator(spark):
    df = spark.createDataFrame(
        [("Q", 2, "second chunk", "Methods", 0), ("Q", 1, "first chunk", None, 0)],
        "query_id string, rank int, content string, section string, used_fallback int",
    )
    row = build_context(df).collect()[0]
    assert row["n_sources"] == 2
    want = (
        "[Source 1] Section: Unknown\nContent: first chunk"
        "\n\n---\n\n"
        "[Source 2] Section: Methods\nContent: second chunk"
    )
    assert row["context"] == want


# --- property: confidence model == the port for generated answers ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_frags = st.sampled_from(
    ["clear result", "unclear", "may", "might", "possibly", "cannot find",
     "not mentioned", "[1]", "[2]", "[17]", "solid", "evidence"]
)


@given(parts=st.lists(_frags, min_size=0, max_size=12))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_answer_confidence_property(spark, parts):
    answer = " ".join(parts)
    df = spark.createDataFrame([(answer,)], "a string")
    got = df.select(answer_confidence(F.col("a")).alias("c")).collect()[0]["c"]
    assert got == pytest.approx(_port_confidence(answer)), answer
