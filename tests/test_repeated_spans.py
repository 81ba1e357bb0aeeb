"""ExactSubstr repeated-span detection: planted shared passages recovered."""

from __future__ import annotations

import pytest

from vectordb_bioinsight_spark.operators.dedup import (
    duplicated_token_fraction,
    repeated_ngram_spans,
)

# 12 unique filler tokens keep docs un-duplicated outside the planted passage
_SHARED = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"  # 10 tokens


@pytest.fixture(scope="module")
def planted_docs(spark):
    uniq = lambda p, k: " ".join(f"{p}{i:03d}xx" for i in range(k))
    rows = [
        # docs 1 & 2 share the 10-token passage at known offsets
        (1, f"{uniq('aaa', 6)} {_SHARED} {uniq('bbb', 6)}"),
        (2, f"{uniq('ccc', 3)} {_SHARED} {uniq('ddd', 9)}"),
        # doc 3 has no cross-doc n-gram
        (3, uniq("eee", 25)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_span_recovered(planted_docs):
    spans = repeated_ngram_spans(planted_docs, "doc_id", "text", n=5, min_docs=2).collect()
    by_doc = {r["doc_id"]: r for r in spans}
    assert set(by_doc) == {1, 2}
    # doc 1: passage tokens at positions 6..15; 6 five-gram starts (6..11)
    assert (by_doc[1]["span_start"], by_doc[1]["span_end"]) == (6, 15)
    assert by_doc[1]["n_dup_ngrams"] == 6
    # doc 2: passage at positions 3..12
    assert (by_doc[2]["span_start"], by_doc[2]["span_end"]) == (3, 12)
    assert by_doc[2]["n_dup_ngrams"] == 6


def test_disjoint_spans_not_merged(spark):
    shared2 = "kilo lima mike november oscar"
    rows = [
        (1, f"{_SHARED} one111xx two222xx three333xx four444xx five555xx six666xx {shared2}"),
        (2, f"{_SHARED} zzz000xx {shared2}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_ngram_spans(docs, "doc_id", "text", n=5, min_docs=2)
    d1 = sorted(
        [(r["span_start"], r["span_end"]) for r in spans.filter("doc_id = 1").collect()]
    )
    # doc 1: gap of 6 unique tokens (> n) separates the passages -> 2 spans
    assert d1 == [(0, 9), (16, 20)]


def test_dup_token_fraction(planted_docs):
    fr = {
        r["doc_id"]: r
        for r in duplicated_token_fraction(
            planted_docs, "doc_id", "text", n=5, min_docs=2
        ).collect()
    }
    assert fr[3]["dup_tokens"] == 0 and fr[3]["dup_frac"] == 0.0
    assert fr[1]["dup_tokens"] == 10 and fr[1]["n_tokens"] == 22
    assert fr[1]["dup_frac"] == round(10 / 22, 4)
    assert fr[2]["dup_tokens"] == 10


def test_remove_token_spans_cuts_planted_passage(planted_docs):
    from vectordb_bioinsight_spark.operators.cleaning import remove_token_spans

    spans = repeated_ngram_spans(planted_docs, "doc_id", "text", n=5, min_docs=2)
    out = {r["doc_id"]: r for r in remove_token_spans(planted_docs, spans, "doc_id", "text").collect()}
    # doc 1: 22 tokens, 10-token passage removed
    assert out[1]["n_tokens"] == 22 and out[1]["n_removed"] == 10
    assert "alpha" not in out[1]["clean_text"] and "aaa000xx" in out[1]["clean_text"]
    # kept tokens preserve original order
    assert out[1]["clean_text"].split() == (
        [f"aaa{i:03d}xx" for i in range(6)] + [f"bbb{i:03d}xx" for i in range(6)]
    )
    # untouched doc passes through whole
    assert out[3]["n_removed"] == 0 and len(out[3]["clean_text"].split()) == 25


def test_remove_token_spans_keeps_zero_token_docs(spark):
    """A doc whose text tokenizes to nothing must still appear in the output
    as (id, '', 0, 0) — not vanish because posexplode yields no rows."""
    from vectordb_bioinsight_spark.operators.cleaning import remove_token_spans

    rows = [(1, "alpha bravo charlie"), (2, "!!! ... ---"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 0, 0)], "doc_id long, span_start long, span_end long"
    )
    out = {r["doc_id"]: r for r in remove_token_spans(docs, spans, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 3 and out[1]["n_removed"] == 1
    for empty_id in (2, 3):
        r = out[empty_id]
        assert (r["clean_text"], r["n_tokens"], r["n_removed"]) == ("", 0, 0)
