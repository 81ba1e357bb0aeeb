"""Dynamic keyword discovery (operators/keyword_discovery.py) vs a
pure-python port of the reference (dynamic_trends.py:127-211, 455-496)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.keyword_discovery import (
    BIGRAM_STOPWORDS,
    BIO_STOPWORDS,
    PRIORITY_TERMS,
    extract_keywords,
    extract_keywords_arrow,
    keyword_counts,
    keyword_growth,
    meaningful_keywords,
)

# ------------------------------------------------------------ python port


def _extract(text, min_length=3):
    if not text:
        return []
    text = re.sub(r"[^\w\s-]", " ", text.lower())
    words = text.split()
    out = []
    for w in words:
        if len(w) >= min_length and w not in BIO_STOPWORDS:
            out.append(w)
    for i in range(len(words) - 1):
        bg = f"{words[i]} {words[i+1]}"
        if words[i] not in BIO_STOPWORDS or words[i + 1] not in BIO_STOPWORDS:
            if len(bg) >= 6:
                out.append(bg)
    for i in range(len(words) - 2):
        tg = f"{words[i]} {words[i+1]} {words[i+2]}"
        if any(t in tg for t in PRIORITY_TERMS):
            out.append(tg)
    return out


def _meaningful(counts, min_count=3):
    filtered = {}
    for kw, n in counts.items():
        if n < min_count or kw.isdigit() or len(kw) < 4:
            continue
        if kw in BIO_STOPWORDS or kw in BIGRAM_STOPWORDS:
            continue
        ws = kw.split()
        if len(ws) >= 2 and (ws[0] in BIO_STOPWORDS or ws[-1] in BIO_STOPWORDS):
            if not any(t in kw for t in PRIORITY_TERMS):
                continue
        score = n * 2 if any(t in kw for t in PRIORITY_TERMS) else n
        filtered[kw] = score
    return filtered


TEXTS = [
    "CRISPR base editing improves organoid models; single-cell RNA atlases "
    "grow. The microbiome shapes immunotherapy response!",
    "We found that machine learning predicts response, but the study of the "
    "cohort was small (n=42).",
    "liquid biopsy ctDNA assays detect relapse early; exosome cargo too.",
    "",
    "the and for with",  # pure stopwords
] * 3  # x3 so counts clear min_count


def test_extract_matches_port(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "i long, text string")
    got = {r["i"]: r["k"] for r in df.select(
        "i", extract_keywords(F.col("text")).alias("k")).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _extract(t), (i, t, got[i], _extract(t))


def test_arrow_kernel_matches_expression_kernel(spark):
    """The Arrow kernel (the keyword_counts default since r08) must emit
    byte-identical candidate arrays to the expression tree — fixed texts
    plus a punctuation/stopword/priority fuzz."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "i long, text string")
    both = df.select(
        "i",
        extract_keywords(F.col("text")).alias("e"),
        extract_keywords_arrow(F.col("text")).alias("a"),
    ).collect()
    for r in both:
        assert r["e"] == r["a"], (r["i"], r["e"], r["a"])

    piece = st.sampled_from(
        ["crispr", "the", "organoid", "machine", "learning", "n=42", "x",
         "gut-brain", "--", "deep learning!", "(cells)", "a  b", ";", "42"]
    )

    @given(st.lists(piece, min_size=0, max_size=12))
    @settings(max_examples=15, deadline=None)
    def fuzz(parts):
        text = " ".join(parts)
        row = (
            spark.range(1)
            .select(
                extract_keywords(F.lit(text)).alias("e"),
                extract_keywords_arrow(F.lit(text)).alias("a"),
            )
            .first()
        )
        assert row["e"] == row["a"], (text, row["e"], row["a"])

    fuzz()


def test_counts_and_meaningful_match_port(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    counts = keyword_counts(df, "text")
    got_counts = {r["keyword"]: r["n"] for r in counts.collect()}
    want = Counter()
    for t in TEXTS:
        want.update(_extract(t))
    assert got_counts == dict(want)
    got_scores = {r["keyword"]: (r["n"], r["score"]) for r in
                  meaningful_keywords(counts).collect()}
    want_scores = _meaningful(want)
    assert {k: s for k, (_n, s) in got_scores.items()} == want_scores
    # priority boost fired somewhere real
    assert got_scores["crispr base editing"][1] == 2 * got_scores["crispr base editing"][0]
    # 'n=42' digits cleaned into '42' then dropped by the digit rule
    assert "42" not in got_scores


def test_growth_bands_match_port(spark):
    mk = lambda rows: spark.createDataFrame(rows, "keyword string, n long")
    recent = mk([("organoid", 10), ("exosome", 6), ("ctdna", 4), ("fading", 1),
                 ("gone", 0), ("steady", 10), ("the", 50), ("abc", 9)])
    prev = mk([("exosome", 4), ("ctdna", 8), ("fading", 5), ("gone", 7),
               ("steady", 9), ("the", 50), ("abc", 9)])
    got = {r["keyword"]: r for r in keyword_growth(recent, prev).collect()}
    assert "the" not in got          # stopword
    assert "abc" not in got          # len < 4
    assert got["organoid"]["band"] == "emerging" and got["organoid"]["is_emerging"]
    assert got["organoid"]["growth_rate"] == 100.0  # zero-baseline rule
    assert got["exosome"]["band"] == "emerging"     # +50 -> >30 band
    assert got["exosome"]["is_emerging"] is False   # not > 50, not new
    assert got["ctdna"]["band"] == "declining"      # -50
    assert got["fading"]["band"] == "declining" and got["fading"]["growth_rate"] == -80.0
    assert got["gone"]["band"] == "declining" and got["gone"]["growth_rate"] == -100.0
    assert got["steady"]["band"] == "stable"
