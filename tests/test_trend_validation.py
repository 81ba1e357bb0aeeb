"""Trend-validation scoring (operators/trend_validation.py) vs a
pure-python port of the reference ladders (trend_validator.py:561-733)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.trend_validation import (
    WEIGHTS,
    corpus_trend_signals,
    validate_trend_scores,
)

# ------------------------------------------------------------ python port


def _pub(g5, yoy, total):
    s = 0.0
    if g5 >= 100: s += 50
    elif g5 >= 50: s += 40
    elif g5 >= 25: s += 30
    elif g5 >= 10: s += 20
    elif g5 > 0: s += 10
    if yoy >= 30: s += 30
    elif yoy >= 15: s += 20
    elif yoy >= 5: s += 10
    if total >= 10000: s += 20
    elif total >= 5000: s += 15
    elif total >= 1000: s += 10
    elif total >= 100: s += 5
    return min(100, s)


def _div(uj, hij):
    s = 0.0
    if uj >= 50: s += 60
    elif uj >= 30: s += 45
    elif uj >= 15: s += 30
    elif uj >= 5: s += 15
    if hij >= 5: s += 40
    elif hij >= 3: s += 30
    elif hij >= 1: s += 15
    return min(100, s)


def _rev(sr, ma):
    s = 0.0
    if sr >= 50: s += 60
    elif sr >= 20: s += 45
    elif sr >= 10: s += 30
    elif sr >= 5: s += 20
    elif sr >= 1: s += 10
    if ma >= 20: s += 40
    elif ma >= 10: s += 30
    elif ma >= 5: s += 20
    elif ma >= 1: s += 10
    return min(100, s)


def _clin(trials, p3):
    s = 0.0
    if trials >= 100: s += 70
    elif trials >= 50: s += 55
    elif trials >= 20: s += 40
    elif trials >= 10: s += 25
    elif trials >= 1: s += 10
    if p3 >= 10: s += 30
    elif p3 >= 5: s += 20
    elif p3 >= 1: s += 10
    return min(100, s)


def _gap(ratio):
    if ratio >= 10: return 100
    if ratio >= 7: return 80
    if ratio >= 5: return 60
    if ratio >= 3: return 40
    if ratio >= 1: return 20
    return 10


def _score(row):
    pub = _pub(row["growth_rate_5yr"], row["growth_rate_yoy"], row["total_papers_5yr"])
    div = _div(row["unique_journals"], row["high_if_journals"])
    rev = _rev(row["systematic_reviews"], row["meta_analyses"])
    clin = _clin(row["active_clinical_trials"], row["phase3_trials"])
    gap = _gap(row["gap_ratio"])
    total = (pub * WEIGHTS["publication"] + div * WEIGHTS["diversity"]
             + rev * WEIGHTS["review"] + clin * WEIGHTS["clinical"]
             + gap * WEIGHTS["gap"])
    conf = ("high" if total >= 80 else "medium" if total >= 50
            else "emerging" if total >= 30 else "uncertain")
    return pub, div, rev, clin, gap, total, conf


_SIG_SCHEMA = (
    "keyword string, total_papers_5yr long, growth_rate_5yr double, "
    "growth_rate_yoy double, unique_journals long, high_if_journals long, "
    "systematic_reviews long, meta_analyses long, active_clinical_trials long, "
    "phase3_trials long, future_research_mentions long, gap_ratio double"
)


def _sig(k, total=0, g5=0.0, yoy=0.0, uj=0, hij=0, sr=0, ma=0, tr=0, p3=0, gapr=0.0):
    return (k, total, g5, yoy, uj, hij, sr, ma, tr, p3, 0, gapr)


CASES = [
    _sig("hot", total=12000, g5=150.0, yoy=45.0, uj=60, hij=7, sr=55, ma=25, tr=120, p3=12, gapr=11.0),
    _sig("boundary_all", total=10000, g5=100.0, yoy=30.0, uj=50, hij=5, sr=50, ma=20, tr=100, p3=10, gapr=10.0),
    _sig("mid", total=5000, g5=50.0, yoy=15.0, uj=30, hij=3, sr=20, ma=10, tr=50, p3=5, gapr=7.0),
    _sig("low", total=1000, g5=25.0, yoy=5.0, uj=15, hij=1, sr=10, ma=5, tr=20, p3=1, gapr=5.0),
    _sig("lower", total=100, g5=10.0, uj=5, sr=5, ma=1, tr=10, gapr=3.0),
    _sig("barely", total=99, g5=0.5, sr=1, tr=1, gapr=1.0),
    _sig("dead"),
    _sig("neg_growth", total=500, g5=-40.0, yoy=-10.0, uj=4, gapr=0.5),
    _sig("conf_50", total=1000, g5=25.0, yoy=15.0, uj=30, hij=3, sr=10, ma=5, tr=20, p3=1, gapr=5.0),
]


def test_ladders_match_port(spark):
    df = spark.createDataFrame(CASES, _SIG_SCHEMA)
    got = {r["keyword"]: r for r in validate_trend_scores(df).collect()}
    for row_t in CASES:
        row = dict(zip([c.split()[0] for c in _SIG_SCHEMA.split(", ")], row_t))
        pub, div, rev, clin, gap, total, conf = _score(row)
        r = got[row["keyword"]]
        assert r["publication_score"] == pub, (row["keyword"], r, pub)
        assert r["diversity_score"] == div
        assert r["review_score"] == rev
        assert r["clinical_score"] == clin
        assert r["gap_score"] == gap
        assert r["total_score"] == pytest.approx(total, abs=0.051)
        assert r["confidence_level"] == conf, (row["keyword"], total)
    assert got["hot"]["confidence_level"] == "high"
    assert got["hot"]["publication_score"] == 100.0
    assert got["boundary_all"]["publication_score"] == 100.0  # 50+30+20
    assert got["dead"]["gap_score"] == 10.0  # baseline, never 0
    assert got["dead"]["confidence_level"] == "uncertain"
    assert got["neg_growth"]["publication_score"] == 5.0  # volume bonus only


def test_ladder_fuzz_vs_port(spark):
    import random

    rng = random.Random(20260815)
    keys = [c.split()[0] for c in _SIG_SCHEMA.split(", ")]
    rows = []
    for i in range(300):
        rows.append((
            f"k{i}", rng.choice([0, 50, 99, 100, 999, 1000, 5000, 10000, 20000]),
            float(rng.choice([-50, 0, 0.1, 5, 9.99, 10, 24.9, 25, 49, 50, 99, 100, 300])),
            float(rng.choice([-5, 0, 4.9, 5, 14.9, 15, 29.9, 30, 60])),
            rng.choice([0, 4, 5, 14, 15, 29, 30, 49, 50, 80]),
            rng.choice([0, 1, 2, 3, 4, 5, 9]),
            rng.choice([0, 1, 4, 5, 9, 10, 19, 20, 49, 50, 70]),
            rng.choice([0, 1, 4, 5, 9, 10, 19, 20, 31]),
            rng.choice([0, 1, 9, 10, 19, 20, 49, 50, 99, 100, 150]),
            rng.choice([0, 1, 4, 5, 9, 10, 15]),
            0,
            float(rng.choice([0, 0.9, 1, 2.9, 3, 4.9, 5, 6.9, 7, 9.9, 10, 14])),
        ))
    df = spark.createDataFrame(rows, _SIG_SCHEMA)
    got = {r["keyword"]: r for r in validate_trend_scores(df).collect()}
    for row_t in rows:
        row = dict(zip(keys, row_t))
        pub, div, rev, clin, gap, total, conf = _score(row)
        r = got[row["keyword"]]
        assert (r["publication_score"], r["diversity_score"], r["review_score"],
                r["clinical_score"], r["gap_score"], r["confidence_level"]) == \
            (pub, div, rev, clin, gap, conf), (row, r)


def test_corpus_signals_derivation(spark):
    rows = []
    # keyword A: 1994 has 2 papers, 1998 has 5, 1997 has 4 -> g5 = 150, yoy = 25
    for yr, n in [(1994, 2), (1995, 1), (1996, 0), (1997, 4), (1998, 5)]:
        for j in range(n):
            rows.append(("A", yr, f"j{j}", j == 0, "systematic" if j == 1 else "none",
                         yr == 1998, False, j == 0))
    # keyword B: nothing in the first window year -> growth guards to 0
    rows.append(("B", 1998, "jx", False, "meta", True, True, False))
    # out-of-window rows must be ignored entirely
    rows.append(("A", 1990, "jz", True, "systematic", True, True, True))
    df = spark.createDataFrame(
        rows,
        "kw string, yr int, journal string, high_if boolean, review_kind string, "
        "trial boolean, phase3 boolean, gapm boolean",
    )
    sig = {r["keyword"]: r for r in corpus_trend_signals(
        df, "kw", "yr", 1998, "journal", "high_if",
        review_kind_col="review_kind", trial_col="trial",
        phase3_col="phase3", gap_mention_col="gapm",
    ).collect()}
    a = sig["A"]
    assert a["total_papers_5yr"] == 12
    assert a["growth_rate_5yr"] == pytest.approx(150.0)
    assert a["growth_rate_yoy"] == pytest.approx(25.0)
    assert a["unique_journals"] == 5  # j0..j4
    assert a["high_if_journals"] == 1  # only j0 ever high-IF
    assert a["systematic_reviews"] == 3  # j1 rows in-window (1994,1997,1998)
    assert a["active_clinical_trials"] == 5  # the 1998 rows
    assert a["phase3_trials"] == 0
    assert a["future_research_mentions"] == 4  # j0 rows in-window
    assert a["gap_ratio"] == pytest.approx(4 / 12 * 100)
    b = sig["B"]
    assert b["growth_rate_5yr"] == 0.0 and b["growth_rate_yoy"] == 0.0
    assert b["meta_analyses"] == 1 and b["phase3_trials"] == 1
