"""Paper-insights extraction (operators/paper_insights.py) vs a pure-python
port of the reference regex tier (paper_insights.py:100-494)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.paper_insights import (
    CONDITION_PATTERNS,
    DESIGNS,
    EFFECT_PATTERNS,
    OUTCOME_KEYWORDS,
    SAMPLE_PATTERNS,
    key_outcomes,
    population_info,
    study_quality,
)

# ------------------------------------------------------------ python port


def _design(text_lower):
    for name, score, pats in DESIGNS:
        for p in pats:
            if re.search(p, text_lower, re.IGNORECASE):
                return name, score
    return "Unknown", 0


def _sample_size(text_lower):
    for p in SAMPLE_PATTERNS:
        m = re.search(p, text_lower, re.IGNORECASE)
        if m:
            try:
                n = int(m.group(1))
                if 1 <= n <= 1_000_000:
                    return n
            except ValueError:
                continue
    return None


def _quality(title, abstract, text=None):
    full = f"{title} {abstract} {text or ''}"
    t = full.lower()
    design, base = _design(t)
    ss = _sample_size(t)
    q = float(base)
    if ss:
        if ss >= 1000:
            q = min(10, q + 1)
        elif ss >= 100:
            q = min(10, q + 0.5)
        elif ss < 30:
            q = max(0, q - 1)
    strengths = []
    if "multicenter" in t or "multi-center" in t:
        strengths.append("Multicenter study")
        q = min(10, q + 0.5)
    if "double-blind" in t:
        strengths.append("Double-blind design")
        q = min(10, q + 0.5)
    if "intention-to-treat" in t or "itt" in t:
        strengths.append("Intention-to-treat analysis")
    if "pre-registered" in t or "registered" in t:
        strengths.append("Pre-registered")
    limitations = []
    if "single-center" in t or "single center" in t:
        limitations.append("Single-center")
    if "retrospective" in t and design != "Cohort Study":
        limitations.append("Retrospective design")
    if "small sample" in t or (ss and ss < 50):
        limitations.append("Small sample size")
    if "selection bias" in t:
        limitations.append("Potential selection bias noted")
    bias = "Medium"
    if design in ("Randomized Controlled Trial", "Meta-Analysis") and "double-blind" in t:
        bias = "Low"
    elif design in ("Case Report", "Case Series"):
        bias = "High"
    elif "bias" in t or "confound" in t:
        bias = "Medium" if "adjusted" in t else "High"
    return design, base, ss, round(q, 1), bias, strengths, limitations


def _outcomes(text):
    if not text:
        return []
    outcomes = []
    for metric, pat in EFFECT_PATTERNS.items():
        for m in re.finditer(pat, text, re.IGNORECASE):
            try:
                value = float(m.group(1))
                lo = float(m.group(2))
                hi = float(m.group(3))
            except ValueError:
                continue
            ctx = text[max(0, m.start() - 100):m.start()].lower()
            name = "Primary Outcome"
            for kw, abbrev in OUTCOME_KEYWORDS:
                if kw in ctx:
                    name = abbrev
                    break
            if value < 1:
                interp = f"{(1 - value) * 100:.0f}% reduced risk"
            else:
                interp = f"{(value - 1) * 100:.0f}% increased risk"
            outcomes.append((name, metric, value, lo, hi, interp))
    return outcomes[:3]


def _population(text):
    t = text.lower()
    total_n = _sample_size(t)
    age = ""
    m = re.search(r"(?:median age|mean age|age)[:\s]*(\d+)(?:\s*[-–to]\s*(\d+))?(?:\s*years)?", t)
    if m:
        age = f"{m.group(1)}-{m.group(2)}" if m.group(2) else f"median {m.group(1)}"
    fem = None
    m = re.search(r"(\d+(?:\.\d+)?)\s*%?\s*(?:female|women)", t)
    if m:
        fem = float(m.group(1))
    condition = ""
    for p in CONDITION_PATTERNS:
        m = re.search(p, t)
        if m:
            # engine deviation: per-word title case, not str.title()
            condition = " ".join(
                w[:1].upper() + w[1:] for w in m.group(1).strip().split()
            )
            break
    setting = "Not specified"
    if "multicenter" in t or "multi-center" in t:
        setting = "Multicenter"
    elif "single-center" in t or "single center" in t:
        setting = "Single-center"
    return total_n, age, fem, condition, setting


# ---------------------------------------------------------------- fixtures

PAPERS = [
    (0, "Pembrolizumab in advanced gastric cancer",
     "A phase III randomized double-blind placebo-controlled multicenter "
     "trial enrolled 1250 patients with metastatic gastric cancer; median "
     "age 61-75 years; 44.2% female; overall survival hazard ratio = 0.72 "
     "(95% CI 0.58-0.89); intention-to-treat analysis; pre-registered."),
    (1, "Meta-analysis of statin therapy",
     "This meta-analysis pooled 48210 participants; mortality odds ratio = "
     "1.35 (95% CI 1.12 to 1.63) after adjusted models for confounding."),
    (2, "Retrospective review of pancreatic resection",
     "A retrospective study included 85 patients with pancreatic cancer; "
     "mean age 58 years; recurrence relative risk = 2.10 (95% CI 1.40-3.15); "
     "single-center experience with potential selection bias noted."),
    (3, "An unusual presentation",
     "Case report of a single patient; n = 1; diagnosed with amyloidosis."),
    (4, "Prevalence of fatigue in survivors",
     "A cross-sectional prevalence study surveyed 420 individuals; 63% "
     "women; progression-free survival was not assessed."),
    (5, "Benchmarking sort algorithms", "We compare radix and merge sorts."),
    (6, "Xenograft models of resistance",
     "In vitro cell line panels and xenograft mouse model work; preclinical "
     "evidence only; hazard ratio = 0.5.5 (95% CI 0.2-0.9) is malformed."),
    (7, "Multiple endpoints trial",
     "A randomized clinical trial of 980 patients: overall survival hazard "
     "ratio = 0.65 (95% CI 0.52-0.81); progression-free survival hazard "
     "ratio: 0.55, 95% CI: 0.44-0.69; response rate odds ratio = 1.9 "
     "(95% CI 1.2-3.0); recurrence relative risk = 0.8 (95% CI 0.6-0.95)."),
]


@pytest.fixture(scope="module")
def papers_df(spark):
    return spark.createDataFrame(
        [(i, t, a) for i, t, a in PAPERS],
        "pid long, title string, abstract string",
    )


# ------------------------------------------------------------------ tests


def test_quality_matches_port(spark, papers_df):
    got = {r["id"]: r for r in study_quality(
        papers_df, "pid", "title", "abstract"
    ).collect()}
    for pid, title, abstract in PAPERS:
        d, base, ss, q, bias, stren, lim = _quality(title, abstract)
        r = got[pid]
        assert r["design"] == d, (pid, r["design"], d)
        assert r["evidence"] == base
        assert r["sample_size"] == ss
        assert r["quality_score"] == pytest.approx(q)
        assert r["bias_risk"] == bias, (pid, r["bias_risk"], bias)
        assert r["strengths_csv"] == ";".join(stren)
        assert r["limitations_csv"] == ";".join(lim)
    # the branches the fixtures were built to exercise
    assert got[0]["design"] == "Randomized Controlled Trial"
    assert got[0]["quality_score"] == 10.0 and got[0]["bias_risk"] == "Low"
    assert got[3]["design"] == "Case Report" and got[3]["bias_risk"] == "High"
    assert got[5]["design"] == "Unknown" and got[5]["sample_size"] is None
    assert got[2]["bias_risk"] == "High"  # selection bias, no 'adjusted'


def test_quality_arrow_matches_expression_kernel(spark, papers_df):
    """The Arrow rule-ladder kernel (default since r08) must emit exactly
    the expression tree's rows — the crafted papers plus NULL edges."""
    edge = spark.createDataFrame(
        [(90, None, "n = 250 patients randomized double-blind"),
         (91, "meta-analysis of registered trials", None),
         (92, None, None)],
        "pid long, title string, abstract string",
    )
    for df in (papers_df, edge):
        a = sorted(tuple(r) for r in study_quality(
            df, "pid", "title", "abstract", kernel="arrow").collect())
        e = sorted(tuple(r) for r in study_quality(
            df, "pid", "title", "abstract", kernel="expression").collect())
        assert a == e, (a[:2], e[:2])


def test_outcomes_match_port(spark, papers_df):
    rows = key_outcomes(papers_df, "pid", "abstract").collect()
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append(
            (r["outcome_idx"], r["outcome_name"], r["metric_type"],
             r["value"], r["ci_lower"], r["ci_upper"], r["interpretation"])
        )
    for pid, _title, abstract in PAPERS:
        want = _outcomes(abstract)
        mine = sorted(got.get(pid, []))
        assert len(mine) == len(want), (pid, mine, want)
        for (idx, *rest), w in zip(mine, want):
            assert tuple(rest) == w, (pid, idx, rest, w)
    # crafted branches: context naming, cap at 3, malformed float skipped.
    # NB the 100-char look-behind context of match 2 still contains the
    # words "overall survival" from match 1, and OUTCOME_KEYWORDS checks
    # that FIRST — so the PFS effect is named OS, exactly as the
    # reference would (dict-order context scan, paper_insights.py:355-364)
    assert [o[1] for o in sorted(got[7])] == ["OS", "OS", "PFS"]
    assert 6 not in got  # '0.5.5' -> float() raises -> skipped
    assert got[1][0][6] == "35% increased risk"
    assert got[0][0][6] == "28% reduced risk"


def test_population_matches_port(spark, papers_df):
    got = {r["id"]: r for r in population_info(
        papers_df, "pid", "abstract"
    ).collect()}
    for pid, _title, abstract in PAPERS:
        n, age, fem, cond, setting = _population(abstract)
        r = got[pid]
        assert r["total_n"] == n, (pid, r["total_n"], n)
        assert r["age_range"] == age
        assert (r["female_percent"] is None and fem is None) or \
            r["female_percent"] == pytest.approx(fem)
        assert r["condition"] == cond, (pid, r["condition"], cond)
        assert r["setting"] == setting
    assert got[0]["age_range"] == "61-75" and got[0]["female_percent"] == 44.2
    assert got[2]["condition"] == "Pancreatic Cancer"
    assert got[3]["condition"] == "Amyloidosis"
    assert got[0]["setting"] == "Multicenter"


def test_insights_fuzz_vs_port(spark):
    """Seeded fuzz over assembled clinical fragments — one Spark job,
    every paper compared to the port on all three extractors."""
    import random

    rng = random.Random(20260815)
    frags = [
        "randomized double-blind trial", "meta-analysis of trials",
        "retrospective study", "case report", "in vitro cell line",
        "cross-sectional survey", "prevalence study", "cohort study",
        "enrolled {n} patients", "n = {n}", "included {n} participants",
        "{n} subjects", "sample size of {n}",
        "median age {a}-{b} years", "mean age {a} years",
        "{p}% female", "{p} % women",
        "patients with lung cancer", "diagnosed with sepsis",
        "breast carcinoma patients",
        "multicenter", "single-center", "selection bias", "adjusted",
        "confounding factors", "intention-to-treat", "pre-registered",
        "overall survival hazard ratio = {v} (95% CI {lo}-{hi})",
        "mortality odds ratio: {v}, 95% CI: {lo} to {hi}",
        "recurrence relative risk = {v} (95% CI {lo}-{hi})",
        "HR = {v} (95% CI {lo}-{hi})",
        "hazard ratio = {v}.{v} (95% CI {lo}-{hi})",  # malformed float
        "plain filler text about methods and results",
    ]

    def fill(s):
        return s.format(
            n=rng.choice([1, 25, 85, 420, 1250, 48210, 2000000, 12345678]),
            a=rng.randint(40, 70), b=rng.randint(71, 90),
            p=rng.choice([44.2, 63, 50.5]),
            v=rng.choice([0.5, 0.72, 1.35, 2.1]),
            lo=rng.choice([0.2, 0.58, 1.12]),
            hi=rng.choice([0.9, 0.89, 1.63]),
        )

    papers = []
    for i in range(200):
        k = rng.randint(1, 6)
        abstract = "; ".join(fill(rng.choice(frags)) for _ in range(k))
        title = fill(rng.choice(frags))
        papers.append((i, title, abstract))
    df = spark.createDataFrame(papers, "pid long, title string, abstract string")

    q = {r["id"]: r for r in study_quality(df, "pid", "title", "abstract").collect()}
    p = {r["id"]: r for r in population_info(df, "pid", "abstract").collect()}
    o = {}
    for r in key_outcomes(df, "pid", "abstract").collect():
        o.setdefault(r["id"], []).append(
            (r["outcome_idx"], r["outcome_name"], r["metric_type"], r["value"],
             r["ci_lower"], r["ci_upper"], r["interpretation"]))
    n_design = n_out = 0
    for i, title, abstract in papers:
        d, base, ss, qs, bias, stren, lim = _quality(title, abstract)
        r = q[i]
        assert (r["design"], r["evidence"], r["sample_size"]) == (d, base, ss), (i, abstract)
        assert r["quality_score"] == pytest.approx(qs) and r["bias_risk"] == bias
        assert r["strengths_csv"] == ";".join(stren)
        assert r["limitations_csv"] == ";".join(lim)
        n, age, fem, cond, setting = _population(abstract)
        rp = p[i]
        assert (rp["total_n"], rp["age_range"], rp["condition"], rp["setting"]) == \
            (n, age, cond, setting), (i, abstract)
        want = _outcomes(abstract)
        mine = [tuple(x[1:]) for x in sorted(o.get(i, []))]
        assert mine == want, (i, abstract, mine, want)
        n_design += d != "Unknown"
        n_out += len(want)
    assert n_design > 50 and n_out > 30  # both branches well-exercised
