"""Corpus-enrichment extractors + quality scorer (operators/
corpus_enrich.py) vs pure-python ports of corpus_builder.py:407-572."""

import random
import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.briefing import ARTICLE_TYPE_PRIORITY
from vectordb_bioinsight_spark.operators.corpus_enrich import (
    GENE_PATTERN,
    KNOWN_GENES,
    PATHWAY_KEYWORDS,
    extract_genes,
    extract_pathways,
    paper_quality_score,
)
from tests.test_briefing_ladders import _classify_port


def _genes_port(text):
    """GeneExtractor.extract (:510-529)."""
    found = set()
    for m in re.finditer(GENE_PATTERN, text or ""):
        c = m.group(1)
        if c in KNOWN_GENES:
            found.add(c)
        elif len(c) >= 3 and any(ch.isdigit() for ch in c):
            found.add(c)
    return sorted(found)


def _pathways_port(text):
    """PathwayExtractor.extract (:564-572)."""
    low = (text or "").lower()
    return [p for p in PATHWAY_KEYWORDS if p.lower() in low]


def _quality_port(pub_types, mesh_n, abstract, year, current_year):
    """QualityScorer.score (:420-487), no disease relevance."""
    t = _classify_port(pub_types)
    score = ARTICLE_TYPE_PRIORITY[t] * 40
    if mesh_n:
        score += min(mesh_n / 10, 1.0) * 15
    alen = len(abstract)
    if alen > 1500:
        score += 20
    elif alen > 800:
        score += 15
    elif alen > 300:
        score += 10
    elif alen > 100:
        score += 5
    if year:
        try:
            age = current_year - int(year)
            if age <= 2:
                score += 15
            elif age <= 5:
                score += 12
            elif age <= 10:
                score += 8
            else:
                score += 3
        except ValueError:
            pass
    return t, round(min(100, score), 4)


def test_extractors_fuzz_vs_port(spark):
    rng = random.Random(31)
    frags = [
        "KRAS", "TP53", "kras", "ABC123", "AB", "XY9", "BRCA1-IRIS", "HELLO",
        "the PI3K/AKT axis", "wnt signaling", "NF-kB", "plain words here",
        "glycolysis and striatum", "DRD4 genotype", "A1", "TGF-beta",
    ]
    rows = [(i, " ".join(rng.sample(frags, rng.randrange(0, 7)))) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["g"], r["p"])
        for r in df.select(
            "id",
            extract_genes(F.col("text")).alias("g"),
            extract_pathways(F.col("text")).alias("p"),
        ).collect()
    }
    for i, text in rows:
        assert got[i][0] == ",".join(_genes_port(text)), (i, text)
        assert got[i][1] == ",".join(_pathways_port(text)), (i, text)


def test_quality_score_fuzz_vs_port(spark):
    from vectordb_bioinsight_spark.operators.briefing import TYPE_MAPPINGS

    rng = random.Random(5)
    pool = list(TYPE_MAPPINGS) + ["Journal Article", "Nonsense"]
    rows = []
    want = {}
    for i in range(100):
        pts = rng.sample(pool, rng.randrange(0, 4))
        mesh_n = rng.randrange(0, 14)
        abstract = "x" * rng.choice([0, 50, 200, 500, 1000, 2000])
        year = rng.choice(["2026", "2023", "2019", "2005", "", "bogus"])
        rows.append((i, pts, ["m"] * mesh_n, abstract, year))
        want[i] = _quality_port(pts, mesh_n, abstract, year, 2026)
    df = spark.createDataFrame(
        rows,
        "id long, pts array<string>, mesh array<string>, abstract string,"
        " year string",
    )
    got = {r["id"]: r for r in paper_quality_score(
        df, "id", "pts", "mesh", "abstract", "year", current_year=2026
    ).collect()}
    for i, (t, s) in want.items():
        assert got[i]["article_type"] == t, i
        assert got[i]["quality_score"] == pytest.approx(s, abs=1e-9), (i, rows[i])


def test_quality_relevance_tiers(spark):
    df = spark.createDataFrame(
        [(1, ["Review"], [], "", "", True, 0.1),
         (2, ["Review"], [], "", "", False, 0.6),
         (3, ["Review"], [], "", "", False, 0.3),
         (4, ["Review"], [], "", "", False, 0.1)],
        "id long, pts array<string>, mesh array<string>, abstract string,"
        " year string, hp boolean, ms double",
    )
    got = {r["id"]: r["quality_score"] for r in paper_quality_score(
        df, "id", "pts", "mesh", "abstract", "year", current_year=2026,
        match_has_primary_col="hp", match_score_col="ms",
    ).collect()}
    base = 0.85 * 40  # review priority
    assert got[1] == pytest.approx(base + 10)
    assert got[2] == pytest.approx(base + 7)
    assert got[3] == pytest.approx(base + 4)
    assert got[4] == pytest.approx(base)
