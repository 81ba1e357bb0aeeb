"""Trend-definition matching (operators/trend_match.py) vs a pure-python
port of the reference scoring (oncology_trends.py:62-98)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.trend_seed import (
    TREND_CATEGORIES,
    TREND_SEED,
    trend_dimension,
    trend_seed_rows,
)
from vectordb_bioinsight_spark.operators.trend_match import (
    primary_trends,
    trend_category_census,
    trend_match_scores,
)


def _ref_score(trend, title, abstract, paper_kws=None):
    """Pure-python port of TrendDefinition.matches_paper
    (oncology_trends.py:62-98) as the independent oracle."""
    _name, _cat, kws, genes, mesh = trend
    text = f"{title} {abstract}".lower()
    pk = set(k.lower() for k in (paper_kws or []))
    score, matched = 0, []
    for kw in kws:
        if kw.lower() in text:
            score += 15
            matched.append(kw.lower())
    for g in genes:
        if re.search(rf"\b{g}\b", text, re.IGNORECASE):
            score += 10
            matched.append(g.lower())
    for m in mesh:
        if m.lower() in text or m.lower() in pk:
            score += 8
    title_l = title.lower()
    for kw in kws[:3]:
        if kw.lower() in title_l:
            score += 20
    return min(100, score), matched


PAPERS = [
    (0, "CAR-T therapy in relapsed lymphoma",
     "Chimeric antigen receptor T cells targeting CD19 achieved durable "
     "remission; adoptive cell therapy toxicity was manageable.",
     ["immunotherapy, adoptive"]),
    (1, "Sotorasib in KRAS G12C mutant lung cancer",
     "A KRAS inhibitor produced responses; RAS pathway reactivation through "
     "SOS1 drove acquired resistance in a subset.", []),
    (2, "Sorting algorithms on modern hardware",
     "We benchmark radix sort against merge sort on NVMe arrays.", []),
    (3, "EMT and lineage plasticity in prostate cancer",
     "Neuroendocrine differentiation after RB1 and TP53 loss; SOX2 drives "
     "cell state transition and dedifferentiation.", []),
    (4, "Minimal residual disease by circulating tumor DNA",
     "ctDNA liquid biopsy predicted molecular relapse before imaging.", []),
    (5, "", "tertiary lymphoid structure density, ectopic lymphoid "
     "aggregates and CXCL13 expression correlate with response", None),
]


@pytest.fixture(scope="module")
def papers_df(spark):
    return spark.createDataFrame(
        [(i, t, a, k) for i, t, a, k in PAPERS],
        "pid long, title string, abstract string, pkws array<string>",
    )


def test_all_pair_scores_match_reference_port(spark, papers_df):
    dim = trend_dimension(spark)
    got = {
        (r["id"], r["trend_id"]): (r["score"], sorted(r["matched_terms"]))
        for r in trend_match_scores(
            papers_df, dim, "pid", "title", "abstract", "pkws", min_score=0
        ).collect()
    }
    for pid, title, abstract, pkws in PAPERS:
        for tid, trend in TREND_SEED.items():
            want_score, want_matched = _ref_score(trend, title, abstract, pkws)
            assert got[(pid, tid)][0] == min(100, want_score), (pid, tid)
            assert got[(pid, tid)][1] == sorted(want_matched), (pid, tid)
    # crafted branches actually fire: keyword+gene+mesh+title for CAR-T
    assert got[(0, "car_t")][0] >= 15 + 10 + 8 + 20
    # the off-topic paper matches nothing
    assert all(got[(2, tid)][0] == 0 for tid in TREND_SEED)


def test_primary_trend_and_tie_break(spark, papers_df):
    dim = trend_dimension(spark)
    prim = {
        r["id"]: (r["trend_id"], r["score"])
        for r in primary_trends(
            papers_df, dim, "pid", "title", "abstract", "pkws"
        ).collect()
    }
    assert prim[0][0] == "car_t"
    assert prim[1][0] == "kras_targeting"
    assert prim[3][0] == "lineage_plasticity"
    assert prim[4][0] == "ctdna_mrd"
    assert 2 not in prim  # below min_score -> no primary at all
    # tie-break: a paper scoring equally on two trends takes seed order
    two = spark.createDataFrame(
        [(9, "x", "chromothripsis and double minute with tumor heterogeneity "
          "in subclonal populations", None)],
        "pid long, title string, abstract string, pkws array<string>",
    )
    rows = trend_match_scores(
        two, dim, "pid", "title", "abstract", "pkws", min_score=30
    ).collect()
    scores = {r["trend_id"]: r["score"] for r in rows}
    assert scores["ecdna"] == scores["clonal_evolution"] == 30
    best = primary_trends(two, dim, "pid", "title", "abstract", "pkws").collect()
    ranks = {tid: i for i, tid in enumerate(TREND_SEED)}
    assert best[0]["trend_id"] == (
        "ecdna" if ranks["ecdna"] < ranks["clonal_evolution"] else "clonal_evolution"
    )


def test_census_counts_and_categories(spark, papers_df):
    dim = trend_dimension(spark)
    rows = trend_category_census(
        papers_df, dim, "pid", "title", "abstract", "pkws"
    ).collect()
    by_trend = {r["trend_id"]: r["n_papers"] for r in rows}
    assert by_trend["car_t"] == 1 and by_trend["lineage_plasticity"] == 1
    assert sum(by_trend.values()) == 5  # paper 2 matched nothing
    assert all(r["category"] in TREND_CATEGORIES for r in rows)


def test_arrow_kernel_matches_expression_kernel(spark, papers_df):
    """The Arrow batch scorer (the default since r08) must emit exactly
    the expression tree's rows — all pairs AND the primary pick — on the
    crafted papers plus NULL-field edges."""
    dim = trend_dimension(spark)
    edge = spark.createDataFrame(
        [
            (90, None, "car-t chimeric antigen receptor cd19", None),
            (91, "kras g12c inhibitor sotorasib", None, ["kras"]),
            (92, None, None, None),
            (93, "", "", []),
        ],
        "pid long, title string, abstract string, pkws array<string>",
    )
    for df in (papers_df, edge):
        for kws_col in ("pkws", None):
            a = sorted(
                (r["id"], r["trend_id"], r["score"], tuple(r["matched_terms"]))
                for r in trend_match_scores(
                    df, dim, "pid", "title", "abstract", kws_col, kernel="arrow"
                ).collect()
            )
            e = sorted(
                (r["id"], r["trend_id"], r["score"], tuple(r["matched_terms"]))
                for r in trend_match_scores(
                    df, dim, "pid", "title", "abstract", kws_col,
                    kernel="expression",
                ).collect()
            )
            assert a == e, (kws_col, a[:3], e[:3])
            pa = sorted(
                (r["id"], r["trend_id"], r["score"])
                for r in primary_trends(
                    df, dim, "pid", "title", "abstract", kws_col, kernel="arrow"
                ).collect()
            )
            pe = sorted(
                (r["id"], r["trend_id"], r["score"])
                for r in primary_trends(
                    df, dim, "pid", "title", "abstract", kws_col,
                    kernel="expression",
                ).collect()
            )
            assert pa == pe, (kws_col, pa, pe)


def test_seed_rows_shape():
    rows = trend_seed_rows()
    assert len(rows) == len(TREND_SEED) >= 16
    ranks = [r[0] for r in rows]
    assert ranks == list(range(len(rows)))  # insertion order == rank
    for _rank, _tid, _name, cat, kws, top3, genes, mesh in rows:
        assert cat in TREND_CATEGORIES
        assert top3 == kws[:3] and len(kws) >= 4
        assert all(k == k.lower() for k in kws + genes + mesh)


def test_oversized_dim_raises_instead_of_driver_collect(spark, papers_df):
    """ADVICE r08: the Arrow kernel snapshots the dim onto the driver at
    plan-construction time; past MAX_DIM_ROWS it must raise (pointing at
    the lazy expression kernel) rather than silently collect."""
    from vectordb_bioinsight_spark.operators.trend_match import MAX_DIM_ROWS

    big = (
        spark.range(MAX_DIM_ROWS + 1)
        .select(
            F.col("id").cast("int").alias("trend_rank"),
            F.concat(F.lit("t"), F.col("id")).alias("trend_id"),
            F.concat(F.lit("trend "), F.col("id")).alias("trend_name"),
            F.lit("cat").alias("category"),
            F.array(F.lit("kw")).alias("keywords"),
            F.array(F.lit("kw")).alias("top3"),
            F.array().cast("array<string>").alias("genes"),
            F.array().cast("array<string>").alias("mesh"),
        )
    )
    with pytest.raises(ValueError, match="exceeds"):
        trend_match_scores(papers_df, big, "pid", "title", "abstract").collect()


def test_zero_match_batch_keeps_declared_schema(spark):
    """ADVICE r08: a batch where NO paper matches any trend must still
    yield the declared schema (all-object empty frame; float64 inference
    on the id/score columns is pyarrow-version-sensitive)."""
    dim = trend_dimension(spark)
    nomatch = spark.createDataFrame(
        [(9, "sorting algorithms", "radix sort on NVMe", None)],
        "pid long, title string, abstract string, pkws array<string>",
    )
    out = trend_match_scores(nomatch, dim, "pid", "title", "abstract")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "id", "trend_rank", "trend_id", "trend_name", "category",
        "score", "matched_terms",
    ]
