"""Trend-definition matching: map papers to predefined research trends.

The reference's ``OncologyTrendMatcher`` scores every paper against every
defined trend (backend/app/core/oncology_trends.py:62-98, 333-464):

* +15 per trend keyword contained in lower(title + ' ' + abstract);
* +10 per gene symbol matching with a word-boundary regex;
* +8 per MeSH term contained in the text OR present in the paper's own
  keyword list;
* +20 per top-3 keyword contained in the lowered title;
* score capped at 100; matches below ``min_score`` (default 30) drop;
* ties keep the trend-definition insertion order (stable sort), and the
  best match is the paper's PRIMARY trend; papers group by the primary
  trend's category for the briefing view.

Spark-first shape: the trend table is a ~16-row broadcast dimension
(functions/trend_seed.py), the paper×trend score is ONE JVM expression
tree per pair (array ``filter``/``size`` over the dim's keyword arrays —
no UDF, no explode), and the primary pick is a per-paper window. At
100 TB the cross join is |corpus| × 16 rows of narrow projected columns,
scan-local until the (optional) census aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["trend_match_scores", "primary_trends", "trend_category_census"]


def _score_cols(text: Column, title_l: Column, paper_kws: "Column | None"):
    """The four score components + matched-term array for one dim row.

    ``text``/``title_l`` MUST be plain attributes (pre-projected on the
    paper side), not expression trees: Spark 4.1's codegen mis-binds a
    lambda-captured stream-side EXPRESSION when the score is split
    across the broadcast join by a downstream exchange
    (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND — found via the constant-NULL
    -title null-safety probe), while a captured attribute binds fine.
    """
    kw_hits = F.filter("keywords", lambda k: F.contains(text, k))
    gene_hits = F.filter(
        "genes",
        lambda g: F.regexp_like(
            text, F.concat(F.lit(r"\b"), g, F.lit(r"\b"))
        ),
    )
    if paper_kws is None:
        mesh_pred = lambda m: F.contains(text, m)  # noqa: E731
    else:
        # paper_kws is pre-lowered in the projection (attribute rule above)
        mesh_pred = lambda m: F.contains(text, m) | F.array_contains(  # noqa: E731
            paper_kws, m
        )
    mesh_hits = F.filter("mesh", mesh_pred)
    title_hits = F.filter("top3", lambda k: F.contains(title_l, k))
    score = (
        15 * F.size(kw_hits)
        + 10 * F.size(gene_hits)
        + 8 * F.size(mesh_hits)
        + 20 * F.size(title_hits)
    )
    matched = F.concat(kw_hits, gene_hits)  # kw then genes, ref order
    return F.least(F.lit(100), score).cast("int"), matched


def trend_match_scores(
    papers: DataFrame,
    dim: DataFrame,
    id_col: str,
    title_col: str,
    abstract_col: str,
    keywords_col: "str | None" = None,
    min_score: int = 30,
) -> DataFrame:
    """All (paper, trend) matches scoring >= min_score.

    ``match_paper`` (oncology_trends.py:344-375) as one broadcast cross
    join: every pair's score is a single expression over the dim's
    arrays. Output: (id, trend_rank, trend_id, trend_name, category,
    score, matched_terms array) — one row per qualifying pair.
    """
    pre_cols = [
        F.col(id_col).alias("_tm_id"),
        F.lower(
            F.concat_ws(
                " ",
                F.coalesce(F.col(title_col), F.lit("")),  # NULL-safe: a NULL
                F.coalesce(F.col(abstract_col), F.lit("")),  # field scores as ''
            )
        ).alias("_tm_text"),
        F.lower(F.coalesce(F.col(title_col), F.lit(""))).alias("_tm_title"),
    ]
    if keywords_col:
        pre_cols.append(
            F.transform(F.col(keywords_col), F.lower).alias("_tm_kws")
        )
    pre = papers.select(*pre_cols)
    score, matched = _score_cols(
        F.col("_tm_text"),
        F.col("_tm_title"),
        F.col("_tm_kws") if keywords_col else None,
    )
    return (
        pre.crossJoin(F.broadcast(dim))
        .select(
            F.col("_tm_id").alias("id"),
            "trend_rank",
            "trend_id",
            "trend_name",
            "category",
            score.alias("score"),
            matched.alias("matched_terms"),
        )
        .filter(F.col("score") >= F.lit(min_score))
    )


def primary_trends(
    papers: DataFrame,
    dim: DataFrame,
    id_col: str,
    title_col: str,
    abstract_col: str,
    keywords_col: "str | None" = None,
    min_score: int = 30,
) -> DataFrame:
    """Each paper's best-matching trend (get_primary_trend,
    oncology_trends.py:377-385): highest score, seed order on ties —
    one per-paper window over the qualifying pairs."""
    from pyspark.sql import Window

    matches = trend_match_scores(
        papers, dim, id_col, title_col, abstract_col, keywords_col, min_score
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("trend_rank").asc()
    )
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def trend_category_census(
    papers: DataFrame,
    dim: DataFrame,
    id_col: str,
    title_col: str,
    abstract_col: str,
    keywords_col: "str | None" = None,
    min_score: int = 30,
) -> DataFrame:
    """Papers grouped by their primary trend (group_papers_by_trend,
    oncology_trends.py:387-464, the briefing rollup): per (category,
    trend) the paper count and mean match score — empty trends drop,
    matching the reference's non-empty-categories-only output."""
    prim = primary_trends(
        papers, dim, id_col, title_col, abstract_col, keywords_col, min_score
    )
    return prim.groupBy("category", "trend_id", "trend_name").agg(
        F.count("*").cast("long").alias("n_papers"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    )
