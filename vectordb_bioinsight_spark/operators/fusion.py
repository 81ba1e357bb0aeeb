"""Hybrid-search rank fusion — SURVEY.md V5/J8/W3.

Reciprocal Rank Fusion over N ranked retrieval arms, matching the reference's
semantics (backend/app/core/vector_store.py:301-387): per-arm 0-based rank,
contribution w_arm/(rrf_k + rank + 1), missing docs contribute nothing, final
score optionally normalized to 0-100 by the max.

Spark shape: rank each arm with a bounded window (arms are already top-fetch_k,
<= dozens of rows — the unpartitioned window is over a provably tiny set),
then FULL OUTER JOIN on doc_id and one score expression. At scale the arms are
cheap; fusion cost is constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K_DEFAULT = 60


def rrf_fuse(
    arms: dict[str, DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    weights: dict[str, float] | None = None,
    rrf_k: int = RRF_K_DEFAULT,
    normalize: bool = True,
) -> DataFrame:
    """Fuse ranked arms {name: DataFrame(doc_id, score)} into (doc_id, rrf_score).

    Ranks are 0-based by descending score with doc_id tie-break (total order).
    rrf_score is rounded to 6 dp for hash stability.
    """
    weights = weights or {name: 1.0 for name in arms}
    fused = None
    for name, df in arms.items():
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked = df.select(
            F.col(id_col),
            ((F.lit(weights[name])) / (F.lit(float(rrf_k)) + F.row_number().over(w) - 1 + 1)).alias(f"_c_{name}"),
        )
        fused = ranked if fused is None else fused.join(ranked, id_col, "full_outer")
    contrib_cols = [F.coalesce(F.col(f"_c_{name}"), F.lit(0.0)) for name in arms]
    total = sum(contrib_cols[1:], contrib_cols[0])
    out = fused.select(F.col(id_col), total.alias("rrf_raw"))
    if normalize:
        mx = out.agg(F.max("rrf_raw").alias("_mx"))
        out = (
            out.crossJoin(F.broadcast(mx))
            .withColumn("rrf_score", F.round(F.col("rrf_raw") / F.col("_mx") * 100.0, 6))
            .select(id_col, "rrf_score")
        )
    else:
        out = out.select(F.col(id_col), F.round(F.col("rrf_raw"), 6).alias("rrf_score"))
    return out


def retrieval_metrics(
    results: DataFrame,
    relevance: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Ranking-quality metrics per query — nDCG@k, MRR@k, precision@k.

    ``results``: (query_id, cand_id, rank) from any retrieval arm (BM25,
    kNN, hybrid RRF). ``relevance``: (query_id, cand_id, rel) graded gains
    (binary or graded). The ideal DCG is computed from the relevance table
    itself (top-k gains per query), so nDCG is self-contained.

    Standard formulation: DCG@k = Σ rel_i / log2(rank_i + 1).
    Output: (query_id, n_rel, dcg, idcg, ndcg, mrr, precision_k) — floats
    rounded 6 dp; queries with no relevant docs report 0 metrics (not NULL).
    ``n_rel`` is the query's TOTAL relevant-doc count (counted before the
    ideal window's top-k cap — not min(n_rel, k)), and the relevance table
    is de-duplicated on (query_id, cand_id) with max(rel) first, so
    duplicate judgment rows cannot fan out the results join and inflate
    dcg/mrr/precision.

    Scale: two equi-joins on (query_id, cand_id) + one window over the
    relevance table capped at k — result-set sized, negligible next to the
    retrieval that produced it.
    """
    from pyspark.sql import Window

    res = results.filter(F.col("rank") <= k).select("query_id", "cand_id", "rank")
    rel = (
        relevance.filter(F.col("rel") > 0)
        .groupBy("query_id", "cand_id")
        .agg(F.max("rel").alias("rel"))
    )
    hits = res.join(rel, ["query_id", "cand_id"], "left").withColumn(
        "_gain", F.coalesce(F.col("rel"), F.lit(0.0))
    )
    per_q = hits.groupBy("query_id").agg(
        F.sum(F.col("_gain") / F.log2(F.col("rank") + 1)).alias("_dcg"),
        F.max(
            F.when(F.col("rel").isNotNull(), 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("_mrr"),
        (
            F.sum(F.when(F.col("rel").isNotNull(), 1).otherwise(0)) / F.lit(float(k))
        ).alias("_prec"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cand_id"))
    ideal = (
        rel.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") / F.log2(F.col("_r") + 1)).alias("_idcg"))
    )
    n_rel = rel.groupBy("query_id").agg(F.count("*").cast("long").alias("n_rel"))
    return (
        per_q.join(ideal, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            F.round(F.coalesce("_dcg", F.lit(0.0)), 6).alias("dcg"),
            F.round(F.coalesce("_idcg", F.lit(0.0)), 6).alias("idcg"),
            F.round(
                F.when(
                    F.coalesce("_idcg", F.lit(0.0)) > 0, F.col("_dcg") / F.col("_idcg")
                ).otherwise(0.0),
                6,
            ).alias("ndcg"),
            F.round(F.coalesce("_mrr", F.lit(0.0)), 6).alias("mrr"),
            F.round(F.coalesce("_prec", F.lit(0.0)), 6).alias("precision_k"),
        )
    )
