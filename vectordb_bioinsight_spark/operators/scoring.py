"""Rule-based scoring suites — SURVEY.md V8/V9/M8/W8.

The reference's rerank/validation scorers are deterministic rule ladders over
column values: article-type regex points (core_paper_reranker.py:193-453),
recency age buckets (recommender.py:431-452), multi-factor blends
`0.4*sim + 0.3*recency + 0.3*impact` (recommender.py:410-500), and the
interpretation checklist score (agent4_validation.py:405-524). All of them are
pure column expressions — whole-stage-codegen JVM arithmetic, zero UDFs, zero
extra shuffles — which is exactly how a 100 TB scoring pass must run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ladder_score(col: Column, ladder: Sequence[tuple[float, float]], default: float = 0.0) -> Column:
    """`when`-ladder: first (threshold, points) with col >= threshold wins.
    The recency-bucket idiom (recommender.py:431-452) generalized."""
    expr = F.lit(default)
    # build inside-out: the HIGHEST threshold must be the outermost when(),
    # so iterate ascending (each step wraps the previous chain as its else)
    for threshold, points in sorted(ladder):
        expr = F.when(col >= F.lit(threshold), F.lit(points)).otherwise(expr)
    return expr


def checklist_score(flags: Sequence[tuple[Column, float]]) -> Column:
    """M8 weighted checklist: Σ weight·flag (agent4_validation.py:405-524).
    Flags are (boolean column, points) pairs — a list, since Column objects
    are not hashable."""
    total = F.lit(0.0)
    for flag, weight in flags:
        total = total + F.when(flag, F.lit(weight)).otherwise(F.lit(0.0))
    return total


def blend_scores(
    df: DataFrame,
    weights: dict[str, float],
    out_col: str = "blended_score",
    minmax_normalize: bool = True,
    bounded_input: bool = False,
) -> DataFrame:
    """V6/V9 multi-factor blend: optional per-column min-max normalization
    (reranker.py:173-181) then Σ wᵢ·colᵢ.

    Two physical strategies for the min/max bounds:

    - default (``bounded_input=False``): ONE global aggregation broadcast
      back via crossJoin. Right for large inputs — the bounds agg is
      map-side-combinable and nothing funnels through a single task. Cost:
      the input subtree is evaluated twice (once for bounds, once for rows).
    - ``bounded_input=True``: an unpartitioned window min/max. Right when
      the input is small BY CONSTRUCTION (a rerank candidate pool is top-k
      of an upstream retrieval, k ≲ 10³ at any corpus size): the single
      window task over k rows is trivial, and the expensive upstream
      subtree (BM25 pool, kNN stage) is computed ONCE instead of twice —
      measured 2.0 s → 0.9 s on the sf0.1 rerank_blend bench entry.
    """
    if minmax_normalize:
        if bounded_input:
            w_all = Window.partitionBy()
            parts = []
            for c, w in weights.items():
                mn, mx = F.min(c).over(w_all), F.max(c).over(w_all)
                rng = mx - mn
                normed = F.when(rng > 0, (F.col(c) - mn) / rng).otherwise(F.lit(0.5))
                parts.append(F.lit(w) * normed)
            return df.withColumn(out_col, F.round(sum(parts), 6))
        aggs = []
        for c in weights:
            aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
        bounds = df.agg(*aggs)
        df = df.crossJoin(F.broadcast(bounds))
        parts = []
        for c, w in weights.items():
            rng = F.col(f"_max_{c}") - F.col(f"_min_{c}")
            normed = F.when(rng > 0, (F.col(c) - F.col(f"_min_{c}")) / rng).otherwise(F.lit(0.5))
            parts.append(F.lit(w) * normed)
        out = df.withColumn(out_col, F.round(sum(parts), 6))
        return out.drop(*[f"_min_{c}" for c in weights], *[f"_max_{c}" for c in weights])
    parts = [F.lit(w) * F.col(c) for c, w in weights.items()]
    return df.withColumn(out_col, F.round(sum(parts), 6))


def rerank_blend(
    df: DataFrame,
    orig_col: str,
    rerank_col: str,
    orig_weight: float = 0.3,
    top_k: int | None = None,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """V6 cross-encoder blend semantics (reranker.py:110-278): min-max
    normalize the rerank score, blend `w·orig + (1-w)·rerank`, resort,
    optionally truncate. A rerank pool is top-k of an upstream retrieval —
    bounded by construction — so the window-bounds strategy applies and the
    upstream retrieval subtree is evaluated once, not twice."""
    out = blend_scores(
        df,
        {orig_col: orig_weight, rerank_col: 1.0 - orig_weight},
        out_col="final_score",
        bounded_input=True,
    )
    order = [F.desc("final_score")] + [F.asc(c) for c in order_tiebreak]
    out = out.orderBy(*order)
    return out.limit(top_k) if top_k else out
