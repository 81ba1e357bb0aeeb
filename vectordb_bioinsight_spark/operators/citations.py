"""Citation analytics — the reference's Semantic-Scholar citation routes
re-expressed as Spark expression trees over a citation edge table.

The reference (``backend/app/api/routes/citations.py``) fetches citation
data over HTTP and post-processes it per paper in Python. The fetch is a
declared source boundary (S8 snapshot dimension); everything downstream of
the fetch is deterministic and lives here:

* :func:`landmark_score` / :func:`landmark_reasons` — the multi-factor
  landmark ladder (``citations.py:287-332``) and its reason strings
  (``:333-367``).
* :func:`landmark_papers` — the full landmark-papers pipeline
  (``:416-461``): ``citation_count >= 50`` gate, score, reasons, sort,
  top-N.
* :func:`citation_yearly_trends` — per-paper yearly citing counts with
  peak-year detection (``:609-643``).
* :func:`citation_network_stats` — per-center node/edge construction with
  the seen-ids dedup (center > reference > citation) and the summary
  stats block (``:465-568``).
* :func:`related_papers` — union of citers and references ranked by the
  related paper's own citation count, deduped keep-first (``:644-695``).

Everything is JVM-side: ladders are nested ``when`` chains, the network
stats are two aggregations plus one anti-join, and the related ranking is
a single per-center window. No Python UDFs.

Determinism pins (the reference iterates API-ordered lists, which has no
stable order): ties in the peak-year pick resolve to the EARLIEST year
(matches the reference when citations arrive year-ascending); ties in the
related ranking resolve ``cites_this`` before ``cited_by_this`` (the
reference appends citations first and ``list.sort`` is stable), then by
ascending paper id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: citations.py:416-461 — papers below this never enter the landmark pool.
LANDMARK_MIN_CITATIONS = 50


def _landmark_score_col(
    year: Column,
    citations: Column,
    influential: Column,
    n_fields: Column,
    current_year: int,
) -> Column:
    """citations.py:287-332 — the four-factor landmark score.

    ``age = max(1, current_year - year)``; papers with no year score 0.
    Base score is the citation-velocity ladder (500/200/100/50 per-year
    breaks), plus influential-ratio * 20, plus ``min(10, 2 * n_fields)``,
    plus the longevity bonus (10 for >=10y & >=1000 citations, 5 for
    >=5y & >=500), capped at 100.
    """
    age = F.greatest(F.lit(1), F.lit(current_year) - year)
    cpy = citations.cast("double") / age.cast("double")
    base = (
        F.when(cpy >= 500, F.lit(100.0))
        .when(cpy >= 200, F.lit(80.0))
        .when(cpy >= 100, F.lit(60.0))
        .when(cpy >= 50, F.lit(40.0))
        .otherwise(F.least(F.lit(40.0), cpy * 0.8))
    )
    influential_bonus = (
        influential.cast("double") / F.greatest(F.lit(1), citations).cast("double")
    ) * 20.0
    field_bonus = F.least(F.lit(10.0), n_fields.cast("double") * 2.0)
    age_bonus = (
        F.when((age >= 10) & (citations >= 1000), F.lit(10.0))
        .when((age >= 5) & (citations >= 500), F.lit(5.0))
        .otherwise(F.lit(0.0))
    )
    score = F.least(F.lit(100.0), base + influential_bonus + field_bonus + age_bonus)
    return F.when(year.isNull(), F.lit(0.0)).otherwise(score)


def landmark_score(
    df: DataFrame,
    year_col: str = "year",
    citations_col: str = "citation_count",
    influential_col: str = "influential_citations",
    n_fields_col: str = "n_fields",
    current_year: int = 2025,
    out_col: str = "landmark_score",
) -> DataFrame:
    """Attach the landmark score (citations.py:287-332) as ``out_col``."""
    return df.withColumn(
        out_col,
        _landmark_score_col(
            F.col(year_col),
            F.col(citations_col),
            F.col(influential_col),
            F.col(n_fields_col),
            current_year,
        ),
    )


def landmark_reasons(
    df: DataFrame,
    year_col: str = "year",
    citations_col: str = "citation_count",
    influential_col: str = "influential_citations",
    n_fields_col: str = "n_fields",
    open_access_col: str = "is_open_access",
    current_year: int = 2025,
) -> DataFrame:
    """citations.py:333-367 — reason strings, reference order, first 4 kept.

    Adds ``reasons`` (pipe-joined, scalar-safe for cross-engine hashing)
    and ``n_reasons``. ``age`` falls back to ``current_year`` when the
    year is NULL (``paper.year or current_year`` -> age clamps to 1), so
    the velocity reason can still fire for year-less papers — faithful to
    the reference.
    """
    year = F.col(year_col)
    citations = F.col(citations_col)
    influential = F.col(influential_col)
    n_fields = F.col(n_fields_col)
    open_access = F.col(open_access_col)
    age = F.greatest(F.lit(1), F.lit(current_year) - F.coalesce(year, F.lit(current_year)))
    cpy = citations.cast("double") / age.cast("double")

    # The reference formats counts with thousands separators; format_number
    # matches Python's f"{n:,}" for non-negative integers.
    #
    # LAMBDA-FREE by design: array_compact/filter compile to
    # CodegenFallback lambda expressions — interpreted, excluded from
    # subexpression elimination, and re-evaluated once per consuming
    # output column (measured 2x on a 5M-row scan). Instead each reason
    # slot is a (fired, string) pair; the reference's [:4] cap is a
    # prefix-sum gate (slot i emits only when fewer than 4 earlier slots
    # fired) and the join is concat_ws, which skips NULL slots natively.
    slots: list[tuple[Column, Column]] = [
        (
            citations >= 1000,
            F.when(
                citations >= 10000,
                F.concat(F.lit("Exceptionally high citations ("), F.format_number(citations, 0), F.lit(")")),
            ).otherwise(
                F.concat(F.lit("Highly cited ("), F.format_number(citations, 0), F.lit(" citations)")),
            ),
        ),
        (
            cpy >= 200,
            F.concat(
                F.lit("High citation velocity ("),
                F.round(cpy, 0).cast("long").cast("string"),
                F.lit("/year)"),
            ),
        ),
        (
            influential >= 100,
            F.concat(F.lit("High influential citations ("), influential.cast("string"), F.lit(")")),
        ),
        (
            n_fields >= 3,
            F.concat(F.lit("Cross-disciplinary impact ("), n_fields.cast("string"), F.lit(" fields)")),
        ),
        (
            (age >= 10) & (citations >= 1000),
            F.lit("Established foundational work"),
        ),
        (open_access, F.lit("Open access - widely accessible")),
    ]
    parts: list[Column] = []
    prefix = F.lit(0)
    for fired, text in slots:
        parts.append(F.when(fired & (prefix < 4), text))
        prefix = prefix + F.when(fired, 1).otherwise(0)
    total = prefix  # number of fired slots, uncapped
    reasons_str = F.when(
        total == 0, F.lit("Significant contribution to the field")
    ).otherwise(F.concat_ws(" | ", *parts))
    n_reasons = F.least(F.lit(4), F.greatest(F.lit(1), total))
    return df.withColumn("reasons", reasons_str).withColumn("n_reasons", n_reasons)


def landmark_papers(
    papers: DataFrame,
    id_col: str = "paper_id",
    year_col: str = "year",
    citations_col: str = "citation_count",
    influential_col: str = "influential_citations",
    n_fields_col: str = "n_fields",
    open_access_col: str = "is_open_access",
    current_year: int = 2025,
    limit: int = 10,
) -> DataFrame:
    """citations.py:416-461 — the landmark-papers pipeline.

    Gate at >=50 citations, score + reasons, rank by (score desc, id asc —
    the id pin replaces the reference's unstable API order), keep top N.
    One global rank window (TakeOrderedAndProject shape when the consumer
    limits); everything upstream is scan-local.
    """
    scored = landmark_score(
        papers.filter(F.col(citations_col) >= LANDMARK_MIN_CITATIONS),
        year_col, citations_col, influential_col, n_fields_col, current_year,
    )
    scored = landmark_reasons(
        scored, year_col, citations_col, influential_col, n_fields_col,
        open_access_col, current_year,
    ).withColumn("landmark_score", F.round("landmark_score", 4))
    w = Window.orderBy(F.col("landmark_score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= limit)
        .select(id_col, "landmark_score", "n_reasons", "reasons", "rk")
    )


def citation_yearly_trends(
    edges: DataFrame,
    citing_meta: DataFrame,
    citing_col: str = "citing_id",
    cited_col: str = "cited_id",
    id_col: str = "paper_id",
    year_col: str = "year",
) -> DataFrame:
    """citations.py:609-643 — yearly citation counts + peak year.

    Joins each citing edge to the citing paper's year (NULL years are
    skipped, as the reference's ``if year:`` does), counts per
    (cited, year), and flags the peak year per cited paper. Tie pin:
    earliest year wins (see module docstring). Two shuffles: the
    edge->meta join (broadcast when meta is small) and the groupBy; the
    peak window reuses the groupBy partitioning on ``cited_id``.
    """
    yearly = (
        edges.join(
            citing_meta.select(
                F.col(id_col).alias(citing_col), F.col(year_col).alias("_cy")
            ),
            citing_col,
        )
        .filter(F.col("_cy").isNotNull())
        .groupBy(cited_col, F.col("_cy").alias("year"))
        .agg(F.count("*").alias("n_citing"))
    )
    w = Window.partitionBy(cited_col).orderBy(
        F.col("n_citing").desc(), F.col("year").asc()
    )
    return yearly.withColumn(
        "is_peak", (F.row_number().over(w) == 1).cast("int")
    )


def citation_network_stats(
    edges: DataFrame,
    meta: DataFrame,
    id_col: str = "paper_id",
    citations_col: str = "citation_count",
    citing_col: str = "citing_id",
    cited_col: str = "cited_id",
) -> DataFrame:
    """citations.py:465-568 — per-center citation-network summary stats.

    For every paper (as the network center): references are its outgoing
    edges, citations its incoming ones. Node dedup follows the reference's
    ``seen_ids`` walk — center first, then references, then citers that
    are neither the center nor already a reference (``node_type`` is
    assigned first-wins). Edges are appended unconditionally, so
    ``total_edges`` counts raw edges even when a node was deduped, while
    ``references_count``/``citations_count`` count NODES of each type
    post-dedup (the reference's stats block filters ``nodes``, not
    ``edges`` — citations.py:553-557). ``avg_citations`` averages the
    citation counts over the deduped node set, center included.
    """
    refs = edges.select(
        F.col(citing_col).alias("center"), F.col(cited_col).alias("nbr")
    )
    cits = edges.select(
        F.col(cited_col).alias("center"), F.col(citing_col).alias("nbr")
    )
    # citers that would be new nodes: not the center, not already a reference
    new_citers = (
        cits.filter(F.col("nbr") != F.col("center"))
        .join(refs, ["center", "nbr"], "left_anti")
    )
    m = meta.select(F.col(id_col).alias("nbr"), F.col(citations_col).alias("_cc"))

    def _agg(df: DataFrame, n_alias: str, sum_alias: str) -> DataFrame:
        return (
            df.join(m, "nbr")
            .groupBy("center")
            .agg(
                F.count("*").alias(n_alias),
                F.sum("_cc").alias(sum_alias),
            )
        )

    # reference nodes can include the center itself (self-cite): the node
    # is deduped but the edge kept — count nodes and edges separately.
    ref_nodes = _agg(refs.filter(F.col("nbr") != F.col("center")).distinct(), "n_ref_nodes", "ref_cc")
    ref_edges = refs.groupBy("center").agg(F.count("*").alias("n_ref_edges"))
    cit_edges = cits.groupBy("center").agg(F.count("*").alias("n_cit_edges"))
    cit_nodes = _agg(new_citers.distinct(), "n_cit_nodes", "cit_cc")

    base = meta.select(
        F.col(id_col).alias("center"), F.col(citations_col).alias("center_cc")
    )
    out = (
        base.join(ref_edges, "center", "left")
        .join(cit_edges, "center", "left")
        .join(ref_nodes, "center", "left")
        .join(cit_nodes, "center", "left")
        .na.fill(
            0,
            ["n_ref_edges", "n_cit_edges", "n_ref_nodes", "ref_cc",
             "n_cit_nodes", "cit_cc"],
        )
    )
    total_nodes = F.lit(1) + F.col("n_ref_nodes") + F.col("n_cit_nodes")
    return out.select(
        "center",
        total_nodes.alias("total_nodes"),
        (F.col("n_ref_edges") + F.col("n_cit_edges")).alias("total_edges"),
        F.col("n_ref_nodes").alias("references_count"),
        F.col("n_cit_nodes").alias("citations_count"),
        F.round(
            (F.col("center_cc") + F.col("ref_cc") + F.col("cit_cc")).cast("double")
            / total_nodes.cast("double"),
            4,
        ).alias("avg_citations"),
    )


def related_papers(
    edges: DataFrame,
    meta: DataFrame,
    id_col: str = "paper_id",
    citations_col: str = "citation_count",
    citing_col: str = "citing_id",
    cited_col: str = "cited_id",
    limit: int = 10,
) -> DataFrame:
    """citations.py:644-695 — related papers via shared citation edges.

    Per center: its citers (relation ``cites_this``) union its references
    (``cited_by_this``), relevance = the related paper's own citation
    count, sorted by relevance desc, deduped keep-first, top N. Relation
    pin: the reference appends citations first and sorts stably, so when
    the same paper is both citer and reference (equal relevance by
    construction) ``cites_this`` survives the dedup. Rank ties between
    DISTINCT related papers resolve by ascending id.

    Shuffle shape: ONE center-keyed sort serves both steps — duplicate
    (center, related) rows are adjacent under (relevance desc, id asc,
    relation-order asc) because both rows carry the related paper's own
    citation count, so the dedup is a ``lag`` check instead of a second
    window partitioned by (center, related) (which cost a full extra
    shuffle of the union — measured 93 s -> 64 s on a 15M-edge graph).
    """
    cits = edges.select(
        F.col(cited_col).alias("center"),
        F.col(citing_col).alias("related_id"),
    ).withColumn("relation", F.lit("cites_this"))
    refs = edges.select(
        F.col(citing_col).alias("center"),
        F.col(cited_col).alias("related_id"),
    ).withColumn("relation", F.lit("cited_by_this"))
    pool = (
        cits.unionByName(refs)
        .filter(F.col("related_id") != F.col("center"))
        .join(
            meta.select(
                F.col(id_col).alias("related_id"),
                F.col(citations_col).alias("relevance"),
            ),
            "related_id",
        )
    )
    rel_order = F.when(F.col("relation") == "cites_this", 0).otherwise(1)
    sort_w = Window.partitionBy("center").orderBy(
        F.col("relevance").desc(), F.col("related_id").asc(), rel_order
    )
    rank_w = Window.partitionBy("center").orderBy(
        F.col("relevance").desc(), F.col("related_id").asc()
    )
    return (
        pool.withColumn("_prev", F.lag("related_id").over(sort_w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("related_id")))
        .withColumn("rk", F.row_number().over(rank_w))
        .filter(F.col("rk") <= limit)
        .select("center", "related_id", "relation", "relevance", "rk")
    )
