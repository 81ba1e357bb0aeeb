"""Research-validation confidence scoring: summaries, claims, consistency.

The reference's ``ResearchValidator`` (backend/app/utils/validator.py:
86-415) attaches explainable confidence scores to generated research
artifacts, all with deterministic math over stored chunk embeddings:

* **summary validation** (:102-166): cosine of the summary embedding to
  every chunk of the original paper (avg + max), key-concept coverage
  (4+-char word sets minus stopwords, |orig ∩ summary| / |orig|), and
  the weighted overall 0.4*similarity + 0.3*coverage + 0.3*consistency,
  where consistency = (0.6*max + 0.4*avg)*100;
* **claim validation** (:167-245): over a top-k retrieval result set,
  supporting (> 0.6) vs conflicting (< 0.3) evidence split, unique-paper
  coverage normalized by corpus_count/50, consistency = supporting
  fraction, same weighted overall;
* **paper consistency** (:245-320): section-mean embeddings, cosine of
  the four canonical section pairs (Abstract-Conclusion / Abstract-
  Results / Methods-Results / Introduction-Discussion, each falling back
  to the plural form when the exact name is absent), overall = mean pair
  cosine; coverage normalizes section count by the 5 expected.

Spark-first shape: chunk-join + per-pair cosine as the sequential
zip_with/aggregate fold (functions/vector.py — same DuckDB-replayable
order as the kNN entries), word coverage via array_intersect of
tokenized word sets, section means via one posexplode + (paper, section,
dim) agg; everything ends in one paper-/claim-keyed aggregation. Zero-
norm vectors score cosine 0.0 like the reference (:382-389), not NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.vector import cosine_similarity

__all__ = [
    "COVERAGE_STOPWORDS",
    "CONSISTENCY_PAIRS",
    "summary_validation",
    "claim_validation",
    "paper_consistency",
]

#: the coverage tokenizer's stopword set (validator.py:395-398)
COVERAGE_STOPWORDS = [
    "this", "that", "with", "from", "have", "been", "were", "which",
    "their", "more",
]

#: canonical section pairs, exact name first, plural fallback
#: (validator.py:286-292)
CONSISTENCY_PAIRS = [
    ("Abstract", "Conclusion"),
    ("Abstract", "Results"),
    ("Methods", "Results"),
    ("Introduction", "Discussion"),
]


def _cos0(a, b) -> Column:
    return F.coalesce(cosine_similarity(a, b), F.lit(0.0))


def _key_words(text: Column) -> Column:
    """4+-char lowercase word set minus stopwords (validator.py:391-403)."""
    words = F.regexp_extract_all(F.lower(text), F.lit(r"\b[a-z]{4,}\b"), 0)
    return F.array_except(
        F.array_distinct(words), F.array(*[F.lit(s) for s in COVERAGE_STOPWORDS])
    )


def summary_validation(
    summaries: DataFrame,
    chunks: DataFrame,
    paper_col: str,
    summary_emb_col: str,
    summary_text_col: str,
    chunk_emb_col: str,
    chunk_text_col: str,
) -> DataFrame:
    """validate_summary (validator.py:102-166) per paper: avg/max chunk
    cosine, key-concept coverage against the concatenated original, the
    weighted overall. Output: (paper, n_chunks, avg_similarity,
    max_similarity, coverage, similarity_score, coverage_score,
    consistency_score, overall_confidence), floats rounded 6 dp."""
    s = summaries.select(
        F.col(paper_col).alias("paper"),
        F.col(summary_emb_col).alias("s_emb"),
        _key_words(F.col(summary_text_col)).alias("s_words"),
    )
    c = chunks.select(
        F.col(paper_col).alias("paper"),
        F.col(chunk_emb_col).alias("c_emb"),
        _key_words(F.col(chunk_text_col)).alias("c_words"),
    )
    j = c.join(F.broadcast(s.select("paper", "s_emb")), "paper")
    agg = j.groupBy("paper").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.avg(_cos0("s_emb", "c_emb")).alias("avg_sim"),
        F.max(_cos0("s_emb", "c_emb")).alias("max_sim"),
        F.array_distinct(F.flatten(F.collect_list("c_words"))).alias("o_words"),
    )
    per_paper = agg.join(F.broadcast(s.select("paper", "s_words")), "paper")
    coverage = F.when(
        F.size("o_words") > 0,
        F.size(F.array_intersect("o_words", "s_words"))
        / F.size("o_words").cast("double"),
    ).otherwise(F.lit(0.0))
    sim = F.col("avg_sim") * 100
    cov = coverage * 100
    cons = (F.col("max_sim") * 0.6 + F.col("avg_sim") * 0.4) * 100
    overall = sim * 0.4 + cov * 0.3 + cons * 0.3
    return per_paper.select(
        "paper",
        "n_chunks",
        F.round("avg_sim", 6).alias("avg_similarity"),
        F.round("max_sim", 6).alias("max_similarity"),
        F.round(coverage, 6).alias("coverage"),
        F.round(sim, 6).alias("similarity_score"),
        F.round(cov, 6).alias("coverage_score"),
        F.round(cons, 6).alias("consistency_score"),
        F.round(overall, 6).alias("overall_confidence"),
    )


def claim_validation(
    results: DataFrame,
    claim_col: str,
    paper_col: str,
    sim_col: str,
    corpus_count: int,
    support_threshold: float = 0.6,
    conflict_threshold: float = 0.3,
) -> DataFrame:
    """validate_claim's evidence scoring (validator.py:167-245) over a
    retrieval result table (claim, paper, similarity in [0,1]):
    supporting/conflicting splits, unique-paper coverage normalized by
    corpus_count/50 (capped at 100), consistency = supporting fraction,
    the 0.4/0.3/0.3 weighted overall. Output per claim."""
    sim = F.col(sim_col)
    g = results.groupBy(F.col(claim_col).alias("claim")).agg(
        F.count("*").cast("long").alias("n_results"),
        F.sum(F.when(sim > support_threshold, 1).otherwise(0)).cast("long").alias("n_supporting"),
        F.sum(F.when(sim < conflict_threshold, 1).otherwise(0)).cast("long").alias("n_conflicting"),
        F.avg(sim).alias("avg_sim"),
        F.max(sim).alias("max_sim"),
        F.count_distinct(F.col(paper_col)).cast("long").alias("n_unique_papers"),
    )
    denom = max(corpus_count / 50.0, 1.0)
    coverage = F.col("n_unique_papers") / F.lit(denom)
    sim_score = F.col("avg_sim") * 100
    cov_score = F.least(coverage * 100, F.lit(100.0))
    cons_score = F.col("n_supporting") / F.col("n_results") * 100
    overall = sim_score * 0.4 + cov_score * 0.3 + cons_score * 0.3
    return g.select(
        "claim", "n_results", "n_supporting", "n_conflicting", "n_unique_papers",
        F.round("max_sim", 6).alias("max_similarity"),
        F.round(sim_score, 6).alias("similarity_score"),
        F.round(cov_score, 6).alias("coverage_score"),
        F.round(cons_score, 6).alias("consistency_score"),
        F.round(overall, 6).alias("overall_confidence"),
    )


def paper_consistency(
    chunks: DataFrame,
    paper_col: str,
    section_col: str,
    emb_col: str,
    expected_sections: int = 5,
) -> DataFrame:
    """validate_paper_consistency (validator.py:245-320): per (paper,
    section) element-wise mean embedding, cosine of each canonical pair
    (exact section name, else its plural), papers with zero resolvable
    pairs drop (the reference's not-enough-sections early return).
    Output: (paper, n_sections, n_pairs, consistency_score,
    coverage_score, similarity_score, overall_confidence)."""
    dims = chunks.select(
        F.col(paper_col).alias("paper"),
        F.col(section_col).alias("section"),
        F.posexplode(F.col(emb_col)).alias("dim", "v"),
    )
    # stay LONG-FORM end to end: the pair cosine is three sums over a
    # (paper, dim) self-join of section means — no array reassembly, and
    # everything after the first agg is bounded by papers x sections
    means_long = dims.groupBy("paper", "section", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    sections = means_long.select("paper", "section").distinct()
    n_sections = sections.groupBy("paper").agg(
        F.count("*").cast("long").alias("n_sections")
    )
    pairs_dim = [
        (i, s1, s2) for i, (s1, s2) in enumerate(CONSISTENCY_PAIRS)
    ]
    spark = chunks.sparkSession
    pdim = spark.createDataFrame(pairs_dim, "pair_id int, s1 string, s2 string")

    def side(name_col: str) -> DataFrame:
        # exact section name wins over the plural fallback (rank 0 < 1)
        m = sections.join(
            F.broadcast(pdim),
            (sections["section"] == F.col(name_col))
            | (sections["section"] == F.concat(F.col(name_col), F.lit("s"))),
        ).withColumn(
            "pref", F.when(F.col("section") == F.col(name_col), 0).otherwise(1)
        )
        from pyspark.sql import Window

        w = Window.partitionBy("paper", "pair_id").orderBy("pref", "section")
        return (
            m.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("paper", "pair_id", "section")
        )

    lhs = side("s1").withColumnRenamed("section", "sec1")
    rhs = side("s2").withColumnRenamed("section", "sec2")
    resolved = lhs.join(rhs, ["paper", "pair_id"])
    m1 = means_long.select("paper", F.col("section").alias("sec1"),
                           "dim", F.col("m").alias("m1"))
    m2 = means_long.select("paper", F.col("section").alias("sec2"),
                           "dim", F.col("m").alias("m2"))
    joined = (
        resolved.join(m1, ["paper", "sec1"]).join(m2, ["paper", "sec2", "dim"])
    )
    sums = joined.groupBy("paper", "pair_id").agg(
        F.sum(F.col("m1") * F.col("m2")).alias("dot"),
        F.sum(F.col("m1") * F.col("m1")).alias("n1"),
        F.sum(F.col("m2") * F.col("m2")).alias("n2"),
    )
    pair_cos = sums.select(
        "paper", "pair_id",
        F.when(
            F.sqrt("n1") * F.sqrt("n2") == 0, F.lit(0.0)
        ).otherwise(F.col("dot") / (F.sqrt("n1") * F.sqrt("n2"))).alias("cos"),
    )
    scored = pair_cos.groupBy("paper").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.avg("cos").alias("avg_cos"),
        F.max("cos").alias("max_cos"),
    )
    out = scored.join(F.broadcast(n_sections), "paper")
    return out.select(
        "paper",
        "n_sections",
        "n_pairs",
        F.round(F.col("avg_cos") * 100, 6).alias("consistency_score"),
        F.round(F.col("n_sections") / expected_sections * 100, 6).alias("coverage_score"),
        F.round(F.col("max_cos") * 100, 6).alias("similarity_score"),
        F.round(F.col("avg_cos") * 100, 6).alias("overall_confidence"),
    )
