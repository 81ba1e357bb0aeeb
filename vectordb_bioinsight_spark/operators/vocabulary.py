"""Vocabulary-anchored precision-search dispatch — SURVEY V7's missing half.

Reference analog: the reference routes every precision search through a
three-way strategy dispatch (backend/app/core/precision_search.py:143-154):

  1. the query IS a vocabulary term with no modifiers  -> list every doc
     anchored to that term's canonical key,
  2. a vocabulary term PLUS extra keywords             -> keyword-priority
     search restricted to the key's docs,
  3. no vocabulary term                                -> plain lexical
     (BM25) retrieval with field-aware rescoring.

The vocabulary itself (backend/app/core/medical_vocabulary.py:211-400) maps
surface terms -> canonical keys with a kind (primary / synonym /
abbreviation / alias) and per-kind match weight, and query normalization is
longest-term-first substring extraction (extract_disease_from_query,
medical_vocabulary.py:254-291).

Engine mapping (Spark-first, not a port):
* the vocabulary is a BROADCAST DIMENSION table (vocab_key, term, kind,
  weight) — dimension-sized by construction, so term matching is a
  broadcast join against the document scan, never a shuffle of the corpus;
* query normalization is a DRIVER-SIDE planner step (the query string is a
  scalar, not data) that picks the branch and parameterizes one of three
  declarative plans;
* field-aware scoring reuses the V7 position arithmetic
  (plans/catalog_coverage.q_precision_field_scores: title<=40 chars -> 100,
  abstract<=150 -> 80, body -> 60) times the vocab kind weight — pure JVM
  expressions, whole-stage codegen.

Every branch is deterministic (rounded scores, total-order tiebreaks), so
each has an exact DuckDB twin in plans/catalog_coverage.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: (vocab_key, term, kind, weight) rows. Kind weights follow the
#: reference's term-tier discipline: primary full weight, synonyms below,
#: abbreviations/aliases lowest (medical_vocabulary.py match_score tiers).
VocabEntry = tuple[str, str, str, float]

DEFAULT_KIND_WEIGHTS = {
    "primary": 1.0,
    "synonym": 0.8,
    "abbreviation": 0.6,
    "alias": 0.6,
}


def vocab_dimension(spark: SparkSession, entries: Sequence[VocabEntry]) -> DataFrame:
    """The vocabulary as a dimension DataFrame — always broadcast-sized
    (a curated vocabulary is thousands of rows at most)."""
    return spark.createDataFrame(
        list(entries), "vocab_key string, term string, kind string, weight double"
    )


def extract_key_from_query(
    query: str, entries: Sequence[VocabEntry]
) -> tuple[str | None, str]:
    """Driver-side query normalization (extract_disease_from_query analog):
    find the LONGEST vocabulary term contained in the query
    (case-insensitive, ties to the lexicographically first term), return
    its canonical key and the query with the term removed.

    Matching is WORD-BOUNDED, a deliberate fix over the reference's raw
    substring test (medical_vocabulary.py:254-291 matches 'merge' inside
    'merged' and then fragments the word — 'merged results' would leave
    'd results' as keywords, inflating every instr() hit downstream).

    Returns (None, query) when no vocabulary term matches — branch 3.
    """
    import re

    q = query.lower()
    best: tuple[int, str, str] | None = None  # (-len, term, key)
    for key, term, _kind, _w in entries:
        t = term.lower()
        if t and re.search(rf"(?<![a-z0-9]){re.escape(t)}(?![a-z0-9])", q):
            cand = (-len(t), t, key)
            if best is None or cand < best:
                best = cand
    if best is None:
        return None, query
    _, term, key = best
    remaining = re.sub(rf"(?<![a-z0-9]){re.escape(term)}(?![a-z0-9])", " ", q)
    return key, " ".join(p for p in remaining.split() if p)


def field_position_score(text_col: Column, term: "Column | str") -> Column:
    """V7 field-aware position score (the single source for the 40/150-char
    zone constants): 100 in the 'title' (first 40 chars), 80 in the
    'abstract' (first 150), 60 anywhere else in the body, 0 when absent.
    ``term`` may be a literal or a column (the vocab-dimension join).

    Matching is CASE-INSENSITIVE on both sides, as in the reference
    (precision_search.py:286-341 lowercases content and term); r04's
    case-sensitive instr silently lost every mixed-case match on a real
    corpus (ADVICE r04). Positions are measured in the lowered text —
    identical offsets, lower() preserves length for the ASCII zones."""
    t = F.lit(term) if isinstance(term, str) else term
    pos = F.instr(F.lower(text_col), F.lower(t))
    return (
        F.when((pos > 0) & (pos <= 40), 100.0)
        .when((pos > 0) & (pos <= 150), 80.0)
        .when(pos > 0, 60.0)
        .otherwise(0.0)
    )


def vocab_match_scores(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    vocab_key: str | None = None,
) -> DataFrame:
    """Best vocabulary anchor per (document, canonical key): broadcast the
    vocab dimension against the document scan (substring containment
    join), score each match as kind_weight x field position score
    (:func:`field_position_score`), keep the argmax term within each
    (doc, key) group. With ``vocab_key`` set (the dispatch branches) that
    is one row per matching document; with the full vocabulary a document
    anchored to several canonical keys emits one row PER KEY — by design,
    a doc can belong to many topics.

    Physical plan: BroadcastNestedLoopJoin (tiny side = vocab, predicate =
    instr > 0) -> scan-local score expression -> (doc, key)-keyed argmax
    agg. The corpus shuffles once, keyed by ``id_col``; the vocab never
    shuffles.

    Output: (id, vocab_key, matched_term, kind, vocab_score>0), score
    rounded 4 dp.
    """
    v = vocab if vocab_key is None else vocab.filter(F.col("vocab_key") == vocab_key)
    # case-insensitive anchor (ADVICE r04): lower both sides, like the
    # reference's contains() over lowered content
    pos = F.instr(F.lower(F.col(text_col)), F.lower(F.col("term")))
    # field_position_score's 0-when-absent branch is unreachable here (the
    # join predicate guarantees pos > 0), so the shared helper applies as is
    fscore = field_position_score(F.col(text_col), F.col("term"))
    matched = docs.join(F.broadcast(v), pos > 0).select(
        F.col(id_col),
        "vocab_key",
        "term",
        "kind",
        F.round(F.col("weight") * fscore, 4).alias("vocab_score"),
    )
    # argmax with score-ties broken toward the SMALLEST term (the SQL
    # twin's ORDER BY vocab_score DESC, term ASC): max score per doc, then
    # min(term) among the rows holding that score — two doc-keyed aggs on
    # the same partitioning, no rank window needed
    top = matched.groupBy(id_col, "vocab_key").agg(
        F.max("vocab_score").alias("vocab_score")
    )
    return (
        matched.join(top, [id_col, "vocab_key", "vocab_score"])
        .groupBy(id_col, "vocab_key", "vocab_score")
        .agg(
            F.min("term").alias("matched_term"),
            F.min_by("kind", "term").alias("kind"),
        )
        .select(id_col, "vocab_key", "matched_term", "kind", "vocab_score")
    )


def keyword_priority_scores(
    anchored: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    keywords: Sequence[str],
) -> DataFrame:
    """Branch 2 (precision_search._search_with_keywords analog): rank the
    key-anchored docs by how many of the extra keywords they contain —
    keyword hits dominate (x10), the vocab anchor score breaks ties. Docs
    hitting ZERO keywords drop (the reference prioritizes keyword papers;
    anchor-only docs are branch 1's answer).

    Keywords are driver-known literals -> the hit count is one scan-local
    expression (no explode, no shuffle beyond the anchor join).
    """
    hits: Column = F.lit(0)
    for kw in keywords:
        # keywords arrive lowercased from query normalization — lower the
        # DOC side too or mixed-case text never hits (ADVICE r04)
        hits = hits + (F.instr(F.lower(F.col(text_col)), kw.lower()) > 0).cast("int")
    scored = docs.select(F.col(id_col), hits.alias("keyword_hits")).filter(
        F.col("keyword_hits") > 0
    )
    return (
        anchored.join(scored, id_col)
        .select(
            id_col,
            "vocab_key",
            "matched_term",
            "keyword_hits",
            "vocab_score",
            F.round(F.col("keyword_hits") * 10.0 + F.col("vocab_score"), 4).alias(
                "total_score"
            ),
        )
    )


def dispatch_search(
    docs: DataFrame,
    query: str,
    entries: Sequence[VocabEntry],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 10,
) -> tuple[str, DataFrame]:
    """The three-way dispatcher (precision_search.py:143-154): normalize the
    query against the vocabulary, pick the branch, return
    (strategy_name, plan). Strategies: ``"list_all"`` / ``"keywords"`` /
    ``"lexical"``.
    """
    from vectordb_bioinsight_spark.operators.bm25 import bm25_topk

    spark = docs.sparkSession
    key, remaining = extract_key_from_query(query, entries)
    vocab = vocab_dimension(spark, entries)
    if key is not None and not remaining:
        return "list_all", vocab_match_scores(docs, vocab, id_col, text_col, key)
    if key is not None:
        anchored = vocab_match_scores(docs, vocab, id_col, text_col, key)
        return "keywords", keyword_priority_scores(
            anchored, docs, id_col, text_col, remaining.split()
        )
    return "lexical", bm25_topk(docs, id_col, text_col, query, k=top_k)
