"""Positional retrieval: exact-phrase and term-proximity search.

The reference's lexical arm is bag-of-words BM25 plus field-position
scoring (backend/app/core/precision_search.py:505-538 scores WHERE a term
appears, never whether terms appear TOGETHER); phrase and proximity
queries are the standard lexical upgrades an inverted index supports.
Spark has no positional-index operator, so this is a composition:

* **Exact phrase** uses the anchor trick, not an n-way self-join: a
  phrase ``t_0 .. t_{n-1}`` matches at position p iff token ``t_i`` sits
  at ``p + i`` for every i — i.e. positions of t_i shifted by -i all
  agree. So: posexplode once, keep only query terms (scan-local filter on
  driver-known literals), anchor = pos - term_index, ONE groupBy
  (doc, anchor) counting distinct term indexes. No join at all, and the
  grouped rows are bounded by query-term postings, not corpus tokens.
* **Proximity** (min token distance between two terms per doc) joins the
  two per-doc position lists AFTER the scan-local term filter — the join
  input is postings-of-two-terms sized, then one doc-keyed min.

Position semantics: positions index the ENGINE'S token stream
(functions/text.tokenize — lowercase alnum runs, min length 3), identical
in the DuckDB twins, so adjacency means "adjacent surviving tokens".

Repeated-term phrases ("buffalo buffalo") work: anchors use the term's
INDEX in the phrase, so each occurrence must be found at its own offset —
``n_distinct(term_index) == n`` cannot be satisfied by one token.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.text import tokenize


def token_positions(
    docs: DataFrame, id_col: str, text_col: str, keep_terms: Sequence[str]
) -> DataFrame:
    """(id, pos, token) for the given terms only — the filter runs inside
    the exploded projection (driver-known literals), so only matching
    postings ever reach a shuffle."""
    pos = docs.select(
        F.col(id_col),
        F.posexplode(tokenize(text_col)).alias("pos", "token"),
    )
    return pos.filter(F.col("token").isin(list(keep_terms)))


def phrase_match(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: Sequence[str],
) -> DataFrame:
    """All exact-phrase occurrences: (id, start_pos), one row per match.

    Plan: one tokenize scan -> scan-local term filter -> anchor projection
    -> ONE (doc, anchor) groupBy requiring all n term indexes present.
    """
    terms = list(phrase)
    n = len(terms)
    if n == 0:
        raise ValueError("empty phrase")
    pos = token_positions(docs, id_col, text_col, set(terms))
    # a term may occur at several indexes of the phrase ("a b a"): emit one
    # candidate row per (occurrence, matching phrase index)
    idx_map = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.lit(t).alias("t"))
            for i, t in enumerate(terms)
        ]
    )
    cand = pos.select(
        F.col(id_col),
        "pos",
        F.explode(F.filter(idx_map, lambda s: s["t"] == F.col("token"))).alias("m"),
    ).select(
        F.col(id_col),
        (F.col("pos") - F.col("m.i")).alias("start_pos"),
        F.col("m.i").alias("_i"),
    )
    return (
        cand.filter(F.col("start_pos") >= 0)
        .groupBy(id_col, "start_pos")
        .agg(F.count_distinct("_i").alias("_hits"))
        .filter(F.col("_hits") == n)
        .select(id_col, F.col("start_pos").cast("long").alias("start_pos"))
    )


def phrase_count_docs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: Sequence[str],
) -> DataFrame:
    """Per-doc phrase frequency: (id, n_matches), matching docs only."""
    return (
        phrase_match(docs, id_col, text_col, phrase)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_matches"))
    )


def min_term_distance(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    term_a: str,
    term_b: str,
) -> DataFrame:
    """Per-doc minimum token distance between two terms — the proximity
    score (1 = adjacent). Docs containing only one of the terms drop.

    Plan: scan-local two-term postings -> per-doc equi-join of the two
    (tiny) position lists -> doc-keyed min. The join input is bounded by
    the two terms' posting lists, never the token stream.

    ``term_a == term_b`` measures the distance between DISTINCT
    occurrences (a single occurrence would otherwise pair with itself and
    report a meaningless 0); docs with fewer than two occurrences drop.
    """
    pos = token_positions(docs, id_col, text_col, {term_a, term_b})
    a = pos.filter(F.col("token") == term_a).select(
        F.col(id_col), F.col("pos").alias("_pa")
    )
    b = pos.filter(F.col("token") == term_b).select(
        F.col(id_col), F.col("pos").alias("_pb")
    )
    joined = a.join(b, id_col)
    if term_a == term_b:
        joined = joined.filter(F.col("_pa") != F.col("_pb"))
    return (
        joined
        .groupBy(id_col)
        .agg(F.min(F.abs(F.col("_pa") - F.col("_pb"))).cast("long").alias("min_dist"))
    )
