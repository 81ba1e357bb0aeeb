"""Positional retrieval: exact-phrase anchor matching and term proximity."""

from __future__ import annotations

from vectordb_bioinsight_spark.operators.phrase import (
    min_term_distance,
    phrase_count_docs,
    phrase_match,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_phrase_match_finds_every_occurrence(spark):
    df = _docs(spark, [
        "merge join beats hash join",            # one match at pos 0
        "the merge join and merge join again",   # two matches (note: 'the'/'and' pass min_len=3)
        "join merge reversed",                   # reversed -> no match
        "merge alone and join apart",            # both terms, not adjacent
    ])
    got = {(r["doc_id"], r["start_pos"]) for r in
           phrase_match(df, "doc_id", "text", ["merge", "join"]).collect()}
    assert (0, 0) in got
    assert sum(1 for d, _ in got if d == 1) == 2
    assert not any(d in (2, 3) for d, _ in got)


def test_phrase_match_repeated_term(spark):
    """A repeated-term phrase must need TWO tokens — one token matching
    both phrase indexes is not a match."""
    df = _docs(spark, [
        "buffalo buffalo roam",   # match
        "one buffalo only",       # no match
    ])
    got = {(r["doc_id"], r["start_pos"]) for r in
           phrase_match(df, "doc_id", "text", ["buffalo", "buffalo"]).collect()}
    assert got == {(0, 0)}


def test_phrase_count_docs(spark):
    df = _docs(spark, ["fast scan fast scan fast scan"])
    [row] = phrase_count_docs(df, "doc_id", "text", ["fast", "scan"]).collect()
    assert row["n_matches"] == 3


def test_min_term_distance(spark):
    df = _docs(spark, [
        "vector spark middle words here",      # adjacent -> 1
        "vector aaa bbb ccc spark",            # distance 4
        "vector only here",                    # missing spark -> dropped
    ])
    got = {r["doc_id"]: r["min_dist"] for r in
           min_term_distance(df, "doc_id", "text", "vector", "spark").collect()}
    assert got == {0: 1, 1: 4}


def test_phrase_plan_has_no_positional_self_join(spark):
    """The anchor trick must compile to aggregation, not a join."""
    df = _docs(spark, ["merge join"])
    plan = phrase_match(df, "doc_id", "text", ["merge", "join"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan


def test_min_term_distance_same_term(spark):
    """Equal terms measure the gap between DISTINCT occurrences; a single
    occurrence never self-pairs to 0 (review finding r04)."""
    df = _docs(spark, [
        "spark word spark",   # two occurrences, distance 2
        "spark once only",    # one occurrence -> dropped
    ])
    got = {r["doc_id"]: r["min_dist"] for r in
           min_term_distance(df, "doc_id", "text", "spark", "spark").collect()}
    assert got == {0: 2}
