"""Cluster-correct fuzzy-dedup survivor selection (operators/dedup.py:
dedup_clusters, near_dedup_survivors) — transitive-chain semantics that
pairwise removal gets wrong. Catalog-level DuckDB parity for the CC path is
covered by test_oracle_parity (dedup_components)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.dedup import (
    dedup_clusters,
    near_dedup_survivors,
)
from vectordb_bioinsight_spark.pipelines.training_data import prepare_training_data


def test_chain_resolves_to_one_cluster(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc1 long, doc2 long"
    )
    out = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cluster_rep_is_min_regardless_of_pair_order(spark):
    # star around a high id: (9,2),(9,3),(9,1) — min of the component is 1
    pairs = spark.createDataFrame([(9, 2), (9, 3), (9, 1)], "doc1 long, doc2 long")
    out = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(pairs).collect()}
    assert set(out.values()) == {1}
    assert set(out) == {1, 2, 3, 9}


def test_survivors_keep_one_per_cluster(spark):
    # A(1) ~ B(2) ~ C(3) chain via shared shingles; D(4) unrelated;
    # E(5)/F(6) exact copies
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base + " iota"),
        (3, base + " iota kappa"),
        (4, "completely different words about unrelated topics entirely here"),
        (5, "the exact same document text twice over"),
        (6, "the exact same document text twice over"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    surv = sorted(
        r["doc_id"]
        for r in near_dedup_survivors(docs, "doc_id", "text", min_jaccard=0.5).collect()
    )
    assert surv == [1, 4, 5]


def test_pipeline_component_resolution_matches_chain(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, "en", "s", 10),
        (2, base + " iota", "en", "s", 10),
        (3, base + " iota kappa", "en", "s", 10),
        (4, "different words entirely about some other topic matter", "en", "s", 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = prepare_training_data(
        docs, min_quality=0.0, near_dup_jaccard=0.5, cluster_resolve="components"
    )
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [1, 4]


def test_pipeline_rejects_unknown_resolution(spark):
    docs = spark.createDataFrame([(1, "t", "en", "s", 1)],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    import pytest

    with pytest.raises(ValueError):
        prepare_training_data(docs, cluster_resolve="nope")


def test_near_dedup_best_survivors_keeps_highest_score(spark):
    """Best-score survivor: the longest copy of a near-dup chain wins;
    exact-dup groups keep their best row too; ties break to smaller id."""
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.dedup import (
        near_dedup_best_survivors,
        near_dedup_survivors,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, 10.0),                       # near-dup chain member
        (2, base + " lambda", 30.0),           # the BEST of the chain
        (3, base + " lambda mu", 20.0),
        (4, "completely different text about other things entirely", 5.0),
        (5, "completely different text about other things entirely", 7.0),  # exact dup of 4, better
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    best = sorted(
        r["doc_id"]
        for r in near_dedup_best_survivors(
            df, "doc_id", "text", "score", min_jaccard=0.5
        ).collect()
    )
    assert best == [2, 5]
    # the min-id rule on the same input keeps 1 and 4 — same cluster shape,
    # different survivor
    minid = sorted(
        r["doc_id"]
        for r in near_dedup_survivors(df, "doc_id", "text", min_jaccard=0.5).collect()
    )
    assert minid == [1, 4]
