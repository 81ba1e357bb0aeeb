"""Broadcast-Bloom incremental dedup (operators/bloom.py).

The operator's contract is EXACT anti-join semantics regardless of Bloom
sizing: false positives are killed by the confirm join, and the Bloom
guarantee (no false negatives) means no duplicate can slip through. Tests
pin both directions plus equivalence with a plain anti-join on real data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64
from vectordb_bioinsight_spark.operators.bloom import (
    bloom_num_bits,
    build_bloom,
    dedup_against_corpus,
    with_bloom_hit,
)
from vectordb_bioinsight_spark.sources.readers import load_table

SF_SMALL = "/root/testdata/sf0.001"


def test_planted_duplicates_removed(spark):
    corpus = spark.createDataFrame(
        [(i, f"text {i % 50}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000, "text 3"), (1001, "fresh a"), (1002, "text 49"), (1003, "fresh b")],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(batch, corpus, "doc_id", "text", num_bits=1 << 12)
    assert sorted(r.doc_id for r in out.collect()) == [1001, 1003]


def test_exact_under_forced_false_positives(spark):
    """A 64-bit bloom over 50 distinct texts saturates — nearly everything is
    a candidate — yet the confirm join keeps the result exact."""
    corpus = spark.createDataFrame(
        [(i, f"text {i % 50}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000, "text 3"), (1001, "fresh a"), (1002, "text 49"), (1003, "fresh b")],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(batch, corpus, "doc_id", "text", num_bits=64, num_hashes=2)
    assert sorted(r.doc_id for r in out.collect()) == [1001, 1003]


def test_no_false_negatives(spark):
    """Every member of the build set must test positive (the Bloom guarantee —
    a false negative here would silently keep a duplicate)."""
    docs = load_table(spark, SF_SMALL, "documents")
    hashes = docs.select(portable_hash64(F.col("text")).alias("h"))
    bitmap = build_bloom(hashes, "h", 1 << 16, num_hashes=5)
    misses = (
        with_bloom_hit(hashes, "h", bitmap, 1 << 16, num_hashes=5)
        .filter(~F.col("_bloom_hit"))
        .count()
    )
    assert misses == 0


def test_equivalence_with_plain_anti_join(spark):
    """On the real sf0.001 corpus (even=corpus, odd=batch) the bloom path
    must equal the direct anti-join row-for-row."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    # plant guaranteed cross-split duplicates: three odd-id copies of corpus
    # texts (sf0.001 has no natural ones)
    planted = corpus.orderBy("doc_id").limit(3).select(
        (F.col("doc_id") + 1_000_001).alias("doc_id"), "text"
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    bloom_ids = {
        r.doc_id
        for r in dedup_against_corpus(
            batch, corpus, "doc_id", "text", num_bits=1 << 18
        ).collect()
    }
    direct_ids = {
        r.doc_id
        for r in batch.join(
            corpus.select("text").distinct(), "text", "left_anti"
        ).collect()
    }
    assert bloom_ids == direct_ids
    # the planted duplicates must all have been dropped
    assert len(bloom_ids) == batch.count() - 3


def test_bloom_sizing():
    assert bloom_num_bits(0) == 64
    m = bloom_num_bits(1_000_000, 0.01)
    assert m & (m - 1) == 0 and m >= 9_585_058  # analytic bound before pow2
    with pytest.raises(ValueError):
        build_bloom(None, "h", 100, 5)  # not a power of two


def test_near_dedup_against_corpus_planted(spark):
    """A batch doc whose text differs only in punctuation/case (byte-level
    different — the Bloom EXACT check would miss it, shingle-identical so
    LSH catches it with certainty) must drop; unrelated batch docs survive;
    an exact copy drops too. A one-token edit at Jaccard ~0.67 is
    deliberately NOT asserted: with 4x4 banding its candidate status is a
    coin-flip of the hash family, the documented LSH recall tradeoff."""
    from vectordb_bioinsight_spark.operators.dedup import near_dedup_against_corpus

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely different corpus content here okay")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, base.upper() + "!!!"),               # token-stream near-dup -> drop
            (3, "unrelated fresh arrival text with novel tokens everywhere"),
            (5, base),                               # exact copy -> drop
        ],
        "doc_id long, text string",
    )
    surv = near_dedup_against_corpus(batch, corpus, "doc_id", "text", min_jaccard=0.5)
    ids = {r["doc_id"] for r in surv.collect()}
    assert ids == {3}
