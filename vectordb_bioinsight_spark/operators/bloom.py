"""Broadcast Bloom-filter membership — incremental dedup against an existing
corpus.

Reference analog: the reference's ingest path checks whether a paper/chunk is
already in the store by exact id/content lookup before inserting
(backend/app/core/vector_store.py upsert flow). At 100 TB the corpus side of
that check cannot be shuffled per ingest batch. Instead the engine builds a
Bloom filter ONCE over the corpus's content hashes and broadcasts it to the
ingest job: "is this text already in the corpus" becomes a scan-local bit
test, only the (tiny) candidate set pays a join, and an exact confirm join
removes Bloom false positives — the composite therefore has EXACTLY anti-join
semantics and stays hash-for-hash oracle-checkable.

Scale design (the whole point of this operator):
* build: the k probe positions are pure JVM expressions (the same
  mulmod-affine-(2^61-1) family as MinHash, independent constants) →
  (word, bitmask) projection → ONE map-side-combinable ``bit_or`` groupBy.
  The shuffle is bounded by OCCUPIED WORDS (≤ num_bits/64 rows), not corpus
  rows; the collected bitmap is ≤ num_bits/64 longs regardless of corpus size.
* apply: the bitmap is a numpy array in a Spark broadcast; membership is an
  Arrow-batched pandas UDF doing k fancy-indexed bit tests — no shuffle, no
  corpus access, vectorized per batch.
* confirm: the corpus is re-scanned with the candidate hash set BROADCAST
  into a left-semi join — the corpus is never shuffled; survivors come from
  a broadcast anti-join of the confirmed hashes back onto the new batch.
* sizing: fpp ≈ (1 - e^{-k·n/m})^k; :func:`bloom_num_bits` picks the
  power-of-two m for a target fpp (power of two so position = hash & (m-1),
  no modulo bias, cheap in both engines).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import (
    _perm_constants,
    mulmod_affine_p61,
    portable_hash64,
)

#: Affine constants for the Bloom probe family — a DIFFERENT seed from
#: MINHASH_PERMS so Bloom probes and MinHash permutations are independent
#: even when both run over the same base hash.
BLOOM_PERMS: list[tuple[int, int]] = _perm_constants(n=16, seed=7)

_MASK63 = (1 << 63) - 1


def bloom_num_bits(expected_items: int, target_fpp: float = 0.01) -> int:
    """Smallest power-of-two bit count m with fpp ≤ target at the optimal k
    (standard bound m = -n·ln p / ln²2, rounded up to a power of two)."""
    if expected_items <= 0:
        return 64
    m = -expected_items * np.log(target_fpp) / (np.log(2) ** 2)
    bits = 64
    while bits < m:
        bits <<= 1
    return bits


def bloom_positions(hash_col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k probe positions as JVM columns: pos_i = affine_i(h) & (m-1).
    Same expressions on the build and apply sides — consistency by
    construction."""
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    if num_hashes > len(BLOOM_PERMS):
        raise ValueError(f"at most {len(BLOOM_PERMS)} probes available")
    return [
        mulmod_affine_p61(hash_col, a, b).bitwiseAND(F.lit(num_bits - 1))
        for a, b in BLOOM_PERMS[:num_hashes]
    ]


def build_bloom(
    hashes: DataFrame, hash_col: str, num_bits: int, num_hashes: int = 5
) -> np.ndarray:
    """Build the bitmap distributedly; collect ≤ num_bits/64 (word, bits)
    rows. Returns a ``uint64`` array of length num_bits/64."""
    pos = bloom_positions(F.col(hash_col), num_bits, num_hashes)
    words = (
        hashes.select(F.explode(F.array(*pos)).alias("_pos"))
        .select(
            F.shiftright(F.col("_pos"), 6).alias("word"),
            F.expr("shiftleft(1L, CAST(_pos & 63 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    bitmap = np.zeros(num_bits // 64, dtype=np.uint64)
    for r in words:
        bitmap[r["word"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return bitmap


def with_bloom_hit(
    df: DataFrame,
    hash_col: str,
    bitmap: np.ndarray,
    num_bits: int,
    num_hashes: int = 5,
    out_col: str = "_bloom_hit",
) -> DataFrame:
    """Add a boolean column: True iff all k probed bits are set (i.e. the
    hash MIGHT be in the set; False is a guaranteed miss). Positions are
    computed JVM-side; the UDF is k vectorized bit tests on the broadcast
    bitmap."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    def _might_contain(*cols):
        import pandas as pd

        bm = bc.value
        hit = None
        for s in cols:
            p = s.to_numpy(dtype=np.int64)
            masks = np.left_shift(np.uint64(1), (p & 63).astype(np.uint64))
            h = (bm[p >> 6] & masks) != 0
            hit = h if hit is None else (hit & h)
        return pd.Series(hit)

    udf = F.pandas_udf(_might_contain, "boolean")
    pos = bloom_positions(F.col(hash_col), num_bits, num_hashes)
    return df.withColumn(out_col, udf(*pos))


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    num_bits: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Rows of ``new_df`` whose text does NOT already appear in ``corpus_df``
    (exact content match on the portable 64-bit hash) — the incremental-ingest
    dedup. Semantically identical to an anti-join on the content hash; the
    Bloom prefilter + broadcast confirm just make it corpus-shuffle-free:

      1. bitmap over corpus hashes (shuffle ≤ num_bits/64 words),
      2. scan-local Bloom test on the new batch → candidate hashes (small),
      3. corpus scanned once more with candidates BROADCAST into a left-semi
         join → confirmed hashes (kills Bloom false positives),
      4. broadcast anti-join of confirmed hashes onto the new batch.

    The corpus is scanned twice and shuffled never; the new batch is never
    shuffled at all.
    """
    corpus_h = corpus_df.select(portable_hash64(text_col).alias("_ch"))
    bitmap = build_bloom(corpus_h, "_ch", num_bits, num_hashes)
    new_h = new_df.withColumn("_ch", portable_hash64(text_col))
    cand = (
        with_bloom_hit(new_h, "_ch", bitmap, num_bits, num_hashes)
        .filter(F.col("_bloom_hit"))
        .select("_ch")
        .distinct()
    )
    confirmed = corpus_h.join(F.broadcast(cand), "_ch", "left_semi").distinct()
    return new_h.join(F.broadcast(confirmed), "_ch", "left_anti").drop("_ch")
