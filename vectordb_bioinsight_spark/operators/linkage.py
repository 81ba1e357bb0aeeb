"""Fuzzy entity resolution — blocked edit-distance matching over a name
dimension, and canonicalization of the resulting match graph.

Reference parity: the reference canonicalizes entity names with exact
dictionaries (backend/app/core/medical_vocabulary.py synonym maps; the
gene-symbol upper-casing in rnaseq_pipeline/agents/agent1_deg.py) —
exact lookup breaks on typos and spelling variants. Blocked
edit-distance linkage is the standard record-linkage upgrade: compare
only within cheap blocks, keep pairs under a distance budget, then
collapse transitive matches with the existing components operator.

Scale shape: resolution runs on the DISTINCT-name dimension, never the
fact table — dedupe first (groupBy name → support count), block, then
a within-block self-join. The block key bounds the quadratic term: with
B blocks of size ~s the join is B·s² name pairs, not N². Levenshtein is
a JVM builtin (``F.levenshtein``) with an optional threshold arg that
short-circuits, and DuckDB's ``levenshtein`` shares the definition, so
the pair table is hash-oracle-able.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    block_fn: "Callable[[Column], Column]",
    max_dist: int = 2,
) -> DataFrame:
    """Candidate duplicate-name pairs: distinct names that share a block
    and sit within ``max_dist`` edits of each other.

    ``block_fn`` maps the name column to its block key (first token,
    phonetic key, length bucket, …) — any deterministic expression; it is
    evaluated once on the deduped dimension. Pairs are emitted once
    (name_a < name_b). The support counts let callers rank canonical
    candidates by frequency (the higher-support side is usually the
    correct spelling).

    Output: (name_a, name_b, dist, n_a, n_b) ordered by (name_a, name_b).
    """
    dim = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("_blk", block_fn(F.col("name")))
    )
    a = dim.select(
        F.col("_blk"),
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = dim.select(
        F.col("_blk"),
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(b, "_blk").filter(F.col("name_a") < F.col("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        pairs.withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
        .orderBy("name_a", "name_b")
    )


def resolve_entities(
    df: DataFrame,
    name_col: str,
    block_fn: "Callable[[Column], Column]",
    max_dist: int = 2,
) -> DataFrame:
    """Full resolution: fuzzy pairs → transitive closure → canonical name
    per cluster (the minimum name, matching the components operator's
    min-label convention).

    Composes ``fuzzy_name_pairs`` with ``network.connected_components``
    (iterative min-label propagation; driver union-find below its
    small-graph bound). Names with no fuzzy neighbor canonicalize to
    themselves — the output is a complete name → canonical mapping for
    broadcast back onto fact tables.

    Output: (name, canonical, n) — n is the name's support count.
    """
    from vectordb_bioinsight_spark.operators.network import connected_components

    dim = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count("*").cast("long").alias("n")
    )
    pairs = fuzzy_name_pairs(df, name_col, block_fn, max_dist)
    comps = connected_components(
        pairs.select(
            F.col("name_a").alias("entity1"), F.col("name_b").alias("entity2")
        )
    )
    return (
        dim.join(comps.withColumnRenamed("entity", "name"), "name", "left")
        .select(
            "name",
            F.coalesce(F.col("component"), F.col("name")).alias("canonical"),
            "n",
        )
        .orderBy("name")
    )
