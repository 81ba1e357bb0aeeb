"""End-to-end training-data preparation — the LLM-pipeline composition.

One lazy DAG from raw documents to train/val/test shards, composed entirely
from the engine's operators (each independently oracle-tested):

  1. **profile** the incoming source (one-scan column stats) — data-quality
     gate before anything touches the corpus;
  2. **quality filter**: language + heuristic quality score + junk predicate
     (text_analysis.text_stats, chunking.junk_predicate);
  3. **exact + near dedup**: hash-groupBy representatives, then MinHash-LSH
     banding restricted n-gram Jaccard (dedup.near_dedup_pipeline ordering —
     exact first, measured 1e8→3e5 candidate-pair difference);
  4. **stratified sampling** by source (deterministic hash buckets, so the
     sample is reproducible and increment-consistent);
  5. **leak-free split**: every surviving doc_id lands in exactly one of
     train/val/test (hash_split).

Scale shape: steps 2 and 4-5 are scan-local (no shuffle); dedup carries the
only shuffles (content-hash groupBy + LSH band join). The output writes
partitioned by split via writers.write_table.

Reference analogs: junk filtering (text_splitter.py:17-52), dedup by title
(vector_store.py:446-459) — extended per BASELINE to the full
dedup/sample/split discipline a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.chunking import junk_predicate
from vectordb_bioinsight_spark.operators.dedup import near_dedup_pipeline
from vectordb_bioinsight_spark.operators.sampling import hash_split, stratified_hash_sample
from vectordb_bioinsight_spark.operators.text_analysis import quality_score_expr


def prepare_training_data(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    near_dup_jaccard: float = 0.7,
    sample_fractions: dict[str, float] | None = None,
    default_fraction: float = 1.0,
    split_weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    salt: int = 0,
    max_dup_3gram_ratio: float | None = None,
    cluster_resolve: str = "components",
) -> DataFrame:
    """Raw documents → deduped, quality-filtered, sampled, split corpus.

    Returns the surviving docs with ``quality_score`` and ``split`` columns.
    Deterministic end-to-end: same input ⇒ same output, regardless of
    partitioning (hash sampling/splitting; dedup representatives are
    min-id per content/near-dup group).

    ``max_dup_3gram_ratio`` (optional) adds the Gopher repetition gate
    (operators/text_analysis.repetition_stats): docs whose duplicate-3gram
    fraction exceeds it are dropped alongside the junk/quality filters —
    still scan-local, still one pass.

    ``cluster_resolve`` picks the near-dup survivor rule: "components"
    (default) resolves pairs into transitive clusters via connected
    components and keeps the min id per cluster (the production fuzzy-dedup
    convention — a chain A~B~C keeps exactly A); "pairwise" drops the
    higher-id side of every pair (cheaper — no iteration — but a chain
    where B already lost to A still drops C even though C never matched A).
    """
    if cluster_resolve not in ("components", "pairwise"):
        raise ValueError(f"unknown cluster_resolve {cluster_resolve!r}")
    # -- 2. quality gate (scan-local: language, score, junk regexes).
    # quality_score is computed IN the corpus projection, not joined back
    # from a text_stats table — the join form re-scans the corpus on both
    # sides for a value derivable in the same scan. Order matters: the
    # cheap lang/junk predicates go FIRST (both push to the parquet scan),
    # so the tokenize-heavy quality expression — which Catalyst substitutes
    # into its own pushed-down filter predicate — only evaluates on the
    # rows that survive them.
    from pyspark.storagelevel import StorageLevel

    gated = (
        docs.filter(F.col(lang_col).isin(*keep_langs))
        .filter(~junk_predicate(F.col(text_col)))
        .withColumn("quality_score", quality_score_expr(text_col))
        .filter(F.col("quality_score") >= min_quality)
    )
    if max_dup_3gram_ratio is not None:
        from vectordb_bioinsight_spark.operators.text_analysis import repetition_stats

        rep = repetition_stats(docs, id_col, text_col).select(
            F.col("doc_id").alias(id_col), "dup_3gram_ratio"
        )
        gated = gated.join(rep, id_col).filter(
            F.col("dup_3gram_ratio") <= max_dup_3gram_ratio
        ).drop("dup_3gram_ratio")

    # -- 3. dedup: drop exact copies (keep min-id representative), then
    #    resolve near-dup pairs among representatives per cluster_resolve
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    reps = (
        gated.withColumn("_ch", portable_hash64(text_col))
        .withColumn("_rep", F.min(id_col).over(Window.partitionBy("_ch")))
        .filter(F.col(id_col) == F.col("_rep"))
        .drop("_ch", "_rep")
    )
    # reps feeds FOUR plan branches (minhash sigs, both Jaccard shingle
    # sides, the final anti join) and Spark re-executes the whole
    # gate+window subtree per branch — persist disk-spillable so the gated
    # scan runs once (same discipline as span_cut_docs)
    reps = reps.persist(StorageLevel.MEMORY_AND_DISK)
    # reps is already one row per distinct content, so the pipeline skips
    # its internal exact-dedup groupBy (assume_unique) instead of re-running
    # that shuffle once per downstream consumer
    # The pairs table is TINY (near-dup pairs only) but its lineage is the
    # whole minhash+banding+jaccard DAG; the component resolver iterates
    # over it, so without a persist every label-propagation round re-runs
    # that DAG. Persisting pairs (not the heavyweight intermediates) is the
    # cheap cut point.
    near = near_dedup_pipeline(
        reps.select(id_col, text_col), id_col, text_col,
        min_jaccard=near_dup_jaccard, assume_unique=True,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if cluster_resolve == "components":
        from vectordb_bioinsight_spark.operators.dedup import dedup_clusters

        clusters = dedup_clusters(near, "doc1", "doc2")
        losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
            F.col("doc_id").alias(id_col)
        )
    else:
        losers = near.select(F.greatest("doc1", "doc2").alias(id_col)).distinct()
    deduped = reps.join(losers, id_col, "left_anti")

    # -- 4-5. deterministic sample + leak-free split (scan-local)
    if sample_fractions:
        deduped = stratified_hash_sample(
            deduped, id_col, source_col, sample_fractions, default_fraction, salt=salt
        )
    return hash_split(
        deduped, id_col, list(split_weights), ["train", "val", "test"], salt=salt + 1
    )


def prepare_training_batches(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    seq_len: int = 2048,
    n_shards: int = 16,
    inv_temp: float | None = None,
    dsir_target=None,
    dsir_keep_frac: float | None = None,
    salt: int = 0,
) -> DataFrame:
    """Stage 2 of the LLM pipeline: prepared corpus → packed epoch batches.

    Optional DSIR selection (keep the most target-like ``dsir_keep_frac`` of
    docs; threshold via ``percentile_approx`` — one aggregated row broadcast
    back, never a global sort), optional temperature mixture replication
    (q ∝ p^(1/T) over ``domain_col``), then concat-and-chunk packing of the
    replica stream. Replicas get a composite id (doc#copy) so epoch copies
    land in different shards.

    Output: pack_concat_chunk's span table plus ``domain`` — every training
    sequence addressable, deterministic under any partitioning.
    """
    from vectordb_bioinsight_spark.operators.packing import (
        pack_concat_chunk,
        temperature_mixture_sample,
    )
    from vectordb_bioinsight_spark.operators.text_analysis import dsir_logratio_scores

    df = corpus
    if dsir_target is not None and dsir_keep_frac:
        if not 0 < dsir_keep_frac <= 1:
            raise ValueError("dsir_keep_frac must be in (0, 1]")
        scores = dsir_logratio_scores(df, id_col, text_col, dsir_target).select(
            F.col("doc_id").alias(id_col), "dsir_score"
        )
        thr = scores.agg(
            F.percentile_approx("dsir_score", 1.0 - dsir_keep_frac).alias("_thr")
        )
        df = (
            df.join(scores, id_col)
            .crossJoin(F.broadcast(thr))
            .filter(F.col("dsir_score") >= F.col("_thr"))
            .drop("_thr", "dsir_score")
        )
    if inv_temp is not None:
        df = temperature_mixture_sample(df, id_col, domain_col, inv_temp, salt=salt)
    else:
        df = df.withColumn("copy_id", F.lit(0))
    replicas = df.select(
        F.concat_ws("#", F.col(id_col).cast("string"), F.col("copy_id")).alias("_rid"),
        F.col(text_col),
        F.col(domain_col).alias("domain"),
    )
    packed = pack_concat_chunk(replicas, "_rid", text_col, seq_len, n_shards)
    return packed.join(
        replicas.select(F.col("_rid").alias("doc_id"), "domain"), "doc_id"
    )
