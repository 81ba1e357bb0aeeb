"""Streaming document ingest — the corpus-building loop as a stream.

Reference analog: the reference ingests papers incrementally (fetch →
check-if-present → insert, backend/app/core/vector_store.py upsert flow +
the daily-briefing scheduler). Re-expressed as Structured Streaming over a
landing directory of JSONL shards: each micro-batch is quality-gated,
deduped WITHIN the batch and AGAINST the corpus built so far, then appended.

``foreachBatch`` is the right primitive here (not a continuous stateful
operator): the against-corpus dedup needs the corpus AS OF this batch —
state that lives in the sink table, not in stream state. The checkpoint
gives at-least-once batch replay; the against-corpus dedup then makes a
REPLAYED batch a no-op for every doc that landed before the crash, which
is effective-once for content (not byte-exact exactly-once: a first-ever
batch that crashed mid-append can leave rows a replay re-appends, since
there is no prior corpus to dedup against — a transactional table format
(Delta/Iceberg) with ``txnAppId``/``txnVersion`` closes that window in
production). Inside the batch we reuse the engine's batch operators
unchanged (the Bloom prefilter keeps the corpus un-shuffled however large
it grows — operators/bloom.py).

At 100 TB: the landing dir is an object-store prefix; ``maxFilesPerTrigger``
bounds batch size; the corpus append is a partitioned parquet/Delta table;
the Bloom build cost is amortizable by persisting the bitmap between
batches (rebuild per batch is the simple correct default implemented here).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def stream_documents_from_dir(
    spark: SparkSession,
    landing_dir: str,
    schema: str = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a JSONL landing directory (explicit schema — a stream
    cannot infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(landing_dir)


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 3,
    max_punct_ratio: float = 0.5,
) -> DataFrame:
    """Scan-local junk filter (streaming-safe: pure row expressions) —
    the same length/punctuation discipline as operators/chunking's junk
    predicate, applied before any text enters the corpus."""
    from vectordb_bioinsight_spark.functions.text import punct_ratio, token_count

    return docs.filter(F.col(text_col).isNotNull()).filter(
        (token_count(text_col) >= min_tokens)
        & (punct_ratio(F.col(text_col)) <= max_punct_ratio)
    )


def _dedup_within_batch(batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per content hash (the engine-wide survivor rule)."""
    from pyspark.sql import Window

    w = Window.partitionBy("_ch").orderBy(F.col(id_col).asc())
    return (
        batch.withColumn("_ch", portable_hash64(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_ch", "_rn")
    )


def _url_dedup_within_batch(batch: DataFrame, id_col: str) -> DataFrame:
    """Min-id survivor per url_key; url-less docs (NULL key) each form
    their own group via the id-hash fallback so they all survive."""
    from pyspark.sql import Window

    grp = F.coalesce(F.col("url_key"), portable_hash64(F.col(id_col).cast("string")))
    w = Window.partitionBy(grp).orderBy(F.col(id_col).asc())
    return (
        batch.withColumn("_urn", F.row_number().over(w))
        .filter(F.col("_urn") == 1)
        .drop("_urn")
    )


def run_ingest_stream(
    stream_docs: DataFrame,
    corpus_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_bits: int = 1 << 16,
    url_dedup: bool = False,
    manifest_path: str | None = None,
    manifest_shards: int = 16,
    moments_path: str | None = None,
    moments_col: str | None = None,
    hist_path: str | None = None,
    hist_col: str | None = None,
    hist_lo: float = 0.0,
    hist_hi: float = 1.0,
    hist_bins: int = 128,
    await_termination: bool = True,
):
    """Start the gated, deduped append loop; with the default
    availableNow trigger it drains the landing dir and stops (the
    batch-refresh mode); pass ``await_termination=False`` to keep the query
    handle for a long-running stream.

    ``url_dedup=True`` inserts the RefinedWeb stage-1 gate BEFORE content
    dedup: the canonical-first-URL key (operators/urls.with_url_key) is
    computed once per doc, deduped within the batch, anti-joined against
    the corpus's persisted ``url_key`` column (8 bytes per corpus row —
    the corpus text is never re-parsed), and stored with the appended
    rows. NULL keys (no URL) always survive the anti-join: NULL equals
    nothing, which is exactly the wanted semantics.

    ``manifest_path`` keeps a shard manifest current as batches land:
    each appended batch's manifest (operators/packing.shard_manifest over
    the hash-shard assignment) FOLDS into the standing one with
    merge_shard_manifests — counts add, xor fingerprints fold — so the
    manifest stays O(shards) work per batch and the corpus is never
    rescanned for accounting.

    ``moments_path`` (+ ``moments_col``, default ``n_chars``-style numeric
    column named at call time) does the same for COLUMN STATISTICS: each
    batch's per-source (n, mean, m2) moment shard
    (operators/sketches.moment_shards) folds into the standing profile
    with merge_moment_shards — exact pooled moments, merge == rebuild —
    so downstream mixture/budget planners read current column stats
    without a corpus scan. Folded AFTER the corpus append, same crash
    contract as the manifest.

    ``hist_path`` (+ ``hist_col`` and the fixed ``hist_lo/hist_hi/
    hist_bins`` grid) maintains the QUANTILE sibling the same way: each
    batch's fixed-grid histogram shard (operators/sketches.hist_shards)
    folds with merge_hist_shards — integer counts, so stream == batch is
    EXACT, and hist_quantiles reads bounded-error percentiles off the
    standing state without a corpus scan. The grid is part of the state
    contract: changing it requires a rebuild, exactly like a data
    contract's reference bins (the PSI convention).
    """
    from vectordb_bioinsight_spark.operators.bloom import dedup_against_corpus
    from vectordb_bioinsight_spark.operators.urls import with_url_key

    spark = stream_docs.sparkSession

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        gated = quality_gate(batch_df, text_col)
        if url_dedup:
            gated = _url_dedup_within_batch(with_url_key(gated, text_col), id_col)
        batch = _dedup_within_batch(gated, id_col, text_col)
        # Probe the existing corpus THROUGH Spark, not the driver-local
        # filesystem: corpus_path may be an object-store prefix, a
        # partitioned layout, or a Delta table — os.listdir would report
        # "absent" (or raise) for all of those and silently skip the
        # against-corpus dedup. AnalysisException covers both
        # path-not-found and empty-dir/no-schema; any other error (perms,
        # corrupt footer) must propagate, not disable dedup.
        corpus = None
        try:
            corpus = spark.read.parquet(corpus_path)
        except AnalysisException:
            pass  # first batch ever: no corpus yet
        if corpus is not None:
            if url_dedup and "url_key" in corpus.columns:
                seen = corpus.select("url_key").where(
                    F.col("url_key").isNotNull()
                ).distinct()
                batch = batch.join(seen, "url_key", "left_anti")
            batch = dedup_against_corpus(
                batch, corpus, id_col, text_col, num_bits=bloom_bits
            )
        if manifest_path is not None or moments_path is not None or hist_path is not None:
            # one compute, many sinks: without this, the corpus append AND
            # every stats fold would each re-execute the full dedup lineage,
            # and the post-append re-read of the corpus could see the batch
            # it is folding (ADVICE r05)
            batch = batch.localCheckpoint(eager=True)
        # corpus append FIRST, manifest fold AFTER it succeeds: if the
        # append fails, the standing manifest must keep describing the
        # corpus that actually exists. The failure mode this leaves —
        # append landed, fold crashed — UNDERSTATES the corpus, which the
        # next rebuild (or re-fold from the checkpointed batch) repairs;
        # the r04 order permanently OVERSTATED counts and xor fingerprints
        # with a batch that never landed (ADVICE r04).
        batch.write.mode("append").parquet(corpus_path)
        if manifest_path is not None:
            from vectordb_bioinsight_spark.operators.packing import (
                merge_shard_manifests,
                shard_manifest,
                shuffle_shards,
            )

            delta = shard_manifest(
                shuffle_shards(batch, id_col, manifest_shards, salt=0),
                "shard", id_col, text_col,
            )
            try:
                standing = spark.read.parquet(manifest_path)
                merged = merge_shard_manifests(standing, delta).localCheckpoint(
                    eager=True
                )  # materialize BEFORE overwriting what it reads
            except AnalysisException:
                merged = delta
            merged.write.mode("overwrite").parquet(manifest_path)
        if moments_path is not None and moments_col is not None:
            from vectordb_bioinsight_spark.operators.sketches import (
                merge_moment_shards,
                moment_shards,
            )

            src = "source" if "source" in batch.columns else None
            keys = [src] if src else []
            delta_m = moment_shards(
                batch.withColumn("_grain", F.lit("all")), keys + ["_grain"], moments_col
            )
            try:
                standing_m = spark.read.parquet(moments_path)
                merged_m = merge_moment_shards(
                    standing_m.unionByName(delta_m), keys + ["_grain"]
                ).localCheckpoint(eager=True)
            except AnalysisException:
                merged_m = delta_m
            merged_m.write.mode("overwrite").parquet(moments_path)
        if hist_path is not None and hist_col is not None:
            from vectordb_bioinsight_spark.operators.sketches import (
                hist_shards,
                merge_hist_shards,
            )

            src = "source" if "source" in batch.columns else None
            keys = ([src] if src else []) + ["_grain"]
            delta_h = hist_shards(
                batch.withColumn("_grain", F.lit("all")),
                keys,
                hist_col,
                lo=hist_lo,
                hi=hist_hi,
                n_bins=hist_bins,
            )
            try:
                standing_h = spark.read.parquet(hist_path)
                merged_h = merge_hist_shards(
                    standing_h.unionByName(delta_h), keys
                ).localCheckpoint(eager=True)
            except AnalysisException:
                merged_h = delta_h
            merged_h.write.mode("overwrite").parquet(hist_path)

    q = (
        stream_docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
