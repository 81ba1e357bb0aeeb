"""Sequence packing & data-mixture sampling — the training-batch tier.

After cleaning/dedup/split (pipelines/training_data.py), a pretraining
pipeline still has to (a) decide HOW OFTEN each domain is seen (the data
mixture: up/down-sampling weights per source, the knob every LLM data
recipe publishes) and (b) turn variable-length documents into fixed-length
training sequences (sequence packing). Both are re-expressed here as
deterministic, shuffle-light DataFrame operators:

* :func:`mixture_weight_sample` — epoch-weighted replication: weight 2.4
  means every doc appears twice and a deterministic 40% of docs a third
  time (integer repeats + hash-gated fractional remainder). Weight < 1 is
  plain hash downsampling on the same scan.
* :func:`pack_concat_chunk` — GPT-style concat-and-chunk: documents are
  concatenated in deterministic (shard, doc_id) order and cut every
  ``seq_len`` tokens; emits each doc's sequence span (first/last sequence
  index + offset). Pure window arithmetic — one shuffle on the shard key.
* :func:`pack_next_fit` — no-split packing (docs never cross a sequence
  boundary; the "best-fit/next-fit" family used when truncation must be
  avoided). Inherently sequential per shard, so it runs as one
  applyInPandas pass per shard — the shard count is the parallelism.

Scale shape: token counting is scan-local; the only shuffle in either
packer is the repartition on ``shard`` (configurable count, so one shard
is one task's worth of cumsum work — at 100 TB pick shards so each holds
a few hundred MB of token counts, NOT of text: the packers only carry
(id, n_tokens), never the text itself). The mixture sampler is a
scan-local projection + explode with no shuffle at all.

Reference analog: the reference has no training-batch tier (it is a
retrieval/statistics platform); these operators are the BASELINE.json
LLM-data-pipeline extension, following the public concat-and-chunk (GPT-2,
T5 pack) and weighted-mixture (DoReMi / The Pile / Dolma recipes)
formulations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64, salted_hash64
from vectordb_bioinsight_spark.functions.text import bpe_token_count

#: hash-space modulus for fractional-repeat arithmetic (same convention as
#: operators/sampling.DENOM)
DENOM = 10_000


def _shard(col: Column, n_shards: int) -> Column:
    return F.pmod(portable_hash64(col.cast("string")), F.lit(n_shards))


def with_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    counter: str = "bpe",
) -> DataFrame:
    """Scan-local token accounting: adds ``n_tokens`` (long).

    ``counter``: "bpe" = pretokenizer-run lower bound
    (functions/text.bpe_token_count, DuckDB twin available), "ws" =
    whitespace tokens. Both are pure JVM regex expressions.
    """
    if counter == "bpe":
        n = bpe_token_count(F.col(text_col))
    elif counter == "ws":
        from vectordb_bioinsight_spark.functions.text import token_count

        n = token_count(text_col)
    else:
        raise ValueError(f"unknown counter {counter!r}")
    return df.withColumn("n_tokens", n.cast("long"))


def pack_concat_chunk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int = 8,
    counter: str = "bpe",
) -> DataFrame:
    """Concat-and-chunk sequence packing: map every document to its token
    range in the packed training stream.

    Documents are ordered by (shard, doc_id) — shard = portable hash of the
    id, so the order is deterministic under any partitioning — then
    conceptually concatenated and cut every ``seq_len`` tokens. No padding,
    no truncation: a doc spanning a cut boundary continues in the next
    sequence (the GPT-2/T5 pretraining convention).

    Output per doc: ``(doc_id, shard, n_tokens, tok_start, seq_first,
    seq_offset, seq_last)`` where ``tok_start`` is the doc's first token's
    position in its shard's stream, ``seq_first = tok_start div seq_len``,
    ``seq_offset = tok_start mod seq_len`` and ``seq_last`` is the sequence
    holding the doc's final token (== seq_first when the doc fits).

    Physical plan: token-count scan → ONE shuffle on shard → per-shard
    running-sum window (each shard's window is an independent task — no
    global ordering, no single-partition funnel). Only (id, n_tokens) ride
    the shuffle; text is dropped before it.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    counts = with_token_counts(df, id_col, text_col, counter).select(
        F.col(id_col).alias("doc_id"),
        _shard(F.col(id_col), n_shards).alias("shard"),
        "n_tokens",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    L = F.lit(seq_len).cast("long")
    packed = counts.withColumn("tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        "tok_start",
        F.expr(f"tok_start div {seq_len}").alias("seq_first"),
        F.pmod(F.col("tok_start"), L).alias("seq_offset"),
        F.expr(f"(tok_start + greatest(n_tokens - 1, 0L)) div {seq_len}").alias("seq_last"),
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Shard-level packing report over :func:`pack_concat_chunk` output:
    sequences produced, total tokens, fill ratio of the last (only
    partially filled) sequence amortized in, and how many docs straddle a
    boundary. Small (n_shards rows) — the monitoring side-channel."""
    return packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.max("seq_last") + 1).alias("n_seqs"),
        F.round(
            F.sum("n_tokens") / ((F.max("seq_last") + 1) * F.lit(float(seq_len))), 6
        ).alias("fill_ratio"),
        F.sum((F.col("seq_last") > F.col("seq_first")).cast("long")).alias("n_split_docs"),
    )


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_shards: int = 8,
    counter: str = "bpe",
) -> DataFrame:
    """No-split (next-fit) packing: walk docs in (shard, doc_id) order,
    opening a new sequence whenever the next doc would overflow ``seq_len``.
    Docs longer than ``seq_len`` get a sequence of their own, flagged
    ``truncated`` (the trainer decides whether to actually cut them).

    Next-fit is a running reset-on-overflow — not expressible as a fixed
    window frame — so each shard runs one Arrow-batched pandas pass
    (applyInPandas). Parallelism = ``n_shards``; per-task state is two
    integers. The pandas loop touches (id, n_tokens) pairs only.

    Output: (doc_id, shard, n_tokens, seq_id, truncated).
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    counts = with_token_counts(df, id_col, text_col, counter).select(
        F.col(id_col).alias("doc_id"),
        _shard(F.col(id_col), n_shards).alias("shard"),
        "n_tokens",
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids, trunc = [], []
        seq, acc = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and acc + n > seq_len:
                seq += 1
                acc = 0
            seq_ids.append(seq)
            trunc.append(n > seq_len)
            acc += n
            first = False
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["truncated"] = pd.Series(trunc, dtype="bool")
        return pdf

    return counts.groupBy("shard").applyInPandas(
        pack,
        schema="doc_id long, shard long, n_tokens long, seq_id long, truncated boolean",
    )


def mixture_weight_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """Epoch-weighted data mixture: replicate/downsample each domain by its
    weight, deterministically.

    Weight w ≥ 0 means a doc from that domain appears ``floor(w)`` times,
    plus once more iff its hash bucket < frac(w)·DENOM — so the EXPECTED
    multiplicity is exactly w, the realized corpus is reproducible under
    any partitioning, and increments sample consistently (the Dolma /
    DoReMi mixture discipline without RNG state). w < 1 degenerates to
    stratified hash downsampling on the same code path.

    Output: input columns + ``copy_id`` (0-based repeat index) — one row
    per replica, ready for :func:`pack_concat_chunk` (give it a composite
    id of (doc_id, copy_id) so replicas land in different shards).

    Physical plan: broadcast-joined weight map + scan-local explode; no
    shuffle. The explode multiplies rows by ≤ ceil(max weight), never by a
    data-dependent blowup.
    """
    spark = df.sparkSession
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")
    rows = [
        (d, int(w), int(round((w - int(w)) * DENOM))) for d, w in weights.items()
    ]
    wmap = spark.createDataFrame(
        rows, f"{domain_col} string, _whole int, _frac_k int"
    )
    joined = df.join(F.broadcast(wmap), domain_col, "left").fillna(
        {
            "_whole": int(default_weight),
            "_frac_k": int(round((default_weight - int(default_weight)) * DENOM)),
        }
    )
    bucket = F.pmod(salted_hash64(F.col(id_col).cast("string"), salt), F.lit(DENOM))
    n_copies = F.col("_whole") + (bucket < F.col("_frac_k")).cast("int")
    return (
        joined.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_whole", "_frac_k", "_n")
    )


def temperature_mixture_weights(
    df: DataFrame,
    domain_col: str,
    inv_temp: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain sampling weights — the multilingual /
    multi-domain rebalancing rule (T5 mC4, XLM-R, UniMax lineage): sample
    domain d with probability q_d ∝ p_d^(1/T) instead of its natural share
    p_d, flattening head domains and boosting the tail.

    Output per domain: (domain, n_docs, p, q, weight) where ``weight`` =
    q_d / p_d is the expected copies-per-doc that realizes q at unchanged
    corpus size — exactly the multiplier :func:`mixture_weight_sample`
    consumes (see :func:`temperature_mixture_sample` for the composition).
    All ratios rounded 6 dp.

    Scale: one map-side-combinable count per domain; the domain table is
    dimension-sized. No data movement beyond the count shuffle.
    """
    if inv_temp <= 0:
        raise ValueError("inv_temp must be > 0 (1/T; 1.0 = natural sampling)")
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").cast("double").alias("_tot"))
    powed = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_p", F.col("n_docs") / F.col("_tot")
    ).withColumn("_pw", F.pow(F.col("_p"), F.lit(float(inv_temp))))
    z = powed.agg(F.sum("_pw").alias("_z"))
    return (
        powed.crossJoin(F.broadcast(z))
        .select(
            "domain",
            "n_docs",
            F.round("_p", 6).alias("p"),
            F.round(F.col("_pw") / F.col("_z"), 6).alias("q"),
            F.round((F.col("_pw") / F.col("_z")) / F.col("_p"), 6).alias("weight"),
        )
    )


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    inv_temp: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """Temperature rebalancing end-to-end: compute per-domain weights, then
    realize them with the deterministic hash-gated replicator.

    The domain-weight table is collected (dimension-sized — the number of
    languages/sources, not rows) and fed to :func:`mixture_weight_sample`,
    so the realized corpus is reproducible under any partitioning.
    """
    import math

    w = temperature_mixture_weights(df, domain_col, inv_temp).collect()
    # 4-dp weights make the fractional hash-gate constant (frac·DENOM) an
    # exact integer; floor(x·1e4 + 0.5) is HALF_UP — the same rule Spark's
    # round() and DuckDB's round() apply, unlike Python's banker's round()
    weights = {
        r["domain"]: math.floor(float(r["weight"]) * 10000 + 0.5) / 10000 for r in w
    }
    return mixture_weight_sample(
        df, id_col, domain_col, weights, default_weight=1.0, salt=salt
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic global training shuffle: every doc gets a pseudo-random
    but reproducible (shard, shard_pos) address — hash-ordered, so the
    "shuffled" order is identical on any cluster size / partitioning, and
    re-runs with a different ``salt`` give an independent epoch order (the
    shuffle-per-epoch discipline without RNG state).

    Output: input columns + shard (int) + shard_pos (0-based long).

    Scale: shard assignment is scan-local; the only shuffle is the window
    on shard (the data movement a real shuffle requires anyway). Writers
    then emit one file per shard via write_table(partition_by=["shard"]).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = salted_hash64(F.col(id_col).cast("string"), salt)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h")
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    text_col: str,
    token_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest of a sharded training corpus — the table a
    trainer's data loader (and the next round's incremental-ingest job)
    reads instead of listing files: document/token/byte totals plus an
    ORDER-INDEPENDENT content fingerprint.

    The fingerprint is ``bit_xor`` of each doc's 64-bit text hash (and of
    the id hashes): xor commutes, so the checksum is identical no matter
    how partitions arrive — re-shuffling, AQE re-planning, or a different
    cluster size cannot change it, while any changed/missing/extra doc
    does. A sum would need overflow-wrapping semantics that differ across
    engines; xor is exact in both.

    One map-side-combinable groupBy on the shard key; nothing collects.

    Output: (shard, n_docs, n_tokens, n_bytes, content_xor, id_xor).
    """
    n_tokens = (
        F.col(token_col).cast("long")
        if token_col
        else bpe_token_count(F.col(text_col)).cast("long")
    )
    return (
        df.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(n_tokens).cast("long").alias("n_tokens"),
            F.sum(F.octet_length(F.col(text_col))).cast("long").alias("n_bytes"),
            F.bit_xor(portable_hash64(text_col)).alias("content_xor"),
            F.bit_xor(portable_hash64(F.col(id_col).cast("string"))).alias("id_xor"),
        )
        .orderBy("shard")
    )


def merge_shard_manifests(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental manifest maintenance: fold an append-batch's manifest
    into the standing one WITHOUT touching the corpus. Counts add; the
    xor fingerprints fold (xor is its own inverse, so re-removing a
    retracted batch is the same operation). An ingest pipeline keeps the
    manifest current at O(shards) cost per batch — the corpus itself is
    never rescanned.

    Both inputs must be shard_manifest outputs (same schema).
    """
    both = base.unionByName(delta)
    return (
        both.groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
            F.bit_xor("content_xor").alias("content_xor"),
            F.bit_xor("id_xor").alias("id_xor"),
        )
        .orderBy("shard")
    )


def curriculum_shards(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_shards: int,
    salt: int = 0,
    ascending: bool = True,
) -> DataFrame:
    """Curriculum export: :func:`shuffle_shards`' balanced deterministic
    hash-shard ASSIGNMENT, but ``shard_pos`` follows the difficulty /
    quality score (``ascending=True`` = easy-first) instead of the
    pseudo-random epoch order — the ordering curriculum-learning loaders
    consume. A different ``salt`` re-deals the shards while every shard
    stays internally score-ordered.

    Output: input + shard (int) + shard_pos (0-based long, score-ordered
    within shard; id tiebreak).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = salted_hash64(F.col(id_col).cast("string"), salt)
    order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.partitionBy("shard").orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int"))
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
    )


def mixture_budget_plan(
    df: DataFrame,
    source_col: str,
    text_col: str,
    budget_tokens: int,
    shares: DataFrame,
    max_epochs: float = 4.0,
    token_col: str | None = None,
) -> DataFrame:
    """Token-budget mixture plan — the accounting step between "we want
    these domain proportions" (DoReMi / Llama-style target shares) and
    "what do we actually sample": each source must supply
    ``budget * share`` tokens, so its per-doc rate is want/avail —
    ``n_epochs`` full passes plus a ``sample_frac`` partial pass — capped
    at ``max_epochs`` (repeating a small source forever degrades models
    faster than missing budget; the cap surfaces as ``starved`` so the
    planner can re-normalize or source more data).

    ``shares``: (source, share) rows; normalized defensively so callers
    can pass unnormalized weights.

    Scale: one map-side-combinable token count per source; everything
    after is arithmetic on the dimension-sized plan table.

    Output: (source, avail_tokens, target_share, want_tokens, rate,
    n_epochs, sample_frac, realized_tokens, starved).
    """
    n_tokens = (
        F.col(token_col).cast("long")
        if token_col
        else bpe_token_count(F.col(text_col)).cast("long")
    )
    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(n_tokens).cast("long").alias("avail_tokens")
    )
    z = shares.agg(F.sum("share").cast("double").alias("_z"))
    norm = shares.crossJoin(F.broadcast(z)).select(
        "source", (F.col("share") / F.col("_z")).alias("_share")
    )
    plan = avail.join(norm, "source")
    want = F.col("_share") * F.lit(float(budget_tokens))
    # nullif: a source whose docs all tokenize to zero (possible after
    # aggressive cleaning) must report as starved with 0 realized tokens,
    # not throw DIVIDE_BY_ZERO under the session's ANSI default (ADVICE r04)
    rate = want / F.nullif(F.col("avail_tokens"), F.lit(0).cast("long"))
    # least() SKIPS nulls in both engines, so the zero-token branch must be
    # explicit: NULL rate -> capped 0 (nothing to sample from this source)
    capped = F.when(rate.isNull(), F.lit(0.0)).otherwise(
        F.least(rate, F.lit(float(max_epochs)))
    )
    return plan.select(
        "source",
        "avail_tokens",
        F.round("_share", 6).alias("target_share"),
        F.round(want, 0).cast("long").alias("want_tokens"),
        F.round(capped, 6).alias("rate"),
        F.floor(capped).cast("int").alias("n_epochs"),
        F.round(capped - F.floor(capped), 6).alias("sample_frac"),
        F.round(capped * F.col("avail_tokens"), 0).cast("long").alias("realized_tokens"),
        # NULL rate = zero-token source: nothing to supply, starved by
        # definition whenever it owes any tokens at all
        F.coalesce(
            rate > F.lit(float(max_epochs)), (want > 0) & F.col("avail_tokens").eqNullSafe(0)
        ).alias("starved"),
    ).orderBy("source")


def next_fit_bins(
    df: DataFrame,
    key_cols: "list[str]",
    id_col: str,
    size_col: str,
    target: float,
) -> DataFrame:
    """Generic next-fit bin packing per key — the compaction planner:
    walk items in id order, open a new bin whenever adding the next item
    would overflow ``target`` (an item larger than ``target`` gets a bin
    of its own). This is the plan an OPTIMIZE/small-file-compaction job
    executes: which files merge into which output file (the same
    maintenance tier as sources/maintenance.py's snapshot compaction;
    pack_next_fit is the token-counting specialization of this shape for
    training sequences).

    The reset-on-overflow recursion is a per-key FOLD (the Holt/funnel
    convention): sort-collect the (id, size) list inside one key-keyed
    groupBy, F.aggregate a (fill, bin, bins[]) accumulator over it, zip
    the bin ids back onto the items, explode. One corpus shuffle; state
    per key is the item list — callers key by partition/table so that
    list is the file listing of one partition, thousands at most.

    Output: (key..., id, size, bin) — bin is 0-based in id order.
    """
    if target <= 0:
        raise ValueError("target must be > 0")
    per = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col(size_col).cast("double").alias("s"),
                )
            )
        ).alias("items")
    )
    zero = F.struct(
        F.lit(0.0).alias("fill"),
        F.lit(0).alias("b"),
        F.array().cast("array<int>").alias("bins"),
    )
    t = F.lit(float(target))

    def _step(acc, x):
        overflow = (acc["fill"] + x["s"] > t) & (acc["fill"] > 0.0)
        nb = F.when(overflow, acc["b"] + 1).otherwise(acc["b"])
        nf = F.when(overflow, x["s"]).otherwise(acc["fill"] + x["s"])
        return F.struct(
            nf.alias("fill"),
            nb.alias("b"),
            F.concat(acc["bins"], F.array(nb)).alias("bins"),
        )

    folded = per.withColumn("_st", F.aggregate("items", zero, _step))
    return folded.select(
        *key_cols,
        F.explode(
            F.zip_with(
                "items",
                F.col("_st")["bins"],
                lambda it, b: F.struct(
                    it["i"].alias("i"), it["s"].alias("s"), b.alias("b")
                ),
            )
        ).alias("z"),
    ).select(
        *key_cols,
        F.col("z")["i"].alias(id_col),
        F.col("z")["s"].alias(size_col),
        F.col("z")["b"].alias("bin"),
    )
