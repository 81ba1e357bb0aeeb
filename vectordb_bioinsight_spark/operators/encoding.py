"""Categorical feature encoding for model-training pipelines — the
feature-prep tier between the corpus operators and the M9/M10 classifier
stack.

Reference analog: the preprocessing ladder in
rnaseq_pipeline/ml/preprocessor.py:124-267 turns raw matrices into model
features; tabular pipelines need the same ladder for CATEGORICAL columns,
and the workhorse there is target (mean) encoding with leave-one-out and
smoothing — the encoding used when one-hot would explode a
high-cardinality key (domains, brands, user segments) into millions of
columns.

Scale shape: every encoder here is one map-side-combinable groupBy over
the key (a dimension-sized statistics table) + one broadcast-back join +
scan-local arithmetic. Nothing iterates, nothing collects, and the
statistics table is reusable across train/serve (fit once, apply
anywhere) — the exact split a feature store makes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encoding_stats(
    df: DataFrame,
    key_cols: "list[str]",
    target_col: str,
) -> DataFrame:
    """The fit half: per-key target sum/count plus the global prior —
    everything apply-time needs, O(distinct keys) rows. Emitted as a
    standalone frame so training fits ONCE and serving reuses the table
    (broadcast-sized for any realistic categorical)."""
    per_key = df.groupBy(*key_cols).agg(
        F.sum(F.col(target_col).cast("double")).alias("t_sum"),
        F.count(target_col).cast("long").alias("t_n"),
    )
    prior = df.agg(
        F.avg(F.col(target_col).cast("double")).alias("_prior"),
    )
    return per_key.crossJoin(F.broadcast(prior))


def target_encode_loo(
    df: DataFrame,
    key_cols: "list[str]",
    target_col: str,
    prior_weight: float = 20.0,
    out_col: str = "target_enc",
) -> DataFrame:
    """Smoothed LEAVE-ONE-OUT target encoding:

        enc_i = (sum_y(key) - y_i + m * prior) / (n(key) - 1 + m)

    Each row's own label is excluded from its encoding (the standard
    leakage guard — with the row included, the encoding memorizes the
    label and the downstream model overfits catastrophically on rare
    keys), and ``m = prior_weight`` shrinks rare keys toward the global
    prior so a key seen once doesn't encode to its single (excluded-away)
    neighbor's noise.

    Physical plan: :func:`target_encoding_stats` (one groupBy), broadcast
    back onto the scan, pure expression arithmetic — the encoding of a
    100 TB fact table costs one dimension-sized shuffle plus a map
    stage. Singleton keys (n = 1) have no leave-one-out evidence and
    encode to the pure prior. Output: input columns + ``out_col``
    (rounded 6 dp).
    """
    stats = target_encoding_stats(df, key_cols, target_col)
    y = F.col(target_col).cast("double")
    m = F.lit(float(prior_weight))
    enc = F.when(
        F.col("t_n") > 1,
        (F.col("t_sum") - y + m * F.col("_prior")) / (F.col("t_n") - 1 + m),
    ).otherwise(F.col("_prior"))
    return (
        df.join(F.broadcast(stats), key_cols)
        .withColumn(out_col, F.round(enc, 6))
        .drop("t_sum", "t_n", "_prior")
    )


def frequency_encode(
    df: DataFrame,
    key_cols: "list[str]",
    out_col: str = "freq_enc",
) -> DataFrame:
    """Frequency encoding: each key encodes to its share of rows —
    the zero-leakage companion (no target involved); same one-groupBy +
    broadcast-back shape. Rounded 6 dp."""
    total = df.count()
    stats = df.groupBy(*key_cols).agg(
        F.round(F.count("*") / F.lit(float(total)), 6).alias(out_col)
    )
    return df.join(F.broadcast(stats), key_cols)


def quantile_bin(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
    relative_error: float = 0.0,
) -> DataFrame:
    """Equal-frequency binning via approxQuantile edges (exact when
    ``relative_error=0``): the numeric-feature discretizer. The edge
    list is n_bins-1 scalars computed in ONE sketch pass (Greenwald-
    Khanna inside Spark, mergeable per partition), then binning is a
    scan-local when-ladder — no per-row lookup join."""
    edges = df.approxQuantile(
        value_col, [i / n_bins for i in range(1, n_bins)], relative_error
    )
    c: Column = F.lit(n_bins - 1)
    for i in range(len(edges) - 1, -1, -1):
        c = F.when(F.col(value_col) <= F.lit(edges[i]), F.lit(i)).otherwise(c)
    return df.withColumn(out_col, c.cast("int"))


def woe_iv(
    df: DataFrame,
    bucket_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value table per feature bucket —
    the credit-scoring-standard predictiveness audit for a binned
    feature against a binary label (Siddiqi 2006), the feature-prep
    sibling of target encoding: WOE is the log-odds the encoder should
    reproduce, IV contributions rank features before training.

        woe_b = ln( ((pos_b + s) / pos_total) / ((neg_b + s) / neg_total) )
        iv_b  = (pos_b/pos_total - neg_b/neg_total) * woe_b

    ``smoothing`` (added to each bucket's class count) keeps empty-class
    buckets finite instead of +-inf. One map-side-combinable groupBy on
    the bucket; the totals fold back from a broadcast 1-row aggregate —
    no second scan, no global window.

    Output: (bucket, n_pos, n_neg, woe, iv_contrib) rounded 6 dp, plus
    every row carries the table-level ``iv_total`` (a broadcast of the
    bounded bucket frame's sum) so the audit reads off one table.
    """
    y = F.col(label_col).cast("int")
    per = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.sum(y).cast("long").alias("n_pos"),
        F.sum(1 - y).cast("long").alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").cast("double").alias("_tp"),
        F.sum("n_neg").cast("double").alias("_tn"),
    )
    s = float(smoothing)
    ps = (F.col("n_pos") + s) / F.col("_tp")
    ns = (F.col("n_neg") + s) / F.col("_tn")
    woe = F.log(ps / ns)
    iv_c = (F.col("n_pos") / F.col("_tp") - F.col("n_neg") / F.col("_tn")) * woe
    scored = per.join(F.broadcast(tot)).select(
        "bucket",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round(iv_c, 6).alias("iv_contrib"),
    )
    total = scored.agg(
        F.round(F.sum("iv_contrib"), 6).alias("iv_total")
    )
    return scored.join(F.broadcast(total))
